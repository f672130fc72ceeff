package graft.service

import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.types.DataType

import graft.agent.{EncryptedBatch, FlatJson, LocalProtectionAgent, PlainBatch, ProtectionTransport, TransportResponse}
import graft.core.GraftInvalidInputException

/** In-process protection service — the server half of the reference's DBPS
  * API server (`/root/reference/src/server/dbps_api_server.cpp:110-284`),
  * implementing [[graft.agent.ProtectionTransport]] directly so the remote
  * agent's full request path (token fetch → Bearer stamp → field-match) runs
  * against real endpoints without sockets (this engine is zero-egress; the
  * reference's Crow HTTP listener is transport plumbing, not semantics).
  *
  * Endpoint parity:
  *  - `GET /healthz` → `200 "OK"`, authless (dbps_api_server.cpp:110-112);
  *  - `GET /statusz` → Bearer-verified, `{"enable_credential_check": bool}`
  *    (dbps_api_server.cpp:114-124);
  *  - `POST /token`  → [[ClientCredentialStore.processTokenRequest]]
  *    (dbps_api_server.cpp:127-139);
  *  - `POST /encrypt` / `/decrypt` → Bearer-verified, validated, then run
  *    through the real [[graft.agent.LocalProtectionAgent]] — the analog of
  *    the reference handing the request to its encryption sequencer
  *    (dbps_api_server.cpp:142-282);
  *  - every failure is the reference's error envelope: a non-200 status with
  *    `{"error": message}` (`CreateErrorResponse`, dbps_api_server.cpp:28-33).
  */
final class ProtectionService(store: ClientCredentialStore) extends ProtectionTransport {

  import ProtectionService._

  override def get(endpoint: String, headers: Map[String, String]): TransportResponse =
    endpoint match {
      case "/healthz" => TransportResponse(200, "OK")
      case "/statusz" =>
        authError(headers) match {
          case Some(err) => errorResponse(err, 401)
          case None =>
            val node = mapper.createObjectNode()
            node.put("enable_credential_check", store.getEnableCredentialCheck)
            TransportResponse(200, mapper.writeValueAsString(node))
        }
      case other => errorResponse(s"no such endpoint $other", 404)
    }

  override def post(endpoint: String, body: String,
      headers: Map[String, String]): TransportResponse = endpoint match {
    case "/token" =>
      val resp = store.processTokenRequest(body)
      if (!resp.isValid) errorResponse(resp.validationError, resp.errorStatusCode)
      else TransportResponse(200, resp.toJson)
    case "/encrypt" | "/decrypt" =>
      authError(headers) match {
        case Some(err) => errorResponse(err, 401)
        case None =>
          val op = if (endpoint == "/encrypt") "encryption" else "decryption"
          try handleProtected(endpoint, FlatJson.parse(body))
          catch {
            case e: GraftInvalidInputException =>
              errorResponse(s"Invalid input for $op: ${e.getMessage}", 400)
            case e: Exception =>
              errorResponse(s"${op.capitalize} failed: ${e.getMessage}", 400)
          }
      }
    case other => errorResponse(s"no such endpoint $other", 404)
  }

  /** The working core of `/encrypt` and `/decrypt`: rebuild the column agent
    * from the request context and run the batch, echoing the request fields
    * the client field-matches (`encrypted_compression` on encrypt; `datatype`
    * and `compression` on decrypt — dbps_api_server.cpp:195-204,239-250).
    */
  private def handleProtected(endpoint: String,
      req: Map[String, String]): TransportResponse = {
    val dt = DataType.fromJson(field(req, "datatype"))
    val agent = LocalProtectionAgent.init(field(req, "key_id"),
      field(req, "column_name"), dt, field(req, "codec"),
      field(req, "user_id"), field(req, "app_context"))
    if (endpoint == "/encrypt") {
      val values = PlainBatch.unpack(dt, unb64(field(req, "plaintext")))
      val batch = agent.encrypt(values)
      TransportResponse(200, FlatJson.write(Map(
        "ciphertext" -> b64(batch.payload),
        "encrypted_compression" -> field(req, "compression")) ++
        batch.metadata.map { case (k, v) => MetaPrefix + k -> v }))
    } else {
      val meta = req.collect {
        case (k, v) if k.startsWith(MetaPrefix) => k.stripPrefix(MetaPrefix) -> v
      }
      val values = agent.decrypt(EncryptedBatch(unb64(field(req, "ciphertext")), meta))
      TransportResponse(200, FlatJson.write(Map(
        "plaintext" -> b64(PlainBatch.pack(dt, values)),
        "datatype" -> field(req, "datatype"),
        "compression" -> field(req, "compression"))))
    }
  }

  private def authError(headers: Map[String, String]): Option[String] =
    store.verifyTokenForEndpoint(headers.getOrElse("Authorization", ""))

  private def field(req: Map[String, String], name: String): String =
    req.getOrElse(name,
      throw new GraftInvalidInputException(s"request missing field '$name'"))
}

object ProtectionService {
  private val mapper = new ObjectMapper()
  private final val MetaPrefix = "meta."

  private def errorResponse(message: String, status: Int): TransportResponse = {
    val node = mapper.createObjectNode()
    node.put("error", message)
    TransportResponse(status, mapper.writeValueAsString(node))
  }

  private def b64(bytes: Array[Byte]): String = Base64.getEncoder.encodeToString(bytes)
  private def unb64(s: String): Array[Byte] =
    try Base64.getDecoder.decode(s)
    catch { case e: IllegalArgumentException =>
      throw new GraftInvalidInputException(s"invalid base64 payload: ${e.getMessage}") }
}
