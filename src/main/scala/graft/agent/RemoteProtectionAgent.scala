package graft.agent

import java.util.Base64

import org.apache.spark.sql.types.DataType

import graft.core._
import graft.pipeline.ProtectionPipeline

/** Remote protection agent — parity surface for the reference's
  * `RemoteDataBatchProtectionAgent` (`/root/reference/src/common/dbpa_remote.cpp:170-365`):
  * same batch interface as [[LocalProtectionAgent]], but every call crosses a
  * serialization boundary to a protection service through an injected
  * [[ProtectionTransport]] (the reference injects its HTTP client the same
  * way, `dbpa_remote.cpp:164-168`).
  *
  * Reference semantics reproduced:
  *  - construct-then-`init` lifecycle; `encrypt`/`decrypt` before a
  *    successful `init` fail with the not-initialized error
  *    (`dbpa_remote.cpp:246-259`);
  *  - `init` requires a non-empty `app_context` carrying a JSON `user_id`
  *    (`ExtractUserId`, `dbpa_utils.h:43-56`) and performs a `/healthz`
  *    check that must return "OK" (`dbpa_remote.cpp:223-231`);
  *  - request/response **field-match validation**: encrypt responses must
  *    echo the request compression (`ValidateEncryptFieldMatch`,
  *    `dbpa_remote.cpp:286-296`); decrypt responses must echo datatype and
  *    compression (`dbpa_remote.cpp:345-361`);
  *  - auth: token fetch/cache/expiry-skew/retry-once-on-401 lives in
  *    [[ProtectionServiceClient]] (`http_client_base.cpp:39-199`).
  */
final class RemoteProtectionAgent(
    transport: ProtectionTransport,
    credentials: Map[String, String] = Map("client_id" -> "graft"),
    clock: () => Long = () => System.currentTimeMillis() / 1000L) {

  import RemoteProtectionAgent._

  private val client = new ProtectionServiceClient(transport, credentials, clock)

  // None = initialized OK; Some(msg) = not (yet) initialized — mirrors the
  // reference's optional<string> initialized_ (`dbpa_remote.h`).
  private var initError: Option[String] = Some(NotInitialized)
  private var columnName: String = _
  private var keyId: String = _
  private var appContext: String = _
  private var userId: String = _
  private var dataType: DataType = _
  private var codecName: String = _

  /** Bind the column context and verify server connectivity
    * (`RemoteDataBatchProtectionAgent::init`, `dbpa_remote.cpp:170-244`).
    */
  def init(columnName: String, appContext: String, keyId: String,
      dataType: DataType, codec: String = CryptoCodec.Xor): Unit = {
    initError = Some("Agent not properly initialized - incomplete")
    if (appContext.isEmpty) {
      initError = Some("Agent not properly initialized - app_context is empty")
      throw new GraftInvalidInputException("app_context is empty")
    }
    val uid = extractUserId(appContext).getOrElse {
      initError = Some("Agent not properly initialized - user_id missing")
      throw new GraftInvalidInputException("No user_id provided in app_context")
    }
    if (keyId.isEmpty) { // P7, same error family as every other init failure
      initError = Some("Agent not properly initialized - key_id is empty")
      throw new GraftInvalidInputException("key_id must be non-empty")
    }
    val health = client.healthCheck()
    if (health != "OK") {
      initError = Some("Agent not properly initialized - healthz check failed")
      throw new GraftInvalidInputException(s"Health check failed: $health")
    }
    this.columnName = columnName
    this.keyId = keyId
    this.appContext = appContext
    this.userId = uid
    this.dataType = dataType
    this.codecName = codec
    initError = None
  }

  /** Encrypt one column batch through the service. Same contract as
    * [[LocalProtectionAgent.encrypt]] — remote and local agents are
    * interchangeable for a caller holding value batches.
    */
  def encrypt(values: Seq[Any]): EncryptedBatch = {
    initError.foreach(e => throw new GraftInvalidInputException(e))
    val fields = requestFields + ("plaintext" -> b64(PlainBatch.pack(dataType, values)))
    val body = call("/encrypt", fields)
    // field match: response compression must echo the request
    // (`ValidateEncryptFieldMatch`, dbpa_remote.cpp:286-296)
    fieldMatch(body.getOrElse("encrypted_compression", ""), Compression,
      "encrypted_compression", "Encrypt")
    val meta = body.collect {
      case (k, v) if k.startsWith(MetaPrefix) => k.stripPrefix(MetaPrefix) -> v
    }
    EncryptedBatch(unb64(body.getOrElse("ciphertext",
      throw new GraftInvalidInputException("encrypt response missing ciphertext"))), meta)
  }

  /** Inverse of [[encrypt]], with the decrypt-side field-match checks
    * (`dbpa_remote.cpp:345-361`).
    */
  def decrypt(batch: EncryptedBatch): Seq[Any] = {
    initError.foreach(e => throw new GraftInvalidInputException(e))
    val fields = requestFields +
      ("ciphertext" -> b64(batch.payload)) ++
      batch.metadata.map { case (k, v) => (MetaPrefix + k) -> v }
    val body = call("/decrypt", fields)
    fieldMatch(body.getOrElse("datatype", ""), dataType.json, "datatype", "Decrypt")
    fieldMatch(body.getOrElse("compression", ""), Compression, "compression", "Decrypt")
    PlainBatch.unpack(dataType, unb64(body.getOrElse("plaintext",
      throw new GraftInvalidInputException("decrypt response missing plaintext"))))
  }

  private def requestFields: Map[String, String] = Map(
    "column_name" -> columnName,
    "datatype" -> dataType.json,
    "codec" -> codecName,
    "compression" -> Compression,
    "key_id" -> keyId,
    "user_id" -> userId,
    "app_context" -> appContext)

  private def call(endpoint: String, fields: Map[String, String]): Map[String, String] = {
    val resp = client.post(endpoint, fields)
    if (!resp.ok)
      throw new GraftInvalidInputException(
        if (resp.error.nonEmpty) resp.error
        else s"$endpoint failed with status ${resp.status}: ${resp.body}")
    val body = FlatJson.parse(resp.body)
    body.get("error_message").foreach(m =>
      throw new GraftInvalidInputException(m))
    body
  }

  private def fieldMatch(responseValue: String, requestValue: String,
      fieldName: String, op: String): Unit =
    if (responseValue != requestValue)
      throw new GraftInvalidInputException(
        s"$op response $fieldName mismatch: expected $requestValue, got $responseValue")
}

object RemoteProtectionAgent {
  final val NotInitialized = "Agent not initialized - init() was not called"
  /** The engine hands the service uncompressed value batches (compression is
    * the Parquet writer's job in this architecture — SURVEY §1.3).
    */
  final val Compression = "UNCOMPRESSED"
  private final val MetaPrefix = "meta."

  private def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
  private def unb64(s: String): Array[Byte] =
    try Base64.getDecoder.decode(s)
    catch { case e: IllegalArgumentException =>
      throw new GraftInvalidInputException(s"invalid base64 payload: ${e.getMessage}") }

  /** `ExtractUserId` (`dbpa_utils.h:43-56`): app_context is JSON with a
    * non-empty string `user_id`.
    */
  def extractUserId(appContext: String): Option[String] =
    try FlatJson.parse(appContext).get("user_id").filter(_.nonEmpty)
    catch { case _: Exception => None }
}

/** Plaintext batch wire form shared by the remote agent and the service:
  * `[u32 LE presence_len][presence bytes][value list]` with the value list in
  * the §1.5 layout but an identity codec — the same framing the encrypted
  * path uses, so both sides reuse [[WireFormat]]'s strict parsers.
  */
private[graft] object PlainBatch {
  private object PlainCodec extends CryptoCodec {
    val name = "plain"
    val deterministic = true
    def encrypt(data: Array[Byte]): Array[Byte] = data
    def decrypt(data: Array[Byte]): Array[Byte] = data
  }

  def pack(dataType: DataType, values: Seq[Any]): Array[Byte] = {
    val presence = values.map(v => if (v == null) 0.toByte else 1.toByte).toArray
    val present = values.filter(_ != null)
      .map(v => ValueSerde.serialize(dataType, ExternalSerde.toCatalyst(dataType, v)))
    WireFormat.joinWithLengthPrefix(presence,
      WireFormat.encryptValueList(PlainCodec, present, ValueSerde.fixedWidth(dataType)))
  }

  def unpack(dataType: DataType, payload: Array[Byte]): Seq[Any] = {
    val (presence, valueBytes) = WireFormat.splitWithLengthPrefix(payload)
    val values = WireFormat.decryptValueList(PlainCodec, valueBytes)
    if (presence.count(_ != 0) != values.size)
      throw new GraftInvalidInputException(
        s"presence mask claims ${presence.count(_ != 0)} values but payload holds ${values.size}")
    val it = values.iterator
    presence.map { p =>
      if (p == 0) null
      else ExternalSerde.fromCatalyst(dataType, ValueSerde.deserialize(dataType, it.next()))
    }.toSeq
  }
}
