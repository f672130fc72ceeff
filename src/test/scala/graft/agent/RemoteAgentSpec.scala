package graft.agent

import java.util.Base64

import scala.collection.mutable

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{CryptoCodec, GraftInvalidInputException}

/** In-process protection service standing in for the reference's DBPS API
  * server, with the failure toggles its remote-agent tests flip
  * (`/root/reference/src/common/dbpa_remote_test.cpp`): health failure,
  * token issuing/expiry/revocation, tampered response fields. Crypto is the
  * real [[LocalProtectionAgent]] — the boundary (serialize → transport →
  * deserialize) is what this harness adds.
  */
final class MockProtectionServer(clock: () => Long) extends ProtectionTransport {
  var healthy = true
  var tokenTtlSeconds: Long = 3600L
  var requireClientId = "graft"
  var tamperDecryptDatatype: Option[String] = None
  var tamperEncryptCompression: Option[String] = None
  var tokenFetches = 0
  var encryptCalls = 0
  var decryptCalls = 0
  var unauthorizedCalls = 0

  private val liveTokens = mutable.Map.empty[String, Long] // token -> expires_at
  private var nextToken = 0

  /** Server-side revocation: the client's cached token stops working even
    * though its expires_at still looks valid (the 401-retry path's trigger).
    */
  def revokeAllTokens(): Unit = liveTokens.clear()

  override def get(endpoint: String, headers: Map[String, String]): TransportResponse =
    endpoint match {
      case "/healthz" =>
        if (healthy) TransportResponse(200, "OK")
        else TransportResponse(500, "", "connection refused")
      case other => TransportResponse(404, "", s"no such endpoint $other")
    }

  override def post(endpoint: String, body: String,
      headers: Map[String, String]): TransportResponse = endpoint match {
    case "/token" =>
      tokenFetches += 1
      val creds = FlatJson.parse(body)
      if (!creds.get("client_id").contains(requireClientId))
        TransportResponse(401, "", "invalid credentials")
      else {
        nextToken += 1
        val tok = s"tok-$nextToken"
        val exp = clock() + tokenTtlSeconds
        liveTokens(tok) = exp
        TransportResponse(200, FlatJson.write(Map(
          "token" -> tok, "token_type" -> "Bearer", "expires_at" -> exp.toString)))
      }
    case "/encrypt" | "/decrypt" =>
      if (!authorized(headers)) {
        unauthorizedCalls += 1
        TransportResponse(401, "", "")
      } else {
        val req = FlatJson.parse(body)
        try {
          val dt = DataType.fromJson(req("datatype"))
          val agent = LocalProtectionAgent.init(req("key_id"), req("column_name"),
            dt, req("codec"), req("user_id"), req("app_context"))
          if (endpoint == "/encrypt") {
            encryptCalls += 1
            val values = PlainBatch.unpack(dt,
              Base64.getDecoder.decode(req("plaintext")))
            val batch = agent.encrypt(values)
            TransportResponse(200, FlatJson.write(Map(
              "ciphertext" -> Base64.getEncoder.encodeToString(batch.payload),
              "encrypted_compression" ->
                tamperEncryptCompression.getOrElse(req("compression"))) ++
              batch.metadata.map { case (k, v) => s"meta.$k" -> v }))
          } else {
            decryptCalls += 1
            val meta = req.collect {
              case (k, v) if k.startsWith("meta.") => k.stripPrefix("meta.") -> v
            }
            val values = agent.decrypt(EncryptedBatch(
              Base64.getDecoder.decode(req("ciphertext")), meta))
            TransportResponse(200, FlatJson.write(Map(
              "plaintext" -> Base64.getEncoder.encodeToString(
                PlainBatch.pack(dt, values)),
              "datatype" -> tamperDecryptDatatype.getOrElse(req("datatype")),
              "compression" -> req("compression"))))
          }
        } catch {
          case e: Exception =>
            TransportResponse(200, FlatJson.write(Map(
              "error_message" -> e.getMessage)))
        }
      }
    case other => TransportResponse(404, "", s"no such endpoint $other")
  }

  private def authorized(headers: Map[String, String]): Boolean =
    headers.get(ProtectionServiceClient.AuthorizationHeader) match {
      case Some(auth) if auth.startsWith("Bearer ") =>
        val tok = auth.stripPrefix("Bearer ")
        liveTokens.get(tok).exists(_ > clock())
      case _ => false
    }
}

/** Remote-agent parity suite — ports the highest-value cases of
  * `dbpa_remote_test.cpp` (init/health/user-id failures, successful
  * round trips, field mismatches) plus the token-cache/retry behavior of
  * `http_client_base_test.cpp`. Pure JVM: no SparkSession needed.
  */
class RemoteAgentSpec extends AnyFunSuite {
  private val AppCtx = """{"user_id":"user-7"}"""

  private def mk(ttl: Long = 3600L): (MockProtectionServer, RemoteProtectionAgent, () => Long) = {
    var now = 1000000L
    val clock = () => now
    val server = new MockProtectionServer(clock)
    server.tokenTtlSeconds = ttl
    val agent = new RemoteProtectionAgent(server, Map("client_id" -> "graft"), clock)
    (server, agent, () => { now += 1; now })
  }

  test("encrypt/decrypt before init fail with not-initialized error") {
    val (_, agent, _) = mk() // DecryptWithoutInit (dbpa_remote_test.cpp:361)
    val e = intercept[GraftInvalidInputException] { agent.encrypt(Seq(1)) }
    assert(e.getMessage.contains("init() was not called"))
    intercept[GraftInvalidInputException] {
      agent.decrypt(EncryptedBatch(Array[Byte](1), Map.empty))
    }
  }

  test("init fails when health check fails, and agent stays unusable") {
    val (server, agent, _) = mk() // HealthCheckFailure (dbpa_remote_test.cpp:422)
    server.healthy = false
    val e = intercept[GraftInvalidInputException] {
      agent.init("email", AppCtx, "k1", StringType)
    }
    assert(e.getMessage.startsWith("Health check failed"))
    val e2 = intercept[GraftInvalidInputException] { agent.encrypt(Seq("x")) }
    assert(e2.getMessage.contains("healthz check failed"))
  }

  test("init fails on empty app_context") {
    val (_, agent, _) = mk()
    val e = intercept[GraftInvalidInputException] {
      agent.init("email", "", "k1", StringType)
    }
    assert(e.getMessage == "app_context is empty")
  }

  test("init fails when app_context has no user_id") {
    val (_, agent, _) = mk() // MissingUserId (dbpa_remote_test.cpp:390)
    for (ctx <- Seq("""{"other":"x"}""", """{"user_id":""}""", "not json")) {
      val e = intercept[GraftInvalidInputException] {
        agent.init("email", ctx, "k1", StringType)
      }
      assert(e.getMessage == "No user_id provided in app_context")
    }
  }

  test("successful round trip through the service boundary, nulls preserved") {
    val (server, agent, _) = mk() // SuccessfulEncryption/Decryption
    agent.init("email", AppCtx, "k1", StringType)
    val values = Seq("user1@example.com", null, "café 🚀 树 🌍", "", "user2@example.com")
    val batch = agent.encrypt(values)
    assert(batch.metadata("encrypt_codec") == CryptoCodec.Xor)
    assert(agent.decrypt(batch) == values)
    assert(server.encryptCalls == 1 && server.decryptCalls == 1)
  }

  test("remote and local agents are interchangeable (same context, same bytes)") {
    val (_, agent, _) = mk()
    agent.init("score", AppCtx, "k9", IntegerType, CryptoCodec.AesDet)
    val local = LocalProtectionAgent.init("k9", "score", IntegerType,
      CryptoCodec.AesDet, "user-7", AppCtx)
    val values = Seq(3344, null, 5566, 7788)
    // remote-encrypted batch decrypts locally and vice versa
    assert(local.decrypt(agent.encrypt(values)) == values)
    assert(agent.decrypt(local.encrypt(values)) == values)
  }

  test("token is fetched once and cached across calls") {
    val (server, agent, _) = mk()
    agent.init("email", AppCtx, "k1", StringType)
    val b = agent.encrypt(Seq("a", "b"))
    agent.decrypt(b)
    agent.encrypt(Seq("c"))
    assert(server.tokenFetches == 1, s"expected 1 token fetch, got ${server.tokenFetches}")
  }

  test("expired cached token is refreshed before use (expiry skew)") {
    var now = 1000000L
    val clock = () => now
    val server = new MockProtectionServer(clock)
    server.tokenTtlSeconds = 100L
    val agent = new RemoteProtectionAgent(server, Map("client_id" -> "graft"), clock)
    agent.init("email", AppCtx, "k1", StringType)
    agent.encrypt(Seq("a"))
    assert(server.tokenFetches == 1)
    now += 200L // past expires_at → client must proactively refetch
    agent.encrypt(Seq("b"))
    assert(server.tokenFetches == 2)
    assert(server.unauthorizedCalls == 0) // refreshed BEFORE the call, no 401
  }

  test("server-side revocation triggers exactly one 401-retry with fresh token") {
    val (server, agent, _) = mk()
    agent.init("email", AppCtx, "k1", StringType)
    val values = Seq("x", "y")
    val expected = agent.encrypt(values)
    server.revokeAllTokens() // cached token still "valid" client-side
    val batch = agent.encrypt(values) // 401 → invalidate → refetch → retry
    assert(batch.payload.sameElements(expected.payload))
    assert(server.unauthorizedCalls == 1)
    assert(server.tokenFetches == 2)
  }

  test("decrypt response datatype mismatch is rejected") {
    val (server, agent, _) = mk() // DecryptionFieldMismatch (dbpa_remote_test.cpp:539)
    agent.init("email", AppCtx, "k1", StringType)
    val batch = agent.encrypt(Seq("a"))
    server.tamperDecryptDatatype = Some(IntegerType.json)
    val e = intercept[GraftInvalidInputException] { agent.decrypt(batch) }
    assert(e.getMessage.contains("Decrypt response datatype mismatch"))
  }

  test("encrypt response compression mismatch is rejected") {
    val (server, agent, _) = mk() // EncryptionFieldMismatch (dbpa_remote_test.cpp:611)
    agent.init("email", AppCtx, "k1", StringType)
    server.tamperEncryptCompression = Some("SNAPPY")
    val e = intercept[GraftInvalidInputException] { agent.encrypt(Seq("a")) }
    assert(e.getMessage.contains("Encrypt response encrypted_compression mismatch"))
  }

  test("server-side agent errors propagate as clean failures") {
    val (_, agent, _) = mk()
    agent.init("email", AppCtx, "k1", StringType)
    val batch = agent.encrypt(Seq("a"))
    // tamper the version stamp → the SERVER's decrypt-side version check fires
    val bad = batch.copy(metadata = batch.metadata + ("dbps_agent_version" -> "v9.99"))
    val e = intercept[GraftInvalidInputException] { agent.decrypt(bad) }
    assert(e.getMessage.contains("unsupported agent version"))
  }

  test("credential rejection surfaces as a token-fetch error") {
    var now = 1000000L
    val server = new MockProtectionServer(() => now)
    val agent = new RemoteProtectionAgent(server, Map("client_id" -> "wrong"), () => now)
    agent.init("email", AppCtx, "k1", StringType) // health is authless → init OK
    val e = intercept[GraftInvalidInputException] { agent.encrypt(Seq("a")) }
    assert(e.getMessage.contains("status code: 401"))
  }
}
