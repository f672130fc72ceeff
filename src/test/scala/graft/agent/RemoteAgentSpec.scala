package graft.agent

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{CryptoCodec, GraftInvalidInputException}
import graft.service.{ClientCredentialStore, ProtectionService}

/** Fault-injecting transport wrapped around the REAL in-process
  * [[ProtectionService]] — the crypto, JWT auth, and error envelope are all
  * production code; this wrapper only adds the failure toggles the
  * reference's remote-agent tests flip (`/root/reference/src/common/
  * dbpa_remote_test.cpp`): health failure, forced 401s (server-side token
  * revocation analog), and tampered response fields.
  */
final class FaultInjectingTransport(inner: ProtectionTransport) extends ProtectionTransport {
  var healthy = true
  /** Force the next N authenticated calls to 401 regardless of token. */
  var force401 = 0
  var tamperDecryptDatatype: Option[String] = None
  var tamperEncryptCompression: Option[String] = None
  // AtomicInteger: concurrent callers hit the wrapper in the single-flight test
  private val fetches = new java.util.concurrent.atomic.AtomicInteger
  private val encrypts = new java.util.concurrent.atomic.AtomicInteger
  private val decrypts = new java.util.concurrent.atomic.AtomicInteger
  private val unauthorized = new java.util.concurrent.atomic.AtomicInteger
  def tokenFetches: Int = fetches.get
  def encryptCalls: Int = encrypts.get
  def decryptCalls: Int = decrypts.get
  def unauthorizedCalls: Int = unauthorized.get

  override def get(endpoint: String, headers: Map[String, String]): TransportResponse =
    if (endpoint == "/healthz" && !healthy) TransportResponse(500, "", "connection refused")
    else inner.get(endpoint, headers)

  override def post(endpoint: String, body: String,
      headers: Map[String, String]): TransportResponse = {
    endpoint match {
      case "/token" => fetches.incrementAndGet()
      case "/encrypt" => encrypts.incrementAndGet()
      case "/decrypt" => decrypts.incrementAndGet()
      case _ =>
    }
    if (force401 > 0 && endpoint != "/token") {
      force401 -= 1
      unauthorized.incrementAndGet()
      return TransportResponse(401, """{"error": "Unauthorized: revoked"}""")
    }
    val resp = inner.post(endpoint, body, headers)
    if (resp.status == 401 && endpoint != "/token") unauthorized.incrementAndGet()
    tamper(endpoint, resp)
  }

  private def tamper(endpoint: String, resp: TransportResponse): TransportResponse = {
    if (resp.status != 200) return resp
    val patch: Map[String, String] = endpoint match {
      case "/decrypt" => tamperDecryptDatatype.map("datatype" -> _).toMap
      case "/encrypt" => tamperEncryptCompression.map("encrypted_compression" -> _).toMap
      case _ => Map.empty
    }
    if (patch.isEmpty) resp
    else resp.copy(body = FlatJson.write(FlatJson.parse(resp.body) ++ patch))
  }
}

/** Remote-agent parity suite — ports the highest-value cases of
  * `dbpa_remote_test.cpp` (init/health/user-id failures, successful
  * round trips, field mismatches) plus the token-cache/retry behavior of
  * `http_client_base_test.cpp`. Runs the full production stack in-process:
  * RemoteProtectionAgent → ProtectionServiceClient → ProtectionService with
  * real HS256 JWTs → LocalProtectionAgent. Pure JVM: no SparkSession needed.
  */
class RemoteAgentSpec extends AnyFunSuite {
  private val AppCtx = """{"user_id":"user-7"}"""
  private val Creds = Map("client_id" -> "graft", "api_key" -> "graft-api-key")

  private def mk(): (FaultInjectingTransport, RemoteProtectionAgent, Long => Unit) = {
    var now = 1700000000L
    val clock = () => now
    val store = new ClientCredentialStore("spec-jwt-secret", clock)
    store.init(Map("graft" -> "graft-api-key"))
    val transport = new FaultInjectingTransport(new ProtectionService(store))
    val agent = new RemoteProtectionAgent(transport, Creds, clock)
    (transport, agent, (d: Long) => now += d)
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

  test("init fails on empty key_id with a matching init error") {
    val (_, agent, _) = mk()
    val e = intercept[GraftInvalidInputException] {
      agent.init("email", AppCtx, "", StringType)
    }
    assert(e.getMessage == "key_id must be non-empty")
    val e2 = intercept[GraftInvalidInputException] { agent.encrypt(Seq("x")) }
    assert(e2.getMessage.contains("key_id is empty"))
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

  test("concurrent first calls single-flight the token fetch") {
    val (server, agent, _) = mk()
    agent.init("email", AppCtx, "k1", StringType)
    val threads = (1 to 8).map { i =>
      new Thread(() => { agent.encrypt(Seq(s"v$i")): Unit })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    assert(server.tokenFetches == 1,
      s"8 concurrent callers should share one fetch, saw ${server.tokenFetches}")
    assert(server.encryptCalls == 8)
    assert(server.unauthorizedCalls == 0)
  }

  test("cached token is refreshed inside the expiry-skew window, no 401") {
    val (server, agent, advance) = mk()
    agent.init("email", AppCtx, "k1", StringType)
    agent.encrypt(Seq("a"))
    assert(server.tokenFetches == 1)
    // 31s before real expiry: still outside the 30s skew → cache holds
    advance(ClientCredentialStore.JwtExpirationSeconds - 31)
    agent.encrypt(Seq("b"))
    assert(server.tokenFetches == 1)
    // cross into the skew window → client must proactively refetch
    advance(1)
    agent.encrypt(Seq("c"))
    assert(server.tokenFetches == 2)
    assert(server.unauthorizedCalls == 0) // refreshed BEFORE the call, no 401
  }

  test("server-side revocation triggers exactly one 401-retry with fresh token") {
    val (server, agent, _) = mk()
    agent.init("email", AppCtx, "k1", StringType)
    val values = Seq("x", "y")
    val expected = agent.encrypt(values)
    server.force401 = 1 // cached token still "valid" client-side, server says no
    val batch = agent.encrypt(values) // 401 → invalidate → refetch → retry
    assert(batch.payload.sameElements(expected.payload))
    assert(server.unauthorizedCalls == 1)
    assert(server.tokenFetches == 2)
  }

  test("requests without a real signed token are 401ed by the service") {
    val (server, _, _) = mk()
    // bypass the client: post straight to the service with junk auth
    val resp = server.post("/encrypt", "{}",
      Map("Authorization" -> "Bearer not.a.jwt", "Content-Type" -> "application/json"))
    assert(resp.status == 401)
    assert(resp.body.contains("Unauthorized"))
    assert(server.post("/encrypt", "{}", Map.empty).status == 401)
  }

  test("statusz is Bearer-protected and reports the credential-check flag") {
    var now = 1700000000L
    val store = new ClientCredentialStore("spec-jwt-secret", () => now)
    store.init(Map("graft" -> "graft-api-key"))
    val service = new ProtectionService(store)
    assert(service.get("/statusz", Map.empty).status == 401)
    val tokenResp = service.post("/token", FlatJson.write(Creds), Map.empty)
    val token = FlatJson.parse(tokenResp.body)("token")
    val ok = service.get("/statusz", Map("Authorization" -> s"Bearer $token"))
    assert(ok.status == 200 && ok.body.contains("\"enable_credential_check\":true"))
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
    var now = 1700000000L
    val store = new ClientCredentialStore("spec-jwt-secret", () => now)
    store.init(Map("graft" -> "graft-api-key"))
    val service = new ProtectionService(store)
    val agent = new RemoteProtectionAgent(service,
      Map("client_id" -> "graft", "api_key" -> "wrong"), () => now)
    agent.init("email", AppCtx, "k1", StringType) // health is authless → init OK
    val e = intercept[GraftInvalidInputException] { agent.encrypt(Seq("a")) }
    assert(e.getMessage.contains("status code: 401"))
    assert(e.getMessage.contains("Invalid credentials"))
  }
}
