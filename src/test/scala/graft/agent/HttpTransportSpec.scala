package graft.agent

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.CryptoCodec
import graft.service.{ClientCredentialStore, HttpProtectionServer, ProtectionService}

/** The remote stack over REAL loopback sockets: RemoteProtectionAgent →
  * ProtectionServiceClient → [[HttpPooledTransport]] (bounded keep-alive
  * pool) → [[HttpProtectionServer]] → ProtectionService. Ports the pool
  * behaviors of `httplib_pool_registry_test.cpp` /
  * `httplib_pooled_client_test.cpp`: reuse, exhaustion with borrow timeout,
  * idle pruning, read timeout, and the retry-once-with-fresh-connection
  * discipline.
  */
class HttpTransportSpec extends AnyFunSuite {
  private val AppCtx = """{"user_id":"user-7"}"""
  private val Creds = Map("client_id" -> "graft", "api_key" -> "graft-api-key")

  private def withServer[A](transport: ProtectionTransport)(
      f: HttpProtectionServer => A): A = {
    val server = new HttpProtectionServer(transport).start()
    try f(server) finally server.stop()
  }

  private def service(): ProtectionService = {
    val store = new ClientCredentialStore("spec-jwt-secret")
    store.init(Map("graft" -> "graft-api-key"))
    new ProtectionService(store)
  }

  /** Sleeps on authenticated POSTs — makes pool contention reproducible. */
  private final class SlowTransport(inner: ProtectionTransport, delayMs: Long)
      extends ProtectionTransport {
    override def get(e: String, h: Map[String, String]): TransportResponse = inner.get(e, h)
    override def post(e: String, b: String, h: Map[String, String]): TransportResponse = {
      if (e != "/token") Thread.sleep(delayMs)
      inner.post(e, b, h)
    }
  }

  /** Counts concurrent in-flight POST handlers — observes, server-side,
    * whether the client's worker queue actually bounds concurrency.
    */
  private final class TrackingTransport(inner: ProtectionTransport, delayMs: Long)
      extends ProtectionTransport {
    val calls = new java.util.concurrent.atomic.AtomicInteger
    private val inFlight = new java.util.concurrent.atomic.AtomicInteger
    val maxInFlight = new java.util.concurrent.atomic.AtomicInteger
    override def get(e: String, h: Map[String, String]): TransportResponse = inner.get(e, h)
    override def post(e: String, b: String, h: Map[String, String]): TransportResponse = {
      val n = inFlight.incrementAndGet()
      maxInFlight.getAndAccumulate(n, Math.max(_, _))
      try { Thread.sleep(delayMs); calls.incrementAndGet(); inner.post(e, b, h) }
      finally inFlight.decrementAndGet(): Unit
    }
  }

  test("A6 worker mode caps in-flight concurrency while queued callers all complete") {
    val tracking = new TrackingTransport(service(), delayMs = 150)
    withServer(tracking) { server =>
      val transport = new HttpPooledTransport("127.0.0.1", server.boundPort,
        PoolConfig(), workerThreads = 2)
      try {
        // 6 callers submit at once; the reference's pooled client executes on
        // worker_count_ threads and callers block on the future — so the
        // server must never see more than 2 concurrent requests
        val threads = (1 to 6).map(_ => new Thread(() => {
          transport.post("/encrypt", "{}", Map.empty): Unit
        }))
        threads.foreach(_.start())
        threads.foreach(_.join(30000))
        assert(tracking.calls.get() == 6, s"only ${tracking.calls.get()}/6 completed")
        assert(tracking.maxInFlight.get() <= 2,
          s"worker queue leaked: ${tracking.maxInFlight.get()} concurrent > 2 workers")
      } finally transport.shutdown()
    }
  }

  test("shutdown refuses new requests instead of opening fresh sockets") {
    withServer(service()) { server =>
      val transport = new HttpPooledTransport("127.0.0.1", server.boundPort)
      assert(transport.get("/healthz", Map.empty).body == "OK")
      transport.shutdown()
      val r = transport.get("/healthz", Map.empty)
      assert(r.status == 0 && r.error.contains("shut down"), r)
      assert(transport.connectionsCreated == 1,
        s"post-shutdown request opened a socket (created=${transport.connectionsCreated})")
    }
  }

  test("remote agent over real sockets matches the local agent byte-for-byte") {
    withServer(service()) { server =>
      val transport = new HttpPooledTransport("127.0.0.1", server.boundPort)
      try {
        val agent = new RemoteProtectionAgent(transport, Creds)
        agent.init("email", AppCtx, "k1", StringType)
        val values = Seq("a@b.c", null, "", "café 🚀")
        val batch = agent.encrypt(values)
        assert(agent.decrypt(batch) == values)
        val local = LocalProtectionAgent.init("k1", "email", StringType,
          CryptoCodec.Xor, "user-7", AppCtx)
        assert(batch.payload.sameElements(local.encrypt(values).payload))
        assert(local.decrypt(batch) == values)
      } finally transport.shutdown()
    }
  }

  test("sequential calls reuse one keep-alive connection") {
    withServer(service()) { server =>
      val transport = new HttpPooledTransport("127.0.0.1", server.boundPort)
      try {
        val agent = new RemoteProtectionAgent(transport, Creds)
        agent.init("email", AppCtx, "k1", StringType)
        for (i <- 1 to 5) assert(agent.decrypt(agent.encrypt(Seq(s"v$i"))) == Seq(s"v$i"))
        // healthz + token + 10 protected calls, all sequential → 1 socket
        assert(transport.connectionsCreated == 1,
          s"expected 1 pooled connection, created ${transport.connectionsCreated}")
      } finally transport.shutdown()
    }
  }

  test("pool exhaustion: borrow times out with the pool-size error") {
    withServer(new SlowTransport(service(), delayMs = 400)) { server =>
      val transport = new HttpPooledTransport("127.0.0.1", server.boundPort,
        PoolConfig(maxPoolSize = 1, borrowTimeoutMs = 50))
      try {
        val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val threads = (1 to 2).map { _ =>
          new Thread(() => {
            val r = transport.post("/encrypt", "{}", Map.empty)
            if (r.error.nonEmpty) errors.add(r.error): Unit
          })
        }
        threads.foreach(_.start())
        threads.foreach(_.join(10000))
        // one caller held the single connection for 400ms; the other's
        // 50ms borrow wait must expire
        assert(errors.size == 1, s"errors: $errors")
        assert(errors.peek().contains("timed out borrowing"))
      } finally transport.shutdown()
    }
  }

  test("read timeout surfaces as a clean transport error, not a hang") {
    withServer(new SlowTransport(service(), delayMs = 800)) { server =>
      val transport = new HttpPooledTransport("127.0.0.1", server.boundPort,
        PoolConfig(readTimeoutMs = 100))
      try {
        val start = System.currentTimeMillis()
        val r = transport.post("/encrypt", "{}", Map.empty)
        val elapsed = System.currentTimeMillis() - start
        assert(r.status == 0 && r.error.contains("timed out"), r)
        assert(elapsed < 5000, s"timeout took ${elapsed}ms")
      } finally transport.shutdown()
    }
  }

  test("idle connections past max_idle_time are pruned and replaced") {
    withServer(service()) { server =>
      val transport = new HttpPooledTransport("127.0.0.1", server.boundPort,
        PoolConfig(maxIdleTimeMs = 50))
      try {
        assert(transport.get("/healthz", Map.empty).body == "OK")
        Thread.sleep(200) // connection sits idle past the 50ms bound
        assert(transport.get("/healthz", Map.empty).body == "OK")
        assert(transport.connectionsCreated == 2,
          s"stale connection should be pruned, created=${transport.connectionsCreated}")
      } finally transport.shutdown()
    }
  }

  test("unknown endpoints and bad tokens pass status codes through the socket") {
    withServer(service()) { server =>
      val transport = new HttpPooledTransport("127.0.0.1", server.boundPort)
      try {
        assert(transport.get("/nope", Map.empty).status == 404)
        val r = transport.post("/encrypt", "{}",
          Map("Authorization" -> "Bearer junk"))
        assert(r.status == 401 && r.body.contains("Unauthorized"))
      } finally transport.shutdown()
    }
  }
}
