package graft.agent

import java.io.IOException
import java.net.SocketTimeoutException

/** Non-pooled HTTP transport — the reference's SIMPLE client next to the
  * pooled one (`src/client/httplib_client.cpp`: a fresh `httplib::Client`
  * per call with 10 s connect / 30 s read timeouts, no reuse, no retry;
  * errors come back as a status-0 response with a message, never a throw).
  * One socket per request: the right transport for low-rate callers (an
  * init probe, a CLI) where pool bookkeeping buys nothing.
  */
final class HttpSimpleTransport(host: String, port: Int,
    connectTimeoutMs: Long = 10 * 1000, readTimeoutMs: Long = 30 * 1000)
    extends ProtectionTransport {

  // only the two timeouts matter for a one-shot connection; pool fields idle
  private val cfg = PoolConfig(connectTimeoutMs = connectTimeoutMs,
    readTimeoutMs = readTimeoutMs)

  override def get(endpoint: String, headers: Map[String, String]): TransportResponse =
    request("GET", endpoint, "", headers)

  override def post(endpoint: String, body: String,
      headers: Map[String, String]): TransportResponse =
    request("POST", endpoint, body, headers)

  private def request(method: String, endpoint: String, body: String,
      headers: Map[String, String]): TransportResponse = {
    val conn = new HttpPooledTransport.PooledConnection(host, port, cfg)
    try conn.roundTrip(method, endpoint, body, headers)
    catch {
      case e: SocketTimeoutException =>
        TransportResponse(0, "",
          s"$method $endpoint timed out after $readTimeoutMs ms: ${e.getMessage}")
      case e: IOException =>
        // the simple client reports and returns — no retry, no pooling
        TransportResponse(0, "",
          s"$method request failed for endpoint $endpoint: ${e.getMessage}")
    } finally conn.close()
  }
}
