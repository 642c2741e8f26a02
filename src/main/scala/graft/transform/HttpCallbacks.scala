package graft.transform

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.{HttpURLConnection, InetSocketAddress, URI, URLDecoder, URLEncoder}

/**
 * Driver-hosted HTTP callback endpoint — the reference's Flask RPC server
 * (`/root/reference/fugue/rpc/flask.py:19`) re-based on the JDK's
 * built-in `HttpServer`: zero new dependencies, and the executor→driver
 * reachability it needs is reachability a Spark cluster already has
 * (executors talk to the driver for blocks and heartbeats).
 *
 * Relationship to [[CallbackChannel]]: the accumulator channel is the
 * default — fault-tolerant, no server, but posts become visible only at
 * task COMPLETION (Spark's accumulator contract). An HTTP post reaches
 * the driver handler IMMEDIATELY, mid-task — the property interactive
 * early-stop wants when partitions run long (cancel after the FIRST
 * progress message, not after the first finished task).
 *
 * Scale posture: a CONTROL channel, not a data path. Messages are small
 * and per-partition-rare (progress ticks, stop votes, metric samples);
 * the server runs a small fixed daemon pool, so posts from 1000
 * executors are fine while per-ROW posting is not — same contract the
 * reference's Flask server has.
 */
object HttpCallbacks {

  /**
   * The serializable executor-side handle: holds `host:port` plus the
   * server's shared-secret token, so it ships in task closures for free
   * and its posts authenticate. `post` raises on any non-200 — a
   * dead or unreachable endpoint is a loud failure, never a silent drop
   * (a dropped stop-vote would turn early-stop into run-to-completion).
   */
  final class HttpCallbackChannel private[HttpCallbacks] (
      val address: String,
      private[HttpCallbacks] val token: String) extends Serializable {
    def post(topic: String, message: String): Unit = {
      val conn = new URI(s"http://$address/cb").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(5000)
      conn.setRequestProperty("X-Graft-Token", token)
      conn.setRequestProperty("X-Graft-Topic",
        URLEncoder.encode(topic, "UTF-8"))
      val body = message.getBytes("UTF-8")
      conn.setFixedLengthStreamingMode(body.length)
      val os = conn.getOutputStream
      try os.write(body) finally os.close()
      // read the code BEFORE touching the input stream: on a non-200 the
      // JDK's getInputStream throws its own generic IOException, which
      // would mask the endpoint diagnostic below (review finding)
      val code = conn.getResponseCode
      if (code == 200) conn.getInputStream.close()
      else {
        Option(conn.getErrorStream).foreach(_.close())
        throw new IllegalArgumentException(
          s"callback endpoint $address returned $code")
      }
    }
  }

  /** Driver-side running server; `channel` is the handle to ship to
   * executors. Stop it when the action finishes — the pool is daemon so
   * a forgotten server never blocks JVM exit. */
  final class HttpCallbackServer private[HttpCallbacks] (
      server: HttpServer, pool: java.util.concurrent.ExecutorService,
      val channel: HttpCallbackChannel) {
    def address: String = channel.address
    /** Stops accepting AND shuts the dispatch pool down — HttpServer
     * .stop() alone leaves a user-supplied executor's core threads alive
     * forever (review finding: a conformance loop creating a server per
     * query would otherwise leak 4 threads per run). */
    def stop(): Unit = { server.stop(0); pool.shutdown() }
  }

  /**
   * Start the endpoint. `host` must be an address executors can reach —
   * the driver host on a real cluster (e.g.
   * `spark.conf.get("spark.driver.host")`), 127.0.0.1 for local[*];
   * port 0 lets the OS pick. `handler` runs on the server's dispatch
   * threads immediately per post — synchronize if it mutates shared
   * state, and keep it fast (it is on the executor's request path).
   */
  def start(host: String = "127.0.0.1", port: Int = 0)(
      handler: (String, String) => Unit): HttpCallbackServer = {
    // per-server random shared secret: the endpoint is reachable by any
    // network peer that can reach the driver host, and an unauthenticated
    // post would become query output rows or an early-stop vote (advisor
    // finding). The token ships inside the serializable channel — task
    // closures travel Spark's authenticated control plane — so only
    // holders of the channel can post. Not TLS (the reference's Flask
    // server has none either); it stops forgery, not eavesdropping.
    val token = {
      val b = new Array[Byte](16)
      new java.security.SecureRandom().nextBytes(b)
      b.map("%02x".format(_)).mkString
    }
    val srv = HttpServer.create(new InetSocketAddress(host, port), 64)
    srv.createContext("/cb", (ex: HttpExchange) => {
      try {
        // constant-time compare; no early return — a `return` here would
        // be a closure-crossing NonLocalReturnControl (the SAM lambda
        // belongs to start()'s frame)
        val sent = Option(
          ex.getRequestHeaders.getFirst("X-Graft-Token")).getOrElse("")
        if (!java.security.MessageDigest.isEqual(
            sent.getBytes("UTF-8"), token.getBytes("UTF-8"))) {
          ex.sendResponseHeaders(403, -1)
          ex.close()
        } else {
          val topic = URLDecoder.decode(
            Option(ex.getRequestHeaders.getFirst("X-Graft-Topic"))
              .getOrElse(""), "UTF-8")
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          handler(topic, body)
          val ok = "ok".getBytes("UTF-8")
          ex.sendResponseHeaders(200, ok.length.toLong)
          val os = ex.getResponseBody
          try os.write(ok) finally os.close()
        }
      } catch {
        case _: Exception =>
          // a handler failure is the DRIVER's bug; surface it to the
          // executor as a 500 so post() raises rather than proceeding
          // on a lost message
          ex.sendResponseHeaders(500, -1)
          ex.close()
      }
    })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
      (r: Runnable) => {
        val t = new Thread(r, "graft-http-callback")
        t.setDaemon(true)
        t
      })
    srv.setExecutor(pool)
    srv.start()
    new HttpCallbackServer(srv, pool,
      new HttpCallbackChannel(s"$host:${srv.getAddress.getPort}", token))
  }
}
