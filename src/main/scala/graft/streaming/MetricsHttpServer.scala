package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** HTTP exposition of [[LiveSinkStats.scrape]] — the reference's
  * `--metrics-listen-addr` operational surface
  * (cmd/substreams-sink-clickhouse/main.go:28, default `localhost:9102`):
  * `GET /metrics` serves the Prometheus text format rendered from every
  * module's live sink counters, so an unmodified reference dashboard can
  * point its scraper at a running graft sink.
  *
  * JDK-built-in `com.sun.net.httpserver` — zero dependencies, and a scrape
  * is a cheap in-memory render, so the dispatcher thread serves directly.
  */
final class MetricsHttpServer private[streaming] (server: HttpServer) {
  def port: Int = server.getAddress.getPort
  def address: String = s"${server.getAddress.getHostString}:$port"
  def stop(): Unit = server.stop(0)
}

object MetricsHttpServer {

  /** Bind `addr` and start serving `/metrics`; any other path is 404 (the
    * JDK server matches contexts by PREFIX, so the handler re-checks the
    * exact path). Accepted forms: `host:port`, bare `host` (port 9102),
    * bracketed IPv6 `[::1]:port`, port 0 → ephemeral (for tests).
    */
  def start(addr: String = "localhost:9102"): MetricsHttpServer = {
    val (host, port) =
      if (addr.startsWith("[")) { // [v6]:port
        val close = addr.indexOf(']')
        require(close > 0, s"unclosed IPv6 bracket in $addr")
        val rest = addr.substring(close + 1)
        (addr.substring(1, close),
          if (rest.startsWith(":")) rest.drop(1).toInt else 9102)
      } else addr.lastIndexOf(':') match {
        case -1 => (addr, 9102)
        case i  => (addr.substring(0, i), addr.substring(i + 1).toInt)
      }
    val server = HttpServer.create(new InetSocketAddress(host, port), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        if (ex.getRequestURI.getPath != "/metrics") {
          ex.sendResponseHeaders(404, -1L)
          ex.close()
        } else {
          val body = LiveSinkStats.scrape().getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type",
            "text/plain; version=0.0.4; charset=utf-8")
          ex.sendResponseHeaders(200, body.length.toLong)
          val os = ex.getResponseBody
          try os.write(body) finally os.close()
        }
      }
    })
    server.setExecutor(null)
    server.start()
    new MetricsHttpServer(server)
  }
}
