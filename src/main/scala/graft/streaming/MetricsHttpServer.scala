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

  /** Bind `addr` (`host:port`; port 0 → ephemeral, for tests) and start
    * serving `/metrics`. Any other path is 404, matching a standard
    * exporter's surface.
    */
  def start(addr: String = "localhost:9102"): MetricsHttpServer = {
    val (host, port) = addr.lastIndexOf(':') match {
      case -1 => (addr, 9102)
      case i  => (addr.substring(0, i), addr.substring(i + 1).toInt)
    }
    val server = HttpServer.create(new InetSocketAddress(host, port), 0)
    server.createContext("/metrics", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = LiveSinkStats.scrape().getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type",
          "text/plain; version=0.0.4; charset=utf-8")
        ex.sendResponseHeaders(200, body.length.toLong)
        val os = ex.getResponseBody
        try os.write(body) finally os.close()
      }
    })
    server.setExecutor(null)
    server.start()
    new MetricsHttpServer(server)
  }
}
