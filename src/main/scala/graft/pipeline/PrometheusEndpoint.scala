package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Prometheus text-format scrape endpoint over the Metrics listener —
  * the reference serves tally metrics on :9999
  * (cmd/pipeline/pipeline.go:90-113, prefix `agnostic_blockchain_etl`).
  * JDK-built-in HttpServer; no extra dependencies.
  *
  * Exposed series (counters, monotonic within the process):
  *   graft_queries_total, graft_queries_failed_total,
  *   graft_output_rows_total, graft_scan_bytes_total,
  *   graft_query_millis_total
  */
final class PrometheusEndpoint private (
    server: com.sun.net.httpserver.HttpServer) {
  def port: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}

object PrometheusEndpoint {

  /** Render the current metrics snapshot in Prometheus exposition
    * format (text/plain; version 0.0.4). */
  def render(spark: SparkSession): String = {
    val snap = Metrics.snapshot(spark)
    val ok = snap.filterNot(_.action.endsWith("[failed]"))
    val failed = snap.size - ok.size
    val sb = new StringBuilder
    def counter(name: String, help: String, value: Long): Unit = {
      sb.append(s"# HELP $name $help\n")
      sb.append(s"# TYPE $name counter\n")
      sb.append(s"$name $value\n")
    }
    counter("graft_queries_total", "Completed Spark actions", snap.size.toLong)
    counter("graft_queries_failed_total", "Failed Spark actions", failed.toLong)
    counter("graft_output_rows_total", "Rows produced by completed actions",
      ok.map(m => math.max(0L, m.outputRows)).sum)
    counter("graft_scan_bytes_total", "Bytes scanned by completed actions",
      ok.map(m => math.max(0L, m.scanBytes)).sum)
    counter("graft_query_millis_total", "Wall millis of completed actions",
      ok.map(m => math.max(0L, m.elapsedMs)).sum)
    sb.toString
  }

  /** Start a scrape server (port 0 = ephemeral, for tests; the
    * reference's default is 9999). Registers the metrics listener. */
  def start(spark: SparkSession, port: Int = 9999): PrometheusEndpoint = {
    Metrics.register(spark)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)
    server.createContext("/metrics", (exchange: com.sun.net.httpserver.HttpExchange) => {
      val body = render(spark).getBytes("UTF-8")
      exchange.getResponseHeaders.set("Content-Type",
        "text/plain; version=0.0.4; charset=utf-8")
      exchange.sendResponseHeaders(200, body.length.toLong)
      val os = exchange.getResponseBody
      try os.write(body) finally os.close()
    })
    server.setExecutor(null)
    server.start()
    new PrometheusEndpoint(server)
  }
}
