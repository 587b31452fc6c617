package graft.operators

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.DataFrame

/** S6 HTTP export sink (HttpRDD.scala:14-54 in the reference): serve a
  * DataFrame as CSV lines over an embedded HTTP server so external
  * tools (the reference's use case: R `read.table`) can pull results.
  *
  * Rows stream through `toLocalIterator` — one partition materialized
  * at a time, so the driver never holds the full result. This is an
  * edge utility for *results*, not a data path: at 100 TB exports go
  * through `df.write` to shared storage; this serves query outputs.
  */
class HttpExport(df: DataFrame, port: Int = 0) {
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      ex.getResponseHeaders.add("Content-Type", "text/csv")
      ex.sendResponseHeaders(200, 0)
      val out = ex.getResponseBody
      try {
        val header = df.columns.mkString(",") + "\n"
        out.write(header.getBytes("UTF-8"))
        val it = df.toLocalIterator()
        while (it.hasNext) {
          val row = it.next()
          val line = (0 until row.length)
            .map(i => if (row.isNullAt(i)) "" else row.get(i).toString)
            .mkString(",") + "\n"
          out.write(line.getBytes("UTF-8"))
        }
      } finally out.close()
    }
  })

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)
}
