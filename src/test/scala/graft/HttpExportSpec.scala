package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HttpExport

/** S6 sink end-to-end: serve a DataFrame over HTTP, fetch it back
  * (HttpRDDTest.scala:9-20 genre, but automated). */
class HttpExportSpec extends AnyFunSuite with SparkSpec {

  test("serves the DataFrame as CSV over HTTP") {
    val df = Tables.region(spark, sf).orderBy("r_regionkey")
    val exp = new HttpExport(df)
    val port = exp.start()
    try {
      val body = scala.io.Source.fromURL(s"http://localhost:$port/").mkString
      val lines = body.trim.split("\n").toSeq
      assert(lines.head === "r_regionkey,r_name")
      assert(lines.size === 1 + df.count())
      assert(lines(1).startsWith("0,"))
    } finally exp.stop()
  }
}
