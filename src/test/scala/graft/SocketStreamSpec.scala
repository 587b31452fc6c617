package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.write.KVTable

/** S7 true-socket parity (reference KafkaProxy.scala:12-33): a live
  * `format("socket")` text stream feeding the same foreachBatch →
  * KVTable.put merge that st1 runs from file staging. The DuckDB oracle
  * can't see a socket, so this lives as a spec asserting final table
  * state instead of a registered query.
  */
class SocketStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("socket text stream merges into a KV table via foreachBatch") {
    val server = new java.net.ServerSocket(
      0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    val port = server.getLocalPort
    val done = new java.util.concurrent.CountDownLatch(1)
    // latest-wins check: key 1 gets two versions (ts 10 then 20)
    val lines = Seq("1,E,last,100,10", "2,E,last,200,10", "1,E,last,150,20")
    val feeder = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      lines.foreach(out.println)
      out.flush()
      done.await() // hold the connection until the query has drained
      sock.close()
    })
    feeder.setDaemon(true)
    feeder.start()

    val t = KVTable(spark, targetPath("graft_kv_test/socket"), wipe = true)
    val src = spark.readStream.format("socket")
      .option("host", "127.0.0.1").option("port", port).load()
    val q = src.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val f = split(col("value"), ",")
        t.put(batch.select(
          f.getItem(0).cast("long").as("key"), f.getItem(1).as("family"),
          f.getItem(2).as("qualifier"), f.getItem(3).as("value"),
          f.getItem(4).cast("long").as("ts")))
      }.start()
    try {
      val deadline = System.currentTimeMillis + 60000
      while (System.currentTimeMillis < deadline && t.cells.count() < lines.size) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
    } finally {
      q.stop()
      done.countDown()
      server.close()
    }
    val got = t.resolved()
      .select($"key", $"value").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "150", 2L -> "200"))
  }
}
