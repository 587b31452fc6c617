package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Ingest
import graft.write.KVTable

/** S7 true-socket parity (reference KafkaProxy.scala:12-33): a live
  * `format("socket")` text stream feeding the shared Ingest merge
  * (foreachBatch → KVTable.put) that the Kafka branch also funnels
  * into. The DuckDB oracle can't see a socket, so this lives as a spec
  * asserting final table state instead of a registered query.
  */
class SocketStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("socket text stream merges into a KV table via the shared Ingest entry") {
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
    // the config-gated entry: same conf shape as the kafka transport,
    // different format key
    val q = Ingest.run(spark, t,
      Map("format" -> "socket", "host" -> "127.0.0.1", "port" -> port.toString))
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

  test("file transport funnels through the same merge") {
    val dir = targetPath("graft_stream_test/ingest_files")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    Seq("5,E,last,500,10", "5,E,last,550,20").toDF("value")
      .coalesce(1).write.text(dir)
    val t = KVTable(spark, targetPath("graft_kv_test/ingest_file"), wipe = true)
    val q = Ingest.run(spark, t, Map("format" -> "file", "dir" -> dir))
    try q.processAllAvailable() finally q.stop()
    val got = t.resolved()
      .select($"key", $"value").as[(Long, String)].collect().toMap
    assert(got === Map(5L -> "550"))
  }

  test("config gates the transport; kafka maps its options; unknown fails") {
    assert(Ingest.fromConf(Map("format" -> "kafka",
      "kafka.bootstrap.servers" -> "broker:9092", "topic" -> "cells"))
      === Ingest.KafkaSource("broker:9092", "cells", "earliest"))
    assert(Ingest.fromConf(Map("format" -> "kafka",
      "kafka.bootstrap.servers" -> "b:9092", "topic" -> "t",
      "startingOffsets" -> "latest"))
      === Ingest.KafkaSource("b:9092", "t", "latest"))
    assert(Ingest.fromConf(Map("host" -> "h", "port" -> "1")) // socket default
      === Ingest.SocketSource("h", 1))
    intercept[IllegalArgumentException] {
      Ingest.fromConf(Map("format" -> "carrier-pigeon"))
    }
  }

  test("kafka branch executes down to Spark's source resolution") {
    // the spark-sql-kafka connector cannot be on this classpath (no
    // artifact repository reachable from the sandbox), so end-to-end
    // broker ingest is out of test scope BY ENVIRONMENT; this pins the
    // next-best property: the branch runs, builds its reader options,
    // and hands Spark the correct source id — the failure is Spark's
    // "kafka source not found", not an error in our wiring
    val e = intercept[Exception] {
      Ingest.lines(spark, Ingest.KafkaSource("broker:9092", "cells"))
    }
    val msg = Option(e.getMessage).getOrElse("") + " " +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.toLowerCase.contains("kafka"),
      s"kafka source lookup not reached: $e")
  }

  test("kafka option plumbing and record normalization are the socket " +
    "contract: UTF-8 value bytes become the same cell lines the shared " +
    "merge parses") {
    assert(Ingest.kafkaReaderOptions(
      Ingest.KafkaSource("b1:9092,b2:9092", "cells", "latest")) === Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "subscribe" -> "cells",
      "startingOffsets" -> "latest"))
    // synthetic batch with Spark's kafka source schema: key/value are
    // BINARY, plus topic/partition/offset metadata the normalize step
    // must drop
    val cell = "1,E,last,100,10"
    val kafkaShaped = Seq(
      (Array[Byte](107), cell.getBytes("UTF-8"), "cells", 0, 42L))
      .toDF("key", "value", "topic", "partition", "offset")
    val normalized = Ingest.normalizeKafka(kafkaShaped)
    assert(normalized.schema.map(f => (f.name, f.dataType.typeName))
      === Seq(("value", "string")))
    assert(normalized.as[String].collect().toSeq === Seq(cell))
    // and the normalized line parses to the exact cell the socket path
    // produces (the shared foreachBatch split contract)
    val f = split(col("value"), ",")
    val parsed = normalized.select(
      f.getItem(0).cast("long").as("key"), f.getItem(1).as("family"),
      f.getItem(2).as("qualifier"), f.getItem(3).as("value"),
      f.getItem(4).cast("long").as("ts"))
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(parsed === Seq((1L, "E", "last", "100", 10L)))
  }
}
