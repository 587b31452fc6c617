package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamDedup

/** Streaming dedup-at-ingest semantics (streaming/StreamDedup.scala):
  * at-least-once re-deliveries collapse to exactly-once by key.
  */
class StreamDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("re-delivered rows dedup to one row per key across the stream") {
    val stage = targetPath("graft_stream_spec/st4_stage")
    val out = targetPath("graft_stream_spec/st4_out")
    val ckpt = targetPath("graft_stream_spec/st4_ckpt")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    Seq(stage, out, ckpt).foreach(p => rm(new java.io.File(p)))
    val base = (1L to 200L).toDF("event_id")
      .withColumn("tsc",
        expr("CAST(timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,event_id*60) AS TIMESTAMP)"))
      .withColumn("payload", concat(lit("p"), $"event_id"))
    // two deliveries land as separate parquet appends (separate files)
    base.write.mode("append").parquet(stage)
    base.filter($"event_id" % 2 === 0).write.mode("append").parquet(stage)
    val got = StreamDedup.run(spark, stage, base.schema, out, ckpt,
        keys = Seq("event_id"), eventTimeCol = "tsc", horizon = "30 days")
      .select($"event_id", $"payload").as[(Long, String)].collect()
    assert(got.length === 200, s"expected 200 deduped rows, got ${got.length}")
    assert(got.toSet === (1L to 200L).map(i => (i, s"p$i")).toSet)
  }
}
