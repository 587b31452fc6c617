package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{IdempotentSink, Staging}

/** The restart contract of the foreachBatch parquet sinks
  * (st2/st5/st8/st10/st11, st7 alerts): foreachBatch is AT-LEAST-ONCE,
  * so a crash between the sink write and the checkpoint commit replays
  * the same batchId — the sink must land it exactly once anyway. */
class IdempotentSinkSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("re-running one batchId twice lands no duplicate rows") {
    val out = targetPath("idemsink_spec_out")
    graft.sources.kv.GraftFs.delete(out, recursive = true)
    val sink = IdempotentSink.parquet(out)
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val b1 = Seq((3L, "c")).toDF("k", "v")
    sink(b0, 0L)
    sink(b1, 1L)
    val once = IdempotentSink.read(spark, out)
      .as[(Long, String)].collect().toSeq.sorted
    // the replay: same batchId, same logical content (different task
    // layout — extra partitions — as a restarted attempt would have)
    sink(b0.repartition(3), 0L)
    val twice = IdempotentSink.read(spark, out)
      .as[(Long, String)].collect().toSeq.sorted
    assert(twice == once, s"replayed batch 0 duplicated rows: $twice")
    assert(once == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("full stream restart over the same sink dir does not duplicate") {
    val stage = targetPath("idemsink_spec_stage")
    val out = targetPath("idemsink_spec_stream_out")
    Seq(stage, out).foreach(p =>
      graft.sources.kv.GraftFs.delete(p, recursive = true))
    def file(rows: Seq[Long]): Unit =
      rows.toDF("k").coalesce(1).write.mode("append").parquet(stage)
    Staging.ordered(stage)(
      () => file(Seq(1L, 2L)),
      () => file(Seq(3L)),
      () => file(Seq(4L, 5L)))
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema(spark.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val q = src.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, id: Long) =>
          IdempotentSink.parquet(out)(
            batch.groupBy().agg(sum($"k").as("s"), count(lit(1)).as("n")),
            id)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    val once = IdempotentSink.read(spark, out)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(once.map(_._2).sum == 5L, s"expected 5 input rows, got $once")
    // a fresh checkpoint replays every batch with the SAME ids over the
    // SAME staged files (mtime-ordered) — the sink must absorb it
    runOnce()
    val twice = IdempotentSink.read(spark, out)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(twice == once, s"restart duplicated batches: $twice vs $once")
  }
}
