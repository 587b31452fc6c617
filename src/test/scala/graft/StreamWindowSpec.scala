package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** st2's scale contract: in APPEND mode the watermark actually EVICTS
  * expired windows from the state store, so state is bounded by the
  * watermark horizon — not by every window ever seen (which is what
  * complete mode retains). Asserted from the engine's own
  * StreamingQueryProgress state-operator metrics. */
class StreamWindowSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("append-mode windowed agg evicts expired windows; state stops growing") {
    val ev = Tables.events(spark, sf)
      .select($"ts", $"event_type")
    val stage = targetPath("streamwindow_spec")
    val out = targetPath("streamwindow_spec_out")
    Seq(stage, out).foreach(p =>
      graft.sources.kv.GraftFs.delete(p, recursive = true))
    // stage QUARTILE files in event-time order (one per micro-batch),
    // so the watermark advances batch over batch and eviction is
    // observable — a randomly-sharded stage would push the watermark
    // to max-1h after the first batch
    val bounds = ev.stat.approxQuantile("ts", Array(0.25, 0.5, 0.75), 0.0)
    val cuts = Long.MinValue +: bounds.map(_.toLong) :+ Long.MaxValue
    // explicit mtimes: quartile pickup order must not hinge on
    // write-clock ties (graft.streaming.Staging)
    graft.streaming.Staging.ordered(stage)(
      cuts.sliding(2).collect {
        case Array(lo, hi) => () =>
          ev.filter($"ts" > lo && $"ts" <= hi)
            .coalesce(1).write.mode("append").parquet(stage)
      }.toSeq: _*)
    val src = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .withColumn("tsc", expr("CAST(ts DIV 1000000000 AS TIMESTAMP)"))
    val agg = src.withWatermark("tsc", "1 hour")
      .groupBy(window($"tsc", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select(unix_timestamp($"window.start").as("hour_start"),
            $"event_type", $"n")
          .write.mode("append").parquet(out)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val progress = q.recentProgress.toSeq.filter(_.stateOperators.nonEmpty)
    assert(progress.size >= 3, s"expected multi-batch run, got ${progress.size}")
    val totals = progress.map(_.stateOperators.head.numRowsTotal)
    val removed = progress.map(_.stateOperators.head.numRowsRemoved).sum
    assert(removed > 0, s"watermark never evicted state: totals=$totals")
    // state must NOT retain every window ever seen (complete-mode shape)
    val allWindows = ev
      .select(expr("ts DIV 3600000000000").as("h"), $"event_type")
      .distinct().count()
    assert(totals.last < allWindows,
      s"final state ${totals.last} >= total windows $allWindows — no eviction")
    // and the emitted output still covers every expired window exactly once
    val emitted = spark.read.parquet(out)
      .groupBy($"hour_start", $"event_type").count()
      .filter($"count" > 1).count()
    assert(emitted == 0, "a window emitted more than once in append mode")
  }

  test("session_window merges a session split across micro-batches") {
    // one user, three events 10 min apart split across two files, then
    // a far-future flush: the two batches' partial sessions must merge
    // into ONE emitted session spanning all three events
    val stage = targetPath("sessionwindow_spec")
    val out = targetPath("sessionwindow_spec_out")
    Seq(stage, out).foreach(p =>
      graft.sources.kv.GraftFs.delete(p, recursive = true))
    val t0 = 1700000000L
    def file(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("user_id", "sec")
        .select($"user_id", ($"sec" * 1000000000L).as("ts"))
        .coalesce(1).write.mode("append").parquet(stage)
    // explicit mtimes: the far-future flush sentinel must be the LAST
    // file the source picks up — an mtime tie could process it first
    // and drop the real events as late (graft.streaming.Staging)
    graft.streaming.Staging.ordered(stage)(
      () => file(Seq((7L, t0), (7L, t0 + 600))),
      () => file(Seq((7L, t0 + 1200))),
      () => file(Seq((-1L, t0 + 500000))))
    val src = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .withColumn("tsc", expr("CAST(ts DIV 1000000000 AS TIMESTAMP)"))
    val agg = src.withWatermark("tsc", "1 hour")
      .groupBy(session_window($"tsc", "4 hours"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select($"user_id",
            unix_timestamp($"session_window.start").as("start_s"),
            unix_timestamp($"session_window.end").as("end_s"),
            $"n_events")
          .write.mode("append").parquet(out)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.read.parquet(out).filter($"user_id" >= 0)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((7L, t0, t0 + 1200 + 14400, 3L)),
      s"expected one merged 3-event session, got $rows")
  }
}
