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
    cuts.sliding(2).foreach {
      case Array(lo, hi) =>
        ev.filter($"ts" > lo && $"ts" <= hi)
          .coalesce(1).write.mode("append").parquet(stage)
      case _ => ()
    }
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
}
