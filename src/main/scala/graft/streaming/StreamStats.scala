package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming running statistics: per-key power sums (n, Σx, Σx²)
  * accumulated across micro-batches with `mapGroupsWithState` — the
  * monitoring/data-quality aggregate as a stream (the streaming twin
  * of the batch `an_zscore` stats pass).
  *
  * Scale shape: state per key is three numbers — O(#keys), bytes per
  * key, regardless of stream volume; each micro-batch shuffles only
  * its own rows (partial-summed per group by the state operator);
  * emission is one row per active key per batch. Mean/sd derive from
  * the power sums at read time, so the stream converges to EXACTLY
  * the batch answer over the same data (the DuckDB oracle computes
  * the identical formula over the static table).
  */
object StreamStats {

  case class Stat(n: Long, s1: Double, s2: Double)

  /** Runs the stream over `stage` (one micro-batch per staged file, so
    * state genuinely carries across batches) and returns the FINAL
    * per-key stats: `(event_type, n, mean, sd)` rounded at 6 dp.
    * `intermediate` exposes every per-batch emission for specs. */
  def run(spark: SparkSession, stage: String, schema: StructType,
          sinkName: String = "st6_stream_stats_sink"): DataFrame = {
    import spark.implicits._
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .select($"event_type", $"value").as[(String, Double)]
    val updated = src.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (k: String, vs: Iterator[(String, Double)], st: GroupState[Stat]) =>
          var s = st.getOption.getOrElse(Stat(0L, 0.0, 0.0))
          vs.foreach { case (_, v) =>
            s = Stat(s.n + 1, s.s1 + v, s.s2 + v * v)
          }
          st.update(s)
          (k, s.n, s.s1, s.s2)
      }
      .toDF("event_type", "n", "s1", "s2")
    val q = updated.writeStream.outputMode("update")
      .format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    finalStats(spark.table(sinkName))
  }

  /** The last emission per key (n strictly grows, so max-n wins) →
    * derived mean/sd. */
  def finalStats(emissions: DataFrame): DataFrame =
    emissions
      .groupBy(col("event_type"))
      .agg(max(struct(col("n"), col("s1"), col("s2"))).as("f"))
      .select(col("event_type"), col("f.n").as("n"),
        round(col("f.s1") / col("f.n"), 6).as("mean"),
        round(sqrt((col("f.s2") - col("f.s1") * col("f.s1") / col("f.n"))
          / (col("f.n") - 1)), 6).as("sd"))
}
