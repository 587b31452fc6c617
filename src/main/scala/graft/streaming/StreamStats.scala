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
  * its own rows (partial-summed per group by the state operator).
  * Each batch's per-key emission is upserted into a KV table from the
  * executors via foreachBatch — `ts = n` makes the log's latest-wins
  * resolve pick the highest-n (latest) snapshot per key, so the sink
  * is idempotent under micro-batch replay and NOTHING accumulates on
  * the driver (a memory sink would grow keys × batches rows in driver
  * heap). Mean/sd derive from the power sums at read time, so the
  * stream converges to EXACTLY the batch answer over the same data
  * (the DuckDB oracle computes the identical formula over the static
  * table).
  */
object StreamStats {

  case class Stat(n: Long, s1: Double, s2: Double)

  /** Per-batch updated power sums per key — the stateful core, shared
    * by the stats query (st6) and the z-score alert stream (st7). */
  def powerSums(spark: SparkSession, stage: String, schema: StructType)
      : org.apache.spark.sql.Dataset[(String, Long, Double, Double)] = {
    import spark.implicits._
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .select($"event_type", $"value").as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (k: String, vs: Iterator[(String, Double)], st: GroupState[Stat]) =>
          var s = st.getOption.getOrElse(Stat(0L, 0.0, 0.0))
          vs.foreach { case (_, v) =>
            s = Stat(s.n + 1, s.s1 + v, s.s2 + v * v)
          }
          st.update(s)
          (k, s.n, s.s1, s.s2)
      }
  }

  /** Runs the stream over `stage` (one micro-batch per staged file, so
    * state genuinely carries across batches) and returns the FINAL
    * per-key stats: `(event_type, n, mean, sd)` rounded at 6 dp. The
    * KV table at `sinkPath` holds one cell per key (latest-wins on n);
    * its pre-resolve cell log is the per-batch emission history —
    * specs read it to prove cross-batch accumulation. */
  def run(spark: SparkSession, stage: String, schema: StructType,
          sinkPath: String): DataFrame = {
    import spark.implicits._
    val sink = graft.write.KVTable(spark, sinkPath, wipe = true)
    val q = powerSums(spark, stage, schema)
      .toDF("event_type", "n", "s1", "s2")
      .writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // key = hash of the group key (the KV key column is BIGINT);
        // the qualifier carries the exact key string, so hash
        // collisions stay distinct cells and nothing is lost
        sink.put(batch.select(xxhash64(col("event_type")).as("key"),
          lit("S").as("family"), col("event_type").as("qualifier"),
          concat_ws(":", col("n"), col("s1"), col("s2")).as("value"),
          col("n").as("ts")))
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    finalStats(spark, sink.resolved())
  }

  /** Latest per-key power-sum snapshot (the KV resolve already kept
    * max-n per key) → derived mean/sd. Spark's double↔string cast is
    * shortest-representation, so the KV round-trip is bit-exact. A key
    * observed exactly once has no sample sd — emit null explicitly
    * (divisor n-1; both engines must agree, and DuckDB raises on
    * sqrt of a negative/÷0 rather than returning null). */
  def finalStats(spark: SparkSession, resolvedCells: DataFrame): DataFrame = {
    val st = resolvedCells
      .select(col("qualifier").as("event_type"),
        split(col("value"), ":").getItem(0).cast("long").as("n"),
        split(col("value"), ":").getItem(1).cast("double").as("s1"),
        split(col("value"), ":").getItem(2).cast("double").as("s2"))
    st.select(col("event_type"), col("n"),
      round(col("s1") / col("n"), 6).as("mean"),
      when(col("n") > 1,
        round(sqrt((col("s2") - col("s1") * col("s1") / col("n"))
          / (col("n") - 1)), 6)).as("sd"))
  }
}
