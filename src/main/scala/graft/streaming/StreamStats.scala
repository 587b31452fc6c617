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

  // --- st7: event-time z-score alerts over the running stats --------

  /** Exact integer power sums: the alert decision must be a pure
    * function of the DATA (batch-boundary-independent and
    * oracle-reproducible), so state carries Σcents/Σcents² as longs —
    * exact in any accumulation order, unlike double sums. */
  case class AlertState(n: Long, s1: Long, s2: Long)
  case class AlertRow(event_type: String, event_id: Long, tsn: Long,
                      sec: Long, cents: Long)
  case class Alert(event_type: String, event_id: Long, sec: Long,
                   cents: Long, z: Double)

  /** Spark's Round-expression semantics for doubles, applied driver/
    * executor-side so the streamed z equals `round(col, 6)`. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Per-key alert pass: rows ordered by (event-time, id) score
    * against the stats of STRICTLY PRECEDING rows, then fold into the
    * state — so each row's z is the "how anomalous was this, given
    * everything seen so far" of a live monitor, and a replay emits
    * exactly the same alerts. The positive-variance guard is exact
    * (BigInt ≙ DuckDB's HUGEINT sums) — no sqrt of a rounding-noise
    * negative at any scale. */
  def alertFn(threshold: Double)(key: String, rows: Iterator[AlertRow],
              st: GroupState[AlertState]): Iterator[Alert] = {
    var s = st.getOption.getOrElse(AlertState(0L, 0L, 0L))
    val out = List.newBuilder[Alert]
    rows.toArray.sortBy(r => (r.tsn, r.event_id)).foreach { r =>
      if (s.n > 1 && BigInt(s.s2) * s.n > BigInt(s.s1) * s.s1) {
        val s1d = s.s1.toDouble
        val z = round6((r.cents - s1d / s.n) /
          math.sqrt((s.s2 - s1d * s1d / s.n) / (s.n - 1)))
        if (math.abs(z) > threshold)
          out += Alert(key, r.event_id, r.sec, r.cents, z)
      }
      s = AlertState(s.n + 1, s.s1 + r.cents, s.s2 + r.cents * r.cents)
    }
    st.update(s)
    out.result().iterator
  }

  /** Runs the alert stream over time-ordered staged files and sinks
    * each micro-batch's alerts to parquet from the executors (with the
    * batch id, so specs can prove alerts span batches). State is one
    * `(n, Σx, Σx²)` triple per key — O(#keys) forever; emission is
    * alerts only, a vanishing fraction of the stream. */
  def alerts(spark: SparkSession, stage: String, schema: StructType,
             outDir: String, threshold: Double = 3.0): DataFrame = {
    import spark.implicits._
    graft.sources.kv.GraftFs.delete(outDir, recursive = true)
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .select($"event_type", $"event_id", $"ts".as("tsn"),
        expr("ts DIV 1000000000").as("sec"),
        round($"value" * 100).cast("long").as("cents"))
      .as[AlertRow]
    val q = src.groupByKey(_.event_type)
      .flatMapGroupsWithState(org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout)(alertFn(threshold))
      .toDF()
      .writeStream.outputMode("append")
      // batch-idempotent file sink: a replayed batchId overwrites its
      // own partition (IdempotentSink); the partition column doubles
      // as the per-batch provenance the spec asserts on
      .foreachBatch(IdempotentSink.parquet(outDir))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(outDir)
      .withColumnRenamed(IdempotentSink.COL, "batch_id")
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
