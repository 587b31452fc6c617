package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Replay-safe parquet micro-batch sink.
  *
  * `foreachBatch` is AT-LEAST-ONCE: after a crash between the sink
  * write and the checkpoint commit, the engine re-runs the same
  * `batchId` — a plain `mode("append")` then lands the batch twice.
  * The standing fix (the Structured Streaming guide's own recipe) is
  * to make the write a DETERMINISTIC function of the batch id: each
  * micro-batch OVERWRITES its own `batch=<id>` subdirectory, so a
  * replay replaces the previous attempt byte-for-byte instead of
  * duplicating it. The subdirectory doubles as a partition column on
  * read-back (dropped by [[read]]).
  *
  * This is the restart contract a 100 TB ingest demands of a file
  * sink; the KV-merge sinks (st1/st6/st9, sessionize) are replay-safe
  * already because latest-wins resolution absorbs re-puts of identical
  * versions.
  */
object IdempotentSink {
  val COL = "batch"

  /** The foreachBatch function: land `batchId` in its own overwritten
    * partition directory under `out`.
    *
    * File sizing (round 18): without it every micro-batch writes one
    * file per task — `shuffle.partitions/4` near-empty files per
    * trigger under the registry's stream profile, a small-files
    * generator at production trigger counts. A REBALANCE hint before
    * the write lets AQE (on by default in a foreachBatch body — it
    * executes as a BATCH query) coalesce the output to
    * advisory-partition-sized files, while the shuffle sits ABOVE any
    * stateful operator so state-store partitioning is untouched and
    * the batch's compute parallelism is preserved. Scale note: this is
    * the guide's coalesce-on-write recipe — at 100 TB the same hint
    * merges to ~advisory-size (default 64 MB) files instead of 1.
    * Bodies that run under `GraftSession.withMicroBatchPlanning` (AQE
    * deliberately off for trigger-sized work) skip the hint: a
    * rebalance without AQE is a blind reshuffle to the session
    * partition count — cost without the sizing. */
  def parquet(out: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val aqeOn = batch.sparkSession.conf
        .get("spark.sql.adaptive.enabled", "true").toBoolean
      val sized = if (aqeOn) batch.hint("rebalance") else batch
      sized.write.mode(SaveMode.Overwrite).parquet(s"$out/$COL=$batchId")
    }

  /** Read the sink back without the synthetic batch column. */
  def read(spark: SparkSession, out: String): DataFrame =
    spark.read.parquet(out).drop(COL)
}
