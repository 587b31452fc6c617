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
    * partition directory under `out`. */
  def parquet(out: String): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      batch.write.mode(SaveMode.Overwrite).parquet(s"$out/$COL=$batchId")

  /** Read the sink back without the synthetic batch column. */
  def read(spark: SparkSession, out: String): DataFrame =
    spark.read.parquet(out).drop(COL)
}
