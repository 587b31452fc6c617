package graft.llm

import org.apache.spark.sql.DataFrame

/** Shared fan-out heuristic for the CPU-bound llm stages (shingling,
  * minhashing, vector-norm prep). Single-file test sources arrive as
  * one input partition, so the heavy per-row projection would run on
  * one core unless we repartition first; a real-scale corpus already
  * has plenty of input splits and must pass through untouched (no
  * round-robin shuffle of 100 TB).
  *
  * The "enough partitions" decision is made WITHOUT `df.rdd` — calling
  * `.rdd` forces a full second physical planning of the input per call
  * (the plan is then thrown away; the downstream query re-plans it).
  * Instead the scan's split count is estimated from information the
  * optimizer already has: leaf file count and the optimized plan's size
  * estimate divided by `files.maxPartitionBytes` (how Spark itself
  * sizes file splits). Under-estimating only costs one extra shuffle of
  * a small input; a corpus with many files or real volume always
  * clears `defaultParallelism` and is never shuffled.
  */
private[llm] object Fanout {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (estimatedScanPartitions(df) < target) df.repartition(target) else df
  }

  private def estimatedScanPartitions(df: DataFrame): Int = {
    val maxSplit = math.max(1L,
      df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val bySize = (bytes / maxSplit).min(BigInt(Int.MaxValue)).toInt + 1
    math.max(df.inputFiles.length, bySize)
  }
}
