package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Eager materialization for a multiply-consumed relation (the
  * llm_ccnet_buckets / an_ks_test pattern: a slim scored relation read
  * 3× downstream, where lazy recompute would re-execute the whole
  * upstream pipeline per consumer — measured 2.8× of llm_ccnet's total
  * at sf1.0).
  *
  * Strategy is deployment-selected via `spark.graft.materialize`:
  *  - default (`localCheckpoint`): eager localCheckpoint — blocks live
  *    on executor-local storage with TRUNCATED lineage. Fastest, and
  *    right for local[*] / static-executor clusters; but on a cluster
  *    with dynamic allocation or executor loss the query dies
  *    unrecoverably instead of recomputing.
  *  - `persist`: MEMORY_AND_DISK persist + an eager count. Lineage is
  *    KEPT, so a lost block recomputes from source — the setting a
  *    dynamic-allocation 100 TB deployment should run with, at the
  *    cost of keeping the upstream plan alive in each consumer.
  */
object Materialize {
  def eager(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.materialize") match {
      case Some("persist") =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        p.count(): Unit // materialize now; recomputable on block loss
        p
      case _ => df.localCheckpoint(true)
    }
}
