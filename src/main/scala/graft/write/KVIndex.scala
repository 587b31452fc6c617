package graft.write

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Secondary index over a KV table — the classic HBase pattern the
  * reference's key-only access model leaves to the user (the engine
  * there can only scan by rowkey ranges; value predicates scan the
  * table, reference HBaseTable.scala:100's key-addressed surface).
  * Here the index IS another KV table, so it inherits the whole
  * machinery for free: append-only writes, latest-wins resolution,
  * compaction, bucket-pruned point reads.
  *
  * Layout: for an indexed (family, qualifier), every base cell
  * (key=k, value=v, ts) gets an index cell
  * `(key=sharedHash(v), family="I", qualifier=k, value=v, ts)` —
  * value-hash addressing keeps the index key BIGINT (bucket-prunable)
  * for ANY value type; the base key rides in the qualifier so one
  * index row exists per (value-hash, base-key).
  *
  * Consistency: the index is maintained by writing BOTH tables on
  * [[put]] (append-only, no read). An UPDATE leaves the OLD value's
  * index entry behind — a stale pointer, repaired lazily at read
  * time: [[lookup]] re-verifies every candidate against the base
  * table's resolved value before returning it (the standard
  * read-repair contract of log-structured secondary indexes; a
  * "global index with server-side filtering" in HBase/Phoenix terms).
  * Deleted base rows drop out the same way — the base resolve hides
  * them, so the dangling index entry can never resurface them.
  *
  * Scale shape of a lookup: the value hash is a LITERAL equality on
  * the index table's key → bucket-pruned point read of the index
  * (≤ one bucket's files); the matched base keys broadcast into the
  * base table's scan where the runtime IN-filter prunes base buckets
  * (the j2/s10 multi-get path) — at 100 TB a value lookup touches
  * O(matching rows) bytes, never a table scan.
  */
object KVIndex {

  /** The index table for `base`'s (family, qualifier). */
  def indexTable(base: KVTable, family: String, qualifier: String): KVTable =
    new KVTable(base.spark, s"${base.path}/_idx/${family}_$qualifier")

  /** Index cells derived from base-table cells of the indexed column. */
  def indexCells(cells: DataFrame, family: String,
      qualifier: String): DataFrame =
    cells.filter(col("family") === family && col("qualifier") === qualifier &&
        col("value").isNotNull)
      .select(graft.llm.TextOps.sharedHash(col("value")).as("key"),
        lit("I").as("family"), col("key").cast("string").as("qualifier"),
        col("value"), col("ts"))

  /** Append base cells AND their index entries (no read, two appends —
    * the write path stays O(batch)). */
  def put(base: KVTable, family: String, qualifier: String,
      cells: DataFrame): Unit = {
    base.put(cells)
    indexTable(base, family, qualifier).put(indexCells(cells, family, qualifier))
  }

  /** All base keys whose CURRENT (family, qualifier) value equals
    * `value`, with the verified value column: index point-read →
    * key set → base multi-get → read-repair filter.
    *
    * The candidate key set broadcasts only while it provably fits: a
    * `limit(maxBroadcastKeys+1)` probe (the repo's bounded-probe
    * idiom) counts at most one row past the cap, and a HOT value
    * matching more keys than that falls back to a plain shuffle join —
    * O(matching rows) either way, never a blown broadcast. The probe
    * re-runs the index point-read once, but that read is a
    * bucket-pruned point scan (≤ one bucket's files), so the probe
    * costs a point read, not a table scan. */
  def lookup(base: KVTable, family: String, qualifier: String,
      value: Column, maxBroadcastKeys: Int = 100000): DataFrame = {
    val idx = indexTable(base, family, qualifier)
    val candidates = idx.resolved()
      .filter(col("key") === graft.llm.TextOps.sharedHash(value))
      .select(col("qualifier").cast("long").as("key")).distinct()
    val fitsBroadcast =
      candidates.limit(maxBroadcastKeys + 1).count() <= maxBroadcastKeys
    val keys = if (fitsBroadcast) broadcast(candidates) else candidates
    base.resolved()
      .filter(col("family") === family && col("qualifier") === qualifier)
      .join(keys, "key")
      .filter(col("value") === value) // read-repair: drop stale pointers
      .select(col("key"), col("value"))
  }
}
