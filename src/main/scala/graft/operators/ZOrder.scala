package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered bulk layout.
  *
  * The reference's bulk sink sorts by row key only
  * (HBaseTable.scala:296-312 — HFiles are key-ordered), so scans
  * filtered on any OTHER column read everything. Laying the same
  * sorted-file write out along a Morton curve of TWO columns makes
  * every parquet row group cover a small rectangle in (a, b) space —
  * min/max row-group statistics then prune scans filtered on EITHER
  * column. This is the standard lakehouse technique for multi-column
  * pruning at 100 TB, and it composes with the existing sink: one
  * range shuffle on the z-value, no extra passes over the data beyond
  * the two-scalar bounds lookup (callers with known domains skip it).
  *
  * Everything is built-in codegen'd expressions — the z-value never
  * leaves the projection, so the write pipeline stays whole-stage.
  */
object ZOrder {

  /** Order-preserving 16-bit rank of `c` within [mn, mx]. */
  private def rank16(c: Column, mn: Long, mx: Long): Column =
    if (mx <= mn) lit(0L)
    else (c.cast("long") - mn) * 65535L / (mx - mn)

  /** Morton-interleave two 16-bit ranks into a 32-bit z-value.
    * `y`'s bits land one position higher, so with 2^k range-partitions
    * the leading splits alternate y, x, y, … — both dimensions shrink
    * as file count grows.
    */
  def interleave(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Z-value of (a, b) given their domains. */
  def zValue(a: Column, b: Column, aMin: Long, aMax: Long,
             bMin: Long, bMax: Long): Column =
    interleave(rank16(a, aMin, aMax), rank16(b, bMin, bMax))

  /** Write `df` to `path` clustered on the z-curve of integer columns
    * (a, b): one range shuffle on the z-value, rows sorted by z inside
    * each file. Bounds default to a two-scalar min/max pass; pass them
    * explicitly when the domain is known (ingest pipelines usually do).
    */
  def writeZOrdered(df: DataFrame, a: String, b: String, path: String,
                    numFiles: Int,
                    bounds: Option[(Long, Long, Long, Long)] = None): Unit = {
    val (aMin, aMax, bMin, bMax) = bounds.getOrElse {
      val r = df.agg(min(col(a)).cast("long"), max(col(a)).cast("long"),
        min(col(b)).cast("long"), max(col(b)).cast("long")).first()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    df.withColumn("__z", zValue(col(a), col(b), aMin, aMax, bMin, bMax))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
