package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins — the two classic operators Spark's built-in join
  * menu lacks (the task-brief's canonical custom-operator examples),
  * composed from existing ops so Catalyst keeps optimizing them
  * (SURVEY §7.3 preference (a): compose before custom plans).
  *
  * Reference counterpart: the timestamped cell reads + range-bounded
  * scans (`HBaseRDDFunctions.scala:39-46`, `Scan.setTimeRange`) give
  * point-in-time lookups against the store; these operators give the
  * same "state as of t" semantics relationally, between any two
  * relations.
  */
object Temporal {

  /** As-of join: for every left row, the single latest right row with
    * the same key and `right.ts <= left.ts` (trades-and-quotes
    * semantics, ties at equal ts include the right row).
    *
    * Shape: tag both sides, union, ONE shuffle on the key, then a
    * running `last(value, ignoreNulls)` over (ts, side) within each
    * key partition — a linear merge, no per-row range probe, no range
    * join explosion. At 100 TB this moves each side exactly once and
    * never materializes candidate pairs; skewed keys ride AQE like any
    * other single-key shuffle. The right side must be deduplicated per
    * (key, ts) by the caller if multiple versions share a timestamp
    * (determinism). */
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, ts: String,
               leftCols: Seq[String], rightVal: String,
               asofCol: String = "asof_value"): DataFrame = {
    val valType = right.schema(rightVal).dataType
    val lu = left.select(
      (Seq(col(key), col(ts)) ++ leftCols.map(col) :+
        lit(null).cast(valType).as("_rv") :+ lit(1).as("_side")): _*)
    val ru = right.select(
      (Seq(col(key), col(ts)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(rightVal).as("_rv") :+ lit(0).as("_side")): _*)
    // right sorts before left at equal ts → "<=" inclusion by order
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru)
      .withColumn(asofCol, last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((Seq(col(key), col(ts)) ++ leftCols.map(col) :+ col(asofCol)): _*)
  }

  /** Range (interval) join: points joined to every range containing
    * them (`start <= pt < end`), with NO equi-key available.
    *
    * Shape: both sides bucketize onto fixed-width time bins — a range
    * explodes into the bins it covers, a point lands in exactly one —
    * then a plain equi-join on the bin + the exact range filter. Each
    * (point, range) match surfaces exactly once (the point's bin).
    * At scale this replaces the cartesian/BNLJ a naive theta-join
    * plans with a shuffle proportional to data × (range span ÷
    * binWidth); pick binWidth near the typical range length so ranges
    * explode into O(1) bins. */
  def rangeJoin(points: DataFrame, ranges: DataFrame,
                ptCol: String, startCol: String, endCol: String,
                binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = points.withColumn("_bin", floor(col(ptCol) / binWidth))
    val rbinned = ranges.withColumn("_bin",
      explode(sequence(floor(col(startCol) / binWidth),
        floor((col(endCol) - 1) / binWidth))))
    binned.join(rbinned, Seq("_bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bin")
  }
}
