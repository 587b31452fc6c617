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
    * running `last(match, ignoreNulls)` over (ts, side) within each
    * key partition — a linear merge, no per-row range probe, no range
    * join explosion. At 100 TB this moves each side exactly once and
    * never materializes candidate pairs. The match rides as a
    * `struct(ts, value)` — non-null whenever a right row matched — so
    * a right row whose VALUE is null still wins the as-of race and
    * yields null, exactly like SQL ASOF JOIN (a bare `last(value)`
    * would skip it and resurrect an older quote).
    *
    * Hot keys: the per-key window is a running scan, so one
    * pathological key serializes on a single task — inherent to ANY
    * equi-key as-of formulation (the partition function cannot split a
    * key whose rows must be merged in ts order). AQE does not help: it
    * splits skewed JOIN partitions, not window partitions. For such
    * workloads pass `hotKeyBinWidth > 0`: both sides bucketize onto
    * fixed-width ts bins, the right side pre-aggregates to its last
    * match per (key, bin), a tiny per-key window over BIN SUMMARIES
    * (≤ ts-range/binWidth rows, not data rows) computes each bin's
    * carry-in, and the final merge windows over (key, bin) — so a hot
    * key's work spreads across ts-range/binWidth tasks at the cost of
    * one extra (cheap, pre-aggregated) shuffle. Same results exactly.
    *
    * The right side must be deduplicated per (key, ts) by the caller
    * if multiple versions share a timestamp (determinism). */
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, ts: String,
               leftCols: Seq[String], rightVal: String,
               asofCol: String = "asof_value",
               hotKeyBinWidth: Long = 0L): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val tsType = right.schema(ts).dataType
    val valType = right.schema(rightVal).dataType
    // the as-of match: non-null iff SOME right row matched, even one
    // whose value column is null
    val rvType = StructType(Seq(
      StructField("_rts", tsType), StructField("_v", valType)))
    val lu = left.select(
      (Seq(col(key), col(ts)) ++ leftCols.map(col) :+
        lit(null).cast(rvType).as("_rv") :+ lit(1).as("_side")): _*)
    val ru = right.select(
      (Seq(col(key), col(ts)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(ts).as("_rts"), col(rightVal).as("_v")).as("_rv") :+
        lit(0).as("_side")): _*)
    val out = (Seq(col(key), col(ts)) ++ leftCols.map(col) :+
      col("_m").getField("_v").as(asofCol))

    if (hotKeyBinWidth <= 0L) {
      // right sorts before left at equal ts → "<=" inclusion by order
      val w = Window.partitionBy(col(key))
        .orderBy(col(ts), col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      lu.unionByName(ru)
        .withColumn("_m", last(col("_rv"), ignoreNulls = true).over(w))
        .filter(col("_side") === 1)
        .select(out: _*)
    } else {
      val b = hotKeyBinWidth
      val lub = lu.withColumn("_bin", floor(col(ts) / b))
      val rub = ru.withColumn("_bin", floor(col(ts) / b))
      // last right match per (key, bin) — a hash aggregation, parallel
      val binLast = rub.groupBy(col(key), col("_bin"))
        .agg(max_by(col("_rv"), col(ts)).as("_last"))
      // carry-in per populated bin: the as-of state at the bin's start.
      // The window here runs over bin SUMMARIES (one row per bin), so
      // the hot key's serialized portion is ts-range/binWidth rows.
      val allBins = lub.select(col(key), col("_bin"))
        .unionByName(binLast.select(col(key), col("_bin"))).distinct()
      val wb = Window.partitionBy(col(key)).orderBy(col("_bin"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = allBins
        .join(binLast, Seq(key, "_bin"), "left_outer")
        .withColumn("_carry", last(col("_last"), ignoreNulls = true).over(wb))
        .filter(col("_carry").isNotNull)
        .select((Seq(col(key),
          (col("_bin") * b).cast(tsType).as(ts)) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          col("_carry").as("_rv") :+ lit(-1).as("_side") :+ col("_bin")): _*)
      // final merge within (key, bin): carry (-1) sorts before any
      // in-bin right row (0) at the bin-start ts, rights before lefts
      val w = Window.partitionBy(col(key), col("_bin"))
        .orderBy(col(ts), col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      lub.unionByName(rub).unionByName(carry)
        .withColumn("_m", last(col("_rv"), ignoreNulls = true).over(w))
        .filter(col("_side") === 1)
        .select(out: _*)
    }
  }

  /** Nearest-in-time join: for every left row, the right row with the
    * same key whose ts is CLOSEST — backward (`right.ts <= left.ts`)
    * or forward (`right.ts > left.ts`), whichever gap is smaller;
    * backward wins exact ties (an equal-ts right is a gap-0 backward
    * match). Null match and gap when the key has no right rows.
    *
    * Shape: the asofJoin union with ONE shuffle and ONE sort, but TWO
    * frames over it — a backward running `last(match)` and a forward
    * running `first(match)` share the same window partitioning and
    * ordering, so Spark computes both without a second exchange or
    * sort. Rights sort before lefts at equal ts, which makes the
    * forward frame strictly later — no double counting. Same 100 TB
    * properties (and the same single-hot-key caveat) as asofJoin.
    *
    * The right side must be deduplicated per (key, ts) by the caller
    * (determinism of which same-ts right wins). */
  def nearestJoin(left: DataFrame, right: DataFrame,
                  key: String, ts: String,
                  leftCols: Seq[String], rightVal: String,
                  valCol: String = "nearest_value",
                  gapCol: String = "nearest_gap"): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val tsType = right.schema(ts).dataType
    val valType = right.schema(rightVal).dataType
    val rvType = StructType(Seq(
      StructField("_rts", tsType), StructField("_v", valType)))
    val lu = left.select(
      (Seq(col(key), col(ts)) ++ leftCols.map(col) :+
        lit(null).cast(rvType).as("_rv") :+ lit(1).as("_side")): _*)
    val ru = right.select(
      (Seq(col(key), col(ts)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(ts).as("_rts"), col(rightVal).as("_v")).as("_rv") :+
        lit(0).as("_side")): _*)
    val wb = Window.partitionBy(col(key)).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(key)).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val back = col("_mb")
    val fwd = col("_mf")
    val gapB = col(ts) - back.getField("_rts")
    val gapF = fwd.getField("_rts") - col(ts)
    val pickB = fwd.isNull || (back.isNotNull && gapB <= gapF)
    val m = when(pickB, back).otherwise(fwd)
    lu.unionByName(ru)
      .withColumn("_mb", last(col("_rv"), ignoreNulls = true).over(wb))
      .withColumn("_mf", first(col("_rv"), ignoreNulls = true).over(wf))
      .filter(col("_side") === 1)
      .select((Seq(col(key), col(ts)) ++ leftCols.map(col) :+
        m.getField("_v").as(valCol) :+
        when(pickB, gapB).otherwise(gapF).as(gapCol)): _*)
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
