package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Direct coverage of [[graft.plans.NanosRangeRewrite]] — the
  * bound-folding math (ceil/floor per comparison direction at micros
  * precision) is easy to get off-by-one, so every operator is checked
  * against a Scala-side model over values including exact-boundary and
  * sub-microsecond literals, on both literal sides; the non-UTC
  * session backoff is pinned on the plan.
  */
class NanosRangeRewriteSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // micros 0,1,2,999,1000,1001,... around every rounding edge
  private val micros =
    Seq(0L, 1L, 2L, 999L, 1000L, 1001L, 1500L, 1999L, 2000L, 123456789L)

  private lazy val src = {
    val p = targetPath("graft_ntz_rewrite/src")
    micros.zipWithIndex.toDF("us", "id")
      .select($"id".cast("long").as("id"),
        timestamp_micros($"us").cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  private def nanosCol = expr("unix_micros(cast(ts as timestamp)) * 1000")

  test("every comparison direction folds bounds exactly (both literal sides)") {
    // literals straddling boundaries: whole micros, sub-micro, ±1
    val lits = Seq(0L, 1L, 999L, 1000L, 1001L, 999000L, 999001L,
      999999L, 1000000L, 1000001L, 1500000L, 1999999L, 2000000L)
    for (v <- lits) {
      val cases: Seq[(String, org.apache.spark.sql.Column, Long => Boolean)] =
        Seq(
          (">=", nanosCol >= v, m => m * 1000L >= v),
          (">", nanosCol > v, m => m * 1000L > v),
          ("<", nanosCol < v, m => m * 1000L < v),
          ("<=", nanosCol <= v, m => m * 1000L <= v),
          ("=", nanosCol === v, m => m * 1000L == v),
          ("mirror>=", lit(v) >= nanosCol, m => v >= m * 1000L),
          ("mirror>", lit(v) > nanosCol, m => v > m * 1000L),
          ("mirror<", lit(v) < nanosCol, m => v < m * 1000L),
          ("mirror<=", lit(v) <= nanosCol, m => v <= m * 1000L),
          ("mirror=", lit(v) === nanosCol, m => v == m * 1000L))
      for ((opName, cond, model) <- cases) {
        val got = src.filter(cond).select($"id").as[Long].collect().toSet
        val exp = micros.zipWithIndex
          .collect { case (m, i) if model(m) => i.toLong }.toSet
        assert(got === exp, s"op $opName literal $v ns")
      }
    }
  }

  test("whole-second range is pushed to the NTZ parquet scan") {
    val plan = src.filter(nanosCol >= 1000000000L && nanosCol < 2000000000L)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts,") &&
      plan.contains("LessThan(ts,"),
      s"range not in PushedFilters:\n${plan.take(1500)}")
  }

  test("sub-microsecond equality is NOT rewritten (and stays correct)") {
    // v=1500 ns can never equal a whole-micros value; the rule leaves
    // the shape alone rather than folding to false
    val plan = src.filter(nanosCol === 1500L)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("unix_micros"),
      s"sub-micro equality should stay unrewritten:\n$plan")
    assert(src.filter(nanosCol === 1500L).count() === 0L)
  }

  test("non-UTC session clock backs the rule off") {
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val plan = src.filter(nanosCol >= 1000000000L)
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("unix_micros"),
        s"rule must not fire outside UTC:\n$plan")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("null timestamps flow identically through the rewrite") {
    val p = targetPath("graft_ntz_rewrite/nulls")
    Seq((1L, Some(1000L)), (2L, None)).toDF("id", "us")
      .select($"id", timestamp_micros($"us").cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(p)
    val df = spark.read.parquet(p)
    // null comparison is null → row dropped by Filter, kept by NOT-filter
    // only via null-safe logic; both forms must agree
    assert(df.filter(nanosCol >= 0L).select($"id").as[Long].collect().toSeq
      === Seq(1L))
    assert(df.filter(!(nanosCol >= 0L)).count() === 0L)
  }
}
