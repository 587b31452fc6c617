package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** Properties of the split-accumulator exact product sums
  * (Analytics.limbProductSums / limbRecombined — the an_corr_matrix
  * arithmetic): the three 20-bit limb long sums must recombine to the
  * EXACT decimal(38) sum of the per-row products, on adversarial
  * max-bound data (every row at the documented operand ceiling) and on
  * randomized bounded data, in the grouped shape the query uses. */
class LimbSumSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val MaxCents = 10000000L // documented operand ceiling (~1e7)

  private def exactSums(rows: Seq[(String, Long, Long)]): Map[String, BigInt] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map { case (_, x, y) => BigInt(x) * BigInt(y) }.sum
    }

  private def limbTotals(rows: Seq[(String, Long, Long)]): Map[String, BigInt] = {
    val df = rows.toDF("g", "x", "y")
      .agg(count(lit(1)).as("n"), Analytics.limbProductSums(Seq(("x", "y"))): _*)
    // grouped shape, exactly as the query composes it
    val grouped = rows.toDF("g", "x", "y").groupBy($"g")
      .agg(count(lit(1)).as("n"), Analytics.limbProductSums(Seq(("x", "y"))): _*)
      .select(col("g"), Analytics.limbRecombined("x", "y"))
    assert(df.columns.count(_.startsWith("s_x_y_l")) == 3)
    grouped.collect()
      .map(r => r.getString(0) -> BigInt(r.getDecimal(1).toBigInteger))
      .toMap
  }

  test("adversarial max-bound rows: every product at the 2^47-adjacent ceiling") {
    // 200k rows ALL at the operand ceiling — the worst case for limb
    // carry: each product is 1e14 (just under 2^47) so every limb is
    // simultaneously near its per-row maximum, and the bigger group's
    // Σ (133k × 1e14 ≈ 1.3e19) overflows a bigint
    val rows = (1 to 200000).map(i =>
      (if (i % 3 == 0) "a" else "b", MaxCents, MaxCents))
    val expected = exactSums(rows)
    assert(expected.values.exists(_ > BigInt(Long.MaxValue)),
      "fixture must overflow a bigint or it proves nothing")
    assert(limbTotals(rows) === expected)
  }

  test("randomized bounded rows recombine bit-exactly (seeded)") {
    val rnd = new scala.util.Random(20260816L)
    // (& Long.MaxValue), not math.abs: abs(Long.MinValue) is NEGATIVE
    // and would feed a negative operand into the limb sum
    def bounded() = (rnd.nextLong() & Long.MaxValue) % (MaxCents + 1)
    val rows = (1 to 50000).map { _ =>
      val g = if (rnd.nextBoolean()) "a" else "b"
      (g, bounded(), bounded())
    }
    assert(limbTotals(rows) === exactSums(rows))
  }

  test("precondition misuse RAISES under the debug flag instead of " +
    "summing garbage: negative operand and >=2^60 product") {
    spark.conf.set("spark.graft.debug.validate", "true")
    try {
      def limbs() = Analytics.limbProductSums(Seq(("x", "y")))
      val neg = Seq(("a", -1L, 5L)).toDF("g", "x", "y")
        .groupBy($"g").agg(limbs().head, limbs().tail: _*)
      val e1 = intercept[Exception] { neg.collect() }
      assert(e1.getMessage.contains("limbProductSums precondition"))
      val wide = Seq(("a", 1L << 31, 1L << 31)).toDF("g", "x", "y")
        .groupBy($"g").agg(limbs().head, limbs().tail: _*)
      val e2 = intercept[Exception] { wide.collect() }
      assert(e2.getMessage.contains("limbProductSums precondition"))
      // in-bounds rows still sum exactly with the guard active
      val ok = Seq(("a", MaxCents, MaxCents)).toDF("g", "x", "y")
        .groupBy($"g").agg(limbs().head, limbs().tail: _*)
        .select(Analytics.limbRecombined("x", "y"))
      assert(BigInt(ok.collect()(0).getDecimal(0).toBigInteger)
        === BigInt(MaxCents) * BigInt(MaxCents))
    } finally spark.conf.unset("spark.graft.debug.validate")
  }

  test("zero and identity edges: empty products, single row, zero operands") {
    val rows = Seq(("a", 0L, MaxCents), ("a", MaxCents, 0L),
      ("b", 1L, 1L), ("c", MaxCents, 1L))
    assert(limbTotals(rows) === exactSums(rows))
  }
}
