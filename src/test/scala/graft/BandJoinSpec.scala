package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** j16's bucketized band join must equal the naive |a−b| ≤ ε
  * theta-join on arbitrary data — including the bucket-boundary and
  * negative-value edges the bucketization could get wrong. */
class BandJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val eps = 50L

  /** The j16 engine shape, parameterized by the two value sets. */
  private def banded(sup: Seq[(Long, Long)], cst: Seq[(Long, Long)]) = {
    val c = cst.toDF("c_id", "c_cents")
      .withColumn("bucket", floor($"c_cents" / eps.toDouble).cast("long"))
    val p = sup.toDF("s_id", "s_cents")
      .withColumn("b0", floor($"s_cents" / eps.toDouble).cast("long"))
      .withColumn("bucket", explode(array($"b0" - 1, $"b0", $"b0" + 1)))
    p.join(c, "bucket")
      .filter(abs($"s_cents" - $"c_cents") <= eps)
      .select($"s_id", $"c_id")
      .as[(Long, Long)].collect().toSet
  }

  private def naive(sup: Seq[(Long, Long)], cst: Seq[(Long, Long)]) =
    (for ((s, sv) <- sup; (c, cv) <- cst if math.abs(sv - cv) <= eps)
      yield (s, c)).toSet

  test("bucketized band join == naive theta join on random signed values") {
    val rnd = new scala.util.Random(42)
    val sup = (1L to 60L).map(i => i -> (rnd.nextLong(4000) - 2000))
    val cst = (1L to 200L).map(i => i -> (rnd.nextLong(4000) - 2000))
    assert(banded(sup, cst) === naive(sup, cst))
  }

  test("boundary cases: exact-eps gaps, bucket edges, negatives, ties") {
    // pairs exactly eps apart (inclusive), exactly eps+1 (excluded),
    // values ON bucket multiples, and negative values straddling zero
    val sup = Seq(1L -> 0L, 2L -> 50L, 3L -> -50L, 4L -> 100L, 5L -> -1L)
    val cst = Seq(10L -> 50L, 11L -> 51L, 12L -> -100L, 13L -> 0L,
      14L -> 150L, 15L -> -51L, 16L -> 49L)
    assert(banded(sup, cst) === naive(sup, cst))
  }

  test("no duplicate pairs from the 3-bucket fanout") {
    val sup = Seq(1L -> 25L)
    val cst = Seq(10L -> 25L) // same bucket; supplier probes 3 buckets
    val c = cst.toDF("c_id", "c_cents")
      .withColumn("bucket", floor($"c_cents" / eps.toDouble).cast("long"))
    val p = sup.toDF("s_id", "s_cents")
      .withColumn("b0", floor($"s_cents" / eps.toDouble).cast("long"))
      .withColumn("bucket", explode(array($"b0" - 1, $"b0", $"b0" + 1)))
    val rows = p.join(c, "bucket")
      .filter(abs($"s_cents" - $"c_cents") <= eps).count()
    assert(rows === 1L) // met in exactly one bucket
  }
}
