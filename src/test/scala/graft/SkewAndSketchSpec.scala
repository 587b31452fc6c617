package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Skew-handling and sketch accuracy (scale toolkit). */
class SkewAndSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed dataset") {
    // 90% of rows share one key — the classic skew shape
    val big = (1 to 10000)
      .map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong))
      .toDF("k", "payload")
    val small = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (3L, "c"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .select($"k", $"payload", $"name")
      .as[(Long, Long, String)].collect().toSet
    val salted = Joins.saltedJoin(big, small, "k", 8)
      .select($"k", $"payload", $"name")
      .as[(Long, Long, String)].collect().toSet
    assert(salted === plain)
    assert(plain.count(_._1 == 42L) > 8000)
  }

  test("KMV estimate within 25% of exact for every event_type (k=64)") {
    // k=64 ⇒ expected relative error ~1/sqrt(k-2) ≈ 12.7%; 2σ bound.
    // The estimate itself is hash-checked against DuckDB by the
    // an_kmv_distinct oracle — this spec pins the ACCURACY contract.
    val rows = SparkEntry.queries("an_kmv_distinct")(
        spark, "/root/testdata/sf0.01")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, exact, est) =>
      val rel = math.abs(est - exact) / exact
      assert(rel < 0.25, s"$et: est $est vs exact $exact (rel $rel)")
    }
  }

  test("approx_count_distinct within 5% of exact on orders custkeys") {
    val o = Tables.orders(spark, "/root/testdata/sf0.01")
    val row = o.agg(countDistinct($"o_custkey").as("exact"),
      approx_count_distinct($"o_custkey", rsd = 0.01).as("approx"))
      .as[(Long, Long)].collect().head
    val rel = math.abs(row._2 - row._1).toDouble / row._1
    assert(rel < 0.05, s"approx ${row._2} vs exact ${row._1} (rel $rel)")
  }
}
