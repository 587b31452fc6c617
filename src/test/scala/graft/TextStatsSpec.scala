package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the corpus text-statistics queries
  * (`llm_vocab_topk`, `llm_tfidf_topterms`). The DuckDB oracle checks
  * Spark-vs-SQL agreement on the big tables; these pin the *intended*
  * formulas on a corpus small enough to verify on paper.
  */
class TextStatsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // doc 0: {b:2, a:1}   doc 1: {a:1, c:1}   doc 2: {a:1}
  private lazy val dir: String = {
    val d = RepoPaths.target("textstats_fixture")
    Seq((0L, "b a b"), (1L, "a c"), (2L, "a"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("vocab: term frequency sums occurrences, doc frequency counts docs") {
    val got = SparkEntry.queries("llm_vocab_topk")(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 3L, 3L), ("b", 2L, 1L), ("c", 1L, 1L)))
  }

  test("tfidf: tf * ln(N/df), ubiquitous terms score zero, top-3 by score") {
    val got = SparkEntry.queries("llm_tfidf_topterms")(spark, dir)
      .as[(Long, Long, String, Double)].collect().toSeq
    val ln3 = math.log(3.0)
    assert(got === Seq(
      (0L, 1L, "b", r6(2 * ln3)), // b: tf 2, df 1
      (0L, 2L, "a", 0.0),         // a is in every doc -> ln(1) = 0
      (1L, 1L, "c", r6(ln3)),
      (1L, 2L, "a", 0.0),
      (2L, 1L, "a", 0.0)))
  }
}
