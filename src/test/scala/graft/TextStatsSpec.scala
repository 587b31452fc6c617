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

  test("pack: running offsets per salted stream, chunk boundary at 4096 tokens") {
    val d = RepoPaths.target("textstats_pack_fixture")
    // stream 0 gets docs 0 (3 tokens), 32 (5000 tokens), 64 (1 token):
    // offsets 0, 3, 5003 — doc 64 starts past the 4096 boundary, bin 1
    Seq((0L, "b a b"), (32L, Seq.fill(5000)("tok").mkString(" ")),
        (64L, "x"), (1L, "y z"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("llm_pack_sequences")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val T = 1000000000000L
    assert(got === Seq(
      (0L, 3L, 0L, 0L, 0L),
      (1L, 2L, 1L, 0L, T),
      (32L, 5000L, 0L, 3L, 0L),       // starts in bin 0, spans into 1
      (64L, 1L, 0L, 5003L, 1L)))      // past 4096 -> second chunk
  }

  test("pack invariants hold on a random corpus (exact prefix sums, no doc lost)") {
    val r = new scala.util.Random(7L)
    val docs = (0L until 500L).map { id =>
      (id, Seq.fill(1 + r.nextInt(200))("t").mkString(" "))
    }
    val d = RepoPaths.target("textstats_pack_prop")
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("llm_pack_sequences")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet === docs.map(_._1).toSet) // every doc, once
    got.groupBy(_._3).foreach { case (stream, rows) =>
      val inOrder = rows.sortBy(_._1)
      // offsets are the exact prefix sums of token counts, in doc order
      val prefix = inOrder.map(_._2).scanLeft(0L)(_ + _).init
      assert(inOrder.map(_._4).toSeq === prefix.toSeq, s"stream $stream")
      inOrder.foreach { case (id, _, s, off, seq) =>
        assert(s === id % 32 && seq === s * 1000000000000L + off / 4096L)
      }
    }
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

  test("ccnet buckets: balanced terciles, ordered by LM quality") {
    val rows = SparkEntry.queries("llm_ccnet_buckets")(
        spark, "/root/testdata/sf0.01")
      .as[(Long, Double, String)].collect()
    val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    // terciles balanced within 1
    val sizes = byBucket.values.map(_.length)
    assert(sizes.max - sizes.min <= 1, s"unbalanced: $byBucket")
    // head = lowest perplexity proxy: max(head) <= min(middle) etc.
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
  }

  test("gopher rules: the corrupted copy fails the gates its mutation trips") {
    // corpus = documents ∪ symbol-spammed upper-cased copies (negative
    // ids -id-1, disjoint from real ids at any corpus size): every
    // corrupted doc must fail alpha + stopwords + symbols and the
    // conjunction; originals must all pass alpha and symbols.
    val rows = SparkEntry.queries("llm_gopher_rules")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val (orig, corr) = rows.partition(_._1 >= 0L)
    assert(orig.nonEmpty && corr.length === orig.length)
    corr.foreach { case (id, _, _, alpha, stop, sym, pass) =>
      assert(alpha === 0L && stop === 0L && sym === 0L && pass === 0L,
        s"corrupted $id slipped a gate")
    }
    assert(orig.forall(r => r._4 === 1L && r._6 === 1L)) // alpha, symbols
    assert(orig.exists(_._7 === 1L)) // and some originals pass everything
  }
}
