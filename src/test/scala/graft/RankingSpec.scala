package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.GraphOps
import graft.llm.Retrieval

/** Ranking operators on hand-crafted fixtures: PageRank (g11) and BM25
  * retrieval (llm_bm25_topk). */
class RankingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def symPairs(edges: Seq[(Long, Long)]) =
    GraphOps.reverse(edges.toDF("src", "dst"))

  test("pageRank: ranks sum to 1 and the star center dominates") {
    // star: 0 — {1,2,3,4}
    val pr = GraphOps.pageRank(
      symPairs(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))), iters = 2)
      .select($"vertex", $"pr").as[(Long, Double)].collect().toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    assert(pr(0L) > pr(1L))
    // leaves are symmetric, so their ranks agree exactly
    assert(Seq(pr(1L), pr(2L), pr(3L), pr(4L)).distinct.size === 1)
  }

  test("pageRank: a regular graph stays uniform at 1/N") {
    // 4-cycle: every vertex has degree 2, rank must remain 1/4
    val pr = GraphOps.pageRank(
      symPairs(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))), iters = 3)
      .select($"vertex", $"pr").as[(Long, Double)].collect().toMap
    pr.values.foreach(v => assert(math.abs(v - 0.25) < 1e-9))
  }

  test("pageRank: directed input with sinks conserves rank mass") {
    // 1 -> 2 -> 3, 1 -> 3: vertex 3 is DANGLING (no out-edges). Without
    // the dangling-mass term, 3's rank would leak out of the system
    // every iteration; with it, total rank stays exactly 1.
    val directed = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val pr = GraphOps.pageRank(directed, iters = 3)
      .select($"vertex", $"degree", $"pr")
      .as[(Long, Long, Double)].collect()
    assert(pr.length === 3)
    val byV = pr.map(r => r._1 -> r._3).toMap
    assert(math.abs(pr.map(_._3).sum - 1.0) < 1e-9,
      s"mass not conserved: $byV")
    // the sink exists in the vertex set with degree 0 and accumulates
    // the most rank (everything flows into 3)
    assert(pr.find(_._1 == 3L).get._2 === 0L)
    assert(byV(3L) > byV(1L) && byV(3L) > byV(2L))
    // vertex 1 has no in-edges: exactly the teleport + dangling share
    assert(byV(1L) < byV(2L))
  }

  test("pageRank: repeated invocations leave no cached plans behind") {
    val pairs = symPairs(Seq((1L, 2L), (2L, 3L)))
    val before = spark.sparkContext.getPersistentRDDs.size
    GraphOps.pageRank(pairs, iters = 2).collect()
    GraphOps.pageRank(pairs, iters = 2).collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    // each call may leave its localCheckpoint blocks (per-round + final,
    // released by GC with the frames); the edge + degree CACHES — the
    // leak ADVICE flagged — must be gone before return
    assert(after - before <= 4,
      s"pageRank leaked cached RDDs: $before -> $after")
  }

  test("pageRank: symmetric=true equals the default path on a " +
    "symmetric graph, and a FALSE claim fails loudly under the " +
    "debug flag") {
    // asymmetric star so per-vertex ranks differ (a regular graph
    // would mask a wrong-degree bug behind uniformity)
    val pairs = symPairs(Seq((0L, 1L), (0L, 2L), (0L, 3L), (2L, 3L)))
    def ranks(sym: Boolean) = GraphOps.pageRank(pairs, iters = 3,
      symmetric = sym).select($"vertex", $"degree", $"pr")
      .as[(Long, Long, Double)].collect().toSet
    assert(ranks(sym = true) === ranks(sym = false))
    spark.conf.set("spark.graft.debug.validate", "true")
    try {
      assert(ranks(sym = true) === ranks(sym = false)) // true claim passes
      val e = intercept[IllegalArgumentException] {
        GraphOps.pageRank(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"),
          iters = 2, symmetric = true).count()
      }
      assert(e.getMessage.contains("missing reverse edges"))
    } finally spark.conf.unset("spark.graft.debug.validate")
  }

  test("pageRank: iterations contract toward the fixpoint") {
    // the star is bipartite so ranks OSCILLATE around the fixpoint —
    // assert the damped contraction, not monotonicity
    val pairs = symPairs(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    def center(iters: Int): Double =
      GraphOps.pageRank(pairs, iters).filter($"vertex" === 0)
        .select($"pr").as[Double].head()
    val fix = center(20)
    assert(math.abs(center(3) - fix) < math.abs(center(1) - fix))
    assert(fix > 0.2) // the hub ends above the uniform 1/N start
  }

  private val corpus = Seq(
    (0L, "apple apple pie and cake"),     // tf(apple)=2
    (1L, "apple tart with some cream"),   // tf(apple)=1, same length
    (2L, "banana bread with no fruit"),   // rare term, tf=1
    (3L, "plain sponge with no fruit"),   // no query term at all
    (4L, "apple apple apple apple apple") // saturation probe
  ).toDF("doc_id", "text")

  test("bm25: higher tf wins at equal length; no-term docs are absent") {
    val s = Retrieval.bm25Scores(corpus, Seq("apple", "banana"))
      .as[(Long, Double)].collect().toMap
    assert(s(0L) > s(1L))      // tf 2 beats tf 1, identical dl
    assert(!s.contains(3L))    // no query term → no row
    assert(s.values.forall(_ > 0))
  }

  test("bm25: rarer terms score higher at equal tf and length") {
    // apple df=3, banana df=1 → banana's idf (and score) must win
    val s = Retrieval.bm25Scores(corpus, Seq("apple", "banana"))
      .as[(Long, Double)].collect().toMap
    assert(s(2L) > s(1L))
  }

  test("bm25: term-frequency saturation — tf 5 gains less than 5x") {
    val s = Retrieval.bm25Scores(corpus, Seq("apple"))
      .as[(Long, Double)].collect().toMap
    assert(s(4L) > s(0L))            // more hits still scores higher
    assert(s(4L) < 5.0 * s(1L))      // but sub-linearly (k1 saturation)
  }

  test("domainMix: alpha<1 flattens the mix toward rare strata") {
    // 90 docs in (srcA, en), 10 in (srcB, de) — temperature 0.5
    val docs = ((0 until 90).map(i => ("srcA", "en", s"common doc $i"))
      ++ (0 until 10).map(i => ("srcB", "de", s"rare doc $i")))
      .toDF("source", "lang", "text")
    val mix = Retrieval.domainMix(docs, alpha = 0.5, target = 20L)
      .collect().map(r => (r.getString(0),
        (r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    val (nA, wA, _, sA) = mix("srcA")
    val (nB, wB, _, sB) = mix("srcB")
    assert(math.abs(wA + wB - 1.0) < 1e-5)   // weights normalize
    // proportional shares are 0.9/0.1; sqrt flattening must pull the
    // rare stratum ABOVE its share and the common one below
    assert(wB > 0.1 && wA < 0.9)
    assert(sA <= nA && sB <= nB)             // never oversample a stratum
    // the hash gate admits roughly p_ppm of each stratum (exactness is
    // the oracle's job; here just pin that both strata sampled SOMETHING)
    assert(sA > 0 && sB > 0)
  }

  test("bigramNll: predictable text scores lower than unpredictable text") {
    // context 's' has successors a (3x) and b/c/d (1x each):
    // doc 10 repeats the MAJORITY continuation, docs 11-13 each take a
    // minority one — the LM must score doc 10 as more predictable
    val docs = Seq(
      (10L, "s a s a s a"),
      (11L, "s b q q"), (12L, "s c q q"), (13L, "s d q q"))
      .toDF("doc_id", "text")
    val nll = Retrieval.bigramNll(docs)
      .select($"doc_id", $"nll").as[(Long, Double)].collect().toMap
    assert(nll(10L) < nll(11L))
    assert(nll(11L) === nll(12L)) // symmetric minority docs tie exactly
    // a certain continuation (p=1 everywhere) has zero information
    val certain = Retrieval.bigramNll(
      Seq((1L, "u v u v u v")).toDF("doc_id", "text"))
      .select($"nll").as[Double].head()
    assert(certain === 0.0)
  }

  test("domainMix: equal strata get equal weights and quotas") {
    val docs = (0 until 40).map(i => (s"src${i % 4}", "en", s"doc $i"))
      .toDF("source", "lang", "text")
    val mix = Retrieval.domainMix(docs, alpha = 0.5, target = 40L)
      .collect().map(r => (r.getDouble(3), r.getLong(4)))
    assert(mix.map(_._1).distinct.length === 1)
    assert(mix.map(_._2).distinct.length === 1)
  }
}
