package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.GraphOps

/** Large-star/small-star connected components (Kiveris et al. 2014):
  * exact labels on adversarial shapes (long paths — the high-diameter
  * case the algorithm exists for), agreement with a local union-find
  * on a pseudo-random graph, and the fail-fast runaway guard. */
class StarCcSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponentsStar(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-relabel: root chains compress toward the minimum by merge order
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = vs.groupBy(find)
    byRoot.flatMap { case (_, m) => m.map(_ -> m.min) }.toMap
  }

  test("long path collapses to one component rooted at its minimum") {
    // diameter 63 — label propagation would need 63 rounds; star
    // contraction needs O(log n)
    val path = (1L until 64L).map(i => (i, i + 1))
    val labels = cc(path)
    assert(labels.keySet === (1L to 64L).toSet)
    assert(labels.values.toSet === Set(1L))
  }

  test("disjoint shapes keep distinct roots; duplicates/orientation ignored") {
    val edges = Seq(
      (5L, 3L), (3L, 5L), (5L, 5L),        // dup + self + reversed
      (10L, 11L), (11L, 12L),              // path
      (20L, 21L), (20L, 22L), (20L, 23L))  // star
    val labels = cc(edges)
    assert(labels === Map(3L -> 3L, 5L -> 3L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("agrees with union-find on a pseudo-random graph") {
    val edges = (0 until 500).map { i =>
      val a = (i * 2654435761L) % 300
      val b = (i * 40503L + 7) % 300
      (a, b)
    }.filter(e => e._1 != e._2)
    assert(cc(edges) === unionFind(edges))
  }

  test("runaway guard fails fast instead of returning unconverged labels") {
    val path = (1L until 64L).map(i => (i, i + 1))
    assertThrows[IllegalStateException] {
      GraphOps.connectedComponentsStar(path.toDF("src", "dst"),
        maxRounds = 1).collect()
    }
  }
}
