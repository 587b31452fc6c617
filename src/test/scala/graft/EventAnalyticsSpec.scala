package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-12 event-analytics operators —
  * properties the DuckDB hash-equality gate cannot express (bounds,
  * conservation laws, inversions), checked on sf0.001. */
class EventAnalyticsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("an_rfm: scores stay in 1..5, quintiles are near-balanced, " +
    "and recency is inverted") {
    val rows = SparkEntry.queries("an_rfm")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, r, f, m) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5,
        s"user $u out-of-range scores ($r,$f,$m)")
    }
    // quintiles from exact percentiles: each monetary score bucket holds
    // 20% ± the tie slack; on near-tie-free money, no bucket can exceed
    // half the population or vanish
    val byM = rows.groupBy(_._4).view.mapValues(_.length)
    assert(byM.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(byM.values.max <= rows.length / 2)
    // recency inversion: the user with the LATEST purchase scores r=5
    val latest = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .orderBy($"ts".desc).select($"user_id").as[Long].head()
    assert(rows.find(_._1 == latest).get._2 === 5L)
  }

  test("an_decay_agg: decayed score is bounded by 1e6 x plain sum and " +
    "equals it for the newest-bucket rows") {
    val got = SparkEntry.queries("an_decay_agg")(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val plain = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(sum(round($"value" * 100).cast("long")).as("s"))
      .as[(Long, Long)].collect().toMap
    // dec == 0 is legitimate: 1e6 >> h is exactly 0 for h >= 20, so a
    // user whose events are all >= 20 half-lives older than the corpus
    // max decays to zero — assert the bound, not strict positivity
    got.foreach { case (u, dec) =>
      assert(dec <= plain(u) * 1000000L, s"user $u decayed above weight 1")
      assert(dec >= 0, s"user $u decayed negative")
    }
  }

  test("an_retention: offset-0 retention is exactly 1000 per-mille, no " +
    "offset exceeds its cohort, and cohorts partition the user set") {
    val rows = SparkEntry.queries("an_retention")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val sizes = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    rows.foreach { case (cohort, off, active, pm) =>
      assert(sizes.contains(cohort), s"cohort $cohort missing offset 0")
      assert(active <= sizes(cohort), s"cohort $cohort offset $off " +
        "retains more users than it has")
      if (off == 0L) assert(pm === 1000L)
      assert(pm >= 0 && pm <= 1000L)
    }
    val totalUsers = Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(sizes.values.sum === totalUsers,
      "every user belongs to exactly one cohort")
  }

  test("an_markov: per-prev probabilities sum to 1 and counts conserve " +
    "the transition total") {
    val rows = SparkEntry.queries("an_markov")(spark, sf)
      .as[(String, String, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (prev, ts) =>
      val p = ts.map(_._4).sum
      assert(math.abs(p - 1.0) < 1e-4, s"$prev rows sum to $p")
    }
    val nTrans = rows.map(_._3).sum
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(nTrans === nEvents - nUsers) // one lead() hole per user
  }

  test("an_entropy: 0 <= H <= ln(n_types), in micro-nats") {
    val rows = SparkEntry.queries("an_entropy")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length === 10)
    rows.foreach { case (c, _, nTypes, h) =>
      assert(h >= 0, s"cohort $c negative entropy")
      assert(h <= math.round(math.log(nTypes.toDouble) * 1e6) + nTypes,
        s"cohort $c entropy above ln(k)")
    }
  }

  test("an_benford: expectations sum to one million ppm and chi terms " +
    "are non-negative") {
    val rows = SparkEntry.queries("an_benford")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSet === (1L to 9L).toSet)
    val ppm = rows.map(_._3).sum
    assert(math.abs(ppm - 1000000L) <= 5, s"ppm sum $ppm") // rounding slack
    rows.foreach { case (d, n, _, chi) =>
      assert(n > 0 && chi >= 0.0, s"digit $d degenerate")
    }
  }

  test("an_chi2_indep: statistic non-negative, marginal conservation") {
    val (cells, obs, chi, dof) = SparkEntry.queries("an_chi2_indep")(spark, sf)
      .as[(Long, Long, Long, Long)].head()
    assert(chi >= 0 && dof === 16L)
    assert(cells <= 25L)
    assert(obs === Tables.events(spark, sf).count())
  }

  test("gated ingest parity: the streaming quarantine equals the batch " +
    "quarantine row for row (same rules, different write paths)") {
    val batch = SparkEntry.queries("m20_quarantine")(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    val stream = SparkEntry.queries("st16_stream_quarantine")(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(batch === stream)
    assert(batch.map(_._1).contains("landed"))
  }

  test("an_gini: bounds, and concentration orders a flat vs skewed set") {
    val rows = SparkEntry.queries("an_gini")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nat, n, g) =>
      assert(g >= -1e-6 && g < 1.0, s"nation $nat gini $g out of range")
      assert(n > 0)
    }
    // sanity on the formula itself: perfectly equal values → 0,
    // one-owner-takes-all → (n-1)/n
    def gini(xs: Seq[Long]): Double = {
      val s = xs.sorted
      val n = s.length
      val six = s.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
      2.0 * six / (n.toLong * s.sum) - (n + 1.0) / n
    }
    assert(math.abs(gini(Seq.fill(10)(100L))) < 1e-9)
    assert(math.abs(gini(Seq.fill(9)(0L) :+ 1000L) - 0.9) < 1e-9)
  }

  test("an_window_funnel: depth histogram is a refinement chain — " +
    "every depth-k user is a depth-(k-1) user by definition") {
    val hist = SparkEntry.queries("an_window_funnel")(spark, sf)
      .as[(Long, Long)].collect().toMap
    // depth counts must not exceed the number of users with a view
    val viewers = Tables.events(spark, sf)
      .filter($"event_type" === "view").select($"user_id")
      .distinct().count()
    assert(hist.values.sum === viewers)
    // the max depth bucket is non-empty and depths are within 1..3
    assert(hist.keySet.subsetOf(Set(1L, 2L, 3L)))
  }
}
