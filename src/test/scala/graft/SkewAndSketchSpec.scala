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

  test("HLL estimate within 30% of exact for every event_type (m=64)") {
    // m=64 ⇒ HLL σ ≈ 1.04/√64 = 13%; the sf0.01 cardinalities sit in
    // the linear-counting crossover where error is worst, so pin 30%.
    // Bit-level portability is the an_hll_distinct oracle's job — this
    // spec pins the ACCURACY contract of the estimator itself.
    val rows = SparkEntry.queries("an_hll_distinct")(
        spark, "/root/testdata/sf0.01")
      .select($"event_type", $"n_exact", $"est")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, exact, est) =>
      val rel = math.abs(est - exact) / exact
      assert(rel < 0.30, s"$et: est $est vs exact $exact (rel $rel)")
    }
  }

  test("HLL sketch merge of disjoint halves equals the whole's sketch") {
    // The property a 1000-executor rollup rests on: per-partition
    // register vectors combined by max() ARE the whole dataset's
    // sketch — no re-scan, any grouping of the input.
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("h", graft.llm.TextOps.sharedHash($"user_id".cast("string")))
      .withColumn("bucket", expr("h DIV 18014398509481984"))
      .withColumn("r", pmod($"h", lit(18014398509481984L)))
      .withColumn("rho",
        when($"r" > 0, lit(55) - length(bin($"r"))).otherwise(lit(55))
          .cast("long"))
      .groupBy($"bucket").agg(max($"rho").as("reg"))
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select($"user_id")
    val whole = regs(ev).as[(Long, Long)].collect().toMap
    val a = regs(ev.filter(pmod($"user_id", lit(2L)) === 0))
    val b = regs(ev.filter(pmod($"user_id", lit(2L)) === 1))
    val mergedHalves = a.union(b).groupBy($"bucket")
      .agg(max($"reg").as("reg")).as[(Long, Long)].collect().toMap
    assert(mergedHalves === whole)
  }

  test("count-min: est >= exact always, overestimate bounded by eN") {
    // The two CM guarantees (Cormode & Muthukrishnan 2005): min over
    // d rows never undercounts, and with w=512 the expected
    // overestimate is N·e/512 ≈ 0.53% of stream length — pin 4 rows
    // at 8× that (union bound slack). Bit-level portability is the
    // an_heavy_hitters oracle's job; this pins the sketch contract.
    val d = "/root/testdata/sf0.01"
    val n = Tables.events(spark, d).count()
    val rows = SparkEntry.queries("an_heavy_hitters")(spark, d)
      .as[(Long, Long, Long)].collect()
    assert(rows.length === 20)
    rows.foreach { case (uid, exact, est) =>
      assert(est >= exact, s"user $uid: CM undercounted ($est < $exact)")
      assert(est <= exact + 8L * n * 3 / 512,
        s"user $uid: est $est vs exact $exact at N=$n")
    }
  }

  test("count-min sketch merge of disjoint halves equals the whole") {
    // Per-cell SUM is the mergeable-sketch property the 1000-executor
    // rollup uses: partial (j,cell) counts from any partitioning of
    // the input sum to the whole stream's sketch.
    import graft.llm.TextOps.sharedHash
    def sketch(df: org.apache.spark.sql.DataFrame) = df
      .select(posexplode(array((0 until 4).map(j =>
        pmod(sharedHash(concat(lit(s"cm$j:"), $"user_id".cast("string"))),
          lit(512L))): _*)).as(Seq("j", "cell")))
      .groupBy($"j", $"cell").agg(count(lit(1)).as("cnt"))
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select($"user_id")
    val whole = sketch(ev).as[(Int, Long, Long)].collect()
      .map { case (j, c, n) => (j, c) -> n }.toMap
    val halves = sketch(ev.filter(pmod($"user_id", lit(2L)) === 0))
      .union(sketch(ev.filter(pmod($"user_id", lit(2L)) === 1)))
      .groupBy($"j", $"cell").agg(sum($"cnt").as("cnt"))
      .as[(Int, Long, Long)].collect()
      .map { case (j, c, n) => (j, c) -> n }.toMap
    assert(halves === whole)
  }

  test("one-pass corr matrix agrees with Spark's built-in corr()") {
    // Independent implementation check: the exact-integer power-sum
    // form vs Catalyst's streaming co-moment aggregate. They differ
    // only in float accumulation order, so 1e-4 absolute agreement.
    val d = "/root/testdata/sf0.01"
    val ours = SparkEntry.queries("an_corr_matrix")(spark, d)
      .as[(String, String, Double)].collect()
      .map { case (rf, pair, c) => (rf, pair) -> c }.toMap
    assert(ours.size === 18)
    val li = Tables.lineitem(spark, d).select($"l_returnflag",
      round($"l_quantity" * 100).cast("long").as("q"),
      round($"l_extendedprice" * 100).cast("long").as("p"),
      round($"l_discount" * 100).cast("long").as("dc"),
      round($"l_tax" * 100).cast("long").as("t"))
    val builtin = li.groupBy($"l_returnflag").agg(
        corr($"q", $"p").as("q_p"), corr($"q", $"dc").as("q_dc"),
        corr($"q", $"t").as("q_t"), corr($"p", $"dc").as("p_dc"),
        corr($"p", $"t").as("p_t"), corr($"dc", $"t").as("dc_t"))
      .collect()
    builtin.foreach { r =>
      val rf = r.getString(0)
      Seq("q_p", "q_dc", "q_t", "p_dc", "p_t", "dc_t").zipWithIndex
        .foreach { case (pair, i) =>
          val expected = r.getDouble(i + 1)
          val got = ours((rf, pair))
          assert(math.abs(got - expected) < 1e-4,
            s"($rf,$pair): $got vs builtin $expected")
          assert(got >= -1.0 && got <= 1.0)
        }
    }
  }

  test("Welch t-test agrees with a direct two-sample computation") {
    val d = "/root/testdata/sf0.01"
    val ours = SparkEntry.queries("an_ab_ttest")(spark, d)
      .select($"event_type", $"t_stat", $"df")
      .as[(String, Option[Double], Option[Double])].collect()
    assert(ours.nonEmpty)
    val ev = Tables.events(spark, d)
      .select($"event_type", ($"user_id" % 2).as("grp"),
        (round($"value" * 100) / 100.0).as("v"))
    val direct = ev.groupBy($"event_type", $"grp")
      .agg(count(lit(1)).cast("double").as("n"),
        avg($"v").as("m"), var_samp($"v").as("s2"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    ours.foreach { case (et, tOpt, dfOpt) =>
      val (na, ma, va) = direct((et, 0L))
      val (nb, mb, vb) = direct((et, 1L))
      val se2 = va / na + vb / nb
      val t = (ma - mb) / math.sqrt(se2)
      val df = se2 * se2 / ((va / na) * (va / na) / (na - 1) +
        (vb / nb) * (vb / nb) / (nb - 1))
      assert(math.abs(tOpt.get - t) < 1e-3, s"$et: t ${tOpt.get} vs $t")
      assert(math.abs(dfOpt.get - df) / df < 1e-3,
        s"$et: df ${dfOpt.get} vs $df")
      // Welch df is bounded by the two sample sizes
      assert(dfOpt.get >= math.min(na, nb) - 1 &&
        dfOpt.get <= na + nb - 2)
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

  test("streaming CM sketch merge equals the one-shot batch sketch") {
    // st14 reduces each micro-batch to a partial count-min sketch and
    // merges by per-cell SUM; associativity makes the standing answer
    // EQUAL the batch operator's — the mergeable-sketch contract that
    // lets a stream and a backfill share one definition.
    val streamed = SparkEntry.queries("st14_stream_heavy_hitters")(
      spark, "/root/testdata/sf0.001").collect().toSeq
    val batch = SparkEntry.queries("an_heavy_hitters")(
      spark, "/root/testdata/sf0.001").collect().toSeq
    assert(streamed === batch)
  }

  test("basket lift: invariants (lift floor via min-support, conf <= 1)") {
    val rows = SparkEntry.queries("an_basket_lift")(
        spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.length === 20)
    rows.foreach { case (a, b, cab, ca, cb, lift, conf) =>
      assert(a < b && cab >= 3 && cab <= math.min(ca, cb))
      assert(conf > 0.0 && conf <= 1.0)
      assert(lift > 0.0)
    }
    // ranked descending by lift
    assert(rows.map(_._6).sliding(2).forall(p => p.head >= p.last))
  }

  test("OLS power sums agree with Spark's regr_slope/regr_intercept/corr") {
    val got = SparkEntry.queries("an_ols")(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Double, Double, Double)].collect()
    val want = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select($"l_returnflag",
        round($"l_quantity" * 100).cast("double").as("x"),
        round($"l_extendedprice" * 100).cast("double").as("y"))
      .groupBy($"l_returnflag")
      .agg(expr("regr_slope(y, x)").as("sl"),
        expr("regr_intercept(y, x)").as("ic"), corr($"y", $"x").as("r"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    got.foreach { case (rf, _, slope, intercept, r2) =>
      val (sl, ic, r) = want(rf)
      assert(math.abs(slope - sl) < 1e-3, s"$rf slope $slope vs $sl")
      assert(math.abs(intercept - ic) < 1.0, s"$rf intercept")
      assert(math.abs(r2 - r * r) < 1e-6, s"$rf r2 $r2 vs ${r * r}")
    }
  }

  test("KS test: null-true split stays under the 1% critical value") {
    // A-vs-R returnflag is an arbitrary split of the same price
    // distribution — D must sit below c(0.01)·sqrt((n1+n2)/(n1·n2))
    // with c(0.01) = 1.628, and the p approximation must not reject.
    val (n1, n2, d, _, p) = SparkEntry.queries("an_ks_test")(
        spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Double, Double, Double)].collect().head
    val crit = 1.628 * math.sqrt((n1 + n2).toDouble / (n1.toDouble * n2))
    assert(d < crit, s"D=$d >= 1% critical $crit on a null-true split")
    assert(p > 0.01, s"p=$p rejects a null-true split")
  }

  test("Poisson bootstrap: CI brackets the exact mean, width ~ theory") {
    // CLT check: the half-width of the ~94% percentile interval should
    // be within a loose factor of 1.88*sd/sqrt(n); and lo < mean < hi.
    val rows = SparkEntry.queries("an_bootstrap")(
        spark, "/root/testdata/sf0.01")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.length === 3)
    val sds = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .groupBy($"l_returnflag")
      .agg(stddev(round($"l_extendedprice" * 100)).as("sd"))
      .as[(String, Double)].collect().toMap
    rows.foreach { case (rf, n, mean, lo, hi) =>
      assert(lo < mean && mean < hi, s"$rf: [$lo, $hi] !∋ $mean")
      val half = (hi - lo) / 2
      val theory = 1.88 * sds(rf) / math.sqrt(n.toDouble)
      assert(half > theory / 3 && half < theory * 3,
        s"$rf: half-width $half vs theory $theory")
    }
  }

  test("quantile sketch: estimate within one bin width of exact") {
    // The estimate is hash-checked against DuckDB by the
    // an_quantile_sketch oracle; this spec pins the ACCURACY contract
    // of the 128-bin equi-width sketch: |est - exact| <= span/128.
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(round($"l_extendedprice" * 100).cast("long").as("c"))
    val (lo, hi) = li.agg(min($"c"), max($"c")).as[(Long, Long)]
      .collect().head
    val binW = (hi - lo + 1) / 128 + 1
    val rows = SparkEntry.queries("an_quantile_sketch")(
        spark, "/root/testdata/sf0.01")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length === 9) // 3 groups x {p50, p90, p99}
    rows.foreach { case (rf, q, _, est, exact, err) =>
      assert(err === math.abs(est - exact))
      assert(err <= binW, s"$rf p$q: est $est vs exact $exact (bin $binW)")
    }
  }
}
