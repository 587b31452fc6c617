package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Plan-shape assertions — the 100 TB story is in the physical plan:
  * filters/projections must reach the parquet scan, small-side joins
  * must broadcast, chained filters must fuse into one scan.
  */
class PlanSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("s1 scan: predicate pushed to parquet, columns pruned") {
    val plan = SparkEntry.queries("s1_scan_pushdown")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("PushedFilters:"), plan.take(500))
    assert(plan.contains("GreaterThan(l_extendedprice,5000.0)"), plan.take(2000))
    // projection pruning: untouched columns never reach the scan
    assert(!plan.contains("l_shipdate"))
    assert(!plan.contains("l_returnflag"))
  }

  test("tpch_q6: every predicate reaches the scan, only needed columns read") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val qe = SparkEntry.queries("tpch_q6")(spark, sf).queryExecution
    val scan = qe.sparkPlan.collectFirst { case s: FileSourceScanExec => s }.get
    val pushed = scan.metadata("PushedFilters") // full string, not the
    // truncated plan rendering
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(s"($c,"), s"$c not pushed: $pushed")
    // pruning: the scan reads exactly the four referenced columns
    assert(scan.output.map(_.name).toSet ===
      Set("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"))
    // no join, no generate — a pure scan->filter->two-phase-agg chain
    val plan = qe.sparkPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Generate"), plan.take(1000))
    assert("HashAggregate".r.findAllIn(plan).length == 2, plan.take(1000))
  }

  test("p6 nanos time-range over an NTZ source pushes down as an NTZ range") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // events.parquet ships TIMESTAMP(MICROS) → TIMESTAMP_NTZ; the
    // Tables.events nanos conversion would hide the range from the
    // parquet translator, and NanosRangeRewrite must surface it again
    val qe = SparkEntry.queries("p6_time_range")(spark, sf).queryExecution
    val scan = qe.sparkPlan.collectFirst { case s: FileSourceScanExec => s }
    scan match {
      case Some(s) =>
        val pushed = s.metadata("PushedFilters")
        assert(pushed.contains("GreaterThanOrEqual(ts,") &&
          pushed.contains("LessThan(ts,"),
          s"ts range not pushed through the nanos conversion: $pushed")
      case None =>
        // source read as Long (legacy NANOS testdata) — plain pushdown,
        // nothing for the rule to do
        assert(qe.sparkPlan.toString.contains("PushedFilters"))
    }
    // equivalence: the rewrite must not change results vs the unrewritten
    // row-wise evaluation (micros precision: bounds are whole seconds)
    val expected = Tables.events(spark, sf)
      .filter(expr("ts DIV 1000000000") >= 1704070800L &&
              expr("ts DIV 1000000000") < 1704157200L)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .orderBy($"event_type").collect().toSeq
    val got = SparkEntry.queries("p6_time_range")(spark, sf).collect().toSeq
    assert(got === expected, "rewritten range disagrees with DIV filter")
  }

  test("p10: three chained filters fuse into a single scan's filter stack") {
    val qe = SparkEntry.queries("p10_filter_fusion")(spark, sf).queryExecution
    val scans = qe.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size === 1)
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("LessThan(l_quantity,10.0)"), pushed)
    assert(pushed.contains("GreaterThan(l_discount,0.03)"), pushed)
    assert(pushed.contains("EqualTo(l_returnflag,R)"), pushed)
  }

  test("j2 lookup join broadcasts the key set (big side never shuffles)") {
    val plan = SparkEntry.queries("j2_lookup_join")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("j9 profile join broadcasts the dimension table") {
    val plan = SparkEntry.queries("j9_profile_join")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("j3 honors the merge hint (sort-merge join, the range-scan analogue)") {
    val plan = SparkEntry.queries("j3_merge_join")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("tpch_q5 star join broadcasts all three dimension tables") {
    val plan = SparkEntry.queries("tpch_q5")(spark, sf)
      .queryExecution.sparkPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, plan:\n${plan.take(1500)}")
  }

  test("tpch_q4 plans the EXISTS as a semi join; q10/q18 top-k avoid global sorts") {
    val q4 = SparkEntry.queries("tpch_q4")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(q4.contains("LeftSemi"), s"q4 EXISTS not a semi join:\n${q4.take(1500)}")
    for (q <- Seq("tpch_q10", "tpch_q18")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$q limit should plan TakeOrdered, not a global sort:\n${plan.take(1500)}")
    }
  }

  test("w6 topk plans as TakeOrderedAndProject (no global sort)") {
    val plan = SparkEntry.queries("w6_topk")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("llm_vocab_topk plans TakeOrdered over partial aggs — no Expand, no global sort") {
    val qe = SparkEntry.queries("llm_vocab_topk")(spark, sf).queryExecution
    val plan = qe.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    // doc_freq counts already-distinct (doc_id, token) pairs — a
    // count(DISTINCT) formulation would plan an Expand here
    assert(!plan.contains("Expand"), plan.take(2000))
    assert("HashAggregate".r.findAllIn(plan).length >= 4, // 2 aggs × partial+final
      plan.take(2000))
  }

  test("llm_tfidf_topterms: df by rollup+join, one doc-partitioned window, broadcast N") {
    val qe = SparkEntry.queries("llm_tfidf_topterms")(spark, sf).queryExecution
    val plan = qe.sparkPlan.toString
    // doc frequency must come from the partial-agg'd rollup joined back,
    // never from a token-partitioned window (stop-word partitions would
    // buffer in one task at corpus scale)
    assert("Window \\[".r.findAllIn(plan).length == 1, plan.take(2000))
    assert(!plan.contains("Window [count"), plan.take(2000))
    // rk <= 3 pushes down as a map-side partial group-limit, so each
    // task ships at most 3 rows per doc into the window shuffle
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    // the scalar corpus count rides a broadcast, not a cartesian product
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("llm_tfidf_topterms tokenizes and shuffles the corpus ONCE (AQE stage reuse)") {
    // a PRIVATE staging dir: other suites .cache() the shared-path
    // documents table concurrently (cache lookup is by logical plan, so
    // a same-path scan would plan as InMemoryTableScan and break the
    // parquet-scan count below)
    val dir = RepoPaths.target("planspec_tfidf")
    Tables.documents(spark, sf)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = SparkEntry.queries("llm_tfidf_topterms")(spark, dir)
    df.collect() // reuse is decided at runtime, when AQE materializes stages
    val fin = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // 2 scans = the shared tf subtree + the corpus-count broadcast; a
    // third means the (doc_id, token) aggregation pipeline ran twice
    assert("Scan parquet".r.findAllIn(fin).length == 2, fin.take(3000))
  }

  test("f1 plans as pure aggregations over a flagged union — no joins") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val other = Seq((1L, 2L), (2L, 4L)).toDF("src", "dst")
    val counts = graft.graph.GraphOps.f1Counts(edges, other)
    val joins = counts.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.isEmpty, s"f1Counts should be join-free, found: $joins")
    // common src = 1,2 → m = {(1,2),(2,3)}, v = {(1,2),(2,4)}, tp = {(1,2)}
    val row = counts.first()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((2L, 2L, 1L)))
  }

  test("llm_dedup_embcos plans bucket-local joins, never a cartesian product") {
    val plan = SparkEntry.queries("llm_dedup_embcos")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("a2/w2/so1 scalar graph stats avoid collect_list adjacency arrays") {
    for (q <- Seq("a2_edge_hist", "w2_max_connected", "so1_union_combine")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("collect_list"), s"$q materializes adjacency arrays")
    }
  }

  test("so1 union+combine plans exactly one shuffle (its oracle's shape)") {
    val plan = SparkEntry.queries("so1_union_combine")(spark, sf)
      .queryExecution.executedPlan.toString
    // one Exchange for the (src,dst) combine + the final presentation sort
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"so1 shuffles $exchanges times:\n${plan.take(2000)}")
  }

  test("cutoff's anti-joins carry no forced broadcast hint (AQE decides)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val star = (1L to 6L).map(i => (99L, i))
    val chain = (200L to 212L by 2).map(i => (i, i + 1))
    val pairs = graft.graph.GraphOps.reverse((star ++ chain).toDF("src", "dst"))
    val (kept, _) = graft.graph.GraphOps.cutoff(pairs, 0.05)
    val hints = kept.queryExecution.optimizedPlan.collect { case j: Join => j.hint }
    assert(hints.nonEmpty)
    assert(hints.forall(h => h.leftHint.isEmpty && h.rightHint.isEmpty),
      s"forced join hints present: $hints")
  }

  test("dedup/similarity fan-out is conditional: wide inputs keep their partitioning") {
    val docs = Tables.documents(spark, sf)
      .repartition(8, $"doc_id") // already >= test parallelism (4)
    val plan = graft.llm.Dedup.docShingles(docs)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("RoundRobinPartitioning"),
      s"spread() round-robin-shuffled an already-wide input:\n${plan.take(1500)}")
    val emb = Tables.embeddings(spark, sf).repartition(8, $"vec_id")
    val planE = graft.llm.Similarity.lshCosinePairs(emb, 0.5, planes = 4, bands = 2)
      .queryExecution.optimizedPlan.toString
    assert(!planE.contains("RoundRobinPartitioning"),
      s"prepared() round-robin-shuffled an already-wide input:\n${planE.take(1500)}")
  }

  test("tpch_q8 broadcasts every dimension side of the six-table star") {
    val plan = SparkEntry.queries("tpch_q8")(spark, sf)
      .queryExecution.sparkPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 4,
      s"expected >=4 broadcast joins (part keys, asia custs, supp nation, "
        + s"plus nested dims), got $broadcasts:\n${plan.take(2000)}")
  }

  test("tpch_q15 computes the revenue CTE once (exchange reused by the max branch)") {
    val df = SparkEntry.queries("tpch_q15")(spark, sf)
    df.collect() // reuse is decided at runtime, when AQE materializes stages
    val fin = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(fin.contains("ReusedExchange"),
      s"revenue agg ran twice (no ReusedExchange):\n${fin.take(3000)}")
  }

  test("tpch_q21 scans lineitem ONCE: the EXISTS pair folds into chained aggs") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val qe = SparkEntry.queries("tpch_q21")(spark, sf).queryExecution
    val liScans = qe.sparkPlan.collect {
      case s: FileSourceScanExec
        if s.output.exists(_.name.startsWith("l_")) => s
    }
    assert(liScans.size === 1,
      s"q21 should fold both EXISTS into one lineitem pass, found "
        + s"${liScans.size} lineitem scans")
    // the two agg levels chain on the same o_orderkey hash partitioning:
    // exactly one shuffle carries lineitem-derived rows (the orders join
    // + both groupBys reuse it; the final broadcast join adds none)
    val plan = qe.sparkPlan.toString
    assert("HashAggregate".r.findAllIn(plan).length >= 4, plan.take(2000))
  }

  test("tpch_q22 plans the dormancy check as an anti join with the date pushed") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val qe = SparkEntry.queries("tpch_q22")(spark, sf).queryExecution
    val plan = qe.sparkPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    val ordScan = qe.sparkPlan.collect {
      case s: FileSourceScanExec
        if s.output.exists(_.name == "o_custkey") => s
    }.head
    assert(ordScan.metadata("PushedFilters").contains("GreaterThanOrEqual(o_orderdate,"),
      s"recent-order date filter not pushed: ${ordScan.metadata("PushedFilters")}")
  }

  test("an_sessions: lag window, session cumsum and session agg share ONE shuffle") {
    val plan = SparkEntry.queries("an_sessions")(spark, sf)
      .queryExecution.executedPlan.toString
    // one hash exchange by user_id serves both windows and the groupBy
    // (hash(user_id) satisfies the (user_id, session_idx) clustering);
    // the only other exchange is the presentation sort's range partition
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1,
      plan.take(2000))
  }

  test("llm_bm25_topk: df and corpus stats broadcast; top-k avoids a global sort") {
    val plan = SparkEntry.queries("llm_bm25_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // document frequency (per-term) and (N, avgdl) ride in as broadcasts
    assert("BroadcastExchange".r.findAllIn(plan).length >= 2, plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("g11_pagerank: the edge layout is cached once and read per iteration") {
    // the staged (pre-materialization) plan — the public pageRank
    // checkpoints the result and RELEASES the caches, so the iteration
    // shape is pinned here, before it collapses to a checkpoint scan
    val (staged, cleanup) = graft.graph.GraphOps
      .pageRankStaged(graft.graph.GraphQueries.pairs2(spark, sf), iters = 2)
    try {
      val plan = staged.queryExecution.executedPlan.toString
      // the final round's join + degree read the one cached edge layout
      // instead of replaying the scan+dedup+reverse lineage, and the
      // previous round arrives as a materialized checkpoint (rounds
      // materialize between iterations — the plan cannot double per
      // round, because each step references the rank vector twice)
      assert("InMemoryTableScan".r.findAllIn(plan).length >= 2, plan.take(2000))
      assert(plan.contains("ExistingRDD"), plan.take(2000))
    } finally cleanup()
    // and the full query still plans its top-k as TakeOrderedAndProject
    val qplan = SparkEntry.queries("g11_pagerank")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(qplan.contains("TakeOrderedAndProject"), qplan.take(2000))
  }

  test("llm_repetition is per-row: ZERO hash shuffles reach the plan") {
    val plan = SparkEntry.queries("llm_repetition")(spark, sf)
      .queryExecution.executedPlan.toString
    // shingle, distinct, ratio are array algebra inside the scan's
    // projection; the only exchange is the presentation sort's range
    // partitioning
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty, plan.take(2000))
  }

  test("funnel and retention stay window-free (user-keyed joins + aggs only)") {
    for (q <- Seq("an_funnel", "an_retention")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$q grew a window:\n${plan.take(1500)}")
      assert(!plan.contains("CartesianProduct"), plan.take(1500))
    }
  }

  test("no registered query plans an unpartitioned (single-task) window") {
    import org.apache.spark.sql.catalyst.plans.logical._
    // LIMIT-bounded means the limit DIRECTLY bounds the window's input:
    // walk only the unary row-preserving/reducing chain. (A collectFirst
    // over the whole subtree would exempt a window joined against the
    // full corpus just because a limit exists somewhere below.)
    @annotation.tailrec
    def limitBounded(p: LogicalPlan): Boolean = p match {
      case _: GlobalLimit => true
      case x: Project => limitBounded(x.child)
      case x: Sort => limitBounded(x.child)
      case x: Filter => limitBounded(x.child)
      case x: SubqueryAlias => limitBounded(x.child)
      case x: LocalLimit => limitBounded(x.child)
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, sf).queryExecution.optimizedPlan.collect {
          // a global window whose input is LIMIT-bounded (rank-after-
          // top-k: bm25/pagerank number <= 100 rows) is k rows in one
          // task BY DESIGN — only unbounded global windows are the
          // single-task scale hazard
          case w: Window if w.partitionSpec.isEmpty &&
            !limitBounded(w.child) => w
        }
        if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"global Window.orderBy without partitionBy in: $offenders")
  }

  test("an_unpivot: one scan feeds all four measures (no UNION-ALL re-scan)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val qe = SparkEntry.queries("an_unpivot")(spark, sf).queryExecution
    // sparkPlan, not executedPlan: AQE's adaptive wrapper hides
    // children from collect() before execution
    val scans = qe.sparkPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.length === 1, s"expected 1 lineitem scan, got ${scans.length}")
    // the long form comes from Expand (1 scan × 4 rows), not Union
    val plan = qe.sparkPlan.toString
    assert(plan.contains("Expand"), plan.take(1500))
    assert(!plan.contains("Union"), plan.take(1500))
  }

  test("an_quality_report: the whole constraint suite costs one table scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val qe = SparkEntry.queries("an_quality_report")(spark, sf).queryExecution
    val scans = qe.sparkPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.length === 1, s"expected 1 orders scan, got ${scans.length}")
  }

  test("s15: dynamic partition pruning reaches the partitioned fact scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = SparkEntry.queries("s15_partitioned_scan")(spark, sf)
    val qe = df.queryExecution
    // the fact scan must carry a runtime (subquery-driven) partition
    // filter — a static plan cannot know which statuses qualify
    val factScans = qe.sparkPlan.collect {
      case s: FileSourceScanExec
          if s.partitionFilters.exists(
            _.toString.toLowerCase.contains("dynamicpruning")) => s
    }
    assert(factScans.nonEmpty,
      "no scan carries a dynamicpruning partition filter:\n" +
        qe.sparkPlan.toString.take(3000))
    // and after execution the pruned scan reads FEWER partitions than
    // exist (3 statuses on disk, 2 qualify) — unwrap AQE wrappers to
    // reach the executed scan instance holding the runtime metrics
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec if s.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning")) => Seq(s)
    }.flatten
    val executedScan = scans(qe.executedPlan)
    assert(executedScan.nonEmpty, qe.executedPlan.toString.take(3000))
    val read = executedScan.head.metrics.get("numPartitions")
      .map(_.value).getOrElse(-1L)
    assert(read === 2, s"expected 2 partitions read, got $read")
  }

  test("j15: runtime bloom filter prunes the fact before the SMJ shuffle") {
    import graft.operators.Joins
    Joins.withBloomThreshold(spark) {
      val df = Joins.bloomJoin(spark, sf)
      df.collect()
      val fin = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // the fact scan carries might_contain(bloom, xxhash64(l_partkey))
      // — rows are dropped at the scan, before the merge-join shuffle
      assert(fin.contains("might_contain"), fin.take(3000))
      assert(fin.contains("SortMergeJoin"), fin.take(3000))
    }
  }

  test("an_seq_match: one user shuffle; patterns ride a broadcast, not a shuffle") {
    val plan = SparkEntry.queries("an_seq_match")(spark, sf)
      .queryExecution.executedPlan.toString
    // one hash exchange for the per-user sequence agg; the pattern
    // rollup reuses it via partial aggs (3-row final agg); the only
    // join is the broadcast nested loop against the pattern table
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2,
      plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("persisted ANN indexes: probe joins plan against the index's " +
    "storage bucketing — zero shuffle in the index-scan subtree even " +
    "with broadcast disabled") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    import graft.llm.{AnnStore, Dedup, Similarity}

    def deep[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
      val kids: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      (if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil) ++
        kids.flatMap(deep(_)(pf))
    }
    def pin(df: org.apache.spark.sql.DataFrame, pathFrag: String): Unit = {
      df.collect() // finalize the adaptive plan
      val plan = df.queryExecution.executedPlan
      def hasIndexScan(p: SparkPlan): Boolean = deep(p) {
        case s: FileSourceScanExec if s.relation.location.rootPaths
          .exists(_.toString.contains(pathFrag)) => s
      }.nonEmpty
      // the LOWEST join with the index on exactly one side (minimal
      // subtree — higher joins contain it transitively)
      val joins = deep(plan) {
        case j: SortMergeJoinExec if j.children.count(hasIndexScan) == 1 => j: SparkPlan
        case j: ShuffledHashJoinExec if j.children.count(hasIndexScan) == 1 => j: SparkPlan
        case j: BroadcastHashJoinExec if j.children.count(hasIndexScan) == 1 => j: SparkPlan
      }
      assert(joins.nonEmpty, s"no join over $pathFrag:\n" +
        plan.toString.take(3000))
      val lowest = joins.minBy(j => deep(j) { case p => p }.size)
      val indexSide = lowest.children.find(hasIndexScan).get
      val scans = deep(indexSide) {
        case s: FileSourceScanExec if s.relation.location.rootPaths
          .exists(_.toString.contains(pathFrag)) => s
      }
      assert(scans.exists(_.bucketedScan),
        "index scan is not a bucketed scan:\n" + indexSide.toString.take(2000))
      val shuffles = deep(indexSide) { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty,
        s"index side shuffles (${shuffles.size}):\n" +
          indexSide.toString.take(3000))
    }

    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // IVF: the full registered query (probe join + top-k window)
      pin(SparkEntry.queries("llm_ann_ivf_incr")(spark, sf),
        "graft_ann/graft_ivf_index")
      // minhash: the candidate join fragment (the registered query
      // caches it inside an InMemoryRelation, which hides the join
      // from the outer plan — pin the fragment that IS the claim)
      val docs = Tables.documents(spark, sf)
      val corpus = docs.filter($"doc_id" % 5 =!= 0)
      val idx = AnnStore.minHashBandIndex(spark, sf, corpus)
      val bIdx = Dedup.minHashBandIndex(docs.filter($"doc_id" % 5 === 0))
      pin(idx.select($"doc_id".as("da"), $"b", $"bucket")
          .join(bIdx.select($"doc_id".as("db"), $"b", $"bucket"),
            Seq("b", "bucket")),
        "graft_ann/graft_mh_band_index")
      // g16 standing state: the incremental BSP's dominance join plans
      // against probState's vertex-bucketed storage layout — the state
      // (corpus) side never shuffles for an ingest; only the batch side
      // pays an Exchange. HashPartitioning(vertex) satisfies the
      // (vertex, peer) join's ClusteredDistribution (subset credit).
      import graft.graph.GraphQueries
      val st = GraphQueries.probState(spark, sf)
      val cand = GraphQueries.feedB(spark, sf)
        .select($"src".as("vertex"), $"dst".as("peer"), $"pb")
      // same scoped conf the operator itself runs under: anchoring
      // co-partitioning on the vertex-only bucket layout for a
      // (vertex, peer) join needs subset anchoring allowed
      val coPart = spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition")
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      try pin(cand.as("c").join(st.as("s"),
          $"c.vertex" === $"s.vertex" && $"c.peer" === $"s.peer", "left"),
        "graft_stage/probstate")
      finally spark.conf.set(
        "spark.sql.requireAllClusterKeysForCoPartition", coPart)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }
}
