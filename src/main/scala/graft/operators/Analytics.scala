package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Headline analytical queries (TPC-H-flavored) plus grouping-set /
  * windowed-frame capabilities the reference lacks entirely
  * (SURVEY.md §2.4/2.5 notes) but our engine exposes natively — part of
  * the "complete engine" surface and the benchmark's realistic load.
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  import org.apache.spark.sql.Column

  /** Split-accumulator exact product sums (the an_corr_matrix
    * discipline): Σxy where the SUM overflows a bigint but each
    * per-row product is long-bounded (non-negative operands ≤ ~1e7
    * cents ⇒ xy < 2^47 at ANY scale factor). The product multiplies
    * in LONG and the sum is carried as three 20-bit limb sums — plain
    * long aggregation, codegen'd and vectorized, no per-row Decimal
    * work; a limb sum grows ≤ N·2^20, overflow-free past 10^12 rows
    * per group. [[limbRecombined]] reassembles the exact decimal(38)
    * total on the (few) group rows. LimbSumSpec proves bit-equality
    * with a direct decimal product sum on adversarial max-bound and
    * randomized data.
    *
    * HARD PRECONDITION — non-negative operands, product < 2^60: a
    * negative product would shiftright arithmetically into garbage
    * limbs, and bits ≥ 60 are silently masked off. Callers with signed
    * or wider columns must rescale first. The docstring alone can't
    * stop a future caller, so under `spark.graft.debug.validate=true`
    * every row is range-checked and violation RAISES instead of
    * summing garbage (LimbSumSpec pins it); the flag-off hot path is
    * untouched (pure long multiply-shift-mask). */
  private[graft] def limbProductSums(pairs: Seq[(String, String)])
      : Seq[Column] = {
    val validate = org.apache.spark.sql.SparkSession.active.conf
      .getOption("spark.graft.debug.validate").contains("true")
    def prod(x: String, y: String): Column = {
      val p = col(x) * col(y)
      if (!validate) p
      else when(col(x) < 0 || col(y) < 0 || p >= lit(1152921504606846976L),
        raise_error(concat(lit(s"limbProductSums precondition broken on " +
          s"($x, $y): operands must be non-negative with product < 2^60" +
          s"; got x="), col(x), lit(" y="), col(y))))
        .otherwise(p)
    }
    for { (x, y) <- pairs; limb <- 0 to 2 }
      yield sum(shiftright(prod(x, y), limb * 20)
        .bitwiseAND(lit(1048575L))).as(s"s_${x}_${y}_l$limb")
  }

  /** Exact decimal(38) Σxy from the three limb sums of
    * [[limbProductSums]]; aliased `s_<x>_<y>`. */
  private[graft] def limbRecombined(x: String, y: String): Column = {
    def limb(i: Int) = col(s"s_${x}_${y}_l$i").cast("decimal(38,0)")
    (limb(2) * lit(1099511627776L) + limb(1) * lit(1048576L) + limb(0))
      .as(s"s_${x}_$y")
  }

  /** Derived partsupp: the testdata ships no partsupp table, so the
    * five TPC-H queries that need one (q2/q9/q11/q16/q20) run over the
    * DISTINCT (part, supplier) pairs observed in lineitem, with
    * supplycost/availqty derived from an engine-portable md5 hash —
    * both engines (Spark here, DuckDB in the oracle CTE below) compute
    * bit-identical values, so the queries stay hash-checkable. At scale
    * this is one distinct-aggregation over the fact's two key columns;
    * real deployments would read the actual table — which is exactly
    * what this does after the first call: the derived table
    * MATERIALIZES once per dataset (ps_partkey-clustered parquet, the
    * pairs2 discipline) and the five queries read it like the real
    * partsupp they model.
    */
  private def partsupp(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // BUCKETED by ps_partkey — the key q2/q9/q16/q20 join on — via the
    // Staging facade, so the five consumers plan against the storage
    // partitioning and the derived table never re-shuffles per query;
    // tag fingerprints the source lineitem files (staleness discipline)
    val slug = graft.Staging.slug(d)
    graft.Staging.ensureBucketed(s, s"graft_partsupp_$slug",
      graft.RepoPaths.target(s"graft_tpch/partsupp_$slug"), buckets = 32,
      clusterCols = Seq("ps_partkey"),
      sortCols = Seq("ps_partkey", "ps_suppkey"),
      tag = s"partsupp v2 $d fp=${
        graft.Staging.fingerprint(s"$d/lineitem.parquet")}")(
      Tables.lineitem(s, d).select($"l_partkey", $"l_suppkey").distinct()
        .select($"l_partkey".as("ps_partkey"), $"l_suppkey".as("ps_suppkey"),
          (conv(substring(md5(concat($"l_partkey".cast("string"), lit("_"),
            $"l_suppkey".cast("string"))), 1, 6), 16, 10).cast("long")
            % 100000L / lit(100.0)).as("ps_supplycost"),
          (conv(substring(md5(concat($"l_suppkey".cast("string"), lit("#"),
            $"l_partkey".cast("string"))), 1, 6), 16, 10).cast("long")
            % 9999L + 1L).as("ps_availqty")))
  }

  /** The same derivation as a DuckDB CTE, prepended to the oracles. */
  private val PS_SQL: String =
    """ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         (('0x' || substr(md5(l_partkey || '_' || l_suppkey), 1, 6))
      |           ::BIGINT % 100000) / 100.0 AS ps_supplycost,
      |         (('0x' || substr(md5(l_suppkey || '#' || l_partkey), 1, 6))
      |           ::BIGINT % 9999) + 1 AS ps_availqty
      |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))"""
      .stripMargin

  val queries: Map[String, Q] = Map(
    // TPC-H Q1-flavored pricing summary: one scan, one hash agg.
    "tpch_q1" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 4).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
            .as("sum_disc_price"),
          round(avg($"l_quantity"), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // TPC-H Q3-flavored: two joins narrowing to a top-10 revenue list —
    // the small dimension side broadcasts, revenue agg is map-side
    // partial, top-k is TakeOrdered.
    "tpch_q3" -> ((s, d) => {
      import s.implicits._
      val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey")
      val ord = Tables.orders(s, d)
        .filter($"o_orderdate" < lit("1995-03-15").cast("timestamp"))
      Tables.lineitem(s, d)
        .filter($"l_shipdate" > lit("1995-03-15").cast("timestamp"))
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey".asc)
        .limit(10)
    }),

    // TPC-H Q5-flavored: star join across 5 tables, dims broadcast.
    "tpch_q5" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.supplier(s, d)),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "ASIA")
        .groupBy($"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"))
        .orderBy($"revenue".desc, $"n_name".asc)
    }),

    // TPC-H Q6-flavored forecasting revenue change: the pure-pushdown
    // plan — every predicate reaches the parquet scan as a PushedFilter
    // (row groups outside the shipdate/discount/quantity ranges never
    // decode), then a map-side partial agg folds to one row; the only
    // "shuffle" is the single-row final agg.
    "tpch_q6" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp")
          && $"l_shipdate" < lit("1997-01-01").cast("timestamp")
          && $"l_discount".between(0.04, 0.07) && $"l_quantity" < 24)
        .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"))
    }),

    // TPC-H Q12-flavored shipping-priority audit: the big-big join —
    // lineitem and orders both exceed any broadcast threshold, so this
    // exercises the shuffle-join path (AQE picks SMJ or shuffled-hash);
    // the conditional counts fold map-side into a 2-row result.
    "tpch_q12" -> ((s, d) => {
      import s.implicits._
      val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp")
          && $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_linestatus")
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy($"l_linestatus")
    }),

    // TPC-H Q4-flavored order-priority check: the EXISTS decorrelates
    // to a LEFT SEMI join — orders stream past a shuffled semi probe,
    // no lineitem columns survive the join, and the date window is
    // pushed to both scans. (Adapted: no l_commitdate/l_receiptdate in
    // this schema, so "late" = shipped >60 days after the order date.)
    "tpch_q4" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp")
          && $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      val late = Tables.lineitem(s, d)
        .join(o, $"l_orderkey" === $"o_orderkey")
        .filter(datediff($"l_shipdate", $"o_orderdate") > 60)
        .select($"l_orderkey")
      o.join(late, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    }),

    // TPC-H Q10-flavored returned-item report: three-table join with
    // the two dimension sides broadcast, revenue agg per customer,
    // then TakeOrderedAndProject for the top 20 — a global sort never
    // materializes.
    "tpch_q10" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_returnflag" === "R")
        .join(Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp")
            && $"o_orderdate" < lit("1996-07-01").cast("timestamp")),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey".asc)
        .limit(20)
    }),

    // TPC-H Q13-flavored customer distribution: LEFT OUTER join so
    // zero-order customers survive, then a two-level aggregation
    // (orders per customer → customers per order-count).
    "tpch_q13" -> ((s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    }),

    // TPC-H Q14-flavored promo revenue share: fact-dim join (part
    // broadcast), conditional aggregation folding to one row.
    "tpch_q14" -> ((s, d) => {
      import s.implicits._
      val rev = $"l_extendedprice" * (lit(1.0) - $"l_discount")
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-03-01").cast("timestamp")
          && $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
        .agg(round(lit(100.0) *
          sum(when($"p_type".startsWith("PROMO"), rev).otherwise(0.0)) /
          sum(rev), 4).as("promo_revenue"))
    }),

    // TPC-H Q18-flavored large-volume customers: the HAVING subquery
    // becomes an aggregated semi side joined back to the fact — the
    // qty-per-order agg runs once, and only qualifying orders reach the
    // customer join (both remaining sides AQE-sized).
    "tpch_q18" -> ((s, d) => {
      import s.implicits._
      val big = Tables.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(round(sum($"l_quantity"), 2).as("total_qty"))
        .filter($"total_qty" > 140)
      big.join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .select($"c_custkey", $"c_name", $"o_orderkey", $"o_totalprice",
          $"total_qty")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(100)
    }),

    // TPC-H Q19-flavored disjunctive revenue: OR-of-conjuncts over the
    // fact-dim join — the whole disjunction is scan-translatable, so
    // row groups matching neither branch never decode; part broadcasts.
    "tpch_q19" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
        .filter(($"p_brand" === "Brand#1" && $"l_quantity".between(1, 15))
          || ($"p_brand" === "Brand#3" && $"l_quantity".between(20, 35)))
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"))
    }),

    // TPC-H Q7-flavored bilateral shipping volume: nation joins BOTH
    // sides of the fact (supplier's and customer's), so the same
    // broadcast dim enters twice under different aliases and the
    // nation-pair filter prunes the cross of the two.
    "tpch_q7" -> ((s, d) => {
      import s.implicits._
      val n1 = Tables.nation(s, d)
        .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(n1), $"s_nationkey" === $"s_nk")
        .join(broadcast(n2), $"c_nationkey" === $"c_nk")
        .filter(($"supp_nation" === "NATION_20" && $"cust_nation" === "NATION_11")
          || ($"supp_nation" === "NATION_18" && $"cust_nation" === "NATION_19"))
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast("long").as("l_year"))
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    }),

    // TPC-H Q8-flavored national market share: the widest star in the
    // suite — fact joins six dims (part filter first, so the fact
    // shrinks before the wide joins), nation enters twice (customer's
    // and supplier's side), and the share is a conditional-sum ratio
    // per order year. All dims broadcast; the only shuffle is the
    // 2-row year agg.
    "tpch_q8" -> ((s, d) => {
      import s.implicits._
      val promoParts = Tables.part(s, d).filter($"p_type" === "PROMO")
        .select($"p_partkey")
      val asiaCust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "ASIA")
        .select($"c_custkey")
      val suppNation = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))),
          $"s_nationkey" === $"sn_key")
        .select($"s_suppkey", $"supp_nation")
      val vol = $"l_extendedprice" * (lit(1.0) - $"l_discount")
      Tables.lineitem(s, d)
        .join(broadcast(promoParts), $"l_partkey" === $"p_partkey")
        .join(Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp")
            && $"o_orderdate" < lit("1998-01-01").cast("timestamp")),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(asiaCust), $"o_custkey" === $"c_custkey")
        .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
        .groupBy(year($"o_orderdate").cast("long").as("o_year"))
        .agg(round(
          sum(when($"supp_nation" === "NATION_12", vol).otherwise(0.0)) /
            sum(vol), 6).as("mkt_share"))
        .orderBy($"o_year")
    }),

    // TPC-H Q15-flavored top supplier: the revenue CTE aggregates once
    // and is reused for both the max (a 1-row broadcast) and the
    // equality probe — no recomputation, no correlated subquery. The
    // explicit isnotnull(l_suppkey) matters: the supplier join infers
    // it on the probe branch only, and a one-filter difference below
    // the shuffle defeats ReuseExchange — with it stated on both
    // branches the scan+partial-agg subtree is computed ONCE.
    "tpch_q15" -> ((s, d) => {
      import s.implicits._
      val revenue = Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp")
          && $"l_shipdate" < lit("1996-04-01").cast("timestamp")
          && $"l_suppkey".isNotNull)
        .groupBy($"l_suppkey")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("total_revenue"))
      val top = revenue.agg(max($"total_revenue").as("max_rev"))
      revenue
        .join(broadcast(top), $"total_revenue" === $"max_rev")
        .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name", $"total_revenue")
        .orderBy($"s_suppkey")
    }),

    // TPC-H Q17-flavored small-quantity-order revenue: the correlated
    // scalar subquery (0.2 × avg qty per part) decorrelates to a
    // per-part aggregate joined back to the fact. Only lineitems of the
    // ~1/150 filtered parts reach the threshold join (semi-pruned by
    // the broadcast), so the avg is computed over a shrunken fact, not
    // the full table. (Adapted: p_size < 10 stands in for the missing
    // p_container.)
    "tpch_q17" -> ((s, d) => {
      import s.implicits._
      val parts = Tables.part(s, d)
        .filter($"p_brand" === "Brand#3" && $"p_size" < 10)
        .select($"p_partkey")
      val li = Tables.lineitem(s, d)
        .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      val avgQty = li.groupBy($"p_partkey".as("a_partkey"))
        .agg((lit(0.2) * avg($"l_quantity")).as("qty_limit"))
      li.join(broadcast(avgQty), $"l_partkey" === $"a_partkey")
        .filter($"l_quantity" < $"qty_limit")
        .agg(round(sum($"l_extendedprice") / 7.0, 2).as("avg_yearly"))
    }),

    // TPC-H Q21-flavored waiting-supplier audit: both EXISTS and NOT
    // EXISTS collapse into ONE per-(order, supplier) aggregation — a
    // supplier qualifies on an order iff the order has >1 supplier and
    // exactly one late one (itself). The late-row count (TPC-H counts
    // join ROWS, not orders) rides through both agg levels as a carried
    // sum, so lineitem is scanned ONCE and the two aggs chain on the
    // same o_orderkey shuffle — no join-back, no second scan. (Adapted:
    // "late" = shipped >60 days after the order date, standing in for
    // the missing l_receiptdate/l_commitdate.)
    "tpch_q21" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .withColumn("late",
          datediff($"l_shipdate", $"o_orderdate") > 60)
        .select($"l_orderkey", $"l_suppkey", $"late")
      val perSupp = li.groupBy($"l_orderkey", $"l_suppkey")
        .agg(max($"late").as("supp_late"),
          sum(when($"late", 1L).otherwise(0L)).as("late_rows"))
      val lone = perSupp.groupBy($"l_orderkey")
        .agg(count(lit(1)).as("nsupp"),
          sum(when($"supp_late", 1L).otherwise(0L)).as("nlate"),
          max(when($"supp_late", $"l_suppkey")).as("late_supp"),
          max(when($"supp_late", $"late_rows")).as("late_rows"))
        .filter($"nsupp" > 1 && $"nlate" === 1)
      lone.groupBy($"late_supp")
        .agg(sum($"late_rows").as("numwait"))
        .join(broadcast(Tables.supplier(s, d)), $"late_supp" === $"s_suppkey")
        .select($"s_name", $"numwait")
        .orderBy($"numwait".desc, $"s_name".asc)
        .limit(20)
    }),

    // TPC-H Q22-flavored dormant-customer opportunity: the scalar
    // subquery (avg positive balance) broadcasts as a 1-row cross
    // join; the NOT EXISTS is a LEFT ANTI join against only the
    // recent-order keys (date filter pushed to the orders scan, so the
    // anti side is a fraction of the table). (Adapted: "dormant" = no
    // orders since 2000, and c_nationkey stands in for the missing
    // phone country code.)
    "tpch_q22" -> ((s, d) => {
      import s.implicits._
      val cust = Tables.customer(s, d)
      val avgBal = cust.filter($"c_acctbal" > 0.0)
        .agg(avg($"c_acctbal").as("avg_bal"))
      val active = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
        .select($"o_custkey")
      cust.join(broadcast(avgBal))
        .filter($"c_acctbal" > $"avg_bal")
        .join(active, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_nationkey".as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          round(sum($"c_acctbal"), 2).as("totacctbal"))
        .orderBy($"cntrycode")
    }),

    // TPC-H Q2-flavored minimum-cost supplier: the correlated min
    // subquery decorrelates to a per-part min over the region-filtered
    // partsupp, equality-joined back — the min agg and the probe share
    // one subtree. Ties on the min keep every tying supplier, exactly
    // like the correlated form.
    "tpch_q2" -> ((s, d) => {
      import s.implicits._
      val asiaSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "ASIA")
        .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
      val ps = partsupp(s, d)
        .join(broadcast(asiaSupp), $"ps_suppkey" === $"s_suppkey")
      val minCost = ps.groupBy($"ps_partkey".as("m_partkey"))
        .agg(min($"ps_supplycost").as("min_cost"))
      ps.join(broadcast(Tables.part(s, d)
          .filter($"p_type" === "LARGE" && $"p_size".between(10, 20))
          .select($"p_partkey")), $"ps_partkey" === $"p_partkey")
        .join(minCost,
          $"ps_partkey" === $"m_partkey" && $"ps_supplycost" === $"min_cost")
        .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey",
          $"ps_supplycost")
        .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
        .limit(100)
    }),

    // TPC-H Q9-flavored product-type profit: the deepest join tree in
    // the suite — the fact narrows on the broadcast part filter FIRST,
    // then the big-big joins (partsupp on the composite key, orders on
    // orderkey) run over the shrunken fact; supplier/nation broadcast.
    "tpch_q9" -> ((s, d) => {
      import s.implicits._
      val gearParts = Tables.part(s, d).filter($"p_name".contains("gear"))
        .select($"p_partkey")
      Tables.lineitem(s, d)
        .join(broadcast(gearParts), $"l_partkey" === $"p_partkey")
        .join(partsupp(s, d),
          $"l_partkey" === $"ps_partkey" && $"l_suppkey" === $"ps_suppkey")
        .join(Tables.orders(s, d).select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.supplier(s, d)
          .select($"s_suppkey", $"s_nationkey")), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name".as("nation"),
          year($"o_orderdate").cast("long").as("o_year"))
        // exact integer-cents arithmetic: revenue minus supply cost
        // accumulates as a long, so the sum is order-independent and
        // bit-identical across engines (a double sum of +/- terms
        // rounds differently at the 2-dp boundary)
        .agg(round(sum(
          round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
            .cast("long")
            - round($"ps_supplycost" * $"l_quantity" * 100).cast("long"))
          / 100.0, 2).as("sum_profit"))
        .orderBy($"nation", $"o_year".desc)
    }),

    // TPC-H Q11-flavored important stock: per-part inventory value vs
    // a scalar threshold over the SAME aggregate — the grouped relation
    // feeds both the 1-row avg broadcast and the filter probe (adapted:
    // threshold = 2× the average part value, which is scale-free where
    // the spec's 0.0001/SF fraction is not).
    "tpch_q11" -> ((s, d) => {
      import s.implicits._
      val asiaKeys = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "ASIA")
        .select($"s_suppkey")
      val g = partsupp(s, d)
        .join(broadcast(asiaKeys), $"ps_suppkey" === $"s_suppkey")
        .groupBy($"ps_partkey")
        .agg(sum($"ps_supplycost" * $"ps_availqty").as("val"))
      val thr = g.agg((lit(2.0) * avg($"val")).as("thr"))
      g.join(broadcast(thr))
        .filter($"val" > $"thr")
        .select($"ps_partkey", round($"val", 2).as("value"))
        .orderBy($"value".desc, $"ps_partkey")
        .limit(50)
    }),

    // TPC-H Q16-flavored supplier diversity: NOT IN becomes a LEFT
    // ANTI join against the (tiny) excluded-supplier set, then a
    // count(DISTINCT) per part attribute triple — the one deliberate
    // Expand plan in the suite, over already part-pruned rows.
    "tpch_q16" -> ((s, d) => {
      import s.implicits._
      val negSupp = Tables.supplier(s, d).filter($"s_acctbal" < 0)
        .select($"s_suppkey")
      val parts = Tables.part(s, d)
        .filter($"p_brand" =!= "Brand#5" && $"p_type" =!= "PROMO"
          && $"p_size".isin(1, 4, 9, 14, 19, 24, 29, 34))
        .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
      partsupp(s, d)
        .join(negSupp, $"ps_suppkey" === $"s_suppkey", "left_anti")
        .join(broadcast(parts), $"ps_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"ps_suppkey").cast("long").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
        .limit(50)
    }),

    // TPC-H Q20-flavored excess-inventory suppliers: the correlated
    // half-of-shipped-quantity subquery decorrelates to a grouped agg
    // on the SAME composite key partsupp joins on — one shuffle serves
    // both; the absent-shipment case (NULL comparison in the spec's
    // correlated form) is reproduced by the inner join. Region
    // membership semi-joins last over the small supplier dim.
    "tpch_q20" -> ((s, d) => {
      import s.implicits._
      val smallParts = Tables.part(s, d)
        .filter($"p_name".startsWith("small")).select($"p_partkey")
      val shipped = Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp")
          && $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
        .groupBy($"l_partkey", $"l_suppkey")
        .agg((lit(0.5) * sum($"l_quantity")).as("half_qty"))
      val eligible = partsupp(s, d)
        .join(broadcast(smallParts), $"ps_partkey" === $"p_partkey")
        .join(shipped,
          $"ps_partkey" === $"l_partkey" && $"ps_suppkey" === $"l_suppkey")
        .filter($"ps_availqty" > $"half_qty")
        .select($"ps_suppkey").distinct()
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "ASIA")
        .join(eligible, $"s_suppkey" === $"ps_suppkey", "left_semi")
        .select($"s_name", $"s_acctbal")
        .orderBy($"s_name")
    }),

    // ROLLUP (absent in the reference; native here).
    "an_rollup" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"o_orderstatus".asc_nulls_first,
          $"o_orderpriority".asc_nulls_first)
    }),

    // GROUPING SETS — the general form rollup/cube desugar to: an
    // explicit, non-contiguous set of aggregation levels in ONE pass
    // (Expand + single shuffle), with per-column GROUPING() flags
    // disambiguating real NULLs from subtotal rows. The flag columns
    // (not grouping_id bit order, which differs across engines) make
    // the oracle engine-portable.
    "an_grouping_sets" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d).createOrReplaceTempView("an_gs_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
          |       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
          |            AS BIGINT) AS cents
          |FROM an_gs_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          |                        (l_linestatus), ())
          |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
          |         l_linestatus NULLS FIRST""".stripMargin)
    }),

    // CUBE.
    "an_cube" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // Frame-based running window (absent in the reference).
    "an_running_sum" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .filter($"o_custkey" < 100)
        .select($"o_custkey", $"o_orderkey",
          round(sum($"o_totalprice").over(w), 2).as("running_total"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // lag/lead/first_value offset windows (absent in the reference) —
    // per-customer order history navigation; partitioned windows only,
    // so no single-task sort at any scale.
    "an_lag_lead" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
      Tables.orders(s, d)
        .filter($"o_custkey" < 50)
        .select($"o_custkey", $"o_orderkey",
          coalesce(lag($"o_orderkey", 1).over(w), lit(-1L)).cast("long")
            .as("prev_order"),
          coalesce(lead($"o_orderkey", 1).over(w), lit(-1L)).cast("long")
            .as("next_order"),
          first($"o_orderkey").over(w).cast("long").as("first_order"),
          round($"o_totalprice" - lag($"o_totalprice", 1).over(w), 2)
            .as("delta_price"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Batch sessionization: gap-based sessions over the event stream
    // (the batch twin of st3_sessionize — same 30-minute gap rule,
    // expressed as lag + cumulative-sum instead of state). Scale
    // shape: ONE shuffle by user_id serves the lag window, the
    // session-id running sum AND the per-session aggregate (hash
    // partitioning on user_id satisfies the (user_id, session_idx)
    // grouping — no second Exchange); window state per task is one
    // user's events. ts is epoch-nanos.
    "an_sessions" -> ((s, d) => {
      import s.implicits._
      val gapNs = 30L * 60 * 1000000000L
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .filter($"user_id" < 200)
        .withColumn("new_sess",
          when($"ts" - lag($"ts", 1).over(w) > gapNs, 1L)
            .otherwise(when(lag($"ts", 1).over(w).isNull, 1L)
              .otherwise(0L)))
        .withColumn("session_idx", sum($"new_sess")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_idx")
        .agg(count(lit(1)).as("n_events"),
          min($"ts").as("min_ts"), max($"ts").as("max_ts"))
        // integer DIV, not `/`: epoch-nanos exceed double's 2^53 exact
        // range, so a double division here would round the seconds
        .select($"user_id", $"session_idx", $"n_events",
          expr("min_ts DIV 1000000000").as("start_s"),
          expr("max_ts DIV 1000000000").as("end_s"),
          expr("(max_ts - min_ts) DIV 1000000000").as("duration_s"))
        .orderBy($"user_id", $"session_idx")
    }),

    // Z-score anomaly detection per event type (the monitoring /
    // data-quality staple). Variance comes from EXPLICIT power sums
    // (n, Σx, Σx²) so any engine reproduces the identical doubles —
    // Welford/streaming variance differs across engines (production
    // would use per-partition Welford + merge; the power-sum form is
    // fine while sd is far from the cancellation regime, as here).
    // Scale shape: one partial-agg'd stats pass (5 groups — broadcast
    // back), one per-row z pass, one partial-agg'd rollup; no windows.
    "an_zscore" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_type", $"value")
      val stats = ev.groupBy($"event_type").agg(
          count(lit(1)).as("n"),
          sum($"value").as("s1"),
          sum($"value" * $"value").as("s2"))
        .withColumn("mean", $"s1" / $"n")
        // a single-observation group has no sample sd (divisor n-1):
        // emit null explicitly — DuckDB raises on sqrt(negative)/÷0
        // rather than returning null, so both engines must take the
        // guarded branch for n=1 to stay hash-identical
        .withColumn("sd",
          when($"n" > 1,
            sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1))))
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", round(($"value" - $"mean") / $"sd", 6))
        .groupBy($"event_type", $"n", $"mean", $"sd")
        .agg(
          count(when(abs($"z") > 3, 1)).as("n_outliers"),
          round(min($"z"), 6).as("min_z"),
          round(max($"z"), 6).as("max_z"))
        .select($"event_type", $"n", round($"mean", 6).as("mean"),
          round($"sd", 6).as("sd"), $"n_outliers", $"min_z", $"max_z")
        .orderBy($"event_type")
    }),

    // Cohort retention: users grouped by first-active week, tracked
    // over the next 3 weeks (the growth-analytics staple). Scale
    // shape: activity collapses to distinct (user, week) FIRST — the
    // event stream reduces before anything joins; the cohort vector is
    // user-sized; retention is integer per-mille (n*1000 DIV cohort),
    // so no float crosses an engine boundary. All keys are user_id or
    // (cohort, offset) — partial-agg'd shuffles, no windows.
    "an_retention" -> ((s, d) => {
      import s.implicits._
      val act = Tables.events(s, d)
        .select($"user_id",
          expr("(ts DIV 1000000000) DIV 604800").as("week"))
        .distinct()
      val cohorts = act.groupBy($"user_id").agg(min($"week").as("cohort_week"))
      val sizes = cohorts.groupBy($"cohort_week")
        .agg(count(lit(1)).as("n_cohort"))
      act.join(cohorts, "user_id")
        .withColumn("week_offset", $"week" - $"cohort_week")
        .filter($"week_offset" >= 0 && $"week_offset" <= 3)
        .groupBy($"cohort_week", $"week_offset")
        .agg(count(lit(1)).as("n_active"))
        .join(sizes, "cohort_week")
        .select($"cohort_week", $"week_offset", $"n_active",
          expr("n_active * 1000 DIV n_cohort").as("retention_pm"))
        .orderBy($"cohort_week", $"week_offset")
    }),

    // Ordered event funnel: view → click-after-view → purchase-after-
    // click, counted per stage (the event-analytics staple). Scale
    // shape: each stage is a user-keyed partial-agg'd min + ONE
    // user-keyed equi-join against the previous stage's (user, ts)
    // vector — stage vectors are user-sized, never event-sized, all
    // three joins cluster on the same key so AQE reuses the
    // partitioning, and nothing is ordered until the 3-row output.
    "an_funnel" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      def firstAfter(evType: String, prev: DataFrame, tcol: String,
                     out: String): DataFrame =
        ev.filter($"event_type" === evType)
          .join(prev, "user_id")
          .filter($"ts" > col(tcol))
          .groupBy($"user_id").agg(min($"ts").as(out))
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t1"))
      val c = firstAfter("click", v, "t1", "t2")
      val p = firstAfter("purchase", c, "t2", "t3")
      def stage(idx: Long, name: String, df: DataFrame): DataFrame =
        df.agg(lit(idx).as("stage_idx"), lit(name).as("stage"),
          count(lit(1)).as("n_users"))
      stage(1L, "view", v)
        .unionAll(stage(2L, "click_after_view", c))
        .unionAll(stage(3L, "purchase_after_click", p))
        .orderBy($"stage_idx")
    }),

    // PIVOT: orders long→wide on status (native relational pivot).
    "an_pivot" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderpriority")
        .pivot($"o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select($"o_orderpriority", $"F", $"O", $"P")
        .orderBy($"o_orderpriority")
    }),

    // Exact percentiles / median (continuous interpolation).
    "an_percentiles" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(round(median($"l_extendedprice"), 4).as("p50"),
          round(percentile($"l_extendedprice", lit(0.9)), 4).as("p90"))
        .orderBy($"l_returnflag")
    }),

    // ntile bucketing — scalable two-pass form. A bare
    // `ntile(k).over(Window.orderBy(...))` plans a SINGLE task holding
    // the whole table (worse than a full shuffle at 100 TB). Instead:
    // (1) bin rows by value range (constant bin count, monotone with
    // the sort order); (2) rank inside each bin with a PARTITIONED
    // window; (3) add per-bin offsets (bin histogram = constant-size
    // driver aggregate, like cutoff's threshold); (4) exact ntile
    // bucket from the global rank in integer arithmetic. Result is
    // bit-identical to ntile(k) — the oracle keeps the ntile SQL.
    "an_ntile" -> ((s, d) => {
      import s.implicits._
      val k = 10
      val nbins = 256
      val cust = Tables.customer(s, d)
        .select($"c_custkey", $"c_acctbal".cast("double").as("c_acctbal"))
      val stats = cust.agg(min($"c_acctbal"), max($"c_acctbal"),
        count(lit(1))).first()
      val n = stats.getLong(2)
      if (n == 0) {
        cust.select($"c_custkey", lit(0L).as("decile")).limit(0)
      } else {
        val (lo, hi) = (stats.getDouble(0), stats.getDouble(1))
        // bin ascending in acctbal; global order is acctbal DESC, so
        // bins are consumed in descending id order.
        val binned = cust.withColumn("bin",
          if (hi == lo) lit(0L)
          else least(floor(($"c_acctbal" - lo) / (hi - lo) * nbins),
            lit(nbins - 1L)))
        val histo = binned.groupBy($"bin").agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .sortBy(-_._1)
        var acc = 0L
        val offs = histo.map { case (b, c) => val o = acc; acc += c; (b, o) }
        val offDf = offs.toSeq.toDF("bin", "off")
        val wBin = Window.partitionBy($"bin")
          .orderBy($"c_acctbal".desc, $"c_custkey".asc)
        val ranked = binned
          .withColumn("rn", row_number().over(wBin).cast("long"))
          .join(broadcast(offDf), Seq("bin"))
          .withColumn("r", $"rn" + $"off")
        val q = n / k
        val m = n % k
        val cut = m * (q + 1)
        val decile =
          if (q == 0) expr("r")
          else expr(s"CASE WHEN r <= $cut THEN (r + $q) DIV ${q + 1} " +
            s"ELSE $m + (r - $cut + ${q - 1}) DIV $q END")
        ranked.select($"c_custkey", decile.cast("long").as("decile"))
          .orderBy($"c_custkey")
      }
    }),

    // UNPIVOT (wide → long): the schema-normalization step every
    // feature pipeline runs before per-measure statistics. Native
    // Dataset.unpivot — ONE scan emits measures×rows without a self
    // union (the UNION ALL form the oracle uses would scan the fact
    // table once per measure; at 100 TB that's 4 scans vs 1). The
    // long form partial-aggs straight down to measure-sized output.
    "an_unpivot" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_quantity", $"l_extendedprice",
          $"l_discount", $"l_tax")
        .unpivot(Array($"l_orderkey"),
          Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
          "measure", "val")
        .groupBy($"measure")
        .agg(count(lit(1)).as("n"),
          sum(round($"val" * 100).cast("long")).as("cents"))
        .orderBy($"measure")
    }),

    // KMV (k-minimum-values) approximate distinct — the mergeable
    // distinct sketch, made ENGINE-PORTABLE: the hash is md5 (not an
    // engine-private hash), so the oracle reproduces the estimate
    // bit-for-bit and the correctness gate can hash-check an
    // *approximate* operator. Scale shape: distinct (group, key)
    // partial-aggs first (the only full-data shuffle); the k smallest
    // hashes per group are a bounded top-k (k=64 rows per group);
    // estimate = (k-1)/kth-smallest-fraction. Production merge:
    // per-partition k-mins union → re-take k mins (associative).
    "an_kmv_distinct" -> ((s, d) => {
      import s.implicits._
      val k = 64
      val du = Tables.events(s, d).select($"event_type", $"user_id")
        .distinct()
        .withColumn("frac",
          graft.llm.TextOps.hashFrac($"user_id".cast("string")))
      val w = Window.partitionBy($"event_type").orderBy($"frac")
      val kmin = du.withColumn("rn", row_number().over(w))
        .filter($"rn" <= k)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("nh"), max($"frac").as("kth"))
      val exact = du.groupBy($"event_type")
        .agg(count(lit(1)).as("n_exact"))
      kmin.join(exact, "event_type")
        .select($"event_type", $"n_exact",
          // fewer than k distinct keys ⇒ the sketch IS the exact set
          when($"nh" < k, $"nh".cast("double"))
            .otherwise(round(lit(k - 1) / $"kth", 4)).as("est"))
        .orderBy($"event_type")
    }),

    // HyperLogLog approximate distinct (Flajolet et al. 2007), made
    // ENGINE-PORTABLE and therefore hash-checkable: the 60-bit md5
    // sharedHash splits into a 6-bit register index (m=64) and a
    // 54-bit suffix whose leading-zero count (via length(bin(r)) —
    // identical in Spark and DuckDB) gives rho. The query builds
    // PARTIAL sketches per (group, shard) first and then merges them
    // by per-register max — the exact associative merge a 1000-executor
    // cluster runs (sketch per partition, max-combine at the reducer),
    // so register state is 64 longs per group regardless of data size;
    // no distinct, no Expand, duplicates absorbed by max() in the
    // partial agg. The estimator keeps Z as an EXACT integer numerator
    // (sum of 2^(55-reg), zero registers contribute 2^55) so the only
    // floating math is one division + one round — bit-identical across
    // engines; the small-range branch is linear counting (m*ln(m/V)).
    "an_hll_distinct" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_type", $"user_id")
      val rho = ev
        .withColumn("h",
          graft.llm.TextOps.sharedHash($"user_id".cast("string")))
        .withColumn("shard", pmod($"user_id", lit(8L)))
        .withColumn("bucket", expr("h DIV 18014398509481984"))
        .withColumn("r", pmod($"h", lit(18014398509481984L)))
        .withColumn("rho",
          when($"r" > 0, lit(55) - length(bin($"r"))).otherwise(lit(55))
            .cast("long"))
      val partial = rho.groupBy($"event_type", $"shard", $"bucket")
        .agg(max($"rho").as("reg"))
      val merged = partial.groupBy($"event_type", $"bucket")
        .agg(max($"reg").as("reg"))
      val z = merged.groupBy($"event_type").agg(
        count(lit(1)).as("filled"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - reg AS INT))"))
          .as("zfill"))
      val exact = ev.distinct().groupBy($"event_type")
        .agg(count(lit(1)).as("n_exact"))
      z.join(exact, "event_type")
        .withColumn("v_zero", (lit(64L) - $"filled").cast("long"))
        .withColumn("z_num",
          ($"zfill" + $"v_zero" * lit(36028797018963968L)).cast("long"))
        .withColumn("raw",
          lit(0.709) * 4096 * 36028797018963968.0 / $"z_num")
        .select($"event_type", $"n_exact", $"v_zero", $"z_num",
          when($"raw" <= 160.0 && $"v_zero" > 0,
            round(lit(64.0) * log(lit(64.0) / $"v_zero"), 4))
            .otherwise(round($"raw", 4)).as("est"))
        .orderBy($"event_type")
    }),

    // Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005):
    // the third mergeable sketch next to KMV and HLL, again made
    // ENGINE-PORTABLE so the gate hash-checks an approximate operator.
    // d=4 hash rows (seeded md5) × w=512 counters; every event lands
    // in 4 cells, so the partial aggregation collapses each map task
    // to ≤2048 rows no matter the input size — THE property that lets
    // a 1000-executor rollup ship sketches, not rows, and the merge is
    // plain per-cell SUM (associative, commutative). The candidate set
    // here is the exact top-20 (so the oracle can reproduce rows
    // bit-for-bit); production reads candidates from the previous
    // window's sketch. CM guarantees est ≥ exact always and
    // est ≤ exact + e/w·N w.h.p. — StatsSketchSpec pins both sides.
    "an_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      import graft.llm.TextOps.sharedHash
      val W = 512L
      val D = 4
      val ev = Tables.events(s, d).select($"user_id")
      def cell(j: Int, c: org.apache.spark.sql.Column) =
        pmod(sharedHash(concat(lit(s"cm$j:"), c.cast("string"))), lit(W))
      val cells = ev
        .select(posexplode(array((0 until D).map(j => cell(j, $"user_id")): _*))
          .as(Seq("j", "cell")))
        .groupBy($"j", $"cell").agg(count(lit(1)).as("cnt"))
      val top = ev.groupBy($"user_id").agg(count(lit(1)).as("n_exact"))
        .orderBy($"n_exact".desc, $"user_id".asc).limit(20)
      top.select($"user_id", $"n_exact",
          posexplode(array((0 until D).map(j => cell(j, $"user_id")): _*))
            .as(Seq("j", "cell")))
        .join(broadcast(cells), Seq("j", "cell"))
        .groupBy($"user_id", $"n_exact")
        .agg(min($"cnt").as("est"))
        .orderBy($"n_exact".desc, $"user_id".asc)
    }),

    // One-pass Pearson correlation matrix: all 6 measure pairs of
    // (quantity, extendedprice, discount, tax) per returnflag group
    // from a SINGLE aggregation — n + 4 linear sums + 10 product sums
    // — where the naive form runs corr() 6 times (6 scans, or one scan
    // with 6 stateful aggs). The sums are EXACT integers: cents
    // multiply as LONGs and each Σxy is carried as three 20-bit limb
    // LONG sums ([[limbProductSums]]), recombined to decimal(38) only
    // on the 3 group rows ([[limbRecombined]]) — Σp² overflows a
    // BIGINT at sf≥0.1, and DuckDB's HUGEINT sum sees the identical
    // exact value — so the double arithmetic downstream is
    // bit-identical across engines. At 100 TB: one scan, one
    // partial-agg'd shuffle to 3 group rows, zero joins.
    "an_corr_matrix" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d).select($"l_returnflag",
        round($"l_quantity" * 100).cast("long").as("q"),
        round($"l_extendedprice" * 100).cast("long").as("p"),
        round($"l_discount" * 100).cast("long").as("dc"),
        round($"l_tax" * 100).cast("long").as("t"))
      // Split-accumulator exact summation ([[limbProductSums]]): long
      // row-side products, three 20-bit limb long sums per pair, exact
      // decimal(38) recombination on the 3 GROUP rows. (The naive
      // sum(decimal×decimal) form measured 10× tpch_q1's long-sum scan
      // on the same table.)
      val ms = Seq("q", "p", "dc", "t")
      val pairsUp = for {
        (x, i) <- ms.zipWithIndex; (y, j) <- ms.zipWithIndex if i <= j
      } yield (x, y)
      val agg0 = li.groupBy($"l_returnflag").agg(
        count(lit(1)).as("n"),
        (ms.map(m => sum(col(m)).as(s"s_$m")) ++
          limbProductSums(pairsUp)): _*)
      val agg = agg0.select(
        col("l_returnflag") +: col("n") +: ms.map(m => col(s"s_$m")) ++:
        pairsUp.map { case (x, y) => limbRecombined(x, y) }: _*)
      def corr(x: String, y: String) = {
        val n = $"n".cast("double")
        val sx = col(s"s_$x").cast("double")
        val sy = col(s"s_$y").cast("double")
        val sxy = col(s"s_${x}_$y").cast("double")
        val sxx = col(s"s_${x}_$x").cast("double")
        val syy = col(s"s_${y}_$y").cast("double")
        round((n * sxy - sx * sy) /
          sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
      }
      val pairs = for {
        (x, i) <- ms.zipWithIndex; (y, j) <- ms.zipWithIndex if i < j
      } yield (s"${x}_$y", corr(x, y))
      agg.select($"l_returnflag",
          explode(map(pairs.flatMap { case (nm, c) =>
            Seq(lit(nm), c) }: _*)).as(Seq("pair", "corr")))
        .orderBy($"l_returnflag", $"pair")
    }),

    // Welch's two-sample t-test (the A/B-testing staple) per
    // event_type, groups = user_id parity: statistic and
    // Welch–Satterthwaite df computed entirely from one pass of EXACT
    // integer power sums (cents — accumulation-order-independent, so
    // a 1000-executor partial agg equals the oracle bit-for-bit; the
    // double math happens only once, on the 8 agreed sums). n≤1
    // groups emit null rather than divide by zero (DuckDB errors, it
    // doesn't null). One scan, one shuffle to event_type-sized output.
    "an_ab_ttest" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_type",
        ($"user_id" % 2).as("grp"),
        round($"value" * 100).cast("long").as("cents"))
      val g = ev.groupBy($"event_type").agg(
        count(when($"grp" === 0, 1)).as("n_a"),
        sum(when($"grp" === 0, $"cents")).as("sa1"),
        sum(when($"grp" === 0, $"cents" * $"cents")).as("sa2"),
        count(when($"grp" === 1, 1)).as("n_b"),
        sum(when($"grp" === 1, $"cents")).as("sb1"),
        sum(when($"grp" === 1, $"cents" * $"cents")).as("sb2"))
      def mean(s1: String, n: String) =
        col(s1).cast("double") / col(n) / 100.0
      def vr(s1: String, s2: String, n: String) =
        (col(s2).cast("double") -
          col(s1).cast("double") * col(s1) / col(n)) / (col(n) - 1)
      g.withColumn("va", vr("sa1", "sa2", "n_a"))
        .withColumn("vb", vr("sb1", "sb2", "n_b"))
        .withColumn("se2", $"va" / $"n_a" + $"vb" / $"n_b")
        .select($"event_type", $"n_a", $"n_b",
          round(mean("sa1", "n_a"), 6).as("mean_a"),
          round(mean("sb1", "n_b"), 6).as("mean_b"),
          when($"n_a" > 1 && $"n_b" > 1,
            round((mean("sa1", "n_a") - mean("sb1", "n_b")) * 100.0 /
              sqrt($"se2"), 6)).as("t_stat"),
          when($"n_a" > 1 && $"n_b" > 1,
            round($"se2" * $"se2" /
              (($"va" / $"n_a") * ($"va" / $"n_a") / ($"n_a" - 1) +
               ($"vb" / $"n_b") * ($"vb" / $"n_b") / ($"n_b" - 1)), 4))
            .as("df"))
        .orderBy($"event_type")
    }),

    // Data-quality report (the Deequ/great-expectations staple): the
    // whole constraint suite — completeness, validity, uniqueness,
    // range — computed in ONE aggregation pass over the table, then
    // Market-basket affinity (support / confidence / lift — Agrawal &
    // Srikant's association-rule statistics, pair depth): co-purchase
    // pairs explode ORDER-LOCALLY (the g10 wedge discipline — fan-out
    // bounded by basket size², never corpus²), pair supports
    // partial-agg; item supports and the basket count broadcast back.
    // Lift is a ratio of exact longs rounded once; top-20 by lift is
    // TakeOrderedAndProject. The min-support floor (co-count ≥ 3)
    // is what keeps the tail from dominating — the standard a-priori
    // pruning knob.
    "an_basket_lift" -> ((s, d) => {
      import s.implicits._
      val items = Tables.lineitem(s, d)
        .select($"l_orderkey".as("oid"), $"l_partkey".as("item")).distinct()
      val nOrders = items.select($"oid").distinct().count()
      val pairs = items.as("x").join(items.as("y"),
          col("x.oid") === col("y.oid") && col("x.item") < col("y.item"))
        .select(col("x.item").as("a"), col("y.item").as("b"))
        .groupBy($"a", $"b").agg(count(lit(1)).as("c_ab"))
        .filter($"c_ab" >= 3)
      val supp = items.groupBy($"item").agg(count(lit(1)).as("c"))
      pairs
        .join(supp.select($"item".as("a"), $"c".as("c_a")), "a")
        .join(supp.select($"item".as("b"), $"c".as("c_b")), "b")
        .select($"a", $"b", $"c_ab", $"c_a", $"c_b",
          round(lit(nOrders) * $"c_ab" * 1.0 / ($"c_a" * $"c_b"), 6)
            .as("lift"),
          round($"c_ab" * 1.0 / $"c_a", 6).as("conf"))
        .orderBy($"lift".desc, $"a", $"b").limit(20)
    }),

    // One-pass OLS linear regression per group (closed form): slope,
    // intercept and R² from five EXACT power sums — n, Σx, Σy, Σxy,
    // Σx², Σy² (cents; products in decimal(38) ↔ DuckDB HUGEINT, the
    // an_corr_matrix discipline) — so a 1000-executor partial agg is
    // bit-identical to the oracle, and the only float math runs once
    // on the agreed sums. Shuffle carries 3 group rows. The regression
    // the reference's driver-side stats could never do distributed.
    "an_ols" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d).select($"l_returnflag",
        round($"l_quantity" * 100).cast("long").as("x"),
        round($"l_extendedprice" * 100).cast("long").as("y"))
      def big(c: String) = col(c).cast("decimal(38,0)")
      // row-side products in LONG (≤ ~1e14, overflow-free at any sf —
      // the an_corr_matrix discipline), decimal(38) only in the SUM
      val agg = li.groupBy($"l_returnflag").agg(
        count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"),
        sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"),
        sum(($"y" * $"y").cast("decimal(38,0)")).as("syy"))
      // Σx·Σy overflows a long (≈1.8e22 at sf0.1) — ANSI mode would
      // throw; keep every cross-product in decimal(38)
      val num = ($"n" * $"sxy" - big("sx") * big("sy")).cast("double")
      val dx = ($"n" * $"sxx" - big("sx") * big("sx")).cast("double")
      val dy = ($"n" * $"syy" - big("sy") * big("sy")).cast("double")
      agg.select($"l_returnflag", $"n",
          round(num / dx, 6).as("slope"),
          round((num / dx) * lit(-1.0) * ($"sx".cast("double") / $"n")
            + $"sy".cast("double") / $"n", 4).as("intercept"),
          round(num * num / (dx * dy), 6).as("r2"))
        .orderBy($"l_returnflag")
    }),

    // Two-sample Kolmogorov–Smirnov test, distributed: D is the max
    // ECDF gap over the DISTINCT value grid, so the state is one
    // (value → cnt1, cnt2) aggregation + one window over distinct
    // values (like the quantile sketch's exact verifier — sorted
    // distinct values, not rows). The gap is kept as the INTEGER
    // cross-product |cum1·n2 − cum2·n1| until the very end (one exact
    // max, one division), so D hash-checks bit-for-bit; the asymptotic
    // p-value is the standard two-term-free approximation
    // 2·exp(−2λ²). The A-vs-R returnflag split is a null-true case —
    // the spec pins that D stays below the 1% critical value.
    "an_ks_test" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .filter($"l_returnflag".isin("A", "R"))
        .select($"l_returnflag".as("g"),
          round($"l_extendedprice" * 100).cast("long").as("c"))
      // vc is consumed three times (min/max stats, bin totals, the
      // final ECDF join) — materialize the distinct-value counts once,
      // or the lineitem scan + groupBy re-executes per consumer.
      // Materialize.eager: localCheckpoint here (local mode), persist
      // under spark.graft.materialize=persist on lossy clusters.
      val vc = graft.Materialize.eager(li.groupBy($"c").agg(
        sum(when($"g" === "A", 1L).otherwise(0L)).as("c1"),
        sum(when($"g" === "R", 1L).otherwise(0L)).as("c2")))
      // the global ECDF cum-sum runs PARTITIONED: 128 range bins, with
      // bin offsets from a bounded (≤128-row) driver collect — the
      // an_ntile two-pass shape; a bare Window.orderBy(c) would put
      // every distinct value in one task
      val stats = vc.agg(min($"c"), max($"c")).first()
      val (lo, span) = (stats.getLong(0), stats.getLong(1) - stats.getLong(0) + 1)
      val binned = vc.withColumn("bin", expr(s"((c - $lo) * 128) DIV $span"))
      val binTotals = binned.groupBy($"bin")
        .agg(sum($"c1").as("b1"), sum($"c2").as("b2"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      var (a1, a2) = (0L, 0L)
      val offDf = binTotals.toSeq.map { case (b, s1v, s2v) =>
        val row = (b, a1, a2); a1 += s1v; a2 += s2v; row
      }.toDF("bin", "o1", "o2")
      val wBin = Window.partitionBy($"bin").orderBy($"c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = binned
        .withColumn("l1", sum($"c1").over(wBin))
        .withColumn("l2", sum($"c2").over(wBin))
        .join(broadcast(offDf), "bin")
        .select(($"l1" + $"o1").as("f1"), ($"l2" + $"o2").as("f2"))
      val ns = li.agg(
        sum(when($"g" === "A", 1L).otherwise(0L)).as("n1"),
        sum(when($"g" === "R", 1L).otherwise(0L)).as("n2"))
      cum.crossJoin(broadcast(ns))
        .select($"n1", $"n2",
          abs($"f1" * $"n2" - $"f2" * $"n1").as("gap"))
        .groupBy($"n1", $"n2").agg(max($"gap").as("gap"))
        .select($"n1", $"n2",
          round($"gap" * 1.0 / ($"n1" * $"n2"), 6).as("d"))
        .withColumn("lambda", round(
          $"d" * sqrt($"n1" * 1.0 * $"n2" / ($"n1" + $"n2")), 6))
        .withColumn("p_approx", round(
          lit(2.0) * exp(lit(-2.0) * $"lambda" * $"lambda"), 6))
    }),

    // Poisson bootstrap confidence interval (Efron 1979; the
    // Poisson(1)-weight formulation is THE distributed bootstrap —
    // Chamandy et al., "Estimating Uncertainty for Massive Data
    // Streams", Google 2012): every row draws its per-resample
    // multiplicity independently, so resampling is a PER-ROW map (no
    // sampling-with-replacement coordination across a cluster) and
    // each of the B=32 resample means partial-aggregates like any
    // other sum. The draw is a DETERMINISTIC function of (row, b) via
    // the shared md5 coin against fixed CDF literals (k capped at 4,
    // P(k>4) ≈ 0.37% — identical truncation on both engines), so the
    // CI is replay-stable and hash-checkable. Output: per-group exact
    // mean + the 2nd/31st ranked resample means (a ~94% percentile
    // interval at B=32).
    "an_bootstrap" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d).select($"l_returnflag",
        round($"l_extendedprice" * 100).cast("long").as("c"),
        ($"l_orderkey" * 10 + $"l_linenumber").as("rid"))
      val B = 32
      val u = graft.llm.TextOps.hashFrac(
        concat(lit("bt"), $"b".cast("string"), lit(":"), $"rid".cast("string")))
      val rs = li.select($"l_returnflag", $"c", $"rid",
          explode(array((0 until B).map(b => lit(b.toLong)): _*)).as("b"))
        .withColumn("k",
          when(u < 0.3678794412, 0L).when(u < 0.7357588823, 1L)
            .when(u < 0.9196986029, 2L).when(u < 0.9810118431, 3L)
            .otherwise(4L))
      val means = rs.groupBy($"l_returnflag", $"b")
        .agg(sum($"k" * $"c").as("sc"), sum($"k").as("n"))
        .withColumn("mean_b", round($"sc" * 1.0 / $"n", 4))
      val w = Window.partitionBy($"l_returnflag")
        .orderBy($"mean_b", $"b")
      val ci = means.withColumn("rn", row_number().over(w))
        .groupBy($"l_returnflag")
        .agg(max(when($"rn" === 2, $"mean_b")).as("lo"),
          max(when($"rn" === B - 1, $"mean_b")).as("hi"))
      val exact = li.groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), sum($"c").as("sc"))
        .select($"l_returnflag", $"n",
          round($"sc" * 1.0 / $"n", 4).as("mean"))
      exact.join(ci, "l_returnflag")
        .select($"l_returnflag", $"n", $"mean", $"lo", $"hi")
        .orderBy($"l_returnflag")
    }),

    // Mergeable equi-width-histogram quantile sketch — the fourth
    // mergeable sketch next to KMV/HLL/CMS, completing the family
    // (distinct, frequency, quantiles). Where `an_percentiles` runs
    // Spark's exact percentile (a per-group sort whose state is the
    // GROUP'S ROWS), this keeps 128 bin counters per group no matter
    // the input size: map tasks partial-agg to ≤ groups×128 rows, the
    // merge is per-bin SUM (associative/commutative — the sketch a
    // 1000-executor rollup ships), and the estimate interpolates
    // inside the covering bin. ALL arithmetic is 64-bit integer (cents
    // domain, DIV bin math, per-mille ranks), so the estimate — not
    // just the exact verifier — hash-matches the oracle bit-for-bit.
    // Error bound: est is off by at most one bin width (span/128).
    "an_quantile_sketch" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d).select($"l_returnflag",
        round($"l_extendedprice" * 100).cast("long").as("c"))
      val bounds = li.agg(min($"c").as("lo"), max($"c").as("hi"))
      val binned = li.crossJoin(broadcast(bounds))
        .withColumn("bin", expr("((c - lo) * 128) DIV (hi - lo + 1)"))
      val perBin = binned.groupBy($"l_returnflag", $"lo", $"hi", $"bin")
        .agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy($"l_returnflag").orderBy($"bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = perBin.withColumn("cum", sum($"cnt").over(wCum))
        .withColumn("cum_prev", $"cum" - $"cnt")
      val ranks = li.groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
        .select($"l_returnflag".as("rf"), $"n",
          explode(array(lit(500L), lit(900L), lit(990L))).as("q_pm"))
        .withColumn("r", expr("(q_pm * n + 999) DIV 1000"))
      val est = cum.join(broadcast(ranks),
          $"l_returnflag" === $"rf" && $"cum_prev" < $"r" && $"cum" >= $"r")
        .withColumn("bin_lo", expr("lo + (bin * (hi - lo + 1)) DIV 128"))
        .withColumn("bin_w", expr(
          "((bin + 1) * (hi - lo + 1)) DIV 128 - (bin * (hi - lo + 1)) DIV 128"))
        .select($"l_returnflag", $"q_pm", $"n", expr(
          "bin_lo + ((r - cum_prev) * bin_w) DIV (cnt + 1)").as("est_cents"))
      // exact verifier: distinct-value cumulative counts (state =
      // distinct values, not rows), first value whose cum covers r
      val vc = li.groupBy($"l_returnflag", $"c").agg(count(lit(1)).as("vn"))
      val wVal = Window.partitionBy($"l_returnflag").orderBy($"c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val vcum = vc.withColumn("vcum", sum($"vn").over(wVal))
        .withColumn("vprev", $"vcum" - $"vn")
      val exact = vcum.join(broadcast(ranks),
          $"l_returnflag" === $"rf" && $"vprev" < $"r" && $"vcum" >= $"r")
        .select($"l_returnflag", $"q_pm", $"c".as("exact_cents"))
      est.join(exact, Seq("l_returnflag", "q_pm"))
        .select($"l_returnflag", $"q_pm", $"n", $"est_cents", $"exact_cents",
          abs($"est_cents" - $"exact_cents").as("abs_err"))
        .orderBy($"l_returnflag", $"q_pm")
    }),

    // pivoted to a constant-size (check, metric, ok) report. At
    // 100 TB this is the shape that matters: N checks cost one scan,
    // not N scans; only count(DISTINCT) adds an Expand (×2 rows
    // pre-aggregation), which is the standard price for an exact
    // uniqueness check.
    "an_quality_report" -> ((s, d) => {
      import s.implicits._
      val m = Tables.orders(s, d).agg(
        count(lit(1)).as("row_count"),
        sum(when($"o_custkey".isNull, 1L).otherwise(0L)).as("null_custkey"),
        sum(when($"o_totalprice".isNull || $"o_totalprice" <= 0, 1L)
          .otherwise(0L)).as("bad_price"),
        sum(when(!$"o_orderstatus".isin("O", "F", "P"), 1L).otherwise(0L))
          .as("bad_status"),
        sum(when($"o_orderdate".isNull, 1L).otherwise(0L)).as("null_date"),
        countDistinct($"o_orderkey").as("distinct_key"))
      m.selectExpr(
        """stack(6,
          |  '01_row_count', CAST(row_count AS DOUBLE),
          |    CAST(row_count > 0 AS BIGINT),
          |  '02_null_custkey', CAST(null_custkey AS DOUBLE),
          |    CAST(null_custkey = 0 AS BIGINT),
          |  '03_bad_price', CAST(bad_price AS DOUBLE),
          |    CAST(bad_price = 0 AS BIGINT),
          |  '04_bad_status', CAST(bad_status AS DOUBLE),
          |    CAST(bad_status = 0 AS BIGINT),
          |  '05_null_date', CAST(null_date AS DOUBLE),
          |    CAST(null_date = 0 AS BIGINT),
          |  '06_unique_orderkey', CAST(distinct_key AS DOUBLE),
          |    CAST(distinct_key = row_count AS BIGINT)
          |) AS (chk, metric, ok)""".stripMargin)
        .orderBy($"chk")
    }),

    // Time-series densification + forward fill (gap fill) — the
    // resample step every metrics/feature pipeline runs before
    // modeling. Scale shape: the raw stream collapses to (key, bucket)
    // partials FIRST (the only full-data shuffle); densification
    // explodes a per-key sequence BOUNDED by the key's observed span
    // (30 day-buckets here — never unbounded, never a calendar
    // cross-join); the fill is last-non-null over the key's own
    // ordered buckets. Every later stage is agg-output-sized.
    // Exact-cents values keep the fill engine-portable.
    "an_gapfill" -> ((s, d) => {
      import s.implicits._
      val b = Tables.events(s, d).filter($"user_id" < 100)
        .select($"user_id", expr("ts DIV 86400000000000").as("dy"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"user_id", $"dy").agg(sum($"cents").as("cents"))
      val dense = b.groupBy($"user_id")
        .agg(min($"dy").as("d0"), max($"dy").as("d1"))
        .select($"user_id", explode(sequence($"d0", $"d1")).as("dy"))
      val w = Window.partitionBy($"user_id").orderBy($"dy")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dense.join(b, Seq("user_id", "dy"), "left")
        .withColumn("filled", when($"cents".isNull, 1L).otherwise(0L))
        .withColumn("v", last($"cents", ignoreNulls = true).over(w))
        .select($"user_id", $"dy", $"v", $"filled")
        .orderBy($"user_id", $"dy")
    }),

    // Sequence-pattern matching (MATCH_RECOGNIZE-lite): each user's
    // event history becomes an ordered symbol string, and behavioral
    // patterns are regexes over it — subsequence funnels, error→
    // recovery, bounce. Scale shape: ONE shuffle to the per-user
    // sequence (collect_list + array_sort inside the aggregate;
    // per-user history is bounded in this domain — the same per-key
    // contract as sessionization), then a broadcast pattern table ×
    // codegen'd RLIKE. Adding a pattern costs zero extra passes.
    "an_seq_match" -> ((s, d) => {
      import s.implicits._
      val pats = Seq(
        ("bounce_view_only", "^v[^cp]*$"),
        ("error_then_purchase", "e.*p"),
        ("funnel_vcp", "v.*c.*p")).toDF("pattern", "re")
      Tables.events(s, d)
        .select($"user_id", $"ts", $"event_id",
          substring($"event_type", 1, 1).as("ch"))
        .groupBy($"user_id")
        .agg(concat_ws("", expr(
          "transform(array_sort(collect_list(struct(ts, event_id, ch)))," +
            " x -> x.ch)")).as("seq"))
        .crossJoin(broadcast(pats))
        .groupBy($"pattern")
        .agg(sum(when(expr("seq RLIKE re"), 1L).otherwise(0L))
          .as("n_users"))
        .orderBy($"pattern")
    }),

    // Robust outlier detection via median absolute deviation — the
    // heavy-tail-safe twin of an_zscore (mean/sd are themselves pulled
    // by the outliers they're meant to find; median/MAD are not).
    // Engine-portable: med and mad are ROUNDED at 6dp before any
    // decision, and the outlier test is the division-free
    // |x − med| > 3.5·1.4826·mad, so both engines compare identical
    // doubles. Exact percentile sorts per group — right here where the
    // oracle demands bit-exactness and groups are type-sized; at
    // 100 TB swap in approx_percentile (same plan shape, sketch agg).
    "an_mad_outliers" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_type", $"value")
      val med = ev.groupBy($"event_type")
        .agg(round(expr("percentile(value, 0.5D)"), 6).as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy($"event_type", $"med")
        .agg(round(expr("percentile(abs(value - med), 0.5D)"), 6)
          .as("mad"))
      ev.join(broadcast(mad), "event_type")
        .groupBy($"event_type", $"med", $"mad")
        .agg(count(lit(1)).as("n"),
          sum(when(abs($"value" - $"med") > lit(3.5) * lit(1.4826) * $"mad",
            1L).otherwise(0L)).as("n_outliers"))
        .select($"event_type", $"n", $"med", $"mad", $"n_outliers")
        .orderBy($"event_type")
    }),

    // Trailing-interval rolling aggregate via a RANGE frame — unlike
    // the ROWS frames of an_running_sum, a RANGE frame is gap-correct:
    // a 7-day trailing sum covers the VALUE interval [day-6, day],
    // not the last 7 physical rows (which silently lie when days are
    // missing). Scale shape: the stream collapses to (type, day)
    // partials first; the window runs over type-sized daily series.
    "an_rolling_range" -> ((s, d) => {
      import s.implicits._
      val daily = Tables.events(s, d)
        .select($"event_type", expr("ts DIV 86400000000000").as("dy"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"dy").agg(sum($"cents").as("cents"))
      val w = Window.partitionBy($"event_type").orderBy($"dy")
        .rangeBetween(-6, Window.currentRow)
      daily.withColumn("trail7_cents", sum($"cents").over(w))
        .select($"event_type", $"dy", $"cents", $"trail7_cents")
        .orderBy($"event_type", $"dy")
    }),

    // SCD Type-2 dimension build: a change log becomes versioned
    // dimension rows with [valid_from, valid_to) intervals — valid_to
    // is the NEXT change's instant (null = current version). One
    // shuffle to (key, instant) partials, one lead() over key-sized
    // version chains. The j14_pit_join query consumes exactly this
    // shape for leakage-safe training joins.
    "an_scd2_build" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"vf")
      scd2Changes(s, d).withColumn("vt", lead($"vf", 1).over(w))
        .select($"user_id", $"vf", $"vt", $"cents")
        .orderBy($"user_id", $"vf")
    }),

    // Time-decayed (half-life) engagement score per user — the
    // recency-weighted aggregate every feature store keeps next to the
    // raw counters. Determinism across engines is by construction:
    // the decay is INTEGER halvings — weight_ppm = 1e6 >> (age DIV
    // half-life) — so there is no pow()/exp() double to disagree on;
    // the weighted sum stays in BIGINT (association-order-free).
    // Scale shape: the global max-ts is a broadcast scalar; then ONE
    // partial-agg'd groupBy over the events — per-row weights, no
    // window, no second shuffle.
    "an_decay_agg" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"user_id",
        expr("ts DIV 1000000000").as("sec"),
        round($"value" * 100).cast("long").as("cents"))
      val tmax = ev.agg(max($"sec").as("tmax"))
      ev.crossJoin(broadcast(tmax))
        .withColumn("h", least(expr("(tmax - sec) DIV 604800"), lit(62L)))
        .withColumn("w_ppm",
          expr("shiftright(CAST(1000000 AS BIGINT), CAST(h AS INT))"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          sum($"cents" * $"w_ppm").as("decayed_score"))
        .orderBy($"user_id")
    }),

    // First-order Markov transition matrix over the event stream:
    // P(next_type | prev_type) from per-user ordered event pairs —
    // the session-model / anomaly-baseline building block. Scale
    // shape: ONE shuffle by user_id serves the lead() window; the
    // transition counts partial-aggregate map-side to |types|² rows,
    // and the row-normalizing window runs over that tiny matrix.
    "an_markov" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val tr = Tables.events(s, d)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type".as("prev_type"), $"next_type")
        .agg(count(lit(1)).as("n"))
      tr.withColumn("p",
          round($"n" / sum($"n").over(Window.partitionBy($"prev_type")), 6))
        .orderBy($"prev_type", $"next_type")
    }),

    // Gini coefficient of account-balance concentration per nation —
    // the inequality/concentration measure (wealth, spend, traffic
    // share). Computed from the rank formula G = 2·Σi·xᵢ/(n·Σx) −
    // (n+1)/n over values shifted non-negative (the balance floor is
    // −1000.00); the rank window is PARTITIONED by nation with a
    // unique tiebreak, and every sum is an exact BIGINT (< 2^53, so
    // the two double divisions are identical in any engine).
    "an_gini" -> ((s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d).select($"c_nationkey", $"c_custkey",
        (round($"c_acctbal" * 100).cast("long") + 100000L).as("x"))
      val w = Window.partitionBy($"c_nationkey").orderBy($"x", $"c_custkey")
      c.withColumn("i", row_number().over(w).cast("long"))
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
          sum($"i" * $"x").as("six"))
        .select($"c_nationkey", $"n",
          round(lit(2.0) * $"six" / ($"n" * $"sx")
            - ($"n" + lit(1.0)) / $"n", 6).as("gini"))
        .orderBy($"c_nationkey")
    }),

    // Chi-square independence test: is event_type independent of the
    // user cohort? The contingency table is one partial-agg'd
    // (cohort × type) count; marginals roll up from it; the statistic
    // sums per-cell integer-micro terms (each term rounds BEFORE the
    // sum — association-order-free, the an_entropy discipline).
    // Completes the inferential suite (t-test, KS, bootstrap, OLS,
    // Benford) with the categorical-association test.
    "an_chi2_indep" -> ((s, d) => {
      import s.implicits._
      val ct = Tables.events(s, d)
        .select(pmod($"user_id", lit(5L)).as("cohort"), $"event_type")
        .groupBy($"cohort", $"event_type").agg(count(lit(1)).as("n"))
      val wc = Window.partitionBy($"cohort")
      val wt = Window.partitionBy($"event_type")
      val tot = ct.agg(sum($"n").as("ntot"))
      val cells = ct
        .withColumn("rown", sum($"n").over(wc))
        .withColumn("coln", sum($"n").over(wt))
        .crossJoin(broadcast(tot))
        .withColumn("exp", $"rown" * $"coln" / $"ntot")
        .withColumn("term_micro",
          round(pow($"n" - $"exp", 2) / $"exp" * 1e6).cast("long"))
      // dof derived from the table's own marginals — cells is at most
      // cohorts × types rows, so the countDistinct Expand is trivial
      cells.agg(
          count(lit(1)).as("n_cells"),
          sum($"n").as("n_obs"),
          sum($"term_micro").as("chi2_micro"),
          ((countDistinct($"cohort") - 1) *
            (countDistinct($"event_type") - 1)).as("dof"))
        .select($"n_cells", $"n_obs", $"chi2_micro", $"dof")
    }),

    // Benford first-digit screening (the fraud / fabricated-data
    // staple): leading-digit distribution of purchase amounts vs
    // Benford's log10(1 + 1/d) expectation, with a per-digit
    // chi-square contribution. The first digit comes from the CENTS
    // STRING — no float log in the row path, so both engines agree
    // trivially; the expectation rounds to integer ppm before use and
    // the chi term is arithmetic over exact ints. One partial-agg'd
    // 9-row rollup + a broadcast total: scan-speed at any size.
    "an_benford" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).filter($"event_type" === "purchase")
        .select(round($"value" * 100).cast("long").as("cents"))
        .filter($"cents" > 0)
        .withColumn("digit",
          substring($"cents".cast("string"), 1, 1).cast("long"))
      val tot = ev.agg(count(lit(1)).as("ntot"))
      ev.groupBy($"digit").agg(count(lit(1)).as("n_obs"))
        .crossJoin(broadcast(tot))
        .withColumn("expected_ppm",
          round(log10(lit(1.0) + lit(1.0) / $"digit") * 1e6).cast("long"))
        .withColumn("exp_cnt", $"ntot" * $"expected_ppm" / 1e6)
        .select($"digit", $"n_obs", $"expected_ppm",
          round(pow($"n_obs" - $"exp_cnt", 2) / $"exp_cnt", 4)
            .as("chi2_term"))
        .orderBy($"digit")
    }),

    // RFM segmentation (recency / frequency / monetary quintiles) —
    // the classic customer-value grid. Quintile BREAKS come from one
    // exact-percentile reduce over the per-user aggregate table
    // (user-sized, not event-sized; at extreme user counts swap in
    // percentile_approx behind the same shape), broadcast back as a
    // 1-row frame; scoring is then per-row arithmetic — no rank
    // window anywhere. Breaks round to 4dp on both engines before the
    // strict > comparisons (the an_percentiles portability recipe);
    // recency scores INVERTED (most recent = 5), per the convention.
    "an_rfm" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).filter($"event_type" === "purchase")
        .select($"user_id", expr("ts DIV 1000000000").as("sec"),
          round($"value" * 100).cast("long").as("cents"))
      val tmax = ev.agg(max($"sec").as("tmax"))
      val agg = ev.groupBy($"user_id")
        .agg(max($"sec").as("last_sec"), count(lit(1)).as("freq"),
          sum($"cents").as("mon"))
        .crossJoin(broadcast(tmax))
        .select($"user_id", ($"tmax" - $"last_sec").as("rec"),
          $"freq", $"mon")
      val qs = typedLit(Seq(0.2, 0.4, 0.6, 0.8))
      val breaks = agg.agg(
        percentile($"rec", qs).as("rb"),
        percentile($"freq", qs).as("fb"),
        percentile($"mon", qs).as("mb"))
      def above(v: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        (1 to 4).map(i => when(v > round(element_at(b, i), 4), 1L)
          .otherwise(0L)).reduce(_ + _)
      agg.crossJoin(broadcast(breaks))
        .select($"user_id",
          (lit(5L) - above($"rec", $"rb")).as("r_score"),
          (lit(1L) + above($"freq", $"fb")).as("f_score"),
          (lit(1L) + above($"mon", $"mb")).as("m_score"))
        .orderBy($"user_id")
    }),

    // Windowed funnel (the ClickHouse windowFunnel shape): deepest
    // view → click → purchase chain per user where every later step
    // lands within 1h of the FIRST step. EXISTS semantics — ANY
    // qualifying chain counts, not just the earliest-start greedy one
    // (which under-counts when the first view has no follow-up but a
    // later one does) — via per-user interval joins: each join is
    // equi-keyed on user_id (one hash shuffle), the window predicate
    // filters inside the join, and per-user fanout is bounded by
    // events-per-hour density, not total history. Complements
    // an_funnel (lifetime ordered funnel) and an_seq_match (regex
    // sequences) with the time-boxed variant.
    "an_window_funnel" -> ((s, d) => {
      import s.implicits._
      val W = 3600L * 1000000000L // 1h in epoch-nanos
      val ev = Tables.events(s, d).select($"user_id", $"event_type", $"ts")
      val v = ev.filter($"event_type" === "view")
        .select($"user_id", $"ts".as("t1"))
      val c = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("t2"))
      val p = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("t3"))
      val vc = v.join(c, Seq("user_id"))
        .filter($"t2" >= $"t1" && $"t2" <= $"t1" + W)
      val d1 = v.select($"user_id").distinct().withColumn("depth", lit(1L))
      val d2 = vc.select($"user_id").distinct().withColumn("depth", lit(2L))
      val d3 = vc.join(p, Seq("user_id"))
        .filter($"t3" >= $"t2" && $"t3" <= $"t1" + W)
        .select($"user_id").distinct().withColumn("depth", lit(3L))
      d1.unionByName(d2).unionByName(d3)
        .groupBy($"user_id").agg(max($"depth").as("depth"))
        .groupBy($"depth").agg(count(lit(1)).as("n_users"))
        .orderBy($"depth")
    }),

    // Shannon entropy of the event-type mix per user cohort — the
    // diversity/drift monitor (a collapsed cohort suddenly emitting
    // one event type drops to zero entropy). Each (cohort, type)
    // term rounds to integer micro-nats BEFORE the sum, so the total
    // is association-order-free and engine-exact; p itself is one
    // int64/int64 double division (correctly rounded everywhere).
    // Scale shape: one partial-agg'd count, a window over the tiny
    // (cohort × type) grid, one rollup — no per-row state.
    "an_entropy" -> ((s, d) => {
      import s.implicits._
      val ct = Tables.events(s, d)
        .select(pmod($"user_id", lit(10L)).as("cohort"), $"event_type")
        .groupBy($"cohort", $"event_type").agg(count(lit(1)).as("nt"))
      ct.withColumn("p", $"nt" / sum($"nt").over(Window.partitionBy($"cohort")))
        .withColumn("term_micro", round(-$"p" * log($"p") * 1e6).cast("long"))
        .groupBy($"cohort")
        .agg(sum($"nt").as("n_events"), count(lit(1)).as("n_types"),
          sum($"term_micro").as("entropy_micronats"))
        .orderBy($"cohort")
    })
  )

  /** The change rows behind `an_scd2_build` — shared with the j14
    * feature-store loop, which PERSISTS them through the KV write path
    * and point-in-time-joins against the table read (Joins.scala). */
  private[operators] def scd2Changes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .filter($"event_type" === "click" && $"user_id" < 50)
      .groupBy($"user_id", expr("ts DIV 1000").as("vf"))
      .agg(max(round($"value" * 100).cast("long")).as("cents"))
  }

  val oracles: Map[String, String] = Map(
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2)
        |         AS sum_disc_price,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_q3" ->
      """SELECT l_orderkey,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "tpch_q5" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.04 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND datediff('day', o.o_orderdate, l.l_shipdate) > 60)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "tpch_q13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tpch_q14" ->
      """SELECT round(100.0 *
        |  sum(CASE WHEN p_type LIKE 'PROMO%'
        |           THEN l_extendedprice * (1.0 - l_discount) ELSE 0 END) /
        |  sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,
    "tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 140)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "tpch_q19" ->
      """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 35)"""
        .stripMargin,
    "tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |       round(sum(volume), 2) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |         l_extendedprice * (1.0 - l_discount) AS volume
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE (n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
        |     OR (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "tpch_q8" ->
      """SELECT o_year,
        |       round(sum(CASE WHEN supp_nation = 'NATION_12' THEN volume
        |                      ELSE 0 END) / sum(volume), 6) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         l_extendedprice * (1.0 - l_discount) AS volume,
        |         n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    AND p_type = 'PROMO')
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         round(sum(l_extendedprice * (1.0 - l_discount)), 2)
        |           AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "tpch_q17" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_size < 10
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = part.p_partkey)""".stripMargin,
    "tpch_q21" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND datediff('day', o_orderdate, l1.l_shipdate) > 60
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND datediff('day', o_orderdate, l3.l_shipdate)
        |                        > 60)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC LIMIT 20""".stripMargin,
    "tpch_q22" ->
      """SELECT c_nationkey AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
        |       round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "tpch_q2" ->
      s"""WITH $PS_SQL
        |SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
        |FROM part
        |JOIN ps ON p_partkey = ps_partkey
        |JOIN supplier ON s_suppkey = ps_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
        |  AND r_name = 'ASIA'
        |  AND ps_supplycost = (
        |    SELECT min(ps2.ps_supplycost) FROM ps ps2
        |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "tpch_q9" ->
      s"""WITH $PS_SQL
        |SELECT nation, o_year,
        |       round(sum(cents) / 100.0, 2) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation,
        |         CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |              AS BIGINT)
        |           - CAST(round(ps_supplycost * l_quantity * 100) AS BIGINT)
        |           AS cents
        |  FROM lineitem
        |  JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%gear%')
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,
    "tpch_q11" ->
      s"""WITH $PS_SQL,
        |g AS (
        |  SELECT ps_partkey, sum(ps_supplycost * ps_availqty) AS val
        |  FROM ps
        |  JOIN supplier ON s_suppkey = ps_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |  GROUP BY ps_partkey)
        |SELECT ps_partkey, round(val, 2) AS value FROM g
        |WHERE val > (SELECT 2.0 * avg(val) FROM g)
        |ORDER BY value DESC, ps_partkey LIMIT 50""".stripMargin,
    "tpch_q16" ->
      s"""WITH $PS_SQL
        |SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
        |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                         WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 50""".stripMargin,
    "tpch_q20" ->
      s"""WITH $PS_SQL
        |SELECT s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND s_suppkey IN (
        |    SELECT ps_suppkey FROM ps
        |    WHERE ps_partkey IN (SELECT p_partkey FROM part
        |                         WHERE p_name LIKE 'small%')
        |      AND ps_availqty > (
        |        SELECT 0.5 * sum(l_quantity) FROM lineitem
        |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
        |ORDER BY s_name""".stripMargin,
    "an_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |            AS BIGINT) AS cents
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_linestatus), ())
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
        |         l_linestatus NULLS FIRST""".stripMargin,
    "an_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,
    "an_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "an_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |         AS running_total
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "an_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(coalesce(lag(o_orderkey) OVER w, -1) AS BIGINT)
        |         AS prev_order,
        |       CAST(coalesce(lead(o_orderkey) OVER w, -1) AS BIGINT)
        |         AS next_order,
        |       CAST(first_value(o_orderkey) OVER w AS BIGINT) AS first_order,
        |       round(o_totalprice - lag(o_totalprice) OVER w, 2)
        |         AS delta_price
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "an_zscore" ->
      """WITH ev AS (SELECT event_type, value FROM events),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         sum(value) AS s1, sum(value*value) AS s2
        |       FROM ev GROUP BY event_type),
        |stats AS (SELECT event_type, n, s1/n AS mean,
        |            CASE WHEN n > 1
        |                 THEN sqrt((s2 - s1*s1/n)/(n-1)) END AS sd
        |          FROM st),
        |z AS (SELECT e.event_type, round((e.value - s.mean)/s.sd, 6) AS z
        |      FROM ev e JOIN stats s USING (event_type))
        |SELECT event_type, n, round(mean, 6) AS mean,
        |       round(sd, 6) AS sd,
        |       CAST(count(*) FILTER (abs(z) > 3) AS BIGINT)
        |         AS n_outliers,
        |       round(min(z), 6) AS min_z, round(max(z), 6) AS max_z
        |FROM z JOIN stats USING (event_type)
        |GROUP BY event_type, n, mean, sd
        |ORDER BY event_type""".stripMargin,
    "an_retention" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |    (epoch_ns(ts) // 1000000000) // 604800 AS week FROM events),
        |cohorts AS (SELECT user_id, min(week) AS cohort_week FROM act
        |            GROUP BY user_id),
        |sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
        |          FROM cohorts GROUP BY cohort_week),
        |ret AS (SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
        |               CAST(count(*) AS BIGINT) AS n_active
        |        FROM act a JOIN cohorts c USING (user_id)
        |        WHERE a.week - c.cohort_week BETWEEN 0 AND 3
        |        GROUP BY c.cohort_week, a.week - c.cohort_week)
        |SELECT r.cohort_week, r.week_offset, r.n_active,
        |       CAST(r.n_active * 1000 // s.n_cohort AS BIGINT)
        |         AS retention_pm
        |FROM ret r JOIN sizes s USING (cohort_week)
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "an_funnel" ->
      """WITH v AS (SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t2
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.t1
        |  GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t3
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t2
        |  GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
        |       CAST(count(*) AS BIGINT) AS n_users FROM v
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'click_after_view',
        |       CAST(count(*) AS BIGINT) FROM c
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'purchase_after_click',
        |       CAST(count(*) AS BIGINT) FROM p
        |ORDER BY stage_idx""".stripMargin,
    "an_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tns
        |           FROM events WHERE user_id < 200),
        |m AS (SELECT user_id, event_id, tns,
        |        CASE WHEN lag(tns) OVER w IS NULL
        |               OR tns - lag(tns) OVER w > 1800000000000
        |             THEN 1 ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id
        |                          ORDER BY tns, event_id)),
        |s AS (SELECT user_id, tns,
        |        CAST(sum(new_sess) OVER (PARTITION BY user_id
        |          ORDER BY tns, event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW) AS BIGINT) AS session_idx
        |      FROM m)
        |SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(min(tns) // 1000000000 AS BIGINT) AS start_s,
        |       CAST(max(tns) // 1000000000 AS BIGINT) AS end_s,
        |       CAST((max(tns) - min(tns)) // 1000000000 AS BIGINT)
        |         AS duration_s
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "an_pivot" ->
      """SELECT o_orderpriority,
        |       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS "F",
        |       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS "O",
        |       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS "P"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "an_percentiles" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "an_ntile" ->
      """SELECT c_custkey,
        |       CAST(ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey ASC)
        |            AS BIGINT) AS decile
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "an_unpivot" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT measure, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(val * 100) AS BIGINT)) AS BIGINT)
        |         AS cents
        |FROM u GROUP BY measure ORDER BY measure""".stripMargin,
    "an_kmv_distinct" ->
      s"""WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
        |     h AS (SELECT event_type,
        |                  ${graft.llm.TextOps.hashFracSql("user_id::VARCHAR")}
        |                    AS frac
        |           FROM du),
        |     r AS (SELECT event_type, frac, row_number()
        |             OVER (PARTITION BY event_type ORDER BY frac) AS rn
        |           FROM h),
        |     est AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nh,
        |                    max(frac) AS kth
        |             FROM r WHERE rn <= 64 GROUP BY event_type),
        |     ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
        |            FROM du GROUP BY event_type)
        |SELECT event_type, n_exact,
        |       CASE WHEN nh < 64 THEN nh::DOUBLE
        |            ELSE round(63 / kth, 4) END AS est
        |FROM est JOIN ex USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "an_hll_distinct" ->
      """WITH h AS (SELECT event_type, user_id % 8 AS shard,
        |                  ('0x' || substr(md5(user_id::VARCHAR), 1, 15))
        |                    ::BIGINT AS h
        |           FROM events),
        |     b AS (SELECT event_type, shard,
        |                  h // 18014398509481984 AS bucket,
        |                  h % 18014398509481984 AS r
        |           FROM h),
        |     rh AS (SELECT event_type, shard, bucket,
        |                   CASE WHEN r > 0 THEN 55 - length(bin(r))
        |                        ELSE 55 END AS rho
        |            FROM b),
        |     part AS (SELECT event_type, shard, bucket,
        |                     max(rho) AS reg
        |              FROM rh GROUP BY 1, 2, 3),
        |     merged AS (SELECT event_type, bucket, max(reg) AS reg
        |                FROM part GROUP BY 1, 2),
        |     z AS (SELECT event_type, CAST(count(*) AS BIGINT) AS filled,
        |                  CAST(sum(1::BIGINT << (55 - reg)) AS BIGINT)
        |                    AS zfill
        |           FROM merged GROUP BY 1),
        |     ex AS (SELECT event_type,
        |                   CAST(count(DISTINCT user_id) AS BIGINT)
        |                     AS n_exact
        |            FROM events GROUP BY 1)
        |SELECT z.event_type, n_exact,
        |       CAST(64 - filled AS BIGINT) AS v_zero,
        |       CAST(zfill + (64 - filled) * 36028797018963968 AS BIGINT)
        |         AS z_num,
        |       CASE WHEN 0.709::DOUBLE * 4096 * 36028797018963968::DOUBLE /
        |                    (zfill + (64 - filled) * 36028797018963968)
        |                  <= 160.0 AND filled < 64
        |            THEN round(64.0 * ln(64.0 / (64 - filled)), 4)
        |            ELSE round(0.709::DOUBLE * 4096 * 36028797018963968::DOUBLE /
        |                   (zfill + (64 - filled) * 36028797018963968), 4)
        |       END AS est
        |FROM z JOIN ex USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "an_heavy_hitters" ->
      """WITH ev AS (SELECT user_id FROM events),
        |cm AS (SELECT g.j,
        |         ('0x' || substr(md5('cm' || g.j || ':' || user_id::VARCHAR),
        |            1, 15))::BIGINT % 512 AS cell
        |       FROM ev, generate_series(0, 3) AS g(j)),
        |cells AS (SELECT j, cell, CAST(count(*) AS BIGINT) AS cnt
        |          FROM cm GROUP BY 1, 2),
        |top AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact
        |        FROM ev GROUP BY 1
        |        ORDER BY n_exact DESC, user_id LIMIT 20),
        |tc AS (SELECT t.user_id, t.n_exact, g.j,
        |         ('0x' || substr(md5('cm' || g.j || ':' || t.user_id::VARCHAR),
        |            1, 15))::BIGINT % 512 AS cell
        |       FROM top t, generate_series(0, 3) AS g(j))
        |SELECT user_id, n_exact, min(cnt) AS est
        |FROM tc JOIN cells USING (j, cell)
        |GROUP BY 1, 2
        |ORDER BY n_exact DESC, user_id""".stripMargin,
    "an_corr_matrix" ->
      """WITH li AS (SELECT l_returnflag,
        |         CAST(round(l_quantity * 100) AS BIGINT) AS q,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
        |         CAST(round(l_discount * 100) AS BIGINT) AS dc,
        |         CAST(round(l_tax * 100) AS BIGINT) AS t
        |       FROM lineitem),
        |sums AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |           sum(q) AS s_q, sum(p) AS s_p, sum(dc) AS s_dc,
        |           sum(t) AS s_t,
        |           sum(q::HUGEINT * q) AS s_q_q,
        |           sum(q::HUGEINT * p) AS s_q_p,
        |           sum(q::HUGEINT * dc) AS s_q_dc,
        |           sum(q::HUGEINT * t) AS s_q_t,
        |           sum(p::HUGEINT * p) AS s_p_p,
        |           sum(p::HUGEINT * dc) AS s_p_dc,
        |           sum(p::HUGEINT * t) AS s_p_t,
        |           sum(dc::HUGEINT * dc) AS s_dc_dc,
        |           sum(dc::HUGEINT * t) AS s_dc_t,
        |           sum(t::HUGEINT * t) AS s_t_t
        |         FROM li GROUP BY 1),
        |c AS (SELECT l_returnflag, n::DOUBLE AS nd,
        |        s_q::DOUBLE AS dq, s_p::DOUBLE AS dp, s_dc::DOUBLE AS ddc,
        |        s_t::DOUBLE AS dt,
        |        s_q_q::DOUBLE AS dqq, s_q_p::DOUBLE AS dqp,
        |        s_q_dc::DOUBLE AS dqdc, s_q_t::DOUBLE AS dqt,
        |        s_p_p::DOUBLE AS dpp, s_p_dc::DOUBLE AS dpdc,
        |        s_p_t::DOUBLE AS dpt, s_dc_dc::DOUBLE AS ddcdc,
        |        s_dc_t::DOUBLE AS ddct, s_t_t::DOUBLE AS dtt
        |      FROM sums)
        |SELECT l_returnflag, pr.pair,
        |       round(CASE pr.pair
        |         WHEN 'q_p' THEN (nd*dqp - dq*dp) /
        |           sqrt((nd*dqq - dq*dq) * (nd*dpp - dp*dp))
        |         WHEN 'q_dc' THEN (nd*dqdc - dq*ddc) /
        |           sqrt((nd*dqq - dq*dq) * (nd*ddcdc - ddc*ddc))
        |         WHEN 'q_t' THEN (nd*dqt - dq*dt) /
        |           sqrt((nd*dqq - dq*dq) * (nd*dtt - dt*dt))
        |         WHEN 'p_dc' THEN (nd*dpdc - dp*ddc) /
        |           sqrt((nd*dpp - dp*dp) * (nd*ddcdc - ddc*ddc))
        |         WHEN 'p_t' THEN (nd*dpt - dp*dt) /
        |           sqrt((nd*dpp - dp*dp) * (nd*dtt - dt*dt))
        |         ELSE (nd*ddct - ddc*dt) /
        |           sqrt((nd*ddcdc - ddc*ddc) * (nd*dtt - dt*dt))
        |       END, 6) AS corr
        |FROM c CROSS JOIN (VALUES ('q_p'), ('q_dc'), ('q_t'), ('p_dc'),
        |  ('p_t'), ('dc_t')) AS pr(pair)
        |ORDER BY l_returnflag, pair""".stripMargin,
    "an_ab_ttest" ->
      """WITH ev AS (SELECT event_type, user_id % 2 AS grp,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |       FROM events),
        |g AS (SELECT event_type,
        |        CAST(count(*) FILTER (grp = 0) AS BIGINT) AS n_a,
        |        sum(cents) FILTER (grp = 0) AS sa1,
        |        sum(cents * cents) FILTER (grp = 0) AS sa2,
        |        CAST(count(*) FILTER (grp = 1) AS BIGINT) AS n_b,
        |        sum(cents) FILTER (grp = 1) AS sb1,
        |        sum(cents * cents) FILTER (grp = 1) AS sb2
        |      FROM ev GROUP BY 1),
        |v AS (SELECT *,
        |        (sa2::DOUBLE - sa1::DOUBLE * sa1 / n_a) / (n_a - 1) AS va,
        |        (sb2::DOUBLE - sb1::DOUBLE * sb1 / n_b) / (n_b - 1) AS vb
        |      FROM g),
        |se AS (SELECT *, va / n_a + vb / n_b AS se2 FROM v)
        |SELECT event_type, n_a, n_b,
        |       round(sa1::DOUBLE / n_a / 100.0, 6) AS mean_a,
        |       round(sb1::DOUBLE / n_b / 100.0, 6) AS mean_b,
        |       CASE WHEN n_a > 1 AND n_b > 1 THEN
        |         round((sa1::DOUBLE / n_a / 100.0 - sb1::DOUBLE / n_b / 100.0)
        |           * 100.0 / sqrt(se2), 6) END AS t_stat,
        |       CASE WHEN n_a > 1 AND n_b > 1 THEN
        |         round(se2 * se2 /
        |           ((va / n_a) * (va / n_a) / (n_a - 1) +
        |            (vb / n_b) * (vb / n_b) / (n_b - 1)), 4) END AS df
        |FROM se ORDER BY event_type""".stripMargin,
    "an_quality_report" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS row_count,
        |         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |           AS null_custkey,
        |         sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
        |                  THEN 1 ELSE 0 END) AS bad_price,
        |         sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
        |                  THEN 1 ELSE 0 END) AS bad_status,
        |         sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
        |           AS null_date,
        |         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS distinct_key
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT '01_row_count' AS chk, row_count::DOUBLE AS metric,
        |         CAST(row_count > 0 AS BIGINT) AS ok FROM m
        |  UNION ALL SELECT '02_null_custkey', null_custkey::DOUBLE,
        |         CAST(null_custkey = 0 AS BIGINT) FROM m
        |  UNION ALL SELECT '03_bad_price', bad_price::DOUBLE,
        |         CAST(bad_price = 0 AS BIGINT) FROM m
        |  UNION ALL SELECT '04_bad_status', bad_status::DOUBLE,
        |         CAST(bad_status = 0 AS BIGINT) FROM m
        |  UNION ALL SELECT '05_null_date', null_date::DOUBLE,
        |         CAST(null_date = 0 AS BIGINT) FROM m
        |  UNION ALL SELECT '06_unique_orderkey', distinct_key::DOUBLE,
        |         CAST(distinct_key = row_count AS BIGINT) FROM m)
        |ORDER BY chk""".stripMargin,
    "an_basket_lift" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
        |               FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT oid) AS BIGINT) AS n FROM items),
        |pairs AS (SELECT x.item AS a, y.item AS b,
        |                 CAST(count(*) AS BIGINT) AS c_ab
        |          FROM items x JOIN items y
        |            ON x.oid = y.oid AND x.item < y.item
        |          GROUP BY 1, 2 HAVING count(*) >= 3),
        |supp AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM items
        |         GROUP BY 1)
        |SELECT a, b, c_ab, sa.c AS c_a, sb.c AS c_b,
        |       round(n.n * c_ab * 1.0 / (sa.c * sb.c), 6) AS lift,
        |       round(c_ab * 1.0 / sa.c, 6) AS conf
        |FROM pairs JOIN supp sa ON a = sa.item
        |           JOIN supp sb ON b = sb.item
        |           CROSS JOIN n
        |ORDER BY lift DESC, a, b LIMIT 20""".stripMargin,
    "an_ols" ->
      """WITH li AS (SELECT l_returnflag,
        |              CAST(round(l_quantity * 100) AS BIGINT) AS x,
        |              CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |            FROM lineitem),
        |s AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |        sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx,
        |        sum(y::HUGEINT * y) AS syy
        |      FROM li GROUP BY 1),
        |f AS (SELECT l_returnflag, n,
        |        (n * sxy - sx::HUGEINT * sy)::DOUBLE AS num,
        |        (n * sxx - sx::HUGEINT * sx)::DOUBLE AS dx,
        |        (n * syy - sy::HUGEINT * sy)::DOUBLE AS dy,
        |        sx::DOUBLE AS sxd, sy::DOUBLE AS syd
        |      FROM s)
        |SELECT l_returnflag, n, round(num / dx, 6) AS slope,
        |       round((num / dx) * -1.0 * (sxd / n) + syd / n, 4)
        |         AS intercept,
        |       round(num * num / (dx * dy), 6) AS r2
        |FROM f ORDER BY l_returnflag""".stripMargin,
    "an_ks_test" ->
      """WITH li AS (SELECT l_returnflag AS g,
        |              CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |            FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |vc AS (SELECT c,
        |         CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |           AS c1,
        |         CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |           AS c2
        |       FROM li GROUP BY c),
        |cum AS (SELECT c,
        |          CAST(sum(c1) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
        |            AS BIGINT) AS f1,
        |          CAST(sum(c2) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
        |            AS BIGINT) AS f2
        |        FROM vc),
        |ns AS (SELECT CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END)
        |                AS BIGINT) AS n1,
        |              CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END)
        |                AS BIGINT) AS n2
        |       FROM li),
        |gap AS (SELECT n1, n2,
        |          CAST(max(abs(f1 * n2 - f2 * n1)) AS BIGINT) AS gap
        |        FROM cum CROSS JOIN ns GROUP BY n1, n2),
        |dd AS (SELECT n1, n2, round(gap * 1.0 / (n1 * n2), 6) AS d
        |       FROM gap),
        |lam AS (SELECT *, round(d * sqrt(n1 * 1.0 * n2 / (n1 + n2)), 6)
        |          AS lambda FROM dd)
        |SELECT n1, n2, d, lambda,
        |       round(2.0 * exp(-2.0 * lambda * lambda), 6) AS p_approx
        |FROM lam""".stripMargin,
    "an_bootstrap" ->
      s"""WITH li AS (SELECT l_returnflag,
        |              CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
        |              l_orderkey * 10 + l_linenumber AS rid
        |            FROM lineitem),
        |rs AS (SELECT l_returnflag, c, rid, g.b,
        |         ${graft.llm.TextOps.hashFracSql("'bt' || g.b || ':' || rid")}
        |           AS u
        |       FROM li, generate_series(0, 31) AS g(b)),
        |rk AS (SELECT l_returnflag, b,
        |         CASE WHEN u < 0.3678794412 THEN 0
        |              WHEN u < 0.7357588823 THEN 1
        |              WHEN u < 0.9196986029 THEN 2
        |              WHEN u < 0.9810118431 THEN 3 ELSE 4 END AS k, c
        |       FROM rs),
        |means AS (SELECT l_returnflag, b,
        |            round(sum(k * c) * 1.0 / sum(k), 4) AS mean_b
        |          FROM rk GROUP BY 1, 2),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |             ORDER BY mean_b, b) AS rn FROM means),
        |ci AS (SELECT l_returnflag,
        |         max(CASE WHEN rn = 2 THEN mean_b END) AS lo,
        |         max(CASE WHEN rn = 31 THEN mean_b END) AS hi
        |       FROM ranked GROUP BY 1),
        |exact AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |            round(sum(c) * 1.0 / count(*), 4) AS mean
        |          FROM li GROUP BY 1)
        |SELECT l_returnflag, n, mean, lo, hi
        |FROM exact JOIN ci USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,
    "an_quantile_sketch" ->
      """WITH li AS (SELECT l_returnflag,
        |              CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |            FROM lineitem),
        |bounds AS (SELECT min(c) AS lo, max(c) AS hi FROM li),
        |binned AS (SELECT l_returnflag, c, lo, hi,
        |                  ((c - lo) * 128) // (hi - lo + 1) AS bin
        |           FROM li CROSS JOIN bounds),
        |per_bin AS (SELECT l_returnflag, lo, hi, bin,
        |                   CAST(count(*) AS BIGINT) AS cnt
        |            FROM binned GROUP BY 1, 2, 3, 4),
        |cum AS (SELECT *, CAST(sum(cnt) OVER (PARTITION BY l_returnflag
        |                    ORDER BY bin ROWS UNBOUNDED PRECEDING)
        |                  AS BIGINT) AS cum
        |        FROM per_bin),
        |cum2 AS (SELECT *, cum - cnt AS cum_prev FROM cum),
        |ranks AS (SELECT l_returnflag AS rf, CAST(count(*) AS BIGINT) AS n,
        |                 unnest([500, 900, 990]::BIGINT[]) AS q_pm
        |          FROM li GROUP BY 1),
        |ranks2 AS (SELECT rf, n, q_pm, (q_pm * n + 999) // 1000 AS r
        |           FROM ranks),
        |est AS (SELECT l_returnflag, q_pm, n,
        |               lo + (bin * (hi - lo + 1)) // 128
        |                 + ((r - cum_prev) *
        |                    (((bin + 1) * (hi - lo + 1)) // 128
        |                     - (bin * (hi - lo + 1)) // 128))
        |                   // (cnt + 1) AS est_cents
        |        FROM cum2 JOIN ranks2 ON l_returnflag = rf
        |          AND cum_prev < r AND cum >= r),
        |vc AS (SELECT l_returnflag, c, CAST(count(*) AS BIGINT) AS vn
        |       FROM li GROUP BY 1, 2),
        |vcum AS (SELECT *, CAST(sum(vn) OVER (PARTITION BY l_returnflag
        |                     ORDER BY c ROWS UNBOUNDED PRECEDING)
        |                   AS BIGINT) AS vcum
        |         FROM vc),
        |vcum2 AS (SELECT *, vcum - vn AS vprev FROM vcum),
        |exact AS (SELECT l_returnflag, q_pm, c AS exact_cents
        |          FROM vcum2 JOIN ranks2 ON l_returnflag = rf
        |            AND vprev < r AND vcum >= r)
        |SELECT l_returnflag, q_pm, n, est_cents, exact_cents,
        |       abs(est_cents - exact_cents) AS abs_err
        |FROM est JOIN exact USING (l_returnflag, q_pm)
        |ORDER BY l_returnflag, q_pm""".stripMargin,
    "an_gapfill" ->
      """WITH b AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS dy,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events WHERE user_id < 100
        |  GROUP BY user_id, epoch_ns(ts) // 86400000000000),
        | span AS (SELECT user_id, min(dy) AS d0, max(dy) AS d1
        |          FROM b GROUP BY user_id),
        | dense AS (SELECT user_id, unnest(generate_series(d0, d1)) AS dy
        |           FROM span),
        | j AS (SELECT dense.user_id, dense.dy, b.cents
        |       FROM dense LEFT JOIN b
        |         ON dense.user_id = b.user_id AND dense.dy = b.dy)
        |SELECT user_id, dy,
        |       last_value(cents IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY dy
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS v,
        |       CAST(CASE WHEN cents IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |         AS filled
        |FROM j ORDER BY user_id, dy""".stripMargin,
    "an_seq_match" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_id,
        |                  substr(event_type, 1, 1) AS ch FROM events),
        |     s AS (SELECT user_id,
        |                  string_agg(ch, '' ORDER BY tns, event_id) AS seq
        |           FROM e GROUP BY user_id),
        |     p AS (SELECT * FROM (VALUES
        |             ('bounce_view_only', '^v[^cp]*$'),
        |             ('error_then_purchase', 'e.*p'),
        |             ('funnel_vcp', 'v.*c.*p')) AS t(pattern, re))
        |SELECT pattern,
        |       CAST(sum(CASE WHEN regexp_matches(seq, re)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_users
        |FROM s CROSS JOIN p GROUP BY pattern ORDER BY pattern""".stripMargin,
    "an_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
        |  FROM events GROUP BY event_type),
        | mad AS (
        |  SELECT e.event_type, m.med,
        |         round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
        |  FROM events e JOIN med m USING (event_type)
        |  GROUP BY e.event_type, m.med)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n, m.med, m.mad,
        |       CAST(sum(CASE WHEN abs(e.value - m.med)
        |                          > 3.5 * 1.4826 * m.mad
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM events e JOIN mad m USING (event_type)
        |GROUP BY e.event_type, m.med, m.mad
        |ORDER BY e.event_type""".stripMargin,
    "an_rolling_range" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS dy,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events GROUP BY event_type, epoch_ns(ts) // 86400000000000)
        |SELECT event_type, dy, cents,
        |       CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY dy
        |              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS trail7_cents
        |FROM daily ORDER BY event_type, dy""".stripMargin,
    "an_scd2_build" ->
      """WITH ch AS (SELECT user_id, epoch_us(ts) AS vf,
        |                   max(CAST(round(value * 100) AS BIGINT))
        |                     AS cents
        |            FROM events
        |            WHERE event_type = 'click' AND user_id < 50
        |            GROUP BY 1, 2)
        |SELECT user_id, vf,
        |       lead(vf) OVER (PARTITION BY user_id ORDER BY vf) AS vt,
        |       cents
        |FROM ch ORDER BY user_id, vf""".stripMargin,
    "an_decay_agg" ->
      """WITH ev AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS sec,
        |              CAST(round(value * 100) AS BIGINT) AS cents
        |            FROM events),
        |t AS (SELECT max(sec) AS tmax FROM ev)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(cents * (CAST(1000000 AS BIGINT)
        |              >> least((tmax - sec) // 604800, 62)))
        |            AS BIGINT) AS decayed_score
        |FROM ev CROSS JOIN t GROUP BY user_id ORDER BY user_id""".stripMargin,
    "an_markov" ->
      """WITH seq AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |tr AS (SELECT event_type AS prev_type, next_type,
        |              CAST(count(*) AS BIGINT) AS n
        |       FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |       round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type), 6) AS p
        |FROM tr ORDER BY prev_type, next_type""".stripMargin,
    "an_entropy" ->
      """WITH ct AS (SELECT user_id % 10 AS cohort, event_type,
        |              CAST(count(*) AS BIGINT) AS nt
        |            FROM events GROUP BY 1, 2),
        |pt AS (SELECT cohort, nt,
        |              nt * 1.0 / sum(nt) OVER (PARTITION BY cohort) AS p
        |       FROM ct)
        |SELECT cohort, CAST(sum(nt) AS BIGINT) AS n_events,
        |       CAST(count(*) AS BIGINT) AS n_types,
        |       CAST(sum(CAST(round(-p * ln(p) * 1e6) AS BIGINT)) AS BIGINT)
        |         AS entropy_micronats
        |FROM pt GROUP BY cohort ORDER BY cohort""".stripMargin,
    "an_gini" ->
      """WITH c AS (SELECT c_nationkey, c_custkey,
        |             CAST(round(c_acctbal * 100) AS BIGINT) + 100000 AS x
        |           FROM customer),
        |r AS (SELECT c_nationkey, x,
        |        CAST(row_number() OVER (PARTITION BY c_nationkey
        |               ORDER BY x, c_custkey) AS BIGINT) AS i
        |      FROM c),
        |a AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx,
        |             CAST(sum(i * x) AS BIGINT) AS six
        |      FROM r GROUP BY c_nationkey)
        |SELECT c_nationkey, n,
        |       round(2.0 * six / (n * sx) - (n + 1.0) / n, 6) AS gini
        |FROM a ORDER BY c_nationkey""".stripMargin,
    "an_chi2_indep" ->
      """WITH ct AS (SELECT user_id % 5 AS cohort, event_type,
        |              CAST(count(*) AS BIGINT) AS n
        |            FROM events GROUP BY 1, 2),
        |m AS (SELECT cohort, event_type, n,
        |             sum(n) OVER (PARTITION BY cohort) AS rown,
        |             sum(n) OVER (PARTITION BY event_type) AS coln
        |      FROM ct),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS ntot FROM ct),
        |cells AS (SELECT cohort, event_type, n,
        |            CAST(round(pow(n - rown * coln * 1.0 / ntot, 2)
        |                 / (rown * coln * 1.0 / ntot) * 1e6) AS BIGINT)
        |              AS term_micro
        |          FROM m CROSS JOIN t)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |       CAST(sum(n) AS BIGINT) AS n_obs,
        |       CAST(sum(term_micro) AS BIGINT) AS chi2_micro,
        |       CAST((count(DISTINCT cohort) - 1)
        |            * (count(DISTINCT event_type) - 1) AS BIGINT) AS dof
        |FROM cells""".stripMargin,
    "an_benford" ->
      """WITH ev AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents
        |            FROM events
        |            WHERE event_type = 'purchase'
        |              AND CAST(round(value * 100) AS BIGINT) > 0),
        |dg AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
        |           AS digit FROM ev),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM dg),
        |o AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
        |      FROM dg GROUP BY digit)
        |SELECT digit, n_obs,
        |       CAST(round(log10(1.0 + 1.0 / digit) * 1e6) AS BIGINT)
        |         AS expected_ppm,
        |       round(pow(n_obs - ntot * CAST(round(log10(1.0 + 1.0 / digit)
        |                 * 1e6) AS BIGINT) / 1e6, 2)
        |             / (ntot * CAST(round(log10(1.0 + 1.0 / digit) * 1e6)
        |                 AS BIGINT) / 1e6), 4) AS chi2_term
        |FROM o CROSS JOIN t ORDER BY digit""".stripMargin,
    "an_rfm" ->
      """WITH ev AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS sec,
        |              CAST(round(value * 100) AS BIGINT) AS cents
        |            FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT max(sec) AS tmax FROM ev),
        |a AS (SELECT user_id, tmax - max(sec) AS rec,
        |             CAST(count(*) AS BIGINT) AS freq,
        |             CAST(sum(cents) AS BIGINT) AS mon
        |      FROM ev CROSS JOIN t GROUP BY user_id, tmax),
        |b AS (SELECT quantile_cont(rec, [0.2, 0.4, 0.6, 0.8]) AS rb,
        |             quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS fb,
        |             quantile_cont(mon, [0.2, 0.4, 0.6, 0.8]) AS mb
        |      FROM a)
        |SELECT user_id,
        |  5 - ((rec > round(rb[1],4))::BIGINT + (rec > round(rb[2],4))::BIGINT
        |     + (rec > round(rb[3],4))::BIGINT + (rec > round(rb[4],4))::BIGINT)
        |    AS r_score,
        |  1 + ((freq > round(fb[1],4))::BIGINT + (freq > round(fb[2],4))::BIGINT
        |     + (freq > round(fb[3],4))::BIGINT + (freq > round(fb[4],4))::BIGINT)
        |    AS f_score,
        |  1 + ((mon > round(mb[1],4))::BIGINT + (mon > round(mb[2],4))::BIGINT
        |     + (mon > round(mb[3],4))::BIGINT + (mon > round(mb[4],4))::BIGINT)
        |    AS m_score
        |FROM a CROSS JOIN b ORDER BY user_id""".stripMargin,
    "an_window_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS t
        |            FROM events),
        |v AS (SELECT user_id, t AS t1 FROM ev WHERE event_type = 'view'),
        |c AS (SELECT user_id, t AS t2 FROM ev WHERE event_type = 'click'),
        |p AS (SELECT user_id, t AS t3 FROM ev
        |      WHERE event_type = 'purchase'),
        |vc AS (SELECT v.user_id, t1, t2 FROM v
        |       JOIN c ON v.user_id = c.user_id
        |             AND t2 >= t1 AND t2 <= t1 + 3600000000000),
        |d1 AS (SELECT DISTINCT user_id, 1 AS depth FROM v),
        |d2 AS (SELECT DISTINCT user_id, 2 AS depth FROM vc),
        |d3 AS (SELECT DISTINCT vc.user_id, 3 AS depth FROM vc
        |       JOIN p ON vc.user_id = p.user_id
        |             AND t3 >= t2 AND t3 <= t1 + 3600000000000),
        |u AS (SELECT user_id, max(depth) AS depth FROM (
        |        SELECT * FROM d1 UNION ALL SELECT * FROM d2
        |        UNION ALL SELECT * FROM d3) GROUP BY user_id)
        |SELECT CAST(depth AS BIGINT) AS depth,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM u GROUP BY depth ORDER BY depth""".stripMargin
  )
}
