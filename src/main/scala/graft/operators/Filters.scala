package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.2 projections / filters / predicates (SURVEY.md).
  *
  * Every reference filter became a server-side HBase Filter on one scan
  * (HBaseRDDFiltered.scala:8-15 composition); here every predicate is a
  * Catalyst `Column` expression — `CombineFilters` fuses chains, pushdown
  * moves them into the parquet scan, so filter cost at 100 TB is paid at
  * the storage layer, never in a shuffle.
  */
object Filters {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // P1: projection with the reference's implicit not-null drop: selecting
    // a qualifier adds filterIfMissing (HBaseRDDFunctions.scala:54-70), so
    // rows without the column vanish — inner-select semantics.
    "p1_project_notnull" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"event_id",
          when($"event_type" === "error", $"props").as("err_props"))
        .filter($"err_props".isNotNull) // filterIfMissing semantics
        .orderBy($"event_id")
    }),

    // P2: typed multi-select of up to 4 transformations
    // (HBaseTable.scala:67-98) — scan pruned to the union of their columns.
    "p2_multi_select" -> ((s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .select($"p_partkey", $"p_name", $"p_size", $"p_retailprice")
        .orderBy($"p_partkey")
    }),

    // P3: typed comparison predicates (ColumnTransformation.scala:32-51).
    "p3_typed_predicate" -> ((s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .filter($"p_size" > 30 && $"p_type" === "ECONOMY")
        .select($"p_partkey", $"p_size", $"p_type")
        .orderBy($"p_partkey")
    }),

    // P4: map-key membership on a family map
    // (FamilyTransformation.scala:48-66 `contains`): per-customer
    // status→count map, keep rows whose map has key 'P'.
    "p4_map_contains" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_custkey", $"o_orderstatus").agg(count(lit(1)).as("cnt"))
        .groupBy($"o_custkey")
        .agg(map_from_entries(collect_list(struct($"o_orderstatus", $"cnt")))
          .as("status_map"))
        .filter(map_contains_key($"status_map", lit("P")))
        .select($"o_custkey", element_at($"status_map", "P").as("p_orders"))
        .orderBy($"o_custkey")
    }),

    // P5: set-membership on a qualifier-set "Tags" family
    // (HBaseTableSimple.scala:57-67): word-set of the document text.
    "p5_tags_contains" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("tags", array_distinct(split(trim($"text"), " ")))
        .filter(array_contains($"tags", "spark"))
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }),

    // P6: time-range filter (HBaseRDDFunctions.scala:39-46 setTimeRange).
    "p6_time_range" -> ((s, d) => {
      import s.implicits._
      // Range comparison directly on the nanos column, NOT on
      // `ts DIV 1e9`: arithmetic over the column blocks filter
      // translation, a plain range lands in PushedFilters and prunes
      // parquet row groups by min/max — the setTimeRange analogue. On
      // engine-written events (KV logs, staged stream dirs — always
      // Long ts) this reaches the scan; the driver's NTZ-typed file
      // pays one boundary conversion (Tables.events) instead.
      Tables.events(s, d)
        .filter($"ts" >= 1704070800L * 1000000000L &&
                $"ts" <  1704157200L * 1000000000L)
        .groupBy($"event_type").agg(count(lit(1)).as("n"))
        .orderBy($"event_type")
    }),

    // P7: consistency hint (HBaseRDDFunctions.scala:33-37) — a storage
    // read-consistency flag with no relational meaning; identity here.
    "p7_consistency_noop" -> ((s, d) => {
      import s.implicits._
      Tables.nation(s, d).orderBy($"n_nationkey")
    }),

    // P8: Bernoulli sample (HBaseRDDFunctions.scala:48-52 RandomRowFilter).
    // Deterministic multiplicative-hash variant so the oracle can replay
    // it; the library also exposes df.sample(p) for the statistical path.
    "p8_sample" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .filter(($"o_orderkey" * 2654435761L) % 100 < 10)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

    // P9: fuzzy keyspace filter (HBaseRDDKS.scala:30-38): restrict a
    // mixed-keyspace pair set to one keyspace (vertex ids encode the
    // space in the low bit: order=2k, part=2k+1).
    "p9_fuzzy_keyspace" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val fwd = li.select(($"l_orderkey" * 2).as("src"),
                          ($"l_partkey" * 2 + 1).as("dst"))
      val pairs = fwd.union(fwd.select($"dst".as("src"), $"src".as("dst")))
      pairs.filter($"src" % 2 === 1)
        .groupBy($"src").agg(count(lit(1)).as("n"))
        .orderBy($"src")
    }),

    // P10: filter composition — chained filters fuse into one scan
    // (HBaseRDD.scala:39-42, CombineFilters does this natively).
    "p10_filter_fusion" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_quantity" < 10.0)
        .filter($"l_discount" > 0.03)
        .filter($"l_returnflag" === "R")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
        .orderBy($"l_orderkey", $"l_linenumber")
    })
  )

  val oracles: Map[String, String] = Map(
    "p1_project_notnull" ->
      """SELECT event_id, props AS err_props FROM events
        |WHERE event_type = 'error' ORDER BY event_id""".stripMargin,
    "p2_multi_select" ->
      """SELECT p_partkey, p_name, p_size, p_retailprice FROM part
        |ORDER BY p_partkey""".stripMargin,
    "p3_typed_predicate" ->
      """SELECT p_partkey, p_size, p_type FROM part
        |WHERE p_size > 30 AND p_type = 'ECONOMY' ORDER BY p_partkey""".stripMargin,
    "p4_map_contains" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS p_orders FROM orders
        |WHERE o_orderstatus = 'P' GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "p5_tags_contains" ->
      """SELECT doc_id, lang FROM documents
        |WHERE list_contains(string_split(trim(text), ' '), 'spark')
        |ORDER BY doc_id""".stripMargin,
    "p6_time_range" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events
        |WHERE epoch_ns(ts) // 1000000000 >= 1704070800
        |  AND epoch_ns(ts) // 1000000000 < 1704157200
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "p7_consistency_noop" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "p8_sample" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE (o_orderkey * 2654435761) % 100 < 10 ORDER BY o_orderkey""".stripMargin,
    "p9_fuzzy_keyspace" ->
      """WITH pairs AS (
        |  SELECT l_orderkey*2 AS src, l_partkey*2+1 AS dst FROM lineitem
        |  UNION ALL
        |  SELECT l_partkey*2+1 AS src, l_orderkey*2 AS dst FROM lineitem)
        |SELECT src, CAST(count(*) AS BIGINT) AS n FROM pairs
        |WHERE src % 2 = 1 GROUP BY src ORDER BY src""".stripMargin,
    "p10_filter_fusion" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_quantity < 10.0 AND l_discount > 0.03 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
