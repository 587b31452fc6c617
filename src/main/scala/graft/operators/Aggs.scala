package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.4 aggregations — relational subset (graph-shaped aggregations A2-A6,
  * A8, A10, A13 live in graft.graph.GraphOps). All are hash aggregations
  * with map-side partial combine: at 100 TB the shuffle carries only
  * (groups × partial states), not rows.
  */
object Aggs {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A1 `hist` (AGraph.scala:61): value-frequency histogram.
    "a1_hist" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_quantity").agg(count(lit(1)).as("n"))
        .orderBy($"l_quantity")
    }),

    // A7 overlay aggregate (AGraph.scala:281-301): two-level — per-group
    // (count, combine) then one global (groups, members, aggregate) row.
    "a7_overlay_agg" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n"), sum($"o_totalprice").as("tot"))
        .agg(count(lit(1)).as("n_groups"), sum($"n").as("n_members"),
             round(sum($"tot"), 2).as("aggregate"))
    }),

    // A9 `distribution` (RDDUtils.scala:27-45): rows per key-range bucket
    // (the deterministic analogue of rows-per-region diagnostics).
    "a9_distribution" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy(floor($"o_orderkey" / 1000).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"bucket")
    }),

    // A11 `increment` (HBaseTable.scala:157-179): counter adds merged per
    // key; zero deltas are skipped (visible in the applied-increment count).
    "a11_increment" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .filter($"value" =!= 0.0) // reference skips zero deltas
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_inc"), round(sum($"value"), 4).as("counter"))
        .orderBy($"user_id")
    }),

    // A12 `CellCount` (HBaseTableSimple.scala:45-54): per-row cell count
    // across families — part modeled as F={size,retail}, T=name words,
    // S={price} ⇒ 3 + |words|.
    "a12_cell_count" -> ((s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .select($"p_partkey",
          (lit(3) + size(split($"p_name", " "))).cast("long").as("n_cells"))
        .orderBy($"p_partkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "a1_hist" ->
      """SELECT l_quantity, CAST(count(*) AS BIGINT) AS n FROM lineitem
        |GROUP BY l_quantity ORDER BY l_quantity""".stripMargin,
    "a7_overlay_agg" ->
      """WITH g AS (SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS tot
        |           FROM orders GROUP BY o_custkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |       CAST(sum(n) AS BIGINT) AS n_members,
        |       round(sum(tot), 2) AS aggregate
        |FROM g""".stripMargin,
    "a9_distribution" ->
      """SELECT CAST(floor(o_orderkey / 1000) AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "a11_increment" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_inc,
        |       round(sum(value), 4) AS counter
        |FROM events WHERE value <> 0.0
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a12_cell_count" ->
      """SELECT p_partkey,
        |       3 + len(string_split(p_name, ' ')) AS n_cells
        |FROM part ORDER BY p_partkey""".stripMargin
  )
}
