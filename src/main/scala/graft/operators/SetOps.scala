package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.6 set operations (SURVEY.md). The reference only had array-level
  * set algebra inside graph code (SO1/SO3/SO5 — covered with the graph
  * operators); relational UNION/INTERSECT/EXCEPT are native Spark and
  * exposed here.
  */
object SetOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // SO2: set-union per key (HGraphTable.scala:131-135 reduceByKey(++)):
    // collect_set of order statuses per customer.
    "so2_collect_set" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(array_join(array_sort(collect_set($"o_orderstatus")), ",")
          .as("statuses"))
        .orderBy($"o_custkey")
    }),

    // SO3: intersection — building-segment customers ∩ big spenders.
    "so3_intersect" -> ((s, d) => {
      import s.implicits._
      val a = Tables.customer(s, d)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val b = Tables.orders(s, d)
        .filter($"o_totalprice" > 5000.0)
        .select($"o_custkey".as("c_custkey"))
      a.intersect(b).orderBy($"c_custkey")
    }),

    // SO4: difference (README.md:152 unknown-words idiom) — EXCEPT.
    "so4_except" -> ((s, d) => {
      import s.implicits._
      val a = Tables.customer(s, d)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val b = Tables.orders(s, d).filter($"o_totalprice" > 3000.0)
        .select($"o_custkey".as("c_custkey"))
      a.except(b).orderBy($"c_custkey")
    }),

    // Relational UNION (native Spark, exceeds reference surface).
    "so6_union" -> ((s, d) => {
      import s.implicits._
      val hi = Tables.customer(s, d).filter($"c_acctbal" > 9900.0)
        .select($"c_custkey", lit("hi").as("tier"))
      val lo = Tables.customer(s, d).filter($"c_acctbal" < -900.0)
        .select($"c_custkey", lit("lo").as("tier"))
      hi.unionByName(lo).orderBy($"c_custkey", $"tier")
    })
  )

  val oracles: Map[String, String] = Map(
    "so2_collect_set" ->
      """SELECT o_custkey,
        |       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
        |         AS statuses
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "so3_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 5000.0
        |ORDER BY c_custkey""".stripMargin,
    "so4_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 3000.0
        |ORDER BY c_custkey""".stripMargin,
    "so6_union" ->
      """SELECT c_custkey, 'hi' AS tier FROM customer WHERE c_acctbal > 9900.0
        |UNION ALL
        |SELECT c_custkey, 'lo' AS tier FROM customer WHERE c_acctbal < -900.0
        |ORDER BY c_custkey, tier""".stripMargin
  )
}
