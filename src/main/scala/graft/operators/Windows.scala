package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.5 window / sort / top-k surface (SURVEY.md).
  *
  * The reference has no frame-based windows; its ranking idioms
  * (representative election, qualifier-order max) become `Window` +
  * `row_number`/`max` here, and its collect-then-look-at-it patterns
  * become `TakeOrderedAndProject` (orderBy.limit) — which at 100 TB does a
  * per-partition top-k and only ships k rows per partition to the driver.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // W1: representative election — top-1-per-group (Key.highest,
    // Key.scala:36-50): richest customer per nation.
    "w1_top1_per_group" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey")
        .orderBy($"c_acctbal".desc, $"c_custkey".asc)
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"c_nationkey", $"c_custkey", $"c_acctbal")
        .orderBy($"c_nationkey")
    }),

    // W4: global sort before export (AGraph.scala:61 sortByKey).
    "w4_global_sort" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_custkey").agg(round(sum($"o_totalprice"), 2).as("spent"))
        .orderBy($"spent".desc, $"o_custkey".asc)
    }),

    // W5: repartition-by-range + sort-within-partitions
    // (HBaseTable.scala:219-242, the bulk-write shuffle). The physical
    // range-partitioned sort runs for real; the emitted rank is computed
    // per explicit bucket so the result is partition-count independent.
    "w5_sort_within_partitions" -> ((s, d) => {
      import s.implicits._
      val bucketed = Tables.orders(s, d)
        .withColumn("bucket", floor($"o_orderkey" / 2000))
      val sorted = bucketed
        .repartitionByRange(8, $"bucket")
        .sortWithinPartitions($"bucket", $"o_orderkey")
      sorted
        .withColumn("rn", row_number().over(
          Window.partitionBy($"bucket").orderBy($"o_orderkey")))
        .filter($"rn" <= 3)
        .select($"bucket", $"rn".cast("long").as("rn"), $"o_orderkey")
        .orderBy($"bucket", $"rn")
    }),

    // W6: top-k (absent in the reference — collect was used;
    // DemoSimpleApp.scala:66-106): orderBy.limit = TakeOrderedAndProject.
    "w6_topk" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(100)
        .select($"o_orderkey", $"o_totalprice")
    }),

    // W7 (extra): distribution-rank windows — rank / percent_rank /
    // cume_dist per partition, the "where does this row sit in its
    // group" surface (absent in the reference). The tiebreaking
    // ORDER BY is unique (acctbal, custkey) so every rank function is
    // deterministic; percent_rank/cume_dist are exact int/int double
    // divisions. Partitioned windows only — but note the partition key
    // here (nation) is LOW-cardinality: at 100 TB each nation is one
    // task's sort, so a production run over few huge groups would use
    // the an_ntile two-pass shape (bin count + bounded offsets)
    // instead; this query is the per-group-rank semantics contract.
    "w7_rank_stats" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey")
        .orderBy($"c_acctbal", $"c_custkey")
      Tables.customer(s, d)
        .filter($"c_nationkey" < 5)
        .select($"c_nationkey", $"c_custkey", $"c_acctbal",
          rank().over(w).cast("long").as("rnk"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy($"c_nationkey", $"c_custkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "w1_top1_per_group" ->
      """SELECT c_nationkey, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |         row_number() OVER (PARTITION BY c_nationkey
        |                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer) WHERE rn = 1 ORDER BY c_nationkey""".stripMargin,
    "w4_global_sort" ->
      """SELECT o_custkey, round(sum(o_totalprice), 2) AS spent FROM orders
        |GROUP BY o_custkey ORDER BY spent DESC, o_custkey ASC""".stripMargin,
    "w5_sort_within_partitions" ->
      """SELECT bucket, rn, o_orderkey FROM (
        |  SELECT CAST(floor(o_orderkey / 2000) AS BIGINT) AS bucket,
        |         o_orderkey,
        |         row_number() OVER (PARTITION BY floor(o_orderkey / 2000)
        |                            ORDER BY o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY bucket, rn""".stripMargin,
    "w6_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "w7_rank_stats" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |       CAST(rank() OVER w AS BIGINT) AS rnk,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cume
        |FROM customer WHERE c_nationkey < 5
        |WINDOW w AS (PARTITION BY c_nationkey
        |             ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin
  )
}
