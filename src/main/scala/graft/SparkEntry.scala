package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one named entry per implemented operator from
  * SURVEY.md §2 (ids s1…, p1…, j1…, a1…, w1…, so1…, f1…, m1…, g1…, plus
  * llm_* training-data-pipeline extras); `oracleSql` holds the DuckDB
  * equivalent over the same parquet tables. Column names and row order are
  * aligned on both sides (every query ends in a deterministic ORDER BY).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (TPC-H Q1-flavored pricing
    * summary over the lineitem/orders join); driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"),
        countDistinct($"o_custkey").as("n_customers"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Scans.queries ++
    operators.Filters.queries ++
    operators.Joins.queries ++
    operators.Aggs.queries ++
    operators.Windows.queries ++
    operators.SetOps.queries ++
    operators.Analytics.queries ++
    graph.GraphQueries.queries ++
    write.WriteQueries.queries ++
    functions.CodecQueries.queries ++
    llm.LlmQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Scans.oracles ++
    operators.Filters.oracles ++
    operators.Joins.oracles ++
    operators.Aggs.oracles ++
    operators.Windows.oracles ++
    operators.SetOps.oracles ++
    operators.Analytics.oracles ++
    graph.GraphQueries.oracles ++
    write.WriteQueries.oracles ++
    functions.CodecQueries.oracles ++
    llm.LlmQueries.oracles
}
