package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: the flagship entry answers on sf0.001. */
class EntrySpec extends AnyFunSuite with SparkSpec {
  test("entry returns rows with the expected shape") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq === Seq("l_returnflag", "l_linestatus", "sum_qty",
      "revenue", "n_customers", "n_rows"))
    assert(df.count() > 0)
  }

  test("every query has either an oracle or a documented reason") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
