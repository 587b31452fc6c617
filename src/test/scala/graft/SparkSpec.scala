package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (TestSparkContext.scala:5-17
  * parity in the reference). */
trait SparkSpec {
  lazy val spark: SparkSession = GraftSession.local("4")
  lazy val sf: String = "/root/testdata/sf0.001"
  /** Checkout-relative scratch path — suites must not assume the repo
    * lives at one absolute location. */
  def targetPath(rel: String): String = RepoPaths.target(rel)
}
