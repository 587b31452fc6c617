package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.AnnStore

/** AnnStore lifecycle: build-once, catalog re-registration (the branch
  * every FRESH JVM takes — Verify and Bench sessions — since Spark's
  * in-memory catalog forgets tables), and recipe-tag invalidation.
  */
class AnnStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("ensure builds once, re-registers after catalog loss with the " +
    "bucketed scan intact, and rebuilds on a recipe-tag change") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val name = "graft_annstore_spec_t1"
    var builds = 0
    def build() = {
      builds += 1
      Seq((1L, 10L), (2L, 20L), (3L, 10L)).toDF("id", "key")
    }
    def read(tag: String) =
      AnnStore.ensure(spark, name, buckets = 4, clusterCols = Seq("key"),
        tag = tag)(build())
    val first = read("v1").orderBy($"id").collect()
    assert(builds === 1)
    // second call: marker + catalog entry present — no rebuild
    val second = read("v1").orderBy($"id").collect()
    assert(builds === 1 && second === first)
    // simulate a fresh JVM: catalog forgets the table, files+marker stay
    spark.sql(s"DROP TABLE $name")
    val third = read("v1")
    assert(builds === 1, "re-registration must not rebuild")
    assert(third.orderBy($"id").collect() === first)
    // the re-registered table still plans a BUCKETED scan
    val scan = third.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }
    assert(scan.exists(_.relation.bucketSpec.exists(_.numBuckets == 4)),
      third.queryExecution.executedPlan.toString.take(1000))
    // recipe-tag change invalidates and rebuilds
    read("v2")
    assert(builds === 2, "tag change must rebuild")
  }
}
