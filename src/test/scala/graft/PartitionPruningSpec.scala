package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Disk-layout partition pruning — the engine's answer to the
  * reference's keyspace-restricted scans (HBaseRDDKS): a table written
  * `partitionBy(keyspace)` serves keyspace queries by touching only the
  * matching directories.
  */
class PartitionPruningSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("filter on the partition column prunes at planning time") {
    val path = targetPath("graft_part/events_by_type")
    Tables.events(spark, sf).write.mode("overwrite")
      .partitionBy("event_type").parquet(path)
    val q = spark.read.parquet(path)
      .filter($"event_type" === "error")
      .select($"event_id", $"user_id")
    val scan = q.queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val pf = scan.metadata.getOrElse("PartitionFilters", "")
    assert(pf.contains("event_type"), s"no partition filter: $pf")
    // only the matching partition's files are selected
    assert(scan.relation.location.inputFiles.forall(_.contains("event_type=")))
    val exp = Tables.events(spark, sf)
      .filter($"event_type" === "error").count()
    assert(q.count() === exp)
  }

  test("fingerprint is order-sensitive, token-content-faithful") {
    val a = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val fps = a.select($"doc_id",
        graft.llm.TextOps.fingerprint(graft.llm.TextOps.words($"text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) === fps(3L)) // same content, same fingerprint
    assert(fps(1L) !== fps(2L)) // reordered tokens, different fingerprint
  }
}
