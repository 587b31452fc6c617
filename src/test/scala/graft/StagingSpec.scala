package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

/** Staging.fingerprint must see through NESTED layouts: a
  * hive-partitioned source is directories-of-directories, and a
  * one-level listing that filters directories out would fingerprint
  * every regeneration as the same empty signature — silently reviving
  * the staleness hazard the fingerprint exists to close.
  */
class StagingSpec extends AnyFunSuite with SparkSpec {

  private def write(path: String, content: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes(UTF_8)): Unit
  }

  test("fingerprint flips when a file TWO directory levels deep " +
    "changes, and is stable when nothing does") {
    val root = RepoPaths.target("stagingspec_fp")
    graft.sources.kv.GraftFs.delete(root, recursive = true)
    write(s"$root/status=A/part-0.parquet", "aaaa")
    write(s"$root/status=B/year=2024/part-0.parquet", "bbbb")
    val fp1 = Staging.fingerprint(root)
    assert(fp1 !== "absent")
    // nothing changed → same signature (idempotent listing)
    assert(Staging.fingerprint(root) === fp1)
    // a LENGTH change two levels down must flip the fingerprint even
    // if mtime granularity hides the rewrite
    write(s"$root/status=B/year=2024/part-0.parquet", "bbbb-regenerated")
    val fp2 = Staging.fingerprint(root)
    assert(fp2 !== fp1)
    // the same bytes at a DIFFERENT nested path is a different layout
    val root2 = RepoPaths.target("stagingspec_fp2")
    graft.sources.kv.GraftFs.delete(root2, recursive = true)
    write(s"$root2/status=A/part-0.parquet", "aaaa")
    write(s"$root2/status=C/year=2024/part-0.parquet", "bbbb")
    assert(Staging.fingerprint(root2) !== fp1)
  }

  test("fingerprint skips dot-files at any depth and flat files still " +
    "fingerprint by name+length") {
    val root = RepoPaths.target("stagingspec_fp3")
    graft.sources.kv.GraftFs.delete(root, recursive = true)
    write(s"$root/part-0.parquet", "data")
    val base = Staging.fingerprint(root)
    // markers/CRCs must not perturb the signature (the staging marker
    // itself lives inside many artifact dirs)
    write(s"$root/.part-0.parquet.crc", "crc")
    write(s"$root/.hidden/deep.txt", "x")
    assert(Staging.fingerprint(root) === base)
    write(s"$root/part-1.parquet", "data2")
    assert(Staging.fingerprint(root) !== base)
  }

  test("Materialize.eager: persist mode returns the same rows with " +
    "lineage KEPT (recomputable), default mode truncates lineage") {
    import spark.implicits._
    val src = Seq(1L, 2L, 3L).toDF("x")
    val dflt = Materialize.eager(src.select(($"x" * 2).as("y")))
    // default = localCheckpoint: lineage is a checkpoint scan
    assert(dflt.rdd.toDebugString.contains("Checkpoint"))
    assert(dflt.orderBy($"y").as[Long].collect().toSeq === Seq(2L, 4L, 6L))
    spark.conf.set("spark.graft.materialize", "persist")
    try {
      val p = Materialize.eager(src.select(($"x" * 2).as("y")))
      assert(p.orderBy($"y").as[Long].collect().toSeq === Seq(2L, 4L, 6L))
      // lineage kept: a lost block would recompute from source
      assert(!p.rdd.toDebugString.contains("Checkpoint"))
      p.unpersist(): Unit
    } finally spark.conf.unset("spark.graft.materialize")
  }
}
