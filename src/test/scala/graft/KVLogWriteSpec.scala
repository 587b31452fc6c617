package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.kv.{GraftFs, KVLogWrite, KVLogWriterFactory, KVLogFile}

/** The DSv2 append path's two-phase commit, exercised at the task level
  * where failure injection is deterministic: files written under the
  * dot-prefixed inflight dir must be invisible to readers until JOB
  * commit, an aborted task's file must never become visible, and commit
  * must land exactly the committed tasks' rows in `log/`.
  */
class KVLogWriteSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def cell(key: Long, value: String, ts: Long) =
    new GenericInternalRow(Array[Any](key, UTF8String.fromString("f"),
      UTF8String.fromString("q"), UTF8String.fromString(value), ts, null))

  test("inflight files are reader-invisible; commit publishes, abort cleans") {
    val path = new java.io.File(targetPath("graft_kv_test/logwrite"))
      .getAbsolutePath
    GraftFs.delete(path, recursive = true)
    val inflight = s"$path/log/.inflight-qtest"
    val factory = new KVLogWriterFactory(inflight)

    // task 0 commits two cells
    val w0 = factory.createWriter(0, 100L)
    w0.write(cell(1L, "a", 10L)); w0.write(cell(2L, "b", 11L))
    val msg0 = w0.commit().asInstanceOf[KVLogFile]
    // task 1 (a failed/speculative attempt) writes then aborts
    val w1 = factory.createWriter(1, 101L)
    w1.write(cell(3L, "GHOST", 12L))
    w1.abort()

    // before job commit: nothing in the log listing — the inflight dir
    // is a directory (filtered) and its files are not direct children
    assert(GraftFs.dataFiles(s"$path/log").isEmpty,
      "inflight data leaked into the readable listing")

    val job = new KVLogWrite(path, "qtest")
    job.commit(Array(msg0))

    val published = GraftFs.dataFiles(s"$path/log")
    assert(published.map(_.name) === Seq(msg0.name))
    assert(!GraftFs.exists(inflight), "inflight dir must be cleaned up")

    // the published file reads back through the same schema the library
    // write path uses — including the aborted row being absent
    val rows = spark.read
      .schema(graft.write.KVTable.CELL_SCHEMA_DDL)
      .parquet(s"$path/log")
      .select($"key", $"value", $"ts").as[(Long, String, Long)]
      .collect().toSet
    assert(rows === Set((1L, "a", 10L), (2L, "b", 11L)))
  }

  test("job abort removes the inflight dir and publishes nothing") {
    val path = new java.io.File(targetPath("graft_kv_test/logwrite_abort"))
      .getAbsolutePath
    GraftFs.delete(path, recursive = true)
    val inflight = s"$path/log/.inflight-qabort"
    val w = new KVLogWriterFactory(inflight).createWriter(0, 1L)
    w.write(cell(9L, "x", 1L))
    val msg = w.commit()
    new KVLogWrite(path, "qabort").abort(Array(msg))
    assert(!GraftFs.exists(inflight))
    assert(GraftFs.dataFiles(s"$path/log").isEmpty)
  }
}
