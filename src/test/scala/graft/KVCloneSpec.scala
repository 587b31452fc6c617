package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.write.KVTable

/** Zero-copy clone contract (KVTable.cloneTo): the clone snapshots the
  * source's state (compacted generation + live log) by hard link, and
  * the two evolve independently afterwards — including across a source
  * compaction that RETIRES the linked generation's files. */
class KVCloneSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fresh(name: String): KVTable =
    KVTable(spark, RepoPaths.target(s"graft_kv_test/$name"), wipe = true)

  private def cells(rows: Seq[(Long, Long)], ts: Long) =
    rows.toDF("key", "v").select($"key", lit("F").as("family"),
      lit("x").as("qualifier"), $"v".cast("string").as("value"),
      lit(ts).as("ts"))

  private def state(t: KVTable): Map[Long, Long] =
    t.resolved().select($"key", $"value".cast("long"))
      .as[(Long, Long)].collect().toMap

  test("clone snapshots compacted + live log; source divergence and " +
    "generation pruning never reach it") {
    val src = fresh("clone_src")
    src.put(cells(Seq(1L -> 10L, 2L -> 20L, 3L -> 30L), 1L))
    src.compact()
    src.put(cells(Seq(2L -> 21L), 2L)) // live log on top
    val clone = src.cloneTo(RepoPaths.target("graft_kv_test/clone_dst"))
    val snapshot = Map(1L -> 10L, 2L -> 21L, 3L -> 30L)
    assert(state(clone) === snapshot)

    // diverge the source: new write + compaction (retires the linked
    // generation's files — the clone's links must keep the bytes alive)
    src.put(cells(Seq(1L -> 99L, 4L -> 40L), 3L))
    src.compact()
    assert(state(src) === Map(1L -> 99L, 2L -> 21L, 3L -> 30L, 4L -> 40L))
    assert(state(clone) === snapshot, "source divergence leaked into clone")
  }

  test("clone mutations never reach the source") {
    val src = fresh("clone_src2")
    src.put(cells(Seq(1L -> 1L, 2L -> 2L), 1L))
    src.compact()
    val clone = src.cloneTo(RepoPaths.target("graft_kv_test/clone_dst2"))
    clone.put(cells(Seq(1L -> 111L, 9L -> 9L), 2L))
    clone.compact()
    assert(state(clone) === Map(1L -> 111L, 2L -> 2L, 9L -> 9L))
    assert(state(src) === Map(1L -> 1L, 2L -> 2L))
  }

  test("restoreAsOf rolls back later versions AND tombstones; a wrong " +
    "restore is itself restorable") {
    val t = fresh("restore1")
    t.put(cells(Seq(1L -> 10L, 2L -> 20L, 3L -> 30L), 1L))
    t.compact()
    t.put(cells(Seq(1L -> 999L), 2L)) // corruption
    t.delete(Seq(2L).toDF("key")
      .select($"key", lit(null).cast("string").as("family"),
        lit(null).cast("string").as("qualifier")), ts = 3L)
    assert(state(t) === Map(1L -> 999L, 3L -> 30L))
    t.restoreAsOf(1L)
    assert(state(t) === Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
    // life continues on the restored base, and a too-aggressive
    // restore target still yields the retained as-of view
    t.put(cells(Seq(4L -> 40L), 4L))
    t.restoreAsOf(1L) // drops key 4 again
    assert(state(t) === Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
  }

  test("cloning an uncompacted (log-only) table links just the log") {
    val src = fresh("clone_src3")
    src.put(cells(Seq(5L -> 50L), 1L))
    val clone = src.cloneTo(RepoPaths.target("graft_kv_test/clone_dst3"))
    assert(state(clone) === Map(5L -> 50L))
    src.put(cells(Seq(5L -> 51L), 2L))
    assert(state(clone) === Map(5L -> 50L))
  }
}
