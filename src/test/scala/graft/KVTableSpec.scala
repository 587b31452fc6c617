package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.write.KVTable

/** Cell-store semantics (SURVEY.md §7.4 hard part 1: latest-version
  * cells + timestamped puts + delete tombstones). */
class KVTableSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def cells(rows: (Long, String, String, String, Long)*) =
    rows.toDF("key", "family", "qualifier", "value", "ts")

  private def fresh(name: String) =
    KVTable(spark, s"/root/repo/target/graft_kv_test/$name", wipe = true)

  test("latest ts wins regardless of write order") {
    val t = fresh("latest")
    t.put(cells((1L, "F", "a", "new", 5L)))
    t.put(cells((1L, "F", "a", "stale", 3L))) // arrives later, older ts
    val got = t.resolved().select($"value").as[String].collect()
    assert(got.toSeq === Seq("new"))
  }

  test("row tombstone masks all cells at or below its ts, not newer ones") {
    val t = fresh("rowdel")
    t.put(cells((1L, "F", "a", "x", 1L), (1L, "T", "b", "y", 1L)))
    t.delete(Seq((1L, Option.empty[String], Option.empty[String]))
      .toDF("key", "family", "qualifier"), ts = 2L)
    assert(t.resolved().count() === 0)
    t.put(cells((1L, "F", "a", "reborn", 3L))) // write after delete
    val got = t.resolved().select($"value").as[String].collect()
    assert(got.toSeq === Seq("reborn"))
  }

  test("family and cell tombstones are scoped") {
    val t = fresh("famdel")
    t.put(cells((1L, "F", "a", "fa", 1L), (1L, "F", "b", "fb", 1L),
      (1L, "T", "c", "tc", 1L)))
    t.delete(Seq((1L, Some("F"), Option.empty[String]))
      .toDF("key", "family", "qualifier"), ts = 2L)
    val live = t.resolved().select($"family", $"qualifier", $"value")
      .as[(String, String, String)].collect().toSet
    assert(live === Set(("T", "c", "tc")))
    t.delete(Seq((1L, Some("T"), Some("c")))
      .toDF("key", "family", "qualifier"), ts = 3L)
    assert(t.resolved().count() === 0)
  }

  test("increment merges deltas and skips zeros") {
    val t = fresh("incr")
    t.increment(Seq((1L, "C", "n", 5L), (1L, "C", "n", 3L), (2L, "C", "n", 0L))
      .toDF("key", "family", "qualifier", "delta"), ts = 1L)
    t.increment(Seq((1L, "C", "n", -2L))
      .toDF("key", "family", "qualifier", "delta"), ts = 2L)
    val got = t.resolved().select($"key", $"value".cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 6L)) // zero delta for key 2 never materializes
  }

  test("compact preserves resolved state and drops masked versions") {
    val t = fresh("compact")
    t.put(cells((1L, "F", "a", "v1", 1L), (1L, "F", "a", "v2", 2L),
      (2L, "F", "a", "w", 1L)))
    t.delete(Seq((2L, Option.empty[String], Option.empty[String]))
      .toDF("key", "family", "qualifier"), ts = 2L)
    val before = t.resolved().select($"key", $"value")
      .as[(Long, String)].collect().toSet
    t.compact()
    val after = t.resolved().select($"key", $"value")
      .as[(Long, String)].collect().toSet
    assert(before === after)
    assert(after === Set((1L, "v2")))
    // physical: only live cells remain in the log
    assert(t.cells.count() === 1)
  }
}
