package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.write.{KVIndex, KVTable}

/** Secondary-index contract (write/KVIndex): lookups equal the
  * full-scan answer, stale pointers left by updates are read-repaired,
  * and deletes can never resurface through the index. */
class KVIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): KVTable =
    KVTable(spark, RepoPaths.target(s"graft_kv_test/$name"), wipe = true)

  private def cells(rows: Seq[(Long, String)], ts: Long) =
    rows.toDF("key", "value").select($"key", lit("F").as("family"),
      lit("color").as("qualifier"), $"value", lit(ts).as("ts"))

  test("lookup equals the full-scan filter, across updates and compaction") {
    val t = freshTable("idx1")
    KVIndex.put(t, "F", "color",
      cells(Seq(1L -> "red", 2L -> "blue", 3L -> "red", 4L -> "green"), 1L))
    // 3 leaves red (stale pointer left behind), 4 joins red
    KVIndex.put(t, "F", "color", cells(Seq(3L -> "blue", 4L -> "red"), 2L))
    t.compact(); KVIndex.indexTable(t, "F", "color").compact()

    def scan(v: String) = t.resolved()
      .filter($"qualifier" === "color" && $"value" === v)
      .select($"key").as[Long].collect().toSet
    def viaIndex(v: String) = KVIndex.lookup(t, "F", "color", lit(v))
      .select($"key").as[Long].collect().toSet

    assert(viaIndex("red") === Set(1L, 4L))
    assert(viaIndex("red") === scan("red"))
    assert(viaIndex("blue") === Set(2L, 3L))
    assert(viaIndex("green") === Set.empty[Long])
  }

  test("a deleted base row never resurfaces through its index entry") {
    val t = freshTable("idx2")
    KVIndex.put(t, "F", "color", cells(Seq(1L -> "red", 2L -> "red"), 1L))
    t.delete(Seq(1L).toDF("key")
      .select($"key", lit(null).cast("string").as("family"),
        lit(null).cast("string").as("qualifier")), ts = 2L)
    assert(KVIndex.lookup(t, "F", "color", lit("red"))
      .select($"key").as[Long].collect().toSet === Set(2L))
  }

  test("hot-value lookup past the broadcast cap falls back to a shuffle join") {
    // a value matching more keys than maxBroadcastKeys must take the
    // non-broadcast path and still return the identical verified set
    val t = freshTable("idx3")
    KVIndex.put(t, "F", "color",
      cells((1L to 8L).map(_ -> "red") :+ (9L -> "blue"), 1L))
    val viaShuffle = KVIndex.lookup(t, "F", "color", lit("red"),
      maxBroadcastKeys = 1).select($"key").as[Long].collect().toSet
    val viaBroadcast = KVIndex.lookup(t, "F", "color", lit("red"))
      .select($"key").as[Long].collect().toSet
    assert(viaShuffle === (1L to 8L).toSet)
    assert(viaShuffle === viaBroadcast)
  }

  test("index entries carry the value for collision re-verification") {
    val idx = KVIndex.indexCells(cells(Seq(7L -> "red"), 1L), "F", "color")
      .as[(Long, String, String, String, Long)].collect()
    assert(idx.length === 1)
    val (h, fam, q, v, ts) = idx.head
    assert(fam === "I" && q === "7" && v === "red" && ts === 1L)
    assert(h >= 0L) // sharedHash is a non-negative 60-bit value
  }
}
