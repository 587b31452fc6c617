package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

/** Edge semantics of the temporal joins (j10/j11 cover the bulk via
  * the DuckDB oracle; these pin the boundary rules on crafted rows). */
class TemporalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("asofJoin: equal-ts right row included, pre-history left is null") {
    val trades = Seq((1L, 10L, 100L), (1L, 5L, 101L), (2L, 7L, 102L))
      .toDF("user_id", "ts", "event_id")
    val quotes = Seq((1L, 10L, 1.5), (1L, 8L, 1.2), (2L, 9L, 9.9))
      .toDF("user_id", "ts", "qval")
    val got = Temporal.asofJoin(trades, quotes, "user_id", "ts",
        Seq("event_id"), "qval")
      .select($"event_id", $"asof_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(got(100L) === Some(1.5)) // quote at the SAME ts wins (<=)
    assert(got(101L) === None)      // trade before any quote → null
    assert(got(102L) === None)      // user 2's only quote is later
  }

  test("asofJoin: latest-not-just-any prior right row") {
    val trades = Seq((1L, 100L, 1L)).toDF("user_id", "ts", "event_id")
    val quotes = Seq((1L, 10L, 1.0), (1L, 50L, 2.0), (1L, 99L, 3.0))
      .toDF("user_id", "ts", "qval")
    val got = Temporal.asofJoin(trades, quotes, "user_id", "ts",
        Seq("event_id"), "qval")
      .select($"asof_value").as[Double].head()
    assert(got === 3.0)
  }

  test("asofJoin: a null-VALUED right row still wins the as-of race") {
    val trades = Seq((1L, 20L, 1L), (1L, 9L, 2L)).toDF("user_id", "ts", "event_id")
    val quotes = Seq((1L, 5L, Some(1.0)), (1L, 10L, Option.empty[Double]))
      .toDF("user_id", "ts", "qval")
    val got = Temporal.asofJoin(trades, quotes, "user_id", "ts",
        Seq("event_id"), "qval")
      .select($"event_id", $"asof_value").as[(Long, Option[Double])]
      .collect().toMap
    // the matched row at ts=10 has a null value: the answer is null
    // (DuckDB ASOF semantics), NOT the older non-null 1.0
    assert(got(1L) === None)
    assert(got(2L) === Some(1.0)) // before ts=10, the 1.0 quote still rules
  }

  test("asofJoin: hotKeyBinWidth path agrees exactly on a single hot key") {
    // ONE key carrying every row — the pathological case the binned
    // path exists for — plus a second sparse key to catch carry leaks
    val trades = ((1 to 500).map(i => (1L, i.toLong * 3, i.toLong)) :+
      (2L, 1000L, 9001L)).toDF("user_id", "ts", "event_id")
    val quotes = ((1 to 200).map(i => (1L, i.toLong * 7, i.toDouble)) :+
      (2L, 2000L, -1.0)).toDF("user_id", "ts", "qval")
    val base = Temporal.asofJoin(trades, quotes, "user_id", "ts",
        Seq("event_id"), "qval")
      .select($"event_id", $"asof_value").as[(Long, Option[Double])]
      .collect().toMap
    for (width <- Seq(10L, 100L, 5000L)) {
      val binned = Temporal.asofJoin(trades, quotes, "user_id", "ts",
          Seq("event_id"), "qval", hotKeyBinWidth = width)
        .select($"event_id", $"asof_value").as[(Long, Option[Double])]
        .collect().toMap
      assert(binned === base, s"binWidth=$width diverges")
    }
    // sanity on the shape itself: key 2's trade precedes its only quote
    assert(base(9001L) === None)
  }

  test("nearestJoin: picks the smaller gap either direction, backward wins ties") {
    val left = Seq((1L, 10L, 1L), (1L, 100L, 2L), (1L, 52L, 3L),
      (2L, 5L, 4L), (3L, 7L, 5L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq((1L, 13L, 1.0), (1L, 50L, 2.0), (1L, 54L, 3.0),
      (2L, 5L, 4.0))
      .toDF("user_id", "ts", "qval")
    val got = Temporal.nearestJoin(left, right, "user_id", "ts",
        Seq("event_id"), "qval")
      .select($"event_id", $"nearest_value", $"nearest_gap")
      .as[(Long, Option[Double], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((Some(1.0), Some(3L))))  // forward 13 beats nothing backward
    assert(got(2L) === ((Some(3.0), Some(46L)))) // backward 54 beats nothing forward
    assert(got(3L) === ((Some(2.0), Some(2L))))  // gap 2 both ways → backward 50 wins
    assert(got(4L) === ((Some(4.0), Some(0L))))  // equal ts → gap-0 backward match
    assert(got(5L) === ((None, None)))           // key with no right rows
  }

  test("rangeJoin: [start, end) boundaries, multi-bin ranges match once") {
    val points = Seq((1L, 10L), (2L, 19L), (3L, 20L), (4L, 35L))
      .toDF("pid", "ts")
    // one range spanning several bins of width 4 — each containing
    // point must match exactly once despite the bin explosion
    val ranges = Seq((7L, 10L, 20L)).toDF("rid", "w_start", "w_end")
    val got = Temporal.rangeJoin(points, ranges, "ts", "w_start", "w_end",
        binWidth = 4L)
      .select($"pid").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L)) // 10 in, 19 in, 20 out (exclusive), 35 out
  }
}
