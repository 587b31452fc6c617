package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join state contract (st5_stream_join's shape):
  * with event-time-ordered arrival and a watermark horizon wider than
  * the join interval, multi-batch processing — where the watermark
  * advances and EVICTS click state between micro-batches — must still
  * produce exactly the static join's matches. This is the 100 TB
  * property: join state is bounded by horizon + interval, not by the
  * stream's history, and bounded state loses nothing in-window.
  */
class StreamJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("interval join over 4 event-time-ordered micro-batches equals the static join") {
    val stage = targetPath("graft_stream_spec/st5_stage")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(stage))

    // 12h of alternating clicks/purchases: user u clicks at t, may
    // purchase within 30min (match) or later (no match)
    val base = (0L until 288L).map { i =>
      val user = i % 5 // odd modulus: each user alternates click/purchase
      val sec = i * 150L // one event / 2.5 min, 12h span
      val tpe = if (i % 2 == 0) "click" else "purchase"
      (i, user, sec, tpe)
    }.toDF("event_id", "user_id", "sec", "event_type")
      .withColumn("tsc",
        expr("CAST(timestamp '2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,sec) AS TIMESTAMP)"))

    // 4 chronological chunks written sequentially → ascending mtimes →
    // the file source (latestFirst=false) replays them in event-time
    // order, one file per micro-batch
    for (chunk <- 0 until 4) {
      val tmp = targetPath(s"graft_stream_spec/st5_tmp$chunk")
      rm(new java.io.File(tmp))
      base.filter($"event_id" >= chunk * 72L && $"event_id" < (chunk + 1) * 72L)
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(stage, f"chunk$chunk%04d.parquet")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.copy(part.toPath, dst.toPath)
    }

    // one file per trigger: the watermark advances ~3h between batches,
    // far past the 30min interval, so click state from older batches is
    // genuinely evicted while the tail within the horizon survives
    def sideN(tpe: String, prefix: String) =
      spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
        .filter($"event_type" === tpe)
        .select($"user_id".as(s"${prefix}_user"),
          $"event_id".as(s"${prefix}_id"), $"tsc".as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "1 hour")

    val joined = sideN("click", "c").join(sideN("purchase", "p"),
      $"c_user" === $"p_user" &&
        $"p_ts" >= $"c_ts" && $"p_ts" < $"c_ts" + expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("st5_spec_sink")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      "expected at least 4 non-empty micro-batches (one per staged file)")
    val got = spark.table("st5_spec_sink")
      .select($"c_id", $"p_id").as[(Long, Long)].collect().toSet

    val expected = base.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"event_id".as("ci"), $"sec".as("cs"))
      .join(base.filter($"event_type" === "purchase")
        .select($"user_id".as("pu"), $"event_id".as("pi"), $"sec".as("ps")),
        $"cu" === $"pu" && $"ps" >= $"cs" && $"ps" < $"cs" + 1800L)
      .select($"ci", $"pi").as[(Long, Long)].collect().toSet

    assert(expected.nonEmpty, "degenerate fixture: static join is empty")
    assert(got === expected,
      s"multi-batch interval join diverged: missing=${expected -- got}, extra=${got -- expected}")
  }

  test("left-outer stream join: every click survives, unmatched null-extended") {
    // The watermark-eviction contract: once the sentinels push the
    // watermark past every real click's interval, the unmatched clicks
    // MUST have been emitted null-extended — no click is lost, no
    // click duplicated, and matched rows carry an in-interval gap.
    val rows = SparkEntry.queries("st15_stream_left_join")(
        spark, sf).collect()
    val clicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    val matched = rows.filter(!_.isNullAt(2))
    val unmatched = rows.filter(_.isNullAt(2))
    assert(matched.nonEmpty && unmatched.nonEmpty, "degenerate fixture")
    // per-click row count: 1 if unmatched, else #matches — distinct
    // click ids must cover every click exactly
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length === clicks)
    assert(unmatched.map(_.getLong(1)).toSet
      .intersect(matched.map(_.getLong(1)).toSet).isEmpty,
      "a click is both matched and null-extended")
    matched.foreach { r =>
      val gap = r.getLong(3)
      assert(gap >= 0 && gap < 1800, s"out-of-interval match gap=$gap")
    }
  }
}
