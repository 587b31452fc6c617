package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamStats

/** st6: running power-sum state genuinely accumulates ACROSS
  * micro-batches (not a single-batch aggregate in disguise), the final
  * emission equals the batch formula, and the sink is the KV table's
  * own merge — nothing driver-resident. */
class StreamStatsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("state carries across micro-batches and converges to batch stats") {
    val ev = Tables.events(spark, sf)
    val stage = targetPath("streamstats_spec")
    ev.repartition(4).write.mode("overwrite").parquet(stage)
    val sinkPath = targetPath("streamstats_spec_kv")
    val got = StreamStats.run(spark, stage, ev.schema, sinkPath)
      .orderBy($"event_type")
      .as[(String, Long, Double, Double)].collect()

    // per-batch emission history = the KV table's pre-resolve cell log:
    // with 4 single-file micro-batches, a key present in several files
    // must have upserted several GROWING n snapshots (ts = n) — the
    // proof the state crossed batch boundaries, read from the engine's
    // own storage rather than a driver-memory sink
    val emissions = graft.write.KVTable(spark, sinkPath).cells
      .groupBy($"qualifier").agg(countDistinct($"ts").as("emitted"))
      .as[(String, Long)].collect().toMap
    assert(emissions.values.max >= 2,
      s"expected multi-batch accumulation, got $emissions")

    // final stats equal the batch power-sum formula over the same data
    val batch = ev.groupBy($"event_type").agg(
        count(lit(1)).as("n"), sum($"value").as("s1"),
        sum($"value" * $"value").as("s2"))
      .select($"event_type", $"n", round($"s1" / $"n", 6).as("mean"),
        round(sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)), 6).as("sd"))
      .orderBy($"event_type")
      .as[(String, Long, Double, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq === batch.map(r => (r._1, r._2)).toSeq)
    got.zip(batch).foreach { case ((_, _, m1, d1), (_, _, m2, d2)) =>
      assert(math.abs(m1 - m2) < 1e-9 && math.abs(d1 - d2) < 1e-9)
    }
  }

  test("st7 alerts match the batch prefix-window formula and span batches") {
    val ev = Tables.events(spark, sf)
    val stage = targetPath("streamalerts_spec")
    graft.sources.kv.GraftFs.delete(stage, recursive = true)
    val bounds = ev.stat.approxQuantile("ts", Array(0.25, 0.5, 0.75), 0.0)
    val cuts = Long.MinValue +: bounds.map(_.toLong) :+ Long.MaxValue
    // pin pickup order explicitly (mtime ties would reorder batches)
    graft.streaming.Staging.ordered(stage)(
      cuts.sliding(2).collect {
        case Array(lo, hi) => () =>
          ev.filter($"ts" > lo && $"ts" <= hi)
            .coalesce(1).write.mode("append").parquet(stage)
      }.toSeq: _*)
    val got = StreamStats.alerts(spark, stage, ev.schema,
      targetPath("streamalerts_spec_out"))

    // alerts must arrive across several micro-batches — running stats,
    // not a single-batch recomputation
    val batches = got.select($"batch_id").distinct().count()
    assert(batches >= 3, s"alerts landed in only $batches micro-batches")

    // and equal the batch strictly-preceding-window formula
    val batch = ev.createOrReplaceTempView("ssa_events")
    val expect = spark.sql(
      """WITH e AS (SELECT event_type, event_id, ts AS tsn,
        |                  ts DIV 1000000000 AS sec,
        |                  CAST(round(value*100) AS BIGINT) AS cents
        |           FROM ssa_events),
        |w AS (SELECT event_type, event_id, sec, cents,
        |             count(*) OVER win AS n,
        |             sum(cents) OVER win AS s1,
        |             sum(cents*cents) OVER win AS s2
        |      FROM e WINDOW win AS (PARTITION BY event_type
        |        ORDER BY tsn, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_id,
        |             CASE WHEN n > 1 AND s2*n > s1*s1
        |                  THEN round((cents - s1*1.0/n)
        |                    / sqrt((s2 - (s1*1.0)*(s1*1.0)/n)/(n-1)), 6)
        |             END AS z
        |      FROM w)
        |SELECT event_id, z FROM z
        |WHERE z IS NOT NULL AND abs(z) > 3 ORDER BY event_id""".stripMargin)
      .as[(Long, Double)].collect().toSeq
    val gotPairs = got.select($"event_id", $"z").orderBy($"event_id")
      .as[(Long, Double)].collect().toSeq
    assert(gotPairs.nonEmpty, "no alerts fired on the test data")
    assert(gotPairs === expect)
  }

  test("single-observation key yields null sd, not an error") {
    val cells = Seq(
      (1L, "S", "lonely", "1:5.0:25.0", 1L),
      (2L, "S", "pair", "2:6.0:20.0", 2L))
      .toDF("key", "family", "qualifier", "value", "ts")
    val st = StreamStats.finalStats(spark, cells)
      .orderBy($"event_type")
      .collect()
    assert(st(0).getString(0) == "lonely" && st(0).isNullAt(3))
    assert(st(1).getString(0) == "pair" && !st(1).isNullAt(3))
  }
}
