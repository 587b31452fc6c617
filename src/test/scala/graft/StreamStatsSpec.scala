package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamStats

/** st6: running power-sum state genuinely accumulates ACROSS
  * micro-batches (not a single-batch aggregate in disguise), and the
  * final emission equals the batch formula. */
class StreamStatsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("state carries across micro-batches and converges to batch stats") {
    val ev = Tables.events(spark, sf)
    val stage = targetPath("streamstats_spec")
    ev.repartition(4).write.mode("overwrite").parquet(stage)
    val sink = "streamstats_spec_sink"
    val got = StreamStats.run(spark, stage, ev.schema, sinkName = sink)
      .orderBy($"event_type")
      .as[(String, Long, Double, Double)].collect()

    // intermediate emissions: with 4 single-file micro-batches, a key
    // present in several files must emit several GROWING counts — the
    // proof the state crossed batch boundaries
    val emissions = spark.table(sink)
      .groupBy($"event_type").agg(countDistinct($"n").as("emitted"))
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
}
