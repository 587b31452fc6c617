package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful streaming sessionization (beyond the reference's streaming
  * surface, SURVEY.md §2.10): per-user event sessions split on
  * inactivity gaps, implemented with `flatMapGroupsWithState` — the
  * Structured Streaming custom-state operator.
  *
  * Semantics: events sorted by (sec, event_id) per user; a gap >
  * `gapSec` closes the current session. Closed sessions are emitted
  * downstream; the open tail session rides in the group state across
  * micro-batches. At scale the state store is per-key and incremental —
  * this is the pattern the reference's incrementalNetBSP gestured at
  * (HGraphTable.scala:143-228) with none of the hand-rolled inbox
  * machinery.
  */
object Sessionize {

  case class Ev(user_id: Long, sec: Long, cents: Long, event_id: Long)
  case class Session(user_id: Long, session_start: Long, n_events: Long,
                     sum_cents: Long)

  def sessionFn(gapSec: Long)(
      uid: Long, rows: Iterator[Ev], state: GroupState[List[Ev]]): Iterator[Session] = {
    val pending = state.getOption.getOrElse(Nil)
    val evs = (pending ++ rows.toList).sortBy(e => (e.sec, e.event_id))
    if (evs.isEmpty) Iterator.empty
    else {
      // split on gaps; everything but the last run is closed
      val runs = evs.tail.foldLeft(List(List(evs.head))) { (acc, e) =>
        if (e.sec - acc.head.head.sec > gapSec) List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }.map(_.reverse).reverse
      state.update(runs.last)
      runs.init.iterator.map(r =>
        Session(uid, r.map(_.sec).min, r.size.toLong, r.map(_.cents).sum))
    }
  }

  /** Run sessionization over a staged events directory; returns closed
    * sessions (every session except each user's open tail). */
  def run(spark: SparkSession, stageDir: String, schema: org.apache.spark.sql.types.StructType,
          gapSec: Long): DataFrame = {
    import spark.implicits._
    val src = spark.readStream.schema(schema).parquet(stageDir)
      .select($"user_id",
        expr("ts DIV 1000000000").as("sec"),
        round($"value" * 100).cast("long").as("cents"),
        $"event_id")
      .as[Ev]
    val sessions = src.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        sessionFn(gapSec))
    val sink = "graft_sessions_sink"
    val q = sessions.toDF().writeStream.outputMode("append")
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(sink)
  }
}
