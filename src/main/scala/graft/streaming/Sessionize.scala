package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful streaming sessionization (beyond the reference's streaming
  * surface, SURVEY.md §2.10): per-user event sessions split on
  * inactivity gaps, implemented with `flatMapGroupsWithState` — the
  * Structured Streaming custom-state operator.
  *
  * Semantics: events sorted by (sec, event_id) per user; a gap >
  * `gapSec` closes the current session. Closed sessions are emitted
  * downstream; the open tail rides in the group state across
  * micro-batches as a CONSTANT-SIZE aggregate `(session_start,
  * n_events, sum_cents, last_sec)` — never the event list, so a
  * gap-free always-active user costs O(1) state, not O(events).
  * Cross-batch stragglers older than the open tail's last event merge
  * into it (their seconds/cents still count; session_start takes the
  * min) — exact re-splitting of an open tail would require retaining
  * its events, which is precisely the unbounded state this avoids.
  *
  * With `idleCloseMs > 0` a timeout force-closes and emits the open
  * session of any user idle that long, so the state store's key
  * population is also bounded by activity, not by the all-time user
  * count. Two clocks are offered:
  *  - `eventTimeIdle = false`: processing-time timeout — wall-clock
  *    idle eviction, right for a live 24/7 pipeline but
  *    REPLAY-DEPENDENT (a re-run at different speed closes different
  *    sessions);
  *  - `eventTimeIdle = true`: event-time timeout keyed to the
  *    watermark — a user's tail closes when the WATERMARK passes
  *    `last_sec + idleCloseMs`, which depends only on the data, so a
  *    replayed stream closes exactly the same sessions (spec-pinned).
  */
object Sessionize {

  case class Ev(user_id: Long, sec: Long, cents: Long, event_id: Long)
  case class Session(user_id: Long, session_start: Long, n_events: Long,
                     sum_cents: Long)
  /** Open-tail aggregate — the whole per-user state, O(1) by type. */
  case class OpenTail(session_start: Long, n_events: Long, sum_cents: Long,
                      last_sec: Long)

  def sessionFn(gapSec: Long, idleCloseMs: Long = 0L,
                eventTimeIdle: Boolean = false)(
      uid: Long, rows: Iterator[Ev], state: GroupState[OpenTail]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // idle user: force-close and evict — the state store must not
      // accumulate one entry per user ever seen
      val out = state.getOption.map(t =>
        Session(uid, t.session_start, t.n_events, t.sum_cents))
      state.remove()
      out.iterator
    } else {
      val evs = rows.toArray.sortBy(e => (e.sec, e.event_id))
      val out = List.newBuilder[Session]
      var open = state.getOption.orNull
      for (e <- evs) {
        if (open == null)
          open = OpenTail(e.sec, 1L, e.cents, e.sec)
        else if (e.sec - open.last_sec > gapSec) {
          out += Session(uid, open.session_start, open.n_events, open.sum_cents)
          open = OpenTail(e.sec, 1L, e.cents, e.sec)
        } else
          open = OpenTail(math.min(open.session_start, e.sec),
            open.n_events + 1L, open.sum_cents + e.cents,
            math.max(open.last_sec, e.sec))
      }
      if (open != null) {
        state.update(open)
        if (idleCloseMs > 0L) {
          if (eventTimeIdle)
            // the engine rejects a timeout at-or-before the current
            // watermark; a tail already idle past the horizon closes in
            // the very next (no-data) batch instead
            state.setTimeoutTimestamp(math.max(
              open.last_sec * 1000L + idleCloseMs,
              state.getCurrentWatermarkMs + 1L))
          else state.setTimeoutDuration(idleCloseMs)
        }
      }
      out.result().iterator
    }
  }

  /** Run sessionization over a staged events directory; returns closed
    * sessions (every session except each user's open tail — plus, when
    * `idleCloseMs > 0`, tails force-closed by the idle timeout).
    *
    * Sink: closed sessions flow through the same foreachBatch KV-merge
    * as the st1 pipeline into the KV table at `sinkPath` — distributed
    * parquet appends, nothing materializes on the driver (a memory sink
    * here would hold every closed session in driver heap, the exact
    * thing that breaks first at 100 TB). One session = one cell keyed
    * (user_id, "S", session_start), so a replayed micro-batch after a
    * restart upserts the same cell instead of duplicating the session —
    * the log's latest-wins resolve is the exactly-once-by-idempotence
    * path the KV store already provides. */
  def run(spark: SparkSession, stageDir: String, schema: org.apache.spark.sql.types.StructType,
          sinkPath: String, gapSec: Long, idleCloseMs: Long = 0L,
          eventTimeIdle: Boolean = false): DataFrame = {
    import spark.implicits._
    val base = spark.readStream.schema(schema).parquet(stageDir)
      .select($"user_id",
        expr("ts DIV 1000000000").as("sec"),
        round($"value" * 100).cast("long").as("cents"),
        $"event_id")
    // event-time idle needs a watermark column; 0s delay = the
    // watermark is the max event time seen, so idle-close timing is a
    // pure function of the data
    val src = (if (eventTimeIdle && idleCloseMs > 0L)
        base.withColumn("ets", timestamp_seconds($"sec"))
          .withWatermark("ets", "0 seconds")
      else base).as[Ev]
    val timeoutConf =
      if (idleCloseMs <= 0L) GroupStateTimeout.NoTimeout
      else if (eventTimeIdle) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    val sessions = src.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        sessionFn(gapSec, idleCloseMs, eventTimeIdle))
    val sink = graft.write.KVTable(spark, sinkPath, wipe = true)
    val q = sessions.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.put(batch.select($"user_id".as("key"), lit("S").as("family"),
          $"session_start".cast("string").as("qualifier"),
          concat_ws(":", $"n_events", $"sum_cents").as("value"),
          $"session_start".as("ts")))
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    sink.resolved().select($"key".as("user_id"),
      $"qualifier".cast("long").as("session_start"),
      split($"value", ":").getItem(0).cast("long").as("n_events"),
      split($"value", ":").getItem(1).cast("long").as("sum_cents"))
  }
}
