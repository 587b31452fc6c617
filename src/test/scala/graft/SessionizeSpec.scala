package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Ev, OpenTail, Session}

/** Stateful sessionization across MULTIPLE micro-batches: the open-tail
  * session must ride the group state between batches and close (emit)
  * only when a later batch brings a gap — or never, if it stays open.
  */
class SessionizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("open session carries across micro-batches and closes on a gap") {
    val dir = targetPath("graft_stream_test/sessions")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    new java.io.File(dir).mkdirs()

    // batch 1: user 1 events at t=0,100 (one open session)
    Seq(Ev(1L, 0L, 10L, 0L), Ev(1L, 100L, 20L, 1L)).toDF()
      .coalesce(1).write.parquet(s"$dir/b1")
    // batch 2 (arrives later): t=200 extends the session; t=10000 opens
    // a new one -> the first session (3 events) must emit
    Seq(Ev(1L, 200L, 30L, 2L), Ev(1L, 10000L, 40L, 3L)).toDF()
      .coalesce(1).write.parquet(s"$dir/b2")
    // move files into the watch dir with ordered names
    val watch = s"$dir/watch"; new java.io.File(watch).mkdirs()
    def moveParts(src: String, dst: String): Unit =
      new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          f.renameTo(new java.io.File(s"$watch/$dst$i.parquet")): Unit
        }
    moveParts(s"$dir/b1", "a_batch1_")
    moveParts(s"$dir/b2", "b_batch2_")

    val src = spark.readStream
      .schema(Seq.empty[Ev].toDF().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(watch)
      .as[Ev]
    val sink = "sessionize_spec_sink"
    val q = src.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        Sessionize.sessionFn(1800L))
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table(sink).as[Session].collect().toSet
    // only the first session closed: events at 0,100,200 (gap to 10000)
    assert(got === Set(Session(1L, 0L, 3L, 60L)),
      s"got $got — state did not carry across batches correctly")
  }

  test("gap-free user holds O(1) state across batches (aggregate, not events)") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    // 50 batches x 200 in-gap events: the list-state formulation would
    // accumulate 10k events; the aggregate state is one fixed-size row.
    var st = Optional.empty[OpenTail]()
    var emitted = 0
    for (b <- 0 until 50) {
      val state = TestGroupState.create[OpenTail](st,
        GroupStateTimeout.NoTimeout, 1000L * b, Optional.empty[Long], false)
      val evs = (0 until 200).iterator.map(i =>
        Ev(7L, b * 200L + i, 1L, b * 200L + i))
      emitted += Sessionize.sessionFn(10L)(7L, evs, state).size
      assert(state.exists, "open tail must persist")
      st = Optional.of(state.get)
    }
    assert(emitted === 0, "no gap -> nothing closes")
    assert(st.get === OpenTail(0L, 10000L, 10000L, 9999L),
      s"aggregate drifted: ${st.get}")
  }

  test("event-time idle close is deterministic under replay") {
    // With ProcessingTimeTimeout, whether an idle tail closes depends on
    // wall-clock batch spacing — a replay can close different sessions.
    // EventTimeTimeout keys the close to the WATERMARK (a function of
    // the data alone), so two runs over the same files must emit
    // identical session sets — including the idle-closed one.
    val dir = targetPath("graft_stream_test/sessions_et")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    val watch = s"$dir/watch"; new java.io.File(watch).mkdirs()
    def stage(name: String, evs: Seq[Ev]): Unit = {
      val tmp = s"$dir/$name"
      evs.toDF().coalesce(1).write.parquet(tmp)
      new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, i) =>
          f.renameTo(new java.io.File(s"$watch/${name}_$i.parquet")): Unit
        }
    }
    // batch a: user 1 at t=10,100 (open tail), user 2 at t=50 (open
    // tail). t=10 not t=0: with EventTimeTimeout the engine drops rows
    // at-or-before the watermark, and the initial watermark is 0 — an
    // event AT the boundary is late by that (inclusive) rule
    stage("a_batch1", Seq(Ev(1L, 10L, 10L, 0L), Ev(1L, 100L, 20L, 1L),
      Ev(2L, 50L, 5L, 2L)))
    // batch b: user 1 jumps to t=100000 — closes user 1's first session
    // by gap AND drives the watermark far past user 2's idle horizon
    // (50s + 60s), so user 2's tail must close by event-time timeout;
    // user 1's new tail (idle horizon 100060s > watermark 100000s) must
    // stay open
    stage("b_batch2", Seq(Ev(1L, 100000L, 40L, 3L)))

    def runOnce(sinkName: String): Set[Session] = {
      val src = spark.readStream
        .schema(Seq.empty[Ev].toDF().schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(watch)
        .withColumn("ets", timestamp_seconds($"sec"))
        .withWatermark("ets", "0 seconds")
        .as[Ev]
      val q = src.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout)(
          Sessionize.sessionFn(1800L, idleCloseMs = 60000L,
            eventTimeIdle = true))
        .toDF().writeStream.outputMode("append")
        .format("memory").queryName(sinkName)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(sinkName).as[Session].collect().toSet
    }

    val first = runOnce("sessionize_et_run1")
    val second = runOnce("sessionize_et_run2")
    val expected = Set(
      Session(1L, 10L, 2L, 30L), // closed by the 100000s gap
      Session(2L, 50L, 1L, 5L))  // closed by event-time idle timeout
    assert(first === expected, s"run 1 got $first")
    assert(second === first, "replay closed different sessions")
  }

  test("event-time timeout never lands at-or-before the watermark") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    // tail already idle past the horizon: the naive timestamp
    // (last_sec*1000 + idle) is behind the watermark, which the engine
    // rejects — the guard must clamp to watermark+1 (close next batch)
    val state = TestGroupState.create[OpenTail](Optional.empty[OpenTail](),
      GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(200000L)), false)
    Sessionize.sessionFn(10L, idleCloseMs = 60000L, eventTimeIdle = true)(
      9L, Iterator(Ev(9L, 50L, 1L, 0L)), state).toList
    assert(state.getTimeoutTimestampMs.get === 200001L,
      "timeout must clamp to watermark+1 for an already-idle tail")
  }

  test("idle timeout force-closes and evicts the open tail") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    val state = TestGroupState.create[OpenTail](
      Optional.of(OpenTail(5L, 3L, 42L, 100L)),
      GroupStateTimeout.ProcessingTimeTimeout, 0L,
      Optional.empty[Long], true) // hasTimedOut
    val out = Sessionize.sessionFn(10L, idleCloseMs = 60000L)(
      9L, Iterator.empty, state).toList
    assert(out === List(Session(9L, 5L, 3L, 42L)))
    assert(state.isRemoved, "timed-out state must be evicted")
  }
}
