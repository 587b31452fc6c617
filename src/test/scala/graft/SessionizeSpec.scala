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
