package graft

/** Always-on per-phase wall-clock recorder for the iterative graph
  * loops (pageRank / star-CC / label propagation), feeding the bench
  * artifact's per-sample phase breakdown.
  *
  * Motivation (BENCH_r14 / VERDICT r14 demand #1): g11_pagerank reads
  * 8-9 s min-of-4 in the DRIVER's full bench pass across two rounds,
  * but ~2-3 s in every builder-run pass on the same box with the same
  * sbt fork — the anomaly exists only in an environment nobody can
  * log into interactively. So the instrumentation ships in-process:
  * each eager phase of a loop records (name, seconds) here at a cost
  * of two nanoTime calls + one bounded-queue offer (~100 ns, nothing
  * at the 0.1+ s phase scale), and graft.Bench drains the buffer after
  * every timed sample, publishing the breakdown in bench.json. When
  * the driver's environment reproduces the 9 s mode, its own artifact
  * now says WHICH phase absorbed the time (edge staging vs iteration
  * checkpoint vs final materialization) instead of one opaque number.
  *
  * Library users never drain: the queue is bounded (offer drops when
  * full), so recording can never grow the heap unboundedly.
  */
object Trace {
  private val buf =
    new java.util.concurrent.ArrayBlockingQueue[(String, Double)](4096)

  /** Record one completed phase; silently dropped when the buffer is
    * full (nothing is draining — not a bench run). */
  def record(name: String, sec: Double): Unit = { buf.offer((name, sec)); () }

  /** Remove and return everything recorded since the last drain, in
    * record order. */
  def drain(): Seq[(String, Double)] = {
    val out = new java.util.ArrayList[(String, Double)]
    buf.drainTo(out)
    scala.jdk.CollectionConverters.ListHasAsScala(out).asScala.toSeq
  }
}
