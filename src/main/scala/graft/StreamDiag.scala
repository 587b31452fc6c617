package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev utility (round-17 optimization measurement): run one or more
  * streaming queries from the registry with a StreamingQueryListener
  * attached and print EVERY micro-batch's durationMs breakdown
  * (addBatch / walCommit / commitOffsets / getBatch / queryPlanning /
  * triggerExecution) plus state-store metrics — decomposes the measured
  * ~1 s/trigger commit floor into its parts so the optimization targets
  * the real cost, not a guess.
  *
  * Usage: sbt "runMain graft.StreamDiag '^st2_' [sfDir]"
  */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val pattern = args.headOption.getOrElse("^st2_").r
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.local()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[diag] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs} state=${
            p.stateOperators.map(s => s"rows=${s.numRowsTotal} " +
              s"commitMs=${s.commitTimeMs} mem=${s.memoryUsedBytes}")
              .mkString("; ")}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => pattern.findFirstIn(n).isDefined)
    names.foreach { n =>
      println(s"[diag] === $n (run 1: staging) ===")
      SparkEntry.queries(n)(spark, sfDir).count(): Unit
      println(s"[diag] === $n (run 2: steady) ===")
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count(): Unit
      println(f"[diag] $n steady total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
