package graft

/** Dev utility (round-18 optimization measurement): drain the graft-cdc
  * dual-cutoff reader for the m14/st12-style mutation windows directly
  * on the driver — isolates the PartitionReader's per-row CPU from the
  * streaming engine's trigger/commit/sink costs, for a clean A/B of
  * reader-internals changes.
  *
  * Usage: sbt "runMain graft.CdcReadBench [kvTablePath] [reps]"
  * (defaults to the st12 bench table left by the last bench run)
  */
object CdcReadBench {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(RepoPaths.target("graft_kv/st12"))
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local()
    import graft.sources.kv.{KVCdcMicroBatchStream, KVCdcOffset}
    val stream = new KVCdcMicroBatchStream(path, 1L, Long.MaxValue)
    def drain(from: Long, to: Long): Long = {
      val parts = stream.planInputPartitions(KVCdcOffset(from), KVCdcOffset(to))
      val f = stream.createReaderFactory()
      parts.map { p =>
        val r = f.createReader(p)
        var n = 0L
        try { while (r.next()) n += 1 } finally r.close()
        n
      }.sum
    }
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = drain(1L, 2L) + drain(2L, 3L) + drain(3L, 4L)
      println(f"[cdcbench] rep$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
