package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.concurrent.TrieMap

/** Dev utility (round-17 optimization measurement): run queries from
  * the registry with a SparkListener attached and print every Spark
  * JOB's wall-clock + description — the job-level decomposition of a
  * query's cost (how many actions, which ones dominate), complementing
  * StreamDiag's per-trigger view.
  *
  * Usage: sbt "runMain graft.JobDiag ^m14_ [sfDir]"
  */
object JobDiag {
  def main(args: Array[String]): Unit = {
    val pattern = args.headOption.getOrElse("^m14_").r
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.local()
    val starts = TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        starts(e.jobId) = (System.nanoTime(), desc)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, desc) =>
          println(f"[job] id=${e.jobId}%-4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
        }
    })
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => pattern.findFirstIn(n).isDefined)
    names.foreach { n =>
      println(s"[jobdiag] === $n (run 1: staging) ===")
      SparkEntry.queries(n)(spark, sfDir).count(): Unit
      Thread.sleep(200)
      println(s"[jobdiag] === $n (run 2: steady) ===")
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count(): Unit
      Thread.sleep(200)
      println(f"[jobdiag] $n steady total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
