package graft

import org.apache.spark.sql.SparkSession

/** Dev utility (round-18, VERDICT item 7): measure the BUILD cost of
  * the marker-guarded per-dataset staged artifacts that Bench's
  * untimed sweep 0 constructs — pairs2, probState, the standing dedup
  * state, and the m14/m16-style KV mutation base — so the cost the
  * steady-state bench deliberately excludes stays measured on its own
  * axis (the IndexBench discipline, applied to the remaining staged
  * artifacts). Each artifact is wiped and rebuilt through the SAME
  * ensure* entry points the queries use, leaving a valid staged state
  * behind.
  *
  * Usage: sbt "runMain graft.StageBench [sfDir]"
  */
object StageBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.local()
    val slug = Staging.slug(sfDir)
    def timed(name: String)(wipe: => Unit)(build: => Unit): Unit = {
      wipe
      val t0 = System.nanoTime()
      build
      println(f"[stagebench] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    timed("pairs2 (bucketed, 32)") {
      graft.sources.kv.GraftFs.delete(
        RepoPaths.target(s"graft_stage/pairs2_$slug"), recursive = true)
      spark.sql(s"DROP TABLE IF EXISTS graft_pairs2_$slug")
    } { graph.GraphQueries.pairs2(spark, sfDir).count(): Unit }
    timed("probState (bucketed, 32)") {
      graft.sources.kv.GraftFs.delete(
        RepoPaths.target(s"graft_stage/probstate_$slug"), recursive = true)
      spark.sql(s"DROP TABLE IF EXISTS graft_probstate_$slug")
    } { graph.GraphQueries.probState(spark, sfDir).count(): Unit }
    timed("standing dedup state (flat)") {
      graft.sources.kv.GraftFs.delete(
        RepoPaths.target(s"graft_llm/standing_$slug"), recursive = true)
    } {
      val (_, labels, index) = llm.LlmQueries.standingDedupState(spark, sfDir)
      labels.count(); index.count(): Unit
    }
    spark.stop()
  }
}
