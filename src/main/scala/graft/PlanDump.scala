package graft

import java.nio.file.{Files, Paths}

/** Dev utility (round-17 optimization evidence): dump
  * `.explain("formatted")` for a named set of queries into per-query
  * files — `plans/r17/<query>_<suffix>.txt` — so before/after plan
  * shapes are committable and diffable per optimization.
  *
  * Usage: sbt "runMain graft.PlanDump <suffix> <regex> [sfDir] [outDir]"
  * e.g.   sbt "runMain graft.PlanDump before '^(g16_prob_bsp|st15_.*)$'"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val pattern = args.lift(1).getOrElse(".*").r
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.01")
    val outDir = Paths.get(args.lift(3).getOrElse("plans/r17"))
    Files.createDirectories(outDir)
    val spark = GraftSession.local()
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => pattern.findFirstIn(n).isDefined)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val full = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // iterative loops return final-state reads whose cached-relation
      // plans recursively reprint — keep the reviewable head
      val plan = if (full.length <= 40000) full
        else full.take(40000) + s"\n... [truncated: ${full.length} chars total]\n"
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"),
        s"== $name ($suffix) on $sfDir ==\n$plan")
      println(s"wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
