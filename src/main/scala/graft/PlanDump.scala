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
    // iterative operators return final-state (checkpoint) reads, so the
    // loop's actual plan never shows in the query's own explain —
    // synthetic entries expose the lazy staged plan for evidence.
    // NOTE (r17 ADVICE): the *Staged entries deliberately never invoke
    // the returned cleanup thunk — the persisted edge/degree caches
    // live for the remainder of this dump run only (dev tool; the
    // session stops at the end of main). Library callers go through
    // pageRank(), which always releases them.
    val staged: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "g11_pagerank__staged_sym" -> ((s, dd) =>
        graph.GraphOps.pageRankStaged(
          graph.GraphQueries.pairs2(s, dd), iters = 2, damp = 0.85,
          symmetric = true)._1),
      "g11_pagerank__staged_nosym" -> ((s, dd) =>
        graph.GraphOps.pageRankStaged(
          graph.GraphQueries.pairs2(s, dd), iters = 2, damp = 0.85,
          symmetric = false)._1),
      // one label-propagation ROUND (the loop checkpoints each round,
      // so the query's own explain is a final-state read) — round-18
      // exchange-count evidence. Inputs replicate the REAL loop
      // context: the dst-partitioned persisted edge cache and a
      // checkpointed labels relation (unknown stats — no broadcast),
      // exactly as labelPropagation stages them.
      "g13_label_prop__round" -> ((s, dd) => {
        import org.apache.spark.sql.functions.col
        val p = graph.GraphQueries.pairs2(s, dd)
          .select(col("src"), col("dst"))
          .repartition(col("dst")).sortWithinPartitions(col("dst"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val labels = p.select(col("src").as("vertex")).distinct()
          .withColumn("label", col("vertex"))
          .localCheckpoint(true)
        graph.GraphOps.lpRound(p, labels)
      }))
    val names = (SparkEntry.queries.keys.toSeq ++ staged.keys).sorted
      .filter(n => pattern.findFirstIn(n).isDefined)
    names.foreach { name =>
      val df = staged.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
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
