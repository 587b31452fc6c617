package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: the flagship entry answers on sf0.001. */
class EntrySpec extends AnyFunSuite with SparkSpec {
  test("entry returns rows with the expected shape") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq === Seq("l_returnflag", "l_linestatus", "sum_qty",
      "revenue", "n_customers", "n_rows"))
    assert(df.count() > 0)
  }

  test("every query has either an oracle or a documented reason") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("no orphan oracles, no duplicate registrations across modules") {
    // an oracle whose query was renamed/removed silently weakens the
    // gate (the driver only checks registered queries)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
    // the query map is a ++ of per-module maps — a name collision
    // would silently shadow one module's operator with another's
    val modules = Seq(
      operators.Scans.queries, operators.Filters.queries,
      operators.Joins.queries, operators.Aggs.queries,
      operators.Windows.queries, operators.SetOps.queries,
      operators.Analytics.queries, graph.GraphQueries.queries,
      write.WriteQueries.queries, functions.CodecQueries.queries,
      llm.LlmQueries.queries)
    val all = modules.flatMap(_.keys)
    val dups = all.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"query names registered twice: $dups")
    assert(all.length === SparkEntry.queries.size)
  }

  test("no WITHIN-module duplicate registrations — a Scala Map literal " +
    "silently keeps the last duplicate key, so shadowing is invisible " +
    "to the Map-level guard; scan the source instead") {
    // each registered name may appear at most twice as a map key in the
    // REGISTRATION modules (the files whose Map literals SparkEntry
    // composes): once as the query lambda, once as the oracle. Scanning
    // only these files keeps the guard from false-positiving on a
    // future legitimate third map elsewhere (tolerances, skip-lists)
    // while still catching the within-module shadowing it exists for.
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val names = SparkEntry.queries.keySet ++ SparkEntry.oracleSql.keySet
    val key = """"([a-z][a-z0-9_]*)"\s*->""".r
    val registrationFiles = Set("Scans.scala", "Filters.scala",
      "Joins.scala", "Aggs.scala", "Windows.scala", "SetOps.scala",
      "Analytics.scala", "GraphQueries.scala", "WriteQueries.scala",
      "CodecQueries.scala", "LlmQueries.scala", "SparkEntry.scala")
    val srcRoot = Paths.get("src/main/scala/graft")
    assert(Files.exists(srcRoot), s"source root not found from ${
      Paths.get(".").toAbsolutePath}")
    val scanned = Files.walk(srcRoot).iterator().asScala
      .filter(p => registrationFiles(p.getFileName.toString)).toSeq
    // the file list must stay in sync with SparkEntry's module list:
    // every registered name must be FOUND at least twice (query+oracle)
    // inside the scanned set, else a module was renamed out from under
    // the guard
    val counts = scanned
      .flatMap(p => key.findAllMatchIn(Files.readString(p)).map(_.group(1)))
      .filter(names)
      .groupBy(identity).view.mapValues(_.size)
    val unseen = names.filter(n => counts.getOrElse(n, 0) < 2)
    assert(unseen.isEmpty,
      s"registered names not found as query+oracle keys in the scanned " +
        s"registration files (module renamed? update registrationFiles): " +
        unseen.take(10))
    val over = counts.filter(_._2 > 2).toMap
    assert(over.isEmpty,
      s"names registered more than query+oracle once: $over — a " +
        "duplicate key inside one module's Map shadows the earlier entry")
  }
}
