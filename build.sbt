ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkonhbasespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked JVM's stdout through verbatim. The default logged
// strategy prefixes every line with "[info] ", so the one-line JSON
// artifacts Bench/StreamBench print have never been machine-parseable
// by a plain per-line json.loads on the captured log (the driver's
// BENCH_r*.json "parsed" field was null in all 16 rounds). With
// StdoutOutput the artifact line reaches the log bare.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap sizing, A/B-measured (SCALE.md round-16):
//
// 1. Commit the heap up front (Xms=Xmx). With a large -Xmx and a tiny
//    default -Xms, the full GC the bench runs between samples lets G1
//    uncommit the heap, and the next timed sample then pays multi-GB
//    mmap+zero page faults — measured 2-3x inflation on the
//    allocation-heavy iterative graph loops at -Xmx96g (round 15).
// 2. RIGHT-SIZE the heap instead of taking an oversized request. A
//    committed 90 GB heap (70% of a 128 GiB box) is strictly worse than
//    32 g for this suite: the round-16 A/B measured the full 249-query
//    pass at 163.4 s (32 g) vs 187.6 s (128 g request -> Xms 90 g), with
//    the 90 g run paying first-TOUCH page faults deep into the first
//    timed sweep (g11's first sample: 19.6 s, all of it in the staging
//    phase per its trace) and squeezing the page cache every parquet
//    re-read rides on. The suite's live set fits in a few GB (it ran
//    green at -Xmx8g for 14 rounds); GRAFT_HEAP_CAP (default 32g)
//    bounds the effective heap, and an explicit larger cap re-opens it
//    for genuinely bigger-than-bench workloads.
// 3. Xms additionally capped at 70% of physical RAM so an oversized cap
//    still boots; when /proc/meminfo is unreadable (macOS, some
//    containers) skip Xms entirely — lazy default Xms always boots.
def graftMib(s: String): Option[Long] = {
  val m = "(?i)^([0-9]+)([gm])$".r
  s.trim match {
    case m(n, u) => Some(if (u.equalsIgnoreCase("g")) n.toLong * 1024 else n.toLong)
    case _ => None
  }
}
val sparkDriverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
val graftHeapCapMib: Long =
  graftMib(sys.env.getOrElse("GRAFT_HEAP_CAP", "32g")).getOrElse(32768L)
// effective heap: min(requested, cap); unparseable request -> pass raw
val graftHeapMib: Option[Long] =
  graftMib(sparkDriverMem).map(req => math.min(req, graftHeapCapMib))
val sparkDriverXmx: String =
  graftHeapMib.map(m => s"-Xmx${m}m").getOrElse(s"-Xmx$sparkDriverMem")
val sparkDriverXms: Option[String] = {
  val ramCapMib = scala.util.Try {
    val src = scala.io.Source.fromFile("/proc/meminfo")
    try src.getLines().find(_.startsWith("MemTotal"))
      .map(_.replaceAll("[^0-9]", "").toLong * 7 / 10 / 1024).get
    finally src.close()
  }.toOption
  (graftHeapMib, ramCapMib) match {
    case (Some(eff), Some(cap)) => Some(s"-Xms${math.min(eff, cap)}m")
    case _ => None
  }
}
// An explicit SPARK_DRIVER_MEM above the cap is silently unsatisfiable
// otherwise — warn so a genuinely-larger-than-bench workload knows to
// raise GRAFT_HEAP_CAP rather than OOM at 32 g wondering where its
// request went.
val graftHeapClampWarning: Unit =
  for {
    req <- graftMib(sparkDriverMem)
    if sys.env.contains("SPARK_DRIVER_MEM") && req > graftHeapCapMib
  } System.err.println(
    s"[warn] SPARK_DRIVER_MEM=$sparkDriverMem clamped to ${graftHeapCapMib}m " +
      s"by GRAFT_HEAP_CAP (default 32g); raise GRAFT_HEAP_CAP to honor it")
javaOptions ++= jdk17AddOpens ++ sparkDriverXms.toSeq ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  sparkDriverXmx,
)
