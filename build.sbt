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
// Commit the heap up front (Xms=Xmx) — the standard production executor
// sizing, and the fix for the g11 bench bimodality (BENCH_r15_full
// verdicts): with a large -Xmx and a tiny default -Xms, the full GC the
// bench runs between samples lets G1 uncommit the heap, and the next
// timed sample then pays multi-GB mmap+zero page faults — measured 2-3x
// inflation on the allocation-heavy iterative graph loops at -Xmx96g,
// reproducing the driver-pass slowdown that min-folded builder passes
// never showed. Xms is capped at 70% of physical RAM so an oversized
// SPARK_DRIVER_MEM still boots (committed-but-untouched pages are lazy,
// but a hard cap keeps strict-overcommit boxes safe too).
val sparkDriverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
val sparkDriverXms: Option[String] = {
  def mib(s: String): Option[Long] = {
    val m = "(?i)^([0-9]+)([gm])$".r
    s.trim match {
      case m(n, u) => Some(if (u.equalsIgnoreCase("g")) n.toLong * 1024 else n.toLong)
      case _ => None
    }
  }
  val capMib = scala.util.Try {
    val src = scala.io.Source.fromFile("/proc/meminfo")
    try src.getLines().find(_.startsWith("MemTotal"))
      .map(_.replaceAll("[^0-9]", "").toLong * 7 / 10 / 1024).get
    finally src.close()
  }.toOption
  (mib(sparkDriverMem), capMib) match {
    case (Some(req), Some(cap)) => Some(s"-Xms${math.min(req, cap)}m")
    // /proc/meminfo unreadable (macOS, some containers): the physical-RAM
    // cap can't be determined, so committing the full request up front
    // could fail the JVM boot on strict-overcommit or small-RAM hosts.
    // Skip Xms entirely — lazy default Xms always boots.
    case _ => None
  }
}
javaOptions ++= jdk17AddOpens ++ sparkDriverXms.toSeq ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$sparkDriverMem",
)
