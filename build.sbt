ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datawarehouse_morrocan_banksspark"
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
// The bench/verify harness parses the LAST stdout line of
// `sbt "runMain graft.Bench"` as JSON. Two sbt behaviors defeat that:
// the logger prefixes forked output with "[info] ", and a trailing
// "[success] Total time: ..." line prints after the program exits.
// Route forked stdout through unmodified and drop the success banner.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not another setting —
// exempt it from the unused-key lint (the warning itself pollutes stdout).
Global / excludeLintKeys += showSuccess
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
// Driver heap: SPARK_DRIVER_MEM wins; otherwise scale to the host
// (quarter of physical RAM, clamped to [2g, 24g]) so small machines
// don't fail to start and the 128 GiB bench host still gets low-GC
// headroom for the sf0.1 local[32] runs.
def defaultHeapGiB: Long = {
  val total =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getTotalMemorySize
      case _                                           => 0L
    }
  math.max(2L, math.min(24L, total / 4 / (1L << 30)))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGiB}g")}",
)
