ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parquetcommonspark"
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
// Rounds 1-4 all lost the official bench result to delivery geometry:
// the driver keeps the last 2,000 chars of `sbt "runMain graft.Bench"`
// stdout and parses the JSON headline from it. By round 4 the headline
// was complete and valid — but arrived as "[info] {...}" (sbt's logger
// decorates forked-child stdout) with "[success] Total time: ..." as
// the literal last line, so it never parsed. Two fixes:
//   1. StdoutOutput — the forked child's stdout passes through RAW
//      (inherited fd), no "[info] " prefix on the headline;
//   2. showSuccess := false — no "[success]" trailer, so the compact
//      headline is the last stdout line, exactly as the driver expects.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g: local[32] means up to 32 concurrent parquet writer buffers
  // (128MB row groups) + vectorized reader batches of array<int32> rows
  // — 8g OOMs on the 1B-token bench corpus
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // ParallelGC, not G1: repeated encode jobs under G1 degrade
  // progressively (measured 32s -> 66s -> 137s for identical runs;
  // in-thread CPU inflating 10x with near-zero reported GC pause —
  // G1 region-management slow paths charge the allocating threads).
  // ParallelGC holds steady (32s -> 21s -> 24s) and is the right
  // throughput collector for batch encode anyway.
  "-XX:+UseParallelGC",
  // size GC for the cores a job actually uses, not the host's 32 vCPUs:
  // the default (23 threads) makes young GCs take seconds under
  // co-tenant pressure (bench children override per-level)
  "-XX:ParallelGCThreads=8",
)
