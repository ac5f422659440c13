ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pappermatespark"
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
// Forked run output goes RAW to this process's stdout/stderr (no sbt
// "[info] " prefix) — the driver parses graft.Bench's one-line JSON from
// stdout, and a logger prefix breaks its json parse (BENCH_r01: parsed null).
run / outputStrategy := Some(StdoutOutput)
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
  // 20g default: the bench's 16x-replicated sf0.1 corpus + 32 executor
  // threads GC-thrash at 8g (driver-run BENCH_r01 measured 3.4k docs/s vs
  // ~190k in a right-sized JVM — a heap artifact, not a plan property).
  // The sandbox has 128 GiB; a real cluster sizes executor heaps the same way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  // Throughput collector: the extraction hot path is allocation-heavy
  // (regex + string churn across 32 executor threads); ParallelGC
  // measures ~10-15% faster than G1 here and narrows the 8->32 scaling gap.
  "-XX:+UseParallelGC",
)
