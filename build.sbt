ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cellbasespark"
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
// The driver parses Bench's final stdout line as JSON. By default sbt
// routes forked-run output through its logger ("[info] {json}") and
// appends a "[success] Total time..." line — both defeat a per-line
// json parse (BENCH_r01..r04 all show parsed:null). StdoutOutput
// passes child stdout through raw; showSuccess drops the trailer, so
// the summary JSON is the genuinely last line sbt emits.
run / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
// showSuccess is read by sbt's command engine, not by a task — lint
// can't see that
Global / excludeLintKeys += showSuccess
// Suites share one SparkSession (SparkSpec.session) and two of them
// mutate session-global state (Caches.clear, the replay-scoped
// shuffle-partition override) — run suites sequentially; Spark itself
// still parallelizes within each job.
Test / parallelExecution := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Throughput collector for the batch mains: G1 (the JDK 17 default)
  // optimizes pause time, which nothing here needs — ConfBench A/B at
  // sf0.1 measured ParallelGC 8-20% faster warm across agg/window/
  // dedup/text shapes (OPTIMIZATION_r21.md §global). Overridable: any
  // -XX flag in GRAFT_JAVA_OPTS is appended later and wins.
  "-XX:+UseParallelGC",
) ++ sys.env.get("GRAFT_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
