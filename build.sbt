ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vectordbaccandspeedexpspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession (GraftSpec.getOrCreate) and several
// assert on JVM-global state (sparkContext.getPersistentRDDs deltas in
// CacheLifecycleSpec/ClustersSpec); parallel suites would interleave
// persists between those snapshots and flake. One shared local[4]
// session gains little from suite-level parallelism anyway.
Test / parallelExecution := false
run / fork := true
// Pass the forked JVM's stdout/stderr through verbatim instead of
// re-logging each line with an "[info] "/"[error] " prefix — Bench's
// one-line JSON contract requires a bare parseable line on stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and suppress sbt's trailing "[success] Total time: ..." line, which
// otherwise prints AFTER Bench's JSON and becomes the last stdout line
// (BENCH_r02.json had "parsed": null for exactly this reason — the
// driver parses the final line of output).
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude it
// from the unused-key lint so the warning doesn't pollute driver logs.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
