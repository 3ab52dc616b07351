ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataengineerjobscraperetlspark"
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
// Pass the forked process's stdout straight through instead of tagging
// every line with sbt's `[info] ` logger prefix: graft.Bench prints a
// machine-parsed JSON metric line, and the prefix broke the driver's parse
// (BENCH_r01 "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and drop sbt's own "[success] Total time: ..." trailer, which lands
// on stdout AFTER the metric line — the driver parses the LAST stdout line
// and recorded "parsed": null in BENCH_r04 because the trailer was last.
Global / showSuccess := false
// (showSuccess is consumed by sbt's command layer, which the lint can't see)
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
  // The bench host has 128 GiB; 8g starved a 32-thread shuffle-heavy run
  // into GC thrash (d2/d3 erratically 20-100x their isolated times).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // JDK 17 defaults to a 240 MB JIT code cache. A multi-query run (28
  // warmup + 28 timed benches in one JVM) generates enough Janino
  // whole-stage-codegen classes to fill it, after which HotSpot prints
  // "CodeCache is full. Compiler has been disabled." and every later hot
  // loop runs INTERPRETED — the 80× erratic slowdowns seen on the
  // shingle-heavy dedup queries (d3 304 s official vs 3.5 s judge rerun).
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
  // HotSpot refuses to JIT methods over 8000 bytecode by default, while
  // Spark's codegen.hugeMethodLimit=8000 lets generated methods right up to
  // that edge through — anything in the gap runs INTERPRETED Janino
  // bytecode. Measured: identical d3 runs at 5.3 s vs 229 s depending on
  // which side of the JIT the hot HashAggregate landed. Compiling huge
  // methods unconditionally removes the roulette.
  "-XX:-DontCompileHugeMethods",
  // GC visibility: multi-10s whole-JVM stalls (all executors idle, stages
  // stuck) are indistinguishable from scheduler bugs without this.
  "-Xlog:gc*=info:file=/tmp/graft_gc_%p.log:time,uptime:filecount=2,filesize=10m",
)
