ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "amazonclimatedataetlspark"
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
// Forward forked-run output RAW (no "[info] " prefix): the driver parses
// Bench's single JSON stdout line, and sbt's default logger prefix would
// otherwise wrap it.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // ~90 queries/run x whole-stage-codegen classes overflow the default
  // 240m code cache; when it fills, the JIT disables itself and random
  // queries run interpreted (observed sporadic 10-25 s stalls on
  // otherwise sub-second queries during the timed Bench pass).
  // 70+ queries x 2 bench passes generate thousands of codegen classes;
  // 512m still thrashed (flushed/recompiled methods made steady-state
  // passes 5x slower for late-iterated queries), and at 77 queries 1g
  // thrashed too (HOF-heavy queries 10x: embed_near_dup 1.5 -> 15.9 s
  // in-bench). 2g (the JVM hard max) held 119 queries; at 124 the same
  // thrash signature returned (embed_near_dup 0.6 -> 10.4 s, dedup
  // family 2-3x). Since the cache can't grow further, graft.Bench cuts
  // the demand instead: above ~50 queries it shards the registry
  // round-robin across sequential child JVMs (SPARK_GRAFT_SHARD env),
  // each with its own fresh 2g cache. Don't "fix" a slow bench here —
  // this value is already at the JVM hard max.
  "-XX:ReservedCodeCacheSize=2g",
)
