ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lmo_data_catalogspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// all suites share ONE SparkSession (SparkSpec) — parallel suites race
// on session-level state (conf flips, the CacheManager, memory-sink
// tables) and flake the plan-shape pins; suites must run sequentially
Test / parallelExecution := false
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Default sized to the sandbox (128 GiB): the r5 driver bench showed
  // an 8g heap GC-thrashing q58's connected-components loop after 57
  // prior queries' broadcast/cache churn (102.7 s vs 12.9 s standalone).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // SPARK_GRAFT_GCLOG=/path/gc.log turns on unified GC logging in the
  // forked run JVM — the full-battery drift investigation's instrument
  // (read at sbt load; one env var per sbt invocation).
) ++ sys.env.get("SPARK_GRAFT_GCLOG").map(f => s"-Xlog:gc*:file=$f").toSeq

scalacOptions += "-deprecation"
