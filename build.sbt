ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mongraphspark"
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
// The driver captures a bounded TAIL of stdout and parses the LAST line
// as JSON (BENCH_r17.json: parsed=null because sbt's logger prefixed the
// forked run's headline with "[info] " and appended its own "[success]"
// line after it). StdoutOutput passes the forked JVM's stdout through
// UNPREFIXED, and showSuccess=false drops the trailing success banner —
// so a main's final println IS the final stdout line, parseable as-is.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude
// it from the unused-key lint
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++
  // extra -D system properties for a specific run (e.g. the 100x scale
  // probes set -Dspark.io.compression.codec=zstd so a single rep's
  // shuffle files fit the box's scratch disk); space-separated
  sys.env.get("SPARK_GRAFT_EXTRA_OPTS").toSeq
    .flatMap(_.split(" ").filter(_.nonEmpty))
