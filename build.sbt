ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sql_data_integration_toolspark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// One shared SparkSession across suites.
Test / parallelExecution := false

// Sandboxed container blocks the JDK-17 posix_spawn helper; fall back to
// plain fork so Hadoop's shell-outs (chmod on checkpoint dirs) work.
javaOptions += "-Djdk.lang.Process.launchMechanism=FORK"

// The driver parses the LAST line of `sbt "runMain graft.Bench"` output as
// the bench result JSON. Two sbt behaviors broke that for two rounds
// running (r12/r13 BENCH parsed=null): (1) the forked JVM's stdout is
// re-logged with an "[info] " prefix by the default LoggedOutput strategy;
// (2) sbt prints "[success] Total time..." AFTER the run, so the JSON is
// never the final line. StdoutOutput passes the child's stdout/stderr
// through raw, and showSuccess drops the trailer — together the result
// JSON printed by Bench (which halt(0)s immediately after) is the last
// thing on stdout.
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
Compile / runMain / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
