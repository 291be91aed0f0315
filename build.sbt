ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aprsdbspark"
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
// Forked run output goes straight to this process's stdout, NOT through the
// sbt logger: the logger prefixes every line with "[info] ", which breaks any
// consumer scanning for lines that START with '{' (the driver's bench-JSON
// capture parsed null in rounds 1-2 for exactly this reason).
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
  // 16g default: the bench holds 310 memoized physical plans plus every
  // compiled codegen class; at 8g the old-gen pressure showed up as
  // multi-hundred-ms GC smear on interleaved timed passes (host has 128g).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // extra JVM flags for A/B probes (GC sweeps etc.); empty by default so
  // the driver's runs are unaffected unless it opts in
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(
  _.split(' ').filter(_.nonEmpty))
