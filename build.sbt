ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "graphdatabasesspark"
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
// Pass the forked JVM's stdout straight through instead of wrapping each
// line in sbt's "[info] " logger prefix: the bench/verify harness parses
// the raw one-line JSON from `runMain graft.Bench`, and the prefix made
// it unparseable (BENCH_r01/r02 both recorded parsed:null).
run / outputStrategy := Some(StdoutOutput)
// ... and drop sbt's own "[success] Total time" trailer for the same
// reason: the bench JSON must be the last line of output.
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
  // local-mode Spark = single JVM: the driver heap IS the executor
  // memory. 8g covers the driver's scale factors; raise via
  // SPARK_DRIVER_MEM for bigger runs, but stay UNDER 32g — at >=32g the
  // JVM disables compressed oops (8-byte object references) and
  // pointer-heavy stages slow measurably.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
