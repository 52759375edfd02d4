ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tonindexerspark"
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
// Driver tail-parse contract: graft.Bench's final act is printing ONE
// bare JSON line, and the driver reads the LAST stdout line. Two sbt
// defaults broke that in r13/r14 (`parsed: null`): the logger prefixes
// forked-run stdout with "[info] ", and sbt prints "[success] Total
// time…" AFTER the program exits. Route forked output straight to
// stdout and drop the success banner so the JSON is genuinely last.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not by settings — the
// lintUnused heuristic can't see that
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
  // local[32] with three cached pipeline variants needs real heap room;
  // the box has 128 GiB and a starved heap turns bench runs into GC noise
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
) ++ sys.env.get("GRAFT_JFR").map(f =>
  s"-XX:StartFlightRecording=maxsize=256m,filename=$f").toSeq
