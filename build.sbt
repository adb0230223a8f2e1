ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datalakebreweriestwospark"
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
// The driver parses the bench's LAST stdout line as JSON. sbt's default
// LoggedOutput routes forked-run output through its logger — "[info] "
// prefixed on every line, "[success]" banner appended — which kept the
// driver's parse null for eight rounds even after the summary line was
// made compact. StdoutOutput hands the forked JVM the real stdout/stderr
// (raw, unprefixed); showSuccess=false kills the trailing banner so the
// program's own summary line is the literal last stdout line.
outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // 16g default: at 32 local threads over sf0.1, an 8g heap produced
  // multi-second GC stalls that polluted bench timings (q94 36.7 s cold
  // vs 1.5 s warm) — the box has 128 GiB, so buy GC headroom
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
