ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "automatedetlpipelinespark"
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
// The round driver parses graft.Bench's single JSON stdout line as the
// LAST line of the run; sbt's "[success] Total time…" epilogue defeated
// that parse four rounds running (BENCH_r05–r08 "parsed: null").
// Suppress the epilogue and pipe forked run output straight to stdout
// (no "[info]" prefix mangling) so the JSON object ends the stream.
Global / showSuccess := false
run / outputStrategy := Some(StdoutOutput)
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
  // 8g is GC-bound running the full 88-query bench in one JVM (measured:
  // +45% total, one join query 2.5× slower); 16g restores stable timings
  // and 24g shaves GC tail-latency off the heavy fits/joins (measured at
  // 32g: GLM 12→7.5 s, Jaccard 10→4.9 s on noisy runs)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
