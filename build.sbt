ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vastdb_sdkspark"
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
// Pass the forked process's stdout/stderr through UN-PREFIXED: the default
// LoggedOutput decorates every stdout line with "[info] ", which is why a
// harness tail-parsing `sbt runMain graft.Bench` output for the bare JSON
// result line has never matched (13 rounds of `parsed: null`). With
// StdoutOutput the JSON line lands verbatim.
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
// Cap the forked heap at 31g: past ~32g HotSpot silently drops
// CompressedOops (every object pointer doubles), which slows
// allocation-heavy paths several-fold and balloons GC — observed as a
// 30x bench regression when run with a ~90g heap. Nothing here needs >31g.
val forkedHeap: String = {
  val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
  val gb = "^([0-9]+)[gG]$".r
  req match {
    case gb(n) if n.toInt > 31 => "31g"
    case other => other
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$forkedHeap",
  "-XX:+UseCompressedOops",
)
