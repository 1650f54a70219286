ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "telecomdataengineeringpipelinespark"
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
// Forked run output normally passes through sbt's logger, which
// prefixes every line with "[info] " — so the Bench/Verify JSON
// contract lines never start with '{' in captured stdout (the
// ten-rounds-running parsed:null in BENCH_rN.json). StdoutOutput
// hands the forked process's stdout through verbatim.
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
  // default sized for local[32] parity with the driver's bench JVM
  // (BENCH_r03 tail shows a 53 GiB block manager there): at 8g a
  // 32-thread suite run GC-thrashes — q105 measured 39 s under the
  // 8g default vs 9.6 s at 64g in the same minute. The box has
  // 128 GiB; this is a cap, not an allocation.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // 128 queries x whole-stage-codegen'd plans x 3 bench reps overflow
  // the 240 MB default JIT code cache mid-suite — the signature is a
  // query measuring several x slower in-suite than isolated minutes
  // apart (q119: 5.9 s in-suite, 1.7 s isolated on identical code)
  "-XX:ReservedCodeCacheSize=512m",
)
