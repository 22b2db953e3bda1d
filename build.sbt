ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "frafkaspark"
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
// The round driver machine-reads the LAST line of `runMain graft.Bench`
// output.  Two sbt decorations defeated that parse for six rounds:
// LoggedOutput wraps forked stdout in "[info] " prefixes, and the
// "[success] Total time..." line prints AFTER the program's final JSON.
// StdoutOutput passes forked output through bare; showSuccess drops the
// trailer — together the bench's JSON line is bare AND last.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consulted by the command loop, not by a task — sbt's
// unused-key lint can't see that; silence the false positive
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // JDK-8192647 class of spurious OOM: a thread allocating while another
  // thread holds the GCLocker (JNI critical section — parquet/zstd native
  // IO does this constantly under 32-way scans) retries only twice by
  // default, then throws "Java heap space" with the heap NOT exhausted.
  // Observed live: the r19 sf10 cold pass died in basket_rules' pair
  // stage with "Retried waiting for GCLocker too often" immediately
  // before the OOM while storage blocks were spilling to disk as
  // designed.  Raising the retry budget removes the spurious kill
  // without changing heap size or measurement semantics.  (Diagnostic
  // option on JDK 17 — the unlock flag must precede it.)
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
)
