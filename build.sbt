ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "qradarrestapikafkadatapipelinespark"
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
  // local[32] runs 32 concurrent tasks in ONE JVM: 8g starves the unified
  // memory manager into GC storms (measured 20x slowdown); the box has 128g.
  // Fixed heap size (no resize churn). NOT AlwaysPreTouch: this VM commits
  // pages at only ~300MB/s, so pre-touching tens of GB costs minutes per
  // launch; with System.gc() between queries (see Bench) the GC recycles
  // already-faulted pages and steady-state stays fast.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // a 60-query suite generates hundreds of Janino classes + JIT'd methods;
  // the 240m default code cache evicts hot code mid-suite (silent 5-15x
  // degradation on later queries, no warning below the 'full' threshold)
  "-XX:ReservedCodeCacheSize=1g",
)
