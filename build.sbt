ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etl8x8spark"
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
// 32 g default heap: local[32] runs 32 concurrent tasks whose shuffle
// and aggregation buffers, cached frames, and streaming state stores
// all share this one JVM — at 8 g the bench GC-thrashed (measured 28 s
// of run-to-run variance on an idle box); the container has 128 GiB.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Throughput collector by default: with 32 task threads saturating the
  // box, G1's concurrent cycles steal cores from the hot loop (measured
  // 68.8 s G1 vs 63.5 s parallel on the full sf0.1 bench, wins spread
  // across the suite). Env-swappable for A/B: SPARK_GRAFT_GC=g1.
  sys.env.get("SPARK_GRAFT_GC") match {
    case Some("g1") => "-XX:+UseG1GC"
    case _ => "-XX:+UseParallelGC"
  },
) ++
  // Large fixed young generation by default (round-8 A/B on the full
  // sf0.1 bench: gc 15.9 s → 7.6 s, steady pass walls ~100 s → ~90 s):
  // nearly all bench allocation is short-lived shuffle/agg garbage, so
  // a large fixed nursery keeps it from promoting and turns
  // ParallelGC's lumpy full collections (the round-3 run-to-run
  // variance — multi-second GC landing on random trivial queries) into
  // cheap minor ones. The default is DERIVED from the resolved heap
  // (¾ of -Xmx, only when the heap is ≥ 12 g) so shrinking
  // SPARK_DRIVER_MEM alone can never produce an unbootable
  // nursery > heap configuration. Override with SPARK_GRAFT_XMN=<size>,
  // disable with SPARK_GRAFT_XMN=off.
  (sys.env.get("SPARK_GRAFT_XMN") match {
    case Some("off") => Seq.empty
    case Some(x) => Seq(s"-Xmn$x")
    case None =>
      val gigs = "(?i)^(\\d+)([gm])$".r
      sys.env.getOrElse("SPARK_DRIVER_MEM", "32g").trim match {
        case gigs(n, u) =>
          val g = if (u.equalsIgnoreCase("g")) n.toDouble else n.toDouble / 1024
          if (g >= 12) Seq(s"-Xmn${(g * 3 / 4).toInt}g") else Seq.empty
        case _ => Seq.empty
      }
  })
