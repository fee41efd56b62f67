package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measurement harness (guide §1): runs named queries under the same
  * session shape as [[Bench]] and prints a per-Spark-job time breakdown
  * so a query's wall can be attributed to cluster work (jobs) vs
  * driver-side gaps (planning, manifest I/O, footer reads, commit
  * protocol). Each query runs `reps` times (default 2) — the first
  * absorbs first-invocation JIT, the LAST run's breakdown is printed,
  * matching the bench's min-of-N steady-state contract. Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.Profile <sfDir> name1,name2 [reps]
  * Diagnostic tooling only — never on the driver's bench path.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class Job(id: Int, desc: String, site: String, start: Long,
      var end: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobs.put(e.jobId, Job(e.jobId, desc, site, System.nanoTime()))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = System.nanoTime())
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      var t0 = 0L; var t1 = 0L
      (1 to reps).foreach { r =>
        jobs.clear()
        t0 = System.nanoTime()
        fn(spark, sfDir).count()
        t1 = System.nanoTime()
        println(f"[profile] $n rep $r wall ${(t1 - t0) / 1e9}%.3f s")
      }
      // give the async listener bus a beat to drain job-end events
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.start)
      val jobSum = js.map(j => (j.end - j.start) / 1e9).sum
      println(f"[profile] $n LAST wall ${(t1 - t0) / 1e9}%.3f s, " +
        f"${js.size} jobs summing $jobSum%.3f s, " +
        f"driver gap ${(t1 - t0) / 1e9 - jobSum}%.3f s")
      js.foreach { j =>
        val d = (j.end - j.start) / 1e9
        if (d > 0.005)
          println(f"[profile]   job ${j.id}%4d ${d}%7.3f s  " +
            f"+${(j.start - t0) / 1e9}%7.3f  ${j.site}  ${j.desc.take(80)}")
      }
    }
    spark.stop()
  }
}
