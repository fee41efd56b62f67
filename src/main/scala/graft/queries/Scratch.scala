package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness — not part of the library; deleted before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    s.range(1 << 20).selectExpr("sum(id)").collect()
    for (name <- Seq("q_corpus_curate", "q_dup_clusters", "q_minhash_lsh"))
      time(name)(graft.SparkEntry.queries(name)(s, d).write
        .mode("overwrite").format("noop").save())
    s.stop()
  }
}
