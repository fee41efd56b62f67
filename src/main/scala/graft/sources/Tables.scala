package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * Maps the reference's event sources (SURVEY.md §2 R1/R2 —
  * `/root/reference/src/handlers.py:20,69`) onto columnar parquet scans: the
  * schema-on-read JSON event stream becomes `events.parquet` with a JSON
  * `props` column, and the relational tables stand in for enrichment dims
  * (R12/R13, `/root/reference/common/aws_utils/ssm.py:46-101`).
  *
  * At 100 TB these would be partitioned/bucketed external tables; the loader
  * keeps the API a plain scan so Catalyst can push filters and prune columns
  * into the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects. Read it as a raw long (legacy nanosAsLong) and rebuild a
    * microsecond timestamp with integer division — all testdata values are
    * µs-aligned so this is lossless, and avoiding double division keeps full
    * precision (ns-since-epoch exceeds a double's 53-bit mantissa). */
  private def eventsWithTs(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = eventsWithTs(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
