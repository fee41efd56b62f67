package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Text-format sources with explicit schemas and parse-failure policy —
  * the reader-side of the reference's edge validation:
  *
  *  - FAILFAST      ≡ the gateway RequestValidator rejecting the request
  *                    before the handler runs (R25,
  *                    `/root/reference/serverless.core.yml:165-170`)
  *  - PERMISSIVE +  ≡ the tolerant `default=None` extraction path plus
  *    corrupt column   typed error routing (R18/R19: malformed JSON →
  *                    415, `common/aws_utils/api_gateway.py:126-137`) —
  *                    bad records survive as rows with every data field
  *                    null and the raw text in `_corrupt_record`, ready
  *                    for `EtlOps.errorSplit`
  *  - DROPMALFORMED ≡ silently skipping bad records (no reference
  *                    analog; provided for completeness)
  *
  * Scale notes: schema-on-read with an EXPLICIT StructType — never
  * `inferSchema` (a full extra pass over 100 TB). JSON/CSV scans are
  * splittable by line, so parallelism comes free; columnar pruning does
  * NOT (text formats read whole lines — land curated data as parquet,
  * these readers are for ingestion edges). */
object Formats {

  val CorruptCol = "_corrupt_record"

  /** JSON-lines reader. For PERMISSIVE mode the corrupt-record column is
    * appended to the schema automatically. */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame = {
    val s =
      if (mode.equalsIgnoreCase("PERMISSIVE") && !schema.fieldNames.contains(CorruptCol))
        schema.add(CorruptCol, "string")
      else schema
    spark.read
      .schema(s)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** CSV reader with header, explicit schema, same mode semantics. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame = {
    val s =
      if (mode.equalsIgnoreCase("PERMISSIVE") && !schema.fieldNames.contains(CorruptCol))
        schema.add(CorruptCol, "string")
      else schema
    spark.read
      .schema(s)
      .option("header", "true")
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
  }
}
