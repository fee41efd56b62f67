package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The one `private[sql]` bridge the streaming table source needs,
  * isolated in its own `org.apache.spark.sql` subpackage — the same
  * technique Delta Lake uses (its whole codebase lives under
  * `org.apache.spark.sql.delta` precisely to reach these seams; public
  * precedent: delta-io/delta, `DeltaLog.createDataFrame`). Everything
  * else in this repo stays in `graft.*` against public APIs; keep this
  * file minimal so the boundary stays auditable.
  *
  * Why it exists: a V1 streaming [[org.apache.spark.sql.execution
  * .streaming.Source]]'s `getBatch` must return a DataFrame whose
  * logical plan is flagged `isStreaming` — `MicroBatchExecution`
  * asserts it — but the frame we build for a micro-batch is an
  * ordinary pinned parquet read of the manifest-diff files. The flag
  * lives on [[LogicalRelation]] and is not settable through any public
  * surface. */
object StreamingBridge {

  /** Re-tag `df`'s TABLE-relation leaf as streaming and rebuild the
    * frame — the logical plan is otherwise unchanged, so Catalyst
    * plans the micro-batch exactly like the batch read it wraps.
    *
    * Only leaves carrying every column of `tableCols` are tagged: a
    * deletion-vector-covered snapshot read is an ANTI-JOIN of the
    * table relation against the small vector relation, and tagging
    * BOTH sides would turn it into a stream-stream anti-join (which
    * streaming refuses); tagging just the table side leaves a
    * supported stream ⋈ static join. A plan with no taggable leaf (an
    * EMPTY micro-batch is a LocalRelation) becomes an empty streaming
    * frame of the same schema. */
  def asStreaming(df: DataFrame, tableCols: Seq[String]): DataFrame = {
    val want = tableCols.toSet
    var tagged = false
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation
          if !lr.isStreaming && want.subsetOf(lr.output.map(_.name).toSet) =>
        tagged = true
        lr.copy(isStreaming = true)
    }
    val session = df.sparkSession.asInstanceOf[ClassicSession]
    if (tagged) Dataset.ofRows(session, plan)
    else session.internalCreateDataFrame(
      session.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      df.schema, isStreaming = true)
  }

  /** Wrap an arbitrary BATCH computation as a single streaming leaf:
    * the frame's physical RDD (lazy — nothing executes until the
    * micro-batch runs) under a streaming-tagged relation. The change-
    * feed micro-batch needs this shape: its plan is a UNION of
    * per-commit reads with literal projections (and occasionally a
    * LIMIT 0 for a metadata-only commit), which leaf-tagging cannot
    * express — streaming refuses Limit and stream/batch unions, while
    * one opaque streaming leaf over the computed rows is always
    * legal. The trade (no pushdown INTO the feed) is irrelevant:
    * change batches are change-sized by construction. */
  def wrapBatchAsStream(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[ClassicSession]
    session.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The engine-internal local-property key a running streaming query
    * publishes its queryId under — pinned to the engine's OWN constant
    * (`StreamExecution.QUERY_ID_KEY`) instead of a string literal, so
    * a Spark version moving the key breaks this COMPILE, not the
    * sink's txn identity at runtime. */
  def queryIdKey: String =
    org.apache.spark.sql.execution.streaming.runtime
      .StreamExecution.QUERY_ID_KEY

  /** The inverse, for the SINK side: a micro-batch frame handed to a
    * V1 `Sink.addBatch` is streaming-tagged and refuses `write` — the
    * standard connector move (Delta's `DeltaSink` does the same) is to
    * re-plan it as a batch frame over the incremental execution's RDD,
    * which the commit path can then write like any DataFrame. */
  def asBatch(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[ClassicSession]
    session.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
