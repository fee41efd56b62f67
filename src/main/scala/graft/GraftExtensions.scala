package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.functions.{BitsetIntersectCount, BloomContains, DotProductF, DotProductFD, NfcNormalize, QuantileBucket, SortedIntersectCount}

/** SparkSessionExtensions entry point: activate with
  * `--conf spark.sql.extensions=graft.GraftExtensions` so every session
  * on the cluster gets the library's native expressions without code
  * changes (SURVEY.md §2 preference (c) registration path). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot_f"),
      DotProductF.info,
      (children: Seq[Expression]) => DotProductF(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot_fd"),
      DotProductF.infoFD,
      (children: Seq[Expression]) => DotProductFD(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bitset_icnt"),
      BitsetIntersectCount.info,
      (children: Seq[Expression]) => BitsetIntersectCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_icnt"),
      SortedIntersectCount.info,
      (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      BloomContains.info,
      BloomContains.builder))
    ext.injectFunction((
      FunctionIdentifier("graft_qbucket"),
      QuantileBucket.info,
      (children: Seq[Expression]) => QuantileBucket(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      NfcNormalize.info,
      NfcNormalize.builder))
    // SQL front door for the committed table: snapshot / time-travel /
    // CDC reads as table-valued functions (graft.plans.TableFunctions)
    graft.plans.TableFunctions.all.foreach(ext.injectTableFunction)
    // SQL-statement DML (round-14): MERGE INTO / DELETE FROM / UPDATE
    // on GraftCatalog tables lower onto the TableCommit verbs during
    // resolution — one OCC/DV kernel behind every front door
    ext.injectResolutionRule(graft.plans.GraftSqlDmlRule.apply)
  }
}
