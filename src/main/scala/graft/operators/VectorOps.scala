package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector arithmetic over fixed-dimension array columns.
  *
  * Higher-order functions (`aggregate`/`zip_with`) are interpreted —
  * each lambda step leaves codegen — which costs ~10 µs per 64-dim dot
  * and dominates all-pairs similarity (measured: 27 s for 4M pairs at
  * sf0.1). For a KNOWN dimension, unrolling into `a[0]*b[0] + a[1]*b[1]
  * + …` keeps the whole expression inside WholeStageCodegen. The fold
  * order is identical (left-to-right), so results — and DuckDB
  * `list_dot_product` parity — are bit-for-bit unchanged. */
object VectorOps {

  /** Σ a[i]·b[i], unrolled over a compile-time dimension. */
  def dot(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map(i => a.getItem(i) * b.getItem(i)).reduce(_ + _)

  /** Σ a[i]², unrolled. */
  def normSq(a: Column, dim: Int): Column =
    (0 until dim).map(i => { val x = a.getItem(i); x * x }).reduce(_ + _)

  def l2Norm(a: Column, dim: Int): Column = sqrt(normSq(a, dim))

  // Float-array variants: cast each ELEMENT at access instead of taking
  // a pre-cast `transform(arr, cast)` column. CollapseProject inlines a
  // transform alias into every getItem, so an unrolled dot over the
  // alias re-evaluates the 64-cast transform 64 times (measured 64×
  // blowup in the LSH bucket stage). Element-wise casts sidestep the
  // duplication and stay bit-identical (each element cast exactly once
  // per use, same add order).

  /** Σ double(a[i])·double(b[i]) over float arrays. */
  def dotF(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map(i =>
      a.getItem(i).cast("double") * b.getItem(i).cast("double")).reduce(_ + _)

  /** Σ double(a[i])·c(i) against per-dimension literal constants. */
  def dotLit(a: Column, consts: Seq[Double]): Column =
    consts.zipWithIndex.map { case (c, i) =>
      a.getItem(i).cast("double") * lit(c)
    }.reduce(_ + _)

  /** L2 norm of a float array, element-cast. */
  def l2NormF(a: Column, dim: Int): Column =
    sqrt((0 until dim).map { i =>
      val x = a.getItem(i).cast("double"); x * x
    }.reduce(_ + _))
}
