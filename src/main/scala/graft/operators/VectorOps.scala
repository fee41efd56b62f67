package graft.operators

import org.apache.spark.sql.Column

/** Dimension-unrolled vector arithmetic over fixed-dimension array
  * columns — the historical pre-native form, kept ONLY as the
  * independent parity cross-check for the `graft_dot_f` Catalyst
  * expression (DotProductFSpec pins bit-equality between the two).
  *
  * Production code uses the native expressions (functions/DotProductF
  * — one codegen node, dimension-agnostic); the unused sibling helpers
  * (dot/normSq/l2Norm/dotLit/l2NormF) were deleted once DotProductF
  * superseded them — a parallel implementation with a lockstep
  * bit-parity contract and zero consumers is maintenance debt.
  *
  * Why element-wise casts (not a pre-cast `transform` alias):
  * CollapseProject inlines a transform alias into every getItem, so an
  * unrolled dot over the alias re-evaluates the 64-cast transform 64
  * times (measured 64x blowup in the LSH bucket stage). Per-element
  * casts stay bit-identical (each element cast exactly once per use,
  * same left-to-right add order as DuckDB `list_dot_product`). */
object VectorOps {

  /** Σ double(a[i])·double(b[i]) over float arrays, unrolled over a
    * compile-time dimension. */
  def dotF(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map(i =>
      a.getItem(i).cast("double") * b.getItem(i).cast("double")).reduce(_ + _)
}
