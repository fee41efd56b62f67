package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-parity helpers (SURVEY.md §5.3).
  *
  * Spark's `round(double, n)` routes through `BigDecimal.valueOf`, i.e. the
  * double's shortest decimal string — so a computed value whose true decimal
  * expansion is 19570.81499… but prints as "19570.815" rounds UP. DuckDB
  * rounds the raw double (std::round on the scaled value) and gets .81.
  * `dround` reproduces DuckDB's semantics on the identical IEEE input double:
  * sign(x) * floor(|x|*10^n + 0.5) / 10^n — verified cell-exact against
  * DuckDB on all computed lineitem/customer doubles at sf0.01.
  *
  * Use `dround` for EVERY computed double — products, divisions, powers,
  * AND post-aggregation sums/avgs (an accumulated sum can land on a
  * .xx5-boundary even when its inputs are 2-decimal; "verified green on
  * the current fixtures" is fixture luck, not a contract, and the driver
  * regenerates testdata between rounds). Plain `round` remains fine only
  * for doubles already n-decimal in the DATA, where round is the identity.
  */
object Parity {

  /** DuckDB-compatible half-away-from-zero round of a double to `n` places. */
  def dround(c: Column, n: Int): Column = {
    val p = math.pow(10.0, n)
    val pos = floor(c * p + lit(0.5)) / p
    val neg = -(floor(-c * p + lit(0.5)) / p)
    when(c >= 0, pos).otherwise(neg)
  }

  /** Scala-side twin of `dround(_, 4)` for imperative kernels — must stay
    * in lockstep with the Column form so block kernels rank on exactly
    * the oracle's rounded values. */
  def dround4(x: Double): Double =
    if (x >= 0) math.floor(x * 1e4 + 0.5) / 1e4
    else -(math.floor(-x * 1e4 + 0.5) / 1e4)
}
