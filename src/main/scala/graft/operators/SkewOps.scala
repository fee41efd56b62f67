package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §4 physical knobs: "salting
  * pattern documented for skewed keys").
  *
  * AQE's skew-join splitting handles sort-merge joins automatically;
  * these operators cover the cases it doesn't: skewed AGGREGATIONS and
  * broadcast-ineligible skewed joins. The pattern is the standard
  * two-phase salt: scatter the hot key over `salts` sub-keys, partial-
  * aggregate, then merge — turning one straggler partition into `salts`
  * even ones. Deterministic salting (hash of a secondary column, not
  * rand()) keeps results reproducible and retry-safe (a rand() salt
  * re-rolls on task retry and can double-count). */
object SkewOps {

  /** Two-phase salted aggregation: count/sum-style aggs per `key`,
    * salted by `salts` deterministic sub-keys derived from `saltBy`.
    *
    * @param aggs (aggregate column, merge column) pairs; e.g.
    *             (count(*) as c, sum(c) as c) — the merge must be the
    *             associative combiner of the partial. */
  def saltedAgg(df: DataFrame, key: Column, saltBy: Column, salts: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val salted = df.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val partial = salted.groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head, partials.tail: _*)
    partial.groupBy(col("__key"))
      .agg(merges.head, merges.tail: _*)
      .withColumnRenamed("__key", "key")
  }

  /** Salted join of a skewed fact against a dim too big to broadcast:
    * fact rows get a deterministic salt in [0, salts) derived from
    * `saltBy` (a fact-side natural-key column — NOT rand() and NOT
    * monotonically_increasing_id(), both of which re-roll under task
    * retry/repartition and break the module's reproducibility
    * contract); the dim is replicated `salts` times so every
    * (key, salt) pair matches. The shuffle then spreads each hot key
    * over `salts` partitions at the cost of a `salts`× dim
    * replication — the classic trade.
    *
    * @param saltBy fact column(s hash) deciding the sub-partition; pick
    *               a high-cardinality natural key so a hot join key's
    *               rows spread evenly */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
      dimKey: Column, salts: Int, saltBy: Column): DataFrame = {
    // salts=0 is a runtime DIVIDE_BY_ZERO under ANSI, or a silently
    // EMPTY join under non-ANSI (null salt never matches) — fail here
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(explodedDim,
      factKey === dimKey && saltedFact("__salt") === explodedDim("__salt"))
      .drop("__salt")
  }
}
