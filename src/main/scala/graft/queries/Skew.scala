package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities — at 100 TB a handful of hot keys (the empty
  * document, a boilerplate URL, a null-ish user id) can pin one reducer for
  * hours. Two standard remedies, composable with any of the battery's
  * operators:
  *
  *   - [[saltedAggregate]]: two-phase aggregation — keys are salted into
  *     `salts` subkeys, partially aggregated, then re-aggregated. Correct
  *     for any algebraic aggregate (sum/count/min/max); Spark's partial
  *     aggregation does this for simple cases, but explicit salting also
  *     spreads the FINAL aggregation of a hot key across reducers.
  *   - [[saltedJoin]]: fact-side keys get a random salt in [0, salts); the
  *     (small) dimension side is replicated `salts` times so every salted
  *     fact key still finds its match. Turns one hot reducer into `salts`
  *     even ones at the cost of a dimension replica per salt.
  *
  * (AQE's skew-join handling covers sort-merge joins at runtime; these are
  * for the cases AQE can't see — aggregations and broadcast-ineligible
  * medium dimensions.)
  */
object Skew {

  /** Two-phase salted aggregation: `aggs` must be algebraic with a merge
    * expression per output (e.g. partial sum → sum, partial count → sum). */
  def saltedAggregate(df: DataFrame, key: Column, salts: Int,
                      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(salts)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__key"))
      .agg(merge.head, merge.tail: _*)

  /** Salted equi-join of a skewed fact side against a dimension small enough
    * to replicate `salts` times (but perhaps too large / excluded from
    * broadcast). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(factKey), spark_partition_id(), monotonically_increasing_id()),
        lit(salts)))
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(explodedDim,
        saltedFact(factKey) === explodedDim(dimKey) &&
          saltedFact("__salt") === explodedDim("__salt"))
      .drop("__salt")
  }
}
