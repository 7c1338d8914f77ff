package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

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

  /** Query-battery entry: two-phase salted aggregation over lineitem —
    * result must be value-identical to a plain GROUP BY (the oracle runs
    * the plain form), proving the salting is a pure re-plan. Decimal-cast
    * sums per the cross-engine float discipline. */
  def sk01SaltedAgg(s: SparkSession, d: String, salts: Int = 8): DataFrame = {
    import QueryUtils.D2
    saltedAggregate(Tables.lineitem(s, d), col("l_returnflag"), salts,
      partial = Seq(
        sum(col("l_quantity").cast(D2)).as("p_qty"),
        count(lit(1)).as("p_n")),
      merge = Seq(
        sum(col("p_qty")).cast("double").as("sum_qty"),
        sum(col("p_n")).as("n")))
      .withColumnRenamed("__key", "l_returnflag")
      .orderBy("l_returnflag")
  }

  val sk01Sql: String =
    """SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS n
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

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

  /** Query-battery entry: salted fact⋈dimension join — lineitem against an
    * 8-way-replicated supplier, aggregated per nation. The oracle runs the
    * PLAIN join, so a hash match proves the salt+replicate re-plan changes
    * the shuffle key distribution and nothing else. (The salt itself is
    * partitioning-dependent and random-looking by design; correctness
    * can't depend on it because every fact row meets exactly one replica
    * of its dimension row.) */
  def sk02SaltedJoin(s: SparkSession, d: String, salts: Int = 8): DataFrame = {
    import QueryUtils.dsum
    saltedJoin(Tables.lineitem(s, d), Tables.supplier(s, d),
        "l_suppkey", "s_suppkey", salts)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("s_nationkey")
  }

  val sk02Sql: String =
    s"""SELECT s_nationkey, COUNT(*) AS n,
       ${QueryUtils.sqlDsum("l_extendedprice")} AS sum_price
       FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
       GROUP BY s_nationkey ORDER BY s_nationkey"""
}
