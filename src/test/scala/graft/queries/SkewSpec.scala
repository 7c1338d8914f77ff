package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** Salted operators must be value-equivalent to their unsalted forms on a
  * deliberately skewed dataset (90% of rows share one key). */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def skewed = {
    import spark.implicits._
    ((1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong)))
      .toDF("k", "v")
  }

  test("salted aggregate equals plain aggregate") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(skewed, col("k"), salts = 8,
        partial = Seq(sum("v").as("ps"), count(lit(1)).as("pc")),
        merge = Seq(sum("ps").as("sum_v"), sum("pc").as("n")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val dim = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("dk", "attr")
    val plain = skewed.join(dim, col("k") === col("dk"))
      .groupBy("attr").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk", salts = 8)
      .groupBy("attr").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(salted == plain)
  }
}
