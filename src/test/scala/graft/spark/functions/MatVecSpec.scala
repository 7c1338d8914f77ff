package graft.spark.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** The OPQ rotation's codegen'd matrix×vector: correctness against a
  * driver-side multiply and a whole-stage-codegen pin (Janino failures
  * fall back to interpreted eval SILENTLY — this spec is the tripwire). */
class MatVecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import MatVec.matVec

  test("matches the driver-side multiply, codegen and interpreted") {
    val s = spark
    import s.implicits._
    val m = Array(
      Array(0.0, 1.0, 0.0),
      Array(1.0, 0.0, 0.0),
      Array(0.5, 0.5, -2.0))
    val vecs = Seq(Seq(1.0, 2.0, 3.0), Seq(-1.0, 0.0, 4.0))
    val got = vecs.toDF("e")
      .select(matVec(m, col("e")).as("r"))
      .collect().map(_.getSeq[Double](0).toSeq)
    val want = vecs.map(v => m.toSeq.map(row =>
      row.zip(v).map { case (a, b) => a * b }.sum))
    assert(got.toSeq == want, got.toSeq)
  }

  test("participates in whole-stage codegen (not CodegenFallback)") {
    val df = spark.range(3).select(
      matVec(Array(Array(1.0, 2.0), Array(-1.0, 1.0)),
        array(col("id").cast("double"), lit(1.0))).as("r"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("mat_vec(") && l.trim.startsWith("*(")), plan)
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[MatVecExpr]))
    // id=2: [2*1 + 1*2, -2 + 1] = [4, -1]
    assert(df.collect().map(_.getSeq[Double](0).toSeq).toSeq ==
      Seq(Seq(2.0, 1.0), Seq(3.0, 0.0), Seq(4.0, -1.0)))
  }

  test("null row stays null; short input treated as zero-padded") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(Seq(1.0)), None).toDF("e")
      .select(matVec(Array(Array(2.0, 5.0)), col("e")).as("r"))
    val got = df.collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getSeq[Double](0).toSeq))
    assert(got.toSeq == Seq(Some(Seq(2.0)), None))
  }
}
