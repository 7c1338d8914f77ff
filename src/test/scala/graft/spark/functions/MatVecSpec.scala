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

  test("roundHalfUp fast path is bit-identical to BigDecimal HALF_UP") {
    def ref(v: Double, dp: Int): Double =
      java.math.BigDecimal.valueOf(v)
        .setScale(dp, java.math.RoundingMode.HALF_UP).doubleValue()
    // deterministic sweep: magnitudes across the embedding range plus the
    // adversarial neighborhoods (exact .5 boundaries, sub-ulp offsets,
    // negative-rounds-to-zero, huge/tiny, non-round-trip decimals)
    val rng = new scala.util.Random(42)
    val cases = Seq(
      0.0, -0.0, 0.1, -0.1, 0.0000005, -0.0000005, 0.0000015, -0.0000015,
      1.9999995, -1.9999995, 123.4567895, 1e-9, -1e-9, 0.49999949999,
      12345678.0000005, 4.6e15, -4.6e15, 1e18, Double.MinPositiveValue) ++
      (1 to 20000).map(_ => (rng.nextDouble() - 0.5) * math.pow(10, rng.nextInt(12) - 6))
    for (v <- cases; dp <- Seq(0, 2, 6)) {
      val got = MatVec.roundHalfUp(v, dp)
      val want = ref(v, dp)
      assert(java.lang.Double.doubleToRawLongBits(got) ==
        java.lang.Double.doubleToRawLongBits(want),
        s"v=$v dp=$dp got=$got want=$want")
    }
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
