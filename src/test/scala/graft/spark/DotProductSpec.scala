package graft.spark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.functions.DotProductExpr.dotProduct

/** The native dot-product expression must be BIT-identical to the
  * higher-order-function chain it replaces (left-to-right double
  * accumulation from 0.0) — the ANN oracle hashes depend on it — and must
  * mirror zip_with's null/length semantics. */
class DotProductSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the aggregate(zip_with) chain on float arrays") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(dotProduct(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
    val bad = df.filter(
      expr("CAST(native AS STRING) != CAST(hof AS STRING)")).count()
    assert(bad == 0, "native and HOF dot products must agree bit-for-bit")
  }

  test("double arrays and mixed widths work") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(dotProduct(col("a"), col("b")).as("d"))
    assert(df.collect()(0).getDouble(0) == 32.0)
  }

  test("null inputs and length mismatch yield null, like zip_with") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f))),       // length mismatch
      (None: Option[Array[Float]], Some(Array(1.0f))),    // null side
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f)))) // fine
      .toDF("a", "b")
      .select(dotProduct(col("a"), col("b")).as("d"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(None, None, Some(11.0)))
  }

  test("participates in whole-stage codegen (not CodegenFallback)") {
    // non-foldable arrays over a Range source so a real codegen stage exists
    val df = spark.range(3).select(
      dotProduct(
        array(col("id").cast("float"), lit(2.0f)),
        array(lit(3.0f), col("id").cast("float"))).as("d"))
    // `*(n)` is the WholeStageCodegen marker; the project carrying the dot
    // product must be inside a codegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("dotproductexpr") && l.trim.startsWith("*(")), plan)
    // the expression itself must not extend CodegenFallback
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.spark.functions.DotProductExpr]))
    // id=2: 2*3 + 2*2 = 10
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 5.0, 10.0))
  }
}
