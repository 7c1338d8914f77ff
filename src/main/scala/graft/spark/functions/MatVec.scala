package graft.spark.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dense matrix × vector against a PLAN-CONSTANT matrix: `out = M · e`
  * for a double-array column. The OPQ pre-rotation's corpus-side apply —
  * a broadcast-literal matmul fused into whole-stage codegen (the
  * `transform`/`zip_with` HOF spelling evaluates interpreted lambdas,
  * which is the difference between a map-only pass and the hot loop of
  * the encode stage at corpus scale).
  *
  * The matrix rides FLATTENED (row-major) with its row count, because a
  * nested-Array case-class field breaks expression equality (array
  * equals is reference identity) and with it plan canonicalization.
  *
  * `roundDp >= 0` rounds each output coordinate to that many decimals
  * with Spark's `round` semantics (BigDecimal HALF_UP — the exact twin
  * of DuckDB's `ROUND`): the OPQ apply uses 6 so the rotated coordinates
  * are bit-identical across engines and the oracle can mirror the
  * rotation as literals without FP-summation-order drift downstream. */
final case class MatVecExpr(child: Expression,
                            flat: IndexedSeq[Double], rows: Int,
                            roundDp: Int = -1)
    extends UnaryExpression {

  require(rows > 0 && flat.length % rows == 0,
    s"matvec: ${flat.length} values don't tile into $rows rows")
  private def cols: Int = flat.length / rows

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "mat_vec"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec needs array<double>, got $other")
  }

  @transient private lazy val mat: Array[Double] = flat.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray()
    val n = rows; val m = math.min(cols, in.length)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var acc = 0.0; var j = 0; val base = i * cols
      while (j < m) { acc += mat(base + j) * in(j); j += 1 }
      out(i) = if (roundDp < 0) acc else MatVec.roundHalfUp(acc, roundDp)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      // primitives only (Janino rejects scala generics); the flat matrix
      // is one reference object shared by all rows of the task
      val matRef = ctx.addReferenceObj("matVecFlat", mat, "double[]")
      val in = ctx.freshName("in")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val store =
        if (roundDp < 0) s"$out[$i] = $acc;"
        else s"$out[$i] = graft.spark.functions.MatVec.roundHalfUp($acc, $roundDp);"
      s"""
         double[] $in = $vec.toDoubleArray();
         int $m = $cols < $in.length ? $cols : $in.length;
         double[] $out = new double[$rows];
         for (int $i = 0; $i < $rows; $i++) {
           double $acc = 0.0;
           for (int $j = 0; $j < $m; $j++)
             $acc += $matRef[$i * $cols + $j] * $in[$j];
           $store
         }
         ${ev.value} =
           new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVec {
  /** `BigDecimal.valueOf(v).setScale(dp, HALF_UP).doubleValue()` with an
    * allocation-free fast path. The rounding decision is `floor(a + 0.5)`
    * on the scaled magnitude `a = |v|·10^dp`; it is unstable only when the
    * fractional part of `a` sits near 0.5, and the FP scaling plus the
    * shortest-decimal-repr discrepancy together perturb `a` by at most
    * ~3·10⁻¹⁶ relative. A guard band of `10⁻¹³·a + 10⁻⁹` (300× headroom)
    * therefore makes the fast path EXACTLY the BigDecimal result wherever
    * it fires; anything inside the band — or non-finite, or too large for
    * exact integer doubles — takes the original BigDecimal path. The
    * `n / 10^dp` replay is correctly rounded in both paths (power of ten
    * exact in double for dp ≤ 15, IEEE division), so the doubles agree
    * bit-for-bit. Hot in the OPQ corpus rotation (one call per output
    * coordinate), where the BigDecimal pair dominated the matmul. */
  def roundHalfUp(v: Double, dp: Int): Double = {
    val pow = java.lang.Math.pow(10d, dp.toDouble)
    if (java.lang.Double.isFinite(v)) {
      val a = java.lang.Math.abs(v) * pow
      if (a < 4.5e15) {
        val fl = java.lang.Math.floor(a)
        val fr = a - fl
        if (java.lang.Math.abs(fr - 0.5) > 1e-13 * a + 1e-9) {
          val n = if (fr >= 0.5) fl + 1d else fl
          // BigDecimal cannot represent -0.0, so a negative value rounding
          // to zero must come back as +0.0 or the bitwise compare diverges
          return if (n == 0d) 0.0 else java.lang.Math.copySign(n / pow, v)
        }
      }
    }
    java.math.BigDecimal.valueOf(v)
      .setScale(dp, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** `M · e` as a Column for a plan-constant matrix (rows of equal width);
    * `roundDp >= 0` rounds each output coordinate (Spark `round`
    * semantics — see [[MatVecExpr]]). */
  def matVec(matrix: Array[Array[Double]],
             e: org.apache.spark.sql.Column,
             roundDp: Int = -1): org.apache.spark.sql.Column = {
    require(matrix.nonEmpty && matrix.forall(_.length == matrix.head.length),
      "matvec: ragged matrix")
    org.apache.spark.sql.graft.ColumnShim.column(
      MatVecExpr(org.apache.spark.sql.graft.ColumnShim.expression(e),
        matrix.flatten.toIndexedSeq, matrix.length, roundDp))
  }
}
