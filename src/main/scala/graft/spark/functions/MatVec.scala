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
      out(i) =
        if (roundDp < 0) acc
        else java.math.BigDecimal.valueOf(acc)
          .setScale(roundDp, java.math.RoundingMode.HALF_UP).doubleValue()
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
        else s"""$out[$i] = java.math.BigDecimal.valueOf($acc)
              .setScale($roundDp, java.math.RoundingMode.HALF_UP)
              .doubleValue();"""
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
