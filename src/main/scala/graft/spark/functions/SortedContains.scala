package graft.spark.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Membership probe against a SORTED long array: binary search, O(log n)
  * per probe with zero per-call allocation (elements are read in place
  * with `ArrayData.getLong`, never copied out).
  *
  * Built for the exact-substring dedup reconstruction
  * ([[graft.queries.Dedup.exactSubstrSpans]]): each surviving token probes
  * its document's covered-position set, so `array_contains` — a linear
  * scan — makes a fully-duplicated long document quadratic
  * (O(n_tokens · |cov|)). The sorted probe caps it at O(n_tokens · log
  * |cov|), which is what lets the operator keep its covered positions as
  * ONE small per-doc array (no corpus-sized token shuffle) without a
  * pathological-document tail. */
final case class SortedLongContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_contains needs (array<bigint>, bigint), got ($l, $r)")
    }

  override protected def nullSafeEval(arr: Any, v: Any): Any = {
    val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val target = v.asInstanceOf[Long]
    var lo = 0
    var hi = a.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val x = a.getLong(mid)
      if (x == target) return true
      else if (x < target) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, v) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val x = ctx.freshName("x")
      s"""
         int $lo = 0;
         int $hi = $arr.numElements() - 1;
         boolean ${ev.value}0 = false;
         while ($lo <= $hi) {
           int $mid = ($lo + $hi) >>> 1;
           long $x = $arr.getLong($mid);
           if ($x == $v) { ${ev.value}0 = true; break; }
           else if ($x < $v) $lo = $mid + 1;
           else $hi = $mid - 1;
         }
         ${ev.value} = ${ev.value}0;
       """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedContains {
  /** `sorted_contains(arr, v)` as a Column — `arr` MUST be sorted
    * ascending (e.g. `array_sort`/`sort_array` output). */
  def sortedContains(arr: org.apache.spark.sql.Column,
                     v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      SortedLongContainsExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(arr),
        org.apache.spark.sql.graft.ColumnShim.expression(v)))
}
