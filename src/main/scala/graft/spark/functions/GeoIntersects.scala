package graft.spark.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

import graft.core.Wkb

/** Row-level `st_intersects_bbox`: true iff the WKB geometry's ENVELOPE
  * intersects the query bbox — the same semantics the scan's metrics
  * evaluator prunes on (file bounds are envelope corners), so file-level
  * pruning and row-level filtering agree exactly. Unparseable WKB → null
  * (filter drops it — conservative, and the write path never produces
  * such bytes with stats). The bbox is constant, so the comparison folds
  * into generated code via the static Wkb call. */
final case class StIntersectsBBoxExpr(child: Expression,
                                      xmin: Double, ymin: Double,
                                      xmax: Double, ymax: Double,
                                      geography: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "st_intersects_bbox"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"st_intersects_bbox needs WKB binary, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val env = Wkb.envelope(input.asInstanceOf[Array[Byte]])
    if (env.isEmpty) null
    else {
      val (lx, ly, ux, uy) = env.get
      // a single geometry's envelope never wraps; `geography` only matters
      // for FILE bounds, but keep the flag for parity with the evaluator
      Wkb.bboxIntersects(lx, ly, ux, uy, xmin, ymin, xmax, ymax,
        wrapX = geography)
    }
  }

  /** A double as a JAVA literal — `s"$v"` renders Infinity/NaN as tokens
    * Janino cannot compile, and a half-open bbox is a legal input. */
  private def jlit(v: Double): String =
    if (v.isNaN) "Double.NaN"
    else if (v == Double.PositiveInfinity) "Double.POSITIVE_INFINITY"
    else if (v == Double.NegativeInfinity) "Double.NEGATIVE_INFINITY"
    else s"${v}D"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val env = ctx.freshName("env")
      // primitives only: Janino rejects scala.Option/Tuple4 generics
      s"""
         double[] $env = graft.core.Wkb.envelopeArray($bytes);
         if ($env == null) {
           ${ev.isNull} = true;
         } else {
           ${ev.value} = graft.core.Wkb.bboxIntersects(
             $env[0], $env[1], $env[2], $env[3],
             ${jlit(xmin)}, ${jlit(ymin)}, ${jlit(xmax)}, ${jlit(ymax)},
             $geography);
         }
       """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Row-level envelope extraction: WKB geometry → `[xmin, ymin, xmax,
  * ymax]` (null when unparseable — the same prune-safe fallback as the
  * write-side stats pass). The grid-bucketed spatial join derives its
  * cell keys and its exact verify from this one expression, so bucketing
  * and verification can never disagree on an envelope.
  *
  * `geography = true` computes the SHORT-ARC envelope ([[Wkb.geoEnvelope]])
  * — longitudes walk the shorter way around, and a geometry straddling
  * ±180° returns the spec's wrapped `xmin > xmax` encoding instead of a
  * near-global planar box. */
final case class StEnvelopeExpr(child: Expression,
                                geography: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "st_envelope"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"st_envelope needs WKB binary, got $other")
  }

  private def envOf(bytes: Array[Byte]): Array[Double] =
    if (geography) Wkb.geoEnvelopeArray(bytes) else Wkb.envelopeArray(bytes)

  override protected def nullSafeEval(input: Any): Any = {
    val env = envOf(input.asInstanceOf[Array[Byte]])
    if (env == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(env)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val env = ctx.freshName("env")
      val fn = if (geography) "geoEnvelopeArray" else "envelopeArray"
      s"""
         double[] $env = graft.core.Wkb.$fn($bytes);
         if ($env == null) {
           ${ev.isNull} = true;
         } else {
           ${ev.value} =
             new org.apache.spark.sql.catalyst.util.GenericArrayData($env);
         }
       """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** WKB box constructor — `st_box(xmin, ymin, xmax, ymax)` → a 2-point
  * LINESTRING whose envelope is exactly the box (the minimal WKB with an
  * arbitrary rectangular envelope); write-side stats and
  * [[StEnvelopeExpr]] both see the intended bounds. */
final case class StBoxExpr(c1: Expression, c2: Expression,
                           c3: Expression, c4: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def first: Expression = c1
  override def second: Expression = c2
  override def third: Expression = c3
  override def fourth: Expression = c4

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_box"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == org.apache.spark.sql.types.DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"st_box needs four doubles, got ${children.map(_.dataType)}")

  override protected def nullSafeEval(x0: Any, y0: Any, x1: Any, y1: Any): Any =
    Wkb.lineWkb(x0.asInstanceOf[Double], y0.asInstanceOf[Double],
      x1.asInstanceOf[Double], y1.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x0, y0, x1, y1) =>
      s"${ev.value} = graft.core.Wkb.lineWkb($x0, $y0, $x1, $y1);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(c1 = newFirst, c2 = newSecond, c3 = newThird, c4 = newFourth)
}

/** WKB POINT constructor — `st_point(x, y)` → 21-byte little-endian WKB.
  * The authoring twin of [[StIntersectsBBoxExpr]]: builds the binary a geo
  * column stores from plain double coordinates, codegen'd via the static
  * [[Wkb]] call. */
final case class StPointExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "st_point"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.DoubleType,
            org.apache.spark.sql.types.DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"st_point needs two doubles, got $other")
    }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    Wkb.pointWkb(x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.core.Wkb.pointWkb($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
