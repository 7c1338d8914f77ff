package graft.spark

import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.graft.ColumnShim.{v2Literal => LiteralValue}
import org.apache.spark.sql.connector.expressions.filter.{And => V2And, Not => V2Not, Predicate}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** The DSv2 Predicate → core conversion matrix behind
  * SupportsPushDownV2Filters: every operator shape, both operand orders,
  * catalyst-internal literal representations, and the residual-only
  * refusals. The battery exercises the realistic subset end-to-end; this
  * pins the full matrix so a silently-unconvertible shape (→ lost file
  * pruning) can't creep in. */
class FilterConvV2Spec extends AnyFunSuite {

  private def colRef(n: String) = Expressions.column(n)
  private def p(name: String, ch: org.apache.spark.sql.connector.expressions.Expression*) =
    new Predicate(name, ch.toArray)

  test("comparisons convert; literal-first operands flip the operator") {
    assert(FilterConv.fromV2Predicate(
      p("=", colRef("a"), LiteralValue(5, IntegerType)))
      .contains(UnboundPredicate(OpEq, "a", Seq(IntLit(5)))))
    assert(FilterConv.fromV2Predicate(
      p("<", colRef("a"), LiteralValue(5L, LongType)))
      .contains(UnboundPredicate(OpLt, "a", Seq(LongLit(5L)))))
    // 5 < a  ≡  a > 5
    assert(FilterConv.fromV2Predicate(
      p("<", LiteralValue(5L, LongType), colRef("a")))
      .contains(UnboundPredicate(OpGt, "a", Seq(LongLit(5L)))))
    assert(FilterConv.fromV2Predicate(
      p(">=", LiteralValue(5L, LongType), colRef("a")))
      .contains(UnboundPredicate(OpLtEq, "a", Seq(LongLit(5L)))))
    assert(FilterConv.fromV2Predicate(
      p("<>", colRef("a"), LiteralValue(1, IntegerType)))
      .contains(UnboundPredicate(OpNotEq, "a", Seq(IntLit(1)))))
  }

  test("catalyst-internal literal representations decode") {
    // strings arrive as UTF8String
    assert(FilterConv.fromV2Predicate(p("=", colRef("s"),
      LiteralValue(org.apache.spark.unsafe.types.UTF8String.fromString("x"),
        StringType)))
      .contains(UnboundPredicate(OpEq, "s", Seq(StrLit("x")))))
    // dates as epoch-day ints, timestamps as micros longs
    assert(FilterConv.fromV2Predicate(p(">", colRef("d"),
      LiteralValue(19000, DateType)))
      .contains(UnboundPredicate(OpGt, "d", Seq(DateLit(19000)))))
    assert(FilterConv.fromV2Predicate(p("<", colRef("t"),
      LiteralValue(1700000000000000L, TimestampType)))
      .contains(UnboundPredicate(OpLt, "t", Seq(TsLit(1700000000000000L)))))
    // decimals as Decimal
    assert(FilterConv.fromV2Predicate(p("=", colRef("m"),
      LiteralValue(org.apache.spark.sql.types.Decimal("12.34"),
        DecimalType(10, 2))))
      .contains(UnboundPredicate(OpEq, "m", Seq(DecLit(BigInt(1234), 2)))))
  }

  test("IS NULL / IN / STARTS_WITH / AND / NOT compose") {
    assert(FilterConv.fromV2Predicate(p("IS_NULL", colRef("a")))
      .contains(UnboundPredicate(OpIsNull, "a")))
    assert(FilterConv.fromV2Predicate(p("IS_NOT_NULL", colRef("a")))
      .contains(UnboundPredicate(OpNotNull, "a")))
    assert(FilterConv.fromV2Predicate(p("IN", colRef("a"),
      LiteralValue(1, IntegerType), LiteralValue(2, IntegerType)))
      .contains(UnboundPredicate(OpIn, "a", Seq(IntLit(1), IntLit(2)))))
    assert(FilterConv.fromV2Predicate(p("STARTS_WITH", colRef("s"),
      LiteralValue(org.apache.spark.unsafe.types.UTF8String.fromString("pre"),
        StringType)))
      .contains(UnboundPredicate(OpStartsWith, "s", Seq(StrLit("pre")))))
    val andExpr = FilterConv.fromV2Predicate(new V2And(
      p("IS_NOT_NULL", colRef("a")),
      p("=", colRef("a"), LiteralValue(1, IntegerType))))
    assert(andExpr.contains(And(UnboundPredicate(OpNotNull, "a"),
      UnboundPredicate(OpEq, "a", Seq(IntLit(1))))))
    assert(FilterConv.fromV2Predicate(new V2Not(p("IS_NULL", colRef("a"))))
      .contains(Not(UnboundPredicate(OpIsNull, "a"))))
  }

  test("unconvertible shapes stay residual-only (None)") {
    // null literal: no skipping semantics
    assert(FilterConv.fromV2Predicate(
      p("=", colRef("a"), LiteralValue(null, IntegerType))).isEmpty)
    // column-vs-column comparison
    assert(FilterConv.fromV2Predicate(p("=", colRef("a"), colRef("b"))).isEmpty)
    // nested field reference
    assert(FilterConv.fromV2Predicate(
      p("IS_NULL", Expressions.column("a.b"))).isEmpty)
    // unknown predicate name
    assert(FilterConv.fromV2Predicate(p("CONTAINS", colRef("s"),
      LiteralValue(org.apache.spark.unsafe.types.UTF8String.fromString("z"),
        StringType))).isEmpty)
    // an AND with one unconvertible side is unconvertible as a whole
    // (the scan keeps only fully-convertible conjuncts; Spark splits
    // top-level conjunctions before pushdown, so no pruning is lost)
    assert(FilterConv.fromV2Predicate(new V2And(
      p("IS_NULL", colRef("a")),
      p("=", colRef("a"), colRef("b")))).isEmpty)
  }

  test("st_intersects_bbox UDF predicate converts; inverted bbox refuses") {
    import org.apache.spark.sql.connector.expressions.UserDefinedScalarFunc
    def udf(xmin: Double, xmax: Double) = new Predicate("BOOLEAN_EXPRESSION",
      Array(new UserDefinedScalarFunc("st_intersects_bbox",
        "graft.st_intersects_bbox",
        Array(colRef("geom"),
          LiteralValue(xmin, DoubleType), LiteralValue(0.0, DoubleType),
          LiteralValue(xmax, DoubleType), LiteralValue(9.0, DoubleType)))))
    assert(FilterConv.fromV2Predicate(udf(1.0, 8.0))
      .contains(UnboundPredicate(OpStIntersectsBBox, "geom",
        Seq(DoubleLit(1.0), DoubleLit(0.0), DoubleLit(8.0), DoubleLit(9.0)))))
    // xmin > xmax can't prune — residual-only, the function still
    // evaluates row-wise
    assert(FilterConv.fromV2Predicate(udf(8.0, 1.0)).isEmpty)
    // a different UDF is never misread as the geo predicate
    val other = new Predicate("BOOLEAN_EXPRESSION",
      Array(new UserDefinedScalarFunc("f", "other.f", Array(colRef("geom")))))
    assert(FilterConv.fromV2Predicate(other).isEmpty)
  }
}
