package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{EqualTo, EqualNullSafe, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In, IsNull, IsNotNull, StringStartsWith, Filter}

import graft.core._

/** Translating between Spark data-source `Filter`s, our core
  * `BooleanExpression` ADT, and Spark `Column`s.
  *
  * Spark→core is the pushdown direction (a pushed filter we can't express
  * returns None and is left for Spark to evaluate row-wise — inclusive
  * semantics keep correctness). Core→Column is the residual/row-filter
  * direction used by the DataFrame read path. */
object FilterConv {

  private def toLit(v: Any): Option[Literal] = v match {
    case null => None
    case b: Boolean => Some(BoolLit(b))
    case b: java.lang.Boolean => Some(BoolLit(b))
    case i: Int => Some(IntLit(i))
    case i: java.lang.Integer => Some(IntLit(i))
    case s: Short => Some(IntLit(s.toInt))
    case b: Byte => Some(IntLit(b.toInt))
    case l: Long => Some(LongLit(l))
    case l: java.lang.Long => Some(LongLit(l))
    case f: Float => Some(FloatLit(f))
    case f: java.lang.Float => Some(FloatLit(f))
    case d: Double => Some(DoubleLit(d))
    case d: java.lang.Double => Some(DoubleLit(d))
    case s: String => Some(StrLit(s))
    case s: org.apache.spark.unsafe.types.UTF8String => Some(StrLit(s.toString))
    case d: java.sql.Date => Some(DateLit(d.toLocalDate.toEpochDay.toInt))
    case d: java.time.LocalDate => Some(DateLit(d.toEpochDay.toInt))
    case t: java.sql.Timestamp =>
      Some(TsLit(t.getTime * 1000L + (t.getNanos / 1000) % 1000))
    case i: java.time.Instant =>
      Some(TsLit(i.getEpochSecond * 1000000L + i.getNano / 1000L))
    case ldt: java.time.LocalDateTime =>
      val inst = ldt.toInstant(java.time.ZoneOffset.UTC)
      Some(TsLit(inst.getEpochSecond * 1000000L + inst.getNano / 1000L))
    case d: java.math.BigDecimal => Some(DecLit(BigInt(d.unscaledValue()), d.scale()))
    case d: BigDecimal => Some(DecLit(BigInt(d.underlying.unscaledValue()), d.scale))
    case b: Array[Byte] => Some(BytesLit(b))
    case _ => None
  }

  /** Spark source Filter → core expression; None = not convertible (must stay
    * a residual filter). */
  def fromSparkFilter(f: Filter): Option[BooleanExpression] = f match {
    case EqualTo(a, v) => toLit(v).map(l => Expr.equalTo(a, l))
    case EqualNullSafe(a, null) => Some(Expr.isNull(a))
    case EqualNullSafe(a, v) => toLit(v).map(l => Expr.equalTo(a, l))
    case GreaterThan(a, v) => toLit(v).map(l => Expr.greaterThan(a, l))
    case GreaterThanOrEqual(a, v) => toLit(v).map(l => Expr.greaterThanOrEq(a, l))
    case LessThan(a, v) => toLit(v).map(l => Expr.lessThan(a, l))
    case LessThanOrEqual(a, v) => toLit(v).map(l => Expr.lessThanOrEq(a, l))
    case In(a, vs) =>
      val lits = vs.toSeq.map(toLit)
      if (lits.forall(_.isDefined)) Some(Expr.in(a, lits.flatten)) else None
    case IsNull(a) => Some(Expr.isNull(a))
    case IsNotNull(a) => Some(Expr.notNull(a))
    case sources.And(l, r) =>
      for (le <- fromSparkFilter(l); re <- fromSparkFilter(r))
        yield graft.core.And(le, re)
    case sources.Or(l, r) =>
      for (le <- fromSparkFilter(l); re <- fromSparkFilter(r))
        yield graft.core.Or(le, re)
    case sources.Not(c) => fromSparkFilter(c).map(graft.core.Not(_))
    case StringStartsWith(a, p) => Some(Expr.startsWith(a, p))
    // constant filters: Spark's SupportsDelete.truncateTable probes
    // canDeleteWhere(AlwaysTrue) — refusing it makes TRUNCATE a silent no-op
    case _: sources.AlwaysTrue => Some(graft.core.AlwaysTrue)
    case _: sources.AlwaysFalse => Some(graft.core.AlwaysFalse)
    case _ => None // StringContains/EndsWith etc: residual only
  }

  private def litToSpark(l: Literal): Column = l match {
    case BoolLit(v) => lit(v)
    case IntLit(v) => lit(v)
    case LongLit(v) => lit(v)
    case FloatLit(v) => lit(v)
    case DoubleLit(v) => lit(v)
    case StrLit(v) => lit(v)
    case DateLit(d) => lit(java.time.LocalDate.ofEpochDay(d.toLong))
    case TsLit(us) => lit(java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000).toInt,
      java.time.ZoneOffset.UTC))
    case TimeLit(us) => lit(us)
    case d: DecLit => lit(d.bigDecimal)
    case BytesLit(v) => lit(v)
    case FixedLit(v) => lit(v)
    case UuidLit(u) => lit(u.toString)
    case s: RangeSentinel =>
      throw new LiteralCastError(s"sentinel $s has no Spark literal")
  }

  /** Core expression → Spark Column (for applying a scan's row filter on the
    * DataFrame read path). */
  def toColumn(e: BooleanExpression): Column = e match {
    case graft.core.AlwaysTrue => lit(true)
    case graft.core.AlwaysFalse => lit(false)
    case graft.core.And(l, r) => toColumn(l) && toColumn(r)
    case graft.core.Or(l, r) => toColumn(l) || toColumn(r)
    case graft.core.Not(c) => not(toColumn(c))
    case UnboundPredicate(op, term, lits) => predToColumn(op, col(term), lits)
    case BoundPredicate(op, field, lits) =>
      predToColumn(op, col(field.name), lits,
        geography = field.fieldType.isInstanceOf[graft.core.GeographyT])
  }

  private def predToColumn(op: PredOp, c: Column, lits: Seq[Literal],
                           geography: Boolean = false): Column = op match {
    case OpStIntersectsBBox | OpNotStIntersectsBBox =>
      val Seq(graft.core.DoubleLit(xmin), graft.core.DoubleLit(ymin),
        graft.core.DoubleLit(xmax), graft.core.DoubleLit(ymax)) = lits: @unchecked
      val hit = org.apache.spark.sql.graft.ColumnShim.column(
        graft.spark.functions.StIntersectsBBoxExpr(
          org.apache.spark.sql.graft.ColumnShim.expression(c),
          xmin, ymin, xmax, ymax, geography))
      if (op == OpStIntersectsBBox) hit else !hit
    case OpIsNull => c.isNull
    case OpNotNull => c.isNotNull
    case OpIsNan => org.apache.spark.sql.functions.isnan(c)
    case OpNotNan => !org.apache.spark.sql.functions.isnan(c)
    case OpEq => c === litToSpark(lits.head)
    case OpNotEq => c =!= litToSpark(lits.head)
    case OpLt => c < litToSpark(lits.head)
    case OpLtEq => c <= litToSpark(lits.head)
    case OpGt => c > litToSpark(lits.head)
    case OpGtEq => c >= litToSpark(lits.head)
    case OpIn => c.isin(lits.map(litToSpark): _*)
    case OpNotIn => !c.isin(lits.map(litToSpark): _*)
    case OpStartsWith => c.startsWith(lits.head.asInstanceOf[StrLit].v)
    case OpNotStartsWith => !c.startsWith(lits.head.asInstanceOf[StrLit].v)
  }
}
