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

  /** DSv2 Predicate → core expression — the V2-pushdown twin of
    * [[fromSparkFilter]]. None = not convertible (stays a residual Spark
    * evaluates row-wise). Beyond the V1 set, this understands the V2
    * function catalog's `st_intersects_bbox` (arriving as a
    * BOOLEAN_EXPRESSION-wrapped UserDefinedScalarFunc), so a plain SQL
    * `WHERE graft.system.st_intersects_bbox(geom, ...)` prunes files. */
  def fromV2Predicate(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[BooleanExpression] = {
    import org.apache.spark.sql.connector.expressions.{
      Expression => V2Expr, NamedReference, UserDefinedScalarFunc,
      Literal => V2Literal}
    import org.apache.spark.sql.connector.expressions.filter.{
      And => V2And, Or => V2Or, Not => V2Not,
      AlwaysTrue => V2True, AlwaysFalse => V2False}
    def colOf(e: V2Expr): Option[String] = e match {
      case f: NamedReference if f.fieldNames().length == 1 =>
        Some(f.fieldNames()(0))
      case _ => None
    }
    def litOf(e: V2Expr): Option[Literal] = e match {
      case l: V2Literal[_] => v2Lit(l)
      case _ => None
    }
    p match {
      case a: V2And =>
        for (l <- fromV2Predicate(a.left()); r <- fromV2Predicate(a.right()))
          yield graft.core.And(l, r)
      case o: V2Or =>
        for (l <- fromV2Predicate(o.left()); r <- fromV2Predicate(o.right()))
          yield graft.core.Or(l, r)
      case n: V2Not => fromV2Predicate(n.child()).map(graft.core.Not(_))
      case _: V2True => Some(graft.core.AlwaysTrue)
      case _: V2False => Some(graft.core.AlwaysFalse)
      case _ =>
        val ch = p.children()
        /** column-vs-literal in either operand order; `flip` = the op with
          * sides swapped (lit < col ≡ col > lit). */
        def cmp(op: PredOp, flip: PredOp): Option[BooleanExpression] =
          if (ch.length != 2) None
          else (colOf(ch(0)), litOf(ch(1)), colOf(ch(1)), litOf(ch(0))) match {
            case (Some(c), Some(l), _, _) => Some(UnboundPredicate(op, c, Seq(l)))
            case (_, _, Some(c), Some(l)) => Some(UnboundPredicate(flip, c, Seq(l)))
            case _ => None
          }
        p.name() match {
          case "IS_NULL" if ch.length == 1 => colOf(ch(0)).map(Expr.isNull)
          case "IS_NOT_NULL" if ch.length == 1 => colOf(ch(0)).map(Expr.notNull)
          case "=" => cmp(OpEq, OpEq)
          // null-safe equal against a non-null literal ≡ equal for file
          // skipping (a null literal fails litOf → residual-only)
          case "<=>" => cmp(OpEq, OpEq)
          case "<>" | "!=" => cmp(OpNotEq, OpNotEq)
          case "<" => cmp(OpLt, OpGt)
          case "<=" => cmp(OpLtEq, OpGtEq)
          case ">" => cmp(OpGt, OpLt)
          case ">=" => cmp(OpGtEq, OpLtEq)
          case "IN" if ch.length >= 2 =>
            for {
              c <- colOf(ch(0))
              lits <- {
                val ls = ch.drop(1).toSeq.map(litOf)
                if (ls.forall(_.isDefined)) Some(ls.flatten) else None
              }
            } yield Expr.in(c, lits)
          case "STARTS_WITH" if ch.length == 2 =>
            (colOf(ch(0)), litOf(ch(1))) match {
              case (Some(c), Some(StrLit(prefix))) =>
                Some(Expr.startsWith(c, prefix))
              case _ => None
            }
          // a boolean V2-catalog function used directly as a predicate
          case "BOOLEAN_EXPRESSION" if ch.length == 1 => ch(0) match {
            case u: UserDefinedScalarFunc => fromV2Udf(u)
            case _ => None
          }
          case _ => None
        }
    }
  }

  private def fromV2Udf(
      u: org.apache.spark.sql.connector.expressions.UserDefinedScalarFunc)
      : Option[BooleanExpression] = {
    import org.apache.spark.sql.connector.expressions.{
      NamedReference, Literal => V2Literal}
    u.canonicalName() match {
      case "graft.st_intersects_bbox" if u.children().length == 5 =>
        val ch = u.children()
        val col = ch(0) match {
          case f: NamedReference if f.fieldNames().length == 1 =>
            Some(f.fieldNames()(0))
          case _ => None
        }
        val corners = ch.drop(1).toSeq.map {
          case l: V2Literal[_] => v2Lit(l).flatMap {
            case DoubleLit(v) => Some(v)
            case FloatLit(v) => Some(v.toDouble)
            case _ => None
          }
          case _ => None
        }
        if (col.isDefined && corners.forall(_.isDefined) &&
            corners.flatten.size == 4) {
          val Seq(xmin, ymin, xmax, ymax) = corners.flatten
          // an inverted bbox can't prune (stIntersectsBBox refuses it);
          // leave it residual — the function still evaluates row-wise
          if (xmin <= xmax && ymin <= ymax)
            Some(Expr.stIntersectsBBox(col.get, xmin, ymin, xmax, ymax))
          else None
        } else None
      case _ => None
    }
  }

  /** Parse a SQL predicate string into a core expression — the surface
    * `CALL graft.system.compact(..., where => '...')` exposes. REFUSES
    * (throws) anything it can't express as file-pruning metadata predicates:
    * a scoped maintenance action silently widening to the whole table is
    * exactly the failure mode this path exists to prevent. */
  def parsePredicate(spark: org.apache.spark.sql.SparkSession,
                     sql: String): BooleanExpression = {
    val parsed = spark.sessionState.sqlParser.parseExpression(sql)
    fromCatalyst(parsed).getOrElse(throw new IllegalArgumentException(
      s"predicate '$sql' is not expressible as metadata file-pruning " +
        "filters (supported: comparisons/IN/IS NULL/STARTS WITH on a " +
        "column vs literals, combined with AND/OR/NOT)"))
  }

  /** Unresolved Catalyst expression → core expression; None = not
    * convertible. Column legs stay UNBOUND (the scan planner binds them
    * case-insensitively against the table schema). */
  def fromCatalyst(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[BooleanExpression] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    def colOf(x: ce.Expression): Option[String] = x match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 =>
        Some(a.nameParts.head)
      case a: ce.AttributeReference => Some(a.name)
      case _ => None
    }
    def litOf(x: ce.Expression): Option[Literal] = x match {
      case l: ce.Literal => internalLit(l.dataType, l.value)
      case _ => None
    }
    def cmp(l: ce.Expression, r: ce.Expression, op: PredOp, flip: PredOp)
        : Option[BooleanExpression] =
      (colOf(l), litOf(r), colOf(r), litOf(l)) match {
        case (Some(c), Some(v), _, _) => Some(UnboundPredicate(op, c, Seq(v)))
        case (_, _, Some(c), Some(v)) => Some(UnboundPredicate(flip, c, Seq(v)))
        case _ => None
      }
    e match {
      case ce.And(l, r) =>
        for (le <- fromCatalyst(l); re <- fromCatalyst(r))
          yield graft.core.And(le, re)
      case ce.Or(l, r) =>
        for (le <- fromCatalyst(l); re <- fromCatalyst(r))
          yield graft.core.Or(le, re)
      case ce.Not(c) => fromCatalyst(c).map(graft.core.Not(_))
      case ce.EqualTo(l, r) => cmp(l, r, OpEq, OpEq)
      case ce.EqualNullSafe(l, r) if litOf(r).isDefined => cmp(l, r, OpEq, OpEq)
      case ce.GreaterThan(l, r) => cmp(l, r, OpGt, OpLt)
      case ce.GreaterThanOrEqual(l, r) => cmp(l, r, OpGtEq, OpLtEq)
      case ce.LessThan(l, r) => cmp(l, r, OpLt, OpGt)
      case ce.LessThanOrEqual(l, r) => cmp(l, r, OpLtEq, OpGtEq)
      case ce.In(v, list) =>
        val lits = list.map(litOf)
        if (lits.forall(_.isDefined))
          colOf(v).map(c => Expr.in(c, lits.flatten))
        else None
      case ce.IsNull(c) => colOf(c).map(Expr.isNull)
      case ce.IsNotNull(c) => colOf(c).map(Expr.notNull)
      case ce.StartsWith(l, r) => (colOf(l), litOf(r)) match {
        case (Some(c), Some(StrLit(p))) => Some(Expr.startsWith(c, p))
        case _ => None
      }
      case ce.Literal(true, org.apache.spark.sql.types.BooleanType) =>
        Some(graft.core.AlwaysTrue)
      case ce.Literal(false, org.apache.spark.sql.types.BooleanType) =>
        Some(graft.core.AlwaysFalse)
      case _ => None
    }
  }

  /** Catalyst-internal (dataType, value) → core literal — the shared leg of
    * [[fromCatalyst]] and [[fromV2Predicate]] (both representations carry
    * UTF8String strings, epoch-day ints, micros longs). */
  private def internalLit(dt: org.apache.spark.sql.types.DataType,
                          value: Any): Option[Literal] = {
    import org.apache.spark.sql.types._
    (dt, value) match {
      case (_, null) => None
      case (BooleanType, v: java.lang.Boolean) => Some(BoolLit(v))
      case (ByteType | ShortType | IntegerType, v: java.lang.Number) =>
        Some(IntLit(v.intValue()))
      case (LongType, v: java.lang.Long) => Some(LongLit(v))
      case (FloatType, v: java.lang.Float) => Some(FloatLit(v))
      case (DoubleType, v: java.lang.Double) => Some(DoubleLit(v))
      case (StringType, v) => Some(StrLit(v.toString))
      case (DateType, v: java.lang.Integer) => Some(DateLit(v))
      case (TimestampType | TimestampNTZType, v: java.lang.Long) =>
        Some(TsLit(v))
      case (d: DecimalType, v: org.apache.spark.sql.types.Decimal) =>
        Some(DecLit(BigInt(v.toJavaBigDecimal.unscaledValue()), d.scale))
      case (BinaryType, v: Array[Byte]) => Some(BytesLit(v))
      case _ => None
    }
  }

  /** V2 Literal (catalyst-internal representation) → core literal. */
  private def v2Lit(
      l: org.apache.spark.sql.connector.expressions.Literal[_])
      : Option[Literal] = internalLit(l.dataType, l.value)

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
