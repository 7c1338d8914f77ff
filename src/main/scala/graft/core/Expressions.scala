package graft.core

/** Predicate expression tree: construction, De Morgan inversion, NNF rewrite,
  * and binding against a schema.
  *
  * Capability parity with `expressions/expressions.go:64-288` and
  * `expressions/visitors.go:32-174`, extended with the comparison/IN/
  * STARTS_WITH operators that Spark's data-source filter pushdown produces
  * (the reference ships only IsNull/NotNull/Eq/NotEq; the evaluator machinery
  * is operator-generic either way).
  */
sealed trait BooleanExpression {
  /** Logical negation with NOT pushed all the way down (Invert,
    * expressions.go:80-98). */
  def invert: BooleanExpression
}

case object AlwaysTrue extends BooleanExpression { def invert: BooleanExpression = AlwaysFalse }
case object AlwaysFalse extends BooleanExpression { def invert: BooleanExpression = AlwaysTrue }

final case class And(left: BooleanExpression, right: BooleanExpression) extends BooleanExpression {
  def invert: BooleanExpression = Or(left.invert, right.invert)
}
final case class Or(left: BooleanExpression, right: BooleanExpression) extends BooleanExpression {
  def invert: BooleanExpression = And(left.invert, right.invert)
}
final case class Not(child: BooleanExpression) extends BooleanExpression {
  def invert: BooleanExpression = child
}

/** Comparison / predicate operators. */
sealed trait PredOp { def invert: PredOp }
case object OpIsNull extends PredOp { def invert: PredOp = OpNotNull }
case object OpNotNull extends PredOp { def invert: PredOp = OpIsNull }
case object OpIsNan extends PredOp { def invert: PredOp = OpNotNan }
case object OpNotNan extends PredOp { def invert: PredOp = OpIsNan }
case object OpEq extends PredOp { def invert: PredOp = OpNotEq }
case object OpNotEq extends PredOp { def invert: PredOp = OpEq }
case object OpLt extends PredOp { def invert: PredOp = OpGtEq }
case object OpLtEq extends PredOp { def invert: PredOp = OpGt }
case object OpGt extends PredOp { def invert: PredOp = OpLtEq }
case object OpGtEq extends PredOp { def invert: PredOp = OpLt }
case object OpIn extends PredOp { def invert: PredOp = OpNotIn }
case object OpNotIn extends PredOp { def invert: PredOp = OpIn }
case object OpStartsWith extends PredOp { def invert: PredOp = OpNotStartsWith }
case object OpNotStartsWith extends PredOp { def invert: PredOp = OpStartsWith }
/** Geo bbox intersection (V3 geo columns only): literals are the query
  * bbox corners (xmin, ymin, xmax, ymax) as four DoubleLit. Row semantics:
  * the geometry's ENVELOPE intersects the query bbox. This is the one
  * spec-sanctioned geo prune — file lower/upper bounds are bbox corner
  * points, so bounds-vs-bbox is exact at file granularity (geography
  * bounds may wrap the antimeridian; the evaluator handles that). */
case object OpStIntersectsBBox extends PredOp {
  def invert: PredOp = OpNotStIntersectsBBox
}
case object OpNotStIntersectsBBox extends PredOp {
  def invert: PredOp = OpStIntersectsBBox
}

/** Unbound predicate referencing a column by name. */
final case class UnboundPredicate(op: PredOp, term: String,
                                  literals: Seq[Literal] = Nil) extends BooleanExpression {
  def invert: BooleanExpression = copy(op = op.invert)
}

/** Bound predicate: resolved field + literals cast to the field type. */
final case class BoundPredicate(op: PredOp, field: NestedField,
                                literals: Seq[Literal] = Nil) extends BooleanExpression {
  def invert: BooleanExpression = copy(op = op.invert)
}

object Expr {
  def isNull(t: String): BooleanExpression = UnboundPredicate(OpIsNull, t)
  def notNull(t: String): BooleanExpression = UnboundPredicate(OpNotNull, t)
  def isNan(t: String): BooleanExpression = UnboundPredicate(OpIsNan, t)
  def notNan(t: String): BooleanExpression = UnboundPredicate(OpNotNan, t)
  def equalTo(t: String, l: Literal): BooleanExpression = UnboundPredicate(OpEq, t, Seq(l))
  def notEqualTo(t: String, l: Literal): BooleanExpression = UnboundPredicate(OpNotEq, t, Seq(l))
  def lessThan(t: String, l: Literal): BooleanExpression = UnboundPredicate(OpLt, t, Seq(l))
  def lessThanOrEq(t: String, l: Literal): BooleanExpression = UnboundPredicate(OpLtEq, t, Seq(l))
  def greaterThan(t: String, l: Literal): BooleanExpression = UnboundPredicate(OpGt, t, Seq(l))
  def greaterThanOrEq(t: String, l: Literal): BooleanExpression = UnboundPredicate(OpGtEq, t, Seq(l))
  def in(t: String, ls: Seq[Literal]): BooleanExpression = UnboundPredicate(OpIn, t, ls)
  def notIn(t: String, ls: Seq[Literal]): BooleanExpression = UnboundPredicate(OpNotIn, t, ls)
  def startsWith(t: String, prefix: String): BooleanExpression =
    UnboundPredicate(OpStartsWith, t, Seq(StrLit(prefix)))
  /** Geometry/geography envelope-vs-bbox intersection (the geo prune). */
  def stIntersectsBBox(t: String, xmin: Double, ymin: Double,
                       xmax: Double, ymax: Double): BooleanExpression = {
    require(xmin <= xmax && ymin <= ymax,
      s"invalid query bbox: ($xmin, $ymin, $xmax, $ymax)")
    UnboundPredicate(OpStIntersectsBBox, t,
      Seq(DoubleLit(xmin), DoubleLit(ymin), DoubleLit(xmax), DoubleLit(ymax)))
  }

  def and(es: Seq[BooleanExpression]): BooleanExpression =
    es.reduceOption(And(_, _)).getOrElse(AlwaysTrue)

  /** Normalize to NNF: push every NOT to the leaves via `invert` so
    * evaluators never see a Not node (RewriteNot, visitors.go:148-174). */
  def rewriteNot(e: BooleanExpression): BooleanExpression = e match {
    case Not(child) => rewriteNot(child.invert)
    case And(l, r) => And(rewriteNot(l), rewriteNot(r))
    case Or(l, r) => Or(rewriteNot(l), rewriteNot(r))
    case other => other
  }

  /** Resolve names → fields and cast literals to the column type
    * (Bind, visitors.go:112-146 + expressions.go:141-154). Out-of-range
    * literal casts saturate to sentinels; binding `x = 5` against a float
    * column yields the literal cast at bind time exactly once. IsNull on a
    * required column folds to AlwaysFalse; NotNull to AlwaysTrue. */
  def bind(schema: Schema, e: BooleanExpression,
           caseSensitive: Boolean = true): BooleanExpression = e match {
    case And(l, r) => And(bind(schema, l, caseSensitive), bind(schema, r, caseSensitive))
    case Or(l, r) => Or(bind(schema, l, caseSensitive), bind(schema, r, caseSensitive))
    case Not(c) => Not(bind(schema, c, caseSensitive))
    case p: UnboundPredicate =>
      val field = (if (caseSensitive) schema.findFieldByName(p.term)
                   else schema.findFieldByNameCaseInsensitive(p.term))
        .getOrElse(throw new IllegalArgumentException(
          s"could not bind reference '${p.term}', caseSensitive=$caseSensitive"))
      // V3 geo columns: bounds are POINTS (x/y mins and maxes), not
      // byte-comparable ranges, and no geo predicate algebra exists here —
      // refuse VALUE predicates loudly instead of pruning wrongly on WKB
      // byte comparisons (IsNull/NotNull stay: they only read null counts)
      (field.fieldType, p.op) match {
        case (_: GeometryT | _: GeographyT,
            OpIsNull | OpNotNull | OpStIntersectsBBox | OpNotStIntersectsBBox) =>
        case (_: GeometryT | _: GeographyT, _) =>
          throw new UnsupportedOperationException(
            s"predicates on ${field.fieldType.repr} column '${field.name}' " +
              "are not supported")
        case (t, OpStIntersectsBBox | OpNotStIntersectsBBox) =>
          throw new IllegalArgumentException(
            s"st_intersects_bbox requires a geometry/geography column; " +
              s"'${field.name}' is ${t.repr}")
        case _ =>
      }
      p.op match {
        case OpIsNull if field.required => AlwaysFalse
        case OpNotNull if field.required => AlwaysTrue
        case OpIsNull | OpNotNull => BoundPredicate(p.op, field)
        case OpIsNan | OpNotNan =>
          field.fieldType match {
            case FloatT | DoubleT => BoundPredicate(p.op, field)
            case t => throw new IllegalArgumentException(
              s"cannot bind ${p.op} to non-floating column '${field.name}' of type $t")
          }
        case OpStIntersectsBBox | OpNotStIntersectsBBox =>
          val ds = p.literals.map(_.to(DoubleT))
          require(ds.length == 4,
            s"st_intersects_bbox needs 4 bbox literals, got ${ds.length}")
          BoundPredicate(p.op, field, ds)
        case _ => BoundPredicate(p.op, field, p.literals.map(_.to(field.fieldType)))
      }
    case b: BoundPredicate =>
      throw new IllegalArgumentException(s"found already-bound predicate: $b")
    case other => other
  }
}
