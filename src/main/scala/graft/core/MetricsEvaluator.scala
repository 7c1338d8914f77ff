package graft.core

/** Per-file column statistics carried by a manifest entry (the slice of
  * `DataFile` the evaluator consumes — manifest.go:347-357). Maps are keyed
  * by field id; bound maps hold the Iceberg single-value serialized bytes. */
final case class FileStats(
    recordCount: Long,
    valueCounts: Map[Int, Long] = Map.empty,
    nullCounts: Map[Int, Long] = Map.empty,
    nanCounts: Map[Int, Long] = Map.empty,
    lowerBounds: Map[Int, Array[Byte]] = Map.empty,
    upperBounds: Map[Int, Array[Byte]] = Map.empty)

/** Stats-based file skipping: decides `RowsCannotMatch` (false → skip the
  * file) vs `RowsMightMatch` (true → keep) for a bound predicate against a
  * file's column stats.
  *
  * Capability parity with `expressions/visitors.go:181-480`, including:
  * record-count short circuits (0 → skip, <0 legacy-Avro → keep,
  * visitors.go:207-218), only-null / only-NaN columns, NaN-valued bounds
  * (→ might match), and missing stats (→ might match). Extended to the
  * Lt/LtEq/Gt/GtEq/In/StartsWith operators per the Iceberg spec's inclusive
  * evaluator so Spark's pushed filters all participate in skipping.
  */
final class InclusiveMetricsEvaluator(schema: Schema, expr: BooleanExpression,
                                      caseSensitive: Boolean = true) {
  private val bound = Expr.bind(schema, Expr.rewriteNot(expr), caseSensitive)

  val RowsMightMatch = true
  val RowsCannotMatch = false

  def eval(file: FileStats): Boolean = {
    if (file.recordCount == 0) return RowsCannotMatch
    // older writers emit -1 counts when importing avro tables; must keep
    if (file.recordCount < 0) return RowsMightMatch
    visit(bound, file)
  }

  private def visit(e: BooleanExpression, f: FileStats): Boolean = e match {
    case AlwaysTrue => RowsMightMatch
    case AlwaysFalse => RowsCannotMatch
    case And(l, r) => visit(l, f) && visit(r, f)
    case Or(l, r) => visit(l, f) || visit(r, f)
    case Not(_) => sys.error("NOT should have been rewritten before evaluation")
    case p: UnboundPredicate => sys.error(s"found unbound predicate: $p")
    case BoundPredicate(op, field, lits) => visitPred(op, field, lits, f)
  }

  private def containsOnlyNulls(f: FileStats, id: Int): Boolean =
    (f.valueCounts.get(id), f.nullCounts.get(id)) match {
      case (Some(vc), Some(nc)) if vc != 0 && nc != 0 => vc == nc
      case _ => false
    }

  private def containsOnlyNaN(f: FileStats, id: Int): Boolean =
    (f.valueCounts.get(id), f.nanCounts.get(id)) match {
      case (Some(vc), Some(nc)) if vc != 0 && nc != 0 => vc == nc
      case _ => false
    }

  private def lower(f: FileStats, field: NestedField): Option[Literal] =
    f.lowerBounds.get(field.id).flatMap(b => LiteralCodec.fromBytes(field.fieldType, b))
  private def upper(f: FileStats, field: NestedField): Option[Literal] =
    f.upperBounds.get(field.id).flatMap(b => LiteralCodec.fromBytes(field.fieldType, b))

  /** A geo column's file bbox from its point-encoded lower/upper bounds. */
  private def geoFileBBox(f: FileStats, id: Int)
      : Option[(Double, Double, Double, Double)] =
    for {
      lb <- f.lowerBounds.get(id).flatMap(Wkb.parsePoint)
      ub <- f.upperBounds.get(id).flatMap(Wkb.parsePoint)
    } yield (lb._1, lb._2, ub._1, ub._2)

  private def doubleOf(l: Literal): Double = l match {
    case DoubleLit(v) => v
    case FloatLit(v) => v.toDouble
    case other => sys.error(s"bbox literal must be double, got $other")
  }

  private def isNaNLit(l: Literal): Boolean = l match {
    case FloatLit(v) => v.isNaN
    case DoubleLit(v) => v.isNaN
    case _ => false
  }

  /** lit within [lower, upper]? NaN bounds are unreliable → might match. */
  private def withinBounds(f: FileStats, field: NestedField, lit: Literal): Boolean = {
    lower(f, field) match {
      case Some(lb) if !isNaNLit(lb) =>
        if (LiteralOrdering.compare(lb, lit).exists(_ > 0)) return RowsCannotMatch
      case _ =>
    }
    upper(f, field) match {
      case Some(ub) if !isNaNLit(ub) =>
        if (LiteralOrdering.compare(ub, lit).exists(_ < 0)) return RowsCannotMatch
      case _ =>
    }
    RowsMightMatch
  }

  private def visitPred(op: PredOp, field: NestedField, lits: Seq[Literal],
                        f: FileStats): Boolean = {
    val id = field.id
    op match {
      case OpIsNull =>
        // reference panics on missing null counts (visitors.go:283-289);
        // we keep the file instead — "unknown" must never skip data
        f.nullCounts.get(id) match {
          case Some(0L) => RowsCannotMatch
          case _ => RowsMightMatch
        }
      case OpNotNull =>
        if (containsOnlyNulls(f, id)) RowsCannotMatch else RowsMightMatch
      case OpIsNan =>
        f.nanCounts.get(id) match {
          case Some(0L) => RowsCannotMatch
          case _ => RowsMightMatch
        }
      case OpNotNan =>
        if (containsOnlyNaN(f, id)) RowsCannotMatch else RowsMightMatch
      case OpEq =>
        if (containsOnlyNulls(f, id) || containsOnlyNaN(f, id)) RowsCannotMatch
        else withinBounds(f, field, lits.head)
      case OpNotEq => RowsMightMatch
      case OpLt =>
        if (containsOnlyNulls(f, id) || containsOnlyNaN(f, id)) RowsCannotMatch
        else lower(f, field) match {
          case Some(lb) if !isNaNLit(lb) &&
            LiteralOrdering.compare(lb, lits.head).exists(_ >= 0) => RowsCannotMatch
          case _ => RowsMightMatch
        }
      case OpLtEq =>
        if (containsOnlyNulls(f, id) || containsOnlyNaN(f, id)) RowsCannotMatch
        else lower(f, field) match {
          case Some(lb) if !isNaNLit(lb) &&
            LiteralOrdering.compare(lb, lits.head).exists(_ > 0) => RowsCannotMatch
          case _ => RowsMightMatch
        }
      case OpGt =>
        if (containsOnlyNulls(f, id) || containsOnlyNaN(f, id)) RowsCannotMatch
        else upper(f, field) match {
          case Some(ub) if !isNaNLit(ub) &&
            LiteralOrdering.compare(ub, lits.head).exists(_ <= 0) => RowsCannotMatch
          case _ => RowsMightMatch
        }
      case OpGtEq =>
        if (containsOnlyNulls(f, id) || containsOnlyNaN(f, id)) RowsCannotMatch
        else upper(f, field) match {
          case Some(ub) if !isNaNLit(ub) &&
            LiteralOrdering.compare(ub, lits.head).exists(_ < 0) => RowsCannotMatch
          case _ => RowsMightMatch
        }
      case OpIn =>
        if (containsOnlyNulls(f, id) || containsOnlyNaN(f, id)) RowsCannotMatch
        else if (lits.exists(l => withinBounds(f, field, l))) RowsMightMatch
        else RowsCannotMatch
      case OpNotIn => RowsMightMatch
      case OpStIntersectsBBox =>
        // file bounds are bbox corner POINTS per the V3 geo spec; a file
        // of only nulls cannot intersect anything
        if (containsOnlyNulls(f, id)) return RowsCannotMatch
        geoFileBBox(f, id) match {
          // lower.x > upper.x is the antimeridian wrap — legal ONLY for
          // geography; on a planar geometry column it means corrupt
          // bounds, so keep the file rather than trust them
          case Some((lx, _, ux, _))
              if lx > ux && !field.fieldType.isInstanceOf[GeographyT] =>
            RowsMightMatch
          case Some((lx, ly, ux, uy)) =>
            val Seq(qxmin, qymin, qxmax, qymax) = lits.map(doubleOf)
            if (Wkb.bboxIntersects(lx, ly, ux, uy, qxmin, qymin, qxmax, qymax,
              wrapX = field.fieldType.isInstanceOf[GeographyT])) RowsMightMatch
            else RowsCannotMatch
          case None => RowsMightMatch // no/unparseable bounds — keep
        }
      case OpNotStIntersectsBBox =>
        // prune only when EVERY geometry must intersect: the file bbox is
        // entirely inside the query bbox (then every envelope is too) and
        // no row is null (null → not-intersects is NOT satisfied... a null
        // geometry row yields unknown, which a filter drops — so nulls
        // cannot satisfy the NOT either; only non-null rows matter)
        geoFileBBox(f, id) match {
          case Some((lx, ly, ux, uy)) if !(lx > ux) => // wrapped x never proves containment
            val Seq(qxmin, qymin, qxmax, qymax) = lits.map(doubleOf)
            val contained =
              qxmin <= lx && ux <= qxmax && qymin <= ly && uy <= qymax
            if (contained) RowsCannotMatch else RowsMightMatch
          case _ => RowsMightMatch
        }
      case OpStartsWith =>
        val prefix = lits.head.asInstanceOf[StrLit].v
        lower(f, field) match {
          case Some(StrLit(lb)) =>
            val cmp = lb.take(prefix.length)
            if (cmp > prefix) return RowsCannotMatch
          case _ =>
        }
        upper(f, field) match {
          case Some(StrLit(ub)) =>
            val cmp = ub.take(prefix.length)
            if (cmp < prefix) return RowsCannotMatch
          case _ =>
        }
        RowsMightMatch
      case OpNotStartsWith => RowsMightMatch
    }
  }
}
