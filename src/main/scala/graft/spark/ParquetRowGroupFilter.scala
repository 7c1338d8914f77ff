package graft.spark

import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.io.api.Binary

import graft.core._

/** Core predicate → parquet `FilterPredicate`, for ROW-GROUP level skipping
  * inside a data file (column-chunk stats, dictionary, and the bloom
  * filters the writer emits) — the level below manifest-stats file
  * skipping. Always conservative: every pushed filter is ALSO a Spark
  * residual, so dropping an unconvertible piece (or the whole predicate)
  * can never change results, only skip less.
  *
  * AND keeps whichever sides convert (still conservative); OR needs both.
  * NotEq/NotIn are excluded (their parquet semantics around nulls differ
  * from SQL's), as are date/timestamp terms (rebase-sensitive) and columns
  * whose CURRENT name is absent from the file footer (renames — the
  * manifest-level pruning already handled those correctly by field id). */
object ParquetRowGroupFilter {

  /** (column, expected parquet primitive type) pairs a predicate
    * references — the per-file gate requires the footer to carry each
    * column under that exact name AND physical type (renames and type
    * promotions both disqualify a file, conservatively). */
  def referencedTypes(e: BooleanExpression,
                      schema: Schema): Seq[(String, String)] =
    referencedNames(e).toSeq.sorted.map { n =>
      val t = schema.findFieldByName(n).map(_.fieldType) match {
        case Some(IntT) | Some(DateT) => "INT32"
        case Some(LongT) | Some(TimestampT) | Some(TimestampTzT) => "INT64"
        case Some(StringT) => "BINARY"
        case Some(DoubleT) => "DOUBLE"
        case Some(FloatT) => "FLOAT"
        case Some(BooleanT) => "BOOLEAN"
        case _ => "UNSUPPORTED"
      }
      n -> t
    }

  /** The column names a predicate references — the per-file gate checks
    * they all exist in the footer before the filter is applied. */
  def referencedNames(e: BooleanExpression): Set[String] = e match {
    case And(l, r) => referencedNames(l) ++ referencedNames(r)
    case Or(l, r) => referencedNames(l) ++ referencedNames(r)
    case Not(c) => referencedNames(c)
    case UnboundPredicate(_, term, _) => Set(term)
    case BoundPredicate(_, f, _) => Set(f.name)
    case _ => Set.empty
  }

  def convert(e: BooleanExpression, schema: Schema): Option[FilterPredicate] =
    e match {
      case AlwaysTrue | AlwaysFalse => None
      case And(l, r) =>
        (convert(l, schema), convert(r, schema)) match {
          case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
          case (a, b) => a.orElse(b) // partial AND stays conservative
        }
      case Or(l, r) =>
        for (a <- convert(l, schema); b <- convert(r, schema))
          yield FilterApi.or(a, b)
      case UnboundPredicate(op, term, lits) =>
        schema.findFieldByName(term).flatMap(f => pred(op, f, lits))
      case BoundPredicate(op, f, lits) => pred(op, f, lits)
      case _ => None
    }

  private val InChainCap = 20

  private def pred(op: PredOp, f: NestedField,
                   lits: Seq[Literal]): Option[FilterPredicate] = op match {
    case OpIsNull => typedEq(f, None)
    case OpNotNull => typedNotEqNull(f)
    case OpEq => lits.headOption.flatMap(l => typedEq(f, Some(l)))
    case OpLt => lits.headOption.flatMap(l => typedCmp(f, l, "lt"))
    case OpLtEq => lits.headOption.flatMap(l => typedCmp(f, l, "ltEq"))
    case OpGt => lits.headOption.flatMap(l => typedCmp(f, l, "gt"))
    case OpGtEq => lits.headOption.flatMap(l => typedCmp(f, l, "gtEq"))
    case OpIn if lits.nonEmpty && lits.size <= InChainCap =>
      val eqs = lits.map(l => typedEq(f, Some(l)))
      if (eqs.exists(_.isEmpty)) None
      else Some(eqs.flatten.reduce(FilterApi.or))
    case _ => None
  }

  // ---- typed dispatch: the parquet column AND value type come from the
  // ICEBERG field type, so a literal already cast at bind time maps 1:1
  private def typedEq(f: NestedField, l: Option[Literal]): Option[FilterPredicate] =
    (f.fieldType, l) match {
      case (IntT, Some(IntLit(v))) =>
        Some(FilterApi.eq(FilterApi.intColumn(f.name), Integer.valueOf(v)))
      case (IntT, None) =>
        Some(FilterApi.eq(FilterApi.intColumn(f.name), null.asInstanceOf[Integer]))
      case (LongT, Some(LongLit(v))) =>
        Some(FilterApi.eq(FilterApi.longColumn(f.name), java.lang.Long.valueOf(v)))
      case (LongT, None) =>
        Some(FilterApi.eq(FilterApi.longColumn(f.name), null.asInstanceOf[java.lang.Long]))
      case (StringT, Some(StrLit(v))) =>
        Some(FilterApi.eq(FilterApi.binaryColumn(f.name), Binary.fromString(v)))
      case (StringT, None) =>
        Some(FilterApi.eq(FilterApi.binaryColumn(f.name), null.asInstanceOf[Binary]))
      case (DoubleT, Some(DoubleLit(v))) =>
        Some(FilterApi.eq(FilterApi.doubleColumn(f.name), java.lang.Double.valueOf(v)))
      case (FloatT, Some(FloatLit(v))) =>
        Some(FilterApi.eq(FilterApi.floatColumn(f.name), java.lang.Float.valueOf(v)))
      case (BooleanT, Some(BoolLit(v))) =>
        Some(FilterApi.eq(FilterApi.booleanColumn(f.name), java.lang.Boolean.valueOf(v)))
      case _ => None
    }

  private def typedNotEqNull(f: NestedField): Option[FilterPredicate] =
    f.fieldType match {
      case IntT => Some(FilterApi.notEq(FilterApi.intColumn(f.name),
        null.asInstanceOf[Integer]))
      case LongT => Some(FilterApi.notEq(FilterApi.longColumn(f.name),
        null.asInstanceOf[java.lang.Long]))
      case StringT => Some(FilterApi.notEq(FilterApi.binaryColumn(f.name),
        null.asInstanceOf[Binary]))
      case DoubleT => Some(FilterApi.notEq(FilterApi.doubleColumn(f.name),
        null.asInstanceOf[java.lang.Double]))
      case FloatT => Some(FilterApi.notEq(FilterApi.floatColumn(f.name),
        null.asInstanceOf[java.lang.Float]))
      case _ => None
    }

  private def typedCmp(f: NestedField, l: Literal,
                       kind: String): Option[FilterPredicate] =
    (f.fieldType, l) match {
      case (IntT, IntLit(v)) =>
        val c = FilterApi.intColumn(f.name); val b = Integer.valueOf(v)
        Some(kind match {
          case "lt" => FilterApi.lt(c, b)
          case "ltEq" => FilterApi.ltEq(c, b)
          case "gt" => FilterApi.gt(c, b)
          case _ => FilterApi.gtEq(c, b)
        })
      case (LongT, LongLit(v)) =>
        val c = FilterApi.longColumn(f.name); val b = java.lang.Long.valueOf(v)
        Some(kind match {
          case "lt" => FilterApi.lt(c, b)
          case "ltEq" => FilterApi.ltEq(c, b)
          case "gt" => FilterApi.gt(c, b)
          case _ => FilterApi.gtEq(c, b)
        })
      case (StringT, StrLit(v)) =>
        val c = FilterApi.binaryColumn(f.name); val b = Binary.fromString(v)
        Some(kind match {
          case "lt" => FilterApi.lt(c, b)
          case "ltEq" => FilterApi.ltEq(c, b)
          case "gt" => FilterApi.gt(c, b)
          case _ => FilterApi.gtEq(c, b)
        })
      case (DoubleT, DoubleLit(v)) =>
        val c = FilterApi.doubleColumn(f.name); val b = java.lang.Double.valueOf(v)
        Some(kind match {
          case "lt" => FilterApi.lt(c, b)
          case "ltEq" => FilterApi.ltEq(c, b)
          case "gt" => FilterApi.gt(c, b)
          case _ => FilterApi.gtEq(c, b)
        })
      case (FloatT, FloatLit(v)) =>
        val c = FilterApi.floatColumn(f.name); val b = java.lang.Float.valueOf(v)
        Some(kind match {
          case "lt" => FilterApi.lt(c, b)
          case "ltEq" => FilterApi.ltEq(c, b)
          case "gt" => FilterApi.gt(c, b)
          case _ => FilterApi.gtEq(c, b)
        })
      case _ => None
    }
}
