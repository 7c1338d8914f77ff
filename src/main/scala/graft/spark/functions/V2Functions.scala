package graft.spark.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

import graft.core.Murmur3

/** DataSource V2 function catalog surface for the Iceberg partition
  * transforms. Two jobs:
  *
  *  1. SQL access: `SELECT graft.system.bucket(16, id)` etc.
  *  2. Storage-partitioned joins: Spark resolves a table's reported
  *     `bucket/years/months/days/hours` partition transforms against the
  *     owning catalog's FunctionCatalog — without these bindings,
  *     KeyGroupedPartitioning over transform-partitioned tables cannot be
  *     planned and co-partitioned joins fall back to shuffles.
  *
  * Semantics are the spec transforms (bucket = murmur3_x86_32 of the
  * single-value encoding, temporal = offsets from 1970), byte-identical to
  * the write path's [[IcebergBucketExpr]] / core transforms. */
object GraftFunctions {

  val Names: Seq[String] =
    Seq("bucket", "years", "months", "days", "hours", "graft_bpe_count",
      "st_point", "st_intersects_bbox")

  def load(name: String): UnboundFunction = name match {
    case "bucket" => BucketFunction
    case "years" | "months" | "days" | "hours" => new TimeFunction(name)
    case "graft_bpe_count" => BpeCountFunction
    case "st_point" => StPointFunction
    case "st_intersects_bbox" => StIntersectsBBoxFunction
    case other => throw new IllegalArgumentException(s"unknown function $other")
  }

  /** `st_point(x, y)`: WKB POINT bytes — the SQL-callable authoring twin
    * of the write path's [[StPointExpr]] (byte-identical; same codec the
    * V3 geo bounds use). */
  object StPointFunction extends UnboundFunction {
    override def name(): String = "st_point"
    override def description(): String =
      "st_point(x, y): little-endian WKB POINT bytes"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.size == 2 &&
        inputType.fields.forall(_.dataType == DoubleType),
        "st_point takes (x DOUBLE, y DOUBLE)")
      new ScalarFunction[Array[Byte]] {
        override def inputTypes(): Array[DataType] =
          Array(DoubleType, DoubleType)
        override def resultType(): DataType = BinaryType
        override def name(): String = "st_point"
        override def canonicalName(): String = "graft.st_point"
        override def produceResult(input: InternalRow): Array[Byte] =
          if (input.isNullAt(0) || input.isNullAt(1)) null
          else graft.core.Wkb.pointWkb(input.getDouble(0), input.getDouble(1))
      }
    }
  }

  /** `st_intersects_bbox(geom, xmin, ymin, xmax, ymax)`: true iff the WKB
    * geometry's envelope intersects the bbox — the row-level semantics
    * the scan's geo prune agrees with ([[StIntersectsBBoxExpr]]). Null /
    * unparseable WKB → NULL (a WHERE drops it). SQL-plane only: pruning
    * rides the `bbox` read option or the library predicate. */
  object StIntersectsBBoxFunction extends UnboundFunction {
    override def name(): String = "st_intersects_bbox"
    override def description(): String =
      "st_intersects_bbox(geom, xmin, ymin, xmax, ymax): WKB envelope vs bbox"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.size == 5 && inputType(0).dataType == BinaryType &&
        inputType.fields.drop(1).forall(_.dataType == DoubleType),
        "st_intersects_bbox takes (geom BINARY, xmin, ymin, xmax, ymax DOUBLEs)")
      new ScalarFunction[java.lang.Boolean] {
        override def inputTypes(): Array[DataType] =
          Array(BinaryType, DoubleType, DoubleType, DoubleType, DoubleType)
        override def resultType(): DataType = BooleanType
        override def name(): String = "st_intersects_bbox"
        override def canonicalName(): String = "graft.st_intersects_bbox"
        override def produceResult(input: InternalRow): java.lang.Boolean = {
          if ((0 until 5).exists(input.isNullAt)) return null
          val env = graft.core.Wkb.envelopeArray(input.getBinary(0))
          if (env == null) null
          else graft.core.Wkb.bboxIntersects(env(0), env(1), env(2), env(3),
            input.getDouble(1), input.getDouble(2), input.getDouble(3),
            input.getDouble(4), wrapX = false)
        }
      }
    }
  }

  /** Session conf holding the path of a GPT-2-style `merges.txt`; the
    * function binds the PARSED table (loaded once per path) so executors
    * get it with the serialized function, no per-row I/O.
    *
    * Staleness caveat: the parse caches BY PATH for the JVM's lifetime —
    * rewriting the file at the same path within one driver process keeps
    * serving the old table (merges files are immutable published
    * artifacts in practice; use a fresh path for a new vocabulary). */
  val BpeMergesPathConf = "spark.graft.bpe.merges-path"

  private val mergesCache =
    new java.util.concurrent.ConcurrentHashMap[String, Bpe.Merges]()

  /** `graft_bpe_count(text)`: BPE token count of a string under the
    * pretrained merge table named by [[BpeMergesPathConf]] — the
    * SQL-callable face of [[Bpe.countText]] (t06/t19's library seam).
    * With the conf unset the count degenerates to summed per-word
    * character counts (an empty merge table), matching the documented
    * [[Bpe]] semantics — set the conf for real token budgets. */
  object BpeCountFunction extends UnboundFunction {
    override def name(): String = "graft_bpe_count"
    override def description(): String =
      s"graft_bpe_count(text): BPE token count under the merges file at '$BpeMergesPathConf'"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.size == 1 && inputType(0).dataType == StringType,
        "graft_bpe_count takes one STRING argument")
      // bind runs driver-side during analysis: resolve the session's merges
      // path HERE so the bound function carries the parsed table
      val mergesPath = org.apache.spark.sql.SparkSession.active.conf
        .getOption(BpeMergesPathConf).filter(_.nonEmpty)
      val merges = mergesPath match {
        case Some(path) => mergesCache.computeIfAbsent(path, p => Bpe.loadMerges(p))
        case None => Bpe.Merges(Map.empty)
      }
      new ScalarFunction[java.lang.Long] {
        override def inputTypes(): Array[DataType] = Array(StringType)
        override def resultType(): DataType = LongType
        override def name(): String = "graft_bpe_count"
        // canonicalName decides plan-level equivalence: two binds are only
        // interchangeable under the SAME merge table, so the path (not
        // just the table size) must be part of the identity
        override def canonicalName(): String =
          s"graft.graft_bpe_count(merges=${mergesPath.getOrElse("<none>")})"
        // standard SQL scalar null semantics: NULL in → NULL out (the
        // resultType is nullable by default)
        override def produceResult(input: InternalRow): java.lang.Long =
          if (input.isNullAt(0)) null
          else Bpe.countText(input.getUTF8String(0).toString, merges)
      }
    }
  }

  object BucketFunction extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col): Iceberg bucket transform (murmur3 of the single-value encoding)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.size == 2, "bucket takes (numBuckets, value)")
      val valueType = inputType(1).dataType
      valueType match {
        case IntegerType | LongType | DateType | TimestampType |
             TimestampNTZType | StringType | BinaryType | _: DecimalType =>
        case other =>
          throw new UnsupportedOperationException(s"bucket over $other")
      }
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String =
          s"graft.bucket(${valueType.catalogString})"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): Integer = {
          val n = input.getInt(0)
          val hash = valueType match {
            case IntegerType | DateType => IcebergBucketExpr.hashLong(input.getInt(1).toLong)
            case LongType | TimestampType | TimestampNTZType =>
              IcebergBucketExpr.hashLong(input.getLong(1))
            case StringType => Murmur3.hashBytes(input.getUTF8String(1).getBytes, 0)
            case BinaryType => Murmur3.hashBytes(input.getBinary(1), 0)
            case d: DecimalType => Murmur3.hashBytes(
              input.getDecimal(1, d.precision, d.scale)
                .toJavaBigDecimal.unscaledValue().toByteArray, 0)
          }
          (hash & Int.MaxValue) % n
        }
      }
    }
  }

  /** years/months/days/hours over date/timestamp, spec semantics (offsets
    * from 1970-01-01; days of a date is the date's epoch-day ordinal). */
  final class TimeFunction(fn: String) extends UnboundFunction {
    override def name(): String = fn
    override def description(): String = s"$fn(col): Iceberg $fn transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.size == 1, s"$fn takes one argument")
      val valueType = inputType(0).dataType
      val fromMicros: Long => Int = {
        val micosPerDay = 86400L * 1000000L
        def epochDay(us: Long): Long = Math.floorDiv(us, micosPerDay)
        fn match {
          case "days" => us => epochDay(us).toInt
          case "hours" => us => Math.floorDiv(us, 3600L * 1000000L).toInt
          case "months" | "years" => us =>
            val d = java.time.LocalDate.ofEpochDay(epochDay(us))
            if (fn == "years") d.getYear - 1970
            else (d.getYear - 1970) * 12 + d.getMonthValue - 1
        }
      }
      val fromDays: Int => Int = fn match {
        case "days" => d => d
        case "hours" => _ => throw new UnsupportedOperationException("hours(date)")
        case "months" | "years" => days =>
          val d = java.time.LocalDate.ofEpochDay(days.toLong)
          if (fn == "years") d.getYear - 1970
          else (d.getYear - 1970) * 12 + d.getMonthValue - 1
      }
      valueType match {
        case DateType | TimestampType | TimestampNTZType =>
        case other => throw new UnsupportedOperationException(s"$fn over $other")
      }
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(valueType)
        override def resultType(): DataType = IntegerType
        override def name(): String = fn
        override def canonicalName(): String = s"graft.$fn(${valueType.catalogString})"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): Integer = valueType match {
          case DateType => fromDays(input.getInt(0))
          case _ => fromMicros(input.getLong(0))
        }
      }
    }
  }
}
