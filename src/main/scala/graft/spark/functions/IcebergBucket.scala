package graft.spark.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Murmur3

/** Iceberg `bucket[N]` as a native Catalyst expression with whole-stage
  * codegen — NOT Spark's `Murmur3Hash` (different seed and byte layout): the
  * Iceberg spec hashes the single-value binary encoding (8-byte
  * little-endian for integral/temporal types, raw UTF-8 for strings,
  * minimal-byte two's-complement for decimals) with murmur3_x86_32 seed 0,
  * then `(h & Int.MaxValue) % n`.
  *
  * Used by the write path (computing partition values at full write
  * throughput) and usable in queries via [[icebergBucket]]. SURVEY §4 item 1.
  */
final case class IcebergBucketExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
           StringType | BinaryType | _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg bucket is not defined for type $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val hash = child.dataType match {
      case IntegerType | DateType =>
        IcebergBucketExpr.hashLong(input.asInstanceOf[Int].toLong)
      case LongType | TimestampType | TimestampNTZType =>
        IcebergBucketExpr.hashLong(input.asInstanceOf[Long])
      case StringType =>
        Murmur3.hashBytes(input.asInstanceOf[UTF8String].getBytes, 0)
      case BinaryType =>
        Murmur3.hashBytes(input.asInstanceOf[Array[Byte]], 0)
      case _: DecimalType =>
        Murmur3.hashBytes(
          input.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue().toByteArray, 0)
    }
    (hash & Int.MaxValue) % n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = IcebergBucketExpr.getClass.getName.stripSuffix("$")
    val hashCall = child.dataType match {
      case IntegerType | DateType => (c: String) => s"$cls.hashLong((long) $c)"
      case LongType | TimestampType | TimestampNTZType =>
        (c: String) => s"$cls.hashLong($c)"
      case StringType => (c: String) => s"$cls.hashUtf8($c)"
      case BinaryType => (c: String) => s"$cls.hashBytes($c)"
      case _: DecimalType => (c: String) => s"$cls.hashDecimal($c)"
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${hashCall(c)} & Integer.MAX_VALUE) % $n;")
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucketExpr =
    copy(child = newChild)
}

object IcebergBucketExpr {
  /** Integral/temporal bucket encoding: 8-byte little-endian long. A direct
    * murmur3 over the long avoids the byte-array allocation in the hot path
    * (identical result to hashing the 8 LE bytes). */
  def hashLong(v: Long): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0
    // two 4-byte little-endian blocks of the little-endian long: the low
    // word then the high word
    var i = 0
    while (i < 2) {
      var k1 = if (i == 0) v.toInt else (v >>> 32).toInt
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    h1 ^= 8 // length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  def hashUtf8(s: UTF8String): Int = Murmur3.hashBytes(s.getBytes, 0)
  def hashBytes(b: Array[Byte]): Int = Murmur3.hashBytes(b, 0)
  def hashDecimal(d: Decimal): Int =
    Murmur3.hashBytes(d.toJavaBigDecimal.unscaledValue().toByteArray, 0)
}

object functions {
  import org.apache.spark.sql.graft.ColumnShim
  /** `icebergBucket(n, col)` — Column API for the bucket transform. */
  def icebergBucket(n: Int, c: Column): Column =
    ColumnShim.column(IcebergBucketExpr(ColumnShim.expression(c), n))
}
