package graft.spark.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) curve value of N columns as a native Catalyst
  * expression with whole-stage codegen — the clustering key behind
  * `rewrite_zorder`.
  *
  * Each input is first mapped to an ORDER-PRESERVING unsigned 64-bit
  * encoding (Iceberg's ZOrderByteUtils approach):
  *   - int/long/date/timestamp: flip the sign bit (two's complement →
  *     unsigned order)
  *   - float/double: IEEE-754 total order — negative values flip ALL
  *     bits, non-negative flip only the sign bit
  *   - string/binary: first 8 bytes big-endian, zero-padded (prefix order)
  *   - null sorts first (encoding 0)
  *
  * All 64 bits of each encoding are then bit-interleaved round-robin
  * into an 8·N-byte binary (Spark compares binary unsigned
  * lexicographically, which IS the interleaved order — and keeping every
  * bit means low-magnitude ints keep their signal, unlike a one-long
  * truncation). Interleaving means a range of z-values bounds EVERY
  * dimension simultaneously, so range-clustering on the z-value gives
  * per-file min/max bounds that are tight in all chosen columns at once —
  * multi-column predicate pruning from one sort, which a lexicographic
  * sort only delivers for its leading column. */
final case class ZOrderExpr(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty || children.size > 8)
      return TypeCheckResult.TypeCheckFailure("zorder needs 1 to 8 columns")
    val bad = children.map(_.dataType).filterNot {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType | FloatType | DoubleType |
           StringType | BinaryType => true
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder: unsupported input type(s) ${bad.mkString(", ")}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val encoded = children.map { c =>
      val v = c.eval(input)
      if (v == null) 0L
      else c.dataType match {
        case ByteType => ZOrder.encodeLong(v.asInstanceOf[Byte].toLong)
        case ShortType => ZOrder.encodeLong(v.asInstanceOf[Short].toLong)
        case IntegerType | DateType => ZOrder.encodeLong(v.asInstanceOf[Int].toLong)
        case LongType | TimestampType | TimestampNTZType =>
          ZOrder.encodeLong(v.asInstanceOf[Long])
        case FloatType => ZOrder.encodeDouble(v.asInstanceOf[Float].toDouble)
        case DoubleType => ZOrder.encodeDouble(v.asInstanceOf[Double])
        case StringType => ZOrder.encodeBytes(v.asInstanceOf[UTF8String].getBytes)
        case BinaryType => ZOrder.encodeBytes(v.asInstanceOf[Array[Byte]])
      }
    }
    ZOrder.interleave(encoded.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val z = "graft.spark.functions.ZOrder"
    val arr = ctx.freshName("enc")
    val evals = children.map(_.genCode(ctx))
    val fills = children.zip(evals).zipWithIndex.map { case ((c, e), i) =>
      val enc = c.dataType match {
        case ByteType | ShortType | IntegerType | DateType =>
          s"$z.encodeLong((long) ${e.value})"
        case LongType | TimestampType | TimestampNTZType =>
          s"$z.encodeLong(${e.value})"
        case FloatType => s"$z.encodeDouble((double) ${e.value})"
        case DoubleType => s"$z.encodeDouble(${e.value})"
        case StringType => s"$z.encodeBytes((${e.value}).getBytes())"
        case BinaryType => s"$z.encodeBytes(${e.value})"
      }
      s"${e.code}\n$arr[$i] = ${e.isNull} ? 0L : $enc;"
    }.mkString("\n")
    val size = children.size.toString
    ev.copy(
      code = code"""
        long[] $arr = new long[$size];
        $fills
        byte[] ${ev.value} = $z.interleave($arr);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ZOrder {
  /** Column API: `zorder(col("x"), col("y"))`. */
  def zorder(cols: Column*): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      ZOrderExpr(cols.map(org.apache.spark.sql.graft.ColumnShim.expression)))

  /** Two's-complement long → order-preserving unsigned encoding. */
  def encodeLong(v: Long): Long = v ^ java.lang.Long.MIN_VALUE

  /** IEEE-754 double → total-order-preserving unsigned encoding. */
  def encodeDouble(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d) // canonical NaN
    val flipped = if (bits < 0) ~bits else bits ^ java.lang.Long.MIN_VALUE
    flipped
  }

  /** First 8 bytes big-endian, zero-padded — prefix order. */
  def encodeBytes(b: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < 8) {
      acc = (acc << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
      i += 1
    }
    acc
  }

  /** Round-robin interleave of ALL 64 bits of each encoding into an
    * 8·N-byte array (bit b of the output stream is bit b/N of column
    * b%N, MSB first) — unsigned lexicographic byte order is exactly
    * z-curve order. */
  def interleave(enc: Array[Long]): Array[Byte] = {
    val n = enc.length
    val out = new Array[Byte](8 * n)
    var bit = 0
    var acc = 0
    var outIdx = 0
    var b = 0
    while (b < 64) {
      var c = 0
      while (c < n) {
        acc = (acc << 1) | ((enc(c) >>> (63 - b)) & 1L).toInt
        bit += 1
        if (bit == 8) { out(outIdx) = acc.toByte; outIdx += 1; bit = 0; acc = 0 }
        c += 1
      }
      b += 1
    }
    out
  }
}
