package graft.core

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.time.{LocalDate, LocalDateTime, LocalTime, OffsetDateTime, ZoneOffset}
import java.util.UUID

/** Typed literal values + the Iceberg "single-value serialization" binary
  * codec + the cast matrix with out-of-range saturation sentinels.
  *
  * Capability parity with `expressions/literals.go:90-773`: casts that fall
  * out of the target range return Above/Below sentinels (not errors, not
  * nulls — the metrics evaluator needs "bigger than every int32" semantics
  * for bound comparisons, which Spark's `Cast` cannot express). Invalid casts
  * throw [[LiteralCastError]].
  *
  * Note: the reference's int→decimal cast multiplies in int32 space
  * (literals.go:410, a latent overflow); we scale in BigInt space instead.
  */
final class LiteralCastError(msg: String) extends IllegalArgumentException(msg)

sealed trait Literal {
  /** The Iceberg type this literal naturally carries. */
  def literalType: IcebergType
  /** Cast to `t`, saturating to sentinels when out of range. */
  def to(t: IcebergType): Literal =
    throw new LiteralCastError(s"cannot cast $this -> $t")
  /** Iceberg single-value binary serialization. */
  def toBytes: Array[Byte]
}

/** Range sentinels: compare above/below every value of their type; cannot be
  * serialized or re-cast (literals.go:155-217). */
sealed trait RangeSentinel extends Literal {
  def toBytes: Array[Byte] =
    throw new LiteralCastError(s"cannot serialize sentinel $this")
}
case object IntAboveMax extends RangeSentinel { val literalType = IntT }
case object IntBelowMin extends RangeSentinel { val literalType = IntT }
case object LongAboveMax extends RangeSentinel { val literalType = LongT }
case object LongBelowMin extends RangeSentinel { val literalType = LongT }
case object FloatAboveMax extends RangeSentinel { val literalType = FloatT }
case object FloatBelowMin extends RangeSentinel { val literalType = FloatT }
case object DoubleAboveMax extends RangeSentinel { val literalType = DoubleT }
case object DoubleBelowMin extends RangeSentinel { val literalType = DoubleT }

object LiteralCodec {
  private[core] def le(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
  private[core] def wrapLe(data: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)

  /** Decode a single-value buffer for `typ` (LiteralFromBytes,
    * literals.go:90-149). Null data → None. */
  def fromBytes(typ: IcebergType, data: Array[Byte]): Option[Literal] = {
    if (data == null) return None
    def need(n: Int): Unit =
      if (data.length != n)
        throw new LiteralCastError(s"expected $n bytes for $typ, got ${data.length}")
    Some(typ match {
      case BooleanT =>
        if (data.length < 1) throw new LiteralCastError("expected at least 1 byte for bool")
        BoolLit(data(0) != 0)
      case IntT => need(4); IntLit(wrapLe(data).getInt)
      // 4-byte values under widened types: bounds written before an
      // int→long / float→double type promotion stay decodable (Iceberg
      // promotion keeps the field id; old files keep old-width stats)
      case LongT if data.length == 4 => LongLit(wrapLe(data).getInt.toLong)
      case LongT => need(8); LongLit(wrapLe(data).getLong)
      case FloatT => need(4); FloatLit(wrapLe(data).getFloat)
      case DoubleT if data.length == 4 => DoubleLit(wrapLe(data).getFloat.toDouble)
      case DoubleT => need(8); DoubleLit(wrapLe(data).getDouble)
      case DateT => need(4); DateLit(wrapLe(data).getInt)
      case TimeT => need(8); TimeLit(wrapLe(data).getLong)
      case TimestampT | TimestampTzT => need(8); TsLit(wrapLe(data).getLong)
      // V3 ns timestamps: 8-byte LE long of nanos; surfaced as LongLit —
      // the same ns-epoch-long representation the read path uses
      case TimestampNsT | TimestampTzNsT => need(8); LongLit(wrapLe(data).getLong)
      case StringT => StrLit(new String(data, StandardCharsets.UTF_8))
      case BinaryT => BytesLit(data)
      case _: FixedT => FixedLit(data)
      case UuidT =>
        need(16)
        val bb = ByteBuffer.wrap(data) // big-endian
        UuidLit(new UUID(bb.getLong, bb.getLong))
      case d: DecimalT =>
        // two's-complement big-endian, minimal bytes; BigInteger(byte[])
        // implements exactly that encoding
        val unscaled = if (data.isEmpty) BigInteger.ZERO else new BigInteger(data)
        DecLit(BigInt(unscaled), d.scale)
      // V3 geo bounds are bbox corner POINTS carried as raw WKB bytes —
      // surfaced as binary (the evaluator parses them via Wkb, and
      // metadata tables show the raw bytes)
      case _: GeometryT | _: GeographyT => BytesLit(data)
      case other => throw new LiteralCastError(s"cannot decode bytes as $other")
    })
  }
}

final case class BoolLit(v: Boolean) extends Literal {
  val literalType: IcebergType = BooleanT
  def toBytes: Array[Byte] = Array(if (v) 1.toByte else 0.toByte)
  override def to(t: IcebergType): Literal = t match {
    case BooleanT => this
    case _ => super.to(t)
  }
}

final case class IntLit(v: Int) extends Literal {
  val literalType: IcebergType = IntT
  def toBytes: Array[Byte] = LiteralCodec.le(4).putInt(v).array()
  override def to(t: IcebergType): Literal = t match {
    case IntT => this
    case LongT => LongLit(v.toLong)
    case DateT => DateLit(v)
    case TimeT => TimeLit(v.toLong)
    case FloatT => FloatLit(v.toFloat)
    case DoubleT => DoubleLit(v.toDouble)
    case d: DecimalT => DecLit(BigInt(v) * BigInt(10).pow(d.scale), d.scale)
    case _ => super.to(t)
  }
}

final case class LongLit(v: Long) extends Literal {
  val literalType: IcebergType = LongT
  def toBytes: Array[Byte] = LiteralCodec.le(8).putLong(v).array()
  override def to(t: IcebergType): Literal = t match {
    case IntT =>
      if (v < Int.MinValue) IntBelowMin
      else if (v > Int.MaxValue) IntAboveMax
      else IntLit(v.toInt)
    case LongT => this
    case DateT => DateLit(v.toInt)
    case TimeT => TimeLit(v)
    case TimestampT | TimestampTzT => TsLit(v)
    // ns timestamps compare as ns-epoch longs (identity representation)
    case TimestampNsT | TimestampTzNsT => this
    case FloatT => FloatLit(v.toFloat)
    case DoubleT => DoubleLit(v.toDouble)
    case d: DecimalT => DecLit(BigInt(v) * BigInt(10).pow(d.scale), d.scale)
    case _ => super.to(t)
  }
}

final case class FloatLit(v: Float) extends Literal {
  val literalType: IcebergType = FloatT
  def toBytes: Array[Byte] = LiteralCodec.le(4).putFloat(v).array()
  override def to(t: IcebergType): Literal = t match {
    case FloatT => this
    case DoubleT => DoubleLit(v.toDouble)
    case d: DecimalT =>
      DecLit(BigInt(new JBigDecimal(v.toDouble)
        .setScale(d.scale, RoundingMode.HALF_UP).unscaledValue()), d.scale)
    case _ => super.to(t)
  }
}

final case class DoubleLit(v: Double) extends Literal {
  val literalType: IcebergType = DoubleT
  def toBytes: Array[Byte] = LiteralCodec.le(8).putDouble(v).array()
  override def to(t: IcebergType): Literal = t match {
    case FloatT =>
      if (v < -Float.MaxValue) FloatBelowMin
      else if (v > Float.MaxValue) FloatAboveMax
      else FloatLit(v.toFloat)
    case DoubleT => this
    case d: DecimalT =>
      DecLit(BigInt(new JBigDecimal(v)
        .setScale(d.scale, RoundingMode.HALF_UP).unscaledValue()), d.scale)
    case _ => super.to(t)
  }
}

final case class StrLit(v: String) extends Literal {
  val literalType: IcebergType = StringT
  def toBytes: Array[Byte] = v.getBytes(StandardCharsets.UTF_8)
  override def to(t: IcebergType): Literal = t match {
    case StringT => this
    case IntT =>
      try IntLit(v.toInt)
      catch { case _: NumberFormatException =>
        longOrSentinel(min = Int.MinValue, max = Int.MaxValue,
          below = IntBelowMin, above = IntAboveMax,
          wrap = l => IntLit(l.toInt))
      }
    case LongT =>
      try LongLit(v.toLong)
      catch { case _: NumberFormatException =>
        bigOrSentinel(below = LongBelowMin, above = LongAboveMax)
      }
    case FloatT =>
      val d = parseDouble
      if (d < -Float.MaxValue) FloatBelowMin
      else if (d > Float.MaxValue) FloatAboveMax
      else FloatLit(d.toFloat)
    case DoubleT =>
      val d = parseDouble
      if (d.isInfinite && !v.toLowerCase.contains("inf")) {
        if (d > 0) DoubleAboveMax else DoubleBelowMin
      } else DoubleLit(d)
    case DateT =>
      DateLit(LocalDate.parse(v).toEpochDay.toInt)
    case TimeT =>
      TimeLit(LocalTime.parse(v).toNanoOfDay / 1000L)
    case TimestampT =>
      val inst = LocalDateTime.parse(v).toInstant(ZoneOffset.UTC)
      TsLit(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
    case TimestampTzT =>
      val odt = OffsetDateTime.parse(v)
      TsLit(odt.toInstant.getEpochSecond * 1000000L + odt.toInstant.getNano / 1000L)
    case UuidT => UuidLit(UUID.fromString(v))
    case d: DecimalT =>
      val bd = new JBigDecimal(v)
      if (bd.precision() - bd.scale() > d.precision - d.scale)
        throw new LiteralCastError(s"decimal '$v' does not fit ${d.repr}")
      DecLit(BigInt(bd.setScale(d.scale, RoundingMode.UNNECESSARY).unscaledValue()), d.scale)
    case BooleanT => BoolLit(v.toBoolean)
    case _ => super.to(t)
  }

  private def parseDouble: Double =
    try v.toDouble
    catch { case e: NumberFormatException => throw new LiteralCastError(e.getMessage) }

  private def longOrSentinel(min: Long, max: Long, below: Literal, above: Literal,
                             wrap: Long => Literal): Literal =
    try {
      val l = v.toLong
      if (l < min) below else if (l > max) above else wrap(l)
    } catch { case _: NumberFormatException =>
      bigOrSentinel(below, above)
    }

  private def bigOrSentinel(below: Literal, above: Literal): Literal = {
    val b = try BigInt(v) catch {
      case _: NumberFormatException =>
        throw new LiteralCastError(s"could not convert '$v' to integral")
    }
    if (b.signum < 0) below else above
  }
}

final case class BytesLit(v: Array[Byte]) extends Literal {
  val literalType: IcebergType = BinaryT
  def toBytes: Array[Byte] = v
  override def to(t: IcebergType): Literal = t match {
    case BinaryT => this
    case f: FixedT =>
      if (v.length != f.len)
        throw new LiteralCastError(s"binary -> ${f.repr}, different length: ${v.length}")
      FixedLit(v)
    case _ => super.to(t)
  }
  override def equals(o: Any): Boolean = o match {
    case b: BytesLit => java.util.Arrays.equals(v, b.v)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(v)
}

final case class FixedLit(v: Array[Byte]) extends Literal {
  val literalType: IcebergType = FixedT(v.length)
  def toBytes: Array[Byte] = v
  override def to(t: IcebergType): Literal = t match {
    case BinaryT => BytesLit(v)
    case f: FixedT =>
      if (v.length != f.len)
        throw new LiteralCastError(s"fixed[${v.length}] -> ${f.repr}")
      this
    case _ => super.to(t)
  }
  override def equals(o: Any): Boolean = o match {
    case b: FixedLit => java.util.Arrays.equals(v, b.v)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(v)
}

/** Days since epoch. */
final case class DateLit(days: Int) extends Literal {
  val literalType: IcebergType = DateT
  def toBytes: Array[Byte] = LiteralCodec.le(4).putInt(days).array()
  override def to(t: IcebergType): Literal = t match {
    case DateT => this
    case _ => super.to(t)
  }
}

/** Microseconds since midnight. */
final case class TimeLit(us: Long) extends Literal {
  val literalType: IcebergType = TimeT
  def toBytes: Array[Byte] = LiteralCodec.le(8).putLong(us).array()
  override def to(t: IcebergType): Literal = t match {
    case TimeT => this
    case _ => super.to(t)
  }
}

/** Microseconds since epoch (tz-less and tz'd share a representation). */
final case class TsLit(us: Long) extends Literal {
  val literalType: IcebergType = TimestampT
  def toBytes: Array[Byte] = LiteralCodec.le(8).putLong(us).array()
  override def to(t: IcebergType): Literal = t match {
    case TimestampT | TimestampTzT => this
    case DateT => DateLit(Math.floorDiv(us, 86400000000L).toInt)
    case _ => super.to(t)
  }
}

final case class UuidLit(v: UUID) extends Literal {
  val literalType: IcebergType = UuidT
  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(16) // big-endian
    bb.putLong(v.getMostSignificantBits).putLong(v.getLeastSignificantBits).array()
  }
  override def to(t: IcebergType): Literal = t match {
    case UuidT => this
    case _ => super.to(t)
  }
}

/** Unscaled decimal value + scale. */
final case class DecLit(unscaled: BigInt, scale: Int) extends Literal {
  val literalType: IcebergType = {
    val p = unscaled.abs.toString.length
    DecimalT(math.max(p, scale + 1).min(38).max(1), scale)
  }
  def bigDecimal: JBigDecimal = new JBigDecimal(unscaled.bigInteger, scale)
  /** Minimal-byte two's-complement big-endian of the unscaled value —
    * exactly BigInteger.toByteArray. */
  def toBytes: Array[Byte] = unscaled.bigInteger.toByteArray
  override def to(t: IcebergType): Literal = t match {
    case d: DecimalT if d.scale == scale => this
    case _ => super.to(t)
  }
}

/** Same-type literal comparison for the metrics evaluator; sentinels compare
  * above/below everything of their type. */
object LiteralOrdering {
  /** Returns Some(negative|0|positive) when comparable, None otherwise. */
  def compare(a: Literal, b: Literal): Option[Int] = (a, b) match {
    case (IntAboveMax, IntAboveMax) | (IntBelowMin, IntBelowMin) |
         (LongAboveMax, LongAboveMax) | (LongBelowMin, LongBelowMin) |
         (FloatAboveMax, FloatAboveMax) | (FloatBelowMin, FloatBelowMin) |
         (DoubleAboveMax, DoubleAboveMax) | (DoubleBelowMin, DoubleBelowMin) => Some(0)
    case (IntAboveMax | LongAboveMax | FloatAboveMax | DoubleAboveMax, _) => Some(1)
    case (IntBelowMin | LongBelowMin | FloatBelowMin | DoubleBelowMin, _) => Some(-1)
    case (_, IntAboveMax | LongAboveMax | FloatAboveMax | DoubleAboveMax) => Some(-1)
    case (_, IntBelowMin | LongBelowMin | FloatBelowMin | DoubleBelowMin) => Some(1)
    case (BoolLit(x), BoolLit(y)) => Some(x.compareTo(y))
    case (IntLit(x), IntLit(y)) => Some(x.compareTo(y))
    case (LongLit(x), LongLit(y)) => Some(x.compareTo(y))
    case (FloatLit(x), FloatLit(y)) => Some(java.lang.Float.compare(x, y))
    case (DoubleLit(x), DoubleLit(y)) => Some(java.lang.Double.compare(x, y))
    case (StrLit(x), StrLit(y)) => Some(x.compareTo(y))
    case (DateLit(x), DateLit(y)) => Some(x.compareTo(y))
    case (TimeLit(x), TimeLit(y)) => Some(x.compareTo(y))
    case (TsLit(x), TsLit(y)) => Some(x.compareTo(y))
    case (d1: DecLit, d2: DecLit) => Some(d1.bigDecimal.compareTo(d2.bigDecimal))
    case (b1: BytesLit, b2: BytesLit) => Some(compareBytes(b1.v, b2.v))
    case (f1: FixedLit, f2: FixedLit) => Some(compareBytes(f1.v, f2.v))
    case (u1: UuidLit, u2: UuidLit) => Some(u1.v.compareTo(u2.v))
    case _ => None
  }

  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff).compareTo(b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length.compareTo(b.length)
  }
}
