package graft.core

import java.nio.charset.StandardCharsets

/** Partition transforms: parse/repr (parity with `partitions.go:189-298`) AND
  * application — which the reference never implemented (`PartitionType`
  * returns an empty struct, partitions.go:179-183). Application follows the
  * Iceberg spec: bucket[N] = (murmur3_x86_32(single-value-encoding) & MaxInt)
  * % N, truncate[W] per type, year/month/day/hour from epoch.
  */
sealed trait Transform {
  def repr: String
  /** Result type of applying this transform to a source of type `t`. */
  def resultType(t: IcebergType): IcebergType
  /** Apply to a literal (None in = None out; identity on null). */
  def apply(l: Option[Literal]): Option[Literal]
  override def toString: String = repr
}

case object IdentityTransform extends Transform {
  val repr = "identity"
  def resultType(t: IcebergType): IcebergType = t
  def apply(l: Option[Literal]): Option[Literal] = l
}

case object VoidTransform extends Transform {
  val repr = "void"
  def resultType(t: IcebergType): IcebergType = t
  def apply(l: Option[Literal]): Option[Literal] = None
}

final case class BucketTransform(n: Int) extends Transform {
  def repr = s"bucket[$n]"
  def resultType(t: IcebergType): IcebergType = IntT
  def apply(l: Option[Literal]): Option[Literal] = l.map {
    case lit => IntLit(BucketHash(lit, n))
  }
}

final case class TruncateTransform(w: Int) extends Transform {
  def repr = s"truncate[$w]"
  def resultType(t: IcebergType): IcebergType = t
  def apply(l: Option[Literal]): Option[Literal] = l.map {
    case IntLit(v) => IntLit(v - Math.floorMod(v, w))
    case LongLit(v) => LongLit(v - Math.floorMod(v, w.toLong))
    case StrLit(s) => StrLit(s.substring(0, math.min(w, s.length)))
    case BytesLit(b) => BytesLit(b.take(w))
    case d: DecLit =>
      val unscaled = d.unscaled
      DecLit(unscaled - unscaled.mod(BigInt(w)), d.scale)
    case other => throw new LiteralCastError(s"cannot truncate $other")
  }
}

sealed abstract class TimeTransform(val repr: String) extends Transform {
  def resultType(t: IcebergType): IcebergType = IntT
  protected def fromEpochDay(days: Long): Long
  protected def fromEpochMicros(us: Long): Long = {
    val days = Math.floorDiv(us, 86400000000L)
    fromEpochDay(days)
  }
  def apply(l: Option[Literal]): Option[Literal] = l.map {
    case DateLit(days) => wrap(fromEpochDay(days.toLong).toInt)
    case TsLit(us) => wrap(fromEpochMicros(us).toInt)
    case other => throw new LiteralCastError(s"cannot apply $repr to $other")
  }
  /** Result literal must carry the transform's result type (day → date). */
  protected def wrap(v: Int): Literal = IntLit(v)
}

case object YearTransform extends TimeTransform("year") {
  protected def fromEpochDay(days: Long): Long =
    java.time.LocalDate.ofEpochDay(days).getYear - 1970L
}
case object MonthTransform extends TimeTransform("month") {
  protected def fromEpochDay(days: Long): Long = {
    val d = java.time.LocalDate.ofEpochDay(days)
    (d.getYear - 1970L) * 12 + (d.getMonthValue - 1)
  }
}
case object DayTransform extends TimeTransform("day") {
  override def resultType(t: IcebergType): IcebergType = DateT
  protected def fromEpochDay(days: Long): Long = days
  override protected def wrap(v: Int): Literal = DateLit(v)
}
case object HourTransform extends TimeTransform("hour") {
  protected def fromEpochDay(days: Long): Long = days * 24
  override protected def fromEpochMicros(us: Long): Long =
    Math.floorDiv(us, 3600000000L)
}

/** Unrecognized transform names parse to this (forward compatibility). */
final case class UnknownTransform(name: String) extends Transform {
  def repr: String = name
  def resultType(t: IcebergType): IcebergType = StringT
  def apply(l: Option[Literal]): Option[Literal] =
    throw new LiteralCastError(s"cannot apply unknown transform $name")
}

object Transform {
  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  def parse(s: String): Transform = s match {
    case "identity" => IdentityTransform
    case "void" => VoidTransform
    case "year" => YearTransform
    case "month" => MonthTransform
    case "day" => DayTransform
    case "hour" => HourTransform
    case BucketRe(n) => BucketTransform(n.toInt)
    case TruncateRe(w) => TruncateTransform(w.toInt)
    case other => UnknownTransform(other)
  }
}

/** Iceberg bucket hashing: murmur3_x86_32 (seed 0) of the value's bucket
  * encoding. Per spec: int/long/date/time/timestamp hash as 8-byte
  * little-endian long; decimal as minimal big-endian two's-complement of the
  * unscaled value; string as UTF-8; uuid as 16 big-endian bytes.
  * NOTE: this is NOT Spark's `Murmur3Hash` expression (different byte layout
  * and seed 42) — a custom hash is mandatory for spec compatibility.
  */
object BucketHash {
  def apply(lit: Literal, n: Int): Int = (hash(lit) & Int.MaxValue) % n

  def hash(lit: Literal): Int = lit match {
    case IntLit(v) => Murmur3.hashBytes(longLe(v.toLong), 0)
    case LongLit(v) => Murmur3.hashBytes(longLe(v), 0)
    case DateLit(d) => Murmur3.hashBytes(longLe(d.toLong), 0)
    case TimeLit(us) => Murmur3.hashBytes(longLe(us), 0)
    case TsLit(us) => Murmur3.hashBytes(longLe(us), 0)
    case StrLit(s) => Murmur3.hashBytes(s.getBytes(StandardCharsets.UTF_8), 0)
    case b: BytesLit => Murmur3.hashBytes(b.v, 0)
    case f: FixedLit => Murmur3.hashBytes(f.v, 0)
    case d: DecLit => Murmur3.hashBytes(d.toBytes, 0)
    case u: UuidLit => Murmur3.hashBytes(u.toBytes, 0)
    case other => throw new LiteralCastError(s"bucket transform not defined for $other")
  }

  private def longLe(v: Long): Array[Byte] =
    LiteralCodec.le(8).putLong(v).array()
}

/** MurmurHash3 x86 32-bit (public domain algorithm, Austin Appleby).
  * Implemented from the published reference algorithm; block reads are
  * little-endian. */
object Murmur3 {
  def hashBytes(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = data.length
    var h1 = seed
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    // tail
    var k1 = 0
    val tail = nblocks * 4
    (len & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    // finalization
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }
}
