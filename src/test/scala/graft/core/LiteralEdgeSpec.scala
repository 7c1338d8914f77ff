package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Edge cases around sentinels, special floats, and codec boundaries the
  * main literal spec doesn't cover. */
class LiteralEdgeSpec extends AnyFunSuite {

  test("string to double: overflow saturates, literal inf parses as inf") {
    assert(StrLit("1e400").to(DoubleT) == DoubleAboveMax)
    assert(StrLit("-1e400").to(DoubleT) == DoubleBelowMin)
    assert(StrLit("Infinity").to(DoubleT) == DoubleLit(Double.PositiveInfinity))
    assert(StrLit("1e39").to(FloatT) == FloatAboveMax)
    assert(StrLit("-1e39").to(FloatT) == FloatBelowMin)
    assert(StrLit("3.5").to(FloatT) == FloatLit(3.5f))
  }

  test("string to int: non-numeric throws, whitespace throws") {
    intercept[LiteralCastError](StrLit("abc").to(IntT))
    intercept[LiteralCastError](StrLit("").to(LongT))
  }

  test("decimal string that does not fit precision throws") {
    intercept[LiteralCastError](StrLit("123456.78").to(DecimalT(5, 2)))
    // exact fit works
    assert(StrLit("999.99").to(DecimalT(5, 2)) == DecLit(BigInt(99999), 2))
  }

  test("NaN round trips through the codec") {
    val nan = DoubleLit(Double.NaN)
    val back = LiteralCodec.fromBytes(DoubleT, nan.toBytes).get.asInstanceOf[DoubleLit]
    assert(back.v.isNaN)
    val fnan = FloatLit(Float.NaN)
    assert(LiteralCodec.fromBytes(FloatT, fnan.toBytes).get
      .asInstanceOf[FloatLit].v.isNaN)
  }

  test("uuid codec is big-endian and ordering is uuid-semantic") {
    val u = java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7")
    val bytes = UuidLit(u).toBytes
    assert(bytes.length == 16)
    assert((bytes(0) & 0xff) == 0xf7) // big-endian: msb first
    assert(LiteralCodec.fromBytes(UuidT, bytes).contains(UuidLit(u)))
  }

  test("fixed codec length checks") {
    val f = FixedLit(Array[Byte](1, 2, 3))
    assert(f.literalType == FixedT(3))
    assert(f.to(FixedT(3)) == f)
    intercept[LiteralCastError](f.to(FixedT(4)))
    assert(f.to(BinaryT) == BytesLit(Array[Byte](1, 2, 3)))
  }

  test("wrong byte counts are rejected") {
    intercept[LiteralCastError](LiteralCodec.fromBytes(IntT, Array[Byte](1, 2)))
    intercept[LiteralCastError](LiteralCodec.fromBytes(LongT, Array[Byte](1, 2, 3)))
    intercept[LiteralCastError](LiteralCodec.fromBytes(UuidT, Array[Byte](1)))
    intercept[LiteralCastError](LiteralCodec.fromBytes(BooleanT, Array.empty[Byte]))
  }

  test("pre-promotion 4-byte values widen under long/double") {
    // bounds written before an int→long / float→double promotion
    assert(LiteralCodec.fromBytes(LongT, IntLit(-7).toBytes)
      .contains(LongLit(-7L)))
    assert(LiteralCodec.fromBytes(DoubleT, FloatLit(1.5f).toBytes)
      .contains(DoubleLit(1.5)))
  }

  test("empty decimal bytes decode to zero (spec allows minimal bytes)") {
    assert(LiteralCodec.fromBytes(DecimalT(9, 2), Array.empty[Byte])
      .contains(DecLit(BigInt(0), 2)))
  }

  test("null data decodes to None") {
    assert(LiteralCodec.fromBytes(LongT, null).isEmpty)
  }

  test("binary bound comparison is unsigned bytewise") {
    // 0x80 > 0x7f unsigned, though negative as a signed byte
    val hi = BytesLit(Array(0x80.toByte))
    val lo = BytesLit(Array(0x7f.toByte))
    assert(LiteralOrdering.compare(hi, lo).exists(_ > 0))
    // prefix compares less than its extension
    assert(LiteralOrdering.compare(BytesLit(Array[Byte](1)),
      BytesLit(Array[Byte](1, 0))).exists(_ < 0))
  }
}
