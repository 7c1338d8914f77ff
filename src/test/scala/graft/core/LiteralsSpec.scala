package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's literal cast-matrix and binary-codec tests
  * (literals_test.go:34-437): identity/widening casts, out-of-range
  * saturation sentinels, invalid casts, and single-value round trips. */
class LiteralsSpec extends AnyFunSuite {

  test("int widening casts") {
    assert(IntLit(34).to(LongT) == LongLit(34))
    assert(IntLit(34).to(DoubleT) == DoubleLit(34.0))
    assert(IntLit(34).to(FloatT) == FloatLit(34.0f))
    assert(IntLit(17486).to(DateT) == DateLit(17486))
    assert(IntLit(3).to(DecimalT(9, 2)) == DecLit(BigInt(300), 2))
  }

  test("long to int saturates to sentinels") {
    assert(LongLit(Long.MaxValue).to(IntT) == IntAboveMax)
    assert(LongLit(Long.MinValue).to(IntT) == IntBelowMin)
    assert(LongLit(34).to(IntT) == IntLit(34))
  }

  test("double to float saturates to sentinels") {
    assert(DoubleLit(Double.MaxValue).to(FloatT) == FloatAboveMax)
    assert(DoubleLit(-Double.MaxValue).to(FloatT) == FloatBelowMin)
    assert(DoubleLit(1.5).to(FloatT) == FloatLit(1.5f))
  }

  test("string numeric casts with range sentinels") {
    assert(StrLit("34").to(IntT) == IntLit(34))
    assert(StrLit("9999999999").to(IntT) == IntAboveMax)
    assert(StrLit("-9999999999").to(IntT) == IntBelowMin)
    assert(StrLit("99999999999999999999999999").to(LongT) == LongAboveMax)
    assert(StrLit("-99999999999999999999999999").to(LongT) == LongBelowMin)
    assert(StrLit("3.14").to(DoubleT) == DoubleLit(3.14))
    assert(StrLit("true").to(BooleanT) == BoolLit(true))
  }

  test("string temporal casts") {
    assert(StrLit("2017-11-16").to(DateT) == DateLit(17486))
    assert(StrLit("22:31:08").to(TimeT) == TimeLit(81068000000L))
    assert(StrLit("2017-11-16T22:31:08").to(TimestampT) == TsLit(1510871468000000L))
    assert(StrLit("2017-11-16T14:31:08-08:00").to(TimestampTzT) == TsLit(1510871468000000L))
  }

  test("string uuid and decimal casts") {
    assert(StrLit("f79c3e09-677c-4bbd-a479-3f349cb785e7").to(UuidT) ==
      UuidLit(java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7")))
    assert(StrLit("14.20").to(DecimalT(9, 2)) == DecLit(BigInt(1420), 2))
  }

  test("timestamp to date truncates toward negative infinity") {
    assert(TsLit(1510871468000000L).to(DateT) == DateLit(17486))
    assert(TsLit(-1L).to(DateT) == DateLit(-1)) // 1969-12-31, not 1970-01-01
  }

  test("invalid casts throw") {
    intercept[LiteralCastError](BoolLit(true).to(IntT))
    intercept[LiteralCastError](DateLit(1).to(TimestampT))
    intercept[LiteralCastError](IntAboveMax.to(LongT))
    intercept[LiteralCastError](BytesLit(Array[Byte](1, 2)).to(FixedT(3)))
  }

  test("sentinels cannot serialize") {
    intercept[LiteralCastError](IntAboveMax.toBytes)
  }

  test("single-value binary round trips (fixed vectors)") {
    def rt(lit: Literal, t: IcebergType): Unit =
      assert(LiteralCodec.fromBytes(t, lit.toBytes).contains(lit), s"round trip $lit")
    rt(BoolLit(true), BooleanT)
    rt(BoolLit(false), BooleanT)
    rt(IntLit(Int.MinValue), IntT)
    rt(LongLit(Long.MaxValue), LongT)
    rt(FloatLit(1.25f), FloatT)
    rt(DoubleLit(-3.5e123), DoubleT)
    rt(StrLit("héllo wörld"), StringT)
    rt(DateLit(17486), DateT)
    rt(TimeLit(81068000000L), TimeT)
    rt(TsLit(1510871468000000L), TimestampT)
    rt(UuidLit(java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7")), UuidT)
    rt(BytesLit(Array[Byte](0, 1, 2, 3)), BinaryT)
  }

  test("known little-endian encodings") {
    assert(IntLit(1).toBytes.toSeq == Seq[Byte](1, 0, 0, 0))
    assert(LongLit(1).toBytes.toSeq == Seq[Byte](1, 0, 0, 0, 0, 0, 0, 0))
  }

  test("decimal minimal-bytes two's complement") {
    // 14.20 → unscaled 1420 = 0x058C → 2 bytes
    assert(DecLit(BigInt(1420), 2).toBytes.toSeq == Seq[Byte](0x05, 0x8c.toByte))
    // negative: -1 → single 0xFF byte
    assert(DecLit(BigInt(-1), 2).toBytes.toSeq == Seq[Byte](0xff.toByte))
    // round trips incl. negatives
    for (v <- Seq(BigInt(0), BigInt(-1420), BigInt("99999999999999999999"),
        BigInt("-99999999999999999999"))) {
      val lit = DecLit(v, 4)
      assert(LiteralCodec.fromBytes(DecimalT(38, 4), lit.toBytes).contains(lit))
    }
  }

  test("property: int/long/double/string/decimal codecs round trip (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val i = rnd.nextInt()
      assert(LiteralCodec.fromBytes(IntT, IntLit(i).toBytes).contains(IntLit(i)))
      val l = rnd.nextLong()
      assert(LiteralCodec.fromBytes(LongT, LongLit(l).toBytes).contains(LongLit(l)))
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (!d.isNaN)
        assert(LiteralCodec.fromBytes(DoubleT, DoubleLit(d).toBytes).contains(DoubleLit(d)))
      val s = rnd.nextString(rnd.nextInt(40))
      assert(LiteralCodec.fromBytes(StringT, StrLit(s).toBytes).contains(StrLit(s)))
      val b = BigInt(rnd.nextInt(120), rnd.self) * (if (rnd.nextBoolean()) 1 else -1)
      val lit = DecLit(b, 2)
      assert(LiteralCodec.fromBytes(DecimalT(38, 2), lit.toBytes).contains(lit))
    }
  }

  test("literal ordering with sentinels") {
    assert(LiteralOrdering.compare(IntAboveMax, IntLit(Int.MaxValue)).exists(_ > 0))
    assert(LiteralOrdering.compare(IntBelowMin, IntLit(Int.MinValue)).exists(_ < 0))
    assert(LiteralOrdering.compare(StrLit("a"), StrLit("b")).exists(_ < 0))
    assert(LiteralOrdering.compare(DecLit(BigInt(100), 2), DecLit(BigInt(100), 2)).contains(0))
    assert(LiteralOrdering.compare(IntLit(1), StrLit("x")).isEmpty)
  }
}
