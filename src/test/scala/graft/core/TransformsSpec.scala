package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Transform parsing (partitions_test.go:30-153) and — beyond the reference,
  * which never implements application — transform APPLICATION, checked
  * against the Iceberg spec's Appendix B bucket-hash test vectors (the
  * murmur3 values published in the spec, not derived from any
  * implementation). */
class TransformsSpec extends AnyFunSuite {

  test("parse round trips") {
    for (s <- Seq("identity", "void", "year", "month", "day", "hour",
        "bucket[16]", "truncate[4]"))
      assert(Transform.parse(s).repr == s)
    assert(Transform.parse("zorp") == UnknownTransform("zorp"))
  }

  test("murmur3_x86_32 known vectors") {
    // public murmur3 reference vectors (seed 0)
    assert(Murmur3.hashBytes(Array.empty[Byte], 0) == 0)
    assert(Murmur3.hashBytes("hello".getBytes("UTF-8"), 0) == 0x248bfa47)
  }

  test("iceberg spec bucket hash vectors") {
    // Iceberg spec Appendix B "Bucket transform details" test values
    assert(BucketHash.hash(IntLit(34)) == 2017239379)
    assert(BucketHash.hash(LongLit(34L)) == 2017239379)
    assert(BucketHash.hash(DateLit(17486)) == -653330422) // 2017-11-16
    assert(BucketHash.hash(TimeLit(81068000000L)) == -662762989) // 22:31:08
    assert(BucketHash.hash(TsLit(1510871468000000L)) == -2047944441) // 2017-11-16T22:31:08
    assert(BucketHash.hash(StrLit("iceberg")) == 1210000089)
    assert(BucketHash.hash(DecLit(BigInt(1420), 2)) == -500754589) // 14.20
    assert(BucketHash.hash(
      UuidLit(java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7"))) == 1488055340)
    assert(BucketHash.hash(BytesLit(Array[Byte](0, 1, 2, 3))) == -188683207)
  }

  test("bucket value is non-negative mod n") {
    val t = BucketTransform(16)
    val b = t.apply(Some(DateLit(17486))).get.asInstanceOf[IntLit].v
    assert(b >= 0 && b < 16)
    // spec example: bucket[16] of int 34 → hash 2017239379 → bucket 3
    assert(BucketTransform(16).apply(Some(IntLit(34))).contains(IntLit(2017239379 % 16)))
  }

  test("truncate semantics per type") {
    assert(TruncateTransform(10).apply(Some(IntLit(17))).contains(IntLit(10)))
    assert(TruncateTransform(10).apply(Some(IntLit(-3))).contains(IntLit(-10)))
    assert(TruncateTransform(10).apply(Some(LongLit(-1L))).contains(LongLit(-10L)))
    assert(TruncateTransform(3).apply(Some(StrLit("iceberg"))).contains(StrLit("ice")))
    assert(TruncateTransform(10).apply(Some(StrLit("ice"))).contains(StrLit("ice")))
    // decimal truncates the unscaled value: 10.65 w=50 → 10.50
    assert(TruncateTransform(50).apply(Some(DecLit(BigInt(1065), 2)))
      .contains(DecLit(BigInt(1050), 2)))
  }

  test("temporal transforms") {
    val d = DateLit(17486) // 2017-11-16
    assert(YearTransform.apply(Some(d)).contains(IntLit(47))) // 2017 - 1970
    assert(MonthTransform.apply(Some(d)).contains(IntLit(47 * 12 + 10)))
    assert(DayTransform.apply(Some(d)).contains(DateLit(17486)))
    val ts = TsLit(1510871468000000L)
    assert(YearTransform.apply(Some(ts)).contains(IntLit(47)))
    assert(HourTransform.apply(Some(ts)).contains(IntLit((1510871468000000L / 3600000000L).toInt)))
    // pre-epoch floors toward negative infinity
    assert(DayTransform.apply(Some(TsLit(-1L))).contains(DateLit(-1)))
    assert(YearTransform.apply(Some(DateLit(-1))).contains(IntLit(-1)))
  }

  test("void maps everything to null") {
    assert(VoidTransform.apply(Some(IntLit(5))).isEmpty)
    assert(VoidTransform.apply(None).isEmpty)
  }

  test("partition spec partition type") {
    val schema = Schema(0, StructT(Seq(
      NestedField(1, "ts", TimestampT, required = true),
      NestedField(2, "id", LongT, required = true))))
    val spec = PartitionSpec(0, Seq(
      PartitionField(1, 1000, "ts_day", DayTransform),
      PartitionField(2, 1001, "id_bucket", BucketTransform(16))))
    val pt = spec.partitionType(schema)
    assert(pt.fields.map(f => (f.id, f.name, f.fieldType)) == Seq(
      (1000, "ts_day", DateT), (1001, "id_bucket", IntT)))
  }
}
