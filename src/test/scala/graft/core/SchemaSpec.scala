package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's schema fixtures and algorithms tests
  * (schema_test.go:32-628): nested fixture, name/ID indexes, case-insensitive
  * find, select/prune semantics, highest field id, JSON round-trip. */
class SchemaSpec extends AnyFunSuite {

  val nested: Schema = Schema(1, StructT(Seq(
    NestedField(1, "foo", StringT),
    NestedField(2, "bar", IntT, required = true),
    NestedField(3, "baz", BooleanT),
    NestedField(4, "qux", ListT(5, StringT, elementRequired = true), required = true),
    NestedField(6, "quux",
      MapT(7, StringT, 8, MapT(9, StringT, 10, IntT, valueRequired = true),
        valueRequired = true), required = true),
    NestedField(11, "location",
      ListT(12, StructT(Seq(
        NestedField(13, "latitude", FloatT),
        NestedField(14, "longitude", FloatT))), elementRequired = true),
      required = true),
    NestedField(15, "person", StructT(Seq(
      NestedField(16, "name", StringT),
      NestedField(17, "age", IntT, required = true))))
  )), identifierFieldIds = Seq(1))

  val simple: Schema = Schema(1, StructT(Seq(
    NestedField(1, "foo", StringT),
    NestedField(2, "bar", IntT, required = true),
    NestedField(3, "baz", BooleanT))), identifierFieldIds = Seq(2))

  test("index by id covers nested fields") {
    val idx = nested.idToField
    assert(idx(1).name == "foo")
    assert(idx(5).name == "element")
    assert(idx(7).name == "key")
    assert(idx(8).fieldType.isInstanceOf[MapT])
    assert(idx(10).fieldType == IntT)
    assert(idx(13).name == "latitude")
    assert(idx(17).name == "age")
    assert(idx.size == 17)
  }

  test("index by name: full paths and short forms") {
    val n = nested.nameToId
    assert(n("foo") == 1)
    assert(n("qux.element") == 5)
    assert(n("quux.key") == 7)
    assert(n("quux.value") == 8)
    assert(n("quux.value.key") == 9)
    assert(n("quux.value.value") == 10)
    assert(n("location.element.latitude") == 13)
    // short form skips `element`
    assert(n("location.latitude") == 13)
    assert(n("location.longitude") == 14)
    assert(n("person.name") == 16)
    assert(n("person.age") == 17)
  }

  test("case-insensitive find") {
    assert(nested.findFieldByNameCaseInsensitive("PERSON.Name").map(_.id).contains(16))
    assert(nested.findFieldByName("PERSON.Name").isEmpty)
  }

  test("highest field id") {
    assert(nested.highestFieldId == 17)
    assert(simple.highestFieldId == 3)
  }

  test("select keeps full subtree of chosen columns") {
    val s = nested.select(caseSensitive = true, "person")
    assert(s.fields.map(_.id) == Seq(15))
    assert(s.findFieldById(16).nonEmpty && s.findFieldById(17).nonEmpty)
  }

  test("select unknown column errors") {
    intercept[IllegalArgumentException](nested.select(caseSensitive = true, "nope"))
    // case-sensitive select of wrong case errors too
    intercept[IllegalArgumentException](nested.select(caseSensitive = true, "PERSON"))
  }

  test("prune keeps ancestor shells of selected leaves") {
    val p = nested.prune(Set(16))
    assert(p.fields.map(_.id) == Seq(15))
    val person = p.fields.head.fieldType.asInstanceOf[StructT]
    assert(person.fields.map(_.id) == Seq(16)) // age pruned away
  }

  test("prune through map value struct") {
    val p = nested.prune(Set(9))
    val quux = p.fields.head
    assert(quux.id == 6)
  }

  test("prune list element struct leaf") {
    val p = nested.prune(Set(13))
    val loc = p.fields.head.fieldType.asInstanceOf[ListT]
    val st = loc.element.asInstanceOf[StructT]
    assert(st.fields.map(_.id) == Seq(13))
  }

  test("json round trip preserves schema") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val sw = new java.io.StringWriter()
    val gen = mapper.createGenerator(sw)
    IcebergTypeJson.write(nested.struct, gen)
    gen.close()
    val parsed = IcebergTypeJson.parse(mapper.readTree(sw.toString))
    assert(parsed == nested.struct)
  }

  test("parse fixed and decimal type strings") {
    assert(IcebergTypeJson.parsePrimitive("fixed[16]") == FixedT(16))
    assert(IcebergTypeJson.parsePrimitive("decimal(9, 2)") == DecimalT(9, 2))
    assert(IcebergTypeJson.parsePrimitive("decimal(38,10)") == DecimalT(38, 10))
    intercept[IllegalArgumentException](IcebergTypeJson.parsePrimitive("whatever"))
  }

  test("field repr matches reference format") {
    assert(nested.fields(3).fieldType.repr == "list<string>")
    assert(nested.fields(4).fieldType.repr == "map<string, map<string, int>>")
  }
}
