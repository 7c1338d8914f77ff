package graft.spark

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Type-fidelity mapping (SURVEY §1.2 + hard part (e)): time/uuid/fixed have
  * no Spark analog and must degrade predictably WITH a metadata tag so the
  * Iceberg type can be recovered. */
class SchemaConvSpec extends AnyFunSuite {

  val schema: Schema = Schema(0, StructT(Seq(
    NestedField(1, "t", TimeT),
    NestedField(2, "u", UuidT, required = true),
    NestedField(3, "f", FixedT(16)),
    NestedField(4, "d", DecimalT(9, 2)),
    NestedField(5, "ts", TimestampT),
    NestedField(6, "tstz", TimestampTzT),
    NestedField(7, "tags", ListT(8, StringT, elementRequired = false)),
    NestedField(9, "props", MapT(10, StringT, 11, LongT, valueRequired = true)))))

  test("degraded types carry their iceberg type tag") {
    val st = SchemaConv.toSparkSchema(schema)
    assert(st("t").dataType == LongType)
    assert(st("t").metadata.getString(SchemaConv.TypeTagKey) == "time")
    assert(st("u").dataType == StringType)
    assert(st("u").metadata.getString(SchemaConv.TypeTagKey) == "uuid")
    assert(!st("u").nullable)
    assert(st("f").dataType == BinaryType)
    assert(st("f").metadata.getString(SchemaConv.TypeTagKey) == "fixed[16]")
  }

  test("exact types map directly and keep field ids") {
    val st = SchemaConv.toSparkSchema(schema)
    assert(st("d").dataType == DecimalType(9, 2))
    assert(st("ts").dataType == TimestampNTZType)
    assert(st("tstz").dataType == TimestampType)
    assert(st("tags").dataType == ArrayType(StringType, containsNull = true))
    assert(st("props").dataType == MapType(StringType, LongType, valueContainsNull = false))
    assert(st.fields.map(_.metadata.getLong(SchemaConv.FieldIdKey)).toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L))
  }

  test("fresh id assignment allocates parents before children") {
    val st = StructType(Seq(
      StructField("a", LongType),
      StructField("arr", ArrayType(StructType(Seq(StructField("x", IntegerType)))))))
    val ice = SchemaConv.fromSparkSchema(st)
    assert(ice.findFieldByName("a").map(_.id).contains(1))
    assert(ice.findFieldByName("arr").map(_.id).contains(2))
    val list = ice.findFieldByName("arr").get.fieldType.asInstanceOf[ListT]
    assert(list.elementId == 3)
    assert(list.element.asInstanceOf[StructT].fields.head.id == 4)
    assert(ice.highestFieldId == 4)
  }
}
