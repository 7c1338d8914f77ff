package graft.core

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Iceberg type system as a sealed ADT.
  *
  * Capability parity with the reference's `types.go:42-608` (primitive
  * singletons, fixed/decimal parameterized types, nested struct/list/map with
  * stable field IDs), re-expressed as Scala case objects/classes so every
  * schema algorithm is a pattern-match fold instead of interface dispatch.
  */
sealed trait IcebergType {
  /** Iceberg type-string representation (`schema.go` String() forms). */
  def repr: String
  def isPrimitive: Boolean = this match {
    case _: NestedIcebergType => false
    case _ => true
  }
  override def toString: String = repr
}

sealed trait NestedIcebergType extends IcebergType {
  def fields: Seq[NestedField]
}

case object BooleanT extends IcebergType { val repr = "boolean" }
case object IntT extends IcebergType { val repr = "int" }
case object LongT extends IcebergType { val repr = "long" }
case object FloatT extends IcebergType { val repr = "float" }
case object DoubleT extends IcebergType { val repr = "double" }
case object DateT extends IcebergType { val repr = "date" }
case object TimeT extends IcebergType { val repr = "time" }
case object TimestampT extends IcebergType { val repr = "timestamp" }
case object TimestampTzT extends IcebergType { val repr = "timestamptz" }
case object StringT extends IcebergType { val repr = "string" }
case object UuidT extends IcebergType { val repr = "uuid" }
case object BinaryT extends IcebergType { val repr = "binary" }
/** V3 `unknown`: the always-null placeholder type (a column whose type
  * could not be determined at add time). Read-only here: every value is
  * null; writes refuse it at schema-conversion sites. */
case object UnknownT extends IcebergType { val repr = "unknown" }
/** V3 nanosecond timestamps. Spark has no nanosecond timestamp type, so
  * these surface as LongType nanosecond-epoch values with a schema
  * metadata marker (loud-and-documented, lossless) rather than a silent
  * µs truncation. */
case object TimestampNsT extends IcebergType { val repr = "timestamp_ns" }
case object TimestampTzNsT extends IcebergType { val repr = "timestamptz_ns" }
/** V3 `variant`: semi-structured value (binary metadata + value encoding).
  * Surfaces through Spark's VariantType. */
case object VariantT extends IcebergType { val repr = "variant" }
/** V3 geospatial types. Values are WKB; Spark has no geo type, so they
  * surface as BinaryType WKB bytes with a metadata marker, and PREDICATES
  * on geo columns are refused at bind time (geo bounds are points, not
  * byte-comparable ranges — pruning on them would be wrong). */
final case class GeometryT(crs: String = GeoDefaults.Crs) extends IcebergType {
  def repr: String =
    if (crs == GeoDefaults.Crs) "geometry" else s"geometry($crs)"
}
final case class GeographyT(crs: String = GeoDefaults.Crs,
                            algorithm: String = GeoDefaults.Algorithm)
    extends IcebergType {
  def repr: String =
    if (crs == GeoDefaults.Crs && algorithm == GeoDefaults.Algorithm) "geography"
    else if (algorithm == GeoDefaults.Algorithm) s"geography($crs)"
    else s"geography($crs, $algorithm)"
}
object GeoDefaults {
  /** Spec defaults: CRS `OGC:CRS84`, edge algorithm `spherical`. */
  val Crs = "OGC:CRS84"
  val Algorithm = "spherical"
}
final case class FixedT(len: Int) extends IcebergType { def repr = s"fixed[$len]" }
final case class DecimalT(precision: Int, scale: Int) extends IcebergType {
  require(precision >= 1 && precision <= 38, s"decimal precision out of range: $precision")
  def repr = s"decimal($precision, $scale)"
}

/** A named, identified struct member (`types.go:137-146`). Field IDs are the
  * stable identity — every stat map and partition spec references columns by
  * ID, never by name. `initialDefault` is the V3 column-default contract:
  * data files written BEFORE the field existed read this value (not null);
  * `writeDefault` fills the field when a writer omits it. */
final case class NestedField(
    id: Int,
    name: String,
    fieldType: IcebergType,
    required: Boolean = false,
    doc: Option[String] = None,
    initialDefault: Option[Literal] = None,
    writeDefault: Option[Literal] = None)

final case class StructT(fields: Seq[NestedField]) extends NestedIcebergType {
  def repr: String =
    fields.map(f => s"${f.id}: ${f.name}: ${if (f.required) "required" else "optional"} ${f.fieldType.repr}")
      .mkString("struct<", ", ", ">")
  def fieldById(id: Int): Option[NestedField] = fields.find(_.id == id)
}

final case class ListT(elementId: Int, element: IcebergType,
                       elementRequired: Boolean) extends NestedIcebergType {
  def repr = s"list<${element.repr}>"
  def elementField: NestedField =
    NestedField(elementId, "element", element, elementRequired)
  def fields: Seq[NestedField] = Seq(elementField)
}

/** Map keys are always required (`types.go:316-323`). */
final case class MapT(keyId: Int, key: IcebergType, valueId: Int,
                      value: IcebergType, valueRequired: Boolean) extends NestedIcebergType {
  def repr = s"map<${key.repr}, ${value.repr}>"
  def keyField: NestedField = NestedField(keyId, "key", key, required = true)
  def valueField: NestedField = NestedField(valueId, "value", value, valueRequired)
  def fields: Seq[NestedField] = Seq(keyField, valueField)
}

/** JSON (de)serialization of types, matching the Iceberg spec dialect that the
  * reference parses in `types.go:61-135` — bare primitive names,
  * `fixed[N]` / `decimal(P, S)` string forms, and `{"type": "struct"|"list"|
  * "map"}` objects. (Spark's `DataType.fromJson` is a different dialect; this
  * parser is required for Iceberg metadata JSON.) */
object IcebergTypeJson {
  private val FixedRe = """fixed\[\s*(\d+)\s*\]""".r
  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val GeometryRe = """geometry\(\s*([^)]*?)\s*\)""".r
  private val GeographyRe1 = """geography\(\s*([^,)]*?)\s*\)""".r
  private val GeographyRe2 = """geography\(\s*([^,)]*?)\s*,\s*([^)]*?)\s*\)""".r

  def parse(node: JsonNode): IcebergType =
    if (node.isTextual) parsePrimitive(node.asText())
    else if (node.isObject) parseNested(node.asInstanceOf[ObjectNode])
    else throw new IllegalArgumentException(s"cannot parse type from: $node")

  def parsePrimitive(s: String): IcebergType = s match {
    case "boolean" => BooleanT
    case "int" => IntT
    case "long" => LongT
    case "float" => FloatT
    case "double" => DoubleT
    case "date" => DateT
    case "time" => TimeT
    case "timestamp" => TimestampT
    case "timestamptz" => TimestampTzT
    case "string" => StringT
    case "uuid" => UuidT
    case "binary" => BinaryT
    case "unknown" => UnknownT
    case "timestamp_ns" => TimestampNsT
    case "timestamptz_ns" => TimestampTzNsT
    case "variant" => VariantT
    case "geometry" => GeometryT()
    case "geography" => GeographyT()
    case FixedRe(n) => FixedT(n.toInt)
    case DecimalRe(p, sc) => DecimalT(p.toInt, sc.toInt)
    case GeometryRe(crs) => GeometryT(crs)
    case GeographyRe2(crs, alg) => GeographyT(crs, alg)
    case GeographyRe1(crs) => GeographyT(crs)
    case other => throw new IllegalArgumentException(s"unknown primitive type: $other")
  }

  private def reqText(n: JsonNode, field: String): JsonNode = {
    val v = n.get(field)
    if (v == null) throw new IllegalArgumentException(s"missing required key '$field' in $n")
    v
  }

  private def parseNested(o: ObjectNode): IcebergType =
    reqText(o, "type").asText() match {
      case "struct" =>
        val fs = reqText(o, "fields").asInstanceOf[ArrayNode]
        val buf = Vector.newBuilder[NestedField]
        fs.forEach { f =>
          val ft = parse(reqText(f, "type"))
          buf += NestedField(
            id = reqText(f, "id").asInt(),
            name = reqText(f, "name").asText(),
            fieldType = ft,
            required = reqText(f, "required").asBoolean(),
            doc = Option(f.get("doc")).map(_.asText()),
            // V3 column defaults — single-value JSON, typed by the field.
            // Parsing (vs skipping) is load-bearing: an unread
            // initial-default means every pre-existing data file reads
            // NULL where the spec requires the default value.
            initialDefault = Option(f.get("initial-default"))
              .filterNot(_.isNull).map(SingleValueJson.parse(ft, _)),
            writeDefault = Option(f.get("write-default"))
              .filterNot(_.isNull).map(SingleValueJson.parse(ft, _)))
        }
        StructT(buf.result())
      case "list" =>
        ListT(
          elementId = reqText(o, "element-id").asInt(),
          element = parse(reqText(o, "element")),
          elementRequired = reqText(o, "element-required").asBoolean())
      case "map" =>
        MapT(
          keyId = reqText(o, "key-id").asInt(),
          key = parse(reqText(o, "key")),
          valueId = reqText(o, "value-id").asInt(),
          value = parse(reqText(o, "value")),
          valueRequired = reqText(o, "value-required").asBoolean())
      case other => throw new IllegalArgumentException(s"unknown nested type: $other")
    }

  /** Serialize back to the Iceberg JSON dialect. */
  def write(t: IcebergType, gen: com.fasterxml.jackson.core.JsonGenerator): Unit = t match {
    case s: StructT =>
      gen.writeStartObject()
      gen.writeStringField("type", "struct")
      gen.writeArrayFieldStart("fields")
      s.fields.foreach { f =>
        gen.writeStartObject()
        gen.writeNumberField("id", f.id)
        gen.writeStringField("name", f.name)
        gen.writeBooleanField("required", f.required)
        gen.writeFieldName("type"); write(f.fieldType, gen)
        f.doc.foreach(d => gen.writeStringField("doc", d))
        f.initialDefault.foreach { l =>
          gen.writeFieldName("initial-default")
          SingleValueJson.writeTo(l, f.fieldType, gen)
        }
        f.writeDefault.foreach { l =>
          gen.writeFieldName("write-default")
          SingleValueJson.writeTo(l, f.fieldType, gen)
        }
        gen.writeEndObject()
      }
      gen.writeEndArray()
      gen.writeEndObject()
    case l: ListT =>
      gen.writeStartObject()
      gen.writeStringField("type", "list")
      gen.writeNumberField("element-id", l.elementId)
      gen.writeFieldName("element"); write(l.element, gen)
      gen.writeBooleanField("element-required", l.elementRequired)
      gen.writeEndObject()
    case m: MapT =>
      gen.writeStartObject()
      gen.writeStringField("type", "map")
      gen.writeNumberField("key-id", m.keyId)
      gen.writeFieldName("key"); write(m.key, gen)
      gen.writeNumberField("value-id", m.valueId)
      gen.writeFieldName("value"); write(m.value, gen)
      gen.writeBooleanField("value-required", m.valueRequired)
      gen.writeEndObject()
    case p => gen.writeString(p.repr)
  }
}
