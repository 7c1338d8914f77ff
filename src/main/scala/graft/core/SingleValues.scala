package graft.core

import java.time.{Instant, LocalDate, LocalDateTime, LocalTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import com.fasterxml.jackson.core.JsonGenerator
import com.fasterxml.jackson.databind.JsonNode

/** Iceberg "JSON single-value serialization" (spec Appendix D) — the wire
  * form of schema default values (`initial-default` / `write-default`,
  * format-version 3). The reference models the fields
  * (`types.go:137-146`, `InitialDefault`/`WriteDefault`) but never encodes
  * or decodes them; this is the full codec:
  *
  *   - boolean → JSON boolean; int/long → JSON int; float/double → number
  *   - decimal → string with the type's exact scale ("14.20")
  *   - date → "2017-11-16"; time → "22:31:08.123456"
  *   - timestamp → "2017-11-16T22:31:08.000001" (tz form suffixed "+00:00")
  *   - string → JSON string; uuid → canonical lowercase uuid string
  *   - fixed/binary → lowercase hex string ("000102ff")
  *
  * Defaults on NESTED types (struct/list/map) are refused loudly at parse
  * time rather than half-supported: a silent skip would read NULL where
  * another engine wrote a structured default — exactly the wrong-answer
  * class this codec exists to close. */
object SingleValueJson {

  private val timeFmt = DateTimeFormatter.ofPattern("HH:mm:ss.SSSSSS")
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** Parse one single-value JSON node as a literal of `typ`. */
  def parse(typ: IcebergType, node: JsonNode): Literal = typ match {
    case BooleanT =>
      require(node.isBoolean, s"boolean single-value must be a JSON boolean: $node")
      BoolLit(node.asBoolean())
    case IntT =>
      require(node.isIntegralNumber, s"int single-value must be a JSON int: $node")
      IntLit(node.asInt())
    case LongT =>
      require(node.isIntegralNumber, s"long single-value must be a JSON int: $node")
      LongLit(node.asLong())
    case FloatT =>
      require(node.isNumber, s"float single-value must be a JSON number: $node")
      FloatLit(node.asDouble().toFloat)
    case DoubleT =>
      require(node.isNumber, s"double single-value must be a JSON number: $node")
      DoubleLit(node.asDouble())
    case DecimalT(_, scale) =>
      require(node.isTextual, s"decimal single-value must be a JSON string: $node")
      val bd = new java.math.BigDecimal(node.asText()).setScale(scale)
      DecLit(BigInt(bd.unscaledValue()), scale)
    case DateT =>
      require(node.isTextual, s"date single-value must be a JSON string: $node")
      DateLit(LocalDate.parse(node.asText()).toEpochDay.toInt)
    case TimeT =>
      require(node.isTextual, s"time single-value must be a JSON string: $node")
      TimeLit(LocalTime.parse(node.asText()).toNanoOfDay / 1000L)
    case TimestampT =>
      require(node.isTextual, s"timestamp single-value must be a JSON string: $node")
      val ldt = LocalDateTime.parse(node.asText())
      TsLit(ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L)
    case TimestampTzT =>
      require(node.isTextual, s"timestamptz single-value must be a JSON string: $node")
      val odt = java.time.OffsetDateTime.parse(node.asText())
      val inst = odt.toInstant
      TsLit(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
    case StringT =>
      require(node.isTextual, s"string single-value must be a JSON string: $node")
      StrLit(node.asText())
    case UuidT =>
      require(node.isTextual, s"uuid single-value must be a JSON string: $node")
      UuidLit(java.util.UUID.fromString(node.asText()))
    case BinaryT =>
      require(node.isTextual, s"binary single-value must be a JSON hex string: $node")
      BytesLit(fromHex(node.asText()))
    case FixedT(len) =>
      require(node.isTextual, s"fixed single-value must be a JSON hex string: $node")
      val bytes = fromHex(node.asText())
      require(bytes.length == len,
        s"fixed[$len] single-value has ${bytes.length} bytes")
      FixedLit(bytes)
    case UnknownT =>
      throw new IllegalArgumentException(
        "the unknown type has no storable values (it reads as null)")
    case TimestampNsT | TimestampTzNsT =>
      require(node.isTextual,
        s"${typ.repr} single-value must be a JSON string: $node")
      // nanosecond precision — parsed at full resolution into a ns-epoch
      // long (the same representation the read path surfaces)
      val inst =
        if (typ == TimestampTzNsT) java.time.OffsetDateTime.parse(node.asText()).toInstant
        else LocalDateTime.parse(node.asText()).toInstant(ZoneOffset.UTC)
      LongLit(Math.addExact(
        Math.multiplyExact(inst.getEpochSecond, 1000000000L), inst.getNano))
    case VariantT | _: GeometryT | _: GeographyT =>
      throw new IllegalArgumentException(
        s"default values for ${typ.repr} are not supported")
    case nested: NestedIcebergType =>
      throw new IllegalArgumentException(
        s"default values for nested types are not supported: ${nested.repr}")
  }

  /** Parse a standalone JSON text (the metadata-carried form). */
  def parseString(typ: IcebergType, json: String): Literal =
    parse(new com.fasterxml.jackson.databind.ObjectMapper().readTree(json), typ)

  private def parse(node: JsonNode, typ: IcebergType): Literal = parse(typ, node)

  /** Write one literal in single-value form onto an open generator.
    * `typ` disambiguates the shared timestamp representation: the tz'd
    * form carries an explicit "+00:00" offset, the tz-less form none. */
  def writeTo(lit: Literal, typ: IcebergType, gen: JsonGenerator): Unit =
    (lit, typ) match {
      case (TsLit(us), TimestampTzT) =>
        val inst = Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L)
        gen.writeString(
          tsFmt.format(LocalDateTime.ofInstant(inst, ZoneOffset.UTC)) + "+00:00")
      case _ => writeTo(lit, gen)
    }

  private def writeTo(lit: Literal, gen: JsonGenerator): Unit = lit match {
    case BoolLit(v) => gen.writeBoolean(v)
    case IntLit(v) => gen.writeNumber(v)
    case LongLit(v) => gen.writeNumber(v)
    case FloatLit(v) => gen.writeNumber(v.toDouble)
    case DoubleLit(v) => gen.writeNumber(v)
    case d: DecLit => gen.writeString(d.bigDecimal.toPlainString)
    case DateLit(days) => gen.writeString(LocalDate.ofEpochDay(days.toLong).toString)
    case TimeLit(us) => gen.writeString(timeFmt.format(LocalTime.ofNanoOfDay(us * 1000L)))
    case TsLit(us) =>
      val inst = Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L)
      gen.writeString(tsFmt.format(LocalDateTime.ofInstant(inst, ZoneOffset.UTC)))
    case StrLit(v) => gen.writeString(v)
    case UuidLit(v) => gen.writeString(v.toString)
    case BytesLit(v) => gen.writeString(toHex(v))
    case FixedLit(v) => gen.writeString(toHex(v))
    case s: RangeSentinel =>
      throw new IllegalArgumentException(s"range sentinel is not a storable value: $s")
  }

  /** Standalone JSON text of one literal (metadata-carried form). */
  def toJsonString(lit: Literal, typ: IcebergType): String = {
    val sw = new java.io.StringWriter()
    val gen = new com.fasterxml.jackson.databind.ObjectMapper().createGenerator(sw)
    writeTo(lit, typ, gen)
    gen.close()
    sw.toString
  }

  private def toHex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  private def fromHex(s: String): Array[Byte] = {
    require(s.length % 2 == 0, s"hex string must have even length: '$s'")
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }
}
