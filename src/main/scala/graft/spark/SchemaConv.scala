package graft.spark

import org.apache.spark.sql.types._

import graft.core._

/** Iceberg ↔ Spark schema mapping.
  *
  * Field IDs survive as `StructField.metadata` under `"iceberg.field-id"` —
  * the same convention Spark's own Parquet/Iceberg integrations use — so
  * stats lookup and schema evolution stay ID-based even though Spark resolves
  * by name. Types without a Spark analog degrade per SURVEY §1.2: `time` →
  * LongType(µs), `uuid` → StringType, `fixed[N]` → BinaryType, each tagged in
  * metadata. */
object SchemaConv {
  val FieldIdKey = "iceberg.field-id"
  val TypeTagKey = "iceberg.type"
  /** V3 column defaults, carried as (iceberg type repr, single-value JSON)
    * so executors re-materialize the literal with no driver round-trip. */
  val InitialDefaultKey = "graft.initial-default"
  val WriteDefaultKey = "graft.write-default"
  val DefaultTypeKey = "graft.default-type"

  def toSparkType(t: IcebergType): DataType = t match {
    case BooleanT => BooleanType
    case IntT => IntegerType
    case LongT => LongType
    case FloatT => FloatType
    case DoubleT => DoubleType
    case DateT => DateType
    case TimeT => LongType
    case TimestampT => TimestampNTZType
    case TimestampTzT => TimestampType
    case StringT => StringType
    case UuidT => StringType
    case BinaryT => BinaryType
    // V3 `unknown`: always-null placeholder — surfaces as a null column
    case UnknownT => NullType
    // V3 nanosecond timestamps: Spark has no ns timestamp — surface as
    // nanosecond-epoch longs (lossless, tagged in metadata) rather than a
    // silent µs truncation
    case TimestampNsT | TimestampTzNsT => LongType
    // V3 variant: Spark 4 has a native VariantType
    case VariantT => VariantType
    // V3 geo: values are WKB — surface the bytes (tagged); predicates on
    // geo columns are refused at bind time (Expressions)
    case _: GeometryT | _: GeographyT => BinaryType
    case FixedT(_) => BinaryType
    case DecimalT(p, s) => DecimalType(p, s)
    case s: StructT => toSparkStruct(s)
    case l: ListT => ArrayType(toSparkType(l.element), containsNull = !l.elementRequired)
    case m: MapT => MapType(toSparkType(m.key), toSparkType(m.value),
      valueContainsNull = !m.valueRequired)
  }

  def toSparkStruct(s: StructT): StructType =
    StructType(s.fields.map { f =>
      val mb = new MetadataBuilder().putLong(FieldIdKey, f.id.toLong)
      f.fieldType match {
        case TimeT | UuidT | FixedT(_) | TimestampNsT | TimestampTzNsT |
             _: GeometryT | _: GeographyT =>
          mb.putString(TypeTagKey, f.fieldType.repr)
        case _ =>
      }
      f.doc.foreach(d => mb.putString("comment", d))
      if (f.initialDefault.isDefined || f.writeDefault.isDefined)
        mb.putString(DefaultTypeKey, f.fieldType.repr)
      f.initialDefault.foreach(l =>
        mb.putString(InitialDefaultKey, SingleValueJson.toJsonString(l, f.fieldType)))
      f.writeDefault.foreach { l =>
        mb.putString(WriteDefaultKey, SingleValueJson.toJsonString(l, f.fieldType))
        // Spark's OWN column-default key: the analyzer's output resolver
        // fills omitted columns with this expression on INSERT/append —
        // so write-defaults engage on every Spark write surface (SQL
        // INSERT, DataFrame append) with zero custom resolution code
        mb.putString("CURRENT_DEFAULT", sqlLiteral(f.fieldType, l))
      }
      StructField(f.name, toSparkType(f.fieldType), nullable = !f.required,
        metadata = mb.build())
    })

  /** Decode a default carried on a StructField back to (type, literal). */
  private def fieldDefault(f: StructField, key: String)
      : Option[(IcebergType, Literal)] =
    if (!f.metadata.contains(key)) None
    else {
      val typ = IcebergTypeJson.parsePrimitive(f.metadata.getString(DefaultTypeKey))
      Some((typ, SingleValueJson.parseString(typ, f.metadata.getString(key))))
    }

  def initialDefaultOf(f: StructField): Option[(IcebergType, Literal)] =
    fieldDefault(f, InitialDefaultKey)
  def writeDefaultOf(f: StructField): Option[(IcebergType, Literal)] =
    fieldDefault(f, WriteDefaultKey)

  /** Catalyst internal value → Iceberg literal, typed by the target field
    * (the DDL path: `ADD COLUMN ... DEFAULT <literal>`). */
  def literalFromCatalyst(icType: IcebergType, value: Any): Literal =
    (icType, value) match {
      case (_, null) => throw new IllegalArgumentException(
        "NULL is not a storable column default (omit DEFAULT instead)")
      case (BooleanT, b: java.lang.Boolean) => BoolLit(b)
      case (IntT, i: java.lang.Integer) => IntLit(i)
      case (LongT, l: java.lang.Long) => LongLit(l)
      case (LongT, i: java.lang.Integer) => LongLit(i.longValue())
      case (FloatT, f: java.lang.Float) => FloatLit(f)
      case (DoubleT, d: java.lang.Double) => DoubleLit(d)
      case (StringT, s: org.apache.spark.unsafe.types.UTF8String) =>
        StrLit(s.toString)
      case (StringT, s: String) => StrLit(s)
      case (DateT, days: java.lang.Integer) => DateLit(days)
      case (TimeT, us: java.lang.Long) => TimeLit(us)
      case (TimestampT | TimestampTzT, us: java.lang.Long) => TsLit(us)
      case (DecimalT(_, sc), d: org.apache.spark.sql.types.Decimal) =>
        val bd = d.toJavaBigDecimal.setScale(sc)
        DecLit(BigInt(bd.unscaledValue()), sc)
      case (BinaryT, b: Array[Byte]) => BytesLit(b)
      case (FixedT(_), b: Array[Byte]) => FixedLit(b)
      case (UuidT, s: org.apache.spark.unsafe.types.UTF8String) =>
        UuidLit(java.util.UUID.fromString(s.toString))
      case (t, v) => throw new IllegalArgumentException(
        s"cannot use ${v.getClass.getName} as a ${t.repr} column default")
    }

  /** A default literal as Spark SQL expression text (the form Spark's
    * CURRENT_DEFAULT column metadata expects). */
  def sqlLiteral(typ: IcebergType, lit: Literal): String = lit match {
    case BoolLit(v) => v.toString
    case IntLit(v) => v.toString
    case LongLit(v) => s"CAST($v AS BIGINT)"
    case FloatLit(v) => s"CAST('$v' AS FLOAT)"
    case DoubleLit(v) => s"CAST('$v' AS DOUBLE)"
    case d: DecLit =>
      val DecimalT(p, s) = typ: @unchecked
      s"CAST('${d.bigDecimal.toPlainString}' AS DECIMAL($p, $s))"
    case StrLit(v) =>
      // Spark's default SQL parser treats backslash as an escape inside
      // string literals (and the escapedStringLiterals conf flips that),
      // so only SIMPLE strings render as readable quoted literals; any
      // string with a backslash, quote, or control char goes through the
      // dialect-proof unhex form — both are foldable, which is all
      // CURRENT_DEFAULT requires
      if (v.forall(c => c >= ' ' && c != '\\' && c != '\'')) s"'$v'"
      else {
        val hex = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .map(b => f"${b & 0xff}%02X").mkString
        s"decode(unhex('$hex'), 'UTF-8')"
      }
    case DateLit(days) =>
      s"DATE '${java.time.LocalDate.ofEpochDay(days.toLong)}'"
    case TimeLit(us) => s"CAST($us AS BIGINT)"
    case TsLit(us) =>
      val inst = java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
      val ldt = java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC)
      typ match {
        case TimestampTzT => s"TIMESTAMP '${ldt.toString.replace('T', ' ')} UTC'"
        case _ => s"TIMESTAMP_NTZ '${ldt.toString.replace('T', ' ')}'"
      }
    case UuidLit(v) => s"'$v'"
    case BytesLit(v) => s"X'${v.map(b => f"${b & 0xff}%02X").mkString}'"
    case FixedLit(v) => s"X'${v.map(b => f"${b & 0xff}%02X").mkString}'"
    case s: RangeSentinel =>
      throw new IllegalArgumentException(s"not a storable default: $s")
  }

  /** A default literal as a Spark Column (driver-side fill paths). */
  def literalColumn(typ: IcebergType, lit: Literal)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit => slit}
    val base: org.apache.spark.sql.Column = lit match {
      case BoolLit(v) => slit(v)
      case IntLit(v) => slit(v)
      case LongLit(v) => slit(v)
      case FloatLit(v) => slit(v)
      case DoubleLit(v) => slit(v)
      case StrLit(v) => slit(v)
      case d: DecLit => slit(d.bigDecimal)
      case DateLit(days) => slit(java.time.LocalDate.ofEpochDay(days.toLong))
      case TimeLit(us) => slit(us)
      case TsLit(us) =>
        val inst = java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
        typ match {
          case TimestampTzT => slit(inst)
          case _ => slit(java.time.LocalDateTime.ofInstant(inst,
            java.time.ZoneOffset.UTC))
        }
      case UuidLit(v) => slit(v.toString)
      case BytesLit(v) => slit(v)
      case FixedLit(v) => slit(v)
      case s: RangeSentinel =>
        throw new IllegalArgumentException(s"not a storable default: $s")
    }
    base.cast(toSparkType(typ))
  }

  /** A default literal as a catalyst internal value (executor-side reader
    * projections: UTF8String for strings, Decimal for decimals, micros for
    * timestamps — the representations `InternalRow` carries). */
  def catalystDefault(typ: IcebergType, lit: Literal): Any = lit match {
    case BoolLit(v) => v
    case IntLit(v) => v
    case LongLit(v) => v
    case FloatLit(v) => v
    case DoubleLit(v) => v
    case StrLit(v) => org.apache.spark.unsafe.types.UTF8String.fromString(v)
    case d: DecLit =>
      org.apache.spark.sql.types.Decimal(BigDecimal(d.bigDecimal))
    case DateLit(days) => days
    case TimeLit(us) => us
    case TsLit(us) => us
    case UuidLit(v) => org.apache.spark.unsafe.types.UTF8String.fromString(v.toString)
    case BytesLit(v) => v
    case FixedLit(v) => v
    case s: RangeSentinel =>
      throw new IllegalArgumentException(s"not a storable default: $s")
  }

  def toSparkSchema(schema: Schema): StructType = toSparkStruct(schema.struct)

  /** Re-key the Iceberg field-id metadata under Spark's `parquet.field.id`
    * key, so parquet readers clip file schemas BY ID — files written before
    * a column rename still resolve to the right column. Recurses into
    * nested structs (Spark's reader id-matches at every nesting level), so
    * NESTED renames resolve old files by id too. */
  def parquetIdAnnotated(s: StructType): StructType =
    StructType(s.fields.map { f =>
      val dt = f.dataType match {
        case st: StructType => parquetIdAnnotated(st)
        case other => other
      }
      if (f.metadata.contains(FieldIdKey))
        f.copy(dataType = dt,
          metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putLong(GraftCowWriterFactory.ParquetFieldIdKey,
              f.metadata.getLong(FieldIdKey))
            .build())
      else f.copy(dataType = dt)
    })

  /** Metadata key carrying every historical name a field id has had
    * (newest first, current name excluded) — the read-time name-mapping
    * fallback for data files written WITHOUT parquet field ids (other
    * engines, or this table before id-stamped writes): such a file can
    * only be resolved by name, and a column renamed since the file was
    * written only matches under the name the file was written with.
    * Same idea as Iceberg's `schema.name-mapping.default`, derived here
    * from the table's own schema history. */
  val NameCandidatesKey = "graft.name-candidates"

  /** Iceberg's standard name-mapping property: tables written by OTHER
    * engines carry their id→names mapping here, and it takes precedence
    * over this table's own schema-log history for id-less file
    * resolution (interop: the foreign engine knows what names its files
    * used). Top-level fields; malformed JSON fails loudly. */
  val NameMappingProp = "schema.name-mapping.default"

  /** Parse `schema.name-mapping.default` → field id → names (mapping
    * order preserved). Empty when the property is absent. */
  def nameMappingOf(properties: Map[String, String]): Map[Int, Seq[String]] =
    properties.get(NameMappingProp).map { json =>
      import scala.jdk.CollectionConverters._
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      require(root.isArray, s"$NameMappingProp must be a JSON array")
      root.asScala.flatMap { n =>
        for {
          id <- Option(n.get("field-id")).filter(_.isIntegralNumber)
          names <- Option(n.get("names")).filter(_.isArray)
        } yield id.asInt -> names.asScala.map(_.asText).toSeq
      }.toMap
    }.getOrElse(Map.empty)

  /** Stamp name-resolution candidates onto each id-carrying field: the
    * table's `schema.name-mapping.default` names first (when the property
    * exists — interop with tables written by other engines), then the
    * historical names from this table's own schema log. Applied to reader
    * schemas at plan time so the per-file fallback runs executor-side
    * with no driver lookups. */
  def withNameCandidates(s: StructType, historicalSchemas: Seq[Schema],
                         nameMapping: Map[Int, Seq[String]] = Map.empty)
      : StructType =
    StructType(s.fields.map { f =>
      if (!f.metadata.contains(FieldIdKey)) f
      else {
        val id = f.metadata.getLong(FieldIdKey).toInt
        val mapped = nameMapping.getOrElse(id, Nil)
        val hist = historicalSchemas.reverse
          .flatMap(_.findFieldById(id).map(_.name))
        val candidates = (mapped ++ hist).distinct.filterNot(_ == f.name)
        if (candidates.isEmpty) f
        else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putStringArray(NameCandidatesKey, candidates.toArray).build())
      }
    })

  /** Requested schema for a data file that carries NO parquet field ids:
    * id matching is impossible (Spark's ignoreMissing semantics are
    * silent-NULL, not name fallback), so resolve by name — substituting a
    * historical name when the current one is absent from the file's footer.
    * Field POSITIONS are unchanged, so downstream ordinal-based projections
    * stay valid; `parquet.field.id` is stripped so the reader never tries
    * id matching against this file.
    *
    * Known bound: the historical-name substitution is TOP-LEVEL only. A
    * NESTED field renamed after a foreign id-less file was written reads
    * as null from that file (files written by this engine always carry
    * ids at every level, so they resolve nested renames by id). */
  def nameFallbackSchema(s: StructType, footerNames: Set[String]): StructType =
    StructType(s.fields.map { f =>
      val name =
        if (footerNames.contains(f.name)) f.name
        else if (f.metadata.contains(NameCandidatesKey))
          f.metadata.getStringArray(NameCandidatesKey)
            .find(footerNames.contains).getOrElse(f.name)
        else f.name
      val mb = new MetadataBuilder().withMetadata(f.metadata)
      mb.remove(GraftCowWriterFactory.ParquetFieldIdKey)
      f.copy(name = name, metadata = mb.build())
    })

  /** Spark → Iceberg for a single PRIMITIVE type (mergeSchema column adds —
    * nested types need coordinated nested-field ids, so they are declined
    * here and the caller reports a clear error). */
  def primitiveFromSpark(dt: DataType): Option[IcebergType] = dt match {
    case BooleanType => Some(BooleanT)
    case ByteType | ShortType | IntegerType => Some(IntT)
    case LongType => Some(LongT)
    case FloatType => Some(FloatT)
    case DoubleType => Some(DoubleT)
    case DateType => Some(DateT)
    case TimestampNTZType => Some(TimestampT)
    case TimestampType => Some(TimestampTzT)
    case StringType => Some(StringT)
    case BinaryType => Some(BinaryT)
    case VariantType => Some(VariantT)
    case d: DecimalType => Some(DecimalT(d.precision, d.scale))
    case _ => None
  }

  /** Spark → Iceberg, assigning fresh sequential field IDs (for table
    * creation from a DataFrame). */
  def fromSparkSchema(st: StructType): Schema = {
    var nextId = 0
    def alloc(): Int = { nextId += 1; nextId }
    def convType(dt: DataType): IcebergType = dt match {
      case BooleanType => BooleanT
      case ByteType | ShortType | IntegerType => IntT
      case LongType => LongT
      case FloatType => FloatT
      case DoubleType => DoubleT
      case DateType => DateT
      case TimestampNTZType => TimestampT
      case TimestampType => TimestampTzT
      case StringType => StringT
      case BinaryType => BinaryT
      case VariantType => VariantT
      case d: DecimalType => DecimalT(d.precision, d.scale)
      case a: ArrayType =>
        val id = alloc()
        ListT(id, convType(a.elementType), elementRequired = !a.containsNull)
      case m: MapType =>
        val kid = alloc(); val vid = alloc()
        MapT(kid, convType(m.keyType), vid, convType(m.valueType),
          valueRequired = !m.valueContainsNull)
      case s: StructType => StructT(convFields(s))
      case other => throw new IllegalArgumentException(s"unsupported Spark type: $other")
    }
    def convFields(s: StructType): Seq[NestedField] =
      s.fields.toSeq.map { f =>
        val id = alloc()
        NestedField(id, f.name, convType(f.dataType), required = !f.nullable)
      }
    // two passes would misnumber; the single pass above allocates parent
    // field ids before child ids, matching Iceberg's fresh-assignment order
    Schema(0, StructT(convFields(st)))
  }
}
