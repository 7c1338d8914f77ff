package graft.core

import java.io.{File, InputStream}
import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

/** Manifest-list and manifest Avro OCF decode/encode.
  *
  * Capability parity with `manifest.go:210-296` (read list + entries, V1/V2
  * dispatch on the `format-version` OCF metadata key, DELETED-entry filter,
  * V2 sequence-number inheritance manifest.go:481-495) — plus the writer the
  * reference lacks, so tables can be committed, not just read.
  */
final case class FieldSummary(
    containsNull: Boolean,
    containsNaN: Option[Boolean],
    lowerBound: Option[Array[Byte]],
    upperBound: Option[Array[Byte]])

final case class ManifestFile(
    path: String,
    length: Long,
    partitionSpecId: Int,
    content: Int, // 0=data, 1=deletes
    sequenceNumber: Long,
    minSequenceNumber: Long,
    addedSnapshotId: Long,
    addedFilesCount: Int,
    existingFilesCount: Int,
    deletedFilesCount: Int,
    addedRowsCount: Long,
    existingRowsCount: Long,
    deletedRowsCount: Long,
    partitions: Seq[FieldSummary],
    formatVersion: Int,
    // V3 row lineage: the first _row_id available to this manifest's added
    // data files (manifest_file field 520); absent below V3
    firstRowId: Option[Long] = None) {
  def hasAddedFiles: Boolean = addedFilesCount > 0
  def hasExistingFiles: Boolean = existingFilesCount > 0
}

object DataFileContent {
  val Data = 0
  val PositionDeletes = 1
  val EqualityDeletes = 2
}

final case class DataFileInfo(
    content: Int,
    path: String,
    format: String,
    partition: Map[String, Any],
    recordCount: Long,
    fileSizeInBytes: Long,
    columnSizes: Map[Int, Long],
    valueCounts: Map[Int, Long],
    nullValueCounts: Map[Int, Long],
    nanValueCounts: Map[Int, Long],
    lowerBounds: Map[Int, Array[Byte]],
    upperBounds: Map[Int, Array[Byte]],
    splitOffsets: Seq[Long],
    equalityIds: Seq[Int],
    sortOrderId: Option[Int],
    // V3 deletion-vector coordinates (spec fields 143/144/145): the data
    // file this DV applies to, and the blob's byte range inside the Puffin
    // container. Absent on data files and V2 delete files.
    referencedDataFile: Option[String] = None,
    contentOffset: Option[Long] = None,
    contentSizeInBytes: Option[Long] = None,
    // V3 row lineage: first _row_id of this data file (data_file field
    // 142); rows get firstRowId + position. Null in a manifest inherits
    // from the manifest's firstRowId at read time.
    firstRowId: Option[Long] = None) {
  def stats: FileStats = FileStats(recordCount, valueCounts, nullValueCounts,
    nanValueCounts, lowerBounds, upperBounds)

  /** True when this delete entry is a V3 deletion vector (Puffin blob). */
  def isDeletionVector: Boolean =
    format.equalsIgnoreCase("PUFFIN") && referencedDataFile.isDefined &&
      contentOffset.isDefined && contentSizeInBytes.isDefined
}

object ManifestEntryStatus {
  val Existing = 0
  val Added = 1
  val Deleted = 2
}

final case class ManifestEntry(
    status: Int,
    snapshotId: Option[Long],
    sequenceNumber: Option[Long],
    fileSequenceNumber: Option[Long],
    dataFile: DataFileInfo) {

  /** V2 inheritance (manifest.go:481-495): missing snapshot comes from the
    * manifest; missing sequence numbers inherit when the manifest seq is 0
    * (first commit) or the entry is ADDED. */
  def inheritSeqNum(m: ManifestFile): ManifestEntry = {
    var e = this
    if (e.snapshotId.isEmpty) e = e.copy(snapshotId = Some(m.addedSnapshotId))
    val canInherit = m.sequenceNumber == 0 || status == ManifestEntryStatus.Added
    if (e.sequenceNumber.isEmpty && canInherit)
      e = e.copy(sequenceNumber = Some(m.sequenceNumber))
    if (e.fileSequenceNumber.isEmpty && canInherit)
      e = e.copy(fileSequenceNumber = Some(m.sequenceNumber))
    e
  }
}

object ManifestIO {

  /** Diagnostic: manifest-entry file reads in this JVM (specs bound the
    * metadata work of commit paths with it). */
  val entryReads = new java.util.concurrent.atomic.AtomicLong()

  // ---------------------------------------------------------------- reading

  def readManifestList(in: InputStream): Seq[ManifestFile] = {
    val reader = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try {
      val version = Option(reader.getMetaString("format-version"))
        .map(_.toInt).getOrElse(1)
      val out = Vector.newBuilder[ManifestFile]
      while (reader.hasNext) out += parseManifestFile(reader.next(), version)
      out.result()
    } finally reader.close()
  }

  def readManifestEntries(in: InputStream, manifest: ManifestFile,
                          discardDeleted: Boolean = true): Seq[ManifestEntry] = {
    entryReads.incrementAndGet()
    val reader = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try {
      val out = Vector.newBuilder[ManifestEntry]
      // V3 row-lineage inheritance: a data file with null first_row_id is
      // assigned the manifest's first_row_id plus the record counts of
      // preceding null-first_row_id data files (spec inheritance rule) —
      // accumulated over EVERY entry read, before any deleted-entry
      // filtering, so skipped entries still consume their id range
      var inheritAcc = 0L
      while (reader.hasNext) {
        var e = parseEntry(reader.next())
        if (manifest.firstRowId.isDefined &&
            e.dataFile.content == DataFileContent.Data &&
            e.dataFile.firstRowId.isEmpty) {
          e = e.copy(dataFile = e.dataFile.copy(
            firstRowId = Some(manifest.firstRowId.get + inheritAcc)))
          inheritAcc += e.dataFile.recordCount
        }
        if (!discardDeleted || e.status != ManifestEntryStatus.Deleted)
          out += e.inheritSeqNum(manifest)
      }
      out.result()
    } finally reader.close()
  }

  private def str(r: GenericRecord, f: String): String =
    Option(field(r, f)).map(_.toString).getOrElse("")
  private def field(r: GenericRecord, f: String): Any =
    if (r.getSchema.getField(f) != null) r.get(f) else null
  private def asLong(v: Any, dflt: Long = 0L): Long = v match {
    case null => dflt
    case n: java.lang.Number => n.longValue()
  }
  private def asInt(v: Any, dflt: Int = 0): Int = v match {
    case null => dflt
    case n: java.lang.Number => n.intValue()
  }
  private def optLong(v: Any): Option[Long] = v match {
    case null => None
    case n: java.lang.Number => Some(n.longValue())
  }
  private def bytes(v: Any): Array[Byte] = v match {
    case null => null
    case bb: ByteBuffer =>
      val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
    case arr: Array[Byte] => arr
    case f: GenericData.Fixed => f.bytes()
  }

  private def parseManifestFile(r: GenericRecord, version: Int): ManifestFile = {
    val partitions: Seq[FieldSummary] = field(r, "partitions") match {
      case null => Nil
      case arr: java.util.Collection[_] =>
        arr.asScala.toSeq.map { case s: GenericRecord =>
          FieldSummary(
            containsNull = field(s, "contains_null").asInstanceOf[Boolean],
            containsNaN = Option(field(s, "contains_nan")).map(_.asInstanceOf[Boolean]),
            lowerBound = Option(bytes(field(s, "lower_bound"))),
            upperBound = Option(bytes(field(s, "upper_bound"))))
        }
      case _ => Nil
    }
    // V1 uses *_data_files_count names; V2 *_files_count
    def count(v2Name: String, v1Name: String): Int = {
      val v = field(r, v2Name)
      if (v != null) asInt(v) else asInt(field(r, v1Name))
    }
    ManifestFile(
      path = str(r, "manifest_path"),
      length = asLong(field(r, "manifest_length")),
      partitionSpecId = asInt(field(r, "partition_spec_id")),
      content = asInt(field(r, "content")),
      sequenceNumber = asLong(field(r, "sequence_number")),
      minSequenceNumber = asLong(field(r, "min_sequence_number")),
      addedSnapshotId = asLong(field(r, "added_snapshot_id")),
      addedFilesCount = count("added_files_count", "added_data_files_count"),
      existingFilesCount = count("existing_files_count", "existing_data_files_count"),
      deletedFilesCount = count("deleted_files_count", "deleted_data_files_count"),
      addedRowsCount = asLong(field(r, "added_rows_count")),
      existingRowsCount = asLong(field(r, "existing_rows_count")),
      deletedRowsCount = asLong(field(r, "deleted_rows_count")),
      partitions = partitions,
      formatVersion = version,
      firstRowId = optLong(field(r, "first_row_id")))
  }

  private def longMap(v: Any): Map[Int, Long] = v match {
    case null => Map.empty
    case arr: java.util.Collection[_] =>
      arr.asScala.map { case kv: GenericRecord =>
        asInt(kv.get("key")) -> asLong(kv.get("value"))
      }.toMap
    case _ => Map.empty
  }

  private def bytesMap(v: Any): Map[Int, Array[Byte]] = v match {
    case null => Map.empty
    case arr: java.util.Collection[_] =>
      arr.asScala.map { case kv: GenericRecord =>
        asInt(kv.get("key")) -> bytes(kv.get("value"))
      }.toMap
    case _ => Map.empty
  }

  private def parseEntry(r: GenericRecord): ManifestEntry = {
    val df = r.get("data_file").asInstanceOf[GenericRecord]
    val partition: Map[String, Any] = field(df, "partition") match {
      case p: GenericRecord =>
        p.getSchema.getFields.asScala.map { f =>
          f.name() -> (p.get(f.name()) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case bb: ByteBuffer => bytes(bb)
            case other => other
          })
        }.toMap
      case _ => Map.empty
    }
    val info = DataFileInfo(
      content = asInt(field(df, "content")),
      path = str(df, "file_path"),
      format = str(df, "file_format"),
      partition = partition,
      recordCount = asLong(field(df, "record_count")),
      fileSizeInBytes = asLong(field(df, "file_size_in_bytes")),
      columnSizes = longMap(field(df, "column_sizes")),
      valueCounts = longMap(field(df, "value_counts")),
      nullValueCounts = longMap(field(df, "null_value_counts")),
      nanValueCounts = longMap(field(df, "nan_value_counts")),
      lowerBounds = bytesMap(field(df, "lower_bounds")),
      upperBounds = bytesMap(field(df, "upper_bounds")),
      splitOffsets = field(df, "split_offsets") match {
        case null => Nil
        case arr: java.util.Collection[_] => arr.asScala.toSeq.map(v => asLong(v))
        case _ => Nil
      },
      equalityIds = field(df, "equality_ids") match {
        case null => Nil
        case arr: java.util.Collection[_] => arr.asScala.toSeq.map(v => asInt(v))
        case _ => Nil
      },
      sortOrderId = Option(field(df, "sort_order_id")).map(v => asInt(v)),
      referencedDataFile = Option(field(df, "referenced_data_file")).map(_.toString),
      contentOffset = optLong(field(df, "content_offset")),
      contentSizeInBytes = optLong(field(df, "content_size_in_bytes")),
      firstRowId = optLong(field(df, "first_row_id")))
    ManifestEntry(
      status = asInt(field(r, "status")),
      snapshotId = optLong(field(r, "snapshot_id")),
      sequenceNumber = optLong(field(r, "sequence_number")),
      fileSequenceNumber = optLong(field(r, "file_sequence_number")),
      dataFile = info)
  }

  // ---------------------------------------------------------------- writing

  /** Avro schema of a partition tuple for the given partition struct type. */
  private def partitionAvroSchema(pt: StructT): AvroSchema = {
    var fields = SchemaBuilder.record("r102").fields()
    pt.fields.foreach { f =>
      val base = f.fieldType match {
        case IntT | DateT => AvroSchema.create(AvroSchema.Type.INT)
        case LongT | TimeT | TimestampT | TimestampTzT => AvroSchema.create(AvroSchema.Type.LONG)
        case FloatT => AvroSchema.create(AvroSchema.Type.FLOAT)
        case DoubleT => AvroSchema.create(AvroSchema.Type.DOUBLE)
        case BooleanT => AvroSchema.create(AvroSchema.Type.BOOLEAN)
        case StringT => AvroSchema.create(AvroSchema.Type.STRING)
        case _ => AvroSchema.create(AvroSchema.Type.BYTES)
      }
      val nullable = AvroSchema.createUnion(
        AvroSchema.create(AvroSchema.Type.NULL), base)
      fields = fields.name(f.name).`type`(nullable).withDefault(null)
    }
    fields.endRecord()
  }

  private def kvArraySchema(name: String, valueType: AvroSchema.Type): AvroSchema = {
    val kv = SchemaBuilder.record(name).fields()
      .requiredInt("key")
      .name("value").`type`(AvroSchema.create(valueType)).noDefault()
      .endRecord()
    AvroSchema.createArray(kv)
  }

  private def nullable(s: AvroSchema): AvroSchema =
    AvroSchema.createUnion(AvroSchema.create(AvroSchema.Type.NULL), s)

  /** V2 manifest entry schema for a given partition type. */
  def manifestEntrySchema(pt: StructT): AvroSchema = {
    val longKv = kvArraySchema("k_v_long", AvroSchema.Type.LONG)
    val longKv2 = kvArraySchema("k_v_long2", AvroSchema.Type.LONG)
    val longKv3 = kvArraySchema("k_v_long3", AvroSchema.Type.LONG)
    val bytesKv = kvArraySchema("k_v_bytes", AvroSchema.Type.BYTES)
    val bytesKv2 = kvArraySchema("k_v_bytes2", AvroSchema.Type.BYTES)
    val dataFile = SchemaBuilder.record("r2").fields()
      .requiredInt("content")
      .requiredString("file_path")
      .requiredString("file_format")
      .name("partition").`type`(partitionAvroSchema(pt)).noDefault()
      .requiredLong("record_count")
      .requiredLong("file_size_in_bytes")
      .name("column_sizes").`type`(nullable(longKv)).withDefault(null)
      .name("value_counts").`type`(nullable(longKv2)).withDefault(null)
      .name("null_value_counts").`type`(nullable(longKv3)).withDefault(null)
      .name("nan_value_counts").`type`(nullable(
        kvArraySchema("k_v_long4", AvroSchema.Type.LONG))).withDefault(null)
      .name("lower_bounds").`type`(nullable(bytesKv)).withDefault(null)
      .name("upper_bounds").`type`(nullable(bytesKv2)).withDefault(null)
      .name("split_offsets").`type`(nullable(
        AvroSchema.createArray(AvroSchema.create(AvroSchema.Type.LONG)))).withDefault(null)
      .name("equality_ids").`type`(nullable(
        AvroSchema.createArray(AvroSchema.create(AvroSchema.Type.INT)))).withDefault(null)
      .name("sort_order_id").`type`(nullable(
        AvroSchema.create(AvroSchema.Type.INT))).withDefault(null)
      // V3 deletion-vector coordinates (spec fields 143/144/145); null for
      // data files and V2 delete files, so V2 manifests stay byte-compatible
      .name("referenced_data_file").`type`(nullable(
        AvroSchema.create(AvroSchema.Type.STRING))).withDefault(null)
      .name("content_offset").`type`(nullable(
        AvroSchema.create(AvroSchema.Type.LONG))).withDefault(null)
      .name("content_size_in_bytes").`type`(nullable(
        AvroSchema.create(AvroSchema.Type.LONG))).withDefault(null)
      // V3 row lineage (spec field 142)
      .name("first_row_id").`type`(nullable(
        AvroSchema.create(AvroSchema.Type.LONG))).withDefault(null)
      .endRecord()
    SchemaBuilder.record("manifest_entry").fields()
      .requiredInt("status")
      .name("snapshot_id").`type`(nullable(AvroSchema.create(AvroSchema.Type.LONG))).withDefault(null)
      .name("sequence_number").`type`(nullable(AvroSchema.create(AvroSchema.Type.LONG))).withDefault(null)
      .name("file_sequence_number").`type`(nullable(AvroSchema.create(AvroSchema.Type.LONG))).withDefault(null)
      .name("data_file").`type`(dataFile).noDefault()
      .endRecord()
  }

  /** V2 manifest-list entry schema. */
  val manifestFileSchema: AvroSchema = {
    val summary = SchemaBuilder.record("r508").fields()
      .requiredBoolean("contains_null")
      .name("contains_nan").`type`(nullable(AvroSchema.create(AvroSchema.Type.BOOLEAN))).withDefault(null)
      .name("lower_bound").`type`(nullable(AvroSchema.create(AvroSchema.Type.BYTES))).withDefault(null)
      .name("upper_bound").`type`(nullable(AvroSchema.create(AvroSchema.Type.BYTES))).withDefault(null)
      .endRecord()
    SchemaBuilder.record("manifest_file").fields()
      .requiredString("manifest_path")
      .requiredLong("manifest_length")
      .requiredInt("partition_spec_id")
      .requiredInt("content")
      .requiredLong("sequence_number")
      .requiredLong("min_sequence_number")
      .requiredLong("added_snapshot_id")
      .requiredInt("added_files_count")
      .requiredInt("existing_files_count")
      .requiredInt("deleted_files_count")
      .requiredLong("added_rows_count")
      .requiredLong("existing_rows_count")
      .requiredLong("deleted_rows_count")
      .name("partitions").`type`(nullable(AvroSchema.createArray(summary))).withDefault(null)
      // V3 row lineage (spec field 520)
      .name("first_row_id").`type`(nullable(
        AvroSchema.create(AvroSchema.Type.LONG))).withDefault(null)
      .endRecord()
  }

  def writeManifestList(file: File, manifests: Seq[ManifestFile]): Unit = {
    val schema = manifestFileSchema
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    writer.setCodec(CodecFactory.deflateCodec(1))
    writer.setMeta("format-version", "2")
    writer.create(schema, file)
    try manifests.foreach { m =>
      val r = new GenericData.Record(schema)
      r.put("manifest_path", m.path)
      r.put("manifest_length", m.length)
      r.put("partition_spec_id", m.partitionSpecId)
      r.put("content", m.content)
      r.put("sequence_number", m.sequenceNumber)
      r.put("min_sequence_number", m.minSequenceNumber)
      r.put("added_snapshot_id", m.addedSnapshotId)
      r.put("added_files_count", m.addedFilesCount)
      r.put("existing_files_count", m.existingFilesCount)
      r.put("deleted_files_count", m.deletedFilesCount)
      r.put("added_rows_count", m.addedRowsCount)
      r.put("existing_rows_count", m.existingRowsCount)
      r.put("deleted_rows_count", m.deletedRowsCount)
      if (m.partitions.nonEmpty) {
        val summarySchema = schema.getField("partitions").schema().getTypes.get(1)
        val arr = new java.util.ArrayList[GenericRecord]()
        m.partitions.foreach { s =>
          val sr = new GenericData.Record(summarySchema.getElementType)
          sr.put("contains_null", s.containsNull)
          s.containsNaN.foreach(v => sr.put("contains_nan", v))
          s.lowerBound.foreach(b => sr.put("lower_bound", ByteBuffer.wrap(b)))
          s.upperBound.foreach(b => sr.put("upper_bound", ByteBuffer.wrap(b)))
          arr.add(sr)
        }
        r.put("partitions", arr)
      }
      m.firstRowId.foreach(v => r.put("first_row_id", v))
      writer.append(r)
    } finally writer.close()
  }

  def writeManifest(file: File, entries: Seq[ManifestEntry], pt: StructT): Unit = {
    val schema = manifestEntrySchema(pt)
    val dfSchema = schema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    writer.setCodec(CodecFactory.deflateCodec(1))
    writer.setMeta("format-version", "2")
    writer.create(schema, file)

    def kvArr(fieldName: String, m: Map[Int, Long]): java.util.List[GenericRecord] = {
      val elem = dfSchema.getField(fieldName).schema().getTypes.get(1).getElementType
      val out = new java.util.ArrayList[GenericRecord]()
      m.toSeq.sortBy(_._1).foreach { case (k, v) =>
        val r = new GenericData.Record(elem); r.put("key", k); r.put("value", v); out.add(r)
      }
      out
    }
    def kvBytesArr(fieldName: String, m: Map[Int, Array[Byte]]): java.util.List[GenericRecord] = {
      val elem = dfSchema.getField(fieldName).schema().getTypes.get(1).getElementType
      val out = new java.util.ArrayList[GenericRecord]()
      m.toSeq.sortBy(_._1).foreach { case (k, v) =>
        val r = new GenericData.Record(elem)
        r.put("key", k); r.put("value", ByteBuffer.wrap(v)); out.add(r)
      }
      out
    }

    try entries.foreach { e =>
      val df = e.dataFile
      val dfr = new GenericData.Record(dfSchema)
      dfr.put("content", df.content)
      dfr.put("file_path", df.path)
      dfr.put("file_format", df.format)
      val pr = new GenericData.Record(partSchema)
      df.partition.foreach { case (k, v) =>
        if (partSchema.getField(k) != null) pr.put(k, v match {
          case b: Array[Byte] => ByteBuffer.wrap(b)
          case other => other
        })
      }
      dfr.put("partition", pr)
      dfr.put("record_count", df.recordCount)
      dfr.put("file_size_in_bytes", df.fileSizeInBytes)
      if (df.columnSizes.nonEmpty) dfr.put("column_sizes", kvArr("column_sizes", df.columnSizes))
      if (df.valueCounts.nonEmpty) dfr.put("value_counts", kvArr("value_counts", df.valueCounts))
      if (df.nullValueCounts.nonEmpty)
        dfr.put("null_value_counts", kvArr("null_value_counts", df.nullValueCounts))
      if (df.nanValueCounts.nonEmpty)
        dfr.put("nan_value_counts", kvArr("nan_value_counts", df.nanValueCounts))
      if (df.lowerBounds.nonEmpty) dfr.put("lower_bounds", kvBytesArr("lower_bounds", df.lowerBounds))
      if (df.upperBounds.nonEmpty) dfr.put("upper_bounds", kvBytesArr("upper_bounds", df.upperBounds))
      if (df.splitOffsets.nonEmpty)
        dfr.put("split_offsets", df.splitOffsets.map(java.lang.Long.valueOf).asJava)
      if (df.equalityIds.nonEmpty)
        dfr.put("equality_ids", df.equalityIds.map(java.lang.Integer.valueOf).asJava)
      df.sortOrderId.foreach(id => dfr.put("sort_order_id", id))
      df.referencedDataFile.foreach(p => dfr.put("referenced_data_file", p))
      df.contentOffset.foreach(o => dfr.put("content_offset", o))
      df.contentSizeInBytes.foreach(s => dfr.put("content_size_in_bytes", s))
      df.firstRowId.foreach(v => dfr.put("first_row_id", v))
      val r = new GenericData.Record(schema)
      r.put("status", e.status)
      e.snapshotId.foreach(v => r.put("snapshot_id", v))
      e.sequenceNumber.foreach(v => r.put("sequence_number", v))
      e.fileSequenceNumber.foreach(v => r.put("file_sequence_number", v))
      r.put("data_file", dfr)
      writer.append(r)
    } finally writer.close()
  }
}
