package graft.spark

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-granular readers for non-parquet data files (`file_format` AVRO /
  * ORC in the manifests — real Iceberg tables mix formats; the reference
  * decodes the enum, manifest.go:314-320, but can read nothing).
  *
  * Shape: each produces InternalRow in the requested read schema, columns
  * resolved BY NAME with the same historical-name candidates the id-less
  * parquet fallback uses (renamed columns keep resolving), missing columns
  * as null (schema evolution), and the synthetic row-index column filled
  * from a running per-file counter — non-parquet files are planned as ONE
  * split per file, so the counter IS the file row position and positional
  * deletes match exactly like they do on parquet.
  *
  * Scale: these are row-path readers (no vectorized decode) — correct
  * first; the scan stays distributed (one task per file) and mixed-format
  * tables only pay the row path for their non-parquet files. */
private[spark] trait RowFileReader {
  def nextKeyValue(): Boolean
  def getCurrentValue: InternalRow
  def close(): Unit
}

private[spark] final class ParquetRowFileReader(
    r: org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader)
    extends RowFileReader {
  override def nextKeyValue(): Boolean = r.nextKeyValue()
  override def getCurrentValue: InternalRow =
    r.getCurrentValue.asInstanceOf[InternalRow]
  override def close(): Unit = r.close()
}

private[spark] object FormatReaders {
  /** Resolution order for a field: current name, then historical names. */
  def candidates(f: StructField): Seq[String] =
    f.name +: (if (f.metadata.contains(SchemaConv.NameCandidatesKey))
      f.metadata.getStringArray(SchemaConv.NameCandidatesKey).toSeq else Nil)

  def rowReader(format: String, path: String,
                schema: StructType): RowFileReader =
    format.toUpperCase match {
      case "AVRO" => new AvroRowFileReader(path, schema)
      case "ORC" => new OrcRowFileReader(path, schema)
      case other => throw new UnsupportedOperationException(
        s"no row reader for format $other")
    }

  /** Library-scan DataFrame over non-parquet files: one RDD partition per
    * file, decoded executor-side through the row readers — with optional
    * `__path`/`__pos` provenance (whole-file partitions make the running
    * counter the true file row position, so MoR positional deletes apply
    * to ORC/Avro files exactly as to parquet). */
  def nonParquetDF(spark: org.apache.spark.sql.SparkSession, format: String,
                   paths: Seq[String], schema: StructType,
                   withProvenance: Boolean): org.apache.spark.sql.DataFrame = {
    val readSchema =
      if (withProvenance)
        schema.add(StructField(GraftReaders.RowIndexCol, LongType, nullable = true))
      else schema
    val outSchema =
      if (withProvenance)
        StructType(schema.fields :+ StructField("__path", StringType) :+
          StructField("__pos", LongType))
      else schema
    val n = schema.length
    val fmt = format
    val rdd = spark.sparkContext
      .parallelize(paths.toIndexedSeq, math.max(1, paths.size))
      .mapPartitions { it =>
        it.flatMap { path =>
          val normed = UTF8String.fromString(
            path.replaceFirst("^file:(//)?", ""))
          val reader = rowReader(fmt, path, readSchema)
          new Iterator[InternalRow] {
            private var advanced = false
            private var has = false
            override def hasNext: Boolean = {
              if (!advanced) {
                has = reader.nextKeyValue()
                if (!has) reader.close()
                advanced = true
              }
              has
            }
            override def next(): InternalRow = {
              if (!hasNext) throw new NoSuchElementException
              advanced = false
              val r = reader.getCurrentValue
              if (!withProvenance) r
              else {
                val values = new Array[Any](n + 2)
                var i = 0
                while (i < n) { values(i) = r.get(i, schema(i).dataType); i += 1 }
                values(n) = normed
                values(n + 1) = r.getLong(n) // reader-synthesized row index
                new GenericInternalRow(values)
              }
            }
          }
        }
      }
    org.apache.spark.sql.graft.ColumnShim.internalDF(spark, rdd, outSchema)
  }
}

/** Avro OCF decode via the avro-core reader (no spark-avro needed),
  * GenericRecord fields mapped to catalyst values. */
private[spark] final class AvroRowFileReader(path: String, schema: StructType)
    extends RowFileReader {
  import org.apache.avro.file.DataFileStream
  import org.apache.avro.generic.{GenericDatumReader, GenericRecord}

  private val hp = new Path(path)
  private val in = hp.getFileSystem(new Configuration()).open(hp)
  private val stream = new DataFileStream[GenericRecord](in,
    new GenericDatumReader[GenericRecord]())
  private val fileFields: Set[String] = {
    import scala.jdk.CollectionConverters._
    stream.getSchema.getFields.asScala.map(_.name).toSet
  }
  // per output field: the avro field name it reads (None → null column),
  // and whether a timestamp is millis-encoded (micros is the Iceberg
  // default)
  private val resolved: Array[Option[String]] = schema.fields.map { f =>
    if (f.name == GraftReaders.RowIndexCol) None
    else FormatReaders.candidates(f).find(fileFields.contains)
  }
  private val millisTs: Array[Boolean] = schema.fields.zip(resolved).map {
    case (_, Some(n)) =>
      val fs = stream.getSchema.getField(n).schema()
      val s = if (fs.getType == org.apache.avro.Schema.Type.UNION) {
        import scala.jdk.CollectionConverters._
        fs.getTypes.asScala.find(_.getType != org.apache.avro.Schema.Type.NULL)
          .getOrElse(fs)
      } else fs
      Option(s.getLogicalType).exists(_.getName == "timestamp-millis")
    case _ => false
  }
  private val rowIdxOrd = schema.fieldNames.indexOf(GraftReaders.RowIndexCol)

  private var rowIndex = -1L
  private var current: InternalRow = _

  private def convert(v: Any, dt: DataType, millis: Boolean): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => UTF8String.fromString(u.toString)
    case s: String => UTF8String.fromString(s)
    case b: java.nio.ByteBuffer =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case f: org.apache.avro.generic.GenericFixed => f.bytes().clone()
    case l: java.lang.Long if dt == TimestampType || dt == TimestampNTZType =>
      if (millis) l * 1000L else l.longValue()
    case n: java.lang.Number => dt match {
      case IntegerType | DateType => n.intValue()
      case LongType => n.longValue()
      case FloatType => n.floatValue()
      case DoubleType => n.doubleValue()
      case ShortType => n.shortValue()
      case ByteType => n.byteValue()
      case _ => throw new UnsupportedOperationException(
        s"avro value of ${n.getClass} for $dt in $path")
    }
    case b: java.lang.Boolean => b.booleanValue()
    case other => throw new UnsupportedOperationException(
      s"unsupported avro value ${other.getClass} in $path")
  }

  override def nextKeyValue(): Boolean = {
    if (!stream.hasNext) return false
    val rec = stream.next()
    rowIndex += 1
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      values(i) =
        if (i == rowIdxOrd) rowIndex
        else resolved(i) match {
          case Some(n) => convert(rec.get(n), schema(i).dataType, millisTs(i))
          case None => null
        }
      i += 1
    }
    current = new GenericInternalRow(values)
    true
  }
  override def getCurrentValue: InternalRow = current
  override def close(): Unit = stream.close()
}

/** ORC decode via orc-core's vectorized row batches (bundled with Spark),
  * surfaced row-by-row. */
private[spark] final class OrcRowFileReader(path: String, schema: StructType)
    extends RowFileReader {
  import org.apache.orc.OrcFile

  private val hp = new Path(path)
  private val reader = OrcFile.createReader(hp,
    OrcFile.readerOptions(new Configuration()))
  private val fileSchema = reader.getSchema
  private val fileNames: Seq[String] = {
    import scala.jdk.CollectionConverters._
    fileSchema.getFieldNames.asScala.toSeq
  }
  private val colOf: Array[Int] = schema.fields.map { f =>
    if (f.name == GraftReaders.RowIndexCol) -1
    else FormatReaders.candidates(f).collectFirst {
      case n if fileNames.contains(n) => fileNames.indexOf(n)
    }.getOrElse(-1)
  }
  private val rows = reader.rows()
  private val batch = fileSchema.createRowBatch(1024)
  private var inBatch = 0
  private var batchSize = 0
  private var rowIndex = -1L
  private var current: InternalRow = _

  private def value(col: Int, r: Int, dt: DataType): Any = {
    import org.apache.hadoop.hive.ql.exec.vector._
    val v = batch.cols(col)
    val idx = if (v.isRepeating) 0 else r
    if (!v.noNulls && v.isNull(idx)) return null
    v match {
      case lv: LongColumnVector => dt match {
        case BooleanType => lv.vector(idx) != 0L
        case IntegerType | DateType => lv.vector(idx).toInt
        case ShortType => lv.vector(idx).toShort
        case ByteType => lv.vector(idx).toByte
        case LongType => lv.vector(idx)
        case _ => throw new UnsupportedOperationException(
          s"orc long vector for $dt in $path")
      }
      case dv: DoubleColumnVector =>
        if (dt == FloatType) dv.vector(idx).toFloat else dv.vector(idx)
      case bv: BytesColumnVector =>
        val bytes = java.util.Arrays.copyOfRange(bv.vector(idx),
          bv.start(idx), bv.start(idx) + bv.length(idx))
        if (dt == BinaryType) bytes else UTF8String.fromBytes(bytes)
      case tv: TimestampColumnVector =>
        tv.time(idx) * 1000L + (tv.nanos(idx) / 1000L) % 1000L
      case other => throw new UnsupportedOperationException(
        s"unsupported orc vector ${other.getClass} for $dt in $path")
    }
  }

  override def nextKeyValue(): Boolean = {
    if (inBatch >= batchSize) {
      if (!rows.nextBatch(batch)) return false
      batchSize = batch.size
      inBatch = 0
      if (batchSize == 0) return false
    }
    rowIndex += 1
    val r = inBatch
    inBatch += 1
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      values(i) =
        if (colOf(i) < 0)
          (if (schema(i).name == GraftReaders.RowIndexCol) rowIndex else null)
        else value(colOf(i), r, schema(i).dataType)
      i += 1
    }
    current = new GenericInternalRow(values)
    true
  }
  override def getCurrentValue: InternalRow = current
  override def close(): Unit = { rows.close(); reader.close() }
}
