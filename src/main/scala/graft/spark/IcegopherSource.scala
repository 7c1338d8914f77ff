package graft.spark

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StructType, _}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{AlwaysTrue, And => CoreAnd, BooleanExpression, Expr, FileScanTask}

/** DataSource V2 surface: `spark.read.format("icegopher").load(tableDir)`.
  *
  * The architecture SURVEY §3.2 prescribes: Catalyst's
  * `V2ScanRelationPushDown` drives our ScanBuilder — pushed filters reach the
  * core planner for manifest/stats pruning (SupportsPushDownFilters), column
  * pruning reaches the parquet reader (SupportsPushDownRequiredColumns),
  * limits short-circuit (SupportsPushDownLimit), and planned-file stats feed
  * the CBO/broadcast decisions (SupportsReportStatistics).
  *
  * Every pushed filter is ALSO returned as residual, so Spark re-applies it
  * row-wise — pruning is inclusive (skip-only) and can never change results.
  *
  * Row decode here uses a row-at-a-time parquet reader, fine for metadata-
  * sized reads; the high-throughput path is `IcebergTable.toDF`, which feeds
  * the same pruned file set to Spark's vectorized reader. Time travel:
  * `.option("snapshot-id", …)` / `.option("branch", …)` /
  * `.option("as-of-timestamp-ms", …)`.
  */
class IcegopherSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "icegopher"

  private def loadTable(options: CaseInsensitiveStringMap): IcebergTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("icegopher source requires a path"))
    IcebergTables.load(path)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SchemaConv.toSparkSchema(loadTable(options).schema)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftSparkTable(IcebergTables.load(properties.get("path")))
}

final class GraftSparkTable(table: IcebergTable) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  /** DELETE FROM ... WHERE: committed as positional merge-on-read delete
    * files — no data rewrite. Only fully-convertible predicates are
    * accepted; otherwise Spark falls back to an error (no silent rewrite). */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => FilterConv.fromSparkFilter(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val expr = filters.flatMap(FilterConv.fromSparkFilter)
      .reduceOption(CoreAnd(_, _)).getOrElse(AlwaysTrue)
    val spark = org.apache.spark.sql.SparkSession.active
    val current = IcebergTables.load(table.location)
    TableWriter.deleteWhere(current, spark, FilterConv.toColumn(expr))
  }
  override def name(): String = table.location
  override def schema(): StructType = SchemaConv.toSparkSchema(table.schema)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(table, schema(), options)

  /** Write path: the V1Write bridge hands us the source DataFrame intact, so
    * INSERT INTO / df.writeTo(...).append() reuse the same distributed
    * parquet write + footer-stats manifest commit as the library API.
    * `overwrite` (INSERT OVERWRITE / truncate) starts the manifest list from
    * scratch — a REPLACE commit. */
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var overwrite = false
      override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
        overwrite = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation: org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.DataFrame, _: Boolean) => {
              val current = IcebergTables.load(table.location) // fresh metadata
              if (overwrite) TableWriter.overwrite(current, data)
              else TableWriter.append(current, data)
              ()
            }
        }
    }
}

final class GraftScanBuilder(table: IcebergTable, fullSchema: StructType,
                             options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var limit: Option[Int] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept the convertible subset for file skipping; everything remains a
    // residual for Spark (inclusive pruning never drops matching rows)
    pushed = filters.filter(f => FilterConv.fromSparkFilter(f).isDefined)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(n: Int): Boolean = { limit = Some(n); false }

  override def build(): Scan = {
    val expr = pushed.flatMap(FilterConv.fromSparkFilter)
      .reduceOption(CoreAnd(_, _)).getOrElse(AlwaysTrue)
    new GraftScan(table, expr, required,
      Option(options.get("snapshot-id")).map(_.toLong),
      Option(options.get("branch")),
      Option(options.get("as-of-timestamp-ms")).map(_.toLong),
      limit)
  }
}

final class GraftScan(table: IcebergTable, filter: BooleanExpression,
                      required: StructType, snapshotId: Option[Long],
                      branch: Option[String], asOf: Option[Long],
                      limit: Option[Int])
    extends Scan with Batch with SupportsReportStatistics {

  private lazy val tasks: Seq[FileScanTask] =
    table.newScan(filter, snapshotId = snapshotId, ref = branch,
      asOfTimestampMs = asOf).planFiles()

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"icegopher ${table.location} [${tasks.size} files after pruning]"

  /** Planned-file stats (SupportsReportStatistics): lets Spark's CBO size
    * this relation from metadata — broadcast decisions without scanning. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(tasks.map(_.file.fileSizeInBytes).sum)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(tasks.map(_.file.recordCount).sum)
  }

  override def planInputPartitions(): Array[InputPartition] =
    tasks.map { t =>
      val pos = t.deleteFiles.filter(_.content == graft.core.DataFileContent.PositionDeletes)
        .map(_.path)
      val eq = t.deleteFiles.filter(_.content == graft.core.DataFileContent.EqualityDeletes)
        .map(d => EqDelete(d.path,
          d.equalityIds.flatMap(id => table.schema.findColumnName(id))))
      GraftInputPartition(t.file.path, required.json, limit, pos, eq,
        SchemaConv.toSparkSchema(table.schema).json): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory()
}

final case class EqDelete(path: String, cols: Seq[String])

final case class GraftInputPartition(path: String, schemaJson: String,
                                     limit: Option[Int],
                                     posDeletes: Seq[String] = Nil,
                                     eqDeletes: Seq[EqDelete] = Nil,
                                     fullSchemaJson: String = "") extends InputPartition

final class GraftReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    val full = if (p.fullSchemaJson.nonEmpty)
      DataType.fromJson(p.fullSchemaJson).asInstanceOf[StructType]
    else DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
    new GroupRowReader(p.path,
      DataType.fromJson(p.schemaJson).asInstanceOf[StructType], p.limit,
      p.posDeletes, p.eqDeletes, full)
  }
}

/** Row-at-a-time parquet reader via parquet-hadoop's example Group API, with
  * column projection pushed into the read schema. */
final class GroupRowReader(path: String, schema: StructType, limit: Option[Int],
                           posDeletePaths: Seq[String] = Nil,
                           eqDeletes: Seq[EqDelete] = Nil,
                           fullSchemaOpt: StructType = null)
    extends PartitionReader[InternalRow] {
  private val fullSchema: StructType = Option(fullSchemaOpt).getOrElse(schema)
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport

  private val conf = new Configuration()
  locally {
    // projection: subset of the file schema by required column names
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), conf))
    try {
      val fileSchema = footer.getFileMetaData.getSchema
      // read schema = required columns ∪ equality-delete key columns (the
      // latter are needed for tombstone checks even when projected away)
      val keep = schema.fieldNames.toSet ++ eqDeletes.flatMap(_.cols)
      val projected = new org.apache.parquet.schema.MessageType("projected",
        fileSchema.getFields.asScala.filter(f => keep.contains(f.getName)).asJava)
      conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
        projected.toString)
    } finally footer.close()
  }

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(),
      new org.apache.hadoop.fs.Path(path)).withConf(conf).build()

  /** Positions tombstoned for THIS data file by positional delete files. */
  private lazy val deletedPositions: java.util.HashSet[java.lang.Long] = {
    val set = new java.util.HashSet[java.lang.Long]()
    val myPath = path.stripPrefix("file:")
    posDeletePaths.foreach { dp =>
      val r = ParquetReader.builder(new GroupReadSupport(),
        new org.apache.hadoop.fs.Path(dp)).build()
      try {
        var g = r.read()
        while (g != null) {
          val fp = g.getBinary("file_path", 0).toStringUsingUTF8.stripPrefix("file:")
          if (fp == myPath) set.add(g.getLong("pos", 0))
          g = r.read()
        }
      } finally r.close()
    }
    set
  }

  /** Key tuples from equality-delete files (per column list), compared on
    * this reader's decoded representations. */
  private lazy val deletedKeys: Seq[(Seq[String], java.util.HashSet[Seq[Any]])] =
    eqDeletes.groupBy(_.cols).toSeq.flatMap { case (cols, files) =>
      if (cols.isEmpty) None
      else {
        val set = new java.util.HashSet[Seq[Any]]()
        files.foreach { ed =>
          val r = ParquetReader.builder(new GroupReadSupport(),
            new org.apache.hadoop.fs.Path(ed.path)).build()
          try {
            var g = r.read()
            while (g != null) {
              val key = cols.map { c =>
                val gi = g.getType.getFieldIndex(c)
                if (g.getFieldRepetitionCount(gi) == 0) null
                else readValue(g, gi, fullSchema(fullSchema.fieldIndex(c)).dataType)
              }
              set.add(key)
              g = r.read()
            }
          } finally r.close()
        }
        Some((cols, set))
      }
    }

  private var current: Group = _
  private var rowPos = -1L // position within the data file (pre-delete)
  private var emitted = 0L

  private def isDeleted(g: Group): Boolean = {
    if (!deletedPositions.isEmpty && deletedPositions.contains(rowPos)) return true
    deletedKeys.exists { case (cols, set) =>
      val key = cols.map { c =>
        val dt = fullSchema(fullSchema.fieldIndex(c)).dataType
        val gi = g.getType.getFieldIndex(c)
        if (g.getFieldRepetitionCount(gi) == 0) null else readValue(g, gi, dt)
      }
      set.contains(key)
    }
  }

  override def next(): Boolean = {
    if (limit.exists(emitted >= _)) return false
    current = reader.read()
    rowPos += 1
    while (current != null && isDeleted(current)) {
      current = reader.read()
      rowPos += 1
    }
    if (current != null) emitted += 1
    current != null
  }

  override def get(): InternalRow = {
    val g = current
    val gType = g.getType
    val row = new GenericInternalRow(schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val gi = gType.getFieldIndex(f.name)
      if (g.getFieldRepetitionCount(gi) == 0) row.update(i, null)
      else row.update(i, readValue(g, gi, f.dataType))
      i += 1
    }
    row
  }

  private def readValue(g: Group, gi: Int, dt: DataType): Any = dt match {
    case BooleanType => g.getBoolean(gi, 0)
    case IntegerType | DateType => g.getInteger(gi, 0)
    case LongType => g.getLong(gi, 0)
    case FloatType => g.getFloat(gi, 0)
    case DoubleType => g.getDouble(gi, 0)
    case StringType => UTF8String.fromBytes(g.getBinary(gi, 0).getBytes)
    case BinaryType => g.getBinary(gi, 0).getBytes
    case TimestampType | TimestampNTZType =>
      // test tables carry µs/ms int64 timestamps; unit from logical type
      val lt = g.getType.getType(gi).asPrimitiveType().getLogicalTypeAnnotation
      val raw = g.getLong(gi, 0)
      lt match {
        case t: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit match {
            case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MILLIS => raw * 1000L
            case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MICROS => raw
            case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.NANOS => raw / 1000L
          }
        case _ => raw
      }
    case d: DecimalType =>
      val prim = g.getType.getType(gi).asPrimitiveType()
      prim.getPrimitiveTypeName match {
        case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32 =>
          org.apache.spark.sql.types.Decimal(BigDecimal(BigInt(g.getInteger(gi, 0)), d.scale), d.precision, d.scale)
        case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64 =>
          org.apache.spark.sql.types.Decimal(BigDecimal(BigInt(g.getLong(gi, 0)), d.scale), d.precision, d.scale)
        case _ =>
          org.apache.spark.sql.types.Decimal(BigDecimal(
            BigInt(new java.math.BigInteger(g.getBinary(gi, 0).getBytes)), d.scale),
            d.precision, d.scale)
      }
    case other =>
      throw new UnsupportedOperationException(
        s"icegopher DSv2 row reader does not support $other; use IcebergTable.toDF")
  }

  override def close(): Unit = reader.close()
}
