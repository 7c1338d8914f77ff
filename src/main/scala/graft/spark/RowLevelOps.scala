package graft.spark

import java.io.File

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Copy-on-write row-level operations: SQL UPDATE / MERGE / (non-pushable)
  * DELETE.
  *
  * Spark's group-based rewrite drives this: the operation's scan reads the
  * table with per-row `_file` provenance, runtime group filtering narrows
  * the scan to the files that contain matching rows (via the scan's
  * `_file` runtime filter — metadata-only), Spark computes the replacement
  * rows for those files, and commit atomically swaps exactly the scanned
  * files for the newly written ones. Untouched files are never read or
  * rewritten; without group filtering the rewrite degrades to a full-table
  * copy, which is slower but still correct.
  *
  * (Pushable DELETEs never get here — `SupportsDelete` commits merge-on-
  * read tombstones without touching data.) */
final class GraftRowLevelOperation(location: String,
                                   cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  @volatile private var capturedScan: GraftScan = _

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"icegopher $cmd $location [copy-on-write]"

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftReaders.FileCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val table = IcebergTables.load(location)
    val inner = new GraftScanBuilder(table,
      SchemaConv.toSparkSchema(table.schema), options)
    // capture the built scan: its (runtime-filtered) file set is the group
    // set the commit replaces
    new ScanBuilder
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      override def pruneColumns(requiredSchema: StructType): Unit =
        inner.pruneColumns(requiredSchema)
      override def build(): Scan = {
        val scan = inner.build().asInstanceOf[GraftScan]
        capturedScan = scan
        scan
      }
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new GraftReplaceDataWrite(location, info.schema(),
          () => {
            require(capturedScan != null, "row-level write before scan was planned")
            capturedScan.scannedFilePaths
          })
    }
}

/** V2 batch write for the replacement rows: tasks write parquet files with
  * Spark's own row write support; the driver commit swaps the replaced
  * files in one OVERWRITE snapshot. */
final class GraftReplaceDataWrite(location: String, writeSchema: StructType,
                                  replacedFiles: () => Seq[String])
    extends Write with BatchWrite {

  private val writeDir =
    new File(location, s"data/cow-${java.util.UUID.randomUUID()}")

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    writeDir.mkdirs()
    GraftCowWriterFactory(writeDir.getPath, writeSchema.json)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val added = messages.collect { case m: GraftCowCommit if m.rows > 0 =>
      new File(m.path)
    }
    TableWriter.replaceFiles(location, replacedFiles().toSet, added.toSeq)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.collect { case m: GraftCowCommit => new File(m.path).delete() }
    writeDir.delete()
  }
}

final case class GraftCowCommit(path: String, rows: Long) extends WriterCommitMessage

final case class GraftCowWriterFactory(dir: String, schemaJson: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftCowDataWriter(dir, partitionId, taskId,
      org.apache.spark.sql.types.DataType.fromJson(schemaJson).asInstanceOf[StructType])
}

/** One parquet file per task, written through Spark's ParquetWriteSupport
  * (same encoding as Spark's own parquet sink). */
final class GraftCowDataWriter(dir: String, partitionId: Int, taskId: Long,
                               schema: StructType)
    extends DataWriter[InternalRow] {
  import org.apache.parquet.hadoop.ParquetWriter
  import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport

  private val file = new File(dir, f"part-$partitionId%05d-$taskId.parquet")

  private val conf = {
    val c = new Configuration()
    ParquetWriteSupport.setSchema(schema, c)
    c.set("spark.sql.session.timeZone", "UTC")
    c.setBoolean("spark.sql.parquet.writeLegacyFormat", false)
    c.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    c.setBoolean("spark.sql.parquet.fieldId.write.enabled", false)
    c.setBoolean("spark.sql.parquet.variant.annotateLogicalType.enabled", false)
    c.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    c.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
    c.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    c.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    c
  }

  private final class B(path: Path)
      extends ParquetWriter.Builder[InternalRow, B](path) {
    override def self(): B = this
    override def getWriteSupport(c: Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
      new ParquetWriteSupport()
  }

  private lazy val writer: ParquetWriter[InternalRow] =
    new B(new Path(file.getPath)).withConf(conf).build()
  private var rows = 0L

  override def write(row: InternalRow): Unit = { writer.write(row); rows += 1 }

  override def commit(): WriterCommitMessage = {
    if (rows > 0) writer.close()
    GraftCowCommit(file.getPath, rows)
  }

  override def abort(): Unit = {
    try if (rows > 0) writer.close() finally file.delete()
  }

  override def close(): Unit = ()
}
