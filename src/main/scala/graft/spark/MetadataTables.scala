package graft.spark

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.ManifestIO

/** Iceberg-style SQL metadata tables: `SELECT * FROM graft.db.t.snapshots`
  * (also `history`, `refs`, `files`, `manifests`) — the same inspection
  * surface the CLI verbs and `IcebergTable.*DF` offer, reachable from pure
  * SQL. Rows are metadata-sized and computed on the driver at load time;
  * execution ships the precomputed rows in a single partition. */
object MetadataTables {

  val Names: Set[String] = Set("snapshots", "history", "refs", "files", "manifests")

  def build(table: IcebergTable, kind: String): Table = {
    def s(v: String): Any = UTF8String.fromString(v)
    val (schema, rows): (StructType, Seq[Array[Any]]) = kind match {
      case "snapshots" => (StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("parent_id", LongType),
          StructField("sequence_number", LongType, nullable = false),
          StructField("committed_at_ms", LongType, nullable = false),
          StructField("operation", StringType),
          StructField("manifest_list", StringType))),
        table.metadata.snapshots.map(sn => Array[Any](sn.snapshotId,
          sn.parentSnapshotId.orNull, sn.sequenceNumber, sn.timestampMs,
          s(sn.summary.map(_.operation.repr).getOrElse("")), s(sn.manifestList))))
      case "history" => (StructType(Seq(
          StructField("made_current_at_ms", LongType, nullable = false),
          StructField("snapshot_id", LongType, nullable = false))),
        table.metadata.snapshotLog.map(e => Array[Any](e.timestampMs, e.snapshotId)))
      case "refs" => (StructType(Seq(
          StructField("name", StringType, nullable = false),
          StructField("type", StringType, nullable = false),
          StructField("snapshot_id", LongType, nullable = false))),
        table.metadata.refs.toSeq.sortBy(_._1).map { case (name, r) =>
          Array[Any](s(name), s(r.refType.repr), r.snapshotId)
        })
      case "files" => (StructType(Seq(
          StructField("file_path", StringType, nullable = false),
          StructField("file_format", StringType, nullable = false),
          StructField("record_count", LongType, nullable = false),
          StructField("file_size_in_bytes", LongType, nullable = false),
          StructField("delete_files", IntegerType, nullable = false))),
        table.newScan().planFiles().map(t => Array[Any](s(t.file.path),
          s(t.file.format), t.file.recordCount, t.file.fileSizeInBytes,
          t.deleteFiles.size)))
      case "manifests" => (StructType(Seq(
          StructField("path", StringType, nullable = false),
          StructField("length", LongType, nullable = false),
          StructField("partition_spec_id", IntegerType, nullable = false),
          StructField("content", IntegerType, nullable = false),
          StructField("sequence_number", LongType, nullable = false),
          StructField("added_files", IntegerType, nullable = false),
          StructField("existing_files", IntegerType, nullable = false),
          StructField("deleted_files", IntegerType, nullable = false))),
        table.currentSnapshot.toSeq
          .flatMap(sn => ManifestIO.readManifestList(table.io.open(sn.manifestList)))
          .map(m => Array[Any](s(m.path), m.length, m.partitionSpecId, m.content,
            m.sequenceNumber, m.addedFilesCount, m.existingFilesCount,
            m.deletedFilesCount)))
      case other => throw new IllegalArgumentException(s"unknown metadata table $other")
    }
    new LocalRowsTable(s"${table.location}#$kind", schema, rows)
  }
}

/** A read-only table over driver-computed rows (metadata-sized by
  * construction — snapshots/refs/manifest lists, never data). */
final class LocalRowsTable(tableName: String, tableSchema: StructType,
                           rows: Seq[Array[Any]]) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new LocalRowsScan(tableName, tableSchema, rows)
}

/** A one-partition Scan over driver-computed rows (metadata tables,
  * procedure results). */
final class LocalRowsScan(name: String, rowsSchema: StructType,
                          rows: Seq[Array[Any]]) extends Scan with Batch {
  override def readSchema(): StructType = rowsSchema
  override def toBatch: Batch = this
  override def description(): String = s"$name [metadata rows]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(LocalRowsPartition(rows.toArray))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val all = p.asInstanceOf[LocalRowsPartition].rows
          private var i = -1
          override def next(): Boolean = { i += 1; i < all.length }
          override def get(): InternalRow = new GenericInternalRow(all(i))
          override def close(): Unit = ()
        }
    }
}

final case class LocalRowsPartition(rows: Array[Array[Any]]) extends InputPartition
