package graft.spark

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{DataFileContent, DeleteMatching, ManifestEntry, ManifestFile, ManifestIO}

/** Iceberg-style SQL metadata tables: `SELECT * FROM graft.db.t.snapshots`
  * (also `history`, `refs`, `files`, `manifests`) — the same inspection
  * surface the CLI verbs and `IcebergTable.*DF` offer, reachable from pure
  * SQL.
  *
  * Scale split: `snapshots`/`history`/`refs`/`manifests` rows come straight
  * from the table metadata or the one manifest-list Avro file — genuinely
  * metadata-sized, so they are computed on the driver and shipped in a
  * single partition. `files` is O(data files) — millions of rows on a large
  * table — so it is a DISTRIBUTED scan: one input partition per data
  * manifest, with entry decode and delete matching running on executors
  * ([[FilesMetadataTable]]); the driver only reads the manifest list. */
object MetadataTables {

  val Names: Set[String] =
    Set("snapshots", "history", "refs", "files", "manifests", "partitions",
      "entries", "all_files", "all_manifests", "all_entries",
      "metadata_log_entries", "position_deletes", "delete_files",
      "partition_statistics")

  def build(table: IcebergTable, kind: String): Table = {
    if (kind == "files") return buildFiles(table)
    if (kind == "partitions") return new PartitionsMetadataTable(table)
    if (kind == "entries") return buildEntries(table)
    if (kind == "position_deletes") return buildPositionDeletes(table)
    if (kind == "delete_files") return buildDeleteFiles(table)
    if (kind == "all_files") return buildAllFiles(table, includeDeleted = false)
    if (kind == "all_entries") return buildAllFiles(table, includeDeleted = true,
      name = "all_entries")
    if (kind == "all_manifests") return new AllManifestsTable(table)
    def s(v: String): Any = UTF8String.fromString(v)
    val (schema, rows): (StructType, Seq[Array[Any]]) = kind match {
      // registered partition-statistics files (spec parquet; read the
      // per-partition content with spark.read.parquet(statistics_path))
      case "partition_statistics" => (StructType(Seq(
        StructField("snapshot_id", LongType, nullable = false),
        StructField("statistics_path", StringType, nullable = false),
        StructField("file_size_in_bytes", LongType, nullable = false))),
        table.metadata.partitionStatisticsFiles.map(f =>
          Array[Any](f.snapshotId, s(f.path), f.fileSizeInBytes)))
      case "snapshots" => (StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("parent_id", LongType),
          StructField("sequence_number", LongType, nullable = false),
          StructField("committed_at_ms", LongType, nullable = false),
          StructField("operation", StringType),
          StructField("manifest_list", StringType),
          StructField("summary", MapType(StringType, StringType)))),
        table.metadata.snapshots.map(sn => Array[Any](sn.snapshotId,
          sn.parentSnapshotId.orNull, sn.sequenceNumber, sn.timestampMs,
          s(sn.summary.map(_.operation.repr).getOrElse("")), s(sn.manifestList),
          org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            sn.summary.map(_.properties).getOrElse(Map.empty),
            (k: Any) => UTF8String.fromString(k.toString),
            (v: Any) => UTF8String.fromString(v.toString)))))
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
      case "metadata_log_entries" => (StructType(Seq(
          StructField("timestamp_ms", LongType, nullable = false),
          StructField("file", StringType, nullable = false),
          StructField("is_current", BooleanType, nullable = false))),
        table.metadata.metadataLog.map(e =>
          Array[Any](e.timestampMs, s(e.metadataFile), false)) :+
          Array[Any](table.metadata.lastUpdatedMs, s(table.metadataPath), true))
      case other => throw new IllegalArgumentException(s"unknown metadata table $other")
    }
    new LocalRowsTable(s"${table.location}#$kind", schema, rows)
  }

  /** `db.v.versions` over a VIEW: the retained Iceberg-view-spec version
    * history ([[GraftViews]] keeps every CREATE OR REPLACE as a new
    * version and moves `current-version-id`) — queryable the same way
    * table snapshot history is (`db.t.snapshots`). */
  def buildViewVersions(location: String, md: ViewMetadata): Table = {
    def s(v: String): Any = UTF8String.fromString(v)
    val schema = StructType(Seq(
      StructField("version_id", IntegerType, nullable = false),
      StructField("is_current", BooleanType, nullable = false),
      StructField("committed_at_ms", LongType, nullable = false),
      StructField("sql", StringType, nullable = false),
      StructField("dialect", StringType, nullable = false),
      StructField("default_catalog", StringType),
      StructField("default_namespace", StringType),
      StructField("schema_json", StringType, nullable = false)))
    val rows = md.versions.sortBy(_.versionId).map(v => Array[Any](
      v.versionId, v.versionId == md.currentVersionId, v.timestampMs,
      s(v.sql), s(v.dialect), s(v.defaultCatalog),
      s(v.defaultNamespace.mkString(".")), s(v.sparkSchemaJson)))
    new LocalRowsTable(s"$location#versions", schema, rows)
  }

  val FilesSchema: StructType = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("file_format", StringType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("file_size_in_bytes", LongType, nullable = false),
    StructField("delete_files", IntegerType, nullable = false),
    StructField("spec_id", IntegerType, nullable = false),
    StructField("partition", StringType, nullable = false)))

  /** Deterministic human-readable partition tuple (`k=v/k=v`, sorted) —
    * shared by the SQL partitions/files tables and the CLI verb. */
  def partitionRepr(partition: Map[String, Any]): String =
    partition.toSeq.sortBy(_._1).map { case (k, v) =>
      val s = v match {
        case null => "null"
        case b: Array[Byte] => "0x" + b.map(x => f"$x%02x").mkString
        case other => String.valueOf(other)
      }
      s"$k=$s"
    }.mkString("/")

  /** Driver work is manifest-LIST-sized: read the list, split data vs
    * delete manifests, decode the (few) delete manifests so every partition
    * can count matching deletes with the same semantics `planFiles` uses.
    * Partition maps are stripped from the shipped delete entries — matching
    * never reads them, and their values can hold non-serializable Avro
    * `Utf8`. */
  private[spark] def buildFiles(table: IcebergTable): Table = {
    val manifests = table.currentSnapshot.toSeq
      .flatMap(sn => ManifestIO.readManifestList(table.io.open(sn.manifestList)))
    val (dataManifests, deleteManifests) = manifests.partition(_.content == 0)
    val deleteEntries = deleteManifests
      .flatMap(m => ManifestIO.readManifestEntries(table.io.open(m.path), m))
      .map(e => e.copy(dataFile = e.dataFile.copy(partition = Map.empty)))
    val pos = deleteEntries
      .filter(_.dataFile.content == DataFileContent.PositionDeletes)
      .sortBy(_.sequenceNumber.getOrElse(0L)).toIndexedSeq
    val eq = deleteEntries
      .filter(_.dataFile.content == DataFileContent.EqualityDeletes)
    new FilesMetadataTable(s"${table.location}#files",
      table.metadata.properties, dataManifests, pos, eq)
  }

  /** DataFrame over the DISTRIBUTED files scan (one partition per data
    * manifest, executor-side entry decode) — the building block for
    * per-partition rollups. */
  private[spark] def filesRelation(spark: org.apache.spark.sql.SparkSession,
                                   table: IcebergTable)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.graft.ColumnShim.ofRows(spark,
      org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        .create(buildFiles(table), None, None))

  val EntriesSchema: StructType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("snapshot_id", LongType),
    StructField("sequence_number", LongType),
    StructField("file_sequence_number", LongType),
    StructField("content", IntegerType, nullable = false),
    StructField("file_path", StringType, nullable = false),
    StructField("file_format", StringType, nullable = false),
    StructField("spec_id", IntegerType, nullable = false),
    StructField("partition", StringType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("file_size_in_bytes", LongType, nullable = false)))

  /** `entries`: the raw manifest-entry surface (data AND delete manifests)
    * of the current snapshot, post seq-num inheritance — one input
    * partition per manifest, entry decode on executors. */
  private[spark] def buildEntries(table: IcebergTable): Table = {
    val manifests = table.currentSnapshot.toSeq
      .flatMap(sn => ManifestIO.readManifestList(table.io.open(sn.manifestList)))
    new EntriesMetadataTable(s"${table.location}#entries",
      table.metadata.properties, manifests, includeDeleted = true)
  }

  /** `all_files` / `all_entries`: data/delete files reachable from ANY
    * snapshot (`all_entries` keeps DELETED-status rows). The driver
    * reads only the manifest LISTS (one small Avro per snapshot), dedupes
    * manifests by path, and ships one input partition per unique manifest —
    * entry decode stays on executors, so the table is O(total files) spread
    * across the cluster even with a deep snapshot history. */
  private[spark] def buildAllFiles(table: IcebergTable,
                                   includeDeleted: Boolean,
                                   name: String = "all_files"): Table = {
    val manifests = table.metadata.snapshots
      .flatMap(sn => ManifestIO.readManifestList(table.io.open(sn.manifestList)))
      .groupBy(_.path).map(_._2.head).toSeq.sortBy(_.path)
    new EntriesMetadataTable(s"${table.location}#$name",
      table.metadata.properties, manifests, includeDeleted)
  }

  val AllManifestsSchema: StructType = StructType(Seq(
    StructField("reference_snapshot_id", LongType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("partition_spec_id", IntegerType, nullable = false),
    StructField("content", IntegerType, nullable = false),
    StructField("sequence_number", LongType, nullable = false),
    StructField("min_sequence_number", LongType, nullable = false),
    StructField("added_snapshot_id", LongType, nullable = false),
    StructField("added_files", IntegerType, nullable = false),
    StructField("existing_files", IntegerType, nullable = false),
    StructField("deleted_files", IntegerType, nullable = false)))

  val DeleteFilesSchema: StructType = StructType(Seq(
    StructField("content", IntegerType, nullable = false),
    StructField("file_path", StringType, nullable = false),
    StructField("file_format", StringType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("file_size_in_bytes", LongType, nullable = false),
    StructField("sequence_number", LongType),
    StructField("equality_ids", StringType, nullable = false)))

  /** `delete_files`: one row per pos/eq delete file in the current
    * snapshot — delete-manifest-sized, driver-side. */
  private[spark] def buildDeleteFiles(table: IcebergTable): Table = {
    val rows = table.currentSnapshot.toSeq
      .flatMap(sn => ManifestIO.readManifestList(table.io.open(sn.manifestList)))
      .filter(_.content == 1)
      .flatMap(m => ManifestIO.readManifestEntries(table.io.open(m.path), m))
      .sortBy(_.dataFile.path)
      .map { e =>
        Array[Any](e.dataFile.content, UTF8String.fromString(e.dataFile.path),
          UTF8String.fromString(e.dataFile.format), e.dataFile.recordCount,
          e.dataFile.fileSizeInBytes, e.sequenceNumber.map(Long.box).orNull,
          UTF8String.fromString(e.dataFile.equalityIds.mkString(",")))
      }
    new LocalRowsTable(s"${table.location}#delete_files", DeleteFilesSchema, rows)
  }

  val PositionDeletesSchema: StructType = StructType(Seq(
    StructField("data_file_path", StringType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("delete_file_path", StringType, nullable = false)))

  /** `position_deletes`: the tombstone ROWS themselves — O(deleted rows),
    * so a DISTRIBUTED scan with one input partition per delete file,
    * parquet decode on executors. */
  private[spark] def buildPositionDeletes(table: IcebergTable): Table = {
    val files = table.currentSnapshot.toSeq
      .flatMap(sn => ManifestIO.readManifestList(table.io.open(sn.manifestList)))
      .filter(_.content == 1)
      .flatMap(m => ManifestIO.readManifestEntries(table.io.open(m.path), m))
      .filter(_.dataFile.content == DataFileContent.PositionDeletes)
      .map(e => (e.dataFile.path, e.dataFile.fileSizeInBytes))
      .distinct.sortBy(_._1)
    new PositionDeletesTable(s"${table.location}#position_deletes", files)
  }

  val PartitionsSchema: StructType = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("spec_id", IntegerType, nullable = false),
    StructField("file_count", LongType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("total_size_bytes", LongType, nullable = false),
    StructField("delete_file_count", LongType, nullable = false)))

  /** Per-partition rollup over the distributed files scan: the standard
    * skew-diagnosis surface (which partition holds the rows/bytes, where
    * the delete files pile up). Aggregation runs as a Spark job —
    * map-side-combined over one input partition per manifest — and only
    * the O(partitions) result ever reaches the driver. */
  private[spark] def partitionsAgg(spark: org.apache.spark.sql.SparkSession,
                                   table: IcebergTable)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    filesRelation(spark, table)
      .groupBy(col("partition"), col("spec_id"))
      .agg(count(lit(1)).as("file_count"),
        sum(col("record_count")).as("record_count"),
        sum(col("file_size_in_bytes")).as("total_size_bytes"),
        sum(col("delete_files").cast("long")).as("delete_file_count"))
      .select("partition", "spec_id", "file_count", "record_count",
        "total_size_bytes", "delete_file_count")
  }
}

object PartitionsMetadataTable {
  /** Diagnostic: spilled-rollup serves in this JVM (spec hook proving the
    * driver-collect path is gone). */
  val spilledServes = new java.util.concurrent.atomic.AtomicLong()

  // Spill dirs per table location, keyed by the snapshot they reflect:
  // repeat queries at the same snapshot reuse one dir, and advancing the
  // table retires older dirs — bounding a long-lived session at TWO dirs
  // per table (current + previous) instead of one per query. The previous
  // generation is kept alive because a scan planned just before the
  // advance may still be reading it; only the generation BEHIND that is
  // deleted (its readers are two table-advances old). Locking is
  // per-table (interned location string) and the rollup job runs inside
  // only that table's lock, so concurrent queries of DIFFERENT tables
  // never serialize behind each other's builds.
  private val spillDirs = new java.util.concurrent
    .ConcurrentHashMap[String, List[(Option[Long], java.io.File)]]()

  // final generations (the two kept per table) would otherwise outlive the
  // JVM and accumulate in the system temp dir across sessions — one
  // shutdown hook reaps whatever generation-retirement hasn't
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      spillDirs.values().forEach(_.foreach(g => deleteRec(g._2)))))
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }

  private[spark] def spillFor(table: IcebergTable)
                             (build: java.io.File => Unit): java.io.File = {
    val key = table.location.intern()
    key.synchronized {
      val snap = table.currentSnapshot.map(_.snapshotId)
      val gens = spillDirs.getOrDefault(key, Nil)
      gens.find(g => g._1 == snap && g._2.isDirectory) match {
        case Some((_, dir)) => dir
        case None =>
          val dir =
            java.nio.file.Files.createTempDirectory("graft_partitions").toFile
          build(dir)
          val (keep, retire) = ((snap, dir) :: gens).splitAt(2)
          retire.foreach(g => deleteRec(g._2))
          spillDirs.put(key, keep)
          dir
      }
    }
  }
}

/** SQL `db.t.partitions`: the rollup runs as a distributed job when the
  * scan is planned, SPILLS to temp parquet executor-side, and is served
  * back as one input partition per spill file — the per-partition rows
  * never pass through driver memory. A 10⁶-partition table costs the
  * driver O(spill files) paths, not O(partitions) rows (the round-10
  * review flagged the previous collect()-to-LocalRowsPartition shape as a
  * driver-heap risk at exactly that scale). */
final class PartitionsMetadataTable(table: IcebergTable)
  extends Table with SupportsRead {
  override def name(): String = s"${table.location}#partitions"
  override def schema(): StructType = MetadataTables.PartitionsSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      override def readSchema(): StructType = MetadataTables.PartitionsSchema
      override def toBatch: Batch = this
      override def description(): String = s"${name()} [spilled rollup]"
      private lazy val spillFiles: Seq[(String, Long)] = {
        val spark = org.apache.spark.sql.SparkSession.active
        val dir = PartitionsMetadataTable.spillFor(table) { d =>
          MetadataTables.partitionsAgg(spark, table)
            .write.mode("overwrite").parquet(d.getPath)
        }
        PartitionsMetadataTable.spilledServes.incrementAndGet()
        Option(dir.listFiles()).getOrElse(Array.empty).toSeq
          .filter(f => f.getName.endsWith(".parquet") && f.length() > 0)
          .map(f => (f.getPath, f.length()))
          .sortBy(_._1)
      }
      override def planInputPartitions(): Array[InputPartition] =
        spillFiles.map { case (p, len) =>
          PartitionsSpillPartition(p, len): InputPartition
        }.toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionsSpillReaderFactory()
    }
}

final case class PartitionsSpillPartition(path: String, length: Long)
    extends InputPartition

/** Streams one spill file of the partitions rollup back as rows. */
final class PartitionsSpillReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PartitionsSpillPartition]
    val reader = new ParquetRowFileReader(GraftReaders.createVectorized(
      p.path, 0L, p.length, MetadataTables.PartitionsSchema))
    new PartitionReader[InternalRow] {
      override def next(): Boolean = reader.nextKeyValue()
      override def get(): InternalRow = reader.getCurrentValue
      override def close(): Unit = reader.close()
    }
  }
}

/** Distributed `files` metadata table: one input partition per data
  * manifest; executors decode manifest entries and match delete files,
  * exactly as SURVEY §2.1 S9 prescribes (`createDataset(manifests)
  * .flatMap(readEntries)` shape, realized as a DSv2 Batch so it stays
  * inside the catalog surface). */
final class FilesMetadataTable(tableName: String, props: Map[String, String],
                               dataManifests: Seq[ManifestFile],
                               posDeletes: IndexedSeq[ManifestEntry],
                               eqDeletes: Seq[ManifestEntry])
  extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = MetadataTables.FilesSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      override def readSchema(): StructType = MetadataTables.FilesSchema
      override def toBatch: Batch = this
      override def description(): String = s"$tableName [distributed manifest entries]"
      override def planInputPartitions(): Array[InputPartition] =
        dataManifests.map(m => ManifestEntriesPartition(m): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new FilesReaderFactory(props, posDeletes, eqDeletes)
    }
}

final case class ManifestEntriesPartition(manifest: ManifestFile) extends InputPartition

/** Distributed `entries` / `all_files` table: one input partition per
  * manifest (data and delete manifests both), raw entry rows with
  * inherited sequence numbers — the debugging surface for commit forensics
  * (DELETED-status entries included). For `all_files` the manifests span
  * every snapshot (deduped by path) and only live entries are emitted. */
final class EntriesMetadataTable(tableName: String, props: Map[String, String],
                                 manifests: Seq[ManifestFile],
                                 includeDeleted: Boolean)
  extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = MetadataTables.EntriesSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      override def readSchema(): StructType = MetadataTables.EntriesSchema
      override def toBatch: Batch = this
      override def description(): String = s"$tableName [distributed manifest entries]"
      override def planInputPartitions(): Array[InputPartition] =
        manifests.map(m => ManifestEntriesPartition(m): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new EntriesReaderFactory(props, includeDeleted)
    }
}

final class EntriesReaderFactory(props: Map[String, String],
                                 includeDeleted: Boolean)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val m = p.asInstanceOf[ManifestEntriesPartition].manifest
      private val entries = ManifestIO
        .readManifestEntries(IOConfig.fileIO(props).open(m.path), m,
          discardDeleted = !includeDeleted)
        .iterator
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!entries.hasNext) return false
        val e = entries.next()
        row = new GenericInternalRow(Array[Any](
          e.status, e.snapshotId.map(Long.box).orNull,
          e.sequenceNumber.map(Long.box).orNull,
          e.fileSequenceNumber.map(Long.box).orNull,
          e.dataFile.content,
          UTF8String.fromString(e.dataFile.path),
          UTF8String.fromString(e.dataFile.format),
          m.partitionSpecId,
          UTF8String.fromString(MetadataTables.partitionRepr(e.dataFile.partition)),
          e.dataFile.recordCount, e.dataFile.fileSizeInBytes))
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}

/** Distributed `all_manifests`: one input partition per SNAPSHOT; each task
  * reads that snapshot's manifest list (one small Avro file) on an
  * executor, so a deep history never serializes through the driver. */
final class AllManifestsTable(table: IcebergTable)
  extends Table with SupportsRead {
  private val props = table.metadata.properties
  private val snaps: Seq[(Long, String)] =
    table.metadata.snapshots.map(sn => (sn.snapshotId, sn.manifestList))
  override def name(): String = s"${table.location}#all_manifests"
  override def schema(): StructType = MetadataTables.AllManifestsSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      override def readSchema(): StructType = MetadataTables.AllManifestsSchema
      override def toBatch: Batch = this
      override def description(): String = s"${name()} [one partition per snapshot]"
      override def planInputPartitions(): Array[InputPartition] =
        snaps.map(s => SnapshotManifestListPartition(s._1, s._2): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new AllManifestsReaderFactory(props)
    }
}

final class AllManifestsReaderFactory(props: Map[String, String])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val sp = p.asInstanceOf[SnapshotManifestListPartition]
      private val ms = ManifestIO
        .readManifestList(IOConfig.fileIO(props).open(sp.manifestList)).iterator
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!ms.hasNext) return false
        val m = ms.next()
        row = new GenericInternalRow(Array[Any](
          sp.snapshotId, UTF8String.fromString(m.path), m.length,
          m.partitionSpecId, m.content, m.sequenceNumber,
          m.minSequenceNumber, m.addedSnapshotId, m.addedFilesCount,
          m.existingFilesCount, m.deletedFilesCount))
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}

final case class SnapshotManifestListPartition(snapshotId: Long,
                                               manifestList: String)
  extends InputPartition

/** Serialized once per stage; each task opens its manifest through a FileIO
  * rebuilt from the table's IO properties and streams rows out. */
final class FilesReaderFactory(props: Map[String, String],
                               posDeletes: IndexedSeq[ManifestEntry],
                               eqDeletes: Seq[ManifestEntry])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val m = p.asInstanceOf[ManifestEntriesPartition].manifest
      private val entries =
        ManifestIO.readManifestEntries(IOConfig.fileIO(props).open(m.path), m).iterator
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!entries.hasNext) return false
        val e = entries.next()
        val nDeletes =
          (if (posDeletes.isEmpty) 0 else DeleteMatching.posDeletes(e, posDeletes).size) +
            DeleteMatching.eqDeletes(e.sequenceNumber.getOrElse(0L), eqDeletes).size
        row = new GenericInternalRow(Array[Any](
          UTF8String.fromString(e.dataFile.path),
          UTF8String.fromString(e.dataFile.format),
          e.dataFile.recordCount, e.dataFile.fileSizeInBytes, nDeletes,
          m.partitionSpecId,
          UTF8String.fromString(
            MetadataTables.partitionRepr(e.dataFile.partition))))
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}

final case class PosDeleteFilePartition(path: String, length: Long)
  extends InputPartition

final class PositionDeletesTable(tableName: String,
                                 files: Seq[(String, Long)])
  extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = MetadataTables.PositionDeletesSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      override def readSchema(): StructType = MetadataTables.PositionDeletesSchema
      override def toBatch: Batch = this
      override def description(): String = s"$tableName [one partition per delete file]"
      override def planInputPartitions(): Array[InputPartition] =
        files.map(f => PosDeleteFilePartition(f._1, f._2): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(p: InputPartition)
              : PartitionReader[InternalRow] =
            new PartitionReader[InternalRow] {
              private val fp = p.asInstanceOf[PosDeleteFilePartition]
              private val readSchema = StructType(Seq(
                StructField("file_path", StringType, nullable = false),
                StructField("pos", LongType, nullable = false)))
              private val reader = GraftReaders.createVectorized(
                fp.path, 0, fp.length, readSchema)
              private val self = UTF8String.fromString(fp.path)
              private var row: InternalRow = _
              override def next(): Boolean = {
                if (!reader.nextKeyValue()) return false
                val r = reader.getCurrentValue.asInstanceOf[InternalRow]
                row = new GenericInternalRow(Array[Any](
                  r.getUTF8String(0), r.getLong(1), self))
                true
              }
              override def get(): InternalRow = row
              override def close(): Unit = reader.close()
            }
        }
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
