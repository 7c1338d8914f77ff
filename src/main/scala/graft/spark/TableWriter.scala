package graft.spark

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr => sexpr, to_date, udf, year => syear}

import graft.core._

/** The write/commit path — "Writing is WIP" in the reference
  * (cmd/icegopher/main.go:314,330); here it's implemented: distributed task
  * writers (shared with the CoW path) write the parquet, derive partition
  * tuples per row, and count float/double NaNs inline; the driver turns
  * parquet FOOTERS into per-file Iceberg stats (no second data pass —
  * O(files) metadata reads), then commits manifest → manifest list →
  * vN.metadata.json atomically via rename, with a version-hint for readers.
  */
object TableWriter {

  /** Create a new table at `location` from a DataFrame. `partitionBy` maps
    * source column name → transform; data is written hive-partitioned on the
    * transformed value so the scan planner can prune on partition tuples.
    *
    * `sortBy` goes beyond the reference (which carries sort orders as inert
    * metadata, sorting.go:29-157): the data is RANGE-CLUSTERED on the sort
    * columns at write time — one range shuffle — so per-file min/max bounds
    * become disjoint and stats pruning drops all but the matching files for
    * range/point predicates on those columns. The order is recorded in table
    * metadata and stamped on each data file (`sort_order_id`). */
  def create(df: DataFrame, location: String,
             partitionBy: Seq[(String, Transform)] = Nil,
             properties: Map[String, String] = Map.empty,
             sortBy: Seq[String] = Nil): IcebergTable = {
    val schema = SchemaConv.fromSparkSchema(df.schema)
    val spec = PartitionSpec(0, partitionBy.zipWithIndex.map { case ((src, t), i) =>
      val f = schema.findFieldByName(src).getOrElse(
        throw new IllegalArgumentException(s"partition source column '$src' not found"))
      PartitionField(f.id, PartitionSpec.PartitionDataIdStart + i,
        partName(src, t), t)
    })
    val sortOrder = sortOrderFor(schema, sortBy)
    commit(df, location, schema, spec, properties, version = 1, parentSnapshot = None,
      existingEntries = Nil, existingManifests = Nil, sequenceNumber = 1,
      sortOrder = sortOrder)
  }

  /** [[create]] with an EXPLICIT Iceberg schema — the authoring path for
    * types a Spark DataFrame schema cannot express (V3 geometry/geography:
    * the frame carries WKB binary, the table schema carries the geo type).
    * The frame's column names and physical Spark types must match the
    * schema's projection. Types the V3 spec introduced force
    * format-version 3. */
  def createWithSchema(df: DataFrame, location: String, schema: Schema,
                       partitionBy: Seq[(String, Transform)] = Nil,
                       properties: Map[String, String] = Map.empty,
                       sortBy: Seq[String] = Nil): IcebergTable = {
    val target = SchemaConv.toSparkSchema(schema)
    require(df.schema.fields.map(f => (f.name, f.dataType)).sameElements(
      target.fields.map(f => (f.name, f.dataType))),
      s"frame schema ${df.schema.simpleString} does not match the table " +
        s"schema's Spark projection ${target.simpleString}")
    val spec = PartitionSpec(0, partitionBy.zipWithIndex.map { case ((src, t), i) =>
      val f = schema.findFieldByName(src).getOrElse(
        throw new IllegalArgumentException(s"partition source column '$src' not found"))
      f.fieldType match {
        case _: GeometryT | _: GeographyT | VariantT | UnknownT =>
          throw new IllegalArgumentException(
            s"cannot partition by ${f.fieldType.repr} column '$src': the V3 " +
              "spec defines no partition transforms for it")
        case _ =>
      }
      PartitionField(f.id, PartitionSpec.PartitionDataIdStart + i,
        partName(src, t), t)
    })
    val needsV3 = schema.struct.fields.exists(f => f.fieldType match {
      case _: GeometryT | _: GeographyT | VariantT | UnknownT |
           TimestampNsT | TimestampTzNsT => true
      case _ => false
    })
    commit(df, location, schema, spec, properties, version = 1,
      parentSnapshot = None, existingEntries = Nil, existingManifests = Nil,
      sequenceNumber = 1, sortOrder = sortOrderFor(schema, sortBy),
      minFormatVersion = if (needsV3) 3 else 2)
  }

  private def sortOrderFor(schema: Schema, sortBy: Seq[String]): SortOrder =
    if (sortBy.isEmpty) SortOrder.unsorted
    else SortOrder(1, sortBy.map { c =>
      val f = schema.findFieldByName(c).getOrElse(
        throw new IllegalArgumentException(s"sort column '$c' not found"))
      SortField(f.id, IdentityTransform, SortAsc, NullsFirst)
    })

  /** Overwrite (INSERT OVERWRITE / truncate-then-write): the new snapshot's
    * manifest list starts empty — previous files remain reachable only
    * through time travel. */
  def overwrite(table: IcebergTable, df: DataFrame): IcebergTable = {
    val version = table.loadedVersion + 1
    val t = commit(df, table.location, table.schema, table.spec, table.properties,
      version, table.currentSnapshot, Nil, Nil,
      table.metadata.lastSequenceNumber + 1)
    val md = t.metadata
    writeMetadata(table.location, md.copy(snapshots = md.snapshots.init :+
      md.snapshots.last.copy(summary = Some(SnapshotSummary(OpOverwrite)))),
      currentVersion(table.location) + 1)
    IcebergTables.load(table.location)
  }

  /** Append a snapshot: new files join the previous snapshot's manifests.
    * A frame missing schema columns is aligned first — each absent column
    * fills with its V3 `write-default` when declared, null otherwise. */
  def append(table: IcebergTable, df: DataFrame): IcebergTable = {
    val prevManifests = liveManifests(table.currentSnapshot.toSeq.flatMap { s =>
      ManifestIO.readManifestList(table.io.open(s.manifestList))
    })
    val version = table.loadedVersion + 1
    commit(alignForWrite(df, table.schema), table.location, table.schema,
      table.spec, table.properties,
      version, table.currentSnapshot, Nil, prevManifests,
      table.metadata.lastSequenceNumber + 1)
  }

  /** Align a write frame whose columns are a SUBSET of the schema: absent
    * columns fill with their `write-default` (V3) or null, present columns
    * reorder and cast to the table's types. The SINGLE fill
    * implementation — the DSv2 write path delegates here, so SQL INSERT
    * and DataFrame append can never fill different values for the same
    * omitted column. Frames with exactly the schema's column order pass
    * through untouched; non-subset frames return unchanged for the caller
    * to reject or align positionally. */
  private[spark] def alignForWrite(df: DataFrame, schema: Schema): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val target = SchemaConv.toSparkSchema(schema)
    if (df.schema.fieldNames.sameElements(target.fieldNames)) return df
    val dataNames = df.schema.fieldNames.toSet
    if (!dataNames.subsetOf(target.fieldNames.toSet)) return df
    df.select(target.fields.toIndexedSeq.map { f =>
      if (dataNames.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else SchemaConv.writeDefaultOf(f) match {
        case Some((typ, l)) => SchemaConv.literalColumn(typ, l).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  /** Positional MoR delete: rows of `table` matching `predicate` become
    * (file_path, pos) tombstones in a delete manifest — no data rewrite. */
  def deleteWhere(table: IcebergTable, spark: org.apache.spark.sql.SparkSession,
                  predicate: Column): IcebergTable = {
    // V3 forbids positional delete FILES (and readers ignore them for
    // DV-bearing files — writing one would silently drop the delete)
    if (table.metadata.formatVersion >= 3)
      return deleteWhereDv(table, spark, predicate)
    val seq = table.metadata.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val version = table.loadedVersion + 1
    val metaDir = new File(table.location, "metadata"); metaDir.mkdirs()
    val delDir = new File(table.location, s"data/deletes-$snapId")

    // compute tombstones with one distributed scan over current data;
    // provenance comes from the scan itself (the `_metadata` pseudo-column
    // would not resolve above MoR anti-joins when deletes already exist)
    val scan = table.newScan()
    val df = scan.toDF(spark, keepProvenance = true)
      .filter(predicate)
      .select(col("__path").as("file_path"), col("__pos").as("pos"))
      .orderBy("file_path", "pos")
    df.write.parquet(delDir.getPath)

    val delFiles = listParquet(delDir).map { f =>
      statsFromFooter(f, scan.table.newScan().snapshotSchema,
        Map.empty, content = DataFileContent.PositionDeletes,
        overrideSchema = Some(posDeleteSchema))
    }
    val deleteEntries = delFiles.map(info => ManifestEntry(
      ManifestEntryStatus.Added, Some(snapId), Some(seq), Some(seq), info))

    val manifestFile = new File(metaDir, s"manifest-del-$snapId.avro")
    ManifestIO.writeManifest(manifestFile, deleteEntries, StructT(Nil))
    val delManifest = ManifestFile(
      path = manifestFile.getPath, length = manifestFile.length(),
      partitionSpecId = table.spec.specId, content = 1,
      sequenceNumber = seq, minSequenceNumber = seq, addedSnapshotId = snapId,
      addedFilesCount = deleteEntries.size, existingFilesCount = 0,
      deletedFilesCount = 0,
      addedRowsCount = delFiles.map(_.recordCount).sum,
      existingRowsCount = 0, deletedRowsCount = 0,
      partitions = Nil, formatVersion = 2)

    val prevManifests = liveManifests(table.currentSnapshot.toSeq.flatMap { s =>
      ManifestIO.readManifestList(table.io.open(s.manifestList))
    })
    val listFile = new File(metaDir, s"snap-$snapId.avro")
    ManifestIO.writeManifestList(listFile, prevManifests :+ delManifest)

    val snapshot = Snapshot(snapId, table.currentSnapshot.map(_.snapshotId), seq,
      System.currentTimeMillis(), listFile.getPath,
      Some(SnapshotSummary(OpDelete)), Some(table.schema.schemaId))
    writeMetadata(table.location, table.metadata.copy(
      lastSequenceNumber = seq,
      lastUpdatedMs = System.currentTimeMillis(),
      snapshots = table.metadata.snapshots :+ snapshot,
      currentSnapshotId = Some(snapId),
      snapshotLog = table.metadata.snapshotLog :+
        SnapshotLogEntry(snapId, System.currentTimeMillis()),
      refs = advRef(table.metadata.refs, TableMetadata.MainBranch, snapId)), version)
    IcebergTables.load(table.location)
  }

  /** Path as tombstone coordinates store it: no `file:`/`file://` scheme. */
  private def normFsPath(p: String): String = p.replaceFirst("^file:(//)?", "")

  /** V3 deletion-vector MoR delete: rows matching `predicate` become
    * roaring-bitmap DELETION VECTORS in Puffin files — one blob per
    * touched data file, one Puffin container per write task — and the
    * table's format-version moves to 3 (DVs are a V3-only construct).
    *
    * Same plan shape as [[deleteWhere]]: ONE distributed scan computes the
    * (file, pos) tombstones, then a shuffle on file_path co-locates each
    * data file's positions in one task, which serializes them as a single
    * bitmap (a DV is per-file by definition, so the grouping is exact and
    * the blob write is single-pass). Per the V3 spec the new DV for a file
    * MERGES that file's prior deletes — its previous DV (which is then
    * retired from the live set: at most one live DV per file) or, for a
    * DV-less file, its positional-parquet tombstones. */
  def deleteWhereDv(table: IcebergTable, spark: org.apache.spark.sql.SparkSession,
                    predicate: Column): IcebergTable = {
    import org.apache.spark.sql.functions.regexp_replace
    val seq = table.metadata.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val version = table.loadedVersion + 1
    val metaDir = new File(table.location, "metadata"); metaDir.mkdirs()
    val delDir = new File(table.location, s"data/dv-$snapId"); delDir.mkdirs()

    val scan = table.newScan()
    val newDead = scan.toDF(spark, keepProvenance = true)
      .filter(predicate)
      .select(regexp_replace(col("__path"), "^file:(//)?", "").as("file_path"),
        col("__pos").as("pos"))
    val (dead, priorDvs) = foldPriorDeletes(spark, newDead, scan.planFiles())
    val dvFiles = writeDvFiles(spark, dead, priorDvs, delDir, snapId, seq)
    commitDvSnapshot(table, Nil, dvFiles, _ => false, OpDelete, Map.empty,
      snapId, seq, version, metaDir)
  }

  /** Prior deletes of the files a new DV write touches, resolved exactly as
    * the READER would: a file that already has a deletion vector
    * contributes that DV (readers ignore its positional parquet tombstones
    * — those positions were merged when the DV was created, so folding them
    * again could only resurrect ignored coordinates); a DV-less file
    * contributes its live positional-parquet tombstones. Returns the
    * dead-coordinate frame with prior parquet positions folded in (narrow
    * (path, pos) pairs only) plus the per-file prior-DV coordinates for
    * [[writeDvFiles]] to union executor-side. */
  private def foldPriorDeletes(spark: org.apache.spark.sql.SparkSession,
                               newDead: DataFrame, tasks: Seq[FileScanTask])
      : (DataFrame, Map[String, Seq[(String, Long, Long)]]) = {
    import org.apache.spark.sql.functions.regexp_replace
    val priorDvs: Map[String, Seq[(String, Long, Long)]] = tasks.map { t =>
      normFsPath(t.file.path) -> t.deleteFiles.filter(_.isDeletionVector)
        .map(d => (normFsPath(d.path), d.contentOffset.get,
          d.contentSizeInBytes.get))
    }.filter(_._2.nonEmpty).toMap
    val priorPaths = tasks.flatMap { t =>
      if (priorDvs.contains(normFsPath(t.file.path))) Nil
      else t.deleteFiles.filter(d =>
        d.content == DataFileContent.PositionDeletes && !d.isDeletionVector)
        .map(_.path)
    }.distinct
    val dead =
      if (priorPaths.isEmpty) newDead
      else {
        import spark.implicits._
        // only positions of files the new delete touches need re-homing
        // into DVs; untouched files keep their parquet tombstones (readers
        // keep honoring them — only DV'd files ignore parquet)
        val prior = spark.read.parquet(priorPaths: _*)
          .select(regexp_replace(col("file_path"), "^file:(//)?", "")
            .as("file_path"), col("pos"))
          .join(newDead.select(col("file_path")).distinct(), Seq("file_path"),
            "left_semi")
        // a shared tombstone parquet can also carry positions of DV-bearing
        // files; those are reader-ignored dead weight — never fold them
        val pruned =
          if (priorDvs.isEmpty) prior
          else prior.join(
            org.apache.spark.sql.functions.broadcast(
              priorDvs.keys.toSeq.toDF("file_path")),
            Seq("file_path"), "left_anti")
        newDead.unionAll(pruned)
      }
    (dead, priorDvs)
  }

  /** Distributed deletion-vector production shared by [[deleteWhereDv]],
    * [[commitDeltaDv]] and [[upgradeFormatVersion]]: shuffle the dead
    * (file_path, pos) coordinates once on file_path so each data file's
    * positions land in ONE task, union in the prior deletion vector(s) of
    * any file being superseded (the V3 merge rule), and write one Puffin
    * container per task with one deletion-vector-v1 blob per data file.
    * Only narrow (path, pos) pairs ride the shuffle; the returned manifest
    * rows are one per touched file — metadata-sized. */
  private def writeDvFiles(spark: org.apache.spark.sql.SparkSession,
                           dead: DataFrame,
                           priorDvs: Map[String, Seq[(String, Long, Long)]],
                           delDir: File, snapId: Long, seq: Long)
      : Seq[DataFileInfo] = {
    import spark.implicits._
    val dvInfos: Seq[(String, String, Long, Long, Long, Long)] = dead
      .repartition(col("file_path"))
      .sortWithinPartitions("file_path", "pos")
      .as[(String, Long)]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          // one Puffin container per task, one DV blob per data file
          val byFile = scala.collection.mutable.LinkedHashMap[String,
            org.roaringbitmap.longlong.Roaring64NavigableMap]()
          it.foreach { case (f, p) =>
            byFile.getOrElseUpdate(f,
              new org.roaringbitmap.longlong.Roaring64NavigableMap(false))
              .addLong(p)
          }
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val puffin = new File(delDir, f"dv-$pid%05d.puffin").getPath
          val blobs = byFile.toSeq.map { case (target, bm) =>
            priorDvs.getOrElse(target, Nil).foreach { case (path, off, len) =>
              bm.or(graft.core.Puffin.readDvBlob(
                graft.core.Puffin.readBlob(path, off, len)))
            }
            val bytes = graft.core.Puffin.dvBlobBytesOf(bm)
            (bytes, graft.core.Puffin.BlobMetadata(
              graft.core.Puffin.DeletionVectorV1, fields = Nil,
              snapshotId = snapId, sequenceNumber = seq, offset = 0, length = 0,
              properties = Map("referenced-data-file" -> target,
                "cardinality" -> bm.getLongCardinality.toString)))
          }
          val metas = graft.core.Puffin.write(puffin, blobs)
          val size = new File(puffin).length()
          metas.iterator.map { m =>
            (puffin, m.properties("referenced-data-file"),
              m.offset, m.length, m.properties("cardinality").toLong, size)
          }
        }
      }.collect().toSeq // one row per touched data file: metadata-sized

    dvDataFiles(dvInfos)
  }

  /** Manifest rows for freshly-written DV blobs: (puffin path, referenced
    * data file, blob offset, blob length, cardinality, container size). */
  private def dvDataFiles(
      dvInfos: Seq[(String, String, Long, Long, Long, Long)])
      : Seq[DataFileInfo] =
    dvInfos.map { case (puffin, target, off, len, card, size) =>
      DataFileInfo(
        content = DataFileContent.PositionDeletes, path = puffin,
        format = "PUFFIN", partition = Map.empty, recordCount = card,
        fileSizeInBytes = size, columnSizes = Map.empty,
        valueCounts = Map.empty, nullValueCounts = Map.empty,
        nanValueCounts = Map.empty, lowerBounds = Map.empty,
        upperBounds = Map.empty, splitOffsets = Nil, equalityIds = Nil,
        sortOrderId = None, referencedDataFile = Some(target),
        contentOffset = Some(off), contentSizeInBytes = Some(len))
    }

  /** DV maintenance (`CALL graft.system.rewrite_deletion_vectors('db.t')`):
    * every MoR delete commit on a V3 table writes NEW Puffin containers for
    * the files it touches (merging each file's prior DV, which retires),
    * so a stream of small deletes fragments the live deletion vectors
    * across many tiny containers — and the superseded blobs keep occupying
    * bytes inside containers that still hold one live blob. This CALL
    * consolidates: the live DV set (resolved exactly as a reader resolves
    * it, so DVs of dead data files drop out) is re-encoded into
    * size-targeted containers, committed as ONE replace snapshot that
    * retires every prior DV entry. Reads are identical before and after;
    * the old Puffin files become unreferenced once pre-rewrite snapshots
    * expire (`expire_snapshots` / `remove_orphan_files` sweep them — they
    * are ordinary delete-manifest entries).
    *
    * Scale shape: only metadata-sized (target, src, offset, length) rows
    * ride the Spark job; blob BYTES are read, validated (decode +
    * re-encode canonicalizes the roaring encoding) and written
    * executor-side, many blobs per output container.
    *
    * Returns (live DV blobs rewritten, containers before, containers
    * after). No-op when the live set already lives in a single container
    * with no dead weight. */
  def rewriteDeletionVectors(table: IcebergTable,
                             spark: org.apache.spark.sql.SparkSession,
                             restCommit: Option[(graft.catalog.RestCatalog,
                               Seq[String], graft.catalog.LoadedTable)] = None)
      : (IcebergTable, Int, Int, Int) = {
    val snap = table.currentSnapshot.getOrElse(return (table, 0, 0, 0))
    // the live DV per data file, exactly as the reader resolves it
    val live: Seq[(String, String, Long, Long)] =
      table.newScan().planFiles().flatMap { t =>
        t.deleteFiles.filter(_.isDeletionVector).map(d =>
          (normFsPath(t.file.path), d.path, d.contentOffset.get,
            d.contentSizeInBytes.get))
      }.distinct
    // every DV entry still live in the manifests — includes DANGLING DVs
    // whose referenced data file left the live set (their entries survive
    // the data file's removal; readers just never consult them)
    val manifests = ManifestIO.readManifestList(table.io.open(snap.manifestList))
    val allDvEntries = manifests.filter(_.content == 1).flatMap(m =>
      ManifestIO.readManifestEntries(table.io.open(m.path), m,
        discardDeleted = true)).filter(_.dataFile.isDeletionVector)
    val containersBefore = allDvEntries.map(_.dataFile.path).distinct.size
    if (allDvEntries.isEmpty) return (table, 0, 0, 0)
    // optimal already: one container, every blob in it live
    if (containersBefore <= 1 && allDvEntries.size == live.size)
      return (table, 0, containersBefore, containersBefore)

    val seq = table.metadata.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val version = table.loadedVersion + 1
    val metaDir = new File(table.location, "metadata"); metaDir.mkdirs()
    val delDir = new File(table.location, s"data/dv-rw-$snapId"); delDir.mkdirs()

    val dvInfos: Seq[(String, String, Long, Long, Long, Long)] =
      if (live.isEmpty) Nil
      else {
        import spark.implicits._
        // one output container per ~4k blobs keeps containers near the
        // manifest-target sweet spot without a byte-level size estimate
        val parts = math.max(1, math.ceil(live.size / 4096.0).toInt)
        live.toDF("target", "src", "off", "len")
          .repartitionByRange(parts, col("target"))
          .sortWithinPartitions("target")
          .as[(String, String, Long, Long)]
          .mapPartitions { it =>
            val rows = it.toArray
            if (rows.isEmpty) Iterator.empty
            else {
              val pid = org.apache.spark.TaskContext.getPartitionId()
              val puffin = new File(delDir, f"dv-rw-$pid%05d.puffin").getPath
              val blobs = rows.toSeq.map { case (target, src, off, len) =>
                val bm = graft.core.Puffin.readDvBlob(
                  graft.core.Puffin.readBlob(src, off, len))
                (graft.core.Puffin.dvBlobBytesOf(bm),
                  graft.core.Puffin.BlobMetadata(
                    graft.core.Puffin.DeletionVectorV1, fields = Nil,
                    snapshotId = snapId, sequenceNumber = seq,
                    offset = 0, length = 0,
                    properties = Map("referenced-data-file" -> target,
                      "cardinality" -> bm.getLongCardinality.toString)))
              }
              val metas = graft.core.Puffin.write(puffin, blobs)
              val size = new File(puffin).length()
              metas.iterator.map { m =>
                (puffin, m.properties("referenced-data-file"),
                  m.offset, m.length, m.properties("cardinality").toLong, size)
              }
            }
          }.collect().toSeq // one row per live DV: metadata-sized
      }

    restCommit match {
      case Some((rc, id, basedOn)) =>
        val (snapshot, _) = stageDvSnapshot(table, Nil, dvDataFiles(dvInfos),
          alsoSuperseded = _.isDeletionVector, OpReplace,
          Map("deletion-vectors-rewritten" -> allDvEntries.size.toString),
          snapId, seq, metaDir)
        val change = restChangeFor(basedOn.metadata, id, snapshot)
        val out = restTableOf(
          rc.commitTable(id, change.requirements, change.updates), rc)
        (out, live.size, containersBefore, dvInfos.map(_._1).distinct.size)
      case None =>
        val out = commitDvSnapshot(table, Nil, dvDataFiles(dvInfos),
          alsoSuperseded = _.isDeletionVector, OpReplace,
          Map("deletion-vectors-rewritten" -> allDvEntries.size.toString),
          snapId, seq, version, metaDir)
        (out, live.size, containersBefore, dvInfos.map(_._1).distinct.size)
    }
  }

  /** Rewrite delete manifests so superseded entries leave the live set: V3
    * allows at most ONE live deletion vector per data file, so a commit
    * that writes a new DV for a file must retire the file's previous DV
    * (whose positions it merged); format upgrade likewise retires every
    * positional-parquet tombstone it re-homed. Kept entries carry as
    * EXISTING, superseded ones stay in the rewritten manifest as
    * DELETED-status entries recording this snapshot (the
    * [[stageReplaceSnapshot]] forensics convention); a manifest with
    * nothing superseded carries by reference, and one with nothing live
    * left is dropped by [[liveManifests] ] at the NEXT commit. */
  private def supersedeDeleteEntries(table: IcebergTable,
                                     deleteManifests: Seq[ManifestFile],
                                     superseded: DataFileInfo => Boolean,
                                     snapId: Long, seq: Long,
                                     metaDir: File): Seq[ManifestFile] = {
    val md = table.metadata
    deleteManifests.zipWithIndex.map { case (m, i) =>
      val es = ManifestIO.readManifestEntries(table.io.open(m.path), m)
      val (gone, kept0) = es.partition(e => superseded(e.dataFile))
      if (gone.isEmpty) m
      else {
        val kept = kept0.map(_.copy(status = ManifestEntryStatus.Existing))
        val removed = gone.map(_.copy(status = ManifestEntryStatus.Deleted,
          snapshotId = Some(snapId)))
        val partType = md.partitionSpecs.find(_.specId == m.partitionSpecId)
          .map(_.partitionType(table.schema)).getOrElse(StructT(Nil))
        val mf = new File(metaDir, s"manifest-del-ss-$snapId-$i.avro")
        ManifestIO.writeManifest(mf, kept ++ removed, partType)
        ManifestFile(
          path = mf.getPath, length = mf.length(),
          partitionSpecId = m.partitionSpecId, content = 1,
          sequenceNumber = seq,
          minSequenceNumber =
            (kept ++ removed).flatMap(_.sequenceNumber).minOption.getOrElse(seq),
          addedSnapshotId = snapId,
          addedFilesCount = 0, existingFilesCount = kept.size,
          deletedFilesCount = removed.size,
          addedRowsCount = 0,
          existingRowsCount = kept.map(_.dataFile.recordCount).sum,
          deletedRowsCount = removed.map(_.dataFile.recordCount).sum,
          partitions = partitionSummaries(kept, partType), formatVersion = 2)
      }
    }
  }

  /** Assemble + commit ONE snapshot carrying appended data files, new
    * deletion vectors, and the retirement of whatever those DVs supersede
    * (prior DVs of the touched files always; `alsoSuperseded` lets format
    * upgrade retire parquet tombstones too). Moves format-version to 3 —
    * every caller is producing a V3 construct. */
  private def commitDvSnapshot(table: IcebergTable,
                               added: Seq[graft.spark.CowFileOut],
                               dvFiles: Seq[DataFileInfo],
                               alsoSuperseded: DataFileInfo => Boolean,
                               op: SnapshotOp, extraSummary: Map[String, String],
                               snapId: Long, seq: Long, version: Int,
                               metaDir: File): IcebergTable = {
    val md = table.metadata
    val (snapshot, nextRowId) = stageDvSnapshot(table, added, dvFiles,
      alsoSuperseded, op, extraSummary, snapId, seq, metaDir)
    val now = snapshot.timestampMs
    writeMetadata(table.location, md.copy(
      formatVersion = 3, // DVs are a V3 construct; metadata serializes V3
      lastSequenceNumber = seq, lastUpdatedMs = now,
      snapshots = md.snapshots :+ snapshot,
      currentSnapshotId = Some(snapId),
      snapshotLog = md.snapshotLog :+ SnapshotLogEntry(snapId, now),
      refs = advRef(md.refs, TableMetadata.MainBranch, snapId),
      nextRowId = nextRowId), version)
    IcebergTables.load(table.location)
  }

  /** The staging body of [[commitDvSnapshot]] (manifests + manifest list
    * on disk, no metadata commit) — shared with the REST plane
    * ([[commitDeltaDvRest]]). Returns the snapshot and the V3
    * `next-row-id` the commit must advance to. */
  private def stageDvSnapshot(table: IcebergTable,
                              added: Seq[graft.spark.CowFileOut],
                              dvFiles: Seq[DataFileInfo],
                              alsoSuperseded: DataFileInfo => Boolean,
                              op: SnapshotOp, extraSummary: Map[String, String],
                              snapId: Long, seq: Long,
                              metaDir: File): (Snapshot, Option[Long]) = {
    val md = table.metadata
    val partType = table.spec.partitionType(table.schema)
    val addedEntries0 = added.map { f =>
      ManifestEntry(ManifestEntryStatus.Added, Some(snapId), Some(seq), Some(seq),
        statsFromFooter(new File(f.path), table.schema,
          f.partition.filter(_._2 != null), DataFileContent.Data, None, f.nanCounts))
    }
    // the committed metadata is V3 (DVs force it) even when the loaded
    // table was not yet — lineage must be assigned under the TARGET version
    val lineage = assignLineage(md.copy(formatVersion = 3), addedEntries0)
    val addedEntries = lineage.entries
    val addManifest =
      if (addedEntries.isEmpty) None
      else {
        val mf = new File(metaDir, s"manifest-dv-add-$snapId.avro")
        ManifestIO.writeManifest(mf, addedEntries, partType)
        Some(ManifestFile(
          path = mf.getPath, length = mf.length(),
          partitionSpecId = table.spec.specId, content = 0,
          sequenceNumber = seq, minSequenceNumber = seq,
          addedSnapshotId = snapId,
          addedFilesCount = addedEntries.size, existingFilesCount = 0,
          deletedFilesCount = 0,
          addedRowsCount = addedEntries.map(_.dataFile.recordCount).sum,
          existingRowsCount = 0, deletedRowsCount = 0,
          partitions = partitionSummaries(addedEntries, partType),
          formatVersion = 2,
          firstRowId = lineage.manifestFirstRowId))
      }

    val dvEntries = dvFiles.map(info => ManifestEntry(
      ManifestEntryStatus.Added, Some(snapId), Some(seq), Some(seq), info))
    val dvManifest =
      if (dvEntries.isEmpty) None
      else {
        val mf = new File(metaDir, s"manifest-dv-$snapId.avro")
        ManifestIO.writeManifest(mf, dvEntries, StructT(Nil))
        Some(ManifestFile(
          path = mf.getPath, length = mf.length(),
          partitionSpecId = table.spec.specId, content = 1,
          sequenceNumber = seq, minSequenceNumber = seq, addedSnapshotId = snapId,
          addedFilesCount = dvEntries.size, existingFilesCount = 0,
          deletedFilesCount = 0,
          addedRowsCount = dvFiles.map(_.recordCount).sum,
          existingRowsCount = 0, deletedRowsCount = 0,
          partitions = Nil, formatVersion = 2))
      }

    val prevManifests = liveManifests(table.currentSnapshot.toSeq.flatMap { s =>
      ManifestIO.readManifestList(table.io.open(s.manifestList))
    })
    val (prevData, prevDelete) = prevManifests.partition(_.content == 0)
    val touched = dvFiles.flatMap(_.referencedDataFile).map(normFsPath).toSet
    val isSuperseded: DataFileInfo => Boolean = d =>
      (d.isDeletionVector &&
        touched(normFsPath(d.referencedDataFile.get))) || alsoSuperseded(d)
    val newDelete =
      supersedeDeleteEntries(table, prevDelete, isSuperseded, snapId, seq, metaDir)

    val listFile = new File(metaDir, s"snap-$snapId.avro")
    ManifestIO.writeManifestList(listFile,
      prevData ++ addManifest ++ newDelete ++ dvManifest)
    val now = System.currentTimeMillis()
    val snapshot = Snapshot(snapId, table.currentSnapshot.map(_.snapshotId), seq,
      now, listFile.getPath,
      Some(SnapshotSummary(op, Map(
        "added-data-files" -> addedEntries.size.toString,
        // added-records makes V3 lineage advance exact for the appends
        "added-records" ->
          addedEntries.map(_.dataFile.recordCount).sum.toString,
        "added-delete-files" -> dvEntries.size.toString,
        "added-position-deletes" -> dvFiles.map(_.recordCount).sum.toString,
        "deletion-vectors-added" -> dvEntries.size.toString) ++ extraSummary)),
      Some(table.schema.schemaId),
      firstRowId = lineage.snapshotFirstRowId)
    (snapshot, lineage.nextRowId)
  }

  /** V3 variant of [[commitDelta]] — SQL MoR DML on a format-version-3
    * table: the task-written positional tombstones are re-homed into
    * deletion vectors at commit time. V3 forbids positional delete FILES —
    * and concretely, a reader ignores them for any file that already has a
    * DV, so committing them on a v3 table would SILENTLY DROP the delete.
    * Costs one extra distributed pass over O(changed rows): read the task
    * tombstones back, fold in each touched file's prior deletes
    * ([[foldPriorDeletes]]), write one DV per file, and commit DVs +
    * appends in ONE snapshot under the same conflict pin as
    * [[commitDelta]]. */
  def commitDeltaDv(location: String, added: Seq[graft.spark.CowFileOut],
                    posDeleteFiles: Seq[String],
                    expectedVersion: Option[Int] = None,
                    scannedSnapshotId: Option[Long] = None,
                    isolation: String = "serializable"): IcebergTable = {
    if (posDeleteFiles.isEmpty)
      return commitDelta(location, added, Nil, expectedVersion,
        scannedSnapshotId, isolation)
    val spark = org.apache.spark.sql.SparkSession.active
    val table = IcebergTables.load(location)
    expectedVersion.foreach { v =>
      if (table.loadedVersion != v) {
        val appendOnly = isolation.equalsIgnoreCase("snapshot") &&
          appendOnlySince(table, scannedSnapshotId)
        if (!appendOnly)
          throw new CommitConflictException(table.loadedVersion, location)
      }
    }
    import org.apache.spark.sql.functions.regexp_replace
    val seq = table.metadata.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val version = table.loadedVersion + 1
    val metaDir = new File(location, "metadata"); metaDir.mkdirs()
    val delDir = new File(location, s"data/dv-$snapId"); delDir.mkdirs()

    val newDead = spark.read.parquet(posDeleteFiles: _*)
      .select(regexp_replace(col("file_path"), "^file:(//)?", "")
        .as("file_path"), col("pos"))
    val (dead, priorDvs) =
      foldPriorDeletes(spark, newDead, table.newScan().planFiles())
    val dvFiles = writeDvFiles(spark, dead, priorDvs, delDir, snapId, seq)
    val committed = commitDvSnapshot(table, added, dvFiles, _ => false,
      if (added.isEmpty) OpDelete else OpOverwrite, Map.empty,
      snapId, seq, version, metaDir)
    // the task tombstone parquet files were commit intermediates only
    posDeleteFiles.foreach(p => new File(p).delete())
    committed
  }

  /** Upgrade a table's format-version in place. 1→2 is a metadata-only
    * bump. →3 additionally re-homes every LIVE positional-parquet tombstone
    * into deletion vectors (V3 tables must not carry position delete
    * files): one distributed pass groups live tombstone coordinates by data
    * file — dangling tombstones of vanished files drop; a file that already
    * has a DV keeps it untouched, and its parquet tombstone entries (dead
    * weight readers already ignore) retire WITHOUT folding, so reader
    * semantics are preserved bit-for-bit — then ONE snapshot retires all
    * parquet tombstone entries and adds the DVs. Downgrades refuse. */
  def upgradeFormatVersion(table: IcebergTable,
                           spark: org.apache.spark.sql.SparkSession,
                           target: Int): IcebergTable = {
    import org.apache.spark.sql.functions.regexp_replace
    val md = table.metadata
    require(target >= 2 && target <= 3,
      s"unsupported format-version $target (this engine writes 2 and 3)")
    require(target >= md.formatVersion,
      s"cannot downgrade format-version ${md.formatVersion} -> $target")
    if (target == md.formatVersion) return table
    val tasks =
      if (table.currentSnapshot.isEmpty) Nil else table.newScan().planFiles()
    val posPaths = tasks.flatMap(_.deleteFiles.filter(d =>
      d.content == DataFileContent.PositionDeletes && !d.isDeletionVector)
      .map(_.path)).distinct
    if (target == 2 || posPaths.isEmpty) {
      // nothing to re-home: a pure metadata bump, no new snapshot
      writeMetadata(table.location, md.copy(formatVersion = target,
        lastUpdatedMs = System.currentTimeMillis()), table.loadedVersion + 1)
      return IcebergTables.load(table.location)
    }
    val seq = md.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val version = table.loadedVersion + 1
    val metaDir = new File(table.location, "metadata"); metaDir.mkdirs()
    val delDir = new File(table.location, s"data/dv-$snapId"); delDir.mkdirs()
    val dvFiles = rehomeDvFiles(table, spark, tasks, posPaths, delDir,
      snapId, seq)
    commitDvSnapshot(table, Nil, dvFiles,
      alsoSuperseded = d =>
        d.content == DataFileContent.PositionDeletes && !d.isDeletionVector,
      op = OpReplace,
      extraSummary = Map("format-version" -> "3",
        "position-delete-files-removed" -> posPaths.size.toString),
      snapId, seq, version, metaDir)
  }

  /** Shared staging of the V2→V3 tombstone re-home ([[upgradeFormatVersion]]
    * / [[upgradeFormatVersionRest]]): group live tombstone coordinates by
    * data file — dangling tombstones of vanished files drop; a file that
    * already has a DV keeps it untouched and its parquet tombstone entries
    * (dead weight readers already ignore) retire WITHOUT folding — then
    * write one DV per touched file. */
  private def rehomeDvFiles(table: IcebergTable,
                            spark: org.apache.spark.sql.SparkSession,
                            tasks: Seq[graft.core.FileScanTask],
                            posPaths: Seq[String],
                            delDir: File, snapId: Long, seq: Long)
      : Seq[DataFileInfo] = {
    import org.apache.spark.sql.functions.regexp_replace
    val dvByFile = tasks.filter(_.deleteFiles.exists(_.isDeletionVector))
      .map(t => normFsPath(t.file.path)).toSet
    val liveNoDv = tasks.map(t => normFsPath(t.file.path))
      .filterNot(dvByFile).distinct
    val dead = filterLiveTombstones(
      spark.read.parquet(posPaths: _*)
        .select(regexp_replace(col("file_path"), "^file:(//)?", "")
          .as("file_path"), col("pos")),
      liveNoDv, spark)
    writeDvFiles(spark, dead, Map.empty, delDir, snapId, seq)
  }

  /** Equality MoR delete: any row whose `equalityCols` tuple appears in
    * `keys` is deleted — no data rewrite, no scan at commit time at all
    * (the delete applies table-wide to earlier-sequence files). */
  def deleteEquality(table: IcebergTable, keys: DataFrame,
                     equalityCols: Seq[String]): IcebergTable = {
    val seq = table.metadata.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val version = table.loadedVersion + 1
    val metaDir = new File(table.location, "metadata"); metaDir.mkdirs()
    val delManifest = writeEqDeleteManifest(table, keys, equalityCols, snapId, seq)
    val prevManifests = liveManifests(table.currentSnapshot.toSeq.flatMap { s =>
      ManifestIO.readManifestList(table.io.open(s.manifestList))
    })
    val listFile = new File(metaDir, s"snap-$snapId.avro")
    ManifestIO.writeManifestList(listFile, prevManifests :+ delManifest)
    val now = System.currentTimeMillis()
    val snapshot = Snapshot(snapId, table.currentSnapshot.map(_.snapshotId), seq,
      now, listFile.getPath, Some(SnapshotSummary(OpDelete)),
      Some(table.schema.schemaId))
    writeMetadata(table.location, table.metadata.copy(
      lastSequenceNumber = seq, lastUpdatedMs = now,
      snapshots = table.metadata.snapshots :+ snapshot,
      currentSnapshotId = Some(snapId),
      snapshotLog = table.metadata.snapshotLog :+ SnapshotLogEntry(snapId, now),
      refs = advRef(table.metadata.refs, TableMetadata.MainBranch, snapId)), version)
    IcebergTables.load(table.location)
  }

  /** Write `keys` as equality-delete parquet + its content=1 manifest for
    * snapshot `snapId` at sequence `seq`; shared by [[deleteEquality]]
    * (own commit) and [[replaceEquality]] (same commit as the data). */
  private def writeEqDeleteManifest(table: IcebergTable, keys: DataFrame,
                                    equalityCols: Seq[String],
                                    snapId: Long, seq: Long): ManifestFile = {
    val metaDir = new File(table.location, "metadata"); metaDir.mkdirs()
    val delDir = new File(table.location, s"data/eqdeletes-$snapId")
    keys.select(equalityCols.map(col): _*).distinct().write.parquet(delDir.getPath)
    val eqIds = equalityCols.map(c => table.schema.findFieldByName(c).getOrElse(
      throw new IllegalArgumentException(s"equality column '$c' not in schema")).id)
    val delFiles = listParquet(delDir).map { f =>
      statsFromFooter(f, table.schema, Map.empty,
        content = graft.core.DataFileContent.EqualityDeletes, None)
        .copy(equalityIds = eqIds)
    }
    val entries = delFiles.map(info => ManifestEntry(
      ManifestEntryStatus.Added, Some(snapId), Some(seq), Some(seq), info))
    val manifestFile = new File(metaDir, s"manifest-eqdel-$snapId.avro")
    ManifestIO.writeManifest(manifestFile, entries, StructT(Nil))
    ManifestFile(
      path = manifestFile.getPath, length = manifestFile.length(),
      partitionSpecId = table.spec.specId, content = 1,
      sequenceNumber = seq, minSequenceNumber = seq, addedSnapshotId = snapId,
      addedFilesCount = entries.size, existingFilesCount = 0, deletedFilesCount = 0,
      addedRowsCount = delFiles.map(_.recordCount).sum,
      existingRowsCount = 0, deletedRowsCount = 0,
      partitions = Nil, formatVersion = 2)
  }

  /** ATOMIC retract-and-replace: ONE snapshot carrying an equality-delete
    * manifest on `keyCols` plus the appended `rows` — the Flink-CDC-style
    * MoR upsert commit. The delete applies only to files with a STRICTLY
    * SMALLER sequence number (Iceberg's rule), so the same-sequence
    * appended rows are exempt by construction. Unlike [[upsert]] (two
    * commits), a reader can never observe the retracted-but-not-replaced
    * intermediate state, and a crash leaves either the old or the new
    * state — the primitive an incrementally-maintained view needs.
    * `extraProperties` merge into table properties in the same commit
    * (e.g. a maintenance watermark: state and bookkeeping move together
    * or not at all). */
  def replaceEquality(table: IcebergTable, keys: DataFrame,
                      keyCols: Seq[String], rows: DataFrame,
                      extraProperties: Map[String, String] = Map.empty)
      : IcebergTable = {
    val seq = table.metadata.lastSequenceNumber + 1
    val prevManifests = liveManifests(table.currentSnapshot.toSeq.flatMap { s =>
      ManifestIO.readManifestList(table.io.open(s.manifestList))
    })
    commit(rows, table.location, table.schema, table.spec,
      table.properties ++ extraProperties, table.loadedVersion + 1,
      table.currentSnapshot, Nil, prevManifests, seq,
      extraManifestsFor =
        snapId => Seq(writeEqDeleteManifest(table, keys, keyCols, snapId, seq)),
      op = OpOverwrite)
  }

  /** MoR UPDATE: rows matching `predicate` get `assignments` applied — the
    * originals become positional tombstones, the rewritten rows are
    * appended. Only the MATCHING rows are ever rewritten; untouched data
    * files are untouched. (Two commits: delete, then append.)
    *
    * The updated projection is planned against the PRE-delete snapshot
    * (planFiles resolves eagerly), so the lazily-executed append still
    * reads the original rows after the tombstones commit. */
  def updateWhere(table: IcebergTable, spark: org.apache.spark.sql.SparkSession,
                  predicate: Column,
                  assignments: Map[String, Column]): IcebergTable = {
    assignments.keys.foreach(c => require(
      table.schema.findFieldByName(c).isDefined, s"unknown column '$c'"))
    val updated = table.newScan().toDF(spark)
      .filter(predicate)
      .select(table.schema.fields.map(f =>
        assignments.getOrElse(f.name, col(f.name)).as(f.name)): _*)
    val afterDelete = deleteWhere(table, spark, predicate)
    append(afterDelete, updated)
  }

  /** Upsert by key (MERGE's matched-update + not-matched-insert for keyed
    * tables): existing rows with a key present in `rows` are equality-
    * tombstoned, then `rows` is appended. No scan at delete time, one
    * distributed write — metadata-sized commits regardless of table size. */
  def upsert(table: IcebergTable, rows: DataFrame,
             keyCols: Seq[String]): IcebergTable = {
    val afterDelete = deleteEquality(table, rows.select(keyCols.map(col): _*), keyCols)
    append(afterDelete, rows)
  }

  /** Merge-on-read row-level commit: ONE atomic snapshot carrying the
    * positional-tombstone files AND the appended data files of a SQL
    * UPDATE / MERGE / DELETE running under `write.*.mode = merge-on-read`.
    *
    * Metadata work is O(written files): every previous manifest carries
    * over BY REFERENCE; the tombstones get one new delete manifest
    * (content=1) and the appended rows one new data manifest — no data
    * file is read or rewritten. Both land at the same sequence number: the
    * tombstones apply to every earlier-or-equal-sequence data file whose
    * path they name (all strictly earlier here — the new files' paths
    * appear in no tombstone), so a reader sees exactly the post-DML state.
    *
    * `expectedVersion` pins the commit to the metadata version the
    * row-level scan read: the buffered (file, pos) coordinates are only
    * valid against that snapshot's files.
    *
    * Isolation (Iceberg's `write.<op>.isolation-level` semantics):
    * `serializable` (the default) conflicts on ANY concurrent commit;
    * `snapshot` tolerates concurrent PURE APPENDS — appended files
    * cannot contain any row this operation tombstoned or read (new
    * paths, and positional deletes only name pre-existing paths), so
    * committing on the moved base is exactly snapshot isolation. The
    * validation walks the snapshot parent chain from the current head
    * back to `scannedSnapshotId`, requires every intermediate commit be
    * an `append` under the SAME schema, and otherwise conflicts loudly
    * (a concurrent delete/rewrite may have removed rows this operation
    * re-appends — the lost-delete anomaly snapshot isolation forbids). */
  def commitDelta(location: String, added: Seq[graft.spark.CowFileOut],
                  posDeleteFiles: Seq[String],
                  expectedVersion: Option[Int] = None,
                  scannedSnapshotId: Option[Long] = None,
                  isolation: String = "serializable"): IcebergTable = {
    val table = IcebergTables.load(location)
    expectedVersion.foreach { v =>
      if (table.loadedVersion != v) {
        val appendOnly = isolation.equalsIgnoreCase("snapshot") &&
          appendOnlySince(table, scannedSnapshotId)
        if (!appendOnly)
          throw new CommitConflictException(table.loadedVersion, location)
      }
    }
    val md = table.metadata
    val snapshot = stageDeltaSnapshot(table, added, posDeleteFiles)
    writeMetadata(location, md.copy(
      lastSequenceNumber = snapshot.sequenceNumber,
      lastUpdatedMs = snapshot.timestampMs,
      nextRowId = nextRowIdAfter(md, snapshot),
      snapshots = md.snapshots :+ snapshot,
      currentSnapshotId = Some(snapshot.snapshotId),
      snapshotLog = md.snapshotLog :+
        SnapshotLogEntry(snapshot.snapshotId, snapshot.timestampMs),
      refs = advRef(md.refs, TableMetadata.MainBranch, snapshot.snapshotId)),
      table.loadedVersion + 1)
    IcebergTables.load(location)
  }

  /** Stage the MoR delta snapshot (manifests + manifest list on disk, no
    * metadata commit) — the body of [[commitDelta]], shared with the REST
    * plane ([[stageRestDeltaChange]]/[[RestTransaction.stageDelta]]). */
  private def stageDeltaSnapshot(table: IcebergTable,
                                 added: Seq[graft.spark.CowFileOut],
                                 posDeleteFiles: Seq[String]): Snapshot = {
    val md = table.metadata
    val location = table.location
    val seq = md.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val metaDir = new File(location, "metadata"); metaDir.mkdirs()
    val prevManifests = liveManifests(table.currentSnapshot.toSeq.flatMap { s =>
      ManifestIO.readManifestList(table.io.open(s.manifestList))
    })
    val partType = table.spec.partitionType(table.schema)

    val addedEntries0 = added.map { f =>
      ManifestEntry(ManifestEntryStatus.Added, Some(snapId), Some(seq), Some(seq),
        statsFromFooter(new File(f.path), table.schema,
          f.partition.filter(_._2 != null), DataFileContent.Data, None, f.nanCounts))
    }
    val lineage = assignLineage(md, addedEntries0)
    val addedEntries = lineage.entries
    val addManifest =
      if (addedEntries.isEmpty) None
      else {
        val mf = new File(metaDir, s"manifest-mor-$snapId.avro")
        ManifestIO.writeManifest(mf, addedEntries, partType)
        Some(ManifestFile(
          path = mf.getPath, length = mf.length(),
          partitionSpecId = table.spec.specId, content = 0,
          sequenceNumber = seq, minSequenceNumber = seq,
          addedSnapshotId = snapId,
          addedFilesCount = addedEntries.size, existingFilesCount = 0,
          deletedFilesCount = 0,
          addedRowsCount = addedEntries.map(_.dataFile.recordCount).sum,
          existingRowsCount = 0, deletedRowsCount = 0,
          partitions = partitionSummaries(addedEntries, partType),
          formatVersion = 2,
          firstRowId = lineage.manifestFirstRowId))
      }

    val delInfos = posDeleteFiles.map { p =>
      statsFromFooter(new File(p), table.schema, Map.empty,
        content = DataFileContent.PositionDeletes,
        overrideSchema = Some(posDeleteSchema))
    }
    val delManifest =
      if (delInfos.isEmpty) None
      else {
        val entries = delInfos.map(info => ManifestEntry(
          ManifestEntryStatus.Added, Some(snapId), Some(seq), Some(seq), info))
        val mf = new File(metaDir, s"manifest-mor-del-$snapId.avro")
        ManifestIO.writeManifest(mf, entries, StructT(Nil))
        Some(ManifestFile(
          path = mf.getPath, length = mf.length(),
          partitionSpecId = table.spec.specId, content = 1,
          sequenceNumber = seq, minSequenceNumber = seq,
          addedSnapshotId = snapId,
          addedFilesCount = entries.size, existingFilesCount = 0,
          deletedFilesCount = 0,
          addedRowsCount = delInfos.map(_.recordCount).sum,
          existingRowsCount = 0, deletedRowsCount = 0,
          partitions = Nil, formatVersion = 2))
      }

    val listFile = new File(metaDir, s"snap-$snapId.avro")
    ManifestIO.writeManifestList(listFile,
      prevManifests ++ addManifest ++ delManifest)
    val now = System.currentTimeMillis()
    val op = if (addedEntries.isEmpty) OpDelete else OpOverwrite
    Snapshot(snapId, table.currentSnapshot.map(_.snapshotId), seq,
      now, listFile.getPath,
      Some(SnapshotSummary(op, Map(
        "added-data-files" -> addedEntries.size.toString,
        // added-records makes nextRowIdAfter (and a REST server's V3
        // lineage advance) exact for the delta commit's appended rows
        "added-records" -> addedEntries.map(_.dataFile.recordCount).sum.toString,
        "added-delete-files" -> delInfos.size.toString,
        "added-position-deletes" -> delInfos.map(_.recordCount).sum.toString))),
      Some(table.schema.schemaId),
      firstRowId = lineage.snapshotFirstRowId)
  }

  /** Every commit between `sinceSnapshotId` and the current head is a
    * pure append under an unchanged schema — the condition under which a
    * positional-tombstone commit stays valid on the moved base. Walks
    * the parent chain (O(intermediate commits), metadata only). */
  private def appendOnlySince(table: IcebergTable,
                              sinceSnapshotId: Option[Long]): Boolean = {
    val byId = table.metadata.snapshots.map(s => s.snapshotId -> s).toMap
    var cur = table.currentSnapshot
    while (cur.isDefined && cur.map(_.snapshotId) != sinceSnapshotId) {
      val s = cur.get
      if (!s.summary.map(_.operation).contains(OpAppend)) return false
      if (s.schemaId.exists(id => id != table.schema.schemaId)) return false
      cur = s.parentSnapshotId.flatMap(byId.get)
    }
    // chain must actually REACH the scanned snapshot (a rollback or
    // expired lineage means the base is unrecognizable — conflict)
    cur.map(_.snapshotId) == sinceSnapshotId ||
      (cur.isEmpty && sinceSnapshotId.isEmpty)
  }

  /** Copy-on-write commit for row-level operations: atomically swap
    * `removedPaths` for `added` files (each with its partition tuple, as
    * derived row-wise by the task writers) in one OVERWRITE snapshot.
    *
    * Metadata work is O(affected files), not O(table): manifests whose
    * entries reference no removed path carry over BY REFERENCE in the new
    * manifest list (the files on disk are untouched); only manifests that
    * contain a removed file are rewritten — their kept entries become
    * EXISTING with their original sequence numbers, so older positional
    * deletes still apply to them — and the added files get one new
    * manifest. Delete manifests carry over untouched; tombstones
    * referencing removed files are inert (their file_path bounds can't
    * match the new files).
    *
    * `expectedVersion` pins the commit to the metadata version the
    * row-level scan read: if anything committed in between (e.g. a MoR
    * DELETE whose tombstones reference a replaced file — which this
    * rewrite would silently undo), the commit fails with
    * CommitConflictException instead of losing the concurrent write. */
  def replaceFiles(location: String, removedPaths: Set[String],
                   added: Seq[graft.spark.CowFileOut],
                   expectedVersion: Option[Int] = None,
                   touchedManifests: Option[Set[String]] = None): IcebergTable = {
    val table = IcebergTables.load(location)
    expectedVersion.foreach { v =>
      if (table.loadedVersion != v)
        throw new CommitConflictException(table.loadedVersion, location)
    }
    val md = table.metadata
    val snapshot = stageReplaceSnapshot(table, removedPaths, added, touchedManifests)
    writeMetadata(location, md.copy(
      lastSequenceNumber = snapshot.sequenceNumber,
      lastUpdatedMs = snapshot.timestampMs,
      snapshots = md.snapshots :+ snapshot,
      currentSnapshotId = Some(snapshot.snapshotId),
      snapshotLog = md.snapshotLog :+
        SnapshotLogEntry(snapshot.snapshotId, snapshot.timestampMs),
      refs = advRef(md.refs, TableMetadata.MainBranch, snapshot.snapshotId),
      nextRowId = nextRowIdAfter(md, snapshot)),
      table.loadedVersion + 1)
    IcebergTables.load(location)
  }

  /** Copy-on-write replace against a REST-catalog table: stage rewritten +
    * added manifests like the local path, then commit `add-snapshot` +
    * `set-snapshot-ref` through the catalog's `updateTable` route. The
    * branch-position guard plays the role [[replaceFiles]]' expectedVersion
    * pin plays locally: if main moved since the caller's scan, the server
    * answers 409 → [[graft.catalog.CommitConflictError]], and the caller
    * re-scans and retries. */
  def replaceFilesRest(catalog: graft.catalog.RestCatalog, identifier: Seq[String],
                       removedPaths: Set[String],
                       added: Seq[graft.spark.CowFileOut],
                       touchedManifests: Option[Set[String]] = None,
                       basedOn: Option[graft.catalog.LoadedTable] = None,
                       sortOrder: Option[SortOrder] = None)
      : graft.catalog.LoadedTable = {
    val (change, _) = stageRestReplaceChange(catalog, identifier,
      removedPaths, added, touchedManifests, basedOn, sortOrder)
    catalog.commitTable(identifier, change.requirements, change.updates)
  }

  /** How a sorted REST rewrite registers its order: reuse an IDENTICAL
    * already-registered order's id, else commit `add-sort-order` +
    * `set-default-sort-order(-1)` FIRST, in its own commit, and stamp
    * files with the id the SERVER assigned — ids can be reassigned on
    * conflict, and stamping a guessed id that a racing engine's different
    * order ends up owning would let SupportsReportOrdering claim the
    * WRONG ordering for these files. Once registered, an order's id is
    * immutable, so the stamp is safe. */
  private def registerSortOrderRest(catalog: graft.catalog.RestCatalog,
                                    identifier: Seq[String],
                                    md: TableMetadata,
                                    order: SortOrder): SortOrder =
    md.sortOrders.find(_.fields == order.fields) match {
      case Some(existing) =>
        if (md.defaultSortOrderId != existing.orderId)
          catalog.commitTable(identifier,
            Seq(graft.catalog.AssertTableUuid(md.tableUuid)),
            Seq(graft.catalog.SetDefaultSortOrder(existing.orderId)))
        existing
      case None =>
        val guess = order.copy(orderId =
          (md.sortOrders.map(_.orderId) :+ 0).max + 1)
        val committed = catalog.commitTable(identifier,
          Seq(graft.catalog.AssertTableUuid(md.tableUuid)),
          Seq(graft.catalog.AddSortOrder(guess),
            graft.catalog.SetDefaultSortOrder(-1)))
        committed.metadata.sortOrders.find(_.fields == order.fields)
          .getOrElse(guess)
    }

  /** Stage a CoW replace against a REST table WITHOUT committing — the
    * [[RestTransaction]] counterpart of [[stageRestAppendChange]].
    * V3 lineage is client-assigned from the loaded `next-row-id`, and a
    * CAS conflict sends the caller back through loadTable to re-stage.
    *
    * `basedOn` pins the commit to a load the caller ALREADY computed its
    * removed/added sets from (a row-level scan, an overwrite's file
    * enumeration): the staged snapshot derives from that metadata and the
    * assert-ref guard holds ITS main head, so a commit that landed between
    * the caller's scan and this stage conflicts (409) at the server
    * instead of silently basing a rewrite on files the scan never saw —
    * the REST-plane twin of [[replaceFiles]]' expectedVersion pin. */
  private def stageRestReplaceChange(catalog: graft.catalog.RestCatalog,
                                     identifier: Seq[String],
                                     removedPaths: Set[String],
                                     added: Seq[graft.spark.CowFileOut],
                                     touchedManifests: Option[Set[String]],
                                     basedOn: Option[graft.catalog.LoadedTable] = None,
                                     sortOrder: Option[SortOrder] = None)
      : (graft.catalog.TableChange, Option[Long]) = {
    val loaded = basedOn.getOrElse(catalog.loadTable(identifier))
    val md = loaded.metadata
    val table = new IcebergTable(md.location, loaded.metadataLocation, md,
      IOConfig.fileIO(loaded.ioProps), ioProps = loaded.ioProps)
    // register the sort order first (own commit; moves no ref, so the
    // rewrite's head pin below stays valid) and stamp the SERVER's id
    val effOrder = sortOrder.filterNot(_.isUnsorted)
      .map(o => registerSortOrderRest(catalog, identifier, md, o))
    val snapshot = stageReplaceSnapshot(table, removedPaths, added,
      touchedManifests, effOrder)
    val change = graft.catalog.TableChange(identifier,
      Seq(graft.catalog.AssertTableUuid(md.tableUuid),
        graft.catalog.AssertRefSnapshotId(TableMetadata.MainBranch,
          md.refs.get(TableMetadata.MainBranch).map(_.snapshotId)
            .orElse(md.currentSnapshotId))),
      Seq(graft.catalog.AddSnapshot(snapshot),
        setMainRefUpdate(md, snapshot.snapshotId)))
    (change, snapshot.firstRowId.map(_ + added.map(_.rows).sum))
  }

  /** Per-commit V3 row-lineage assignment (spec v3 "Row Lineage"): ADDED
    * data-file entries take `first_row_id` sequentially from the table's
    * `next-row-id`; the snapshot records the base; `next-row-id` advances
    * past every added row. Identity below V3.
    *
    * Rewrites ([[compact]] and friends) MATERIALIZE each surviving row's
    * `_row_id`/`_last_updated_sequence_number` into the new files under
    * the spec's reserved field ids, and readers prefer the materialized
    * value — so the fresh `first_row_id` stamped here only reaches rows
    * whose materialized id is null (pre-lineage files), exactly the
    * spec's assignment rule. The id-space gap this leaves (the rewrite's
    * range is mostly unused) is allowed: row ids need not be contiguous. */
  private[spark] final case class Lineage(entries: Seq[ManifestEntry],
                                          manifestFirstRowId: Option[Long],
                                          snapshotFirstRowId: Option[Long],
                                          nextRowId: Option[Long])

  private[spark] def assignLineage(md: TableMetadata,
                                   entries: Seq[ManifestEntry]): Lineage =
    assignLineage(md.formatVersion, md.nextRowId, entries)

  private[spark] def assignLineage(formatVersion: Int,
                                   nextRowId: Option[Long],
                                   entries: Seq[ManifestEntry]): Lineage = {
    if (formatVersion < 3) return Lineage(entries, None, None, nextRowId)
    val base = nextRowId.getOrElse(0L)
    var cursor = base
    val stamped = entries.map { e =>
      if (e.dataFile.content == DataFileContent.Data &&
          e.status == ManifestEntryStatus.Added && e.dataFile.firstRowId.isEmpty) {
        val r = e.copy(dataFile = e.dataFile.copy(firstRowId = Some(cursor)))
        cursor += e.dataFile.recordCount
        r
      } else e
    }
    Lineage(stamped, if (cursor > base) Some(base) else None,
      Some(base), Some(cursor))
  }

  /** Manifests whose entries are all DELETED carry no live files — they
    * exist to record removals in the snapshot that made them, and are
    * dropped when the NEXT snapshot's manifest list is assembled (matching
    * Iceberg: delete-recording manifests live exactly one snapshot). Both
    * contents: data manifests emptied by a REPLACE, delete manifests
    * emptied by DV supersede ([[supersedeDeleteEntries]]). */
  private def liveManifests(ms: Seq[ManifestFile]): Seq[ManifestFile] =
    ms.filter(m => m.addedFilesCount + m.existingFilesCount > 0)

  /** Stage an OVERWRITE (CoW) snapshot: manifests containing replaced
    * paths rewritten under their own spec, untouched manifests carried by
    * reference, added files in one new manifest. Pure staging shared by
    * the local CAS and REST commit paths. */
  private def stageReplaceSnapshot(table: IcebergTable, removedPaths: Set[String],
                                   added: Seq[graft.spark.CowFileOut],
                                   touchedManifests: Option[Set[String]],
                                   sortOrder: Option[SortOrder] = None): Snapshot = {
    val md = table.metadata
    val location = table.location
    val seq = md.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val metaDir = new File(location, "metadata"); metaDir.mkdirs()

    val prevManifests = liveManifests(table.currentSnapshot.toSeq.flatMap { s =>
      ManifestIO.readManifestList(table.io.open(s.manifestList))
    })
    val (dataManifests, deleteManifests) = prevManifests.partition(_.content == 0)
    // ADDED files are written under the CURRENT spec; rewritten manifests
    // keep their OWN spec's partition type (specs may have evolved — writing
    // old tuples under the new partition struct would drop their values)
    val partType = table.spec.partitionType(table.schema)
    val partTypeOf: Int => StructT = specId =>
      md.partitionSpecs.find(_.specId == specId)
        .map(_.partitionType(table.schema)).getOrElse(partType)

    // scan provenance (when the caller has it) bounds the metadata work to
    // O(affected manifests): only manifests the scan actually read files
    // from can reference a replaced path. Without provenance, one parallel
    // pass over all data manifests finds the affected ones. Untouched
    // manifests are never read past this point and never rewritten.
    val (candidates, skipped) = touchedManifests match {
      case Some(paths) => dataManifests.partition(m => paths.contains(m.path))
      case None => (dataManifests, Nil)
    }
    val withEntries = {
      import scala.collection.parallel.CollectionConverters._
      candidates.par.map { m =>
        m -> ManifestIO.readManifestEntries(table.io.open(m.path), m)
      }.seq.toSeq
    }
    val (touched, untouchedRead) = withEntries.partition { case (_, es) =>
      es.exists(e => removedPaths.contains(e.dataFile.path))
    }
    val untouched = untouchedRead.map(_._1) ++ skipped

    val rewritten = touched.zipWithIndex.map { case ((m, es), i) =>
      // removed files stay in the rewritten manifest as DELETED-status
      // entries (Iceberg spec): the committing snapshot names what it
      // removed, so `entries` forensics and changelog readers never diff
      // whole snapshots. The NEXT commit drops all-DELETED manifests.
      val (gone, kept0) = es.partition(e => removedPaths.contains(e.dataFile.path))
      val kept = kept0.map(_.copy(status = ManifestEntryStatus.Existing))
      val removed = gone.map(_.copy(status = ManifestEntryStatus.Deleted,
        snapshotId = Some(snapId)))
      val mf = new File(metaDir, s"manifest-cow-$snapId-$i.avro")
      ManifestIO.writeManifest(mf, kept ++ removed, partTypeOf(m.partitionSpecId))
      ManifestFile(
        path = mf.getPath, length = mf.length(),
        partitionSpecId = m.partitionSpecId, content = 0,
        sequenceNumber = seq,
        minSequenceNumber =
          (kept ++ removed).flatMap(_.sequenceNumber).minOption.getOrElse(seq),
        addedSnapshotId = snapId,
        addedFilesCount = 0, existingFilesCount = kept.size,
        deletedFilesCount = removed.size,
        addedRowsCount = 0,
        existingRowsCount = kept.map(_.dataFile.recordCount).sum,
        deletedRowsCount = removed.map(_.dataFile.recordCount).sum,
        partitions = partitionSummaries(kept, partTypeOf(m.partitionSpecId)),
        formatVersion = 2)
    }

    val addedEntries0 = added.map { f =>
      val info0 = statsFromFooter(new File(f.path), table.schema,
        f.partition.filter(_._2 != null), DataFileContent.Data, None, f.nanCounts)
      // a sorted rewrite stamps its order so readers can claim per-file
      // ordering (SupportsReportOrdering gates on this exact id)
      val info = sortOrder.fold(info0)(o =>
        info0.copy(sortOrderId = Some(o.orderId)))
      ManifestEntry(ManifestEntryStatus.Added, Some(snapId), Some(seq), Some(seq),
        info)
    }
    val lineage = assignLineage(md, addedEntries0)
    val addedEntries = lineage.entries
    val addManifest =
      if (addedEntries.isEmpty) None
      else {
        val mf = new File(metaDir, s"manifest-cow-$snapId.avro")
        ManifestIO.writeManifest(mf, addedEntries, partType)
        Some(ManifestFile(
          path = mf.getPath, length = mf.length(),
          partitionSpecId = table.spec.specId, content = 0,
          sequenceNumber = seq, minSequenceNumber = seq,
          addedSnapshotId = snapId,
          addedFilesCount = addedEntries.size, existingFilesCount = 0,
          deletedFilesCount = 0,
          addedRowsCount = addedEntries.map(_.dataFile.recordCount).sum,
          existingRowsCount = 0, deletedRowsCount = 0,
          partitions = partitionSummaries(addedEntries, partType),
          formatVersion = 2,
          firstRowId = lineage.manifestFirstRowId))
      }

    val listFile = new File(metaDir, s"snap-$snapId.avro")
    ManifestIO.writeManifestList(listFile,
      untouched ++ rewritten ++ addManifest ++ deleteManifests)
    Snapshot(snapId, table.currentSnapshot.map(_.snapshotId), seq,
      System.currentTimeMillis(), listFile.getPath,
      Some(SnapshotSummary(OpOverwrite,
        Map("replaced-data-files" -> removedPaths.size.toString,
          "added-data-files" -> addedEntries.size.toString,
          "added-records" ->
            addedEntries.map(_.dataFile.recordCount).sum.toString))),
      Some(table.schema.schemaId),
      firstRowId = lineage.snapshotFirstRowId)
  }

  /** Compaction: rewrite the current snapshot's live rows (MoR deletes
    * applied) into `targetFiles` fresh files and commit a REPLACE snapshot.
    * The rewrite is one distributed pass; small-file pressure and delete
    * debt reset to zero.
    *
    * With `where` set, the rewrite is PARTITION-SCOPED (Iceberg's
    * `rewrite_data_files(where => ...)`): only files the scan planner
    * cannot prove disjoint from the predicate are rewritten — whole files,
    * never row-filtered, so the table's row set is unchanged — and the
    * commit rides the O(affected-files) [[replaceFiles]] CoW path instead
    * of a full-table REPLACE. At 100 TB this is the difference between
    * compacting a hot day-partition (touching its handful of manifests)
    * and rewriting the entire table.
    *
    * `minFileSizeBytes` / `deleteFileThreshold` add Iceberg's
    * `rewrite_data_files` binpack SELECTION on top of the scope: only
    * files smaller than the floor, or carrying at least that many delete
    * files, rewrite — already-healthy 512 MB files are left byte-identical
    * instead of being re-copied for nothing. With either knob set the
    * commit always rides the CoW path (selection implies surviving
    * files). Unset (the default) keeps rewrite-everything-in-scope
    * semantics. */
  /** The file set a compaction with these knobs rewrites — shared by
    * [[compact]] and the `CALL compact` procedure's reporting so they can
    * never disagree. Scope first (predicate pruning picks candidates),
    * then binpack selection: a file qualifies when it is smaller than
    * `minFileSizeBytes` OR referenced by at least `deleteFileThreshold`
    * delete files; with neither knob, everything in scope qualifies.
    * Metadata-only (one driver-side plan), commit-path scan (manifest
    * provenance, no remote planning). */
  def compactSelection(table: IcebergTable,
                       where: Option[BooleanExpression],
                       minFileSizeBytes: Option[Long] = None,
                       deleteFileThreshold: Option[Int] = None)
      : Seq[FileScanTask] = {
    val tasks = table.newScan(where.getOrElse(AlwaysTrue),
      remotePlanningOk = false).planFiles()
    if (minFileSizeBytes.isEmpty && deleteFileThreshold.isEmpty) tasks
    else tasks.filter(t =>
      minFileSizeBytes.exists(m => t.file.fileSizeInBytes < m) ||
        deleteFileThreshold.exists(th => t.deleteFiles.size >= th))
  }

  def compact(table: IcebergTable, spark: org.apache.spark.sql.SparkSession,
              targetFiles: Int = 0, sortBy: Seq[String] = Nil,
              zOrderBy: Seq[String] = Nil,
              where: Option[BooleanExpression] = None,
              minFileSizeBytes: Option[Long] = None,
              deleteFileThreshold: Option[Int] = None,
              // set when the table's catalog of record is a REST server:
              // the rewrite commits through replaceFilesRest pinned to
              // `basedOn` (the load `table` was built from), never by
              // writing metadata behind the server
              restCommit: Option[(graft.catalog.RestCatalog, Seq[String],
                graft.catalog.LoadedTable)] = None): IcebergTable = {
    require(sortBy.isEmpty || zOrderBy.isEmpty,
      "compact takes sortBy or zOrderBy, not both")
    // V3 row lineage survives the rewrite (spec: writers must preserve row
    // ids of rows copied from existing files): the scan derives each row's
    // `_row_id`/`_last_updated_sequence_number` (materialized-over-derived
    // precedence, so compacting twice keeps the ORIGINAL ids) and the
    // rewrite MATERIALIZES them as physical columns under the spec's
    // reserved field ids. Readers prefer the materialized value; rows that
    // were null (pre-lineage files) fall back to the new file's fresh
    // first_row_id + position — the spec's assignment for unassigned rows.
    val materializeLineage = table.metadata.formatVersion >= 3 &&
      !table.schema.fields.exists(f =>
        f.name == GraftReaders.RowIdCol || f.name == GraftReaders.LastUpdatedSeqCol)
    // Partition scope: plan with the predicate (partition-tuple +
    // column-metrics pruning pick the file set), then read the SELECTED
    // FILES WHOLE through an unfiltered scan — a file whose metrics merely
    // overlap the predicate still holds non-matching rows that must
    // survive the rewrite, so the predicate never filters rows here.
    val selectionOn = minFileSizeBytes.isDefined || deleteFileThreshold.isDefined
    val scoped: Option[(Set[String], Set[String])] =
      if (where.isEmpty && !selectionOn) None
      else {
        val tasks =
          compactSelection(table, where, minFileSizeBytes, deleteFileThreshold)
        // manifest provenance is all-or-nothing: a partial set would falsely
        // claim the unattributed tasks' manifests reference no selected file
        val mfs = tasks.map(_.manifestPath)
        Some((tasks.map(_.file.path).toSet,
          if (mfs.nonEmpty && mfs.forall(_.nonEmpty)) mfs.toSet
          else Set.empty[String]))
      }
    scoped.foreach { case (paths, _) => if (paths.isEmpty) return table }
    var df =
      if (materializeLineage || scoped.isDefined)
        table.newScan().toDF(spark, keepProvenance = false,
          pathFilter = scoped.map(_._1), keepLineage = materializeLineage)
      else table.newScan().toDF(spark)
    val order = sortOrderFor(table.schema, sortBy)
    if (zOrderBy.nonEmpty) {
      // z-ordered rewrite: range-cluster on the interleaved-bits curve
      // value — ONE range shuffle, per-file bounds tight in EVERY chosen
      // column at once (multi-dimensional pruning; lexicographic sort only
      // prunes on its leading column)
      zOrderBy.foreach(c => require(table.schema.findFieldByName(c).isDefined,
        s"z-order column '$c' not in schema"))
      val zc = graft.spark.functions.ZOrder.zorder(zOrderBy.map(col): _*)
      df = (if (targetFiles > 0) df.repartitionByRange(targetFiles, zc)
            else df.repartitionByRange(zc))
        .sortWithinPartitions(zc)
    } else if (!order.isUnsorted) {
      // sorted rewrite: range-cluster on the sort keys (disjoint per-file
      // bounds → stats pruning) at the requested file count
      val cols = sortBy.map(col)
      df = (if (targetFiles > 0) df.repartitionByRange(targetFiles, cols: _*)
            else df.repartitionByRange(cols: _*))
        .sortWithinPartitions(cols: _*)
    } else if (targetFiles > 0) df = df.repartition(targetFiles)
    scoped match {
      case Some((selected, manifests)) =>
        // scoped rewrite: write the replacement files with the shared task
        // writers, then swap exactly the selected files in one OVERWRITE
        // snapshot — manifests without a selected file are carried by
        // reference, untouched partitions' files stay byte-identical
        val dataDir = new File(table.location,
          s"data/compact-${java.util.UUID.randomUUID()}")
        val outs = writeDistributed(df, dataDir, table.schema, table.spec,
          table.properties, order, preClustered = true)
        restCommit match {
          case Some((rc, id, basedOn)) =>
            val committed = replaceFilesRest(rc, id, selected, outs,
              touchedManifests = if (manifests.nonEmpty) Some(manifests)
                                 else None,
              basedOn = Some(basedOn),
              sortOrder = Some(order).filterNot(_.isUnsorted))
            restTableOf(committed, rc)
          case None =>
            replaceFiles(table.location, selected, outs,
              expectedVersion = Some(table.loadedVersion),
              touchedManifests = if (manifests.nonEmpty) Some(manifests)
                                 else None)
        }
      case None =>
        restCommit match {
          case Some((rc, id, basedOn)) =>
            // whole-table rewrite over REST = a replace of every live
            // data file, committed head-pinned (the same OVERWRITE
            // supersession shape as the scoped path with full scope)
            val removed = table.newScan().planFiles()
              .map(_.file.path).toSet
            val dataDir = new File(table.location,
              s"data/compact-${java.util.UUID.randomUUID()}")
            val outs = writeDistributed(df, dataDir, table.schema, table.spec,
              table.properties, order, preClustered = true)
            val committed = replaceFilesRest(rc, id, removed, outs,
              basedOn = Some(basedOn),
              sortOrder = Some(order).filterNot(_.isUnsorted))
            restTableOf(committed, rc)
          case None =>
            val version = table.loadedVersion + 1
            val committed = commit(df, table.location, table.schema, table.spec,
              table.properties, version, table.currentSnapshot,
              Nil, Nil, // replace: the new manifest list carries ONLY the new files
              table.metadata.lastSequenceNumber + 1,
              sortOrder = order, preClustered = true)
            // rewrite the snapshot op to REPLACE for an honest history
            val md = committed.metadata
            val fixed = md.copy(snapshots = md.snapshots.init :+
              md.snapshots.last.copy(summary = Some(SnapshotSummary(OpReplace))))
            writeMetadata(table.location, fixed, currentVersion(table.location) + 1)
            IcebergTables.load(table.location)
        }
    }
  }

  /** Split a dotted column path into (parent struct path, leaf name).
    * Convenience for the string-named evolution entry points; a column
    * whose literal name contains a dot must go through the `Seq[String]`
    * overloads (SQL ALTER TABLE does — Spark hands us the parsed parts). */
  private def splitColPath(name: String): (Seq[String], String) = {
    val parts = name.split('.').toIndexedSeq
    require(parts.nonEmpty && parts.forall(_.nonEmpty), s"bad column path '$name'")
    (parts.init, parts.last)
  }

  /** Resolve a segment path to its field by WALKING struct levels — never
    * the flat name index, which is ambiguous when a literal name contains
    * a dot. */
  private def resolveField(root: StructT, path: Seq[String],
                           what: String): Option[NestedField] = {
    def rec(s: StructT, p: Seq[String]): Option[NestedField] = p match {
      case Seq(leaf) => s.fields.find(_.name == leaf)
      case seg +: rest => s.fields.find(_.name == seg).flatMap(_.fieldType match {
        case st: StructT => rec(st, rest)
        case _ => None
      })
      case _ => None
    }
    require(path.nonEmpty && path.forall(_.nonEmpty), s"$what: empty column path")
    rec(root, path)
  }

  /** Rewrite the struct at dotted `parentPath` (empty = the root struct)
    * with `f`, leaving every other field untouched. Evolution descends
    * STRUCT chains only — list elements / map values have no stable
    * user-facing field *names* to evolve through (Iceberg addresses them as
    * `element`/`value`), so a non-struct segment is refused loudly rather
    * than guessed at. */
  private def rewriteStructAt(root: StructT, parentPath: Seq[String],
                              what: String)(f: StructT => StructT): StructT = {
    def rec(s: StructT, path: Seq[String]): StructT = path match {
      case Seq() => f(s)
      case seg +: rest =>
        val fld = s.fields.find(_.name == seg).getOrElse(
          throw new IllegalArgumentException(
            s"$what: no field '$seg' on the path"))
        fld.fieldType match {
          case st: StructT =>
            StructT(s.fields.map(x =>
              if (x.id == fld.id) x.copy(fieldType = rec(st, rest)) else x))
          case other => throw new UnsupportedOperationException(
            s"$what: '$seg' is ${other.repr}, not a struct — evolution " +
              "through list/map types is not supported")
        }
    }
    rec(root, parentPath)
  }

  /** Schema evolution: add an optional column (new field id above all
    * existing ids). `name` may be a nested path (`a.b.c` adds field `c` to
    * the struct at `a.b`), and `colType` may itself be NESTED (struct/
    * list/map) — every id inside the new subtree is REASSIGNED fresh here
    * (parent before children, Iceberg's assignment order), so callers
    * build nested types with placeholder ids. Existing files stay valid —
    * readers see null for the new column; the scan resolves each
    * snapshot's schema by id. */
  def addColumn(table: IcebergTable, name: String,
                colType: graft.core.IcebergType, doc: Option[String]): IcebergTable = {
    val (parent, leaf) = splitColPath(name)
    addColumnAt(table, parent :+ leaf, colType, doc)
  }

  def addColumn(table: IcebergTable, name: String,
                colType: graft.core.IcebergType): IcebergTable =
    addColumn(table, name, colType, None)

  /** ADD COLUMN with V3 defaults: `initialDefault` is what pre-existing
    * data files read for the column; `writeDefault` fills writes that omit
    * it. Requires a format-version 3 table. */
  def addColumn(table: IcebergTable, name: String,
                colType: graft.core.IcebergType,
                initialDefault: Option[graft.core.Literal],
                writeDefault: Option[graft.core.Literal]): IcebergTable = {
    val (parent, leaf) = splitColPath(name)
    addColumnAt(table, parent :+ leaf, colType, None, initialDefault,
      writeDefault)
  }

  def addColumnAt(table: IcebergTable, path: Seq[String],
                  colType: graft.core.IcebergType,
                  doc: Option[String] = None,
                  initialDefault: Option[graft.core.Literal] = None,
                  writeDefault: Option[graft.core.Literal] = None,
                  required: Boolean = false): IcebergTable = {
    val md = table.metadata
    val (parent, leaf) = (path.init, path.last)
    val name = path.mkString(".")
    require(resolveField(md.currentSchema.struct, path, "ADD COLUMN").isEmpty,
      s"column '$name' exists")
    // column defaults are a V3 feature: stamping them into V1/V2 metadata
    // would be silently ignored by spec-conforming readers
    if (initialDefault.isDefined || writeDefault.isDefined)
      require(md.formatVersion >= 3,
        s"column defaults require format-version 3 (table is V${md.formatVersion}" +
          " — upgradeFormatVersion first)")
    // a required column added after files exist has no value in those files
    // unless initial-default supplies one (V3 spec invariant)
    if (required)
      require(initialDefault.isDefined || md.currentSnapshotId.isEmpty,
        s"cannot add required column '$name' to a non-empty table without " +
          "an initial-default")
    require(initialDefault.isEmpty || colType.isPrimitive,
      s"default values for nested types are not supported: ${colType.repr}")
    // ids for the new subtree must come from last-column-id, which tracks
    // the max ever assigned (an id from a DROPPED column must never be
    // reused — old data files still carry it)
    var nextId = md.lastColumnId
    def alloc(): Int = { nextId += 1; nextId }
    def reassign(t: graft.core.IcebergType): graft.core.IcebergType = t match {
      case s: StructT => StructT(s.fields.map { f =>
        val id = alloc(); f.copy(id = id, fieldType = reassign(f.fieldType))
      })
      case l: graft.core.ListT =>
        val id = alloc(); l.copy(elementId = id, element = reassign(l.element))
      case m: graft.core.MapT =>
        val kid = alloc(); val vid = alloc()
        m.copy(keyId = kid, key = reassign(m.key),
          valueId = vid, value = reassign(m.value))
      case p => p
    }
    val newId = alloc()
    val assigned = reassign(colType)
    val newStruct = rewriteStructAt(md.currentSchema.struct, parent, "ADD COLUMN") { s =>
      require(!s.fields.exists(_.name == leaf), s"column '$name' exists")
      StructT(s.fields :+ NestedField(newId, leaf, assigned, required = required,
        doc, initialDefault = initialDefault, writeDefault = writeDefault))
    }
    val newSchema = Schema(md.currentSchemaId + 1, newStruct,
      md.currentSchema.identifierFieldIds)
    val version = table.loadedVersion + 1
    writeMetadata(table.location, md.copy(
      lastColumnId = nextId,
      schemas = md.schemas :+ newSchema,
      currentSchemaId = newSchema.schemaId,
      lastUpdatedMs = System.currentTimeMillis()), version)
    IcebergTables.load(table.location)
  }

  /** Partition spec evolution: add a partition field (metadata-only; spec
    * history is preserved so manifests written under older specs keep
    * pruning through their own evaluators). Existing data is NOT rewritten —
    * new writes use the new spec, exactly like Iceberg's
    * `ADD PARTITION FIELD`. */
  def addPartitionField(table: IcebergTable, srcCol: String,
                        transform: Transform,
                        name: Option[String] = None,
                        restCommit: Option[(graft.catalog.RestCatalog,
                          Seq[String], graft.catalog.LoadedTable)] = None)
      : IcebergTable = {
    val md = table.metadata
    val src = md.currentSchema.findFieldByName(srcCol).getOrElse(
      throw new IllegalArgumentException(s"column '$srcCol' not found"))
    val spec = table.spec
    require(!spec.fields.exists(f => f.sourceId == src.id && f.transform == transform),
      s"'$srcCol' is already partitioned by ${transform.repr}")
    val fieldName = name.getOrElse(partName(srcCol, transform))
    require(!spec.fields.exists(_.name == fieldName),
      s"partition field '$fieldName' exists")
    val nextFieldId = (md.partitionSpecs.flatMap(_.fields.map(_.fieldId)) ++
      md.lastPartitionId).maxOption
      .getOrElse(PartitionSpec.PartitionDataIdStart - 1) + 1
    val newSpec = PartitionSpec(
      md.partitionSpecs.map(_.specId).maxOption.getOrElse(-1) + 1,
      spec.fields :+ PartitionField(src.id, nextFieldId, fieldName, transform))
    restCommit match {
      case Some((rc, id, basedOn)) =>
        // spec evolution commits the spec's add-spec + set-default-spec(-1)
        // actions; the server owns id assignment on conflict
        restTableOf(rc.commitTable(id,
          Seq(graft.catalog.AssertTableUuid(basedOn.metadata.tableUuid)),
          Seq(graft.catalog.AddPartitionSpec(newSpec),
            graft.catalog.SetDefaultSpec(-1))), rc)
      case None =>
        writeMetadata(table.location, md.copy(
          partitionSpecs = md.partitionSpecs :+ newSpec,
          defaultSpecId = newSpec.specId,
          lastPartitionId = Some(nextFieldId),
          lastUpdatedMs = System.currentTimeMillis()), table.loadedVersion + 1)
        IcebergTables.load(table.location)
    }
  }

  /** Partition spec evolution: drop a partition field from the default spec
    * (metadata-only). Files written under older specs stay pruned by their
    * own spec; new writes stop partitioning on the dropped field. */
  def dropPartitionField(table: IcebergTable, fieldName: String,
                         restCommit: Option[(graft.catalog.RestCatalog,
                           Seq[String], graft.catalog.LoadedTable)] = None)
      : IcebergTable = {
    val md = table.metadata
    val spec = table.spec
    require(spec.fields.exists(_.name == fieldName),
      s"partition field '$fieldName' not found in the default spec")
    val newSpec = PartitionSpec(
      md.partitionSpecs.map(_.specId).maxOption.getOrElse(-1) + 1,
      spec.fields.filterNot(_.name == fieldName))
    restCommit match {
      case Some((rc, id, basedOn)) =>
        return restTableOf(rc.commitTable(id,
          Seq(graft.catalog.AssertTableUuid(basedOn.metadata.tableUuid)),
          Seq(graft.catalog.AddPartitionSpec(newSpec),
            graft.catalog.SetDefaultSpec(-1))), rc)
      case None => ()
    }
    writeMetadata(table.location, md.copy(
      partitionSpecs = md.partitionSpecs :+ newSpec,
      defaultSpecId = newSpec.specId,
      lastUpdatedMs = System.currentTimeMillis()), table.loadedVersion + 1)
    IcebergTables.load(table.location)
  }

  /** Schema evolution: rename a top-level column. Field-ID-based resolution
    * makes this safe — the field keeps its id, so data files written under
    * the old name still resolve (readers match parquet columns by field id,
    * SURVEY §1.2), and time travel to pre-rename snapshots projects the old
    * name via that snapshot's schema version. */
  def renameColumn(table: IcebergTable, from: String, to: String): IcebergTable = {
    val (parent, leaf) = splitColPath(from)
    renameColumnAt(table, parent :+ leaf, to)
  }

  def renameColumnAt(table: IcebergTable, path: Seq[String],
                     to: String): IcebergTable = {
    val md = table.metadata
    require(!to.contains('.'), s"new name must be a bare name, got '$to'")
    val (parent, leaf) = (path.init, path.last)
    val f = resolveField(md.currentSchema.struct, path, "RENAME COLUMN").getOrElse(
      throw new IllegalArgumentException(s"column '${path.mkString(".")}' not found"))
    val newStruct = rewriteStructAt(md.currentSchema.struct, parent, "RENAME COLUMN") { s =>
      // collision only matters among SIBLINGS — `a.b.x` and `x` coexist
      require(!s.fields.exists(_.name == to), s"column '$to' exists")
      s.copy(fields = s.fields.map(x =>
        if (x.id == f.id && x.name == leaf) x.copy(name = to) else x))
    }
    val newSchema = Schema(md.schemas.map(_.schemaId).max + 1, newStruct,
      md.currentSchema.identifierFieldIds)
    writeMetadata(table.location, md.copy(
      schemas = md.schemas :+ newSchema,
      currentSchemaId = newSchema.schemaId,
      lastUpdatedMs = System.currentTimeMillis()), table.loadedVersion + 1)
    IcebergTables.load(table.location)
  }

  /** Schema evolution: drop a top-level column (metadata-only — data files
    * keep the column bytes; current reads never request them, old snapshots
    * still project them through their own schema version). Partition source
    * and identifier columns are protected. */
  def dropColumn(table: IcebergTable, name: String): IcebergTable = {
    val (parent, leaf) = splitColPath(name)
    dropColumnAt(table, parent :+ leaf)
  }

  def dropColumnAt(table: IcebergTable, path: Seq[String]): IcebergTable = {
    val md = table.metadata
    val name = path.mkString(".")
    val f = resolveField(md.currentSchema.struct, path, "DROP COLUMN").getOrElse(
      throw new IllegalArgumentException(s"column '$name' not found"))
    // dropping a struct drops its whole subtree: every id under it must be
    // safe, not just the root's
    val subtree = graft.core.SchemaIndex.subtreeIds(f)
    require(!table.spec.fields.exists(pf => subtree.contains(pf.sourceId)),
      s"column '$name' is a partition source; drop the partition field first")
    require(!md.currentSchema.identifierFieldIds.exists(subtree.contains),
      s"column '$name' is (or contains) an identifier field")
    val (parent, leaf) = (path.init, path.last)
    val newStruct = rewriteStructAt(md.currentSchema.struct, parent, "DROP COLUMN") { s =>
      require(s.fields.size > 1,
        if (parent.isEmpty) "cannot drop the last column"
        else s"cannot drop the last field of struct '${parent.mkString(".")}'")
      s.copy(fields = s.fields.filterNot(x => x.id == f.id && x.name == leaf))
    }
    val newSchema = Schema(md.schemas.map(_.schemaId).max + 1, newStruct,
      md.currentSchema.identifierFieldIds)
    writeMetadata(table.location, md.copy(
      schemas = md.schemas :+ newSchema,
      currentSchemaId = newSchema.schemaId,
      lastUpdatedMs = System.currentTimeMillis()), table.loadedVersion + 1)
    IcebergTables.load(table.location)
  }

  /** Schema evolution: widen a column's type per the Iceberg promotion
    * rules (int→long, float→double, decimal precision growth at fixed
    * scale). Metadata-only: the field keeps its id, old files keep their
    * old-width values/stats (readers widen both), old snapshots keep their
    * own schema version. */
  def updateColumnType(table: IcebergTable, name: String,
                       to: IcebergType): IcebergTable = {
    val (parent, leaf) = splitColPath(name)
    updateColumnTypeAt(table, parent :+ leaf, to)
  }

  def updateColumnTypeAt(table: IcebergTable, path: Seq[String],
                         to: IcebergType): IcebergTable = {
    val md = table.metadata
    val name = path.mkString(".")
    val f = resolveField(md.currentSchema.struct, path, "ALTER COLUMN TYPE").getOrElse(
      throw new IllegalArgumentException(s"column '$name' not found"))
    val ok = (f.fieldType, to) match {
      case (a, b) if a == b => true
      case (IntT, LongT) => true
      case (FloatT, DoubleT) => true
      case (DecimalT(p, s), DecimalT(p2, s2)) => s2 == s && p2 >= p
      case _ => false
    }
    require(ok, s"cannot promote ${f.fieldType.repr} to ${to.repr} " +
      "(allowed: int->long, float->double, decimal precision growth)")
    if (f.fieldType == to) return table
    val (parent, leaf) = (path.init, path.last)
    val newStruct = rewriteStructAt(md.currentSchema.struct, parent,
        "ALTER COLUMN TYPE") { s =>
      s.copy(fields = s.fields.map(x =>
        if (x.id == f.id && x.name == leaf) x.copy(fieldType = to) else x))
    }
    val newSchema = Schema(md.schemas.map(_.schemaId).max + 1, newStruct,
      md.currentSchema.identifierFieldIds)
    writeMetadata(table.location, md.copy(
      schemas = md.schemas :+ newSchema,
      currentSchemaId = newSchema.schemaId,
      lastUpdatedMs = System.currentTimeMillis()), table.loadedVersion + 1)
    IcebergTables.load(table.location)
  }

  /** Shared ALTER COLUMN plumbing: resolve `path`, apply `change` to the
    * field, bump to a fresh schema id (max + 1 — immune to current-id
    * regressions), and commit the metadata-only schema evolution. */
  private def rewriteFieldMetadata(table: IcebergTable, path: Seq[String],
                                   op: String)
                                  (change: NestedField => NestedField)
      : IcebergTable = {
    val md = table.metadata
    val f = resolveField(md.currentSchema.struct, path, op).getOrElse(
      throw new IllegalArgumentException(
        s"column '${path.mkString(".")}' not found"))
    val (parent, leaf) = (path.init, path.last)
    val newStruct = rewriteStructAt(md.currentSchema.struct, parent, op) { st =>
      st.copy(fields = st.fields.map(x =>
        if (x.id == f.id && x.name == leaf) change(x) else x))
    }
    val newSchema = Schema(md.schemas.map(_.schemaId).max + 1, newStruct,
      md.currentSchema.identifierFieldIds)
    writeMetadata(table.location, md.copy(
      schemas = md.schemas :+ newSchema,
      currentSchemaId = newSchema.schemaId,
      lastUpdatedMs = System.currentTimeMillis()), table.loadedVersion + 1)
    IcebergTables.load(table.location)
  }

  /** Resolve a column path to its Iceberg type (DDL plumbing). */
  def resolveFieldType(table: IcebergTable,
                       path: Seq[String]): graft.core.IcebergType =
    resolveField(table.metadata.currentSchema.struct, path, "ALTER COLUMN")
      .getOrElse(throw new IllegalArgumentException(
        s"column '${path.mkString(".")}' not found")).fieldType

  /** ALTER COLUMN COMMENT: metadata-only doc update (new schema version,
    * same field ids). */
  def updateColumnCommentAt(table: IcebergTable, path: Seq[String],
                            comment: Option[String]): IcebergTable =
    rewriteFieldMetadata(table, path, "ALTER COLUMN COMMENT")(
      _.copy(doc = comment))

  /** ALTER COLUMN DROP NOT NULL (required → optional — always legal per
    * the Iceberg spec). The WIDENING direction (optional → required) is
    * refused: proving no nulls exist takes a data scan, and a wrong
    * promise turns every subsequent read into undefined behavior. */
  def updateColumnNullabilityAt(table: IcebergTable, path: Seq[String],
                                nullable: Boolean): IcebergTable = {
    val md = table.metadata
    val f = resolveField(md.currentSchema.struct, path, "ALTER COLUMN NULL")
      .getOrElse(throw new IllegalArgumentException(
        s"column '${path.mkString(".")}' not found"))
    if (!nullable && !f.required)
      throw new UnsupportedOperationException(
        s"cannot make optional column '${path.mkString(".")}' required: " +
          "existing data may hold nulls (Iceberg only allows " +
          "required -> optional)")
    if (f.required == !nullable) return table
    rewriteFieldMetadata(table, path, "ALTER COLUMN NULL")(
      _.copy(required = !nullable))
  }

  /** ALTER COLUMN SET/DROP DEFAULT: changes only the `write-default` —
    * per the V3 spec, `initial-default` is immutable once set (it defines
    * what pre-existing files read and must never drift). V3-only. */
  def updateColumnDefaultAt(table: IcebergTable, path: Seq[String],
                            writeDefault: Option[graft.core.Literal])
      : IcebergTable = {
    val md = table.metadata
    require(md.formatVersion >= 3 || writeDefault.isEmpty,
      s"column defaults require format-version 3 (table is V${md.formatVersion})")
    val name = path.mkString(".")
    val f = resolveField(md.currentSchema.struct, path, "ALTER COLUMN DEFAULT")
      .getOrElse(throw new IllegalArgumentException(s"column '$name' not found"))
    require(writeDefault.isEmpty || f.fieldType.isPrimitive,
      s"default values for nested types are not supported: ${f.fieldType.repr}")
    rewriteFieldMetadata(table, path, "ALTER COLUMN DEFAULT")(
      _.copy(writeDefault = writeDefault))
  }

  /** Metadata-only property update (SET/UNSET TBLPROPERTIES). */
  def updateProperties(table: IcebergTable, set: Map[String, String],
                       unset: Seq[String] = Nil): IcebergTable = {
    val version = table.loadedVersion + 1
    writeMetadata(table.location, table.metadata.copy(
      properties = table.metadata.properties ++ set -- unset,
      lastUpdatedMs = System.currentTimeMillis()), version)
    IcebergTables.load(table.location)
  }

  /** Roll `main` back to an earlier snapshot (metadata-only): the current
    * pointer moves, history is preserved, rolled-back snapshots stay
    * reachable by id until expired. */
  /** Coalesce the current snapshot's data manifests into size-targeted
    * ones (`commit.manifest.target-size-bytes`, default 8 MB) — a
    * METADATA-only commit: no data file moves, the plan-time manifest walk
    * just gets fewer, larger Avro files to open. Entries keep their
    * explicit snapshot/sequence provenance (no inheritance is lost) and
    * group per partition spec so tuples stay under their own partition
    * type. Delete manifests are carried as-is. The new snapshot is a
    * REPLACE, invisible to changelog readers. */
  /** Coalesce the current snapshot's positional delete files into a
    * BOUNDED set of sorted files, dropping dangling tombstones (rows
    * pointing at data files no longer live — left behind by
    * compactions/CoW rewrites). MoR read cost is O(delete files) per scan
    * group, so a table that has absorbed many small DELETEs reads
    * measurably faster after this.
    *
    * Output is bin-packed to `write.target-file-size-bytes`: surviving
    * tombstones are range-partitioned on (file_path, pos) into
    * ceil(liveBytes / target) disjoint, individually-sorted files — every
    * file writes from its own executor task, so a delete-heavy table
    * never funnels all tombstones through one task (the old `coalesce(1)`
    * shape). Disjoint sorted ranges preserve the per-file (path, pos)
    * ordering and path bounds that delete matching prunes on.
    *
    * Equality-delete entries keep their partition tuples: manifests that
    * hold only eq-deletes are carried into the new manifest list AS-IS
    * (original spec id + partition type intact); eq entries living in
    * mixed manifests are rewritten grouped per original spec with the
    * spec's partition type, so a spec-compliant external reader never
    * sees a partition-scoped eq delete widened to global scope.
    *
    * Sequence safety: the merged files commit at the next sequence
    * number, which covers every data file the originals covered (pos
    * tombstones address (path, pos) — files committed later have new
    * paths, so the wider range cannot over-delete). */
  /** Dangling-tombstone filter as a LEFT SEMI join against a live-paths
    * dataset, never an In-literal: a 100 TB table has 200k+ live files
    * (millions when small-filed), and inlining each path as a literal
    * would bloat the serialized plan of every task and the driver that
    * builds it. As a join the path set ships once (AQE broadcasts it
    * when it fits — it is metadata-sized, O(file count)), and the
    * tombstone side streams through distributed. */
  private[spark] def filterLiveTombstones(
      tombstones: org.apache.spark.sql.DataFrame, livePaths: Seq[String],
      spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val liveDf = livePaths.toDF("live_path")
    tombstones.join(liveDf, col("file_path") === col("live_path"), "left_semi")
  }

  def rewritePositionDeletes(table: IcebergTable,
                             spark: org.apache.spark.sql.SparkSession,
                             restCommit: Option[(graft.catalog.RestCatalog,
                               Seq[String], graft.catalog.LoadedTable)] = None)
      : (IcebergTable, Int, Int) = {
    val md = table.metadata
    val snap = table.currentSnapshot.getOrElse(return (table, 0, 0))
    val manifests = ManifestIO.readManifestList(table.io.open(snap.manifestList))
    val deleteManifests = manifests.filter(_.content == 1)
    val manifestEntries = deleteManifests.map(m =>
      m -> ManifestIO.readManifestEntries(table.io.open(m.path), m))
    // V3 deletion vectors are PositionDeletes by content but NOT parquet —
    // they consolidate via rewriteDeletionVectors, never through this
    // parquet merge (reading a Puffin container as parquet would throw)
    val posFiles = manifestEntries.flatMap(_._2)
      .filter(e => e.dataFile.content == DataFileContent.PositionDeletes &&
        !e.dataFile.isDeletionVector)
    if (posFiles.isEmpty) return (table, 0, 0)
    // Manifests with no parquet pos-delete entry (eq-only, DV-only, mixed
    // eq+DV) ride along untouched (tuples + spec preserved); only manifests
    // containing at least one parquet pos-delete entry rewrite.
    val (eqOnlyManifests, mixedManifests) = manifestEntries.partition {
      case (_, es) => es.nonEmpty &&
        es.forall(e => e.dataFile.content == DataFileContent.EqualityDeletes ||
          e.dataFile.isDeletionVector)
    }
    val eqEntries = mixedManifests.flatMap { case (m, es) =>
      es.filter(_.dataFile.content == DataFileContent.EqualityDeletes)
        .map(m.partitionSpecId -> _)
    }
    // DV entries rescued from mixed manifests: their own manifest (DVs
    // carry no partition tuple — summaries stay Nil, planner keeps it)
    val dvRescued = mixedManifests.flatMap(_._2)
      .filter(_.dataFile.isDeletionVector)
      .map(_.copy(status = ManifestEntryStatus.Existing))

    val seq = md.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val metaDir = new File(table.location, "metadata")
    val delDir = new File(table.location, s"data/deletes-rw-$snapId")

    // a DV-covered file's parquet tombstones are reader-ignored (their
    // positions were merged into the DV when it was created) — dropping
    // them here is exact, like danglers
    val liveTasks = table.newScan().planFiles()
    val livePaths = liveTasks.filter(!_.deleteFiles.exists(_.isDeletionVector))
      .map(_.file.path).toSet
    import org.apache.spark.sql.functions.col
    val targetBytes = md.properties.get(GraftCowWriterFactory.TargetFileSizeProp)
      .flatMap(_.toLongOption)
      .getOrElse(GraftCowWriterFactory.DefaultTargetFileSize)
    // Upper bound on surviving bytes: the inputs (danglers only shrink it).
    val liveBytesUb = posFiles.map(_.dataFile.fileSizeInBytes).sum
    val outFiles = math.max(1,
      math.ceil(liveBytesUb.toDouble / targetBytes).toInt)
    val merged = filterLiveTombstones(
        spark.read.parquet(posFiles.map(_.dataFile.path).distinct: _*),
        livePaths.toSeq.map(_.stripPrefix("file:")), spark)
      .repartitionByRange(outFiles, col("file_path"), col("pos"))
      .sortWithinPartitions("file_path", "pos")
    merged.write.parquet(delDir.getPath)

    val mergedInfos = listParquet(delDir).map { f =>
      statsFromFooter(f, table.schema, Map.empty,
        content = DataFileContent.PositionDeletes,
        overrideSchema = Some(posDeleteSchema))
    }
    val mergedEntries = mergedInfos.map(i => ManifestEntry(
      ManifestEntryStatus.Added, Some(snapId), Some(seq), Some(seq), i))
    val mf = new File(metaDir, s"manifest-del-rw-$snapId.avro")
    ManifestIO.writeManifest(mf, mergedEntries, StructT(Nil))
    val posManifest = ManifestFile(
      path = mf.getPath, length = mf.length(),
      partitionSpecId = table.spec.specId, content = 1,
      sequenceNumber = seq,
      minSequenceNumber =
        mergedEntries.flatMap(_.sequenceNumber).minOption.getOrElse(seq),
      addedSnapshotId = snapId,
      addedFilesCount = mergedEntries.size, existingFilesCount = 0,
      deletedFilesCount = posFiles.size,
      addedRowsCount = mergedInfos.map(_.recordCount).sum,
      existingRowsCount = 0,
      deletedRowsCount = posFiles.map(_.dataFile.recordCount).sum,
      partitions = Nil, formatVersion = 2)
    // Eq entries rescued from mixed manifests: one manifest per original
    // spec, partition type preserved so tuples survive the rewrite.
    val eqManifests = eqEntries.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (specId, tagged) =>
        val es = tagged.map(_._2.copy(status = ManifestEntryStatus.Existing))
        val partType = md.partitionSpecs.find(_.specId == specId)
          .map(_.partitionType(table.schema)).getOrElse(StructT(Nil))
        val emf = new File(metaDir, s"manifest-del-rw-eq-$snapId-$specId.avro")
        ManifestIO.writeManifest(emf, es, partType)
        ManifestFile(
          path = emf.getPath, length = emf.length(),
          partitionSpecId = specId, content = 1,
          sequenceNumber = seq,
          minSequenceNumber =
            es.flatMap(_.sequenceNumber).minOption.getOrElse(seq),
          addedSnapshotId = snapId,
          addedFilesCount = 0, existingFilesCount = es.size,
          deletedFilesCount = 0,
          addedRowsCount = 0,
          existingRowsCount = es.map(_.dataFile.recordCount).sum,
          deletedRowsCount = 0,
          partitions = partitionSummaries(es, partType), formatVersion = 2)
    }
    val dvManifests =
      if (dvRescued.isEmpty) Nil
      else {
        val dmf = new File(metaDir, s"manifest-del-rw-dv-$snapId.avro")
        ManifestIO.writeManifest(dmf, dvRescued, StructT(Nil))
        Seq(ManifestFile(
          path = dmf.getPath, length = dmf.length(),
          partitionSpecId = table.spec.specId, content = 1,
          sequenceNumber = seq,
          minSequenceNumber =
            dvRescued.flatMap(_.sequenceNumber).minOption.getOrElse(seq),
          addedSnapshotId = snapId,
          addedFilesCount = 0, existingFilesCount = dvRescued.size,
          deletedFilesCount = 0,
          addedRowsCount = 0,
          existingRowsCount = dvRescued.map(_.dataFile.recordCount).sum,
          deletedRowsCount = 0,
          partitions = Nil, formatVersion = 2))
      }

    val listFile = new File(metaDir, s"snap-$snapId.avro")
    ManifestIO.writeManifestList(listFile,
      manifests.filter(_.content == 0) ++ eqOnlyManifests.map(_._1) ++
        (posManifest +: eqManifests) ++ dvManifests)
    val now = System.currentTimeMillis()
    val snapshot = Snapshot(snapId, Some(snap.snapshotId), seq, now,
      listFile.getPath,
      Some(SnapshotSummary(OpReplace,
        Map("delete-files-rewritten" -> posFiles.size.toString,
          "delete-files-created" -> mergedEntries.size.toString))),
      Some(table.schema.schemaId))
    restCommit match {
      case Some((rc, id, basedOn)) =>
        // maintenance on a REST table commits through the server, pinned
        // to the enumerating load's main head (racing commits 409)
        val change = restChangeFor(basedOn.metadata, id, snapshot)
        val committed = rc.commitTable(id, change.requirements, change.updates)
        (restTableOf(committed, rc), posFiles.size, mergedEntries.size)
      case None =>
        writeMetadata(table.location, md.copy(
          lastSequenceNumber = seq,
          lastUpdatedMs = now,
          snapshots = md.snapshots :+ snapshot,
          currentSnapshotId = Some(snapId),
          snapshotLog = md.snapshotLog :+ SnapshotLogEntry(snapId, now),
          refs = advRef(md.refs, TableMetadata.MainBranch, snapId)),
          table.loadedVersion + 1)
        (IcebergTables.load(table.location), posFiles.size, mergedEntries.size)
    }
  }

  def rewriteManifests(table: IcebergTable,
                       restCommit: Option[(graft.catalog.RestCatalog,
                         Seq[String], graft.catalog.LoadedTable)] = None)
      : IcebergTable = {
    val md = table.metadata
    val snap = table.currentSnapshot.getOrElse(
      throw new IllegalStateException(s"${table.location} has no snapshot"))
    val targetBytes = md.properties.get("commit.manifest.target-size-bytes")
      .flatMap(_.toLongOption).getOrElse(8L * 1024 * 1024)
    val manifests = ManifestIO.readManifestList(table.io.open(snap.manifestList))
    val (dataManifests, deleteManifests) = manifests.partition(_.content == 0)
    if (dataManifests.size <= 1) return table

    val seq = md.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val metaDir = new File(table.location, "metadata"); metaDir.mkdirs()

    val bySpec = dataManifests.groupBy(_.partitionSpecId).toSeq.sortBy(_._1)
    val rewritten = bySpec.flatMap { case (specId, ms) =>
      val entries = {
        import scala.collection.parallel.CollectionConverters._
        ms.sortBy(_.path).par.map { m =>
          ManifestIO.readManifestEntries(table.io.open(m.path), m)
            .map(_.copy(status = ManifestEntryStatus.Existing))
        }.seq.flatten
      }
      if (entries.isEmpty) Nil
      else {
        val partType = md.partitionSpecs.find(_.specId == specId)
          .map(_.partitionType(table.schema))
          .getOrElse(table.spec.partitionType(table.schema))
        val totalBytes = ms.map(_.length).sum
        val groups = math.max(1, math.min(entries.size,
          math.ceil(totalBytes.toDouble / targetBytes).toInt))
        val perGroup = math.ceil(entries.size.toDouble / groups).toInt
        entries.grouped(perGroup).zipWithIndex.map { case (es, i) =>
          val mf = new File(metaDir, s"manifest-rw-$snapId-$specId-$i.avro")
          ManifestIO.writeManifest(mf, es, partType)
          ManifestFile(
            path = mf.getPath, length = mf.length(),
            partitionSpecId = specId, content = 0,
            sequenceNumber = seq,
            minSequenceNumber =
              es.flatMap(_.sequenceNumber).minOption.getOrElse(seq),
            addedSnapshotId = snapId,
            addedFilesCount = 0, existingFilesCount = es.size,
            deletedFilesCount = 0,
            addedRowsCount = 0,
            existingRowsCount = es.map(_.dataFile.recordCount).sum,
            deletedRowsCount = 0,
            partitions = partitionSummaries(es, partType),
            formatVersion = 2)
        }.toSeq
      }
    }

    val listFile = new File(metaDir, s"snap-$snapId.avro")
    ManifestIO.writeManifestList(listFile, rewritten ++ deleteManifests)
    val now = System.currentTimeMillis()
    val snapshot = Snapshot(snapId, Some(snap.snapshotId), seq, now,
      listFile.getPath,
      Some(SnapshotSummary(OpReplace,
        Map("manifests-rewritten" -> dataManifests.size.toString,
          "manifests-created" -> rewritten.size.toString))),
      Some(table.schema.schemaId))
    restCommit match {
      case Some((rc, id, basedOn)) =>
        val change = restChangeFor(basedOn.metadata, id, snapshot)
        restTableOf(rc.commitTable(id, change.requirements, change.updates), rc)
      case None =>
        writeMetadata(table.location, md.copy(
          lastSequenceNumber = seq,
          lastUpdatedMs = now,
          snapshots = md.snapshots :+ snapshot,
          currentSnapshotId = Some(snapId),
          snapshotLog = md.snapshotLog :+ SnapshotLogEntry(snapId, now),
          refs = advRef(md.refs, TableMetadata.MainBranch, snapId)),
          table.loadedVersion + 1)
        IcebergTables.load(table.location)
    }
  }

  def rollbackTo(table: IcebergTable, snapshotId: Long): IcebergTable = {
    val md = table.metadata
    require(md.snapshotById(snapshotId).isDefined, s"snapshot $snapshotId not found")
    val now = System.currentTimeMillis()
    writeMetadata(table.location, md.copy(
      currentSnapshotId = Some(snapshotId),
      lastUpdatedMs = now,
      snapshotLog = md.snapshotLog :+ SnapshotLogEntry(snapshotId, now),
      refs = advRef(md.refs, TableMetadata.MainBranch, snapshotId)), table.loadedVersion + 1)
    IcebergTables.load(table.location)
  }

  /** The effect of one expiry pass over `md0` at time `now`: the refs that
    * aged out, and the snapshot partition into kept/expired — shared
    * verbatim by the local-FS route ([[expireSnapshots]], which rewrites
    * metadata) and the REST route ([[expireSnapshotsRest]], which commits
    * `remove-snapshot-ref` + `remove-snapshots` update actions), so the two
    * catalog planes retain IDENTICAL history under identical policies. */
  private[spark] final case class ExpiryPlan(agedOutRefs: Set[String],
                                             kept: Seq[Snapshot],
                                             expired: Seq[Snapshot])

  /** Expire snapshots older than `olderThanMs`, always retaining the
    * current snapshot, the newest `retainLast`, and every ref target.
    * Metadata-only by default; with `deleteFiles` the data/manifest files
    * reachable ONLY from expired snapshots are removed from disk. */
  def expireSnapshots(table: IcebergTable, olderThanMs: Long,
                      retainLast: Int = 1,
                      deleteFiles: Boolean = false): IcebergTable = {
    val md0 = table.metadata
    val now = System.currentTimeMillis()
    val plan = computeExpiry(md0, olderThanMs, retainLast, now)
    val agedOut = plan.agedOutRefs
    val md = md0.copy(refs = md0.refs -- agedOut)
    val (kept, expired) = (plan.kept, plan.expired)
    if (expired.isEmpty && agedOut.isEmpty) return table
    if (expired.isEmpty) {
      writeMetadata(table.location, md.copy(
        lastUpdatedMs = System.currentTimeMillis()), table.loadedVersion + 1)
      return IcebergTables.load(table.location)
    }

    if (deleteFiles) deleteExpiredFiles(table, kept, expired)

    writeMetadata(table.location, md.copy(
      snapshots = kept,
      snapshotLog = md.snapshotLog.filter(e =>
        kept.exists(_.snapshotId == e.snapshotId)),
      lastUpdatedMs = System.currentTimeMillis()),
      table.loadedVersion + 1)
    IcebergTables.load(table.location)
  }

  /** Remove from disk every file reachable ONLY from `expired` snapshots.
    * liveOnly on the kept side: a DELETED-status entry in a retained
    * snapshot records a file some RETAINED-or-expired parent held; if no
    * retained snapshot holds it LIVE, the file is unreachable and must go.
    * The expired side keeps deleted entries so tombstone-recorded files
    * are swept. */
  private def deleteExpiredFiles(table: IcebergTable, kept: Seq[Snapshot],
                                 expired: Seq[Snapshot]): Unit = {
    val live = reachablePaths(table, kept, liveOnly = true)
    (reachablePaths(table, expired) -- live).foreach(p => new File(p).delete())
  }

  /** Expire snapshots of a REST-cataloged table THROUGH the catalog: the
    * same per-branch retention computation as [[expireSnapshots]], landed
    * as `remove-snapshot-ref` + `remove-snapshots` update actions guarded
    * by assert-table-uuid + assert-ref-snapshot-id(main) — a concurrent
    * commit moves main and the server answers 409 instead of this pass
    * silently expiring history computed against a stale snapshot set.
    * (The reference panics on every commit, rest.go:418-424; its expiry
    * story is absent entirely.) */
  def expireSnapshotsRest(catalog: graft.catalog.RestCatalog,
                          identifier: Seq[String], olderThanMs: Long,
                          retainLast: Int = 1,
                          deleteFiles: Boolean = false)
      : graft.catalog.LoadedTable = {
    val loaded = catalog.loadTable(identifier)
    val md = loaded.metadata
    val plan = computeExpiry(md, olderThanMs, retainLast,
      System.currentTimeMillis())
    if (plan.agedOutRefs.isEmpty && plan.expired.isEmpty) return loaded
    val updates: Seq[graft.catalog.TableUpdate] =
      plan.agedOutRefs.toSeq.sorted.map(graft.catalog.RemoveSnapshotRef(_)) ++
        (if (plan.expired.isEmpty) Nil
         else Seq(graft.catalog.RemoveSnapshots(plan.expired.map(_.snapshotId))))
    val committed = catalog.commitTable(identifier,
      Seq(graft.catalog.AssertTableUuid(md.tableUuid),
        graft.catalog.AssertRefSnapshotId(TableMetadata.MainBranch,
          md.refs.get(TableMetadata.MainBranch).map(_.snapshotId)
            .orElse(md.currentSnapshotId))),
      updates)
    // file sweep only AFTER the server accepted the commit — a 409 above
    // must leave every data/manifest file of the still-live history intact
    if (deleteFiles && plan.expired.nonEmpty) {
      val table = new IcebergTable(md.location, loaded.metadataLocation, md,
        IOConfig.fileIO(loaded.ioProps), ioProps = loaded.ioProps)
      deleteExpiredFiles(table, plan.kept, plan.expired)
    }
    committed
  }

  /** Ref maintenance on a REST-cataloged table — create/advance a branch
    * or tag. One UpdateTableRequest (`set-snapshot-ref`), uuid-guarded;
    * same semantics and refusals as [[createRef]]. */
  def createRefRest(catalog: graft.catalog.RestCatalog, identifier: Seq[String],
                    name: String, refType: RefType,
                    snapshotId: Option[Long] = None,
                    maxRefAgeMs: Option[Long] = None,
                    minSnapshotsToKeep: Option[Int] = None,
                    maxSnapshotAgeMs: Option[Long] = None)
      : graft.catalog.LoadedTable = {
    require(refType == BranchRef ||
      (minSnapshotsToKeep.isEmpty && maxSnapshotAgeMs.isEmpty),
      "snapshot retention (min-snapshots-to-keep / max-snapshot-age-ms) " +
        "applies to branches only; tags pin exactly their target")
    val loaded = catalog.loadTable(identifier)
    val md = loaded.metadata
    val id = snapshotId.orElse(md.currentSnapshotId).getOrElse(
      throw new IllegalArgumentException("table has no snapshot to reference"))
    require(md.snapshotById(id).isDefined, s"snapshot $id not found")
    catalog.commitTable(identifier,
      Seq(graft.catalog.AssertTableUuid(md.tableUuid)),
      Seq(graft.catalog.SetSnapshotRef(name, id,
        if (refType == BranchRef) "branch" else "tag",
        minSnapshotsToKeep, maxSnapshotAgeMs, maxRefAgeMs)))
  }

  /** [[setRefRetention]] on the REST plane: re-SET the ref at its current
    * target with the new policy (the spec's set-snapshot-ref REPLACES the
    * ref node), CAS-guarded at the ref's current position. */
  def setRefRetentionRest(catalog: graft.catalog.RestCatalog,
                          identifier: Seq[String], name: String,
                          minSnapshotsToKeep: Option[Int],
                          maxSnapshotAgeMs: Option[Long])
      : graft.catalog.LoadedTable = {
    val loaded = catalog.loadTable(identifier)
    val md = loaded.metadata
    val r = md.refs.getOrElse(name,
      throw new IllegalArgumentException(s"ref '$name' not found"))
    require(r.refType == BranchRef,
      s"snapshot retention applies to branches only; '$name' is a tag")
    catalog.commitTable(identifier,
      Seq(graft.catalog.AssertTableUuid(md.tableUuid),
        graft.catalog.AssertRefSnapshotId(name, Some(r.snapshotId))),
      Seq(graft.catalog.SetSnapshotRef(name, r.snapshotId, "branch",
        minSnapshotsToKeep, maxSnapshotAgeMs, r.maxRefAgeMs)))
  }

  /** [[dropRef]] on the REST plane (`remove-snapshot-ref`; main protected). */
  def dropRefRest(catalog: graft.catalog.RestCatalog, identifier: Seq[String],
                  name: String): graft.catalog.LoadedTable = {
    require(name != TableMetadata.MainBranch, "cannot drop the main branch")
    val loaded = catalog.loadTable(identifier)
    val md = loaded.metadata
    require(md.refs.contains(name), s"ref '$name' not found")
    catalog.commitTable(identifier,
      Seq(graft.catalog.AssertTableUuid(md.tableUuid)),
      Seq(graft.catalog.RemoveSnapshotRef(name)))
  }

  /** [[rollbackTo]] on the REST plane: move main back to an existing
    * snapshot with a CAS on its current position — a concurrent commit
    * between load and rollback 409s instead of being silently undone. */
  def rollbackToRest(catalog: graft.catalog.RestCatalog,
                     identifier: Seq[String], snapshotId: Long)
      : graft.catalog.LoadedTable = {
    val loaded = catalog.loadTable(identifier)
    val md = loaded.metadata
    require(md.snapshotById(snapshotId).isDefined,
      s"snapshot $snapshotId not found")
    val main = md.refs.get(TableMetadata.MainBranch)
    catalog.commitTable(identifier,
      Seq(graft.catalog.AssertTableUuid(md.tableUuid),
        graft.catalog.AssertRefSnapshotId(TableMetadata.MainBranch,
          main.map(_.snapshotId).orElse(md.currentSnapshotId))),
      Seq(graft.catalog.SetSnapshotRef(TableMetadata.MainBranch, snapshotId,
        "branch", main.flatMap(_.minSnapshotsToKeep),
        main.flatMap(_.maxSnapshotAgeMs), main.flatMap(_.maxRefAgeMs))))
  }

  /** The shared expiry computation (see [[ExpiryPlan]]). */
  private[spark] def computeExpiry(md0: TableMetadata, olderThanMs: Long,
                                   retainLast: Int, now: Long): ExpiryPlan = {
    // ref aging first (Iceberg `max-ref-age-ms`): a branch/tag whose HEAD
    // snapshot is older than its retention window is dropped, so the
    // snapshots it pinned become expirable below. Main never ages out.
    val agedOut = md0.refs.filter { case (name, r) =>
      name != TableMetadata.MainBranch &&
        r.maxRefAgeMs.exists(maxAge =>
          md0.snapshotById(r.snapshotId).exists(now - _.timestampMs > maxAge))
    }.keySet
    val md = md0.copy(refs = md0.refs -- agedOut)
    // Per-branch retention (Iceberg `expire_snapshots` semantics): each
    // branch retains its newest `min-snapshots-to-keep` ancestors plus all
    // ancestors newer than `now - max-snapshot-age-ms`; an unset field
    // falls back to the caller's global args (retainLast / olderThanMs).
    // A branch declaring NEITHER field keeps its whole UNPUBLISHED
    // lineage: fast_forward walks the parent chain to the main ancestor,
    // so expiring an intermediate snapshot would leave such a branch
    // permanently unpublishable — declaring a retention policy is the
    // branch owner's opt-in to trimming that lineage. A snapshot is
    // expirable only when NO branch's policy retains it; snapshots in no
    // branch's ancestry (orphaned heads) are governed by the global
    // `olderThanMs` alone.
    def ancestry(headId: Long): List[Snapshot] = {
      val b = List.newBuilder[Snapshot]
      var cur = md.snapshotById(headId)
      while (cur.isDefined) {
        b += cur.get
        cur = cur.get.parentSnapshotId.flatMap(md.snapshotById)
      }
      b.result()
    }
    val mainAncestry: Set[Long] = md.currentSnapshotId
      .map(ancestry(_).map(_.snapshotId).toSet).getOrElse(Set.empty)
    val branchRefs = md.refs.filter(_._2.refType == BranchRef)
    // one ancestry walk per branch, shared by the retention computation
    // and the referenced set
    val branchAncestry: Map[String, List[Snapshot]] =
      branchRefs.map { case (name, r) => name -> ancestry(r.snapshotId) }
    val retainedByBranch: Set[Long] = branchRefs.flatMap { case (name, r) =>
      val anc = branchAncestry(name)
      val hasPolicy =
        r.minSnapshotsToKeep.isDefined || r.maxSnapshotAgeMs.isDefined
      if (name == TableMetadata.MainBranch || hasPolicy) {
        val minKeep = math.max(1, r.minSnapshotsToKeep.getOrElse(
          if (name == TableMetadata.MainBranch) retainLast else 1))
        val cutoff = r.maxSnapshotAgeMs.map(now - _).getOrElse(olderThanMs)
        anc.zipWithIndex.collect {
          case (s, i) if i < minKeep || s.timestampMs >= cutoff => s.snapshotId
        }
      } else {
        anc.iterator.map(_.snapshotId)
          .takeWhile(id => !mainAncestry.contains(id)).toSeq
      }
    }.toSet
    val referenced: Set[Long] =
      branchAncestry.values.flatten.map(_.snapshotId).toSet
    val keepIds: Set[Long] =
      md.currentSnapshotId.toSet ++
        md.refs.values.map(_.snapshotId) ++
        retainedByBranch ++
        md.snapshots.sortBy(-_.timestampMs).take(math.max(1, retainLast))
          .map(_.snapshotId)
    val (kept, expired) = md.snapshots.partition(s =>
      keepIds.contains(s.snapshotId) ||
        (!referenced.contains(s.snapshotId) && s.timestampMs >= olderThanMs))
    ExpiryPlan(agedOut, kept, expired)
  }

  /** Every path the given snapshots reference: manifest lists, manifests,
    * data/delete files. Parallel driver I/O, each distinct manifest read
    * once even when many snapshots share it. */
  private def reachablePaths(table: IcebergTable, snaps: Seq[Snapshot],
                             liveOnly: Boolean = false): Set[String] = {
    import scala.collection.parallel.CollectionConverters._
    val lists = snaps.map(_.manifestList).distinct
    val manifests = lists.par.flatMap(l =>
      ManifestIO.readManifestList(table.io.open(l))).seq.distinctBy(_.path)
    val dataPaths = manifests.par.flatMap(m =>
      ManifestIO.readManifestEntries(table.io.open(m.path), m,
        discardDeleted = liveOnly).map(_.dataFile.path)).seq
    (lists ++ manifests.map(_.path) ++ dataPaths).toSet
  }

  /** Garbage-collect files under the table location that NO snapshot
    * references (failed writes, aborted commits, files from a crashed
    * driver) and that are older than `olderThanMs` — the grace period
    * protects files written by in-flight commits whose metadata isn't
    * visible yet. Metadata JSONs and the version hint are always kept.
    * Returns (files removed, bytes reclaimed). */
  def removeOrphanFiles(table: IcebergTable, olderThanMs: Long): (Int, Long) = {
    val norm = (p: String) => p.stripPrefix("file:")
    val live = reachablePaths(table, table.metadata.snapshots).map(norm)
    def walk(dir: File): Seq[File] = {
      val fs = Option(dir.listFiles()).getOrElse(Array.empty)
      fs.filter(_.isFile).toSeq ++ fs.filter(_.isDirectory).flatMap(walk)
    }
    // hidden files (.crc sidecars, _SUCCESS markers) are infrastructure,
    // not data — excluded like Iceberg's hidden-path filter
    val candidates = (walk(new File(table.location, "data")) ++
      Option(new File(table.location, "metadata").listFiles())
        .getOrElse(Array.empty).filter(_.getName.endsWith(".avro")))
      .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
    val orphans = candidates.filter(f =>
      !live.contains(norm(f.getPath)) && f.lastModified() < olderThanMs)
    val bytes = orphans.map(_.length()).sum
    orphans.foreach(_.delete())
    (orphans.size, bytes)
  }

  /** Stage an APPEND snapshot for already-written data files: footer stats
    * + task-side NaN counts, one new manifest, previous manifests carried
    * by reference, new manifest list. Pure staging — the returned Snapshot
    * is not yet committed, so the same staging serves both the local-FS
    * CAS commit ([[appendFiles]]) and the REST-catalog `updateTable`
    * commit ([[appendFilesRest]]). */
  private def stageAppendSnapshot(table: IcebergTable,
                                  added: Seq[graft.spark.CowFileOut],
                                  extraSummary: Map[String, String],
                                  parentOverride: Option[Snapshot] = None)
      : Snapshot = {
    val seq = table.metadata.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val metaDir = new File(table.location, "metadata"); metaDir.mkdirs()
    val partType = table.spec.partitionType(table.schema)
    val entries0 = added.sortBy(_.path).map { f =>
      ManifestEntry(ManifestEntryStatus.Added, Some(snapId), Some(seq), Some(seq),
        statsFromFooter(new File(f.path), table.schema,
          f.partition.filter(_._2 != null), DataFileContent.Data, None, f.nanCounts))
    }
    val lineage = assignLineage(table.metadata, entries0)
    val entries = lineage.entries
    val mf = new File(metaDir, s"manifest-$snapId.avro")
    ManifestIO.writeManifest(mf, entries, partType)
    val newManifest = ManifestFile(
      path = mf.getPath, length = mf.length(),
      partitionSpecId = table.spec.specId, content = 0,
      sequenceNumber = seq, minSequenceNumber = seq, addedSnapshotId = snapId,
      addedFilesCount = entries.size, existingFilesCount = 0, deletedFilesCount = 0,
      addedRowsCount = entries.map(_.dataFile.recordCount).sum,
      existingRowsCount = 0, deletedRowsCount = 0,
      partitions = partitionSummaries(entries, partType), formatVersion = 2,
      firstRowId = lineage.manifestFirstRowId)
    val parent = parentOverride.orElse(table.currentSnapshot)
    val prevManifests = liveManifests(parent.toSeq.flatMap { s =>
      ManifestIO.readManifestList(table.io.open(s.manifestList))
    })
    val listFile = new File(metaDir, s"snap-$snapId.avro")
    ManifestIO.writeManifestList(listFile, prevManifests :+ newManifest)
    Snapshot(snapId, parent.map(_.snapshotId), seq,
      System.currentTimeMillis(), listFile.getPath, Some(SnapshotSummary(OpAppend,
        Map("added-data-files" -> entries.size.toString,
          "added-records" -> entries.map(_.dataFile.recordCount).sum.toString,
          // streaming admission control reads this for maxBytesPerTrigger
          // without touching manifests
          "added-files-size" -> entries.map(_.dataFile.fileSizeInBytes).sum.toString)
          ++ extraSummary)),
      Some(table.schema.schemaId),
      firstRowId = lineage.snapshotFirstRowId)
  }

  /** The table's next-row-id after `snapshot` commits: its first-row-id
    * advanced by the rows it added (from the staged summary). Unchanged
    * below V3. */
  private def nextRowIdAfter(md: TableMetadata, snapshot: Snapshot): Option[Long] =
    snapshot.firstRowId match {
      case Some(base) => Some(base + snapshot.summary
        .flatMap(_.properties.get("added-records")).map(_.toLong).getOrElse(0L))
      case None => md.nextRowId
    }

  /** Append an APPEND snapshot from already-written data files (the
    * streaming sink's per-epoch commit) to a local-FS CAS table. */
  def appendFiles(location: String, added: Seq[graft.spark.CowFileOut],
                  extraSummary: Map[String, String] = Map.empty,
                  branch: Option[String] = None): IcebergTable = {
    val table = IcebergTables.load(location)
    val md = table.metadata
    branch.filter(_ != TableMetadata.MainBranch) match {
      case Some(b) =>
        // staged append (WAP): parent at the branch head, only the branch
        // ref moves — main / snapshot log / current are published state
        val parent = md.refs.get(b) match {
          case Some(r) =>
            require(r.refType == BranchRef, s"ref '$b' is a tag, not a branch")
            md.snapshotById(r.snapshotId)
          case None => table.currentSnapshot
        }
        val snapshot = stageAppendSnapshot(table,
          added, extraSummary + ("branch" -> b), parentOverride = parent)
        writeMetadata(location, md.copy(
          lastSequenceNumber = snapshot.sequenceNumber,
          lastUpdatedMs = snapshot.timestampMs,
          snapshots = md.snapshots :+ snapshot,
          refs = advRef(md.refs, b, snapshot.snapshotId),
          nextRowId = nextRowIdAfter(md, snapshot)),
          table.loadedVersion + 1)
      case None =>
        val snapshot = stageAppendSnapshot(table, added, extraSummary)
        writeMetadata(location, md.copy(
          lastSequenceNumber = snapshot.sequenceNumber,
          lastUpdatedMs = snapshot.timestampMs,
          snapshots = md.snapshots :+ snapshot,
          currentSnapshotId = Some(snapshot.snapshotId),
          snapshotLog = md.snapshotLog :+
            SnapshotLogEntry(snapshot.snapshotId, snapshot.timestampMs),
          refs = advRef(md.refs, TableMetadata.MainBranch, snapshot.snapshotId),
          nextRowId = nextRowIdAfter(md, snapshot)),
          table.loadedVersion + 1)
    }
    IcebergTables.load(location)
  }

  /** Write-audit-publish: append `df` to a BRANCH — the snapshot forks
    * from the branch head (or main, for a new branch), only the branch ref
    * moves; main and every reader of it are untouched until
    * [[fastForward]] publishes. Same distributed write + staging as a
    * main-line append. */
  def appendToBranch(table: IcebergTable, df: DataFrame,
                     branch: String): IcebergTable = {
    require(branch != TableMetadata.MainBranch,
      "use append() for the main branch")
    val md = table.metadata
    val parent = md.refs.get(branch) match {
      case Some(r) =>
        require(r.refType == BranchRef, s"ref '$branch' is a tag, not a branch")
        md.snapshotById(r.snapshotId)
      case None => table.currentSnapshot
    }
    val snapId0 = System.nanoTime()
    val dataDir = new File(table.location, s"data/snap-$snapId0")
    val outs = writeDistributed(df, dataDir, table.schema, table.spec,
      table.properties, SortOrder.unsorted, preClustered = false)
    val snapshot = stageAppendSnapshot(table, outs,
      Map("branch" -> branch), parentOverride = parent)
    writeMetadata(table.location, md.copy(
      lastSequenceNumber = snapshot.sequenceNumber,
      lastUpdatedMs = snapshot.timestampMs,
      snapshots = md.snapshots :+ snapshot,
      // current snapshot, snapshot log, and main are all UNPUBLISHED state
      refs = advRef(md.refs, branch, snapshot.snapshotId),
      nextRowId = nextRowIdAfter(md, snapshot)),
      table.loadedVersion + 1)
    IcebergTables.load(table.location)
  }

  /** Stage-commit WAP (Iceberg's `spark.wap.id` flavor): append `df` as a
    * snapshot OUTSIDE every ref's lineage — it forks from the current main
    * head and its summary carries `wap.id`, but NO ref moves, so every
    * reader (main, branches, tags) is untouched. Audit via
    * `VERSION AS OF <snapshot_id>` or the snapshots metadata table
    * filtered on `wap.id`; publish with [[cherrypickSnapshot]], which
    * re-commits the staged files at the then-current head (so publish
    * works whether or not main moved — unlike a branch fast-forward).
    * A wap id that was already staged or published is refused (Iceberg's
    * duplicate-WAP guard). Staged-and-never-published snapshots age out
    * through [[expireSnapshots]] like any unreferenced snapshot. */
  def stageWapAppend(table: IcebergTable, df: DataFrame,
                     wapId: String): IcebergTable = {
    require(wapId.trim.nonEmpty, "wap id must be non-empty")
    val md = table.metadata
    val dup = md.snapshots.find(_.summary.exists(s =>
      s.properties.get("wap.id").contains(wapId) ||
        s.properties.get("published-wap-id").contains(wapId)))
    require(dup.isEmpty,
      s"wap.id '$wapId' was already staged or published " +
        s"(snapshot ${dup.map(_.snapshotId).getOrElse(-1L)})")
    val snapId0 = System.nanoTime()
    val dataDir = new File(table.location, s"data/snap-$snapId0")
    val outs = writeDistributed(df, dataDir, table.schema, table.spec,
      table.properties, SortOrder.unsorted, preClustered = false)
    val snapshot = stageAppendSnapshot(table, outs, Map("wap.id" -> wapId))
    writeMetadata(table.location, md.copy(
      lastSequenceNumber = snapshot.sequenceNumber,
      lastUpdatedMs = snapshot.timestampMs,
      snapshots = md.snapshots :+ snapshot,
      // deliberately NO ref / current-snapshot / snapshot-log change: the
      // stage is invisible until cherrypickSnapshot publishes it
      nextRowId = nextRowIdAfter(md, snapshot)),
      table.loadedVersion + 1)
    IcebergTables.load(table.location)
  }

  /** Publish a branch: fast-forward `toRef` onto main. Requires main's
    * head to be an ancestor of the branch head (pure fast-forward — no
    * merge semantics), which also makes the move safe for readers: every
    * main row survives on the branch unless a branch commit removed it. */
  def fastForward(table: IcebergTable, branch: String): IcebergTable = {
    val md = table.metadata
    val ref = md.refs.getOrElse(branch,
      throw new IllegalArgumentException(s"ref '$branch' not found"))
    val head = md.snapshotById(ref.snapshotId).getOrElse(
      throw new IllegalStateException(s"branch '$branch' head missing"))
    val mainHead = md.currentSnapshotId
    // ancestry walk: branch head → parents must pass through main's head
    @annotation.tailrec
    def isAncestor(of: Option[Long]): Boolean = of match {
      case None => mainHead.isEmpty
      case Some(id) if mainHead.contains(id) => true
      case Some(id) => isAncestor(md.snapshotById(id).flatMap(_.parentSnapshotId))
    }
    require(isAncestor(Some(head.snapshotId)),
      s"main is not an ancestor of '$branch' — cannot fast-forward")
    val now = System.currentTimeMillis()
    writeMetadata(table.location, md.copy(
      currentSnapshotId = Some(head.snapshotId),
      lastUpdatedMs = now,
      snapshotLog = md.snapshotLog :+ SnapshotLogEntry(head.snapshotId, now),
      refs = advRef(md.refs, TableMetadata.MainBranch, head.snapshotId)),
      table.loadedVersion + 1)
    IcebergTables.load(table.location)
  }

  /** Cherry-pick an APPEND snapshot onto the current main head (Iceberg's
    * `cherrypick_snapshot`): the snapshot's added data files are
    * re-committed as a NEW append at the head — the publish path for a WAP
    * branch commit when main has MOVED since the branch forked
    * ([[fastForward]]'s ancestry guard rejects exactly that case).
    *
    * Only append snapshots are re-applied: an append commutes with any
    * interleaved commit (its rows carry the new, highest sequence number,
    * so older deletes can't silently apply to them), while replays of
    * overwrites/deletes could resurrect or re-kill rows they never saw.
    * Re-publishing is metadata-only — the source manifests' ADDED entries
    * are rewritten (per their ORIGINAL spec) with the new snapshot's
    * sequence number; the data files are referenced in place. */
  def cherrypickSnapshot(table: IcebergTable, snapshotId: Long): IcebergTable = {
    val md = table.metadata
    val snapshot = stageCherrypick(table, snapshotId)
    val now = snapshot.timestampMs
    writeMetadata(table.location, md.copy(
      lastSequenceNumber = snapshot.sequenceNumber, lastUpdatedMs = now,
      snapshots = md.snapshots :+ snapshot,
      currentSnapshotId = Some(snapshot.snapshotId),
      snapshotLog = md.snapshotLog :+
        SnapshotLogEntry(snapshot.snapshotId, now),
      refs = advRef(md.refs, TableMetadata.MainBranch, snapshot.snapshotId)),
      table.loadedVersion + 1)
    IcebergTables.load(table.location)
  }

  /** The staging body of [[cherrypickSnapshot]] (re-written manifests +
    * manifest list on disk, no metadata commit) — shared with the REST
    * plane ([[cherrypickSnapshotRest]]). */
  private def stageCherrypick(table: IcebergTable,
                              snapshotId: Long): Snapshot = {
    val md = table.metadata
    val snap = md.snapshotById(snapshotId).getOrElse(
      throw new IllegalArgumentException(s"snapshot $snapshotId not found"))
    require(snap.summary.exists(_.operation == OpAppend),
      s"only append snapshots can be cherry-picked; $snapshotId is " +
        snap.summary.map(_.operation.repr).getOrElse("unknown"))
    // already-published guard: if the snapshot is an ancestor of main's
    // head — or a previous cherry-pick of it is (summary provenance) —
    // re-applying it would duplicate its rows
    @annotation.tailrec
    def published(of: Option[Long]): Boolean = of match {
      case None => false
      case Some(id) if id == snapshotId => true
      case Some(id) =>
        val s = md.snapshotById(id)
        if (s.exists(_.summary.exists(_.properties.get("source-snapshot-id")
            .contains(snapshotId.toString)))) true
        else published(s.flatMap(_.parentSnapshotId))
    }
    require(!published(md.currentSnapshotId),
      s"snapshot $snapshotId is already published in main's lineage")

    val parentManifestPaths = snap.parentSnapshotId.flatMap(md.snapshotById)
      .toSeq.flatMap(p => ManifestIO.readManifestList(table.io.open(p.manifestList)))
      .map(_.path).toSet
    val addedManifests = ManifestIO.readManifestList(table.io.open(snap.manifestList))
      .filterNot(m => parentManifestPaths.contains(m.path))
    require(addedManifests.forall(_.content == 0),
      s"snapshot $snapshotId added delete manifests — not cherry-pickable")

    val seq = md.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val metaDir = new File(table.location, "metadata"); metaDir.mkdirs()
    val partTypeOf: Int => StructT = specId =>
      md.partitionSpecs.find(_.specId == specId)
        .map(_.partitionType(table.schema))
        .getOrElse(table.spec.partitionType(table.schema))
    val newManifests = addedManifests.zipWithIndex.map { case (m, i) =>
      val added = ManifestIO.readManifestEntries(table.io.open(m.path), m)
        .filter(e => e.status == ManifestEntryStatus.Added &&
          e.snapshotId.contains(snap.snapshotId))
      val entries = added.map(e => ManifestEntry(
        ManifestEntryStatus.Added, Some(snapId), Some(seq), Some(seq), e.dataFile))
      val mf = new File(metaDir, s"manifest-pick-$snapId-$i.avro")
      ManifestIO.writeManifest(mf, entries, partTypeOf(m.partitionSpecId))
      ManifestFile(
        path = mf.getPath, length = mf.length(),
        partitionSpecId = m.partitionSpecId, content = 0,
        sequenceNumber = seq, minSequenceNumber = seq, addedSnapshotId = snapId,
        addedFilesCount = entries.size, existingFilesCount = 0,
        deletedFilesCount = 0,
        addedRowsCount = entries.map(_.dataFile.recordCount).sum,
        existingRowsCount = 0, deletedRowsCount = 0,
        partitions = partitionSummaries(entries, partTypeOf(m.partitionSpecId)),
        formatVersion = 2)
    }
    val prevManifests = liveManifests(table.currentSnapshot.toSeq.flatMap { s =>
      ManifestIO.readManifestList(table.io.open(s.manifestList))
    })
    val listFile = new File(metaDir, s"snap-$snapId.avro")
    ManifestIO.writeManifestList(listFile, prevManifests ++ newManifests)
    val now = System.currentTimeMillis()
    val snapshot = Snapshot(snapId, table.currentSnapshot.map(_.snapshotId), seq,
      now, listFile.getPath,
      Some(SnapshotSummary(OpAppend, Map(
        "source-snapshot-id" -> snapshotId.toString,
        "added-data-files" -> newManifests.map(_.addedFilesCount).sum.toString,
        "added-records" -> newManifests.map(_.addedRowsCount).sum.toString)
        // publishing a WAP stage stamps its id, so the duplicate-WAP
        // guard holds even after the staged snapshot itself is expired
        ++ snap.summary.flatMap(_.properties.get("wap.id"))
          .map("published-wap-id" -> _))),
      Some(table.schema.schemaId))
    snapshot
  }

  /** [[cherrypickSnapshot]] against a REST-catalog table: the same
    * metadata-only re-commit, landing as add-snapshot + set-snapshot-ref
    * through the server, pinned to the loaded main head (a concurrent
    * publish conflicts instead of double-applying). */
  def cherrypickSnapshotRest(catalog: graft.catalog.RestCatalog,
                             identifier: Seq[String], snapshotId: Long)
      : graft.catalog.LoadedTable = {
    val loaded = catalog.loadTable(identifier)
    val snapshot = stageCherrypick(restTableOf(loaded), snapshotId)
    val change = restChangeFor(loaded.metadata, identifier, snapshot)
    catalog.commitTable(identifier, change.requirements, change.updates)
  }

  /** [[fastForward]] against a REST-catalog table: the ancestry guard
    * runs on the loaded metadata; the publish itself is ONE
    * set-snapshot-ref(main) update pinned to both the branch head and
    * main's current head. */
  def fastForwardRest(catalog: graft.catalog.RestCatalog,
                      identifier: Seq[String], branch: String)
      : graft.catalog.LoadedTable = {
    val loaded = catalog.loadTable(identifier)
    val md = loaded.metadata
    val ref = md.refs.getOrElse(branch,
      throw new IllegalArgumentException(s"ref '$branch' not found"))
    val head = md.snapshotById(ref.snapshotId).getOrElse(
      throw new IllegalStateException(s"branch '$branch' head missing"))
    val mainHead = md.currentSnapshotId
    @annotation.tailrec
    def isAncestor(of: Option[Long]): Boolean = of match {
      case None => mainHead.isEmpty
      case Some(id) if mainHead.contains(id) => true
      case Some(id) => isAncestor(md.snapshotById(id).flatMap(_.parentSnapshotId))
    }
    require(isAncestor(Some(head.snapshotId)),
      s"main is not an ancestor of '$branch' — cannot fast-forward")
    catalog.commitTable(identifier,
      Seq(graft.catalog.AssertTableUuid(md.tableUuid),
        graft.catalog.AssertRefSnapshotId(TableMetadata.MainBranch,
          md.refs.get(TableMetadata.MainBranch).map(_.snapshotId)
            .orElse(mainHead)),
        graft.catalog.AssertRefSnapshotId(branch, Some(head.snapshotId))),
      Seq(graft.catalog.SetSnapshotRef(TableMetadata.MainBranch,
        head.snapshotId)))
  }

  /** [[stageWapAppend]] against a REST-catalog table: the staged snapshot
    * commits as add-snapshot with NO ref move — invisible to every reader
    * until published ([[cherrypickSnapshotRest]]). */
  def stageWapAppendRest(catalog: graft.catalog.RestCatalog,
                         identifier: Seq[String], df: DataFrame,
                         wapId: String): graft.catalog.LoadedTable = {
    require(wapId.trim.nonEmpty, "wap id must be non-empty")
    val loaded = catalog.loadTable(identifier)
    val md = loaded.metadata
    val dup = md.snapshots.find(_.summary.exists(s =>
      s.properties.get("wap.id").contains(wapId) ||
        s.properties.get("published-wap-id").contains(wapId)))
    require(dup.isEmpty,
      s"wap.id '$wapId' was already staged or published " +
        s"(snapshot ${dup.map(_.snapshotId).getOrElse(-1L)})")
    val table = restTableOf(loaded)
    val dataDir = new File(table.location, s"data/snap-${System.nanoTime()}")
    val outs = writeDistributed(alignForWrite(df, table.schema), dataDir,
      table.schema, table.spec, table.properties, SortOrder.unsorted,
      preClustered = false)
    val snapshot = stageAppendSnapshot(table, outs, Map("wap.id" -> wapId))
    val committed = catalog.commitTable(identifier,
      Seq(graft.catalog.AssertTableUuid(md.tableUuid)),
      Seq(graft.catalog.AddSnapshot(snapshot)))
    snapshot.firstRowId.foreach(base => verifyLineageAdvanced(identifier,
      base + outs.map(_.rows).sum,
      committed.metadata.nextRowId.getOrElse(0L)))
    committed
  }

  /** [[appendToBranch]] against a REST-catalog table: the snapshot forks
    * from the branch head (or main, for a new branch) and ONLY the branch
    * ref moves — add-snapshot + set-snapshot-ref(branch), pinned to the
    * branch's loaded head so concurrent branch commits conflict. */
  def appendToBranchRest(catalog: graft.catalog.RestCatalog,
                         identifier: Seq[String], df: DataFrame,
                         branch: String): graft.catalog.LoadedTable = {
    require(branch != TableMetadata.MainBranch,
      "use appendRest() for the main branch")
    val loaded = catalog.loadTable(identifier)
    val md = loaded.metadata
    val parent = md.refs.get(branch) match {
      case Some(r) =>
        require(r.refType == BranchRef, s"ref '$branch' is a tag, not a branch")
        md.snapshotById(r.snapshotId)
      case None => md.currentSnapshot
    }
    val table = restTableOf(loaded)
    val dataDir = new File(table.location, s"data/snap-${System.nanoTime()}")
    val outs = writeDistributed(alignForWrite(df, table.schema), dataDir,
      table.schema, table.spec, table.properties, SortOrder.unsorted,
      preClustered = false)
    commitFilesToBranchRest(catalog, identifier, loaded, parent, outs, branch,
      Map.empty)
  }

  /** Files-based twin of [[appendToBranchRest]] — already-written data
    * files commit as one APPEND on `branch` through the server (the
    * streaming sink's WAP-branch epoch path). */
  def appendFilesToBranchRest(catalog: graft.catalog.RestCatalog,
                              identifier: Seq[String],
                              added: Seq[graft.spark.CowFileOut],
                              branch: String,
                              extraSummary: Map[String, String] = Map.empty)
      : graft.catalog.LoadedTable = {
    require(branch != TableMetadata.MainBranch,
      "use appendFilesRest() for the main branch")
    val loaded = catalog.loadTable(identifier)
    val md = loaded.metadata
    val parent = md.refs.get(branch) match {
      case Some(r) =>
        require(r.refType == BranchRef, s"ref '$branch' is a tag, not a branch")
        md.snapshotById(r.snapshotId)
      case None => md.currentSnapshot
    }
    commitFilesToBranchRest(catalog, identifier, loaded, parent, added,
      branch, extraSummary)
  }

  private def commitFilesToBranchRest(catalog: graft.catalog.RestCatalog,
                                      identifier: Seq[String],
                                      loaded: graft.catalog.LoadedTable,
                                      parent: Option[Snapshot],
                                      outs: Seq[graft.spark.CowFileOut],
                                      branch: String,
                                      extraSummary: Map[String, String])
      : graft.catalog.LoadedTable = {
    val md = loaded.metadata
    val table = restTableOf(loaded)
    val snapshot = stageAppendSnapshot(table, outs,
      Map("branch" -> branch) ++ extraSummary, parentOverride = parent)
    val committed = catalog.commitTable(identifier,
      Seq(graft.catalog.AssertTableUuid(md.tableUuid),
        graft.catalog.AssertRefSnapshotId(branch,
          md.refs.get(branch).map(_.snapshotId))),
      Seq(graft.catalog.AddSnapshot(snapshot),
        graft.catalog.SetSnapshotRef(branch, snapshot.snapshotId)))
    snapshot.firstRowId.foreach(base => verifyLineageAdvanced(identifier,
      base + outs.map(_.rows).sum,
      committed.metadata.nextRowId.getOrElse(0L)))
    committed
  }

  /** Import EXISTING parquet files into the table without rewriting them
    * (Iceberg's `add_files` migration path): footer-derived per-column
    * stats go into a new APPEND snapshot's manifest; hive-style `k=v`
    * path segments map to identity partition values. The files are
    * referenced in place — id-less footers are fine, the read path
    * resolves them by name. */
  def addFiles(table: IcebergTable, sourceDir: String,
               restCommit: Option[(graft.catalog.RestCatalog, Seq[String],
                 graft.catalog.LoadedTable)] = None): IcebergTable = {
    def walk(f: File): Seq[File] = {
      val fs = Option(f.listFiles()).getOrElse(Array.empty)
      fs.filter(x => x.isFile && x.getName.endsWith(".parquet") &&
        !x.getName.startsWith(".") && !x.getName.startsWith("_")).toSeq ++
        fs.filter(_.isDirectory).flatMap(walk)
    }
    val files = walk(new File(sourceDir)).sortBy(_.getPath)
    require(files.nonEmpty, s"no parquet files under $sourceDir")
    val identityFields = table.spec.fields.collect {
      case pf if pf.transform == IdentityTransform =>
        pf.name -> table.schema.findFieldById(pf.sourceId).get
    }.toMap
    def partitionOf(f: File): Map[String, Any] = {
      val segs = f.getPath.stripPrefix(sourceDir).split('/').filter(_.contains('='))
      segs.flatMap { seg =>
        val Array(k, v) = seg.split("=", 2)
        identityFields.get(k).map { field =>
          val value: Any =
            if (v == "null" || v.isEmpty) null
            else field.fieldType match {
              case IntT => Integer.valueOf(v)
              case LongT => java.lang.Long.valueOf(v)
              case StringT => v
              case DateT => Integer.valueOf(
                java.time.LocalDate.parse(v).toEpochDay.toInt)
              case BooleanT => java.lang.Boolean.valueOf(v)
              case DoubleT => java.lang.Double.valueOf(v)
              case FloatT => java.lang.Float.valueOf(v)
              case other => throw new UnsupportedOperationException(
                s"add_files: partition value of type $other not parseable")
            }
          k -> value
        }
      }.toMap
    }
    if (identityFields.size != table.spec.fields.size)
      throw new UnsupportedOperationException(
        "add_files requires identity partitioning (or none): transformed " +
          "partition values cannot be inferred from paths")
    val outs = files.map(f =>
      graft.spark.CowFileOut(f.getPath, 0L, partitionOf(f), Map.empty))
    restCommit match {
      case Some((rc, id, _)) =>
        // appends commute: no head pin needed, same as appendFilesRest's
        // own INSERT path (stageRestAppendChange re-loads fresh)
        restTableOf(
          appendFilesRest(rc, id, outs, Map("added-by" -> "add_files")), rc)
      case None =>
        appendFiles(table.location, outs, Map("added-by" -> "add_files"))
    }
  }

  /** Append already-written data files to a REST-catalog table: stage the
    * manifest + manifest list under the table location, then commit via
    * the catalog's `updateTable` route as `add-snapshot` +
    * `set-snapshot-ref`, guarded by `assert-table-uuid` and
    * `assert-ref-snapshot-id(main)` so a concurrent commit surfaces as
    * [[graft.catalog.CommitConflictError]] instead of clobbering. (The
    * reference's REST catalog panics on any commit, rest.go:418-424.) */
  def appendFilesRest(catalog: graft.catalog.RestCatalog, identifier: Seq[String],
                      added: Seq[graft.spark.CowFileOut],
                      extraSummary: Map[String, String] = Map.empty)
      : graft.catalog.LoadedTable = {
    val (change, stampedPast) =
      stageRestAppendChange(catalog, identifier, added, extraSummary)
    val committed = catalog.commitTable(identifier, change.requirements,
      change.updates)
    stampedPast.foreach(p =>
      verifyLineageAdvanced(identifier, p,
        committed.metadata.nextRowId.getOrElse(0L)))
    committed
  }

  /** Stage an append against a REST table WITHOUT committing — the
    * manifest + manifest list land under the table location, the commit
    * (requirements + updates) is returned for [[RestTransaction]].
    * V3 lineage is client-assigned from the loaded `next-row-id`, exactly
    * as [[appendFilesRest]]. Returns the change and, for V3, the row-id
    * watermark the server must advance past. */
  private def stageRestAppendChange(catalog: graft.catalog.RestCatalog,
                                    identifier: Seq[String],
                                    added: Seq[graft.spark.CowFileOut],
                                    extraSummary: Map[String, String])
      : (graft.catalog.TableChange, Option[Long]) = {
    val loaded = catalog.loadTable(identifier)
    val md = loaded.metadata
    val table = new IcebergTable(md.location, loaded.metadataLocation, md,
      IOConfig.fileIO(loaded.ioProps), ioProps = loaded.ioProps)
    val snapshot = stageAppendSnapshot(table, added, extraSummary)
    val change = graft.catalog.TableChange(identifier,
      Seq(graft.catalog.AssertTableUuid(md.tableUuid),
        graft.catalog.AssertRefSnapshotId(TableMetadata.MainBranch,
          md.refs.get(TableMetadata.MainBranch).map(_.snapshotId)
            .orElse(md.currentSnapshotId))),
      Seq(graft.catalog.AddSnapshot(snapshot),
        setMainRefUpdate(md, snapshot.snapshotId)))
    (change, snapshot.firstRowId.map(_ + added.map(_.rows).sum))
  }

  /** A server whose update applier ignores AddSnapshot's first-row-id
    * would hand the SAME base to the next commit — duplicate _row_id is
    * silent corruption for every incremental consumer, so fail loudly. */
  private def verifyLineageAdvanced(identifier: Seq[String],
                                    stampedPast: Long,
                                    serverNext: Long): Unit =
    require(serverNext >= stampedPast,
      s"REST catalog did not advance next-row-id past " +
        s"${identifier.mkString(".")}'s committed rows (stamped through " +
        s"$stampedPast, server next-row-id $serverNext): the server does " +
        "not apply AddSnapshot row lineage — refusing to continue with " +
        "duplicate _row_id assignment")

  // ------------------------------------------------- SQL DML on REST tables
  // DataFrame-level twins of append/overwrite/deleteWhere/deleteEquality
  // that commit through the server's update actions instead of writing
  // metadata files behind it — the bridge that lets SQL INSERT/DELETE/
  // UPDATE/MERGE run on REST-cataloged tables (the reference PANICS on any
  // REST commit, rest.go:418-424).

  /** Schema evolution on a REST-cataloged table: run `evolve` (any chain
    * of the TableWriter evolution functions) against a local SCRATCH copy
    * of the loaded metadata — metadata-only, nothing under the real table
    * location is touched — then commit only the RESULT as the spec's
    * `add-schema` + `set-current-schema(-1)` actions, guarded by
    * `assert-current-schema-id` so racing evolutions conflict instead of
    * clobbering. The write-time `mergeSchema` path and SQL ALTER both ride
    * this, so the two planes can never diverge on evolution semantics. */
  def evolveSchemaRest(catalog: graft.catalog.RestCatalog,
                       identifier: Seq[String],
                       evolve: IcebergTable => IcebergTable)
      : graft.catalog.LoadedTable = {
    val loaded = catalog.loadTable(identifier)
    val md = loaded.metadata
    val scratch =
      java.nio.file.Files.createTempDirectory("graft_rest_evolve").toFile
    val metaDir = new File(scratch, "metadata"); metaDir.mkdirs()
    Files.writeString(new File(metaDir, "v1.metadata.json").toPath, md.toJson)
    val t = evolve(IcebergTables.load(scratch.getPath))
    if (t.metadata.currentSchemaId == md.currentSchemaId &&
        t.metadata.currentSchema == md.currentSchema) return loaded
    catalog.commitTable(identifier,
      Seq(graft.catalog.AssertTableUuid(md.tableUuid),
        graft.catalog.AssertCurrentSchemaId(md.currentSchemaId)),
      Seq(graft.catalog.AddSchema(t.metadata.currentSchema,
        Some(t.metadata.lastColumnId)),
        graft.catalog.SetCurrentSchema(-1)))
  }

  /** SQL INSERT INTO (append) on a REST-cataloged table: one distributed
    * parquet write under the table location, then the [[appendFilesRest]]
    * commit. No pin needed — appends commute, and the commit's
    * assert-ref guard still surfaces genuinely conflicting table changes
    * (schema swap, uuid change) as [[graft.catalog.CommitConflictError]]. */
  def appendRest(catalog: graft.catalog.RestCatalog, identifier: Seq[String],
                 df: DataFrame): graft.catalog.LoadedTable = {
    val loaded = catalog.loadTable(identifier)
    val table = restTableOf(loaded)
    val dataDir = new File(table.location, s"data/snap-${System.nanoTime()}")
    val outs = writeDistributed(alignForWrite(df, table.schema), dataDir,
      table.schema, table.spec, table.properties, table.sortOrder,
      preClustered = false)
    appendFilesRest(catalog, identifier, outs)
  }

  /** SQL INSERT OVERWRITE / TRUNCATE on a REST-cataloged table: every live
    * data file at THIS load retracts and the new rows land in one
    * OVERWRITE snapshot. The commit pins main to this load's head
    * (`basedOn`), so a commit that lands between the file enumeration and
    * this commit conflicts at the server instead of being silently
    * clobbered. */
  def overwriteRest(catalog: graft.catalog.RestCatalog, identifier: Seq[String],
                    df: DataFrame): graft.catalog.LoadedTable = {
    val loaded = catalog.loadTable(identifier)
    val table = restTableOf(loaded)
    val removed = table.newScan().planFilesLocal().map(_.file.path).toSet
    val dataDir = new File(table.location, s"data/snap-${System.nanoTime()}")
    val outs = writeDistributed(alignForWrite(df, table.schema), dataDir,
      table.schema, table.spec, table.properties, table.sortOrder,
      preClustered = false)
    replaceFilesRest(catalog, identifier, removed, outs, basedOn = Some(loaded))
  }

  /** SQL DELETE with key-equality predicates on a REST-cataloged table:
    * the [[deleteEquality]] shape — an equality-delete manifest, zero data
    * scan, O(keys) — committed through the server, pinned to the load's
    * main head. */
  def deleteEqualityRest(catalog: graft.catalog.RestCatalog,
                         identifier: Seq[String], keys: DataFrame,
                         keyCols: Seq[String]): graft.catalog.LoadedTable = {
    val loaded = catalog.loadTable(identifier)
    val table = restTableOf(loaded)
    val spark = keys.sparkSession
    val emptyRows = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      SchemaConv.toSparkSchema(table.schema))
    val snapshot = stageEqualitySnapshot(table, keys, keyCols, emptyRows)
    val change = restChangeFor(loaded.metadata, identifier, snapshot)
    catalog.commitTable(identifier, change.requirements, change.updates)
  }

  /** SQL DELETE with an arbitrary pushable predicate on a REST-cataloged
    * table: ONE distributed scan computes (file, pos) tombstones —
    * [[deleteWhere]]'s plan shape — and the delta snapshot commits
    * through the server, pinned to the scanned load's main head. V2
    * commits the tombstone files directly; V3 re-homes them into
    * deletion vectors ([[commitDeltaDvRest]]), the same fork the local
    * path takes. */
  def deleteWhereRest(catalog: graft.catalog.RestCatalog,
                      identifier: Seq[String],
                      spark: org.apache.spark.sql.SparkSession,
                      predicate: Column): graft.catalog.LoadedTable = {
    val loaded = catalog.loadTable(identifier)
    val table = restTableOf(loaded)
    val snapId = System.nanoTime()
    val delDir = new File(table.location, s"data/deletes-$snapId")
    table.newScan().toDF(spark, keepProvenance = true)
      .filter(predicate)
      .select(col("__path").as("file_path"), col("__pos").as("pos"))
      .orderBy("file_path", "pos")
      .write.parquet(delDir.getPath)
    val delFiles = listParquet(delDir).map(_.getPath)
    if (loaded.metadata.formatVersion >= 3)
      commitDeltaDvRest(catalog, identifier, loaded, Nil, delFiles)
    else commitDeltaRest(catalog, identifier, loaded, Nil, delFiles)
  }

  /** MoR delta commit (positional tombstones + appended files in ONE
    * snapshot — [[commitDelta]]'s shape) against a REST table, pinned to
    * `basedOn`'s main head: the scan that produced the tombstone
    * coordinates read that load, so any commit in between invalidates the
    * positions and must conflict (serializable semantics; the local
    * path's opt-in snapshot isolation is not expressible in an assert-ref
    * guard, so REST deltas stay at the stricter default). */
  def commitDeltaRest(catalog: graft.catalog.RestCatalog,
                      identifier: Seq[String],
                      basedOn: graft.catalog.LoadedTable,
                      added: Seq[graft.spark.CowFileOut],
                      posDeleteFiles: Seq[String]): graft.catalog.LoadedTable = {
    val table = restTableOf(basedOn)
    val snapshot = stageDeltaSnapshot(table, added, posDeleteFiles)
    val change = restChangeFor(basedOn.metadata, identifier, snapshot)
    val committed = catalog.commitTable(identifier, change.requirements,
      change.updates)
    snapshot.firstRowId.foreach(base => verifyLineageAdvanced(identifier,
      base + added.map(_.rows).sum,
      committed.metadata.nextRowId.getOrElse(0L)))
    committed
  }

  /** V3 twin of [[commitDeltaRest]] — MoR SQL DML on a V3 REST table: the
    * task tombstones re-home into deletion vectors exactly as
    * [[commitDeltaDv]] does locally (fold prior deletes, one DV per
    * touched file), and the DV snapshot commits through the server pinned
    * to `basedOn`'s main head. The table must already BE V3: DML never
    * silently upgrades the format ([[upgradeFormatVersionRest]] is the
    * explicit flip, via ALTER TABLE SET TBLPROPERTIES). */
  def commitDeltaDvRest(catalog: graft.catalog.RestCatalog,
                        identifier: Seq[String],
                        basedOn: graft.catalog.LoadedTable,
                        added: Seq[graft.spark.CowFileOut],
                        posDeleteFiles: Seq[String])
      : graft.catalog.LoadedTable = {
    if (posDeleteFiles.isEmpty)
      return commitDeltaRest(catalog, identifier, basedOn, added, Nil)
    require(basedOn.metadata.formatVersion >= 3,
      "DV delta over REST requires a V3 table (DML must not silently " +
        "upgrade the format — run ALTER TABLE ... SET TBLPROPERTIES " +
        "('format-version'='3') first)")
    val spark = org.apache.spark.sql.SparkSession.active
    val table = restTableOf(basedOn)
    import org.apache.spark.sql.functions.regexp_replace
    val seq = table.metadata.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val metaDir = new File(table.location, "metadata"); metaDir.mkdirs()
    val delDir = new File(table.location, s"data/dv-$snapId"); delDir.mkdirs()
    val newDead = spark.read.parquet(posDeleteFiles: _*)
      .select(regexp_replace(col("file_path"), "^file:(//)?", "")
        .as("file_path"), col("pos"))
    val (dead, priorDvs) =
      foldPriorDeletes(spark, newDead, table.newScan().planFiles())
    val dvFiles = writeDvFiles(spark, dead, priorDvs, delDir, snapId, seq)
    val (snapshot, _) = stageDvSnapshot(table, added, dvFiles, _ => false,
      if (added.isEmpty) OpDelete else OpOverwrite, Map.empty,
      snapId, seq, metaDir)
    val change = restChangeFor(basedOn.metadata, identifier, snapshot)
    val committed = catalog.commitTable(identifier, change.requirements,
      change.updates)
    posDeleteFiles.foreach(p => new File(p).delete())
    snapshot.firstRowId.foreach(base => verifyLineageAdvanced(identifier,
      base + added.map(_.rows).sum,
      committed.metadata.nextRowId.getOrElse(0L)))
    committed
  }

  /** REST twin of [[upgradeFormatVersion]] — `ALTER TABLE ... SET
    * TBLPROPERTIES ('format-version'='N')` on a REST-cataloged table.
    * 1→2, and →3 with no live positional tombstones, is ONE
    * `upgrade-format-version` update action (pure metadata flip, no
    * snapshot). →3 with live parquet tombstones stages the SAME DV
    * re-home snapshot the local plane commits (dangling tombstones of
    * vanished files drop; files that already have DVs keep them and their
    * dead-weight tombstone entries retire without folding) and rides it
    * in the SAME commit as the format flip, pinned to the enumerating
    * load's main head — so a racing commit 409s rather than having its
    * tombstones silently ignored under V3, and a reader observes either
    * the V2 table with tombstones or the V3 table with DVs, never the
    * broken intermediate. At 100 TB the re-home is O(live tombstone
    * rows), not O(table): data files are untouched; only delete
    * coordinates shuffle (grouped per touched data file). */
  def upgradeFormatVersionRest(catalog: graft.catalog.RestCatalog,
                               identifier: Seq[String],
                               basedOn: graft.catalog.LoadedTable,
                               spark: org.apache.spark.sql.SparkSession,
                               target: Int): graft.catalog.LoadedTable = {
    import org.apache.spark.sql.functions.regexp_replace
    val md = basedOn.metadata
    require(target >= 2 && target <= 3,
      s"unsupported format-version $target (this engine writes 2 and 3)")
    require(target >= md.formatVersion,
      s"cannot downgrade format-version ${md.formatVersion} -> $target")
    if (target == md.formatVersion) return basedOn
    val table = restTableOf(basedOn)
    val tasks =
      if (table.currentSnapshot.isEmpty) Nil else table.newScan().planFiles()
    val posPaths = tasks.flatMap(_.deleteFiles.filter(d =>
      d.content == DataFileContent.PositionDeletes && !d.isDeletionVector)
      .map(_.path)).distinct
    if (target == 2 || posPaths.isEmpty)
      // head-pinned even for the "pure" flip: the no-tombstones decision
      // came from THIS load's scan — a MoR DELETE landing in between
      // would otherwise leave a V3 table with live parquet tombstones
      // readers silently ignore (the 409-and-retry re-scans instead)
      return catalog.commitTable(identifier,
        Seq(graft.catalog.AssertTableUuid(md.tableUuid),
          graft.catalog.AssertRefSnapshotId(TableMetadata.MainBranch,
            md.refs.get(TableMetadata.MainBranch).map(_.snapshotId)
              .orElse(md.currentSnapshotId))),
        Seq(graft.catalog.UpgradeFormatVersion(target)))
    val seq = md.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val metaDir = new File(table.location, "metadata"); metaDir.mkdirs()
    val delDir = new File(table.location, s"data/dv-$snapId"); delDir.mkdirs()
    val dvFiles = rehomeDvFiles(table, spark, tasks, posPaths, delDir,
      snapId, seq)
    val (snapshot, _) = stageDvSnapshot(table, Nil, dvFiles,
      alsoSuperseded = d =>
        d.content == DataFileContent.PositionDeletes && !d.isDeletionVector,
      op = OpReplace,
      extraSummary = Map("format-version" -> "3",
        "position-delete-files-removed" -> posPaths.size.toString),
      snapId, seq, metaDir)
    val change = restChangeFor(md, identifier, snapshot)
    // format flip FIRST in the update list: the server's metadata is
    // already V3 when the DV snapshot lands in the same commit
    catalog.commitTable(identifier, change.requirements,
      graft.catalog.UpgradeFormatVersion(3) +: change.updates)
  }

  /** Stage the atomic retract-and-replace snapshot ([[replaceEquality]]'s
    * commit shape: ONE snapshot carrying an equality-delete manifest on
    * `keyCols` plus the appended `rows`) WITHOUT committing — manifests and
    * the manifest list land on disk under the table location; the commit
    * rides a REST UpdateTableRequest. The same-sequence exemption holds
    * identically: the delete applies only to strictly-smaller sequence
    * numbers, so the staged rows are exempt by construction. */
  private def stageEqualitySnapshot(table: IcebergTable, keys: DataFrame,
                                    keyCols: Seq[String],
                                    rows: DataFrame): Snapshot = {
    val md = table.metadata
    val seq = md.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val metaDir = new File(table.location, "metadata"); metaDir.mkdirs()
    val delManifest = writeEqDeleteManifest(table, keys, keyCols, snapId, seq)
    val dataDir = new File(table.location, s"data/snap-$snapId")
    val outs = writeDistributed(rows, dataDir, table.schema, table.spec,
      table.properties, SortOrder.unsorted, preClustered = false)
    val partType = table.spec.partitionType(table.schema)
    val entries0 = outs.sortBy(_.path).map { o =>
      ManifestEntry(ManifestEntryStatus.Added, Some(snapId), Some(seq), Some(seq),
        statsFromFooter(new File(o.path), table.schema,
          o.partition.filter(_._2 != null), DataFileContent.Data, None,
          o.nanCounts))
    }
    val lineage = assignLineage(md, entries0)
    val entries = lineage.entries
    val newManifest: Option[ManifestFile] =
      if (entries.isEmpty) None // pure retraction window
      else {
        val mf = new File(metaDir, s"manifest-eq-$snapId.avro")
        ManifestIO.writeManifest(mf, entries, partType)
        Some(ManifestFile(
          path = mf.getPath, length = mf.length(),
          partitionSpecId = table.spec.specId, content = 0,
          sequenceNumber = seq, minSequenceNumber = seq, addedSnapshotId = snapId,
          addedFilesCount = entries.size, existingFilesCount = 0,
          deletedFilesCount = 0,
          addedRowsCount = entries.map(_.dataFile.recordCount).sum,
          existingRowsCount = 0, deletedRowsCount = 0,
          partitions = partitionSummaries(entries, partType), formatVersion = 2,
          firstRowId = lineage.manifestFirstRowId))
      }
    val prevManifests = liveManifests(table.currentSnapshot.toSeq.flatMap { s =>
      ManifestIO.readManifestList(table.io.open(s.manifestList))
    })
    val listFile = new File(metaDir, s"snap-$snapId.avro")
    ManifestIO.writeManifestList(listFile,
      prevManifests ++ Seq(delManifest) ++ newManifest)
    Snapshot(snapId, table.currentSnapshot.map(_.snapshotId), seq,
      System.currentTimeMillis(), listFile.getPath,
      Some(SnapshotSummary(OpOverwrite, Map(
        "added-data-files" -> entries.size.toString,
        "added-records" -> entries.map(_.dataFile.recordCount).sum.toString,
        "added-delete-files" -> "1"))),
      Some(table.schema.schemaId),
      firstRowId = lineage.snapshotFirstRowId)
  }

  /** Load-table-and-stage helper shared by the REST delta/equality change
    * builders — mirrors [[stageRestAppendChange]]'s guard shape. */
  private def restChangeFor(md: TableMetadata, identifier: Seq[String],
                            snapshot: Snapshot,
                            extraProperties: Map[String, String] = Map.empty)
      : graft.catalog.TableChange =
    graft.catalog.TableChange(identifier,
      Seq(graft.catalog.AssertTableUuid(md.tableUuid),
        graft.catalog.AssertRefSnapshotId(TableMetadata.MainBranch,
          md.refs.get(TableMetadata.MainBranch).map(_.snapshotId)
            .orElse(md.currentSnapshotId))),
      Seq(graft.catalog.AddSnapshot(snapshot),
        setMainRefUpdate(md, snapshot.snapshotId)) ++
        (if (extraProperties.isEmpty) Nil
         else Seq(graft.catalog.SetProperties(extraProperties))))

  /** A read-capable [[IcebergTable]] over a REST-loaded table — the handle
    * the maintained-model sync layer scans through. */
  def restTableOf(loaded: graft.catalog.LoadedTable,
                  catalog: graft.catalog.RestCatalog = null): IcebergTable = {
    val md = loaded.metadata
    // catalog-side scan planning, when the serving catalog advertises the
    // spec's plan endpoints: scans resolve their pin LOCALLY (so client and
    // server cannot disagree on ref/as-of resolution — and a commit that
    // landed after this load cannot leak into a current-snapshot scan),
    // then delegate file enumeration to the server. Any refusal falls back
    // to driver-side planning inside TableScan.
    val planner: Option[graft.catalog.RemoteScanPlanner] =
      Option(catalog).filter(_.supportsScanPlanning).map { rc =>
        new graft.catalog.RemoteScanPlanner {
          def plan(filter: BooleanExpression, snapshotId: Option[Long],
                   ref: Option[String], asOfTimestampMs: Option[Long],
                   caseSensitive: Boolean)
              : Option[Seq[graft.core.FileScanTask]] = {
            val pinned = snapshotId.isDefined || ref.isDefined ||
              asOfTimestampMs.isDefined
            val resolvedPin: Option[Long] = snapshotId
              .orElse(ref.flatMap(md.snapshotByName).map(_.snapshotId))
              .orElse(asOfTimestampMs.flatMap(md.snapshotAsOfTime)
                .map(_.snapshotId))
            // a REQUESTED pin that the loaded metadata cannot resolve
            // (unknown/expired ref, as-of before the first snapshot) must
            // NOT fall through to the current snapshot — that would
            // silently serve current-table rows for a time-travel query.
            // Decline instead: the local planner raises the same
            // 'ref not found' / 'no snapshot as of' error the driver-side
            // path does.
            if (pinned && resolvedPin.isEmpty) None
            else {
              val resolved =
                resolvedPin.orElse(md.currentSnapshot.map(_.snapshotId))
              if (resolved.isEmpty) None // empty table: local returns Nil fast
              else rc.planTableScan(loaded.identifier, md, resolved,
                useSnapshotSchema = pinned, filter,
                caseSensitive = caseSensitive)
            }
          }

          def planIncremental(fromSnapshotId: Long, toSnapshotId: Option[Long])
              : Option[Seq[graft.core.FileScanTask]] = {
            // pin the end CLIENT-side (loaded metadata) so a commit that
            // landed after this load cannot widen the window server-side
            val end = toSnapshotId
              .orElse(md.currentSnapshot.map(_.snapshotId))
            if (end.isEmpty) None
            else rc.planTableScan(loaded.identifier, md, snapshotId = None,
              useSnapshotSchema = false, graft.core.AlwaysTrue,
              startSnapshotId = Some(fromSnapshotId), endSnapshotId = end)
          }
        }
      }
    // scan telemetry (the spec's `metrics` route), when advertised
    val reporter: Option[graft.catalog.ScanMetricsReporter] =
      Option(catalog).filter(_.supportsMetricsEndpoint).map { rc =>
        new graft.catalog.ScanMetricsReporter {
          def report(snapshotId: Option[Long], filter: BooleanExpression,
                     projectedFieldNames: Seq[String],
                     resultDataFiles: Long, resultDeleteFiles: Long,
                     planningDurationNs: Long): Unit =
            rc.reportScanMetrics(loaded.identifier, snapshotId, filter,
              md.currentSchema.schemaId, projectedFieldNames,
              resultDataFiles, resultDeleteFiles, planningDurationNs)
        }
      }
    new IcebergTable(md.location, loaded.metadataLocation, md,
      IOConfig.fileIO(loaded.ioProps), ioProps = loaded.ioProps,
      remotePlanner = planner, scanMetricsReporter = reporter)
  }

  /** Atomic multi-table REST transaction: stage appends across tables,
    * then [[commit]] lands ALL of them or NONE via the spec's
    * `POST /v1/transactions/commit`. Each staged table is guarded by
    * assert-table-uuid + assert-ref-snapshot-id(main), so any concurrent
    * commit to any member rolls the whole transaction back
    * ([[graft.catalog.CommitConflictError]]) — the consistency a pipeline
    * needs to move a source table and its maintained derived tables
    * (index/mat-view) in lockstep. */
  final class RestTransaction private[TableWriter] (
      catalog: graft.catalog.RestCatalog) {
    private val changes = Vector.newBuilder[graft.catalog.TableChange]
    private val lineageWatermarks =
      Vector.newBuilder[(Seq[String], Long)]
    private var staged = Set.empty[Seq[String]]

    private def guard(identifier: Seq[String]): Unit = {
      require(!staged.contains(identifier),
        s"table ${identifier.mkString(".")} already staged in this " +
          "transaction: two snapshots for one table would chain on the " +
          "same parent and overlap row-id ranges")
      staged += identifier
    }

    def stageAppend(identifier: Seq[String],
                    added: Seq[graft.spark.CowFileOut],
                    extraSummary: Map[String, String] = Map.empty)
        : this.type = {
      guard(identifier)
      val (change, watermark) =
        stageRestAppendChange(catalog, identifier, added, extraSummary)
      changes += change
      watermark.foreach(w => lineageWatermarks += ((identifier, w)))
      this
    }

    /** Stage a CoW replace (rewrite `removedPaths` into `added`) for this
      * transaction — e.g. a compaction of one member table landing
      * atomically with appends to its siblings. */
    def stageReplace(identifier: Seq[String], removedPaths: Set[String],
                     added: Seq[graft.spark.CowFileOut],
                     touchedManifests: Option[Set[String]] = None)
        : this.type = {
      guard(identifier)
      val (change, watermark) = stageRestReplaceChange(catalog, identifier,
        removedPaths, added, touchedManifests)
      changes += change
      watermark.foreach(w => lineageWatermarks += ((identifier, w)))
      this
    }

    /** Stage a MoR delta ([[commitDelta]]'s shape: positional tombstones +
      * appended files in ONE snapshot) for this transaction — SQL
      * UPDATE/MERGE/DELETE under merge-on-read joining a multi-table
      * commit. */
    def stageDelta(identifier: Seq[String],
                   added: Seq[graft.spark.CowFileOut],
                   posDeleteFiles: Seq[String]): this.type = {
      guard(identifier)
      val loaded = catalog.loadTable(identifier)
      val table = restTableOf(loaded)
      val snapshot = stageDeltaSnapshot(table, added, posDeleteFiles)
      changes += restChangeFor(loaded.metadata, identifier, snapshot)
      snapshot.firstRowId.foreach(base => lineageWatermarks +=
        ((identifier, base + added.map(_.rows).sum)))
      this
    }

    /** Stage an atomic retract-and-replace ([[replaceEquality]]'s shape:
      * equality tombstones on `keyCols` + the replacement `rows` in ONE
      * snapshot) — the commit the maintained-model family (BM25 postings,
      * LM counts, ANN codes, aggregate views) makes per changefeed window.
      * `extraProperties` (e.g. the exactly-once sync watermark) ride the
      * SAME UpdateTableRequest, so index state and bookkeeping move
      * together or not at all — and with [[stageAppend]] on the source
      * table in the same transaction, source and derived index move in
      * lockstep. */
    def stageReplaceEquality(identifier: Seq[String], keys: DataFrame,
                             keyCols: Seq[String], rows: DataFrame,
                             extraProperties: Map[String, String] = Map.empty)
        : this.type = {
      guard(identifier)
      val loaded = catalog.loadTable(identifier)
      val table = restTableOf(loaded)
      val snapshot = stageEqualitySnapshot(table, keys, keyCols, rows)
      changes += restChangeFor(loaded.metadata, identifier, snapshot,
        extraProperties)
      snapshot.firstRowId.foreach(base => lineageWatermarks +=
        ((identifier, base + snapshot.summary
          .flatMap(_.properties.get("added-records")).map(_.toLong)
          .getOrElse(0L))))
      this
    }

    /** All-or-nothing commit; on success, verifies per-table V3 lineage
      * advancement by reloading (the transaction route returns no body). */
    def commit(): Unit = {
      catalog.commitTransaction(changes.result())
      lineageWatermarks.result().foreach { case (ident, stampedPast) =>
        verifyLineageAdvanced(ident, stampedPast,
          catalog.loadTable(ident).metadata.nextRowId.getOrElse(0L))
      }
    }
  }

  /** Open a multi-table transaction against a REST catalog. */
  def transaction(catalog: graft.catalog.RestCatalog): RestTransaction =
    new RestTransaction(catalog)

  /** Create a branch or tag pointing at a snapshot. Branch-only
    * `minSnapshotsToKeep` / `maxSnapshotAgeMs` set the branch's own
    * snapshot-retention policy, enforced by [[expireSnapshots]]. */
  def createRef(table: IcebergTable, name: String, refType: RefType,
                snapshotId: Option[Long] = None,
                maxRefAgeMs: Option[Long] = None,
                minSnapshotsToKeep: Option[Int] = None,
                maxSnapshotAgeMs: Option[Long] = None): IcebergTable = {
    val id = snapshotId.orElse(table.currentSnapshot.map(_.snapshotId)).getOrElse(
      throw new IllegalArgumentException("table has no snapshot to reference"))
    require(refType == BranchRef ||
      (minSnapshotsToKeep.isEmpty && maxSnapshotAgeMs.isEmpty),
      "snapshot retention (min-snapshots-to-keep / max-snapshot-age-ms) " +
        "applies to branches only; tags pin exactly their target")
    val version = table.loadedVersion + 1
    writeMetadata(table.location, table.metadata.copy(
      refs = table.metadata.refs +
        (name -> SnapshotRef(id, refType, minSnapshotsToKeep, maxSnapshotAgeMs,
          maxRefAgeMs))), version)
    IcebergTables.load(table.location)
  }

  /** Set (or clear, with None) a branch's snapshot-retention policy —
    * Iceberg's `ALTER BRANCH ... WITH SNAPSHOT RETENTION`. Works on main
    * too: a policy on main overrides [[expireSnapshots]]'s global args
    * for main's own lineage. */
  def setRefRetention(table: IcebergTable, name: String,
                      minSnapshotsToKeep: Option[Int],
                      maxSnapshotAgeMs: Option[Long]): IcebergTable = {
    val r = table.metadata.refs.getOrElse(name,
      throw new IllegalArgumentException(s"ref '$name' not found"))
    require(r.refType == BranchRef,
      s"snapshot retention applies to branches only; '$name' is a tag")
    writeMetadata(table.location, table.metadata.copy(
      refs = table.metadata.refs + (name -> r.copy(
        minSnapshotsToKeep = minSnapshotsToKeep,
        maxSnapshotAgeMs = maxSnapshotAgeMs))), table.loadedVersion + 1)
    IcebergTables.load(table.location)
  }

  /** Drop a branch or tag (`main` is protected). */
  def dropRef(table: IcebergTable, name: String): IcebergTable = {
    require(name != TableMetadata.MainBranch, "cannot drop the main branch")
    require(table.metadata.refs.contains(name), s"ref '$name' not found")
    writeMetadata(table.location, table.metadata.copy(
      refs = table.metadata.refs - name), table.loadedVersion + 1)
    IcebergTables.load(table.location)
  }

  val posDeleteSchema: Schema = Schema(0, StructT(Seq(
    NestedField(2147483546, "file_path", StringT, required = true),
    NestedField(2147483545, "pos", LongT, required = true))))

  // ------------------------------------------------------------------ guts


  /** The REST `set-snapshot-ref` update advancing main — carrying the
    * loaded ref's retention policy, since the spec's update REPLACES the
    * ref server-side. */
  private def setMainRefUpdate(md: TableMetadata, snapId: Long)
      : graft.catalog.SetSnapshotRef = {
    val prev = md.refs.get(TableMetadata.MainBranch)
    graft.catalog.SetSnapshotRef(TableMetadata.MainBranch, snapId,
      minSnapshotsToKeep = prev.flatMap(_.minSnapshotsToKeep),
      maxSnapshotAgeMs = prev.flatMap(_.maxSnapshotAgeMs),
      maxRefAgeMs = prev.flatMap(_.maxRefAgeMs))
  }

  /** Advance branch `name` to a new HEAD, preserving the existing ref's
    * retention policy ([[SnapshotRef.advanced]]) — every branch-moving
    * commit path routes through here so `min-snapshots-to-keep` /
    * `max-snapshot-age-ms` / `max-ref-age-ms` survive commits. */
  private def advRef(refs: Map[String, SnapshotRef], name: String,
                     snapId: Long): Map[String, SnapshotRef] =
    refs + (name -> SnapshotRef.advanced(refs, name, snapId))

  private def partName(src: String, t: Transform): String = t match {
    case IdentityTransform => src
    case BucketTransform(n) => s"${src}_bucket"
    case TruncateTransform(w) => s"${src}_trunc"
    case other => s"${src}_${other.repr}"
  }

  /** Spark column computing a transform value (write path only; the UDFs here
    * run once per written row, pruning later uses the core evaluators). */
  private def transformColumn(t: Transform, src: Column, typ: IcebergType): Column = t match {
    case IdentityTransform => src
    case DayTransform => to_date(src)
    case MonthTransform => sexpr(s"(year(${srcName(src)}) - 1970) * 12 + month(${srcName(src)}) - 1")
    case YearTransform => syear(src) - 1970
    case HourTransform => sexpr(s"floor(unix_timestamp(${srcName(src)}) / 3600)")
    case BucketTransform(n) =>
      // codegen'd native expression — full write throughput, spec-exact hash
      graft.spark.functions.functions.icebergBucket(n, src)
    case TruncateTransform(w) => typ match {
      case IntT | LongT => (src - (((src % w) + w) % w)).cast(SchemaConv.toSparkType(typ))
      case StringT => src.substr(0, w)
      case other => throw new IllegalArgumentException(s"truncate write on $other unsupported")
    }
    case other => throw new IllegalArgumentException(s"cannot write transform $other")
  }

  private def srcName(c: Column): String = c.toString

  /** The distributed data write shared by [[commit]] and branch appends:
    * optional range clustering per the sort order, hash distribution by
    * the transformed partition value, then the task writers (one open
    * file per partition tuple, inline NaN counts, attempt-unique names).
    * Returns one CowFileOut per written file — metadata-sized. */
  /** Iceberg's write-layout knob. `none` writes in place (no exchange —
    * the caller's layout is trusted; partition-grouping is still a LOCAL
    * sort), `hash` clusters each partition value into few tasks, `range`
    * range-clusters by partition (+ sort) keys for disjoint per-file
    * bounds. Defaults preserve this engine's established behavior:
    * `range` for sorted writes, `hash` for partitioned unsorted writes,
    * `none` otherwise. */
  val DistributionModeProp = "write.distribution-mode"

  private def writeDistributed(df: DataFrame, dataDir: File, schema: Schema,
                               spec: PartitionSpec,
                               properties: Map[String, String],
                               sortOrder: SortOrder,
                               preClustered: Boolean): Seq[CowFileOut] = {
    val sortCols =
      if (sortOrder.isUnsorted) Nil
      else sortOrder.fields.map(sf =>
        col(schema.findFieldById(sf.sourceId).get.name))
    val mode = properties.get(DistributionModeProp).map(_.toLowerCase)
      .getOrElse(
        if (!sortOrder.isUnsorted) "range"
        else if (!spec.isUnpartitioned) "hash"
        else "none")
    require(Seq("none", "hash", "range").contains(mode),
      s"invalid $DistributionModeProp '$mode': use none, hash, or range")

    // distribution: without an exchange keyed on the TRANSFORMED partition
    // value, every task writes a file for every partition value it happens
    // to hold — tasks × partitions small files at cluster scale. `hash`
    // sends each partition value to one task; `range` additionally gives
    // files disjoint bound ranges on the keys (stats pruning); `none`
    // trusts the caller's layout (the pre-clustered compaction/z-order
    // paths, or a user who already arranged the frame). The derived
    // columns exist only to key the exchange — the select drops them
    // before rows reach the writers. In every mode rows reach the task
    // writer LOCALLY SORTED by partition tuple, so it writes one file at
    // a time instead of holding an open writer per tuple it will ever see
    // — with thousands of (e.g. day × status) tuples per task, concurrent
    // open parquet writers are the classic dynamic-partition OOM. (The
    // sortWithinPartitions is local — no extra shuffle.)
    val distributed =
      if (preClustered || (spec.isUnpartitioned && sortCols.isEmpty &&
          !properties.contains(DistributionModeProp))) df
      else {
        val withParts = spec.fields.foldLeft(df) { (d, pf) =>
          val srcField = schema.findFieldById(pf.sourceId).get
          d.withColumn(s"_p_${pf.name}", transformColumn(pf.transform, col(srcField.name),
            srcField.fieldType))
        }
        val partKeys = spec.fields.map(f => col(s"_p_${f.name}"))
        val arranged = mode match {
          case "hash" if partKeys.nonEmpty =>
            withParts.repartition(partKeys: _*)
              .sortWithinPartitions(partKeys ++ sortCols: _*)
          case "range" =>
            // the established sorted-write layout: range-cluster and
            // locally sort by the sort keys alone (partition-aligned for
            // the common time-sorted case — files get disjoint sort-key
            // bounds); without a sort order, by the partition keys
            val keys = if (sortCols.nonEmpty) sortCols else partKeys
            if (keys.isEmpty) withParts
            else withParts.repartitionByRange(keys: _*)
              .sortWithinPartitions(keys: _*)
          case _ => // none, or hash on an unpartitioned table
            if (partKeys.isEmpty && sortCols.isEmpty) withParts
            else withParts.sortWithinPartitions(partKeys ++ sortCols: _*)
        }
        arranged.select(df.columns.toIndexedSeq.map(col): _*)
      }

    // distributed write through the task writers (shared with the CoW
    // path): each task derives partition tuples per row with the core
    // transforms, keeps one open parquet file per tuple, and counts
    // float/double NaNs inline — so commit needs NO second pass over the
    // written data (footers don't record NaN counts). Partition tuples ride
    // the commit messages into the manifest; no hive directory layout.
    dataDir.mkdirs()
    val writeSchema = distributed.schema
    val factory = GraftCowWriterFactory(dataDir.getPath,
      GraftCowWriterFactory.withParquetIds(writeSchema, schema).json,
      spec.fields.map { pf =>
        val src = schema.findFieldById(pf.sourceId).get
        PartFieldSpec(src.name, pf.transform.repr, pf.name)
      },
      GraftCowWriterFactory.floatFieldsOf(schema, writeSchema),
      GraftCowWriterFactory.parquetPropsOf(df.sparkSession, properties),
      GraftCowWriterFactory.targetFileBytes(properties),
      FormatWriters.dataFormatOf(properties),
      GraftCowWriterFactory.maxOpenFilesOf(properties))
    val outs: Seq[CowFileOut] = distributed.queryExecution.toRdd
      .mapPartitionsWithIndex { (pid, rows) =>
        // taskAttemptId (globally unique per attempt) in the file name:
        // with speculation or a stage retry, two live attempts of the same
        // partition must never write the same path — the loser's abort()
        // would delete the winner's committed file
        val attemptId = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(pid.toLong)
        val w = factory.createWriter(pid, attemptId)
        var ok = false
        try {
          rows.foreach(w.write)
          val m = w.commit().asInstanceOf[GraftCowCommit]
          ok = true
          Iterator.single(m)
        } finally if (!ok) w.abort()
      }
      .collect().toSeq.flatMap(_.files) // one row per written file: metadata-sized
    outs
  }

  private def commit(df: DataFrame, location: String, schema: Schema,
                     spec: PartitionSpec, properties: Map[String, String],
                     version: Int, parentSnapshot: Option[Snapshot],
                     existingEntries: Seq[ManifestEntry],
                     existingManifests: Seq[ManifestFile],
                     sequenceNumber: Long,
                     sortOrder: SortOrder = SortOrder.unsorted,
                     preClustered: Boolean = false,
                     // extra manifests minted for THIS snapshot (the id is
                     // only known in here) — lets one commit carry e.g. an
                     // equality-delete manifest next to the appended data
                     extraManifestsFor: Long => Seq[ManifestFile] = _ => Nil,
                     op: graft.core.SnapshotOp = OpAppend,
                     // floor on the written format-version: createWithSchema
                     // passes 3 when the schema carries V3-only types, so
                     // the FIRST metadata write is already spec-valid (a
                     // V2 JSON declaring geometry columns is not)
                     minFormatVersion: Int = 2): IcebergTable = {
    val snapId = System.nanoTime()
    val dataDir = new File(location, s"data/snap-$snapId")
    val metaDir = new File(location, "metadata")
    metaDir.mkdirs()
    val outs = writeDistributed(df, dataDir, schema, spec, properties,
      sortOrder, preClustered)

    val partType = spec.partitionType(schema)
    val dataFormat = FormatWriters.dataFormatOf(properties)
    val entries = outs.sortBy(_.path).map { o =>
      val info = (dataFormat match {
        case "PARQUET" => statsFromFooter(new File(o.path), schema,
          o.partition.filter(_._2 != null), DataFileContent.Data, None, o.nanCounts)
        case "ORC" => statsFromOrc(new File(o.path), schema,
          o.partition.filter(_._2 != null), o.nanCounts)
        case _ /* AVRO: no footer stats — counts only */ =>
          DataFileInfo(DataFileContent.Data, o.path, "AVRO",
            o.partition.filter(_._2 != null), o.rows,
            new File(o.path).length(), Map.empty, Map.empty, Map.empty,
            o.nanCounts, Map.empty, Map.empty, Nil, Nil, None)
      }).copy(sortOrderId = Some(sortOrder.orderId))
      ManifestEntry(ManifestEntryStatus.Added, Some(snapId), Some(sequenceNumber),
        Some(sequenceNumber), info)
    }

    val prevMeta: Option[TableMetadata] =
      if (version == 1) None
      else Some(IcebergTables.load(location).metadata)
    // V3 row lineage: stamp first_row_id onto the added files before the
    // manifest is written; below V3 this is the identity
    val lineage = prevMeta match {
      case Some(m) => assignLineage(m, entries)
      // a table BORN V3 (createWithSchema with V3-only types) assigns row
      // lineage from 0 on its very first commit, per spec
      case None => assignLineage(minFormatVersion, None, entries)
    }

    val manifestFile = new File(metaDir, s"manifest-$snapId.avro")
    ManifestIO.writeManifest(manifestFile, lineage.entries, partType)
    val newManifest = ManifestFile(
      path = manifestFile.getPath, length = manifestFile.length(),
      partitionSpecId = spec.specId, content = 0,
      sequenceNumber = sequenceNumber, minSequenceNumber = sequenceNumber,
      addedSnapshotId = snapId,
      addedFilesCount = entries.size, existingFilesCount = 0, deletedFilesCount = 0,
      addedRowsCount = entries.map(_.dataFile.recordCount).sum,
      existingRowsCount = 0, deletedRowsCount = 0,
      partitions = partitionSummaries(entries, partType),
      formatVersion = 2,
      firstRowId = lineage.manifestFirstRowId)

    // REPLACE/OVERWRITE (no carried manifests but a parent exists): record
    // the parent's live files as DELETED-status entries, per the Iceberg
    // spec — the committing snapshot's manifests name what it removed, so
    // `entries` forensics and changelog readers see removals without
    // diffing whole snapshots. Reading the parent manifests here is
    // O(files replaced) — the same order as the rewrite itself.
    val removedManifest: Option[ManifestFile] =
      if (existingManifests.nonEmpty) None
      else parentSnapshot.flatMap { ps =>
        val prev = ManifestIO.readManifestList(
          new java.io.BufferedInputStream(new java.io.FileInputStream(ps.manifestList)))
        val removed = {
          import scala.collection.parallel.CollectionConverters._
          prev.filter(_.content == 0).par.flatMap { m =>
            ManifestIO.readManifestEntries(
              new java.io.BufferedInputStream(new java.io.FileInputStream(m.path)), m)
          }.seq
        }.map(e => e.copy(status = ManifestEntryStatus.Deleted,
          snapshotId = Some(snapId),
          // partition tuples may span evolved specs; deleted entries are
          // never pruned by partition, so strip rather than re-encode
          dataFile = e.dataFile.copy(partition = Map.empty)))
        if (removed.isEmpty) None
        else {
          val mf = new File(metaDir, s"manifest-removed-$snapId.avro")
          ManifestIO.writeManifest(mf, removed.toSeq, StructT(Nil))
          Some(ManifestFile(
            path = mf.getPath, length = mf.length(),
            partitionSpecId = spec.specId, content = 0,
            sequenceNumber = sequenceNumber,
            minSequenceNumber =
              removed.flatMap(_.sequenceNumber).minOption.getOrElse(sequenceNumber),
            addedSnapshotId = snapId,
            addedFilesCount = 0, existingFilesCount = 0,
            deletedFilesCount = removed.size,
            addedRowsCount = 0, existingRowsCount = 0,
            deletedRowsCount = removed.map(_.dataFile.recordCount).sum,
            partitions = Nil, formatVersion = 2))
        }
      }

    val listFile = new File(metaDir, s"snap-$snapId.avro")
    ManifestIO.writeManifestList(listFile,
      existingManifests ++ extraManifestsFor(snapId) ++
        Seq(newManifest) ++ removedManifest)

    val now = System.currentTimeMillis()
    val snapshot = Snapshot(snapId, parentSnapshot.map(_.snapshotId), sequenceNumber,
      now, listFile.getPath, Some(SnapshotSummary(op,
        Map("added-data-files" -> entries.size.toString,
          "added-records" -> entries.map(_.dataFile.recordCount).sum.toString))),
      Some(schema.schemaId),
      firstRowId = lineage.snapshotFirstRowId)

    val md = TableMetadata(
      // a table that moved to V3 (deletion vectors) must STAY V3 — its
      // Puffin delete entries are illegal under V2
      formatVersion = math.max(minFormatVersion,
        prevMeta.map(_.formatVersion).getOrElse(2)),
      tableUuid = prevMeta.map(_.tableUuid).getOrElse(java.util.UUID.randomUUID().toString),
      location = location,
      lastSequenceNumber = sequenceNumber,
      lastUpdatedMs = now,
      lastColumnId = math.max(schema.highestFieldId,
        prevMeta.map(_.lastColumnId).getOrElse(0)),
      // carry prior schema versions so older snapshots keep resolving
      schemas = (prevMeta.map(_.schemas.filterNot(_.schemaId == schema.schemaId))
        .getOrElse(Nil) :+ schema),
      currentSchemaId = schema.schemaId,
      // spec HISTORY is preserved: older manifests reference their spec by
      // id, and scans resolve per-manifest evaluators from this list
      partitionSpecs = (prevMeta.map(_.partitionSpecs.filterNot(_.specId == spec.specId))
        .getOrElse(Nil) :+ spec).sortBy(_.specId),
      defaultSpecId = spec.specId,
      lastPartitionId = Some((spec.fields.map(_.fieldId) ++
        prevMeta.flatMap(_.lastPartitionId)).maxOption.getOrElse(999)),
      properties = properties,
      snapshots = prevMeta.map(_.snapshots).getOrElse(Nil) :+ snapshot,
      currentSnapshotId = Some(snapId),
      snapshotLog = prevMeta.map(_.snapshotLog).getOrElse(Nil) :+
        SnapshotLogEntry(snapId, now),
      metadataLog = prevMeta.map(m => m.metadataLog :+
        MetadataLogEntry(m.location + s"/metadata/v${version - 1}.metadata.json",
          m.lastUpdatedMs)).getOrElse(Nil),
      sortOrders = (prevMeta.map(_.sortOrders).getOrElse(Seq(SortOrder.unsorted)) :+
        sortOrder).distinctBy(_.orderId),
      defaultSortOrderId = sortOrder.orderId,
      // carry existing branches/tags forward; only main advances
      refs = advRef(prevMeta.map(_.refs).getOrElse(Map.empty),
        TableMetadata.MainBranch, snapId),
      nextRowId = lineage.nextRowId,
      // foreign-engine statistics files ride through untouched
      statisticsJson = prevMeta.flatMap(_.statisticsJson),
      partitionStatisticsJson = prevMeta.flatMap(_.partitionStatisticsJson))
    writeMetadata(location, md, version)
    IcebergTables.load(location)
  }

  /** Thrown when another writer committed the same version first —
    * optimistic concurrency, the caller may reload + retry. */
  final class CommitConflictException(version: Int, location: String)
    extends RuntimeException(
      s"metadata version $version of $location was committed concurrently")

  /** Optimistic-concurrency retry loop: run `op` against a FRESH load of
    * the table, reloading and retrying on [[CommitConflictException]] —
    * the standard commit pattern for concurrent writers (appends and MoR
    * deletes compose with any concurrent commit; CoW ops re-plan against
    * the new snapshot on reload, so the retry is semantically a re-run).
    * The final attempt's conflict propagates. */
  def withCommitRetry[T](location: String, maxAttempts: Int = 4)
                        (op: IcebergTable => T): T = {
    var attempt = 1
    while (true) {
      try return op(IcebergTables.load(location))
      catch {
        case e: CommitConflictException if attempt < maxAttempts =>
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Compute the spec's PARTITION STATISTICS file for the current
    * snapshot and register it under `partition-statistics`: one row per
    * partition tuple with the data/delete file and record rollups, in the
    * spec's parquet schema (field ids 1-12; `partition` = the UNIFIED
    * tuple struct across all partition specs). Foreign engines read the
    * registered file directly; `SELECT * FROM db.t.partition_statistics`
    * serves it back here.
    *
    * Scale shape: manifests decode with the planner's parallel readers
    * and STREAM into an O(partitions) aggregation map — entry rows are
    * never retained. The output is O(partitions) by definition (it IS the
    * stats file), written once as a single parquet. */
  def computePartitionStats(table: IcebergTable,
                            spark: org.apache.spark.sql.SparkSession,
                            restCommit: Option[(graft.catalog.RestCatalog,
                              Seq[String], graft.catalog.LoadedTable)] = None)
      : (IcebergTable, Int) = {
    val snap = table.currentSnapshot.getOrElse(throw new IllegalArgumentException(
      "compute_partition_stats: table has no snapshot"))
    val md = table.metadata
    // unified partition tuple: every field of every spec, by field id
    val unified: Seq[(PartitionField, graft.core.IcebergType)] =
      md.partitionSpecs.flatMap(sp => sp.partitionType(md.currentSchema).fields
          .zip(sp.fields).map { case (nf, pf) => (pf, nf.fieldType) })
        .groupBy(_._1.fieldId).toSeq.sortBy(_._1).map(_._2.head)

    // manifest partition values are raw Avro decodes (Integer days for
    // dates, Long micros for timestamps, unscaled big-endian bytes for
    // decimals) — convert to the EXTERNAL value the row schema declares.
    // Byte-typed values wrap in ByteBuffer so the aggregation key groups
    // by CONTENT (arrays have identity equality); unwrapped at row build.
    def extVal(v: Any, t: graft.core.IcebergType): Any = v match {
      case null => null
      case u: org.apache.avro.util.Utf8 => extVal(u.toString, t)
      case f: org.apache.avro.generic.GenericData.Fixed => extVal(f.bytes(), t)
      case bb: java.nio.ByteBuffer =>
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a)
        extVal(a, t)
      case other => t match {
        case DateT => other match {
          case i: java.lang.Integer =>
            java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue))
          case x => x
        }
        case TimestampTzT => other match {
          case l: java.lang.Long =>
            org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(l)
          case x => x
        }
        case TimestampT => other match {
          case l: java.lang.Long =>
            org.apache.spark.sql.catalyst.util.DateTimeUtils
              .microsToLocalDateTime(l)
          case x => x
        }
        case DecimalT(_, s) => other match {
          case a: Array[Byte] =>
            new java.math.BigDecimal(new java.math.BigInteger(a), s)
          case x => x
        }
        case UuidT => other match {
          case a: Array[Byte] if a.length == 16 =>
            val b = java.nio.ByteBuffer.wrap(a)
            new java.util.UUID(b.getLong, b.getLong).toString
          case x => x
        }
        case _ => other match {
          case a: Array[Byte] => java.nio.ByteBuffer.wrap(a)
          case x => x
        }
      }
    }
    def tupleOf(p: Map[String, Any]): Seq[Any] =
      unified.map { case (pf, t) => extVal(p.get(pf.name).orNull, t) }

    final case class Agg(var dataRecords: Long = 0L, var dataFiles: Int = 0,
                         var dataBytes: Long = 0L,
                         var posDelRecords: Long = 0L, var posDelFiles: Int = 0,
                         var eqDelRecords: Long = 0L, var eqDelFiles: Int = 0,
                         var lastSnap: Long = 0L, var lastMs: Long = 0L,
                         var specId: Int = 0, var specSeq: Long = -1L)
    val byPartition = scala.collection.mutable.LinkedHashMap[Seq[Any], Agg]()
    val snapTs: Map[Long, Long] =
      md.snapshots.map(s0 => s0.snapshotId -> s0.timestampMs).toMap
    val manifests = ManifestIO.readManifestList(table.io.open(snap.manifestList))
    val decoded = {
      import scala.collection.parallel.CollectionConverters._
      manifests.par.map(m =>
        m -> ManifestIO.readManifestEntries(table.io.open(m.path), m)).seq
    }
    // pass 1 (data entries) builds path → tuple so DELETE entries that
    // reference a data file (V3 DVs) attribute to ITS partition; delete
    // files without a reference or tuple land on the null tuple (honest:
    // they may span partitions)
    val partOfPath = scala.collection.mutable.HashMap[String, Seq[Any]]()
    decoded.foreach { case (_, entries) =>
      entries.foreach { e =>
        if (e.dataFile.content == DataFileContent.Data)
          partOfPath(e.dataFile.path) = tupleOf(e.dataFile.partition)
      }
    }
    decoded.foreach { case (m, entries) =>
      entries.filter(_.status != ManifestEntryStatus.Deleted).foreach { e =>
        val key: Seq[Any] =
          if (e.dataFile.content == DataFileContent.Data)
            tupleOf(e.dataFile.partition)
          else e.dataFile.referencedDataFile.flatMap(partOfPath.get)
            .orElse(Some(tupleOf(e.dataFile.partition))
              .filter(_.exists(_ != null)))
            .getOrElse(unified.map(_ => null))
        val a = byPartition.getOrElseUpdate(key, Agg())
        // spec_id = the spec this tuple's DATA belongs to (delete entries
        // attribute to a referenced file's partition, so their manifest's
        // spec must not override it); newest data wins when specs evolved
        // onto the same unified tuple
        if (e.dataFile.content == DataFileContent.Data) {
          val seq = e.sequenceNumber.getOrElse(0L)
          if (seq >= a.specSeq) { a.specSeq = seq; a.specId = m.partitionSpecId }
        } else if (a.specSeq < 0L)
          a.specId = m.partitionSpecId
        e.dataFile.content match {
          case DataFileContent.Data =>
            a.dataRecords += e.dataFile.recordCount
            a.dataFiles += 1
            a.dataBytes += e.dataFile.fileSizeInBytes
          case DataFileContent.PositionDeletes =>
            a.posDelRecords += e.dataFile.recordCount
            a.posDelFiles += 1
          case DataFileContent.EqualityDeletes =>
            a.eqDelRecords += e.dataFile.recordCount
            a.eqDelFiles += 1
          case _ =>
        }
        // entries committed by an EXPIRED snapshot have no timestamp —
        // skip them rather than emit a snapshot id with a null timestamp
        e.snapshotId.foreach { sid =>
          snapTs.get(sid).foreach { ts =>
            if (ts >= a.lastMs) { a.lastMs = ts; a.lastSnap = sid }
          }
        }
      }
    }

    // the spec's schema, parquet field ids stamped (partition children
    // keep their partition-field ids)
    import org.apache.spark.sql.types._
    def idMeta(id: Int) = new MetadataBuilder()
      .putLong(GraftCowWriterFactory.ParquetFieldIdKey, id.toLong).build()
    val partStruct = StructType(unified.map { case (pf, t) =>
      StructField(pf.name, SchemaConv.toSparkType(t), nullable = true,
        metadata = idMeta(pf.fieldId))
    })
    val schema = StructType(Seq(
      StructField("partition", partStruct, nullable = false, idMeta(1)),
      StructField("spec_id", IntegerType, nullable = false, idMeta(2)),
      StructField("data_record_count", LongType, nullable = false, idMeta(3)),
      StructField("data_file_count", IntegerType, nullable = false, idMeta(4)),
      StructField("total_data_file_size_in_bytes", LongType, nullable = false,
        idMeta(5)),
      StructField("position_delete_record_count", LongType, nullable = true,
        idMeta(6)),
      StructField("position_delete_file_count", IntegerType, nullable = true,
        idMeta(7)),
      StructField("equality_delete_record_count", LongType, nullable = true,
        idMeta(8)),
      StructField("equality_delete_file_count", IntegerType, nullable = true,
        idMeta(9)),
      StructField("total_record_count", LongType, nullable = true, idMeta(10)),
      StructField("last_updated_at", LongType, nullable = true, idMeta(11)),
      StructField("last_updated_snapshot_id", LongType, nullable = true,
        idMeta(12))))
    val rows = byPartition.toSeq.map { case (key, a) =>
      org.apache.spark.sql.Row(
        org.apache.spark.sql.Row(key.map {
          // unwrap the key's value-equality ByteBuffer back to the bytes
          // BinaryType expects
          case bb: java.nio.ByteBuffer =>
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          case other => other
        }: _*),
        a.specId,
        a.dataRecords, a.dataFiles, a.dataBytes,
        a.posDelRecords, a.posDelFiles, a.eqDelRecords, a.eqDelFiles,
        // total_record_count is "records after applying deletes" — exact
        // only when the partition carries no delete files; else unknown
        (if (a.posDelFiles == 0 && a.eqDelFiles == 0) a.dataRecords else null)
          : Any,
        if (a.lastMs == 0) null else a.lastMs,
        if (a.lastSnap == 0) null else a.lastSnap)
    }
    val stage = Files.createTempDirectory("pstats").toFile
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
      .coalesce(1)
      .write.mode("overwrite").parquet(stage.getPath)
    val src = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dest = new File(new File(table.location, "metadata"),
      s"partition-stats-${snap.snapshotId}-${System.nanoTime()}.parquet")
    Files.move(src.toPath, dest.toPath)
    stage.listFiles().foreach(_.delete()); stage.delete()

    // register: replace any entry for THIS snapshot, keep others
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    md.partitionStatisticsJson.foreach { raw =>
      val prev = mapper.readTree(raw)
      if (prev.isArray) prev.forEach { n =>
        val sid = Option(n.get("snapshot-id")).map(_.asLong())
        if (!sid.contains(snap.snapshotId))
          arr.add(n): Unit
      }
    }
    val entry = mapper.createObjectNode()
    entry.put("snapshot-id", snap.snapshotId)
    entry.put("statistics-path", dest.getPath)
    entry.put("file-size-in-bytes", dest.length())
    arr.add(entry)
    restCommit match {
      case Some((rc, id, basedOn)) =>
        val committed = rc.commitTable(id,
          Seq(graft.catalog.AssertTableUuid(basedOn.metadata.tableUuid)),
          Seq(graft.catalog.SetPartitionStatistics(
            mapper.writeValueAsString(entry))))
        (restTableOf(committed, rc), rows.size)
      case None =>
        writeMetadata(table.location, md.copy(
          partitionStatisticsJson = Some(mapper.writeValueAsString(arr))),
          table.loadedVersion + 1)
        (IcebergTables.load(table.location), rows.size)
    }
  }

  /** Compute per-column NDV statistics for the CURRENT snapshot and
    * register them as a Puffin statistics file (theta sketch per column +
    * the `ndv` blob property readers consult first). The scan's
    * `SupportsReportStatistics` then feeds these to Spark's CBO — and any
    * foreign engine reading the table gets them through the standard
    * `statistics` metadata.
    *
    * Scale shape: TWO distributed passes, both bounded. Pass 1 is one
    * aggregate row (approx NDV per column); pass 2 re-scans keeping only
    * hashes under a per-column threshold chosen so ~2k survive per column
    * (the KMV bottom-k construction: retain the k smallest hashes, theta =
    * the (k+1)-th) — so driver memory is O(columns × k), never O(NDV).
    *
    * The sketch payload hashes with Spark's xxhash64 (not DataSketches'
    * murmur3 family), so estimates decode correctly everywhere but
    * cross-engine sketch MERGES are not supported; the `ndv` property is
    * the authoritative summary. */
  def computeTableStats(table: IcebergTable,
                        spark: org.apache.spark.sql.SparkSession,
                        columns: Seq[String] = Nil,
                        restCommit: Option[(graft.catalog.RestCatalog,
                          Seq[String], graft.catalog.LoadedTable)] = None)
      : (IcebergTable, Int) = {
    val snap = table.currentSnapshot.getOrElse(throw new IllegalArgumentException(
      "compute_table_stats: table has no snapshot"))
    val eligible: IcebergType => Boolean = {
      case _: NestedIcebergType | UnknownT | VariantT |
           _: GeometryT | _: GeographyT => false
      case _ => true
    }
    val targets: Seq[NestedField] =
      if (columns.nonEmpty) columns.map(c =>
        table.schema.findFieldByName(c).getOrElse(throw new IllegalArgumentException(
          s"compute_table_stats: unknown column '$c'")))
      else table.schema.fields.filter(f => eligible(f.fieldType))
    require(targets.nonEmpty, "compute_table_stats: no eligible columns")
    targets.foreach(f => require(eligible(f.fieldType),
      s"compute_table_stats: ${f.fieldType.repr} column '${f.name}' not supported"))

    val K = 2048
    val df = table.newScan().toDF(spark).select(targets.map(f => col(f.name)): _*)
    // pass 1: approximate NDV per column, one aggregate row
    val approx = df.agg(
      org.apache.spark.sql.functions.approx_count_distinct(targets.head.name),
      targets.tail.map(f =>
        org.apache.spark.sql.functions.approx_count_distinct(f.name)): _*)
      .collect()(0)
    val approxNdv = targets.indices.map(i => math.max(1L, approx.getLong(i)))
    // pass 2: per column keep hashes below a threshold sized for ~2K
    // survivors (all of them when NDV is small) — bounded driver collect
    val thresholds = approxNdv.map { nd =>
      if (nd <= 2L * K) Long.MaxValue
      else {
        val t = (BigInt(Long.MaxValue) * (2L * K) / nd).toLong
        math.max(1L, t)
      }
    }
    val pairCols = targets.zipWithIndex.map { case (f, i) =>
      org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.lit(i).as("ci"),
        org.apache.spark.sql.functions.when(col(f.name).isNotNull,
          org.apache.spark.sql.functions.shiftrightunsigned(
            org.apache.spark.sql.functions.xxhash64(col(f.name)), 1))
          .as("h"))
    }
    val collected = df
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array(pairCols: _*)).as("e"))
      .filter(col("e.h").isNotNull)
      .select(col("e.ci"), col("e.h"))
      .filter(targets.indices.map(i =>
        col("ci") === i && col("h") < thresholds(i)).reduce(_ || _))
      .distinct()
      .collect().groupBy(_.getInt(0))
      .view.mapValues(_.map(_.getLong(1)).sorted).toMap

    // per column: exact sketch when everything survived under MaxValue;
    // else KMV — k smallest retained, theta = the (k+1)-th (or the pass-2
    // threshold when fewer than k+1 survived)
    val blobs = targets.zipWithIndex.map { case (f, i) =>
      val hs = collected.getOrElse(i, Array.empty[Long]).toSeq
      val (retained, theta) =
        if (thresholds(i) == Long.MaxValue && hs.size <= K) (hs, None)
        else if (hs.size > K) (hs.take(K), Some(hs(K)))
        else (hs, Some(thresholds(i)))
      val bytes = ThetaSketch.compactSketchBytes(retained, theta)
      val ndv = math.round(ThetaSketch.estimate(bytes))
      (bytes, f.id, ndv)
    }

    val puffin = new File(new File(table.location, "metadata"),
      s"stats-${snap.snapshotId}-${System.nanoTime()}.puffin")
    val metas = Puffin.write(puffin.getPath, blobs.map { case (bytes, id, ndv) =>
      (bytes, Puffin.BlobMetadata(graft.spark.TableStatistics.ThetaBlobType,
        Seq(id), snap.snapshotId, snap.sequenceNumber, 0L, 0L,
        Map("ndv" -> ndv.toString)))
    })
    val footerSize = puffin.length() - (metas.last.offset + metas.last.length)

    // register: replace any existing entry for THIS snapshot, keep others
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    // carry foreign/older entries through as the ORIGINAL raw nodes —
    // reconstructing from the parsed model would zero file sizes and blob
    // sequence numbers, corrupting entries a foreign Puffin reader trusts
    table.metadata.statisticsJson.foreach { raw =>
      val prev = mapper.readTree(raw)
      if (prev.isArray) prev.forEach { n =>
        val sid = Option(n.get("snapshot-id")).map(_.asLong())
        if (!sid.contains(snap.snapshotId))
          arr.add(n): Unit
      }
    }
    val entry = mapper.createObjectNode()
    entry.put("snapshot-id", snap.snapshotId)
    entry.put("statistics-path", puffin.getPath)
    entry.put("file-size-in-bytes", puffin.length())
    entry.put("file-footer-size-in-bytes", footerSize)
    val bmArr = entry.putArray("blob-metadata")
    blobs.zip(metas).foreach { case ((_, id, ndv), m) =>
      val bn = bmArr.addObject()
      bn.put("type", graft.spark.TableStatistics.ThetaBlobType)
      bn.put("snapshot-id", snap.snapshotId)
      bn.put("sequence-number", snap.sequenceNumber)
      bn.putArray("fields").add(id)
      bn.putObject("properties").put("ndv", ndv.toString)
      ()
    }
    arr.add(entry)
    restCommit match {
      case Some((rc, id, basedOn)) =>
        // the spec's set-statistics action ships ONE entry node; the
        // server owns the array merge (same-snapshot replace)
        val committed = rc.commitTable(id,
          Seq(graft.catalog.AssertTableUuid(basedOn.metadata.tableUuid)),
          Seq(graft.catalog.SetStatistics(mapper.writeValueAsString(entry))))
        (restTableOf(committed, rc), targets.size)
      case None =>
        writeMetadata(table.location, table.metadata.copy(
          statisticsJson = Some(mapper.writeValueAsString(arr))),
          table.loadedVersion + 1)
        (IcebergTables.load(table.location), targets.size)
    }
  }

  /** How many PREVIOUS metadata files a table retains (spec property;
    * Iceberg's default). The current file never counts against it. */
  private def previousVersionsMax(md: TableMetadata): Int =
    md.properties.get("write.metadata.previous-versions-max")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(100)

  private def writeMetadata(location: String, md0: TableMetadata, version: Int): Unit = {
    val metaDir = new File(location, "metadata"); metaDir.mkdirs()
    // metadata-log retention (spec `write.metadata.previous-versions-max`):
    // the log tracks previous metadata files and is truncated oldest-first
    // beyond the cap on EVERY commit — a 100-TB table commits millions of
    // times, and an unbounded log makes the metadata file itself grow
    // without bound
    val keep = previousVersionsMax(md0)
    val md = if (md0.metadataLog.size > keep)
      md0.copy(metadataLog = md0.metadataLog.takeRight(keep)) else md0
    val tmp = new File(metaDir, s".v$version.metadata.json.tmp-${System.nanoTime()}")
    Files.write(tmp.toPath, md.toJson.getBytes(StandardCharsets.UTF_8))
    val dst = new File(metaDir, s"v$version.metadata.json")
    // COMPARE-AND-SWAP commit: a hard link creation is atomic and FAILS if
    // the target exists (unlike POSIX rename, which silently replaces), so
    // two writers racing to version N cannot clobber each other — the
    // loser gets a CommitConflictException and can reload + retry. Readers
    // see either the old or the new version, never a partial file.
    try Files.createLink(dst.toPath, tmp.toPath)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp.toPath)
        throw new CommitConflictException(version, location)
    }
    Files.deleteIfExists(tmp.toPath)
    Files.write(new File(metaDir, "version-hint.text").toPath,
      version.toString.getBytes(StandardCharsets.UTF_8))
    // `write.metadata.delete-after-commit.enabled`: after a SUCCESSFUL
    // commit, physically delete metadata files older than the retained
    // window (current + the newest `keep` previous). Opt-in — the failure
    // mode of deleting under a concurrent slow reader is the operator's
    // call, exactly as in Iceberg. Only version files are touched; the
    // deletion happens after the CAS, so a failed commit never deletes.
    if (md.properties.get("write.metadata.delete-after-commit.enabled")
        .exists(_.equalsIgnoreCase("true"))) {
      val cutoff = version - keep // keep (cutoff..version-1) + current
      Option(metaDir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
        .filter(f => f.getName.stripPrefix("v")
          .stripSuffix(".metadata.json").toInt < cutoff)
        .foreach(f => Files.deleteIfExists(f.toPath))
    }
  }

  private def currentVersion(location: String): Int = {
    val metaDir = new File(location, "metadata")
    Option(metaDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .map(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
      .maxOption.getOrElse(0)
  }

  private def listParquet(dir: File): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    walk(dir).sortBy(_.getPath)
  }

  private def isNaNLit(l: Literal): Boolean = l match {
    case FloatLit(f) => f.isNaN
    case DoubleLit(d) => d.isNaN
    case _ => false
  }

  private def partitionSummaries(entries: Seq[ManifestEntry],
                                 partType: StructT): Seq[FieldSummary] =
    partType.fields.map { f =>
      val values = entries.flatMap(e => Option(e.dataFile.partition.get(f.name).orNull))
      val hasNull = entries.exists(e => e.dataFile.partition.get(f.name).forall(_ == null))
      val lits = values.flatMap(v => avroValueToLiteral(v, f.fieldType))
      // NaN values are excluded from bounds (per spec) and reported via
      // containsNaN, so the ManifestEvaluator's all-null inference stays
      // sound for float/double partitions
      val hasNaN = lits.exists(isNaNLit)
      val sorted = lits.filterNot(isNaNLit)
        .sortWith((a, b) => LiteralOrdering.compare(a, b).exists(_ < 0))
      FieldSummary(hasNull, Some(hasNaN),
        sorted.headOption.map(_.toBytes), sorted.lastOption.map(_.toBytes))
    }

  private def avroValueToLiteral(v: Any, t: IcebergType): Option[Literal] = v match {
    case null => None
    case i: java.lang.Integer => Some(if (t == DateT) DateLit(i) else IntLit(i))
    case l: java.lang.Long => Some(if (t == TimestampT) TsLit(l) else LongLit(l))
    case s: String => Some(StrLit(s))
    case b: java.lang.Boolean => Some(BoolLit(b))
    case f: java.lang.Float => Some(FloatLit(f))
    case d: java.lang.Double => Some(DoubleLit(d))
    case b: Array[Byte] => LiteralCodec.fromBytes(t, b)
    case _ => None
  }

  /** Parquet footer → per-file Iceberg stats: min/max/null counts aggregated
    * across row groups; split offsets = row-group start positions. Metadata
    * read only — never touches row data. */
  private def statsFromFooter(file: File, schema: Schema,
                              partition: Map[String, Any], content: Int,
                              overrideSchema: Option[Schema],
                              nanCounts: Map[Int, Long] = Map.empty): DataFileInfo = {
    val effSchema = overrideSchema.getOrElse(schema)
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file.getPath), new Configuration()))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val rowCount = blocks.map(_.getRowCount).sum
      val splitOffsets = blocks.map(_.getStartingPos).sorted

      val colSizes = scala.collection.mutable.Map[Int, Long]()
      val valCounts = scala.collection.mutable.Map[Int, Long]()
      val nullCounts = scala.collection.mutable.Map[Int, Long]()
      val lowerB = scala.collection.mutable.Map[Int, Literal]()
      val upperB = scala.collection.mutable.Map[Int, Literal]()

      for (block <- blocks; chunk <- block.getColumns.asScala) {
        val colPath = chunk.getPath.toDotString
        effSchema.findFieldByName(colPath).foreach { field =>
          val id = field.id
          colSizes.updateWith(id)(v => Some(v.getOrElse(0L) + chunk.getTotalSize))
          valCounts.updateWith(id)(v => Some(v.getOrElse(0L) + chunk.getValueCount))
          val stats: org.apache.parquet.column.statistics.Statistics[_] =
            chunk.getStatistics
          if (stats != null && !stats.isEmpty) {
            if (stats.isNumNullsSet)
              nullCounts.updateWith(id)(v => Some(v.getOrElse(0L) + stats.getNumNulls))
            if (stats.hasNonNullValue) {
              for (mn <- parquetStatToLiteral(stats.genericGetMin.asInstanceOf[AnyRef], field.fieldType))
                lowerB.updateWith(id) {
                  case Some(cur) if LiteralOrdering.compare(cur, mn).exists(_ <= 0) => Some(cur)
                  case _ => Some(mn)
                }
              for (mx <- parquetStatToLiteral(stats.genericGetMax.asInstanceOf[AnyRef], field.fieldType))
                upperB.updateWith(id) {
                  case Some(cur) if LiteralOrdering.compare(cur, mx).exists(_ >= 0) => Some(cur)
                  case _ => Some(mx)
                }
            }
          }
        }
      }
      // V3 geo columns: parquet's binary min/max over WKB bytes is
      // meaningless for pruning (byte order ≠ spatial order) — the spec's
      // geo bounds are ENVELOPE corner POINTS. One extra read of the file
      // projected to only its geo columns (file-local, no shuffle; geo
      // writes pay one column re-read per file). Plain x/y min/max — a
      // correct, conservative envelope; the antimeridian-wrapped tightening
      // the spec ALLOWS for geography is a writer optimization we skip
      // (the evaluator still honors wrapped bounds from foreign writers).
      val geoBounds = geoEnvelopeBounds(file, effSchema)
      DataFileInfo(
        content = content, path = file.getPath, format = "PARQUET",
        partition = partition, recordCount = rowCount,
        fileSizeInBytes = file.length(),
        columnSizes = colSizes.toMap, valueCounts = valCounts.toMap,
        // zero entries are kept on purpose: nanCount==0 is positive evidence
        // that lets an isNaN predicate prune the file
        nullValueCounts = nullCounts.toMap, nanValueCounts = nanCounts,
        lowerBounds = lowerB.map { case (k, v) => k -> v.toBytes }.toMap ++
          geoBounds.map { case (k, (lo, _)) => k -> lo },
        upperBounds = upperB.map { case (k, v) => k -> v.toBytes }.toMap ++
          geoBounds.map { case (k, (_, hi)) => k -> hi },
        splitOffsets = splitOffsets, equalityIds = Nil, sortOrderId = Some(0))
    } finally reader.close()
  }

  /** Per-geo-column (lower, upper) bound bytes — envelope corners as POINT
    * WKB — computed by re-reading the written file projected to its geo
    * columns. Empty when the schema has no geo columns. A column whose
    * every value is null/unparseable gets no bounds (prune-safe). */
  private def geoEnvelopeBounds(file: File, schema: Schema)
      : Map[Int, (Array[Byte], Array[Byte])] = {
    val geoFields = schema.fields.filter(f => f.fieldType match {
      case _: GeometryT | _: GeographyT => true
      case _ => false
    })
    if (geoFields.isEmpty) return Map.empty
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    import org.apache.parquet.hadoop.api.ReadSupport
    // project ONLY the geo columns, copying each field's type from the
    // file's own footer (repetition must match or parquet refuses)
    val fileSchema = {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new Path(file.getPath), new Configuration()))
      try r.getFooter.getFileMetaData.getSchema finally r.close()
    }
    val present = geoFields.filter(f => fileSchema.containsField(f.name))
    if (present.isEmpty) return Map.empty
    val conf = new Configuration()
    conf.set(ReadSupport.PARQUET_READ_SCHEMA,
      new org.apache.parquet.schema.MessageType("geo",
        present.map(f =>
          fileSchema.getType(Seq(f.name): _*)): _*).toString)
    val env = scala.collection.mutable.Map[Int, (Double, Double, Double, Double)]()
    val r = ParquetReader.builder(new GroupReadSupport(),
      new Path(file.getPath)).withConf(conf).build()
    try {
      var g = r.read()
      while (g != null) {
        present.foreach { f =>
          if (g.getFieldRepetitionCount(f.name) > 0) {
            graft.core.Wkb.envelope(g.getBinary(f.name, 0).getBytes).foreach {
              case (xmin, ymin, xmax, ymax) =>
                env.updateWith(f.id) {
                  case Some((lx, ly, ux, uy)) => Some((math.min(lx, xmin),
                    math.min(ly, ymin), math.max(ux, xmax), math.max(uy, ymax)))
                  case None => Some((xmin, ymin, xmax, ymax))
                }
            }
          }
        }
        g = r.read()
      }
    } finally r.close()
    env.map { case (id, (lx, ly, ux, uy)) =>
      id -> (graft.core.Wkb.pointWkb(lx, ly), graft.core.Wkb.pointWkb(ux, uy))
    }.toMap
  }

  /** ORC footer → per-file Iceberg stats: orc-core's per-file column
    * statistics mapped to counts and (for int/long/date/float/double/
    * string columns) min/max bounds — bounds are emitted only where the
    * mapping is exact, so pruning stays correct-or-conservative. Metadata
    * read only. */
  private def statsFromOrc(file: File, schema: Schema,
                           partition: Map[String, Any],
                           nanCounts: Map[Int, Long]): DataFileInfo = {
    import org.apache.orc.OrcFile
    val reader = OrcFile.createReader(new Path(file.getPath),
      OrcFile.readerOptions(new Configuration()))
    try {
      val rowCount = reader.getNumberOfRows
      val splitOffsets = reader.getStripes.asScala.map(_.getOffset).toSeq.sorted
      val names = reader.getSchema.getFieldNames.asScala.toSeq
      val stats = reader.getStatistics // index 0 = root struct
      val valCounts = scala.collection.mutable.Map[Int, Long]()
      val nullCounts = scala.collection.mutable.Map[Int, Long]()
      val lowerB = scala.collection.mutable.Map[Int, Array[Byte]]()
      val upperB = scala.collection.mutable.Map[Int, Array[Byte]]()
      names.zipWithIndex.foreach { case (name, i) =>
        schema.findFieldByName(name).foreach { field =>
          // flat schemas: top-level child i is orc column i+1
          val s = stats(i + 1)
          valCounts(field.id) = rowCount
          nullCounts(field.id) = rowCount - s.getNumberOfValues
          def put(mn: Option[Literal], mx: Option[Literal]): Unit =
            if (s.getNumberOfValues > 0) {
              mn.foreach(l => lowerB(field.id) = l.toBytes)
              mx.foreach(l => upperB(field.id) = l.toBytes)
            }
          (s, field.fieldType) match {
            case (ic: org.apache.orc.IntegerColumnStatistics, IntT) =>
              put(Some(IntLit(ic.getMinimum.toInt)), Some(IntLit(ic.getMaximum.toInt)))
            case (ic: org.apache.orc.IntegerColumnStatistics, LongT) =>
              put(Some(LongLit(ic.getMinimum)), Some(LongLit(ic.getMaximum)))
            case (ic: org.apache.orc.IntegerColumnStatistics, DateT) =>
              put(Some(DateLit(ic.getMinimum.toInt)), Some(DateLit(ic.getMaximum.toInt)))
            case (dc: org.apache.orc.DoubleColumnStatistics, FloatT) =>
              put(Some(FloatLit(dc.getMinimum.toFloat)), Some(FloatLit(dc.getMaximum.toFloat)))
            case (dc: org.apache.orc.DoubleColumnStatistics, DoubleT) =>
              put(Some(DoubleLit(dc.getMinimum)), Some(DoubleLit(dc.getMaximum)))
            case (sc: org.apache.orc.StringColumnStatistics, StringT)
                if sc.getMinimum != null && sc.getMaximum != null =>
              put(Some(StrLit(sc.getMinimum)), Some(StrLit(sc.getMaximum)))
            case _ => // no exact mapping → no bounds (prune-safe)
          }
        }
      }
      DataFileInfo(
        content = DataFileContent.Data, path = file.getPath, format = "ORC",
        partition = partition, recordCount = rowCount,
        fileSizeInBytes = file.length(),
        columnSizes = Map.empty, valueCounts = valCounts.toMap,
        nullValueCounts = nullCounts.toMap, nanValueCounts = nanCounts,
        lowerBounds = lowerB.toMap, upperBounds = upperB.toMap,
        splitOffsets = splitOffsets, equalityIds = Nil, sortOrderId = Some(0))
    } finally reader.close()
  }

  private def parquetStatToLiteral(v: AnyRef, t: IcebergType): Option[Literal] = (v, t) match {
    case (null, _) => None
    case (i: java.lang.Integer, IntT) => Some(IntLit(i))
    case (i: java.lang.Integer, DateT) => Some(DateLit(i))
    case (l: java.lang.Long, LongT) => Some(LongLit(l))
    case (l: java.lang.Long, TimestampT | TimestampTzT) => Some(TsLit(l))
    case (l: java.lang.Long, TimeT) => Some(TimeLit(l))
    case (f: java.lang.Float, FloatT) => Some(FloatLit(f))
    case (d: java.lang.Double, DoubleT) => Some(DoubleLit(d))
    case (b: java.lang.Boolean, BooleanT) => Some(BoolLit(b))
    case (b: org.apache.parquet.io.api.Binary, StringT) =>
      Some(StrLit(b.toStringUsingUTF8))
    case (b: org.apache.parquet.io.api.Binary, BinaryT) => Some(BytesLit(b.getBytes))
    case (b: org.apache.parquet.io.api.Binary, DecimalT(_, s)) =>
      Some(DecLit(BigInt(new java.math.BigInteger(b.getBytes)), s))
    case (i: java.lang.Integer, DecimalT(_, s)) => Some(DecLit(BigInt(i.intValue()), s))
    case (l: java.lang.Long, DecimalT(_, s)) => Some(DecLit(BigInt(l.longValue()), s))
    case _ => None
  }
}
