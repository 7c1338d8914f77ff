package graft.streaming

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxBytes,
  ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType

import graft.core.{FileScanTask, ManifestIO}
import graft.spark.{DvRef, EqDelete, GraftInputPartition, GraftReaderFactory,
  IcebergTable, IcebergTables, SchemaConv}

/** Snapshot-sequence offset: a micro-batch covers the data files appended
  * in `(fromSeq, toSeq]`. `full` marks an INITIAL offset whose snapshot must
  * be delivered as a complete scan (earliest-start on a table whose older
  * history was expired — the appends can no longer be replayed one by one,
  * but the oldest retained snapshot is still a correct initial load).
  * JSON so checkpoints survive restarts; the `full` field is absent in
  * pre-existing checkpoints and defaults to false. */
final case class GraftOffset(seq: Long, full: Boolean = false) extends Offset {
  override def json(): String =
    if (full) s"""{"seq":$seq,"full":true}""" else s"""{"seq":$seq}"""
}

object GraftOffset {
  def fromJson(json: String): GraftOffset =
    GraftOffset(
      """"seq"\s*:\s*(-?\d+)""".r.findFirstMatchIn(json)
        .map(_.group(1).toLong)
        .getOrElse(throw new IllegalArgumentException(s"bad offset: $json")),
      """"full"\s*:\s*true""".r.findFirstIn(json).isDefined)
}

/** Structured Streaming source over an Iceberg table:
  * `spark.readStream.format("icegopher").load(dir)` — each micro-batch is
  * the set of files APPENDED since the last processed snapshot sequence,
  * resolved purely from metadata (the changefeed `EventStreams
  * .appendedFilesBetween` exposes as a library call). Append-only semantics,
  * the standard for table-format streaming: replace/delete snapshots are
  * surfaced as appends of their new files only.
  *
  * `.option("stream-start", "latest")` begins at the current snapshot
  * (default `earliest` replays the table — file-by-file when the full
  * snapshot history is retained, otherwise a full scan of the oldest
  * retained snapshot as the first batch, incremental from there); a
  * snapshot id or branch/tag name pins the start strictly AFTER that
  * snapshot — the incremental-consumer entry point ("I have processed up
  * to here, give me what follows").
  *
  * `.option("maxFilesPerTrigger", n)` / `.option("maxBytesPerTrigger", b)`
  * bound each micro-batch (SupportsAdmissionControl): the end offset
  * advances snapshot by snapshot only while the cumulative appended file
  * count / byte size stays within budget (always at least one snapshot,
  * so the stream makes progress) — without a bound, a stream started
  * against a large existing table plans the entire history into one
  * giant first batch.
  *
  * Execution reuses the batch read path's vectorized row readers,
  * including MoR delete matching for the initial full scan. */
final class GraftMicroBatchStream(location: String, required: StructType,
                                  streamStart: String,
                                  maxFilesPerTrigger: Option[Int] = None,
                                  maxBytesPerTrigger: Option[Long] = None,
                                  readChanges: Boolean = false,
                                  // the table's catalog of record, when it
                                  // is not the filesystem: each poll loads
                                  // FRESH metadata through it (a
                                  // REST-cataloged stream follows the
                                  // server, never a stale local listing)
                                  reload: Option[() => IcebergTable] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def freshTable(): IcebergTable =
    reload.map(_()).getOrElse(IcebergTables.load(location))

  /** Trigger.AvailableNow: pin the drain target to the table's state at
    * query start. Batches still honor maxFiles/maxBytes admission, but
    * never advance past the pinned sequence — commits racing the backfill
    * are left for the next run, which is what gives AvailableNow its
    * "process exactly what existed, then stop" contract. */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowCap =
      Some(freshTable().currentSnapshot.map(_.sequenceNumber).getOrElse(0L))
  }

  override def initialOffset(): Offset = {
    val t = freshTable()
    streamStart match {
      case "latest" =>
        GraftOffset(t.currentSnapshot.map(_.sequenceNumber).getOrElse(0L))
      case "earliest" | "" =>
        val latest = t.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)
        // replayable iff the MAIN lineage walks back to genesis unbroken
        // (branch commits leave sequence gaps that are NOT expiry)
        val replayable =
          scala.util.Try(EventStreams.mainLineageWindow(t, 0L, latest)).isSuccess
        if (replayable) GraftOffset(0L) // full history retained: replay appends
        else {
          // expired history: the oldest retained snapshot is the earliest
          // correct initial load — deliver it as a full scan
          val oldest = t.metadata.snapshots.minBy(_.sequenceNumber)
          GraftOffset(oldest.sequenceNumber, full = true)
        }
      case pin =>
        // a snapshot id or branch/tag name: the changefeed starts strictly
        // AFTER that snapshot (the consumer has it; deliver what follows) —
        // the standard incremental-consumer entry point, same resolution
        // as batch time travel
        val snap = pin.toLongOption
          .flatMap(id => t.metadata.snapshotById(id))
          .orElse(t.metadata.snapshotByName(pin))
          .getOrElse(throw new IllegalArgumentException(
            s"stream-start '$pin' is not 'earliest', 'latest', a snapshot " +
              s"id, or a ref of $location"))
        GraftOffset(snap.sequenceNumber)
    }
  }

  override def getDefaultReadLimit: ReadLimit = {
    val limits =
      maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n): ReadLimit).toSeq ++
        maxBytesPerTrigger.map(n => ReadLimit.maxBytes(n): ReadLimit).toSeq
    limits match {
      case Nil => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  /** Flatten allAvailable/maxFiles/maxBytes/composite into budget options. */
  private def budgetsOf(limit: ReadLimit): (Option[Long], Option[Long]) =
    limit match {
      case mf: ReadMaxFiles => (Some(mf.maxFiles().toLong), None)
      case mb: ReadMaxBytes => (None, Some(mb.maxBytes()))
      case c: CompositeReadLimit =>
        val parts = c.getReadLimits.map(budgetsOf)
        (parts.flatMap(_._1).minOption, parts.flatMap(_._2).minOption)
      case _ => (None, None)
    }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val t = freshTable()
    val live = t.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)
    val latest = availableNowCap.fold(live)(math.min(live, _))
    val s = start.asInstanceOf[GraftOffset]
    budgetsOf(limit) match {
      case (None, None) => GraftOffset(math.max(s.seq, latest))
      case (fileBudget, byteBudget) =>
        // advance snapshot by snapshot while the cumulative appended file
        // count AND byte size fit; always include at least one snapshot so
        // a single oversized commit cannot stall the stream. O(snapshots)
        // driver metadata: sizes come from the snapshot summary when the
        // writer recorded them, else one manifest-list read.
        var end = s.seq
        var files = fileBudget.getOrElse(Long.MaxValue)
        var bytes = byteBudget.getOrElse(Long.MaxValue)
        var first = true
        var stop = false
        // main-lineage snapshots only: branch commits must neither consume
        // the admission budget nor define the batch end
        EventStreams.mainLineageWindow(t, s.seq, latest)
          .foreach { snap =>
            val isAppend = snap.summary.forall(_.operation == graft.core.OpAppend)
            def summaryLong(key: String): Option[Long] =
              snap.summary.flatMap(_.properties.get(key)).flatMap(_.toLongOption)
            lazy val addedManifests =
              ManifestIO.readManifestList(t.io.open(snap.manifestList))
                .filter(m => m.content == 0 &&
                  m.sequenceNumber == snap.sequenceNumber)
            val nFiles = if (!isAppend) 0L else summaryLong("added-data-files")
              .getOrElse(addedManifests.map(_.addedFilesCount.toLong).sum)
            val nBytes = if (!isAppend) 0L else summaryLong("added-files-size")
              .getOrElse {
                // entry-level fallback: only for snapshots predating the
                // size-stamping writer, one small Avro read each
                addedManifests.flatMap(m =>
                  ManifestIO.readManifestEntries(t.io.open(m.path), m)
                    .filter(_.sequenceNumber.contains(snap.sequenceNumber))
                    .map(_.dataFile.fileSizeInBytes)).sum
              }
            if (!stop && ((nFiles <= files && nBytes <= bytes) || first)) {
              end = snap.sequenceNumber
              files -= nFiles
              bytes -= nBytes
              first = false
            } else stop = true // contiguity: never skip past a full snapshot
          }
        GraftOffset(end)
    }
  }

  override def deserializeOffset(json: String): Offset = GraftOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset]
    val toSeq = end.asInstanceOf[GraftOffset].seq
    val t = freshTable()
    if (readChanges) return planCdcPartitions(t, s, toSeq)
    // initial full scan (earliest over expired history): the offset's own
    // snapshot as a complete MoR-correct scan, plus any appends that landed
    // in (s.seq, toSeq] after it
    val initialScan: Seq[InputPartition] =
      if (!s.full) Nil
      else fullScanPartitions(t, s.seq)
    if (!s.full && toSeq <= s.seq) return Array.empty
    val appended = EventStreams.appendedFilesInWindow(t, s.seq, toSeq)
      .map(task => GraftInputPartition(task.file.path, 0L,
        task.file.fileSizeInBytes,
        required.json, required.json, limit = None): InputPartition)
    (initialScan ++ appended).toArray
  }

  /** Streaming CDC (`.option("read-changes", true)`): each micro-batch
    * carries the row-level changes of the commits in `(fromSeq, toSeq]`,
    * stamped with `_change_type` / `_commit_snapshot_id` /
    * `_commit_sequence` — the streaming twin of
    * [[Changelog.changelogDF]], resolved through the same main-lineage
    * walk and commit provenance, planned as input partitions so the rows
    * decode executor-side:
    *   - appended files → `insert` rows (the commit's deletes applied)
    *   - removed files → `delete` rows, read at the PARENT snapshot so
    *     rows already dead there are not re-reported
    *   - new pos/eq tombstones → `delete` rows: the reader emits exactly
    *     the rows the NEW tombstones kill (older tombstones still
    *     filter), O(affected files) via the planner's delete matching
    *   - REPLACE (compaction) commits are invisible, as in batch
    *
    * A copy-on-write rewrite surfaces copied rows as a delete+insert
    * pair within the SAME batch (net-effect-correct). The partition
    * planner itself cannot cancel those pairs (a per-commit row join),
    * but [[graft.spark.GraftSparkExtensions]] wraps read-changes streams
    * with [[EventStreams.cancelCarryovers]] so the delivered stream
    * matches the batch changelog's default; `.option("cdc-carryovers",
    * "emit")` (or running without the extensions) yields this raw pair
    * surface. Exactly-once: offsets partition the sequence window. */
  private def planCdcPartitions(t: IcebergTable, s: GraftOffset,
                                toSeq: Long): Array[InputPartition] = {
    val parts = Vector.newBuilder[InputPartition]
    if (s.full) {
      // earliest over expired history: the oldest retained snapshot is the
      // initial load, delivered as inserts of that commit
      val snap = t.metadata.snapshots.find(_.sequenceNumber == s.seq).getOrElse(
        throw new IllegalStateException(
          s"initial-offset snapshot (sequence ${s.seq}) of $location was expired"))
      parts ++= cdcPartitions(t, snap.snapshotId, snap, "insert", None, Set.empty)
    }
    Changelog.changedFilesInWindow(t, s.seq, toSeq).foreach { c =>
      val snap = c.snapshot
      if (c.addedPaths.nonEmpty)
        parts ++= cdcPartitions(t, snap.snapshotId, snap, "insert",
          Some(c.addedPaths), Set.empty)
      val parent = snap.parentSnapshotId
      if (c.removedPaths.nonEmpty && parent.isDefined)
        parts ++= cdcPartitions(t, parent.get, snap, "delete",
          Some(c.removedPaths), Set.empty)
      val newDel = c.posDeletePaths.toSet ++ c.eqDeletes.map(_._2) ++
        c.dvDeletes.map(_._2)
      if (newDel.nonEmpty)
        parts ++= cdcPartitions(t, snap.snapshotId, snap, "delete",
          None, newDel)
    }
    parts.result().toArray
  }

  /** Plan CDC row partitions over the files of `snapshotId`, stamped with
    * `commit`: optionally restricted to `pathFilter`; when `newDeletes`
    * is non-empty, only tasks those tombstone files touch are planned and
    * the reader emits only the rows they kill. */
  private def cdcPartitions(t: IcebergTable, snapshotId: Long,
                            commit: graft.core.Snapshot, tpe: String,
                            pathFilter: Option[Set[String]],
                            newDeletes: Set[String]): Seq[InputPartition] = {
    val dataRequired = StructType(required.fields.filterNot(f =>
      f.name == graft.spark.GraftReaders.ChangeTypeCol ||
        f.name == graft.spark.GraftReaders.CommitSnapshotCol ||
        f.name == graft.spark.GraftReaders.CommitSequenceCol))
    val read = SchemaConv.withNameCandidates(dataRequired, t.metadata.schemas,
      SchemaConv.nameMappingOf(t.metadata.properties))
    // parent-snapshot tombstones, planned lazily ONCE per changed commit:
    // needed when a NEW deletion vector merged prior tombstones (the V3
    // rule) — the merged-in positions were dead BEFORE this commit and
    // must be suppressed, not re-emitted as deletes
    lazy val parentDeletes: Map[String, Seq[graft.core.DataFileInfo]] =
      commit.parentSnapshotId.map { pid =>
        t.newScan(snapshotId = Some(pid)).planFiles()
          .map(pt => pt.file.path -> pt.deleteFiles).toMap
      }.getOrElse(Map.empty)
    t.newScan(snapshotId = Some(snapshotId)).planFiles()
      .filter(task => pathFilter.forall(_.contains(task.file.path)))
      .filter(task => newDeletes.isEmpty ||
        task.deleteFiles.exists(d => newDeletes.contains(d.path)))
      .map { task =>
        def eqOf(files: Seq[graft.core.DataFileInfo]): Seq[EqDelete] =
          files.map(d => EqDelete(d.path,
            d.equalityIds.flatMap(id => t.schema.findColumnName(id)),
            d.equalityIds.map(id =>
              (t.schema.findColumnName(id).toSeq ++
                t.metadata.schemas.reverse.flatMap(sc =>
                  sc.findFieldById(id).map(_.name))).distinct)))
        def dvOf(files: Seq[graft.core.DataFileInfo]): Seq[DvRef] =
          files.map(d => DvRef(d.path, d.contentOffset.get,
            d.contentSizeInBytes.get))
        val (dvAll, posAll) = task.deleteFiles
          .filter(_.content == graft.core.DataFileContent.PositionDeletes)
          .partition(_.isDeletionVector)
        val eqAll = task.deleteFiles
          .filter(_.content == graft.core.DataFileContent.EqualityDeletes)
        var pos = posAll.filterNot(d => newDeletes.contains(d.path)).map(_.path)
        val matchPos = posAll.filter(d => newDeletes.contains(d.path)).map(_.path)
        var dvs = dvOf(dvAll.filterNot(d => newDeletes.contains(d.path)))
        val matchDv = dvOf(dvAll.filter(d => newDeletes.contains(d.path)))
        if (matchDv.nonEmpty) {
          // new DV for this file: restore the PARENT's tombstones as the
          // already-dead filter (the current plan hides positional files
          // once a DV exists, and the DV itself merged them)
          val prior = parentDeletes.getOrElse(task.file.path, Nil)
          pos = (pos ++ prior.filter(d =>
            d.content == graft.core.DataFileContent.PositionDeletes &&
              !d.isDeletionVector).map(_.path)).distinct
          dvs = (dvs ++ dvOf(prior.filter(_.isDeletionVector))).distinct
        }
        val eq = eqOf(eqAll.filterNot(d => newDeletes.contains(d.path)))
        val matchEq = eqOf(eqAll.filter(d => newDeletes.contains(d.path)))
        var readSchema = read
        (eq ++ matchEq).flatMap(_.cols).distinct
          .filterNot(c => readSchema.fieldNames.contains(c)).foreach { c =>
            val full = SchemaConv.toSparkSchema(t.schema)
            readSchema = readSchema.add(full(full.fieldIndex(c)).copy(nullable = true))
          }
        if (pos.nonEmpty || matchPos.nonEmpty || dvs.nonEmpty || matchDv.nonEmpty)
          readSchema = readSchema.add(org.apache.spark.sql.types.StructField(
            graft.spark.GraftReaders.RowIndexCol,
            org.apache.spark.sql.types.LongType, nullable = true))
        GraftInputPartition(task.file.path, 0L, task.file.fileSizeInBytes,
          required.json, readSchema.json, limit = None, pos, eq,
          columnar = false, partitionValues = Array.empty,
          format = task.file.format,
          cdc = Some((tpe, commit.snapshotId, commit.sequenceNumber)),
          cdcMatchPos = matchPos, cdcMatchEq = matchEq,
          dvDeletes = dvs, cdcMatchDv = matchDv): InputPartition
      }
  }

  /** Complete scan of the snapshot at `seq`, with positional/equality
    * deletes attached — the streaming twin of the batch read path. */
  private def fullScanPartitions(t: IcebergTable, seq: Long): Seq[InputPartition] = {
    val snap = t.metadata.snapshots.find(_.sequenceNumber == seq).getOrElse(
      throw new IllegalStateException(
        s"initial-offset snapshot (sequence $seq) of $location was expired"))
    val read = SchemaConv.withNameCandidates(required, t.metadata.schemas,
      SchemaConv.nameMappingOf(t.metadata.properties))
    t.newScan(snapshotId = Some(snap.snapshotId)).planFiles().map { task =>
      val (dvFiles, posFiles) = task.deleteFiles
        .filter(_.content == graft.core.DataFileContent.PositionDeletes)
        .partition(_.isDeletionVector)
      val pos = posFiles.map(_.path)
      val dvs = dvFiles.map(d =>
        DvRef(d.path, d.contentOffset.get, d.contentSizeInBytes.get))
      val eq = task.deleteFiles
        .filter(_.content == graft.core.DataFileContent.EqualityDeletes)
        .map(d => EqDelete(d.path,
          d.equalityIds.flatMap(id => t.schema.findColumnName(id)),
          d.equalityIds.map(id =>
            (t.schema.findColumnName(id).toSeq ++
              t.metadata.schemas.reverse.flatMap(sc =>
                sc.findFieldById(id).map(_.name))).distinct)))
      // reader needs the row-index column for positional tombstones and the
      // eq-delete key columns even when projected away
      var readSchema = read
      eq.flatMap(_.cols).distinct
        .filterNot(c => readSchema.fieldNames.contains(c)).foreach { c =>
          val full = SchemaConv.toSparkSchema(t.schema)
          readSchema = readSchema.add(full(full.fieldIndex(c)).copy(nullable = true))
        }
      if (pos.nonEmpty || dvs.nonEmpty)
        readSchema = readSchema.add(org.apache.spark.sql.types.StructField(
          org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
            .ROW_INDEX_TEMPORARY_COLUMN_NAME,
          org.apache.spark.sql.types.LongType, nullable = true))
      GraftInputPartition(task.file.path, 0L, task.file.fileSizeInBytes,
        required.json, readSchema.json, limit = None, pos, eq,
        dvDeletes = dvs): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = new GraftReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
