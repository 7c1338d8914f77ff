package graft.streaming

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxFiles,
  SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType

import graft.core.{FileScanTask, ManifestIO}
import graft.spark.{EqDelete, GraftInputPartition, GraftReaderFactory,
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
  * retained snapshot as the first batch, incremental from there).
  *
  * `.option("maxFilesPerTrigger", n)` bounds each micro-batch
  * (SupportsAdmissionControl): the end offset advances snapshot by
  * snapshot only while the cumulative appended-file count stays within
  * `n` (always at least one snapshot, so the stream makes progress) —
  * without it, a stream started against a large existing table plans the
  * entire history into one giant first batch.
  *
  * Execution reuses the batch read path's vectorized row readers,
  * including MoR delete matching for the initial full scan. */
final class GraftMicroBatchStream(location: String, required: StructType,
                                  streamStart: String,
                                  maxFilesPerTrigger: Option[Int] = None)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def freshTable(): IcebergTable = IcebergTables.load(location)

  override def initialOffset(): Offset = {
    val t = freshTable()
    streamStart match {
      case "latest" =>
        GraftOffset(t.currentSnapshot.map(_.sequenceNumber).getOrElse(0L))
      case _ => // earliest
        val latest = t.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)
        val present = t.metadata.snapshots.map(_.sequenceNumber).toSet
        val replayable = (1L to latest).forall(present.contains)
        if (replayable) GraftOffset(0L) // full history retained: replay appends
        else {
          // expired history: the oldest retained snapshot is the earliest
          // correct initial load — deliver it as a full scan
          val oldest = t.metadata.snapshots.minBy(_.sequenceNumber)
          GraftOffset(oldest.sequenceNumber, full = true)
        }
    }
  }

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n): ReadLimit)
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val t = freshTable()
    val latest = t.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)
    val s = start.asInstanceOf[GraftOffset]
    limit match {
      case _: ReadAllAvailable => GraftOffset(math.max(s.seq, latest))
      case mf: ReadMaxFiles =>
        // advance snapshot by snapshot while the cumulative appended-file
        // count fits; always include at least one snapshot so a single
        // oversized commit cannot stall the stream. O(snapshots) metadata.
        var end = s.seq
        var budget = mf.maxFiles().toLong
        var first = true
        t.metadata.snapshots.filter(x =>
            x.sequenceNumber > s.seq && x.sequenceNumber <= latest)
          .sortBy(_.sequenceNumber)
          .foreach { snap =>
            val isAppend = snap.summary.forall(_.operation == graft.core.OpAppend)
            val files = if (!isAppend) 0L else snap.summary
              .flatMap(_.properties.get("added-data-files"))
              .flatMap(_.toLongOption)
              .getOrElse {
                ManifestIO.readManifestList(t.io.open(snap.manifestList))
                  .filter(m => m.content == 0 &&
                    m.sequenceNumber == snap.sequenceNumber)
                  .map(_.addedFilesCount.toLong).sum
              }
            if (files <= budget || first) {
              end = snap.sequenceNumber
              budget -= files
              first = false
            } else budget = -1 // stop extending once a snapshot doesn't fit
          }
        GraftOffset(end)
      case _ => GraftOffset(math.max(s.seq, latest))
    }
  }

  override def deserializeOffset(json: String): Offset = GraftOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset]
    val toSeq = end.asInstanceOf[GraftOffset].seq
    val t = freshTable()
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

  /** Complete scan of the snapshot at `seq`, with positional/equality
    * deletes attached — the streaming twin of the batch read path. */
  private def fullScanPartitions(t: IcebergTable, seq: Long): Seq[InputPartition] = {
    val snap = t.metadata.snapshots.find(_.sequenceNumber == seq).getOrElse(
      throw new IllegalStateException(
        s"initial-offset snapshot (sequence $seq) of $location was expired"))
    val read = SchemaConv.withNameCandidates(required, t.metadata.schemas)
    t.newScan(snapshotId = Some(snap.snapshotId)).planFiles().map { task =>
      val pos = task.deleteFiles
        .filter(_.content == graft.core.DataFileContent.PositionDeletes).map(_.path)
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
      if (pos.nonEmpty)
        readSchema = readSchema.add(org.apache.spark.sql.types.StructField(
          org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
            .ROW_INDEX_TEMPORARY_COLUMN_NAME,
          org.apache.spark.sql.types.LongType, nullable = true))
      GraftInputPartition(task.file.path, 0L, task.file.fileSizeInBytes,
        required.json, readSchema.json, limit = None, pos, eq): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = new GraftReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
