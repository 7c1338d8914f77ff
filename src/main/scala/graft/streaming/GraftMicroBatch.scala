package graft.streaming

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

import graft.spark.{GraftInputPartition, GraftReaderFactory, IcebergTable, IcebergTables}

/** Snapshot-sequence offset: a micro-batch covers the data files appended
  * in `(fromSeq, toSeq]`. JSON so checkpoints survive restarts. */
final case class GraftOffset(seq: Long) extends Offset {
  override def json(): String = s"""{"seq":$seq}"""
}

object GraftOffset {
  def fromJson(json: String): GraftOffset =
    GraftOffset(""""seq"\s*:\s*(-?\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json")))
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
  * (default `earliest` replays the whole table as the first batch).
  * Execution reuses the batch read path's vectorized row readers. */
final class GraftMicroBatchStream(location: String, required: StructType,
                                  streamStart: String)
    extends MicroBatchStream {

  private def freshTable(): IcebergTable = IcebergTables.load(location)

  override def initialOffset(): Offset = {
    val t = freshTable()
    streamStart match {
      case "latest" =>
        GraftOffset(t.currentSnapshot.map(_.sequenceNumber).getOrElse(0L))
      case _ => GraftOffset(0L) // earliest: replay everything
    }
  }

  override def latestOffset(): Offset = {
    val t = freshTable()
    GraftOffset(t.currentSnapshot.map(_.sequenceNumber).getOrElse(0L))
  }

  override def deserializeOffset(json: String): Offset = GraftOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val fromSeq = start.asInstanceOf[GraftOffset].seq
    val toSeq = end.asInstanceOf[GraftOffset].seq
    if (toSeq <= fromSeq) return Array.empty
    // per-snapshot changelog: each append snapshot's files come from its
    // OWN manifest list, so a compaction racing the batch planner cannot
    // hide an append committed inside the window (see appendedFilesInWindow)
    EventStreams.appendedFilesInWindow(freshTable(), fromSeq, toSeq)
      .map(t => GraftInputPartition(t.file.path, 0L, t.file.fileSizeInBytes,
        required.json, required.json, limit = None): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new GraftReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
