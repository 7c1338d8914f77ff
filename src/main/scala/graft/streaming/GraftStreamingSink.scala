package graft.streaming

import java.io.File

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

import graft.spark.{GraftCowCommit, GraftCowWriterFactory, IcebergTables, PartFieldSpec, TableWriter}

/** Structured Streaming SINK over an Iceberg table:
  * `df.writeStream.format("icegopher").start(dir)` — each epoch commits one
  * APPEND snapshot through the same task writers as batch writes (partition
  * tuples + NaN counts derived per row, parquet field ids stamped).
  *
  * Exactly-once across epoch retries: the committed epoch id rides the
  * snapshot summary (`streaming-epoch-id`); a replayed commit for the
  * already-current epoch deletes its files and returns without a new
  * snapshot. Readers (including the streaming SOURCE) see each epoch
  * atomically — a table can sit mid-pipeline as both sink and source. */
final class GraftStreamingWrite(location: String, schema: StructType)
    extends StreamingWrite {

  private val writeDir =
    new File(location, s"data/stream-${java.util.UUID.randomUUID()}")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    writeDir.mkdirs()
    val table = IcebergTables.load(location)
    val partFields = table.spec.fields.map { pf =>
      val src = table.schema.findFieldById(pf.sourceId).getOrElse(
        throw new IllegalStateException(s"partition source ${pf.sourceId} missing"))
      PartFieldSpec(src.name, pf.transform.repr, pf.name)
    }
    val inner = GraftCowWriterFactory(writeDir.getPath,
      GraftCowWriterFactory.withParquetIds(schema, table.schema).json, partFields,
      GraftCowWriterFactory.floatFieldsOf(table.schema, schema),
      GraftCowWriterFactory.parquetPropsOf(
        org.apache.spark.sql.SparkSession.active),
      GraftCowWriterFactory.targetFileBytes(table.properties))
    new StreamingDataWriterFactory {
      // task attempt ids are globally unique per SparkContext, so file
      // names cannot collide across epochs or retries
      override def createWriter(partitionId: Int, taskId: Long,
                                epochId: Long): DataWriter[InternalRow] =
        inner.createWriter(partitionId, taskId)
    }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val added = messages.collect { case m: GraftCowCommit => m.files }.flatten.toSeq
    val current = IcebergTables.load(location)
    val lastEpoch = current.currentSnapshot.flatMap(_.summary)
      .flatMap(_.properties.get(GraftStreamingWrite.EpochKey))
    if (lastEpoch.contains(epochId.toString)) {
      // epoch retry after a successful commit: drop the duplicate files
      added.foreach(f => new File(f.path).delete())
      return
    }
    if (added.isEmpty) return // empty micro-batch: no empty snapshots
    TableWriter.appendFiles(location, added,
      Map(GraftStreamingWrite.EpochKey -> epochId.toString))
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: GraftCowCommit =>
      m.files.foreach(f => new File(f.path).delete())
    }
}

object GraftStreamingWrite {
  val EpochKey = "streaming-epoch-id"
}
