package graft.spark

import graft.core._

/** Column NDV estimates from a table's preserved `statistics` entries —
  * the read half of the statistics story (commits already carry foreign
  * `statistics`/`partition-statistics` verbatim).
  *
  * Resolution per column: the statistics file registered for the SCANNED
  * snapshot (else the most recently registered one, the standard engine
  * fallback), then per `apache-datasketches-theta-v1` blob:
  *   1. the blob's pre-derived `ndv` property (Puffin spec: writers SHOULD
  *      set it) — zero I/O, straight from table metadata;
  *   2. else the sketch itself, decoded from the Puffin file
  *      ([[graft.core.ThetaSketch]]) — one footer + one blob read.
  *
  * Results cache per (metadata path, snapshot): statistics files are
  * immutable once registered, and the driver consults this on every scan
  * plan, so repeated queries pay nothing. */
object TableStatistics {

  val ThetaBlobType = "apache-datasketches-theta-v1"

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Map[Int, Long]]()

  /** Field id → NDV estimate for a scan of `snapshotId` (default: the
    * table's current snapshot). Empty when the table carries no usable
    * statistics. */
  def ndv(table: IcebergTable, snapshotId: Option[Long] = None): Map[Int, Long] = {
    val snap = snapshotId.orElse(table.metadata.currentSnapshotId)
      .getOrElse(return Map.empty)
    if (table.metadata.statisticsFiles.isEmpty) return Map.empty
    if (cache.size() > (1 << 16)) cache.clear()
    cache.computeIfAbsent((table.metadataPath, snap), { _ =>
      val entry = table.metadata.statisticsFiles.find(_.snapshotId == snap)
        .orElse(table.metadata.statisticsFiles.lastOption)
      entry.toSeq.flatMap { sf =>
        sf.blobs.collect {
          case b if b.blobType == ThetaBlobType && b.fields.size == 1 =>
            b.fields.head -> ndvOfBlob(sf, b)
        }.collect { case (id, Some(n)) => id -> n }
      }.toMap
    })
  }

  private def ndvOfBlob(sf: StatisticsFile,
                        blob: StatsBlobMetadata): Option[Long] =
    blob.properties.get("ndv").flatMap(_.trim.toLongOption)
      .orElse(decodeFromFile(sf, blob))

  private def decodeFromFile(sf: StatisticsFile,
                             blob: StatsBlobMetadata): Option[Long] =
    try {
      val (metas, _) = Puffin.readFooter(sf.path.stripPrefix("file://"))
      metas.find(m => m.blobType == ThetaBlobType &&
          m.fields == blob.fields)
        .map { m =>
          val bytes = Puffin.readBlob(sf.path.stripPrefix("file://"),
            m.offset, m.length)
          math.round(ThetaSketch.estimate(bytes))
        }
    } catch {
      // statistics are advisory: a missing/corrupt file degrades to
      // no-NDV, never to a failed scan
      case _: Exception => None
    }

  // ------------------------------------------------ partition statistics

  private val partCache = new java.util.concurrent.ConcurrentHashMap[
    String, Map[Map[String, String], (Long, Long)]]()

  /** Per-partition (data records, MoR delete records) from the REGISTERED
    * partition-statistics file, when one exists for exactly `snapshotId`
    * (stale registries are ignored — they lie about the pinned state).
    * Keys are the partition tuple normalized to name→string; empty when
    * no usable registry. Driver-side parquet read of O(partitions) rows,
    * cached per file path (the file is immutable once registered). Feeds
    * [[GraftScan.estimateStatistics]]: manifests' recordCount ignores MoR
    * deletes, so without this a mostly-deleted partition looks full to
    * the CBO and a broadcast-able join side doesn't broadcast. The data
    * count rides along so the caller can tell a WHOLE-partition plan
    * (delete subtraction valid) from a file-pruned one (subtracting the
    * partition's full delete count would under-report). */
  def partitionDeleteCounts(table: IcebergTable, snapshotId: Long)
      : Map[Map[String, String], (Long, Long)] = {
    val reg = table.metadata.partitionStatisticsFiles
      .find(_.snapshotId == snapshotId)
      .getOrElse(return Map.empty)
    if (partCache.size() > (1 << 12)) partCache.clear()
    partCache.computeIfAbsent(reg.path, { _ =>
      try readDeleteCounts(reg.path.stripPrefix("file://"))
      catch { case _: Exception => Map.empty }
    })
  }

  /** Normalize a planned task's raw manifest partition tuple to the same
    * name→string form [[readDeleteCounts]] produces. None for value kinds
    * whose string forms can diverge (binary/decimal) — callers skip the
    * adjustment rather than mismatch. */
  def normalizePartition(p: Map[String, Any]): Option[Map[String, String]] = {
    val b = Map.newBuilder[String, String]
    p.foreach {
      case (_, null) =>
      case (k, v: org.apache.avro.util.Utf8) => b += k -> v.toString
      case (k, v @ (_: java.lang.Integer | _: java.lang.Long |
                    _: java.lang.Boolean | _: String)) => b += k -> v.toString
      case _ => return None
    }
    Some(b.result())
  }

  private def readDeleteCounts(path: String)
      : Map[Map[String, String], (Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val out = Map.newBuilder[Map[String, String], (Long, Long)]
    val r = ParquetReader.builder(new GroupReadSupport(),
      new org.apache.hadoop.fs.Path(path)).build()
    try {
      var g = r.read()
      while (g != null) {
        val pg = g.getGroup("partition", 0)
        val key = (0 until pg.getType.getFieldCount).flatMap { i =>
          if (pg.getFieldRepetitionCount(i) == 0) None
          else Some(pg.getType.getFieldName(i) -> pg.getValueToString(i, 0))
        }.toMap
        def longOf(name: String): Long =
          if (g.getFieldRepetitionCount(name) == 0) 0L
          else g.getLong(name, 0)
        out += key -> ((longOf("data_record_count"),
          longOf("position_delete_record_count") +
            longOf("equality_delete_record_count")))
        g = r.read()
      }
    } finally r.close()
    out.result()
  }
}
