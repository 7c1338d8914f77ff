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
}
