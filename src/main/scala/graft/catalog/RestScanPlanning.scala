package graft.catalog

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.core._

/** Client-side codecs and plan-flow for the Iceberg REST catalog's
  * server-side scan-planning endpoints (rest-catalog-open-api:
  * `POST .../tables/{table}/plan`, `GET .../plan/{plan-id}`,
  * `POST .../tables/{table}/tasks`). The reference client
  * (`rest.go`) predates these endpoints entirely; the shapes here follow
  * the published OpenAPI document.
  *
  * At 100 TB the value is operational: a catalog that already holds hot
  * manifest caches (or a columnar metadata index) enumerates the file set
  * once, server-side, and hands the engine opaque `plan-tasks` to fetch —
  * the engine's driver never reads a manifest byte. Everything the
  * downstream scan needs (per-file stats for CBO, split offsets for
  * row-group fan-out, delete-file assignments for MoR) rides the
  * spec's `ContentFile` JSON.
  *
  * What does NOT ride the wire — and therefore which scans must keep
  * planning locally (enforced by the callers, see
  * `TableScan.planFiles` / `GraftScan.tasks`):
  *  - manifest provenance (`FileScanTask.manifestPath`): CoW commits use
  *    it to carry untouched manifests by reference;
  *  - data sequence numbers: V3 row-lineage derivation needs them.
  */
object RestScanPlanning {

  /** Telemetry: plans served by a catalog vs. silent local fallbacks
    * (request failed / filter not expressible) — specs pin both paths. */
  val remotePlans = new java.util.concurrent.atomic.AtomicLong()
  val localFallbacks = new java.util.concurrent.atomic.AtomicLong()

  // ------------------------------------------------------- expression JSON

  /** Spec `Expression` JSON for the plan request's `filter`. Returns None
    * when the expression has no REST serialization (geo bbox predicates,
    * already-bound predicates) — the caller then plans locally. */
  def expressionToJson(e: BooleanExpression,
                       mapper: com.fasterxml.jackson.databind.ObjectMapper)
      : Option[JsonNode] = e match {
    case AlwaysTrue =>
      val n = mapper.createObjectNode(); n.put("type", "true"); Some(n)
    case AlwaysFalse =>
      val n = mapper.createObjectNode(); n.put("type", "false"); Some(n)
    case And(l, r) =>
      for (ln <- expressionToJson(l, mapper); rn <- expressionToJson(r, mapper))
        yield {
          val n = mapper.createObjectNode()
          n.put("type", "and"); n.set[JsonNode]("left", ln); n.set[JsonNode]("right", rn)
          n
        }
    case Or(l, r) =>
      for (ln <- expressionToJson(l, mapper); rn <- expressionToJson(r, mapper))
        yield {
          val n = mapper.createObjectNode()
          n.put("type", "or"); n.set[JsonNode]("left", ln); n.set[JsonNode]("right", rn)
          n
        }
    case Not(c) =>
      expressionToJson(c, mapper).map { cn =>
        val n = mapper.createObjectNode()
        n.put("type", "not"); n.set[JsonNode]("child", cn)
        n
      }
    case UnboundPredicate(op, term, lits) =>
      val opName = op match {
        case OpIsNull => "is-null"
        case OpNotNull => "not-null"
        case OpIsNan => "is-nan"
        case OpNotNan => "not-nan"
        case OpEq => "eq"
        case OpNotEq => "not-eq"
        case OpLt => "lt"
        case OpLtEq => "lt-eq"
        case OpGt => "gt"
        case OpGtEq => "gt-eq"
        case OpIn => "in"
        case OpNotIn => "not-in"
        case OpStartsWith => "starts-with"
        case OpNotStartsWith => "not-starts-with"
        // geo bbox intersection has no REST expression form
        case _ => return None
      }
      val n = mapper.createObjectNode()
      n.put("type", opName)
      n.put("term", term)
      def litNode(l: Literal): Option[JsonNode] =
        try Some(mapper.readTree(SingleValueJson.toJsonString(l, l.literalType)))
        catch { case _: Exception => None }
      op match {
        case OpIsNull | OpNotNull | OpIsNan | OpNotNan => Some(n)
        case OpIn | OpNotIn =>
          val arr = n.putArray("values")
          lits.foreach(l => litNode(l) match {
            case Some(v) => arr.add(v)
            case None => return None
          })
          Some(n)
        case _ =>
          lits.headOption.flatMap(litNode) match {
            case Some(v) => n.set[JsonNode]("value", v); Some(n)
            case None => None
          }
      }
    case _: BoundPredicate => None // bind server-side; bound forms don't travel
  }

  // ----------------------------------------------------- content-file JSON

  /** Spec `file-format` string → the manifest model's upper-case form. */
  private def formatOf(n: JsonNode): String =
    n.get("file-format").asText().toUpperCase

  private def countMap(n: JsonNode, key: String): Map[Int, Long] =
    Option(n.get(key)).filter(!_.isNull).map { m =>
      val keys = m.get("keys"); val values = m.get("values")
      (0 until keys.size()).map(i =>
        keys.get(i).asInt() -> values.get(i).asLong()).toMap
    }.getOrElse(Map.empty)

  /** Bounds ride the spec's ValueMap: per-field-id single-value JSON. The
    * client re-encodes each into the binary single-value form the metrics
    * evaluator consumes; fields the current schema no longer carries are
    * dropped (pruning merely loses their stats — conservative). */
  private def valueMapToBounds(n: JsonNode, key: String,
                               schema: Schema): Map[Int, Array[Byte]] =
    Option(n.get(key)).filter(!_.isNull).map { m =>
      val keys = m.get("keys"); val values = m.get("values")
      (0 until keys.size()).flatMap { i =>
        val id = keys.get(i).asInt()
        schema.findFieldById(id).flatMap { f =>
          try {
            val lit = f.fieldType match {
              // geo bounds are raw WKB carried as hex (binary single-value)
              case _: GeometryT | _: GeographyT =>
                SingleValueJson.parse(BinaryT, values.get(i))
              case t => SingleValueJson.parse(t, values.get(i))
            }
            Some(id -> lit.toBytes)
          } catch { case _: Exception => None }
        }
      }.toMap
    }.getOrElse(Map.empty)

  /** A partition tuple value as the manifest reader materializes it (the
    * Avro-decode conventions partition-tuple evaluation and SPJ grouping
    * were built against). */
  def rawPartitionValue(lit: Literal): Any = lit match {
    case BoolLit(v) => java.lang.Boolean.valueOf(v)
    case IntLit(v) => java.lang.Integer.valueOf(v)
    case LongLit(v) => java.lang.Long.valueOf(v)
    case FloatLit(v) => java.lang.Float.valueOf(v)
    case DoubleLit(v) => java.lang.Double.valueOf(v)
    case StrLit(v) => v
    case DateLit(days) => java.lang.Integer.valueOf(days)
    case TimeLit(us) => java.lang.Long.valueOf(us)
    case TsLit(us) => java.lang.Long.valueOf(us)
    case other => other.toBytes
  }

  /** Parse one spec `ContentFile` (data or delete) into the manifest model.
    * `metadata` resolves the file's partition type from its `spec-id`. */
  def contentFileFromJson(n: JsonNode, metadata: TableMetadata,
                          schema: Schema): DataFileInfo = {
    val specId = Option(n.get("spec-id")).map(_.asInt()).getOrElse(0)
    val spec = metadata.partitionSpecs.find(_.specId == specId)
      .getOrElse(metadata.partitionSpec)
    val partType = spec.partitionType(schema)
    val partArr = Option(n.get("partition")).filter(_.isArray)
      .map(_.asInstanceOf[ArrayNode])
    val partition: Map[String, Any] = partType.fields.zipWithIndex.map {
      case (f, i) =>
        val v = partArr.map(_.get(i)).orNull
        f.name -> (if (v == null || v.isNull) null
                   else rawPartitionValue(SingleValueJson.parse(f.fieldType, v)))
    }.toMap
    val content = n.get("content").asText() match {
      case "data" => 0
      case "position-deletes" => 1
      case "equality-deletes" => 2
      case other => throw new IllegalArgumentException(s"unknown content: $other")
    }
    DataFileInfo(
      content = content,
      path = n.get("file-path").asText(),
      format = formatOf(n),
      partition = partition,
      recordCount = n.get("record-count").asLong(),
      fileSizeInBytes = n.get("file-size-in-bytes").asLong(),
      columnSizes = countMap(n, "column-sizes"),
      valueCounts = countMap(n, "value-counts"),
      nullValueCounts = countMap(n, "null-value-counts"),
      nanValueCounts = countMap(n, "nan-value-counts"),
      lowerBounds = valueMapToBounds(n, "lower-bounds", schema),
      upperBounds = valueMapToBounds(n, "upper-bounds", schema),
      splitOffsets = Option(n.get("split-offsets")).filter(_.isArray)
        .map(a => (0 until a.size()).map(i => a.get(i).asLong()).toSeq)
        .getOrElse(Nil),
      equalityIds = Option(n.get("equality-ids")).filter(_.isArray)
        .map(a => (0 until a.size()).map(i => a.get(i).asInt()).toSeq)
        .getOrElse(Nil),
      sortOrderId = Option(n.get("sort-order-id")).filter(!_.isNull).map(_.asInt()),
      referencedDataFile =
        Option(n.get("referenced-data-file")).filter(!_.isNull).map(_.asText()),
      contentOffset = Option(n.get("content-offset")).filter(!_.isNull).map(_.asLong()),
      contentSizeInBytes =
        Option(n.get("content-size-in-bytes")).filter(!_.isNull).map(_.asLong()),
      firstRowId = Option(n.get("first-row-id")).filter(!_.isNull).map(_.asLong()))
  }

  /** Parse one spec `FileScanTask`: data file + `delete-file-references`
    * (indices into the RESPONSE-scoped `delete-files` array). Server tasks
    * carry no manifest provenance and no data sequence number — callers
    * that need either plan locally. */
  def fileScanTaskFromJson(n: JsonNode, deleteFiles: IndexedSeq[DataFileInfo],
                           metadata: TableMetadata,
                           schema: Schema): FileScanTask = {
    val df = contentFileFromJson(n.get("data-file"), metadata, schema)
    val dels = Option(n.get("delete-file-references")).filter(_.isArray)
      .map(a => (0 until a.size()).map(i => deleteFiles(a.get(i).asInt())).toSeq)
      .getOrElse(Nil)
    val specId = Option(n.get("data-file").get("spec-id"))
      .map(_.asInt()).getOrElse(0)
    FileScanTask(file = df, deleteFiles = dels, specId = specId)
  }
}

/** A table-scoped handle that plans scans through a REST catalog's
  * scan-planning endpoints. `None` from [[plan]] means "not planned
  * remotely" (unexpressible filter, capability missing, or server/parse
  * failure) — the caller falls back to driver-side planning, which is
  * always correct because the client holds the metadata tree. */
trait RemoteScanPlanner {
  def plan(filter: BooleanExpression, snapshotId: Option[Long],
           ref: Option[String], asOfTimestampMs: Option[Long],
           caseSensitive: Boolean): Option[Seq[FileScanTask]]

  /** Incremental form (the plan request's `start-snapshot-id` /
    * `end-snapshot-id`): files APPENDED in (start, end]. Same None-means-
    * plan-locally contract as [[plan]]. */
  def planIncremental(fromSnapshotId: Long,
                      toSnapshotId: Option[Long]): Option[Seq[FileScanTask]]
}

/** Scan-telemetry hook (the REST spec's `metrics` route): called after a
  * scan plans its file set, whether the plan ran server-side or fell back
  * to the driver. Implementations MUST be fire-and-forget — a telemetry
  * failure never fails a scan. */
trait ScanMetricsReporter {
  def report(snapshotId: Option[Long], filter: BooleanExpression,
             projectedFieldNames: Seq[String],
             resultDataFiles: Long, resultDeleteFiles: Long,
             planningDurationNs: Long): Unit
}
