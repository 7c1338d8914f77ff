package graft.core

import com.fasterxml.jackson.databind.JsonNode

/** Partition spec: ordered transforms over source columns
  * (parity with `partitions.go:40-183`). Partition field IDs start at 1000. */
final case class PartitionField(sourceId: Int, fieldId: Int, name: String,
                                transform: Transform)

final case class PartitionSpec(specId: Int, fields: Seq[PartitionField]) {
  def isUnpartitioned: Boolean = fields.isEmpty
  lazy val fieldsBySourceId: Map[Int, Seq[PartitionField]] =
    fields.groupBy(_.sourceId)

  /** The struct type of partition tuples for this spec against `schema` —
    * the piece the reference stubs out (partitions.go:179-183). */
  def partitionType(schema: Schema): StructT =
    StructT(fields.map { f =>
      val src = schema.findFieldById(f.sourceId).getOrElse(
        throw new IllegalArgumentException(s"partition source field ${f.sourceId} not in schema"))
      NestedField(f.fieldId, f.name, f.transform.resultType(src.fieldType))
    })

  def compatibleWith(other: PartitionSpec): Boolean =
    fields.size == other.fields.size &&
      fields.zip(other.fields).forall { case (a, b) =>
        a.sourceId == b.sourceId && a.name == b.name &&
          a.transform.repr == b.transform.repr
      }
}

object PartitionSpec {
  val PartitionDataIdStart = 1000
  val unpartitioned: PartitionSpec = PartitionSpec(0, Nil)

  def fromJson(node: JsonNode): PartitionSpec = {
    val id = Option(node.get("spec-id")).map(_.asInt()).getOrElse(0)
    val fs = Vector.newBuilder[PartitionField]
    Option(node.get("fields")).foreach(_.forEach { f =>
      fs += PartitionField(
        sourceId = f.get("source-id").asInt(),
        fieldId = Option(f.get("field-id")).map(_.asInt()).getOrElse(PartitionDataIdStart),
        name = f.get("name").asText(),
        transform = Transform.parse(f.get("transform").asText()))
    })
    PartitionSpec(id, fs.result())
  }

  /** V1 metadata carries a bare field list (no spec-id key). */
  def fromV1FieldsJson(fields: JsonNode): PartitionSpec = {
    val fs = Vector.newBuilder[PartitionField]
    var nextId = PartitionDataIdStart
    fields.forEach { f =>
      fs += PartitionField(
        sourceId = f.get("source-id").asInt(),
        fieldId = Option(f.get("field-id")).map(_.asInt()).getOrElse { val v = nextId; v },
        name = f.get("name").asText(),
        transform = Transform.parse(f.get("transform").asText()))
      nextId += 1
    }
    PartitionSpec(0, fs.result())
  }
}

/** Sort orders (parity with `table/sorting.go:29-157`): direction +
  * null-order per field, with the spec's defaulting rules (asc →
  * nulls-first, desc → nulls-last, sorting.go:62-77). */
sealed trait SortDirection { def repr: String }
case object SortAsc extends SortDirection { val repr = "asc" }
case object SortDesc extends SortDirection { val repr = "desc" }

sealed trait NullOrder { def repr: String }
case object NullsFirst extends NullOrder { val repr = "nulls-first" }
case object NullsLast extends NullOrder { val repr = "nulls-last" }

final case class SortField(sourceId: Int, transform: Transform,
                           direction: SortDirection, nullOrder: NullOrder)

final case class SortOrder(orderId: Int, fields: Seq[SortField]) {
  def isUnsorted: Boolean = fields.isEmpty
}

object SortOrder {
  val unsorted: SortOrder = SortOrder(0, Nil)

  def fromJson(node: JsonNode): SortOrder = {
    val id = Option(node.get("order-id")).map(_.asInt()).getOrElse(0)
    val fs = Vector.newBuilder[SortField]
    Option(node.get("fields")).foreach(_.forEach { f =>
      val dir = Option(f.get("direction")).map(_.asText()) match {
        case Some("desc") => SortDesc
        case Some("asc") | None => SortAsc
        case Some(other) => throw new IllegalArgumentException(s"invalid sort direction: $other")
      }
      val no = Option(f.get("null-order")).map(_.asText()) match {
        case Some("nulls-first") => NullsFirst
        case Some("nulls-last") => NullsLast
        case None => if (dir == SortAsc) NullsFirst else NullsLast
        case Some(other) => throw new IllegalArgumentException(s"invalid null order: $other")
      }
      fs += SortField(
        sourceId = f.get("source-id").asInt(),
        transform = Transform.parse(f.get("transform").asText()),
        direction = dir, nullOrder = no)
    })
    SortOrder(id, fs.result())
  }
}
