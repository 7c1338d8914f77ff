package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** ManifestEvaluator edge semantics + positional-delete sequence matching
  * (scanner.go:144-193 semantics: deleteSeq >= dataSeq). */
class ScanPlannerSpec extends AnyFunSuite {

  // --- ManifestEvaluator notNull: unknown must never skip ------------------

  private val schema = Schema(0, StructT(Seq(
    NestedField(1, "v", DoubleT),
    NestedField(2, "k", IntT))))
  private def specFor(sourceId: Int): PartitionSpec =
    PartitionSpec(0, Seq(PartitionField(sourceId, 1000, "p", IdentityTransform)))

  private def notNullEval(spec: PartitionSpec): ManifestEvaluator = {
    val src = schema.findFieldById(spec.fields.head.sourceId).get
    val part = NestedField(1000, "p", src.fieldType)
    new ManifestEvaluator(spec, schema,
      BoundPredicate(OpNotNull, part))
  }

  private def mf(summary: FieldSummary): ManifestFile =
    ManifestFile("/m.avro", 1, 0, 0, 1, 1, 1L, 1, 0, 0, 10, 0, 0,
      Seq(summary), 2)

  test("notNull keeps manifest whose summary has no bounds recorded") {
    // a writer may legitimately omit bounds for types it doesn't summarize;
    // missing evidence must not skip
    val keep = notNullEval(specFor(2)).eval(
      mf(FieldSummary(containsNull = false, None, None, None)))
    assert(keep)
  }

  test("notNull skips only on positive all-null evidence (int)") {
    val skip = notNullEval(specFor(2)).eval(
      mf(FieldSummary(containsNull = true, None, None, None)))
    assert(!skip)
  }

  test("notNull on float keeps when NaN presence is unknown") {
    // all-null inference is unsafe for float/double unless containsNaN=false:
    // NaN values produce no bounds but are not null
    val ev = notNullEval(specFor(1))
    assert(ev.eval(mf(FieldSummary(containsNull = true, None, None, None))))
    assert(ev.eval(mf(FieldSummary(containsNull = true, Some(true), None, None))))
    assert(!ev.eval(mf(FieldSummary(containsNull = true, Some(false), None, None))))
  }

  test("notNull keeps manifest with bounds present") {
    assert(notNullEval(specFor(2)).eval(
      mf(FieldSummary(containsNull = true, None,
        Some(IntLit(1).toBytes), Some(IntLit(9).toBytes)))))
  }

  // --- matchDeletes sequence bound ----------------------------------------

  private def fileInfo(content: Int, path: String): DataFileInfo =
    DataFileInfo(content, path, "PARQUET", Map.empty, 10, 100,
      Map.empty, Map.empty, Map.empty, Map.empty, Map.empty, Map.empty,
      Nil, Nil, None)

  private def dataEntry(seq: Long): ManifestEntry =
    ManifestEntry(ManifestEntryStatus.Added, Some(1L), Some(seq), Some(seq),
      fileInfo(0, "/data/a.parquet"))

  private def deleteEntry(seq: Long): ManifestEntry =
    ManifestEntry(ManifestEntryStatus.Added, Some(1L), Some(seq), Some(seq),
      fileInfo(DataFileContent.PositionDeletes, s"/data/del_$seq.parquet"))

  private val planner = new ScanPlanner(LocalFileIO,
    TableMetadata(2, "uuid", "/tbl", 0L, 0L, 2, Seq(schema), 0,
      Seq(PartitionSpec.unpartitioned), 0, None, Map.empty, Nil, None,
      Nil, Nil, Seq(SortOrder.unsorted), 0, Map.empty))

  test("positional delete one sequence older than data is NOT assigned") {
    val matched = planner.matchDeletes(dataEntry(seq = 5L),
      Seq(deleteEntry(4L)).sortBy(_.sequenceNumber.get))
    assert(matched.isEmpty)
  }

  test("positional delete at same or newer sequence IS assigned") {
    val matched = planner.matchDeletes(dataEntry(seq = 5L),
      Seq(deleteEntry(4L), deleteEntry(5L), deleteEntry(6L))
        .sortBy(_.sequenceNumber.get))
    assert(matched.map(_.path) == Seq("/data/del_5.parquet", "/data/del_6.parquet"))
  }
}
