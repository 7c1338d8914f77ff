package graft.core

import java.io.{File, FileInputStream}
import org.scalatest.funsuite.AnyFunSuite

/** Manifest Avro write→read round trips mirroring manifest_test.go:337-564:
  * entries with stats maps, DELETED filtering, V2 seq-num inheritance,
  * manifest-list field summaries. */
class ManifestSpec extends AnyFunSuite {

  private def tmp(name: String): File = {
    val f = File.createTempFile(name, ".avro")
    f.deleteOnExit()
    f
  }

  val partType: StructT = StructT(Seq(NestedField(1000, "day", DateT)))

  def mkEntry(status: Int, path: String, seq: Option[Long],
              snap: Option[Long] = Some(99L)): ManifestEntry =
    ManifestEntry(status, snap, seq, seq,
      DataFileInfo(
        content = 0, path = path, format = "PARQUET",
        partition = Map("day" -> Integer.valueOf(17486)),
        recordCount = 100, fileSizeInBytes = 4321,
        columnSizes = Map(1 -> 500L, 2 -> 600L),
        valueCounts = Map(1 -> 100L, 2 -> 100L),
        nullValueCounts = Map(1 -> 0L, 2 -> 5L),
        nanValueCounts = Map.empty,
        lowerBounds = Map(1 -> LongLit(0).toBytes),
        upperBounds = Map(1 -> LongLit(99).toBytes),
        splitOffsets = Seq(4L),
        equalityIds = Nil,
        sortOrderId = Some(0)))

  val manifest: ManifestFile = ManifestFile(
    path = "", length = 7989, partitionSpecId = 0, content = 0,
    sequenceNumber = 3, minSequenceNumber = 3, addedSnapshotId = 99L,
    addedFilesCount = 1, existingFilesCount = 1, deletedFilesCount = 1,
    addedRowsCount = 100, existingRowsCount = 100, deletedRowsCount = 100,
    partitions = Seq(FieldSummary(containsNull = false, Some(false),
      Some(DateLit(17480).toBytes), Some(DateLit(17490).toBytes))),
    formatVersion = 2)

  test("manifest entries round trip with stats") {
    val f = tmp("manifest")
    val entries = Seq(
      mkEntry(ManifestEntryStatus.Added, "/data/a.parquet", None, snap = None),
      mkEntry(ManifestEntryStatus.Existing, "/data/b.parquet", Some(2L)),
      mkEntry(ManifestEntryStatus.Deleted, "/data/c.parquet", Some(3L)))
    ManifestIO.writeManifest(f, entries, partType)

    val read = ManifestIO.readManifestEntries(new FileInputStream(f),
      manifest.copy(path = f.getPath), discardDeleted = false)
    assert(read.size == 3)
    val a = read.head
    assert(a.dataFile.path == "/data/a.parquet")
    assert(a.dataFile.format == "PARQUET")
    assert(a.dataFile.partition("day") == 17486)
    assert(a.dataFile.recordCount == 100)
    assert(a.dataFile.columnSizes == Map(1 -> 500L, 2 -> 600L))
    assert(a.dataFile.nullValueCounts == Map(1 -> 0L, 2 -> 5L))
    assert(LiteralCodec.fromBytes(LongT, a.dataFile.upperBounds(1)).contains(LongLit(99)))
    assert(a.dataFile.splitOffsets == Seq(4L))

    // inheritance: ADDED entry with no snapshot/seq inherits the manifest's
    assert(a.snapshotId.contains(99L))
    assert(a.sequenceNumber.contains(3L))
    assert(a.fileSequenceNumber.contains(3L))
    // EXISTING entry keeps its own numbers
    assert(read(1).sequenceNumber.contains(2L))
  }

  test("deleted entries filtered by default") {
    val f = tmp("manifest2")
    ManifestIO.writeManifest(f, Seq(
      mkEntry(ManifestEntryStatus.Added, "/a", Some(1L)),
      mkEntry(ManifestEntryStatus.Deleted, "/b", Some(1L))), partType)
    val read = ManifestIO.readManifestEntries(new FileInputStream(f), manifest)
    assert(read.map(_.dataFile.path) == Seq("/a"))
  }

  test("manifest list round trip with partition summaries") {
    val f = tmp("mlist")
    ManifestIO.writeManifestList(f, Seq(manifest.copy(path = "/meta/m1.avro")))
    val read = ManifestIO.readManifestList(new FileInputStream(f))
    assert(read.size == 1)
    val m = read.head
    assert(m.path == "/meta/m1.avro")
    assert(m.length == 7989)
    assert(m.sequenceNumber == 3)
    assert(m.addedFilesCount == 1)
    assert(m.hasAddedFiles && m.hasExistingFiles)
    assert(m.partitions.size == 1)
    val s = m.partitions.head
    assert(!s.containsNull)
    assert(s.containsNaN.contains(false))
    assert(s.lowerBound.flatMap(b => LiteralCodec.fromBytes(DateT, b))
      .contains(DateLit(17480)))
  }

  test("inheritance only for ADDED or first-commit entries") {
    // EXISTING entry with missing seq on a manifest with seq > 0 stays unset
    val e = ManifestEntry(ManifestEntryStatus.Existing, None, None, None,
      mkEntry(0, "/x", None).dataFile)
    val inherited = e.inheritSeqNum(manifest) // manifest seq = 3
    assert(inherited.snapshotId.contains(99L))
    assert(inherited.sequenceNumber.isEmpty)
    // but on a first-commit manifest (seq 0) it inherits
    val first = e.inheritSeqNum(manifest.copy(sequenceNumber = 0))
    assert(first.sequenceNumber.contains(0L))
  }
}
