package graft.core

import java.io.File

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.{IcebergTables, SparkTestSession, TableWriter}

/** Version-compat probes. Since round 11 format-version 3 READS are
  * supported (deletion vectors decode through the scan planner — see
  * DeletionVectorSpec for the full path), so V3 metadata must PARSE;
  * genuinely unknown versions and malformed V3 delete entries must still
  * fail with targeted errors, not generic parse/footer failures. */
class V3ForwardCompatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("format-version 3 metadata parses; unknown versions are refused") {
    val v3 = """{"format-version": 3, "table-uuid": "u", "location": "l",
      "last-updated-ms": 1, "last-column-id": 1,
      "schemas": [{"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": true, "type": "long"}]}],
      "current-schema-id": 0}"""
    val md = TableMetadata.parse(v3)
    assert(md.formatVersion == 3)
    // V3 serializes back as V3 — a DV table must never downgrade to V2
    assert(md.toJson.contains("\"format-version\":3"))
    // unknown future versions keep a targeted refusal
    val e9 = intercept[IllegalArgumentException](
      TableMetadata.parse("""{"format-version": 9}"""))
    assert(e9.getMessage.contains("unsupported format-version: 9"), e9.getMessage)
    val e0 = intercept[IllegalArgumentException](
      TableMetadata.parse("""{"format-version": 0}"""))
    assert(e0.getMessage.contains("unsupported format-version"), e0.getMessage)
  }

  test("a PUFFIN delete entry WITHOUT DV coordinates fails at plan time, named") {
    val s = spark
    import s.implicits._
    val loc = java.nio.file.Files.createTempDirectory("v3probe").toFile.getPath
    val t1 = TableWriter.create(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), loc)
    val t2 = TableWriter.deleteWhere(t1, s, col("id") === 1L)
    // rewrite the positional-delete manifest as if a MALFORMED V3 writer
    // had marked its tombstones PUFFIN but omitted the blob coordinates
    val snap = t2.currentSnapshot.get
    val delM = ManifestIO.readManifestList(t2.io.open(snap.manifestList))
      .find(_.content == 1).get
    val entries = ManifestIO.readManifestEntries(t2.io.open(delM.path), delM)
    val puffed = entries.map(e =>
      e.copy(dataFile = e.dataFile.copy(format = "PUFFIN")))
    ManifestIO.writeManifest(new File(delM.path), puffed, StructT(Nil))

    val e = intercept[UnsupportedOperationException](
      IcebergTables.load(loc).newScan().planFiles())
    assert(e.getMessage.contains("deletion-vector coordinates"), e.getMessage)
    assert(e.getMessage.contains("referenced_data_file"), e.getMessage)
    assert(e.getMessage.contains("PUFFIN"), e.getMessage)
  }
}
