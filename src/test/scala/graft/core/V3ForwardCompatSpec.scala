package graft.core

import java.io.File

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.{IcebergTables, SparkTestSession, TableWriter}

/** Forward-compat probes for Iceberg format-version 3: V3 tables in the
  * wild carry deletion vectors (Puffin files), row lineage, and default
  * column values — none supported here yet. The engine must fail with a
  * TARGETED error naming the V3 feature and the remediation, not a
  * generic parse/footer failure. */
class V3ForwardCompatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("format-version 3 metadata is rejected with a feature-naming error") {
    val v3 = """{"format-version": 3, "table-uuid": "u", "location": "l"}"""
    val e = intercept[IllegalArgumentException](TableMetadata.parse(v3))
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
    assert(e.getMessage.contains("format-version 2"), e.getMessage)
    // other unknown versions keep the generic message
    val e9 = intercept[IllegalArgumentException](
      TableMetadata.parse("""{"format-version": 9}"""))
    assert(!e9.getMessage.contains("deletion vectors"), e9.getMessage)
  }

  test("a PUFFIN delete entry fails at plan time naming deletion vectors") {
    val s = spark
    import s.implicits._
    val loc = java.nio.file.Files.createTempDirectory("v3probe").toFile.getPath
    val t1 = TableWriter.create(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), loc)
    val t2 = TableWriter.deleteWhere(t1, s, col("id") === 1L)
    // rewrite the positional-delete manifest as if a V3 writer had
    // committed its tombstones as a Puffin deletion vector
    val snap = t2.currentSnapshot.get
    val delM = ManifestIO.readManifestList(t2.io.open(snap.manifestList))
      .find(_.content == 1).get
    val entries = ManifestIO.readManifestEntries(t2.io.open(delM.path), delM)
    val puffed = entries.map(e =>
      e.copy(dataFile = e.dataFile.copy(format = "PUFFIN")))
    ManifestIO.writeManifest(new File(delM.path), puffed, StructT(Nil))

    val e = intercept[UnsupportedOperationException](
      IcebergTables.load(loc).newScan().planFiles())
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
    assert(e.getMessage.contains("format-version 3"), e.getMessage)
    assert(e.getMessage.contains("PUFFIN"), e.getMessage)
  }
}
