package graft.spark

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Commit-time metadata retention (spec table properties
  * `write.metadata.previous-versions-max` and
  * `write.metadata.delete-after-commit.enabled`): a table that commits
  * millions of times must not accumulate millions of metadata files, nor
  * let the metadata-log grow the metadata file itself without bound.
  * Truncation of the log is unconditional (beyond the cap); physical
  * deletion of old version files is opt-in, and only ever happens AFTER a
  * successful CAS. */
class MetadataCleanupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkRow(i: Long) = {
    val s = spark
    import s.implicits._
    Seq((i, s"r$i")).toDF("id", "v")
  }

  private def versionsOn(loc: String): Seq[Int] =
    Option(new File(loc, "metadata").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .map(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
      .sorted.toSeq

  test("delete-after-commit prunes to previous-versions-max; the survivor " +
      "window loads and reads whole") {
    val loc = Files.createTempDirectory("md_cleanup_on").toFile.getPath
    var t = TableWriter.create(mkRow(0L), loc, properties = Map(
      "write.metadata.delete-after-commit.enabled" -> "true",
      "write.metadata.previous-versions-max" -> "2"))
    (1L to 6L).foreach(i => t = TableWriter.append(t, mkRow(i)))
    assert(t.loadedVersion == 7)
    // current v7 + the 2 newest previous (v5, v6); v1-v4 deleted
    assert(versionsOn(loc) == Seq(5, 6, 7))
    // the metadata-log is truncated to the cap and points at live files
    assert(t.metadata.metadataLog.size == 2)
    t.metadata.metadataLog.foreach(e =>
      assert(new File(e.metadataFile.stripPrefix("file://")).isFile,
        s"log points at a deleted file: ${e.metadataFile}"))
    // the table still loads through the hint and reads every row
    val got = IcebergTables.load(loc).newScan().toDF(spark)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L to 6L))
  }

  test("without the opt-in, every version file survives") {
    val loc = Files.createTempDirectory("md_cleanup_off").toFile.getPath
    var t = TableWriter.create(mkRow(0L), loc)
    (1L to 5L).foreach(i => t = TableWriter.append(t, mkRow(i)))
    assert(versionsOn(loc) == (1 to 6))
    // default cap (100) leaves the log untouched at this depth
    assert(t.metadata.metadataLog.size == 5)
  }

  test("a failed CAS never deletes: the losing writer's cleanup does not run") {
    val loc = Files.createTempDirectory("md_cleanup_cas").toFile.getPath
    var t = TableWriter.create(mkRow(0L), loc, properties = Map(
      "write.metadata.delete-after-commit.enabled" -> "true",
      "write.metadata.previous-versions-max" -> "1"))
    (1L to 3L).foreach(i => t = TableWriter.append(t, mkRow(i)))
    val before = versionsOn(loc)
    // stale handle: the CAS to version loadedVersion+1 must fail because
    // that version already exists — and the file set must be untouched
    val stale = t
    TableWriter.append(stale, mkRow(99L)) // advances to v5 from fresh state
    val afterOk = versionsOn(loc)
    intercept[Exception] {
      // direct conflict: another append from the SAME stale handle now
      // targets an existing version
      TableWriter.append(stale, mkRow(100L))
    }
    assert(versionsOn(loc) == afterOk,
      "a conflicting commit must not delete or add metadata files")
    assert(before.forall(v => afterOk.contains(v) || v < afterOk.min))
  }
}
