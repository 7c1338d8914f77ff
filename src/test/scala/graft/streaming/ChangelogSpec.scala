package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.{IcebergTables, SparkTestSession, TableWriter}

/** Row-level CDC: per-commit insert/delete rows resolved from the
  * DELETED-entry provenance the writer records, never by diffing whole
  * snapshots. */
class ChangelogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(name: String): String =
    Files.createTempDirectory(name).toFile.getPath

  private def changes(loc: String, from: Option[Long] = None)
      : Seq[(Long, String, Long)] = {
    val t = IcebergTables.load(loc)
    Changelog.changelogDF(spark, t, from)
      .select("id", "_change_type", "_commit_sequence")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
  }

  test("appends surface as inserts, MoR deletes as row deletes") {
    val loc = tmpDir("cdc_basic")
    val t1 = TableWriter.create(Seq(1L, 2L).toDF("id").coalesce(1), loc)
    val t2 = TableWriter.append(t1, Seq(3L).toDF("id").coalesce(1))
    TableWriter.deleteWhere(t2, spark, col("id") === 2L)

    val got = changes(loc).sortBy(c => (c._3, c._1))
    assert(got == Seq((1L, "insert", 1L), (2L, "insert", 1L),
      (3L, "insert", 2L), (2L, "delete", 3L)), s"got $got")
  }

  test("equality deletes surface the deleted keys' rows") {
    val loc = tmpDir("cdc_eq")
    val t1 = TableWriter.create(Seq((1L, "a"), (2L, "b"), (3L, "b"))
      .toDF("id", "cat").coalesce(1), loc)
    TableWriter.deleteEquality(IcebergTables.load(loc),
      Seq("b").toDF("cat"), Seq("cat"))
    val got = changes(loc).filter(_._2 == "delete").map(_._1).sorted
    assert(got == Seq(2L, 3L), s"got $got")
  }

  test("MoR update emits delete of the old value then insert of the new") {
    val loc = tmpDir("cdc_upd")
    val t1 = TableWriter.create(
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v").coalesce(1), loc)
    TableWriter.updateWhere(t1, spark, col("id") === 2L,
      Map("v" -> (col("v") * 2)))
    val t2 = IcebergTables.load(loc)
    val df = Changelog.changelogDF(spark, t2, None)
      .filter(col("_commit_sequence") > 1L)
      .select("id", "v", "_change_type")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    // updateWhere = tombstone commit + append commit: old value out, new in;
    // the untouched row 1 never appears
    assert(df == Set((2L, 20.0, "delete"), (2L, 40.0, "insert")), s"got $df")
  }

  test("unpublished branch commits stay out of the changefeed and changelog") {
    val loc = tmpDir("cdc_wap")
    val t1 = TableWriter.create(Seq(1L).toDF("id").coalesce(1), loc)
    // branch commit between two main commits: consumes a sequence number
    val t2 = TableWriter.appendToBranch(t1, Seq(99L).toDF("id").coalesce(1), "audit")
    val t3 = TableWriter.append(t2, Seq(2L).toDF("id").coalesce(1))

    // changelog over main: no 99, no expired-history false positive on the
    // sequence gap the branch commit left
    val got = changes(loc).sortBy(c => (c._3, c._1))
    assert(got.map(_._1) == Seq(1L, 2L), s"got $got")

    // appends-only changefeed: same lineage semantics
    val files = EventStreams.appendedFilesInWindow(IcebergTables.load(loc),
      0L, t3.currentSnapshot.get.sequenceNumber)
    assert(files.size == 2, s"expected 2 main appends, got ${files.size}")

    // published branches ARE the lineage: on a fresh table, staging then
    // fast-forwarding makes the staged rows appear in the changelog
    val loc2 = tmpDir("cdc_wap2")
    val u1 = TableWriter.create(Seq(1L).toDF("id").coalesce(1), loc2)
    val u2 = TableWriter.appendToBranch(u1, Seq(99L).toDF("id").coalesce(1), "audit")
    assert(changes(loc2).map(_._1) == Seq(1L))
    TableWriter.fastForward(u2, "audit")
    assert(changes(loc2).map(_._1).toSet == Set(1L, 99L))
  }

  test("compaction is invisible; overwrite surfaces both sides; window bounds hold") {
    val loc = tmpDir("cdc_rw")
    val t1 = TableWriter.create(Seq(1L, 2L).toDF("id").coalesce(1), loc)
    val t2 = TableWriter.append(t1, Seq(3L).toDF("id").coalesce(1))
    val compactedAt = TableWriter.compact(t2, spark, 1)
      .currentSnapshot.get.snapshotId
    // compaction (REPLACE) must emit nothing
    assert(changes(loc).count(_._3 == 3L) == 0)

    TableWriter.overwrite(IcebergTables.load(loc), Seq(9L).toDF("id").coalesce(1))
    val ow = changes(loc).filter(_._3 == 4L).sortBy(c => (c._2, c._1))
    assert(ow == Seq((1L, "delete", 4L), (2L, "delete", 4L), (3L, "delete", 4L),
      (9L, "insert", 4L)), s"got $ow")

    // bounded window: starting after compaction sees only the overwrite
    val fromCompact = changes(loc, from = Some(compactedAt))
    assert(fromCompact.forall(_._3 == 4L), s"got $fromCompact")
  }

  test("rewrite carryovers cancel by default; opt-out keeps raw pairs") {
    val loc = tmpDir("cdc_carry")
    TableWriter.create(Seq(1L, 2L, 3L).toDF("id").coalesce(1), loc)
    // a CoW-delete-shaped rewrite: 3 goes away, 1 and 2 are merely COPIED
    TableWriter.overwrite(IcebergTables.load(loc),
      Seq(1L, 2L).toDF("id").coalesce(1))

    val deduped = changes(loc).filter(_._3 == 2L)
    assert(deduped == Seq((3L, "delete", 2L)),
      s"carryovers must cancel, got $deduped")

    val raw = Changelog.changelogDF(spark, IcebergTables.load(loc), None,
        removeCarryovers = false)
      .filter(col("_commit_sequence") === 2L)
      .select("id", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      .sortBy(c => (c._2, c._1))
    assert(raw == Seq((1L, "delete"), (2L, "delete"), (3L, "delete"),
      (1L, "insert"), (2L, "insert")), s"got $raw")
  }

  test("unbounded changelog over expired history reports retained commits") {
    val loc = tmpDir("cdc_expired")
    val t1 = TableWriter.create(Seq(1L).toDF("id").coalesce(1), loc)
    val t2 = TableWriter.append(t1, Seq(2L).toDF("id").coalesce(1))
    val t3 = TableWriter.append(t2, Seq(3L).toDF("id").coalesce(1))
    // expire everything but the latest two snapshots
    TableWriter.expireSnapshots(t3, System.currentTimeMillis() + 1000,
      retainLast = 2)
    // fromSnapshotId = None no longer throws: the walk stops at the oldest
    // retained ancestor and reports what the retained commits recorded
    // (rows of the expired genesis commit are gone; both retained appends
    // report their own adds)
    val got = changes(loc)
    assert(got.map(_._1).sorted == Seq(2L, 3L), s"got $got")
  }
}
