package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.spark.{IcebergTables, SparkTestSession, TableWriter}

/** Incremental MinHash/LSH index maintenance: after ANY commit sequence —
  * appends, copy-on-write updates, MoR deletes — the incrementally-
  * maintained index must equal a from-scratch build over the table's final
  * state, row for row. Covered for both maintenance paths: batch changelog
  * sync and the `read-changes` streaming fold. */
class DedupIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val P = DedupIndex.Params() // xxhash64 family, shingleN=2

  private def docsDF(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Index triples as a comparable set. */
  private def triples(t: graft.spark.IcebergTable): Set[(Long, Int, Long)] =
    t.newScan().toDF(spark).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  private def freshRebuild(docs: graft.spark.IcebergTable): Set[(Long, Int, Long)] = {
    val loc = Files.createTempDirectory("idx_rebuild").toFile.getPath
    triples(DedupIndex.build(docs.newScan().toDF(spark), loc, P))
  }

  /** Drive a table through all commit shapes; returns it after each step. */
  private def commitSequence(loc: String): Seq[graft.spark.IcebergTable] = {
    val t1 = TableWriter.create(
      docsDF(1L -> "aa bb cc dd", 2L -> "ee ff gg hh", 3L -> "ii jj kk ll"), loc)
    val t2 = TableWriter.append(t1,
      docsDF(4L -> "aa bb cc dd", 5L -> "mm nn oo pp"))
    // CoW-style update: positional tombstone + rewritten append
    val t3 = TableWriter.updateWhere(t2, spark, col("doc_id") === 2L,
      Map("text" -> concat(col("text"), lit(" updated"))))
    // MoR positional delete
    val t4 = TableWriter.deleteWhere(t3, spark, col("doc_id") === 3L)
    Seq(t1, t2, t3, t4)
  }

  test("batch changelog sync equals from-scratch rebuild") {
    val loc = Files.createTempDirectory("idx_docs").toFile.getPath
    val steps = commitSequence(loc)
    val c1 = steps.head.currentSnapshot.get.snapshotId
    val idxLoc = Files.createTempDirectory("idx_inc").toFile.getPath
    val idx0 = DedupIndex.build(steps.head.newScan().toDF(spark), idxLoc, P)
    val idx = DedupIndex.syncFromChangelog(spark, steps.last, idx0, Some(c1), P)
    assert(triples(idx) == freshRebuild(steps.last))
    // the updated doc re-hashed: its triples reflect the NEW text
    val doc2 = triples(idx).filter(_._1 == 2L)
    val fresh2 = freshRebuild(steps.last).filter(_._1 == 2L)
    assert(doc2 == fresh2 && doc2.nonEmpty)
    // the deleted doc is fully retracted
    assert(!triples(idx).exists(_._1 == 3L))
  }

  test("per-commit sync equals one-window sync (net effect is order-safe)") {
    val loc = Files.createTempDirectory("idx_docs2").toFile.getPath
    val steps = commitSequence(loc)
    val idxLoc = Files.createTempDirectory("idx_inc2").toFile.getPath
    var idx = DedupIndex.build(steps.head.newScan().toDF(spark), idxLoc, P)
    // apply each commit's changelog window separately
    for (Seq(from, to) <- steps.sliding(2))
      idx = DedupIndex.syncFromChangelog(spark, to, idx,
        Some(from.currentSnapshot.get.snapshotId), P)
    assert(triples(idx) == freshRebuild(steps.last))
  }

  test("net effect: insert-then-delete vanishes; CoW pair nets to insert") {
    val s = spark
    import s.implicits._
    val changes = Seq(
      // doc 10 inserted in commit 2, deleted in commit 3 → net nothing
      ("insert", 10L, "x y z", 2L),
      ("delete", 10L, "x y z", 3L),
      // doc 20: CoW rewrite in commit 2 — delete old + insert new, same seq
      ("delete", 20L, "old text", 2L),
      ("insert", 20L, "new text", 2L))
      .toDF("_change_type", "doc_id", "text", "_commit_sequence")
    val net = DedupIndex.netEffect(changes).collect()
    assert(net.length == 2)
    val byId = net.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("_change_type"), r.getAs[String]("text"))).toMap
    assert(byId(10L)._1 == "delete") // nets to delete → retract only
    assert(byId(20L) == ("insert", "new text"))
  }

  test("streaming read-changes maintenance equals from-scratch rebuild") {
    val loc = Files.createTempDirectory("idx_docs3").toFile.getPath
    val t1 = TableWriter.create(
      docsDF(1L -> "aa bb cc dd", 2L -> "ee ff gg hh", 3L -> "ii jj kk ll"), loc)
    val idxLoc = Files.createTempDirectory("idx_inc3").toFile.getPath
    // bootstrap: empty index + stream from earliest replays commit 1
    DedupIndex.build(docsDF().limit(0), idxLoc, P)
    val ck = Files.createTempDirectory("idx_ck3").toFile.getPath
    val q = DedupIndex.maintain(spark, loc, idxLoc, ck, P)
    try {
      q.processAllAvailable()
      val t2 = TableWriter.append(t1, docsDF(4L -> "aa bb cc dd"))
      q.processAllAvailable()
      val t3 = TableWriter.updateWhere(t2, spark, col("doc_id") === 2L,
        Map("text" -> concat(col("text"), lit(" updated"))))
      q.processAllAvailable()
      val t4 = TableWriter.deleteWhere(t3, spark, col("doc_id") === 3L)
      q.processAllAvailable()
      assert(triples(IcebergTables.load(idxLoc)) == freshRebuild(t4))
    } finally q.stop()
  }
}
