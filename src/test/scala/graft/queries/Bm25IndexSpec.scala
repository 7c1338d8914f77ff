package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.spark.{IcebergTables, SparkTestSession, TableWriter}

/** Incremental BM25 postings maintenance: after any commit sequence the
  * maintained index equals a from-scratch build over the final state, and
  * BM25 served from it equals BM25 computed directly on the final corpus.
  * Covers batch changelog sync and the read-changes streaming fold. */
class Bm25IndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val P = Bm25Index.OracleParams

  private def docsDF(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def postings(t: graft.spark.IcebergTable): Set[(Long, Long, Long)] =
    t.newScan().toDF(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def freshRebuild(docs: graft.spark.IcebergTable): Set[(Long, Long, Long)] = {
    val loc = Files.createTempDirectory("bm25_rebuild").toFile.getPath
    postings(Bm25Index.build(docs.newScan().toDF(spark), loc, P))
  }

  private def commitSequence(loc: String): Seq[graft.spark.IcebergTable] = {
    val t1 = TableWriter.create(
      docsDF(1L -> "aa bb aa cc", 2L -> "dd ee dd", 3L -> "ff gg"), loc)
    val t2 = TableWriter.append(t1, docsDF(4L -> "aa dd ff", 5L -> "hh ii"))
    val t3 = TableWriter.updateWhere(t2, spark, col("doc_id") === 2L,
      Map("text" -> concat(col("text"), lit(" zz"))))
    val t4 = TableWriter.deleteWhere(t3, spark, col("doc_id") === 3L)
    Seq(t1, t2, t3, t4)
  }

  test("batch changelog sync equals from-scratch rebuild, tf changes included") {
    val loc = Files.createTempDirectory("bm25_docs").toFile.getPath
    val steps = commitSequence(loc)
    val c1 = steps.head.currentSnapshot.get.snapshotId
    val idxLoc = Files.createTempDirectory("bm25_idx").toFile.getPath
    val idx0 = Bm25Index.build(steps.head.newScan().toDF(spark), idxLoc, P)
    val idx = Bm25Index.syncFromChangelog(spark, steps.last, idx0, Some(c1), P)
    assert(postings(idx) == freshRebuild(steps.last))
    // the updated doc's postings reflect the NEW text (gained term 'zz')
    val doc2 = postings(idx).filter(_._1 == 2L)
    assert(doc2 == freshRebuild(steps.last).filter(_._1 == 2L) && doc2.size == 3)
    // the deleted doc is fully retracted
    assert(!postings(idx).exists(_._1 == 3L))
  }

  test("bm25 served from the maintained index equals direct scoring of the final corpus") {
    val loc = Files.createTempDirectory("bm25_docs2").toFile.getPath
    val steps = commitSequence(loc)
    val c1 = steps.head.currentSnapshot.get.snapshotId
    val idxLoc = Files.createTempDirectory("bm25_idx2").toFile.getPath
    val idx = Bm25Index.syncFromChangelog(spark, steps.last,
      Bm25Index.build(steps.head.newScan().toDF(spark), idxLoc, P), Some(c1), P)
    val queries = Seq(0 -> Seq("aa", "dd"), 1 -> Seq("hh"))
    val served = Bm25Index.topK(spark, idx, queries, P, k = 10).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    val s = spark
    import s.implicits._
    val qDf = queries.flatMap { case (q, ts) => ts.map(q -> _) }
      .toDF("qid", "t").select(col("qid"), P.termHash(col("t")).as("term"))
    val direct = Retrieval.bm25FromTf(
      Bm25Index.rows(steps.last.newScan().toDF(spark), P), qDf, 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    assert(served == direct && served.nonEmpty)
    // sanity: doc 4 contains both 'aa' and 'dd' → retrieved for qid 0
    assert(served.exists { case (q, d, _) => q == 0 && d == 4L })
  }

  test("serve slots never serve a stale index state across a sync (r18)") {
    // the r18 resident-index slots key on plan semantics, and a table
    // scan's plan bakes in the planned file list — so serving, evolving
    // the index, and serving again MUST re-fill, never hit stale. This
    // pins the one hazard the serve-path caches could introduce.
    val loc = Files.createTempDirectory("bm25_docs5").toFile.getPath
    val t1 = TableWriter.create(
      docsDF(1L -> "aa bb", 2L -> "cc dd", 3L -> "ee ff"), loc)
    val idxLoc = Files.createTempDirectory("bm25_idx5").toFile.getPath
    val idx1 = Bm25Index.build(t1.newScan().toDF(spark), idxLoc, P)
    val queries = Seq(0 -> Seq("aa"))
    def serve(idx: graft.spark.IcebergTable): Set[Long] =
      Bm25Index.topK(spark, idx, queries, P, k = 10).collect()
        .map(_.getLong(1)).toSet
    assert(serve(idx1) == Set(1L)) // fills the postings slot for state 1
    // evolve: a new doc matching the query arrives via the changefeed
    val t2 = TableWriter.append(t1, docsDF(4L -> "aa zz"))
    val idx2 = Bm25Index.syncFromChangelog(spark, t2, idx1,
      Some(t1.currentSnapshot.get.snapshotId), P)
    // the evolved state is a different plan → different slot entry; a
    // stale hit would return Set(1L) here
    assert(serve(idx2) == Set(1L, 4L))
    // the OLD state keeps serving its own results (keyed, not evicted)
    assert(serve(idx1) == Set(1L))
  }

  test("streaming read-changes maintenance equals from-scratch rebuild") {
    val loc = Files.createTempDirectory("bm25_docs3").toFile.getPath
    val t1 = TableWriter.create(
      docsDF(1L -> "aa bb aa", 2L -> "cc dd", 3L -> "ee ff"), loc)
    val idxLoc = Files.createTempDirectory("bm25_idx3").toFile.getPath
    Bm25Index.build(docsDF().limit(0), idxLoc, P)
    val ck = Files.createTempDirectory("bm25_ck3").toFile.getPath
    val q = Bm25Index.maintain(spark, loc, idxLoc, ck, P)
    try {
      q.processAllAvailable()
      val t2 = TableWriter.append(t1, docsDF(4L -> "aa cc ee"))
      q.processAllAvailable()
      val t3 = TableWriter.updateWhere(t2, spark, col("doc_id") === 1L,
        Map("text" -> lit("aa only")))
      q.processAllAvailable()
      val t4 = TableWriter.deleteWhere(t3, spark, col("doc_id") === 2L)
      q.processAllAvailable()
      assert(postings(IcebergTables.load(idxLoc)) == freshRebuild(t4))
    } finally q.stop()
  }

  test("maintenance with a mismatched term-hash family is refused loudly") {
    val loc = Files.createTempDirectory("bm25_docs4").toFile.getPath
    val t1 = TableWriter.create(docsDF(1L -> "aa bb", 2L -> "cc"), loc)
    val idxLoc = Files.createTempDirectory("bm25_idx4").toFile.getPath
    val idx = Bm25Index.build(t1.newScan().toDF(spark), idxLoc, P)
    assert(idx.properties(Bm25Index.HashFamilyProp) == P.name)
    val t2 = TableWriter.append(t1, docsDF(3L -> "aa dd"))
    val changes = graft.streaming.Changelog.changelogDF(spark, t2,
      Some(t1.currentSnapshot.get.snapshotId))
    val err = intercept[IllegalArgumentException] {
      Bm25Index.applyChanges(idx, changes, Bm25Index.Params()) // xxhash64 vs md5-60
    }
    assert(err.getMessage.contains("term-hash family"))
    // the matching family still applies cleanly
    val ok = Bm25Index.applyChanges(idx, changes, P)
    assert(postings(ok) == freshRebuild(t2))
  }
}
