package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.{SparkTestSession, TableWriter}
import graft.tables.Tables

/** The incrementally-maintained aggregate view must be EXACTLY the
  * from-scratch aggregation after any commit sequence — appends, CoW
  * updates, deletes — and groups that empty out must disappear. */
class MatViewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fresh(name: String): String =
    new java.io.File(Files.createTempDirectory("mv").toFile, name).getPath

  test("view after changefeed equals from-scratch over the final state") {
    val src = Tables.documents(spark, sf)
      .select("doc_id", "source", "lang", "text")
    val docsLoc = fresh("docs")
    val viewLoc = fresh("view")
    val t1 = TableWriter.create(src.filter(col("doc_id") % 2 === 0), docsLoc)
    val c1 = t1.currentSnapshot.get.snapshotId
    val v0 = MatView.build(t1.newScan().toDF(spark), viewLoc)
    val t2 = TableWriter.append(t1, src.filter(col("doc_id") % 2 === 1))
    val t3 = TableWriter.updateWhere(t2, spark, col("doc_id") % 5 === 0,
      Map("text" -> concat(col("text"), lit(" v2"))))
    val t4 = TableWriter.deleteWhere(t3, spark, col("doc_id") % 7 === 0)
    val synced = MatView.syncFromChangelog(spark, t4, v0, Some(c1))

    val got = synced.newScan().toDF(spark)
      .select("source", "lang", "docs", "tokens", "chars")
      .orderBy("source", "lang").collect().toSeq
    val want = MatView.aggregate(t4.newScan().toDF(spark))
      .orderBy("source", "lang").collect().toSeq
    assert(got == want, s"incremental view drifted from scratch rebuild")
  }

  test("a group that empties out disappears; idempotent on re-delivery") {
    val s = spark
    import s.implicits._
    val docsLoc = fresh("docs2")
    val viewLoc = fresh("view2")
    val rows = Seq((0L, "web", "en", "a b c"), (1L, "web", "de", "x y"),
      (2L, "books", "en", "p q r s")).toDF("doc_id", "source", "lang", "text")
    val t1 = TableWriter.create(rows, docsLoc)
    val c1 = t1.currentSnapshot.get.snapshotId
    val v0 = MatView.build(t1.newScan().toDF(spark), viewLoc)
    // delete the only (web, de) doc — the group must vanish
    val t2 = TableWriter.deleteWhere(t1, spark, col("lang") === "de")
    val v1 = MatView.syncFromChangelog(spark, t2, v0, Some(c1))
    val after = v1.newScan().toDF(spark)
      .select("source", "lang", "docs").orderBy("source", "lang").collect()
    assert(after.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("books", "en", 1L), ("web", "en", 1L)), after.mkString(","))
    // re-deliver the SAME window: additive deltas would double-apply, so
    // the watermark must make the re-sync a no-op
    val v2 = MatView.syncFromChangelog(spark, t2, v1, Some(c1))
    assert(v2.currentSnapshot.get.snapshotId == v1.currentSnapshot.get.snapshotId,
      "re-delivered window must be a watermark no-op, not a new commit")
    // the merge is ONE commit: retraction + merged rows + watermark land
    // atomically (v0 → v1 is a single snapshot)
    assert(v1.metadata.snapshots.size == v0.metadata.snapshots.size + 1,
      "merge must be one atomic commit")
    // an OVERLAPPING window (full history) is also filtered to a no-op
    val v3 = MatView.syncFromChangelog(spark, t2, v2, None)
    assert(v3.currentSnapshot.get.snapshotId == v1.currentSnapshot.get.snapshotId,
      "overlapping window rows at/below the watermark must be filtered")
  }

  test("streaming read-changes maintenance equals from-scratch rebuild") {
    val s = spark
    import s.implicits._
    def docs(rows: (Long, String, String, String)*) =
      rows.toDF("doc_id", "source", "lang", "text")
    val docsLoc = fresh("sdocs")
    val viewLoc = fresh("sview")
    val t1 = TableWriter.create(docs(
      (1L, "web", "en", "aa bb cc"), (2L, "web", "de", "dd ee"),
      (3L, "books", "en", "ff gg hh ii")), docsLoc)
    // bootstrap EMPTY (watermark unset) — the stream replays from earliest
    MatView.build(docs().limit(0), viewLoc)
    val ck = fresh("sck")
    val q = MatView.maintain(spark, docsLoc, viewLoc, ck)
    try {
      q.processAllAvailable()
      val t2 = TableWriter.append(t1, docs((4L, "web", "en", "jj kk")))
      q.processAllAvailable()
      val t3 = TableWriter.updateWhere(t2, spark, col("doc_id") === 2L,
        Map("text" -> concat(col("text"), lit(" more"))))
      q.processAllAvailable()
      val t4 = TableWriter.deleteWhere(t3, spark, col("doc_id") === 3L)
      q.processAllAvailable()
      val got = graft.spark.IcebergTables.load(viewLoc).newScan().toDF(spark)
        .select("source", "lang", "docs", "tokens", "chars")
        .orderBy("source", "lang").collect().toSeq
      val want = MatView.aggregate(t4.newScan().toDF(spark))
        .orderBy("source", "lang").collect().toSeq
      assert(got == want, s"streamed view drifted: got=$got want=$want")
    } finally q.stop()
  }
}
