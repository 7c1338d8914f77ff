package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.{GraftSparkExtensions, IcebergTables, SparkTestSession}

/** Streaming CDC carryover cancellation: with [[GraftSparkExtensions]]
  * registered, a `.option("read-changes", true)` stream cancels the
  * delete+insert pairs a copy-on-write rewrite emits for merely-copied
  * rows — the same default as the batch changelog — so an UPDATE
  * mid-stream surfaces only the genuinely changed rows, and the two
  * surfaces agree for the same commit window. */
class CdcCarryoverSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("graft_cdc").toFile.getPath

  private def newExtSession(): SparkSession = {
    val base = SparkTestSession.spark // ensures the SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftSparkExtensions())
      .config("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  private lazy val spark: SparkSession = newExtSession()

  test("UPDATE mid-stream emits only genuinely changed rows; matches batch") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdb")
    spark.sql("CREATE TABLE graft.cdb.t (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.cdb.t SELECT id, id * 2 FROM range(10)")
    val loc = s"$warehouse/cdb/t"
    val q = spark.readStream.format("icegopher")
      .option("read-changes", "true").load(loc)
      .writeStream.format("memory").queryName("cdcclean")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdcclean").count() == 10) // initial inserts

      // CoW UPDATE: one row changes, nine ride along in the rewritten file
      spark.sql("UPDATE graft.cdb.t SET v = v + 100 WHERE id = 3")
      q.processAllAvailable()
      val batch2 = spark.table("cdcclean")
        .filter(col("_change_type") === "delete" ||
          (col("_change_type") === "insert" && col("v") >= 100))
      val rows = spark.table("cdcclean").collect()
      // exactly one delete (3, 6) and one insert (3, 106) — NO carryovers
      assert(rows.length == 12, rows.mkString("\n"))
      val changed = rows.filter(r => r.getString(2) == "delete" ||
        r.getLong(1) >= 100L)
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(changed == Set((3L, 6L, "delete"), (3L, 106L, "insert")),
        changed.toString)

      // batch and streaming agree for the same commit window
      val t = IcebergTables.load(loc)
      val commits = rows.map(_.getAs[Long]("_commit_snapshot_id")).distinct
      val updCommit = rows.filter(_.getString(2) == "delete")
        .map(_.getAs[Long]("_commit_snapshot_id")).head
      val firstCommit = commits.find(_ != updCommit).get
      val batchRows = Changelog.changelogDF(spark, t, Some(firstCommit))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[String]("_change_type"),
          r.getAs[Long]("_commit_snapshot_id"))).toSet
      val streamRows = rows
        .filter(_.getAs[Long]("_commit_snapshot_id") == updCommit)
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getAs[Long]("_commit_snapshot_id"))).toSet
      assert(batchRows == streamRows,
        s"batch=$batchRows\nstream=$streamRows")
      assert(batch2.count() == 2)
    } finally q.stop()
  }

  test("carryover cancel survives a checkpointed restart exactly-once") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdb")
    spark.sql("CREATE TABLE graft.cdb.ckpt (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.cdb.ckpt SELECT id, id * 2 FROM range(10)")
    val loc = s"$warehouse/cdb/ckpt"
    val ckpt = Files.createTempDirectory("graft_cdc_ckpt").toFile.getPath
    val outDir = Files.createTempDirectory("graft_cdc_out").toFile.getPath
    // file sink: the fault-tolerant sink shape (memory sink refuses
    // checkpoint recovery by design)
    def start() = spark.readStream.format("icegopher")
      .option("read-changes", "true").load(loc)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(outDir).count() == 10)

    // commits land while the stream is DOWN; the restart must deliver
    // them exactly once, carryovers still cancelled (the wrapper is part
    // of plan construction, so the restarted query re-applies it)
    spark.sql("UPDATE graft.cdb.ckpt SET v = v + 100 WHERE id = 7")
    spark.sql("INSERT INTO graft.cdb.ckpt VALUES (100, 1)")
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(outDir).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("v"),
          r.getAs[String]("_change_type")))
      val post = rows.filter(r => r._3 == "delete" || r._2 >= 100 || r._1 == 100L)
      assert(post.toSet == Set((7L, 14L, "delete"), (7L, 114L, "insert"),
        (100L, 1L, "insert")), rows.sorted.mkString("\n"))
      assert(rows.length == 13, s"duplicate delivery: ${rows.length} rows")
    } finally q2.stop()
  }

  test("streaming cancel and the batch changelog exceptAll agree") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdb")
    spark.sql("CREATE TABLE graft.cdb.agree (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.cdb.agree SELECT id, id * 2 FROM range(20)")
    spark.sql("UPDATE graft.cdb.agree SET v = 0 WHERE id IN (3, 11)")
    spark.sql("DELETE FROM graft.cdb.agree WHERE id + v = 12") // CoW: id=4
    val t = IcebergTables.load(s"$warehouse/cdb/agree")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getAs[String]("_change_type"),
        r.getAs[Long]("_commit_snapshot_id"))
    val viaExceptAll = Changelog.changelogDF(spark, t, None,
      removeCarryovers = true).collect().map(key).toSet
    val viaGroupCancel = EventStreams.cancelCarryovers(
      Changelog.changelogDF(spark, t, None, removeCarryovers = false))
      .collect().map(key).toSet
    assert(viaExceptAll == viaGroupCancel,
      s"only in exceptAll: ${viaExceptAll -- viaGroupCancel}\n" +
        s"only in groupCancel: ${viaGroupCancel -- viaExceptAll}")
    assert(viaExceptAll.nonEmpty)
  }

  test("cdc-carryovers=emit keeps the raw pair surface") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cdb")
    spark.sql("CREATE TABLE graft.cdb.raw (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.cdb.raw SELECT id, id * 2 FROM range(10)")
    val loc = s"$warehouse/cdb/raw"
    val q = spark.readStream.format("icegopher")
      .option("read-changes", "true")
      .option("cdc-carryovers", "emit").load(loc)
      .writeStream.format("memory").queryName("cdcraw")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      spark.sql("UPDATE graft.cdb.raw SET v = v + 100 WHERE id = 3")
      q.processAllAvailable()
      // the raw surface keeps the carryover delete+insert pairs of the
      // rewritten file: some UNchanged id appears as both delete and
      // insert with the same value in the update commit
      val rows = spark.table("cdcraw").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val carryIds = rows.collect { case (id, v, "delete") if id != 3L => (id, v) }
        .filter(p => rows.contains((p._1, p._2, "insert")))
      assert(carryIds.nonEmpty, rows.mkString("\n"))
    } finally q.stop()
  }
}
