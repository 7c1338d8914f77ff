package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spark.{IcebergTable, IcebergTables, TableWriter}
import graft.streaming.Changelog
import graft.tables.Tables

/** Incrementally-maintained aggregate materialized view.
  *
  * The dashboard every training pipeline keeps open — "how many docs /
  * tokens per (source, lang)" (t06's token budget) — cannot be a
  * full-corpus re-aggregation after every ingest at 100 TB. This module
  * maintains the aggregate as a Graft Iceberg table from the corpus
  * table's changefeed, the [[DedupIndex]] discipline applied to
  * aggregation instead of indexing:
  *
  *   - the changelog window folds into per-group DELTAS (insert rows
  *     count +1/+toks, delete rows count -1/-toks — a CoW update's
  *     delete+insert pair nets the token difference, and carryover
  *     pairs of untouched rows net zero BY ALGEBRA, so the maintenance
  *     is correct with or without carryover cancellation);
  *   - only TOUCHED groups are read back from the view (left-semi join
  *     against the delta keys — with the view bucketed/sorted by group
  *     key, file pruning makes that read O(touched groups));
  *   - the merge is ONE ATOMIC commit ([[TableWriter.replaceEquality]]):
  *     an equality-delete manifest retracting the touched keys, the
  *     merged rows appended at the same sequence (exempt from the delete
  *     by Iceberg's strictly-smaller-sequence rule), and the exactly-once
  *     watermark ([[AppliedSeqProp]]) advanced in the same metadata swap
  *     — O(touched groups) regardless of corpus or view size, and no
  *     reader ever sees a retracted-but-unmerged state.
  *
  * All maintained measures are INTEGERS (counts, whitespace-token sums,
  * char sums), so incremental merge is exact — no float drift between
  * the maintained view and a from-scratch aggregation, which is what
  * lets the battery hash-compare the two. */
object MatView {

  /** The maintained aggregate over a documents batch: one row per
    * (source, lang) with doc count, whitespace-token sum and char sum. */
  def aggregate(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("lang"),
        graft.spark.functions.Bpe.whitespaceCount(col("text")).as("toks"),
        length(col("text")).cast("long").as("chars"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("docs"), sum(col("toks")).as("tokens"),
        sum(col("chars")).as("chars"))

  /** Bootstrap: full aggregation into a new view table. */
  def build(docs: DataFrame, location: String): IcebergTable =
    TableWriter.create(aggregate(docs), location)

  /** Per-group deltas of a changelog window: signed doc/token/char sums.
    * Every changelog row contributes — unlike [[DedupIndex.netEffect]]
    * there is no last-wins collapse, because aggregation is additive:
    * five updates to a doc contribute four cancelling pairs plus the
    * final state. Groups whose deltas all cancel drop out here, so an
    * untouched group never reaches the merge. */
  private[queries] def deltas(changes: DataFrame): DataFrame = {
    val sgn = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    changes.select(col("source"), col("lang"), sgn.as("sgn"),
        graft.spark.functions.Bpe.whitespaceCount(col("text")).as("toks"),
        length(col("text")).cast("long").as("chars"))
      .groupBy("source", "lang")
      .agg(sum(col("sgn")).as("d_docs"),
        sum(col("sgn") * col("toks")).as("d_tokens"),
        sum(col("sgn") * col("chars")).as("d_chars"))
      .filter(col("d_docs") =!= 0 || col("d_tokens") =!= 0 ||
        col("d_chars") =!= 0)
  }

  /** The view table property recording the highest `_commit_sequence`
    * already folded in. Additive merge is NOT content-idempotent (unlike
    * [[DedupIndex.applyChanges]]'s retract-and-rebuild), so exactly-once
    * comes from this watermark: rows at or below it are filtered out of
    * every window, and the watermark advances IN the merge commit itself
    * ([[TableWriter.replaceEquality]] carries state + bookkeeping
    * atomically) — a re-delivered or overlapping window is a no-op. */
  val AppliedSeqProp = "graft.mv.applied-sequence"

  /** Fold one changelog window into the view in ONE atomic commit:
    * equality-delete the touched group keys, append their merged rows,
    * advance the watermark. A group whose doc count reaches zero
    * disappears from the view. */
  def applyChanges(view: IcebergTable, changes: DataFrame,
                   s: SparkSession): IcebergTable = {
    val applied = view.properties.get(AppliedSeqProp).flatMap(_.toLongOption)
      .getOrElse(Long.MinValue)
    val fresh = changes.filter(col("_commit_sequence") > applied).persist()
    try {
      val hi = fresh.agg(max(col("_commit_sequence"))).collect()(0)
      if (hi.isNullAt(0)) view
      else {
        val dl = deltas(fresh)
        val touched = dl.select("source", "lang")
        val current = view.newScan().toDF(s)
          .join(touched, Seq("source", "lang"), "left_semi")
        val merged = current.join(dl, Seq("source", "lang"), "full_outer")
          .select(col("source"), col("lang"),
            (coalesce(col("docs"), lit(0L)) + coalesce(col("d_docs"), lit(0L))).as("docs"),
            (coalesce(col("tokens"), lit(0L)) + coalesce(col("d_tokens"), lit(0L))).as("tokens"),
            (coalesce(col("chars"), lit(0L)) + coalesce(col("d_chars"), lit(0L))).as("chars"))
          .filter(col("docs") > 0)
        TableWriter.replaceEquality(view, touched, Seq("source", "lang"),
          merged, Map(AppliedSeqProp -> hi.getLong(0).toString))
      }
    } finally { fresh.unpersist(); () }
  }

  /** REST-transactional sync: [[applyChanges]]'s merge staged onto `tx`
    * as ONE retract-and-replace snapshot carrying the watermark, committed
    * atomically with the transaction's other staged tables. Returns false
    * when nothing is fresh. */
  def stageChanges(tx: graft.spark.TableWriter.RestTransaction,
                   catalog: graft.catalog.RestCatalog,
                   viewIdent: Seq[String], changes: DataFrame,
                   s: SparkSession): Boolean = {
    val view = TableWriter.restTableOf(catalog.loadTable(viewIdent))
    val applied = view.properties.get(AppliedSeqProp).flatMap(_.toLongOption)
      .getOrElse(Long.MinValue)
    val fresh = changes.filter(col("_commit_sequence") > applied).persist()
    try {
      val hi = fresh.agg(max(col("_commit_sequence"))).collect()(0)
      if (hi.isNullAt(0)) false
      else {
        val dl = deltas(fresh)
        val touched = dl.select("source", "lang")
        val current = view.newScan().toDF(s)
          .join(touched, Seq("source", "lang"), "left_semi")
        val merged = current.join(dl, Seq("source", "lang"), "full_outer")
          .select(col("source"), col("lang"),
            (coalesce(col("docs"), lit(0L)) + coalesce(col("d_docs"), lit(0L))).as("docs"),
            (coalesce(col("tokens"), lit(0L)) + coalesce(col("d_tokens"), lit(0L))).as("tokens"),
            (coalesce(col("chars"), lit(0L)) + coalesce(col("d_chars"), lit(0L))).as("chars"))
          .filter(col("docs") > 0)
        tx.stageReplaceEquality(viewIdent, touched, Seq("source", "lang"),
          merged, Map(AppliedSeqProp -> hi.getLong(0).toString))
        true
      }
    } finally { fresh.unpersist(); () }
  }

  /** Batch catch-up: fold every commit after `afterSnapshotId` (None =
    * full history) in one delta window. */
  def syncFromChangelog(spark: SparkSession, docs: IcebergTable,
                        view: IcebergTable,
                        afterSnapshotId: Option[Long]): IcebergTable =
    applyChanges(view, Changelog.changelogDF(spark, docs, afterSnapshotId), spark)

  /** Continuous maintenance off the `read-changes` stream, one fold per
    * micro-batch; offsets checkpoint per snapshot window and
    * [[applyChanges]] is idempotent on re-delivery. */
  def maintain(spark: SparkSession, docsLocation: String,
               viewLocation: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("icegopher")
      .option("read-changes", "true")
      .load(docsLocation)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyChanges(IcebergTables.load(viewLocation), batch, spark)
        ()
      }
      .start()

  // ---------------------------------------------------------------- battery

  /** mv01 fixture: documents driven through the d08 commit shapes —
    * create (doc_id % 2 = 0), append (the rest), CoW update (% 5 gets
    * " v2"), delete (% 7) — with the view FULL-built at commit 1 and
    * incrementally synced over commits 2-4's changelog. */
  private def mv01Fixture(s: SparkSession, d: String): IcebergTable = {
    val root =
      s"${IcebergOps.cacheRoot}/${d.replaceAll("[^A-Za-z0-9]", "_")}/mv01"
    val docsLoc = s"$root/docs"
    val viewLoc = s"$root/view"
    IcebergOps.provisionOnce(new java.io.File(root)) {
      val src = Tables.documents(s, d)
        .select("doc_id", "source", "lang", "text")
      val t1 = TableWriter.create(src.filter(col("doc_id") % 2 === 0), docsLoc)
      val c1 = t1.currentSnapshot.get.snapshotId
      val v0 = build(t1.newScan().toDF(s), viewLoc)
      val t2 = TableWriter.append(t1, src.filter(col("doc_id") % 2 === 1))
      val t3 = TableWriter.updateWhere(t2, s, col("doc_id") % 5 === 0,
        Map("text" -> concat(col("text"), lit(" v2"))))
      val t4 = TableWriter.deleteWhere(t3, s, col("doc_id") % 7 === 0)
      syncFromChangelog(s, t4, v0, Some(c1))
      ()
    }
    IcebergTables.load(viewLoc)
  }

  /** Battery entry mv01: read the INCREMENTALLY-maintained token-budget
    * view. The oracle re-aggregates the equivalent final corpus state
    * from the raw parquet, so a hash match proves
    * view-after-changefeed ≡ from-scratch over the final corpus. */
  def mv01IncrementalAgg(s: SparkSession, d: String): DataFrame =
    mv01Fixture(s, d).newScan().toDF(s)
      .select("source", "lang", "docs", "tokens", "chars")
      .orderBy("source", "lang")

  val mv01Sql: String =
    """SELECT source, lang, COUNT(*) AS docs,
              CAST(SUM(LEN(regexp_extract_all(text, '\S+'))) AS BIGINT) AS tokens,
              CAST(SUM(LEN(text)) AS BIGINT) AS chars
       FROM (SELECT source, lang,
                    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
             FROM documents WHERE doc_id % 7 <> 0)
       GROUP BY source, lang ORDER BY source, lang"""
}
