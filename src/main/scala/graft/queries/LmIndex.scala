package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spark.{IcebergTable, IcebergTables, TableWriter}
import graft.streaming.Changelog
import graft.tables.Tables

/** Incrementally-maintained bigram language model — the [[MatView]]
  * delta discipline applied to [[Training.lmCrossEntropy]]'s quality
  * filter: the LM's ONE table, `(w1, w2, cnt)` bigram counts over the
  * TARGET slice, follows the corpus table's changefeed instead of being
  * re-counted per refresh. Prefix counts and the prefix vocabulary derive
  * from the count table at serve time (`Σ_w2 cnt` / `count distinct w1`),
  * so there are no side-tables to drift.
  *
  * Why additive deltas and not [[ChangefeedFold]]'s retract-per-key: the
  * count table is keyed by BIGRAM, not by document — a changed doc
  * touches many bigrams and each bigram aggregates many docs. So the
  * window folds to per-bigram SIGNED deltas (insert rows +1, delete rows
  * −1; a CoW pair nets the difference) and merges them into the touched
  * rows in ONE atomic [[TableWriter.replaceEquality]] commit carrying
  * the exactly-once watermark — O(touched bigrams) per window,
  * regardless of corpus or vocabulary size. Counts are integers, so the
  * maintained table is EXACTLY a from-scratch count (hash-comparable),
  * and a bigram whose count reaches zero disappears.
  *
  * This completes the maintained-model family: dedup index (d08), PQ /
  * IVF-PQ ANN (ann07/ann09), aggregate view (mv01), BM25 postings (t28),
  * and now the quality-filter LM — every model the engine trains follows
  * the corpus incrementally. */
object LmIndex {

  /** Bigram counts of a docs batch's target slice. */
  def aggregate(docs: DataFrame, target: Column): DataFrame =
    Training.bigrams(docs, target)
      .filter(col("is_t"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))

  /** Bootstrap: full count into a new table. */
  def build(docs: DataFrame, target: Column, location: String): IcebergTable =
    TableWriter.create(aggregate(docs, target), location)

  /** Exactly-once watermark property (the [[MatView.AppliedSeqProp]]
    * discipline — additive merge is not content-idempotent). */
  val AppliedSeqProp = "graft.lm.applied-sequence"

  /** Per-bigram signed deltas of a changelog window's target slice. */
  private[queries] def deltas(changes: DataFrame, target: Column): DataFrame = {
    val sgn = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    Training.bigrams(changes.withColumn("__sgn", sgn), target, Seq("__sgn"))
      .filter(col("is_t"))
      .groupBy("w1", "w2").agg(sum(col("__sgn")).as("d_cnt"))
      .filter(col("d_cnt") =!= 0)
  }

  /** Fold one changelog window into the count table in ONE atomic
    * commit: equality-delete the touched bigram keys, append their
    * merged counts, advance the watermark. */
  def applyChanges(table: IcebergTable, changes: DataFrame, target: Column,
                   s: SparkSession): IcebergTable = {
    val applied = table.properties.get(AppliedSeqProp).flatMap(_.toLongOption)
      .getOrElse(Long.MinValue)
    val fresh = changes.filter(col("_commit_sequence") > applied).persist()
    // the delta aggregation (tokenize + hash + bigram explode over every
    // changed doc) feeds THREE consumers (tombstone keys, the semi-join
    // read-back, the merge) — persist it so each window pays it once
    val dl = deltas(fresh, target).persist()
    try {
      val hi = fresh.agg(max(col("_commit_sequence"))).collect()(0)
      if (hi.isNullAt(0)) table
      else {
        val touched = dl.select("w1", "w2")
        val current = table.newScan().toDF(s)
          .join(touched, Seq("w1", "w2"), "left_semi")
        val merged = current.join(dl, Seq("w1", "w2"), "full_outer")
          .select(col("w1"), col("w2"),
            (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
              .as("cnt"))
          .filter(col("cnt") > 0)
        TableWriter.replaceEquality(table, touched, Seq("w1", "w2"),
          merged, Map(AppliedSeqProp -> hi.getLong(0).toString))
      }
    } finally { dl.unpersist(); fresh.unpersist(); () }
  }

  /** REST-transactional sync: the same additive-delta merge as
    * [[applyChanges]], staged onto `tx` as ONE retract-and-replace
    * snapshot carrying the exactly-once watermark — committed atomically
    * with whatever else the transaction stages (e.g. the source append
    * that produced the window). Returns false when nothing is fresh. */
  def stageChanges(tx: graft.spark.TableWriter.RestTransaction,
                   catalog: graft.catalog.RestCatalog,
                   indexIdent: Seq[String], changes: DataFrame,
                   target: Column, s: SparkSession): Boolean = {
    val table = TableWriter.restTableOf(catalog.loadTable(indexIdent))
    val applied = table.properties.get(AppliedSeqProp).flatMap(_.toLongOption)
      .getOrElse(Long.MinValue)
    val fresh = changes.filter(col("_commit_sequence") > applied).persist()
    val dl = deltas(fresh, target).persist()
    try {
      val hi = fresh.agg(max(col("_commit_sequence"))).collect()(0)
      if (hi.isNullAt(0)) false
      else {
        val touched = dl.select("w1", "w2")
        val current = table.newScan().toDF(s)
          .join(touched, Seq("w1", "w2"), "left_semi")
        val merged = current.join(dl, Seq("w1", "w2"), "full_outer")
          .select(col("w1"), col("w2"),
            (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
              .as("cnt"))
          .filter(col("cnt") > 0)
        tx.stageReplaceEquality(indexIdent, touched, Seq("w1", "w2"), merged,
          Map(AppliedSeqProp -> hi.getLong(0).toString))
        true
      }
    } finally { dl.unpersist(); fresh.unpersist(); () }
  }

  /** Batch catch-up over every commit after `afterSnapshotId`. */
  def syncFromChangelog(spark: SparkSession, docs: IcebergTable,
                        table: IcebergTable, target: Column,
                        afterSnapshotId: Option[Long]): IcebergTable =
    applyChanges(table, Changelog.changelogDF(spark, docs, afterSnapshotId),
      target, spark)

  /** Continuous maintenance off the `read-changes` stream; the watermark
    * makes re-delivered windows no-ops. */
  def maintain(spark: SparkSession, docsLocation: String,
               tableLocation: String, checkpoint: String, target: Column)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("icegopher")
      .option("read-changes", "true")
      .load(docsLocation)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyChanges(IcebergTables.load(tableLocation), batch, target, spark)
        ()
      }
      .start()

  /** Cross-entropy scoring served FROM the maintained counts. */
  def score(spark: SparkSession, table: IcebergTable, docs: DataFrame,
            topK: Int): DataFrame =
    Training.lmScoreAgainst(table.newScan().toDF(spark),
      Training.bigrams(docs, lit(true)), topK)

  // ---------------------------------------------------------------- battery

  /** t31 fixture: the d08/t28 commit-sequence shape, with the LM counts
    * FULL-built over commit 1's lang='en' slice and incrementally synced
    * over commits 2-4. */
  private def t31Fixture(s: SparkSession, d: String)
      : (IcebergTable, IcebergTable) = {
    val root =
      s"${IcebergOps.cacheRoot}/${d.replaceAll("[^A-Za-z0-9]", "_")}/t31"
    val docsLoc = s"$root/docs"
    val lmLoc = s"$root/lm"
    IcebergOps.provisionOnce(new java.io.File(root)) {
      val src = Tables.documents(s, d).select("doc_id", "lang", "text")
      val t1 = TableWriter.create(src.filter(col("doc_id") % 2 === 0), docsLoc)
      val c1 = t1.currentSnapshot.get.snapshotId
      val lm0 = build(t1.newScan().toDF(s), col("lang") === "en", lmLoc)
      val t2 = TableWriter.append(t1, src.filter(col("doc_id") % 2 === 1))
      val t3 = TableWriter.updateWhere(t2, s, col("doc_id") % 5 === 0,
        Map("text" -> concat(col("text"), lit(" v2"))))
      val t4 = TableWriter.deleteWhere(t3, s, col("doc_id") % 7 === 0)
      syncFromChangelog(s, t4, lm0, col("lang") === "en", Some(c1))
      ()
    }
    (IcebergTables.load(docsLoc), IcebergTables.load(lmLoc))
  }

  /** Battery entry t31: t26's cross-entropy ranking of the fixture's
    * FINAL corpus, served from the INCREMENTALLY-maintained counts. The
    * oracle trains from scratch on the equivalent final state, so a
    * hash match proves counts-after-changefeed ≡ from-scratch — update
    * deltas and delete retractions included. */
  def t31IncrementalLm(s: SparkSession, d: String): DataFrame = {
    val (docs, lm) = t31Fixture(s, d)
    score(s, lm, docs.newScan().toDF(s), topK = 25)
  }

  val t31Sql: String = Training.lmSqlOver(
    """(SELECT doc_id, lang,
              CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
       FROM documents WHERE doc_id % 7 <> 0)""")
}
