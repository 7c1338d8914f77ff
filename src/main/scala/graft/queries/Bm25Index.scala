package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spark.{IcebergTable, IcebergTables, TableWriter}
import graft.streaming.Changelog
import graft.tables.Tables

/** Persistent, incrementally-maintained BM25 search index — the d08/ann07
  * maintenance pattern applied to full-text retrieval: a lakehouse table
  * of documents gets a SEARCHABLE inverted index that follows its
  * changefeed instead of re-tokenizing the corpus per refresh.
  *
  * The entire model is ONE postings table `(doc_id, w, tf)` with terms as
  * 60-bit hashes: document length is Σ tf per doc, corpus size and total
  * length are one aggregate, and per-term document frequency is a count —
  * every BM25 statistic derives from the postings at serve time, so ONE
  * maintained table keeps the whole index consistent (no df/doclen
  * side-tables to drift out of sync with the postings under concurrent
  * maintenance).
  *
  * Maintenance is [[ChangefeedFold]] on `doc_id`:
  *   - **added docs** tokenize + append their posting rows,
  *   - **deleted docs** retract via a metadata-sized equality tombstone,
  *   - **only changed docs re-tokenize** — an update retracts the old
  *     postings and appends fresh ones for that doc alone.
  * Each batch is one equality-delete commit + one append commit, both
  * O(changed docs) regardless of corpus size, content-idempotent on
  * re-delivery.
  *
  * Reference scope note: the reference (a metadata-plane client) has no
  * analog; this is engine-native functionality the LLM-pipeline brief
  * requires (corpus exploration / retrieval eval sets over the curated
  * table).
  */
object Bm25Index {

  /** Term-key hash. Default: xxhash64 (the cheap scale path); the battery
    * pins the md5-derived 60-bit key both engines compute identically.
    * `name` is the stable identity persisted on the index table so later
    * maintenance can refuse a mismatched family (see [[HashFamilyProp]]). */
  final case class Params(termHash: Column => Column = xxhash64(_),
                          name: String = "xxhash64")

  val OracleParams: Params = Params(termHash = Dedup.md5Hash60, name = "md5-60")

  /** Table property recording which term-hash family built the postings.
    * Maintaining an index with a DIFFERENT family would silently append
    * postings in a disjoint hash space (every lookup and df count would be
    * wrong for the new rows), so [[applyChanges]] validates it loudly. */
  val HashFamilyProp = "graft.bm25.term-hash"

  private def requireFamily(index: IcebergTable, p: Params): Unit =
    index.properties.get(HashFamilyProp).foreach { built =>
      require(built == p.name,
        s"BM25 index at ${index.location} was built with term-hash family " +
          s"'$built' but maintenance was invoked with '${p.name}' — " +
          "appending postings in a different hash space would corrupt the " +
          "index. Pass the matching family (or rebuild the index).")
    }

  /** Posting rows of a doc batch: (doc_id, w, tf) with hashed terms. */
  def rows(docs: DataFrame, p: Params): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w0"))
      .filter(length(col("w0")) > 0)
      .select(col("doc_id"), p.termHash(col("w0")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))

  /** Full build — the bootstrap (and the spec's ground truth). Stamps the
    * term-hash family on the table so maintenance can validate it. */
  def build(docs: DataFrame, location: String, p: Params): IcebergTable =
    TableWriter.create(rows(docs, p), location,
      properties = Map(HashFamilyProp -> p.name))

  /** Apply one changelog window: retract every touched doc's postings,
    * append fresh rows for the net inserts — O(changed docs). Refuses a
    * term-hash family different from the one [[build]] stamped. */
  def applyChanges(index: IcebergTable, changes: DataFrame,
                   p: Params): IcebergTable = {
    requireFamily(index, p)
    ChangefeedFold.applyChanges(index, changes, "doc_id", ins => rows(ins, p))
  }

  /** Batch catch-up over every commit after `afterSnapshotId`. */
  def syncFromChangelog(spark: SparkSession, docs: IcebergTable,
                        index: IcebergTable, afterSnapshotId: Option[Long],
                        p: Params): IcebergTable =
    applyChanges(index,
      Changelog.changelogDF(spark, docs, afterSnapshotId), p)

  /** REST-transactional sync: stage one changelog window's fold onto `tx`
    * (one retract-and-replace snapshot on the index) so it commits
    * atomically WITH whatever else the transaction stages — e.g. the
    * source-table append that produced the window. Family-validated like
    * [[applyChanges]]. Returns false when the window nets to nothing. */
  def stageChanges(tx: TableWriter.RestTransaction,
                   catalog: graft.catalog.RestCatalog,
                   indexIdent: Seq[String], changes: DataFrame,
                   p: Params): Boolean = {
    requireFamily(TableWriter.restTableOf(catalog.loadTable(indexIdent)), p)
    ChangefeedFold.stageChanges(tx, indexIdent, changes, "doc_id",
      ins => rows(ins, p))
  }

  /** Continuous maintenance off the `read-changes` stream; restart-safe
    * because [[applyChanges]] is content-idempotent per window. */
  def maintain(spark: SparkSession, docsLocation: String,
               indexLocation: String, checkpoint: String,
               p: Params = Params())
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("icegopher")
      .option("read-changes", "true")
      .load(docsLocation)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyChanges(IcebergTables.load(indexLocation), batch, p)
        ()
      }
      .start()

  /** BM25 top-k served FROM the maintained postings (no corpus
    * re-tokenize): queries hash their terms into the index's key space
    * and ride [[Retrieval.bm25FromTf]] unchanged. */
  def topK(spark: SparkSession, index: IcebergTable,
           queryTerms: Seq[(Int, Seq[String])], p: Params,
           k: Int): DataFrame = {
    import spark.implicits._
    val q = queryTerms.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("qid", "t")
      .select(col("qid"), p.termHash(col("t")).as("term"))
    Retrieval.bm25FromTf(index.newScan().toDF(spark), q, k)
      .orderBy("qid", "rank")
  }

  // ---------------------------------------------------------------- battery

  /** t28 fixture: the d08 commit-sequence shape (create half / append the
    * rest / MoR-style update on doc_id % 5 / delete doc_id % 7) with the
    * index FULL-built at commit 1 and synced over commits 2-4. */
  private def t28Fixture(s: SparkSession, d: String)
      : (IcebergTable, IcebergTable) = {
    val root =
      s"${IcebergOps.cacheRoot}/${d.replaceAll("[^A-Za-z0-9]", "_")}/t28"
    val docsLoc = s"$root/docs"
    val idxLoc = s"$root/index"
    IcebergOps.provisionOnce(new java.io.File(root)) {
      val src = Tables.documents(s, d).select("doc_id", "text")
      val t1 = TableWriter.create(src.filter(col("doc_id") % 2 === 0), docsLoc)
      val c1 = t1.currentSnapshot.get.snapshotId
      val idx0 = build(t1.newScan().toDF(s), idxLoc, OracleParams)
      val t2 = TableWriter.append(t1, src.filter(col("doc_id") % 2 === 1))
      val t3 = TableWriter.updateWhere(t2, s, col("doc_id") % 5 === 0,
        Map("text" -> concat(col("text"), lit(" v2"))))
      val t4 = TableWriter.deleteWhere(t3, s, col("doc_id") % 7 === 0)
      syncFromChangelog(s, t4, idx0, Some(c1), OracleParams)
      ()
    }
    (IcebergTables.load(docsLoc), IcebergTables.load(idxLoc))
  }

  /** Battery entry t28: t22's BM25 queries served from the
    * INCREMENTALLY-maintained postings over the fixture's commit
    * sequence. The oracle runs the hashed BM25 SQL over the equivalent
    * final corpus state, so a hash match proves
    * index-after-changefeed ≡ from-scratch postings over the final
    * corpus — tf changes from the update and retractions from the
    * delete included. */
  def t28IncrementalBm25(s: SparkSession, d: String): DataFrame = {
    val (_, idx) = t28Fixture(s, d)
    topK(s, idx, Retrieval.QueryTerms, OracleParams, k = 10)
  }

  val t28Sql: String =
    s"""WITH ${Retrieval.bm25CtesOver(
      """(SELECT doc_id,
                CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
         FROM documents WHERE doc_id % 7 <> 0)""",
      hashTerms = true)}
       SELECT qid, doc_id, rank FROM bmr WHERE rank <= 10
       ORDER BY qid, rank"""

  /** t33 fixture: the corpus lands in THREE ingest windows (doc_id % 3),
    * each committed as ONE REST transaction that stages BOTH the docs
    * append and the index fold ([[stageChanges]]) — the lockstep
    * discipline a production pipeline needs so corpus and index never
    * drift (a reader at any commit sees postings exactly matching the
    * docs). Runs against a live in-process REST server; the final
    * metadata is materialized to disk so later battery runs read the
    * provisioned tables offline. */
  private def t33Fixture(s: SparkSession, d: String): IcebergTable = {
    val root =
      s"${IcebergOps.cacheRoot}/${d.replaceAll("[^A-Za-z0-9]", "_")}/t33"
    val docsLoc = s"$root/docs"
    val idxLoc = s"$root/index"
    IcebergOps.provisionOnce(new java.io.File(root)) {
      val server = new graft.catalog.TestRestCatalogServer("graft", "graft")
      server.start()
      try {
        val cat = graft.catalog.Catalog.load("t33", server.uri,
          Map(graft.catalog.RestCatalog.KeyCredential -> "graft:graft"))
          .asInstanceOf[graft.catalog.RestCatalog]
        import graft.core._
        cat.createNamespace(Seq("p"))
        cat.createTable(Seq("p", "docs"), Schema(0, StructT(Seq(
          NestedField(1, "doc_id", LongT, required = true),
          NestedField(2, "text", StringT)))), location = Some(docsLoc))
        cat.createTable(Seq("p", "idx"), Schema(0, StructT(Seq(
          NestedField(1, "doc_id", LongT, required = true),
          NestedField(2, "w", LongT, required = true),
          NestedField(3, "tf", LongT, required = true)))),
          Map(HashFamilyProp -> OracleParams.name), location = Some(idxLoc))
        val src = Tables.documents(s, d).select("doc_id", "text")
        (0 until 3).foreach { w =>
          val batch = src.filter(col("doc_id") % 3 === w)
          val dataDir = new java.io.File(docsLoc, s"data/w$w")
          batch.write.mode("overwrite").parquet(dataDir.getPath)
          val outs = dataDir.listFiles()
            .filter(f => f.getName.endsWith(".parquet") &&
              !f.getName.startsWith("."))
            .sortBy(_.getName)
            .map(f => graft.spark.CowFileOut(f.getPath, 0L, Map.empty)).toSeq
          val tx = TableWriter.transaction(cat).stageAppend(Seq("p", "docs"), outs)
          stageChanges(tx, cat, Seq("p", "idx"),
            batch.withColumn("_change_type", lit("insert"))
              .withColumn("_commit_sequence", lit(w.toLong)), OracleParams)
          tx.commit()
        }
        // materialize the committed metadata so IcebergTables.load serves
        // the provisioned tables without the (ephemeral) server
        Seq((Seq("p", "docs"), docsLoc), (Seq("p", "idx"), idxLoc)).foreach {
          case (id, loc) =>
            val metaDir = new java.io.File(loc, "metadata"); metaDir.mkdirs()
            java.nio.file.Files.writeString(
              new java.io.File(metaDir, "v1.metadata.json").toPath,
              cat.loadTable(id).metadata.toJson)
        }
      } finally server.stop()
    }
    IcebergTables.load(idxLoc)
  }

  /** Battery entry t33: t22's BM25 queries served from postings that were
    * maintained EXCLUSIVELY through atomic REST transactions (source
    * append + index fold per window). The oracle is the from-scratch
    * hashed BM25 over the full corpus, so a hash match proves the
    * transactionally-synced index ≡ from-scratch postings. */
  def t33TxSyncedBm25(s: SparkSession, d: String): DataFrame = {
    val idx = t33Fixture(s, d)
    topK(s, idx, Retrieval.QueryTerms, OracleParams, k = 10)
  }

  val t33Sql: String =
    s"""WITH ${Retrieval.bm25CtesOver("documents", hashTerms = true)}
       SELECT qid, doc_id, rank FROM bmr WHERE rank <= 10
       ORDER BY qid, rank"""
}
