package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spark.{IcebergTable, IcebergTables, TableWriter}
import graft.streaming.Changelog
import graft.tables.Tables

/** Incrementally-maintained MinHash/LSH dedup index.
  *
  * A production pretraining pipeline ingests a delta every few hours; it
  * cannot afford to re-hash a 100 TB corpus to refresh its near-dup index.
  * This module maintains the index — the same `(doc_id, band, key)` triples
  * [[Dedup.minhashPairs]] computes in one shot — from the table's
  * changefeed instead:
  *
  *   - **added docs** hash + insert (an append of their triples),
  *   - **deleted docs** retract (a metadata-sized equality tombstone on
  *     `doc_id` — no scan, no `isin`, no index rewrite),
  *   - **only changed docs ever re-hash**: an update retracts the old
  *     triples and inserts freshly-hashed ones for that doc alone.
  *
  * The index itself is a Graft Iceberg table, maintained with the same
  * [[TableWriter]] commit machinery the engine exposes to users — each
  * maintenance batch is one equality-delete commit plus one append commit,
  * both O(changed docs), regardless of corpus size. Applying a batch is
  * content-idempotent: retract-then-insert of the batch's net effect lands
  * the same index state if a micro-batch is re-delivered.
  *
  * Reference scope note: the reference (a metadata-plane client) has no
  * analog; this is engine-native functionality the LLM-pipeline brief
  * requires. CDC provenance semantics ride
  * [[graft.streaming.Changelog.changelogDF]] (batch) and the
  * `read-changes` micro-batch stream (streaming) — both already
  * exactly-once over snapshot sequence windows.
  */
object DedupIndex {

  /** Hash-family + banding parameters. Defaults match the library default
    * of [[Dedup.minhashPairs]] (xxhash64 family — the cheap scale path). */
  final case class Params(
      shingleN: Int = 2, k: Int = 16, bands: Int = 8,
      shingleHash: Column => Column = xxhash64(_),
      mix: (Column, Int) => Column = (h, i) => xxhash64(h, lit(i)),
      bandKey: Seq[Column] => Column = cs => xxhash64(cs: _*))

  /** d01's oracle-mirrorable md5/XOR family — what the battery checks. */
  val OracleParams: Params = Params(
    shingleN = 1,
    shingleHash = Dedup.md5Hash60,
    mix = (h, i) => h.bitwiseXOR(lit(Dedup.minhashSeeds(i))),
    bandKey = cs => Dedup.md5Hash64(concat_ws(",", cs: _*)))

  /** The index rows of a doc batch: (doc_id, band, key) triples. */
  def rows(docs: DataFrame, p: Params): DataFrame =
    Dedup.bandedKeys(docs.select("doc_id", "text"), p.shingleN, p.k, p.bands,
      p.shingleHash, p.mix, p.bandKey)

  /** Full build — the bootstrap (and the spec's ground truth). */
  def build(docs: DataFrame, location: String, p: Params): IcebergTable =
    TableWriter.create(rows(docs, p), location)

  /** Net effect of a changelog window, one row per touched doc —
    * [[ChangefeedFold.netEffect]] keyed on `doc_id`. */
  private[queries] def netEffect(changes: DataFrame): DataFrame =
    ChangefeedFold.netEffect(changes, "doc_id")

  /** Apply one changelog window (batch or micro-batch) to the index:
    * ONE equality-delete commit retracting every touched doc's triples +
    * ONE append commit with the net-inserted docs' fresh triples
    * ([[ChangefeedFold.applyChanges]]). Both commits are O(changed docs);
    * unchanged corpus files and unchanged index files are never read or
    * rewritten. */
  def applyChanges(index: IcebergTable, changes: DataFrame,
                   p: Params): IcebergTable =
    ChangefeedFold.applyChanges(index, changes, "doc_id", ins => rows(ins, p))

  /** Batch catch-up: apply every commit after `afterSnapshotId` (None =
    * the full history) in one net-effect window. */
  def syncFromChangelog(spark: SparkSession, docs: IcebergTable,
                        index: IcebergTable, afterSnapshotId: Option[Long],
                        p: Params): IcebergTable =
    applyChanges(index,
      Changelog.changelogDF(spark, docs, afterSnapshotId), p)

  /** REST-transactional sync: [[applyChanges]]'s fold staged onto `tx` as
    * ONE retract-and-replace snapshot, committed atomically with the
    * transaction's other staged tables. Returns false when the window
    * nets to nothing. */
  def stageChanges(tx: graft.spark.TableWriter.RestTransaction,
                   indexIdent: Seq[String], changes: DataFrame,
                   p: Params): Boolean =
    ChangefeedFold.stageChanges(tx, indexIdent, changes, "doc_id",
      ins => rows(ins, p))

  /** Continuous maintenance: consume the table's `read-changes` stream and
    * fold each micro-batch into the index. Offsets checkpoint per snapshot
    * sequence window and [[applyChanges]] is content-idempotent, so a
    * restarted query re-delivering its in-flight batch converges to the
    * same index state. */
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

  private val d08CandidatesSlot = new CacheSlot

  /** Near-dup pairs served FROM the maintained index (no corpus re-hash):
    * the LSH chain reads the index table; only the post-LSH candidate set
    * re-shingles, against `docs`. */
  def pairs(spark: SparkSession, index: IcebergTable, docs: DataFrame,
            p: Params, bucketCap: Int, topK: Int): DataFrame =
    Dedup.pairsFromKeyed(index.newScan().toDF(spark), docs,
      p.shingleN, bucketCap, topK, d08CandidatesSlot.apply)

  // ---------------------------------------------------------------- battery

  /** d08 fixture: a documents table driven through every changefeed shape —
    * create (half the docs), append (the rest), MoR-style update (text
    * rewrite on doc_id % 5), positional MoR delete (doc_id % 7) — with the
    * index FULL-built at commit 1 and incrementally synced over commits
    * 2-4's changelog. Cached per sfDir like the ice* fixtures. */
  private def d08Fixture(s: SparkSession, d: String)
      : (IcebergTable, IcebergTable) = {
    val root =
      s"${IcebergOps.cacheRoot}/${d.replaceAll("[^A-Za-z0-9]", "_")}/d08"
    val docsLoc = s"$root/docs"
    val idxLoc = s"$root/index"
    IcebergOps.provisionOnce(new java.io.File(root)) {
      val src = Tables.documents(s, d).select("doc_id", "text")
      val t1 = TableWriter.create(src.filter(col("doc_id") % 2 === 0), docsLoc)
      val c1 = t1.currentSnapshot.get.snapshotId
      // bootstrap: full build of the index over commit 1's state, read
      // back THROUGH the table (what a real pipeline indexes)
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

  /** Battery entry d08: d01's near-dup sweep, but served from the
    * INCREMENTALLY-maintained index over the [[d08Fixture]] commit
    * sequence. The oracle runs d01's SQL over the equivalent final state
    * of the raw parquet, so a hash match proves
    * index-after-changefeed ≡ from-scratch over the final corpus. */
  def d08IncrementalIndex(s: SparkSession, d: String): DataFrame = {
    val (docs, idx) = d08Fixture(s, d)
    pairs(s, idx, docs.newScan().toDF(s), OracleParams,
      bucketCap = 200, topK = 50)
  }

  val d08Sql: String = Dedup.minhashLshSqlOver(
    """SELECT doc_id,
              CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
       FROM documents WHERE doc_id % 7 <> 0""")
}
