package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.{IcebergTables, SparkTestSession, TableWriter}

/** ANN index drift telemetry + rebuild: after churn against the frozen
  * quantizers, `stats` must report quantization error ABOVE the bootstrap
  * baseline (drift_ratio > 1); `rebuild` re-trains from the current
  * corpus, restores the error to the fresh-build level, and the rebuilt
  * index serves the same top-k as a from-scratch session build. */
class AnnDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val P = AnnIndex.Params()

  // genuinely distinct per id (no small period): a lattice term plus an
  // id-spread fraction, so sampled quantizers can't fit the corpus exactly
  private def vec(id: Long, scale: Float = 1f): Array[Float] =
    Array.tabulate(64)(i => scale * ((((id * 31 + i * 7) % 13).toFloat - 6f) +
      ((id * 1009 + i * 131) % 997).toFloat / 997f))

  private def embDF(ids: Seq[Long], scale: Float = 1f) = {
    val s = spark
    import s.implicits._
    ids.map(id => (id, vec(id, scale))).toDF("vec_id", "embedding")
  }

  test("churn raises quant error vs bootstrap; rebuild restores it") {
    val loc = Files.createTempDirectory("drift_corpus").toFile.getPath
    val cbLoc = Files.createTempDirectory("drift_cb").toFile.getPath
    val cdLoc = Files.createTempDirectory("drift_codes").toFile.getPath
    val t1 = TableWriter.create(embDF(0L until 40L), loc)
    val c1 = t1.currentSnapshot.get.snapshotId
    val (cbT, codes0) = AnnIndex.build(
      Similarity.pqEmb(t1.newScan().toDF(spark)), cbLoc, cdLoc, P)
    val cb = cbT.newScan().toDF(spark)

    // baseline stamped at bootstrap; fresh index has drift_ratio == 1
    val s0 = AnnIndex.stats(spark, codes0, cb, t1.newScan().toDF(spark), P)
    assert(s0.bootstrapErr.isDefined && s0.bootstrapErr.get > 0)
    assert(s0.driftRatio.exists(r => math.abs(r - 1.0) < 1e-9), s0.toString)

    // churn: new vectors from a DIFFERENT distribution (scaled 3x) — the
    // frozen codewords fit them badly
    val t2 = TableWriter.append(t1, embDF(40L until 80L, scale = 3f))
    val synced = AnnIndex.syncFromChangelog(spark, t2,
      IcebergTables.load(cdLoc), cb, Some(c1), P)
    val s1 = AnnIndex.stats(spark, synced, cb, t2.newScan().toDF(spark), P)
    assert(s1.driftRatio.exists(_ > 1.5),
      s"churn from a shifted distribution must show drift: $s1")

    // rebuild: re-sample codebook + re-encode from the CURRENT corpus
    val after = AnnIndex.rebuild(spark, t2.newScan().toDF(spark), cbLoc, cdLoc, P)
    assert(after.quantErr < s1.quantErr,
      s"rebuild must reduce error: ${after.quantErr} !< ${s1.quantErr}")
    val s2 = AnnIndex.stats(spark, IcebergTables.load(cdLoc),
      IcebergTables.load(cbLoc).newScan().toDF(spark),
      t2.newScan().toDF(spark), P)
    assert(s2.driftRatio.exists(r => math.abs(r - 1.0) < 1e-9),
      s"baseline must be refreshed: $s2")

    // the rebuilt index serves exactly what a from-scratch session build
    // over the same corpus serves
    val corpus = Similarity.pqEmb(t2.newScan().toDF(spark))
    val queries = corpus.filter(col("vec_id") < 5)
    val served = AnnIndex.topK(spark, IcebergTables.load(cdLoc),
      IcebergTables.load(cbLoc).newScan().toDF(spark), corpus, queries,
      P, k = 3, shortlist = 20).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val scratch = {
      val cbS = Similarity.pqCodebook(corpus, P.nSub, P.kSub)
      Similarity.pqTopK(corpus, Similarity.pqEncode(corpus, cbS, P.nSub),
        cbS, queries, P.nSub, 3, 20).collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    }
    assert(served == scratch)
  }

  test("ivf stats report cell skew and drift; rebuildIvf restores the baseline") {
    val loc = Files.createTempDirectory("driftv_corpus").toFile.getPath
    val ceLoc = Files.createTempDirectory("driftv_cents").toFile.getPath
    val cbLoc = Files.createTempDirectory("driftv_cb").toFile.getPath
    val cdLoc = Files.createTempDirectory("driftv_codes").toFile.getPath
    val t1 = TableWriter.create(embDF(0L until 40L), loc)
    val c1 = t1.currentSnapshot.get.snapshotId
    val (ceT, cbT, codes0) =
      AnnIndex.buildIvf(t1.newScan().toDF(spark), ceLoc, cbLoc, cdLoc)
    val s0 = AnnIndex.statsIvf(spark, codes0, ceT.newScan().toDF(spark),
      cbT.newScan().toDF(spark), t1.newScan().toDF(spark))
    assert(s0.driftRatio.exists(r => math.abs(r - 1.0) < 1e-9), s0.toString)
    assert(s0.maxCellShare.exists(sh => sh >= 1.0 / 16 && sh <= 1.0), s0.toString)

    val t2 = TableWriter.append(t1, embDF(40L until 80L, scale = 3f))
    val synced = AnnIndex.syncIvfFromChangelog(spark, t2,
      IcebergTables.load(cdLoc), ceT.newScan().toDF(spark),
      cbT.newScan().toDF(spark), Some(c1))
    val s1 = AnnIndex.statsIvf(spark, synced, ceT.newScan().toDF(spark),
      cbT.newScan().toDF(spark), t2.newScan().toDF(spark))
    assert(s1.driftRatio.exists(_ > 1.2),
      s"shifted-distribution churn must show residual drift: $s1")

    val after = AnnIndex.rebuildIvf(spark, t2.newScan().toDF(spark),
      ceLoc, cbLoc, cdLoc)
    assert(after.quantErr < s1.quantErr)
    val s2 = AnnIndex.statsIvf(spark, IcebergTables.load(cdLoc),
      IcebergTables.load(ceLoc).newScan().toDF(spark),
      IcebergTables.load(cbLoc).newScan().toDF(spark),
      t2.newScan().toDF(spark))
    assert(s2.driftRatio.exists(r => math.abs(r - 1.0) < 1e-9), s2.toString)
  }

  test("recall probe: sampled recall@k vs exact, through library and CALL") {
    val warehouse = Files.createTempDirectory("recall_wh").toFile.getPath
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.catalog.grec", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.grec.warehouse", warehouse)
    val corpusLoc = s"$warehouse/db/corpus"
    TableWriter.create(embDF(0L until 60L), corpusLoc)
    AnnIndex.buildFromCorpus(IcebergTables.load(corpusLoc).newScan().toDF(s),
      s"$warehouse/db/cb", s"$warehouse/db/codes", P)

    val r = AnnIndex.recallProbe(s, IcebergTables.load(s"$warehouse/db/codes"),
      IcebergTables.load(s"$warehouse/db/cb").newScan().toDF(s),
      IcebergTables.load(corpusLoc).newScan().toDF(s), P,
      k = 5, shortlist = 59, nQueries = 8)
    assert(r.queries == 8 && r.k == 5 && r.shortlist == 59)
    assert(r.exactPairs == 8L * 5)
    // shortlist covering the whole corpus → the exact re-rank IS exact
    assert(r.recall == 1.0, r.toString)

    // a tight shortlist can only do worse or equal — and stays a rate
    val tight = AnnIndex.recallProbe(s,
      IcebergTables.load(s"$warehouse/db/codes"),
      IcebergTables.load(s"$warehouse/db/cb").newScan().toDF(s),
      IcebergTables.load(corpusLoc).newScan().toDF(s), P,
      k = 5, shortlist = 6, nQueries = 8)
    assert(tight.recall <= 1.0 && tight.recall >= 0.0)
    assert(tight.hitPairs <= r.hitPairs)

    // the SQL surface reports the same shape
    val row = s.sql("CALL grec.system.ann_recall_probe('db.corpus', " +
      "'db.cb', 'db.codes', k => 5, shortlist => 59, n_queries => 8)")
      .collect()(0)
    assert(row.getLong(0) == 8L && row.getInt(1) == 5)
    assert(row.getDouble(5) == 1.0, row.toString)

    // IVF flavor: probing EVERY cell with a full shortlist is exhaustive
    // → recall 1.0; nProbe=1 can only lose recall, never exceed it
    AnnIndex.buildIvf(IcebergTables.load(corpusLoc).newScan().toDF(s),
      s"$warehouse/db/ce", s"$warehouse/db/icb", s"$warehouse/db/icodes")
    val ivfFull = s.sql("CALL grec.system.ann_ivf_recall_probe(" +
      "'db.corpus', 'db.ce', 'db.icb', 'db.icodes', " +
      "n_probe => 16, k => 5, shortlist => 59, n_queries => 8)").collect()(0)
    assert(ivfFull.getDouble(5) == 1.0, ivfFull.toString)
    val ivfTight = s.sql("CALL grec.system.ann_ivf_recall_probe(" +
      "'db.corpus', 'db.ce', 'db.icb', 'db.icodes', " +
      "n_probe => 1, k => 5, shortlist => 59, n_queries => 8)").collect()(0)
    assert(ivfTight.getDouble(5) <= ivfFull.getDouble(5), ivfTight.toString)
  }

  test("stats + rebuild are reachable as SQL CALL procedures") {
    val warehouse = Files.createTempDirectory("drift_wh").toFile.getPath
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.catalog.gann", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gann.warehouse", warehouse)
    val corpusLoc = s"$warehouse/db/corpus"
    TableWriter.create(embDF(0L until 30L), corpusLoc)
    AnnIndex.buildFromCorpus(IcebergTables.load(corpusLoc).newScan().toDF(s),
      s"$warehouse/db/cb", s"$warehouse/db/codes", P)
    val row = s.sql(
      "CALL gann.system.ann_index_stats('db.corpus', 'db.cb', 'db.codes')")
      .collect()(0)
    assert(row.getLong(0) == 30L * P.nSub)
    assert(math.abs(row.getDouble(1) / row.getDouble(2) - 1.0) < 1e-9)
    val rb = s.sql(
      "CALL gann.system.rebuild_ann_index('db.corpus', 'db.cb', 'db.codes')")
      .collect()(0)
    assert(rb.getLong(0) == 30L * P.nSub)
    assert(!rb.isNullAt(3) && math.abs(rb.getDouble(3) - 1.0) < 1e-9)
  }
}
