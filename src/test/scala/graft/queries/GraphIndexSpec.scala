package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.{IcebergTables, SparkTestSession, TableWriter}
import graft.tables.Tables

/** The maintained neighbor graph (ann20's machinery): incremental sync ≡
  * from-scratch rebuild against the frozen centers, and the sync's write
  * amplification is O(affected cells), never O(corpus). */
class GraphIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import GraphAnn.GraphParams
  private val p = GraphIndex.MaintainedParams

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toFile.getPath

  private def edgeSet(t: graft.spark.IcebergTable): Set[(Long, Long)] =
    t.newScan().toDF(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Equality-delete record count of the table's CURRENT retract commit
    * chain since `afterSnapshot` — the observed write amplification. */
  private def retractedSince(loc: String, afterSnapshot: Long): Long = {
    val t = IcebergTables.load(loc)
    t.metadata.snapshots
      .dropWhile(_.snapshotId != afterSnapshot).drop(1)
      .flatMap { s =>
        graft.core.ManifestIO.readManifestList(t.io.open(s.manifestList))
          .filter(m => m.content == 1 && m.addedSnapshotId == s.snapshotId)
          .flatMap(m =>
            graft.core.ManifestIO.readManifestEntries(t.io.open(m.path), m))
      }.map(_.dataFile.recordCount).sum
  }

  test("incremental sync lands the from-scratch state; writes stay local") {
    val src = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val corpusLoc = tmp("gix_corpus")
    val centsLoc = tmp("gix_cents")
    val assignLoc = tmp("gix_assign")
    val graphLoc = tmp("gix_graph")

    // bootstrap on the even half
    var corpus = TableWriter.create(src.filter(col("vec_id") % 2 === 0), corpusLoc)
    val c1 = corpus.currentSnapshot.get.snapshotId
    val (centsT, assignT0, graphT0) = GraphIndex.build(
      corpus.newScan().toDF(spark), centsLoc, assignLoc, graphLoc, p)
    val cents = centsT.newScan().toDF(spark)

    // the ann07 commit sequence: append odds, negate %5, delete %7
    corpus = TableWriter.append(corpus, src.filter(col("vec_id") % 2 === 1))
    corpus = TableWriter.updateWhere(corpus, spark, col("vec_id") % 5 === 0,
      Map("embedding" -> transform(col("embedding"), x => negate(x))))
    corpus = TableWriter.deleteWhere(corpus, spark, col("vec_id") % 7 === 0)
    val (assignT, graphT) = GraphIndex.syncFromChangelog(
      spark, corpus, assignT0, graphT0, cents, Some(c1), p)

    // ≡ from-scratch against the SAME frozen centers
    val finalEn = GraphAnn.withNorm(
      Similarity.pqEmb(corpus.newScan().toDF(spark)))
    val asgScratch = GraphAnn.graphAssign(finalEn, cents, p.probes)
    val gScratch = GraphAnn.graphEdges(finalEn, asgScratch, p.degree)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgeSet(graphT) == gScratch)
    val asgGot = assignT.newScan().toDF(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val asgWant = asgScratch.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(asgGot == asgWant)

    // ---- locality: one further SMALL change, observed write bound ----
    val beforeGraphSnap = graphT.currentSnapshot.get.snapshotId
    val preAsg = assignT.newScan().toDF(spark)
    corpus = TableWriter.updateWhere(corpus, spark, col("vec_id") === 12,
      Map("embedding" -> transform(col("embedding"), x => x * lit(0.5f))))
    val syncFrom = corpus.metadata.snapshots.reverse.drop(1).head.snapshotId
    val (assignT2, graphT2) = GraphIndex.syncFromChangelog(
      spark, corpus, assignT, graphT, cents, Some(syncFrom), p)

    // expected affected srcs: members of the cells vec 12 left or entered
    val newEn = GraphAnn.withNorm(
      Similarity.pqEmb(corpus.newScan().toDF(spark)))
    val postAsg = GraphAnn.graphAssign(newEn, cents, p.probes)
    val touchedCells = preAsg.filter(col("vec_id") === 12).select("cid")
      .union(postAsg.filter(col("vec_id") === 12).select("cid"))
      .collect().map(_.getLong(0)).toSet
    val expectedSrcs = postAsg
      .filter(col("cid").isin(touchedCells.toSeq: _*))
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet + 12L

    val retracted = retractedSince(graphLoc, beforeGraphSnap)
    val corpusN = corpus.newScan().toDF(spark).count()
    assert(retracted == expectedSrcs.size.toLong,
      s"retracted $retracted != affected ${expectedSrcs.size}")
    assert(retracted < corpusN,
      s"retract set $retracted must stay below corpus $corpusN")

    // and the small sync STILL lands the from-scratch state
    val gScratch2 = GraphAnn.graphEdges(newEn,
        GraphAnn.graphAssign(newEn, cents, p.probes), p.degree)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgeSet(graphT2) == gScratch2)
    assert(assignT2.newScan().toDF(spark).count() ==
      postAsg.count())
  }
}
