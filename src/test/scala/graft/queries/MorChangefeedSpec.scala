package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.{IcebergTables, SparkTestSession}

/** The atomic merge-on-read DML commit (tombstones + appended rows in ONE
  * snapshot) must flow through the changefeed exactly like the two-commit
  * shapes the incremental consumers were built on: an ANN index synced
  * over SQL MERGE/DELETE churn equals a from-scratch encode of the final
  * corpus against the frozen codebook. */
class MorChangefeedSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("graft_morcf_wh").toFile.getPath

  private lazy val spark: SparkSession = {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.catalog.gmor", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gmor.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gmor.db")
    s
  }

  private def vec(id: Long, scale: Float = 1f): Array[Float] =
    Array.tabulate(64)(i => scale * ((((id * 31 + i * 7) % 13).toFloat - 6f) +
      ((id * 1009 + i * 131) % 997).toFloat / 997f))

  test("ANN index synced over MoR SQL DML equals from-scratch") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE gmor.db.corpus (vec_id BIGINT, embedding ARRAY<FLOAT>)
         TBLPROPERTIES ('write.merge.mode' = 'merge-on-read',
                        'write.delete.mode' = 'merge-on-read')""")
    (0L until 20L).map(id => (id, vec(id))).toDF("vec_id", "embedding")
      .createOrReplaceTempView("mor_corpus_seed")
    spark.sql("INSERT INTO gmor.db.corpus SELECT * FROM mor_corpus_seed")
    val loc = s"$warehouse/db/corpus"
    val t1 = IcebergTables.load(loc)
    val c1 = t1.currentSnapshot.get.snapshotId
    val cbLoc = Files.createTempDirectory("morcf_cb").toFile.getPath
    val cdLoc = Files.createTempDirectory("morcf_codes").toFile.getPath
    val (cbT, codes0) = AnnIndex.build(
      Similarity.pqEmb(t1.newScan().toDF(spark)), cbLoc, cdLoc)

    // churn THROUGH SQL DML on the merge-on-read path: the MERGE re-homes
    // 4 vectors and inserts 5; the delta DELETE retracts vec_id % 7 = 3
    ((0L until 20L by 5L).map(id => (id, vec(id, 3f))) ++
      (20L until 25L).map(id => (id, vec(id))))
      .toDF("vec_id", "embedding").createOrReplaceTempView("mor_corpus_chg")
    spark.sql(
      """MERGE INTO gmor.db.corpus t USING mor_corpus_chg c
         ON t.vec_id = c.vec_id
         WHEN MATCHED THEN UPDATE SET t.embedding = c.embedding
         WHEN NOT MATCHED THEN INSERT *""")
    spark.sql("DELETE FROM gmor.db.corpus WHERE vec_id % 7 = 3")

    val t2 = IcebergTables.load(loc)
    val cb = cbT.newScan().toDF(spark)
    val synced = AnnIndex.syncFromChangelog(spark, t2, codes0, cb, Some(c1))
    def codesOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val fresh = codesOf(Similarity.pqEncode(
      Similarity.pqEmb(t2.newScan().toDF(spark)), cb, 8))
    assert(codesOf(synced.newScan().toDF(spark)) == fresh)
    // vec_id % 7 = 3 deletes 3, 10, 17, and the just-inserted 24
    assert(!fresh.exists(_._1 == 3L) && !fresh.exists(_._1 == 24L),
      "deleted vectors must be retracted")
    assert(fresh.exists(_._1 == 21L), "inserted vector must be indexed")
    // the updated vector's codes reflect the NEW embedding
    assert(fresh.count(_._1 == 5L) == 8)
  }

  test("batch changelog reports MoR MERGE as genuine inserts + deletes") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE gmor.db.cl (id BIGINT, v DOUBLE)
         TBLPROPERTIES ('write.merge.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO gmor.db.cl VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    val loc = s"$warehouse/db/cl"
    val c1 = IcebergTables.load(loc).currentSnapshot.get.snapshotId
    Seq((2L, 20.0), (4L, 4.0)).toDF("id", "v")
      .createOrReplaceTempView("cl_chg")
    spark.sql(
      """MERGE INTO gmor.db.cl t USING cl_chg c ON t.id = c.id
         WHEN MATCHED THEN UPDATE SET t.v = c.v
         WHEN NOT MATCHED THEN INSERT *""")
    val changes = graft.streaming.Changelog.changelogDF(spark,
      IcebergTables.load(loc), Some(c1)).collect()
      .map(r => (r.getString(2), r.getLong(0), r.getDouble(1))).toSet
    // the update surfaces as delete(old)+insert(new); the insert as insert;
    // untouched rows never appear (no carryovers in a tombstone commit)
    assert(changes == Set(
      ("delete", 2L, 2.0), ("insert", 2L, 20.0), ("insert", 4L, 4.0)),
      changes.toString)
  }
}
