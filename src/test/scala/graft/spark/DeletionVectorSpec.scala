package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** V3 deletion vectors: Puffin container + roaring-bitmap blob codec, the
  * scan planner's DV matching, both read paths (core toDF and DSv2), and
  * the invariant that a DV delete is result-identical to the same delete
  * expressed as V2 positional-delete files. */
class DeletionVectorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmpDir(name: String): String =
    Files.createTempDirectory(name).toFile.getPath

  // ------------------------------------------------------------- codec

  test("DV blob round-trips positions, including >32-bit row indexes") {
    val positions = Seq(0L, 1L, 7L, 100000L, (1L << 33) + 5, (1L << 40))
    val blob = Puffin.dvBlobBytes(positions.iterator)
    val bm = Puffin.readDvBlob(blob)
    assert(positions.forall(bm.contains))
    assert(bm.getLongCardinality == positions.size)
    assert(!bm.contains(2L) && !bm.contains((1L << 33) + 4))
  }

  test("DV blob refuses corrupted CRC, bad magic, and bad length prefix") {
    val blob = Puffin.dvBlobBytes(Iterator(1L, 2L, 3L))
    val crcFlip = blob.clone(); crcFlip(crcFlip.length - 1) =
      (crcFlip(crcFlip.length - 1) ^ 0xFF).toByte
    val e1 = intercept[IllegalArgumentException](Puffin.readDvBlob(crcFlip))
    assert(e1.getMessage.contains("CRC"))
    val magicFlip = blob.clone(); magicFlip(4) = 0x00
    val e2 = intercept[IllegalArgumentException](Puffin.readDvBlob(magicFlip))
    assert(e2.getMessage.contains("magic"))
    val e3 = intercept[IllegalArgumentException](
      Puffin.readDvBlob(blob ++ Array[Byte](0)))
    assert(e3.getMessage.contains("length prefix"))
  }

  test("Puffin container round-trips blob index and file properties") {
    val path = s"${tmpDir("puffin")}/two-blobs.puffin"
    val b1 = Puffin.dvBlobBytes(Iterator(1L, 5L))
    val b2 = Puffin.dvBlobBytes(Iterator(2L, 6L, 9L))
    val metas = Puffin.write(path, Seq(
      (b1, Puffin.BlobMetadata(Puffin.DeletionVectorV1, Nil, 10L, 2L, 0, 0,
        Map("referenced-data-file" -> "/data/a.parquet", "cardinality" -> "2"))),
      (b2, Puffin.BlobMetadata(Puffin.DeletionVectorV1, Nil, 10L, 2L, 0, 0,
        Map("referenced-data-file" -> "/data/b.parquet", "cardinality" -> "3")))),
      fileProperties = Map("created-by" -> "graft"))
    assert(metas.map(_.offset) == Seq(4L, 4L + b1.length))
    val (blobs, props) = Puffin.readFooter(path)
    assert(blobs.size == 2 && props("created-by") == "graft")
    assert(blobs.map(_.blobType).toSet == Set(Puffin.DeletionVectorV1))
    assert(blobs.head.properties("referenced-data-file") == "/data/a.parquet")
    val back = Puffin.readDvBlob(
      Puffin.readBlob(path, blobs(1).offset, blobs(1).length))
    assert(back.contains(2L) && back.contains(9L) && back.getLongCardinality == 3)
  }

  // ------------------------------------------------------------- end-to-end

  test("DV delete ≡ positional-file delete on the same data, both read paths") {
    val src = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .repartition(4)
    val pred = col("o_orderkey") % 3 === 0

    val locV2 = tmpDir("dv_v2")
    val v2 = TableWriter.deleteWhere(TableWriter.create(src, locV2), spark, pred)
    val locV3 = tmpDir("dv_v3")
    val v3 = TableWriter.deleteWhereDv(TableWriter.create(src, locV3), spark, pred)

    assert(v3.metadata.formatVersion == 3)
    // the delete entries are PUFFIN DVs with full coordinates
    val tasks = v3.newScan().planFiles()
    val dvs = tasks.flatMap(_.deleteFiles).filter(_.isDeletionVector)
    assert(dvs.nonEmpty && dvs.forall(_.format == "PUFFIN"))
    assert(tasks.flatMap(_.deleteFiles).forall(_.isDeletionVector))

    def rows(t: IcebergTable): Seq[(Long, Long)] =
      t.newScan().toDF(spark).orderBy("o_orderkey")
        .select("o_orderkey", "o_custkey")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val v2Rows = rows(v2)
    assert(rows(v3) == v2Rows && v2Rows.nonEmpty)
    assert(v2Rows.forall(_._1 % 3 != 0))

    // DSv2 path (the SQL-catalog reader) applies the DV identically
    val dsv2 = spark.read.format("icegopher").load(locV3)
      .orderBy("o_orderkey").select("o_orderkey", "o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(dsv2 == v2Rows)
  }

  test("DV commit merges prior positional-file tombstones (V3 merge rule)") {
    val src = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val loc = tmpDir("dv_merge")
    val t1 = TableWriter.create(src, loc)
    val t2 = TableWriter.deleteWhere(t1, spark, col("c_nationkey") === 3)
    val t3 = TableWriter.deleteWhereDv(t2, spark, col("c_nationkey") === 7)

    val got = t3.newScan().toDF(spark).select("c_nationkey").distinct()
      .collect().map(_.getAs[Number](0).longValue).toSet
    assert(!got.contains(3L) && !got.contains(7L) && got.nonEmpty)
    // the planner never hands BOTH a DV and a positional file for one data
    // file (the spec's readers-must-ignore rule)
    t3.newScan().planFiles().foreach { t =>
      val hasDv = t.deleteFiles.exists(_.isDeletionVector)
      val hasPosFile = t.deleteFiles.exists(d =>
        d.content == DataFileContent.PositionDeletes && !d.isDeletionVector)
      assert(!(hasDv && hasPosFile),
        s"${t.file.path} got both a DV and a positional delete file")
    }
    // count equals the from-scratch equivalent
    val expect = src.filter(col("c_nationkey") =!= 3 && col("c_nationkey") =!= 7).count()
    assert(t3.newScan().toDF(spark).count() == expect)
  }

  test("V3 metadata stays V3 across subsequent commits; V2 tables stay V2") {
    val src = spark.read.parquet(s"$sf/region.parquet")
    val loc = tmpDir("dv_v3_sticky")
    val t1 = TableWriter.create(src, loc)
    assert(IcebergTables.load(loc).metadata.formatVersion == 2)
    val t2 = TableWriter.deleteWhereDv(t1, spark, col("r_regionkey") === 0)
    assert(t2.metadata.formatVersion == 3)
    val t3 = TableWriter.append(t2, src.filter(col("r_regionkey") === 0))
    assert(IcebergTables.load(loc).metadata.formatVersion == 3)
    // appended rows are NOT affected by the earlier DV (sequence rule):
    // region 0 re-appears exactly once
    val names = t3.newScan().toDF(spark).orderBy("r_regionkey", "r_name")
      .collect().map(_.getAs[Number](0).longValue).toSeq
    assert(names.count(_ == 0L) == 1 && names.size == src.count())
  }

  test("batch changelog over DV commits emits exactly the newly-dead rows") {
    val s = spark
    import s.implicits._
    val src = (0L until 40L).map(i => (i, i % 4)).toDF("id", "grp")
    val loc = tmpDir("dv_cdc")
    val t1 = TableWriter.create(src, loc)
    val t2 = TableWriter.deleteWhereDv(t1, spark, col("grp") === 1)
    val t3 = TableWriter.deleteWhereDv(t2, spark, col("grp") === 2)

    val all = graft.streaming.Changelog.changelogDF(spark, t3, None)
      .select("_change_type", "id", "_commit_sequence")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val dels = all.filter(_._1 == "delete")
    assert(dels.map(_._2).sorted.toSeq ==
      (0L until 40L).filter(i => i % 4 == 1 || i % 4 == 2).sorted)
    // the second DV commit reports ONLY grp 2 — the merged-in grp-1
    // positions were dead at its parent and must not resurface
    assert(dels.filter(_._3 == 3L).forall(_._2 % 4 == 2))
    assert(all.count(_._1 == "insert") == 40)

    // windowed: only the second commit
    val w = graft.streaming.Changelog.changelogDF(spark, t3,
      Some(t2.currentSnapshot.get.snapshotId))
      .select("_change_type", "id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(w.forall(_._1 == "delete") && w.map(_._2).sorted.toSeq ==
      (0L until 40L).filter(_ % 4 == 2).sorted)
  }

  test("streaming read-changes over a DV commit emits the killed rows once") {
    val s = spark
    import s.implicits._
    val loc = tmpDir("dv_stream")
    val t1 = TableWriter.create(
      (0L until 20L).map(i => (i, i % 5)).toDF("id", "grp"), loc)
    val ck = tmpDir("dv_stream_ck")
    val q = spark.readStream.format("icegopher")
      .option("read-changes", "true").load(loc)
      .writeStream.format("memory").queryName("dvcdc")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      assert(spark.table("dvcdc").count() == 20)
      TableWriter.deleteWhereDv(t1, spark, col("grp") === 0)
      q.processAllAvailable()
      val dels = spark.table("dvcdc").filter(col("_change_type") === "delete")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(dels == (0L until 20L).filter(_ % 5 == 0).sorted)
    } finally q.stop()
  }

  test("PUFFIN delete entry without DV coordinates fails at plan time, named") {
    val src = spark.read.parquet(s"$sf/region.parquet")
    val loc = tmpDir("dv_malformed")
    val t1 = TableWriter.deleteWhereDv(TableWriter.create(src, loc), spark,
      col("r_regionkey") === 1)
    // strip the coordinates from the DV manifest entry to simulate a
    // malformed writer
    val snap = t1.currentSnapshot.get
    val ms = ManifestIO.readManifestList(t1.io.open(snap.manifestList))
    val delM = ms.find(_.content == 1).get
    val entries = ManifestIO.readManifestEntries(t1.io.open(delM.path), delM)
      .map(e => e.copy(dataFile = e.dataFile.copy(
        referencedDataFile = None, contentOffset = None,
        contentSizeInBytes = None)))
    ManifestIO.writeManifest(new java.io.File(delM.path), entries, StructT(Nil))
    val err = intercept[UnsupportedOperationException] {
      IcebergTables.load(loc).newScan().planFiles()
    }
    assert(err.getMessage.contains("deletion-vector coordinates"))
  }
}
