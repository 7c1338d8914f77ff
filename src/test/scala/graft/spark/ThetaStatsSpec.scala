package graft.spark

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Theta-sketch NDV → Spark CBO: preserved `statistics` entries (the
  * Puffin files foreign engines write) are decoded into per-column
  * distinct-count estimates and reported through
  * `SupportsReportStatistics.columnStats`, so join-cardinality estimation
  * under `spark.sql.cbo.enabled` plans from sketches another engine
  * already paid to compute. */
class ThetaStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("theta sketch codec: empty / single / exact / estimation modes") {
    assert(ThetaSketch.estimate(ThetaSketch.compactSketchBytes(Nil)) == 0.0)
    assert(ThetaSketch.estimate(
      ThetaSketch.compactSketchBytes(Seq(42L))) == 1.0)
    assert(ThetaSketch.estimate(
      ThetaSketch.compactSketchBytes((1L to 500L).map(_ * 7919))) == 500.0)
    // estimation mode: 500 retained under theta = MAX/2 → estimate 1000
    val est = ThetaSketch.estimate(ThetaSketch.compactSketchBytes(
      (1L to 500L).map(_ * 7919), theta = Some(Long.MaxValue / 2)))
    assert(math.abs(est - 1000.0) < 1.0, est)
  }

  test("serialized sketches stamp the default-seed seedHash (bytes 6-7)") {
    // DataSketches readers validate the preamble seedHash against their
    // update seed (default 9001) and REJECT a zero/mismatched hash — a
    // blob without it is unreadable by Trino/Iceberg-Java
    val expect = ThetaSketch.seedHash(9001L)
    assert(expect != 0)
    for (bytes <- Seq(
        ThetaSketch.compactSketchBytes(Nil),
        ThetaSketch.compactSketchBytes(Seq(42L)),
        ThetaSketch.compactSketchBytes((1L to 50L).map(_ * 7919)),
        ThetaSketch.compactSketchBytes((1L to 50L).map(_ * 7919),
          theta = Some(Long.MaxValue / 2)))) {
      val got = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort(6)
      assert(got == expect, s"seedHash $got != $expect")
    }
  }

  /** Create a table, write a real Puffin statistics file (one sketch for
    * field 2), and splice a `statistics` entry naming both columns: field
    * 1 with a pre-derived `ndv` property, field 2 sketch-only. */
  private def tableWithStats(rows: Seq[(Long, String)], ndvProp: Long,
                             sketchNdv: Int): String = {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("theta_stats").toFile.getPath
    val t = TableWriter.create(rows.toDF("id", "v").coalesce(1), loc)
    val snapId = t.currentSnapshot.get.snapshotId

    val puffin = new File(loc, "metadata/stats.puffin")
    val blob = ThetaSketch.compactSketchBytes((1 to sketchNdv).map(_ * 7919L))
    Puffin.write(puffin.getPath, Seq((blob, Puffin.BlobMetadata(
      TableStatistics.ThetaBlobType, Seq(2), snapId, 1L, 0L, 0L))))

    val mdFile = new File(s"$loc/metadata")
      .listFiles().filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    val json = new String(java.nio.file.Files.readAllBytes(mdFile.toPath))
    val stats =
      s""""statistics":[{"snapshot-id":$snapId,"statistics-path":"${puffin.getPath}",
         |"file-size-in-bytes":${puffin.length()},"file-footer-size-in-bytes":5,
         |"blob-metadata":[
         |{"type":"${TableStatistics.ThetaBlobType}","snapshot-id":$snapId,
         | "sequence-number":1,"fields":[1],"properties":{"ndv":"$ndvProp"}},
         |{"type":"${TableStatistics.ThetaBlobType}","snapshot-id":$snapId,
         | "sequence-number":1,"fields":[2]}]}],""".stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(mdFile.toPath,
      json.replaceFirst("\\{", "{" + stats))
    loc
  }

  test("NDV resolution: ndv property (zero I/O) and sketch decode") {
    val loc = tableWithStats((1L to 100L).map(i => (i, s"v$i")), 7777L, 250)
    val t = IcebergTables.load(loc)
    val ndv = TableStatistics.ndv(t)
    assert(ndv == Map(1 -> 7777L, 2 -> 250L), ndv)
  }

  test("compute_table_stats writes a statistics file this engine reads back") {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("theta_write").toFile.getPath
    // 5000 rows, id unique, bucket has 17 distinct values — exercises the
    // KMV estimation path (id, NDV > 2·k) and the exact path (bucket)
    val t = TableWriter.create((1L to 5000L).map(i => (i, s"b${i % 17}"))
      .toDF("id", "bucket").repartition(3), loc)
    val (t2, analyzed) = TableWriter.computeTableStats(t, s)
    assert(analyzed == 2)

    val ndv = TableStatistics.ndv(t2)
    assert(ndv(2) == 17L, ndv)
    assert(math.abs(ndv(1) - 5000L) < 500, ndv) // KMV estimate within 10%

    // the sketch blob itself (not just the property) decodes to the same
    // estimate — what a foreign reader without the property would get
    val sf = t2.metadata.statisticsFiles.head
    val (metas, _) = Puffin.readFooter(sf.path)
    val idBlob = metas.find(_.fields == Seq(1)).get
    val est = ThetaSketch.estimate(
      Puffin.readBlob(sf.path, idBlob.offset, idBlob.length))
    assert(math.abs(est - ndv(1)) < 1.0, est)

    // a later append leaves the stats registered (stale-but-present, like
    // every engine) and re-running replaces the entry for the new snapshot
    val t3 = TableWriter.append(t2, Seq((9001L, "b1")).toDF("id", "bucket"))
    assert(t3.metadata.statisticsFiles.nonEmpty)
    val (t4, _) = TableWriter.computeTableStats(t3, s, Seq("bucket"))
    val entries = t4.metadata.statisticsFiles
    assert(entries.exists(_.snapshotId == t4.currentSnapshot.get.snapshotId))
    assert(TableStatistics.ndv(t4)(2) == 17L)

    // the CARRIED entry (t2's snapshot) survives verbatim: its
    // file-size-in-bytes still matches the Puffin file on disk — a foreign
    // reader seeks the footer from that length, so zeroing it would
    // corrupt a previously valid entry
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val carried = {
      val arr = mapper.readTree(t4.metadata.statisticsJson.get)
      (0 until arr.size).map(arr.get)
        .find(_.get("snapshot-id").asLong() == sf.snapshotId).get
    }
    assert(carried.get("file-size-in-bytes").asLong() ==
      new File(sf.path).length(), carried.toString)
  }

  test("scan reports distinctCount; CBO join estimate flips broadcast") {
    val s = spark
    val n = 2000
    val rows = (1L to n.toLong).map(i => (i, "payload-" * 6 + i))
    // high-NDV stats: join key nearly unique → join output ~ n rows
    val hiLoc = tableWithStats(rows, n.toLong, 10)
    // low-NDV stats: 2 distinct keys claimed → join output ~ n²/2 rows
    val loLoc = tableWithStats(rows, 2L, 10)

    // the scan's reported column stats reach the logical plan
    val hi = s.read.format("icegopher").load(hiLoc)
    val planStats = hi.queryExecution.optimizedPlan.stats
    val idStat = planStats.attributeStats.find(_._1.name == "id").map(_._2)
    assert(idStat.exists(_.distinctCount.exists(_.toLong == n.toLong)),
      planStats.attributeStats)

    // a probe table too big to broadcast ITSELF (high-entropy payload
    // defeats parquet compression), so the only size decision left is the
    // CBO estimate of the inner-join subtree
    val sImp = s
    import sImp.implicits._
    val probeLoc = Files.createTempDirectory("theta_probe").toFile.getPath
    TableWriter.create((1L to 100000L).map(i =>
        (i, java.lang.Long.toHexString(i * 2654435761L) * 8))
      .toDF("id", "v3").repartition(4), probeLoc)

    val cboBefore = s.conf.get("spark.sql.cbo.enabled", "false")
    val thrBefore = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", (1024 * 1024).toString)
      def joinPlan(loc: String): String = {
        val a = s.read.format("icegopher").load(loc)
        val b = s.read.format("icegopher").load(loc)
          .withColumnRenamed("v", "v2")
        val joined = a.join(b, "id")
        // the OUTER probe forces a size decision on the inner-join subtree
        val probe = s.read.format("icegopher").load(probeLoc)
        joined.join(probe, "id").queryExecution.executedPlan.toString
      }
      val hiPlan = joinPlan(hiLoc)
      val loPlan = joinPlan(loLoc)
      // near-unique keys → inner-join estimate ~n rows → it broadcasts
      // into the probe join; 2 claimed distinct keys → the estimate
      // explodes to ~n²/2 rows → the subtree must sort-merge instead
      assert(!hiPlan.contains("SortMergeJoin"), hiPlan)
      assert(hiPlan.contains("BroadcastHashJoin"), hiPlan)
      assert(loPlan.contains("SortMergeJoin"), loPlan)
    } finally {
      s.conf.set("spark.sql.cbo.enabled", cboBefore)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", thrBefore)
    }
  }
}
