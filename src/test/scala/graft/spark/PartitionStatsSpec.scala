package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Partition statistics files (spec "Partition Statistics"): the compute
  * procedure rolls manifests up to one row per partition tuple in the
  * spec's parquet schema (field ids 1-12, `partition` = unified tuple
  * struct), registers the file under `partition-statistics`, and the
  * registry is queryable as the `partition_statistics` metadata table. */
class PartitionStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("compute, register, read back; delete files counted per partition") {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("pstats_t").toFile.getPath
    var t = TableWriter.create(
      (1L to 100L).map(i => (i, s"k${i % 4}", s"v$i")).toDF("id", "k", "v"),
      loc, partitionBy = Seq("k" -> graft.core.IdentityTransform))
    // V3 → the delete lands as DVs referencing data files, so the rollup
    // attributes the tombstones to the REFERENCED file's partition
    t = TableWriter.upgradeFormatVersion(t, s, 3)
    t = TableWriter.deleteWhere(t, s, col("id") === 8L || col("id") === 16L)

    val (t2, partitions) = TableWriter.computePartitionStats(t, s)
    assert(partitions == 4)
    val reg = t2.metadata.partitionStatisticsFiles
    assert(reg.size == 1 &&
      reg.head.snapshotId == t2.currentSnapshot.get.snapshotId)

    // the FILE is spec-schema parquet: read it back directly
    val stats = s.read.parquet(reg.head.path)
    assert(stats.columns.toSeq == Seq("partition", "spec_id",
      "data_record_count", "data_file_count",
      "total_data_file_size_in_bytes", "position_delete_record_count",
      "position_delete_file_count", "equality_delete_record_count",
      "equality_delete_file_count", "total_record_count", "last_updated_at",
      "last_updated_snapshot_id"))
    val byPart = stats.collect().map(r =>
      r.getStruct(0).getString(0) -> (r.getLong(2), r.getLong(5),
        if (r.isNullAt(9)) None else Some(r.getLong(9)))).toMap
    // 25 rows per k; ids 8 and 16 live in k0 (8%4=0, 16%4=0) → the DV
    // tombstones attribute to k0 via their referenced data file
    assert(byPart("k0")._1 == 25L, byPart)
    assert(byPart("k0")._2 == 2L, byPart)
    // partitions with no deletes get an exact total_record_count; the
    // deleted one reads null (unknown without applying tombstones)
    assert(byPart("k0")._3.isEmpty, byPart("k0"))
    assert(byPart("k1") == ((25L, 0L, Some(25L))), byPart("k1"))

    // metadata-table registry surface
    val wh = Files.createTempDirectory("pstats_wh").toFile.getPath
    // (path-based check instead: the registry parses from a reload)
    val reloaded = IcebergTables.load(loc)
    assert(reloaded.metadata.partitionStatisticsFiles == reg)

    // a later commit PRESERVES the registration; re-running REPLACES the
    // entry for the new snapshot and keeps the old one
    val t3 = TableWriter.append(t2, Seq((101L, "k1", "x")).toDF("id", "k", "v"))
    assert(t3.metadata.partitionStatisticsFiles == reg)
    val (t4, _) = TableWriter.computePartitionStats(t3, s)
    val entries = t4.metadata.partitionStatisticsFiles
    assert(entries.size == 2 &&
      entries.exists(_.snapshotId == t4.currentSnapshot.get.snapshotId))
    val snd = s.read.parquet(entries.maxBy(_.snapshotId).path)
    val k1 = snd.collect().find(_.getStruct(0).getString(0) == "k1").get
    assert(k1.getLong(2) == 26L) // the appended row landed in k1
  }

  test("registry feeds planning: pruned MoR scan reports LIVE row count") {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("pstats_cbo").toFile.getPath
    var t = TableWriter.create(
      (1L to 100L).map(i => (i, s"k${i % 4}", s"v$i")).toDF("id", "k", "v"),
      loc, partitionBy = Seq("k" -> graft.core.IdentityTransform))
    t = TableWriter.upgradeFormatVersion(t, s, 3)
    // gut partition k1: delete 20 of its 25 rows (MoR — recordCount in the
    // manifests still says 25)
    t = TableWriter.deleteWhere(t, s,
      col("k") === "k1" && col("id") <= 80L)

    def scanStats(withFilter: Boolean)
        : org.apache.spark.sql.connector.read.Statistics = {
      var df = s.read.format("icegopher").load(loc)
      if (withFilter) df = df.filter(col("k") === "k1")
      val scan = df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r.scan
      }.get
      scan.asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics].estimateStatistics()
    }

    // without a registry: the CBO sees the dead rows (manifests only)
    assert(scanStats(withFilter = true).numRows().getAsLong == 25L)

    val (t2, _) = TableWriter.computePartitionStats(t, s)
    assert(t2.metadata.partitionStatisticsFiles
      .exists(_.snapshotId == t2.currentSnapshot.get.snapshotId))

    // with the registry: the pruned scan reports its LIVE size and bytes
    // scale with it — the broadcast decision flips on real data volume
    val pruned = scanStats(withFilter = true)
    assert(pruned.numRows().getAsLong == 5L, pruned.numRows())
    val full = scanStats(withFilter = false)
    assert(full.numRows().getAsLong == 80L, full.numRows())
    assert(pruned.sizeInBytes().getAsLong < full.sizeInBytes().getAsLong / 3)

    // FILE-pruned plans must NOT subtract whole-partition deletes: prune
    // to a subset of k1's files (id filter on a second appended file) —
    // subtracting k1's 20 deletes from one file's rows would collapse a
    // real scan to zero rows and flip broadcasts wrongly
    val t2b = TableWriter.append(t2,
      (200L to 250L).map(i => (i, "k1", s"v$i")).toDF("id", "k", "v"))
    val (t2c, _) = TableWriter.computePartitionStats(t2b, s)
    assert(t2c.metadata.partitionStatisticsFiles
      .exists(_.snapshotId == t2c.currentSnapshot.get.snapshotId))
    val filePruned = {
      val df = s.read.format("icegopher").load(loc)
        .filter(col("k") === "k1" && col("id") >= 200L)
      val scan = df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r.scan
      }.get
      scan.asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics].estimateStatistics()
    }
    // only the 51-row appended file survives pruning; k1's partition-wide
    // 20 deletes must not apply to it
    assert(filePruned.numRows().getAsLong == 51L, filePruned.numRows())
    // the whole-partition plan still subtracts: 25 + 51 - 20 = 56
    assert(scanStats(withFilter = true).numRows().getAsLong == 56L)

    // a LATER commit makes the registry stale for the new snapshot —
    // planning must fall back to manifest counts, never trust stale stats
    val t3 = TableWriter.append(t2c, Seq((101L, "k1", "x")).toDF("id", "k", "v"))
    assert(t3.currentSnapshot.get.snapshotId !=
      t2c.currentSnapshot.get.snapshotId)
    assert(scanStats(withFilter = true).numRows().getAsLong == 77L)
  }

  test("typed partition tuples: days(ts) + identity decimal") {
    val s = spark
    val loc = Files.createTempDirectory("pstats_typed").toFile.getPath
    // date partitions decode from manifests as Integer epoch-days and
    // decimals as unscaled big-endian bytes — the stats rows must carry
    // the EXTERNAL types the spec schema declares (Date, BigDecimal), and
    // byte-typed values must group by content, not array identity
    val df = s.range(1, 41).selectExpr(
      "id",
      "timestamp_seconds(86400 * (id % 3) + 1700000000) as ts",
      "cast(cast(id % 2 as decimal(10,2)) + 0.25 as decimal(10,2)) as d")
    val t = TableWriter.create(df, loc, partitionBy =
      Seq("ts" -> graft.core.DayTransform, "d" -> graft.core.IdentityTransform))
    val (t2, parts) = TableWriter.computePartitionStats(t, s)
    assert(parts == 6, s"expected 3 days x 2 decimals, got $parts")
    val stats = s.read.parquet(t2.metadata.partitionStatisticsFiles.head.path)
    val pt = stats.schema("partition").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(pt.fields(0).dataType == org.apache.spark.sql.types.DateType, pt)
    assert(pt.fields(1).dataType ==
      org.apache.spark.sql.types.DecimalType(10, 2), pt)
    assert(stats.selectExpr("sum(data_record_count)")
      .collect()(0).getLong(0) == 40L)
    val tuples = stats.select("partition.*").collect()
    assert(tuples.forall(r => r.get(0).isInstanceOf[java.sql.Date]), tuples.toSeq)
    assert(tuples.map(_.getDecimal(1)).distinct.length == 2, tuples.toSeq)
  }

  test("SQL surface: CALL compute_partition_stats + registry table") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("pstats_sqlwh").toFile.getPath
    s.conf.set("spark.sql.catalog.gps", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gps.warehouse", wh)
    TableWriter.create(
      (1L to 40L).map(i => (i, s"p${i % 2}")).toDF("id", "p"),
      s"$wh/db/t", partitionBy = Seq("p" -> graft.core.IdentityTransform))
    val out = s.sql("CALL gps.system.compute_partition_stats('db.t')").collect()(0)
    assert(out.getInt(1) == 2, out)
    val rows = s.sql("SELECT * FROM gps.db.t.partition_statistics").collect()
    assert(rows.length == 1 && rows(0).getString(1) == out.getString(0))
    // file content via plain SQL over the registered path
    val n = s.read.parquet(out.getString(0))
      .selectExpr("sum(data_record_count)").collect()(0).getLong(0)
    assert(n == 40L)
  }
}
