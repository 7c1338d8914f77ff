package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.{IcebergTable, IcebergTables, SparkTestSession, TableWriter}

/** Join-view IVM (mv02): maintained ≡ from-scratch across mutations on
  * BOTH join sides, the double-count trap of the cross term, O(touched)
  * merge locality, and watermark idempotency. */
class JoinViewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(name: String): String =
    Files.createTempDirectory(name).toFile.getPath

  /** Tiny orders/lineitem pair: 4 customers × 2 orders, 3 items each. */
  private def fixture(tag: String): (IcebergTable, IcebergTable, IcebergTable) = {
    val oLoc = tmpDir(s"jv_${tag}_o")
    val lLoc = tmpDir(s"jv_${tag}_l")
    val vLoc = tmpDir(s"jv_${tag}_v")
    val orders = (1L to 8L).map(ok => (ok, ok % 4 + 1))
      .toDF("o_orderkey", "o_custkey")
    val items = for { ok <- 1L to 8L; ln <- 1 to 3 }
      yield (ok, ln, 10.0 * ln)
    val o1 = TableWriter.create(orders.coalesce(1), oLoc)
    val l1 = TableWriter.create(
      items.toDF("l_orderkey", "l_linenumber", "l_quantity").coalesce(1), lLoc)
    (o1, l1, JoinView.build(o1, l1, vLoc, spark))
  }

  private def fromScratch(o: IcebergTable, l: IcebergTable): Seq[Seq[Any]] =
    JoinView.aggregate(o.newScan().toDF(spark), l.newScan().toDF(spark))
      .orderBy("o_custkey").collect().map(_.toSeq).toSeq

  private def viewRows(v: IcebergTable): Seq[Seq[Any]] =
    v.newScan().toDF(spark).select("o_custkey", "items", "qty")
      .orderBy("o_custkey").collect().map(_.toSeq).toSeq

  test("maintained view equals from-scratch after changes to both sides") {
    val (o1, l1, v0) = fixture("both")
    // lineitem: append late items + CoW update; orders: delete a customer
    val l2 = TableWriter.append(l1,
      Seq((1L, 4, 7.0), (5L, 4, 9.0))
        .toDF("l_orderkey", "l_linenumber", "l_quantity").coalesce(1))
    val l3 = TableWriter.updateWhere(l2, spark, col("l_linenumber") === 2,
      Map("l_quantity" -> (col("l_quantity") + lit(100.0))))
    val o2 = TableWriter.deleteWhere(o1, spark, col("o_custkey") === 3)
    val v1 = JoinView.applyChanges(v0, o2, l3, spark)
    assert(viewRows(v1) == fromScratch(o2, l3))
    assert(viewRows(v1).nonEmpty)
  }

  test("cross term: order AND its lineitems deleted in one window") {
    val (o1, l1, v0) = fixture("cross")
    // the double-count trap: ΔO⋈L_new finds nothing (items gone from
    // L_new), O_old⋈ΔL subtracts exactly once
    val o2 = TableWriter.deleteWhere(o1, spark, col("o_orderkey") === 2)
    val l2 = TableWriter.deleteWhere(l1, spark, col("l_orderkey") === 2)
    val v1 = JoinView.applyChanges(v0, o2, l2, spark)
    assert(viewRows(v1) == fromScratch(o2, l2))
  }

  test("one-sided window: only lineitem moved") {
    val (o1, l1, v0) = fixture("oneside")
    val l2 = TableWriter.deleteWhere(l1, spark, col("l_orderkey") === 7)
    val v1 = JoinView.applyChanges(v0, o1, l2, spark)
    assert(viewRows(v1) == fromScratch(o1, l2))
  }

  test("merge is O(touched): eq-delete records == touched customers; no-op idempotent") {
    val (o1, l1, v0) = fixture("local")
    // one order of customer 2 loses an item: exactly ONE group touched
    val l2 = TableWriter.deleteWhere(l1, spark,
      col("l_orderkey") === 1 && col("l_linenumber") === 1)
    val v1 = JoinView.applyChanges(v0, o1, l2, spark)
    val snap = v1.currentSnapshot.get
    val delRecords = graft.core.ManifestIO
      .readManifestList(v1.io.open(snap.manifestList))
      .filter(m => m.content == 1 && m.addedSnapshotId == snap.snapshotId)
      .flatMap(m => graft.core.ManifestIO.readManifestEntries(
        v1.io.open(m.path), m))
      .map(_.dataFile.recordCount).sum
    assert(delRecords == 1L, s"retracted $delRecords keys, expected 1")
    assert(viewRows(v1) == fromScratch(o1, l2))
    // same heads again → no new snapshot
    val v2 = JoinView.applyChanges(v1, o1, l2, spark)
    assert(v2.currentSnapshot.get.snapshotId == snap.snapshotId)
  }

  test("a customer whose last items vanish drops out of the view") {
    val (o1, l1, v0) = fixture("drop")
    // customer 4 owns orders 3 and 7: delete all their items
    val l2 = TableWriter.deleteWhere(l1, spark,
      col("l_orderkey").isin(3L, 7L))
    val v1 = JoinView.applyChanges(v0, o1, l2, spark)
    assert(viewRows(v1).forall(_.head != 4L))
    assert(viewRows(v1) == fromScratch(o1, l2))
  }
}
