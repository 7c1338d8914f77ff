package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** SupportsReportOrdering: a scan over a table whose files were all
  * written under the current sort order reports that order per partition,
  * so Spark drops redundant Sort nodes; any file outside the order (an
  * unsorted append) withdraws the claim. */
class ReportOrderingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(name: String): String =
    Files.createTempDirectory(name).toFile.getPath

  private def sortsIn(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case s: SortExec => s }.size

  test("sorted table reports per-partition ordering; Spark elides the Sort") {
    val loc = tmpDir("ord_sorted")
    val src = (0L until 10000L).map(i => (i, s"r$i")).toDF("id", "data")
    TableWriter.create(src, loc, sortBy = Seq("id"))
    val t = IcebergTables.load(loc)
    assert(!t.sortOrder.isUnsorted)
    assert(t.newScan().planFiles().forall(
      _.file.sortOrderId.contains(t.sortOrder.orderId)))

    val df = spark.read.format("icegopher").load(loc)
    // the physical scan advertises the ordering...
    val scanOrdering = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.outputOrdering
    }.get
    assert(scanOrdering.nonEmpty, "scan must report the table sort order")
    assert(scanOrdering.head.child.toString.contains("id"), scanOrdering)
    // ...so a per-partition sort on the same key is ELIDED entirely
    val within = df.sortWithinPartitions("id")
    assert(sortsIn(within) == 0,
      within.queryExecution.executedPlan.toString)
    // and the results are identical to the unreported plan's
    assert(within.collect().map(_.getLong(0)).toSeq ==
      df.collect().map(_.getLong(0)).toSeq)
    // every partition really IS sorted (the claim is true, not just made)
    val violations = df.select("id").rdd.mapPartitions { it =>
      val seq = it.map(_.getLong(0)).toSeq
      Iterator.single(if (seq == seq.sorted) 0 else 1)
    }.sum()
    assert(violations == 0.0)

    // an UNSORTED table claims nothing: the same sort stays in the plan
    val loc2 = tmpDir("ord_plain")
    TableWriter.create(src, loc2)
    val plain = spark.read.format("icegopher").load(loc2)
      .sortWithinPartitions("id")
    assert(sortsIn(plain) == 1, plain.queryExecution.executedPlan.toString)
  }

  test("partial top-N pushdown: sorted table reads ~n rows per partition") {
    val loc = tmpDir("topn_sorted")
    val src = (0L until 20000L).map(i => (i, s"r$i")).toDF("id", "data")
    TableWriter.create(src.repartition(8), loc, sortBy = Seq("id"))

    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.metrics("numOutputRows").value
      }.sum
    }
    val sorted = spark.read.format("icegopher").load(loc)
    val q = sorted.orderBy("id").limit(5)
    assert(q.collect().map(_.getLong(0)).toSeq == (0L until 5L).toSeq)
    val emitted = scanRows(sorted.orderBy("id").limit(5))
    assert(emitted <= 5L * 64,
      s"top-N over a sorted table must cap per-partition reads, got $emitted")

    // a DESC request against an ASC sort order is NOT pushed — full scan,
    // result still exact (Spark's retained TopN does the work)
    val desc = sorted.orderBy(col("id").desc).limit(3)
    assert(desc.collect().map(_.getLong(0)).toSeq ==
      Seq(19999L, 19998L, 19997L))
    assert(scanRows(sorted.orderBy(col("id").desc).limit(3)) == 20000L)

    // unsorted table: no claim, no cap, exact result
    val loc2 = tmpDir("topn_plain")
    TableWriter.create(src.repartition(8), loc2)
    val plain = spark.read.format("icegopher").load(loc2)
    assert(plain.orderBy("id").limit(5).collect().map(_.getLong(0)).toSeq ==
      (0L until 5L).toSeq)
    assert(scanRows(plain.orderBy("id").limit(5)) == 20000L)

    // a residual filter blocks the push (first-n pre-filter != top-n
    // post-filter) — Spark keeps the full TopN and the result stays exact
    val filtered = sorted.filter(col("data") =!= "r3").orderBy("id").limit(3)
    assert(filtered.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
  }

  test("an out-of-order append withdraws the ordering claim") {
    val loc = tmpDir("ord_append")
    TableWriter.create((0L until 1000L).map(i => (i, s"r$i")).toDF("id", "data"),
      loc, sortBy = Seq("id"))
    // plain append: files land WITHOUT the sort order stamp
    TableWriter.append(IcebergTables.load(loc),
      Seq((5L, "x"), (1L, "y")).toDF("id", "data"))
    val df = spark.read.format("icegopher").load(loc)
      .sortWithinPartitions("id")
    assert(sortsIn(df) == 1,
      "a file outside the sort order must withdraw the per-partition claim")
    // rewriting sorted restores it
    TableWriter.compact(IcebergTables.load(loc), spark, targetFiles = 4,
      sortBy = Seq("id"))
    val df2 = spark.read.format("icegopher").load(loc)
      .sortWithinPartitions("id")
    assert(sortsIn(df2) == 0, df2.queryExecution.executedPlan.toString)
  }

  test("DESC + nulls and truncate-prefixed orders report only what is true") {
    val loc = tmpDir("ord_desc")
    val src = (0L until 1000L)
      .map(i => (i, if (i % 97 == 0) null else s"k${i % 7}", i * 2))
      .toDF("id", "k", "v")
    // sort by k DESC then id: leading identity prefix (k DESC) + id
    TableWriter.create(src, loc, sortBy = Seq("k", "id"))
    val t = IcebergTables.load(loc)
    val df = spark.read.format("icegopher").load(loc)
    val ordering = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.outputOrdering
    }.get
    assert(ordering.size == 2, ordering)

    // incremental (appended-files-between) reads never claim ordering:
    // they return whatever files landed, ignoring the sort-order gate
    val snap = t.currentSnapshot.get.snapshotId
    TableWriter.append(t, Seq((9999L, "zz", 1L)).toDF("id", "k", "v"))
    val inc = spark.read.format("icegopher")
      .option("start-snapshot-id", snap.toString)
      .load(loc)
    val incOrdering = inc.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.outputOrdering
    }
    assert(incOrdering.forall(_.isEmpty), incOrdering)
  }
}
