package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Expr, LongLit}

/** BASELINE.md derived target: catalog → pruned FileScanTask list stays in
  * driver milliseconds for O(100) files — planning is O(metadata), and a
  * 1000-executor cluster is idle while the driver plans, so this number
  * must not grow with data volume. */
class PlanLatencySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("planning 100+ files completes well under a second") {
    val loc = Files.createTempDirectory("tbl_latency").toFile.getPath
    val src = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .repartitionByRange(100, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
    val table = TableWriter.create(src, loc)

    // warm load (metadata json + manifest list already parsed)
    val tasks0 = table.newScan().planFiles()
    assert(tasks0.size == 100)

    val t0 = System.nanoTime()
    val pruned = table.newScan(Expr.equalTo("l_orderkey", LongLit(50L))).planFiles()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(pruned.size <= 2, s"stats pruning failed: ${pruned.size} files")
    assert(elapsedMs < 1000, s"planning took ${elapsedMs}ms for 100 files")

    // full re-load + plan (cold path incl. metadata JSON parse) is also sub-second
    val t1 = System.nanoTime()
    val reloaded = IcebergTables.load(loc)
    val cold = reloaded.newScan(Expr.equalTo("l_orderkey", LongLit(50L))).planFiles()
    val coldMs = (System.nanoTime() - t1) / 1e6
    assert(cold.size == pruned.size)
    assert(coldMs < 1000, s"cold planning took ${coldMs}ms")
  }
}
