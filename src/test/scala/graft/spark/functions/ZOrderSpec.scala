package graft.spark.functions

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Expr
import graft.spark.{IcebergTables, SparkTestSession, TableWriter}

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def asNum(z: Array[Byte]): BigInt = BigInt(1, z)

  test("encodings preserve order through the z-value byte order") {
    def z1(enc: Long): BigInt = asNum(ZOrder.interleave(Array(enc)))
    val longs = Seq(Long.MinValue, -7L, -1L, 0L, 1L, 42L, Long.MaxValue)
    val zl = longs.map(v => z1(ZOrder.encodeLong(v)))
    assert(zl == zl.sorted && zl.distinct.size == longs.size)

    val doubles = Seq(Double.NegativeInfinity, -1e100, -2.5, -0.0, 0.0,
      1e-300, 3.14, Double.MaxValue, Double.PositiveInfinity)
    val zd = doubles.map(d => z1(ZOrder.encodeDouble(d)))
    assert(zd == zd.sorted)

    val zs = Seq("", "a", "ab", "b", "ba").map(s =>
      z1(ZOrder.encodeBytes(s.getBytes("UTF-8"))))
    assert(zs == zs.sorted)
  }

  test("interleave maps quadrants to z-value quartiles") {
    // two dims: (lo,lo) < (lo,hi) < (hi,lo) < (hi,hi) in z order
    def z(x: Long, y: Long): BigInt =
      asNum(ZOrder.interleave(Array(ZOrder.encodeLong(x), ZOrder.encodeLong(y))))
    val lo = -100L; val hi = 100L
    val quads = Seq(z(lo, lo), z(lo, hi), z(hi, lo), z(hi, hi))
    assert(quads == quads.sorted && quads.distinct.size == 4)
    // low-magnitude signal survives the full-bit interleave
    assert(z(1, 0) != z(0, 0) && z(0, 1) != z(0, 0))
  }

  test("zorder column is codegen'd and matches interpreted eval") {
    val df = spark.range(1000).select(
      (col("id") % 37 - 18).as("x"),
      (col("id") * 7919 % 1000).cast("double").as("y"))
    val got = df.select(ZOrder.zorder(col("x"), col("y")).as("z"),
      col("x"), col("y")).collect()
    got.foreach { r =>
      val expect = ZOrder.interleave(Array(
        ZOrder.encodeLong(r.getLong(1)), ZOrder.encodeDouble(r.getDouble(2))))
      assert(r.getAs[Array[Byte]](0).toSeq == expect.toSeq)
    }
  }

  test("rewrite_zorder makes per-file bounds tight in BOTH columns") {
    val loc = Files.createTempDirectory("tbl_z").toFile.getPath
    // 64x64 grid in random-ish order: appended as-is, every file spans the
    // whole domain in both columns
    val grid = spark.range(4096).select(
      (col("id") * 2654435761L % 4096 % 64).as("x"),
      ((col("id") * 2654435761L % 4096) / 64).cast("long").as("y"))
    val t = TableWriter.create(grid.repartition(4), loc)

    def prunedCount(t: graft.spark.IcebergTable, c: String, v: Long): Int =
      t.newScan(Expr.lessThan(c, graft.core.LongLit(v))).planFiles().size

    val before = IcebergTables.load(loc)
    assert(before.newScan().planFiles().size == 4)
    // un-clustered: a half-domain predicate on either column prunes nothing
    assert(prunedCount(before, "x", 32L) == 4)
    assert(prunedCount(before, "y", 32L) == 4)

    // sharper sampled range boundaries → files track z-blocks closely
    spark.conf.set("spark.sql.execution.rangeExchange.sampleSizePerPartition", 2000)
    val after = try TableWriter.compact(before, spark, targetFiles = 16,
      zOrderBy = Seq("x", "y"))
    finally spark.conf.unset("spark.sql.execution.rangeExchange.sampleSizePerPartition")
    assert(after.newScan().planFiles().size == 16)
    assert(after.newScan().toDF(spark).count() == 4096)
    // 16 files ≈ 16 z-blocks of the 64x64 grid: a half-domain predicate on
    // EITHER column keeps only the ~8 blocks on its side (plus boundary
    // straddlers) — multi-dimensional pruning no single-column sort gives
    assert(prunedCount(after, "x", 32L) <= 10, "x should prune files")
    assert(prunedCount(after, "y", 32L) <= 10, "y should prune files")
    // and a quadrant read prunes multiplicatively (~4 of 16 blocks)
    val quad = after.newScan(Expr.and(Seq(
      Expr.lessThan("x", graft.core.LongLit(32L)),
      Expr.lessThan("y", graft.core.LongLit(32L))))).planFiles()
    assert(quad.size <= 6, s"quadrant read should hit ~4 files, got ${quad.size}")
  }
}
