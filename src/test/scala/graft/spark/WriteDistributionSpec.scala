package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.IdentityTransform

/** `write.distribution-mode`: the write-layout knob that decides how many
  * files a partitioned write produces. `hash` (the partitioned default)
  * sends each partition value to one task — file count is the tuple
  * count, not tasks × tuples; `range` range-clusters for disjoint
  * per-file bounds; `none` trusts the caller's layout (every task writes
  * its own slice of every tuple it holds). */
class WriteDistributionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def df8 = {
    val s = spark
    import s.implicits._
    // 8 input partitions, 3 categories spread across all of them
    (0L until 240L).map(i => (i, s"c${i % 3}", i * 1.0))
      .toDF("id", "cat", "v").repartition(8)
  }

  private def filesOf(t: IcebergTable): Seq[graft.core.DataFileInfo] =
    t.newScan().planFiles().map(_.file)

  test("default hash distribution: one file per partition value") {
    val loc = Files.createTempDirectory("dist_hash").toFile.getPath
    val t = TableWriter.create(df8, loc,
      partitionBy = Seq("cat" -> IdentityTransform))
    assert(filesOf(t).size == 3, filesOf(t).map(_.partition).toString)
    assert(t.newScan().toDF(spark).count() == 240)
  }

  test("none: caller layout trusted, tasks write their own slices") {
    val loc = Files.createTempDirectory("dist_none").toFile.getPath
    val t = TableWriter.create(df8, loc,
      partitionBy = Seq("cat" -> IdentityTransform),
      properties = Map(TableWriter.DistributionModeProp -> "none"))
    // 8 tasks × up to 3 tuples each: strictly more files than tuples —
    // the knob genuinely skipped the exchange
    assert(filesOf(t).size > 3, s"expected per-task files, got ${filesOf(t).size}")
    assert(t.newScan().toDF(spark).count() == 240)
    // rows are still tuple-grouped locally, so pruning stays exact
    val cFiles = t.newScan(graft.core.Expr.equalTo("cat", graft.core.StrLit("c1")))
      .planFiles()
    assert(cFiles.forall(_.file.partition("cat") == "c1"))
  }

  test("range without a sort order clusters by partition keys") {
    val loc = Files.createTempDirectory("dist_range").toFile.getPath
    val t = TableWriter.create(df8, loc,
      partitionBy = Seq("cat" -> IdentityTransform),
      properties = Map(TableWriter.DistributionModeProp -> "range"))
    // each partition value lands in exactly one range → one file per value
    assert(filesOf(t).size == 3, filesOf(t).map(_.partition).toString)
    assert(t.newScan().toDF(spark).count() == 240)
  }

  test("explicit hash on a SORTED table keeps partition-grouped, sorted files") {
    val loc = Files.createTempDirectory("dist_hash_sorted").toFile.getPath
    val t = TableWriter.create(df8, loc,
      partitionBy = Seq("cat" -> IdentityTransform),
      properties = Map(TableWriter.DistributionModeProp -> "hash"),
      sortBy = Seq("id"))
    assert(filesOf(t).size == 3)
    // per-file id bounds hug each category's rows (locally sorted)
    assert(t.newScan().toDF(spark).count() == 240)
  }

  test("an invalid mode is rejected loudly") {
    val loc = Files.createTempDirectory("dist_bad").toFile.getPath
    val e = intercept[IllegalArgumentException] {
      TableWriter.create(df8, loc,
        partitionBy = Seq("cat" -> IdentityTransform),
        properties = Map(TableWriter.DistributionModeProp -> "shuffle"))
    }
    assert(e.getMessage.contains("write.distribution-mode"), e.getMessage)
  }
}
