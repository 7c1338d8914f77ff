package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Distributed scan planning: above the manifest-count threshold the entry
  * decode runs as a Spark job; results must be identical to the driver
  * path (same files, same delete assignment, same pruning). */
class DistributedPlannerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A table with several manifests (one per append). */
  private def multiManifest(n: Int): IcebergTable = {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("distplan").toFile.getPath
    var t = TableWriter.create(
      Seq((0L, "v0")).toDF("id", "v"), loc)
    (1 until n).foreach { i =>
      t = TableWriter.append(t, Seq((i.toLong, s"v$i")).toDF("id", "v"))
    }
    t
  }

  test("distributed decode returns the driver path's exact file set") {
    val t = multiManifest(5)
    spark.sparkContext.setLogLevel("ERROR")
    val driverTasks = t.newScan(Expr.greaterThanOrEq("id", LongLit(2L)))
      .planFiles().map(_.file.path).sorted
    // force the distributed path via the table property
    val t2 = TableWriter.updateProperties(t,
      Map(DistributedPlanner.ThresholdProp -> "1"))
    val before = DistributedPlanner.runs.get()
    val distTasks = t2.newScan(Expr.greaterThanOrEq("id", LongLit(2L)))
      .planFiles().map(_.file.path).sorted
    assert(DistributedPlanner.runs.get() > before,
      "distributed planner did not engage")
    assert(distTasks == driverTasks)
    // pruning happened: id >= 2 keeps 3 of 5 single-row files
    assert(distTasks.size == 3, distTasks)
  }

  test("distributed decode preserves MoR delete matching") {
    val s = spark
    import s.implicits._
    val t0 = multiManifest(4)
    val t1 = TableWriter.deleteWhere(t0, s, col("id") === 1L)
    val t = TableWriter.updateProperties(t1,
      Map(DistributedPlanner.ThresholdProp -> "1"))
    val rows = t.newScan().toDF(spark)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rows == Set(0L, 2L, 3L), rows)
  }

  test("below the threshold the driver path runs (no job)") {
    val t = multiManifest(3) // default threshold 1000 ≫ 3
    val before = DistributedPlanner.runs.get()
    t.newScan().planFiles()
    assert(DistributedPlanner.runs.get() == before)
  }
}
