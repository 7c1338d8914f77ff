package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 surface: format("icegopher") reads match raw parquet, pushdown shows
  * in the plan, time-travel options work. */
class IcegopherSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def mkTable(name: String, src: String): IcebergTable = {
    val loc = Files.createTempDirectory(name).toFile.getPath
    TableWriter.create(spark.read.parquet(s"$sf/$src.parquet"), loc)
  }

  test("format read matches raw parquet") {
    val t = mkTable("dsv2_nation", "nation")
    val df = spark.read.format("icegopher").load(t.location)
    val raw = spark.read.parquet(s"$sf/nation.parquet")
    assert(df.count() == raw.count())
    assert(df.orderBy("n_nationkey").collect().map(_.toSeq).toSeq ==
      raw.orderBy("n_nationkey").collect().map(_.toSeq).toSeq)
  }

  test("filter + projection pushdown produce correct results") {
    val t = mkTable("dsv2_orders", "orders")
    val df = spark.read.format("icegopher").load(t.location)
      .filter(col("o_totalprice") > 100000.0)
      .select("o_orderkey", "o_totalprice")
    val raw = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 100000.0)
      .select("o_orderkey", "o_totalprice")
    assert(df.count() == raw.count())
    // plan shows our scan with pushdown info
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("icegopher"))
  }

  test("pruning happens at planning time") {
    val loc = Files.createTempDirectory("dsv2_prune").toFile.getPath
    val src = spark.read.parquet(s"$sf/orders.parquet")
      .repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey")
    val t = TableWriter.create(src, loc)
    val minKey = src.agg(org.apache.spark.sql.functions.min("o_orderkey"))
      .collect()(0).getLong(0)
    val df = spark.read.format("icegopher").load(loc)
      .filter(col("o_orderkey") === minKey)
    // physical description advertises the post-pruning file count
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("1 files after pruning"), s"plan was: $desc")
    assert(df.count() == 1)
  }

  test("timestamp columns round trip") {
    val t = mkTable("dsv2_lineitem", "lineitem")
    val df = spark.read.format("icegopher").load(t.location)
      .select("l_orderkey", "l_shipdate")
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_shipdate")
    assert(df.count() == raw.count())
    assert(df.orderBy("l_orderkey", "l_shipdate").limit(5).collect().map(_.toSeq).toSeq ==
      raw.orderBy("l_orderkey", "l_shipdate").limit(5).collect().map(_.toSeq).toSeq)
  }

  test("snapshot-id option time travels") {
    val loc = Files.createTempDirectory("dsv2_tt").toFile.getPath
    val src = spark.read.parquet(s"$sf/region.parquet")
    val t1 = TableWriter.create(src, loc)
    val snap1 = t1.currentSnapshot.get.snapshotId
    TableWriter.append(t1, src)
    assert(spark.read.format("icegopher").load(loc).count() == 2 * src.count())
    assert(spark.read.format("icegopher").option("snapshot-id", snap1.toString)
      .load(loc).count() == src.count())
  }
}
