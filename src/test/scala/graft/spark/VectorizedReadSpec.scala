package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** The round-3 read-path requirements: a multi-row-group file must fan out
  * into multiple input partitions (split on `splitOffsets`), and delete
  * files must be parsed once per JVM, not once per task. */
class VectorizedReadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmpDir(name: String): String =
    Files.createTempDirectory(name).toFile.getPath

  private def partitionsOf(table: IcebergTable): Array[_] = {
    val builder = new GraftScanBuilder(table,
      SchemaConv.toSparkSchema(table.schema),
      new CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
    builder.build().toBatch.planInputPartitions()
  }

  test("multi-row-group file splits into multiple input partitions") {
    val loc = tmpDir("tbl_split")
    val hc = spark.sparkContext.hadoopConfiguration
    val prev = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 16 * 1024) // force several row groups
    val table =
      try TableWriter.create(
        spark.read.parquet(s"$sf/orders.parquet").coalesce(1), loc)
      finally {
        if (prev == null) hc.unset("parquet.block.size")
        else hc.set("parquet.block.size", prev)
      }

    val tasks = table.newScan().planFiles()
    assert(tasks.size == 1, "one data file expected")
    assert(tasks.head.file.splitOffsets.size > 1, "several row groups expected")

    // sanity: ranges tile the file (cap split size so a test-sized file
    // actually fans out, as a 100-TB scan would under the default 128 MB)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    spark.conf.set("spark.sql.files.openCostInBytes", "1024")
    val parts =
      try partitionsOf(table).map(_.asInstanceOf[GraftInputPartition])
      finally {
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        spark.conf.unset("spark.sql.files.openCostInBytes")
      }
    assert(parts.length > 1,
      s"expected >1 input partition for ${tasks.head.file.splitOffsets.size} row groups")
    assert(parts.map(_.start).min == 0L)
    assert(parts.map(p => p.start + p.length).max == tasks.head.file.fileSizeInBytes)

    // and the split read returns exactly the source rows
    val got = spark.read.format("icegopher").load(loc)
    val src = spark.read.parquet(s"$sf/orders.parquet")
    assert(got.count() == src.count())
    assert(got.agg(org.apache.spark.sql.functions.sum("o_orderkey")).collect()(0).getLong(0)
      == src.agg(org.apache.spark.sql.functions.sum("o_orderkey")).collect()(0).getLong(0))
  }

  test("each positional delete file is parsed once per JVM, not per task") {
    val loc = tmpDir("tbl_delonce")
    // several data files, one delete commit touching all of them
    val t1 = TableWriter.create(
      spark.read.parquet(s"$sf/customer.parquet").repartition(6), loc)
    val t2 = TableWriter.deleteWhere(t1, spark, col("c_custkey") % 10 === 0)
    val tasks = t2.newScan().planFiles()
    assert(tasks.count(_.deleteFiles.nonEmpty) > 1,
      "delete file should be matched to multiple data files")
    val deleteFiles = tasks.flatMap(_.deleteFiles).map(_.path).distinct

    val before = DeleteFileCache.fileReads.get()
    val got = spark.read.format("icegopher").load(loc)
    val expect = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_custkey") % 10 =!= 0)
    assert(got.count() == expect.count())
    val reads = DeleteFileCache.fileReads.get() - before
    assert(reads <= deleteFiles.size,
      s"delete files parsed $reads times for ${deleteFiles.size} files across ${tasks.size} tasks")
  }

  test("row-index delete matching is exact across row groups") {
    val loc = tmpDir("tbl_splitdel")
    val hc = spark.sparkContext.hadoopConfiguration
    val prev = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 16 * 1024)
    val t1 =
      try TableWriter.create(
        spark.read.parquet(s"$sf/orders.parquet").coalesce(1), loc)
      finally {
        if (prev == null) hc.unset("parquet.block.size")
        else hc.set("parquet.block.size", prev)
      }
    assert(t1.newScan().planFiles().head.file.splitOffsets.size > 1)
    // delete rows spread across the whole file (every 7th order)
    val t2 = TableWriter.deleteWhere(t1, spark, col("o_orderkey") % 7 === 0)
    val got = spark.read.format("icegopher").load(loc)
    val expect = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 7 =!= 0)
    assert(got.count() == expect.count())
    assert(got.filter(col("o_orderkey") % 7 === 0).count() == 0)
  }

  test("ungrouped COUNT/MIN/MAX are answered from metadata, no data scan") {
    val loc = tmpDir("tbl_aggpush")
    val src = spark.read.parquet(s"$sf/orders.parquet").repartition(4)
    TableWriter.create(src, loc)

    val before = TableScan.planFilesCalls.get()
    val df = spark.read.format("icegopher").load(loc)
      .agg(org.apache.spark.sql.functions.count("*").as("n"),
        org.apache.spark.sql.functions.min("o_orderkey").as("min_k"),
        org.apache.spark.sql.functions.max("o_orderkey").as("max_k"),
        org.apache.spark.sql.functions.count("o_orderdate").as("n_comment"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("metadata-only aggregate"), s"aggregate not pushed:\n$p")
    // the probe (supportCompletePushDown) and the push share one planning
    // pass — a pushed aggregate query plans the file set exactly once
    val plans = TableScan.planFilesCalls.get() - before
    assert(plans == 1, s"agg pushdown planned the file set $plans times")

    val row = df.collect()(0)
    val exp = src.agg(org.apache.spark.sql.functions.count("*"),
      org.apache.spark.sql.functions.min("o_orderkey"),
      org.apache.spark.sql.functions.max("o_orderkey"),
      org.apache.spark.sql.functions.count("o_orderdate")).collect()(0)
    assert(row.getLong(0) == exp.getLong(0))
    assert(row.getLong(1) == exp.getLong(1))
    assert(row.getLong(2) == exp.getLong(2))
    assert(row.getLong(3) == exp.getLong(3))
  }

  test("GROUP BY identity partition column is answered from metadata") {
    val loc = tmpDir("tbl_aggpushgrp")
    val src = spark.read.parquet(s"$sf/orders.parquet")
    TableWriter.create(src, loc,
      partitionBy = Seq("o_orderstatus" -> IdentityTransform))

    val fns = org.apache.spark.sql.functions
    val df = spark.read.format("icegopher").load(loc)
      .groupBy("o_orderstatus")
      .agg(fns.count("*").as("n"),
        fns.min("o_orderkey").as("min_k"),
        fns.max("o_totalprice").as("max_p"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("metadata-only aggregate"), s"grouped agg not pushed:\n$p")

    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    val exp = src.groupBy("o_orderstatus")
      .agg(fns.count("*"), fns.min("o_orderkey"), fns.max("o_totalprice"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).sortBy(_._1)
    assert(got.toSeq == exp.toSeq)

    // GROUP BY a NON-partition column must NOT be metadata-answered
    val notPushed = spark.read.format("icegopher").load(loc)
      .groupBy("o_orderpriority").agg(fns.count("*").as("n"))
    assert(!notPushed.queryExecution.executedPlan.toString
      .contains("metadata-only"))
    assert(notPushed.count() ==
      src.select("o_orderpriority").distinct().count())

    // GROUP BY an EXPRESSION over the partition column references the same
    // field but its group values are not the partition values — must NOT
    // be metadata-answered, and must stay correct
    val exprGrouped = spark.read.format("icegopher").load(loc)
      .groupBy(fns.concat(col("o_orderstatus"), fns.lit("!")).as("g"))
      .agg(fns.count("*").as("n"))
    assert(!exprGrouped.queryExecution.executedPlan.toString
      .contains("metadata-only"))
    val gotE = exprGrouped.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val expE = src.groupBy(fns.concat(col("o_orderstatus"), fns.lit("!")))
      .agg(fns.count("*")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(gotE.toSeq == expE.toSeq)
  }

  test("grouped pushdown over a pinned snapshot answers the OLD state") {
    val loc = tmpDir("tbl_aggpushtt")
    val fns = org.apache.spark.sql.functions
    val src = spark.read.parquet(s"$sf/orders.parquet")
    val half = src.filter(col("o_orderkey") % 2 === 0)
    val t1 = TableWriter.create(half, loc,
      partitionBy = Seq("o_orderstatus" -> IdentityTransform))
    val pin = t1.currentSnapshot.get.snapshotId
    TableWriter.append(t1, src.filter(col("o_orderkey") % 2 =!= 0))

    val df = spark.read.format("icegopher")
      .option("snapshot-id", pin.toString).load(loc)
      .groupBy("o_orderstatus").agg(fns.count("*").as("n"))
    assert(df.queryExecution.executedPlan.toString
      .contains("metadata-only aggregate"))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val exp = half.groupBy("o_orderstatus").agg(fns.count("*"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == exp.toSeq, "pinned scan must answer the OLD state")
    // and the un-pinned scan answers the full table
    val cur = spark.read.format("icegopher").load(loc)
      .groupBy("o_orderstatus").agg(fns.count("*").as("n"))
    assert(cur.collect().map(_.getLong(1)).sum == src.count())
  }

  test("COUNT(DISTINCT identity partition column) is answered from metadata") {
    val loc = tmpDir("tbl_aggpushcd")
    val fns = org.apache.spark.sql.functions
    val src = spark.read.parquet(s"$sf/orders.parquet")
    TableWriter.create(src, loc,
      partitionBy = Seq("o_orderstatus" -> IdentityTransform))

    val df = spark.read.format("icegopher").load(loc)
      .agg(fns.count_distinct(col("o_orderstatus")).as("nd"),
        fns.count("*").as("total"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("metadata-only aggregate"),
      s"count-distinct not pushed:\n$p")
    val row = df.collect()(0)
    assert(row.getLong(0) ==
      src.select("o_orderstatus").distinct().count())
    assert(row.getLong(1) == src.count())

    // distinct over a NON-partition column cannot come from metadata
    val refused = spark.read.format("icegopher").load(loc)
      .agg(fns.count_distinct(col("o_orderpriority")).as("nd"))
    assert(!refused.queryExecution.executedPlan.toString
      .contains("metadata-only"))
    assert(refused.collect()(0).getLong(0) ==
      src.select("o_orderpriority").distinct().count())
  }

  test("a committed zero-record data file invents no group") {
    val loc = tmpDir("tbl_aggpushzero")
    val fns = org.apache.spark.sql.functions
    val src = spark.read.parquet(s"$sf/orders.parquet")
    val t0 = TableWriter.create(src, loc,
      partitionBy = Seq("o_orderstatus" -> IdentityTransform))
    // commit an EMPTY parquet file under a partition value no row has —
    // SQL GROUP BY emits no group for a partition with no rows, so the
    // metadata answer must not invent one
    val ext = tmpDir("aggpushzero_src")
    val pdir = new java.io.File(s"$ext/o_orderstatus=Z"); pdir.mkdirs()
    src.filter(fns.lit(false)).coalesce(1)
      .write.mode("overwrite").parquet(pdir.getPath)
    val t1 = TableWriter.addFiles(t0, ext)
    // the scan planner's metrics evaluator short-circuits recordCount == 0
    // to RowsCannotMatch, so the zero-record file never reaches the
    // aggregate path at all (and metadataAggregate's own group filter is
    // a second line of defense) — pin BOTH the commit and the drop
    assert(t1.currentSnapshot.get.summary.exists(
        _.properties.get("added-by").contains("add_files")),
      "fixture must have committed through add_files")
    assert(!t1.newScan().planFiles().exists(_.file.recordCount == 0L),
      "planner must drop the committed zero-record data file")

    val df = spark.read.format("icegopher").load(loc)
      .groupBy("o_orderstatus").agg(fns.count("*").as("n"))
    assert(df.queryExecution.executedPlan.toString.contains("metadata-only"))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val exp = src.groupBy("o_orderstatus").agg(fns.count("*"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == exp.toSeq, "zero-record partition must not appear")
  }

  test("grouped pushdown refused once a spec evolution drops the identity field") {
    val loc = tmpDir("tbl_aggpushevo")
    val src = spark.read.parquet(s"$sf/orders.parquet")
    val fns = org.apache.spark.sql.functions
    val t0 = TableWriter.create(src.filter(col("o_orderkey") % 2 === 0), loc,
      partitionBy = Seq("o_orderstatus" -> IdentityTransform))
    // evolve: drop the identity field, append more rows under the new spec
    val t1 = TableWriter.dropPartitionField(t0, "o_orderstatus")
    TableWriter.append(t1, spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 2 =!= 0))

    val df = spark.read.format("icegopher").load(loc)
      .groupBy("o_orderstatus").agg(fns.count("*").as("n"))
    // files written under the evolved spec carry no identity value for the
    // group column — pushdown must refuse, Spark aggregates from data
    assert(!df.queryExecution.executedPlan.toString.contains("metadata-only"))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val exp = src.groupBy("o_orderstatus").agg(fns.count("*"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == exp.toSeq)
  }

  test("aggregate pushdown refuses filters, deletes, and unsafe bounds") {
    val loc = tmpDir("tbl_aggref")
    val src = spark.read.parquet(s"$sf/customer.parquet")
    val t1 = TableWriter.create(src, loc)

    // filtered aggregate must NOT be metadata-answered but stays correct
    val filtered = spark.read.format("icegopher").load(loc)
      .filter(col("c_nationkey") > 5)
      .agg(org.apache.spark.sql.functions.count("*"))
    assert(!filtered.queryExecution.executedPlan.toString.contains("metadata-only"))
    assert(filtered.collect()(0).getLong(0) ==
      src.filter(col("c_nationkey") > 5).count())

    // min on a string column is refused (bounds may be truncated)
    val strMin = spark.read.format("icegopher").load(loc)
      .agg(org.apache.spark.sql.functions.min("c_name"))
    assert(!strMin.queryExecution.executedPlan.toString.contains("metadata-only"))
    assert(strMin.collect()(0).getString(0) ==
      src.agg(org.apache.spark.sql.functions.min("c_name")).collect()(0).getString(0))

    // after a MoR delete, counts must come from data, not stale stats
    TableWriter.deleteWhere(t1, spark, col("c_custkey") <= 10)
    val afterDel = spark.read.format("icegopher").load(loc)
      .agg(org.apache.spark.sql.functions.count("*"))
    assert(!afterDel.queryExecution.executedPlan.toString.contains("metadata-only"))
    assert(afterDel.collect()(0).getLong(0) ==
      src.filter(col("c_custkey") > 10).count())
  }

  test("storage-partitioned join: co-bucketed tables join with no shuffle") {
    // transform resolution rides the owning catalog's FunctionCatalog, so
    // the tables must come from the catalog, not a bare path load
    val wh = tmpDir("spj_wh")
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s.sql("CREATE NAMESPACE graft.spj")
    val cust = s.read.parquet(s"$sf/customer.parquet")
    val orders = s.read.parquet(s"$sf/orders.parquet")
    TableWriter.create(cust, s"$wh/spj/cust",
      partitionBy = Seq("c_custkey" -> graft.core.BucketTransform(4)))
    TableWriter.create(orders, s"$wh/spj/ord",
      partitionBy = Seq("o_custkey" -> graft.core.BucketTransform(4)))

    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val joined = s.sql(
      """SELECT c.c_custkey, o.o_totalprice
         FROM graft.spj.cust c JOIN graft.spj.ord o
           ON c.c_custkey = o.o_custkey""")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"join sides were shuffled despite co-bucketing:\n$plan")

    // and the result matches the raw-parquet join
    val expect = cust.join(orders, col("c_custkey") === col("o_custkey"))
      .select("c_custkey", "o_totalprice")
    assert(joined.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq ==
      expect.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq)
  }

  test("catalog SQL can call the transform functions directly") {
    val wh = tmpDir("fn_wh")
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", wh)
    // must agree with the core transform (which matches the spec vectors)
    val expected = graft.core.BucketTransform(16)
      .apply(Some(graft.core.IntLit(34))).get.asInstanceOf[graft.core.IntLit].v
    assert(s.sql("SELECT graft.system.bucket(16, 34)").collect()(0).getInt(0) ==
      expected)
    assert(s.sql("SELECT graft.system.days(DATE '2024-01-10')")
      .collect()(0).getInt(0) == 19732)
    assert(s.sql("SELECT graft.system.years(TIMESTAMP_NTZ '2024-06-01 00:00:00')")
      .collect()(0).getInt(0) == 54)
  }

  test("nested and exotic columns decode through the SQL path") {
    import spark.implicits._
    val loc = tmpDir("tbl_nested")
    val src = Seq(
      (1L, ("a", 1.5), Seq(1, 2, 3), Map("x" -> 1L)),
      (2L, ("b", 2.5), Seq(4), Map("y" -> 2L)))
      .toDF("id", "s", "arr", "m")
    val table = TableWriter.create(src, loc)
    val got = spark.read.format("icegopher").load(loc)
    assert(got.schema("s").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val rows = got.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getStruct(1).getString(0) == "a")
    assert(rows(0).getSeq[Int](2) == Seq(1, 2, 3))
    assert(rows(1).getMap[String, Long](3) == Map("y" -> 2L))
    // matches the library read path
    assert(got.orderBy("id").collect().toSeq ==
      table.newScan().toDF(spark).orderBy("id").collect().toSeq)
  }
}
