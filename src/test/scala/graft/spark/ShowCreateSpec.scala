package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SHOW CREATE TABLE / DESCRIBE EXTENDED against GraftCatalog — the first
  * things a user types when debugging a table's layout. SHOW CREATE must
  * emit DDL that ROUND-TRIPS (running its output recreates an equivalent
  * schema + partition spec), and DESCRIBE EXTENDED must surface the
  * partitioning, sort order, table properties, and current snapshot. */
class ShowCreateSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft_sc").toFile.getPath

  private lazy val spark: SparkSession = {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
    s
  }

  private def showCreate(t: String): String =
    spark.sql(s"SHOW CREATE TABLE $t").collect().map(_.getString(0)).mkString("\n")

  test("SHOW CREATE TABLE prints schema, USING, PARTITIONED BY, snapshot") {
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbsc")
    TableWriter.create(src, s"$warehouse/dbsc/orders",
      partitionBy = Seq("o_orderstatus" -> graft.core.IdentityTransform,
        "o_orderdate" -> graft.core.DayTransform))
    val ddl = showCreate("graft.dbsc.orders")
    assert(ddl.contains("CREATE TABLE graft.dbsc.orders"), ddl)
    assert(ddl.contains("o_orderkey BIGINT"), ddl)
    assert(ddl.contains("USING icegopher"), ddl)
    assert(ddl.contains("PARTITIONED BY (o_orderstatus, days(o_orderdate))"), ddl)
    assert(ddl.contains("'current-snapshot-id'"), ddl)
    assert(ddl.contains("'format-version'"), ddl)
  }

  test("SHOW CREATE TABLE output round-trips through CREATE TABLE") {
    val ddl = showCreate("graft.dbsc.orders")
    // re-point the DDL at a fresh identifier and execute it verbatim
    val ddl2 = ddl.replace("graft.dbsc.orders", "graft.dbsc.orders_rt")
    spark.sql(ddl2)
    val orig = IcebergTables.load(s"$warehouse/dbsc/orders")
    val rt = IcebergTables.load(s"$warehouse/dbsc/orders_rt")
    assert(graft.spark.SchemaConv.toSparkSchema(rt.schema) ==
      graft.spark.SchemaConv.toSparkSchema(orig.schema))
    assert(rt.spec.fields.map(f => (f.name, f.transform)) ==
      orig.spec.fields.map(f => (f.name, f.transform)))
    // and the recreated table's own SHOW CREATE agrees on the layout lines
    val ddlRt = showCreate("graft.dbsc.orders_rt")
    assert(ddlRt.contains("PARTITIONED BY (o_orderstatus, days(o_orderdate))"),
      ddlRt)
  }

  test("SHOW CREATE TABLE renders nested types and round-trips them") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbsc2")
    spark.sql("CREATE TABLE graft.dbsc2.nested (id BIGINT, " +
      "info STRUCT<name: STRING, geo: STRUCT<lat: DOUBLE>>, " +
      "tags ARRAY<STRING>, attrs MAP<STRING, BIGINT>)")
    val ddl = showCreate("graft.dbsc2.nested")
    assert(ddl.contains("STRUCT"), ddl)
    assert(ddl.contains("ARRAY"), ddl)
    assert(ddl.contains("MAP"), ddl)
    val ddl2 = ddl.replace("graft.dbsc2.nested", "graft.dbsc2.nested_rt")
    spark.sql(ddl2)
    val orig = IcebergTables.load(s"$warehouse/dbsc2/nested")
    val rt = IcebergTables.load(s"$warehouse/dbsc2/nested_rt")
    assert(graft.spark.SchemaConv.toSparkSchema(rt.schema) ==
      graft.spark.SchemaConv.toSparkSchema(orig.schema))
  }

  test("DESCRIBE EXTENDED surfaces partitioning, properties, snapshot") {
    val rows = spark.sql("DESCRIBE EXTENDED graft.dbsc.orders").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byKey = rows.toMap
    assert(rows.exists(_._1 == "# Partition Information") ||
      rows.exists(_._2.contains("o_orderstatus")),
      s"no partitioning surfaced: ${rows.mkString("; ")}")
    val props = byKey.getOrElse("Table Properties", "")
    assert(props.contains("current-snapshot-id=") &&
      props.contains("format-version="),
      s"snapshot/format not in properties: $props")
  }

  test("SHOW TBLPROPERTIES reads the same property surface") {
    val rows = spark.sql("SHOW TBLPROPERTIES graft.dbsc.orders").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    // `provider` is a Spark-reserved property, filtered from this output
    // (it still prints via SHOW CREATE TABLE's USING clause)
    assert(rows.contains("current-snapshot-id") && rows.contains("format-version"),
      rows)
  }

  test("DESCRIBE EXTENDED surfaces the sort order when one is active") {
    val src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    TableWriter.create(src, s"$warehouse/dbsc/nation_sorted",
      sortBy = Seq("n_nationkey"))
    val rows = spark.sql("DESCRIBE EXTENDED graft.dbsc.nation_sorted")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val props = rows.getOrElse("Table Properties", "")
    assert(props.contains("sort-order=n_nationkey asc"),
      s"sort order missing: $props")
  }
}
