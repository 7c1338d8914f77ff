package graft.spark

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** V3 `variant` end-to-end through the SQL catalog: CREATE TABLE with a
  * VARIANT column records the Iceberg `variant` type in metadata, INSERT
  * writes Spark's variant encoding through the task writers, and reads
  * (projection, `to_json`, `variant_get` filters) run through the DSv2
  * scan. Spark's VariantType is the native surface — no shredding here;
  * values travel as the binary metadata+value pair. */
class VariantSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("variant column: create, insert, read back, filter") {
    val wh = Files.createTempDirectory("graft_vwh").toFile.getPath
    val s = spark
    s.conf.set("spark.sql.catalog.gvar", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gvar.warehouse", wh)
    s.sql("CREATE TABLE gvar.db.vt (id BIGINT, payload VARIANT)")

    // the Iceberg metadata records the V3 type (foreign readers see it)
    val ice = IcebergTables.load(s"$wh/db/vt")
    assert(ice.schema.struct.fieldById(2).get.fieldType == graft.core.VariantT)

    s.sql("INSERT INTO gvar.db.vt SELECT 1L, " +
      "parse_json('{\"a\": 1, \"b\": [true, \"x\"]}')")
    s.sql("INSERT INTO gvar.db.vt SELECT 2L, parse_json('42')")

    val out = s.sql("SELECT id, to_json(payload) AS j FROM gvar.db.vt ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out(0) == (1L, """{"a":1,"b":[true,"x"]}"""), out(0))
    assert(out(1) == (2L, "42"), out(1))

    // path extraction + filtering over the variant value
    val n = s.sql("SELECT count(*) FROM gvar.db.vt " +
      "WHERE variant_get(payload, '$.a', 'int') = 1").collect()(0).getLong(0)
    assert(n == 1L)

    // schema round-trips through our own metadata serializer
    val reloaded = graft.core.TableMetadata.parse(ice.metadata.toJson)
    assert(reloaded.currentSchema.struct.fieldById(2).get.fieldType ==
      graft.core.VariantT)
  }

  test("engine-SHREDDED writes: typed_value subcolumns, both read paths reassemble") {
    val s = spark
    val wh = Files.createTempDirectory("graft_vshw").toFile.getPath
    s.conf.set("spark.sql.catalog.gshw", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gshw.warehouse", wh)

    val values = "VALUES (1L, '{\"a\": 1, \"b\": \"x\"}'), " +
      "(2L, '{\"a\": 2, \"b\": \"y\"}'), (3L, '7'), (4L, NULL), " +
      "(5L, '{\"a\": \"not-an-int\", \"c\": true}') AS t(id, j)"

    // shredding opt-in via TABLE properties (not a session flag): the
    // writer shreds payload into (a int, b string) typed subcolumns
    s.sql("""CREATE TABLE gshw.db.t (id BIGINT, payload VARIANT)
      TBLPROPERTIES (
        'write.variant.shredding.enabled' = 'true',
        'write.variant.shredding.schema.payload' = 'a int, b string')""")
    s.sql(s"INSERT INTO gshw.db.t SELECT id, parse_json(j) FROM $values")
    // the unshredded twin, same rows, no shredding properties
    s.sql("CREATE TABLE gshw.db.plain (id BIGINT, payload VARIANT)")
    s.sql(s"INSERT INTO gshw.db.plain SELECT id, parse_json(j) FROM $values")

    // the written parquet REALLY carries typed_value subcolumns (and the
    // plain twin really doesn't) — otherwise everything below is vacuous
    def footerOf(t: String): String = {
      val table = IcebergTables.load(s"$wh/db/$t")
      val f = table.newScan().planFiles().head.file.path
      val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f),
          new org.apache.hadoop.conf.Configuration()))
      try footer.getFooter.getFileMetaData.getSchema.toString
      finally footer.close()
    }
    assert(footerOf("t").contains("typed_value"), footerOf("t"))
    assert(!footerOf("plain").contains("typed_value"))

    // DSv2 read path: shredded reads equal the unshredded twin — including
    // row 5, whose 'a' doesn't fit int (residual fallback) and whose 'c'
    // is outside the shredding schema entirely
    def dump(t: String): Seq[(Long, String)] =
      s.sql(s"SELECT id, to_json(payload) AS j FROM gshw.db.$t ORDER BY id")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(dump("t") == dump("plain"), dump("t"))
    assert(s.sql("SELECT count(*) FROM gshw.db.t " +
      "WHERE try_variant_get(payload, '$.a', 'int') = 2")
      .collect()(0).getLong(0) == 1L)

    // library read path agrees
    val table = IcebergTables.load(s"$wh/db/t")
    val lib = table.newScan().toDF(s)
      .selectExpr("id", "to_json(payload) AS j").orderBy("id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(lib == dump("plain"), lib)

    // a FOREIGN-style read (plain Spark parquet, variant requested by
    // schema) of our shredded files matches the unshredded twin
    val files = table.newScan().planFiles().map(_.file.path)
    val foreign = s.read.schema("id BIGINT, payload VARIANT").parquet(files: _*)
      .selectExpr("id", "to_json(payload) AS j").orderBy("id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(foreign == dump("plain"), foreign)

    // shredded typed subcolumns still answer MoR DML correctly: delete one
    // row and re-read through both paths
    s.sql("DELETE FROM gshw.db.t WHERE id = 2")
    assert(dump("t").map(_._1) == Seq(1L, 3L, 4L, 5L))
  }

  test("foreign SHREDDED variant files read equal to their unshredded twin") {
    val s = spark
    val wh = Files.createTempDirectory("graft_vshred").toFile.getPath
    s.conf.set("spark.sql.catalog.gshr", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gshr.warehouse", wh)

    val values = "VALUES (1L, '{\"a\": 1, \"b\": \"x\"}'), " +
      "(2L, '{\"a\": 2, \"b\": \"y\"}'), (3L, '7'), (4L, NULL) AS t(id, j)"
    val src = s.sql(s"SELECT id, parse_json(j) AS payload FROM $values")

    // a foreign engine writes the SAME rows spec-shredded (typed_value
    // subcolumns next to metadata/value)
    val shredDir = Files.createTempDirectory("vshred_files").toFile
    s.conf.set("spark.sql.variant.writeShredding.enabled", "true")
    s.conf.set("spark.sql.variant.forceShreddingSchemaForTest", "a int, b string")
    try src.repartition(1).write.mode("overwrite").parquet(shredDir.getPath)
    finally {
      s.conf.set("spark.sql.variant.writeShredding.enabled", "false")
      s.conf.set("spark.sql.variant.forceShreddingSchemaForTest", "")
    }
    val shredFile = shredDir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .head
    // prove the fixture is REALLY shredded — otherwise this test is vacuous
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(shredFile.getPath),
        new org.apache.hadoop.conf.Configuration()))
    val footerSchema =
      try footer.getFooter.getFileMetaData.getSchema.toString
      finally footer.close()
    assert(footerSchema.contains("typed_value"),
      s"shredded fixture must carry typed_value subcolumns:\n$footerSchema")

    // adopt the shredded file into a V3 variant table without rewriting it
    s.sql("CREATE TABLE gshr.db.shredded (id BIGINT, payload VARIANT)")
    val table = IcebergTables.load(s"$wh/db/shredded")
    TableWriter.addFiles(table, shredDir.getPath)

    // the unshredded twin through the engine's own write path
    s.sql("CREATE TABLE gshr.db.plain (id BIGINT, payload VARIANT)")
    s.sql(s"INSERT INTO gshr.db.plain SELECT id, parse_json(j) FROM $values")

    def dump(t: String): Seq[(Long, String)] =
      s.sql(s"SELECT id, to_json(payload) AS j FROM gshr.db.$t ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(dump("shredded") == dump("plain"), dump("shredded"))
    // path extraction over the reassembled value
    assert(s.sql("SELECT count(*) FROM gshr.db.shredded " +
      "WHERE variant_get(payload, '$.a', 'int') = 2").collect()(0).getLong(0) == 1L)
  }
}
