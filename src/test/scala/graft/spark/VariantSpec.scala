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
}
