package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Multi-level (`a.b.c`) namespaces through the SQL catalog surface —
  * the REST spec supports parent-scoped namespace listing and the
  * warehouse layout is naturally hierarchical; the SQL plane must match:
  * CREATE/USE/SHOW/ALTER/DROP at depth, tables and metadata tables under
  * deep paths, and DROP semantics that treat the namespace's own
  * properties file as metadata, not content. */
class MultiNamespaceSpec extends AnyFunSuite {
  private lazy val warehouse = Files.createTempDirectory("graft_mns_wh").toFile.getPath
  private lazy val spark: SparkSession = {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.catalog.gns", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gns.warehouse", warehouse)
    s
  }

  test("multi-level namespaces: create, use, show, tables, drop") {
    spark.sql("CREATE NAMESPACE gns.a.b.c")
    assert(spark.sql("SHOW NAMESPACES IN gns.a.b").collect()
      .map(_.getString(0)).contains("a.b.c"))
    spark.sql("CREATE TABLE gns.a.b.c.t (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gns.a.b.c.t VALUES (1, 1.5), (2, 2.5)")
    assert(spark.sql("SELECT sum(v) FROM gns.a.b.c.t").collect()(0).getDouble(0) == 4.0)
    spark.sql("USE gns.a.b.c")
    assert(spark.sql("SHOW TABLES").collect().map(_.getString(1)).contains("t"))
    assert(spark.sql("SELECT count(*) FROM t").collect()(0).getLong(0) == 2)
    // metadata table through the deep path
    assert(spark.sql("SELECT count(*) FROM gns.a.b.c.t.snapshots").collect()(0).getLong(0) >= 1)
    // namespace properties at depth
    spark.sql("ALTER NAMESPACE gns.a.b.c SET PROPERTIES ('team'='x')")
    assert(spark.sql("DESCRIBE NAMESPACE EXTENDED gns.a.b.c").collect()
      .exists(r => r.getString(1).contains("team")))
    spark.sql("DROP TABLE gns.a.b.c.t")
    // after the table drop the namespace holds only its own properties
    // dotfile — droppable WITHOUT cascade (properties are metadata)
    spark.sql("DROP NAMESPACE gns.a.b.c")
    assert(!spark.sql("SHOW NAMESPACES IN gns.a.b").collect()
      .map(_.getString(0)).contains("a.b.c"))
    spark.sql("USE spark_catalog.default")
  }

  test("a parent namespace with children refuses non-cascade drop") {
    spark.sql("CREATE NAMESPACE gns.p.q")
    intercept[Exception] { spark.sql("DROP NAMESPACE gns.p") }
    // cascade takes the whole subtree
    spark.sql("DROP NAMESPACE gns.p CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN gns").collect()
      .map(_.getString(0)).contains("p"))
  }

  test("persistent views resolve under deep namespaces") {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.catalog.gnsv", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gnsv.warehouse",
      Files.createTempDirectory("graft_mns_vwh").toFile.getPath)
    val vs = {
      val active = SparkSession.getActiveSession
      val default = SparkSession.getDefaultSession
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val x = SparkSession.builder()
        .withExtensions(new GraftSparkExtensions())
        .config("spark.sql.catalog.gnsv", "graft.spark.GraftCatalog")
        .config("spark.sql.catalog.gnsv.warehouse",
          Files.createTempDirectory("graft_mns_vwh2").toFile.getPath)
        .getOrCreate()
      default.foreach(SparkSession.setDefaultSession)
      active.foreach(SparkSession.setActiveSession)
      x
    }
    vs.sql("CREATE NAMESPACE gnsv.x.y")
    vs.sql("CREATE TABLE gnsv.x.y.base (id BIGINT)")
    vs.sql("INSERT INTO gnsv.x.y.base VALUES (1), (2), (3)")
    vs.sql("CREATE OR REPLACE VIEW gnsv.x.y.v AS SELECT id * 2 AS d FROM gnsv.x.y.base")
    assert(vs.sql("SELECT sum(d) FROM gnsv.x.y.v").collect()(0).getLong(0) == 12)
    assert(vs.sql("SHOW VIEWS IN gnsv.x.y").collect().map(_.getString(1)).contains("v"))
  }
}
