package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Persistent SQL views through the catalog plugin + session extensions:
  * CREATE [OR REPLACE] VIEW / SELECT / SHOW VIEWS / ALTER VIEW / RENAME /
  * DROP, plus the versioned-metadata round-trip (Iceberg-view-spec-shaped
  * JSON). Views need [[GraftSparkExtensions]] (vanilla Spark has no SQL
  * surface for DSv2 ViewCatalog), which only applies at session build —
  * hence the builder dance instead of `newSession()`. */
class ViewCatalogSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft_vw").toFile.getPath

  private def newExtSession(): SparkSession = {
    val base = SparkTestSession.spark // ensures the SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      // conf-string extensions only apply when the builder also creates the
      // SparkContext; with a live context the programmatic form is required
      .withExtensions(new GraftSparkExtensions())
      .config("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  private lazy val spark: SparkSession = newExtSession()

  private def setup(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.vdb")
    if (!spark.sql("SHOW TABLES IN graft.vdb").collect()
        .map(_.getString(1)).contains("nation")) {
      TableWriter.create(
        spark.read.parquet("/root/testdata/sf0.001/nation.parquet"),
        s"$warehouse/vdb/nation")
    }
  }

  test("CREATE VIEW + SELECT resolves through the catalog") {
    setup()
    spark.sql("""CREATE VIEW graft.vdb.big_nations AS
      SELECT n_regionkey, count(*) AS n FROM graft.vdb.nation
      GROUP BY n_regionkey""")
    val viaView = spark.sql(
      "SELECT * FROM graft.vdb.big_nations ORDER BY n_regionkey")
      .collect().map(r => (r.getAs[Number](0).longValue(), r.getLong(1)))
    val direct = spark.sql(
      """SELECT n_regionkey, count(*) AS n FROM graft.vdb.nation
         GROUP BY n_regionkey ORDER BY n_regionkey""")
      .collect().map(r => (r.getAs[Number](0).longValue(), r.getLong(1)))
    assert(viaView.toSeq == direct.toSeq && viaView.nonEmpty)
  }

  test("SHOW VIEWS lists it; tables and views don't mix") {
    setup()
    spark.sql("""CREATE VIEW IF NOT EXISTS graft.vdb.big_nations AS
      SELECT n_regionkey, count(*) AS n FROM graft.vdb.nation GROUP BY 1""")
    val views = spark.sql("SHOW VIEWS IN graft.vdb").collect()
      .map(_.getString(1)).toSet
    assert(views.contains("big_nations"))
    val tables = spark.sql("SHOW TABLES IN graft.vdb").collect()
      .map(_.getString(1)).toSet
    assert(!tables.contains("big_nations"),
      "a view must not appear as a table")
    assert(tables.contains("nation"))
  }

  test("CREATE OR REPLACE appends a metadata version; history retained") {
    setup()
    spark.sql("""CREATE OR REPLACE VIEW graft.vdb.v2 AS
      SELECT n_nationkey FROM graft.vdb.nation""")
    spark.sql("""CREATE OR REPLACE VIEW graft.vdb.v2 AS
      SELECT n_nationkey, n_name FROM graft.vdb.nation""")
    assert(spark.sql("SELECT * FROM graft.vdb.v2").columns.toSeq ==
      Seq("n_nationkey", "n_name"))
    val md = ViewMetadata.parse(java.nio.file.Files.readString(
      new java.io.File(s"$warehouse/vdb/v2/view.metadata.json").toPath))
    assert(md.versions.size == 2, "replace must retain version history")
    assert(md.currentVersionId == 2)
    assert(md.versions.head.sql.contains("SELECT n_nationkey FROM"))
  }

  test("metadata JSON round-trips exactly") {
    val md = ViewMetadata(
      viewUuid = "u-1", location = "/tmp/x", currentVersionId = 2,
      versions = Seq(
        ViewVersion(1, 1000L, "SELECT 1", "spark", "graft", Seq("db"),
          """{"type":"struct","fields":[]}""", Seq("a"), Seq("b"),
          Seq(Some("c"), None)),
        ViewVersion(2, 2000L, "SELECT 2 AS x", "spark", "graft", Nil,
          """{"type":"struct","fields":[]}""", Nil, Nil, Nil)),
      properties = Map("comment" -> "hi \"quoted\""))
    assert(ViewMetadata.parse(md.toJson) == md)
  }

  test("ALTER VIEW SET/UNSET properties; DROP VIEW removes it") {
    setup()
    spark.sql("""CREATE OR REPLACE VIEW graft.vdb.v3 AS
      SELECT n_name FROM graft.vdb.nation""")
    spark.sql("ALTER VIEW graft.vdb.v3 SET TBLPROPERTIES ('k'='v')")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("vdb"), "v3")
    assert(cat.loadView(ident).properties().get("k") == "v")
    spark.sql("ALTER VIEW graft.vdb.v3 UNSET TBLPROPERTIES ('k')")
    assert(!cat.loadView(ident).properties().containsKey("k"))

    spark.sql("DROP VIEW graft.vdb.v3")
    assert(!spark.sql("SHOW VIEWS IN graft.vdb").collect()
      .map(_.getString(1)).contains("v3"))
  }

  test("ALTER VIEW AS swaps the query, keeps properties, bumps the version") {
    setup()
    spark.sql("""CREATE OR REPLACE VIEW graft.vdb.v5 AS
      SELECT n_name FROM graft.vdb.nation""")
    spark.sql("ALTER VIEW graft.vdb.v5 SET TBLPROPERTIES ('keep'='me')")
    spark.sql("""ALTER VIEW graft.vdb.v5 AS
      SELECT n_nationkey, n_name FROM graft.vdb.nation""")
    assert(spark.sql("SELECT * FROM graft.vdb.v5").columns.toSeq ==
      Seq("n_nationkey", "n_name"))
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    val v = cat.loadView(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("vdb"), "v5"))
    assert(v.properties().get("keep") == "me")
  }

  test("cyclic view definitions fail with the cycle named") {
    setup()
    spark.sql("""CREATE OR REPLACE VIEW graft.vdb.cyc_a AS
      SELECT n_name FROM graft.vdb.nation""")
    spark.sql("""CREATE OR REPLACE VIEW graft.vdb.cyc_b AS
      SELECT n_name FROM graft.vdb.cyc_a""")
    // close the loop: ALTER analyzes against the OLD cyc_a, so it succeeds;
    // the cycle must be caught at read time with both members named
    spark.sql("""ALTER VIEW graft.vdb.cyc_a AS
      SELECT n_name FROM graft.vdb.cyc_b""")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.vdb.cyc_a").collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    val msg = chain(e).mkString("\n")
    assert(msg.contains("view cycle:") && msg.contains("cyc_a") &&
      msg.contains("cyc_b"), msg)
    // self-reference is the degenerate cycle (fresh view: the ALTER's query
    // analyzes against the OLD definition, which points at nation)
    spark.sql("""CREATE OR REPLACE VIEW graft.vdb.cyc_c AS
      SELECT n_name FROM graft.vdb.nation""")
    spark.sql("""ALTER VIEW graft.vdb.cyc_c AS
      SELECT n_name FROM graft.vdb.cyc_c""")
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft.vdb.cyc_c").collect()
    }
    assert(chain(e2).mkString("\n").contains("view cycle:"))
    spark.sql("DROP VIEW graft.vdb.cyc_a")
    spark.sql("DROP VIEW graft.vdb.cyc_b")
    spark.sql("DROP VIEW graft.vdb.cyc_c")
  }

  test("qualified DDL at another catalog is not hijacked; temp views outrank") {
    setup()
    spark.sql("USE graft.vdb")
    try {
      // a stored view and a session temp view sharing a bare name:
      // reads and DDL on the bare name hit the TEMP view first
      spark.sql("CREATE OR REPLACE VIEW shadowed AS SELECT 1 AS a")
      spark.sql("CREATE TEMPORARY VIEW shadowed AS SELECT 2 AS a")
      assert(spark.sql("SELECT a FROM shadowed").collect()(0).getInt(0) == 2)
      // ...but CREATE [OR REPLACE] VIEW is NOT blocked by the temp view
      // (Spark semantics: a temp view never prevents creating a permanent
      // view of the same name)
      spark.sql("CREATE OR REPLACE VIEW shadowed AS SELECT 1 AS a")
      spark.sql("DROP VIEW shadowed") // must drop the TEMP view
      assert(spark.sql("SELECT a FROM shadowed").collect()(0).getInt(0) == 1)
      spark.sql("DROP VIEW shadowed") // now the stored view
      assert(spark.sql("SHOW VIEWS IN graft.vdb").collect()
        .forall(_.getString(1) != "shadowed"))
      // DDL explicitly qualified at the session catalog must reach IT,
      // not be rewritten into a graft namespace lookup
      spark.sql("CREATE VIEW spark_catalog.default.sesv AS SELECT 3 AS a")
      spark.sql("DROP VIEW spark_catalog.default.sesv")
    } finally spark.sql("USE spark_catalog")
  }

  test("SHOW VIEWS includes session temp views (isTemporary=true)") {
    setup()
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tshow AS SELECT 1 AS a")
    try {
      val rows = spark.sql("SHOW VIEWS IN graft.vdb").collect()
      val tmp = rows.filter(_.getString(1) == "tshow")
      assert(tmp.length == 1 && tmp(0).getBoolean(2) &&
        tmp(0).getString(0) == "", tmp.mkString(","))
    } finally spark.sql("DROP VIEW tshow")
  }

  test("CREATE TABLE / RENAME onto an existing view is refused") {
    setup()
    spark.sql("""CREATE OR REPLACE VIEW graft.vdb.vguard AS
      SELECT n_name FROM graft.vdb.nation""")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.vdb.vguard (id BIGINT)")
    }
    assert(e.getMessage.contains("vguard"), e.getMessage)
    // the view's metadata (and dropView's recursive delete scope) is intact
    assert(spark.sql("SELECT * FROM graft.vdb.vguard").count() == 25)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.vdb.nation RENAME TO graft.vdb.vguard")
    }
    assert(e2.getMessage.contains("vguard"), e2.getMessage)
    assert(spark.sql("SELECT count(*) FROM graft.vdb.nation").collect()(0)
      .getLong(0) == 25)
    spark.sql("DROP VIEW graft.vdb.vguard")
  }

  test("view drops/creates invalidate the existence cache") {
    setup()
    spark.sql("""CREATE OR REPLACE VIEW graft.vdb.vcache AS
      SELECT n_name FROM graft.vdb.nation""")
    assert(spark.sql("SELECT * FROM graft.vdb.vcache").count() == 25)
    spark.sql("DROP VIEW graft.vdb.vcache")
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.vdb.vcache").collect()
    }
    spark.sql("""CREATE VIEW graft.vdb.vcache AS
      SELECT n_nationkey FROM graft.vdb.nation WHERE n_nationkey < 5""")
    assert(spark.sql("SELECT * FROM graft.vdb.vcache").count() == 5)
    spark.sql("DROP VIEW graft.vdb.vcache")
  }

  test("db.v.versions surfaces the retained version history") {
    setup()
    spark.sql("""CREATE OR REPLACE VIEW graft.vdb.vhist AS
      SELECT n_name FROM graft.vdb.nation""")
    spark.sql("""CREATE OR REPLACE VIEW graft.vdb.vhist AS
      SELECT n_name, n_regionkey FROM graft.vdb.nation""")
    spark.sql("""CREATE OR REPLACE VIEW graft.vdb.vhist AS
      SELECT n_regionkey, COUNT(*) AS n FROM graft.vdb.nation
      GROUP BY n_regionkey""")
    val rows = spark.sql(
      """SELECT version_id, is_current, sql FROM graft.vdb.vhist.versions
         ORDER BY version_id""").collect()
    assert(rows.length == 3, s"expected 3 retained versions, got ${rows.length}")
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    // only the LAST version is current, and it carries the latest SQL
    assert(rows.map(_.getBoolean(1)).toSeq == Seq(false, false, true))
    assert(rows(2).getString(2).contains("GROUP BY"))
    assert(rows(0).getString(2).contains("SELECT n_name FROM"))
    spark.sql("DROP VIEW graft.vdb.vhist")
  }

  test("views survive a fresh catalog instance (persisted metadata)") {
    setup()
    spark.sql("""CREATE OR REPLACE VIEW graft.vdb.persisted AS
      SELECT count(*) AS n FROM graft.vdb.nation""")
    // a brand-new session = brand-new catalog instance over the same dir
    val s2 = spark.newSession() // keeps the extensions, fresh catalog state
    s2.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
    assert(s2.sql("SELECT * FROM graft.vdb.persisted").collect()(0)
      .getLong(0) == 25)
  }
}
