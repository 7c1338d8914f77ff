package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-identifier access through the catalog plugin: SHOW/SELECT/CREATE/
  * DROP against a local warehouse. Needs its own session (catalog conf is
  * session-wide). */
class GraftCatalogSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft_wh").toFile.getPath

  private lazy val spark: SparkSession = {
    // derive from the shared session so configs don't leak between suites
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
    s
  }

  test("create db + table via writer, query via SQL identifier") {
    val src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    spark.sql("CREATE NAMESPACE graft.db")
    TableWriter.create(src, s"$warehouse/db/nation")

    assert(spark.sql("SHOW TABLES IN graft.db").collect()
      .map(_.getString(1)).contains("nation"))
    assert(spark.sql("SELECT count(*) FROM graft.db.nation").collect()(0).getLong(0) ==
      src.count())
    val top = spark.sql(
      "SELECT n_name FROM graft.db.nation WHERE n_regionkey = 0 ORDER BY n_nationkey")
      .collect().map(_.getString(0))
    val expect = src.filter(org.apache.spark.sql.functions.col("n_regionkey") === 0)
      .orderBy("n_nationkey").collect().map(_.getString(1))
    assert(top.toSeq == expect.toSeq)
  }

  test("create empty table via SQL DDL, then append with the writer") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db2")
    spark.sql("CREATE TABLE graft.db2.t (id BIGINT, name STRING)")
    assert(spark.sql("SELECT * FROM graft.db2.t").count() == 0)

    import spark.implicits._
    val t = IcebergTables.load(s"$warehouse/db2/t")
    TableWriter.append(t, Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    assert(spark.sql("SELECT * FROM graft.db2.t").count() == 2)

    spark.sql("DROP TABLE graft.db2.t")
    assert(!tables("db2").contains("t"))
  }

  private def tables(db: String): Set[String] =
    spark.sql(s"SHOW TABLES IN graft.$db").collect().map(_.getString(1)).toSet

  test("rename table") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db3")
    spark.sql("CREATE TABLE graft.db3.a (x INT)")
    assert(tables("db3") == Set("a"), s"after create: ${tables("db3")}; wh=" +
      new java.io.File(warehouse).listFiles().toSeq)
    spark.sql("ALTER TABLE graft.db3.a RENAME TO graft.db3.b")
    def walk(f: java.io.File): Seq[String] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f.getPath)
    assert(tables("db3") == Set("b"), "tree=" + walk(new java.io.File(warehouse)).filter(_.contains("metadata.json")))
    // and the renamed table still loads + queries
    assert(spark.sql("SELECT * FROM graft.db3.b").count() == 0)
  }
}
