package graft.catalog

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.spark.{SparkTestSession, TableWriter}

/** The REST spec's table-scoped telemetry/credentials routes over a live
  * server: `GET .../credentials` re-mints vended credentials WITHOUT a
  * full table load (the long-lived-handle refresh path), and
  * `POST .../metrics` receives scan reports after every plan —
  * fire-and-forget, so a telemetry outage can never fail a scan. */
class RestTelemetrySpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark

  private val server = new TestRestCatalogServer("graft-ci", "s3cr3t")
  private lazy val catalog: RestCatalog = {
    server.start()
    Catalog.load("telemetry-it", server.uri,
      Map(RestCatalog.KeyCredential -> "graft-ci:s3cr3t"))
      .asInstanceOf[RestCatalog]
  }

  override def afterAll(): Unit = server.stop()

  private def mkTable(name: String): Seq[String] = {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory(s"telemetry_$name").toFile.getPath
    val t = TableWriter.create(
      (0L until 20L).map(i => (i, s"r$i")).toDF("id", "v"), loc)
    try catalog.createNamespace(Seq("tm"))
    catch { case _: AlreadyExistsError => }
    val ident = Seq("tm", name)
    catalog.registerTable(ident, t.metadataPath)
    ident
  }

  test("credentials endpoint refreshes expired vended credentials without " +
      "a table reload") {
    assert(catalog.supportsCredentialsEndpoint)
    val ident = mkTable("creds")
    // load WITH delegation so a credential (with a controllable expiry)
    // is vended at all
    server.vendedExpiryMs = Some(System.currentTimeMillis() - 1000L)
    val stale = catalog.loadTable(ident)
    assert(stale.credentialsExpired(System.currentTimeMillis()))
    val loadsBefore = server.loadCounts.getOrElse(("tm", "creds"), 0)
    val credsBefore = server.credentialRequests
    // the server will now vend live credentials again
    server.vendedExpiryMs = None
    val fresh = catalog.loadTableFresh(ident, Some(stale))
    assert(!fresh.credentialsExpired(System.currentTimeMillis()))
    assert(server.credentialRequests == credsBefore + 1,
      "refresh must go through the credentials route")
    assert(server.loadCounts.getOrElse(("tm", "creds"), 0) == loadsBefore,
      "refresh must NOT reload the table")
    // the refreshed handle kept its metadata identity
    assert(fresh.metadata.tableUuid == stale.metadata.tableUuid)
  }

  test("without the endpoint, expiry falls back to a full reload") {
    val quiet = new TestRestCatalogServer("graft-ci", "s3cr3t")
    quiet.credentialsEndpointEnabled = false
    quiet.start()
    try {
      val cat = Catalog.load("no-creds", quiet.uri,
        Map(RestCatalog.KeyCredential -> "graft-ci:s3cr3t"))
        .asInstanceOf[RestCatalog]
      assert(!cat.supportsCredentialsEndpoint)
      val s = spark
      import s.implicits._
      val loc = Files.createTempDirectory("telemetry_fb").toFile.getPath
      val t = TableWriter.create(Seq((1L, "x")).toDF("id", "v"), loc)
      cat.createNamespace(Seq("q"))
      cat.registerTable(Seq("q", "t"), t.metadataPath)
      quiet.vendedExpiryMs = Some(System.currentTimeMillis() - 1000L)
      val stale = cat.loadTable(Seq("q", "t"))
      quiet.vendedExpiryMs = None
      val before = quiet.loadCounts.getOrElse(("q", "t"), 0)
      cat.loadTableFresh(Seq("q", "t"), Some(stale))
      assert(quiet.loadCounts.getOrElse(("q", "t"), 0) == before + 1,
        "no credentials route → full reload")
      assert(quiet.credentialRequests == 0)
    } finally quiet.stop()
  }

  test("every plan reports scan metrics; the report carries the planned " +
      "file count and planning duration") {
    assert(catalog.supportsMetricsEndpoint)
    val ident = mkTable("metrics")
    val remote = TableWriter.restTableOf(catalog.loadTable(ident), catalog)
    val before = server.metricsReports
    val tasks = remote.newScan(Expr.greaterThan("id", LongLit(5L))).planFiles()
    assert(server.metricsReports == before + 1)
    val report = server.lastMetricsReport.get
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(report)
    assert(node.get("report-type").asText() == "scan-report")
    assert(node.get("table-name").asText() == "tm.metrics")
    assert(node.get("filter").get("type").asText() == "gt")
    val files = node.get("metrics").get("result-data-files")
    assert(files.get("value").asLong() == tasks.size.toLong)
    val timer = node.get("metrics").get("total-planning-duration")
    assert(timer.get("time-unit").asText() == "nanoseconds")
    assert(timer.get("total-duration").asLong() > 0L)
  }

  test("a dead metrics sink never fails the scan") {
    val mortal = new TestRestCatalogServer("graft-ci", "s3cr3t")
    mortal.start()
    try {
      val cat = Catalog.load("mortal-metrics", mortal.uri,
        Map(RestCatalog.KeyCredential -> "graft-ci:s3cr3t"))
        .asInstanceOf[RestCatalog]
      val s = spark
      import s.implicits._
      val loc = Files.createTempDirectory("telemetry_dead").toFile.getPath
      val t = TableWriter.create(
        (0L until 5L).map(i => (i, "x")).toDF("id", "v"), loc)
      cat.createNamespace(Seq("m"))
      cat.registerTable(Seq("m", "t"), t.metadataPath)
      val remote = TableWriter.restTableOf(cat.loadTable(Seq("m", "t")), cat)
      mortal.stop()
      // plan falls back local AND the metrics POST fails — both silent
      assert(remote.newScan().planFiles().nonEmpty)
    } finally mortal.stop()
  }
}
