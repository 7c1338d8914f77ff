package graft.catalog

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** REST catalog against an in-process stub server — the ScalaTest analog of
  * the reference's httptest-based rest_test.go:52-608: auth header assertions,
  * token flow, config merge, load-table payload, and error taxonomy. */
class RestCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = _
  @volatile private var lastAuth: String = ""
  @volatile private var lastCommitBody: String = ""

  private val tableJson =
    """{
      "metadata-location": "s3://warehouse/db/tbl/metadata/v1.metadata.json",
      "metadata": {
        "format-version": 2,
        "table-uuid": "9c12d441-03fe-4693-9a96-a0705ddf69c1",
        "location": "s3://warehouse/db/tbl",
        "last-sequence-number": 1,
        "last-updated-ms": 1602638573590,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
          {"id": 1, "name": "id", "required": true, "type": "long"},
          {"id": 2, "name": "data", "required": false, "type": "string"}]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {}
      },
      "config": {"client.factory": "example"}
    }"""

  private def send(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress(0), 0)
    port = server.getAddress.getPort
    server.createContext("/v1/oauth/tokens", (ex: HttpExchange) => {
      val form = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (form.contains("client_id=user") && form.contains("client_secret=pass"))
        send(ex, 200, """{"access_token": "tok123", "token_type": "bearer"}""")
      else send(ex, 401,
        """{"error": "invalid_client", "error_description": "bad creds"}""")
    })
    server.createContext("/v1/config", (ex: HttpExchange) =>
      send(ex, 200,
        """{"defaults": {"warehouse": "s3://default-wh", "def-only": "d"},
            "overrides": {"prefix": "ns-prefix"}}"""))
    server.createContext("/v1/ns-prefix/namespaces", (ex: HttpExchange) => {
      lastAuth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      val path = ex.getRequestURI.getPath
      (ex.getRequestMethod, path) match {
        case ("GET", "/v1/ns-prefix/namespaces") =>
          send(ex, 200, """{"namespaces": [["db1"], ["db2", "sub"]]}""")
        case ("POST", "/v1/ns-prefix/namespaces") =>
          send(ex, 200, """{"namespace": ["newdb"], "properties": {}}""")
        case ("GET", "/v1/ns-prefix/namespaces/db1") =>
          send(ex, 200, """{"namespace": ["db1"], "properties": {"owner": "me"}}""")
        case ("GET", "/v1/ns-prefix/namespaces/db1/tables") =>
          send(ex, 200,
            """{"identifiers": [{"namespace": ["db1"], "name": "t1"},
                                {"namespace": ["db1"], "name": "t2"}]}""")
        case ("GET", "/v1/ns-prefix/namespaces/paged/tables") =>
          // spec pagination: page 1 carries next-page-token, page 2 ends it
          Option(ex.getRequestURI.getQuery).filter(_.contains("pageToken=p2")) match {
            case Some(_) => send(ex, 200,
              """{"identifiers": [{"namespace": ["paged"], "name": "t3"}]}""")
            case None => send(ex, 200,
              """{"identifiers": [{"namespace": ["paged"], "name": "t1"},
                                  {"namespace": ["paged"], "name": "t2"}],
                  "next-page-token": "p2"}""")
          }
        case ("GET", "/v1/ns-prefix/namespaces/db1/tables/t1") =>
          send(ex, 200, tableJson)
        case ("POST", "/v1/ns-prefix/namespaces/db1/tables") =>
          lastCommitBody = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          send(ex, 200, tableJson)
        case ("POST", "/v1/ns-prefix/namespaces/db1/tables/t1") =>
          lastCommitBody = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          send(ex, 200, tableJson)
        case ("POST", "/v1/ns-prefix/namespaces/db1/tables/contended") =>
          send(ex, 409,
            """{"error": {"message": "Requirement failed: table uuid changed"}}""")
        case ("GET", "/v1/ns-prefix/namespaces/db1/tables/missing") =>
          send(ex, 404, """{"error": {"message": "table missing not found"}}""")
        case ("POST", "/v1/ns-prefix/namespaces/db1/properties") =>
          send(ex, 200, """{"removed": ["a"], "updated": ["b"], "missing": ["c"]}""")
        case ("DELETE", "/v1/ns-prefix/namespaces/db1/tables/t2") =>
          send(ex, 204, "")
        case _ => send(ex, 404, s"""{"error": {"message": "no route $path"}}""")
      }
    })
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  private def catalog(): RestCatalog =
    new RestCatalog("test", s"http://localhost:$port",
      Map(RestCatalog.KeyCredential -> "user:pass"))

  test("oauth token + config merge establish a session") {
    val cat = catalog()
    // defaults merged under our props; overrides win
    cat.listNamespaces() // triggers an authed request
    assert(lastAuth == "Bearer tok123")
  }

  test("bad credentials raise OAuthError") {
    val e = intercept[OAuthError] {
      new RestCatalog("test", s"http://localhost:$port",
        Map(RestCatalog.KeyCredential -> "user:wrong"))
    }
    assert(e.error == "invalid_client")
  }

  test("list namespaces") {
    assert(catalog().listNamespaces() == Seq(Seq("db1"), Seq("db2", "sub")))
  }

  test("namespace properties + update summary") {
    val cat = catalog()
    assert(cat.namespaceProperties(Seq("db1")) == Map("owner" -> "me"))
    val summary = cat.updateNamespaceProperties(Seq("db1"), Seq("a"), Map("b" -> "2"))
    assert(summary == PropertiesUpdateSummary(Seq("a"), Seq("b"), Seq("c")))
  }

  test("list tables") {
    assert(catalog().listTables(Seq("db1")) == Seq(Seq("db1", "t1"), Seq("db1", "t2")))
  }

  test("list tables follows next-page-token across pages") {
    assert(catalog().listTables(Seq("paged")) ==
      Seq(Seq("paged", "t1"), Seq("paged", "t2"), Seq("paged", "t3")))
  }

  test("load table parses metadata payload") {
    val t = catalog().loadTable(Seq("db1", "t1"))
    assert(t.metadataLocation == "s3://warehouse/db/tbl/metadata/v1.metadata.json")
    assert(t.metadata.currentSchema.fields.map(_.name) == Seq("id", "data"))
    assert(t.config == Map("client.factory" -> "example"))
  }

  test("error taxonomy: 404 → NoSuchTableError with server message") {
    val e = intercept[NoSuchTableError](catalog().loadTable(Seq("db1", "missing")))
    assert(e.getMessage.contains("table missing not found"))
  }

  test("drop table") {
    catalog().dropTable(Seq("db1", "t2")) // 204 is success; no exception
  }

  test("commit table properties: updateTable POST with uuid requirement") {
    val cat = catalog()
    val committed = cat.commitTableProperties(Seq("db1", "t1"),
      "9c12d441-03fe-4693-9a96-a0705ddf69c1",
      Map("retention" -> "30d"), Seq("stale-key"))
    // the server's post-commit metadata comes back parsed
    assert(committed.metadataLocation == "s3://warehouse/db/tbl/metadata/v1.metadata.json")
    // the request carried the requirement + both update actions
    assert(lastCommitBody.contains("\"assert-table-uuid\""), lastCommitBody)
    assert(lastCommitBody.contains("9c12d441-03fe-4693-9a96-a0705ddf69c1"))
    assert(lastCommitBody.contains("\"set-properties\""))
    assert(lastCommitBody.contains("\"retention\""))
    assert(lastCommitBody.contains("\"remove-properties\""))
    assert(lastCommitBody.contains("\"stale-key\""))
  }

  test("commit conflict: 409 surfaces as CommitConflictError") {
    val e = intercept[CommitConflictError](
      catalog().commitTableProperties(Seq("db1", "contended"), "uuid-x",
        Map("k" -> "v"), Nil))
    assert(e.getMessage.contains("uuid changed"))
  }

  test("data commit: add-snapshot + set-snapshot-ref with ref guard") {
    import graft.core.{OpAppend, Snapshot, SnapshotSummary}
    val snap = Snapshot(42L, Some(41L), 7L, 1700000000000L,
      "/tbl/metadata/snap-42.avro",
      Some(SnapshotSummary(OpAppend, Map("added-data-files" -> "3"))), Some(0))
    catalog().commitTable(Seq("db1", "t1"),
      Seq(AssertTableUuid("9c12d441-03fe-4693-9a96-a0705ddf69c1"),
        AssertRefSnapshotId("main", Some(41L))),
      Seq(AddSnapshot(snap), SetSnapshotRef("main", 42L)))
    val body = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(lastCommitBody)
    val reqs = body.get("requirements")
    assert(reqs.get(0).get("type").asText() == "assert-table-uuid")
    assert(reqs.get(1).get("type").asText() == "assert-ref-snapshot-id")
    assert(reqs.get(1).get("ref").asText() == "main")
    assert(reqs.get(1).get("snapshot-id").asLong() == 41L)
    val ups = body.get("updates")
    assert(ups.get(0).get("action").asText() == "add-snapshot")
    val sn = ups.get(0).get("snapshot")
    assert(sn.get("snapshot-id").asLong() == 42L)
    assert(sn.get("parent-snapshot-id").asLong() == 41L)
    assert(sn.get("sequence-number").asLong() == 7L)
    assert(sn.get("manifest-list").asText() == "/tbl/metadata/snap-42.avro")
    assert(sn.get("summary").get("operation").asText() == "append")
    assert(ups.get(1).get("action").asText() == "set-snapshot-ref")
    assert(ups.get(1).get("ref-name").asText() == "main")
    assert(ups.get(1).get("type").asText() == "branch")
    assert(ups.get(1).get("snapshot-id").asLong() == 42L)
  }

  test("create table posts the schema payload and parses the result") {
    import graft.core.{LongT, NestedField, Schema, StringT, StructT}
    val schema = Schema(0, StructT(Seq(
      NestedField(1, "id", LongT, required = true),
      NestedField(2, "data", StringT))))
    val created = catalog().createTable(Seq("db1", "tnew"), schema,
      Map("owner" -> "specs"))
    assert(created.metadata.tableUuid == "9c12d441-03fe-4693-9a96-a0705ddf69c1")
    val body = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(lastCommitBody)
    assert(body.get("name").asText() == "tnew")
    assert(body.get("schema").get("type").asText() == "struct")
    val fields = body.get("schema").get("fields")
    assert(fields.get(0).get("name").asText() == "id")
    assert(fields.get(0).get("required").asBoolean())
    assert(fields.get(1).get("type").asText() == "string")
    assert(body.get("properties").get("owner").asText() == "specs")
  }

  test("assert-ref-snapshot-id with no snapshot serializes a null guard") {
    catalog().commitTable(Seq("db1", "t1"),
      Seq(AssertRefSnapshotId("main", None)), Nil)
    val body = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(lastCommitBody)
    assert(body.get("requirements").get(0).get("snapshot-id").isNull)
  }

  test("catalog scheme dispatch") {
    assert(Catalog.load("c", s"http://localhost:$port",
      Map(RestCatalog.KeyCredential -> "user:pass")).isInstanceOf[RestCatalog])
    intercept[IllegalArgumentException](Catalog.load("c", "thrift://host:9083"))
  }
}
