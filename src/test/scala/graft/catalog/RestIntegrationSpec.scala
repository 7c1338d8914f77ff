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

  test("transactions/commit: two-table commit is atomic — both or neither") {
    catalog.createNamespace(Seq("it_tx"))
    val a = catalog.createTable(Seq("it_tx", "a"), schema)
    val b = catalog.createTable(Seq("it_tx", "b"), schema)
    def snap(id: Long, tbl: String) = Snapshot(id, None, 1L,
      System.currentTimeMillis(),
      s"mem://warehouse/it_tx/$tbl/metadata/snap-$id.avro",
      Some(SnapshotSummary(OpAppend)), Some(0))

    // atomic success: one POST moves both tables
    catalog.commitTransaction(Seq(
      TableChange(Seq("it_tx", "a"),
        Seq(AssertTableUuid(a.metadata.tableUuid),
          AssertRefSnapshotId("main", None)),
        Seq(AddSnapshot(snap(301L, "a")), SetSnapshotRef("main", 301L))),
      TableChange(Seq("it_tx", "b"),
        Seq(AssertTableUuid(b.metadata.tableUuid),
          AssertRefSnapshotId("main", None)),
        Seq(AddSnapshot(snap(302L, "b")), SetSnapshotRef("main", 302L)))))
    assert(catalog.loadTable(Seq("it_tx", "a"))
      .metadata.currentSnapshotId.contains(301L))
    assert(catalog.loadTable(Seq("it_tx", "b"))
      .metadata.currentSnapshotId.contains(302L))

    // a STALE requirement on table b must roll back table a's otherwise
    // valid change — a is listed FIRST, so this pins that the server
    // validates every table before applying any update
    intercept[CommitConflictError] {
      catalog.commitTransaction(Seq(
        TableChange(Seq("it_tx", "a"),
          Seq(AssertRefSnapshotId("main", Some(301L))),
          Seq(AddSnapshot(snap(303L, "a")), SetSnapshotRef("main", 303L))),
        TableChange(Seq("it_tx", "b"),
          Seq(AssertRefSnapshotId("main", None)), // stale: b moved to 302
          Seq(AddSnapshot(snap(304L, "b")), SetSnapshotRef("main", 304L)))))
    }
    assert(catalog.loadTable(Seq("it_tx", "a"))
      .metadata.currentSnapshotId.contains(301L),
      "table a's valid change must have rolled back with the transaction")
    assert(catalog.loadTable(Seq("it_tx", "b"))
      .metadata.currentSnapshotId.contains(302L))

    // an unknown member table fails the whole transaction up front
    intercept[CommitConflictError] {
      catalog.commitTransaction(Seq(
        TableChange(Seq("it_tx", "a"),
          Seq(AssertRefSnapshotId("main", Some(301L))),
          Seq(AddSnapshot(snap(305L, "a")), SetSnapshotRef("main", 305L))),
        TableChange(Seq("it_tx", "ghost"), Nil, Nil)))
    }
    assert(catalog.loadTable(Seq("it_tx", "a"))
      .metadata.currentSnapshotId.contains(301L))
  }

  test("TableWriter.transaction: staged file appends land atomically") {
    val spark = graft.spark.SparkTestSession.spark
    import spark.implicits._
    catalog.createNamespace(Seq("it_txf"))
    val locS = java.nio.file.Files.createTempDirectory("txf_src").toFile.getPath
    val locI = java.nio.file.Files.createTempDirectory("txf_idx").toFile.getPath
    catalog.createTable(Seq("it_txf", "src"), schema, location = Some(locS))
    catalog.createTable(Seq("it_txf", "idx"), schema, location = Some(locI))

    def fileFor(loc: String, tag: String): graft.spark.CowFileOut = {
      val raw = java.nio.file.Files.createTempDirectory(s"txf_raw_$tag").toFile
      Seq((1L, tag), (2L, tag)).toDF("id", "data")
        .coalesce(1).write.mode("overwrite").parquet(raw.getPath)
      val src = raw.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(new java.io.File(loc, "data"), s"$tag.parquet")
      dest.getParentFile.mkdirs()
      java.nio.file.Files.copy(src.toPath, dest.toPath)
      graft.spark.CowFileOut(dest.getPath, 2, Map.empty)
    }

    // source table + its derived index move in ONE transaction
    val s1 = fileFor(locS, "s1")
    graft.spark.TableWriter.transaction(catalog)
      .stageAppend(Seq("it_txf", "src"), Seq(s1))
      .stageAppend(Seq("it_txf", "idx"), Seq(fileFor(locI, "i1")),
        Map("derived-from" -> "src"))
      .commit()
    val srcSnap = catalog.loadTable(Seq("it_txf", "src"))
      .metadata.currentSnapshotId
    val idxSnap = catalog.loadTable(Seq("it_txf", "idx"))
      .metadata.currentSnapshotId
    assert(srcSnap.isDefined && idxSnap.isDefined)

    // double-staging one table in a transaction is refused at stage time
    intercept[IllegalArgumentException] {
      graft.spark.TableWriter.transaction(catalog)
        .stageAppend(Seq("it_txf", "src"), Seq(fileFor(locS, "dup1")))
        .stageAppend(Seq("it_txf", "src"), Seq(fileFor(locS, "dup2")))
    }

    // a COW REPLACE and an append land atomically in one transaction —
    // e.g. compacting one member while appending to its sibling
    val rewrite = fileFor(locS, "s1-rewrite")
    graft.spark.TableWriter.transaction(catalog)
      .stageReplace(Seq("it_txf", "src"), Set(s1.path), Seq(rewrite))
      .stageAppend(Seq("it_txf", "idx"), Seq(fileFor(locI, "i1b")))
      .commit()
    val srcLoaded = catalog.loadTable(Seq("it_txf", "src"))
    val srcTable = new graft.spark.IcebergTable(srcLoaded.metadata.location,
      srcLoaded.metadataLocation, srcLoaded.metadata,
      graft.spark.IOConfig.fileIO(srcLoaded.ioProps),
      ioProps = srcLoaded.ioProps)
    val paths = srcTable.newScan().planFiles().map(_.file.path)
    assert(paths.exists(_.endsWith("s1-rewrite.parquet")), paths)
    assert(!paths.contains(s1.path), "replaced file must leave the live set")
    val srcSnap2 = catalog.loadTable(Seq("it_txf", "src"))
      .metadata.currentSnapshotId

    // a concurrent commit to ONE member between stage and commit rolls
    // back the WHOLE transaction — the other member must not move either
    val tx = graft.spark.TableWriter.transaction(catalog)
      .stageAppend(Seq("it_txf", "src"), Seq(fileFor(locS, "s2")))
      .stageAppend(Seq("it_txf", "idx"), Seq(fileFor(locI, "i2")))
    graft.spark.TableWriter.appendFilesRest(catalog, Seq("it_txf", "idx"),
      Seq(fileFor(locI, "sneak")))
    intercept[CommitConflictError](tx.commit())
    assert(catalog.loadTable(Seq("it_txf", "src"))
      .metadata.currentSnapshotId == srcSnap2,
      "src must not advance when the transaction rolled back")
  }

  test("vended credentials: delegation handshake, per-table creds, expiry refresh") {
    catalog.createNamespace(Seq("it_vc"))
    catalog.createTable(Seq("it_vc", "t1"), schema)
    catalog.createTable(Seq("it_vc", "t2"), schema)

    val l1 = catalog.loadTable(Seq("it_vc", "t1"))
    // the client opted into access delegation on the load
    assert(server.lastAccessDelegation.contains("vended-credentials"))
    // longest-prefix match: THIS table's credential wins over the decoy
    // prefix the server also vends
    assert(l1.ioProps("s3.access-key-id") == "vended-key-it_vc-t1")
    assert(l1.ioProps("s3.secret-access-key") == "vended-secret-it_vc-t1")
    // ...and each table gets ITS OWN credential
    val l2 = catalog.loadTable(Seq("it_vc", "t2"))
    assert(l2.ioProps("s3.access-key-id") == "vended-key-it_vc-t2")

    // the vended credential reaches the Hadoop conf scans/writes build
    // from (the IOConfig property map, same path as s3a executor reads)
    val hc = graft.spark.IOConfig.hadoopConf(l1.ioProps)
    assert(hc("fs.s3a.access.key") == "vended-key-it_vc-t1")
    assert(hc("fs.s3a.secret.key") == "vended-secret-it_vc-t1")

    // live credentials: the fresh-load hook reuses the cached handle
    val before = server.loadCounts(("it_vc", "t1"))
    val reused = catalog.loadTableFresh(Seq("it_vc", "t1"), Some(l1))
    assert(reused == l1 && server.loadCounts(("it_vc", "t1")) == before)

    // expired credentials: the hook must RE-LOAD for fresh ones
    server.vendedExpiryMs = Some(System.currentTimeMillis() - 1000)
    val expired = catalog.loadTable(Seq("it_vc", "t1"))
    assert(expired.credentialsExpired(System.currentTimeMillis()))
    server.vendedExpiryMs = None // server rotates to fresh creds
    val refreshed = catalog.loadTableFresh(Seq("it_vc", "t1"), Some(expired))
    assert(!refreshed.credentialsExpired(System.currentTimeMillis()))
    assert(server.loadCounts(("it_vc", "t1")) == before + 2)
  }

  test("invalidated bearer token self-heals by re-minting from credentials") {
    catalog.createNamespace(Seq("it_auth"))
    // a SECOND client authenticating invalidates our token server-side
    // (the test server issues exactly one live token)
    Catalog.load("other", server.uri,
      Map(RestCatalog.KeyCredential -> "graft-ci:s3cr3t"))
    // our next request would 401 — the client re-mints once and succeeds
    assert(catalog.listNamespaces().contains(Seq("it_auth")))
  }

  test("config merge applied: server defaults lose to props, overrides win") {
    // the catalog came up against a server returning defaults+overrides;
    // reaching any authorized endpoint proves the OAuth token was minted
    // and attached — and namespace state persists across requests
    assert(catalog.listNamespaces().nonEmpty)
  }
}
