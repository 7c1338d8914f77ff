package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.core._

/** Server-side scan planning over a LIVE REST catalog (the spec's
  * `plan`/`tasks` routes): file enumeration moves to the catalog service
  * while the engine keeps every downstream behavior — MoR delete matching,
  * stats-driven pruning, partition tuples for SPJ, CBO statistics. The
  * server serializes spec `FileScanTask`/`ContentFile` JSON hand-rolled
  * with jackson and the client parses it with its own codecs, so the two
  * sides meet only on the wire format.
  *
  * Every refusal path must fall back to driver-side planning and stay
  * CORRECT: capability not advertised, inexpressible filter, commit-path
  * scans that need manifest provenance, and a dead/failing server. */
class RestScanPlanningSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark

  private val server = new TestRestCatalogServer("graft-ci", "s3cr3t")
  private lazy val catalog: RestCatalog = {
    server.start()
    Catalog.load("plan-it", server.uri,
      Map(RestCatalog.KeyCredential -> "graft-ci:s3cr3t"))
      .asInstanceOf[RestCatalog]
  }

  override def afterAll(): Unit = server.stop()

  private def ensureNs(ns: String): Unit =
    try catalog.createNamespace(Seq(ns))
    catch { case _: AlreadyExistsError => }

  /** cat-partitioned V2 table with TWO files per category plus MoR
    * positional AND equality deletes — the planner output that must
    * survive the wire. Registered under `pp.<name>`. */
  private def mkRest(name: String): (Seq[String], IcebergTable) = {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory(s"rest_plan_$name").toFile.getPath
    val mk = (lo: Long, hi: Long) =>
      (lo until hi).map(i => (i, s"c${i % 3}", i * 1.0)).toDF("id", "cat", "v")
    var t = TableWriter.create(mk(0L, 120L), loc,
      partitionBy = Seq("cat" -> IdentityTransform))
    t = TableWriter.append(t, mk(120L, 240L))
    t = TableWriter.deleteWhere(t, s, col("id") % 10 === 3)
    t = TableWriter.deleteEquality(t, Seq(7L, 55L).toDF("id"), Seq("id"))
    ensureNs("pp")
    val ident = Seq("pp", name)
    catalog.registerTable(ident, t.metadataPath)
    (ident, IcebergTables.load(loc))
  }

  private def loadPlanned(ident: Seq[String]): IcebergTable =
    TableWriter.restTableOf(catalog.loadTable(ident), catalog)

  private def taskKey(t: FileScanTask): String =
    Seq(t.file.path, t.file.recordCount,
      t.file.partition.toSeq.sortBy(_._1).toString,
      // deletes keyed by blob coordinates too: DVs share one Puffin path
      t.deleteFiles.map(d => (d.path, d.contentOffset, d.contentSizeInBytes,
        d.referencedDataFile).toString).sorted.mkString("|")).mkString("#")

  private def rows(t: IcebergTable,
                   filter: BooleanExpression = AlwaysTrue): Seq[(Long, String)] =
    t.newScan(filter).toDF(spark).orderBy("id")
      .select("id", "cat").collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("capability discovery: the live server advertises the plan plane") {
    assert(catalog.endpoints.nonEmpty)
    assert(catalog.supportsScanPlanning)
  }

  test("inline plan parity: tasks, partitions, deletes, stats and rows " +
      "match the driver-side planner") {
    val (ident, local) = mkRest("inline")
    val remote = loadPlanned(ident)
    assert(remote.remotePlanner.isDefined)

    val before = server.planRequests
    val remoteTasks = remote.newScan().planFiles()
    assert(server.planRequests == before + 1, "plan must go through the server")
    val localTasks = local.newScan().planFiles()
    assert(remoteTasks.map(taskKey).sorted == localTasks.map(taskKey).sorted)
    // wire-carried stats are decode-equal: bounds prune identically below,
    // and split offsets / sort ids survive verbatim
    val rt = remoteTasks.sortBy(_.file.path); val lt = localTasks.sortBy(_.file.path)
    rt.zip(lt).foreach { case (r, l) =>
      assert(r.file.splitOffsets == l.file.splitOffsets)
      assert(r.file.sortOrderId == l.file.sortOrderId)
      assert(r.file.lowerBounds.keySet == l.file.lowerBounds.keySet)
      r.file.lowerBounds.foreach { case (id, b) =>
        assert(java.util.Arrays.equals(b, l.file.lowerBounds(id)),
          s"lower bound drift on field $id of ${r.file.path}")
      }
      r.file.upperBounds.foreach { case (id, b) =>
        assert(java.util.Arrays.equals(b, l.file.upperBounds(id)),
          s"upper bound drift on field $id of ${r.file.path}")
      }
      assert(r.file.nullValueCounts == l.file.nullValueCounts)
      assert(r.specId == l.specId)
    }
    // MoR deletes ride delete-file-references: rows equal under deletes
    val got = rows(remote)
    assert(got == rows(local))
    assert(!got.exists(_._1 == 7L) && !got.exists(_._1 == 13L),
      "equality (7) and positional (13) deletes must both apply")
  }

  test("server-side pruning: a pushed filter shrinks the planned file set") {
    val (ident, local) = mkRest("prune")
    val remote = loadPlanned(ident)
    val all = remote.newScan().planFiles()
    val filter = Expr.equalTo("cat", StrLit("c1"))
    val pruned = remote.newScan(filter).planFiles()
    assert(pruned.size < all.size)
    assert(pruned.map(taskKey).sorted ==
      local.newScan(filter).planFiles().map(taskKey).sorted)
    assert(rows(remote, filter) == rows(local, filter))
  }

  test("async handshake: submitted plan polls to completion") {
    val (ident, local) = mkRest("async")
    val remote = loadPlanned(ident)
    server.planMode = "async"
    server.asyncPollsBeforeReady = 2
    val polls = server.planPolls
    try {
      val remoteTasks = remote.newScan().planFiles()
      assert(server.planPolls >= polls + 2, "client must poll plan status")
      assert(remoteTasks.map(taskKey).sorted ==
        local.newScan().planFiles().map(taskKey).sorted)
      assert(rows(remote) == rows(local))
    } finally server.planMode = "inline"
  }

  test("chunked plan-tasks: the opaque task queue drains over POST tasks") {
    val (ident, local) = mkRest("chunked")
    val remote = loadPlanned(ident)
    server.planMode = "chunked"
    server.planTaskChunkSize = 2
    val fetches = server.taskFetches
    try {
      val remoteTasks = remote.newScan().planFiles()
      assert(server.taskFetches > fetches, "plan-tasks must be fetched")
      assert(remoteTasks.map(taskKey).sorted ==
        local.newScan().planFiles().map(taskKey).sorted)
      assert(rows(remote) == rows(local))
    } finally server.planMode = "inline"
  }

  test("V3 deletion vectors ride content-offset/size references") {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("rest_plan_dv").toFile.getPath
    val src = (0L until 100L).map(i => (i, i * 2.0)).toDF("id", "v").repartition(3)
    val local = TableWriter.deleteWhereDv(TableWriter.create(src, loc),
      s, col("id") % 7 === 0)
    assert(local.metadata.formatVersion == 3)
    ensureNs("pp")
    catalog.registerTable(Seq("pp", "dv"), local.metadataPath)
    val remote = loadPlanned(Seq("pp", "dv"))
    val remoteTasks = remote.newScan().planFiles()
    val dvs = remoteTasks.flatMap(_.deleteFiles).filter(_.isDeletionVector)
    assert(dvs.nonEmpty, "DV coordinates must survive the wire")
    assert(remoteTasks.map(taskKey).sorted ==
      local.newScan().planFiles().map(taskKey).sorted)
    val got = remote.newScan().toDF(s).select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 100L).filterNot(_ % 7 == 0))
  }

  test("time travel pins the snapshot server-side") {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("rest_plan_tt").toFile.getPath
    val t1 = TableWriter.create(
      (0L until 10L).map(i => (i, "a")).toDF("id", "tag"), loc)
    val t2 = TableWriter.append(t1,
      (10L until 20L).map(i => (i, "b")).toDF("id", "tag"))
    ensureNs("pp")
    catalog.registerTable(Seq("pp", "tt"), t2.metadataPath)
    val remote = loadPlanned(Seq("pp", "tt"))
    val first = t2.metadata.snapshots.head.snapshotId
    val before = server.planRequests
    val got = remote.newScan(snapshotId = Some(first)).toDF(s)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(server.planRequests > before)
    assert(got.toSeq == (0L until 10L))
  }

  test("incremental plan (start/end-snapshot-id) matches the local " +
      "changefeed walk") {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("rest_plan_incr").toFile.getPath
    var t = TableWriter.create(
      (0L until 10L).map(i => (i, "w0")).toDF("id", "w"), loc)
    t = TableWriter.append(t, (10L until 20L).map(i => (i, "w1")).toDF("id", "w"))
    t = TableWriter.append(t, (20L until 30L).map(i => (i, "w2")).toDF("id", "w"))
    ensureNs("pp")
    catalog.registerTable(Seq("pp", "incr"), t.metadataPath)
    val remote = loadPlanned(Seq("pp", "incr"))
    val snaps = t.metadata.snapshots.map(_.snapshotId)
    val before = server.planRequests
    // open window: (first, current]
    val open = remote.remotePlanner.get.planIncremental(snaps.head, None).get
    assert(server.planRequests == before + 1)
    val localOpen = graft.streaming.EventStreams
      .appendedFilesBetween(t, snaps.head, None)
    assert(open.map(_.file.path).sorted == localOpen.map(_.file.path).sorted)
    assert(open.nonEmpty && open.size < t.newScan().planFiles().size)
    // bounded window: (first, second]
    val bounded = remote.remotePlanner.get
      .planIncremental(snaps.head, Some(snaps(1))).get
    val localBounded = graft.streaming.EventStreams
      .appendedFilesBetween(t, snaps.head, Some(snaps(1)))
    assert(bounded.map(_.file.path).sorted ==
      localBounded.map(_.file.path).sorted)
    assert(bounded.size < open.size)
  }

  test("commit-path scans refuse remote planning (manifest provenance)") {
    val (ident, _) = mkRest("commitpath")
    val remote = loadPlanned(ident)
    val before = server.planRequests
    val tasks = remote.newScan(remotePlanningOk = false).planFiles()
    assert(server.planRequests == before, "remotePlanningOk=false must stay local")
    assert(tasks.forall(_.manifestPath.nonEmpty),
      "local planning carries manifest provenance")
    // and server-planned tasks withdraw the provenance claim entirely
    // rather than passing a partial (hence wrong) manifest set downstream
    val remoteTasks = remote.newScan().planFiles()
    assert(remoteTasks.forall(_.manifestPath.isEmpty))
  }

  test("geo bbox predicates have no REST form: serializer refuses, scan " +
      "falls back local") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(RestScanPlanning.expressionToJson(
      Expr.stIntersectsBBox("geom", -10, -10, 10, 10), mapper).isEmpty)
    // and composites containing one are refused whole
    assert(RestScanPlanning.expressionToJson(
      And(Expr.equalTo("id", LongLit(1L)),
        Expr.stIntersectsBBox("geom", -10, -10, 10, 10)), mapper).isEmpty)
  }

  test("capability off: a server without the endpoints gets local planning") {
    val quiet = new TestRestCatalogServer("graft-ci", "s3cr3t")
    quiet.scanPlanningEnabled = false
    quiet.start()
    try {
      val cat = Catalog.load("no-plan", quiet.uri,
        Map(RestCatalog.KeyCredential -> "graft-ci:s3cr3t"))
        .asInstanceOf[RestCatalog]
      assert(!cat.supportsScanPlanning)
      val s = spark
      import s.implicits._
      val loc = Files.createTempDirectory("rest_plan_nocap").toFile.getPath
      val t = TableWriter.create(Seq((1L, "x")).toDF("id", "v"), loc)
      cat.createNamespace(Seq("q"))
      cat.registerTable(Seq("q", "t"), t.metadataPath)
      val remote = TableWriter.restTableOf(cat.loadTable(Seq("q", "t")), cat)
      assert(remote.remotePlanner.isEmpty)
      assert(remote.newScan().toDF(s).count() == 1L)
      assert(quiet.planRequests == 0)
    } finally quiet.stop()
  }

  test("dead server: plan request fails, scan falls back local and stays " +
      "correct") {
    val mortal = new TestRestCatalogServer("graft-ci", "s3cr3t")
    mortal.start()
    try {
      val cat = Catalog.load("mortal", mortal.uri,
        Map(RestCatalog.KeyCredential -> "graft-ci:s3cr3t"))
        .asInstanceOf[RestCatalog]
      val s = spark
      import s.implicits._
      val loc = Files.createTempDirectory("rest_plan_dead").toFile.getPath
      val t = TableWriter.create(
        (0L until 5L).map(i => (i, "x")).toDF("id", "v"), loc)
      cat.createNamespace(Seq("m"))
      cat.registerTable(Seq("m", "t"), t.metadataPath)
      val remote = TableWriter.restTableOf(cat.loadTable(Seq("m", "t")), cat)
      assert(remote.remotePlanner.isDefined)
      mortal.stop()
      val fallbacks = RestScanPlanning.localFallbacks.get()
      assert(remote.newScan().toDF(s).count() == 5L)
      assert(RestScanPlanning.localFallbacks.get() > fallbacks)
    } finally mortal.stop()
  }

  test("DSv2 SQL read through GraftCatalog plans on the server") {
    val (ident, local) = mkRest("sqlread")
    val s = spark
    s.conf.set("spark.sql.catalog.rplan", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.rplan.warehouse",
      Files.createTempDirectory("rplan_wh").toFile.getPath)
    s.conf.set("spark.sql.catalog.rplan.uri", catalog0Uri)
    s.conf.set("spark.sql.catalog.rplan.credential", "graft-ci:s3cr3t")
    val before = server.planRequests
    val got = s.sql(s"SELECT id, cat FROM rplan.pp.sqlread WHERE cat = 'c1' ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(server.planRequests > before, "DSv2 read must plan via the server")
    assert(got == rows(local, Expr.equalTo("cat", StrLit("c1"))))
  }

  private def catalog0Uri: String = { catalog; server.uri }
}
