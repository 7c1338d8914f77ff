package graft.spark

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Per-branch snapshot retention at expiry (Iceberg `expire_snapshots`
  * semantics): a branch's `min-snapshots-to-keep` / `max-snapshot-age-ms`
  * override the caller's global args for that branch's lineage —
  * retention the reference parses (table/refs.go:38-44) but, having no
  * expiry at all, never enforces. */
class ExpireRetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmpDir(name: String): String =
    Files.createTempDirectory(name).toFile.getPath

  import spark.implicits._

  private def one(v: Long) = Seq(v).toDF("id").coalesce(1)

  /** main snapshot + a branch with N staged appends, policy attached. */
  private def branchFixture(loc: String, appends: Int,
                            minKeep: Option[Int],
                            maxAgeMs: Option[Long]): IcebergTable = {
    var t = TableWriter.create(one(0L), loc)
    t = TableWriter.createRef(t, "audit", BranchRef,
      minSnapshotsToKeep = minKeep, maxSnapshotAgeMs = maxAgeMs)
    (1 to appends).foreach { i =>
      t = TableWriter.appendToBranch(t, one(i.toLong), "audit")
    }
    t
  }

  test("branch min-snapshots-to-keep survives an aggressive global expiry") {
    val t = branchFixture(tmpDir("exp_minkeep"), appends = 5,
      minKeep = Some(3), maxAgeMs = None)
    val branchLineage = {
      var cur = t.metadata.snapshotById(t.metadata.refs("audit").snapshotId)
      val b = List.newBuilder[Long]
      while (cur.isDefined) {
        b += cur.get.snapshotId
        cur = cur.get.parentSnapshotId.flatMap(t.metadata.snapshotById)
      }
      b.result()
    }
    assert(branchLineage.length == 6) // 5 staged + the shared main root

    // aggressive: expire EVERYTHING older than now, retain only 1 globally
    val t2 = TableWriter.expireSnapshots(t,
      olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    val kept = t2.metadata.snapshots.map(_.snapshotId).toSet
    // the branch's 3 newest ancestors survive its policy...
    assert(branchLineage.take(3).forall(kept.contains),
      s"branch policy min-snapshots-to-keep=3 must keep its 3 newest, " +
        s"kept=$kept lineage=$branchLineage")
    // ...and its older staged lineage is gone (policy overrides the old
    // keep-whole-unpublished-lineage behavior once a policy is declared)
    assert(branchLineage.slice(3, 5).forall(id => !kept.contains(id)),
      s"staged ancestors beyond min-snapshots-to-keep must expire, kept=$kept")
    // main's own current snapshot is always retained
    assert(kept.contains(t.currentSnapshot.get.snapshotId))
    // the surviving branch still reads (its reachable files intact)
    assert(t2.newScan(ref = Some("audit")).toDF(spark).count() == 6)
  }

  test("branch max-snapshot-age-ms expires its non-HEAD lineage") {
    val t = branchFixture(tmpDir("exp_maxage"), appends = 4,
      minKeep = None, maxAgeMs = Some(0L))
    Thread.sleep(5)
    // global args expire NOTHING by age (olderThanMs=0) and keep plenty
    // globally — only the branch's own age policy can trim here
    val t2 = TableWriter.expireSnapshots(t, olderThanMs = 0L, retainLast = 1)
    val kept = t2.metadata.snapshots.map(_.snapshotId).toSet
    val head = t2.metadata.refs("audit").snapshotId
    assert(kept.contains(head), "branch HEAD is always retained")
    // every non-HEAD staged ancestor aged out under max-snapshot-age-ms=0
    val staged = t.metadata.snapshots.map(_.snapshotId).toSet -
      head - t.currentSnapshot.get.snapshotId
    assert(staged.nonEmpty)
    assert(staged.forall(id => !kept.contains(id)),
      s"staged lineage older than the branch age policy must expire, " +
        s"kept=$kept staged=$staged")
    assert(t2.newScan(ref = Some("audit")).toDF(spark).count() == 5)
  }

  test("a policy-free branch still keeps its whole unpublished lineage") {
    val t = branchFixture(tmpDir("exp_nopolicy"), appends = 4,
      minKeep = None, maxAgeMs = None)
    val before = t.metadata.snapshots.map(_.snapshotId).toSet
    val t2 = TableWriter.expireSnapshots(t,
      olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    assert(t2.metadata.snapshots.map(_.snapshotId).toSet == before,
      "no policy declared: the conservative keep-unpublished-lineage " +
        "behavior is unchanged")
  }

  test("min-snapshots-to-keep on MAIN overrides the global retainLast") {
    val loc = tmpDir("exp_mainkeep")
    var t = TableWriter.create(one(0L), loc)
    (1 to 4).foreach { i => t = TableWriter.append(t, one(i.toLong)) }
    // pin main's own retention at 3 via its ref entry
    t = TableWriter.setRefRetention(t, TableMetadata.MainBranch,
      minSnapshotsToKeep = Some(3), maxSnapshotAgeMs = None)

    val t2 = TableWriter.expireSnapshots(t,
      olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    assert(t2.metadata.snapshots.length == 3,
      s"main's min-snapshots-to-keep=3 must override retainLast=1, " +
        s"got ${t2.metadata.snapshots.length}")
    assert(t2.newScan().toDF(spark).count() == 5)
  }

  test("tags refuse snapshot-retention fields") {
    val loc = tmpDir("exp_tagrefuse")
    val t = TableWriter.create(one(0L), loc)
    intercept[IllegalArgumentException] {
      TableWriter.createRef(t, "pin", TagRef, minSnapshotsToKeep = Some(2))
    }
  }

  test("SQL surface: create_branch WITH retention + set_branch_retention") {
    val wh = Files.createTempDirectory("exp_sqlwh").toFile.getPath
    spark.conf.set("spark.sql.catalog.gret", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gret.warehouse", wh)
    TableWriter.create(one(0L), s"$wh/db/t")
    spark.sql("CALL gret.system.create_branch('db.t', 'audit', 0L, " +
      "min_snapshots_to_keep => 3)")
    val t1 = IcebergTables.load(s"$wh/db/t")
    assert(t1.metadata.refs("audit").minSnapshotsToKeep.contains(3))
    assert(t1.metadata.refs("audit").maxSnapshotAgeMs.isEmpty)

    val row = spark.sql("CALL gret.system.set_branch_retention('db.t', " +
      "'audit', 5, 86400000L)").collect()(0)
    assert(row.getInt(1) == 5 && row.getLong(2) == 86400000L)
    val t2 = IcebergTables.load(s"$wh/db/t")
    assert(t2.metadata.refs("audit").minSnapshotsToKeep.contains(5))
    assert(t2.metadata.refs("audit").maxSnapshotAgeMs.contains(86400000L))
    // clearing: zeros unset the policy
    spark.sql("CALL gret.system.set_branch_retention('db.t', 'audit', 0, 0L)")
    val t3 = IcebergTables.load(s"$wh/db/t")
    assert(t3.metadata.refs("audit").minSnapshotsToKeep.isEmpty)
    // retention on a tag refuses
    spark.sql("CALL gret.system.create_tag('db.t', 'pin', 0L)")
    val e = intercept[Exception] {
      spark.sql("CALL gret.system.set_branch_retention('db.t', 'pin', 2, 0L)")
    }
    assert(e.getMessage.contains("tag"), e.getMessage)
  }

  test("retention fields round-trip through metadata JSON") {
    val t = branchFixture(tmpDir("exp_roundtrip"), appends = 1,
      minKeep = Some(2), maxAgeMs = Some(86400000L))
    val reloaded = IcebergTables.load(t.location)
    val r = reloaded.metadata.refs("audit")
    assert(r.minSnapshotsToKeep.contains(2))
    assert(r.maxSnapshotAgeMs.contains(86400000L))
  }
}
