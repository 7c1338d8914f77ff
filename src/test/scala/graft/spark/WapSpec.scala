package graft.spark

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Write-audit-publish through the SQL surface: with `spark.wap.branch`
  * set, INSERT stages on the branch (main untouched), un-pinned reads
  * audit the staged state, `VERSION AS OF 'main'` still reads published
  * state, and `CALL fast_forward` publishes. Overwrites and row-level DML
  * refuse loudly while a stage is active (they would bypass the audit
  * gate by committing straight to main). */
class WapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withWap[A](branch: String)(body: => A): A = {
    spark.conf.set("spark.wap.branch", branch)
    try body finally spark.conf.unset("spark.wap.branch")
  }

  test("stage on branch, audit, publish via fast_forward") {
    val s = spark
    val wh = Files.createTempDirectory("graft_wap").toFile.getPath
    s.conf.set("spark.sql.catalog.gwap", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gwap.warehouse", wh)
    s.sql("CREATE TABLE gwap.db.t (id BIGINT, v STRING)")
    s.sql("INSERT INTO gwap.db.t VALUES (1, 'a'), (2, 'b')")

    withWap("audit") {
      // no branch yet: un-pinned reads fall back to main
      assert(s.sql("SELECT count(*) FROM gwap.db.t").head().getLong(0) == 2)
      s.sql("INSERT INTO gwap.db.t VALUES (3, 'c'), (4, 'd')")
      // audit read sees the staged rows...
      assert(s.sql("SELECT count(*) FROM gwap.db.t").head().getLong(0) == 4)
      // ...main is untouched, and still explicitly reachable
      assert(s.sql("SELECT count(*) FROM gwap.db.t VERSION AS OF 'main'")
        .head().getLong(0) == 2)
      val t = IcebergTables.load(s"$wh/db/t")
      assert(t.metadata.refs.contains("audit"))
      assert(t.newScan().planFiles().map(_.file.recordCount).sum == 2,
        "main scan must not see staged files")
    }
    // conf unset: back to published state
    assert(s.sql("SELECT count(*) FROM gwap.db.t").head().getLong(0) == 2)

    s.sql("CALL gwap.system.fast_forward('db.t', 'audit')")
    assert(s.sql("SELECT count(*) FROM gwap.db.t").head().getLong(0) == 4)
  }

  test("overwrite and row-level DML refuse while a stage is active") {
    val s = spark
    val wh = Files.createTempDirectory("graft_wap2").toFile.getPath
    s.conf.set("spark.sql.catalog.gwap2", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gwap2.warehouse", wh)
    s.sql("CREATE TABLE gwap2.db.t (id BIGINT, v STRING)")
    s.sql("INSERT INTO gwap2.db.t VALUES (1, 'a')")

    withWap("audit") {
      val e1 = intercept[Exception] {
        s.sql("INSERT OVERWRITE gwap2.db.t VALUES (9, 'z')")
      }
      assert(e1.getMessage.contains("spark.wap.branch") ||
        Option(e1.getCause).exists(_.getMessage.contains("spark.wap.branch")))
      val e2 = intercept[Exception] {
        s.sql("UPDATE gwap2.db.t SET v = 'q' WHERE id % 7 = 1")
      }
      assert(e2.getMessage.contains("spark.wap.branch") ||
        Option(e2.getCause).exists(_.getMessage.contains("spark.wap.branch")))
      val e3 = intercept[Exception] {
        s.sql("DELETE FROM gwap2.db.t WHERE id = 1")
      }
      assert(e3.getMessage.contains("spark.wap.branch") ||
        Option(e3.getCause).exists(_.getMessage.contains("spark.wap.branch")))
    }
    // nothing leaked to main
    assert(s.sql("SELECT count(*) FROM gwap2.db.t").head().getLong(0) == 1)
  }

  private def withWapId[A](id: String)(body: => A): A = {
    spark.conf.set("spark.wap.id", id)
    try body finally spark.conf.unset("spark.wap.id")
  }

  test("wap.id stage-commit: snapshot outside lineage, publish via cherrypick") {
    val s = spark
    val wh = Files.createTempDirectory("graft_wapid").toFile.getPath
    s.conf.set("spark.sql.catalog.gwid", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gwid.warehouse", wh)
    s.sql("CREATE TABLE gwid.db.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.wap.enabled'='true')")
    s.sql("INSERT INTO gwid.db.t VALUES (1, 'a')")

    withWapId("batch-7") {
      s.sql("INSERT INTO gwid.db.t VALUES (2, 'b'), (3, 'c')")
    }
    // main untouched — the stage is invisible without a pin
    assert(s.sql("SELECT count(*) FROM gwid.db.t").head().getLong(0) == 1)
    val t = IcebergTables.load(s"$wh/db/t")
    val staged = t.metadata.snapshots.find(
      _.summary.exists(_.properties.get("wap.id").contains("batch-7")))
    assert(staged.isDefined, "expected a staged snapshot carrying wap.id")
    assert(!t.metadata.currentSnapshotId.contains(staged.get.snapshotId))
    // audit by snapshot id
    assert(s.sql(
      s"SELECT count(*) FROM gwid.db.t VERSION AS OF ${staged.get.snapshotId}")
      .head().getLong(0) == 3)

    // duplicate stage with the same id is refused
    withWapId("batch-7") {
      val e = intercept[Exception] {
        s.sql("INSERT INTO gwid.db.t VALUES (9, 'z')")
      }
      assert(e.getMessage.contains("batch-7") ||
        Option(e.getCause).exists(_.getMessage.contains("batch-7")))
    }

    // publish BY WAP ID (Iceberg's publish_changes verb — the audit
    // pipeline carries the id, not a snapshot id); stamps published-wap-id
    val pub = s.sql("CALL gwid.system.publish_changes('db.t', 'batch-7')").head()
    assert(pub.getLong(0) == staged.get.snapshotId)
    assert(s.sql("SELECT count(*) FROM gwid.db.t").head().getLong(0) == 3)
    val t2 = IcebergTables.load(s"$wh/db/t")
    assert(t2.currentSnapshot.exists(_.summary.exists(
      _.properties.get("published-wap-id").contains("batch-7"))))

    // ...and a re-stage of a PUBLISHED id is also refused
    withWapId("batch-7") {
      val e = intercept[Exception] {
        s.sql("INSERT INTO gwid.db.t VALUES (9, 'z')")
      }
      assert(e.getMessage.contains("batch-7") ||
        Option(e.getCause).exists(_.getMessage.contains("batch-7")))
    }
  }

  test("wap.id without write.wap.enabled commits normally (Iceberg-matching)") {
    val s = spark
    val wh = Files.createTempDirectory("graft_wapid2").toFile.getPath
    s.conf.set("spark.sql.catalog.gwid2", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gwid2.warehouse", wh)
    s.sql("CREATE TABLE gwid2.db.t (id BIGINT)")
    withWapId("whatever") {
      s.sql("INSERT INTO gwid2.db.t VALUES (1)")
    }
    assert(s.sql("SELECT count(*) FROM gwid2.db.t").head().getLong(0) == 1)
  }

  test("wap.id and wap.branch together are refused on a wap-enabled table") {
    val s = spark
    val wh = Files.createTempDirectory("graft_wapid3").toFile.getPath
    s.conf.set("spark.sql.catalog.gwid3", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gwid3.warehouse", wh)
    s.sql("CREATE TABLE gwid3.db.t (id BIGINT) " +
      "TBLPROPERTIES ('write.wap.enabled'='true')")
    withWapId("x") {
      withWap("audit") {
        val e = intercept[Exception] {
          s.sql("INSERT INTO gwid3.db.t VALUES (1)")
        }
        assert(e.getMessage.contains("WAP flavor") ||
          Option(e.getCause).exists(_.getMessage.contains("WAP flavor")))
      }
    }
  }

  test("streaming sink honors WAP: epochs stage on the branch; wap.id refuses") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val loc = Files.createTempDirectory("wap_sink").toFile.getPath
    TableWriter.create(Seq((0L, "seed")).toDF("id", "v"), loc)

    val input = MemoryStream[(Long, String)]
    withWap("audit") {
      val q = input.toDF().toDF("id", "v").writeStream.format("icegopher")
        .option("checkpointLocation",
          Files.createTempDirectory("wap_sink_ck").toFile.getPath)
        .start(loc)
      try {
        input.addData((1L, "a"), (2L, "b"))
        q.processAllAvailable()
      } finally q.stop()
    }
    // main untouched — the epoch staged on the branch
    assert(s.read.format("icegopher").load(loc).count() == 1)
    val t = IcebergTables.load(loc)
    assert(t.metadata.refs.contains("audit"), t.metadata.refs)
    // publish → the staged epoch becomes visible
    TableWriter.fastForward(t, "audit")
    assert(s.read.format("icegopher").load(loc).count() == 3)

    // wap.id stage-commits cannot absorb a stream (every epoch would
    // reuse the id): the sink must refuse, not silently commit to main
    val loc2 = Files.createTempDirectory("wap_sink_id").toFile.getPath
    val t2 = TableWriter.create(Seq((0L, "seed")).toDF("id", "v"), loc2)
    TableWriter.updateProperties(t2, Map("write.wap.enabled" -> "true"), Nil)
    val input2 = MemoryStream[(Long, String)]
    withWapId("epoch-stage") {
      val q2 = input2.toDF().toDF("id", "v").writeStream.format("icegopher")
        .option("checkpointLocation",
          Files.createTempDirectory("wap_sink_ck2").toFile.getPath)
        .start(loc2)
      try {
        input2.addData((1L, "a"))
        val e = intercept[Exception] { q2.processAllAvailable() }
        def msgs(x: Throwable): Seq[String] =
          if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
        assert(msgs(e).exists(_.contains("stage-commit")), msgs(e))
      } finally q2.stop()
    }
    assert(s.read.format("icegopher").load(loc2).count() == 1)
  }

  test("'main' or empty wap branch behaves as unset") {
    val s = spark
    val wh = Files.createTempDirectory("graft_wap3").toFile.getPath
    s.conf.set("spark.sql.catalog.gwap3", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gwap3.warehouse", wh)
    s.sql("CREATE TABLE gwap3.db.t (id BIGINT)")
    withWap("main") {
      s.sql("INSERT INTO gwap3.db.t VALUES (1)")
    }
    // the insert published directly to main
    assert(s.sql("SELECT count(*) FROM gwap3.db.t").head().getLong(0) == 1)
    assert(!IcebergTables.load(s"$wh/db/t").metadata.refs.contains(""))
  }
}
