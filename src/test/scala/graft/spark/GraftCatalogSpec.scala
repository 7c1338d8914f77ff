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

  test("register_table adopts an external table: reads, writes, procedures, drop") {
    val src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    // a real table living OUTSIDE the warehouse
    val external = Files.createTempDirectory("graft_reg_ext").toFile.getPath
    val t0 = TableWriter.create(src, s"$external/regions")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.regdb")

    val row = spark.sql(
      s"""CALL graft.system.register_table('regdb.regions',
         '${t0.metadataPath}')""").collect()(0)
    assert(row.getString(0) == s"$external/regions")
    assert(row.getLong(1) == t0.currentSnapshot.get.snapshotId)

    // reads resolve through the pointer
    assert(spark.sql("SELECT count(*) FROM graft.regdb.regions")
      .collect()(0).getLong(0) == src.count())
    assert(spark.sql("SHOW TABLES IN graft.regdb").collect()
      .map(_.getString(1)).contains("regions"))
    // writes land in the EXTERNAL table directory
    spark.sql(
      "INSERT INTO graft.regdb.regions VALUES (99, 'NOWHERE')")
    assert(spark.sql(
      "SELECT count(*) FROM graft.regdb.regions WHERE r_regionkey = 99")
      .collect()(0).getLong(0) == 1L)
    assert(IcebergTables.load(s"$external/regions").newScan().toDF(spark)
      .count() == src.count() + 1)
    // procedures resolve through the pointer too
    val snaps = spark.sql("SELECT * FROM graft.regdb.regions.snapshots").count()
    assert(snaps >= 2)
    // duplicate registration refuses
    val dup = intercept[Exception](spark.sql(
      s"""CALL graft.system.register_table('regdb.regions',
         '${t0.metadataPath}')"""))
    assert(dup.getMessage.contains("already exists"))
    // DROP removes the catalog ENTRY, never the external table
    spark.sql("DROP TABLE graft.regdb.regions")
    assert(!spark.sql("SHOW TABLES IN graft.regdb").collect()
      .map(_.getString(1)).contains("regions"))
    assert(IcebergTables.load(s"$external/regions").newScan().toDF(spark)
      .count() == src.count() + 1)

    // a STALE metadata file refuses: the pointer tracks the directory
    // (always latest), so registering v1 of a table now at v2 would
    // silently serve a different state than the argument names
    val stale = intercept[Exception](spark.sql(
      s"""CALL graft.system.register_table('regdb.regions2',
         '${t0.metadataPath}')"""))
    assert(stale.getMessage.contains("CURRENT metadata"))
    // an unqualified table argument refuses (a bare namespace here would
    // let DROP TABLE later recursively delete every table under it)
    val bare = intercept[Exception](spark.sql(
      s"CALL graft.system.register_table('regdb', '$external/regions')"))
    assert(bare.getMessage.contains("namespace-qualified"))
    // registering over an existing namespace directory refuses
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.regdb.sub")
    val nsClash = intercept[Exception](spark.sql(
      s"CALL graft.system.register_table('regdb.sub', '$external/regions')"))
    assert(nsClash.getMessage.contains("already exists"))
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

  test("INSERT INTO / INSERT OVERWRITE through the catalog") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db4")
    spark.sql("CREATE TABLE graft.db4.ins (id BIGINT, name STRING)")
    spark.sql("INSERT INTO graft.db4.ins VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT count(*) FROM graft.db4.ins").collect()(0).getLong(0) == 2)
    spark.sql("INSERT INTO graft.db4.ins VALUES (3, 'c')")
    assert(spark.sql("SELECT count(*) FROM graft.db4.ins").collect()(0).getLong(0) == 3)
    // snapshot history: one per insert
    val t = IcebergTables.load(s"$warehouse/db4/ins")
    assert(t.metadata.snapshots.size == 2)

    spark.sql("INSERT OVERWRITE graft.db4.ins VALUES (9, 'z')")
    val rows = spark.sql("SELECT id, name FROM graft.db4.ins").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 9)
    // previous data still reachable by time travel
    val t2 = IcebergTables.load(s"$warehouse/db4/ins")
    val prevSnap = t2.metadata.snapshots(1).snapshotId
    assert(t2.newScan(snapshotId = Some(prevSnap)).toDF(spark).count() == 3)
  }

  test("DELETE FROM commits merge-on-read tombstones") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db5")
    spark.sql("CREATE TABLE graft.db5.d (id BIGINT, grp STRING)")
    spark.sql("INSERT INTO graft.db5.d VALUES (1,'a'), (2,'b'), (3,'a'), (4,'c')")
    spark.sql("DELETE FROM graft.db5.d WHERE grp = 'a'")
    val tdbg = IcebergTables.load(s"$warehouse/db5/d")
    assert(tdbg.metadata.snapshots.size == 2,
      s"snapshots=${tdbg.metadata.snapshots.map(_.summary)}")
    val rows = spark.sql("SELECT id FROM graft.db5.d ORDER BY id").collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(2L, 4L))
    // it was a MoR commit (delete files present), not a rewrite
    val t = IcebergTables.load(s"$warehouse/db5/d")
    assert(t.currentSnapshot.flatMap(_.summary).map(_.operation)
      .contains(graft.core.OpDelete))
    assert(t.newScan().planFiles().exists(_.deleteFiles.nonEmpty))
  }

  test("equality deletes apply through SQL reads even with pruned projection") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db6")
    spark.sql("CREATE TABLE graft.db6.e (id BIGINT, grp STRING)")
    spark.sql("INSERT INTO graft.db6.e VALUES (1,'a'), (2,'b'), (3,'a')")
    val t = IcebergTables.load(s"$warehouse/db6/e")
    TableWriter.deleteEquality(t, Seq("a").toDF("grp"), Seq("grp"))
    // projection does NOT include grp — the reader must still fetch it to
    // apply the tombstones
    val ids = spark.sql("SELECT id FROM graft.db6.e ORDER BY id").collect().map(_.getLong(0))
    assert(ids.toSeq == Seq(2L))
    // RENAME the key column: delete files on disk still carry the OLD
    // name — matching must resolve it by field-id name history
    spark.sql("ALTER TABLE graft.db6.e RENAME COLUMN grp TO category")
    val ids2 = spark.sql("SELECT id FROM graft.db6.e ORDER BY id").collect().map(_.getLong(0))
    assert(ids2.toSeq == Seq(2L), "eq-delete must survive a key-column rename")
    assert(spark.sql("SELECT id FROM graft.db6.e WHERE category = 'b'")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db7")
    spark.sql("CREATE TABLE graft.db7.tt (id BIGINT)")
    spark.sql("INSERT INTO graft.db7.tt VALUES (1), (2)")
    val afterFirst = IcebergTables.load(s"$warehouse/db7/tt")
    val firstSnap = afterFirst.currentSnapshot.get.snapshotId
    Thread.sleep(5) // distinct commit timestamps
    spark.sql("INSERT INTO graft.db7.tt VALUES (3)")

    assert(spark.sql("SELECT count(*) FROM graft.db7.tt").collect()(0).getLong(0) == 3)
    assert(spark.sql(s"SELECT count(*) FROM graft.db7.tt VERSION AS OF $firstSnap")
      .collect()(0).getLong(0) == 2)
    // a tag name resolves as a version too
    TableWriter.createRef(IcebergTables.load(s"$warehouse/db7/tt"), "v1", graft.core.TagRef,
      Some(firstSnap))
    assert(spark.sql("SELECT count(*) FROM graft.db7.tt VERSION AS OF 'v1'")
      .collect()(0).getLong(0) == 2)
    // timestamp pinned between the two commits sees only the first
    val tsMs = afterFirst.currentSnapshot.get.timestampMs
    val ts = java.time.Instant.ofEpochMilli(tsMs)
    assert(spark.sql(s"SELECT count(*) FROM graft.db7.tt TIMESTAMP AS OF '$ts'")
      .collect()(0).getLong(0) == 2)
  }

  test("ALTER TABLE ADD COLUMN and SET/UNSET TBLPROPERTIES") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db8")
    spark.sql("CREATE TABLE graft.db8.ev (id BIGINT)")
    spark.sql("INSERT INTO graft.db8.ev VALUES (1), (2)")
    val firstSnap = IcebergTables.load(s"$warehouse/db8/ev").currentSnapshot.get.snapshotId

    spark.sql("ALTER TABLE graft.db8.ev ADD COLUMN score DOUBLE")
    // old rows read with nulls in the new column
    val rows = spark.sql("SELECT id, score FROM graft.db8.ev ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.forall(_.isNullAt(1)))
    spark.sql("INSERT INTO graft.db8.ev VALUES (3, 0.5)")
    assert(spark.sql("SELECT count(*) FROM graft.db8.ev WHERE score IS NOT NULL")
      .collect()(0).getLong(0) == 1)
    // old-snapshot time travel resolves the OLD schema (no score column)
    val old = spark.sql(s"SELECT * FROM graft.db8.ev VERSION AS OF $firstSnap")
    assert(old.columns.toSeq == Seq("id"))
    assert(old.count() == 2)

    spark.sql("ALTER TABLE graft.db8.ev SET TBLPROPERTIES ('write.target-size'='512m', 'x'='1')")
    assert(IcebergTables.load(s"$warehouse/db8/ev").properties("write.target-size") == "512m")
    spark.sql("ALTER TABLE graft.db8.ev UNSET TBLPROPERTIES ('x')")
    val props = IcebergTables.load(s"$warehouse/db8/ev").properties
    assert(props.get("x").isEmpty && props("write.target-size") == "512m")
  }

  test("ALTER TABLE RENAME/DROP COLUMN: id-based resolution over old files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db8b")
    spark.sql("CREATE TABLE graft.db8b.rn (id BIGINT, amount DOUBLE, note STRING)")
    spark.sql("INSERT INTO graft.db8b.rn VALUES (1, 1.5, 'a'), (2, 2.5, 'b')")
    val firstSnap = IcebergTables.load(s"$warehouse/db8b/rn").currentSnapshot.get.snapshotId

    // rename: files written under the OLD name must still resolve by field id
    spark.sql("ALTER TABLE graft.db8b.rn RENAME COLUMN amount TO price")
    val rows = spark.sql("SELECT id, price FROM graft.db8b.rn ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 1.5), (2L, 2.5)))
    // filters on the renamed column reach the old files too
    assert(spark.sql("SELECT count(*) FROM graft.db8b.rn WHERE price > 2.0")
      .collect()(0).getLong(0) == 1)
    // new writes use the new name; reads mix old- and new-name files
    spark.sql("INSERT INTO graft.db8b.rn VALUES (3, 3.5, 'c')")
    assert(spark.sql("SELECT sum(price) FROM graft.db8b.rn").collect()(0).getDouble(0) == 7.5)
    // time travel to the pre-rename snapshot resolves the OLD name
    val old = spark.sql(s"SELECT * FROM graft.db8b.rn VERSION AS OF $firstSnap")
    assert(old.columns.toSeq == Seq("id", "amount", "note"))
    assert(old.count() == 2)

    // drop: column disappears from current reads, survives in old snapshots
    spark.sql("ALTER TABLE graft.db8b.rn DROP COLUMN note")
    assert(spark.sql("SELECT * FROM graft.db8b.rn").columns.toSeq == Seq("id", "price"))
    assert(spark.sql(s"SELECT note FROM graft.db8b.rn VERSION AS OF $firstSnap")
      .collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    // renaming to an existing name is rejected
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.db8b.rn RENAME COLUMN price TO id")
    }
  }

  test("NESTED schema evolution: ADD/RENAME/DROP on a.b.c struct paths") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db19")
    spark.sql("CREATE TABLE graft.db19.n (id BIGINT, " +
      "info STRUCT<name: STRING, geo: STRUCT<lat: DOUBLE, lon: DOUBLE>>)")
    spark.sql("INSERT INTO graft.db19.n VALUES " +
      "(1, named_struct('name', 'a', 'geo', named_struct('lat', 1.0, 'lon', 2.0)))")

    // add a field to a doubly-nested struct: fresh id, old file reads null
    spark.sql("ALTER TABLE graft.db19.n ADD COLUMN info.geo.alt DOUBLE")
    val t1 = IcebergTables.load(s"$warehouse/db19/n")
    val altField = t1.schema.findFieldByName("info.geo.alt")
    assert(altField.isDefined && altField.get.id > 5,
      s"nested add must allocate a fresh id above existing ones: $altField")
    val r1 = spark.sql("SELECT id, info.geo.alt FROM graft.db19.n").collect()
    assert(r1.length == 1 && r1.head.isNullAt(1))

    // write a row carrying the new nested field
    spark.sql("INSERT INTO graft.db19.n VALUES (2, named_struct('name', 'b', " +
      "'geo', named_struct('lat', 3.0, 'lon', 4.0, 'alt', 5.0)))")

    // rename the nested field: files written under the OLD name (and the
    // new one) must both resolve by field id
    spark.sql("ALTER TABLE graft.db19.n RENAME COLUMN info.geo.lat TO latitude")
    val rows = spark.sql(
      "SELECT id, info.geo.latitude, info.geo.alt FROM graft.db19.n ORDER BY id")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1),
      Option(r.get(2)))).toSeq ==
      Seq((1L, 1.0, None), (2L, 3.0, Some(5.0))),
      rows.mkString(","))
    // filters on the renamed nested field reach old files
    assert(spark.sql(
      "SELECT count(*) FROM graft.db19.n WHERE info.geo.latitude < 2.0")
      .collect()(0).getLong(0) == 1)

    // drop a nested member: disappears from the schema, siblings survive
    spark.sql("ALTER TABLE graft.db19.n DROP COLUMN info.geo.lon")
    val t2 = IcebergTables.load(s"$warehouse/db19/n")
    assert(t2.schema.findFieldByName("info.geo.lon").isEmpty)
    assert(t2.schema.findFieldByName("info.geo.latitude").isDefined)
    val afterDrop = spark.sql("SELECT id, info.geo.* FROM graft.db19.n ORDER BY id")
    assert(afterDrop.columns.toSeq == Seq("id", "latitude", "alt"))
    assert(afterDrop.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.0), (2L, 3.0)))

    // sibling-name collision is rejected; unrelated-scope same name is fine
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.db19.n RENAME COLUMN info.geo.alt TO latitude")
    }
    spark.sql("ALTER TABLE graft.db19.n RENAME COLUMN info.geo.alt TO id")
    assert(IcebergTables.load(s"$warehouse/db19/n")
      .schema.findFieldByName("info.geo.id").isDefined)

    // ADD COLUMN of a whole STRUCT: every id in the subtree is assigned
    // fresh above last-column-id; old rows read the struct as null
    spark.sql("ALTER TABLE graft.db19.n ADD COLUMN " +
      "meta STRUCT<source: STRING, tags: ARRAY<STRING>>")
    val t3 = IcebergTables.load(s"$warehouse/db19/n")
    val metaId = t3.schema.findFieldByName("meta").get.id
    val srcId = t3.schema.findFieldByName("meta.source").get.id
    val tagsId = t3.schema.findFieldByName("meta.tags").get.id
    assert(metaId < srcId && srcId < tagsId, s"ids $metaId/$srcId/$tagsId")
    assert(t3.metadata.lastColumnId >= tagsId + 1, // +1: the list element id
      s"last-column-id ${t3.metadata.lastColumnId} must cover the subtree")
    spark.sql("INSERT INTO graft.db19.n VALUES (3, " +
      "named_struct('name', 'c', 'geo', named_struct('latitude', 6.0, 'id', 7.0)), " +
      "named_struct('source', 'web', 'tags', array('x', 'y')))")
    val withMeta = spark.sql(
      "SELECT id, meta.source, meta.tags FROM graft.db19.n ORDER BY id").collect()
    assert(withMeta.map(r => Option(r.getString(1))).toSeq ==
      Seq(None, None, Some("web")))
    assert(withMeta(2).getSeq[String](2) == Seq("x", "y"))
  }

  test("SQL graft_bpe_count counts tokens under the configured merges file") {
    import graft.spark.functions.{Bpe, GraftFunctions}
    // a tiny pretrained-format merges file: 'a b' then 'ab c'
    val mergesFile = Files.createTempFile("merges", ".txt")
    Files.writeString(mergesFile, "#version: 0.2\na b\nab c\n")
    spark.conf.set(GraftFunctions.BpeMergesPathConf, mergesFile.toString)
    try {
      // 'abc' -> [abc] (1 token), 'abd' -> [ab, d] (2), 'xyz' -> 3 chars
      val n = spark.sql(
        "SELECT graft.system.graft_bpe_count('abc abd xyz')").collect()(0).getLong(0)
      assert(n == 6L, s"expected 1+2+3 tokens, got $n")
      // agrees with the library encoder on arbitrary text
      val merges = Bpe.loadMerges(mergesFile.toString)
      val text = "aab abc cab"
      val viaSql = spark.sql(s"SELECT graft.system.graft_bpe_count('$text')")
        .collect()(0).getLong(0)
      assert(viaSql == Bpe.countText(text, merges))
      // over a table column, not just literals
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db27")
      spark.sql("CREATE TABLE graft.db27.bpe (id BIGINT, txt STRING)")
      spark.sql("INSERT INTO graft.db27.bpe VALUES (1, 'abc'), (2, 'abc abd')")
      val rows = spark.sql(
        "SELECT id, graft.system.graft_bpe_count(txt) AS n FROM graft.db27.bpe ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((1L, 1L), (2L, 3L)))
      // standard scalar null semantics: NULL in -> NULL out
      assert(spark.sql(
        "SELECT graft.system.graft_bpe_count(CAST(NULL AS STRING))")
        .collect()(0).isNullAt(0))
    } finally spark.conf.unset(GraftFunctions.BpeMergesPathConf)
  }

  test("ALTER NAMESPACE SET/UNSET PROPERTIES round trips via disk") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db12")
    spark.sql("ALTER NAMESPACE graft.db12 SET PROPERTIES ('retention'='30d', 'team'='data')")
    def props(): String = spark.sql("DESCRIBE NAMESPACE EXTENDED graft.db12")
      .collect().map(r => s"${r.getString(0)}=${r.getString(1)}").mkString("; ")
    assert(props().contains("retention") && props().contains("30d"), props())
    assert(props().contains("team"), props())
    spark.sql("ALTER NAMESPACE graft.db12 UNSET PROPERTIES ('team')")
    assert(!props().contains("team"), props())
    assert(props().contains("retention"), props())
    // the properties file is not mistaken for a table
    assert(!spark.sql("SHOW TABLES IN graft.db12").collect()
      .exists(_.getString(1).contains("namespace")))
  }

  test("DROP COLUMN then ADD COLUMN with the same name does not resurrect data") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db18")
    spark.sql("CREATE TABLE graft.db18.rz (id BIGINT, tag STRING)")
    spark.sql("INSERT INTO graft.db18.rz VALUES (1, 'old1'), (2, 'old2')")
    spark.sql("ALTER TABLE graft.db18.rz DROP COLUMN tag")
    spark.sql("ALTER TABLE graft.db18.rz ADD COLUMN tag STRING")
    // the re-added column has a NEW field id — files written under the old
    // id must read as null, not leak the dropped values
    val rows = spark.sql("SELECT id, tag FROM graft.db18.rz ORDER BY id").collect()
    assert(rows.forall(_.isNullAt(1)),
      s"dropped values resurrected: ${rows.mkString(",")}")
    spark.sql("INSERT INTO graft.db18.rz VALUES (3, 'new3')")
    val mixed = spark.sql("SELECT id, tag FROM graft.db18.rz ORDER BY id").collect()
    assert(mixed.map(r => Option(r.getString(1))).toSeq ==
      Seq(None, None, Some("new3")))
  }

  test("ALTER COLUMN COMMENT and DROP NOT NULL; optional→required refused") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db21")
    spark.sql("CREATE TABLE graft.db21.c (id BIGINT NOT NULL, v STRING)")
    spark.sql("ALTER TABLE graft.db21.c ALTER COLUMN v COMMENT 'the value'")
    val t1 = IcebergTables.load(s"$warehouse/db21/c")
    assert(t1.schema.findFieldByName("v").get.doc.contains("the value"))
    // required -> optional is legal
    spark.sql("ALTER TABLE graft.db21.c ALTER COLUMN id DROP NOT NULL")
    val t2 = IcebergTables.load(s"$warehouse/db21/c")
    assert(!t2.schema.findFieldByName("id").get.required)
    // widening back is refused — Spark's analyzer catches it before the
    // catalog; the catalog-level guard covers library callers
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graft.db21.c ALTER COLUMN id SET NOT NULL"))
    assert(e.getMessage.contains("non-nullable"), e.getMessage)
    val e2 = intercept[UnsupportedOperationException](
      TableWriter.updateColumnNullabilityAt(
        IcebergTables.load(s"$warehouse/db21/c"), Seq("id"), nullable = false))
    assert(e2.getMessage.contains("required"), e2.getMessage)
  }

  test("ALTER COLUMN TYPE: int→long / float→double over existing files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db15")
    spark.sql("CREATE TABLE graft.db15.w (id INT, score FLOAT)")
    spark.sql("INSERT INTO graft.db15.w VALUES (1, CAST(1.5 AS FLOAT)), (2, CAST(2.5 AS FLOAT))")
    val firstSnap = IcebergTables.load(s"$warehouse/db15/w").currentSnapshot.get.snapshotId

    spark.sql("ALTER TABLE graft.db15.w ALTER COLUMN id TYPE BIGINT")
    spark.sql("ALTER TABLE graft.db15.w ALTER COLUMN score TYPE DOUBLE")
    // old narrow files decode widened
    val df = spark.sql("SELECT id, score FROM graft.db15.w ORDER BY id")
    assert(df.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(df.schema("score").dataType == org.apache.spark.sql.types.DoubleType)
    assert(df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.5), (2L, 2.5)))
    // new writes exceed the old width; reads mix file widths
    spark.sql("INSERT INTO graft.db15.w VALUES (3000000000, 3.5)")
    assert(spark.sql("SELECT sum(id) FROM graft.db15.w").collect()(0).getLong(0) ==
      3000000003L)
    // filter on the promoted column prunes/reads old-width stats safely
    assert(spark.sql("SELECT count(*) FROM graft.db15.w WHERE id > 1")
      .collect()(0).getLong(0) == 2)
    // time travel resolves the pre-promotion types
    val old = spark.sql(s"SELECT * FROM graft.db15.w VERSION AS OF $firstSnap")
    assert(old.schema("id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(old.count() == 2)
    // narrowing is rejected
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.db15.w ALTER COLUMN id TYPE INT")
    }
    // the library read path (MoR delete, compaction) also widens old files
    spark.sql("DELETE FROM graft.db15.w WHERE id = 1")
    assert(spark.sql("SELECT sum(id) FROM graft.db15.w").collect()(0).getLong(0) ==
      3000000002L)
    TableWriter.compact(IcebergTables.load(s"$warehouse/db15/w"), spark)
    assert(spark.sql("SELECT sum(id) FROM graft.db15.w").collect()(0).getLong(0) ==
      3000000002L)
  }

  test("edge partition values: null, empty, special chars, decimal, date") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db19")
    spark.sql("CREATE TABLE graft.db19.ep (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql(
      "INSERT INTO graft.db19.ep VALUES (1, 'plain'), (2, NULL), (3, 'a b/c=d'), (4, ''), (5, 'ünï©ode')")
    def ids(where: String): Seq[Long] =
      spark.sql(s"SELECT id FROM graft.db19.ep WHERE $where").collect()
        .map(_.getLong(0)).toSeq.sorted
    assert(ids("cat IS NULL") == Seq(2L))
    assert(ids("cat = 'a b/c=d'") == Seq(3L))
    assert(ids("cat = ''") == Seq(4L))
    assert(ids("cat = 'ünï©ode'") == Seq(5L))
    assert(ids("cat IS NOT NULL") == Seq(1L, 3L, 4L, 5L))
    // CoW over a null partition tuple
    spark.sql("UPDATE graft.db19.ep SET id = 20 WHERE cat IS NULL")
    assert(ids("cat IS NULL") == Seq(20L))

    spark.sql(
      "CREATE TABLE graft.db19.dp (id BIGINT, dec DECIMAL(10,2), dt DATE) PARTITIONED BY (dec, dt)")
    spark.sql(
      "INSERT INTO graft.db19.dp VALUES (1, 12.34, DATE '2024-03-01'), (2, 56.78, DATE '2024-03-02')")
    assert(spark.sql("SELECT id FROM graft.db19.dp WHERE dec = 12.34")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql("SELECT id FROM graft.db19.dp WHERE dt > DATE '2024-03-01'")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(spark.sql("SELECT CAST(sum(dec) AS STRING) FROM graft.db19.dp")
      .collect()(0).getString(0) == "69.12")
  }

  test("renaming a partition source column keeps pruning and writes working") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db17")
    spark.sql(
      "CREATE TABLE graft.db17.pr (id BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql("INSERT INTO graft.db17.pr VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE graft.db17.pr RENAME COLUMN cat TO category")
    // writes after the rename resolve the partition source by field id
    spark.sql("INSERT INTO graft.db17.pr VALUES (3, 'a')")
    assert(spark.sql("SELECT count(*) FROM graft.db17.pr").collect()(0).getLong(0) == 3)
    // partition pruning on the NEW name covers files from both eras
    assert(spark.sql("SELECT count(*) FROM graft.db17.pr WHERE category = 'a'")
      .collect()(0).getLong(0) == 2)
    // MoR delete keyed on the renamed partition column
    spark.sql("DELETE FROM graft.db17.pr WHERE category = 'b'")
    assert(spark.sql("SELECT id FROM graft.db17.pr ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("partition spec evolution: add/drop partition field across writes") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db13")
    spark.sql(
      """CREATE TABLE graft.db13.pe (id BIGINT, cat STRING, ts TIMESTAMP_NTZ)
         PARTITIONED BY (cat)""")
    spark.sql(
      """INSERT INTO graft.db13.pe VALUES
         (1, 'a', TIMESTAMP_NTZ '2024-01-01 00:00:00'),
         (2, 'b', TIMESTAMP_NTZ '2024-02-01 00:00:00')""")
    val r = spark.sql(
      "CALL graft.system.add_partition_field('db13.pe', 'ts', 'day')").collect()
    assert(r(0).getInt(0) == 1, "expected new default spec id 1")
    spark.sql(
      "INSERT INTO graft.db13.pe VALUES (3, 'a', TIMESTAMP_NTZ '2024-03-01 00:00:00')")
    // reads span files written under BOTH specs
    assert(spark.sql("SELECT count(*) FROM graft.db13.pe").collect()(0).getLong(0) == 3)
    assert(spark.sql("SELECT count(*) FROM graft.db13.pe WHERE cat = 'a'")
      .collect()(0).getLong(0) == 2)
    // filters on the newly-partitioned column stay correct over old files
    // (old spec can't prune them, inclusive projection must keep them)
    assert(spark.sql(
      """SELECT count(*) FROM graft.db13.pe
         WHERE ts >= TIMESTAMP_NTZ '2024-02-15 00:00:00'""").collect()(0).getLong(0) == 1)
    val t = IcebergTables.load(s"$warehouse/db13/pe")
    assert(t.metadata.partitionSpecs.map(_.specId).sorted == Seq(0, 1))
    assert(t.spec.fields.map(_.transform.repr) == Seq("identity", "day"))
    // CoW across mixed specs: rewritten manifests keep their own spec
    spark.sql("UPDATE graft.db13.pe SET cat = 'c' WHERE id = 1")
    assert(spark.sql("SELECT count(*) FROM graft.db13.pe WHERE cat = 'c'")
      .collect()(0).getLong(0) == 1)
    assert(spark.sql("SELECT count(*) FROM graft.db13.pe WHERE cat = 'a'")
      .collect()(0).getLong(0) == 1)
    // drop the field; new writes stop partitioning on it, reads stay whole
    val fieldName = t.spec.fields.last.name
    val r2 = spark.sql(
      s"CALL graft.system.drop_partition_field('db13.pe', '$fieldName')").collect()
    assert(r2(0).getInt(1) == 1, "one partition field should remain")
    spark.sql(
      "INSERT INTO graft.db13.pe VALUES (4, 'd', TIMESTAMP_NTZ '2024-04-01 00:00:00')")
    assert(spark.sql("SELECT count(*) FROM graft.db13.pe").collect()(0).getLong(0) == 4)
  }

  test("rewrite_sorted clusters files with disjoint sort-key bounds") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db15")
    spark.sql("CREATE TABLE graft.db15.rs (id BIGINT, v DOUBLE)")
    // three unsorted commits with interleaved key ranges
    spark.sql("INSERT INTO graft.db15.rs SELECT id * 7 % 90, CAST(id AS DOUBLE) FROM range(30)")
    spark.sql("INSERT INTO graft.db15.rs SELECT id * 11 % 90 + 1, CAST(id AS DOUBLE) FROM range(30)")
    spark.sql("INSERT INTO graft.db15.rs SELECT id * 13 % 90 + 2, CAST(id AS DOUBLE) FROM range(30)")
    val sum0 = spark.sql("SELECT CAST(SUM(v) AS DOUBLE) FROM graft.db15.rs")
      .collect()(0).getDouble(0)

    val r = spark.sql(
      "CALL graft.system.rewrite_sorted('db15.rs', 3, 'id')").collect()(0)
    assert(r.getInt(1) == 3, s"expected 3 files after, got ${r.getInt(1)}")
    assert(r.getString(2) == "id")
    assert(spark.sql("SELECT CAST(SUM(v) AS DOUBLE) FROM graft.db15.rs")
      .collect()(0).getDouble(0) == sum0, "rewrite must preserve data")

    // disjoint id ranges per file: point lookups prune to one file
    val t = IcebergTables.load(s"$warehouse/db15/rs")
    val hit = t.newScan(
      graft.core.Expr.equalTo("id", graft.core.LongLit(5L))).planFiles()
    assert(hit.size <= 1, s"sorted rewrite should prune to <=1 file, got ${hit.size}")
  }

  test("remove_orphan_files deletes only unreferenced, aged files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db16")
    spark.sql("CREATE TABLE graft.db16.orph (id BIGINT)")
    spark.sql("INSERT INTO graft.db16.orph VALUES (1), (2)")
    val loc = s"$warehouse/db16/orph"
    // a stray file from a crashed write
    val orphan = new java.io.File(s"$loc/data/stray-000.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))

    // inside the grace period: nothing removed
    val r0 = spark.sql(
      s"CALL graft.system.remove_orphan_files('db16.orph', ${orphan.lastModified() - 1000})")
      .collect()(0)
    assert(r0.getInt(0) == 0 && orphan.exists())

    // past the grace period: the orphan goes, referenced data stays
    val r1 = spark.sql(
      s"CALL graft.system.remove_orphan_files('db16.orph', ${System.currentTimeMillis() + 60000})")
      .collect()(0)
    assert(r1.getInt(0) == 1, s"expected 1 orphan removed, got ${r1.getInt(0)}")
    assert(r1.getLong(1) == 3L)
    assert(!orphan.exists())
    assert(spark.sql("SELECT count(*) FROM graft.db16.orph")
      .collect()(0).getLong(0) == 2)
  }

  test("partitions metadata table matches the files rollup across specs") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db14")
    spark.sql(
      """CREATE TABLE graft.db14.pt (id BIGINT, cat STRING)
         PARTITIONED BY (cat)""")
    spark.sql("INSERT INTO graft.db14.pt VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    spark.sql("CALL graft.system.add_partition_field('db14.pt', 'id', 'bucket[4]')")
    spark.sql("INSERT INTO graft.db14.pt VALUES (4, 'a'), (5, 'c')")
    // MoR tombstone so delete_file_count is exercised
    TableWriter.deleteWhere(IcebergTables.load(s"$warehouse/db14/pt"), spark,
      org.apache.spark.sql.functions.col("id") === 2L)

    val spillsBefore = PartitionsMetadataTable.spilledServes.get()
    val got = spark.sql(
      """SELECT partition, spec_id, file_count, record_count,
                total_size_bytes, delete_file_count
         FROM graft.db14.pt.partitions""").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // the rollup is served from executor-written spill files, never via a
    // driver-side collect of per-partition rows
    assert(PartitionsMetadataTable.spilledServes.get() > spillsBefore,
      "partitions rollup must serve through the spilled path")
    val expected = spark.sql(
      """SELECT partition, spec_id, COUNT(*), CAST(SUM(record_count) AS BIGINT),
                CAST(SUM(file_size_in_bytes) AS BIGINT),
                CAST(SUM(delete_files) AS BIGINT)
         FROM graft.db14.pt.files GROUP BY partition, spec_id""").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expected, s"partitions rollup mismatch:\n$got\nvs\n$expected")
    // both specs present, and the old-spec rows carry no bucket dimension
    assert(got.keySet.map(_._2) == Set(0, 1))
    assert(got.exists(_._1._2 == 1), "expected rows under the evolved spec")
    assert(got.values.map(_._4).sum >= 1, "expected a matched delete file")
  }

  test("SQL metadata tables: snapshots/history/refs/files/manifests") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db9")
    spark.sql("CREATE TABLE graft.db9.m (id BIGINT)")
    spark.sql("INSERT INTO graft.db9.m VALUES (1), (2)")
    spark.sql("INSERT INTO graft.db9.m VALUES (3)")

    val snaps = spark.sql(
      "SELECT snapshot_id, operation FROM graft.db9.m.snapshots ORDER BY committed_at_ms")
      .collect()
    assert(snaps.length == 2)
    assert(snaps.forall(_.getString(1) == "append"))
    // commit summaries ride along as a map column
    val sums = spark.sql(
      "SELECT summary['added-data-files'] FROM graft.db9.m.snapshots").collect()
    assert(sums.forall(_.getString(0).toInt >= 1), sums.mkString(","))

    assert(spark.sql("SELECT * FROM graft.db9.m.history").count() == 2)
    val refs = spark.sql("SELECT name, type FROM graft.db9.m.refs").collect()
    assert(refs.exists(r => r.getString(0) == "main" && r.getString(1) == "branch"))
    // `files` is a DISTRIBUTED scan: one input partition per data manifest
    // (two append snapshots → two manifests), entries decoded on executors
    val filesDf = spark.sql("SELECT * FROM graft.db9.m.files")
    assert(filesDf.rdd.getNumPartitions == 2,
      s"files should scan per-manifest, got ${filesDf.rdd.getNumPartitions} partition(s)")
    // row-for-row against the driver-side planFiles surface
    val t = IcebergTables.load(s"$warehouse/db9/m")
    val expected = t.newScan().planFiles().map(ft => (ft.file.path, ft.file.format,
      ft.file.recordCount, ft.file.fileSizeInBytes, ft.deleteFiles.size)).toSet
    val got = filesDf.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getInt(4))).toSet
    assert(got == expected)
    assert(spark.sql("SELECT * FROM graft.db9.m.manifests").count() == 2)
    // aggregations over metadata tables work like any table
    assert(spark.sql(
      "SELECT CAST(sum(record_count) AS BIGINT) FROM graft.db9.m.files")
      .collect()(0).getLong(0) == 3)
    // spec_id + partition repr columns ride along
    assert(spark.sql("SELECT DISTINCT spec_id FROM graft.db9.m.files")
      .collect().map(_.getInt(0)).toSeq == Seq(0))
    assert(spark.sql("SELECT partition FROM graft.db9.m.files")
      .collect().forall(_.getString(0) == "")) // unpartitioned → empty tuple
    // MoR tombstones show up in the executor-side delete matching
    TableWriter.deleteWhere(t, spark, org.apache.spark.sql.functions.col("id") === 1L)
    val withDeletes = spark.sql("SELECT file_path, delete_files FROM graft.db9.m.files")
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    val expectedDel = IcebergTables.load(s"$warehouse/db9/m").newScan().planFiles()
      .map(ft => (ft.file.path, ft.deleteFiles.size)).toMap
    assert(withDeletes == expectedDel)
    assert(withDeletes.values.sum >= 1, "expected at least one matched delete file")
  }

  test("SQL metadata tables: entries/all_files/all_manifests/metadata_log_entries") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db20")
    spark.sql("CREATE TABLE graft.db20.e (id BIGINT)")
    spark.sql("INSERT INTO graft.db20.e VALUES (1), (2)")
    spark.sql("INSERT INTO graft.db20.e VALUES (3)")
    val preCompact = spark.sql("SELECT file_path FROM graft.db20.e.files")
      .collect().map(_.getString(0)).toSet
    // compaction rewrites all files into one; the old ones become
    // DELETED-status entries and history-only files
    spark.sql("CALL graft.system.compact('db20.e', 1)")

    // entries: raw current-snapshot surface, DELETED entries included
    val entries = spark.sql(
      "SELECT status, file_path FROM graft.db20.e.entries").collect()
    assert(entries.count(_.getInt(0) == 2) == preCompact.size,
      s"expected ${preCompact.size} DELETED entries post-compaction, got ${entries.toSeq}")
    assert(entries.count(_.getInt(0) != 2) == 1)
    // sequence numbers inherited, never null on live entries
    assert(spark.sql(
      "SELECT * FROM graft.db20.e.entries WHERE sequence_number IS NULL").count() == 0)

    // all_files: union over snapshots — sees the two pre-compaction files
    // AND the compacted one; current files sees only the latter
    val allPaths = spark.sql("SELECT DISTINCT file_path FROM graft.db20.e.all_files")
      .collect().map(_.getString(0)).toSet
    val curPaths = spark.sql("SELECT file_path FROM graft.db20.e.files")
      .collect().map(_.getString(0)).toSet
    assert(curPaths.size == 1)
    assert(curPaths.subsetOf(allPaths))
    assert(allPaths == preCompact ++ curPaths,
      s"all_files should union historical and current files, got $allPaths")

    // all_manifests: one input partition per snapshot, reference ids ride along
    val am = spark.sql(
      "SELECT reference_snapshot_id, path FROM graft.db20.e.all_manifests")
    assert(am.rdd.getNumPartitions == 3,
      "all_manifests should plan one partition per snapshot")
    val refIds = am.collect().map(_.getLong(0)).toSet
    val snapIds = spark.sql("SELECT snapshot_id FROM graft.db20.e.snapshots")
      .collect().map(_.getLong(0)).toSet
    assert(refIds == snapIds)

    // all_entries: the historical union INCLUDING DELETED-status rows
    val allEntries = spark.sql(
      "SELECT status, file_path FROM graft.db20.e.all_entries").collect()
    assert(allEntries.count(_.getInt(0) == 2) == preCompact.size)
    assert(allEntries.map(_.getString(1)).toSet == allPaths)

    // metadata_log_entries: one row per superseded metadata file + current
    val log = spark.sql(
      "SELECT file, is_current FROM graft.db20.e.metadata_log_entries ORDER BY timestamp_ms")
      .collect()
    assert(log.count(_.getBoolean(1)) == 1)
    assert(log.last.getBoolean(1), "latest entry should be the current metadata file")
    assert(log.length >= 3, s"expected the full metadata lineage, got ${log.toSeq}")
  }

  test("CALL rewrite_manifests coalesces manifests without touching data") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db22")
    spark.sql("CREATE TABLE graft.db22.rm (id BIGINT)")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO graft.db22.rm VALUES ($i)"))
    val before = IcebergTables.load(s"$warehouse/db22/rm")
    val filesBefore = before.newScan().planFiles()
      .map(t => (t.file.path, t.file.recordCount)).toSet
    assert(spark.sql("SELECT * FROM graft.db22.rm.manifests").count() == 4)

    val res = spark.sql("CALL graft.system.rewrite_manifests('db22.rm')").collect()
    assert(res(0).getInt(0) == 4 && res(0).getInt(1) == 1, s"got ${res.toSeq}")

    val after = IcebergTables.load(s"$warehouse/db22/rm")
    // identical file set, same rows, sequence provenance preserved
    assert(after.newScan().planFiles()
      .map(t => (t.file.path, t.file.recordCount)).toSet == filesBefore)
    assert(spark.sql("SELECT * FROM graft.db22.rm").count() == 4)
    assert(spark.sql(
      "SELECT * FROM graft.db22.rm.entries WHERE sequence_number IS NULL")
      .count() == 0)
    // REPLACE snapshot: invisible to the changelog
    val t = IcebergTables.load(s"$warehouse/db22/rm")
    val lastSeq = t.currentSnapshot.get.sequenceNumber
    assert(graft.streaming.Changelog
      .changedFilesInWindow(t, lastSeq - 1, lastSeq).isEmpty)
    // incremental appends still resolve across the rewrite boundary
    spark.sql("INSERT INTO graft.db22.rm VALUES (5)")
    val t2 = IcebergTables.load(s"$warehouse/db22/rm")
    val appended = graft.streaming.EventStreams
      .appendedFilesInWindow(t2, lastSeq, lastSeq + 1)
    assert(appended.size == 1)
  }

  test("CALL add_files imports existing parquet in place, incl. hive partitions") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db25")
    spark.sql("CREATE TABLE graft.db25.imp (id BIGINT, cat STRING) " +
      "PARTITIONED BY (identity(cat))")
    spark.sql("INSERT INTO graft.db25.imp VALUES (1, 'a')")
    // a hive-layout export from some other system
    val src = java.nio.file.Files.createTempDirectory("addfiles").toFile.getPath
    import spark.implicits._
    Seq((2L, "a"), (3L, "b")).toDF("id", "cat")
      .write.partitionBy("cat").parquet(s"$src/export")
    val res = spark.sql(
      s"CALL graft.system.add_files('db25.imp', '$src/export')").collect()
    assert(res(0).getInt(0) == 2 && res(0).getLong(1) == 2, res.toSeq.toString)
    assert(spark.sql("SELECT id FROM graft.db25.imp").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // inferred partition values prune like native ones
    val t = IcebergTables.load(s"$warehouse/db25/imp")
    val pruned = t.newScan(graft.core.Expr.equalTo("cat",
      graft.core.StrLit("b"))).planFiles()
    assert(pruned.size == 1 && pruned.head.file.path.contains("cat=b"))
    // imported files were NOT copied
    assert(pruned.head.file.path.startsWith(src))
  }

  test("position_deletes/delete_files tables + CALL rewrite_position_deletes") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db26")
    spark.sql("CREATE TABLE graft.db26.pd (id BIGINT)")
    spark.sql("INSERT INTO graft.db26.pd SELECT id FROM range(100)")
    spark.sql("DELETE FROM graft.db26.pd WHERE id < 3")
    spark.sql("DELETE FROM graft.db26.pd WHERE id >= 97")

    val pd = spark.sql(
      "SELECT data_file_path, pos, delete_file_path FROM graft.db26.pd.position_deletes")
    assert(pd.count() == 6)
    assert(pd.rdd.getNumPartitions == 2, "one partition per delete file")
    assert(spark.sql("SELECT * FROM graft.db26.pd.delete_files").count() == 2)

    val res = spark.sql(
      "CALL graft.system.rewrite_position_deletes('db26.pd')").collect()
    assert(res(0).getInt(0) == 2 && res(0).getInt(1) == 1, res.toSeq.toString)
    // same visible rows, one delete file, tombstones intact
    assert(spark.sql("SELECT count(*) FROM graft.db26.pd").collect()(0).getLong(0)
      == 94)
    assert(spark.sql("SELECT * FROM graft.db26.pd.delete_files").count() == 1)
    assert(spark.sql("SELECT * FROM graft.db26.pd.position_deletes").count() == 6)
    // compaction then rewrite drops DANGLING tombstones entirely
    spark.sql("CALL graft.system.compact('db26.pd', 1)")
    spark.sql("CALL graft.system.rewrite_position_deletes('db26.pd')")
    assert(spark.sql("SELECT * FROM graft.db26.pd.position_deletes").count() == 0)
    assert(spark.sql("SELECT count(*) FROM graft.db26.pd").collect()(0).getLong(0)
      == 94)
  }

  test("rewrite_position_deletes bin-packs tombstones to the target file size") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db27")
    // A tiny target so the surviving tombstones must span several files.
    spark.sql("CREATE TABLE graft.db27.pd2 (id BIGINT) " +
      "TBLPROPERTIES ('write.target-file-size-bytes'='2048')")
    spark.sql("INSERT INTO graft.db27.pd2 SELECT id FROM range(50000)")
    spark.sql("DELETE FROM graft.db27.pd2 WHERE id < 25000") // MoR tombstones
    val res = spark.sql(
      "CALL graft.system.rewrite_position_deletes('db27.pd2')").collect()
    // Bin-packed: >1 output file, each written by its own task.
    assert(res(0).getInt(1) > 1, res.toSeq.toString)
    assert(spark.sql("SELECT * FROM graft.db27.pd2.delete_files").count() > 1)
    // MoR reads stay exact through the rewrite.
    val row = spark.sql(
      "SELECT count(*), sum(id) FROM graft.db27.pd2").collect()(0)
    assert(row.getLong(0) == 25000L && row.getLong(1) == 937487500L, row.toString)
    // every surviving tombstone is still present exactly once
    assert(spark.sql(
      "SELECT * FROM graft.db27.pd2.position_deletes").count() == 25000)
  }

  test("rewrite_position_deletes filters danglers via join, not an In-literal") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // Shape check: the live-paths filter must be a LEFT SEMI join (path set
    // ships once, AQE-broadcastable) with NO In expression — at 100 TB the
    // live-file list is 200k+ paths and an In-literal would be serialized
    // into every task's plan.
    val manyPaths = (0 until 5000).map(i => s"/data/f$i.parquet")
    val tomb = Seq(("/data/f7.parquet", 1L), ("/dead/x.parquet", 2L))
      .toDF("file_path", "pos")
    val filtered = TableWriter.filterLiveTombstones(tomb, manyPaths, spark)
    val analyzed = filtered.queryExecution.analyzed
    assert(analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }.nonEmpty, "expected a left-semi join for the live-paths filter")
    assert(analyzed.expressions.flatMap(_.collect {
      case in: org.apache.spark.sql.catalyst.expressions.In => in
      case s: org.apache.spark.sql.catalyst.expressions.InSet => s
    }).isEmpty, "live-paths filter must not inline paths as an In-literal")
    assert(filtered.collect().map(_.getString(0)).toSeq ==
      Seq("/data/f7.parquet"))
    // End-to-end at file-count scale: a table with many small live files
    // still rewrites exactly (the pathological shape for an In-list).
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db28a")
    spark.sql("CREATE TABLE graft.db28a.manyf (id BIGINT)")
    spark.range(0, 400).repartition(200).createOrReplaceTempView("manyf_src")
    spark.sql("INSERT INTO graft.db28a.manyf SELECT id FROM manyf_src")
    spark.sql("DELETE FROM graft.db28a.manyf WHERE id % 7 = 0")
    spark.sql("CALL graft.system.rewrite_position_deletes('db28a.manyf')")
    val row = spark.sql(
      "SELECT count(*), sum(id) FROM graft.db28a.manyf").collect()(0)
    val exp = (0L until 400L).filter(_ % 7 != 0)
    assert(row.getLong(0) == exp.size && row.getLong(1) == exp.sum, row.toString)
  }

  test("rewrite_position_deletes carries eq-delete manifests with tuples intact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db28")
    spark.sql("CREATE TABLE graft.db28.mix (id BIGINT)")
    spark.sql("INSERT INTO graft.db28.mix SELECT id FROM range(100)")
    var t = IcebergTables.load(s"$warehouse/db28/mix")
    import spark.implicits._
    // an equality tombstone (its manifest must survive the rewrite as-is)
    t = TableWriter.deleteEquality(t, Seq(50L).toDF("id"), Seq("id"))
    // and positional tombstones that the rewrite coalesces (partial-file
    // delete so it cannot collapse into a metadata-only file drop)
    spark.sql("DELETE FROM graft.db28.mix WHERE id < 3")
    spark.sql("CALL graft.system.rewrite_position_deletes('db28.mix')")
    assert(spark.sql("SELECT count(*) FROM graft.db28.mix").collect()(0)
      .getLong(0) == 96) // 100 - 3 positional - 1 equality
    // both delete shapes still present post-rewrite
    val contents = spark.sql("SELECT content FROM graft.db28.mix.delete_files")
      .collect().map(_.getInt(0)).toSet
    assert(contents == Set(1, 2), s"expected pos+eq delete files: $contents")
  }

  test("read-changes stream surfaces MoR and CoW deletes exactly once") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.OutputMode
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db29")
    spark.sql("CREATE TABLE graft.db29.cdc (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.db29.cdc SELECT id, id * 2 FROM range(10)")
    val loc = s"$warehouse/db29/cdc"
    val q = spark.readStream.format("icegopher")
      .option("read-changes", "true").load(loc)
      .writeStream.format("memory").queryName("cdcstream")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val t0 = spark.table("cdcstream")
      assert(t0.filter(col("_change_type") === "insert").count() == 10)
      assert(t0.filter(col("_change_type") === "delete").count() == 0)

      // MoR positional delete mid-stream → delete rows in the next batch
      spark.sql("DELETE FROM graft.db29.cdc WHERE id < 3")
      q.processAllAvailable()
      val morDels = spark.table("cdcstream")
        .filter(col("_change_type") === "delete")
      assert(morDels.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(0L, 1L, 2L), "exactly the tombstoned rows, exactly once")

      // equality delete → same surface
      spark.sql("DELETE FROM graft.db29.cdc WHERE id = 5")
      q.processAllAvailable()
      assert(spark.table("cdcstream")
        .filter(col("_change_type") === "delete" && col("id") === 5L)
        .count() == 1)

      // CoW delete (non-pushable predicate forces a file rewrite): the
      // deleted row surfaces as a delete exactly once
      spark.sql("DELETE FROM graft.db29.cdc WHERE id + v = 9") // id = 3
      q.processAllAvailable()
      assert(spark.table("cdcstream")
        .filter(col("_change_type") === "delete" && col("id") === 3L)
        .count() == 1)
      // net effect reconciles: per id, inserts minus deletes = live rows
      val net = spark.table("cdcstream")
        .groupBy("id")
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(
            col("_change_type") === "insert", 1).otherwise(-1)).as("net"))
      val live = net.filter(col("net") === 1).select("id")
        .collect().map(_.getLong(0)).toSet
      assert(live == Set(4L, 6L, 7L, 8L, 9L), s"got $live")
      assert(net.filter(col("net") =!= 1 && col("net") =!= 0).count() == 0)
      // stamps carry real commit provenance
      assert(spark.table("cdcstream")
        .select("_commit_snapshot_id").distinct().count() >= 4)
    } finally q.stop()
  }

  test("CALL fast_forward publishes a branch onto main") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db24")
    spark.sql("CREATE TABLE graft.db24.wap (id BIGINT)")
    spark.sql("INSERT INTO graft.db24.wap VALUES (1)")
    val t = IcebergTables.load(s"$warehouse/db24/wap")
    import spark.implicits._
    TableWriter.appendToBranch(t, Seq(2L).toDF("id").coalesce(1), "audit")
    assert(spark.sql("SELECT * FROM graft.db24.wap").count() == 1)
    assert(spark.sql("SELECT * FROM graft.db24.wap VERSION AS OF 'audit'")
      .count() == 2)
    spark.sql("CALL graft.system.fast_forward('db24.wap', 'audit')")
    assert(spark.sql("SELECT * FROM graft.db24.wap").count() == 2)
  }

  test("expiry protects unpublished branch lineage; fast_forward survives") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db30")
    spark.sql("CREATE TABLE graft.db30.wap2 (id BIGINT)")
    spark.sql("INSERT INTO graft.db30.wap2 VALUES (1)")
    var t = IcebergTables.load(s"$warehouse/db30/wap2")
    import spark.implicits._
    // two staged commits on the branch: HEAD plus an INTERMEDIATE snapshot
    t = TableWriter.appendToBranch(t, Seq(2L).toDF("id").coalesce(1), "audit")
    Thread.sleep(5)
    t = TableWriter.appendToBranch(t, Seq(3L).toDF("id").coalesce(1), "audit")
    // aggressive age-based expiry: without lineage protection the
    // intermediate branch snapshot (not a HEAD, not the newest) would go,
    // leaving the branch permanently unpublishable
    val expired = TableWriter.expireSnapshots(t,
      olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    assert(expired.metadata.snapshots.size == 3,
      s"branch lineage must survive: ${expired.metadata.snapshots.map(_.snapshotId)}")
    spark.sql("CALL graft.system.fast_forward('db30.wap2', 'audit')")
    assert(spark.sql("SELECT id FROM graft.db30.wap2").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("CALL rewrite_zorder clusters on the interleaved curve") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db23")
    spark.sql("CREATE TABLE graft.db23.z (x BIGINT, y BIGINT)")
    spark.sql(
      """INSERT INTO graft.db23.z
         SELECT id * 2654435761 % 1024 % 32 AS x,
                CAST((id * 2654435761 % 1024) / 32 AS BIGINT) AS y
         FROM range(1024)""")
    val res = spark.sql(
      "CALL graft.system.rewrite_zorder('db23.z', 4, 'x,y')").collect()
    assert(res(0).getString(2) == "x,y")
    assert(spark.sql("SELECT count(*) FROM graft.db23.z").collect()(0).getLong(0)
      == 1024)
    // both dimensions carry per-file clustering after the rewrite
    val t = IcebergTables.load(s"$warehouse/db23/z")
    val all = t.newScan().planFiles().size
    val px = t.newScan(graft.core.Expr.lessThan("x",
      graft.core.LongLit(8L))).planFiles().size
    val py = t.newScan(graft.core.Expr.lessThan("y",
      graft.core.LongLit(8L))).planFiles().size
    assert(all == 4 && px < all && py < all, s"all=$all x=$px y=$py")
  }

  test("CALL create_changelog_view exposes per-commit changes in SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db21")
    spark.sql("CREATE TABLE graft.db21.cdc (id BIGINT)")
    spark.sql("INSERT INTO graft.db21.cdc VALUES (1), (2)")
    spark.sql("DELETE FROM graft.db21.cdc WHERE id = 1")
    val res = spark.sql(
      "CALL graft.system.create_changelog_view('db21.cdc', 'cdc_view', 0, 0)")
      .collect()
    assert(res(0).getString(0) == "cdc_view")
    val rows = spark.sql(
      "SELECT id, _change_type FROM cdc_view ORDER BY _commit_sequence, id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "insert"), (2L, "insert"), (1L, "delete")),
      s"got $rows")
  }

  test("CREATE TABLE PARTITIONED BY with transforms, partitioned INSERT") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db10")
    spark.sql(
      """CREATE TABLE graft.db10.p (id BIGINT, cat STRING, ts TIMESTAMP_NTZ)
         PARTITIONED BY (cat, bucket(4, id))""")
    val t = IcebergTables.load(s"$warehouse/db10/p")
    assert(t.spec.fields.map(f => (f.name, f.transform.repr)) ==
      Seq(("cat", "identity"), ("id_bucket", "bucket[4]")))

    spark.sql(
      """INSERT INTO graft.db10.p VALUES
         (1, 'a', TIMESTAMP_NTZ '2024-01-01 00:00:00'),
         (2, 'b', TIMESTAMP_NTZ '2024-01-02 00:00:00'),
         (3, 'a', TIMESTAMP_NTZ '2024-01-03 00:00:00')""")
    val t2 = IcebergTables.load(s"$warehouse/db10/p")
    // files carry partition tuples; identity pruning works through SQL
    val pruned = t2.newScan(graft.core.Expr.equalTo("cat", graft.core.StrLit("a")))
      .planFiles()
    assert(pruned.nonEmpty && pruned.size < t2.newScan().planFiles().size)
    assert(spark.sql("SELECT count(*) FROM graft.db10.p WHERE cat = 'a'")
      .collect()(0).getLong(0) == 2)
  }

  test("CALL procedures: rollback, expire, compact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db11")
    spark.sql("CREATE TABLE graft.db11.c (id BIGINT)")
    spark.sql("INSERT INTO graft.db11.c VALUES (1), (2)")
    val snap1 = IcebergTables.load(s"$warehouse/db11/c").currentSnapshot.get.snapshotId
    spark.sql("INSERT INTO graft.db11.c VALUES (3)")
    assert(spark.sql("SELECT count(*) FROM graft.db11.c").collect()(0).getLong(0) == 3)

    val rb = spark.sql(
      s"CALL graft.system.rollback_to_snapshot('db11.c', ${snap1}L)").collect()
    assert(rb(0).getLong(1) == snap1)
    assert(spark.sql("SELECT count(*) FROM graft.db11.c").collect()(0).getLong(0) == 2)

    // compact to one file
    spark.sql("INSERT INTO graft.db11.c VALUES (4), (5)")
    val cp = spark.sql("CALL graft.system.compact('db11.c', 1)").collect()
    assert(cp(0).getInt(1) == 1)
    assert(spark.sql("SELECT count(*) FROM graft.db11.c").collect()(0).getLong(0) == 4)

    // expire everything but the newest snapshot
    val horizon = System.currentTimeMillis() + 1000
    val ex = spark.sql(
      s"CALL graft.system.expire_snapshots('db11.c', ${horizon}L, 1)").collect()
    assert(ex(0).getInt(1) == 1, s"remaining=${ex(0).getInt(1)}")
    assert(spark.sql("SELECT count(*) FROM graft.db11.c").collect()(0).getLong(0) == 4)
  }

  test("CALL procedures: create_tag / create_branch / drop_ref") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db14")
    spark.sql("CREATE TABLE graft.db14.r (id BIGINT)")
    spark.sql("INSERT INTO graft.db14.r VALUES (1), (2)")
    val snap1 = IcebergTables.load(s"$warehouse/db14/r").currentSnapshot.get.snapshotId
    spark.sql("INSERT INTO graft.db14.r VALUES (3)")

    // tag the FIRST snapshot; reads through the tag see the old state
    val tg = spark.sql(
      s"CALL graft.system.create_tag('db14.r', 'v1', ${snap1}L)").collect()
    assert(tg(0).getLong(1) == snap1)
    assert(spark.sql("SELECT count(*) FROM graft.db14.r VERSION AS OF 'v1'")
      .collect()(0).getLong(0) == 2)
    assert(spark.sql("SELECT count(*) FROM graft.db14.r").collect()(0).getLong(0) == 3)

    // branch at the current snapshot (snapshot_id 0 → current)
    spark.sql("CALL graft.system.create_branch('db14.r', 'dev', 0L)")
    val refs = IcebergTables.load(s"$warehouse/db14/r").metadata.refs
    assert(refs("v1").refType == graft.core.TagRef)
    assert(refs("dev").refType == graft.core.BranchRef)

    // drop; main is protected
    val dr = spark.sql("CALL graft.system.drop_ref('db14.r', 'dev')").collect()
    assert(dr(0).getString(0) == "dev")
    assert(!IcebergTables.load(s"$warehouse/db14/r").metadata.refs.contains("dev"))
    intercept[Exception] {
      spark.sql("CALL graft.system.drop_ref('db14.r', 'main')").collect()
    }
  }

  test("CTAS / RTAS / writeTo / TRUNCATE round trip") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db16")
    spark.sql("CREATE TABLE graft.db16.ct AS SELECT id, id * 2 AS v FROM range(10)")
    assert(spark.sql("SELECT count(*) FROM graft.db16.ct").collect()(0).getLong(0) == 10)
    spark.sql("REPLACE TABLE graft.db16.ct AS SELECT id, id * 3 AS v FROM range(5)")
    assert(spark.sql("SELECT sum(v) FROM graft.db16.ct").collect()(0).getLong(0) == 30)
    // DataFrameWriterV2 append
    spark.sql("SELECT id, id AS v FROM range(3)").writeTo("graft.db16.ct").append()
    assert(spark.sql("SELECT count(*) FROM graft.db16.ct").collect()(0).getLong(0) == 8)
    // TRUNCATE must actually empty the table (one metadata-only overwrite
    // commit, not a silent no-op and not a tombstone per row)
    val before = IcebergTables.load(s"$warehouse/db16/ct").metadata.snapshots.size
    spark.sql("TRUNCATE TABLE graft.db16.ct")
    assert(spark.sql("SELECT count(*) FROM graft.db16.ct").collect()(0).getLong(0) == 0)
    val t = IcebergTables.load(s"$warehouse/db16/ct")
    assert(t.metadata.snapshots.size == before + 1)
    // pre-truncate data still reachable via time travel
    val preTruncate = t.metadata.snapshots.init.last.snapshotId
    assert(spark.sql(s"SELECT count(*) FROM graft.db16.ct VERSION AS OF $preTruncate")
      .collect()(0).getLong(0) == 8)
  }

  test("CALL sync_dedup_index / sync_agg_view fold the changefeed") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db17")
    val src = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "lang", "text")
    val t1 = TableWriter.create(src.filter(col("doc_id") < 100),
      s"$warehouse/db17/docs")
    val c1 = t1.currentSnapshot.get.snapshotId
    graft.queries.DedupIndex.build(
      t1.newScan().toDF(spark).select("doc_id", "text"),
      s"$warehouse/db17/idx", graft.queries.DedupIndex.Params())
    graft.queries.MatView.build(t1.newScan().toDF(spark),
      s"$warehouse/db17/mv")
    val t2 = TableWriter.append(t1,
      src.filter(col("doc_id") >= 100 && col("doc_id") < 150))
    TableWriter.updateWhere(t2, spark, col("doc_id") % 9 === 0,
      Map("text" -> concat(col("text"), lit(" x"))))
    val idxRow = spark.sql(
      s"CALL graft.system.sync_dedup_index('db17.docs', 'db17.idx', ${c1}L)")
      .collect()(0)
    val docsNow = IcebergTables.load(s"$warehouse/db17/docs")
    val wantIdx = graft.queries.DedupIndex.rows(
      docsNow.newScan().toDF(spark).select("doc_id", "text"),
      graft.queries.DedupIndex.Params()).count()
    assert(idxRow.getLong(1) == wantIdx,
      s"index rows ${idxRow.getLong(1)} != from-scratch $wantIdx")
    val mvRow = spark.sql(
      s"CALL graft.system.sync_agg_view('db17.docs', 'db17.mv', ${c1}L)")
      .collect()(0)
    assert(!mvRow.isNullAt(1), "watermark not stamped")
    val got = IcebergTables.load(s"$warehouse/db17/mv").newScan().toDF(spark)
      .orderBy("source", "lang").collect().toSeq
    val want = graft.queries.MatView.aggregate(docsNow.newScan().toDF(spark))
      .orderBy("source", "lang").collect().toSeq
    assert(got == want, "synced view != from-scratch aggregate")
  }

  test("CALL sync_join_view folds both sources' changefeeds into the join view") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db41")
    val o1 = TableWriter.create(
      (1L to 8L).map(ok => (ok, ok % 4 + 1)).toDF("o_orderkey", "o_custkey")
        .coalesce(1), s"$warehouse/db41/orders")
    val l1 = TableWriter.create(
      (for { ok <- 1L to 8L; ln <- 1 to 3 } yield (ok, ln, 10.0 * ln))
        .toDF("l_orderkey", "l_linenumber", "l_quantity").coalesce(1),
      s"$warehouse/db41/lineitem")
    graft.queries.JoinView.build(o1, l1, s"$warehouse/db41/jv", spark)
    // both sources move past the bootstrap watermarks
    val o2 = TableWriter.deleteWhere(o1, spark, col("o_custkey") === 2)
    val l2 = TableWriter.append(l1,
      Seq((3L, 4, 7.0)).toDF("l_orderkey", "l_linenumber", "l_quantity")
        .coalesce(1))
    val row = spark.sql(
      "CALL graft.system.sync_join_view('db41.orders', 'db41.lineitem', 'db41.jv')")
      .collect()(0)
    assert(row.getLong(1) == o2.currentSnapshot.get.snapshotId)
    assert(row.getLong(2) == l2.currentSnapshot.get.snapshotId)
    val got = IcebergTables.load(s"$warehouse/db41/jv").newScan().toDF(spark)
      .select("o_custkey", "items", "qty")
      .orderBy("o_custkey").collect().map(_.toSeq).toSeq
    val want = graft.queries.JoinView.aggregate(o2.newScan().toDF(spark),
      l2.newScan().toDF(spark)).orderBy("o_custkey")
      .collect().map(_.toSeq).toSeq
    assert(got == want, "synced join view != from-scratch join aggregate")
    // idempotent: a second CALL at the same heads leaves the snapshot alone
    val snapBefore = IcebergTables.load(s"$warehouse/db41/jv")
      .currentSnapshot.get.snapshotId
    spark.sql(
      "CALL graft.system.sync_join_view('db41.orders', 'db41.lineitem', 'db41.jv')")
      .collect()
    assert(IcebergTables.load(s"$warehouse/db41/jv")
      .currentSnapshot.get.snapshotId == snapBefore)
  }

  test("CALL sync_bm25_index folds the changefeed into the postings table") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db31")
    val src = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val t1 = TableWriter.create(src.filter(col("doc_id") < 100),
      s"$warehouse/db31/docs")
    val c1 = t1.currentSnapshot.get.snapshotId
    graft.queries.Bm25Index.build(t1.newScan().toDF(spark),
      s"$warehouse/db31/bm25", graft.queries.Bm25Index.Params())
    val t2 = TableWriter.append(t1,
      src.filter(col("doc_id") >= 100 && col("doc_id") < 150))
    TableWriter.updateWhere(t2, spark, col("doc_id") % 9 === 0,
      Map("text" -> concat(col("text"), lit(" x"))))
    val row = spark.sql(
      s"CALL graft.system.sync_bm25_index('db31.docs', 'db31.bm25', ${c1}L)")
      .collect()(0)
    val docsNow = IcebergTables.load(s"$warehouse/db31/docs")
    val want = graft.queries.Bm25Index.rows(
      docsNow.newScan().toDF(spark), graft.queries.Bm25Index.Params()).count()
    assert(row.getLong(1) == want,
      s"posting rows ${row.getLong(1)} != from-scratch $want")
  }

  test("CALL sync_lm_counts folds the changefeed into the bigram table") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db32")
    val src = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "text")
    val t1 = TableWriter.create(src.filter(col("doc_id") < 100),
      s"$warehouse/db32/docs")
    val c1 = t1.currentSnapshot.get.snapshotId
    graft.queries.LmIndex.build(t1.newScan().toDF(spark),
      col("lang") === "en", s"$warehouse/db32/lm")
    val t2 = TableWriter.append(t1,
      src.filter(col("doc_id") >= 100 && col("doc_id") < 150))
    TableWriter.updateWhere(t2, spark, col("doc_id") % 9 === 0,
      Map("text" -> concat(col("text"), lit(" x"))))
    val row = spark.sql(
      s"""CALL graft.system.sync_lm_counts('db32.docs', 'db32.lm', ${c1}L,
          target_filter => 'lang = ''en''')""").collect()(0)
    val docsNow = IcebergTables.load(s"$warehouse/db32/docs")
    val want = graft.queries.LmIndex.aggregate(
      docsNow.newScan().toDF(spark), col("lang") === "en").count()
    assert(row.getLong(1) == want,
      s"bigram rows ${row.getLong(1)} != from-scratch $want")
  }

  test("CALL sync_ann_index folds the embedding changefeed into the codes table") {
    import org.apache.spark.sql.functions.col
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db28")
    val src = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val t1 = TableWriter.create(src.filter(col("vec_id") < 30),
      s"$warehouse/db28/vecs")
    val c1 = t1.currentSnapshot.get.snapshotId
    graft.queries.AnnIndex.buildFromCorpus(t1.newScan().toDF(spark),
      s"$warehouse/db28/cb", s"$warehouse/db28/codes")
    TableWriter.append(t1, src.filter(col("vec_id") >= 30 && col("vec_id") < 40))
    val row = spark.sql(
      s"CALL graft.system.sync_ann_index('db28.vecs', 'db28.cb', 'db28.codes', ${c1}L)")
      .collect()(0)
    // 40 vectors × 8 subspaces
    assert(row.getLong(1) == 40L * 8, s"code rows ${row.getLong(1)}")
  }

  test("CALL sync_graph_index folds the changefeed; graph_index_stats reports") {
    import org.apache.spark.sql.functions.col
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db30")
    val src = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val t1 = TableWriter.create(src.filter(col("vec_id") < 30),
      s"$warehouse/db30/gvecs")
    val c1 = t1.currentSnapshot.get.snapshotId
    graft.queries.GraphIndex.build(t1.newScan().toDF(spark),
      s"$warehouse/db30/gcents", s"$warehouse/db30/gassign",
      s"$warehouse/db30/ggraph")
    TableWriter.append(t1, src.filter(col("vec_id") >= 30 && col("vec_id") < 40))
    val row = spark.sql(
      s"""CALL graft.system.sync_graph_index('db30.gvecs', 'db30.gcents',
          'db30.gassign', 'db30.ggraph', ${c1}L)""").collect()(0)
    // synced table ≡ from-scratch edges of the 40-vector corpus against
    // the frozen bootstrap centers
    val corpus = IcebergTables.load(s"$warehouse/db30/gvecs").newScan().toDF(spark)
    val cents = IcebergTables.load(s"$warehouse/db30/gcents").newScan().toDF(spark)
    val scratch = graft.queries.GraphIndex.edgesOf(corpus, cents)
      .collect().map(_.toSeq).toSet
    val got = IcebergTables.load(s"$warehouse/db30/ggraph").newScan().toDF(spark)
      .collect().map(_.toSeq).toSet
    assert(got == scratch)
    assert(row.getLong(1) == scratch.size.toLong, s"edge rows ${row.getLong(1)}")
    val st = spark.sql(
      "CALL graft.system.graph_index_stats('db30.gvecs', 'db30.ggraph')")
      .collect()(0)
    assert(st.getLong(0) == scratch.size.toLong)
    assert(st.getLong(1) <= 12L, s"max degree ${st.getLong(1)}")
    assert(st.getLong(2) < 40L, s"orphans ${st.getLong(2)}")
  }

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
