package graft.spark

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Partition-scoped compaction (`compact(where = ...)`, Iceberg's
  * `rewrite_data_files(where => ...)`): only files the planner cannot prove
  * disjoint from the predicate are rewritten, whole-file, through the
  * O(affected-files) CoW replace — untouched partitions' files stay
  * byte-identical. At 100 TB this is what makes compaction of a hot
  * partition feasible at all: the commit cost scales with the partition,
  * not the table. */
class ScopedCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def sha(path: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(java.nio.file.Files.readAllBytes(new File(path).toPath))
      .map("%02x".format(_)).mkString
  }

  /** cat-partitioned table, 2 small files per category (4 input slices × 3
    * cats via distribution-mode none would fan out; hash mode gives one per
    * cat, so append twice for 2 per cat). */
  private def mkTable(loc: String): IcebergTable = {
    val s = spark
    import s.implicits._
    val mk = (lo: Long, hi: Long) =>
      (lo until hi).map(i => (i, s"c${i % 3}", i * 1.0)).toDF("id", "cat", "v")
    val t = TableWriter.create(mk(0L, 120L), loc,
      partitionBy = Seq("cat" -> IdentityTransform))
    TableWriter.append(t, mk(120L, 240L))
  }

  test("where rewrites only the matching partition; others byte-identical") {
    val loc = Files.createTempDirectory("scoped_basic").toFile.getPath
    var t = mkTable(loc)
    val before = t.newScan().planFiles().map(_.file)
    val (inScope, outOfScope) = before.partition(_.partition.get("cat").contains("c1"))
    assert(inScope.size == 2 && outOfScope.size == 4, before.map(_.partition))
    val otherHashes = outOfScope.map(f => f.path -> sha(f.path)).toMap
    val versionBefore = t.loadedVersion

    t = TableWriter.compact(t, spark, targetFiles = 1,
      where = Some(Expr.equalTo("cat", StrLit("c1"))))

    val after = t.newScan().planFiles().map(_.file)
    // untouched partitions: same paths, same bytes
    val afterOther = after.filterNot(_.partition.get("cat").contains("c1"))
    assert(afterOther.map(_.path).toSet == otherHashes.keySet)
    afterOther.foreach(f => assert(sha(f.path) == otherHashes(f.path),
      s"untouched file rewritten: ${f.path}"))
    // scoped partition: compacted to one fresh file
    val afterScope = after.filter(_.partition.get("cat").contains("c1"))
    assert(afterScope.size == 1, afterScope.map(_.path))
    assert(!inScope.map(_.path).contains(afterScope.head.path))
    // rows unchanged (whole-file rewrite, never row-filtered)
    assert(t.newScan().toDF(spark).count() == 240)
    assert(t.newScan().toDF(spark).agg(sum("id")).collect()(0).getLong(0) ==
      (0L until 240L).sum)
    // the commit is a CoW OVERWRITE naming exactly the replaced files
    val snap = t.currentSnapshot.get
    assert(snap.summary.exists(_.operation == OpOverwrite), snap.summary)
    assert(snap.summary.flatMap(_.properties.get("replaced-data-files"))
      .contains("2"), snap.summary)
    assert(t.loadedVersion == versionBefore + 1)
  }

  test("manifests without a selected file are carried by reference") {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("scoped_manifests").toFile.getPath
    // one manifest per category: each commit writes its own manifest
    val mk = (c: String) =>
      (0L until 40L).map(i => (i, c, i * 1.0)).toDF("id", "cat", "v")
    var t = TableWriter.create(mk("c0"), loc,
      partitionBy = Seq("cat" -> IdentityTransform))
    t = TableWriter.append(t, mk("c1"))
    t = TableWriter.append(t, mk("c2"))
    val listBefore = graft.core.ManifestIO.readManifestList(
      t.io.open(t.currentSnapshot.get.manifestList))
    assert(listBefore.size == 3)
    t = TableWriter.compact(t, spark,
      where = Some(Expr.equalTo("cat", StrLit("c2"))))
    val listAfter = graft.core.ManifestIO.readManifestList(
      t.io.open(t.currentSnapshot.get.manifestList))
    // the c0/c1 manifests appear UNCHANGED (same path — carried by
    // reference, not rewritten); c2's manifest was replaced
    val beforePaths = listBefore.map(_.path).toSet
    val carried = listAfter.map(_.path).filter(beforePaths.contains)
    assert(carried.size == 2, s"carried=$carried")
    // scan still sees every row exactly once
    assert(t.newScan().toDF(spark).count() == 120)
  }

  test("scoped compaction applies MoR delete debt for its files only") {
    val loc = Files.createTempDirectory("scoped_mor").toFile.getPath
    var t = mkTable(loc)
    // tombstones in two partitions
    t = TableWriter.deleteWhere(t, spark,
      col("id") % 3 =!= 0 && col("id") < 6) // kills ids 1,2,4,5 (c1,c2)
    val deadBefore = t.newScan().planFiles()
      .filter(_.deleteFiles.nonEmpty).map(_.file.partition("cat")).toSet
    assert(deadBefore == Set("c1", "c2"), deadBefore)

    t = TableWriter.compact(t, spark, targetFiles = 1,
      where = Some(Expr.equalTo("cat", StrLit("c1"))))
    val tasks = t.newScan().planFiles()
    // c1's rewrite folded its tombstones in; c2 keeps its delete debt
    assert(tasks.filter(_.file.partition("cat") == "c1")
      .forall(_.deleteFiles.isEmpty))
    assert(tasks.filter(_.file.partition("cat") == "c2")
      .exists(_.deleteFiles.nonEmpty))
    assert(t.newScan().toDF(spark).count() == 236)
    assert(t.newScan(Expr.equalTo("cat", StrLit("c1"))).toDF(spark)
      .filter(col("cat") === "c1").count() == 78)
  }

  test("binpack min-file-size: the healthy file is left byte-identical") {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("binpack_size").toFile.getPath
    // one target-size file, then two SMALL appends
    var t = TableWriter.create((0L until 5000L).map(i => (i, i * 2.0))
      .toDF("id", "v").coalesce(1), loc)
    t = TableWriter.append(t, (5000L until 5010L).map(i => (i, i * 2.0))
      .toDF("id", "v").coalesce(1))
    t = TableWriter.append(t, (5010L until 5020L).map(i => (i, i * 2.0))
      .toDF("id", "v").coalesce(1))
    val before = t.newScan().planFiles().map(_.file)
    assert(before.size == 3)
    val big = before.maxBy(_.fileSizeInBytes)
    val smalls = before.filterNot(_.path == big.path)
    assert(smalls.forall(_.fileSizeInBytes < big.fileSizeInBytes))
    val bigHash = sha(big.path)

    // floor below the big file's size: only the two smalls qualify, and
    // they binpack together into ONE fresh file
    t = TableWriter.compact(t, spark, targetFiles = 1,
      minFileSizeBytes = Some(big.fileSizeInBytes))
    val after = t.newScan().planFiles().map(_.file)
    assert(after.size == 2, after.map(_.path))
    assert(after.exists(_.path == big.path))
    assert(sha(big.path) == bigHash, "healthy file must not be rewritten")
    assert(!after.forall(f => before.exists(_.path == f.path)))
    assert(t.newScan().toDF(spark).count() == 5020)
    val snap = t.currentSnapshot.get
    assert(snap.summary.flatMap(_.properties.get("replaced-data-files"))
      .contains("2"), snap.summary)

    // nothing below the floor → no-op, no commit
    val v = t.loadedVersion
    val out = TableWriter.compact(t, spark, targetFiles = 1,
      minFileSizeBytes = Some(1L))
    assert(out.loadedVersion == v)
  }

  test("binpack delete-file-threshold: only delete-laden files rewrite") {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("binpack_del").toFile.getPath
    var t = TableWriter.create((0L until 100L).map(i => (i, i * 2.0))
      .toDF("id", "v").coalesce(1).sortWithinPartitions("id"), loc)
    t = TableWriter.append(t, (100L until 200L).map(i => (i, i * 2.0))
      .toDF("id", "v").coalesce(1).sortWithinPartitions("id"))
    // tombstones land on the LOW file only (metrics-pruned delete scan)
    t = TableWriter.deleteWhere(t, spark, col("id") < 5)
    val before = t.newScan().planFiles()
    val (laden, clean) = before.partition(_.deleteFiles.nonEmpty)
    assert(laden.size == 1 && clean.size == 1, before.map(_.file.path))
    val cleanHash = sha(clean.head.file.path)

    t = TableWriter.compact(t, spark, targetFiles = 1,
      deleteFileThreshold = Some(1))
    val after = t.newScan().planFiles()
    assert(after.size == 2)
    // the delete-laden file rewrote (debt folded in); the clean one didn't
    assert(after.forall(_.deleteFiles.isEmpty))
    assert(after.exists(_.file.path == clean.head.file.path))
    assert(sha(clean.head.file.path) == cleanHash)
    assert(!after.exists(_.file.path == laden.head.file.path))
    assert(t.newScan().toDF(spark).count() == 195)
    assert(t.newScan().toDF(spark).agg(sum("id")).collect()(0).getLong(0) ==
      (5L until 200L).sum)
  }

  test("CALL compact with binpack knobs reports the selection") {
    val s = spark
    val wh = Files.createTempDirectory("binpack_call").toFile.getPath
    val prev = s.conf.getOption("spark.sql.catalog.graftbp")
    s.conf.set("spark.sql.catalog.graftbp", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graftbp.warehouse", wh)
    try {
      s.sql("CREATE NAMESPACE graftbp.db")
      s.sql("CREATE TABLE graftbp.db.t (id BIGINT, v DOUBLE)")
      s.sql("INSERT INTO graftbp.db.t " +
        "SELECT /*+ COALESCE(1) */ id, id * 2.0 FROM range(5000)")
      s.sql("INSERT INTO graftbp.db.t " +
        "SELECT /*+ COALESCE(1) */ id, id * 2.0 FROM range(5000, 5010)")
      val sizes = IcebergTables.load(s"$wh/db/t").newScan().planFiles()
        .map(_.file.fileSizeInBytes)
      assert(sizes.size == 2)
      val r = s.sql("CALL graftbp.system.compact('db.t', 1, " +
        s"min_file_size_bytes => ${sizes.max}L)").collect()(0)
      // only the small second file qualifies; it rewrites alone
      assert(r.getInt(2) == 1, r)
      assert(s.sql("SELECT count(*) FROM graftbp.db.t")
        .collect()(0).getLong(0) == 5010)
    } finally {
      s.sql("DROP TABLE IF EXISTS graftbp.db.t")
      prev match {
        case Some(v) => s.conf.set("spark.sql.catalog.graftbp", v)
        case None => s.conf.unset("spark.sql.catalog.graftbp")
      }
    }
  }

  test("no matching files is a no-op commit-wise") {
    val loc = Files.createTempDirectory("scoped_noop").toFile.getPath
    val t = mkTable(loc)
    val v = t.loadedVersion
    val out = TableWriter.compact(t, spark,
      where = Some(Expr.equalTo("cat", StrLit("nope"))))
    assert(out.loadedVersion == v)
    assert(out.currentSnapshot.get.snapshotId == t.currentSnapshot.get.snapshotId)
  }

  test("metrics predicates scope too (non-partition column)") {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("scoped_metrics").toFile.getPath
    // unpartitioned, two files with disjoint id ranges
    var t = TableWriter.create((0L until 100L).map(i => (i, i * 2.0))
      .toDF("id", "v").coalesce(1).sortWithinPartitions("id"), loc)
    t = TableWriter.append(t, (100L until 200L).map(i => (i, i * 2.0))
      .toDF("id", "v").coalesce(1).sortWithinPartitions("id"))
    val before = t.newScan().planFiles().map(_.file.path)
    assert(before.size == 2)
    val keepFile = t.newScan(Expr.lessThan("id", LongLit(100L)))
      .planFiles().map(_.file.path)
    assert(keepFile.size == 1)

    t = TableWriter.compact(t, spark,
      where = Some(Expr.greaterThanOrEq("id", LongLit(150L))))
    val after = t.newScan().planFiles().map(_.file.path)
    assert(after.size == 2)
    // the low file survives untouched; the high file (metrics overlap at
    // id >= 150) was rewritten WHOLE — rows 100..149 survive the rewrite
    assert(after.contains(keepFile.head))
    assert(t.newScan().toDF(spark).count() == 200)
  }

  test("CALL compact with where: counters + refusal of inexpressible predicates") {
    val s = spark
    val wh = Files.createTempDirectory("scoped_call").toFile.getPath
    val prev = s.conf.getOption("spark.sql.catalog.graftsc")
    s.conf.set("spark.sql.catalog.graftsc", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graftsc.warehouse", wh)
    try {
      s.sql("CREATE NAMESPACE graftsc.db")
      s.sql("CREATE TABLE graftsc.db.t (id BIGINT, cat STRING) PARTITIONED BY (cat)")
      s.sql("INSERT INTO graftsc.db.t SELECT id, concat('c', id % 3) FROM range(120)")
      s.sql("INSERT INTO graftsc.db.t SELECT id, concat('c', id % 3) FROM range(120, 240)")
      val r = s.sql(
        "CALL graftsc.system.compact('db.t', 1, where => \"cat = 'c0'\")")
        .collect()(0)
      assert(r.getInt(0) == 6, r)  // files_before
      assert(r.getInt(1) == 5, r)  // files_after: 4 untouched + 1 compacted
      assert(r.getInt(2) == 2, r)  // rewritten_files
      assert(s.sql("SELECT count(*) FROM graftsc.db.t").collect()(0).getLong(0) == 240)
      // inexpressible predicate refuses instead of widening to the table
      val err = intercept[Exception] {
        s.sql("CALL graftsc.system.compact('db.t', 1, where => 'length(cat) > 1')")
          .collect()
      }
      assert(err.getMessage.contains("not expressible"), err.getMessage)
      // omitted where still compacts the whole table
      val full = s.sql("CALL graftsc.system.compact('db.t', 1)").collect()(0)
      assert(full.getInt(1) == 3, full) // hash-distributed: one per cat
    } finally {
      s.sql("DROP TABLE IF EXISTS graftsc.db.t")
      prev match {
        case Some(v) => s.conf.set("spark.sql.catalog.graftsc", v)
        case None => s.conf.unset("spark.sql.catalog.graftsc")
      }
    }
  }

  test("scoped compaction preserves V3 row lineage of rewritten rows") {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("scoped_lineage").toFile.getPath
    var t = TableWriter.create(
      Seq.empty[(Long, String)].toDF("id", "cat"), loc,
      partitionBy = Seq("cat" -> IdentityTransform))
    t = TableWriter.upgradeFormatVersion(t, s, 3)
    t = TableWriter.append(t, Seq((1L, "a"), (2L, "a"), (3L, "b"))
      .toDF("id", "cat"))
    t = TableWriter.append(t, Seq((4L, "a"), (5L, "b")).toDF("id", "cat"))
    def lineage: Map[Long, Long] =
      spark.read.format("icegopher").load(loc)
        .select(col("id"), col("_row_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = lineage
    assert(before.values.toSet.size == 5)

    t = TableWriter.compact(t, s, targetFiles = 1,
      where = Some(Expr.equalTo("cat", StrLit("a"))))
    assert(lineage == before)
    // partition 'a' really is one fresh file now, and it carries the
    // materialized lineage columns under the reserved field ids
    val aFiles = t.newScan(Expr.equalTo("cat", StrLit("a"))).planFiles()
      .filter(_.file.partition.get("cat").contains("a"))
    assert(aFiles.size == 1)
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(aFiles.head.file.path),
        new org.apache.hadoop.conf.Configuration()))
    try {
      import scala.jdk.CollectionConverters._
      val byName = footer.getFooter.getFileMetaData.getSchema.getFields
        .asScala.map(f => f.getName -> Option(f.getId)).toMap
      assert(byName(GraftReaders.RowIdCol).map(_.intValue())
        .contains(GraftReaders.RowIdFieldId))
    } finally footer.close()
  }
}
