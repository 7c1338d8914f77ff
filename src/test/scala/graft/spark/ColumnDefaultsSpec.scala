package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** V3 column defaults (`initial-default` / `write-default`).
  *
  * The wrong-answer class under test: a column added AFTER data files were
  * written must read its `initial-default` from those files — not NULL —
  * across every read path (DSv2 columnar, DSv2 row, core toDF), while files
  * that genuinely carry the column (incl. real NULLs) stay untouched. */
class ColumnDefaultsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // -------- single-value JSON codec --------

  test("single-value JSON round-trips every primitive type") {
    val cases: Seq[(IcebergType, Literal)] = Seq(
      BooleanT -> BoolLit(true),
      IntT -> IntLit(-7),
      LongT -> LongLit(1L << 40),
      FloatT -> FloatLit(1.5f),
      DoubleT -> DoubleLit(-2.25),
      DecimalT(9, 2) -> DecLit(BigInt(1420), 2),
      DateT -> DateLit(19000),
      TimeT -> TimeLit(81068123456L),
      TimestampT -> TsLit(1510871468000001L),
      TimestampTzT -> TsLit(1510871468000001L),
      StringT -> StrLit("hello"),
      UuidT -> UuidLit(java.util.UUID.fromString(
        "f79c3e09-677c-4bbd-a479-3f349cb785e7")),
      BinaryT -> BytesLit(Array[Byte](0, 1, 2, -1)),
      FixedT(2) -> FixedLit(Array[Byte](0x0a, 0x0b)))
    cases.foreach { case (typ, lit) =>
      val json = SingleValueJson.toJsonString(lit, typ)
      val back = SingleValueJson.parseString(typ, json)
      assert(back == lit, s"$typ: $json parsed to $back, expected $lit")
    }
    // spec examples: decimal keeps scale as a string, date is ISO
    assert(SingleValueJson.toJsonString(DecLit(BigInt(1420), 2), DecimalT(9, 2))
      == "\"14.20\"")
    assert(SingleValueJson.toJsonString(DateLit(0), DateT) == "\"1970-01-01\"")
    // tz'd timestamps carry an explicit offset; tz-less don't
    assert(SingleValueJson.toJsonString(TsLit(0L), TimestampTzT)
      .contains("+00:00"))
    assert(!SingleValueJson.toJsonString(TsLit(0L), TimestampT)
      .contains("+00:00"))
  }

  test("nested defaults are refused loudly") {
    val e = intercept[IllegalArgumentException](SingleValueJson.parseString(
      StructT(Seq(NestedField(1, "x", IntT))), "{\"1\": 5}"))
    assert(e.getMessage.contains("nested"), e.getMessage)
  }

  test("schema JSON round-trips defaults") {
    val schema = Schema(0, StructT(Seq(
      NestedField(1, "id", LongT, required = true),
      NestedField(2, "channel", StringT,
        initialDefault = Some(StrLit("organic")),
        writeDefault = Some(StrLit("direct"))))), Vector.empty)
    val md = TableMetadata(
      formatVersion = 3, tableUuid = "u", location = "l",
      lastSequenceNumber = 0, lastUpdatedMs = 1, lastColumnId = 2,
      schemas = Vector(schema), currentSchemaId = 0,
      partitionSpecs = Vector(PartitionSpec.unpartitioned), defaultSpecId = 0,
      lastPartitionId = None, properties = Map.empty, snapshots = Vector.empty,
      currentSnapshotId = None, snapshotLog = Vector.empty,
      metadataLog = Vector.empty, sortOrders = Vector(SortOrder.unsorted),
      defaultSortOrderId = 0, refs = Map.empty)
    val back = TableMetadata.parse(md.toJson)
    val f = back.currentSchema.struct.fieldById(2).get
    assert(f.initialDefault.contains(StrLit("organic")))
    assert(f.writeDefault.contains(StrLit("direct")))
  }

  // -------- table fixture --------

  /** V3 table: 2 files before the defaulted columns exist, then one append
    * omitting them (write-default) and one with explicit values. */
  private def fixture(): IcebergTable =
    fixtureAt(Files.createTempDirectory("defaults").toFile.getPath)

  private def fixtureAt(loc: String): IcebergTable = {
    val s = spark
    import s.implicits._
    var t = TableWriter.create(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(2), loc)
    t = TableWriter.upgradeFormatVersion(t, s, 3)
    t = TableWriter.addColumn(t, "channel", StringT,
      initialDefault = Some(StrLit("organic")),
      writeDefault = Some(StrLit("direct")))
    t = TableWriter.addColumn(t, "score", IntT,
      initialDefault = Some(IntLit(42)), writeDefault = Some(IntLit(0)))
    // omits both new columns → write-defaults fill
    t = TableWriter.append(t, Seq((3L, "c")).toDF("id", "v"))
    // explicit values, including a genuine NULL channel → must survive
    TableWriter.append(t, Seq((4L, "d", "paid", 9), (5L, "e", null, 10))
      .toDF("id", "v", "channel", "score"))
  }

  private def expected: Set[(Long, String, String, Int)] = Set(
    (1L, "a", "organic", 42), (2L, "b", "organic", 42),
    (3L, "c", "direct", 0), (4L, "d", "paid", 9), (5L, "e", null, 10))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "v", "channel", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) Int.MinValue else r.getInt(3))).toSet

  test("DSv2 columnar path materializes initial defaults") {
    val t = fixture()
    val df = spark.read.format("icegopher").load(t.location)
    // no deletes + plain projection → the columnar batch reader
    assert(rows(df) == expected)
  }

  test("DSv2 row path (via _file projection) materializes defaults") {
    val t = fixture()
    val df = spark.read.format("icegopher").load(t.location)
      .select(col("id"), col("v"), col("channel"), col("score"), col("_file"))
    assert(rows(df) == expected)
  }

  test("filters on a defaulted column select old files' rows") {
    val t = fixture()
    val df = spark.read.format("icegopher").load(t.location)
      .filter(col("channel") === "organic")
    assert(df.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // aggregate over the defaulted column is default-aware
    val n = spark.read.format("icegopher").load(t.location)
      .filter(col("score") > 5).count()
    assert(n == 4) // 42,42 (defaults), 9, 10 — not the write-default 0
  }

  test("core toDF path materializes defaults") {
    val t = fixture()
    assert(rows(t.newScan().toDF(spark)) == expected)
  }

  test("equality deletes keyed on a defaulted column match old files") {
    val s = spark
    import s.implicits._
    val t = fixture()
    val t2 = TableWriter.deleteEquality(t,
      Seq("organic").toDF("channel"), Seq("channel"))
    val ids = spark.read.format("icegopher").load(t2.location)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L, 4L, 5L), s"got $ids")
  }

  test("SQL INSERT omitting a defaulted column writes the write-default") {
    // the user-facing write surface: Spark's own analyzer reads the
    // CURRENT_DEFAULT metadata stamped by SchemaConv and fills omitted
    // columns — no custom resolution code in the write path
    val wh = Files.createTempDirectory("defaults_wh").toFile.getPath
    spark.conf.set("spark.sql.catalog.gdef", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdef.warehouse", wh)
    new java.io.File(s"$wh/db/t").mkdirs()
    fixtureAt(s"$wh/db/t")
    spark.sql("INSERT INTO gdef.db.t (id, v) VALUES (6, 'f')")
    val r = spark.sql("SELECT channel, score FROM gdef.db.t WHERE id = 6")
      .collect()(0)
    assert(r.getString(0) == "direct" && r.getInt(1) == 0, r.toString)
  }

  test("SQL DDL: ADD COLUMN DEFAULT and ALTER COLUMN SET/DROP DEFAULT") {
    val wh = Files.createTempDirectory("defaults_ddl").toFile.getPath
    spark.conf.set("spark.sql.catalog.gddl", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gddl.warehouse", wh)
    spark.sql("CREATE TABLE gddl.db.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gddl.db.t VALUES (1, 'a')")
    spark.sql("ALTER TABLE gddl.db.t SET TBLPROPERTIES ('format-version' = '3')")
    spark.sql("ALTER TABLE gddl.db.t ADD COLUMN tier STRING DEFAULT 'free'")
    // the pre-existing row reads the initial-default
    assert(spark.sql("SELECT tier FROM gddl.db.t WHERE id = 1")
      .collect()(0).getString(0) == "free")
    // an INSERT omitting the column gets the write-default
    spark.sql("INSERT INTO gddl.db.t (id, v) VALUES (2, 'b')")
    assert(spark.sql("SELECT tier FROM gddl.db.t WHERE id = 2")
      .collect()(0).getString(0) == "free")
    // SET DEFAULT changes only what NEW writes fill
    spark.sql("ALTER TABLE gddl.db.t ALTER COLUMN tier SET DEFAULT 'paid'")
    spark.sql("INSERT INTO gddl.db.t (id, v) VALUES (3, 'c')")
    val tiers = spark.sql("SELECT id, tier FROM gddl.db.t")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(tiers == Set((1L, "free"), (2L, "free"), (3L, "paid")), tiers)
    // DROP DEFAULT → later omitted writes are null
    spark.sql("ALTER TABLE gddl.db.t ALTER COLUMN tier DROP DEFAULT")
    spark.sql("INSERT INTO gddl.db.t (id, v) VALUES (4, 'd')")
    assert(spark.sql("SELECT tier FROM gddl.db.t WHERE id = 4")
      .collect()(0).isNullAt(0))
    // defaults with escape-sensitive characters survive the SQL fill path
    // verbatim (backslash would read as an escape in a naive quoted
    // CURRENT_DEFAULT; quotes and newlines likewise)
    spark.sql("""ALTER TABLE gddl.db.t ADD COLUMN dir STRING
                 DEFAULT 'C:\\temp\'s\ndir'""")
    spark.sql("INSERT INTO gddl.db.t (id, v) VALUES (5, 'e')")
    assert(spark.sql("SELECT dir FROM gddl.db.t WHERE id = 5")
      .collect()(0).getString(0) == "C:\\temp's\ndir")
  }

  test("foreign statistics files survive this engine's commits") {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("stats_rt").toFile.getPath
    val t = TableWriter.create(Seq((1L, "a")).toDF("id", "v"), loc)
    // splice a `statistics` entry (as another engine would have written)
    val mdFile = new java.io.File(s"$loc/metadata")
      .listFiles().filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    val json = new String(java.nio.file.Files.readAllBytes(mdFile.toPath))
    val stats = """"statistics":[{"snapshot-id":1,"statistics-path":"s.puffin",""" +
      """"file-size-in-bytes":10,"file-footer-size-in-bytes":5,""" +
      """"blob-metadata":[{"type":"apache-datasketches-theta-v1",""" +
      """"snapshot-id":1,"sequence-number":1,"fields":[1]}]}],"""
    java.nio.file.Files.writeString(mdFile.toPath,
      json.replaceFirst("\\{", "{" + stats))
    // a commit by THIS engine must carry the foreign stats through
    val t2 = TableWriter.append(IcebergTables.load(loc), Seq((2L, "b")).toDF("id", "v"))
    assert(t2.metadata.statisticsJson.exists(
      _.contains("apache-datasketches-theta-v1")), t2.metadata.statisticsJson)
    val reparsed = graft.core.TableMetadata.parse(t2.metadata.toJson)
    assert(reparsed.statisticsJson.exists(_.contains("s.puffin")))
  }

  test("defaults require V3; required-without-default refused on data") {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("defaults_v2").toFile.getPath
    val t = TableWriter.create(Seq((1L, "a")).toDF("id", "v"), loc)
    val e = intercept[IllegalArgumentException](
      TableWriter.addColumn(t, "c", StringT,
        initialDefault = Some(StrLit("x")), writeDefault = None))
    assert(e.getMessage.contains("format-version 3"), e.getMessage)
    val t3 = TableWriter.upgradeFormatVersion(t, s, 3)
    val e2 = intercept[IllegalArgumentException](
      TableWriter.addColumnAt(t3, Seq("c"), StringT, required = true))
    assert(e2.getMessage.contains("initial-default"), e2.getMessage)
  }
}
