package graft.spark

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Files written WITHOUT parquet field ids (other engines, or this table
  * before id-stamped writes) must read by NAME — Spark's
  * `fieldId.read.ignoreMissing` semantics are silent-NULL, not name
  * fallback, so the reader decides id-vs-name per file from its footer.
  * After a column rename, id-less files must still resolve through the
  * column's historical name (name-mapping derived from the schema log). */
class FieldIdFallbackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmpDir(name: String): String =
    Files.createTempDirectory(name).toFile.getPath

  /** A table with one id-stamped file {1,2} and one id-LESS file {3,4},
    * registered via appendFiles (as a foreign engine's commit would be). */
  private def mixedTable(): IcebergTable = {
    import spark.implicits._
    val loc = tmpDir("tbl_idless")
    val t0 = TableWriter.create(
      Seq((1L, "a"), (2L, "b")).toDF("id", "val"), loc)

    val rawDir = new File(tmpDir("idless_raw"))
    Seq((3L, "c"), (4L, "d")).toDF("id", "val")
      .coalesce(1).write.mode("overwrite").parquet(rawDir.getPath)
    val raw = rawDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dataDir = new File(loc, "data"); dataDir.mkdirs()
    val dest = new File(dataDir, "idless-0001.parquet")
    Files.copy(raw.toPath, dest.toPath)
    assert(!GraftReaders.footerInfo(dest.getPath).hasIds,
      "plain df.write.parquet output should carry no field ids")
    TableWriter.appendFiles(t0.location, Seq(CowFileOut(dest.getPath, 2, Map.empty)))
  }

  test("id-less data file reads values (not nulls) through toDF and DSv2") {
    val table = mixedTable()
    val viaToDf = table.newScan().toDF(spark)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaToDf.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))

    val viaDsv2 = spark.read.format("icegopher").load(table.location)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaDsv2.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("renamed column still resolves in id-less files via historical name") {
    val t1 = mixedTable()
    val table = TableWriter.renameColumn(t1, "val", "val_renamed")

    val viaDsv2 = spark.read.format("icegopher").load(table.location)
      .select("id", "val_renamed")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaDsv2.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")),
      "id-less file must resolve val→val_renamed through the schema log")

    val viaToDf = table.newScan().toDF(spark)
      .select("id", "val_renamed")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaToDf.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))

    // filter pushdown on the renamed column still returns the id-less row
    val filtered = spark.read.format("icegopher").load(table.location)
      .filter("val_renamed = 'd'").collect()
    assert(filtered.map(_.getAs[Long]("id")).toSeq == Seq(4L))
  }

  test("schema.name-mapping.default resolves foreign id-less column names") {
    import spark.implicits._
    val loc = tmpDir("tbl_namemap")
    val t0 = TableWriter.create(Seq((1L, "a")).toDF("id", "val"), loc)

    // a foreign engine's id-less file that used ITS OWN column name —
    // never part of this table's schema log, so only the standard
    // name-mapping property can resolve it
    val rawDir = new File(tmpDir("namemap_raw"))
    Seq((2L, "b"), (3L, "c")).toDF("id", "value_str")
      .coalesce(1).write.mode("overwrite").parquet(rawDir.getPath)
    val raw = rawDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dataDir = new File(loc, "data"); dataDir.mkdirs()
    val dest = new File(dataDir, "foreign-0001.parquet")
    Files.copy(raw.toPath, dest.toPath)
    val t1 = TableWriter.appendFiles(t0.location,
      Seq(CowFileOut(dest.getPath, 2, Map.empty)))

    // without the mapping the foreign column cannot resolve → nulls
    val before = spark.read.format("icegopher").load(loc)
      .orderBy("id").collect()
    assert(before(1).isNullAt(1) && before(2).isNullAt(1))

    val mapping =
      """[{"field-id": 1, "names": ["id"]},
         |{"field-id": 2, "names": ["value_str", "val"]}]""".stripMargin
    TableWriter.updateProperties(IcebergTables.load(loc),
      Map("schema.name-mapping.default" -> mapping))

    // mapping present: the foreign file's values resolve through it,
    // in the library scan and DSv2 both
    val viaDsv2 = spark.read.format("icegopher").load(loc)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaDsv2.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"got ${viaDsv2.toSeq}")
    val viaToDf = IcebergTables.load(loc).newScan().toDF(spark)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaToDf.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("column added after an id-less file was written reads as null there") {
    val t1 = mixedTable()
    val table = TableWriter.addColumn(t1, "extra", graft.core.StringT)
    val rows = spark.read.format("icegopher").load(table.location)
      .orderBy("id").collect()
    assert(rows.length == 4)
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("extra"))))
  }
}
