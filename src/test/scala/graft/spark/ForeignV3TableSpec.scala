package graft.spark

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, MetadataBuilder, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Integration pin: a COMPLETE format-version-3 table composed the way a
  * FOREIGN engine would write it — raw metadata JSON (not our serializer),
  * a column with `initial-default` the data file predates, row-lineage
  * carried only at the MANIFEST level (null per-file first_row_id → the
  * reader must inherit), and a deletion vector — all in one table. The
  * per-feature specs prove each mechanism alone; this proves they compose
  * on a table this engine never wrote. */
class ForeignV3TableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def buildForeignTable(): String = {
    val loc = Files.createTempDirectory("foreign_v3").toFile.getPath
    val dataDir = new File(loc, "data"); dataDir.mkdirs()
    val metaDir = new File(loc, "metadata"); metaDir.mkdirs()

    // one data file with parquet FIELD IDS (id=1, v=2), rows in known
    // order; the schema's third column (tier, id=3) does NOT exist in it
    val s = spark
    import s.implicits._
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val annotated = StructType(Seq(
      StructField("id", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
      StructField("v", StringType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 2L).build())))
    val df = spark.createDataFrame(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
        .sort("id").coalesce(1).rdd, annotated)
    val tmpOut = new File(dataDir, "stage")
    df.write.parquet(tmpOut.getPath)
    val part = tmpOut.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dataFile = new File(dataDir, "foreign-00000.parquet")
    java.nio.file.Files.move(part.toPath, dataFile.toPath)

    // deletion vector killing position 1 (the "b" row)
    val puffin = new File(dataDir, "foreign-dv.puffin")
    val blob = Puffin.dvBlobBytes(Iterator(1L))
    val metas = Puffin.write(puffin.getPath, Seq((blob, Puffin.BlobMetadata(
      "deletion-vector-v1", Seq.empty, 77L, 1L, 0L, 0L,
      Map("referenced-data-file" -> dataFile.getPath)))))

    // data manifest: entry with NULL first_row_id (inheritance required)
    val dataEntry = ManifestEntry(ManifestEntryStatus.Added, Some(77L),
      Some(1L), Some(1L),
      DataFileInfo(DataFileContent.Data, dataFile.getPath, "PARQUET",
        Map.empty, 3L, dataFile.length(), Map.empty, Map.empty, Map.empty,
        Map.empty, Map.empty, Map.empty, Nil, Nil, None))
    val dataManifest = new File(metaDir, "foreign-m0.avro")
    ManifestIO.writeManifest(dataManifest, Seq(dataEntry), StructT(Nil))

    // delete manifest: the DV entry (PUFFIN + blob coordinates)
    val dvEntry = ManifestEntry(ManifestEntryStatus.Added, Some(77L),
      Some(1L), Some(1L),
      DataFileInfo(DataFileContent.PositionDeletes, puffin.getPath, "PUFFIN",
        Map.empty, 1L, puffin.length(), Map.empty, Map.empty, Map.empty,
        Map.empty, Map.empty, Map.empty, Nil, Nil, None,
        referencedDataFile = Some(dataFile.getPath),
        contentOffset = Some(metas.head.offset),
        contentSizeInBytes = Some(metas.head.length)))
    val dvManifest = new File(metaDir, "foreign-m1.avro")
    ManifestIO.writeManifest(dvManifest, Seq(dvEntry), StructT(Nil))

    // manifest list: row-lineage base lives at the MANIFEST level only
    val listFile = new File(metaDir, "foreign-snap.avro")
    ManifestIO.writeManifestList(listFile, Seq(
      ManifestFile(dataManifest.getPath, dataManifest.length(), 0, 0,
        1L, 1L, 77L, 1, 0, 0, 3L, 0L, 0L, Nil, 2, firstRowId = Some(100L)),
      ManifestFile(dvManifest.getPath, dvManifest.length(), 0, 1,
        1L, 1L, 77L, 1, 0, 0, 1L, 0L, 0L, Nil, 2)))

    // RAW metadata JSON, hand-written as a foreign engine serializes it
    val metadataJson = s"""{
      "format-version": 3,
      "table-uuid": "11111111-2222-3333-4444-555555555555",
      "location": "$loc",
      "last-sequence-number": 1,
      "last-updated-ms": 1700000000000,
      "last-column-id": 4,
      "current-schema-id": 0,
      "schemas": [{
        "type": "struct", "schema-id": 0, "fields": [
          {"id": 1, "name": "id", "required": false, "type": "long"},
          {"id": 2, "name": "v", "required": false, "type": "string"},
          {"id": 3, "name": "tier", "required": false, "type": "string",
           "initial-default": "basic", "write-default": "standard"},
          {"id": 4, "name": "mystery", "required": false, "type": "unknown"}
        ]}],
      "default-spec-id": 0,
      "partition-specs": [{"spec-id": 0, "fields": []}],
      "default-sort-order-id": 0,
      "sort-orders": [{"order-id": 0, "fields": []}],
      "properties": {},
      "next-row-id": 200,
      "current-snapshot-id": 77,
      "snapshots": [{
        "snapshot-id": 77, "sequence-number": 1,
        "timestamp-ms": 1700000000000,
        "manifest-list": "${listFile.getPath}",
        "summary": {"operation": "append"},
        "schema-id": 0, "first-row-id": 100
      }],
      "snapshot-log": [{"snapshot-id": 77, "timestamp-ms": 1700000000000}],
      "metadata-log": [],
      "refs": {"main": {"snapshot-id": 77, "type": "branch"}}
    }"""
    java.nio.file.Files.writeString(
      new File(metaDir, "v1.metadata.json").toPath, metadataJson)
    loc
  }

  test("defaults + inherited lineage + DV compose on a foreign V3 table") {
    val loc = buildForeignTable()
    val t = IcebergTables.load(loc)
    assert(t.metadata.formatVersion == 3)
    assert(t.metadata.nextRowId.contains(200L))
    assert(t.currentSnapshot.get.firstRowId.contains(100L))

    // the V3 `unknown` column surfaces as an always-null column
    val mystery = spark.read.format("icegopher").load(loc)
      .select("id", "mystery").collect()
    assert(mystery.length == 2 && mystery.forall(_.isNullAt(1)))

    // DSv2: the DV kills id=2; tier reads its initial-default; _row_id
    // inherits from the MANIFEST base (100) + position
    val rows = spark.read.format("icegopher").load(loc)
      .select(col("id"), col("v"), col("tier"), col("_row_id"),
        col("_last_updated_sequence_number"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(rows == Set((1L, "a", "basic", 100L, 1L),
      (3L, "c", "basic", 102L, 1L)), rows)

    // core toDF path: same composition (defaults + DV + lineage)
    val core = t.newScan().toDF(spark, keepProvenance = false,
        pathFilter = None, keepLineage = true)
      .select("id", "tier", "_row_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(core == Set((1L, "basic", 100L), (3L, "basic", 102L)), core)

    // a filter ON the defaulted column matches the old file's rows
    val n = spark.read.format("icegopher").load(loc)
      .filter(col("tier") === "basic").count()
    assert(n == 2)

    // this engine committing ON the foreign table preserves its V3-ness
    // and continues the id sequence from the foreign next-row-id
    val s2 = spark
    import s2.implicits._
    val t2 = TableWriter.append(t, Seq((9L, "z")).toDF("id", "v"))
    assert(t2.metadata.formatVersion == 3)
    assert(t2.metadata.nextRowId.contains(201L), t2.metadata.nextRowId)
    val appended = spark.read.format("icegopher").load(loc)
      .filter(col("id") === 9L)
      .select("tier", "_row_id").collect()(0)
    // write-default fills the omitted column; the new row's id starts at
    // the foreign table's next-row-id
    assert(appended.getString(0) == "standard" && appended.getLong(1) == 200L,
      appended.toString)
  }
}
