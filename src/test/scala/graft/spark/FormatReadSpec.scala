package graft.spark

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Mixed-format tables: data files with `file_format` ORC / AVRO read
  * through both the library scan and the DSv2 source, including MoR
  * positional deletes against non-parquet rows. (Our writers only produce
  * parquet; these files enter via hand-built manifests, the way an
  * external engine would have committed them.) */
class FormatReadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(name: String): String =
    Files.createTempDirectory(name).toFile.getPath

  /** Commit `path` (already written in `format` with rows matching the
    * table schema) as an APPEND snapshot via hand-built metadata. */
  private def appendForeignFile(loc: String, path: String, format: String,
                                rowCount: Long): IcebergTable = {
    val table = IcebergTables.load(loc)
    val md = table.metadata
    val seq = md.lastSequenceNumber + 1
    val snapId = System.nanoTime()
    val metaDir = new File(loc, "metadata")
    val info = DataFileInfo(DataFileContent.Data, path, format, Map.empty,
      rowCount, new File(path).length(), Map.empty, Map.empty, Map.empty,
      Map.empty, Map.empty, Map.empty, Nil, Nil, None)
    val entry = ManifestEntry(ManifestEntryStatus.Added, Some(snapId),
      Some(seq), Some(seq), info)
    val mf = new File(metaDir, s"manifest-foreign-$snapId.avro")
    ManifestIO.writeManifest(mf, Seq(entry), StructT(Nil))
    val manifest = ManifestFile(mf.getPath, mf.length(), 0, 0, seq, seq,
      snapId, 1, 0, 0, rowCount, 0, 0, Nil, 2)
    val prev = table.currentSnapshot.toSeq.flatMap(s =>
      ManifestIO.readManifestList(table.io.open(s.manifestList)))
    val listFile = new File(metaDir, s"snap-$snapId.avro")
    ManifestIO.writeManifestList(listFile, prev :+ manifest)
    val now = System.currentTimeMillis()
    val snapshot = Snapshot(snapId, table.currentSnapshot.map(_.snapshotId),
      seq, now, listFile.getPath, Some(SnapshotSummary(OpAppend)),
      Some(md.currentSchemaId))
    val next = md.copy(lastSequenceNumber = seq, lastUpdatedMs = now,
      snapshots = md.snapshots :+ snapshot, currentSnapshotId = Some(snapId),
      snapshotLog = md.snapshotLog :+ SnapshotLogEntry(snapId, now),
      refs = md.refs + (TableMetadata.MainBranch ->
        SnapshotRef(snapId, BranchRef)))
    val v = table.loadedVersion + 1
    Files.write(new File(metaDir, s"v$v.metadata.json").toPath,
      next.toJson.getBytes(StandardCharsets.UTF_8))
    Files.write(new File(metaDir, "version-hint.text").toPath,
      v.toString.getBytes(StandardCharsets.UTF_8))
    IcebergTables.load(loc)
  }

  private def writeAvro(dir: String, rows: Seq[(Long, String)]): String = {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = SchemaBuilder.record("r").fields()
      .requiredLong("id").requiredString("name").endRecord()
    val f = new File(dir, s"foreign-${System.nanoTime()}.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    rows.foreach { case (id, name) =>
      val r = new GenericData.Record(schema)
      r.put("id", id); r.put("name", name)
      w.append(r)
    }
    w.close()
    f.getPath
  }

  private def writeOrc(dir: String, rows: Seq[(Long, String)]): String = {
    val out = new File(dir, s"orc-${System.nanoTime()}")
    rows.toDF("id", "name").coalesce(1).write.orc(out.getPath)
    out.listFiles().find(_.getName.endsWith(".orc")).get.getPath
  }

  test("ORC and AVRO data files read through the library scan and DSv2") {
    val loc = tmpDir("tbl_fmt")
    val dataDir = new File(loc, "data"); // created by the parquet write
    TableWriter.create(Seq((1L, "pq")).toDF("id", "name").coalesce(1), loc)
    dataDir.mkdirs()

    appendForeignFile(loc, writeOrc(dataDir.getPath,
      Seq((2L, "orc-a"), (3L, "orc-b"))), "ORC", 2)
    val t = appendForeignFile(loc, writeAvro(dataDir.getPath,
      Seq((4L, "avro-a"), (5L, "avro-b"))), "AVRO", 2)

    // library scan: all three formats in one DataFrame
    val got = t.newScan().toDF(spark)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "pq"), (2L, "orc-a"), (3L, "orc-b"),
      (4L, "avro-a"), (5L, "avro-b")))

    // column pruning still applies
    assert(t.newScan(selected = Seq("name")).toDF(spark)
      .collect().map(_.getString(0)).toSet ==
      Set("pq", "orc-a", "orc-b", "avro-a", "avro-b"))

    // DSv2 source (row path forced by the mixed formats)
    val dsv2 = spark.read.format("icegopher").load(loc)
    assert(dsv2.count() == 5)
    assert(dsv2.filter(col("id") >= 4L).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((4L, "avro-a"), (5L, "avro-b")))
  }

  test("positional deletes apply to non-parquet rows (library + DSv2)") {
    val loc = tmpDir("tbl_fmt_del")
    TableWriter.create(Seq((1L, "pq")).toDF("id", "name").coalesce(1), loc)
    val dataDir = new File(loc, "data"); dataDir.mkdirs()
    appendForeignFile(loc, writeOrc(dataDir.getPath,
      Seq((2L, "orc-a"), (3L, "orc-b"))), "ORC", 2)
    val t = appendForeignFile(loc, writeAvro(dataDir.getPath,
      Seq((4L, "avro-a"), (5L, "avro-b"))), "AVRO", 2)

    // MoR delete hits one ORC row and one AVRO row — tombstones address
    // (path, row-position) synthesized by the non-parquet readers
    val t2 = TableWriter.deleteWhere(t, spark,
      col("id") === 3L || col("id") === 4L)

    val lib = t2.newScan().toDF(spark).collect().map(_.getLong(0)).toSet
    assert(lib == Set(1L, 2L, 5L), s"got $lib")
    val dsv2 = spark.read.format("icegopher").load(loc)
      .collect().map(_.getLong(0)).toSet
    assert(dsv2 == Set(1L, 2L, 5L), s"got $dsv2")
  }

  test("ORC and AVRO readers cover nulls, timestamps, dates, doubles, binary") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType),
      StructField("d", DoubleType),
      StructField("ts", TimestampType),
      StructField("day", DateType),
      StructField("bin", BinaryType),
      StructField("flag", BooleanType)))
    val rows = Seq(
      Row(1L, "a", 1.5, java.sql.Timestamp.valueOf("2024-03-01 10:00:00.123456"),
        java.sql.Date.valueOf("2024-03-01"), Array[Byte](1, 2, 3), true),
      Row(2L, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)

    val loc = tmpDir("tbl_fmt_types")
    TableWriter.create(df.limit(0), loc) // empty table fixes the schema
    val dataDir = new File(loc, "data"); dataDir.mkdirs()

    // ORC file with the full row set
    val orcOut = new File(dataDir, "orc-types")
    df.coalesce(1).write.orc(orcOut.getPath)
    val orcPath = orcOut.listFiles().find(_.getName.endsWith(".orc")).get.getPath
    val t1 = appendForeignFile(loc, orcPath, "ORC", 2)
    val got1 = t1.newScan().toDF(spark).orderBy("id").collect()
    assert(got1.length == 2)
    assert(got1(0).getString(1) == "a" && got1(0).getDouble(2) == 1.5)
    assert(got1(0).getTimestamp(3) ==
      java.sql.Timestamp.valueOf("2024-03-01 10:00:00.123456"))
    assert(got1(0).getDate(4) == java.sql.Date.valueOf("2024-03-01"))
    assert(got1(0).getAs[Array[Byte]](5).toSeq == Seq[Byte](1, 2, 3))
    assert(got1(0).getBoolean(6))
    assert((1 to 6).forall(got1(1).isNullAt))

    // AVRO file via the avro-core writer with logical types
    import org.apache.avro.{LogicalTypes, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val tsType = LogicalTypes.timestampMicros()
      .addToSchema(org.apache.avro.Schema.create(org.apache.avro.Schema.Type.LONG))
    val dateType = LogicalTypes.date()
      .addToSchema(org.apache.avro.Schema.create(org.apache.avro.Schema.Type.INT))
    val avroSchema = SchemaBuilder.record("r").fields()
      .requiredLong("id")
      .name("s").`type`().nullable().stringType().noDefault()
      .name("d").`type`().nullable().doubleType().noDefault()
      .name("ts").`type`().unionOf().nullType().and().`type`(tsType).endUnion().noDefault()
      .name("day").`type`().unionOf().nullType().and().`type`(dateType).endUnion().noDefault()
      .name("bin").`type`().nullable().bytesType().noDefault()
      .name("flag").`type`().nullable().booleanType().noDefault()
      .endRecord()
    val af = new File(dataDir, "types.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, af)
    val r1 = new GenericData.Record(avroSchema)
    r1.put("id", 3L); r1.put("s", "b"); r1.put("d", 2.5)
    r1.put("ts", 1709287200123456L) // micros
    r1.put("day", 19783) // days
    r1.put("bin", java.nio.ByteBuffer.wrap(Array[Byte](9)))
    r1.put("flag", false)
    w.append(r1)
    val r2 = new GenericData.Record(avroSchema)
    r2.put("id", 4L)
    w.append(r2)
    w.close()
    val t2 = appendForeignFile(loc, af.getPath, "AVRO", 2)
    val got2 = t2.newScan().toDF(spark).filter(col("id") >= 3L)
      .orderBy("id").collect()
    assert(got2.length == 2)
    assert(got2(0).getString(1) == "b" && got2(0).getDouble(2) == 2.5)
    assert(got2(0).getTimestamp(3).getTime == 1709287200123L)
    assert(got2(0).getDate(4).toLocalDate ==
      java.time.LocalDate.ofEpochDay(19783))
    assert(got2(0).getAs[Array[Byte]](5).toSeq == Seq[Byte](9))
    assert(!got2(0).getBoolean(6))
    assert((1 to 6).forall(got2(1).isNullAt))
  }

  test("unknown data format still fails loudly at plan time") {
    val loc = tmpDir("tbl_fmt_bad")
    TableWriter.create(Seq((1L, "pq")).toDF("id", "name").coalesce(1), loc)
    val dataDir = new File(loc, "data"); dataDir.mkdirs()
    val t = appendForeignFile(loc, writeAvro(dataDir.getPath,
      Seq((9L, "x"))), "CSV", 1)
    val e = intercept[UnsupportedOperationException](t.newScan().planFiles())
    assert(e.getMessage.contains("CSV"))
  }
}
