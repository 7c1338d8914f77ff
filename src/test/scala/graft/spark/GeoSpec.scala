package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** V3 geometry/geography: WKB authoring (envelope bounds written as bbox
  * corner POINTS per the spec), st_intersects_bbox file pruning including
  * the geography antimeridian rule, row-level envelope filtering, and the
  * refusal ladder (value predicates, non-geo columns, nonsense bboxes). */
class GeoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(name: String): String =
    Files.createTempDirectory(name).toFile.getPath

  private def pointCol(x: org.apache.spark.sql.Column,
                       y: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.spark.functions.StPointExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(x),
        org.apache.spark.sql.graft.ColumnShim.expression(y)))

  /** 40 points in 4 identity-partitioned x-bands of 10: band b covers
    * x ∈ [10b, 10b+9], y = x/2. */
  private def geoTable(loc: String): IcebergTable = {
    val src = (0L until 40L).map(i => (i, (i / 10L).toInt, i.toDouble,
      i.toDouble / 2)).toDF("id", "band", "x", "y")
      .withColumn("geom", pointCol(col("x"), col("y")))
    val schema = Schema(0, StructT(Seq(
      NestedField(1, "id", LongT),
      NestedField(2, "band", IntT),
      NestedField(3, "x", DoubleT),
      NestedField(4, "y", DoubleT),
      NestedField(5, "geom", GeometryT()))))
    TableWriter.createWithSchema(src, loc, schema,
      partitionBy = Seq("band" -> IdentityTransform))
  }

  test("WKB codec: point round-trip, envelopes, refusals") {
    val p = Wkb.pointWkb(12.5, -3.25)
    assert(p.length == 21)
    assert(Wkb.parsePoint(p).contains((12.5, -3.25)))
    // big-endian points from foreign writers parse too
    val be = java.nio.ByteBuffer.allocate(21)
    be.put(0.toByte); be.putInt(1); be.putDouble(1.5); be.putDouble(2.5)
    assert(Wkb.parsePoint(be.array()).contains((1.5, 2.5)))
    // linestring envelope
    val ls = java.nio.ByteBuffer.allocate(9 + 32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ls.put(1.toByte); ls.putInt(2); ls.putInt(2)
    ls.putDouble(-1.0); ls.putDouble(4.0); ls.putDouble(3.0); ls.putDouble(-2.0)
    assert(Wkb.envelope(ls.array()).contains((-1.0, -2.0, 3.0, 4.0)))
    // a linestring is not a point
    assert(Wkb.parsePoint(ls.array()).isEmpty)
    // ISO Z point (type 1001): x/y envelope exact, Z skipped
    val z = java.nio.ByteBuffer.allocate(29).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    z.put(1.toByte); z.putInt(1001)
    z.putDouble(1.0); z.putDouble(2.0); z.putDouble(3.0)
    assert(Wkb.envelope(z.array()).contains((1.0, 2.0, 1.0, 2.0)))
    // PostGIS EWKB: SRID-flagged point (0x20000001) with SRID word
    val e = java.nio.ByteBuffer.allocate(25).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    e.put(1.toByte); e.putInt(0x20000001); e.putInt(4326)
    e.putDouble(7.5); e.putDouble(-3.0)
    assert(Wkb.envelope(e.array()).contains((7.5, -3.0, 7.5, -3.0)))
    // EWKB Z|SRID linestring (0xA0000002): stride-3 coords, x/y envelope
    val ez = java.nio.ByteBuffer.allocate(9 + 4 + 4 + 48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ez.put(1.toByte); ez.putInt(0x80000000 | 0x20000000 | 2); ez.putInt(4326)
    ez.putInt(2)
    ez.putDouble(-1.0); ez.putDouble(4.0); ez.putDouble(99.0)
    ez.putDouble(3.0); ez.putDouble(-2.0); ez.putDouble(98.0)
    assert(Wkb.envelope(ez.array()).contains((-1.0, -2.0, 3.0, 4.0)))
    // unknown kind (99) and truncated/garbage bytes refuse
    val bad = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bad.put(1.toByte); bad.putInt(99); bad.putDouble(1.0); bad.putDouble(2.0)
    assert(Wkb.envelope(bad.array()).isEmpty)
    assert(Wkb.envelope(Array[Byte](1, 2, 3)).isEmpty)
    assert(Wkb.envelope(null).isEmpty)
  }

  test("WKB nesting depth: legitimate nesting parses, adversarial depth refuses") {
    // collection header: byte order + type(7) + member count(1)
    def nest(inner: Array[Byte], levels: Int): Array[Byte] =
      (0 until levels).foldLeft(inner) { (in, _) =>
        val bb = java.nio.ByteBuffer.allocate(9 + in.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(1.toByte); bb.putInt(7); bb.putInt(1); bb.put(in)
        bb.array()
      }
    val p = Wkb.pointWkb(3.0, -4.0)
    // realistic nesting (collection of collections) still yields the envelope
    assert(Wkb.envelope(nest(p, 3)).contains((3.0, -4.0, 3.0, -4.0)))
    // adversarial WKB: headers nested past any real geometry must return
    // None (prune-safe), not blow the task stack — StackOverflowError is
    // an Error and would escape the scan's Exception handling entirely
    assert(Wkb.envelope(nest(p, 40)).isEmpty)
    assert(Wkb.envelope(nest(p, 10000)).isEmpty)
  }

  test("geo predicates over non-geo columns stay residual-only (no scan failure)") {
    // a DDL-shaped table whose WKB lives in a PLAIN BINARY column: the
    // bbox function evaluates fine row-wise, but the column has no geo
    // bounds — the pushed predicate must be dropped from the prune
    // expression (bind fails), NOT fail the whole scan
    val loc = tmpDir("geo_residual")
    val src = (0L until 20L).map(i => (i, i.toDouble, i.toDouble / 2))
      .toDF("id", "x", "y")
      .withColumn("blob", pointCol(col("x"), col("y")))
    val schema = Schema(0, StructT(Seq(
      NestedField(1, "id", LongT),
      NestedField(2, "x", DoubleT),
      NestedField(3, "y", DoubleT),
      NestedField(4, "blob", BinaryT))))
    TableWriter.createWithSchema(src, loc, schema)
    spark.conf.set("spark.sql.catalog.ggeo", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ggeo.warehouse", tmpDir("geo_residwh"))
    spark.read.format("icegopher").load(loc).createOrReplaceTempView("gres")
    val ids = spark.sql(
      "SELECT id FROM gres WHERE ggeo.system.st_intersects_bbox(" +
        "blob, 5D, 0D, 12D, 100D)").collect().map(_.getLong(0)).toSet
    assert(ids == (5L to 12L).toSet, ids.toSeq.sorted)

    // binary equality on a GEO column converts but cannot bind (value
    // predicates on geometry refuse) — it too must stay residual-only
    val gloc = tmpDir("geo_eq_resid")
    geoTable(gloc)
    spark.read.format("icegopher").load(gloc).createOrReplaceTempView("geq")
    val probe = Wkb.pointWkb(5.0, 2.5)
    val hex = probe.map("%02X".format(_)).mkString
    val eqIds = spark.sql(
      s"SELECT id FROM geq WHERE geom = X'$hex'")
      .collect().map(_.getLong(0)).toSet
    assert(eqIds == Set(5L), eqIds)
  }

  test("geo table: WKB round-trips and envelope bounds land in manifests") {
    val loc = tmpDir("geo_tbl")
    val t = geoTable(loc)
    assert(t.metadata.formatVersion == 3, "geo types force V3")
    // born V3: the FIRST metadata write is already format-version 3 (a V2
    // JSON declaring geometry columns is spec-invalid even transiently)
    // and row lineage is assigned from 0 on the create commit
    val v1 = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(loc, "metadata").listFiles()
        .filter(_.getName.endsWith(".metadata.json")).minBy(_.getName).toPath))
    assert(v1.contains("\"format-version\": 3") ||
      v1.contains("\"format-version\":3"), "first metadata must be V3")
    assert(t.metadata.nextRowId.contains(40L), t.metadata.nextRowId)
    // every row's WKB parses back to its x/y
    val rows = t.newScan().toDF(spark).select("x", "y", "geom").collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      assert(Wkb.parsePoint(r.getAs[Array[Byte]]("geom"))
        .contains((r.getDouble(0), r.getDouble(1))))
    }
    // per-file bounds are envelope corner points: band 0 covers x [0, 9]
    val tasks = t.newScan().planFiles()
    val band0 = tasks.filter(_.file.partition.get("band").contains(0))
    assert(band0.nonEmpty)
    band0.foreach { task =>
      val lo = task.file.lowerBounds.get(5).flatMap(Wkb.parsePoint)
      val hi = task.file.upperBounds.get(5).flatMap(Wkb.parsePoint)
      assert(lo.exists(p => p._1 >= 0.0 && p._2 >= 0.0), lo)
      assert(hi.exists(p => p._1 <= 9.0 && p._2 <= 4.5), hi)
    }
  }

  test("st_intersects_bbox prunes files and filters rows consistently") {
    val loc = tmpDir("geo_prune")
    val t = geoTable(loc)
    val all = t.newScan().planFiles().size
    assert(all >= 4, s"expected >=4 files (one per band), got $all")
    // bbox covering only x in [12, 27] → bands 1 and 2 survive
    val bbox = Expr.stIntersectsBBox("geom", 12.0, 0.0, 27.0, 100.0)
    val pruned = t.newScan(bbox).planFiles().size
    assert(pruned < all, s"bbox must prune files: $pruned !< $all")
    // row-level: exactly ids 12..27 (points at x = id)
    val ids = t.newScan(bbox).toDF(spark).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == (12L to 27L).toSet, ids.toSeq.sorted)
    // a bbox beyond the data prunes everything
    assert(t.newScan(Expr.stIntersectsBBox("geom", 1000.0, 1000.0, 2000.0,
      2000.0)).planFiles().isEmpty)
    // NOT intersects: files entirely inside the query bbox prune away
    val notHit = t.newScan(Not(bbox)).toDF(spark).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(notHit == ((0L to 11L) ++ (28L to 39L)).toSet)
  }

  test("geography antimeridian: wrapped file bounds still prune correctly") {
    val field = NestedField(7, "region", GeographyT())
    val schema = Schema(0, StructT(Seq(field)))
    // file covering x ∈ [170, 180] ∪ [-180, -165] (wrapped), y ∈ [-10, 10]
    val stats = FileStats(recordCount = 10,
      valueCounts = Map(7 -> 10L), nullCounts = Map(7 -> 0L),
      lowerBounds = Map(7 -> Wkb.pointWkb(170.0, -10.0)),
      upperBounds = Map(7 -> Wkb.pointWkb(-165.0, 10.0)))
    def eval(xmin: Double, ymin: Double, xmax: Double, ymax: Double) =
      new InclusiveMetricsEvaluator(schema,
        Expr.stIntersectsBBox("region", xmin, ymin, xmax, ymax)).eval(stats)
    assert(eval(175.0, -5.0, 179.0, 5.0), "east side of the wrap must hit")
    assert(eval(-179.0, -5.0, -170.0, 5.0), "west side of the wrap must hit")
    assert(!eval(-100.0, -5.0, 0.0, 5.0), "the unwrapped middle must prune")
    assert(!eval(175.0, 50.0, 179.0, 60.0), "y disjoint must prune")
    // the same bounds on a GEOMETRY column do NOT wrap (lower.x > upper.x
    // never happens for planar writers; treat as unprunable → keep)
    val gSchema = Schema(0, StructT(Seq(NestedField(7, "region", GeometryT()))))
    assert(new InclusiveMetricsEvaluator(gSchema,
      Expr.stIntersectsBBox("region", -100.0, -5.0, 0.0, 5.0)).eval(stats))
  }

  test("geography table: authored + pruned end-to-end near the antimeridian") {
    val loc = tmpDir("geog_tbl")
    // two hemisphere bands around the antimeridian: west (-179..-170)
    // and east (170..179); y = index within band
    val src = (0L until 20L).map { i =>
      val east = i >= 10L
      val x = if (east) 170.0 + (i - 10L) else -179.0 + i
      (i, if (east) 1 else 0, x, (i % 10L).toDouble)
    }.toDF("id", "band", "x", "y")
      .withColumn("geom", pointCol(col("x"), col("y")))
    val schema = Schema(0, StructT(Seq(
      NestedField(1, "id", LongT),
      NestedField(2, "band", IntT),
      NestedField(3, "x", DoubleT),
      NestedField(4, "y", DoubleT),
      NestedField(5, "geom", GeographyT()))))
    val t = TableWriter.createWithSchema(src, loc, schema,
      partitionBy = Seq("band" -> IdentityTransform))
    assert(t.metadata.formatVersion == 3)
    assert(t.schema.findFieldByName("geom").get.fieldType == GeographyT())

    // an east-side query bbox prunes the west band's files entirely
    val all = t.newScan().planFiles().size
    val east = Expr.stIntersectsBBox("geom", 171.0, 0.0, 179.0, 9.0)
    assert(t.newScan(east).planFiles().size < all)
    val ids = t.newScan(east).toDF(spark).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == (11L to 19L).toSet, ids.toSeq.sorted)
  }

  test("refusal ladder: value predicates, non-geo columns, nonsense bbox") {
    val loc = tmpDir("geo_refuse")
    val t = geoTable(loc)
    // value predicates on geo still refuse
    intercept[UnsupportedOperationException] {
      t.newScan(Expr.equalTo("geom", BytesLit(Array[Byte](1)))).planFiles()
    }
    // bbox predicate on a non-geo column refuses at bind
    val e = intercept[IllegalArgumentException] {
      t.newScan(Expr.stIntersectsBBox("x", 0.0, 0.0, 1.0, 1.0)).planFiles()
    }
    assert(e.getMessage.contains("geometry"), e.getMessage)
    // nonsense bbox (min > max) refuses at construction
    intercept[IllegalArgumentException] {
      Expr.stIntersectsBBox("geom", 10.0, 0.0, -10.0, 1.0)
    }
    // IsNull/NotNull still fine
    assert(t.newScan(Expr.notNull("geom")).toDF(spark).count() == 40)
  }

  test("bbox read option: geo pruning through the plain DSv2 path") {
    val loc = tmpDir("geo_opt")
    geoTable(loc)
    val ids = spark.read.format("icegopher")
      .option("bbox", "12, 0, 27, 100")
      .option("bbox-column", "geom")
      .load(loc).select("id").collect().map(_.getLong(0)).toSet
    assert(ids == (12L to 27L).toSet, ids.toSeq.sorted)
    // a pushed COUNT must NOT be answered from manifest metadata under a
    // bbox — the row filter is invisible to file stats
    val n = spark.read.format("icegopher")
      .option("bbox", "12, 0, 27, 100").option("bbox-column", "geom")
      .load(loc).count()
    assert(n == 16L, s"bbox count must see the row filter, got $n")
    // infinite bbox corners survive codegen (half-open ranges are legal)
    val nInf = spark.read.format("icegopher")
      .option("bbox", "-Infinity, 0, Infinity, 100")
      .option("bbox-column", "geom")
      .load(loc).count()
    assert(nInf == 40L, nInf)
    // bbox without the column name refuses
    intercept[Exception] {
      spark.read.format("icegopher").option("bbox", "0,0,1,1")
        .load(loc).collect()
    }
    // malformed bbox refuses
    intercept[Exception] {
      spark.read.format("icegopher").option("bbox", "0,0,1")
        .option("bbox-column", "geom").load(loc).collect()
    }
  }

  test("partitioning by a geo column refuses") {
    val src = Seq((1L, 1.0, 2.0)).toDF("id", "x", "y")
      .withColumn("geom", pointCol(col("x"), col("y")))
    val schema = Schema(0, StructT(Seq(
      NestedField(1, "id", LongT), NestedField(2, "x", DoubleT),
      NestedField(3, "y", DoubleT), NestedField(4, "geom", GeometryT()))))
    val e = intercept[IllegalArgumentException] {
      TableWriter.createWithSchema(src, tmpDir("geo_part"), schema,
        partitionBy = Seq("geom" -> IdentityTransform))
    }
    assert(e.getMessage.contains("geometry"), e.getMessage)
  }

  test("SQL-native geo: graft.system.st_point / st_intersects_bbox") {
    val wh = tmpDir("geo_fnwh")
    spark.conf.set("spark.sql.catalog.ggeo", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ggeo.warehouse", wh)
    val r = spark.sql(
      "SELECT ggeo.system.st_intersects_bbox(" +
        "ggeo.system.st_point(5D, 5D), 0D, 0D, 10D, 10D) AS hit, " +
        "ggeo.system.st_intersects_bbox(" +
        "ggeo.system.st_point(50D, 5D), 0D, 0D, 10D, 10D) AS miss, " +
        "ggeo.system.st_point(1.5D, -2.5D) AS wkb").collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(Wkb.parsePoint(r.getAs[Array[Byte]]("wkb")).contains((1.5, -2.5)))

    // the same function filters a real geo table in plain SQL — identical
    // row semantics to the scan's bbox prune/filter
    val loc = tmpDir("geo_fn_tbl")
    geoTable(loc)
    spark.read.format("icegopher").load(loc).createOrReplaceTempView("gtbl")
    val ids = spark.sql(
      "SELECT id FROM gtbl WHERE ggeo.system.st_intersects_bbox(" +
        "geom, 12D, 0D, 27D, 100D)").collect().map(_.getLong(0)).toSet
    assert(ids == (12L to 27L).toSet, ids.toSeq.sorted)
    // NULL semantics: null geometry → NULL → filtered out, no crash
    assert(spark.sql("SELECT ggeo.system.st_intersects_bbox(" +
      "CAST(NULL AS BINARY), 0D, 0D, 1D, 1D)").collect()(0).isNullAt(0))
  }

  test("SQL st_intersects_bbox pushes down as a V2 predicate and prunes") {
    val loc = tmpDir("geo_push")
    geoTable(loc)
    spark.conf.set("spark.sql.catalog.ggeo", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ggeo.warehouse", tmpDir("geo_pushwh"))
    spark.read.format("icegopher").load(loc).createOrReplaceTempView("gp")

    def filesOf(df: org.apache.spark.sql.DataFrame): Int = {
      val scan = df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r.scan
      }.get
      "\\[(\\d+) files".r.findFirstMatchIn(scan.description()).get.group(1).toInt
    }

    val all = filesOf(spark.sql("SELECT id FROM gp"))
    val filtered = spark.sql("SELECT id FROM gp WHERE " +
      "ggeo.system.st_intersects_bbox(geom, 12D, 0D, 27D, 100D)")
    assert(filesOf(filtered) < all,
      s"SQL geo predicate must prune files (${filesOf(filtered)} !< $all)")
    assert(filtered.collect().map(_.getLong(0)).toSet == (12L to 27L).toSet)
    // ordinary comparison predicates still prune through the V2 path
    val idFiltered = spark.sql("SELECT id FROM gp WHERE band = 1")
    assert(filesOf(idFiltered) < all)
    assert(idFiltered.count() == 10L)
  }

  test("st_bbox_join: grid-bucketed pairs match quadratic truth; no cartesian") {
    import graft.queries.GeoJoin
    def boxCol(x0: org.apache.spark.sql.Column, y0: org.apache.spark.sql.Column,
               x1: org.apache.spark.sql.Column, y1: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graft.ColumnShim.column(
        graft.spark.functions.StBoxExpr(
          org.apache.spark.sql.graft.ColumnShim.expression(x0),
          org.apache.spark.sql.graft.ColumnShim.expression(y0),
          org.apache.spark.sql.graft.ColumnShim.expression(x1),
          org.apache.spark.sql.graft.ColumnShim.expression(y1)))
    // 200 points on a grid; 40 boxes of varying extent, some spanning
    // multiple cells, some empty of points
    val pts = (0L until 200L).map(i =>
      (i, (i % 20).toDouble * 3.0, (i / 20).toDouble * 5.0))
      .toDF("id", "px", "py")
      .withColumn("pg", pointCol(col("px"), col("py")))
    val boxes = (0L until 40L).map(j =>
      (j, (j % 8).toDouble * 6.0 - 2.0, (j % 5).toDouble * 9.0 - 3.0,
        (j % 8).toDouble * 6.0 - 2.0 + (3.0 + (j % 4) * 4.0),
        (j % 5).toDouble * 9.0 - 3.0 + (2.0 + (j % 3) * 6.0)))
      .toDF("sid", "bx0", "by0", "bx1", "by1")
      .withColumn("bg", boxCol(col("bx0"), col("by0"), col("bx1"), col("by1")))

    val joined = GeoJoin.stBboxJoin(
      pts.select("id", "px", "py", "pg"), "pg",
      boxes.select("sid", "bx0", "by0", "bx1", "by1", "bg"), "bg",
      cellSize = 7.0)
    val got = joined.select("id", "sid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // quadratic ground truth, driver-side over the tiny fixture
    val p = pts.select("id", "px", "py").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val b = boxes.select("sid", "bx0", "by0", "bx1", "by1").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val expect = (for {
      (id, x, y) <- p
      (sid, x0, y0, x1, y1) <- b
      if x >= x0 && x <= x1 && y >= y0 && y <= y1
    } yield (id, sid)).toSet
    assert(got == expect,
      s"missing=${expect -- got} extra=${got -- expect}")
    // exactly once per pair (no multi-cell duplicates)
    val n = joined.count()
    assert(n == expect.size.toLong, s"$n vs ${expect.size}")

    // plan audit: an equi-join on cell keys, never a cartesian
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)

    // an envelope spanning more cells than the cap fails LOUDLY
    val giant = Seq((99L, -1000.0, -1000.0, 1000.0, 1000.0))
      .toDF("sid", "bx0", "by0", "bx1", "by1")
      .withColumn("bg", boxCol(col("bx0"), col("by0"), col("bx1"), col("by1")))
    val e = intercept[Exception] {
      GeoJoin.stBboxJoin(pts.select("id", "pg"), "pg",
        giant.select("sid", "bg"), "bg",
        cellSize = 1.0, maxCellsPerRow = 64).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("st_bbox_join"),
      e.getMessage)
  }

  test("st_bbox_join geography: pairs straddling ±180° join; quadratic wrapped oracle") {
    import graft.queries.GeoJoin
    import graft.core.Wkb
    def boxCol(x0: org.apache.spark.sql.Column, y0: org.apache.spark.sql.Column,
               x1: org.apache.spark.sql.Column, y1: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graft.ColumnShim.column(
        graft.spark.functions.StBoxExpr(
          org.apache.spark.sql.graft.ColumnShim.expression(x0),
          org.apache.spark.sql.graft.ColumnShim.expression(y0),
          org.apache.spark.sql.graft.ColumnShim.expression(x1),
          org.apache.spark.sql.graft.ColumnShim.expression(y1)))
    // points clustered on BOTH sides of the antimeridian plus controls
    val lons = Seq(178.5, 179.5, -179.5, -178.5, -170.0, 170.0, 0.0, 10.0)
    val pts = (for {
      (lon, i) <- lons.zipWithIndex
      (lat, j) <- Seq(-4.0, 0.0, 4.0, 40.0).zipWithIndex
    } yield ((i * 10 + j).toLong, lon, lat))
      .toDF("id", "px", "py")
      .withColumn("pg", pointCol(col("px"), col("py")))
    // boxes as 2-point lines; the first two CROSS the seam (short-arc:
    // 179 → -179 spans 2°, not 358°), the rest are planar controls
    val boxes = Seq(
      (0L, 179.0, -5.0, -179.0, 5.0),   // wraps: [179, 180] ∪ [-180, -179]
      (1L, 175.0, -5.0, -175.0, 45.0),  // wraps, taller + wider
      (2L, 165.0, -5.0, 175.0, 5.0),    // planar, east side only
      (3L, -5.0, -5.0, 15.0, 5.0))      // planar, greenwich control
      .toDF("sid", "bx0", "by0", "bx1", "by1")
      .withColumn("bg", boxCol(col("bx0"), col("by0"), col("bx1"), col("by1")))

    val joined = GeoJoin.stBboxJoin(
      pts.select("id", "px", "pg"), "pg",
      boxes.select("sid", "bg"), "bg",
      cellSize = 8.0, geography = true)
    val got = joined.select("id", "sid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // quadratic WRAPPED oracle, driver-side, from the same short-arc
    // envelope definition (Wkb.geoEnvelope) + the spec's wrap-intersect
    def envOf(rows: Array[org.apache.spark.sql.Row]): Seq[(Long, (Double, Double, Double, Double))] =
      rows.map(r => r.getLong(0) ->
        Wkb.geoEnvelope(r.getAs[Array[Byte]](1)).get).toSeq
    val pe = envOf(pts.select("id", "pg").collect())
    val be = envOf(boxes.select("sid", "bg").collect())
    def xSegs(e: (Double, Double, Double, Double)): Seq[(Double, Double)] =
      if (e._1 <= e._3) Seq((e._1, e._3)) else Seq((e._1, 180.0), (-180.0, e._3))
    val expect = (for {
      (id, p) <- pe
      (sid, b) <- be
      if p._2 <= b._4 && b._2 <= p._4 // y overlap
      if xSegs(p).exists { case (ps, pe0) =>
        xSegs(b).exists { case (bs, be0) =>
          math.max(ps, bs) <= math.min(pe0, be0) } }
    } yield (id, sid)).toSet
    assert(got == expect,
      s"missing=${expect -- got} extra=${got -- expect}")
    // exactly once per pair, even when both sides wrap
    assert(joined.count() == expect.size.toLong)

    // the straddling pairs REALLY are there: the 179.5 and -179.5 points
    // both join the wrapped box 0 (a planar join would have missed the
    // cross-seam side)
    val wrappedHits = got.filter(_._2 == 0L).map(_._1)
    val lonOf = pts.select("id", "px").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wrappedHits.exists(id => lonOf(id) > 179.0))
    assert(wrappedHits.exists(id => lonOf(id) < -179.0))
    assert(expect.nonEmpty && wrappedHits.nonEmpty)

    // plan audit: still an equi-join on cell keys, no cartesian
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)

    // planar mode on the same data misses the cross-seam pairs (the gap
    // this flag closes) — and never returns pairs geography mode lacks
    val planar = GeoJoin.stBboxJoin(
      pts.select("id", "pg"), "pg", boxes.select("sid", "bg"), "bg",
      cellSize = 8.0, maxCellsPerRow = 512)
      .select("id", "sid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!planar.exists { case (id, sid) =>
      sid == 0L && lonOf(id) < -179.0 })
  }

  test("createWithSchema refuses a mismatched frame") {
    val src = Seq((1L, "x")).toDF("id", "name")
    val schema = Schema(0, StructT(Seq(
      NestedField(1, "id", LongT), NestedField(2, "geom", GeometryT()))))
    intercept[IllegalArgumentException] {
      TableWriter.createWithSchema(src, tmpDir("geo_bad"), schema)
    }
  }
}
