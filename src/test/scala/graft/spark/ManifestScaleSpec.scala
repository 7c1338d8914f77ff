package graft.spark

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Planning at metadata scale: a fabricated table whose snapshot carries
  * MORE manifests than the distributed-planning default threshold (1000).
  * The fixture is metadata-only — manifests, manifest list, and metadata
  * JSON written directly (as a foreign engine could have composed them),
  * with ONE real parquet data file that every entry references — so the
  * spec runs in seconds while the planner does 1200-manifest work. */
class ManifestScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val ManifestCount = 1200

  /** Build the fixture: `count` single-entry data manifests over one shared
    * parquet file, stats stamped so half the manifests are prunable. */
  private def build(count: Int = ManifestCount,
                    entriesPer: Int = 1): String = {
    val s = spark
    import s.implicits._
    val loc = Files.createTempDirectory("manifest_scale").toFile.getPath
    // one real data file; its stats rows are what every entry claims
    val seed = TableWriter.create(Seq((1L, "x"), (2L, "y")).toDF("id", "v"), loc)
    val snap = seed.currentSnapshot.get
    val dataEntry = ManifestIO.readManifestList(seed.io.open(snap.manifestList))
      .filter(_.content == 0)
      .flatMap(m => ManifestIO.readManifestEntries(seed.io.open(m.path), m))
      .head
    val metaDir = new File(loc, "metadata")
    val manifests = (0 until count).map { i =>
      // half the manifests claim id bounds [1000+i, 1000+i] → a filter on
      // id = 1 prunes them by file stats; the other half keep the real
      // file's bounds
      val lo = if (i % 2 == 0) 1L else 1000L + i
      val hi = if (i % 2 == 0) 2L else 1000L + i
      val bounds = Map(1 -> LongLit(lo).toBytes,
        2 -> dataEntry.dataFile.lowerBounds.getOrElse(2, Array[Byte](0)))
      val upper = Map(1 -> LongLit(hi).toBytes,
        2 -> dataEntry.dataFile.upperBounds.getOrElse(2, Array[Byte](0)))
      val e = dataEntry.copy(dataFile = dataEntry.dataFile.copy(
        lowerBounds = bounds, upperBounds = upper))
      val es = (0 until entriesPer).map(j => e.copy(dataFile =
        e.dataFile.copy(path = e.dataFile.path + f"#$j")))
      val mf = new File(metaDir, f"stress-manifest-$i%05d.avro")
      ManifestIO.writeManifest(mf, es, StructT(Nil))
      ManifestFile(mf.getPath, mf.length(), 0, 0,
        sequenceNumber = snap.sequenceNumber,
        minSequenceNumber = snap.sequenceNumber,
        addedSnapshotId = snap.snapshotId,
        addedFilesCount = 1, existingFilesCount = 0, deletedFilesCount = 0,
        addedRowsCount = 2, existingRowsCount = 0, deletedRowsCount = 0,
        partitions = Nil, formatVersion = 2)
    }
    val listFile = new File(metaDir, s"snap-stress-${snap.snapshotId}.avro")
    ManifestIO.writeManifestList(listFile, manifests)
    val md = seed.metadata
    val patched = md.copy(snapshots = md.snapshots.init :+
      md.snapshots.last.copy(manifestList = listFile.getPath))
    val next = new File(metaDir, s"v${seed.loadedVersion + 1}.metadata.json")
    java.nio.file.Files.writeString(next.toPath, patched.toJson)
    java.nio.file.Files.writeString(
      new File(metaDir, "version-hint.text").toPath,
      (seed.loadedVersion + 1).toString)
    loc
  }

  test("above-threshold planning runs distributed and prunes by stats") {
    val loc = build()
    val t = IcebergTables.load(loc)
    val before = DistributedPlanner.runs.get()
    // no table property, default threshold 1000 < 1200 → distributed
    val tasks = t.newScan(Expr.equalTo("id", LongLit(1L))).planFiles()
    assert(DistributedPlanner.runs.get() > before,
      s"$ManifestCount manifests must engage the distributed planner")
    // metrics pruning inside the distributed decode: only the 600
    // manifests whose claimed bounds cover id=1 survive
    assert(tasks.size == ManifestCount / 2, tasks.size)
    // and the result is exactly the driver path's
    val t2 = TableWriter.updateProperties(t,
      Map(DistributedPlanner.ThresholdProp -> Int.MaxValue.toString))
    val driverTasks = t2.newScan(Expr.equalTo("id", LongLit(1L))).planFiles()
    assert(driverTasks.size == tasks.size)
    assert(tasks.map(_.manifestPath).sorted == driverTasks.map(_.manifestPath).sorted)
  }

  /** Plan-latency measurement at 10⁴ manifests (the scale the distributed
    * path exists for). Env-gated — run explicitly with
    * `SPARK_GRAFT_SCALE_MEASURE=1 sbt "testOnly *ManifestScaleSpec*"`;
    * results are recorded in SCALE.md. Parity is asserted either way. */
  test("MEASURE: 10k-manifest plan latency, distributed vs driver") {
    assume(sys.env.contains("SPARK_GRAFT_SCALE_MEASURE"))
    val n = 10000
    val entriesPer = sys.env.get("SPARK_GRAFT_SCALE_ENTRIES")
      .flatMap(_.toIntOption).getOrElse(1)
    val loc = build(n, entriesPer)
    val t = IcebergTables.load(loc)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm both paths once (JIT + footer caches), then measure two runs
    val filter = Expr.equalTo("id", LongLit(1L))
    val tDrv = TableWriter.updateProperties(t,
      Map(DistributedPlanner.ThresholdProp -> Int.MaxValue.toString))
    t.newScan(filter).planFiles(); tDrv.newScan(filter).planFiles()
    val (distTasks, distSec) = timed(t.newScan(filter).planFiles())
    val (drvTasks, drvSec) = timed(tDrv.newScan(filter).planFiles())
    val (distSec2) = timed(t.newScan(filter).planFiles())._2
    val (drvSec2) = timed(tDrv.newScan(filter).planFiles())._2
    assert(distTasks.size == n / 2 * entriesPer &&
      drvTasks.size == n / 2 * entriesPer)
    info(f"distributed: $distSec%.2f s / $distSec2%.2f s; " +
      f"driver: $drvSec%.2f s / $drvSec2%.2f s ($n manifests)")
    println(f"MEASURE 10k plan: distributed $distSec%.2f/$distSec2%.2f s, " +
      f"driver $drvSec%.2f/$drvSec2%.2f s")
  }
}
