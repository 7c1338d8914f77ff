package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** The multimodal plumbing: binary payload round trip, per-partition decoder
  * reuse, and deterministic stub features. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("media table carries payload bytes + typed metadata") {
    val blobs = Multimodal.mediaTable(spark, sf)
    val first = blobs.filter(_.media_id == 0).collect()(0)
    assert(first.mime == "text/plain")
    assert(first.n_bytes == first.payload.length)
    assert(new String(first.payload, "UTF-8").startsWith("the fast key"))
  }

  test("feature extraction is deterministic and partition-parallel") {
    val feats1 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> (f.checksum, f.width, f.height)).toMap
    val feats2 = Multimodal.extractFeatures(
        Multimodal.mediaTable(spark, sf).repartition(7))
      .collect().map(f => f.media_id -> (f.checksum, f.width, f.height)).toMap
    assert(feats1 == feats2) // partitioning must not change features
    assert(feats1.size == 500)
    assert(feats1.values.forall { case (_, w, h) =>
      w >= 64 && w < 576 && h >= 64 && h < 576 })
  }

  test("content-defined chunking catches a byte-shifted duplicate that " +
      "fixed offsets miss") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // payload B = three bytes prepended to payload A: every fixed 32-byte
    // frame of B is misaligned with A's, but content-defined boundaries
    // re-synchronize right after the edit
    // non-repeating content (a repeating phrase would let fixed frames of
    // the shifted copy collide with frames of the original elsewhere)
    val rnd = new scala.util.Random(42)
    val base = Array.fill(1400)(('a' + rnd.nextInt(26)).toChar).mkString
    val other = Array.fill(300)(('A' + rnd.nextInt(26)).toChar).mkString
    val media = Seq(
      (1L, base.getBytes("UTF-8")),
      (2L, ("xy " + base).getBytes("UTF-8")),
      (3L, other.getBytes("UTF-8")))
      .toDF("media_id", "payload")

    val fixed = Multimodal.sharedChunkStats(
      Multimodal.fixedChunks(media, chunkLen = 32))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val cdc = Multimodal.sharedChunkStats(Multimodal.cdcChunks(media))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap

    // fixed offsets: the 3-byte shift desynchronizes every frame
    assert(fixed(1L) == 0.0 && fixed(2L) == 0.0,
      s"fixed-offset chunking unexpectedly matched shifted payloads: $fixed")
    // content-defined: most chunks re-align and are shared
    assert(cdc(1L) > 0.5 && cdc(2L) > 0.5,
      s"CDC chunking failed to catch the shifted duplicate: $cdc")
    assert(cdc(3L) == 0.0, s"unrelated payload must share nothing: $cdc")

    // the gear rolling-hash chunker (the single-pass 100 TB path) catches
    // the shifted duplicate through the same interface
    val gear = Multimodal.sharedChunkStats(Multimodal.gearChunks(media))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(gear(1L) > 0.5 && gear(2L) > 0.5,
      s"gear chunking failed to catch the shifted duplicate: $gear")
    assert(gear(3L) == 0.0, s"unrelated payload must share nothing: $gear")
    // deterministic across partitionings (per-partition gear state is
    // seeded, not accumulated across rows)
    val gear2 = Multimodal.sharedChunkStats(
      Multimodal.gearChunks(media.repartition(5)))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(gear == gear2, s"gear chunking not partitioning-independent")
  }

  test("gear and digest CDC chunkers agree on shared-chunk estimates " +
      "within tolerance on planted near-dups") {
    import spark.implicits._
    // A richer planted corpus: originals, byte-shifted near-dups (prefix
    // edits of varying length), and unrelated payloads. The two chunkers
    // cut at different boundaries (different window hashes), so per-media
    // ratios differ — but both must tell the same STORY: near-dup pairs
    // share most chunks, unrelated payloads share none.
    val rnd = new scala.util.Random(7)
    def blob(n: Int) = Array.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val bases = (0 until 6).map(i => i -> blob(900 + i * 100)).toMap
    val rows =
      bases.toSeq.flatMap { case (i, b) =>
        Seq((i * 10L, b.getBytes("UTF-8")),
          (i * 10L + 1, (blob(3 + i) + b).getBytes("UTF-8")))
      } ++ (100 until 104).map(j => (j.toLong, blob(700).getBytes("UTF-8")))
    val media = rows.toDF("media_id", "payload")

    def ratios(df: org.apache.spark.sql.DataFrame) =
      Multimodal.sharedChunkStats(df)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val cdc = ratios(Multimodal.cdcChunks(media))
    val gear = ratios(Multimodal.gearChunks(media))
    for (id <- cdc.keys) {
      val (c, g) = (cdc(id), gear(id))
      assert(math.abs(c - g) <= 0.25,
        s"media $id: gear $g vs digest $c disagree beyond tolerance")
      // same qualitative verdict: near-dup members well-shared, unrelated 0
      if (id >= 100) assert(c == 0.0 && g == 0.0,
        s"unrelated payload $id shares chunks: cdc=$c gear=$g")
      else assert(c > 0.5 && g > 0.5,
        s"planted near-dup $id under-shared: cdc=$c gear=$g")
    }
  }
}
