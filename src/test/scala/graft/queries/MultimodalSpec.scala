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
}
