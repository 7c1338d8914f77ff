package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** Filtered ANN (ann21): exactness at full budget, recall at the battery
  * budget, predicate-adaptive probe widening, and the post-filter
  * pathology it exists to avoid. */
class FilteredAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import FilteredAnn.FilterParams

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("full candidate budget degenerates to exact filtered brute force") {
    val pred = col("label").isin(1, 4, 7)
    // minCandidates >= corpus: every non-empty cell probed -> exact
    val full = FilteredAnn.annFiltered(spark, sf, pred,
      p = FilterParams(minCandidates = 1000000))
    val brute = FilteredAnn.filteredBrute(spark, sf, pred)
    assert(full.collect().map(_.toSeq).toSeq ==
      brute.collect().map(_.toSeq).toSeq)
    assert(pairs(full).nonEmpty)
  }

  test("every result row satisfies the predicate; self excluded") {
    val res = FilteredAnn.ann21Filtered(spark, sf)
    val lbl = res.join(
      graft.tables.Tables.embeddings(spark, sf)
        .select(col("vec_id").as("nid"), col("label")), "nid")
    assert(lbl.filter(!col("label").isin(1, 4, 7)).count() == 0)
    assert(res.filter(col("qid") === col("nid")).count() == 0)
  }

  test("recall vs filtered brute force at the battery budget") {
    val pred = col("label").isin(1, 4, 7)
    val bf = pairs(FilteredAnn.filteredBrute(spark, sf, pred))
    val got = pairs(FilteredAnn.annFiltered(spark, sf, pred))
    val recall = bf.count(got) / bf.size.toDouble
    assert(recall >= 0.8, s"filtered-ANN recall $recall")
  }

  test("selective predicate widens the probe; wide predicate stays shallow") {
    val narrow = FilteredAnn.probeDepth(spark, sf, col("label") === 3)
      .agg(avg("cells")).collect()(0).getDouble(0)
    val wide = FilteredAnn.probeDepth(spark, sf,
        col("label").isin(0, 1, 2, 3, 4, 5, 6, 7))
      .agg(avg("cells")).collect()(0).getDouble(0)
    assert(narrow > wide,
      s"a ~10% predicate must probe more cells ($narrow) than an ~80% one ($wide)")
  }

  test("beats post-filtering an unfiltered ANN under a selective predicate") {
    val pred = col("label") === 3
    val bf = pairs(FilteredAnn.filteredBrute(spark, sf, pred))
    // post-filter strawman: unfiltered IVF top-5, keep label-3 rows only
    val post = Similarity.annIvf(spark, sf)
      .join(graft.tables.Tables.embeddings(spark, sf)
        .select(col("vec_id").as("nid"), col("label")), "nid")
      .filter(pred)
      .select("qid", "nid")
    val postRecall = bf.count(pairs(post)) / bf.size.toDouble
    val filtered = pairs(FilteredAnn.annFiltered(spark, sf, pred))
    val filteredRecall = bf.count(filtered) / bf.size.toDouble
    assert(filteredRecall > postRecall,
      s"filtered-ANN recall $filteredRecall must beat post-filter $postRecall")
  }

  test("result is deterministic across re-runs") {
    val a = FilteredAnn.ann21Filtered(spark, sf).collect().map(_.toSeq).toSeq
    val b = FilteredAnn.ann21Filtered(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }
}
