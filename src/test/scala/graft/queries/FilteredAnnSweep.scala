package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** One-off diagnostic sweep (env-gated): recall/cost vs minCandidates. */
class FilteredAnnSweep extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("MEASURE: recall vs minCandidates") {
    assume(sys.env.contains("GRAFT_SWEEP"))
    val pred = col("label").isin(1, 4, 7)
    val bf = FilteredAnn.filteredBrute(spark, sf, pred)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (mc <- Seq(160, 180, 200, 240, 290)) {
      val p = FilteredAnn.FilterParams(minCandidates = mc)
      val got = FilteredAnn.annFiltered(spark, sf, pred, p = p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val cells = FilteredAnn.probeDepth(spark, sf, pred, p = p)
        .agg(avg("cells")).collect()(0).getDouble(0)
      println(f"minCand=$mc%4d avgCells=$cells%5.2f recall=${bf.count(got) / bf.size.toDouble}%.3f")
    }
  }
}
