package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** Graph ANN (ann19): structural bounds (degree, visit budget),
  * determinism, and the ladder claim — recall at the graph's OWN visit
  * budget beats the quantization rungs given the same number of
  * exact-scored candidates. */
class GraphAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import GraphAnn.GraphParams

  test("result is deterministic and matches its own re-run") {
    val a = GraphAnn.annGraph(spark, sf).collect().map(_.toSeq).toSeq
    val b = GraphAnn.annGraph(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("graph out-degree never exceeds `degree`; visit budget holds") {
    val p = GraphParams()
    val visited = GraphAnn.annGraphVisited(spark, sf, p = p)
      .groupBy("qid").agg(countDistinct(col("nid")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(visited.nonEmpty)
    // closed-form budget: entry points + hops × beam × degree
    val budget = p.nCells + p.hops * p.beamWidth * p.degree
    visited.foreach { case (qid, n) =>
      assert(n <= budget, s"qid=$qid visited $n > budget $budget")
    }
  }

  test("recall beats the quantization rungs at an equal-or-smaller budget") {
    val bf = Similarity.annBruteForce(spark, sf, nQueries = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: DataFrame): Double =
      bf.count(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet) /
        bf.size.toDouble

    val p = GraphParams()
    val graph = recallOf(GraphAnn.annGraph(spark, sf))
    // the graph's ACTUAL budget: max exact-scored candidates any query used
    val visitedMax = GraphAnn.annGraphVisited(spark, sf, p = p)
      .groupBy("qid").agg(countDistinct(col("nid")).as("n"))
      .agg(max("n")).collect()(0).getLong(0).toInt

    // IVF-PQ granted a shortlist as large as the graph's whole visit
    // budget (it also ADC-scans every probed cell — a strictly LARGER
    // candidate set than the graph ever touches)
    val ivfpq = recallOf(Similarity.annTrainedIvfPq(spark, sf,
      nQueries = 10, k = 5, shortlist = visitedMax))
    assert(graph >= ivfpq,
      s"graph recall $graph (<= $visitedMax visited) must be >= " +
        s"trained IVF-PQ recall $ivfpq at shortlist=$visitedMax")
    assert(graph >= 0.8, s"graph recall $graph")
  }
}
