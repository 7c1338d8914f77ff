package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** TEMPORARY diagnostic (env-gated): prints graph-ANN recall across
  * parameter combos to pick battery defaults. */
class GraphParamProbe extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("probe recall across params") {
    assume(sys.env.contains("SPARK_GRAFT_PROBE"))
    val bf = Similarity.annBruteForce(spark, sf, nQueries = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    import GraphAnn.GraphParams
    val combos = Seq(
      GraphParams(),
      GraphParams(refine = 2),
      GraphParams(degree = 12, refine = 1),
      GraphParams(degree = 12, refine = 2),
      GraphParams(beamWidth = 16, hops = 4, refine = 1),
      GraphParams(degree = 12, beamWidth = 16, hops = 4, refine = 2),
      GraphParams(nCells = 32, degree = 12, refine = 2))
    combos.foreach { p =>
      val got = GraphAnn.annGraph(spark, sf, p = p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val vis = GraphAnn.annGraphVisited(spark, sf, p = p)
        .groupBy("qid").agg(org.apache.spark.sql.functions.countDistinct("nid").as("n"))
        .agg(org.apache.spark.sql.functions.max("n")).collect()(0).getLong(0)
      println(f"PROBE $p recall=${bf.count(got) / bf.size.toDouble}%.2f maxVisited=$vis")
    }
  }
}
