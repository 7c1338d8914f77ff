package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.spark.SparkTestSession

/** t19 sequence packing: the running token offset must be a hierarchical
  * prefix sum, NOT a per-source window — a skewed corpus's dominant source
  * (web crawl at 60-80% is the normal shape) would otherwise sort and scan
  * through a single window task. These specs pin both halves:
  *   - bit-identical output vs the naive single-window-per-source cumsum
  *     on a heavily skewed fixture (long addition is associative, so the
  *     shard decomposition must not change any offset)
  *   - the row-level window partitions on (source, shard), so the dominant
  *     source is processed by >1 window group, and the only per-source
  *     window in the plan runs over the metadata-sized shard rollup
  */
class SeqPackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Skewed fixture: one dominant source (90% of docs), two small ones.
    * Token counts vary per doc so offsets are not trivially regular. */
  private def skewedOn(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    (0 until 1000).map { i =>
      val src = if (i % 10 == 9) (if (i % 20 == 9) "wiki" else "books")
                else "crawl"
      (src, i.toLong, (i % 37 + 1).toLong)
    }.toDF("source", "doc_id", "toks")
  }
  private def skewed = skewedOn(spark)

  test("sharded packing is bit-identical to the single-window cumsum") {
    val budget = 64
    val naive = {
      val w = Window.partitionBy("source").orderBy("doc_id")
      skewed
        .withColumn("start_tok", sum(col("toks")).over(w) - col("toks"))
        .withColumn("pack_id", floor(col("start_tok") / budget))
        .groupBy("source", "pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("tokens_begun"),
          max(when(col("start_tok") + col("toks") >
            (col("pack_id") + 1) * budget, 1L).otherwise(0L)).as("straddles"))
        .orderBy("source", "pack_id")
    }
    for (shards <- Seq(1, 2, 8, 32, 1000)) {
      val got = TextOps.packSequences(skewed, budget, shards)
      assert(got.collect().toSeq == naive.collect().toSeq,
        s"shards=$shards diverges from the single-window reference")
    }
  }

  test("dominant source is processed by more than one window group") {
    import org.apache.spark.sql.execution.window.WindowExec
    // AQE-off session so WindowExec nodes are visible on executedPlan
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val df = TextOps.packSequences(skewedOn(s), 64, 8)
    val windows = df.queryExecution.executedPlan.collect {
      case w: WindowExec => w.partitionSpec.map(_.sql)
    }
    assert(windows.nonEmpty, "no window operators visible — audit vacuous")
    // Exactly one window may partition on source alone: the shard-rollup
    // window over shards × |sources| rows. The row-level window must
    // include the shard key.
    val perSourceOnly = windows.filter(p =>
      p.exists(_.contains("source")) && !p.exists(_.contains("_shard")))
    val withShard = windows.filter(_.exists(_.contains("_shard")))
    assert(withShard.nonEmpty,
      s"row-level window does not partition on _shard: $windows")
    assert(perSourceOnly.size <= 1,
      s"more than one per-source-only window (row data would serialize): $windows")
  }

  test("shard decomposition actually splits the dominant source's rows") {
    // Data-level check, independent of plan shapes: with the fixture's 900
    // crawl docs and 8 value-range shards, every shard must be non-empty
    // and no shard may hold the whole source.
    val shards = 8
    val bounds = skewed.groupBy("source")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
    val counts = skewed.join(bounds, "source")
      .withColumn("shard",
        floor((col("doc_id") - col("mn")) * shards / (col("mx") - col("mn") + 1)))
      .filter(col("source") === "crawl")
      .groupBy("shard").count().collect()
    assert(counts.length == shards,
      s"expected $shards non-empty crawl shards, got ${counts.length}")
    assert(counts.map(_.getLong(1)).max < 900,
      "one shard holds the entire dominant source")
  }
}
