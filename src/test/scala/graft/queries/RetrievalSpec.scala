package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** Behavioral correctness of the retrieval / selection operators on planted
  * corpora (the battery entries hash-check them against DuckDB; these specs
  * check the SEMANTICS are the intended ones, not just engine agreement). */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docsDF(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def queryDF(rows: (Int, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("qid", "term")
  }

  // ---------- BM25

  test("bm25: docs containing the query term outrank docs without it") {
    val docs = docsDF(
      1L -> "apple banana cherry date",
      2L -> "banana cherry date egg",
      3L -> "apple apple banana cherry")
    val r = Retrieval.bm25RanksFrom(docs, queryDF(0 -> "apple"), k = 10)
      .collect().map(x => x.getLong(1) -> x.getInt(2)).toMap
    // doc 2 has no 'apple' → not retrieved at all (posting-list semantics)
    assert(!r.contains(2L))
    // doc 3 (tf=2, same length) outranks doc 1 (tf=1)
    assert(r(3L) < r(1L))
  }

  test("bm25: saturated tf — shorter doc wins at equal tf (length normalization)") {
    val docs = docsDF(
      1L -> "apple banana",
      2L -> "apple banana cherry date egg fig grape lemon mango peach",
      3L -> "kiwi lime")
    val r = Retrieval.bm25RanksFrom(docs, queryDF(0 -> "apple"), k = 10)
      .collect().map(x => x.getLong(1) -> x.getInt(2)).toMap
    assert(r(1L) < r(2L), s"short doc should outrank long at equal tf: $r")
  }

  test("bm25: multi-term queries sum per-term contributions") {
    val docs = docsDF(
      1L -> "apple banana cherry",
      2L -> "apple date egg",
      3L -> "fig grape lemon")
    val r = Retrieval.bm25RanksFrom(
      docs, queryDF(0 -> "apple", 0 -> "banana"), k = 10)
      .collect().map(x => x.getLong(1) -> x.getInt(2)).toMap
    // doc 1 matches both terms, doc 2 one, doc 3 none
    assert(r(1L) < r(2L) && !r.contains(3L))
  }

  test("t22 battery entry: ranks are 1..k per query, deterministic") {
    val a = Retrieval.t22Bm25(spark, sf).collect()
    val b = Retrieval.t22Bm25(spark, sf).collect()
    assert(a.sameElements(b))
    a.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted.sameElements(1 to rows.length))
    }
  }

  // ---------- Hybrid RRF

  test("rrf fusion: a doc in both shortlists outranks single-list docs of like rank") {
    val hybrid = Retrieval.ann12HybridRrf(spark, sf, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(hybrid.nonEmpty)
    // reconstruct the two input rank lists and check the RRF invariant on
    // the winner: fused rank 1 must have the maximal RRF score
    val v = Similarity.annBruteForce(spark, sf, nQueries = 3, k = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val docs = graft.tables.Tables.documents(spark, sf)
    val qdf = {
      val s = spark
      import s.implicits._
      Retrieval.QueryTerms.flatMap { case (q, ts) => ts.map(q -> _) }
        .toDF("qid", "term")
    }
    val b = Retrieval.bm25RanksFrom(docs, qdf, 20).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1)) -> r.getInt(2)).toMap
    def rrf(qid: Long, id: Long): Double =
      v.get(qid -> id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        b.get(qid -> id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
    hybrid.groupBy(_._1).foreach { case (qid, rows) =>
      val first = rows.minBy(_._3)
      val candidates = (v.keySet ++ b.keySet).collect { case (q, id) if q == qid => id }
      val best = candidates.map(id => rrf(qid, id)).max
      assert(math.abs(rrf(qid, first._2) - best) < 1e-12,
        s"qid=$qid fused winner ${first._2} is not the max-RRF doc")
    }
  }

  // ---------- SemDeDup

  test("semdedup: planted near-identical vectors are flagged, keep-first survives") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // mean-zero random directions (pairwise cosine spreads around 0, far
    // below tau) + near-copies of two members (cosine ≈ 1)
    val base = (0L until 20L).map(i => (i, Array.fill(8)(rnd.nextGaussian())))
    val dups = Seq(
      (100L, base(0)._2.map(_ + 1e-4)),
      (101L, base(1)._2.map(_ + 1e-4)))
    val emb = (base ++ dups).toDF("vec_id", "e")
      .select(col("vec_id"), expr("transform(e, x -> CAST(x AS DOUBLE))").as("e"))
    val out = Dedup.semanticDedup(emb, k = 2, tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(100L) && out(101L), s"planted copies must be flagged: $out")
    assert(!out(0L) && !out(1L), "originals (lowest id) must be kept")
    // blob members are similar but nowhere near tau → not flagged
    assert(out.count(_._2) == 2, s"only the two planted copies flagged: $out")
  }

  test("semdedup: comparisons are cluster-scoped (cross-cluster dup is missed by design)") {
    val s = spark
    import s.implicits._
    // vec 0 and 3 are identical, but first-k init (k=2 → cids 0,1) plus
    // one Lloyd step puts 3's twin in cluster 0 with it — so to plant a
    // CROSS-cluster miss, make 10 orbit centroid 1's blob while being a
    // byte-copy of 0... impossible for an exact copy (it lands with 0's
    // centroid). Instead: verify the pair set never crosses clusters.
    val rnd = new scala.util.Random(13)
    def vec(center: Double) = Array.fill(8)(center + rnd.nextGaussian() * 0.3)
    val emb = (0L until 30L).map(i => (i, vec(if (i < 15) 3.0 else -3.0)))
      .toDF("vec_id", "e")
      .select(col("vec_id"), expr("transform(e, x -> CAST(x AS DOUBLE))").as("e"))
    val assigned = Similarity.oneStepKmeansAssign(emb, 2)
      .select("vec_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flagged = Dedup.semanticDedup(emb, k = 2, tau = 0.999)
      .collect().filter(_.getBoolean(2)).map(_.getLong(0))
    // nothing at tau=0.999 among distinct gaussian draws
    assert(flagged.isEmpty)
    // and the two blobs really did land in two clusters (the scoping is real)
    assert(assigned.values.toSet.size == 2)
  }

  // ---------- DSIR

  test("dsir: docs made of target-only tokens get the top weights") {
    val s = spark
    import s.implicits._
    // target (lang=en) docs use vocabulary A; raw-only docs use vocabulary B
    val target = (0L until 10L).map(i => (i, "alpha beta gamma delta", "en"))
    val raw = (10L until 20L).map(i => (i, "omega psi chi phi", "xx"))
    val mixed = Seq((20L, "alpha beta omega psi", "xx"))
    val docs = (target ++ raw ++ mixed).toDF("doc_id", "text", "lang")
    val w = TextOps.dsirWeights(docs, col("lang") === "en", 64, 25)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val tMin = target.map(t => w(t._1)).min
    val rMax = raw.map(t => w(t._1)).max
    assert(tMin > rMax, s"target-vocab docs must outweigh raw-only docs: $w")
    // the mixed doc sits strictly between
    assert(w(20L) > rMax && w(20L) < tMin)
  }

  test("t23 battery entry: top-50, weights finite and non-increasing") {
    val rows = TextOps.t23DsirWeights(spark, sf).collect()
    assert(rows.length <= 50 && rows.nonEmpty)
    val ws = rows.map(_.getDouble(1))
    assert(ws.forall(v => !v.isNaN && !v.isInfinite))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
  }

  // ---------- Passage chunking

  test("passage chunks: hand-computed windows, straddling tail kept") {
    val toks50 = (0 until 50).map(i => s"w$i").mkString(" ")
    val out = TextOps.passageChunks(docsDF(1L -> toks50), size = 32, stride = 24)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
    // 50 tokens, stride 24 → starts 0/24/48; tail keeps its 2 tokens
    assert(out.toSeq == Seq((0, 0, 32), (1, 24, 26), (2, 48, 2)), out.toSeq)
  }

  // ---------- Curation pipeline

  test("curation pipeline: planted docs land in the right drop bucket, once each") {
    val s = spark
    import s.implicits._
    // guaranteed near-dup: SimHash is a bag-of-tokens fingerprint, so a
    // PERMUTED doc has the IDENTICAL fingerprint (hamming 0 — always in
    // banding reach) while its sha-256 differs (not an exact dup) — the
    // classic reordered-boilerplate case
    val rnd = new scala.util.Random(3)
    val toks = Array.tabulate(60)(i => s"w${i}_${rnd.nextInt(400)}")
    val long = toks.mkString(" ")                    // > 150 chars
    val near = toks.reverse.mkString(" ")
    val docs = Seq(
      (1L, "web", long),            // candidate (keeper)
      (2L, "web", long),            // exact dup of 1
      (3L, "web", near),            // near dup of 1
      (4L, "web", "tiny doc"),      // quality drop (< 150 chars)
      // a DISSIMILAR candidate in another source (fresh random tokens —
      // a near-copy of doc 1 would correctly drop as its near-dup)
      (5L, "books", Array.fill(60)(s"v${rnd.nextInt(400)}").mkString(" "))
    ).toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")))
    val out = TextOps.curationPipeline(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val web = out("web")
    assert((web.getLong(1), web.getLong(2), web.getLong(3), web.getLong(4)) ==
      ((1L, 1L, 1L, 1L)), s"web buckets: ${web}")
    // every doc counted exactly once across the four buckets
    out.values.foreach { r =>
      val total = r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)
      assert(total == (if (r.getString(0) == "web") 4L else 1L))
    }
    // selection only draws from candidates
    out.values.foreach(r => assert(r.getLong(6) <= r.getLong(4)))
  }

  test("t32 battery entry: per-source buckets partition the corpus") {
    val rows = TextOps.t32CurationPipeline(spark, sf).collect()
    val perSource = graft.tables.Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val total = r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)
      assert(total == perSource(r.getString(0)),
        s"${r.getString(0)}: buckets $total != docs ${perSource(r.getString(0))}")
      assert(r.getLong(6) <= r.getLong(4), "selected beyond candidates")
    }
  }

  // ---------- Count-min sketch

  test("count-min: estimates are exact-or-over, never under; tiny width forces overestimates") {
    // battery geometry (4×512): no collisions on this vocabulary — exact
    val wide = TextOps.t30CountMin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(wide.nonEmpty)
    wide.foreach { case (t, tru, est) =>
      assert(est >= tru, s"count-min underestimated '$t': $est < $tru") }
    // width 2: every bucket is shared → some estimate must exceed truth
    val narrow = TextOps.t30CountMin(spark, sf, depth = 2, width = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    narrow.foreach { case (t, tru, est) =>
      assert(est >= tru, s"narrow sketch underestimated '$t': $est < $tru") }
    assert(narrow.exists { case (_, tru, est) => est > tru },
      "a 2x2 sketch over this corpus must collide somewhere")
  }

  test("passage fingerprints: identical windows across docs collide (the dedup hook)") {
    val shared = (0 until 32).map(i => s"s$i").mkString(" ")
    val out = TextOps.passageChunks(
      docsDF(1L -> shared, 2L -> shared, 3L -> "totally different text here"),
      size = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(4)).toMap
    assert(out((1L, 0)) == out((2L, 0)), "same window must fingerprint equal")
    assert(out((1L, 0)) != out((3L, 0)), "different windows must differ")
  }
}
