package graft.queries

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** Correctness of the non-SQL-expressible pipeline operators: MinHash-LSH
  * must find planted near-duplicates (recall), SimHash must rank planted
  * near-dups closest, LSH ANN must approximate brute-force top-k. */
class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Corpus with planted near-duplicates: pairs (i, i+1000) share ~90% of
    * their tokens; everything else is dissimilar. */
  private def plantedDocs = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 400).map(i => s"w$i")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0 until 30).map(i => (i.toLong, doc(60)))
    val dups = base.take(10).map { case (i, text) =>
      val toks = text.split(" ")
      // mutate ~10% of tokens
      val mutated = toks.zipWithIndex.map { case (t, j) =>
        if (j % 10 == 0) vocab(rnd.nextInt(vocab.size)) else t
      }
      (i + 1000, mutated.mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  test("minhash LSH recalls planted near-dup pairs") {
    val pairs = Dedup.minhashPairs(plantedDocs, shingleN = 1, k = 16, bands = 8,
      bucketCap = 100, topK = 50).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 10).map(i => (i.toLong, i + 1000L))
    val recall = expected.count(found.contains).toDouble / expected.size
    assert(recall >= 0.9, s"recall $recall; found=${found.take(20)}")
    // planted pairs verify with high exact jaccard
    val plantedJ = pairs.filter(r => expected.contains((r.getLong(0), r.getLong(1))))
      .map(_.getDouble(2))
    assert(plantedJ.forall(_ > 0.5))
  }

  test("simhash finds very-near dups (its detection regime is hamming<=3 per band math)") {
    // SimHash 4x16-bit banding guarantees candidates at hamming<=3, i.e.
    // ~97%+ similarity — plant dups with only ~2% of tokens mutated
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 400).map(i => s"w$i")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0 until 30).map(i => (i.toLong, doc(100)))
    val dups = base.take(10).map { case (i, text) =>
      val toks = text.split(" ")
      val mutated = toks.zipWithIndex.map { case (t, j) =>
        if (j == 50 || j == 99) vocab(rnd.nextInt(vocab.size)) else t
      }
      (i + 1000, mutated.mkString(" "))
    }
    val docs = (base ++ dups).toDF("doc_id", "text")
    val pairs = Dedup.d02SimhashPairsFrom(docs, maxHamming = 16, topK = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue()))
    val expected = (0 until 10).map(i => (i.toLong, i + 1000L)).toSet
    val hits = pairs.count(p => expected.contains((p._1, p._2)))
    assert(hits >= 8, s"only $hits planted pairs found: ${pairs.toSeq}")
  }

  test("simhash degenerate buckets are capped: identical-fingerprint floods " +
      "are dropped, genuine pairs elsewhere survive") {
    // The web-scale failure mode: boilerplate-identical documents share ONE
    // fingerprint, land in the same bucket in every band, and an uncapped
    // self-join goes O(bucket²). Plant 50 identical docs (one degenerate
    // bucket per band) plus one genuine near-dup pair with different text.
    import spark.implicits._
    val boiler = (0L until 50L).map(i => (i, "common license header boilerplate text repeated"))
    val pairDocs = Seq(
      (100L, "a genuinely distinct document about distributed query engines"),
      (101L, "a genuinely distinct document about distributed query engines"))
    val docs = (boiler ++ pairDocs).toDF("doc_id", "text")
    val capped = Dedup.simhashBandedPairs(docs, Dedup.md5Hash64, bucketCap = 10,
      slot = new CacheSlot).collect()
    // the 50-doc flood (50*49/2 = 1225 pairs) is gone; the 2-doc bucket stays
    assert(capped.length == 1, s"expected 1 surviving pair, got ${capped.length}")
    assert(capped.head.getLong(0) == 100L && capped.head.getLong(1) == 101L)
    val uncapped = Dedup.simhashBandedPairs(docs, Dedup.md5Hash64, bucketCap = 1000,
      slot = new CacheSlot).count()
    assert(uncapped == 1226L, s"uncapped should see the flood: $uncapped")
  }

  test("lsh ann approximates brute-force top-k with decent recall") {
    val bf = Similarity.annBruteForce(spark, sf, nQueries = 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // generous banding on random vectors (the hardest case for LSH)
    val lsh = Similarity.annLsh(spark, sf, nQueries = 10, k = 5,
      nBits = 16, bandBits = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.count(lsh.contains).toDouble / bf.size
    assert(recall >= 0.5, s"LSH recall vs brute force = $recall")
  }

  test("multi-probe lsh lifts recall at fixed banding") {
    val bf = Similarity.annBruteForce(spark, sf, nQueries = 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(multiProbe: Boolean): Double = {
      val got = Similarity.annLsh(spark, sf, nQueries = 10, k = 5,
        nBits = 16, bandBits = 4, multiProbe = multiProbe).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      bf.count(got.contains).toDouble / bf.size
    }
    val plain = recallOf(multiProbe = false)
    val probed = recallOf(multiProbe = true)
    // hamming-1 neighbor buckets can only ADD candidates: recall is
    // monotone, and on random vectors (LSH's hardest case) it must
    // measurably improve at this tight banding
    assert(probed >= plain, s"multi-probe $probed < plain $plain")
    assert(probed > plain, s"multi-probe must lift recall at bandBits=4 " +
      s"(plain=$plain probed=$probed)")
  }

  test("kmeans converges on a separable corpus, centroids never collected") {
    import spark.implicits._
    // three well-separated clusters in 8 dims, 40 points each
    val pts = for {
      c <- 0 until 3
      i <- 0 until 40
    } yield {
      val rnd = new scala.util.Random(c * 1000 + i)
      val center = Array.tabulate(8)(j => if (j % 3 == c) 10.0 else 0.0)
      ((c * 40 + i).toLong,
        center.map(v => (v + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
    val df = pts.toDF("id", "vec")
    val out = Similarity.kmeans(df, "id", "vec", k = 3, maxIter = 25).collect()
    assert(out.length == 120)
    // every planted cluster maps to exactly one k-means cluster, and the
    // three are distinct (perfect separation ⇒ perfect clustering)
    val byPlanted = out.groupBy(_.getLong(0) / 40)
      .map { case (p, rows) => p -> rows.map(_.getLong(1)).toSet }
    assert(byPlanted.values.forall(_.size == 1), s"impure clusters: $byPlanted")
    assert(byPlanted.values.flatten.toSet.size == 3, s"merged clusters: $byPlanted")
    // converged assignment: every point is nearest its own centroid, so
    // max within-cluster distance is far below the between-center gap
    assert(out.map(_.getDouble(2)).max < 10.0, "distances look unconverged")
  }

  test("sampled kmeans init reaches at-most the inertia of first-k init") {
    import spark.implicits._
    // three well-separated clusters, and the k lowest ids are IDENTICAL
    // points (dedup'd crawl data is full of this): first-k seeds three
    // coincident centroids, every point tie-breaks to the first, the other
    // two clusters drop out, and the run degenerates to k=1 — the id-layout
    // failure mode first-k cannot escape. Hash-spread sampling is immune.
    val pts = for {
      c <- 0 until 3
      i <- 0 until 40
    } yield {
      val rnd = new scala.util.Random(c * 1000 + i)
      val center = Array.tabulate(8)(j => if (j % 3 == c) 100.0 else 0.0)
      val v = if (c == 0 && i < 3) center.map(_.toFloat).toSeq
        else center.map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq
      ((c * 40 + i).toLong, v)
    }
    val df = pts.toDF("id", "vec")
    def inertia(initMode: String): Double =
      Similarity.kmeans(df, "id", "vec", k = 3, maxIter = 8,
          initMode = initMode).collect().map(_.getDouble(2)).sum
    val firstK = inertia("first-k")
    val sampled = inertia("sample")
    assert(sampled <= firstK,
      s"sampled init inertia $sampled > first-k $firstK")
    // on this layout the gap is structural, not a tie
    assert(sampled < firstK / 2,
      s"sampled=$sampled first-k=$firstK: expected a structural gap")
  }

  test("ivf ann approximates brute-force top-k with decent recall") {
    val bf = Similarity.annBruteForce(spark, sf, nQueries = 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // probing a quarter of the cells on random vectors (hard case for IVF:
    // no cluster structure, neighbors scatter across cells)
    val ivf = Similarity.annIvf(spark, sf, nQueries = 10, k = 5,
      nCells = 16, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.count(ivf.contains).toDouble / bf.size
    assert(recall >= 0.4, s"IVF recall vs brute force = $recall")
    // every query still returns a full top-k from its probed cells
    val perQuery = Similarity.annIvf(spark, sf, nQueries = 10, k = 5,
      nCells = 16, nProbe = 8).collect().groupBy(_.getLong(0))
    assert(perQuery.size == 10 && perQuery.values.forall(_.length == 5))
  }

  test("ivf-pq ann: probe-bounded residual codes still recall brute-force top-k") {
    val bf = Similarity.annBruteForce(spark, sf, nQueries = 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // double approximation (cell probe bound AND code compression) on
    // random vectors — the hardest case for both; generous probes
    val ivfpq = Similarity.annIvfPq(spark, sf, nQueries = 10, k = 5,
      nCells = 16, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.count(ivfpq.contains).toDouble / bf.size
    assert(recall >= 0.3, s"IVF-PQ recall vs brute force = $recall")
    // full top-k per query with dense ranks
    val perQuery = Similarity.annIvfPq(spark, sf, nQueries = 10, k = 5)
      .collect().groupBy(_.getLong(0))
    assert(perQuery.values.forall(_.map(_.getInt(2)).sorted.toSeq == (1 to 5)),
      "ranks must be dense 1..k per query")
  }

  test("sq8 ann: byte-quantized coordinates recall brute-force top-k near-exactly") {
    val bf = Similarity.annBruteForce(spark, sf, nQueries = 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // SQ8 keeps per-coordinate error < Δ/510 of the dimension range — far
    // gentler than PQ's subspace collapse, so recall should be near-total
    val sq = Similarity.annSq8(spark, sf, nQueries = 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.count(sq.contains).toDouble / bf.size
    assert(recall >= 0.9, s"SQ8 recall vs brute force = $recall")
    val perQuery = Similarity.annSq8(spark, sf, nQueries = 10, k = 5)
      .collect().groupBy(_.getLong(0))
    assert(perQuery.size == 10 &&
      perQuery.values.forall(_.map(_.getInt(2)).sorted.toSeq == (1 to 5)))
  }

  test("pq ann: 32x-compressed codes still recall brute-force top-k") {
    val bf = Similarity.annBruteForce(spark, sf, nQueries = 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.annPq(spark, sf, nQueries = 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // random vectors are PQ's hard case (no subspace structure to exploit);
    // a 50-of-500 ADC shortlist still has to carry most of the true top-5
    val recall = bf.count(pq.contains).toDouble / bf.size
    assert(recall >= 0.5, s"PQ recall vs brute force = $recall")
    // full top-k per query, ranks dense 1..k
    val perQuery = Similarity.annPq(spark, sf, nQueries = 10, k = 5).collect()
      .groupBy(_.getLong(0))
    assert(perQuery.size == 10 &&
      perQuery.values.forall(_.map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
  }

  test("exact dedup flags identical texts") {
    import spark.implicits._
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = TextOps.exactDedupFrom(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("CacheSlot.releaseAll drops every slot's cached blocks") {
    // materialize a slot-cached pipeline so its persist holds real blocks
    Dedup.d01MinhashLsh(spark, sf).count()
    val cachedBefore = spark.sparkContext.getPersistentRDDs.values
      .count(_.getStorageLevel.useMemory)
    assert(cachedBefore > 0, "expected slot-cached RDDs before release")
    CacheSlot.releaseAll()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"blocks survived releaseAll: ${spark.sparkContext.getPersistentRDDs}")
    // slots refill transparently on next use
    assert(Dedup.d01MinhashLsh(spark, sf).count() > 0)
  }

  test("pii scan finds and redacts planted emails, phones, and ids") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail alice.smith@corp.example.org and bob_99@ex.io today"),
      (2L, "ssn 123-45-6789 phone 415-555-0199 and 415.555.0123"),
      (3L, "no pii here, just words and 12345 loose digits"),
      (4L, "edge: a@b.co ends the line 987-65-4321")).toDF("doc_id", "text")
    val r = TextOps.piiScan(docs, "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    def counts(id: Long) = (r(id).getAs[Int]("n_email"),
      r(id).getAs[Int]("n_phone"), r(id).getAs[Int]("n_id"))
    def red(id: Long) = r(id).getAs[String]("redacted")
    assert(counts(1L) == ((2, 0, 0)))
    assert(red(1L) == "mail [EMAIL] and [EMAIL] today")
    assert(counts(2L) == ((0, 2, 1)))
    assert(red(2L) == "ssn [ID] phone [PHONE] and [PHONE]")
    assert(counts(3L) == ((0, 0, 0)))
    assert(red(3L) == docs.collect()(2).getString(1)) // untouched
    assert(red(4L) == "edge: [EMAIL] ends the line [ID]")
  }

  test("connected components resolve transitive chains to the min id") {
    import spark.implicits._
    // one 6-node chain (multi-round convergence: diameter 5), one pair, and
    // a triangle that shares no nodes with either
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L),
      (40L, 41L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((10L to 15L).forall(labels(_) == 10L), s"chain: $labels")
    assert(labels(40L) == 40L && labels(41L) == 40L)
    assert((20L to 22L).forall(labels(_) == 20L))
    assert(labels.size == 11) // nodes only from edges, each exactly once
  }

  test("d06 clusters near-dup pairs transitively with a canonical member") {
    val rows = Dedup.d06DedupClusters(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      // every cluster's id is its smallest member, which is canonical
      assert(members.map(_.getLong(0)).min == cid)
      assert(members.forall(r => (r.getLong(0) == cid) == r.getBoolean(3)))
      // edge-derived nodes always have a neighbor: no singleton clusters
      assert(members.length >= 2 && members.forall(_.getLong(2) == members.length))
    }
  }
}
