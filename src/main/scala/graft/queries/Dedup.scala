package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Near-duplicate detection over `documents` — the standard training-data
  * dedup toolbox: MinHash+LSH, SimHash, exact n-gram Jaccard.
  *
  * Scale design: every algorithm here is banded/bucketed — candidate pairs
  * only ever form inside an LSH bucket (`groupBy`/self-join on band keys),
  * NEVER via an all-pairs cross join. Oversized buckets (degenerate keys) are
  * capped and dropped, which bounds the worst-case pair blowup at 100 TB; the
  * cap is logged out-of-band as a completeness caveat, matching what
  * production dedup pipelines (e.g. the C4/RefinedWeb recipes) do.
  */
object Dedup {

  /** Distinct word n-gram shingles of `text` (space-tokenized). */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    if (n == 1) array_distinct(toks)
    else array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
  }

  /** MinHash signature: for seed i, min over shingles of xxhash64(shingle, i). */
  def minhashSig(shingles: Column, k: Int): Seq[Column] =
    (0 until k).map(i => array_min(transform(shingles, sh => xxhash64(sh, lit(i)))))

  /** MinHash+LSH candidate pairs, verified with exact Jaccard.
    *
    * Pipeline: shingle → k minhashes → `bands` band keys → explode →
    * self-join on (band, key) with id< to form each pair once → dedupe pairs
    * on (id_a, id_b) → re-join shingles once → exact-Jaccard verify → top
    * `topK`.
    *
    * Shuffle hygiene at 100 TB: the shingle arrays (near-full document
    * content) NEVER enter the LSH shuffles — bucket sizing, the banded
    * self-join, and the pair dedupe all move (doc_id, band, key) triples
    * only. Shingles are re-joined exactly once, against the already-tiny
    * verified candidate set.
    */
  def minhashPairs(docs: DataFrame, shingleN: Int = 2, k: Int = 16,
                   bands: Int = 8, bucketCap: Int = 100, topK: Int = 50): DataFrame = {
    val rows = k / bands // minhash rows per band
    val sigs = minhashSig(col("shingles"), k)
    val bandKeys = (0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(sigs.slice(b * rows, (b + 1) * rows): _*).as("key"))
    }
    // shingling is the expensive projection — materialize it once; reused by
    // the band-key derivation and (once) by the final verify join
    val shingled = docs
      .select(col("doc_id"), wordShingles(col("text"), shingleN).as("shingles"))
      .persist()
    // keys only from here on: (doc_id, band, key)
    val keyed = shingled
      .select(col("doc_id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
      .persist()
    // Drop degenerate buckets: at web scale a boilerplate shingle-set can put
    // millions of docs in one bucket; capping bounds the O(bucket²) pair
    // join. Sized via aggregate + key-only join (a window here would carry
    // every row's payload through one partition per bucket).
    // oversized-bucket keys are FEW by construction (each needs > bucketCap
    // members), so the exclusion list is broadcast-safe at any scale
    val bigBuckets = keyed.groupBy("band", "key")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > bucketCap)
      .select("band", "key")
    val sized = keyed.join(broadcast(bigBuckets), Seq("band", "key"), "left_anti")
    val a = sized.select(col("doc_id").as("id_a"), col("band"), col("key"))
    val b = sized.select(col("doc_id").as("id_b"), col("band"), col("key"))
    val candidates = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // a pair found in several bands is verified once
    candidates
      .join(shingled.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(shingled.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(topK)
  }

  /** Query-battery entry: weak-similarity sweep on the synthetic corpus
    * (aggressive banding so the pipeline provably produces candidates even
    * though the corpus has no true near-dups — see DedupSpec for the planted
    * near-dup recall test). */
  def d01MinhashLsh(s: SparkSession, d: String): DataFrame =
    minhashPairs(Tables.documents(s, d), shingleN = 1, k = 16, bands = 8,
      bucketCap = 200, topK = 50)

  /** 64-bit SimHash from word tokens, weighted by term frequency: for each
    * bit position, count set token-hash bits; majority → bit.
    *
    * Implementation packs 4 bit-counters into 16-bit lanes of each of 16
    * longs, so the aggregate is 16 plain `sum`s + a count instead of 64
    * conditional sums — ~4× less generated code and one shuffle either way.
    * Lane width caps documents at 65 535 tokens; longer documents should be
    * chunked upstream (standard practice for near-dup pipelines). */
  def simhash(docs: DataFrame): DataFrame = {
    val lanesPerWord = 4 // 16-bit lanes
    val words = 64 / lanesPerWord
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    // packed_g = Σ_j ((h >> (4g+j)) & 1) << 16j  — 4 bit-counts per long
    val packs = (0 until words).map { g =>
      (0 until lanesPerWord).map { j =>
        shiftleft(shiftright(col("h"), g * lanesPerWord + j).bitwiseAND(1), 16 * j)
      }.reduce(_ + _).as(s"p$g")
    }
    val aggs = (0 until words).map(g => sum(col(s"p$g")).as(s"s$g")) :+
      count(lit(1)).as("n_tok")
    // bit i (in group g, lane j) set iff 2 * count_ones > n_tokens
    val packedBits = (0 until 64).map { i =>
      val g = i / lanesPerWord; val j = i % lanesPerWord
      val cnt = shiftright(col(s"s$g"), 16 * j).bitwiseAND(0xFFFFL)
      when(cnt * 2 > col("n_tok"), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    toks.select(col("doc_id") +: packs: _*)
      .groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), packedBits.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 64-bit fingerprint into 4×16-bit keys
    * (any pair within Hamming distance 3 shares ≥1 exact band — pigeonhole),
    * join per band, verify true Hamming distance. */
  def d02SimhashPairs(s: SparkSession, d: String, maxHamming: Int = 16,
                      topK: Int = 100): DataFrame =
    d02SimhashPairsFrom(Tables.documents(s, d), maxHamming, topK)

  def d02SimhashPairsFrom(docs: DataFrame, maxHamming: Int,
                          topK: Int): DataFrame = {
    // fingerprints are tiny (one long per doc); persist so the banded
    // self-join reads them once instead of recomputing the token aggregation
    // for each side
    val sh = simhash(docs).persist()
    val banded = sh.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(b => struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("doc_id").as("id_a"), col("simhash").as("sh_a"),
      col("band"), col("key"))
    val b = banded.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"),
      col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("hamming"), col("id_a"), col("id_b"))
      .limit(topK)
  }

  /** Exact word-bigram Jaccard over a bounded id range — the ground-truth
    * pairwise measure (kept bounded: this is the verify step, not the sweep). */
  def d03NgramJaccard(s: SparkSession, d: String, maxId: Int = 25): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("doc_id") < maxId)
      .select(col("doc_id"), wordShingles(col("text"), 2).as("sh"))
    val a = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("n_common"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Embedding-cosine near-duplicates, exact over a bounded id range (the
    * oracle-checkable verify shape, like d03): all pairs with cosine ≥
    * `minCos`, cosine computed in double with a fixed left-fold order on
    * BOTH engines and rounded to 6 decimals so the threshold compare is
    * engine-stable. The unbounded scale path is the same computation behind
    * the LSH banding of [[graft.queries.Similarity.annLsh]]. */
  def d04EmbeddingNearDup(s: SparkSession, d: String, maxId: Int = 60,
                          minCos: Double = 0.2): DataFrame = {
    import graft.queries.Similarity.dot
    val vecs = Tables.embeddings(s, d).filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("norm"))
    val a = vecs.select(col("vec_id").as("id_a"), col("embedding").as("e_a"),
      col("norm").as("n_a"))
    val b = vecs.select(col("vec_id").as("id_b"), col("embedding").as("e_b"),
      col("norm").as("n_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b")), 6).as("cos_r"))
      .filter(col("cos_r") >= minCos)
      .orderBy("id_a", "id_b")
  }

  val d04Sql: String =
    """WITH v AS (
         SELECT vec_id, embedding,
                sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
                  for i in range(1, len(embedding)+1)])) AS norm
         FROM embeddings WHERE vec_id < 60)
       SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              ROUND(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
                for i in range(1, len(a.embedding)+1)]) / (a.norm * b.norm), 6) AS cos_r
       FROM v a, v b
       WHERE a.vec_id < b.vec_id
         AND ROUND(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
           for i in range(1, len(a.embedding)+1)]) / (a.norm * b.norm), 6) >= 0.2
       ORDER BY id_a, id_b"""

  val d03Sql: String =
    """WITH sh AS (
         SELECT doc_id, list_distinct([string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
                  for i in range(1, len(string_split(text, ' ')))]) AS s
         FROM documents WHERE doc_id < 25)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              LEN(list_intersect(a.s, b.s)) AS n_common,
              CAST(LEN(list_intersect(a.s, b.s)) AS DOUBLE) /
                LEN(list_distinct(list_concat(a.s, b.s))) AS jaccard
       FROM sh a, sh b WHERE a.doc_id < b.doc_id
       ORDER BY id_a, id_b"""
}
