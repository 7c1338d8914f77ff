package graft.spark.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer for token-DENOMINATED pipeline ops.
  *
  * Real token budgets and sequence packing are tokenizer-token-denominated
  * (a GPT-2-style BPE), not whitespace-token-denominated; the battery's
  * whitespace counter stays as the DuckDB-expressible oracle twin, and
  * this module is the honest library path behind the same `Column =>
  * Column` seam ([[graft.queries.TextOps.t06TokenBudget]] /
  * `packSequences`).
  *
  * Algorithm (the public GPT-2/`Sennrich et al. 2016` merge scheme):
  * pre-tokenize on whitespace; each word starts as its character sequence
  * and the adjacent pair with the LOWEST merge rank merges first,
  * repeating until no learned pair remains. [[Bpe.learn]] is a tiny
  * frequency-greedy trainer for building merge tables from a sample
  * corpus (specs, demos); production would load a published merges file
  * into the same [[Bpe.Merges]].
  *
  * Scale shape: the merge table is a few 10k entries — broadcast once per
  * session ([[countUdf]]), evaluated row-local inside the scan task, so
  * the counter adds zero shuffles; the downstream aggregation/packing
  * plans are unchanged from the whitespace variant. */
object Bpe {

  /** Merge table: adjacent-symbol pair → rank (lower merges first). */
  final case class Merges(ranks: Map[(String, String), Int]) extends Serializable {
    def isEmpty: Boolean = ranks.isEmpty
  }

  /** Encode one whitespace-free word to its BPE symbols. */
  def encodeWord(word: String, merges: Merges): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var syms = word.map(_.toString).toVector
    var done = merges.isEmpty
    while (!done && syms.length > 1) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = merges.ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  /** Token count of a text: sum of per-word symbol counts, whitespace
    * pre-tokenization (so an EMPTY merge table degenerates to character
    * count per word, and a saturated one to the whitespace count). */
  def countText(text: String, merges: Merges): Long = {
    if (text == null) return 0L
    var n = 0L
    for (w <- text.split("\\s+") if w.nonEmpty)
      n += encodeWord(w, merges).length
    n
  }

  /** Frequency-greedy merge learning over a (small) sample corpus: at each
    * step the most frequent adjacent symbol pair becomes the next merge.
    * Deterministic: frequency ties break lexicographically. */
  def learn(corpus: Seq[String], numMerges: Int): Merges = {
    val words = scala.collection.mutable.Map[Vector[String], Long]()
    for (t <- corpus; w <- t.split("\\s+") if w.nonEmpty) {
      val k = w.map(_.toString).toVector
      words(k) = words.getOrElse(k, 0L) + 1L
    }
    val ranks = Map.newBuilder[(String, String), Int]
    var rank = 0
    var go = true
    while (rank < numMerges && go) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- words; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
      }
      if (pairCounts.isEmpty) go = false
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        ranks += best -> rank
        val merged = best._1 + best._2
        val rewritten = words.toSeq.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> c
        }
        words.clear()
        for ((k, c) <- rewritten) words(k) = words.getOrElse(k, 0L) + c
        rank += 1
      }
    }
    Merges(ranks.result())
  }

  /** Parse a published GPT-2-style `merges.txt`: optional `#version`
    * header, then one `left right` pair per line, rank = line order —
    * the standard interchange format for pretrained BPE vocabularies
    * (Sennrich et al.'s `apply_bpe` and its descendants). */
  def parseMerges(lines: IterableOnce[String]): Merges = {
    val ranks = Map.newBuilder[(String, String), Int]
    var rank = 0
    for (raw <- lines.iterator) {
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        line.split("\\s+") match {
          case Array(a, b) => ranks += (a, b) -> rank; rank += 1
          case _ => throw new IllegalArgumentException(
            s"malformed merges line: '$line' (expected 'left right')")
        }
      }
    }
    Merges(ranks.result())
  }

  /** Load a merges file from disk (driver-side; the result broadcasts
    * through [[countUdf]]). */
  def loadMerges(path: String): Merges = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseMerges(src.getLines()) finally src.close()
  }

  /** The `Column => Column` token counter over a BROADCAST merge table —
    * drop-in for the whitespace counter in t06/t19's library forms. */
  def countUdf(spark: SparkSession, merges: Merges): Column => Column = {
    val b = spark.sparkContext.broadcast(merges)
    val f = udf((s: String) => countText(s, b.value))
    text => f(text)
  }

  /** The battery's whitespace twin behind the same seam. */
  val whitespaceCount: Column => Column =
    text => size(regexp_extract_all(text, lit("\\S+"), lit(0))).cast("long")
}
