package graft.spark.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.spark.SparkTestSession

/** BPE tokenizer: merge learning, rank-ordered encoding, the degenerate
  * bounds (no merges → chars, saturated merges → whitespace tokens), and
  * the broadcast column counter agreeing with the local encoder — so the
  * token-denominated t06/t19 variants are trustworthy. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("encodeWord merges lowest-rank pairs first") {
    // ranks: (l,o)→0, (lo,w)→1, (e,r)→2
    val m = Bpe.Merges(Map(("l", "o") -> 0, ("lo", "w") -> 1, ("e", "r") -> 2))
    assert(Bpe.encodeWord("lower", m) == Vector("low", "er"))
    assert(Bpe.encodeWord("lol", m) == Vector("lo", "l"))
    assert(Bpe.encodeWord("", m) == Vector.empty)
    // tokens always concatenate back to the word
    assert(Bpe.encodeWord("lowerlower", m).mkString == "lowerlower")
  }

  test("learn recovers merges that compress the training corpus") {
    val corpus = Seq.fill(50)("the then they") ++ Seq("other words here")
    val m = Bpe.learn(corpus, numMerges = 10)
    assert(m.ranks.nonEmpty)
    // 'the' dominates: after learning, it encodes to ONE symbol
    assert(Bpe.encodeWord("the", m).length == 1)
    // count with merges is <= character count and >= whitespace count
    val text = "the then they said"
    val n = Bpe.countText(text, m)
    assert(n <= text.replace(" ", "").length)
    assert(n >= 4)
  }

  test("degenerate bounds: no merges = chars/word; whitespace twin intact") {
    assert(Bpe.countText("ab cde", Bpe.Merges(Map.empty)) == 5L)
    assert(Bpe.countText(null, Bpe.Merges(Map.empty)) == 0L)
    assert(Bpe.countText("  a   b ", Bpe.Merges(Map.empty)) == 2L)
  }

  test("broadcast column counter agrees with the local encoder") {
    val s = spark
    import s.implicits._
    val corpus = Seq("the quick brown fox", "the slow brown bear",
      "quick quick slow")
    val m = Bpe.learn(corpus, numMerges = 20)
    val df = corpus.zipWithIndex.map(_.swap).toDF("id", "text")
    val counter = Bpe.countUdf(spark, m)
    val got = df.select(col("id"), counter(col("text")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = corpus.zipWithIndex.map { case (t, i) =>
      i -> Bpe.countText(t, m) }.toMap
    assert(got == want)
  }

  test("parseMerges reads the published merges.txt format") {
    val m = Bpe.parseMerges(Seq(
      "#version: 0.2", "", "l o", "lo w", "e r"))
    assert(m.ranks == Map(("l", "o") -> 0, ("lo", "w") -> 1, ("e", "r") -> 2))
    assert(Bpe.encodeWord("lower", m) == Vector("low", "er"))
    // a loaded table and a learned one go through the identical encoder
    val err = intercept[IllegalArgumentException] {
      Bpe.parseMerges(Seq("a b c"))
    }
    assert(err.getMessage.contains("malformed"))
  }

  test("t19 packing runs token-denominated through the BPE seam") {
    val m = Bpe.learn(Seq("aa bb aa bb cc"), numMerges = 4)
    val packed = graft.queries.TextOps.t19SeqPacking(
      spark, "/root/testdata/sf0.001", budget = 128, shards = 4,
      tokenCounter = Bpe.countUdf(spark, m))
    val rows = packed.collect()
    assert(rows.nonEmpty)
    // BPE counts differ from whitespace counts, so the packing differs too
    val ws = graft.queries.TextOps.t19SeqPacking(
      spark, "/root/testdata/sf0.001", budget = 128, shards = 4).collect()
    assert(rows.map(_.getLong(3)).sum != ws.map(_.getLong(3)).sum,
      "BPE token totals unexpectedly equal whitespace totals")
  }
}
