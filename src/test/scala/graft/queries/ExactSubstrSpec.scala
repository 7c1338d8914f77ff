package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** Exact-substring span dedup (d11, the Lee et al. ExactSubstr discipline):
  * the FIRST occurrence — minimal (doc_id, position) — of every duplicated
  * n-token window keeps its text; every later occurrence loses the covered
  * tokens, with overlapping duplicate windows merging into one maximal
  * removed span. */
class ExactSubstrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val n = 8

  private def run(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    Dedup.exactSubstrSpans(docs.toDF("doc_id", "text"), n)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
  }

  private def uniq(tag: String, k: Int): Seq[String] =
    (0 until k).map(i => s"$tag$i")

  test("a copied passage is removed from the copier, kept in the owner; " +
      "overlapping windows merge into one span") {
    // doc 1 owns a 12-token passage; doc 2 embeds the same 12 tokens
    // between unique text: 12 tokens ⊃ 5 overlapping 8-token windows that
    // must merge into ONE removed span of exactly 12 tokens
    val passage = uniq("shared", 12)
    val d1 = (uniq("a", 4) ++ passage ++ uniq("b", 4)).mkString(" ")
    val d2 = (uniq("c", 6) ++ passage ++ uniq("d", 6)).mkString(" ")
    val out = run(Seq((1L, d1), (2L, d2)))
    val (t1, k1, r1, _) = out(1L)
    assert((t1, k1, r1) == ((20L, 20L, 0L)), "owner must keep everything")
    val (t2, k2, r2, h2) = out(2L)
    assert(t2 == 24L && r2 == 12L && k2 == 12L,
      s"copier must lose exactly the 12-token span, got removed=$r2")
    // the cleaned text is the unique remainder, in original order
    import org.apache.spark.sql.functions.md5
    import spark.implicits._
    val expected = Seq((uniq("c", 6) ++ uniq("d", 6)).mkString(" "))
      .toDF("t").select(md5($"t")).head().getString(0)
    assert(h2 == expected)
  }

  test("within-document repetition: the second occurrence is removed") {
    val rep = uniq("loop", 9)
    val d = (rep ++ uniq("mid", 5) ++ rep).mkString(" ")
    val out = run(Seq((5L, d)))
    val (t, k, r, _) = out(5L)
    assert(t == 23L && r == 9L && k == 14L,
      s"second in-document occurrence must be removed, got removed=$r")
  }

  test("short documents (< n tokens) and unique text pass through whole") {
    val out = run(Seq(
      (1L, uniq("x", 3).mkString(" ")),
      (2L, uniq("y", 30).mkString(" "))))
    assert(out(1L)._3 == 0L && out(1L)._1 == 3L)
    assert(out(2L)._3 == 0L && out(2L)._1 == 30L)
  }

  test("library xxhash64 path and battery md5 path clean identically") {
    import spark.implicits._
    val passage = uniq("dup", 15)
    val docs = Seq(
      (1L, (uniq("a", 5) ++ passage ++ uniq("b", 3)).mkString(" ")),
      (2L, (passage ++ uniq("c", 9)).mkString(" ")),
      (3L, uniq("solo", 20).mkString(" ")),
      (4L, (passage ++ uniq("mid", 2) ++ passage).mkString(" ")))
      .toDF("doc_id", "text")
    // window hashes differ (cheap vs mirrorable family) but ownership,
    // spans, and the cleaned corpus must be IDENTICAL
    val cheap = Dedup.exactSubstrSpans(docs, n).collect().map(_.toSeq).toSeq
    val battery = Dedup.exactSubstrSpans(docs, n,
      windowHash = Dedup.md5Hash60).collect().map(_.toSeq).toSeq
    assert(cheap == battery)
  }

  test("sorted covered-set probe: a fully-duplicated long document cleans " +
      "exactly (the O(log) probe path)") {
    import spark.implicits._
    // 400-token owner; copier = the same 400 tokens → covered set of 400
    // positions probed by 400 tokens; correctness of the binary search is
    // what keeps this exact
    val big = uniq("t", 400)
    val docs = Seq((1L, big.mkString(" ")),
      (2L, big.mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.exactSubstrSpans(docs, n).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((400L, 400L, 0L)))
    assert(!out.contains(2L), "fully-duplicated copier drops entirely")
  }

  test("ownership is global-minimal (doc_id, position): the lowest doc " +
      "keeps the passage even when it appears later in the text") {
    val passage = uniq("p", n)
    // doc 1 holds the passage at position 11; doc 2 at position 1 — the
    // owner is doc 1 (lower doc id), NOT the earlier in-document position
    val d1 = (uniq("pre", 10) ++ passage).mkString(" ")
    val d2 = (passage ++ uniq("post", 10)).mkString(" ")
    val out = run(Seq((1L, d1), (2L, d2)))
    assert(out(1L)._3 == 0L, "lower doc_id owns the passage")
    assert(out(2L)._3 == n.toLong, "higher doc_id loses it")
  }
}
