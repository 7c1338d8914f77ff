package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** The distributed training passes agree with their in-memory/planted
  * references: BPE merge learning matches `Bpe.learn` merge-for-merge, and
  * the logistic fit separates a separable planted corpus. */
class TrainingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("distributed BPE learning matches the in-memory learner merge-for-merge") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      "low lower lowest low low",
      "new newer newest new",
      "wide wider widest lower")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val learned = Training.bpeTrain(docs, 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    val ref = graft.spark.functions.Bpe.learn(corpus, 8)
      .ranks.toSeq.sortBy(_._2)
      .zipWithIndex.map { case (((a, b), _), i) => (i, a, b) }
    assert(learned.toSeq == ref,
      s"distributed=${learned.mkString(",")} vs ref=${ref.mkString(",")}")
  }

  test("bpe learning is partitioning-independent") {
    val s = spark
    import s.implicits._
    val docs = (0L until 20L)
      .map(i => (i, s"pair pair pair word$i banana bandana"))
      .toDF("doc_id", "text")
    val a = Training.bpeTrain(docs, 5).collect().toSeq
    val b = Training.bpeTrain(docs.repartition(7), 5).collect().toSeq
    assert(a == b)
  }

  test("t24 battery entry: merges fire on the fixture corpus with real counts") {
    val rows = Training.t24BpeTrain(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getInt(0)).toSeq == (0 until 6))
    // counts are non-increasing is NOT guaranteed (a merge can create a
    // new frequent pair), but every learned pair must have fired > 1
    assert(rows.forall(_.getLong(3) > 1))
  }

  test("logistic fit separates a separable planted corpus") {
    val s = spark
    import s.implicits._
    // y=1 docs: long, punctuation-free; y=0 docs: short, punctuation-heavy
    val good = (0L until 30L).map(i =>
      (i, ("alpha beta gamma delta epsilon " * 8).trim, "en"))
    val bad = (100L until 130L).map(i => (i, "x. y! z? q.", "xx"))
    val docs = (good ++ bad).toDF("doc_id", "text", "lang")
    val feats = docs.select(col("doc_id"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
      lit(1.0).as("x0"),
      (size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long") / lit(100)).as("x1"),
      (length(regexp_replace(col("text"), "[^.!?]", "")) / length(col("text"))).as("x2"),
      (length(col("text")) / lit(1000)).as("x3"))
    val w = Training.logisticFit(feats, iters = 10, lr = 1.0).collect()(0)
    val (w0, w1, w2, w3) =
      (w.getDouble(0), w.getDouble(1), w.getDouble(2), w.getDouble(3))
    def score(xs: (Double, Double, Double)): Double =
      w0 + w1 * xs._1 + w2 * xs._2 + w3 * xs._3
    // every good doc must outscore every bad doc after 10 steps
    val gScore = score((40.0 / 100, 0.0, 239.0 / 1000))
    val bScore = score((4.0 / 100, 3.0 / 11, 11.0 / 1000))
    assert(gScore > bScore,
      s"fit failed to separate: good=$gScore bad=$bScore w=($w0,$w1,$w2,$w3)")
    // punctuation density got a negative weight, token volume a positive one
    assert(w2 < 0 && w1 > 0, s"unexpected signs: w=($w0,$w1,$w2,$w3)")
  }

  test("t25 battery entry: weights deterministic across reruns, ranks 1..25") {
    val a = Training.t25QualityClassifier(spark, sf).collect()
    val b = Training.t25QualityClassifier(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    assert(a.map(_.getInt(1)).toSeq == (1 to a.length))
    // the model is one row: identical weights on every output row
    assert(a.map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5))).distinct.length == 1)
  }

  test("lm filter: docs built from target bigrams score more likely than unseen text") {
    val s = spark
    import s.implicits._
    val target = (0L until 20L).map(i => (i, "the quick brown fox jumps", "en"))
    val inDist = Seq((100L, "the quick brown fox", "xx"))
    val outDist = Seq((101L, "zyx wvu tsr qpo", "xx"))
    val docs = (target ++ inDist ++ outDist).toDF("doc_id", "text", "lang")
    val ce = Training.lmCrossEntropy(docs, col("lang") === "en", 25)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ce(100L) < ce(101L),
      s"target-like doc must have lower cross-entropy: $ce")
    // the training slice itself is maximally likely
    assert(ce(0L) <= ce(100L))
  }

  test("t26 battery entry: ranks ascend with cross-entropy, all finite") {
    val rows = Training.t26LmScore(spark, sf).collect()
    assert(rows.length == 25)
    val ces = rows.map(_.getDouble(2))
    assert(ces.forall(v => !v.isNaN && v > 0))
    assert(ces.zip(ces.tail).forall { case (a, b) => a <= b })
  }

  test("source mixture: α=0.5 flattens — the small source gets an over-proportional share") {
    val s = spark
    import s.implicits._
    // web: 40 docs × 10 tokens = 400; books: 10 docs × 10 tokens = 100.
    // α=0.5 weights 20:10 → books gets 1/3 of the budget despite holding
    // 1/5 of the tokens. budget = 0.5·500 = 250 → books 83, web 166.
    val docs = ((0L until 40L).map(i => (i, "web", 10L)) ++
      (100L until 110L).map(i => (i, "books", 10L)))
      .toDF("doc_id", "source", "n_tok")
    val out = TextOps.sourceMixture(docs, budgetFraction = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("books")._1 == 83L && out("web")._1 == 166L,
      s"expected budgets 83/166: $out")
    // selection respects the straddler rule: tokens start within budget,
    // so with 10-token docs: books ≤ 9 docs beginning < 83, i.e. 9 docs
    // (slices start at 0,10,…,80), web 17 docs (0,…,160)
    assert(out("books")._2 == 9L && out("web")._2 == 17L, s"$out")
    // the raw token share of books is 20%, its selected share is ~35%
    val bookShare = out("books")._3.toDouble /
      (out("books")._3 + out("web")._3)
    assert(bookShare > 0.3, s"mixture did not flatten: $bookShare")
  }

  test("t27 battery entry: budget filled to the straddler bound, never beyond") {
    val rows = TextOps.t27SourceMixture(spark, sf).collect()
    assert(rows.nonEmpty)
    // ground truth from the corpus: per-source token totals + max doc
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("source"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("n_tok"))
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.sum("n_tok").as("total"),
        org.apache.spark.sql.functions.max("n_tok").as("max_doc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (src, budget, tokens) =
        (r.getString(0), r.getLong(1), r.getLong(3))
      val (total, maxDoc) = docs(src)
      // a doc is selected iff its slice STARTS inside the budget, so the
      // selection fills at least min(budget, source total)…
      assert(tokens >= math.min(budget, total),
        s"$src under-filled: $tokens < min($budget, $total)")
      // …and overshoots by less than one document (the final straddler)
      assert(tokens < budget + maxDoc,
        s"$src over-filled: $tokens >= $budget + $maxDoc")
    }
  }
}
