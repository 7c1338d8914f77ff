package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** Physical-plan audit: the scale properties that must hold at 100 TB are
  * asserted on the actual executed plans at test scale —
  *   - dimension joins broadcast (no shuffle of the fact side for dims)
  *   - filters reach the parquet scan as PushedFilters
  *   - projections prune the read schema
  *   - no CartesianProduct anywhere (LSH/dedup candidate pairs must come
  *     from bucket joins); broadcast NLJ is allowed only for the tiny
  *     query-side ANN joins
  *   - aggregations plan map-side partial aggregation before the exchange
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Every node of `p`, recursing into slot-cached subtrees: the r18
    * resident-index slots hide an operator's exchanges inside
    * InMemoryRelations, which would make plan audits silently vacuous. */
  private def expand(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.collect { case n => n }.flatMap {
      case t: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        t +: expand(t.relation.cachedPlan)
      case n => Seq(n)
    }

  /** [[plan]] with slot-cached subtrees expanded (string form). */
  private def deepPlan(df: org.apache.spark.sql.DataFrame): String =
    expand(df.queryExecution.executedPlan).map(_.nodeName).mkString("\n")

  /** Full tree strings of the top plan AND every slot-cached subtree —
    * for audits that must see scan DETAILS (paths, pushed filters)
    * hidden inside InMemoryRelations. */
  private def deepPlanStr(df: org.apache.spark.sql.DataFrame): String = {
    def trees(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.toString +: p.collect {
        case t: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => t
      }.flatMap(t => trees(t.relation.cachedPlan))
    trees(df.queryExecution.executedPlan).mkString("\n")
  }

  test("q03: dimension joins broadcast, filter pushed to scan") {
    val p = plan(Relational.q03TopOrders(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), "fact-dim join should not sort-merge")
    assert(p.contains("PushedFilters: [IsNotNull"), "expected pushed filters")
  }

  test("q05: 6-table star join is all broadcast on the fact side") {
    val p = plan(Relational.q05LocalSupplier(spark, sf))
    assert(p.split("BroadcastHashJoin").length >= 4, s"expected >=4 broadcasts:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q01: partial aggregation before the exchange") {
    val p = plan(Relational.q01PricingSummary(spark, sf))
    assert(p.contains("HashAggregate"), p)
    // partial + final pair: HashAggregate appears on both sides of Exchange
    val exIdx = p.indexOf("Exchange")
    assert(exIdx > 0 && p.indexOf("HashAggregate", exIdx) > 0,
      "expected final HashAggregate after the exchange")
  }

  test("q02: selective filter + projection reach the parquet scan") {
    val df = Relational.q02FilterProject(spark, sf)
    val p = plan(df)
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_quantity"),
      s"quantity filter not pushed:\n$p")
    assert(p.contains("ReadSchema:"), p)
    // read schema includes only needed columns, not all 11
    val readSchema = p.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(!readSchema.contains("l_tax"), s"unpruned read schema: $readSchema")
  }

  test("dedup/similarity plans never cartesian product") {
    for ((name, df) <- Seq(
        "d01" -> Dedup.d01MinhashLsh(spark, sf),
        "d02" -> Dedup.d02SimhashPairs(spark, sf),
        "d05" -> Dedup.d05SharedPassages(spark, sf),
        "ann02" -> Similarity.annLsh(spark, sf),
        "ann03" -> Similarity.annIvf(spark, sf),
        "ann06" -> Similarity.annPq(spark, sf),
        "ann08" -> Similarity.annIvfPq(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian product:\n$p")
    }
  }

  test("ann08: centroids/codebook/ADC broadcast; codes never sort-merge") {
    val p = plan(Similarity.annIvfPq(spark, sf))
    assert(!p.contains("SortMergeJoin"),
      s"a corpus-side sort-merge join crept into the IVF-PQ chain:\n$p")
    // the keyless centroid assign joins are broadcast NESTED-LOOP (tiny
    // build side, fine); the keyed chain must stay broadcast HASH: encode,
    // query-ADC build, codes⋈ADC shortlist, and the two re-rank joins
    assert(p.split("BroadcastHashJoin", -1).length - 1 >= 4,
      s"expected >=4 broadcast hash joins (encode, ADC, shortlist, re-rank):\n$p")
  }

  test("ann10/ann11: trained quantizers keep the sampled plans' shapes") {
    // training must not change the serving topology: the trained codebook
    // is the same kSub×nSub broadcast side, codes stay the probe side
    for ((name, p) <- Seq(
        "ann10" -> plan(Similarity.annTrainedPq(spark, sf)),
        "ann11" -> plan(Similarity.annTrainedIvfPq(spark, sf)))) {
      assert(!p.contains("SortMergeJoin"),
        s"$name: corpus-side sort-merge crept into the trained chain:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      assert(p.split("BroadcastHashJoin", -1).length - 1 >= 3,
        s"$name: expected >=3 broadcast hash joins:\n$p")
    }
  }

  test("ann06: codebook and ADC table broadcast; codes carry ints only") {
    val p = plan(Similarity.annPq(spark, sf))
    // the kSub×nSub codebook and the query ADC table are the broadcast
    // sides everywhere — the corpus-sized codes/vectors never build a hash
    // table; at least the encode join + ADC join + re-rank query join.
    // split() yields occurrences+1 parts, so count occurrences explicitly
    assert(p.split("BroadcastHashJoin", -1).length - 1 >= 3,
      s"expected >=3 broadcast hash joins (encode, ADC, re-rank):\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"),
      s"a corpus-side sort-merge join crept into the PQ chain:\n$p")
  }

  test("t21: BPE counting is row-local with map-side combine, one exchange") {
    val p = plan(TextOps.t21BpeTokens(spark, sf))
    // the bound function evaluates inside the scan task; the only data
    // movement is the per-source aggregation exchange
    assert(p.split("Exchange", -1).length - 1 <= 2, // agg + final sort
      s"BPE counting must not add shuffles:\n$p")
    val exIdx = p.indexOf("Exchange")
    assert(p.indexOf("HashAggregate") >= 0 &&
      p.indexOf("HashAggregate") > exIdx,
      s"expected partial aggregation below the exchange:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d01: shingle arrays stay out of the LSH shuffles") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    // AQE-off session: AdaptiveSparkPlanExec is a leaf, so node-level
    // collects on the default session's executedPlan see nothing at all
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    // the LSH index + verify frames are slot-cached (r18): expand every
    // InMemoryRelation so the audit sees the exchanges INSIDE the cached
    // subtrees, not just the (exchange-free) serving tail
    val exec = expand(Dedup.d01MinhashLsh(s, sf).queryExecution.executedPlan)
    assert(exec.collect { case e: ShuffleExchangeExec => e }.nonEmpty,
      "plan audit is vacuous: no exchanges visible")
    // no window operator anywhere (bucket sizing must be aggregate+join)
    assert(exec.collect { case w: WindowExec => w }.isEmpty,
      "bucket sizing must not use a window")
    // no exchange carrying shingles partitioned by LSH keys or pair ids —
    // the only shingle-bearing exchanges are the doc_id-keyed verify joins
    val shingleExchanges = exec.collect {
      case e: ShuffleExchangeExec
          if e.output.exists(a => a.name.startsWith("sh")) => e
    }
    shingleExchanges.foreach { e =>
      val partCols = e.outputPartitioning match {
        case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          h.expressions.flatMap(_.references.map(_.name))
        case _ => Nil
      }
      assert(partCols.forall(c => c.startsWith("doc_id") || c.startsWith("id_")),
        s"shingles shuffled by non-id keys ${partCols.mkString(",")}")
      assert(!partCols.exists(_ == "band") && !partCols.exists(_ == "key"),
        "shingles must not ride the banded join")
    }
    // the pair-dedupe aggregate groups on ids only, no shingle payload
    exec.collect { case a: HashAggregateExec => a }.foreach { a =>
      assert(!a.groupingExpressions.exists(_.references.exists(_.name.startsWith("sh"))),
        "pair dedupe must group on (id_a, id_b) only")
    }
  }

  test("d02: degenerate-bucket cap is aggregate + broadcast anti-join, no window") {
    val p = plan(Dedup.d02SimhashPairs(spark, sf))
    // the cap must appear as a BROADCAST anti-join on the key-only bucket
    // exclusion list (the MinHash recipe) — never a window sort over the
    // banded rows, and the banded self-join itself must not sort-merge
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"missing broadcast anti-join bucket cap:\n$p")
    assert(!p.contains("Window"), s"bucket cap must not use a window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ann09 serves from the persisted codes table, not a corpus re-encode") {
    // the codes relation is slot-cached since r18 — expand the cached
    // subtrees so the scan's table path is visible to the assertion
    val p = deepPlanStr(AnnIndex.ann09IncrementalIvfPq(spark, sf))
    // the ADC side must be a SCAN of the maintained index table — the
    // whole point of persisting it is that queries never re-assign or
    // re-encode the corpus
    assert(p.contains("ann09/codes"),
      s"expected a scan of the persisted ann09 codes table:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("top-k queries use TakeOrderedAndProject, not global sort") {
    val p = plan(Relational.q03TopOrders(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"limit+order not fused:\n$p")
  }

  test("q16/q17: semi join broadcasts; avg-compare reuses one scan subtree") {
    val p16 = plan(Relational.q16InSubquery(spark, sf))
    assert(p16.contains("BroadcastHashJoin") && p16.contains("LeftSemi"), p16)
    val p17 = plan(Relational.q17AvgCompare(spark, sf))
    assert(!p17.contains("CartesianProduct"))
  }

  test("no broadcast() hint wraps a side that grows with the table") {
    // A forced hint overrides size checks, so a hint on a side that grows
    // with the table is a guaranteed 100x-scale OOM. No battery relational
    // query is allowed an unconditional hint on ANY SF-linear side —
    // customer included (even segment-filtered, it's ~1/5 of an SF-linear
    // table). The stats/AQE layer still broadcasts whatever measures
    // under the threshold, which the join-shape asserts above cover.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    for ((name, df) <- Seq(
        "q03" -> Relational.q03TopOrders(spark, sf),
        "q05" -> Relational.q05LocalSupplier(spark, sf),
        "q10" -> Relational.q10AntiJoin(spark, sf),
        "q16" -> Relational.q16InSubquery(spark, sf))) {
      val hints = df.queryExecution.analyzed
        .collect { case h: ResolvedHint => h }
        .filter(_.hints.strategy.exists(
          _.toString.toUpperCase.contains("BROADCAST")))
      hints.foreach { h =>
        val cols = h.child.output.map(_.name)
        assert(!cols.exists(c => c.startsWith("o_") || c.startsWith("l_") ||
            c.startsWith("s_") || c.startsWith("c_")),
          s"$name: broadcast hint wraps an SF-linear side: $cols")
      }
    }
  }

  test("q03: customer broadcast is chosen BY SIZE, not forced by hint") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = Relational.q03TopOrders(spark, sf)
    assert(df.queryExecution.analyzed.collect {
      case h: ResolvedHint => h }.isEmpty, "q03 must carry no hints at all")
    // ...and the size-based planner still broadcasts the key set here,
    // where it genuinely measures small — proving the hint was redundant
    // at this SF and only a liability at 100x.
    assert(plan(df).contains("BroadcastHashJoin"),
      "expected a stats-chosen broadcast at bench SF")
  }

  test("ice09: COUNT/MIN/MAX answered from metadata incl. NaN-proven doubles") {
    val p = plan(IcebergOps.ice09AggPushdown(spark, sf))
    assert(p.contains("metadata-only aggregate"),
      s"aggregate (incl. double min/max) not pushed:\n$p")
  }

  test("q10 anti join broadcasts the filtered subquery side") {
    val p = plan(Relational.q10AntiJoin(spark, sf))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
  }

  test("q20: sessionization reuses one user_id partitioning end-to-end") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val exec = Relational.q20Sessionization(s, sf).queryExecution.executedPlan
    val hashEx = exec.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    // windows + both rollups all run inside the single user_id exchange;
    // only the final orderBy adds a range exchange on top
    assert(hashEx.size == 1,
      s"expected one hash exchange (user_id), got ${hashEx.size}")
  }

  test("q22: as-of join is one user_id exchange, no join operator at all") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val exec = Relational.q22AsofJoin(s, sf).queryExecution.executedPlan
    val p = exec.toString
    // the union+window formulation: no join explosion of clicks×purchases
    assert(!p.contains("Join"), s"as-of should not plan a join:\n$p")
    val hashEx = exec.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashEx.size == 1,
      s"expected one hash exchange (user_id), got ${hashEx.size}")
  }

  test("d07: benchmark side shingles its slice only and broadcasts; no window sort") {
    // r18 shape: the benchmark side's doc_id filter pushes to the scan so
    // its shingle+md5 pass reads 1/50 of the corpus; the corpus side is
    // one map-only pass probing the broadcast set. (An interim window-
    // over-h variant sorted every corpus shingle — lost at sf1.)
    val p = plan(Dedup.d07Contamination(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"benchmark set not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus rides a join shuffle:\n$p")
    assert(!p.contains("Window"), s"membership must not sort the corpus:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q23: the band dimension broadcasts into a nested-loop probe") {
    val p = plan(Relational.q23RangeJoin(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"interval join should broadcast-probe the tiny band table:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"), "fact side must not shuffle for bands")
  }

  test("ann04: centroids broadcast into both assignment passes") {
    // the assignment is slot-cached (r18) — audit the cached subtree,
    // on an AQE-off session (AdaptiveSparkPlanExec is a collect leaf)
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val p = deepPlan(Similarity.ann04Kmeans(s, sf))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"k-row centroid side should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q25: lag + frame windows share one user_id exchange and one Window node") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val exec = Relational.q25MovingAvg(s, sf).queryExecution.executedPlan
    val hashEx = exec.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashEx.size == 1,
      s"expected one hash exchange (user_id), got ${hashEx.size}")
    // same partitioning+ordering → Catalyst collapses the framed sum/count
    // and the lag into a single Window over a single sort
    val windows = exec.collect { case w: WindowExec => w }
    assert(windows.size == 1, s"expected one Window node, got ${windows.size}")
  }

  test("q26: EXISTS/NOT EXISTS plan as semi+anti joins with no forced hints") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = Relational.q26Exists(spark, sf)
    assert(df.queryExecution.analyzed.collect {
      case h: ResolvedHint => h }.isEmpty, "q26 must carry no hints")
    val p = plan(df)
    assert(p.contains("LeftSemi"), s"no semi join:\n$p")
    assert(p.contains("LeftAnti"), s"no anti join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("sk02: salted join never cartesians; raw words stay out of t17 shuffles") {
    val p = plan(Skew.sk02SaltedJoin(spark, sf))
    assert(!p.contains("CartesianProduct"), s"salted join cartesianed:\n$p")
    // t17: word strings are hashed at the source; no exchange carries `w`
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val exec = TextOps.t17Vocab(s, sf).queryExecution.executedPlan
    val ex = exec.collect { case e: ShuffleExchangeExec => e }
    assert(ex.nonEmpty, "plan audit is vacuous: no exchanges visible")
    ex.foreach { e =>
      assert(!e.output.exists(_.name == "w"),
        s"raw words ride a shuffle: ${e.output.map(_.name).mkString(",")}")
    }
  }

  test("t11: the bounded tf slice broadcasts into the tf-df join") {
    // the document-frequency table is corpus-sized; it must never be
    // shuffled to meet the maxId-bounded tf probe
    val p = plan(TextOps.t11Keywords(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"tf-df join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"df side rides a sort-merge shuffle:\n$p")
  }

  test("q28: LATERAL decorrelates to a window top-k, no per-row re-execution") {
    val p = plan(Relational.q28Lateral(spark, sf))
    // the rank computation must ride WindowGroupLimit (partial+final top-k
    // pushed below the shuffle), never a per-outer-row loop or cartesian
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$p")
    assert(!p.contains("CartesianProduct"), s"lateral cartesianed:\n$p")
    // exactly one hash-partitioned exchange feeds the window (the group-by
    // and the rank share it); everything else broadcasts
    assert(!p.contains("SortMergeJoin"), s"joins must broadcast at this size:\n$p")
  }

  test("mm05: payload bytes and chunk bytes never ride a shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val exec = Multimodal.mm05CdcChunkDedup(s, sf).queryExecution.executedPlan
    val ex = exec.collect { case e: ShuffleExchangeExec => e }
    assert(ex.nonEmpty, "plan audit is vacuous: no exchanges visible")
    // chunking happens at the scan: every exchange carries only ids,
    // 60-bit hashes, and counts — never the payload or a chunk's bytes
    ex.foreach { e =>
      val binCols = e.output.filter(_.dataType ==
        org.apache.spark.sql.types.BinaryType).map(_.name)
      assert(binCols.isEmpty,
        s"binary columns ride a shuffle: ${binCols.mkString(",")}")
      assert(!e.output.exists(a => a.name == "payload" || a.name == "c" ||
        a.name == "b"),
        s"chunk machinery rides a shuffle: ${e.output.map(_.name).mkString(",")}")
    }
  }

  test("t22: BM25 corpus stats ride broadcasts, postings never sort-merge") {
    val p = plan(Retrieval.t22Bm25(spark, sf))
    // query terms, document frequencies, and the 1-row corpus stats are
    // all broadcast; the only corpus-sized shuffles are the tf/dl/score
    // aggregations. The dl join is keyed on doc_id and must hash, and
    // nothing may sort-merge or cartesian at any size.
    assert(p.contains("BroadcastHashJoin"), s"no broadcast joins in BM25:\n$p")
    assert(!p.contains("SortMergeJoin"), s"BM25 postings sort-merged:\n$p")
    assert(!p.contains("CartesianProduct"), s"BM25 cartesianed:\n$p")
  }

  test("t23: the ≤B-row DSIR lambda table broadcasts back onto the token stream") {
    val p = plan(TextOps.t23DsirWeights(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"lambda join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"DSIR cartesianed:\n$p")
    // global top-k is a TakeOrdered, not a full sort of the corpus
    assert(p.contains("TakeOrderedAndProject"), s"top-k sorts globally:\n$p")
  }

  test("d10: semdedup pairs form inside clusters only — no cartesian, no payload shuffle") {
    val p = plan(Dedup.d10SemanticDedup(spark, sf))
    // the one permitted nested-loop is the k-row centroid broadcast from
    // the kmeans assign; the pair join itself is keyed on cluster
    assert(!p.contains("CartesianProduct"), s"semdedup cartesianed:\n$p")
  }

  test("ann12: fusion joins only the two bounded shortlists") {
    val p = plan(Retrieval.ann12HybridRrf(spark, sf))
    assert(!p.contains("CartesianProduct"), s"hybrid fusion cartesianed:\n$p")
  }

  test("t25/t26: model state broadcasts; corpus-sized sides never cartesian") {
    // t25: the weight vector is a 1-row broadcast into every GD pass
    val p25 = plan(Training.t25QualityClassifier(spark, sf))
    assert(!p25.contains("CartesianProduct"), s"GD pass cartesianed:\n$p25")
    // t26: the vocab scalar broadcasts; the LM count joins are keyed
    // (hash or broadcast — never a cartesian, never a sort-merge at
    // this size)
    val p26 = plan(Training.t26LmScore(spark, sf))
    assert(!p26.contains("CartesianProduct"), s"LM scoring cartesianed:\n$p26")
    assert(p26.contains("BroadcastHashJoin") ||
      p26.contains("BroadcastNestedLoopJoin"), s"no broadcast in t26:\n$p26")
  }

  test("t27: budgets broadcast back; top-level plan has no cartesian") {
    val p = plan(TextOps.t27SourceMixture(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"budget join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"mixture cartesianed:\n$p")
  }

  test("t28: serving reads the persisted postings, not a corpus re-tokenize") {
    val p = plan(Bm25Index.t28IncrementalBm25(spark, sf))
    // the scan feeding the scoring chain is the index table's postings
    // (columns doc_id/w/tf) — the docs table's `text` never appears
    assert(!p.contains("text#"), s"served plan re-tokenizes the corpus:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t32: the composed pipeline stays cartesian-free end to end") {
    // four stages in one plan — the composition must not introduce any
    // join shape the stages don't have individually
    val p = plan(TextOps.t32CurationPipeline(spark, sf))
    assert(!p.contains("CartesianProduct"), s"composed pipeline cartesianed:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"budget/status joins should broadcast at this size:\n$p")
  }

  test("t31: LM serving joins the maintained counts, no cartesian") {
    val p = plan(LmIndex.t31IncrementalLm(spark, sf))
    assert(!p.contains("CartesianProduct"), s"LM serve cartesianed:\n$p")
  }

  test("d11: document text never rides a shuffle; ownership is an " +
      "aggregation, never a pairwise join") {
    val p = plan(Dedup.d11ExactSubstr(spark, sf))
    assert(!p.contains("CartesianProduct"), s"exact-substr cartesianed:\n$p")
    // every Exchange carries only ids/hashes/positions/counts — the raw
    // token arrays (w#) and text (text#) stay below their local stage
    p.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach {
      ex =>
        assert(!ex.contains("text#") && !ex.contains(" w#"),
          s"corpus text rides a shuffle: $ex")
    }
    // the owner pass is partial-aggregated before its exchange (map-side
    // min per window hash — the boilerplate-duplication bound)
    val exIdx = p.indexOf("Exchange")
    assert(p.take(math.max(exIdx, 0)).contains("HashAggregate") ||
      p.contains("partial_min"),
      s"ownership min must combine map-side:\n$p")
  }

  test("t34: shard export is ONE hash exchange; text never moves") {
    val p = plan(TextOps.t34ShardExport(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("text#") ||
      !p.linesIterator.exists(l => l.contains("Exchange") && l.contains("text#")),
      s"document text rides the export shuffle:\n$p")
    // one shard exchange feeds both the window rank and the final
    // aggregate (the agg's grouping is a subset of the window partitioning,
    // so no second corpus-sized shuffle; the 8-row result exchange is fine)
    val corpusExchanges = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning"))
      .filter(l => l.contains("shard#")).size
    assert(corpusExchanges <= 2, s"expected <=2 shard exchanges:\n$p")
  }

  test("ann19: graph pairs form inside cells only; serving stays bounded") {
    import graft.tables.Tables
    // build plan: the pair join is KEYED on cid (never all-pairs); the
    // only nested loops are the tiny centroid broadcasts (the ann03 shape)
    val en = GraphAnn.withNorm(Similarity.pqEmb(Tables.embeddings(spark, sf)))
    val cents = GraphAnn.graphCentroids(en, 64)
    val pBuild = plan(GraphAnn.graphEdges(en,
      GraphAnn.graphAssign(en, cents, 2), 12))
    assert(!pBuild.contains("CartesianProduct"), s"graph build cartesianed:\n$pBuild")
    // serving plan: frontier/query joins broadcast; no cartesian anywhere
    val pServe = plan(GraphAnn.annGraph(spark, sf))
    assert(!pServe.contains("CartesianProduct"), s"graph serve cartesianed:\n$pServe")
  }
}
