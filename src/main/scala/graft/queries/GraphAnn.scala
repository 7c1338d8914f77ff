package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Graph-based ANN — the recall rung of the ladder (NSW/HNSW-class:
  * Malkov & Yashunin, "Efficient and robust approximate nearest neighbor
  * search using Hierarchical Navigable Small World graphs", TPAMI 2018).
  * The quantization rungs (LSH → IVF → PQ → OPQ-IVF-PQ → SQ8) trade recall
  * for bounded scan cost; graph search trades a precomputed neighbor
  * structure for HIGH recall at a small, explicit visit budget — the
  * industry-standard serving regime for retrieval.
  *
  * Everything here is DETERMINISTIC so a DuckDB oracle can replay the
  * whole pipeline (the battery's embedded-sample discipline; no RNG, no
  * insertion-order dependence — unlike textbook HNSW, whose graph depends
  * on random level draws and insert order, this graph is a PURE FUNCTION
  * of corpus state, which is also what makes the maintained variant's
  * incremental ≡ from-scratch spec possible at all):
  *
  *   1. **Cells**: `nCells` coarse centroids = the md5-smallest corpus
  *      vectors (the ann03 sample discipline). Every vector joins its
  *      `probes` nearest cells (rounded cosine, min-cid ties) — the
  *      multi-assignment is what gives the graph cross-cell edges, the
  *      same role HNSW's long links play.
  *   2. **Edges**: within each cell, every member ranks its cell-mates by
  *      rounded cosine and keeps its `degree` best — a bounded-degree
  *      approximate kNN graph. Pair work is O(Σ cell²) like SemDeDup
  *      (d10), never all-pairs; only (id, id, double) rows shuffle.
  *   3. **Search**: beam search as `hops` UNROLLED bounded iterative
  *      joins. The beam starts from the centroids themselves (fixed,
  *      engine-independent entry points), each hop expands the current
  *      `beamWidth`-best visited nodes through the graph, scores the
  *      frontier exactly (rounded cosine), and re-selects the beam from
  *      ALL visited. Visit budget per query is closed-form:
  *      `nCells + hops·beamWidth·degree` candidates, independent of
  *      corpus size.
  *
  * Scale shape: the graph table carries `degree` int pairs per vector —
  * O(N) state, equi-join-maintainable (see [[GraphIndex]] for the
  * changefeed-maintained variant). Serving touches `beamWidth·degree`
  * ids per hop per query; the only corpus-sized operations are the
  * build-time cell join (bounded by cell size) and the map-only scoring
  * scans, which broadcast the bounded frontier. On a real cluster the
  * frontier fetch is a point-lookup against the (bucketed) corpus table;
  * here it is a broadcast-semi-join over the slot-cached corpus — same
  * plan family as the PQ re-rank.
  *
  * Reference scope note: the reference (a metadata-plane Go client) has
  * no ANN surface at all; this module is engine-native functionality the
  * LLM-pipeline brief requires.
  */
object GraphAnn {

  /** Graph geometry + search budget. `nCells` is a FLOOR: the session
    * build raises the cell count to `corpus·probes / targetCellPop`
    * (the SemDeDup scaling argument, implemented rather than documented),
    * so cell population — and with it the Σ cell² pair stage and the
    * oracle's replay cost — stays CONSTANT as the corpus grows: the
    * build is linear in N at any scale. The battery corpora at
    * sf0.001/sf0.01 sit exactly at the floor, so their results are
    * unchanged by the adaptivity. The maintained index ([[GraphIndex]])
    * deliberately does NOT adapt: its centers are frozen at bootstrap
    * (re-scaling a live index's geometry means re-bootstrapping it). */
  final case class GraphParams(nCells: Int = 64, probes: Int = 2,
                               degree: Int = 12, beamWidth: Int = 12,
                               hops: Int = 3, refine: Int = 2,
                               targetCellPop: Int = 16)

  /** The adaptive cell count for a corpus of `n` vectors. */
  private[queries] def effectiveCells(n: Long, p: GraphParams): Int =
    math.max(p.nCells,
      ((n * p.probes + p.targetCellPop - 1) / p.targetCellPop).toInt)

  /** The cell count the last [[annGraph]]/[[annGraphVisited]] run used —
    * embedded into [[annGraphSql]] (the ann17 learned-literal
    * discipline: Verify runs queries BEFORE dumping oracle SQL). */
  @volatile private var lastGraphCells: Option[Int] = None
  CacheSlot.onReleaseAll(() => lastGraphCells = None)

  private val enSlot = new CacheSlot
  // the centroid sample is bounded (effectiveCells rows) derived state —
  // resident like the corpus projection, so a serve pass does not re-run
  // the md5 TakeOrdered over the corpus
  private val centsSlot = new CacheSlot

  /** Memoized corpus cardinality, keyed on the corpus plan (r19): the
    * adaptive cell count needs `en.count()`, which was an eager extra job
    * on EVERY serve pass — the count is index metadata (a server knows its
    * corpus size), the same derived-state class as [[lastGraphCells]] and
    * the centroid slot; drops with the battery caches. */
  private val countMemoLock = new Object
  private var countMemo: List[(DataFrame, Long)] = Nil
  CacheSlot.onReleaseAll(() => countMemoLock.synchronized { countMemo = Nil })
  private def corpusCount(en: DataFrame): Long = countMemoLock.synchronized {
    countMemo.find { case (df, _) =>
      (df.sparkSession eq en.sparkSession) && df.sameSemantics(en)
    } match {
      case Some((_, n)) => n
      case None =>
        val n = en.count()
        countMemo = (en, n) :: countMemo.take(3)
        n
    }
  }

  /** Memoized built graph, keyed on the BASE edge plan's semantics + the
    * params (the d06 connected-components memo pattern): the refined
    * graph is a chain of localCheckpoints whose plans never compare equal
    * across builds, so a CacheSlot can't key on the OUTPUT — this keys on
    * the lazy input instead and drops with the battery caches via the
    * releaseAll hook. */
  private val graphMemoLock = new Object
  private var graphMemo: Option[(DataFrame, GraphParams, DataFrame)] = None
  CacheSlot.onReleaseAll(() => graphMemoLock.synchronized { graphMemo = None })

  import Similarity.dot

  /** (vec_id, e, norm) corpus projection all stages share. */
  private[queries] def withNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("e"),
      sqrt(dot(col("e"), col("e"))).as("norm"))

  /** Deterministic entry points / cell centers: the `nCells` md5-smallest
    * corpus vectors (ann03's sample discipline — reproducible across
    * runs, partitionings, and engines). */
  private[queries] def graphCentroids(en: DataFrame, nCells: Int): DataFrame =
    en.withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy("h").limit(nCells)
      .select(col("vec_id").as("cid"), col("e").as("ce"),
        col("norm").as("cnorm"))

  /** Rounded cosine between two (vec, norm) column pairs — the engine-
    * mirrorable score every ordering and union in this module uses. */
  private def cosr(a: String, an: String, b: String, bn: String) =
    round(dot(col(a), col(b)) / (col(an) * col(bn)), 6)

  /** Each corpus vector's `probes` nearest cells. Only (vec_id, cid,
    * score) rows reach the window — embeddings stay out of the shuffle. */
  private[queries] def graphAssign(en: DataFrame, cents: DataFrame,
                                   probes: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("simr").desc, col("cid"))
    en.join(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        cosr("e", "norm", "ce", "cnorm").as("simr"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= probes)
      .select("vec_id", "cid")
  }

  /** Bounded-degree kNN graph: per node, its `degree` best cell-mates by
    * rounded cosine (ties by dst id). A pair sharing both probed cells
    * scores identically in each, so the pre-rank `distinct` collapses it.
    * The cell join is the d10 shape: pair work bounded by cell size,
    * partition-local per cell. */
  private[queries] def graphEdges(en: DataFrame, asg: DataFrame,
                                  degree: Int): DataFrame = {
    val a = asg.join(en, "vec_id")
      .select(col("cid"), col("vec_id").as("src"),
        col("e").as("ea"), col("norm").as("na"))
    val b = asg.join(en, "vec_id")
      .select(col("cid"), col("vec_id").as("dst"),
        col("e").as("eb"), col("norm").as("nb"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cr").desc, col("dst"))
    a.join(b, Seq("cid"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), cosr("ea", "na", "eb", "nb").as("cr"))
      .distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= degree)
      .select("src", "dst")
  }

  /** One NN-Descent refinement round (Dong et al., WWW 2011): each node
    * re-ranks the union of its current edges and its neighbors' neighbors
    * and keeps the `degree` best. Cell-built edges are LOCAL by
    * construction; a neighbor's neighbor reaches across cell boundaries,
    * which is what makes the graph navigable from distant entry points.
    * O(N·degree²) candidate pairs per round — corpus-linear. */
  private[queries] def graphRefine(en: DataFrame, graph: DataFrame,
                                   degree: Int): DataFrame = {
    val hop2 = graph.select(col("src"), col("dst").as("mid"))
      .join(graph.select(col("src").as("mid"), col("dst")), Seq("mid"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
    val cand = graph.select("src", "dst").union(hop2).distinct()
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cr").desc, col("dst"))
    cand
      .join(en.select(col("vec_id").as("src"),
        col("e").as("ea"), col("norm").as("na")), Seq("src"))
      .join(en.select(col("vec_id").as("dst"),
        col("e").as("eb"), col("norm").as("nb")), Seq("dst"))
      .select(col("src"), col("dst"), cosr("ea", "na", "eb", "nb").as("cr"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= degree)
      .select("src", "dst")
  }

  /** Build the full graph: cell-bucketed kNN edges + `refine` NN-Descent
    * rounds. Each round is checkpointed before the next: the 2-hop
    * self-join references its input twice and the union a third time, so
    * an unbroken lineage would recompute the base cell join 3^refine
    * times. The edge set is N·degree int pairs — the materialization is
    * the cheap side of that trade at any corpus size. */
  private[queries] def buildGraph(en: DataFrame, cents: DataFrame,
                                  p: GraphParams): DataFrame = {
    val base = graphEdges(en, graphAssign(en, cents, p.probes), p.degree)
    graphMemoLock.synchronized {
      graphMemo match {
        case Some((b, bp, g)) if bp == p &&
            (b.sparkSession eq base.sparkSession) && b.sameSemantics(base) => g
        case _ =>
          var g = base.localCheckpoint()
          for (_ <- 1 to p.refine)
            g = graphRefine(en, g, p.degree).localCheckpoint()
          graphMemo = Some((base, p, g))
          g
      }
    }
  }

  /** Beam search over a prebuilt graph, unrolled `hops` times. Returns
    * the FULL visited set `(qid, nid, cos)` — callers top-k it (battery)
    * or inspect it (the recall/budget specs). Deleted-node hygiene for
    * maintained graphs: entry points are centroid VECTORS frozen at
    * bootstrap, so a centroid whose node has since left the corpus still
    * navigates, but the final selection must semi-join the corpus —
    * [[topKFromVisited]] does. */
  /** Run `f` with AQE disabled, restoring the previous setting. The beam
    * hops are bounded iterative micro-queries: every join is an explicit
    * broadcast, every exchange moves ≤ a few thousand rows, and AQE has
    * nothing to re-optimize — but it materializes each of them as its own
    * query-stage JOB, ~30 scheduled micro-jobs per serve. Measured r19
    * (warm serve, sf0.1): ann19 1.69 → 1.10 s, ann20 1.64 → 1.27 s from
    * this toggle alone. Scoped: the graph BUILD (real shuffles, windows
    * over cell pairs) keeps AQE. */
  private[queries] def withoutAqe[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prev)
  }

  private[queries] def beamVisited(en: DataFrame, cents: DataFrame,
                                   graph: DataFrame, queries: DataFrame,
                                   p: GraphParams): DataFrame = withoutAqe(en.sparkSession) {
    val q = broadcast(queries)
    var visited = q.join(broadcast(cents))
      .select(col("qid"), col("cid").as("nid"),
        cosr("qe", "qnorm", "ce", "cnorm").as("cos"))
    val wBeam = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    for (_ <- 1 to p.hops) {
      val beam = visited
        .withColumn("rk", row_number().over(wBeam))
        .filter(col("rk") <= p.beamWidth)
        .select(col("qid"), col("nid"))
      // frontier is bounded at nQueries·beamWidth·degree rows → broadcast;
      // the scoring join streams the (cached) corpus map-only. NOT
      // deduped here (r18): a node reached via two beam members scores
      // identically, and the union-distinct below collapses it — same
      // visited set, one less exchange per hop (guide §2.4). The BEAM side
      // broadcasts explicitly (r19): it is ≤ nQueries·beamWidth rows, but
      // it reads from a checkpointed RDD whose size estimate the planner
      // can't see — left alone the join could plan as a shuffle of the
      // graph table, two exchanges per hop for a 120-row probe.
      val frontier = broadcast(beam).join(graph, beam("nid") === graph("src"))
        .select(col("qid"), col("dst").as("nid"))
      val scored = en.join(broadcast(frontier),
          en("vec_id") === frontier("nid"))
        .join(q, "qid")
        .select(col("qid"), col("nid"),
          cosr("qe", "qnorm", "e", "norm").as("cos"))
      // rounded scores are engine-exact, so union-distinct dedups a
      // re-visited node instead of double-counting it.
      // localCheckpoint truncates lineage per hop: each hop's plan
      // otherwise references the previous visited TWICE (beam + union),
      // so hop h recomputes hop 1's joins 2^(h-1) times. The visited set
      // is bounded at nQueries·(nCells + hops·beamWidth·degree) rows, so
      // the materialization is trivial while the plan stays linear in
      // hops — the standard Spark iterative-algorithm shape. (r19 note:
      // the fully-LAZY unroll was measured — ann19 1.44 → 2.95 s, the
      // 2^hops duplicated window/broadcast stages cost far more than the
      // three job barriers they remove. Checkpoint-per-hop stays.)
      //
      // ONE exchange per hop (r19, guide §2.4): the dedup rides an
      // explicit repartition by qid — hashpartitioning(qid) satisfies the
      // full-row dropDuplicates (same-key rows share the qid partition)
      // AND is what the NEXT hop's beam window and the final top-k window
      // need, and localCheckpoint preserves the partitioning in the RDD it
      // hands on. The r18 shape paid a (qid, nid, cos) distinct exchange
      // per hop PLUS a qid window exchange per consumer.
      visited = visited.union(scored)
        .repartition(col("qid")).dropDuplicates()
        .localCheckpoint()
    }
    visited
  }

  /** Final top-k from a visited set: self excluded, corpus-membership
    * enforced (a frozen entry point may no longer be a corpus row). */
  private[queries] def topKFromVisited(visited: DataFrame, en: DataFrame,
                                       k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    visited.filter(col("qid") =!= col("nid"))
      .join(en.select(col("vec_id").as("nid")), Seq("nid"), "left_semi")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank")
      .orderBy("qid", "rank")
  }

  private def queriesOf(en: DataFrame, nQueries: Int): DataFrame =
    en.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("norm").as("qnorm"))

  /** Battery entry ann19: session-built graph + beam search over the raw
    * embeddings corpus. Graph construction is slot-cached (the d01/ann06
    * resident-index discipline) — queries on the same corpus reuse it. */
  def annGraph(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
               p: GraphParams = GraphParams()): DataFrame = {
    val en = enSlot(withNorm(Similarity.pqEmb(Tables.embeddings(s, d))))
    val cells = effectiveCells(corpusCount(en), p)
    lastGraphCells = Some(cells)
    val cents = centsSlot(graphCentroids(en, cells))
    val graph = buildGraph(en, cents, p)
    // the final selection (window + corpus semi-join over the bounded
    // visited set) materializes inside the same AQE-off scope as the hops
    // — still computed fresh on every serve; only the scheduling changes
    withoutAqe(s) {
      topKFromVisited(
        beamVisited(en, cents, graph, queriesOf(en, nQueries), p), en, k)
        .localCheckpoint()
    }
  }

  /** The visited set of the battery-default search — exposed for the
    * recall/budget specs (visit counts, recall at the actual budget). */
  def annGraphVisited(s: SparkSession, d: String, nQueries: Int = 10,
                      p: GraphParams = GraphParams()): DataFrame = {
    val en = enSlot(withNorm(Similarity.pqEmb(Tables.embeddings(s, d))))
    val cells = effectiveCells(corpusCount(en), p)
    lastGraphCells = Some(cells)
    val cents = centsSlot(graphCentroids(en, cells))
    val graph = buildGraph(en, cents, p)
    beamVisited(en, cents, graph, queriesOf(en, nQueries), p)
  }

  // ------------------------------------------------------------- oracle

  private def dotSql(a: String, b: String): String =
    s"list_sum([$a.e[i] * $b.e[i] for i in range(1, len($a.e)+1)])"
  private def cosrSql(a: String, b: String): String =
    s"ROUND(${dotSql(a, b)} / ($a.norm * $b.norm), 6)"

  /** The graph oracle over arbitrary relations: `eRel` is the (vec_id,
    * e double-list) corpus the graph/search run against; `centroidRel`
    * (default: the corpus itself) is the relation the centroid sample is
    * drawn from — the maintained index (ann20) pins it to the
    * BOOTSTRAP-time corpus state, exactly the ann09 frozen-quantizer
    * technique. The beam loop is UNROLLED hop by hop; UNION (not UNION
    * ALL) replays Spark's union-distinct because the rounded scores are
    * bit-identical across engines. */
  def annGraphSqlOver(eRel: String, centroidRel: Option[String] = None,
                      nQueries: Int = 10, k: Int = 5,
                      p: GraphParams = GraphParams(),
                      nCellsOverride: Option[Int] = None): String = {
    val nCells = nCellsOverride.getOrElse(p.nCells)
    val centSrc = centroidRel.fold("SELECT vec_id, e, norm FROM en")(r =>
      s"""SELECT vec_id, e,
            sqrt(list_sum([e[i] * e[i] for i in range(1, len(e)+1)])) AS norm
          FROM ($r) c0""")
    // NN-Descent refinement rounds, unrolled like the beam hops
    val refineCtes = (1 to p.refine).map { r =>
      val prev = s"g${r - 1}"
      s"""pc$r AS (
           SELECT src, dst FROM $prev
           UNION
           SELECT a.src, b.dst FROM $prev a JOIN $prev b ON a.dst = b.src
           WHERE a.src <> b.dst),
         g$r AS (
           SELECT src, dst FROM (
             SELECT c.src, c.dst,
                    ROW_NUMBER() OVER (PARTITION BY c.src
                      ORDER BY ${cosrSql("ea", "eb")} DESC, c.dst) AS rk
             FROM pc$r c
             JOIN en ea ON ea.vec_id = c.src
             JOIN en eb ON eb.vec_id = c.dst) t
           WHERE rk <= ${p.degree})"""
    }.mkString(",\n       ") + (if (p.refine > 0) "," else "")
    val hopCtes = (1 to p.hops).map { h =>
      val prev = s"v${h - 1}"
      s"""b$h AS (
           SELECT qid, nid FROM (
             SELECT qid, nid,
                    ROW_NUMBER() OVER (PARTITION BY qid
                      ORDER BY cos DESC, nid) AS rk
             FROM $prev) t
           WHERE rk <= ${p.beamWidth}),
         f$h AS (
           SELECT DISTINCT b.qid, g.dst AS nid
           FROM b$h b JOIN g ON g.src = b.nid),
         s$h AS (
           SELECT f.qid, f.nid, ${cosrSql("q", "n")} AS cos
           FROM f$h f
           JOIN en n ON n.vec_id = f.nid
           JOIN q ON q.qid = f.qid),
         v$h AS (SELECT * FROM $prev UNION SELECT * FROM s$h)"""
    }.mkString(",\n       ")
    s"""WITH e0 AS ($eRel),
       en AS (
         SELECT vec_id, e,
                sqrt(list_sum([e[i] * e[i] for i in range(1, len(e)+1)])) AS norm
         FROM e0),
       c AS (
         SELECT vec_id AS cid, e, norm FROM ($centSrc) cs
         ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $nCells),
       asg AS (
         SELECT vec_id, cid FROM (
           SELECT a.vec_id, c.cid,
                  ROW_NUMBER() OVER (PARTITION BY a.vec_id
                    ORDER BY ${cosrSql("a", "c")} DESC, c.cid) AS rk
           FROM en a, c) t
         WHERE rk <= ${p.probes}),
       pairs AS (
         SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst,
                ${cosrSql("ea", "eb")} AS cr
         FROM asg a JOIN asg b USING (cid)
         JOIN en ea ON ea.vec_id = a.vec_id
         JOIN en eb ON eb.vec_id = b.vec_id
         WHERE a.vec_id <> b.vec_id),
       g0 AS (
         SELECT src, dst FROM (
           SELECT src, dst,
                  ROW_NUMBER() OVER (PARTITION BY src
                    ORDER BY cr DESC, dst) AS rk
           FROM pairs) t
         WHERE rk <= ${p.degree}),
       $refineCtes
       g AS (SELECT * FROM g${p.refine}),
       q AS (
         SELECT vec_id AS qid, e, norm FROM en WHERE vec_id < $nQueries),
       v0 AS (
         SELECT q.qid, c.cid AS nid, ${cosrSql("q", "c")} AS cos
         FROM q, c),
       $hopCtes
       SELECT qid, nid, rank FROM (
         SELECT qid, nid,
                ROW_NUMBER() OVER (PARTITION BY qid
                  ORDER BY cos DESC, nid) AS rank
         FROM v${p.hops}
         WHERE qid <> nid AND nid IN (SELECT vec_id FROM en)) t
       WHERE rank <= $k ORDER BY qid, rank"""
  }

  /** ann19's oracle over the raw embeddings table — a `def`: the
    * adaptive cell count of the LAST query run is embedded as a literal
    * (Verify runs every query before dumping oracle SQL). */
  def annGraphSql: String = annGraphSqlOver(
    "SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings",
    nCellsOverride = lastGraphCells)
}
