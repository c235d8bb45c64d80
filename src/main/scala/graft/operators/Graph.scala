package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis operators over pair/edge sets (the near-duplicate
  * graph, user-interaction graphs): degree statistics and a
  * deterministic fixed-point PageRank. Complements
  * [[Dedup.connectedComponents]] — components tell you WHICH docs
  * cluster; centrality tells you which member is the hub (e.g. the
  * canonical page a mirror farm copies from).
  *
  * All arithmetic is integer fixed-point (scores scaled by 10⁴,
  * per-neighbor contribution `pr DIV deg`, damping `(85·x) DIV 100`)
  * so every iteration is exact and engine-portable — the same
  * determinism contract as [[Similarity.ivfTrain]]'s quantized Lloyd.
  */
object Graph {

  /** Undirected symmetrized distinct edge list (u, v). */
  private def symmetric(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
    e.union(e.select(col("v").as("u"), col("u").as("v"))).distinct()
  }

  /** Per-node degree over the symmetrized graph — the pre-analysis for
    * skew (a 10⁶-degree hub node dominates any message-passing step). */
  def degrees(pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame =
    symmetric(pairs, aCol, bCol)
      .groupBy(col("u").as("doc_id"))
      .agg(count(lit(1)).as("degree"))

  /** Exact per-node triangle census + local clustering coefficient
    * over the undirected pair graph, via the degree-ordered
    * "compact-forward" algorithm (Latapy 2008; the standard
    * MapReduce/Spark shape): every edge is DIRECTED from its
    * lower-(degree, id) endpoint to its higher one, wedges are
    * enumerated only at each edge's source, and a triangle is
    * counted exactly once — at its lowest-rank corner.
    *
    * Why the ordering matters at scale: an undirected wedge join
    * fans out Σ deg(v)² (a 10⁶-degree hub contributes 10¹² wedges);
    * directing by degree bounds each node's out-degree by O(√m), so
    * the wedge join is O(m^{3/2}) worst-case — the best possible for
    * exact counting — and hub nodes stop being stragglers. Shape:
    * one self-join of the directed edge list on `src` (the wedge),
    * one equi-join probing the directed edge set for the closing
    * edge, one explode-3-corners aggregation back to node grain.
    *
    * Output: (doc_id, degree, n_triangles, cc_permille) for every
    * node in the graph — cc = 2·T/(deg·(deg−1)) in exact integer
    * permille, 0 for degree-1 nodes. The near-dup reading: a high
    * clustering coefficient marks a mirror CLIQUE (every copy pairs
    * with every other), while a high-degree low-cc node is a hub
    * template shared by many otherwise-unrelated docs. */
  def triangles(pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    // the canonical edge list feeds SIX subtrees (degrees + the
    // directed list's three join roles + the node spine) and `pairs`
    // is usually an expensive candidate pipeline — materialize once
    // (the [[pageRank]] `sym` discipline; edge-list-sized, the same
    // footprint every distributed triangle counter pins)
    val e = pairs.select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    val dg = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // canonical u < v, so the (deg, id)-lexicographic direction
    // reduces to deg(u) <= deg(v) ? u→v : v→u; each directed edge
    // carries its DESTINATION's degree (the wedge-ordering key)
    val dir = e
      .join(dg.select(col("u"), col("deg").as("du")), "u")
      .join(dg.select(col("u").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") <= col("dv"), col("u")).otherwise(col("v")).as("src"),
        when(col("du") <= col("dv"), col("v")).otherwise(col("u")).as("dst"),
        when(col("du") <= col("dv"), col("dv")).otherwise(col("du")).as("ddeg"))
    val e2 = dir.select(col("src").as("__s2"), col("dst").as("__d2"), col("ddeg").as("__g2"))
    val e3 = dir.select(col("src").as("__s3"), col("dst").as("__d3"))
    val tri = dir.join(e2, col("src") === col("__s2") &&
        (col("ddeg") < col("__g2") ||
          (col("ddeg") === col("__g2") && col("dst") < col("__d2"))))
      .join(e3, col("dst") === col("__s3") && col("__d2") === col("__d3"))
      .select(col("src").as("x"), col("dst").as("y"), col("__d2").as("z"))
    val corners = tri.select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
    dg.select(col("u").as("doc_id"), col("deg").as("degree"))
      .join(corners, Seq("doc_id"), "left")
      .select(col("doc_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          expr("(2000 * coalesce(n_triangles, 0)) DIV (degree * (degree - 1))"))
          .otherwise(lit(0L)).as("cc_permille"))
  }

  /** Deterministic PageRank over the undirected pair graph, `iters`
    * fixed iterations, damping 0.85, scores in fixed-point (initial
    * score 10000 per node). Exact recurrence (all integer ops):
    *
    *   pr'(v) = 1500 + (85 · Σ_{u→v} (pr(u) DIV deg(u))) DIV 100
    *
    * Scale shape per iteration: ONE shuffle-join of the edge list with
    * the score table on `u` plus a map-side-combinable sum per `v` —
    * identical to [[Dedup.connectedComponents]]' round shape, with the
    * same `localCheckpoint`-per-round lineage truncation and
    * round-(k−1) block release. The returned frame rides the final
    * round's blocks: release with [[Caching.releaseLocalCheckpoints]]
    * once consumed. Nodes appear iff they occur in a pair (a node's
    * neighbors all contribute; there are no dangling nodes in a
    * symmetrized graph). */
  def pageRank(pairs: DataFrame, iters: Int,
               aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val sym = symmetric(pairs, aCol, bCol).localCheckpoint()
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // edges with the sender's degree attached once, not per round
    val edges = sym.join(deg, "u").localCheckpoint()
    Caching.releaseLocalCheckpoints(sym)
    val nodes = edges.select(col("u").as("node")).distinct()
    var pr = nodes.withColumn("pr", lit(10000L)).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr.select(col("node").as("u"), col("pr")), "u")
        .select(col("v"), expr("pr DIV deg").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("s"))
      val next = nodes
        .join(contrib.select(col("v").as("node"), col("s")), Seq("node"), "left")
        .select(col("node"),
          (lit(1500L) + expr("(85 * coalesce(s, 0)) DIV 100")).as("pr"))
        .localCheckpoint()
      Caching.releaseLocalCheckpoints(pr)
      pr = next
    }
    Caching.releaseLocalCheckpoints(edges)
    pr.select(col("node").as("doc_id"), col("pr"))
  }

  /** Deterministic HITS (Kleinberg hubs/authorities) over the
    * undirected pair graph, `iters` fixed rounds, all-integer
    * fixed-point: per round
    *
    *   hub'(u)  = Σ_{u→v} auth(v),  then rescale so max = 10000
    *   auth'(v) = Σ_{u→v} hub'(u),  then rescale so max = 10000
    *
    * (rescaling is `raw·10⁴ DIV max` — the integer twin of HITS' L∞
    * normalization, exact and engine-portable). On the symmetrized
    * near-dup graph hubs ≈ authorities ≈ eigenvector centrality: the
    * canonical template a mirror farm copies from scores 10000, its
    * copies proportionally less — [[pageRank]]'s damped walk weights
    * by reachability, HITS by mutual reinforcement, and the PAIR of
    * scores separates "links to everything" from "everything links
    * to it" on directed inputs.
    *
    * Scale shape per round: two shuffle-joins of the edge list with
    * the score table plus map-side-combinable sums — [[pageRank]]'s
    * round shape twice — and the max is ONE scalar aggregate
    * broadcast back (no window over all nodes). Same
    * `localCheckpoint`-per-round lineage discipline; release the
    * result with [[Caching.releaseLocalCheckpoints]] once consumed. */
  def hits(pairs: DataFrame, iters: Int,
           aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val edges = symmetric(pairs, aCol, bCol).localCheckpoint()
    val nodes = edges.select(col("u").as("node")).distinct()
    def sumOver(scores: DataFrame, inCol: String, outCol: String): DataFrame =
      edges.join(scores.select(col("node").as(inCol), col("score")), inCol)
        .groupBy(col(outCol).as("node")).agg(sum(col("score")).as("raw"))
    def normalized(raw: DataFrame): DataFrame =
      raw.crossJoin(broadcast(raw.agg(max(col("raw")).as("__mx"))))
        .select(col("node"), expr("(raw * 10000) DIV __mx").as("score"))
    var auth = nodes.withColumn("score", lit(10000L)).localCheckpoint()
    var hub = auth
    for (_ <- 1 to iters) {
      val h2 = normalized(sumOver(auth, "v", "u")).localCheckpoint()
      if (hub ne auth) Caching.releaseLocalCheckpoints(hub)
      hub = h2
      val a2 = normalized(sumOver(hub, "u", "v")).localCheckpoint()
      Caching.releaseLocalCheckpoints(auth)
      auth = a2
    }
    val out = hub.select(col("node").as("doc_id"), col("score").as("hub"))
      .join(auth.select(col("node").as("doc_id"), col("score").as("auth")), "doc_id")
    Caching.releaseLocalCheckpoints(edges)
    out
  }

  /** k-core decomposition by iterative peeling to the FIXPOINT:
    * repeatedly delete every node of degree < k (with its edges)
    * until none remains; the survivors are the k-core — the standard
    * "dense sub-community" extraction (Seidman 1983). In the near-dup
    * graph a k-core is a tight mirror community: every member still
    * pairs with ≥ k others after all loosely-attached copies peel
    * away — stronger evidence than a connected component (one shared
    * gram chains components; cores require sustained mutual
    * similarity).
    *
    * Returns (doc_id, core_degree) for k-core members, degree counted
    * WITHIN the core.
    *
    * Scale shape per round: one map-side-combinable degree count +
    * two anti-joins against the (typically tiny, auto-broadcast)
    * low-degree node set; `localCheckpoint` per round with previous
    * blocks released — the [[pageRank]]/[[Dedup.connectedComponents]]
    * loop discipline. Round COUNT is the peeling depth of the graph,
    * which for near-dup graphs (clique-ish mirror clusters plus
    * pendant chains) is small; the driver-side per-round `count()` is
    * one long, not data. The returned frame rides the final round's
    * checkpoint — release with [[Caching.releaseLocalCheckpoints]]
    * once consumed. `maxRounds` bounds pathological peeling chains
    * (a path graph peels O(n) rounds — if the bound trips, the result
    * is the round-`maxRounds` over-approximation and `require` fails
    * loudly rather than silently under-peeling). */
  def kCore(pairs: DataFrame, k: Int, maxRounds: Int = 50,
            aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val (core, _) = kCoreWithRounds(pairs, k, maxRounds, aCol, bCol)
    core
  }

  /** Single-source BFS shortest-hop distances from the LOWEST node id
    * in the graph — reachability + distance structure of the min-id
    * node's component (in the near-dup graph: how far does the oldest
    * document's similarity neighborhood extend — direct copies at
    * distance 1, copies-of-copies at 2, drift chains beyond). Exact
    * unweighted distances by frontier relaxation to the fixpoint:
    * per round ONE equi-join of the edge list with the (shrinking)
    * frontier plus an anti-join against settled nodes;
    * `localCheckpoint` per round with prior blocks released — the
    * [[pageRank]] loop discipline. Round count = the source's
    * eccentricity (near-dup graphs: small); `maxRounds` fails loudly
    * on pathological chains. Returns (doc_id, dist) for the source's
    * component only; release with
    * [[Caching.releaseLocalCheckpoints]]. */
  def bfsFromMin(pairs: DataFrame, maxRounds: Int = 50,
                 aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val (d, _) = bfsFromMinWithRounds(pairs, maxRounds, aCol, bCol)
    d
  }

  /** [[bfsFromMin]] plus the realized round count (the DuckDB oracle
    * bounds its recursive walk, so tests pin eccentricity within that
    * budget). */
  private[graft] def bfsFromMinWithRounds(pairs: DataFrame, maxRounds: Int = 50,
      aCol: String = "doc_a", bCol: String = "doc_b"): (DataFrame, Int) = {
    val session = pairs.sparkSession
    import session.implicits._
    val sym = symmetric(pairs, aCol, bCol).localCheckpoint()
    val srcRow = sym.agg(min(col("u"))).head
    if (srcRow.isNullAt(0)) {
      Caching.releaseLocalCheckpoints(sym)
      return (Seq.empty[(Long, Long)].toDF("doc_id", "dist"), 0)
    }
    val src = srcRow.getLong(0)
    var dist = Seq((src, 0L)).toDF("doc_id", "dist").localCheckpoint()
    var frontCp = dist // checkpointed frame backing the current frontier
    var round = 0
    var done = false
    while (!done) {
      val next = sym.join(frontCp.select(col("doc_id").as("u")), "u")
        .select(col("v").as("doc_id")).distinct()
        .join(dist.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .withColumn("dist", lit(round + 1L))
        .localCheckpoint()
      if (next.isEmpty) {
        Caching.releaseLocalCheckpoints(next)
        done = true
      } else {
        require(round < maxRounds,
          s"BFS exceeded $maxRounds rounds — pathological chain graph; raise maxRounds")
        val grown = dist.union(next).localCheckpoint()
        val distOld = dist
        val frontOld = frontCp
        dist = grown
        frontCp = next
        Caching.releaseLocalCheckpoints(distOld)
        if (frontOld ne distOld) Caching.releaseLocalCheckpoints(frontOld)
        round += 1
      }
    }
    if (frontCp ne dist) Caching.releaseLocalCheckpoints(frontCp)
    Caching.releaseLocalCheckpoints(sym)
    (dist, round)
  }

  /** [[kCore]] plus the realized peeling-round count (spec surface:
    * the DuckDB oracle unrolls a fixed number of rounds, so tests pin
    * convergence within that budget). */
  private[graft] def kCoreWithRounds(pairs: DataFrame, k: Int, maxRounds: Int = 50,
      aCol: String = "doc_a", bCol: String = "doc_b"): (DataFrame, Int) = {
    require(k >= 1, "k must be >= 1")
    var edges = symmetric(pairs, aCol, bCol).localCheckpoint()
    var rounds = 0
    var changed = true
    while (changed) {
      val low = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") < k).select(col("u").as("lu"))
      if (low.isEmpty) changed = false
      else {
        require(rounds < maxRounds,
          s"k-core peeling exceeded $maxRounds rounds — pathological chain graph; raise maxRounds")
        val pruned = edges
          .join(low.select(col("lu").as("u")), Seq("u"), "left_anti")
          .join(low.select(col("lu").as("v")), Seq("v"), "left_anti")
          .localCheckpoint()
        Caching.releaseLocalCheckpoints(edges)
        edges = pruned
        rounds += 1
      }
    }
    (edges.groupBy(col("u").as("doc_id")).agg(count(lit(1)).as("core_degree")),
      rounds)
  }
}
