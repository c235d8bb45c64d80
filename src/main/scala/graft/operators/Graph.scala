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
}
