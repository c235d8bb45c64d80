package graft

/** Whole-surface plan audit over `SparkEntry.queries`:
  *
  *  - `CartesianProduct` (a non-broadcast |L|×|R| shuffle product) is
  *    banned EVERYWHERE — always an outage at 100 TB;
  *  - `BroadcastNestedLoopJoin` is allowed only for queries on the
  *    whitelist below, where the broadcast side is model-small BY
  *    CONSTRUCTION (k-means centroids, a handful of ANN query
  *    vectors, single-row corpus statistics) — the loop is
  *    O(|data| · |model|), which is linear, not quadratic;
  *  - any NEW query slipping in with either shape fails here with its
  *    name, before a round driver or a cluster ever sees it.
  *
  * Individual shape budgets (exchange counts, broadcast sides,
  * aggregate strategies) live in `PlanShapeSpec`.
  */
class PlanAuditSpec extends SparkSpec {

  /** BNLJ-with-a-reason: every entry is a broadcast of a model-sized
    * side, not data×data. */
  private val bnljWhitelist: Map[String, String] = Map(
    "sim_ann_brute" -> "broadcast query vectors × candidates: the brute-force baseline by definition",
    "sim_ann_truncated" -> "broadcast query prefix-vectors × candidates: the MRL prefix scan (dot cost ∝ d); re-rank is equi-joins on the broadcast-small shortlist",
    "sim_dim_recall" -> "broadcast query vectors × candidates at each unnested trunc dim (the eval query is brute force by definition)",
    "sim_hard_negatives" -> "broadcast query vectors × candidates under the label-inequality condition (brute-force shape; the scale path swaps in the stored ANN shortlist)",
    "sim_eval_recall" -> "broadcast query vectors × candidates: the ground-truth side IS brute force by definition",
    "corpus_topic_mix" -> "broadcast trained centroids for cell assignment (k×dims)",
    "corpus_topic_drift" -> "broadcast trained centroids (assignment) + broadcast k-row global-mix grid cross join (both model-sized)",
    "sim_ann_ivf_nprobe" -> "broadcast trained centroids for cell assignment (k×dims)",
    "sim_ann_ivf_flat_stored" -> "broadcast STORED centroids for probe ranking (k×dims); cell scoring is the equi-join on the stored cell table",
    "sim_nprobe_recall" -> "broadcast STORED centroids (probe ranking) + broadcast query vectors for the brute-force truth side (recall eval is brute force by definition)",
    "sim_ann_ivf_trained" -> "broadcast trained centroids for cell assignment (k×dims)",
    "sim_ann_ivf_pp" -> "broadcast k-means||-trained centroids for cell assignment (k×dims)",
    "sim_ann_sq8" -> "broadcast query vectors × int8 candidate codes",
    "sim_ann_binary" -> "broadcast query sign-bit codes (8 bytes/query) × candidate codes: Hamming shortlist scan; re-rank is equi-joins on the k·r shortlist",
    "sim_ivf_assign" -> "broadcast centroids; min-distance assignment per vector",
    "sim_ann_ivfpq" -> "broadcast coarse centroids for cell assignment (k×dims)",
    "sim_ann_ivfpq_stored" -> "broadcast STORED coarse centroids for cell assignment (k×dims)",
    "sim_ann_ivfpq_nprobe" -> "broadcast STORED coarse centroids for probe ranking (k×dims)",
    "sim_ann_ivfpq_refine" -> "broadcast STORED coarse centroids for cell assignment (inherited from indexed serving); the refine stage itself is equi-joins on a broadcast-small shortlist",
    "dedup_governor_clones" -> "single-row pairs-count × single-row drop-accounting crossJoin (two scalar aggregates)",
    "sim_ann_index_append" -> "broadcast STORED model (centroids + codebook) against the delta being encoded",
    "sim_ann_ivfpq_residual" -> "broadcast coarse centroids for assignment/probe ranking and residual formation (k×dims)",
    "dedup_semantic" -> "broadcast trained cell centroids (SemDeDup blocking model)",
    "sim_bm25" -> "single-row corpus stats (N, avgdl) joined under every scored doc",
    "sim_rrf_fusion" -> "inherits sim_bm25's single-row corpus-stats join; the fusion itself is a union of k-row frames",
    "rel_skew_profile" -> "single-row total-count frame joined to per-key counts",
    "corpus_source_overlap" -> "broadcast distinct-source list (model-sized) under the pair inequality; the probe side is the per-source sketch (#sources × k rows), never the corpus",
    "rel_cms_topk" -> "broadcast top-12 probe-value list crossed with the distinct key list (both model-sized); the sketch probe itself is an equi-join on (key, row, pos)",
    "rel_ams_join_size" -> "single-row exact-count frame crossed with the single-row sketch estimate (two scalar aggregates, the dedup_governor_clones shape)",
    "rel_fk_audit" -> "single-row per-edge aggregates unioned into the report",
    "rel_funnel" -> "single-row per-stage counts chained into conversion rates",
    "mm_e2e_curate" -> "three single-row summary aggregates crossJoined (the dedup_governor_clones shape)",
    "corpus_modality_mix" -> "single-row corpus-total frame under the per-format counts (the rel_skew_profile shape)")

  test("no query plans a CartesianProduct; BNLJ only with a model-small broadcast reason") {
    // building the frame runs the eager parts of iterative queries
    // (k-means training, component propagation) at sf0.001 — cheap,
    // and exactly what the audit should see
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val plan = q(spark, sf).queryExecution.executedPlan.toString
      val cart = if (plan.contains("CartesianProduct")) Seq(s"$name → CartesianProduct") else Nil
      val bnlj = if (plan.contains("BroadcastNestedLoopJoin") && !bnljWhitelist.contains(name))
        Seq(s"$name → unexplained BroadcastNestedLoopJoin") else Nil
      cart ++ bnlj
    }
    assert(bad.isEmpty, s"${bad.size} violations:\n${bad.mkString("\n")}")
  }
}
