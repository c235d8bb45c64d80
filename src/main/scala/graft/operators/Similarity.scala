package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design:
  *  - norms are computed once per row (narrow), never per pair;
  *  - brute-force is the correctness baseline: broadcast the (small)
  *    query set against the full candidate table — candidates never
  *    shuffle;
  *  - the IVF path prunes candidates to the query's coarse cell
  *    (here the `label` column stands in for a trained quantizer
  *    assignment) — the same equi-join shape a 100 TB ANN index uses,
  *    with the cell id as partition key;
  *  - ranking uses round(cos, 4) + id tie-break so top-k membership is
  *    deterministic and engine-stable.
  */
object Similarity {

  /** Ascending-index dot product via the native codegen'd
    * [[graft.functions.VectorDot]] expression — bit-identical to the
    * interpreted fold and DuckDB's list_sum, but stays inside
    * whole-stage codegen (higher-order functions are CodegenFallback
    * and dominate pairwise-join cost). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorDot.vec_dot(a.cast("array<double>"), b.cast("array<double>"))

  def norm2(a: Column): Column = dot(a, a)

  /** Candidate side with its squared norm precomputed (one pass). */
  def withNorm(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    Partitioning.fanOut(df).withColumn("__n2", norm2(col(vecCol)))
  }

  private def cosFromParts(dotCol: Column, n2a: Column, n2b: Column): Column =
    round(dotCol / sqrt(n2a * n2b), 4)

  /** Brute-force top-k cosine neighbors of each query vector.
    * `queries` must be small (it is broadcast). Excludes self-matches.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = withNorm(queries, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("__n2").as("qn2"))
    val c = withNorm(candidates, vecCol)
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"), col("__n2").as("cn2"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosFromParts(dot(col("qv"), col("cv")), col("qn2"), col("cn2")))
      .select(col("query_id"), col("cand_id"), col("cos"))
    Relational.topNPerGroup(scored, Seq(col("query_id")),
      Seq(col("cos").desc, col("cand_id")), k, rankCol = "rank")
  }

  /** IVF-style pruned top-k: only candidates in the same coarse cell
    * (`cellCol`) as the query are scored. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int, cellCol: String,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = withNorm(queries, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("__n2").as("qn2"),
        col(cellCol).as("__qcell"))
    val c = withNorm(candidates, vecCol)
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"), col("__n2").as("cn2"),
        col(cellCol).as("__ccell"))
    val scored = c.join(broadcast(q),
        col("__qcell") === col("__ccell") && col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosFromParts(dot(col("qv"), col("cv")), col("qn2"), col("cn2")))
      .select(col("query_id"), col("cand_id"), col("cos"))
    Relational.topNPerGroup(scored, Seq(col("query_id")),
      Seq(col("cos").desc, col("cand_id")), k, rankCol = "rank")
  }

  /** Embedding near-duplicate pairs: block on the coarse cell, score
    * all intra-cell pairs, keep cos ≥ threshold. Blocking keeps the
    * pair count at cells×(cell_size²) instead of N². */
  def nearDupPairs(emb: DataFrame, cellCol: String, minCos: Double,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = withNorm(emb, vecCol)
    val a = base.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      col("__n2").as("na"), col(cellCol).as("cell"))
    val b = base.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      col("__n2").as("nb"), col(cellCol).as("__bcell"))
    a.join(b, col("cell") === col("__bcell") && col("id_a") < col("id_b"))
      .withColumn("cos", cosFromParts(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cell"), col("cos"))
  }
}
