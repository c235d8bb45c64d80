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

  /** Deterministic random-hyperplane components: plane h, dim d ↦
    * (first md5 nibble of "h,d") − 7.5 ∈ [−7.5, 7.5]. md5-derived so
    * the DuckDB oracle can regenerate the identical planes — no RNG
    * state, no seed shipping. */
  private[graft] def rpPlane(h: Int, dims: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to dims).map { d =>
      val hex = md.digest(s"$h,$d".getBytes("UTF-8"))
      // first hex character = high nibble of byte 0
      ((hex(0) >> 4) & 0xf) - 7.5
    }.toArray
  }

  /** Sign-random-projection LSH signature: bit h = sign(v · plane_h).
    * Narrow — `numPlanes` codegen'd vec_dot calls per row, no shuffle.
    * Neighbors in cosine tend to share signature bits, so signature
    * byte-blocks make a sub-linear ANN candidate generator (the scale
    * path; brute-force is the baseline). */
  def rpLshSignature(df: DataFrame, numPlanes: Int = 16, dims: Int = 64,
                     vecCol: String = "embedding"): DataFrame = {
    require(numPlanes <= 63, "signature packs into a long")
    graft.plans.GraftExtensions.register(df.sparkSession)
    val sig = (0 until numPlanes).map { h =>
      val plane = typedlit(rpPlane(h, dims).toSeq)
      when(dot(col(vecCol), plane) > 0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("lsh_sig", sig)
  }

  /** LSH-bucketed ANN: candidates restricted to the query's signature
    * high-byte bucket, then exact cosine top-k inside the bucket. Same
    * equi-join shape as [[ivfTopK]] with a data-independent quantizer.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = rpLshSignature(withNorm(queries, vecCol), vecCol = vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("__n2").as("qn2"),
        shiftright(col("lsh_sig"), 8).as("__qblock"))
    val c = rpLshSignature(withNorm(candidates, vecCol), vecCol = vecCol)
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"), col("__n2").as("cn2"),
        shiftright(col("lsh_sig"), 8).as("__cblock"))
    val scored = c.join(broadcast(q),
        col("__qblock") === col("__cblock") && col("query_id") =!= col("cand_id"))
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
