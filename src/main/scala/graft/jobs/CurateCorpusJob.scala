package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** End-to-end training-data curation pipeline — the batch job a corpus
  * team would run nightly over the document lake:
  *
  *   1. quality scoring → drop low-quality docs;
  *   2. exact dedup (content hash, keep smallest id);
  *   3. MinHash+LSH candidates → exact Jaccard verification → drop
  *      near-duplicates (cluster representative = smallest id; a doc
  *      appearing as the greater id of any verified pair is dropped —
  *      the linear-pass approximation of connected components that
  *      curation pipelines use at scale);
  *   4. attach fingerprints, write curated parquet + one JSON stats
  *      line to stdout.
  *
  * Every stage is the library operator — this main is pure wiring.
  *
  * {{{
  * spark-submit --class graft.jobs.CurateCorpusJob <jar> \
  *   --in /root/testdata/sf0.01 --out /tmp/curated \
  *   [--min-quality 500] [--jaccard-permille 950]
  * }}}
  */
object CurateCorpusJob {

  final case class Stats(input: Long, lowQuality: Long, exactDups: Long,
                         nearDups: Long, kept: Long)

  /** Curation result + an explicit release path for the pipeline's
    * retained executor state (the exact-dedup cache, and in
    * exact-components mode the final connected-components checkpoint).
    * `curate` is a library function returning a lazy frame built over
    * that state — without this handle the caller could not release
    * what it doesn't know about. Call [[release]] once `docs` has been
    * consumed (counted/written): afterwards the frame recomputes from
    * lineage in the default mode, but is NOT re-evaluable in
    * exact-components mode (checkpoint lineage is truncated). */
  final class Curated(val docs: DataFrame, val stats: Stats,
                      caches: Seq[DataFrame], checkpointed: Seq[DataFrame]) {
    def release(): Unit = {
      caches.foreach(_.unpersist())
      checkpointed.foreach(graft.operators.Caching.releaseLocalCheckpoints)
    }
  }

  /** @param exactComponents when true, near-dup clusters are resolved
    *   by [[Dedup.connectedComponents]] (transitive closure — keep one
    *   representative per cluster); when false (default), the linear
    *   pass drops the greater id of each verified pair — cheaper (no
    *   iteration) but can keep two docs that are only transitively
    *   connected.
    * @param stripSpanTokens when > 0, a final exact-substring pass
    *   removes non-canonical cross-doc repeated spans of at least this
    *   many tokens from the kept docs' text
    *   ([[Dedup.stripRepeatedSpansText]]) — doc-level dedup first,
    *   then passage-level, the standard pipeline order. */
  def curate(spark: SparkSession, sfDir: String,
             minQuality: Long = 500, jaccardPermille: Int = 950,
             exactComponents: Boolean = false,
             stripSpanTokens: Int = 0): Curated = {
    val docs = Tables.documents(spark, sfDir)
    val nInput = docs.count()

    // 1. quality gate — narrow expression filter, no self-join
    val quality = TextAnalysis.withQualityScore(docs)
      .filter(col("quality_score") >= minQuality)
      .select(docs.columns.map(col): _*).cache()
    val nQuality = quality.count()

    // 2. exact dedup: keep each content hash's smallest doc_id.
    // exactDeduped feeds three downstream consumers (signatures, token
    // sets, the anti-join) plus a count — cache it so the scan +
    // quality gate + dedup join run once, not four times.
    val keepIds = Dedup.exact(quality).select(col("keep_id").as("doc_id"))
    val exactDeduped = quality.join(keepIds, "doc_id").cache()
    val nExact = exactDeduped.count()
    // everything downstream reads exactDeduped (now materialized) —
    // the quality cache has served its purpose
    quality.unpersist()

    // 3. near-dedup: LSH candidates, Jaccard-verified, drop the
    // greater id of each verified pair (cluster representative =
    // smallest id — the linear-pass approximation of connected
    // components that curation pipelines use at scale)
    val sig = Dedup.minhashSignature(Dedup.shingled(exactDeduped, k = 3))
    val candidates = Dedup.lshCandidatePairs(sig)
    val verified = Dedup.jaccardVerify(exactDeduped, candidates, jaccardPermille)
    val (losers, checkpointed) =
      if (exactComponents) {
        val components = Dedup.connectedComponents(verified)
        (components.filter(col("component") =!= col("doc_id")).select(col("doc_id")),
          Seq(components))
      } else
        (verified.select(col("doc_b").as("doc_id")).distinct(), Seq.empty[DataFrame])
    val curated = exactDeduped.join(losers, Seq("doc_id"), "left_anti")
    val nKept = curated.count()

    // 3.5 optional passage-level dedup on the survivors
    val deduped =
      if (stripSpanTokens > 0)
        Dedup.stripRepeatedSpansText(curated, stripSpanTokens)
          .drop("span_tokens_removed")
      else curated

    // 4. fingerprints attached to the curated set
    val out = deduped.join(
      TextAnalysis.fingerprint(deduped).select(col("doc_id"), col("fp")), "doc_id")
    new Curated(out, Stats(nInput, nInput - nQuality, nQuality - nExact, nExact - nKept, nKept),
      caches = Seq(exactDeduped), checkpointed = checkpointed)
  }

  def main(args: Array[String]): Unit = {
    val a = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val builder = SparkSession.builder()
      .appName("curate-corpus")
      .config("spark.sql.session.timeZone", "UTC")
    // default master only when launched outside spark-submit (which
    // sets spark.master as a system property)
    if (!new org.apache.spark.SparkConf().contains("spark.master"))
      builder.master("local[*]")
    val spark = builder.getOrCreate()
    val result = curate(spark, a("--in"),
      a.getOrElse("--min-quality", "500").toLong,
      a.getOrElse("--jaccard-permille", "950").toInt,
      a.getOrElse("--exact-components", "false").toBoolean,
      a.getOrElse("--strip-span-tokens", "0").toInt)
    result.docs.write.mode("overwrite").parquet(a("--out"))
    result.release()
    val stats = result.stats
    println(s"""{"input":${stats.input},"low_quality":${stats.lowQuality},""" +
      s""""exact_dups":${stats.exactDups},"near_dups":${stats.nearDups},"kept":${stats.kept}}""")
    spark.stop()
  }
}
