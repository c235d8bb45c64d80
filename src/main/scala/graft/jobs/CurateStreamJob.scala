package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Dedup, TextAnalysis}

/** Continuous-ingestion twin of [[CurateCorpusJob]]: curate documents
  * as they arrive instead of nightly.
  *
  *   raw doc stream (doc_id, text, …, event-time ts)
  *     → quality gate (narrow expression filter — same code path as
  *       the batch job, zero divergence risk)
  *     → exact dedup within the watermark horizon
  *       (`dropDuplicatesWithinWatermark` on the content hash — state
  *       bounded by the horizon, not corpus history; the nightly batch
  *       run catches cross-horizon duplicates)
  *     → fingerprint attach (narrow)
  *     → parquet append sink, exactly-once via checkpointed offsets +
  *       idempotent file commits.
  *
  * Near-dedup WITHIN the watermark horizon runs in-stream (optional
  * second output, [[nearDupPairs]] — an LSH band-keyed stream–stream
  * self-join with bounded state); corpus-wide near-dedup stays
  * batch-only (a corpus-wide candidate join has no bounded-state
  * streaming form — the standard lambda split for curation pipelines,
  * with the nightly batch run catching cross-horizon duplicates).
  *
  * {{{
  * spark-submit --class graft.jobs.CurateStreamJob <jar> \
  *   --in <dir of document parquet drops> --out <dir> \
  *   --checkpoint <dir> [--min-quality 500] [--watermark "1 hour"]
  * }}}
  */
object CurateStreamJob {

  /** The curation transform — pure function of the input stream, unit
    * testable with MemoryStream. */
  def curated(docs: DataFrame, tsCol: String, watermark: String,
              minQuality: Long): DataFrame = {
    val inputCols = docs.columns
    val gated = TextAnalysis.withQualityScore(docs)
      .filter(col("quality_score") >= minQuality)
      .select(inputCols.map(col): _*)
    val deduped = Dedup.exactStreaming(gated, tsCol, watermark)
    TextAnalysis.withFingerprint(deduped)
  }

  /** Optional in-horizon near-dedup stage: verified near-duplicate
    * pairs among quality-gated docs whose event times are within
    * `within` of each other. Run as a SECOND streaming output (a
    * quarantine/monitoring sink) — dropping the later doc of each pair
    * in-stream would need a third stateful join, so the drop decision
    * stays with the consumer (or the nightly batch job). Same quality
    * gate as [[curated]] — pairs are computed over the docs that
    * actually enter the corpus. */
  def nearDupPairs(docs: DataFrame, tsCol: String, within: String,
                   watermark: String, minQuality: Long,
                   jaccardPermille: Int = 950): DataFrame = {
    val inputCols = docs.columns
    val gated = TextAnalysis.withQualityScore(docs)
      .filter(col("quality_score") >= minQuality)
      .select(inputCols.map(col): _*)
    Dedup.nearDupPairsStreaming(gated, tsCol, within, watermark, jaccardPermille)
  }

  def start(curated: DataFrame, outDir: String, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    curated.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  def main(args: Array[String]): Unit = {
    val a = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val builder = SparkSession.builder()
      .appName("curate-stream")
      .config("spark.sql.session.timeZone", "UTC")
    if (!new org.apache.spark.SparkConf().contains("spark.master"))
      builder.master("local[*]")
    val spark = builder.getOrCreate()
    // schema must be declared for a streaming parquet source
    val schema = spark.read.parquet(a("--in")).schema
    val docs = spark.readStream.schema(schema).parquet(a("--in"))
      .withColumn("ts", current_timestamp()) // ingest time when drops carry no event time
    val q = start(
      curated(docs, "ts", a.getOrElse("--watermark", "1 hour"),
        a.getOrElse("--min-quality", "500").toLong),
      a("--out"), a("--checkpoint"))
    q.awaitTermination()
  }
}
