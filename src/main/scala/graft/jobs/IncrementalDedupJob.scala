package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup
import graft.sinks.Sinks

/** Continuous ingestion with a PERSISTENT dedup index — the piece the
  * watermark-horizon forms cannot give: every micro-batch is deduped
  * against the ENTIRE corpus history (exact content hash + LSH near-
  * dup), not just the horizon, because the "state" is the parquet
  * [[Dedup.DedupIndex]], not executor memory.
  *
  *   batch k:  in-batch dedup (exact keep-min-id + LSH/Jaccard linear
  *             pass — new-vs-new) → [[Dedup.dedupeAgainstIndex]]
  *             against the stored index (new-vs-history) → survivors
  *             appended to the corpus, their hashes/signatures/token
  *             sets appended to the index.
  *
  * Consistency: survivors land via dynamic partition overwrite keyed
  * on (run id, micro-batch id) ([[Sinks.upsertPartitions]]) — a
  * foreachBatch RETRY overwrites its own partition instead of
  * double-appending, so the corpus output is exactly-once. The run id
  * disambiguates queries: batch ids restart at 0 per checkpoint, so
  * two ingestion runs sharing an output dir would otherwise overwrite
  * each other's partitions. Index appends are retried at-least-once,
  * which is harmless by construction: duplicate hash rows change no
  * anti-join result and duplicate signatures only re-propose the same
  * candidates.
  *
  * Scale: each batch pays shuffle ∝ batch + collision candidates; the
  * index is never rescanned as a whole except the hash anti-join
  * (hash-keyed, and at 100 TB that side is a bucketed/partitioned
  * table — the frames come from parquet either way).
  */
object IncrementalDedupJob {

  /** One micro-batch (also the nightly-batch entry point — same code
    * path both modes). Returns the surviving docs (already written). */
  def process(batch: DataFrame, runId: String, batchId: Long,
              indexDir: String, outDir: String,
              thresholdPermille: Int, k: Int,
              idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    // 1. in-batch exact dedup: keep each content hash's smallest id
    val keep = Dedup.exact(batch, textCol, idCol).select(col("keep_id").as(idCol))
    val exactDeduped = batch.join(keep, idCol).cache()
    // 2. in-batch near-dedup: linear pass drops the greater id of each
    // verified pair (cluster representative = smallest id)
    val sig = Dedup.minhashSignature(Dedup.shingled(exactDeduped, k), idCol = idCol)
    val losers = Dedup.jaccardVerify(exactDeduped,
        Dedup.lshCandidatePairs(sig, idCol = idCol), thresholdPermille, idCol, textCol)
      .select(col("doc_b").as(idCol)).distinct()
    val batchClean = exactDeduped.join(losers, Seq(idCol), "left_anti")
    // 3. history dedup against the persistent index (if one exists yet)
    val hasIndex = new java.io.File(s"$indexDir/meta").exists()
    val survivors = (if (hasIndex)
        Dedup.dedupeAgainstIndex(batchClean,
          Dedup.readIndex(spark, indexDir), thresholdPermille, textCol, idCol)
      else batchClean).cache()
    // 4. exactly-once corpus append: the batch owns its partition
    Sinks.upsertPartitions(
      survivors.withColumn("run_id", lit(runId)).withColumn("batch_id", lit(batchId)),
      outDir, Seq("run_id", "batch_id"))
    // 5. extend the index with the accepted docs
    val idx = Dedup.buildIndex(survivors, k, textCol, idCol)
    idx.hashes.write.mode("append").parquet(s"$indexDir/hashes")
    idx.signatures.write.mode("append").parquet(s"$indexDir/signatures")
    idx.tokenSets.write.mode("append").parquet(s"$indexDir/token_sets")
    if (!hasIndex) {
      import spark.implicits._
      Seq(k).toDF("k").coalesce(1).write.mode("overwrite").parquet(s"$indexDir/meta")
    }
    survivors.unpersist()
    exactDeduped.unpersist()
  }

  /** Streaming entry: foreachBatch over a document stream. `runId`
    * must be stable across RESTARTS of the same logical run (same
    * checkpoint) and distinct between different runs sharing `outDir`. */
  def start(docs: DataFrame, runId: String, indexDir: String, outDir: String,
            checkpoint: String,
            thresholdPermille: Int = 950, k: Int = 3): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        process(batch, runId, batchId, indexDir, outDir, thresholdPermille, k)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  def main(args: Array[String]): Unit = {
    val a = args.sliding(2, 2).collect { case Array(kk, v) => kk -> v }.toMap
    val builder = SparkSession.builder()
      .appName("incremental-dedup")
      .config("spark.sql.session.timeZone", "UTC")
    if (!new org.apache.spark.SparkConf().contains("spark.master"))
      builder.master("local[*]")
    val spark = builder.getOrCreate()
    val schema = spark.read.parquet(a("--in")).schema
    val docs = spark.readStream.schema(schema).parquet(a("--in"))
    val q = start(docs, a.getOrElse("--run-id", "run0"),
      a("--index"), a("--out"), a("--checkpoint"),
      a.getOrElse("--jaccard-permille", "950").toInt,
      a.getOrElse("--k", "3").toInt)
    q.awaitTermination()
  }
}
