package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup
import graft.sinks.Sinks

/** Streaming near-dedup against the PERSISTENT signature index — the
  * composition that closes the lambda split the watermark forms leave
  * open: [[graft.operators.Dedup.exactStreaming]] /
  * [[graft.operators.Dedup.nearDupPairsStreaming]] catch duplicates
  * WITHIN the watermark horizon with bounded executor state, and this
  * operator catches duplicates of the ENTIRE indexed corpus history by
  * LSH-probing the stored [[graft.operators.Dedup.DedupIndex]] once
  * per micro-batch (the batch [[graft.operators.Dedup.dedupeAgainstIndex]]
  * shape inside `foreachBatch` — exact hash anti-join, cross-corpus
  * band candidates, Jaccard verification).
  *
  * Unlike [[graft.jobs.IncrementalDedupJob]] this is a READ-ONLY
  * probe: the index is never extended, so it runs as a detection
  * side-car (shadow-mode evaluation, duplicate-rate monitoring, or
  * filtering a stream whose ingestion is owned elsewhere). Each doc
  * gets a verdict — `unique`, `dup_exact_index` (content hash already
  * indexed) or `dup_near_index` (band collision verified ≥ threshold).
  *
  * Exactly-once: verdicts land via dynamic partition overwrite keyed
  * on (run id, micro-batch id) ([[Sinks.upsertPartitions]]) — a
  * foreachBatch RETRY after a crash overwrites its own partition
  * instead of double-appending, and the streaming checkpoint commits
  * the batch only after the write returns. The probe itself is
  * stateless across batches (the "state" is the parquet index), so a
  * replayed batch recomputes identical verdicts.
  *
  * Scale: per batch, shuffle ∝ batch + collision candidates. The
  * index hash side stays unshuffled through the same Bloom prune the
  * batch path uses; signatures meet the delta only on band-bucket
  * keys. Re-reading the index per batch is a metadata open — the
  * frames are lazy over parquet, and a nightly
  * [[graft.operators.Dedup.compactIndex]] keeps the file count flat.
  */
object IndexProbeDedup {

  /** One micro-batch (usable directly as the nightly-batch entry
    * point): write per-doc verdicts for `batch` against the index at
    * `indexDir`, returning the verdict counts for monitoring.
    * `weighted = true` verifies candidates with the repetition-aware
    * multiset-Jaccard measure against the index's stored bags
    * ([[Dedup.dedupeAgainstIndexWeighted]]) instead of set Jaccard. */
  def process(batch: DataFrame, runId: String, batchId: Long,
              indexDir: String, outDir: String, thresholdPermille: Int,
              idCol: String = "doc_id", textCol: String = "text",
              weighted: Boolean = false): Map[String, Long] = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return Map.empty
    val index = Dedup.readIndex(spark, indexDir)
    // exact verdicts from the hash set; near verdicts = dropped by the
    // full probe but not exact — one shared dedupeAgainstIndex pass
    // owns candidate generation and verification (shingle size comes
    // from the stored index.k, never a parameter)
    val exact = batch
      .withColumn("__h", md5(col(textCol).cast("binary")))
      .join(index.hashes, Seq("__h"), "left_semi")
      .select(col(idCol)).withColumn("__v", lit("dup_exact_index"))
    val survivors =
      if (weighted) Dedup.dedupeAgainstIndexWeighted(batch, index,
        thresholdPermille, textCol, idCol)
      else Dedup.dedupeAgainstIndex(batch, index, thresholdPermille,
        textCol, idCol)
    val unique = survivors
      .select(col(idCol)).withColumn("__v", lit("unique"))
    val verdicts = batch.select(col(idCol))
      .join(exact.unionByName(unique), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__v"), lit("dup_near_index")).as("verdict"))
    Sinks.upsertPartitions(
      verdicts.withColumn("run_id", lit(runId)).withColumn("batch_id", lit(batchId)),
      outDir, Seq("run_id", "batch_id"))
    spark.read.parquet(outDir)
      .filter(col("run_id") === runId && col("batch_id") === batchId)
      .groupBy(col("verdict")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Streaming entry: foreachBatch over a document stream. `runId`
    * must be stable across RESTARTS of the same logical run (same
    * checkpoint) and distinct between runs sharing `outDir`. */
  def start(docs: DataFrame, runId: String, indexDir: String, outDir: String,
            checkpoint: String, thresholdPermille: Int = 900,
            idCol: String = "doc_id", textCol: String = "text",
            weighted: Boolean = false,
            onStats: (Long, Map[String, Long]) => Unit = (_, _) => ()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onStats(batchId, process(batch, runId, batchId, indexDir, outDir,
          thresholdPermille, idCol, textCol, weighted))
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
