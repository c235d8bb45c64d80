package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity
import graft.sinks.Sinks

/** Streaming ANN serving against the STORED IVFPQ index — the
  * [[IndexProbeDedup]] architecture applied to similarity search:
  * a stream of query vectors is answered per micro-batch by
  * multi-probe ADC over the persisted
  * [[graft.operators.Similarity.AnnIndex]]
  * ([[graft.operators.Similarity.ivfPqTopKIndexedProbes]]), so
  * real-time retrieval (semantic search over a fixed corpus snapshot,
  * online near-dup screening of incoming embeddings, retrieval
  * augmentation) runs with the BATCH serving semantics exactly — one
  * code path, spec-proven parity.
  *
  * READ-ONLY side-car, like the dedup probe: the index is never
  * extended here (ingestion owns that via
  * [[graft.operators.Similarity.annIndexAppend]] and nightly
  * [[graft.operators.Similarity.compactAnnIndex]] — results reflect
  * each batch's current on-disk snapshot, so an append lands in
  * serving at the next micro-batch, no restart).
  *
  * Exactly-once: hit lists land via dynamic partition overwrite keyed
  * on (run id, micro-batch id) ([[Sinks.upsertPartitions]]); a
  * foreachBatch retry overwrites its own partition rather than
  * double-appending, and the probe is stateless across batches (the
  * "state" IS the parquet index), so a replayed batch recomputes
  * identical hits.
  *
  * Scale: per batch, cost is the query-side broadcasts (probe set =
  * batch×nprobe rows, ADC tables batch×m×pqK×nprobe) + one
  * (cell, code) equi-join against the code table — queries never
  * touch corpus embeddings. Re-opening the index per batch is a
  * parquet metadata open over lazy frames.
  */
object AnnProbeStream {

  /** One micro-batch (usable directly as a batch entry point): serve
    * top-k for `batch` from the index at `indexDir`, write the hit
    * list exactly-once, return the hit-row count for monitoring. */
  def process(batch: DataFrame, runId: String, batchId: Long,
              indexDir: String, outDir: String, k: Int, nprobe: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): Long = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return 0L
    val index = Similarity.readAnnIndex(spark, indexDir)
    val hits = Similarity
      .ivfPqTopKIndexedProbes(batch, index, k, nprobe, idCol, vecCol)
      .withColumn("run_id", lit(runId))
      .withColumn("batch_id", lit(batchId))
    Sinks.upsertPartitions(hits, outDir, Seq("run_id", "batch_id"))
    spark.read.parquet(outDir)
      .filter(col("run_id") === runId && col("batch_id") === batchId)
      .count()
  }

  /** Streaming entry: foreachBatch over a query-vector stream. `runId`
    * must be stable across RESTARTS of the same logical run (same
    * checkpoint) and distinct between runs sharing `outDir`. */
  def start(queries: DataFrame, runId: String, indexDir: String, outDir: String,
            checkpoint: String, k: Int = 5, nprobe: Int = 2,
            idCol: String = "vec_id", vecCol: String = "embedding",
            onStats: (Long, Long) => Unit = (_, _) => ()): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onStats(batchId, process(batch, runId, batchId, indexDir, outDir,
          k, nprobe, idCol, vecCol))
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
