package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity
import graft.sinks.Sinks

/** Streaming topic-drift monitor: per micro-batch, incoming
  * embeddings are assigned to a FROZEN k-means quantizer's cells
  * (the same integer-exact model [[Similarity.ivfTrain]] emits and
  * `corpus_topic_mix` audits) and the per-cell histogram is persisted
  * exactly-once — the ingest-side data-drift alarm: when a batch's
  * cell mix shifts against the training-time mix, the corpus IS
  * changing before any downstream model sees it.
  *
  * READ-ONLY side-car over the centroid parquet ([[AnnProbeStream]]
  * architecture): retraining owns the model directory; a new model
  * lands in monitoring at the next micro-batch, no restart.
  *
  * Exactly-once: histograms land via dynamic partition overwrite
  * keyed on (run id, micro-batch id) ([[Sinks.upsertPartitions]]) —
  * a foreachBatch retry overwrites its own partition, and assignment
  * is stateless across batches, so a replayed batch recomputes an
  * identical histogram.
  *
  * Scale: assignment is a broadcast of the (k×dims, driver-small by
  * construction) centroid table against the never-shuffled batch
  * scan; the histogram is one map-side-combinable groupBy at cell
  * grain (≤ k rows out per batch).
  */
object TopicDriftStream {

  /** One micro-batch (usable directly as a batch entry point):
    * assign `batch` under the centroids at `centroidsDir`, write the
    * (cell, cnt, permille) histogram exactly-once, return the batch
    * row count for monitoring. */
  def process(batch: DataFrame, runId: String, batchId: Long,
              centroidsDir: String, outDir: String,
              idCol: String = "vec_id", vecCol: String = "embedding"): Long = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return 0L
    val cents = spark.read.parquet(centroidsDir)
    val asg = Similarity.ivfAssign(batch, cents, idCol, vecCol)
    val total = asg.count()
    val hist = asg.groupBy(col("cell"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("permille", floor(col("cnt") * 1000 / lit(total)).cast("long"))
      .withColumn("run_id", lit(runId))
      .withColumn("batch_id", lit(batchId))
    Sinks.upsertPartitions(hist, outDir, Seq("run_id", "batch_id"))
    total
  }

  /** Streaming entry: foreachBatch over an embedding stream. `runId`
    * must be stable across RESTARTS of the same logical run (same
    * checkpoint) and distinct between runs sharing `outDir`. */
  def start(vectors: DataFrame, runId: String, centroidsDir: String,
            outDir: String, checkpoint: String,
            idCol: String = "vec_id", vecCol: String = "embedding",
            onStats: (Long, Long) => Unit = (_, _) => ()): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onStats(batchId, process(batch, runId, batchId, centroidsDir, outDir,
          idCol, vecCol))
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
