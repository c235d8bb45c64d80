package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Relational

/** Streaming PROFILE maintenance — continuous quantile/distribution
  * monitoring of a 100 TB ingest without ever rescanning it: each
  * micro-batch's [[Relational.histogramState]] partial lands in the
  * segmented state store under `seg=(run id, batch id)`
  * ([[Relational.appendState]]), so a foreachBatch retry overwrites
  * its own partition — exactly-once for the non-idempotent
  * count-sum state, the house rule. Readers call
  * [[Relational.readMergedState]] + [[Relational.histogramQuantiles]]
  * at any moment for quantiles over everything ingested so far; a
  * periodic [[Relational.compactStateStore]] keeps the store at
  * O(state), not O(state × batches).
  *
  * Scale per batch: one narrow bucket projection + a map-side-
  * combinable count per (key, bucket) — state size is bounded by
  * value range / bucketWidth per key, independent of row count. */
object ProfileStream {

  /** One micro-batch (usable directly as a nightly-batch entry
    * point): land `batch`'s partial histogram state. */
  def process(batch: DataFrame, runId: String, batchId: Long, dir: String,
              keys: Seq[Column], valueCol: Column, bucketWidth: Long): Unit =
    StateStream.process(batch, runId, batchId, dir)(
      Relational.histogramState(_, keys, valueCol, bucketWidth))

  /** Streaming entry: foreachBatch over an event stream. `runId` must
    * be stable across RESTARTS of the same logical run (same
    * checkpoint) and distinct between runs sharing `dir`. */
  def start(events: DataFrame, runId: String, dir: String, checkpoint: String,
            keys: Seq[Column], valueCol: Column, bucketWidth: Long,
            onBatch: Long => Unit = _ => ()): StreamingQuery =
    StateStream.start(events, runId, dir, checkpoint, onBatch)(
      Relational.histogramState(_, keys, valueCol, bucketWidth))
}
