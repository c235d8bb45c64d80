package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioning hygiene helpers.
  *
  * A single small parquet file arrives as ONE input partition, and
  * narrow chains + broadcast joins preserve that — so a CPU-heavy
  * stage (hashing, shingling, pairwise scoring) would run on one core
  * no matter how many the cluster has. `fanOut` inserts a round-robin
  * exchange only when the input has fewer partitions than the session's
  * parallelism; on a real multi-TB input (already hundreds of
  * partitions) it is a no-op, so operators can call it unconditionally.
  */
object Partitioning {
  def fanOut(df: DataFrame): DataFrame = {
    // Streaming frames: `df.rdd` throws AnalysisException, and micro-batch
    // parallelism already comes from the source (Kafka topic partitions,
    // maxFilesPerTrigger) — an unconditional repartition would add a
    // shuffle to EVERY micro-batch. Pass through unchanged so the dedup /
    // similarity operators compose with readStream inputs.
    if (df.isStreaming) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }

  /** Morton (Z-order) code of two NON-NEGATIVE integer keys: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. Built from
    * shift/mask/add only (no XOR — identical operator surface in
    * DuckDB), all-narrow codegen arithmetic. `bits` must cover the key
    * range (`require` guards the doc; values ≥ 2^bits would collide). */
  def mortonCode(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      (shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
       shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** Z-order layout clustering — the lakehouse data-skipping trick:
    * range-partition + sort the table by the interleaved key so each
    * output file covers a small RECTANGLE in (a, b) space, and
    * parquet min/max stats prune scans filtered on EITHER column (a
    * plain sort on `a` gives pruning on `a` only). Same
    * total-order-without-global-window shape as
    * [[Corpus.shuffleOrder]]: one range exchange, no Window. */
  def zorderBy(df: DataFrame, aCol: String, bCol: String, bits: Int = 20,
               partitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("zorder", mortonCode(col(aCol), col(bCol), bits))
    val n = if (partitions > 0) partitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    keyed.repartitionByRange(n, col("zorder"))
      .sortWithinPartitions(col("zorder"))
  }
}
