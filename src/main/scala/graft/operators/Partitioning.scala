package graft.operators

import org.apache.spark.sql.DataFrame

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
}
