package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Executor-storage hygiene for driver-looped algorithms.
  *
  * `Dataset.localCheckpoint` persists its result as an RDD in executor
  * storage and truncates lineage — mandatory for iterative DataFrame
  * loops (the stacked lazy plans otherwise OOM the planner), but the
  * blocks are NOT tracked by the SQL cache manager, so
  * `Dataset.unpersist` cannot release them. At 100 TB every retained
  * round is a full data copy in executor memory/disk; iterative
  * operators must drop round k-1's blocks as soon as round k is
  * materialized (as GraphFrames' connected components does).
  */
object Caching {

  /** Unpersist the executor blocks behind every locally-checkpointed
    * scan in `df`'s plan. After release the frame can NO LONGER be
    * evaluated (checkpoint lineage is truncated by design) — call only
    * once the frame's consumers are done. */
  def releaseLocalCheckpoints(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
