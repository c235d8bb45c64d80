package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation and sessionization for streams —
  * the watermark-bounded ops the reference declared EventTime for but
  * never used (Main.java:50, SURVEY.md §2.1).
  *
  * State posture at scale: watermarks bound every state store; the
  * grouping key includes the window, so state partitions by
  * (key, window) and expires as the watermark passes — no unbounded
  * keyed state, no TTL knobs.
  */
object Windows {

  /** Tumbling event-time counts/sums per key with late-data bound
    * `maxLateness`. Works identically on batch DataFrames (watermark
    * is a no-op there) — the batch twin is `rel_window_tumbling`. */
  def tumbling(events: DataFrame, tsCol: String, keyCol: String,
               windowLen: String, maxLateness: String): DataFrame =
    events
      .withWatermark(tsCol, maxLateness)
      .groupBy(window(col(tsCol), windowLen).as("win"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("win_start"), col(keyCol), col("n"), col("sum_value"))

  /** Gap-based session windows per user via the native
    * `session_window` (dynamic-gap state handled by Spark's session
    * store; batch twin is Relational.sessionize). */
  def sessions(events: DataFrame, tsCol: String, userCol: String,
               gap: String, maxLateness: String): DataFrame =
    events
      .withWatermark(tsCol, maxLateness)
      .groupBy(session_window(col(tsCol), gap).as("win"), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("win.start").as("sess_start"),
        col("win.end").as("sess_end"), col("n_events"))

  /** Stream–stream inner join: both sides watermarked, right rows
    * match left rows with the same key within `[leftTs - within,
    * leftTs]`. The time bound + watermarks let Spark expire join state
    * on both sides — the genuinely stateful join the reference's gap
    * map calls out for CDC'd dimensions (SURVEY.md §7.4). */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTs: String, rightTs: String,
                       within: String, maxLateness: String): DataFrame =
    left.withWatermark(leftTs, maxLateness)
      .join(right.withWatermark(rightTs, maxLateness),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $within") &&
          col(rightTs) <= col(leftTs),
        "inner")

  /** Stream–stream LEFT OUTER join: like [[streamStreamJoin]], but
    * left rows with no match emit null-extended once the watermark
    * passes their join window (Spark holds them in state exactly that
    * long — the bound that makes outer stream joins feasible at
    * scale). */
  def streamStreamLeftJoin(left: DataFrame, right: DataFrame,
                           leftKey: String, rightKey: String,
                           leftTs: String, rightTs: String,
                           within: String, maxLateness: String): DataFrame =
    left.withWatermark(leftTs, maxLateness)
      .join(right.withWatermark(rightTs, maxLateness),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $within") &&
          col(rightTs) <= col(leftTs),
        "left_outer")

  /** Stream–stream FULL OUTER join — completes the join matrix
    * (inner/left above): unmatched rows from EITHER side emit
    * null-extended once the watermark passes their join window. Both
    * sides' state is bounded by the time condition + watermark, same
    * as the one-sided forms — the property that makes outer stream
    * joins feasible at scale. */
  def streamStreamFullJoin(left: DataFrame, right: DataFrame,
                           leftKey: String, rightKey: String,
                           leftTs: String, rightTs: String,
                           within: String, maxLateness: String): DataFrame =
    left.withWatermark(leftTs, maxLateness)
      .join(right.withWatermark(rightTs, maxLateness),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $within") &&
          col(rightTs) <= col(leftTs),
        "full_outer")

  /** Sliding-window rates (the dashboard "last N minutes" view). */
  def sliding(events: DataFrame, tsCol: String, keyCol: String,
              windowLen: String, slide: String, maxLateness: String): DataFrame =
    events
      .withWatermark(tsCol, maxLateness)
      .groupBy(window(col(tsCol), windowLen, slide).as("win"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col(keyCol), col("n"))
}
