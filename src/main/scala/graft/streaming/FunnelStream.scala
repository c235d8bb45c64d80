package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel — the continuous twin of
  * [[graft.operators.Relational.funnel]]: per user, track the furthest
  * step reached with strictly-increasing event times and emit a row
  * the moment a user ADVANCES a stage (the live conversion feed a
  * dashboard consumes; the batch operator is the end-of-day audit).
  *
  * Semantics match the batch funnel on in-order input: a stage-k
  * advance requires an event of step k strictly after the user's
  * stage-(k−1) time. State is ONE (stage, lastTs) pair per user —
  * bounded by users, never events — and expires via event-time
  * timeout once the watermark passes the user's last activity plus
  * `ttlMs` (a user idle past the TTL restarts from stage 0: the
  * documented trade for bounded state on an unbounded user
  * population).
  */
object FunnelStream {

  final case class FunnelEvent(user: Long, step: String, ts: java.sql.Timestamp)
  final case class FunnelState(stage: Int, lastTsMs: Long, maxTsMs: Long)
  final case class StageAdvance(user: Long, stage: Int, step: String,
                                ts: java.sql.Timestamp)

  /** @param steps ordered funnel steps (size ≥ 2)
    * @param watermarkDelay max disorder tolerated within a batch's
    *   event-time window (also gates state expiry)
    * @param ttlMs state lifetime past the user's last activity */
  def stageAdvances(events: Dataset[FunnelEvent], steps: Seq[String],
                    watermarkDelay: String, ttlMs: Long): Dataset[StageAdvance] = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = if (state.exists) state.get else FunnelState(0, Long.MinValue, Long.MinValue)
            val out = Seq.newBuilder[StageAdvance]
            // within-batch disorder is resolved by event time; ties on
            // the same millisecond keep arrival order (stable sort)
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val ms = e.ts.getTime
              st = st.copy(maxTsMs = math.max(st.maxTsMs, ms))
              if (st.stage < steps.size &&
                  stepIdx.get(e.step).contains(st.stage) &&
                  (st.stage == 0 || ms > st.lastTsMs)) {
                st = st.copy(stage = st.stage + 1, lastTsMs = ms)
                out += StageAdvance(user, st.stage, e.step, e.ts)
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(st.maxTsMs + ttlMs)
            out.result().iterator
          }
      }
  }

  /** Untyped convenience wrapper: (user_id, event_type, ts) columns in,
    * stage-advance rows out. */
  def stageAdvancesDF(events: DataFrame, steps: Seq[String],
                      watermarkDelay: String, ttlMs: Long): DataFrame = {
    import events.sparkSession.implicits._
    stageAdvances(
      events.select(col("user_id").as("user"), col("event_type").as("step"),
        col("ts")).as[FunnelEvent],
      steps, watermarkDelay, ttlMs).toDF()
  }
}
