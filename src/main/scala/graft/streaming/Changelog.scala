package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed changelog compaction with explicit state — the Spark-native
  * replacement for the reference's retract stream + REPLACE-INTO sink
  * (O11/O15): per key, keep the newest version and emit a row only
  * when the winner changes (an upsert changelog, dedup'd at the
  * source instead of at the database).
  *
  * State is one (version, payload-hash) pair per key, partitioned by
  * key across executors — at 100 TB of stream the state size is bound
  * by live keys, not events.
  */
object Changelog {

  final case class VersionedEvent(key: Long, version: Long, payload: String)
  final case class KeyState(version: Long, payload: String)

  /** flatMapGroupsWithState worker: emit the event iff it advances the
    * key's version (ties broken toward first-seen, matching
    * last-writer-wins upsert replay idempotence). */
  def compact(events: Dataset[VersionedEvent]): Dataset[VersionedEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[VersionedEvent], state: GroupState[KeyState]) =>
          val newest = it.reduceOption((a, b) => if (b.version > a.version) b else a)
          newest match {
            case Some(e) if !state.exists || e.version > state.get.version =>
              state.update(KeyState(e.version, e.payload))
              Iterator.single(e)
            case _ => Iterator.empty
          }
      }
  }

  /** Batch twin of [[compact]] for replay/backfill: one row per
    * (possibly composite) key, newest version wins (same semantics as
    * Relational.latestByKey). */
  def compactBatch(events: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame =
    graft.operators.Relational.latestByKey(events,
      keyCols.map(col), Seq(col(versionCol)))

  /** Single-key convenience form. */
  def compactBatch(events: DataFrame, keyCol: String, versionCol: String): DataFrame =
    compactBatch(events, Seq(keyCol), versionCol)
}
