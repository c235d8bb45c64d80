package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.codec.CanalCodec

/** The reference's whole job (Main.java:43–151) as one Structured
  * Streaming pipeline: Kafka Canal feed → envelope decode → change
  * selection → typed projection → broadcast dimension enrich →
  * foreachBatch upsert sink.
  *
  * Differences from the reference, by design (SURVEY.md §7):
  *  - UPDATE/DELETE are first-class (op column drives the sink's
  *    upsert/delete), not INSERT-only;
  *  - the dimension is re-read per micro-batch (stream–static joins
  *    re-plan the static side), fixing the reference's snapshot-once
  *    staleness (CreateJDBCInputFormat.java:8–10);
  *  - no join state, no TTL: the static side broadcasts, so 100 TB of
  *    stream never shuffles (the reference needed 1–2 day idle-state
  *    TTL to survive);
  *  - exactly-once to the sink via idempotent keyed upsert +
  *    checkpointed offsets (the reference's plain INSERT into
  *    Greenplum was at-least-once despite EXACTLY_ONCE checkpoints).
  */
object CdcStreamJob {

  /** Kafka source (reference O1, KafkaConfigUtil.java). Standard
    * wiring, but fail-fast when the spark-sql-kafka connector jar is
    * absent (as it is in this build environment — the tested ingestion
    * contract is the file-drop/MemoryStream path; see
    * [[graft.sources.KafkaSupport]]). */
  def fromKafka(spark: SparkSession, brokers: String, topic: String,
                startingOffsets: String = "latest"): DataFrame = {
    graft.sources.KafkaSupport.requireConnector("CdcStreamJob.fromKafka")
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("value").cast("string").as("value"))
  }

  /** Raw Canal JSON stream → enriched meeting rows. `dim` is a *batch*
    * DataFrame (JDBC/parquet snapshot) — the static side of the
    * stream–static left join, broadcast per micro-batch. */
  def enriched(raw: DataFrame, dim: DataFrame,
               ops: Set[String] = Set("INSERT", "UPDATE", "DELETE")): DataFrame = {
    val events = CanalCodec.meetingPipeline(raw, ops = ops)
    events.join(broadcast(dim), events("address_id") === dim("meetingroom_id"), "left")
      .select(events("meeting_id"), events("meeting_code"),
        dim("meetingroom_id"), dim("meetingroom_name"),
        dim("location_name"), dim("city"), events("op"), events("es"))
  }

  /** Wire the pipeline to a per-batch writer (e.g.
    * [[graft.sinks.JdbcUpsertSink]]). Checkpointed, micro-batch
    * triggered — the Spark analog of the reference's 1 s
    * checkpointing (Main.java:49). */
  def start(enriched: DataFrame, checkpointDir: String,
            writer: (DataFrame, Long) => Unit,
            trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    enriched.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(writer)
      .start()
}
