package graft

import org.apache.spark.sql.functions._

import graft.sources.{Files, Tables}
import graft.streaming.Windows

/** Streaming/batch duality on REAL data: the watermarked streaming
  * tumbling aggregation over the events parquet must produce exactly
  * the batch groupBy result — the property that lets one library
  * serve both the reference's streaming job and its backfill.
  */
class StreamBatchParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming tumbling window over events parquet equals the batch aggregate") {
    val raw = Tables.table(spark, sf, "events") // ts as nanos long
    // the streaming file source wants a directory of files
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = Files.parquetStream(spark, dir.toString, raw.schema)
      .withColumn("ts_evt", timestamp_seconds(floor(col("ts") / 1000000000L)).cast("timestamp"))
    val agg = Windows.tumbling(stream, "ts_evt", "event_type", "1 hour", "0 seconds")
    val q = agg.writeStream.outputMode("update").format("memory")
      .queryName("parity_out").start()
    q.processAllAvailable(); q.stop()
    val streaming = spark.table("parity_out")
      .select(col("win_start").cast("long"), col("event_type"), col("n"),
        round(col("sum_value"), 2))
      .as[(Long, String, Long, Double)].collect().toSet

    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp").cast("long").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .as[(Long, String, Long, Double)].collect().toSet

    assert(streaming === batch)
    assert(streaming.nonEmpty)
  }
}
