package graft

import java.sql.{DriverManager, Timestamp}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sinks.JdbcUpsertSink
import graft.streaming.{CdcStreamJob, Changelog, Windows}

/** End-to-end streaming semantics: Canal JSON MemoryStream → enrich →
  * Derby upsert sink; watermarked windows; stateful changelog
  * compaction. This is the reference's whole-job shape (Main.java)
  * under test — something the reference itself never had.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private var esSeq: Long = 1700000000000L
  private def canal(id: Int, code: String, addr: Integer, op: String): String = {
    val addrJson = if (addr == null) "null" else "\"" + addr + "\""
    esSeq += 1 // binlog event times are monotonically increasing
    s"""{"data":[{"id":"$id","meeting_code":"$code","address_id":$addrJson,
       |"mstart_date":"2024-05-01 09:00:00","mend_date":"2024-05-01 10:00:00"}],
       |"database":"mrbs","es":$esSeq,"id":1,"isDdl":false,
       |"mysqlType":{},"old":null,"sql":"","sqlType":{},
       |"table":"t_meeting_info","ts":1,"type":"$op"}""".stripMargin.replace("\n", "")
  }

  private lazy val dim = Seq(
    (3, "Room A", 10, "Floor 1", "Shanghai"),
    (4, "Room B", 11, "Floor 2", "Beijing")
  ).toDF("meetingroom_id", "meetingroom_name", "location_id", "location_name", "city")

  test("cdc stream end-to-end: insert, update, delete land correctly in Derby") {
    val url = "jdbc:derby:memory:cdcdb;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      """CREATE TABLE meeting_result (
        |meeting_id INT PRIMARY KEY, meeting_code VARCHAR(64),
        |meetingroom_id INT, meetingroom_name VARCHAR(64),
        |location_name VARCHAR(64), city VARCHAR(64))""".stripMargin)

    val mem = MemoryStream[String]
    val enriched = CdcStreamJob.enriched(mem.toDF().withColumnRenamed("value", "value"), dim)
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val q = CdcStreamJob.start(enriched, ckpt,
      JdbcUpsertSink.writer(url, "meeting_result",
        keyCols = Seq("meeting_id"),
        valCols = Seq("meeting_code", "meetingroom_id", "meetingroom_name", "location_name", "city"),
        opCol = Some("op"), versionCol = Some("es")),
      trigger = Trigger.ProcessingTime("100 milliseconds"))

    def table(): Map[Int, (String, Any)] = {
      val rs = conn.createStatement().executeQuery(
        "SELECT meeting_id, meeting_code, city FROM meeting_result")
      val b = Map.newBuilder[Int, (String, Any)]
      while (rs.next()) b += rs.getInt(1) -> (rs.getString(2), rs.getString(3))
      b.result()
    }

    // batch 1: two inserts (one with a dim match, one dangling FK)
    mem.addData(canal(1, "mc-1", 3, "INSERT"), canal(2, "mc-2", 99, "INSERT"))
    q.processAllAvailable()
    assert(table() === Map(1 -> ("mc-1", "Shanghai"), 2 -> ("mc-2", null)))

    // batch 2: update meeting 1 to room 4 + insert-then-update same key in one batch
    mem.addData(canal(1, "mc-1b", 4, "UPDATE"), canal(3, "mc-3", 3, "INSERT"),
      canal(3, "mc-3b", 4, "UPDATE"))
    q.processAllAvailable()
    assert(table() === Map(1 -> ("mc-1b", "Beijing"), 2 -> ("mc-2", null),
      3 -> ("mc-3b", "Beijing")))

    // batch 3: delete meeting 2 (the reference dropped DELETEs entirely)
    mem.addData(canal(2, "mc-2", 99, "DELETE"))
    q.processAllAvailable()
    assert(table() === Map(1 -> ("mc-1b", "Beijing"), 3 -> ("mc-3b", "Beijing")))

    q.stop()
    conn.close()
  }

  test("tumbling window with watermark aggregates by event time") {
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val out = Windows.tumbling(df, "ts", "event_type", "1 hour", "10 minutes")
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("tumbling_out").start()
    mem.addData(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 11:05:00"), "click", 4.0))
    q.processAllAvailable()
    val rows = spark.table("tumbling_out")
      .select("win_start", "n", "sum_value").as[(Timestamp, Long, Double)]
      .collect().toSet
    assert(rows === Set(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 2L, 3.0),
      (Timestamp.valueOf("2024-01-01 11:00:00"), 1L, 4.0)))
    q.stop()
  }

  test("session windows split on gap") {
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val out = Windows.sessions(df, "ts", "user_id", "30 minutes", "1 minute")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sessions_out").start()
    mem.addData(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 7L),
      (Timestamp.valueOf("2024-01-01 10:10:00"), 7L),
      (Timestamp.valueOf("2024-01-01 12:00:00"), 7L))
    q.processAllAvailable()
    // advance the watermark far enough to close all three
    mem.addData((Timestamp.valueOf("2024-01-02 00:00:00"), 8L))
    q.processAllAvailable()
    val sess = spark.table("sessions_out")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSet
    assert(sess === Set((7L, 2L), (7L, 1L)))
    q.stop()
  }

  test("changelog compaction emits only version advances") {
    val mem = MemoryStream[Changelog.VersionedEvent]
    val q = Changelog.compact(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName("compact_out").start()
    mem.addData(
      Changelog.VersionedEvent(1, 10, "a"),
      Changelog.VersionedEvent(1, 12, "b"),
      Changelog.VersionedEvent(2, 5, "x"))
    q.processAllAvailable()
    mem.addData(
      Changelog.VersionedEvent(1, 11, "stale"), // below state version: dropped
      Changelog.VersionedEvent(2, 6, "y"))
    q.processAllAvailable()
    val out = spark.table("compact_out").as[Changelog.VersionedEvent]
      .collect().map(e => (e.key, e.version, e.payload)).toSet
    assert(out === Set((1L, 12L, "b"), (2L, 5L, "x"), (2L, 6L, "y")))
    q.stop()
  }
}
