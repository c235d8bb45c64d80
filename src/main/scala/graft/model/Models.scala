package graft.model

import org.apache.spark.sql.types._

/** Typed record shapes of the CDC-ETL pipeline.
  *
  * Mirrors the reference's data model (SURVEY.md §1): a Canal binlog
  * envelope (reference BinLogBean.java:14–27), the projected meeting
  * change event (reference JsonFilter.java:47–54), and the enriched
  * result row (reference Meeting.java:12–19) — re-expressed as Spark
  * case classes + an explicit StructType (never inferred: field order
  * and types must be stable on a CDC stream).
  */
object CanalSchema {
  /** Canal flat-JSON envelope. `data` / `old` are arrays of
    * column-name→string-value maps (Canal serializes every MySQL value
    * as a JSON string, SQL NULL as JSON null — which `from_json` maps
    * to a real null, not the `"null"` string the reference's
    * StringBuilder produced, reference JsonFilter.java:39).
    */
  val envelope: StructType = StructType(Seq(
    StructField("data", ArrayType(MapType(StringType, StringType), containsNull = true)),
    StructField("database", StringType),
    StructField("es", LongType),        // binlog event epoch-millis
    StructField("id", LongType),
    StructField("isDdl", BooleanType),
    StructField("mysqlType", MapType(StringType, StringType)),
    StructField("old", ArrayType(MapType(StringType, StringType), containsNull = true)),
    StructField("sql", StringType),
    StructField("sqlType", MapType(StringType, IntegerType)),
    StructField("table", StringType),
    StructField("ts", LongType),        // delivery epoch-millis
    StructField("type", StringType)     // INSERT | UPDATE | DELETE | ...
  ))
}

/** Projected change event — the reference's Tuple5 plus the CDC
  * operation and event time the reference dropped (needed for
  * UPDATE/DELETE upsert semantics, reference README requires
  * INSERT+UPDATE but code hard-codes INSERT only).
  */
final case class MeetingEvent(
    meeting_id: Int,
    meeting_code: String,
    address_id: Option[Int],
    mstart_date: Option[java.sql.Timestamp],
    mend_date: Option[java.sql.Timestamp],
    op: String,
    es: Long)

/** Room/location dimension row (reference's pre-joined 3-table dim,
  * CreateJDBCInputFormat.java:28–31). */
final case class MeetingRoom(
    meetingroom_id: Int,
    meetingroom_name: String,
    location_id: Option[Int],
    location_name: Option[String],
    city: Option[String])

/** Enriched result row (reference Meeting.java:12–19). */
final case class Meeting(
    meeting_id: Int,
    meeting_code: String,
    meetingroom_id: Option[Int],
    meetingroom_name: Option[String],
    location_name: Option[String],
    city: Option[String])
