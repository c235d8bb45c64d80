package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness parquet tables (TESTDATA.md) and the session
  * normalization every graft job needs.
  *
  * Scale posture: every loader is a plain parquet scan, so Catalyst's
  * predicate pushdown / column pruning reach the scan (`PushedFilters`,
  * `ReadSchema` in `.explain("formatted")`). Nothing here assumes a
  * single file — at cluster scale the same code reads a partitioned
  * directory tree.
  */
object Tables {

  /** Runtime session normalization.
    *
    * - `events.ts` is INT64 TIMESTAMP(NANOS), which Spark's parquet
    *   reader rejects by default; `nanosAsLong` (SPARK-40819) reads it
    *   as nanos-since-epoch LongType. It is a runtime-settable SQLConf,
    *   so this works on any session the driver hands us.
    * - timezone pinned to UTC so TIMESTAMP↔TIMESTAMP_NTZ casts are
    *   wall-clock-identical (oracle parity with DuckDB's naive
    *   timestamps).
    */
  def normalize(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalize(spark).read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Floor-division of long epoch nanos to epoch seconds in EXACT
    * integer arithmetic. `floor(ts / 1e9)` would route through double
    * division, and epoch nanos (~1.7e18) exceed 2^53 — the operand
    * rounds by up to ~256 ns, so a timestamp within that distance of a
    * second boundary could truncate to the wrong second. Subtracting
    * `pmod` first makes the dividend an exact multiple of 1e9 (and
    * floors toward -inf for negative ts, matching floor-division);
    * multiples of 1e9 are divisible by 2^9, hence exactly
    * representable as doubles up to 2^61 (epoch nanos through year
    * 2042), and the quotient (~1.7e9) is far below 2^53, so the
    * division is correctly rounded to the exact integer. */
  private def nanosToSec(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ((ts - pmod(ts, lit(1000000000L))) / lit(1000000000L)).cast("long")

  /** Second-truncated TIMESTAMP from a raw `ts` of either physical
    * encoding (LongType nanos under `nanosAsLong`, or a timestamp
    * column) — the shared shim for code reading the events parquet
    * directly, e.g. through a streaming file source. */
  def secondTimestamp(ts: org.apache.spark.sql.Column,
                      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column =
    dt match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_seconds(nanosToSec(ts))
      case _ => timestamp_seconds(unix_seconds(ts.cast("timestamp")))
    }

  /** `events` with the raw clock kept as `ts_ns` (long nanos) plus two
    * derived columns every operator downstream uses:
    *   - `ts_sec` — integer epoch seconds (stable across engines; used
    *     for arithmetic like session gaps),
    *   - `ts` — second-truncated TIMESTAMP_NTZ (the precision that is
    *     bit-stable between Spark and DuckDB regardless of the file's
    *     unit).
    *
    * The loader accepts BOTH physical encodings the harness has
    * shipped: INT64 TIMESTAMP(NANOS) (read as LongType nanos under
    * `nanosAsLong`) and plain TIMESTAMP micros (read as
    * TIMESTAMP/TIMESTAMP_NTZ — with the session pinned to UTC the
    * NTZ→LTZ cast is wall-clock exact). The micros path derives
    * `ts_sec` with `unix_seconds`, the nanos path with exact integer
    * floor-division — no float anywhere in the epoch math. Ends with
    * an explicit select so BOTH encodings yield the same column order
    * (raw columns minus `ts`, then `ts_ns`, `ts_sec`, `ts`). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    val withNs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_sec", nanosToSec(col("ts_ns")))
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts").cast("timestamp")) * 1000L)
          .withColumn("ts_sec", unix_seconds(col("ts").cast("timestamp")))
          .drop("ts")
    }
    val canonical = raw.columns.filterNot(_ == "ts") ++ Seq("ts_ns", "ts_sec", "ts")
    withNs
      .withColumn("ts", timestamp_seconds(col("ts_sec")).cast("timestamp_ntz"))
      .select(canonical.map(col).toIndexedSeq: _*)
  }
}
