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

  /** `events` with the raw nano clock kept as `ts_ns` (long) plus two
    * derived columns every operator downstream uses:
    *   - `ts_sec` — integer epoch seconds (stable across engines; used
    *     for arithmetic like session gaps),
    *   - `ts` — second-truncated TIMESTAMP_NTZ (the precision that is
    *     bit-stable between Spark's micros and DuckDB's nanos).
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_sec", floor(col("ts_ns") / 1000000000L).cast("long"))
      .withColumn("ts", timestamp_seconds(col("ts_sec")).cast("timestamp_ntz"))
}
