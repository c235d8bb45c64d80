package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational building blocks used by the query surface.
  *
  * Everything is declarative DataFrame composition — Catalyst plans the
  * physical side (broadcast vs shuffle join, partial aggregation,
  * whole-stage codegen). Helpers only encode the *shape* decisions that
  * matter at 100 TB: broadcast hints for genuinely small dimensions,
  * per-group windows instead of global sorts, map-side-combinable
  * aggregates.
  */
object Relational {

  /** Top-N rows per group without a global sort: window `row_number`
    * over (part, order) then filter — one shuffle on the partition
    * keys, no driver involvement, scales with #groups. */
  def topNPerGroup(df: DataFrame, partitionCols: Seq[Column],
                   orderCols: Seq[Column], n: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  /** Last-writer-wins compaction by key — the batch equivalent of the
    * reference's REPLACE-INTO upsert sink (SinkToMySQL.java:35): keep
    * only the newest version of each key. One shuffle on the key. */
  def latestByKey(df: DataFrame, keys: Seq[Column], versionOrder: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(versionOrder.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Global top-k: Spark's `orderBy.limit` plans a TakeOrderedAndProject
    * — per-partition partial top-k then a k-row merge on the driver, no
    * full sort/shuffle of the input. */
  def topK(df: DataFrame, orderCols: Seq[Column], k: Int): DataFrame =
    df.orderBy(orderCols: _*).limit(k)

  /** Tagged set-op comparison of two keyed sets (both / left-only /
    * right-only). Distinct + intersect/except shuffle once on the key. */
  def setCompare(left: DataFrame, right: DataFrame, keyCol: String,
                 leftTag: String, rightTag: String): DataFrame = {
    val l = left.distinct()
    val r = right.distinct()
    l.intersect(r).withColumn("tag", lit("both"))
      .unionByName(l.except(r).withColumn("tag", lit(leftTag)))
      .unionByName(r.except(l).withColumn("tag", lit(rightTag)))
      .select(col("tag"), col(keyCol))
  }

  /** Gap-based sessionization over integer epoch seconds: flag
    * session-starts with `lag`, number sessions with a running sum.
    * Two stacked windows over the same (user, time) order = one shuffle
    * on the user key; the streaming twin lives in
    * [[graft.streaming.Sessionize]]. */
  def sessionize(df: DataFrame, userCol: Column, tsSecCol: Column,
                 tieBreak: Column, gapSeconds: Long): DataFrame = {
    val order = Seq(tsSecCol, tieBreak)
    val w = Window.partitionBy(userCol).orderBy(order: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isNew = when(lag(tsSecCol, 1).over(w).isNull
      || tsSecCol - lag(tsSecCol, 1).over(w) > gapSeconds, 1).otherwise(0)
    df.withColumn("__is_new", isNew)
      .withColumn("session_id", sum(col("__is_new")).over(wRun))
      .drop("__is_new")
  }
}
