package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Daily PROFILE maintenance over an event delta — the production
  * entry point for the whole mergeable-state family: one pass over
  * the delta lands a per-segment PARTIAL of every profile state in
  * its own segmented store (`Relational.appendState` — partition
  * overwrite, so an at-least-once re-run of the same segment is
  * exactly-once even for the non-idempotent count/sum states), and
  * the profile readout merges whatever segments exist — the delta is
  * scanned ONCE per state family; history is never rescanned.
  *
  * States maintained per event_type over (user_id, value-cents):
  * agg (count/sum/min/max), histogram (bucketed cents →
  * incremental quantiles), KMV (distinct users), AMS (F₂ of the
  * user frequency vector — self-join size / skew), CMS (point user
  * frequencies), Bloom (user membership), priority sample (k
  * weight-biased representative events → a-posteriori subset sums
  * for predicates nobody pre-aggregated), Misra–Gries (≤ k candidate
  * heavy users with never-overshooting counts — CMS's bracketing
  * partner), coverage (merged activity islands over [ts, ts+30 min) —
  * idempotent, so replays are harmless even without the overwrite),
  * trend (the five moment sums over (hour, whole-currency-units) —
  * exact shifted-moment merge, so the value-drift fit is maintained
  * without rescanning history; coarse units keep num·10⁶ inside a
  * long at any scale factor, the linearTrend overflow contract). Every stored number is deterministic
  * integer arithmetic.
  *
  * Every stage is the library operator — this main is pure wiring.
  *
  * {{{
  * spark-submit --class graft.jobs.ProfileMaintenanceJob <jar> \
  *   --in /root/testdata/sf0.01 --store /data/profile \
  *   --segment 2026-08-14 [--compact]
  * }}}
  */
object ProfileMaintenanceJob {

  val Keys = Seq("event_type")
  val BucketWidth = 100L
  val KmvK = 64
  val AmsK = 64
  val CmsDepth = 4
  val CmsWidth = 512
  val BloomHashes = 4
  val BloomBits = 1 << 17
  val SampleK = 64
  val MgK = 16
  val CoverageWindowSec = 1800L

  /** Land one delta's partial states under `segment`. Re-running the
    * same (delta, segment) overwrites — exactly-once under replays. */
  def ingest(events: DataFrame, storeDir: String, segment: String): Unit = {
    val ev = events.select(col("event_type"), col("event_id"), col("user_id"),
      col("ts_sec"), floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val k = Keys.map(col)
    Relational.appendState(
      Relational.aggState(ev, k, col("cents")), s"$storeDir/agg", segment)
    Relational.appendState(
      Relational.histogramState(ev, k, col("cents"), BucketWidth),
      s"$storeDir/hist", segment)
    Relational.appendState(
      Relational.kmvState(ev, k, col("user_id"), KmvK), s"$storeDir/kmv", segment)
    Relational.appendState(
      Relational.amsState(ev, k, col("user_id"), AmsK), s"$storeDir/ams", segment)
    Relational.appendState(
      Relational.cmsState(ev, k, col("user_id"), CmsDepth, CmsWidth),
      s"$storeDir/cms", segment)
    Relational.appendState(
      Relational.bloomState(ev, k, col("user_id"), BloomHashes, BloomBits),
      s"$storeDir/bloom", segment)
    Relational.appendState(
      Relational.sampleState(ev, k, col("event_id"), col("cents"), SampleK,
        payload = Seq(col("user_id"))), s"$storeDir/sample", segment)
    Relational.appendState(
      Relational.mgState(ev, k, col("user_id"), MgK), s"$storeDir/mg", segment)
    Relational.appendState(
      Relational.coverageState(ev, k, col("ts_sec"),
        col("ts_sec") + CoverageWindowSec), s"$storeDir/cov", segment)
    Relational.appendState(
      Relational.trendState(ev, k, expr("ts_sec div 3600"),
        expr("cents div 100")), s"$storeDir/trend", segment)
  }

  /** Fold every store down to one `seg=base` generation. */
  def compact(spark: SparkSession, storeDir: String): Unit = {
    Relational.compactStateStore(spark, s"$storeDir/agg")(st =>
      Relational.mergeAggStates(Seq(st), Keys))
    Relational.compactStateStore(spark, s"$storeDir/hist")(st =>
      Relational.mergeHistogramStates(Seq(st), Keys))
    Relational.compactStateStore(spark, s"$storeDir/kmv")(st =>
      Relational.mergeKmvStates(Seq(st), Keys, KmvK))
    Relational.compactStateStore(spark, s"$storeDir/ams")(st =>
      Relational.mergeAmsStates(Seq(st), Keys))
    Relational.compactStateStore(spark, s"$storeDir/cms")(st =>
      Relational.mergeCmsStates(Seq(st), Keys))
    Relational.compactStateStore(spark, s"$storeDir/bloom")(st =>
      Relational.mergeBloomStates(Seq(st)))
    Relational.compactStateStore(spark, s"$storeDir/sample")(st =>
      Relational.mergeSampleStates(Seq(st), Keys, SampleK))
    Relational.compactStateStore(spark, s"$storeDir/mg")(st =>
      Relational.mergeMgStates(Seq(st), Keys, MgK))
    Relational.compactStateStore(spark, s"$storeDir/cov")(st =>
      Relational.mergeCoverageStates(Seq(st), Keys))
    Relational.compactStateStore(spark, s"$storeDir/trend")(st =>
      Relational.mergeTrendStates(Seq(st), Keys))
  }

  /** The merged profile readout — per event_type: exact row count /
    * cents sum+min+max (agg), median cents lower bound (histogram),
    * distinct-user estimate (KMV), user-frequency F₂ estimate (AMS).
    * CMS and Bloom are probe-style states (point frequency /
    * membership) — read them with [[Relational.cmsEstimate]] /
    * [[Relational.bloomMightContain]] against a probe list. */
  def profile(spark: SparkSession, storeDir: String): DataFrame = {
    val agg = Relational.readMergedState(spark, s"$storeDir/agg")(st =>
      Relational.mergeAggStates(Seq(st), Keys))
    val p50 = Relational.readMergedState(spark, s"$storeDir/hist")(st =>
        Relational.histogramQuantiles(
          Relational.mergeHistogramStates(Seq(st), Keys), Keys,
          Seq(500), BucketWidth))
      .select(col("event_type"), col("quantile_lo").as("p50_cents_lo"))
    val kmv = Relational.readMergedState(spark, s"$storeDir/kmv")(st =>
        Relational.kmvDistinctEstimate(
          Relational.mergeKmvStates(Seq(st), Keys, KmvK), Keys, KmvK))
      .select(col("event_type"), col("est_distinct").as("est_distinct_users"))
    val f2 = Relational.readMergedState(spark, s"$storeDir/ams")(st =>
        Relational.amsF2Estimate(
          Relational.mergeAmsStates(Seq(st), Keys), Keys, AmsK))
      .select(col("event_type"), col("f2_est").as("user_f2_est"))
    // the sample answers an a-posteriori predicate none of the other
    // states pre-aggregated — demonstrated here with even user ids
    val samp = Relational.readMergedState(spark, s"$storeDir/sample")(st =>
        Relational.prioritySampleEstimate(
          Relational.mergeSampleStates(Seq(st), Keys, SampleK), Keys, SampleK,
          pmod(col("user_id"), lit(2)) === 0))
      .select(col("event_type"), col("est_sum").as("est_cents_even_users"))
    // the heaviest surviving MG counter: a guaranteed-no-overshoot
    // "top user" lower bound (deterministic tie-break on the value)
    val mg = Relational.readMergedState(spark, s"$storeDir/mg")(st =>
        Relational.topNPerGroup(Relational.mergeMgStates(Seq(st), Keys, MgK),
          Keys.map(col), Seq(col("n").desc, col("v")), 1, rankCol = "__rn"))
      .select(col("event_type"), col("v").cast("long").as("top_user_id"),
        col("n").as("top_user_lb"))
    // merged activity coverage: seconds of the span with any event
    val cov = Relational.readMergedState(spark, s"$storeDir/cov")(st =>
        Relational.coverageReadout(
          Relational.mergeCoverageStates(Seq(st), Keys), Keys))
      .select(col("event_type"), col("covered").as("active_secs"))
    // value drift: units-per-hour slope of the merged moment sums
    val trend = Relational.readMergedState(spark, s"$storeDir/trend")(st =>
        Relational.trendReadout(Relational.mergeTrendStates(Seq(st), Keys)))
      .select(col("event_type"), col("slope_ppm").as("value_slope_ppm"))
    // ALL per-state readouts join LEFT off the agg spine: any one
    // state can legally be empty for a key (MG: a perfectly tied key
    // trims every counter; sample: all cents <= 0 filtered by the
    // w > 0 guard; kmv/ams/cms: all user_ids null) and the profile
    // row must survive with nulls there, not vanish
    agg.join(p50, Keys, "left").join(kmv, Keys, "left")
      .join(f2, Keys, "left").join(samp, Keys, "left")
      .join(mg, Keys, "left").join(cov, Keys, "left")
      .join(trend, Keys, "left")
      .orderBy(col("event_type"))
  }

  def main(args: Array[String]): Unit = {
    val doCompact = args.contains("--compact")
    val opts = args.filterNot(_ == "--compact").sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val in = opts.getOrElse("in", "/root/testdata/sf0.001")
    val store = opts.getOrElse("store", "/tmp/graft_profile")
    val segment = opts.getOrElse("segment", "d0")
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .master(sys.props.getOrElse("spark.master", "local[*]"))
      .appName("graft-profile-maintenance").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ingest(graft.sources.Tables.events(spark, in), store, segment)
    if (doCompact) compact(spark, store)
    val rows = profile(spark, store).collect()
    println(s"""{"profiled_types":${rows.length},"segment":"$segment"}""")
    spark.stop()
  }
}
