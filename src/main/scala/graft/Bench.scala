package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Each query is fully materialized through the `noop` sink — a bare
  * `.count()` would let Catalyst prune most of the projection work and
  * under-report.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JVM/codegen/file-listing costs land here, not on
    // the first measured query.
    graft.sources.Tables.normalize(spark)
    Seq("lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // Min of two runs per query (the first pays codegen compile), plus
    // an adaptive third run when the two disagree by >30% — this box
    // shows bursty CPU steal (to 12%), and a burst during either run
    // would otherwise be reported as plan cost.
    //
    // SPARK_GRAFT_BENCH_RUNS=steady (the default) ALSO reports a third
    // in-JVM run per query (`value_steady`/`queries_steady`): by run 3
    // codegen caches are hot and a steal burst on an early run no
    // longer moves the number, so round-over-round deltas compare
    // steady-state plan cost, not host weather. =min2 opts out (fast
    // mode for local iteration).
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
             name: String): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val steadyMode = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "steady") != "min2"
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t1 = once(fn, name)
      val t2 = once(fn, name)
      val best = math.min(t1, t2)
      val t3 = if (steadyMode || math.abs(t1 - t2) > 0.3 * best) Some(once(fn, name)) else None
      val min2 = if (math.abs(t1 - t2) > 0.3 * best) math.min(best, t3.get) else best
      name -> (min2, t3)
    }
    def fmt(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val qs = fmt(results.map { case (k, (v, _)) => k -> v })
    val total = results.values.map(_._1).sum
    val steadyPart = if (steadyMode) {
      val sq = results.collect { case (k, (_, Some(s))) => k -> s }
      f""","value_steady":${sq.values.sum}%.3f,"queries_steady":${fmt(sq)}"""
    } else ""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs$steadyPart,"sf":"$sfDir"}""")
    spark.stop()
  }
}
