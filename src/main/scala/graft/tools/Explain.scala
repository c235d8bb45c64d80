package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of named SparkEntry queries
  * (all queries when no names given).
  *
  * {{{ sbt "runMain graft.tools.Explain [sfDir] [query ...]" }}}
  *
  * With `SPARK_GRAFT_EXPLAIN_OUT=<dir>` set, additionally writes each
  * query's `.explain("formatted")` text to
  * `<dir>/<query><SPARK_GRAFT_EXPLAIN_SUFFIX>.txt` (suffix defaults to
  * empty) — the plan-evidence artifact format of the optimization
  * rounds (`plans/r09/<query>_before.txt` / `_after.txt`).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.queries.keys.toSeq
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_OUT")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "")
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Bench.silenceKBoundedWindowWarnings()
    names.foreach { q =>
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      outDir match {
        case Some(dir) =>
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          new java.io.File(dir).mkdirs()
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$dir/$q$suffix.txt"), txt)
          println(s"[explain] wrote $dir/$q$suffix.txt")
        case None =>
          println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
