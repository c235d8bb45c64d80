package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of named SparkEntry queries
  * (all queries when no names given).
  *
  * {{{ sbt "runMain graft.tools.Explain [sfDir] [query ...]" }}}
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.queries.keys.toSeq
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
