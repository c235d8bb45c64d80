package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-operator execution-shape budgets for the graph family on the
  * SHARED near-dup pair input (rounds 7–8: timing-based grading
  * produced phantom family-wide flags under host pressure — shape
  * cannot be blamed on the host). Each budget is the measured stage
  * count with headroom: a real plan regression (an extra shuffle per
  * iteration, a lost broadcast, a checkpoint dropped from the loop)
  * jumps the stage count far past the slack, while host weather
  * cannot move it at all. */
class GraphPlanBudgetSpec extends SparkSpec {

  private def stagesFor(name: String): Int = {
    // seed the shared pair cache outside the measured window
    SparkEntry.queries("graph_degrees")(spark, sf).count()
    var stages = 0
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
        stages += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SparkEntry.queries(name)(spark, sf).write.format("noop")
        .mode("overwrite").save()
      // let queued stage-completion events drain before reading
      Thread.sleep(300)
    } finally spark.sparkContext.removeSparkListener(listener)
    stages
  }

  // measured at sf0.001 on the checkpointed shared input; budget =
  // measured + ~50% slack (AQE can coalesce a stage or two, never add
  // a multiple)
  // measured this round: degrees=5, pagerank=32, hits=38,
  // triangles=15, bfs=22, kcore=22
  private val budgets = Seq(
    "graph_degrees" -> 8,
    "graph_pagerank" -> 48,
    "graph_hits" -> 57,
    "graph_triangles" -> 23,
    "graph_bfs" -> 33,
    "graph_kcore" -> 33)

  test("graph family: executed-stage budgets on the shared pair input") {
    val measured = budgets.map { case (name, budget) =>
      val n = stagesFor(name)
      (name, n, budget)
    }
    val report = measured.map { case (n, s, b) => s"$n=$s/$b" }.mkString(", ")
    info(s"stage counts: $report")
    for ((name, n, budget) <- measured)
      assert(n <= budget, s"$name executed $n stages, budget $budget — " +
        s"a plan regression, not host weather (all: $report)")
  }
}
