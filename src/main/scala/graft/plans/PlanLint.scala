package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}

/** Executable plan-quality checks — the PERF.md plan audits as code,
  * so a regression (a broadcast that silently becomes a shuffle, a
  * HashAggregate that falls back to SortAggregate, an accidental
  * cartesian) fails a test instead of surviving until someone re-reads
  * an `.explain`. Checks are string-shape assertions over the executed
  * plan, the same convention `PlanShapeSpec` uses inline.
  */
object PlanLint {

  /** Lint the physical plan; returns human-readable violations
    * (empty = clean).
    *
    * @param maxExchanges upper bound on shuffle exchanges
    *   (`ReusedExchange` nodes don't count — reuse is the point);
    * @param allowSortAggregate SortAggregate is a scale smell on hot
    *   paths (no codegen'd hash map; sorts every group);
    * @param allowCartesian CartesianProduct / BroadcastNestedLoopJoin
    *   are O(|L|·|R|) — at 100 TB that is an outage, not a plan. */
  def violations(df: DataFrame, maxExchanges: Int = Int.MaxValue,
                 allowSortAggregate: Boolean = true,
                 allowCartesian: Boolean = false): Seq[String] = {
    val plan = df.queryExecution.executedPlan.toString
    val b = Seq.newBuilder[String]
    if (!allowCartesian &&
        (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")))
      b += "cartesian: CartesianProduct/BroadcastNestedLoopJoin in plan"
    if (!allowSortAggregate && plan.contains("SortAggregate"))
      b += "sort-aggregate: SortAggregate on a path expected to hash-aggregate"
    // Only SHUFFLE exchanges count against the budget: a
    // BroadcastExchange is the cheap alternative we WANT plans to pick,
    // and charging it would pad budgets until a real shuffle regression
    // hides inside the slack. Shuffle nodes render as
    // "Exchange hashpartitioning/rangepartitioning/SinglePartition/…";
    // broadcast nodes as "BroadcastExchange"; reused ones as
    // "ReusedExchange".
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange ") && !l.contains("BroadcastExchange") &&
        !l.contains("ReusedExchange"))
    if (exchanges > maxExchanges)
      b += s"exchanges: $exchanges shuffle exchanges, budget $maxExchanges"
    b.result()
  }

  /** [[violations]] that throws — the form to drop at the end of a job
    * builder so a bad plan never reaches the cluster. */
  def assertClean(df: DataFrame, maxExchanges: Int = Int.MaxValue,
                  allowSortAggregate: Boolean = true,
                  allowCartesian: Boolean = false): DataFrame = {
    val v = violations(df, maxExchanges, allowSortAggregate, allowCartesian)
    require(v.isEmpty,
      s"plan lint failed:\n${v.mkString("\n")}\n${df.queryExecution.executedPlan.toString.take(4000)}")
    df
  }
}

/** Session-wide strict mode for the same accident: an analysis CHECK
  * rule (injected by [[GraftExtensions]], gated on
  * `spark.graft.failOnCartesian`) that rejects condition-free
  * inner/cross joins at analysis time — before any execution, with the
  * offending plan in the message. Intended for shared-cluster sessions
  * where one unkeyed join from an ad-hoc notebook would fan out
  * |L|·|R|; explicit range joins (non-equi CONDITIONS) stay legal. */
class CartesianGuard(spark: SparkSession) extends (LogicalPlan => Unit) {
  override def apply(plan: LogicalPlan): Unit =
    if (spark.conf.get(CartesianGuard.Flag, "false").toBoolean)
      plan.foreach {
        case j: Join if j.condition.isEmpty &&
            (j.joinType == Inner || j.joinType == Cross) =>
          throw new IllegalStateException(
            s"${CartesianGuard.Flag}: condition-free ${j.joinType} join (cartesian product). " +
              s"Add a join condition, or unset ${CartesianGuard.Flag}.\n${j.toString.take(1000)}")
        case _ => ()
      }
}

object CartesianGuard {
  val Flag = "spark.graft.failOnCartesian"
}
