package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

object PlanHygiene {
  /** Full physical-plan traversal that DESCENDS INTO AdaptiveSparkPlanExec
    * (whose inner plan is a field, not a child — a plain `.collect` sees
    * nothing under AQE and makes plan assertions vacuous). */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  def unpartitionedWindows(df: org.apache.spark.sql.DataFrame): Seq[WindowExec] =
    allNodes(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
}

/** Fleet-wide physical-plan hygiene: no query may introduce a
  * single-partition window over data-proportional input. The allowlist
  * names the queries whose unpartitioned windows are over provably
  * BOUNDED aggregates (output-proportional, not data-proportional) —
  * adding a new query with a global window fails here first. */
class PlanHygieneSpec extends SparkSpec {

  /** Unpartitioned windows over bounded inputs, each justified:
    *  - q08: LAG over the per-MONTH aggregate (rows = months in the data's
    *    calendar span);
    *  - q09: surrogate keys for a 5-row distinct dim (reference parity —
    *    the scale mode is Star.surrogate(parityMode = false)). */
  private val boundedAllowlist = Set("q08_window_lag_trend", "q09_surrogate_keys")

  test("no query plan has an unpartitioned window outside the bounded allowlist") {
    val sf = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (PlanHygiene.unpartitionedWindows(fn(spark, sf)).nonEmpty &&
        !boundedAllowlist.contains(name)) Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"queries with data-proportional unpartitioned windows: $offenders")
    // And the allowlist itself stays minimal — entries that stop matching
    // should be removed.
    boundedAllowlist.foreach { name =>
      assert(PlanHygiene.unpartitionedWindows(SparkEntry.queries(name)(spark, sf)).nonEmpty,
        s"$name no longer has an unpartitioned window — drop it from the allowlist")
    }
  }
}
