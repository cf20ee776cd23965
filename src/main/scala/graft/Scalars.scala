package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The scalar-subquery idiom, named once instead of hand-rolled at each
  * call site: attach the columns of a 1-row DataFrame (a groupless
  * aggregate, or a 1-row committed artifact) to every row of `df`.
  *
  * The scalar side is broadcast, so the "cross" join is a broadcast
  * nested-loop over exactly one row — no shuffle, no data-proportional
  * blow-up. PlanHygieneSpec's loop-join gate recognizes the shape as
  * bounded (its detector keys on the groupless aggregate / local-relation
  * side), so call sites using this helper pass the fleet-wide
  * no-all-pairs assertion without allowlisting.
  */
object Scalars {

  /** The ≤1-row precondition is ENFORCED, not assumed: a multi-row scalar
    * side would silently multiply every probe row through the broadcast
    * cross join — the exact all-pairs failure this helper exists to fence
    * off. Statically provable ≤1-row plans (groupless aggregates, LIMIT 1,
    * literal relations — Catalyst's `maxRows`) cost nothing to admit and
    * run no job at construction time. A plan whose row count is only a
    * runtime fact (e.g. a committed 1-row artifact re-read from parquet)
    * is materialized ONCE with `localCheckpoint` and both the guard count
    * and the join read that artifact — counting one execution and joining
    * a second would let a nondeterministic side (a sample, an unordered
    * `first()`) pass the guard and still multiply rows at join time. The
    * LIMIT-2 count on the checkpoint is bounded work regardless of how
    * big a mistaken input is. */
  def withScalar(df: DataFrame, scalar: DataFrame): DataFrame = {
    val provable = scalar.queryExecution.analyzed.maxRows.exists(_ <= 1L)
    val side =
      if (provable) scalar
      else {
        // limit(2) BEFORE the checkpoint: the materialization itself stays
        // bounded at 2 rows even when a mistaken caller passes a
        // corpus-sized side (checkpointing the full side first would run a
        // data-proportional job before the guard could reject it). When
        // the guard passes, the ≤1-row checkpoint IS the whole side, so
        // the count and the join still read the same materialization.
        val once = scalar.limit(2).localCheckpoint(true)
        require(once.count() <= 1L,
          "withScalar requires a <=1-row scalar side (groupless aggregate, " +
            "LIMIT 1, or 1-row committed artifact); a multi-row side would " +
            "silently multiply rows through the broadcast cross join")
        once
      }
    df.crossJoin(broadcast(side))
  }
}
