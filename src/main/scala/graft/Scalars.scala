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
  def withScalar(df: DataFrame, scalar: DataFrame): DataFrame =
    df.crossJoin(broadcast(scalar))
}
