package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` Dataset construction: building a
  * DataFrame from a custom LogicalPlan (graft.plans.AsOfJoin) requires
  * `Dataset.ofRows`, which Spark scopes to the sql package. Nested package
  * so the access check passes; no other internals are touched. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
