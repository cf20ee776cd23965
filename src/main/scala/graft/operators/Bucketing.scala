package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location: pre-shuffle fact tables once at write time so
  * repeated joins/aggregations on the bucket key run shuffle-free. The
  * 100 TB story: a fact table joined daily on the same key should pay its
  * shuffle once, not per query (SURVEY §4 substitutes bucketing for the
  * reference's btree indexes).
  */
object Bucketing {

  /** Persist as a bucketed managed table (requires a warehouse-enabled
    * session; bucket count should target ~128-512 MB per bucket at scale). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sortByKey: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(buckets, key)
    (if (sortByKey) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two tables bucketed on the same key with the same bucket count —
    * plans as SortMergeJoin over pre-bucketed scans with NO Exchange. */
  def cooperativeJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True if the physical plan contains any shuffle exchange — the
    * assertion hook for co-location tests. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
