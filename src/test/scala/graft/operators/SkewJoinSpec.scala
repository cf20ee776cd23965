package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join: the runtime re-plan path for hot keys (complementing the
  * explicit salting in Skew.saltedJoin — brief: "salting for skew, AQE for
  * runtime re-plan"). Under a lowered skew threshold, the hot partition
  * must be SPLIT by the adaptive planner (skew=true on the sort-merge
  * join) while the result stays identical to the plain join. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot partition at runtime (skew=true) with identical results") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // 95% of rows share key 0, each carrying a fat payload → one shuffle
      // partition dwarfs the median.
      val pad = "x" * 64
      val big = spark.range(0, 200000)
        .select((when(col("id") % 20 === 0, col("id") % 50).otherwise(0L)).as("k"),
          concat(lit(pad), col("id")).as("payload"))
      val dim = spark.range(0, 50).select(col("id").as("k"),
        concat(lit("tag_"), col("id")).as("tag"))
      val joined = big.join(dim, "k")
      // Execute THIS plan instance (count() would build a separate plan and
      // leave this AdaptiveSparkPlan unfinalized).
      val qe = joined.queryExecution
      assert(qe.executedPlan.execute().count() === 200000L)
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed SMJ partition for splitting:\n$plan")
      // Same answer as the aggregate ground truth.
      val hot = joined.filter(col("k") === 0).count()
      assert(hot === big.filter(col("k") === 0).count())
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
