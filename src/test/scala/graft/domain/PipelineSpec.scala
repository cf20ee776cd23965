package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  test("run: bronze parquet → gold star schema + marts with validation counts") {
    val base = Files.createTempDirectory("graft_pipe").toString
    Fixtures.reviews(spark).write.mode("overwrite").parquet(s"$base/bronze")
    val r = Pipeline.run(spark, s"$base/bronze", s"$base/gold")
    assert(r.bronzeCount === 10)
    assert(r.stagedCount === 7) // dup dropped, empty/too-short filtered
    assert(r.factCount === 7)
    assert(r.bankCount === 3)
    assert(r.branchCount === 4)
    // gold is partitioned by review_year → partition pruning applies
    val fact = spark.read.parquet(s"$base/gold/fact_reviews")
    assert(fact.columns.contains("review_year"))
    val pruned = fact.filter(col("review_year") === 2024)
    assert(pruned.count() === 7)
    // pruning must show up as PartitionFilters in the scan, not a post-scan
    // filter — the difference between reading one partition and all of them
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.contains("review_year"), planStr)
    // The geographic BI view lands in gold alongside the bank marts.
    val geo = spark.read.parquet(s"$base/gold/mart_geographic")
    assert(geo.columns.toSet ===
      Set("city", "total_reviews", "avg_rating", "avg_sentiment"))
    assert(geo.agg(sum("total_reviews")).head().getLong(0) === r.factCount)
    // S11: the run-stats JSON sink reproduces the validation counts
    val stats = spark.read.json(s"$base/gold/run_stats").head()
    assert(stats.getAs[Long]("bronzeCount") === r.bronzeCount)
    assert(stats.getAs[Long]("stagedCount") === r.stagedCount)
    assert(stats.getAs[Long]("factCount") === r.factCount)
    // idempotent rebuild (SaveMode.Overwrite ≡ DROP CASCADE + CTAS)
    val r2 = Pipeline.run(spark, s"$base/bronze", s"$base/gold")
    assert(r2 === r.copy())
  }
}
