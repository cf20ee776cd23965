package graft.domain

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end warehouse build replacing the reference's three Airflow DAGs
  * (SURVEY §3): bronze parquet → staged/cleaned → NLP-enriched silver →
  * star-schema gold + marts, with per-stage count validation
  * (complete_data_pipeline_fixed.py:305-327). One Spark lineage — the
  * reference's CSV/XCom hops disappear; stage boundaries are shuffles only.
  *
  * Idempotent full rebuild: SaveMode.Overwrite ≡ the reference's
  * DROP CASCADE + CTAS (complete_data_pipeline_fixed.py:95-107).
  */
object Pipeline {

  final case class Result(
      bronzeCount: Long, stagedCount: Long,
      factCount: Long, bankCount: Long, branchCount: Long)

  def enrichOnly(bronze: DataFrame): DataFrame =
    Nlp.enrich(Clean.stage(bronze))

  /** Build everything in memory (tests / small scale). */
  def build(spark: SparkSession, bronze: DataFrame, parityMode: Boolean = true)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val silver = enrichOnly(bronze)
    val bank = Star.dimBank(silver, parityMode)
    val branch = Star.dimBranch(silver, bank, parityMode)
    val fact = Star.factReviews(silver, bank, branch, parityMode)
    (silver, bank, branch, fact, Star.dimDate(spark))
  }

  /** Full run with gold-layer persistence + validation counts.
    * At scale: fact partitioned by review_year (partition pruning for the
    * time-sliced marts); dims are single small files. */
  def run(spark: SparkSession, bronzeDir: String, goldDir: String,
      parityMode: Boolean = false): Result = {
    val bronze = spark.read.schema(Schemas.review).parquet(bronzeDir)
    val (silver, bank, branch, fact, dates) = build(spark, bronze, parityMode)

    silver.cache()
    bank.write.mode(SaveMode.Overwrite).parquet(s"$goldDir/dim_bank")
    branch.write.mode(SaveMode.Overwrite).parquet(s"$goldDir/dim_branch")
    Star.dimSentiment(spark).write.mode(SaveMode.Overwrite).parquet(s"$goldDir/dim_sentiment")
    dates.write.mode(SaveMode.Overwrite).parquet(s"$goldDir/dim_date")
    // Within each year partition, rows are z-ordered on (bank_key,
    // date_key): per-file min/max stats become tight on BOTH keys, so
    // bank-sliced AND date-sliced mart scans skip files (graft_zorder —
    // see graft.functions.ZOrderUtil).
    fact.withColumn("review_year", year(col("review_time")))
      .sortWithinPartitions(expr("graft_zorder(bank_key, date_key)"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("review_year")
      .parquet(s"$goldDir/fact_reviews")

    Marts.bankPerformance(silver).write.mode(SaveMode.Overwrite)
      .parquet(s"$goldDir/mart_bank_performance")
    Marts.bankRanking(silver).write.mode(SaveMode.Overwrite)
      .parquet(s"$goldDir/mart_bank_ranking")
    Marts.geographicAnalysis(fact, branch).write.mode(SaveMode.Overwrite)
      .parquet(s"$goldDir/mart_geographic")

    val r = Result(
      bronzeCount = bronze.count(),
      stagedCount = silver.count(),
      factCount = spark.read.parquet(s"$goldDir/fact_reviews").count(),
      bankCount = spark.read.parquet(s"$goldDir/dim_bank").count(),
      branchCount = spark.read.parquet(s"$goldDir/dim_branch").count())
    silver.unpersist()
    require(r.factCount <= r.stagedCount, "fact cannot exceed staged rows")
    // S11: run-stats JSON sink — the reference drops a processing-stats
    // JSON at the end of each phase (nlp_processor_simple.py:289-301);
    // here it is the per-stage validation counts next to the gold layer.
    import spark.implicits._
    Seq(r).toDS().coalesce(1).write.mode(SaveMode.Overwrite)
      .json(s"$goldDir/run_stats")
    r
  }
}
