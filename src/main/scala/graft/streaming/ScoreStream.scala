package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming model-gate scorer — the deploy arm of the q220 trainer:
  * weights are TRAINED OFFLINE (batch GD over the corpus, the q220
  * artifact) and SCORED ONLINE as documents arrive, the standard
  * train-offline/score-online split of every production quality gate
  * (the fastText gate in crawl ingestion pipelines runs exactly this
  * way). The feature projection and the staged sigmoid pipeline are the
  * SAME functions the batch trainer uses ([[graft.queries.LmOps]]
  * `logitFeaturesOf` / `logitStages`), so stream ≡ batch is by
  * construction; the weights enter as literals, so scoring is a pure
  * row-local projection — NO state, no shuffle; the only streaming
  * state is the windowed counters.
  *
  * The monitor publishes per-(hour, source) counters: docs, flagged
  * (σ < 1/2 — the q220 flag), and the window's mean predicted
  * probability accumulated as a dyadic fixed-point BIGINT (floor(σ·2^26)
  * summed exactly — order-free, so the streaming aggregation is
  * bit-equal to the batch twin regardless of micro-batch boundaries).
  * A falling mean score or rising flag rate on one source is the
  * model-gate version of DocStream's clean-rate alarm.
  */
object ScoreStream {

  /** Row-local score projection: doc columns + p1 (predicted quality
    * probability) + flagged. Identical on stream and batch. */
  def scoreProjection(docs: DataFrame, w: Seq[Double]): DataFrame = {
    require(w.size == 5, "q220 weight vector has 5 components")
    val z = (0 to 4).map(j => lit(w(j)) * col(s"x$j")).reduceLeft(_ + _)
    graft.queries.LmOps.logitStages(spark = true).flatten
      .foldLeft(graft.queries.LmOps.logitFeaturesOf(docs).withColumn("z", z)) {
        case (df, (n, e)) => df.withColumn(n, expr(e))
      }
      .withColumn("flagged", col("p1") < 0.5)
  }

  /** Windowed per-source score counters (1-hour tumbling, 2-hour
    * watermark — the DocStream convention). */
  def monitor(docs: DataFrame, w: Seq[Double]): DataFrame =
    scoreProjection(docs, w)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
        sum(floor(col("p1") * lit(67108864e0)).cast("long")).as("p1_fp_sum"))
      .select(col("win.start").as("hour_start"), col("source"),
        col("n_docs"), col("n_flagged"),
        (col("p1_fp_sum").cast("double")
          / (lit(67108864e0) * col("n_docs").cast("double"))).as("mean_p1"))

  /** The batch twin for the spec: identical expressions over a static
    * frame. */
  def batchTwin(docs: DataFrame, w: Seq[Double]): DataFrame =
    scoreProjection(docs, w)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
        sum(floor(col("p1") * lit(67108864e0)).cast("long")).as("p1_fp_sum"))
      .select(col("win.start").as("hour_start"), col("source"),
        col("n_docs"), col("n_flagged"),
        (col("p1_fp_sum").cast("double")
          / (lit(67108864e0) * col("n_docs").cast("double"))).as("mean_p1"))
}
