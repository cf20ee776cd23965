package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming document-quality monitor — the ingest-side twin of the batch
  * gate family: as documents arrive, compute the ROW-LOCAL screens
  * (watermark z ≥ 4 — q197's context-seeded-hash construction; longest
  * same-token run ≥ 8 — q195's loop signal; minimum length) and publish
  * per-(hour, source) pass-rate counters. A pretraining ingest watches
  * exactly this table to catch a source going bad (a crawler loop, a
  * model-text flood) DAYS before the next batch curation run would.
  *
  * The gate projection is one shared function applied identically to the
  * stream and to a static DataFrame, so the spec proves stream ≡ batch by
  * construction (the EventStream discipline); all screens are row-local
  * expressions, so the streaming state is only the windowed counters —
  * nothing corpus-proportional.
  */
object DocStream {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType), StructField("ts", TimestampType)))

  /** File-source stream over a parquet directory of documents. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Synthetic event time for the corpus tables (documents carry none):
    * one doc per second from a fixed epoch, deterministic in doc_id. */
  def withEventTime(docs: DataFrame): DataFrame =
    docs.withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))

  /** The row-local screen columns — identical on stream and batch. Each
    * screen uses the SAME tokenizer as the batch query that defines it:
    * `toks` (trim + '\s+') is q197's watermark convention; `ltoks`
    * (single-space split, no trim) is q195's loop convention — the two
    * differ on consecutive/leading whitespace, so sharing one tokenizer
    * would make the spec's stream≡batch assertions hold only on
    * single-spaced fixtures. */
  def gateProjection(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(trim(coalesce(col("text"), lit(""))), "\\s+"))
      .withColumn("ltoks", split(coalesce(col("text"), lit("")), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_trans", greatest(size(col("toks")) - 1, lit(0)).cast("long"))
      .withColumn("n_green", expr(
        """CASE WHEN size(toks) >= 2 THEN size(filter(sequence(1, size(toks) - 1),
          |  i -> cast(conv(substring(md5(concat(element_at(toks, i), '|',
          |    element_at(toks, i + 1))), 1, 15), 16, 10) as bigint) % 2 = 0))
          |ELSE 0 END""".stripMargin).cast("long"))
      .withColumn("watermark_flag", col("n_trans") > 0 &&
        (col("n_green") * 2 - col("n_trans")).cast("double")
          / sqrt(col("n_trans").cast("double")) >= 4.0)
      .withColumn("cps", expr(
        """concat(array(0),
          |  CASE WHEN size(ltoks) >= 2 THEN filter(sequence(1, size(ltoks) - 1),
          |    i -> element_at(ltoks, i + 1) <> element_at(ltoks, i))
          |  ELSE cast(array() as array<int>) END,
          |  array(size(ltoks)))""".stripMargin))
      .withColumn("loopy", expr(
        """array_max(zip_with(slice(cps, 2, size(cps) - 1),
          |  slice(cps, 1, size(cps) - 1), (a, b) -> a - b)) >= 8""".stripMargin))
      .withColumn("too_short", col("n_tokens") < 5)
      .drop("toks", "ltoks", "cps")

  /** Windowed per-source screen counters (1-hour tumbling windows,
    * 2-hour watermark). */
  def monitor(docs: DataFrame): DataFrame =
    gateProjection(docs)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("watermark_flag"), 1)).as("n_watermarked"),
        count(when(col("loopy"), 1)).as("n_loopy"),
        count(when(col("too_short"), 1)).as("n_too_short"),
        count(when(!col("watermark_flag") && !col("loopy") && !col("too_short"), 1))
          .as("n_clean"))
      .select(col("w.start").as("hour_start"), col("source"), col("n_docs"),
        col("n_watermarked"), col("n_loopy"), col("n_too_short"), col("n_clean"))

  /** The alarm the monitor exists to raise: windows where a source's
    * clean rate fell below `minCleanRate` with at least `minDocs`
    * support (the support floor keeps a 2-doc hour from paging anyone).
    * A row-local filter over the windowed counters, so it composes on
    * the STREAM (append past the watermark) and on the batch twin
    * identically — the spec poisons one (hour, source) cell and asserts
    * both paths raise exactly that alert. */
  def alerts(counters: DataFrame, minCleanRate: Double = 0.5,
      minDocs: Long = 20L): DataFrame =
    counters
      .filter(col("n_docs") >= minDocs &&
        col("n_clean").cast("double") <
          col("n_docs").cast("double") * minCleanRate)
      .withColumn("clean_rate",
        col("n_clean").cast("double") / col("n_docs").cast("double"))
}
