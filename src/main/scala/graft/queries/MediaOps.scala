package graft.queries

import graft.Tables
import graft.multimodal.Media
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DuckDB-oracled coverage for the multimodal path (VERDICT r7 item 6):
  * until now Media.extractFeatures had spec-only coverage because its
  * float feature vector is not bit-portable across engines. q90 closes
  * that: documents' text bytes become opaque `content` blobs, the REAL
  * batched mapPartitions extractor runs over them, its output round-trips
  * through a parquet sink, and the q31-family norms + q26-family exact
  * dedup run on top — with the oracle recomputing every emitted column
  * from the raw bytes (DuckDB get_bit byte extraction) rather than
  * re-reading engine output.
  *
  * Portability: n_bytes/bin_sums are exact integer arithmetic; byte_mean
  * is one exact-integer division; feat_norm is an ordered IEEE fold over
  * the 16 integer bins — all bit-identical in DuckDB. The float `feature`
  * and entropy stay spec-covered (float += is rounding-order-dependent by
  * construction).
  *
  * Scale shape: extraction is one narrow mapPartitions pass; the parquet
  * round-trip is a narrow write + read; dedup partitions by a 32-char md5
  * fingerprint (constant-size shuffle key — never the blob itself); the
  * final join is keyed on media_id. No window over anything wider than a
  * fingerprint group, no driver-side byte handling.
  */
object MediaOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Scratch dir for the feature-parquet sink (shared Scratch convention:
    * md5(sf-dir) + pid + session nonce). */
  private def featDir(s: SparkSession, d: String): String =
    graft.Scratch.dir("mediafeat", s, d)

  private def q90(s: SparkSession, d: String): DataFrame = {
    implicit val ss: SparkSession = s
    val media = t(s, d, "documents")
      .select(col("doc_id").as("media_id"), lit("binary").as("kind"),
        // coalesce: a NULL doc is the empty byte stream in both engines
        // (decodeOne zero-handles null, the oracle's NULL blob did not —
        // found by tools/fuzz_corpus.py).
        encode(coalesce(col("text"), lit("")), "UTF-8").as("content"))
    // Real multimodal path: batched mapPartitions extraction → parquet
    // sink → re-read (the artifact a downstream training pipeline reads).
    val dir = featDir(s, d)
    Media.extractFeatures(media).toDF()
      .select("media_id", "n_bytes", "byte_mean", "bin_sums")
      .write.mode("overwrite").parquet(dir)
    val feats = s.read.parquet(dir)
      .withColumn("feat_norm", expr(
        "sqrt(aggregate(bin_sums, cast(0.0 as double)," +
          " (a, b) -> a + (cast(b as double) / 255.0d) * (cast(b as double) / 255.0d)))"))
    // Exact dedup over the media bytes: fingerprint-partitioned window,
    // q26's shape (constant-size md5 key, not the blob).
    val w = Window.partitionBy(col("fp"))
    val flags = media.select(col("media_id"), md5(col("content")).as("fp"))
      .select(col("media_id"),
        count(lit(1)).over(w).as("group_size"),
        (col("media_id") =!= min("media_id").over(w)).as("is_dup"))
    feats.join(flags, "media_id")
      .select(col("media_id"), col("n_bytes"), col("byte_mean"),
        col("feat_norm"), col("group_size"), col("is_dup"))
      .orderBy("media_id")
  }

  /** The oracle recomputes the byte stream itself: encode(text) → BLOB →
    * BIT → per-byte reassembly from 8 get_bit calls, then the identical
    * integer bins and ordered norm fold. */
  private val q90Sql =
    """WITH d AS (SELECT doc_id, encode(COALESCE(text, '')) AS blob,
      |  md5(COALESCE(text, '')) AS fp FROM documents),
      |bytes AS (
      |  SELECT doc_id, fp, CAST(octet_length(blob) AS INTEGER) AS n_bytes,
      |    list_transform(range(0, octet_length(blob)), i ->
      |      list_sum(list_transform(range(0, 8), bt ->
      |        get_bit(blob::BIT, CAST(i * 8 + bt AS INTEGER)) << (7 - bt)))) AS bs
      |  FROM d),
      |agg AS (
      |  SELECT doc_id, fp, n_bytes,
      |    CASE WHEN n_bytes = 0 THEN CAST(0 AS DOUBLE)
      |         ELSE CAST(list_sum(bs) AS DOUBLE) / n_bytes END AS byte_mean,
      |    list_transform(range(0, 16), k ->
      |      list_sum(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(k, CAST(len(bs) AS BIGINT), 16),
      |          i -> bs[CAST(i AS INTEGER) + 1])))) AS bin_sums
      |  FROM bytes),
      |normed AS (
      |  SELECT doc_id, fp, n_bytes, byte_mean,
      |    sqrt(list_reduce(list_prepend(0.0, list_transform(bin_sums,
      |      b -> (CAST(b AS DOUBLE) / 255.0) * (CAST(b AS DOUBLE) / 255.0))),
      |      (a, b) -> a + b)) AS feat_norm
      |  FROM agg)
      |SELECT doc_id AS media_id, n_bytes, byte_mean, feat_norm,
      |  COUNT(*) OVER w AS group_size,
      |  doc_id <> MIN(doc_id) OVER w AS is_dup
      |FROM normed
      |WINDOW w AS (PARTITION BY fp)
      |ORDER BY media_id""".stripMargin

  val all: Seq[Q] = Seq(Q("q90_media_features", q90, Some(q90Sql)))
}
