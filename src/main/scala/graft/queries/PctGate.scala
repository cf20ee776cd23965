package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-size-derived percentile-threshold strategy — the knob that
  * turns the LM-gate family's "swap the exact percentile at scale"
  * documentation notes (q106/q123/q135/q179/q205) into executed code,
  * the [[VectorOps.lshBitsFor]] discipline applied to thresholds.
  *
  * Exact `percentile` buffers every value of the group in one
  * aggregation buffer — fine to ~10^7 rows, fatal at 10^10. Above
  * [[exactMaxRows]] the threshold switches to the EXACT percentile of a
  * DETERMINISTIC md5-ticket sample: a row participates iff the integer
  * value of its ticket's first 8 hex chars falls below
  * (SampleRows << 32) / n, giving ~[[SampleRows]] rows in expectation
  * with membership a pure function of (tag, doc_id).
  *
  * Why a ticket sample instead of `approx_percentile`: the t-digest /
  * GK sketch's merge is partitioning-dependent (reruns and AQE replans
  * can move the estimate) and its internals cannot be restated in
  * DuckDB, so it can never pass the bit-parity gate — it would demote
  * every consumer to a tolerance oracle (q56's pattern, which exists
  * for the one query whose POINT is the sketch). The ticket sample is
  * deterministic, engine-identical, rank error ~1/√SampleRows ≈ 0.1%
  * at 2^20 — comparable to approx_percentile's practical envelope at
  * similar memory — and keeps every gate bit-green at EVERY scale.
  *
  * Both engines derive the same branch from the same integer COUNT
  * compare, and the same cut from the same integer shift/divide, so
  * branch choice can never diverge. `GRAFT_PCT_EXACT_MAX` overrides
  * [[exactMaxRows]] in BOTH the Spark plan and the generated oracle SQL
  * (Verify emits them from one JVM) — the test hook that forces the
  * sampled branch at toy scale and proves it bit-green end-to-end.
  */
object PctGate {

  /** 2^23 ≈ 8.4M rows: one value per row in a single percentile buffer
    * at ~8 B/value ≈ 67 MB — the documented comfort boundary. Integer,
    * compared on the same count in both engines. */
  val DefaultExactMaxRows: Long = 1L << 23

  /** Expected sample size in the sampled branch: 2^20 rows (~8 MB
    * buffer, rank error ~0.1%). */
  val DefaultSampleRows: Long = 1L << 20

  def exactMaxRows: Long =
    sys.env.get("GRAFT_PCT_EXACT_MAX").map(_.toLong).getOrElse(DefaultExactMaxRows)

  /** GRAFT_PCT_SAMPLE_ROWS pairs with GRAFT_PCT_EXACT_MAX in the test
    * hook: at toy corpus sizes the default quota exceeds n and the
    * sample degenerates to everything, so forcing a GENUINE subset needs
    * both knobs lowered (e.g. 100 / 128 at sf0.01's 500 docs keeps
    * ~26%). */
  def SampleRows: Long =
    sys.env.get("GRAFT_PCT_SAMPLE_ROWS").map(_.toLong).getOrElse(DefaultSampleRows)

  /** Ticket cut: (SampleRows << 32) / n — both factors integers, so both
    * engines compute the identical cut. */
  def cutFor(n: Long): Long = (SampleRows << 32) / math.max(n, 1L)

  private def ticketSpark(tag: String, keyExpr: String): String =
    s"cast(conv(substring(md5(concat('$tag|', cast(($keyExpr) as string))), 1, 8), 16, 10) as bigint)"

  /** The 1-row threshold aggregate over `df`, branch derived from `n` =
    * df's row count. `keyExpr` is the deterministic per-row BIGINT the
    * sample ticket hashes — doc_id for per-doc gates; pair-keyed inputs
    * (q114/q211's within-cell cosine calibrators) pass a collision-free
    * pair encoding instead. */
  def thresholdDf(df: DataFrame, n: Long, valueCol: String, frac: String,
      tag: String, outName: String, keyExpr: String = "doc_id"): DataFrame = {
    val in =
      if (n <= exactMaxRows) df
      else df.filter(expr(ticketSpark(tag, keyExpr)) < lit(cutFor(n)))
    in.agg(expr(s"percentile($valueCol, $frac)").as(outName))
  }

  /** Multi-fraction variant of [[thresholdDf]]: ONE pass over `df` (one
    * percentile buffer holding the sample once, not once per fraction)
    * emitting a 1-row frame with one column per (frac, outName). The
    * multi-stat shape q103's datasheet percentiles need — two corpus
    * passes for two fractions would double the gate's scan cost at
    * 100 TB. */
  def thresholdsDf(df: DataFrame, n: Long, valueCol: String,
      fracs: Seq[String], outNames: Seq[String], tag: String,
      keyExpr: String = "doc_id"): DataFrame = {
    require(fracs.nonEmpty && fracs.size == outNames.size)
    val in =
      if (n <= exactMaxRows) df
      else df.filter(expr(ticketSpark(tag, keyExpr)) < lit(cutFor(n)))
    in.agg(expr(s"percentile($valueCol, array(${fracs.mkString(", ")}))").as("__ps"))
      .select(outNames.zipWithIndex.map { case (o, i) =>
        expr(s"element_at(__ps, ${i + 1})").as(o)
      }: _*)
  }

  private def caseSql(from: String, valueCol: String, frac: String,
      tag: String, outName: String, keyExpr: String): String = {
    val cut =
      s"((CAST($SampleRows AS BIGINT) << 32) / GREATEST((SELECT COUNT(*) FROM $from), 1))"
    val tkt = s"(('0x' || substr(md5('$tag|' || CAST(($keyExpr) AS VARCHAR)), 1, 8))::BIGINT)"
    s"CASE WHEN (SELECT COUNT(*) FROM $from) <= $exactMaxRows\n" +
      s"    THEN (SELECT quantile_cont($valueCol, $frac) FROM $from)\n" +
      s"    ELSE (SELECT quantile_cont($valueCol, $frac) FROM $from WHERE $tkt < $cut)\n" +
      s"    END AS $outName"
  }

  /** Oracle twin: the body of a 1-row thr CTE reading from CTE `from`
    * (carrying `keyExpr`'s columns), deriving branch and cut from the
    * same integers. */
  def thresholdSql(from: String, valueCol: String, frac: String,
      tag: String, outName: String, keyExpr: String = "doc_id"): String =
    "SELECT " + caseSql(from, valueCol, frac, tag, outName, keyExpr)

  /** Oracle twin of [[thresholdsDf]] — one CASE column per fraction,
    * each deriving the identical branch and cut. */
  def thresholdsSql(from: String, valueCol: String, fracs: Seq[String],
      outNames: Seq[String], tag: String,
      keyExpr: String = "doc_id"): String = {
    require(fracs.nonEmpty && fracs.size == outNames.size)
    "SELECT " + fracs.zip(outNames).map { case (f, o) =>
      caseSql(from, valueCol, f, tag, o, keyExpr)
    }.mkString(",\n  ")
  }
}
