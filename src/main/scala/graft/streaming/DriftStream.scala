package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor — the ingest-side arm of q201's
  * PSI snapshot check: a FROZEN reference histogram (the last blessed
  * corpus's token-length distribution over q201's 8 log-spaced bins) is
  * compared against every arriving 1-hour window, and a window whose
  * Population Stability Index exceeds the alert threshold pages before
  * the next batch curation run would ever see the shift (a crawler
  * template change, a single-source flood, a truncation bug upstream).
  *
  * Shapes: the bin id is ROW-LOCAL (the q201 expression verbatim), so
  * streaming state is only the (window, bin) counters — 8 rows per hour,
  * nothing corpus-proportional; the PSI itself is computed by
  * [[psiCard]], a BATCH transform over emitted counters that runs
  * identically on the stream's sink table and on the batch twin (the
  * DocStream discipline — stream ≡ batch by shared function, proven in
  * DriftStreamSpec). The reference side joins by bin (8 rows, broadcast);
  * Laplace-smoothed ln arguments stay positive integers so
  * [[graft.queries.LmOps.PortableLn]] carries exactness (the q201
  * overflow note applies: c·T < 2^63 before the DECIMAL promotion).
  *
  * At 100 TB/day: counters are map-side-combined 8-key aggregates per
  * window; the card's per-window fold touches 8 rows — the monitor's
  * cost is one pass over the INGEST, never over the corpus.
  */
object DriftStream {

  /** q201's 8 log-spaced token-length bins, verbatim — one expression
    * shared by the stream projection and the batch reference builder. */
  private val binCase =
    "CASE WHEN tk < 16 THEN 0 WHEN tk < 32 THEN 1 WHEN tk < 64 THEN 2" +
      " WHEN tk < 128 THEN 3 WHEN tk < 256 THEN 4 WHEN tk < 512 THEN 5" +
      " WHEN tk < 1024 THEN 6 ELSE 7 END"

  /** Row-local bin projection — identical on stream and batch (q201's
    * single-space token convention). */
  def binProjection(docs: DataFrame): DataFrame =
    docs
      .withColumn("tk",
        size(split(coalesce(col("text"), lit("")), " ")).cast("long"))
      .withColumn("bin", expr(binCase))

  /** The frozen reference: dense 8-row (bin, c1, t1) histogram of a
    * blessed corpus — the artifact a deployment persists once per
    * release and every monitor window reads. */
  def referenceBins(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = binProjection(docs)
      .groupBy(col("bin")).agg(count(lit(1)).as("c1"))
    val dense = (0 to 7).toDF("bin")
      .join(counts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("c1"), lit(0L)).as("c1"))
    graft.Scalars.withScalar(dense, dense.agg(sum(col("c1")).as("t1")))
  }

  /** Stream-safe windowed bin counters (1-hour tumbling windows, 2-hour
    * watermark — late rows beyond it are dropped, the DocStream
    * horizon). 8 live keys per window. */
  def counters(docs: DataFrame): DataFrame =
    binProjection(docs)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour_start"), col("bin"), col("n"))

  /** Per-window PSI against the reference: densify each window to all 8
    * bins (literal side — plan-time bounded), Laplace-smooth both
    * distributions, and fold the 8 terms in bin order (PSI =
    * Σ (p1 − p2)·ln(p1/p2), alert above `threshold` — 0.2 is the
    * industry "major shift" line q201 documents). A batch transform:
    * run it over the monitor's sink table or over the batch twin —
    * same rows either way. */
  def psiCard(counters: DataFrame, ref: DataFrame,
      threshold: Double = 0.2): DataFrame = {
    val spark = counters.sparkSession
    import spark.implicits._
    // counters are (windows × ≤8 bins) — bounded by construction; the
    // snapshot both caps the double scan and de-conflicts the self-join
    // lineage when the input is a streaming memory-sink view.
    val base = counters.localCheckpoint(true)
    val wins = base.groupBy(col("hour_start"))
      .agg(sum(col("n")).as("t2"))
    val dense = wins
      .crossJoin(broadcast((0 to 7).toDF("bin")))
      .join(base, Seq("hour_start", "bin"), "left")
      .select(col("hour_start"), col("bin"), col("t2"),
        coalesce(col("n"), lit(0L)).as("c2"))
      .join(broadcast(ref), Seq("bin"))
    val staged =
      (graft.queries.LmOps.PortableLn.steps("((c1 + 1) * (t2 + 8))", "pa", spark = true) ++
        graft.queries.LmOps.PortableLn.steps("((c2 + 1) * (t1 + 8))", "pb", spark = true))
        .foldLeft(dense) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
        .withColumn("p1", expr("cast(c1 + 1 as double) / cast(t1 + 8 as double)"))
        .withColumn("p2", expr("cast(c2 + 1 as double) / cast(t2 + 8 as double)"))
        .withColumn("term", expr("(p1 - p2) * (lnpa - lnpb)"))
    staged.groupBy(col("hour_start"))
      .agg(expr("aggregate(array_sort(collect_list(struct(bin, term)))," +
          " cast(0 as double), (a, x) -> a + x.term)").as("psi"),
        max(col("t2")).as("n_docs"))
      .withColumn("major_drift", col("psi") > lit(threshold))
      .select(col("hour_start"), col("n_docs"), col("psi"), col("major_drift"))
  }

  /** The page: drifted windows with a support floor (a 3-doc hour's PSI
    * is sampling noise, not a shifted crawler). */
  def alerts(card: DataFrame, minDocs: Long = 20L): DataFrame =
    card.filter(col("major_drift") && col("n_docs") >= minDocs)
}
