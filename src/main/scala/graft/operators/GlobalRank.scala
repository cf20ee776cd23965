package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global row numbers / running sums WITHOUT a single-partition
  * window.
  *
  * `row_number() OVER (ORDER BY k)` funnels the whole table through ONE
  * partition — fine at sf0.1, fatal at 100 TB (the executor holding the
  * partition becomes the job). The scale-safe construction here is the
  * classic two-pass global rank:
  *
  *  1. one sampling pass computes B-1 approximate percentile boundaries of
  *     the ranking key (the same move `repartitionByRange` makes internally,
  *     and the only driver-side state is the B-1 boundary values — the
  *     data-independent analog of RangePartitioner's collected sample);
  *  2. each row gets a bucket id row-locally: the count of boundaries
  *     strictly before its key in sort direction — equal keys can never
  *     straddle a bucket, so buckets are contiguous runs of the global
  *     order;
  *  3. per-bucket counts (and optional sums) aggregate in one partial+final
  *     hash agg — B rows — and per-bucket OFFSETS come from a triangular
  *     self-join over those B rows (no window of any kind);
  *  4. the only wide shuffle is the per-bucket window: `row_number()`
  *     partitioned BY BUCKET, plus the broadcast offset → global rank.
  *
  * Exactness does not depend on the percentile sketch: any boundary set
  * yields correct ranks (boundaries only balance the buckets). Skew limit:
  * a single key value repeated n times still lands in one bucket — inherent
  * to ranking (those rows are order-ties); all OTHER keys stay spread.
  *
  * Null keys are total: they take a dedicated edge bucket matching Spark's
  * default null ordering (NULLS FIRST ascending, NULLS LAST descending),
  * so ranks agree with the naive `ORDER BY key` window on nullable keys.
  */
object GlobalRank {

  /** Standard SQL NTILE computed arithmetically from a global rank: with
    * n rows and b buckets, the first n % b buckets take one extra row.
    * Pure integer `div` arithmetic — bit-identical to the window builtin
    * in any engine. `rnCol`/`nCol` name columns produced by [[withRank]]
    * and a count agg. */
  def ntileFromRank(b: Int, rnCol: String = "rn", nCol: String = "n"): Column =
    expr(
      s"""CASE WHEN $rnCol <= ($nCol div $b + 1) * ($nCol % $b)
         |     THEN ($rnCol - 1) div ($nCol div $b + 1) + 1
         |     ELSE $nCol % $b + ($rnCol - ($nCol % $b) * ($nCol div $b + 1) - 1) div ($nCol div $b) + 1
         |END""".stripMargin)

  /** Adds a 1-based contiguous global row number `rnName` (BIGINT) ordered
    * by (key ± , tieBreakers...), and optionally the running sum of a
    * column in that order (`prefixSum = Some((col, cumName))`, exact for
    * decimal inputs). `buckets` bounds the boundary count; parallelism of
    * the wide stage is min(buckets, distinct keys).
    *
    * Evaluation contract: `df` is evaluated up to three times (boundary
    * sampling, bucket counts, the ranked output). Cheap scan/projection
    * inputs should be passed as-is — re-scanning parquet beats
    * materializing it — but localCheckpoint anything with an expensive
    * upstream (joins, aggregations) first, or that work runs thrice. */
  def withRank(df: DataFrame, key: Column, descending: Boolean,
      tieBreakers: Seq[Column], rnName: String,
      prefixSum: Option[(Column, String)] = None,
      buckets: Int = 32,
      totalName: Option[String] = None): DataFrame = {
    require(buckets >= 2,
      s"GlobalRank needs at least 2 buckets (got $buckets) — with 1 the " +
        "construction degenerates to the single-partition window it replaces")
    val keyed = df.withColumn("__grk", key)
    // Pass 1: boundary values. approx_percentile never invents values, so
    // boundaries are real key values; duplicates just leave buckets empty.
    val fracs = (1 until buckets).map(i => s"${i.toDouble / buckets}").mkString(",")
    val bRow = keyed.agg(
      expr(s"approx_percentile(__grk, array($fracs), 10000)").as("bs")).head()
    val bounds: Seq[Any] =
      if (bRow.isNullAt(0)) Seq.empty else bRow.getSeq[Any](0)
    // Null keys: the percentile sketch never sees them; route them to the
    // edge bucket on the side Spark's default null ordering puts them
    // (NULLS FIRST asc → before bucket 0; NULLS LAST desc → after the last).
    val nullBucket = if (descending) buckets else -1
    val bucketCol =
      if (bounds.isEmpty) when(col("__grk").isNull, nullBucket).otherwise(0)
      else {
        val arr = array(bounds.map(lit): _*)
        when(col("__grk").isNull, nullBucket).otherwise(
          size(filter(arr, b => if (descending) b > col("__grk") else b < col("__grk"))))
      }
    val withB = keyed.withColumn("__gb", bucketCol)
    // Pass 2: per-bucket counts/sums (B rows) → offsets via triangular join.
    val perAggs = count(lit(1)).as("__cnt") +:
      prefixSum.map { case (c, _) => sum(c).as("__ps") }.toSeq
    val per = withB.groupBy("__gb").agg(perAggs.head, perAggs.tail: _*)
    val pa = per.select(
      col("__gb").as("__ab") +: col("__cnt").as("__acnt") +:
        prefixSum.map(_ => col("__ps").as("__aps")).toSeq: _*)
    val pb = per.select(
      col("__gb").as("__bb") +: col("__cnt").as("__bcnt") +:
        prefixSum.map(_ => col("__ps").as("__bps")).toSeq: _*)
    val offAggs = coalesce(sum("__bcnt"), lit(0L)).as("__offcnt") +:
      prefixSum.map(_ => coalesce(sum("__bps"), lit(0)).as("__offps")).toSeq
    val offs = pa.join(pb, col("__bb") < col("__ab"), "left")
      .groupBy(col("__ab").as("__gb"))
      .agg(offAggs.head, offAggs.tail: _*)
    // Pass 3: the one wide shuffle — window partitioned by bucket.
    // `totalName` rides along for free: the per-bucket counts already
    // exist, so n = their sum — callers needing NTILE/percent formulas
    // skip a whole extra scan-and-count of the input.
    val order = (if (descending) col("__grk").desc else col("__grk").asc) +: tieBreakers
    val w = Window.partitionBy(col("__gb")).orderBy(order: _*)
    val offsTot = totalName.fold(offs)(tn =>
      offs.crossJoin(broadcast(per.agg(sum("__cnt").as(tn)))))
    val ranked = withB.join(broadcast(offsTot), "__gb")
      .withColumn(rnName, col("__offcnt") + row_number().over(w))
    prefixSum
      .fold(ranked) { case (c, cumName) =>
        ranked.withColumn(cumName, col("__offps") +
          sum(c).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      }
      .drop("__gb", "__grk", "__offcnt", "__offps")
  }
}
