package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic numeric aggregation helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL. Plain `SUM(double)` is order-dependent in the last ulps, so
  * every money/measure sum goes through an exact decimal cast (commutative,
  * engine-independent) and is cast back to double at the end — the resulting
  * bits are identical in Spark and DuckDB. Averages divide that exact sum by
  * the count with one IEEE division, which is also bit-identical.
  *
  * Oracle-side twins (DuckDB):
  *   dsum:  CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)
  *   davg:  CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(*)
  *   dstd:  sample stddev from exact decimal sum + sum-of-squares
  */
object Num {
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  /** Exact decimal → double through a STRING bridge. A direct decimal cast
    * is NOT portable once the exact value exceeds 53 significand bits:
    * Java's BigDecimal.doubleValue and DuckDB's int128/pow10 conversion can
    * disagree in the last ulp (observed at sf0.1 on q01's 150k-term product
    * sum and q13's sum of squares). Both engines' string→double parses are
    * correctly rounded, so text is the engine-independent path. */
  def d2d(c: Column): Column = c.cast("string").cast("double")
  def d2dSql(x: String): String = s"CAST(CAST($x AS VARCHAR) AS DOUBLE)"

  /** Order-independent sum: exact decimal accumulation, double result. */
  def dsum(c: Column, scale: Int = 2): Column = d2d(sum(dec(c, scale)))

  /** Deterministic mean over non-null values (pair with COUNT(*) oracles
    * only when the column is non-nullable). */
  def davg(c: Column, scale: Int = 2): Column = dsum(c, scale) / count(lit(1))

  /** Deterministic sample stddev: sqrt((Σx² − (Σx)²/n) / (n−1)) where both
    * sums are exact decimal. Matches PG/DuckDB stddev_samp semantics. */
  def dstddev(c: Column, scale: Int = 2): Column = {
    val n = count(lit(1)).cast("double")
    val s = d2d(sum(dec(c, scale)))
    val sq = d2d(sum(dec(c, scale) * dec(c, scale)))
    sqrt((sq - (s * s) / n) / (n - lit(1.0)))
  }

  /** Oracle SQL fragments mirroring the above bit-for-bit. */
  def dsumSql(x: String, scale: Int = 2): String =
    d2dSql(s"SUM(CAST($x AS DECIMAL(18,$scale)))")
  def davgSql(x: String, scale: Int = 2): String =
    s"(${dsumSql(x, scale)} / COUNT(*))"
  def dstddevSql(x: String, scale: Int = 2): String = {
    val s = dsumSql(x, scale)
    val sq = d2dSql(s"SUM(CAST($x AS DECIMAL(18,$scale)) * CAST($x AS DECIMAL(18,$scale)))")
    s"sqrt(($sq - ($s * $s) / CAST(COUNT(*) AS DOUBLE)) / (CAST(COUNT(*) AS DOUBLE) - 1.0))"
  }
}
