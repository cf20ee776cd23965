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

  /** Order-independent sum: exact decimal accumulation, double result. */
  def dsum(c: Column, scale: Int = 2): Column = sum(dec(c, scale)).cast("double")

  /** Deterministic mean over non-null values (pair with COUNT(*) oracles
    * only when the column is non-nullable). */
  def davg(c: Column, scale: Int = 2): Column = dsum(c, scale) / count(lit(1))

  /** Deterministic sample stddev: sqrt((Σx² − (Σx)²/n) / (n−1)) where both
    * sums are exact decimal. Matches PG/DuckDB stddev_samp semantics. */
  def dstddev(c: Column, scale: Int = 2): Column = {
    val n = count(lit(1)).cast("double")
    val s = sum(dec(c, scale)).cast("double")
    val sq = sum(dec(c, scale) * dec(c, scale)).cast("double")
    sqrt((sq - (s * s) / n) / (n - lit(1.0)))
  }

  /** Oracle SQL fragments mirroring the above bit-for-bit. */
  def dsumSql(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE)"
  def davgSql(x: String, scale: Int = 2): String =
    s"(${dsumSql(x, scale)} / COUNT(*))"
  def dstddevSql(x: String, scale: Int = 2): String = {
    val s = dsumSql(x, scale)
    val sq = s"CAST(SUM(CAST($x AS DECIMAL(18,$scale)) * CAST($x AS DECIMAL(18,$scale))) AS DOUBLE)"
    s"sqrt(($sq - ($s * $s) / CAST(COUNT(*) AS DOUBLE)) / (CAST(COUNT(*) AS DOUBLE) - 1.0))"
  }
}
