package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB joins/aggregations. AQE's skew-join
  * splitting handles most cases at runtime; explicit salting is the
  * deterministic fallback when one key dominates (e.g. a null-ish default
  * key holding 10% of a fact table).
  */
object Skew {

  /** Salted equi-join: the skewed (big) side gets a random-but-deterministic
    * salt derived from row identity; the small side is exploded across all
    * salt values. Shuffle keys become (key, salt) — the hot key spreads over
    * `saltBuckets` reducers. Use when one side is big+skewed and the other
    * is small enough to replicate `saltBuckets`×. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int, saltSource: Column): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(saltSource), lit(saltBuckets)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * then final aggregate on key. For algebraic aggregates (sum/count/min/
    * max) this is semantics-preserving and bounds any single reducer's
    * input to ~1/saltBuckets of the hot key. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int, saltSource: Column): DataFrame = {
    df.withColumn("__salt", pmod(hash(saltSource), lit(saltBuckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }
}
