package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom filter over a long key column — the explicit form of
  * the runtime-filter join pruning Spark's InjectRuntimeFilter applies
  * under AQE (its BloomFilterAggregate is internal, not a public
  * function). Built as a typed Aggregator: per-partition bitmaps OR-merge
  * (order-independent, fixed 8·numWords bytes of state), so the build is
  * one partial-aggregating pass over the build side; the tiny bitmap then
  * broadcasts to the probe side where membership is tested with codegen'd
  * bit arithmetic (element_at / shiftright / bitwise-and — no UDF on the
  * probe path, which is the side that is large at scale).
  *
  * Hash parity with SQL: bit j of key uses Spark's own multi-argument
  * xxhash64 fold — hashLong(j, hashLong(key, 42)) — so the probe predicate
  * can be written as the plain SQL `xxhash64(key, CAST(j AS BIGINT))` and
  * provably tests the same bits the builder set.
  *
  * False positives only pass more rows to the exact join behind the
  * filter; results never change (q74's oracle is the plain semi join).
  */
final class BloomAgg(numWords: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](numWords)

  override def reduce(b: Array[Long], key: Long): Array[Long] = {
    BloomFilter.set(b, key, numHashes)
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomFilter {

  /** Spark's multi-arg xxhash64 fold for (key, j): seed 42, LongType legs. */
  private[operators] def hash(key: Long, j: Int): Long =
    XXH64.hashLong(j.toLong, XXH64.hashLong(key, 42L))

  private[operators] def set(b: Array[Long], key: Long, numHashes: Int): Unit = {
    val mBits = b.length.toLong * 64
    var j = 0
    while (j < numHashes) {
      val idx = java.lang.Math.floorMod(hash(key, j), mBits)
      b((idx / 64).toInt) |= 1L << (idx % 64)
      j += 1
    }
  }

  /** Scala-side membership test (spec cross-validation). */
  private[graft] def contains(b: Array[Long], key: Long, numHashes: Int): Boolean = {
    val mBits = b.length.toLong * 64
    (0 until numHashes).forall { j =>
      val idx = java.lang.Math.floorMod(hash(key, j), mBits)
      (b((idx / 64).toInt) >>> (idx % 64) & 1L) == 1L
    }
  }

  /** Aggregate `keyCol` (bigint) into a bitmap column of `numWords` longs. */
  def agg(keyCol: Column, numWords: Int = 1024, numHashes: Int = 3): Column =
    udaf(new BloomAgg(numWords, numHashes)).apply(keyCol)

  /** Membership predicate over a bitmap column `bm` for `key` — pure
    * codegen'd column arithmetic mirroring [[set]] bit for bit. */
  def mightContain(bm: Column, key: Column, numWords: Int = 1024,
      numHashes: Int = 3): Column = {
    val mBits = numWords.toLong * 64
    (0 until numHashes).map { j =>
      val idx = pmod(xxhash64(key, lit(j.toLong)), lit(mBits))
      // call_function: the Scala shiftright() overload only takes a
      // literal shift amount; the SQL expression accepts a column.
      (call_function("shiftright",
        element_at(bm, (idx / 64).cast("int") + 1), (idx % 64).cast("int"))
        .bitwiseAND(lit(1L))) === lit(1L)
    }.reduce(_ && _)
  }

  /** Bloom-pruned left-semi join on long keys: build a bitmap from
    * `build(buildKey)`, broadcast it, pre-filter `probe` rows failing the
    * membership test, then run the EXACT semi join on the survivors —
    * identical results to a plain semi join, with the probe-side shuffle
    * carrying only rows that might match. */
  def semiJoin(probe: DataFrame, probeKey: String, build: DataFrame,
      buildKey: String, numWords: Int = 1024, numHashes: Int = 3): DataFrame = {
    val bm = build.agg(agg(col(buildKey), numWords, numHashes).as("bm"))
    val pruned = graft.Scalars.withScalar(probe, bm)
      .filter(mightContain(col("bm"), col(probeKey), numWords, numHashes))
      .drop("bm")
    pruned.join(build.select(col(buildKey).as(probeKey)), Seq(probeKey), "left_semi")
  }
}
