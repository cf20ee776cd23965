package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values distinct-count sketch as a typed `Aggregator` — the
  * custom-aggregate surface (SURVEY §7.3 stretch goal). Deterministic
  * (xxhash-free: splitmix64 of the input), mergeable, fixed 8·k bytes of
  * state per group regardless of cardinality — the property that matters at
  * 100 TB where exact countDistinct shuffles every distinct value.
  *
  * Estimate: (k−1) · 2^64 / kth-minimum (standard KMV estimator); exact
  * below k distinct values. Relative error ≈ 1/√(k−2) (~6% at k=256).
  * Spark's built-in approx_count_distinct (HLL++) remains the default; this
  * demonstrates the Aggregator machinery with a deterministic alternative.
  */
class KmvDistinct(k: Int = 256) extends Aggregator[Long, Array[Long], Long] {

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  // buffer: sorted array (ascending, unsigned) of ≤ k minimum hashes
  override def zero: Array[Long] = Array.empty[Long]

  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    val cmp = java.lang.Long.compareUnsigned _
    if (buf.length >= k && cmp(h, buf(buf.length - 1)) >= 0) return buf
    val idx = {
      var lo = 0; var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cmp(buf(mid), h) < 0) lo = mid + 1 else hi = mid
      }
      lo
    }
    if (idx < buf.length && buf(idx) == h) return buf // already present
    val out = new Array[Long](math.min(buf.length + 1, k))
    System.arraycopy(buf, 0, out, 0, idx)
    out(idx) = h
    System.arraycopy(buf, idx, out, idx + 1, out.length - idx - 1)
    out
  }

  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    insert(buf, splitmix64(v))

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Long]): Long =
    if (buf.length < k) buf.length.toLong
    else {
      // kth minimum as an unsigned fraction of the 2^64 hash space
      val kth = buf(k - 1)
      val twoTo64 = 1.8446744073709552e19
      val unsignedKth = if (kth >= 0) kth.toDouble else kth.toDouble + twoTo64
      math.round((k - 1) / (unsignedKth / twoTo64))
    }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object KmvDistinct {
  /** Column form usable in DataFrame aggs: kmv_distinct(col). */
  def apply(c: Column, k: Int = 256): Column = udaf(new KmvDistinct(k)).apply(c)
}
