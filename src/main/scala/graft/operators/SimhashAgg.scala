package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** 64-bit SimHash as a typed Aggregator over (tokenHash, weight) pairs:
  * buffer = 64 signed counters; each token adds ±weight per bit; the sign
  * vector at the end is the sketch. One aggregation pass per document —
  * replaces the explode-64-rows-per-token formulation (a 64× shuffle-row
  * amplification at 100 TB) with fixed 512-byte state per group.
  */
class SimhashAgg extends Aggregator[(Long, Long), Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val (th, cnt) = in
    var i = 0
    while (i < 64) {
      buf(i) += (if (((th >>> i) & 1L) == 1L) cnt else -cnt)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var h = 0L
    var i = 0
    while (i < 64) { if (buf(i) > 0) h |= (1L << i); i += 1 }
    h
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object SimhashAgg {
  /** simhash(tokenHashCol, weightCol) aggregate column. */
  def apply(tokenHash: Column, weight: Column): Column =
    udaf(new SimhashAgg()).apply(tokenHash, weight)
}
