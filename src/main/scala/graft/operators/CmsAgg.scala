package graft.operators

import graft.functions.SketchUtil
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min Sketch as a typed Aggregator over pre-hashed token rows:
  * `depth` rows × `width` cells of occurrence counts; each input bumps one
  * cell per row; the estimate for a key is the MIN over its cells —
  * always ≥ the exact count, within eps·N of it with the classic CMS
  * bound. Fixed-size mergeable state (depth·width longs) per group means
  * frequency estimation over 100 TB of tokens is ONE pass with zero
  * shuffle on raw tokens — only the tiny sketch arrays merge.
  *
  * The cell index uses the SAME engine-portable family as MinHash
  * (SketchUtil.h60 mod P, affine lanes): cell(p, h) =
  * ((laneA(p)·(h mod P) + laneB(p)) mod P) mod width. Every cell count —
  * and therefore every estimate — is reproducible bit-for-bit in plain
  * SQL, which is what gives q83 an EXACT DuckDB oracle on the sketch's
  * output (most engines can only rows-check a sketch).
  */
class CmsAgg(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], h60: Long): Array[Long] = {
    // floorMod, not %: graft_h60 outputs are non-negative (identical cells
    // either way — oracle parity holds), but a caller feeding e.g. xxhash64
    // would get a negative remainder and an ArrayIndexOutOfBounds here.
    val hm = Math.floorMod(h60, SketchUtil.MinhashP)
    var p = 0
    while (p < depth) {
      val cell = ((SketchUtil.laneA(p) * hm + SketchUtil.laneB(p)) %
        SketchUtil.MinhashP % width).toInt
      buf(p * width + cell) += 1
      p += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CmsAgg {
  /** cms(h60Col) aggregate column over pre-hashed keys (graft_h60). */
  def apply(h60: Column, depth: Int = 4, width: Int = 1024): Column =
    udaf(new CmsAgg(depth, width)).apply(h60)

  /** Point-estimate lookup against a sketch array column: MIN over the
    * key's `depth` cells, as a pure column expression (1-based
    * element_at). */
  def estimate(cms: Column, h60: Column, depth: Int = 4, width: Int = 1024): Column = {
    import org.apache.spark.sql.functions._
    // pmod mirrors reduce's floorMod (≡ % for graft_h60's non-negative range).
    val hm = pmod(h60, lit(SketchUtil.MinhashP))
    (0 until depth).map { p =>
      val cell = (lit(SketchUtil.laneA(p)) * hm + lit(SketchUtil.laneB(p))) %
        SketchUtil.MinhashP % width
      element_at(cms, (cell + p * width + 1).cast("int"))
    }.reduce(least(_, _))
  }
}
