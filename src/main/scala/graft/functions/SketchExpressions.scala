package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row document sketching as native codegen expressions.
  *
  * Sketching a document (SimHash / MinHash) is a pure function of its token
  * array, so expressing it as an AGGREGATION (explode tokens → shuffle →
  * groupBy doc) moves |corpus tokens| rows through a shuffle for no reason.
  * As a scalar expression the sketch is computed in one pass inside the
  * scan's WholeStageCodegen span — zero shuffle, embarrassingly parallel,
  * exactly the shape that survives a 100 TB corpus. The aggregation form
  * (graft.operators.SimhashAgg) remains for pre-tokenized/weighted inputs;
  * OperatorsSpec cross-validates the two bit-for-bit.
  *
  * Token hashing reproduces Spark's `xxhash64(token)` (XXH64 over the
  * UTF-8 bytes, seed 42) so sketches agree with any column-level
  * formulation of the same definition.
  */
object SketchUtil {

  private final val XxSeed = 42L

  def tokenHash(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), XxSeed)

  /** 64-bit SimHash over weight-1 token occurrences: each occurrence votes
    * ±1 per bit of its hash; the sign vector is the sketch. Identical to
    * SimhashAgg over (xxhash64(token), count) pairs — votes add linearly, so
    * per-occurrence weight 1 ≡ per-distinct-token weight count. */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        val th = tokenHash(tokens.getUTF8String(j))
        var i = 0
        while (i < 64) {
          if (((th >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var h = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) h |= (1L << i); i += 1 }
    h
  }

  /** MinHash signature over `shingleLen`-token shingles: hash each token
    * once, chain-mix token hashes into a shingle hash, then track the min of
    * `numPerms` seeded re-mixes. Min over occurrences ≡ min over the
    * distinct-shingle set, so no dedup pass is needed. Returns null when the
    * document is shorter than one shingle. */
  def minhash(tokens: ArrayData, shingleLen: Int, numPerms: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < shingleLen) return null
    val tok = new Array[Long](n)
    var j = 0
    while (j < n) {
      tok(j) = if (tokens.isNullAt(j)) 0L else tokenHash(tokens.getUTF8String(j))
      j += 1
    }
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var s = 0
    while (s + shingleLen <= n) {
      var sh = tok(s)
      var t = 1
      while (t < shingleLen) { sh = XXH64.hashLong(tok(s + t), sh); t += 1 }
      var p = 0
      while (p < numPerms) {
        val h = XXH64.hashLong(sh, p.toLong)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}

/** graft_simhash(array<string>) → long. */
case class SimhashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(a: Any): Any =
    SketchUtil.simhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchUtil.simhash($a);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** graft_minhash(array<string>, shingleLen, numPerms) → array<long>
  * (null for documents shorter than one shingle). */
case class MinhashExpr(tokens: Expression, shingleLen: Expression, numPerms: Expression)
    extends TernaryExpression {

  override def first: Expression = tokens
  override def second: Expression = shingleLen
  override def third: Expression = numPerms

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, shingleLen.dataType, numPerms.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType)
          if shingleLen.foldable && numPerms.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int literal, int literal)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(t: Any, l: Any, p: Any): Any =
    SketchUtil.minhash(t.asInstanceOf[ArrayData],
      l.asInstanceOf[Int], p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, l, p) =>
      s"""
         |${ev.value} = graft.functions.SketchUtil.minhash($t, $l, $p);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(tokens = f, shingleLen = s, numPerms = t)
}
