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
  * OperatorsSpec/SketchExpressionsSpec cross-validate the two bit-for-bit.
  *
  * Hashing is ENGINE-PORTABLE by construction: the row hash is the first
  * 60 bits (15 hex nibbles) of standard MD5 over the UTF-8 bytes —
  * `('0x' || substr(md5(s), 1, 15))::BIGINT` in any SQL engine — and the
  * MinHash permutations are affine maps over the Mersenne prime 2^31-1 in
  * exact 64-bit integer arithmetic. That makes every sketch, band key, and
  * candidate pair reproducible bit-for-bit in DuckDB, which is what gives
  * q28/q29/q30 exact SQL oracles (the previous XXH64 seed-42 hashing was
  * Spark-private, leaving those queries rows-only checks).
  */
object SketchUtil {

  /** Modulus of the MinHash permutation family: the Mersenne prime 2^31-1.
    * Keeps every affine product below 2^62 — exact in 64-bit integers in
    * any engine. */
  final val MinhashP: Long = 2147483647L

  /** SimHash width: 60 bits — what one MD5-derived lane carries. Bands for
    * blocking are 4 × 15 bits. */
  final val SimhashBits: Int = 60

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of MD5 (15 hex nibbles, big-endian) as a non-negative
    * long — the engine-portable row hash. */
  def h60(bytes: Array[Byte]): Long = {
    val dg = md.get()
    dg.reset()
    val h = dg.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >>> 4)
  }

  def h60(s: UTF8String): Long = h60(s.getBytes)

  /** MinHash permutation p as an affine map (a·h + b) mod P; constants are
    * classic LCG multipliers reduced mod P (all non-zero for p < 2^20 —
    * asserted in SketchExpressionsSpec for the used range). */
  @inline def laneA(p: Int): Long = (1103515245L * (p + 1) + 12345L) % MinhashP
  @inline def laneB(p: Int): Long = (69069L * (p + 1) + 1L) % MinhashP

  /** 60-bit SimHash over weight-1 token occurrences: each occurrence votes
    * ±1 per bit of its hash; the sign vector is the sketch. Identical to
    * SimhashAgg over (graft_h60(token), count) pairs — votes add linearly,
    * so per-occurrence weight 1 ≡ per-distinct-token weight count. Null
    * tokens are skipped. */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](SimhashBits)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        val th = h60(tokens.getUTF8String(j))
        var i = 0
        while (i < SimhashBits) {
          if (((th >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var h = 0L
    var i = 0
    while (i < SimhashBits) { if (counts(i) > 0) h |= (1L << i); i += 1 }
    h
  }

  /** MinHash signature over `shingleLen`-token shingles: the shingle STRING
    * (tokens joined by one space — exactly the strings q27's shingle sets
    * hold) is MD5-hashed once, reduced mod P, and each permutation tracks
    * the min of its affine image. Min over occurrences ≡ min over the
    * distinct-shingle set, so no dedup pass is needed. Returns null when
    * the document is shorter than one shingle. */
  def minhash(tokens: ArrayData, shingleLen: Int, numPerms: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < shingleLen) return null
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var s = 0
    while (s + shingleLen <= n) {
      sb.setLength(0)
      var t = 0
      while (t < shingleLen) {
        if (t > 0) sb.append(' ')
        if (!tokens.isNullAt(s + t)) sb.append(tokens.getUTF8String(s + t).toString)
        t += 1
      }
      val hm = h60(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)) % MinhashP
      var p = 0
      while (p < numPerms) {
        val l = (laneA(p) * hm + laneB(p)) % MinhashP
        if (l < mins(p)) mins(p) = l
        p += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}

/** graft_h60(string) → long: the portable 60-bit MD5 row hash itself —
  * lets column-level formulations (and specs) reproduce exactly what the
  * sketch expressions hash internally. */
case class H60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h60"

  override def nullSafeEval(a: Any): Any =
    SketchUtil.h60(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchUtil.h60($a);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** graft_simhash(array<string>) → long (60-bit). */
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
  * (null for documents shorter than one shingle; lane values in [0, 2^31-1)). */
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
