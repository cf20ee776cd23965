package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-normalization helpers shared by the interpreted and codegen paths
  * (generated Java calls these as statics, the SketchUtil pattern). */
object TextUtil {

  /** Unicode NFC via the JDK's Normalizer (ICU-grade, Unicode-standard
    * canonical composition — the same algorithm DuckDB's utf8proc
    * `nfc_normalize` implements, so oracle parity holds for assigned
    * codepoints).
    *
    * PARITY BOUNDARY (attributable by design): the JDK and utf8proc track
    * DIFFERENT Unicode versions, so a codepoint assigned combining
    * properties in one table but not the other normalizes differently —
    * an engine-version gap, not an operator bug. The fuzz corpus
    * (tools/fuzz_corpus.py) therefore pins its alphabet to Unicode-1.x-era
    * codepoints assigned in both tables; a q175 oracle-hash mismatch on
    * OTHER input should be triaged against this note first (compare
    * `java.text.Normalizer` vs `nfc_normalize` on the offending string
    * before suspecting the expression).
    *
    * Already-normalized strings — the overwhelmingly common
    * case; all of ASCII trivially — return the INPUT UTF8String: the
    * `isNormalized` quick-check touches no allocation on that path. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `graft_nfc(string)` — Unicode canonical composition (NFC).
  *
  * Unicode-equal-but-byte-different text (decomposed `e`+U+0301 vs
  * precomposed `é`) defeats every byte-keyed operator in the engine —
  * exact dedup (q26), line dedup (q98), URL canonicalization (q164) all
  * key on md5 of the raw bytes. A cleaning pipeline therefore normalizes
  * BEFORE hashing; this expression is that step, codegen'd so it rides
  * inside the scan's projection span like the rest of the row-local
  * normalize chain (lower/trim/regexp_replace).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(a: Any): Any = TextUtil.nfc(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
