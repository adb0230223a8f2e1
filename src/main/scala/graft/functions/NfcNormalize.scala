package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(s)`: Unicode NFC (canonical composition) normalization
  * of a string, as a native Catalyst expression with whole-stage codegen.
  *
  * Why it exists: a multi-source text corpus mixes composed ("é",
  * U+00E9) and decomposed ("e" + U+0301) spellings of the same grapheme.
  * Every downstream content-keyed operator — exact dedup (q23's
  * md5-fingerprint), MinHash shingles (q24), token statistics (q91–q93) —
  * treats those byte sequences as DIFFERENT documents/tokens unless the
  * corpus is canonicalized first, so normalization is the first map of a
  * text-cleaning stage at any scale. Spark has no built-in for it (the
  * usual fallback is a Scala UDF, which is an eval black box to codegen
  * and the optimizer); this is the codegen'd native form, a pure
  * per-row projection with no exchange.
  *
  * Semantics (pinned): `java.text.Normalizer.normalize(s, NFC)` —
  * Unicode canonical decomposition followed by canonical composition.
  * NULL input -> NULL (null-intolerant). Already-normalized strings pass
  * through unchanged (NFC is idempotent). The oracle counterpart is
  * DuckDB's `nfc_normalize`, which implements the same Unicode algorithm
  * (utf8proc), so q100 can hash-compare normalized output across engines.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    // fast path: Normalizer.isNormalized is a scan without allocation —
    // the common (already-NFC, e.g. pure-ASCII) row skips the rewrite
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      s"""
        java.lang.String $str = $c.toString();
        if (java.text.Normalizer.isNormalized($str,
            java.text.Normalizer.Form.NFC)) {
          ${ev.value} = $c;
        } else {
          ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
            java.text.Normalizer.normalize($str,
              java.text.Normalizer.Form.NFC));
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
