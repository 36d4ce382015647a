package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column (canonical composition —
  * `e` + COMBINING ACUTE → `é`): the first step of every training-corpus
  * text hygiene pass, so byte-level dedup/fingerprinting can't split on
  * encoding variants of the same text. Pure per-row work via the JDK's
  * `java.text.Normalizer` (the same Unicode NFC the oracle engine's
  * `nfc_normalize` implements). Spark has no built-in normalizer, hence
  * the custom expression.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    // ASCII fast path on the raw bytes: all-ASCII is NFC by construction,
    // so the dominant corpus case returns the input with ZERO allocation
    // (no String copy, no Normalizer scan).
    if (u.isFullAscii) return input
    val s = u.toString
    // Composed-but-non-ASCII fast path: isNormalized is a scan with no
    // allocation beyond the String copy above.
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}
