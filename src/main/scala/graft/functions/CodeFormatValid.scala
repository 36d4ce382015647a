package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Code-format validity (P6's allowlist of per-type code shapes) as ONE
  * boolean expression.
  *
  * Written as the composable `(ct === "CPT" && code.rlike(...)) || ...`
  * OR-chain, the optimizer pushes the filter through the cleaning projects
  * and INLINES the aliased `code`/`code type` chains once per reference —
  * 14 re-evaluations of the upstream per-column pipeline per row (measured:
  * a 19 kB filter condition costing ~4.5 s of every clean-family query at
  * sf0.1). As a single expression the chains are substituted exactly once,
  * and the type-dispatched pattern (precompiled, same Java regex engine and
  * find() semantics as RLIKE) runs once per row.
  *
  * Inputs are the cleaner's computed columns (already 'nan'-coalesced and
  * uppercased), so nulls cannot occur; a null input yields null like any
  * binary expression, which a Filter treats as false — identical to the
  * OR-chain's three-valued logic.
  */
case class CodeFormatValid(code: Expression, codeType: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = code
  override def right: Expression = codeType

  override def checkInputDataTypes(): TypeCheckResult =
    if (code.dataType == StringType && codeType.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"code_format_valid needs (string, string), got " +
        s"(${code.dataType.catalogString}, ${codeType.dataType.catalogString})")
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(codeV: Any, ctV: Any): Any = {
    val code8 = codeV.asInstanceOf[UTF8String]
    CodeFormatValid.patternFor(ctV.asInstanceOf[UTF8String].toString) match {
      case null =>
        // numChars counts code points, matching Spark length() — the
        // OR-chain this replaced used length(), not UTF-16 units.
        val n = code8.numChars
        ctV.asInstanceOf[UTF8String].toString == "ICD" && n >= 3 && n <= 7
      case p => p.matcher(code8.toString).find()
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodeFormatValid =
    copy(code = newLeft, codeType = newRight)
  override def prettyName: String = "code_format_valid"
}

object CodeFormatValid {
  // Anchored patterns matched with find() — exactly RLIKE's semantics.
  private val Cpt = Pattern.compile("^\\d{5}$")
  private val HcpcsNum = Pattern.compile("^(\\d{5}|[A-V]\\d{4})$")
  private val Ndc = Pattern.compile("^\\d{10,11}$")
  private val Drg = Pattern.compile("^\\d{3}$")
  private val Cdt = Pattern.compile("^D\\d{4}$")
  private val Apc = Pattern.compile("^\\d{4}$")

  /** null ⇒ no regex rule for this type (ICD's length rule, or invalid). */
  private def patternFor(ct: String): Pattern = ct match {
    case "CPT" => Cpt
    case "HCPCS" => HcpcsNum
    case "NDC" => Ndc
    case "DRG" => Drg
    case "CDT" => Cdt
    case "APC" => Apc
    case _ => null
  }
}
