package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text column's token multiset in ONE per-row eval.
  *
  * Bit-identical to the relational formulation it replaces —
  * `explode(tokens) → xxhash64(tok) → 64 ±1-vote sums per doc → bit i set
  * iff sum_i > 0` — but with no explode, no 64-column aggregate, and no
  * shuffle: the votes accumulate in a local int[64] inside one expression
  * call per document. The token hash is Spark's own XxHash64Function with
  * the builtin `xxhash64(...)` default seed (42), so sketch values equal the
  * old plan's bit for bit. Tokenization matches `filter(split(lower(text),
  * "\\s+"), _ != "")` exactly (every occurrence votes — multiset, not set).
  *
  * A document with zero tokens hashes to 0L (no votes); callers that want
  * the old explode semantics (tokenless docs absent) filter on token count.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val raw = SimHash64.Whitespace.split(s, -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) {
        val h = XxHash64Function.hash(
          UTF8String.fromString(raw(i)), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  private val Whitespace = Pattern.compile("\\s+")
}
