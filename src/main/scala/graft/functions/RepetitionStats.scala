package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram multiplicity statistics of a text column in ONE expression
  * eval: `struct(total, n_distinct, max_count)` where `total` is the number
  * of n-grams (token windows), `n_distinct` the distinct ones, and
  * `max_count` the multiplicity of the most-repeated n-gram.
  *
  * These are the raw counts behind the published repetition-based quality
  * filters for pretraining corpora (the "duplicate n-gram fraction" /
  * "top n-gram fraction" family of rules): dup-frac = 1 − n_distinct/total,
  * top-frac = max_count/total. Tokenization matches [[TextShingles]] and
  * the Spark builtins exactly (`lower` via UTF8String.toLowerCase, split on
  * `\s+`, empty tokens dropped), so DuckDB oracles built on the same
  * tokenizer agree bit-for-bit.
  *
  * Like TextShingles this is one interpreted call per DOCUMENT with a tight
  * counting loop inside — the composable higher-order-function form runs
  * interpreted per GRAM and allocates a slice + joined string per gram.
  * Documents with fewer than n tokens yield (0, 0, 0). Pure per-row work:
  * shuffle-free, linear, scan-bound at any corpus size.
  */
case class RepetitionStats(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repetition_stats needs a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_count", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val raw = RepetitionStats.Whitespace.split(s, -1)
    val toks = new Array[String](raw.length)
    var m = 0
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { toks(m) = raw(i); m += 1 }
      i += 1
    }
    if (m < n) return InternalRow(0L, 0L, 0L)
    val total = m - n + 1
    val counts = new java.util.HashMap[String, Int](total * 2)
    val sb = new java.lang.StringBuilder(64)
    var maxCount = 0
    i = 0
    while (i + n <= m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > maxCount) maxCount = c
      i += 1
    }
    InternalRow(total.toLong, counts.size.toLong, maxCount.toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  private val Whitespace = Pattern.compile("\\s+")
}
