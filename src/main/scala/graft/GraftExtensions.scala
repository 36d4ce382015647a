package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.enrich.{SequenceMatcherRatio, SequenceMatcherRatioAtLeast}
import graft.functions.{CodeFormatValid, CountMinAgg, JaroWinklerSim, NfcNormalize, RepetitionStats, SimHash64, TextShingles}
import graft.ops.{MinHashAgg, TopKAgg}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions — scalar and aggregate — for SQL users, so the
  * whole library surface is reachable from `spark.sql(...)` without
  * touching the Scala API.
  *
  * Usage:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * or config: spark.sql.extensions=graft.GraftExtensions
  * Then: spark.sql("SELECT seq_ratio('grady_memorial', 'grady_memoral')")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, (cls, builder)) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        builder))
    }
}

object GraftExtensions {

  /** Integer literal argument (SQL `5` parses as Int, but be liberal). */
  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  private def litDouble(e: Expression, what: String): Double = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$what must be a numeric literal, got $other")
    }
  }

  private def litBoolean(e: Expression, what: String): Boolean = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case b: Boolean => b
      case other => throw new IllegalArgumentException(
        s"$what must be a boolean literal, got $other")
    }
  }

  private def arity(children: Seq[Expression], name: String, ns: Int*): Unit =
    require(ns.contains(children.size),
      s"$name takes ${ns.mkString(" or ")} arguments, got ${children.size}")

  private[graft] val seqRatioBuilder: Seq[Expression] => Expression = { c =>
    arity(c, "seq_ratio(a, b)", 2)
    SequenceMatcherRatio(c.head, c(1))
  }

  /** name -> (expression class for ExpressionInfo, builder). Aggregates
    * return the bare AggregateFunction — the analyzer wraps it in an
    * AggregateExpression exactly as for built-in aggregates. */
  private[graft] val builders: Seq[(String, (Class[_], Seq[Expression] => Expression))] = Seq(
    "seq_ratio" -> (classOf[SequenceMatcherRatio] -> seqRatioBuilder),
    "seq_ratio_at_least" -> (classOf[SequenceMatcherRatioAtLeast] ->
      { c: Seq[Expression] =>
        arity(c, "seq_ratio_at_least(a, b, cutoff)", 3)
        SequenceMatcherRatioAtLeast(c.head, c(1), litDouble(c(2), "cutoff"))
      }),
    "simhash64" -> (classOf[SimHash64] -> { c: Seq[Expression] =>
      arity(c, "simhash64(text)", 1)
      SimHash64(c.head)
    }),
    "nfc_normalize" -> (classOf[NfcNormalize] -> { c: Seq[Expression] =>
      arity(c, "nfc_normalize(text)", 1)
      NfcNormalize(c.head)
    }),
    "text_shingles" -> (classOf[TextShingles] -> { c: Seq[Expression] =>
      arity(c, "text_shingles(text, n[, distinct])", 2, 3)
      TextShingles(c.head, litInt(c(1), "n"),
        if (c.size == 3) litBoolean(c(2), "distinct") else true)
    }),
    "repetition_stats" -> (classOf[RepetitionStats] -> { c: Seq[Expression] =>
      arity(c, "repetition_stats(text, n)", 2)
      RepetitionStats(c.head, litInt(c(1), "n"))
    }),
    "code_format_valid" -> (classOf[CodeFormatValid] -> { c: Seq[Expression] =>
      arity(c, "code_format_valid(code, code_type)", 2)
      CodeFormatValid(c.head, c(1))
    }),
    "count_min_agg" -> (classOf[CountMinAgg] -> { c: Seq[Expression] =>
      arity(c, "count_min_agg(key, depth, width)", 3)
      CountMinAgg(c.head, litInt(c(1), "depth"), litInt(c(2), "width"))
    }),
    "minhash_agg" -> (classOf[MinHashAgg] -> { c: Seq[Expression] =>
      arity(c, "minhash_agg(x, k)", 2)
      MinHashAgg(c.head, litInt(c(1), "k"))
    }),
    "top_k_agg" -> (classOf[TopKAgg] -> { c: Seq[Expression] =>
      arity(c, "top_k_agg(score, id, k)", 3)
      TopKAgg(c.head, c(1), litInt(c(2), "k"))
    }),
    "jaro_winkler" -> (classOf[JaroWinklerSim] -> { c: Seq[Expression] =>
      arity(c, "jaro_winkler(a, b)", 2)
      JaroWinklerSim(c.head, c(1))
    }))

  /** Register the functions on an already-created session. */
  def registerOn(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, (_, builder)) =>
      org.apache.spark.sql.graft.ColumnBridge.registerFunction(spark, name, builder)
    }
}
