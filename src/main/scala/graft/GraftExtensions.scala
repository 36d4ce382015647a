package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.enrich.SequenceMatcherRatio

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions for SQL users.
  *
  * Usage:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * or config: spark.sql.extensions=graft.GraftExtensions
  * Then: spark.sql("SELECT seq_ratio('grady_memorial', 'grady_memoral')")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("seq_ratio"),
      new ExpressionInfo(classOf[SequenceMatcherRatio].getName, "seq_ratio"),
      GraftExtensions.seqRatioBuilder))
  }
}

object GraftExtensions {
  private[graft] val seqRatioBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "seq_ratio(a, b) takes exactly 2 arguments")
    SequenceMatcherRatio(children.head, children(1))
  }

  /** Register the functions on an already-created session. */
  def registerOn(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graft.ColumnBridge.registerFunction(
      spark, "seq_ratio", seqRatioBuilder)
}
