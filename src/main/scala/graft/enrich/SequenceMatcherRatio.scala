package graft.enrich

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression for difflib-compatible SequenceMatcher ratio (J2).
  *
  * A native `Expression` (with codegen emitting a direct static call) rather
  * than a Scala UDF: stays inside whole-stage codegen, no row-at-a-time
  * encoder boundary on the fuzzy-join hot path.
  */
case class SequenceMatcherRatio(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SequenceMatcher.ratio(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.enrich.SequenceMatcher.ratio($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SequenceMatcherRatio =
    copy(left = newLeft, right = newRight)
}

object SequenceMatcherRatio {
  import org.apache.spark.sql.graft.ColumnBridge
  /** Column-level entry point: `seq_ratio(a, b)`. */
  def seqRatio(a: Column, b: Column): Column =
    ColumnBridge.column(SequenceMatcherRatio(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Bounded variant: exact ratio, or -1 when the O(n) char-bag bound
    * already proves it is below `cutoff` (skips the quadratic kernel). */
  def seqRatioAtLeast(a: Column, b: Column, cutoff: Double): Column =
    ColumnBridge.column(SequenceMatcherRatioAtLeast(
      ColumnBridge.expression(a), ColumnBridge.expression(b), cutoff))
}

/** seq_ratio with a quick-bound short-circuit (see SequenceMatcher.ratioIfAtLeast). */
case class SequenceMatcherRatioAtLeast(left: Expression, right: Expression,
    cutoff: Double) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SequenceMatcher.ratioIfAtLeast(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString, cutoff)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.enrich.SequenceMatcher.ratioIfAtLeast($a.toString(), $b.toString(), $cutoff)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SequenceMatcherRatioAtLeast =
    copy(left = newLeft, right = newRight)
}
