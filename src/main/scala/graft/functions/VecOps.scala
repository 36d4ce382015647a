package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** JIT-friendly vector kernels for the embedding hot paths.
  *
  * `Ann.dot/cosine/sqDist` were declared as `aggregate(zip_with(a, b, …))`
  * — correct, but Spark's higher-order functions never enter codegen: each
  * row allocates a zipped intermediate array and interprets two lambda
  * closures per element (the 100× canary showed executors parked in
  * `ZipWith.eval`/`ArrayAggregate.eval` for the whole embedding batch).
  *
  * The codegen here deliberately emits a CALL to the static [[VecKernels]]
  * methods instead of inlining the loop. An SRP hashing projection holds
  * ~P·L ≈ 200 dot products; 200 inlined 64-iteration loops push the
  * generated method past HotSpot's huge-method ceiling
  * (-XX:DontCompileHugeMethods, 8 KB bytecode), and the whole stage drops
  * to the BYTECODE INTERPRETER — measured SLOWER than the interpreted
  * zip_with fold it replaced. A static call costs ~10 bytes of bytecode
  * per instance, the kernel JIT-compiles once, and every instance shares
  * the same hot compiled loop inside whole-stage codegen.
  *
  * Bit-compatibility with the relational form:
  *  - accumulation order is ascending index, exactly the order
  *    `aggregate`'s left fold applies `acc + f(x_i, y_i)` — same doubles,
  *    same bits;
  *  - a null element anywhere → null result (zip_with emits a null slot,
  *    `acc + null` poisons the fold);
  *  - length mismatch → null (zip_with pads the shorter side with nulls);
  *  - empty arrays → the fold's init: 0.0.
  *
  * ONE deliberate divergence: cosine of a zero-norm (or empty) vector is
  * IEEE NaN/±Inf here, where ANSI-mode Spark `Divide` throws
  * DIVIDE_BY_ZERO. A kernel must not abort a 10⁹-row stage because one
  * degenerate vector slipped in — NaN fails every threshold filter, which
  * is the right quarantine. No gate corpus contains zero-norm vectors
  * (VecOpsSpec pins the divergence explicitly).
  */
object VecKernels {

  /** Σ aᵢ·bᵢ; null (boxed) on length mismatch or null element. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Σ (aᵢ−bᵢ)²; null (boxed) on length mismatch or null element. */
  def sqDist(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** dot/(‖a‖·‖b‖) in ONE pass — the three independent index-order sums
    * the relational `dot(a,b)/(norm(a)*norm(b))` computes in three passes,
    * then an IEEE divide (zero norms → ±Inf/NaN; see the divergence note
    * above). Null (boxed) on length mismatch or null element. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var accD = 0.0
    var accA = 0.0
    var accB = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      accD += x * y
      accA += x * x
      accB += y * y
      i += 1
    }
    accD / (math.sqrt(accA) * math.sqrt(accB))
  }
}

abstract class VecBinaryFold extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<double> inputs, got " +
        s"${l.catalogString} / ${r.catalogString}")
  }

  /** VecKernels method name this expression calls. */
  protected def kernel: String

  protected def kernelFn: (ArrayData, ArrayData) => java.lang.Double

  override def nullSafeEval(leftVal: Any, rightVal: Any): Any =
    kernelFn(leftVal.asInstanceOf[ArrayData], rightVal.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
        |java.lang.Double $r = graft.functions.VecKernels.$kernel($a, $b);
        |if ($r == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $r.doubleValue(); }
      """.stripMargin
    })
}

/** Σ aᵢ·bᵢ — codegen twin of `aggregate(zip_with(a,b,_*_), 0.0, _+_)`. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryFold {
  protected def kernel: String = "dot"
  protected def kernelFn: (ArrayData, ArrayData) => java.lang.Double =
    VecKernels.dot

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** Σ (aᵢ−bᵢ)² — codegen twin of the zip_with squared-distance fold. */
case class VecSqDist(left: Expression, right: Expression) extends VecBinaryFold {
  protected def kernel: String = "sqDist"
  protected def kernelFn: (ArrayData, ArrayData) => java.lang.Double =
    VecKernels.sqDist

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSqDist =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_sqdist"
}

/** One-pass cosine — see [[VecKernels.cosine]]. */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryFold {
  protected def kernel: String = "cosine"
  protected def kernelFn: (ArrayData, ArrayData) => java.lang.Double =
    VecKernels.cosine

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_cosine"
}
