package graft.functions

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.SparkSpec

/** The VecOps kernels must be BIT-identical to the relational
  * `aggregate(zip_with(…))` folds they replaced in Ann — including the
  * null-element / length-mismatch / empty-array poison semantics — and must
  * actually run inside whole-stage codegen. */
class VecOpsSpec extends SparkSpec {

  private def foldDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def foldSqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
  private def foldCosine(a: Column, b: Column): Column =
    foldDot(a, b) / (sqrt(foldDot(a, a)) * sqrt(foldDot(b, b)))

  private def vec(seed: Long, n: Int): Seq[Double] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(r.nextDouble() * 2 - 1)
  }

  // repartition breaks ConvertToLocalRelation, so the comparison actually
  // exercises the codegen path instead of being constant-folded on the
  // driver through interpreted eval.
  private lazy val pairs = {
    import spark.implicits._
    (0 until 50).map(i => (vec(i, 64), vec(i + 1000, 64)))
      .toDF("a", "b").repartition(2)
  }

  test("VecDot / VecSqDist / VecCosine are bit-equal to the zip_with folds") {
    val out = pairs.select(
      graft.ops.Ann.dot(col("a"), col("b")).as("kd"),
      foldDot(col("a"), col("b")).as("fd"),
      graft.ops.Ann.sqDist(col("a"), col("b")).as("ks"),
      foldSqDist(col("a"), col("b")).as("fs"),
      graft.ops.Ann.cosine(col("a"), col("b")).as("kc"),
      foldCosine(col("a"), col("b")).as("fc")).collect()
    assert(out.length == 50)
    out.foreach { r =>
      def bits(i: Int) = java.lang.Double.doubleToRawLongBits(r.getDouble(i))
      assert(bits(0) == bits(1), s"dot: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      assert(bits(2) == bits(3), s"sqDist: ${r.getDouble(2)} vs ${r.getDouble(3)}")
      assert(bits(4) == bits(5), s"cosine: ${r.getDouble(4)} vs ${r.getDouble(5)}")
    }
  }

  test("zero-norm divergence is the documented one: NaN, not DIVIDE_BY_ZERO") {
    import spark.implicits._
    val empty = Seq((Seq.empty[Double], Seq.empty[Double]))
      .toDF("a", "b").repartition(1)
    // kernel: IEEE 0/0 = NaN
    val kc = empty.select(graft.ops.Ann.cosine(col("a"), col("b")).as("c"))
      .collect()(0).getDouble(0)
    assert(kc.isNaN)
    // the fold it replaced: ANSI Divide throws
    val ex = intercept[Exception] {
      empty.select(foldCosine(col("a"), col("b")).as("c")).collect()
    }
    assert(ex.getMessage.contains("DIVIDE_BY_ZERO"), ex.getMessage)
  }

  test("null element and length mismatch poison the result, like zip_with") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0))
    ).toDF("a", "b")
    val rows = df.select(
      graft.ops.Ann.dot(col("a"), col("b")).as("kd"),
      foldDot(col("a"), col("b")).as("fd"),
      graft.ops.Ann.sqDist(col("a"), col("b")).as("ks"),
      foldSqDist(col("a"), col("b")).as("fs")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"dot null mismatch: $r")
      assert(r.isNullAt(2) == r.isNullAt(3), s"sqDist null mismatch: $r")
    }
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0) && !rows(2).isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    // Drive nullSafeEval directly (the path CodegenFallback / filters with
    // non-codegen parents use) and compare with the dataframe result.
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array(1.5, -2.25, 3.0))
    val b = ArrayData.toArrayData(Array(0.5, 4.0, -1.0))
    val one = ColumnBridge.expression(lit(1))
    val dot = VecDot(one, one).nullSafeEval(a, b)
    assert(dot == (1.5 * 0.5 + -2.25 * 4.0 + 3.0 * -1.0))
    val sq = VecSqDist(one, one).nullSafeEval(a, b)
    assert(sq == (1.0 + 6.25 * 6.25 + 16.0))
    val cos = VecCosine(one, one).nullSafeEval(a, b)
      .asInstanceOf[Double]
    val expect = (1.5 * 0.5 + -2.25 * 4.0 + 3.0 * -1.0) /
      (math.sqrt(1.5 * 1.5 + 2.25 * 2.25 + 9.0) *
        math.sqrt(0.25 + 16.0 + 1.0))
    assert(cos == expect)
  }

  test("the kernels run inside WholeStageCodegen") {
    val df = pairs.select(graft.ops.Ann.cosine(col("a"), col("b")).as("c"))
    df.collect() // finalize the adaptive plan so codegen spans are decided
    val plan = df.queryExecution.executedPlan.toString
    // The final plan must show the projection under a WholeStageCodegen
    // span — i.e. the kernel did NOT force a CodegenFallback project.
    assert(plan.contains("isFinalPlan=true"), plan)
    // `*(n)` prefixes a codegen span in the plan rendering; a fallback
    // project would print bare `Project [vec_cosine...`.
    val proj = plan.linesIterator.find(_.contains("vec_cosine")).get
    assert(proj.matches(""".*\*\(\d+\) Project .*"""), plan)
  }
}
