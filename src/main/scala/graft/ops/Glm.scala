package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed GLM training — logistic regression by IRLS/Newton with a
  * FIXED iteration count, the "can the engine fit a model without leaving
  * the plan" primitive (propensity scores, quality classifiers, CUPED-style
  * adjustment models).
  *
  * Each Newton step is ONE map-side-combinable aggregate producing the
  * p(p+1)/2 Hessian cells and p gradient cells (p = features+intercept);
  * the p×p solve is closed-form driver arithmetic — the Lloyd shape again:
  * iteration cost is one corpus scan, the collected state is O(p²),
  * independent of row count.
  *
  * Determinism: every per-row term (μ from the real `exp`, w·xᵢ·xⱼ,
  * (y−μ)·xᵢ) is 12dp-rounded and decimal-summed — exact, order-free — and
  * the Newton closure runs in double with a fixed operand order, each new
  * coefficient re-rounded to 12dp. An engine unrolling the same recurrence
  * (the gate's CTE-chain oracle) reproduces the coefficients bit-for-bit.
  */
object Glm {

  /** Fit P(label=1 | 1, x₁, x₂) by `iters` Newton steps from β = 0.
    * Exactly two features — the closed-form 3×3 symmetric solve is the
    * price of a plan-mirrorable recurrence (for general p use an
    * LAPACK-backed driver solve and give up bit-mirroring).
    *
    * @param label 0/1 integer column; x1/x2 double feature columns,
    *              pre-scaled to O(1) magnitudes (IRLS on raw wide-range
    *              features is numerically its own problem).
    * @return (feature, beta, n_rows): 'intercept','x1','x2' with 6dp
    *         coefficients. */
  def logisticIrls(df: DataFrame, label: Column, x1: Column, x2: Column,
      iters: Int = 6): DataFrame = {
    require(iters >= 1 && iters <= 30, s"iters out of range: $iters")
    import java.math.{BigDecimal => JBD, RoundingMode}
    val spark = df.sparkSession
    def rd(x: Double, s: Int): Double =
      JBD.valueOf(x).setScale(s, RoundingMode.HALF_UP).doubleValue
    val base = df.select(label.cast("double").as("y"),
      x1.cast("double").as("x1"), x2.cast("double").as("x2"))
    def dsum(c: Column) =
      sum(round(c, 12).cast("decimal(38,12)"))
    var b = Array(0.0, 0.0, 0.0)
    var n = 0L
    for (_ <- 1 to iters) {
      val eta = lit(b(0)) + lit(b(1)) * col("x1") + lit(b(2)) * col("x2")
      val mu = lit(1.0) / (lit(1.0) + exp(-eta))
      val t = base.select(col("y"), col("x1"), col("x2"), mu.as("mu"),
        (mu * (lit(1.0) - mu)).as("w"))
      val r = t.agg(
        dsum(col("w")).as("h00"),
        dsum(col("w") * col("x1")).as("h01"),
        dsum(col("w") * col("x2")).as("h02"),
        dsum(col("w") * col("x1") * col("x1")).as("h11"),
        dsum(col("w") * col("x1") * col("x2")).as("h12"),
        dsum(col("w") * col("x2") * col("x2")).as("h22"),
        dsum(col("y") - col("mu")).as("g0"),
        dsum((col("y") - col("mu")) * col("x1")).as("g1"),
        dsum((col("y") - col("mu")) * col("x2")).as("g2"),
        count(lit(1)).as("n")).collect()(0)
      val Seq(h00, h01, h02, h11, h12, h22, g0, g1, g2) =
        (0 until 9).map(i => r.getDecimal(i).doubleValue)
      n = r.getLong(9)
      // Symmetric 3×3 Newton solve, fixed operand order (adjugate/det).
      val det = h00 * (h11 * h22 - h12 * h12) -
        h01 * (h01 * h22 - h12 * h02) +
        h02 * (h01 * h12 - h11 * h02)
      val d0 = ((h11 * h22 - h12 * h12) * g0 +
        (h02 * h12 - h01 * h22) * g1 +
        (h01 * h12 - h02 * h11) * g2) / det
      val d1 = ((h02 * h12 - h01 * h22) * g0 +
        (h00 * h22 - h02 * h02) * g1 +
        (h01 * h02 - h00 * h12) * g2) / det
      val d2 = ((h01 * h12 - h02 * h11) * g0 +
        (h01 * h02 - h00 * h12) * g1 +
        (h00 * h11 - h01 * h01) * g2) / det
      b = Array(rd(b(0) + d0, 12), rd(b(1) + d1, 12), rd(b(2) + d2, 12))
    }
    val out = Seq(("intercept", rd(b(0), 6), n),
      ("x1", rd(b(1), 6), n), ("x2", rd(b(2), 6), n))
    spark.createDataFrame(out).toDF("feature", "beta", "n_rows")
  }
}
