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

  import java.math.{BigDecimal => JBD, RoundingMode}

  private def rd(x: Double, s: Int): Double =
    JBD.valueOf(x).setScale(s, RoundingMode.HALF_UP).doubleValue

  /** Solve the symmetric 3×3 system H·d = g by adjugate/determinant with
    * a FIXED operand order — the exact formula an oracle mirrors
    * verbatim. H given as the upper triangle (h00 h01 h02 h11 h12 h22). */
  private[ops] def solveSym3(h00: Double, h01: Double, h02: Double,
      h11: Double, h12: Double, h22: Double,
      g0: Double, g1: Double, g2: Double): (Double, Double, Double) = {
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
    (d0, d1, d2)
  }

  private def dsum(c: Column) = sum(round(c, 12).cast("decimal(38,12)"))

  /** Persist the projected design matrix for the duration of `body` —
    * the MLlib iterative-training pattern: the IRLS loop re-reads its
    * input once per Newton step, so without this every step pays the
    * full source scan again (6–8 parquet passes per fit). A p+1-column
    * double projection is tiny relative to the source; MEMORY_AND_DISK
    * spills rather than recomputes if it ever isn't. Values are
    * unchanged — every moment is an exact decimal sum of 12dp-rounded
    * terms, order-free, so a cached scan is bit-identical. */
  private def withCachedDesign[A](base: DataFrame)(body: DataFrame => A): A = {
    // Scale-adaptive parallelism for the iteration cache (guide §2.6 /
    // §1.2-1: the distributed algorithm first): a small input plans a
    // 1-partition scan (one parquet split), which would serialize every
    // Newton step — 6-8 full aggregate passes — onto ONE core while the
    // rest of the cluster idles. Widen the cached design to the session's
    // parallelism when (and only when) the scan is narrower than it; at
    // any real scale the scan already carries >= cores partitions and
    // this is a no-op (no extra exchange). Values are unchanged: every
    // moment is an exact decimal sum of 12dp-rounded terms, order-free.
    val cores = base.sparkSession.sparkContext.defaultParallelism
    val wide =
      if (base.rdd.getNumPartitions < cores) base.repartition(cores) else base
    val cached = wide.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try body(cached)
    finally cached.unpersist(blocking = false)
  }

  /** The IRLS/Newton loop itself: fixed iterations, one aggregate per
    * step, driver-side 3×3 solve. @return (β, n). */
  private[ops] def logisticIrlsCoef(base: DataFrame, iters: Int)
      : (Array[Double], Long) = {
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
      val (d0, d1, d2) = solveSym3(h00, h01, h02, h11, h12, h22, g0, g1, g2)
      b = Array(rd(b(0) + d0, 12), rd(b(1) + d1, 12), rd(b(2) + d2, 12))
    }
    (b, n)
  }

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
    val spark = df.sparkSession
    val base = df.select(label.cast("double").as("y"),
      x1.cast("double").as("x1"), x2.cast("double").as("x2"))
    val (b, n) = withCachedDesign(base)(logisticIrlsCoef(_, iters))
    val out = Seq(("intercept", rd(b(0), 6), n),
      ("x1", rd(b(1), 6), n), ("x2", rd(b(2), 6), n))
    spark.createDataFrame(out).toDF("feature", "beta", "n_rows")
  }

  /** Doubly-robust (AIPW) average-treatment-effect estimate: propensity
    * e(x) from the IRLS logistic above, per-arm outcome models μ₁/μ₀ by
    * closed-form OLS on the same features, then the augmented
    * inverse-propensity closure
    *   ATE = mean[ t·(y−μ₁)/e + μ₁ ] − mean[ (1−t)·(y−μ₀)/(1−e) + μ₀ ],
    * consistent if EITHER model is right — the estimator an observational
    * A/B readout should report next to the naive difference.
    *
    * Cost: ONE source scan (the 4-column design is cached for the fit),
    * then `propIters`+2 in-memory passes (IRLS steps, ONE conditional-sum
    * moment pass for both OLS arms, one term pass); all driver state is
    * O(1). Every sum is an exact decimal of rounded terms — mirrorable.
    *
    * @return one row: (n, n_treated, ate_naive, ate_dr), 6dp. */
  def doublyRobustAte(df: DataFrame, treated: Column, outcome: Column,
      x1: Column, x2: Column, propIters: Int = 6): DataFrame = {
    val spark = df.sparkSession
    val baseRaw = df.select(treated.cast("double").as("t"),
      outcome.cast("double").as("yo"),
      x1.cast("double").as("x1"), x2.cast("double").as("x2"))
    withCachedDesign(baseRaw) { base =>
    // Propensity β: the logistic loop sees the treatment as its label
    // (the select scans the shared cached design, not the source).
    val (a, _) = logisticIrlsCoef(
      base.select(col("t").as("y"), col("x1"), col("x2")), propIters)
    // Both OLS arms from ONE conditional-sum pass: H = X'X, g = X'y.
    def armSum(cond: Column, c: Column) =
      sum(when(cond, round(c, 12).cast("decimal(38,12)"))
        .otherwise(lit(0).cast("decimal(38,12)")))
    val arms = Seq(col("t") === 1.0, col("t") === 0.0)
    val momentCols: Seq[Column] =
      Seq(count(lit(1)).as("n"),
        sum(col("t").cast("decimal(38,12)")).as("nt")) ++
      arms.zipWithIndex.flatMap { case (cnd, i) => Seq(
        armSum(cnd, lit(1.0)).as(s"c$i"),
        armSum(cnd, col("x1")).as(s"s1_$i"),
        armSum(cnd, col("x2")).as(s"s2_$i"),
        armSum(cnd, col("x1") * col("x1")).as(s"s11_$i"),
        armSum(cnd, col("x1") * col("x2")).as(s"s12_$i"),
        armSum(cnd, col("x2") * col("x2")).as(s"s22_$i"),
        armSum(cnd, col("yo")).as(s"sy_$i"),
        armSum(cnd, col("yo") * col("x1")).as(s"sy1_$i"),
        armSum(cnd, col("yo") * col("x2")).as(s"sy2_$i"))
      }
    val moments = base.agg(momentCols.head, momentCols.tail: _*).collect()(0)
    def md(name: String): Double =
      moments.getDecimal(moments.fieldIndex(name)).doubleValue
    val betas = (0 to 1).map { i =>
      val (b0, b1, b2) = solveSym3(
        md(s"c$i"), md(s"s1_$i"), md(s"s2_$i"),
        md(s"s11_$i"), md(s"s12_$i"), md(s"s22_$i"),
        md(s"sy_$i"), md(s"sy1_$i"), md(s"sy2_$i"))
      Array(rd(b0, 12), rd(b1, 12), rd(b2, 12))
    }
    val (bT, bC) = (betas(0), betas(1))
    // DR terms with all three fitted models as literals.
    val e = lit(1.0) / (lit(1.0) +
      exp(-(lit(a(0)) + lit(a(1)) * col("x1") + lit(a(2)) * col("x2"))))
    def muOf(b: Array[Double]) =
      lit(b(0)) + lit(b(1)) * col("x1") + lit(b(2)) * col("x2")
    val (m1, m0) = (muOf(bT), muOf(bC))
    def dsum9(c: Column) = sum(round(c, 9).cast("decimal(38,9)"))
    val r = base.select(col("t"), col("yo"), col("x1"), col("x2"),
        e.as("e"), m1.as("m1"), m0.as("m0"))
      .agg(count(lit(1)).as("n"),
        sum(col("t").cast("decimal(38,12)")).as("nt"),
        dsum9(col("t") * (col("yo") - col("m1")) / col("e") + col("m1"))
          .as("t1"),
        dsum9((lit(1.0) - col("t")) * (col("yo") - col("m0")) /
          (lit(1.0) - col("e")) + col("m0")).as("t0"),
        dsum9(col("t") * col("yo")).as("syt"),
        dsum9((lit(1.0) - col("t")) * col("yo")).as("syc"))
      .collect()(0)
    val n = r.getLong(0)
    val nt = r.getDecimal(1).doubleValue
    val nd = n.toDouble
    val dr = r.getDecimal(2).doubleValue / nd -
      r.getDecimal(3).doubleValue / nd
    val naive = r.getDecimal(4).doubleValue / nt -
      r.getDecimal(5).doubleValue / (nd - nt)
    spark.createDataFrame(Seq((n, nt.toLong, rd(naive, 6), rd(dr, 6))))
      .toDF("n", "n_treated", "ate_naive", "ate_dr")
    }
  }
}
