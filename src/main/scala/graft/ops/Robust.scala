package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust-statistics cleanup of numeric columns — the outlier-taming step
  * before a metric feeds a mixing weight or a quality threshold (one
  * pathological document must not drag a source's mean length or score).
  */
object Robust {

  /** Winsorize `valueCol` per group: clamp every value into the group's
    * [p(lo), p(hi)] exact interpolated percentile envelope, emitted as
    * `<valueCol>_w` alongside the input columns. Two passes over the
    * data by construction (the envelope is an aggregate of the column
    * being clamped): one hash aggregate to per-group bounds — group
    * cardinality rows, broadcast back — and one narrow clamp; no
    * per-row shuffle. Exact `percentile` (not approx) keeps the bounds
    * engine-reproducible; at 100 TB swap in `percentile_approx` and accept
    * sketch bounds, or winsorize on a [[Sampling.stratified]] sample's
    * envelope. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double): DataFrame = {
    require(0.0 <= lo && lo < hi && hi <= 1.0,
      s"need 0 <= lo < hi <= 1, got ($lo, $hi)")
    Seq("__lo", "__hi").foreach { c =>
      require(!df.columns.contains(c),
        s"winsorize uses an internal $c column; rename the existing one")
    }
    require(!df.columns.contains(s"${valueCol}_w"),
      s"winsorize emits ${valueCol}_w; rename the existing one")
    val bounds = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(lo)).as("__lo"),
        percentile(col(valueCol), lit(hi)).as("__hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol).cast("double"), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Keep rows at or below their group's `frac` percentile of `valueCol`
    * (e.g. "the best half by perplexity, per language"). The per-group
    * threshold is one exact-percentile aggregate broadcast back onto a
    * narrow filter — the scale-safe per-group fraction: a ranking window
    * per group would concentrate each group in one task, while the
    * threshold form shuffles only group-cardinality rows. Keeps slightly
    * more than `frac` when values tie at the threshold (ties all keep —
    * deterministic, unlike a rank tiebreak on unstable ids). */
  def keepBelowQuantile(df: DataFrame, groupCol: String, valueCol: String,
      frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    require(!df.columns.contains("__q"),
      "keepBelowQuantile uses an internal __q column; rename the existing one")
    val bounds = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(frac)).as("__q"))
    df.join(broadcast(bounds), Seq(groupCol))
      .filter(col(valueCol) <= col("__q"))
      .drop("__q")
  }

  /** Robust outlier report via the MAD (median absolute deviation)
    * z-score: per group — row count, median, MAD, and how many rows fall
    * outside `z` robust standard deviations (1.4826·MAD ≈ σ for normal
    * data; the estimator a mean/stddev rule can't provide once outliers
    * contaminate the moments themselves).
    *
    * Exact MAD is inherently two quantile passes (median, then median of
    * deviations) plus the flag count — three group aggregates with the
    * per-group scalars broadcast back between them; no per-group window
    * ever materializes a group in one task. Deviations of integer-valued
    * data against a .5-interpolated median are IEEE-exact, so the
    * threshold comparison is engine-independent (the oracle mirrors the
    * `(mad * 1.4826) * z` operand order).
    *
    * Output: (group, n_rows, med, mad, n_outliers). */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      z: Double = 3.0): DataFrame = {
    require(z > 0.0, s"z must be positive, got $z")
    Seq("__med", "__mad", "__dev").foreach { c =>
      require(!df.columns.contains(c),
        s"madOutliers uses an internal $c column; rename the existing one")
    }
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.5)).as("__med"))
    val withDev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val mad = withDev.groupBy(col(groupCol))
      .agg(percentile(col("__dev"), lit(0.5)).as("__mad"))
    withDev.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        max(col("__med")).as("med"),
        max(col("__mad")).as("mad"),
        count(when(col("__dev") > (col("__mad") * 1.4826) * z, lit(1)))
          .as("n_outliers"))
  }
}
