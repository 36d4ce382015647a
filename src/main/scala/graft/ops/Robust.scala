package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Approximate per-group quantiles from a DETERMINISTIC hash sample —
    * the merge-invariant alternative to a mergeable quantile sketch
    * (GK/KLL), whose compaction state depends on merge order and so
    * cannot be bit-reproduced across partitionings or engines. The
    * sample membership is a pure function of each row's id
    * ([[Sampling.permilleBucket]] < permille), so ANY engine selects the
    * same rows, and the type-1 (lower-rank) quantile of integer values
    * needs no interpolation: p(q) = min{v : rank(v) ≥ ⌈q·n⌉}, evaluated
    * as the all-integer `cum·den ≥ num·n` — not a float in the plan.
    *
    * Cost shape: one narrow sample filter (permille/1000 of rows
    * survive), one hash aggregate to (group, value) counts, then a
    * per-group running sum over the COLLAPSED value domain — the window
    * partition holds distinct values, not rows, so a billion-row group
    * with a bounded domain (quantities, scores, bucketed lengths) costs
    * its domain size. For unbounded continuous domains, bucket first or
    * use [[graft.ops.Ranking.prefixSum]]. Standard binomial bounds put
    * the sampled quantile's rank error at O(√(q(1-q)/n_sample)).
    *
    * Output: (group, sample_n, p50, p90, p99). Groups whose sample is
    * empty are absent (no rows to rank). */
  def sampledQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      idCol: Column, permille: Int): DataFrame = {
    require(permille >= 1 && permille <= 1000,
      s"permille out of range (1..1000): $permille")
    Seq("__v", "__c", "__cum", "sample_n", "p50", "p90", "p99").foreach { c =>
      require(!df.columns.contains(c),
        s"sampledQuantiles uses/emits $c; rename the existing column")
    }
    val s = df.filter(Sampling.permilleBucket(idCol) < permille)
      .select(col(groupCol), col(valueCol).cast("long").as("__v"))
    val counts = s.groupBy(col(groupCol), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__v"))
    val cum = counts.withColumn("__cum", sum(col("__c")).over(w))
    // group sizes from the COLLAPSED counts — summing __c is exact and
    // avoids a second full scan of the sampled input
    val n = counts.groupBy(col(groupCol)).agg(sum(col("__c")).as("sample_n"))
    def pick(num: Int, den: Int, as: String) =
      min(when(col("__cum") * den >= col("sample_n") * num, col("__v")))
        .as(as)
    cum.join(n, groupCol :: Nil)
      .groupBy(col(groupCol), col("sample_n"))
      .agg(pick(1, 2, "p50"), pick(9, 10, "p90"), pick(99, 100, "p99"))
  }

  /** Exact symmetric trimmed mean per group: drop the ⌊n·trim⌋ smallest
    * and largest INTEGER values by rank, average the rest — the robust
    * location estimate between mean (trim 0) and median (trim 0.5).
    * Rank accounting runs over COLLAPSED (group, value) counts: value v
    * keeps `min(cum, n−k) − max(cum−c, k)` of its c copies against the
    * kept-rank interval (k, n−k], so everything up to the final division
    * is 64-bit-integer exact and the window partition holds the value
    * domain, not the rows (same shape as [[sampledQuantiles]]).
    *
    * Output: (group, n, n_kept, trimmed_mean) — mean 6dp-rounded; groups
    * where the trim swallows everything (n ≤ 2k... only n=0) are absent. */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
      trim: Double): DataFrame = {
    require(trim >= 0.0 && trim < 0.5, s"trim must be in [0, 0.5), got $trim")
    Seq("__v", "__c", "__cum", "__k", "__s", "n", "n_kept",
      "trimmed_mean").foreach { c =>
      require(!df.columns.contains(c),
        s"trimmedMean uses/emits $c; rename the existing column")
    }
    val d = df.select(col(groupCol), col(valueCol).cast("long").as("__v"))
    val counts = d.groupBy(col(groupCol), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__v"))
    val cum = counts.withColumn("__cum", sum(col("__c")).over(w))
    // group sizes from the collapsed counts — no second scan of the input
    val n = counts.groupBy(col(groupCol)).agg(sum(col("__c")).as("n"))
    val k = floor(col("n") * trim).cast("long")
    val kept = greatest(lit(0L),
      least(col("__cum"), col("n") - col("__k")) -
        greatest(col("__cum") - col("__c"), col("__k")))
    cum.join(n, groupCol :: Nil)
      .withColumn("__k", k)
      .groupBy(col(groupCol), col("n"), col("__k"))
      .agg(sum(col("__v") * kept).as("__s"), sum(kept).as("n_kept"))
      .select(col(groupCol), col("n"), col("n_kept"),
        round(col("__s").cast("double") / col("n_kept").cast("double"), 6)
          .as("trimmed_mean"))
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
    // Collapse to per-(group, value) counts FIRST and run every later
    // pass over the collapsed table with frequency-weighted percentiles
    // — medians over (value, count) are the exact medians over rows, and
    // the source is scanned ONCE instead of four times (the med pass,
    // the dev build, the mad pass and the closing count each consume the
    // input; pre-collapse that was 4 full re-scans). The collapsed frame
    // is persisted for its four consumers: at worst (all-distinct
    // values) it is one (group, value, long) row per distinct pair —
    // MEMORY_AND_DISK spills rather than recomputes.
    val collapsed = graft.core.Memo.ownedPersist(
      df.groupBy(col(groupCol), col(valueCol))
        .agg(count(lit(1)).as("__n")))
    val med = collapsed.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.5), col("__n")).as("__med"))
    val withDev = collapsed.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val mad = withDev.groupBy(col(groupCol))
      .agg(percentile(col("__dev"), lit(0.5), col("__n")).as("__mad"))
    val out = withDev.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        sum(col("__n")).as("n_rows"),
        max(col("__med")).as("med"),
        max(col("__mad")).as("mad"),
        coalesce(sum(when(col("__dev") > (col("__mad") * 1.4826) * z,
          col("__n"))), lit(0L)).as("n_outliers"))
    out
  }

  /** Exact LOWER weighted median per group: the smallest value whose
    * cumulative weight reaches half the group total (2·cumW ≥ T — no
    * interpolation, so integer weights keep the result engine-exact).
    * Same scale shape as [[trimmedMean]]: collapse to per-(group, value)
    * weight sums FIRST (the window then walks distinct values, not rows),
    * one cumulative window + one whole-group total per group, closing
    * min. Weights must be non-negative integers (cast to long). Output:
    * (groupCol, total_weight, weighted_median). */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    Seq("__w", "__cum", "__tot", "total_weight", "weighted_median").foreach { c =>
      require(!df.columns.contains(c),
        s"weightedMedian uses an internal $c column; rename the existing one")
    }
    val collapsed = df
      .select(col(groupCol), col(valueCol),
        col(weightCol).cast("long").as("__w"))
      .groupBy(col(groupCol), col(valueCol))
      .agg(sum(col("__w")).as("__w"))
    val cumW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val totW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    collapsed
      .withColumn("__cum", sum(col("__w")).over(cumW))
      .withColumn("__tot", sum(col("__w")).over(totW))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(col(groupCol))
      .agg(max(col("__tot")).as("total_weight"),
        min(col(valueCol)).as("weighted_median"))
  }
}
