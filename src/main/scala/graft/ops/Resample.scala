package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series regularization: aggregate an event stream onto a fixed
  * grid and FILL THE GAPS, per key — the resample step before any
  * windowed model sees the series (a missing hour must be an explicit
  * zero row, not an absent one).
  */
object Resample {

  /** Hourly resample per key over each key's own [first, last] hour span:
    * (key, hour_ts, n_events, value_sum) with explicit zero rows for
    * silent hours. Shape: one keyed aggregate to the observed hourly
    * cells, one tiny per-key span aggregate whose `sequence` explode
    * generates the full grid (rows ∝ Σ span-hours — bounded by time, not
    * by events), and a left join grid←cells co-partitioned on (key,
    * hour). A key with a years-long span and billions of events still
    * costs its span in grid rows; heavily skewed spans are AQE's skew
    * case on the join. Output timestamps are epoch-hour longs
    * (`hour_sec`), engine-neutral. */
  def hourlyPerKey(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    Seq("hour_sec", "n_events", "value_sum", "__h", "__h0", "__h1").foreach { c =>
      require(!events.columns.contains(c),
        s"hourlyPerKey emits/uses a $c column; rename the existing one")
    }
    val hourSec = (unix_timestamp(col(tsCol)) -
      pmod(unix_timestamp(col(tsCol)), lit(3600L)))
    val cells = events
      .select(col(keyCol), hourSec.as("__h"),
        col(valueCol).cast("decimal(18,6)").as("__v"))
      .groupBy(col(keyCol), col("__h"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__v")).cast("double").as("value_sum"))
    val grid = events
      .select(col(keyCol), hourSec.as("__h"))
      .groupBy(col(keyCol))
      .agg(min(col("__h")).as("__h0"), max(col("__h")).as("__h1"))
      .select(col(keyCol),
        explode(sequence(col("__h0"), col("__h1"), lit(3600L))).as("__h"))
    grid.join(cells, Seq(keyCol, "__h"), "left")
      .select(col(keyCol), col("__h").as("hour_sec"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("value_sum"), lit(0.0)).as("value_sum"))
  }

  /** Rate-spike detection over a resampled grid: per key, compare each
    * hour's event count to the mean of the PRIOR `windowHours` hours
    * (RANGE frame ending one hour before the current cell, so a spike
    * never inflates its own baseline) and flag cells exceeding
    * `factor ×` that baseline. First cells with an empty prior window
    * never flag. Counts are integers, the baseline is one double
    * division of exact sums — engine-independent.
    *
    * One key shuffle; the RANGE window walks each key's grid in hour
    * order. Output: cells + (baseline ~6dp, spike). */
  def rateSpikes(cells: DataFrame, keyCol: String, hourCol: String,
      nCol: String, windowHours: Int = 24, factor: Double = 3.0): DataFrame = {
    require(windowHours >= 1 && factor > 0.0,
      s"bad windowHours/factor: $windowHours/$factor")
    Seq("__bsum", "__bcnt", "baseline", "spike").foreach { c =>
      require(!cells.columns.contains(c),
        s"rateSpikes emits/uses a $c column; rename the existing one")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(hourCol).asc)
      .rangeBetween(-windowHours.toLong * 3600L, -3600L)
    val mean = col("__bsum").cast("double") / col("__bcnt").cast("double")
    cells
      .withColumn("__bsum", sum(col(nCol)).over(w))
      .withColumn("__bcnt", count(col(nCol)).over(w))
      .withColumn("baseline",
        when(col("__bcnt") > 0, round(mean, 6)).otherwise(lit(null)))
      .withColumn("spike",
        col("__bcnt") > 0 && col(nCol).cast("double") > mean * factor)
      .drop("__bsum", "__bcnt")
  }

  /** Exponentially time-decayed event mass per key — the recency-weighted
    * activity feature (each event contributes `0.5^(age / halfLife)`,
    * age measured back from the corpus's LATEST event, so yesterday's
    * click outweighs last month's). The reference instant is computed
    * in-plan (1-row broadcast — no driver action); per-event weights are
    * `pow(0.5, Δsec/halfLife)` with both operands exact integers-as-
    * doubles, 6dp-rounded to decimal (the cross-engine libm form), so the
    * per-key sum is exact and order-free. One map-side-combinable
    * aggregate over a narrow projection.
    *
    * Output: (keyCol, n_events, decayed_mass double). */
  def timeDecayed(events: DataFrame, keyCol: String, tsCol: String,
      halfLifeSeconds: Long): DataFrame = {
    require(halfLifeSeconds > 0, s"halfLife must be > 0, got $halfLifeSeconds")
    Seq("__sec", "__ref", "__w").foreach { c =>
      require(!events.columns.contains(c),
        s"timeDecayed uses an internal $c column; rename the existing one")
    }
    val secs = events.select(col(keyCol),
      unix_timestamp(col(tsCol)).as("__sec"))
    val ref = secs.agg(max(col("__sec")).as("__ref"))
    secs.crossJoin(broadcast(ref))
      .select(col(keyCol),
        round(pow(lit(0.5),
          (col("__ref") - col("__sec")).cast("double") /
            lit(halfLifeSeconds.toDouble)), 6)
          .cast("decimal(18,6)").as("__w"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__w")).cast("double").as("decayed_mass"))
  }
}
