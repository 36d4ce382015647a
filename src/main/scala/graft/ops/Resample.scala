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

  /** OHLC bars: per (key, hour), the first/max/min/last `valueCol` in
    * (tsCol, idCol) order — the classic candlestick downsample that turns
    * a raw event stream into a fixed-grid series features can window
    * over. Open/close are picked by two row-number windows over the same
    * (key, hour) partition (a total order via the id tiebreak — never
    * first()/last() whose result is partition-placement dependent);
    * high/low/count ride the closing hash aggregate. Values pass through
    * untouched (no arithmetic), so the output is engine-exact.
    *
    * One shuffle on (key, hour) serves both window sorts and the final
    * aggregate; grid cells are bounded by time × keys, not by events.
    * Output: (keyCol, hour_sec, n_events, open, high, low, close). */
  def ohlcBars(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    Seq("hour_sec", "n_events", "open", "high", "low", "close", "__h",
      "__ra", "__rd").foreach { c =>
      require(!events.columns.contains(c),
        s"ohlcBars emits/uses a $c column; rename the existing one")
    }
    val hourSec = (unix_timestamp(col(tsCol)) -
      pmod(unix_timestamp(col(tsCol)), lit(3600L)))
    val base = events.select(col(keyCol), hourSec.as("__h"),
      col(tsCol).as("__ts"), col(idCol).as("__id"), col(valueCol).as("__v"))
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("__h"))
      .orderBy(col("__ts").asc, col("__id").asc)
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("__h"))
      .orderBy(col("__ts").desc, col("__id").desc)
    base
      .withColumn("__ra", row_number().over(wa))
      .withColumn("__rd", row_number().over(wd))
      .groupBy(col(keyCol), col("__h"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("__ra") === 1, col("__v"))).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max(when(col("__rd") === 1, col("__v"))).as("close"))
      .withColumnRenamed("__h", "hour_sec")
  }

  /** Last-observation-carried-forward over a resampled grid (the
    * [[hourlyPerKey]] output): silent cells (n_events = 0) inherit the
    * most recent OBSERVED cell's value; leading gaps (no prior
    * observation) stay null. The fill is one `last(_, ignoreNulls)`
    * running window per key — a single key shuffle, each key's grid
    * walked once in hour order. Output: grid + (value_filled,
    * observed). */
  def locfFill(cells: DataFrame, keyCol: String, hourCol: String,
      nCol: String, valueCol: String): DataFrame = {
    Seq("__obs", "value_filled", "observed").foreach { c =>
      require(!cells.columns.contains(c),
        s"locfFill emits/uses a $c column; rename the existing one")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(hourCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    cells
      .withColumn("__obs",
        when(col(nCol) > 0, col(valueCol)).otherwise(lit(null)))
      .withColumn("value_filled", last(col("__obs"), ignoreNulls = true).over(w))
      .withColumn("observed", col(nCol) > 0)
      .drop("__obs")
  }

  /** Merge overlapping-or-touching [start, end] intervals per key into
    * maximal disjoint spans — the islands-and-gaps coalesce (booking
    * windows, validity ranges, coverage spans). A row opens a new island
    * iff its start exceeds the running max end of every EARLIER row
    * (exclusive prefix frame); the island index is the running sum of
    * those opens, and each island closes to (min start, max end, count).
    * Ties in (start, end) are order-safe: a tied row's start can never
    * exceed a prefix max that already includes an interval with the same
    * start (end ≥ start), so it never opens an island regardless of
    * placement among its ties.
    *
    * One key shuffle serves both windows and the closing aggregate.
    * Output: (keyCol, span_start, span_end, n_merged). */
  def coalesceIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    Seq("__pmax", "__new", "__island", "span_start", "span_end",
      "n_merged").foreach { c =>
      require(!df.columns.contains(c),
        s"coalesceIntervals emits/uses a $c column; rename the existing one")
    }
    val byStart = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(startCol).asc, col(endCol).asc)
    val prefix = byStart.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val run = byStart.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.filter(col(endCol) >= col(startCol))
      .withColumn("__pmax", max(col(endCol)).over(prefix))
      .withColumn("__new",
        when(col("__pmax").isNull || col(startCol) > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(run))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }

  /** Exact rolling median of the trailing `k` values per key in
    * (tsCol, idCol) order — the robust smoother (a mean window chases
    * spikes; the median ignores them). The trailing frame is collected,
    * sorted, and closed with the SAME midpoint arithmetic on both
    * engines ((lo + hi) / 2 for even windows — never an engine's native
    * quantile interpolation, whose FP shape differs), then 6dp-rounded.
    * The window is k-bounded, so per-row state is O(k) — this is the
    * small-k trailing feature, not a global quantile (see
    * [[Robust.sampledQuantiles]] for that shape).
    *
    * Output: input keys + (ts/id cols, value, roll_median). */
  def rollingMedian(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"window size must be >= 1, got $k")
    Seq("__win", "__m", "roll_median").foreach { c =>
      require(!df.columns.contains(c),
        s"rollingMedian emits/uses a $c column; rename the existing one")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(-(k - 1).toLong, 0)
    // Column `/` is double division; floor-cast recovers the integer
    // midpoint indices (exact — window sizes are tiny integers).
    val m = size(col("__win"))
    val lo = element_at(col("__win"), floor((m + 1) / lit(2)).cast("int"))
    val hi = element_at(col("__win"), (floor(m / lit(2)) + lit(1)).cast("int"))
    df.select(col(keyCol), col(tsCol), col(idCol), col(valueCol))
      .withColumn("__win", sort_array(collect_list(col(valueCol)).over(w)))
      .withColumn("roll_median", round((lo + hi) / lit(2.0), 6))
      .drop("__win")
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
