package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Data-distribution profiling: the skew diagnostic that decides whether a
  * join needs [[SkewJoin.saltedJoin]] or a key needs special-casing.
  * Exact heavy hitters — a partial-combining count aggregate (the heavy
  * keys are by definition the ones map-side combine collapses best),
  * followed by a k-row TakeOrdered merge. The corpus total rides along as
  * a 1-row broadcast so the share is computed in-plan, no driver action.
  */
object Profile {

  /** Top `k` keys by occurrence count with their corpus share.
    * Deterministic cut: (cnt desc, key asc).
    *
    * Output: (key, cnt, share) — key cast to string so profiles of
    * different key types union cleanly. */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.select(col(keyCol).cast("string").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
    // Grand total as a plain count(*) of the source: sum-of-counts over the
    // aggregate would recompute the whole groupBy subtree (the widen
    // barrier's nondeterministic filter defeats exchange reuse), while a
    // bare row count is a zero-column scan + partial counts — the cheapest
    // possible second pass.
    val total = df.agg(count(lit(1)).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("cnt"),
        (col("cnt").cast("double") / col("__total").cast("double")).as("share"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(k)
  }

  /** Per-language corpus data card — the release report a curation run
    * emits alongside its output shards: document and token volumes, length
    * envelope, mean quality, and how many docs are byte-level duplicates.
    *
    * One row per language. Shape at 100 TB: a single hash aggregate keyed
    * by langid (≤ tens of groups) — every stat partial-aggregates map-side
    * except the exact-duplicate count, whose count(distinct fp) expands to
    * a (langid, fp)-keyed first phase: the same shuffle an exact-dedup pass
    * already does, reused here as a report. Float determinism: quality is
    * summed as 6dp DECIMAL (exact, order-invariant); the means are a single
    * double division of exact operands, then a 6dp round — the established
    * cross-engine-safe form.
    *
    * Output: (langid, n_docs, tokens_total, len_min, len_max, mean_len,
    * mean_quality, n_exact_dups). */
  def corpusStats(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val perDoc = docs.select(
      TextOps.languageId(t).as("langid"),
      length(t).cast("long").as("len"),
      TextOps.tokenCountWhitespace(t).cast("long").as("toks"),
      round(TextOps.qualityScore(t), 6).cast("decimal(18,6)").as("q"),
      TextOps.fingerprint(t).as("fp"))
    val n = count(lit(1))
    perDoc.groupBy(col("langid")).agg(
      n.as("n_docs"),
      sum(col("toks")).as("tokens_total"),
      min(col("len")).as("len_min"),
      max(col("len")).as("len_max"),
      round(sum(col("len")).cast("double") / n.cast("double"), 6).as("mean_len"),
      round(sum(col("q")).cast("double") / n.cast("double"), 6).as("mean_quality"),
      (n - countDistinct(col("fp"))).as("n_exact_dups"))
  }

  /** Pre-flight profile of an equi-join: per-side row/distinct-key counts,
    * how many keys match, the EXACT inner-join output size (Σ c_l·c_r over
    * matched keys) and its largest single-key contribution — the numbers
    * that decide broadcast vs shuffle vs salt BEFORE paying for the join.
    * Cost: one count-aggregate per side (shuffles keys once each, counts
    * partial-combine map-side) + a join of the two per-key count tables
    * (distinct-key cardinality rows, not data rows) + a 1-row final
    * aggregate. The hot key reports deterministically: ties break to the
    * largest key via a max-of-struct. Output: one row —
    * (rows_left, rows_right, keys_left, keys_right, keys_matched,
    *  inner_rows, max_key_rows, hot_key). */
  def joinProfile(left: DataFrame, right: DataFrame,
      keyCol: String): DataFrame = {
    Seq("__cl", "__cr", "__out", "__k").foreach { c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"joinProfile uses an internal $c column; rename the existing one")
    }
    val l = left.groupBy(col(keyCol)).agg(count(lit(1)).as("__cl"))
    val r = right.groupBy(col(keyCol)).agg(count(lit(1)).as("__cr"))
    l.join(r, Seq(keyCol), "full_outer")
      .select(col(keyCol).as("__k"), col("__cl"), col("__cr"),
        (coalesce(col("__cl"), lit(0L)) * coalesce(col("__cr"), lit(0L)))
          .as("__out"))
      .agg(
        sum(coalesce(col("__cl"), lit(0L))).as("rows_left"),
        sum(coalesce(col("__cr"), lit(0L))).as("rows_right"),
        count(col("__cl")).as("keys_left"),
        count(col("__cr")).as("keys_right"),
        count(when(col("__cl").isNotNull && col("__cr").isNotNull, lit(1)))
          .as("keys_matched"),
        sum(col("__out")).as("inner_rows"),
        max(col("__out")).as("max_key_rows"),
        max(struct(col("__out"), col("__k"))).getField("__k").as("hot_key"))
  }

  /** Exact equi-width histogram of a numeric column: `bins` buckets of
    * `width` starting at `lo`, out-of-range values clamped into the edge
    * buckets. One hash aggregate keyed by the computed bin id (≤ `bins`
    * groups — fully map-side-combined, the cheapest possible profile of a
    * 100 TB column). Bin arithmetic is a single IEEE-double divide +
    * floor, bit-identical across engines; per-bin extremes are exact
    * min/max (no order-dependent sums).
    *
    * Output: (bin, bin_lo, n_rows, min_v, max_v), bin in [0, bins). */
  def histogram(df: DataFrame, valueCol: String, lo: Double,
      width: Double, bins: Int): DataFrame = {
    require(width > 0.0, s"width must be positive, got $width")
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(valueCol != "bin",
      "histogram emits a bin column; rename the value column")
    val v = col(valueCol)
    val bin = least(greatest(floor((v - lit(lo)) / lit(width)), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    df.filter(v.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n_rows"), min(v).as("min_v"), max(v).as("max_v"))
      .select(col("bin"),
        (lit(lo) + col("bin").cast("double") * lit(width)).as("bin_lo"),
        col("n_rows"), col("min_v"), col("max_v"))
  }

  /** ANALYZE-style per-column table statistics — the input a cost-based
    * optimizer (or a data-contract baseline) wants: non-null/null counts,
    * exact distinct count, and the typed extremes (numeric ones as
    * doubles, string ones as strings; other types report counts/ndv
    * only). One single-column aggregate per requested column, unioned —
    * each scan prunes to exactly one column, so on a columnar store the
    * total IO is the requested columns once, and no multi-distinct
    * Expand ever multiplies the row stream.
    *
    * Output: one row per column — (col_name, n_nonnull, n_null, ndv,
    * min_num, max_num, min_str, max_str). */
  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val parts = cols.map { c =>
      val dt = df.schema(c).dataType
      val isNum = dt.isInstanceOf[NumericType]
      val isStr = dt == StringType
      df.select(col(c))
        .agg(
          count(col(c)).as("n_nonnull"),
          count(when(col(c).isNull, lit(1))).as("n_null"),
          countDistinct(col(c)).as("ndv"),
          (if (isNum) min(col(c)).cast("double")
           else lit(null).cast("double")).as("min_num"),
          (if (isNum) max(col(c)).cast("double")
           else lit(null).cast("double")).as("max_num"),
          (if (isStr) min(col(c)) else lit(null).cast("string")).as("min_str"),
          (if (isStr) max(col(c)) else lit(null).cast("string")).as("max_str"))
        .select(lit(c).as("col_name"), col("n_nonnull"), col("n_null"),
          col("ndv"), col("min_num"), col("max_num"), col("min_str"),
          col("max_str"))
    }
    parts.reduce(_ unionAll _)
  }

  /** Most frequent value of `valueCol` per `keyCol` group — the
    * categorical "typical value" profile. Deterministic tie-break:
    * (count desc, value asc). Two hash aggregates — (key, value) counts,
    * then a per-key top-1 window over the COUNT table (cardinality
    * |distinct pairs|, not |rows|, so the window sort is over already-
    * collapsed data). Output: (key, mode_value, n). */
  def modeBy(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.exists(c => c == "__cnt" || c == "__rn"),
      "modeBy uses internal __cnt/__rn columns; rename the existing one")
    val counts = df.groupBy(col(keyCol), col(valueCol))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__cnt").desc, col(valueCol).asc)
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col(valueCol).as("mode_value"),
        col("__cnt").as("n"))
  }

  /** Class-balance report with the EFFECTIVE number of samples (Cui et
    * al. 2019, "Class-Balanced Loss"): `E_n = (1 − β^n) / (1 − β)` — the
    * de-duplicated "information content" of n samples under overlap rate
    * β. The re-weighting factor a class-balanced trainer would use is
    * ∝ 1/E_n; a report row per label carries count, corpus share and E_n.
    * One map-side-combinable aggregate + a 1-row broadcast total;
    * `β^n` is one libm pow of exact operands, 6dp-rounded (the
    * cross-engine-safe form). */
  def classBalance(df: DataFrame, labelCol: String,
      beta: Double = 0.999): DataFrame = {
    require(beta > 0.0 && beta < 1.0, s"beta must be in (0, 1), got $beta")
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__tot"))
    counts.crossJoin(broadcast(tot))
      .select(col(labelCol), col("n"),
        round(col("n").cast("double") / col("__tot").cast("double"), 6)
          .as("share"),
        round((lit(1.0) - pow(lit(beta), col("n").cast("double"))) /
          lit(1.0 - beta), 6).as("effective_n"))
  }

  // ------------------------------------------------------------- Benford

  /** log10(1 + 1/d) for d = 1..9, pre-rounded to 6dp as literals so the
    * engine and any SQL oracle agree bit-for-bit (no float-log drift). */
  private val benfordExpected: Seq[(Int, Double)] = Seq(
    1 -> 0.30103, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.09691,
    5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
    9 -> 0.045757)

  /** Benford first-significant-digit audit — the classic forensic screen
    * for fabricated or mechanically-generated numeric columns. Rows with a
    * finite value in [1, 2^63) contribute their integer part's leading
    * digit (extracted through exact integer-string formatting, not float
    * log10, so both engines agree on every value; NaN/Infinity and
    * values beyond long range — where doubles carry no integer precision
    * anyway — are excluded rather than crashing the ANSI long cast);
    * output is one row per digit 1..9 with count, observed share, the
    * Benford expectation, and |deviation|. When no row qualifies, counts
    * and observed shares are 0 and abs_dev equals the expectation.
    *
    * One map-side-combinable 9-group aggregate over a narrow projection;
    * the total and the 9-row expectation table ride along as broadcasts —
    * no driver action, nothing scales with input size but the scan. */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("double")
    val counts = df
      .where(col(valueCol) >= 1 && !isnan(v) && v < 9.223372036854775e18)
      .select(substring(floor(col(valueCol)).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val expected = benfordExpected.toDF("digit", "expected_p")
    val total = counts.agg(coalesce(sum(col("n")), lit(0L)).as("__total"))
    counts.join(broadcast(expected), Seq("digit"), "right")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        when(col("__total") === 0, lit(0.0))
          .otherwise(round(col("n") / col("__total"), 6)).as("observed_p"),
        col("expected_p"),
        when(col("__total") === 0, col("expected_p"))
          .otherwise(round(abs(col("n") / col("__total") - col("expected_p")), 6))
          .as("abs_dev"))
  }
}
