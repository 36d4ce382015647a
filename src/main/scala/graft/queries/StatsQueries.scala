package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables.table
import graft.ops.Quality

/** Statistical aggregates (extension — SURVEY notes the reference has none):
  * exact interpolated percentiles and variance/stddev. Cross-engine
  * determinism: quantities are integer-valued doubles so percentile
  * interpolation is exact; variance uses the explicit sum/sum-of-squares
  * formula over exactly-representable sums (Welford streaming accumulation
  * is addition-order dependent and is avoided).
  */
object StatsQueries {

  def family: QueryFamily = QueryFamily("stats", queries, oracles)

  /** Bottom-k size for the oracle-checked KMV distinct gate. */
  private val KmvK = 64

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_quantity_stats" -> ((s, dir) => {
      val n = count(lit(1)).cast("double")
      val sx = sum(col("l_quantity"))                      // ints-in-doubles: exact
      val sxx = sum(col("l_quantity") * col("l_quantity")) // ≤ 2^53: exact
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
          percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
          round((sxx - sx * sx / n) / (n - 1.0), 6).as("var_qty"),
          round(sqrt((sxx - sx * sx / n) / (n - 1.0)), 6).as("stddev_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
    }),

    // Rollup hierarchy + distinct aggregation (subtotal rows carry nulls).
    "agg_rollup_distinct" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          sum(col("l_quantity")).as("sum_qty"))),

    // Sketch aggregates next to their exact twins: HyperLogLog++ distinct
    // (one fixed-size sketch per group merged map-side — the 100 TB distinct
    // count; exact countDistinct needs a second shuffle of the full key set)
    // and approximate percentile. Rows-only gate (HLL/KLL register states
    // are not SQL-expressible); StatsSpec bounds the error vs the exact
    // columns emitted alongside.
    "agg_sketch_accuracy" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("exact_distinct"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("hll_distinct"),
          percentile(col("l_quantity"), lit(0.5)).as("exact_p50"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(1000))
            .as("approx_p50"))),

    // The ORACLE-CHECKED sketch companion to agg_sketch_accuracy: KMV
    // (bottom-k hash) distinct estimation with k=64 over knuth32 — the
    // estimate, not just the exact twin, is plain integer/double
    // arithmetic a second engine re-derives exactly. The bottom-k set
    // rides the bounded TopKAgg buffer (map-side combinable; never a
    // per-group hash sort). rel_err is data, not an assertion —
    // StatsSpec bounds it.
    "agg_sketch_report" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val kmv = graft.ops.Sketch.kmvDistinct(
        li.select(col("l_returnflag"), col("l_orderkey")),
        "l_returnflag", "l_orderkey", k = KmvK)
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
      exact.join(kmv, "l_returnflag")
        .select(col("l_returnflag"), col("exact_distinct"),
          col("n_hashes"), col("kmv_distinct"),
          round(abs(col("kmv_distinct") - col("exact_distinct").cast("double"))
            / col("exact_distinct").cast("double"), 6).as("rel_err"))
    }),

    // Grouped multiple regression (2 features) by the normal equations:
    // exact long/decimal power sums, then Cramer's rule in double with
    // THE SAME formula string parsed by both engines (OlsSql below) —
    // operand order is shared by construction, so the doubles are
    // bit-identical. price ~ b0 + b1·quantity + b2·discount per flag.
    "agg_ols_multi" -> ((s, dir) => {
      val d = table(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_quantity").cast("long").as("x1"),
        col("l_discount").cast("decimal(4,2)").as("x2"),
        col("l_extendedprice").cast("decimal(18,2)").as("y"))
      val a = d.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("y")).as("sy"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"))
      val c = a.select(col("l_returnflag"), col("n"),
        col("n").cast("double").as("nd"),
        col("s1").cast("double").as("s1d"),
        col("s2").cast("double").as("s2d"),
        col("s11").cast("double").as("s11d"),
        col("s22").cast("double").as("s22d"),
        col("s12").cast("double").as("s12d"),
        col("sy").cast("double").as("syd"),
        col("s1y").cast("double").as("s1yd"),
        col("s2y").cast("double").as("s2yd"))
      // nullif: a singular system (collinear/constant features) must be
      // NULL on both engines, not engine-specific NaN/Inf.
      c.select(col("l_returnflag"), col("n"),
        expr(s"round(($OlsDet0) / nullif(($OlsDet), 0.0), 6)").as("b0"),
        expr(s"round(($OlsDet1) / nullif(($OlsDet), 0.0), 6)").as("b1"),
        expr(s"round(($OlsDet2) / nullif(($OlsDet), 0.0), 6)").as("b2"))
    }),

    // Exact 10% symmetric trimmed mean of quantity per flag — the robust
    // location stat between mean and median; integer rank accounting
    // over collapsed value counts, one double division at the close.
    "agg_trimmed_mean" -> ((s, dir) =>
      graft.ops.Robust.trimmedMean(
        table(s, dir, "lineitem").select(col("l_returnflag"),
          col("l_quantity")),
        "l_returnflag", "l_quantity", trim = 0.1)),

    // Deterministic hash-sampled quantiles — the ORACLE-CHECKABLE
    // approximate percentile (vs agg_sketch_accuracy's rows-only
    // KLL/HLL): sample membership is a pure function of the row id, so
    // both engines rank the same 10% sample, and type-1 quantiles of
    // integer quantities are all-integer arithmetic. StatsSpec bounds
    // the sample-vs-exact error.
    "sketch_quantiles_sampled" -> ((s, dir) =>
      graft.ops.Robust.sampledQuantiles(
        table(s, dir, "lineitem"),
        "l_returnflag", "l_quantity",
        col("l_orderkey") * lit(8L) + col("l_linenumber"),
        permille = 100)),

    // 7-day trailing moving average of daily order revenue per priority —
    // a RANGE-frame window over the day number (counts calendar days, not
    // rows: gap days widen nothing). Decimal day-sums keep the mean's
    // numerator exact; one shuffle by priority.
    "agg_moving_avg" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority")).orderBy(col("day"))
        .rangeBetween(-6L, 0L)
      table(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        .select(col("o_orderpriority"), col("day"),
          col("rev").cast("double").as("rev"),
          (sum(col("rev")).over(w).cast("double") /
            count(lit(1)).over(w).cast("double")).as("ma7"))
    }),

    // GROUPING SETS beyond rollup: independent marginals + grand total in
    // one pass (flag), (status), () — partial aggregation replicates rows
    // per grouping id, never re-scans.
    "agg_grouping_sets" -> ((s, dir) => {
      table(s, dir, "lineitem").createOrReplaceTempView("li_gs")
      s.sql("""SELECT l_returnflag, l_linestatus,
              |  count(*) AS n, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
              |FROM li_gs
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |""".stripMargin)
    }),

    // Distribution drift: even-key lineitems are the baseline quantity
    // distribution; odd-key quantities shift +15 (pushing the tail into
    // the overflow bin) — per-bin PSI contributions must quantify it.
    "drift_psi" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      graft.ops.Drift.psiBins(
        li.filter(col("l_orderkey") % 2 === 0).select(col("l_quantity")),
        li.filter(col("l_orderkey") % 2 === 1)
          .select((col("l_quantity") + 15.0).as("l_quantity")),
        "l_quantity", lo = 0.0, hi = 60.0, bins = 12)
    }),

    // Categorical drift: even-key docs are the baseline language mix;
    // odd-key docs relabel every doc_id % 6 == 1 to 'en' (planted skew).
    "drift_lang_psi" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("lang"))
      graft.ops.Drift.psiCategorical(
        d.filter(col("doc_id") % 2 === 0).select(col("lang")),
        d.filter(col("doc_id") % 2 === 1)
          .select(when(col("doc_id") % 6 === 1, lit("en"))
            .otherwise(col("lang")).as("lang")),
        "lang")
    }),

    // Benford first-significant-digit audit over extended prices: exact
    // string-based digit extraction, literal 6dp expectation table (no
    // float-log drift between engines).
    "profile_benford_prices" -> ((s, dir) =>
      graft.ops.Profile.benfordDigits(table(s, dir, "lineitem"), "l_extendedprice")),

    // Class-balance report over embedding labels: per-class count, corpus
    // share, and the Cui et al. effective number of samples at β=0.999.
    "profile_class_balance" -> ((s, dir) =>
      graft.ops.Profile.classBalance(table(s, dir, "embeddings"), "label")),

    // k-anonymity release audit (Sweeney 2002): QI = (nation, market
    // segment); classes smaller than k=10 are re-identification risks a
    // release must generalize or suppress. One map-side-combinable
    // aggregate; the filter is on the aggregated class size.
    "privacy_k_anon" -> ((s, dir) =>
      Quality.kAnonymityRisky(table(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 10L)),

    // Distinct-l-diversity (Machanavajjhala 2007): QI = (nation, 1000-wide
    // balance bucket), sensitive = market segment; classes with l < 3 leak
    // the sensitive attribute even where k-anonymity holds.
    "privacy_l_diversity" -> ((s, dir) =>
      Quality.lDiversity(
        table(s, dir, "customer")
          .withColumn("bal_bucket", floor(col("c_acctbal") / 1000).cast("long")),
        Seq("c_nationkey", "bal_bucket"), "c_mktsegment")
        .where(col("l") < 3)),

    // t-closeness audit (Li et al. 2007), same QI/sensitive layout as the
    // l-diversity gate: classes whose market-segment distribution sits
    // > 0.3 variational distance from the global one — skew-leak classes
    // that k-anonymity and l-diversity both pass. Integer-exact EMD sum,
    // double only at the final normalization.
    "privacy_t_closeness" -> ((s, dir) =>
      Quality.tCloseness(
        table(s, dir, "customer")
          .withColumn("bal_bucket", floor(col("c_acctbal") / 1000).cast("long")),
        Seq("c_nationkey", "bal_bucket"), "c_mktsegment")
        .where(col("t_dist") > 0.3)),

    // Data-contract report over a deterministically dirtied lineitem:
    // planted nulls (shifted line numbers keep keys unique), out-of-range
    // quantities, exact duplicate keys and orphan order keys — the report
    // must count each fault class exactly.
    "dq_lineitem" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_quantity"))
      val nulls = li.filter(col("l_orderkey") % 997 === 0)
        .select(col("l_orderkey"), (col("l_linenumber") + 100).as("l_linenumber"),
          lit(null).cast("string").as("l_returnflag"), col("l_quantity"))
      val oob = li.filter(col("l_orderkey") % 991 === 0)
        .select(col("l_orderkey"), (col("l_linenumber") + 200).as("l_linenumber"),
          col("l_returnflag"), lit(999.0).as("l_quantity"))
      val dups = li.filter(col("l_orderkey") % 983 === 0)
      val orphans = li.filter(col("l_orderkey") % 977 === 0)
        .select((col("l_orderkey") + 2000000000L).as("l_orderkey"),
          col("l_linenumber"), col("l_returnflag"), col("l_quantity"))
      val dirty = li.unionAll(nulls).unionAll(oob)
        .unionAll(dups).unionAll(orphans)
      graft.ops.Quality.contractReport(dirty,
        nullCols = Seq("l_returnflag"),
        rangeCol = "l_quantity", lo = 1.0, hi = 50.0,
        keyCols = Seq("l_orderkey", "l_linenumber"),
        parent = table(s, dir, "orders"),
        childKey = "l_orderkey", parentKey = "o_orderkey")
    }),

    // Exact equi-width histogram of order totals: 32 × 25k buckets,
    // clamped edges. Bin id is one IEEE divide + floor — bit-identical
    // across engines; per-bin stats are count/min/max (no double sums).
    "agg_histogram_prices" -> ((s, dir) =>
      graft.ops.Profile.histogram(table(s, dir, "orders"),
        "o_totalprice", lo = 0.0, width = 25000.0, bins = 32)),

    // Per-status modal order priority with the deterministic
    // (count desc, value asc) tie-break.
    "agg_mode_priority" -> ((s, dir) =>
      graft.ops.Profile.modeBy(table(s, dir, "orders"),
        "o_orderstatus", "o_orderpriority")),

    // ANALYZE-style per-column statistics (CBO inputs): counts, exact
    // ndv, typed extremes; one pruned single-column scan per column.
    "profile_table_stats" -> ((s, dir) =>
      graft.ops.Profile.tableStats(table(s, dir, "lineitem"),
        Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))),

    // Functional-dependency profiling: does A determine B? A→B holds iff
    // |distinct A| == |distinct (A,B)| — two count-distinct aggregates
    // per candidate, unioned. Discovers the key structure a layout/
    // normalization decision needs.
    "profile_fd_check" -> ((s, dir) => {
      def fd(df: DataFrame, lhs: String, rhs: String) = df
        .agg(countDistinct(col(lhs)).as("n_lhs"),
          countDistinct(col(lhs), col(rhs)).as("n_pairs"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_lhs"), col("n_pairs"),
          (col("n_lhs") === col("n_pairs")).as("holds"))
      val o = table(s, dir, "orders")
      val li = table(s, dir, "lineitem")
      fd(o, "o_orderkey", "o_custkey")
        .unionAll(fd(o, "o_custkey", "o_orderpriority"))
        .unionAll(fd(li, "l_orderkey", "l_returnflag"))
        .unionAll(fd(li, "l_partkey", "l_suppkey"))
    }),

    // Exact Pearson correlation per group from one aggregate of exact
    // sums (x as LONG, y/x·y/y² as DECIMAL) — the OLS-trend pattern with
    // a sqrt closing step, operand order mirrored.
    // 2×2 Pearson chi-square on user-level conversion (user parity plays
    // A/B, converted = any purchase event): the experiment read-out an
    // analytics engine runs daily. χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d))
    // — every term an exact decimal(38,0) integer, double only at the
    // final division; significance at the 0.05 critical value 3.841.
    "ab_test_chi2" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val users = table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", lit(1L))
          .otherwise(lit(0L))).as("cv"))
        .select((col("user_id") % 2 === 0).as("ga"), col("cv"))
      val agg = users.agg(
        sum(when(col("ga") && col("cv") === 1L, 1L).otherwise(0L)).as("a"),
        sum(when(col("ga") && col("cv") === 0L, 1L).otherwise(0L)).as("b"),
        sum(when(!col("ga") && col("cv") === 1L, 1L).otherwise(0L)).as("c"),
        sum(when(!col("ga") && col("cv") === 0L, 1L).otherwise(0L)).as("d"))
      def D(c: Column) = c.cast(dec)
      val num = D(col("a") + col("b") + col("c") + col("d")) *
        (D(col("a")) * D(col("d")) - D(col("b")) * D(col("c"))) *
        (D(col("a")) * D(col("d")) - D(col("b")) * D(col("c")))
      val den = D(col("a") + col("b")) * D(col("c") + col("d")) *
        D(col("a") + col("c")) * D(col("b") + col("d"))
      // A degenerate margin (here: EVERY user converts, b = d = 0) makes
      // χ² undefined; define it as 0.0 — "no evidence of a difference" —
      // on both engines via an explicit den = 0 branch (a NULL cell would
      // render engine-specifically in the gate comparator, and ANSI mode
      // would throw on the raw divide). A decimal(38,0) OVERFLOW, by
      // contrast, propagates as null and fails the gate loudly rather
      // than masquerading as chi2 = 0 — only the defined degenerate case
      // maps to zero.
      val chi2 = when(den === lit(0).cast(dec), lit(0.0))
        .otherwise(num.cast("double") / den.cast("double"))
      agg.select(col("a"), col("b"), col("c"), col("d"),
        round(chi2, 6).as("chi2"), (chi2 > 3.841).as("significant"))
    }),

    // Mann-Whitney U (same parity split) — the nonparametric twin of the
    // Welch gate: values collapse to a count table, tie-averaged ranks
    // come from DOUBLED integer rank sums (2·R₁ = Σ n1(v)·(2·cum(v) −
    // n(v) + 1), exact in decimal), and the cumulative counts ride the
    // library's two-pass distributed prefix sum — no single-task global
    // window at any scale. Doubles only in the U/z closure, tie-corrected
    // variance included, operand order mirrored.
    // Offline CUSUM changepoint (Page/Pettitt estimator): the day
    // maximizing |Σ_{d≤t} x_d − t·S/D| over the daily event-count series,
    // kept integer-exact as |D·P_t − t·S| (no float prefix accumulation
    // anywhere). Prefix sums ride a window over the COLLAPSED day rows.
    // Single row: series length, the argmax day, the raw and normalized
    // statistic.
    "anomaly_cusum" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("x"))
      val tot = daily.agg(count(lit(1)).as("dcnt"), sum(col("x")).as("sx"))
      // prefix sums via the two-pass distributed scan (never a global
      // window — a single task holding every day); the constant-1 column
      // makes the day index ride the same pass as the running total
      graft.ops.Ranking.prefixSum(daily.withColumn("one", lit(1L)),
          Seq(col("day").asc), Seq("x", "one"))
        .withColumn("p", col("cum_x"))
        .withColumn("idx", col("cum_one"))
        .crossJoin(broadcast(tot))
        .withColumn("dev", abs(col("dcnt") * col("p") - col("idx") * col("sx")))
        .orderBy(col("dev").desc, col("day").asc).limit(1)
        .select(col("dcnt").as("n_days"), col("day").as("change_day"),
          col("idx").as("change_idx"), col("dev").as("max_dev"),
          round(col("dev").cast("double") / col("dcnt").cast("double"), 6)
            .as("cusum_stat"))
    }),

    // Pettitt rank-based changepoint over the daily event series — the
    // distribution-free companion to anomaly_cusum (which assumes a mean
    // shift in level; Pettitt detects a median shift under any
    // distribution). U_t = 2·W_t − t(n+1) with midranks, evaluated as the
    // all-integer form Σ(2L+T+2) − t(n+1) (L = strictly-smaller days,
    // T = ties excl self), so every statistic is 64-bit exact; the
    // windows walk the collapsed distinct-day/value rows. Verdict row:
    // argmax |U_t| with the standard 2·exp(−6K²/(n³+n²)) significance.
    "anomaly_pettitt" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
          .as("day"))
        .agg(count(lit(1)).as("x"))
      // exclusive prefix (strictly-smaller count) = inclusive cum − own
      val vals = graft.ops.Ranking.prefixSum(
          daily.groupBy(col("x")).agg(count(lit(1)).as("cnt")),
          Seq(col("x").asc), Seq("cnt"))
        .withColumn("lcnt", col("cum_cnt") - col("cnt"))
        .select(col("x"), col("cnt"), col("lcnt"))
      val tot = daily.agg(count(lit(1)).as("n"))
      def d(c: Column) = c.cast("double")
      graft.ops.Ranking.prefixSum(
          daily.join(broadcast(vals), "x")
            .withColumn("s2", lit(2L) * col("lcnt") + col("cnt") + 1L)
            .withColumn("one", lit(1L)),
          Seq(col("day").asc), Seq("s2", "one"))
        .withColumn("ws", col("cum_s2"))
        .withColumn("idx", col("cum_one"))
        .crossJoin(broadcast(tot))
        .filter(col("idx") < col("n")) // U_n ≡ 0, not a candidate
        .withColumn("u", col("ws") - col("idx") * (col("n") + 1L))
        .withColumn("k", abs(col("u")))
        .orderBy(col("k").desc, col("day").asc).limit(1)
        .select(col("n").as("n_days"), col("day").as("change_day"),
          col("idx").as("change_idx"), col("k").as("k_stat"),
          round(least(lit(1.0), lit(2.0) * exp(lit(-6.0) * d(col("k")) *
            d(col("k")) / (d(col("n")) * d(col("n")) * d(col("n")) +
              d(col("n")) * d(col("n"))))), 6).as("p_approx"))
    }),

    // Seasonality-adjusted robust anomaly days: day-of-week means come
    // off resample_seasonal_dow's fabric, residuals are rounded to exact
    // integer micro-units BEFORE the median/MAD (interpolated medians of
    // longs are FP-exact on both engines, unlike medians of raw doubles),
    // and a day flags when |residual − median| > 3·MAD — the robust
    // seasonal monitor that survives the outliers a z-score would absorb.
    "anomaly_seasonal_mad" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
          .as("day"),
          pmod(datediff(col("ts").cast("date"),
            lit("1970-01-01").cast("date")) + 4, lit(7)).as("dow"))
        .groupBy(col("day"), col("dow")).agg(count(lit(1)).as("x"))
      val dowMean = daily.groupBy(col("dow"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("nd"))
      def d(c: Column) = c.cast("double")
      val res = daily.join(broadcast(dowMean), Seq("dow"))
        .withColumn("rmic",
          round((d(col("x")) - d(col("sx")) / d(col("nd"))) * 1e6, 0)
            .cast("long"))
      val med = res.agg(percentile(col("rmic"), lit(0.5)).as("med"))
      val dev = res.crossJoin(broadcast(med))
        .withColumn("adev", abs(d(col("rmic")) - col("med")))
      val mad = dev.agg(percentile(col("adev"), lit(0.5)).as("mad"))
      dev.crossJoin(broadcast(mad))
        .select(col("day"), col("x"),
          round(d(col("rmic")) / 1e6, 6).as("residual"),
          (col("adev") > lit(3.0) * col("mad")).as("flagged"))
    }),

    // Delete-one-bucket jackknife standard error of the mean event value:
    // 32 hash buckets, leave-one-out means 6dp-rounded to decimals so the
    // jackknife moments are exact sums, SE from the closed moment form.
    // Distribution-free inference in two hash aggregates + a 32-row
    // closure — no resampling pass over the data.
    "agg_jackknife_se" -> ((s, dir) => {
      val byB = table(s, dir, "events")
        .select(pmod(col("user_id"), lit(32L)).as("b"),
          col("value").cast("decimal(18,6)").as("v"))
        .groupBy(col("b"))
        .agg(count(lit(1)).as("nb"), sum(col("v")).as("sb"))
      val tot = byB.agg(sum(col("nb")).as("n"), sum(col("sb")).as("s"))
      def d(c: Column) = c.cast("double")
      val loo = byB.crossJoin(broadcast(tot))
        .select(round((d(col("s")) - d(col("sb"))) / (d(col("n")) - d(col("nb"))), 6)
          .cast("decimal(18,6)").as("q"))
      val mom = loo.agg(count(lit(1)).as("nB"),
        sum(col("q")).as("sq"), sum(col("q") * col("q")).as("sqq"))
      val bD = d(col("nB"))
      val inner = d(col("sqq")) - d(col("sq")) * d(col("sq")) / bD
      mom.crossJoin(broadcast(tot)).select(
        col("n"), col("nB").as("n_buckets"),
        round(d(col("s")) / d(col("n")), 6).as("mean"),
        when(!(inner > 0.0), lit(0.0))
          .otherwise(round(sqrt((bD - 1.0) / bD * inner), 6)).as("se_jackknife"))
    }),

    // CUPED variance reduction (Deng et al. 2013): pre-period per-user
    // value mass as the covariate, θ = cov(x,y)/var(x) from exact decimal
    // moments, per-arm adjusted means. The period boundary is the integer
    // midpoint of the event-time range (computed in-plan, broadcast as one
    // row); one user-keyed aggregate builds (x, y), one moment aggregate
    // builds θ, the arm rollup is a 2-row closure. Output: one row per arm
    // with the shared θ / ρ² columns repeated (grain: arm).
    "ab_cuped_adjust" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("user_id"),
        unix_timestamp(col("ts")).as("sec"),
        col("value").cast("decimal(18,6)").as("v"))
      val bound = ev.agg(((min(col("sec")) + max(col("sec"))) / 2)
        .cast("long").as("mid"))
      val xy = ev.crossJoin(broadcast(bound))
        .groupBy(col("user_id"))
        .agg(sum(when(col("sec") < col("mid"), col("v"))).as("__x0"),
          sum(when(col("sec") >= col("mid"), col("v"))).as("__y0"))
        .select(col("user_id"), (col("user_id") % 2 === 0).as("ga"),
          coalesce(col("__x0"), lit(0).cast("decimal(18,6)")).as("x"),
          coalesce(col("__y0"), lit(0).cast("decimal(18,6)")).as("y"))
      val mom = xy.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      def d(c: Column) = c.cast("double")
      val nD = d(col("n"))
      val varX = d(col("sxx")) - d(col("sx")) * d(col("sx")) / nD
      val varY = d(col("syy")) - d(col("sy")) * d(col("sy")) / nD
      val covXY = d(col("sxy")) - d(col("sx")) * d(col("sy")) / nD
      val thetaC = when(!(varX > 0.0), lit(0.0)).otherwise(covXY / varX)
      val rho2C = when(!(varX > 0.0) || !(varY > 0.0), lit(0.0))
        .otherwise((covXY / varX) * (covXY / varY))
      val stats = mom.select(thetaC.as("theta"), rho2C.as("rho2"),
        (d(col("sx")) / nD).as("mean_x_all"))
      val arms = xy.groupBy(col("ga")).agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("asx"), sum(col("y")).as("asy"))
      arms.crossJoin(broadcast(stats))
        .select(col("ga").as("arm_a"), col("n_users"),
          round(d(col("asy")) / d(col("n_users")), 6).as("mean_y"),
          round(d(col("asx")) / d(col("n_users")), 6).as("mean_x"),
          round(d(col("asy")) / d(col("n_users")) -
            col("theta") * (d(col("asx")) / d(col("n_users")) - col("mean_x_all")),
            6).as("mean_adjusted"),
          round(col("theta"), 6).as("theta"),
          round(col("rho2"), 6).as("rho2"))
    }),

    // Difference-in-differences over the same arm × period grid: the 2×2
    // cell means (exact decimal sums / integer counts) and the DiD
    // estimate in one closure — the guardrail read-out when assignment
    // isn't randomized. Single row.
    "ab_diff_in_diff" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("user_id"),
        unix_timestamp(col("ts")).as("sec"),
        col("value").cast("decimal(18,6)").as("v"))
      val bound = ev.agg(((min(col("sec")) + max(col("sec"))) / 2)
        .cast("long").as("mid"))
      val cells = ev.crossJoin(broadcast(bound))
        .select((col("user_id") % 2 === 0).as("t"),
          (col("sec") >= col("mid")).as("post"), col("v"))
        .groupBy(col("t"), col("post"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      def d(c: Column) = c.cast("double")
      val m = cells.select(col("t"), col("post"),
        (d(col("sv")) / d(col("n"))).as("m"))
      def cell(t: Boolean, post: Boolean, name: String) =
        m.filter(col("t") === t && col("post") === post)
          .select(col("m").as(name))
      cell(true, false, "m_t_pre")
        .crossJoin(broadcast(cell(true, true, "m_t_post")))
        .crossJoin(broadcast(cell(false, false, "m_c_pre")))
        .crossJoin(broadcast(cell(false, true, "m_c_post")))
        .select(round(col("m_t_pre"), 6).as("mean_treat_pre"),
          round(col("m_t_post"), 6).as("mean_treat_post"),
          round(col("m_c_pre"), 6).as("mean_ctrl_pre"),
          round(col("m_c_post"), 6).as("mean_ctrl_post"),
          round((col("m_t_post") - col("m_t_pre")) -
            (col("m_c_post") - col("m_c_pre")), 6).as("did"))
    }),

    // Poisson bootstrap CI of the mean event value (Chamandy et al.,
    // "Estimating Uncertainty for Massive Data Streams" — the resampling
    // scheme that distributes: each row independently draws a Poisson(1)
    // replication weight per replicate, so no global N or sampling pass is
    // needed). Weights are DETERMINISTIC: the engine-neutral Knuth hash of
    // (event_id·B + r) folded to 32 bits and inverted through the exact
    // integer-threshold Poisson(1) CDF. One explode(×64) feeding a 64-group
    // hash aggregate (map-side combine ⇒ shuffle is 64 rows/partition),
    // then a 64-row percentile closure — no per-replicate data passes.
    "agg_bootstrap_ci" -> ((s, dir) => {
      val B = 64
      // floor(CDF_Poisson(1)(k) · 2^32), k = 0..8; h >= last ⇒ weight 9.
      val ths = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
        4279248373L, 4292415291L, 4294609777L, 4294923276L, 4294962463L)
      def kn32(x: Column): Column =
        pmod(pmod(x, lit(1000000007L)) * lit(2654435761L), lit(4294967296L))
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("value").cast("decimal(18,6)").as("v"))
      val rep = ev
        .select(col("event_id"), col("v"),
          explode(sequence(lit(0), lit(B - 1))).as("r"))
        .withColumn("h", kn32(col("event_id") * B + col("r")))
        .withColumn("w", ths.zipWithIndex.foldRight(lit(9)) {
          case ((t, k), rest) => when(col("h") < t, k).otherwise(rest)
        }.cast("long"))
        .groupBy(col("r"))
        .agg(sum(col("w")).as("nw"),
          sum(col("w").cast("decimal(2,0)") * col("v")).as("sv"))
        .select(col("r"), when(col("nw") > 0L,
          round(col("sv").cast("double") / col("nw").cast("double"), 6))
          .otherwise(lit(0.0)).as("m"))
      // percentile index ⌈α·B⌉: 2.5% → 2nd smallest, 97.5% → 63rd.
      // The replicate frame is exactly B = 64 rows by construction, so
      // the order statistics come from one bounded sorted-array
      // aggregate (the agg_theil_sen device) — no ranking window.
      val ci = rep
        .agg(sort_array(collect_list(struct(col("m"), col("r")))).as("a"),
          count(lit(1)).as("n_boot"))
        .select(col("n_boot"),
          element_at(col("a"), 2).getField("m").as("ci_lo"),
          element_at(col("a"), 63).getField("m").as("ci_hi"))
      val full = ev.agg(count(lit(1)).as("n"),
        round(sum(col("v")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("mean"))
      full.crossJoin(broadcast(ci))
        .select(col("n"), col("mean"), col("n_boot"), col("ci_lo"), col("ci_hi"))
    }),

    // Mutual information (nats) between return flag and line status, plus
    // marginal entropies and NMI — the feature-redundancy probe. Per-cell
    // log-ratios are rounded to integer NANO-units the moment they leave
    // libm (the AUC/negative-table device), so every downstream sum is
    // exact integer arithmetic — no double accumulation order, and no
    // decimal-precision-38 product truncation. One contingency aggregate
    // (6 cells), marginals derived FROM the cells — a single fact pass.
    "agg_mutual_info" -> ((s, dir) => {
      // The joint histogram has |X|·|Y| cells (two low-cardinality
      // categoricals → ≤ ~9 rows), so ALL marginals ride as windows over
      // the one cells aggregate instead of separate re-aggregations: the
      // old mx/my/tot + three joins shape consumed the cells subtree four
      // times, and Spark recomputes an unshared subtree per consumer —
      // four full lineitem scans for a 9-row table. One scan now; the
      // whole-frame window is safe exactly because cells is cell-scale,
      // never row-scale.
      // persisted so the grand-total aggregate and the marginal windows
      // both read the one materialized 9-row table instead of paying the
      // lineitem scan twice (Bench reclaims it via releaseOwned)
      val cells = graft.core.Memo.ownedPersist(table(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("x"), col("l_linestatus").as("y"))
        .agg(count(lit(1)).as("nxy")))
      import org.apache.spark.sql.expressions.Window
      val wx = Window.partitionBy(col("x"))
      val wy = Window.partitionBy(col("y"))
      // grand total as a 1-row broadcast (bound-frame), never a
      // whole-frame window — an empty partition spec is one task
      val nTot = cells.agg(sum(col("nxy")).as("n"))
      val withMarg = cells
        .withColumn("nx", sum(col("nxy")).over(wx))
        .withColumn("ny", sum(col("nxy")).over(wy))
        .crossJoin(broadcast(nTot))
        .withColumn("rx", row_number().over(wx.orderBy(col("y").asc)))
        .withColumn("ry", row_number().over(wy.orderBy(col("x").asc)))
      def d(c: Column) = c.cast("double")
      def nano(c: Column) = round(c * 1.0e9, 0).cast("long")
      val out = withMarg
        .select(col("n"), col("x"), col("y"), col("rx"), col("ry"),
          (col("nxy") * nano(log(d(col("n")) * d(col("nxy")) /
            (d(col("nx")) * d(col("ny")))))).cast("decimal(38,0)").as("mi_t"),
          (col("nx") * nano(log(d(col("nx")) / d(col("n")))))
            .cast("decimal(38,0)").as("hx_t"),
          (col("ny") * nano(log(d(col("ny")) / d(col("n")))))
            .cast("decimal(38,0)").as("hy_t"))
        .groupBy(col("n")).agg(
          sum(col("mi_t")).as("mi_s"),
          sum(when(col("rx") === 1, col("hx_t"))).as("hx_s"),
          sum(when(col("ry") === 1, col("hy_t"))).as("hy_s"),
          countDistinct(col("x")).as("k_x"),
          countDistinct(col("y")).as("k_y"))
      val den = d(col("n")) * 1.0e9
      val miV = d(col("mi_s")) / den
      val hxV = -d(col("hx_s")) / den
      val hyV = -d(col("hy_s")) / den
      out.select(col("n"), col("k_x"), col("k_y"),
        round(miV, 6).as("mi_nats"),
        round(hxV, 6).as("h_x"), round(hyV, 6).as("h_y"),
        when(!(hxV * hyV > 0.0), lit(0.0))
          .otherwise(round(miV / sqrt(hxV * hyV), 6)).as("nmi"))
    }),

    // Always-valid sequential two-proportion monitor: the daily cumulative
    // GLR (log generalized-likelihood ratio) trace for purchase-rate
    // difference between arms — the "peek every day without inflating α"
    // readout (Wald SPRT boundary ln(1/α)). Every statistic is computed
    // per-row from CUMULATIVE INTEGER counts (prefix sums over collapsed
    // day rows), so there is no floating accumulation: same day → same
    // llr, bit-for-bit, on any engine. xln(0) terms are zero-guarded.
    "ab_sequential_glr" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          (col("user_id") % 2 === 0).as("ga"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("conv"))
        .groupBy(col("day"))
        .agg(sum(when(col("ga"), 1L).otherwise(0L)).as("dt1"),
          sum(when(col("ga"), col("conv"))).as("ds1"),
          sum(when(!col("ga"), 1L).otherwise(0L)).as("dt2"),
          sum(when(!col("ga"), col("conv"))).as("ds2"))
      // all four cumulative count series in ONE two-pass distributed
      // scan (exact long sums — no float accumulation, no global window)
      val cum = graft.ops.Ranking.prefixSum(daily, Seq(col("day").asc),
          Seq("dt1", "ds1", "dt2", "ds2"))
        .withColumn("t1", col("cum_dt1"))
        .withColumn("s1", col("cum_ds1"))
        .withColumn("t2", col("cum_dt2"))
        .withColumn("s2", col("cum_ds2"))
      def d(c: Column) = c.cast("double")
      // xln-ratio with the x = 0 arm zeroed: s·ln((s/t)/p) over p pooled.
      def xlnr(x: Column, t: Column, p: Column): Column =
        when(x > 0L, d(x) * log(d(x) / d(t) / p)).otherwise(lit(0.0))
      val p = (d(col("s1")) + d(col("s2"))) / (d(col("t1")) + d(col("t2")))
      val llr =
        xlnr(col("s1"), col("t1"), p) +
        xlnr(col("t1") - col("s1"), col("t1"), lit(1.0) - p) +
        xlnr(col("s2"), col("t2"), p) +
        xlnr(col("t2") - col("s2"), col("t2"), lit(1.0) - p)
      cum.select(col("day"), col("t1"), col("s1"), col("t2"), col("s2"),
        round(llr, 6).as("llr"),
        (round(llr, 6) >= 2.995732).as("crossed"))
    }),

    // Sample-ratio-mismatch guardrail: the FIRST check any A/B readout
    // must pass — do the assignment counts match the designed 50/50
    // split? χ²(1df) over distinct assigned users reduces to the exact
    // integer form (n1−n2)²/(n1+n2); flag at the 95% quantile. A failed
    // SRM invalidates every downstream metric, which is why this ships
    // as its own gate rather than a footnote on the t-test.
    "ab_srm_check" -> ((s, dir) => {
      val arms = table(s, dir, "events")
        .select(col("user_id")).distinct()
        .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("user_id") % 2 =!= 0, 1L).otherwise(0L)).as("n2"))
      def d(c: Column) = c.cast("double")
      val diff = col("n1") - col("n2")
      val chi2 = d(diff * diff) / d(col("n1") + col("n2"))
      arms.select(col("n1"), col("n2"),
        round(chi2, 6).as("chi2"),
        (round(chi2, 6) > 3.841459).as("srm_detected"))
    }),

    // Benjamini–Hochberg FDR correction (q = 0.10) over the per-nation
    // one-sample z-tests of customer balance against the global mean —
    // the multiple-testing guardrail an experimentation platform applies
    // before reporting 25 simultaneous "significant" segments. Moments are
    // exact decimal sums; the p-value evaluates the shared A&S erf
    // approximation (ops/Gauss — one constant set feeds both engines) and
    // is 6dp-rounded BEFORE the step-up comparison so the accept/reject
    // frontier is engine-identical. The rank/step-up windows walk the
    // 25-row collapsed table, never raw customers.
    "ab_fdr_bh" -> ((s, dir) => {
      val cust = table(s, dir, "customer")
        .select(col("c_nationkey"), col("c_acctbal").cast("decimal(18,2)").as("b"))
      val glob = cust.agg(count(lit(1)).as("na"), sum(col("b")).as("sx"),
        sum(col("b") * col("b")).as("sxx"),
        countDistinct(col("c_nationkey")).as("m"))
      def d(c: Column) = c.cast("double")
      val scored = cust.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("b")).as("sg"))
        .crossJoin(broadcast(glob))
        .withColumn("mean_all", d(col("sx")) / d(col("na")))
        .withColumn("var_all",
          (d(col("sxx")) - d(col("sx")) * d(col("sx")) / d(col("na"))) /
            (d(col("na")) - 1.0))
        .withColumn("z",
          (d(col("sg")) / d(col("n")) - col("mean_all")) /
            sqrt(col("var_all") / d(col("n"))))
        .withColumn("p", round(graft.ops.Gauss.twoSidedP(col("z")), 6))
      val thresh = d(col("k")) * 0.1 / d(col("m"))
      // BH rank via the distributed index pass; the step-up frontier
      // k* is a global MAX — a 1-row broadcast, not a whole-frame
      // window. No extra persist: prefixSum's range-shuffle map output
      // serves both consumers (the k* aggregate and the final select),
      // and the second-pass map is a narrow re-read.
      val withK =
        graft.ops.Ranking.prefixSum(scored.withColumn("one", lit(1L)),
          Seq(col("p").asc, col("c_nationkey").asc), Seq("one"))
          .withColumn("k", col("cum_one").cast("int"))
      val kstarRow = withK.agg(coalesce(
        max(when(col("p") <= thresh, col("k"))), lit(0)).as("kstar"))
      withK.crossJoin(broadcast(kstarRow))
        .select(col("c_nationkey"), col("n"),
          round(col("z"), 6).as("z"), col("p").as("p_value"),
          col("k").cast("long").as("k"),
          round(thresh, 6).as("bh_thresh"),
          (col("k") <= col("kstar")).as("rejected"))
    }),

    // Hashing-trick feature cross: (order priority × market segment)
    // crossed into 64 buckets via the engine-neutral string fold hash
    // (ops/Shaping.stringPolyHash — xxhash/md5 exist on only one engine),
    // with the collision audit a feature platform runs before committing
    // to a width: rows per bucket, distinct raw crosses per bucket, and
    // the collided flag. One join + two hash aggregates.
    "feature_hash_cross" -> ((s, dir) => {
      val crossed = table(s, dir, "orders")
        .join(table(s, dir, "customer").select("c_custkey", "c_mktsegment"),
          col("o_custkey") === col("c_custkey"))
        .select(concat(col("o_orderpriority"), lit("#"), col("c_mktsegment"))
          .as("cross"))
      crossed
        .withColumn("bucket",
          pmod(graft.ops.Shaping.stringPolyHash(col("cross")), lit(64L)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("cross")).as("n_crosses"))
        .withColumn("collided", col("n_crosses") > 1L)
    }),

    // Differentially-private style noisy counts: per-nation customer
    // counts + Laplace(1/ε) noise (ε = 1) with the noise drawn from a
    // DETERMINISTIC uniform (knuth32 of the group key, inverse-CDF
    // transform) so the gate pins the mechanism's arithmetic end-to-end —
    // a production release swaps the seeded uniform for secure randomness
    // and keeps everything else. One hash aggregate; the noise closure is
    // per-group scalar math.
    "privacy_dp_counts" -> ((s, dir) => {
      val cnt = table(s, dir, "customer").groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_true"))
      def d(c: Column) = c.cast("double")
      val h = pmod(pmod(col("c_nationkey"), lit(1000000007L)) *
        lit(2654435761L), lit(4294967296L))
      val u = (d(h) + 0.5) / 4294967296.0
      val centered = u - 0.5
      val noise = -signum(centered) *
        log(lit(1.0) - lit(2.0) * abs(centered))
      cnt.select(col("c_nationkey"), col("n_true"),
        round(noise, 6).as("noise"),
        round(d(col("n_true")) + round(noise, 6), 6).as("n_dp"))
    }),

    // Numeric-profile correlation matrix: pairwise Pearson between the
    // four lineitem measures, every moment a 64-bit-exact integer sum
    // (dollars / basis points — dollar squares keep Σx² < 2^63 through
    // sf10) — the profiling staple a feature platform renders as the
    // heatmap. ONE pass builds all 15 moments; the 6-pair closure is
    // arithmetic over that single row.
    "profile_corr_matrix" -> ((s, dir) => {
      val m = table(s, dir, "lineitem").select(
        col("l_quantity").cast("long").as("x0"),
        round(col("l_extendedprice")).cast("long").as("x1"),
        round(col("l_discount") * 100).cast("long").as("x2"),
        round(col("l_tax") * 100).cast("long").as("x3"))
      val names = Seq("quantity", "price_usd", "discount_bp", "tax_bp")
      val aggs = (0 until 4).map(i => sum(col(s"x$i")).as(s"s$i")) ++
        (for (i <- 0 until 4; j <- i until 4)
          yield sum(col(s"x$i") * col(s"x$j")).as(s"q${i}_$j"))
      val mom = m.agg(count(lit(1)).as("n"), aggs: _*)
      def d(c: Column) = c.cast("double")
      // the closure multiplies in DOUBLE — n·Σx² overflows int64 at this
      // magnitude; identical longs convert to identical doubles on both
      // engines, so the 6dp rounding is still engine-exact
      val pairs = for (i <- 0 until 4; j <- i + 1 until 4) yield {
        val num = d(col("n")) * d(col(s"q${i}_$j")) -
          d(col(s"s$i")) * d(col(s"s$j"))
        val den = sqrt(
          (d(col("n")) * d(col(s"q${i}_$i")) - d(col(s"s$i")) * d(col(s"s$i"))) *
            (d(col("n")) * d(col(s"q${j}_$j")) - d(col(s"s$j")) * d(col(s"s$j"))))
        mom.select(lit(names(i)).as("col_x"), lit(names(j)).as("col_y"),
          col("n"),
          when(den > 0.0, round(num / den, 6)).otherwise(lit(0.0)).as("corr"))
      }
      pairs.reduce(_ union _)
    }),

    // Pre-experiment power analysis: per event type, the minimum
    // detectable effect at α = 0.05 / power = 0.8 given the observed arm
    // sizes and pooled variance (arms = user parity) — the "is this test
    // even worth running" number. Moments are exact decimal sums; the MDE
    // closure is pure double arithmetic on identical decimals, with the
    // z-quantile sum (1.959964 + 0.841621) as a shared literal. One hash
    // aggregate over the events.
    "ab_power_mde" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("event_type"),
        (col("user_id") % 2 === 0).as("a"),
        col("value").cast("decimal(18,6)").as("v"))
      def d(c: Column) = c.cast("double")
      val m = ev.groupBy(col("event_type")).agg(
        sum(when(col("a"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("a"), col("v"))).as("s1"),
        sum(when(!col("a"), col("v"))).as("s2"),
        sum(when(col("a"), col("v") * col("v"))).as("q1"),
        sum(when(!col("a"), col("v") * col("v"))).as("q2"))
      val ss1 = d(col("q1")) - d(col("s1")) * d(col("s1")) / d(col("n1"))
      val ss2 = d(col("q2")) - d(col("s2")) * d(col("s2")) / d(col("n2"))
      val varP = (ss1 + ss2) / (d(col("n1")) + d(col("n2")) - 2.0)
      val mean = (d(col("s1")) + d(col("s2"))) / (d(col("n1")) + d(col("n2")))
      val mde = lit(1.959964 + 0.841621) *
        sqrt(varP * (lit(1.0) / d(col("n1")) + lit(1.0) / d(col("n2"))))
      m.select(col("event_type"), col("n1"), col("n2"),
        round(mean, 6).as("mean"), round(sqrt(varP), 6).as("sd_pooled"),
        round(mde, 6).as("mde_abs"),
        when(mean > 0.0, round(mde / mean, 6)).otherwise(lit(0.0))
          .as("mde_rel"))
    }),

    // Orthogonal experiment layers: two independent hash assignments per
    // user (salted knuth32, shard from the HIGH bits — the low bits of a
    // multiplicative hash are unmixed) and the 2×2 chi-squared
    // independence check an experimentation platform runs before letting
    // layers overlap. One distinct + one aggregate; exact integer counts.
    "ab_layered_assign" -> ((s, dir) => {
      def h(idc: Column) =
        pmod(pmod(idc, lit(1000000007L)) * lit(2654435761L), lit(4294967296L))
      def shard2(hc: Column) = shiftright(hc * 2L, 32)
      val u = table(s, dir, "events").select(col("user_id")).distinct()
        .select(shard2(h(col("user_id"))).as("l1"),
          shard2(h(col("user_id") + 1000003L)).as("l2"))
      def d(c: Column) = c.cast("double")
      val m = u.agg(
        sum(when(col("l1") === 0 && col("l2") === 0, 1L).otherwise(0L)).as("n00"),
        sum(when(col("l1") === 0 && col("l2") === 1, 1L).otherwise(0L)).as("n01"),
        sum(when(col("l1") === 1 && col("l2") === 0, 1L).otherwise(0L)).as("n10"),
        sum(when(col("l1") === 1 && col("l2") === 1, 1L).otherwise(0L)).as("n11"))
      val n = col("n00") + col("n01") + col("n10") + col("n11")
      val det = col("n00") * col("n11") - col("n01") * col("n10")
      val den = d((col("n00") + col("n01")) * (col("n10") + col("n11"))) *
        d((col("n00") + col("n10")) * (col("n01") + col("n11")))
      val chi2 = when(den > 0.0, round(d(n) * d(det) * d(det) / den, 6))
        .otherwise(lit(0.0))
      m.select(col("n00"), col("n01"), col("n10"), col("n11"),
        chi2.as("chi2"), (chi2 <= 3.841459).as("independent"))
    }),

    // Weight-of-evidence / information-value table of quantity buckets
    // against the return flag — the credit-scoring-style predictive-power
    // screen for a candidate feature. WoE_b = ln((good_b/G)/(bad_b/B))
    // from integer counts (deterministic per bucket); IV terms rounded to
    // 9dp decimals so the total is an exact decimal sum. One-sided empty
    // buckets take the documented WoE := 0 guard (no smoothing).
    "feature_woe_iv" -> ((s, dir) => {
      val byB = table(s, dir, "lineitem")
        .select(expr("CAST(l_quantity AS BIGINT) div 10").as("bucket"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("bad"))
        .groupBy(col("bucket"))
        .agg(sum(lit(1L) - col("bad")).as("n_good"), sum(col("bad")).as("n_bad"))
      val tot = byB.agg(sum(col("n_good")).as("tg"), sum(col("n_bad")).as("tb"))
      def d(c: Column) = c.cast("double")
      val shareG = d(col("n_good")) / d(col("tg"))
      val shareB = d(col("n_bad")) / d(col("tb"))
      val woe = when(col("n_good") === 0L || col("n_bad") === 0L, lit(0.0))
        .otherwise(round(log(shareG / shareB), 6))
      byB.crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_good"), col("n_bad"),
          woe.as("woe"),
          when(col("n_good") === 0L || col("n_bad") === 0L, lit(0.0))
            .otherwise(round((shareG - shareB) * log(shareG / shareB), 9))
            .as("iv_term"))
    }),

    // Theil T inequality index of order values with the within/between
    // decomposition over order priorities — the inequality read-out that
    // (unlike Gini) decomposes additively, so a mixing pipeline can see
    // WHERE concentration lives. Per-row x·ln(x) terms are rounded to
    // integer micro-units at the libm boundary (exact integer sums);
    // the 5-group between-component closure rounds each group term to
    // 9dp decimal before the exact decimal fold. Guards: x > 0 rows only
    // (Theil's domain), ln via shared doubles.
    "agg_theil_decomp" -> ((s, dir) => {
      def d(c: Column) = c.cast("double")
      val rows = table(s, dir, "orders")
        .filter(col("o_totalprice") > 0.0)
        .select(col("o_orderpriority").as("g"),
          col("o_totalprice").cast("decimal(18,6)").as("x"))
      val byG = rows.groupBy(col("g")).agg(
        count(lit(1)).as("ng"), sum(col("x")).as("sg"),
        sum(round(d(col("x")) * log(d(col("x"))) * 1.0e6, 0)
          .cast("long").cast("decimal(38,0)")).as("xlg"))
      val tot = byG.agg(sum(col("ng")).as("n"), sum(col("sg")).as("sx"),
        sum(col("xlg")).as("xl"))
      val mu = d(col("sx")) / d(col("n"))
      val tTotal = (d(col("xl")) / 1.0e6) / (d(col("n")) * mu) - log(mu)
      val totRow = tot.select(col("n"),
        round(mu, 6).as("mean"), round(tTotal, 6).as("theil_total"),
        col("sx").as("__sx"), col("n").as("__n"))
      val between = byG.crossJoin(broadcast(totRow.select(
          col("__sx"), col("__n"))))
        .select((round((d(col("sg")) / d(col("__sx"))) *
          log((d(col("sg")) / d(col("ng"))) /
            (d(col("__sx")) / d(col("__n")))), 9))
          .cast("decimal(18,9)").as("tb"))
        .agg(sum(col("tb")).as("tbs"), count(lit(1)).as("k_groups"))
      totRow.crossJoin(broadcast(between))
        .select(col("n"), col("k_groups"), col("mean"), col("theil_total"),
          round(d(col("tbs")), 6).as("theil_between"),
          round(col("theil_total") - d(col("tbs")), 6).as("theil_within"))
    }),

    // Neyman optimal allocation of a 1000-unit sample across market
    // segments: n_h ∝ N_h·σ_h (exact decimal moments; σ rounded to 6dp
    // decimal BEFORE the weight products so the allocation denominator is
    // an exact decimal sum, not an order-dependent double fold). Output is
    // one row per stratum with the proportional allocation alongside — the
    // design table a stratified sampling pass consumes.
    "sample_neyman_alloc" -> ((s, dir) => {
      val byH = table(s, dir, "customer")
        .select(col("c_mktsegment").as("segment"),
          col("c_acctbal").cast("decimal(18,6)").as("v"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_pop"), sum(col("v")).as("sv"),
          sum(col("v") * col("v")).as("svv"))
      def d(c: Column) = c.cast("double")
      val nD = d(col("n_pop"))
      val varH = (d(col("svv")) - d(col("sv")) * d(col("sv")) / nD) / (nD - 1.0)
      val sd = byH.select(col("segment"), col("n_pop"),
        when(!(varH > 0.0), lit(0.0)).otherwise(round(sqrt(varH), 6))
          .cast("decimal(18,6)").as("sd"))
        .withColumn("wgt", col("n_pop").cast("decimal(18,6)") * col("sd"))
      val tot = sd.agg(sum(col("wgt")).as("wtot"), sum(col("n_pop")).as("ntot"))
      sd.crossJoin(broadcast(tot))
        .select(col("segment"), col("n_pop"), col("sd").cast("double").as("sd"),
          round(lit(1000.0) * d(col("wgt")) / d(col("wtot")), 0).cast("long")
            .as("alloc_neyman"),
          round(lit(1000.0) * d(col("n_pop")) / d(col("ntot")), 0).cast("long")
            .as("alloc_prop"))
    }),

    "agg_mannwhitney" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val byV = table(s, dir, "events")
        .select((col("user_id") % 2 === 0).as("ga"),
          col("value").cast("decimal(18,6)").as("v"))
        .groupBy(col("v"))
        .agg(sum(when(col("ga"), 1L).otherwise(0L)).as("n1v"),
          sum(when(!col("ga"), 1L).otherwise(0L)).as("n2v"))
        .withColumn("nv", col("n1v") + col("n2v"))
      val cum = graft.ops.Ranking.prefixSum(byV, Seq(col("v").asc), Seq("nv"))
      val agg = cum.agg(
        sum(col("n1v")).as("n1"), sum(col("n2v")).as("n2"),
        sum(col("n1v").cast(dec) *
          (lit(2).cast(dec) * col("cum_nv").cast(dec) -
            col("nv").cast(dec) + lit(1).cast(dec))).as("r1x2"),
        sum(col("nv").cast(dec) * col("nv").cast(dec) * col("nv").cast(dec) -
          col("nv").cast(dec)).as("tie"))
      def d(c: Column) = c.cast("double")
      val (n1, n2) = (d(col("n1")), d(col("n2")))
      val n = d(col("n1") + col("n2"))
      val u1 = (d(col("r1x2")) - n1 * (n1 + 1)) / 2
      val variance = n1 * n2 / 12.0 *
        ((n + 1) - d(col("tie")) / (n * (n - 1)))
      // All-tied input (or an empty arm) makes the tie-corrected variance
      // exactly 0 — define z := 0 explicitly on both engines instead of
      // leaking engine-specific 0/0 semantics (same pattern as chi2's den=0).
      agg.select(col("n1"), col("n2"),
        round(u1, 6).as("u1"),
        when(!(variance > 0.0), lit(0.0)) // NaN-safe: n<2 makes variance NaN
          .otherwise(round((u1 - n1 * n2 / 2) / sqrt(variance), 6)).as("z"))
    }),

    // Welch's two-sample t on event values (same parity split): exact
    // decimal Σx / Σx² per arm, the t closure in double with mirrored
    // operand order — the unequal-variance default every experimentation
    // stack should use.
    "agg_welch_ttest" -> ((s, dir) => {
      val x = col("value").cast("decimal(18,6)")
      val agg = table(s, dir, "events")
        .select((col("user_id") % 2 === 0).as("ga"), x.as("__x"))
        .agg(
          sum(when(col("ga"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("ga"), col("__x"))).as("sx1"),
          sum(when(col("ga"), col("__x") * col("__x"))).as("sxx1"),
          sum(when(!col("ga"), 1L).otherwise(0L)).as("n2"),
          sum(when(!col("ga"), col("__x"))).as("sx2"),
          sum(when(!col("ga"), col("__x") * col("__x"))).as("sxx2"))
      def d(c: Column) = c.cast("double")
      val (n1, n2) = (d(col("n1")), d(col("n2")))
      val m1 = d(col("sx1")) / n1
      val m2 = d(col("sx2")) / n2
      val v1 = (d(col("sxx1")) - d(col("sx1")) * d(col("sx1")) / n1) / (n1 - 1)
      val v2 = (d(col("sxx2")) - d(col("sx2")) * d(col("sx2")) / n2) / (n2 - 1)
      val se2 = v1 / n1 + v2 / n2
      agg.select(col("n1"), col("n2"),
        round(m1, 6).as("mean_a"), round(m2, 6).as("mean_b"),
        // Zero pooled variance (both arms constant) → t := 0 explicitly on
        // both engines, like chi2's den=0 branch (NaN-safe: n<2 → NaN se2).
        when(!(se2 > 0.0), lit(0.0))
          .otherwise(round((m1 - m2) / sqrt(se2), 6)).as("t_stat"))
    }),

    "agg_correlation" -> ((s, dir) => {
      val d = table(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_quantity").cast("long").as("__x"),
        col("l_extendedprice").cast("decimal(18,2)").as("__y"))
      val agg = d.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y")).as("__sy"),
        sum(col("__y") * col("__y")).as("__syy"),
        sum(col("__x").cast("decimal(10,0)") * col("__y")).as("__sxy"))
      val (nD, sxD, sxxD, syD, syyD, sxyD) = (col("n").cast("double"),
        col("__sx").cast("double"), col("__sxx").cast("double"),
        col("__sy").cast("double"), col("__syy").cast("double"),
        col("__sxy").cast("double"))
      agg.select(col("l_returnflag"), col("n"),
        round((nD * sxyD - sxD * syD) /
          sqrt((nD * sxxD - sxD * sxD) * (nD * syyD - syD * syD)), 6)
          .as("pearson_r"))
    }),

    // Higher central moments (skewness, excess kurtosis) per return flag
    // from EXACT integer power sums S1..S4 — one map-side-combinable hash
    // aggregate; the closing algebra runs in double with operand order
    // mirrored token-for-token in the oracle (left-assoc in both
    // engines), so the result is bit-identical, then round(6) absorbs
    // nothing but presentation. x ≤ 50 ⇒ S4 ≤ n·6.25e6, overflow-safe in
    // BIGINT far past 100 TB row counts.
    "agg_moments" -> ((s, dir) => {
      val d = table(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_quantity").cast("long").as("__x"))
      val agg = d.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__s1"),
        sum(col("__x") * col("__x")).as("__s2"),
        sum(col("__x") * col("__x") * col("__x")).as("__s3"),
        sum(col("__x") * col("__x") * col("__x") * col("__x")).as("__s4"))
      val nd = col("n").cast("double")
      val m = col("__s1").cast("double") / nd
      val r2 = col("__s2").cast("double") / nd
      val r3 = col("__s3").cast("double") / nd
      val r4 = col("__s4").cast("double") / nd
      val m2 = r2 - m * m
      val m3 = r3 - lit(3.0) * m * r2 + lit(2.0) * m * m * m
      val m4 = r4 - lit(4.0) * m * r3 + lit(6.0) * m * m * r2 -
        lit(3.0) * m * m * m * m
      // nullif: a constant-valued group has m2 = 0 — both engines must
      // agree on NULL instead of engine-specific NaN/Inf semantics.
      agg.select(col("l_returnflag"), col("n"),
        round(m, 6).as("mean_qty"),
        round(m3 / nullif(m2 * sqrt(m2), lit(0.0)), 6).as("skewness"),
        round(m4 / nullif(m2 * m2, lit(0.0)) - lit(3.0), 6).as("kurtosis"))
    }),

    // Exact Gini coefficient of per-customer revenue concentration:
    // G = (2·Σ rank·x) / (n·Σx) − (n+1)/n over ascending-sorted revenues.
    // Revenues are exact decimal sums; rank·x products and their sum stay
    // decimal (order-invariant); the closing formula is three exact
    // divisions in mirrored operand order. Ranking is the distributed
    // global rank, never a one-task window.
    "agg_gini_revenue" -> ((s, dir) => {
      val rev = table(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      val ranked = graft.ops.Ranking.globalRank(rev,
        Seq(col("rev").asc, col("o_custkey").asc))
      ranked.agg(count(lit(1)).as("__n"),
          sum(col("rev")).as("__sx"),
          sum(col("rank").cast("decimal(20,0)") * col("rev")).as("__sxr"))
        .select(
          col("__n").as("n_customers"),
          round(lit(2.0) * col("__sxr").cast("double") /
            (col("__n").cast("double") * col("__sx").cast("double")) -
            (col("__n") + 1L).cast("double") / col("__n").cast("double"), 6)
            .as("gini"))
    }),

    // Herfindahl–Hirschman concentration of supplier revenue within each
    // nation — the market-concentration read-out next to the Gini: HHI =
    // Σ share², share = supplier revenue / nation revenue. Revenue stays
    // exact integer cents×bp through both aggregates; shares are single
    // double divisions of those exact longs and the share² terms are
    // 12dp-rounded decimals, so the per-nation sum is order-free. Two hash
    // aggregates + a nation-keyed broadcast-back; no windows.
    "agg_hhi_revenue" -> ((s, dir) => {
      val cents = round(col("l_extendedprice") * 100).cast("long")
      val discBp = round(col("l_discount") * 100).cast("long")
      val bySupp = table(s, dir, "lineitem")
        .join(table(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"), col("s_suppkey"))
        .agg(sum(cents * (lit(100L) - discBp)).as("rev"))
      val byNation = bySupp.groupBy(col("s_nationkey"))
        .agg(sum(col("rev")).as("tot"))
      def dd(c: Column) = c.cast("double")
      bySupp.join(broadcast(byNation), "s_nationkey")
        .withColumn("sq",
          round(pow(dd(col("rev")) / dd(col("tot")), 2), 12)
            .cast("decimal(18,12)"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"),
          round(sum(col("sq")).cast("double"), 6).as("hhi"),
          round(max(dd(col("rev")) / dd(col("tot"))), 6).as("top_share"))
    }),

    // Two-sample Kolmogorov–Smirnov distance between the baseline (even
    // orderkeys) and a +15-shifted current (odd) quantity distribution —
    // the exact ECDF sup-distance, not an approximation. Values collapse
    // to per-value counts FIRST (|distinct values| rows), so the
    // cumulative window walks the tiny collapsed table; ECDF fractions
    // are single exact divisions. Deterministic argmax: (ks desc, v asc).
    "drift_ks" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val merged = li.select(
        when(col("l_orderkey") % 2 === 0, col("l_quantity"))
          .otherwise(col("l_quantity") + 15.0).as("v"),
        (col("l_orderkey") % 2 === 0).as("base"))
      val counts = merged.groupBy(col("v"))
        .agg(count(when(col("base"), lit(1))).as("c0"),
          count(when(!col("base"), lit(1))).as("c1"))
      val tot = counts.agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"))
      graft.ops.Ranking.prefixSum(counts, Seq(col("v").asc), Seq("c0", "c1"))
        .withColumn("cum0", col("cum_c0"))
        .withColumn("cum1", col("cum_c1"))
        .crossJoin(broadcast(tot))
        .select(col("v"),
          abs(col("cum0").cast("double") / col("n0").cast("double") -
            col("cum1").cast("double") / col("n1").cast("double")).as("d"))
        .orderBy(col("d").desc, col("v").asc).limit(1)
        .select(round(col("d"), 6).as("ks"), col("v").as("at_value"))
    }),

    // Incremental aggregate maintenance: two disjoint partitions of the
    // orders table aggregate independently, then MERGE algebraically
    // (counts add, decimal sums add, extremes min/max) — the oracle is
    // the direct full recompute, so the gate proves the merge algebra.
    "agg_incremental_update" -> ((s, dir) => {
      def part(even: Boolean) = table(s, dir, "orders")
        .filter(if (even) col("o_orderkey") % 2 === 0
                else col("o_orderkey") % 2 === 1)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("__n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("__s"),
          min(col("o_orderdate")).as("__d0"),
          max(col("o_orderdate")).as("__d1"))
      part(even = true).unionAll(part(even = false))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("__n")).as("n_rows"),
          sum(col("__s")).cast("double").as("revenue"),
          min(col("__d0")).as("first_date"),
          max(col("__d1")).as("last_date"))
    }),

    // Shannon entropy of the linestatus distribution per returnflag:
    // per-category -p·ln(p) contributions rounded to 6dp and summed as
    // DECIMAL (order-invariant; the tfidf ln-determinism precedent).
    "agg_entropy" -> ((s, dir) => {
      val c = table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("__n"))
      val tot = c.groupBy(col("l_returnflag")).agg(sum(col("__n")).as("__tot"))
      val p = col("__n").cast("double") / col("__tot").cast("double")
      c.join(broadcast(tot), "l_returnflag")
        .select(col("l_returnflag"),
          round(-(p * log(p)), 6).cast("decimal(18,6)").as("__h"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_categories"),
          sum(col("__h")).cast("double").as("entropy"))
    }),

    // Closed-form OLS trend: revenue-vs-day slope/intercept per priority
    // from one aggregate of exact sums (x sums as LONG, y and x·y as
    // DECIMAL), final arithmetic in mirrored-operand-order doubles.
    "agg_trend_slope" -> ((s, dir) => {
      val d = table(s, dir, "orders").select(col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("__x"),
        col("o_totalprice").cast("decimal(18,2)").as("__y"))
      val agg = d.groupBy(col("o_orderpriority")).agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x").cast("decimal(10,0)") * col("__y")).as("__sxy"))
      val (nD, sxD, sxxD, syD, sxyD) = (col("n").cast("double"),
        col("__sx").cast("double"), col("__sxx").cast("double"),
        col("__sy").cast("double"), col("__sxy").cast("double"))
      val slope = (nD * sxyD - sxD * syD) / (nD * sxxD - sxD * sxD)
      agg.select(col("o_orderpriority"), col("n"),
        round(slope, 6).as("slope"),
        round((syD - slope * sxD) / nD, 6).as("intercept"))
    }),

    // Spearman rank correlation between quantity and extended price:
    // midranks via the library's two-pass prefix sum over COLLAPSED value
    // groups (never a row-scale global window), doubled to integers
    // (2r = 2·cum − n + 1) so every moment is an exact decimal sum, then
    // the Pearson closure on the rank integers. The monotone-dependence
    // companion to the linear profile_corr_matrix — and on TPC-H these
    // two columns are strongly monotone but only loosely linear, so the
    // two gates are genuinely different numbers.
    "agg_spearman" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_quantity").cast("decimal(12,2)").as("x"),
          col("l_extendedprice").cast("decimal(12,2)").as("y"))
      val dec = "decimal(38,0)"
      // x (quantity) has ~50 distinct values → its midrank table is a
      // broadcast, so per-row rx costs nothing extra on the scan. The
      // near-unique y side is NEVER joined back at row scale: ONE
      // groupBy(y) carries the x-rank partials (Σrx, Σrx² within each
      // y-group) alongside the y tie counts, the y midranks ride the
      // same collapsed table via prefixSum, and every Pearson moment is
      // a group-weighted sum — Σrx·ry = Σ_y ry·(Σrx | y). The old shape
      // paid a second row-scale shuffle-join of lineitem against the
      // y-rank table; this one pays the groupBy(y) it already needed and
      // nothing else. All integer decimal sums — order-free, exact.
      // No explicit persists: prefixSum manages its own input-persist
      // window (repartitionByRange samples the input for range bounds —
      // see Ranking.withSampledInput), so each collapsed table here is
      // built exactly once.
      val gx = li.groupBy(col("x")).agg(count(lit(1)).as("n"))
      val rxT = graft.ops.Ranking.prefixSum(gx, Seq(col("x").asc), Seq("n"))
        .select(col("x"), (lit(2L) * col("cum_n") - col("n") + 1L).as("rx"))
      val gy = li.join(broadcast(rxT), Seq("x"))
        .groupBy(col("y")).agg(count(lit(1)).as("n"),
          sum(col("rx").cast(dec)).as("tx"),
          sum(col("rx").cast(dec) * col("rx").cast(dec)).as("sxx_y"))
      val withRy = graft.ops.Ranking
        .prefixSum(gy, Seq(col("y").asc), Seq("n"))
        .select(col("n"), col("tx"), col("sxx_y"),
          (lit(2L) * col("cum_n") - col("n") + 1L).cast(dec).as("ry"))
      val a = withRy.agg(sum(col("n")).as("n"),
        sum(col("tx")).as("sx"),
        sum(col("n").cast(dec) * col("ry")).as("sy"),
        sum(col("sxx_y")).as("sxx"),
        sum(col("n").cast(dec) * col("ry") * col("ry")).as("syy"),
        sum(col("tx") * col("ry")).as("sxy"))
      def d(c: Column) = c.cast("double")
      val nd = d(col("n"))
      val rho = (nd * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
        (sqrt(nd * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
          sqrt(nd * d(col("syy")) - d(col("sy")) * d(col("sy"))))
      a.select(col("n"), round(rho, 6).as("spearman"))
    }),

    // Quantile treatment effects at the quartiles: the distributional
    // companion to causal_dr_ate's mean effect (a treatment can move the
    // tails and leave the mean alone). Type-1 quantiles — the element at
    // rank ⌈n·q⌉, pure integer arithmetic (k = (n·p+3) div 4 for q=p/4)
    // over each arm's COLLAPSED (value, count) prefix sums, so both
    // engines pick the identical element with no interpolation float —
    // qte = q_treated − q_control exactly.
    "causal_qte" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select((col("user_id") % 3 === 0).as("__t"),
          col("value").cast("decimal(18,6)").as("v"))
      def armQuantiles(t: Boolean) = {
        val g = ev.filter(col("__t") === t)
          .groupBy(col("v")).agg(count(lit(1)).as("n"))
        val cum = graft.ops.Ranking.prefixSum(g, Seq(col("v").asc), Seq("n"))
        val tot = cum.agg(sum(col("n")).as("nt"))
        val ks = cum.crossJoin(broadcast(tot))
          .select(col("v"), col("cum_n"),
            explode(array((1 to 3).map(p =>
              struct(lit(p).as("p"),
                ((col("nt") * p + 3) / 4).cast("long").as("k"))): _*))
              .as("q"))
          .filter(col("cum_n") >= col("q.k"))
          .groupBy(col("q.p").as("p")).agg(min(col("v")).as("qv"))
        ks
      }
      armQuantiles(true).withColumnRenamed("qv", "q_treated")
        .join(armQuantiles(false).withColumnRenamed("qv", "q_control"),
          Seq("p"))
        .select((col("p").cast("double") / 4.0).as("q"),
          col("q_treated").cast("double").as("q_treated"),
          col("q_control").cast("double").as("q_control"),
          round(col("q_treated").cast("double") -
            col("q_control").cast("double"), 6).as("qte"))
    }),

    // Doubly-robust (AIPW) treatment-effect estimate: propensity from
    // the distributed IRLS logistic, per-arm OLS outcome models from ONE
    // conditional-sum moment pass, then the augmented IPW closure next
    // to the naive difference — the observational-readout composition
    // (consistent if EITHER model is right). user_id%3 plays treatment,
    // value the outcome, hour/day-of-week the confounder features; on
    // this independent assignment DR must land near the naive diff, and
    // both replay bit-for-bit through the oracle's CTE chain.
    "causal_dr_ate" -> ((s, dir) =>
      graft.ops.Glm.doublyRobustAte(table(s, dir, "events"),
        treated = when(col("user_id") % 3 === 0, 1.0).otherwise(0.0),
        outcome = col("value"),
        x1 = hour(col("ts")).cast("double") / 24.0,
        x2 = pmod(datediff(col("ts").cast("date"),
          lit("1970-01-01").cast("date")) + 4, lit(7)).cast("double") / 7.0,
        propIters = IrlsIters)),

    // Distributed logistic regression: P(purchase | value, hour) by 6
    // fixed IRLS/Newton steps — each step ONE aggregate of 12dp-decimal
    // Hessian/gradient cells over the events scan, the 3×3 solve closed-
    // form on the driver (Lloyd shape: collected state is O(p²), never
    // row-scale). The oracle unrolls the identical recurrence as a CTE
    // chain; exp() agrees bit-for-bit across engines on these inputs
    // (same guarantee the ln()-based LM gates already rely on).
    "ml_logreg_irls" -> ((s, dir) =>
      graft.ops.Glm.logisticIrls(table(s, dir, "events"),
        when(col("event_type") === "purchase", 1.0).otherwise(0.0),
        col("value") / 100.0,
        hour(col("ts")).cast("double") / 24.0,
        iters = IrlsIters)),

    // Theil–Sen robust trend: the MEDIAN of all pairwise slopes between
    // monthly revenue points (and the median-residual intercept) — the
    // breakdown-point-29% companion to agg_trend_slope's OLS, immune to
    // the outlier months OLS chases. The pair space is quadratic in the
    // SERIES length (≤ calendar months, ~80 → ~3.2k pairs), never in row
    // count, so the self-join rides on a broadcast of the tiny monthly
    // aggregate; per-pair slopes are 12dp-rounded decimals so both
    // engines median over identical values (even-n interpolation is the
    // same two-middle average in double on both).
    "agg_theil_sen" -> ((s, dir) => {
      val m = table(s, dir, "orders")
        .select((year(to_date(col("o_orderdate"))) * 12 +
          month(to_date(col("o_orderdate")))).cast("long").as("x"),
          col("o_totalprice").cast("decimal(18,2)").as("__p"))
        .groupBy(col("x")).agg(sum(col("__p")).cast("double").as("y"))
      val slopes = m.select(col("x").as("x1"), col("y").as("y1"))
        .join(broadcast(m.select(col("x").as("x2"), col("y").as("y2"))),
          col("x2") > col("x1"))
        .select(round((col("y2") - col("y1")) / (col("x2") - col("x1")), 12)
          .cast("decimal(28,12)").as("s"))
      // Exact median, no interpolation hazard: the two middle DECIMALS
      // sum exactly, and /2.0 is exact in binary — both engines bit-equal.
      // collect_list is bounded by the pair count (calendar², ~3.2k).
      def med(a: Column, n: Column) =
        (element_at(a, ((n + 1) / 2).cast("int")) +
          element_at(a, (n / 2 + 1).cast("int"))).cast("double") / 2.0
      val sl = slopes
        .agg(sort_array(collect_list(col("s"))).as("a"),
          count(lit(1)).as("n_pairs"))
        .select(med(col("a"), col("n_pairs")).as("sen_slope"), col("n_pairs"))
      m.crossJoin(broadcast(sl))
        .select(col("sen_slope"), col("n_pairs"),
          round(col("y") - col("sen_slope") * col("x"), 12)
            .cast("decimal(28,12)").as("r"))
        .groupBy(col("sen_slope"), col("n_pairs"))
        .agg(sort_array(collect_list(col("r"))).as("ra"),
          count(lit(1)).as("n_months"))
        .select(col("n_months"), col("n_pairs"),
          round(col("sen_slope"), 6).as("sen_slope"),
          round(med(col("ra"), col("n_months")), 6).as("intercept"))
    }),

    // Hodges–Lehmann shift estimator between the even- and odd-month
    // revenue series: the MEDIAN of all cross-arm differences — the
    // robust location-shift companion of agg_mannwhitney (HL is the
    // estimator whose test MW is), immune to the outlier months a
    // difference-of-means chases. Pair space = months_even × months_odd
    // (calendar-bounded, ~1.6k), rides a broadcast of the monthly
    // aggregate; the median is the exact two-middle decimal device from
    // agg_theil_sen — no interpolation float anywhere.
    "agg_hodges_lehmann" -> ((s, dir) => {
      val m = table(s, dir, "orders")
        .select((year(to_date(col("o_orderdate"))) * 12 +
          month(to_date(col("o_orderdate")))).cast("long").as("x"),
          col("o_totalprice").cast("decimal(18,2)").as("__p"))
        .groupBy(col("x")).agg(sum(col("__p")).cast("double").as("y"))
      val a = m.filter(pmod(col("x"), lit(2L)) === 0L)
        .select(col("y").as("ya"))
      val b = m.filter(pmod(col("x"), lit(2L)) === 1L)
        .select(col("y").as("yb"))
      val d = a.crossJoin(broadcast(b))
        .select(round(col("ya") - col("yb"), 12)
          .cast("decimal(28,12)").as("d"))
      def med(arr: Column, n: Column) =
        (element_at(arr, ((n + 1) / 2).cast("int")) +
          element_at(arr, (n / 2 + 1).cast("int"))).cast("double") / 2.0
      d.agg(sort_array(collect_list(col("d"))).as("arr"),
          count(lit(1)).as("n_pairs"))
        .select(col("n_pairs"),
          round(med(col("arr"), col("n_pairs")), 6).as("hl_shift"))
    }),

    // Merge overlapping delivery windows ([ship, ship + quantity days])
    // per supplier into maximal disjoint spans — the islands-and-gaps
    // interval coalesce; spans exported as ISO date strings.
    "intervals_coalesce" -> ((s, dir) => {
      val iv = table(s, dir, "lineitem").select(col("l_suppkey"),
        to_date(col("l_shipdate")).as("__s"),
        date_add(to_date(col("l_shipdate")),
          col("l_quantity").cast("int")).as("__e"))
      graft.ops.Resample.coalesceIntervals(iv, "l_suppkey", "__s", "__e")
        .select(col("l_suppkey"),
          date_format(col("span_start"), "yyyy-MM-dd").as("span_start"),
          date_format(col("span_end"), "yyyy-MM-dd").as("span_end"),
          col("n_merged"))
    }),

    // Lag-1 autocorrelation of the per-type daily value series — drift/
    // seasonality screening. Exact decimal sums (S1, S2, Σx·x₊₁, head/
    // tail sums) from one aggregate over the lead-joined series; closing
    // algebra in mirrored-operand-order doubles, 6dp-rounded. Constant
    // series (zero variance) emit null via nullif.
    // Lead-lag cross-correlation between the daily click and purchase
    // series at lags −3..+3 — the "do clicks lead purchases, and by how
    // many days?" read-out. Day counts are exact integers, so every moment
    // (Σx, Σy, Σxy, Σx², Σy², n) is a 64-bit exact sum per lag and the
    // Pearson closure is pure double arithmetic on identical longs — no
    // floating accumulation anywhere. Two hash aggregates + a 7-row lag
    // explode + one day-keyed join.
    "agg_crosscorr_lags" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / lit(86400.0)).cast("long")
            .as("day"))
      val x = daily.filter(col("event_type") === "click")
        .groupBy(col("day")).agg(count(lit(1)).as("x"))
      val y = daily.filter(col("event_type") === "purchase")
        .groupBy(col("day")).agg(count(lit(1)).as("y"))
        .select(col("day").as("yday"), col("y"))
      val moments = x
        .withColumn("lag", explode(typedLit((-3 to 3).map(_.toLong))))
        .join(y, col("day") + col("lag") === col("yday"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      def d(c: Column) = c.cast("double")
      val den = sqrt(d(col("n") * col("sxx") - col("sx") * col("sx")) *
        d(col("n") * col("syy") - col("sy") * col("sy")))
      moments.select(col("lag"), col("n").as("n_days"),
        when(den > 0.0,
          round(d(col("n") * col("sxy") - col("sx") * col("sy")) / den, 6))
          .otherwise(lit(0.0)).as("corr"))
    }),

    "agg_autocorr" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / lit(86400.0)).cast("long")
            .as("__day"),
          col("value").cast("decimal(18,6)").as("__v"))
        .groupBy(col("event_type"), col("__day"))
        .agg(sum(col("__v")).cast("decimal(18,6)").as("__x"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("__day").asc)
      val p = daily.withColumn("__xn", lead(col("__x"), 1).over(w))
      val agg = p.groupBy(col("event_type")).agg(
        count(lit(1)).as("n_days"),
        sum(col("__x")).as("__s1"),
        sum(col("__x") * col("__x")).as("__s2"),
        count(col("__xn")).as("__m"),
        sum(col("__x") * col("__xn")).as("__sxy"),
        sum(when(col("__xn").isNotNull, col("__x"))).as("__sh"),
        sum(col("__xn")).as("__st"))
      val (nD, mD) = (col("n_days").cast("double"), col("__m").cast("double"))
      val (s1, s2, sxy, sh, st) = (col("__s1").cast("double"),
        col("__s2").cast("double"), col("__sxy").cast("double"),
        col("__sh").cast("double"), col("__st").cast("double"))
      val xb = s1 / nD
      val num = sxy - xb * (sh + st) + mD * xb * xb
      val den = s2 - nD * xb * xb
      agg.select(col("event_type"), col("n_days"),
        round(num / nullif(den, lit(0.0)), 6).as("autocorr_lag1"))
    }),

    // Leave-one-out target encoding: each order's priority encoded as the
    // mean total price of the OTHER orders in its priority — exact
    // decimal group sums, one subtraction per row, leakage-free by
    // construction. Singleton groups encode null.
    "feature_target_encode" -> ((s, dir) => {
      val agg = table(s, dir, "orders").groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("__n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("__s"))
      table(s, dir, "orders").join(broadcast(agg), "o_orderpriority")
        .select(col("o_orderkey"), col("o_orderpriority"),
          when(col("__n") > 1,
            round((col("__s") - col("o_totalprice").cast("decimal(18,2)"))
              .cast("double") / (col("__n") - 1L).cast("double"), 6))
            .otherwise(lit(null)).as("loo_mean"))
    }),

    // Median imputation: null out quantities on l_orderkey % 997, refill
    // from the per-flag median of the surviving values (both engines'
    // quantile functions skip nulls; integer-valued medians interpolate
    // exactly). Emits the imputed column and the was_null provenance flag.
    "feature_impute_median" -> ((s, dir) => {
      val dirty = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          when(col("l_orderkey") % 997 === 0, lit(null).cast("double"))
            .otherwise(col("l_quantity")).as("__q"))
      val med = dirty.groupBy(col("l_returnflag"))
        .agg(percentile(col("__q"), lit(0.5)).as("__med"))
      dirty.join(broadcast(med), "l_returnflag")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          coalesce(col("__q"), col("__med")).as("qty_imputed"),
          col("__q").isNull.as("was_null"))
    }),

    // Robust MAD-z outlier report over a deterministically contaminated
    // quantity column (planted 999s on l_orderkey % 991 — the dq_lineitem
    // fabrication style): the per-group outlier counts must isolate
    // exactly the planted rows. Quantities are integer-valued doubles, so
    // both quantile passes interpolate exactly.
    "outlier_mad" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      val dirty = li.unionAll(
        li.filter(col("l_orderkey") % 991 === 0)
          .select(col("l_orderkey"), col("l_returnflag"),
            lit(999.0).as("l_quantity")))
      graft.ops.Robust.madOutliers(
        dirty.select(col("l_returnflag"), col("l_quantity")),
        "l_returnflag", "l_quantity", z = 3.0)
    }))

  /** One per-column stats SELECT for [[graft.ops.Profile.tableStats]]'s
    * oracle: numeric columns report double extremes, strings report
    * string extremes, others report counts/ndv only. */
  private def colStatsSql(c: String, kind: String): String = {
    val (minN, maxN) =
      if (kind == "num") (s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)")
      else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
    val (minS, maxS) =
      if (kind == "str") (s"min($c)", s"max($c)")
      else ("CAST(NULL AS STRING)", "CAST(NULL AS STRING)")
    s"""SELECT '$c' AS col_name, CAST(count($c) AS BIGINT) AS n_nonnull,
       |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
       |  CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
       |  $minN AS min_num, $maxN AS max_num,
       |  $minS AS min_str, $maxS AS max_str FROM lineitem""".stripMargin
  }

  /** 3×3 determinant by first-row cofactor expansion — ONE string parsed
    * by both Spark (`expr`) and DuckDB, so the double operand order is
    * shared by construction. Matrix rows (a,b,c), (d,e,f), (g,h,i). */
  private def det3(a: String, b: String, c: String, d: String, e: String,
      f: String, g: String, h: String, i: String): String =
    s"$a * ($e * $i - $f * $h) - $b * ($d * $i - $f * $g) + $c * ($d * $h - $e * $g)"

  /** Normal-equation system determinants for y ~ b0 + b1·x1 + b2·x2:
    * A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], RHS (sy,s1y,s2y); OlsDetK
    * replaces column K with the RHS. */
  private val OlsDet: String = det3("nd", "s1d", "s2d",
    "s1d", "s11d", "s12d", "s2d", "s12d", "s22d")
  private val OlsDet0: String = det3("syd", "s1d", "s2d",
    "s1yd", "s11d", "s12d", "s2yd", "s12d", "s22d")
  private val OlsDet1: String = det3("nd", "syd", "s2d",
    "s1d", "s1yd", "s12d", "s2d", "s2yd", "s22d")
  private val OlsDet2: String = det3("nd", "s1d", "syd",
    "s1d", "s11d", "s1yd", "s2d", "s12d", "s2yd")

  private val IrlsIters = 6

  /** The IRLS CTE blocks (shared by the logistic gate and the DR-ATE
    * oracle): expects a CTE `x(y, x1, x2, …)` and `beta0(b0, b1, b2)`;
    * produces `beta$iters`. */
  private def irlsBlocks(iters: Int): String = {
    val blocks = (1 to iters).map { k =>
      val p = s"beta${k - 1}"
      s"""t$k AS MATERIALIZED (SELECT y, x1, x2, mu, mu * (1.0 - mu) AS w
         |  FROM (SELECT y, x1, x2,
         |      1.0 / (1.0 + exp(-(b.b0 + b.b1 * x1 + b.b2 * x2))) AS mu
         |    FROM x, $p b)),
         |a$k AS MATERIALIZED (SELECT
         |    sum(CAST(round(w, 12) AS DECIMAL(38,12))) AS h00,
         |    sum(CAST(round(w * x1, 12) AS DECIMAL(38,12))) AS h01,
         |    sum(CAST(round(w * x2, 12) AS DECIMAL(38,12))) AS h02,
         |    sum(CAST(round(w * x1 * x1, 12) AS DECIMAL(38,12))) AS h11,
         |    sum(CAST(round(w * x1 * x2, 12) AS DECIMAL(38,12))) AS h12,
         |    sum(CAST(round(w * x2 * x2, 12) AS DECIMAL(38,12))) AS h22,
         |    sum(CAST(round(y - mu, 12) AS DECIMAL(38,12))) AS g0,
         |    sum(CAST(round((y - mu) * x1, 12) AS DECIMAL(38,12))) AS g1,
         |    sum(CAST(round((y - mu) * x2, 12) AS DECIMAL(38,12))) AS g2
         |  FROM t$k),
         |d$k AS MATERIALIZED (SELECT *,
         |    h00 * (h11 * h22 - h12 * h12) - h01 * (h01 * h22 - h12 * h02)
         |      + h02 * (h01 * h12 - h11 * h02) AS det
         |  FROM (SELECT CAST(h00 AS DOUBLE) AS h00,
         |      CAST(h01 AS DOUBLE) AS h01, CAST(h02 AS DOUBLE) AS h02,
         |      CAST(h11 AS DOUBLE) AS h11, CAST(h12 AS DOUBLE) AS h12,
         |      CAST(h22 AS DOUBLE) AS h22, CAST(g0 AS DOUBLE) AS g0,
         |      CAST(g1 AS DOUBLE) AS g1, CAST(g2 AS DOUBLE) AS g2
         |    FROM a$k)),
         |beta$k AS MATERIALIZED (SELECT
         |    round(b.b0 + ((h11 * h22 - h12 * h12) * g0 +
         |      (h02 * h12 - h01 * h22) * g1 +
         |      (h01 * h12 - h02 * h11) * g2) / det, 12) AS b0,
         |    round(b.b1 + ((h02 * h12 - h01 * h22) * g0 +
         |      (h00 * h22 - h02 * h02) * g1 +
         |      (h01 * h02 - h00 * h12) * g2) / det, 12) AS b1,
         |    round(b.b2 + ((h01 * h12 - h02 * h11) * g0 +
         |      (h01 * h02 - h00 * h12) * g1 +
         |      (h00 * h11 - h01 * h01) * g2) / det, 12) AS b2
         |  FROM d$k, $p b)""".stripMargin
    }
    blocks.mkString(",\n")
  }

  private val Beta0Cte = """beta0 AS (SELECT CAST(0 AS DOUBLE) AS b0,
    |  CAST(0 AS DOUBLE) AS b1, CAST(0 AS DOUBLE) AS b2)""".stripMargin

  /** [[graft.ops.Glm.logisticIrls]] unrolled: per step, a 12dp-decimal
    * Hessian/gradient aggregate and the closed-form symmetric 3×3 Newton
    * update, operand order mirrored with the driver solve. */
  private val irlsOracle: String = {
    val bK = s"beta$IrlsIters"
    s"""WITH x AS MATERIALIZED (SELECT
       |    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y,
       |    value / 100.0 AS x1,
       |    CAST(hour(ts) AS DOUBLE) / 24.0 AS x2
       |  FROM events),
       |$Beta0Cte,
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM x),
       |${irlsBlocks(IrlsIters)}
       |SELECT 'intercept' AS feature, round(b0, 6) AS beta, n_rows
       |FROM $bK, nn
       |UNION ALL SELECT 'x1', round(b1, 6), n_rows FROM $bK, nn
       |UNION ALL SELECT 'x2', round(b2, 6), n_rows FROM $bK, nn""".stripMargin
  }

  /** [[graft.ops.Glm.doublyRobustAte]] unrolled: the shared IRLS chain
    * fits the propensity (treatment as label), ONE conditional-sum pass
    * yields both OLS arms' moments, the same adjugate solve closes each
    * arm, and the AIPW terms aggregate as 9dp decimals. */
  private val drAteOracle: String = {
    // Closed-form OLS solve text for arm suffix `s` (same operand order
    // as Glm.solveSym3, h00=c, h01=s1, h02=s2, h11=s11, h12=s12, h22=s22).
    def solve(s: String): String = {
      def h(n: String) = s"$n$s"
      val det = s"(${h("c")} * (${h("s11")} * ${h("s22")} - ${h("s12")} * ${h("s12")}) - " +
        s"${h("s1")} * (${h("s1")} * ${h("s22")} - ${h("s12")} * ${h("s2")}) + " +
        s"${h("s2")} * (${h("s1")} * ${h("s12")} - ${h("s11")} * ${h("s2")}))"
      s"""round(((${h("s11")} * ${h("s22")} - ${h("s12")} * ${h("s12")}) * ${h("sy")} +
         |    (${h("s2")} * ${h("s12")} - ${h("s1")} * ${h("s22")}) * ${h("sy1")} +
         |    (${h("s1")} * ${h("s12")} - ${h("s2")} * ${h("s11")}) * ${h("sy2")}) / $det, 12) AS b0$s,
         |round(((${h("s2")} * ${h("s12")} - ${h("s1")} * ${h("s22")}) * ${h("sy")} +
         |    (${h("c")} * ${h("s22")} - ${h("s2")} * ${h("s2")}) * ${h("sy1")} +
         |    (${h("s1")} * ${h("s2")} - ${h("c")} * ${h("s12")}) * ${h("sy2")}) / $det, 12) AS b1$s,
         |round(((${h("s1")} * ${h("s12")} - ${h("s2")} * ${h("s11")}) * ${h("sy")} +
         |    (${h("s1")} * ${h("s2")} - ${h("c")} * ${h("s12")}) * ${h("sy1")} +
         |    (${h("c")} * ${h("s11")} - ${h("s1")} * ${h("s1")}) * ${h("sy2")}) / $det, 12) AS b2$s""".stripMargin
    }
    def armSums(cond: String, s: String): String =
      Seq("1.0" -> "c", "x1" -> "s1", "x2" -> "s2",
        "x1 * x1" -> "s11", "x1 * x2" -> "s12", "x2 * x2" -> "s22",
        "yo" -> "sy", "yo * x1" -> "sy1", "yo * x2" -> "sy2")
        .map { case (e, n) =>
          s"sum(CASE WHEN $cond THEN CAST(round($e, 12) AS DECIMAL(38,12)) " +
            s"ELSE CAST(0 AS DECIMAL(38,12)) END) AS $n$s" }
        .mkString(",\n    ")
    def dcast(s: String): String =
      Seq("c", "s1", "s2", "s11", "s12", "s22", "sy", "sy1", "sy2")
        .map(n => s"CAST($n$s AS DOUBLE) AS $n$s").mkString(", ")
    val bK = s"beta$IrlsIters"
    s"""WITH x AS MATERIALIZED (SELECT
       |    CASE WHEN user_id % 3 = 0 THEN 1.0 ELSE 0.0 END AS y,
       |    value AS yo,
       |    CAST(hour(ts) AS DOUBLE) / 24.0 AS x1,
       |    CAST((((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
       |      + 4) % 7) + 7) % 7 AS DOUBLE) / 7.0 AS x2
       |  FROM events),
       |$Beta0Cte,
       |${irlsBlocks(IrlsIters)},
       |mo AS MATERIALIZED (SELECT
       |    ${armSums("y = 1.0", "_t")},
       |    ${armSums("y = 0.0", "_c")}
       |  FROM x),
       |ob AS MATERIALIZED (SELECT
       |    ${solve("_t")},
       |    ${solve("_c")}
       |  FROM (SELECT ${dcast("_t")}, ${dcast("_c")} FROM mo)),
       |tm AS MATERIALIZED (SELECT x.y AS t, x.yo,
       |    1.0 / (1.0 + exp(-(b.b0 + b.b1 * x.x1 + b.b2 * x.x2))) AS e,
       |    ob.b0_t + ob.b1_t * x.x1 + ob.b2_t * x.x2 AS m1,
       |    ob.b0_c + ob.b1_c * x.x1 + ob.b2_c * x.x2 AS m0
       |  FROM x, $bK b, ob),
       |f AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
       |    sum(CAST(t AS DECIMAL(38,12))) AS nt,
       |    sum(CAST(round(t * (yo - m1) / e + m1, 9)
       |      AS DECIMAL(38,9))) AS t1,
       |    sum(CAST(round((1.0 - t) * (yo - m0) / (1.0 - e) + m0, 9)
       |      AS DECIMAL(38,9))) AS t0,
       |    sum(CAST(round(t * yo, 9) AS DECIMAL(38,9))) AS syt,
       |    sum(CAST(round((1.0 - t) * yo, 9) AS DECIMAL(38,9))) AS syc
       |  FROM tm)
       |SELECT n, CAST(nt AS BIGINT) AS n_treated,
       |  round(CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE) -
       |    CAST(syc AS DOUBLE) / (CAST(n AS DOUBLE) - CAST(nt AS DOUBLE)),
       |    6) AS ate_naive,
       |  round(CAST(t1 AS DOUBLE) / CAST(n AS DOUBLE) -
       |    CAST(t0 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ate_dr
       |FROM f""".stripMargin
  }

  def oracles: Map[String, String] = Map(

    "agg_sketch_report" ->
      s"""WITH h AS (SELECT DISTINCT l_returnflag,
         |    ${OracleSql.knuth32("l_orderkey")} AS h FROM lineitem),
         |rk AS (SELECT l_returnflag, h, row_number() OVER (
         |    PARTITION BY l_returnflag ORDER BY h ASC) AS r FROM h),
         |nh AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_hashes
         |  FROM h GROUP BY 1),
         |kth AS (SELECT l_returnflag, h AS hk FROM rk WHERE r = $KmvK),
         |ex AS (SELECT l_returnflag,
         |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
         |  FROM lineitem GROUP BY 1),
         |est AS (SELECT nh.l_returnflag, n_hashes,
         |    CASE WHEN n_hashes < $KmvK THEN CAST(n_hashes AS DOUBLE)
         |      ELSE round(${KmvK - 1}.0 * 4294967296.0 / CAST(hk AS DOUBLE), 6)
         |    END AS kmv_distinct
         |  FROM nh LEFT JOIN kth USING (l_returnflag))
         |SELECT ex.l_returnflag, exact_distinct, n_hashes, kmv_distinct,
         |  round(abs(kmv_distinct - CAST(exact_distinct AS DOUBLE)) /
         |    CAST(exact_distinct AS DOUBLE), 6) AS rel_err
         |FROM ex JOIN est USING (l_returnflag)""".stripMargin,

    "causal_dr_ate" -> drAteOracle,

    "ml_logreg_irls" -> irlsOracle,

    "agg_hodges_lehmann" ->
      """WITH m AS (SELECT CAST(year(CAST(o_orderdate AS DATE)) * 12 +
        |      month(CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
        |  FROM orders GROUP BY 1),
        |p AS (SELECT CAST(round(a.y - b.y, 12) AS DECIMAL(28,12)) AS d
        |  FROM (SELECT y FROM m WHERE x % 2 = 0) a,
        |       (SELECT y FROM m WHERE x % 2 = 1) b),
        |g AS (SELECT list(d ORDER BY d) AS arr,
        |    CAST(count(*) AS BIGINT) AS n FROM p)
        |SELECT n AS n_pairs,
        |  round(CAST(arr[CAST((n + 1) // 2 AS INT)] +
        |    arr[CAST(n // 2 + 1 AS INT)] AS DOUBLE) / 2.0, 6) AS hl_shift
        |FROM g""".stripMargin,

    "causal_qte" ->
      """WITH ev AS (SELECT user_id % 3 = 0 AS t,
        |    CAST(value AS DECIMAL(18,6)) AS v FROM events),
        |g AS (SELECT t, v, CAST(count(*) AS BIGINT) AS n
        |  FROM ev GROUP BY 1, 2),
        |c AS (SELECT t, v, n,
        |    sum(n) OVER (PARTITION BY t ORDER BY v) AS cum_n FROM g),
        |tot AS (SELECT t, CAST(sum(n) AS BIGINT) AS nt FROM g GROUP BY 1),
        |q AS (SELECT c.t, p.p, min(c.v) AS qv
        |  FROM c JOIN tot ON tot.t = c.t
        |  JOIN range(1, 4) p(p) ON c.cum_n >= (tot.nt * p.p + 3) // 4
        |  GROUP BY 1, 2)
        |SELECT CAST(p AS DOUBLE) / 4.0 AS q,
        |  CAST(qt.qv AS DOUBLE) AS q_treated,
        |  CAST(qc.qv AS DOUBLE) AS q_control,
        |  round(CAST(qt.qv AS DOUBLE) - CAST(qc.qv AS DOUBLE), 6) AS qte
        |FROM (SELECT p, qv FROM q WHERE t) qt
        |JOIN (SELECT p, qv FROM q WHERE NOT t) qc USING (p)""".stripMargin,

    "agg_spearman" ->
      """WITH li AS (SELECT CAST(l_quantity AS DECIMAL(12,2)) AS x,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) AS y FROM lineitem),
        |gx AS (SELECT x, CAST(count(*) AS BIGINT) AS n FROM li GROUP BY 1),
        |cx AS (SELECT x, 2 * (sum(n) OVER (ORDER BY x)) - n + 1 AS rx
        |  FROM gx),
        |gy AS (SELECT y, CAST(count(*) AS BIGINT) AS n FROM li GROUP BY 1),
        |cy AS (SELECT y, 2 * (sum(n) OVER (ORDER BY y)) - n + 1 AS ry
        |  FROM gy),
        |j AS (SELECT CAST(rx AS DECIMAL(38,0)) AS rx,
        |    CAST(ry AS DECIMAL(38,0)) AS ry
        |  FROM li JOIN cx USING (x) JOIN cy USING (y)),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(rx) AS sx, sum(ry) AS sy, sum(rx * rx) AS sxx,
        |    sum(ry * ry) AS syy, sum(rx * ry) AS sxy FROM j)
        |SELECT n, round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |  (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |   sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS spearman
        |FROM a""".stripMargin,
    "agg_bootstrap_ci" -> {
      val h = OracleSql.knuth32("ev.event_id * 64 + t.r")
      s"""WITH ev AS (SELECT event_id, CAST(value AS DECIMAL(18,6)) AS v FROM events),
         |ex AS (SELECT t.r, ev.v, $h AS h FROM ev, range(0, 64) t(r)),
         |wt AS (SELECT r, v,
         |    CASE WHEN h < 1580030168 THEN 0 WHEN h < 3160060337 THEN 1
         |      WHEN h < 3950075421 THEN 2 WHEN h < 4213413783 THEN 3
         |      WHEN h < 4279248373 THEN 4 WHEN h < 4292415291 THEN 5
         |      WHEN h < 4294609777 THEN 6 WHEN h < 4294923276 THEN 7
         |      WHEN h < 4294962463 THEN 8 ELSE 9 END AS w
         |  FROM ex),
         |rep AS (SELECT r, CAST(sum(w) AS BIGINT) AS nw,
         |    sum(CAST(w AS DECIMAL(2,0)) * v) AS sv FROM wt GROUP BY 1),
         |ms AS (SELECT r, CASE WHEN nw > 0
         |    THEN round(CAST(sv AS DOUBLE) / CAST(nw AS DOUBLE), 6)
         |    ELSE 0.0 END AS m FROM rep),
         |rk AS (SELECT m, row_number() OVER (ORDER BY m ASC, r ASC) AS rk FROM ms),
         |ci AS (SELECT CAST(count(*) AS BIGINT) AS n_boot,
         |    max(CASE WHEN rk = 2 THEN m END) AS ci_lo,
         |    max(CASE WHEN rk = 63 THEN m END) AS ci_hi FROM rk),
         |f AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    round(CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean
         |  FROM ev)
         |SELECT n, mean, n_boot, ci_lo, ci_hi FROM f, ci""".stripMargin
    },

    "agg_mutual_info" ->
      """WITH cells AS (SELECT l_returnflag AS x, l_linestatus AS y,
        |    CAST(count(*) AS BIGINT) AS nxy FROM lineitem GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM cells GROUP BY 1),
        |my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cells),
        |terms AS (SELECT n, CAST(nxy * CAST(round(ln(CAST(n AS DOUBLE) *
        |      CAST(nxy AS DOUBLE) / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))
        |      * 1000000000.0, 0) AS BIGINT) AS DECIMAL(38,0)) AS mi_t
        |  FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot),
        |mi AS (SELECT n, sum(mi_t) AS mi_s FROM terms GROUP BY 1),
        |hx AS (SELECT sum(CAST(nx * CAST(round(ln(CAST(nx AS DOUBLE) /
        |      CAST(n AS DOUBLE)) * 1000000000.0, 0) AS BIGINT) AS DECIMAL(38,0)))
        |    AS hx_s, CAST(count(*) AS BIGINT) AS k_x FROM mx, tot),
        |hy AS (SELECT sum(CAST(ny * CAST(round(ln(CAST(ny AS DOUBLE) /
        |      CAST(n AS DOUBLE)) * 1000000000.0, 0) AS BIGINT) AS DECIMAL(38,0)))
        |    AS hy_s, CAST(count(*) AS BIGINT) AS k_y FROM my, tot),
        |f AS (SELECT n, k_x, k_y,
        |    CAST(mi_s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0) AS miv,
        |    -CAST(hx_s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0) AS hxv,
        |    -CAST(hy_s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0) AS hyv
        |  FROM mi, hx, hy)
        |SELECT n, k_x, k_y, round(miv, 6) AS mi_nats,
        |  round(hxv, 6) AS h_x, round(hyv, 6) AS h_y,
        |  CASE WHEN NOT (hxv * hyv > 0.0) THEN 0.0
        |    ELSE round(miv / sqrt(hxv * hyv), 6) END AS nmi
        |FROM f""".stripMargin,

    "ab_sequential_glr" ->
      """WITH daily AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dt1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ds1,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS dt2,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 AND event_type = 'purchase'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ds2
        |  FROM events GROUP BY 1),
        |c AS (SELECT day,
        |    CAST(sum(dt1) OVER w AS BIGINT) AS t1,
        |    CAST(sum(ds1) OVER w AS BIGINT) AS s1,
        |    CAST(sum(dt2) OVER w AS BIGINT) AS t2,
        |    CAST(sum(ds2) OVER w AS BIGINT) AS s2
        |  FROM daily WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p AS (SELECT *, (CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE)) /
        |    (CAST(t1 AS DOUBLE) + CAST(t2 AS DOUBLE)) AS pp FROM c),
        |l AS (SELECT day, t1, s1, t2, s2,
        |    (CASE WHEN s1 > 0 THEN CAST(s1 AS DOUBLE) *
        |       ln(CAST(s1 AS DOUBLE) / CAST(t1 AS DOUBLE) / pp) ELSE 0.0 END)
        |    + (CASE WHEN t1 - s1 > 0 THEN CAST(t1 - s1 AS DOUBLE) *
        |       ln(CAST(t1 - s1 AS DOUBLE) / CAST(t1 AS DOUBLE) / (1.0 - pp))
        |       ELSE 0.0 END)
        |    + (CASE WHEN s2 > 0 THEN CAST(s2 AS DOUBLE) *
        |       ln(CAST(s2 AS DOUBLE) / CAST(t2 AS DOUBLE) / pp) ELSE 0.0 END)
        |    + (CASE WHEN t2 - s2 > 0 THEN CAST(t2 - s2 AS DOUBLE) *
        |       ln(CAST(t2 - s2 AS DOUBLE) / CAST(t2 AS DOUBLE) / (1.0 - pp))
        |       ELSE 0.0 END) AS llr0
        |  FROM p)
        |SELECT day, t1, s1, t2, s2, round(llr0, 6) AS llr,
        |  round(llr0, 6) >= 2.995732 AS crossed
        |FROM l""".stripMargin,

    "ab_srm_check" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM u)
        |SELECT n1, n2,
        |  round(CAST((n1 - n2) * (n1 - n2) AS DOUBLE) /
        |    CAST(n1 + n2 AS DOUBLE), 6) AS chi2,
        |  round(CAST((n1 - n2) * (n1 - n2) AS DOUBLE) /
        |    CAST(n1 + n2 AS DOUBLE), 6) > 3.841459 AS srm_detected
        |FROM a""".stripMargin,

    "ab_fdr_bh" ->
      s"""WITH c AS (SELECT c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS b
         |  FROM customer),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS na, sum(b) AS sx,
         |    sum(b * b) AS sxx,
         |    CAST(count(DISTINCT c_nationkey) AS BIGINT) AS m FROM c),
         |s AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
         |    sum(b) AS sg FROM c GROUP BY 1),
         |z AS (SELECT s.*, g.m,
         |    (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)
         |      - CAST(sx AS DOUBLE) / CAST(na AS DOUBLE)) /
         |    sqrt(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
         |      / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0))
         |      / CAST(n AS DOUBLE)) AS zv
         |  FROM s, g),
         |p AS (SELECT *, round(${graft.ops.Gauss.twoSidedPSql("zv")}, 6) AS pv
         |  FROM z),
         |r AS (SELECT *, CAST(row_number() OVER
         |    (ORDER BY pv ASC, c_nationkey ASC) AS BIGINT) AS k FROM p),
         |ks AS (SELECT *,
         |    max(CASE WHEN pv <= CAST(k AS DOUBLE) * 0.1 / CAST(m AS DOUBLE)
         |      THEN k ELSE 0 END) OVER () AS kstar
         |  FROM r)
         |SELECT c_nationkey, n, round(zv, 6) AS z, pv AS p_value, k,
         |  round(CAST(k AS DOUBLE) * 0.1 / CAST(m AS DOUBLE), 6) AS bh_thresh,
         |  k <= kstar AS rejected
         |FROM ks""".stripMargin,

    "feature_hash_cross" -> {
      val hash = OracleSql.stringPolyHash("crs")
      s"""WITH x AS (SELECT concat(o_orderpriority, '#', c_mktsegment) AS crs
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |b AS (SELECT ((($hash) % 64) + 64) % 64 AS bucket, crs FROM x)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(DISTINCT crs) AS BIGINT) AS n_crosses,
         |  count(DISTINCT crs) > 1 AS collided
         |FROM b GROUP BY 1""".stripMargin
    },

    "privacy_dp_counts" ->
      """WITH c AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_true
        |  FROM customer GROUP BY 1),
        |n AS (SELECT *,
        |    (CAST((((c_nationkey % 1000000007) + 1000000007) % 1000000007)
        |      * 2654435761 % 4294967296 AS DOUBLE) + 0.5) / 4294967296.0
        |      - 0.5 AS ctr
        |  FROM c),
        |z AS (SELECT c_nationkey, n_true,
        |    round(-sign(ctr) * ln(1.0 - 2.0 * abs(ctr)), 6) AS noise
        |  FROM n)
        |SELECT c_nationkey, n_true, noise,
        |  round(CAST(n_true AS DOUBLE) + noise, 6) AS n_dp
        |FROM z""".stripMargin,

    "profile_corr_matrix" -> {
      val names = Seq("quantity", "price_usd", "discount_bp", "tax_bp")
      val moments = ((0 until 4).map(i => s"CAST(sum(x$i) AS BIGINT) AS s$i") ++
        (for (i <- 0 until 4; j <- i until 4)
          yield s"CAST(sum(x$i * x$j) AS BIGINT) AS q${i}_$j")).mkString(",\n        |    ")
      val rows = (for (i <- 0 until 4; j <- i + 1 until 4) yield {
        val num = s"(CAST(n AS DOUBLE) * CAST(q${i}_$j AS DOUBLE) - " +
          s"CAST(s$i AS DOUBLE) * CAST(s$j AS DOUBLE))"
        val den = s"sqrt((CAST(n AS DOUBLE) * CAST(q${i}_$i AS DOUBLE) - " +
          s"CAST(s$i AS DOUBLE) * CAST(s$i AS DOUBLE)) * " +
          s"(CAST(n AS DOUBLE) * CAST(q${j}_$j AS DOUBLE) - " +
          s"CAST(s$j AS DOUBLE) * CAST(s$j AS DOUBLE)))"
        s"SELECT '${names(i)}' AS col_x, '${names(j)}' AS col_y, n, " +
          s"CASE WHEN $den > 0.0 THEN round($num / $den, 6) ELSE 0.0 END AS corr FROM m"
      }).mkString("\n        |UNION ALL ")
      s"""WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS x0,
        |    CAST(round(l_extendedprice) AS BIGINT) AS x1,
        |    CAST(round(l_discount * 100) AS BIGINT) AS x2,
        |    CAST(round(l_tax * 100) AS BIGINT) AS x3
        |  FROM lineitem),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    $moments
        |  FROM b)
        |$rows""".stripMargin
    },

    "ab_power_mde" ->
      """WITH e AS (SELECT event_type, (user_id % 2 = 0) AS a,
        |    CAST(value AS DECIMAL(18,6)) AS v FROM events),
        |m AS (SELECT event_type,
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    sum(CASE WHEN a THEN v END) AS s1,
        |    sum(CASE WHEN NOT a THEN v END) AS s2,
        |    sum(CASE WHEN a THEN v * v END) AS q1,
        |    sum(CASE WHEN NOT a THEN v * v END) AS q2
        |  FROM e GROUP BY 1),
        |c AS (SELECT event_type, n1, n2,
        |    (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |      / CAST(n1 AS DOUBLE)
        |     + CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
        |      / CAST(n2 AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0) AS varp,
        |    (CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE)) /
        |      (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) AS mean
        |  FROM m),
        |f AS (SELECT *, (1.959964 + 0.841621) *
        |    sqrt(varp * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
        |    AS mde FROM c)
        |SELECT event_type, n1, n2, round(mean, 6) AS mean,
        |  round(sqrt(varp), 6) AS sd_pooled, round(mde, 6) AS mde_abs,
        |  CASE WHEN mean > 0.0 THEN round(mde / mean, 6) ELSE 0.0 END
        |    AS mde_rel
        |FROM f""".stripMargin,

    "ab_layered_assign" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |a AS (SELECT
        |    ((((user_id % 1000000007) + 1000000007) % 1000000007)
        |      * 2654435761 % 4294967296) * 2 // 4294967296 AS l1,
        |    (((((user_id + 1000003) % 1000000007) + 1000000007) % 1000000007)
        |      * 2654435761 % 4294967296) * 2 // 4294967296 AS l2
        |  FROM u),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN l1 = 0 AND l2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
        |    CAST(sum(CASE WHEN l1 = 0 AND l2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        |    CAST(sum(CASE WHEN l1 = 1 AND l2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |    CAST(sum(CASE WHEN l1 = 1 AND l2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
        |  FROM a),
        |c AS (SELECT *,
        |    CASE WHEN CAST((n00 + n01) * (n10 + n11) AS DOUBLE)
        |        * CAST((n00 + n10) * (n01 + n11) AS DOUBLE) > 0.0
        |      THEN round(CAST(n00 + n01 + n10 + n11 AS DOUBLE)
        |        * CAST(n00 * n11 - n01 * n10 AS DOUBLE)
        |        * CAST(n00 * n11 - n01 * n10 AS DOUBLE)
        |        / (CAST((n00 + n01) * (n10 + n11) AS DOUBLE)
        |          * CAST((n00 + n10) * (n01 + n11) AS DOUBLE)), 6)
        |      ELSE 0.0 END AS chi2
        |  FROM m)
        |SELECT n00, n01, n10, n11, chi2, chi2 <= 3.841459 AS independent
        |FROM c""".stripMargin,

    "feature_woe_iv" ->
      """WITH r AS (SELECT CAST(l_quantity AS BIGINT) // 10 AS bucket,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
        |  FROM lineitem),
        |byb AS (SELECT bucket, CAST(sum(1 - bad) AS BIGINT) AS n_good,
        |    CAST(sum(bad) AS BIGINT) AS n_bad FROM r GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_good) AS BIGINT) AS tg,
        |    CAST(sum(n_bad) AS BIGINT) AS tb FROM byb)
        |SELECT bucket, n_good, n_bad,
        |  CASE WHEN n_good = 0 OR n_bad = 0 THEN 0.0
        |    ELSE round(ln((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE)) /
        |      (CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE))), 6) END AS woe,
        |  CASE WHEN n_good = 0 OR n_bad = 0 THEN 0.0
        |    ELSE round((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE) -
        |      CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE)) *
        |      ln((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE)) /
        |        (CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE))), 9) END AS iv_term
        |FROM byb, tot""".stripMargin,

    "agg_theil_decomp" ->
      """WITH r AS (SELECT o_orderpriority AS g,
        |    CAST(o_totalprice AS DECIMAL(18,6)) AS x
        |  FROM orders WHERE o_totalprice > 0.0),
        |byg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng, sum(x) AS sg,
        |    sum(CAST(CAST(round(CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE))
        |      * 1000000.0, 0) AS BIGINT) AS DECIMAL(38,0))) AS xlg
        |  FROM r GROUP BY 1),
        |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n, sum(sg) AS sx,
        |    sum(xlg) AS xl FROM byg),
        |t AS (SELECT n, sx,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    (CAST(xl AS DOUBLE) / 1000000.0) /
        |      (CAST(n AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
        |      - ln(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS tt FROM tot),
        |btw AS (SELECT sum(CAST(round(
        |      (CAST(sg AS DOUBLE) / CAST(sx AS DOUBLE)) *
        |      ln((CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)) /
        |        (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))), 9)
        |      AS DECIMAL(18,9))) AS tbs,
        |    CAST(count(*) AS BIGINT) AS k_groups
        |  FROM byg, tot)
        |SELECT n, k_groups, round(mu, 6) AS mean,
        |  round(tt, 6) AS theil_total,
        |  round(CAST(tbs AS DOUBLE), 6) AS theil_between,
        |  round(round(tt, 6) - CAST(tbs AS DOUBLE), 6) AS theil_within
        |FROM t, btw""".stripMargin,

    "sample_neyman_alloc" ->
      """WITH byh AS (SELECT c_mktsegment AS segment,
        |    CAST(count(*) AS BIGINT) AS n_pop,
        |    sum(CAST(c_acctbal AS DECIMAL(18,6))) AS sv,
        |    sum(CAST(c_acctbal AS DECIMAL(19,6)) *
        |        CAST(c_acctbal AS DECIMAL(19,6))) AS svv
        |  FROM customer GROUP BY 1),
        |sd AS (SELECT segment, n_pop,
        |    CAST(CASE WHEN NOT ((CAST(svv AS DOUBLE) -
        |        CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n_pop AS DOUBLE)) /
        |        (CAST(n_pop AS DOUBLE) - 1.0) > 0.0) THEN 0.0
        |      ELSE round(sqrt((CAST(svv AS DOUBLE) -
        |        CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n_pop AS DOUBLE)) /
        |        (CAST(n_pop AS DOUBLE) - 1.0)), 6) END AS DECIMAL(18,6)) AS sd
        |  FROM byh),
        |w AS (SELECT segment, n_pop, sd,
        |    CAST(n_pop AS DECIMAL(19,6)) * sd AS wgt FROM sd),
        |tot AS (SELECT sum(wgt) AS wtot, CAST(sum(n_pop) AS BIGINT) AS ntot FROM w)
        |SELECT segment, n_pop, CAST(sd AS DOUBLE) AS sd,
        |  CAST(round(1000.0 * CAST(wgt AS DOUBLE) / CAST(wtot AS DOUBLE), 0)
        |    AS BIGINT) AS alloc_neyman,
        |  CAST(round(1000.0 * CAST(n_pop AS DOUBLE) / CAST(ntot AS DOUBLE), 0)
        |    AS BIGINT) AS alloc_prop
        |FROM w, tot""".stripMargin,

    "feature_target_encode" ->
      """WITH a AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
        |  FROM orders GROUP BY 1)
        |SELECT o_orderkey, o.o_orderpriority,
        |  CASE WHEN n > 1 THEN
        |    round(CAST(s - CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) /
        |      CAST(n - 1 AS DOUBLE), 6) END AS loo_mean
        |FROM orders o JOIN a ON o.o_orderpriority = a.o_orderpriority""".stripMargin,

    "feature_impute_median" ->
      """WITH d AS (SELECT l_orderkey, l_linenumber, l_returnflag,
        |    CASE WHEN l_orderkey % 997 = 0 THEN NULL
        |         ELSE l_quantity END AS q
        |  FROM lineitem),
        |m AS (SELECT l_returnflag, quantile_cont(q, 0.5) AS med
        |  FROM d GROUP BY 1)
        |SELECT l_orderkey, l_linenumber, d.l_returnflag,
        |  coalesce(q, med) AS qty_imputed, q IS NULL AS was_null
        |FROM d JOIN m USING (l_returnflag)""".stripMargin,

    "profile_fd_check" -> {
      def fd(t: String, l: String, r: String) =
        s"""SELECT '$l' AS lhs, '$r' AS rhs,
           |  CAST(count(DISTINCT $l) AS BIGINT) AS n_lhs,
           |  CAST(count(DISTINCT ($l, $r)) AS BIGINT) AS n_pairs,
           |  count(DISTINCT $l) = count(DISTINCT ($l, $r)) AS holds
           |FROM $t""".stripMargin
      Seq(fd("orders", "o_orderkey", "o_custkey"),
        fd("orders", "o_custkey", "o_orderpriority"),
        fd("lineitem", "l_orderkey", "l_returnflag"),
        fd("lineitem", "l_partkey", "l_suppkey"))
        .mkString("\nUNION ALL\n")
    },

    "agg_ols_multi" ->
      s"""WITH d AS (SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS x1,
        |    CAST(l_discount AS DECIMAL(4,2)) AS x2,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        |  FROM lineitem),
        |a AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(x1) AS s1, sum(x2) AS s2, sum(x1*x1) AS s11,
        |    sum(x2*x2) AS s22, sum(x1*x2) AS s12,
        |    sum(y) AS sy, sum(x1*y) AS s1y, sum(x2*y) AS s2y
        |  FROM d GROUP BY 1),
        |c AS (SELECT l_returnflag, n,
        |    CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
        |    CAST(s2 AS DOUBLE) AS s2d, CAST(s11 AS DOUBLE) AS s11d,
        |    CAST(s22 AS DOUBLE) AS s22d, CAST(s12 AS DOUBLE) AS s12d,
        |    CAST(sy AS DOUBLE) AS syd, CAST(s1y AS DOUBLE) AS s1yd,
        |    CAST(s2y AS DOUBLE) AS s2yd
        |  FROM a)
        |SELECT l_returnflag, n,
        |  round(($OlsDet0) / nullif(($OlsDet), 0.0), 6) AS b0,
        |  round(($OlsDet1) / nullif(($OlsDet), 0.0), 6) AS b1,
        |  round(($OlsDet2) / nullif(($OlsDet), 0.0), 6) AS b2
        |FROM c""".stripMargin,

    "agg_trimmed_mean" ->
      """WITH d AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
        |  FROM lineitem),
        |c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM d GROUP BY 1, 2),
        |cum AS (SELECT g, v, c,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
        |  FROM c),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |j AS (SELECT cum.g, cum.v, cum.c, cum.cum, n.n,
        |    CAST(floor(n.n * 0.1) AS BIGINT) AS k
        |  FROM cum JOIN n ON n.g = cum.g),
        |s AS (SELECT g, n, k,
        |    CAST(sum(v * greatest(0, least(cum, n - k) -
        |      greatest(cum - c, k))) AS BIGINT) AS s,
        |    CAST(sum(greatest(0, least(cum, n - k) -
        |      greatest(cum - c, k))) AS BIGINT) AS n_kept
        |  FROM j GROUP BY 1, 2, 3)
        |SELECT g AS l_returnflag, n, n_kept,
        |  round(CAST(s AS DOUBLE) / CAST(n_kept AS DOUBLE), 6)
        |    AS trimmed_mean
        |FROM s""".stripMargin,

    "sketch_quantiles_sampled" -> {
      val id = "(l_orderkey * 8 + l_linenumber)"
      s"""WITH s AS (SELECT l_returnflag AS g,
        |    CAST(l_quantity AS BIGINT) AS v
        |  FROM lineitem
        |  WHERE (${OracleSql.knuth32(id)}) % 1000 < 100),
        |c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM s GROUP BY 1, 2),
        |cum AS (SELECT g, v,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
        |  FROM c),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS sample_n
        |  FROM s GROUP BY 1)
        |SELECT cum.g AS l_returnflag, n.sample_n,
        |  min(CASE WHEN cum * 2 >= sample_n THEN v END) AS p50,
        |  min(CASE WHEN cum * 10 >= sample_n * 9 THEN v END) AS p90,
        |  min(CASE WHEN cum * 100 >= sample_n * 99 THEN v END) AS p99
        |FROM cum JOIN n ON n.g = cum.g
        |GROUP BY 1, 2""".stripMargin
    },

    "agg_moments" ->
      """WITH d AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x
        |  FROM lineitem),
        |a AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s1, CAST(sum(x*x) AS BIGINT) AS s2,
        |    CAST(sum(x*x*x) AS BIGINT) AS s3,
        |    CAST(sum(x*x*x*x) AS BIGINT) AS s4
        |  FROM d GROUP BY 1),
        |f AS (SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
        |    CAST(s3 AS DOUBLE) AS s3d, CAST(s4 AS DOUBLE) AS s4d FROM a),
        |g AS (SELECT l_returnflag, n, s1d/nd AS m, s2d/nd AS r2,
        |    s3d/nd AS r3, s4d/nd AS r4 FROM f),
        |h AS (SELECT l_returnflag, n, m,
        |    r2 - m*m AS m2,
        |    r3 - 3.0*m*r2 + 2.0*m*m*m AS m3,
        |    r4 - 4.0*m*r3 + 6.0*m*m*r2 - 3.0*m*m*m*m AS m4 FROM g)
        |SELECT l_returnflag, n, round(m, 6) AS mean_qty,
        |  round(m3 / nullif(m2 * sqrt(m2), 0.0), 6) AS skewness,
        |  round(m4 / nullif(m2 * m2, 0.0) - 3.0, 6) AS kurtosis
        |FROM h""".stripMargin,

    "agg_correlation" ->
      """WITH d AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS y FROM lineitem),
        |a AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n0,
        |    CAST(sum(x) AS BIGINT) AS sx0, CAST(sum(x * x) AS BIGINT) AS sxx0,
        |    sum(y) AS sy0, sum(y * y) AS syy0,
        |    sum(CAST(x AS DECIMAL(10,0)) * y) AS sxy0
        |  FROM d GROUP BY 1),
        |f AS (SELECT l_returnflag, n0 AS n, CAST(n0 AS DOUBLE) AS nd,
        |    CAST(sx0 AS DOUBLE) AS sx, CAST(sxx0 AS DOUBLE) AS sxx,
        |    CAST(sy0 AS DOUBLE) AS sy, CAST(syy0 AS DOUBLE) AS syy,
        |    CAST(sxy0 AS DOUBLE) AS sxy FROM a)
        |SELECT l_returnflag, n,
        |  round((nd * sxy - sx * sy) /
        |    sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 6)
        |    AS pearson_r
        |FROM f""".stripMargin,

    "agg_gini_revenue" ->
      """WITH rev AS (SELECT o_custkey,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |r AS (SELECT rev, CAST(row_number() OVER
        |    (ORDER BY rev ASC, o_custkey ASC) AS BIGINT) AS rank FROM rev),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(rev) AS sx,
        |    sum(CAST(rank AS DECIMAL(20,0)) * rev) AS sxr FROM r)
        |SELECT n AS n_customers,
        |  round(2.0 * CAST(sxr AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) -
        |    CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
        |FROM a""".stripMargin,

    "agg_hhi_revenue" ->
      """WITH bs AS (SELECT s_nationkey, s_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |bn AS (SELECT s_nationkey, CAST(sum(rev) AS BIGINT) AS tot
        |  FROM bs GROUP BY 1),
        |sq AS (SELECT bs.s_nationkey,
        |    CAST(round(pow(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE), 2), 12)
        |      AS DECIMAL(18,12)) AS sq,
        |    CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE) AS share
        |  FROM bs JOIN bn USING (s_nationkey))
        |SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
        |  round(CAST(sum(sq) AS DOUBLE), 6) AS hhi,
        |  round(max(share), 6) AS top_share
        |FROM sq GROUP BY 1""".stripMargin,

    "drift_ks" ->
      """WITH m AS (SELECT CASE WHEN l_orderkey % 2 = 0 THEN l_quantity
        |    ELSE l_quantity + 15.0 END AS v,
        |    l_orderkey % 2 = 0 AS base
        |  FROM lineitem),
        |c AS (SELECT v,
        |    CAST(count(CASE WHEN base THEN 1 END) AS BIGINT) AS c0,
        |    CAST(count(CASE WHEN NOT base THEN 1 END) AS BIGINT) AS c1
        |  FROM m GROUP BY v),
        |t AS (SELECT CAST(sum(c0) AS BIGINT) AS n0,
        |    CAST(sum(c1) AS BIGINT) AS n1 FROM c),
        |cum AS (SELECT v,
        |    CAST(sum(c0) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum0,
        |    CAST(sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1
        |  FROM c),
        |d AS (SELECT v,
        |    abs(CAST(cum0 AS DOUBLE) / CAST(n0 AS DOUBLE) -
        |        CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS d
        |  FROM cum CROSS JOIN t)
        |SELECT round(d, 6) AS ks, v AS at_value FROM d
        |ORDER BY d DESC, v ASC LIMIT 1""".stripMargin,

    "intervals_coalesce" ->
      """WITH iv AS (SELECT l_suppkey, CAST(l_shipdate AS DATE) AS s,
        |    CAST(l_shipdate AS DATE) + CAST(l_quantity AS INT) AS e
        |  FROM lineitem),
        |w AS (SELECT l_suppkey, s, e,
        |    max(e) OVER (PARTITION BY l_suppkey ORDER BY s ASC, e ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv WHERE e >= s),
        |n AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END
        |    AS nw FROM w),
        |i AS (SELECT *, sum(nw) OVER (PARTITION BY l_suppkey
        |    ORDER BY s ASC, e ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM n)
        |SELECT l_suppkey, strftime(min(s), '%Y-%m-%d') AS span_start,
        |  strftime(max(e), '%Y-%m-%d') AS span_end,
        |  CAST(count(*) AS BIGINT) AS n_merged
        |FROM i GROUP BY l_suppkey, island""".stripMargin,

    "agg_crosscorr_lags" ->
      """WITH d AS (SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events),
        |x AS (SELECT day, CAST(count(*) AS BIGINT) AS x FROM d
        |  WHERE event_type = 'click' GROUP BY 1),
        |y AS (SELECT day AS yday, CAST(count(*) AS BIGINT) AS y FROM d
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |l AS (SELECT CAST(unnest([-3, -2, -1, 0, 1, 2, 3]) AS BIGINT) AS lag),
        |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM x, l JOIN y ON x.day + l.lag = y.yday
        |  GROUP BY 1)
        |SELECT lag, n AS n_days,
        |  CASE WHEN sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |      CAST(n * syy - sy * sy AS DOUBLE)) > 0.0
        |    THEN round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |        CAST(n * syy - sy * sy AS DOUBLE)), 6)
        |    ELSE 0.0 END AS corr
        |FROM m""".stripMargin,

    "agg_autocorr" ->
      """WITH d AS (SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events),
        |-- width 19 (vs Spark's 18,6): identical values, but int128
        |-- storage so x*x multiplies at DECIMAL(38,12) instead of
        |-- overflowing DuckDB's int64 DECIMAL(18) kernel
        |x AS (SELECT event_type, day, CAST(sum(v) AS DECIMAL(19,6)) AS x
        |  FROM d GROUP BY 1, 2),
        |p AS (SELECT event_type, x,
        |    lead(x) OVER (PARTITION BY event_type ORDER BY day) AS xn
        |  FROM x),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    sum(x) AS s1_, sum(x * x) AS s2_,
        |    CAST(count(xn) AS BIGINT) AS m_, sum(x * xn) AS sxy_,
        |    sum(CASE WHEN xn IS NOT NULL THEN x END) AS sh_, sum(xn) AS st_
        |  FROM p GROUP BY 1),
        |f AS (SELECT event_type, n_days, CAST(n_days AS DOUBLE) AS nd,
        |    CAST(m_ AS DOUBLE) AS md, CAST(s1_ AS DOUBLE) AS s1,
        |    CAST(s2_ AS DOUBLE) AS s2, CAST(sxy_ AS DOUBLE) AS sxy,
        |    CAST(sh_ AS DOUBLE) AS sh, CAST(st_ AS DOUBLE) AS st
        |  FROM a)
        |SELECT event_type, n_days,
        |  round((sxy - s1 / nd * (sh + st) + md * (s1 / nd) * (s1 / nd)) /
        |    nullif(s2 - nd * (s1 / nd) * (s1 / nd), 0.0), 6) AS autocorr_lag1
        |FROM f""".stripMargin,

    "agg_incremental_update" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue,
        |  min(o_orderdate) AS first_date, max(o_orderdate) AS last_date
        |FROM orders GROUP BY 1""".stripMargin,

    "agg_entropy" ->
      """WITH c AS (SELECT l_returnflag, l_linestatus,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |t AS (SELECT l_returnflag, CAST(sum(n) AS BIGINT) AS tot
        |  FROM c GROUP BY 1),
        |h AS (SELECT c.l_returnflag,
        |    CAST(round(-((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)) *
        |      ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))), 6)
        |      AS DECIMAL(18,6)) AS hh
        |  FROM c JOIN t USING (l_returnflag))
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_categories,
        |  CAST(sum(hh) AS DOUBLE) AS entropy
        |FROM h GROUP BY 1""".stripMargin,

    "agg_theil_sen" ->
      """WITH m AS (SELECT CAST(year(CAST(o_orderdate AS DATE)) * 12 +
        |      month(CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
        |  FROM orders GROUP BY 1),
        |p AS (SELECT CAST(round((b.y - a.y) / (b.x - a.x), 12)
        |    AS DECIMAL(28,12)) AS s
        |  FROM m a JOIN m b ON b.x > a.x),
        |sl AS (SELECT CAST(arr[CAST((n + 1) // 2 AS INT)] +
        |      arr[CAST(n // 2 + 1 AS INT)] AS DOUBLE) / 2.0 AS sen_slope,
        |    n AS n_pairs
        |  FROM (SELECT list(s ORDER BY s) AS arr,
        |      CAST(count(*) AS BIGINT) AS n FROM p)),
        |r AS (SELECT sl.sen_slope, sl.n_pairs,
        |    CAST(round(m.y - sl.sen_slope * m.x, 12) AS DECIMAL(28,12)) AS r
        |  FROM m, sl),
        |ra AS (SELECT sen_slope, n_pairs, list(r ORDER BY r) AS arr,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM r GROUP BY sen_slope, n_pairs)
        |SELECT n AS n_months, n_pairs, round(sen_slope, 6) AS sen_slope,
        |  round(CAST(arr[CAST((n + 1) // 2 AS INT)] +
        |    arr[CAST(n // 2 + 1 AS INT)] AS DOUBLE) / 2.0, 6) AS intercept
        |FROM ra""".stripMargin,

    "agg_trend_slope" -> {
      val x = "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)"
      val slope = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
      s"""WITH d AS (SELECT o_orderpriority, $x AS x,
         |    CAST(o_totalprice AS DECIMAL(18,2)) AS y FROM orders),
         |a AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n0,
         |    CAST(sum(x) AS BIGINT) AS sx0, CAST(sum(x * x) AS BIGINT) AS sxx0,
         |    sum(y) AS sy0, sum(CAST(x AS DECIMAL(10,0)) * y) AS sxy0
         |  FROM d GROUP BY 1),
         |f AS (SELECT o_orderpriority, n0 AS n_rows,
         |    CAST(n0 AS DOUBLE) AS n, CAST(sx0 AS DOUBLE) AS sx,
         |    CAST(sxx0 AS DOUBLE) AS sxx, CAST(sy0 AS DOUBLE) AS sy,
         |    CAST(sxy0 AS DOUBLE) AS sxy FROM a)
         |SELECT o_orderpriority, n_rows AS n,
         |  round($slope, 6) AS slope,
         |  round((sy - ($slope) * sx) / n, 6) AS intercept
         |FROM f""".stripMargin
    },

    "outlier_mad" ->
      """WITH d AS (
        |  SELECT l_returnflag, l_quantity FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 999.0 AS l_quantity FROM lineitem
        |  WHERE l_orderkey % 991 = 0),
        |m AS (SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
        |  FROM d GROUP BY 1),
        |dv AS (SELECT d.l_returnflag, m.med,
        |    abs(d.l_quantity - m.med) AS dev
        |  FROM d JOIN m USING (l_returnflag)),
        |md AS (SELECT l_returnflag, quantile_cont(dev, 0.5) AS mad
        |  FROM dv GROUP BY 1)
        |SELECT dv.l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |  max(dv.med) AS med, max(md.mad) AS mad,
        |  CAST(count(CASE WHEN dv.dev > (md.mad * 1.4826) * 3.0
        |    THEN 1 END) AS BIGINT) AS n_outliers
        |FROM dv JOIN md USING (l_returnflag)
        |GROUP BY 1""".stripMargin,

    "profile_table_stats" ->
      Seq("l_orderkey" -> "num", "l_quantity" -> "num",
        "l_returnflag" -> "str", "l_shipdate" -> "other")
        .map { case (c, k) => colStatsSql(c, k) }
        .mkString("\nUNION ALL\n"),

    "agg_histogram_prices" ->
      """WITH b AS (SELECT
        |    CAST(least(greatest(floor((o_totalprice - 0.0) / 25000.0), 0.0),
        |      31.0) AS BIGINT) AS bin, o_totalprice
        |  FROM orders WHERE o_totalprice IS NOT NULL)
        |SELECT bin, 0.0 + CAST(bin AS DOUBLE) * 25000.0 AS bin_lo,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(o_totalprice) AS min_v, max(o_totalprice) AS max_v
        |FROM b GROUP BY bin""".stripMargin,

    "agg_mode_priority" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
        |    ORDER BY n DESC, o_orderpriority ASC) AS rn FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_value, n
        |FROM r WHERE rn = 1""".stripMargin,
    "drift_lang_psi" ->
      """WITH base AS (SELECT lang, count(*) AS n_base FROM documents
        |  WHERE doc_id % 2 = 0 GROUP BY 1),
        |cur AS (SELECT CASE WHEN doc_id % 6 = 1 THEN 'en' ELSE lang END AS lang,
        |    count(*) AS n_cur
        |  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
        |j AS (SELECT coalesce(base.lang, cur.lang) AS lang,
        |    coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
        |  FROM base FULL OUTER JOIN cur ON base.lang = cur.lang),
        |t AS (SELECT CAST(sum(n_base) AS DOUBLE) AS nb,
        |    CAST(sum(n_cur) AS DOUBLE) AS nc,
        |    CAST(count(*) AS DOUBLE) AS cats FROM j)
        |SELECT lang, CAST(n_base AS BIGINT) AS n_base,
        |  CAST(n_cur AS BIGINT) AS n_cur,
        |  round(((CAST(n_cur AS DOUBLE) + 0.5) / (nc + 0.5 * cats)
        |       - (CAST(n_base AS DOUBLE) + 0.5) / (nb + 0.5 * cats))
        |    * ln(((CAST(n_cur AS DOUBLE) + 0.5) / (nc + 0.5 * cats))
        |       / ((CAST(n_base AS DOUBLE) + 0.5) / (nb + 0.5 * cats))),
        |    6) AS contrib
        |FROM j, t""".stripMargin,

    "drift_psi" ->
      """WITH base AS (SELECT CASE WHEN l_quantity < 0 THEN -1
        |    WHEN l_quantity >= 60 THEN 12
        |    ELSE CAST(floor(l_quantity / 5.0) AS BIGINT) END AS bin,
        |    count(*) AS n_base
        |  FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY 1),
        |cur AS (SELECT CASE WHEN v < 0 THEN -1 WHEN v >= 60 THEN 12
        |    ELSE CAST(floor(v / 5.0) AS BIGINT) END AS bin, count(*) AS n_cur
        |  FROM (SELECT l_quantity + 15.0 AS v FROM lineitem
        |        WHERE l_orderkey % 2 = 1) GROUP BY 1),
        |j AS (SELECT coalesce(base.bin, cur.bin) AS bin,
        |    coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
        |  FROM base FULL OUTER JOIN cur ON base.bin = cur.bin),
        |t AS (SELECT sum(n_base) AS nb, sum(n_cur) AS nc FROM j)
        |SELECT bin, CAST(n_base AS BIGINT) AS n_base,
        |  CAST(n_cur AS BIGINT) AS n_cur,
        |  round(((CAST(n_cur AS DOUBLE) + 0.5) / (CAST(nc AS DOUBLE) + 7.0)
        |       - (CAST(n_base AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 7.0))
        |    * ln(((CAST(n_cur AS DOUBLE) + 0.5) / (CAST(nc AS DOUBLE) + 7.0))
        |       / ((CAST(n_base AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 7.0))),
        |    6) AS contrib
        |FROM j, t""".stripMargin,

    "agg_moving_avg" ->
      """WITH d AS (SELECT o_orderpriority,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority, day, CAST(rev AS DOUBLE) AS rev,
        |  CAST(sum(rev) OVER w AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE) AS ma7
        |FROM d
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,

    "profile_benford_prices" ->
      """WITH counts AS (
        |  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem WHERE l_extendedprice >= 1 GROUP BY 1),
        |exp AS (SELECT digit, CAST(expected_p AS DOUBLE) AS expected_p FROM (VALUES
        |  (1, 0.30103), (2, 0.176091), (3, 0.124939), (4, 0.09691), (5, 0.079181),
        |  (6, 0.066947), (7, 0.057992), (8, 0.051153), (9, 0.045757)) e(digit, expected_p)),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM counts)
        |SELECT e.digit, coalesce(c.n, 0) AS n,
        |  round(coalesce(c.n, 0) / total, 6) AS observed_p,
        |  e.expected_p,
        |  round(abs(coalesce(c.n, 0) / total - e.expected_p), 6) AS abs_dev
        |FROM exp e LEFT JOIN counts c ON e.digit = c.digit, tot""".stripMargin,

    "profile_class_balance" ->
      """WITH c AS (SELECT label, CAST(count(*) AS BIGINT) AS n
        |  FROM embeddings GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c)
        |SELECT label, n,
        |  round(CAST(n AS DOUBLE) / tot, 6) AS share,
        |  round((1.0 - pow(0.999, CAST(n AS DOUBLE))) / (1.0 - 0.999), 6)
        |    AS effective_n
        |FROM c, t""".stripMargin,

    "privacy_k_anon" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS class_size
        |FROM customer GROUP BY 1, 2 HAVING count(*) < 10""".stripMargin,

    "privacy_l_diversity" ->
      """SELECT c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
        |  count(DISTINCT c_mktsegment) AS l, count(*) AS class_size
        |FROM customer GROUP BY 1, 2
        |HAVING count(DISTINCT c_mktsegment) < 3""".stripMargin,

    "anomaly_cusum" ->
      """WITH daily AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS dcnt,
        |    CAST(sum(x) AS BIGINT) AS sx FROM daily),
        |c AS (SELECT day, x,
        |    CAST(sum(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx
        |  FROM daily),
        |dv AS (SELECT day, idx, dcnt, abs(dcnt * p - idx * sx) AS dev FROM c, tot)
        |SELECT dcnt AS n_days, day AS change_day, idx AS change_idx,
        |  CAST(dev AS BIGINT) AS max_dev,
        |  round(CAST(dev AS DOUBLE) / CAST(dcnt AS DOUBLE), 6) AS cusum_stat
        |FROM dv ORDER BY dev DESC, day ASC LIMIT 1""".stripMargin,

    "anomaly_pettitt" ->
      """WITH daily AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |vals AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM daily GROUP BY 1),
        |v2 AS (SELECT *, CAST(coalesce(sum(cnt) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS lcnt FROM vals),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |r AS (SELECT day, 2 * lcnt + cnt + 1 AS s2
        |  FROM daily JOIN v2 USING (x)),
        |c AS (SELECT day,
        |    CAST(sum(s2) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ws,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx
        |  FROM r),
        |u AS (SELECT day, idx, n, abs(ws - idx * (n + 1)) AS k
        |  FROM c, tot WHERE idx < n)
        |SELECT n AS n_days, day AS change_day, idx AS change_idx,
        |  CAST(k AS BIGINT) AS k_stat,
        |  round(least(1.0, 2.0 * exp(-6.0 * CAST(k AS DOUBLE) * CAST(k AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      + CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))), 6) AS p_approx
        |FROM u ORDER BY k DESC, day ASC LIMIT 1""".stripMargin,

    "anomaly_seasonal_mad" ->
      """WITH daily AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST((((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7)
        |      + 7) % 7 AS INT) AS dow,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |dm AS (SELECT dow, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(count(*) AS BIGINT) AS nd FROM daily GROUP BY 1),
        |res AS (SELECT day, x,
        |    CAST(round((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE))
        |      * 1e6, 0) AS BIGINT) AS rmic
        |  FROM daily JOIN dm USING (dow)),
        |med AS (SELECT quantile_cont(rmic, 0.5) AS med FROM res),
        |dev AS (SELECT day, x, rmic,
        |    abs(CAST(rmic AS DOUBLE) - med) AS adev FROM res, med),
        |mad AS (SELECT quantile_cont(adev, 0.5) AS mad FROM dev)
        |SELECT day, x, round(CAST(rmic AS DOUBLE) / 1e6, 6) AS residual,
        |  adev > 3.0 * mad AS flagged
        |FROM dev, mad""".stripMargin,

    "agg_jackknife_se" ->
      """WITH e AS (SELECT ((user_id % 32) + 32) % 32 AS b,
        |    CAST(value AS DECIMAL(18,6)) AS v FROM events),
        |byb AS (SELECT b, CAST(count(*) AS BIGINT) AS nb, sum(v) AS sb
        |  FROM e GROUP BY 1),
        |tot AS (SELECT CAST(sum(nb) AS BIGINT) AS n, sum(sb) AS s FROM byb),
        |loo AS (SELECT CAST(round(
        |    (CAST(s AS DOUBLE) - CAST(sb AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) - CAST(nb AS DOUBLE)), 6) AS DECIMAL(18,6)) AS q
        |  FROM byb, tot),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS nB,
        |    sum(q) AS sq, sum(q * q) AS sqq FROM loo)
        |SELECT n, nB AS n_buckets,
        |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
        |  CASE WHEN NOT (CAST(sqq AS DOUBLE) -
        |      CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(nB AS DOUBLE) > 0.0)
        |    THEN 0.0
        |    ELSE round(sqrt((CAST(nB AS DOUBLE) - 1.0) / CAST(nB AS DOUBLE) *
        |      (CAST(sqq AS DOUBLE) -
        |       CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(nB AS DOUBLE))), 6)
        |  END AS se_jackknife
        |FROM mom, tot""".stripMargin,

    "ab_cuped_adjust" ->
      """WITH e AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    CAST(value AS DECIMAL(18,6)) AS v FROM events),
        |b AS (SELECT (min(sec) + max(sec)) // 2 AS mid FROM e),
        |xy AS (SELECT user_id, (user_id % 2 = 0) AS ga,
        |    coalesce(sum(CASE WHEN sec < mid THEN v END),
        |      CAST(0 AS DECIMAL(18,6))) AS x,
        |    coalesce(sum(CASE WHEN sec >= mid THEN v END),
        |      CAST(0 AS DECIMAL(18,6))) AS y
        |  FROM e, b GROUP BY 1, 2),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy FROM xy),
        |st AS (SELECT CAST(n AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |    CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd,
        |    CAST(syy AS DOUBLE) AS syyd FROM mom),
        |th AS (SELECT
        |    CASE WHEN NOT (sxxd - sxd * sxd / nd > 0.0) THEN 0.0
        |      ELSE (sxyd - sxd * syd / nd) / (sxxd - sxd * sxd / nd) END AS theta,
        |    CASE WHEN NOT (sxxd - sxd * sxd / nd > 0.0)
        |        OR NOT (syyd - syd * syd / nd > 0.0) THEN 0.0
        |      ELSE ((sxyd - sxd * syd / nd) / (sxxd - sxd * sxd / nd)) *
        |           ((sxyd - sxd * syd / nd) / (syyd - syd * syd / nd)) END AS rho2,
        |    sxd / nd AS mean_x_all
        |  FROM st),
        |arms AS (SELECT ga, CAST(count(*) AS BIGINT) AS n_users,
        |    sum(x) AS asx, sum(y) AS asy FROM xy GROUP BY 1)
        |SELECT ga AS arm_a, n_users,
        |  round(CAST(asy AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS mean_y,
        |  round(CAST(asx AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS mean_x,
        |  round(CAST(asy AS DOUBLE) / CAST(n_users AS DOUBLE) -
        |    theta * (CAST(asx AS DOUBLE) / CAST(n_users AS DOUBLE) - mean_x_all),
        |    6) AS mean_adjusted,
        |  round(theta, 6) AS theta, round(rho2, 6) AS rho2
        |FROM arms, th""".stripMargin,

    "ab_diff_in_diff" ->
      """WITH e AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    CAST(value AS DECIMAL(18,6)) AS v FROM events),
        |b AS (SELECT (min(sec) + max(sec)) // 2 AS mid FROM e),
        |cells AS (SELECT (user_id % 2 = 0) AS t, (sec >= mid) AS post,
        |    CAST(count(*) AS BIGINT) AS n, sum(v) AS sv
        |  FROM e, b GROUP BY 1, 2),
        |m AS (SELECT t, post, CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS m
        |  FROM cells)
        |SELECT
        |  round((SELECT m FROM m WHERE t AND NOT post), 6) AS mean_treat_pre,
        |  round((SELECT m FROM m WHERE t AND post), 6) AS mean_treat_post,
        |  round((SELECT m FROM m WHERE NOT t AND NOT post), 6) AS mean_ctrl_pre,
        |  round((SELECT m FROM m WHERE NOT t AND post), 6) AS mean_ctrl_post,
        |  round(((SELECT m FROM m WHERE t AND post) - (SELECT m FROM m WHERE t AND NOT post)) -
        |    ((SELECT m FROM m WHERE NOT t AND post) - (SELECT m FROM m WHERE NOT t AND NOT post)),
        |    6) AS did""".stripMargin,

    "ab_test_chi2" ->
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cv
        |  FROM events GROUP BY 1),
        |g AS (SELECT (user_id % 2 = 0) AS ga, cv FROM u),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN ga AND cv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN ga AND cv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN NOT ga AND cv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN NOT ga AND cv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM g),
        |h AS (SELECT CAST(a AS HUGEINT) AS a, CAST(b AS HUGEINT) AS b,
        |    CAST(c AS HUGEINT) AS c, CAST(d AS HUGEINT) AS d FROM t)
        |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
        |  CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
        |  round(CASE WHEN (a+b) * (c+d) * (a+c) * (b+d) = 0 THEN 0.0
        |    ELSE CAST((a+b+c+d) * (a*d - b*c) * (a*d - b*c) AS DOUBLE) /
        |      CAST((a+b) * (c+d) * (a+c) * (b+d) AS DOUBLE) END, 6) AS chi2,
        |  CASE WHEN (a+b) * (c+d) * (a+c) * (b+d) = 0 THEN 0.0
        |    ELSE CAST((a+b+c+d) * (a*d - b*c) * (a*d - b*c) AS DOUBLE) /
        |      CAST((a+b) * (c+d) * (a+c) * (b+d) AS DOUBLE) END > 3.841 AS significant
        |FROM h""".stripMargin,

    "agg_mannwhitney" ->
      """WITH e AS (SELECT (user_id % 2 = 0) AS ga,
        |    CAST(value AS DECIMAL(18,6)) AS v FROM events),
        |b AS (SELECT v,
        |    CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS n1v,
        |    CAST(sum(CASE WHEN NOT ga THEN 1 ELSE 0 END) AS BIGINT) AS n2v
        |  FROM e GROUP BY 1),
        |c AS (SELECT *, n1v + n2v AS nv,
        |    sum(n1v + n2v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_nv
        |  FROM b),
        |t AS (SELECT CAST(sum(n1v) AS BIGINT) AS n1,
        |    CAST(sum(n2v) AS BIGINT) AS n2,
        |    CAST(sum(CAST(n1v AS HUGEINT) *
        |      (2 * CAST(cum_nv AS HUGEINT) - nv + 1)) AS HUGEINT) AS r1x2,
        |    CAST(sum(CAST(nv AS HUGEINT) * nv * nv - nv) AS HUGEINT) AS tie
        |  FROM c),
        |f AS (SELECT n1, n2,
        |    CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |    CAST(n1 + n2 AS DOUBLE) AS nd,
        |    CAST(r1x2 AS DOUBLE) AS r1x2d, CAST(tie AS DOUBLE) AS tied
        |  FROM t)
        |SELECT n1, n2,
        |  round((r1x2d - n1d * (n1d + 1)) / 2, 6) AS u1,
        |  CASE WHEN NOT (n1d * n2d / 12.0 * ((nd + 1) - tied / (nd * (nd - 1))) > 0)
        |    THEN 0.0
        |    ELSE round(((r1x2d - n1d * (n1d + 1)) / 2 - n1d * n2d / 2) /
        |      sqrt(n1d * n2d / 12.0 * ((nd + 1) - tied / (nd * (nd - 1)))), 6)
        |  END AS z
        |FROM f""".stripMargin,

    "agg_welch_ttest" ->
      """WITH e AS (SELECT (user_id % 2 = 0) AS ga,
        |    CAST(value AS DECIMAL(18,6)) AS x
        |  FROM events),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    sum(CASE WHEN ga THEN x END) AS sx1,
        |    sum(CASE WHEN ga THEN x * x END) AS sxx1,
        |    CAST(sum(CASE WHEN NOT ga THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    sum(CASE WHEN NOT ga THEN x END) AS sx2,
        |    sum(CASE WHEN NOT ga THEN x * x END) AS sxx2
        |  FROM e),
        |c AS (SELECT n1, n2,
        |    CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |    CAST(sx1 AS DOUBLE) AS sx1d, CAST(sxx1 AS DOUBLE) AS sxx1d,
        |    CAST(sx2 AS DOUBLE) AS sx2d, CAST(sxx2 AS DOUBLE) AS sxx2d
        |  FROM t)
        |SELECT n1, n2,
        |  round(sx1d / n1d, 6) AS mean_a,
        |  round(sx2d / n2d, 6) AS mean_b,
        |  CASE WHEN NOT (((sxx1d - sx1d * sx1d / n1d) / (n1d - 1)) / n1d +
        |         ((sxx2d - sx2d * sx2d / n2d) / (n2d - 1)) / n2d > 0) THEN 0.0
        |  ELSE round((sx1d / n1d - sx2d / n2d) /
        |    sqrt(((sxx1d - sx1d * sx1d / n1d) / (n1d - 1)) / n1d +
        |         ((sxx2d - sx2d * sx2d / n2d) / (n2d - 1)) / n2d), 6)
        |  END AS t_stat
        |FROM c""".stripMargin,

    "privacy_t_closeness" ->
      """WITH base AS (SELECT c_nationkey,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
        |    c_mktsegment AS v
        |  FROM customer WHERE c_mktsegment IS NOT NULL),
        |cell AS (SELECT c_nationkey, bal_bucket, v,
        |    CAST(count(*) AS BIGINT) AS ncv
        |  FROM base GROUP BY 1, 2, 3),
        |cls AS (SELECT c_nationkey, bal_bucket,
        |    CAST(count(*) AS BIGINT) AS class_size
        |  FROM base GROUP BY 1, 2),
        |gdist AS (SELECT v, CAST(count(*) AS BIGINT) AS nv FROM base GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS N FROM base),
        |agg AS (SELECT c.c_nationkey, c.bal_bucket, s.class_size, t.N,
        |    sum(abs(c.ncv * t.N - g.nv * s.class_size)) AS sp,
        |    sum(g.nv) AS pnv
        |  FROM cell c
        |  JOIN cls s ON s.c_nationkey IS NOT DISTINCT FROM c.c_nationkey
        |    AND s.bal_bucket IS NOT DISTINCT FROM c.bal_bucket
        |  JOIN gdist g ON g.v = c.v
        |  CROSS JOIN tot t
        |  GROUP BY 1, 2, 3, 4)
        |SELECT c_nationkey, bal_bucket, class_size,
        |  round(CAST(sp + (N - pnv) * class_size AS DOUBLE) /
        |    (2.0 * CAST(class_size AS DOUBLE) * CAST(N AS DOUBLE)), 6) AS t_dist
        |FROM agg WHERE round(CAST(sp + (N - pnv) * class_size AS DOUBLE) /
        |  (2.0 * CAST(class_size AS DOUBLE) * CAST(N AS DOUBLE)), 6) > 0.3""".stripMargin,

    "dq_lineitem" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |  FROM lineitem),
        |dirty AS (
        |  SELECT * FROM li
        |  UNION ALL SELECT l_orderkey, l_linenumber + 100, NULL, l_quantity
        |    FROM li WHERE l_orderkey % 997 = 0
        |  UNION ALL SELECT l_orderkey, l_linenumber + 200, l_returnflag, 999.0
        |    FROM li WHERE l_orderkey % 991 = 0
        |  UNION ALL SELECT * FROM li WHERE l_orderkey % 983 = 0
        |  UNION ALL SELECT l_orderkey + 2000000000, l_linenumber, l_returnflag,
        |    l_quantity FROM li WHERE l_orderkey % 977 = 0),
        |d AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS null_l_returnflag,
        |  CAST(sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1
        |    ELSE 0 END) AS BIGINT) AS oob_l_quantity
        |  FROM dirty),
        |k AS (SELECT CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
        |    AS n_dup_rows
        |  FROM (SELECT count(*) AS c FROM dirty GROUP BY l_orderkey, l_linenumber)),
        |o AS (SELECT CAST(count(*) AS BIGINT) AS n_orphans FROM dirty
        |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |SELECT * FROM d, k, o""".stripMargin,

    "agg_quantity_stats" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS median_qty,
        | quantile_cont(l_quantity, 0.9) AS p90_qty,
        | round((sum(l_quantity*l_quantity) - sum(l_quantity)*sum(l_quantity)/CAST(count(*) AS DOUBLE))
        |   / (CAST(count(*) AS DOUBLE) - 1.0), 6) AS var_qty,
        | round(sqrt((sum(l_quantity*l_quantity) - sum(l_quantity)*sum(l_quantity)/CAST(count(*) AS DOUBLE))
        |   / (CAST(count(*) AS DOUBLE) - 1.0)), 6) AS stddev_qty,
        | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    "agg_rollup_distinct" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        | CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        | sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)
}
