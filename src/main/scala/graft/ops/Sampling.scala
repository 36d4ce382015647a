package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the source-weighted mixing step of a
  * training-data pipeline (e.g. "keep 5% of crawl, 20% of books, 100% of
  * reference"), expressed so the SAME rows come out on every run, every
  * engine, and every partitioning:
  *
  * a row is kept iff `knuthHash(id) % 1000 < permille(stratum)`.
  *
  * The hash is Knuth's multiplicative constant over the row's integer id —
  * plain 64-bit arithmetic, reproducible anywhere (unlike rand(seed), whose
  * stream depends on partition layout, or xxhash64, which other engines
  * lack). Pure narrow filter: no shuffle, composes with any scan, and the
  * sampling decision for a row never changes as the corpus grows — the
  * property that makes downstream dedup/eval splits stable across snapshots.
  */
object Sampling {

  /** `((id mod 1000000007) * 2654435761) mod 2^32 mod 1000` — uniform-ish
    * permille bucket. The leading prime modulus keeps the multiply under
    * 2.66e18 < 2^63 for ANY non-negative 64-bit id (the old direct multiply
    * overflowed — an ANSI-mode crash — from id ≈ 3.5e9 up). Ids must be
    * non-negative: both engines' `%` is dividend-signed, so the expression
    * is only dialect-identical on non-negatives. */
  def permilleBucket(id: Column): Column =
    pmod(pmod(pmod(id, lit(1000000007L)) * lit(2654435761L),
      lit(4294967296L)), lit(1000L))

  /** Keep each stratum at its permille rate (unlisted strata use
    * `defaultPermille`). Pure filter: output columns = input columns. */
  def stratified(df: DataFrame, stratumCol: String, idCol: String,
      permille: Map[String, Int], defaultPermille: Int): DataFrame = {
    val rate = permille.foldLeft(lit(defaultPermille).cast("long")) {
      case (acc, (stratum, p)) =>
        when(col(stratumCol) === lit(stratum), lit(p.toLong)).otherwise(acc)
    }
    df.filter(permilleBucket(col(idCol)) < rate)
  }

  /** Dataset repetition with a FRACTIONAL factor — "2.3 epochs of this
    * source" in a training mixture: every row appears ⌊f⌋ times (epoch
    * 0..⌊f⌋-1), and the fractional remainder epoch keeps the deterministic
    * [[permilleBucket]] subset of rows, so expected multiplicity is f and
    * the chosen subset is the same on every run/engine/partitioning.
    * Output = input columns + `epoch`. One generator, no shuffle. */
  def repeatEpochs(df: DataFrame, idCol: String, factor: Double): DataFrame = {
    require(factor > 0.0, "factor must be positive")
    require(!df.columns.contains("epoch"),
      "repeatEpochs emits an `epoch` column; rename the existing one")
    val whole = math.floor(factor).toLong
    // the fraction is realized at permille granularity (the hash bucket's
    // resolution); a factor whose fraction rounds to 0/1000 is rejected
    // rather than silently quantized to the integer part
    val fracPermille = math.round((factor - whole) * 1000).toLong
    require(whole > 0 || fracPermille > 0,
      s"factor $factor is below the 1/1000 sampling granularity")
    require(math.abs((factor - whole) - fracPermille / 1000.0) < 1e-9,
      s"factor $factor: the fractional part is realized in permille steps; " +
        "use a multiple of 0.001")
    df.select(col("*"),
        explode(sequence(lit(0L), lit(whole))).as("epoch"))
      .filter(col("epoch") < whole ||
        (lit(fracPermille) > 0 && permilleBucket(col(idCol)) < fracPermille))
  }

  /** Deterministic train/val/test assignment: consecutive permille ranges
    * of the id hash map to named splits, so a document's split never
    * changes as the corpus grows (a test doc can never silently migrate
    * into train between snapshots — the leakage-prevention property).
    * `splits` are (name, permille) with permilles summing to ≤ 1000; any
    * remainder falls into `defaultSplit`. Adds a `split` column, pure
    * per-row, no shuffle. */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)], defaultSplit: String = "train"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive permilles")
    require(splits.map(_._2).sum <= 1000, "split permilles must sum to <= 1000")
    require(!df.columns.contains("split"),
      "assignSplits emits a `split` column; rename the existing one")
    val bucket = permilleBucket(col(idCol))
    val bounds = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }
    val ranges = splits.zip(bounds.zip(bounds.tail))
    val expr = ranges.foldRight(lit(defaultSplit): Column) {
      case (((name, _), (lo, hi)), acc) =>
        when(bucket >= lo && bucket < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Cap each group at `k` rows — "at most k documents per domain", the
    * anti-domination rule of corpus mixing. The kept subset is a
    * deterministic pseudo-random sample: rows rank by (hash-bucket, id)
    * within their group, so the winners are stable across runs and
    * partitionings, and adding new rows can only displace, never reshuffle,
    * the order. One shuffle by group; groups far above k are the skew case
    * (rank early-exits nothing), so cap AFTER any cheap per-row filters. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.contains("__rank"),
      "capPerGroup uses an internal __rank column; rename the existing one")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(permilleBucket(col(idCol)).asc, col(idCol).asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Temporal train/validation split: per key, the FIRST `trainPct`% of
    * rows (by time) are `train`, the rest `val` — the leakage-safe split
    * for sequential data, where a random split would let the model peek at
    * each user's future. The cut count is exact integer arithmetic
    * (`(cnt * trainPct) div 100`), so the boundary is engine-independent;
    * `tieCol` totalizes the per-key order. Floor semantics bias small
    * keys toward `val`: train takes floor(cnt·trainPct/100) rows, so a
    * key with fewer than 100/trainPct rows contributes NOTHING to train
    * (a 1-row key at 80% goes entirely to val — the leakage-safe side).
    *
    * One shuffle on the key + a per-key window (row_number and count over
    * the same partitioning — single exchange, two window frames). Appends
    * a `split` column. */
  def temporalSplit(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, trainPct: Int): DataFrame = {
    require(trainPct > 0 && trainPct < 100, s"trainPct in (0,100): $trainPct")
    Seq("split", "__rn", "__cnt").foreach { c =>
      require(!df.columns.contains(c),
        s"temporalSplit uses/emits a $c column; rename the existing one")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val all = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__cnt", count(lit(1)).over(all))
      .withColumn("split",
        when(col("__rn") <= expr(s"(__cnt * $trainPct) div 100"), lit("train"))
          .otherwise(lit("val")))
      .drop("__rn", "__cnt")
  }

  /** Keep the top `frac` of rows by score — the ADAPTIVE quality floor
    * ("best 30% of the corpus", however the score distribution shifts),
    * versus [[graft.ops.Curation]]'s fixed threshold. Exact and
    * deterministic: rows rank by (score desc, id asc) via the distributed
    * [[Ranking.globalRank]] (range exchange + partition offsets — never
    * the one-task empty-partition window), and the cutoff count is
    * computed in-plan (1-row broadcast cross join, no driver action).
    * Output: input columns + `rank`. */
  def topFraction(df: DataFrame, scoreCol: String, idCol: String,
      frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    require(!df.columns.contains("__n"),
      "topFraction uses an internal __n column; rename the existing one")
    val ranked = Ranking.globalRank(df,
      Seq(col(scoreCol).desc, col(idCol).asc))
    val n = df.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(org.apache.spark.sql.functions.broadcast(n))
      .filter(col("rank") <= ceil(lit(frac) * col("__n")))
      .drop("__n")
  }

  /** Deterministic uniform in (0,1) derived from the id hash:
    * `(knuth32(id) + 0.5) / 2^32`. Every step is IEEE-exact (integer +
    * 0.5 is representable, the divisor is a power of two), so the value is
    * bit-identical on any engine that can do 64-bit integer arithmetic —
    * the engine-portable replacement for rand(seed), whose stream depends
    * on partition layout. */
  def uniform01(id: Column): Column =
    (Shaping.knuth32(id) + lit(0.5)) / lit(4294967296.0)

  /** Weighted sampling WITHOUT replacement, k per group — the
    * Efraimidis–Spirakis exponential-key scheme (Inf. Proc. Letters 97(5),
    * 2006): each row draws key `ln(u)/w` from its deterministic uniform
    * [[uniform01]] and its weight, and the k LARGEST keys per group win.
    * P(row wins) is proportional-to-weight without replacement, and the
    * winner set is a pure function of (id, weight) — stable across runs,
    * engines and partitionings.
    *
    * Ranking runs through the bounded [[TopKAgg]] aggregate, which
    * partial-combines map-side: a group's candidates never gather in one
    * window partition, so a group with a billion rows costs each task only
    * an O(k) buffer (the `row_number()` formulation ships the whole group
    * to one task). The winner ids (k·|groups| rows, tiny) broadcast-join
    * back to the input to recover full rows.
    *
    * Rows with weight <= 0 or a null weight never win. `idCol` must be
    * integral, unique and non-negative ([[permilleBucket]]'s contract);
    * ties (hash-colliding ids with equal weights) break by id ascending. */
  def weightedSample(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("__tk"),
      "weightedSample uses an internal __tk column; rename the existing one")
    val key = log(uniform01(col(idCol))) / col(weightCol).cast("double")
    val winners = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .groupBy(col(groupCol))
      .agg(TopKAgg.topK(key, col(idCol).cast("long"), k).as("__tk"))
      .select(col(groupCol), explode(col("__tk.id")).as(idCol))
    df.join(broadcast(winners), Seq(groupCol, idCol))
  }

  /** Temperature-scaled source mixing — the multilingual/multi-source
    * rebalancing rule (e.g. UnigramLM / mT5-style sampling): source s with
    * n_s rows is kept at rate ∝ n_s^(α-1), normalized so the expected
    * total is `budgetFrac` of the corpus, capped at 1.0. α = 1 reproduces
    * natural proportions; α → 0 approaches uniform-over-sources; small
    * sources are up-weighted relative to their share, never upsampled.
    *
    * The per-source rate is computed IN-PLAN (two tiny aggregates + a
    * broadcast), quantized to an integer micro-rate (`round(1e6·rate)`),
    * and each row keeps iff its exact integer hash slot
    * `(knuth32(id)·10^6) >> 32` falls below it — the per-row decision is
    * pure 64-bit integer arithmetic, so the kept set is deterministic and
    * engine-portable; the one double (the rate) is pinned by the
    * quantization. High hash bits, not `mod 10^6`: a multiplicative
    * hash's low bits are unmixed. Output = input columns. */
  def temperatureMix(df: DataFrame, sourceCol: String, idCol: String,
      alpha: Double, budgetFrac: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(budgetFrac > 0.0 && budgetFrac <= 1.0,
      s"budgetFrac must be in (0, 1], got $budgetFrac")
    Seq("__n", "__z", "__tot", "__rate_micro").foreach { c =>
      require(!df.columns.contains(c),
        s"temperatureMix uses an internal $c column; rename the existing one")
    }
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).cast("double").as("__n"))
    val z = counts.agg(sum(pow(col("__n"), lit(alpha))).as("__z"),
      sum(col("__n")).as("__tot"))
    val rates = counts.crossJoin(broadcast(z))
      .select(col(sourceCol),
        round(least(lit(1.0),
          lit(budgetFrac) * col("__tot") * pow(col("__n"), lit(alpha)) /
            col("__z") / col("__n")) * lit(1000000.0))
          .cast("long").as("__rate_micro"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(Shaping.shardOf(Shaping.knuth32(col(idCol)), 1000000) <
        col("__rate_micro"))
      .drop("__rate_micro")
  }
}
