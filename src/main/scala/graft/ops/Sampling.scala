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
}
