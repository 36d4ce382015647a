package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
