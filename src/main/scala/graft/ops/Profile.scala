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
}
