package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed corpus curation — the end-to-end training-data pass built from
  * the individual operators:
  *
  *   1. language filter (marker heuristic, keep target language),
  *   2. quality floor,
  *   3. exact dedup (min-id representative per fingerprint),
  *   4. near-dup removal (exact n-gram Jaccard pairs; greedy keep-lowest-id:
  *      any doc appearing as the higher id of a qualifying pair is dropped),
  *   5. survivor stats.
  *
  * Plan shape: two linear scans' worth of per-row expressions + the dedup
  * aggregates + the prefix-filtered pair join — nothing quadratic, every
  * stage shuffles by content keys. Deterministic output (greedy rule is
  * id-ordered, not discovery-ordered).
  */
object Curation {

  final case class Params(
      language: String = "en",
      minQuality: Double = 0.6,
      shingleN: Int = 3,
      nearDupThreshold: Double = 0.8)

  /** Surviving documents with their curation features. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      params: Params = Params()): DataFrame = {
    val (afterExact, pairs) = upToPairs(docs, idCol, textCol, params)
    // near-dup removal: drop the higher id of every qualifying pair
    val dupIds = pairs.select(col("id_b").as("id")).distinct()
    afterExact.join(dupIds, Seq("id"), "left_anti")
      .select(col("id"), col("langid"), col("quality"))
  }

  /** [[curate]] with TRANSITIVE near-dup removal: qualifying pairs are
    * resolved into connected components and only each component's min id
    * survives. Strictly more aggressive than the greedy rule on connected
    * clusters — with pairs (B,C),(A,C) and A<B<C, greedy keeps A AND B
    * (B is never a pair's higher id), transitive collapses the whole
    * cluster to A. The principled mode when near-dups chain. */
  def curateTransitive(docs: DataFrame, idCol: String, textCol: String,
      params: Params = Params()): DataFrame = {
    val (afterExact, pairs) = upToPairs(docs, idCol, textCol, params)
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val dupIds = comp.filter(col("component") =!= col("id")).select(col("id"))
    afterExact.join(dupIds, Seq("id"), "left_anti")
      .select(col("id"), col("langid"), col("quality"))
  }

  /** Shared stages 1-4a: features → filters → exact dedup → qualifying
    * near-dup pairs. */
  private def upToPairs(docs: DataFrame, idCol: String, textCol: String,
      params: Params): (DataFrame, DataFrame) = {
    val featured = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("langid", TextOps.languageId(col("text")))
      .withColumn("quality", round(TextOps.qualityScore(col("text")), 6))
    val filtered = featured
      .filter(col("langid") === params.language &&
        col("quality") >= params.minQuality)
    // exact dedup among the filtered set
    val exactKept = filtered
      .groupBy(TextOps.fingerprint(col("text")).as("fp"))
      .agg(min(col("id")).as("id"))
      .select(col("id"))
    val afterExact = filtered.join(exactKept, Seq("id"), "left_semi")
    (afterExact, Dedup.ngramJaccardPairs(afterExact, "id", "text",
      params.shingleN, params.nearDupThreshold))
  }

  /** Budget-constrained selection: rank documents by (quality desc, id asc)
    * — a total order — and keep the maximal PREFIX whose running token
    * total stays within `budgetTokens` ("fill a 10B-token budget with the
    * best documents"). Prefix semantics, not knapsack: the first document
    * that would overflow the budget is dropped and nothing after it is
    * reconsidered, so the cut is deterministic and auditable.
    *
    * Quality is 6dp-rounded BEFORE ranking so the order (and therefore the
    * kept set) is stable across engines; the running total is
    * [[Ranking.prefixSum]]'s two-pass distributed scan, never a
    * single-task global window. */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    // null text scores 0 quality / 0 tokens (prefixSum needs non-null longs)
    val scored = docs.select(col(idCol).as("id"),
      coalesce(round(TextOps.qualityScore(col(textCol)), 6), lit(0.0))
        .as("quality"),
      coalesce(TextOps.tokenCountWhitespace(col(textCol)).cast("long"), lit(0L))
        .as("n_tokens"))
    Ranking.prefixSum(scored, Seq(col("quality").desc, col("id").asc),
        Seq("n_tokens"))
      .where(col("cum_n_tokens") <= budgetTokens)
      .select(col("id").as("doc_id"), col("quality"), col("n_tokens"),
        col("cum_n_tokens").as("cum_tokens"))
  }
}
