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
    // near-dup removal: drop the higher id of every qualifying pair
    val dupIds = Dedup.ngramJaccardPairs(afterExact, "id", "text",
      params.shingleN, params.nearDupThreshold)
      .select(col("id_b").as("id")).distinct()
    afterExact.join(dupIds, Seq("id"), "left_anti")
      .select(col("id"), col("langid"), col("quality"))
  }
}
