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
    val afterExact = afterExactStage(docs, idCol, textCol, params)
    curateFrom(afterExact, nearDupPairs(afterExact, params))
  }

  /** [[curate]]'s final stage over precomputed shared stages — lets a
    * caller that runs BOTH curation modes (greedy and transitive) pay
    * the feature/filter/exact-dedup/pair work once and feed each mode
    * from the same (possibly cached) frames. */
  def curateFrom(afterExact: DataFrame, pairs: DataFrame): DataFrame = {
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
    val afterExact = afterExactStage(docs, idCol, textCol, params)
    curateTransitiveFrom(afterExact, nearDupPairs(afterExact, params))
  }

  /** [[curateTransitive]]'s final stage over precomputed shared stages
    * (see [[curateFrom]]). */
  def curateTransitiveFrom(afterExact: DataFrame, pairs: DataFrame)
      : DataFrame = {
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val dupIds = comp.filter(col("component") =!= col("id")).select(col("id"))
    afterExact.join(dupIds, Seq("id"), "left_anti")
      .select(col("id"), col("langid"), col("quality"))
  }

  /** Shared stages 1-3: features → filters → exact dedup. Output columns
    * (id, text, langid, quality). */
  def afterExactStage(docs: DataFrame, idCol: String, textCol: String,
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
    filtered.join(exactKept, Seq("id"), "left_semi")
  }

  /** Stage 4a: qualifying near-dup pairs among the exact-dedup survivors. */
  def nearDupPairs(afterExact: DataFrame, params: Params = Params())
      : DataFrame =
    Dedup.ngramJaccardPairs(afterExact, "id", "text",
      params.shingleN, params.nearDupThreshold)

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

  /** Filter-ablation report — the per-rule attribution table every corpus
    * release publishes: for each curation rule, how many documents it
    * flags, and how many it UNIQUELY flags (docs no other rule would
    * catch — the marginal value of keeping that rule; a rule whose
    * unique count is 0 is fully shadowed and could be dropped without
    * changing the corpus). Rules evaluated INDEPENDENTLY (no
    * short-circuit order, unlike [[curate]]'s sequential stages):
    *
    *   - `lang`    — language id ≠ `language`,
    *   - `quality` — 6dp-rounded quality score < `minQuality`,
    *   - `short`   — whitespace token count < `minTokens`,
    *   - `dup`     — not the min-id representative of its exact
    *                 fingerprint group,
    *
    * plus a `kept` row (zero flags; its two counts coincide).
    *
    * Cost shape: one narrow pass computes the three per-row flags; the
    * dup flag is a fingerprint groupBy joined back (content-keyed,
    * map-side combinable); everything then collapses into ONE global
    * aggregate row that explodes into the 5-row report — no per-rule
    * rescans of the corpus.
    *
    * Output: (rule, n_flagged, n_unique). */
  def filterAblation(docs: DataFrame, idCol: String, textCol: String,
      language: String = "en", minQuality: Double = 0.6,
      minTokens: Int = 20): DataFrame = {
    val f = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("__f_lang",
        TextOps.languageId(col("text")) =!= lit(language))
      .withColumn("__f_quality",
        round(TextOps.qualityScore(col("text")), 6) < minQuality)
      .withColumn("__f_short",
        TextOps.tokenCountWhitespace(col("text")) < minTokens)
      .withColumn("__fp", TextOps.fingerprint(col("text")))
    val rep = f.groupBy(col("__fp")).agg(min(col("id")).as("__keep_id"))
    val flagged = f.join(rep, Seq("__fp"))
      .withColumn("__f_dup", col("id") =!= col("__keep_id"))
      .withColumn("__nfails",
        col("__f_lang").cast("int") + col("__f_quality").cast("int") +
          col("__f_short").cast("int") + col("__f_dup").cast("int"))
    // coalesce: sum over an EMPTY corpus is null — report zeros instead
    def cnt(flag: String) = coalesce(sum(col(flag).cast("long")), lit(0L))
    def uniq(flag: String) = coalesce(
      sum((col(flag) && col("__nfails") === 1).cast("long")), lit(0L))
    val one = flagged.agg(
      cnt("__f_lang").as("lf"), uniq("__f_lang").as("lu"),
      cnt("__f_quality").as("qf"), uniq("__f_quality").as("qu"),
      cnt("__f_short").as("sf"), uniq("__f_short").as("su"),
      cnt("__f_dup").as("df"), uniq("__f_dup").as("du"),
      coalesce(sum((col("__nfails") === 0).cast("long")), lit(0L))
        .as("kept"))
    one.select(explode(array(
        struct(lit("lang").as("rule"), col("lf").as("n_flagged"),
          col("lu").as("n_unique")),
        struct(lit("quality").as("rule"), col("qf").as("n_flagged"),
          col("qu").as("n_unique")),
        struct(lit("short").as("rule"), col("sf").as("n_flagged"),
          col("su").as("n_unique")),
        struct(lit("dup").as("rule"), col("df").as("n_flagged"),
          col("du").as("n_unique")),
        struct(lit("kept").as("rule"), col("kept").as("n_flagged"),
          col("kept").as("n_unique")))).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_flagged").as("n_flagged"),
        col("r.n_unique").as("n_unique"))
  }

  /** Greedy k-center coreset (Gonzalez farthest-point traversal): seed at
    * the lowest id, then k−1 times add the vector FARTHEST from its
    * nearest chosen center — the classic 2-approximation to the k-center
    * cover, and the "pick a maximally diverse subset" primitive of
    * embedding-space curation (each `sel_dist` is the covering radius²
    * the selection just cut).
    *
    * Each round is ONE distributed argmax: min-distance to the ≤k chosen
    * centers is a per-row `least` over broadcast literal vectors (no
    * join), reduced by a single max(struct) — map-side combinable, no
    * window, nothing collected but the winner row. k rounds = k scans; at
    * corpus scale persist `vectors` first. Distances are 9dp-rounded
    * decimals before the argmax so tie-breaks (lowest id) bind
    * identically in any engine replaying the traversal.
    *
    * @return (rank, vec_id, sel_dist): selection order, chosen vector,
    *         its 6dp selection distance² (null for the seed). */
  def kCenterCoreset(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 256, s"k out of range (2..256): $k")
    import java.math.{BigDecimal => JBD, RoundingMode}
    val spark = vectors.sparkSession
    // Persist the projected corpus for the greedy loop: every round runs
    // one argmax aggregate plus one center fetch, so k=8 costs ~14 passes
    // — against a cached 2-column frame instead of 14 parquet scans +
    // float→double conversions. Unpersisted before returning (the result
    // is already driver-side).
    val v = vectors.select(col(idCol).cast("long").as("id"),
      Ann.asDouble(col(vecCol)).as("e"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val seed = v.orderBy(col("id").asc).limit(1).collect()(0)
    var centers = Vector[(Long, Seq[Double], Option[Double])](
      (seed.getLong(0), seed.getSeq[Double](1), None))
    for (_ <- 1 until k) {
      val dists = centers.map { case (_, ce, _) =>
        Ann.sqDist(col("e"), typedLit(ce)) }
      val dmin = if (dists.size == 1) dists.head else least(dists: _*)
      val win = v
        .select(col("id"),
          round(dmin, 9).cast("decimal(28,9)").as("d"))
        .agg(max(struct(col("d"), (-col("id")).as("ni"))).as("m"))
        .select(col("m.d").cast("double").as("d"), (-col("m.ni")).as("id"))
        .collect()(0)
      val ce = v.filter(col("id") === win.getLong(1))
        .select(col("e")).collect()(0).getSeq[Double](0)
      centers :+= ((win.getLong(1), ce,
        Some(JBD.valueOf(win.getDouble(0))
          .setScale(6, RoundingMode.HALF_UP).doubleValue)))
    }
    val out = centers.zipWithIndex.map { case ((id, _, d), r) => (r, id, d) }
    spark.createDataFrame(out).toDF("rank", "vec_id", "sel_dist")
    } finally v.unpersist(blocking = false)
  }
}
