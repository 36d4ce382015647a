package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.table
import graft.ops.{Ann, LangModel, Profile, RangeJoin, Robust, Sampling, Snapshot, TextOps}

/** Corpus-mixing and scoring gates, round 6 continuation: weighted
  * sampling without replacement (Efraimidis–Spirakis), temperature-scaled
  * source mixing, bigram language-model perplexity scoring, the
  * interval-overlap join, and per-group winsorization.
  */
object MixQueries {

  def family: QueryFamily = QueryFamily("mix", queries, oracles)

  private val WeightedK = 40
  private val MixAlpha = 0.7
  private val MixBudget = 0.5
  private val LmAddK = 0.5
  private val DsirTopK = 150
  private val PromoCount = 160L
  private val PromoPeriod = 17L
  private val PromoLen = 9L // window is [start, start + 9] — 10 days
  private val OverlapBucket = 16L
  private val WinsorLo = 0.05
  private val WinsorHi = 0.95
  private val CurateFrac = 0.5
  private val ProjInDim = 64
  private val ProjOutDim = 16
  private val PipeSeqLen = 64
  private val PipeShards = 4
  private val BtIters = 12

  /** Language-ID + bigram-LM negative-log-likelihood per doc, memoized:
    * curate_lm and its packing composition (pipeline_lm_pack) run the
    * identical scoring chain, and keepBelowQuantile reads its input
    * twice (threshold pass + filter pass) — the memo's persist covers
    * both needs at once. */
  private def lmScoredJoined(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached("mix.lmScored", s, dir) {
      val docs = table(s, dir, "documents")
      val lang = docs.select(col("doc_id"),
        TextOps.languageId(col("text")).as("langid"))
      val scored = LangModel.scoreDocs(docs, docs, "doc_id", "text", LmAddK)
        .filter(col("nll").isNotNull)
      lang.join(scored, Seq("doc_id"))
    }

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(

    // Water-filling token-budget allocation (the mixing planner): per
    // source, alloc = min(avail, t·w) with the level t at its closed
    // order-statistics form — ONE window over the |sources| aggregate
    // rows, no driver fixed-point loop. Budget = 60% of corpus tokens;
    // integer weights fabricated from the source name so small sources
    // saturate and their leftover redistributes.
    "mix_water_fill" -> ((s, dir) =>
      graft.ops.Mixture.waterFillTokens(s, table(s, dir, "documents"),
        "source", "text",
        weight = (length(col("grp")) % 3 + 1).cast("long"),
        budgetFrac = 0.6)),

    // RLHF/DPO preference-pair construction: per prompt group (user_id
    // plays the prompt, events its scored candidate completions), the
    // highest- vs lowest-scored candidate with id-asc tiebreaks — one
    // bounded TopKAgg pass in each direction, never a per-prompt window,
    // so a hot prompt with 10⁵ sampled completions costs map-side k=1
    // buffers. All-tied groups (chosen = rejected) drop.
    "preference_pairs" -> ((s, dir) =>
      graft.ops.Preference.pairs(table(s, dir, "events"),
        "user_id", "event_id", "value")),

    // Bradley–Terry strength fit over event-type "arms": each user is a
    // judge, arm i beats arm j when the user's exact decimal value-sum
    // for i exceeds j's (ties = no game) — then 12 fixed MM iterations
    // (Hunter 2004) on the 5×5 win matrix, every neighbor-sum an exact
    // decimal of 12dp terms so the oracle replays the recurrence
    // bit-for-bit (its SQL mirror is the same loop UNROLLED into a CTE
    // chain). The input-scale work is one groupBy + one user-keyed
    // self-join; the fit itself never touches row-scale data.
    "preference_bradley_terry" -> ((s, dir) => {
      val uv = table(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("value").cast("decimal(18,6)").as("__v"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(col("__v")).as("__sv"))
      val wins = uv.select(col("user_id"), col("event_type").as("__ti"),
          col("__sv").as("__vi"))
        .join(uv.select(col("user_id"), col("event_type").as("__tj"),
          col("__sv").as("__vj")), Seq("user_id"))
        .filter(col("__ti") =!= col("__tj") && col("__vi") > col("__vj"))
        .groupBy(col("__ti"), col("__tj")).agg(count(lit(1)).as("__n"))
      graft.ops.Preference.bradleyTerry(wins, "__ti", "__tj", "__n",
        iters = BtIters)
        .withColumnRenamed("arm", "event_type")
    }),

    // Weight-proportional sample without replacement: 40 docs per source,
    // weight = n_chars (longer docs proportionally likelier). Winners are
    // ranked by the bounded TopKAgg, not a window.
    "sample_weighted" -> ((s, dir) =>
      Sampling.weightedSample(table(s, dir, "documents"),
        "source", "doc_id", "n_chars", WeightedK)),

    // Class-balanced downsampling: every label keeps exactly min-class-
    // size rows, winners picked by a deterministic md5-prefix hash rank
    // (tie: id) — the imbalance fix a classifier-training prep applies
    // before anything reweighting-based. Per-label ranking window (keyed
    // by the class — never global); the 1-row min rides as a broadcast.
    // The hash is engine-replayable, so the oracle picks identical rows.
    "sample_balanced_classes" -> ((s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id"), col("label"))
      val minN = e.groupBy(col("label")).agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("mn"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("label"))
        .orderBy(conv(substring(md5(col("vec_id").cast("string")), 1, 15),
          16, 10).cast("long").asc, col("vec_id").asc)
      e.withColumn("__rk", row_number().over(w))
        .crossJoin(broadcast(minN))
        .filter(col("__rk") <= col("mn"))
        .select(col("vec_id"), col("label"))
    }),

    // α = 0.7 temperature rebalance of the four document sources at a 50%
    // total budget: small sources keep a larger share than natural.
    "sample_temperature" -> ((s, dir) =>
      Sampling.temperatureMix(
        table(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", "doc_id", MixAlpha, MixBudget)
        .select(col("doc_id"), col("source"))),

    // Self-scored bigram LM: mean negative log-likelihood per bigram,
    // add-0.5 smoothing — the perplexity-filter score.
    "text_lm_score" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      LangModel.scoreDocs(docs, docs, "doc_id", "text", LmAddK)
    }),

    // Interpolated Kneser–Ney bigram scoring (D = 0.75, add-0.5-smoothed
    // continuation) — the production-grade smoothing next to the add-k
    // baseline above; all three model views derive from ONE collapsed
    // bigram-count aggregate.
    "text_lm_kneser_ney" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      LangModel.kneserNeyScore(docs, docs, "doc_id", "text")
    }),

    // DSIR importance selection: target = the English slice, raw = the
    // whole corpus; per-doc unigram log-likelihood ratio (add-1 smoothing
    // over the raw vocabulary, 6dp decimal-summed), keep the top 150 by
    // (score, id) — TakeOrdered, never a global sort.
    "dsir_select" -> ((s, dir) =>
      LangModel.dsirScores(table(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
        .filter(col("n_tokens") > 0)
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(DsirTopK)),

    // Order-activity windows ([orderdate, orderdate + key%30 days]) ⋈
    // overlapping 10-day promo windows every 17 days — the bucketized
    // interval-overlap join; output carries the overlap length.
    "overlap_join_promos" -> ((s, dir) => {
      val ords = table(s, dir, "orders")
        .select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("o_start"))
        .withColumn("o_end", col("o_start") + pmod(col("o_orderkey"), lit(30L)))
      // Promo grid anchored at the TPC-H epoch day 8035 (1992-01-01).
      val promos = s.range(PromoCount)
        .select(col("id").as("promo_id"),
          (lit(8035L) + col("id") * PromoPeriod).as("p_start"))
        .withColumn("p_end", col("p_start") + PromoLen)
      RangeJoin.overlapBucketed(ords, "o_start", "o_end",
        promos, "p_start", "p_end", OverlapBucket)
        .select(col("o_orderkey"), col("promo_id"),
          (least(col("o_end"), col("p_end")) -
            greatest(col("o_start"), col("p_start")) + 1).as("overlap_days"))
    }),

    // Winsorized quantities: clamp each lineitem's quantity into its
    // return-flag group's exact [p05, p95] envelope.
    "winsorize_quantity" -> ((s, dir) =>
      Robust.winsorize(
        table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_returnflag"), col("l_quantity")),
        "l_returnflag", "l_quantity", WinsorLo, WinsorHi)),

    // Composed perplexity curation: language-ID each doc, score it
    // against the corpus bigram LM, keep the best half PER LANGUAGE via
    // the broadcast quantile threshold (ties at the threshold keep).
    "curate_lm" -> ((s, dir) =>
      Robust.keepBelowQuantile(lmScoredJoined(s, dir), "langid", "nll",
          CurateFrac)
        .select(col("doc_id"), col("langid"), col("nll"))),

    // Cross-family composition: the curate_lm survivors flow straight
    // into GPT-style sequence packing — language-ID → LM perplexity floor
    // → concat-then-chunk layout, one exact oracle end to end.
    "pipeline_lm_pack" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val kept = Robust.keepBelowQuantile(lmScoredJoined(s, dir),
          "langid", "nll", CurateFrac)
        .select(col("doc_id"))
      graft.ops.Shaping.packSequences(docs.join(kept, Seq("doc_id")),
        "doc_id", "text", PipeSeqLen, PipeShards)
    }),

    // Pre-flight join profile of lineitem ⋈ orders on the order key:
    // exact inner-join output size, per-side key stats, hottest key.
    "profile_join_keys" -> ((s, dir) =>
      Profile.joinProfile(
        table(s, dir, "lineitem").select(col("l_orderkey").as("jk")),
        table(s, dir, "orders").select(col("o_orderkey").as("jk")),
        "jk")),

    // Johnson–Lindenstrauss ±1 projection of the 64-dim embeddings down
    // to 16 dims (exact 0.25 scale), long layout.
    "embed_project" -> ((s, dir) =>
      Ann.randomProject(table(s, dir, "embeddings"),
        "vec_id", "embedding", ProjInDim, ProjOutDim)),

    // Snapshot reconciliation: old = ids not divisible by 3; current =
    // every doc, with ids divisible by 7 re-crawled with edited text.
    "snapshot_diff" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val old = docs.filter(col("doc_id") % 3 =!= 0)
      val cur = docs.select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      Snapshot.diff(old, cur, "doc_id", "text")
    }),

    // SCD-2 compaction: each customer's order stream becomes status
    // validity intervals — version, valid_from/valid_to, is_current.
    "scd2_order_history" -> ((s, dir) =>
      Snapshot.scd2(
        table(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
          col("o_orderstatus"), col("o_orderdate")),
        "o_custkey", "o_orderdate", "o_orderkey")),

    // Point-in-time read of the SCD-2 table: each customer's state as of
    // the snapshot instant (≤ 1 row per key survives the interval filter).
    "scd2_snapshot_at" -> ((s, dir) =>
      Snapshot.scd2(
        table(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
          col("o_orderstatus"), col("o_orderdate")),
        "o_custkey", "o_orderdate", "o_orderkey")
        .filter(col("valid_from") <= to_timestamp(lit(PitInstant)) &&
          (col("valid_to").isNull ||
            to_timestamp(lit(PitInstant)) < col("valid_to")))),

    // Lakehouse MERGE as a computation: latest changelog op per key wins
    // over the base snapshot (update / delete / insert fabrication).
    "cdc_apply" -> (cdcApplyGate _),

    // Schema-evolution merge: an old snapshot (no lang/source columns)
    // unions with the current wider one by NAME, missing columns null-
    // filled — the crawl-generations concat every corpus rebuild does.
    "schema_evolve_union" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"))
      val cur = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      old.unionByName(cur, allowMissingColumns = true)
    }))

  /** Snapshot instant for the point-in-time SCD-2 gate (mid date-range). */
  private val PitInstant = "1998-06-01"

  /** CDC apply: fabricated changelog — updates on doc_id%7 (seq 1),
    * deletes on doc_id%13 (seq 2, beats the update on %91 keys), inserts
    * at doc_id+100000 for doc_id%29 (seq 3). MERGE semantics: latest op
    * per key wins. */
  private def cdcApplyGate(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
    val u = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), lit("U").as("op"),
        concat(col("text"), lit(" v2")).as("text"), lit(1L).as("seq"))
    val d = docs.filter(col("doc_id") % 13 === 0)
      .select(col("doc_id"), lit("D").as("op"),
        lit(null).cast("string").as("text"), lit(2L).as("seq"))
    val i = docs.filter(col("doc_id") % 29 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), lit("I").as("op"),
        concat(lit("new doc "), col("doc_id").cast("string")).as("text"),
        lit(3L).as("seq"))
    Snapshot.cdcApply(docs, u.unionAll(d).unionAll(i),
      "doc_id", "seq", "op", "text")
  }

  private val uniformSql =
    s"((${OracleSql.knuth32("doc_id")}) + 0.5) / 4294967296.0"

  private val toksSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"

  private val normTextSql =
    "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  /** Shared bigram-LM CTE chain (tokens → guarded bigram stream → model →
    * per-doc order-pinned log-prob fold `lmg(doc_id, s, n)`); DuckDB 1.0
    * can't correlate `range(len(toks))`, hence the constant range +
    * loud-failure cap guard (the established dedup-oracle device). */
  private val lmCtes =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |guard AS (SELECT CASE WHEN max(len(toks)) > 4096
       |    THEN error('bigram range(1,4096) cap exceeded') ELSE 1 END AS g
       |  FROM t),
       |bg AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
       |    toks[CAST(i AS INT)] AS w1, toks[CAST(i + 1 AS INT)] AS w2
       |  FROM t, range(1, 4096) r(i)
       |  WHERE i + 1 <= len(toks) AND (SELECT g FROM guard) = 1),
       |m2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
       |m1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
       |v AS (SELECT CAST(count(DISTINCT u) AS DOUBLE) AS vsz
       |  FROM (SELECT unnest(toks) AS u FROM t)),
       |sc AS (SELECT bg.doc_id, bg.pos,
       |    ln((CAST(coalesce(c2, 0) AS DOUBLE) + $LmAddK) /
       |       (CAST(coalesce(c1, 0) AS DOUBLE) + $LmAddK * vsz)) AS lp
       |  FROM bg LEFT JOIN m2 USING (w1, w2) LEFT JOIN m1 USING (w1)
       |  CROSS JOIN v),
       |lmg AS (SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(lp ORDER BY pos)), (a, b) -> a + b) AS s,
       |    count(*) AS n
       |  FROM sc GROUP BY doc_id)""".stripMargin

  /** The BT MM recurrence UNROLLED into a CTE chain — one (t, d, r, n, s)
    * block per iteration, arithmetic mirrored operand-for-operand with
    * [[graft.ops.Preference.bradleyTerry]] (cast-then-add, 12dp decimal
    * terms, exact decimal sums, double divisions). */
  private val btOracle: String = {
    val iterBlocks = (1 to BtIters).map { k =>
      val p = s"s${k - 1}"
      s"""t$k AS (SELECT g.i, CAST(round(CAST(g.N AS DOUBLE) /
         |    (CAST(si.s AS DOUBLE) + CAST(sj.s AS DOUBLE)), 12)
         |    AS DECIMAL(28,12)) AS t
         |  FROM g JOIN $p si ON si.i = g.i JOIN $p sj ON sj.i = g.j),
         |d$k AS MATERIALIZED (SELECT i, sum(t) AS den FROM t$k GROUP BY 1),
         |r$k AS MATERIALIZED (SELECT d$k.i, CAST(round(CAST(coalesce(w.W, 0) AS DOUBLE) /
         |    CAST(den AS DOUBLE), 12) AS DECIMAL(28,12)) AS s1
         |  FROM d$k LEFT JOIN w ON w.i = d$k.i),
         |n$k AS MATERIALIZED (SELECT sum(s1) AS tot FROM r$k),
         |s$k AS MATERIALIZED (SELECT i, CAST(round(CAST(s1 AS DOUBLE) /
         |    CAST(tot AS DOUBLE), 12) AS DECIMAL(28,12)) AS s
         |  FROM r$k, n$k)""".stripMargin
    }
    s"""WITH uv AS MATERIALIZED (SELECT user_id, event_type,
       |    sum(CAST(value AS DECIMAL(18,6))) AS sv
       |  FROM events GROUP BY 1, 2),
       |wn AS MATERIALIZED (SELECT a.event_type AS i, b.event_type AS j,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM uv a JOIN uv b ON a.user_id = b.user_id
       |    AND a.event_type <> b.event_type AND a.sv > b.sv
       |  GROUP BY 1, 2),
       |g AS MATERIALIZED (SELECT i, j, CAST(sum(n) AS BIGINT) AS N FROM (
       |    SELECT i, j, n FROM wn UNION ALL SELECT j, i, n FROM wn)
       |  GROUP BY 1, 2),
       |w AS MATERIALIZED (SELECT i, CAST(sum(n) AS BIGINT) AS W FROM wn GROUP BY 1),
       |s0 AS MATERIALIZED (SELECT DISTINCT i, CAST(1 AS DECIMAL(28,12)) AS s FROM g),
       |${iterBlocks.mkString(",\n")},
       |ng AS MATERIALIZED (SELECT i, CAST(sum(N) AS BIGINT) AS n_games FROM g GROUP BY 1)
       |SELECT sf.i AS event_type, coalesce(w.W, 0) AS n_wins, ng.n_games,
       |  round(CAST(sf.s AS DOUBLE), 6) AS strength
       |FROM s$BtIters sf LEFT JOIN w ON w.i = sf.i
       |LEFT JOIN ng ON ng.i = sf.i""".stripMargin
  }

  def oracles: Map[String, String] = Map(

    "preference_bradley_terry" -> btOracle,

    "mix_water_fill" ->
      """WITH ps AS (SELECT source AS grp,
        |    CAST(sum(len(list_filter(string_split_regex(text, '\s+'), t -> t <> ''))) AS BIGINT) AS avail
        |  FROM documents GROUP BY 1),
        |base AS (SELECT grp, avail, CAST(length(grp) % 3 + 1 AS BIGINT) AS w FROM ps),
        |tot AS (SELECT CAST(sum(avail) AS BIGINT) AS tot_a, CAST(sum(w) AS BIGINT) AS tot_w FROM base),
        |run AS (SELECT grp, avail, w,
        |    CAST(floor(0.6 * CAST(tot_a AS DOUBLE)) AS BIGINT) AS B,
        |    CAST(avail AS DOUBLE) / CAST(w AS DOUBLE) AS c,
        |    CAST(sum(avail) OVER o AS BIGINT) AS prefA,
        |    CAST(sum(w) OVER o AS BIGINT) AS prefW,
        |    tot_w
        |  FROM base CROSS JOIN tot
        |  WINDOW o AS (ORDER BY CAST(avail AS DOUBLE) / CAST(w AS DOUBLE) ASC, grp ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |cand AS (SELECT *, CAST(B - (prefA - avail) AS DOUBLE) /
        |    CAST(tot_w - (prefW - w) AS DOUBLE) AS t FROM run),
        |lvl AS (SELECT t AS level FROM cand WHERE c >= t ORDER BY c ASC, grp ASC LIMIT 1)
        |SELECT grp, avail, w AS weight,
        |  least(avail, CAST(floor(level * CAST(w AS DOUBLE)) AS BIGINT)) AS alloc,
        |  round(CAST(least(avail, CAST(floor(level * CAST(w AS DOUBLE)) AS BIGINT)) AS DOUBLE) /
        |    CAST(avail AS DOUBLE), 6) AS sampling_rate
        |FROM cand CROSS JOIN lvl""".stripMargin,

    "preference_pairs" ->
      """WITH r AS (SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rb,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value ASC, event_id ASC) AS rw,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |b AS (SELECT user_id, event_id AS chosen_id, v AS cs FROM r WHERE rb = 1 AND n >= 2),
        |w AS (SELECT user_id, event_id AS rejected_id, v AS rs FROM r WHERE rw = 1)
        |SELECT b.user_id AS grp, chosen_id, rejected_id,
        |  round(cs, 6) AS chosen_score, round(rs, 6) AS rejected_score,
        |  round(cs - rs, 6) AS margin
        |FROM b JOIN w USING (user_id) WHERE chosen_id <> rejected_id""".stripMargin,

    "sample_balanced_classes" ->
      """WITH e AS (SELECT vec_id, label FROM embeddings),
        |mn AS (SELECT min(cnt) AS m FROM (
        |  SELECT CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY label)),
        |r AS (SELECT vec_id, label, row_number() OVER (PARTITION BY label
        |    ORDER BY CAST(concat('0x',
        |      substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) ASC,
        |    vec_id ASC) AS rk
        |  FROM e)
        |SELECT vec_id, label FROM r, mn WHERE rk <= m""".stripMargin,

    "sample_weighted" ->
      s"""WITH keyed AS (
         |  SELECT doc_id, text, lang, source, n_chars,
         |    ln($uniformSql) / CAST(n_chars AS DOUBLE) AS k
         |  FROM documents WHERE n_chars > 0),
         |r AS (SELECT *, row_number() OVER
         |    (PARTITION BY source ORDER BY k DESC, doc_id ASC) AS rk
         |  FROM keyed)
         |SELECT doc_id, text, lang, source, n_chars
         |FROM r WHERE rk <= $WeightedK""".stripMargin,

    "sample_temperature" ->
      s"""WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS n
         |  FROM documents GROUP BY source),
         |t AS (SELECT sum(pow(n, $MixAlpha)) AS z, sum(n) AS tot FROM c),
         |r AS (SELECT source, CAST(round(least(1.0,
         |    $MixBudget * tot * pow(n, $MixAlpha) / z / n) * 1000000.0)
         |    AS BIGINT) AS rate_micro
         |  FROM c, t)
         |SELECT d.doc_id, d.source
         |FROM documents d JOIN r USING (source)
         |WHERE (((${OracleSql.knuth32("d.doc_id")}) * 1000000) >> 32) < rate_micro""".stripMargin,

    "text_lm_score" ->
      s"""WITH $lmCtes
         |SELECT t.doc_id, CAST(coalesce(n, 0) AS BIGINT) AS n_bigrams,
         |  round(-s / CAST(n AS DOUBLE), 6) AS nll
         |FROM t LEFT JOIN lmg USING (doc_id)""".stripMargin,

    "text_lm_kneser_ney" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |guard AS (SELECT CASE WHEN max(len(toks)) > 4096
         |    THEN error('bigram range(1,4096) cap exceeded') ELSE 1 END AS g
         |  FROM t),
         |bg AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         |    toks[CAST(i AS INT)] AS w1, toks[CAST(i + 1 AS INT)] AS w2
         |  FROM t, range(1, 4096) r(i)
         |  WHERE i + 1 <= len(toks) AND (SELECT g FROM guard) = 1),
         |m2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2),
         |ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
         |    CAST(count(*) AS BIGINT) AS n1f FROM m2 GROUP BY 1),
         |cnt AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM m2 GROUP BY 1),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM m2),
         |v AS (SELECT CAST(count(DISTINCT u) AS DOUBLE) AS vsz
         |  FROM (SELECT unnest(toks) AS u FROM t)),
         |sc AS (SELECT bg.doc_id, bg.pos, ln(
         |    CASE WHEN CAST(coalesce(c1, 0) AS DOUBLE) > 0.0 THEN
         |      greatest(CAST(coalesce(c2, 0) AS DOUBLE) - 0.75, 0.0) /
         |        CAST(coalesce(c1, 0) AS DOUBLE) +
         |      0.75 * CAST(coalesce(n1f, 0) AS DOUBLE) /
         |        CAST(coalesce(c1, 0) AS DOUBLE) *
         |        ((CAST(coalesce(n1b, 0) AS DOUBLE) + 0.5) /
         |         (CAST(ntot AS DOUBLE) + 0.5 * (vsz + 1.0)))
         |    ELSE (CAST(coalesce(n1b, 0) AS DOUBLE) + 0.5) /
         |         (CAST(ntot AS DOUBLE) + 0.5 * (vsz + 1.0)) END) AS lp
         |  FROM bg LEFT JOIN m2 USING (w1, w2) LEFT JOIN ctx USING (w1)
         |  LEFT JOIN cnt USING (w2) CROSS JOIN tt CROSS JOIN v),
         |lmg AS (SELECT doc_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(lp ORDER BY pos)), (a, b) -> a + b) AS s,
         |    count(*) AS n
         |  FROM sc GROUP BY doc_id)
         |SELECT t.doc_id, CAST(coalesce(n, 0) AS BIGINT) AS n_bigrams,
         |  round(-s / CAST(n AS DOUBLE), 6) AS nll
         |FROM t LEFT JOIN lmg USING (doc_id)""".stripMargin,

    "dsir_select" ->
      s"""WITH tk AS (SELECT doc_id, (lang = 'en') AS tgt, unnest($toksSql) AS w
         |  FROM documents),
         |m AS (SELECT w, CAST(count(*) AS BIGINT) AS cr,
         |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct
         |  FROM tk GROUP BY 1),
         |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS tr,
         |    CAST(sum(ct) AS BIGINT) AS tt,
         |    CAST(count(*) AS BIGINT) AS v FROM m),
         |wt AS (SELECT w, CAST(round(
         |    ln((CAST(ct AS DOUBLE) + 1.0) / (CAST(tt AS DOUBLE) + CAST(v AS DOUBLE))) -
         |    ln((CAST(cr AS DOUBLE) + 1.0) / (CAST(tr AS DOUBLE) + CAST(v AS DOUBLE))),
         |    6) AS DECIMAL(18,6)) AS lw
         |  FROM m, tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(lw) AS DOUBLE) AS score
         |FROM tk JOIN wt USING (w)
         |GROUP BY doc_id
         |ORDER BY score DESC, doc_id ASC LIMIT $DsirTopK""".stripMargin,

    "curate_lm" -> {
      val (scoreSel, langCase) = OracleSql.langId(toksSql)
      s"""WITH $lmCtes,
         |sc2 AS (SELECT doc_id, round(-s / CAST(n AS DOUBLE), 6) AS nll
         |  FROM lmg),
         |lng AS (SELECT doc_id, $langCase AS langid
         |  FROM (SELECT doc_id, $scoreSel FROM documents) f),
         |j AS (SELECT l.doc_id, l.langid, sc2.nll
         |  FROM lng l JOIN sc2 USING (doc_id) WHERE nll IS NOT NULL),
         |q AS (SELECT langid, quantile_cont(nll, $CurateFrac) AS thr
         |  FROM j GROUP BY 1)
         |SELECT j.doc_id, j.langid, j.nll
         |FROM j JOIN q USING (langid) WHERE nll <= thr""".stripMargin
    },

    "pipeline_lm_pack" -> {
      val (scoreSel, langCase) = OracleSql.langId(toksSql)
      s"""WITH $lmCtes,
         |sc2 AS (SELECT doc_id, round(-s / CAST(n AS DOUBLE), 6) AS nll
         |  FROM lmg),
         |lng AS (SELECT doc_id, $langCase AS langid
         |  FROM (SELECT doc_id, $scoreSel FROM documents) f),
         |j AS (SELECT l.doc_id, l.langid, sc2.nll
         |  FROM lng l JOIN sc2 USING (doc_id) WHERE nll IS NOT NULL),
         |q AS (SELECT langid, quantile_cont(nll, $CurateFrac) AS thr
         |  FROM j GROUP BY 1),
         |kept AS (SELECT j.doc_id FROM j JOIN q USING (langid)
         |  WHERE nll <= thr),
         |tp AS (SELECT CAST(t.doc_id % $PipeShards AS BIGINT) AS shard,
         |    t.doc_id AS id, CAST(len(toks) AS BIGINT) AS n_tokens
         |  FROM t JOIN kept ON t.doc_id = kept.doc_id
         |  WHERE len(toks) > 0),
         |p AS (SELECT shard, id, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS start_off
         |  FROM tp)
         |SELECT shard, id, n_tokens, start_off,
         |  CAST((start_off - start_off % $PipeSeqLen) / $PipeSeqLen AS BIGINT)
         |    AS seq_first,
         |  CAST(((start_off + n_tokens - 1)
         |    - (start_off + n_tokens - 1) % $PipeSeqLen) / $PipeSeqLen AS BIGINT)
         |    AS seq_last
         |FROM p""".stripMargin
    },

    "profile_join_keys" ->
      """WITH l AS (SELECT l_orderkey AS k, count(*) AS cl FROM lineitem GROUP BY 1),
        |o AS (SELECT o_orderkey AS k, count(*) AS cr FROM orders GROUP BY 1),
        |j AS (SELECT coalesce(l.k, o.k) AS k, cl, cr,
        |    coalesce(cl, 0) * coalesce(cr, 0) AS outn
        |  FROM l FULL OUTER JOIN o ON l.k = o.k)
        |SELECT CAST(sum(coalesce(cl, 0)) AS BIGINT) AS rows_left,
        |  CAST(sum(coalesce(cr, 0)) AS BIGINT) AS rows_right,
        |  CAST(count(cl) AS BIGINT) AS keys_left,
        |  CAST(count(cr) AS BIGINT) AS keys_right,
        |  CAST(count(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL THEN 1 END)
        |    AS BIGINT) AS keys_matched,
        |  CAST(sum(outn) AS BIGINT) AS inner_rows,
        |  CAST(max(outn) AS BIGINT) AS max_key_rows,
        |  (SELECT max(k) FROM j WHERE outn = (SELECT max(outn) FROM j)) AS hot_key
        |FROM j""".stripMargin,

    "embed_project" -> {
      // the IDENTICAL ±1 matrix the Spark op regenerates, embedded as
      // literal left-associated ± chains (one canonical float order)
      val signs = graft.ops.Ann.projectionSigns(ProjOutDim, ProjInDim)
      val arms = signs.zipWithIndex.map { case (row, j) =>
        val chain = row.zipWithIndex.map { case (s, i) =>
          val op = if (i == 0) (if (s > 0) "" else "-") else (if (s > 0) " + " else " - ")
          s"${op}e[${i + 1}]"
        }.mkString
        s"SELECT vec_id, CAST($j AS INT) AS dim, round(($chain) * ${1.0 / math.sqrt(ProjOutDim.toDouble)}, 6) AS x FROM v"
      }
      s"""WITH v AS (SELECT vec_id,
         |  list_transform(embedding, y -> CAST(y AS DOUBLE)) AS e
         |  FROM embeddings)
         |${arms.mkString("\n UNION ALL\n ")}""".stripMargin
    },

    "snapshot_diff" ->
      s"""WITH o AS (SELECT doc_id, $normTextSql AS fp
         |  FROM documents WHERE doc_id % 3 <> 0),
         |c AS (SELECT doc_id, lower(trim(regexp_replace(
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END,
         |    '\\s+', ' ', 'g'))) AS fp
         |  FROM documents)
         |SELECT coalesce(o.doc_id, c.doc_id) AS doc_id,
         |  CASE WHEN o.doc_id IS NULL THEN 'added'
         |       WHEN c.doc_id IS NULL THEN 'removed'
         |       WHEN o.fp = c.fp THEN 'unchanged'
         |       ELSE 'changed' END AS status
         |FROM o FULL OUTER JOIN c ON o.doc_id = c.doc_id""".stripMargin,

    "schema_evolve_union" ->
      """SELECT doc_id, text, CAST(NULL AS STRING) AS lang,
        |  CAST(NULL AS STRING) AS source
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, text, lang, source
        |FROM documents WHERE doc_id % 2 = 1""".stripMargin,

    "cdc_apply" ->
      """WITH b AS (SELECT doc_id, text FROM documents),
        |u AS (SELECT doc_id, 'U' AS op, text || ' v2' AS text, 1 AS seq
        |  FROM documents WHERE doc_id % 7 = 0),
        |d AS (SELECT doc_id, 'D', CAST(NULL AS STRING), 2
        |  FROM documents WHERE doc_id % 13 = 0),
        |i AS (SELECT doc_id + 100000, 'I',
        |    'new doc ' || CAST(doc_id AS STRING), 3
        |  FROM documents WHERE doc_id % 29 = 0),
        |cl AS (SELECT * FROM u UNION ALL SELECT * FROM d
        |  UNION ALL SELECT * FROM i),
        |latest AS (SELECT doc_id, op, text FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY seq DESC) AS rn FROM cl) WHERE rn = 1)
        |SELECT coalesce(b.doc_id, l.doc_id) AS doc_id,
        |  CASE WHEN l.op IS NULL THEN b.text ELSE l.text END AS text
        |FROM b FULL OUTER JOIN latest l ON b.doc_id = l.doc_id
        |WHERE l.op IS NULL OR l.op <> 'D'""".stripMargin,

    "scd2_snapshot_at" ->
      s"""WITH h AS (SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
         |    CAST(row_number() OVER w AS BIGINT) AS version,
         |    o_orderdate AS valid_from,
         |    lead(o_orderdate) OVER w AS valid_to,
         |    lead(o_orderdate) OVER w IS NULL AS is_current
         |  FROM orders
         |  WINDOW w AS (PARTITION BY o_custkey
         |    ORDER BY o_orderdate, o_orderkey))
         |SELECT * FROM h
         |WHERE valid_from <= TIMESTAMP '$PitInstant'
         |  AND (valid_to IS NULL OR TIMESTAMP '$PitInstant' < valid_to)""".stripMargin,

    "scd2_order_history" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w AS valid_to,
        |  lead(o_orderdate) OVER w IS NULL AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "overlap_join_promos" ->
      s"""WITH o AS (SELECT o_orderkey,
         |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS o_start,
         |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
         |      + o_orderkey % 30 AS o_end
         |  FROM orders),
         |p AS (SELECT i AS promo_id, 8035 + i * $PromoPeriod AS p_start,
         |    8035 + i * $PromoPeriod + $PromoLen AS p_end
         |  FROM range($PromoCount) r(i))
         |SELECT o_orderkey, promo_id,
         |  least(o_end, p_end) - greatest(o_start, p_start) + 1 AS overlap_days
         |FROM o JOIN p ON o_start <= p_end AND p_start <= o_end""".stripMargin,

    "winsorize_quantity" ->
      s"""WITH b AS (SELECT l_returnflag,
         |    quantile_cont(l_quantity, $WinsorLo) AS lo,
         |    quantile_cont(l_quantity, $WinsorHi) AS hi
         |  FROM lineitem GROUP BY 1)
         |SELECT l_orderkey, l_linenumber, l.l_returnflag, l_quantity,
         |  least(greatest(CAST(l_quantity AS DOUBLE), lo), hi) AS l_quantity_w
         |FROM lineitem l JOIN b USING (l_returnflag)""".stripMargin)
}
