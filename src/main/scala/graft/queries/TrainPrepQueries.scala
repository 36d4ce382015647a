package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.table
import graft.functions.CountMinAgg
import graft.ops.{Boilerplate, Dedup, Profile, Shaping, Sketch, TextOps, Vocab}

/** Training-data preparation gates, round 6: C4-style boilerplate removal,
  * bloom-prefiltered delta dedup, tokenizer vocabulary statistics (n-gram
  * and first-merge BPE pair counts), length-bucketed curriculum batching,
  * export shard manifests, and heavy-hitter key profiling.
  */
object TrainPrepQueries {

  def family: QueryFamily = QueryFamily("trainprep", queries, oracles)

  private val SegWidth = 8
  private val SegMaxDocFreq = 1
  private val BigramK = 50
  private val BpeK = 40
  private val BucketTokens = 32
  private val BatchSize = 16
  private val CurriculumShards = 4
  private val ManifestShards = 8
  private val HeavyK = 25

  private val CmDepth = 5
  private val CmWidth = 2048
  private val CmGateWidth = 256
  private val CmGateTopK = 10
  private val BpeMerges = 6
  private val CoocWindow = 3
  private val CoverageK = 20
  private val ZipfK = 200
  private val NegTableK = 150

  /** Un-normalized suffix planted on every doc: decomposed `é` (e +
    * U+0301), a BEL control, decomposed `ï` (i + U+0308). NFC must compose
    * both pairs and the control strip must drop the BEL — written with the
    * IDENTICAL raw codepoints in the Spark literal and the oracle SQL. */
  private val RawSuffix = " café naïve"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C4-style boilerplate removal: 8-token segments, drop any appearing
    // in 2+ distinct documents, reassemble survivors in order.
    "clean_boilerplate" -> ((s, dir) =>
      Boilerplate.removeBoilerplate(table(s, dir, "documents"),
        "doc_id", "text", SegWidth, SegMaxDocFreq)),

    // Bloom-prefiltered exact membership of a delta against a corpus —
    // same delta/corpus fabrication as dedup_incremental (doc_id % 5 is
    // the new batch; planted twins of every 15th doc guarantee hits). The
    // bloom prunes the verify join; output provably equals the exact
    // semi-join answer (no false negatives + exact verify).
    "dedup_bloom" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val newB = docs.filter(col("doc_id") % 5 === 0)
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        .unionAll(docs.filter(col("doc_id") % 15 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
      // Sized for the LARGEST gate corpus (sf0.1: ~4.3k distinct corpus
      // fingerprints) with headroom — an undersized filter degrades to
      // everything-passes and the prefilter measures nothing.
      Dedup.bloomMemberFlags(newB, corpus, "doc_id", "text",
        expectedItems = 10000L, fpp = 0.03)
    }),

    // Corpus bigram frequency table, top 50 by (count desc, gram asc).
    "vocab_top_bigrams" -> ((s, dir) =>
      Vocab.topNgrams(table(s, dir, "documents"), "text", n = 2, k = BigramK)),

    // First-iteration BPE statistics: adjacent char-pair counts weighted
    // by word frequency, top 40.
    "bpe_pair_counts" -> ((s, dir) =>
      Vocab.topBpePairs(table(s, dir, "documents"), "text", k = BpeK)),

    // Skip-gram co-occurrence counts within a 3-token lookahead — pair
    // generation stays inside the token array (no positional self-join).
    "vocab_cooc_pairs" -> ((s, dir) =>
      Vocab.coocCounts(table(s, dir, "documents"), "text", window = CoocWindow)),

    // Pointwise mutual information over the co-occurrence pairs — the
    // collocation-mining score ("new york" ≫ "of the"): PMI =
    // ln(n·T / (c1·c2)) from the pair table's own marginals, n ≥ 5
    // support floor. Integer counts everywhere; ln only at the closure,
    // operand order mirrored in the oracle. Two marginal aggregates +
    // two keyed joins over the (vocab²-bounded) pair table; the 1-row
    // total broadcasts.
    "vocab_pmi" -> ((s, dir) => {
      // Persisted: the pair table feeds FOUR subtrees of this one plan
      // (filtered pairs, total, both marginals) and Spark does not dedupe
      // common subplans — unpersisted, the positional-gram explode over
      // the whole corpus would run 4×. Same rationale as the dedup
      // family's shared pair-table memo.
      val pairs = Vocab.coocCounts(table(s, dir, "documents"), "text",
        window = CoocWindow)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t = pairs.agg(sum(col("n")).as("T"))
      val m1 = pairs.groupBy(col("w1")).agg(sum(col("n")).as("c1"))
      val m2 = pairs.groupBy(col("w2")).agg(sum(col("n")).as("c2"))
      pairs.filter(col("n") >= 5)
        .join(m1, "w1").join(m2, "w2")
        .crossJoin(broadcast(t))
        .select(col("w1"), col("w2"), col("n"),
          round(log((col("n").cast("double") * col("T").cast("double")) /
            (col("c1").cast("double") * col("c2").cast("double"))), 6)
            .as("pmi"))
    }),

    // Vocabulary coverage: token-stream share of the top-20 words and the
    // OOV rate a tokenizer with that vocab would pay.
    "vocab_coverage" -> ((s, dir) =>
      Vocab.coverage(table(s, dir, "documents"), "text", k = CoverageK)),

    // T5-style span corruption (deterministic 3-token span every 21 →
    // ~14% mask rate): numbered sentinels in the input, sentinel-prefixed
    // spans + terminal sentinel in the target — the pretraining-objective
    // example builder, pure narrow per-doc array expressions.
    "pretrain_span_corruption" -> ((s, dir) =>
      Shaping.spanCorruption(table(s, dir, "documents"), "doc_id", "text")),

    // Fill-in-the-middle builder (Bavarian et al. 2022): ~90% of docs to
    // the PSM sentinel layout, 10% kept autoregressive, split points from
    // the high bits of the engine-neutral Knuth hash — deterministic,
    // zero-shuffle per-row rearrangement.
    "pretrain_fim" -> ((s, dir) =>
      Shaping.fillInMiddle(table(s, dir, "documents"), "doc_id", "text")),

    // Zipf rank–frequency OLS over the top-200 vocabulary: the one-row
    // corpus-health signal (natural text ≈ slope −1).
    "vocab_zipf_slope" -> ((s, dir) =>
      Vocab.zipfSlope(table(s, dir, "documents"), "text", k = ZipfK)),

    // word2vec/SGNS negative-sampling distribution table: top-150 tokens,
    // mass ∝ count^0.75 in integer micro-units.
    "vocab_negative_table" -> ((s, dir) =>
      Vocab.negativeSamplingTable(table(s, dir, "documents"), "text",
        k = NegTableK)),

    // Length-bucketed curriculum batching (32-token buckets, batch 16,
    // 4 trainer shards).
    "curriculum_batches" -> ((s, dir) =>
      Shaping.curriculumBatches(table(s, dir, "documents"), "doc_id", "text",
        BucketTokens, BatchSize, CurriculumShards)),

    // Export shard manifest: per-shard rows/tokens/id-range/checksum.
    "export_manifest" -> ((s, dir) =>
      Shaping.exportManifest(table(s, dir, "documents"), "doc_id", "text",
        ManifestShards)),

    // Unicode hygiene: NFC composition + control strip on docs with a
    // planted decomposed/control suffix. Exercises the custom NfcNormalize
    // expression against DuckDB's independent nfc_normalize.
    "text_unicode_nfc" -> ((s, dir) => {
      val fab = table(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"), lit(RawSuffix)).as("text"))
      fab.select(col("doc_id"),
        TextOps.normalizeUnicode(col("text")).as("text_nfc"),
        length(col("text")).cast("long").as("n_raw"))
        .withColumn("n_nfc", length(col("text_nfc")).cast("long"))
    }),

    // Skew diagnostic: top-25 part keys in lineitem with corpus share.
    "profile_heavy_keys" -> ((s, dir) =>
      Profile.heavyHitters(table(s, dir, "lineitem"), "l_partkey", HeavyK)),

    // Count-Min sketch validation: exact top-25 counts side by side with
    // the sketch estimate. ORACLE-CHECKED: the murmur slot hash IS
    // SQL-expressible — the oracle re-implements Murmur3_x86_32 over the
    // key bytes as a masked-arithmetic list_reduce fold (cmMurmurMix) and
    // re-derives every cell sum and min-over-rows estimate bit-exact.
    // TrainPrepSpec additionally asserts the CM guarantees (est ≥ exact,
    // bounded overcount, merge invariance).
    "profile_cm_topk" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val sk = li.agg(CountMinAgg.cmSketch(
        col("l_partkey").cast("string"), CmDepth, CmWidth).as("sk"))
      Profile.heavyHitters(li, "l_partkey", HeavyK)
        .crossJoin(broadcast(sk))
        .select(col("key"), col("cnt"),
          CountMinAgg.cmEstimate(col("sk"), col("key"), CmDepth, CmWidth)
            .as("cm_est"))
    }),

    // The ORACLE-CHECKED Count-Min companion to profile_cm_topk: the
    // sketch rows use the fixed knuth-salt multiplicative hashes
    // (Sketch.CmSalts), so cell sums AND the min-over-rows estimates are
    // plain integer arithmetic DuckDB re-derives exactly. Top-10 exact
    // heavy keys side by side with their sketch estimate; overcount is
    // data (TrainPrepSpec asserts est ≥ exact — the CM guarantee).
    "cm_topk_report" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val sk = Sketch.cmSketch(li, "l_partkey", CmGateWidth)
      val top = Profile.heavyHitters(li, "l_partkey", CmGateTopK)
        .select(col("key"), col("cnt"))
      Sketch.cmEstimate(top, sk, CmGateWidth)
        .join(top, "key")
        .select(col("key"), col("cnt"), col("cm_est"),
          (col("cm_est") - col("cnt")).as("overcount"))
    }),

    // Iterative BPE: 6 rounds of count-pairs → argmax → greedy merge over
    // the persisted distinct-word table (each round is one aggregate + a
    // 1-row collect, the Lloyd-iteration shape).
    "bpe_merges" -> ((s, dir) => bpeMerges(s, dir)),

    // Tokenizer application: train the 6-merge BPE, then encode the
    // corpus with it — per doc, the piece count training would see.
    "bpe_encode" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val merges = bpeMerges(s, dir)
        .orderBy(col("step")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Vocab.bpeEncode(docs, "doc_id", "text", merges)
    }))

  /** The trained 6-merge table, memoized: bpe_merges and bpe_encode both
    * need it, and the training loop (6 corpus-word aggregates + argmax
    * collects) is the expensive half of the encode gate. */
  private def bpeMerges(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached("trainprep.bpeMerges", s, dir) {
      Vocab.bpeTrain(table(s, dir, "documents"), "text", BpeMerges)
    }

  // ---------------------------------------------------------------- oracles

  private val toksSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
  private val normTextSql =
    "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  /** Loud-failure guard for the boilerplate segment range: range(1, 4096)
    * covers 4095 segments of [[SegWidth]] tokens each. */
  private val segGuard: String =
    s"guard AS (SELECT CASE WHEN max(len($toksSql)) > ${4095 * SegWidth} THEN error('segment range(1,4096) cap exceeded') ELSE 1 END AS g FROM documents)"

  /** Bigram-start guard (starts run to len − 1, so len ≤ 4096 is safe —
    * keep the shared 4095 bound for consistency). */
  private val gramGuard: String =
    s"guard AS (SELECT CASE WHEN max(len($toksSql)) > 4095 THEN error('gram range(1,4096) cap exceeded') ELSE 1 END AS g FROM documents)"

  private def hashSql(idExpr: String): String = OracleSql.knuth32(idExpr)

  def oracles: Map[String, String] = Map(

    "clean_boilerplate" ->
      s"""WITH $segGuard,
         |tk AS (SELECT doc_id AS id, $toksSql AS toks FROM documents
         |       WHERE len($toksSql) > 0),
         |sg AS (SELECT id, i - 1 AS seg_idx,
         |    array_to_string(list_slice(toks, (CAST(i AS INT) - 1) * $SegWidth + 1,
         |      (CAST(i AS INT) - 1) * $SegWidth + $SegWidth), ' ') AS seg
         |  FROM tk, range(1, 4096) r(i)
         |  WHERE (i - 1) * $SegWidth + 1 <= len(toks) AND (SELECT g FROM guard) = 1),
         |bp AS (SELECT seg FROM sg GROUP BY seg
         |       HAVING count(DISTINCT id) > $SegMaxDocFreq)
         |SELECT sg.id, CAST(count(*) AS BIGINT) AS n_segments,
         |  CAST(count(CASE WHEN bp.seg IS NULL THEN 1 END) AS BIGINT) AS n_kept,
         |  coalesce(string_agg(CASE WHEN bp.seg IS NULL THEN sg.seg END, ' '
         |    ORDER BY sg.seg_idx), '') AS text_clean
         |FROM sg LEFT JOIN bp ON sg.seg = bp.seg
         |GROUP BY sg.id""".stripMargin,

    "dedup_bloom" ->
      s"""WITH newb AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 5 = 0),
         |corpus AS (SELECT text FROM documents WHERE doc_id % 5 <> 0
         |           UNION ALL SELECT text FROM documents WHERE doc_id % 15 = 0),
         |cfp AS (SELECT DISTINCT md5($normTextSql) AS fp FROM corpus),
         |nfp AS (SELECT id, md5($normTextSql) AS fp FROM newb)
         |SELECT n.id, (c.fp IS NOT NULL) AS is_dup
         |FROM nfp n LEFT JOIN cfp c ON n.fp = c.fp""".stripMargin,

    "vocab_top_bigrams" ->
      s"""WITH $gramGuard,
         |tk AS (SELECT $toksSql AS toks FROM documents),
         |g AS (SELECT concat_ws(' ', toks[CAST(i AS INT)], toks[CAST(i AS INT) + 1]) AS gram
         |  FROM tk, range(1, 4096) r(i)
         |  WHERE i + 1 <= len(toks) AND (SELECT g FROM guard) = 1)
         |SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY 1
         |ORDER BY cnt DESC, gram ASC LIMIT $BigramK""".stripMargin,

    "vocab_cooc_pairs" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |t AS (SELECT doc_id, unnest(toks) AS tok,
         |    generate_subscripts(toks, 1) AS i FROM tk),
         |p AS (SELECT a.tok AS w1, b.tok AS w2
         |  FROM t a JOIN t b ON a.doc_id = b.doc_id
         |    AND b.i > a.i AND b.i <= a.i + $CoocWindow)
         |SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
         |FROM p GROUP BY 1, 2""".stripMargin,

    "vocab_pmi" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |t AS (SELECT doc_id, unnest(toks) AS tok,
         |    generate_subscripts(toks, 1) AS i FROM tk),
         |p AS (SELECT a.tok AS w1, b.tok AS w2
         |  FROM t a JOIN t b ON a.doc_id = b.doc_id
         |    AND b.i > a.i AND b.i <= a.i + $CoocWindow),
         |pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
         |  FROM p GROUP BY 1, 2),
         |tt AS (SELECT CAST(sum(n) AS BIGINT) AS T FROM pc),
         |m1 AS (SELECT w1, CAST(sum(n) AS BIGINT) AS c1 FROM pc GROUP BY 1),
         |m2 AS (SELECT w2, CAST(sum(n) AS BIGINT) AS c2 FROM pc GROUP BY 1)
         |SELECT pc.w1, pc.w2, pc.n,
         |  round(ln((CAST(pc.n AS DOUBLE) * CAST(T AS DOUBLE)) /
         |    (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))), 6) AS pmi
         |FROM pc JOIN m1 ON m1.w1 = pc.w1 JOIN m2 ON m2.w2 = pc.w2
         |CROSS JOIN tt WHERE pc.n >= 5""".stripMargin,

    "pretrain_span_corruption" ->
      s"""WITH t AS (SELECT doc_id AS id, $toksSql AS toks FROM documents),
         |b AS (SELECT id, toks, range(0, len(toks)) AS seq FROM t),
         |c AS (SELECT id,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(seq, p -> p % 21 = 18)) AS BIGINT) AS n_spans,
         |    array_to_string(list_filter(list_transform(seq, p -> CASE
         |      WHEN p % 21 < 18 THEN toks[CAST(p + 1 AS INT)]
         |      WHEN p % 21 = 18 THEN concat('<extra_id_', CAST(p // 21 AS VARCHAR), '>')
         |      ELSE NULL END), x -> x IS NOT NULL), ' ') AS input_text,
         |    array_to_string(list_filter(list_transform(seq, p -> CASE
         |      WHEN p % 21 = 18 THEN concat('<extra_id_', CAST(p // 21 AS VARCHAR), '> ',
         |        toks[CAST(p + 1 AS INT)])
         |      WHEN p % 21 > 18 THEN toks[CAST(p + 1 AS INT)]
         |      ELSE NULL END), x -> x IS NOT NULL), ' ') AS core0
         |  FROM b),
         |cc AS (SELECT id, n_tokens, n_spans, coalesce(input_text, '') AS input_text,
         |    coalesce(core0, '') AS core FROM c)
         |SELECT id, n_tokens, n_spans, input_text,
         |  concat(core, CASE WHEN core = '' THEN '' ELSE ' ' END,
         |    '<extra_id_', CAST(n_spans AS VARCHAR), '>') AS target_text
         |FROM cc""".stripMargin,

    "pretrain_fim" -> {
      val h1 = OracleSql.knuth32("id")
      val h2 = OracleSql.knuth32("id + 1000003")
      s"""WITH t AS (SELECT doc_id AS id, $toksSql AS toks FROM documents),
         |b AS (SELECT id, toks, CAST(len(toks) AS BIGINT) AS n,
         |    CAST($h1 AS BIGINT) AS h1, CAST($h2 AS BIGINT) AS h2 FROM t),
         |c AS (SELECT id, toks, n, h2,
         |    (h1 * 10) // 4294967296 < 9 AS fim,
         |    (h1 * (n + 1)) // 4294967296 AS p1 FROM b),
         |d AS (SELECT *, (h2 * (n - p1 + 1)) // 4294967296 AS l FROM c)
         |SELECT id, n AS n_tokens,
         |  CASE WHEN fim THEN 'psm' ELSE 'ar' END AS mode,
         |  CAST(CASE WHEN fim THEN p1 ELSE -1 END AS BIGINT) AS split_at,
         |  CAST(CASE WHEN fim THEN l ELSE -1 END AS BIGINT) AS mid_len,
         |  CASE WHEN fim THEN array_to_string(
         |      ['<fim_prefix>'] || toks[1:CAST(p1 AS INT)] || ['<fim_suffix>'] ||
         |      toks[CAST(p1 + l + 1 AS INT):CAST(n AS INT)] || ['<fim_middle>'] ||
         |      toks[CAST(p1 + 1 AS INT):CAST(p1 + l AS INT)], ' ')
         |    ELSE array_to_string(toks, ' ') END AS text_fim
         |FROM d""".stripMargin
    },

    "vocab_zipf_slope" ->
      s"""WITH wc AS (SELECT w, CAST(count(*) AS BIGINT) AS wcnt
         |  FROM (SELECT unnest($toksSql) AS w FROM documents) GROUP BY 1),
         |top AS (SELECT *, row_number() OVER (ORDER BY wcnt DESC, w ASC) AS rank
         |  FROM wc ORDER BY wcnt DESC, w ASC LIMIT $ZipfK),
         |xy AS (SELECT
         |    CAST(round(ln(CAST(rank AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
         |    CAST(round(ln(CAST(wcnt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
         |  FROM top),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab,
         |    sum(x) AS sx, sum(y) AS sy,
         |    sum(x * x) AS sxx, sum(x * y) AS sxy FROM xy),
         |f AS (SELECT n_vocab, CAST(n_vocab AS DOUBLE) AS nd,
         |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         |    CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd FROM a)
         |SELECT n_vocab,
         |  CASE WHEN NOT (nd * sxxd - sxd * sxd > 0.0) THEN 0.0
         |    ELSE round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6)
         |  END AS slope,
         |  CASE WHEN NOT (nd * sxxd - sxd * sxd > 0.0) THEN 0.0
         |    ELSE round((syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
         |      * sxd) / nd, 6)
         |  END AS intercept
         |FROM f""".stripMargin,

    "vocab_negative_table" ->
      s"""WITH wc AS (SELECT w, CAST(count(*) AS BIGINT) AS wcnt
         |  FROM (SELECT unnest($toksSql) AS w FROM documents) GROUP BY 1),
         |top AS (SELECT *, row_number() OVER (ORDER BY wcnt DESC, w ASC) AS rank
         |  FROM wc ORDER BY wcnt DESC, w ASC LIMIT $NegTableK),
         |wt AS (SELECT rank, w, wcnt,
         |    CAST(round(pow(CAST(wcnt AS DOUBLE), 0.75), 6) AS DECIMAL(18,6)) AS w75
         |  FROM top),
         |z AS (SELECT sum(w75) AS z FROM wt)
         |SELECT CAST(rank AS INT) AS rank, w, wcnt,
         |  CAST(floor(CAST(w75 AS DOUBLE) / CAST(z AS DOUBLE) * 1000000.0)
         |    AS BIGINT) AS p_micro
         |FROM wt, z""".stripMargin,

    "vocab_coverage" ->
      s"""WITH wc AS (SELECT w, CAST(count(*) AS BIGINT) AS wcnt
         |  FROM (SELECT unnest($toksSql) AS w FROM documents) GROUP BY 1),
         |top AS (SELECT * FROM wc ORDER BY wcnt DESC, w ASC LIMIT $CoverageK)
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM top) AS vocab_size,
         |  (SELECT CAST(sum(wcnt) AS BIGINT) FROM top) AS covered,
         |  (SELECT CAST(sum(wcnt) AS BIGINT) FROM wc) AS total,
         |  round(1.0 - CAST((SELECT sum(wcnt) FROM top) AS DOUBLE) /
         |    CAST((SELECT sum(wcnt) FROM wc) AS DOUBLE), 6) AS oov_rate""".stripMargin,

    "bpe_pair_counts" ->
      s"""WITH tk AS (SELECT $toksSql AS toks FROM documents),
         |wf AS (SELECT w, count(*) AS wcnt
         |       FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY 1),
         |wg AS (SELECT CASE WHEN max(len(w)) > 63 THEN error('word range(1,64) cap exceeded') ELSE 1 END AS g FROM wf),
         |p AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, wcnt
         |  FROM wf, range(1, 64) r(i)
         |  WHERE len(w) >= 2 AND i + 1 <= len(w) AND (SELECT g FROM wg) = 1)
         |SELECT pair, CAST(sum(wcnt) AS BIGINT) AS cnt FROM p GROUP BY 1
         |ORDER BY cnt DESC, pair ASC LIMIT $BpeK""".stripMargin,

    "curriculum_batches" -> {
      val bucket = s"(n_tokens - n_tokens % $BucketTokens) / $BucketTokens"
      s"""WITH t AS (SELECT doc_id AS id,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
         |h AS (SELECT id, n_tokens, ${hashSql("id")} AS h FROM t),
         |r AS (SELECT id, n_tokens, h,
         |    row_number() OVER (PARTITION BY $bucket, (h * $CurriculumShards) >> 32
         |      ORDER BY h, id) AS rn
         |  FROM h)
         |SELECT id, n_tokens, CAST($bucket AS BIGINT) AS bucket,
         |  CAST((h * $CurriculumShards) >> 32 AS BIGINT) AS shard,
         |  CAST((rn - 1 - (rn - 1) % $BatchSize) / $BatchSize AS BIGINT) AS batch,
         |  CAST((rn - 1) % $BatchSize + 1 AS BIGINT) AS pos_in_batch
         |FROM r""".stripMargin
    },

    "export_manifest" ->
      s"""WITH t AS (SELECT doc_id AS id,
         |    CAST(len($toksSql) AS BIGINT) AS n_toks FROM documents),
         |h AS (SELECT id, n_toks, ${hashSql("id")} AS h FROM t)
         |SELECT CAST((h * $ManifestShards) >> 32 AS BIGINT) AS shard,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(min(id) AS BIGINT) AS min_id,
         |  CAST(max(id) AS BIGINT) AS max_id,
         |  CAST(sum(h) AS BIGINT) AS id_checksum
         |FROM h GROUP BY 1""".stripMargin,

    "text_unicode_nfc" -> {
      val ctrl = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
      s"""WITH f AS (SELECT doc_id, text || ' café naïve' AS text FROM documents)
         |SELECT doc_id,
         |  regexp_replace(nfc_normalize(text), '$ctrl', '', 'g') AS text_nfc,
         |  CAST(len(text) AS BIGINT) AS n_raw,
         |  CAST(len(regexp_replace(nfc_normalize(text), '$ctrl', '', 'g')) AS BIGINT) AS n_nfc
         |FROM f""".stripMargin
    },

    // Murmur3_x86_32 re-derived in SQL (graft.queries.SqlMurmur): the
    // oracle hashes every distinct key with the same 4-byte-LE-block +
    // per-byte-tail + fmix algorithm CountMinAgg/cmEstimate use (seed =
    // row index), rebuilds the depth×width cell sums, and reads the
    // min-over-rows estimate — bit-exact against the engine's sketch.
    "profile_cm_topk" ->
      s"""WITH kc AS MATERIALIZED (SELECT CAST(l_partkey AS VARCHAR) AS k,
         |    CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY 1),
         |seeds(d) AS (SELECT * FROM range(0, $CmDepth)),
         |items AS (SELECT k, ${SqlMurmur.itemsOfK} AS its FROM kc),
         |raw AS (SELECT k, d,
         |    list_reduce(list_prepend(CAST(d AS BIGINT), its),
         |      (h, k) -> ${SqlMurmur.mixStep}) AS h0,
         |    CAST(length(k) AS BIGINT) AS n
         |  FROM items, seeds),
         |${SqlMurmur.fmixCtes("k, d")},
         |slots AS MATERIALIZED (SELECT k, d,
         |    ((hv % $CmWidth) + $CmWidth) % $CmWidth AS slot
         |  FROM f3),
         |cells AS (SELECT d, slot, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM slots JOIN kc USING (k) GROUP BY 1, 2),
         |hh AS (SELECT k AS key, cnt FROM kc
         |  ORDER BY cnt DESC, key ASC LIMIT $HeavyK),
         |est AS (SELECT slots.k AS key, CAST(min(c) AS BIGINT) AS cm_est
         |  FROM slots JOIN cells USING (d, slot)
         |  WHERE slots.k IN (SELECT key FROM hh) GROUP BY 1)
         |SELECT hh.key, hh.cnt, est.cm_est
         |FROM hh JOIN est USING (key)""".stripMargin,

    "cm_topk_report" -> {
      val saltRows = Sketch.CmSalts.zipWithIndex
        .map { case (a, r) => s"($r, $a)" }.mkString(", ")
      s"""WITH kc AS (SELECT CAST(l_partkey AS BIGINT) AS k,
         |    CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY 1),
         |salt(r, a) AS (SELECT * FROM (VALUES $saltRows) v(r, a)),
         |sk AS (SELECT r,
         |    ((k % 1000000007) * a) % 4294967296 % $CmGateWidth AS bucket,
         |    CAST(sum(cnt) AS BIGINT) AS c
         |  FROM kc, salt GROUP BY 1, 2),
         |hh AS (SELECT CAST(k AS STRING) AS key, cnt FROM kc
         |  ORDER BY cnt DESC, key ASC LIMIT $CmGateTopK),
         |lu AS (SELECT key, r,
         |    ((CAST(key AS BIGINT) % 1000000007) * a) % 4294967296
         |      % $CmGateWidth AS bucket
         |  FROM hh, salt),
         |est AS (SELECT key, min(c) AS cm_est
         |  FROM lu JOIN sk USING (r, bucket) GROUP BY 1)
         |SELECT hh.key, hh.cnt, est.cm_est, est.cm_est - hh.cnt AS overcount
         |FROM hh JOIN est USING (key)""".stripMargin
    },

    "profile_heavy_keys" ->
      s"""WITH c AS (SELECT CAST(l_partkey AS STRING) AS key, count(*) AS cnt
         |           FROM lineitem GROUP BY 1)
         |SELECT key, CAST(cnt AS BIGINT) AS cnt,
         |  CAST(cnt AS DOUBLE) / CAST((SELECT sum(cnt) FROM c) AS DOUBLE) AS share
         |FROM c ORDER BY cnt DESC, key ASC LIMIT $HeavyK""".stripMargin,

    "bpe_merges" -> bpeOracle,
    "bpe_encode" -> bpeEncodeOracle)

  /** Unrolled [[graft.ops.Vocab.bpeTrain]] mirror: one (pairs → argmax →
    * replace) CTE block per round on the padded symbol-string encoding
    * (symbols separated by DOUBLE spaces, so plain `replace` of
    * `" l  r "` is the greedy left-to-right merge in both engines).
    * range(1, 64) covers pair starts for words of ≤ 63 symbols; the guard
    * errors loudly beyond that. */
  /** Shared unrolled BPE merge chain (wc → guard → w0 → p/m/w per round).
    * `carryW` keeps the source word in every wN so a consumer can map
    * encodings back onto the token stream (the encode oracle); the
    * training oracle drops it. */
  private def bpeChain(carryW: Boolean): String = {
    val wSel = if (carryW) "w, " else ""
    val rounds = (1 to BpeMerges).map { r =>
      val prev = s"w${r - 1}"
      // MATERIALIZED: DuckDB inlines plain CTEs, and this chain references
      // each round's tables repeatedly — inlining would blow up ~3^rounds
      s"""p$r AS MATERIALIZED (SELECT s[CAST(i AS INT)] AS l, s[CAST(i + 1 AS INT)] AS r,
         |    CAST(sum(wcnt) AS BIGINT) AS freq
         |  FROM (SELECT string_split(trim(sym), '  ') AS s, wcnt FROM $prev),
         |    range(1, 64) t$r(i)
         |  WHERE i + 1 <= len(s) AND (SELECT g FROM guard) = 1
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (SELECT l, r, freq FROM p$r ORDER BY freq DESC, l, r LIMIT 1),
         |w$r AS MATERIALIZED (SELECT ${wSel}replace(sym,
         |    ' ' || (SELECT l FROM m$r) || '  ' || (SELECT r FROM m$r) || ' ',
         |    ' ' || (SELECT l FROM m$r) || (SELECT r FROM m$r) || ' ') AS sym,
         |    wcnt FROM $prev)""".stripMargin
    }
    s"""wc AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS wcnt
       |  FROM (SELECT unnest($toksSql) AS w FROM documents) GROUP BY w),
       |guard AS MATERIALIZED (SELECT CASE WHEN max(len(w)) > 63
       |    THEN error('bpe symbol range(1,64) cap exceeded') ELSE 1 END AS g
       |  FROM wc),
       |w0 AS MATERIALIZED (SELECT $wSel' ' || array_to_string(string_split(w, ''), '  ') || ' '
       |    AS sym, wcnt FROM wc),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  private def bpeOracle: String = {
    val finalSel = (1 to BpeMerges).map { r =>
      s"SELECT CAST($r AS INT) AS step, l AS lhs, r AS rhs, freq FROM m$r"
    }.mkString("\n UNION ALL\n ")
    s"""WITH ${bpeChain(carryW = false)}
       |$finalSel""".stripMargin
  }

  /** Encode oracle: the same chain with the word carried through, piece
    * counts from the final symbol strings, summed over each document's
    * token stream. */
  private def bpeEncodeOracle: String =
    s"""WITH ${bpeChain(carryW = true)},
       |enc AS (SELECT w,
       |    CAST(len(string_split(trim(sym), '  ')) AS BIGINT) AS np
       |  FROM w$BpeMerges),
       |tk AS (SELECT doc_id, unnest($toksSql) AS w FROM documents)
       |SELECT doc_id, CAST(sum(np) AS BIGINT) AS n_pieces
       |FROM tk JOIN enc USING (w) GROUP BY doc_id""".stripMargin
}
