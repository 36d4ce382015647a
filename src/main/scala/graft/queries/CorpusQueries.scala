package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.table
import graft.ops.{Decontaminate, Ranking, Retrieval, TextOps, Vocab}

/** Corpus-hygiene gates: benchmark decontamination (n-gram overlap between
  * a train corpus and an eval set) and repetition-based quality metrics
  * (duplicate / top n-gram fractions — the published repetition filter
  * family for pretraining data).
  */
object CorpusQueries {

  def family: QueryFamily = QueryFamily("corpus", queries, oracles)

  /** Shingle size for the contamination check. The planted 8-token snippet
    * contains exactly 3 six-grams, all present in its eval source doc. */
  private val ContamN = 6
  private val SnippetTokens = 8

  /** BM25 gate query (fixture-vocab terms with distinct frequencies) and
    * cut sizes. */
  private val BmQuery = Seq("join", "vector", "merge")
  private val BmTopK = 25
  private val NdcgK = 10
  private val RrfK = 60
  private val RrfTopK = 20
  private val PhraseQuery = Seq("slow", "hash", "batch")

  /** Eval set = doc_id % 17 == 0; planted contamination appends the first 8
    * tokens of eval doc 17·(doc_id % 29) to every train doc with
    * doc_id % 23 == 0. Organic 6-gram collisions exist too (the fixture
    * reuses phrases) — the gate sees both. Fabrication is dialect-neutral
    * (%, *, slice/limit-8 token prefix) and mirrored verbatim in the
    * oracle CTE. */
  private def contaminatedTrain(docs: DataFrame): DataFrame = {
    val ev8 = docs.filter(col("doc_id") % 17 === 0)
      .select(col("doc_id").as("eid"),
        concat_ws(" ", slice(TextOps.tokens(col("text")), 1, SnippetTokens)).as("snip"))
    docs.filter(col("doc_id") % 17 =!= 0)
      .join(broadcast(ev8), col("eid") === lit(17L) * (col("doc_id") % 29), "left")
      // coalesce: on the shipped fixtures the join always matches (doc 0
      // exists and 17·(d%29) ≤ 476 < max id), but a missed match must
      // degrade to "no snippet", not null out the document — Spark concat
      // propagates NULL where DuckDB's skips it, so without the coalesce a
      // miss would silently desynchronize the two sides.
      .select(col("doc_id"),
        when(col("doc_id") % 23 === 0,
          concat(col("text"), lit(" "), coalesce(col("snip"), lit(""))))
          .otherwise(col("text")).as("text"))
  }

  /** total/n_distinct/max_count of word n-grams as three named columns. */
  private def rep(nm: String, n: Int): Column =
    TextOps.repetitionStats(col("text"), n).as(nm)

  private def frac(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))

  /** 1 − n_distinct/total, 0.0 when there are no grams at all. */
  private def dupFrac(nd: Column, total: Column): Column =
    when(total > 0, lit(1.0) - nd.cast("double") / total.cast("double"))
      .otherwise(lit(0.0))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "decontaminate_report" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val evalSet = docs.filter(col("doc_id") % 17 === 0)
        .select(col("doc_id"), col("text"))
      Decontaminate.report(contaminatedTrain(docs), evalSet,
        "doc_id", "text", ContamN)
    }),

    // Per-doc repetition metrics + the combined keep flag. All ratios are
    // exact IEEE divisions of small ints — bit-identical across engines —
    // so the threshold comparisons in `keep` are float-safe.
    "text_repetition" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("s1", rep("s1", 1))
        .withColumn("s2", rep("s2", 2))
        .withColumn("s3", rep("s3", 3))
        .select(col("doc_id"),
          col("s1.total").as("n_tokens"),
          frac(col("s1.n_distinct"), col("s1.total")).as("unique_token_ratio"),
          dupFrac(col("s2.n_distinct"), col("s2.total")).as("dup_bigram_frac"),
          frac(col("s2.max_count"), col("s2.total")).as("top_bigram_frac"),
          dupFrac(col("s3.n_distinct"), col("s3.total")).as("dup_trigram_frac"))
        .withColumn("keep",
          col("unique_token_ratio") >= 0.4 &&
            col("dup_bigram_frac") <= 0.03 &&
            col("top_bigram_frac") <= 0.04)),

    // Inverted index over the document corpus: per term, document
    // frequency + the sorted posting list. Per-doc dedup happens BEFORE
    // the explode, so the exchange carries distinct (term, doc) pairs.
    // The posting list ships '|'-joined: the gate comparator hashes
    // scalar cells, so the library's array column serializes at the gate
    // boundary (the in-engine API still returns the typed array).
    "index_postings" -> ((s, dir) =>
      Vocab.invertedIndex(
        table(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text")
        .select(col("term"), col("df"),
          array_join(transform(col("postings"), _.cast("string")), "|")
            .as("postings"))),

    // Cross-source vocabulary overlap: exact token-set Jaccard for every
    // source pair — the corpus-comparison signal behind mixing decisions.
    // The token stream collapses to distinct (source, token) FIRST, so
    // the self-join runs on vocab-sized sides keyed by token.
    "source_token_jaccard" -> ((s, dir) => {
      val st = table(s, dir, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("t"))
        .distinct()
      val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("nv"))
      val inter = st.select(col("source").as("s1"), col("t"))
        .join(st.select(col("source").as("s2"), col("t")), "t")
        .filter(col("s1") < col("s2"))
        .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("n_inter"))
      inter
        .join(broadcast(sizes.select(col("source").as("s1"), col("nv").as("n1"))), "s1")
        .join(broadcast(sizes.select(col("source").as("s2"), col("nv").as("n2"))), "s2")
        .select(col("s1"), col("s2"), col("n_inter"), col("n1"), col("n2"),
          round(col("n_inter").cast("double") /
            (col("n1") + col("n2") - col("n_inter")).cast("double"), 6)
            .as("jaccard"))
    }),

    // Compression-ratio quality signal (Deflate level 1, one reusable
    // deflater per task): rows-only gate — no SQL oracle can mirror
    // deflate — CorpusSpec asserts the discriminative ordering
    // (repetitive < prose < noise) and exact raw byte lengths.
    "text_compression" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), TextOps.compressionStats(col("text")).as("c"))
        .select(col("doc_id"), col("c.raw_bytes").as("raw_bytes"),
          col("c.compressed_bytes").as("compressed_bytes"),
          round(col("c.ratio"), 6).as("ratio"))),

    // Heaps-law vocabulary growth curve: per-doc token/new-type counts plus
    // running corpus totals in doc_id order. The running sums go through
    // Ranking.prefixSum's two-pass distributed scan — never a single-task
    // global window (the oracle may window; it doesn't have to scale).
    "corpus_growth_curve" -> ((s, dir) =>
      Vocab.growthCurve(table(s, dir, "documents"), "doc_id", "text")),

    // Okapi BM25 top-25 for a fixed 3-term query — 6dp-rounded
    // contributions decimal-summed per doc (order-invariant).
    // Gopher-style rule-bundle quality report (Rae et al. 2021,
    // MassiveText §A.1): the published heuristic filter battery —
    // word count, mean word length, symbol-to-word ratio, bullet /
    // ellipsis / non-alphabetic line ratios, stopword presence — as
    // per-row flag expressions rolled into one aggregate. Output is the
    // per-rule violation census plus the surviving-document count, the
    // clean_summary shape applied to an LLM corpus. All ratios derive
    // from integer counts (char-count differences, membership probes of
    // the fixed 8-stopword list), so flags are engine-exact.
    "corpus_gopher_rules" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .withColumn("__toks", TextOps.tokens(col("text")))
        .withColumn("__lines", split(col("text"), "\n"))
        .withColumn("__wc", size(col("__toks")).cast("long"))
        .withColumn("__nl", size(col("__lines")).cast("long"))
        .withColumn("__chars", length(array_join(col("__toks"), "")).cast("long"))
        .withColumn("__hash",
          (length(col("text")) - length(expr("replace(text, '#', '')"))).cast("long"))
        .withColumn("__ell", expr(
          "CAST((length(text) - length(replace(text, '...', ''))) AS BIGINT) div 3"))
        .withColumn("__bullets", expr("CAST(size(filter(__lines, " +
          "l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•'))) AS BIGINT)"))
        .withColumn("__ellLines", expr("CAST(size(filter(__lines, " +
          "l -> right(rtrim(l), 3) = '...' OR right(rtrim(l), 1) = '…')) AS BIGINT)"))
        .withColumn("__alphaLines", expr("CAST(size(filter(__lines, " +
          "l -> l rlike '[A-Za-z]')) AS BIGINT)"))
        .withColumn("__stops", expr("CAST(size(filter(" +
          "array('the','be','to','of','and','that','have','with'), " +
          "w -> array_contains(__toks, w))) AS BIGINT)"))
      def dd(c: Column) = c.cast("double")
      val mwl = dd(col("__chars")) / dd(col("__wc"))
      val flags = d.select(
        (col("__wc") < 50L || col("__wc") > 100000L).as("f_wc"),
        when(col("__wc") > 0L, mwl < 3.0 || mwl > 10.0).otherwise(lit(true))
          .as("f_mwl"),
        when(col("__wc") > 0L,
          dd(col("__hash") + col("__ell")) / dd(col("__wc")) > 0.1)
          .otherwise(lit(false)).as("f_sym"),
        (dd(col("__bullets")) / dd(col("__nl")) > 0.9).as("f_bullet"),
        (dd(col("__ellLines")) / dd(col("__nl")) > 0.3).as("f_ellipsis"),
        (dd(col("__alphaLines")) / dd(col("__nl")) < 0.8).as("f_alpha"),
        (col("__stops") < 2L).as("f_stop"))
      def cnt(c: String) = sum(when(col(c), 1L).otherwise(0L))
      flags.agg(cnt("f_wc").as("v_wc"), cnt("f_mwl").as("v_mwl"),
          cnt("f_sym").as("v_sym"), cnt("f_bullet").as("v_bullet"),
          cnt("f_ellipsis").as("v_ellipsis"), cnt("f_alpha").as("v_alpha"),
          cnt("f_stop").as("v_stop"),
          sum(when(!col("f_wc") && !col("f_mwl") && !col("f_sym") &&
            !col("f_bullet") && !col("f_ellipsis") && !col("f_alpha") &&
            !col("f_stop"), 1L).otherwise(0L)).as("v_pass"))
        .selectExpr("stack(8, " +
          "'word_count', v_wc, 'mean_word_length', v_mwl, " +
          "'symbol_ratio', v_sym, 'bullet_lines', v_bullet, " +
          "'ellipsis_lines', v_ellipsis, 'alpha_lines', v_alpha, " +
          "'stopwords', v_stop, 'pass_all', v_pass) AS (rule, n)")
    }),

    "search_bm25" -> ((s, dir) =>
      Retrieval.bm25Scores(table(s, dir, "documents"), "doc_id", "text",
        BmQuery)
        .orderBy(col("score").desc, col("id").asc).limit(BmTopK)),

    // Graded-relevance ranking evaluation of the BM25 searcher: relevance
    // = query-term coverage (0..3), NDCG@10 with the log2(rank+1)
    // discount (expressed as ln/ln2 — bit-identical on both engines),
    // MRR and P@10 — one row. Contributions are 6dp-decimal-summed over
    // the BOUNDED top-k frame; the ideal ranking is a TakeOrdered over
    // the relevance table, never a global sort.
    "eval_ndcg_bm25" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val toks = TextOps.tokens(col("text"))
      val rel = docs.select(col("doc_id").as("id"),
        BmQuery.map(t => when(array_contains(toks, t), 1L).otherwise(0L))
          .reduce(_ + _).as("rel"))
      def d(c: Column) = c.cast("double")
      def contrib = round(
        (pow(lit(2.0), d(col("rel"))) - 1.0) /
          (log(d(col("rank")) + 1.0) / log(lit(2.0))), 6)
        .cast("decimal(18,6)")
      val wTop = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("id").asc)
      val ranked = Retrieval.bm25Scores(docs, "doc_id", "text", BmQuery)
        .orderBy(col("score").desc, col("id").asc).limit(NdcgK)
        .withColumn("rank", row_number().over(wTop))
        .join(rel, Seq("id"), "left").na.fill(0L, Seq("rel"))
      val dcgAgg = ranked.agg(sum(contrib).as("dcg"),
        min(when(col("rel") > 0, col("rank"))).as("first_rel"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_rel"))
      val wIdeal = org.apache.spark.sql.expressions.Window
        .orderBy(col("rel").desc, col("id").asc)
      val idcgAgg = rel.orderBy(col("rel").desc, col("id").asc).limit(NdcgK)
        .withColumn("rank", row_number().over(wIdeal))
        .agg(sum(contrib).as("idcg"))
      dcgAgg.crossJoin(broadcast(idcgAgg)).select(
        lit(NdcgK).as("k"),
        round(d(col("dcg")), 6).as("dcg"),
        round(d(col("idcg")), 6).as("idcg"),
        when(!(d(col("idcg")) > 0.0), lit(0.0))
          .otherwise(round(d(col("dcg")) / d(col("idcg")), 6)).as("ndcg"),
        coalesce(round(lit(1.0) / d(col("first_rel")), 6), lit(0.0)).as("mrr"),
        round(d(col("n_rel")) / NdcgK, 6).as("p_at_k"))
    }),

    // Hybrid fusion: BM25 ranking ⊕ document-length prior via
    // reciprocal-rank fusion (k=60), top 20.
    "search_rrf" -> ((s, dir) => {
      val bm = Retrieval.bm25Scores(table(s, dir, "documents"), "doc_id",
        "text", BmQuery)
      val r1 = Ranking.globalRank(bm, Seq(col("score").desc, col("id").asc))
        .select(col("id"), col("rank"))
      val r2 = Ranking.globalRank(
        table(s, dir, "documents").select(col("doc_id").as("id"),
          col("n_chars")),
        Seq(col("n_chars").desc, col("id").asc))
        .select(col("id"), col("rank"))
      Retrieval.rrfFuse(r1, r2, "id", "rank", RrfK)
        .orderBy(col("rrf").desc, col("id").asc).limit(RrfTopK)
    }),

    // Exact phrase search via positional inverted-index intersection:
    // each term's postings shift back by the term's phrase offset, a
    // 3-way (doc, start) equi-join intersects them. The fixture phrase
    // occurs organically (8 docs at sf0.01).
    "search_phrase" -> ((s, dir) =>
      Retrieval.phraseSearch(table(s, dir, "documents"), "doc_id", "text",
        PhraseQuery)
        .select(col("id").as("doc_id"), col("n_hits"), col("first_pos"))),

    // Ordered proximity (`hash NEAR/4 join`): term-filtered postings
    // equi-joined by doc, window tested as a post-filter — the slop
    // operator between exact phrase and bag-of-words BM25.
    "search_proximity" -> ((s, dir) =>
      Retrieval.proximitySearch(table(s, dir, "documents"), "doc_id",
        "text", "hash", "join", maxDist = 4)
        .select(col("id").as("doc_id"), col("n_pairs"), col("min_span"))))

  // ---------------------------------------------------------------- oracles

  private val toksSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"

  /** Same loud-failure cap guard as the dedup oracles: range(1, 4096) gram
    * starts are only valid while no document can outrun them (unigram
    * starts run to len, so len ≤ 4095). */
  private val capGuard: String =
    s"guard AS (SELECT CASE WHEN max(len($toksSql)) > 4095 THEN error('gram range(1,4096) cap exceeded') ELSE 1 END AS g FROM documents)"

  /** Decontamination guard: the train side tokenizes text with up to
    * [[SnippetTokens]] planted tokens appended, and 6-gram starts run to
    * len − 5 — so raw documents must stay ≤ 4095 + 5 − 8 = 4092 tokens for
    * the range cap to cover every contaminated-doc gram. */
  private val contamGuard: String = {
    val cap = 4095 + (ContamN - 1) - SnippetTokens
    s"guard AS (SELECT CASE WHEN max(len($toksSql)) > $cap THEN error('gram range(1,4096) cap exceeded for contaminated docs') ELSE 1 END AS g FROM documents)"
  }

  /** Per-doc n-gram stats CTE chain: grams → per-gram counts → per-doc
    * (total, nd, mx). Gram text mirrors the Spark expression's space-joined
    * token windows. */
  private def statsCtes(tag: String, gramExpr: String, lastTokOff: Int): String =
    s"""g$tag AS (SELECT doc_id, $gramExpr AS gm
       |  FROM tk, range(1, 4096) r$tag(i)
       |  WHERE i + $lastTokOff <= len(toks) AND (SELECT g FROM guard) = 1),
       |c$tag AS (SELECT doc_id, gm, count(*) AS c FROM g$tag GROUP BY 1, 2),
       |s$tag AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
       |    CAST(count(*) AS BIGINT) AS nd, CAST(max(c) AS BIGINT) AS mx
       |  FROM c$tag GROUP BY 1)""".stripMargin

  private def tok(off: Int): String =
    if (off == 0) "toks[CAST(i AS INT)]" else s"toks[CAST(i AS INT) + $off]"

  def oracles: Map[String, String] = Map(

    "corpus_gopher_rules" ->
      s"""WITH d AS (SELECT text, $toksSql AS toks,
         |    string_split(text, chr(10)) AS lines FROM documents),
         |e AS (SELECT
         |    CAST(len(toks) AS BIGINT) AS wc,
         |    CAST(len(lines) AS BIGINT) AS nl,
         |    CAST(length(array_to_string(toks, '')) AS BIGINT) AS chars,
         |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hsh,
         |    CAST(length(text) - length(replace(text, '...', '')) AS BIGINT) // 3 AS ell,
         |    CAST(len(list_filter(lines, l ->
         |      left(ltrim(l), 1) IN ('-', '*', '•'))) AS BIGINT) AS bullets,
         |    CAST(len(list_filter(lines, l -> right(rtrim(l), 3) = '...'
         |      OR right(rtrim(l), 1) = '…')) AS BIGINT) AS elll,
         |    CAST(len(list_filter(lines, l ->
         |      regexp_matches(l, '[A-Za-z]'))) AS BIGINT) AS alphal,
         |    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
         |      w -> list_contains(toks, w))) AS BIGINT) AS stops
         |  FROM d),
         |f AS (SELECT
         |    (wc < 50 OR wc > 100000) AS f_wc,
         |    CASE WHEN wc > 0 THEN (CAST(chars AS DOUBLE) / CAST(wc AS DOUBLE) < 3.0
         |      OR CAST(chars AS DOUBLE) / CAST(wc AS DOUBLE) > 10.0)
         |      ELSE true END AS f_mwl,
         |    CASE WHEN wc > 0
         |      THEN CAST(hsh + ell AS DOUBLE) / CAST(wc AS DOUBLE) > 0.1
         |      ELSE false END AS f_sym,
         |    CAST(bullets AS DOUBLE) / CAST(nl AS DOUBLE) > 0.9 AS f_bullet,
         |    CAST(elll AS DOUBLE) / CAST(nl AS DOUBLE) > 0.3 AS f_ellipsis,
         |    CAST(alphal AS DOUBLE) / CAST(nl AS DOUBLE) < 0.8 AS f_alpha,
         |    stops < 2 AS f_stop
         |  FROM e),
         |a AS (SELECT
         |    CAST(sum(CASE WHEN f_wc THEN 1 ELSE 0 END) AS BIGINT) AS v_wc,
         |    CAST(sum(CASE WHEN f_mwl THEN 1 ELSE 0 END) AS BIGINT) AS v_mwl,
         |    CAST(sum(CASE WHEN f_sym THEN 1 ELSE 0 END) AS BIGINT) AS v_sym,
         |    CAST(sum(CASE WHEN f_bullet THEN 1 ELSE 0 END) AS BIGINT) AS v_bullet,
         |    CAST(sum(CASE WHEN f_ellipsis THEN 1 ELSE 0 END) AS BIGINT) AS v_ellipsis,
         |    CAST(sum(CASE WHEN f_alpha THEN 1 ELSE 0 END) AS BIGINT) AS v_alpha,
         |    CAST(sum(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT) AS v_stop,
         |    CAST(sum(CASE WHEN NOT f_wc AND NOT f_mwl AND NOT f_sym
         |      AND NOT f_bullet AND NOT f_ellipsis AND NOT f_alpha
         |      AND NOT f_stop THEN 1 ELSE 0 END) AS BIGINT) AS v_pass
         |  FROM f)
         |SELECT 'word_count' AS rule, v_wc AS n FROM a
         |UNION ALL SELECT 'mean_word_length', v_mwl FROM a
         |UNION ALL SELECT 'symbol_ratio', v_sym FROM a
         |UNION ALL SELECT 'bullet_lines', v_bullet FROM a
         |UNION ALL SELECT 'ellipsis_lines', v_ellipsis FROM a
         |UNION ALL SELECT 'alpha_lines', v_alpha FROM a
         |UNION ALL SELECT 'stopwords', v_stop FROM a
         |UNION ALL SELECT 'pass_all', v_pass FROM a""".stripMargin,

    "decontaminate_report" ->
      s"""WITH $contamGuard,
         |ev8 AS (SELECT doc_id AS eid,
         |    array_to_string(($toksSql)[1:$SnippetTokens], ' ') AS snip
         |  FROM documents WHERE doc_id % 17 = 0),
         |tr AS (SELECT d.doc_id AS id,
         |    CASE WHEN d.doc_id % 23 = 0 THEN concat(d.text, ' ', e.snip)
         |         ELSE d.text END AS text
         |  FROM documents d LEFT JOIN ev8 e ON e.eid = 17 * (d.doc_id % 29)
         |  WHERE d.doc_id % 17 <> 0),
         |shn AS (SELECT DISTINCT id, concat_ws(' ', ${(0 until ContamN).map(tok).mkString(", ")}) AS s
         |  FROM (SELECT id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks FROM tr),
         |       range(1, 4096) t(i)
         |  WHERE i + ${ContamN - 1} <= len(toks) AND (SELECT g FROM guard) = 1),
         |she AS (SELECT DISTINCT doc_id AS eval_id, concat_ws(' ', ${(0 until ContamN).map(tok).mkString(", ")}) AS s
         |  FROM (SELECT doc_id, $toksSql AS toks FROM documents WHERE doc_id % 17 = 0),
         |       range(1, 4096) t(i)
         |  WHERE i + ${ContamN - 1} <= len(toks) AND (SELECT g FROM guard) = 1)
         |SELECT id, count(DISTINCT s) AS n_hits,
         |  count(DISTINCT eval_id) AS n_eval_docs,
         |  string_agg(DISTINCT CAST(eval_id AS STRING), ','
         |    ORDER BY CAST(eval_id AS STRING)) AS eval_ids
         |FROM (SELECT shn.id, shn.s, she.eval_id FROM shn JOIN she ON shn.s = she.s) h
         |GROUP BY id""".stripMargin,

    "text_repetition" -> {
      // Shared metric snippets so the keep flag can never drift from the
      // emitted columns.
      def fracSql(num: String, den: String) =
        s"CASE WHEN coalesce($den, 0) > 0 THEN CAST($num AS DOUBLE) / CAST($den AS DOUBLE) ELSE 0.0 END"
      def dupSql(nd: String, total: String) =
        s"CASE WHEN coalesce($total, 0) > 0 THEN 1.0 - CAST($nd AS DOUBLE) / CAST($total AS DOUBLE) ELSE 0.0 END"
      val utr = fracSql("s1.nd", "s1.total")
      val dupBi = dupSql("s2.nd", "s2.total")
      val topBi = fracSql("s2.mx", "s2.total")
      val dupTri = dupSql("s3.nd", "s3.total")
      s"""WITH $capGuard,
         |tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |${statsCtes("1", tok(0), 0)},
         |${statsCtes("2", s"concat_ws(' ', ${tok(0)}, ${tok(1)})", 1)},
         |${statsCtes("3", s"concat_ws(' ', ${tok(0)}, ${tok(1)}, ${tok(2)})", 2)}
         |SELECT d.doc_id,
         |  coalesce(s1.total, 0) AS n_tokens,
         |  $utr AS unique_token_ratio,
         |  $dupBi AS dup_bigram_frac,
         |  $topBi AS top_bigram_frac,
         |  $dupTri AS dup_trigram_frac,
         |  ($utr >= 0.4 AND $dupBi <= 0.03 AND $topBi <= 0.04) AS keep
         |FROM documents d
         |LEFT JOIN s1 ON s1.doc_id = d.doc_id
         |LEFT JOIN s2 ON s2.doc_id = d.doc_id
         |LEFT JOIN s3 ON s3.doc_id = d.doc_id""".stripMargin
    },

    "index_postings" ->
      s"""WITH t AS (SELECT doc_id,
         |    unnest(list_distinct($toksSql)) AS term
         |  FROM documents)
         |SELECT term, CAST(count(*) AS BIGINT) AS df,
         |  string_agg(CAST(doc_id AS VARCHAR), '|' ORDER BY doc_id) AS postings
         |FROM t GROUP BY term""".stripMargin,

    "source_token_jaccard" ->
      s"""WITH st AS (SELECT DISTINCT source, unnest($toksSql) AS t
         |  FROM documents),
         |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS nv
         |  FROM st GROUP BY 1),
         |iv AS (SELECT a.source AS s1, b.source AS s2,
         |    CAST(count(*) AS BIGINT) AS n_inter
         |  FROM st a JOIN st b ON a.t = b.t AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT s1, s2, n_inter, z1.nv AS n1, z2.nv AS n2,
         |  round(CAST(n_inter AS DOUBLE) /
         |    CAST(z1.nv + z2.nv - n_inter AS DOUBLE), 6) AS jaccard
         |FROM iv JOIN sz z1 ON z1.source = iv.s1
         |JOIN sz z2 ON z2.source = iv.s2""".stripMargin,

    "corpus_growth_curve" ->
      s"""WITH toks AS (SELECT doc_id AS id, unnest($toksSql) AS tok FROM documents),
         |percnt AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tokens FROM toks GROUP BY 1),
         |firsts AS (SELECT tok, min(id) AS id FROM toks GROUP BY 1),
         |newt AS (SELECT id, CAST(count(*) AS BIGINT) AS new_types FROM firsts GROUP BY 1),
         |j AS (SELECT doc_id AS id,
         |    coalesce(n_tokens, 0) AS n_tokens, coalesce(new_types, 0) AS new_types
         |  FROM documents LEFT JOIN percnt ON doc_id = percnt.id
         |  LEFT JOIN newt ON doc_id = newt.id)
         |SELECT id AS doc_id, n_tokens, new_types,
         |  CAST(sum(n_tokens) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
         |  CAST(sum(new_types) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
         |FROM j""".stripMargin,

    "search_bm25" ->
      s"""WITH $bm25Ctes
         |SELECT id, score FROM bm
         |ORDER BY score DESC, id ASC LIMIT $BmTopK""".stripMargin,

    "eval_ndcg_bm25" -> {
      val relSql = BmQuery.map(t =>
        s"(CASE WHEN list_contains($toksSql, '$t') THEN 1 ELSE 0 END)")
        .mkString(" + ")
      def contribSql(relC: String, rankC: String) =
        s"CAST(round((pow(2.0, CAST($relC AS DOUBLE)) - 1.0) / " +
          s"(ln(CAST($rankC AS DOUBLE) + 1.0) / ln(2.0)), 6) AS DECIMAL(18,6))"
      s"""WITH $bm25Ctes,
         |rel AS (SELECT doc_id AS id, CAST($relSql AS BIGINT) AS rel FROM documents),
         |rk AS (SELECT id, rank FROM (SELECT id,
         |    row_number() OVER (ORDER BY score DESC, id ASC) AS rank FROM bm)
         |  WHERE rank <= $NdcgK),
         |dj AS (SELECT rank, coalesce(rel, 0) AS rel
         |  FROM rk LEFT JOIN rel USING (id)),
         |dcg AS (SELECT sum(${contribSql("rel", "rank")}) AS dcg,
         |    min(CASE WHEN rel > 0 THEN rank END) AS first_rel,
         |    CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
         |  FROM dj),
         |idl AS (SELECT rel, row_number() OVER (ORDER BY rel DESC, id ASC) AS rank
         |  FROM rel ORDER BY rel DESC, id ASC LIMIT $NdcgK),
         |icg AS (SELECT sum(${contribSql("rel", "rank")}) AS idcg FROM idl)
         |SELECT $NdcgK AS k,
         |  round(CAST(dcg AS DOUBLE), 6) AS dcg,
         |  round(CAST(idcg AS DOUBLE), 6) AS idcg,
         |  CASE WHEN NOT (CAST(idcg AS DOUBLE) > 0.0) THEN 0.0
         |    ELSE round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) END AS ndcg,
         |  coalesce(round(1.0 / CAST(first_rel AS DOUBLE), 6), 0.0) AS mrr,
         |  round(CAST(n_rel AS DOUBLE) / $NdcgK, 6) AS p_at_k
         |FROM dcg, icg""".stripMargin
    },

    "search_rrf" ->
      s"""WITH $bm25Ctes,
         |r1 AS (SELECT id, CAST(row_number() OVER
         |    (ORDER BY score DESC, id ASC) AS DOUBLE) AS rk FROM bm),
         |r2 AS (SELECT doc_id AS id, CAST(row_number() OVER
         |    (ORDER BY n_chars DESC, doc_id ASC) AS DOUBLE) AS rk
         |  FROM documents),
         |f AS (SELECT coalesce(r1.id, r2.id) AS id,
         |    coalesce(1.0 / ($RrfK.0 + r1.rk), 0.0) +
         |    coalesce(1.0 / ($RrfK.0 + r2.rk), 0.0) AS rrf
         |  FROM r1 FULL OUTER JOIN r2 ON r1.id = r2.id)
         |SELECT id, rrf FROM f ORDER BY rrf DESC, id ASC LIMIT $RrfTopK""".stripMargin,

    "search_proximity" ->
      s"""WITH $capGuard,
         |tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |p AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         |    toks[CAST(i AS INT)] AS term
         |  FROM tk, range(1, 4096) r(i)
         |  WHERE i <= len(toks) AND (SELECT g FROM guard) = 1),
         |a AS (SELECT doc_id, pos AS pa FROM p WHERE term = 'hash'),
         |b AS (SELECT doc_id, pos AS pb FROM p WHERE term = 'join')
         |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(min(b.pb - a.pa) AS BIGINT) AS min_span
         |FROM a JOIN b ON b.doc_id = a.doc_id
         |WHERE b.pb > a.pa AND b.pb - a.pa <= 4
         |GROUP BY 1""".stripMargin,

    "search_phrase" -> {
      val aligns = PhraseQuery.zipWithIndex.map { case (t, i) =>
        s"a$i AS (SELECT doc_id, pos - $i AS start FROM p WHERE term = '$t')"
      }.mkString(",\n")
      val joins = (1 until PhraseQuery.size)
        .map(i => s"JOIN a$i USING (doc_id, start)").mkString(" ")
      s"""WITH $capGuard,
         |tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |p AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         |    toks[CAST(i AS INT)] AS term
         |  FROM tk, range(1, 4096) r(i)
         |  WHERE i <= len(toks) AND (SELECT g FROM guard) = 1),
         |$aligns,
         |h AS (SELECT a0.doc_id, a0.start FROM a0 $joins)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
         |  min(start) AS first_pos
         |FROM h GROUP BY doc_id""".stripMargin
    })

  /** BM25 CTE chain shared by both search oracles — mirrors
    * [[graft.ops.Retrieval.bm25Scores]] operand for operand (k1=1.2,
    * b=0.75; 1-b pre-folded to 0.25, k1+1 left as the sum 1.2 + 1.0). */
  private def bm25Ctes: String = {
    val terms = BmQuery.map(t => s"'$t'").mkString(", ")
    s"""b2 AS (SELECT doc_id AS id, $toksSql AS toks FROM documents),
       |b3 AS (SELECT id, CAST(len(toks) AS DOUBLE) AS len, toks FROM b2),
       |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(len) AS tot FROM b3),
       |st2 AS (SELECT n, tot / n AS avglen FROM st),
       |tf AS (SELECT id, len, term, CAST(count(*) AS DOUBLE) AS tf
       |  FROM (SELECT id, len, unnest(toks) AS term FROM b3)
       |  WHERE term IN ($terms) GROUP BY 1, 2, 3),
       |dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
       |bm AS (SELECT id, CAST(sum(CAST(round(
       |      ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * (1.2 + 1.0)) /
       |        (tf + 1.2 * (0.25 + (len / avglen) * 0.75)),
       |      6) AS DECIMAL(18,6))) AS DOUBLE) AS score
       |  FROM tf JOIN dfq USING (term), st2 GROUP BY id)""".stripMargin
  }
}
