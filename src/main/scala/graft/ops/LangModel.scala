package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model scoring — the CCNet-style "perplexity filter"
  * of a web-corpus pipeline: train a bigram model with add-k smoothing on
  * a (reference) corpus, score every document by its mean negative
  * log-likelihood per bigram, and gate on the score. Gibberish, boilerplate
  * and wrong-language text score high; fluent in-domain text scores low.
  *
  * Everything is relational: the model is two hash aggregates (bigram and
  * context counts), scoring is two equi-joins from the document bigram
  * stream to the model, and the per-document reduction is an ORDER-PINNED
  * fold (collect positions, sort, left-fold) — double addition is not
  * associative, so a plain `sum()` would depend on partition merge order;
  * the sorted fold fixes one canonical order any engine reproduces
  * bit-for-bit (same device as [[Ann.meanPool]]).
  *
  * At 100 TB: the bigram model of a web corpus is itself large (billions
  * of keys) — the model side shuffles on (w1, w2), never broadcasts, and
  * the score join co-partitions the document bigram stream with it. When
  * the model must be bounded, count it on a [[Sampling.stratified]] sample
  * or prune to top-M bigrams (the standard KenLM practice); the scoring
  * join is unchanged.
  */
object LangModel {

  /** P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V), natural log, where V
    * is the distinct-unigram vocabulary size. All inputs to the division
    * are integer-valued-or-half doubles (k of 0.5 keeps them exact), so
    * the quotient — one correctly-rounded IEEE op — and its log are
    * engine-reproducible. */
  private def logProb(c2: Column, c1: Column, v: Column, k: Double): Column =
    log((coalesce(c2, lit(0L)).cast("double") + lit(k)) /
      (coalesce(c1, lit(0L)).cast("double") + lit(k) * v.cast("double")))

  /** (doc_id, pos, w1, w2) bigram stream of a document table — one row per
    * adjacent token pair, `pos` the 0-based pair position. Pure narrow
    * (tokenize + explode), no shuffle. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    Seq("__toks", "pos", "w1", "w2").foreach { c =>
      require(!docs.columns.contains(c),
        s"bigrams emits/uses a $c column; rename the existing one")
    }
    val toks = TextOps.tokens(col(textCol))
    docs
      .select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), posexplode(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1)).as(Seq("pos", "w1")),
        col("__toks").as("__toks"))
      .select(col(idCol), col("pos"), col("w1"),
        element_at(col("__toks"), col("pos") + 2).as("w2"))
  }

  /** Score `docs` against a bigram model trained on `corpus` (pass the
    * same frame for self-scoring — the CCNet setup trains on the reference
    * corpus and scores the candidate corpus). Output: one row per input
    * document — (id, n_bigrams, nll) with `nll` the mean negative
    * log-likelihood per bigram in nats, 6dp-rounded (the established
    * cross-engine-safe form for libm outputs); documents with fewer than
    * two tokens carry n_bigrams = 0 and a null nll. */
  def scoreDocs(docs: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, addK: Double = 0.5, cache: Boolean = true): DataFrame = {
    require(addK > 0.0, s"addK must be positive, got $addK")
    // The bigram stream feeds THREE consumers (bigram counts, context
    // counts, and — when self-scoring — the scoring side, which hits the
    // same cache by plan equality). Without caching each consumer re-runs
    // tokenize+explode over the corpus. Local/medium scale: persist (the
    // stream is tokens-sized). At 100 TB don't cache a corpus-sized
    // stream — materialize the MODEL aggregates to tables instead (the
    // two-pass KenLM shape) and pass cache = false.
    val rawBg = bigrams(corpus, idCol, textCol)
    val trainBg = if (cache) rawBg.persist() else rawBg
    val model = trainBg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("__c2"))
    val context = trainBg.groupBy(col("w1"))
      .agg(count(lit(1)).as("__c1"))
    val vocab = corpus
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .agg(count_distinct(col("w")).as("__v"))
    val scored = bigrams(docs, idCol, textCol)
      .join(model, Seq("w1", "w2"), "left")
      .join(context, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol), col("pos"),
        logProb(col("__c2"), col("__c1"), col("__v"), addK).as("__lp"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("__lp")))).as("__ps"),
        count(lit(1)).as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"),
        round(-aggregate(col("__ps"), lit(0.0), (acc, x) => acc + x("__lp")) /
          col("n_bigrams").cast("double"), 6).as("nll"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("nll"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999's interpolated form) — the smoothing a production
    * perplexity filter actually ships, vs [[scoreDocs]]'s add-k baseline:
    *
    *   P(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    *              + D·N1+(w1,·)/c(w1·) · Pcont(w2)
    *   Pcont(w2) = (N1+(·,w2) + k) / (N1+(·,·) + k·(V+1))
    *
    * with discount D and the continuation distribution add-k smoothed so
    * unseen words keep a finite log (the +1 slot is the OOV mass); an
    * unseen CONTEXT backs off to Pcont entirely. Same relational shape as
    * [[scoreDocs]]: the three model views (bigram counts, per-context
    * totals + continuation fan-out, per-word fan-in) all derive from ONE
    * collapsed bigram-count aggregate — the raw stream is touched once —
    * and scoring is keyed equi-joins plus the order-pinned per-document
    * fold. Output: (id, n_bigrams, nll), nll 6dp, null when < 2 tokens. */
  def kneserNeyScore(docs: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, discount: Double = 0.75, contK: Double = 0.5,
      cache: Boolean = true): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0,1), got $discount")
    require(contK > 0.0, s"contK must be positive, got $contK")
    val model0 = bigrams(corpus, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c2"))
    val model = if (cache) model0.persist() else model0
    // N1+(w1,·) = rows per w1 in the collapsed model; c(w1·) = Σ c2
    val context = model.groupBy(col("w1"))
      .agg(sum(col("__c2")).as("__c1"), count(lit(1)).as("__n1f"))
    val cont = model.groupBy(col("w2")).agg(count(lit(1)).as("__n1b"))
    val tot = model.agg(count(lit(1)).as("__ntot"))
    val vocab = corpus
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .agg(count_distinct(col("w")).as("__v"))
    val d = lit(discount)
    val c2d = coalesce(col("__c2"), lit(0L)).cast("double")
    val c1d = coalesce(col("__c1"), lit(0L)).cast("double")
    val n1fd = coalesce(col("__n1f"), lit(0L)).cast("double")
    val n1bd = coalesce(col("__n1b"), lit(0L)).cast("double")
    val pcont = (n1bd + lit(contK)) /
      (col("__ntot").cast("double") + lit(contK) * (col("__v").cast("double") + 1.0))
    val p = when(c1d > 0.0,
      greatest(c2d - d, lit(0.0)) / c1d + d * n1fd / c1d * pcont).otherwise(pcont)
    val scored = bigrams(docs, idCol, textCol)
      .join(model, Seq("w1", "w2"), "left")
      .join(context, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(tot.crossJoin(vocab)))
      .select(col(idCol), col("pos"), log(p).as("__lp"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("__lp")))).as("__ps"),
        count(lit(1)).as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"),
        round(-aggregate(col("__ps"), lit(0.0), (acc, x) => acc + x("__lp")) /
          col("n_bigrams").cast("double"), 6).as("nll"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("nll"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection via
    * Importance Resampling"): score every document by the log-likelihood
    * RATIO between a target-domain unigram model and the raw-corpus
    * unigram model — `Σ_w c_doc(w)·(ln p_target(w) − ln p_raw(w))` with
    * add-1 smoothing over the raw vocabulary. High scores mark documents
    * that look like the target distribution; selection keeps the top mass
    * (rank + cut, e.g. [[graft.ops.Sampling.topFraction]] or a plain
    * top-k). The paper hashes n-grams into buckets to bound the feature
    * space; here features are raw unigrams — the bucketing is an
    * optimization, not a semantic, and exact features keep the score
    * oracle-checkable.
    *
    * Everything is relational and scale-shaped: ONE token-counts aggregate
    * serves both models (target counts are a conditional sum riding the
    * raw count), per-token weights are 6dp-rounded decimals (the
    * cross-engine-safe libm form) so the per-document sum is EXACT and
    * order-free — no fold pinning needed — and the weight join shuffles
    * on the token key (broadcastable when the vocabulary is small, keyed
    * when it is web-scale). Documents with no tokens score 0.
    *
    * Output: (idCol, n_tokens, score) — score a double from the exact
    * decimal sum. */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    Seq("__t", "__w", "__cr", "__ct", "__wt").foreach { c =>
      require(!docs.columns.contains(c),
        s"dsirScores uses an internal $c column; rename the existing one")
    }
    val toks = docs.select(col(idCol), isTarget.as("__t"),
      explode(TextOps.tokens(col(textCol))).as("__w"))
    val counts = toks.groupBy(col("__w")).agg(
      count(lit(1)).as("__cr"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"))
    // totals + vocab in one tiny aggregate over the (vocab-sized) counts
    val tot = counts.agg(sum(col("__cr")).as("__tr"),
      sum(col("__ct")).as("__tt"), count(lit(1)).as("__v"))
    // ln((c+1)/(T+V)): integer-valued double operands, one correctly-
    // rounded division, libm log rounded to 6dp — the established
    // cross-engine form (agg_entropy / BM25 gates).
    def smoothed(c: Column, t: Column): Column =
      log((c.cast("double") + 1.0) /
        (t.cast("double") + col("__v").cast("double")))
    val weights = counts.crossJoin(broadcast(tot))
      .select(col("__w"),
        round(smoothed(col("__ct"), col("__tt")) -
          smoothed(col("__cr"), col("__tr")), 6)
          .cast("decimal(18,6)").as("__wt"))
    val scored = toks.join(weights, Seq("__w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__wt")).cast("double").as("score"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score"), lit(0.0)).as("score"))
  }
}
