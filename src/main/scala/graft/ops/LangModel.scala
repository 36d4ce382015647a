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
}
