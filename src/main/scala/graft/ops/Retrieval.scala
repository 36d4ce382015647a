package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical retrieval (extension): Okapi BM25 scoring over the corpus and
  * reciprocal-rank fusion — the standard hybrid-search combiner for a
  * lexical ranking + a second signal (dense similarity, priors).
  *
  * Cross-engine determinism: every per-(doc, term) BM25 contribution is a
  * fixed-operand-order IEEE-double expression rounded to 6dp and summed as
  * DECIMAL (exact, order-invariant — the established corpus_stats
  * pattern), so per-doc scores are bit-identical on any engine and
  * partitioning. RRF sums exactly two coalesced terms in a fixed order —
  * no aggregate, no order dependence.
  */
object Retrieval {

  /** BM25 scores for every document matching at least one query term.
    *
    * Shape: the token stream filters to the query terms BEFORE any
    * aggregate (the filter prunes ~all tokens for a short query), then
    * (doc, term) tf-counts aggregate with map-side combine; document
    * frequencies and the (N, avglen) scalar ride back as broadcasts.
    * No global structure anywhere — at 100 TB this is the corpus scanned
    * twice (once for the (N, avglen) stats, once for the filtered tf
    * aggregate — both narrow scans of the text column) plus two tiny
    * broadcast joins.
    *
    * `len` sums are integer-valued doubles (exact ≤ 2^53); `avglen` is
    * one double division of exact operands. Output: (id, score). */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    val base = docs.select(col(idCol).as("id"),
      TextOps.tokens(col(textCol)).as("__toks"))
      .withColumn("__len", size(col("__toks")).cast("double"))
    val stats = base
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__len")).as("__tot"))
      .select(col("__n"), (col("__tot") / col("__n")).as("__avglen"))
    val tf = base
      .select(col("id"), col("__len"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(query: _*))
      .groupBy(col("id"), col("__len"), col("term"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("__df"))
    // idf = ln((n - df + 0.5)/(df + 0.5) + 1)  [BM25+-style, ≥ 0]
    // tfn = tf·(k1+1) / (tf + k1·((1-b) + (len/avglen)·b))
    // Operand order is load-bearing: the oracle mirrors it symbol for
    // symbol — (1-b) pre-folded (exact for dyadic b) and k1+1 written as
    // the sum `(1.2 + 1.0)` on both sides so neither engine's literal
    // parsing has to be reasoned about.
    val idf = log(
      (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0)
    val lenNorm = lit(1.0 - b) + (col("__len") / col("__avglen")) * b
    val contrib = round(
      idf * (col("__tf") * (k1 + 1.0)) /
        (col("__tf") + lit(k1) * lenNorm),
      6).cast("decimal(18,6)")
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("id"), contrib.as("__c"))
      .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      .select(col("id"), col("__s").cast("double").as("score"))
  }

  /** Reciprocal-rank fusion of two rankings: per id,
    * `Σ 1/(k + rank_i)` over the rankings that contain it. Inputs are
    * (idCol, rankCol) tables (1-based ranks, e.g. from
    * [[Ranking.globalRank]]); one full-outer join on the id — no
    * aggregate, so the two-term double sum has a fixed evaluation order.
    * Output: (id, rrf). */
  def rrfFuse(r1: DataFrame, r2: DataFrame, idCol: String,
      rankCol: String, k: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = r1.select(col(idCol), col(rankCol).cast("double").as("__r1"))
    val bb = r2.select(col(idCol), col(rankCol).cast("double").as("__r2"))
    a.join(bb, Seq(idCol), "full_outer")
      .select(col(idCol),
        (coalesce(lit(1.0) / (lit(k.toDouble) + col("__r1")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k.toDouble) + col("__r2")), lit(0.0)))
          .as("rrf"))
  }

  /** Exact phrase search via POSITIONAL inverted-index intersection — the
    * classic phrase-query plan: each phrase term's posting list (doc,
    * position) is shifted back by its offset in the phrase, so a phrase
    * occurrence is an m-way equality on (doc, aligned start); the join
    * chain intersects the lists smallest-first-agnostically on the
    * (id, start) key. Each side of every join is ONE term's postings —
    * the filter prunes the token stream before any shuffle, and every
    * join is a keyed equi-join (broadcastable when a term is rare). No
    * window, no per-doc array rebuild.
    *
    * Output: (id, n_hits, first_pos) for documents containing the exact
    * token sequence at least once (token = [[TextOps.tokens]] semantics:
    * lowercased, whitespace-split). */
  /** Positional postings (id, pos, term) — the shared index shape of the
    * phrase and proximity operators ([[TextOps.tokens]] semantics:
    * lowercased, whitespace-split, 0-based positions). */
  private def positionalPostings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "term")))

  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val postings = positionalPostings(docs, idCol, textCol)
    val aligned = phrase.zipWithIndex.map { case (t, i) =>
      postings.filter(col("term") === t)
        .select(col("id"), (col("pos") - i).cast("long").as("start"))
    }
    aligned.reduce((a, b) => a.join(b, Seq("id", "start")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"), min(col("start")).as("first_pos"))
  }

  /** Ordered proximity search — the `A NEAR/d B` operator: documents
    * where `termB` occurs AFTER `termA` within `maxDist` token
    * positions (1 = adjacent). The positional join is keyed by doc id
    * (hash equi-join of the two TERM-FILTERED postings lists — the
    * filter prunes the token stream before any shuffle) with the window
    * test as a post-filter; per-doc cost is occ(A)·occ(B), bounded for
    * content terms. For stopword-grade terms cap occurrences upstream
    * (their proximity carries no ranking signal anyway).
    *
    * Output: (id, n_pairs, min_span) — qualifying (posA, posB) pair
    * count and the tightest span (posB − posA). */
  def proximitySearch(docs: DataFrame, idCol: String, textCol: String,
      termA: String, termB: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val postings = positionalPostings(docs, idCol, textCol)
    val a = postings.filter(col("term") === termA)
      .select(col("id"), col("pos").as("pa"))
    val b = postings.filter(col("term") === termB)
      .select(col("id"), col("pos").as("pb"))
    a.join(b, Seq("id"))
      .filter(col("pb") > col("pa") && col("pb") - col("pa") <= maxDist)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("pb") - col("pa")).cast("long").as("min_span"))
  }
}
