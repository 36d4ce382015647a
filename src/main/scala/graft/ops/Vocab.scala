package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics for tokenizer construction: raw n-gram
  * frequency tables and the first BPE merge step (adjacent symbol-pair
  * counts weighted by word frequency).
  *
  * Both are two-level hash aggregates with map-side partial combine — the
  * canonical "count words on 100 TB" shape. The BPE pass aggregates the
  * corpus down to the DISTINCT-WORD table first (Zipf: orders of magnitude
  * smaller than the token stream) before exploding character pairs, so the
  * expensive per-pair work runs on unique words, not occurrences.
  */
object Vocab {

  /** Raw (non-distinct) word n-grams in one expression eval per document —
    * [[graft.functions.TextShingles]] with multiset semantics. */
  def rawGrams(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.TextShingles(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), n,
        distinct = false))

  /** Corpus-wide n-gram occurrence counts. Output: (gram, cnt). */
  def ngramCounts(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs.select(explode(rawGrams(col(textCol), n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))

  /** Top `k` n-grams by (count desc, gram asc) — the deterministic
    * tiebreak makes the cut set unique. orderBy+limit plans as
    * TakeOrderedAndProject: per-partition top-k, then a single-partition
    * merge of k-row heads — no global sort. */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    ngramCounts(docs, textCol, n)
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(k)
  }

  /** Word-frequency table: (w, wcnt) over whitespace tokens. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wcnt"))

  /** Inverted index: per term, the document frequency and the sorted
    * posting list of ids containing it. Terms are deduplicated INSIDE each
    * document before the explode (array_distinct on the token array), so
    * the shuffled stream is (term, doc) pairs — bounded by distinct terms
    * per doc, not token occurrences. One hash aggregate keyed by term;
    * postings sort locally per term after the shuffle.
    *
    * At retrieval scale the posting list of a stopword-grade term is the
    * skew risk — `minDf`-style caps don't help there; the standard fix is
    * dropping top-df terms (they carry no selectivity), which the caller
    * does by filtering on the emitted `df`. Output: (term, df, postings). */
  def invertedIndex(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("__doc"),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("__doc"))).as("postings"))

  /** Skip-gram co-occurrence counts: for every token, the ordered pairs
    * (token, following token) within a `window`-token lookahead — the raw
    * statistic behind word-embedding training and PMI collocation mining.
    *
    * Pure narrow pair generation: pairs are built INSIDE the token array
    * (indexed transform + bounded slice, O(n·window) per doc) and only
    * then exploded into the single counting aggregate — no positional
    * self-join, so there is exactly one exchange (by pair) and co-located
    * pair construction at any corpus size. */
  def coocCounts(docs: DataFrame, textCol: String, window: Int): DataFrame = {
    require(window >= 1 && window <= 64, s"window out of range: $window")
    val tk = docs.select(TextOps.tokens(col(textCol)).as("__toks"))
    // element at 0-based i pairs with 1-based positions i+2 .. i+1+window
    val pairs = flatten(transform(col("__toks"), (t, i) =>
      transform(slice(col("__toks"), i + lit(2), lit(window)),
        t2 => array(t, t2))))
    tk.select(explode(pairs).as("__p"))
      .groupBy(col("__p")(0).as("w1"), col("__p")(1).as("w2"))
      .agg(count(lit(1)).as("n"))
  }

  /** Vocabulary coverage report: how much of the token stream the top-`k`
    * words cover, and the OOV (out-of-vocabulary) rate a tokenizer built
    * from that vocab would pay. Deterministic vocab cut:
    * (count desc, word asc). One count aggregate + a k-row TakeOrdered +
    * two 1-row reductions — the corpus is scanned once.
    * Output: one row (vocab_size, covered, total, oov_rate).
    *
    * The word-count table feeds both the top-k cut and the total — it is
    * persisted (vocab-sized, Zipf-small) so the token stream aggregates
    * ONCE; the cache lives until session eviction. */
  def coverage(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val wc = wordCounts(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = wc.orderBy(col("wcnt").desc, col("w").asc).limit(k)
      .agg(count(lit(1)).as("vocab_size"), sum(col("wcnt")).as("covered"))
    val total = wc.agg(sum(col("wcnt")).as("total"))
    top.crossJoin(broadcast(total))
      .select(col("vocab_size"), col("covered"), col("total"),
        round(lit(1.0) -
          col("covered").cast("double") / col("total").cast("double"), 6)
          .as("oov_rate"))
  }

  /** First-iteration BPE pair statistics: for every adjacent character
    * pair inside a word, the total corpus occurrences (word frequency
    * summed over each position the pair appears at). This is exactly the
    * count a BPE trainer maximizes when choosing its first merge.
    *
    * Output: (pair, cnt) — `pair` is the two-character substring. */
  def bpePairCounts(docs: DataFrame, textCol: String): DataFrame =
    wordCounts(docs, textCol)
      .filter(length(col("w")) >= 2)
      // One generator row per in-word position; runs on DISTINCT words.
      .select(col("w"), col("wcnt"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("wcnt"))
      .groupBy(col("pair")).agg(sum(col("wcnt")).as("cnt"))

  /** Top `k` BPE pairs by (count desc, pair asc). */
  def topBpePairs(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    bpePairCounts(docs, textCol)
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(k)
  }

  /** The padded symbol-string encoding the BPE rounds operate on: every
    * symbol wrapped in single spaces, so adjacent symbols are separated by
    * a DOUBLE space and the pair (l, r) is the substring `" l  r "` —
    * plain `replace` of that substring with `" lr "` is then EXACTLY the
    * greedy left-to-right non-overlapping merge of classic BPE, with
    * identical scan semantics in any engine's `replace`. (Symbols can
    * never contain a space: words come from whitespace tokenization.) */
  private def wrapped(word: Column): Column =
    concat(lit(" "),
      array_join(filter(split(word, ""), c => c =!= ""), "  "), lit(" "))

  /** Iterative BPE training, `merges` rounds of count-pairs → argmax →
    * apply-merge (Sennrich et al. 2016). Inherently round-synchronous:
    * round r's argmax (a bounded 1-ROW collect, like a Lloyd iteration)
    * decides round r+1's plan — so the corpus aggregates ONCE to the
    * persisted distinct-word table (Zipf-small) and every round runs one
    * partial-combining pair aggregate + one string replace over it.
    * Argmax ties break (freq desc, left asc, right asc) — deterministic.
    * Output: one row per learned merge — (step, lhs, rhs, freq); stops
    * early if the corpus runs out of adjacent pairs. */
  def bpeTrain(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 64, s"merges out of range: $merges")
    val spark = docs.sparkSession
    // Scale-adaptive parallelism for the round cache (guide §2.6): a
    // small corpus scan (one split) leaves AQE's coalesced word table on
    // 1-2 partitions, serializing every round's pair explode + aggregate
    // onto as few cores. Proxy the decision on the SCAN's partition
    // count (no exchanges → .rdd plans without running jobs): when the
    // corpus is narrower than the session parallelism, widen the
    // persisted word table once; at real corpus sizes this is a no-op.
    val narrowScan =
      docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism
    val wc0 = wordCounts(docs, textCol)
      .select(wrapped(col("w")).as("sym"), col("wcnt"))
    val words0 =
      (if (narrowScan) wc0.repartition(spark.sparkContext.defaultParallelism)
       else wc0).persist()
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var words = words0
    var exhausted = false
    for (step <- 1 to merges if !exhausted) {
      val syms = filter(split(trim(col("sym")), "  "), s => s =!= "")
      val top = words
        .select(col("wcnt"), syms.as("__s"))
        .filter(size(col("__s")) >= 2)
        .select(col("wcnt"), explode(
          transform(sequence(lit(1), size(col("__s")) - 1),
            i => struct(element_at(col("__s"), i).as("l"),
              element_at(col("__s"), i + 1).as("r")))).as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(sum(col("wcnt")).as("freq"))
        .orderBy(col("freq").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        learned += ((step, l, r, f))
        words = words.withColumn("sym",
          replace(col("sym"), lit(s" $l  $r "), lit(s" ${l + r} ")))
      }
    }
    words0.unpersist()
    import spark.implicits._
    learned.toSeq.toDF("step", "lhs", "rhs", "freq")
  }

  /** Apply learned BPE merges to the corpus: per document, the total
    * piece count after greedy merge application — the "how many tokens
    * will training actually see" statistic that sizes a data mix.
    *
    * Encoding runs on the DISTINCT-WORD table (Zipf: far smaller than
    * the token stream) as a chain of `replace` calls on the double-space
    * padded symbol string — one narrow expression per merge, identical
    * greedy left-to-right semantics in any engine ([[bpeTrain]]'s
    * encoding). Piece counts then join back onto the exploded token
    * stream and sum per document: one distinct aggregate, one join keyed
    * by word, one count aggregate. Output: (idCol, n_pieces). */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(idCol != "w" && idCol != "n_pieces",
      "bpeEncode uses internal w/n_pieces columns; rename the id column")
    // Same scale-adaptive widening as bpeTrain: the merge-chain replace
    // + split is the expensive per-word expression, and on a one-split
    // corpus AQE leaves the distinct-word table on 1-2 partitions — the
    // whole encode map would run on as few cores. No-op at real scale.
    val sc = docs.sparkSession.sparkContext
    val words0 = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w")).distinct()
    val words =
      if (docs.rdd.getNumPartitions < sc.defaultParallelism)
        words0.repartition(sc.defaultParallelism)
      else words0
    val sym = merges.foldLeft(wrapped(col("w"))) { case (s, (l, r)) =>
      replace(s, lit(s" $l  $r "), lit(s" ${l + r} "))
    }
    val enc = words.select(col("w"),
      size(split(trim(sym), "  ")).cast("long").as("__np"))
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("w"))
      .join(enc, "w")
      .groupBy(col(idCol))
      .agg(sum(col("__np")).as("n_pieces"))
  }

  // ------------------------------------------------ vocabulary growth curve

  /** Heaps-law vocabulary growth curve: one row per document (in `idCol`
    * order) with its token count, its count of never-before-seen token
    * types, and the running corpus totals of both — the type/token curve a
    * corpus audit fits the Heaps exponent on (sublinear growth is the
    * signature of natural text; near-linear growth flags id-like noise).
    *
    * First occurrences come from a token-keyed `min(id)` aggregate
    * (map-side combinable — no sort over the token stream); the running
    * totals use [[Ranking.prefixSum]]'s two-pass distributed scan instead
    * of the single-task global window. */
  def growthCurve(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
    val perDoc = toks.groupBy(col("id")).agg(count(lit(1)).as("n_tokens"))
    val newTypes = toks.groupBy(col("tok")).agg(min(col("id")).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("new_types"))
    val joined = docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .join(newTypes, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
    Ranking.prefixSum(joined, Seq(col("id")), Seq("n_tokens", "new_types"))
      .select(col("id").as("doc_id"), col("n_tokens"), col("new_types"),
        col("cum_n_tokens").as("cum_tokens"),
        col("cum_new_types").as("cum_types"))
  }

  /** Zipf rank–frequency fit over the top-k vocabulary: OLS slope and
    * intercept of ln(freq) on ln(rank) — the one-row corpus-health signal
    * (natural text sits near slope −1; template/boilerplate corpora
    * flatten, spam steepens). Ranks come from a row_number over the ≤k-row
    * TakeOrdered result (a bounded single-partition window over collapsed
    * counts, same regime as the sampled-quantiles gate — never raw rows);
    * the OLS moments are 6dp-decimal-exact sums, the closure double.
    * Degenerate input (k = 1 or an empty corpus) reports slope = 0
    * explicitly. Output: (n_vocab, slope, intercept). */
  def zipfSlope(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val top = wordCounts(docs, textCol)
      .orderBy(col("wcnt").desc, col("w").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("wcnt").desc, col("w").asc)
    val xy = top.withColumn("rank", row_number().over(w))
      .select(
        round(log(col("rank").cast("double")), 6).cast("decimal(18,6)").as("x"),
        round(log(col("wcnt").cast("double")), 6).cast("decimal(18,6)").as("y"))
    val agg = xy.agg(count(lit(1)).as("n_vocab"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
    def d(c: Column) = c.cast("double")
    val nd = d(col("n_vocab"))
    val den = nd * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val slope = (nd * d(col("sxy")) - d(col("sx")) * d(col("sy"))) / den
    agg.select(col("n_vocab"),
      when(!(den > 0.0), lit(0.0)).otherwise(round(slope, 6)).as("slope"),
      when(!(den > 0.0), lit(0.0))
        .otherwise(round((d(col("sy")) - slope * d(col("sx"))) / nd, 6))
        .as("intercept"))
  }

  /** word2vec/SGNS negative-sampling distribution table (Mikolov et al.
    * 2013): the top-k vocabulary with sampling mass ∝ count^0.75 — the
    * table a skip-gram trainer draws negatives from. Weights are
    * 6dp-rounded decimals so the normalizer Z is an exact sum; per-token
    * mass is emitted as the integer floor(w/Z · 10⁶) (micro-units, the
    * cross-engine-safe form a hash-threshold sampler consumes directly —
    * cf. the temperature-mix gate). Output: (rank, w, wcnt, p_micro). */
  def negativeSamplingTable(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val top = wordCounts(docs, textCol)
      .orderBy(col("wcnt").desc, col("w").asc).limit(k)
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("wcnt").desc, col("w").asc)
    val weighted = top.select(col("w"), col("wcnt"),
      round(pow(col("wcnt").cast("double"), 0.75), 6)
        .cast("decimal(18,6)").as("w75"))
    val z = weighted.agg(sum(col("w75")).as("z"))
    def d(c: Column) = c.cast("double")
    weighted.crossJoin(broadcast(z))
      .withColumn("rank", row_number().over(win))
      .select(col("rank"), col("w"), col("wcnt"),
        floor(d(col("w75")) / d(col("z")) * 1000000.0).cast("long").as("p_micro"))
  }
}
