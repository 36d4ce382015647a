package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deduplication operators for training-data pipelines, ordered by cost:
  *
  *  - exact: one hash-aggregate on a content fingerprint — the cheapest and
  *    the first pass at 100 TB (pure map-side-combinable groupBy);
  *  - MinHash+LSH: shingle → k-minhash signature → banded bucket join; only
  *    same-bucket pairs are candidate-joined, then EXACTLY verified with set
  *    Jaccard — the scale path for near-dup text (no quadratic stage; bucket
  *    sizes bound the join);
  *  - SimHash: 64-bit sign-sketch + 16-bit-chunk pigeonhole blocking for
  *    hamming ≤ 3 (any pair within distance 3 shares an exact chunk);
  *  - n-gram Jaccard: direct pairwise verify, for small/blocked domains;
  *  - embedding cosine near-dup: see Ann.
  *
  * Everything is built from codegen'd built-ins (xxhash64, higher-order
  * array functions, bit ops) — no UDFs, no Python boundary.
  */
object Dedup {

  // ----------------------------------------------------------------- exact

  /** Exact dedup groups: fingerprint → representative (min id) + group size.
    * `keepRepresentatives` filters a corpus to one row per fingerprint. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextOps.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  def keepRepresentatives(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.join(
      exactGroups(docs, idCol, textCol).select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")

  // -------------------------------------------------------------- shingles

  /** Word n-gram shingles as a Column (distinct set semantics for Jaccard).
    * One custom-expression eval per document ([[graft.functions.TextShingles]])
    * — the composable transform/slice/concat_ws chain runs interpreted per
    * GRAM and was the measured hot spot of every shingle-based dedup. */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.TextShingles(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), n))

  /** Distinct (id, shingle) rows: a NARROW projection (per-doc shingle
    * array + explode) — no window, no shuffle, safe to re-evaluate in
    * several plan subtrees. Documents with fewer than n tokens produce no
    * shingles. */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(shingles(col(textCol), n)).as("s"))

  /** Per-document n-gram NOVELTY score — the memorization-risk profile a
    * pretraining curation pass reads: of a document's distinct n-gram
    * shingles, the fraction found in NO other document (duplicated
    * boilerplate and copied passages score low). shared = shingles with
    * corpus document-frequency ≥ 2 from the inverted index; two keyed
    * hash aggregates (by shingle, then by doc) and one keyed join — no
    * windows, no pairwise joins, linear in total shingles at any corpus
    * size. Documents with fewer than n tokens emit no row. */
  def ngramNoveltyScores(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, n)
    val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("__df"))
    sh.join(dfreq, Seq("s"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("id"), col("n_shingles"), col("n_shared"),
        round(lit(1.0) - col("n_shared").cast("double") /
          col("n_shingles").cast("double"), 6).as("novelty"))
  }

  /** One row per doc with its distinct shingle set (for exact verifies). */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleRows(docs, idCol, textCol, n).groupBy(col("id"))
      .agg(collect_set(col("s")).as("sh"))

  /** Exact set Jaccard between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  // ---------------------------------------------------------- MinHash+LSH

  /** k-permutation MinHash signature: sig[i] = min over shingles of
    * xxhash64(i, shingle). */
  def minhashSignature(sh: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))
    }: _*)

  /** LSH band keys: bands of `rowsPerBand` signature slots, each hashed to
    * one bucket id. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), concat_ws(",",
        transform(slice(sig, b * rowsPerBand + 1, rowsPerBand), _.cast("string"))))
    }: _*)

  /** Candidate pairs from banded MinHash, exactly verified at `threshold`.
    * The band self-join ships only (band, id) rows — candidate ids — and the
    * (big) shingle arrays are joined back for the surviving distinct pairs
    * only, so shuffle volume is bands×|docs| ints + |candidates| arrays, not
    * bands×|docs| arrays. Requires UNIQUE doc ids (see
    * [[pairIntersections]]). */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 12, bands: Int = 4, threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = k / bands
    // Persisted: the shingle subtree feeds FOUR plan branches (signature
    // agg, n_sh sizes, both verify-join sides) — unpersisted, tokenize +
    // shingle (and any expensive upstream pipeline) re-runs per branch.
    // Same discipline as ngramJaccardPairs/containmentPairs.
    val shRows = shingleRows(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Signature as k grouped mins over the exploded rows — each xxhash runs
    // once per (shingle, i), never re-inlined per lambda element.
    val sigAggs = (0 until k).map(i => min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    val banded = shRows.groupBy(col("id")).agg(sigAggs.head, sigAggs.tail: _*)
      .withColumn("sig", array((0 until k).map(i => col(s"h$i")): _*))
      .select(col("id"),
        posexplode(bandKeys(col("sig"), bands, rowsPerBand)).as(Seq("pos", "band")))
    val candidates = banded.select(col("pos"), col("band"), col("id").as("id_a"))
      .join(banded.select(col("pos"), col("band"), col("id").as("id_b")),
        Seq("pos", "band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // Exact verify WITHOUT arrays: |A∩B| counted from the posting rows
    // restricted to the LSH candidates (same narrow counting verify as
    // [[pairIntersections]]; here the candidate set is already
    // LSH-bounded, so no rare/hot split is needed). A band-collision pair
    // sharing zero shingles simply produces no count row — same outcome
    // as its former jaccard = 0.
    val sized = shRows.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    candidates
      .join(shRows.select(col("id").as("id_a"), col("s")), Seq("id_a"))
      .join(shRows.select(col("id").as("id_b"), col("s")), Seq("id_b", "s"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("m"))
      .join(sized.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sized.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("m").cast("double") /
          (col("n_a") + col("n_b") - col("m")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash of the token multiset (xxhash64 per token; per-bit
    * majority vote). ONE per-row expression eval
    * ([[graft.functions.SimHash64]]) — the relational form (explode +
    * 64-column ±1-vote aggregate) shuffled every token; this is a pure
    * narrow scan with bit-identical output. Tokenless docs are dropped
    * (the explode formulation produced no row for them). */
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // trim(text) != "" ⟺ at least one whitespace-split token — same drop
    // set as the explode formulation, without re-tokenizing per row.
    docs.filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("id"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.SimHash64(
            org.apache.spark.sql.graft.ColumnBridge.expression(col(textCol))))
          .as("simhash"))

  /** Near-dup pairs with hamming(simhash) <= maxDistance. Blocking: 8
    * chunks of 8 bits — by pigeonhole any pair within distance 7 shares an
    * exact chunk, so maxDistance ≤ 7 loses no pairs. */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDistance: Int = 5): DataFrame =
    hammingPairs64(simhash64(docs, idCol, textCol), "id", "simhash", maxDistance)

  /** Exact hamming-≤d pairs over a 64-bit sketch column via pigeonhole
    * blocking: d+1 chunks (any ≤d-distance pair agrees on SOME chunk), each
    * ⌈64/(d+1)⌉ bits wide — the WIDTH is the scale lever: fixed 8-bit
    * chunks give only 8×256 = 2048 possible buckets in total, so once the
    * corpus outgrows the key space every bucket fills and the candidate
    * join degrades quadratically (measured 48× runtime at a 10× canary on
    * the image-dedup gate). Width-scaled chunks keep buckets populated by
    * genuine near-agreement, not key-space saturation. Candidates are
    * exactly verified afterwards, so the output set is identical under any
    * chunking — blocking is pure candidate generation.
    *
    * @return (id_a, id_b, hamming ≤ maxDistance), id_a < id_b. */
  def hammingPairs64(hashed: DataFrame, idCol: String, hashCol: String,
      maxDistance: Int): DataFrame = {
    require(maxDistance >= 0 && maxDistance < 64,
      s"maxDistance out of range: $maxDistance")
    val n = maxDistance + 1
    val w = (64 + n - 1) / n
    val h = hashed.select(col(idCol).as("id"), col(hashCol).as("h"))
    val chunked = h.select(col("id"), col("h"),
      posexplode(array((0 until n).map { c =>
        val width = math.min(w, 64 - c * w)
        val mask = if (width >= 64) -1L else (1L << width) - 1L
        shiftrightunsigned(col("h"), c * w).bitwiseAND(mask)
      }: _*)).as(Seq("chunk", "key")))
    val a = chunked.select(col("chunk"), col("key"), col("id").as("id_a"), col("h").as("h_a"))
    val b = chunked.select(col("chunk"), col("key"), col("id").as("id_b"), col("h").as("h_b"))
    a.join(b, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  // ---------------------------------------------------- incremental dedup

  /** Cross-set n-gram Jaccard pairs: (id_l, id_r, jaccard) with J ≥ τ,
    * left × right only (no within-set pairs). Same prefix-filtering
    * machinery as [[ngramJaccardPairs]] — document frequencies are computed
    * over the UNION so both sides share one canonical order (the prefix
    * theorem needs a single global order to be lossless). Requires
    * UNIQUE doc ids within each side (see [[pairIntersections]]). */
  def ngramJaccardPairsAcross(left: DataFrame, right: DataFrame,
      idCol: String, textCol: String, n: Int, threshold: Double,
      hotDf: Long = HotShingleDf): DataFrame = {
    def shRows(df: DataFrame) = df
      .select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shL = shRows(left)
    val shR = shRows(right)
    // df over the UNION: both sides' prefixes derive from one global
    // (df, s) order, which the prefix theorem needs to be lossless.
    val dfreq = shL.unionAll(shR).groupBy(col("s")).agg(count(lit(1)).as("df"))
    def candidates = prefixPostings(shL, dfreq, threshold)
      .select(col("s"), col("id").as("id_a"))
      .join(prefixPostings(shR, dfreq, threshold)
        .select(col("s"), col("id").as("id_b")), Seq("s"))
      .select(col("id_a"), col("id_b")).distinct()
    // Left and right are distinct pair slots by construction, so the pair
    // predicate is vacuous (a left doc re-appearing in the corpus pairs
    // with itself, exactly as the array-verify implementation did).
    pairIntersections(shL, shR, dfreq, lit(true), hotDf, candidates)
      .join(shL.groupBy(col("id")).agg(count(lit(1)).as("n_l"))
        .withColumnRenamed("id", "id_a"), Seq("id_a"))
      .join(shR.groupBy(col("id")).agg(count(lit(1)).as("n_r"))
        .withColumnRenamed("id", "id_b"), Seq("id_b"))
      .select(col("id_a").as("id_l"), col("id_b").as("id_r"),
        (col("m").cast("double") /
          (col("n_l") + col("n_r") - col("m")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Incremental (delta) dedup: flag each NEW document against an EXISTING
    * corpus — `dup_exact` (its fingerprint already exists), `dup_near`
    * (some corpus doc has n-gram Jaccard ≥ τ), `kept` (neither). The
    * continuous-ingestion shape: the corpus is only ever read, never
    * re-deduped; within-batch duplicates are the batch operators' job.
    * Flags are independent (an exact copy is also a near-dup at J = 1). */
  def incrementalFlags(newDocs: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double): DataFrame = {
    val corpusFps = corpus
      .select(TextOps.fingerprint(col(textCol)).as("fp")).distinct()
    val exactIds = newDocs
      .select(col(idCol).as("id"), TextOps.fingerprint(col(textCol)).as("fp"))
      .join(corpusFps, Seq("fp"), "left_semi")
      .select(col("id")).withColumn("de", lit(true))
    val nearIds = ngramJaccardPairsAcross(newDocs, corpus, idCol, textCol,
      n, threshold)
      .select(col("id_l").as("id")).distinct().withColumn("dn", lit(true))
    newDocs.select(col(idCol).as("id"))
      .join(exactIds, Seq("id"), "left")
      .join(nearIds, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("de"), lit(false)).as("dup_exact"),
        coalesce(col("dn"), lit(false)).as("dup_near"),
        (!coalesce(col("de"), lit(false)) && !coalesce(col("dn"), lit(false)))
          .as("kept"))
  }

  /** [[incrementalFlags]]' exact-membership half with a BLOOM PREFILTER:
    * build a Bloom filter over the corpus fingerprints (one corpus pass,
    * tree-aggregated), broadcast it, and only ship delta rows that MIGHT be
    * members into the exact verify join. Bloom filters have no false
    * negatives, so rows the filter rejects are provably new; candidates
    * are exact-verified with a semi join, so the output equals the plain
    * semi-join answer — the filter only cuts the shuffle (at fpp = 3%,
    * the verify join reads ~|true dups| + 3% of the delta instead of the
    * whole delta).
    *
    * The filter must fit driver/executor memory: ~1.2 GB per 10^9 corpus
    * docs at 1% fpp. Beyond that, shard the corpus and run one pass per
    * shard, or fall back to the plain semi join — the output contract is
    * identical. The probe is a Scala closure over the broadcast sketch
    * (Spark's Bloom probe expression is not public API); it is one hash
    * per row on the delta side only, off every corpus-sized path.
    *
    * Output: (id, is_dup) for every delta row. */
  def bloomMemberFlags(newDocs: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, expectedItems: Long, fpp: Double): DataFrame = {
    // The corpus fingerprint set feeds BOTH the bloom build (an eager
    // aggregate — the sketch must exist before the probe can be planned)
    // and the exact verify join; persist so the corpus is scanned once.
    val corpusFps = corpus
      .select(TextOps.fingerprint(col(textCol)).as("fp")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bloom = corpusFps.stat.bloomFilter("fp", expectedItems, fpp)
    val bc = newDocs.sparkSession.sparkContext.broadcast(bloom)
    // Null-safe: a null text yields a null fingerprint, which the exact
    // semi join would simply never match — mirror that as "not a member"
    // instead of letting the sketch probe NPE.
    val mightContain = udf((fp: String) =>
      fp != null && bc.value.mightContainString(fp))
    val delta = newDocs
      .select(col(idCol).as("id"), TextOps.fingerprint(col(textCol)).as("fp"))
    val confirmed = delta.filter(mightContain(col("fp")))
      .join(corpusFps, Seq("fp"), "left_semi")
      .select(col("id")).withColumn("hit", lit(true))
    delta.select(col("id"))
      .join(confirmed, Seq("id"), "left")
      .select(col("id"), coalesce(col("hit"), lit(false)).as("is_dup"))
  }

  // -------------------------------------------------- cluster resolution

  /** Connected components over an undirected pair graph — the cluster
    * resolution step after any near-dup pass: pairwise matches (A,B),(B,C)
    * must collapse to ONE surviving document even when (A,C) was never
    * scored. Returns (id, component) with component = min id reachable.
    *
    * Two regimes: small pair graphs collapse on the driver with exact
    * union-find; large ones run alternating large-star / small-star
    * contraction (Kiveris et al., SoCC '14) — provably O(log² n) rounds
    * for ANY id layout, each round node-keyed joins + aggregates, all
    * keyed shuffles (the GraphFrames/Pregel shape without the
    * dependency). Frames are persisted per round and released as soon as
    * the next is materialized, so lineage never grows unboundedly. Fails
    * loudly past `maxIters` rather than returning an unconverged
    * labeling. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 25,
      localEdgeThreshold: Long = graft.ops.Graph.LocalEdgeThreshold): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = pairs.select(col(aCol).as("s"), col(bCol).as("d"))
      .unionAll(pairs.select(col(bCol).as("s"), col(aCol).as("d")))
      .persist(MEMORY_AND_DISK)
    // Two regimes: a near-dup pair graph is usually MUCH smaller than the
    // corpus that produced it (pairs ≪ docs). Below the threshold, collect
    // the edge list and run exact union-find on the driver — one job,
    // none of the per-round scheduling overhead that dominates tiny
    // graphs (measured ~0.5 s/round for a 477-node graph). Above it, the
    // distributed min-label loop below handles graphs of any size. Both
    // paths produce the identical min-id labeling (asserted in OpsSpec).
    // The local regime requires LONG ids (its output schema is long);
    // other id types always take the distributed path, which preserves
    // the input type.
    val idsAreLong = pairs.schema(aCol).dataType ==
      org.apache.spark.sql.types.LongType &&
      pairs.schema(bCol).dataType == org.apache.spark.sql.types.LongType
    val nEdges = edges.count()
    if (idsAreLong && nEdges <= localEdgeThreshold) {
      val spark = pairs.sparkSession
      // collect from the ALREADY-MATERIALIZED edge cache (collecting from
      // `pairs` would re-run the whole upstream pair pipeline); duplicate
      // and reversed edges are harmless to union-find.
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist()
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        // union by MIN root so the final label is the component min id
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val rows = parent.keys.toArray.sorted.map(id => Row(id, find(id))).toSeq
      import scala.jdk.CollectionConverters._
      return spark.createDataFrame(rows.asJava, StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("component", LongType, nullable = false))))
    }
    // Distributed regime: alternating LARGE-STAR / SMALL-STAR contraction
    // (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected
    // Components in MapReduce and Beyond", SoCC '14), replacing the r14
    // witness-doubling loop. That loop's round bound was logarithmic only
    // when ids increase monotonically along paths: its witness pointer
    // update p'(v) = p(p(v)) FREEZES at every local id minimum m (the
    // init p(m) = min(N(m) ∪ {m}) = m is a fixpoint of doubling), after
    // which label flow through m reverts to one hop per round — a
    // shuffled-id chain is diameter-bound again and hard-fails maxIters
    // (r15 advisor catch; the shuffled/sawtooth chain specs in OpsSpec
    // reproduce it against the old loop). Star contraction carries no id
    // assumption at all:
    //   large-star(u): link every STRICTLY LARGER neighbor of u to
    //     m(u) = min(N(u) ∪ {u});
    //   small-star(u): orient edges larger→smaller, then link u and its
    //     (all smaller) neighbors to m(u).
    // Both operations re-attach nodes strictly within u's own component,
    // so connectivity is preserved exactly; their alternation converges
    // to the unique common fixpoint — a forest of stars rooted at each
    // component's minimum id — in O(log² n) rounds for ANY id layout
    // (Theorem 1 of the paper; single-digit rounds measured on every
    // gate fixture). Each round is node-keyed groupBy + same-key join +
    // distinct — no windows, no driver data. Convergence is detected
    // EXACTLY, not by checksum: edge sets are distinct() and canonically
    // (larger → smaller)-oriented after small-star, so equal counts plus
    // an empty except() is set equality. Per-round rerootEager (shared
    // with the SCC loop) truncates lineage and keeps the plan
    // stats-free; the RDD behind every round is registered with
    // Memo.ownedRdd, so harness loops reclaim the final round's blocks
    // too (the pre-r15 code leaked one materialized RDD per invocation).
    val spark = pairs.sparkSession
    // All nodes, captured BEFORE contraction (star rounds keep every
    // node in the edge list until fixpoint, but the label join below
    // must also cover nodes whose only pair was a self-pair).
    val nodes = edges.select(col("s").as("id")).distinct()
      .persist(MEMORY_AND_DISK)
    nodes.count()
    // large-star: symmetrize, take per-node min over N(u) ∪ {u}, and
    // re-attach each larger neighbor to it. m ≤ u < v, so the output is
    // canonically (larger → smaller) and self-loop-free. NOT distinct'd:
    // small-star's min-aggregate and final distinct absorb duplicate
    // edges at set-identical output (multiset input changes neither the
    // per-node min nor the emitted SET), and dropping the exchange here
    // saves one full shuffle per round.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("d").as("s"), col("s").as("d")))
      val mins = sym.groupBy(col("s")).agg(min(col("d")).as("mn"))
        .select(col("s"), least(col("s"), col("mn")).as("m"))
      sym.join(mins, Seq("s"))
        .filter(col("d") > col("s"))
        .select(col("d").as("s"), col("m").as("d"))
    }
    // small-star: edges arrive (larger → smaller); per node u the min
    // neighbor m = min(N(u)) < u, attach u and every other (smaller)
    // neighbor to m. Output stays (larger → smaller).
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("s")).agg(min(col("d")).as("m"))
      e.join(mins, Seq("s"))
        .filter(col("d") =!= col("m"))
        .select(col("d").as("s"), col("m").as("d"))
        .unionAll(mins.select(col("s"), col("m").as("d")))
        .distinct()
    }
    // Canonical initial edge set, read from the ALREADY-MATERIALIZED
    // symmetric cache (deriving from `pairs` would re-run the whole
    // upstream pair pipeline a third time).
    var (state, sRdd) = graft.ops.Graph.rerootEager(spark,
      edges.select(
        greatest(col("s"), col("d")).as("s"),
        least(col("s"), col("d")).as("d"))
        .filter(col("s") =!= col("d")).distinct())
    edges.unpersist()
    var prevCount = state.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // NOTE: the predecessor is NOT handed to rerootEager for release —
      // the convergence check below still reads it; it is unpersisted
      // manually once the check is done.
      val (next, nRdd) = graft.ops.Graph.rerootEager(spark,
        smallStar(largeStar(state)))
      val nextCount = next.count()
      // equal cardinality + empty difference ⟺ identical edge SETS
      // (both sides are distinct()); only then is the star forest the
      // fixpoint of both operations.
      converged = nextCount == prevCount &&
        state.except(next).isEmpty
      sRdd.unpersist(blocking = false)
      state = next; sRdd = nRdd
      prevCount = nextCount
      iter += 1
      if (sys.env.contains("SPARK_GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] star round $iter edges=$nextCount converged=$converged")
    }
    if (!converged) {
      nodes.unpersist(); sRdd.unpersist(blocking = false)
    }
    require(converged,
      s"connectedComponents did not converge within $maxIters rounds")
    // Fixpoint: every non-root is a direct child of its component min.
    // `state` is backed by the final round's localCheckpoint RDD, which
    // rerootEager registered with Memo.ownedRdd — harness loops reclaim
    // it after the gate's action (the pre-r15 loop leaked it until
    // ContextCleaner GC). `nodes` stays persisted only until this plan's
    // first action; hand it to the owned registry the same way.
    graft.core.Memo.ownedTrack(nodes)
    nodes
      .join(state.select(col("s").as("id"), col("d").as("root")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("component"))
  }

  /** Collapse a near-duplicate pair graph to one REPRESENTATIVE per
    * cluster — the prune step of semantic dedup (SemDeDup-style: generate
    * similarity pairs however you like — [[minhashNearDupPairs]],
    * [[ngramJaccardPairs]], [[Ann.cosineNearDupPairs]] — then keep one
    * member per connected component). The representative is the minimum
    * id (the [[connectedComponents]] label), records in no pair survive
    * untouched, so output = `records` minus non-representative cluster
    * members. One anti join against the (pairs-sized, corpus-small)
    * component labeling. */
  def pruneToRepresentatives(records: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val drop = connectedComponents(pairs, aCol, bCol)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    records.join(drop, Seq(idCol), "left_anti")
  }

  // -------------------------------------------------------- n-gram Jaccard

  /** df at or below which a shingle counts as RARE for
    * [[pairIntersections]]' direct co-occurrence regime. Rare-side work is
    * Σ_{df≤D} df² ≤ D · (total postings) — LINEAR in corpus size at fixed
    * D; everything hotter (boilerplate grams) is counted only for
    * prefix-filtered candidate pairs. The eager max(df) probe that picks
    * the regime is the same two-regime discipline as
    * [[Graph.LocalEdgeThreshold]]. */
  private[graft] val HotShingleDf: Long = 256L

  /** df-ordered prefix postings `(s, id)`: each doc's rarest
    * `n_sh − ⌈τ·n_sh⌉ + 1` shingles under the GLOBAL (df, s) order —
    * window ranks over posting rows, never per-doc arrays. Rare-first
    * ordering keeps hot shingles out of the probe stream, which is what
    * bounds candidate fan-out on skewed corpora; any consistent global
    * order would be correct. */
  private def prefixPostings(sh: DataFrame, dfreq: DataFrame,
      threshold: Double): DataFrame = {
    val wOrd = Window.partitionBy(col("id")).orderBy(col("df"), col("s"))
    val wAll = Window.partitionBy(col("id"))
    sh.join(dfreq, Seq("s"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n_sh", count(lit(1)).over(wAll))
      .filter(col("rn") <=
        (col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1).cast("int"))
      .select(col("s"), col("id"))
  }

  /** Exact per-pair shingle-intersection counts `(id_a, id_b, m)` — the
    * shared verify core of [[ngramJaccardPairs]],
    * [[ngramJaccardPairsAcross]] and [[containmentPairs]].
    *
    * PRECONDITION (all counting-verify entry points, incl.
    * [[minhashNearDupPairs]]): doc ids are UNIQUE in the input. The
    * counts are derived from (id, shingle) posting rows, so two input
    * rows sharing an id contribute duplicate postings that inflate both
    * `m` (join multiplicity) and `n_sh` — unlike the old array verify,
    * whose collect_list + array_intersect set semantics silently merged
    * duplicate-id rows. Callers with non-unique ids must pre-dedupe
    * (`.dropDuplicates(idCol)` or a distinct on (id, s)). Every gate
    * fixture satisfies this (doc_id is the documents table's key).
    *
    * NO shingle arrays are materialized or shuffled: `m = |A∩B|` is COUNTED from the
    * inverted index (posting ⋈ posting on the shingle, then one keyed
    * count), so every row in flight is a fixed-width (id, id[, s]) tuple.
    * The previous array-verify (ship both docs' full shingle arrays to
    * every candidate pair, `array_intersect` per row) sorted ~1.3 KB×2
    * payloads per candidate through two shuffle joins and hit a uniform
    * spill cliff at the 100× canary (605 s wall, two 32-task monster
    * stages — SCALE.md §"100× scale canary"); counting from the index is
    * the same answer with ~50× less shuffle byte volume.
    *
    * Two regimes, split PER SHINGLE at df ≤ `hotDf`:
    *  - RARE shingles co-occur-count directly: join volume
    *    Σ_{df≤hotDf} df² ≤ hotDf·P — linear in total postings P, no
    *    candidate set needed.
    *  - HOT shingles (boilerplate at real-corpus scale) would make Σ df²
    *    quadratic, so their contributions are counted only for the
    *    caller's prefix-filtered `candidates` pairs.
    * Exactness at the caller's threshold τ: any pair truly at/above τ
    * shares a shingle in the probe prefix (pigeonhole), so it IS a
    * candidate and its `m = m_rare + m_hot` is complete; a non-candidate
    * pair can only be UNDER-counted (its hot part dropped), its measured
    * score only falls, and the prefix theorem already guarantees its true
    * score is < τ — the ≥ τ filter can never falsely admit or lose a
    * pair. When max(df) ≤ hotDf (checked with one aggregate on `dfreq`)
    * the candidate machinery is never built at all: the whole plan is
    * scan → co-occur join → count. */
  private def pairIntersections(shA: DataFrame, shB: DataFrame,
      dfreq: DataFrame, pairPred: Column, hotDf: Long,
      candidates: => DataFrame): DataFrame = {
    val maxDf = Option(dfreq.agg(max(col("df"))).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    def post(sh: DataFrame, as: String) = sh.select(col("id").as(as), col("s"))
    if (maxDf <= hotDf) {
      post(shA, "id_a").join(post(shB, "id_b"), Seq("s"))
        .filter(pairPred)
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("m"))
    } else {
      val hotS = dfreq.filter(col("df") > hotDf).select(col("s"))
      val interR = post(shA.join(hotS, Seq("s"), "left_anti"), "id_a")
        .join(post(shB.join(hotS, Seq("s"), "left_anti"), "id_b"), Seq("s"))
        .filter(pairPred)
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("mr"))
      val interH = candidates
        .join(post(shA.join(hotS, Seq("s"), "left_semi"), "id_a"), Seq("id_a"))
        .join(post(shB.join(hotS, Seq("s"), "left_semi"), "id_b"),
          Seq("id_b", "s"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("mh"))
      interR.join(interH, Seq("id_a", "id_b"), "full_outer")
        .select(col("id_a"), col("id_b"),
          (coalesce(col("mr"), lit(0L)) + coalesce(col("mh"), lit(0L))).as("m"))
    }
  }

  /** Exact n-gram Jaccard pairs at `threshold` via PREFIX FILTERING over an
    * inverted index (Chaudhuri/Xiao-style) with an index-side COUNTING
    * verify ([[pairIntersections]]): J = m / (n_a + n_b − m) from the
    * intersection count and the two set sizes — no shingle arrays anywhere.
    * Output is IDENTICAL to a naive all-pairs scan at any τ > 0.
    * Requires UNIQUE doc ids (see [[pairIntersections]]). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, hotDf: Long = HotShingleDf): DataFrame = {
    // PERSISTED: the posting rows are referenced by dfreq, the sizes, the
    // co-occurrence join (both sides) and, on hot corpora, the prefix
    // probes. Unpersisted, each reference re-runs tokenize+shingle — and
    // when the input is itself an expensive pipeline (Curation:
    // langid+quality+semi-join), the whole upstream re-runs too.
    // MEMORY_AND_DISK spills rather than recomputes at scale; the cache is
    // intentionally left registered after return (the result frame still
    // references it) — Spark's LRU evicts under pressure, and callers
    // needing deterministic release can spark.catalog.clearCache().
    val sh = shingleRows(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val sized = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    def candidates = {
      val pre = prefixPostings(sh, dfreq, threshold)
      pre.select(col("s"), col("id").as("id_a"))
        .join(pre.select(col("s"), col("id").as("id_b")), Seq("s"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
    }
    pairIntersections(sh, sh, dfreq, col("id_a") < col("id_b"), hotDf,
        candidates)
      .join(sized.select(col("id").as("id_a"), col("n_sh").as("n_a")),
        Seq("id_a"))
      .join(sized.select(col("id").as("id_b"), col("n_sh").as("n_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("m").cast("double") /
          (col("n_a") + col("n_b") - col("m")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Asymmetric CONTAINMENT near-dup pairs: emit (a, b) when
    * `|A∩B| / |A| ≥ τ` over n-gram shingle sets — the subset/quote
    * detector Jaccard misses (a tweet quoted inside an article scores
    * J ≈ |A|/|B| ≈ 0 but containment 1.0; the standard asymmetric
    * criterion of containment-join literature, e.g. Agrawal et al.'s
    * set-containment joins).
    *
    * Prefix filtering adapts to asymmetry: only the PROBE side (a)
    * prunes to its rarest `|A| − ⌈τ|A|⌉ + 1` shingles (pigeonhole: ≥
    * ⌈τ|A|⌉ shared shingles cannot all hide in the ⌈τ|A|⌉−1 suffix),
    * while the index side (b) must stay FULL — B's matching shingles may
    * be its hottest. The verify COUNTS `|A∩B|` from the inverted index
    * ([[pairIntersections]]) — containment = m / n_a, no arrays shipped.
    * Output is provably identical to the all-pairs containment scan.
    *
    * Requires UNIQUE doc ids (see [[pairIntersections]]).
    * @return (id_a, id_b, containment): a ≠ b, containment = |A∩B|/|A|
    *         rounded to 6dp, ≥ τ after rounding. BOTH directions can
    *         emit for mutually-similar pairs. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, hotDf: Long = HotShingleDf): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containment threshold out of (0,1]: $threshold")
    val sh = shingleRows(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val sized = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    def candidates = prefixPostings(sh, dfreq, threshold)
      .select(col("s"), col("id").as("id_a"))
      .join(sh.select(col("s"), col("id").as("id_b")), Seq("s"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    pairIntersections(sh, sh, dfreq, col("id_a") =!= col("id_b"), hotDf,
        candidates)
      .join(sized.select(col("id").as("id_a"), col("n_sh")), Seq("id_a"))
      .select(col("id_a"), col("id_b"),
        round(col("m").cast("double") / col("n_sh").cast("double"), 6)
          .as("containment"))
      .filter(col("containment") >= threshold)
  }

  // ------------------------------------------------- winnowing fingerprints

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS algorithm): hash every positional token k-gram, slide a
    * w-hash window, keep each window's MINIMUM hash; the distinct kept
    * hashes are the document's fingerprint set. Winnowing's guarantee:
    * any shared token run of length ≥ k + w − 1 yields at least one
    * SHARED fingerprint, at expected density 2/(w+1) — local-minima
    * selection is position-robust, unlike fixed-stride sampling which a
    * one-token insertion desynchronizes.
    *
    * Whole selection runs INSIDE the token array (positional grams →
    * hashes → window minima as nested transforms): one narrow projection
    * per document, zero shuffles before the fingerprint explode. The
    * 60-bit hash is the md5 prefix (`conv(substr(md5(g),1,15),16,10)`) —
    * chosen over xxhash64 because every SQL engine can recompute it, so
    * the oracle mirrors the pipeline bit-for-bit.
    *
    * @return (id, fp) rows, fp ∈ the doc's distinct winnowed hash set;
    *         docs with fewer than k tokens emit nothing. */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 2 && k <= 16, s"gram size k out of range (2..16): $k")
    require(w >= 2 && w <= 64, s"window w out of range (2..64): $w")
    val base = docs
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= k)
      .withColumn("__m", (size(col("__t")) - (k - 1)).cast("int"))
    val grams = transform(sequence(lit(0), col("__m") - 1),
      i => array_join(slice(col("__t"), i + 1, lit(k)), " "))
    val hashes = transform(grams,
      g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"))
    // windows j = 0 .. max(1, m−w+1)−1; a doc with fewer grams than the
    // window gets ONE window over everything (slice truncates)
    val sel = transform(
      sequence(lit(0), greatest(lit(1), col("__m") - (w - 1)) - 1),
      j => array_min(slice(col("__h"), j + 1, lit(w))))
    base.withColumn("__h", hashes)
      .select(col("id"), explode(array_distinct(sel)).as("fp"))
  }

  /** Near-dup pairs by shared winnowed fingerprints: (a, b, n_shared)
    * for pairs sharing ≥ `minShared` fingerprints — the MOSS match
    * report. One fingerprint-keyed self-join + one pair aggregate; at
    * density 2/(w+1) the shuffled stream is a small fraction of the
    * token stream. Boilerplate-grade fingerprints (shared across
    * thousands of docs) are the skew risk at corpus scale — the standard
    * remedy is dropping top-document-frequency fingerprints before the
    * join (they carry no discrimination), which callers do by filtering
    * on a df aggregate of [[winnowFingerprints]]' output. */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Int): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val fps = winnowFingerprints(docs, idCol, textCol, k, w)
    fps.select(col("fp"), col("id").as("id_a"))
      .join(fps.select(col("fp"), col("id").as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // --------------------------------------------- duplicated substring spans

  /** Span-level exact substring duplication (the substring-dedup criterion of
    * Lee et al., "Deduplicating Training Data Makes Language Models Better":
    * any token n-gram occurring more than once in the corpus — across docs or
    * within one — marks its covered tokens as duplicated). Returns one row
    * per MAXIMAL duplicated token run per document:
    * `(doc_id, span_start, span_end, span_tokens)`, positions 0-based
    * inclusive; overlapping and touching gram intervals are island-merged.
    *
    * Plan shape at scale: positional gram generation is a narrow per-document
    * projection; grams travel the shuffle as i64 xxhash64 values only (never
    * gram text — a 2^-64-per-pair collision risk, accepted); the occurrence
    * count is a map-side-combinable hash aggregate keyed by the gram hash;
    * surviving positions island-merge under a per-document window whose state
    * is bounded by hits-per-doc. Nothing quadratic, no driver action. */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"gram length must be >= 1, got $n")
    // `t` is materialized as an attribute first so the transform lambda below
    // re-evaluates a column reference per element, not the tokenizer chain
    // (the measured higher-order-function pitfall recorded in BASELINE.md).
    val toks = docs.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("t"))
    val grams = toks.select(col("id"),
      posexplode(
        when(size(col("t")) >= n,
          transform(sequence(lit(0), size(col("t")) - n),
            p => xxhash64(concat_ws(" ", slice(col("t"), p + 1, lit(n))))))
          .otherwise(lit(Array.empty[Long]))).as(Seq("pos", "g")))
    val dupGrams = grams.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1).select(col("g"))
    val hits = grams.join(dupGrams, Seq("g"))
      .select(col("id"), col("pos").cast("long").as("s"),
        (col("pos") + lit(n - 1)).cast("long").as("e"))
    val prev = Window.partitionBy(col("id")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(col("id")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    hits
      .withColumn("pmax", max(col("e")).over(prev))
      .withColumn("brk",
        when(col("pmax").isNull || col("s") > col("pmax") + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(run))
      .groupBy(col("id"), col("island"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
      .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Cross-source duplicate-leakage matrix: attribute a duplicate-pair
    * set (from ANY of the pair generators — exact, MinHash, n-gram,
    * embedding) to the source pairs it spans. The mixing diagnostic a
    * multi-source corpus needs before weighting: a hot off-diagonal cell
    * says source B is largely a re-crawl of source A (down-weight or
    * drop), a hot diagonal cell says the source self-duplicates.
    *
    * Two id-keyed joins of the (small) pair set against the (id, source)
    * map, then one tiny aggregate; the matrix is at most |sources|²
    * rows. Cells are unordered (source_a ≤ source_b lexically), so A→B
    * and B→A leakage land in one cell.
    *
    * @param pairs (id_a, id_b, ...) qualifying duplicate pairs.
    * @return (source_a, source_b, n_pairs), only non-empty cells. */
  def crossSourceMatrix(pairs: DataFrame, docs: DataFrame, idCol: String,
      sourceCol: String): DataFrame = {
    val src = docs.select(col(idCol).as("__id"), col(sourceCol).as("__src"))
    pairs
      .join(src.select(col("__id").as("id_a"), col("__src").as("__sa")),
        Seq("id_a"))
      .join(src.select(col("__id").as("id_b"), col("__src").as("__sb")),
        Seq("id_b"))
      .select(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }
}
