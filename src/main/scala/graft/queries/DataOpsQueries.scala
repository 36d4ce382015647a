package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.table
import graft.ops.{Ann, Dedup, Multimodal, TextOps}

/** Training-data pipeline operators over `documents` / `embeddings`:
  * dedup family, similarity search, text analysis, multimodal plumbing.
  * SQL-expressible ops get DuckDB oracles — including the SRP-LSH top-k,
  * whose ±1 plane literals are deterministic and embedded verbatim in its
  * oracle; only ops built on hashes DuckDB cannot reproduce (MinHash /
  * SimHash xxhash64 signatures, murmur3 Count-Min) or data-dependent
  * driver state (IVF centroids) stay rows-only + recall/containment specs
  * in OpsSpec.
  */
object DataOpsQueries {

  def family: QueryFamily = QueryFamily("dataops", queries, oracles)

  /** n-gram near-dup pair table (n=3, τ=0.8) — the shared upstream of
    * FOUR gates (ngram_pairs, source_matrix, components, cluster_sizes).
    * Persisted + memoized per (session, dir) via [[graft.core.Memo]]
    * like the graph family's edge caches: the prefix-filtered pair
    * pipeline is ~10 stages, so each extra consumer otherwise replays
    * the whole derivation. */
  /** Embedding covariance sufficient statistics — shared upstream of
    * embed_covariance and embed_top_eigvec: the identical corpus-scale
    * quantized outer-product aggregate would otherwise run twice per
    * bench (r12 verdict item 4). The result is only the 2080
    * upper-triangle cells, so the cache is tiny; the saving is the
    * corpus pass. */
  private def covStats(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached("dataops.covStats", s, dir) {
      Ann.covarianceStats(table(s, dir, "embeddings"), "embedding")
    }

  /** The ANN gates' bounded query set: the vectors with `vec_id < n`.
    * vec_id is unique, so the filter yields at most n rows — the
    * trailing `limit(n)` never drops data; it makes the bound VISIBLE
    * to the physical plan (and PlanLint's structural classifier), so
    * the broadcast build side of the brute/ADC scorers is provably a
    * program constant rather than fixture luck. */
  private def annQuerySet(emb: DataFrame, n: Int): DataFrame =
    emb.filter(col("vec_id") < n).limit(n)

  private def ngramPairs(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached("dataops.ngramPairs", s, dir) {
      Dedup.ngramJaccardPairs(table(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.8)
    }

  /** Connected components over [[ngramPairs]] — FOUR consumers
    * (components, cluster_sizes, survivors, sample_cluster_split) each
    * re-ran the iterative min-label propagation before this memo; the
    * component map is id-scale narrow (two longs) and every consumer is
    * a cheap aggregate or keyed join over it. */
  private def ngramComponents(s: SparkSession, dir: String): DataFrame = {
    val pairs = ngramPairs(s, dir)
    graft.core.Memo.cached("dataops.ngramComponents", s, dir) {
      Dedup.connectedComponents(pairs, "id_a", "id_b")
    }
  }

  /** Shared curation stages 1-3 (features → filters → exact dedup) and
    * 4a (near-dup pairs) for the TWO composed curation gates — greedy
    * (curate_corpus) and transitive (curate_corpus_cc) differ only in
    * the final removal rule, so the feature scan, the fingerprint
    * groupBy and the ~10-stage pair derivation are paid once per bench.
    * The pairs memo resolves its afterExact dependency BEFORE entering
    * its own build (the [[graft.core.Memo]] re-entrancy contract). */
  private def curationAfterExact(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached("dataops.curationAfterExact", s, dir) {
      graft.ops.Curation.afterExactStage(
        table(s, dir, "documents"), "doc_id", "text")
    }

  private def curationPairs(s: SparkSession, dir: String): DataFrame = {
    val afterExact = curationAfterExact(s, dir)
    graft.core.Memo.cached("dataops.curationPairs", s, dir) {
      graft.ops.Curation.nearDupPairs(afterExact)
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dedup_exact_docs" -> ((s, dir) =>
      Dedup.exactGroups(table(s, dir, "documents"), "doc_id", "text")),

    // Streaming exact dedup through a REAL file stream: the documents
    // fixture fed to flatMapGroupsWithState keep-first; with one initial
    // batch the surviving representative is the batch operator's min-id,
    // so the exact-group oracle applies verbatim. State = one boolean per
    // distinct fingerprint (the online twin of dedup_exact_docs).
    "streaming_dedup" -> ((s, dir) => {
      import graft.streaming.StreamDedup
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val feedDir = graft.streaming.StreamScratch.feedDir(
        "graft-stream-dedup-" + new java.io.File(dir).getName)
      docs.write.mode("overwrite").parquet(feedDir)
      import s.implicits._
      val stream = s.readStream.schema(docs.schema).parquet(feedDir)
        .as[StreamDedup.Doc]
      graft.streaming.StreamTuning.withShufflePartitions(s,
        graft.streaming.StreamTuning.GateStatePartitions) {
        val q = StreamDedup.keepFirst(s, stream)
          .writeStream.outputMode("append").format("memory")
          .option("checkpointLocation",
            graft.streaming.StreamScratch.freshCheckpoint("gate_stream_dedup"))
          .queryName("gate_stream_dedup").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table("gate_stream_dedup").select(col("doc_id"), col("fingerprint"))
    }),

    // Which sources leak into which: the n-gram near-dup pairs rolled up
    // to an unordered source×source matrix — the pre-mixing diagnostic
    // (hot off-diagonal cell = one source re-crawls another).
    "dedup_source_matrix" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      graft.ops.Dedup.crossSourceMatrix(
        ngramPairs(s, dir), docs, "doc_id", "source")
    }),

    "dedup_ngram_pairs" -> ((s, dir) => ngramPairs(s, dir)),

    // ROUGE-2 overlap audit of the near-dup pair table (fifth consumer of
    // the memoized pair cache): clipped-multiset bigram P/R/F1 per pair —
    // the human-auditable "how much does b actually quote a" report
    // attached to near-dup survivors. Gram rows are semi-join-restricted
    // to paired docs, all joins keyed on (pair id, gram).
    "eval_rouge_pairs" -> ((s, dir) =>
      graft.ops.Eval.rougeBigramOverlap(ngramPairs(s, dir),
        table(s, dir, "documents"), "doc_id", "text")),

    // BLEU-2 audit of the same near-dup pair table (directional: a =
    // reference, b = candidate) — the generation-eval companion to
    // eval_rouge_pairs: clipped 1/2-gram precisions, brevity penalty,
    // BP·√(p₁p₂). Same memoized pair cache, same gram machinery.
    "eval_bleu_pairs" -> ((s, dir) =>
      graft.ops.Eval.bleuPair(ngramPairs(s, dir),
        table(s, dir, "documents"), "doc_id", "text")),

    // Per-document n-gram novelty (memorization-risk profile): fraction
    // of a doc's distinct 3-gram shingles found in no other document —
    // two keyed hash aggregates over the inverted shingle index, no
    // pairwise join anywhere.
    "text_ngram_novelty" -> ((s, dir) =>
      Dedup.ngramNoveltyScores(table(s, dir, "documents"), "doc_id", "text")),

    "dedup_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashNearDupPairs(table(s, dir, "documents"), "doc_id", "text",
        n = 3, k = 12, bands = 4, threshold = 0.8)),

    // MinHash estimator calibration (sixth consumer of the memoized pair
    // cache): for every exact near-dup pair, the k=16 signature-agreement
    // estimate m/k against the true shingle Jaccard — the report that
    // justifies the production signature width. This gate's signatures use
    // the DIALECT-NEUTRAL md5 hash family (hex-prefix cast, the
    // sample_balanced_classes device) so the estimator itself is
    // oracle-exact; the production path keeps xxhash64 for speed, and the
    // estimator error distribution is hash-family-agnostic (k-min of a
    // uniform permutation). Signatures are built ONLY for paired docs
    // (semi-join-restricted), 16 min-aggregates over the shingle rows.
    "dedup_minhash_calibration" -> ((s, dir) => {
      val K = 16
      val pairs = ngramPairs(s, dir)
      val ids = pairs.select(col("id_a").as("doc_id"))
        .union(pairs.select(col("id_b").as("doc_id"))).distinct()
      val sh = table(s, dir, "documents").join(ids, "doc_id")
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("s"))
      val sigAggs = (0 until K).map(i => min(expr(
        s"CAST(conv(substr(md5(concat('$i:', s)), 1, 15), 16, 10) AS BIGINT)"))
        .as(s"h$i"))
      val sigs = sh.groupBy(col("doc_id")).agg(sigAggs.head, sigAggs.tail: _*)
      def side(p: String, idName: String) = sigs.select(
        col("doc_id").as(idName) +:
          (0 until K).map(i => col(s"h$i").as(s"${p}_h$i")): _*)
      val matches = (0 until K).map(i =>
        when(col(s"a_h$i") === col(s"b_h$i"), 1).otherwise(0))
        .reduce(_ + _)
      pairs.join(side("a", "id_a"), "id_a").join(side("b", "id_b"), "id_b")
        .select(col("id_a"), col("id_b"), col("jaccard"),
          (matches.cast("double") / K).as("est_jaccard"))
        .withColumn("abs_err",
          round(abs(col("est_jaccard") - col("jaccard")), 6))
    }),

    // Incremental (delta) dedup: the doc_id % 5 == 0 slice plays the NEW
    // batch, the rest the existing corpus — plus planted exact twins
    // (id + 1e6, same text) of every 15th doc so dup_exact actually fires.
    // Flags each new doc: fingerprint already in corpus / near-dup of a
    // corpus doc (cross-set prefix-filtered Jaccard) / kept.
    "dedup_incremental" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val newB = docs.filter(col("doc_id") % 5 === 0)
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        .unionAll(docs.filter(col("doc_id") % 15 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
      Dedup.incrementalFlags(newB, corpus, "doc_id", "text",
        n = 3, threshold = 0.8)
    }),

    // Cluster resolution over the near-dup pair graph: min-label
    // propagation (iterative joins) vs a recursive-CTE oracle — pairwise
    // matches must collapse transitively even for pairs never scored.
    "dedup_components" -> ((s, dir) =>
      ngramComponents(s, dir)),

    // Duplicate-cluster size distribution — the release-report histogram
    // ("how much of the corpus sits in 2-doc vs 50-doc near-dup
    // clusters"): component sizes from the oracle-checked clustering,
    // collapsed twice (per component, then per size). Two tiny
    // aggregates over the component map.
    "dedup_cluster_sizes" -> ((s, dir) =>
      ngramComponents(s, dir)
        .groupBy(col("component")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))),

    // Survivor selection — the decision the dedup pass exists to make:
    // per near-dup cluster keep ONE canonical doc (longest, ties to the
    // lowest id); docs in no cluster keep themselves. One argmax
    // min-struct aggregate over the component map joined back by
    // component — no ranking window, scales as two keyed exchanges over
    // the (small) component table plus a doc-keyed left join.
    "dedup_survivors" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      val comp = ngramComponents(s, dir)
      val labeled = docs
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"),
          col("n_chars"))
      val best = labeled.groupBy(col("component"))
        .agg(max(struct(col("n_chars"), (-col("doc_id")).as("nid"))).as("b"))
        .select(col("component"), (-col("b.nid")).as("__best"))
      labeled.join(best, Seq("component"))
        .select(col("doc_id"), col("component"),
          (col("doc_id") === col("__best")).as("keep"))
    }),

    // Asymmetric containment pairs on a corpus with PLANTED fragments:
    // every 20th doc's first 30 tokens reappear as a new doc (id + 2e6)
    // — a fragment is ~fully contained in its source (containment 1.0)
    // while its Jaccard can sit far below any symmetric threshold. The
    // quote/subset detector of the dedup family.
    "dedup_containment_pairs" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + lit(2000000L)).as("doc_id"),
          array_join(slice(TextOps.tokens(col("text")), 1, 30), " ").as("text"))
      Dedup.containmentPairs(docs.unionAll(planted), "doc_id", "text",
        n = 3, threshold = 0.8)
    }),

    // Near-dup-aware train/eval split — the leakage-safe split: hashing
    // raw doc ids can strand one near-dup twin in train and one in eval
    // (the classic contamination bug); splitting by COMPONENT id sends
    // whole clusters to one side by construction. The split hash is the
    // md5 60-bit prefix of the component id, so the oracle replays it
    // exactly; ~80/20 in expectation.
    "sample_cluster_split" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"))
      val comp = ngramComponents(s, dir)
      docs.join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
        .withColumn("split",
          when(conv(substring(md5(col("component").cast("string")), 1, 15),
            16, 10).cast("long") % 10 < 8, lit("train"))
            .otherwise(lit("eval")))
    }),

    // Winnowed-fingerprint near-dup pairs (MOSS) on the same
    // planted-fragment corpus: a 30-token fragment shares its source's
    // early window minima, so the pair surfaces with n_shared ≥ 2 while
    // total fingerprint volume stays at ~2/(w+1) of the gram stream.
    // The md5-prefix hash is recomputed verbatim by the oracle.
    "dedup_winnow_pairs" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + lit(2000000L)).as("doc_id"),
          array_join(slice(TextOps.tokens(col("text")), 1, 30), " ").as("text"))
      Dedup.winnowPairs(docs.unionAll(planted), "doc_id", "text",
        k = 4, w = 8, minShared = 2)
    }),

    // ORACLE-CHECKED since r12: the token hash is Spark's xxhash64
    // (seed 42), which the oracle re-implements for the fixture's short
    // ASCII tokens as exact HUGEINT arithmetic (SqlXxHash64, loud guard
    // on the ≤8-byte/ASCII precondition) — hashes, ±1 bit votes, packed
    // sketches and the hamming ≤ 5 pair set all re-derived bit-exact.
    // OpsSpec additionally pins bit-equality to the 64-vote aggregate
    // formulation and recall ≥ 0.8 on planted near-dups.
    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashNearDupPairs(table(s, dir, "documents"), "doc_id", "text",
        maxDistance = 5)),

    // Span-level exact substring dedup (Lee et al. criterion): every token
    // 4-gram occurring >1x in the corpus marks its span; maximal island-merged
    // per-doc spans survive (at sf0.01: 25k gram hits collapse to 643 spans).
    // The engine ships only i64 gram hashes; the oracle recomputes with string
    // grams — identical output modulo 2^-64 hash collisions.
    "dedup_substring_spans" -> ((s, dir) =>
      Dedup.duplicateSpans(table(s, dir, "documents"), "doc_id", "text", n = 4)),

    // Near-dup detection on a corpus with PLANTED near-duplicates (the
    // fixture's organic pairs max out at cos≈0.6 — no real near-dups), gated
    // on the banded-SRP scale path with exact verify. τ=0.9 is the regime
    // where banding works (see Ann.cosineNearDupPairs scaladoc); planted
    // pairs sit at cos≈0.99998, so per-pair recall is 1-(1-0.9975^12)^6 ≈
    // 1-2e-10 — OpsSpec asserts set-equality with the exact path.
    // Output is the id pair set only: the planted cosines cluster within
    // ~3e-6 of each other, so a 6dp-rounded score is one last-ulp tie away
    // from a cross-engine mismatch (Spark rounds the decimal expansion,
    // DuckDB rounds x*1e6 binary) — while the τ=0.9 filter boundary is 0.39
    // from the nearest value, unconditionally float-safe.
    "dedup_embedding_pairs" -> ((s, dir) =>
      Ann.cosineNearDupPairs(plantedEmbeddings(table(s, dir, "embeddings")),
        threshold = 0.9, dim = 64, planes = 12, tables = 6)
        .select(col("id_a"), col("id_b"))),

    // Semantic dedup, prune step (SemDeDup shape): the embedding near-dup
    // pair graph collapses to one representative (min id) per connected
    // component; output = surviving vec_ids. Same banded-SRP pair
    // generator as dedup_embedding_pairs, so the exact-pair oracle
    // composes with the recursive-CTE components + anti join.
    "semdedup_prune" -> ((s, dir) => {
      val v = plantedEmbeddings(table(s, dir, "embeddings"))
      Dedup.pruneToRepresentatives(v.select(col("vec_id")), "vec_id",
        Ann.cosineNearDupPairs(v, threshold = 0.9, dim = 64,
          planes = 12, tables = 6))
    }),

    // Per-vector max-abs int8 quantization. Rounding is floor(x+0.5) on
    // both sides — explicit IEEE formula, no engine round() half-way rule.
    "quantize_embeddings" -> ((s, dir) =>
      Ann.quantizeInt8Rendered(table(s, dir, "embeddings"), "vec_id", "embedding")),

    "sim_topk_brute" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Ann.bruteTopK(annQuerySet(emb, 5), emb, k = 10)
    }),

    // Hard-negative mining: per query, top-10 nearest corpus vectors with a
    // DIFFERENT label (exact backend here; lshTopK upstream at scale).
    "mine_hard_negatives" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Ann.mineHardNegatives(annQuerySet(emb, 5), emb, "label", k = 10)
    }),

    // Mutual-kNN graph over a bounded subset (exact brute backend so the
    // oracle is exact SQL; at corpus scale the same mutualEdges composes
    // over the bucketed lshTopK backend — identical downstream shape).
    "knn_graph_mutual" -> ((s, dir) => {
      val emb = annQuerySet(table(s, dir, "embeddings"), 200)
      Ann.mutualEdges(Ann.bruteTopK(emb, emb, k = 5))
    }),

    "sim_topk_lsh" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Ann.lshTopK(annQuerySet(emb, 5), emb, k = 10, dim = 64, planes = 6)
    }),

    // IVF ANN, trained form. ORACLE-CHECKED since r12, TRAINING
    // INCLUDED: at gate scale the bounded sample is the whole corpus, so
    // the oracle unrolls the three Lloyd iterations as SQL CTEs with
    // every float sum in the engine's exact fold order — centroids,
    // cells, probes and the final top-k are all bit-identical (guard
    // errs loudly past the 2048-vector sample bound, where the xxhash64
    // sample order would start to matter).
    "sim_topk_ivf" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Ann.ivfTopK(annQuerySet(emb, 5), emb, k = 10, dim = 64)
    }),

    // ANN quality evaluation AS a gate: per-query recall@10 of the
    // banded-SRP path against the exact brute top-10 — the number an ANN
    // rollout decision reads. Both sides are themselves oracle-checked
    // gates; the report is one set-membership left join + per-query
    // aggregate on top, so the oracle composes the two gate oracles
    // verbatim as CTEs.
    "sim_recall_report" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val q = annQuerySet(emb, 5)
      val brute = Ann.bruteTopK(q, emb, k = 10)
        .select(col("query_id"), col("vec_id"))
      val lsh = Ann.lshTopK(q, emb, k = 10, dim = 64, planes = 6)
        .select(col("query_id"), col("vec_id"), lit(1L).as("__hit"))
      brute.join(broadcast(lsh), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
        .select(col("query_id"), col("k"), col("n_hit"),
          round(col("n_hit").cast("double") / col("k").cast("double"), 6)
            .as("recall"))
    }),

    // ANN recall AS a gate for the IVF family — the ivf sibling of
    // sim_recall_report: the SEARCH path (cell assignment, nprobe probing,
    // in-cell exact rank) runs with FIXED centroids (eight corpus vectors
    // at pinned vec_ids), making the whole pipeline SQL-expressible; only
    // the Lloyd training loop (OpsSpec recall floor) stays out of the
    // oracle. sim_topk_ivf itself remains the trained, rows-only variant.
    "ivf_recall_report" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val q = annQuerySet(emb, 5)
      val cents = Ann.fixedCentroids(emb, IvfGateCentroidIds)
      val brute = Ann.bruteTopK(q, emb, k = 10)
        .select(col("query_id"), col("vec_id"))
      val ivf = Ann.ivfSearch(q, emb, cents, k = 10, nprobe = 3)
        .select(col("query_id"), col("vec_id"), lit(1L).as("__hit"))
      brute.join(broadcast(ivf), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
        .select(col("query_id"), col("k"), col("n_hit"),
          round(col("n_hit").cast("double") / col("k").cast("double"), 6)
            .as("recall"))
    }),

    // Product-quantization ANN, trained form: per-subspace k-means on the
    // one-scan bounded sample (8 subspaces × 16 codes over the 64-dim
    // embeddings = 64× memory compression), corpus encoded once, queries
    // ranked by asymmetric distance to the reconstruction. ORACLE-CHECKED
    // since r12, TRAINING INCLUDED: the per-subspace Lloyd loops unroll
    // to SQL CTEs in the engine's exact fold order (same machinery as
    // the sim_topk_ivf oracle, keyed by subspace), then encode + ADC
    // re-derive bit-identically; pq_recall_report remains the accuracy
    // gate against the exact L2 brute top-10.
    "sim_topk_pq" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      Ann.pqTopK(annQuerySet(emb, 5), emb,
        Ann.pqCodebooks(emb, dim = 64, m = 8, c = 16, iters = 3), k = 10)
    }),

    // PQ recall AS a gate — the pq sibling of ivf_recall_report: codebooks
    // are the subspace slices of 16 pinned corpus vectors, so encode + ADC
    // rank is fully SQL-expressible, and recall@10 is measured against the
    // exact squared-L2 brute top-10 (the metric PQ approximates — cosine
    // recall would conflate metric mismatch with quantization error).
    "pq_recall_report" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val q = annQuerySet(emb, 5)
      val books = Ann.pqFixedCodebooks(emb, PqGateCentroidIds, m = 8)
      val brute = Ann.bruteTopKL2(q, emb, k = 10)
        .select(col("query_id"), col("vec_id"))
      val pq = Ann.pqTopK(q, emb, books, k = 10)
        .select(col("query_id"), col("vec_id"), lit(1L).as("__hit"))
      brute.join(broadcast(pq), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
        .select(col("query_id"), col("k"), col("n_hit"),
          round(col("n_hit").cast("double") / col("k").cast("double"), 6)
            .as("recall"))
    }),

    // Perceptual-hash image dedup over REAL decoded pixels: gradient
    // PNGs (id-dependent frequency), exact re-encodes of every 10th
    // planted at +5e6 and single-pixel edits of every 15th at +6e6;
    // aHash (8×8 integer block means, mean-thresholded) then hamming ≤ 2
    // pairs via the SimHash-style byte-chunk pigeonhole — never
    // all-pairs. ORACLE-CHECKED like phash_dct: DuckDB re-derives every
    // pixel from the gradient formula (no decoder), re-hashes, and takes
    // all-pairs hamming ≤ 2 — two independent implementations (ImageIO
    // decode + pigeonhole blocking vs closed-form arithmetic all-pairs)
    // must agree on the exact pair set. OpsSpec additionally pins
    // exact-copy hamming 0, the near-dup pair, and blocking completeness.
    "multimodal_image_dedup" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"))
      val media = Multimodal.fabricateGradients(docs)
        .union(Multimodal.fabricateGradients(
          docs.filter(col("doc_id") % 10 === 0), idOffset = 5000000L))
        .union(Multimodal.fabricateGradients(
          docs.filter(col("doc_id") % 15 === 0), idOffset = 6000000L,
          flipPixel = true))
      Multimodal.ahashPairs(s, Multimodal.averageHash(s, media),
        maxDistance = 2)
    }),

    // DCT perceptual hash over REAL decoded gradient pixels — and, unlike
    // its rows-only aHash sibling above, ORACLE-CHECKED: the cosine table
    // is µ-quantized to integers, so every DCT coefficient is an exact
    // 64-bit sum that DuckDB re-derives from the PIXEL FORMULA (no
    // decoder) — two fully independent implementations (ImageIO decode vs
    // closed-form arithmetic) must produce identical 64-bit hashes.
    // Every 5th doc keeps the gate's oracle-side separable-DCT join at
    // ~5M integer terms.
    "multimodal_phash_dct" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .filter(col("doc_id") % 5 === 0).select(col("doc_id"))
      Multimodal.dctHash(s, Multimodal.fabricateGradients(docs)).toDF()
    }),

    // Linear-time MMD² (Gretton et al., the h-statistic estimator) between
    // the even-id embeddings and the odd-id embeddings with a PLANTED
    // +0.1 shift on the first 8 dims: quadruples (x₁,y₁,x₂,y₂) form by
    // vec_id mod 4 — no ranking window, pure arithmetic grouping — and
    // h(g) = k(x₁,x₂)+k(y₁,y₂)−k(x₁,y₂)−k(x₂,y₁) with an RBF kernel over
    // the mirrorable 64-term squared-L2 fold. Per-quadruple terms are
    // 9dp-rounded decimals, so the O(n)-cost statistic is an exact sum —
    // the kernel-level drift monitor beyond drift_embedding_shift's mean
    // test. Four g-keyed joins; linear, never the quadratic full MMD.
    "drift_mmd_linear" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
        .select(col("vec_id"), Ann.asDouble(col("embedding")).as("v"))
        .withColumn("v", when(col("vec_id") % 2 === 1,
          transform(col("v"), (x, i) => when(i < 8, x + 0.1).otherwise(x)))
          .otherwise(col("v")))
        .withColumn("g", expr("vec_id div 4"))
      def role(r: Int, as: String) =
        emb.filter(pmod(col("vec_id"), lit(4)) === r)
          .select(col("g"), col("v").as(as))
      val quad = role(0, "x1").join(role(1, "y1"), "g")
        .join(role(2, "x2"), "g").join(role(3, "y2"), "g")
      def k(a: Column, b: Column) =
        exp(-Ann.sqDist(a, b) / lit(16.0)) // RBF, 2σ² = 16
      val h = round(k(col("x1"), col("x2")) + k(col("y1"), col("y2")) -
        k(col("x1"), col("y2")) - k(col("x2"), col("y1")), 9)
        .cast("decimal(18,9)")
      def d(c: Column) = c.cast("double")
      quad.select(h.as("h"))
        .agg(count(lit(1)).as("n_quads"), sum(col("h")).as("__s"))
        .select(col("n_quads"),
          round(d(col("__s")) / d(col("n_quads")), 6).as("mmd2_linear"),
          (d(col("__s")) / d(col("n_quads")) > 0.001).as("drift_detected"))
    }),

    // Embedding-distribution drift: L2 shift and cosine between the MEAN
    // vectors of two corpus snapshots (vec_id parity plays ref/cur) —
    // the cheap first-line embedding drift monitor before anything
    // MMD-grade. Per-dim means come from the sorted-fold meanPool
    // (deterministic); the 64-dim closures fold in DIM ORDER on both
    // engines, so every double sum is IEEE-identical.
    "drift_embedding_shift" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
        .withColumn("grp",
          when(col("vec_id") % 2 === 0, lit("ref")).otherwise(lit("cur")))
      val means = Ann.meanPool(emb, "grp", "embedding")
      val wide = means.groupBy(col("dim"))
        .agg(max(when(col("grp") === "ref", col("mean"))).as("r"),
          max(when(col("grp") === "cur", col("mean"))).as("c"))
      val packed = wide.agg(sort_array(collect_list(
        struct(col("dim"), col("r"), col("c")))).as("a"))
      def fold(f: Column => Column): Column =
        aggregate(transform(col("a"), x => f(x)), lit(0.0),
          (acc, x) => acc + x)
      packed.select(
        round(sqrt(fold(x => (x.getField("r") - x.getField("c")) *
          (x.getField("r") - x.getField("c")))), 6).as("l2_shift"),
        round(fold(x => x.getField("r") * x.getField("c")) /
          (sqrt(fold(x => x.getField("r") * x.getField("r"))) *
            sqrt(fold(x => x.getField("c") * x.getField("c")))), 6)
          .as("mean_cosine"))
    }),

    // Embedding ops in LONG layout (id/group, dim, value) — double columns
    // compare numerically in the gate, where a rendered vector string
    // would be at the mercy of engine float formatting.
    "embed_normalize" -> ((s, dir) =>
      Ann.l2NormalizeDf(
        table(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        "embedding")
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("dim", "nval")))),

    // Cross-source quantile normalization of the quality score: each
    // doc's score maps onto the GLOBAL score distribution by its
    // within-source rank (permille grid), making per-source scores
    // comparable before any global floor — all-integer rank arithmetic,
    // grid table broadcast, global cumulatives via the two-pass scan.
    "quality_rank_normalize" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"),
        col("source"),
        round(round(TextOps.qualityScore(col("text")), 6) * 1000000.0, 0)
          .cast("long").as("q_micro"))
      graft.ops.Ranking.quantileNormalize(docs, "source", "q_micro")
    }),

    // Semantic eval-set decontamination: every held-out vector's max
    // cosine against the train corpus + the ≥0.9 contamination flag —
    // the embedding-space twin of decontaminate_report's n-gram overlap.
    // The EVAL side broadcasts (eval sets are small by construction) and
    // the train corpus streams once: |eval|·|train| fixed-order dot
    // products, map-side-combined max per eval id. At larger eval sets,
    // block with SRP buckets first (the semdedup path).
    "decontaminate_semantic" -> ((s, dir) => {
      val v = table(s, dir, "embeddings").select(col("vec_id"),
        Ann.asDouble(col("embedding")).as("e"))
      val ev = v.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("eval_id"), col("e").as("ev"))
      val tr = v.filter(col("vec_id") % 20 =!= 0)
        .select(col("vec_id").as("train_id"), col("e").as("tv"))
      val cos = Ann.dot(col("ev"), col("tv")) /
        (sqrt(Ann.dot(col("ev"), col("ev"))) *
          sqrt(Ann.dot(col("tv"), col("tv"))))
      tr.crossJoin(broadcast(ev))
        .select(col("eval_id"), cos.as("cos"))
        .groupBy(col("eval_id"))
        .agg(max(col("cos")).as("mc"))
        .select(col("eval_id"), round(col("mc"), 6).as("max_cos"),
          (col("mc") >= 0.9).as("contaminated"))
    }),

    // Covariance sufficient statistics of the embedding corpus: exact
    // integer sums over 2^20-quantized values, one narrow outer-product
    // expression + one hash aggregate to the 2080 upper-triangle cells.
    // Memoized ([[covStats]]): embed_top_eigvec consumes the SAME
    // corpus-scale aggregate, so the one-pass build is paid once per
    // bench with cache_cold attribution, not twice.
    "embed_covariance" -> ((s, dir) => covStats(s, dir)),

    // Dominant principal direction + explained-variance share via 15
    // fixed power iterations on the exact-integer covariance stats —
    // corpus anisotropy in one 64-row readout. Input-scale work is the
    // one covariance aggregate; the matvec loop is driver-local on the
    // collected 2080-cell triangle (Lloyd shape), every sum an exact
    // decimal of 12dp-rounded terms, so the oracle UNROLLS the identical
    // recurrence as a 15-block CTE chain and lands on the same bits.
    "embed_top_eigvec" -> ((s, dir) =>
      Ann.topPrincipalDirection(covStats(s, dir), iters = EigIters)),

    // Greedy k-center coreset (Gonzalez) over the embedding corpus: 8
    // maximally-spread vectors, each round one distributed argmax of the
    // 9dp-decimal min-distance² to the chosen set — the diverse-subset
    // selection primitive (complement of semdedup_prune, which removes
    // the CLOSE pairs; this keeps the FAR ones). Oracle replays the
    // traversal step by step.
    "curate_kcenter" -> ((s, dir) =>
      graft.ops.Curation.kCenterCoreset(table(s, dir, "embeddings"),
        "vec_id", "embedding", KCenterK)),

    "embed_mean_pool" -> ((s, dir) =>
      Ann.meanPool(
        table(s, dir, "embeddings")
          .select(pmod(col("vec_id"), lit(10L)).as("grp"), col("embedding")),
        "grp", "embedding")),

    "text_langid" -> ((s, dir) =>
      table(s, dir, "documents").select(col("doc_id"),
        TextOps.languageId(col("text")).as("langid"))),

    // Flesch-Kincaid grade level per document — the readability signal a
    // curation pass uses to bucket prose difficulty. Vowel-group counting
    // as the syllable proxy (groups never span whitespace, so the whole-
    // text regexp count equals the per-word sum); sentences = non-blank
    // [.!?]+ segments, floored at 1 so unpunctuated docs stay defined.
    // Integer counts on both engines; the FK closure is double with
    // mirrored literals.
    "text_readability" -> ((s, dir) => {
      val words = size(TextOps.tokens(col("text"))).cast("long")
      val sents = greatest(lit(1L),
        size(filter(split(col("text"), "[.!?]+"),
          seg => length(trim(seg)) > 0)).cast("long"))
      val syl = size(regexp_extract_all(lower(col("text")),
        lit("[aeiouy]+"), lit(0))).cast("long")
      table(s, dir, "documents")
        .select(col("doc_id"), words.as("n_words"), sents.as("n_sentences"),
          syl.as("n_syllables"))
        .filter(col("n_words") > 0)
        .select(col("doc_id"), col("n_words"), col("n_sentences"),
          col("n_syllables"),
          round(lit(0.39) *
            (col("n_words").cast("double") / col("n_sentences").cast("double")) +
            lit(11.8) *
            (col("n_syllables").cast("double") / col("n_words").cast("double")) -
            lit(15.59), 6).as("fk_grade"))
    }),

    "text_quality" -> ((s, dir) =>
      table(s, dir, "documents").select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"))),

    // Adaptive quality floor: top 30% by score, rank assigned by the
    // distributed global-rank (range exchange + partition offsets), the
    // cutoff count computed in-plan. 6dp-rounded score (the established
    // cross-engine-safe form) keeps the ORDER identical on both sides.
    "sample_top_fraction" -> ((s, dir) =>
      graft.ops.Sampling.topFraction(
        table(s, dir, "documents").select(col("doc_id"),
          round(TextOps.qualityScore(col("text")), 6).as("quality")),
        "quality", "doc_id", frac = 0.3)),

    "text_tokens" -> ((s, dir) =>
      table(s, dir, "documents").select(col("doc_id"),
        TextOps.tokenCountWhitespace(col("text")).cast("long").as("n_ws_tokens"),
        TextOps.tokenCountBpe(col("text")).cast("long").as("n_bpe_tokens"))),

    // Tokenizer fertility by detected language — the "how many BPE-ish
    // pieces per whitespace word / chars per piece" table that drives
    // per-language token-budget planning. Exact BIGINT sums; the two
    // ratios are single double divisions, identical in both engines.
    "text_fertility" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(graft.ops.TextOps.languageId(col("text")).as("langid"),
          graft.ops.TextOps.tokenCountWhitespace(col("text")).cast("long")
            .as("ws"),
          graft.ops.TextOps.tokenCountBpe(col("text")).cast("long").as("bpe"),
          length(col("text")).cast("long").as("chars"))
        .groupBy(col("langid"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws")).as("sum_ws_tokens"),
          sum(col("bpe")).as("sum_bpe_tokens"),
          sum(col("chars")).as("sum_chars"))
        .select(col("langid"), col("n_docs"), col("sum_ws_tokens"),
          col("sum_bpe_tokens"), col("sum_chars"),
          round(col("sum_bpe_tokens").cast("double") /
            nullif(col("sum_ws_tokens").cast("double"), lit(0.0)), 6)
            .as("fertility"),
          round(col("sum_chars").cast("double") /
            nullif(col("sum_bpe_tokens").cast("double"), lit(0.0)), 6)
            .as("chars_per_token"))),

    "text_fingerprint" -> ((s, dir) =>
      table(s, dir, "documents").select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fingerprint"))),

    // Suffix stemming: the -ing/-ed/-s strip with minimum-stem guards,
    // first-match-only, rejoined to a stemmed text.
    "text_stem_lite" -> ((s, dir) =>
      table(s, dir, "documents").select(col("doc_id"),
        concat_ws(" ", TextOps.stemLite(TextOps.tokens(col("text"))))
          .as("stemmed"))),

    // Composed training-data pipeline: exact dedup (keep the smallest id
    // per fingerprint) → adaptive quality floor (top 50%) → deterministic
    // val/train assignment — three oracle-mirrored stages in one plan.
    "pipeline_dedup_split" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val deduped = docs
        .select(col("doc_id"), col("text"),
          TextOps.fingerprint(col("text")).as("__fp"))
        .withColumn("__keep",
          min(col("doc_id")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("__fp"))))
        .filter(col("doc_id") === col("__keep"))
        .select(col("doc_id"), col("text"))
      val curated = graft.ops.Sampling.topFraction(
        deduped.select(col("doc_id"),
          round(TextOps.qualityScore(col("text")), 6).as("quality")),
        "quality", "doc_id", frac = 0.5)
      graft.ops.Sampling.assignSplits(
        curated.select(col("doc_id"), col("quality"), col("rank")),
        "doc_id", Seq("val" -> 100))
    }),

    "text_tfidf" -> ((s, dir) =>
      TextOps.tfIdf(table(s, dir, "documents"), "doc_id", "text")),

    // Keyword extraction: top-3 terms per document by TF-IDF — the
    // summarization/tagging readout over the tfidf surface. The ranking
    // window is DOC-KEYED (never global) and orders on the 6dp-rounded
    // decimal score with a term tiebreak, so both engines rank the
    // identical lattice.
    "text_keywords_topk" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id"))
        .orderBy(col("tfidf").cast("decimal(18,6)").desc, col("term").asc)
      TextOps.tfIdf(table(s, dir, "documents"), "doc_id", "text")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("id").as("doc_id"), col("rk"), col("term"),
          col("tfidf"))
    }),

    // Corpus data card: per-language doc/token volumes, length envelope,
    // mean quality, exact-duplicate count — the release report a curation
    // run ships with its shards. One langid-keyed hash aggregate.
    "corpus_stats" -> ((s, dir) =>
      graft.ops.Profile.corpusStats(table(s, dir, "documents"), "text")),

    // PII scrub over a corpus with PLANTED pii spans (email/phone/ssn/ip
    // fabricated from doc_id formulas on every third doc — the organic
    // corpus has none, so redaction must change exactly those docs).
    // Emits the redacted text plus per-pattern match counts.
    "text_pii_redact" -> ((s, dir) => {
      val p = plantedPii(table(s, dir, "documents"))
      p.select(Seq(col("doc_id"), TextOps.redactPii(col("ptext")).as("redacted")) ++
        TextOps.PiiPatterns.map { case (name, pat, _) =>
          TextOps.piiCount(col("ptext"), pat).cast("long").as(s"n_$name")
        }: _*)
    }),

    // Luhn-validated card detection: plant a 16-digit run per document
    // (integer formula of doc_id — ~10% close the checksum by
    // construction), extract and checksum-validate in one narrow pass.
    // The governance upgrade over the bare regex count above: only
    // checksum-closing runs are real card candidates.
    "pii_luhn_cards" -> ((s, dir) => {
      val planted = table(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" card "),
          lpad(((col("doc_id") * 1000000007L + 123456789L) %
            10000000000000000L).cast("string"), 16, "0")).as("ptext"))
      graft.ops.TextOps.luhnCards(planted, "doc_id", "ptext")
    }),

    // Real encode→decode round trip: fabricate actual PNG streams from
    // integer formulas of (doc_id, n_chars), decode them with ImageIO, and
    // emit the DECODED dimensions/pixels. The oracle predicts them from the
    // same formulas — it only matches if the codec round trip is faithful.
    // byte_len (compressed size) is codec-dependent, hence not emitted.
    "multimodal_decode" -> ((s, dir) =>
      Multimodal.decodeFeatures(s,
        Multimodal.fabricateFromDocs(table(s, dir, "documents"))).toDF()
        .select(col("doc_id"), col("mime"), col("width"), col("height"),
          col("n_frames"), col("r"), col("g"), col("b"), col("feature0"))),

    // Real decode → REAL half-scale render → emit the resized dims/pixel;
    // uniform fills make the resized pixel oracle-predictable under any
    // interpolation kernel.
    "multimodal_resize" -> ((s, dir) =>
      Multimodal.resizeHalf(s,
        Multimodal.fabricateFromDocs(table(s, dir, "documents"))).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("r"), col("g"), col("b"))),

    // Fabricated multi-frame "videos" (doc_id % 3 + 1 frames), every 2nd
    // frame decoded; un-sampled frames are never decoded.
    "multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(s,
        Multimodal.fabricateVideos(table(s, dir, "documents")), step = 2).toDF()
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
          col("r"), col("g"), col("b"))),

    // Real WAV containers (AudioSystem round trip): the decoded header
    // fields and exact integer sample statistics must match the
    // fabrication formulas.
    "multimodal_audio" -> ((s, dir) =>
      Multimodal.decodeAudio(s,
        Multimodal.fabricateAudio(table(s, dir, "documents"))).toDF()
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("bits"), col("n_samples"), col("duration_ms"),
          col("peak"), col("sum_abs"))),

    // Low-bin DFT spectrum over the DECODED PCM — exact integer re/im
    // sums against the µ-quantized trig basis (the pHash device applied
    // to audio), plus the dominant bin by integer power (decimal-exact
    // re²+im², no float anywhere). The oracle re-derives every sample
    // from the waveform formula and must match all 64 bits of both sums:
    // decode path and formula path are fully independent. Every 5th doc.
    "multimodal_audio_dft" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      Multimodal.dftBins(s, Multimodal.fabricateAudio(
        table(s, dir, "documents").filter(col("doc_id") % 5 === 0))).toDF()
        .select(col("doc_id"), col("bin"), col("re"), col("im"),
          (col("re").cast(dec) * col("re") +
            col("im").cast(dec) * col("im")).cast("string").as("power"))
    }),

    // Energy-based voice-activity detection over the decoded PCM: 20-sample
    // frames, Σ|sample| ≥ 160000 is active, consecutive actives merge into
    // segments. The engine DECODES real WAV bytes; the oracle re-derives
    // every frame energy from the waveform's generating formula — fully
    // independent implementations of the same segmentation.
    "multimodal_audio_vad" -> ((s, dir) =>
      Multimodal.vadSegments(s,
        Multimodal.fabricateAudio(table(s, dir, "documents"))).toDF()
        .select(col("doc_id"), col("n_frames"), col("n_active"),
          col("n_segments"), col("longest_run"), col("active_ratio"))),

    // The composed curation pass: language filter → quality floor → exact
    // dedup → near-dup removal (every stage individually oracle-checked
    // above; this checks their composition).
    "curate_corpus" -> ((s, dir) =>
      graft.ops.Curation.curateFrom(
        curationAfterExact(s, dir), curationPairs(s, dir))),

    // Budget-constrained curation: rank (6dp quality desc, id asc), keep
    // the maximal prefix with running tokens <= 8000 — the "fill a token
    // budget with the best documents" selection. Running totals via the
    // distributed prefix-sum scan, never a global window.
    "curate_token_budget" -> ((s, dir) =>
      graft.ops.Curation.tokenBudgetSelect(table(s, dir, "documents"),
        "doc_id", "text", budgetTokens = 8000L)),

    // Filter-ablation attribution: per curation rule, total flagged and
    // UNIQUELY flagged docs (the rule's marginal value — 0 unique means
    // fully shadowed). One narrow flag pass + fingerprint groupBy + a
    // single global aggregate exploded into the 5-row report.
    "curate_ablation" -> ((s, dir) =>
      graft.ops.Curation.filterAblation(table(s, dir, "documents"),
        "doc_id", "text")),

    // Same pipeline with TRANSITIVE near-dup removal: qualifying pairs are
    // collapsed via connected components, only each cluster's min id
    // survives (differs from greedy exactly on connected clusters).
    "curate_corpus_cc" -> ((s, dir) =>
      graft.ops.Curation.curateTransitiveFrom(
        curationAfterExact(s, dir), curationPairs(s, dir))),

    // Gate for the custom TypedImperativeAggregate: per-nation MinHash
    // sketch of the distinct order-date set (one shuffle of k longs per
    // nation — the group's element set is never materialized for the
    // sketch), pairwise signature agreement vs the exact set Jaccard
    // computed alongside. Order dates give each nation a few-hundred-element
    // set with moderate cross-nation overlap, so the estimate is genuinely
    // exercised (unlike a 5-value enum column where every Jaccard ≈ 1).
    // ORACLE-CHECKED: the slot hash is Spark's Murmur3_x86_32, which the
    // oracle re-implements in SQL (graft.queries.SqlMurmur) — per-slot
    // minima, signature agreement AND the exact set Jaccard all
    // re-derived bit-exact. MinHashAggSpec additionally bounds
    // |est−exact| and pins merge invariance.
    "minhash_nation_orderdates" -> ((s, dir) => {
      val dates = table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate").cast("string").as("odate"))
        .join(table(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("odate"))
      val k = 128
      val sigs = dates.groupBy(col("nation")).agg(
        graft.ops.MinHashAgg.minhashAgg(col("odate"), k).as("sig"),
        collect_set(col("odate")).as("cset"))
      sigs.select(col("nation").as("nation_a"), col("sig").as("sig_a"), col("cset").as("set_a"))
        .crossJoin(sigs.select(col("nation").as("nation_b"), col("sig").as("sig_b"), col("cset").as("set_b")))
        .filter(col("nation_a") < col("nation_b"))
        .select(col("nation_a"), col("nation_b"),
          (aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
            .cast("double") / k).as("est_jaccard"),
          (size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
            size(array_union(col("set_a"), col("set_b"))).cast("double")).as("exact_jaccard"))
    }))

  /** Embeddings corpus with planted near-duplicates: every 10th vector gets
    * a copy (id + 1e6) perturbed by ±0.001 per component — cos(orig, copy)
    * ≈ 0.99998 on this unit-norm corpus, far above every organic pair
    * (≤ 0.61). The perturbation is written in the dialect-neutral arithmetic
    * subset (float→double cast, %, integer-scaled double product) shared
    * verbatim with the DuckDB oracle CTE, so both engines fabricate
    * bit-identical vectors. */
  def plantedEmbeddings(emb: DataFrame): DataFrame = {
    val base = emb.select(col("vec_id"), Ann.asDouble(col("embedding")).as("embedding"))
    val planted = emb.filter(col("vec_id") % 10 === 0).select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        x.cast("double") +
          lit(0.001) * ((col("vec_id") + i + 1) % 3 - 1).cast("double")).as("embedding"))
    base.unionAll(planted)
  }

  /** Documents with PII spans planted from doc_id formulas on every third
    * doc (dialect-neutral concat/cast/lpad/% — mirrored verbatim in the
    * DuckDB CTE). */
  def plantedPii(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), when(col("doc_id") % 3 === 0,
      concat(col("text"),
        lit(" contact u"), col("doc_id").cast("string"),
        lit("@mail"), (col("doc_id") % 7).cast("string"), lit(".com"),
        lit(" call "), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
        lit("-"), lpad(((col("doc_id") * 7) % 1000).cast("string"), 3, "0"),
        lit("-"), lpad(((col("doc_id") * 13) % 10000).cast("string"), 4, "0"),
        lit(" ssn "), lpad((col("doc_id") % 900).cast("string"), 3, "0"),
        lit("-"), lpad((col("doc_id") % 90).cast("string"), 2, "0"),
        lit("-"), lpad(((col("doc_id") * 31) % 10000).cast("string"), 4, "0"),
        lit(" from 10."), (col("doc_id") % 256).cast("string"),
        lit("."), ((col("doc_id") * 3) % 256).cast("string"),
        lit("."), (col("doc_id") % 100).cast("string")))
      .otherwise(col("text")).as("ptext"))

  /** [[plantedPii]] as a DuckDB CTE body. */
  private val plantedPiiSql: String =
    """SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN concat(text,
      |  ' contact u', cast(doc_id as string),
      |  '@mail', cast(doc_id % 7 as string), '.com',
      |  ' call ', lpad(cast(doc_id % 1000 as string), 3, '0'),
      |  '-', lpad(cast((doc_id * 7) % 1000 as string), 3, '0'),
      |  '-', lpad(cast((doc_id * 13) % 10000 as string), 4, '0'),
      |  ' ssn ', lpad(cast(doc_id % 900 as string), 3, '0'),
      |  '-', lpad(cast(doc_id % 90 as string), 2, '0'),
      |  '-', lpad(cast((doc_id * 31) % 10000 as string), 4, '0'),
      |  ' from 10.', cast(doc_id % 256 as string),
      |  '.', cast((doc_id * 3) % 256 as string),
      |  '.', cast(doc_id % 100 as string))
      |ELSE text END AS ptext FROM documents""".stripMargin

  /** The planted corpus as a DuckDB CTE body (1-based list index i ≡ Spark's
    * 0-based lambda index + 1). */
  private val plantedSql: String =
    """SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000,
      |    list_transform(range(1, 65), i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)
      |      + CAST(0.001 AS DOUBLE) * ((vec_id + i) % 3 - 1))
      |  FROM embeddings WHERE vec_id % 10 = 0""".stripMargin

  // ---------------------------------------------------------------- oracles

  /** Ordered left fold dot product (DuckDB list_reduce starts from the first
    * element; IEEE-equal to Spark's 0.0-seeded fold since 0.0+x ≡ x). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 65), i -> $a[CAST(i AS INT)] * $b[CAST(i AS INT)]), (x, y) -> x + y)"

  /** Squared-L2 distance as the same ascending-index 0.0-seeded left fold
    * as Ann.sqDist (VecSqDist) — IEEE-identical term order. `w` = vector
    * width (64 for full vectors, 8 for PQ subvectors). */
  private def sqDistSql(a: String, b: String, w: Int): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, ${w + 1}), j -> " +
      s"($a[CAST(j AS INT)] - $b[CAST(j AS INT)]) * " +
      s"($a[CAST(j AS INT)] - $b[CAST(j AS INT)]))), (a, b) -> a + b)"

  /** One Lloyd iteration over the IVF corpus sample as CTEs c{n-1} → c{n}:
    * assign every vector to its strict-argmin centroid (lowest index on
    * ties — the (d, ci) window order), recompute each non-empty cell's
    * mean with the ascending-vec_id ordered fold Ann.lloyd uses, keep the
    * old centroid for empty cells. Mirrors Ann.lloyd exactly — every sum
    * is a sequential fold in the same order, so the centroids (and hence
    * the final top-k) are bit-identical. */
  private def ivfLloydIterSql(n: Int): String = {
    val (p, q) = (s"c${n - 1}", s"c$n")
    s"""a$n AS (SELECT vec_id, ci, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY d, ci) AS rn
       |  FROM (SELECT v.vec_id, $p.ci, ${sqDistSql("v.e", s"$p.cv", 64)} AS d
       |    FROM v, $p)),
       |m$n AS (SELECT ci, list(mn ORDER BY j) AS cv
       |  FROM (SELECT a.ci, dj.j AS j,
       |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        list(v.e[CAST(dj.j AS INT)] ORDER BY v.vec_id)),
       |        (x, y) -> x + y) / count(*) AS mn
       |    FROM a$n a JOIN v USING (vec_id), range(1, 65) dj(j)
       |    WHERE a.rn = 1 GROUP BY 1, 2)
       |  GROUP BY 1),
       |$q AS (SELECT p.ci, coalesce(m.cv, p.cv) AS cv
       |  FROM $p p LEFT JOIN m$n m USING (ci))""".stripMargin
  }

  /** The PQ variant of [[ivfLloydIterSql]]: the same iteration per
    * 8-dim subspace, keyed by (mi, ci) over the `sub` slice table. */
  private def pqLloydIterSql(n: Int): String = {
    val (p, q) = (s"c${n - 1}", s"c$n")
    s"""a$n AS (SELECT vec_id, mi, ci, row_number() OVER (
       |      PARTITION BY vec_id, mi ORDER BY d, ci) AS rn
       |  FROM (SELECT s.vec_id, s.mi, $p.ci,
       |      ${sqDistSql("s.se", s"$p.cv", 8)} AS d
       |    FROM sub s JOIN $p ON $p.mi = s.mi)),
       |m$n AS (SELECT mi, ci, list(mn ORDER BY j) AS cv
       |  FROM (SELECT a.mi, a.ci, dj.j AS j,
       |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        list(s.se[CAST(dj.j AS INT)] ORDER BY s.vec_id)),
       |        (x, y) -> x + y) / count(*) AS mn
       |    FROM a$n a JOIN sub s ON s.vec_id = a.vec_id AND s.mi = a.mi,
       |      range(1, 9) dj(j)
       |    WHERE a.rn = 1 GROUP BY 1, 2, 3)
       |  GROUP BY 1, 2),
       |$q AS (SELECT p.mi, p.ci, coalesce(m.cv, p.cv) AS cv
       |  FROM $p p LEFT JOIN m$n m USING (mi, ci))""".stripMargin
  }

  private val normTextSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val toksSql = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
  private def markerSql(ws: Seq[String]) =
    s"len(list_filter($toksSql, t -> list_contains(${ws.map(w => s"'$w'").mkString("[", ",", "]")}, t)))"

  /** DuckDB 1.0 can't correlate `range(len(toks))` laterally, so shingle
    * extraction cross-joins a constant range(1, 4096). The guard CTE poisons
    * the oracle (error()) if any doc could outrun the cap (valid shingle
    * starts reach len-2, range covers i ≤ 4095 ⇒ safe through len 4097) —
    * a silent wrong-oracle on a longer future fixture becomes a loud fail. */
  private val shingleCapGuard: String =
    s"guard AS (SELECT CASE WHEN max(len($toksSql)) > 4097 THEN error('shingle range(1,4096) cap exceeded') ELSE 1 END AS g FROM documents)"

  /** The 6dp-rounded quality score as DuckDB SQL — shared by BOTH curate
    * oracles so a formula tweak can never desynchronize them. */
  private val roundedQualitySql: String = {
    val len = "CAST(length(text) AS DOUBLE)"
    val words = s"greatest(CAST(len($toksSql) AS DOUBLE), 1.0)"
    val punct = s"($len - CAST(length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE))"
    val stop = s"CAST(${markerSql(TextOps.LangMarkers.flatMap(_._2))} AS DOUBLE)"
    s"round(least(1.0, $len / 500.0) * 0.3 + (1.0 - least(1.0, $punct / $words)) * 0.3 +" +
      s" least(1.0, $stop * 5.0 / $words) * 0.2 + least(1.0, $words / 100.0) * 0.2, 6)"
  }

  /** The curate pipeline as DuckDB SQL up to qualifying pairs (`qp`), then
    * a caller-supplied dup-resolution CTE (greedy id_b drop, or recursive
    * connected components). */
  private def curateSql(qualityExpr: String, scoreSel: String,
      langCase: String, recursive: Boolean, dupCte: String): String = {
    val withKw = if (recursive) "WITH RECURSIVE" else "WITH"
    s"""$withKw $shingleCapGuard,
       |f0 AS (SELECT doc_id AS id, text, $scoreSel FROM documents),
       |f AS (SELECT id, text, $langCase AS langid, $qualityExpr AS quality FROM f0),
       |flt AS (SELECT * FROM f WHERE langid = 'en' AND quality >= 0.6),
       |keep AS (SELECT min(id) AS id FROM flt GROUP BY md5($normTextSql)),
       |ae AS (SELECT flt.* FROM flt JOIN keep USING (id)),
       |sh AS (
       |  SELECT DISTINCT id, concat_ws(' ', toks[CAST(i AS INT)], toks[CAST(i AS INT)+1], toks[CAST(i AS INT)+2]) AS s
       |  FROM (SELECT id, $toksSql toks FROM ae), range(1, 4096) t(i)
       |  WHERE i + 2 <= len(toks) AND (SELECT g FROM guard) = 1),
       |cnt AS (SELECT id, count(*) n FROM sh GROUP BY 1),
       |inter AS (SELECT a.id id_a, b.id id_b, count(*) m
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
       |qp AS (SELECT id_a, id_b FROM inter
       |  JOIN cnt ca ON ca.id = inter.id_a JOIN cnt cb ON cb.id = inter.id_b
       |  WHERE CAST(m AS DOUBLE) / (ca.n + cb.n - m) >= 0.8),
       |$dupCte
       |SELECT id, langid, quality FROM ae WHERE id NOT IN (SELECT id FROM dup)""".stripMargin
  }

  private val oraclesNgramSql: String =
    s"""WITH $shingleCapGuard,
          |sh AS (
          |  SELECT DISTINCT doc_id, concat_ws(' ', toks[CAST(i AS INT)], toks[CAST(i AS INT)+1], toks[CAST(i AS INT)+2]) AS s
          |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') toks
          |        FROM documents), range(1, 4096) t(i)
          |  WHERE i + 2 <= len(toks) AND (SELECT g FROM guard) = 1),
          |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
          |inter AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) m
          |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
          |SELECT id_a, id_b, CAST(m AS DOUBLE) / (ca.n + cb.n - m) AS jaccard
          |FROM inter JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
          |WHERE CAST(m AS DOUBLE) / (ca.n + cb.n - m) >= 0.8""".stripMargin

  /** Exact-cosine top-10 for the vec_id<5 query set (the sim_topk_brute
    * oracle), shared verbatim by the recall-report oracle. */
  private lazy val bruteTopKSql: String =
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e FROM embeddings),
       |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
       |s AS (SELECT query_id, vec_id, round(${dotSql("qe", "e")} /
       |     (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("e", "e")})), 6) AS cos
       | FROM v, q WHERE vec_id <> query_id),
       |r AS (SELECT query_id, vec_id, cos,
       |   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank FROM s)
       |SELECT query_id, vec_id, cos, CAST(rank AS INT) AS rank FROM r WHERE rank <= 10""".stripMargin

  /** Banded-SRP top-10 with the deterministic plane literals (the
    * sim_topk_lsh oracle), shared verbatim by the recall-report oracle. */
  private lazy val lshTopKSql: String = {
    val (planes, tables, dim) = (6, 4, 64)
    def planeLit(t: Int, p: Int): String =
      graft.ops.Ann.planeVec(t, p, dim)
        .map(x => if (x > 0) "1.0" else "-1.0")
        .mkString("[", ",", "]")
    def dotPlane(t: Int, p: Int, e: String): String =
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> " +
        s"$e[CAST(i AS INT)] * (${planeLit(t, p)})[CAST(i AS INT)]), " +
        "(x, y) -> x + y)"
    def bucket(t: Int, e: String): String =
      (0 until planes).map(p =>
        s"(CASE WHEN ${dotPlane(t, p, e)} >= 0 THEN ${1L << p} ELSE 0 END)")
        .mkString(" + ")
    val qb = (0 until tables).map(t =>
      s"SELECT query_id, $t AS t, ${bucket(t, "qe")} AS b FROM q")
      .mkString("\nUNION ALL ")
    val cb = (0 until tables).map(t =>
      s"SELECT vec_id, $t AS t, ${bucket(t, "e")} AS b FROM v")
      .mkString("\nUNION ALL ")
    s"""WITH v AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, e AS qe FROM v
       |  WHERE vec_id < 5),
       |qb AS ($qb),
       |cb AS ($cb),
       |cand AS (SELECT DISTINCT qb.query_id, cb.vec_id
       |  FROM qb JOIN cb ON cb.t = qb.t AND cb.b = qb.b
       |  WHERE cb.vec_id <> qb.query_id),
       |s AS (SELECT cand.query_id, cand.vec_id,
       |    round(${dotSql("qe", "e")} /
       |      (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("e", "e")})), 6)
       |      AS cos
       |  FROM cand JOIN q ON q.query_id = cand.query_id
       |  JOIN v ON v.vec_id = cand.vec_id),
       |r AS (SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id ASC) AS rank
       |  FROM s)
       |SELECT query_id, vec_id, cos, CAST(rank AS INT) AS rank
       |FROM r WHERE rank <= 10""".stripMargin
  }

  /** Fixed centroid vec_ids for the IVF gate — spread across the corpus,
    * present at every sf (embeddings has ≥500 rows at sf0.001). */
  private val EigIters = 15
  private val KCenterK = 8

  /** [[graft.ops.Curation.kCenterCoreset]]'s farthest-point traversal
    * unrolled: center j's CTE computes every vector's 9dp-decimal min
    * distance² to centers 0..j−1 (the same least-of-sqDist folds) and
    * takes the (d DESC, id ASC) winner. */
  private val kcenterOracle: String = {
    val steps = (1 until KCenterK).map { j =>
      val sq = (0 until j).map(i => sqDistSql("v.e", s"e$i"))
      val dmin = if (sq.size == 1) sq.head else s"least(${sq.mkString(", ")})"
      val xs = (0 until j).map(i => s", (SELECT e AS e$i FROM c$i) x$i")
      s"""s$j AS MATERIALIZED (SELECT v.vec_id, v.e,
         |    CAST(round($dmin, 9) AS DECIMAL(28,9)) AS d
         |  FROM v${xs.mkString}),
         |c$j AS MATERIALIZED (SELECT vec_id, e, CAST(d AS DOUBLE) AS d
         |  FROM s$j ORDER BY d DESC, vec_id ASC LIMIT 1)""".stripMargin
    }
    val outs = (1 until KCenterK).map(j =>
      s"UNION ALL SELECT $j AS rank, vec_id, round(d, 6) AS sel_dist FROM c$j")
    s"""WITH v AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |c0 AS MATERIALIZED (SELECT vec_id, e FROM v
       |  ORDER BY vec_id ASC LIMIT 1),
       |${steps.mkString(",\n")}
       |SELECT 0 AS rank, vec_id, CAST(NULL AS DOUBLE) AS sel_dist FROM c0
       |${outs.mkString("\n")}""".stripMargin
  }

  /** [[graft.ops.Ann.topPrincipalDirection]]'s recurrence unrolled into a
    * CTE chain: covariance cells as mirrored double arithmetic over the
    * exact integer stats, then 15 (matvec, norm, renormalize) blocks —
    * every CTE MATERIALIZED so the doubly-referenced recurrence doesn't
    * inline exponentially. */
  private val eigOracle: String = {
    val iterBlocks = (1 to EigIters).map { k =>
      val p = s"v${k - 1}"
      s"""w$k AS MATERIALIZED (SELECT a.i,
         |    sum(CAST(round(a.cov * CAST(v.s AS DOUBLE), 12)
         |      AS DECIMAL(38,12))) AS w
         |  FROM a JOIN $p v ON v.i = a.j GROUP BY 1),
         |nm$k AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(round(
         |      CAST(w AS DOUBLE) * CAST(w AS DOUBLE), 12)
         |      AS DECIMAL(38,12))) AS DOUBLE)) AS nrm FROM w$k),
         |v$k AS MATERIALIZED (SELECT i, CAST(round(CAST(w AS DOUBLE) / nrm,
         |    12) AS DECIMAL(28,12)) AS s FROM w$k, nm$k)""".stripMargin
    }
    val vK = s"v$EigIters"
    s"""WITH q AS MATERIALIZED (SELECT list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS e
       |  FROM embeddings),
       |p AS MATERIALIZED (SELECT i.i - 1 AS dim_i, j.j - 1 AS dim_j,
       |    e[CAST(i.i AS INT)] AS xi, e[CAST(j.j AS INT)] AS xj
       |  FROM q, range(1, 65) i(i), range(1, 65) j(j)
       |  WHERE j.j >= i.i),
       |cst AS MATERIALIZED (SELECT dim_i, dim_j,
       |    CAST(count(*) AS BIGINT) AS n, CAST(sum(xi) AS BIGINT) AS s_i,
       |    CAST(sum(xj) AS BIGINT) AS s_j,
       |    CAST(sum(xi * xj) AS BIGINT) AS s_ij
       |  FROM p GROUP BY 1, 2),
       |tri AS MATERIALIZED (SELECT dim_i, dim_j,
       |    (CAST(n AS DOUBLE) * CAST(s_ij AS DOUBLE) -
       |     CAST(s_i AS DOUBLE) * CAST(s_j AS DOUBLE)) /
       |    (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) /
       |    1099511627776.0 AS cov
       |  FROM cst),
       |a AS MATERIALIZED (SELECT dim_i AS i, dim_j AS j, cov FROM tri
       |  UNION ALL SELECT dim_j, dim_i, cov FROM tri WHERE dim_i <> dim_j),
       |v0 AS MATERIALIZED (SELECT DISTINCT dim_i AS i,
       |    CAST(round(1.0 / sqrt(64.0), 12) AS DECIMAL(28,12)) AS s
       |  FROM tri),
       |${iterBlocks.mkString(",\n")},
       |tf AS MATERIALIZED (SELECT a.i,
       |    sum(CAST(round(a.cov * CAST(v.s AS DOUBLE), 12)
       |      AS DECIMAL(38,12))) AS t
       |  FROM a JOIN $vK v ON v.i = a.j GROUP BY 1),
       |lam AS MATERIALIZED (SELECT CAST(sum(CAST(round(
       |      CAST(v.s AS DOUBLE) * CAST(tf.t AS DOUBLE), 12)
       |      AS DECIMAL(38,12))) AS DOUBLE) AS lam
       |  FROM $vK v JOIN tf ON tf.i = v.i),
       |tr AS MATERIALIZED (SELECT CAST(sum(CAST(round(cov, 12)
       |      AS DECIMAL(38,12))) AS DOUBLE) AS tr
       |  FROM tri WHERE dim_i = dim_j),
       |sg AS MATERIALIZED (SELECT CASE WHEN (
       |    SELECT CAST(s AS DOUBLE) FROM $vK
       |    ORDER BY abs(CAST(s AS DOUBLE)) DESC, i ASC LIMIT 1) < 0
       |  THEN -1.0 ELSE 1.0 END AS sg)
       |SELECT CAST(v.i AS INT) AS dim,
       |  round(sg.sg * CAST(v.s AS DOUBLE), 6) AS loading,
       |  round(lam.lam / tr.tr, 6) AS explained_ratio
       |FROM $vK v, sg, lam, tr""".stripMargin
  }

  private val IvfGateCentroidIds: Seq[Long] =
    Seq(7L, 63L, 119L, 175L, 231L, 287L, 343L, 399L)

  /** Fixed codebook vec_ids for the PQ gate (16 codes per subspace; same
    * every-sf-present spread as the IVF set). */
  private[queries] val PqGateCentroidIds: Seq[Long] =
    (0 until 16).map(i => 7L + 31L * i)

  /** Squared-L2 distance as the same 0.0-seeded left fold Spark's
    * aggregate(zip_with(...)) runs (list_reduce starts at element 1;
    * 0.0+x ≡ x, so the float order is identical). */
  private def sqDistSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 65), i -> ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])" +
      s" * ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])), (x, y) -> x + y)"

  /** Fixed-centroid IVF top-10 (cell assignment → nprobe=3 probe → in-cell
    * exact rank), the SQL mirror of Ann.ivfSearch over
    * [[IvfGateCentroidIds]] — shared by the ivf_recall_report oracle. */
  private lazy val ivfFixedTopKSql: String = {
    val ids = IvfGateCentroidIds.mkString(", ")
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e FROM embeddings),
       |cen AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS ci, e AS ce
       |  FROM v WHERE vec_id IN ($ids)),
       |asg AS (SELECT vec_id, ci AS cell FROM (
       |  SELECT v.vec_id, cen.ci,
       |    row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${sqDistSql("e", "ce")} ASC, cen.ci ASC) AS rn
       |  FROM v, cen) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
       |pr AS (SELECT query_id, ci AS cell FROM (
       |  SELECT q.query_id, cen.ci,
       |    row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY ${sqDistSql("qe", "ce")} ASC, cen.ci ASC) AS rn
       |  FROM q, cen) WHERE rn <= 3),
       |s AS (SELECT pr.query_id, a.vec_id,
       |    round(${dotSql("qe", "e")} /
       |      (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("e", "e")})), 6) AS cos
       |  FROM pr JOIN asg a ON a.cell = pr.cell
       |  JOIN v ON v.vec_id = a.vec_id
       |  JOIN q ON q.query_id = pr.query_id
       |  WHERE a.vec_id <> pr.query_id),
       |r AS (SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id ASC) AS rank FROM s)
       |SELECT query_id, vec_id FROM r WHERE rank <= 10""".stripMargin
  }

  /** Exact squared-L2 brute top-10 — the metric-matched baseline for the
    * PQ recall oracle (same 0.0-seeded 64-term fold as Ann.sqDist). */
  private lazy val bruteL2TopKSql: String =
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e FROM embeddings),
       |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
       |s AS (SELECT query_id, vec_id, round(${sqDistSql("qe", "e")}, 6) AS dist
       | FROM v, q WHERE vec_id <> query_id),
       |r AS (SELECT query_id, vec_id,
       |   row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rank FROM s)
       |SELECT query_id, vec_id FROM r WHERE rank <= 10""".stripMargin

  /** Fixed-codebook PQ top-10 (per-subspace encode → reconstruction → ADC
    * rank), the SQL mirror of Ann.pqTopK over [[PqGateCentroidIds]]: the
    * 8-term subspace folds pick each code, list(… ORDER BY m) rebuilds x̂,
    * and the final 64-term fold mirrors Ann.sqDist exactly. */
  private lazy val pqFixedTopKSql: String = {
    val ids = PqGateCentroidIds.mkString(", ")
    def sqDist8(a: String, b: String): String =
      s"list_reduce(list_transform(range(1, 9), j -> ($a[CAST(j AS INT)] - $b[CAST(j AS INT)])" +
        s" * ($a[CAST(j AS INT)] - $b[CAST(j AS INT)])), (x, y) -> x + y)"
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e FROM embeddings),
       |cen AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS ci, e AS ce
       |  FROM v WHERE vec_id IN ($ids)),
       |cs AS (SELECT ci, CAST(m AS INT) AS m,
       |    list_slice(ce, CAST(m * 8 + 1 AS INT), CAST(m * 8 + 8 AS INT)) AS sub
       |  FROM cen, range(0, 8) t(m)),
       |cv AS (SELECT vec_id, CAST(m AS INT) AS m,
       |    list_slice(e, CAST(m * 8 + 1 AS INT), CAST(m * 8 + 8 AS INT)) AS sub
       |  FROM v, range(0, 8) t(m)),
       |pk AS (SELECT vec_id, m, sub FROM (
       |  SELECT cv.vec_id, cv.m, cs.sub,
       |    row_number() OVER (PARTITION BY cv.vec_id, cv.m
       |      ORDER BY ${sqDist8("cv.sub", "cs.sub")} ASC, cs.ci ASC) AS rn
       |  FROM cv JOIN cs ON cs.m = cv.m) WHERE rn = 1),
       |xh AS (SELECT vec_id, flatten(list(sub ORDER BY m)) AS xhat
       |  FROM pk GROUP BY 1),
       |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
       |s AS (SELECT query_id, xh.vec_id, round(${sqDistSql("qe", "xhat")}, 6) AS dist
       |  FROM xh, q WHERE xh.vec_id <> query_id),
       |r AS (SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rank FROM s)
       |SELECT query_id, vec_id FROM r WHERE rank <= 10""".stripMargin
  }

  def oracles: Map[String, String] = {
    val (scoreSel, langCase) = OracleSql.langId(toksSql)
    Map(
      // MinHash emits exactly-verified pairs, so its output is always a
      // subset of the true >=tau pairs; on the gate corpus the banded LSH
      // recall is 100% (asserted in OpsSpec), so the exact-pair oracle
      // applies verbatim.
      "dedup_minhash_pairs" -> oraclesNgramSql,
      "dedup_minhash_calibration" -> {
        val K = 16
        def h(i: Int) =
          s"min(CAST(concat('0x', substr(md5(concat('$i:', s)), 1, 15)) AS BIGINT)) AS h$i"
        val sigCols = (0 until K).map(h).mkString(",\n          |    ")
        val matches = (0 until K)
          .map(i => s"CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""WITH p AS (SELECT id_a, id_b, jaccard FROM ($oraclesNgramSql) q),
           |ids AS (SELECT id_a AS doc_id FROM p UNION SELECT id_b FROM p),
           |sh AS (
           |  SELECT DISTINCT doc_id, concat_ws(' ', toks[CAST(i AS INT)], toks[CAST(i AS INT)+1], toks[CAST(i AS INT)+2]) AS s
           |  FROM (SELECT d.doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') toks
           |        FROM documents d JOIN ids USING (doc_id)), range(1, 4096) t(i)
           |  WHERE i + 2 <= len(toks)),
           |sg AS (SELECT doc_id,
           |    $sigCols
           |  FROM sh GROUP BY 1)
           |SELECT p.id_a, p.id_b, p.jaccard,
           |  CAST($matches AS DOUBLE) / $K AS est_jaccard,
           |  round(abs(CAST($matches AS DOUBLE) / $K - p.jaccard), 6) AS abs_err
           |FROM p JOIN sg a ON a.doc_id = p.id_a JOIN sg b ON b.doc_id = p.id_b"""
          .stripMargin
      },
      "dedup_exact_docs" ->
        s"""SELECT md5($normTextSql) AS fingerprint, CAST(min(doc_id) AS BIGINT) AS keep_id,
           | count(*) AS n_copies FROM documents GROUP BY 1""".stripMargin,

      "streaming_dedup" ->
        s"""SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
           |  md5($normTextSql) AS fingerprint
           |FROM documents GROUP BY 2""".stripMargin,
      "dedup_ngram_pairs" -> oraclesNgramSql,
      // Bigram starts reach len-1, range covers i ≤ 4095 ⇒ safe through
      // len 4096 — own guard (the trigram guard admits 4097).
      "eval_rouge_pairs" ->
        s"""WITH guard2 AS (SELECT CASE WHEN max(len($toksSql)) > 4096
           |    THEN error('bigram range(1,4096) cap exceeded') ELSE 1 END AS g
           |  FROM documents),
           |pairs AS (SELECT id_a, id_b FROM ($oraclesNgramSql) q),
           |g2 AS (SELECT doc_id, concat_ws(' ', toks[CAST(i AS INT)], toks[CAST(i AS INT)+1]) AS gram
           |  FROM (SELECT doc_id, $toksSql toks FROM documents), range(1, 4096) t(i)
           |  WHERE i + 1 <= len(toks) AND (SELECT g FROM guard2) = 1),
           |gc AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c FROM g2 GROUP BY 1, 2),
           |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot FROM gc GROUP BY 1),
           |m AS (SELECT p.id_a, p.id_b, CAST(sum(least(a.c, b.c)) AS BIGINT) AS matched
           |  FROM pairs p
           |  JOIN gc a ON a.doc_id = p.id_a
           |  JOIN gc b ON b.doc_id = p.id_b AND b.gram = a.gram
           |  GROUP BY 1, 2),
           |j AS (SELECT p.id_a, p.id_b, coalesce(m.matched, 0) AS matched,
           |    CAST(coalesce(m.matched, 0) AS DOUBLE) / CAST(ta.tot AS DOUBLE) AS p,
           |    CAST(coalesce(m.matched, 0) AS DOUBLE) / CAST(tb.tot AS DOUBLE) AS r
           |  FROM pairs p
           |  LEFT JOIN m ON m.id_a = p.id_a AND m.id_b = p.id_b
           |  JOIN tot ta ON ta.doc_id = p.id_a
           |  JOIN tot tb ON tb.doc_id = p.id_b
           |  WHERE ta.tot > 0 AND tb.tot > 0)
           |SELECT id_a, id_b, matched,
           |  round(p, 6) AS rouge2_p, round(r, 6) AS rouge2_r,
           |  round(CASE WHEN p + r > 0.0 THEN 2.0 * p * r / (p + r) ELSE 0.0 END, 6) AS rouge2_f1
           |FROM j""".stripMargin,
      "eval_bleu_pairs" ->
        s"""WITH guard2 AS (SELECT CASE WHEN max(len($toksSql)) > 4096
           |    THEN error('bigram range(1,4096) cap exceeded') ELSE 1 END AS g
           |  FROM documents),
           |pairs AS (SELECT id_a, id_b FROM ($oraclesNgramSql) q),
           |t1 AS (SELECT doc_id, u.gram FROM
           |    (SELECT doc_id, $toksSql toks FROM documents),
           |    unnest(toks) AS u(gram)),
           |c1 AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
           |  FROM t1 GROUP BY 1, 2),
           |tot1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot FROM c1 GROUP BY 1),
           |g2 AS (SELECT doc_id, concat_ws(' ', toks[CAST(i AS INT)], toks[CAST(i AS INT)+1]) AS gram
           |  FROM (SELECT doc_id, $toksSql toks FROM documents), range(1, 4096) t(i)
           |  WHERE i + 1 <= len(toks) AND (SELECT g FROM guard2) = 1),
           |c2 AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
           |  FROM g2 GROUP BY 1, 2),
           |tot2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot FROM c2 GROUP BY 1),
           |m1 AS (SELECT p.id_a, p.id_b, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m1
           |  FROM pairs p
           |  JOIN c1 a ON a.doc_id = p.id_a
           |  JOIN c1 b ON b.doc_id = p.id_b AND b.gram = a.gram
           |  GROUP BY 1, 2),
           |m2 AS (SELECT p.id_a, p.id_b, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m2
           |  FROM pairs p
           |  JOIN c2 a ON a.doc_id = p.id_a
           |  JOIN c2 b ON b.doc_id = p.id_b AND b.gram = a.gram
           |  GROUP BY 1, 2),
           |j AS (SELECT p.id_a, p.id_b,
           |    ta.tot AS len_ref, tb.tot AS len_cand, t2b.tot AS tot2_b,
           |    CAST(coalesce(m1.m1, 0) AS DOUBLE) / CAST(tb.tot AS DOUBLE) AS p1,
           |    CAST(coalesce(m2.m2, 0) AS DOUBLE) / CAST(t2b.tot AS DOUBLE) AS p2,
           |    least(1.0, exp(1.0 - CAST(ta.tot AS DOUBLE) / CAST(tb.tot AS DOUBLE))) AS bp
           |  FROM pairs p
           |  LEFT JOIN m1 ON m1.id_a = p.id_a AND m1.id_b = p.id_b
           |  LEFT JOIN m2 ON m2.id_a = p.id_a AND m2.id_b = p.id_b
           |  JOIN tot1 ta ON ta.doc_id = p.id_a
           |  JOIN tot1 tb ON tb.doc_id = p.id_b
           |  JOIN tot2 t2b ON t2b.doc_id = p.id_b
           |  WHERE ta.tot > 0 AND tb.tot > 0 AND t2b.tot > 0)
           |SELECT id_a, id_b, len_ref, len_cand,
           |  round(p1, 6) AS bleu_p1, round(p2, 6) AS bleu_p2,
           |  round(bp, 6) AS brevity_penalty,
           |  round(CASE WHEN p1 * p2 > 0.0 THEN bp * sqrt(p1 * p2)
           |    ELSE 0.0 END, 6) AS bleu2
           |FROM j""".stripMargin,
      "text_ngram_novelty" ->
        s"""WITH $shingleCapGuard,
           |sh AS (
           |  SELECT DISTINCT doc_id, concat_ws(' ', toks[CAST(i AS INT)], toks[CAST(i AS INT)+1], toks[CAST(i AS INT)+2]) AS s
           |  FROM (SELECT doc_id, $toksSql toks FROM documents), range(1, 4096) t(i)
           |  WHERE i + 2 <= len(toks) AND (SELECT g FROM guard) = 1),
           |dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY 1)
           |SELECT sh.doc_id AS id, CAST(count(*) AS BIGINT) AS n_shingles,
           |  CAST(sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           |  round(1.0 - CAST(sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) /
           |    CAST(count(*) AS DOUBLE), 6) AS novelty
           |FROM sh JOIN dfreq USING (s) GROUP BY sh.doc_id""".stripMargin,
      "sample_cluster_split" ->
        s"""WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM ($oraclesNgramSql) q),
           |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
           |          UNION ALL SELECT id_b, id_a FROM pairs),
           |nodes AS (SELECT DISTINCT s AS id FROM edges),
           |walk(id, lbl) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT e.d, w.lbl FROM walk w JOIN edges e ON e.s = w.id),
           |comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id),
           |lab AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
           |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
           |SELECT doc_id, component,
           |  CASE WHEN CAST(concat('0x',
           |      substr(md5(CAST(component AS VARCHAR)), 1, 15)) AS BIGINT) % 10 < 8
           |    THEN 'train' ELSE 'eval' END AS split
           |FROM lab""".stripMargin,
      "dedup_winnow_pairs" ->
        s"""WITH base AS (SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 2000000, array_to_string(($toksSql)[1:30], ' ')
           |  FROM documents WHERE doc_id % 20 = 0),
           |guard AS (SELECT CASE WHEN max(len($toksSql)) > 4097
           |    THEN error('gram range(1,4096) cap exceeded') ELSE 1 END AS g
           |  FROM base),
           |tk AS (SELECT doc_id, $toksSql toks FROM base),
           |gr AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
           |    array_to_string(list_slice(toks, CAST(i AS INT),
           |      CAST(i AS INT) + 3), ' ') AS gram
           |  FROM tk, range(1, 4096) t(i)
           |  WHERE i + 3 <= len(toks) AND (SELECT g FROM guard) = 1),
           |h AS (SELECT doc_id, pos,
           |    CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) AS hv,
           |    CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS m
           |  FROM gr),
           |sel AS (SELECT doc_id,
           |    min(hv) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS f,
           |    pos, m
           |  FROM h),
           |fp AS (SELECT DISTINCT doc_id, f FROM sel
           |  WHERE pos <= m - 8 OR (m < 8 AND pos = 0))
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(count(*) AS BIGINT) AS n_shared
           |FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
           |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
      "dedup_containment_pairs" ->
        s"""WITH base AS (SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 2000000, array_to_string(($toksSql)[1:30], ' ')
           |  FROM documents WHERE doc_id % 20 = 0),
           |guard AS (SELECT CASE WHEN max(len($toksSql)) > 4097
           |    THEN error('shingle range(1,4096) cap exceeded') ELSE 1 END AS g
           |  FROM base),
           |sh AS (
           |  SELECT DISTINCT doc_id, concat_ws(' ', toks[CAST(i AS INT)],
           |      toks[CAST(i AS INT)+1], toks[CAST(i AS INT)+2]) AS s
           |  FROM (SELECT doc_id, $toksSql toks FROM base), range(1, 4096) t(i)
           |  WHERE i + 2 <= len(toks) AND (SELECT g FROM guard) = 1),
           |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) n FROM sh GROUP BY 1),
           |inter AS (SELECT a.doc_id id_a, b.doc_id id_b, CAST(count(*) AS BIGINT) m
           |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
           |  GROUP BY 1, 2)
           |SELECT id_a, id_b, round(CAST(m AS DOUBLE) / ca.n, 6) AS containment
           |FROM inter JOIN cnt ca ON ca.doc_id = id_a
           |WHERE round(CAST(m AS DOUBLE) / ca.n, 6) >= 0.8""".stripMargin,
      "dedup_source_matrix" ->
        s"""WITH p AS ($oraclesNgramSql),
           |s AS (SELECT doc_id, source FROM documents),
           |m AS (SELECT least(sa.source, sb.source) AS source_a,
           |    greatest(sa.source, sb.source) AS source_b
           |  FROM p JOIN s sa ON sa.doc_id = p.id_a
           |         JOIN s sb ON sb.doc_id = p.id_b)
           |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
           |FROM m GROUP BY 1, 2""".stripMargin,
      "dedup_incremental" -> {
        def shingleCte(src: String) =
          s"""SELECT DISTINCT id, concat_ws(' ', toks[CAST(i AS INT)], toks[CAST(i AS INT)+1], toks[CAST(i AS INT)+2]) AS s
             |  FROM (SELECT id, $toksSql toks FROM $src), range(1, 4096) t(i)
             |  WHERE i + 2 <= len(toks) AND (SELECT g FROM guard) = 1""".stripMargin
        s"""WITH $shingleCapGuard,
           |newb AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 5 = 0),
           |corpus AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 5 <> 0
           |           UNION ALL SELECT doc_id + 1000000 AS id, text FROM documents WHERE doc_id % 15 = 0),
           |cfp AS (SELECT DISTINCT md5($normTextSql) AS fp FROM corpus),
           |nfp AS (SELECT id, md5($normTextSql) AS fp FROM newb),
           |shn AS (${shingleCte("newb")}),
           |shc AS (${shingleCte("corpus")}),
           |cn AS (SELECT id, count(*) AS n FROM shn GROUP BY 1),
           |cc AS (SELECT id, count(*) AS n FROM shc GROUP BY 1),
           |inter AS (SELECT a.id AS id_l, b.id AS id_r, count(*) AS m
           |          FROM shn a JOIN shc b ON a.s = b.s GROUP BY 1, 2),
           |near AS (SELECT DISTINCT id_l AS id FROM inter
           |         JOIN cn ON cn.id = id_l JOIN cc ON cc.id = id_r
           |         WHERE CAST(m AS DOUBLE) / (cn.n + cc.n - m) >= 0.8)
           |SELECT nfp.id,
           |  (nfp.fp IN (SELECT fp FROM cfp)) AS dup_exact,
           |  (nfp.id IN (SELECT id FROM near)) AS dup_near,
           |  NOT((nfp.fp IN (SELECT fp FROM cfp)) OR (nfp.id IN (SELECT id FROM near))) AS kept
           |FROM nfp""".stripMargin
      },
      "dedup_substring_spans" ->
        s"""WITH $shingleCapGuard,
           |toks AS (SELECT doc_id AS id, $toksSql AS toks FROM documents),
           |grams AS (
           |  SELECT id, CAST(i - 1 AS BIGINT) AS pos,
           |         array_to_string(list_slice(toks, CAST(i AS INT), CAST(i AS INT) + 3), ' ') AS g
           |  FROM toks, range(1, 4096) t(i)
           |  WHERE i + 3 <= len(toks) AND (SELECT g FROM guard) = 1),
           |counted AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
           |hits AS (SELECT id, pos AS s, pos + 3 AS e FROM grams JOIN counted USING (g)),
           |marked AS (SELECT id, s, e,
           |  max(e) OVER (PARTITION BY id ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
           |  FROM hits),
           |isl AS (SELECT id, s, e,
           |  sum(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
           |    OVER (PARTITION BY id ORDER BY s ROWS UNBOUNDED PRECEDING) AS island
           |  FROM marked)
           |SELECT id AS doc_id, min(s) AS span_start, max(e) AS span_end,
           |       max(e) - min(s) + 1 AS span_tokens
           |FROM isl GROUP BY id, island""".stripMargin,
      "dedup_cluster_sizes" ->
        s"""WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM ($oraclesNgramSql) q),
           |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
           |          UNION ALL SELECT id_b, id_a FROM pairs),
           |nodes AS (SELECT DISTINCT s AS id FROM edges),
           |walk(id, lbl) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT e.d, w.lbl FROM walk w JOIN edges e ON e.s = w.id),
           |comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id),
           |cs AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
           |  FROM comp GROUP BY 1)
           |SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
           |FROM cs GROUP BY 1""".stripMargin,

      "dedup_components" ->
        s"""WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM ($oraclesNgramSql) q),
           |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
           |          UNION ALL SELECT id_b, id_a FROM pairs),
           |nodes AS (SELECT DISTINCT s AS id FROM edges),
           |walk(id, lbl) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT e.d, w.lbl FROM walk w JOIN edges e ON e.s = w.id)
           |SELECT id, min(lbl) AS component FROM walk GROUP BY id""".stripMargin,
      "dedup_survivors" ->
        s"""WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM ($oraclesNgramSql) q),
           |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
           |          UNION ALL SELECT id_b, id_a FROM pairs),
           |nodes AS (SELECT DISTINCT s AS id FROM edges),
           |walk(id, lbl) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT e.d, w.lbl FROM walk w JOIN edges e ON e.s = w.id),
           |comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id),
           |lab AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
           |    d.n_chars
           |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
           |best AS (SELECT component, doc_id AS best_id FROM (
           |  SELECT component, doc_id, row_number() OVER (PARTITION BY component
           |    ORDER BY n_chars DESC, doc_id ASC) AS rn FROM lab) WHERE rn = 1)
           |SELECT l.doc_id, l.component, l.doc_id = b.best_id AS keep
           |FROM lab l JOIN best b USING (component)""".stripMargin,
      "drift_mmd_linear" -> {
        def kk(a: String, b: String) = s"exp(-(${sqDistSql(a, b)}) / 16.0)"
        s"""WITH v AS (SELECT vec_id, vec_id // 4 AS g, vec_id % 4 AS r,
           |    CASE WHEN vec_id % 2 = 1 THEN list_transform(range(1, 65),
           |        i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE) +
           |          CASE WHEN i <= 8 THEN 0.1 ELSE 0.0 END)
           |      ELSE list_transform(embedding, x -> CAST(x AS DOUBLE)) END AS e
           |  FROM embeddings),
           |q AS (SELECT a.e AS x1, b.e AS y1, c.e AS x2, d.e AS y2
           |  FROM v a JOIN v b ON b.g = a.g AND b.r = 1
           |  JOIN v c ON c.g = a.g AND c.r = 2
           |  JOIN v d ON d.g = a.g AND d.r = 3
           |  WHERE a.r = 0),
           |h AS (SELECT CAST(round(${kk("x1", "x2")} + ${kk("y1", "y2")}
           |    - ${kk("x1", "y2")} - ${kk("x2", "y1")}, 9) AS DECIMAL(18,9)) AS h
           |  FROM q)
           |SELECT CAST(count(*) AS BIGINT) AS n_quads,
           |  round(CAST(sum(h) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
           |    AS mmd2_linear,
           |  CAST(sum(h) AS DOUBLE) / CAST(count(*) AS DOUBLE) > 0.001
           |    AS drift_detected
           |FROM h""".stripMargin
      },
      "pq_recall_report" ->
        s"""WITH b AS ($bruteL2TopKSql),
           |l AS ($pqFixedTopKSql)
           |SELECT b.query_id, CAST(count(*) AS BIGINT) AS k,
           |  CAST(sum(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_hit,
           |  round(CAST(sum(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS recall
           |FROM b LEFT JOIN l ON l.query_id = b.query_id AND l.vec_id = b.vec_id
           |GROUP BY 1""".stripMargin,
      "ivf_recall_report" ->
        s"""WITH b AS ($bruteTopKSql),
           |l AS ($ivfFixedTopKSql)
           |SELECT b.query_id, CAST(count(*) AS BIGINT) AS k,
           |  CAST(sum(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_hit,
           |  round(CAST(sum(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS recall
           |FROM b LEFT JOIN l ON l.query_id = b.query_id AND l.vec_id = b.vec_id
           |GROUP BY 1""".stripMargin,
      "sim_recall_report" ->
        s"""WITH b AS ($bruteTopKSql),
           |l AS ($lshTopKSql)
           |SELECT b.query_id, CAST(count(*) AS BIGINT) AS k,
           |  CAST(sum(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_hit,
           |  round(CAST(sum(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS recall
           |FROM b LEFT JOIN l ON l.query_id = b.query_id AND l.vec_id = b.vec_id
           |GROUP BY 1""".stripMargin,
      "dedup_embedding_pairs" ->
        s"""WITH v AS ($plantedSql),
           |p AS (SELECT a.vec_id id_a, b.vec_id id_b, a.e ea, b.e eb FROM v a, v b WHERE a.vec_id < b.vec_id),
           |s AS (SELECT id_a, id_b, ${dotSql("ea", "eb")} /
           |     (sqrt(${dotSql("ea", "ea")}) * sqrt(${dotSql("eb", "eb")})) AS cos
           | FROM p)
           |SELECT id_a, id_b FROM s WHERE cos >= 0.9""".stripMargin,
      "semdedup_prune" ->
        s"""WITH RECURSIVE v AS ($plantedSql),
           |p AS (SELECT a.vec_id id_a, b.vec_id id_b, a.e ea, b.e eb FROM v a, v b WHERE a.vec_id < b.vec_id),
           |pairs AS (SELECT id_a, id_b FROM p
           |  WHERE ${dotSql("ea", "eb")} /
           |    (sqrt(${dotSql("ea", "ea")}) * sqrt(${dotSql("eb", "eb")})) >= 0.9),
           |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
           |          UNION ALL SELECT id_b, id_a FROM pairs),
           |nodes AS (SELECT DISTINCT s AS id FROM edges),
           |walk(id, lbl) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT e.d, w.lbl FROM walk w JOIN edges e ON e.s = w.id)
           |SELECT vec_id FROM v WHERE vec_id NOT IN (
           |  SELECT id FROM (SELECT id, min(lbl) AS component FROM walk GROUP BY id)
           |  WHERE id <> component)""".stripMargin,
      "quantize_embeddings" ->
        """WITH v AS (SELECT vec_id AS id,
          |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
          |s AS (SELECT id, e,
          |  CASE WHEN list_aggregate(list_transform(e, x -> abs(x)), 'max') = 0
          |       THEN 1.0
          |       ELSE list_aggregate(list_transform(e, x -> abs(x)), 'max') END AS scale
          |  FROM v)
          |SELECT id, scale,
          |  array_to_string(list_transform(e,
          |    x -> CAST(CAST(floor(x * 127.0 / scale + 0.5) AS INT) AS STRING)), ',') AS qvec
          |FROM s""".stripMargin,
      // The SRP-LSH gate is fully mirrorable because the hyperplanes are
      // DETERMINISTIC ±1 literals (splitmix64 parity): the oracle embeds
      // the identical plane constants, rebuilds every table bucket, joins
      // candidates and ranks — byte-for-byte the Spark pipeline.
      "sim_topk_lsh" -> lshTopKSql,

      "sim_topk_brute" -> bruteTopKSql,

      // IVF from first principles INCLUDING the k-means training: the
      // bounded sample is the whole corpus at gate scale (loud guard at
      // 2048 — Ann.boundedSample's xxhash order only matters beyond it),
      // the three Lloyd iterations unroll to CTE blocks whose every
      // float sum is the same sequential ordered fold as Ann.lloyd
      // (distances ascending-dim, cell means ascending-vec_id), and the
      // search mirrors cell assignment, nprobe probing and 6dp cosine
      // ranking. Centroids and top-k are bit-identical, not approximate.
      "sim_topk_ivf" ->
        s"""WITH v AS MATERIALIZED (SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           |  FROM embeddings),
           |guard AS (SELECT CASE WHEN count(*) > 2048 THEN
           |    error('ivf oracle scope: corpus exceeds the 2048-vector bounded sample')
           |    ELSE 1 END g FROM v),
           |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci,
           |    e AS cv
           |  FROM v ORDER BY vec_id LIMIT 16),
           |${ivfLloydIterSql(1)},
           |${ivfLloydIterSql(2)},
           |${ivfLloydIterSql(3)},
           |cells AS (SELECT vec_id, ci AS cell FROM (
           |    SELECT v.vec_id, c3.ci, row_number() OVER (
           |        PARTITION BY v.vec_id
           |        ORDER BY ${sqDistSql("v.e", "c3.cv", 64)}, c3.ci) AS rn
           |    FROM v, c3) WHERE rn = 1),
           |probes AS (SELECT query_id, ci AS cell FROM (
           |    SELECT q.vec_id AS query_id, c3.ci, row_number() OVER (
           |        PARTITION BY q.vec_id
           |        ORDER BY ${sqDistSql("q.e", "c3.cv", 64)}, c3.ci) AS rn
           |    FROM (SELECT vec_id, e FROM v WHERE vec_id < 5)
           |      q(vec_id, e), c3)
           |  WHERE rn <= 4),
           |cand AS (SELECT p.query_id, cv.vec_id,
           |    round(${dotSql("qe.e", "cv.e")} /
           |      (sqrt(${dotSql("qe.e", "qe.e")}) *
           |       sqrt(${dotSql("cv.e", "cv.e")})), 6) AS cos
           |  FROM probes p
           |  JOIN cells ce ON ce.cell = p.cell
           |  JOIN v cv ON cv.vec_id = ce.vec_id
           |  JOIN v qe ON qe.vec_id = p.query_id
           |  WHERE cv.vec_id <> p.query_id),
           |r AS (SELECT query_id, vec_id, cos, row_number() OVER (
           |    PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
           |  FROM cand)
           |SELECT query_id, vec_id, cos, CAST(rank AS INT) AS rank
           |FROM r, guard WHERE rank <= 10""".stripMargin,

      // PQ from first principles INCLUDING the per-subspace codebook
      // training: the same unrolled Lloyd as the IVF oracle, run per
      // 8-dim slice (keyed by mi), then the one-pass encode (strict
      // argmin per subspace, lowest index on ties), reconstruction
      // x̂ = concat of winning centroids, and exact 6dp L2 ranking to x̂
      // — mathematically the classic ADC table sum, evaluated as the
      // one 64-dim fold the engine uses so the float order mirrors.
      "sim_topk_pq" ->
        s"""WITH v AS MATERIALIZED (SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           |  FROM embeddings),
           |guard AS (SELECT CASE WHEN count(*) > 2048 THEN
           |    error('pq oracle scope: corpus exceeds the 2048-vector bounded sample')
           |    ELSE 1 END g FROM v),
           |sub AS MATERIALIZED (SELECT vec_id, mi.mi AS mi,
           |    list_transform(range(1, 9), j ->
           |      e[CAST(mi.mi * 8 + j AS INT)]) AS se
           |  FROM v, range(0, 8) mi(mi)),
           |c0 AS (SELECT mi, ci, se AS cv FROM (
           |    SELECT mi, vec_id, se,
           |      row_number() OVER (PARTITION BY mi ORDER BY vec_id) - 1
           |        AS ci
           |    FROM sub) WHERE ci < 16),
           |${pqLloydIterSql(1)},
           |${pqLloydIterSql(2)},
           |${pqLloydIterSql(3)},
           |enc AS (SELECT vec_id, mi, cv FROM (
           |    SELECT s.vec_id, s.mi, c3.ci, c3.cv, row_number() OVER (
           |        PARTITION BY s.vec_id, s.mi
           |        ORDER BY ${sqDistSql("s.se", "c3.cv", 8)}, c3.ci) AS rn
           |    FROM sub s JOIN c3 ON c3.mi = s.mi) WHERE rn = 1),
           |xhat AS MATERIALIZED (SELECT vec_id,
           |    flatten(list(cv ORDER BY mi)) AS xh
           |  FROM enc GROUP BY 1),
           |q AS (SELECT vec_id AS query_id, e AS qe FROM v
           |  WHERE vec_id < 5),
           |cand AS (SELECT q.query_id, x.vec_id,
           |    round(${sqDistSql("q.qe", "x.xh", 64)}, 6) AS dist
           |  FROM xhat x, q WHERE x.vec_id <> q.query_id),
           |r AS (SELECT query_id, vec_id, dist, row_number() OVER (
           |    PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rank
           |  FROM cand)
           |SELECT query_id, vec_id, dist, CAST(rank AS INT) AS rank
           |FROM r, guard WHERE rank <= 10""".stripMargin,
      "mine_hard_negatives" ->
        s"""WITH v AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) e FROM embeddings),
           |q AS (SELECT vec_id AS query_id, label AS qlabel, e AS qe FROM v WHERE vec_id < 5),
           |s AS (SELECT query_id, vec_id, round(${dotSql("qe", "e")} /
           |     (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("e", "e")})), 6) AS cos
           | FROM v, q WHERE vec_id <> query_id AND label <> qlabel),
           |r AS (SELECT query_id, vec_id, cos,
           |   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank FROM s)
           |SELECT query_id, vec_id, cos, CAST(rank AS INT) AS rank FROM r WHERE rank <= 10""".stripMargin,
      "knn_graph_mutual" ->
        s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
           |           FROM embeddings WHERE vec_id < 200),
           |s AS (SELECT q.vec_id AS query_id, v.vec_id, round(${dotSql("q.e", "v.e")} /
           |     (sqrt(${dotSql("q.e", "q.e")}) * sqrt(${dotSql("v.e", "v.e")})), 6) AS cos
           | FROM v, v q WHERE v.vec_id <> q.vec_id),
           |r AS (SELECT query_id, vec_id, cos,
           |   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank FROM s),
           |e AS (SELECT query_id AS a, vec_id AS b, cos FROM r WHERE rank <= 5)
           |SELECT e.a AS id_a, e.b AS id_b, e.cos
           |FROM e JOIN e m ON m.a = e.b AND m.b = e.a WHERE e.a < e.b""".stripMargin,

      // Normalize: elementwise x/norm with the ordered-fold norm (0.0-seeded
      // Spark fold ≡ DuckDB list_reduce from first element). Zero vectors
      // pass through unscaled on both sides.
      "embed_normalize" ->
        s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e FROM embeddings),
           |n AS (SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS nrm FROM v)
           |SELECT vec_id, CAST(i - 1 AS INT) AS dim,
           |  CASE WHEN nrm > 0.0 THEN e[CAST(i AS INT)] / nrm ELSE e[CAST(i AS INT)] END AS nval
           |FROM n, range(1, 65) r(i)""".stripMargin,
      // Mean pool: fold the VALUE-SORTED per-(group, dim) list — the one
      // summation order both engines reproduce exactly (see Ann.meanPool).
      // The 0.0 prepend seeds the fold like Spark's aggregate(.., 0.0, ..):
      // without it an all-(-0.0) group would fold to -0.0 here but +0.0 in
      // Spark (0.0 + -0.0 = +0.0).
      "quality_rank_normalize" ->
        s"""WITH q AS (SELECT doc_id, source,
           |    CAST(round($roundedQualitySql * 1000000.0) AS BIGINT)
           |      AS q_micro
           |  FROM documents),
           |c AS (SELECT source, q_micro AS v, CAST(count(*) AS BIGINT) AS c
           |  FROM q GROUP BY 1, 2),
           |sc AS (SELECT source, v,
           |    CAST(sum(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT)
           |      AS r
           |  FROM c),
           |ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n
           |  FROM q GROUP BY 1),
           |req AS (SELECT sc.source, sc.v, (1000 * sc.r + ns.n - 1) // ns.n
           |    AS pct
           |  FROM sc JOIN ns ON ns.source = sc.source),
           |g AS (SELECT q_micro AS v, CAST(count(*) AS BIGINT) AS c
           |  FROM q GROUP BY 1),
           |gc AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum
           |  FROM g),
           |ngt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
           |grid AS (SELECT p.p AS pct, min(gc.v) AS value_norm
           |  FROM range(1, 1001) p(p), gc, ngt
           |  WHERE 1000 * gc.cum >= p.p * ngt.n GROUP BY 1)
           |SELECT q.doc_id, q.source, q.q_micro,
           |  CAST(req.pct AS BIGINT) AS pct, grid.value_norm
           |FROM q JOIN req ON req.source = q.source AND req.v = q.q_micro
           |JOIN grid ON grid.pct = req.pct""".stripMargin,

      "decontaminate_semantic" ->
        s"""WITH v AS (SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           |  FROM embeddings),
           |ev AS (SELECT vec_id AS eval_id, e AS ev FROM v
           |  WHERE vec_id % 20 = 0),
           |tr AS (SELECT vec_id AS train_id, e AS tv FROM v
           |  WHERE vec_id % 20 <> 0),
           |p AS (SELECT eval_id, ${dotSql("ev", "tv")} /
           |    (sqrt(${dotSql("ev", "ev")}) * sqrt(${dotSql("tv", "tv")}))
           |    AS cos
           |  FROM tr CROSS JOIN ev),
           |m AS (SELECT eval_id, max(cos) AS mc FROM p GROUP BY 1)
           |SELECT eval_id, round(mc, 6) AS max_cos,
           |  (mc >= 0.9) AS contaminated
           |FROM m""".stripMargin,

      "embed_top_eigvec" -> eigOracle,

      // SimHash near-dup pairs from first principles: re-tokenize
      // (lower + \s+ split, multiset), xxhash64 each DISTINCT token via
      // the exact HUGEINT arithmetic in SqlXxHash64 (loud error() guard
      // on its ≤8-byte/ASCII scope), weighted ±1 votes per (doc, bit),
      // pack the majority bits into two 32-bit halves, and take
      // all-pairs hamming ≤ 5 — which must equal the engine's
      // width-scaled pigeonhole pair set exactly.
      "dedup_simhash_pairs" ->
        s"""WITH docs AS (SELECT doc_id,
           |    list_filter(string_split_regex(lower(text), '\\s+'),
           |      x -> x <> '') AS toks
           |  FROM documents WHERE trim(text) <> ''),
           |tc AS MATERIALIZED (SELECT doc_id, t,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM (SELECT doc_id, unnest(toks) AS t FROM docs)
           |  GROUP BY 1, 2),
           |dt AS (SELECT DISTINCT t FROM tc),
           |guard AS (SELECT CASE WHEN max(length(t)) > 8
           |    OR max(list_max(list_transform(range(1, length(t)+1),
           |         i -> ascii(substr(t, CAST(i AS INT), 1))))) > 127
           |    THEN error('simhash oracle: token >8 bytes or non-ascii')
           |    ELSE 1 END g
           |  FROM dt),
           |tk AS (SELECT t, CAST(length(t) AS HUGEINT) AS n,
           |    list_transform(range(1, length(t)+1),
           |      i -> CAST(ascii(substr(t, CAST(i AS INT), 1)) AS HUGEINT))
           |      AS bs
           |  FROM dt),
           |${SqlXxHash64.hashCtes},
           |hb AS (SELECT t, CAST(h % 4294967296 AS BIGINT) AS hlo,
           |    CAST(h // 4294967296 AS BIGINT) AS hhi FROM hsh),
           |votes AS (SELECT tc.doc_id, b.b AS b,
           |    sum(tc.cnt * ((CASE WHEN b.b < 32 THEN (hb.hlo >> b.b) & 1
           |        ELSE (hb.hhi >> (b.b - 32)) & 1 END) * 2 - 1)) AS v
           |  FROM tc JOIN hb ON tc.t = hb.t, range(0, 64) b(b)
           |  GROUP BY 1, 2),
           |sh AS MATERIALIZED (SELECT doc_id,
           |    CAST(sum(CASE WHEN b < 32 AND v > 0 THEN CAST(1 AS BIGINT) << b
           |        ELSE 0 END) AS BIGINT) AS lo,
           |    CAST(sum(CASE WHEN b >= 32 AND v > 0
           |        THEN CAST(1 AS BIGINT) << (b - 32) ELSE 0 END) AS BIGINT)
           |      AS hi
           |  FROM votes GROUP BY 1)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
           |    AS BIGINT) AS hamming
           |FROM sh a JOIN sh b ON a.doc_id < b.doc_id, guard
           |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
           |  <= 5""".stripMargin,

      // MinHash sketch from first principles: hash every distinct order
      // date with the SQL murmur3 (one fold per (date, seed) — dates are
      // hashed once globally, then joined to nations), take per-slot
      // minima as the signature, score signature agreement / k, and
      // re-derive the exact set Jaccard from distinct counts. est is
      // sum/128 (power of two — exact in binary), exact is a small-int
      // ratio: both divisions are bit-identical across engines. The
      // nation pair grid comes from the signature table itself (every
      // nation has all 128 slots), with zero-overlap pairs kept via the
      // left join + coalesce.
      "minhash_nation_orderdates" ->
        s"""WITH d AS MATERIALIZED (
           |  SELECT n.n_name AS nation, CAST(o.o_orderdate AS VARCHAR) AS k
           |  FROM orders o
           |  JOIN customer c ON o.o_custkey = c.c_custkey
           |  JOIN nation n ON c.c_nationkey = n.n_nationkey
           |  GROUP BY 1, 2),
           |dk AS (SELECT DISTINCT k FROM d),
           |seeds(sd) AS (SELECT * FROM range(0, 128)),
           |items AS (SELECT k, ${SqlMurmur.itemsOfK} AS its FROM dk),
           |raw AS (SELECT k, sd,
           |    list_reduce(list_prepend(CAST(sd AS BIGINT), its),
           |      (h, k) -> ${SqlMurmur.mixStep}) AS h0,
           |    CAST(length(k) AS BIGINT) AS n
           |  FROM items, seeds),
           |${SqlMurmur.fmixCtes("k, sd")},
           |sig AS MATERIALIZED (SELECT d.nation, f3.sd, min(f3.hv) AS mh
           |  FROM d JOIN f3 USING (k) GROUP BY 1, 2),
           |est AS (SELECT a.nation AS nation_a, b.nation AS nation_b,
           |    CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS DOUBLE)
           |      / 128 AS est_jaccard
           |  FROM sig a JOIN sig b ON a.sd = b.sd AND a.nation < b.nation
           |  GROUP BY 1, 2),
           |sz AS (SELECT nation, CAST(count(*) AS BIGINT) AS n
           |  FROM d GROUP BY 1),
           |inter AS (SELECT a.nation AS nation_a, b.nation AS nation_b,
           |    CAST(count(*) AS BIGINT) AS i
           |  FROM d a JOIN d b ON a.k = b.k AND a.nation < b.nation
           |  GROUP BY 1, 2)
           |SELECT est.nation_a, est.nation_b, est.est_jaccard,
           |  CAST(coalesce(inter.i, 0) AS DOUBLE)
           |    / CAST(sa.n + sb.n - coalesce(inter.i, 0) AS DOUBLE)
           |    AS exact_jaccard
           |FROM est
           |LEFT JOIN inter USING (nation_a, nation_b)
           |JOIN sz sa ON sa.nation = est.nation_a
           |JOIN sz sb ON sb.nation = est.nation_b""".stripMargin,

      // aHash dedup from first principles, like its pHash sibling below:
      // the oracle re-derives every gradient pixel from the fabrication
      // formula (incl. the +5e6 re-encode and +6e6 flipped-pixel plants),
      // block-averages to the 8×8 grid with the same integer divisions,
      // thresholds at the integer mean-of-means, and takes ALL-PAIRS
      // hamming ≤ 2 — which must equal the engine's pigeonhole-blocked
      // pair set exactly (blocking is pure candidate generation). The
      // 64-bit hash rides as two 32-bit halves so xor/bit_count stay in
      // non-negative BIGINT range.
      "multimodal_image_dedup" ->
        """WITH ids AS (
          |  SELECT doc_id AS id, doc_id AS id0, 0 AS flip FROM documents
          |  UNION ALL
          |  SELECT doc_id + 5000000, doc_id, 0 FROM documents
          |    WHERE doc_id % 10 = 0
          |  UNION ALL
          |  SELECT doc_id + 6000000, doc_id, 1 FROM documents
          |    WHERE doc_id % 15 = 0),
          |d AS (SELECT id, id0 % 199 AS base, 2 + id0 % 7 AS sx,
          |    3 + id0 % 11 AS sy, flip FROM ids),
          |px AS (SELECT d.id, X.x AS x, Y.y AS y,
          |    (base + X.x * sx + Y.y * sy) % 256
          |      + CASE WHEN flip = 1 AND X.x = 3 AND Y.y = 3
          |          THEN CASE WHEN (base + 3 * sx + 3 * sy) % 256 = 255
          |               THEN -255 ELSE 1 END
          |          ELSE 0 END AS p
          |  FROM d, range(0, 64) X(x), range(0, 64) Y(y)),
          |blk AS (SELECT id, (y // 8) * 8 + (x // 8) AS b,
          |    CAST(sum(p) // 64 AS BIGINT) AS m
          |  FROM px GROUP BY 1, 2),
          |tot AS (SELECT id, CAST(sum(m) // 64 AS BIGINT) AS mn
          |  FROM blk GROUP BY 1),
          |hsh AS (SELECT blk.id,
          |    CAST(sum(CASE WHEN blk.b < 32 AND blk.m >= tot.mn
          |        THEN CAST(1 AS BIGINT) << blk.b ELSE 0 END) AS BIGINT)
          |      AS lo,
          |    CAST(sum(CASE WHEN blk.b >= 32 AND blk.m >= tot.mn
          |        THEN CAST(1 AS BIGINT) << (blk.b - 32) ELSE 0 END)
          |      AS BIGINT) AS hi
          |  FROM blk JOIN tot USING (id) GROUP BY 1)
          |SELECT a.id AS id_a, b.id AS id_b,
          |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
          |    AS BIGINT) AS hamming
          |FROM hsh a JOIN hsh b ON a.id < b.id
          |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
          |  <= 2""".stripMargin,

      // pHash from first principles: the oracle never decodes a PNG — it
      // re-derives the gradient pixels from the fabrication formula and
      // runs the same integer separable DCT.
      "multimodal_phash_dct" ->
        """WITH d AS MATERIALIZED (SELECT doc_id, doc_id % 199 AS base,
          |    2 + doc_id % 7 AS sx, 3 + doc_id % 11 AS sy
          |  FROM documents WHERE doc_id % 5 = 0),
          |ct AS MATERIALIZED (SELECT u.u AS u, x.x AS x,
          |    CAST(floor(cos((2 * x.x + 1) * u.u * pi() / 64.0) * 10000.0
          |      + 0.5) AS BIGINT) AS c
          |  FROM range(0, 8) u(u), range(0, 32) x(x)),
          |px AS MATERIALIZED (SELECT d.doc_id, X.x AS gx, Y.y AS gy,
          |    CAST((base + (2 * X.x) * sx + (2 * Y.y) * sy) % 256
          |       + (base + (2 * X.x + 1) * sx + (2 * Y.y) * sy) % 256
          |       + (base + (2 * X.x) * sx + (2 * Y.y + 1) * sy) % 256
          |       + (base + (2 * X.x + 1) * sx + (2 * Y.y + 1) * sy) % 256
          |      AS BIGINT) AS p
          |  FROM d, range(0, 32) X(x), range(0, 32) Y(y)),
          |g AS MATERIALIZED (SELECT px.doc_id, ct.u, px.gy,
          |    CAST(sum(px.p * ct.c) AS BIGINT) AS gv
          |  FROM px JOIN ct ON ct.x = px.gx GROUP BY 1, 2, 3),
          |f AS MATERIALIZED (SELECT g.doc_id, g.u, ct.u AS v,
          |    CAST(sum(g.gv * ct.c) AS BIGINT) AS fv
          |  FROM g JOIN ct ON ct.x = g.gy GROUP BY 1, 2, 3),
          |tot AS (SELECT doc_id, CAST(sum(CASE WHEN u = 0 AND v = 0
          |      THEN 0 ELSE fv END) AS BIGINT) AS t
          |  FROM f GROUP BY 1)
          |SELECT f.doc_id,
          |  string_agg(CASE WHEN f.u = 0 AND f.v = 0 THEN '0'
          |      WHEN 63 * f.fv > tot.t THEN '1' ELSE '0' END, ''
          |    ORDER BY f.u * 8 + f.v) AS phash,
          |  CAST(sum(CASE WHEN NOT (f.u = 0 AND f.v = 0)
          |      AND 63 * f.fv > tot.t THEN 1 ELSE 0 END) AS INT) AS n_set
          |FROM f JOIN tot USING (doc_id)
          |GROUP BY f.doc_id""".stripMargin,

      "curate_kcenter" -> kcenterOracle,

      "embed_covariance" ->
        """WITH q AS (SELECT list_transform(embedding,
          |    x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS e
          |  FROM embeddings),
          |p AS (SELECT i.i - 1 AS dim_i, j.j - 1 AS dim_j,
          |    e[CAST(i.i AS INT)] AS xi, e[CAST(j.j AS INT)] AS xj
          |  FROM q, range(1, 65) i(i), range(1, 65) j(j)
          |  WHERE j.j >= i.i)
          |SELECT CAST(dim_i AS INT) AS dim_i, CAST(dim_j AS INT) AS dim_j,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(xi) AS BIGINT) AS s_i,
          |  CAST(sum(xj) AS BIGINT) AS s_j,
          |  CAST(sum(xi * xj) AS BIGINT) AS s_ij
          |FROM p GROUP BY 1, 2""".stripMargin,

      "drift_embedding_shift" ->
        """WITH v AS (SELECT CASE WHEN vec_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS grp,
          |    list_transform(embedding, x -> CAST(x AS DOUBLE)) e FROM embeddings),
          |ex AS (SELECT grp, CAST(i - 1 AS INT) AS dim, e[CAST(i AS INT)] AS x
          |       FROM v, range(1, 65) r(i)),
          |g AS (SELECT grp, dim, list_sort(list(x)) AS xs, count(*) AS n
          |      FROM ex GROUP BY 1, 2),
          |m AS (SELECT grp, dim,
          |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs), (a, b) -> a + b)
          |      / CAST(n AS DOUBLE) AS mean
          |  FROM g),
          |w AS (SELECT dim, max(CASE WHEN grp = 'ref' THEN mean END) AS r,
          |    max(CASE WHEN grp = 'cur' THEN mean END) AS c
          |  FROM m GROUP BY 1),
          |f AS (SELECT
          |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          |      list((r - c) * (r - c) ORDER BY dim)), (a, b) -> a + b) AS d2,
          |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          |      list(r * c ORDER BY dim)), (a, b) -> a + b) AS xy,
          |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          |      list(r * r ORDER BY dim)), (a, b) -> a + b) AS xx,
          |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          |      list(c * c ORDER BY dim)), (a, b) -> a + b) AS yy
          |  FROM w)
          |SELECT round(sqrt(d2), 6) AS l2_shift,
          |  round(xy / (sqrt(xx) * sqrt(yy)), 6) AS mean_cosine
          |FROM f""".stripMargin,
      "embed_mean_pool" ->
        """WITH v AS (SELECT vec_id % 10 AS grp, list_transform(embedding, x -> CAST(x AS DOUBLE)) e FROM embeddings),
          |ex AS (SELECT grp, CAST(i - 1 AS INT) AS dim, e[CAST(i AS INT)] AS x
          |       FROM v, range(1, 65) r(i)),
          |g AS (SELECT grp, dim, list_sort(list(x)) AS xs, count(*) AS n
          |      FROM ex GROUP BY 1, 2)
          |SELECT CAST(grp AS BIGINT) AS grp, dim,
          |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs), (a, b) -> a + b) / CAST(n AS DOUBLE) AS mean
          |FROM g""".stripMargin,
      "text_langid" ->
        s"WITH f AS (SELECT doc_id, $scoreSel FROM documents) SELECT doc_id, $langCase AS langid FROM f",
      "text_readability" ->
        s"""WITH b AS (SELECT doc_id,
           |    CAST(len($toksSql) AS BIGINT) AS n_words,
           |    greatest(CAST(1 AS BIGINT), CAST(len(list_filter(
           |      regexp_split_to_array(text, '[.!?]+'),
           |      s -> trim(s) <> '')) AS BIGINT)) AS n_sentences,
           |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
           |      AS BIGINT) AS n_syllables
           |  FROM documents)
           |SELECT doc_id, n_words, n_sentences, n_syllables,
           |  round(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
           |    + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
           |    - 15.59, 6) AS fk_grade
           |FROM b WHERE n_words > 0""".stripMargin,
      "text_quality" -> {
        val len = "CAST(length(text) AS DOUBLE)"
        val words = s"greatest(CAST(len($toksSql) AS DOUBLE), 1.0)"
        val punct = s"($len - CAST(length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE))"
        val stop = s"CAST(${markerSql(TextOps.LangMarkers.flatMap(_._2))} AS DOUBLE)"
        s"""SELECT doc_id,
           | least(1.0, $len / 500.0) * 0.3 +
           | (1.0 - least(1.0, $punct / $words)) * 0.3 +
           | least(1.0, $stop * 5.0 / $words) * 0.2 +
           | least(1.0, $words / 100.0) * 0.2 AS quality
           |FROM documents""".stripMargin
      },
      "curate_token_budget" ->
        s"""WITH scored AS (SELECT doc_id AS id,
           |  coalesce($roundedQualitySql, 0.0) AS quality,
           |  coalesce(CAST(len($toksSql) AS BIGINT), 0) AS n_tokens
           |  FROM documents),
           |c AS (SELECT id, quality, n_tokens,
           |  sum(n_tokens) OVER (ORDER BY quality DESC, id ASC
           |    ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM scored)
           |SELECT id AS doc_id, quality, n_tokens,
           |  CAST(cum AS BIGINT) AS cum_tokens
           |FROM c WHERE cum <= 8000""".stripMargin,
      "curate_ablation" ->
        s"""WITH f0 AS (SELECT doc_id AS id, text, $scoreSel FROM documents),
           |f AS (SELECT id,
           |  CAST(($langCase <> 'en') AS INT) AS f_lang,
           |  CAST(($roundedQualitySql < 0.6) AS INT) AS f_quality,
           |  CAST((len($toksSql) < 20) AS INT) AS f_short,
           |  md5($normTextSql) AS fp
           |  FROM f0),
           |rep AS (SELECT fp, min(id) AS keep_id FROM f GROUP BY 1),
           |g AS (SELECT f.*,
           |    f_lang + f_quality + f_short +
           |      CAST(f.id <> rep.keep_id AS INT) AS nfails,
           |    CAST(f.id <> rep.keep_id AS INT) AS f_dup
           |  FROM f JOIN rep ON rep.fp = f.fp),
           |a AS (SELECT
           |  CAST(coalesce(sum(f_lang), 0) AS BIGINT) AS lf,
           |  CAST(coalesce(sum(CAST(f_lang = 1 AND nfails = 1 AS INT)), 0) AS BIGINT) AS lu,
           |  CAST(coalesce(sum(f_quality), 0) AS BIGINT) AS qf,
           |  CAST(coalesce(sum(CAST(f_quality = 1 AND nfails = 1 AS INT)), 0) AS BIGINT) AS qu,
           |  CAST(coalesce(sum(f_short), 0) AS BIGINT) AS sf,
           |  CAST(coalesce(sum(CAST(f_short = 1 AND nfails = 1 AS INT)), 0) AS BIGINT) AS su,
           |  CAST(coalesce(sum(f_dup), 0) AS BIGINT) AS df,
           |  CAST(coalesce(sum(CAST(f_dup = 1 AND nfails = 1 AS INT)), 0) AS BIGINT) AS du,
           |  CAST(coalesce(sum(CAST(nfails = 0 AS INT)), 0) AS BIGINT) AS kept
           |  FROM g)
           |SELECT 'lang' AS rule, lf AS n_flagged, lu AS n_unique FROM a
           |UNION ALL SELECT 'quality', qf, qu FROM a
           |UNION ALL SELECT 'short', sf, su FROM a
           |UNION ALL SELECT 'dup', df, du FROM a
           |UNION ALL SELECT 'kept', kept, kept FROM a""".stripMargin,

      "text_fertility" -> {
        val bpe = s"len(regexp_extract_all(text, '${TextOps.BpePattern.replace("'", "''")}'))"
        s"""WITH f0 AS (SELECT text, $scoreSel FROM documents),
           |f AS (SELECT $langCase AS langid,
           |    CAST(len($toksSql) AS BIGINT) AS ws,
           |    CAST($bpe AS BIGINT) AS bpe,
           |    CAST(length(text) AS BIGINT) AS chars
           |  FROM f0),
           |a AS (SELECT langid, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(ws) AS BIGINT) AS sum_ws_tokens,
           |    CAST(sum(bpe) AS BIGINT) AS sum_bpe_tokens,
           |    CAST(sum(chars) AS BIGINT) AS sum_chars
           |  FROM f GROUP BY 1)
           |SELECT langid, n_docs, sum_ws_tokens, sum_bpe_tokens, sum_chars,
           |  round(CAST(sum_bpe_tokens AS DOUBLE) /
           |    nullif(CAST(sum_ws_tokens AS DOUBLE), 0.0), 6) AS fertility,
           |  round(CAST(sum_chars AS DOUBLE) /
           |    nullif(CAST(sum_bpe_tokens AS DOUBLE), 0.0), 6) AS chars_per_token
           |FROM a""".stripMargin
      },

      "text_tokens" ->
        s"""SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_ws_tokens,
           | CAST(len(regexp_extract_all(text, '${TextOps.BpePattern.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens
           |FROM documents""".stripMargin,
      // coalesce mirrors Spark's null path: tokens(NULL) -> NULL array ->
      // concat_ws skips the null and emits '' — DuckDB's array_to_string
      // would emit NULL instead.
      "text_stem_lite" ->
        s"""SELECT doc_id, coalesce(array_to_string(list_transform($toksSql, t ->
           |  CASE WHEN t LIKE '%ing' AND length(t) > 5
           |         THEN t[1:length(t) - 3]
           |       WHEN t LIKE '%ed' AND length(t) > 4
           |         THEN t[1:length(t) - 2]
           |       WHEN t LIKE '%s' AND t NOT LIKE '%ss' AND length(t) > 3
           |         THEN t[1:length(t) - 1]
           |       ELSE t END), ' '), '') AS stemmed
           |FROM documents""".stripMargin,

      "pipeline_dedup_split" ->
        s"""WITH f AS (SELECT doc_id, text, md5($normTextSql) AS fp
           |  FROM documents),
           |k AS (SELECT doc_id, text FROM (
           |    SELECT doc_id, text,
           |      min(doc_id) OVER (PARTITION BY fp) AS keep FROM f)
           |  WHERE doc_id = keep),
           |q AS (SELECT doc_id, $roundedQualitySql AS quality FROM k),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
           |r AS (SELECT doc_id, quality, CAST(row_number() OVER
           |    (ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rank
           |  FROM q)
           |SELECT doc_id, quality, rank,
           |  CASE WHEN (${OracleSql.knuth32("doc_id")}) % 1000 < 100
           |    THEN 'val' ELSE 'train' END AS split
           |FROM r, n WHERE rank <= CAST(ceil(0.5 * n) AS BIGINT)""".stripMargin,

      "text_fingerprint" ->
        s"SELECT doc_id, md5($normTextSql) AS fingerprint FROM documents",
      "sample_top_fraction" ->
        s"""WITH f AS (SELECT doc_id, $roundedQualitySql AS quality FROM documents),
           |r AS (SELECT doc_id, quality,
           |  CAST(row_number() OVER (ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rank,
           |  count(*) OVER () AS n FROM f)
           |SELECT doc_id, quality, rank FROM r WHERE rank <= ceil(0.3 * n)""".stripMargin,
      "curate_corpus" ->
        curateSql(roundedQualitySql, scoreSel, langCase, recursive = false,
          dupCte = """dup AS (SELECT DISTINCT id_b AS id FROM qp)"""),
      "curate_corpus_cc" -> {
        curateSql(roundedQualitySql, scoreSel, langCase, recursive = true,
          dupCte = """edges AS (SELECT id_a AS s, id_b AS d FROM qp
            |  UNION ALL SELECT id_b, id_a FROM qp),
            |cnodes AS (SELECT DISTINCT s AS id FROM edges),
            |walk(id, lbl) AS (
            |  SELECT id, id FROM cnodes
            |  UNION
            |  SELECT e.d, w.lbl FROM walk w JOIN edges e ON e.s = w.id),
            |dup AS (SELECT id FROM walk GROUP BY id HAVING min(lbl) <> id)""".stripMargin)
      },
      "text_keywords_topk" ->
        s"""WITH tok AS (SELECT doc_id AS id, unnest($toksSql) AS term FROM documents),
           |tf AS (SELECT id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
           |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |n AS (SELECT count(*) AS n FROM documents),
           |sc AS (SELECT id, term,
           |    round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
           |  FROM tf JOIN dfq USING (term), n),
           |r AS (SELECT id, term, tfidf, row_number() OVER (
           |    PARTITION BY id
           |    ORDER BY CAST(tfidf AS DECIMAL(18,6)) DESC, term ASC) AS rk
           |  FROM sc)
           |SELECT id AS doc_id, CAST(rk AS INT) AS rk, term, tfidf
           |FROM r WHERE rk <= 3""".stripMargin,

      "text_tfidf" ->
        s"""WITH tok AS (SELECT doc_id AS id, unnest($toksSql) AS term FROM documents),
           |tf AS (SELECT id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
           |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |n AS (SELECT count(*) AS n FROM documents)
           |SELECT id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           | round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
           |FROM tf JOIN dfq USING (term), n""".stripMargin,
      // Mirrors Profile.corpusStats: quality summed as 6dp DECIMAL (exact,
      // order-invariant on both engines), means as one double division of
      // exact operands + 6dp round.
      "corpus_stats" ->
        s"""WITH f AS (SELECT doc_id, text, $scoreSel FROM documents),
           |d AS (SELECT $langCase AS langid,
           |  CAST(length(text) AS BIGINT) AS len,
           |  CAST(len($toksSql) AS BIGINT) AS toks,
           |  CAST($roundedQualitySql AS DECIMAL(18,6)) AS q,
           |  md5($normTextSql) AS fp FROM f)
           |SELECT langid, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(toks) AS BIGINT) AS tokens_total,
           |  min(len) AS len_min, max(len) AS len_max,
           |  round(CAST(sum(len) AS DOUBLE) / count(*), 6) AS mean_len,
           |  round(CAST(sum(q) AS DOUBLE) / count(*), 6) AS mean_quality,
           |  CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups
           |FROM d GROUP BY 1""".stripMargin,
      "pii_luhn_cards" -> {
        val dig = "CAST(substr(card, length(card) - CAST(i AS INT) + 1, 1) AS INT)"
        s"""WITH f AS (SELECT doc_id, concat(text, ' card ',
           |    lpad(CAST((doc_id * 1000000007 + 123456789) % 10000000000000000
           |      AS VARCHAR), 16, '0')) AS ptext FROM documents),
           |c AS (SELECT doc_id, unnest(regexp_extract_all(ptext, '\\d{16}')) AS card
           |  FROM f)
           |SELECT doc_id,
           |  concat('************', substr(card, 13, 4)) AS card_masked,
           |  (list_reduce(list_prepend(0, list_transform(range(1, length(card) + 1),
           |    i -> CASE WHEN i % 2 = 0
           |      THEN (CASE WHEN 2 * $dig > 9 THEN 2 * $dig - 9 ELSE 2 * $dig END)
           |      ELSE $dig END)), (a, b) -> a + b) % 10 = 0) AS luhn_valid
           |FROM c""".stripMargin
      },

      "text_pii_redact" -> {
        val pats = TextOps.PiiPatterns
        val redacted = pats.foldLeft("ptext") { case (e, (_, p, r)) =>
          s"regexp_replace($e, '$p', '$r', 'g')"
        }
        val counts = pats.map { case (nm, p, _) =>
          s"CAST(len(regexp_extract_all(ptext, '$p')) AS BIGINT) AS n_$nm"
        }
        s"""WITH p AS ($plantedPiiSql)
           |SELECT doc_id, $redacted AS redacted, ${counts.mkString(", ")} FROM p""".stripMargin
      },
      "multimodal_resize" ->
        """SELECT doc_id,
          | greatest(1, CAST((n_chars % 64 + 1) // 2 AS INT)) AS width,
          | greatest(1, CAST((n_chars % 48 + 1) // 2 AS INT)) AS height,
          | CAST(doc_id % 256 AS INT) AS r,
          | CAST((doc_id * 7) % 256 AS INT) AS g,
          | CAST((doc_id * 13) % 256 AS INT) AS b
          |FROM documents""".stripMargin,
      "multimodal_frames" ->
        """SELECT doc_id, CAST(k AS INT) AS frame_idx,
          | CAST(doc_id % 16 + 1 AS INT) AS width,
          | CAST(doc_id % 12 + 1 AS INT) AS height,
          | CAST((doc_id + 11 * k) % 256 AS INT) AS r,
          | CAST((doc_id * 7 + 11 * k) % 256 AS INT) AS g,
          | CAST((doc_id * 13 + 11 * k) % 256 AS INT) AS b
          |FROM documents, range(0, 3) t(k)
          |WHERE k % 2 = 0 AND k < doc_id % 3 + 1""".stripMargin,
      // Waveform sum capped by formula (n ≤ 439 < 440), so the constant
      // range needs no data guard.
      "multimodal_audio_dft" ->
        """WITH d AS (SELECT doc_id,
          |    CAST(n_chars % 400 + 40 AS BIGINT) AS n,
          |    doc_id % 97 + 3 AS k
          |  FROM documents WHERE doc_id % 5 = 0),
          |t AS MATERIALIZED (SELECT doc_id, u.u AS bin, i.i AS i, n,
          |    ((i.i * k) % 2001 - 1000) * 16 AS s
          |  FROM d, range(0, 440) i(i), range(1, 9) u(u) WHERE i.i < n),
          |b AS (SELECT doc_id, CAST(bin AS INT) AS bin,
          |    CAST(sum(s * CAST(floor(cos(2 * pi() * bin * i / n)
          |      * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS re,
          |    CAST(sum(s * CAST(floor(sin(2 * pi() * bin * i / n)
          |      * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS im
          |  FROM t GROUP BY 1, 2)
          |SELECT doc_id, bin, re, im,
          |  CAST(CAST(re AS DECIMAL(38,0)) * re +
          |    CAST(im AS DECIMAL(38,0)) * im AS VARCHAR) AS power
          |FROM b""".stripMargin,

      "multimodal_audio" ->
        """WITH d AS (SELECT doc_id,
          |    CAST(8000 * (doc_id % 2 + 1) AS INT) AS sample_rate,
          |    CAST(n_chars % 400 + 40 AS BIGINT) AS n,
          |    doc_id % 97 + 3 AS k FROM documents),
          |a AS (SELECT doc_id,
          |    max(abs(((i * k) % 2001 - 1000) * 16)) AS peak,
          |    sum(abs(((i * k) % 2001 - 1000) * 16)) AS sum_abs
          |  FROM d, range(0, 440) r(i) WHERE i < n GROUP BY doc_id)
          |SELECT d.doc_id, sample_rate, CAST(1 AS INT) AS channels,
          |  CAST(16 AS INT) AS bits, n AS n_samples,
          |  (n * 1000) // sample_rate AS duration_ms,
          |  CAST(peak AS INT) AS peak, CAST(sum_abs AS BIGINT) AS sum_abs
          |FROM d JOIN a USING (doc_id)""".stripMargin,

      "multimodal_audio_vad" ->
        """WITH d AS (SELECT doc_id, CAST(n_chars % 400 + 40 AS BIGINT) AS n,
          |    doc_id % 97 + 3 AS k FROM documents),
          |fr AS (SELECT doc_id, CAST(f AS BIGINT) AS f,
          |    list_sum(list_transform(range(0, 20),
          |      j -> abs(((CAST(f AS BIGINT) * 20 + j) * k) % 2001 - 1000) * 16))
          |      AS energy
          |  FROM d, range(0, 22) r(f) WHERE f < n // 20),
          |nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
          |    CAST(sum(CASE WHEN energy >= 160000 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_active
          |  FROM fr GROUP BY 1),
          |act AS (SELECT doc_id, f,
          |    f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS g
          |  FROM fr WHERE energy >= 160000),
          |seg AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS len
          |  FROM act GROUP BY 1, 2),
          |ss AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
          |    CAST(max(len) AS BIGINT) AS longest_run FROM seg GROUP BY 1)
          |SELECT nf.doc_id, n_frames, n_active,
          |  coalesce(n_segments, 0) AS n_segments,
          |  coalesce(longest_run, 0) AS longest_run,
          |  CASE WHEN n_frames > 0 THEN
          |    round(CAST(n_active AS DOUBLE) / CAST(n_frames AS DOUBLE), 6)
          |    ELSE 0.0 END AS active_ratio
          |FROM nf LEFT JOIN ss USING (doc_id)""".stripMargin,
      "multimodal_decode" ->
        """SELECT doc_id, 'image/png' AS mime,
          | CAST(n_chars % 64 + 1 AS INT) AS width,
          | CAST(n_chars % 48 + 1 AS INT) AS height,
          | CAST(1 AS INT) AS n_frames,
          | CAST(doc_id % 256 AS INT) AS r,
          | CAST((doc_id * 7) % 256 AS INT) AS g,
          | CAST((doc_id * 13) % 256 AS INT) AS b,
          | CAST(doc_id % 256 AS DOUBLE) / 255.0 AS feature0
          |FROM documents""".stripMargin)
  }
}
