package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables.table

/** Sketch-op properties that the DuckDB gate can't check: MinHash recall,
  * SimHash blocking, LSH-vs-brute overlap, dedup representatives. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = table(spark, sf("sf0.001"), "documents")
  private def embs = table(spark, sf("sf0.001"), "embeddings")

  test("minhash LSH pairs = exact ngram pairs on the planted near-dups (full recall here)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashNearDupPairs(docs, "doc_id", "text", 3, 12, 4, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(exact)) // verified-exactly ⇒ never a false positive
    assert(exact.nonEmpty && mh == exact) // planted dups are caught in full
  }

  test("transitive curation collapses a chained cluster; greedy keeps the middle doc") {
    // C is the hub: A~C and B~C qualify (J≈0.85), A~B does not (J≈0.73).
    val base = (1 to 40).map(i => s"w$i")
    val aT = base.updated(37, "x38").updated(38, "x39").updated(39, "x40")
    val bT = base.updated(0, "y1").updated(1, "y2").updated(2, "y3")
    val d = Seq((1L, aT), (2L, bT), (3L, base))
      .map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text")
    val p = Curation.Params(language = "und", minQuality = 0.0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).toSet
    assert(ids(Curation.curate(d, "doc_id", "text", p)) == Set(1L, 2L))
    assert(ids(Curation.curateTransitive(d, "doc_id", "text", p)) == Set(1L))
  }

  test("quantileNormalize: rank-maps source scales onto the global distribution") {
    // Source A scores {10, 20, 30, 40}; source B {1, 2, 3, 4} — same
    // shape, incomparable scales. Global sorted: 1,2,3,4,10,20,30,40.
    // A's rank-k and B's rank-k share pct, hence the SAME normalized
    // value: pct 250→2, 500→4, 750→20, 1000→40 (type-1 on the grid).
    val df = (Seq(10L, 20L, 30L, 40L).map(("A", _)) ++
      Seq(1L, 2L, 3L, 4L).map(("B", _))).toDF("src", "score")
    val out = Ranking.quantileNormalize(df, "src", "score").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val wantNorm = Map(1 -> 2L, 2 -> 4L, 3 -> 20L, 4 -> 40L)
    for ((rank, a, b) <- Seq((1, 10L, 1L), (2, 20L, 2L), (3, 30L, 3L),
      (4, 40L, 4L))) {
      assert(out(("A", a)) == ((rank * 250L, wantNorm(rank))))
      assert(out(("B", b)) == ((rank * 250L, wantNorm(rank))))
    }
    // Partition invariance (all-integer arithmetic end to end).
    val rep = Ranking.quantileNormalize(df.repartition(5), "src", "score")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(rep == out)
  }

  test("covarianceStats: exact quantized sufficient statistics, partition invariant") {
    // q=1 (scale 2): v1=[1,2]→[2,4], v2=[3,-1]→[6,-2]. Hand sums per cell.
    val v = Seq(Tuple1(Seq(1.0f, 2.0f)), Tuple1(Seq(3.0f, -1.0f)))
      .toDF("embedding")
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val out = cells(Ann.covarianceStats(v, "embedding", quantBits = 1))
    assert(out == Map(
      (0, 0) -> ((2L, 8L, 8L, 40L)),
      (0, 1) -> ((2L, 8L, 2L, -4L)),
      (1, 1) -> ((2L, 2L, 2L, 20L))))
    val rep = cells(Ann.covarianceStats(v.repartition(3), "embedding",
      quantBits = 1))
    assert(rep == out)
    // The finalized covariance off the stats matches the direct formula:
    // cov(0,1) = (s_ij − s_i·s_j/n)/n / 2^2 = (−4 − 8·2/2)/2 / 4 = −1.5
    val (n, si, sj, sij) = out((0, 1))
    assert((sij.toDouble - si.toDouble * sj / n) / n / 4.0 == -1.5)
  }

  test("dctHash: exact copies collide, one-pixel edits stay near, " +
    "different gradients differ") {
    import org.apache.spark.sql.functions.col
    val ids = (1L to 12L).toDF("doc_id")
    val media = Multimodal.fabricateGradients(ids)
      .union(Multimodal.fabricateGradients(
        ids.filter(col("doc_id") === 4), idOffset = 100L))
      .union(Multimodal.fabricateGradients(
        ids.filter(col("doc_id") === 4), idOffset = 200L, flipPixel = true))
    val h = Multimodal.dctHash(spark, media).collect()
      .map(r => r.doc_id -> r).toMap
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    assert(h.values.forall(r => r.phash.length == 64 &&
      r.phash.charAt(0) == '0'))
    assert(h(4L).phash == h(104L).phash) // exact pixel copy
    assert(ham(h(4L).phash, h(204L).phash) <= 4, // one-pixel edit
      s"edit dist: ${ham(h(4L).phash, h(204L).phash)}")
    // distinct gradient frequencies → distinct spectra
    assert(h(1L).phash != h(2L).phash)
    assert(h.values.forall(r => r.n_set == r.phash.count(_ == '1')))
  }

  test("logisticIrls recovers a planted monotone decision boundary") {
    // y = [x1 > 0.5] with x1 on a fine grid and x2 pure noise-free zeros:
    // the fit must put a large positive weight on x1 and ~0 on x2, and
    // classify the grid by the 0.5 threshold.
    val rows = (0 until 400).map { i =>
      val x1 = i / 400.0
      (if (x1 > 0.5) 1.0 else 0.0, x1, (i % 7) / 7.0)
    }
    val df = rows.toDF("y", "x1", "x2")
    val b = Glm.logisticIrls(df, col("y"), col("x1"), col("x2"), iters = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(b("x1") > 5.0, s"planted slope must dominate: $b")
    assert(math.abs(b("x2")) < 1.0, s"noise feature stays small: $b")
    // Boundary: sigmoid crosses 0.5 where b0 + b1·x1 + b2·x2 = 0; with
    // x2 averaging ~0.43 the implied x1 threshold sits near 0.5.
    val thr = -(b("intercept") + b("x2") * (3.0 / 7.0)) / b("x1")
    assert(math.abs(thr - 0.5) < 0.05, s"threshold: $thr")
  }

  test("kCenterCoreset follows the hand-computed farthest-point order") {
    // 1-D line x ∈ {0, 1, 4, 10} (padded to 3 dims): seed = id 1 (x=0);
    // farthest is x=10 (d²=100); then x=4 (min-dist² to {0,10} = 16);
    // then x=1 (min-dist² to {0,10,4} = 1).
    val v = Seq((1L, Seq(0.0f, 0f, 0f)), (2L, Seq(1.0f, 0f, 0f)),
      (3L, Seq(4.0f, 0f, 0f)), (4L, Seq(10.0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Curation.kCenterCoreset(v, "vec_id", "embedding", 4)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq((0, 1L, None), (1, 4L, Some(100.0)),
      (2, 3L, Some(16.0)), (3, 2L, Some(1.0))))
  }

  test("topPrincipalDirection recovers a planted dominant axis") {
    // Variance concentrated on dim 1 (values swing ±8), small independent
    // jitter elsewhere → the top eigvec must point (positively, after
    // sign fix) along dim 1 and explain most of the variance.
    val rows = (0 until 200).map { i =>
      Tuple1(Seq(
        (i % 3 - 1) * 0.05f,
        (if (i % 2 == 0) 8.0f else -8.0f) + (i % 5) * 0.01f,
        (i % 7 - 3) * 0.02f))
    }
    val stats = Ann.covarianceStats(rows.toDF("embedding"), "embedding")
    val out = Ann.topPrincipalDirection(stats, iters = 15)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(out(1)._1 > 0.99, s"dominant loading: ${out(1)}")
    assert(math.abs(out(0)._1) < 0.05 && math.abs(out(2)._1) < 0.05)
    assert(out(1)._2 > 0.99, s"explained ratio: ${out(1)._2}")
    // Unit norm (within 6dp rounding of each loading).
    val nrm = out.values.map(v => v._1 * v._1).sum
    assert(math.abs(nrm - 1.0) < 1e-4, s"norm²: $nrm")
  }

  test("crossSourceMatrix: unordered cells, diagonal self-dups, empty pairs") {
    val docs = Seq((1L, "A"), (2L, "B"), (3L, "A"), (4L, "B"), (5L, "C"))
      .toDF("doc_id", "source")
    // pairs: A-B twice (1-2, 3-4 via either order), A-A once (1-3), B-C once
    val pairs = Seq((1L, 2L), (4L, 3L), (1L, 3L), (4L, 5L))
      .toDF("id_a", "id_b")
    val out = Dedup.crossSourceMatrix(pairs, docs, "doc_id", "source")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("A", "B") -> 2L, ("A", "A") -> 1L, ("B", "C") -> 1L))
    assert(Dedup.crossSourceMatrix(pairs.limit(0), docs, "doc_id", "source")
      .count() == 0L)
  }

  test("filterAblation: per-rule totals, unique attribution, shadowed overlap") {
    // 1: clean (kept). 2: exact copy of 1 (dup only). 3: French (lang
    // only). 4: two tokens (short only). 5: French AND short — flagged
    // by two rules, so it raises both totals but NEITHER unique count.
    val d = Seq(
      (1L, "the and of to the"),
      (2L, "the and of to the"),
      (3L, "le les des et le"),
      (4L, "the and"),
      (5L, "le et")).toDF("doc_id", "text")
    val out = Curation.filterAblation(d, "doc_id", "text",
      language = "en", minQuality = 0.1, minTokens = 5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out == Map(
      "lang" -> ((2L, 1L)), "quality" -> ((0L, 0L)),
      "short" -> ((2L, 1L)), "dup" -> ((1L, 1L)), "kept" -> ((1L, 1L))))
    // Empty corpus: the 5-row spine with all-zero counts, not nulls.
    val empty = d.limit(0)
    val z = Curation.filterAblation(empty, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(z.length == 5 && z.forall(_ == ((0L, 0L))))
  }

  test("tokenBudgetSelect keeps exactly the in-budget quality-ranked prefix") {
    val docs = table(spark, sf("sf0.001"), "documents")
    val budget = 2000L
    val got = Curation.tokenBudgetSelect(docs, "doc_id", "text", budget)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // local recompute: sort by (quality desc, id asc), running cum, prefix cut
    val scored = docs.select(col("doc_id"),
        round(TextOps.qualityScore(col("text")), 6).as("q"),
        TextOps.tokenCountWhitespace(col("text")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, q, _) => (-q, id) }
    var cum = 0L
    val want = scored.flatMap { case (id, _, n) =>
      cum += n; if (cum <= budget) Some((id, cum)) else None
    }
    assert(got.toSet == want.toSet)
    assert(got.nonEmpty && got.map(_._2).max <= budget)
  }

  test("incremental dedup: exact twins flagged, cross-set pairs = full graph restricted") {
    val newB = docs.filter(col("doc_id") % 5 === 0).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0).select("doc_id", "text")
    val twins = docs.filter(col("doc_id") % 15 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val flags = Dedup.incrementalFlags(newB, corpus.unionByName(twins),
      "doc_id", "text", 3, 0.8).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(flags.size == newB.count())
    // every doc with a planted twin is an exact dup (and thus a near-dup too)
    flags.filter(_._1 % 15 == 0).values.foreach { case (de, dn, kept) =>
      assert(de && dn && !kept)
    }
    assert(flags.values.exists(_._3)) // most docs survive
    // cross-set near pairs equal the full pair graph restricted to the split
    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantAcross = full.flatMap { case (a, b) =>
      val (n, c) = if (a % 5 == 0) (a, b) else (b, a)
      if (n % 5 == 0 && c % 5 != 0) Some((n, c)) else None
    }
    val across = Dedup.ngramJaccardPairsAcross(newB, corpus, "doc_id", "text", 3, 0.8)
      .select("id_l", "id_r").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(across == wantAcross)
  }

  test("containmentPairs = all-pairs containment; catches fragments Jaccard misses") {
    import spark.implicits._
    // doc 1: 40 tokens; doc 2: its first 12 tokens (fragment); doc 3: noise
    val words = (1 to 40).map(i => s"w$i")
    val d = Seq(
      (1L, words.mkString(" ")),
      (2L, words.take(12).mkString(" ")),
      (3L, (1 to 30).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the fragment is fully contained in its source; nothing else matches
    assert(got == Map((2L, 1L) -> 1.0))
    // Jaccard at the same τ misses it (10 shared / 38 union ≈ 0.26)
    assert(Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.8).count() == 0)
    // prefix-filtered output = brute-force all-pairs containment
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    val brute = sets.select(col("id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(sets.select(col("id").as("id_b"), col("sh").as("sh_b")))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(col("sh_a")).cast("double"), 6).as("c"))
      .filter(col("c") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val filtered = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(filtered == brute)
  }

  test("hot-shingle regime (hotDf=1) = rare regime bit-for-bit on all three " +
      "pair operators") {
    // hotDf = 1 marks every df ≥ 2 shingle HOT, forcing the hybrid plan
    // (rare co-occurrence + prefix candidates + hot counts + full-outer
    // merge) on corpora whose default plan is the pure co-occurrence
    // regime. Every shared shingle of every true pair is df ≥ 2 by
    // definition, so this routes ALL intersection mass through the
    // candidate-restricted hot path — the strongest exactness exercise.
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8, hotDf = 1L))
      == pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)))
    assert(pairs(Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8, hotDf = 1L))
      == pairs(Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8)))
    val newB = docs.filter(col("doc_id") % 7 === 0)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    assert(pairs(Dedup.ngramJaccardPairsAcross(newB, corpus, "doc_id", "text", 3, 0.8, hotDf = 1L))
      == pairs(Dedup.ngramJaccardPairsAcross(newB, corpus, "doc_id", "text", 3, 0.8)))
  }

  test("winnowing: insertion-robust shared fingerprints, noise isolated, " +
      "partition invariant") {
    import spark.implicits._
    val words = (1 to 40).map(i => s"w$i")
    // B = A with one token inserted mid-way: fixed-stride sampling
    // desynchronizes here; winnowing's local minima don't.
    val d = Seq(
      (1L, words.mkString(" ")),
      (2L, (words.take(20) ++ Seq("INS") ++ words.drop(20)).mkString(" ")),
      (3L, (1 to 40).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(d, "doc_id", "text", k = 4, w = 8,
      minShared = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L))) // noise doc shares nothing
    // guarantee: shared runs of >= k+w-1 = 11 tokens flank the insertion,
    // each must contribute >= 1 shared fingerprint
    assert(pairs((1L, 2L)) >= 2L)
    // fingerprint sets are a pure function of the text — partition invariant
    val f1 = Dedup.winnowFingerprints(d, "doc_id", "text", 4, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val f2 = Dedup.winnowFingerprints(d.repartition(7), "doc_id", "text", 4, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(f1 == f2 && f1.nonEmpty)
    // density: a doc's fingerprints never exceed its window count (m-w+1)
    val n1 = f1.count(_._1 == 1L)
    assert(n1 >= 1 && n1 <= 40 - 3 - 7) // m = 37 grams, 30 windows
    // sub-k-token docs emit nothing
    assert(Dedup.winnowFingerprints(
      Seq((9L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 4, 8)
      .count() == 0)
  }

  test("connected components collapse chains, stars and cliques to min-id labels") {
    // chain 1-2-3-4, star 10-{11,12,13}, clique {20,21,22}, isolated pair 30-31
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (10L, 13L), (20L, 21L), (20L, 22L), (21L, 22L), (30L, 31L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L, 13L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(cc(_) == 20L))
    assert(Seq(30L, 31L).forall(cc(_) == 30L))
    assert(cc.size == 13)
    // the distributed min-label path (threshold 0) produces the same labeling
    val dist = Dedup.connectedComponents(pairs, "id_a", "id_b",
      localEdgeThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist == cc)
  }

  test("duplicate substring spans: cross-doc overlap merge, within-doc repeat, short docs") {
    val docs = Seq(
      (0L, "a b c d e f g h"),          // shares run "a b c d e" with doc 1
      (1L, "x y a b c d e q"),
      (2L, "zz ww"),                     // shorter than n: no grams, no spans
      (3L, "p q r s p q r t"),          // within-doc repeated gram "p q r"
      (4L, null.asInstanceOf[String])    // null text: no spans
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // doc 0: grams abc,bcd,cde at pos 0,1,2 -> one merged span [0,4] (5 toks)
    // doc 1: same grams at pos 2,3,4 -> [2,6]
    // doc 3: "p q r" at pos 0 and 4 -> two islands [0,2] and [4,6] (gap at 3)
    assert(spans == Set((0L, 0L, 4L, 5L), (1L, 2L, 6L, 5L),
      (3L, 0L, 2L, 3L), (3L, 4L, 6L, 3L)))
  }

  test("distributed components match local union-find on randomized graphs") {
    // Structure-free parity for the star-contraction loop (the chain
    // tests below pin the diameter regime; this pins ARBITRARY shapes):
    // same pairs through both regimes, labelings must be identical maps.
    val rnd = new scala.util.Random(1414)
    (1 to 3).foreach { trial =>
      val n = 60 + rnd.nextInt(40)
      val pairs = Seq.fill(120)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
        .toDF("id_a", "id_b")
      val local = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val dist = Dedup.connectedComponents(pairs, "id_a", "id_b",
        localEdgeThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(dist == local, s"trial $trial: distributed != local")
    }
  }

  test("distributed components converge within the cap on a long chain") {
    // A 300-node path has diameter 299: a 1-hop min-label loop needs
    // ~299 rounds (>> the 25-round cap), which is exactly how the
    // graph_robustness hub CHAIN failed the first full 100× screen. Star
    // contraction must label it within the default cap — and every
    // label must be the path min.
    val chain = (1L to 300L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(chain, "id_a", "id_b",
      localEdgeThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc.size == 300 && cc.values.forall(_ == 1L))
  }

  test("distributed components converge on long chains with NON-MONOTONE ids") {
    // The r14 witness-doubling loop was logarithmic only when ids grow
    // monotonically along paths: its pointer update p'(v) = p(p(v))
    // froze at every local id minimum (p(m) = m), reverting to one hop
    // per round — a shuffled-id 300-chain hard-failed maxIters = 25
    // (r15 advisor catch). Star contraction is id-layout-free; both
    // adversarial layouts must converge within the default cap and
    // match local union-find exactly.
    val rnd = new scala.util.Random(1515)
    val shuffledIds = rnd.shuffle((1L to 300L).toVector)
    val shuffled = shuffledIds.sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    // sawtooth: ids alternate low/high along the path, planting a local
    // minimum at every other node — the worst case for pointer freezing
    val sawIds = (1L to 150L).flatMap(i => Seq(i, 301L - i))
    val sawtooth = sawIds.sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    Seq(shuffled, sawtooth).foreach { chain =>
      val local = Dedup.connectedComponents(chain, "id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val dist = Dedup.connectedComponents(chain, "id_a", "id_b",
        localEdgeThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(dist.size == 300 && dist.values.forall(_ == 1L))
      assert(dist == local)
    }
  }

  test("connected components fail loudly when the iteration cap is too low") {
    // one star round cannot fully collapse a 300-node path
    val chain = (1L to 300L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, "id_a", "id_b", maxIters = 1,
        localEdgeThreshold = 0L)
    }
  }

  test("per-row SimHash64 expression equals the explode + 64-vote-sum formulation") {
    // the relational form the expression replaced, verbatim
    val tok = docs.select(col("doc_id").as("id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val sums = tok.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    val old = sums.select(col("id"), hash.as("simhash")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val now = Dedup.simhash64(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(now == old)
  }

  test("simhash recalls the planted near-dup pairs (false positives allowed by design)") {
    val planted = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.simhashNearDupPairs(docs, "doc_id", "text", 5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = planted.intersect(sh).size.toDouble / planted.size
    info(s"simhash recall of planted pairs = $recall (pairs=${sh.size})")
    assert(sh.nonEmpty)
    assert(recall >= 0.8, s"recall = $recall")
  }

  test("hard negatives: every hit crosses labels and outranks unpicked cross-label vectors") {
    val emb = table(spark, sf("sf0.001"), "embeddings")
    val lab = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Ann.mineHardNegatives(emb.filter(col("vec_id") < 3), emb,
      "label", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.forall { case (q, v, _, _) => lab(v) != lab(q) })
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L) && byQ.values.forall(_.length == 5))
    // agrees with the unrestricted brute ranking filtered to cross-label
    val brute = Ann.bruteTopK(emb.filter(col("vec_id") < 3), emb, k = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = brute.filter { case (q, v, _) => lab(v) != lab(q) }
      .groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.sortBy { case (_, v, c) => (-c, v) }.take(5).toSeq
      }.toSet
    assert(got.map { case (q, v, c, _) => (q, v, c) }.toSet == want)
  }

  test("LSH top-k results are a subset of each query's bucket-scored space with sane recall") {
    val brute = Ann.bruteTopK(embs.filter(col("vec_id") < 5), embs, 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(embs.filter(col("vec_id") < 5), embs, 10, 64, 6, 4)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    info(s"lsh recall@10 = $recall")
    assert(lsh.nonEmpty)
    assert(recall >= 0.2, s"recall@10 = $recall") // 6 planes × 4 tables on weakly-clustered data
  }

  test("banded-SRP embedding near-dup pairs equal the exact all-pairs result on the planted corpus") {
    val corpus = graft.queries.DataOpsQueries.plantedEmbeddings(embs)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = pairs(Ann.cosineNearDupPairs(corpus, 0.9, 64, planes = 0))
    val srp = pairs(Ann.cosineNearDupPairs(corpus, 0.9, 64, planes = 12, tables = 6))
    assert(exact.nonEmpty)
    assert(srp == exact) // exact verify ⇒ subset; banding recalls every planted pair
  }

  test("SRP geometry scaling: identity at gate sizes, +1 plane per doubling with recall-compensated tables") {
    import Ann.{scaledSrpGeometry, SrpScalePivot}
    // Every oracle-gated corpus (≤ sf0.1's 2000 vectors) keeps the base plan.
    assert(scaledSrpGeometry(2000L, 12, 6, 0.9) == ((12, 6)))
    assert(scaledSrpGeometry(SrpScalePivot, 12, 6, 0.9) == ((12, 6)))
    // One doubling past the pivot = one extra plane; tables grow by 1/a(0.9).
    assert(scaledSrpGeometry(2 * SrpScalePivot, 12, 6, 0.9) == ((13, 8)))
    // The 100× canary point (200k vectors): 5 extra planes.
    val (p200k, t200k) = scaledSrpGeometry(200000L, 12, 6, 0.9)
    assert(p200k == 17 && t200k >= 6 && t200k <= 16, s"($p200k, $t200k)")
    // Bucket-occupancy invariant: candidates/N = tables·N/2^planes never
    // grows past its pivot value by more than the table-compensation term.
    val base = 6.0 * SrpScalePivot / math.pow(2, 12)
    Seq(1L << 14, 1L << 17, 1L << 20, 1L << 26, 1L << 33).foreach { n =>
      val (p, t) = scaledSrpGeometry(n, 12, 6, 0.9)
      val occ = t.toDouble * n / math.pow(2, p)
      assert(occ <= base * t / 6.0 * 1.01, s"n=$n occupancy $occ")
    }
    // Caps hold: planes ≤ 48, tables ≤ 64 at absurd corpus sizes.
    val (pMax, tMax) = scaledSrpGeometry(Long.MaxValue / 4, 12, 6, 0.9)
    assert(pMax <= 48 && tMax <= 64)
  }

  test("l2Normalize yields unit vectors; meanPool is partitioning-invariant") {
    // Unit length after normalization (organic corpus has no zero vectors).
    val normed = embs.select(Ann.norm(Ann.l2Normalize(Ann.asDouble($"embedding"))).as("n"))
      .collect().map(_.getDouble(0))
    normed.foreach(n => assert(math.abs(n - 1.0) < 1e-12, s"norm $n"))
    // Zero vector passes through unscaled.
    val z = Seq(Array(0.0, 0.0, 0.0)).toDF("v")
      .select(Ann.l2Normalize($"v")).head().getSeq[Double](0)
    assert(z == Seq(0.0, 0.0, 0.0))
    // Mean pool: exact same doubles under a different input partitioning
    // (the sorted-fold determinism property).
    val g = embs.select((($"vec_id") % 7).as("grp"), $"embedding")
    val a = Ann.meanPool(g, "grp", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val b = Ann.meanPool(g.repartition(13), "grp", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(a == b)
    // And it is the true elementwise mean on a hand-made group.
    val hand = Seq((0L, Array(1.0, 3.0)), (0L, Array(2.0, 5.0))).toDF("grp", "v")
    val m = Ann.meanPool(hand, "grp", "v").orderBy("dim")
      .collect().map(_.getDouble(2)).toSeq
    assert(m == Seq(1.5, 4.0))
  }

  test("exact dedup keeps one representative per duplicated fingerprint") {
    val dup = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other text"))
      .toDF("doc_id", "text")
    val kept = Dedup.keepRepresentatives(dup, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L)) // whitespace/case-normalized match, min id kept
  }

  test("aHash image dedup: exact re-encodes collide at 0, one-pixel edits " +
      "stay near, chunk blocking = brute force") {
    import spark.implicits._
    val ids = (1L to 24L).toDF("doc_id")
    val media = Multimodal.fabricateGradients(ids)
      .union(Multimodal.fabricateGradients(
        ids.filter(col("doc_id") % 5 === 0), idOffset = 100L))
      .union(Multimodal.fabricateGradients(
        ids.filter(col("doc_id") === 3), idOffset = 200L, flipPixel = true))
    val hashes = Multimodal.averageHash(spark, media)
    val pairs = Multimodal.ahashPairs(spark, hashes, maxDistance = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // exact pixel copies hash identically — hamming 0, found for all 4
    Seq(5L, 10L, 15L, 20L).foreach(i => assert(pairs((i, i + 100L)) == 0L))
    // the one-pixel edit of doc 3 is within distance 2 of its source
    assert(pairs.contains((3L, 203L)) && pairs((3L, 203L)) <= 2L)
    // pigeonhole completeness at <= 7: blocked pairs = brute-force pairs
    val h = hashes.toDF()
    val brute = h.select(col("doc_id").as("id_a"), col("ahash").as("ha"))
      .crossJoin(h.select(col("doc_id").as("id_b"), col("ahash").as("hb")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("d"))
      .filter(col("d") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val blocked = Multimodal.ahashPairs(spark, hashes, maxDistance = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(blocked == brute)
  }

  test("multimodal: ImageIO decode recovers the encoded dimensions and pixels") {
    val out = Multimodal.decodeFeatures(spark,
      Multimodal.fabricateFromDocs(docs)).toDF()
    val bad = out.join(docs, Seq("doc_id")).filter(
      col("width") =!= (col("n_chars") % 64 + 1).cast("int") ||
        col("height") =!= (col("n_chars") % 48 + 1).cast("int") ||
        col("r") =!= (col("doc_id") % 256).cast("int") ||
        col("g") =!= (col("doc_id") * 7 % 256).cast("int") ||
        col("b") =!= (col("doc_id") * 13 % 256).cast("int"))
    assert(bad.isEmpty) // PNG is lossless: decode must round-trip exactly
    assert(out.columns.toSeq == Seq("doc_id", "mime", "byte_len", "width",
      "height", "n_frames", "r", "g", "b", "feature0"))
    // the payload really is a PNG stream (signature + IHDR + IDAT + IEND)
    assert(out.agg(min(col("byte_len"))).head().getLong(0) > 50L)
  }

  test("multimodal: WAV decode recovers format header and exact sample stats") {
    val media = Multimodal.fabricateAudio(docs)
    // the payload really is a RIFF/WAVE container
    val first = media.head()
    assert(new String(first.payload.take(4), "US-ASCII") == "RIFF")
    assert(new String(first.payload.slice(8, 12), "US-ASCII") == "WAVE")
    val out = Multimodal.decodeAudio(spark, media).toDF()
    val bad = out.join(docs, Seq("doc_id")).filter(
      col("sample_rate") =!= (lit(8000) * (col("doc_id") % 2 + 1)).cast("int") ||
        col("channels") =!= 1 || col("bits") =!= 16 ||
        col("n_samples") =!= (col("n_chars") % 400 + 40) ||
        col("duration_ms") =!= expr("n_samples * 1000 div sample_rate"))
    assert(bad.isEmpty) // header fields + frame count round-trip exactly
    // sample stats: recompute one doc's waveform on the driver
    val row = out.join(docs, Seq("doc_id")).orderBy("doc_id").head()
    val id = row.getLong(0)
    val n = (row.getAs[Long]("n_chars") % 400 + 40).toInt
    val k = id % 97 + 3
    val absVals = (0 until n).map(i => math.abs((i * k % 2001 - 1000) * 16))
    assert(row.getAs[Int]("peak") == absVals.max.toInt)
    assert(row.getAs[Long]("sum_abs") == absVals.sum)
  }

  test("IVF top-k recall is comparable to multi-table LSH on this corpus") {
    val brute = Ann.bruteTopK(embs.filter(col("vec_id") < 5), embs, 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(embs.filter(col("vec_id") < 5), embs, 10, 64)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    info(s"ivf recall@10 = $recall")
    assert(ivf.nonEmpty)
    assert(recall >= 0.2, s"recall@10 = $recall")
  }

  test("trained PQ recall beats the fixed-codebook gate floor; a vector's " +
      "reconstruction ranks it first") {
    val q = embs.filter(col("vec_id") < 5)
    val brute = Ann.bruteTopKL2(q, embs, 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val books = Ann.pqCodebooks(embs, dim = 64, m = 8, c = 16, iters = 3)
    val pq = Ann.pqTopK(q, embs, books, 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pq.intersect(brute).size.toDouble / brute.size
    info(s"trained pq recall@10 = $recall")
    assert(recall >= 0.2, s"recall@10 = $recall")
    // degenerate codebooks (one code per subspace from a single planted
    // vector) reconstruct that vector exactly: its ADC distance to itself
    // is 0 and it must rank first for its own query
    import spark.implicits._
    val planted = Seq((1L, Array.fill(64)(1.0f)), (2L, Array.fill(64)(-1.0f)))
      .toDF("vec_id", "embedding")
    val b2 = Ann.pqFixedCodebooks(planted, Seq(1L, 2L), m = 8)
    val r = Ann.pqTopK(planted.filter(col("vec_id") === 1L), planted, b2, 1)
      .head()
    assert(r.getLong(1) == 2L) // self excluded; the other vector ranks 1
    assert(r.getDouble(2) == 256.0) // ||1 - (-1)||² over 64 dims = 4·64
  }

  test("TopKPayloadAgg: window-parity order, payload rides the buffer, " +
      "bounded at k across partitions") {
    import spark.implicits._
    import graft.ops.TopKAgg
    // 200 rows over 2 groups spread across 8 partitions so partial
    // buffers MERGE; ties on score broken by id asc like the window.
    val rows = (0 until 200).map { i =>
      val g = i % 2
      (g.toLong, (i % 7).toDouble, i.toLong, (i * 3).toLong)
    }
    val df = rows.toDF("g", "s", "id", "pay").repartition(8)
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topKWith(col("s"), col("id"), Seq(col("pay")), 5).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), col("pos"), col("e.score"), col("e.id"), col("e.p0"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy { case (_, s, id, _) => (-s, id) }.take(5).zipWithIndex
        .map { case ((_, s, id, pay), pos) => (g, pos, s, id, pay) }
    }.toSet
    assert(got.toSet === want)         // exact window-equivalent top-5
    assert(got.forall { case (_, _, _, id, pay) => pay == id * 3 })
    assert(got.groupBy(_._1).forall(_._2.length == 5)) // bounded at k
    // fewer rows than k: all emitted, ordered
    val tiny = Seq((1L, 2.0, 10L, 7L), (1L, 9.0, 11L, 8L))
      .toDF("g", "s", "id", "pay")
    val t = tiny.groupBy(col("g"))
      .agg(TopKAgg.topKWith(col("s"), col("id"), Seq(col("pay")), 5).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("e.id")).as[Long].collect().toSeq
    assert(t === Seq(11L, 10L))
  }

  test("TopKPayloadAgg: null payload fails loudly instead of coercing to 0") {
    import spark.implicits._
    import graft.ops.TopKAgg
    val df = Seq((1L, 2.0, 10L, Some(7L)), (1L, 9.0, 11L, None))
      .toDF("g", "s", "id", "pay")
    val ex = intercept[Exception] {
      df.groupBy(col("g"))
        .agg(TopKAgg.topKWith(col("s"), col("id"), Seq(col("pay")), 5).as("tk"))
        .collect()
    }
    // Spark wraps task failures; the root contract message must surface.
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("payload")))
  }
}
