package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}

import graft.SparkSpec

/** Degenerate-input behavior of the round-6 continuation operators:
  * empty frames, single rows, and no-match inputs must yield empty or
  * well-defined results — never a runtime error (Spark 4 ANSI mode makes
  * silent div-by-zero impossible, so these paths need explicit proof). */
class DegenerateSpec extends SparkSpec {

  import spark.implicits._

  private def emptyDf(fields: (String, org.apache.spark.sql.types.DataType)*) =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(fields.map { case (n, t) => StructField(n, t) }))

  test("histogram / modeBy / scd2 on empty input yield zero rows") {
    val e = emptyDf("v" -> DoubleType)
    assert(Profile.histogram(e, "v", 0.0, 10.0, 4).count() == 0)
    val kv = emptyDf("k" -> StringType, "v" -> StringType)
    assert(Profile.modeBy(kv, "k", "v").count() == 0)
    val log = emptyDf("k" -> LongType, "ts" -> TimestampType, "seq" -> LongType)
    assert(Snapshot.scd2(log, "k", "ts", "seq").count() == 0)
  }

  test("bm25 with no matching terms and cooc on sub-window docs yield zero rows") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    assert(Retrieval.bm25Scores(docs, "doc_id", "text",
      Seq("zeta")).count() == 0)
    // no doc has 2+ tokens beyond position 1 window? doc 1 has one pair
    val one = Seq((1L, "solo")).toDF("doc_id", "text")
    assert(Vocab.coocCounts(one, "text", window = 3).count() == 0)
    val empty = Seq((1L, "   ")).toDF("doc_id", "text")
    assert(Vocab.coocCounts(empty, "text", window = 3).count() == 0)
    assert(Vocab.invertedIndex(empty, "doc_id", "text").count() == 0)
  }

  test("rateSpikes single cell and quantileBins n=1 are well-defined") {
    val cell = Seq((1L, 0L, 5L)).toDF("k", "hour_sec", "n")
    val rs = Resample.rateSpikes(cell, "k", "hour_sec", "n").collect()
    assert(rs.length == 1 && !rs.head.getBoolean(4)) // no baseline, no spike
    assert(rs.head.isNullAt(3))
    val onebin = Ranking.quantileBins(
      Seq((1L, 2.0)).toDF("id", "v"), Seq(col("v").asc, col("id").asc), 10)
      .collect()
    assert(onebin.length == 1 && onebin.head.getAs[Long]("bin") == 0L)
  }

  test("cdcApply with empty changelog is the identity; empty base inserts all") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "payload")
    val noCl = emptyDf("k" -> LongType, "seq" -> LongType,
      "op" -> StringType, "payload" -> StringType)
    val same = Snapshot.cdcApply(base, noCl, "k", "seq", "op", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(same == Map(1L -> "a", 2L -> "b"))
    val noBase = emptyDf("k" -> LongType, "payload" -> StringType)
    val cl = Seq((9L, 1L, "I", "z")).toDF("k", "seq", "op", "payload")
    val ins = Snapshot.cdcApply(noBase, cl, "k", "seq", "op", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ins == Map(9L -> "z"))
  }

  test("madOutliers and coverage on empty / single-row inputs do not error") {
    val e = emptyDf("g" -> StringType, "v" -> DoubleType)
    assert(Robust.madOutliers(e, "g", "v").count() == 0)
    val single = Seq(("a", 1.0)).toDF("g", "v")
    val m = Robust.madOutliers(single, "g", "v").collect()
    assert(m.length == 1 && m.head.getLong(1) == 1L &&
      m.head.getLong(4) == 0L) // MAD 0, nothing flagged
    val emptyDocs = emptyDf("doc_id" -> LongType, "text" -> StringType)
    val cov = Vocab.coverage(emptyDocs, "text", 5).collect()
    assert(cov.length == 1 && cov.head.getLong(0) == 0L) // empty vocab
  }

  test("temporalSplit and sessionPaths on empty events yield zero rows") {
    val e = emptyDf("u" -> LongType, "ts" -> TimestampType, "id" -> LongType,
      "t" -> StringType)
    assert(Sampling.temporalSplit(e, "u", "ts", "id", 80).count() == 0)
    assert(Funnel.sessionPaths(e, "u", "ts", "id", "t", 1800L, 5).count() == 0)
  }

  test("graph census/prediction/core/bfs and sampled quantiles on empty or trivial input") {
    val eEdges = emptyDf("a" -> LongType, "b" -> LongType)
    // triangle-free and empty graphs: no census rows, no scores, no core
    assert(Graph.triangleCounts(eEdges, "a", "b").count() == 0)
    assert(Graph.linkPrediction(eEdges, "a", "b", minCommon = 1).count() == 0)
    assert(Graph.kCore(eEdges, "a", "b", k = 2).count() == 0)
    val single = Seq((1L, 2L)).toDF("a", "b")
    assert(Graph.triangleCounts(single, "a", "b").count() == 0)
    assert(Graph.linkPrediction(single, "a", "b", minCommon = 1).count() == 0)
    assert(Graph.kCore(single, "a", "b", k = 2).count() == 0)
    // BFS with no edges: sources alone at distance 0
    val src = Seq(7L).toDF("node")
    val d = Graph.hopDistances(eEdges, "a", "b", src, maxHops = 3).collect()
    assert(d.length == 1 && d.head.getLong(0) == 7L && d.head.getInt(1) == 0)
    // sampled quantiles of an empty frame: no groups, no rows
    val eVals = emptyDf("g" -> StringType, "v" -> LongType, "id" -> LongType)
    assert(Robust.sampledQuantiles(eVals, "g", "v", col("id"), 100)
      .count() == 0)
  }

  test("trimmed mean, quantile normalize, proximity, assortativity on empty input") {
    val eVals = emptyDf("g" -> StringType, "v" -> LongType)
    assert(Robust.trimmedMean(eVals, "g", "v", 0.1).count() == 0)
    val eSrc = emptyDf("src" -> StringType, "score" -> LongType)
    assert(Ranking.quantileNormalize(eSrc, "src", "score").count() == 0)
    val eDocs = emptyDf("doc_id" -> LongType, "text" -> StringType)
    assert(Retrieval.proximitySearch(eDocs, "doc_id", "text", "a", "b", 3)
      .count() == 0)
    val eEdges = emptyDf("a" -> LongType, "b" -> LongType)
    // empty graph: one row, n_edges 0, null coefficient (no variance)
    val r = Graph.degreeAssortativity(eEdges, "a", "b").head()
    assert(r.getLong(0) == 0L && r.isNullAt(1))
    // covariance stats of an empty corpus: no cells at all
    assert(Ann.covarianceStats(
      emptyDf("embedding" -> org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType)), "embedding").count() == 0)
  }

  test("containment, winnowing, LPA, t-closeness, forward as-of on " +
      "empty/undersized input") {
    val eDocs = emptyDf("doc_id" -> LongType, "text" -> StringType)
    assert(Dedup.containmentPairs(eDocs, "doc_id", "text", 3, 0.8).count() == 0)
    assert(Dedup.winnowPairs(eDocs, "doc_id", "text", 4, 8, 1).count() == 0)
    // one doc: no pairs; sub-k docs: no fingerprints at all
    val one = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(one, "doc_id", "text", 3, 0.8).count() == 0)
    assert(Dedup.winnowPairs(one, "doc_id", "text", 4, 8, 1).count() == 0)
    val eEdges = emptyDf("a" -> LongType, "b" -> LongType)
    assert(Graph.labelPropagation(eEdges, "a", "b", rounds = 3).count() == 0)
    // a single edge: both endpoints adopt the partner's (then own) label
    val lp = Graph.labelPropagation(Seq((1L, 2L)).toDF("a", "b"), "a", "b", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp == Map(1L -> 1L, 2L -> 2L)) // 2 rounds of swapping = identity
    val eT = emptyDf("g" -> StringType, "v" -> StringType)
    assert(Quality.tCloseness(eT, Seq("g"), "v").count() == 0)
    // forward as-of: empty right side -> inner join drops everything
    val l = Seq((1L, 10L, 5L)).toDF("event_id", "user_id", "ts")
    val eR = emptyDf("user_id" -> LongType, "snap_ts" -> LongType,
      "rate" -> DoubleType)
    assert(AsOfJoin.asofForward(l, eR, "user_id", "ts", "snap_ts",
      Seq("rate")).count() == 0)
  }

  test("pagerank empty-graph local regime; trailing-distinct null parity; " +
      "t-closeness null QI/sensitive semantics") {
    // empty derived graph: the local regime must mirror the distributed
    // fixpoint (empty), not divide Scale by zero
    val eEdges = emptyDf("s" -> StringType, "d" -> StringType,
      "w" -> LongType)
    assert(Graph.pagerankScaled(eEdges, "s", "d", "w", iters = 3).count() == 0)
    // collect_list SKIPS null inputs, so the trailing-distinct window
    // matches count(DISTINCT)'s null exclusion — proven, not assumed
    val ev = Seq((1L, 1L, "a"), (1L, 2L, null), (1L, 3L, "b"))
      .toDF("user_id", "ts_sec", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_sec"))
      .rangeBetween(-86400L, -1L)
    val got = ev.withColumn("n",
      size(array_distinct(collect_list(col("event_type")).over(w))))
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1)) // the null row adds nothing
    // t-closeness: a NULL QI value is a real class (window, not join);
    // NULL sensitive values leave the distributions entirely
    val t = Seq((null, "x"), (null, "x"), ("B", "x"), ("B", null))
      .toDF("g", "v")
    val rows = Quality.tCloseness(t, Seq("g"), "v").collect()
      .map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // global = {x: 3}; both classes are pure-x after null exclusion → t=0
    assert(rows == Map(None -> ((2L, 0.0)), Some("B") -> ((1L, 0.0))))
  }

  test("substring spans, prefix sums, benford, k-anon on empty/undersized input") {
    // all docs shorter than the gram: zero grams, zero spans (and no
    // descending-sequence trap from size(t) - n going negative)
    val short = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(short, "doc_id", "text", n = 5).count() == 0)
    val eDocs = emptyDf("doc_id" -> LongType, "text" -> StringType)
    assert(Dedup.duplicateSpans(eDocs, "doc_id", "text", n = 3).count() == 0)
    assert(Vocab.growthCurve(eDocs, "doc_id", "text").count() == 0)
    // prefixSum over an empty frame: no partials, no offsets, no rows
    val eKv = emptyDf("id" -> LongType, "v" -> LongType)
    assert(Ranking.prefixSum(eKv, Seq(col("id")), Seq("v")).count() == 0)
    // benford: no rows >= 1 still emits the 9-digit expectation spine
    val sub1 = Seq(0.2, 0.9).toDF("x")
    val b = Profile.benfordDigits(sub1, "x").collect()
    assert(b.length == 9 && b.forall(_.getLong(1) == 0L))
    // single-row k-anon: the lone class is risky for any k > 1
    val one = Seq(("us", "a")).toDF("c1", "c2")
    assert(Quality.kAnonymityRisky(one, Seq("c1", "c2"), k = 2L).count() == 1)
    assert(Quality.lDiversity(one, Seq("c1"), "c2").collect()
      .head.getLong(1) == 1L)
  }

  test("round-9 ops: empty/degenerate inputs are well-defined") {
    // hamming pairing at d=0: one 64-bit chunk (mask -1), exact-equal join
    val h = Seq((1L, 42L), (2L, 42L), (3L, 43L)).toDF("id", "h")
    val p0 = Dedup.hammingPairs64(h, "id", "h", 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(p0.toSeq == Seq((1L, 2L, 0L)))
    // empty corpus → no pairs, no novelty rows
    val eDocs = emptyDf("doc_id" -> LongType, "text" -> StringType)
    assert(Dedup.ngramNoveltyScores(eDocs, "doc_id", "text").count() == 0)
    // a lone 2-token doc has no 3-gram shingles → no row (never 0/0)
    val short = Seq((1L, "two tokens")).toDF("doc_id", "text")
    assert(Dedup.ngramNoveltyScores(short, "doc_id", "text").count() == 0)
    // preference pairs on empty input
    val eCand = emptyDf("g" -> LongType, "id" -> LongType, "s" -> DoubleType)
    assert(Preference.pairs(eCand, "g", "id", "s").count() == 0)
    // water-fill with a single source: alloc = floor(frac * avail)
    val lone = Seq(("a", 1000L, 2L)).toDF("grp", "avail", "w")
    val wf = Mixture.waterFill(lone, "grp", "avail", "w", 0.5).collect()
    assert(wf.length == 1 && wf.head.getLong(3) == 500L)
  }

  test("round-9 continuation ops: empty/degenerate inputs are well-defined") {
    import org.apache.spark.sql.functions._
    // SCC: empty edge list → empty labeling in BOTH regimes; self-loops
    // alone leave every node isolated (absent)
    val eEdges = emptyDf("s" -> LongType, "d" -> LongType)
    assert(Graph.stronglyConnectedComponents(eEdges, "s", "d").count() == 0)
    assert(Graph.stronglyConnectedComponents(eEdges, "s", "d",
      localEdgeThreshold = -1L).count() == 0)
    val selfOnly = Seq((1L, 1L), (2L, 2L)).toDF("s", "d")
    assert(Graph.stronglyConnectedComponents(selfOnly, "s", "d").count() == 0)
    // Markov: a journey set with NO conversions has p_conv = 0 everywhere —
    // removal effects and credits take the documented 0.0 guard
    val noConv = Seq((1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val t = Markov.transitions(noConv, "user_id", "ts", "event_id",
      "event_type", "purchase")
    val re = Markov.removalEffects(spark, t).collect()
    assert(re.length == 2 && re.forall(r =>
      r.getDouble(1) == 0.0 && r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
    // prefixMax on an empty frame: no partials, no offsets, no rows
    val eKv = emptyDf("id" -> LongType, "v" -> LongType)
    assert(Ranking.prefixMax(eKv, Seq(col("id")), Seq("v")).count() == 0)
    // windowed funnel: users with no stage-0 event are absent; a stage-1
    // event AFTER the window does not count
    val ev = Seq((1L, 0L, "view"), (1L, 10L, "click"),
      (2L, 0L, "click"), (3L, 0L, "view"), (3L, 5000L, "click"))
      .toDF("user_id", "sec", "event_type")
    val f = Funnel.windowFunnel(ev, "user_id", "sec", "event_type",
      Seq("view", "click"), windowSec = 100L).collect()
      .map(r => r.getLong(0) -> r.getInt(r.length - 1)).toMap
    assert(f == Map(1L -> 2, 3L -> 1)) // user 2 never saw a view
    // isotonic calibration: one occupied bin is its own block
    val oneBin = Seq((true, 0.05), (false, 0.05)).toDF("pos", "s")
    val iso = Eval.isotonicCalibration(oneBin, col("pos"), col("s"), 10)
      .collect()
    assert(iso.length == 1 && iso.head.getDouble(4) == 0.5)
    // PQ: an empty query set yields no rows (corpus encode still plans)
    import spark.implicits._
    val corpus = Seq((1L, Array.fill(64)(1.0f)), (2L, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val books = Ann.pqFixedCodebooks(corpus, Seq(1L, 2L), m = 8)
    assert(Ann.pqTopK(corpus.filter(col("vec_id") < 0), corpus, books, 5)
      .count() == 0)
  }
}
