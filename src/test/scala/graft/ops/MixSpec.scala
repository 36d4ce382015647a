package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the round-6 mixing/scoring operators: weighted sampling,
  * temperature mixing, bigram LM scoring, the interval-overlap join and
  * winsorization. */
class MixSpec extends SparkSpec {

  import spark.implicits._

  test("weightedSample: winner set equals the window formulation and is partition-invariant") {
    val df = (1L to 500L).map(i =>
      (i, if (i % 2 == 0) "even" else "odd", (i % 7 + 1).toDouble))
      .toDF("id", "grp", "w")
    val got = Sampling.weightedSample(df, "grp", "id", "w", k = 10)
      .select("grp", "id").as[(String, Long)].collect().toSet
    // reference: explicit exponential-key ranking window
    val key = log(Sampling.uniform01(col("id"))) / col("w")
    val ref = df.withColumn("__k", key)
      .withColumn("__r", row_number().over(
        Window.partitionBy("grp").orderBy(col("__k").desc, col("id").asc)))
      .filter(col("__r") <= 10)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(got == ref)
    assert(got.count(_._1 == "even") == 10 && got.count(_._1 == "odd") == 10)
    // same rows out under a different partitioning
    val re = Sampling.weightedSample(df.repartition(7), "grp", "id", "w", 10)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(re == got)
  }

  test("weightedSample: zero/null weights never win; k caps at group size") {
    val df = Seq((1L, "g", 0.0), (2L, "g", -3.0), (3L, "g", 5.0), (4L, "g", 1.0))
      .toDF("id", "grp", "w")
    val got = Sampling.weightedSample(df, "grp", "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L, 4L))
  }

  test("weightedSample favors heavy weights") {
    // two tiers: weight 100 vs 1; the heavy tier should dominate winners
    val df = (1L to 200L).map(i => (i, "g", if (i <= 40) 100.0 else 1.0))
      .toDF("id", "grp", "w")
    val winners = Sampling.weightedSample(df, "grp", "id", "w", k = 20)
      .select("id").as[Long].collect()
    assert(winners.count(_ <= 40L) >= 15, s"heavy tier won ${winners.count(_ <= 40L)}/20")
  }

  test("temperatureMix: small sources keep a larger-than-natural share, budget holds") {
    val rows = (1L to 3000L).map(i => (i, "big")) ++
      (3001L to 3300L).map(i => (i, "small"))
    val df = rows.toDF("id", "src")
    val kept = Sampling.temperatureMix(df, "src", "id", alpha = 0.5, budgetFrac = 0.4)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    val keptBig = kept.getOrElse("big", 0L).toDouble / 3000
    val keptSmall = kept.getOrElse("small", 0L).toDouble / 300
    assert(keptSmall > keptBig,
      s"small source rate $keptSmall should exceed big source rate $keptBig")
    val total = kept.values.sum.toDouble / 3300
    assert(math.abs(total - 0.4) < 0.05, s"kept fraction $total vs budget 0.4")
    // alpha = 1 reproduces natural proportions: every source at ~budget
    val nat = Sampling.temperatureMix(df, "src", "id", alpha = 1.0, budgetFrac = 0.4)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(math.abs(nat("big").toDouble / 3000 - 0.4) < 0.05)
    assert(math.abs(nat("small").toDouble / 300 - 0.4) < 0.1)
  }

  test("LangModel.scoreDocs: hand-checked bigram probabilities") {
    // corpus: d1 = "a b a", d2 = "a b". bigrams: d1: (a,b),(b,a); d2: (a,b)
    // c2(a,b)=2, c2(b,a)=1; c1(a)=2, c1(b)=1; V=3 ("solo" counts); k=0.5
    val d = Seq((1L, "a b a"), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val out = LangModel.scoreDocs(d, d, "doc_id", "text", addK = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    val pAB = (2 + 0.5) / (2 + 0.5 * 3) // P(b|a)
    val pBA = (1 + 0.5) / (1 + 0.5 * 3) // P(a|b)
    val d1 = -(math.log(pAB) + math.log(pBA)) / 2
    val d2 = -math.log(pAB)
    assert(out(1L)._1 == 2L)
    assert(math.abs(out(1L)._2.get - d1) < 1e-6)
    assert(math.abs(out(2L)._2.get - d2) < 1e-6)
    // single-token doc: zero bigrams, null score
    assert(out(3L) == ((0L, None)))
  }

  test("LangModel.scoreDocs: unseen bigrams score via smoothing when scoring a different corpus") {
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val cand = Seq((10L, "a z")).toDF("doc_id", "text")
    val out = LangModel.scoreDocs(cand, train, "doc_id", "text", addK = 0.5)
      .collect()
    assert(out.length == 1)
    // c2(a,z)=0, c1(a)=2, V=2 -> P = 0.5/3
    val expect = -math.log(0.5 / 3.0)
    assert(math.abs(out.head.getDouble(2) - expect) < 1e-6)
  }

  test("overlapBucketed equals the naive theta join, exactly once per pair") {
    val left = (1L to 120L).map(i => (i, i * 3, i * 3 + (i % 40)))
      .toDF("lid", "llo", "lhi")
    val right = (1L to 60L).map(j => (j, j * 7, j * 7 + 12))
      .toDF("rid", "rlo", "rhi")
    val got = RangeJoin.overlapBucketed(left, "llo", "lhi", right, "rlo", "rhi", 16L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val naive = left.crossJoin(right)
      .filter(col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == naive.sorted) // seq equality: catches dup pairs too
    assert(got.nonEmpty)
  }

  test("overlapBucketed: bucket width does not change the answer") {
    val left = (1L to 50L).map(i => (i, i * 5, i * 5 + 20)).toDF("lid", "llo", "lhi")
    val right = (1L to 50L).map(j => (j, j * 6, j * 6 + 3)).toDF("rid", "rlo", "rhi")
    def run(w: Long) =
      RangeJoin.overlapBucketed(left, "llo", "lhi", right, "rlo", "rhi", w)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(run(4L) == run(64L))
  }

  test("keepBelowQuantile keeps ~frac per group, ties at the threshold all keep") {
    val df = ((1 to 100).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 50).map(i => ("b", 1000L + i, 7.0))) // group b: all tied
      .toDF("grp", "id", "v")
    val out = Robust.keepBelowQuantile(df, "grp", "v", 0.5)
    val byGrp = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp("a") == 50L) // p50 of 1..100 = 50.5; values <= 50.5 are 1..50
    assert(byGrp("b") == 50L) // threshold 7.0, every row ties -> all keep
    assert(out.filter(col("grp") === "a").agg(max("v")).as[Double].head() == 50.0)
  }

  test("joinProfile reports exact join statistics and a deterministic hot key") {
    val left = Seq(1L, 1L, 1L, 2L, 3L, 5L).toDF("k")
    val right = Seq(1L, 2L, 2L, 4L).toDF("k")
    val r = Profile.joinProfile(left, right, "k").collect().head
    assert(r.getAs[Long]("rows_left") == 6L)
    assert(r.getAs[Long]("rows_right") == 4L)
    assert(r.getAs[Long]("keys_left") == 4L)
    assert(r.getAs[Long]("keys_right") == 3L)
    assert(r.getAs[Long]("keys_matched") == 2L)
    // inner rows: key1 3*1 + key2 1*2 = 5; max single-key 3 (key 1)
    assert(r.getAs[Long]("inner_rows") == 5L)
    assert(r.getAs[Long]("max_key_rows") == 3L)
    assert(r.getAs[Long]("hot_key") == 1L)
  }

  test("joinProfile hot-key tie breaks to the largest key") {
    val left = Seq(1L, 2L).toDF("k")
    val right = Seq(1L, 2L).toDF("k")
    val r = Profile.joinProfile(left, right, "k").collect().head
    assert(r.getAs[Long]("hot_key") == 2L)
  }

  test("randomProject: deterministic, long layout, roughly norm-preserving") {
    val dim = 16
    // hash-spread components, NOT sinusoids: a pure tone in d concentrates
    // the corpus in one frequency subspace and biases any FIXED matrix
    val vecs = (1L to 40L).map { i =>
      (i, (0 until dim).map(d =>
        (((i * 131 + d) * 2654435761L % 1000) / 1000.0 - 0.5).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    val out = Ann.randomProject(vecs, "vec_id", "embedding", dim, 4)
    val rows = out.collect()
    assert(rows.length == 40 * 4)
    // same output under different partitioning
    val again = Ann.randomProject(vecs.repartition(5), "vec_id", "embedding", dim, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(again == rows.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet)
    // JL sanity: projected squared norm within 3x of the original, on average
    val origNorm = vecs.select(col("vec_id"),
      aggregate(transform(col("embedding"), x => x.cast("double") * x.cast("double")),
        lit(0.0), (a, x) => a + x).as("n2"))
      .as[(Long, Double)].collect().toMap
    val projNorm = out.groupBy("vec_id").agg(sum(col("x") * col("x")).as("p2"))
      .as[(Long, Double)].collect().toMap
    val ratios = origNorm.keys.map(k => projNorm(k) / origNorm(k))
    val meanRatio = ratios.sum / ratios.size
    assert(meanRatio > 0.4 && meanRatio < 2.5, s"mean norm ratio $meanRatio")
  }

  test("Snapshot.diff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val cur = Seq((1L, "alpha"), (2L, "BETA  edited"), (4L, "delta")).toDF("doc_id", "text")
    val got = Snapshot.diff(old, cur, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // fingerprint normalization: case/whitespace variance is NOT a change
    val cur2 = Seq((1L, "  ALPHA "), (3L, "gamma")).toDF("doc_id", "text")
    val got2 = Snapshot.diff(old.filter(col("doc_id") =!= 2L), cur2, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got2 == Map(1L -> "unchanged", 3L -> "unchanged"))
  }

  test("bpeTrain learns the classic merge sequence (Sennrich fixture)") {
    // low x5, lower x2, newest x6, widest x3 — independently hand-computed
    // with greedy left-to-right merges and the (freq desc, l, r) tiebreak
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val got = Vocab.bpeTrain(d, "text", merges = 6)
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L),
      (4, "lo", "w", 7L), (5, "e", "w", 6L), (6, "ew", "est", 6L)))
  }

  test("bpeTrain stops early when the corpus runs out of pairs") {
    val d = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val got = Vocab.bpeTrain(d, "text", merges = 10)
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // merges: (a,b)x2 then (c,d)x1 — then every word is one symbol
    assert(got.toSeq == Seq((1, "a", "b", 2L), (2, "c", "d", 1L)))
  }

  test("Snapshot.schemaDiff reports added/removed/type-changed columns") {
    val old = Seq((1L, "a", 1)).toDF("id", "text", "score")
    val cur = Seq((1L, "a", "1", true)).toDF("id", "text", "score", "flag")
    val got = Snapshot.schemaDiff(old, cur)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("flag", "added"), ("score", "type_changed")))
    assert(Snapshot.schemaDiff(old, old).count() == 0)
  }

  test("winsorize clamps into the exact per-group percentile envelope") {
    val df = ((1 to 99).map(i => ("a", i.toLong, i.toDouble)) :+ ("a", 100L, 1000.0))
      .toDF("grp", "id", "v")
    val out = Robust.winsorize(df, "grp", "v", 0.05, 0.95)
    val vw = out.select("v_w").as[Double].collect()
    // p95 of 1..99,1000 (interpolated) pins the outlier; p05 floors the low end
    val lo = vw.min
    val hi = vw.max
    assert(hi < 1000.0 && hi > 95.0, s"hi=$hi")
    assert(lo > 1.0 && lo < 10.0, s"lo=$lo")
    // interior values unchanged
    val mid = out.filter(col("id") === 50L).select("v_w").as[Double].head()
    assert(mid == 50.0)
    // full-range winsorization is the identity
    val id = Robust.winsorize(df, "grp", "v", 0.0, 1.0)
      .select("v", "v_w").as[(Double, Double)].collect()
    assert(id.forall { case (a, b) => a == b })
  }

  test("cdcApply: latest op wins — update, delete-over-update, insert, passthrough") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "payload")
    val cl = Seq(
      (1L, 1L, "U", "a2"),   // update
      (2L, 1L, "U", "b2"),   // update...
      (2L, 2L, "D", null),   // ...then delete: delete wins
      (4L, 1L, "I", "d"))    // insert of a new key
      .toDF("k", "seq", "op", "payload")
    val out = Snapshot.cdcApply(base, cl, "k", "seq", "op", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a2", 3L -> "c", 4L -> "d")) // 2 deleted
  }

  test("sampledQuantiles: full sample is exact type-1; internal-name guard") {
    // permille=1000 keeps every row, so the "sampled" quantiles are the
    // exact lower-rank quantiles: of 1..100, p50=50, p90=90, p99=99.
    val df = (1 to 100).map(i => ("a", i, i.toLong)).toDF("grp", "v", "id")
    val out = Robust.sampledQuantiles(df, "grp", "v", col("id"), 1000)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map("a" -> ((100L, 50L, 90L, 99L))))
    val clash = (1 to 3).map(i => ("a", i, i.toLong)).toDF("grp", "p50", "id")
    intercept[IllegalArgumentException] {
      Robust.sampledQuantiles(clash, "grp", "p50", col("id"), 1000)
    }
  }

  test("sampledQuantiles: 10% hash sample lands near exact; partition invariant") {
    val df = (1 to 20000).map(i => ("a", i % 1000, i.toLong))
      .toDF("grp", "v", "id")
    val out = Robust.sampledQuantiles(df, "grp", "v", col("id"), 100)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    val (n, p50, p90) = out
    assert(n > 1500 && n < 2500)       // ~10% of 20k, binomial spread
    assert(math.abs(p50 - 500L) < 50)  // exact p50 of v=id%1000 ≈ 500
    assert(math.abs(p90 - 900L) < 50)
    val rep = Robust.sampledQuantiles(df.repartition(13), "grp", "v",
      col("id"), 100).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(rep == out)
  }

  test("trimmedMean: exact rank trim over tied values; zero-trim is the mean") {
    val df = ((1 to 10).map(("a", _)) ++ Seq(("b", 1), ("b", 1), ("b", 1),
      ("b", 100))).toDF("g", "v")
    def run(t: Double) = Robust.trimmedMean(df, "g", "v", t).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val t10 = run(0.1)
    // a: k=1 drops {1} and {10} → mean of 2..9 = 5.5; b: k=0 → plain mean
    assert(t10("a") == ((10L, 8L, 5.5)))
    assert(t10("b") == ((4L, 4L, 25.75)))
    // deeper trim on b: k=1 keeps ranks 2..3, both value 1 (tie split)
    val t25 = run(0.25)
    assert(t25("b") == ((4L, 2L, 1.0)))
    // partition invariance
    assert(Robust.trimmedMean(df.repartition(7), "g", "v", 0.1).collect()
      .map(r => (r.getString(0), r.getDouble(3))).sorted.toSeq ==
      t10.map { case (g, (_, _, m)) => (g, m) }.toSeq.sorted)
  }

  test("madOutliers flags exactly the planted contamination") {
    // 1..101 (odd count: median/MAD exact integers) + two planted 999s.
    val df = ((1 to 101).map(i => ("a", i.toDouble)) ++
      Seq(("a", 999.0), ("a", 999.0)) ++
      (1 to 5).map(i => ("b", 10.0))).toDF("grp", "v")
    val out = Robust.madOutliers(df, "grp", "v", z = 3.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val (n, med, mad, k) = out("a")
    assert(n == 103L)
    assert(med == 52.0) // median of 1..101 + two highs shifts by 1
    assert(mad == 26.0) // deviations |x-52|: median is 26
    // threshold = 26*1.4826*3 ≈ 115.6 -> only the two 999s exceed it
    assert(k == 2L)
    // constant group: MAD 0, nothing flagged (999-free)
    assert(out("b") == ((5L, 10.0, 0.0, 0L)))
  }

  test("madOutliers frequency-weighted collapse equals the row-level " +
    "formulation on a tie-heavy corpus") {
    // Heavy ties (including even-count interpolation points) exercise the
    // weighted-percentile path: medians over (value, count) must be the
    // exact row medians, so the collapsed implementation must agree with
    // a direct row-level percentile computation on every statistic.
    val df = Seq.tabulate(400) { i =>
      (s"g${i % 3}", (i % 7).toDouble + (if (i % 11 == 0) 50.0 else 0.0))
    }.toDF("grp", "v")
    val got = Robust.madOutliers(df, "grp", "v", z = 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val med = df.groupBy($"grp")
      .agg(percentile($"v", lit(0.5)).as("med"))
    val dev = df.join(med, "grp").withColumn("dev", abs($"v" - $"med"))
    val expect = dev.groupBy($"grp")
      .agg(count(lit(1)).as("n"), max($"med").as("med"),
        percentile($"dev", lit(0.5)).as("mad"))
      .collect().map { r =>
        val mad = r.getDouble(3)
        r.getString(0) -> (r.getLong(1), r.getDouble(2), mad)
      }.toMap
    val thresh = dev.join(
        dev.groupBy($"grp").agg(percentile($"dev", lit(0.5)).as("mad")), "grp")
      .filter($"dev" > $"mad" * 1.4826 * 2.0)
      .groupBy($"grp").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expect.foreach { case (g, (n, m, mad)) =>
      val (gn, gm, gmad, gk) = got(g)
      assert(gn == n && gm == m && gmad == mad, s"stats mismatch for $g")
      assert(gk == thresh.getOrElse(g, 0L), s"outlier count mismatch for $g")
    }
  }
}
