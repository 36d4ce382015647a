package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the corpus-shaping operators: chunking boundary semantics,
  * packing layout invariants, deterministic sampling, and salt-invariance
  * of the skew join. */
class ShapeSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("chunkDocuments: overlapping windows, short tail, empty doc dropped") {
    val d = docs(
      1L -> (1 to 10).map(i => s"t$i").mkString(" "), // 10 tokens
      2L -> "only three tokens",
      3L -> "   ")
    val out = Shaping.chunkDocuments(d, "doc_id", "text", chunkTokens = 4, overlap = 2)
      .orderBy("id", "chunk_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // step 2: doc 1 starts 1,3,5,7,9 -> windows of 4 (tail shorter)
    assert(out.filter(_._1 == 1L).map(_._3).toSeq == Seq(4L, 4L, 4L, 4L, 2L))
    assert(out.filter(_._1 == 1L).head._4 == "t1 t2 t3 t4")
    assert(out.filter(_._1 == 1L).last._4 == "t9 t10")
    // doc 2: starts 1, 3 -> "only three tokens", "tokens"
    assert(out.filter(_._1 == 2L).map(_._4).toSeq ==
      Seq("only three tokens", "tokens"))
    // doc 3 (whitespace only) contributes nothing
    assert(!out.exists(_._1 == 3L))
  }

  test("chunkDocuments rejects overlap >= chunkTokens") {
    intercept[IllegalArgumentException] {
      Shaping.chunkDocuments(docs(1L -> "a"), "doc_id", "text", 4, 4)
    }
  }

  test("packSequences: offsets are contiguous per shard and seq ranges cover") {
    val d = docs((1L to 40L).map(i => i -> ("w " * (i % 7 + 1).toInt).trim): _*)
    val out = Shaping.packSequences(d, "doc_id", "text", seqLen = 5, shards = 3)
      .orderBy("shard", "id").collect()
    val byShard = out.groupBy(_.getAs[Long]("shard"))
    byShard.foreach { case (_, rows) =>
      // head-to-tail: each start_off equals the previous end
      rows.foldLeft(0L) { (expect, r) =>
        assert(r.getAs[Long]("start_off") == expect)
        expect + r.getAs[Long]("n_tokens")
      }
    }
    out.foreach { r =>
      val first = r.getAs[Long]("seq_first"); val last = r.getAs[Long]("seq_last")
      val s = r.getAs[Long]("start_off"); val n = r.getAs[Long]("n_tokens")
      assert(first == s / 5 && last == (s + n - 1) / 5 && first <= last)
    }
  }

  test("packBinsFfd: capacity respected, tokens conserved, beats next-fit, deterministic") {
    import spark.implicits._
    // 60 docs, token counts 1..30 repeating, 2 shards, bins of 32
    val docs = (1L to 60L)
      .map(i => (i, (1 to (i % 30 + 1).toInt).map(k => s"t$k").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Shaping.packBinsFfd(docs, "doc_id", "text", seqLen = 32, shards = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // every doc packed exactly once
    assert(out.map(_._3).distinct.length == 60)
    assert(out.map(_._4).sum == (1L to 60L).map(_ % 30 + 1).sum)
    // capacity per (shard, bin); offsets disjoint and in-bin
    out.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sum <= 32)
      val spans = rows.map(t => (t._5, t._5 + t._4)).sortBy(_._1)
      assert(spans.forall { case (a, b) => a >= 0 && b <= 32 })
      assert(spans.zip(spans.drop(1)).forall { case ((_, e), (s, _)) => s >= e })
    }
    // FFD bin count <= next-fit (pack in id order, new bin when overflow)
    val ffdBins = out.map(t => (t._1, t._2)).distinct.length
    val byShard = (1L to 60L).map(i => (i % 2, i % 30 + 1)).groupBy(_._1)
    val nextFit = byShard.values.map { rows =>
      var bins = 1; var rem = 32L
      rows.sortBy(_._1).map(_._2).foreach { n =>
        if (n > rem) { bins += 1; rem = 32L }
        rem -= n
      }
      bins
    }.sum
    assert(ffdBins <= nextFit, s"ffd=$ffdBins nextfit=$nextFit")
    // deterministic under a different input partitioning
    val again = Shaping.packBinsFfd(docs.repartition(7), "doc_id", "text", 32, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(again == out.toSet)
  }

  test("packBinsFfd rejects docs longer than seqLen") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 10).map(k => s"t$k").mkString(" ")))
      .toDF("doc_id", "text")
    val ex = intercept[org.apache.spark.SparkException] {
      Shaping.packBinsFfd(docs, "doc_id", "text", seqLen = 4, shards = 1).collect()
    }
    assert(ex.getMessage != null)
  }

  test("stratified sampling is a deterministic subset at the stratum rate") {
    import spark.implicits._
    val base = (1L to 4000L).map(i => (i, if (i % 2 == 0) "A" else "B")).toDF("id", "seg")
    val kept = Sampling.stratified(base, "seg", "id", Map("A" -> 500), 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.nonEmpty && kept.forall(_._2 == "A")) // rate 0 drops all B
    // re-run yields the identical set (no rand() dependence on partitioning)
    val again = Sampling.stratified(base.repartition(7), "seg", "id", Map("A" -> 500), 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSet == again.toSet)
    // rate is approximately honored (hash uniformity, wide tolerance)
    assert(math.abs(kept.length / 2000.0 - 0.5) < 0.1)
  }

  test("prefixSum matches the single-partition window scan, stable under partitioning") {
    import spark.implicits._
    val base = (1L to 3000L).map(i => (i, i % 7, (i * 13) % 5)).toDF("id", "a", "b")
    val want = base.withColumn("cum_a",
        sum(col("a")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("id")).rowsBetween(Long.MinValue, 0)))
      .withColumn("cum_b",
        sum(col("b")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("id")).rowsBetween(Long.MinValue, 0)))
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    def got(df: org.apache.spark.sql.DataFrame) =
      Ranking.prefixSum(df, Seq(col("id")), Seq("a", "b"))
        .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got(base) == want)
    assert(got(base.repartition(17)) == want)
    // appended-name collision fails loudly
    intercept[IllegalArgumentException] {
      Ranking.prefixSum(base.withColumn("cum_a", lit(0L)), Seq(col("id")), Seq("a"))
    }
  }

  test("ranker persist window: a pre-cached input stays cached; an " +
    "uncached input is released before the call returns") {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    val base = (1L to 500L).map(i => (i, i % 3)).toDF("id", "a")
    // Caller-cached input: the op must neither re-persist nor unpersist it.
    val mine = base.persist(StorageLevel.MEMORY_AND_DISK)
    val out1 = Ranking.prefixSum(mine, Seq(col("id")), Seq("a"))
    assert(mine.storageLevel != StorageLevel.NONE,
      "op unpersisted a caller-cached input")
    assert(out1.count() == 500)
    mine.unpersist(blocking = true)
    // Uncached input: the window must be CLOSED by return time...
    val fresh = base.select(col("id"), col("a"))
    val out2 = Ranking.globalRank(fresh, Seq(col("a").asc, col("id").asc))
    assert(fresh.storageLevel == StorageLevel.NONE,
      "op leaked a persist past its return")
    // ...and the output must stay fully consumable (twice) afterwards.
    assert(out2.count() == 500 && out2.agg(max(col("rank"))).head.getLong(0) == 500L)
    val out3 = Ranking.quantileBins(base.select(col("id"), col("a")),
      Seq(col("a").asc, col("id").asc), 5)
    assert(out3.groupBy(col("bin")).count().count() == 5)
  }

  test("prefixMax matches the single-partition window scan, stable under partitioning") {
    import spark.implicits._
    // values dip and spike so the running max genuinely crosses partials
    val base = (1L to 3000L).map(i => (i, (i * 7919) % 997)).toDF("id", "v")
    val want = base.withColumn("cummax_v",
        max(col("v")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("id")).rowsBetween(Long.MinValue, 0)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def got(df: org.apache.spark.sql.DataFrame) =
      Ranking.prefixMax(df, Seq(col("id")), Seq("v"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(base) == want)
    assert(got(base.repartition(17)) == want)
    intercept[IllegalArgumentException] {
      Ranking.prefixMax(base.withColumn("cummax_v", lit(0L)), Seq(col("id")), Seq("v"))
    }
  }

  test("globalRank: dense 1..N total order, stable under input partitioning") {
    import spark.implicits._
    val base = (1L to 5000L).map(i => (i, (i * 7919) % 1000)).toDF("id", "key")
    def ranks(df: org.apache.spark.sql.DataFrame) =
      Ranking.globalRank(df, Seq(col("key").asc, col("id").asc))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = ranks(base)
    assert(got.values.toSeq.sorted == (1L to 5000L))
    // matches the naive single-partition window rank
    val want = base.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("key").asc, col("id").asc)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == want)
    assert(ranks(base.repartition(13)) == want)
  }

  test("assignSplits: stable ranges, growth never migrates a doc's split") {
    import spark.implicits._
    val small = (1L to 1000L).toDF("id")
    val big = (1L to 5000L).toDF("id")
    val splits = Seq("val" -> 50, "test" -> 100)
    def m(df: org.apache.spark.sql.DataFrame) =
      Sampling.assignSplits(df, "id", splits).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = m(small); val b = m(big)
    // every id keeps its split when the corpus grows
    assert(a.forall { case (id, s) => b(id) == s })
    // rough proportions on the big corpus
    val frac = b.values.groupBy(identity).map { case (k, v) => k -> v.size / 5000.0 }
    assert(math.abs(frac("val") - 0.05) < 0.02 &&
      math.abs(frac("test") - 0.10) < 0.03 && frac("train") > 0.8)
  }

  test("interleave: prefix proportions track weights, no source-sized runs") {
    import spark.implicits._
    val a = (1L to 900L).toDF("id")   // weight 3
    val b = (1001L to 1300L).toDF("id") // weight 1
    val out = Shaping.interleave(Seq(a -> 3.0, b -> 1.0), "id", shards = 1)
      .orderBy("seq").collect().map(r => (r.getInt(1), r.getLong(3)))
    assert(out.length == 1200)
    // in every aligned prefix, source 0 holds ~3/4 of the rows
    Seq(200, 600, 1200).foreach { n =>
      val frac = out.take(n).count(_._1 == 0).toDouble / n
      assert(math.abs(frac - 0.75) < 0.05, s"prefix $n: $frac")
    }
    // the longest single-source run is bounded (3 for weight ratio 3:1)
    val runs = out.map(_._1).foldLeft(List.empty[(Int, Int)]) {
      case ((s, n) :: t, x) if s == x => (s, n + 1) :: t
      case (acc, x) => (x, 1) :: acc
    }
    assert(runs.map(_._2).max <= 3 + 1)
  }

  test("repeatEpochs: floor copies for all, fractional epoch is the stable hash subset") {
    import spark.implicits._
    val base = (1L to 2000L).toDF("id")
    val out = Sampling.repeatEpochs(base, "id", 2.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byEpoch = out.groupBy(_._2).map { case (e, rs) => e -> rs.length }
    assert(byEpoch(0L) == 2000 && byEpoch(1L) == 2000)
    assert(math.abs(byEpoch(2L) / 2000.0 - 0.3) < 0.1) // ~30% fractional epoch
    // fractional subset == the permille-bucket subset (stable, not random)
    val frac = out.filter(_._2 == 2L).map(_._1).toSet
    val expect = base.filter(Sampling.permilleBucket(col("id")) < 300)
      .collect().map(_.getLong(0)).toSet
    assert(frac == expect)
    // integral factor: exactly f copies, no fractional epoch
    val two = Sampling.repeatEpochs(base, "id", 2.0).collect()
    assert(two.length == 4000)
  }

  test("capPerGroup keeps at most k rows per group, deterministically") {
    import spark.implicits._
    val base = (1L to 3000L).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
    val kept = Sampling.capPerGroup(base, "grp", "id", 100)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val sizes = kept.groupBy(_._2).map(_._2.length)
    assert(sizes.forall(_ == 100)) // every group has >= 100 candidates here
    val again = Sampling.capPerGroup(base.repartition(11), "grp", "id", 100)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSet == again.toSet) // winners stable under partitioning
    // a small group survives whole
    val tiny = base.filter(col("id") < 20)
    assert(Sampling.capPerGroup(tiny, "grp", "id", 100).count() == 19)
  }

  test("int8 quantization: values in range, dequantized cosine close to original") {
    val emb = graft.core.Tables.table(spark, sf("sf0.001"), "embeddings")
    val q = Ann.quantizeInt8(emb, "vec_id", "embedding")
    val rows = q.collect()
    assert(rows.length == emb.count())
    rows.foreach { r =>
      val qv = r.getSeq[Int](r.fieldIndex("qvec"))
      assert(qv.forall(x => x >= -127 && x <= 127))
      assert(qv.exists(_ != 0) || r.getDouble(r.fieldIndex("scale")) == 1.0)
    }
    // reconstruction: cos(original, dequantized) > 0.999 on the fixture
    val orig = emb.select(col("vec_id").as("id"), Ann.asDouble(col("embedding")).as("v"))
    val deq = q.select(col("id"), col("scale"),
      transform(col("qvec"), x => x.cast("double") * col("scale") / lit(127.0)).as("dv"))
    val minCos = orig.join(deq, Seq("id"))
      .select(Ann.cosine(col("v"), col("dv")).as("c"))
      .agg(min(col("c"))).head().getDouble(0)
    assert(minCos > 0.999, s"worst reconstruction cosine $minCos")
  }

  test("saltedJoin equals the plain join, any salt count") {
    import spark.implicits._
    // skewed facts: key 1 holds half the rows
    val facts = (1L to 1000L).map(i => (i, if (i % 2 == 0) 1L else i % 50)).toDF("fid", "k")
    val dim = (0L until 50L).map(i => (i, s"d$i")).toDF("dk", "payload")
    val plain = facts.join(dim, col("k") === col("dk")).select("fid", "k", "dk", "payload")
    Seq(1, 4, 16).foreach { salts =>
      val salted = SkewJoin.saltedJoin(facts, dim, "k", "dk", "fid", salts)
        .select("fid", "k", "dk", "payload")
      assert(salted.collect().toSet == plain.collect().toSet, s"salts=$salts")
    }
  }

  test("blockedSelfPairs equals the naive self-join pair set, any chunk count") {
    import spark.implicits._
    // one hot group (key 1: 60 members) among uniform small groups
    val rows = ((1L to 60L).map(v => (1L, v * 7)) ++
      (2L to 40L).flatMap(k => (1L to 4L).map(v => (k, k * 100 + v)))).toDF("k", "v")
    val naive = rows.as("a").join(rows.as("b"), Seq("k"))
      .filter(col("a.v") < col("b.v"))
      .select(col("k"), col("a.v").as("v_a"), col("b.v").as("v_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    Seq(1, 3, 8).foreach { chunks =>
      val blocked = SkewJoin.blockedSelfPairs(rows, "k", "v", chunks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(blocked == naive, s"chunks=$chunks")
    }
    // selfPairsAuto: the probe routes this fixture (max group 60) to the
    // blocked branch at hotThreshold=50 and the naive branch at 1000;
    // both must emit the identical pair set.
    Seq(50L, 1000L).foreach { thr =>
      val auto = SkewJoin.selfPairsAuto(rows, "k", "v", chunks = 8,
          hotThreshold = thr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(auto == naive, s"hotThreshold=$thr")
    }
  }

  test("selfPairsAuto whale cap: a 100k-member group is excluded, counted, and the rest pair normally") {
    import spark.implicits._
    // a planted 10^5-item whale basket (the SCALE.md part-6 shape: its
    // uncapped pair output would be ~5*10^9 rows — the test completing
    // in seconds IS the cap working) + normal small groups
    val whale = (1L to 100000L).map(v => (999L, v))
    val normal = (1L to 20L).flatMap(k => (1L to 5L).map(v => (k, k * 1000 + v)))
    val rows = (whale ++ normal).toDF("k", "v").repartition(8)
    val pairs = SkewJoin.selfPairsAuto(rows, "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the whale emitted nothing; normal groups pair exactly as before
    assert(!pairs.exists(_._1 == 999L))
    val expected = SkewJoin.naiveSelfPairs(normal.toDF("k", "v"), "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == expected)
    // the overflow is reported as a first-class result
    val capped = SkewJoin.cappedGroups(rows, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq == Seq((999L, 100000L)))
    // and a cap ABOVE the whale keeps the old uncapped behavior intact
    // (probe still routes to blocked; spot-check one known pair)
    val uncapped = SkewJoin.selfPairsAuto(rows, "k", "v",
      maxGroup = 200000L)
    assert(uncapped.filter(col("k") === 1L).count() == 10L)
  }

  test("recsys neighborsFrom: a whale basket is pruned from the co-occurrence model") {
    import spark.implicits._
    val whale = (1L to 17000L).map(p => (999L, p)) // > BasketCap = 16384
    val normal = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L))
    val b = (whale ++ normal).toDF("okey", "part")
    val nb = graft.queries.RecsysQueries.neighborsFrom(b)
      .select(col("part"), col("part_j"), col("cooc")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val nbNoWhale = graft.queries.RecsysQueries
      .neighborsFrom(normal.toDF("okey", "part"))
      .select(col("part"), col("part_j"), col("cooc")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // NOTE degrees still count whale rows (deg is per-item over ALL
    // basket rows), but no whale part participates in any pair — and
    // none of the whale's 17k parts appear as a source or neighbor
    assert(nb.forall(t => t._1 <= 12L && t._2 <= 12L))
    assert(nb.map(t => (t._1, t._2)) == nbNoWhale.map(t => (t._1, t._2)))
  }

  test("topFraction keeps exactly ceil(frac*n) best-scored rows, stable under partitioning") {
    import spark.implicits._
    val d = (1L to 100L).map(i => (i, (i % 37).toDouble)).toDF("id", "score")
    val top = Sampling.topFraction(d, "score", "id", frac = 0.25)
    val rows = top.collect()
    assert(rows.length == 25) // ceil(0.25 * 100)
    // the kept set is the lexicographic top by (score desc, id asc)
    val want = (1L to 100L).map(i => (i, (i % 37).toDouble))
      .sortBy { case (id, sc) => (-sc, id) }.take(25).map(_._1).toSet
    assert(rows.map(_.getAs[Long]("id")).toSet == want)
    // ranks are 1..25 and consistent with the order
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 25L))
    // invariant under input partitioning
    val again = Sampling.topFraction(d.repartition(13), "score", "id", 0.25)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("rank"))).toSet
    assert(again == rows.map(r => (r.getAs[Long]("id"), r.getAs[Long]("rank"))).toSet)
  }

  test("spanCorruption: sentinel splicing matches the closed-form schedule") {
    import spark.implicits._
    // 25 tokens w0..w24: the only span is positions 18..20.
    val t25 = (0 until 25).map(i => s"w$i").mkString(" ")
    val r = Shaping.spanCorruption(Seq((1L, t25)).toDF("id", "text"), "id", "text")
      .collect().head
    assert(r.getAs[Long]("n_tokens") === 25L && r.getAs[Long]("n_spans") === 1L)
    val expIn = ((0 until 18).map(i => s"w$i") ++ Seq("<extra_id_0>") ++
      (21 until 25).map(i => s"w$i")).mkString(" ")
    assert(r.getAs[String]("input_text") === expIn)
    assert(r.getAs[String]("target_text") === "<extra_id_0> w18 w19 w20 <extra_id_1>")
  }

  test("spanCorruption: short and empty docs yield no spans, terminal sentinel only") {
    import spark.implicits._
    val rows = Shaping.spanCorruption(
      Seq((1L, "a b c"), (2L, "")).toDF("id", "text"), "id", "text")
      .orderBy(col("id")).collect()
    assert(rows(0).getAs[String]("input_text") === "a b c")
    assert(rows(0).getAs[String]("target_text") === "<extra_id_0>")
    assert(rows(1).getAs[Long]("n_tokens") === 0L)
    assert(rows(1).getAs[String]("input_text") === "")
    assert(rows(1).getAs[String]("target_text") === "<extra_id_0>")
  }

  test("spanCorruption: multiple spans number sentinels consecutively and " +
      "input+target token multisets reconstruct the document") {
    import spark.implicits._
    val t45 = (0 until 45).map(i => s"w$i").mkString(" ")
    val r = Shaping.spanCorruption(Seq((1L, t45)).toDF("id", "text"), "id", "text")
      .collect().head
    assert(r.getAs[Long]("n_spans") === 2L)
    assert(r.getAs[String]("target_text") ===
      "<extra_id_0> w18 w19 w20 <extra_id_1> w39 w40 w41 <extra_id_2>")
    // splice check: replacing sentinels in input with target spans gives the doc
    val spans = Map(0 -> Seq("w18", "w19", "w20"), 1 -> Seq("w39", "w40", "w41"))
    val rebuilt = r.getAs[String]("input_text").split(" ").toSeq.flatMap { t =>
      if (t.startsWith("<extra_id_")) spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
      else Seq(t)
    }
    assert(rebuilt === (0 until 45).map(i => s"w$i"))
  }

  test("pack_efficiency invariants: capacity bounds tokens, straddlers consistent") {
    val rep = graft.queries.ShapeQueries.queries("pack_efficiency")(spark, sf("sf0.001"))
      .collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val (tok, cap) = (r.getAs[Long]("sum_tokens"), r.getAs[Long]("capacity"))
      // contiguous packed stream ⇒ capacity is the minimal whole-sequence
      // cover of sum_tokens: sum ≤ cap < sum + seqLen
      assert(tok <= cap && cap < tok + 256,
        s"capacity should be the minimal whole-sequence cover: $r")
      val u = r.getAs[Double]("utilization")
      assert(u > 0.0 && u <= 1.0)
    }
  }
}
