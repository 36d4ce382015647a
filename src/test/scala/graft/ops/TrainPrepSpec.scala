package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-6 training-prep operators: segment boilerplate removal, bloom
  * membership, vocab/BPE counts, curriculum batching, export manifests,
  * heavy hitters. */
class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ boilerplate

  private def bpDocs = Seq(
    (1L, "alpha beta gamma delta COMMON FOOTER TEXT HERE"),
    (2L, "epsilon zeta eta theta COMMON FOOTER TEXT HERE"),
    (3L, "iota kappa lambda mu"),
    (4L, "COMMON FOOTER TEXT HERE")
  ).toDF("doc_id", "text")

  test("segments: non-overlapping width blocks, trailing partial kept") {
    val seg = Boilerplate.segments(bpDocs, "doc_id", "text", width = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // doc 3 has 4 tokens -> blocks of 3: [iota kappa lambda], [mu]
    val d3 = seg.filter(_._1 == 3L).sortBy(_._2)
    assert(d3.map(_._3).toSeq == Seq("iota kappa lambda", "mu"))
    // zero-token docs produce no rows
    val empty = Seq((9L, "   ")).toDF("doc_id", "text")
    assert(Boilerplate.segments(empty, "doc_id", "text", 3).count() == 0)
  }

  test("removeBoilerplate drops cross-doc segments, keeps uniques in order") {
    val out = Boilerplate.removeBoilerplate(bpDocs, "doc_id", "text",
      width = 4, maxDocFreq = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    // "common footer text here" (lowered) is one 4-token segment in docs
    // 1, 2, 4 -> doc_freq 3 > 1 -> removed everywhere.
    assert(out(0) == ((1L, 2L, 1L, "alpha beta gamma delta")))
    assert(out(1) == ((2L, 2L, 1L, "epsilon zeta eta theta")))
    assert(out(2) == ((3L, 1L, 1L, "iota kappa lambda mu")))
    // doc 4 is ALL boilerplate: stays, with empty text_clean
    assert(out(3) == ((4L, 1L, 0L, "")))
  }

  test("removeBoilerplate reassembly survives multi-partition input") {
    val docs = spark.range(0, 40)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          concat(lit("u"), col("id")), concat(lit("v"), col("id")),
          lit("shared tail phrase")).as("text"))
      .repartition(7)
    val out = Boilerplate.removeBoilerplate(docs, "doc_id", "text",
      width = 2, maxDocFreq = 1)
    // every doc: segments [u_i v_i][shared tail][phrase]; "shared tail"
    // and "phrase" are in 40 docs -> dropped; u_i v_i unique -> kept.
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.length == 40)
    assert(rows.forall { case (id, nseg, nkept, txt) =>
      nseg == 3 && nkept == 1 && txt == s"u$id v$id" })
  }

  // ------------------------------------------------------------------ bloom

  test("bloomMemberFlags equals the exact semi-join answer") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val newB = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      .unionAll(docs.filter(col("doc_id") % 15 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val got = Dedup.bloomMemberFlags(newB, corpus, "doc_id", "text", 2000L, 0.03)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val exactDups = newB
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .join(corpus.select(TextOps.fingerprint(col("text")).as("fp")).distinct(),
        Seq("fp"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    assert(got.size == newB.count())
    got.foreach { case (id, dup) => assert(dup == exactDups.contains(id), s"id $id") }
    // planted twins guarantee real hits exist
    assert(got.values.count(identity) >= exactDups.size && exactDups.nonEmpty)
  }

  // ------------------------------------------------------------------ vocab

  private def vocabDocs = Seq(
    (1L, "a b a b c"),
    (2L, "a b x")
  ).toDF("doc_id", "text")

  test("topNgrams counts the raw multiset with deterministic tiebreak") {
    val got = Vocab.topNgrams(vocabDocs, "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // bigrams: doc1 = a b, b a, a b, b c ; doc2 = a b, b x
    // counts: "a b"->3, then ties at 1 break by gram asc: "b a", "b c"
    assert(got == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("rawGrams multiset vs distinct shingles") {
    val perDoc = vocabDocs
      .select(col("doc_id"), Vocab.rawGrams(col("text"), 2).as("g"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(perDoc(1L) == Seq("a b", "b a", "a b", "b c"))
    val distinctDoc = vocabDocs
      .select(col("doc_id"), Dedup.shingles(col("text"), 2).as("g"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(distinctDoc(1L) == Seq("a b", "b a", "b c"))
  }

  test("bpePairCounts weights pairs by word frequency") {
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val got = Vocab.bpePairCounts(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // "low" x2: lo, ow ; "lower" x1: lo, ow, we, er
    assert(got == Map("lo" -> 3L, "ow" -> 3L, "we" -> 1L, "er" -> 1L))
  }

  test("bpeEncode applies merges in order; piece counts are per-doc sums") {
    val docs = Seq((1L, "low lower"), (2L, "low")).toDF("doc_id", "text")
    // merges (lo), (low): "low" -> 1 piece, "lower" -> low+e+r = 3 pieces
    val out = Vocab.bpeEncode(docs, "doc_id", "text",
      Seq("l" -> "o", "lo" -> "w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 4L, 2L -> 1L))
    // no merges: every char is a piece
    val raw = Vocab.bpeEncode(docs, "doc_id", "text", Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(raw == Map(1L -> 8L, 2L -> 3L))
    // a merge that never fires changes nothing
    val noop = Vocab.bpeEncode(docs, "doc_id", "text",
      Seq("z" -> "q", "l" -> "o", "lo" -> "w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(noop == out)
  }

  test("bpeEncode round-trips bpeTrain's merges on its own corpus") {
    val docs = Seq((1L, "aa aa ab"), (2L, "aa ab ab")).toDF("doc_id", "text")
    val merges = Vocab.bpeTrain(docs, "text", 2)
      .orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // first merge must be (a,a): freq 4·? — "aa" words dominate
    assert(merges.head == ("a" -> "a"))
    val out = Vocab.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // after (a,a) and the learned 2nd merge, every word is 1-2 pieces
    assert(out.values.forall(n => n >= 3L && n <= 6L))
  }

  // ------------------------------------------------------------- curriculum

  test("curriculumBatches: bucket arithmetic, batch bounds, determinism") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val out = Shaping.curriculumBatches(docs, "doc_id", "text",
      bucketTokens = 32, batchSize = 16, shards = 4).cache()
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length == docs.count())
    rows.foreach { case (_, nt, bucket, shard, _, pos) =>
      assert(bucket == nt / 32)
      assert(shard >= 0 && shard < 4)
      assert(pos >= 1 && pos <= 16)
    }
    // within (bucket, shard, batch): positions are 1..n with no gaps, and
    // only the LAST batch may be short
    rows.groupBy(t => (t._3, t._4)).foreach { case ((b, s), g) =>
      val byBatch = g.groupBy(_._5).toSeq.sortBy(_._1)
      byBatch.zipWithIndex.foreach { case ((batch, members), i) =>
        assert(members.map(_._6).sorted.toSeq == (1 to members.length).map(_.toLong),
          s"bucket $b shard $s batch $batch positions")
        if (i < byBatch.length - 1)
          assert(members.length == 16, s"non-final batch short in $b/$s")
      }
    }
    out.unpersist()
  }

  // --------------------------------------------------------------- manifest

  test("exportManifest totals reconcile with the corpus") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val m = Shaping.exportManifest(docs, "doc_id", "text", shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(m.map(_._1).distinct.length == m.length) // one row per shard
    assert(m.map(_._2).sum == docs.count())
    val totalToks = docs.select(sum(size(TextOps.tokens(col("text")))))
      .as[Long].head()
    assert(m.map(_._3).sum == totalToks)
    assert(m.map(_._4).min == 0L)
    // checksum is order-free: repartitioned input yields identical rows
    val m2 = Shaping.exportManifest(docs.repartition(13), "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(5))).toMap
    m.foreach { case (s, _, _, _, _, ck) => assert(m2(s) == ck) }
  }

  // ---------------------------------------------------------------- unicode

  test("normalizeUnicode composes NFC and strips controls, preserves case") {
    val docs = Seq(
      (1L, "Café NaïveEnd"),  // decomposed + BEL
      (2L, "plain ASCII stays"),
      (3L, "tab\tand\nnewline kept")            // whitespace is NOT stripped
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
      TextOps.normalizeUnicode(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) == "Café NaïveEnd") // composed, BEL gone, case kept
    assert(got(2L) == "plain ASCII stays")
    assert(got(3L) == "tab\tand\nnewline kept")
    // idempotent: normalizing twice changes nothing
    val twice = docs.select(TextOps.normalizeUnicode(
      TextOps.normalizeUnicode(col("text"))).as("t"))
      .collect().map(_.getString(0))
    assert(twice.toSet == got.values.toSet)
  }

  // -------------------------------------------------------------- count-min

  test("CountMinAgg: never underestimates, bounded overcount, merge-invariant") {
    import graft.functions.CountMinAgg._
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_partkey").cast("string").as("key"))
    val depth = 5; val width = 2048
    val n = li.count()
    val sk = li.agg(cmSketch(col("key"), depth, width).as("sk"))
    val exact = li.groupBy("key").agg(count(lit(1)).as("cnt"))
    val est = exact.crossJoin(broadcast(sk))
      .select(col("key"), col("cnt"),
        cmEstimate(col("sk"), col("key"), depth, width).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.nonEmpty)
    val slack = (2.0 * math.E / width * n).ceil.toLong
    est.foreach { case (k, cnt, e) =>
      assert(e >= cnt, s"CM underestimated $k: $e < $cnt")
      assert(e <= cnt + slack, s"CM overcount for $k out of bound: $e > $cnt + $slack")
    }
    // merge invariance: partitioning must not change a single counter
    val a = sk.collect()(0).getSeq[Long](0)
    val b = li.repartition(13)
      .agg(cmSketch(col("key"), depth, width)).collect()(0).getSeq[Long](0)
    assert(a == b)
    // total conservation: every depth row sums to the row count
    (0 until depth).foreach { d =>
      assert(a.slice(d * width, (d + 1) * width).sum == n, s"row $d total")
    }
  }

  // -------------------------------------------------------------- mutual kNN

  test("mutualEdges keeps exactly the bidirectional pairs, one row each") {
    val edges = Seq(
      (1L, 2L, 0.9), (2L, 1L, 0.9),   // mutual
      (1L, 3L, 0.8),                  // one-directional (3's top-k omits 1)
      (3L, 4L, 0.7), (4L, 3L, 0.7),   // mutual
      (5L, 1L, 0.6)                   // hub edge, not reciprocated
    ).toDF("query_id", "vec_id", "cos")
    val got = Ann.mutualEdges(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 0.9), (3L, 4L, 0.7)))
  }

  test("mutualEdges over bruteTopK is symmetric-consistent on the fixture") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .filter(col("vec_id") < 100)
    val directed = Ann.bruteTopK(emb, emb, k = 5)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val mutual = Ann.mutualEdges(Ann.bruteTopK(emb, emb, k = 5))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mutual.nonEmpty)
    // soundness + completeness in one check: output = exactly the
    // bidirectional directed pairs, emitted once with a < b
    val expected = directed.filter { case (a, b) => a < b && directed.contains((b, a)) }
    assert(mutual.toSet == expected)
  }

  // ----------------------------------------------------------- heavy hitters

  test("heavyHitters matches brute force and shares sum correctly") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val got = Profile.heavyHitters(li, "l_partkey", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val total = li.count()
    val brute = li.groupBy(col("l_partkey").cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(t => (-t._2, t._1)).take(10)
    assert(got.map(t => (t._1, t._2)).toSeq == brute.toSeq)
    got.foreach { case (_, cnt, share) =>
      assert(math.abs(share - cnt.toDouble / total) < 1e-15) }
  }

  // ------------------------------------------------------------- data card

  test("corpusStats: exact volumes, length envelope, dup count per language") {
    // "the" marks en, "der" marks de (TextOps.LangMarkers); doc 3 is a
    // byte-identical twin of doc 1 after fingerprint normalization.
    val docs = Seq(
      (1L, "the quick fox jumps over the lazy dog"),
      (2L, "the dog sleeps"),
      (3L, "The quick fox  jumps over the lazy dog"),
      (4L, "der hund schläft der hund")
    ).toDF("doc_id", "text")
    val got = Profile.corpusStats(docs, "text").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("en", "de"))
    val en = got("en")
    assert(en.getLong(1) == 3L)                             // n_docs
    assert(en.getLong(2) == (8 + 3 + 8).toLong)             // tokens_total
    assert(en.getLong(3) == 14L && en.getLong(4) == 38L)    // len envelope
    assert(math.abs(en.getDouble(5) - math.rint((37 + 14 + 38) / 3.0 * 1e6) / 1e6) < 1e-9)
    assert(en.getLong(7) == 1L)                             // docs 1,3 collide
    val de = got("de")
    assert(de.getLong(1) == 1L && de.getLong(7) == 0L)
    // mean_quality mirrors the per-row 6dp-rounded score exactly
    val enQ = docs.filter(col("doc_id") =!= 4L)
      .select(round(TextOps.qualityScore(col("text")), 6))
      .collect().map(_.getDouble(0)).sum / 3.0
    assert(math.abs(en.getDouble(6) - enQ) < 5e-7)
  }
}
