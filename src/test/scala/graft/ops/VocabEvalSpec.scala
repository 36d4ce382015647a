package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Closed-form checks for the round-9 vocab/LM additions: Zipf OLS,
  * the negative-sampling table, and interpolated Kneser–Ney scoring. */
class VocabEvalSpec extends SparkSpec {

  import spark.implicits._

  test("zipfSlope recovers an exact power law") {
    // freq(rank) = 48 / rank for ranks 1..4 (48,24,16,12) → ln f =
    // ln 48 − 1·ln r: slope −1, intercept ln 48 (up to 6dp rounding).
    val docs = Seq(
      Seq.fill(48)("w1"), Seq.fill(24)("w2"), Seq.fill(16)("w3"),
      Seq.fill(12)("w4")).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toDF("id", "text")
    val r = Vocab.zipfSlope(docs, "text", k = 4).collect().head
    assert(r.getLong(0) === 4L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-4, r)
    assert(math.abs(r.getDouble(2) - math.log(48.0)) < 1e-4, r)
  }

  test("zipfSlope: single-type vocabulary → degenerate den → slope := 0") {
    val docs = Seq((1L, "x x x")).toDF("id", "text")
    val r = Vocab.zipfSlope(docs, "text", k = 5).collect().head
    assert(r.getLong(0) === 1L && r.getDouble(1) === 0.0 && r.getDouble(2) === 0.0)
  }

  test("negativeSamplingTable: ranks deterministic, mass sums to ~1e6") {
    val docs = Seq((1L, "a a a a b b c")).toDF("id", "text")
    val rows = Vocab.negativeSamplingTable(docs, "text", k = 10)
      .orderBy(col("rank")).collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("a", "b", "c"))
    assert(rows.map(_.getLong(2)).toSeq === Seq(4L, 2L, 1L))
    val mass = rows.map(_.getLong(3)).sum
    // floors lose < k micro-units
    assert(mass <= 1000000L && mass > 1000000L - rows.length)
    // count^0.75 ordering strictly decreasing here
    assert(rows.map(_.getLong(3)).sliding(2).forall(p => p(0) > p(1)))
  }

  test("kneserNeyScore: hand-computed single-bigram corpus") {
    // corpus = one doc "a b": model {(a,b):1}; c1(a)=1, N1+(a,·)=1,
    // N1+(·,b)=1, N1+(·,·)=1, V=2.
    // Pcont(b) = (1+0.5)/(1+0.5·3) = 0.6
    // P(b|a) = max(1−0.75,0)/1 + 0.75·1/1·0.6 = 0.25 + 0.45 = 0.7
    val docs = Seq((1L, "a b")).toDF("id", "text")
    val r = LangModel.kneserNeyScore(docs, docs, "id", "text").collect().head
    assert(r.getLong(1) === 1L)
    assert(math.abs(r.getDouble(2) - (-math.log(0.7))) < 1e-6, r)
  }

  test("kneserNeyScore: unseen context backs off to the continuation model") {
    val corpus = Seq((1L, "a b")).toDF("id", "text")
    val docs = Seq((2L, "z b")).toDF("id", "text") // context z unseen
    val r = LangModel.kneserNeyScore(docs, corpus, "id", "text").collect().head
    // P = Pcont(b) = 0.6 (finite — no log(0) for OOV paths)
    assert(math.abs(r.getDouble(2) - (-math.log(0.6))) < 1e-6, r)
    // fully-unseen word: Pcont = 0.5/(1+1.5) = 0.2
    val oov = Seq((3L, "q r")).toDF("id", "text")
    val r2 = LangModel.kneserNeyScore(oov, corpus, "id", "text").collect().head
    assert(math.abs(r2.getDouble(2) - (-math.log(0.2))) < 1e-6, r2)
  }

  test("luhnCards validates known Luhn vectors and masks the tail") {
    // 4532015112830366 is a standard Luhn-valid test PAN; bumping the
    // check digit by one must fail.
    val docs = Seq(
      (1L, "pay with 4532015112830366 now"),
      (2L, "pay with 4532015112830367 now"),
      (3L, "no digits here")).toDF("id", "text")
    val rows = TextOps.luhnCards(docs, "id", "text")
      .orderBy(col("id")).collect()
    assert(rows.length === 2)
    assert(rows(0).getString(1) === "************0366" && rows(0).getBoolean(2))
    assert(rows(1).getString(1) === "************0367" && !rows(1).getBoolean(2))
  }

  test("kneserNeyScore: short docs carry n_bigrams = 0 and null nll") {
    val corpus = Seq((1L, "a b c")).toDF("id", "text")
    val docs = Seq((2L, "solo"), (3L, "")).toDF("id", "text")
    val rows = LangModel.kneserNeyScore(docs, corpus, "id", "text")
      .orderBy(col("id")).collect()
    assert(rows.forall(r => r.getLong(1) === 0L && r.isNullAt(2)))
  }
}
