package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for corpus-hygiene operators: repetition stats (the custom
  * expression against a hand-computed truth and the composable-builtins
  * form) and n-gram decontamination (planted overlap detected, clean docs
  * untouched, report/clean consistency). */
class CorpusSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("compressionStats: repetitive < prose < noise ordering, exact raw lengths") {
    val repetitive = Array.fill(200)("spam").mkString(" ")
    val prose = "the quick brown fox jumps over the lazy dog while seven " +
      "wizards brew tonic and a jury of vexed folk quiz them nightly " * 8
    val rnd = new scala.util.Random(42)
    val noise = Seq.fill(1000)((rnd.nextInt(93) + 33).toChar).mkString
    val df = docs((1L, repetitive), (2L, prose), (3L, noise))
      .select(col("doc_id"), TextOps.compressionStats(col("text")).as("c"))
      .select(col("doc_id"), col("c.raw_bytes"), col("c.compressed_bytes"),
        col("c.ratio"))
    val m = df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m(1L)._1 == repetitive.getBytes("UTF-8").length.toLong)
    assert(m(2L)._1 == prose.getBytes("UTF-8").length.toLong)
    assert(m(1L)._3 < m(2L)._3 && m(2L)._3 < m(3L)._3)
    assert(m(1L)._3 < 0.1)  // pure repetition compresses away
    assert(m(3L)._3 > 0.5)  // near-random noise barely compresses
    // null text -> null struct, not a crash
    val nul = docs((9L, null.asInstanceOf[String]))
      .select(TextOps.compressionStats(col("text")).as("c")).collect()
    assert(nul.head.isNullAt(0))
  }

  test("growthCurve: first-seen attribution, empty docs, running totals") {
    val fixture = docs(
      (10L, "a b a"),      // 3 tokens, new types {a,b} = 2
      (20L, ""),           // empty: 0 / 0
      (30L, "b c c d"),    // 4 tokens, new {c,d} = 2
      (40L, "a d"))        // 2 tokens, new 0
    val got = Vocab.growthCurve(fixture, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(10L) == (3L, 2L, 3L, 2L))
    assert(got(20L) == (0L, 0L, 3L, 2L))
    assert(got(30L) == (4L, 2L, 7L, 4L))
    assert(got(40L) == (2L, 0L, 9L, 4L))
  }

  test("repetitionStats: hand-computed counts, case/whitespace handling") {
    val d = docs(
      1L -> "a b a b a",        // unigrams: 5 total, 2 distinct, max 3 (a)
      2L -> "  A  a\tB ",       // lowercased: 3 total, 2 distinct, max 2
      3L -> "solo",             // 1 total, 1 distinct, max 1
      4L -> "   ")              // no tokens
    val out = d.select(col("doc_id"), TextOps.repetitionStats(col("text"), 1).as("s"))
      .orderBy("doc_id")
      .select("doc_id", "s.total", "s.n_distinct", "s.max_count")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 5L, 2L, 3L), (2L, 3L, 2L, 2L),
      (3L, 1L, 1L, 1L), (4L, 0L, 0L, 0L)))
  }

  test("repetitionStats: bigrams match hand-computed repetition") {
    // bigrams of "x y x y x": [x y, y x, x y, y x] -> 4 total, 2 distinct, max 2
    val out = docs(1L -> "x y x y x")
      .select(TextOps.repetitionStats(col("text"), 2).as("s"))
      .select("s.total", "s.n_distinct", "s.max_count")
      .head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) == ((4L, 2L, 2L)))
    // fewer tokens than n -> all zero
    val z = docs(1L -> "one token pair")
      .select(TextOps.repetitionStats(col("text"), 4).as("s"))
      .select("s.total").head().getLong(0)
    assert(z == 0L)
  }

  test("repetitionStats agrees with the composable-builtins form on the fixture") {
    val d = graft.core.Tables.table(spark, sf("sf0.001"), "documents").limit(100)
    val toks = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val grams = transform(sequence(lit(1), greatest(size(toks) - 1, lit(0))),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
    val both = d.select(
        TextOps.repetitionStats(col("text"), 2).as("s"),
        when(size(toks) >= 2, grams).otherwise(array()).as("g"))
      .select(col("s.total"), col("s.n_distinct"), size(col("g")).cast("long"),
        size(array_distinct(col("g"))).cast("long"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(0) == r.getLong(2), "total mismatch vs builtins")
      assert(r.getLong(1) == r.getLong(3), "distinct mismatch vs builtins")
    }
  }

  test("decontaminate: planted n-gram overlap found, clean corpus passes") {
    val evalSet = docs(
      100L -> "alpha beta gamma delta epsilon zeta eta theta",
      101L -> "one two three four five six seven eight")
    val train = docs(
      1L -> "noise words here alpha beta gamma delta epsilon filler", // 5-gram hit
      2L -> "totally unrelated content with no overlap at all",
      3L -> "one two three four five and then it diverges")           // 5-gram hit
    val rep = Decontaminate.report(train, evalSet, "doc_id", "text", n = 5)
      .orderBy("id").collect()
    assert(rep.map(_.getAs[Long]("id")).toSeq == Seq(1L, 3L))
    val r1 = rep.head
    assert(r1.getAs[Long]("n_hits") == 1L)      // exactly one shared 5-gram
    assert(r1.getAs[Long]("n_eval_docs") == 1L)
    assert(r1.getAs[String]("eval_ids") == "100")
    val kept = Decontaminate.clean(train, evalSet, "doc_id", "text", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L))
  }

  test("decontaminate: clean == train minus report ids (consistency)") {
    val d = graft.core.Tables.table(spark, sf("sf0.001"), "documents")
    val evalSet = d.filter(col("doc_id") % 17 === 0).select(col("doc_id"), col("text"))
    val train = d.filter(col("doc_id") % 17 =!= 0).select(col("doc_id"), col("text"))
    val flagged = Decontaminate.report(train, evalSet, "doc_id", "text", n = 6)
      .select("id").collect().map(_.getLong(0)).toSet
    val kept = Decontaminate.clean(train, evalSet, "doc_id", "text", n = 6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = train.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == all -- flagged)
    assert(flagged.subsetOf(all))
  }
}
