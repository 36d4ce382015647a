package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the lexical-retrieval operators: BM25 hand-check on a tiny
  * corpus and reciprocal-rank-fusion edge behavior. */
class RetrievalSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bm25: rarer term outranks frequent term; non-matching docs drop") {
    val d = docs(
      1L -> "apple apple banana", // tf(apple)=2
      2L -> "apple cherry",       // cherry is rare
      3L -> "durian durian")      // matches nothing
    val out = Retrieval.bm25Scores(d, "doc_id", "text",
      Seq("apple", "cherry")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L)) // doc 3 never scored
    // cherry (df=1) has higher idf than apple (df=2): doc 2 wins even
    // though doc 1 has tf(apple)=2
    assert(out(2L) > out(1L))
    assert(out.values.forall(_ > 0.0))
  }

  test("bm25: score is partitioning-invariant (decimal-summed contribs)") {
    val d = docs((1L to 30L).map(i =>
      i -> s"w$i apple ${if (i % 3 == 0) "banana" else "pear"} apple"): _*)
    val q = Seq("apple", "banana")
    val a = Retrieval.bm25Scores(d, "doc_id", "text", q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Retrieval.bm25Scores(d.repartition(7), "doc_id", "text", q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("rrfFuse: both-sides sum, single-side coalesces to one term") {
    import spark.implicits._
    val r1 = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val r2 = Seq((2L, 1L), (3L, 2L)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(r1, r2, "id", "rank", k = 60).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0 / 61.0)            // only in r1
    assert(out(2L) == 1.0 / 62.0 + 1.0 / 61.0) // both
    assert(out(3L) == 1.0 / 62.0)            // only in r2
    // consensus doc 2 outranks either single-list doc
    assert(out(2L) > out(1L) && out(2L) > out(3L))
  }

  test("phraseSearch: exact adjacency only, hit counts and first positions") {
    val d = docs(
      1L -> "big red fox jumps big red fox",  // 2 hits of "big red fox", first at 0
      2L -> "big red dog red fox big",        // terms present, never adjacent in order
      3L -> "x big red fox y",                // 1 hit at pos 1
      4L -> "red big fox")                    // wrong order
    val got = Retrieval.phraseSearch(d, "doc_id", "text",
      Seq("big", "red", "fox")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((2L, 0L)), 3L -> ((1L, 1L))))
  }

  test("proximitySearch: ordered window, pair counts, tightest span") {
    val d = docs(
      1L -> "hash x y join",        // span 3 ≤ 4: hit
      2L -> "hash a b c d join",    // span 5 > 4: miss
      3L -> "join then hash",       // wrong order: miss
      4L -> "hash join hash x join") // pairs: (0,1),(0,4✗>4? 4-0=4 ok),(2,4)
    val got = Retrieval.proximitySearch(d, "doc_id", "text", "hash", "join",
      maxDist = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((1L, 3L)), 4L -> ((3L, 1L))))
    // adjacency-only window
    val tight = Retrieval.proximitySearch(d, "doc_id", "text", "hash",
      "join", maxDist = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(tight == Map(4L -> ((1L, 1L))))
  }

  test("phraseSearch: overlapping occurrences each count") {
    val d = docs(1L -> "a a a a")
    val got = Retrieval.phraseSearch(d, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(got == ((3L, 0L)))
  }

  test("phraseSearch: single-term phrase equals token postings") {
    val d = docs(1L -> "w q w", 2L -> "q", 3L -> "z")
    val got = Retrieval.phraseSearch(d, "doc_id", "text", Seq("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L))
  }
}
