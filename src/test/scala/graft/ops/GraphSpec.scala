package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the graph operators: hand-computed fixed-point PageRank on a
  * tiny graph, mass-conservation and determinism properties, and the
  * degree profile merge. */
class GraphSpec extends SparkSpec {

  private def edges(rows: (String, String, Long)*) = {
    import spark.implicits._
    rows.toDF("src", "dst", "w")
  }

  test("pagerankScaled: one iteration on a 2-node cycle is hand-checkable") {
    // a->b, b->a, unit weights. N=2, r0 = Scale/2 = 5e11 each.
    // contrib = ((5e11*850) div (1000*1)) * 1 = 4.25e11
    // r1 = 1.5e11/2 + 4.25e11 = 7.5e10 + 4.25e11 = 5e11 (mass conserved)
    val out = Graph.pagerankScaled(
      edges(("a", "b", 1L), ("b", "a", 1L)), "src", "dst", "w", iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 500000000000L, "b" -> 500000000000L))
  }

  test("pagerankScaled: star graph concentrates rank on the hub") {
    // 3 leaves all point at hub; hub points at one leaf.
    val e = edges(("l1", "h", 1L), ("l2", "h", 1L), ("l3", "h", 1L),
      ("h", "l1", 1L))
    val out = Graph.pagerankScaled(e, "src", "dst", "w", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("h") > out("l1") && out("l1") > out("l2"))
    assert(out("l2") == out("l3")) // symmetric leaves tie exactly
    // Mass never exceeds the initial total (teleport + damped flow only
    // shrinks via integer truncation; no dangling nodes here).
    assert(out.values.sum <= Graph.Scale)
    assert(out.values.sum > Graph.Scale - 1000L) // truncation loss is tiny
  }

  test("pagerankScaled: weighted edges split contribution by weight, " +
    "bit-identical across partitionings") {
    val e = edges(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L),
      ("c", "a", 1L))
    val r1 = Graph.pagerankScaled(e, "src", "dst", "w", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r2 = Graph.pagerankScaled(e.repartition(7), "src", "dst", "w", 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 == r2)
    assert(r1("b") > r1("c")) // 3:1 out-weight favors b
  }

  test("pagerankScaled rejects internal column collisions") {
    intercept[IllegalArgumentException] {
      Graph.pagerankScaled(
        edges(("a", "b", 1L)).withColumnRenamed("w", "r"), "src", "dst", "r", 1)
    }
  }

  test("degrees: out/in merge with zeros where a side is absent") {
    val out = Graph.degrees(
      edges(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 5L)),
      "src", "dst", "w")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == ((2L, 3L, 0L, 0L))) // no in-edges
    assert(out("b") == ((1L, 5L, 1L, 2L)))
    assert(out("c") == ((0L, 0L, 2L, 6L))) // no out-edges
  }

  test("histogram: clamped edge bins, exact counts and extremes") {
    import spark.implicits._
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 25.0, 99.0, 250.0)
      .toDF("v")
    val out = Profile.histogram(df, "v", lo = 0.0, width = 10.0, bins = 10)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out(0L) == ((0.0, 3L, -5.0, 9.9))) // -5 clamps into bin 0
    assert(out(1L) == ((10.0, 1L, 10.0, 10.0)))
    assert(out(2L) == ((20.0, 1L, 25.0, 25.0)))
    assert(out(9L) == ((90.0, 2L, 99.0, 250.0))) // 250 clamps into bin 9
    assert(out.size == 4) // empty bins emit nothing
  }

  test("modeBy: tie breaks to count desc then value asc") {
    import spark.implicits._
    val df = Seq("g1" -> "b", "g1" -> "b", "g1" -> "a", "g1" -> "a",
      "g1" -> "z", "g2" -> "q").toDF("k", "v")
    val out = Profile.modeBy(df, "k", "v").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out("g1") == (("a", 2L))) // a and b tie at 2; a wins lexically
    assert(out("g2") == (("q", 1L)))
  }

  test("scd2: versions, interval chaining and is_current per key") {
    import spark.implicits._
    val log = Seq(
      (1L, 10L, "A", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, 11L, "B", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      (1L, 12L, "C", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      (2L, 20L, "X", java.sql.Timestamp.valueOf("2024-03-01 00:00:00")))
      .toDF("k", "seq", "attr", "ts")
    val out = Snapshot.scd2(log, "k", "ts", "seq")
      .orderBy("k", "version").collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getAs[Long]("version")).toSeq == Seq(1L, 2L, 3L))
    // same-ts rows order by the tie column: 11 before 12
    assert(k1.map(_.getLong(1)).toSeq == Seq(10L, 11L, 12L))
    // intervals chain: each valid_to equals the next valid_from
    assert(k1(0).getAs[java.sql.Timestamp]("valid_to") ==
      k1(1).getAs[java.sql.Timestamp]("valid_from"))
    assert(k1(2).getAs[java.sql.Timestamp]("valid_to") == null)
    assert(k1.map(_.getAs[Boolean]("is_current")).toSeq ==
      Seq(false, false, true))
    assert(out.filter(_.getLong(0) == 2L).head.getAs[Boolean]("is_current"))
  }

  test("invertedIndex: per-doc dedup, sorted postings, exact df") {
    import spark.implicits._
    val docs = Seq(
      (3L, "apple banana apple"),
      (1L, "banana cherry"),
      (2L, "apple")).toDF("doc_id", "text")
    val out = Vocab.invertedIndex(docs, "doc_id", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(out("apple") == ((2L, Seq(2L, 3L)))) // dup inside doc 3 counted once
    assert(out("banana") == ((2L, Seq(1L, 3L))))
    assert(out("cherry") == ((1L, Seq(1L))))
  }
}
