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

  test("pagerankScaled: deep iteration with checkpointing matches the unbroken lineage") {
    val e = edges(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 3L),
      ("a", "c", 1L))
    val deep = Graph.pagerankScaled(e, "src", "dst", "w", iters = 12,
      checkpointEvery = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = Graph.pagerankScaled(e, "src", "dst", "w", iters = 12,
      checkpointEvery = 100) // never fires
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(deep == plain) // lineage truncation is plan-only, not semantic
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

  test("triangleCounts: K4, disjoint triangle, and a path — exact per-node counts") {
    import spark.implicits._
    // K4 on 1..4 (every node in C(3,2)=3 triangles), a disjoint triangle
    // 5-6-7, and a pendant path 7-8-9 (no triangles for 8, 9).
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val e = (k4 ++ Seq((5L, 6L), (5L, 7L), (6L, 7L), (7L, 8L), (8L, 9L)))
      .toDF("a", "b")
    val out = Graph.triangleCounts(e, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(out(_) == 3L))
    assert(Seq(5L, 6L, 7L).forall(out(_) == 1L))
    assert(!out.contains(8L) && !out.contains(9L)) // path nodes emit nothing
    // Credit invariant: Σ per-node counts = 3 × total triangles (4 + 1).
    assert(out.values.sum == 3L * 5L)
  }

  test("triangleCounts: invariant under partitioning; hub wedge order irrelevant") {
    import spark.implicits._
    // Star hub 0 joined to 1..6 plus ring edges closing alternate
    // triangles: hub has high degree so orientation points AWAY from it
    // on every edge it could dominate — counts must still be exact.
    val e = ((1L to 6L).map(i => (0L, i)) ++
      Seq((1L, 2L), (3L, 4L), (5L, 6L))).toDF("a", "b")
    val r1 = Graph.triangleCounts(e, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r2 = Graph.triangleCounts(e.repartition(7), "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r2)
    assert(r1(0L) == 3L) // hub corners all three triangles
    assert((1L to 6L).forall(r1(_) == 1L))
  }

  test("linkPrediction: K4-minus-an-edge scores the missing pair; adjacency excluded") {
    import spark.implicits._
    // Nodes 1..4, all K4 edges except (3,4): the classic "predict the
    // missing link" setup. Pair (3,4) shares neighbours {1,2}, both of
    // degree 3 → cn=2, ra = 2·⌊1e12/3⌋. Adjacent pairs must not appear.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("a", "b")
    val out = Graph.linkPrediction(e, "a", "b", minCommon = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == Map((3L, 4L) -> ((2L, 2L * (Graph.Scale / 3)))))
    // minCommon=1 adds nothing here (every non-adjacent pair already
    // shares ≥ 2) but on a path 5-6-7 it surfaces (5,7) via centre 6.
    val path = Seq((5L, 6L), (6L, 7L)).toDF("a", "b")
    val p = Graph.linkPrediction(path, "a", "b", minCommon = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(p == Map((5L, 7L) -> ((1L, Graph.Scale / 2))))
  }

  test("linkPrediction: hub cap removes hub-centred wedges; partition invariant") {
    import spark.implicits._
    // Star hub 0 — 1..5 plus edge (1,2). Uncapped: every pair in 1..5
    // scores via centre 0 (deg 5); pair (1,2) is adjacent so excluded.
    // With maxDegree=4 the hub is no longer a valid centre, and no
    // qualifying wedge centre remains (1 and 2 have degree 2 but their
    // neighbour pair (0, other) is adjacent or the score drops minCommon).
    val e = ((1L to 5L).map(i => (0L, i)) ++ Seq((1L, 2L))).toDF("a", "b")
    val full = Graph.linkPrediction(e, "a", "b", minCommon = 1).collect()
    assert(full.length == 9) // C(5,2)=10 hub wedge pairs minus adjacent (1,2)
    assert(full.forall(_.getLong(3) == Graph.Scale / 5))
    val capped = Graph.linkPrediction(e, "a", "b", minCommon = 1,
      maxDegree = 4)
    assert(capped.count() == 0)
    val repart = Graph.linkPrediction(e.repartition(7), "a", "b",
      minCommon = 1).collect()
    assert(repart.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).sorted.sameElements(full.map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).sorted))
  }

  test("kCore: cascading peel drains a path, keeps the ring, K4 survives k=3") {
    import spark.implicits._
    // Ring 1-2-3-4-5-1 with a pendant path 5-6-7-8: the 2-core is the
    // ring alone, and the path drains one layer per round (8, then 7,
    // then 6) — exercises multi-round cascade, not just one peel.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L),
      (5L, 6L), (6L, 7L), (7L, 8L)).toDF("a", "b")
    val core2 = Graph.kCore(e, "a", "b", k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == (1L to 5L).map(_ -> 2L).toMap)
    // k=3 on the same graph: empty (ring degrees are all 2).
    assert(Graph.kCore(e, "a", "b", k = 3).count() == 0L)
    // K4 + pendant: 3-core is exactly the K4 with degree 3 each.
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)) :+
      ((4L, 9L))
    val core3 = Graph.kCore(k4.toDF("a", "b"), "a", "b", k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core3 == (1L to 4L).map(_ -> 3L).toMap)
  }

  test("kCore: partition invariant; empty input; maxIters guard throws") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val r1 = Graph.kCore(e, "a", "b", k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val r2 = Graph.kCore(e.repartition(5), "a", "b", k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(r1 == r2 && r1 == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    assert(Graph.kCore(e.limit(0), "a", "b", k = 2).count() == 0L)
    // A 4-link chain needs 2 drain rounds + 1 confirm; maxIters=1 must throw.
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    intercept[IllegalStateException] {
      Graph.kCore(chain, "a", "b", k = 2, maxIters = 1).count()
    }
  }

  test("personalizedPagerankScaled: seed-localized mass, zeros off-component") {
    import spark.implicits._
    // Symmetric pair 1↔2 plus disjoint pair 3↔4, seed {1}, 2 iterations.
    // Hand-computed fixed point trace (Scale=1e12, damp 850/1000):
    //   r0: 1→1e12;  r1: 1→150e9 (teleport), 2→850e9
    //   r2: 1→150e9+722.5e9, 2→127.5e9; component {3,4} never gains mass.
    val e = Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 4L, 1L), (4L, 3L, 1L))
      .toDF("src", "dst", "w")
    val out = Graph.personalizedPagerankScaled(e, "src", "dst", "w",
      Seq(1L).toDF("node"), iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 872500000000L, 2L -> 127500000000L,
      3L -> 0L, 4L -> 0L))
    // Partition invariance (integer arithmetic ⇒ bit-identical).
    val rep = Graph.personalizedPagerankScaled(e.repartition(5), "src",
      "dst", "w", Seq(1L).toDF("node"), iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep == out)
    // Two seeds split teleport mass: totals stay ≤ Scale, both seeds hold
    // the teleport floor.
    val two = Graph.personalizedPagerankScaled(e, "src", "dst", "w",
      Seq(1L, 3L).toDF("node"), iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two.values.sum <= Graph.Scale)
    assert(two(1L) >= Graph.Teleport / 2 && two(3L) >= Graph.Teleport / 2)
  }

  test("hopDistances: multi-source min distance, hop cap, unreachable excluded") {
    import spark.implicits._
    // Path 1-2-3-4-5-6 plus disjoint edge (10,11); sources {1, 5}.
    // Min-distance layering: 2→1(from 1), 4→1(from 5), 3→2(either),
    // 6→1(from 5); 10/11 unreachable. Cap at 2 keeps everything here.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L)).toDF("a", "b")
    val src = Seq(1L, 5L).toDF("node")
    val out = Graph.hopDistances(e, "a", "b", src, maxHops = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 6L -> 1, 3L -> 2))
    // Cap 1: node 3 now outside the horizon.
    val capped = Graph.hopDistances(e, "a", "b", src, maxHops = 1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped == Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 6L -> 1))
    // Exhausted frontier: rounds past the graph's diameter are no-ops.
    val deep = Graph.hopDistances(e, "a", "b", Seq(10L).toDF("node"),
      maxHops = 6).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(deep == Map(10L -> 0, 11L -> 1))
  }

  test("hopDistances: cycle takes the short way round; partition invariant") {
    import spark.implicits._
    // 6-ring from node 1: the far node (4) is 3 hops, both ways agree.
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 6L)).toDF("a", "b")
    val src = Seq(1L).toDF("node")
    val r1 = Graph.hopDistances(ring, "a", "b", src, maxHops = 5).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(r1 == Map(1L -> 0, 2L -> 1, 6L -> 1, 3L -> 2, 5L -> 2, 4L -> 3))
    val r2 = Graph.hopDistances(ring.repartition(5), "a", "b",
      src.repartition(2), maxHops = 5).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(r1 == r2)
  }

  test("degreeAssortativity: star is perfectly disassortative; regular graph null") {
    import spark.implicits._
    // Star K1,4: every edge joins degree 4 to degree 1 → r = −1 exactly.
    val star = (1L to 4L).map(i => (0L, i)).toDF("a", "b")
    val s = Graph.degreeAssortativity(star, "a", "b").head()
    assert(s.getLong(0) == 4L && s.getDouble(1) == -1.0)
    // 4-cycle: degree-regular → zero variance → NULL, not NaN.
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val r = Graph.degreeAssortativity(ring, "a", "b").head()
    assert(r.getLong(0) == 4L && r.isNullAt(1))
    // Partition invariance (integer sums close in one double expression).
    val mixed = star.union(Seq((1L, 2L)).toDF("a", "b"))
    val r1 = Graph.degreeAssortativity(mixed, "a", "b").head().getDouble(1)
    val r2 = Graph.degreeAssortativity(mixed.repartition(5), "a", "b")
      .head().getDouble(1)
    assert(r1 == r2 && r1 < 0.0) // still hub-dominated
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

  test("temporalSplit: per-key 80/20 cut by time, floor semantics") {
    import spark.implicits._
    val ev = (1 to 10).map(i => (1L, i.toLong, i.toLong * 100)) ++
      Seq((2L, 100L, 5L), (2L, 101L, 3L), (2L, 102L, 9L), (2L, 103L, 1L)) ++
      Seq((3L, 200L, 1L)) // 1 row: floor(0.8) = 0 -> all val
    val df = ev.toDF("k", "id", "t")
    val out = Sampling.temporalSplit(df, "k", "t", "id", trainPct = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val k1 = out.filter(_._1 == 1L)
    assert(k1.count(_._3 == "train") == 8 && k1.count(_._3 == "val") == 2)
    // key 1 ordered by t: ids 1..8 train, 9..10 val
    assert(k1.filter(_._3 == "val").map(_._2).sorted.toSeq == Seq(9L, 10L))
    // key 2: 4 rows -> floor(3.2)=3 train, ordered by t: ids 103,101,100
    val k2 = out.filter(_._1 == 2L)
    assert(k2.filter(_._3 == "train").map(_._2).toSet == Set(103L, 101L, 100L))
    assert(k2.filter(_._3 == "val").map(_._2).toSeq == Seq(102L))
    // a single-row key has floor(0.8)=0 train rows
    assert(out.filter(_._1 == 3L).head._3 == "val")
  }

  test("coocCounts: bounded lookahead pairs, ordered, multiset counts") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    val out = Vocab.coocCounts(docs, "text", window = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc1 pairs (w=2): (a,b),(a,a),(b,a),(b,c),(a,c); doc2: (a,b)
    assert(out(("a", "b")) == 2L)
    assert(out(("a", "a")) == 1L)
    assert(out(("b", "a")) == 1L)
    assert(out(("b", "c")) == 1L)
    assert(out(("a", "c")) == 1L)
    assert(out.values.sum == 6L)
    // ordered pairs: (c, anything) never appears (c is terminal)
    assert(!out.keys.exists(_._1 == "c"))
  }

  test("coverage: top-k cut is deterministic; oov is the uncovered share") {
    import spark.implicits._
    // counts: x=4, b=2, a=2 -> k=2 vocab is (x, a) [tie a<b]
    val docs = Seq((1L, "x x a b"), (2L, "x x a b")).toDF("doc_id", "text")
    val r = Vocab.coverage(docs, "text", k = 2).head()
    assert(r.getLong(0) == 2L) // vocab_size
    assert(r.getLong(1) == 6L) // covered: 4 + 2
    assert(r.getLong(2) == 8L) // total
    assert(r.getDouble(3) == 0.25)
  }

  test("tableStats: typed extremes, exact ndv, null accounting") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(2.5), Some("b")),
      (2L, None, Some("a")),
      (3L, Some(7.5), None),
      (3L, Some(2.5), Some("a"))).toDF("id", "v", "s")
    val out = Profile.tableStats(df, Seq("id", "v", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("id").getLong(1) == 4L && out("id").getLong(2) == 0L &&
      out("id").getLong(3) == 3L)
    assert(out("id").getDouble(4) == 1.0 && out("id").getDouble(5) == 3.0)
    assert(out("v").getLong(1) == 3L && out("v").getLong(2) == 1L &&
      out("v").getLong(3) == 2L)
    assert(out("s").getString(6) == "a" && out("s").getString(7) == "b")
    assert(out("s").isNullAt(4) && out("s").isNullAt(5)) // no numeric extremes
  }

  test("rateSpikes: prior-window baseline, no self-inflation, cold start unflagged") {
    import spark.implicits._
    // one key, hours 0..4 with counts 2,2,2,20,2 — only hour 3 spikes
    val cells = Seq(0L -> 2L, 3600L -> 2L, 7200L -> 2L, 10800L -> 20L,
      14400L -> 2L).map { case (h, n) => (1L, h, n) }
      .toDF("k", "hour_sec", "n")
    val out = Resample.rateSpikes(cells, "k", "hour_sec", "n",
      windowHours = 24, factor = 3.0)
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))).toMap
    assert(out(0L) == ((None, false)))          // empty prior window
    assert(out(10800L) == ((Some(2.0), true)))  // 20 > 3·2
    // the spike hour joins the NEXT hour's baseline but doesn't flag it:
    // baseline(4h) = (2+2+2+20)/4 = 6.5; 2 < 19.5
    assert(out(14400L) == ((Some(6.5), false)))
  }

  test("quantileBins: integer-exact balanced bins, deterministic ties") {
    import spark.implicits._
    val df = (1L to 12L).map(i => (i, (i % 4).toDouble)).toDF("id", "v")
    val out = Ranking.quantileBins(df,
      Seq(col("v").asc, col("id").asc), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // n=12, k=10: bin = ((rank-1)*10) div 12 -> sizes 2,1,1,2,1,1,2,1,1,2
    val sizes = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.values.sum == 12 && sizes.values.forall(s => s == 1 || s == 2))
    assert(out.values.max == 9L && out.values.min == 0L)
    // ties on v order by id: ids 4,8,12 (v=0) occupy the lowest ranks
    val lowBin = out.filter(_._2 == 0L).keys.toSet
    assert(lowBin.subsetOf(Set(4L, 8L, 12L)))
  }

  test("labelPropagation: sync min-tie rounds are hand-checkable; " +
      "bipartite pairs 2-cycle (why rounds are fixed)") {
    import spark.implicits._
    // Triangle {1,2,3} with pendant 4–3, plus the disjoint pair {10,11}.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a", "b")
    def run(rounds: Int) =
      Graph.labelPropagation(e, "a", "b", rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // r1: 1←min-tie(2,3)=2, 2←1, 3←1, 4←3; the pair swaps labels
    assert(run(1) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L,
      10L -> 11L, 11L -> 10L))
    // r3: the clique+pendant settles on 1; the bipartite pair keeps
    // 2-cycling — deterministic, just not fixed — hence bounded rounds.
    assert(run(3) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 11L, 11L -> 10L))
  }

  test("small-graph local regime is bit-identical to the distributed loop " +
      "(pagerank, PPR, k-core, BFS)") {
    import spark.implicits._
    // A graph rich enough to exercise every branch: a 5-ring with chords,
    // a pendant chain, weighted multi-out-degree nodes, a disjoint pair.
    val we = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 4L, 2L), (4L, 5L, 1L),
      (5L, 1L, 2L), (1L, 3L, 1L), (2L, 5L, 4L), (6L, 1L, 1L),
      (7L, 6L, 2L), (8L, 9L, 1L)).toDF("src", "dst", "w")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // threshold -1 forces the distributed loop; default takes local
    assert(m(Graph.pagerankScaled(we, "src", "dst", "w", iters = 4)) ==
      m(Graph.pagerankScaled(we, "src", "dst", "w", iters = 4,
        localEdgeThreshold = -1L)))
    val seeds = Seq(1L, 8L, 99L).toDF("node") // 99: seed outside the graph
    assert(m(Graph.personalizedPagerankScaled(we, "src", "dst", "w",
        seeds, iters = 4)) ==
      m(Graph.personalizedPagerankScaled(we, "src", "dst", "w",
        seeds, iters = 4, localEdgeThreshold = -1L)))
    val ue = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 4L), (6L, 7L), (8L, 9L)).toDF("a", "b")
    assert(m(Graph.kCore(ue, "a", "b", k = 2)) ==
      m(Graph.kCore(ue, "a", "b", k = 2, localEdgeThreshold = -1L)))
    def d(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val src = Seq(1L, 8L).toDF("node")
    assert(d(Graph.hopDistances(ue, "a", "b", src, maxHops = 3)) ==
      d(Graph.hopDistances(ue, "a", "b", src, maxHops = 3,
        localEdgeThreshold = -1L)))
    assert(m(Graph.labelPropagation(ue, "a", "b", rounds = 3)) ==
      m(Graph.labelPropagation(ue, "a", "b", rounds = 3,
        localEdgeThreshold = -1L)))
    def ha(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ha(Graph.hitsScaled(we, "src", "dst", "w", iters = 4)) ==
      ha(Graph.hitsScaled(we, "src", "dst", "w", iters = 4,
        localEdgeThreshold = -1L)))
    val de = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 4L), (6L, 1L), (7L, 7L)).toDF("s", "d")
    assert(m(Graph.stronglyConnectedComponents(de, "s", "d")) ==
      m(Graph.stronglyConnectedComponents(de, "s", "d",
        localEdgeThreshold = -1L)))
    assert(m(Graph.coreness(ue, "a", "b")) ==
      m(Graph.coreness(ue, "a", "b", localEdgeThreshold = -1L)))
  }

  test("coreness: K4 + pendant + triangle-with-tail — textbook values") {
    import spark.implicits._
    // K4 on 1-4 (coreness 3), pendant 5 off node 4 (coreness 1),
    // triangle 6-7-8 (coreness 2) with tail 9 (coreness 1)
    val ue = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L), (7L, 8L), (6L, 8L), (8L, 9L)).toDF("a", "b")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L,
      6L -> 2L, 7L -> 2L, 8L -> 2L, 9L -> 1L)
    assert(m(Graph.coreness(ue, "a", "b")) == want)
    assert(m(Graph.coreness(ue.repartition(5), "a", "b",
      localEdgeThreshold = -1L)) == want)
  }

  test("stronglyConnectedComponents: cycles collapse to min ids, DAG nodes " +
      "and self-loops are singletons") {
    import spark.implicits._
    // ring {1,2,3} → bridge 3→4 → 2-cycle {4,5}; 6 feeds the ring;
    // 7 has only a self-loop (ignored → isolated → absent from output)
    val de = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 4L), (6L, 1L), (7L, 7L)).toDF("s", "d")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L)
    assert(m(Graph.stronglyConnectedComponents(de, "s", "d")) == want)
    // distributed loop on the same graph, and invariance under partitioning
    assert(m(Graph.stronglyConnectedComponents(de.repartition(7), "s", "d",
      localEdgeThreshold = -1L)) == want)
  }

  test("stronglyConnectedComponents: monotone singleton chains converge " +
      "within the round budget (class-cut refinement)") {
    import spark.implicits._
    // A directed path of 60 singleton SCCs with ids increasing along the
    // path: plain FW-BW min-label peeling settles exactly ONE node per
    // round here (fmin is the head for everyone, bmin is each node
    // itself), so pre-class-cut this needed 60 rounds and blew the
    // default 24-round guard — the 100× canary failure mode of the SCC
    // gate's broken rings. With cross-class edge cutting the classes
    // (head, v) are pairwise distinct, every edge is cut in round one,
    // and round two settles all nodes. maxRounds = 5 pins the bound.
    val path = (1L until 60L).map(i => (i, i + 1L)).toDF("s", "d")
    val out = Graph.stronglyConnectedComponents(path, "s", "d",
      maxRounds = 5, localEdgeThreshold = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == (1L to 60L).map(i => i -> i).toMap)
    // A wrapped chain (ring broken mid-block, ids NOT monotone along the
    // path — the gate fixture's exact shape) plus a 3-ring fed by the
    // chain: classes split the chain at the wrap, rings survive the cut.
    val wrapped = ((18L until 49L).map(i => (i, i + 1L)) ++
      Seq((49L, 0L)) ++ (0L until 17L).map(i => (i, i + 1L)) ++
      Seq((17L, 100L), (100L, 101L), (101L, 102L), (102L, 100L))).toDF("s", "d")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(Graph.stronglyConnectedComponents(wrapped, "s", "d",
      maxRounds = 8, localEdgeThreshold = -1L)) ==
      m(Graph.stronglyConnectedComponents(wrapped, "s", "d")))
  }

  test("stronglyConnectedComponents: randomized two-regime equality — " +
      "witness-doubling peeling matches Tarjan on 20 seeded digraphs") {
    import spark.implicits._
    // Structure-free insurance for the witness-doubling + class-cut
    // fixpoint: sparse random digraphs mix cycles, chains, diamonds and
    // isolated edges in ways the designed fixtures don't enumerate. The
    // rng is SEEDED (no Math.random in tests either) so a failure is
    // reproducible; 40 nodes / ~60 edges keeps each distributed run to
    // a few fixpoint iterations while still covering multi-SCC DAGs.
    val rng = new scala.util.Random(0x5EED13L)
    (1 to 20).foreach { trial =>
      val n = 40
      val edges = Seq.fill(60)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val de = edges.toDF("s", "d")
      def m(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val local = m(Graph.stronglyConnectedComponents(de, "s", "d"))
      val dist = m(Graph.stronglyConnectedComponents(
        de.repartition(5), "s", "d", localEdgeThreshold = -1L))
      assert(dist == local, s"trial $trial diverged on edges: $edges")
    }
  }

  test("hitsScaled: star graph separates hubs from authorities") {
    // 3 leaves point at the hub: leaves are pure hubs (auth 0), the
    // centre is the pure authority (hub 0); ℓ₁ mass = Scale per side.
    val e = edges(("l1", "h", 1L), ("l2", "h", 1L), ("l3", "h", 1L))
    val out = Graph.hitsScaled(e, "src", "dst", "w", iters = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("h")._1 == 0L) // no out-edges: zero hub score
    assert(out("h")._2 == Graph.Scale) // the only authority
    assert(out("l1")._2 == 0L && out("l2")._2 == 0L)
    // symmetric leaves tie exactly; hub mass sums to Scale up to div floor
    assert(out("l1")._1 == out("l2")._1 && out("l2")._1 == out("l3")._1)
    assert(Seq("l1", "l2", "l3").map(out(_)._1).sum <= Graph.Scale)
    assert(Seq("l1", "l2", "l3").map(out(_)._1).sum > Graph.Scale - 10L)
    // empty edge list: empty output, no division by zero
    assert(Graph.hitsScaled(edges(), "src", "dst", "w", iters = 2).count() == 0L)
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
