package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the entity-resolution / DSIR / representative-prune trio. */
class LinkageSpec extends SparkSpec {

  import spark.implicits._

  test("resolveEntities links planted variants, leaves distinct names alone") {
    val df = Seq(
      (1L, "acme widgets inc"),
      (2L, "acme widgets in"),   // 1-char drop of #1 → links
      (3L, "zenith gears ltd"),
      (4L, "brightline optics"), // singleton
      (5L, "zenith gears ltdx")  // 1-char append of #3 → links
    ).toDF("id", "name")
    val got = Linkage.resolveEntities(df, "id", "name",
      substring(col("name"), 1, 4), tau = 0.95)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 3L))
  }

  test("resolveEntities: transitive chains collapse to one entity; blocking prevents cross-block links") {
    val df = Seq(
      (10L, "northgate supply"),
      (11L, "northgate supplyx"), // links to 10
      (12L, "northgate supplyxy"), // links to 11 (and 10 transitively)
      // identical name but a DIFFERENT block key → never scored
      (13L, "xnorthgate supply")
    ).toDF("id", "name")
    val got = Linkage.resolveEntities(df, "id", "name",
      substring(col("name"), 1, 4), tau = 0.9)
      .as[(Long, Long)].collect().toMap
    assert(got(10L) == 10L && got(11L) == 10L && got(12L) == 10L)
    assert(got(13L) == 13L)
  }

  test("resolveEntities: tau = 1.0 links only exact duplicate names") {
    val df = Seq((1L, "same name co"), (2L, "same name co"), (3L, "same name cq"))
      .toDF("id", "name")
    val got = Linkage.resolveEntities(df, "id", "name",
      substring(col("name"), 1, 4), tau = 1.0)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("resolveEntities length prefilter is lossless: entities identical " +
      "to brute all-pairs jw across mixed-length names at tau near the bound") {
    // Names engineered around the jw <= 0.8 + 0.2*(la/lb) bound at
    // tau = 0.9 (ratio floor 0.5): same-length near-dups (kept), a
    // 40%-length substring (PRUNED by the bound — and brute jw agrees
    // it's below tau), and a just-over-half-length pair the bound must
    // NOT prune even though it ultimately fails the score.
    val df = Seq(
      (1L, "consolidated freight co"),
      (2L, "consolidated freight cx"),   // near-dup, links to 1
      (3L, "consolidat"),                // 10/23 < 0.5 vs #1: bound prunes
                                         // the direct pair, but 3–4 and
                                         // 4–1 both score ≥ τ, so 3 joins
                                         // entity 1 TRANSITIVELY — brute
                                         // must agree on the same chain
      (4L, "consolidated"),              // 12/23 > 0.5: bound keeps, scorer links
      (5L, "comet"),                     // short unrelated, same block
      (6L, "comet"),                     // exact dup of 5 via star edge
      (7L, "zx"),                        // 2/10 = 0.2: bound prunes 7–8,
      (8L, "zxabcdefgh")                 // and brute jw (≈0.79) agrees
    ).toDF("id", "name")
    val got = Linkage.resolveEntities(df, "id", "name",
      substring(col("name"), 1, 2), tau = 0.9)
      .as[(Long, Long)].collect().toMap
    // Brute-force oracle: jw over every in-block pair with no prefilter.
    val jw = udf((a: String, b: String) =>
      math.round(graft.functions.JaroWinklerImpl.jaroWinkler(a, b) * 1e6) / 1e6)
    val brute = df.as("x").join(df.as("y"),
        substring(col("x.name"), 1, 2) === substring(col("y.name"), 1, 2) &&
          col("x.id") < col("y.id"))
      .filter(jw(col("x.name"), col("y.name")) >= 0.9)
      .select(col("x.id"), col("y.id")).as[(Long, Long)].collect()
    // union-find the brute edges locally
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    brute.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = (1L to 8L).map(i => i -> find(i)).toMap
    assert(got == want)
    // 3's direct pairs with 1/2 are bound-pruned, yet it lands in
    // entity 1 through the 3–4–1 chain — same as brute; 7–8 is pruned
    // AND genuinely below τ, so both stay singletons.
    assert(got(2L) == 1L && got(3L) == 1L && got(4L) == 1L && got(6L) == 5L)
    assert(got(7L) == 7L && got(8L) == 8L)
  }

  test("resolveEntities exact-name collapse: duplicate-heavy input yields " +
      "the same components as the all-pairs definition") {
    // 40 records over 4 base names × 10 exact copies each, plus a fuzzy
    // bridge between two of the bases — the duplicate-heavy shape the
    // 100× canary used to expose the pre-collapse quadratic. Brute-force
    // the all-pairs definition driver-side and demand identical labels.
    val bases = Seq("acme widgets inc", "acme widgets in", // fuzzy-linked
      "zenith gears ltd", "brightline optics")
    val rows = for {
      (b, bi) <- bases.zipWithIndex
      copy <- 0 until 10
    } yield ((bi * 100 + copy).toLong, b)
    val df = rows.toDF("id", "name")
    val got = Linkage.resolveEntities(df, "id", "name",
      substring(col("name"), 1, 4), tau = 0.95)
      .as[(Long, Long)].collect().toMap
    // brute-force oracle: all within-block pairs, jw >= tau, components
    def jw(a: String, b: String): Double = {
      val r = Seq((a, b)).toDF("a", "b")
        .select(round(graft.functions.JaroWinklerSim
          .jaroWinkler(col("a"), col("b")), 6))
        .head.getDouble(0)
      r
    }
    val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for {
      (ia, na) <- rows; (ib, nb) <- rows
      if ia < ib && na.take(4) == nb.take(4) && jw(na, nb) >= 0.95
    } union(ia, ib)
    val want = rows.map { case (id, _) => id -> find(id) }.toMap
    assert(got == want)
    // and the duplicate copies all collapsed into their base's entity
    assert(got(1L) == 0L && got(109L) == 0L) // acme copies + fuzzy bridge
  }

  test("fastssPairs on a duplicate-heavy corpus = brute force: every " +
      "within-name pair at 0, every cross-member pair inherits distance 1") {
    // 5 copies of "acme", 4 of "acm" (deletion of acme), 3 of "zeta" —
    // the replica-heavy shape the exact-string collapse targets. The
    // contract output is Θ(members²): C(5,2)+C(4,2)+C(3,2) = 19 zero-
    // distance pairs + 5·4 = 20 cross pairs at distance 1, zeta isolated.
    val rows = (0L until 5L).map(i => (i, "acme")) ++
      (10L until 14L).map(i => (i, "acm")) ++
      (20L until 23L).map(i => (i, "zeta"))
    val df = rows.toDF("id", "s")
    val got = Linkage.fastssPairs(df, "id", "s")
      .as[(Long, Long, Long)].collect()
    assert(got.length == got.toSet.size, "duplicate output rows")
    val brute = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = levDist(sa, sb) if d <= 1
    } yield (ia, ib, d.toLong)).toSet
    assert(got.toSet == brute)
    assert(got.count(_._3 == 0L) == 19 && got.count(_._3 == 1L) == 20)
  }

  test("fastssPairs = brute-force levenshtein<=1 on every edit kind") {
    // One representative of each edit class against "carte": substitution
    // (carta), deletion (cart), insertion (cartke), transposition (catre,
    // distance 2 — shares deletion variants yet must be REJECTED by the
    // confirm), distance-2 substitution (corta), exact duplicate (carte).
    val df = Seq((1L, "carte"), (2L, "carta"), (3L, "cart"), (4L, "cartke"),
      (5L, "catre"), (6L, "corta"), (7L, "carte"))
      .toDF("id", "s")
    val got = Linkage.fastssPairs(df, "id", "s")
      .as[(Long, Long, Long)].collect().toSet
    val names = df.as[(Long, String)].collect()
    val brute = (for {
      (ia, sa) <- names; (ib, sb) <- names if ia < ib
      d = levDist(sa, sb) if d <= 1
    } yield (ia, ib, d.toLong)).toSet
    assert(got == brute, s"got $got\nbrute $brute")
    assert(got.contains((1L, 7L, 0L)) && got.contains((1L, 2L, 1L)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L),
      "transposition (distance 2) must not pair with anything here")
  }

  test("fastssPairs handles 1-char and empty-adjacent strings") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "ab"), (4L, "a")).toDF("id", "s")
    val got = Linkage.fastssPairs(df, "id", "s")
      .as[(Long, Long, Long)].collect().toSet
    // a~b substitution, a~ab insertion, b~ab substitution-ish? lev(b,ab)=1
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L),
      (1L, 4L, 0L), (2L, 4L, 1L), (3L, 4L, 1L)))
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("pruneToRepresentatives keeps min id per cluster and all singletons") {
    val records = (1L to 10L).toDF("id")
    val pairs = Seq((3L, 5L), (5L, 9L), (2L, 7L)).toDF("id_a", "id_b")
    val kept = Dedup.pruneToRepresentatives(records, "id", pairs)
      .as[Long].collect().toSet
    // clusters {3,5,9}→3 and {2,7}→2; 5,9,7 dropped
    assert(kept == Set(1L, 2L, 3L, 4L, 6L, 8L, 10L))
  }

  test("pruneToRepresentatives with no pairs is the identity") {
    val records = (1L to 5L).toDF("id")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val kept = Dedup.pruneToRepresentatives(records, "id", pairs)
      .as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("dsirScores ranks target-like documents above off-target ones") {
    // target docs use one vocabulary, raw-only docs another; a mixed doc
    // sits between.
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha", true),
      (2L, "alpha beta beta alpha beta", true),
      (3L, "gamma delta gamma delta gamma", false),
      (4L, "delta gamma delta delta gamma", false),
      (5L, "alpha beta gamma delta alpha", false)
    ).toDF("id", "text", "is_en")
    val got = LangModel.dsirScores(docs, "id", "text", col("is_en"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) > 0.0 && got(2L) > 0.0, s"target docs must score > 0: $got")
    assert(got(3L) < 0.0 && got(4L) < 0.0, s"off-target docs must score < 0: $got")
    assert(got(5L) > got(3L) && got(5L) < got(1L),
      s"mixed doc must sit between: $got")
  }

  test("dsirScores: token-less and null-text docs score 0 with n_tokens 0") {
    val docs = Seq((1L, "alpha beta", true), (2L, "", false),
      (3L, null.asInstanceOf[String], false)).toDF("id", "text", "t")
    val got = LangModel.dsirScores(docs, "id", "text", col("t"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(2L) == ((0L, 0.0)) && got(3L) == ((0L, 0.0)))
    assert(got(1L)._1 == 2L)
  }

  test("dsirScores is partition-invariant (exact decimal sums)") {
    val docs = (1L to 200L).map(i =>
      (i, s"tok${i % 13} tok${i % 7} tok${i % 3} tok${i % 29}", i % 4 == 0))
      .toDF("id", "text", "t")
    val a = LangModel.dsirScores(docs, "id", "text", col("t"))
      .as[(Long, Long, Double)].collect().toSet
    val b = LangModel.dsirScores(docs.repartition(17), "id", "text", col("t"))
      .as[(Long, Long, Double)].collect().toSet
    assert(a == b)
  }
}
