package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.table

/** Item-item collaborative filtering over the order/lineitem baskets — the
  * recommendation surface a catalog pipeline derives from co-purchase
  * signals. Everything is count-based cosine over EXACT integer
  * co-occurrence counts (no floating accumulation across the shuffle):
  * scores are single double divisions of those longs, per-candidate sums
  * fold 6dp-rounded decimals, and every ranking window is keyed by the
  * item/user — never global. The pair generation is the co-partitioned
  * basket self-join (basket_pair_counts' plan), so at 100 TB it shuffles
  * each order's bounded item list once and never goes cartesian.
  */
object RecsysQueries {

  def family: QueryFamily = QueryFamily("recsys", queries, oracles)

  private val NeighborsK = 5
  private val RecsK = 3

  /** Basket-size ceiling for the co-occurrence pair build: the
    * double-explode emits m(m−1) directed pairs per basket — quadratic —
    * so one pathological 10⁵-item basket (bot/bulk account) would emit
    * 10¹⁰ rows no partitioning can absorb (SCALE.md part 6 named this
    * the one surface the zipf canary cannot cover). Baskets above the
    * cap are EXCLUDED from the model (standard whale-pruning in CF —
    * a degenerate basket carries no preference signal anyway) and
    * surface in the oracle-checked basket_cap_audit gate; every real
    * fixture sits orders of magnitude below (TPC-H ≤ 7 items). Shared
    * with [[graft.ops.SkewJoin.MaxGroupCap]]. */
  val BasketCap: Long = graft.ops.SkewJoin.MaxGroupCap

  /** Distinct (order, part) basket rows — a column rename over the
    * CROSS-FAMILY [[SharedTables.distinctBaskets]] memo (the rename is a
    * free projection on the cached relation, so recsys adds no second
    * persisted copy). Every recsys gate (and the holdout gate three
    * times over) starts from it. */
  private def baskets(s: SparkSession, dir: String): DataFrame =
    SharedTables.distinctBaskets(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))

  /** Directed co-occurrence neighbor lists with cosine scores, top-K per
    * source item (bounded TopKAgg; ties broken by neighbor id).
    * Memoized: the scoring + ranking is the expensive part and several
    * gates consume it. */
  private def itemNeighbors(s: SparkSession, dir: String): DataFrame = {
    // Resolve the dependency memos BEFORE entering the neighbors memo:
    // Memo is get-then-putIfAbsent (re-entrancy safe), but hoisting
    // keeps each build's memo footprint flat regardless. The corpus
    // co-occurrence matrix is the directed mirror of the cross-family
    // undirected pair counts — no second pair shuffle.
    val b = baskets(s, dir)
    val cooc = SharedTables.pairCountsDirected(s, dir)
      .select(col("part_a").as("part"), col("part_b").as("part_j"),
        col("n_orders").as("cooc"))
    graft.core.Memo.cached("recsys.neighbors", s, dir)(neighborsOf(b, cooc))
  }

  /** The neighbor derivation over ANY (okey, part) basket table — used
    * by the holdout evaluation's TRAIN split (the corpus path feeds the
    * shared pair-count memo instead, see [[itemNeighbors]]).
    *
    * DEGREES RIDE THE PAIR ROWS (round-14 plan-shape fix). The r13 plan
    * aggregated bare (part, part_j) pairs and then joined the item-degree
    * table back TWICE — two more exchanges (plus sort-merge sorts) over
    * the pair table, the widest relation in the whole gate (≈2× the
    * basket row count at any scale; 100× profile: the two deg joins were
    * re-shuffling ~1.9× the pair volume after the count). Instead:
    * attach deg to each basket row once (item-keyed hash join against the
    * ~|parts| degree table), collect each order's (part, deg) items, and
    * double-explode the per-order lists so every generated pair CARRIES
    * deg_i/deg_j into the count aggregate — `max` folds the
    * group-constant degree through, and the post-aggregation joins
    * disappear. Exchange budget: deg (baskets on part) + deg-attach probe
    * + lists (baskets on okey) + pairs — vs the old pairs + deg + 2×
    * (aggregated pairs). The per-order list is bounded by basket size
    * (same argument as the self-join it replaces), so explode fan-out is
    * a constant, not a skew surface. */
  private[graft] def neighborsFrom(b: DataFrame): DataFrame = {
    val deg = b.groupBy(col("part")).agg(count(lit(1)).as("deg"))
    // shuffle_hash: build the bounded degree table, stream the basket
    // rows sort-free (sort-merge would sort the full basket stream).
    val bd = b.join(deg.hint("shuffle_hash"), "part")
    // [[BasketCap]]: whale baskets never reach the quadratic explode
    // (a size() filter on the collected list — one narrow predicate,
    // no extra exchange; a no-op on every real fixture)
    val lists = bd.groupBy(col("okey"))
      .agg(collect_list(struct(col("part"), col("deg"))).as("items"))
      .filter(size(col("items")) <= BasketCap)
    val pairs = lists
      .select(explode(col("items")).as("a"), col("items"))
      .select(col("a.part").as("part"), col("a.deg").as("deg_i"),
        explode(col("items")).as("bb"))
      .filter(col("part") =!= col("bb.part"))
      .select(col("part"), col("deg_i"),
        col("bb.part").as("part_j"), col("bb.deg").as("deg_j"))
    val coocDeg = pairs.groupBy(col("part"), col("part_j"))
      .agg(count(lit(1)).as("cooc"),
        max(col("deg_i")).as("deg_i"), max(col("deg_j")).as("deg_j"))
    rankNeighbors(coocDeg)
  }

  /** Score + rank a (part, part_j, cooc) co-occurrence matrix against
    * the basket table's item degrees: cosine = cooc/√(deg_i·deg_j),
    * bounded top-K per part. The corpus path keeps the post-aggregation
    * degree joins: its co-occurrence matrix is the CACHED cross-family
    * pair-count memo (built once per session, consumed by four families),
    * so re-deriving it with degrees attached would fork the shared cache
    * for one consumer. */
  private def neighborsOf(b: DataFrame, cooc: DataFrame): DataFrame = {
    val deg = b.groupBy(col("part")).agg(count(lit(1)).as("deg"))
    // shuffle_hash on the bounded degree side: past the broadcast
    // threshold (|parts| rows) these joins plan sort-merge, paying two
    // full sorts of the pair table — the widest relation here — per
    // memo build. Hash-building deg streams the pair side sort-free
    // (r14 A/B at 100×: memo build 99.9 → 95.1 s — the joins' stages
    // drop ~25% core-time; the build total is dominated by the pair
    // aggregation. Kept because sorts are what spill first at 100 TB).
    val coocDeg = cooc
      .join(deg.select(col("part"), col("deg").as("deg_i"))
        .hint("shuffle_hash"), "part")
      .join(deg.select(col("part").as("part_j"), col("deg").as("deg_j"))
        .hint("shuffle_hash"), "part_j")
    rankNeighbors(coocDeg)
  }

  /** Shared ranking tail over (part, part_j, cooc, deg_i, deg_j):
    * cosine score, bounded top-K per part. */
  private def rankNeighbors(coocDeg: DataFrame): DataFrame = {
    def d(c: Column) = c.cast("double")
    val scored = coocDeg.withColumn("score",
      round(d(col("cooc")) / sqrt(d(col("deg_i")) * d(col("deg_j"))), 6))
    // Bounded payload-carrying top-k instead of a per-part ranking
    // window (the same rewrite that fixed recsys_user_recs in round 11):
    // the window sorts every part's FULL candidate list through one
    // partition-wide sort, while the aggregate caps per-group state at
    // K entries map-side and carries cooc in the buffer so the scored
    // subtree is consumed exactly once. Order parity: the buffer's
    // (score desc, id asc) matches (score DESC, part_j ASC) — scores are
    // 6dp-rounded doubles, ties broken by the id in both.
    scored.groupBy(col("part"))
      .agg(graft.ops.TopKAgg.topKWith(col("score"), col("part_j"),
        Seq(col("cooc")), NeighborsK).as("tk"))
      .select(col("part"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("part"), col("e.id").as("part_j"),
        col("e.p0").as("cooc"), col("e.score").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Holdout-split model: (train neighbors, train history, test orders,
    * baskets). NOT persisted beyond the shared [[baskets]] memo: the
    * repeated nb/hist subtrees inside the one holdout action are already
    * deduplicated by Spark's ReuseExchange, and extra persists only add
    * InMemoryRelation materialization barriers on the cold path the bench
    * times (measured round 10: cold 8.7 s bare vs 9.8 s with nb/hist
    * persists; BASELINE.md §"Round 10"). */
  private def holdoutModel(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val days = table(s, dir, "orders").select(
      col("o_orderkey").as("okey"), col("o_custkey").as("cust"),
      datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
    val bounds = days.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .select((col("dmin") +
        expr("(dmax - dmin) * 4 div 5")).as("bnd"))
    val keyed = days.crossJoin(broadcast(bounds))
    val trainOrders = keyed.filter(col("day") < col("bnd"))
      .select(col("okey"), col("cust"))
    val testOrders = keyed.filter(col("day") >= col("bnd"))
      .select(col("okey"), col("cust"))
    val b = baskets(s, dir)
    // ONE train join feeds both consumers: neighborsFrom and hist used
    // to build `baskets ⋈ trainOrders` separately (one projecting okey
    // pre-join, one keeping cust), so the exchange trees differed and
    // ReuseExchange couldn't dedup them — the orders scan + split +
    // basket shuffle ran twice per action. Identical subtree → reused.
    val trainB = b.join(trainOrders, "okey")
    val nb = neighborsFrom(trainB.select(col("okey"), col("part")))
    val hist = trainB.select(col("cust"), col("part")).distinct()
    (nb, hist, testOrders, b)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Top-5 co-purchase neighbors per part: cosine = cooc/√(deg_i·deg_j)
    // over distinct basket memberships.
    "recsys_item_item" -> ((s, dir) =>
      itemNeighbors(s, dir).select(col("part").as("part_i"), col("part_j"),
        col("cooc"), col("score"), col("rank").cast("long").as("rank"))),

    // User recommendations: each customer's purchase history votes for its
    // items' neighbors; candidate score = Σ neighbor scores (exact decimal
    // fold of the 6dp terms); already-purchased items are anti-joined out;
    // top-3 per customer. History→neighbor join is keyed on the item;
    // ranking is customer-keyed — both shuffle-bounded at any scale.
    "recsys_user_recs" -> ((s, dir) => {
      val hist = table(s, dir, "orders")
        .select(col("o_orderkey").as("okey"), col("o_custkey").as("cust"))
        .join(baskets(s, dir), "okey")
        .select(col("cust"), col("part")).distinct()
      // SHUFFLE_HASH on the candidate join: the 5×-per-history-item
      // fan-out makes sort-merge pay a spilling sort of the full
      // history stream — profiled at 100× as one 34-task uniform stage
      // at p50 92 s; hash-building the bounded neighbor side (≤ 5
      // rows/part) streams the probe sort-free with identical output.
      val cand = hist.join(itemNeighbors(s, dir).hint("shuffle_hash"), "part")
        .select(col("cust"), col("part_j"),
          col("score").cast("decimal(18,6)").as("sc"),
          lit(1L).as("nv"), lit(0).as("own"))
      // Already-purchased exclusion FOLDED INTO the candidate aggregate
      // instead of a post-agg anti join: history rows ride the same
      // (cust, part_j) shuffle as zero-contribution marker rows
      // (sc null, nv 0, own 1) and groups containing a marker are
      // dropped after the fold. Exactly the anti-join's semantics —
      // a group survives iff (cust, part_j) ∉ history — but history is
      // consumed ONCE, through the one exchange the aggregation already
      // pays, instead of re-derived and re-shuffled for a second sorted
      // join (profiled at 100×: the anti-side stages were ~1.2k core-s).
      // Decimal exactness: sum ignores the null markers, so s is the
      // same 6dp-exact fold; n_voters = sum(nv) counts candidate rows
      // only.
      val marks = hist.select(col("cust"), col("part").as("part_j"),
        lit(null).cast("decimal(18,6)").as("sc"),
        lit(0L).as("nv"), lit(1).as("own"))
      val fresh = cand.unionByName(marks)
        .groupBy(col("cust"), col("part_j"))
        .agg(sum(col("sc")).as("s"), sum(col("nv")).as("n_voters"),
          max(col("own")).as("own"))
        .filter(col("own") === 0)
      // Bounded payload-carrying top-k instead of a per-customer ranking
      // window: partial aggregation caps per-group state at k entries
      // map-side (a window sorts each customer's FULL candidate list),
      // and n_voters rides in the buffer so the candidate subtree is
      // consumed exactly once — the round-10 join-back rewrite failed on
      // precisely that double-consumption (TopKAgg.topKWith scaladoc).
      // Order parity with the window: distinct decimal(18,6) values of
      // this magnitude (≪ 4.5e9) stay distinct and ordered under the
      // double cast, and the buffer's (score desc, id asc) matches
      // (s DESC, part_j ASC).
      fresh.groupBy(col("cust"))
        .agg(graft.ops.TopKAgg.topKWith(col("s").cast("double"),
          col("part_j"), Seq(col("n_voters")), RecsK).as("tk"))
        .select(col("cust"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("cust").as("c_custkey"), col("e.id").as("rec_part"),
          round(col("e.score"), 6).as("rec_score"),
          col("e.p0").as("n_voters"),
          (col("pos") + 1).cast("long").as("rank"))
    }),

    // Temporal-holdout evaluation of the recommender — the number that
    // decides whether the co-occurrence model ships: orders split at the
    // 80% point of the date range (integer epoch-day arithmetic, computed
    // in-plan), neighbors + per-user top-3 recommendations fit on the
    // TRAIN side only, hit-rate@rank measured against what each user
    // actually bought in the held-out window. Leakage-safe by
    // construction (the test window never feeds the model); every join
    // keyed on user/item, 3-row report.
    "recsys_holdout_hitrate" -> ((s, dir) => {
      val (nb, hist, testOrders, b) = holdoutModel(s, dir)
      // Same shape as recsys_user_recs, same three scale fixes (see
      // there): hash-build the bounded neighbor side, fold the
      // already-purchased exclusion into the aggregate as marker rows,
      // rank through the bounded top-k instead of a customer window.
      val candU = hist.join(nb.hint("shuffle_hash"), "part")
        .select(col("cust"), col("part_j"),
          col("score").cast("decimal(18,6)").as("sc"), lit(0).as("own"))
      val marks = hist.select(col("cust"), col("part").as("part_j"),
        lit(null).cast("decimal(18,6)").as("sc"), lit(1).as("own"))
      val fresh = candU.unionByName(marks)
        .groupBy(col("cust"), col("part_j"))
        .agg(sum(col("sc")).as("s"), max(col("own")).as("own"))
        .filter(col("own") === 0)
      val recs = fresh.groupBy(col("cust"))
        .agg(graft.ops.TopKAgg.topK(col("s").cast("double"),
          col("part_j"), RecsK).as("tk"))
        .select(col("cust"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("cust"), col("e.id").as("part_j"),
          (col("pos") + 1).as("rank"))
      val testBuys = testOrders.join(b, "okey")
        .select(col("cust"), col("part").as("part_j")).distinct()
        .withColumn("__hit", lit(1L))
      def d(c: Column) = c.cast("double")
      recs.join(testBuys, Seq("cust", "part_j"), "left")
        .groupBy(col("rank").cast("long").as("rank"))
        .agg(count(lit(1)).as("n_recs"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
        .select(col("rank"), col("n_recs"), col("n_hits"),
          round(d(col("n_hits")) / d(col("n_recs")), 6).as("hit_rate"))
    }))

  // ---------------------------------------------------------------- oracle

  private val basketsSql =
    "SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem"

  /** The deg/cooc/score/rank chain over a CTE named `b` — shared by the
    * full-corpus oracles and the holdout oracle's train-split variant. */
  private val neighborChainSql =
    """deg AS (SELECT part, CAST(count(*) AS BIGINT) AS deg FROM b GROUP BY 1),
      |cooc AS (SELECT a.part, c.part AS part_j,
      |    CAST(count(*) AS BIGINT) AS cooc
      |  FROM b a JOIN b c ON a.okey = c.okey AND a.part <> c.part
      |  GROUP BY 1, 2),
      |sc AS (SELECT cooc.part, part_j, cooc,
      |    round(CAST(cooc AS DOUBLE) /
      |      sqrt(CAST(di.deg AS DOUBLE) * CAST(dj.deg AS DOUBLE)), 6) AS score
      |  FROM cooc JOIN deg di ON di.part = cooc.part
      |  JOIN deg dj ON dj.part = part_j),
      |nb AS (SELECT *, CAST(row_number() OVER (PARTITION BY part
      |    ORDER BY score DESC, part_j ASC) AS BIGINT) AS rank FROM sc)""".stripMargin

  private val neighborsSql =
    s"""b AS ($basketsSql),
       |deg AS (SELECT part, CAST(count(*) AS BIGINT) AS deg FROM b GROUP BY 1),
       |cooc AS (SELECT a.part, c.part AS part_j,
       |    CAST(count(*) AS BIGINT) AS cooc
       |  FROM b a JOIN b c ON a.okey = c.okey AND a.part <> c.part
       |  GROUP BY 1, 2),
       |sc AS (SELECT cooc.part, part_j, cooc,
       |    round(CAST(cooc AS DOUBLE) /
       |      sqrt(CAST(di.deg AS DOUBLE) * CAST(dj.deg AS DOUBLE)), 6) AS score
       |  FROM cooc JOIN deg di ON di.part = cooc.part
       |  JOIN deg dj ON dj.part = part_j),
       |nb AS (SELECT *, CAST(row_number() OVER (PARTITION BY part
       |    ORDER BY score DESC, part_j ASC) AS BIGINT) AS rank FROM sc)""".stripMargin

  def oracles: Map[String, String] = Map(

    "recsys_item_item" ->
      s"""WITH $neighborsSql
         |SELECT part AS part_i, part_j, cooc, score, rank
         |FROM nb WHERE rank <= $NeighborsK""".stripMargin,

    "recsys_user_recs" ->
      s"""WITH $neighborsSql,
         |hist AS (SELECT DISTINCT o_custkey AS cust, part
         |  FROM orders JOIN b ON okey = o_orderkey),
         |cand AS (SELECT cust, part_j,
         |    sum(CAST(score AS DECIMAL(18,6))) AS s,
         |    CAST(count(*) AS BIGINT) AS n_voters
         |  FROM hist JOIN nb USING (part) WHERE rank <= $NeighborsK
         |  GROUP BY 1, 2),
         |fresh AS (SELECT c.* FROM cand c
         |  WHERE NOT EXISTS (SELECT 1 FROM hist h
         |    WHERE h.cust = c.cust AND h.part = c.part_j)),
         |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY cust
         |    ORDER BY s DESC, part_j ASC) AS BIGINT) AS rank FROM fresh)
         |SELECT cust AS c_custkey, part_j AS rec_part,
         |  round(CAST(s AS DOUBLE), 6) AS rec_score, n_voters, rank
         |FROM rk WHERE rank <= $RecsK""".stripMargin,

    "recsys_holdout_hitrate" ->
      s"""WITH days AS (SELECT o_orderkey AS okey, o_custkey AS cust,
         |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         |      AS BIGINT) AS day
         |  FROM orders),
         |bnd AS (SELECT min(day) + (max(day) - min(day)) * 4 // 5 AS bnd
         |  FROM days),
         |tro AS (SELECT okey, cust FROM days, bnd WHERE day < bnd),
         |teo AS (SELECT okey, cust FROM days, bnd WHERE day >= bnd),
         |ab AS ($basketsSql),
         |b AS (SELECT ab.okey, part FROM ab JOIN tro USING (okey)),
         |$neighborChainSql,
         |hist AS (SELECT DISTINCT cust, part FROM tro JOIN ab USING (okey)),
         |cand AS (SELECT cust, part_j,
         |    sum(CAST(score AS DECIMAL(18,6))) AS s
         |  FROM hist JOIN nb USING (part) WHERE rank <= $NeighborsK
         |  GROUP BY 1, 2),
         |fresh AS (SELECT c.* FROM cand c
         |  WHERE NOT EXISTS (SELECT 1 FROM hist h
         |    WHERE h.cust = c.cust AND h.part = c.part_j)),
         |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY cust
         |    ORDER BY s DESC, part_j ASC) AS BIGINT) AS rank FROM fresh),
         |recs AS (SELECT cust, part_j, rank FROM rk WHERE rank <= $RecsK),
         |tb AS (SELECT DISTINCT cust, part AS part_j FROM teo JOIN ab USING (okey))
         |SELECT r.rank, CAST(count(*) AS BIGINT) AS n_recs,
         |  CAST(sum(CASE WHEN tb.part_j IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hits,
         |  round(CAST(sum(CASE WHEN tb.part_j IS NOT NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS hit_rate
         |FROM recs r LEFT JOIN tb ON tb.cust = r.cust AND tb.part_j = r.part_j
         |GROUP BY 1""".stripMargin)
}
