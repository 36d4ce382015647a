package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the structural fix when one join key
  * holds a disproportionate share of the fact rows and a plain shuffle join
  * puts that key's entire volume in one task.
  *
  * Shape: the (small-ish) dimension side is replicated `salts` times with a
  * salt column; each fact row picks ONE salt pseudo-randomly from a
  * high-cardinality column; the join key becomes (key, salt), so a hot key's
  * rows spread over `salts` tasks instead of one. The output is provably
  * identical to the unsalted join — every fact row still meets exactly the
  * dimension rows with its key (once, at its chosen salt) — which is what
  * the oracle gate checks.
  *
  * When to reach for it over AQE skew-join: AQE only splits skewed
  * SHUFFLE-join partitions it can observe post-shuffle; salting also covers
  * aggregate-under-join shapes, deterministic-layout requirements, and
  * engines/paths where AQE is off. Cost: dimension side × salts (keep the
  * dimension broadcast-small or salts modest).
  */
object SkewJoin {

  /** Inner equi-join `facts.key = dim.key`, salted `salts` ways. `spreadCol`
    * is a high-cardinality fact column (ids work well) whose hash picks the
    * fact row's salt; it only affects WHICH task a row lands in, never the
    * join result. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, spreadCol: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!facts.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin uses an internal __salt column; rename the existing one")
    val overlap = facts.columns.toSet.intersect(dim.columns.toSet)
    require(overlap.isEmpty,
      s"saltedJoin column collision: ${overlap.mkString(", ")}; rename first " +
        "(the joined output would carry ambiguous duplicate columns)")
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val saltedFacts = facts.withColumn("__salt",
      pmod(xxhash64(col(spreadCol)), lit(salts)).cast("int"))
    saltedFacts
      .join(saltedDim, saltedFacts(factKey) === saltedDim(dimKey) &&
        saltedFacts("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** Blocked within-group self-pairing — the skew fix AQE cannot apply.
    *
    * The unordered-pair generator (`a.join(a, key).filter(va < vb)`) has
    * OUTPUT skew under a hot key: a group with m members emits m²/2 pairs
    * from ~m input rows, so the skew-canary's 1%-of-lineitem hot order
    * stalls one sort-merge task ~60× past the median (measured,
    * SCALE.md §"skew canary") while AQE's skew-join never engages — it
    * detects oversized INPUT partitions, and the hot group's input is
    * ~100 KB. The structural rewrite blocks each group's member set into
    * `chunks` value-hash chunks and self-joins on UNORDERED cell
    * coordinates (key, min-chunk, max-chunk): member u with chunk c(u) is
    * emitted once per counterpart chunk c', into cell
    * (min(c(u),c'), max(c(u),c')) — so u and w share exactly the cell
    * whose coordinates are {c(u), c(w)}, and the hot group's quadratic
    * spreads over chunks(chunks+1)/2 cells. Same-chunk pairs would meet
    * in every cell that carries their common chunk, so the pair filter
    * keeps a meeting only in the pair's OWN cell
    * (__ca = min(c(va),c(vb)), __cb = max) — every unordered pair
    * survives exactly once (spec-asserted, oracle-shared by the gate).
    *
    * Unordered cells cost HALF the replication of the ordered
    * (chunk_left, chunk_right) formulation — each row is emitted `chunks`
    * times, once, and both join sides read the SAME exploded frame, so
    * Spark's ReuseExchange ships it through one exchange (measured at the
    * 100× canary: 142 → 84 s r2). Pay the replication when groups can be
    * huge, keep `chunks` modest (4-16); [[selfPairsAuto]] decides that
    * with a probe.
    *
    * `df` must be distinct on (keyCol, valCol); `valCol` numeric/orderable.
    */
  def blockedSelfPairs(df: DataFrame, keyCol: String, valCol: String,
      chunks: Int): DataFrame = {
    require(chunks > 0, "chunks must be positive")
    val chunk = pmod(xxhash64(col(valCol)), lit(chunks)).cast("int")
    val e = df
      .select(col(keyCol).as("__k"), col(valCol).as("__v"), chunk.as("__c"))
      .withColumn("__other", explode(sequence(lit(0), lit(chunks - 1))))
      .select(col("__k"), col("__v"), col("__c"),
        least(col("__c"), col("__other")).as("__ca"),
        greatest(col("__c"), col("__other")).as("__cb"))
    val left = e.select(col("__k"), col("__ca"), col("__cb"),
      col("__v").as("__va"), col("__c").as("__chva"))
    val right = e.select(col("__k"), col("__ca"), col("__cb"),
      col("__v").as("__vb"), col("__c").as("__chvb"))
    left.join(right, Seq("__k", "__ca", "__cb"))
      .filter(col("__va") < col("__vb") &&
        col("__ca") === least(col("__chva"), col("__chvb")) &&
        col("__cb") === greatest(col("__chva"), col("__chvb")))
      .select(col("__k").as(keyCol), col("__va").as(valCol + "_a"),
        col("__vb").as(valCol + "_b"))
  }

  /** Group size above which [[selfPairsAuto]] buys the blocked plan. A
    * group of m members emits m²/2 pairs from m rows; at 4096 the hot
    * group's ~8M pairs are what stalls one sort-merge task (the skew
    * canary measured a 58× stall from a far smaller planted key), while
    * below it the naive plan's worst task stays ~comparable to its
    * median. */
  val HotGroupThreshold: Long = 4096L

  /** Naive within-group self-pairing — `df.join(df, key).filter(va < vb)`.
    * The right plan when no group is degenerate: zero replication, one
    * co-partitioned join. */
  def naiveSelfPairs(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.select(col(keyCol), col(valCol).as(valCol + "_a"))
      .join(df.select(col(keyCol), col(valCol).as(valCol + "_b")), Seq(keyCol))
      .filter(col(valCol + "_a") < col(valCol + "_b"))

  /** Hard ceiling on group size for [[selfPairsAuto]]: a group of m
    * members emits m(m−1)/2 pairs, QUADRATIC in m — blocking spreads the
    * quadratic over tasks but cannot shrink it, so a single pathological
    * 10⁵-item basket (bot traffic, a bulk account) still means 5·10⁹
    * output rows from one group. Past this cap the group is EXCLUDED
    * from pairing and counted loudly (SCALE.md part 6 named this the one
    * skew surface the zipf canary cannot cover). 16384² /2 ≈ 1.3·10⁸
    * pairs is the largest per-group output the blocked plan absorbs
    * without dominating a run; real baskets sit orders of magnitude
    * below (TPC-H ≤ 7, retail ~10²). Audit the excluded keys with
    * [[cappedGroups]] — same frame the probe already aggregates. */
  val MaxGroupCap: Long = 16384L

  /** The over-cap groups [[selfPairsAuto]] excludes: (key, m) with
    * m > maxGroup — the overflow counter as a first-class result (the
    * basket_cap_audit gate oracles the zero-overflow claim on real
    * fixtures; a canary fixture with a planted whale shows up here). */
  def cappedGroups(df: DataFrame, keyCol: String,
      maxGroup: Long = MaxGroupCap): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("m"))
      .filter(col("m") > maxGroup)

  /** Two-regime self-pairing: ONE group-size aggregate picks the plan —
    * naive below `hotThreshold` (no replication; the 100× canary measured
    * the always-blocked shape at ~4× the naive cost on uniform data, pure
    * insurance premium), blocked above it (output skew is invisible to AQE,
    * which splits oversized INPUT partitions — a hot group's input is
    * tiny). Same eager-probe discipline as Graph.LocalEdgeThreshold and
    * Dedup.pairIntersections; both branches are provably pair-identical
    * (ShapeSpec). The probe costs one keyed count — noise next to the pair
    * join it steers.
    *
    * Groups larger than `maxGroup` are EXCLUDED from pairing (quadratic
    * fan-out cap — see [[MaxGroupCap]]): the probe counts them, logs one
    * loud line, and anti-joins their (few, broadcast-small by
    * construction) keys out; when no group is over cap — every real
    * fixture — the plan is byte-identical to the uncapped one. */
  def selfPairsAuto(df: DataFrame, keyCol: String, valCol: String,
      chunks: Int = 8, hotThreshold: Long = HotGroupThreshold,
      maxGroup: Long = MaxGroupCap): DataFrame = {
    val probe = df.groupBy(col(keyCol)).agg(count(lit(1)).as("m"))
      .agg(max(when(col("m") <= maxGroup, col("m"))).as("mx_kept"),
        sum(when(col("m") > maxGroup, 1L).otherwise(0L)).as("n_over"))
      .head()
    val mxKept = if (probe.isNullAt(0)) 0L else probe.getLong(0)
    val nOver = if (probe.isNullAt(1)) 0L else probe.getLong(1)
    val base = if (nOver > 0L) {
      System.err.println(s"[selfPairsAuto] $nOver group(s) over " +
        s"maxGroup=$maxGroup EXCLUDED from pair generation " +
        s"(quadratic fan-out cap); list them via SkewJoin.cappedGroups")
      df.join(broadcast(cappedGroups(df, keyCol, maxGroup)
        .select(col(keyCol))), Seq(keyCol), "left_anti")
    } else df
    if (mxKept > hotThreshold) blockedSelfPairs(base, keyCol, valCol, chunks)
    else naiveSelfPairs(base, keyCol, valCol)
  }
}
