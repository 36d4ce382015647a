package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}

import graft.core.Tables.table

/** Derived tables shared ACROSS query families. Each is one
  * [[graft.core.Memo]] entry so the whole bench pays its shuffle once,
  * with `cache_cold` attribution to the first gate that materializes it
  * (alphabetically the basket family; the graph and recsys families then
  * read the cache). Single-owner derivations stay private to their
  * family — only genuinely cross-family tables belong here.
  */
object SharedTables {

  /** Distinct (l_orderkey, l_partkey) basket membership rows — the
    * co-purchase support table. The distinct is a full lineitem shuffle
    * and SIX consumers across three families start from it: the four
    * basket gates (pair counts, blocked, auto, association rules), the
    * co-purchase graph edge list, and the recsys basket → neighbor →
    * holdout chain. Before round 12 each rebuilt it independently —
    * r11's driver bench priced that at up to 4 redundant lineitem
    * shuffles per run. */
  def distinctBaskets(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached("baskets.distinct", s, dir) {
      table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
    }

  /** UNDIRECTED co-purchase pair counts over [[distinctBaskets]]:
    * (part_a < part_b, n_orders), no support floor — the single most
    * expensive shuffle the basket/graph/recsys families share (the
    * co-partitioned basket self-join plus the pair aggregation). Four
    * derivations collapse onto it: basket_pair_counts (top-50),
    * basket_association_rules (directed mirror + floor), the co-purchase
    * graph edge list (floor 2, renamed), and the recsys co-occurrence
    * matrix (directed mirror) — each a projection/filter/union over the
    * cached relation, so the pair aggregation runs ONCE per bench.
    * basket_pairs_blocked/auto intentionally keep their own pair
    * generation: they exist to exercise the SkewJoin chunking paths.
    * Output-row count ≈ Σ per-order pairs(m choose 2) — bounded by the
    * same basket-size argument as the join itself; at 100 TB the cache
    * spills to disk and every consumer still skips the re-shuffle. */
  def pairCounts(s: SparkSession, dir: String): DataFrame = {
    val b = distinctBaskets(s, dir)
    graft.core.Memo.cached("baskets.pairCounts", s, dir) {
      b.select(col("l_orderkey"), col("l_partkey").as("part_a"))
        .join(b.select(col("l_orderkey"), col("l_partkey").as("part_b")),
          Seq("l_orderkey"))
        .filter(col("part_a") < col("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("n_orders"))
    }
  }

  /** The DIRECTED view of [[pairCounts]] — both orientations of every
    * undirected pair, n_orders unchanged (co-occurrence is symmetric).
    * A union of two projections over the cached relation: no shuffle. */
  def pairCountsDirected(s: SparkSession, dir: String): DataFrame = {
    val p = pairCounts(s, dir)
    p.unionByName(p.select(col("part_b").as("part_a"),
      col("part_a").as("part_b"), col("n_orders")))
  }
}
