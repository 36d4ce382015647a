package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
}
