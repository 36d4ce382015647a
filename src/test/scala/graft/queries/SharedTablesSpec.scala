package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The cross-family shared tables must equal the per-family derivations
  * they replaced — pinned against brute recomputation on the sf0.001
  * fixture so a drive-by edit to the memo can't silently skew four
  * families at once. */
class SharedTablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pairCounts = brute undirected basket pair aggregation; " +
      "directed view mirrors every pair with identical counts") {
    graft.core.Memo.clear(spark)
    val b = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val brute = b.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(b.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = SharedTables.pairCounts(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(brute.nonEmpty)
    val directed = SharedTables.pairCountsDirected(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(directed == brute ++ brute.map { case (a, bb, n) => (bb, a, n) })
    assert(directed.size == 2 * brute.size) // a < b ⇒ mirrors are distinct
    graft.core.Memo.clear(spark)
  }
}
