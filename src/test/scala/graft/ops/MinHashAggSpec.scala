package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables.table

/** The custom TypedImperativeAggregate: signature agreement between groups
  * estimates the Jaccard similarity of their element sets. */
class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  test("signature agreement tracks exact set Jaccard across sources") {
    val k = 64
    val tok = table(spark, sf("sf0.001"), "documents")
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("t"))
      .distinct()
    val sigs = tok.groupBy(col("source"))
      .agg(MinHashAgg.minhashAgg(col("t"), k).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val sets = tok.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap

    val sources = sigs.keys.toSeq.sorted.take(6)
    for (a <- sources; b <- sources if a < b) {
      val est = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / k
      val exact = sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
      assert(math.abs(est - exact) < 0.25,
        s"$a vs $b: estimate $est vs exact $exact")
    }
  }

  test("gate query minhash_nation_orderdates: estimate within sketch error of exact Jaccard") {
    val out = graft.queries.DataOpsQueries.queries("minhash_nation_orderdates")(spark, sf("sf0.001"))
      .select("est_jaccard", "exact_jaccard").collect()
    assert(out.length > 0)
    val maxErr = out.map(r => math.abs(r.getDouble(0) - r.getDouble(1))).max
    info(s"pairs=${out.length} max |est-exact| = $maxErr")
    assert(maxErr < 0.2, s"max err $maxErr") // k=128 ⇒ stderr ≈ 0.045, 4σ bound
  }

  test("partial-merge equivalence: signature is partition-count invariant") {
    val words = (1 to 500).map(i => s"w$i")
    val one = words.toDF("t").coalesce(1)
      .agg(MinHashAgg.minhashAgg(col("t"), 16)).head().getSeq[Long](0)
    val many = words.toDF("t").repartition(13)
      .agg(MinHashAgg.minhashAgg(col("t"), 16)).head().getSeq[Long](0)
    assert(one == many)
  }
}
