package graft.ops

import graft.SparkSpec

/** Error bounds for the sketch-aggregate gate (agg_sketch_accuracy):
  * HLL++ distinct within its configured rsd, approx percentile within one
  * value step on the integer-valued quantity domain. */
class SketchSpec extends SparkSpec {

  test("HLL distinct and approx percentile stay within bounds vs exact twins") {
    val rows = graft.queries.StatsQueries.queries("agg_sketch_accuracy")(
      spark, sf("sf0.01")).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val hll = r.getAs[Long]("hll_distinct").toDouble
      assert(math.abs(hll - exact) / exact < 0.05,
        s"HLL off by ${math.abs(hll - exact) / exact} for ${r.get(0)}")
      val p50 = r.getAs[Double]("exact_p50")
      val ap50 = r.getAs[Double]("approx_p50")
      assert(math.abs(ap50 - p50) <= 1.0, s"approx p50 $ap50 vs $p50")
    }
  }

  test("KMV bottom-64 distinct estimate lands within the 3/sqrt(k) envelope") {
    val rows = graft.queries.StatsQueries.queries("agg_sketch_report")(
      spark, sf("sf0.01")).collect()
    assert(rows.length == 3)
    // KMV std error ≈ 1/sqrt(k−2); 3σ at k=64 is ~38%. The gate's value is
    // exactness of the ARITHMETIC (oracle hash-match), not tightness — the
    // spec pins the estimator is sane, the oracle pins it bit-for-bit.
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val est = r.getAs[Double]("kmv_distinct")
      assert(r.getAs[Long]("n_hashes") >= 64, "groups must exceed k")
      assert(math.abs(est - exact) / exact < 3.0 / math.sqrt(62.0),
        s"KMV ${est} vs exact ${exact} for ${r.get(0)}")
      assert(r.getAs[Double]("rel_err") >= 0.0)
    }
  }

  test("fixed-salt Count-Min estimates dominate exact counts (CM guarantee)") {
    val rows = graft.queries.TrainPrepQueries.queries("cm_topk_report")(
      spark, sf("sf0.01")).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val cnt = r.getAs[Long]("cnt")
      val est = r.getAs[Long]("cm_est")
      assert(est >= cnt, s"CM must never undercount: $est < $cnt")
      assert(r.getAs[Long]("overcount") == est - cnt)
    }
    // Overcount is bounded by the sketch's eN/w expectation in the mean:
    // N = 600k rows over width 256 → E[overcount per row hash] ≈ N/w.
    val n = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet").count()
    val meanOver = rows.map(_.getAs[Long]("overcount")).sum.toDouble / rows.length
    assert(meanOver <= 4.0 * n / 256.0,
      s"mean CM overcount $meanOver way past the eN/w envelope")
  }
}
