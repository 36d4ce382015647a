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
}
