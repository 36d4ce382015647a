package graft.ops

import graft.SparkSpec

/** Semantic invariants for the Gopher rule bundle and RFM segmentation. */
class GopherRfmSpec extends SparkSpec {

  test("gopher rules: census covers every rule, pass count bounded by corpus") {
    val rows = graft.queries.CorpusQueries.queries("corpus_gopher_rules")(
      spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("word_count", "mean_word_length", "symbol_ratio",
      "bullet_lines", "ellipsis_lines", "alpha_lines", "stopwords", "pass_all"))
    val nDocs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").count()
    rows.values.foreach(v => assert(v >= 0L && v <= nDocs))
    // a violation census is vacuous if nothing ever fires: the synthetic
    // short docs must trip the 50-word floor
    assert(rows("word_count") > 0L)
    // survivors cannot exceed docs minus any single rule's violations
    (rows - "pass_all").values.foreach(v => assert(rows("pass_all") <= nDocs - v))
  }

  test("rfm: quintile scores in 1..5 with near-equal bins, labels consistent") {
    val rows = graft.queries.RelationalQueries.queries("customer_rfm_segments")(
      spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val scores = rows.map(_.getAs[Long](c))
      assert(scores.forall(s => s >= 1L && s <= 5L))
      // exact integer quantile bins: sizes differ by at most 1
      val sizes = scores.groupBy(identity).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"$c bins: $sizes")
    }
    rows.foreach { r =>
      val (rs, fs) = (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"))
      val seg = r.getAs[String]("segment")
      if (seg == "champion") assert(rs >= 4 && fs >= 4)
      if (seg == "lost") assert(rs <= 2 && fs <= 2)
      assert(r.getAs[Long]("recency_days") >= 0L)
      assert(r.getAs[Double]("monetary") > 0.0)
    }
    assert(rows.map(_.getAs[String]("segment")).toSet.contains("champion"))
  }
}
