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

  test("minhash calibration: estimates quantized to 1/16, bounded error") {
    val rows = graft.queries.DataOpsQueries.queries("dedup_minhash_calibration")(
      spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      assert(est >= 0.0 && est <= 1.0 && (est * 16).isWhole)
      assert(r.getAs[Double]("jaccard") >= 0.8) // pair-table threshold
      // k=16 signature agreement on j >= 0.8 pairs: generous error roof
      assert(r.getAs[Double]("abs_err") <= 0.6)
    }
    // the calibration is informative, not vacuous: mean error well under
    // the threshold-to-zero distance
    val mae = rows.map(_.getAs[Double]("abs_err")).sum / rows.length
    assert(mae <= 0.3)
  }

  test("graph reciprocity and pareto share land in their unit ranges") {
    val rec = graft.queries.GraphQueries.queries("graph_reciprocity")(
      spark, sf("sf0.001")).collect().head
    assert(rec.getAs[Long]("n_recip") <= rec.getAs[Long]("n_edges"))
    val rr = rec.getAs[Double]("reciprocity")
    assert(rr >= 0.0 && rr <= 1.0)
    assert(rec.getAs[Double]("w_reciprocity") >= 0.0 &&
      rec.getAs[Double]("w_reciprocity") <= 1.0)
    val par = graft.queries.SessionQueries.queries("events_pareto_share")(
      spark, sf("sf0.001")).collect().head
    assert(par.getAs[Long]("users_for_80pct") >= 1L)
    assert(par.getAs[Long]("users_for_80pct") <= par.getAs[Long]("n_users"))
    val share = par.getAs[Double]("user_share")
    assert(share > 0.0 && share <= 1.0)
  }

  test("nearest as-of picks the smaller gap, ties to backward") {
    val rows = graft.queries.SessionQueries.queries("asof_join_nearest")(
      spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set("backward", "forward").contains(r.getAs[String]("side")))
      assert(r.getAs[Long]("gap_sec") >= 0L)
      if (r.getAs[String]("side") == "backward")
        assert(r.getAs[Long]("matched_snap") <= r.getAs[Long]("ts_sec"))
      else
        assert(r.getAs[Long]("matched_snap") > r.getAs[Long]("ts_sec"))
    }
    assert(rows.exists(_.getAs[String]("side") == "forward"))
    assert(rows.exists(_.getAs[String]("side") == "backward"))
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
