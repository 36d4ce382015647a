package graft.ops

import graft.SparkSpec
import graft.queries.StatsQueries

/** Semantic floors for the round-9 stats gates (the hash-exact oracle runs
  * in the driver harness; these pin the statistical invariants that a
  * hash match alone would not explain to a reader). */
class Round9StatsSpec extends SparkSpec {

  private def run(name: String) =
    StatsQueries.queries(name)(spark, sf("sf0.001"))

  test("poisson bootstrap CI brackets the mean and is deterministic") {
    val r = run("agg_bootstrap_ci").collect().head
    val (mean, nBoot) = (r.getAs[Double]("mean"), r.getAs[Long]("n_boot"))
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(nBoot == 64L)
    assert(lo <= hi)
    // Poisson(1) weights resample ~every row once: the replicate spread
    // straddles the point estimate on any non-adversarial sample.
    assert(lo <= mean && mean <= hi)
    // CI width is a real resampling spread, not a degenerate zero.
    assert(hi - lo > 0.0)
    val r2 = run("agg_bootstrap_ci").collect().head
    assert(r == r2) // hash-derived weights: bit-stable across runs
  }

  test("mutual information is non-negative and NMI normalized") {
    val r = run("agg_mutual_info").collect().head
    val mi = r.getAs[Double]("mi_nats")
    val nmi = r.getAs[Double]("nmi")
    assert(mi >= -1e-6) // >= 0 up to the 6dp rounding of the nano-units
    assert(r.getAs[Double]("h_x") > 0.0 && r.getAs[Double]("h_y") > 0.0)
    assert(nmi >= -1e-6 && nmi <= 1.0 + 1e-6)
    // MI is bounded by both marginal entropies.
    assert(mi <= math.min(r.getAs[Double]("h_x"), r.getAs[Double]("h_y")) + 1e-6)
  }

  test("sequential GLR trace: non-negative llr over monotone cumulative counts") {
    val rows = run("ab_sequential_glr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("llr") >= 0.0) // GLR maximizes the alt likelihood
      assert(r.getAs[Long]("s1") <= r.getAs[Long]("t1"))
      assert(r.getAs[Long]("s2") <= r.getAs[Long]("t2"))
    }
    val t1s = rows.sortBy(_.getAs[String]("day")).map(_.getAs[Long]("t1"))
    assert(t1s.zip(t1s.tail).forall { case (a, b) => a <= b })
  }

  test("theil decomposition: total = within + between, all non-negative") {
    val r = run("agg_theil_decomp").collect().head
    val (t, b, w) = (r.getAs[Double]("theil_total"),
      r.getAs[Double]("theil_between"), r.getAs[Double]("theil_within"))
    assert(t >= 0.0 && b >= -1e-6 && w >= -1e-6)
    assert(math.abs(t - (b + w)) < 2e-6) // additive decomposition, 6dp
    assert(r.getAs[Long]("k_groups") == 5L) // order priorities
    assert(b <= t + 1e-6) // between cannot exceed total
  }

  test("average precision lies in [prevalence-floor, 1]") {
    val r = graft.queries.EvalQueries.queries("eval_avg_precision")(
      spark, sf("sf0.001")).collect().head
    val ap = r.getAs[Double]("avg_precision")
    val prevalence = r.getAs[Long]("n_pos").toDouble / r.getAs[Long]("n")
    assert(r.getAs[Long]("n_pos") > 0L)
    assert(ap >= 0.0 && ap <= 1.0)
    // a better-than-random ranker beats the random-baseline AP (= prevalence)
    assert(ap > prevalence * 0.9)
  }

  test("srm check: balanced hash assignment does not trip the guardrail") {
    val r = run("ab_srm_check").collect().head
    assert(r.getAs[Long]("n1") > 0L && r.getAs[Long]("n2") > 0L)
    assert(r.getAs[Double]("chi2") >= 0.0)
    // parity assignment of sequential user ids is as balanced as it gets
    assert(!r.getAs[Boolean]("srm_detected"))
  }

  test("transition entropy bounded by ln(k); perplexity = exp(H)") {
    val r = graft.queries.SessionQueries.queries("events_transition_entropy")(
      spark, sf("sf0.001")).collect().head
    val h = r.getAs[Double]("entropy_nats")
    val k = r.getAs[Long]("k_states")
    assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-6)
    assert(math.abs(r.getAs[Double]("perplexity") - math.exp(h)) < 1e-4)
    assert(r.getAs[Long]("k_cells") <= k * k)
  }

  test("woe/iv: shares reconcile and iv terms are non-negative") {
    val rows = run("feature_woe_iv").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // (shareG - shareB) and ln(shareG/shareB) always share a sign
      assert(r.getAs[Double]("iv_term") >= 0.0)
      if (r.getAs[Double]("woe") == 0.0 &&
          (r.getAs[Long]("n_good") == 0L || r.getAs[Long]("n_bad") == 0L))
        assert(r.getAs[Double]("iv_term") == 0.0)
    }
  }

  test("neyman allocation sums to the budget up to per-stratum rounding") {
    val rows = run("sample_neyman_alloc").collect()
    assert(rows.length == 5) // TPC-H market segments
    val tot = rows.map(_.getAs[Long]("alloc_neyman")).sum
    assert(math.abs(tot - 1000L) <= rows.length / 2 + 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc_neyman") > 0L)
      assert(r.getAs[Double]("sd") > 0.0)
    }
  }
}
