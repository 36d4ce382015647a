package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed Markov attribution kernel checks: transition truncation
  * semantics and the K-step absorption / removal-effect arithmetic on a
  * chain small enough to verify on paper. */
class MarkovSpec extends SparkSpec {

  import spark.implicits._

  // Two users:
  //   u1: a, b, purchase        (converts)
  //   u2: a, a                  (no conversion)
  private def fixture = Seq(
    (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "purchase"),
    (2L, 4L, 10L, "a"), (2L, 5L, 20L, "a")
  ).toDF("user_id", "event_id", "ts", "event_type")

  test("transitions: prefix truncation at first conversion, start/null edges") {
    val t = Markov.transitions(fixture, "user_id", "ts", "event_id",
      "event_type", "purchase")
    val m = t.collect().map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2),
        r.getDecimal(3).doubleValue)).toMap
    // START -> a twice (both users start at 'a')
    assert(m((Markov.Start, "a")) == ((2L, 1.0)))
    // a: -> b (u1), -> a (u2 first), -> NULL (u2 last) : 1/3 each
    assert(m(("a", "b"))._1 == 1L && math.abs(m(("a", "b"))._2 - 1.0 / 3) < 1e-9)
    assert(m(("a", "a"))._1 == 1L)
    assert(m(("a", Markov.Null))._1 == 1L)
    // b -> CONV with certainty
    assert(m(("b", Markov.Conv)) == ((1L, 1.0)))
    // no outgoing rows from CONV/NULL
    assert(!m.keySet.exists(k => k._1 == Markov.Conv || k._1 == Markov.Null))
  }

  test("removal effects: absorption probabilities match the closed form") {
    val t = Markov.transitions(fixture, "user_id", "ts", "event_id",
      "event_type", "purchase")
    val re = Markov.removalEffects(spark, t).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    // Full chain: p(a) = 1/3·p(a) + 1/3·p(b); p(b) = 1 → p(a) = 1/2 at the
    // fixed point; K=16 truncation: p_k(a) = 1/3·p_{k-1}(a) + 1/3 →
    // p ≈ 0.5·(1 − 3^-16) ≈ 0.499999988 → rounds to 0.5 at 6dp.
    assert(re("a")._1 == 0.5 && re("b")._1 == 0.5)
    // remove b: a can only loop or die → p = 0
    assert(re("b")._2 == 0.0 && re("b")._3 == 1.0)
    // remove a: START -> a redirects to NULL → p = 0
    assert(re("a")._2 == 0.0 && re("a")._3 == 1.0)
    // both effects 1.0 → equal credit
    assert(re("a")._4 == 0.5 && re("b")._4 == 0.5)
  }
}
