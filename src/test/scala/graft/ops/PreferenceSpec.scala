package graft.ops

import graft.SparkSpec

/** Preference-pair construction: argmax/argmin picks, deterministic
  * tiebreaks, and the degenerate groups that must emit nothing. */
class PreferenceSpec extends SparkSpec {

  private def cands(rows: (Long, Long, Double)*) = {
    import spark.implicits._
    rows.toDF("prompt", "cand", "score")
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    Preference.pairs(df, "prompt", "cand", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq.sortBy(_._1)

  test("chosen = best score, rejected = worst, margin = difference") {
    val out = run(cands(
      (1L, 10L, 0.2), (1L, 11L, 0.9), (1L, 12L, 0.5),
      (2L, 20L, -1.5), (2L, 21L, 3.0)))
    assert(out == Seq(
      (1L, 11L, 10L, 0.9, 0.2, 0.7),
      (2L, 21L, 20L, 3.0, -1.5, 4.5)))
  }

  test("score ties resolve to the lowest id on both ends") {
    val out = run(cands(
      (1L, 12L, 0.9), (1L, 11L, 0.9), (1L, 22L, 0.1), (1L, 21L, 0.1)))
    assert(out == Seq((1L, 11L, 21L, 0.9, 0.1, 0.8)))
  }

  test("singleton groups and all-tied groups emit nothing") {
    val out = run(cands(
      (1L, 10L, 0.5),                    // singleton
      (2L, 20L, 0.3), (2L, 21L, 0.3),    // all tied: chosen id = rejected id
      (3L, 30L, 0.1), (3L, 31L, 0.4)))   // normal
    assert(out == Seq((3L, 31L, 30L, 0.4, 0.1, 0.3)))
  }

  test("bradleyTerry: dominance order and symmetric equality") {
    import spark.implicits._
    // a beats b 8:2, b beats c 8:2, a beats c 9:1 → s_a > s_b > s_c.
    val wins = Seq(("a", "b", 8L), ("b", "a", 2L), ("b", "c", 8L),
      ("c", "b", 2L), ("a", "c", 9L), ("c", "a", 1L))
      .toDF("i", "j", "n")
    val out = Preference.bradleyTerry(wins, "i", "j", "n")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    val s = out.map(r => r._1 -> r._4).toMap
    assert(s("a") > s("b") && s("b") > s("c"), s"order: $s")
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-6)
    assert(out.map(r => r._1 -> r._2).toMap ==
      Map("a" -> 17L, "b" -> 10L, "c" -> 3L))
    assert(out.map(r => r._1 -> r._3).toMap ==
      Map("a" -> 20L, "b" -> 20L, "c" -> 20L))

    // Perfectly balanced round-robin → all strengths equal at 1/3.
    val even = Seq(("a", "b", 5L), ("b", "a", 5L), ("b", "c", 5L),
      ("c", "b", 5L), ("a", "c", 5L), ("c", "a", 5L)).toDF("i", "j", "n")
    val es = Preference.bradleyTerry(even, "i", "j", "n")
      .as[(String, Long, Long, Double)].collect().map(_._4)
    assert(es.forall(v => math.abs(v - 1.0 / 3) < 1e-6), es.mkString(","))
  }

  test("bradleyTerry: winless arm lands at strength 0 and keeps its row") {
    import spark.implicits._
    val wins = Seq(("a", "b", 3L), ("b", "a", 1L), ("a", "z", 4L))
      .toDF("i", "j", "n")
    val out = Preference.bradleyTerry(wins, "i", "j", "n")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("z")._2 == 0L && out("z")._4 == 0.0)
    assert(out("a")._4 > out("b")._4)
  }
}
