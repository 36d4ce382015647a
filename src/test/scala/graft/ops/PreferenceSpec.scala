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
}
