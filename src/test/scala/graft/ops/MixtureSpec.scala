package graft.ops

import graft.SparkSpec

/** Water-filling allocation: the level lands on the first unsaturated
  * source, saturated leftovers redistribute, and the no-saturation case
  * degenerates to plain proportional split. */
class MixtureSpec extends SparkSpec {

  private def alloc(frac: Double, rows: (String, Long, Long)*) = {
    import spark.implicits._
    Mixture.waterFill(rows.toDF("grp", "avail", "w"), "grp", "avail", "w", frac)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
  }

  test("small source saturates; its leftover flows to the big one") {
    // B = 0.6 * 1000 = 600; c = (100, 900); t1 = 600/2 = 300 > 100 ⇒ a
    // saturates; level = (600-100)/1 = 500 ⇒ alloc = (100, 500).
    assert(alloc(0.6, ("a", 100L, 1L), ("b", 900L, 1L)) ==
      Map("a" -> 100L, "b" -> 500L))
  }

  test("no saturation: proportional split by weight") {
    // B = 600; t1 = 600/2 = 300 <= c_a = 500 ⇒ level 300 ⇒ (300, 300).
    assert(alloc(0.6, ("a", 500L, 1L), ("b", 500L, 1L)) ==
      Map("a" -> 300L, "b" -> 300L))
  }

  test("weights skew the level; cascade of saturations") {
    // avail (60, 240, 700), w (3, 1, 1), B = 0.5 * 1000 = 500.
    // c = (20, 240, 700); t1 = 500/5 = 100 > 20 ⇒ a saturates;
    // t2 = (500-60)/2 = 220 < 240 ⇒ level 220 ⇒ (60, 220, 220).
    assert(alloc(0.5, ("a", 60L, 3L), ("b", 240L, 1L), ("c", 700L, 1L)) ==
      Map("a" -> 60L, "b" -> 220L, "c" -> 220L))
  }

  test("allocations sum to the budget up to floor dust") {
    val out = alloc(0.37, ("a", 123L, 2L), ("b", 4567L, 1L), ("c", 89L, 3L),
      ("d", 1000L, 2L))
    val budget = math.floor(0.37 * (123 + 4567 + 89 + 1000)).toLong
    val total = out.values.sum
    assert(total <= budget && budget - total < 4, s"sum=$total budget=$budget")
  }
}
