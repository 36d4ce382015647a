package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed range join vs the naive BETWEEN cross join, on data designed to
  * cross bucket boundaries (intervals spanning 1..3 buckets, points at
  * interval endpoints). */
class RangeJoinSpec extends SparkSpec {

  test("bucketed range join matches naive BETWEEN join exactly") {
    import spark.implicits._
    val points = (0L to 200L).map(p => (p, s"p$p")).toDF("pt", "ptag")
    // intervals of length 0, 7, 23 starting every 13 — endpoints land on and
    // off bucket edges for width 10
    val intervals = (0L to 15L).flatMap { i =>
      Seq((i * 100 + 1, i * 13, i * 13 + (i % 3) * 7 + (i % 2) * 16))
    }.toDF("iid", "lo", "hi")
    val naive = points.join(intervals,
      col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pt", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    Seq(1L, 10L, 64L).foreach { w =>
      val got = RangeJoin.bucketed(points, intervals, "pt", "lo", "hi", w)
        .select("pt", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == naive.length, s"width=$w: pair multiplicity differs")
      assert(got.toSet == naive.toSet, s"width=$w")
    }
  }

  test("column collisions are rejected") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("x", "shared")
    val b = Seq((1L, 2L, 3L)).toDF("lo", "hi", "shared")
    intercept[IllegalArgumentException] {
      RangeJoin.bucketed(a, b, "x", "lo", "hi", 10L)
    }
  }
}
