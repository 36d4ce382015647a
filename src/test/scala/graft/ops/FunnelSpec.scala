package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ordered-funnel and cohort-retention semantics. */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("funnel is strict-order: conversions before the prior stage do not count") {
    val ev = Seq(
      // user 1: purchase BEFORE first view → stage stops at click
      (1L, t(0), "purchase"), (1L, t(10), "view"), (1L, t(20), "click"),
      // user 2: full ordered funnel; earliest qualifying times win
      (2L, t(0), "view"), (2L, t(1), "view"), (2L, t(5), "click"),
      (2L, t(3), "click"), (2L, t(9), "purchase"),
      // user 3: view only
      (3L, t(2), "view"),
      // user 4: never views → absent from output
      (4L, t(0), "click"), (4L, t(1), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Timestamp]("t_view"), r.getAs[Timestamp]("t_click"),
          r.getAs[Timestamp]("t_purchase"), r.getAs[Int]("stage"))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((t(10), t(20), null, 2)))
    // user 2: t_click is the earliest click AFTER t(0) view = t(3)
    assert(got(2L) == ((t(0), t(3), t(9), 3)))
    assert(got(3L) == ((t(2), null, null, 1)))
  }

  test("sessionPaths: gap splits sessions; paths truncate at maxLen; ties order by tie col") {
    val ev = Seq(
      // user 1, session 1: 6 events (truncates to 5), two at the same ts
      (1L, 1L, t(0), "a"), (1L, 2L, t(1), "b"), (1L, 4L, t(2), "c"),
      (1L, 3L, t(2), "d"), (1L, 5L, t(3), "e"), (1L, 6L, t(4), "f"),
      // user 1, session 2 after a 2h gap
      (1L, 7L, t(150), "a"), (1L, 8L, t(151), "b"),
      // user 2: same 2-event path
      (2L, 9L, t(0), "a"), (2L, 10L, t(1), "b"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Funnel.sessionPaths(ev, "user_id", "ts", "event_id",
      "event_type", gapSec = 1800L, maxLen = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // same-ts events order by event_id: d (id 3) before c (id 4)
    assert(out("a>b>d>c>e") == 1L) // 6th event truncated away
    assert(out("a>b") == 2L)       // session 2 of user 1 + user 2
    assert(out.values.sum == 3L)
  }

  test("cohortRetention counts each user once per active day") {
    val d0 = 1700006400000L // 2023-11-15 00:00:00 UTC — midnight-aligned
    def ts(day: Int, hour: Int) =
      new Timestamp(d0 + day * 86400000L + hour * 3600000L)
    val ev = Seq(
      (1L, ts(0, 1)), (1L, ts(0, 5)), (1L, ts(2, 3)), // cohort d0: active d0, d2
      (2L, ts(0, 9)),                                 // cohort d0: active d0
      (3L, ts(1, 2)), (3L, ts(2, 2)))                 // cohort d1: active d1, d2
      .toDF("user_id", "ts")
    val got = Funnel.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cohorts = got.keys.map(_._1).toSet
    assert(cohorts.size == 2)
    val Seq(c0, c1) = cohorts.toSeq.sorted
    assert(got((c0, 0L)) == 2L) // users 1 and 2 on their first day
    assert(got((c0, 2L)) == 1L) // user 1 two days later
    assert(got((c1, 0L)) == 1L)
    assert(got((c1, 1L)) == 1L)
    assert(got.size == 4)
  }
}
