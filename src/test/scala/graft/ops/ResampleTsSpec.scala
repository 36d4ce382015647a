package graft.ops

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the round-7 time-series operators: OHLC bar semantics
  * (tie-broken open/close), LOCF fill with leading-gap nulls, interval
  * island merging (overlap / touch / gap / tie cases), and the rolling
  * median's odd/even midpoint arithmetic. */
class ResampleTsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, Long, Double)*) = {
    import spark.implicits._
    rows.map { case (u, t, id, v) => (u, ts(t), id, v) }
      .toDF("user_id", "ts", "event_id", "value")
  }

  test("ohlcBars: open/close follow (ts, id) order incl. same-ts ties") {
    val d = events(
      (1L, "2024-01-01 10:05:00", 4L, 7.0),
      (1L, "2024-01-01 10:01:00", 2L, 3.0), // same ts as id=1 — id breaks tie
      (1L, "2024-01-01 10:01:00", 1L, 5.0), // open
      (1L, "2024-01-01 10:59:00", 3L, 1.0), // close (latest ts)
      (1L, "2024-01-01 11:00:00", 5L, 9.0)) // next hour
    val out = Resample.ohlcBars(d, "user_id", "ts", "event_id", "value")
      .orderBy("hour_sec").collect()
    assert(out.length == 2)
    val first = out(0)
    assert(first.getAs[Long]("n_events") == 4L)
    assert(first.getAs[Double]("open") == 5.0)   // id tie-break, not 3.0
    assert(first.getAs[Double]("high") == 7.0)
    assert(first.getAs[Double]("low") == 1.0)
    assert(first.getAs[Double]("close") == 1.0)
    val second = out(1)
    assert(second.getAs[Long]("n_events") == 1L &&
      second.getAs[Double]("open") == 9.0 &&
      second.getAs[Double]("close") == 9.0)
  }

  test("locfFill: silent hours inherit last observation; leading gap stays null") {
    // user 1: hours 10 (obs 2.0), 11 (silent), 12 (silent), 13 (obs 4.0)
    val d = events(
      (1L, "2024-01-01 10:30:00", 1L, 2.0),
      (1L, "2024-01-01 13:10:00", 2L, 4.0))
    val grid = Resample.hourlyPerKey(d, "user_id", "ts", "value")
    val out = Resample.locfFill(grid, "user_id", "hour_sec", "n_events", "value_sum")
      .orderBy("hour_sec").collect()
    assert(out.map(_.getAs[Boolean]("observed")).toSeq ==
      Seq(true, false, false, true))
    assert(out.map(_.getAs[Double]("value_filled")).toSeq ==
      Seq(2.0, 2.0, 2.0, 4.0))
    // a user whose first grid cell is silent can't happen (grid starts at
    // the first observation), so leading-gap null needs a hand-built grid:
    import spark.implicits._
    val hand = Seq((9L, 100L, 0L, 0.0), (9L, 101L, 1L, 5.0))
      .toDF("user_id", "hour_sec", "n_events", "value_sum")
    val filled = Resample.locfFill(hand, "user_id", "hour_sec", "n_events", "value_sum")
      .orderBy("hour_sec").collect()
    assert(filled(0).isNullAt(filled(0).fieldIndex("value_filled")))
    assert(filled(1).getAs[Double]("value_filled") == 5.0)
  }

  test("coalesceIntervals: overlap and touch merge, gaps split, ties are safe") {
    import spark.implicits._
    def d(s: String) = Date.valueOf(s)
    val iv = Seq(
      // key 1: [1..5] + [3..8] overlap; [8..9] touches; [11..12] gap
      (1L, d("2024-01-01"), d("2024-01-05")),
      (1L, d("2024-01-03"), d("2024-01-08")),
      (1L, d("2024-01-08"), d("2024-01-09")),
      (1L, d("2024-01-11"), d("2024-01-12")),
      // key 2: identical (start, end) ties + a contained interval
      (2L, d("2024-02-01"), d("2024-02-10")),
      (2L, d("2024-02-01"), d("2024-02-10")),
      (2L, d("2024-02-03"), d("2024-02-04")),
      // key 3: inverted interval is dropped
      (3L, d("2024-03-05"), d("2024-03-01")))
    val out = Resample.coalesceIntervals(
      iv.toDF("k", "s", "e"), "k", "s", "e")
      .orderBy("k", "span_start").collect()
    val k1 = out.filter(_.getAs[Long]("k") == 1L)
    assert(k1.map(r => (r.getAs[Date]("span_start").toString,
      r.getAs[Date]("span_end").toString, r.getAs[Long]("n_merged"))).toSeq ==
      Seq(("2024-01-01", "2024-01-09", 3L), ("2024-01-11", "2024-01-12", 1L)))
    val k2 = out.filter(_.getAs[Long]("k") == 2L)
    assert(k2.length == 1 && k2.head.getAs[Long]("n_merged") == 3L)
    assert(!out.exists(_.getAs[Long]("k") == 3L))
  }

  test("rollingMedian: odd window picks middle, even window averages") {
    val d = events(
      (1L, "2024-01-01 10:00:00", 1L, 10.0),
      (1L, "2024-01-01 10:01:00", 2L, 2.0),
      (1L, "2024-01-01 10:02:00", 3L, 6.0),
      (1L, "2024-01-01 10:03:00", 4L, 4.0))
    val out = Resample.rollingMedian(d, "user_id", "ts", "event_id", "value", k = 5)
      .orderBy("event_id").collect()
      .map(_.getAs[Double]("roll_median")).toSeq
    // windows: [10] -> 10; [2,10] -> 6; [2,6,10] -> 6; [2,4,6,10] -> 5
    assert(out == Seq(10.0, 6.0, 6.0, 5.0))
  }

  test("new-column guards reject colliding input columns") {
    import spark.implicits._
    val bad = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 1.0, 0.0))
      .toDF("user_id", "ts", "event_id", "value", "open")
    intercept[IllegalArgumentException] {
      Resample.ohlcBars(bad, "user_id", "ts", "event_id", "value")
    }
    val badIv = Seq((1L, 1, 2, 0L)).toDF("k", "s", "e", "n_merged")
    intercept[IllegalArgumentException] {
      Resample.coalesceIntervals(badIv, "k", "s", "e")
    }
  }

  test("degenerate inputs: empty frames yield empty, single rows pass through") {
    val empty = events()
    assert(Resample.ohlcBars(empty, "user_id", "ts", "event_id", "value").count() == 0)
    assert(Resample.rollingMedian(empty, "user_id", "ts", "event_id", "value", 3).count() == 0)
    val one = events((1L, "2024-01-01 10:00:00", 1L, 3.5))
    val bar = Resample.ohlcBars(one, "user_id", "ts", "event_id", "value").collect().head
    assert(bar.getAs[Double]("open") == 3.5 && bar.getAs[Double]("close") == 3.5 &&
      bar.getAs[Double]("high") == 3.5 && bar.getAs[Double]("low") == 3.5)
    val med = Resample.rollingMedian(one, "user_id", "ts", "event_id", "value", 5)
      .collect().head
    assert(med.getAs[Double]("roll_median") == 3.5)
  }
}
