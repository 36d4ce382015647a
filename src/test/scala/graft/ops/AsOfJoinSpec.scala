package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge semantics of the union+window as-of join. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 1L, 5L),   // between snapshots at 3 and 10
    (2L, 1L, 3L),   // exactly AT a snapshot ts — inclusive match
    (3L, 1L, 1L),   // before the first snapshot
    (4L, 2L, 50L)   // user with a null-payload latest snapshot
  ).toDF("event_id", "user_id", "ts")

  private def right = Seq(
    (1L, 3L, Some(30.0)),
    (1L, 10L, Some(100.0)),
    (2L, 40L, Some(4.0)),
    (2L, 45L, None)
  ).toDF("user_id", "snap_ts", "rate")

  test("inner as-of: latest snapshot at-or-before, unmatched rows drop") {
    val out = AsOfJoin.asof(left, right, "user_id", "ts", "snap_ts", Seq("rate"))
      .collect().map(r => (r.getLong(0), Option(r.get(3)))).toMap
    assert(out == Map(
      1L -> Some(30.0),  // ts 5 picks snap 3, not 10
      2L -> Some(30.0),  // tie at ts 3 matches inclusively
      4L -> None))       // latest snap (45) has null rate — NOT 4.0 leaked
    assert(!out.contains(3L)) // before first snapshot: dropped (inner)
  }

  test("left as-of keeps unmatched rows with null payload") {
    val out = AsOfJoin.asof(left, right, "user_id", "ts", "snap_ts",
      Seq("rate"), inner = false)
      .collect().map(r => (r.getLong(0), Option(r.get(3)))).toMap
    assert(out(3L).isEmpty && out.size == 4)
  }

  test("plan: exactly one shuffle, partitioned by the join key") {
    val out = AsOfJoin.asof(left, right, "user_id", "ts", "snap_ts", Seq("rate"))
    val p = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"as-of join must be a single keyed shuffle\n$p")
    assert("Exchange".r.findAllIn(p).size == 1, s"no other exchanges\n$p")
  }

  test("forward as-of: earliest snapshot at-or-after, tolerance bounds the match") {
    val out = AsOfJoin.asofForward(left, right, "user_id", "ts", "snap_ts",
      Seq("rate"))
      .collect().map(r => (r.getLong(0), (Option(r.get(3)), r.getLong(4)))).toMap
    assert(out == Map(
      1L -> ((Some(100.0), 10L)), // ts 5 picks snap 10, not 3
      2L -> ((Some(30.0), 3L)),   // tie at ts 3 matches inclusively
      3L -> ((Some(30.0), 3L)))) // before first snapshot → first snapshot
    assert(!out.contains(4L)) // ts 50 is past user 2's last snapshot (45)
    // tolerance 4: event 1 (ts 5) needs snap 10 → gap 5 > 4 drops it;
    // events 2/3 match at gap 0/2
    val tol = AsOfJoin.asofForward(left, right, "user_id", "ts", "snap_ts",
      Seq("rate"), toleranceSec = Some(4L))
      .collect().map(r => r.getLong(0)).toSet
    assert(tol == Set(2L, 3L))
  }

  test("forward as-of plan: same single keyed shuffle as backward") {
    val out = AsOfJoin.asofForward(left, right, "user_id", "ts", "snap_ts",
      Seq("rate"), toleranceSec = Some(100L))
    val p = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }
}
