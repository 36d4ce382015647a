package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row picks the LATEST right row with the same key
  * and right ts <= left ts (inclusive) — the join a feature store / rates
  * table / slowly-changing dimension needs against an event stream.
  *
  * Spark has no native ASOF JOIN; the naive encodings both break at scale:
  * a theta join `l.key = r.key AND r.ts <= l.ts` + groupBy-max explodes to
  * |events| x |snapshots-per-key| intermediate rows, and a per-key
  * collect+binary-search doesn't distribute. This operator instead UNIONS
  * the two streams and runs ONE window per key ordered by (ts, snapshot
  * first): a running `last(snapshot-payload, ignoreNulls)` carries each
  * snapshot forward to every later event row. Cost = one shuffle of
  * |left| + |right| rows by key + a per-key sort — the same plan shape
  * DuckDB/kdb execute natively, and it survives any events-per-key skew
  * that a range join would square.
  *
  * The snapshot payload is carried as ONE struct (payload of the latest
  * snapshot ROW), not per-column last-non-null — a null payload column in
  * the latest snapshot stays null rather than leaking the previous
  * snapshot's value.
  *
  * Ties: a snapshot AT an event's timestamp matches it (inclusive, like
  * DuckDB `ASOF JOIN ... ON l.ts >= r.ts`). The right side must be unique
  * per (key, ts) for the pick to be well-defined.
  *
  * @param inner drop left rows with no matching snapshot (DuckDB ASOF JOIN
  *              default); false keeps them with null payloads (LEFT ASOF).
  */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame, key: String, leftTs: String,
      rightTs: String, payloads: Seq[String], inner: Boolean = true): DataFrame = {
    val lCols = left.columns.toSeq
    val clash = payloads.filter(lCols.contains)
    require(clash.isEmpty,
      s"asof: payload columns ${clash.mkString(", ")} also exist on the left " +
        "side; rename them on one side first (the union would duplicate them)")
    val reserved = Seq("__ts", "__snap", "__s")
    val taken = (lCols ++ right.columns).filter(reserved.contains).distinct
    require(taken.isEmpty,
      s"asof: column names ${taken.mkString(", ")} collide with the " +
        "operator's internal columns (__ts, __snap, __s); rename them first")
    val l2 = left.select(
      lCols.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(0).as("__snap")) ++
        payloads.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val r2 = right.select(
      Seq(col(key)) ++
        lCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTs).as("__ts"), lit(1).as("__snap")) ++
        payloads.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__snap").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l2.unionByName(r2)
      .withColumn("__s", last(
        when(col("__snap") === 1, struct(payloads.map(col): _*)),
        ignoreNulls = true).over(w))
      .filter(col("__snap") === 0)
    val matched = if (inner) filled.filter(col("__s").isNotNull) else filled
    matched.select(lCols.map(col) ++ payloads.map(p => col(s"__s.$p").as(p)): _*)
  }

  /** Forward as-of join: each left row picks the EARLIEST right row with
    * the same key and right ts >= left ts (inclusive), optionally bounded
    * by `toleranceSec` (match dropped when the picked right row is further
    * than the tolerance ahead) — the "next revision / next maintenance
    * window / next price tick" lookup, DuckDB `ASOF JOIN ON l.ts <= r.ts`.
    *
    * Same single-shuffle shape as [[asof]], with the window REVERSED:
    * union both streams, order per key by (ts DESC, snapshot-first), and
    * carry the latest-seen snapshot struct — which, scanned descending, is
    * the earliest snapshot at-or-after each event. The matched right
    * timestamp rides inside the struct so the tolerance is a post-window
    * filter, never a range join.
    *
    * Inner semantics: left rows with no at-or-after match (or none within
    * tolerance) drop. Right side must be unique per (key, ts). */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payloads: Seq[String],
      toleranceSec: Option[Long] = None): DataFrame = {
    val lCols = left.columns.toSeq
    val clash = payloads.filter(lCols.contains)
    require(clash.isEmpty,
      s"asofForward: payload columns ${clash.mkString(", ")} also exist on " +
        "the left side; rename them on one side first")
    val reserved = Seq("__ts", "__snap", "__s", "__rts", "matched_ts")
    val taken = (lCols ++ right.columns).filter(reserved.contains).distinct
    require(taken.isEmpty,
      s"asofForward: column names ${taken.mkString(", ")} collide with the " +
        "operator's internal/output columns (matched_ts is appended); " +
        "rename them first")
    toleranceSec.foreach(t => require(t >= 0, s"negative tolerance: $t"))
    val l2 = left.select(
      lCols.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(0).as("__snap"),
          lit(null).cast("long").as("__rts")) ++
        payloads.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val r2 = right.select(
      Seq(col(key)) ++
        lCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTs).as("__ts"), lit(1).as("__snap"),
          col(rightTs).cast("long").as("__rts")) ++
        payloads.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").desc, col("__snap").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l2.unionByName(r2)
      .withColumn("__s", last(
        when(col("__snap") === 1,
          struct((Seq(col("__rts")) ++ payloads.map(col)): _*)),
        ignoreNulls = true).over(w))
      .filter(col("__snap") === 0)
      .filter(col("__s").isNotNull)
    val bounded = toleranceSec match {
      case Some(t) =>
        filled.filter(col("__s.__rts") - col("__ts").cast("long") <= t)
      case None => filled
    }
    bounded.select(lCols.map(col) ++ payloads.map(p => col(s"__s.$p").as(p))
      :+ col("__s.__rts").as("matched_ts"): _*)
  }
}
