package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, bucketized.
  *
  * Spark plans a raw `p BETWEEN lo AND hi` join as BroadcastNestedLoopJoin
  * (every point × every interval) — O(|P|·|I|) work that is already hopeless
  * at thousands of intervals. The standard rewrite: quantize the range
  * dimension into fixed-width buckets, replicate each interval into the
  * buckets it covers, equi-join point-bucket = interval-bucket, then apply
  * the exact BETWEEN as a post-filter. Work becomes
  * |P| + Σ(interval_len/W + 1) shuffled rows and only same-bucket pairs are
  * compared — the same shape a 1000-executor cluster wants (shuffle by
  * bucket ≙ co-partition by time slice).
  *
  * A (point, interval) match pair appears exactly once: the point lives in
  * ONE bucket, and the interval's replica set contains that bucket at most
  * once — no post-dedup needed.
  *
  * Pick `bucketWidth` near the typical interval length: wider buckets mean
  * fewer interval replicas but more non-matching same-bucket pairs; narrower
  * the reverse. Heavy overlap piling many intervals onto the same time slice
  * is the skew case — AQE skew-join handles the hot buckets, or shrink W.
  */
object RangeJoin {

  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  /** All (point row ++ interval row) pairs with
    * `lo <= point <= hi` (inclusive both ends). Column sets must be
    * disjoint; `__bucket` is reserved. */
  def bucketed(points: DataFrame, intervals: DataFrame, pointCol: String,
      loCol: String, hiCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"range join column collision: ${overlap.mkString(", ")}; rename first")
    require(!(points.columns ++ intervals.columns).contains("__bucket"),
      "__bucket is reserved by the range join; rename the existing column")
    val p = points.withColumn("__bucket", floorDiv(col(pointCol), bucketWidth))
    val i = intervals.withColumn("__bucket",
      explode(sequence(floorDiv(col(loCol), bucketWidth),
        floorDiv(col(hiCol), bucketWidth))))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** INTERVAL-OVERLAP join: all (left row ++ right row) pairs whose
    * closed intervals [lLo, lHi] and [rLo, rHi] intersect — the
    * session-vs-maintenance-window / promo-vs-order-activity shape that a
    * raw `lLo <= rHi AND rLo <= lHi` theta join would plan as a nested
    * loop. Same bucketization as [[bucketed]], replicating BOTH sides
    * across the buckets they cover; a matching pair shares every bucket of
    * its (non-empty) intersection, so each pair is counted ONCE by keeping
    * only the intersection's FIRST bucket (`bucket == ⌊max(lLo,rLo)/W⌋`) —
    * an arithmetic dedup, not a distinct-shuffle. Work is
    * Σ(len/W + 1) replicated rows per side, compared only within a bucket;
    * hot buckets (many long overlapping intervals on one time slice) are
    * the skew case — AQE skew-join splits them, or shrink W. */
  def overlapBucketed(left: DataFrame, lLoCol: String, lHiCol: String,
      right: DataFrame, rLoCol: String, rHiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"overlap join column collision: ${overlap.mkString(", ")}; rename first")
    require(!(left.columns ++ right.columns).contains("__bucket"),
      "__bucket is reserved by the overlap join; rename the existing column")
    def replicated(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bucket",
        explode(sequence(floorDiv(col(lo), bucketWidth),
          floorDiv(col(hi), bucketWidth))))
    replicated(left, lLoCol, lHiCol)
      .join(replicated(right, rLoCol, rHiCol), Seq("__bucket"))
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol) &&
        col("__bucket") === floorDiv(greatest(col(lLoCol), col(rLoCol)), bucketWidth))
      .drop("__bucket")
  }
}
