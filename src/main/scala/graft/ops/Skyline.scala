package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2D Pareto frontier (skyline): the rows no other row beats on BOTH
  * dimensions — the classic multi-objective "best tradeoffs" report
  * (price vs quality, cost vs coverage). Dominance is strict: p dominates
  * q iff p ≥ q on both dims and > on at least one; rows tied on both
  * dims are mutually undominated and all survive.
  *
  * Distributed shape (exact, never all-pairs): over DISTINCT points, a
  * sort-scan computes a skyline in one pass — order by (x desc, y desc)
  * and keep a point iff its y strictly exceeds the running max y of all
  * earlier points. Pass 1 runs that scan per hash bucket (a global
  * skyline point is undominated everywhere, so it survives its bucket);
  * pass 2 re-scans the union of bucket survivors — a set bounded by the
  * per-bucket frontier sizes, orders of magnitude smaller than the
  * input — in a single documented task. The input is never compared
  * pairwise (the NOT EXISTS formulation the oracle uses is O(N²) and
  * exists only as the cross-engine check).
  */
object Skyline {

  /** The skyline POINT set of `df` over (xCol, yCol), both maximized:
    * (xCol, yCol) rows, one per distinct surviving point. */
  def frontierPoints(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    Seq("__b", "__pmax").foreach { c =>
      require(!df.columns.contains(c),
        s"frontierPoints uses an internal $c column; rename the existing one")
    }
    def scan(pts: DataFrame, part: Seq[String]): DataFrame = {
      val w = Window.partitionBy(part.map(col): _*)
        .orderBy(col(xCol).desc, col(yCol).desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      pts.withColumn("__pmax", max(col(yCol)).over(w))
        .filter(col("__pmax").isNull || col(yCol) > col("__pmax"))
        .drop("__pmax")
    }
    val distinctPts = df.select(col(xCol), col(yCol)).distinct()
    val local = scan(distinctPts.withColumn("__b",
      pmod(hash(col(xCol), col(yCol)), lit(buckets))), Seq("__b")).drop("__b")
    // Survivor set is frontier-sized — the single-task final scan is the
    // documented small-side merge, not a scale trap.
    scan(local.withColumn("__b", lit(0)), Seq("__b")).drop("__b")
  }

  /** All input ROWS attaining a skyline point (ids ride along; rows tied
    * on both dims all survive, matching strict dominance). */
  def frontierMembers(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 64): DataFrame =
    df.join(broadcast(frontierPoints(df, xCol, yCol, buckets)),
      Seq(xCol, yCol), "left_semi")
}
