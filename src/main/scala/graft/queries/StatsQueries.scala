package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.table

/** Statistical aggregates (extension — SURVEY notes the reference has none):
  * exact interpolated percentiles and variance/stddev. Cross-engine
  * determinism: quantities are integer-valued doubles so percentile
  * interpolation is exact; variance uses the explicit sum/sum-of-squares
  * formula over exactly-representable sums (Welford streaming accumulation
  * is addition-order dependent and is avoided).
  */
object StatsQueries {

  def family: QueryFamily = QueryFamily("stats", queries, oracles)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_quantity_stats" -> ((s, dir) => {
      val n = count(lit(1)).cast("double")
      val sx = sum(col("l_quantity"))                      // ints-in-doubles: exact
      val sxx = sum(col("l_quantity") * col("l_quantity")) // ≤ 2^53: exact
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
          percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
          round((sxx - sx * sx / n) / (n - 1.0), 6).as("var_qty"),
          round(sqrt((sxx - sx * sx / n) / (n - 1.0)), 6).as("stddev_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
    }),

    // Rollup hierarchy + distinct aggregation (subtotal rows carry nulls).
    "agg_rollup_distinct" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          sum(col("l_quantity")).as("sum_qty"))),

    // Sketch aggregates next to their exact twins: HyperLogLog++ distinct
    // (one fixed-size sketch per group merged map-side — the 100 TB distinct
    // count; exact countDistinct needs a second shuffle of the full key set)
    // and approximate percentile. Rows-only gate (HLL/KLL register states
    // are not SQL-expressible); StatsSpec bounds the error vs the exact
    // columns emitted alongside.
    "agg_sketch_accuracy" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("exact_distinct"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("hll_distinct"),
          percentile(col("l_quantity"), lit(0.5)).as("exact_p50"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(1000))
            .as("approx_p50"))))

  def oracles: Map[String, String] = Map(
    "agg_quantity_stats" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS median_qty,
        | quantile_cont(l_quantity, 0.9) AS p90_qty,
        | round((sum(l_quantity*l_quantity) - sum(l_quantity)*sum(l_quantity)/CAST(count(*) AS DOUBLE))
        |   / (CAST(count(*) AS DOUBLE) - 1.0), 6) AS var_qty,
        | round(sqrt((sum(l_quantity*l_quantity) - sum(l_quantity)*sum(l_quantity)/CAST(count(*) AS DOUBLE))
        |   / (CAST(count(*) AS DOUBLE) - 1.0)), 6) AS stddev_qty,
        | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    "agg_rollup_distinct" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        | CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        | sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)
}
