package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget allocation across corpus sources — the mixing step that
  * turns target weights into per-source sampling plans: each source gets
  * `min(available_i, t · w_i)` tokens, with the water level `t` chosen so
  * allocations sum to the budget (sources too small for their target
  * weight saturate, and their leftover flows to the rest — water-filling).
  *
  * The level has a closed order-statistics form, so the whole op is ONE
  * window over the |sources| aggregate rows (driver-free, no fixed-point
  * loop): sort sources by capacity ratio c_i = avail_i/w_i ascending; walk
  * k = 0, 1, … taking t_k = (B − Σ_{i≤k} avail_i) / (W − Σ_{i≤k} w_i); the
  * level is the first t_k at or below the next row's c — i.e. the first
  * row whose c_i ≥ t computed with all earlier (smaller-capacity) rows
  * saturated. The heavy work is the upstream per-source token aggregate
  * (map-side combined); the window runs over a handful of source rows.
  */
object Mixture {

  /** @param perSource one row per source: (grpCol, availCol, weightCol) —
    *                  integer token counts and integer weights.
    * @param budgetFrac budget = ⌊budgetFrac · Σ avail⌋, must be < 1 so an
    *                  unsaturated source always exists.
    * @return (grp, avail, weight, alloc, sampling_rate) — alloc summing to
    *         the budget up to ≤|sources| floor dust. */
  def waterFill(perSource: DataFrame, grpCol: String, availCol: String,
      weightCol: String, budgetFrac: Double): DataFrame = {
    require(budgetFrac > 0.0 && budgetFrac < 1.0,
      s"budgetFrac must be in (0,1): $budgetFrac")
    val base = perSource.select(col(grpCol).as("grp"),
      col(availCol).cast("long").as("avail"),
      col(weightCol).cast("long").as("w"))
    val tot = base.agg(sum(col("avail")).as("__A"), sum(col("w")).as("__W"))
    // saturation-order prefix totals via the two-pass distributed scan
    // (exact long sums), never a whole-frame window — the source table
    // is usually tiny, but the op is public and must hold at any width
    val run = Ranking.prefixSum(
        base.crossJoin(broadcast(tot))
          .withColumn("__B",
            floor(lit(budgetFrac) * col("__A").cast("double")).cast("long"))
          .withColumn("__c",
            col("avail").cast("double") / col("w").cast("double")),
        Seq(col("__c").asc, col("grp").asc), Seq("avail", "w"))
      .withColumn("__prefA", col("cum_avail"))
      .withColumn("__prefW", col("cum_w"))
      // level candidate with every EARLIER row saturated
      .withColumn("__t",
        (col("__B") - (col("__prefA") - col("avail"))).cast("double") /
          (col("__W") - (col("__prefW") - col("w"))).cast("double"))
    val level = run.filter(col("__c") >= col("__t"))
      .orderBy(col("__c").asc, col("grp").asc).limit(1)
      .select(col("__t").as("__level"))
    run.crossJoin(broadcast(level))
      .select(col("grp"), col("avail"), col("w").as("weight"),
        least(col("avail"),
          floor(col("__level") * col("w").cast("double")).cast("long")).as("alloc"))
      .withColumn("sampling_rate",
        round(col("alloc").cast("double") / col("avail").cast("double"), 6))
  }

  /** [[waterFill]] over a document corpus: per-source whitespace token
    * totals as availability. */
  def waterFillTokens(spark: SparkSession, docs: DataFrame, sourceCol: String,
      textCol: String, weight: org.apache.spark.sql.Column,
      budgetFrac: Double): DataFrame = {
    val tok = size(filter(split(col(textCol), "\\s+"), t => t =!= "")).cast("long")
    val perSource = docs
      .groupBy(col(sourceCol).as("grp"))
      .agg(sum(tok).as("avail"))
      .withColumn("w", weight)
    waterFill(perSource, "grp", "avail", "w", budgetFrac)
  }
}
