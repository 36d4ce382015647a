package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Preference-pair construction for reward-model / DPO training: from a
  * table of scored candidate completions, emit one (chosen, rejected) pair
  * per prompt group — the highest- and lowest-scored candidates.
  *
  * Plan shape: ONE bounded [[TopKAgg]] aggregate pass (k=1 in each
  * direction) — map-side partial combining, so a prompt's candidates never
  * gather in a single window task; groups with hot prompts (thousands of
  * sampled completions) cost the same as cold ones. Deterministic
  * tiebreaks: equal scores resolve to the LOWEST candidate id on both
  * ends; groups with <2 candidates, or where ties collapse chosen and
  * rejected onto the same row, emit nothing.
  */
object Preference {

  /** @return (grp, chosen_id, rejected_id, chosen_score, rejected_score,
    *         margin), scores/margin rounded to 6dp. */
  def pairs(candidates: DataFrame, groupCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    val scored = candidates.select(col(groupCol).as("grp"),
      col(idCol).as("id"), col(scoreCol).cast("double").as("score"))
    // topK orders (score DESC, id ASC): best = topK(score); worst =
    // topK(-score) — its stored score is the NEGATED minimum.
    scored.groupBy(col("grp"))
      .agg(TopKAgg.topK(col("score"), col("id"), 1).as("__b"),
        TopKAgg.topK(-col("score"), col("id"), 1).as("__w"),
        count(lit(1)).as("__n"))
      .filter(col("__n") >= 2 &&
        col("__b")(0).getField("id") =!= col("__w")(0).getField("id"))
      .select(col("grp"),
        col("__b")(0).getField("id").as("chosen_id"),
        col("__w")(0).getField("id").as("rejected_id"),
        round(col("__b")(0).getField("score"), 6).as("chosen_score"),
        round(-col("__w")(0).getField("score"), 6).as("rejected_score"),
        round(col("__b")(0).getField("score") +
          col("__w")(0).getField("score"), 6).as("margin"))
  }

  /** Bradley–Terry strength fit from a directed win-count matrix via
    * `iters` fixed MM iterations (Hunter 2004): sᵢ ← Wᵢ / Σ_{j≠i}
    * N_ij/(sᵢ+sⱼ), renormalized to Σs = 1 each round — the aggregation
    * step that turns pairwise preference judgments (RLHF comparisons,
    * arena battles) into a per-arm scalar reward.
    *
    * The input-scale work is the ONE distributed aggregate building the
    * win matrix; the matrix itself is bounded by |arms|² (guarded), so
    * the MM loop runs driver-local on the collected matrix — the same
    * Lloyd shape as the IVF k-means trainer, where iteration cost must
    * not depend on the judgment count. Determinism: the recurrence is
    * replayed with EXACT decimal sums of 12dp-rounded terms (BigDecimal
    * HALF_UP — bit-identical to Spark's `round`/decimal cast) and double
    * divisions, so a SQL engine unrolling the same recurrence lands on
    * identical bits — no seed, no convergence test, fixed iterations.
    *
    * @param wins one row per ordered pair: `iCol` (a string arm id) beat
    *             `jCol` `nCol` times; absent pairs are N_ij = 0.
    * @return (arm, n_wins, n_games, strength) — strength 6dp, Σ≈1. */
  def bradleyTerry(wins: DataFrame, iCol: String, jCol: String,
      nCol: String, iters: Int = 12): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50], got $iters")
    import java.math.{BigDecimal => JBD, RoundingMode}
    val spark = wins.sparkSession
    val w = wins.select(col(iCol).cast("string").as("i"),
      col(jCol).cast("string").as("j"), col(nCol).cast("long").as("n"))
    val games = w.select(col("i"), col("j"), col("n"))
      .union(w.select(col("j").as("i"), col("i").as("j"), col("n")))
      .groupBy(col("i"), col("j")).agg(sum(col("n")).as("N"))
    // Bounded collect: |arms|² pairs, NOT judgments (they were reduced by
    // the aggregate above). The guard makes an oversized arm set loud.
    val gRows = games.select(col("i"), col("j"), col("N"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(gRows.length <= (1 << 20),
      s"bradleyTerry: ${gRows.length} arm pairs exceed the driver bound")
    val wMap = w.groupBy(col("i")).agg(sum(col("n")).as("W"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val arms = gRows.flatMap(g => Seq(g._1, g._2)).distinct.sorted
    // Spark's round(double, s): BigDecimal.valueOf → setScale HALF_UP;
    // its double→decimal(28,12) cast does the same. Mirror both exactly.
    def rd(x: Double, s: Int): JBD =
      JBD.valueOf(x).setScale(s, RoundingMode.HALF_UP)
    var s = arms.map(_ -> JBD.ONE.setScale(12)).toMap
    for (_ <- 1 to iters) {
      // Exact decimal sums: addition order can't matter.
      val den = gRows.groupBy(_._1).map { case (i, pairs) =>
        i -> pairs.map { case (_, j, nij) =>
          rd(nij.toDouble / (s(i).doubleValue + s(j).doubleValue), 12)
        }.reduce(_ add _)
      }
      val s1 = arms.map { i =>
        i -> rd(wMap.getOrElse(i, 0L).toDouble / den(i).doubleValue, 12)
      }.toMap
      val tot = s1.values.reduce(_ add _)
      s = arms.map(i => i -> rd(s1(i).doubleValue / tot.doubleValue, 12)).toMap
    }
    val nGames = gRows.groupBy(_._1).map { case (i, ps) => i -> ps.map(_._3).sum }
    val out = arms.map { i =>
      (i, wMap.getOrElse(i, 0L), nGames(i),
        rd(s(i).doubleValue, 6).doubleValue)
    }
    spark.createDataFrame(out)
      .toDF("arm", "n_wins", "n_games", "strength")
  }
}
