package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
