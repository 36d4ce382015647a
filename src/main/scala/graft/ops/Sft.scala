package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT / chat-tuning data shaping: turn an event-shaped utterance log into
  * per-turn training examples, each carrying its rolling in-conversation
  * context — the flatten step between raw dialogue logs and a
  * (context, response) fine-tuning table.
  *
  * ONE conversation-keyed exchange feeds both the turn numbering and the
  * bounded context frame (ROWS BETWEEN contextTurns PRECEDING AND 1
  * PRECEDING) — context size is capped, so state per row is O(contextTurns
  * × turn length) regardless of conversation length, and a million-turn
  * conversation never materializes its full history per row.
  */
object Sft {

  /** @return (conv_id, turn_idx ≥ 1, role, context — the previous
    *         `contextTurns` utterances joined with " | ", "" for the first
    *         turn — and response). */
  def turnExamples(utterances: DataFrame, convCol: String, tsCol: String,
      tieCol: String, roleCol: String, textCol: String,
      contextTurns: Int): DataFrame = {
    require(contextTurns > 0, s"contextTurns must be positive: $contextTurns")
    val base = utterances.select(col(convCol).as("conv_id"),
      col(tsCol).as("__ts"), col(tieCol).as("__tie"),
      col(roleCol).as("role"), col(textCol).as("__text"))
    val order = Window.partitionBy(col("conv_id"))
      .orderBy(col("__ts").asc, col("__tie").asc)
    val frame = order.rowsBetween(-contextTurns, -1)
    base
      .withColumn("turn_idx", row_number().over(order).cast("long"))
      .withColumn("context",
        concat_ws(" | ", collect_list(col("__text")).over(frame)))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("context"),
        col("__text").as("response"))
  }
}
