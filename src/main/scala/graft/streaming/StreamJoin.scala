package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the click→purchase attribution shape:
  * match each purchase to the clicks it follows within the attribution
  * window, both sides unbounded streams.
  *
  * Both inputs carry event-time watermarks and the join condition bounds
  * purchase_ts to (click_ts, click_ts + window], so Spark can size and
  * EVICT the join state: a buffered click expires once the purchase-side
  * watermark passes click_ts + window, and vice versa — state is
  * proportional to the traffic inside one watermark+window horizon, not
  * the stream's history. Without the time bound (or with only one
  * watermark) the state grows forever — the classic unbounded
  * stream-stream join failure.
  */
object StreamJoin {

  /** Inner interval join of two event streams shaped like the `events`
    * table (user_id, event_id, ts). Emits one row per (click, purchase)
    * pair with `purchase_ts` in (click_ts, click_ts + windowMinutes].
    * Works identically on batch frames (watermarks are no-ops in batch) —
    * the spec asserts stream = batch on the fixture. */
  def attribution(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int, watermark: String = "1 hour"): DataFrame = {
    require(windowMinutes > 0, "windowMinutes must be positive")
    // Watermarks require TIMESTAMP event time; NTZ parquet fixtures cast
    // through the (UTC) session zone — no-op when already zoned.
    val c = clicks.select(col("user_id"), col("event_id").as("click_id"),
        col("ts").cast("timestamp").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("__p_user"),
        col("event_id").as("purchase_id"),
        col("ts").cast("timestamp").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    c.join(p, expr(
        s"""user_id = __p_user
           |AND purchase_ts > click_ts
           |AND purchase_ts <= click_ts + INTERVAL $windowMinutes MINUTES""".stripMargin))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }
}
