package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation — the canonical Structured
  * Streaming shape (readStream → withWatermark → window groupBy → append
  * sink). In append mode a window emits exactly once, when the watermark
  * passes its end, so state is bounded by |open windows × group keys| and
  * the emitted rows are final — the same contract a 100-TB ingest pipeline
  * relies on to make its hourly rollups idempotent.
  *
  * The value sum runs in decimal(18,6) (exact, order-free) so the
  * streaming result is bit-identical to the batch rollup regardless of
  * which micro-batch each event lands in.
  */
object WindowStats {

  /** Per (tumbling window, event_type): event count and exact value sum.
    * Output: (hour_start timestamp, event_type, n_events, sum_value
    * decimal). `delay` is the watermark lateness allowance. */
  def tumblingStats(stream: DataFrame, windowLen: String = "1 hour",
      delay: String = "0 seconds"): DataFrame =
    stream
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))
}
