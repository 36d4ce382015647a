package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

import graft.clean.{Cleaning, Rules}

/** Structured Streaming variants (SURVEY §2.10 notes streaming is NOT
  * required for reference parity — the reference's 100k-row chunk loop is an
  * out-of-core batch tactic. These mirror that tactic as real streams):
  *
  *  - `hourlyStats`: event-time windowed aggregation with a watermark over
  *    an events-shaped stream (late data dropped past 1 hour);
  *  - `cleanStream`: the full clean+rules pass applied per micro-batch via
  *    foreachBatch — a micro-batch IS the reference's "chunk", so chunk
  *    semantics (per-chunk dedup included) carry over verbatim, while state
  *    stays bounded for an unbounded file feed.
  */
object CleanStream {

  /** Event-time hourly stats with watermark (append mode capable).
    * Event time must be TIMESTAMP for the watermark: parquet fixtures
    * written without isAdjustedToUTC surface as TIMESTAMP_NTZ, which
    * `withWatermark` rejects — cast via the (UTC) session zone, a no-op
    * for already-zoned inputs and identical wall-clock bucketing in the
    * batch twin. */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))

  /** Per-micro-batch clean: each batch flows through the identical batch
    * library code (Cleaning.cleanAll + Rules), then `onBatch` receives the
    * clean and violation frames — the streaming twin of
    * clean_large_file_in_chunks' per-chunk body (cleaning_utils.py:163-206). */
  def cleanStream(raw: DataFrame)(
      onBatch: (DataFrame, DataFrame, Long) => Unit): DataStreamWriter[Row] =
    raw.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val tagged = Rules.tagViolations(Cleaning.cleanAll(batch)).cache()
        try {
          val (clean, bad) = Rules.split(tagged)
          onBatch(clean, bad, id)
        } finally tagged.unpersist()
      }

  /** File-source stream of canonical all-string CSVs (the extracted-CSV
    * directory as an unbounded feed). */
  def canonicalCsvStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .option("header", "true")
      .schema(graft.core.Schemas.canonicalIngest)
      .csv(dir)
}
