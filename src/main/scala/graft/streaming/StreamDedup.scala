package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.TextOps

/** Streaming exact dedup of a document feed — the online twin of
  * [[graft.ops.Dedup.exactGroups]]: one row per content fingerprint survives,
  * duplicates arriving later (same batch or any later batch) are dropped.
  *
  * Two variants, picked by the state budget:
  *
  *  - [[keepFirst]] (mapGroupsWithState, no timeout): exact global dedup;
  *    state = one (fingerprint → seen) entry per distinct document ever.
  *    Within a batch the min-id row wins (matching the batch operator's
  *    deterministic representative); across batches first-batch-wins — a
  *    later duplicate can never "un-emit" an output. Use when the distinct
  *    universe fits state (or is TTL'd by an upstream retention rule).
  *  - [[keepFirstWithinWatermark]]: Spark's native
  *    `dropDuplicatesWithinWatermark` on the fingerprint; state is bounded
  *    by the watermark window — the 100 TB/unbounded-feed choice when
  *    duplicates are known to arrive close together (crawl re-fetches,
  *    retry storms).
  */
object StreamDedup {

  final case class Doc(doc_id: Long, text: String)

  /** Exact streaming dedup, min-id representative per batch, first across
    * batches. Emits (doc_id, fingerprint) for surviving rows. */
  def keepFirst(spark: SparkSession, docs: Dataset[Doc]): DataFrame = {
    import spark.implicits._
    docs
      .withColumn("fingerprint", TextOps.fingerprint(col("text")))
      .select(col("doc_id"), col("fingerprint")).as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (fp: String, it: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) {
            it.foreach(_ => ()) // drain: duplicates of an already-kept doc
            Iterator.empty
          } else {
            state.update(true)
            Iterator.single((it.map(_._1).min, fp))
          })
      .toDF("doc_id", "fingerprint")
  }

  /** Watermark-bounded dedup: duplicates separated by more than the
    * watermark may BOTH survive (the state for the first was evicted) —
    * the documented trade for bounded state. */
  def keepFirstWithinWatermark(docs: DataFrame, tsCol: String,
      textCol: String, watermark: String): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .withColumn("fingerprint", TextOps.fingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("fingerprint")
}
