package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and drop) training documents that share
  * word n-grams with an evaluation/benchmark set — the published n-gram
  * overlap decontamination scheme for pretraining corpora (exact n-gram
  * collision between train text and eval text marks the train doc
  * contaminated).
  *
  * Plan shape, 100 TB first: the train side is a narrow scan → per-doc
  * distinct shingles ([[Dedup.shingleRows]], no shuffle); the eval side is
  * a benchmark suite — thousands of documents, not billions — so its
  * shingle set is BROADCAST and the contamination check is a broadcast hash
  * join against the full-size train scan, never a shuffle of the corpus.
  * The report aggregation groups by train doc id (one map-side-combinable
  * hash aggregate over the join's hit rows only — contaminated docs are a
  * tiny fraction of the corpus by construction).
  */
object Decontaminate {

  /** One row per CONTAMINATED train doc: how many distinct n-grams it
    * shares with the eval set, how many eval docs it collides with, and
    * the sorted eval doc ids (rendered as a comma-joined string — stable
    * to compare, array-free for row-sorted dumps).
    *
    * Output: (id, n_hits, n_eval_docs, eval_ids).
    */
  def report(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val trainSh = Dedup.shingleRows(train, idCol, textCol, n)
    val evalSh = Dedup.shingleRows(eval, idCol, textCol, n)
      .select(col("id").as("eval_id"), col("s"))
    trainSh.join(broadcast(evalSh), Seq("s"))
      .groupBy(col("id"))
      .agg(
        count_distinct(col("s")).as("n_hits"),
        count_distinct(col("eval_id")).as("n_eval_docs"),
        concat_ws(",",
          sort_array(collect_set(col("eval_id").cast("string")))).as("eval_ids"))
  }

  /** Ids of contaminated train docs — a LEFT SEMI join of the train
    * shingle rows against the broadcast eval shingle set, deduplicated per
    * doc. This shape runs UNCHANGED on a streaming train side (stream-
    * static semi join + stateful dropDuplicates are both supported;
    * derived-anti and aggregation shapes are not), so streaming
    * contamination detection is this exact plan over `readStream`. */
  def flaggedIds(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val evalSh = Dedup.shingleRows(eval, idCol, textCol, n).select(col("s"))
    Dedup.shingleRows(train, idCol, textCol, n)
      .join(broadcast(evalSh), Seq("s"), "left_semi")
      .select(col("id"))
      .dropDuplicates("id")
  }

  /** The train corpus minus contaminated docs — a broadcast LEFT ANTI join
    * on the [[flaggedIds]] set (same broadcast-sized logic: the flagged
    * set is small, the corpus is not). Batch-only: the anti side derives
    * from the corpus itself, so a streaming pipeline runs [[flaggedIds]]
    * and routes/filters on the flag set in a second phase instead. */
  def clean(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val bad = flaggedIds(train, eval, idCol, textCol, n)
    train.join(broadcast(bad), train(idCol) === bad("id"), "left_anti")
  }
}
