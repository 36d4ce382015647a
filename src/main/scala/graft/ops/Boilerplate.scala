package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4-style boilerplate removal: drop every fixed-width token segment whose
  * exact text recurs across more than `maxDocFreq` distinct documents
  * (navigation chrome, cookie banners, license footers), then reassemble
  * each document from its surviving segments in order.
  *
  * Scale shape (the published C4 / RefinedWeb pass, re-expressed as two
  * hash shuffles):
  *
  *  1. segmenting is pure narrow per-row work (tokenize once, one
  *     generator row per W-token block);
  *  2. the document-frequency aggregate ships only (fingerprint, id) pairs
  *     — never segment text — and partial-aggregates map-side;
  *  3. the boilerplate set (doc_freq > K) is a tiny fraction of distinct
  *     segments, so the flagging join is a join against a SMALL relation
  *     keyed by fingerprint (AQE broadcasts it when it fits);
  *  4. reassembly is one aggregate keyed by document id — collect is
  *     bounded by a single document's segment count, never the corpus.
  */
object Boilerplate {

  /** Non-overlapping `width`-token segments per document (the final segment
    * keeps whatever tokens remain). Zero-token documents produce no rows.
    *
    * Output: (id, seg_idx 0-based, seg). */
  def segments(docs: DataFrame, idCol: String, textCol: String,
      width: Int): DataFrame = {
    require(width >= 1, s"segment width must be >= 1, got $width")
    docs
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("n_toks", size(col("toks")))
      .filter(col("n_toks") > 0)
      .select(col("id"), col("toks"),
        posexplode(sequence(lit(1), col("n_toks"), lit(width)))
          .as(Seq("seg_idx", "start")))
      .select(col("id"), col("seg_idx").cast("long").as("seg_idx"),
        concat_ws(" ", slice(col("toks"), col("start"), lit(width))).as("seg"))
  }

  /** Remove segments shared by more than `maxDocFreq` distinct documents
    * and reassemble. A document whose every segment is boilerplate stays in
    * the output with an empty `text_clean` (the caller decides whether to
    * drop empties — that is a quality filter, not dedup).
    *
    * `text_clean` is reassembled in TOKEN-NORMALIZED space (lowercased,
    * single-space joined — the same normalization the segment matching
    * runs on): original casing and whitespace are NOT preserved. Callers
    * needing the raw text should treat the output as a keep/drop mask
    * (join `n_kept`/segment flags back to the source) rather than a
    * replacement text column.
    *
    * Output: (id, n_segments, n_kept, text_clean). */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      width: Int, maxDocFreq: Int): DataFrame = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    // The segment rows feed BOTH the frequency aggregate and the flag join;
    // persist so the tokenize+explode subtree runs once (the widen
    // barrier's nondeterministic filter would defeat exchange reuse).
    val seg = segments(docs, idCol, textCol, width)
      .withColumn("fp", md5(col("seg").cast("binary")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Distinct-doc frequency per segment fingerprint: the shuffle carries
    // 16-byte fingerprints + ids only. Only fingerprints OVER the threshold
    // survive into the join side.
    val boiler = seg.select(col("fp"), col("id"))
      .groupBy(col("fp")).agg(countDistinct(col("id")).as("doc_freq"))
      .filter(col("doc_freq") > maxDocFreq)
      .select(col("fp"), lit(true).as("is_bp"))
    seg.join(boiler, Seq("fp"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_segments"),
        count(when(col("is_bp").isNull, lit(1))).as("n_kept"),
        // Deterministic reassembly: collect surviving (seg_idx, seg)
        // structs, sort by the unique seg_idx, join. Order-free input,
        // total output order.
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("is_bp").isNull, struct(col("seg_idx"), col("seg"))))),
          s => s.getField("seg"))).as("text_clean"))
  }
}
