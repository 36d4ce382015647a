package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shaping a document corpus into model-ready training sequences:
  *
  *  - [[chunkDocuments]]: split each document into overlapping token
  *    windows (the retrieval / long-context chunking pass) — pure narrow
  *    per-row work: tokenize once, one generator, no shuffle;
  *  - [[packSequences]]: concatenate documents (in id order, within hash
  *    shards) and assign each document its token-offset range in the packed
  *    stream — the GPT-style concat-then-chunk packing layout. One window
  *    per shard; shard count bounds the sequentialness, so at 100 TB the
  *    prefix-sum parallelism equals the shard count, not 1.
  */
object Shaping {

  /** Overlapping token windows per document. Chunks start every
    * `chunkTokens - overlap` tokens; each takes `chunkTokens` tokens (the
    * final windows are shorter where the document runs out). Documents with
    * zero tokens produce no chunks.
    *
    * Output: (id, chunk_id, chunk_tokens, chunk_text).
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got overlap=$overlap chunkTokens=$chunkTokens")
    val step = chunkTokens - overlap
    docs
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("n_toks", size(col("toks")))
      .filter(col("n_toks") > 0)
      // One generator row per chunk start (1-based); the token array is
      // evaluated once per document by the Generate node, not per chunk.
      .select(col("id"), col("toks"),
        posexplode(sequence(lit(1), col("n_toks"), lit(step)))
          .as(Seq("chunk_id", "start")))
      .select(col("id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("toks"), col("start"), lit(chunkTokens)).as("ctoks"))
      .select(col("id"), col("chunk_id"),
        size(col("ctoks")).cast("long").as("chunk_tokens"),
        concat_ws(" ", col("ctoks")).as("chunk_text"))
  }

  /** Deterministic weighted interleave of N sources into one training
    * stream — the mixing schedule: a source with weight w contributes one
    * row every 1/w "virtual seconds", so proportions follow the weights
    * and prefixes are mixed (no source-sized runs) FOR AS LONG AS EVERY
    * SOURCE STILL HAS ROWS. Once a source exhausts, the remaining stream
    * is whatever survives — a source much longer than its weight share
    * ends the stream as an unmixed tail. Callers wanting weight-true
    * proportions end to end should equalize effective lengths first
    * (e.g. [[Sampling.repeatEpochs]] on the short sources, or truncate
    * the long ones). Per shard (id hash), each source's rows rank by id
    * and take virtual time rank/w; the shard's stream is the (vtime,
    * source, id) sort order, emitted as `seq`. Shards make the schedule
    * embarrassingly parallel — one shard per trainer rank, same as
    * [[packSequences]].
    *
    * Output: (shard, source, id, seq). Weights must be positive; sources
    * are indexed by their position in the input list. */
  def interleave(sources: Seq[(org.apache.spark.sql.DataFrame, Double)],
      idCol: String, shards: Int): org.apache.spark.sql.DataFrame = {
    require(sources.nonEmpty && sources.forall(_._2 > 0.0),
      "need at least one source, all weights positive")
    require(shards > 0, "shards must be positive")
    val tagged = sources.zipWithIndex.map { case ((df, w), i) =>
      df.select(col(idCol).cast("long").as("id"))
        .withColumn("source", lit(i))
        .withColumn("shard", pmod(col("id"), lit(shards.toLong)))
        .withColumn("__w", lit(w))
    }.reduce(_ unionAll _)
    val perSource = Window.partitionBy(col("shard"), col("source"))
      .orderBy(col("id"))
    val stream = Window.partitionBy(col("shard"))
      .orderBy(col("__vt").asc, col("source").asc, col("id").asc)
    tagged
      // One exchange for both windows: hash-partitioning by shard alone
      // satisfies the (shard, source) window too (shard ⊆ its keys), so
      // the per-source rank and the stream rank run as two sorts over the
      // same exchange instead of shuffling twice.
      .repartition(col("shard"))
      .withColumn("__vt",
        row_number().over(perSource).cast("double") / col("__w"))
      .withColumn("seq", row_number().over(stream).cast("long"))
      .select(col("shard"), col("source"), col("id"), col("seq"))
  }

  /** The 32-bit multiplicative id hash shared by the shuffle/curriculum/
    * manifest family: prime-modulus reduction (keeps the ANSI product in
    * long range) then the Knuth constant, folded to 32 bits. */
  private[ops] def knuth32(id: Column): Column =
    pmod(pmod(id, lit(1000000007L)) * lit(2654435761L), lit(4294967296L))

  /** Engine-neutral string hash for the hashing-trick feature gates: left
    * fold h ← (h·31 + codepoint) mod 1e9+7 over the characters (ASCII
    * inputs — Spark's ascii and DuckDB's unicode agree there). Mirrored by
    * [[graft.queries.OracleSql.stringPolyHash]]; xxhash64/md5 would be
    * one-engine-only. */
  def stringPolyHash(s: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(s)),
        i => ascii(s.substr(i, lit(1))).cast("long")),
      lit(0L), (h, c) => pmod(h * 31L + c, lit(1000000007L)))

  /** Shard from the HIGH bits of a 32-bit hash: floor(h·shards / 2^32).
    * The low bits of a multiplicative hash are NOT mixed (the Knuth
    * constant is 1 mod 8), so `pmod(h, shards)` would deal round-robin by
    * raw id for power-of-two shard counts. */
  private[ops] def shardOf(h: Column, shards: Int): Column =
    shiftright(h * lit(shards.toLong), 32)

  /** Deterministic global shuffle — the training-order randomization pass:
    * rows are dealt into `shards` pseudo-random shards and given a
    * pseudo-random position within their shard, by the same engine-neutral
    * Knuth multiplicative hash the sampling family uses (full 32-bit value
    * here, not the permille bucket — a total order needs resolution).
    * Same rows → same order, on every run, engine, and partitioning;
    * adjacent input ids land far apart (the anti-curriculum property).
    *
    * One exchange (hash by shard) + a per-shard sort: no global total sort
    * is needed because a trainer consumes one shard per rank — the same
    * fleet seam as [[packSequences]] and [[interleave]]. Ties in the
    * 32-bit hash break by id, so the order is total and reproducible.
    *
    * Output: (shard, id, pos) with pos 1-based within shard. */
  def shuffleDeterministic(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, "shards must be positive")
    val h = knuth32(col("id"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h").asc, col("id").asc)
    df.select(col(idCol).cast("long").as("id"))
      .withColumn("__h", h)
      .withColumn("shard", shardOf(col("__h"), shards))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("shard"), col("id"), col("pos"))
  }

  /** Sequence-packing layout: documents are laid head-to-tail in id order
    * within `shards` hash shards, and each document is assigned its token
    * offset range and the fixed-length training sequences it lands in
    * (`seq_first`..`seq_last`, length `seqLen`). Documents straddle sequence
    * boundaries — exactly the concat-then-chunk layout LLM pretraining uses.
    *
    * The running sum is windowed PER SHARD: the packing is embarrassingly
    * parallel across shards, and one shard's stream is the sequential unit a
    * single trainer rank would consume. Zero-token documents are excluded
    * (they occupy no tokens).
    *
    * Output: (shard, id, n_tokens, start_off, seq_first, seq_last).
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int, shards: Int): DataFrame = {
    require(seqLen > 0 && shards > 0, "seqLen and shards must be positive")
    val counted = docs
      .select(col(idCol).as("id"),
        TextOps.tokenCountWhitespace(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("shard", pmod(col("id"), lit(shards.toLong)))
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counted
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("shard"), col("id"), col("n_tokens"), col("start_off"),
        (col("start_off") - pmod(col("start_off"), lit(seqLen.toLong)))
          .divide(lit(seqLen.toLong)).cast("long").as("seq_first"),
        {
          val endOff = col("start_off") + col("n_tokens") - 1
          (endOff - pmod(endOff, lit(seqLen.toLong)))
            .divide(lit(seqLen.toLong)).cast("long").as("seq_last")
        })
  }

  /** Length-bucketed curriculum batching: documents bucket by token count
    * (bucket = ⌊n_tokens / bucketTokens⌋ — similar-length docs train
    * together, minimizing padding), order pseudo-randomly WITHIN a bucket
    * (hash, then id — curriculum fixes the bucket order, not the document
    * order), and cut into fixed-size batches.
    *
    * Batches form per (bucket, shard): the window partitions are bounded
    * by shard count × bucket count, never one giant per-bucket partition —
    * the same trainer-rank seam as [[packSequences]]. The final batch of
    * each (bucket, shard) may be short; trainers drop or pad it.
    *
    * Output: (id, n_tokens, bucket, shard, batch, pos_in_batch). */
  def curriculumBatches(docs: DataFrame, idCol: String, textCol: String,
      bucketTokens: Int, batchSize: Int, shards: Int): DataFrame = {
    require(bucketTokens >= 1, s"bucketTokens must be >= 1, got $bucketTokens")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(shards > 0, "shards must be positive")
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("__h").asc, col("id").asc)
    docs
      .select(col(idCol).cast("long").as("id"),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("bucket",
        (col("n_tokens") - pmod(col("n_tokens"), lit(bucketTokens.toLong)))
          .divide(lit(bucketTokens.toLong)).cast("long"))
      .withColumn("__h", knuth32(col("id")))
      .withColumn("shard", shardOf(col("__h"), shards))
      .withColumn("__pos", row_number().over(w).cast("long"))
      .select(col("id"), col("n_tokens"), col("bucket"), col("shard"),
        ((col("__pos") - 1) - pmod(col("__pos") - 1, lit(batchSize.toLong)))
          .divide(lit(batchSize.toLong)).cast("long").as("batch"),
        (pmod(col("__pos") - 1, lit(batchSize.toLong)) + 1).as("pos_in_batch"))
  }

  /** Training-export manifest: per-shard row/token totals, id range, and an
    * order-free id checksum — the sidecar a consumer uses to validate a
    * delivered shard set without re-reading payloads. One hash aggregate;
    * every statistic is commutative (sum/min/max/count), so it partial-
    * aggregates map-side and never collects rows.
    *
    * The checksum sums 32-bit id hashes into a long: overflow would need
    * ~2^31 rows in ONE shard, and ANSI mode fails loudly rather than
    * wrapping if a shard ever gets there.
    *
    * Output: (shard, n_rows, n_tokens, min_id, max_id, id_checksum). */
  def exportManifest(docs: DataFrame, idCol: String, textCol: String,
      shards: Int): DataFrame = {
    require(shards > 0, "shards must be positive")
    docs
      .select(col(idCol).cast("long").as("id"),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_toks"))
      .withColumn("__h", knuth32(col("id")))
      .withColumn("shard", shardOf(col("__h"), shards))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("n_toks")).as("n_tokens"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"),
        sum(col("__h")).as("id_checksum"))
  }

  /** One packed-bin assignment row. */
  final case class PackedDoc(shard: Long, bin: Long, id: Long,
      n_tokens: Long, bin_off: Long)

  /** First-fit-decreasing BIN packing of whole documents into fixed
    * `seqLen`-token bins, per shard — the padding-minimizing alternative
    * to [[packSequences]]' concat-then-chunk: no document straddles a
    * sequence boundary, and FFD is within 11/9·OPT + 6/9 of the optimal
    * bin count (Dósa 2007). The greedy is inherently SEQUENTIAL per
    * shard, so this is the legitimate `mapPartitions` case: rows sort
    * (shard, n_tokens desc, id) inside each of exactly `shards`
    * partitions and a per-shard scan maintains open-bin residuals
    * (memory ∝ open bins; index residuals by size if a shard's bin count
    * outgrows a linear scan). Deterministic: the sort order fixes the
    * greedy's every choice. Documents longer than seqLen fail loudly —
    * chunk them first ([[chunkDocuments]]); empty documents drop.
    * Output: (shard, bin, id, n_tokens, bin_off). */
  def packBinsFfd(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int, shards: Int): DataFrame = {
    require(seqLen > 0 && shards > 0, "seqLen and shards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val counted = docs
      .select(col(idCol).cast("long").as("id"),
        TextOps.tokenCountWhitespace(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("shard", pmod(col("id"), lit(shards.toLong)))
    counted
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard").asc, col("n_tokens").desc, col("id").asc)
      .as[(Long, Long, Long)] // (id, n_tokens, shard) — select order above
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var bins = scala.collection.mutable.ArrayBuffer[Long]() // residuals
        it.map { case (id, n, shard) =>
          if (shard != curShard) { curShard = shard; bins = bins.empty }
          if (n > seqLen) throw new IllegalArgumentException(
            s"doc $id has $n tokens > seqLen $seqLen; chunk before packing")
          var b = 0
          while (b < bins.length && bins(b) < n) b += 1
          if (b == bins.length) bins += seqLen.toLong
          val off = seqLen - bins(b)
          bins(b) -= n
          PackedDoc(shard, b.toLong, id, n, off)
        }
      }
      .toDF()
  }

  /** T5-style span-corruption example construction (Raffel et al. 2020):
    * replace deterministic token spans with numbered sentinels in the
    * input and emit the masked spans (each prefixed by its sentinel, plus
    * the terminal sentinel) as the target.
    *
    * The mask schedule is the closed form `p mod W ∈ [S, W)` with
    * `W = spanLen·period`, `S = spanLen·(period−1)` — one length-spanLen
    * span every W tokens (mask rate 1/period, defaults 3/21 ≈ 14%), span
    * k covering positions `[kW+S, kW+W)`. A deterministic schedule instead
    * of T5's sampled one keeps the builder replayable and oracle-checkable;
    * the example SHAPE (sentinel numbering, span splicing, terminal
    * sentinel) is exactly the paper's.
    *
    * Pure narrow per-document array expressions — tokenize once, two
    * transform/filter/join chains, zero shuffles at any corpus size.
    * Output: (id, n_tokens, n_spans, input_text, target_text). */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 3, period: Int = 7): DataFrame = {
    require(spanLen >= 1 && period >= 2,
      s"need spanLen >= 1 and period >= 2, got ($spanLen, $period)")
    require(!docs.columns.contains("__toks"),
      "spanCorruption uses an internal __toks column; rename the existing one")
    val W = spanLen * period
    val S = spanLen * (period - 1)
    val seq = s"slice(sequence(0, size(__toks)), 1, size(__toks))"
    val inputExpr =
      s"""array_join(filter(transform($seq, p -> CASE
         |  WHEN p % $W < $S THEN element_at(__toks, p + 1)
         |  WHEN p % $W = $S THEN concat('<extra_id_', CAST(p div $W AS STRING), '>')
         |  ELSE CAST(NULL AS STRING) END), x -> x IS NOT NULL), ' ')""".stripMargin
    val targetCore =
      s"""array_join(filter(transform($seq, p -> CASE
         |  WHEN p % $W = $S THEN concat('<extra_id_', CAST(p div $W AS STRING), '> ',
         |    element_at(__toks, p + 1))
         |  WHEN p % $W > $S THEN element_at(__toks, p + 1)
         |  ELSE CAST(NULL AS STRING) END), x -> x IS NOT NULL), ' ')""".stripMargin
    val nSpans = s"size(filter($seq, p -> p % $W = $S))"
    docs
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .select(col(idCol).as("id"),
        expr("size(__toks)").cast("long").as("n_tokens"),
        expr(nSpans).cast("long").as("n_spans"),
        expr(inputExpr).as("input_text"),
        expr(s"concat($targetCore, CASE WHEN $targetCore = '' THEN '' ELSE ' ' END, " +
          s"'<extra_id_', CAST($nSpans AS STRING), '>')").as("target_text"))
  }

  /** Fill-in-the-middle example builder (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle"): ~90% of documents
    * are rearranged into the PSM layout — `<fim_prefix> P <fim_suffix> S
    * <fim_middle> M` — the rest pass through unchanged (the paper's AR
    * fraction, which preserves left-to-right competence).
    *
    * The FIM coin and both token split points come from the engine-neutral
    * Knuth hash of the id (high-bits range reduction, the [[shardOf]]
    * device — NOT `mod`, whose low bits the multiplicative constant leaves
    * unmixed), so the transform is a pure deterministic per-row map:
    * tokenize once, three `slice`s, one concat — zero shuffles, replayable
    * on any engine.
    *
    * Split schedule: p1 uniform on [0, n], middle length uniform on
    * [0, n - p1] — every (prefix, middle, suffix) composition with empty
    * parts included, matching the paper's uniform character-split applied
    * at token granularity.
    *
    * Output: (id, n_tokens, mode, split_at, mid_len, text_fim). */
  def fillInMiddle(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    require(!docs.columns.contains("__toks"),
      "fillInMiddle uses an internal __toks column; rename the existing one")
    docs
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("__h1", knuth32(col(idCol).cast("long")))
      .withColumn("__h2", knuth32(col(idCol).cast("long") + lit(1000003L)))
      .withColumn("__fim", shiftright(col("__h1") * lit(10L), 32) < 9L)
      .withColumn("__p1", shiftright(col("__h1") * (col("__n") + 1L), 32))
      .withColumn("__l",
        shiftright(col("__h2") * (col("__n") - col("__p1") + 1L), 32))
      .select(col(idCol).as("id"), col("__n").as("n_tokens"),
        when(col("__fim"), lit("psm")).otherwise(lit("ar")).as("mode"),
        when(col("__fim"), col("__p1")).otherwise(lit(-1L)).as("split_at"),
        when(col("__fim"), col("__l")).otherwise(lit(-1L)).as("mid_len"),
        when(col("__fim"), array_join(concat(
            array(lit("<fim_prefix>")),
            expr("slice(__toks, 1, CAST(__p1 AS INT))"),
            array(lit("<fim_suffix>")),
            expr("slice(__toks, CAST(__p1 + __l + 1 AS INT), " +
              "CAST(__n - __p1 - __l AS INT))"),
            array(lit("<fim_middle>")),
            expr("slice(__toks, CAST(__p1 + 1 AS INT), CAST(__l AS INT))")), " "))
          .otherwise(array_join(col("__toks"), " ")).as("text_fim"))
  }
}
