package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID (marker-token heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), document fingerprinting. All pure per-row
  * Column expressions — codegen'd, shuffle-free, linear scans at any scale.
  */
object TextOps {

  /** Marker lexicons for the n-gram/token language heuristic, in priority
    * order (ties resolve to the earlier language). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "des", "et"))

  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers: _*)))

  /** Language-ID: argmax of marker counts, priority order on ties, "und"
    * when no marker hits. */
  /** Alternation of the classic UTF-8-decoded-as-Latin-1 artifacts
    * ("Ã©" for é, "â€™" for ’, …) — the cheap mojibake screen a corpus
    * hygiene pass runs before anything language-model-based. */
  val MojibakeMarkers = "Ã©|Ã¨|Ã¼|â€™|â€œ"

  /** Non-overlapping count of [[MojibakeMarkers]] in `text` — per-row,
    * codegen'd, scale-free. */
  def mojibakeCount(text: Column): Column =
    regexp_count(text, lit(MojibakeMarkers)).cast("long")

  def languageId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ws) => lang -> markerCount(text, ws) }
    val decided = scores.zipWithIndex.foldLeft(when(lit(false), lit("und"))) {
      case (acc, ((lang, s), i)) =>
        val laterBeats = scores.drop(i + 1).map(_._2 > s)
        val isMax = (s > 0) && laterBeats.foldLeft(lit(true))((c, b) => c && !b)
        acc.when(isMax, lit(lang))
    }
    decided.otherwise(lit("und"))
  }

  /** Quality score in [0,1]: length, punctuation density, stopword density,
    * and word count, combined with fixed weights. Pure per-row double
    * arithmetic (bit-identical across engines when mirrored exactly). */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val words = greatest(size(tokens(text)).cast("double"), lit(1.0))
    val punct = (len - length(regexp_replace(text, "[.,;:!?]", "")).cast("double"))
    val stop = markerCount(text, LangMarkers.flatMap(_._2)).cast("double")
    least(lit(1.0), len / 500.0) * 0.3 +
      (lit(1.0) - least(lit(1.0), punct / words)) * 0.3 +
      least(lit(1.0), stop * 5.0 / words) * 0.2 +
      least(lit(1.0), words / 100.0) * 0.2
  }

  def tokenCountWhitespace(text: Column): Column = size(tokens(text))

  /** GPT2-style pre-tokenizer pattern (contractions, letter runs, digit
    * runs, punctuation runs) — a BPE-ish proxy count. */
  val BpePattern: String = "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  // ------------------------------------------------------------- PII scrub

  /** (name, pattern, replacement) for the redaction pass — the pre-training
    * scrub for emails / SSN-shaped / US-phone-shaped / IPv4-shaped spans.
    * Patterns stay in the regex subset where Java (Spark) and RE2 (DuckDB
    * oracle) agree: ASCII classes, \b, \d, bounded repetition. Replacement
    * order: emails first, so their digit runs are never half-eaten by the
    * numeric patterns. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** All PII patterns replaced, in [[PiiPatterns]] order — a chain of
    * codegen'd regexp_replace, pure narrow per-row work. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, p, r)) => regexp_replace(c, p, r) }

  /** Occurrences of one PII pattern in the INPUT text (counted pre-redaction,
    * independently per pattern). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Luhn-validated card-number detection — the governance upgrade over a
    * bare `\d{16}` regex: a digit run is only a REAL card candidate if its
    * Luhn checksum closes, which kills ~90% of the false positives a regex
    * alone would quarantine. One narrow pass: extract 16-digit runs,
    * validate the checksum in a single array-fold expression (pure per-row
    * integer arithmetic — codegen-friendly, engine-mirrorable), emit the
    * masked tail. Output: (id, card_masked, luhn_valid), one row per
    * detected digit run. */
  def luhnCards(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    require(!docs.columns.contains("__card"),
      "luhnCards uses an internal __card column; rename the existing one")
    val dig = "CAST(substring(__card, length(__card) - i + 1, 1) AS INT)"
    docs
      .select(col(idCol),
        explode(expr(s"regexp_extract_all($textCol, '\\\\d{16}', 0)")).as("__card"))
      .select(col(idCol),
        concat(lit("************"), substring(col("__card"), 13, 4)).as("card_masked"),
        expr(s"""aggregate(sequence(1, length(__card)), 0, (acc, i) ->
          acc + (CASE WHEN i % 2 = 0
            THEN (CASE WHEN 2 * $dig > 9 THEN 2 * $dig - 9 ELSE 2 * $dig END)
            ELSE $dig END)) % 10 = 0""").as("luhn_valid"))
  }

  /** Word n-gram multiplicity stats `struct(total, n_distinct, max_count)`
    * in one pass per document — the raw counts behind repetition-based
    * quality rules (duplicate n-gram fraction, top n-gram fraction). */
  def repetitionStats(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.RepetitionStats(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), n))

  /** Per-document Deflate stats `struct(raw_bytes, compressed_bytes,
    * ratio)` — the compression-ratio quality heuristic (repetitive
    * machine text compresses low, noise compresses high; curation
    * band-passes the ratio). Not SQL-expressible: gates are rows-only. */
  def compressionStats(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.CompressionStats(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** Normalization + md5 content fingerprint (near-identity key for exact
    * dedup across whitespace/case variance). */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  def fingerprint(text: Column): Column = md5(normalized(text).cast("binary"))

  /** Light suffix stemmer over the token array — the
    * "-ing/-ed/-s (not -ss)" strip with minimum-stem guards, the
    * vocabulary-collapsing normalization a retrieval index applies before
    * counting. Rules fire first-match-only, mirrored as a CASE chain in
    * the oracle. Pure per-token expression, no UDF. */
  def stemLite(toks: Column): Column =
    transform(toks, t =>
      when(t.endsWith("ing") && length(t) > 5,
        t.substr(lit(1), length(t) - 3))
        .when(t.endsWith("ed") && length(t) > 4,
          t.substr(lit(1), length(t) - 2))
        .when(t.endsWith("s") && !t.endsWith("ss") && length(t) > 3,
          t.substr(lit(1), length(t) - 1))
        .otherwise(t))

  /** Unicode corpus hygiene: NFC canonical composition (custom expression —
    * Spark has no built-in normalizer) then strip non-whitespace C0/C1-ish
    * control characters. Case and layout are PRESERVED (this runs before,
    * not instead of, [[normalized]]). Per-row, shuffle-free. */
  def normalizeUnicode(text: Column): Column =
    regexp_replace(
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.NfcNormalize(
          org.apache.spark.sql.graft.ColumnBridge.expression(text))),
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")

  /** TF-IDF over a corpus: (id, term, tf, df, tfidf) with
    * tfidf = tf · ln(N/df), rounded to 6dp (libm last-ulp differences across
    * engines). Two hash aggregates (term counts, then document frequency),
    * plus the corpus size N computed INSIDE the plan as a broadcast 1-row
    * cross join — one job, no driver-side count() action. Shuffles by
    * (id, term) then term, linear in corpus token count. */
  def tfIdf(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
  }
}
