package graft.enrich

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.Conf

/** Name/key derivation scalar functions (SURVEY §2.8 F1, F2, F8-F11, F15) —
  * all codegen-friendly built-in Column expressions, no UDFs. */
object Naming {

  /** F8 — campus-id derivation (hospital_enricher.py:42-45): lower, strip
    * `[.,'&-]`, whitespace-tokenize, drop GENERIC_WORDS, join with `_`.
    * The stoplist's "INC" is uppercase and tokens are lowercased first, so it
    * never matches — preserved (the derived keys are the join contract). */
  def campusId(name: Column): Column = {
    // \s+ split: Python's no-arg str.split() tokenizes on ANY whitespace
    // run (tabs/NBSP included) — a single-space split would derive different
    // keys than the reference, and the keys are the join contract.
    val tokens = split(regexp_replace(lower(name), "[\\.,'\\-&]", ""), "\\s+")
    val kept = filter(tokens, t => t =!= "" && !t.isin(Conf.GenericWords: _*))
    array_join(kept, "_")
  }

  /** F9 — 5-digit zip (with optional +4) anchored at address end
    * (hospital_enricher.py:47-49); "" when absent. */
  def extractZip(address: Column): Column =
    regexp_extract(address, "(\\d{5})(?:-\\d{4})?$", 1)

  /** F10 — whitespace collapse (hospital_enricher.py:39-40). */
  def collapseWhitespace(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** F11 — lowercase alphanumeric squash (hospital_enricher.py:68-69);
    * `\w` = [A-Za-z0-9_] in both Java and RE2. */
  def alnumSquash(c: Column): Column = regexp_replace(lower(trim(c)), "[^\\w]", "")

  /** F15 — system-name slug (ETL_pipeline.py:78). */
  def systemSlug(c: Column): Column = regexp_replace(lower(c), " ", "_")

  private val payerPattern = "(.*)\\[(.*?)\\]"

  /** F1 — payer "Name [ID]" split (tall_format_csv_extractor.py:80-86):
    * on regex match, stripped group; else (raw, ""). */
  def payerName(c: Column): Column =
    when(regexp_like(c, lit(payerPattern)), trim(regexp_extract(c, payerPattern, 1)))
      .otherwise(c)
  def payerId(c: Column): Column =
    when(regexp_like(c, lit(payerPattern)), trim(regexp_extract(c, payerPattern, 2)))
      .otherwise(lit(""))

  /** F2 — modifier tokenize (tall_format_csv_extractor.py:93): split on
    * `,`/`|`, trim, drop empties; null in → null out (caller explodes). */
  def tokenizeModifiers(c: Column): Column =
    filter(transform(split(c, "[,\\|]"), t => trim(t)), t => t =!= "")
}
