package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import SequenceMatcherRatio.seqRatio

/** Registry build: scraped hospitals enriched against the CMS provider table
  * (hospital_enricher.py:117-186) — exact campus_id lookup (J1) with a fuzzy
  * SequenceMatcher fallback at cutoff 0.9 (J2), top-1 per scraped row.
  *
  * Scale shape: the exact stage is a broadcast hash join (CMS ≤ 50k rows by
  * the reference's own fetch cap). The fuzzy stage only sees exact MISSES ×
  * broadcast CMS, pre-pruned by the sound length bound
  * 2·min(|a|,|b|)/(|a|+|b|) ≥ cutoff before any ratio is scored, then top-1
  * via window over (ratio desc, cms key asc). difflib's get_close_matches
  * breaks score ties by candidate order; we use the CMS key as the
  * deterministic stand-in (documented divergence only when two candidates
  * tie EXACTLY at the best score).
  */
object RegistryEnricher {

  val DefaultCutoff = 0.9

  /** Columns copied from the CMS side on a match
    * (hospital_enricher.py:160-164). */
  val EnrichedColumns: Seq[String] =
    Seq("cms_rating", "hospital_type", "county", "telephone_num", "cms_zip")

  /** Left: scraped rows with a `campus_id` key column. Right: CMS rows with
    * `campus_id` + EnrichedColumns. Returns left columns + EnrichedColumns
    * (null when unmatched) + `match_kind` (exact | fuzzy | none) +
    * `match_ratio` (1.0 exact, score for fuzzy, null none).
    *
    * NOTE: the hit/miss branches both descend from the exact join, so one
    * action scans the scraped side twice (the broadcast relation is reused).
    * For a very large scraped side, `.cache()` it before calling. */
  def enrich(scraped: DataFrame, cms: DataFrame,
      cutoff: Double = DefaultCutoff): DataFrame = {
    val cmsCols = EnrichedColumns.filter(cms.columns.contains)
    // Deterministic one-row-per-key CMS side: duplicate campus_id keys (real
    // after the lossy key normalization) must not fan scraped rows out. The
    // reference's dict-style index keeps one row; we keep the struct-min row
    // (deterministic under any partitioning, unlike dropDuplicates).
    val cmsSel = cms.select((col("campus_id").as("__cms_key") +:
      cmsCols.map(col)): _*)
      .groupBy(col("__cms_key"))
      .agg(min(struct(cmsCols.map(col): _*)).as("__r"))
      .select((col("__cms_key") +: cmsCols.map(c => col(s"__r.$c").as(c))): _*)

    // Stage 1 — exact broadcast hash join.
    val exact = scraped.join(broadcast(cmsSel),
      scraped("campus_id") === cmsSel("__cms_key"), "left")
    val hit = exact.filter(col("__cms_key").isNotNull)
      .withColumn("match_kind", lit("exact"))
      .withColumn("match_ratio", lit(1.0))
    // Misses inherit the (often single-partition) scan layout but fan out
    // into |misses|×|CMS| ratio evaluations — spread them first.
    val miss = exact.filter(col("__cms_key").isNull)
      .drop("__cms_key" +: cmsCols: _*)
      .repartition(scraped.sparkSession.sparkContext.defaultParallelism)
      .withColumn("__srcid", monotonically_increasing_id())

    // Stage 2 — fuzzy fallback on misses only: LENGTH-BANDED equi-join
    // against the broadcast CMS keys, difflib-exact ratio, top-1.
    //
    // ratio ≥ c bounds the length ratio (2·min/(la+lb) ≥ c), so a CMS key
    // of length lb can only match miss keys with la ∈ [lb·c/(2-c),
    // lb·(2-c)/c]. Exploding each CMS row into that (slightly widened)
    // integer length band turns the pairing into a BroadcastHashJoin on
    // exact length — the raw theta join planned as a nested loop that
    // evaluated the bound |misses|×|CMS| times. The exact bound stays as
    // the join's extra condition, so the widened band can't admit a pair
    // the theta join would have rejected: identical output, hash-join cost.
    val lenBound = (lit(2.0) * least(length(col("campus_id")), length(col("__cms_key")))
      / (length(col("campus_id")) + length(col("__cms_key")))) >= cutoff
    val bandLo = floor(length(col("__cms_key")) * lit(cutoff) / (lit(2.0) - cutoff)).cast("int") - 1
    val bandHi = ceil(length(col("__cms_key")) * (lit(2.0) - cutoff) / lit(cutoff)).cast("int") + 1
    val cmsBanded = cmsSel.withColumn("__len", explode(sequence(bandLo, bandHi)))
    val missLen = miss.withColumn("__len", length(col("campus_id")))
    // Cheap character-bag bound first (difflib quick_ratio idea): pairs the
    // bound already places below the cutoff score -1 without running the
    // quadratic exact ratio. Ordering among sub-cutoff pairs is irrelevant
    // (they can never be the fuzzy match).
    val scored = missLen.join(broadcast(cmsBanded),
        missLen("__len") === cmsBanded("__len") && lenBound, "left")
      .drop("__len")
      .withColumn("__ratio",
        when(col("__cms_key").isNotNull,
          SequenceMatcherRatio.seqRatioAtLeast(
            col("campus_id"), col("__cms_key"), cutoff)))
      .withColumn("__ok", col("__ratio") >= cutoff)
    // Partition by a unique per-source-row id (not the key): duplicate
    // scraped keys must each keep their own match row.
    val w = Window.partitionBy(col("__srcid"))
      .orderBy(col("__ok").desc, col("__ratio").desc, col("__cms_key").asc)
    val fuzzy = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("match_kind", when(col("__ok"), lit("fuzzy")).otherwise(lit("none")))
      .withColumn("match_ratio", when(col("__ok"), col("__ratio")))
    val nulled = cmsCols.foldLeft(fuzzy)((d, c) =>
      d.withColumn(c, when(col("__ok"), col(c))))

    val outCols: Seq[Column] =
      (scraped.columns.map(col) ++ cmsCols.map(col) :+
        col("match_kind") :+ col("match_ratio")).toSeq
    hit.select(outCols: _*).union(nulled.select(outCols: _*))
  }

  /** The registry's full 30-column projection with ""-fill for anything the
    * enrichment didn't produce (hospital_enricher.py:174-185) — the sink
    * shape of the §3.2 registry-build trace. */
  val RegistryColumns: Seq[String] = Seq(
    "hospital_name", "campus_id", "healthcare_system", "hospital_type",
    "city", "county", "metro_area", "state", "hospital_address", "zip_code",
    "telephone_num", "latitude", "longitude", "cms_rating", "leapfrog_grade",
    "leapfrog_grade_term", "leapfrog_grade_url", "last_updated_on", "version",
    "etl_status", "processed_by", "last_processed_on", "issues_encountered",
    "transparency_score", "raw_filename", "file_format", "structure",
    "download_url", "contact_num", "email_id")

  def toRegistryProjection(enriched: DataFrame): DataFrame = {
    val cols = RegistryColumns.map {
      case "zip_code" if enriched.columns.contains("cms_zip") =>
        coalesce(Seq("zip_code").filter(enriched.columns.contains).map(col) :+
          col("cms_zip") :+ lit(""): _*).as("zip_code")
      case c if enriched.columns.contains(c) => coalesce(col(c), lit("")).as(c)
      case c => lit("").as(c)
    }
    enriched.select(cols: _*)
  }
}
