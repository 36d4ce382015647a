package graft.core

import org.apache.spark.sql.types._

/** Canonical data model of the engine.
  *
  * The central fact table is the 22-column "canonical charges" table — one row
  * per (billing code, code type, payer, plan) price point per hospital. The
  * schema is declared identically by both reference extractors
  * (tall_format_csv_extractor.py:13-19, wide_format_csv_extractor.py:12) and is
  * all-string at ingest (dtype=str); the 7 price fields become nullable doubles
  * during cleaning (cleaning_utils.py:9-12,83-97).
  */
object Schemas {

  /** Exact canonical column names, in order (tall_format_csv_extractor.py:13-19). */
  val CanonicalColumns: Seq[String] = Seq(
    "hospital name", "zip code", "code", "code type", "description",
    "drug unit", "drug type",
    "insurance payer name", "insurance payer id", "insurance plan name",
    "negotiated price", "negotiated percentage", "negotiated algorithm",
    "negotiated methodology",
    "gross charge", "discounted cash price", "min price", "max price",
    "estimated amount", "setting", "additional notes", "modifiers")

  /** The 7 price fields cast to nullable double by the cleaner (cleaning_utils.py:9-12). */
  val PriceFields: Seq[String] = Seq(
    "negotiated price", "negotiated percentage", "gross charge",
    "discounted cash price", "min price", "max price", "estimated amount")

  /** The 6 text fields normalized (strip/lower, "nan"→"") by the cleaner
    * (cleaning_utils.py:14-17). */
  val TextFields: Seq[String] = Seq(
    "insurance payer name", "insurance plan name", "description", "setting",
    "negotiated algorithm", "negotiated methodology")

  /** Sentinel price meaning "no price published" (cleaning_utils.py:19). */
  val PlaceholderPrice: Double = 999999999d

  /** All-string ingest schema for the canonical table (dtype=str semantics). */
  val canonicalIngest: StructType =
    StructType(CanonicalColumns.map(c => StructField(c, StringType, nullable = true)))

  /** Hospital registry dimension record — 30 columns keyed by campus_id
    * (hospital_enricher.py:174-186). Stored as Parquet (no Excel offline);
    * semantic parity with the reference's workbook is preserved.
    */
  case class RegistryRecord(
      hospital_name: String, campus_id: String, healthcare_system: String,
      hospital_type: String, city: String, county: String, metro_area: String,
      state: String, hospital_address: String, zip_code: String,
      telephone_num: String, latitude: String, longitude: String,
      cms_rating: String, leapfrog_grade: String, leapfrog_grade_term: String,
      leapfrog_grade_url: String, last_updated_on: String, version: String,
      etl_status: String, processed_by: String, last_processed_on: String,
      issues_encountered: String, transparency_score: Option[Double],
      raw_filename: String, file_format: String, structure: String,
      download_url: String, contact_num: String, email_id: String)

  /** MRF file-level metadata carried by the 2 leading metadata rows of CSV MRFs
    * (tall_format_csv_extractor.py:66-71) / the JSON top level. */
  case class MrfMetadata(
      hospitalName: String, zipCode: String, version: String,
      lastUpdatedOn: String, hospitalLocation: String, hospitalAddress: String)
}
