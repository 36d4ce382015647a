package graft.extract

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Schemas
import graft.enrich.Naming
import CodePairs.colOr

/** Tall-format CSV MRF → canonical 22-column charges table
  * (tall_format_csv_extractor.py:49-170, recovered from bytecode).
  *
  * One source row carries one payer and ≤4 (code|i, code|i|type) pairs; each
  * non-empty, allowlisted pair becomes one canonical row (U1). The whole
  * extract is a narrow plan (fill → payer split → explode → filter → select):
  * zero shuffles, fully pipelined with the parquet/CSV scan at any scale.
  */
object TallExtractor {

  /** Source column → canonical column mapping
    * (tall_format_csv_extractor.py:115-137 constants). */
  private val directMapping: Seq[(String, String)] = Seq(
    "description" -> "description",
    "drug_unit_of_measurement" -> "drug unit",
    "drug_type_of_measurement" -> "drug type",
    "plan_name" -> "insurance plan name",
    "standard_charge|negotiated_dollar" -> "negotiated price",
    "standard_charge|negotiated_percentage" -> "negotiated percentage",
    "standard_charge|negotiated_algorithm" -> "negotiated algorithm",
    "standard_charge|methodology" -> "negotiated methodology",
    "standard_charge|gross" -> "gross charge",
    "standard_charge|discounted_cash" -> "discounted cash price",
    "standard_charge|min" -> "min price",
    "standard_charge|max" -> "max price",
    "estimated_amount" -> "estimated amount",
    "setting" -> "setting",
    "additional_generic_notes" -> "additional notes",
    "modifiers" -> "modifiers")

  /** Full extract over an already-loaded body frame (MrfCsv.readBody). */
  def extract(body: DataFrame, hospitalName: String, zipCode: String): DataFrame = {
    val filled = body.na.fill("") // chunk.replace(np.nan, '') parity
    val exploded = CodePairs.kept(CodePairs.explodePairs(filled))
    val payerCol = colOr(filled, "payer_name")
    val direct = directMapping.toMap
    val cols: Seq[Column] = Schemas.CanonicalColumns.map {
      case "hospital name" => lit(hospitalName).as("hospital name")
      case "zip code" => lit(zipCode).as("zip code")
      case "code" => col("__code").as("code")
      case "code type" => col("__code_type").as("code type")
      case "insurance payer name" => Naming.payerName(payerCol).as("insurance payer name")
      case "insurance payer id" => Naming.payerId(payerCol).as("insurance payer id")
      case canonical =>
        val src = direct.collectFirst { case (s, d) if d == canonical => s }.get
        colOr(filled, src).as(canonical)
    }
    exploded.select(cols: _*)
  }

  /** End-to-end file path variant: metadata rows + body + extract. */
  def extractFile(spark: SparkSession, path: String,
      hospitalName: String, zipCode: String): DataFrame =
    extract(MrfCsv.readBody(spark, path), hospitalName, zipCode)

  /** A1 — modifier frequency counts over SOURCE rows (pre-explode,
    * tall_format_csv_extractor.py:91-95). */
  def modifierCounts(body: DataFrame): DataFrame =
    body.select(explode(Naming.tokenizeModifiers(colOr(body, "modifiers"))).as("modifier"))
      .groupBy(col("modifier")).agg(count(lit(1)).as("n"))

  /** A2 — field-presence summary over canonical OUTPUT rows (non-empty count
    * per canonical column, tall_format_csv_extractor.py:140-142). */
  def fieldPresence(canonical: DataFrame): DataFrame = {
    val aggs = Schemas.CanonicalColumns.map { c =>
      sum(when(coalesce(col(c), lit("")) =!= "", 1L).otherwise(0L)).as(c)
    }
    canonical.agg(aggs.head, aggs.tail: _*)
  }
}
