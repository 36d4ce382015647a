package graft.extract

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Schemas
import CodePairs.colOr

/** Wide-format CSV MRF → canonical 22-column charges table
  * (wide_format_csv_extractor.py:65-204, recovered from bytecode).
  *
  * Dynamic per-payer columns `standard_charge|{Payer}|{Plan}|{field}` (field
  * last when >3 segments) or `{field}|{Payer}|{Plan}` (field first at exactly
  * 3) are classified DRIVER-side from the schema (P11 — metadata, not data),
  * melted to (payer, plan, field, value) cells via a narrow explode (U2),
  * crossed with the ≤4 code pairs, then re-pivoted one row per
  * (source row, code, type, payer, plan) with an explicit 6-value pivot (U3).
  *
  * Scale: the reference holds the whole file and a python dict in RAM (its
  * one genuine 100TB-breaker, wide_format_csv_extractor.py:87,102-135); here
  * the melt is pipelined and the re-pivot is ONE hash-aggregate shuffle keyed
  * by (rowid, code, payer, plan) — uniformly distributed, AQE-safe.
  *
  * Pinned semantics (SURVEY §7.4): a source row-id is carried so identical
  * (code, payer, plan) from different source rows never merge; within one
  * source row, later classified columns overwrite earlier ones
  * (dict-assignment order) — replicated with max_by(value, column-index).
  */
object WideExtractor {

  /** field token → canonical column (STANDARD_CHARGE_PREFIXES). */
  val FieldMap: Map[String, String] = Map(
    "negotiated_dollar" -> "negotiated price",
    "negotiated_percentage" -> "negotiated percentage",
    "negotiated_algorithm" -> "negotiated algorithm",
    "estimated_amount" -> "estimated amount",
    "methodology" -> "negotiated methodology",
    "additional_payer_notes" -> "additional notes")

  val FieldTokens: Seq[String] = Seq("negotiated_dollar", "negotiated_percentage",
    "negotiated_algorithm", "estimated_amount", "methodology", "additional_payer_notes")

  final case class PayerColumn(name: String, field: String, payer: String,
      plan: String, index: Int)

  /** P11 — classify payer columns from the schema (driver-side;
    * wide_format_csv_extractor.py:59-63,88-91). */
  def classifyColumns(columns: Seq[String]): Seq[PayerColumn] =
    columns.zipWithIndex.flatMap { case (name, idx) =>
      val parts = name.split("\\|", -1)
      if (parts.length < 3) None
      else {
        val field = if (parts.length == 3) parts(0) else parts.last
        if (FieldMap.contains(field))
          Some(PayerColumn(name, field, parts(1), parts(2), idx))
        else None
      }
    }

  private val staticSources: Seq[(String, String)] = Seq(
    "description" -> "description",
    "drug_unit_of_measurement" -> "drug unit",
    "drug_type_of_measurement" -> "drug type",
    "standard_charge|gross" -> "gross charge",
    "standard_charge|discounted_cash" -> "discounted cash price",
    "standard_charge|min" -> "min price",
    "standard_charge|max" -> "max price",
    "setting" -> "setting",
    "additional_generic_notes" -> "__generic_notes",
    "modifiers" -> "modifiers")

  /** Full extract over an already-loaded body frame (MrfCsv.readBody). */
  def extract(body: DataFrame, hospitalName: String, zipCode: String): DataFrame = {
    val payerCols = classifyColumns(body.columns.toSeq)
    val filled = body.na.fill("").withColumn("__rowid", monotonically_increasing_id())

    // U2 — melt the classified columns into (payer, plan, field, idx, value).
    val cells = array(payerCols.map { pc =>
      struct(lit(pc.payer).as("payer"), lit(pc.plan).as("plan"),
        lit(pc.field).as("field"), lit(pc.index).as("idx"),
        col(pc.name).as("value"))
    }: _*)
    val melted = filled
      .withColumn("__cell", explode(cells))
      .filter(col("__cell.value") =!= "") // P8: skip empty cells
    // ≤4 code pairs per source row (shared with the tall path).
    val exploded = CodePairs.kept(CodePairs.explodePairs(melted))

    // U3 — re-pivot one row per (source row, code, type, payer, plan).
    val staticKeys = staticSources.map { case (src, dst) => colOr(filled, src).as(dst) }
    val repivoted = exploded
      .select(Seq(col("__rowid"), col("__code"), col("__code_type"),
        col("__cell.payer").as("__payer"), col("__cell.plan").as("__plan"),
        col("__cell.field").as("__field"), col("__cell.idx").as("__idx"),
        col("__cell.value").as("__value")) ++ staticKeys: _*)
      .groupBy(Seq(col("__rowid"), col("__code"), col("__code_type"),
        col("__payer"), col("__plan")) ++
        staticSources.map { case (_, dst) => col(dst) }: _*)
      .pivot(col("__field"), FieldTokens)
      .agg(max_by(col("__value"), col("__idx")))

    // F12 — merge generic + payer notes (empties dropped, ", " separator).
    val nz = (c: Column) => when(c.isNull || c === "", lit(null)).otherwise(c)
    val notes = concat_ws(", ", nz(col("__generic_notes")),
      nz(col("additional_payer_notes")))

    val pivoted = FieldMap.map { case (tok, dst) => tok -> dst }
    val cols: Seq[Column] = Schemas.CanonicalColumns.map {
      case "hospital name" => lit(hospitalName).as("hospital name")
      case "zip code" => lit(zipCode).as("zip code")
      case "code" => col("__code").as("code")
      case "code type" => col("__code_type").as("code type")
      case "insurance payer name" => col("__payer").as("insurance payer name")
      case "insurance payer id" => lit("").as("insurance payer id")
      case "insurance plan name" => col("__plan").as("insurance plan name")
      case "additional notes" => notes.as("additional notes")
      case canonical if pivoted.exists(_._2 == canonical) =>
        val tok = pivoted.collectFirst { case (t, d) if d == canonical => t }.get
        coalesce(col(tok), lit("")).as(canonical)
      case canonical => col(canonical) // static key columns already aliased
    }
    repivoted.select(cols: _*)
  }

  def extractFile(spark: SparkSession, path: String,
      hospitalName: String, zipCode: String): DataFrame =
    extract(MrfCsv.readBody(spark, path), hospitalName, zipCode)
}
