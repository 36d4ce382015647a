package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.clean.{Cleaning, Rules}
import graft.core.Conf.RuleNames

/** Correctness-gate queries for the cleaning phase (SURVEY §2.8/§2.9: F3-F7,
  * P6, A7-A10, U5, P10) over the [[ChargesFixture]]. The Spark side runs the
  * real library code; [[oracles]] generates the DuckDB mirror SQL from the
  * same column lists so names can't drift.
  */
object CleanQueries {

  /** Devlog gate runs the pipeline on 1/4 of lineitem (see the gate). */
  private val DevlogSliceMod = 4

  def family: QueryFamily = QueryFamily("clean", queries, oracles)

  import ChargesFixture.{fabricated, toCanonical}

  private val priceU = Seq("negotiated_price", "negotiated_percentage", "gross_charge",
    "discounted_cash_price", "min_price", "max_price", "estimated_amount")
  private val textU = Seq("insurance_payer_name", "insurance_plan_name", "description",
    "setting", "negotiated_algorithm", "negotiated_methodology")
  private val allU = fabricated.map(_._1)
  private val stringU = allU.filterNot(priceU.contains)

  /** Cleaned + rule-tagged frame with canonical names — the one logical plan
    * every clean query is a projection of. Deliberately NOT persisted: the
    * columnar cache materialization costs more than recomputing this
    * codegen'd narrow pipeline (measured 14 s cache-build vs ~4 s/query). */
  private def tagged(spark: SparkSession, sfDir: String): DataFrame =
    Rules.tagViolations(Cleaning.cleanAll(ChargesFixture.charges(spark, sfDir)))

  private def renamedToUnderscore(df: DataFrame, extra: Seq[String] = Nil): DataFrame =
    df.select(allU.map(n => col(toCanonical(n)).as(n)) ++ extra.map(col): _*)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "clean_rows" -> ((s, dir) => {
      val (clean, _) = Rules.split(tagged(s, dir))
      renamedToUnderscore(clean)
    }),
    "clean_violations" -> ((s, dir) => {
      val (_, bad) = Rules.split(tagged(s, dir))
      renamedToUnderscore(bad, Seq("negotiated_algorithm_invalid", "rules_violated"))
    }),
    "clean_summary" -> ((s, dir) => Rules.summarize(tagged(s, dir))),

    // S11/S13/L1/A11 as data: build the real cleaning metadata (including
    // the duplicates-dropped delta), append TWO devlog entries (a stale
    // seed, then the real run), read the log back through Devlog.latest —
    // the emitted row proves the JSON sink/scan round trip, the seq
    // ordering pick, and every counter the reference's devlog records.
    "devlog_roundtrip" -> ((s, dir) => {
      import graft.meta.Devlog
      // Quarter-slice of the fixture: this gate proves the devlog JSON
      // roundtrip; the full-size clean pipeline is already gated by
      // clean_rows/clean_summary/clean_violations.
      val pre = Cleaning.cleanAllPreDedup(ChargesFixture.chargesSlice(s, dir, DevlogSliceMod))
      // Dedup as a group-by-all-columns carrying the duplicate multiplicity,
      // so the summary, the pre-dedup row count, and the deduped row count
      // all come out of ONE aggregation pass (not three pipeline scans).
      val grouped = pre.groupBy(pre.columns.map(col): _*)
        .agg(count(lit(1)).as("__mult"))
      val t = Rules.tagViolations(grouped)
      val summary = Rules.summarize(t, Seq(
        coalesce(sum(col("__mult")), lit(0L)).as("__pre_n"),
        count(lit(1)).as("__ded_n")))
      val row = summary.head()
      val meta = Devlog.metadataFromSummary(row,
        duplicatesDropped = row.getAs[Long]("__pre_n") - row.getAs[Long]("__ded_n"))
      val scratch = java.nio.file.Files.createTempDirectory("graft-devlog-gate")
      val path = scratch.toString
      Devlog.append(s, path, Devlog.DevlogEntry("GATE", "1 Gate St", "v0",
        "2024-01-01", 0.0, seq = 1L, meta.copy(total_rows_cleaned = -1L)))
      Devlog.append(s, path, Devlog.DevlogEntry("GATE", "1 Gate St", "v1",
        "2024-01-02", meta.final_transparency_score, seq = 2L, meta))
      val out = Devlog.latest(s, path).select(
        Seq(col("campus_id"), col("version"), col("seq"),
          col("transparency_score"),
          col("cleaning_metadata.final_transparency_score").as("final_transparency_score"),
          col("cleaning_metadata.total_rows_cleaned").as("total_rows_cleaned"),
          col("cleaning_metadata.total_duplicates_dropped").as("total_duplicates_dropped"),
          col("cleaning_metadata.total_rows_dropped_due_to_rule_violations")
            .as("total_rows_dropped_due_to_rule_violations"),
          col("cleaning_metadata.total_algorithm_format_violations")
            .as("total_algorithm_format_violations")) ++
          RuleNames.map(n => col(s"cleaning_metadata.rule_violations_summary.$n").as(n)): _*)
      // The round trip is proven once the row is read back; collect the
      // 1-row result and delete the scratch dir so repeated verify/bench
      // runs don't accumulate JSON garbage in /tmp.
      val rows = out.collect().toSeq
      val schema = out.schema
      import scala.jdk.CollectionConverters._
      val walked = java.nio.file.Files.walk(scratch)
      try walked.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walked.close()
      s.createDataFrame(rows.asJava, schema)
    }),

    // S8/S9 — the canonical CSV sink as a LOSSLESS round trip: the
    // oracle-gated clean_rows frame is written through the pipeline's CSV
    // sink shape (header, standard quoting — the documented F13
    // divergence) and read back with the typed clean schema. ''-vs-NULL
    // survives only with a DISTINCT nullValue sentinel on both sides
    // (default encodes both as the bare empty field, and the reader even
    // nulls a quoted "" — measured, not assumed); doubles re-parse
    // exactly (all fixture prices are dyadic), embedded commas/quotes
    // round-trip — so the clean_rows oracle applies verbatim.
    "clean_csv_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
      val (clean, _) = Rules.split(tagged(s, dir))
      val out = new java.io.File(sys.props("java.io.tmpdir"),
        "graft-clean-csv-" + new java.io.File(dir).getName).getAbsolutePath
      clean.write.mode("overwrite").option("header", "true")
        .option("nullValue", "\\N").csv(out)
      val schema = StructType(allU.map(n => StructField(toCanonical(n),
        if (priceU.contains(n)) DoubleType else StringType)))
      renamedToUnderscore(s.read.option("header", "true")
        .option("nullValue", "\\N").schema(schema).csv(out))
    }),

    // §3.1 flagship trace — the reference's whole per-hospital run as ONE
    // composed plan: JSON MRF fixture file → extract (3-level explode) →
    // clean → rules → summary/score → devlog entry → registry coalesce.
    // Every phase is gated alone elsewhere; this row proves they COMPOSE
    // (the oracle is a single CTE chain over the same `part`-derived
    // fixture, ending in the updated registry).
    "etl_flagship_trace" -> ((s, dir) => {
      import graft.meta.Devlog
      val path = JsonMrfFixture.writeFixture(s, dir)
      val canonical = graft.extract.JsonExtractor.extractFile(
        s, path, JsonMrfFixture.HospitalName, JsonMrfFixture.Zip)
      val t = Rules.tagViolations(Cleaning.cleanAll(canonical))
      val row = Rules.summarize(t).head()
      // duplicatesDropped rides the devlog only — it does not reach the
      // registry columns this gate emits, so 0L keeps the plan one-pass
      // (the real dup accounting is gated by devlog_roundtrip).
      val meta = Devlog.metadataFromSummary(row, duplicatesDropped = 0L)
      val entry = Devlog.DevlogEntry("C1", "Georgia", "v2.0", "2024-01-01",
        meta.final_transparency_score, seq = 1L, meta)
      import s.implicits._
      val latest = Seq(entry).toDS().toDF()
      val registry = graft.core.Tables.table(s, dir, "region").select(
        concat(lit("C"), col("r_regionkey").cast("string")).as("campus_id"),
        lit("raw").as("etl_status"), lit("").as("processed_by"),
        lit("").as("last_processed_on"),
        lit("2023-01-01").as("last_updated_on"),
        lit("v0").as("version"), lit(0.0).as("transparency_score"))
      Devlog.updateRegistry(registry, latest, "C1", "graft-engine",
        "2024-02-02 00:00:00")
    }))

  // ---------------------------------------------------------------- oracle --

  /** DuckDB SQL mirror of Cleaning.cleanAll + Rules, step for step. */
  private def pipelineCte: String = pipelineCteFrom(ChargesFixture.sql)

  private def pipelineCteFrom(rawSql: String): String = {
    val scrub = priceU.map { f =>
      val s = s"TRY_CAST(trim(regexp_replace($f, '[$$%\",]', '', 'g')) AS DOUBLE)"
      val v = if (f == "estimated_amount") s
        else s"(CASE WHEN $s <= 0 OR $s = 999999999 THEN NULL ELSE $s END)"
      s"$v AS $f"
    }
    val priced = (stringU ++ scrub).mkString(", ")
    val blank = stringU.map { c =>
      s"(CASE WHEN regexp_matches($c, '^(n/?a|not applicable)$$', 'i') THEN '' ELSE $c END) AS $c"
    } ++ priceU
    val text = stringU.map { c =>
      if (textU.contains(c))
        s"(CASE WHEN lower(trim(coalesce($c, 'nan'))) = 'nan' THEN '' " +
          s"ELSE lower(trim(coalesce($c, 'nan'))) END) AS $c"
      else s"$c"
    } ++ priceU
    val mods = allU.map {
      case "modifiers" => "replace(replace(upper(modifiers), '|', ','), ' ', '') AS modifiers"
      case c => c
    }
    val flag = "coalesce(regexp_matches(negotiated_algorithm, '^[0-9$%\\\\s]+$'), false)" +
      " AS negotiated_algorithm_invalid"
    val coded = allU.map {
      case "code" => "coalesce(code, 'nan') AS code"
      case "code_type" => "upper(coalesce(code_type, 'nan')) AS code_type"
      case c => c
    } :+ "negotiated_algorithm_invalid"
    val valid =
      """(code_type = 'CPT' AND regexp_matches(code, '^\d{5}$'))
        | OR (code_type = 'HCPCS' AND (regexp_matches(code, '^\d{5}$') OR regexp_matches(code, '^[A-V]\d{4}$')))
        | OR (code_type = 'NDC' AND regexp_matches(code, '^\d{10,11}$'))
        | OR (code_type = 'DRG' AND regexp_matches(code, '^\d{3}$'))
        | OR (code_type = 'CDT' AND regexp_matches(code, '^D\d{4}$'))
        | OR (code_type = 'APC' AND regexp_matches(code, '^\d{4}$'))
        | OR (code_type = 'ICD' AND length(code) BETWEEN 3 AND 7)""".stripMargin
    s"""WITH raw AS ($rawSql),
       |priced AS (SELECT $priced FROM raw),
       |blanked AS (SELECT ${blank.mkString(", ")} FROM priced),
       |texted AS (SELECT ${text.mkString(", ")} FROM blanked),
       |flagged AS (SELECT *, $flag FROM (SELECT ${mods.mkString(", ")} FROM texted)),
       |coded AS (SELECT ${coded.mkString(", ")} FROM flagged),
       |valid_rows AS (SELECT * FROM coded WHERE $valid),
       |deduped AS (SELECT DISTINCT * FROM valid_rows),
       |ruled AS (SELECT *, ${ruleSqls.map { case (n, p) => s"($p) AS ${n}_v" }.mkString(", ")} FROM deduped)""".stripMargin
  }

  /** The 10 rule predicates in DuckDB SQL (presence = IS NOT NULL), mirroring
    * Rules.predicates over underscored names. */
  private def ruleSqls: Seq[(String, String)] = {
    def pres(c: String) = s"$c IS NOT NULL"
    def abs(c: String) = s"$c IS NULL"
    def anyP(cs: String*) = cs.map(pres).mkString("(", " OR ", ")")
    def allP(cs: String*) = cs.map(pres).mkString("(", " AND ", ")")
    def allA(cs: String*) = cs.map(abs).mkString("(", " AND ", ")")
    Seq(
      "rule_1" -> s"${anyP("negotiated_price", "negotiated_percentage", "gross_charge")} AND NOT ${allP("insurance_payer_name", "insurance_plan_name", "negotiated_methodology")}",
      "rule_2" -> s"${anyP(priceU: _*)} AND NOT ${allP("code", "code_type")}",
      "rule_3" -> s"((${pres("code")} AND ${abs("code_type")}) OR (${pres("code_type")} AND ${abs("code")}))",
      "rule_4" -> s"coalesce(lower(negotiated_methodology) = 'other', false) AND ${abs("additional_notes")}",
      "rule_5" -> s"${pres("description")} AND ${allA("gross_charge", "discounted_cash_price", "negotiated_price", "negotiated_percentage", "negotiated_algorithm")}",
      "rule_6" -> s"${pres("negotiated_price")} AND NOT ${allP("min_price", "max_price")}",
      "rule_7" -> s"${abs("negotiated_price")} AND ${anyP("negotiated_percentage", "negotiated_algorithm")} AND ${abs("estimated_amount")}",
      "rule_8" -> s"coalesce(upper(code_type) = 'NDC', false) AND NOT ${allP("drug_unit", "drug_type")}",
      "rule_9" -> s"${pres("modifiers")} AND ${abs("description")} AND ${allA("negotiated_price", "negotiated_percentage", "negotiated_algorithm", "additional_notes")}",
      "rule_10" -> s"((${pres("drug_unit")} AND ${abs("drug_type")}) OR (${pres("drug_type")} AND ${abs("drug_unit")}))")
  }

  private def anyRule = RuleNames.map(n => s"${n}_v").mkString("(", " OR ", ")")

  def oracles: Map[String, String] = {
    val tagExpr = "NULLIF(concat_ws(','," +
      RuleNames.map(n => s" CASE WHEN ${n}_v THEN '$n' END").mkString(",") + "), '')"
    val sums = RuleNames.map(n => s"CAST(sum(CASE WHEN ${n}_v THEN 1 ELSE 0 END) AS BIGINT) AS $n")
    val summaryInner = (sums ++ Seq(
      s"CAST(sum(CASE WHEN NOT $anyRule THEN 1 ELSE 0 END) AS BIGINT) AS total_rows_cleaned",
      s"CAST(sum(CASE WHEN NOT $anyRule AND negotiated_algorithm_invalid THEN 1 ELSE 0 END) AS BIGINT) AS total_algorithm_format_violations"))
      .mkString(", ")
    val droppedExpr = RuleNames.mkString(" + ")
    Map(
      "clean_rows" ->
        s"$pipelineCte SELECT ${allU.mkString(", ")} FROM ruled WHERE NOT $anyRule",
      "clean_csv_roundtrip" ->
        s"$pipelineCte SELECT ${allU.mkString(", ")} FROM ruled WHERE NOT $anyRule",
      "clean_violations" ->
        s"""$pipelineCte SELECT ${allU.mkString(", ")}, negotiated_algorithm_invalid, $tagExpr AS rules_violated FROM ruled WHERE $anyRule""",
      "clean_summary" ->
        s"""$pipelineCte, s AS (SELECT $summaryInner FROM ruled)
           |SELECT *, CAST($droppedExpr AS BIGINT) AS total_rows_dropped_due_to_rule_violations,
           |  CASE WHEN total_rows_cleaned + ($droppedExpr) = 0 THEN 0.0
           |       ELSE greatest(0.0, 1.0 - CAST($droppedExpr AS DOUBLE) / (CAST(total_rows_cleaned + ($droppedExpr) AS DOUBLE) * 10.0)) END
           |    AS final_transparency_score
           |FROM s""".stripMargin,
      "devlog_roundtrip" -> {
        val score =
          s"""CASE WHEN total_rows_cleaned + ($droppedExpr) = 0 THEN 0.0
             |  ELSE greatest(0.0, 1.0 - CAST($droppedExpr AS DOUBLE) / (CAST(total_rows_cleaned + ($droppedExpr) AS DOUBLE) * 10.0)) END""".stripMargin
        s"""${pipelineCteFrom(ChargesFixture.sliceSql(DevlogSliceMod))},
           |s AS (SELECT $summaryInner FROM ruled),
           |pre AS (SELECT CAST(count(*) AS BIGINT) AS pre_n FROM valid_rows),
           |ded AS (SELECT CAST(count(*) AS BIGINT) AS ded_n FROM deduped)
           |SELECT 'GATE' AS campus_id, 'v1' AS version, CAST(2 AS BIGINT) AS seq,
           |  round($score, 4) AS transparency_score,
           |  round($score, 4) AS final_transparency_score,
           |  total_rows_cleaned, pre_n - ded_n AS total_duplicates_dropped,
           |  CAST($droppedExpr AS BIGINT) AS total_rows_dropped_due_to_rule_violations,
           |  total_algorithm_format_violations, ${RuleNames.mkString(", ")}
           |FROM s, pre, ded""".stripMargin
      },
      "etl_flagship_trace" -> {
        val score =
          s"""CASE WHEN total_rows_cleaned + ($droppedExpr) = 0 THEN 0.0
             |  ELSE greatest(0.0, 1.0 - CAST($droppedExpr AS DOUBLE) / (CAST(total_rows_cleaned + ($droppedExpr) AS DOUBLE) * 10.0)) END""".stripMargin
        s"""${pipelineCteFrom(JsonMrfFixture.canonicalSql)},
           |s AS (SELECT $summaryInner FROM ruled),
           |reg AS (SELECT concat('C', cast(r_regionkey as string)) AS campus_id,
           |    'raw' AS etl_status, '' AS processed_by, '' AS last_processed_on,
           |    '2023-01-01' AS last_updated_on, 'v0' AS version,
           |    CAST(0.0 AS DOUBLE) AS transparency_score FROM region)
           |SELECT reg.campus_id,
           |  CASE WHEN reg.campus_id = 'C1' THEN 'cleaned' ELSE reg.etl_status END AS etl_status,
           |  CASE WHEN reg.campus_id = 'C1' THEN 'graft-engine' ELSE reg.processed_by END AS processed_by,
           |  CASE WHEN reg.campus_id = 'C1' THEN '2024-02-02 00:00:00' ELSE reg.last_processed_on END AS last_processed_on,
           |  CASE WHEN reg.campus_id = 'C1' THEN '2024-01-01' ELSE reg.last_updated_on END AS last_updated_on,
           |  CASE WHEN reg.campus_id = 'C1' THEN 'v2.0' ELSE reg.version END AS version,
           |  CASE WHEN reg.campus_id = 'C1' THEN round($score, 4) ELSE reg.transparency_score END AS transparency_score
           |FROM reg CROSS JOIN s""".stripMargin
      })
  }
}
