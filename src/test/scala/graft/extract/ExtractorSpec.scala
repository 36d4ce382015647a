package graft.extract

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** File-fixture tests for the three extractors (FIXTURES.md §2.2-2.4). */
class ExtractorSpec extends SparkSpec {

  private def write(name: String, content: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft-$name")
    Files.writeString(p, content)
    p.toString
  }

  test("S2 metadata transpose: first two lines become key→value map") {
    val p = write("meta.csv",
      """hospital_name,last_updated_on,version,hospital_location,hospital_address
        |General,2024-07-01,2.0.0,"Atlanta, GA","1 Main St, Atlanta, GA 30303"
        |description,code|1
        |x,12345
        |""".stripMargin)
    val m = MrfCsv.readMetadata(spark, p)
    assert(m("version") == "2.0.0")
    assert(m("hospital_address") == "1 Main St, Atlanta, GA 30303")
  }

  private val tallCsv =
    """hospital_name,last_updated_on,version,hospital_location,hospital_address
      |General,2024-07-01,2.0.0,Atlanta,1 Main St
      |description,code|1,code|1|type,code|2,code|2|type,setting,drug_unit_of_measurement,drug_type_of_measurement,modifiers,standard_charge|gross,standard_charge|discounted_cash,payer_name,plan_name,standard_charge|negotiated_dollar,standard_charge|negotiated_percentage,standard_charge|negotiated_algorithm,standard_charge|methodology,standard_charge|min,standard_charge|max,estimated_amount,additional_generic_notes
      |Knee MRI,73721,CPT,470,MS-DRG,outpatient,,,"26, TC",250.00,200.00,Aetna [AET01],PPO,150.00,,,fee schedule,100.00,300.00,140.00,see notes
      |Blood test,85025,CPT,,,outpatient,,,,50.00,40.00,BCBS,HMO,30.00,,,fee schedule,20.00,60.00,25.00,
      |Mystery,99999,FOO,,,inpatient,,,,10.00,,Cigna,EPO,,,,,,,,
      |""".stripMargin

  test("tall extract: pair explode, MS-DRG normalization, payer split, unknown type rejected") {
    val p = write("tall.csv", tallCsv)
    val out = TallExtractor.extractFile(spark, p, "General", "30303").cache()
    assert(out.columns.toSeq == graft.core.Schemas.CanonicalColumns)
    val rows = out.collect().map(r => (r.getString(2), r.getString(3),
      r.getString(7), r.getString(8), r.getString(10)))
    // row1 → 2 pairs (CPT + MS-DRG→DRG); row2 → 1 pair; row3 → FOO rejected.
    assert(rows.length == 3)
    assert(rows.contains(("73721", "CPT", "Aetna", "AET01", "150.00")))
    assert(rows.contains(("470", "DRG", "Aetna", "AET01", "150.00")))
    assert(rows.contains(("85025", "CPT", "BCBS", "", "30.00")))
  }

  test("tall side aggregations: modifier counts and field presence") {
    val p = write("tall.csv", tallCsv)
    val body = MrfCsv.readBody(spark, p)
    val mods = TallExtractor.modifierCounts(body).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mods == Map("26" -> 1L, "TC" -> 1L))
    val canonical = TallExtractor.extract(body, "General", "30303")
    val pres = TallExtractor.fieldPresence(canonical).head()
    assert(pres.getAs[Long]("hospital name") == 3L)
    assert(pres.getAs[Long]("negotiated percentage") == 0L)
    assert(pres.getAs[Long]("insurance payer id") == 2L) // AET01 on 2 rows
  }

  private val wideCsv =
    """hospital_name,last_updated_on,version,hospital_location,hospital_address
      |General,2024-07-01,2.0.0,Atlanta,1 Main St
      |description,code|1,code|1|type,setting,drug_unit_of_measurement,drug_type_of_measurement,modifiers,standard_charge|gross,standard_charge|discounted_cash,standard_charge|min,standard_charge|max,additional_generic_notes,standard_charge|Aetna|PPO|negotiated_dollar,standard_charge|Aetna|PPO|methodology,additional_payer_notes|Aetna|PPO,standard_charge|BCBS|HMO|negotiated_dollar,standard_charge|BCBS|HMO|estimated_amount
      |Knee MRI,73721,CPT,outpatient,,,,250.00,200.00,100.00,300.00,generic note,150.00,fee schedule,payer note,,
      |Blood test,85025,CPT,outpatient,,,,50.00,40.00,20.00,60.00,,30.00,per diem,,25.00,22.00
      |Knee MRI,73721,CPT,outpatient,,,,260.00,210.00,110.00,310.00,,151.00,case rate,,,
      |""".stripMargin

  test("wide extract: column classify, melt, re-pivot per source row, notes merge") {
    val p = write("wide.csv", wideCsv)
    val cls = WideExtractor.classifyColumns(MrfCsv.readBody(spark, p).columns.toSeq)
    assert(cls.map(_.field).toSet ==
      Set("negotiated_dollar", "methodology", "additional_payer_notes", "estimated_amount"))
    assert(cls.exists(c => c.payer == "Aetna" && c.plan == "PPO"))

    val out = WideExtractor.extractFile(spark, p, "General", "30303").cache()
    assert(out.columns.toSeq == graft.core.Schemas.CanonicalColumns)
    val rows = out.collect().map(r => (r.getString(2), r.getString(7),
      r.getString(10), r.getString(13), r.getString(20))).toSet
    // Two "Knee MRI" source rows with the same (code, payer, plan) stay separate.
    assert(rows.contains(("73721", "Aetna", "150.00", "fee schedule", "generic note, payer note")))
    assert(rows.contains(("73721", "Aetna", "151.00", "case rate", "")))
    // Blood test row melts two payers; empty cells skipped.
    assert(rows.contains(("85025", "Aetna", "30.00", "per diem", "")))
    assert(rows.contains(("85025", "BCBS", "25.00", "", "")))
    assert(out.count() == 4)
  }

  private val jsonMrf =
    """{ "hospital_name": "General", "hospital_location": "Atlanta",
      |  "hospital_address": "1 Main St, Atlanta, GA 30303",
      |  "last_updated_on": "2024-07-01", "version": "2.0.0",
      |  "standard_charge_information": [
      |    { "description": "Knee MRI",
      |      "code_information": [ {"code": "73721", "type": "CPT"},
      |                            {"code": "470", "type": "MS-DRG"},
      |                            {"code": "X", "type": "FOO"} ],
      |      "standard_charges": [
      |        { "gross_charge": 250.0, "discounted_cash": 200.0, "setting": "outpatient",
      |          "minimum": 100.0, "maximum": 300.0,
      |          "payers_information": [
      |            { "payer_name": "Aetna [AET01]", "plan_name": "PPO",
      |              "methodology": "fee schedule", "standard_charge_dollar": 150.0,
      |              "additional_payer_notes": "pn" },
      |            { "payer_name": "BCBS", "plan_name": "HMO",
      |              "methodology": "per diem", "estimated_amount": 90.5 } ] },
      |        { "gross_charge": 260.0, "discounted_cash": 210.0, "setting": "inpatient" } ] } ] }
      |""".stripMargin

  test("json extract: 3-level explode, type normalization, payer split, numeric→string") {
    val p = write("mrf.json", jsonMrf)
    val out = JsonExtractor.extractFile(spark, p, "General", "30303").cache()
    assert(out.columns.toSeq == graft.core.Schemas.CanonicalColumns)
    // 2 valid codes × (1 charge × 2 payers + 1 payerless charge) = 6 rows
    // (FOO rejected; payerless charges keep their gross/cash with "" payer).
    assert(out.count() == 6)
    val rows = out.collect().map(r => (r.getString(2), r.getString(3),
      r.getString(7), r.getString(8), r.getString(10), r.getString(18))).toSet
    assert(rows.contains(("73721", "CPT", "Aetna", "AET01", "150.0", "")))
    assert(rows.contains(("470", "DRG", "BCBS", "", "", "90.5")))
    assert(rows.contains(("73721", "CPT", "", "", "", "")))
    val payerless = out.filter(col("insurance payer name") === "" &&
      col("code") === "470").head()
    assert(payerless.getAs[String]("gross charge") == "260.0")
    val meta = JsonExtractor.metadata(JsonExtractor.readMrf(spark, p))
    assert(meta("version") == "2.0.0" && meta("hospital_name") == "General")
  }

  test("S5 schema explorer lists nested key paths with types") {
    val p = write("mrf.json", jsonMrf)
    val paths = graft.util.SchemaExplorer.exploreJsonFile(spark, p).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(paths("hospital_name") == "string")
    assert(paths("standard_charge_information") == "array")
    assert(paths.contains("standard_charge_information.item.code_information.item.code"))
  }

  test("readBody over a directory drops metadata lines per file, not just globally") {
    val dir = Files.createTempDirectory("graft-multi").toString
    Files.writeString(Paths.get(s"$dir/a.csv"), tallCsv)
    Files.writeString(Paths.get(s"$dir/b.csv"), tallCsv)
    val body = MrfCsv.readBody(spark, dir)
    // 3 data rows per file; metadata lines of BOTH files must be gone.
    assert(body.count() == 6)
    assert(body.filter(col("description") === "hospital_name").count() == 0)
    assert(body.filter(col("description") === "General").count() == 0)
  }

  test("empty/malformed JSON MRF fails loudly instead of extracting nothing") {
    val p = write("empty.json", "   ")
    val e = intercept[IllegalArgumentException] {
      JsonExtractor.metadata(JsonExtractor.readMrf(spark, p))
    }
    assert(e.getMessage.contains("zero rows"))
  }

  test("MRF whole-file and streamed-split regimes extract identical rows and metadata") {
    // the two-regime extractFile (r15: the 8g/100× screen caught the
    // one-row whole-document materialization) must be a pure plan
    // switch: same canonical rows, same metadata, from either path
    val p = graft.queries.JsonMrfFixture.writeFixture(spark, sf("sf0.001"))
    val whole = JsonExtractor.extract(JsonExtractor.readMrf(spark, p), "H", "Z")
      .collect().map(_.toString).sorted.toSeq
    val splitDir = java.nio.file.Files.createTempDirectory("graft-split-test")
    val meta = JsonExtractor.splitMrf(p, splitDir.toString)
    val rows = spark.read.schema(JsonExtractor.sciSchema)
      .json(splitDir.resolve("sci.jsonl").toString)
    val split = JsonExtractor.extractFromSci(
      rows.select(org.apache.spark.sql.functions.struct(
        col("description"), col("drug_information"),
        col("code_information"), col("standard_charges")).as("sci")),
      "H", "Z").collect().map(_.toString).sorted.toSeq
    assert(whole.nonEmpty && whole == split)
    val wholeMeta = JsonExtractor.metadata(JsonExtractor.readMrf(spark, p))
    assert(wholeMeta.forall { case (k, v) => meta.getOrElse(k, "") == v })
  }

  test("PERMISSIVE malformed ingest: quarantine classes, counts, and parsed-field retention") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("code", StringType),
      StructField("qty", IntegerType), StructField("price", DoubleType)))
    // one line per class: clean / short / long / unconvertible field
    val csv = write("mal.csv",
      """A,1,1.5
        |B,2
        |C,3,3.5,EXTRA
        |D,zz,4.5
        |""".stripMargin)
    val rows = MalformedIngest.readCsvPermissive(spark, csv, schema)
      .collect().map(r => (r.getString(0),
        Option(r.get(1)), Option(r.get(2)),
        r.getString(3) != null)).sortBy(_._1).toSeq
    assert(rows == Seq(
      ("A", Some(1), Some(1.5), false),  // clean: not quarantined
      ("B", Some(2), None, true),        // short: prefix kept, padded null
      ("C", Some(3), Some(3.5), true),   // long: extra token dropped
      ("D", None, Some(4.5), true)))     // bad field: later fields kept
    val (clean, quarantine) = MalformedIngest.quarantineSplit(
      MalformedIngest.readCsvPermissive(spark, csv, schema))
    assert(clean.count() == 1 && quarantine.count() == 3)
    // the quarantine retains the raw line, whole
    assert(quarantine.select(col(MalformedIngest.CorruptCol)).collect()
      .map(_.getString(0)).sorted.toSeq == Seq("B,2", "C,3,3.5,EXTRA", "D,zz,4.5"))

    val jl = write("mal.jsonl",
      """{"code":"A","qty":1,"price":1.5}
        |{"code":"B","qty":2,
        |not json at all
        |{"code":"D","qty":4,"price":4.5}
        |""".stripMargin)
    val j = MalformedIngest.readJsonPermissive(spark, jl, schema)
    val (jc, jq) = MalformedIngest.quarantineSplit(j)
    assert(jc.count() == 2 && jq.count() == 2)
    // corrupt JSON rows null every schema field
    assert(jq.filter(col("code").isNotNull || col("qty").isNotNull ||
      col("price").isNotNull).count() == 0)
  }
}
