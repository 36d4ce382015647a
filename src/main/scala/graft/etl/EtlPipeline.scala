package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.clean.{Cleaning, Rules}
import graft.core.Schemas
import graft.extract.{JsonExtractor, MrfCsv, TallExtractor, WideExtractor}
import graft.meta.Devlog

/** The flagship end-to-end pipeline — the Spark re-expression of
  * ETL_pipeline.py main() (SURVEY §3.1):
  *
  *   registry lookup (S1/P1) → format dispatch (registry.structure,
  *   ETL_pipeline.py:19-38,61-72) → EXTRACT to the canonical CSV (S8/S9) →
  *   CLEAN (quarantine S10, counters, transparency score) → devlog append
  *   (S11) → registry update (S12/J4).
  *
  * The reference crosses phases through files on disk; preserved here (the
  * extracted/cleaned CSVs are the pipeline's public artifacts), but each
  * phase is one distributed logical plan instead of a chunk loop. Layout
  * mirrors the reference: `data/raw data|extracted data|cleaned data|logs/
  * {system}/...` keyed by the system slug (F15) — which doubles as the
  * partition key a 1000-hospital run would parallelize over.
  */
object EtlPipeline {

  final case class RunResult(
      campusId: String, system: String, structure: String,
      extractedRows: Long, cleanRows: Long, violationRows: Long,
      duplicatesDropped: Long, transparencyScore: Double,
      extractedPath: String, cleanedPath: String, quarantinePath: String,
      outputMb: Double)

  /** Known `structure` values (registry dispatch, ETL_pipeline.py:61-72). */
  val Structures: Set[String] = Set("json", "tall csv", "wide csv")

  def run(spark: SparkSession, registryPath: String, campusId: String,
      baseDir: String, processedBy: String,
      formatOverride: Option[String] = None,
      lakePath: Option[String] = None): RunResult = {

    // S1/P1 — registry scan + key lookup; error when absent.
    val registry = spark.read.parquet(registryPath)
    val rows = registry.filter(col("campus_id") === lit(campusId)).limit(1).collect()
    require(rows.nonEmpty, s"Campus ID '$campusId' not found in hospital registry.")
    val rec = rows.head
    def field(n: String): String =
      Option(rec.getAs[Any](n)).map(_.toString).getOrElse("")
    val system = field("healthcare_system").toLowerCase.replace(" ", "_") // F15
    val structure = formatOverride.getOrElse(field("structure")).toLowerCase
    require(Structures.contains(structure), s"Unknown structure '$structure'")
    val hospitalName = field("hospital_name")
    val zipCode = field("zip_code")
    val rawPath = s"$baseDir/data/raw data/$system/${field("raw_filename")}"

    // EXTRACT — dispatch to the structure's extractor; capture the MRF's own
    // metadata (version/last_updated_on/address come from the FILE, not the
    // registry — tall_format_csv_extractor.py:66-71, ETL_pipeline.py:92-99).
    val (canonical: DataFrame, mrfMeta: Map[String, String]) = structure match {
      case "tall csv" =>
        (TallExtractor.extractFile(spark, rawPath, hospitalName, zipCode),
          MrfCsv.readMetadata(spark, rawPath))
      case "wide csv" =>
        (WideExtractor.extractFile(spark, rawPath, hospitalName, zipCode),
          MrfCsv.readMetadata(spark, rawPath))
      case "json" =>
        val mrf = JsonExtractor.readMrf(spark, rawPath)
        (JsonExtractor.extract(mrf, hospitalName, zipCode),
          JsonExtractor.metadata(mrf))
    }
    val extractedPath = s"$baseDir/data/extracted data/$system/${campusId}_extracted"
    canonical.write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(extractedPath) // S8/S9 (standard quoting)

    // CLEAN — read back all-string (S3 semantics), full pass + rules.
    val extracted = spark.read.option("header", "true")
      .schema(Schemas.canonicalIngest).csv(extractedPath)
    val extractedRows = extracted.count()
    // Fail loud on an empty extract (corrupt MRF, all code types rejected):
    // the reference would crash in its parser; a silent 'cleaned' registry
    // flip on garbage input is worse than an error.
    require(extractedRows > 0,
      s"Extraction produced 0 canonical rows for campus '$campusId' from $rawPath")
    val preDedup = Cleaning.cleanAllPreDedup(extracted).cache()
    val preDedupRows = preDedup.count()
    val tagged = Rules.tagViolations(Cleaning.dedup(preDedup)).cache()
    val (clean, violations) = Rules.split(tagged)

    val cleanedPath = s"$baseDir/data/cleaned data/$system/${campusId}_cleaned"
    val quarantinePath = s"$baseDir/data/logs/rules violations/$system/${campusId}_rules_violated"
    clean.write.mode(SaveMode.Overwrite).option("header", "true").csv(cleanedPath)
    // Optionally land the cleaned rows in the partitioned lake (the
    // cross-hospital analytical sink; per-campus CSVs remain the reference-
    // layout artifacts).
    lakePath.foreach(lp =>
      graft.meta.Lake.writeCharges(
        spark.read.option("header", "true").schema(Schemas.canonicalIngest)
          .csv(cleanedPath),
        lp, system, campusId))
    violations.write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(quarantinePath) // S10

    val summary = Rules.summarize(tagged)
    val summaryRow = summary.head()
    val cleanRows = summaryRow.getAs[Long]("total_rows_cleaned")
    // Duplicates dropped = rows removed by dedup itself (violation rows are
    // counted as distinct tagged rows, not per-rule, for this delta).
    val violationRows = violations.count()
    val dupsDropped = preDedupRows - (cleanRows + violationRows)

    // S11 — devlog append (seq = ms timestamp for L1 ordering). The 4dp
    // devlog rounding (cleaning_utils.py:231) is what flows to the registry
    // and the run result.
    val meta = Devlog.metadataFromSummary(summary, dupsDropped)
    val score = meta.final_transparency_score
    val devlogPath = s"$baseDir/data/logs/devlogs/$system/${campusId}_devlog"
    Devlog.append(spark, devlogPath, Devlog.DevlogEntry(
      campusId,
      mrfMeta.getOrElse("hospital_address", field("hospital_address")),
      mrfMeta.getOrElse("version", ""),
      mrfMeta.getOrElse("last_updated_on", ""),
      meta.final_transparency_score,
      devlogSeq(), meta))

    // S12/J4 — registry refresh (collect-then-rewrite: the registry is a
    // small dimension and the source path is being overwritten).
    val updated = Devlog.updateRegistry(registry, Devlog.latest(spark, devlogPath),
      campusId, processedBy, Devlog.nowString(spark))
    val frozen = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(updated.collect(): _*)),
      updated.schema)
    frozen.write.mode(SaveMode.Overwrite).parquet(registryPath)

    // A11 — output size bookkeeping via Hadoop FS.
    val fs = new Path(cleanedPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val outputMb = fs.getContentSummary(new Path(cleanedPath)).getLength / 1024.0 / 1024.0

    preDedup.unpersist(); tagged.unpersist()
    RunResult(campusId, system, structure, extractedRows, cleanRows,
      violationRows, dupsDropped, score, extractedPath, cleanedPath,
      quarantinePath, outputMb)
  }

  /** Devlog ordering value: nanoseconds since epoch (millis would tie for
    * two runs in the same ms, making Devlog.latest nondeterministic). */
  private def devlogSeq(): Long = {
    val now = java.time.Instant.now()
    now.getEpochSecond * 1000000000L + now.getNano
  }

  /** Batch run over every registry row of one healthcare system — the
    * 1000-hospital seam: each campus is an independent pipeline over its own
    * files, so a fleet deployment parallelizes by submitting these as
    * separate jobs (or one job per executor-group); within a campus the
    * plans themselves are distributed. Sequential here (local mode). */
  def runSystem(spark: SparkSession, registryPath: String, system: String,
      baseDir: String, processedBy: String): Seq[RunResult] = {
    val ids = systemRegistry(spark.read.parquet(registryPath), system)
      .select(col("campus_id")).collect().map(_.getString(0)).toSeq
    ids.map(id => run(spark, registryPath, id, baseDir, processedBy))
  }

  /** P9 — registry rows of one healthcare system (batch_json_explorer.py:30). */
  def systemRegistry(registry: DataFrame, system: String): DataFrame =
    registry.filter(lower(col("healthcare_system")) === system.toLowerCase)
}
