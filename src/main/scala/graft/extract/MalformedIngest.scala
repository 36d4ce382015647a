package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Corrupt-tolerant ingest for the extractor family — a real MRF corpus
  * is full of ragged CSV rows, half-written uploads and truncated JSON,
  * and a 100 TB ingest cannot abort on the first bad byte. Both readers
  * run Spark's PERMISSIVE mode with an explicit `_corrupt_record`
  * column, and [[quarantineSplit]] mirrors the cleaner's contract: the
  * pipeline continues over the clean side while every undecodable
  * record is retained, whole, for audit — never silently dropped
  * (DROPMALFORMED), never a job abort (FAILFAST).
  *
  * Semantics pinned by the extract_csv_malformed / extract_json_malformed
  * gates and ExtractorSpec (measured on Spark 4.1.2 — the docs' "token
  * count mismatch is not corruption" claim is NOT what the engine does
  * once `columnNameOfCorruptRecord` is configured):
  *   - CSV: ragged rows — short (parsed prefix kept, missing fields
  *     null) AND long (all schema fields parsed, extra token dropped) —
  *     are BOTH captured in `_corrupt_record`, as is an unconvertible
  *     field (that field null, later fields still parsed: partial
  *     results). The parsed fields ride along in every case.
  *   - JSON: an unparseable document nulls every schema field and
  *     captures the raw line.
  */
object MalformedIngest {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType))

  /** Headerless CSV under `schema`, PERMISSIVE, corrupt lines captured. */
  def readCsvPermissive(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** JSON-lines under `schema`, PERMISSIVE, corrupt lines captured. */
  def readJsonPermissive(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** (clean, quarantine): clean rows drop the corrupt column; the
    * quarantine keeps the full raw record plus whatever fields did
    * parse — the same two-sink shape as the cleaner's violations path.
    * The parsed frame is pinned (Memo.ownedPersist, reclaimed by the
    * harness per gate): Spark refuses corrupt-column-only projections
    * over RAW files (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and one scan
    * feeding both sinks is the right plan anyway. */
  def quarantineSplit(df: DataFrame): (DataFrame, DataFrame) = {
    val pinned = graft.core.Memo.ownedPersist(df)
    (pinned.filter(col(CorruptCol).isNull).drop(CorruptCol),
      pinned.filter(col(CorruptCol).isNotNull))
  }
}
