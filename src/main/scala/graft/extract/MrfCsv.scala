package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Shared CSV plumbing for MRF extractors.
  *
  * Reference MRF CSVs carry 2 metadata lines (row0 = keys, row1 = values)
  * before the real header (tall_format_csv_extractor.py:66-71,
  * wide_format_csv_extractor.py:80-85). The metadata read is a tiny
  * driver-side operation (S2/U4); the body read drops those 2 lines in a
  * single pass (no count job) and parses the remainder as an all-string
  * header CSV (S3, dtype=str semantics).
  */
object MrfCsv {

  /** S2/U4 — metadata transpose: first two physical lines → Map(key→value),
    * missing/short values → "". */
  def readMetadata(spark: SparkSession, path: String): Map[String, String] = {
    val two = spark.sparkContext.textFile(path).take(2)
    if (two.length < 2) return Map.empty
    val keys = splitCsvLine(two(0))
    val values = splitCsvLine(two(1))
    keys.zipAll(values, "", "").filter(_._1.nonEmpty).toMap
  }

  // Minimal RFC-4180 field splitter for the 2 driver-side metadata lines.
  private def splitCsvLine(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
        else if (c == '"') inQ = false
        else cur += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  /** S3 — body scan: skip the 2 metadata lines (dropped from the first file
    * partition only — single pass, unlike a zipWithIndex count job), then
    * parse as header CSV with every column StringType.
    *
    * Divergence note: dropping physical lines assumes the 2 metadata rows
    * contain no embedded newlines (true of CMS MRFs); pandas' parser would
    * tolerate them. Quoted newlines in the *body* are likewise not supported
    * by the line-based pre-pass — documented, body rows are single-line in
    * the reference corpus. */
  def readBody(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    // Resolve the glob driver-side and drop the 2 metadata lines PER FILE
    // (a global partition-0 drop would keep later files' metadata lines as
    // body rows when a directory/glob of MRFs is read).
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(hPath)) match {
      case Some(sts) if sts.nonEmpty =>
        sts.toSeq.flatMap { st =>
          if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
          else Seq(st)
        }.map(_.getPath.toString)
      case _ => Seq(path) // let the reader raise its own missing-file error
    }
    val rdds = files.map { f =>
      spark.sparkContext.textFile(f)
        .mapPartitionsWithIndex { (idx, it) => if (idx == 0) it.drop(2) else it }
    }
    val lines: Dataset[String] =
      rdds.reduce(_ union _).toDS()
    spark.read
      .option("header", "true")
      .option("inferSchema", "false") // dtype=str
      .csv(lines)
    // Known csv(Dataset) caveat: body lines byte-identical to the header
    // line are treated as repeated headers and dropped; MRF data rows never
    // equal the header row in practice.
  }
}
