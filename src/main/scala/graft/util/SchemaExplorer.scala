package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** S5 — JSON key-path exploration (json_explorer.py:6-18).
  *
  * The reference streams ijson events over a multi-GB file to list distinct
  * key paths with their event types. Spark's sampled schema inference already
  * produces that structure; this flattens a StructType to (path, type) rows —
  * the same artifact the reference's explorer writes, derived from the scan
  * instead of a second streaming pass.
  */
object SchemaExplorer {

  def keyPaths(dt: DataType, prefix: String = ""): Seq[(String, String)] = dt match {
    case s: StructType =>
      s.fields.toSeq.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        (p, typeName(f.dataType)) +: keyPaths(f.dataType, p)
      }
    case ArrayType(et, _) => keyPaths(et, s"$prefix.item")
    case _ => Seq.empty
  }

  private def typeName(dt: DataType): String = dt match {
    case _: StructType => "map"
    case _: ArrayType => "array"
    case t => t.typeName
  }

  /** The explorer's output as a DataFrame: one row per (path, type). */
  def explore(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    keyPaths(df.schema).toDF("path", "type")
  }

  /** Convenience: explore a JSON file the way batch_json_explorer drives it. */
  def exploreJsonFile(spark: SparkSession, path: String): DataFrame =
    explore(spark, spark.read.option("multiLine", "true").json(path))

  /** batch_json_explorer.py:8-62 — key-path listing for every JSON MRF of
    * one healthcare system (registry-driven), tagged by campus_id. */
  def exploreSystem(spark: SparkSession, registry: DataFrame,
      system: String, baseDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, lower}
    import spark.implicits._
    val rows = registry
      .filter(lower(col("healthcare_system")) === system.toLowerCase &&
        lower(col("structure")) === "json")
      .select(col("campus_id"), col("healthcare_system"), col("raw_filename"))
      .collect()
    val frames = rows.toSeq.map { r =>
      val sys = r.getString(1).toLowerCase.replace(" ", "_")
      val path = s"$baseDir/data/raw data/$sys/${r.getString(2)}"
      exploreJsonFile(spark, path).withColumn("campus_id", lit(r.getString(0)))
    }
    frames.reduceOption(_ union _)
      .getOrElse(Seq.empty[(String, String, String)].toDF("path", "type", "campus_id"))
  }
}
