package graft.meta

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned parquet lake for canonical charges — the at-scale sink the
  * per-campus CSV artifacts feed into. Hive-style partitioning by
  * (healthcare_system, campus_id) mirrors the reference's per-system,
  * per-campus directory layout and turns campus/system lookups into
  * partition-pruned scans (PartitionFilters, zero data read outside the
  * requested partitions) instead of full-lake filters.
  */
object Lake {

  /** Append one campus's canonical frame into the lake. */
  def writeCharges(canonical: DataFrame, lakePath: String,
      system: String, campusId: String): Unit =
    canonical
      .withColumn("healthcare_system", lit(system))
      .withColumn("campus_id", lit(campusId))
      .write.mode(SaveMode.Append)
      .partitionBy("healthcare_system", "campus_id")
      .parquet(lakePath)

  /** Campus read — prunes to one partition directory. */
  def readCampus(spark: SparkSession, lakePath: String,
      system: String, campusId: String): DataFrame =
    spark.read.parquet(lakePath)
      .filter(col("healthcare_system") === system && col("campus_id") === campusId)

  /** System read — prunes to one system subtree. */
  def readSystem(spark: SparkSession, lakePath: String, system: String): DataFrame =
    spark.read.parquet(lakePath).filter(col("healthcare_system") === system)
}
