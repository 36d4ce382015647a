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

  /** Small-files compaction for one partition directory — the maintenance
    * job an append-per-batch lake needs: each `writeCharges` append adds
    * task-count files, and a year of daily appends turns a campus partition
    * into thousands of tiny parquet files whose open/footer cost dominates
    * scans. Rewrites the partition to `ceil(bytes / targetBytes)` files
    * (coalesce — no shuffle, this is an IO re-bin, not a repartition of
    * work) via an adjacent temp directory and an atomic-ish swap; content
    * is byte-for-byte the same rows. Returns (filesBefore, filesAfter). */
  def compactCampus(spark: SparkSession, lakePath: String, system: String,
      campusId: String, targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val dir = new org.apache.hadoop.fs.Path(
      s"$lakePath/healthcare_system=$system/campus_id=$campusId")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(dir), s"no such partition: $dir")
    def dataFiles = fs.listStatus(dir).filter { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")
    }
    val before = dataFiles
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (before.length <= nOut) return (before.length, before.length)
    val tmp = new org.apache.hadoop.fs.Path(dir.getParent,
      s".compact-${dir.getName}")
    fs.delete(tmp, true)
    spark.read.parquet(dir.toString).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap: remove old data files, move compacted ones in
    before.foreach(st => fs.delete(st.getPath, false))
    fs.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(st => fs.rename(st.getPath,
        new org.apache.hadoop.fs.Path(dir, st.getPath.getName)))
    fs.delete(tmp, true)
    (before.length, dataFiles.length)
  }
}
