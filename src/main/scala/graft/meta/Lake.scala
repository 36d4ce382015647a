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

  /** Idempotent re-process: replace ONE campus partition with a fresh
    * frame, leaving every other partition untouched — dynamic partition
    * overwrite, the write mode a backfill/repair job needs (static
    * overwrite mode would truncate the whole lake). */
  def overwriteCharges(canonical: DataFrame, lakePath: String,
      system: String, campusId: String): Unit =
    canonical
      .withColumn("healthcare_system", lit(system))
      .withColumn("campus_id", lit(campusId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
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
    * work); content is the same rows. Returns (filesBefore, filesAfter).
    *
    * NOT transactional: the caller must ensure no concurrent append to
    * THIS partition while it runs (an append racing the swap window can be
    * double-counted) — the standard limitation of compacting a raw parquet
    * layout; concurrent access needs a table format on top. The swap is
    * crash-recoverable: originals move to a `.trash-` sibling before the
    * compacted files move in, every filesystem mutation's result is
    * checked (a false return aborts loudly with both directories intact),
    * and leftover `.compact-`/`.trash-` dirs from an interrupted run make
    * the next invocation fail with recovery instructions instead of
    * silently deleting the only remaining copy. */
  def compactCampus(spark: SparkSession, lakePath: String, system: String,
      campusId: String, targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    require(targetBytes > 0, "targetBytes must be positive")
    val dir = new org.apache.hadoop.fs.Path(
      s"$lakePath/healthcare_system=${escapePathName(system)}" +
        s"/campus_id=${escapePathName(campusId)}")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(dir), s"no such partition: $dir")
    val tmp = new org.apache.hadoop.fs.Path(dir.getParent, s".compact-${dir.getName}")
    val trash = new org.apache.hadoop.fs.Path(dir.getParent, s".trash-${dir.getName}")
    require(!fs.exists(tmp) && !fs.exists(trash),
      s"leftover $tmp / $trash from an interrupted compaction — recover its " +
        "files into the partition (or remove them if the partition is complete) first")
    def dataFiles = fs.listStatus(dir).filter { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")
    }
    val before = dataFiles
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (before.length <= nOut) return (before.length, before.length)
    spark.read.parquet(dir.toString).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    def mustRename(from: org.apache.hadoop.fs.Path, to: org.apache.hadoop.fs.Path): Unit =
      require(fs.rename(from, to), s"rename failed: $from -> $to (no data deleted)")
    // swap: originals to trash (recoverable), compacted files in, trash out
    require(fs.mkdirs(trash), s"cannot create $trash")
    before.foreach(st => mustRename(st.getPath,
      new org.apache.hadoop.fs.Path(trash, st.getPath.getName)))
    fs.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(st => mustRename(st.getPath,
        new org.apache.hadoop.fs.Path(dir, st.getPath.getName)))
    require(fs.delete(tmp, true), s"cannot remove $tmp")
    require(fs.delete(trash, true), s"cannot remove $trash")
    (before.length, dataFiles.length)
  }
}
