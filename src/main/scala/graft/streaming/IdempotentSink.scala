package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Exactly-once file sink for `foreachBatch` — the replay-safe landing
  * pattern: Structured Streaming guarantees AT-LEAST-once foreachBatch
  * invocation (a batch replays after a crash between sink write and
  * checkpoint commit), so an append sink duplicates rows unless the
  * write is idempotent per batchId.
  *
  * Stage-and-rename: the batch writes to a staging directory, then ONE
  * atomic directory rename publishes it as `data/batch=<id>/`. The
  * published directory IS the commit marker — a replayed batchId sees it
  * and no-ops; a crash mid-write leaves only staging garbage (cleaned on
  * the next attempt), never half-published data. Readers see a batch
  * entirely or not at all. Rename is atomic on HDFS-like and POSIX
  * filesystems; on object stores front it with a committer that provides
  * atomic publish.
  */
object IdempotentSink {

  /** foreachBatch body: `stream.writeStream.foreachBatch(
    * IdempotentSink.appendOnce(outDir) _)`. Returns true when this call
    * published the batch, false when it was already present (replay). */
  def appendOnce(outDir: String)(df: DataFrame, batchId: Long): Boolean = {
    val spark = df.sparkSession
    val fs = new Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(s"$outDir/data/batch=$batchId")
    val staging = new Path(s"$outDir/.staging/batch=$batchId")
    if (fs.exists(target)) return false // replayed batch: already published
    if (fs.exists(staging)) fs.delete(staging, true) // prior failed attempt
    df.write.mode("overwrite").parquet(staging.toString)
    fs.mkdirs(target.getParent)
    require(fs.rename(staging, target),
      s"publish rename failed: $staging -> $target")
    true
  }
}
