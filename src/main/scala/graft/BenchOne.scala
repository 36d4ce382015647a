package graft
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Single-query bench harness (builder-side iteration):
  * `BenchOne <names,csv> <sfDir> <reps> [warmDir]`.
  *
  * Env knobs:
  *  - SPARK_GRAFT_EXTRA_CONF: `k=v;k=v` Spark confs layered on the
  *    builder defaults (e.g. AQE skew-join thresholds for the skew
  *    canary A/Bs).
  *  - SPARK_GRAFT_TASK_STATS=1: per-query task-time skew report — for
  *    the stages with the largest max task time, print n/p50/max task
  *    millis. The skew canary's "did one task stall" evidence.
  */
object BenchOne {

  private final class TaskStats extends org.apache.spark.scheduler.SparkListener {
    // (duration, jvmGcTime, memSpilled, diskSpilled) per task — GC share
    // separates allocation-pressure decodes from genuine compute in the
    // skew report; spill bytes are the tight-heap screen's evidence that
    // memory pressure degraded to SPILL, not OOM (r15 verdict item 2).
    val byStage = new java.util.concurrent.ConcurrentHashMap[
      Int, mutable.ArrayBuffer[(Long, Long, Long, Long)]]()
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val buf = byStage.computeIfAbsent(t.stageId,
        _ => mutable.ArrayBuffer[(Long, Long, Long, Long)]())
      val m = Option(t.taskMetrics)
      val gc = m.map(_.jvmGCTime).getOrElse(0L)
      val ms = m.map(_.memoryBytesSpilled).getOrElse(0L)
      val ds = m.map(_.diskBytesSpilled).getOrElse(0L)
      buf.synchronized { buf += ((t.taskInfo.duration, gc, ms, ds)) }
    }
    def reportAndReset(label: String): Unit = {
      import scala.jdk.CollectionConverters._
      val all = byStage.asScala.toSeq
      val rows = all.map { case (sid, recs) =>
        val d = recs.map(_._1).sorted
        val gcPct = 100.0 * recs.map(_._2).sum / math.max(d.sum, 1L)
        (sid, d.length, d(d.length / 2), d.last, gcPct)
      }.sortBy(-_._4).take(5)
      rows.foreach { case (sid, n, p50, max, gcPct) =>
        println(f"$label stage=$sid tasks=$n p50=${p50}ms max=${max}ms skew=${max.toDouble / math.max(p50, 1)}%.1fx gc=$gcPct%.0f%%")
      }
      val memMb = all.flatMap(_._2).map(_._3).sum / (1024.0 * 1024.0)
      val diskMb = all.flatMap(_._2).map(_._4).sum / (1024.0 * 1024.0)
      println(f"$label SPILL mem=${memMb}%.0fMB disk=${diskMb}%.0fMB")
      byStage.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(','); val sfDir = args(1); val reps = args(2).toInt
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // Same wide-then-coalesce default as Bench (see there).
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      // Cached plans skip AQE coalescing without this (see Bench).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stats = if (sys.env.get("SPARK_GRAFT_TASK_STATS").contains("1")) {
      val l = new TaskStats; spark.sparkContext.addSparkListener(l); Some(l)
    } else None
    graft.core.Tables.table(spark, sfDir, "documents").count()
    // Optional 4th arg: warmup dir (mirrors Bench's untimed sf0.001 codegen
    // warmup so single-query timings track the driver's cold-at-sf run).
    if (args.length > 3) names.foreach { name =>
      try SparkEntry.queries(name)(spark, args(3)).count()
      catch { case _: Throwable => () }
    }
    stats.foreach(_.byStage.clear())
    names.foreach { name =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        // A failing gate is a DATA POINT (the tight-heap screen reads
        // "completed with spill" vs "died"), not a reason to lose the
        // rest of the list — report and continue.
        try {
          SparkEntry.queries(name)(spark, sfDir).count()
          println(f"$name RUN$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        } catch { case e: Throwable =>
          println(f"$name RUN$i: FAILED after ${(System.nanoTime() - t0) / 1e9}%.2f s " +
            s"(${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)})")
        }
        stats.foreach(_.reportAndReset(s"$name RUN$i"))
        // Per-invocation operator scratch: release after the action so
        // reps measure the op, not an ever-growing storage pool.
        graft.core.Memo.releaseOwned(spark)
      }
    }
    spark.stop()
  }
}
