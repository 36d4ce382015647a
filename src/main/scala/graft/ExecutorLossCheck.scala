package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executor-LOSS recovery check (`ExecutorLossCheck sfDir`): under
  * `local-cluster[2,16,4096]`, HALT one executor JVM from inside a task
  * (Runtime.halt — the process dies mid-stage, exactly like a container
  * OOM-kill or a preempted node) and require the job to finish with
  * results identical to an uninjected run. This is the one failure mode
  * `local[*]` can never produce: task RETRY was pinned by
  * RetryIdempotenceSpec, but executor loss additionally exercises
  * relaunch, shuffle-fetch failure handling, and block re-replication.
  *
  * Three surfaces, each compared to its clean run in the same session:
  *   1. deterministic shuffle (exchange + window) — lost shuffle map
  *      output must be regenerated;
  *   2. broadcast + bounded TopKAgg ranking — partial aggregate buffers
  *      rebuilt on the relaunched executor;
  *   3. the distributed star-contraction CC loop in RELIABLE-checkpoint
  *      mode (sc.setCheckpointDir) — rerootEager's localCheckpoint
  *      blocks die with their executor BY DESIGN (Spark's documented
  *      trade); the checkpoint-dir knob is the cluster answer, and this
  *      case proves the loop survives losing an executor between
  *      rounds.
  *
  * Prints one JSON line {"executor_loss_check":{...}}; exit 1 on any
  * mismatch. Needs SPARK_HOME + SPARK_SCALA_VERSION like ClusterCheck.
  */
object ExecutorLossCheck {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_CLUSTER_MASTER",
        "local-cluster[2,16,4096]"))
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.memory", "4g")
      .config("spark.task.maxFailures", "4")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val removed = new AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onExecutorRemoved(
            e: org.apache.spark.scheduler.SparkListenerExecutorRemoved): Unit = {
          removed.incrementAndGet(); ()
        }
      })

    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq

    val results = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def check(name: String)(clean: => DataFrame)(injected: => DataFrame): Unit = {
      val status = try {
        val before = removed.get()
        val c = rows(clean)
        val i = rows(injected)
        if (removed.get() <= before) "no_executor_lost"
        else if (c == i && c.nonEmpty) "pass"
        else s"mismatch:${c.size}vs${i.size}"
      } catch { case e: Throwable =>
        s"error:${e.getClass.getSimpleName}:${
          Option(e.getMessage).getOrElse("").take(120).replace('"', '\'')}"
      }
      System.err.println(s"[executor-loss] $name: $status")
      results += ((name, status))
    }

    val orders = graft.core.Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey").as("doc_id"))

    // 1. deterministic shuffle across an executor death mid-scan
    check("shuffle_deterministic")(
      graft.ops.Shaping.shuffleDeterministic(orders, "doc_id", 4))(
      graft.ops.Shaping.shuffleDeterministic(
        orders.filter(haltOnce(1)), "doc_id", 4))

    // 2. broadcast dim + bounded top-k aggregate across a death
    def topkFrame(inject: Boolean): DataFrame = {
      val li = graft.core.Tables.table(spark, sfDir, "lineitem")
        .select(col("l_partkey"), col("l_orderkey"), col("l_quantity"))
      val base = if (inject) li.filter(haltOnce(2)) else li
      base.groupBy(col("l_partkey"))
        .agg(graft.ops.TopKAgg.topK(
          col("l_quantity").cast("double"), col("l_orderkey"), 3).as("tk"))
        .select(col("l_partkey"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("l_partkey"), col("pos"), col("e.id"), col("e.score"))
    }
    check("broadcast_topk_agg")(topkFrame(false))(topkFrame(true))

    // 3. star-contraction CC, RELIABLE-checkpoint mode, executor killed
    //    while the loop runs (the kill filter sits in the pair scan, so
    //    the death lands inside the loop's first materializations)
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft-exec-loss-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    // deterministic ring fixture: ids are a pure function of the full
    // scan (a limit() here would re-draw different rows per evaluation)
    val chain = orders
      .select((col("doc_id") % 3000).as("id"))
      .distinct()
      .select(col("id").as("id_a"), ((col("id") + 1) % 3000).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    // clean side = the driver union-find regime (ground truth, no
    // reroot), injected side = the DISTRIBUTED star loop in reliable
    // mode with the executor killed — one comparison proves both
    // reliable-mode parity and loss recovery
    check("cc_star_reliable_ckpt")(
      graft.ops.Dedup.connectedComponents(chain, "id_a", "id_b"))(
      graft.ops.Dedup.connectedComponents(chain.filter(haltOnce(3)),
        "id_a", "id_b", localEdgeThreshold = 0L))

    val nPass = results.count(_._2 == "pass")
    val gates = results.map { case (n, st) => s""""$n":"$st"""" }.mkString(",")
    println(s"""{"executor_loss_check":{"pass":$nPass,""" +
      s""""fail":${results.size - nPass},""" +
      s""""executors_removed":${removed.get()},"cases":{$gates}}}""")
    spark.stop()
    if (nPass != results.size) sys.exit(1)
  }

  /** Always-true predicate whose FIRST evaluation of partition 0,
    * attempt 0, HALTS the hosting executor JVM — process death, not an
    * exception. Distinct markers give each case its own kill. */
  private def haltOnce(marker: Int): org.apache.spark.sql.Column =
    udf((x: Long) => ExecutorLossCheck.haltFirstAttempt(marker))
      .asNondeterministic().apply(lit(0L))

  def haltFirstAttempt(marker: Int): Boolean = {
    val tc = TaskContext.get()
    // Executor processes only (never the driver). The once-latch is a
    // FILESYSTEM sentinel, not JVM state: after the halt, cache-miss
    // recomputes of partition 0 in LATER stages run as fresh attempt-0
    // tasks on the replacement executor, and an in-memory flag would
    // have died with the halted JVM — every such recompute would kill
    // again until the app's executor-failure budget aborted it.
    // createNewFile is atomic across the host's processes.
    if (tc != null && tc.partitionId() == 0 &&
        !"driver".equals(org.apache.spark.SparkEnv.get.executorId)) {
      val latch = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-exec-halt-${org.apache.spark.SparkEnv.get.conf.getAppId}-$marker")
      if (latch.createNewFile()) {
        System.err.println(s"[executor-loss] halting executor " +
          s"${org.apache.spark.SparkEnv.get.executorId} (marker $marker)")
        Runtime.getRuntime.halt(137)
      }
    }
    true
  }
}
