package graft.streaming

import java.util.concurrent.atomic.AtomicLong

/** Run-scoped scratch root for the streaming gates' file feeds and
  * checkpointed state stores.
  *
  * The gates exercise the real `readStream → stateful op → append sink`
  * path by dumping their fixture slice as a parquet feed and letting the
  * file source replay it. Hosting those feeds — and the per-query
  * checkpoints with their state stores — in `java.io.tmpdir` made the
  * family's timings track DISK contention instead of the streaming path:
  * the r12 census measured same-JVM rep spreads of 2× on
  * streaming_watermark_drop purely from tmpdir FS load (VERDICT r12
  * item 5). A memory-backed location takes the foreign variable out of
  * the measurement; at gate scale (sf0.1 events ≈ tens of MB, window /
  * join state far smaller) the footprint is trivial next to `/dev/shm`'s
  * capacity, and production deployments point checkpoints at durable
  * storage anyway — the gates check SEMANTICS, the canary checks scale.
  *
  * Resolution order: `SPARK_GRAFT_STREAM_SCRATCH` env override, else
  * `/dev/shm` when writable, else `java.io.tmpdir`. The root is
  * per-process (pid-suffixed) and removed by a JVM shutdown hook, so
  * concurrent harnesses never collide and nothing leaks across runs.
  */
object StreamScratch {

  private val ckptSeq = new AtomicLong(0L)

  lazy val base: String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_STREAM_SCRATCH", {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) shm.getAbsolutePath
      else sys.props("java.io.tmpdir")
    })
    // The shutdown hook below does not run on SIGKILL/crash, and on a
    // RAM-backed tmpfs an orphaned root costs memory until reboot. Sweep
    // sibling graft-stream-<pid> roots whose pid is no longer alive
    // before creating ours — best-effort, so repeated crashed runs can't
    // accumulate.
    Option(new java.io.File(root).listFiles()).foreach(_.foreach { f =>
      val n = f.getName
      if (f.isDirectory && n.startsWith("graft-stream-")) {
        val pid = n.stripPrefix("graft-stream-")
        val dead = try {
          pid.forall(_.isDigit) && pid.nonEmpty &&
            !java.lang.ProcessHandle.of(pid.toLong).isPresent
        } catch { case _: Throwable => false }
        if (dead) try delete(f) catch { case _: Throwable => () }
      }
    })
    val d = new java.io.File(root,
      "graft-stream-" + java.lang.ProcessHandle.current().pid())
    d.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(d)))
    d.getAbsolutePath
  }

  /** Stable per-(gate, fixture) feed path under [[base]] — callers
    * overwrite (or clear) it themselves, matching the old tmpdir names. */
  def feedDir(name: String): String =
    new java.io.File(base, name).getAbsolutePath

  /** A FRESH checkpoint dir per query start. Uniqueness is load-bearing:
    * an explicit `checkpointLocation` is never auto-deleted by Spark, and
    * reusing one across runs would make the file source skip the
    * already-committed feed offsets — the re-created memory table would
    * come back empty. The shutdown hook reclaims them all. */
  def freshCheckpoint(prefix: String): String =
    new java.io.File(base,
      prefix + "-ckpt-" + ckptSeq.incrementAndGet()).getAbsolutePath

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
    ()
  }
}
