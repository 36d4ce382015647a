package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming-query tuning seams.
  *
  * `spark.sql.shuffle.partitions` is read ONCE at stream start and frozen
  * into the query's checkpoint — it is also the state-store count (a
  * stream-stream join runs FOUR stores per partition). Sizing it to the
  * stream's actual key volume is therefore a deliberate per-query
  * decision in production, not an inherited batch default; for the gate
  * fixtures (≤100k events) 32 stores are pure fixed overhead per
  * micro-batch. The helper scopes the override to the stream's
  * start/drain and restores the session default for the batch plans
  * around it. Gates run sequentially in Verify/Bench, so the temporary
  * session-conf mutation cannot leak into a concurrent plan.
  */
object StreamTuning {

  /** Partition count for gate-scale streaming state: enough to exercise
    * real parallel state stores, small enough that store setup does not
    * dominate a micro-batch. */
  val GateStatePartitions = 8

  def withShufflePartitions[T](s: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try f finally s.conf.set(key, old)
  }
}
