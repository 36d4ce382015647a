package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot reconciliation — the "what changed since the last
  * crawl" report that drives incremental re-processing: only `added` and
  * `changed` documents need re-cleaning/re-embedding, `removed` ids need
  * tombstoning downstream, and `unchanged` rows skip the pipeline
  * entirely (at 100 TB the skip IS the optimization).
  */
object Snapshot {

  /** Per-id diff of two snapshots: `added` (only in `cur`), `removed`
    * (only in `old`), `changed` (both, content fingerprint differs),
    * `unchanged`. One full-outer join on the id — both sides reduce to
    * (id, 16-byte fingerprint) before shuffling, never content — plus a
    * narrow classify. Output: (id, status). */
  def diff(old: DataFrame, cur: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    Seq("__fpo", "__fpn", "status").foreach { c =>
      require(!old.columns.contains(c) && !cur.columns.contains(c),
        s"diff emits/uses a $c column; rename the existing one")
    }
    val o = old.select(col(idCol),
      TextOps.fingerprint(col(textCol)).as("__fpo"))
    val n = cur.select(col(idCol),
      TextOps.fingerprint(col(textCol)).as("__fpn"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__fpo").isNull, lit("added"))
          .when(col("__fpn").isNull, lit("removed"))
          .when(col("__fpo") === col("__fpn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
