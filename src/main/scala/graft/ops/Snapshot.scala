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

  /** Schema drift between two snapshots: one row per column that was
    * added, removed, or changed type (by Catalyst DDL string, so nested
    * and nullability changes surface too). Pure metadata — no jobs run;
    * the check a pipeline makes BEFORE diffing content, because a silent
    * widening (int → string) corrupts every downstream cast. */
  def schemaDiff(old: DataFrame, cur: DataFrame): DataFrame = {
    val spark = old.sparkSession
    import spark.implicits._
    val o = old.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val n = cur.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val rows =
      (n.keySet -- o.keySet).toSeq.sorted.map(c =>
        (c, "added", null: String, n(c))) ++
      (o.keySet -- n.keySet).toSeq.sorted.map(c =>
        (c, "removed", o(c), null: String)) ++
      (o.keySet & n.keySet).toSeq.sorted.collect {
        case c if o(c) != n(c) => (c, "type_changed", o(c), n(c))
      }
    rows.toDF("column", "change", "old_type", "new_type")
  }
}
