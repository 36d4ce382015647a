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

  /** CDC apply — MERGE a changelog of upserts/deletes onto a base
    * snapshot: per key, the latest change (by `seqCol`) wins; `D` drops
    * the key, `U`/`I` replace-or-insert the payload, untouched base rows
    * pass through. The lakehouse MERGE INTO shape as a pure computation.
    *
    * One window over the changelog keyed by `keyCol` (cost follows each
    * key's change count), one full-outer key join against the base — the
    * base never reshuffles more than once, and at 100 TB the join prunes
    * to (key, payload) columns only. Output: (keyCol, payloadCol). */
  def cdcApply(base: DataFrame, changelog: DataFrame, keyCol: String,
      seqCol: String, opCol: String, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Seq("__rn", "__op", "__pl").foreach { c =>
      require(!base.columns.contains(c) && !changelog.columns.contains(c),
        s"cdcApply uses an internal $c column; rename the existing one")
    }
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    val latest = changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col(opCol).as("__op"),
        col(payloadCol).as("__pl"))
    base.select(col(keyCol), col(payloadCol))
      .join(latest, Seq(keyCol), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(keyCol),
        when(col("__op").isNull, col(payloadCol)).otherwise(col("__pl"))
          .as(payloadCol))
  }

  /** SCD-type-2 compaction of a changelog into validity intervals: per
    * key, rows ordered by (tsCol, tieCol) become versions with
    * `valid_from` = own timestamp, `valid_to` = next version's timestamp
    * (null on the current row), `version` = 1-based sequence, and
    * `is_current`. The point-in-time lookup this feeds is
    * `valid_from <= t AND (valid_to IS NULL OR t < valid_to)`.
    *
    * One shuffle on the key + a per-key window sort — no global ordering
    * anywhere, so it scales with the key count; the heaviest key costs
    * its own history length, not the table's. `tieCol` must make the
    * per-key order total or version assignment is nondeterministic. */
  def scd2(changelog: DataFrame, keyCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Seq("version", "valid_from", "valid_to", "is_current").foreach { c =>
      require(!changelog.columns.contains(c),
        s"scd2 appends a $c column; rename the existing one")
    }
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    changelog
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
