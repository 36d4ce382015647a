package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-contract checking — the "is this snapshot fit to ship" gate run
  * before a corpus or fact table feeds training or reporting: null
  * coverage, range violations, key uniqueness and referential integrity,
  * reduced to ONE summary row a scheduler can assert on.
  */
object Quality {

  /** Per-column null counts + row count in a single aggregate pass
    * (conditional sums — no per-column jobs). */
  def nullReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Rows whose composite key appears more than once: duplicate-key row
    * count (0 = the key is unique). One key-shuffled aggregate; the
    * second aggregate runs on distinct keys only. */
  def dupKeyCount(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(when(col("__c") > 1, col("__c"))), lit(0L))
        .as("n_dup_rows"))
  }

  /** Child rows whose key has no parent — referential-integrity breaks,
    * counted via a left-anti join (shuffle on the key, no data columns
    * shipped). */
  def orphanCount(child: DataFrame, parent: DataFrame,
      childKey: String, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey),
        "left_anti")
      .agg(count(lit(1)).as("n_orphans"))

  /** One-row contract report over a fact table: row count, null counts
    * for `nullCols`, out-of-[lo, hi] count for `rangeCol`, duplicate-key
    * rows for `keyCols`, and orphans vs `parent` — three aggregate
    * subtrees (narrow scan pass + key aggregate + anti join) combined by
    * broadcast cross joins of 1-row frames; nothing collects. */
  def contractReport(df: DataFrame, nullCols: Seq[String],
      rangeCol: String, lo: Double, hi: Double,
      keyCols: Seq[String], parent: DataFrame, childKey: String,
      parentKey: String): DataFrame = {
    val base = {
      val aggs = nullCols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c")) :+
        sum(when(col(rangeCol) < lo || col(rangeCol) > hi, 1L).otherwise(0L))
          .as(s"oob_$rangeCol")
      df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    }
    base
      .crossJoin(broadcast(dupKeyCount(df, keyCols)))
      .crossJoin(broadcast(orphanCount(df, parent, childKey, parentKey)))
  }

  // ------------------------------------------------------------- privacy

  /** k-anonymity equivalence classes (Sweeney 2002) over quasi-identifier
    * columns: one row per distinct QI combination with its class size — the
    * re-identification-risk primitive a release audit runs before data
    * leaves the pipeline. One map-side-combinable hash aggregate. */
  def kAnonymityClasses(df: DataFrame, qiCols: Seq[String]): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("class_size"))
  }

  /** Classes violating k-anonymity (class_size < k) — the combinations a
    * release must generalize or suppress. */
  def kAnonymityRisky(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame =
    kAnonymityClasses(df, qiCols).where(col("class_size") < k)

  /** Distinct-l-diversity per QI class (Machanavajjhala et al. 2007):
    * a class can be k-anonymous yet still leak its sensitive attribute when
    * every member shares one value (l = 1). One grouped aggregate; the
    * distinct count is exact (partial-distinct expand, no sketch) because
    * the report is a compliance artifact. */
  def lDiversity(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(qiCols.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("l"),
        count(lit(1)).as("class_size"))
  }

  /** t-closeness per QI class (Li, Li & Venkatasubramanian 2007) for a
    * CATEGORICAL sensitive attribute: the variational distance (the
    * categorical earth-mover's distance) between a class's sensitive-value
    * distribution and the global one —
    * `t = ½ Σ_v |p(v|class) − p(v)|`. A class passes k-anonymity and
    * l-diversity yet still leaks when its distribution is skewed far from
    * the corpus (the "99% one disease in this zip code" failure).
    *
    * Exactness: the sum runs over INTEGER cross products
    * (`|n_cv·N − n_v·n_c|`, decimal(38,0) so any corpus size fits) —
    * order-invariant, engine-exact; only the final normalization
    * `/(2·n_c·N)` is double. Sensitive values absent from a class
    * contribute `n_v·n_c` without materializing zero cells: the absent
    * mass rides as `(N − Σ_present n_v)·n_c`.
    *
    * Scale shape: one hash aggregate keyed by (QI, v), class sizes via a
    * QI-keyed window over the COLLAPSED cell table (|classes|·|V| rows,
    * not raw rows — and null-safe, where a join on QI would drop null-QI
    * classes from the audit); the |V|-row global distribution and 1-row
    * total broadcast. NULL sensitive values are excluded from the
    * distributions, matching the SQL aggregate convention.
    *
    * @return one row per QI class: qi..., class_size, t_dist (6dp). */
  def tCloseness(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val qi = qiCols.map(col)
    val dec = "decimal(38,0)"
    // NULL sensitive values are EXCLUDED from the distributions (the SQL
    // aggregate convention — count(DISTINCT) and the oracle's joins skip
    // them); a NULL in a QI column is a legitimate class of its own, so
    // class sizes attach via a QI-keyed WINDOW (null-safe grouping), not
    // a join that would silently drop null-QI classes from the audit.
    val nn = df.filter(col(sensitiveCol).isNotNull)
    val cell = nn.groupBy(qi :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("__ncv"))
      .withColumn("class_size", sum(col("__ncv")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(qi: _*)))
    val glob = nn.groupBy(col(sensitiveCol)).agg(count(lit(1)).as("__nv"))
    val tot = nn.agg(count(lit(1)).as("__N"))
    cell
      .join(broadcast(glob), Seq(sensitiveCol))
      .crossJoin(broadcast(tot))
      .groupBy(qi :+ col("class_size") :+ col("__N"): _*)
      .agg(
        sum(abs(col("__ncv").cast(dec) * col("__N").cast(dec) -
          col("__nv").cast(dec) * col("class_size").cast(dec))).as("__sp"),
        sum(col("__nv").cast(dec)).as("__pnv"))
      .select(qi ++ Seq(col("class_size"),
        round((col("__sp") +
          (col("__N").cast(dec) - col("__pnv")) * col("class_size").cast(dec))
          .cast("double") /
          (lit(2.0) * col("class_size").cast("double") * col("__N").cast("double")),
          6).as("t_dist")): _*)
  }
}
