package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two snapshots of a numeric
  * column — the monitoring gate that catches "the new crawl's document
  * lengths shifted" before a model trains on it. Population Stability
  * Index: PSI = Σ_bins (p_cur − p_base) · ln(p_cur / p_base); rule of
  * thumb < 0.1 stable, > 0.25 action.
  */
object Drift {

  /** Per-bin PSI contributions over fixed-width bins of [lo, hi), plus an
    * underflow bin (-1) and overflow bin (`bins`). Each side is ONE
    * conditional-bin hash aggregate (bins-cardinality output), joined
    * full-outer on the bin id — scale cost is two narrow scans, never a
    * row-level join. Proportions are Laplace-smoothed
    * ((c + 0.5) / (N + 0.5·B), B = bins + 2) so empty bins contribute a
    * finite penalty instead of ±∞; `contrib` is 6dp-rounded (libm-order
    * neutrality). Output: (bin, n_base, n_cur, contrib); total PSI =
    * sum(contrib). */
  def psiBins(base: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got ($lo, $hi)")
    val width = (hi - lo) / bins
    def binned(df: DataFrame) = {
      val v = col(valueCol).cast("double")
      val b = when(v < lo, lit(-1L))
        .when(v >= hi, lit(bins.toLong))
        .otherwise(floor((v - lit(lo)) / lit(width)).cast("long"))
      df.filter(v.isNotNull).select(b.as("bin"))
    }
    psiOverKeys(binned(base), binned(cur), "bin", bins + 2)
  }

  /** PSI over a CATEGORICAL column (language, source, event type …):
    * categories are their own bins. `smoothCats` is the category count B
    * used in the Laplace smoothing — pass the known vocabulary size, or
    * leave 0 to derive it from the observed union (deriving adds one tiny
    * aggregate over the category table, not the data). Output:
    * (<keyCol>, n_base, n_cur, contrib). */
  def psiCategorical(base: DataFrame, cur: DataFrame, keyCol: String,
      smoothCats: Int = 0): DataFrame =
    psiOverKeys(base.filter(col(keyCol).isNotNull).select(col(keyCol)),
      cur.filter(col(keyCol).isNotNull).select(col(keyCol)),
      keyCol, smoothCats)

  /** Shared kernel: per-key counts on each side, full-outer join on the
    * key (key-cardinality rows), smoothed PSI contribution per key. */
  private def psiOverKeys(base: DataFrame, cur: DataFrame, keyCol: String,
      smoothCats: Int): DataFrame = {
    val b = base.groupBy(col(keyCol)).agg(count(lit(1)).as("n_base"))
    val c = cur.groupBy(col(keyCol)).agg(count(lit(1)).as("n_cur"))
    val joined = b.join(c, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum(col("n_base")).as("__nb"),
      sum(col("n_cur")).as("__nc"),
      (if (smoothCats > 0) lit(smoothCats.toLong) else count(lit(1)))
        .as("__cats"))
    joined.crossJoin(broadcast(totals))
      .select(col(keyCol), col("n_base"), col("n_cur"), {
        val bCats = col("__cats").cast("double")
        val pb = (col("n_base").cast("double") + lit(0.5)) /
          (col("__nb").cast("double") + lit(0.5) * bCats)
        val pc = (col("n_cur").cast("double") + lit(0.5)) /
          (col("__nc").cast("double") + lit(0.5) * bCats)
        round((pc - pb) * log(pc / pb), 6).as("contrib")
      })
  }
}
