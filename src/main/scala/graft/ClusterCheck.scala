package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Cross-process correctness screen (`ClusterCheck sfDir refDir [names]`):
  * run the heaviest gates and every custom-expression/aggregate gate
  * under `local-cluster[2,16,6144]` — two REAL executor JVMs, so rows,
  * broadcasts and partial-aggregate buffers cross Netty transport and
  * executor classloaders, none of which `local[*]` ever exercises — and
  * require every result to be multiset-IDENTICAL to a reference dump
  * produced by `graft.Verify` in local mode (the artifact the driver's
  * DuckDB oracle already hash-checks).
  *
  * What this falsifies that 321 green local gates cannot:
  *   - custom expressions/aggregates (SequenceMatcherRatio, TopKAgg,
  *     CountMinAgg, MinHashAgg, SimHash64, CompressionStats, StepLookup,
  *     NfcNormalize) must SERIALIZE their state between processes —
  *     a partial-aggregate buffer that round-trips wrong, or a closure
  *     capturing driver state it shouldn't, only breaks here;
  *   - broadcast joins ship over the real block transport;
  *   - the two-regime ops' driver collects read executor-written shuffle
  *     output, not same-heap references.
  *
  * Equality is exact: equal counts + empty `exceptAll` in both
  * directions (SQL set semantics — NaN = NaN, null = null), so a single
  * bit of drift in any double fails the gate. Prints one JSON line:
  * `{"cluster_check":{"pass":N,"fail":M,"gates":{...}}}`.
  */
object ClusterCheck {

  /** Heaviest gates by the r14 census + every gate exercising a custom
    * expression / TypedImperativeAggregate, + the streaming family's
    * heavy three (stateful shuffles cross processes too). */
  val DefaultGates: Seq[String] = Seq(
    // top of the r14 census
    "recsys_holdout_hitrate", "agg_spearman", "streaming_interval_join",
    "streaming_watermark_drop", "er_fastss_trace", "causal_dr_ate",
    "recsys_user_recs", "ml_logreg_irls", "etl_flagship_trace",
    "basket_association_rules", "dedup_cluster_sizes", "curate_corpus",
    "eval_conformal_coverage", "streaming_sessionize", "basket_pairs_blocked",
    "causal_qte", "streaming_hourly_stats", "customer_rfm_segments",
    "outlier_mad", "entity_resolution", "feature_deciles",
    "clean_csv_roundtrip", "curate_lm", "preference_bradley_terry",
    "dedup_containment_pairs", "multimodal_audio", "semdedup_prune",
    "graph_robustness", "graph_scc", "graph_condensation",
    // custom expression / aggregate surfaces
    "enrich_fuzzy_registry",      // SequenceMatcherRatio (seq_ratio)
    "sim_topk_brute", "sim_topk_lsh", "sim_topk_ivf", "sim_topk_pq", // TopKAgg
    "profile_cm_topk", "cm_topk_report",                  // CountMinAgg
    "dedup_minhash_pairs", "dedup_minhash_calibration",
    "minhash_nation_orderdates",                          // MinHashAgg
    "dedup_simhash_pairs",                                // SimHash64
    "text_compression",                                   // CompressionStats
    "lookup_promo_period",                                // StepLookup
    "text_unicode_nfc",                                   // NfcNormalize
    "multimodal_image_dedup",                             // aHash + pigeonhole
    "window_top_order_per_customer")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val refDir = args(1)
    val names =
      if (args.length > 2) args(2).split(",").toSeq else DefaultGates
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_CLUSTER_MASTER",
        "local-cluster[2,16,6144]"))
      // executor JVMs are spawned fresh by the in-process workers: they
      // get the spark jars from the worker's classpath but NOT the sbt
      // fork's application classes — ship ours explicitly
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.memory", "6g")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = names.map { name =>
      val status = try {
        val fn = SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown gate $name"))
        val got = fn(spark, sfDir)
        val ref = spark.read.parquet(s"$refDir/$name")
        name -> diffStatus(got, ref)
      } catch {
        case e: Throwable =>
          name -> s"error:${e.getClass.getSimpleName}:${
            Option(e.getMessage).getOrElse("").take(120).replace('"', '\'')}"
      }
      graft.core.Memo.releaseOwned(spark)
      System.err.println(s"[cluster-check] ${status._1}: ${status._2}")
      status
    }
    val nPass = results.count(_._2 == "pass")
    val gates = results
      .map { case (n, st) => s""""$n":"$st"""" }.mkString(",")
    println(s"""{"cluster_check":{"master":"${spark.sparkContext.master}",""" +
      s""""pass":$nPass,"fail":${results.size - nPass},"gates":{$gates}}}""")
    spark.stop()
    if (results.size != nPass) sys.exit(1)
  }

  /** Exact multiset compare; schemas compared by sorted column name so
    * the reference dump's defensive sort order doesn't matter. */
  private def diffStatus(got: DataFrame, ref: DataFrame): String = {
    if (got.columns.sorted.toSeq != ref.columns.sorted.toSeq)
      return s"schema_mismatch:${got.columns.sorted.mkString("|")}" +
        s" vs ${ref.columns.sorted.mkString("|")}"
    val g = got.select(got.columns.sorted.map(c => col(s"`$c`")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val r = ref.select(ref.columns.sorted.map(c => col(s"`$c`")): _*)
    try {
      val (ng, nr) = (g.count(), r.count())
      if (ng != nr) s"rows:$ng!=$nr"
      else if (!g.exceptAll(r).isEmpty) "extra_rows"
      else if (!r.exceptAll(g).isEmpty) "missing_rows"
      else "pass"
    } finally { g.unpersist(blocking = false); () }
  }
}
