package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions — the "would this survive 100×" checks:
  * filters/columns reach the parquet scan, small sides broadcast, bucketed
  * layouts join without an exchange. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString

  test("filter+projection are pushed into the parquet scan") {
    val p = plan("filter_shipdate_range")
    // (plan strings truncate long fields at ~100 chars — assert on prefixes)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int"))
  }

  test("dimension joins broadcast; the fact side never shuffles pre-aggregation") {
    val p = plan("join_multi_nation_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    // exactly one shuffle: the final partial→final aggregation exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("tall extract is a pure narrow plan — zero exchanges") {
    val df = graft.queries.ExtractQueries.queries("extract_tall_canonical")(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("bucketed co-located layout joins without any shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = graft.core.Tables.table(spark, sf("sf0.001"), "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val o = graft.core.Tables.table(spark, sf("sf0.001"), "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li").saveAsTable("li_bucketed")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/o").saveAsTable("o_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"))
      assert(!p.contains("Exchange hashpartitioning"), p)
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("ANN top-k ranks through a partial-combining aggregate, not a ranking window") {
    val p = plan("sim_topk_brute")
    assert(p.contains("ObjectHashAggregate"), p) // TypedImperativeAggregate surface
    assert("(?i)topkagg".r.findFirstIn(p).nonEmpty, p)
    assert(!p.contains("Window"), p) // no per-query global window partition
  }

  test("widened regime: sub-parallel scans get the round-robin exchange + pushdown guard") {
    // sf0.01 lineitem (~1 MB, one row group) is over the widen threshold;
    // a derived-column predicate must evaluate ABOVE the exchange, behind
    // the nondeterministic guard — not in the single-task scan stage.
    val df = graft.core.Tables.table(spark, sf("sf0.01"), "lineitem")
      .filter(length(concat(col("l_returnflag"), col("l_linestatus"))) === 2)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("RoundRobinPartitioning"), p)
    assert(p.contains("monotonically_increasing_id"), p)
    val scanIdx = p.indexOf("Scan parquet")
    val exchangeIdx = p.indexOf("RoundRobinPartitioning")
    val predIdx = p.indexOf("concat(l_returnflag")
    assert(scanIdx >= 0 && exchangeIdx >= 0 && predIdx >= 0, p)
    // executedPlan prints top-down: filter above exchange above scan
    assert(predIdx < exchangeIdx, p)
  }

  test("range join plans as a bucket equi-join, never a nested loop") {
    val p = plan("range_join_promos")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("salted join stays an equi-join on (key, salt)") {
    val p = plan("join_salted_revenue")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("chunking is a pure narrow generator plan — zero shuffles") {
    val p = plan("chunk_documents")
    assert(p.contains("Generate"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("sequence packing shuffles once, by shard") {
    val p = plan("pack_sequences")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("Window"), p)
  }

  test("stratified sampling is a shuffle-free filter over the scan") {
    val p = plan("sample_stratified_customers")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window") && !p.contains("Join"), p)
  }

  test("vocab top-k plans as TakeOrderedAndProject over one hash aggregate") {
    val p = plan("vocab_top_bigrams")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort "), p) // no global sort feeding the limit
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("curriculum batching shuffles once, by (bucket, shard)") {
    val p = plan("curriculum_batches")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("export manifest is one partial-combining aggregate, no collects") {
    val p = plan("export_manifest")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_count"), p) // map-side combine, not final-only
    assert(!p.contains("Window") && !p.contains("CollectLimit"), p)
  }

  test("boilerplate flag join builds on the small over-threshold side") {
    val df = SparkEntry.queries("clean_boilerplate")(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    // the doc-freq filtered set is the build/broadcast side at gate scale;
    // never a nested loop or cartesian pairing
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("InMemoryTableScan"), p) // segment subtree persisted once
  }

  test("hamming pigeonhole pairing: width-scaled chunk equi-join, no cartesian") {
    val df = SparkEntry.queries("multimodal_image_dedup")(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // candidate generation is a (chunk, key) equi-join; d=2 → 3 chunks of
    // ~21 bits, visible as the shiftrightunsigned chunk projection
    assert(p.toLowerCase.contains("shiftrightunsigned"), p)
  }

  test("preference pairs: one bounded TopKAgg pass, no per-group window") {
    val df = SparkEntry.queries("preference_pairs")(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.toLowerCase.contains("partial_topkagg") ||
      "objecthashaggregate.*topkagg".r.findFirstIn(p.toLowerCase).isDefined, p)
  }

  test("count-min sketch aggregates map-side (partial) before the merge") {
    val df = SparkEntry.queries("profile_cm_topk")(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_countminagg") ||
      "objecthashaggregate.*countminagg".r.findFirstIn(p.toLowerCase).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("corpus_stats prunes the scan to text and partial-aggregates both phases") {
    val df = SparkEntry.queries("corpus_stats")(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<text:string>"), p)
    // distinct-fp phase keyed by (langid, fp), final by langid — two
    // exchanges of already-combined partials, never an Expand
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("Expand"), p)
  }

  test("weighted sample ranks through the bounded TopKAgg, not a ranking window") {
    val p = plan("sample_weighted")
    assert(p.contains("ObjectHashAggregate"), p)
    assert("(?i)topkagg".r.findFirstIn(p).nonEmpty, p)
    assert(!p.contains("Window"), p)
    // winner ids (k·|groups|) broadcast back to recover full rows
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("overlap join plans as a bucket equi-join, never a nested loop") {
    val p = plan("overlap_join_promos")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("temperature mix: rates broadcast back; the corpus never shuffles for its filter") {
    val p = plan("sample_temperature")
    // per-source rate table joins back via broadcast, not a fact shuffle
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("winsorize: percentile bounds broadcast back onto a narrow clamp") {
    val p = plan("winsorize_quantity")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("random projection is a pure narrow plan — zero exchanges") {
    val df = graft.queries.MixQueries.queries("embed_project")(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p)
  }

  test("join profile partial-aggregates per-side counts before the key join") {
    val p = plan("profile_join_keys")
    // per-key counts partial-combine map-side on both sides
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("curate_lm: the per-language threshold broadcasts back, never a per-language window") {
    val p = plan("curate_lm")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("step lookup enrichment is a pure narrow plan — zero joins, zero exchanges") {
    val df = graft.queries.EnrichQueries.queries("lookup_promo_period")(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("*(1)"), p) // whole-stage-codegen stage marker
  }

  test("funnel chains user-keyed aggregates — no per-user window, no nested loop") {
    val p = plan("funnel_stages")
    assert(!p.contains("Window"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("histogram is one partial-combining aggregate over a one-column scan") {
    val p = plan("agg_histogram_prices")
    assert(p.contains("ReadSchema: struct<o_totalprice:double>"), p)
    assert(p.contains("partial_count"), p)
    // ≤ bins groups: exactly the partial→final aggregation exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Window"), p)
  }

  test("modeBy windows over the collapsed count table, not the raw rows") {
    val p = plan("agg_mode_priority")
    // (key, value) counts partial-aggregate before any exchange; the
    // top-1 window then sorts |distinct pairs| rows, never |rows|.
    assert(p.contains("partial_count"), p)
    val windowIdx = p.indexOf("Window")
    val aggIdx = p.indexOf("HashAggregate")
    assert(windowIdx >= 0 && aggIdx >= 0 && windowIdx < aggIdx, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("inverted index dedups terms per doc before the explode, one exchange") {
    val p = plan("index_postings")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    assert(p.contains("array_distinct"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("scd2 compaction shuffles once, by the history key") {
    val p = plan("scd2_order_history")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("Window"), p)
    assert(!p.contains("Exchange rangepartitioning"), p) // no global sort
  }

  test("pagerank iterations never degrade to a cartesian product") {
    // The gate itself takes the driver-local small-graph regime; force
    // the DISTRIBUTED loop (the 100-TB path) to assert its plan shape.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val edges = graft.core.Tables.table(spark, sf("sf0.001"), "events")
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("w"))
    val p = graft.ops.Graph.pagerankScaled(edges, "src", "dst", "w",
      iters = 3, localEdgeThreshold = -1L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // events scan carries only the transition columns (value/props never
    // read); ts surfaces as bigint nanos on legacy fixtures, timestamp on
    // current ones — accept either physical type, assert the pruning.
    assert(("ReadSchema: struct<event_id:bigint,ts:[a-z_]+," +
      "user_id:bigint,event_type:string>").r.findFirstIn(p).nonEmpty, p)
  }

  test("grouped top-k runs through the bounded TopKAgg, never a ranking window") {
    val p = plan("topk_per_priority")
    assert("(?i)topkagg".r.findFirstIn(p).nonEmpty, p)
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("recsys_user_recs ranks through the payload-carrying TopKAgg: no " +
      "per-customer window, no join-back second consumption of cand") {
    val p = plan("recsys_user_recs")
    assert("(?i)topkpayloadagg".r.findFirstIn(p).nonEmpty, p)
    // windows keyed by the ITEM survive inside the (possibly inlined)
    // neighbor-table subtree; what must NOT exist is a customer-keyed
    // ranking window — that's the sort-every-candidate shape the bounded
    // aggregate replaces
    assert(!p.contains("windowspecdefinition(cust#"), p)
    // and n_voters comes out of the aggregate buffer, not a join-back
    // (the round-10 rejected rewrite's double-consumption)
    assert("topkpayloadagg\\(.*n_voters".r.findFirstIn(p).nonEmpty, p)
    // the candidate join hash-builds the bounded neighbor side instead
    // of sort-merging the fanned-out history stream (profiled at 100×:
    // the SMJ sort was one 34-task uniform stage at p50 92 s), and the
    // already-purchased exclusion is folded into the aggregate as
    // marker rows — no post-agg anti join re-shuffling the candidates
    assert("ShuffledHashJoin".r.findAllIn(p).nonEmpty, p)
    assert(!p.contains("LeftAnti"), p)
  }

  test("bm25 filters the token stream before aggregating; stats broadcast back") {
    val p = plan("search_bm25")
    // the isin filter sits below the tf aggregate; dfreq and (N, avglen)
    // come back as broadcasts, so no corpus-sized shuffle joins exist
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("co-occurrence pairs stay inside the token array — one exchange, no self-join") {
    val p = plan("vocab_cooc_pairs")
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("substring-span dedup: combinable gram count, per-doc windows, nothing quadratic") {
    val p = plan("dedup_substring_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // no global (single-task) window anywhere — islands merge per document
    assert(!p.contains("Exchange SinglePartition"), p)
    // the gram occurrence count map-side combines on the i64 hash
    assert(p.contains("partial_count"), p)
  }

  test("growth curve avoids the window scan: no Window node, no single-task exchange") {
    val df = SparkEntry.queries("corpus_growth_curve")(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    // running totals come from Ranking.prefixSum's two-pass RDD scan, so
    // the final plan must contain neither a Window nor a SinglePartition
    // funnel (the naive cum-sum formulation would show both)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("temporal split plans a single key exchange for both window frames") {
    val p = plan("sample_temporal_split")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("trend slope is one partial-combining aggregate over a pruned scan") {
    val p = plan("agg_trend_slope")
    assert(p.contains("ReadSchema: struct<o_totalprice:double,o_orderdate:timestamp"), p)
    assert(p.contains("partial_count"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("triangle census: every join is key-equi — no cartesian, no window") {
    val p = plan("graph_triangles")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("link prediction: wedge self-join keyed by centre, no nested loop") {
    val p = plan("graph_linkpred")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the anti-join against the edge set stays an equi hash join
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("Window"), p)
  }

  test("covariance stats: narrow generate into one partial-combining aggregate") {
    val df = graft.ops.Ann.covarianceStats(
      graft.core.Tables.table(spark, sf("sf0.001"), "embeddings"), "embedding")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("Join"), p) // no self-join builds the outer product
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_count") || p.contains("partial"), p)
  }

  test("filter ablation: one flag pass, fingerprint exchange, single-row final agg") {
    val p = plan("curate_ablation")
    assert(!p.contains("Window"), p)
    // corpus-sized shuffles: fingerprint groupBy + the rep join; the
    // report itself collapses through a SinglePartition exchange.
    assert(p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sampled quantiles: window runs over collapsed counts, not raw rows") {
    val p = plan("sketch_quantiles_sampled")
    // the running-sum window input is the (group, value) hash aggregate
    val wIdx = p.indexOf("Window")
    assert(wIdx >= 0, p)
    assert(p.indexOf("HashAggregate", wIdx) >= 0, p)
    // sample filter is a scan-level pushdown-able predicate, no join
    assert(!p.contains("CartesianProduct"), p)
  }

  test("partitioned layout: the source filter prunes to partition directories") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_fmt_spec/docs_by_source"
    graft.core.Tables.table(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("n_chars"), col("source"))
      .write.mode("overwrite").partitionBy("source").parquet(out)
    val read = spark.read.parquet(out)
      .filter(col("source").isin("src1", "src7"))
    val p = read.queryExecution.executedPlan.toString
    // the filter became a partition-directory filter, not a data filter
    assert("PartitionFilters: \\[source#\\d+ IN \\(src1,src7\\)\\]".r
      .findFirstIn(p).isDefined, p)
    assert(p.contains("DataFilters: []"), p)
    // pruned read returns only the two sources' rows
    assert(read.select(col("source")).distinct().count() <= 2)
  }

  test("nearest-name ER: brand-blocked equi-join + min-struct aggregate, " +
      "no cartesian, no window") {
    val p = plan("er_nearest_name")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(!p.contains("Window"), p) // argmin folds in the aggregate
    assert(p.contains("levenshtein"), p)
  }

  test("containment join: prefix-filtered equi-joins only — no cartesian, " +
      "no window") {
    val p = plan("dedup_containment_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(!p.contains("Window"), p)
  }

  test("winnowing: fingerprint selection stays inside the token array — " +
      "no window, no cartesian") {
    val p = plan("dedup_winnow_pairs")
    assert(!p.contains("Window"), p) // window minima are array transforms
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("trailing-distinct feature: ONE user-keyed exchange feeds the " +
      "RANGE window") {
    val p = plan("feature_trailing_distinct")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
    assert(p.contains("Window"), p)
    assert(!p.contains("Exchange rangepartitioning"), p) // no global sort
  }

  test("score report (AUC+Brier): rank sums ride the prefix-sum plan — " +
      "no Window node, no single-partition exchange of raw rows") {
    val p = plan("eval_score_report")
    assert(!p.contains("Window"), p)
    // the two-pass prefix sum runs over per-value collapsed counts; the
    // only SinglePartition exchange is the |distinct scores|-row final agg
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("ROUGE pair audit: every gram join is key-equi — no cartesian, " +
      "no nested loop") {
    val p = plan("eval_rouge_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bootstrap CI: replicate explode feeds a partial-combining aggregate — " +
      "the shuffle carries 64 groups per partition, not 64× the data") {
    val p = plan("agg_bootstrap_ci")
    assert(p.contains("Generate explode"), p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("Exchange rangepartitioning"), p) // no global sort
  }

  test("FIM builder is a pure narrow plan — zero exchanges") {
    val p = plan("pretrain_fim")
    assert(!p.contains("Exchange"), p)
  }

  test("average precision: no ranking window — terms ride the prefix-sum plan") {
    val p = plan("eval_avg_precision")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("position-based attribution: user-keyed exchanges only, no global sort") {
    val p = plan("attribution_position_based")
    assert(p.contains("Window"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size <= 3, p)
  }

  test("MI / transition entropy: fact aggregates + broadcast closures — " +
      "no sort-merge join anywhere") {
    assert(!plan("agg_mutual_info").contains("SortMergeJoin"))
    assert(!plan("events_transition_entropy").contains("SortMergeJoin"))
  }

  test("HITS distributed loop: key-equi joins only on the 100-TB path") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val edges = graft.core.Tables.table(spark, sf("sf0.001"), "events")
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("w"))
    val p = graft.ops.Graph.hitsScaled(edges, "src", "dst", "w",
      iters = 2, localEdgeThreshold = -1L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
  }

  test("runtime bloom filter: a selective dim filter injects a bloom probe " +
      "into the fact scan side") {
    // The 100-TB mechanism for semi-join reduction WITHOUT broadcasting:
    // Spark's runtime row-level bloom filter builds on the filtered dim
    // side and prunes the fact side's shuffle input. Forced off the
    // broadcast path (threshold -1) so the injection site is the
    // shuffle-join shape a 100-TB fact table actually takes. RAW scans
    // on purpose: Tables.maybeWiden's nondeterministic widening barrier
    // (a local-fixture-only regime) suppresses InjectRuntimeFilter — at
    // production scan widths the barrier is inert and injection behaves
    // as asserted here (interaction recorded in SCALE.md).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
      val o = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val p = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
        .queryExecution.optimizedPlan.toString
      assert(p.toLowerCase.contains("bloomfilter"),
        s"expected a runtime bloom filter probe in the optimized plan\n$p")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  test("recsys co-occurrence: basket self-join stays key-equi and the " +
      "neighbor ranking window is item-keyed — no cartesian, no global sort") {
    val p = plan("recsys_item_item")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    val r = plan("recsys_user_recs")
    assert(!r.contains("CartesianProduct") &&
      !r.contains("BroadcastNestedLoopJoin"), r)
    assert(!r.contains("Exchange rangepartitioning"), r)
  }

  test("BH step-up and log-rank windows walk collapsed closures — raw rows " +
      "are hash-aggregated before any window exchange") {
    for (name <- Seq("ab_fdr_bh", "survival_logrank", "survival_nelson_aalen",
        "agg_hhi_revenue")) {
      val p = plan(name)
      // crossJoin(broadcast(1-row agg)) is the accepted scalar-subquery
      // shape (plans as a broadcast nested-loop Cross of one row); what
      // must never appear is a real cartesian of fact rows.
      assert(!p.contains("CartesianProduct"), s"$name: $p")
      // the step-up/prefix side must sit above an aggregate — either a
      // HashAggregate still visible in the final plan, or the re-rooted
      // ExistingRDD leaf of Ranking.prefixSum's eager two-pass scan
      // (r15: these gates' cumulative series moved off global windows
      // onto the distributed prefix device, which materializes its
      // range pass up front and leaves only the RDD leaf visible)
      assert(p.contains("HashAggregate") || p.contains("Scan ExistingRDD"),
        s"$name: $p")
      // the FINAL plan must never range-shuffle fact rows (prefixSum's
      // internal range exchange runs over the collapsed aggregate only)
      assert(!p.contains("Exchange rangepartitioning"), s"$name: $p")
    }
  }

  test("PQ recall: broadcast-query ADC scoring feeds the partial-combining " +
      "top-k aggregate — no sort-merge join, no global sort") {
    val p = plan("pq_recall_report")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(p.contains("BroadcastExchange"), p) // the query side broadcasts
  }

  test("Markov transition counting: user-keyed window exchanges + hash " +
      "aggregates only — the 100-TB half of the attribution op") {
    import org.apache.spark.sql.functions._
    val t = graft.ops.Markov.transitions(
      graft.core.Tables.table(spark, sf("sf0.001"), "events"),
      "user_id", "ts", "event_id", "event_type", "purchase")
    val p = t.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("windowed funnel and SCC condensation: key-equi joins only") {
    for (name <- Seq("funnel_window_steps", "graph_condensation")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$name: $p")
      assert(!p.contains("Exchange rangepartitioning"), s"$name: $p")
    }
  }

  test("custom expressions are SQL-callable after extension registration") {
    GraftExtensions.registerOn(spark)
    val r = spark.sql("SELECT seq_ratio('grady_memorial', 'grady_memoral') AS r")
      .head().getDouble(0)
    assert(r == 0.9629629629629629)
    val row = spark.sql(
      "SELECT seq_ratio_at_least('abcd', 'zzzz', 0.9) AS bounded, " +
        "simhash64('alpha beta gamma') AS sh, " +
        "nfc_normalize('é') AS n, " +
        "size(text_shingles('a b c d', 3)) AS ns").head()
    assert(row.getDouble(0) == -1.0) // char-bag bound short-circuits
    assert(spark.sql("SELECT jaro_winkler('martha', 'marhta') AS jw")
      .head().getDouble(0) == 0.9611111111111111)
    // SQL path must route to the same expression as the DataFrame path.
    import spark.implicits._
    val shExpected = graft.ops.Dedup
      .simhash64(Seq(("d1", "alpha beta gamma")).toDF("id", "text"), "id", "text")
      .head().getLong(1)
    assert(row.getLong(1) == shExpected)
    assert(row.getString(2) == "é")
    assert(row.getInt(3) == 2)
    // aggregate path: the analyzer wraps the bare AggregateFunction
    val cm = spark.sql(
      "SELECT count_min_agg(CAST(id AS STRING), 3, 64) AS sk FROM range(100)")
      .head().getSeq[Long](0)
    assert(cm.length == 3 * 64 && cm.sum == 300L) // one increment per depth row
    val tk = spark.sql(
      "SELECT top_k_agg(CAST(id AS DOUBLE), id, 5) AS tk FROM range(100)")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(tk.map(_.getLong(1)).toSet == Set(95L, 96L, 97L, 98L, 99L))
    val mh = spark.sql(
      "SELECT minhash_agg(CAST(id AS STRING), 8) AS mh FROM range(100)")
      .head().getSeq[Long](0)
    assert(mh.length == 8 && mh.forall(_ != Long.MaxValue))
  }

  test("Hilbert key derivation is a pure narrow plan — zero exchanges") {
    val p = plan("layout_hilbert_keys")
    assert(!p.contains("Exchange"), p)
    // the round projections collapse into whole-stage-codegen spans,
    // rendered as "*(n)" in the executed-plan string
    assert(p.contains("*(1)"), p)
  }

  test("FastSS pairing is a variant equi-join — no cartesian, no nested loop") {
    val p = plan("er_fastss_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("Theil-Sen pair space joins on the broadcast monthly aggregate — " +
    "the quadratic term never touches row-scale data") {
    val p = plan("agg_theil_sen")
    // The month×month inequality join must ride a broadcast of the tiny
    // aggregate, never a shuffled row-scale product.
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("shared pair-count consumers read the InMemoryRelation — no " +
    "re-aggregation of the basket self-join per gate") {
    graft.core.Memo.clear(spark)
    val dir = sf("sf0.001")
    // Materialize the shared caches once (the family first-payer's job).
    graft.queries.SharedTables.pairCounts(spark, dir).count()
    // Every consumer's plan must scan the cached relation instead of
    // re-running the distinct + self-join + aggregation.
    Seq("basket_pair_counts", "basket_association_rules",
      "graph_triangles", "recsys_item_item").foreach { g =>
      val p = SparkEntry.queries(g)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(p.contains("InMemoryTableScan"),
        s"$g does not read the shared cache:\n$p")
    }
    // basket_pair_counts specifically must be ONLY cache-read + top-50:
    // the TakeOrdered sits directly over the InMemoryTableScan, and any
    // HashAggregate in the plan string is the RELATION'S stored build
    // plan (nested under InMemoryRelation), not an operator of this
    // query — assert by position.
    val pc = SparkEntry.queries("basket_pair_counts")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(pc.contains("TakeOrderedAndProject"), pc)
    assert(pc.indexOf("InMemoryTableScan") >= 0, pc)
    val agg = pc.indexOf("HashAggregate")
    assert(agg < 0 || agg > pc.indexOf("InMemoryRelation"), pc)
    graft.core.Memo.clear(spark)
  }

  test("composed curation gates read the shared stage caches — features/" +
    "filter/exact-dedup and the pair derivation run once for both modes") {
    graft.core.Memo.clear(spark)
    val dir = sf("sf0.001")
    // First-payer materializes both shared stages.
    SparkEntry.queries("curate_corpus")(spark, dir).count()
    Seq("curate_corpus", "curate_corpus_cc").foreach { g =>
      val p = SparkEntry.queries(g)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(p.contains("InMemoryTableScan"),
        s"$g does not read the shared curation caches:\n$p")
    }
    // Both modes agree with the direct (uncached) compositions.
    val docs = graft.core.Tables.table(spark, dir, "documents")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).toSet
    assert(ids(SparkEntry.queries("curate_corpus")(spark, dir)) ==
      ids(graft.ops.Curation.curate(docs, "doc_id", "text")))
    assert(ids(SparkEntry.queries("curate_corpus_cc")(spark, dir)) ==
      ids(graft.ops.Curation.curateTransitive(docs, "doc_id", "text")))
    graft.core.Memo.clear(spark)
  }

  test("spearman's join-free moment collapse and RFM's score join-back " +
    "equal their direct row-scale formulations") {
    val dir = sf("sf0.001")
    // Spearman: direct row-level midranks via two row-scale joins (the
    // pre-rewrite shape), exact decimal moments, same closure.
    val li = graft.core.Tables.table(spark, dir, "lineitem")
      .select(col("l_quantity").cast("decimal(12,2)").as("x"),
        col("l_extendedprice").cast("decimal(12,2)").as("y"))
    def ranks(c: String) = {
      val g = li.groupBy(col(c)).agg(count(lit(1)).as("n"))
      graft.ops.Ranking.prefixSum(g, Seq(col(c).asc), Seq("n"))
        .select(col(c), (lit(2L) * col("cum_n") - col("n") + 1L).as(s"r$c"))
    }
    val dec = "decimal(38,0)"
    val j = li.join(ranks("x"), Seq("x")).join(ranks("y"), Seq("y"))
      .select(col("rx").cast(dec).as("rx"), col("ry").cast(dec).as("ry"))
    val a = j.agg(count(lit(1)).as("n"),
      sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
      sum(col("rx") * col("rx")).as("sxx"),
      sum(col("ry") * col("ry")).as("syy"),
      sum(col("rx") * col("ry")).as("sxy"))
    def d(c: Column) = c.cast("double")
    val nd = d(col("n"))
    val rho = (nd * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
      (sqrt(nd * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
        sqrt(nd * d(col("syy")) - d(col("sy")) * d(col("sy"))))
    val direct = a.select(col("n"), round(rho, 6).as("spearman"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).head
    val got = SparkEntry.queries("agg_spearman")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).head
    assert(got == direct, s"spearman collapse mismatch: $got vs $direct")

    // RFM: the chained-quantile formulation (pre-rewrite) per customer.
    val rfm = SparkEntry.queries("customer_rfm_segments")(spark, dir)
    val chained = {
      import graft.ops.Ranking
      val ords = graft.core.Tables.table(spark, dir, "orders")
      val maxD = ords.agg(max(col("o_orderdate")).as("dmax"))
      val cust = ords.groupBy(col("o_custkey").as("custkey"))
        .agg(max(col("o_orderdate")).as("last_date"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("mon"))
        .crossJoin(broadcast(maxD))
        .select(col("custkey"),
          datediff(col("dmax").cast("date"), col("last_date").cast("date"))
            .cast("long").as("recency_days"), col("frequency"), col("mon"))
      val r1 = Ranking.quantileBins(cust,
          Seq(col("recency_days").desc, col("custkey").asc), 5)
        .withColumn("r_score", col("bin") + 1L).drop("bin", "rank")
      val r2 = Ranking.quantileBins(r1,
          Seq(col("frequency").asc, col("custkey").asc), 5)
        .withColumn("f_score", col("bin") + 1L).drop("bin", "rank")
      Ranking.quantileBins(r2, Seq(col("mon").asc, col("custkey").asc), 5)
        .withColumn("m_score", col("bin") + 1L)
        .select(col("custkey"), col("r_score"), col("f_score"),
          (col("bin") + 1L).as("m_score2"))
    }
    val gotScores = rfm.select(col("custkey"), col("r_score"),
        col("f_score"), col("m_score")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val expScores = chained.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(gotScores == expScores, "RFM score mismatch vs chained ranks")
  }

  test("component-map consumers read the InMemoryRelation — CC label " +
    "propagation runs once for the four dedup-report gates") {
    graft.core.Memo.clear(spark)
    val dir = sf("sf0.001")
    SparkEntry.queries("dedup_components")(spark, dir).count()
    Seq("dedup_cluster_sizes", "dedup_survivors", "sample_cluster_split")
      .foreach { g =>
        val p = SparkEntry.queries(g)(spark, dir)
          .queryExecution.executedPlan.toString
        assert(p.contains("InMemoryTableScan"),
          s"$g does not read the cached component map:\n$p")
      }
    graft.core.Memo.clear(spark)
  }

  test("k-center argmax is a partial-combining aggregate — no window, " +
    "no global sort on the corpus scan") {
    import graft.ops.{Ann, Curation}
    val v = graft.core.Tables.table(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id"), Ann.asDouble(col("embedding")).as("e"))
    val dmin = Ann.sqDist(col("e"),
      typedLit(Seq.fill(64)(0.0)))
    val step = v.select(col("vec_id"),
        round(dmin, 9).cast("decimal(28,9)").as("d"))
      .agg(max(struct(col("d"), (-col("vec_id")).as("ni"))))
    val p = step.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("TakeOrderedAndProject"), p)
    // And the public op's output is exactly k rows on real data.
    assert(Curation.kCenterCoreset(
      graft.core.Tables.table(spark, sf("sf0.001"), "embeddings"),
      "vec_id", "embedding", 4).count() == 4L)
  }

  test("holdout neighbor build carries degrees through the pair rows — " +
    "no sort-merge join, no post-aggregation degree joins") {
    // The round-14 plan-shape fix (SCALE.md batch 14): the train-split
    // co-occurrence aggregate must consume pairs that ALREADY carry
    // deg_i/deg_j (per-order list double-explode), so the widest relation
    // in the gate is exchanged once and never re-joined. The r13 shape
    // this pins against: two post-aggregation degree joins, which plan as
    // sort-merge joins keyed on the item (part / part_j) and re-sort the
    // pair table twice. The one join key allowed to sort-merge here is
    // the final (cust, part_j) hit-rate probe — small post-top-k
    // relations, AQE-converted at runtime.
    val p = plan("recsys_holdout_hitrate")
    assert(p.contains("Generate"), p)            // the pair double-explode
    assert(!p.contains("SortMergeJoin [part"), p)
    assert("SortMergeJoin".r.findAllIn(p).size <= 1, p)
  }
}
