package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables.table

/** Batch sessionization over the events table — the batch twin of
  * streaming/Sessionize, and the gate coverage for lag + running-sum window
  * functions (beyond the reference's lone top-1 window): a new session
  * starts when the gap to the previous event exceeds the threshold; session
  * ids are running sums of the start flags.
  */
object SessionQueries {

  def family: QueryFamily = QueryFamily("session", queries, oracles)

  private val GapMinutes = 30

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sessionize_events" -> ((s, dir) => {
      val order = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(order))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > GapMinutes * 60L,
            1L).otherwise(0L))
        .withColumn("session_idx", sum(col("new_session")).over(running))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(
          count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
    }),

    // Same session semantics through Spark's NATIVE session_window (merge
    // events within the gap): an independent implementation of the
    // sessionize_events computation — window end is last-event + gap, so
    // subtracting the gap recovers the last event time. One gap-merging
    // aggregate, no lag/running-sum window chain.
    "sessionize_native" -> ((s, dir) =>
      table(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), s"$GapMinutes minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("w.end") - expr(s"INTERVAL $GapMinutes MINUTES"),
            "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("total_value"))),

    // The STREAMING sessionizer as a gate: the flatMapGroupsWithState
    // operator (streaming/Sessionize) runs over the events table fed
    // through a real file stream, one far-future sentinel per user closing
    // every real session inline (the sentinels' own sessions stay in state
    // unemitted). Feed is second-truncated so the ms gap rule matches the
    // batch gate's unix_timestamp arithmetic; total_value is omitted (the
    // stream folds doubles in arrival order — equal only to 1e-6, spec-
    // asserted — while the hash gate needs exactness). Oracle = the same
    // session CTEs as sessionize_events.
    "streaming_sessionize" -> ((s, dir) => {
      import graft.streaming.Sessionize
      val ev = table(s, dir, "events").select(col("user_id"),
        date_trunc("second", col("ts")).as("ts"), col("event_type"), col("value"))
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val flush = ev.select(col("user_id")).distinct()
        .select(col("user_id"),
          lit(new java.sql.Timestamp(maxTs.getTime + (GapMinutes + 1) * 60000L)).as("ts"),
          lit("flush").as("event_type"), lit(0.0).as("value"))
      val feedDir = graft.streaming.StreamScratch.feedDir(
        "graft-stream-sess-" + new java.io.File(dir).getName)
      ev.unionByName(flush).write.mode("overwrite").parquet(feedDir)
      import s.implicits._
      val stream = s.readStream.schema(ev.schema).parquet(feedDir)
        .as[Sessionize.Event]
      graft.streaming.StreamTuning.withShufflePartitions(s,
        graft.streaming.StreamTuning.GateStatePartitions) {
        // AvailableNow (not the default 0-interval trigger +
        // processAllAvailable): the query plans the full feed up front,
        // runs its batches plus any watermark-driven no-data batch
        // (MicroBatchExecution.shouldRunAnotherBatch), and SELF-terminates
        // — awaitTermination replaces the 10ms-poll handshake whose
        // scheduling quantization dominated the family's census spread on
        // 1-4 s gates (decoded r13; de-quantization is r13 item 8).
        val q = Sessionize.sessionize(s, stream, gapMs = GapMinutes * 60000L)
          .writeStream.outputMode("append").format("memory")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation",
            graft.streaming.StreamScratch.freshCheckpoint("gate_stream_sess"))
          .queryName("gate_stream_sess").start()
        try q.awaitTermination() finally q.stop()
      }
      s.table("gate_stream_sess").select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))
    }),

    // REAL watermark late-drop semantics through Structured Streaming:
    // the fresh half of the events (last 2 days) arrives as micro-batch 1
    // and advances the watermark to max(ts) − 30 min; the stale half is
    // appended as micro-batch 2 and is dropped WHOLESALE by the
    // watermarked hourly aggregation (every stale row sits days behind
    // the watermark). Append mode then emits exactly the fresh windows
    // whose end the watermark passed. The oracle reproduces that from
    // first principles: hourly stats over the fresh half, windows with
    // end ≤ max(ts) − 30 min — so Spark's watermark/append contract
    // itself is what's being checked. (streaming_late_audit is the batch
    // policy mirror; this is the engine's native behavior.)
    "streaming_watermark_drop" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(date_trunc("second", col("ts")).as("ts"), col("event_type"),
          col("value"))
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val cutoff = new java.sql.Timestamp(maxTs.getTime - 2L * 86400000L)
      val fresh = ev.filter(col("ts") > cutoff)
      val late = ev.filter(col("ts") <= cutoff)
      val feedDir = graft.streaming.StreamScratch.feedDir(
        "graft-stream-wm-" + new java.io.File(dir).getName)
      val fd = new java.io.File(feedDir)
      if (fd.exists()) { // fresh feed per run: append mode must not see
        def rm(f: java.io.File): Unit = { // leftovers from a prior dump
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(fd)
      }
      fresh.write.parquet(feedDir)
      val stream = s.readStream.schema(fresh.schema).parquet(feedDir)
      graft.streaming.StreamTuning.withShufflePartitions(s,
        graft.streaming.StreamTuning.GateStatePartitions) {
        val q = graft.streaming.WindowStats
          .tumblingStats(stream, "1 hour", "30 minutes")
          .writeStream.outputMode("append").format("memory")
          .option("checkpointLocation",
            graft.streaming.StreamScratch.freshCheckpoint("gate_stream_wm"))
          .queryName("gate_stream_wm").start()
        try {
          // This gate STAYS on the default trigger (not AvailableNow,
          // r13 item 8): its two-phase feed needs one LIVE query across
          // both drains — AvailableNow snapshots end offsets at start
          // (batch 2's late files would need a second query run) and a
          // memory-sink restart under the same queryName recreates the
          // table, losing batch 1's appended emissions.
          q.processAllAvailable()       // batch 1: fresh rows, wm advances
          late.write.mode("append").parquet(feedDir)
          q.processAllAvailable()       // batch 2: all rows late → dropped
        } finally q.stop()
      }
      s.table("gate_stream_wm")
        .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour"), col("event_type"), col("n_events"),
          col("sum_value").cast("double").as("sum_value"))
    }),

    // Stream-stream interval join through REAL file streams: clicks and
    // purchases from the events fixture as two independent watermarked
    // streams, purchases matched to the clicks they follow within 60
    // minutes. Inner-join matches emit without waiting on the watermark,
    // so a single processAllAvailable drains every pair; the watermark
    // bound is what lets Spark EVICT join state at scale. Oracle = the
    // equivalent batch interval join.
    "streaming_interval_join" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val feedBase = graft.streaming.StreamScratch.feedDir(
        "graft-stream-ij-" + new java.io.File(dir).getName)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      clicks.write.mode("overwrite").parquet(feedBase + "-c")
      purchases.write.mode("overwrite").parquet(feedBase + "-p")
      val cs = s.readStream.schema(clicks.schema).parquet(feedBase + "-c")
      val ps = s.readStream.schema(purchases.schema).parquet(feedBase + "-p")
      // Stream-stream joins run FOUR state stores per shuffle partition;
      // size the frozen-at-start partition count to the gate's state
      // volume instead of inheriting the batch default (StreamTuning).
      graft.streaming.StreamTuning.withShufflePartitions(s,
        graft.streaming.StreamTuning.GateStatePartitions) {
        // AvailableNow + awaitTermination — see streaming_sessionize.
        val q = graft.streaming.StreamJoin.attribution(cs, ps,
          windowMinutes = 60, watermark = "10 minutes")
          .writeStream.outputMode("append").format("memory")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation",
            graft.streaming.StreamScratch.freshCheckpoint("gate_stream_ij"))
          .queryName("gate_stream_ij").start()
        try q.awaitTermination() finally q.stop()
      }
      s.table("gate_stream_ij").select(col("user_id"), col("click_id"),
        col("purchase_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"))
    }),

    // Watermarked tumbling-window rollup through a REAL file stream: the
    // canonical readStream → withWatermark → window-groupBy → append-sink
    // shape, fed by the events fixture plus a sentinel 2h past max(ts) so
    // the watermark closes every real window; decimal value sums make the
    // streaming emission bit-identical to the batch rollup no matter how
    // the micro-batches split. Oracle = the batch hourly CTE.
    "streaming_hourly_stats" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        // date_trunc coerces the fixture's NTZ event time to session-TZ
        // (UTC) timestamps — wall-clock-identical, and hourly windows are
        // second-truncation-invariant (same device as streaming_sessionize)
        .select(date_trunc("second", col("ts")).as("ts"),
          col("event_type"), col("value"))
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val sentinel = s.range(1).select(
        lit(new java.sql.Timestamp(maxTs.getTime + 2 * 3600 * 1000L)).as("ts"),
        lit("__flush").as("event_type"), lit(0.0).as("value"))
      val feedDir = graft.streaming.StreamScratch.feedDir(
        "graft-stream-hourly-" + new java.io.File(dir).getName)
      ev.unionByName(sentinel).write.mode("overwrite").parquet(feedDir)
      val stream = s.readStream.schema(ev.schema).parquet(feedDir)
      graft.streaming.StreamTuning.withShufflePartitions(s,
        graft.streaming.StreamTuning.GateStatePartitions) {
        // AvailableNow + awaitTermination — see streaming_sessionize.
        // The sentinel 2h past max(ts) advances the watermark in the data
        // batch; the trailing no-data batch (shouldRunAnotherBatch) emits
        // every closed window before self-termination.
        val q = graft.streaming.WindowStats.tumblingStats(stream)
          .writeStream.outputMode("append").format("memory")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation",
            graft.streaming.StreamScratch.freshCheckpoint("gate_stream_hourly"))
          .queryName("gate_stream_hourly").start()
        try q.awaitTermination() finally q.stop()
      }
      s.table("gate_stream_hourly")
        .filter(col("event_type") =!= "__flush")
        .select(
          date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n_events"),
          col("sum_value").cast("double").as("sum_value"))
    }),

    // Day-of-week seasonal decomposition of the daily event series:
    // per-dow means as the seasonal component, per-day residuals as the
    // deseasonalized signal — the adjustment step before any trend or
    // anomaly read-out. The dow label is the engine-neutral integer form
    // (epoch_day + 4) mod 7 (0 = Monday), never a locale/dialect dow
    // function. Two hash aggregates + a 7-row broadcast join.
    "resample_seasonal_dow" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          pmod(datediff(col("ts").cast("date"),
            lit("1970-01-01").cast("date")) + 4, lit(7)).as("dow"))
        .groupBy(col("day"), col("dow")).agg(count(lit(1)).as("x"))
      val dowMean = daily.groupBy(col("dow"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("nd"))
      def d(c: Column) = c.cast("double")
      daily.join(broadcast(dowMean), Seq("dow"))
        .select(col("day"), col("dow"), col("x"),
          round(d(col("sx")) / d(col("nd")), 6).as("dow_mean"),
          round(d(col("x")) - d(col("sx")) / d(col("nd")), 6).as("residual"))
    }),

    // Kaplan–Meier survival of user lifetimes (days from first to last
    // event; users still active in the final 7 days are right-censored):
    // per-day death/censor counts, at-risk sets from a prefix over the
    // COLLAPSED day rows (bounded by distinct lifetime days, never raw
    // users), and the product-limit curve in log space — 6dp-rounded
    // ln factors decimal-summed (exact, order-free), exp at the end; a
    // zero factor (everyone remaining dies) pins survival to exactly 0
    // from that day on, on both engines.
    "survival_kaplan_meier" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("user_id"),
        unix_timestamp(col("ts")).as("sec"))
      val glob = ev.agg(max(col("sec")).as("gmax"))
      val users = ev.groupBy(col("user_id"))
        .agg(min(col("sec")).as("fst"), max(col("sec")).as("lst"))
        .crossJoin(broadcast(glob))
        .select(((col("lst") - col("fst")) / 86400L).cast("long").as("t"),
          (col("lst") >= col("gmax") - lit(7L) * 86400L).as("cen"))
      val byT = users.groupBy(col("t")).agg(
        sum(when(!col("cen"), 1L).otherwise(0L)).as("d"),
        sum(when(col("cen"), 1L).otherwise(0L)).as("c"))
      val nAll = users.agg(count(lit(1)).as("nn"))
      def dd(c: Column) = c.cast("double")
      // at-risk counts from the distributed prefix pass over the
      // collapsed lifetime-day rows (exact long sums, no global window)
      val withRisk = graft.ops.Ranking.prefixSum(
          byT.withColumn("tot", col("d") + col("c")),
          Seq(col("t").asc), Seq("tot"))
        .withColumn("cumtot", col("cum_tot"))
        .crossJoin(broadcast(nAll))
        .withColumn("n_at_risk", col("nn") - col("cumtot") + col("tot"))
      val factor = lit(1.0) - dd(col("d")) / dd(col("n_at_risk"))
      // 6dp ln factors carried as exact integer MICRO-units so the
      // running log-product and the zero-pin flag share one more prefix
      // pass (prefix max of a 0/1 flag == its prefix sum > 0); micro/1e6
      // through double division is the same correctly-rounded value the
      // decimal(18,6) running sum produced.
      graft.ops.Ranking.prefixSum(
          withRisk
            .withColumn("lfm", when(factor > 0.0,
              (round(log(factor), 6).cast("decimal(18,6)") * 1000000)
                .cast("long")).otherwise(lit(0L)))
            .withColumn("z", when(factor <= 0.0, 1L).otherwise(0L)),
          Seq(col("t").asc), Seq("lfm", "z"))
        .select(col("t").as("t_days"), col("n_at_risk"),
          col("d").as("n_deaths"), col("c").as("n_censored"),
          when(col("cum_z") > 0L, 0.0)
            .otherwise(round(exp(col("cum_lfm").cast("double") / 1e6), 6))
            .as("survival"))
    }),

    // Nelson–Aalen cumulative hazard over the same user-lifetime fabric as
    // survival_kaplan_meier: H(t) = Σ d_i/n_i with Greenwood-style variance
    // Σ d_i/n_i². Per-time increments are rounded to fixed decimals BEFORE
    // the cumulative sum, so the running totals are exact decimal adds —
    // order-free on any engine — and the window walks the collapsed
    // distinct-lifetime-day rows, never raw users.
    "survival_nelson_aalen" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("user_id"),
        unix_timestamp(col("ts")).as("sec"))
      val glob = ev.agg(max(col("sec")).as("gmax"))
      val users = ev.groupBy(col("user_id"))
        .agg(min(col("sec")).as("fst"), max(col("sec")).as("lst"))
        .crossJoin(broadcast(glob))
        .select(((col("lst") - col("fst")) / 86400L).cast("long").as("t"),
          (col("lst") >= col("gmax") - lit(7L) * 86400L).as("cen"))
      val byT = users.groupBy(col("t")).agg(
        sum(when(!col("cen"), 1L).otherwise(0L)).as("d"),
        sum(when(col("cen"), 1L).otherwise(0L)).as("c"))
      val nAll = users.agg(count(lit(1)).as("nn"))
      def dd(c: Column) = c.cast("double")
      // same two-pass prefix fabric as survival_kaplan_meier: at-risk
      // counts first, then the 9dp/12dp increments as exact integer
      // nano/pico units through a second distributed scan — the decimal
      // running sums cast to the identical correctly-rounded doubles
      val withRisk = graft.ops.Ranking.prefixSum(
          byT.withColumn("tot", col("d") + col("c")),
          Seq(col("t").asc), Seq("tot"))
        .withColumn("cumtot", col("cum_tot"))
        .crossJoin(broadcast(nAll))
        .withColumn("n_at_risk", col("nn") - col("cumtot") + col("tot"))
      graft.ops.Ranking.prefixSum(
          withRisk
            .withColumn("hzn",
              (round(dd(col("d")) / dd(col("n_at_risk")), 9)
                .cast("decimal(18,9)") * 1000000000L).cast("long"))
            .withColumn("vzp",
              (round(dd(col("d")) /
                (dd(col("n_at_risk")) * dd(col("n_at_risk"))), 12)
                .cast("decimal(22,12)") * 1000000000000L).cast("long")),
          Seq(col("t").asc), Seq("hzn", "vzp"))
        .select(col("t").as("t_days"), col("n_at_risk"),
          col("d").as("n_deaths"), col("c").as("n_censored"),
          round(col("cum_hzn").cast("double") / 1e9, 6).as("cum_hazard"),
          round(col("cum_vzp").cast("double") / 1e12, 6).as("cum_var"))
    }),

    // Two-group log-rank test (even vs odd user_id) on the lifetime fabric:
    // at each death time the even group's observed deaths vs its
    // hypergeometric expectation d·n₀/n and variance
    // d·(n₀/n)·(n₁/n)·(n−d)/(n−1); χ² = (O−E)²/V. At-risk counts per group
    // come from the same collapsed-day prefix as the KM curve; E and V
    // terms are 9dp-rounded decimals so the final sums are exact and
    // order-free. Single-row verdict the experimenter reads.
    "survival_logrank" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("user_id"),
        unix_timestamp(col("ts")).as("sec"))
      val glob = ev.agg(max(col("sec")).as("gmax"))
      val users = ev.groupBy(col("user_id"))
        .agg(min(col("sec")).as("fst"), max(col("sec")).as("lst"))
        .crossJoin(broadcast(glob))
        .select(((col("lst") - col("fst")) / 86400L).cast("long").as("t"),
          (col("lst") >= col("gmax") - lit(7L) * 86400L).as("cen"),
          (col("user_id") % 2 === 0).as("even"))
      val byT = users.groupBy(col("t")).agg(
        sum(when(!col("cen") && col("even"), 1L).otherwise(0L)).as("d0"),
        sum(when(col("cen") && col("even"), 1L).otherwise(0L)).as("c0"),
        sum(when(!col("cen") && !col("even"), 1L).otherwise(0L)).as("d1"),
        sum(when(col("cen") && !col("even"), 1L).otherwise(0L)).as("c1"))
      val nAll = users.agg(
        sum(when(col("even"), 1L).otherwise(0L)).as("n0all"),
        sum(when(!col("even"), 1L).otherwise(0L)).as("n1all"))
      def dd(c: Column) = c.cast("double")
      // per-group at-risk prefixes through the one distributed scan
      val risk = graft.ops.Ranking.prefixSum(
          byT.withColumn("tot0", col("d0") + col("c0"))
            .withColumn("tot1", col("d1") + col("c1")),
          Seq(col("t").asc), Seq("tot0", "tot1"))
        .withColumn("cum0", col("cum_tot0"))
        .withColumn("cum1", col("cum_tot1"))
        .crossJoin(broadcast(nAll))
        .withColumn("n0", col("n0all") - col("cum0") + col("tot0"))
        .withColumn("n1", col("n1all") - col("cum1") + col("tot1"))
        .withColumn("d", col("d0") + col("d1"))
        .withColumn("n", col("n0") + col("n1"))
        .filter(col("d") > 0L && col("n") >= 2L)
      val terms = risk.select(col("d0"),
        round(dd(col("d")) * dd(col("n0")) / dd(col("n")), 9)
          .cast("decimal(18,9)").as("e0"),
        round(dd(col("d")) * (dd(col("n0")) / dd(col("n"))) *
          (dd(col("n1")) / dd(col("n"))) *
          (dd(col("n")) - dd(col("d"))) / (dd(col("n")) - 1.0), 9)
          .cast("decimal(18,9)").as("v"))
      terms.agg(count(lit(1)).as("n_death_times"),
          sum(col("d0")).as("__o"), sum(col("e0")).as("__e"),
          sum(col("v")).as("__v"))
        .select(col("n_death_times"),
          col("__o").as("observed_even"),
          round(col("__e").cast("double"), 6).as("expected_even"),
          round(col("__v").cast("double"), 6).as("variance"),
          when(col("__v").cast("double") > 0.0,
            round(pow(dd(col("__o")) - col("__e").cast("double"), 2) /
              col("__v").cast("double"), 6)).otherwise(lit(0.0)).as("chi2"))
    }),

    // SFT conversation flattening: the events log as a dialogue corpus
    // (user_id = conversation, event_type = role, a key-derived utterance)
    // → per-turn (context, response) training rows with a BOUNDED rolling
    // context (3 previous turns) — one conversation-keyed exchange, state
    // capped per row no matter how long a conversation runs.
    "sft_turn_examples" -> ((s, dir) =>
      graft.ops.Sft.turnExamples(
        table(s, dir, "events").withColumn("utt",
          concat(col("event_type"), lit("#"),
            (col("event_id") % 100).cast("string"))),
        "user_id", "ts", "event_id", "event_type", "utt", contextTurns = 3)),

    // As-of join of each event to its user's latest rate snapshot
    // (ops/AsOfJoin: union + one keyed window — no range-join explosion).
    // Snapshots are fabricated weekly-per-user from integer formulas; the
    // DuckDB oracle runs its NATIVE ASOF JOIN, so two independent
    // implementations must agree row-for-row. Inner semantics: events
    // before their user's first snapshot drop (both engines).
    "asof_join_rates" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_sec"))
      val snaps = ev.select(col("user_id")).distinct()
        .select(col("user_id"), explode(sequence(lit(0L), lit(3L))).as("k"))
        .select(col("user_id"),
          (lit(1704067200L) + col("k") * 604800L + (col("user_id") % 997L) * 7L)
            .as("snap_sec"),
          (col("user_id") * 4 + col("k")).cast("double").as("rate"))
      graft.ops.AsOfJoin.asof(ev, snaps, "user_id", "ts_sec", "snap_sec", Seq("rate"))
    }),

    // FORWARD as-of with tolerance: each event picks its user's NEXT rate
    // revision at-or-after the event, only if it lands within 14 days —
    // the "next scheduled change" lookup. Reversed-window single-shuffle
    // plan (ops/AsOfJoin.asofForward) vs DuckDB's native forward ASOF
    // JOIN + tolerance filter: independent implementations, row-for-row.
    "asof_join_forward" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_sec"))
      val snaps = ev.select(col("user_id")).distinct()
        .select(col("user_id"), explode(sequence(lit(0L), lit(3L))).as("k"))
        .select(col("user_id"),
          (lit(1704067200L) + col("k") * 604800L + (col("user_id") % 997L) * 7L)
            .as("snap_sec"),
          (col("user_id") * 4 + col("k")).cast("double").as("rate"))
      graft.ops.AsOfJoin.asofForward(ev, snaps, "user_id", "ts_sec",
        "snap_sec", Seq("rate"), toleranceSec = Some(14L * 86400L))
    }),

    // Nearest-snapshot as-of join: each event takes whichever side's
    // snapshot is closer in time — backward as the base, forward as the
    // challenger, ties to backward (the conventional rule: the state that
    // WAS in effect). Forward is the backward operator on negated
    // timestamps, so both sides reuse the same single-exchange union
    // device; unmatched-on-both rows drop. Oracle = DuckDB's native
    // backward + forward ASOF LEFT JOINs with the same tie rule.
    "asof_join_nearest" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_sec"))
      val snaps = ev.select(col("user_id")).distinct()
        .select(col("user_id"), explode(sequence(lit(0L), lit(3L))).as("k"))
        .select(col("user_id"),
          (lit(1704067200L) + col("k") * 604800L + (col("user_id") % 997L) * 7L)
            .as("snap_sec"),
          (col("user_id") * 4 + col("k")).cast("double").as("rate"))
      val b = graft.ops.AsOfJoin.asof(ev,
        snaps.select(col("user_id"), col("snap_sec"),
          col("snap_sec").as("bts"), col("rate").as("rate_b")),
        "user_id", "ts_sec", "snap_sec", Seq("bts", "rate_b"), inner = false)
        .select(col("event_id"), col("bts"), col("rate_b"))
      val f = graft.ops.AsOfJoin.asof(
        ev.select(col("event_id"), col("user_id"),
          (-col("ts_sec")).as("neg_ts")),
        snaps.select(col("user_id"), (-col("snap_sec")).as("neg_snap"),
          col("snap_sec").as("fts"), col("rate").as("rate_f")),
        "user_id", "neg_ts", "neg_snap", Seq("fts", "rate_f"), inner = false)
        .select(col("event_id"), col("fts"), col("rate_f"))
      val backNearer = col("fts").isNull ||
        (col("bts").isNotNull &&
          col("ts_sec") - col("bts") <= col("fts") - col("ts_sec"))
      ev.join(b, "event_id").join(f, "event_id")
        .filter(col("bts").isNotNull || col("fts").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts_sec"),
          when(backNearer, lit("backward")).otherwise(lit("forward")).as("side"),
          when(backNearer, col("bts")).otherwise(col("fts")).as("matched_snap"),
          when(backNearer, col("rate_b")).otherwise(col("rate_f")).as("rate"),
          when(backNearer, col("ts_sec") - col("bts"))
            .otherwise(col("fts") - col("ts_sec")).as("gap_sec"))
    }),

    // Pareto concentration of the event stream: how few users generate
    // 80% of events. Per-user counts ranked desc ride the two-pass
    // distributed prefix sum (cum events + cum users), the 80% line is
    // exact integer arithmetic ceil(0.8·N) = (4N+4) div 5 — never a
    // global window, never a driver sort.
    "events_pareto_share" -> ((s, dir) => {
      val perUser = table(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt")).withColumn("one", lit(1L))
      val pre = graft.ops.Ranking.prefixSum(perUser,
        Seq(col("cnt").desc, col("user_id").asc), Seq("cnt", "one"))
      val tot = perUser.agg(sum(col("cnt")).as("n_events"),
        count(lit(1)).as("n_users"))
      val k = pre.crossJoin(broadcast(tot))
        .filter(col("cum_cnt") >= expr("(n_events * 4 + 4) div 5"))
        .agg(min(col("cum_one")).as("users_for_80pct"))
      def d(c: Column) = c.cast("double")
      tot.crossJoin(broadcast(k))
        .select(col("n_users"), col("n_events"), col("users_for_80pct"),
          round(d(col("users_for_80pct")) / d(col("n_users")), 6)
            .as("user_share"))
    }),

    // Last-touch attribution: each purchase credits its user's LATEST
    // click at-or-before it, only within a 7-day lookback — the backward
    // as-of composed from the events stream itself (clicks deduped to
    // one per (user, second), latest event_id wins, so the right side
    // meets asof's uniqueness contract). Oracle: DuckDB's native
    // backward ASOF JOIN + the same lookback filter.
    "attribution_last_touch" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_sec"), col("event_type"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_sec"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_sec").as("click_ts"))
        .agg(max(col("event_id")).as("click_id"))
      graft.ops.AsOfJoin.asof(purchases, clicks, "user_id", "ts_sec",
        "click_ts", Seq("click_id", "click_ts"))
        .filter(col("ts_sec") - col("click_ts") <= 7L * 86400L)
        .select(col("purchase_id"), col("user_id"), col("ts_sec"),
          col("click_id"), (col("ts_sec") - col("click_ts")).as("gap_sec"))
    }),

    // Position-based (U-shaped) multi-touch attribution: each user's
    // click/view touches in the 7 days before their LAST purchase share
    // that conversion 40% first / 40% last / 20% split across the middle
    // (1-touch → 100%, 2-touch → 50/50). Per-touch credits are rounded to
    // 9dp decimals so the per-channel rollup is an exact decimal sum.
    // One user-keyed exchange serves the join AND the position window.
    "attribution_position_based" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_sec"), col("event_type"))
      val conv = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(max(col("ts_sec")).as("conv_ts"))
      val touches = ev
        .filter(col("event_type") === "click" || col("event_type") === "view")
        .join(conv, "user_id")
        .filter(col("ts_sec") < col("conv_ts") &&
          col("conv_ts") - col("ts_sec") <= 7L * 86400L)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec").asc, col("event_id").asc)
      val wAll = Window.partitionBy(col("user_id"))
      val pos = touches
        .withColumn("idx", row_number().over(w).cast("long"))
        .withColumn("k", count(lit(1)).over(wAll))
      val credit = when(col("k") === 1L, lit(1.0))
        .when(col("k") === 2L, lit(0.5))
        .when(col("idx") === 1L || col("idx") === col("k"), lit(0.4))
        .otherwise(round(lit(0.2) / (col("k") - 2L).cast("double"), 9))
        .cast("decimal(18,9)")
      pos.withColumn("credit", credit)
        .groupBy(col("event_type").as("channel"))
        .agg(count(lit(1)).as("n_touches"),
          round(sum(col("credit")).cast("double"), 6).as("credit"))
    }),

    // Markov removal-effect attribution — the data-driven multi-touch
    // model: per-user journeys truncated at the first purchase feed a
    // first-order transition matrix (distributed: one user-keyed window +
    // hash aggregates); the K=16-step absorption probabilities and the
    // per-channel removal effects run on the collected DOMAIN-bounded
    // matrix with exact 12dp decimal recurrences (ops/Markov), which the
    // DuckDB oracle unrolls as 16 chained CTEs — engine-exact agreement,
    // not tolerance. Credits = positive removal effects normalized.
    "attribution_markov" -> ((s, dir) => {
      val trans = graft.ops.Markov.transitions(table(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type", convType = "purchase")
      graft.ops.Markov.removalEffects(s, trans)
    }),

    // Trailing 24h distinct-behaviour feature: for every event, how many
    // DISTINCT event types its user emitted in the strictly-preceding
    // 24 hours — the leakage-safe trailing profile a ranking model
    // consumes. One keyed range window (collect_list over the RANGE
    // frame, distinct-counted per row); the [-86400, -1] bound excludes
    // the current second entirely, so same-second events never see each
    // other on either engine.
    "feature_trailing_distinct" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
        .rangeBetween(-86400L, -1L)
      table(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_sec"), col("event_type"))
        .withColumn("n_types_24h",
          size(array_distinct(collect_list(col("event_type")).over(w)))
            .cast("long"))
        .select(col("event_id"), col("user_id"), col("ts_sec"),
          col("n_types_24h"))
    }),

    // DAU / WAU / MAU: per calendar day, distinct active users over the
    // trailing 1/7/30 days — THE product-analytics headline series.
    // Activity collapses to distinct (day, user) pairs first, then a
    // broadcast range join onto the (tiny) day grid feeds one grouped
    // triple count-distinct; exact trailing distincts cannot compose
    // from daily counts, so the pair×grid join is the honest shape and
    // its size is |days in window| × |daily actives| — bounded.
    "events_active_users" -> ((s, dir) => {
      val du = table(s, dir, "events")
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = du.select(col("day").as("d")).distinct()
      broadcast(days)
        .join(du, col("day").between(date_sub(col("d"), 29), col("d")))
        .groupBy(col("d"))
        .agg(
          countDistinct(when(col("day") === col("d"), col("user_id")))
            .as("dau"),
          countDistinct(when(col("day") >= date_sub(col("d"), 6),
            col("user_id"))).as("wau"),
          countDistinct(col("user_id")).as("mau"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau"), col("mau"))
    }),

    // Peak concurrent sessions per day — the capacity-planning number:
    // gap-sessions become [start, end] second intervals, split at
    // midnights, swept as ±1 endpoints with a per-day running sum. The
    // (t asc, delta desc) tie rule makes every same-second open/close
    // deterministic (+1s land before −1s, so touching sessions overlap
    // inclusively); the running-max multiset is order-invariant within
    // equal keys. Windows partition by DAY — never a global sweep.
    "events_peak_concurrency" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_sec"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec").asc, col("event_id").asc)
      val sess = ev
        .withColumn("__prev", lag(col("ts_sec"), 1).over(w))
        .withColumn("__new", when(col("__prev").isNull ||
          col("ts_sec") - col("__prev") > GapMinutes * 60L, 1L).otherwise(0L))
        .withColumn("__sid", sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("__sid"))
        .agg(min(col("ts_sec")).as("ss"), max(col("ts_sec")).as("se"))
      val seg = sess
        .select(col("ss"), col("se"), explode(sequence(
          to_date(from_unixtime(col("ss"))),
          to_date(from_unixtime(col("se"))))).as("day"))
        .select(col("day"),
          greatest(col("ss"),
            unix_timestamp(col("day").cast("timestamp"))).as("a"),
          least(col("se"),
            unix_timestamp(col("day").cast("timestamp")) + 86399L).as("b"))
      val pts = seg.select(col("day"), col("a").as("t"), lit(1L).as("delta"))
        .unionAll(seg.select(col("day"), col("b").as("t"), lit(-1L).as("delta")))
      val w2 = Window.partitionBy(col("day"))
        .orderBy(col("t").asc, col("delta").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pts.withColumn("__run", sum(col("delta")).over(w2))
        .groupBy(col("day"))
        .agg(max(col("__run")).as("peak_concurrency"),
          (count(lit(1)) / 2).cast("long").as("n_session_segments"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("peak_concurrency"), col("n_session_segments"))
    }),

    // Trailing EWMA of event values (half-life = 1 event, capped at 16):
    // ewma_i = Σ_j value_{i−j}·2^{15−j} / Σ_j 2^{15−j} over the trailing
    // window — ORDER-INVARIANT exactness by construction: power-of-two
    // integer weights × decimal(18,6) values sum exactly in any order,
    // so Spark's window-frame aggregation and DuckDB's join-group
    // aggregation agree bit-for-bit with doubles only at the final
    // division. The newest-first ranking is pinned by sort_array desc on
    // (ts, event_id), never by collect order.
    "feature_ewma_value" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec").asc, col("event_id").asc)
        .rowsBetween(-15, 0)
      val arr = reverse(sort_array(collect_list(
        struct(col("ts_sec"), col("event_id"),
          col("value").cast("decimal(18,6)").as("v"))).over(w)))
      val weights = transform(col("__a"),
        (_, i) => pow(lit(2.0), lit(15) - i).cast("long"))
      val num = aggregate(
        zip_with(col("__a"), weights, (x, wt) => x.getField("v") * wt),
        lit(0).cast("decimal(38,6)"), (acc, x) => acc + x)
      val den = aggregate(weights, lit(0L), (acc, x) => acc + x)
      table(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_sec"), col("value"))
        .withColumn("__a", arr)
        .select(col("event_id"), col("user_id"), col("ts_sec"),
          round(num.cast("double") / den.cast("double"), 6).as("ewma"))
    }),

    // Strict-order conversion funnel view → click → purchase: per-stage
    // min-aggregates chained by user-keyed joins, no per-user windows.
    "funnel_stages" -> ((s, dir) => {
      val f = graft.ops.Funnel.funnel(table(s, dir, "events"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      f.select(col("user_id"),
        date_format(col("t_view"), "yyyy-MM-dd HH:mm:ss").as("t_view"),
        date_format(col("t_click"), "yyyy-MM-dd HH:mm:ss").as("t_click"),
        date_format(col("t_purchase"), "yyyy-MM-dd HH:mm:ss").as("t_purchase"),
        col("stage"))
    }),

    // Windowed funnel: same chain, but conversion only counts within 48h
    // of the user's first view — the deadline-bounded product metric
    // (funnel_stages' eventual-conversion numbers over-credit the funnel;
    // this is the one a growth team actually reports). Timestamps ride as
    // unix seconds so the +48h arithmetic is engine-neutral.
    "funnel_window_steps" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("user_id"),
        unix_timestamp(col("ts")).as("sec"), col("event_type"))
      graft.ops.Funnel.windowFunnel(ev, "user_id", "sec", "event_type",
        Seq("view", "click", "purchase"), windowSec = 48L * 3600L)
    }),

    // Cohort retention: first-activity-day cohorts × active-age cells.
    "cohort_retention" -> ((s, dir) =>
      graft.ops.Funnel.cohortRetention(table(s, dir, "events"),
        "user_id", "ts")),

    // Watermark late-data audit — the batch mirror of the streaming
    // dropped-rows decision: with a 10-minute allowed delay, an event is
    // late iff its timestamp sits more than the delay behind the highest
    // timestamp already arrived. Arrival time = event time + a bounded
    // deterministic transport jitter (knuth32(event_id) mod ±2 h — the
    // fixture's event_id order IS its timestamp order, under which nothing
    // is ever late), so the policy sees realistic partial out-of-orderness
    // rather than 0% or ~100% lateness. The running max rides the two-pass
    // distributed prefix scan (ops/Ranking.prefixMax), never a single-task
    // global window; the verdict collapses per type.
    "streaming_late_audit" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("event_id"),
        col("event_type"), unix_timestamp(col("ts")).as("sec"))
        .withColumn("arrival",
          col("sec") +
            pmod(pmod(col("event_id"), lit(1000000007L)) * lit(2654435761L),
              lit(14401L)) - lit(7200L))
      val scanned = graft.ops.Ranking.prefixMax(ev,
        Seq(col("arrival").asc, col("event_id").asc), Seq("sec"))
      def d(c: Column) = c.cast("double")
      scanned
        .withColumn("late",
          when(col("sec") < col("cummax_sec") - 600L, 1L).otherwise(0L))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("late")).as("n_late"),
          round(sum(col("late")).cast("double") / d(count(lit(1))), 6)
            .as("late_rate"))
    }),

    // Cohort LTV curve: first-activity-day cohorts, purchase revenue per
    // age day, and the CUMULATIVE revenue per cohort member — the payback
    // curve a growth model is trained against. Cells are exact decimal
    // sums; the running total is a cohort-keyed decimal window over the
    // collapsed (cohort, age) cells, never raw events.
    "cohort_ltv_curve" -> ((s, dir) => {
      val ev = table(s, dir, "events").select(col("user_id"),
        col("ts").cast("date").as("day"), col("event_type"),
        col("value").cast("decimal(18,6)").as("v"))
      val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
      val size = first.groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_users"))
      val cells = ev.join(first, "user_id")
        .filter(col("event_type") === "purchase")
        .groupBy(col("cohort"),
          datediff(col("day"), col("cohort")).cast("long").as("age_days"))
        .agg(sum(col("v")).as("rev"))
      val w = Window.partitionBy(col("cohort")).orderBy(col("age_days").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def dd(c: Column) = c.cast("double")
      cells.join(broadcast(size), "cohort")
        .withColumn("cum", sum(col("rev")).over(w))
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("age_days"), col("n_users"),
          round(dd(col("rev")), 6).as("rev"),
          round(dd(col("cum")) / dd(col("n_users")), 6).as("ltv_per_user"))
    }),

    // Per-user hourly resample with explicit zero rows for silent hours.
    "resample_user_hours" -> ((s, dir) =>
      graft.ops.Resample.hourlyPerKey(table(s, dir, "events"),
        "user_id", "ts", "value")),

    // Recency-weighted activity: each event contributes 0.5^(age/1day)
    // back from the latest event in the corpus — the time-decayed count
    // feature (exact decimal sum of 6dp-rounded pow terms).
    "feature_time_decay" -> ((s, dir) =>
      graft.ops.Resample.timeDecayed(table(s, dir, "events"),
        "user_id", "ts", halfLifeSeconds = 86400L)),

    // Rate-spike anomalies: each hour vs the mean of its PRIOR 24 grid
    // hours (the spike never inflates its own baseline).
    "anomaly_rate_spikes" -> ((s, dir) =>
      graft.ops.Resample.rateSpikes(
        graft.ops.Resample.hourlyPerKey(table(s, dir, "events"),
          "user_id", "ts", "value"),
        "user_id", "hour_sec", "n_events", windowHours = 24, factor = 3.0)),

    // OHLC candlestick bars per (user, hour): first/max/min/last value
    // in (ts, event_id) order — values pass through untouched, so the
    // gate is engine-exact with no rounding.
    "resample_ohlc" -> ((s, dir) =>
      graft.ops.Resample.ohlcBars(table(s, dir, "events"),
        "user_id", "ts", "event_id", "value")),

    // LOCF gap-fill over the hourly grid: silent hours inherit the last
    // observed hour's value_sum; leading gaps stay null.
    "resample_locf" -> ((s, dir) =>
      graft.ops.Resample.locfFill(
        graft.ops.Resample.hourlyPerKey(table(s, dir, "events"),
          "user_id", "ts", "value"),
        "user_id", "hour_sec", "n_events", "value_sum")),

    // Exact trailing-5 rolling median per user — midpoint arithmetic
    // mirrored token-for-token in the oracle (never an engine's native
    // quantile interpolation). Timestamps exported as epoch seconds.
    "agg_rolling_median" -> ((s, dir) =>
      graft.ops.Resample.rollingMedian(table(s, dir, "events"),
        "user_id", "ts", "event_id", "value", k = 5)
        .withColumn("sec", unix_timestamp(col("ts")))
        .drop("ts")),

    // Semi-structured extraction over the props payload, aggregated per
    // extracted key value. get_json_object (extract-then-cast) rather
    // than from_json with a typed schema: the oracle's
    // json_extract_string + CAST has extract-then-cast semantics, and the
    // two diverge on quoted numbers / malformed rows — the established
    // json_sum precedent.
    "events_json_props" -> ((s, dir) =>
      table(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"), col("k"))
        .agg(count(lit(1)).as("n"))),

    // Time-weighted mean value per user: each reading weighted by how
    // long it was current (until the next event); final open interval
    // drops. Decimal value·seconds sums — order-invariant.
    "agg_time_weighted" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      table(s, dir, "events")
        .withColumn("__next", lead(unix_timestamp(col("ts")), 1).over(w))
        .filter(col("__next").isNotNull)
        .select(col("user_id"),
          (col("__next") - unix_timestamp(col("ts"))).as("__dt"),
          col("value").cast("decimal(18,6)").as("__v"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("__dt")).as("total_sec"),
          when(sum(col("__dt")) > 0,
            round(sum(col("__v") * col("__dt")).cast("double") /
              sum(col("__dt")).cast("double"), 6))
            .otherwise(lit(null)).as("tw_mean"))
    }),

    // Sequence features: each user's LAST 5 event types, newest first —
    // the recency window a sequential recommender consumes. Rendered as a
    // '>'-joined string: the gate comparator hashes scalar cells, so the
    // sequence ships serialized (same convention as collectset/session
    // paths), not as an array column.
    "feature_last_events" -> ((s, dir) =>
      table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          slice(reverse(sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("event_type"))))), 1, 5)
            .as("__top"))
        .select(col("user_id"), col("n_events"),
          array_join(transform(col("__top"), e => e.getField("event_type")), ">")
            .as("last_events"))),

    // Session path mining: per gap-session, the first 5 event types as a
    // '>'-joined journey string, counted per distinct path.
    "session_paths" -> ((s, dir) =>
      graft.ops.Funnel.sessionPaths(table(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type",
        gapSec = GapMinutes * 60L, maxLen = 5)),

    // First-order behavioral Markov matrix: per-user event streams in
    // (ts, event_id) order, lag pairs, global transition counts and
    // row-normalized probabilities (6dp — exact integer division).
    "event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val pairs = table(s, dir, "events")
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val w2 = Window.partitionBy(col("from_type"))
      pairs.select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / sum(col("n")).over(w2).cast("double"), 6)
          .as("p"))
    }),

    // Entropy rate of the event-transition Markov chain: H(next | cur) =
    // (1/N)·Σ_{s,t} n_st·ln(n_s/n_st) over the same transition counts as
    // event_transitions, plus the branching perplexity e^H — the sequence-
    // predictability health metric for a behavioural stream. Per-cell log
    // terms in integer nano-units (exact sums); 25-cell closure.
    "events_transition_entropy" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val cells = table(s, dir, "events")
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
        .agg(count(lit(1)).as("nst"))
      val marg = cells.groupBy(col("src")).agg(sum(col("nst")).as("ns"))
      def d(c: Column) = c.cast("double")
      val terms = cells.join(broadcast(marg), "src")
        .select((col("nst") *
          round(log(d(col("ns")) / d(col("nst"))) * 1.0e9, 0).cast("long"))
          .cast("decimal(38,0)").as("t"))
        .agg(sum(col("t")).as("st"), count(lit(1)).as("k_cells"))
      val tot = cells.agg(sum(col("nst")).as("n_transitions"),
        countDistinct(col("src")).as("k_states"))
      val h = d(col("st")) / (d(col("n_transitions")) * 1.0e9)
      tot.crossJoin(broadcast(terms))
        .select(col("n_transitions"), col("k_states"), col("k_cells"),
          round(h, 6).as("entropy_nats"),
          round(exp(h), 6).as("perplexity"))
    }))

  /** Markov attribution oracle: the SAME journey truncation + transition
    * matrix as ops/Markov, then the K-step absorption recurrence unrolled
    * as [[graft.ops.Markov.Steps]] chained CTEs (p1..pK) — each step a
    * 12dp-rounded exact-decimal matrix-vector product, identical to the
    * driver-local BigDecimal loop. */
  private lazy val attributionMarkovSql: String = {
    val steps = (1 to graft.ops.Markov.Steps).map { i =>
      s"""p$i AS MATERIALIZED (SELECT * FROM (
         |    SELECT sx.scen, sx.src AS state,
         |      CAST(round(sum(sx.prob * q.p), 12) AS DECIMAL(18,12)) AS p
         |    FROM sx JOIN p${i - 1} q ON q.scen = sx.scen AND q.state = sx.dst
         |    GROUP BY 1, 2)
         |  UNION ALL SELECT scen, '__conv', CAST(1 AS DECIMAL(18,12)) FROM sc)""".stripMargin
    }.mkString(",\n")
    s"""WITH r AS (SELECT user_id, event_id, event_type,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS BIGINT) AS rk
       |  FROM events),
       |fp AS (SELECT user_id, min(rk) AS rp FROM r
       |  WHERE event_type = 'purchase' GROUP BY 1),
       |kp AS (SELECT r.user_id, r.rk,
       |    CASE WHEN r.event_type = 'purchase' THEN '__conv'
       |      ELSE r.event_type END AS st
       |  FROM r LEFT JOIN fp USING (user_id) WHERE rp IS NULL OR r.rk <= rp),
       |sq AS (SELECT *, lead(st) OVER (PARTITION BY user_id ORDER BY rk) AS nxt
       |  FROM kp),
       |tr AS (SELECT st AS src, coalesce(nxt, '__null') AS dst FROM sq
       |    WHERE st <> '__conv'
       |  UNION ALL SELECT '__start', st FROM sq WHERE rk = 1),
       |cnt AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS c
       |  FROM tr GROUP BY 1, 2),
       |tt AS (SELECT src, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1),
       |trans AS MATERIALIZED (SELECT src, dst,
       |    CAST(round(CAST(c AS DOUBLE) / CAST(t AS DOUBLE), 12)
       |      AS DECIMAL(18,12)) AS prob
       |  FROM cnt JOIN tt USING (src)),
       |chan AS (SELECT DISTINCT src AS ch FROM trans
       |  WHERE src NOT IN ('__start', '__conv', '__null')),
       |sc AS MATERIALIZED (SELECT '__full' AS scen UNION ALL SELECT ch FROM chan),
       |sx AS MATERIALIZED (SELECT s.scen, t.src,
       |    CASE WHEN t.dst = s.scen THEN '__null' ELSE t.dst END AS dst,
       |    CAST(sum(prob) AS DECIMAL(18,12)) AS prob
       |  FROM sc s JOIN trans t ON t.src <> s.scen GROUP BY 1, 2, 3),
       |p0 AS MATERIALIZED (SELECT scen, '__conv' AS state, CAST(1 AS DECIMAL(18,12)) AS p
       |  FROM sc),
       |$steps,
       |pf AS (SELECT scen, p FROM p${graft.ops.Markov.Steps}
       |  WHERE state = '__start'),
       |fl AS (SELECT CAST(p AS DOUBLE) AS pfull FROM pf WHERE scen = '__full'),
       |re AS (SELECT c.ch AS channel, CAST(pf.p AS DOUBLE) AS prem, fl.pfull
       |  FROM chan c JOIN pf ON pf.scen = c.ch, fl),
       |r6 AS (SELECT channel, round(pfull, 6) AS p_conv_full,
       |    round(prem, 6) AS p_conv_removed,
       |    CASE WHEN pfull > 0 THEN round(1.0 - prem / pfull, 6)
       |      ELSE 0.0 END AS removal_effect
       |  FROM re),
       |ps AS (SELECT *, CAST(greatest(removal_effect, 0.0) AS DECIMAL(18,6))
       |    AS rep FROM r6),
       |t2 AS (SELECT sum(rep) AS s FROM ps)
       |SELECT channel, p_conv_full, p_conv_removed, removal_effect,
       |  CASE WHEN CAST(s AS DOUBLE) > 0
       |    THEN round(CAST(rep AS DOUBLE) / CAST(s AS DOUBLE), 6)
       |    ELSE 0.0 END AS attribution
       |FROM ps, t2""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "sessionize_events" ->
      s"""WITH o AS (
         |  SELECT user_id, event_id, ts, value,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |f AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL
         |      OR date_diff('second', prev_ts, ts) > ${GapMinutes * 60} THEN 1 ELSE 0 END AS new_session
         |  FROM o),
         |s AS (
         |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         |  FROM f)
         |SELECT user_id, session_idx, count(*) AS n_events,
         |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
         |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
         |FROM s GROUP BY 1, 2""".stripMargin,
    "resample_seasonal_dow" ->
      """WITH daily AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST((((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7)
        |      + 7) % 7 AS INT) AS dow,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |dm AS (SELECT dow, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(count(*) AS BIGINT) AS nd FROM daily GROUP BY 1)
        |SELECT day, dow, x,
        |  round(CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE), 6) AS dow_mean,
        |  round(CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE), 6)
        |    AS residual
        |FROM daily JOIN dm USING (dow)""".stripMargin,

    "survival_kaplan_meier" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |g AS (SELECT max(sec) AS gmax FROM e),
        |u AS (SELECT user_id, min(sec) AS fst, max(sec) AS lst FROM e GROUP BY 1),
        |uu AS (SELECT (lst - fst) // 86400 AS t,
        |    (lst >= gmax - 7 * 86400) AS cen FROM u, g),
        |bt AS (SELECT t,
        |    CAST(sum(CASE WHEN NOT cen THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(sum(CASE WHEN cen THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM uu GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uu),
        |cumt AS (SELECT *, d + c AS tot,
        |    CAST(sum(d + c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumtot
        |  FROM bt),
        |cr AS (SELECT t, d, c, n - cumtot + tot AS n_at_risk FROM cumt, nn),
        |lf AS (SELECT *,
        |    1.0 - CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS factor FROM cr),
        |l2 AS (SELECT t, d, c, n_at_risk,
        |    CASE WHEN factor > 0.0 THEN CAST(round(ln(factor), 6) AS DECIMAL(18,6))
        |      ELSE CAST(0 AS DECIMAL(18,6)) END AS lfv,
        |    CASE WHEN factor <= 0.0 THEN 1 ELSE 0 END AS z FROM lf),
        |l3 AS (SELECT *, max(z) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS zero,
        |    sum(lfv) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS ls FROM l2)
        |SELECT t AS t_days, CAST(n_at_risk AS BIGINT) AS n_at_risk,
        |  d AS n_deaths, c AS n_censored,
        |  CASE WHEN zero = 1 THEN 0.0
        |    ELSE round(exp(CAST(ls AS DOUBLE)), 6) END AS survival
        |FROM l3""".stripMargin,

    "survival_nelson_aalen" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |g AS (SELECT max(sec) AS gmax FROM e),
        |u AS (SELECT user_id, min(sec) AS fst, max(sec) AS lst FROM e GROUP BY 1),
        |uu AS (SELECT (lst - fst) // 86400 AS t,
        |    (lst >= gmax - 7 * 86400) AS cen FROM u, g),
        |bt AS (SELECT t,
        |    CAST(sum(CASE WHEN NOT cen THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(sum(CASE WHEN cen THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM uu GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uu),
        |cumt AS (SELECT *, d + c AS tot,
        |    CAST(sum(d + c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumtot
        |  FROM bt),
        |cr AS (SELECT t, d, c, n - cumtot + tot AS n_at_risk FROM cumt, nn),
        |tm AS (SELECT *,
        |    CAST(round(CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE), 9)
        |      AS DECIMAL(18,9)) AS hz,
        |    CAST(round(CAST(d AS DOUBLE) /
        |      (CAST(n_at_risk AS DOUBLE) * CAST(n_at_risk AS DOUBLE)), 12)
        |      AS DECIMAL(22,12)) AS vz
        |  FROM cr)
        |SELECT t AS t_days, CAST(n_at_risk AS BIGINT) AS n_at_risk,
        |  d AS n_deaths, c AS n_censored,
        |  round(CAST(sum(hz) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |    AS DOUBLE), 6) AS cum_hazard,
        |  round(CAST(sum(vz) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |    AS DOUBLE), 6) AS cum_var
        |FROM tm""".stripMargin,

    "survival_logrank" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |g AS (SELECT max(sec) AS gmax FROM e),
        |u AS (SELECT user_id, min(sec) AS fst, max(sec) AS lst FROM e GROUP BY 1),
        |uu AS (SELECT (lst - fst) // 86400 AS t,
        |    (lst >= gmax - 7 * 86400) AS cen,
        |    (user_id % 2 = 0) AS even FROM u, g),
        |bt AS (SELECT t,
        |    CAST(sum(CASE WHEN NOT cen AND even THEN 1 ELSE 0 END) AS BIGINT) AS d0,
        |    CAST(sum(CASE WHEN cen AND even THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN NOT cen AND NOT even THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        |    CAST(sum(CASE WHEN cen AND NOT even THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM uu GROUP BY 1),
        |nn AS (SELECT
        |    CAST(sum(CASE WHEN even THEN 1 ELSE 0 END) AS BIGINT) AS n0all,
        |    CAST(sum(CASE WHEN NOT even THEN 1 ELSE 0 END) AS BIGINT) AS n1all
        |  FROM uu),
        |cumt AS (SELECT *, d0 + c0 AS tot0, d1 + c1 AS tot1,
        |    CAST(sum(d0 + c0) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum0,
        |    CAST(sum(d1 + c1) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1
        |  FROM bt),
        |risk AS (SELECT *, n0all - cum0 + tot0 AS n0, n1all - cum1 + tot1 AS n1,
        |    d0 + d1 AS d FROM cumt, nn),
        |rf AS (SELECT *, n0 + n1 AS n FROM risk WHERE d0 + d1 > 0
        |    AND n0 + n1 >= 2),
        |tm AS (SELECT d0,
        |    CAST(round(CAST(d AS DOUBLE) * CAST(n0 AS DOUBLE) /
        |      CAST(n AS DOUBLE), 9) AS DECIMAL(18,9)) AS e0,
        |    CAST(round(CAST(d AS DOUBLE) *
        |      (CAST(n0 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (CAST(n AS DOUBLE) - CAST(d AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) - 1.0), 9) AS DECIMAL(18,9)) AS v
        |  FROM rf)
        |SELECT CAST(count(*) AS BIGINT) AS n_death_times,
        |  CAST(sum(d0) AS BIGINT) AS observed_even,
        |  round(CAST(sum(e0) AS DOUBLE), 6) AS expected_even,
        |  round(CAST(sum(v) AS DOUBLE), 6) AS variance,
        |  CASE WHEN CAST(sum(v) AS DOUBLE) > 0.0
        |    THEN round(pow(CAST(sum(d0) AS DOUBLE) - CAST(sum(e0) AS DOUBLE), 2)
        |      / CAST(sum(v) AS DOUBLE), 6)
        |    ELSE 0.0 END AS chi2
        |FROM tm""".stripMargin,

    "streaming_interval_join" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, click_id, purchase_id,
        |  strftime(click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  strftime(purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
        |FROM c JOIN p ON p.user_id = c.user_id
        |  AND purchase_ts > click_ts
        |  AND purchase_ts <= click_ts + INTERVAL 60 MINUTE""".stripMargin,

    "streaming_watermark_drop" ->
      """WITH e AS (SELECT date_trunc('second', ts) AS ts, event_type, value
        |  FROM events),
        |g AS (SELECT max(ts) AS mx FROM e),
        |f AS (SELECT e.* FROM e, g WHERE ts > mx - INTERVAL 2 DAY),
        |w AS (SELECT date_trunc('hour', ts) AS hs, event_type,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |  FROM f GROUP BY 1, 2)
        |SELECT strftime(hs, '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  n_events, sum_value
        |FROM w, g WHERE hs + INTERVAL 1 HOUR <= mx - INTERVAL 30 MINUTE""".stripMargin,

    "streaming_hourly_stats" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "streaming_sessionize" ->
      s"""WITH o AS (
         |  SELECT user_id, event_id, ts,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |f AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL
         |      OR date_diff('second', prev_ts, ts) > ${GapMinutes * 60} THEN 1 ELSE 0 END AS new_session
         |  FROM o),
         |s AS (
         |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         |  FROM f)
         |SELECT user_id,
         |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
         |  count(*) AS n_events
         |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "sft_turn_examples" ->
      """WITH u AS (
        |  SELECT user_id AS conv_id, ts, event_id, event_type AS role,
        |    concat(event_type, '#', cast(event_id % 100 as string)) AS utt
        |  FROM events)
        |SELECT conv_id,
        |  CAST(row_number() OVER w AS BIGINT) AS turn_idx, role,
        |  coalesce(string_agg(utt, ' | ') OVER
        |    (PARTITION BY conv_id ORDER BY ts, event_id
        |     ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), '') AS context,
        |  utt AS response
        |FROM u WINDOW w AS (PARTITION BY conv_id ORDER BY ts, event_id)""".stripMargin,

    "asof_join_rates" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
        |s AS (
        |  SELECT user_id, 1704067200 + k * 604800 + (user_id % 997) * 7 AS snap_sec,
        |    CAST(user_id * 4 + k AS DOUBLE) AS rate
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS k) ks)
        |SELECT e.event_id, e.user_id, e.ts_sec, s.rate
        |FROM e ASOF JOIN s ON e.user_id = s.user_id AND e.ts_sec >= s.snap_sec""".stripMargin,

    "events_active_users" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day AS d FROM du)
        |SELECT strftime(d, '%Y-%m-%d') AS day,
        |  count(DISTINCT CASE WHEN du.day = d THEN user_id END) AS dau,
        |  count(DISTINCT CASE WHEN du.day >= d - 6 THEN user_id END) AS wau,
        |  count(DISTINCT user_id) AS mau
        |FROM days JOIN du ON du.day BETWEEN d - 29 AND d
        |GROUP BY 1""".stripMargin,

    "events_peak_concurrency" ->
      s"""WITH e AS (SELECT user_id, event_id,
         |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
         |o AS (SELECT *, lag(ts_sec) OVER (PARTITION BY user_id
         |    ORDER BY ts_sec, event_id) AS prev FROM e),
         |f AS (SELECT *, CASE WHEN prev IS NULL
         |    OR ts_sec - prev > ${GapMinutes * 60} THEN 1 ELSE 0 END AS ns
         |  FROM o),
         |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
         |    ORDER BY ts_sec, event_id ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM f),
         |sess AS (SELECT user_id, sid, min(ts_sec) AS ss, max(ts_sec) AS se
         |  FROM s GROUP BY 1, 2),
         |seg AS (SELECT CAST(d AS DATE) AS day,
         |    greatest(ss, CAST(epoch(CAST(CAST(d AS DATE) AS TIMESTAMP)) AS BIGINT)) AS a,
         |    least(se, CAST(epoch(CAST(CAST(d AS DATE) AS TIMESTAMP)) AS BIGINT) + 86399) AS b
         |  FROM sess, unnest(range(
         |    CAST(make_timestamp(ss * 1000000) AS DATE),
         |    CAST(make_timestamp(se * 1000000) AS DATE) + 1,
         |    INTERVAL 1 DAY)) t(d)),
         |pts AS (SELECT day, a AS t, 1 AS delta FROM seg
         |        UNION ALL SELECT day, b, -1 FROM seg),
         |r AS (SELECT day, sum(delta) OVER (PARTITION BY day
         |    ORDER BY t, delta DESC ROWS UNBOUNDED PRECEDING) AS run
         |  FROM pts)
         |SELECT strftime(day, '%Y-%m-%d') AS day,
         |  CAST(max(run) AS BIGINT) AS peak_concurrency,
         |  CAST(count(*) / 2 AS BIGINT) AS n_session_segments
         |FROM r GROUP BY 1""".stripMargin,

    "feature_ewma_value" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_sec, event_id) AS rn FROM e)
        |SELECT a.event_id, a.user_id, a.ts_sec,
        |  round(CAST(sum(CAST(b.value AS DECIMAL(18,6)) *
        |      CAST(power(2, 15 - (a.rn - b.rn)) AS BIGINT)) AS DOUBLE) /
        |    CAST(sum(CAST(power(2, 15 - (a.rn - b.rn)) AS BIGINT)) AS DOUBLE),
        |    6) AS ewma
        |FROM r a JOIN r b ON b.user_id = a.user_id
        |  AND b.rn BETWEEN a.rn - 15 AND a.rn
        |GROUP BY 1, 2, 3""".stripMargin,

    "attribution_last_touch" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_type
        |  FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, ts_sec FROM e
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_sec AS click_ts,
        |    CAST(max(event_id) AS BIGINT) AS click_id
        |  FROM e WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.purchase_id, p.user_id, p.ts_sec, c.click_id,
        |  p.ts_sec - c.click_ts AS gap_sec
        |FROM p ASOF JOIN c
        |  ON p.user_id = c.user_id AND p.ts_sec >= c.click_ts
        |WHERE p.ts_sec - c.click_ts <= 7 * 86400""".stripMargin,

    "attribution_position_based" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_type
        |  FROM events),
        |conv AS (SELECT user_id, CAST(max(ts_sec) AS BIGINT) AS conv_ts
        |  FROM e WHERE event_type = 'purchase' GROUP BY 1),
        |t AS (SELECT e.event_id, e.user_id, e.ts_sec, e.event_type
        |  FROM e JOIN conv USING (user_id)
        |  WHERE event_type IN ('click', 'view') AND ts_sec < conv_ts
        |    AND conv_ts - ts_sec <= 7 * 86400),
        |p AS (SELECT event_type,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_sec ASC, event_id ASC) AS BIGINT) AS idx,
        |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS k
        |  FROM t),
        |c AS (SELECT event_type,
        |    CAST(CASE WHEN k = 1 THEN 1.0 WHEN k = 2 THEN 0.5
        |      WHEN idx = 1 OR idx = k THEN 0.4
        |      ELSE round(0.2 / CAST(k - 2 AS DOUBLE), 9)
        |    END AS DECIMAL(18,9)) AS credit
        |  FROM p)
        |SELECT event_type AS channel, CAST(count(*) AS BIGINT) AS n_touches,
        |  round(CAST(sum(credit) AS DOUBLE), 6) AS credit
        |FROM c GROUP BY 1""".stripMargin,

    "attribution_markov" -> attributionMarkovSql,

    "feature_trailing_distinct" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_type
        |  FROM events)
        |SELECT a.event_id, a.user_id, a.ts_sec,
        |  CAST(count(DISTINCT b.event_type) AS BIGINT) AS n_types_24h
        |FROM e a LEFT JOIN e b ON b.user_id = a.user_id
        |  AND b.ts_sec >= a.ts_sec - 86400 AND b.ts_sec <= a.ts_sec - 1
        |GROUP BY 1, 2, 3""".stripMargin,

    "asof_join_nearest" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
        |  FROM events),
        |s AS (
        |  SELECT user_id, 1704067200 + k * 604800 + (user_id % 997) * 7 AS snap_sec,
        |    CAST(user_id * 4 + k AS DOUBLE) AS rate
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS k) ks),
        |b AS (SELECT e.event_id, CAST(s.snap_sec AS BIGINT) AS bts,
        |    s.rate AS rate_b
        |  FROM e ASOF LEFT JOIN s
        |    ON e.user_id = s.user_id AND e.ts_sec >= s.snap_sec),
        |f AS (SELECT e.event_id, CAST(s.snap_sec AS BIGINT) AS fts,
        |    s.rate AS rate_f
        |  FROM e ASOF LEFT JOIN s
        |    ON e.user_id = s.user_id AND e.ts_sec <= s.snap_sec)
        |SELECT e.event_id, e.user_id, e.ts_sec,
        |  CASE WHEN fts IS NULL OR (bts IS NOT NULL
        |      AND e.ts_sec - bts <= fts - e.ts_sec)
        |    THEN 'backward' ELSE 'forward' END AS side,
        |  CAST(CASE WHEN fts IS NULL OR (bts IS NOT NULL
        |      AND e.ts_sec - bts <= fts - e.ts_sec)
        |    THEN bts ELSE fts END AS BIGINT) AS matched_snap,
        |  CASE WHEN fts IS NULL OR (bts IS NOT NULL
        |      AND e.ts_sec - bts <= fts - e.ts_sec)
        |    THEN rate_b ELSE rate_f END AS rate,
        |  CAST(CASE WHEN fts IS NULL OR (bts IS NOT NULL
        |      AND e.ts_sec - bts <= fts - e.ts_sec)
        |    THEN e.ts_sec - bts ELSE fts - e.ts_sec END AS BIGINT) AS gap_sec
        |FROM e JOIN b USING (event_id) JOIN f USING (event_id)
        |WHERE bts IS NOT NULL OR fts IS NOT NULL""".stripMargin,

    "events_pareto_share" ->
      """WITH pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_events,
        |    CAST(count(*) AS BIGINT) AS n_users FROM pu),
        |c AS (SELECT cnt,
        |    CAST(sum(cnt) OVER w AS BIGINT) AS cum_cnt,
        |    CAST(count(*) OVER w AS BIGINT) AS cum_one
        |  FROM pu WINDOW w AS (ORDER BY cnt DESC, user_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |k AS (SELECT min(cum_one) AS users_for_80pct
        |  FROM c, tot WHERE cum_cnt >= (n_events * 4 + 4) // 5)
        |SELECT n_users, n_events,
        |  CAST(users_for_80pct AS BIGINT) AS users_for_80pct,
        |  round(CAST(users_for_80pct AS DOUBLE) /
        |    CAST(n_users AS DOUBLE), 6) AS user_share
        |FROM tot, k""".stripMargin,

    "asof_join_forward" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
        |s AS (
        |  SELECT user_id, 1704067200 + k * 604800 + (user_id % 997) * 7 AS snap_sec,
        |    CAST(user_id * 4 + k AS DOUBLE) AS rate
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS k) ks)
        |SELECT event_id, user_id, ts_sec, rate, matched_ts FROM (
        |  SELECT e.event_id, e.user_id, e.ts_sec, s.rate,
        |    CAST(s.snap_sec AS BIGINT) AS matched_ts
        |  FROM e ASOF JOIN s ON e.user_id = s.user_id AND e.ts_sec <= s.snap_sec)
        |WHERE matched_ts - ts_sec <= 14 * 86400""".stripMargin,

    // Mirror of session_window's exact boundary rule: a session continues
    // while ts < previous ts + gap (full-precision timestamps; the
    // lag-based sessionize_events oracle floors to seconds and uses
    // strict >, so the two gates pin both semantics independently).
    "sessionize_native" ->
      s"""WITH o AS (SELECT user_id, event_id, ts, value,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |f AS (SELECT *, CASE WHEN prev_ts IS NULL
         |    OR ts >= prev_ts + INTERVAL $GapMinutes MINUTE THEN 1 ELSE 0 END AS ns
         |  FROM o),
         |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS idx
         |  FROM f)
         |SELECT user_id,
         |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
         |FROM s GROUP BY user_id, idx""".stripMargin,

    "funnel_stages" ->
      """WITH v AS (SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts) AS t1 FROM events e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND ts > t0 GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > t1 GROUP BY 1)
        |SELECT v.user_id,
        |  strftime(t0, '%Y-%m-%d %H:%M:%S') AS t_view,
        |  strftime(t1, '%Y-%m-%d %H:%M:%S') AS t_click,
        |  strftime(t2, '%Y-%m-%d %H:%M:%S') AS t_purchase,
        |  CAST(CASE WHEN t2 IS NOT NULL THEN 3 WHEN t1 IS NOT NULL THEN 2
        |    ELSE 1 END AS INT) AS stage
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin,

    "cohort_ltv_curve" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type,
        |    CAST(value AS DECIMAL(18,6)) AS v FROM events),
        |f AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1),
        |sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
        |  FROM f GROUP BY 1),
        |cells AS (SELECT cohort,
        |    CAST(date_diff('day', cohort, day) AS BIGINT) AS age_days,
        |    sum(v) AS rev
        |  FROM e JOIN f USING (user_id) WHERE event_type = 'purchase'
        |  GROUP BY 1, 2),
        |c2 AS (SELECT cells.*, n_users,
        |    sum(rev) OVER (PARTITION BY cohort ORDER BY age_days
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM cells JOIN sz USING (cohort))
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort, age_days, n_users,
        |  round(CAST(rev AS DOUBLE), 6) AS rev,
        |  round(CAST(cum AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
        |    AS ltv_per_user
        |FROM c2""".stripMargin,

    "funnel_window_steps" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    event_type FROM events),
        |v AS (SELECT user_id, min(sec) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(sec) AS t_click FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND sec > t_view
        |    AND sec <= t_view + 172800 GROUP BY 1),
        |p AS (SELECT e.user_id, min(sec) AS t_purchase
        |  FROM e JOIN c USING (user_id) JOIN v USING (user_id)
        |  WHERE event_type = 'purchase' AND sec > t_click
        |    AND sec <= t_view + 172800 GROUP BY 1)
        |SELECT v.user_id, t_view, t_click, t_purchase,
        |  CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
        |    WHEN t_click IS NOT NULL THEN 2 ELSE 1 END AS INT) AS stage
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin,

    "streaming_late_audit" ->
      s"""WITH e AS (SELECT event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    CAST(floor(epoch(ts)) AS BIGINT) +
        |      (((event_id % 1000000007) + 1000000007) % 1000000007)
        |        * 2654435761 % 14401 - 7200 AS arrival FROM events),
        |m AS (SELECT *, CAST(max(sec) OVER (ORDER BY arrival, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cm FROM e),
        |f AS (SELECT event_type,
        |    CASE WHEN sec < cm - 600 THEN 1 ELSE 0 END AS late FROM m)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(late) AS BIGINT) AS n_late,
        |  round(CAST(sum(late) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS late_rate
        |FROM f GROUP BY 1""".stripMargin,

    "cohort_retention" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT f.cohort, CAST(ts AS DATE) - cohort AS age_days,
        |    e.user_id
        |  FROM events e JOIN f USING (user_id))
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
        |  CAST(age_days AS BIGINT) AS age_days,
        |  CAST(count(*) AS BIGINT) AS n_active
        |FROM a GROUP BY 1, 2""".stripMargin,

    "feature_time_decay" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events),
        |r AS (SELECT max(sec) AS ref FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(round(pow(0.5,
        |    CAST(ref - sec AS DOUBLE) / 86400.0), 6) AS DECIMAL(18,6)))
        |    AS DOUBLE) AS decayed_mass
        |FROM e, r GROUP BY user_id""".stripMargin,

    // Constant-bound range + loud guard: DuckDB 1.0 can't correlate
    // range() laterally; 2048 hours covers the month-long fixture span.
    "resample_user_hours" ->
      """WITH e AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS h,
        |    value
        |  FROM events),
        |cells AS (SELECT user_id, h, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
        |  FROM e GROUP BY 1, 2),
        |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e GROUP BY 1),
        |guard AS (SELECT CASE WHEN max((h1 - h0) / 3600) > 2047
        |    THEN error('hour grid range(0,2048) cap exceeded') ELSE 1 END AS g
        |  FROM span),
        |grid AS (SELECT user_id, h0 + i * 3600 AS h
        |  FROM span, range(0, 2048) r(i)
        |  WHERE h0 + i * 3600 <= h1 AND (SELECT g FROM guard) = 1)
        |SELECT g.user_id, g.h AS hour_sec,
        |  coalesce(n_events, 0) AS n_events,
        |  coalesce(value_sum, 0.0) AS value_sum
        |FROM grid g LEFT JOIN cells c ON g.user_id = c.user_id AND g.h = c.h""".stripMargin,

    "resample_ohlc" ->
      """WITH e AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS h,
        |    ts, event_id, value
        |  FROM events),
        |r AS (SELECT user_id, h, value,
        |    row_number() OVER (PARTITION BY user_id, h
        |      ORDER BY ts ASC, event_id ASC) AS ra,
        |    row_number() OVER (PARTITION BY user_id, h
        |      ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM e)
        |SELECT user_id, h AS hour_sec, CAST(count(*) AS BIGINT) AS n_events,
        |  max(CASE WHEN ra = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rd = 1 THEN value END) AS close
        |FROM r GROUP BY 1, 2""".stripMargin,

    // Same grid CTEs (and 2048-hour guard) as resample_user_hours, then
    // one LOCF running window per user.
    "resample_locf" ->
      """WITH e AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS h,
        |    value
        |  FROM events),
        |cells AS (SELECT user_id, h, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
        |  FROM e GROUP BY 1, 2),
        |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e GROUP BY 1),
        |guard AS (SELECT CASE WHEN max((h1 - h0) / 3600) > 2047
        |    THEN error('hour grid range(0,2048) cap exceeded') ELSE 1 END AS g
        |  FROM span),
        |grid AS (SELECT user_id, h0 + i * 3600 AS h
        |  FROM span, range(0, 2048) r(i)
        |  WHERE h0 + i * 3600 <= h1 AND (SELECT g FROM guard) = 1),
        |cell2 AS (SELECT g.user_id, g.h AS hour_sec,
        |    coalesce(n_events, 0) AS n_events,
        |    coalesce(value_sum, 0.0) AS value_sum
        |  FROM grid g LEFT JOIN cells c ON g.user_id = c.user_id AND g.h = c.h)
        |SELECT user_id, hour_sec, n_events, value_sum,
        |  last_value(CASE WHEN n_events > 0 THEN value_sum END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY hour_sec
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
        |  n_events > 0 AS observed
        |FROM cell2""".stripMargin,

    "agg_rolling_median" ->
      """WITH w AS (SELECT user_id, event_id, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    list_sort(list(value) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS win
        |  FROM events)
        |SELECT user_id, event_id, value, sec,
        |  round((win[(len(win) + 1) // 2] + win[len(win) // 2 + 1]) / 2.0, 6)
        |    AS roll_median
        |FROM w""".stripMargin,

    "events_json_props" ->
      """SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "agg_time_weighted" ->
      """WITH o AS (SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
        |    value
        |  FROM events),
        |iv AS (SELECT user_id, nxt - t AS dt,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM o WHERE nxt IS NOT NULL)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(dt) AS BIGINT) AS total_sec,
        |  CASE WHEN sum(dt) > 0 THEN
        |    round(CAST(sum(v * dt) AS DOUBLE) / CAST(sum(dt) AS DOUBLE), 6)
        |  END AS tw_mean
        |FROM iv GROUP BY user_id""".stripMargin,

    "feature_last_events" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  array_to_string((list(event_type ORDER BY ts DESC, event_id DESC))[1:5], '>')
        |    AS last_events
        |FROM events GROUP BY user_id""".stripMargin,

    "anomaly_rate_spikes" ->
      """WITH e AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS h,
        |    value
        |  FROM events),
        |cells AS (SELECT user_id, h, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
        |  FROM e GROUP BY 1, 2),
        |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e GROUP BY 1),
        |guard AS (SELECT CASE WHEN max((h1 - h0) / 3600) > 2047
        |    THEN error('hour grid range(0,2048) cap exceeded') ELSE 1 END AS g
        |  FROM span),
        |grid AS (SELECT user_id, h0 + i * 3600 AS h
        |  FROM span, range(0, 2048) r(i)
        |  WHERE h0 + i * 3600 <= h1 AND (SELECT g FROM guard) = 1),
        |rs AS (SELECT g.user_id, g.h AS hour_sec,
        |    coalesce(n_events, 0) AS n_events,
        |    coalesce(value_sum, 0.0) AS value_sum
        |  FROM grid g LEFT JOIN cells c ON g.user_id = c.user_id AND g.h = c.h),
        |w AS (SELECT user_id, hour_sec, n_events, value_sum,
        |    CAST(sum(n_events) OVER win AS BIGINT) AS bsum,
        |    CAST(count(n_events) OVER win AS BIGINT) AS bcnt
        |  FROM rs WINDOW win AS (PARTITION BY user_id ORDER BY hour_sec
        |    RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING))
        |SELECT user_id, hour_sec, n_events, value_sum,
        |  CASE WHEN bcnt > 0 THEN
        |    round(CAST(bsum AS DOUBLE) / CAST(bcnt AS DOUBLE), 6) END AS baseline,
        |  (bcnt > 0 AND CAST(n_events AS DOUBLE) >
        |    (CAST(bsum AS DOUBLE) / CAST(bcnt AS DOUBLE)) * 3.0) AS spike
        |FROM w""".stripMargin,

    "session_paths" ->
      s"""WITH o AS (SELECT user_id, event_id, ts, event_type,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |f AS (SELECT *, CASE WHEN prev_ts IS NULL
         |    OR date_diff('second', prev_ts, ts) > ${GapMinutes * 60} THEN 1 ELSE 0 END AS ns
         |  FROM o),
         |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM f),
         |p AS (SELECT array_to_string(
         |    (list(event_type ORDER BY ts, event_id))[1:5], '>') AS path
         |  FROM s GROUP BY user_id, sid)
         |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         |FROM p GROUP BY path""".stripMargin,

    "event_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (SELECT event_type AS from_type, next_type AS to_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) /
        |    CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
        |FROM c""".stripMargin,

    "events_transition_entropy" ->
      """WITH s AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (SELECT event_type AS src, next_type AS dst,
        |    CAST(count(*) AS BIGINT) AS nst
        |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT src, CAST(sum(nst) AS BIGINT) AS ns FROM c GROUP BY 1),
        |t AS (SELECT sum(CAST(nst * CAST(round(ln(CAST(ns AS DOUBLE) /
        |      CAST(nst AS DOUBLE)) * 1000000000.0, 0) AS BIGINT)
        |      AS DECIMAL(38,0))) AS st,
        |    CAST(count(*) AS BIGINT) AS k_cells
        |  FROM c JOIN m USING (src)),
        |tot AS (SELECT CAST(sum(nst) AS BIGINT) AS n_transitions,
        |    CAST(count(DISTINCT src) AS BIGINT) AS k_states FROM c)
        |SELECT n_transitions, k_states, k_cells,
        |  round(CAST(st AS DOUBLE) /
        |    (CAST(n_transitions AS DOUBLE) * 1000000000.0), 6) AS entropy_nats,
        |  round(exp(CAST(st AS DOUBLE) /
        |    (CAST(n_transitions AS DOUBLE) * 1000000000.0)), 6) AS perplexity
        |FROM tot, t""".stripMargin)
}
