package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.table
import graft.ops.{Eval, TextOps}

/** Evaluation-metric gates, round 9: the audit layer a pipeline runs over
  * its own heuristic labelers before trusting them at corpus scale. The
  * language-ID heuristic (`TextOps.languageId`, itself oracle-gated by
  * `text_langid`) plays the model under evaluation against the fixture's
  * ground-truth `lang`; the quality score (oracle-gated by `text_quality`)
  * plays the scored binary classifier for "is English".
  *
  * Every metric is a constant number of hash aggregates over collapsed
  * counts — |classes|²-row closures, per-score-value rank sums over the
  * distributed prefix scan, fixed-width integer bins — so each gate's cost
  * at 100 TB is one shuffle of the scored rows, never a global window or a
  * driver loop.
  */
object EvalQueries {

  def family: QueryFamily = QueryFamily("eval", queries, oracles)

  private val CalibBins = 10

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Confusion matrix of predicted-vs-true language: one hash aggregate.
    "eval_confusion_langid" -> ((s, dir) =>
      Eval.confusionMatrix(table(s, dir, "documents"),
        col("lang"), TextOps.languageId(col("text")))),

    // Per-class precision/recall/F1 + support. Union-of-labels class list:
    // 'zh' (never predicted — recall side only) and 'und' (never true —
    // precision side only) both appear with explicit zeros.
    "eval_prf_langid" -> ((s, dir) =>
      Eval.classMetrics(table(s, dir, "documents"),
        col("lang"), TextOps.languageId(col("text")))),

    // Observed/chance agreement + Cohen's kappa of the langid labeler
    // against ground truth, one row.
    "eval_cohens_kappa" -> ((s, dir) =>
      Eval.cohensKappa(table(s, dir, "documents"),
        col("lang"), TextOps.languageId(col("text")))),

    // Tie-corrected ROC AUC + Brier of the quality score as an
    // is-English classifier — exact integer micro-unit sums, rank form
    // over the two-pass distributed prefix sum.
    "eval_score_report" -> ((s, dir) =>
      Eval.scoreReport(table(s, dir, "documents"),
        col("lang") === "en", TextOps.qualityScore(col("text")))),

    // Reliability diagram: 10 fixed-width bins over the quality score,
    // per-bin mean prediction vs empirical positive rate.
    "eval_calibration_bins" -> ((s, dir) =>
      Eval.calibrationBins(table(s, dir, "documents"),
        col("lang") === "en", TextOps.qualityScore(col("text")), CalibBins)),

    // Average precision (area under the uninterpolated PR curve) of the
    // quality score as an is-English ranker: AP = mean over positives of
    // precision@rank under the deterministic total order (score desc,
    // id asc). Per-positive precision terms are rounded to integer
    // nano-units, ranks come from the two-pass distributed prefix sum —
    // the PR-curve companion to eval_score_report's ROC AUC.
    "eval_avg_precision" -> ((s, dir) => {
      val scored = table(s, dir, "documents")
        .select(col("doc_id"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          TextOps.qualityScore(col("text")).as("s"))
        .withColumn("one", lit(1L))
      val pre = graft.ops.Ranking.prefixSum(scored,
        Seq(col("s").desc, col("doc_id").asc), Seq("pos", "one"))
      def d(c: Column) = c.cast("double")
      val terms = pre.filter(col("pos") === 1L)
        .select(round(d(col("cum_pos")) / d(col("cum_one")) * 1.0e9, 0)
          .cast("long").as("p9"))
        .agg(sum(col("p9")).as("sp9"), count(lit(1)).as("n_pos"))
      val n = scored.agg(count(lit(1)).as("n"))
      n.crossJoin(broadcast(terms))
        .select(col("n"), col("n_pos"),
          when(col("n_pos") > 0L,
            round(d(col("sp9")) / (d(col("n_pos")) * 1.0e9), 6))
            .otherwise(lit(0.0)).as("avg_precision"))
    }),

    // Isotonic (PAV) calibration of the quality score as an is-English
    // predictor: the monotone rate curve over the same 10 bins as
    // eval_calibration_bins. Oracle-checked since round 11 via the PAV
    // minimax identity (sequential pooling ≡ max-min over interval
    // averages, enumerable because bins ≤ 10); EvalSpec additionally
    // pins a hand-pooled fixture and monotonicity/mass invariants.
    "eval_isotonic_calibration" -> ((s, dir) =>
      Eval.isotonicCalibration(table(s, dir, "documents"),
        col("lang") === "en", TextOps.qualityScore(col("text")), CalibBins)),

    // Split conformal coverage audit at α = 0.1: per-type mean predictor
    // fit on the even-id calibration half, |y − ŷ| threshold at the
    // ⌈(n+1)·0.9⌉-th smallest calibration score (distributed prefix sum),
    // empirical coverage on the odd-id test half.
    "eval_conformal_coverage" -> ((s, dir) =>
      Eval.conformalCoverage(table(s, dir, "events"),
        col("event_type"), col("value"), col("event_id"))))

  // ---------------------------------------------------------------- oracle

  private val toksSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"

  private def markerSql(ws: Seq[String]) =
    s"len(list_filter($toksSql, t -> list_contains(${ws.map(w => s"'$w'").mkString("[", ",", "]")}, t)))"

  /** Raw (un-rounded) quality score — the same formula `text_quality`
    * proves bit-identical across engines. */
  private val qualitySql: String = {
    val len = "CAST(length(text) AS DOUBLE)"
    val words = s"greatest(CAST(len($toksSql) AS DOUBLE), 1.0)"
    val punct = s"($len - CAST(length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE))"
    val stop = s"CAST(${markerSql(TextOps.LangMarkers.flatMap(_._2))} AS DOUBLE)"
    s"(least(1.0, $len / 500.0) * 0.3 + (1.0 - least(1.0, $punct / $words)) * 0.3 +" +
      s" least(1.0, $stop * 5.0 / $words) * 0.2 + least(1.0, $words / 100.0) * 0.2)"
  }

  private lazy val (scoreSel, langCase) = OracleSql.langId(toksSql)

  /** Confusion CTE shared by the three agreement oracles. */
  private lazy val cmCte =
    s"""f AS (SELECT lang, $scoreSel FROM documents),
       |cm AS (SELECT lang AS actual, $langCase AS predicted,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM f GROUP BY 1, 2)""".stripMargin

  def oracles: Map[String, String] = Map(

    "eval_avg_precision" ->
      s"""WITH sc AS (SELECT doc_id,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         |    $qualitySql AS s
         |  FROM documents),
         |c AS (SELECT pos,
         |    CAST(sum(pos) OVER w AS BIGINT) AS cum_pos,
         |    CAST(count(*) OVER w AS BIGINT) AS cum_one
         |  FROM sc WINDOW w AS (ORDER BY s DESC, doc_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |t AS (SELECT CAST(sum(CAST(round(CAST(cum_pos AS DOUBLE) /
         |      CAST(cum_one AS DOUBLE) * 1000000000.0, 0) AS BIGINT)) AS BIGINT)
         |    AS sp9, CAST(count(*) AS BIGINT) AS n_pos
         |  FROM c WHERE pos = 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sc)
         |SELECT n, n_pos,
         |  CASE WHEN n_pos > 0 THEN round(CAST(sp9 AS DOUBLE) /
         |    (CAST(n_pos AS DOUBLE) * 1000000000.0), 6) ELSE 0.0 END
         |    AS avg_precision
         |FROM n, t""".stripMargin,

    "eval_conformal_coverage" ->
      """WITH rows_ AS (SELECT event_type AS g,
        |    CAST(value AS DECIMAL(18,6)) AS v, event_id % 2 = 0 AS cal
        |  FROM events),
        |mu AS (SELECT g, CAST(round(CAST(sum(v) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS mu
        |  FROM rows_ WHERE cal GROUP BY 1),
        |scored AS (SELECT cal, abs(v - mu) AS s FROM rows_ JOIN mu USING (g)),
        |n AS (SELECT CAST(sum(CASE WHEN cal THEN 1 ELSE 0 END) AS BIGINT) AS n_cal,
        |    CAST(sum(CASE WHEN NOT cal THEN 1 ELSE 0 END) AS BIGINT) AS n_test
        |  FROM scored),
        |k AS (SELECT n_cal, n_test,
        |    CAST(((n_cal + 1) * 900 + 999) // 1000 AS BIGINT) AS k_rank FROM n),
        |cs AS (SELECT s, CAST(count(*) AS BIGINT) AS cnt
        |  FROM scored WHERE cal GROUP BY 1),
        |cum AS (SELECT s, sum(cnt) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt FROM cs),
        |tau AS (SELECT min(s) AS tau FROM cum, k WHERE cum_cnt >= k_rank),
        |cov AS (SELECT CAST(sum(CASE WHEN s <= tau THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_cov FROM scored, tau WHERE NOT cal)
        |SELECT n_cal, n_test, k_rank, CAST(tau AS DOUBLE) AS tau,
        |  round(CAST(n_cov AS DOUBLE) / CAST(n_test AS DOUBLE), 6) AS coverage,
        |  0.9 AS target
        |FROM k, tau, cov""".stripMargin,

    "eval_confusion_langid" ->
      s"""WITH $cmCte
         |SELECT actual, predicted, n FROM cm""".stripMargin,

    "eval_prf_langid" ->
      s"""WITH $cmCte,
         |act AS (SELECT actual AS cls, CAST(sum(n) AS BIGINT) AS support
         |  FROM cm GROUP BY 1),
         |prd AS (SELECT predicted AS cls, CAST(sum(n) AS BIGINT) AS predicted_n
         |  FROM cm GROUP BY 1),
         |tp AS (SELECT actual AS cls, n AS tp FROM cm WHERE actual = predicted),
         |j AS (SELECT coalesce(act.cls, prd.cls) AS cls,
         |    coalesce(support, 0) AS support,
         |    coalesce(predicted_n, 0) AS predicted_n
         |  FROM act FULL OUTER JOIN prd ON act.cls = prd.cls),
         |k AS (SELECT j.cls, support, predicted_n, coalesce(tp.tp, 0) AS tp,
         |    CASE WHEN predicted_n > 0
         |      THEN CAST(coalesce(tp.tp, 0) AS DOUBLE) / CAST(predicted_n AS DOUBLE)
         |      ELSE 0.0 END AS p,
         |    CASE WHEN support > 0
         |      THEN CAST(coalesce(tp.tp, 0) AS DOUBLE) / CAST(support AS DOUBLE)
         |      ELSE 0.0 END AS r
         |  FROM j LEFT JOIN tp ON j.cls = tp.cls)
         |SELECT cls, support, predicted_n, tp,
         |  round(p, 6) AS "precision", round(r, 6) AS recall,
         |  round(CASE WHEN p + r > 0.0 THEN 2.0 * p * r / (p + r) ELSE 0.0 END, 6) AS f1
         |FROM k""".stripMargin,

    "eval_cohens_kappa" ->
      s"""WITH $cmCte,
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
         |    CAST(sum(CASE WHEN actual = predicted THEN n ELSE 0 END) AS BIGINT) AS n_agree
         |  FROM cm),
         |act AS (SELECT actual AS cls, CAST(sum(n) AS BIGINT) AS na FROM cm GROUP BY 1),
         |prd AS (SELECT predicted AS cls, CAST(sum(n) AS BIGINT) AS np FROM cm GROUP BY 1),
         |pen AS (SELECT CAST(coalesce(sum(CAST(na AS HUGEINT) * np), 0) AS HUGEINT) AS pe_num
         |  FROM act JOIN prd USING (cls)),
         |c AS (SELECT n_total,
         |    CASE WHEN n_total > 0
         |      THEN CAST(n_agree AS DOUBLE) / CAST(n_total AS DOUBLE) ELSE 0.0 END AS po,
         |    CASE WHEN n_total > 0
         |      THEN CAST(pe_num AS DOUBLE) / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE))
         |      ELSE 0.0 END AS pe
         |  FROM tot, pen)
         |SELECT n_total, round(po, 6) AS po, round(pe, 6) AS pe,
         |  CASE WHEN NOT (pe < 1.0) THEN 0.0
         |    ELSE round((po - pe) / (1.0 - pe), 6) END AS kappa
         |FROM c""".stripMargin,

    "eval_score_report" ->
      s"""WITH s AS (SELECT (lang = 'en') AS pos,
         |    CAST(round($qualitySql * 1000000, 0) AS BIGINT) AS v6 FROM documents),
         |g AS (SELECT v6,
         |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS npv,
         |    CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS nnv
         |  FROM s GROUP BY 1),
         |c AS (SELECT *, npv + nnv AS nv,
         |    sum(npv + nnv) OVER (ORDER BY v6 ROWS UNBOUNDED PRECEDING) AS cum_nv
         |  FROM g),
         |t AS (SELECT CAST(sum(npv) AS BIGINT) AS n1, CAST(sum(nnv) AS BIGINT) AS n2,
         |    CAST(sum(CAST(npv AS HUGEINT) *
         |      (2 * CAST(cum_nv AS HUGEINT) - nv + 1)) AS HUGEINT) AS r1x2,
         |    CAST(sum(CAST(npv AS HUGEINT) * ((1000000 - v6) * (1000000 - v6)) +
         |      CAST(nnv AS HUGEINT) * (v6 * v6)) AS HUGEINT) AS bsum
         |  FROM c),
         |f AS (SELECT coalesce(n1, 0) AS n1, coalesce(n2, 0) AS n2,
         |    CAST(coalesce(n1, 0) AS DOUBLE) AS n1d,
         |    CAST(coalesce(n2, 0) AS DOUBLE) AS n2d,
         |    CAST(r1x2 AS DOUBLE) AS r1x2d, CAST(bsum AS DOUBLE) AS bsumd
         |  FROM t)
         |SELECT n1 AS n_pos, n2 AS n_neg,
         |  CASE WHEN NOT (n1d * n2d > 0.0) THEN 0.5
         |    ELSE round((r1x2d - n1d * (n1d + 1)) / 2 / (n1d * n2d), 6) END AS auc,
         |  CASE WHEN NOT (n1d + n2d > 0.0) THEN 0.0
         |    ELSE round(bsumd / ((n1d + n2d) * 1e12), 6) END AS brier
         |FROM f""".stripMargin,

    "eval_calibration_bins" -> {
      val width = 1000 / CalibBins
      s"""WITH s AS (SELECT (lang = 'en') AS pos,
         |    CAST(round($qualitySql * 1000, 0) AS BIGINT) AS m FROM documents),
         |b AS (SELECT pos, m,
         |    CAST(least(m // $width, ${CalibBins - 1}) AS INT) AS bin FROM s),
         |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |    CAST(sum(m) AS BIGINT) AS sm
         |  FROM b GROUP BY 1)
         |SELECT bin, n, n_pos,
         |  round(CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000.0), 6) AS mean_score,
         |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
         |  round(abs(round(CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000.0), 6) -
         |    round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6)), 6) AS gap
         |FROM g""".stripMargin
    },

    // PAV via the minimax identity iso(i) = max_{j≤i} min_{k≥i} avg(j..k)
    // — expressible as interval prefix-sum enumeration because bins ≤ 10.
    // Double comparisons of the interval averages are exact here: two
    // DISTINCT averages differ by ≥ 1/(n_a·n_b) ≫ double ulp at corpus
    // counts, and equal averages make either argmin/argmax choice yield
    // the same value. Final rounding = round(double quotient, 6), the
    // same pair the green rate gates prove agrees across engines.
    "eval_isotonic_calibration" -> {
      val width = 1000 / CalibBins
      s"""WITH s AS (SELECT (lang = 'en') AS pos,
         |    CAST(round($qualitySql * 1000, 0) AS BIGINT) AS m FROM documents),
         |g AS (SELECT CAST(least(m // $width, ${CalibBins - 1}) AS INT) AS bin,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
         |  FROM s GROUP BY 1),
         |o AS (SELECT bin, n, n_pos,
         |    CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS i,
         |    sum(n) OVER (ORDER BY bin) AS cn,
         |    sum(n_pos) OVER (ORDER BY bin) AS cp
         |  FROM g),
         |iv AS (SELECT a.i AS j, b.i AS k,
         |    CAST(b.cp - a.cp + a.n_pos AS DOUBLE) /
         |      CAST(b.cn - a.cn + a.n AS DOUBLE) AS avg_jk
         |  FROM o a JOIN o b ON a.i <= b.i),
         |mn AS (SELECT iv.j, bi.i, min(avg_jk) AS mnv
         |  FROM iv JOIN o bi ON iv.j <= bi.i AND iv.k >= bi.i
         |  GROUP BY 1, 2),
         |iso AS (SELECT i, max(mnv) AS v FROM mn GROUP BY 1)
         |SELECT bin, n, n_pos,
         |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
         |  round(iso.v, 6) AS iso_rate
         |FROM o JOIN iso USING (i)""".stripMargin
    })
}
