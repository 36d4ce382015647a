package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Classifier / score evaluation operators — the audit layer a training-data
  * pipeline runs over its own heuristic labelers (language-ID, quality
  * classifiers, near-dup detectors) before trusting them at corpus scale.
  *
  * Everything here is a constant number of hash aggregates over the scored
  * rows plus closures over tiny (|classes|- or |bins|-sized) aggregate
  * frames, so each metric costs one shuffle of collapsed counts no matter
  * how many rows are scored:
  *
  *  - [[confusionMatrix]] / [[classMetrics]] / [[cohensKappa]]: one
  *    (actual, predicted) count aggregate; the per-class joins and the
  *    kappa closure run over at most |classes|² rows.
  *  - [[scoreReport]] (ROC AUC + Brier): scores collapse to per-value
  *    count rows first (like the Mann-Whitney gate), the tie-corrected
  *    rank sum rides the two-pass distributed prefix sum — never a global
  *    single-task window — and Brier is a decimal-exact sum of per-value
  *    closed forms.
  *  - [[calibrationBins]]: fixed-width integer binning (exact milli-unit
  *    arithmetic) + one aggregate per bin.
  */
object Eval {

  /** Confusion counts in one hash aggregate: (actual, predicted, n). */
  def confusionMatrix(df: DataFrame, actual: Column, predicted: Column): DataFrame =
    df.select(actual.as("actual"), predicted.as("predicted"))
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))

  /** Per-class precision / recall / F1 + support, derived from ONE
    * confusion pass. The class list is the union of observed actual and
    * predicted labels, so a class the model never predicts (recall side)
    * and a label the model invents (precision side) both show up with the
    * explicit 0.0 the report should carry, not a dropped row.
    */
  def classMetrics(df: DataFrame, actual: Column, predicted: Column): DataFrame = {
    val cm = confusionMatrix(df, actual, predicted)
    val act = cm.groupBy(col("actual").as("cls")).agg(sum(col("n")).as("support"))
    val prd = cm.groupBy(col("predicted").as("cls")).agg(sum(col("n")).as("predicted_n"))
    val tp = cm.filter(col("actual") === col("predicted"))
      .select(col("actual").as("cls"), col("n").as("tp"))
    val j = act.join(prd, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left_outer")
      .na.fill(0L, Seq("support", "predicted_n", "tp"))
    def d(c: Column) = c.cast("double")
    val p = when(col("predicted_n") > 0, d(col("tp")) / d(col("predicted_n"))).otherwise(0.0)
    val r = when(col("support") > 0, d(col("tp")) / d(col("support"))).otherwise(0.0)
    j.select(col("cls"), col("support"), col("predicted_n"), col("tp"),
        round(p, 6).as("precision"), round(r, 6).as("recall"),
        round(when(p + r > 0.0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 6).as("f1"))
  }

  /** Single-row inter-rater / model-vs-truth agreement: n, observed
    * agreement po, chance agreement pe (product of marginals), and Cohen's
    * kappa — with kappa defined as 0.0 when pe = 1 (a single shared class
    * makes the correction degenerate) so both engines agree explicitly.
    */
  def cohensKappa(df: DataFrame, actual: Column, predicted: Column): DataFrame = {
    val cm = graft.core.Memo.ownedPersist(confusionMatrix(df, actual, predicted))
    val tot = cm.agg(sum(col("n")).as("n_total"),
      sum(when(col("actual") === col("predicted"), col("n")).otherwise(0L)).as("n_agree"))
    val act = cm.groupBy(col("actual").as("cls")).agg(sum(col("n")).as("na"))
    val prd = cm.groupBy(col("predicted").as("cls")).agg(sum(col("n")).as("np"))
    // marginal products can reach N² — sum in decimal(38,0), not long
    val peNum = act.join(prd, Seq("cls"))
      .agg(coalesce(sum(col("na").cast("decimal(38,0)") *
        col("np").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("pe_num"))
    def d(c: Column) = c.cast("double")
    val joined = tot.crossJoin(broadcast(peNum))
    // Empty input → n_total = 0 (sum yields null): report explicit zeros
    // rather than engine-specific 0/0 results.
    val nTot = coalesce(col("n_total"), lit(0L))
    val po = when(nTot > 0, d(col("n_agree")) / d(nTot)).otherwise(0.0)
    val pe = when(nTot > 0, d(col("pe_num")) / (d(nTot) * d(nTot))).otherwise(0.0)
    joined.select(nTot.as("n_total"), round(po, 6).as("po"), round(pe, 6).as("pe"),
      when(!(pe < 1.0), lit(0.0))
        .otherwise(round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Single-row scored-binary-classifier report: tie-corrected ROC AUC and
    * the Brier score of `score` (∈ [0,1], 6dp-rounded for cross-engine
    * determinism) against boolean `label`.
    *
    * AUC uses the rank form AUC = (R₁ − n₁(n₁+1)/2) / (n₁n₂) with average
    * ranks on ties, computed over per-value collapsed counts and the
    * two-pass distributed prefix sum (doubled integer rank sums, exact in
    * decimal). Brier is Σ n_v·(v−y)² in exact decimal. Degenerate input
    * (an empty arm) gets auc := 0.5 explicitly on both engines.
    */
  def scoreReport(df: DataFrame, label: Column, score: Column): DataFrame = {
    val dec = "decimal(38,0)"
    // Exact integer micro-units: v6 = round(score·10⁶) ∈ [0, 10⁶]. Every
    // sum below is an integer (decimal(38,0)) — no cross-engine decimal
    // scale-adjustment rules in play, only the final closures are double.
    val byV = df.select(label.as("pos"),
        round(score * 1000000, 0).cast("long").as("v6"))
      .groupBy(col("v6"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("npv"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("nnv"))
      .withColumn("nv", col("npv") + col("nnv"))
    val cum = Ranking.prefixSum(byV, Seq(col("v6").asc), Seq("nv"))
    val errPos = (lit(1000000L) - col("v6")) * (lit(1000000L) - col("v6"))
    val errNeg = col("v6") * col("v6")
    val agg = cum.agg(
      coalesce(sum(col("npv")), lit(0L)).as("n_pos"),
      coalesce(sum(col("nnv")), lit(0L)).as("n_neg"),
      // doubled rank sum of the positive arm (avg-rank ties, exact ints)
      sum(col("npv").cast(dec) *
        (lit(2).cast(dec) * col("cum_nv").cast(dec) -
          col("nv").cast(dec) + lit(1).cast(dec))).as("r1x2"),
      sum(col("npv").cast(dec) * errPos.cast(dec) +
        col("nnv").cast(dec) * errNeg.cast(dec)).as("bsum"))
    def d(c: Column) = c.cast("double")
    val (n1, n2) = (d(col("n_pos")), d(col("n_neg")))
    agg.select(col("n_pos"), col("n_neg"),
      when(!(n1 * n2 > 0.0), lit(0.5))
        .otherwise(round(((d(col("r1x2")) - n1 * (n1 + 1)) / 2) / (n1 * n2), 6)).as("auc"),
      when(!(n1 + n2 > 0.0), lit(0.0))
        .otherwise(round(d(col("bsum")) / ((n1 + n2) * 1e12), 6)).as("brier"))
  }

  /** Fixed-width reliability diagram over a [0,1] score: `bins` equal bins
    * on the exact milli-unit integer form (round(score·1000) ∈ [0,1000],
    * the top edge folded into the last bin), per bin the count, positive
    * count, mean score, empirical positive rate, and |gap|. Integer
    * binning + integer sums keep every bin edge and mean exact across
    * engines; only the final rates are doubles (rounded 6dp).
    */
  def calibrationBins(df: DataFrame, label: Column, score: Column, bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val milli = round(score * 1000, 0).cast("long")
    val width = (1000 / bins).toLong
    val b = least(floor(milli / width), lit(bins - 1L)).cast("int")
    def d(c: Column) = c.cast("double")
    df.select(label.as("pos"), milli.as("m"), b.as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("m")).as("sm"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(d(col("sm")) / (d(col("n")) * 1000.0), 6).as("mean_score"),
        round(d(col("n_pos")) / d(col("n")), 6).as("pos_rate"),
        round(abs(round(d(col("sm")) / (d(col("n")) * 1000.0), 6) -
          round(d(col("n_pos")) / d(col("n")), 6)), 6).as("gap"))
  }

  /** Isotonic (pool-adjacent-violators) calibration of a score against a
    * binary label over [[calibrationBins]]' fixed-width bins: the monotone
    * non-decreasing rate curve closest (L2) to the per-bin empirical
    * rates — the standard post-hoc calibrator when the reliability diagram
    * is non-monotone. The bin collapse is one distributed hash aggregate;
    * PAV itself runs driver-local over the ≤`bins` collapsed rows (an
    * inherently sequential pooling — DOMAIN-bounded, like the BPE merge
    * table), with violator checks as exact integer cross-products (never a
    * float rate compare), so the pooled blocks are partition- and
    * engine-independent. Returns (bin, n, n_pos, raw_rate, iso_rate). */
  def isotonicCalibration(df: DataFrame, label: Column, score: Column,
      bins: Int): DataFrame = {
    require(bins > 0 && bins <= 10000, s"bins out of range: $bins")
    val milli = round(score * 1000, 0).cast("long")
    val width = (1000 / bins).toLong
    val b = least(floor(milli / width), lit(bins - 1L)).cast("int")
    val collapsed = df.select(label.as("pos"), b.as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // PAV over (firstBin, lastBin, sumN, sumPos) blocks; merge while the
    // previous block's rate exceeds the next's (pos_a/n_a > pos_b/n_b ⇔
    // pos_a·n_b > pos_b·n_a — exact in 64-bit: pos, n ≤ corpus size).
    val stack = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long)]
    collapsed.foreach { case (bin, n, pos) =>
      stack += ((bin, bin, n, pos))
      while (stack.length >= 2 && {
        val (_, _, na, pa) = stack(stack.length - 2)
        val (_, _, nb, pb) = stack(stack.length - 1)
        pa * nb > pb * na
      }) {
        val (f1, _, na, pa) = stack.remove(stack.length - 2)
        val (_, l2, nb, pb) = stack(stack.length - 1)
        stack(stack.length - 1) = (f1, l2, na + nb, pa + pb)
      }
    }
    // Rates are the 6dp HALF_UP rounding of the DOUBLE quotient — the
    // exact semantics of Spark SQL's round(cast(p as double)/n, 6)
    // (BigDecimal.valueOf(double) = Double.toString shortest decimal),
    // NOT a rounding of the exact rational. This mirrors what
    // calibrationBins computes in-plan, so the DuckDB oracle (minimax
    // form: iso(i) = max_{j≤i} min_{k≥i} avg(j..k), the classical PAV
    // identity — SQL-expressible because bins ≤ 10) lands on the SAME
    // double before the SAME rounding the oracle-green rate gates
    // already rely on.
    def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val iso = stack.flatMap { case (f, l, n, pos) =>
      val rate = round6(pos.toDouble / n.toDouble)
      (f to l).map(bin => bin -> rate)
    }.toMap
    val spark = df.sparkSession
    import org.apache.spark.sql.types._
    val out = collapsed.map { case (bin, n, pos) =>
      Row(bin, n, pos, round6(pos.toDouble / n.toDouble), iso(bin))
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(out.toSeq.asJava, StructType(Seq(
      StructField("bin", IntegerType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("n_pos", LongType, nullable = false),
      StructField("raw_rate", DoubleType, nullable = false),
      StructField("iso_rate", DoubleType, nullable = false))))
  }

  /** Pairwise ROUGE-2 overlap (clipped-multiset bigram precision / recall /
    * F1) for an (id_a, id_b) candidate-pair table — the overlap audit a
    * near-dup pass attaches to its survivors before adjudicating them.
    *
    * Gram multisets come from one [[graft.functions.TextShingles]] eval per
    * document (multiset mode), collapsed to (id, gram, count) rows and
    * SEMI-JOIN-restricted to documents that actually appear in a pair, so
    * the gram join is proportional to the pair set, not the corpus. All
    * joins are keyed (pair id, gram) — never a cross product.
    */
  /** Split conformal prediction audit (Vovk; Lei et al.): calibrate a
    * nonconformity threshold on one half of the data, measure empirical
    * coverage on the other — the distribution-free guarantee check before
    * shipping a predictor's intervals.
    *
    * The "model" is the group-mean predictor fit on the CALIBRATION half
    * only (no test leakage); nonconformity is |y − ŷ| as exact 6dp
    * decimals. The threshold is the ⌈(n_cal+1)(1−α)⌉-th smallest
    * calibration score — located by the two-pass distributed prefix sum
    * over per-value collapsed counts (the Mann-Whitney/AUC device), never
    * a global single-task window. Rows whose group never appears in
    * calibration have no prediction and are excluded (inner join).
    *
    * Output (one row): n_cal, n_test, k_rank, tau, coverage, target —
    * split conformal guarantees coverage ≥ target in expectation. */
  def conformalCoverage(df: DataFrame, group: Column, value: Column,
      splitKey: Column, alphaPermille: Int = 100): DataFrame = {
    require(alphaPermille > 0 && alphaPermille < 1000,
      s"alphaPermille in (0,1000), got $alphaPermille")
    val rows = df.select(group.as("g"), value.cast("decimal(18,6)").as("v"),
      (splitKey % 2 === 0).as("cal"))
    val mu = rows.filter(col("cal"))
      .groupBy(col("g"))
      .agg(round(sum(col("v")).cast("double") / count(lit(1)).cast("double"), 6)
        .cast("decimal(18,6)").as("mu"))
    // Three consumers read the scored rows (calibration histogram, the
    // split counts, the test-coverage sum) — persist the narrow 2-column
    // projection so the source is scanned once, not three times.
    val scored = graft.core.Memo.ownedPersist(rows.join(broadcast(mu), "g")
      .select(col("cal"), abs(col("v") - col("mu")).as("s")))
    val calScores = scored.filter(col("cal"))
      .groupBy(col("s")).agg(count(lit(1)).as("cnt"))
    val n = scored.agg(
      sum(when(col("cal"), 1L).otherwise(0L)).as("n_cal"),
      sum(when(!col("cal"), 1L).otherwise(0L)).as("n_test"))
    // k = ceil((n_cal + 1) · (1 − α)) in pure integer arithmetic.
    val kExpr = ((col("n_cal") + 1L) * (1000L - alphaPermille) + 999L) / 1000L
    val kRow = n.select(col("n_cal"), col("n_test"),
      kExpr.cast("long").as("k_rank"))
    val cum = Ranking.prefixSum(calScores, Seq(col("s").asc), Seq("cnt"))
    val tau = cum.crossJoin(broadcast(kRow))
      .filter(col("cum_cnt") >= col("k_rank"))
      .agg(min(col("s")).as("tau"))
    val test = scored.filter(!col("cal"))
      .crossJoin(broadcast(tau))
      .agg(sum(when(col("s") <= col("tau"), 1L).otherwise(0L)).as("n_cov"))
    def d(c: Column) = c.cast("double")
    kRow.crossJoin(broadcast(tau)).crossJoin(broadcast(test))
      .select(col("n_cal"), col("n_test"), col("k_rank"),
        d(col("tau")).as("tau"),
        round(d(col("n_cov")) / d(col("n_test")), 6).as("coverage"),
        lit((1000 - alphaPermille) / 1000.0).as("target"))
  }

  def rougeBigramOverlap(pairs: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
        explode(org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.TextShingles(
            org.apache.spark.sql.graft.ColumnBridge.expression(col(textCol)),
            2, distinct = false))).as("gram"))
      .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("c"))
    val ids = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct()
    val g = graft.core.Memo.ownedPersist(
      grams.join(ids, Seq("id"), "left_semi"))
    val tot = g.groupBy(col("id")).agg(sum(col("c")).as("tot"))
    val matched = pairs.select(col("id_a"), col("id_b"))
      .join(g.select(col("id").as("id_a"), col("gram"), col("c").as("ca")), Seq("id_a"))
      .join(g.select(col("id").as("id_b"), col("gram"), col("c").as("cb")),
        Seq("id_b", "gram"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(least(col("ca"), col("cb"))).as("matched"))
    def d(c: Column) = c.cast("double")
    val p = d(col("matched")) / d(col("tot_a"))
    val r = d(col("matched")) / d(col("tot_b"))
    pairs.select(col("id_a"), col("id_b"))
      .join(matched, Seq("id_a", "id_b"), "left_outer")
      .na.fill(0L, Seq("matched"))
      .join(tot.select(col("id").as("id_a"), col("tot").as("tot_a")), Seq("id_a"))
      .join(tot.select(col("id").as("id_b"), col("tot").as("tot_b")), Seq("id_b"))
      .filter(col("tot_a") > 0 && col("tot_b") > 0)
      .select(col("id_a"), col("id_b"), col("matched"),
        round(p, 6).as("rouge2_p"), round(r, 6).as("rouge2_r"),
        round(when(p + r > 0.0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 6)
          .as("rouge2_f1"))
  }

  /** Directional BLEU-2 for an (id_a = reference, id_b = candidate) pair
    * table: clipped-multiset unigram and bigram precisions on the
    * candidate side, brevity penalty min(1, e^(1−len_ref/len_cand)), and
    * BLEU = BP·√(p₁·p₂) (geometric mean; a zero precision zeroes the
    * score — no smoothing, documented). Same inverted-gram machinery and
    * semi-join discipline as [[rougeBigramOverlap]]; every count is an
    * exact integer, the closure is per-pair scalar math. */
  def bleuPair(pairs: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def gramCounts(n: Int) = docs.select(col(idCol).as("id"),
        explode(org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.TextShingles(
            org.apache.spark.sql.graft.ColumnBridge.expression(col(textCol)),
            n, distinct = false))).as("gram"))
      .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("c"))
    val ids = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct()
    def d(c: Column) = c.cast("double")
    def side(n: Int, tag: String) = {
      val g = graft.core.Memo.ownedPersist(
        gramCounts(n).join(ids, Seq("id"), "left_semi"))
      val tot = g.groupBy(col("id")).agg(sum(col("c")).as("tot"))
      val matched = pairs.select(col("id_a"), col("id_b"))
        .join(g.select(col("id").as("id_a"), col("gram"), col("c").as("ca")),
          Seq("id_a"))
        .join(g.select(col("id").as("id_b"), col("gram"), col("c").as("cb")),
          Seq("id_b", "gram"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(sum(least(col("ca"), col("cb"))).as(s"m$tag"))
      (matched, tot)
    }
    val (m1, tot1) = side(1, "1")
    val (m2, tot2) = side(2, "2")
    val base = pairs.select(col("id_a"), col("id_b"))
      .join(m1, Seq("id_a", "id_b"), "left_outer")
      .join(m2, Seq("id_a", "id_b"), "left_outer")
      .na.fill(0L, Seq("m1", "m2"))
      .join(tot1.select(col("id").as("id_a"), col("tot").as("len_ref")),
        Seq("id_a"))
      .join(tot1.select(col("id").as("id_b"), col("tot").as("len_cand")),
        Seq("id_b"))
      .join(tot2.select(col("id").as("id_b"), col("tot").as("tot2_b")),
        Seq("id_b"))
      .filter(col("len_ref") > 0 && col("len_cand") > 0 && col("tot2_b") > 0)
    val p1 = d(col("m1")) / d(col("len_cand"))
    val p2 = d(col("m2")) / d(col("tot2_b"))
    val bp = least(lit(1.0),
      exp(lit(1.0) - d(col("len_ref")) / d(col("len_cand"))))
    base.select(col("id_a"), col("id_b"), col("len_ref"), col("len_cand"),
      round(p1, 6).as("bleu_p1"), round(p2, 6).as("bleu_p2"),
      round(bp, 6).as("brevity_penalty"),
      round(when(p1 * p2 > 0.0, bp * sqrt(p1 * p2)).otherwise(0.0), 6)
        .as("bleu2"))
  }
}
