package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed closed-form checks for the evaluation-metric operators
  * (the gate queries re-prove them against DuckDB at fixture scale). */
class EvalSpec extends SparkSpec {

  import spark.implicits._

  private def toy = Seq(
    // (actual, predicted)
    ("a", "a"), ("a", "a"), ("a", "b"),
    ("b", "b"), ("b", "a"),
    ("c", "a")).toDF("y", "p")

  test("confusionMatrix counts every (actual, predicted) cell") {
    val cm = Eval.confusionMatrix(toy, col("y"), col("p"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(cm === Set(("a", "a", 2L), ("a", "b", 1L), ("b", "b", 1L),
      ("b", "a", 1L), ("c", "a", 1L)))
  }

  test("classMetrics: union class list, zero-guarded precision/recall/F1") {
    val m = Eval.classMetrics(toy, col("y"), col("p")).collect()
      .map(r => r.getString(0) -> r).toMap
    // a: tp=2, support=3, predicted=4 → p=0.5, r=2/3
    assert(m("a").getLong(3) === 2L)
    assert(m("a").getDouble(4) === 0.5)
    assert(m("a").getDouble(5) === math.BigDecimal(2.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // c: never predicted → precision 0 (predicted_n = 0), recall 0, f1 0
    assert(m("c").getLong(2) === 0L && m("c").getDouble(4) === 0.0 &&
      m("c").getDouble(5) === 0.0 && m("c").getDouble(6) === 0.0)
    assert(m.keySet === Set("a", "b", "c"))
  }

  test("cohensKappa matches the hand-computed po/pe closure") {
    val r = Eval.cohensKappa(toy, col("y"), col("p")).collect().head
    // po = 3/6; pe = (3*4 + 2*2 + 1*0)/36 = 16/36
    assert(r.getLong(0) === 6L)
    assert(r.getDouble(1) === 0.5)
    assert(r.getDouble(2) === math.BigDecimal(16.0 / 36).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val kappa = (0.5 - 16.0 / 36) / (1 - 16.0 / 36)
    assert(math.abs(r.getDouble(3) - kappa) < 1e-6)
  }

  test("cohensKappa: perfect single-class agreement → pe = 1 → kappa := 0") {
    val one = Seq(("x", "x"), ("x", "x")).toDF("y", "p")
    val r = Eval.cohensKappa(one, col("y"), col("p")).collect().head
    assert(r.getDouble(1) === 1.0 && r.getDouble(2) === 1.0 && r.getDouble(3) === 0.0)
  }

  test("scoreReport: separable scores → AUC 1, tied scores → AUC 0.5") {
    val sep = Seq((true, 0.9), (true, 0.8), (false, 0.2), (false, 0.1))
      .toDF("y", "s")
    val r1 = Eval.scoreReport(sep, col("y"), col("s")).collect().head
    assert(r1.getLong(0) === 2L && r1.getLong(1) === 2L)
    assert(r1.getDouble(2) === 1.0)
    // brier = (0.01 + 0.04 + 0.04 + 0.01)/4 = 0.025
    assert(math.abs(r1.getDouble(3) - 0.025) < 1e-9)
    val tied = Seq((true, 0.5), (false, 0.5), (true, 0.5), (false, 0.5))
      .toDF("y", "s")
    val r2 = Eval.scoreReport(tied, col("y"), col("s")).collect().head
    assert(r2.getDouble(2) === 0.5)
  }

  test("scoreReport: reversed scores → AUC 0; empty/one-arm input → 0.5") {
    val rev = Seq((true, 0.1), (false, 0.9)).toDF("y", "s")
    assert(Eval.scoreReport(rev, col("y"), col("s")).collect().head.getDouble(2) === 0.0)
    val onearm = Seq((true, 0.3), (true, 0.7)).toDF("y", "s")
    val r = Eval.scoreReport(onearm, col("y"), col("s")).collect().head
    assert(r.getDouble(2) === 0.5)
    val empty = Seq.empty[(Boolean, Double)].toDF("y", "s")
    val e = Eval.scoreReport(empty, col("y"), col("s")).collect().head
    assert(e.getLong(0) === 0L && e.getDouble(2) === 0.5 && e.getDouble(3) === 0.0)
  }

  test("calibrationBins: integer milli binning, top edge folds into last bin") {
    val df = Seq((true, 0.05), (false, 0.05), (true, 1.0), (true, 0.95))
      .toDF("y", "s")
    val bins = Eval.calibrationBins(df, col("y"), col("s"), 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(bins.keySet === Set(0, 9))
    assert(bins(0).getLong(1) === 2L && bins(0).getLong(2) === 1L)
    assert(bins(0).getDouble(4) === 0.5)
    assert(bins(9).getLong(1) === 2L) // 1.0 (milli 1000) folded into bin 9
    assert(bins(9).getDouble(3) === math.BigDecimal((1000 + 950) / 2000.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("rougeBigramOverlap: clipped multiset precision/recall on a known pair") {
    val docs = Seq(
      (1L, "a b c a b"), // bigrams: ab, bc, ca, ab → {ab:2, bc:1, ca:1}, tot 4
      (2L, "a b x a b a b"), // {ab:3, bx:1, xa:1}, tot 6
      (3L, "z z")).toDF("id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Eval.rougeBigramOverlap(pairs, docs, "id", "text").collect().head
    // matched = min(2,3)[a b] = 2; P = 2/4, R = 2/6
    assert(r.getLong(2) === 2L)
    assert(r.getDouble(3) === 0.5)
    assert(r.getDouble(4) === math.BigDecimal(2.0 / 6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val f1 = 2.0 * 0.5 * (2.0 / 6) / (0.5 + 2.0 / 6)
    assert(math.abs(r.getDouble(5) - f1) < 1e-6)
  }

  test("rougeBigramOverlap: pair with zero shared bigrams still reports 0s") {
    val docs = Seq((1L, "a b c"), (2L, "x y z")).toDF("id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Eval.rougeBigramOverlap(pairs, docs, "id", "text").collect().head
    assert(r.getLong(2) === 0L && r.getDouble(3) === 0.0 &&
      r.getDouble(4) === 0.0 && r.getDouble(5) === 0.0)
  }

  test("isotonicCalibration: adjacent violators pool, monotone output, " +
      "label mass preserved") {
    import spark.implicits._
    // bin0 rate 0.5, bin1 rate 0.0 (violation → pool to 1/4), bin2 rate 1.0
    val df = Seq((true, 0.05), (false, 0.05), (false, 0.15), (false, 0.15),
      (true, 0.25)).toDF("pos", "s")
    val out = Eval.isotonicCalibration(df, col("pos"), col("s"), bins = 10)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(0) == ((2L, 1L, 0.5, 0.25)))
    assert(out(1) == ((2L, 0L, 0.0, 0.25)))
    assert(out(2) == ((1L, 1L, 1.0, 1.0)))
    // monotone + pooled mass equals raw mass
    val rates = out.toSeq.sortBy(_._1).map(_._2._4)
    assert(rates == rates.sorted)
    // already-monotone input is untouched
    val mono = Seq((false, 0.05), (true, 0.15)).toDF("pos", "s")
    val m = Eval.isotonicCalibration(mono, col("pos"), col("s"), bins = 10)
      .collect().map(r => r.getInt(0) -> r.getDouble(4)).toMap
    assert(m == Map(0 -> 0.0, 1 -> 1.0))
  }
}
