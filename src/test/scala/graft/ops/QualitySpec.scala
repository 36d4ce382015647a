package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Data-contract report and time-series resample semantics. */
class QualitySpec extends SparkSpec {

  import spark.implicits._

  test("contractReport counts each fault class exactly") {
    val child = Seq(
      (1L, 1, Option("A"), 10.0),
      (1L, 2, Option("B"), 10.0),
      (2L, 1, None, 10.0),      // null flag
      (3L, 1, Option("A"), 99.0), // out of range
      (3L, 1, Option("A"), 12.0), // duplicate key with the row above
      (9L, 1, Option("A"), 10.0)) // orphan parent
      .toDF("k", "ln", "flag", "qty")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Quality.contractReport(child, Seq("flag"), "qty", 1.0, 50.0,
      Seq("k", "ln"), parent, "k", "pk").collect().head
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("null_flag") == 1L)
    assert(r.getAs[Long]("oob_qty") == 1L)
    assert(r.getAs[Long]("n_dup_rows") == 2L) // both copies of (3,1)
    assert(r.getAs[Long]("n_orphans") == 1L)
  }

  test("contractReport is all-zero (except n_rows) on clean data") {
    val child = Seq((1L, 1, Option("A"), 10.0)).toDF("k", "ln", "flag", "qty")
    val parent = Seq(1L).toDF("pk")
    val r = Quality.contractReport(child, Seq("flag"), "qty", 1.0, 50.0,
      Seq("k", "ln"), parent, "k", "pk").collect().head
    assert((r.getAs[Long]("n_rows"), r.getAs[Long]("null_flag"),
      r.getAs[Long]("oob_qty"), r.getAs[Long]("n_dup_rows"),
      r.getAs[Long]("n_orphans")) == ((1L, 0L, 0L, 0L, 0L)))
  }

  test("k-anonymity flags undersized classes; l-diversity flags single-value classes") {
    val rows = Seq(
      ("us", "a", "hi"), ("us", "a", "hi"), ("us", "a", "lo"), // class (us,a): size 3
      ("us", "b", "hi"),                                       // class (us,b): size 1
      ("fr", "a", "lo"), ("fr", "a", "lo"))                    // class (fr,a): size 2
      .toDF("country", "grp", "income")
    val risky = Quality.kAnonymityRisky(rows, Seq("country", "grp"), k = 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(risky == Set(("us", "b", 1L), ("fr", "a", 2L)))
    // l-diversity on sensitive `income`: (us,a) has {hi,lo} -> l=2;
    // (us,b) {hi} -> l=1; (fr,a) {lo,lo} -> l=1 despite size 2
    val ld = Quality.lDiversity(rows, Seq("country", "grp"), "income")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(ld(("us", "a")) == (2L, 3L))
    assert(ld(("us", "b")) == (1L, 1L))
    assert(ld(("fr", "a")) == (1L, 2L))
  }

  test("benfordDigits: exact digit extraction, sub-1 exclusion, zero-filled digits") {
    // 123.9 -> 1, 20.0 -> 2, 2.5 -> 2, 999.99 -> 9, 0.7 and -5 excluded
    val vals = Seq(123.9, 20.0, 2.5, 999.99, 0.7, -5.0).toDF("x")
    val r = Profile.benfordDigits(vals, "x").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(r.size == 9) // all digits present even when unobserved
    assert(r(1) == (1L, 0.25) && r(2) == (2L, 0.5) && r(9) == (1L, 0.25))
    assert(r(3)._1 == 0L && r(3)._2 == 0.0)
  }

  test("psiBins: identical distributions score ~0, a shift scores high") {
    val base = (1 to 100).map(i => (i % 10).toDouble).toDF("v")
    val same = Drift.psiBins(base, base, "v", 0.0, 10.0, 10)
      .agg(sum("contrib")).as[Double].head()
    assert(math.abs(same) < 1e-9)
    val shifted = (1 to 100).map(i => (i % 10 + 5).toDouble).toDF("v")
    val moved = Drift.psiBins(base, shifted, "v", 0.0, 10.0, 10)
      .agg(sum("contrib")).as[Double].head()
    assert(moved > 0.25, s"psi=$moved should flag a 5-bin shift")
    // overflow rows landed in bin 10
    val bins = Drift.psiBins(base, shifted, "v", 0.0, 10.0, 10)
      .filter(col("bin") === 10L).select("n_cur").as[Long].head()
    assert(bins == 50L) // values 10..14 from the +5 shift
  }

  test("psiCategorical: stable mixes score ~0, a relabel skew registers on both sides") {
    val base = (1 to 90).map(i => Seq("en", "de", "fr")(i % 3)).toDF("lang")
    val same = Drift.psiCategorical(base, base, "lang")
      .agg(sum("contrib")).as[Double].head()
    assert(math.abs(same) < 1e-9)
    // relabel all fr -> en: en gains, fr vanishes (smoothing keeps it finite)
    val skew = (1 to 90).map(i => Seq("en", "de", "en")(i % 3)).toDF("lang")
    val rows = Drift.psiCategorical(base, skew, "lang")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows("en") > 0.0 && rows("fr") > 0.0) // both terms positive PSI
    assert(math.abs(rows("de")) < 1e-6)
    assert(rows.values.sum > 0.25)
  }

  test("hourlyPerKey fills silent hours with explicit zeros per key") {
    val h0 = 1700006400L // midnight, seconds
    def ts(hours: Double) = new Timestamp((h0 + (hours * 3600).toLong) * 1000L)
    val ev = Seq(
      (1L, ts(0.5), 2.0), (1L, ts(0.7), 3.0), // hour 0: 2 events
      (1L, ts(3.1), 5.0),                     // hours 1,2 silent; hour 3
      (2L, ts(10.2), 7.0))                    // single-hour user
      .toDF("user_id", "ts", "value")
    val got = Resample.hourlyPerKey(ev, "user_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      (1L, h0, 2L, 5.0),
      (1L, h0 + 3600, 0L, 0.0),
      (1L, h0 + 7200, 0L, 0.0),
      (1L, h0 + 10800, 1L, 5.0),
      (2L, h0 + 36000, 1L, 7.0)))
  }

  test("timeDecayed: latest event weighs 1, one half-life back weighs 0.5") {
    val h0 = 1700000000L
    def at(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, at(h0)),             // ref event: weight 1.0
      (1L, at(h0 - 86400L)),    // exactly one half-life: 0.5
      (2L, at(h0 - 172800L)))   // two half-lives: 0.25
      .toDF("user_id", "ts")
    val got = Resample.timeDecayed(ev, "user_id", "ts", 86400L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got(1L) == ((2L, 1.5)))
    assert(got(2L) == ((1L, 0.25)))
  }

  test("timeDecayed is partition-invariant (decimal-summed weights)") {
    val h0 = 1700000000L
    val ev = (1L to 300L).map(i =>
      (i % 5, new Timestamp((h0 - i * 977L) * 1000L))).toDF("user_id", "ts")
    val a = Resample.timeDecayed(ev, "user_id", "ts", 86400L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Resample.timeDecayed(ev.repartition(13), "user_id", "ts", 86400L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("classBalance: counts, shares, and effective-n hand-check") {
    val df = (Seq.fill(300)("a") ++ Seq.fill(100)("b") ++ Seq.fill(1)("c"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "label")
    val got = Profile.classBalance(df, "label", beta = 0.999)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("a")._1 == 300L && got("b")._1 == 100L && got("c")._1 == 1L)
    assert(math.abs(got("a")._2 - 300.0 / 401.0) < 1e-6)
    // E_1 = 1 exactly; E_n < n and grows sub-linearly
    assert(got("c")._3 == 1.0)
    assert(got("a")._3 < 300.0 && got("a")._3 > got("b")._3)
    assert(math.abs(got("b")._3 -
      (1.0 - math.pow(0.999, 100.0)) / (1.0 - 0.999)) < 1e-5)
  }

  test("tCloseness: hand-computed variational distance, absent-value mass") {
    import spark.implicits._
    // Group A = [x,x,x,y], group B = [y]. Global p = (x:0.6, y:0.4).
    // t(A) = ½(|0.75−0.6| + |0.25−0.4|) = 0.15
    // t(B) = ½(|0−0.6| + |1−0.4|)      = 0.6  (x absent from B)
    val df = Seq(("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"), ("B", "y"))
      .toDF("g", "v")
    val got = Quality.tCloseness(df, Seq("g"), "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map("A" -> ((4L, 0.15)), "B" -> ((1L, 0.6))))
    // identical distribution ⇒ t = 0
    val even = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")).toDF("g", "v")
    assert(Quality.tCloseness(even, Seq("g"), "v").collect()
      .forall(_.getDouble(2) == 0.0))
  }
}
