package graft.enrich

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** SequenceMatcher parity against CPython difflib constants (FIXTURES §2.7)
  * + the two-stage enricher join. */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("ratio matches difflib bit-for-bit on fixture pairs") {
    val cases = Seq(
      ("grady_memorial", "grady_memorial", 1.0),
      ("grady_memorial", "grady_memoral", 0.9629629629629629),
      ("piedmont_atlanta", "piedmont_atl", 0.8571428571428571),
      ("emory_midtown", "emory_mdtown", 0.96),
      ("abc", "xyz", 0.0),
      ("northside_atlanta", "northside_atlantaa", 0.9714285714285714),
      ("", "x", 0.0),
      ("", "", 1.0),
      ("st_josephs", "st_joseph", 0.9473684210526315),
      ("kindred_atlanta", "kindred", 0.6363636363636364))
    cases.foreach { case (a, b, want) =>
      assert(SequenceMatcher.ratio(a, b) == want, s"scala ratio($a,$b)")
    }
    // and through the Catalyst expression (codegen path)
    val got = cases.toDF("a", "b", "want")
      .select(SequenceMatcherRatio.seqRatio(col("a"), col("b")).as("r"), col("want"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("enricher: exact hit, fuzzy >=0.9 hit, <0.9 unmatched; dup keys kept") {
    val scraped = Seq(
      ("grady_memorial", "Grady"),        // exact
      ("emory_mdtown", "Emory Mid"),      // fuzzy 0.96 vs emory_midtown
      ("piedmont_atl", "Piedmont"),       // best 0.857 < 0.9 → none
      ("emory_mdtown", "Emory Mid dup")   // duplicate key must survive
    ).toDF("campus_id", "display_name")
    val cms = Seq(
      ("grady_memorial", "4", "Acute", "Fulton", "404", "30303"),
      ("emory_midtown", "5", "Acute", "Fulton", "404", "30308"),
      ("piedmont_atlanta", "3", "Acute", "Fulton", "404", "30309"))
      .toDF("campus_id", "cms_rating", "hospital_type", "county", "telephone_num", "cms_zip")
    val out = RegistryEnricher.enrich(scraped, cms).cache()
    assert(out.count() == 4)
    val byRow = out.collect().map(r => (r.getAs[String]("campus_id"),
      r.getAs[String]("display_name"), r.getAs[String]("match_kind"),
      r.getAs[String]("cms_rating"))).toSet
    assert(byRow == Set(
      ("grady_memorial", "Grady", "exact", "4"),
      ("emory_mdtown", "Emory Mid", "fuzzy", "5"),
      ("emory_mdtown", "Emory Mid dup", "fuzzy", "5"),
      ("piedmont_atl", "Piedmont", "none", null)))
    val ratios = out.filter(col("match_kind") === "fuzzy")
      .select(col("match_ratio")).collect().map(_.getDouble(0)).toSeq
    assert(ratios.forall(_ == 0.96))
  }

  // Structure-free insurance for the signature prefilter (deletion
  // variants + L*-grams + CMS length-class pruning): every scraped
  // row's winner and ratio must equal the all-pairs argmax computed
  // driver-side with the same difflib-clone ratio. Seeded mutations
  // cover deletes, substitutions, inserts, swaps at varying lengths.
  // PARAMETERIZED over cutoffs (VERDICT r13 item 5): the index's regime
  // boundaries move with the cutoff — the delete-variant class condition
  // (Da ≤ 1 ∧ Db ≤ 1) admits different (la, lb) classes, the pigeonhole
  // L* degrades toward 1-grams as c falls, and the ±-widened length band
  // opens up — so the public `enrich(..., cutoff)` surface is exercised
  // well off the gate's c = 0.9 happy path.
  for (cutoff <- Seq(0.5, 0.7, 0.9, 0.95))
    test(s"enricher fuzzy stage matches brute force on a randomized corpus " +
        s"at cutoff $cutoff (index loses no >=cutoff pair)") {
      randomizedParity(cutoff)
    }

  private def randomizedParity(cutoff: Double): Unit = {
    val rnd = new scala.util.Random(1313)
    def randKey(n: Int) = Seq.fill(n)("abcdefgh0123".charAt(rnd.nextInt(12))).mkString
    val cmsKeys = (1 to 60).map(i => s"${randKey(6 + rnd.nextInt(10))}_$i")
    def mutate(s: String): String = rnd.nextInt(4) match {
      case 0 => val i = rnd.nextInt(s.length); s.take(i) + s.drop(i + 1)
      case 1 => val i = rnd.nextInt(s.length); s.updated(i, 'z')
      case 2 => val i = rnd.nextInt(s.length); s.take(i) + "q" + s.drop(i)
      case _ => val i = rnd.nextInt(s.length - 1)
        s.take(i) + s(i + 1) + s(i) + s.drop(i + 2)
    }
    val scrapedKeys = cmsKeys.map(k => if (rnd.nextBoolean()) mutate(k) else k) ++
      (1 to 40).map(i => s"${randKey(6 + rnd.nextInt(10))}x$i")
    val scraped = scrapedKeys.zipWithIndex
      .map { case (k, i) => (k, s"row$i") }.toDF("campus_id", "display_name")
    val cms = cmsKeys.map(k => (k, "5", "Acute", "Cty", "404", "30303"))
      .toDF("campus_id", "cms_rating", "hospital_type", "county",
        "telephone_num", "cms_zip")
    val got = RegistryEnricher.enrich(scraped, cms, cutoff)
      .select(col("campus_id"), col("display_name"), col("match_kind"),
        col("match_ratio"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    val cmsSet = cmsKeys.toSet
    scrapedKeys.zipWithIndex.foreach { case (k, i) =>
      val want: (String, Option[Double]) =
        if (cmsSet.contains(k)) ("exact", Some(1.0))
        else {
          val best = cmsKeys.map(c => (SequenceMatcher.ratio(k, c), c))
            .filter(_._1 >= cutoff)
          if (best.isEmpty) ("none", None)
          else ("fuzzy", Some(best.max._1))
        }
      assert(got((k, s"row$i")) == want,
        s"cutoff $cutoff key $k: got ${got((k, s"row$i"))}, want $want")
    }
  }

  test("enricher degenerate edges: empty CMS, null scraped keys") {
    val scraped = Seq(("abc", "A"), (null.asInstanceOf[String], "B"))
      .toDF("campus_id", "display_name")
    val cmsEmpty = Seq.empty[(String, String, String, String, String, String)]
      .toDF("campus_id", "cms_rating", "hospital_type", "county",
        "telephone_num", "cms_zip")
    // Empty CMS: the signature index and the length histogram are empty,
    // but every scraped row must still emit its 'none' row.
    val out = RegistryEnricher.enrich(scraped, cmsEmpty).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("match_kind") == "none"))
    // Null scraped key: drops out of candidate generation (null grams /
    // variants), survives through the left join as 'none'.
    val cms = Seq(("abc", "5", "Acute", "Cty", "404", "1"))
      .toDF("campus_id", "cms_rating", "hospital_type", "county",
        "telephone_num", "cms_zip")
    val out2 = RegistryEnricher.enrich(scraped, cms)
      .collect().map(r => r.getAs[String]("display_name") ->
        r.getAs[String]("match_kind")).toMap
    assert(out2 == Map("A" -> "exact", "B" -> "none"))
  }

  test("length-bound prune is sound: bound >= true ratio") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(12) + 1).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(12) + 1).mkString
      assert(SequenceMatcher.maxPossibleRatio(a.length, b.length) >=
        SequenceMatcher.ratio(a, b) - 1e-15)
    }
  }
}
