package graft.clean

import org.apache.spark.sql.Row
import graft.SparkSpec
import graft.core.Schemas

/** Pins the reference cleaning semantics, incl. the deliberate quirks listed
  * in SURVEY §7.4 (they ARE the spec). Fixtures per FIXTURES.md §2.6. */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("F3 price scrub: $/%/comma/quote stripped, coerce, <=0 and placeholder nulled") {
    val df = Seq("$1,234.50", "12%", "999999999", "-5", "N/A", "0", "\"88\"", null)
      .toDF("negotiated price")
    val got = Cleaning.cleanPriceFields(df).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(1234.5), Some(12.0), None, None, None, None, Some(88.0), None))
  }

  test("F3 estimated amount exempt from placeholder/<=0 null-out") {
    val df = Seq(("999999999", "-3")).toDF("estimated amount", "x")
    val got = Cleaning.cleanPriceFields(df).head()
    assert(got.getDouble(0) == 999999999d)
  }

  test("F4 invalid tokens blank only full (case-insensitive) matches; null stays null") {
    val df = Seq("n/a", "NA", "Not Applicable", "nab", "a n/a", null).toDF("setting")
    val got = Cleaning.removeInvalidTokens(df).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq("", "", "", "nab", "a n/a", null))
  }

  test("F5 text normalization: strip+lower, null→\"\", literal 'nan'→\"\"") {
    val df = Seq("  MiXeD  ", "nan", "NaN", null).toDF("description")
    val got = Cleaning.normalizeTextFields(df).collect().map(_.getString(0))
    assert(got.toSeq == Seq("mixed", "", "", ""))
  }

  test("F6 modifiers: upper, pipe→comma, spaces removed, null preserved") {
    val df = Seq("26, tc", "59|76", null).toDF("modifiers")
    val got = Cleaning.normalizeModifiers(df).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq("26,TC", "59,76", null))
  }

  test("F7 algorithm flag: char class is digits $ % BACKSLASH and literal 's' — not whitespace") {
    val df = Seq("100$%", "99\\s", "1 2", "sss", "", "abc").toDF("negotiated algorithm")
    val got = Cleaning.flagAlgorithmFormat(df).collect().map(_.getBoolean(1))
    // "1 2" contains a real space → NOT matched (the class has no whitespace).
    assert(got.toSeq == Seq(true, true, false, true, false, false))
  }

  test("P6 code validity: per-type regexes; null code becomes 'nan' (len 3 ⇒ survives only as ICD)") {
    val rows = Seq(
      ("12345", "CPT", true), ("1234", "CPT", false),
      ("A1234", "HCPCS", true), ("W1234", "HCPCS", false), ("12345", "HCPCS", true),
      ("0123456789", "NDC", true), ("123456789", "NDC", false),
      ("470", "DRG", true), ("4700", "DRG", false),
      ("D1234", "CDT", true), ("1234", "APC", true),
      ("X12", "ICD", true), ("X123456", "ICD", true), ("X1234567", "ICD", false),
      (null, "ICD", true), // astype(str) → "nan", length 3 ⇒ valid ICD
      (null, "CPT", false), ("12345", null, false), ("470", "MS-DRG", false))
    val df = rows.map { case (c, t, _) => (c, t) }.toDF("code", "code type")
    val kept = Cleaning.validateCodeFormat(df).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val expect = rows.filter(_._3).map { case (c, t, _) =>
      (Option(c).getOrElse("nan"), Option(t).map(_.toUpperCase).getOrElse("NAN"))
    }.toSet
    assert(kept == expect)
  }

  test("canonical schema has 22 columns in reference order") {
    assert(Schemas.CanonicalColumns.size == 22)
    assert(Schemas.CanonicalColumns.head == "hospital name" &&
      Schemas.CanonicalColumns.last == "modifiers")
  }
}
