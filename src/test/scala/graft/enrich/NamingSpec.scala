package graft.enrich

import graft.SparkSpec

/** F8-F11/F15/F1/F2 scalar semantics, incl. the preserved stoplist quirk. */
class NamingSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, in: String): String =
    Seq(in).toDF("x").select(c.as("y")).head().getString(0)
  import org.apache.spark.sql.functions.col

  test("F8 campus id: strip chars, drop generic words, join _") {
    assert(one(Naming.campusId(col("x")), "St. Mary's Medical Center of Atlanta") ==
      "st_marys_atlanta")
    // "INC" is uppercase in the stoplist but tokens are lowered → "inc" kept.
    assert(one(Naming.campusId(col("x")), "Acme Hospital Inc") == "acme_inc")
    // '&' and '-' are stripped inside tokens.
    assert(one(Naming.campusId(col("x")), "Health & Care-Co") == "careco")
    // Python str.split() splits on any whitespace run — tabs included.
    assert(one(Naming.campusId(col("x")), "Grady\tMemorial  Hospital") == "grady_memorial")
  }

  test("F9 zip extraction anchored at end, +4 dropped") {
    assert(one(Naming.extractZip(col("x")), "1 Main St, GA 30303-1234") == "30303")
    assert(one(Naming.extractZip(col("x")), "1 Main St, GA 30303") == "30303")
    assert(one(Naming.extractZip(col("x")), "30303 Main St") == "")
  }

  test("F10/F11 whitespace collapse and alnum squash") {
    assert(one(Naming.collapseWhitespace(col("x")), "  a\t b   c ") == "a b c")
    assert(one(Naming.alnumSquash(col("x")), " Grady Mem. #1 ") == "gradymem1")
  }

  test("F1 payer bracket split with and without id") {
    assert(one(Naming.payerName(col("x")), "Aetna PPO [AET01]") == "Aetna PPO")
    assert(one(Naming.payerId(col("x")), "Aetna PPO [AET01]") == "AET01")
    assert(one(Naming.payerName(col("x")), "Aetna PPO") == "Aetna PPO")
    assert(one(Naming.payerId(col("x")), "Aetna PPO") == "")
  }

  test("F2 modifier tokenize: mixed separators, trims, drops empties") {
    val got = Seq(" 26 |59,, JW").toDF("x")
      .select(Naming.tokenizeModifiers(col("x")).as("y"))
      .head().getSeq[String](0)
    assert(got == Seq("26", "59", "JW"))
  }
}
