package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Jaro–Winkler semantics pinned against DuckDB's native
  * jaro_winkler_similarity values (two independent implementations; the
  * constants below were read directly from DuckDB 1.0). */
class JaroWinklerSpec extends SparkSpec {

  import JaroWinklerImpl.{jaro, jaroWinkler}

  test("jaro/winkler match the DuckDB-pinned constants") {
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(close(jaro("martha", "marhta"), 0.9444444444444445))
    assert(close(jaroWinkler("martha", "marhta"), 0.9611111111111111))
    assert(close(jaroWinkler("dwayne", "duane"), 0.84))
    assert(close(jaroWinkler("dixon", "dicksonx"), 0.8133333333333332))
    // threshold: jaro <= 0.7 gets NO prefix boost
    assert(close(jaroWinkler("axxxxx", "ayyyyy"), 0.4444444444444444))
    assert(close(jaroWinkler("ab", "ac"), 0.6666666666666666))
    // prefix boost caps at 4 common lead chars
    assert(close(jaroWinkler("aaaaaab", "aaaaaac"), 0.9428571428571428))
    assert(close(jaroWinkler("prefixaa", "prefixbb"), 0.9))
    // no common prefix -> no boost even above threshold
    assert(close(jaroWinkler("crate", "trace"), 0.7333333333333333))
    // empty-window and degenerate cases
    assert(jaroWinkler("ax", "xa") == 0.0)
    assert(jaroWinkler("abc", "abc") == 1.0)
    assert(jaroWinkler("ab", "") == 0.0)
    // documented divergence from DuckDB: empty-empty is textbook 1.0
    assert(jaroWinkler("", "") == 1.0)
  }

  test("expression evaluates through codegen and interpreted paths equally") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("dwayne", "duane"), ("ax", "xa"))
      .toDF("a", "b")
    val got = df.select(JaroWinklerSim.jaroWinkler(col("a"), col("b")).as("jw"))
      .as[Double].collect().toSeq
    assert(got.zip(Seq(0.9611111111111111, 0.84, 0.0))
      .forall { case (g, w) => math.abs(g - w) < 1e-9 })
    // null propagates
    val n = Seq((Option("a"), Option.empty[String])).toDF("a", "b")
      .select(JaroWinklerSim.jaroWinkler(col("a"), col("b"))).collect().head
    assert(n.isNullAt(0))
  }
}
