package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** StepLookup binary-search semantics on both execution paths. */
class StepLookupSpec extends SparkSpec {

  import spark.implicits._

  test("lookup returns the rightmost start <= x, null before the first") {
    val starts = Array(10L, 20L, 40L)
    val ids = Array(100L, 200L, 400L)
    val xs = Seq(5L, 10L, 15L, 20L, 39L, 40L, 1000L)
    val got = xs.toDF("x")
      .select(StepLookup.stepLookup(col("x"), starts, ids).as("id"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(None, Some(100L), Some(100L), Some(200L),
      Some(200L), Some(400L), Some(400L)))
    // direct impl agrees (interpreted mirror of the codegen static call)
    assert(StepLookupImpl.lookup(5L, starts, ids) == Long.MinValue)
    assert(StepLookupImpl.lookup(39L, starts, ids) == 200L)
  }

  test("null input propagates; invalid tables are rejected") {
    val got = Seq(Option.empty[Long], Some(25L)).toDF("x")
      .select(StepLookup.stepLookup(col("x"), Array(10L, 20L), Array(1L, 2L)))
      .collect()
    assert(got(0).isNullAt(0) && got(1).getLong(0) == 2L)
    intercept[IllegalArgumentException] {
      StepLookup.stepLookup(col("x"), Array(10L, 10L), Array(1L, 2L))
    }
    intercept[IllegalArgumentException] {
      StepLookup.stepLookup(col("x"), Array(10L), Array(1L, 2L))
    }
  }
}
