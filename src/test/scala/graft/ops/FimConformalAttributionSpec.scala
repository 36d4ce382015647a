package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.SparkSpec

/** Semantic invariants for the round-9 continuation gates: FIM builder,
  * split conformal coverage, position-based attribution. */
class FimConformalAttributionSpec extends SparkSpec {

  import spark.implicits._

  private def emptyDf(fields: (String, org.apache.spark.sql.types.DataType)*) =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(fields.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t) }))

  test("fillInMiddle: PSM parts reassemble the original token stream") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val out = Shaping.fillInMiddle(docs, "doc_id", "text")
    val both = out.join(
      docs.select(col("doc_id").as("id"), TextOps.tokens(col("text")).as("toks")),
      "id")
    // psm rows: exactly one of each sentinel, and stripping sentinels then
    // moving the middle back between prefix and suffix restores the doc.
    val psm = both.filter(col("mode") === "psm")
      .select(col("id"), col("toks"), col("split_at"), col("mid_len"),
        split(col("text_fim"), " ").as("ftoks"))
      .collect()
    assert(psm.nonEmpty)
    psm.foreach { r =>
      val orig = r.getSeq[String](1)
      val p1 = r.getLong(2).toInt
      val l = r.getLong(3).toInt
      val f = r.getSeq[String](4)
      val iPre = f.indexOf("<fim_prefix>")
      val iSuf = f.indexOf("<fim_suffix>")
      val iMid = f.indexOf("<fim_middle>")
      assert(iPre == 0 && iSuf > iPre && iMid > iSuf)
      val prefix = f.slice(iPre + 1, iSuf)
      val suffix = f.slice(iSuf + 1, iMid)
      val middle = f.drop(iMid + 1)
      assert(prefix.length == p1 && middle.length == l)
      // array_join of an empty doc gives Seq("") after split; normalize
      val reassembled = (prefix ++ middle ++ suffix).filter(_.nonEmpty)
      assert(reassembled == orig.filter(_.nonEmpty))
    }
    // ar rows pass through untouched
    val ar = both.filter(col("mode") === "ar")
      .select(array_join(col("toks"), " ").as("j"), col("text_fim"))
      .collect()
    ar.foreach(r => assert(r.getString(0) == r.getString(1)))
    // the AR fraction is ~10%, not 0 and not 100%
    assert(ar.length > 0 && ar.length < psm.length)
    // zero-token doc is well-defined (empty parts, no error)
    val z = Shaping.fillInMiddle(Seq((7L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(z.getAs[Long]("n_tokens") == 0L)
  }

  test("conformalCoverage: empirical coverage honors the 90% floor on events") {
    val ev = spark.read.parquet(sf("sf0.001") + "/events.parquet")
    val r = Eval.conformalCoverage(ev, col("event_type"), col("value"),
      col("event_id")).collect().head
    assert(r.getAs[Long]("n_cal") > 0 && r.getAs[Long]("n_test") > 0)
    assert(r.getAs[Double]("tau") > 0.0)
    // split conformal guarantees E[coverage] >= 1 - alpha; on an exchange-
    // able split this holds with slack at n ~ thousands. Loose floor.
    assert(r.getAs[Double]("coverage") >= 0.85)
    assert(r.getAs[Double]("target") == 0.9)
    // empty input: no calibration rows -> zero-row-safe (null tau, no crash)
    val e = emptyDf("g" -> StringType, "v" -> DoubleType, "id" -> LongType)
    val er = Eval.conformalCoverage(e, col("g"), col("v"), col("id")).collect()
    assert(er.length <= 1)
  }

  test("position-based attribution: per-user credits sum to one conversion") {
    // 4 touches for one user: 0.4 + 0.1 + 0.1 + 0.4 = 1.0
    val q = graft.queries.SessionQueries.queries
    val out = q("attribution_position_based")(spark, sf("sf0.001"))
      .collect()
    assert(out.nonEmpty)
    val totalCredit = out.map(_.getAs[Double]("credit")).sum
    // total credit equals the number of users with >=1 attributed touch
    // (each converted user's touches sum to exactly 1, up to 9dp rounding
    // spread across at most k middle touches)
    assert(totalCredit > 0.0 && math.abs(totalCredit - math.rint(totalCredit)) < 0.01)
    val channels = out.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("click", "view")))
  }
}
