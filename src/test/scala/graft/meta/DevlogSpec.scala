package graft.meta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.clean.{Cleaning, Rules}
import graft.queries.ChargesFixture

/** Devlog roundtrip (S11/S13/L1) + registry update (S12/J4). */
class DevlogSpec extends SparkSpec {
  import spark.implicits._

  test("devlog append/latest roundtrip keeps the highest-seq entry") {
    val dir = Files.createTempDirectory("graft-devlog").toString
    val summary = Rules.summarize(Rules.tagViolations(
      Cleaning.cleanAll(ChargesFixture.charges(spark, sf("sf0.001")))))
    val meta = Devlog.metadataFromSummary(summary, duplicatesDropped = 7L)
    assert(meta.rule_violations_summary.keySet.size == 10)
    assert(meta.final_transparency_score >= 0 && meta.final_transparency_score <= 1)
    Seq(1L, 2L).foreach { seq =>
      Devlog.append(spark, dir, Devlog.DevlogEntry(
        "campus1", "1 Main St", s"v$seq", "2024-07-01",
        meta.final_transparency_score, seq, meta))
    }
    val last = Devlog.latest(spark, dir)
    assert(last.count() == 1)
    assert(last.head().getAs[String]("version") == "v2")
  }

  test("registry update: matched row refreshed with devlog fallback, others untouched") {
    val registry = Seq(
      ("campus1", "2023-01-01", "v1", 0.5, "new", "", ""),
      ("campus2", "2023-01-01", "v1", 0.6, "new", "", ""))
      .toDF("campus_id", "last_updated_on", "version", "transparency_score",
        "etl_status", "processed_by", "last_processed_on")
    val devlog = Seq(("campus1", "2024-07-01", null.asInstanceOf[String], 0.925, 1L))
      .toDF("campus_id", "last_updated_on", "version", "transparency_score", "seq")
    val updated = Devlog.updateRegistry(registry, devlog, "campus1", "etl", "2026-08-12 00:00:00")
    val r1 = updated.filter(col("campus_id") === "campus1").head()
    val r2 = updated.filter(col("campus_id") === "campus2").head()
    assert(r1.getAs[String]("last_updated_on") == "2024-07-01")
    assert(r1.getAs[String]("version") == "v1") // devlog null → fallback kept
    assert(r1.getAs[Double]("transparency_score") == 0.925)
    assert(r1.getAs[String]("etl_status") == "cleaned")
    assert(r2.getAs[String]("etl_status") == "new") // untouched row
  }
}
