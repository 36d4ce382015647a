package graft.meta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.ChargesFixture

/** Partitioned charges lake: isolation + partition-pruned reads. */
class LakeSpec extends SparkSpec {

  test("campus reads prune to their partition (PartitionFilters, no data filter scan)") {
    val lake = Files.createTempDirectory("graft-lake").toString
    val canonical = ChargesFixture.charges(spark, sf("sf0.001")).limit(100)
    Lake.writeCharges(canonical, lake, "acme", "c1")
    Lake.writeCharges(canonical.limit(50), lake, "acme", "c2")
    Lake.writeCharges(canonical.limit(20), lake, "beta", "c3")

    val one = Lake.readCampus(spark, lake, "acme", "c2")
    assert(one.count() == 50)
    val p = one.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters:") &&
      p.contains("isnotnull(healthcare_system"), p)

    assert(Lake.readSystem(spark, lake, "acme").count() == 150)
    assert(Lake.readSystem(spark, lake, "beta")
      .select("campus_id").distinct().count() == 1)
  }

  test("compaction re-bins a many-file partition without changing its rows") {
    val lake = Files.createTempDirectory("graft-lake-compact").toString
    val canonical = ChargesFixture.charges(spark, sf("sf0.001")).limit(200)
    // 8 appends -> at least 8 small files in the partition
    (1 to 8).foreach(_ => Lake.writeCharges(canonical.limit(25), lake, "acme", "c1"))
    val rowsBefore = Lake.readCampus(spark, lake, "acme", "c1").collect()
      .map(_.toString).sorted.toSeq
    val (nBefore, nAfter) = Lake.compactCampus(spark, lake, "acme", "c1",
      targetBytes = 512L * 1024 * 1024)
    assert(nBefore >= 8 && nAfter == 1, s"$nBefore -> $nAfter")
    val rowsAfter = Lake.readCampus(spark, lake, "acme", "c1").collect()
      .map(_.toString).sorted.toSeq
    assert(rowsAfter == rowsBefore)
    // idempotent: already-compact partitions are left untouched
    assert(Lake.compactCampus(spark, lake, "acme", "c1") == (1, 1))
  }

  test("dynamic overwrite replaces one campus and leaves the others intact") {
    val lake = Files.createTempDirectory("graft-lake-ow").toString
    val canonical = ChargesFixture.charges(spark, sf("sf0.001")).limit(100)
    Lake.writeCharges(canonical, lake, "acme", "c1")
    Lake.writeCharges(canonical.limit(40), lake, "acme", "c2")
    // re-process c1 with a smaller corrected frame
    Lake.overwriteCharges(canonical.limit(10), lake, "acme", "c1")
    assert(Lake.readCampus(spark, lake, "acme", "c1").count() == 10)
    assert(Lake.readCampus(spark, lake, "acme", "c2").count() == 40)
  }

  test("compaction refuses to run over leftovers from an interrupted swap") {
    val lake = Files.createTempDirectory("graft-lake-leftover").toString
    val canonical = ChargesFixture.charges(spark, sf("sf0.001")).limit(50)
    (1 to 3).foreach(_ => Lake.writeCharges(canonical, lake, "acme", "c9"))
    // simulate a crashed prior run: a stranded .trash- sibling
    val trash = new java.io.File(
      s"$lake/healthcare_system=acme/.trash-campus_id=c9")
    assert(trash.mkdirs())
    val e = intercept[IllegalArgumentException] {
      Lake.compactCampus(spark, lake, "acme", "c9", targetBytes = 1L << 30)
    }
    assert(e.getMessage.contains("interrupted compaction"))
    // partition untouched by the refusal
    assert(Lake.readCampus(spark, lake, "acme", "c9").count() == 150)
  }
}
