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
}
