package graft

import org.apache.spark.sql.functions._

/** PlanLint as a FAILING gate, not a report (r14 verdict item 3): any
  * new CartesianProduct, data-sized BNLJ build, or global window in any
  * SparkEntry query's executed plan fails `sbt test`. The detector
  * suite below also proves each detector FIRES on a deliberately bad
  * plan — the r14 lint's global-window regex was dead (Spark 4 never
  * prints the `[]` group it required), and "0 flagged" read as a clean
  * sweep when the check never ran; a structural detector pinned red on
  * known-bad plans cannot regress that way. */
class PlanLintSpec extends SparkSpec {

  // deliberately-bad plans must be built over FILE scans: a literal
  // Seq.toDF is a LocalTableScan whose row count the classifier can see,
  // so it is (correctly) judged const-bounded and benign
  private def scan = graft.core.Tables.table(spark, sf("sf0.001"), "nation")
    .select(col("n_nationkey").as("v"))

  test("detector fires: un-partitioned window over a data-sized frame") {
    val df = scan.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("v"))))
    val kinds = PlanLint.lint(df).map(_.kind)
    assert(kinds.contains("GlobalWindow"), kinds.toString)
  }

  test("detector stays quiet: partitioned window, and global window over a limit-bounded frame") {
    val part = scan.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(col("v") % 3).orderBy(col("v"))))
    assert(PlanLint.lint(part).isEmpty)
    val bounded = scan.orderBy(col("v")).limit(10)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("v"))))
    assert(PlanLint.lint(bounded).isEmpty)
  }

  test("detector fires: BNLJ with a data-sized build side") {
    val df = scan.select(col("v").as("a"))
      .join(broadcast(scan.select(col("v").as("b"))), col("a") < col("b"))
    val kinds = PlanLint.lint(df).map(_.kind)
    assert(kinds.contains("DataSizedBNLJ"), kinds.toString)
  }

  test("detector stays quiet: BNLJ whose build is a 1-row aggregate (bound frame)") {
    val df = scan.select(col("v").as("a"))
      .join(broadcast(scan.agg(max(col("v")).as("mx"))), col("a") < col("mx"))
    assert(PlanLint.lint(df).isEmpty)
  }

  test("detector fires: CartesianProduct, suppressed only by the allowlist flag") {
    val left = scan.select(col("v").as("a"))
    val right = scan.select(col("v").as("b"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = left.join(right, col("a") < col("b"))
      val kinds = PlanLint.lint(df).map(_.kind)
      assert(kinds.contains("CartesianProduct"), kinds.toString)
      assert(!PlanLint.lint(df, allowCartesian = true)
        .map(_.kind).contains("CartesianProduct"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("whole-engine sweep: every gate's executed plan is clean at sf0.001") {
    // The same sweep `runMain graft.PlanLint` reports, as an assertion.
    // Adding a gate with a global window / data-sized BNLJ / cartesian
    // turns this red (verified by the detector tests above — this suite
    // is red if the detectors themselves go dead).
    val flagged = PlanLint.sweep(spark, sf("sf0.001"))
    assert(flagged.isEmpty, flagged.map { case (n, fs) =>
      s"$n: ${fs.map(f => f.kind + " | " + f.detail).mkString("; ")}"
    }.mkString("\n"))
  }
}
