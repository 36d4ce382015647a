package graft

import org.apache.spark.sql.SparkSession

/** Whole-engine plan lint (`PlanLint [sfDir]`): renders every
  * SparkEntry query's physical plan at the smallest fixture and reports
  * the operators that do not survive scale — cartesian products,
  * broadcast nested-loop joins, and un-partitioned (global) windows.
  * Complements PlanSpec (which pins specific gates' shapes) with
  * breadth: every NEW gate is linted automatically, so an anti-pattern
  * cannot slip in unnamed. Findings are a report, not an assertion:
  * 1-row bound frames legitimately cross-join (broadcast nested loop on
  * a literal-sized side), and report-shaped global windows over
  * aggregate-sized frames are bounded by construction — the lint's job
  * is to make every instance NAMED and reviewed (SCALE.md batch 14).
  */
object PlanLint {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val globalWindow = """Window \[[^\]]*\], \[\]""".r // empty PARTITION BY
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val issues = try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        Seq(
          "CartesianProduct" -> "CartesianProduct".r.findAllIn(p).size,
          "BroadcastNestedLoopJoin" ->
            "BroadcastNestedLoopJoin".r.findAllIn(p).size,
          "GlobalWindow" -> globalWindow.findAllIn(p).size
        ).filter(_._2 > 0)
      } catch {
        case e: Throwable => Seq(("PLAN_ERROR: " + e.getClass.getSimpleName, 1))
      }
      if (issues.nonEmpty) {
        flagged += 1
        println(s"$name: " + issues.map { case (k, n) => s"$k x$n" }.mkString(", "))
      }
    }
    println(s"""{"plan_lint_flagged":$flagged,"total":${SparkEntry.queries.size}}""")
    spark.stop()
  }
}
