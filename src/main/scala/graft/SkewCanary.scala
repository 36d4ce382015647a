package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skewed-fixture generator (`SkewCanary <srcDir> <outDir> [s=1.2]`):
  * rewrites `lineitem.l_partkey` through a zipfian map so the
  * pair-generating joins and item-keyed aggregates see a HOT KEY — the
  * failure mode a uniformly-replicated scale fixture never exercises,
  * and the one a 100 TB co-purchase deployment actually dies on
  * (VERDICT r13 item 4). Every other table copies verbatim, so all
  * foreign keys still resolve and every SparkEntry query runs unchanged.
  *
  * The map: each lineitem row draws u ∈ [0,1) from xxhash64 of
  * (l_orderkey, l_linenumber) — deterministic, reproducible — and
  * maps it through the inverse CDF of the CONTINUOUS truncated power law
  * on [1, P+1) with exponent s:
  *
  *   x(u) = (1 + u·((P+1)^(1−s) − 1))^(1/(1−s)),  new key = ⌊x⌋ ∈ [1, P]
  *
  * (the standard continuous surrogate for a zipf(s) rank draw — exact
  * zipf normalization needs the generalized harmonic number, which buys
  * nothing for a stress fixture). At s = 1.2 and the sf1 fixture's
  * P ≈ 2·10⁵ parts, rank 1 alone absorbs ~11% of all basket rows and
  * the top 10 ranks ~30% — deg(hot part) is ~10⁴× the uniform fixture's
  * mean degree, which is exactly the regime AQE skew-join splitting and
  * the blocked-pairing paths exist for.
  *
  * Note the ORDER side stays uniform (orders keep their 1-7 items), so
  * per-order pair generation stays bounded; the skew lands where it does
  * in production — on the item-keyed degree aggregates, the item-keyed
  * joins, and the hot vertex's edge neighborhood in the co-purchase
  * graph.
  */
object SkewCanary {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val s = if (args.length > 2) args(2).toDouble else 1.2
    require(s != 1.0, "s = 1 needs the log-form inverse CDF; use 1.2")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tbl(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")
    graft.core.Memo.clearDir(out)

    val li = tbl("lineitem")
    val pCount = tbl("part").count()
    // u from a 64-bit mix of the row identity (xxhash64 — wrap-around
    // arithmetic lives inside the expression, so ANSI mode can't throw);
    // >>> 11 / 2^53 gives a uniform double in [0, 1) with full mantissa
    // coverage.
    val mixed = xxhash64(col("l_orderkey"), col("l_linenumber"))
    val u = shiftrightunsigned(mixed, 11).cast("double") / lit((1L << 53).toDouble)
    val oneMinusS = 1.0 - s
    val x = pow(lit(1.0) + u *
      (pow(lit((pCount + 1).toDouble), oneMinusS) - 1.0), 1.0 / oneMinusS)
    val zipfKey = least(greatest(floor(x).cast("long"), lit(1L)), lit(pCount))
    val skewed = li.select((zipfKey.as("l_partkey") +:
      li.columns.filterNot(_ == "l_partkey").map(col)): _*)
      .select(li.columns.map(col): _*) // original column order
    skewed.write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "events", "documents", "embeddings").foreach { n =>
      tbl(n).write.mode("overwrite").parquet(s"$out/$n.parquet")
    }

    // Print the realized histogram head so the artifact carries the
    // evidence the skew actually exists at the advertised magnitude.
    val top = spark.read.parquet(s"$out/lineitem.parquet")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(5).collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(",")
    val nRows = spark.read.parquet(s"$out/lineitem.parquet").count()
    println(s"""{"skew_canary":"$out","s":$s,"rows":$nRows,"parts":$pCount,"top5":"$top"}""")
    spark.stop()
  }
}
