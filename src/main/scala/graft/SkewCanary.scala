package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-canary data generator: TPC-H is uniform, so the bench never
  * exercises the one distributional assumption a 100 TB run will break —
  * hot keys. This rewrites `hotPermille`/1000 of the lineitem rows
  * (picked by a deterministic row hash) onto ONE order key, producing a
  * single basket holding ~1% of the fact table, and copies every other
  * table verbatim. Self-join/aggregate gates (basket_pair_counts,
  * recsys_*) run against the output to measure: does the hot key stall
  * one task, does AQE's skew split engage, and what does
  * [[graft.ops.SkewJoin.saltedJoin]] buy when it can't.
  *
  * Output layout matches testdata (single file per table) so BenchOne
  * runs against it unchanged.
  */
object SkewCanary {

  val HotOrderKey = 1L

  def main(args: Array[String]): Unit = {
    val (src, out) = (args(0), args(1))
    val hotPermille = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def write(n: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$n.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    // Row-deterministic hot-key assignment on the (orderkey, linenumber)
    // primary key — re-runs produce the identical skewed table.
    val hot = pmod(xxhash64(col("l_orderkey") * 8 + col("l_linenumber")),
      lit(1000)) < hotPermille
    write("lineitem", li.withColumn("l_orderkey",
      when(hot, lit(HotOrderKey)).otherwise(col("l_orderkey"))))
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "events", "documents", "embeddings")
      .foreach(n => write(n, spark.read.parquet(s"$src/$n.parquet")))
    spark.stop()
  }
}
