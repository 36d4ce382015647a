package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbench isolating the VecOps-vs-zip_with regimes: ONE kernel per row
  * (verify-join shape) vs MANY kernels per row (SRP hashing shape, where a
  * huge generated method can fall off the JIT). */
object VecBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Ann

    val n = 2000000L
    val dim = 64
    val base = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * lit(997) + i), lit(2001)) - 1000)
          .cast("double") / 1000.0).as("a"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * lit(1009) + i), lit(2001)) - 1000)
          .cast("double") / 1000.0).as("b"))
      .persist()
    base.count()

    def foldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def foldCos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      foldDot(a, b) / (sqrt(foldDot(a, a)) * sqrt(foldDot(b, b)))

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val r = f
        println(f"$label RUN$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$r)")
      }
    }

    // Regime 1: one kernel per row.
    time("one_vec_cosine") {
      base.select(Ann.cosine(col("a"), col("b")).as("c"))
        .filter(col("c") > 2.0).count()
    }
    time("one_fold_cosine") {
      base.select(foldCos(col("a"), col("b")).as("c"))
        .filter(col("c") > 2.0).count()
    }

    // Regime 2: many kernels per row (the SRP-hashing shape): 200 dots
    // against 200 distinct literal planes.
    val planes = (0 until 200).map(p => typedLit(Ann.planeVec(7, p, dim)))
    val manyVec = planes.zipWithIndex.map { case (pl, i) =>
      when(Ann.dot(col("a"), pl) >= 0, lit(1L << (i % 60))).otherwise(lit(0L)) }
      .reduce(_.bitwiseOR(_))
    val manyFold = planes.zipWithIndex.map { case (pl, i) =>
      when(foldDot(col("a"), pl) >= 0, lit(1L << (i % 60))).otherwise(lit(0L)) }
      .reduce(_.bitwiseOR(_))
    time("many_vec_dot") {
      base.select(manyVec.as("h")).filter(col("h") === -1L).count()
    }
    time("many_fold_dot") {
      base.select(manyFold.as("h")).filter(col("h") === -1L).count()
    }
    spark.stop()
  }
}
