package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering: Morton (Z-order) keys and the cluster-then-write
  * pass that gives a parquet lake multi-column range-pruning locality.
  *
  * Why it matters at 100 TB: parquet scans prune on per-file/row-group
  * min-max stats. A lake sorted by one column prunes that column only; a
  * Z-ordered lake interleaves the bits of two columns so each file covers a
  * small RECTANGLE of the (x, y) value space — point/range predicates on
  * EITHER or BOTH columns skip most files. This is the standard layout
  * optimization for multi-dimensional scan pruning; the key is pure per-row
  * arithmetic and the clustering is one range exchange, so the pass costs
  * the same as any full sort-write of the same data.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative integer
    * columns: bit i of x lands at position 2i, bit i of y at 2i+1. Pure
    * 64-bit shift/mask arithmetic — engine-neutral, codegen'd, no UDF.
    * Callers must bound inputs to [0, 2^bits); see [[zkeyBounded]]. */
  def zkey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** [[zkey]] with the inputs folded into range by `pmod` — the safe form
    * for unbounded id-like columns. */
  def zkeyBounded(x: Column, y: Column, bits: Int = 16): Column = {
    val m = lit(1L << bits)
    zkey(pmod(x.cast("long"), m), pmod(y.cast("long"), m), bits)
  }

  /** Cluster a frame for multi-dimensional pruning: range-partition by the
    * Morton key of (xCol, yCol), sort within partitions by it. Each output
    * partition (→ one parquet file via a partitioned write) then covers a
    * compact rectangle of the value space. One range exchange + local sort;
    * the sampled range boundaries make partitions size-balanced even when
    * the key space is sparse or skewed. */
  /** Append the HILBERT-curve index of (`xCol` % 2^order, `yCol` %
    * 2^order) as `outCol` — the locality-superior sibling of [[zkey]]
    * (every consecutive Hilbert step is an adjacent grid cell; Morton
    * jumps across the plane at bit boundaries, which is why Hilbert
    * clustering gives tighter per-file bounding boxes at the same key
    * width). The classic xy→d walk (Hamilton's algorithm), `order`
    * rounds of PURE INTEGER column arithmetic — the XOR in the quadrant
    * term is expanded to a CASE over {0,1} bits, so the whole derivation
    * uses only +,−,*,&,CASE and mirrors verbatim into any SQL dialect
    * (no float anywhere, no operand-order hazard). The rounds
    * materialize as chained projections — Catalyst collapses them into
    * one codegen'd stage; nothing shuffles. */
  def withHilbert(df: DataFrame, xCol: Column, yCol: Column, order: Int,
      outCol: String): DataFrame = {
    require(order >= 1 && order <= 31, s"order out of range (1..31): $order")
    Seq("__hx", "__hy", "__hd", "__rx", "__ry").foreach { c =>
      require(!df.columns.contains(c),
        s"withHilbert uses internal column $c; rename the existing one")
    }
    val side = 1L << order
    var cur = df
      .withColumn("__hx", pmod(xCol.cast("long"), lit(side)))
      .withColumn("__hy", pmod(yCol.cast("long"), lit(side)))
      .withColumn("__hd", lit(0L))
    for (k <- order - 1 to 0 by -1) {
      val s = 1L << k
      cur = cur
        .withColumn("__rx",
          when((col("__hx").bitwiseAND(lit(s))) > 0, 1L).otherwise(0L))
        .withColumn("__ry",
          when((col("__hy").bitwiseAND(lit(s))) > 0, 1L).otherwise(0L))
        .withColumn("__hd", col("__hd") + lit(s * s) *
          when(col("__rx") === 0, col("__ry"))
            .otherwise(lit(3L) - col("__ry")))
        // rotate: if ry=0 { if rx=1 reflect; swap } — __nx/__ny are
        // derived from the PRE-update __hx/__hy, then renamed in.
        .withColumn("__nx", when(col("__ry") === 0,
          when(col("__rx") === 1, lit(s - 1) - col("__hy"))
            .otherwise(col("__hy"))).otherwise(col("__hx")))
        .withColumn("__ny", when(col("__ry") === 0,
          when(col("__rx") === 1, lit(s - 1) - col("__hx"))
            .otherwise(col("__hx"))).otherwise(col("__hy")))
        .drop("__hx", "__hy")
        .withColumnRenamed("__nx", "__hx")
        .withColumnRenamed("__ny", "__hy")
    }
    cur.withColumn(outCol, col("__hd"))
      .drop("__hx", "__hy", "__hd", "__rx", "__ry")
  }

  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int, bits: Int = 16): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    require(!df.columns.contains("__z"),
      "clusterByZ uses an internal __z column; rename the existing one")
    df.withColumn("__z", zkeyBounded(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
