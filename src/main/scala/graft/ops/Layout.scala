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
