package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{broadcast, count, expr, lit}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable global ranking — a dense total order over the whole dataset.
  *
  * The naive encoding, `row_number().over(Window.orderBy(...))`, is the
  * classic scale trap: an empty window partition spec pulls EVERY row into
  * one task. The distributed shape is the two-pass sort-and-offset:
  * range-repartition by the sort key (sampled range bounds — Spark's
  * distributed sort exchange), sort within partitions, then add each
  * partition's start offset to its local index. `zipWithIndex` does the
  * offset pass natively (one small count job over partition sizes, then a
  * narrow map) — this is the one deliberate RDD drop-down in the library,
  * used exactly where the Dataset API has no partition-offset primitive.
  *
  * Ties: callers must make `orderCols` a total order (append a unique id
  * column) or ranks within a tie group are partition-placement dependent.
  */
object Ranking {

  /** Input columns + `rank` (1-based, dense total order by `orderCols`). */
  def globalRank(df: DataFrame, orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(!df.columns.contains("rank"),
      "globalRank appends a `rank` column; rename the existing one")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField("rank", LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Distributed prefix sums — the parallel scan. The window formulation
    * (`sum(...).over(Window.orderBy(...))` with an empty partition spec)
    * pulls every row into ONE task; this is the two-pass shape that scales:
    * range-repartition by `orderCols`, per-partition partial totals (one
    * tiny job returning one row per partition), broadcast the exclusive
    * partition offsets, then a narrow second pass accumulates within each
    * partition starting from its offset.
    *
    * Appends `cum_<c>` (running inclusive sum in `orderCols` order) for
    * each of `valueCols`, which must be non-null LongType. Callers must
    * make `orderCols` a total order for a deterministic curve.
    *
    * NOTE: construction is EAGER — the partial-totals job (a full
    * range-shuffle over the input) runs when this method is CALLED, not
    * when the returned frame is acted on, and a downstream action pays the
    * scan again. Build frames that use it (tokenBudgetSelect, growthCurve)
    * only when they will actually be executed — plan-only tooling should
    * skip them. */
  def prefixSum(df: DataFrame, orderCols: Seq[Column],
      valueCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(valueCols.nonEmpty, "need at least one value column")
    valueCols.foreach { c =>
      require(df.columns.contains(c), s"missing value column $c")
      require(!df.columns.contains(s"cum_$c"),
        s"prefixSum appends cum_$c; rename the existing column")
    }
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val vIdx = valueCols.map(sorted.schema.fieldIndex).toArray
    val partials: Array[Array[Long]] = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val sums = new Array[Long](vIdx.length)
        it.foreach { r =>
          var j = 0
          while (j < vIdx.length) { sums(j) += r.getLong(vIdx(j)); j += 1 }
        }
        Iterator((pid, sums))
      }.collect().sortBy(_._1).map(_._2)
    // exclusive running offsets per partition (tiny: one entry/partition)
    val offsets = partials.scanLeft(new Array[Long](vIdx.length)) { (acc, p) =>
      acc.zip(p).map { case (a, b) => a + b }
    }.init
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields ++
      valueCols.map(c => StructField(s"cum_$c", LongType, nullable = false)))
    val rows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val run = bc.value(pid).clone()
      it.map { r =>
        var j = 0
        while (j < vIdx.length) { run(j) += r.getLong(vIdx(j)); j += 1 }
        // run.toList COPIES — Row must not alias the mutable accumulator
        Row.fromSeq(r.toSeq ++ run.toList)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Equal-frequency (quantile) binning: global rank by `orderCols`, then
    * `bin = ((rank − 1) · k) div n` — pure integer arithmetic, so the bin
    * boundaries are engine-exact (unlike ntile, whose remainder layout
    * differs per implementation). Bins are balanced to within one row.
    * Distributed via [[globalRank]]'s range exchange; the row count rides
    * as a 1-row broadcast. Appends a `bin` column (0-based). */
  def quantileBins(df: DataFrame, orderCols: Seq[Column], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("bin") && !df.columns.contains("__n"),
      "quantileBins appends bin and uses __n; rename the existing column")
    val n = df.agg(count(lit(1)).as("__n"))
    globalRank(df, orderCols)
      .crossJoin(broadcast(n))
      .withColumn("bin", expr(s"((rank - 1) * $k) div __n"))
      .drop("__n")
  }
}
