package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{broadcast, col, count, explode, expr, lit, sequence, sum}
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

  /** Run `body` with `df` persisted, unpersisting on exit — UNLESS the
    * caller already cached it (then both persist and unpersist are ours
    * to skip). The two-pass rankers need this because
    * `repartitionByRange` SAMPLES its input to pick range bounds, so an
    * unpersisted input subtree is evaluated twice before the first pass
    * even runs (once for the bounds, once for the shuffle write); each
    * ranker's eager first pass materializes the range shuffle, after
    * which the second pass reuses the shuffle map output and never
    * touches the input again — so the persist window can close before
    * returning and nothing leaks. */
  private def withSampledInput[A](df: DataFrame)(body: DataFrame => A): A = {
    val preCached =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val in = if (preCached) df
      else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try body(in)
    finally if (!preCached) in.unpersist(blocking = false)
  }

  /** Input columns + `rank` (1-based, dense total order by `orderCols`). */
  def globalRank(df: DataFrame, orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(!df.columns.contains("rank"),
      "globalRank appends a `rank` column; rename the existing one")
    val spark = df.sparkSession
    withSampledInput(df) { in =>
      val sorted = in.repartitionByRange(orderCols: _*)
        .sortWithinPartitions(orderCols: _*)
      val schema = StructType(sorted.schema.fields :+
        StructField("rank", LongType, nullable = false))
      // zipWithIndex runs its partition-size count job EAGERLY at RDD
      // construction — that job materializes the range shuffle, so the
      // persist window can close when this call returns.
      val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1L))
      }
      spark.createDataFrame(ranked, schema)
    }
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
    withSampledInput(df) { in =>
    val sorted = in.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val vIdx = valueCols.map(sorted.schema.fieldIndex).toArray
    // The partials collect materializes the range shuffle; the second
    // pass below reuses its map output (same RDD object), so the persist
    // window closes when this call returns.
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
  }

  /** Distributed prefix MAX — [[prefixSum]]'s running-maximum sibling (the
    * scan a watermark audit needs: "highest timestamp seen so far in
    * arrival order" without a single-task global window). Same two-pass
    * shape: range-repartition by `orderCols`, per-partition partial maxima
    * (one tiny job), broadcast exclusive offsets seeded at Long.MinValue,
    * then a narrow second pass. Appends `cummax_<c>` (running INCLUSIVE max
    * in `orderCols` order) for each of `valueCols` (non-null LongType).
    * Same eager-construction caveat as [[prefixSum]]. */
  def prefixMax(df: DataFrame, orderCols: Seq[Column],
      valueCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(valueCols.nonEmpty, "need at least one value column")
    valueCols.foreach { c =>
      require(df.columns.contains(c), s"missing value column $c")
      require(!df.columns.contains(s"cummax_$c"),
        s"prefixMax appends cummax_$c; rename the existing column")
    }
    val spark = df.sparkSession
    withSampledInput(df) { in =>
    val sorted = in.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val vIdx = valueCols.map(sorted.schema.fieldIndex).toArray
    val partials: Array[Array[Long]] = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val maxs = Array.fill(vIdx.length)(Long.MinValue)
        it.foreach { r =>
          var j = 0
          while (j < vIdx.length) {
            val v = r.getLong(vIdx(j))
            if (v > maxs(j)) maxs(j) = v
            j += 1
          }
        }
        Iterator((pid, maxs))
      }.collect().sortBy(_._1).map(_._2)
    val offsets = partials.scanLeft(Array.fill(vIdx.length)(Long.MinValue)) {
      (acc, p) => acc.zip(p).map { case (a, b) => math.max(a, b) }
    }.init
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields ++
      valueCols.map(c => StructField(s"cummax_$c", LongType, nullable = false)))
    val rows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val run = bc.value(pid).clone()
      it.map { r =>
        var j = 0
        while (j < vIdx.length) {
          val v = r.getLong(vIdx(j))
          if (v > run(j)) run(j) = v
          j += 1
        }
        Row.fromSeq(r.toSeq ++ run.toList)
      }
    }
    spark.createDataFrame(rows, schema)
    }
  }

  /** Equal-frequency (quantile) binning: global rank by `orderCols`, then
    * `bin = ((rank − 1) · k) div n` — pure integer arithmetic, so the bin
    * boundaries are engine-exact (unlike ntile, whose remainder layout
    * differs per implementation). Bins are balanced to within one row.
    * Distributed via [[globalRank]]'s range exchange; the row count rides
    * as a 1-row broadcast. Appends a `bin` column (0-based). */
  def quantileBins(df: DataFrame, orderCols: Seq[Column], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("bin"),
      "quantileBins appends a bin column; rename the existing one")
    // One persist window covers BOTH input consumers: the row count
    // (eager, so it rides the cache and inlines as a literal instead of
    // a crossJoin subtree that would re-evaluate the input lazily) and
    // globalRank's sampled range exchange (which detects the input is
    // already cached and skips its own persist).
    withSampledInput(df) { in =>
      val n = in.count()
      globalRank(in, orderCols)
        .withColumn("bin", expr(s"((rank - 1) * $k) div ${n}L"))
    }
  }

  /** Cross-source quantile normalization: map each row's value onto the
    * GLOBAL value distribution by within-source rank, so scores from
    * sources with incomparable scales become comparable before a global
    * threshold ("quality 0.4 from source A may beat 0.7 from source B").
    * The classic quantile-normalization recipe, discretized to a
    * `grid`-point quantile function (permille by default) — the
    * discretization is what makes it scale: the global quantile function
    * materializes as a `grid`-row broadcast table instead of a global
    * as-of join against every distinct value.
    *
    * All rank arithmetic is exact 64-bit integer (cross-multiplied
    * rationals, never a float): a row's source percentile is the
    * inclusive tie-sharing rank `ceil(grid·r_s/n_s)`, and grid point p
    * holds the type-1 global quantile `min{v : grid·cum_g ≥ p·n_g}` —
    * each global value row covers the CLOSED-FORM permille interval
    * `(⌊grid·cb/n⌋, ⌊grid·cum/n⌋]`, generated by one sequence-explode
    * (Σ lengths = grid, no |values|×grid join). Global cumulatives come
    * from [[prefixSum]]'s two-pass scan; per-source cumulatives window
    * over COLLAPSED (source, value) counts (the value domain, not rows).
    * Needs grid·n < 2^63.
    *
    * Output: input (source, value) keys resolved per distinct pair:
    * (source, value, pct, value_norm) joined back onto the input rows —
    * output = input columns + (pct, value_norm).
    *
    * @param valueCol integral (LongType-castable) values; scale floats
    *                 to fixed point first (e.g. 6dp quality · 1e6). */
  def quantileNormalize(df: DataFrame, sourceCol: String, valueCol: String,
      grid: Int = 1000): DataFrame = {
    require(grid >= 2, s"grid must be >= 2, got $grid")
    Seq("__v", "__c", "__r", "__n", "pct", "value_norm").foreach { c =>
      require(!df.columns.contains(c),
        s"quantileNormalize uses/emits $c; rename the existing column")
    }
    val d = df.withColumn("__v", col(valueCol).cast("long"))
    // Domain-sized and referenced four times (per-source cum + sizes,
    // global collapse, total) — persist so each reference reads the
    // collapsed table instead of re-scanning the input.
    val counts = d.groupBy(col(sourceCol), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col("__v"))
    // group/global sizes from the COLLAPSED counts — never a second
    // full scan of the input
    val srcCum = counts.withColumn("__r", sum(col("__c")).over(ws))
      .join(counts.groupBy(col(sourceCol)).agg(sum(col("__c")).as("__n")),
        sourceCol :: Nil)
      // inclusive tie-sharing percentile on the grid: ceil(grid·r/n)
      .select(col(sourceCol), col("__v"),
        expr(s"($grid * __r + __n - 1) div __n").as("pct"))
    val g = counts.groupBy(col("__v")).agg(sum(col("__c")).as("__c"))
    val gcum = prefixSum(g, Seq(col("__v")), Seq("__c"))
    val ng = broadcast(g.agg(sum(col("__c")).as("__n")))
    // grid point p maps to value v iff p ∈ (⌊grid·cb/n⌋, ⌊grid·cum/n⌋]
    // Spark's sequence(a, b) DESCENDS when a > b — an empty permille
    // interval must produce an empty array, not a reversed one.
    val gridMap = gcum.crossJoin(ng)
      .withColumn("__lo", expr(s"($grid * (cum___c - __c)) div __n + 1"))
      .withColumn("__hi", expr(s"($grid * cum___c) div __n"))
      .filter(col("__hi") >= col("__lo")) // empty permille interval
      .select(col("__v").as("value_norm"),
        explode(sequence(col("__lo"), col("__hi"))).as("pct"))
    d.join(srcCum, Seq(sourceCol, "__v"))
      .join(broadcast(gridMap), Seq("pct"))
      .select(df.columns.map(col) ++ Seq(col("pct"), col("value_norm")): _*)
  }
}
