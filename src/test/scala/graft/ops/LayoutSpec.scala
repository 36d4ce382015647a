package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout specs: hand-computed Morton keys, and the locality
  * property that motivates the clustering — per-partition bounding boxes
  * after clusterByZ cover a small fraction of the value space (an
  * unclustered layout's partitions each span nearly all of it). */
class LayoutSpec extends SparkSpec {

  test("zkey: hand-computed Morton interleave") {
    import spark.implicits._
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Layout.zkey(col("x"), col("y"), 16).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(3,5): x bits 0,1 -> positions 0,2 (1+4); y bits 0,2 -> positions 1,5
    // (2+32) = 39. z(65535,65535) = 2^32 - 1.
    assert(out == Seq(0L, 1L, 2L, 39L, 4294967295L))
  }

  test("zkeyBounded folds out-of-range inputs") {
    import spark.implicits._
    val z = Seq((65536L + 3L, 65536L + 5L)).toDF("x", "y")
      .select(Layout.zkeyBounded(col("x"), col("y"), 16).as("z"))
      .head().getLong(0)
    assert(z == 39L)
  }

  test("clusterByZ: partitions cover compact rectangles of the value space") {
    import spark.implicits._
    // 64x64 uniform grid, clustered into 16 partitions.
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val clustered = Layout.clusterByZ(grid, "x", "y", numPartitions = 16, bits = 6)
    val boxes = clustered
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect()
    assert(boxes.length == 16)
    val sumArea = boxes.map(r => (r.getAs[Long]("x1") - r.getAs[Long]("x0") + 1) *
      (r.getAs[Long]("y1") - r.getAs[Long]("y0") + 1).toDouble).sum
    // Total space is 64*64 = 4096. Sixteen partitions each spanning the full
    // space would sum to 65536; ideal Z clustering sums to ~4096 (disjoint
    // rectangles). Require within 2x of ideal — far below any unclustered
    // layout.
    assert(sumArea <= 2.0 * 4096,
      s"partitions not localized: bounding boxes sum to $sumArea")
    // And the whole grid survives the reshuffle.
    assert(clustered.count() == 4096)
  }

  test("shuffleDeterministic: a permutation, stable, and order-decorrelated") {
    import spark.implicits._
    val d = (0L until 1000L).toDF("doc_id")
    val s1 = Shaping.shuffleDeterministic(d, "doc_id", shards = 4).collect()
    // Every id exactly once; positions within a shard are 1..n contiguous.
    assert(s1.map(_.getAs[Long]("id")).toSet == (0L until 1000L).toSet)
    s1.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val ps = rows.map(_.getAs[Long]("pos")).sorted
      assert(ps.toSeq == (1L to ps.length).toSeq)
    }
    // Deterministic under a different input partitioning.
    val s2 = Shaping.shuffleDeterministic(d.repartition(7), "doc_id", shards = 4)
      .collect()
    assert(s1.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      s2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // Anti-curriculum: consecutive ids rarely stay adjacent. In id order,
    // check how many consecutive-id pairs land in the same shard at
    // adjacent positions — should be almost none.
    val byId = s1.map(r => r.getAs[Long]("id") -> (r.getAs[Long]("shard"), r.getAs[Long]("pos"))).toMap
    val adjacent = (0L until 999L).count { i =>
      val (sa, pa) = byId(i); val (sb, pb) = byId(i + 1)
      sa == sb && math.abs(pa - pb) == 1
    }
    assert(adjacent < 20, s"$adjacent consecutive-id pairs stayed adjacent")
  }

  test("withHilbert: order-1 quadrant map matches the curve definition") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
    val got = Layout.withHilbert(pts, col("x"), col("y"), 1, "d")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L,
      (1L, 1L) -> 2L, (1L, 0L) -> 3L))
  }

  test("withHilbert: full order-3 grid is a permutation with unit steps") {
    import spark.implicits._
    // The DEFINING property of the Hilbert curve, checked from first
    // principles: over the full 8x8 grid the index is a bijection onto
    // 0..63 and EVERY consecutive pair of cells is grid-adjacent
    // (|dx| + |dy| = 1) - Morton keys fail this at bit boundaries.
    val grid = (for (x <- 0 until 8; y <- 0 until 8)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val m = Layout.withHilbert(grid, col("x"), col("y"), 3, "d")
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1))))
      .toMap
    assert(m.keySet == (0L until 64L).toSet, "not a bijection onto 0..63")
    (0L until 63L).foreach { d =>
      val (x1, y1) = m(d); val (x2, y2) = m(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step $d -> ${d + 1} jumps: ($x1,$y1) -> ($x2,$y2)")
    }
  }
}
