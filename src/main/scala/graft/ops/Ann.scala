package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set and
  * scan the corpus once; exact, embarrassingly parallel, the right answer up
  * to ~10⁸ corpus × few queries.
  *
  * Scale path: signed-random-projection LSH — P deterministic pseudo-random
  * hyperplanes (xxhash-derived ±1 components, no stored model) bucket the
  * corpus; queries probe only their own bucket. Sub-linear candidate sets,
  * tunable recall via P; bucket skew is bounded because SRP buckets are
  * balanced in expectation. An IVF variant would cluster instead of hash —
  * SRP chosen because it needs no training pass.
  *
  * All arithmetic in double with left-to-right array folds (deterministic
  * summation order — reproducible scores on any partitioning).
  */
object Ann {

  /** Array[Float] → Array[Double] (compute in double everywhere). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k: for each query row, the k nearest corpus rows
    * by cosine (rounded to 6dp for cross-engine rank stability, id tiebreak). */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** SRP bucket id from P pseudo-random hyperplanes. Plane p's component i
    * is ±1 by xxhash64(p, i) parity — deterministic, model-free. */
  def srpBucket(v: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val plane = transform(sequence(lit(0), lit(dim - 1)),
        i => when(pmod(xxhash64(lit(p), i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0)))
      when(dot(v, plane) >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Multi-table SRP bucket ids: `tables` independent plane sets (plane
    * hashes salted by table id); a pair collides if it shares ANY table's
    * bucket — the standard recall amplifier (recall ≈ 1-(1-p^P)^L). */
  def srpBuckets(v: Column, dim: Int, planes: Int, tables: Int): Column =
    array((0 until tables).map { t =>
      val bits = (0 until planes).map { p =>
        val plane = transform(sequence(lit(0), lit(dim - 1)),
          i => when(pmod(xxhash64(lit(t * 1000 + p), i), lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0)))
        when(dot(v, plane) >= 0, shiftleft(lit(1L), p)).otherwise(0L)
      }
      struct(lit(t).as("t"),
        bits.reduce(_.bitwiseOR(_)).as("b"))
    }: _*)

  /** Bucketed ANN top-k: candidates restricted to rows sharing any of the
    * query's L table-buckets. Approximate (recall < 1, tunable via
    * planes/tables); verify recall against bruteTopK on samples. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int, planes: Int = 8, tables: Int = 4): DataFrame = {
    def keyed(df: DataFrame, idAs: String, vAs: String) =
      df.select(col("vec_id").as(idAs), asDouble(col("embedding")).as(vAs))
        .select(col(idAs), col(vAs),
          explode(srpBuckets(col(vAs), dim, planes, tables)).as("bucket"))
    val q = keyed(queries, "query_id", "qv")
    val c = keyed(corpus, "vec_id", "cv")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("qv"), col("cv"))
      .distinct() // a pair may collide in several tables
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** Deterministic k-means-lite centroids for IVF: seeded from the first C
    * vectors by id, refined with `iters` Lloyd iterations (assign → mean).
    * Centroids live on the driver (C × dim doubles) and broadcast into the
    * assignment expression — no ML-lib dependency, no stored model. */
  def kmeansCentroids(corpus: DataFrame, dim: Int, c: Int,
      iters: Int): Array[Array[Double]] = {
    val vecs = corpus.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .persist() // scanned 1 + iters times during training
    try {
      var centroids: Array[Array[Double]] = vecs.orderBy(col("vec_id")).limit(c)
        .collect().map(_.getSeq[Double](1).toArray)
      (1 to iters).foreach { _ =>
        val assigned = vecs.withColumn("cluster", nearestCentroid(col("v"), centroids))
        // Component sums go through DECIMAL so centroid means are identical
        // under any partitioning (double sums are addition-order sensitive,
        // and a last-ulp centroid shift can flip boundary cell assignments).
        val sums = assigned.groupBy(col("cluster"))
          .agg(count(lit(1)).as("n"),
            array((0 until dim).map(i =>
              sum(element_at(col("v"), i + 1).cast("decimal(28,12)"))
                .cast("double")): _*).as("s"))
          .collect()
        val next = centroids.clone()
        sums.foreach { r =>
          val cl = r.getInt(0)
          val n = r.getLong(1).toDouble
          next(cl) = r.getSeq[Double](2).map(_ / n).toArray
        }
        centroids = next
      }
      centroids
    } finally vecs.unpersist()
  }

  /** Index of the nearest centroid by squared L2 (argmin via array_min over
    * (dist, idx) structs — deterministic tiebreak on idx). */
  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (cen, i) =>
      val lit_ = typedLit(cen.toSeq)
      val d = aggregate(zip_with(v, lit_, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
      struct(d.as("d"), lit(i).as("i"))
    }
    array_min(array(scored: _*)).getField("i")
  }

  /** IVF top-k: corpus partitioned by nearest centroid; each query probes
    * its `nprobe` nearest centroid cells and ranks exactly within them.
    * The trained-clustering alternative to SRP-LSH (better cell balance on
    * clustered data; needs the small training pass). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      c: Int = 16, nprobe: Int = 4, iters: Int = 3): DataFrame = {
    val centroids = kmeansCentroids(corpus, dim, c, iters)
    val cIdx = corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
      .withColumn("cell", nearestCentroid(col("cv"), centroids))
    // query → nprobe nearest cells (driver-free: explode a scored struct
    // array, rank with a window).
    val probeScored = centroids.zipWithIndex.map { case (cen, i) =>
      val lit_ = typedLit(cen.toSeq)
      val d = aggregate(zip_with(col("qv"), lit_, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
      struct(d.as("d"), lit(i).as("i"))
    }
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
      .withColumn("probe", explode(slice(array_sort(array(probeScored: _*)), 1, nprobe)))
      .select(col("query_id"), col("qv"), col("probe.i").as("cell"))
    val scored = cIdx.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** Embedding near-dup pairs: cosine ≥ threshold. planes=0 → exact
    * all-pairs as a PARALLEL crossJoin (left side repartitioned across the
    * cluster, right side broadcast — never a single-task constant-key join);
    * planes>0 → SRP-bucketed candidates for corpora too big to square. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
      dim: Int, planes: Int = 0): DataFrame = {
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val pairs =
      if (planes > 0) {
        val keyed = c.withColumn("bucket", srpBucket(col("v"), dim, planes))
        keyed.select(col("bucket"), col("vec_id").as("id_a"), col("v").as("va"))
          .join(keyed.select(col("bucket"), col("vec_id").as("id_b"), col("v").as("vb")),
            Seq("bucket"))
      } else {
        val par = corpus.sparkSession.sparkContext.defaultParallelism
        c.select(col("vec_id").as("id_a"), col("v").as("va")).repartition(par)
          .crossJoin(broadcast(c.select(col("vec_id").as("id_b"), col("v").as("vb"))))
      }
    pairs.filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
