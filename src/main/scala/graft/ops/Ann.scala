package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{VecCosine, VecDot, VecSqDist}

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

  // dot/cosine/sqDist are the codegen kernels in functions/VecOps.scala —
  // bit-identical to the `aggregate(zip_with(…))` folds they replace (same
  // ascending-index IEEE accumulation; see the VecOps scaladoc), but fused
  // into whole-stage codegen instead of interpreting two lambda closures
  // per element (the 100× canary showed the embedding batch parked in
  // ZipWith.eval/ArrayAggregate.eval).
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(VecCosine(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2-normalize a vector column (unit length; zero vectors pass through
    * unscaled). Pure per-row arithmetic over the ordered-fold norm, so the
    * result is bit-identical wherever the fold is mirrored.
    *
    * NOTE: the norm subtree is embedded in the per-element lambda — there
    * is no cross-lambda subexpression sharing, so this Column form costs
    * O(dim²) per row. Fine for composition in small expressions; use
    * [[l2NormalizeDf]] on corpus-scale paths. */
  def l2Normalize(v: Column): Column = {
    val n = norm(v)
    transform(v, x => when(n > 0.0, x / n).otherwise(x))
  }

  /** [[l2Normalize]] with the norm evaluated ONCE per row: the norm is
    * materialized as a projected attribute, so the per-element lambda
    * divides by a bound value instead of re-folding the vector — O(dim)
    * per row. Replaces `vecCol` with its normalized (double) form. */
  def l2NormalizeDf(vectors: DataFrame, vecCol: String): DataFrame = {
    require(!vectors.columns.exists(c => c == "__nrm" || c == "__v"),
      "l2NormalizeDf uses internal __v/__nrm columns; rename the existing one")
    val others = vectors.columns.filterNot(_ == vecCol).map(col)
    vectors
      .withColumn("__v", asDouble(col(vecCol)))
      .withColumn("__nrm", norm(col("__v")))
      .select(others :+
        transform(col("__v"),
          x => when(col("__nrm") > 0.0, x / col("__nrm")).otherwise(x))
          .as(vecCol): _*)
  }

  /** Mean-pool vectors per group, in LONG layout (group, dim, mean): the
    * elementwise average of each group's vectors. The per-dimension sum is
    * an ordered fold over the VALUE-SORTED collected values — double
    * addition is not associative, so a plain sum() depends on partition
    * merge order; sorting first fixes one canonical order that any engine
    * reproduces bit-for-bit (decimal accumulation was rejected: the
    * double→decimal cast rounds ties HALF_UP in Spark but HALF_EVEN in
    * DuckDB, and float32 inputs are dyadic rationals that genuinely hit
    * ties). One narrow explode + one hash aggregate keyed (group, dim);
    * the collected list is one double per group MEMBER, so this form is
    * for bounded group sizes (domains, sources, clusters — the pooling
    * use case). Unbounded groups would use a decimal sum and accept
    * last-ulp divergence instead. */
  def meanPool(vectors: DataFrame, groupCol: String, vecCol: String): DataFrame =
    vectors
      .select(col(groupCol).as("grp"),
        posexplode(asDouble(col(vecCol))).as(Seq("dim", "x")))
      .groupBy(col("grp"), col("dim"))
      .agg(sort_array(collect_list(col("x"))).as("__xs"),
        count(lit(1)).as("__n"))
      .select(col("grp"), col("dim"),
        (aggregate(col("__xs"), lit(0.0), (acc, x) => acc + x) /
          col("__n").cast("double")).as("mean"))

  /** Exact covariance sufficient statistics of an embedding column — the
    * distributed half of whitening/PCA prep: per dimension pair (i ≤ j),
    * the pair count, per-dimension sums and the product sum, all over
    * values QUANTIZED to integers (`floor(x · 2^quantBits)`), so every
    * sum is 64-bit exact, order-invariant and engine-identical — the
    * float-summed covariance drifts with reduce order and can't be
    * hash-gated. The driver finishes with the tiny division
    * `(s_ij − s_i·s_j/n)/n / 2^2q` per cell; what's distributed is the
    * one pass over the data.
    *
    * Plan shape: one NARROW projection builds each row's D(D+1)/2
    * quantized products in an array expression (no self-join, no
    * per-row shuffle), then one map-side-combinable hash aggregate to
    * D(D+1)/2 cells. Fine through D of a few hundred; for D in the
    * thousands block the dimensions and aggregate per block pair.
    *
    * Overflow: needs n · 2^(2·quantBits) · max|x|² < 2^63 — at q=20 and
    * |x| ≤ 1 that is ~8 billion rows; drop q as n grows.
    *
    * @return (dim_i, dim_j, n, s_i, s_j, s_ij) with 0-based dims, i ≤ j. */
  def covarianceStats(vectors: DataFrame, vecCol: String,
      quantBits: Int = 20): DataFrame = {
    require(quantBits >= 1 && quantBits <= 30,
      s"quantBits out of range (1..30): $quantBits")
    val scale = math.pow(2.0, quantBits)
    val q = transform(asDouble(col(vecCol)),
      x => floor(x * lit(scale)).cast("long"))
    // Generate ONLY the upper triangle: the inner transform runs over the
    // tail slice starting at i (1-based slice start i+1), so each row
    // builds exactly D(D+1)/2 structs — a full D² + filter doubles the
    // hot projection's work for nothing.
    val pairs = flatten(transform(q, (xi, i) =>
      transform(slice(q, i + lit(1), size(q) - i), (xj, j) =>
        struct(i.as("i"), (i + j).as("j"), (xi * xj).as("p"), xi.as("xi"),
          xj.as("xj")))))
    vectors.select(explode(pairs).as("c"))
      .groupBy(col("c.i").as("dim_i"), col("c.j").as("dim_j"))
      .agg(count(lit(1)).as("n"), sum(col("c.xi")).as("s_i"),
        sum(col("c.xj")).as("s_j"), sum(col("c.p")).as("s_ij"))
  }

  /** Rank a (query_id, vec_id, cos) candidate set down to each query's
    * top-k via the bounded [[TopKAgg]] aggregate — partial-combining, so a
    * query's candidates never need to share one window partition (the
    * ranking-window formulation puts each query's WHOLE corpus in a single
    * task at large Q×N). Output rows and ranks are identical to
    * `row_number() over (partition by query_id order by cos desc, vec_id)`. */
  private def topKRanked(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(TopKAgg.topK(col("cos"), col("vec_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "r")))
      .select(col("query_id"), col("r.id").as("vec_id"), col("r.score").as("cos"),
        (col("pos") + 1).cast("int").as("rank"))

  /** Broadcast-queries exact scoring scaffold shared by [[bruteTopK]] and
    * [[mineHardNegatives]]: every (corpus, query) pair except self —
    * optionally keeping only pairs whose `labelCol` differs from the
    * query's — scored with 6dp-rounded cosine. One definition so the
    * scoring shape (rounding, tiebreak input, broadcast policy) can never
    * drift between the plain and the label-filtered variant. */
  private def exactScored(queries: DataFrame, corpus: DataFrame,
      labelCol: Option[String]): DataFrame = {
    val q = queries.select(
      col("vec_id").as("query_id") +:
        labelCol.map(l => col(l).as("__qlabel")).toSeq :+
        asDouble(col("embedding")).as("qv"): _*)
    val c = corpus.select(
      col("vec_id") +: labelCol.map(col).toSeq :+
        asDouble(col("embedding")).as("cv"): _*)
    val keep = labelCol.foldLeft(col("query_id") =!= col("vec_id")) {
      (acc, l) => acc && col(l) =!= col("__qlabel")
    }
    c.crossJoin(broadcast(q)).filter(keep)
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("vec_id"), col("cos"))
  }

  /** Exact brute-force top-k: for each query row, the k nearest corpus rows
    * by cosine (rounded to 6dp for cross-engine rank stability, id tiebreak). */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    topKRanked(exactScored(queries, corpus, None), k)

  /** Hard-negative mining for contrastive/embedding training: for each
    * query vector, the k nearest corpus vectors whose `labelCol` DIFFERS
    * from the query's — the near-misses that teach the decision boundary
    * (random negatives are mostly trivial; the hard ones sit just across
    * it). Same exact scoring backend as [[bruteTopK]] (6dp-rounded cosine,
    * id tiebreak, bounded map-side [[TopKAgg]] — never a ranking window);
    * at corpus scale swap the exact scorer for the [[lshTopK]] bucketed
    * candidate generator upstream of the label filter, same downstream
    * shape. */
  def mineHardNegatives(queries: DataFrame, corpus: DataFrame,
      labelCol: String, k: Int): DataFrame =
    topKRanked(exactScored(queries, corpus, Some(labelCol)), k)

  /** Symmetrize a directed kNN edge set ((query_id, vec_id, cos) rows from
    * [[bruteTopK]], [[lshTopK]] or [[ivfTopK]]) into MUTUAL undirected
    * edges: (a, b) survives iff a is in b's top-k AND b is in a's — the
    * standard mutual-kNN pruning that strips hub nodes before graph-based
    * clustering/dedup (a hub inside many top-k lists is rarely mutual).
    * One semi join keyed by the id pair; cosine is symmetric and rounded
    * identically on both directions, so either edge's score serves.
    *
    * Output: (id_a, id_b, cos) with id_a < id_b, one row per mutual pair. */
  def mutualEdges(edges: DataFrame): DataFrame = {
    val e = edges.select(col("query_id").as("a"), col("vec_id").as("b"),
      col("cos"))
    val rev = e.select(col("b").as("a"), col("a").as("b"))
    e.join(rev, Seq("a", "b"), "left_semi")
      .filter(col("a") < col("b"))
      .select(col("a").as("id_a"), col("b").as("id_b"), col("cos"))
  }

  /** splitmix64 (Vigna, public domain) — drives the deterministic ±1 plane
    * matrix below. Driver-side so planes become LITERALS in the plan: each
    * per-row bucket costs `planes` literal-array dot products instead of
    * planes×dim per-row hash calls. */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Component i of hyperplane p in table t: ±1 by splitmix64 parity —
    * deterministic, model-free, identical on every executor. Visible to
    * the query layer so the DuckDB oracle can embed the IDENTICAL
    * literals (what upgrades the LSH gate from rows-only to hash-exact). */
  private[graft] def planeVec(t: Int, p: Int, dim: Int): Seq[Double] =
    (0 until dim).map(i =>
      if ((splitmix64((t.toLong * 4096L + p) * 4096L + i) & 1L) == 0L) 1.0 else -1.0)

  /** SRP bucket id of `v` under table t's P hyperplanes (bit p = sign of the
    * dot with plane p). */
  private def tableBucket(v: Column, t: Int, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      when(dot(v, typedLit(planeVec(t, p, dim))) >= 0, shiftleft(lit(1L), p))
        .otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Single-table SRP bucket id from P pseudo-random hyperplanes. */
  def srpBucket(v: Column, dim: Int, planes: Int): Column =
    tableBucket(v, 0, dim, planes)

  /** Corpus size at which the base (planes, tables) geometry applies
    * unchanged — chosen so every oracle-gated scale (≤ sf0.1) keeps its
    * exact historical plan, and scaling engages only on genuinely large
    * corpora. */
  private[ops] val SrpScalePivot: Long = 1L << 13

  /** (planes, tables) for a corpus of `n` vectors: +1 plane per corpus
    * doubling past [[SrpScalePivot]] (constant expected bucket occupancy
    * → O(tables·n) candidates), tables multiplied by (1/a(τ))^extra with
    * a(τ) = 1−arccos(τ)/π to hold per-pair recall at the threshold
    * grade. Caps: 48 planes (bucket id stays a comfortable long; 2^48
    * buckets ≈ 2.8e14 — beyond any realistic corpus), 64 tables (cost
    * guard; reached only past ~10^10 vectors at τ=0.9). */
  private[ops] def scaledSrpGeometry(n: Long, planes: Int, tables: Int,
      threshold: Double): (Int, Int) = {
    if (n <= SrpScalePivot) (planes, tables)
    else {
      // Clamped at 0: a caller whose base geometry already exceeds 48
      // planes passes through unchanged rather than having planes AND
      // tables silently shrunk (pow(1/a, negative) < 1 would cut recall).
      val extra = math.max(0, math.min(
        math.ceil(math.log(n.toDouble / SrpScalePivot) / math.log(2.0)).toInt,
        48 - planes))
      val a = 1.0 - math.acos(math.min(threshold, 0.999999)) / math.Pi
      val tEff = math.min(
        math.ceil(tables * math.pow(1.0 / a, extra.toDouble)).toInt, 64)
      (planes + extra, tEff)
    }
  }

  /** Deterministic ±1 sign matrix for [[randomProject]]: outDim rows of
    * inDim signs from the same splitmix64 parity generator as the SRP
    * planes, in a disjoint key namespace (t ≥ 2048 — LSH tables use small
    * t). Public so an oracle can embed the IDENTICAL literals. */
  def projectionSigns(outDim: Int, inDim: Int): Seq[Seq[Double]] = {
    require(outDim > 0 && outDim <= 1024, s"outDim out of range: $outDim")
    (0 until outDim).map(j => planeVec(2048 + j, 0, inDim))
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions with a
    * ±1/√outDim matrix (Achlioptas 2003 — database-friendly projections):
    * preserves pairwise distances within (1±ε) w.h.p. while cutting the
    * vector bytes `inDim/outDim`-fold — the standard pre-shrink before an
    * ANN index or a near-dup pass at corpus scale. Pure narrow per-row
    * arithmetic (no shuffle, no model to train or broadcast); the matrix is
    * regenerated from arithmetic on both sides of any engine boundary.
    *
    * Each output component is an explicit left-associated ± chain over the
    * input elements — one canonical float order, so results are
    * bit-reproducible across engines (and ±1·x is exact). Output is LONG
    * layout (id, dim, x) with x 6dp-rounded; pick outDim a power of 4 and
    * the 1/√outDim scale stays IEEE-exact. */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int): DataFrame = {
    require(inDim > 0 && outDim > 0 && outDim <= inDim,
      s"need 0 < outDim <= inDim, got ($inDim, $outDim)")
    require(!df.columns.contains("__v"),
      "randomProject uses an internal __v column; rename the existing one")
    val signs = projectionSigns(outDim, inDim)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    // Each dim is one VecDot against its literal sign vector — the same
    // 0.0-seeded ascending-index accumulation as an unrolled ± chain
    // (±1·x is exact, 0.0+x ≡ x), but as ONE compact kernel per dim: an
    // unrolled outDim×inDim element_at tree would blow whole-stage
    // codegen's 64 KB method cap and drop the stage to interpreted mode.
    val dims = signs.zipWithIndex.map { case (row, j) =>
      val sgn = array(row.map(s => lit(s.toDouble)): _*)
      val d = dot(col("__v"), sgn)
      struct(lit(j).as("dim"), round(d * lit(scale), 6).as("x"))
    }
    df.withColumn("__v", asDouble(col(vecCol)))
      .select(col(idCol), explode(array(dims: _*)).as("__d"))
      .select(col(idCol), col("__d.dim").as("dim"), col("__d.x").as("x"))
  }

  /** Multi-table SRP bucket ids: `tables` independent plane sets; a pair
    * collides if it shares ANY table's bucket — the standard recall
    * amplifier (recall ≈ 1-(1-p^P)^L). */
  def srpBuckets(v: Column, dim: Int, planes: Int, tables: Int): Column =
    array((0 until tables).map { t =>
      struct(lit(t).as("t"), tableBucket(v, t, dim, planes).as("b"))
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
    topKRanked(scored, k)
  }

  /** Deterministic k-means-lite centroids for IVF, trained on a BOUNDED
    * sample: ONE corpus scan takes the `maxTrain` rows with the smallest
    * (xxhash64(vec_id), vec_id) — a distributed top-k (per-partition heads
    * merged on the driver), i.e. a uniform-ish deterministic sample whose
    * size is fixed no matter the corpus size — then Lloyd iterations run
    * driver-local over that sample (≤ maxTrain × dim doubles). No per-
    * iteration cluster scans or collects; the corpus is touched exactly
    * once for training. Summation runs in ascending-vec_id order, so
    * centroids are identical under any partitioning. */
  def kmeansCentroids(corpus: DataFrame, dim: Int, c: Int,
      iters: Int, maxTrain: Int = 2048): Array[Array[Double]] =
    lloyd(boundedSample(corpus, maxTrain), dim, c, iters)

  /** The ONE corpus scan both k-means trainers share: the `maxTrain` rows
    * with the smallest (xxhash64(vec_id), vec_id), returned in ascending
    * vec_id order so downstream folds are partition-invariant. */
  private def boundedSample(corpus: DataFrame,
      maxTrain: Int): Array[Array[Double]] =
    corpus
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(maxTrain)
      .collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)

  /** Driver-local Lloyd iterations over an in-memory sample (first-c init,
    * strict-< nearest with lowest-index ties, empty cells keep their
    * centroid, fixed sample order — fully deterministic). */
  private def lloyd(sample: Array[Array[Double]], dim: Int, c: Int,
      iters: Int): Array[Array[Double]] = {
    require(sample.length >= c, s"need at least $c training vectors")

    def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var i = 0
      while (i < cents.length) {
        var d = 0.0; var j = 0
        val cen = cents(i)
        while (j < dim) { val t = v(j) - cen(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = i } // strict < : ties keep lowest idx
        i += 1
      }
      best
    }

    var centroids = sample.take(c).map(_.clone())
    (1 to iters).foreach { _ =>
      val sums = Array.fill(c)(new Array[Double](dim))
      val counts = new Array[Long](c)
      sample.foreach { v => // fixed ascending-vec_id order
        val cl = nearest(v, centroids)
        counts(cl) += 1
        var j = 0
        while (j < dim) { sums(cl)(j) += v(j); j += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        if (counts(i) == 0) old // empty cell keeps its centroid
        else sums(i).map(_ / counts(i))
      }
    }
    centroids
  }

  /** Centroids = the corpus vectors at `ids`, ordered by vec_id (bounded
    * collect — |ids| rows). The deterministic, training-free centroid
    * source the IVF gate shares with its DuckDB oracle. */
  def fixedCentroids(corpus: DataFrame, ids: Seq[Long]): Array[Array[Double]] = {
    val rows = corpus.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .collect().sortBy(_.getLong(0))
    require(rows.length == ids.distinct.length,
      s"fixedCentroids: expected ${ids.distinct.length} ids, found ${rows.length}")
    rows.map(_.getSeq[Double](1).toArray)
  }

  /** Index of the nearest centroid by squared L2 (argmin via array_min over
    * (dist, idx) structs — deterministic tiebreak on idx). */
  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (cen, i) =>
      val d = sqDist(v, typedLit(cen.toSeq))
      struct(d.as("d"), lit(i).as("i"))
    }
    array_min(array(scored: _*)).getField("i")
  }

  /** IVF top-k: corpus partitioned by nearest centroid; each query probes
    * its `nprobe` nearest centroid cells and ranks exactly within them.
    * The trained-clustering alternative to SRP-LSH (better cell balance on
    * clustered data; needs the small training pass). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      c: Int = 16, nprobe: Int = 4, iters: Int = 3): DataFrame =
    ivfSearch(queries, corpus, kmeansCentroids(corpus, dim, c, iters), k, nprobe)

  /** The IVF SEARCH path with the centroid table supplied by the caller —
    * cell assignment, nprobe probing and in-cell exact ranking, independent
    * of how the centroids were trained. [[ivfTopK]] feeds it k-means
    * centroids; the correctness gate feeds FIXED corpus vectors so the
    * whole search becomes SQL-mirrorable (the Lloyd loop is the only part
    * an oracle can't express). */
  def ivfSearch(queries: DataFrame, corpus: DataFrame,
      centroids: Array[Array[Double]], k: Int, nprobe: Int): DataFrame = {
    val cIdx = corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
      .withColumn("cell", nearestCentroid(col("cv"), centroids))
    // query → nprobe nearest cells (driver-free: explode a scored struct
    // array, rank with a window).
    val probeScored = centroids.zipWithIndex.map { case (cen, i) =>
      val d = sqDist(col("qv"), typedLit(cen.toSeq))
      struct(d.as("d"), lit(i).as("i"))
    }
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
      .withColumn("probe", explode(slice(array_sort(array(probeScored: _*)), 1, nprobe)))
      .select(col("query_id"), col("qv"), col("probe.i").as("cell"))
    val scored = cIdx.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    topKRanked(scored, k)
  }

  // --------------------------------------------------- product quantization

  /** Squared-L2 distance as the same 0.0-seeded left fold as [[dot]] —
    * IEEE-identical wherever the fold is mirrored. */
  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.column(VecSqDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Exact brute-force top-k by squared L2 (6dp-rounded, id tiebreak) —
    * the distance-metric sibling of [[bruteTopK]] and the recall baseline
    * for the ADC-approximate PQ path. */
  def bruteTopKL2(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("dist", round(sqDist(col("qv"), col("cv")), 6))
    topKByDist(scored, k)
  }

  /** [[topKRanked]] for ascending distances: ranks by (dist asc, id asc)
    * through the same bounded partial-combining [[TopKAgg]] (score fed as
    * −dist so the aggregate's descending order is distance-ascending). */
  private def topKByDist(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(TopKAgg.topK(-col("dist"), col("vec_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "r")))
      .select(col("query_id"), col("r.id").as("vec_id"),
        (-col("r.score")).as("dist"),
        (col("pos") + 1).cast("int").as("rank"))

  /** Product-quantization codebooks TRAINED per subspace: the bounded
    * deterministic sample is sliced into `m` contiguous dim/m-wide
    * subvectors and each subspace runs its own driver-local Lloyd loop —
    * one corpus scan total, like [[kmeansCentroids]]. */
  def pqCodebooks(corpus: DataFrame, dim: Int, m: Int, c: Int, iters: Int,
      maxTrain: Int = 2048): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val sample = boundedSample(corpus, maxTrain)
    Array.tabulate(m) { mi =>
      lloyd(sample.map(_.slice(mi * dsub, (mi + 1) * dsub)), dsub, c, iters)
    }
  }

  /** Training-free PQ codebooks for the correctness gate: subspace `mi`'s
    * codebook is the `mi`-th slice of the corpus vectors at `ids` (sorted
    * by vec_id) — the same fixed-centroid trick [[ivfSearch]]'s gate uses,
    * which makes the whole encode+ADC pipeline SQL-mirrorable. */
  def pqFixedCodebooks(corpus: DataFrame, ids: Seq[Long],
      m: Int): Array[Array[Array[Double]]] = {
    val full = fixedCentroids(corpus, ids)
    val dim = full.head.length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    Array.tabulate(m) { mi => full.map(_.slice(mi * dsub, (mi + 1) * dsub)) }
  }

  /** PQ top-k via asymmetric distance (ADC): every corpus vector is encoded
    * once — per subspace, the nearest codebook entry by subvector L2
    * (strict argmin, lowest index on ties) — and queries rank candidates by
    * the exact L2 to the RECONSTRUCTION x̂ (mathematically identical to the
    * classic per-subspace lookup-table sum, but evaluated as one 64-dim
    * fold so the float order is mirrorable). Encoding is one narrow
    * codegen'd projection (m·c small folds per row, no shuffle); memory per
    * corpus row at serving time is m codes instead of dim floats — the
    * compression that lets a 100 TB corpus's index fit a cluster's RAM.
    * Approximate by construction; gate recall against [[bruteTopKL2]]. */
  def pqTopK(queries: DataFrame, corpus: DataFrame,
      books: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val m = books.length
    val dsub = books.head.head.length
    // per-subspace argmin struct carries the winning centroid itself;
    // (d, i) is a unique sort key, so the array field never drives ordering
    def pick(v: Column, mi: Int): Column = {
      val sub = slice(v, mi * dsub + 1, dsub)
      val scored = books(mi).zipWithIndex.map { case (cen, ci) =>
        val cenLit = typedLit(cen.toSeq)
        struct(sqDist(sub, cenLit).as("d"), lit(ci).as("i"),
          cenLit.as("cen"))
      }
      array_min(array(scored: _*))
    }
    val enc = corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
      .withColumn("xhat",
        flatten(array((0 until m).map(mi =>
          pick(col("cv"), mi).getField("cen")): _*)))
      .select(col("vec_id"), col("xhat"))
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
    val scored = enc.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("dist", round(sqDist(col("qv"), col("xhat")), 6))
    topKByDist(scored, k)
  }

  /** Embedding near-dup pairs: cosine ≥ threshold, EXACT output either way.
    *
    * planes>0 (the scale path): banded multi-table SRP generates candidate
    * pairs — only ids ride the band self-join (vectors are joined back for
    * the surviving distinct pairs only, the same ids-only discipline as
    * minhash) — and every candidate is exactly verified, so the output is a
    * provable subset of the true ≥threshold pairs; recall is 1-(1-p^P)^L
    * per pair, ≈1 for genuine near-dups (OpsSpec asserts set-equality with
    * the exact path on the gate corpus). Banding only separates at HIGH
    * thresholds: a cos-0.3 pair agrees with a plane with prob 0.6, so
    * recall-1 banding at τ=0.3 degenerates to all-pairs — for τ ≲ 0.7 use
    * planes=0.
    *
    * planes=0: exact all-pairs as a PARALLEL crossJoin (left side
    * repartitioned across the cluster, right side broadcast — never a
    * single-task constant-key join). O(N²): correct, and only for corpora
    * small enough to square.
    *
    * PLANE SCALING (the 100× canary's finding): with FIXED planes the
    * expected candidate count is L·N²/2^P — quadratic in corpus size, the
    * same key-space-saturation defect class as the round-9 SimHash 8-bit
    * chunks (measured 35×/10×-step at 100× sf0.1). `planes`/`tables` are
    * therefore the BASE geometry at the pivot size (8192 vectors); above
    * it every corpus doubling adds one plane (bucket occupancy stays
    * constant → candidates stay O(L·N)) and multiplies tables by
    * 1/a(τ) = 1/(1−arccos(τ)/π) — exactly the factor one plane costs a
    * threshold-grade pair's per-table collision probability, so per-pair
    * recall AT τ is held ≈constant (genuine near-dups, cos ≫ τ, stay
    * ≈1: a planted cos-0.9999 pair at P=19,L=18 misses with p≈4e-26).
    * Candidates grow as N^(1+log2(1/a)) — N^1.22 at τ=0.9 — and the
    * per-row hash cost as L·P = O(log² N); both are the documented price
    * of bounded bucket occupancy. Sizing is driven by ONE count() of the
    * corpus (the AQE pattern: a cheap stats job before the plan). */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
      dim: Int, planes: Int = 0, tables: Int = 1): DataFrame = {
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    if (planes > 0) {
      val (pEff, tEff) = scaledSrpGeometry(c.count(), planes, tables, threshold)
      val keyed = c.select(col("vec_id"),
        explode(srpBuckets(col("v"), dim, pEff, tEff)).as("bucket"))
      val candidates = keyed.select(col("bucket"), col("vec_id").as("id_a"))
        .join(keyed.select(col("bucket"), col("vec_id").as("id_b")), Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .distinct() // a pair may collide in several tables
      // Filter on the UNROUNDED cosine — the DuckDB oracle applies the raw
      // `cos >= t` predicate, so rounding before the filter would admit
      // values in [t - 5e-7, t). Round only the emitted score column.
      candidates
        .join(c.select(col("vec_id").as("id_a"), col("v").as("va")), Seq("id_a"))
        .join(c.select(col("vec_id").as("id_b"), col("v").as("vb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          cosine(col("va"), col("vb")).as("raw_cos"))
        .filter(col("raw_cos") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("raw_cos"), 6).as("cos"))
    } else {
      val par = corpus.sparkSession.sparkContext.defaultParallelism
      c.select(col("vec_id").as("id_a"), col("v").as("va")).repartition(par)
        .crossJoin(broadcast(c.select(col("vec_id").as("id_b"), col("v").as("vb"))))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          cosine(col("va"), col("vb")).as("raw_cos"))
        .filter(col("raw_cos") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("raw_cos"), 6).as("cos"))
    }
  }

  // ------------------------------------------------------------ quantization

  /** Symmetric int8 quantization, per-vector max-abs scale: 4× smaller
    * embeddings for ANN candidate generation (exact re-rank stays on the
    * float originals). Pure per-row work. Rounding is written as
    * `floor(x·127/scale + 0.5)` — an explicit formula with identical IEEE
    * semantics on every engine, instead of round(), whose half-way rule
    * (even vs away-from-zero) differs across engines. Zero vectors get
    * scale 1 (all components quantize to 0). */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    val maxAbs = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    val scale = when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs)
    emb.select(col(idCol).as("id"), v.as("v"), scale.as("scale"))
      .select(col("id"), col("scale"),
        transform(col("v"), x =>
          floor(x * lit(127.0) / col("scale") + lit(0.5)).cast("int")).as("qvec"))
  }

  /** [[quantizeInt8]] with the int8 vector rendered as a comma-joined string
    * — the hash-compare-friendly shape for the oracle gate (array columns
    * don't row-sort). */
  def quantizeInt8Rendered(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    quantizeInt8(emb, idCol, vecCol)
      .select(col("id"), col("scale"),
        concat_ws(",", transform(col("qvec"), _.cast("string"))).as("qvec"))

  /** Top principal direction of the embedding corpus by `iters` fixed
    * power iterations on the sample covariance, built from
    * [[covarianceStats]]' EXACT integer sufficient statistics — the
    * corpus-geometry readout (dominant axis + its explained-variance
    * share) a curation pass uses to detect collapsed or anisotropic
    * embedding spaces.
    *
    * Scale split: the input-scale work is the ONE covariance aggregate;
    * the D(D+1)/2 triangle (guarded) collects to the driver and the
    * matvec loop runs locally — the Lloyd shape, iteration cost O(D²)
    * regardless of corpus size. Determinism: covariance cells are double
    * expressions over exactly-represented longs (mirrored operand
    * order), every matvec/norm sum is an exact decimal sum of
    * 12dp-rounded terms (BigDecimal HALF_UP = Spark/DuckDB `round`), and
    * the sign is fixed by the largest-|loading| dimension — so an engine
    * unrolling the same recurrence reproduces identical bits.
    *
    * @param stats output of [[covarianceStats]] (same `quantBits`).
    * @return (dim, loading, explained_ratio): `iters`-step dominant unit
    *         vector (6dp, sign-normalized) and λ₁/trace (6dp). */
  def topPrincipalDirection(stats: DataFrame, iters: Int = 15,
      quantBits: Int = 20): DataFrame = {
    require(iters >= 1 && iters <= 60, s"iters out of range: $iters")
    import java.math.{BigDecimal => JBD, RoundingMode}
    val spark = stats.sparkSession
    val tri = stats.select(col("dim_i").cast("int"), col("dim_j").cast("int"),
      col("n").cast("long"), col("s_i").cast("long"),
      col("s_j").cast("long"), col("s_ij").cast("long")).collect()
    require(tri.length <= (1 << 20),
      s"topPrincipalDirection: ${tri.length} cells exceed the driver bound")
    val dims = tri.map(_.getInt(0)).distinct.sorted
    val d = dims.length
    require(dims.sameElements(0 until d),
      s"expected contiguous 0-based dims, got ${dims.take(5).mkString(",")}…")
    val q2 = math.pow(2.0, 2.0 * quantBits)
    def rd(x: Double, s: Int): JBD =
      JBD.valueOf(x).setScale(s, RoundingMode.HALF_UP)
    // cov in double with MIRRORED operand order: (n·s_ij − s_i·s_j) /
    // (n·(n−1)) / 2^(2q). The longs are < 2^53, so the casts are exact
    // and every IEEE op lands on the same bits in any engine.
    val cov = Array.ofDim[Double](d, d)
    tri.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val n = r.getLong(2).toDouble
      val c = (n * r.getLong(5).toDouble -
        r.getLong(3).toDouble * r.getLong(4).toDouble) /
        (n * (n - 1.0)) / q2
      cov(i)(j) = c
      cov(j)(i) = c
    }
    var v = Array.fill(d)(rd(1.0 / math.sqrt(d.toDouble), 12))
    var w = Array.fill(d)(JBD.ZERO)
    for (_ <- 1 to iters) {
      val vd = v.map(_.doubleValue)
      w = Array.tabulate(d) { i =>
        (0 until d).map(j => rd(cov(i)(j) * vd(j), 12))
          .reduce(_ add _)
      }
      val wd = w.map(_.doubleValue)
      val nrm = math.sqrt(
        wd.map(x => rd(x * x, 12)).reduce(_ add _).doubleValue)
      v = wd.map(x => rd(x / nrm, 12))
    }
    val vd = v.map(_.doubleValue)
    val t = Array.tabulate(d) { i =>
      (0 until d).map(j => rd(cov(i)(j) * vd(j), 12)).reduce(_ add _)
        .doubleValue
    }
    val lam = vd.indices.map(i => rd(vd(i) * t(i), 12))
      .reduce(_ add _).doubleValue
    val trace = (0 until d).map(i => rd(cov(i)(i), 12))
      .reduce(_ add _).doubleValue
    val top = vd.indices.minBy(i => (-math.abs(vd(i)), i))
    val sg = if (vd(top) < 0) -1.0 else 1.0
    val explained = rd(lam / trace, 6).doubleValue
    val out = dims.map(i =>
      (i, rd(sg * vd(i), 6).doubleValue, explained))
    spark.createDataFrame(out.toSeq)
      .toDF("dim", "loading", "explained_ratio")
  }
}
