package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Oracle-expressible sketches — the approximation arithmetic is plain
  * integer/double math over the fixed multiplicative hash
  * [[Shaping.knuth32]], so a second engine re-derives the ESTIMATES
  * bit-for-bit. These are the companion gates to the register-state
  * sketches (HLL++/KLL in agg_sketch_accuracy, murmur Count-Min in
  * profile_cm_topk) whose binary states are not SQL-expressible: same
  * algorithmic families, independently checkable numbers.
  *
  * Scale notes (100 TB):
  *  - KMV distinct: the bottom-k hash set is a bounded (k·8-byte)
  *    commutative aggregate carried by [[TopKAgg]], so it combines
  *    map-side — one shuffle of ≤k values per group, never a global
  *    sort of the distinct-hash set. The `distinct()` feeding it is the
  *    same partial-aggregate shape as countDistinct's first phase.
  *  - Count-Min: the sketch is d·w cells built by ONE groupBy over the
  *    (already aggregated) key counts; lookups broadcast the ≤d·w-row
  *    sketch. Estimates only ever touch d cells per key.
  *  - The 32-bit multiplicative hash is the ORACLE-PARITY choice, not
  *    the production one: at 10^10+ distinct keys, swap knuth32 for
  *    xxhash64 (same code shape, 64-bit space) — the gate pins the
  *    estimator algebra, which is hash-width independent.
  */
object Sketch {

  /** 2^32 — the knuth32 hash space; KMV normalizes ranks against it. */
  val HashSpace: Double = 4294967296.0

  private val P = 1000000007L

  /** Salted 32-bit row hashes for the Count-Min gate: (key mod p)·a mod
    * 2^32 with four fixed odd multipliers (xxhash/Knuth primes). The
    * products stay < 3.3e18 (< 2^63), so DuckDB's checked BIGINT
    * arithmetic reproduces them without overflow. */
  val CmSalts: Seq[Long] =
    Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)

  private def rowHash(key: Column, a: Long): Column =
    pmod(pmod(key, lit(P)) * lit(a), lit(4294967296L))

  /** K-minimum-values distinct-count estimate per group (Bar-Yossef et
    * al. 2002): hash every key, keep the k smallest distinct hash values,
    * estimate D ≈ (k−1)·2^32 / h_(k) — or the exact distinct-hash count
    * when the group holds fewer than k. Output: (groupCol, n_hashes,
    * kmv_distinct). */
  def kmvDistinct(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val hashed = df
      .select(col(groupCol), Shaping.knuth32(col(keyCol)).as("__h"))
      .distinct()
    // Bottom-k via the bounded TopKAgg buffer (score = −h ⇒ h ascending;
    // hashes are distinct post-distinct(), so the id tiebreak is inert).
    hashed.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_hashes"),
        TopKAgg.topK(-col("__h").cast("double"), col("__h"), k).as("__bot"))
      .select(col(groupCol), col("n_hashes"),
        when(col("n_hashes") < k, col("n_hashes").cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble * HashSpace) /
              element_at(col("__bot"), k).getField("id").cast("double"), 6))
          .as("kmv_distinct"))
  }

  /** Count-Min sketch table (r, bucket, c) over per-key counts: row r
    * buckets key by the salted hash mod `width`; c = Σ counts landing in
    * the cell. Built from the AGGREGATED key counts (keys ≪ rows), so the
    * explode factor d applies to the key table only. */
  def cmSketch(df: DataFrame, keyCol: String, width: Int): DataFrame = {
    val keyCounts = df
      .groupBy(col(keyCol).cast("long").as("__key"))
      .agg(count(lit(1)).as("__cnt"))
    val cells = CmSalts.zipWithIndex.map { case (a, r) =>
      struct(lit(r).as("r"),
        pmod(rowHash(col("__key"), a), lit(width.toLong)).as("bucket"))
    }
    keyCounts
      .select(col("__cnt"), explode(array(cells: _*)).as("__cell"))
      .groupBy(col("__cell.r").as("r"), col("__cell.bucket").as("bucket"))
      .agg(sum(col("__cnt")).as("c"))
  }

  /** Point estimates from a [[cmSketch]] table: est(key) = min over the
    * d rows of the cell the key hashes to. `keys` must carry a long-castable
    * `key` column; the ≤ d·width-cell sketch broadcasts. */
  def cmEstimate(keys: DataFrame, sketch: DataFrame, width: Int): DataFrame = {
    val cells = CmSalts.zipWithIndex.map { case (a, r) =>
      struct(lit(r).as("r"),
        pmod(rowHash(col("key").cast("long"), a), lit(width.toLong))
          .as("bucket"))
    }
    keys
      .select(col("key"), explode(array(cells: _*)).as("__cell"))
      .select(col("key"), col("__cell.r").as("r"),
        col("__cell.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy(col("key"))
      .agg(min(col("c")).as("cm_est"))
  }
}
