package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, ordered by cost:
  *
  *  - exact: one hash-aggregate on a content fingerprint — the cheapest and
  *    the first pass at 100 TB (pure map-side-combinable groupBy);
  *  - MinHash+LSH: shingle → k-minhash signature → banded bucket join; only
  *    same-bucket pairs are candidate-joined, then EXACTLY verified with set
  *    Jaccard — the scale path for near-dup text (no quadratic stage; bucket
  *    sizes bound the join);
  *  - SimHash: 64-bit sign-sketch + 16-bit-chunk pigeonhole blocking for
  *    hamming ≤ 3 (any pair within distance 3 shares an exact chunk);
  *  - n-gram Jaccard: direct pairwise verify, for small/blocked domains;
  *  - embedding cosine near-dup: see Ann.
  *
  * Everything is built from codegen'd built-ins (xxhash64, higher-order
  * array functions, bit ops) — no UDFs, no Python boundary.
  */
object Dedup {

  // ----------------------------------------------------------------- exact

  /** Exact dedup groups: fingerprint → representative (min id) + group size.
    * `keepRepresentatives` filters a corpus to one row per fingerprint. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextOps.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  def keepRepresentatives(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.join(
      exactGroups(docs, idCol, textCol).select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")

  // -------------------------------------------------------------- shingles

  /** Word n-gram shingles (distinct set semantics for Jaccard). */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(text)
    val grams = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
    array_distinct(grams)
  }

  /** Exact set Jaccard between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  // ---------------------------------------------------------- MinHash+LSH

  /** k-permutation MinHash signature: sig[i] = min over shingles of
    * xxhash64(i, shingle). */
  def minhashSignature(sh: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))
    }: _*)

  /** LSH band keys: bands of `rowsPerBand` signature slots, each hashed to
    * one bucket id. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), concat_ws(",",
        transform(slice(sig, b * rowsPerBand + 1, rowsPerBand), _.cast("string"))))
    }: _*)

  /** Candidate pairs from banded MinHash, exactly verified at `threshold`.
    * Shuffles: one explode+groupBy-free self-join on (band, bucket), then a
    * distinct — bucket sizes (not corpus²) bound the work. */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 12, bands: Int = 4, threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = k / bands
    val withSig = docs.select(col(idCol).as("id"),
      shingles(col(textCol), n).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
      .select(col("id"), col("sh"),
        posexplode(bandKeys(col("sig"), bands, rowsPerBand)).as(Seq("pos", "band")))
    val a = withSig.select(col("pos"), col("band"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = withSig.select(col("pos"), col("band"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("pos", "band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash of the token multiset (xxhash64 per token; per-bit
    * majority vote). One explode + one aggregate. */
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val sums = tok.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    sums.select(col("id"), hash.as("simhash"))
  }

  /** Near-dup pairs with hamming(simhash) <= maxDistance. Blocking: 8
    * chunks of 8 bits — by pigeonhole any pair within distance 7 shares an
    * exact chunk, so maxDistance ≤ 7 loses no pairs. */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDistance: Int = 5): DataFrame = {
    require(maxDistance <= 7, "8-chunk blocking only guarantees distance <= 7")
    val sh = simhash64(docs, idCol, textCol)
    val chunked = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until 8).map { c =>
        shiftrightunsigned(col("simhash"), c * 8).bitwiseAND(0xFFL)
      }: _*)).as(Seq("chunk", "key")))
    val a = chunked.select(col("chunk"), col("key"), col("id").as("id_a"), col("simhash").as("h_a"))
    val b = chunked.select(col("chunk"), col("key"), col("id").as("id_b"), col("simhash").as("h_b"))
    a.join(b, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  // -------------------------------------------------------- n-gram Jaccard

  /** Exact n-gram Jaccard pairs via an INVERTED-INDEX join: explode distinct
    * shingles, self-join on the shingle, count intersections, derive Jaccard
    * from set sizes (|A∩B| / (|A|+|B|−|A∩B|)). Only pairs sharing ≥1 shingle
    * are ever materialized (identical result for any threshold > 0) and the
    * work shuffles by shingle — no quadratic single-task stage, AQE handles
    * hot-shingle skew. This is the exact-verify counterpart of MinHash. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(shingles(col(textCol), n)).as("s"))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.select(col("s"), col("id").as("id_a"))
      .join(sh.select(col("s"), col("id").as("id_b")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("m"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("m").cast("double") / (col("na") + col("nb") - col("m")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
