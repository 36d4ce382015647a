package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale-canary data generator: replicates the behavior-bearing tables
  * (`documents`, `embeddings`, `events`, `lineitem`) `reps`-fold with
  * structure-preserving transforms, so every per-replica workload is an
  * EXACT copy of the source scale and totals must scale linearly — any
  * super-linear runtime is an engine defect, not a data artifact:
  *
  *  - documents: every token gets a replica-tag prefix — a bijection on the
  *    token alphabet, so shingle/minhash/dup structure inside a replica is
  *    identical to the source while shingles across replicas are DISJOINT
  *    (no cross-replica near-dup pairs, pair tables scale exactly ×reps).
  *  - embeddings: per-replica deterministic ±1 sign flip per dimension — an
  *    orthogonal transform, so all within-replica cosines/norms are
  *    bit-preserved and cross-replica cosines collapse to ≈0 (no spurious
  *    ≥0.9 pairs).
  *  - events / lineitem: key-offset replicas (disjoint users, orders,
  *    parts) — sessions and co-purchase subgraphs scale ×reps; the derived
  *    co-purchase graph crosses the LocalEdgeThreshold, forcing the
  *    DISTRIBUTED graph regime the small scales never exercise.
  *
  * Dimensions referenced by offset foreign keys (orders, customer, part,
  * supplier) replicate with matching key offsets so inner joins keep all
  * replicas; only region/nation (un-offset keys) copy verbatim. Output layout
  * matches testdata (`<out>/<name>.parquet`), so every SparkEntry query and
  * BenchOne run against it unchanged.
  */
object ScaleCanary {

  private def signs(rep: Int, dim: Int): Seq[Float] = {
    // splitmix64 parity per (rep, dim) — replica 0 is the identity so the
    // source corpus embeds verbatim.
    def mix(seed: Long): Long = {
      var z = seed + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    (0 until dim).map(d =>
      if (rep == 0 || (mix(rep.toLong * 4096L + d) & 1L) == 0L) 1.0f else -1.0f)
  }

  def main(args: Array[String]): Unit = {
    val (src, out, reps) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tbl(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")
    // ONE FILE PER REPLICA (the union of `reps` single-file reads carries
    // one partition per replica straight through to the writer — no
    // repartition). File count must scale WITH volume: a real 100 TB table
    // is thousands of splits, and a single coalesced file serializes the
    // whole 100× scan into one task (measured: 913× task skew, a 38 s
    // serial scan taxing every query in the round-10 canary) — that
    // measures the fixture, not the engine. Per-replica files keep
    // scan parallelism exactly proportional to data, like a cluster's
    // maxPartitionBytes splits, while each file stays one row group so
    // the sf0.1 baseline's per-split work is unchanged.
    // Regenerating a fixture in place invalidates any shared memo frames
    // cached under that dir (immutable-fixture assumption — Memo scaladoc);
    // drop them up front so a same-JVM canary run can't read stale rows.
    graft.core.Memo.clearDir(out)
    def write(df: DataFrame, n: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$n.parquet")

    def replicate(n: String)(f: (DataFrame, Int) => DataFrame): Unit =
      write((0 until reps).map(r => f(tbl(n), r)).reduce(_ unionAll _), n)

    // doc_id stride 1e7, not 1e5, for the same reason as vec_id below: the
    // dedup gates derive planted ids as doc_id + 2e6, so with a 1e5 stride
    // replica r's planted ids collide with replica r+20's base ids once
    // reps > 20 — groupBy(id) then merges a planted fragment with an
    // unrelated replica's doc and the "pairs scale exactly ×reps"
    // invariant silently breaks. 1e7 keeps base+planted spans disjoint to
    // ≥ 1000 reps.
    replicate("documents") { (d, r) =>
      val text = if (r == 0) col("text")
        else array_join(transform(split(col("text"), " "),
          t => concat(lit(s"r$r"), t)), " ")
      val nChars = if (r == 0) col("n_chars") else length(text)
      d.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"), text.as("text"),
        col("lang"), col("source"), nChars.as("n_chars"))
    }
    // vec_id stride 1e7, not 1e5: plantedEmbeddings derives dup ids as
    // vec_id + 1e6, so a 1e5 stride makes replica r's planted ids collide
    // with replica r+10's base ids once reps > 10 — the 10× canary was
    // collision-free, a 100× canary wasn't. 1e7 keeps base+planted spans
    // disjoint to ≥ 1000 reps.
    replicate("embeddings") { (e, r) =>
      e.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
        zip_with(col("embedding"), typedLit(signs(r, 64)),
          (x, s) => x * s).as("embedding"),
        col("label"))
    }
    replicate("events") { (e, r) =>
      e.select((col("event_id") + lit(r * 1000000L)).as("event_id"), col("ts"),
        (col("user_id") + lit(r * 10000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    replicate("lineitem") { (l, r) =>
      l.select(Seq(
        (col("l_orderkey") + lit(r * 1000000L)).as("l_orderkey"),
        (col("l_partkey") + lit(r * 100000L)).as("l_partkey"),
        (col("l_suppkey") + lit(r * 10000L)).as("l_suppkey")) ++
        l.columns.filterNot(Set("l_orderkey", "l_partkey", "l_suppkey")).map(col): _*)
    }
    // Orders replicate with the SAME orderkey offset as lineitem (so the
    // basket/recsys train-split joins see every replica) and disjoint
    // per-replica customer populations — without this the holdout gates
    // would anti-join away 99% of a 100× canary's baskets and measure
    // nothing. Dense o_orderkey ≤ 150k and o_custkey ≤ 15k at sf0.1 keep
    // both offsets collision-free to ≥ 100 reps.
    replicate("orders") { (o, r) =>
      o.select(Seq(
        (col("o_orderkey") + lit(r * 1000000L)).as("o_orderkey"),
        (col("o_custkey") + lit(r * 100000L)).as("o_custkey")) ++
        o.columns.filterNot(Set("o_orderkey", "o_custkey")).map(col): _*)
    }
    // Dimensions referenced by replica-offset foreign keys must replicate
    // with the MATCHING offset, or every inner join orders⋈customer /
    // lineitem⋈part / lineitem⋈supplier silently drops all replicas r > 0
    // and those gates report spuriously flat slopes (measured: the r10
    // canary carried this blind spot for the relational families; slopes
    // re-measured in SCALE.md §"batch 5"). Strides match the fact-side
    // offsets above; key domains at sf0.1 (c ≤ 15k, p ≤ 20k, s ≤ 1k) stay
    // collision-free to ≥ 100 reps. Non-key attributes are copied, so
    // per-replica join fan-outs are exact copies of the source scale.
    replicate("customer") { (c, r) =>
      c.select((col("c_custkey") + lit(r * 100000L)).as("c_custkey") +:
        c.columns.filterNot(_ == "c_custkey").map(col): _*)
    }
    replicate("part") { (p, r) =>
      p.select((col("p_partkey") + lit(r * 100000L)).as("p_partkey") +:
        p.columns.filterNot(_ == "p_partkey").map(col): _*)
    }
    replicate("supplier") { (su, r) =>
      su.select((col("s_suppkey") + lit(r * 10000L)).as("s_suppkey") +:
        su.columns.filterNot(_ == "s_suppkey").map(col): _*)
    }
    Seq("region", "nation").foreach(n => write(tbl(n), n))
    spark.stop()
  }
}
