package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.table
import graft.ops.{Sampling, Shaping, SkewJoin}

/** Correctness gates for the corpus-shaping / mixing operators: document
  * chunking, sequence packing, deterministic stratified sampling, and the
  * salted skew join (gated as provably-equal to the plain join).
  */
object ShapeQueries {

  def family: QueryFamily = QueryFamily("shape", queries, oracles)

  private val ChunkTokens = 64
  private val ChunkOverlap = 16
  private val ChunkStep = ChunkTokens - ChunkOverlap
  private val SeqLen = 256L
  private val PackShards = 8
  private val SampleRates = Map("AUTOMOBILE" -> 50, "BUILDING" -> 200, "MACHINERY" -> 500)
  private val HilbertOrder = 10
  private val SampleDefault = 100
  private val CapK = 120
  private val Salts = 16

  /** Per-(user, source-dir) scratch root for the format/layout gates —
    * a fixed shared path would race a concurrent run at another scale
    * factor (or another user on a shared host) on overwrite-vs-read. */
  private def fmtDir(dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_fmt_" +
      s"${sys.props.getOrElse("user.name", "u")}_" +
      java.lang.Integer.toHexString(dir.hashCode)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "chunk_documents" -> ((s, dir) =>
      Shaping.chunkDocuments(table(s, dir, "documents"), "doc_id", "text",
        ChunkTokens, ChunkOverlap)),

    // Columnar-sink breadth: documents round-trip through an ORC table
    // (the other splittable columnar format Spark ships natively) and
    // come back row-identical — the oracle reads the ORIGINAL parquet,
    // so any loss/coercion in the ORC writer or reader fails the hash.
    "format_orc_roundtrip" -> ((s, dir) => {
      val out = s"${fmtDir(dir)}/orc_docs"
      table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
    }),

    // Partitioned-layout write + partition-pruned read: documents land
    // partitioned by source (the 100 TB layout for per-source reads),
    // then a two-source read must touch only those directories —
    // PlanSpec asserts the PartitionFilters; this gate pins the rows.
    "layout_partition_prune" -> ((s, dir) => {
      val out = s"${fmtDir(dir)}/docs_by_source"
      table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), col("source"))
        .write.mode("overwrite").partitionBy("source").parquet(out)
      s.read.parquet(out)
        .filter(col("source").isin("src1", "src7"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),

    "pack_sequences" -> ((s, dir) =>
      Shaping.packSequences(table(s, dir, "documents"), "doc_id", "text",
        SeqLen.toInt, PackShards)),

    // Padding-waste report over the packed layout: per trainer shard, the
    // sequence count, token utilization of the allocated capacity and how
    // many documents straddle a sequence boundary — the number a packing
    // strategy is judged by. One aggregate over the pack map.
    "pack_efficiency" -> ((s, dir) => {
      val p = Shaping.packSequences(table(s, dir, "documents"), "doc_id",
        "text", SeqLen.toInt, PackShards)
      p.groupBy(col("shard")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          (max(col("seq_last")) + lit(1L)).as("n_sequences"),
          sum(when(col("seq_first") =!= col("seq_last"), 1L).otherwise(0L))
            .as("n_straddlers"))
        .select(col("shard"), col("n_docs"), col("sum_tokens"),
          col("n_sequences"), (col("n_sequences") * SeqLen).as("capacity"),
          round(col("sum_tokens").cast("double") /
            (col("n_sequences") * SeqLen).cast("double"), 6).as("utilization"),
          col("n_straddlers"))
    }),

    // FFD whole-document bin packing (no straddling). Oracle-checked
    // since round 11: the per-shard sequential greedy is simulated
    // exactly by a recursive CTE carrying the open-bin residual list
    // (see oracles); ShapeSpec additionally asserts capacity,
    // conservation, determinism and the bin-count bound vs next-fit.
    "pack_bins_ffd" -> ((s, dir) =>
      Shaping.packBinsFfd(table(s, dir, "documents"), "doc_id", "text",
        seqLen = 128, shards = PackShards)),

    "sample_stratified_customers" -> ((s, dir) =>
      Sampling.stratified(table(s, dir, "customer"), "c_mktsegment", "c_custkey",
        SampleRates, SampleDefault)
        .select(col("c_custkey"), col("c_mktsegment"))),

    // Domain capping: at most k customers per market segment, winners
    // picked by the deterministic hash order (stable across runs and
    // partitionings) — the anti-domination rule of corpus mixing.
    "sample_cap_per_group" -> ((s, dir) =>
      Sampling.capPerGroup(table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
        "c_mktsegment", "c_custkey", k = CapK)),

    // Stable val/test holdout: permille ranges [0,50) val, [50,150) test,
    // rest train — a doc's split never changes as the corpus grows.
    "sample_assign_splits" -> ((s, dir) =>
      Sampling.assignSplits(table(s, dir, "documents").select(col("doc_id")),
        "doc_id", Seq("val" -> 50, "test" -> 100))),

    // Leakage-safe temporal split: per user, the first 80% of events (by
    // time) train, the rest validate — integer cut, engine-independent.
    "sample_temporal_split" -> ((s, dir) =>
      Sampling.temporalSplit(
        table(s, dir, "events").select(col("event_id"), col("user_id"),
          col("ts")),
        "user_id", "ts", "event_id", trainPct = 80)),

    // Weighted 3:1 interleave of two id sources into per-shard training
    // streams — the deterministic mixing schedule.
    "interleave_sources" -> ((s, dir) =>
      graft.ops.Shaping.interleave(Seq(
        table(s, dir, "documents").select(col("doc_id")) -> 3.0,
        table(s, dir, "embeddings").select(col("vec_id").as("doc_id")) -> 1.0),
        "doc_id", shards = 4)),

    // 2.3 epochs of the documents source: two full copies + the
    // deterministic 30% hash subset as the fractional epoch.
    "sample_repeat_epochs" -> ((s, dir) =>
      Sampling.repeatEpochs(table(s, dir, "documents").select(col("doc_id")),
        "doc_id", factor = 2.3)),

    // Deterministic global shuffle: pseudo-random shard + in-shard position
    // from the engine-neutral Knuth hash — training-order randomization
    // that is identical on every run/engine/partitioning.
    "shuffle_global" -> ((s, dir) =>
      graft.ops.Shaping.shuffleDeterministic(
        table(s, dir, "documents").select(col("doc_id")), "doc_id", shards = 4)),

    // Morton (Z-order) key — the multi-dimensional layout-clustering key,
    // gated as exact 64-bit arithmetic on both engines. The clustering
    // pass itself (range partition + local sort by this key) is asserted
    // in LayoutSpec via the per-partition bounding-box locality property.
    "zorder_keys" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.ops.Layout.zkeyBounded(col("l_partkey"), col("l_suppkey"), 16)
            .as("zkey"))),

    // Hilbert-curve key over the same (partkey, suppkey) plane as
    // zorder_keys — the locality-superior layout alternative (every
    // consecutive Hilbert step is an adjacent cell; Morton jumps at bit
    // boundaries). 10 rounds of pure integer CASE arithmetic, mirrored
    // verbatim by the oracle's CTE chain; LayoutSpec pins the order-1
    // quadrant map and the full order-3 adjacency property.
    "layout_hilbert_keys" -> ((s, dir) =>
      graft.ops.Layout.withHilbert(
        table(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
        col("l_partkey"), col("l_suppkey"), HilbertOrder, "hkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("hkey"))),

    // Salted 16-way orders⋈customer, aggregated per market segment. The
    // oracle is the UNSALTED join — the gate proves the salt spread is
    // result-invariant (each fact row meets its dimension row exactly once).
    "join_salted_revenue" -> ((s, dir) =>
      SkewJoin.saltedJoin(
        table(s, dir, "orders"),
        table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
        factKey = "o_custkey", dimKey = "c_custkey",
        spreadCol = "o_orderkey", salts = Salts)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))))

  // ---------------------------------------------------------------- oracles

  private val toksSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"

  /** The greedy-sequential pack map — shared by the pack_sequences gate
    * and the pack_efficiency report so the layout can never desync from
    * the metric computed over it. */
  private lazy val packCtes: String =
    s"""t AS (
       |  SELECT CAST(doc_id % $PackShards AS BIGINT) AS shard, doc_id AS id,
       |         CAST(len($toksSql) AS BIGINT) AS n_tokens
       |  FROM documents WHERE len($toksSql) > 0),
       |p0 AS (SELECT shard, id, n_tokens,
       |        CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
       |      FROM t),
       |packed AS (SELECT shard, id, n_tokens, start_off,
       |  CAST((start_off - start_off % $SeqLen) / $SeqLen AS BIGINT) AS seq_first,
       |  CAST(((start_off + n_tokens - 1) - (start_off + n_tokens - 1) % $SeqLen) / $SeqLen AS BIGINT) AS seq_last
       |FROM p0)""".stripMargin

  /** DuckDB 1.0 can't correlate a lateral range on len(toks), so chunk
    * starts come from a constant range(1, 4096, step) — the guard poisons
    * the oracle if any document could need a start beyond the cap. */
  private val chunkCapGuard: String =
    s"guard AS (SELECT CASE WHEN max(len($toksSql)) > 4096 THEN error('chunk range(1,4096) cap exceeded') ELSE 1 END AS g FROM documents)"

  def oracles: Map[String, String] = Map(

    "chunk_documents" ->
      s"""WITH $chunkCapGuard,
         |t AS (SELECT doc_id AS id, $toksSql AS toks FROM documents),
         |c AS (SELECT id, toks, CAST(i AS INT) AS start,
         |        CAST((i - 1) // $ChunkStep AS BIGINT) AS chunk_id
         |      FROM t, range(1, 4096, $ChunkStep) r(i)
         |      WHERE i <= len(toks) AND (SELECT g FROM guard) = 1)
         |SELECT id, chunk_id,
         |  CAST(len(list_slice(toks, start, start + ${ChunkTokens - 1})) AS BIGINT) AS chunk_tokens,
         |  array_to_string(list_slice(toks, start, start + ${ChunkTokens - 1}), ' ') AS chunk_text
         |FROM c""".stripMargin,

    "pack_sequences" ->
      s"""WITH $packCtes
         |SELECT shard, id, n_tokens, start_off, seq_first, seq_last
         |FROM packed""".stripMargin,

    // FFD simulated exactly in SQL: a recursive CTE advances every shard
    // one document per iteration in the greedy's own order (n desc, id
    // asc), carrying the open-bin residual list as a BIGINT[] column.
    // First fit = list_position over a residual>=n bitmap (this DuckDB
    // returns 0, not NULL, for "no fit" — both handled); the guard CTE
    // mirrors the Spark side's loud too-long-document failure. Integer
    // state only, so the match is exact, not approximate.
    "pack_bins_ffd" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT CAST(doc_id % $PackShards AS BIGINT) AS shard, doc_id AS id,
         |         CAST(len($toksSql) AS BIGINT) AS n
         |  FROM documents WHERE len($toksSql) > 0),
         |g AS (SELECT CASE WHEN max(n) > 128 THEN error('doc exceeds seqLen')
         |        ELSE 1 END AS ok FROM t),
         |d AS (SELECT shard, id, n,
         |        CAST(row_number() OVER (PARTITION BY shard
         |          ORDER BY n DESC, id ASC) AS BIGINT) AS rn
         |      FROM t WHERE (SELECT ok FROM g) = 1),
         |st AS (
         |  SELECT shard, CAST(0 AS BIGINT) AS rn, CAST([] AS BIGINT[]) AS resid,
         |         CAST(NULL AS BIGINT) AS id, CAST(NULL AS BIGINT) AS n,
         |         CAST(NULL AS BIGINT) AS bin, CAST(NULL AS BIGINT) AS bin_off
         |  FROM (SELECT DISTINCT shard FROM d)
         |  UNION ALL
         |  SELECT d.shard, d.rn,
         |    CASE WHEN fit IS NULL OR fit = 0
         |         THEN list_append(s.resid, 128 - d.n)
         |         ELSE list_transform(range(1, len(s.resid) + 1),
         |                i -> CASE WHEN i = fit THEN s.resid[i] - d.n
         |                     ELSE s.resid[i] END)
         |    END AS resid,
         |    d.id, d.n,
         |    CAST(CASE WHEN fit IS NULL OR fit = 0 THEN len(s.resid)
         |         ELSE fit - 1 END AS BIGINT) AS bin,
         |    CAST(CASE WHEN fit IS NULL OR fit = 0 THEN 0
         |         ELSE 128 - s.resid[fit] END AS BIGINT) AS bin_off
         |  FROM st s JOIN d ON d.shard = s.shard AND d.rn = s.rn + 1,
         |  LATERAL (SELECT list_position(
         |    list_transform(s.resid, r -> r >= d.n), true) AS fit) f
         |)
         |SELECT shard, bin, id, n AS n_tokens, bin_off
         |FROM st WHERE rn > 0""".stripMargin,

    "pack_efficiency" ->
      s"""WITH $packCtes,
         |agg AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |    CAST(max(seq_last) + 1 AS BIGINT) AS n_sequences,
         |    CAST(sum(CASE WHEN seq_first <> seq_last THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_straddlers
         |  FROM packed GROUP BY 1)
         |SELECT shard, n_docs, sum_tokens, n_sequences,
         |  n_sequences * $SeqLen AS capacity,
         |  round(CAST(sum_tokens AS DOUBLE) /
         |    CAST(n_sequences * $SeqLen AS DOUBLE), 6) AS utilization,
         |  n_straddlers
         |FROM agg""".stripMargin,

    "format_orc_roundtrip" ->
      "SELECT doc_id, lang, source, n_chars FROM documents",

    "layout_partition_prune" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE source IN ('src1', 'src7')
        |GROUP BY 1""".stripMargin,

    "shuffle_global" ->
      s"""WITH h AS (SELECT doc_id AS id,
        |  ${OracleSql.knuth32("doc_id")} AS h FROM documents)
        |SELECT CAST((h * 4) >> 32 AS BIGINT) AS shard, id,
        |  CAST(row_number() OVER (PARTITION BY (h * 4) >> 32 ORDER BY h, id) AS BIGINT) AS pos
        |FROM h""".stripMargin,

    "layout_hilbert_keys" -> {
      val order = HilbertOrder
      val side = 1L << order
      val steps = (order - 1 to 0 by -1).zipWithIndex.map { case (k, idx) =>
        val s = 1L << k
        s"""h${idx + 1} AS (SELECT l_orderkey, l_linenumber,
           |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1
           |      THEN ${s - 1} - y ELSE y END ELSE x END AS x,
           |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1
           |      THEN ${s - 1} - x ELSE x END ELSE y END AS y,
           |    d + ${s * s} * (CASE WHEN rx = 0 THEN ry
           |      ELSE 3 - ry END) AS d
           |  FROM (SELECT *, CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
           |      CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
           |    FROM h$idx))""".stripMargin
      }
      s"""WITH h0 AS (SELECT l_orderkey, l_linenumber,
         |    ((CAST(l_partkey AS BIGINT) % $side) + $side) % $side AS x,
         |    ((CAST(l_suppkey AS BIGINT) % $side) + $side) % $side AS y,
         |    CAST(0 AS BIGINT) AS d
         |  FROM lineitem),
         |${steps.mkString(",\n")}
         |SELECT l_orderkey, l_linenumber, CAST(d AS BIGINT) AS hkey
         |FROM h$order""".stripMargin
    },

    "zorder_keys" -> {
      val terms = (0 until 16).flatMap { i =>
        Seq(s"(((px >> $i) & 1) * ${1L << (2 * i)})",
          s"(((py >> $i) & 1) * ${1L << (2 * i + 1)})")
      }
      // pmod mirror: wrap the signed % so the oracle stays correct if this
      // gate is ever repointed at signed keys.
      s"""WITH b AS (SELECT l_orderkey, l_linenumber,
         |  ((CAST(l_partkey AS BIGINT) % 65536) + 65536) % 65536 AS px,
         |  ((CAST(l_suppkey AS BIGINT) % 65536) + 65536) % 65536 AS py FROM lineitem)
         |SELECT l_orderkey, l_linenumber,
         |  CAST(${terms.mkString(" + ")} AS BIGINT) AS zkey
         |FROM b""".stripMargin
    },

    "sample_stratified_customers" -> {
      val rateCase = SampleRates.foldLeft(s"$SampleDefault") {
        case (acc, (stratum, p)) =>
          s"CASE WHEN c_mktsegment = '$stratum' THEN $p ELSE $acc END"
      }
      s"""SELECT c_custkey, c_mktsegment FROM customer
         |WHERE (((c_custkey % 1000000007) * 2654435761) % 4294967296) % 1000 < $rateCase""".stripMargin
    },

    "sample_cap_per_group" ->
      s"""WITH r AS (
         |  SELECT c_custkey, c_mktsegment,
         |    row_number() OVER (PARTITION BY c_mktsegment
         |      ORDER BY (((c_custkey % 1000000007) * 2654435761) % 4294967296) % 1000 ASC,
         |               c_custkey ASC) AS rk
         |  FROM customer)
         |SELECT c_custkey, c_mktsegment FROM r WHERE rk <= $CapK""".stripMargin,

    "sample_assign_splits" ->
      """SELECT doc_id,
        |  CASE WHEN (((doc_id % 1000000007) * 2654435761) % 4294967296) % 1000 < 50 THEN 'val'
        |       WHEN (((doc_id % 1000000007) * 2654435761) % 4294967296) % 1000 < 150 THEN 'test'
        |       ELSE 'train' END AS split
        |FROM documents""".stripMargin,

    "sample_temporal_split" ->
      """SELECT event_id, user_id, ts,
        |  CASE WHEN CAST(row_number() OVER w AS BIGINT)
        |      <= (CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) * 80) // 100
        |    THEN 'train' ELSE 'val' END AS split
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "interleave_sources" ->
      """WITH src AS (
        |  SELECT doc_id AS id, 0 AS source, CAST(doc_id % 4 AS BIGINT) AS shard, 3.0 AS w FROM documents
        |  UNION ALL
        |  SELECT vec_id, 1, CAST(vec_id % 4 AS BIGINT), 1.0 FROM embeddings),
        |v AS (SELECT shard, source, id,
        |        CAST(row_number() OVER (PARTITION BY shard, source ORDER BY id) AS DOUBLE) / w AS vt
        |      FROM src)
        |SELECT shard, source, id,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY vt ASC, source ASC, id ASC) AS BIGINT) AS seq
        |FROM v""".stripMargin,

    "sample_repeat_epochs" ->
      """SELECT doc_id, CAST(e.i AS BIGINT) AS epoch
        |FROM documents, range(0, 3) e(i)
        |WHERE i < 2 OR (((doc_id % 1000000007) * 2654435761) % 4294967296) % 1000 < 300""".stripMargin,

    "join_salted_revenue" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
}
