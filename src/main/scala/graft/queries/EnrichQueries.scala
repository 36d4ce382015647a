package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.table
import graft.enrich.RegistryEnricher

/** J2 — the two-stage exact+fuzzy registry join through the REAL enricher,
  * with a provable DuckDB oracle: keys are md5-prefix strings (hash-random,
  * so cross-key SequenceMatcher ratios sit far below the 0.9 cutoff), and
  * "typos" drop one character (ratio exactly 22/23 against the original).
  * Every row's expected outcome is therefore a closed-form CASE.
  */
object EnrichQueries {

  def family: QueryFamily = QueryFamily("enrich", queries, oracles)

  private val PromoCount = 160
  private val keyE = "substr(md5(cast(c_custkey as string)), 1, 12)"
  private val scrapedKeyE =
    s"CASE WHEN c_custkey % 3 = 0 THEN concat(substr($keyE, 1, 2), substr($keyE, 4)) ELSE $keyE END"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "enrich_fuzzy_registry" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val scraped = c.select(col("c_custkey"), expr(scrapedKeyE).as("campus_id"))
      val cms = c.filter(col("c_custkey") % 10 === 0)
        .select(expr(keyE).as("campus_id"),
          expr("cast(c_custkey % 5 as string)").as("cms_rating"))
      RegistryEnricher.enrich(scraped, cms)
        .select(col("c_custkey"), col("campus_id"), col("match_kind"),
          col("match_ratio"), col("cms_rating"))
    }),

    // Blocking-based entity resolution over customers + planted name
    // variants (every 5th customer reappears at id + 1e7 with the '#'
    // dropped — JW exactly 0.988889 to its original). Blocking key = the
    // name's last 3 digits (variant-invariant, caps block size); τ = 0.985
    // sits 0.011 above the strongest organic in-block pair (0.977778) and
    // 0.004 below every true pair — measured on the fixture, float-safe at
    // 6dp. Components collapse transitively; output is every record with
    // its min-member entity id.
    "entity_resolution" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val records = c.select(col("c_custkey").as("rec_id"),
        col("c_name").as("name"))
        .unionAll(c.filter(col("c_custkey") % 5 === 0)
          .select((col("c_custkey") + 10000000L).as("rec_id"),
            regexp_replace(col("c_name"), "#", "").as("name")))
      graft.ops.Linkage.resolveEntities(records, "rec_id", "name",
        substring(col("name"), -3, 3), tau = 0.985)
    }),

    // Blocking-quality audit for the ER pass: on a bounded record subset
    // (every 13th customer + its planted dup), the last-3-characters block
    // key's pair completeness against the ALL-PAIRS truth (round(jw,6) ≥ τ
    // — DuckDB's jaro_winkler_similarity agrees with the engine's at 6dp,
    // proven by text_jaro_winkler) and the candidate-reduction ratio — the
    // two numbers that justify a blocking scheme before it ships. The
    // all-pairs side is the parallel crossJoin shape (left repartitioned,
    // right broadcast), sized by the deterministic subset, never the full
    // corpus squared.
    "er_blocking_recall" -> ((s, dir) => {
      val c = table(s, dir, "customer").filter(col("c_custkey") % 13 === 0)
      val records = c.select(col("c_custkey").as("rec_id"),
        col("c_name").as("name"))
        .unionAll(c.filter(col("c_custkey") % 5 === 0)
          .select((col("c_custkey") + 10000000L).as("rec_id"),
            regexp_replace(col("c_name"), "#", "").as("name")))
        .withColumn("k", substring(col("name"), -3, 3))
      // All-pairs TRUTH via exact-name collapse (round 11, same theorem
      // as Linkage.resolveEntities): truth/blocked depend only on the
      // two NAMES (k derives from the name), so the audit counts
      // reconstruct exactly from distinct-name groups with
      // multiplicities — cross-name pairs contribute m_g·m_h record
      // pairs, same-name pairs contribute C(m,2) with truth = blocked =
      // true (jw of identical strings is 1 ≥ τ; identical names share
      // k). Σ over both is C(N,2), bit-identical counts to the record-
      // level crossJoin, while the quadratic side shrinks from records²
      // to distinct-names² — corpus-duplication-invariant, which is
      // what keeps the audit runnable on a duplicate-heavy registry.
      val groups = records.groupBy(col("name"), col("k"))
        .agg(count(lit(1)).as("m"))
      val par = s.sparkContext.defaultParallelism
      val cross = groups
        .select(col("name").as("na"), col("k").as("ka"), col("m").as("ma"))
        .repartition(par)
        .crossJoin(broadcast(groups.select(col("name").as("nb"),
          col("k").as("kb"), col("m").as("mb"))))
        .filter(col("na") < col("nb"))
        .select((col("ma") * col("mb")).as("cnt"),
          (col("ka") === col("kb")).as("blocked"),
          (round(graft.functions.JaroWinklerSim
            .jaroWinkler(col("na"), col("nb")), 6) >= 0.985).as("truth"))
      val diag = groups
        .select(((col("m") * (col("m") - 1L)) / lit(2L)).cast("long").as("cnt"),
          lit(true).as("blocked"), lit(true).as("truth"))
      val all = cross.unionByName(diag)
      def d(c2: org.apache.spark.sql.Column) = c2.cast("double")
      all.agg(sum(col("cnt")).as("n_pairs"),
          sum(when(col("truth"), col("cnt")).otherwise(0L)).as("n_truth"),
          sum(when(col("truth") && col("blocked"), col("cnt")).otherwise(0L))
            .as("n_blocked_truth"),
          sum(when(col("blocked"), col("cnt")).otherwise(0L))
            .as("n_blocked_pairs"))
        .select(col("n_pairs"), col("n_truth"), col("n_blocked_truth"),
          when(col("n_truth") > 0L,
            round(d(col("n_blocked_truth")) / d(col("n_truth")), 6))
            .otherwise(lit(0.0)).as("recall"),
          col("n_blocked_pairs"),
          round(d(col("n_blocked_pairs")) / d(col("n_pairs")), 6)
            .as("reduction_ratio"))
    }),

    // Survivorship merge after resolution: three planted source records
    // per customer (prio 1 sparse-but-authoritative, prio 2 complete,
    // prio 3 stale-complete with 'C-'/+1e6 markers) collapse to one
    // golden row — per field independently, lowest priority with a
    // value wins, so provenance is observable in the markers.
    "er_golden_record" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      def rec(prio: Int, bal: org.apache.spark.sql.Column,
          name: org.apache.spark.sql.Column,
          seg: org.apache.spark.sql.Column) =
        c.select(col("c_custkey").as("cluster_id"),
          (col("c_custkey") * 10 + prio).as("rec_id"),
          lit(prio.toLong).as("prio"),
          bal.as("balance"), name.as("name"), seg.as("segment"))
      val recs = rec(1,
          when(col("c_custkey") % 3 =!= 0, col("c_acctbal")),
          lit(null).cast("string"),
          when(col("c_custkey") % 7 =!= 0, col("c_mktsegment")))
        .unionAll(rec(2, lit(null).cast("double"),
          concat(lit("B-"), col("c_name")), lit(null).cast("string")))
        .unionAll(rec(3, col("c_acctbal") + 1000000.0,
          concat(lit("C-"), col("c_name")),
          concat(lit("C-"), col("c_mktsegment"))))
      graft.ops.Linkage.goldenRecord(recs, "cluster_id", "rec_id", "prio",
        Seq("balance", "name", "segment"))
    }),

    // Jaro–Winkler record-linkage scores between each customer's name and
    // its successor's — graft's codegen'd expression vs DuckDB's NATIVE
    // jaro_winkler_similarity: two independent implementations must agree
    // (semantics pinned in JaroWinklerImpl; 6dp rounding for libm-order
    // neutrality).
    "text_jaro_winkler" -> ((s, dir) => {
      val c = table(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      val d = c.select((col("c_custkey") - 1).as("c_custkey"),
        col("c_name").as("next_name"))
      c.join(d, Seq("c_custkey"))
        .select(col("c_custkey"),
          round(graft.functions.JaroWinklerSim.jaroWinkler(
            col("c_name"), col("next_name")), 6).as("jw"))
    }),

    // Composed ER pipeline trace — the phases prove they COMPOSE, not
    // just pass alone: fabricate originals + '#'-dropped variants (every
    // 5th customer at id+1e7, priority 2, with every 3rd ORIGINAL's
    // balance nulled so survivorship must mix sources), then run the
    // real chain: FastSS deletion-neighborhood pairing → keep only
    // length-mismatched links (pure insert/delete edits; the fixed-width
    // organic names can only differ by same-length substitutions, so
    // this provably isolates the planted pairs — every cross-length
    // organic pair needs a deletion PLUS a substitution, distance 2) →
    // connectedComponents → goldenRecord survivorship. The oracle
    // derives the same entities from the plant semantics in closed form
    // and replays only the survivorship rule — fully independent of the
    // neighborhood join and the CC kernel.
    "er_fastss_trace" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val orig = c.select(col("c_custkey").as("rec_id"),
        col("c_name").as("nm"), lit(1L).as("prio"),
        when(col("c_custkey") % 3 === 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("bal"))
      val vars = c.filter(col("c_custkey") % 5 === 0)
        .select((col("c_custkey") + 10000000L).as("rec_id"),
          regexp_replace(col("c_name"), "#", "").as("nm"),
          lit(2L).as("prio"), col("c_acctbal").as("bal"))
      // recs is NOT persisted although three consumers read it: the
      // cached frame materializes with the scan's few input partitions,
      // and the deletion-neighborhood explode downstream then amplifies
      // on those few cached blocks — measured 3.6 → 12+ s at sf0.1 (the
      // same AQE-blindness mechanism as fastssRepPairs' pinned
      // repartition, arrived at through the cache instead). Rebuilding
      // the cheap union + regexp projection per consumer is the faster
      // trade at every measured scale.
      val recs = orig.union(vars)
      // The deletion-only rule (keep length-MISMATCHED links) is a pure
      // STRING property, so it applies at the distinct-string level —
      // before member expansion — via fastssRepPairs. Components are
      // provably those of the expanded per-record filter: each surviving
      // string pair expands to a complete bipartite member graph, which
      // the rep–rep edge plus member→rep stars of PARTICIPATING reps
      // connect identically (every old edge factors through the reps;
      // every new edge joins ids the bipartite paths already joined);
      // same-string pairs are equal-length, so the old filter dropped
      // them — stars are added only for reps with a surviving pair,
      // keeping unpaired duplicates singletons exactly as before. The
      // 10× duplicate-heavy canary priced the expanded formulation at
      // Θ(members²) intermediate pairs (SCALE.md §round-12 fastss).
      val rp = graft.ops.Linkage.fastssRepPairs(
          recs.select(col("rec_id"), col("nm")), "rec_id", "nm")
        .filter(length(col("str_a")) =!= length(col("str_b")))
        .select(col("rep_a").as("id_a"), col("rep_b").as("id_b"))
      val members = graft.ops.Linkage.fastssMembers(
        recs.select(col("rec_id"), col("nm")), "rec_id", "nm")
      val participating = rp.select(col("id_a").as("__r"))
        .unionAll(rp.select(col("id_b").as("__r"))).distinct()
      val stars = members.join(participating,
          members("rep") === participating("__r"))
        .filter(col("id") =!= col("rep"))
        .select(col("rep").as("id_a"), col("id").as("id_b"))
      val comps = graft.ops.Dedup.connectedComponents(rp.unionAll(stars),
        "id_a", "id_b")
      val lbl = recs
        .join(comps.withColumnRenamed("id", "rec_id"), Seq("rec_id"), "left")
        .withColumn("entity_id", coalesce(col("component"), col("rec_id")))
      graft.ops.Linkage.goldenRecord(lbl, "entity_id", "rec_id", "prio",
        Seq("nm", "bal"))
    }),

    // Fellegi–Sunter u-probabilities, estimated the Splink way: u_k =
    // P(two RANDOM records agree on field k) = Σ_v C(n_v,2) / C(N,2) —
    // a pure per-field value-frequency aggregate, no labels and no EM —
    // and the resulting match weight log2(1/u_k): what one agreement on
    // that field contributes to a candidate pair's linkage score (rare
    // fields weigh more; a 5-value segment barely matters). ONE melt +
    // one (field, value) hash aggregate: the estimation pass stays a
    // single shuffle however many fields are profiled, and C(n,2) terms
    // are exact 64-bit integers so both engines divide identical longs.
    "er_fs_uweights" -> ((s, dir) => {
      val f = table(s, dir, "customer").select(expr(
        """stack(4,
          |  'nationkey',  cast(c_nationkey as string),
          |  'mktsegment', c_mktsegment,
          |  'bal_bucket', cast(cast(floor(c_acctbal / 1000) as bigint) as string),
          |  'name_tail',  substr(c_name, length(c_name) - 1, 2)
          |) as (field, v)""".stripMargin))
      val t = f.groupBy(col("field"), col("v"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("field"))
        .agg(sum(col("n")).as("nt"),
          count(lit(1)).as("n_distinct"),
          sum(expr("n * (n - 1) div 2")).as("ap"))
      val tp = col("nt").cast("double") *
        (col("nt") - 1).cast("double") / 2.0
      t.select(col("field"), col("n_distinct"),
        round(col("ap").cast("double") / tp, 6).as("u"),
        round(log2(tp / col("ap").cast("double")), 6).as("weight"))
    }),

    // Edit-distance ≤ 1 self-join over supplier names with NO blocking
    // key — FastSS deletion neighborhoods (see Linkage.fastssPairs):
    // candidates come from an equi-join on 1-deletion variants, confirmed
    // with exact levenshtein. The zero-padded "Supplier#%09d" names make
    // every single-digit-differing pair distance exactly 1, so the pair
    // set is dense enough to exercise both the neighborhood join and the
    // distance-2 rejection (transposed digits share variants but fail
    // the confirm). Oracle = the brute-force quadratic scan DuckDB can
    // afford at gate scale — proving the O(n·len) neighborhood join
    // finds exactly the pairs the O(n²) scan does.
    "er_fastss_pairs" -> ((s, dir) =>
      graft.ops.Linkage.fastssPairs(
        table(s, dir, "supplier").select(col("s_suppkey"), col("s_name")),
        "s_suppkey", "s_name")),

    // Nearest same-block name by edit distance: for every part, the
    // closest OTHER part name within its brand block — the blocked
    // nearest-neighbour primitive of merge/match pipelines (block first,
    // quadratic only inside the block). Ties break (distance asc,
    // partkey asc). DUPLICATION-INVARIANT via the exact-name collapse
    // (the resolveEntities / er_blocking_recall theorem): the candidate
    // distance depends only on the NAME PAIR, so the quadratic argmin
    // runs over DISTINCT (brand, name) groups and expands per record.
    // A record whose name is duplicated (group size m ≥ 2) has a
    // distance-0 witness inside its own group, and its nearest is just
    // the smallest OTHER partkey there (min1/min2 — two linear passes,
    // no window); distinct names are ≥ 1 apart, so the cross-name
    // argmin — min(struct(lev, candidate group's min key)) over the
    // distinct-name pair table — only decides records with unique
    // names. Bit-identical to the record-level pair argmin, while the
    // quadratic term shrinks from records² to distinct-names² per
    // brand: a duplicate-heavy catalog (the 100× canary replicates
    // every name verbatim) pays the same distinct-side work plus
    // linear expansion instead of 10,000× the pair join.
    "er_nearest_name" -> ((s, dir) => {
      val p = table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_name"))
      val g1 = p.groupBy(col("p_brand"), col("p_name"))
        .agg(min(col("p_partkey")).as("min1"), count(lit(1)).as("m"))
      val g2 = p.join(g1, Seq("p_brand", "p_name"))
        .filter(col("p_partkey") > col("min1"))
        .groupBy(col("p_brand"), col("p_name"))
        .agg(min(col("p_partkey")).as("min2"))
      // Persisted: THREE consumers (both cross sides + the expand join)
      // otherwise replay the g1/g2 aggregates — .explain showed five
      // part scans where three suffice; distinct (brand, name) rows are
      // catalog-scale, so the cache is small by construction.
      val groups = graft.core.Memo.ownedPersist(
        g1.join(g2, Seq("p_brand", "p_name"), "left"))
      val cross = groups.select(col("p_brand"), col("p_name").as("na"))
        .join(groups.select(col("p_brand"), col("p_name").as("nb"),
          col("min1").as("pb0")), Seq("p_brand"))
        .filter(col("na") =!= col("nb"))
        .groupBy(col("p_brand"), col("na").as("p_name"))
        .agg(min(struct(levenshtein(col("na"), col("nb")).as("d"),
          col("pb0").as("pb"))).as("xm"))
      p.join(groups, Seq("p_brand", "p_name"))
        .join(cross, Seq("p_brand", "p_name"), "left")
        .select(col("p_partkey"),
          least(
            when(col("m") >= 2L, struct(lit(0).as("d"),
              when(col("p_partkey") === col("min1"), col("min2"))
                .otherwise(col("min1")).as("pb"))),
            col("xm")).as("best"))
        .filter(col("best").isNotNull)
        .select(col("p_partkey"), col("best.pb").as("nearest_partkey"),
          col("best.d").as("edit_dist"))
    }),

    // Promo-calendar enrichment via the plan-embedded StepLookup binary
    // search (map-side, ZERO joins/shuffles — the GeoIP shape) against a
    // pure-arithmetic oracle: two independent methods must agree. 10-day
    // windows every 17 days from epoch day 8035 (1992-01-01).
    "lookup_promo_period" -> ((s, dir) => {
      val starts = Array.tabulate(PromoCount)(p => 8035L + 17L * p)
      val ids = Array.tabulate(PromoCount)(_.toLong)
      table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
            .cast("long").as("day"))
        .withColumn("__pid",
          graft.functions.StepLookup.stepLookup(col("day"), starts, ids))
        .select(col("l_orderkey"), col("l_linenumber"), col("day"),
          when(col("day") - (lit(8035L) + col("__pid") * 17L) <= 9L,
            col("__pid")).as("promo_id"))
    }))

  def oracles: Map[String, String] = Map(
    "enrich_fuzzy_registry" ->
      s"""SELECT c_custkey, $scrapedKeyE AS campus_id,
         | CASE WHEN c_custkey % 10 = 0 AND c_custkey % 3 <> 0 THEN 'exact'
         |      WHEN c_custkey % 10 = 0 AND c_custkey % 3 = 0 THEN 'fuzzy'
         |      ELSE 'none' END AS match_kind,
         | CASE WHEN c_custkey % 10 = 0 AND c_custkey % 3 <> 0 THEN 1.0
         |      WHEN c_custkey % 10 = 0 AND c_custkey % 3 = 0 THEN CAST(22.0 AS DOUBLE) / 23.0
         | END AS match_ratio,
         | CASE WHEN c_custkey % 10 = 0 THEN cast(c_custkey % 5 as string) END AS cms_rating
         |FROM customer""".stripMargin,

    "er_golden_record" ->
      """WITH recs AS (
        |  SELECT c_custkey AS cluster_id, c_custkey * 10 + 1 AS rec_id,
        |    CAST(1 AS BIGINT) AS prio,
        |    CASE WHEN c_custkey % 3 <> 0 THEN c_acctbal END AS balance,
        |    CAST(NULL AS VARCHAR) AS name,
        |    CASE WHEN c_custkey % 7 <> 0 THEN c_mktsegment END AS segment
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, c_custkey * 10 + 2, 2, NULL,
        |    'B-' || c_name, NULL FROM customer
        |  UNION ALL
        |  SELECT c_custkey, c_custkey * 10 + 3, 3, c_acctbal + 1000000.0,
        |    'C-' || c_name, 'C-' || c_mktsegment FROM customer)
        |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_records,
        |  (max(CASE WHEN balance IS NOT NULL
        |    THEN {'a': -prio, 'b': -rec_id, 'v': balance} END)).v AS balance,
        |  (max(CASE WHEN name IS NOT NULL
        |    THEN {'a': -prio, 'b': -rec_id, 'v': name} END)).v AS name,
        |  (max(CASE WHEN segment IS NOT NULL
        |    THEN {'a': -prio, 'b': -rec_id, 'v': segment} END)).v AS segment
        |FROM recs GROUP BY 1""".stripMargin,

    "text_jaro_winkler" ->
      """SELECT c.c_custkey,
        |  round(jaro_winkler_similarity(c.c_name, d.c_name), 6) AS jw
        |FROM customer c JOIN customer d ON d.c_custkey = c.c_custkey + 1""".stripMargin,

    "er_blocking_recall" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer
        |  WHERE c_custkey % 13 = 0),
        |r AS (SELECT c_custkey AS rec_id, c_name AS name FROM c
        |  UNION ALL SELECT c_custkey + 10000000, replace(c_name, '#', '')
        |  FROM c WHERE c_custkey % 5 = 0),
        |b AS (SELECT rec_id, name,
        |    substr(name, length(name) - 2, 3) AS k FROM r),
        |p AS (SELECT (a.k = z.k) AS blocked,
        |    (round(jaro_winkler_similarity(a.name, z.name), 6) >= 0.985)
        |      AS truth
        |  FROM b a JOIN b z ON a.rec_id < z.rec_id),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
        |    CAST(sum(CASE WHEN truth AND blocked THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_blocked_truth,
        |    CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_blocked_pairs
        |  FROM p)
        |SELECT n_pairs, n_truth, n_blocked_truth,
        |  CASE WHEN n_truth > 0 THEN
        |    round(CAST(n_blocked_truth AS DOUBLE) / CAST(n_truth AS DOUBLE), 6)
        |    ELSE 0.0 END AS recall,
        |  n_blocked_pairs,
        |  round(CAST(n_blocked_pairs AS DOUBLE) / CAST(n_pairs AS DOUBLE), 6)
        |    AS reduction_ratio
        |FROM m""".stripMargin,

    "entity_resolution" ->
      """WITH RECURSIVE r AS (
        |  SELECT c_custkey AS rec_id, c_name AS nm FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 10000000, replace(c_name, '#', '')
        |  FROM customer WHERE c_custkey % 5 = 0),
        |b AS (SELECT rec_id, nm, substr(nm, length(nm) - 2, 3) AS k FROM r),
        |pairs AS (SELECT a.rec_id AS id_a, b.rec_id AS id_b
        |  FROM b a JOIN b b ON a.k = b.k AND a.rec_id < b.rec_id
        |  WHERE round(jaro_winkler_similarity(a.nm, b.nm), 6) >= 0.985),
        |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT s AS id FROM edges),
        |walk(id, lbl) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.d, w.lbl FROM walk w JOIN edges e ON e.s = w.id),
        |comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id)
        |SELECT r.rec_id, coalesce(c.component, r.rec_id) AS entity_id
        |FROM r LEFT JOIN comp c ON c.id = r.rec_id""".stripMargin,

    // Entities in closed form (see the gate comment's argument): the only
    // length-mismatched distance-1 pairs are (A, variant(A)), so the
    // component label is the original's id for both members; only the
    // goldenRecord survivorship rule is replayed.
    "er_fastss_trace" ->
      """WITH recs AS (
        |  SELECT c_custkey AS rec_id, c_name AS nm, 1 AS prio,
        |    CASE WHEN c_custkey % 3 = 0 THEN NULL
        |         ELSE c_acctbal END AS bal,
        |    c_custkey AS entity_id
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 10000000, replace(c_name, '#', ''), 2,
        |    c_acctbal, c_custkey
        |  FROM customer WHERE c_custkey % 5 = 0)
        |SELECT entity_id, CAST(count(*) AS BIGINT) AS n_records,
        |  (list(nm ORDER BY prio ASC, rec_id ASC)
        |    FILTER (WHERE nm IS NOT NULL))[1] AS nm,
        |  (list(bal ORDER BY prio ASC, rec_id ASC)
        |    FILTER (WHERE bal IS NOT NULL))[1] AS bal
        |FROM recs GROUP BY 1""".stripMargin,

    "er_fs_uweights" ->
      """WITH f AS (
        |  SELECT 'nationkey' AS field, CAST(c_nationkey AS VARCHAR) AS v
        |    FROM customer
        |  UNION ALL SELECT 'mktsegment', c_mktsegment FROM customer
        |  UNION ALL SELECT 'bal_bucket',
        |    CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR)
        |    FROM customer
        |  UNION ALL SELECT 'name_tail',
        |    substr(c_name, length(c_name) - 1, 2) FROM customer),
        |c AS (SELECT field, v, CAST(count(*) AS BIGINT) AS n
        |  FROM f GROUP BY 1, 2),
        |t AS (SELECT field, CAST(sum(n) AS BIGINT) AS nt,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(sum(n * (n - 1) // 2) AS BIGINT) AS ap
        |  FROM c GROUP BY 1)
        |SELECT field, n_distinct,
        |  round(CAST(ap AS DOUBLE) /
        |    (CAST(nt AS DOUBLE) * CAST(nt - 1 AS DOUBLE) / 2.0), 6) AS u,
        |  round(log2((CAST(nt AS DOUBLE) * CAST(nt - 1 AS DOUBLE) / 2.0) /
        |    CAST(ap AS DOUBLE)), 6) AS weight
        |FROM t""".stripMargin,

    "er_fastss_pairs" ->
      """SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
        |  CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS edit_dist
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE levenshtein(a.s_name, b.s_name) <= 1""".stripMargin,

    "er_nearest_name" ->
      """WITH p AS (SELECT p_partkey, p_brand, p_name FROM part),
        |d AS (SELECT a.p_partkey AS pa, b.p_partkey AS pb,
        |    levenshtein(a.p_name, b.p_name) AS d
        |  FROM p a JOIN p b ON a.p_brand = b.p_brand
        |    AND a.p_partkey <> b.p_partkey),
        |r AS (SELECT pa, pb, d, row_number() OVER (PARTITION BY pa
        |    ORDER BY d ASC, pb ASC) AS rn FROM d)
        |SELECT pa AS p_partkey, pb AS nearest_partkey, d AS edit_dist
        |FROM r WHERE rn = 1""".stripMargin,

    "lookup_promo_period" ->
      s"""WITH l AS (SELECT l_orderkey, l_linenumber,
         |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
         |  FROM lineitem)
         |SELECT l_orderkey, l_linenumber, day,
         |  CASE WHEN day >= 8035 AND (day - 8035) % 17 <= 9
         |        AND (day - 8035) // 17 < $PromoCount
         |       THEN (day - 8035) // 17 END AS promo_id
         |FROM l""".stripMargin)
}
