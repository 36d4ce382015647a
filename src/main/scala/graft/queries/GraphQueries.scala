package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables.table
import graft.ops.Graph

/** Graph gates over the event-transition graph (nodes = event types,
  * edges = consecutive-event transitions per user, weights = transition
  * counts — the same edge fabrication as `event_transitions`).
  *
  * PageRank runs in fixed-point integer arithmetic ([[Graph.Scale]] units)
  * so the iterative loop is bit-exact on any engine/partitioning; the
  * oracle unrolls the same three iterations as a CTE chain (the
  * established cross-engine trick from the BPE gate).
  */
object GraphQueries {

  def family: QueryFamily = QueryFamily("graph", queries, oracles)

  private val Iters = 3

  /** Weighted transition edge list: (src, dst, w). Persisted and
    * memoized per (session, dir) — it is |event types|² rows derived
    * from a full window pass over the event log, referenced repeatedly
    * WITHIN each gate's plan (degrees' two aggregates, pagerank's
    * adjacency + node set) and ACROSS the two graph gates; the memo
    * makes both gates share one cached copy instead of each persisting
    * its own. Memoized via [[graft.core.Memo]] (session lifecycle +
    * immutable-fixture assumption documented there). */
  private def transitionEdges(s: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached("graph.transitionEdges", s, dir) {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      table(s, dir, "events")
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
        .agg(count(lit(1)).as("w"))
    }

  /** Co-purchase graph: parts linked when they share ≥ 2 orders — the
    * support floor keeps the graph at the association-rule backbone
    * rather than every incidental pairing. Canonical (pa < pb) simple
    * edges; persisted + memoized because the derivation is itself a
    * self-join over the distinct order-part pairs and three gates
    * (triangles, link prediction, k-core) reuse it. */
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    // A filter+rename over the cross-family undirected pair-count memo
    // (SharedTables.pairCounts) — the former private memo here cached a
    // second copy of the same aggregation; a projection over the cached
    // relation needs no persist of its own.
    SharedTables.pairCounts(s, dir)
      .filter(col("n_orders") >= 2)
      .select(col("part_a").as("pa"), col("part_b").as("pb"),
        col("n_orders").as("w"))

  /** The fabricated SCC-gate digraph (shared by graph_scc and
    * graph_condensation): blocks of 50 part ids form directed rings (one
    * SCC each), every 11th block's ring is broken at i ≡ 17 (mod 550)
    * leaving a 50-singleton path, and block-boundary bridges chain blocks
    * in groups of four — a DAG over the rings with enough depth that the
    * peeling loop needs multiple rounds. */
  private def sccGateEdges(s: SparkSession, dir: String): DataFrame = {
    val p = table(s, dir, "part").select(col("p_partkey").as("i"))
    val blockStart = col("i") - pmod(col("i"), lit(50L))
    val ring = p.filter(pmod(col("i"), lit(550L)) =!= 17L)
      .select(col("i").as("pa"),
        (blockStart + pmod(pmod(col("i"), lit(50L)) + 1L, lit(50L)))
          .as("pb"))
    val bridge = p
      .filter(pmod(col("i"), lit(50L)) === 0L &&
        pmod(expr("i div 50"), lit(4L)) =!= 3L)
      .select(col("i").as("pa"), (col("i") + 50L).as("pb"))
    ring.union(bridge)
      .join(p.select(col("i").as("pb")), "pb") // drop absent targets
      .select(col("pa"), col("pb"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "graph_pagerank" -> ((s, dir) =>
      Graph.pagerankScaled(transitionEdges(s, dir), "src", "dst", "w", Iters)
        .select(col("node"), col("r").as("pr"))),

    "graph_degrees" -> ((s, dir) =>
      Graph.degrees(transitionEdges(s, dir), "src", "dst", "w")),

    // Edge reciprocity of the transition graph — what fraction of
    // directed transitions also flow the other way (count form and the
    // weighted min(w_uv, w_vu) form). One self-join on the reversed edge
    // list, one-row report. Self-loops are reciprocal by definition.
    "graph_reciprocity" -> ((s, dir) => {
      val e = transitionEdges(s, dir)
      val rev = e.select(col("dst").as("src"), col("src").as("dst"),
        col("w").as("w_rev"))
      val j = e.join(rev, Seq("src", "dst"), "left")
      def d(c: Column) = c.cast("double")
      j.agg(count(lit(1)).as("n_edges"), sum(col("w")).as("tot_w"),
          sum(when(col("w_rev").isNotNull, 1L).otherwise(0L)).as("n_recip"),
          sum(when(col("w_rev").isNotNull, least(col("w"), col("w_rev")))
            .otherwise(0L)).as("w_recip"))
        .select(col("n_edges"), col("n_recip"),
          round(d(col("n_recip")) / d(col("n_edges")), 6).as("reciprocity"),
          round(d(col("w_recip")) / d(col("tot_w")), 6).as("w_reciprocity"))
    }),

    // Strongly connected components over a fabricated dependency digraph
    // on the part ids (the organic temporal co-purchase digraph collapses
    // to one giant SCC — useless as a gate): blocks of 50 form directed
    // rings (one SCC each), every 11th block's ring is BROKEN at
    // i ≡ 17 (mod 550) leaving a 50-singleton path, and block-boundary
    // bridges chain blocks in groups of four (a DAG over the rings, so
    // the peeling loop genuinely needs multiple rounds). SCC label = min
    // node id in the component (engine-neutral; Tarjan's discovery order
    // is not). Driver Tarjan below the edge threshold; min-label
    // forward/backward peeling above — bit-identical (GraphSpec). The
    // oracle computes the same components from first principles: mutual
    // membership in the recursive-CTE transitive closure.
    "graph_scc" -> ((s, dir) =>
      Graph.stronglyConnectedComponents(sccGateEdges(s, dir), "pa", "pb")
        .select(col("node").as("part"), col("scc"))),

    // Hub-removal robustness audit on a DESIGNED hub-chain graph whose
    // post-attack structure is known in closed form: hubs every 100 ids
    // each carry 99 leaves and chain to the next hub — one connected
    // component of N nodes. Degrees force the top-4 (deg DESC, id ASC)
    // attack set to hubs {100,200,300,400} (interior hubs have degree
    // 101; the two chain ends only 100), so removal provably yields the
    // hub-0 star (100 nodes), the 500..end chain ((H−5)·100 nodes,
    // H = N/100), and 4·99 leaf singletons — 398 components. The engine
    // side RUNS the real pipeline (degree aggregate → TakeOrdered attack
    // set → anti-join edge filter → connectedComponents before AND
    // after); the oracle derives every number from first principles —
    // two fully independent methods, the SCC-gate discipline.
    "graph_robustness" -> ((s, dir) => {
      val p = table(s, dir, "part").select(col("p_partkey").as("i"))
      val hubs = p.filter(pmod(col("i"), lit(100L)) === 0L)
      val leaf = p.filter(pmod(col("i"), lit(100L)) =!= 0L)
        .select((col("i") - pmod(col("i"), lit(100L))).as("a"),
          col("i").as("b"))
      val chain = hubs.select(col("i").as("a"), (col("i") + 100L).as("b"))
        .join(hubs.select(col("i").as("b")), Seq("b"))
        .select(col("a"), col("b"))
      val edges = leaf.union(chain)
      val deg = edges.select(col("a").as("id"))
        .union(edges.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val removed = deg.orderBy(col("deg").desc, col("id").asc).limit(4)
        .select(col("id"))
      val kept = edges
        .join(broadcast(removed.select(col("id").as("a"))), Seq("a"),
          "left_anti")
        .join(broadcast(removed.select(col("id").as("b"))), Seq("b"),
          "left_anti")
      def census(nodes: DataFrame, es: DataFrame) = {
        val comps = graft.ops.Dedup.connectedComponents(
          es.select(col("a").as("id_a"), col("b").as("id_b")),
          "id_a", "id_b")
        nodes.join(comps.withColumnRenamed("id", "i"), Seq("i"), "left")
          .select(coalesce(col("component"), col("i")).as("comp"))
          .groupBy(col("comp")).agg(count(lit(1)).as("sz"))
          .agg(count(lit(1)).as("n_components"), max(col("sz")).as("largest"),
            sum(when(col("sz") === 1L, 1L).otherwise(0L)).as("n_singletons"),
            sum(col("sz")).as("n_nodes"))
      }
      val before = census(p, edges)
        .select(col("n_nodes").as("n_nodes_before"),
          col("n_components").as("n_components_before"),
          col("largest").as("largest_before"))
      val after = census(
        p.join(broadcast(removed), p("i") === removed("id"), "left_anti"),
        kept)
        .select(col("n_nodes").as("n_nodes_after"),
          col("n_components").as("n_components_after"),
          col("largest").as("largest_after"),
          col("n_singletons"))
      before.crossJoin(after)
        .select(lit(4L).as("n_removed"), col("n_nodes_before"),
          col("n_components_before"), col("largest_before"),
          col("n_nodes_after"), col("n_components_after"),
          col("largest_after"), col("n_singletons"))
    }),

    // FULL core decomposition on a DESIGNED graph whose coreness is known
    // in closed form — blocks of 10 part ids cycle through clique / ring /
    // star shapes (coreness 9 / 2 / 1 by graph theory), so the h-index
    // fixpoint is checked against first principles, not another peeling
    // implementation. The organic co-purchase graph feeds the k=2 member
    // gate (graph_kcore); this one proves the FULL decomposition.
    "graph_coreness" -> ((s, dir) => {
      val p = table(s, dir, "part").select(col("p_partkey").as("i"))
        .withColumn("blk", expr("i div 10"))
      val q = p.select(col("i").as("j"), col("blk"))
      val clique = p.filter(pmod(col("blk"), lit(3L)) === 0L)
        .join(q, "blk").filter(col("i") < col("j"))
        .select(col("i").as("a"), col("j").as("b"))
      val ring = p.filter(pmod(col("blk"), lit(3L)) === 1L)
        .select(col("i").as("a"),
          (col("blk") * 10L + pmod(pmod(col("i"), lit(10L)) + 1L, lit(10L)))
            .as("b"))
      val star = p.filter(pmod(col("blk"), lit(3L)) === 2L &&
          pmod(col("i"), lit(10L)) =!= 0L)
        .select((col("blk") * 10L).as("a"), col("i").as("b"))
      val edges = clique.union(ring).union(star)
        .join(p.select(col("i").as("b")), "b") // drop absent targets
        .select(col("a"), col("b"))
      Graph.coreness(edges, "a", "b")
        .select(col("node").as("part"), col("coreness"))
    }),

    // Condensation DAG of graph_scc's digraph: collapse every SCC to its
    // label and keep the distinct cross-component edges (weight = how many
    // raw edges the super-edge bundles) — the acyclic block structure a
    // scheduler or lineage analyzer consumes. Two label joins + one hash
    // aggregate on top of the SCC labeling.
    "graph_condensation" -> ((s, dir) => {
      val edges = sccGateEdges(s, dir)
      val labels = Graph.stronglyConnectedComponents(edges, "pa", "pb")
      edges
        .join(labels.select(col("node").as("pa"), col("scc").as("scc_a")), "pa")
        .join(labels.select(col("node").as("pb"), col("scc").as("scc_b")), "pb")
        .filter(col("scc_a") =!= col("scc_b"))
        .groupBy(col("scc_a"), col("scc_b"))
        .agg(count(lit(1)).as("n_edges"))
    }),

    // HITS hubs/authorities over the transition graph — the complementary
    // centrality to PageRank (a node can be a strong pointer without
    // being pointed at). Fixed-point integer loop with ℓ₁ renormalization
    // per round; oracle = the same 3 iterations unrolled in HUGEINT.
    "graph_hits" -> ((s, dir) =>
      Graph.hitsScaled(transitionEdges(s, dir), "src", "dst", "w", Iters)),

    // Exact triangle census of the co-purchase graph. Degree-ordered
    // orientation inside triangleCounts bounds wedge generation on hub
    // parts; the oracle is the naive three-way join.
    "graph_triangles" -> ((s, dir) =>
      Graph.triangleCounts(coPurchaseEdges(s, dir), "pa", "pb")
        .select(col("node").as("part"), col("triangles"))),

    // "Customers who bought X also bought Y" — resource-allocation link
    // prediction over the co-purchase graph: non-adjacent part pairs
    // scored by shared-neighbour mass in exact 1e-12 fixed point. The
    // 500-degree hub cap (mirrored in the oracle) bounds the open-wedge
    // quadratic term at scale.
    "graph_linkpred" -> ((s, dir) =>
      Graph.linkPrediction(coPurchaseEdges(s, dir), "pa", "pb",
        minCommon = 2, maxDegree = 500)
        .select(col("node_a").as("part_a"), col("node_b").as("part_b"),
          col("cn"), col("ra"))),

    // Cyclic backbone of the co-purchase graph: the 2-core peels away
    // every tree/pendant part, leaving only parts on cycles — the
    // subgraph where association signals reinforce. Peeling reaches the
    // unique fixpoint in ≤ 6 rounds on these fixtures; the oracle
    // unrolls 12 (extra rounds past the fixpoint are no-ops).
    "graph_kcore" -> ((s, dir) =>
      Graph.kCore(coPurchaseEdges(s, dir), "pa", "pb", k = 2)
        .select(col("node").as("part"), col("deg"))),

    // Association reach from the hub parts: BFS hop distance (≤ 4) from
    // the top-3 co-purchase hubs (degree desc, id asc tie-break) — the
    // seed-proximity signal used to rank a catalog/crawl by closeness
    // to a trusted set. Frontier-proportional rounds, not full-graph.
    "graph_bfs_hubs" -> ((s, dir) =>
      Graph.hopDistances(coPurchaseEdges(s, dir), "pa", "pb",
        hubSeeds(s, dir), maxHops = 4)
        .select(col("node").as("part"), col("dist"))),

    // Trusted-seed quality propagation: personalized PageRank with
    // teleport restricted to the top-3 co-purchase hubs — rank = mass
    // reachable from the anchors, 0 elsewhere (filtered). Same
    // fixed-point integer loop as graph_pagerank, seed-masked teleport.
    "graph_ppr_hubs" -> ((s, dir) => {
      val e = coPurchaseEdges(s, dir)
      val sym = e.select(col("pa").as("src"), col("pb").as("dst"), col("w"))
        .union(e.select(col("pb").as("src"), col("pa").as("dst"), col("w")))
      Graph.personalizedPagerankScaled(sym, "src", "dst", "w",
        hubSeeds(s, dir), Iters)
        .filter(col("r") > 0)
        .select(col("node").as("part"), col("r").as("pr"))
    }),

    // Newman degree assortativity of the co-purchase graph: one number —
    // do hub parts co-sell with other hubs (r>0) or with the long tail
    // (r<0)? Exact integer power sums; only the Pearson closure is
    // double, operand-order mirrored.
    "graph_assortativity" -> ((s, dir) =>
      Graph.degreeAssortativity(coPurchaseEdges(s, dir), "pa", "pb")),

    // Deterministic synchronous label propagation (3 rounds, min-tie) on
    // the co-purchase graph: the cheap community sketch a catalog/crawl
    // curation pass uses before anything Louvain-grade. Fixed rounds,
    // pure function of the graph — the oracle unrolls all three.
    "graph_lpa_communities" -> ((s, dir) =>
      Graph.labelPropagation(coPurchaseEdges(s, dir), "pa", "pb", rounds = 3)
        .select(col("node").as("part"), col("community"))),

    // Weighted Newman modularity OF the LPA partition — the one-number
    // quality check on any community assignment (Q ≈ 0: no better than
    // random; the composition every clustering eval runs). Integer-exact:
    // Q·(2W)² = Σ_c (2·in_c·2W − S_c²) accumulates in decimal(38,0),
    // doubles only in the final division — order-invariant, hash-gated.
    "graph_modularity" -> ((s, dir) => {
      val e = coPurchaseEdges(s, dir)
      val comm = Graph.labelPropagation(e, "pa", "pb", rounds = 3)
      val dec = "decimal(38,0)"
      val ej = e
        .join(comm.select(col("node").as("pa"), col("community").as("ca")), "pa")
        .join(comm.select(col("node").as("pb"), col("community").as("cb")), "pb")
      val twoW = e.agg((sum(col("w")) * 2).as("tw"))
      val strength = e.select(col("pa").as("node"), col("w"))
        .unionAll(e.select(col("pb").as("node"), col("w")))
        .groupBy(col("node")).agg(sum(col("w")).as("s"))
      val sC = strength.join(comm, "node")
        .groupBy(col("community")).agg(sum(col("s")).as("sc"))
      val inC = ej.filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("community"))
        .agg((sum(col("w")) * 2).as("in2"))
      sC.join(inC, Seq("community"), "left")
        .select(col("community"),
          coalesce(col("in2"), lit(0L)).as("in2"), col("sc"))
        .crossJoin(broadcast(twoW))
        .agg(count(lit(1)).as("n_communities"),
          round(
            sum(col("in2").cast(dec) * col("tw").cast(dec) -
              col("sc").cast(dec) * col("sc").cast(dec)).cast("double") /
              (max(col("tw")).cast("double") * max(col("tw")).cast("double")),
            6).as("modularity"))
    }))

  /** Top-3 co-purchase hubs (undirected degree desc, id asc) — the shared
    * seed rule of the BFS-reach and personalized-PageRank gates. */
  private def hubSeeds(s: SparkSession, dir: String): DataFrame = {
    val e = coPurchaseEdges(s, dir)
    e.select(col("pa").as("node")).union(e.select(col("pb").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("node").asc)
      .limit(3).select(col("node"))
  }

  /** Shared edge CTEs: e(src, dst, w), ow(src, outw), nodes, nn(n). */
  private val edgeCtes: String =
    """s AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |e AS (SELECT event_type AS src, next_type AS dst,
      |    CAST(count(*) AS BIGINT) AS w
      |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY 1),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)""".stripMargin

  /** Co-purchase edge CTEs: e(pa, pb, w) canonical support-≥2 edges. */
  private val coPurchaseCtes: String =
    """b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (SELECT a.l_partkey AS pa, c.l_partkey AS pb,
      |    CAST(count(*) AS BIGINT) AS w
      |  FROM b a JOIN b c
      |    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  /** One unrolled PageRank iteration: contributions from r$i, ranks r${i+1}. */
  private def iterCtes(i: Int): String =
    s"""c${i + 1} AS (SELECT e.dst AS node,
       |    CAST(sum(((r.r * 850) // (1000 * ow.outw)) * e.w) AS BIGINT) AS m
       |  FROM e JOIN ow ON ow.src = e.src JOIN r$i r ON r.node = e.src
       |  GROUP BY 1),
       |r${i + 1} AS (SELECT nodes.node,
       |    (${Graph.Teleport} // nn.n) + coalesce(c${i + 1}.m, 0) AS r
       |  FROM nodes CROSS JOIN nn
       |  LEFT JOIN c${i + 1} ON c${i + 1}.node = nodes.node)""".stripMargin

  def oracles: Map[String, String] = Map(

    // First-principles mirror: with N parts (N a multiple of 100,
    // ids 0..N−1) the designed graph's attack outcome is closed-form —
    // see the gate comment for the derivation.
    "graph_robustness" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM part)
        |SELECT CAST(4 AS BIGINT) AS n_removed,
        |  n AS n_nodes_before,
        |  CAST(1 AS BIGINT) AS n_components_before,
        |  n AS largest_before,
        |  n - 4 AS n_nodes_after,
        |  CAST(398 AS BIGINT) AS n_components_after,
        |  (n // 100 - 5) * 100 AS largest_after,
        |  CAST(396 AS BIGINT) AS n_singletons
        |FROM n""".stripMargin,

    "graph_scc" ->
      """WITH RECURSIVE p AS (SELECT p_partkey AS i FROM part),
        |ring AS (SELECT i AS s,
        |    (i // 50) * 50 + ((i % 50) + 1) % 50 AS d
        |  FROM p WHERE i % 550 <> 17),
        |br AS (SELECT i AS s, i + 50 AS d FROM p
        |  WHERE i % 50 = 0 AND (i // 50) % 4 <> 3),
        |ed AS (SELECT s, d
        |  FROM (SELECT * FROM ring UNION ALL SELECT * FROM br) e
        |  JOIN p ON p.i = e.d),
        |reach AS (SELECT s AS a, d AS b FROM ed
        |  UNION
        |  SELECT r.a, e.d FROM reach r JOIN ed e ON e.s = r.b),
        |nodes AS (SELECT s AS n FROM ed UNION SELECT d FROM ed),
        |mut AS (SELECT r1.a AS u, r1.b AS v FROM reach r1
        |    JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
        |  UNION ALL SELECT n, n FROM nodes)
        |SELECT u AS part, CAST(min(v) AS BIGINT) AS scc
        |FROM mut GROUP BY 1""".stripMargin,

    "graph_coreness" ->
      """SELECT p_partkey AS part,
        |  CAST(CASE ((p_partkey // 10) % 3)
        |    WHEN 0 THEN 9 WHEN 1 THEN 2 ELSE 1 END AS BIGINT) AS coreness
        |FROM part""".stripMargin,

    "graph_condensation" ->
      """WITH RECURSIVE p AS (SELECT p_partkey AS i FROM part),
        |ring AS (SELECT i AS s,
        |    (i // 50) * 50 + ((i % 50) + 1) % 50 AS d
        |  FROM p WHERE i % 550 <> 17),
        |br AS (SELECT i AS s, i + 50 AS d FROM p
        |  WHERE i % 50 = 0 AND (i // 50) % 4 <> 3),
        |ed AS (SELECT s, d
        |  FROM (SELECT * FROM ring UNION ALL SELECT * FROM br) e
        |  JOIN p ON p.i = e.d),
        |reach AS (SELECT s AS a, d AS b FROM ed
        |  UNION
        |  SELECT r.a, e.d FROM reach r JOIN ed e ON e.s = r.b),
        |nodes AS (SELECT s AS n FROM ed UNION SELECT d FROM ed),
        |mut AS (SELECT r1.a AS u, r1.b AS v FROM reach r1
        |    JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
        |  UNION ALL SELECT n, n FROM nodes),
        |lab AS (SELECT u AS node, CAST(min(v) AS BIGINT) AS scc
        |  FROM mut GROUP BY 1)
        |SELECT la.scc AS scc_a, lb.scc AS scc_b,
        |  CAST(count(*) AS BIGINT) AS n_edges
        |FROM ed JOIN lab la ON la.node = ed.s JOIN lab lb ON lb.node = ed.d
        |WHERE la.scc <> lb.scc GROUP BY 1, 2""".stripMargin,

    "graph_reciprocity" ->
      s"""WITH $edgeCtes,
         |j AS (SELECT e.w, r.w AS w_rev FROM e
         |  LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src)
         |SELECT CAST(count(*) AS BIGINT) AS n_edges,
         |  CAST(sum(CASE WHEN w_rev IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_recip,
         |  round(CAST(sum(CASE WHEN w_rev IS NOT NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS reciprocity,
         |  round(CAST(sum(CASE WHEN w_rev IS NOT NULL
         |      THEN least(w, w_rev) ELSE 0 END) AS DOUBLE) /
         |    CAST(sum(w) AS DOUBLE), 6) AS w_reciprocity
         |FROM j""".stripMargin,

    "graph_hits" -> {
      def hitsIter(i: Int): String =
        s"""ar$i AS (SELECT e.dst AS node, sum(CAST(h AS HUGEINT) * e.w) AS araw
           |  FROM e JOIN h${i - 1} ON h${i - 1}.node = e.src GROUP BY 1),
           |sa$i AS (SELECT sum(araw) AS s FROM ar$i),
           |a$i AS (SELECT nodes.node,
           |    CAST(CASE WHEN s > 0 THEN (coalesce(araw, 0) * ${Graph.Scale}) // s
           |      ELSE 0 END AS BIGINT) AS a
           |  FROM nodes LEFT JOIN ar$i ON ar$i.node = nodes.node CROSS JOIN sa$i),
           |hr$i AS (SELECT e.src AS node, sum(CAST(a AS HUGEINT) * e.w) AS hraw
           |  FROM e JOIN a$i ON a$i.node = e.dst GROUP BY 1),
           |sh$i AS (SELECT sum(hraw) AS s FROM hr$i),
           |h$i AS (SELECT nodes.node,
           |    CAST(CASE WHEN s > 0 THEN (coalesce(hraw, 0) * ${Graph.Scale}) // s
           |      ELSE 0 END AS BIGINT) AS h
           |  FROM nodes LEFT JOIN hr$i ON hr$i.node = nodes.node CROSS JOIN sh$i)"""
          .stripMargin
      s"""WITH $edgeCtes,
         |h0 AS (SELECT node, ${Graph.Scale} // n AS h FROM nodes CROSS JOIN nn),
         |${(1 to Iters).map(hitsIter).mkString(",\n")}
         |SELECT h$Iters.node, h$Iters.h AS hub, a$Iters.a AS auth
         |FROM h$Iters JOIN a$Iters ON a$Iters.node = h$Iters.node""".stripMargin
    },

    "graph_pagerank" ->
      s"""WITH $edgeCtes,
         |r0 AS (SELECT node, ${Graph.Scale} // n AS r
         |  FROM nodes CROSS JOIN nn),
         |${(0 until Iters).map(iterCtes).mkString(",\n")}
         |SELECT node, CAST(r AS BIGINT) AS pr FROM r$Iters""".stripMargin,

    "graph_triangles" ->
      s"""WITH $coPurchaseCtes,
        |t AS (SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
        |  FROM e e1 JOIN e e2 ON e2.pa = e1.pb
        |  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
        |n AS (SELECT x AS node FROM t
        |  UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t)
        |SELECT CAST(node AS BIGINT) AS part,
        |  CAST(count(*) AS BIGINT) AS triangles
        |FROM n GROUP BY 1""".stripMargin,

    "graph_linkpred" ->
      s"""WITH $coPurchaseCtes,
        |adj AS (SELECT pa AS v, pb AS x FROM e
        |  UNION ALL SELECT pb, pa FROM e),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY 1),
        |ctr AS (SELECT adj.v, adj.x, ${Graph.Scale} // d AS wt
        |  FROM adj JOIN deg ON deg.v = adj.v WHERE d <= 500),
        |w AS (SELECT l.x AS na, r.x AS nb, l.wt
        |  FROM ctr l JOIN ctr r ON l.v = r.v AND l.x < r.x),
        |sc AS (SELECT na, nb, CAST(count(*) AS BIGINT) AS cn,
        |    CAST(sum(wt) AS BIGINT) AS ra
        |  FROM w GROUP BY 1, 2)
        |SELECT CAST(na AS BIGINT) AS part_a, CAST(nb AS BIGINT) AS part_b,
        |  cn, ra
        |FROM sc
        |WHERE cn >= 2 AND NOT EXISTS
        |  (SELECT 1 FROM e WHERE e.pa = sc.na AND e.pb = sc.nb)""".stripMargin,

    "graph_kcore" -> {
      // One peel round: degrees of ec$i → survivors → ec${i+1}. Each
      // ec$i is referenced 3× by the next round, so WITHOUT
      // materialization DuckDB inlines the chain 3^rounds times — the
      // MATERIALIZED hint makes the unroll linear, mirroring Spark's
      // per-round persist.
      def peel(i: Int): String =
        s"""g${i + 1} AS MATERIALIZED (SELECT v FROM (
           |    SELECT pa AS v FROM ec$i UNION ALL SELECT pb FROM ec$i)
           |  GROUP BY 1 HAVING count(*) >= 2),
           |ec${i + 1} AS MATERIALIZED (SELECT pa, pb FROM ec$i
           |  WHERE pa IN (SELECT v FROM g${i + 1})
           |    AND pb IN (SELECT v FROM g${i + 1}))""".stripMargin
      val rounds = 12
      s"""WITH $coPurchaseCtes,
         |ec0 AS MATERIALIZED (SELECT pa, pb FROM e),
         |${(0 until rounds).map(peel).mkString(",\n")}
         |SELECT CAST(v AS BIGINT) AS part, CAST(count(*) AS BIGINT) AS deg
         |FROM (SELECT pa AS v FROM ec$rounds
         |  UNION ALL SELECT pb FROM ec$rounds)
         |GROUP BY 1""".stripMargin
    },

    "graph_bfs_hubs" -> {
      def hop(i: Int): String =
        s"""f${i + 1} AS MATERIALIZED (SELECT DISTINCT adj.x AS node
           |  FROM adj JOIN f$i ON adj.v = f$i.node
           |  WHERE adj.x NOT IN (SELECT node FROM v$i)),
           |v${i + 1} AS MATERIALIZED (SELECT node, d FROM v$i
           |  UNION ALL SELECT node, ${i + 1} FROM f${i + 1})""".stripMargin
      val hops = 4
      s"""WITH $coPurchaseCtes,
         |adj AS MATERIALIZED (SELECT pa AS v, pb AS x FROM e
         |  UNION ALL SELECT pb, pa FROM e),
         |dg AS (SELECT v, count(*) AS c FROM adj GROUP BY 1),
         |f0 AS MATERIALIZED (SELECT v AS node FROM dg
         |  ORDER BY c DESC, v ASC LIMIT 3),
         |v0 AS MATERIALIZED (SELECT node, 0 AS d FROM f0),
         |${(0 until hops).map(hop).mkString(",\n")}
         |SELECT CAST(node AS BIGINT) AS part, CAST(d AS INT) AS dist
         |FROM v$hops""".stripMargin
    },

    "graph_ppr_hubs" -> {
      // One unrolled seed-teleport iteration over the symmetric adjacency.
      def iter(i: Int): String =
        s"""c${i + 1} AS MATERIALIZED (SELECT adj.dst AS node,
           |    CAST(sum(((r.r * 850) // (1000 * ow.outw)) * adj.w) AS BIGINT) AS m
           |  FROM adj JOIN ow ON ow.src = adj.src
           |  JOIN r$i r ON r.node = adj.src GROUP BY 1),
           |r${i + 1} AS MATERIALIZED (SELECT nf.node,
           |    nf.s * (${Graph.Teleport} // ns.n) + coalesce(c${i + 1}.m, 0) AS r
           |  FROM nf CROSS JOIN ns
           |  LEFT JOIN c${i + 1} ON c${i + 1}.node = nf.node)""".stripMargin
      s"""WITH $coPurchaseCtes,
         |adj AS MATERIALIZED (SELECT pa AS src, pb AS dst,
         |    CAST(e.w AS BIGINT) AS w FROM e
         |  UNION ALL SELECT pb, pa, CAST(e.w AS BIGINT) FROM e),
         |dg AS (SELECT src AS v, count(*) AS c FROM adj GROUP BY 1),
         |seeds AS MATERIALIZED (SELECT v AS node FROM dg
         |  ORDER BY c DESC, v ASC LIMIT 3),
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seeds),
         |nodes AS (SELECT src AS node FROM adj UNION SELECT node FROM seeds),
         |nf AS MATERIALIZED (SELECT node,
         |    CASE WHEN node IN (SELECT node FROM seeds) THEN 1 ELSE 0 END AS s
         |  FROM nodes),
         |ow AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS outw
         |  FROM adj GROUP BY 1),
         |r0 AS MATERIALIZED (SELECT node, s * (${Graph.Scale} // ns.n) AS r
         |  FROM nf CROSS JOIN ns),
         |${(0 until Iters).map(iter).mkString(",\n")}
         |SELECT CAST(node AS BIGINT) AS part, CAST(r AS BIGINT) AS pr
         |FROM r$Iters WHERE r > 0""".stripMargin
    },

    "graph_assortativity" ->
      s"""WITH $coPurchaseCtes,
         |dg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
         |    SELECT pa AS v FROM e UNION ALL SELECT pb FROM e)
         |  GROUP BY 1),
         |o AS (SELECT du.d AS x, dv.d AS y FROM e
         |  JOIN dg du ON du.v = e.pa JOIN dg dv ON dv.v = e.pb),
         |bo AS (SELECT x, y FROM o UNION ALL SELECT y, x FROM o),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x*x) AS BIGINT) AS sxx,
         |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(y*y) AS BIGINT) AS syy,
         |    CAST(sum(x*y) AS BIGINT) AS sxy
         |  FROM bo),
         |c AS (SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
         |    CAST(sxx AS DOUBLE) AS sxxd, CAST(sy AS DOUBLE) AS syd,
         |    CAST(syy AS DOUBLE) AS syyd, CAST(sxy AS DOUBLE) AS sxyd
         |  FROM a)
         |SELECT n // 2 AS n_edges,
         |  round((nd * sxyd - sxd * syd) /
         |    nullif(sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)),
         |      0.0), 6) AS assortativity
         |FROM c""".stripMargin,

    "graph_modularity" -> {
      def round(i: Int): String =
        s"""k$i AS (SELECT a.v AS node, l.lbl, CAST(count(*) AS BIGINT) AS c
           |  FROM adj a JOIN l${i - 1} l ON l.node = a.x GROUP BY 1, 2),
           |l$i AS (SELECT node, lbl FROM (SELECT node, lbl,
           |    row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC)
           |      AS rn FROM k$i) WHERE rn = 1)""".stripMargin
      s"""WITH $coPurchaseCtes,
         |adj AS (SELECT pa AS v, pb AS x FROM e
         |        UNION ALL SELECT pb, pa FROM e),
         |l0 AS (SELECT DISTINCT v AS node, v AS lbl FROM adj),
         |${(1 to 3).map(round).mkString(",\n")},
         |c AS (SELECT node, lbl AS community FROM l3),
         |tw AS (SELECT CAST(2 * sum(w) AS BIGINT) AS tw FROM e),
         |st AS (SELECT node, CAST(sum(w) AS BIGINT) AS s FROM (
         |    SELECT pa AS node, w FROM e UNION ALL SELECT pb, w FROM e)
         |  GROUP BY 1),
         |sc AS (SELECT c.community, CAST(sum(st.s) AS BIGINT) AS sc
         |  FROM st JOIN c ON c.node = st.node GROUP BY 1),
         |inc AS (SELECT ca.community, CAST(2 * sum(e.w) AS BIGINT) AS in2
         |  FROM e JOIN c ca ON ca.node = e.pa
         |  JOIN c cb ON cb.node = e.pb AND cb.community = ca.community
         |  GROUP BY 1),
         |per AS (SELECT sc.community, coalesce(in2, 0) AS in2, sc.sc
         |  FROM sc LEFT JOIN inc ON inc.community = sc.community)
         |SELECT CAST(count(*) AS BIGINT) AS n_communities,
         |  round(CAST(sum(in2 * tw - sc * sc) AS DOUBLE) /
         |    (CAST(max(tw) AS DOUBLE) * CAST(max(tw) AS DOUBLE)), 6)
         |    AS modularity
         |FROM per CROSS JOIN tw""".stripMargin
    },

    "graph_lpa_communities" -> {
      def round(i: Int): String =
        s"""k$i AS (SELECT a.v AS node, l.lbl, CAST(count(*) AS BIGINT) AS c
           |  FROM adj a JOIN l${i - 1} l ON l.node = a.x GROUP BY 1, 2),
           |l$i AS (SELECT node, lbl FROM (SELECT node, lbl,
           |    row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC)
           |      AS rn FROM k$i) WHERE rn = 1)""".stripMargin
      s"""WITH $coPurchaseCtes,
         |adj AS (SELECT pa AS v, pb AS x FROM e
         |        UNION ALL SELECT pb, pa FROM e),
         |l0 AS (SELECT DISTINCT v AS node, v AS lbl FROM adj),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT node AS part, lbl AS community FROM l3""".stripMargin
    },

    "graph_degrees" ->
      s"""WITH $edgeCtes,
         |od AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS out_deg,
         |    CAST(sum(w) AS BIGINT) AS out_w FROM e GROUP BY 1),
         |id AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS in_deg,
         |    CAST(sum(w) AS BIGINT) AS in_w FROM e GROUP BY 1)
         |SELECT coalesce(od.node, id.node) AS node,
         |  coalesce(od.out_deg, 0) AS out_deg, coalesce(od.out_w, 0) AS out_w,
         |  coalesce(id.in_deg, 0) AS in_deg, coalesce(id.in_w, 0) AS in_w
         |FROM od FULL OUTER JOIN id ON od.node = id.node""".stripMargin)
}
