package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Graph analytics, part 2: link-analysis beyond PageRank. */
object Graph2 {
  type Q = (SparkSession, String) => DataFrame

  // ---- g11: HITS hubs & authorities over the nation trade graph ----
  // Kleinberg's HITS (J. ACM 1999) answers a question PageRank (g01)
  // cannot: in a DIRECTED trade graph, which nations are strong
  // *suppliers* (hubs — they ship to many important buyers) vs strong
  // *buyers* (authorities — they receive from many important shippers)?
  // PageRank collapses both roles into one score; HITS keeps the two
  // sides of an asymmetric market separate, which is exactly the
  // supplier-risk / demand-concentration split a trade analyst wants.
  //
  // Plan shape = g01's decomposition: ONE fact-scale star join builds
  // the weighted edge list (shipment counts), then every mutual-
  // reinforcement iteration runs on the aggregated edge table (≤|V|²
  // rows — metadata-sized) with the current score vector riding a
  // broadcast join. The fact table is read once; iterations cost
  // ~nothing at any SF. Two iterations (enough for the ranking to
  // stabilize on a dense small-diameter graph; more is one more CTE).
  //
  // Cross-engine exactness (the g01 discipline): iteration 1 runs on
  // EXACT INTEGERS (h₀ = 1 exactly, so the inbound sum is Σw — BIGINT);
  // each later inbound sum is per-edge w·score products (single IEEE
  // ops on bit-identical inputs) accumulated through DECIMAL(38,15) so
  // partial-agg order cannot perturb ulps; every score vector is L1-
  // normalized (the standard HITS step) and rounded to 12 dp, which
  // pins the one remaining ulp from the decimal→double cast exactly as
  // g01's per-iteration round does. The DuckDB oracle replays both
  // iterations as chained CTEs and matches hash-exact.
  val g11_hits: Q = (s, d) => {
    // edge build = the shared trade-lane stage (artifact-routable)
    val edges = graft.api.GraphArtifactStore.tradeLanes(s, d)
      .select(col("src"), col("dst"), col("n_ship").as("w"))
      // persisted: 3 of the 4 inbound-sum joins below read the edge
      // table; without the barrier each would re-run the fact-scale
      // star join (the g01 lesson)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long").as("node"))
    val zero = lit(0).cast(DecimalType(38, 15))

    // iteration 1 authority: h0 ≡ 1 ⇒ inbound sums are exact BIGINTs
    val a1raw = edges.groupBy(col("dst").as("node")).agg(sum("w").as("araw"))
    val a1tot = a1raw.agg(sum("araw").as("tot"))
    val a1 = nodes.join(a1raw, Seq("node"), "left")
      .crossJoin(broadcast(a1tot))
      .select(col("node"),
        round(coalesce(col("araw"), lit(0L)).cast("double")
          / col("tot").cast("double"), 12).as("auth"))

    // hub update from an authority vector: h_i = Σ_j w_ij·a_j, L1-norm
    def hubFrom(a: DataFrame): DataFrame = {
      val hraw = edges
        .join(broadcast(a.withColumnRenamed("node", "dst")), "dst")
        .groupBy(col("src").as("node"))
        .agg(sum((col("w").cast("double") * col("auth"))
          .cast(DecimalType(38, 15))).as("hdec"))
      val htot = hraw.agg(sum("hdec").as("tot"))
      nodes.join(hraw, Seq("node"), "left").crossJoin(broadcast(htot))
        .select(col("node"),
          round(coalesce(col("hdec"), zero).cast("double")
            / col("tot").cast("double"), 12).as("hub"))
    }
    val h1 = hubFrom(a1)

    // iteration 2 authority from h1: a_j = Σ_i w_ij·h_i, L1-norm
    val a2raw = edges
      .join(broadcast(h1.withColumnRenamed("node", "src")), "src")
      .groupBy(col("dst").as("node"))
      .agg(sum((col("w").cast("double") * col("hub"))
        .cast(DecimalType(38, 15))).as("adec"))
    val a2tot = a2raw.agg(sum("adec").as("tot"))
    val a2 = nodes.join(a2raw, Seq("node"), "left")
      .crossJoin(broadcast(a2tot))
      .select(col("node"),
        round(coalesce(col("adec"), zero).cast("double")
          / col("tot").cast("double"), 12).as("auth"))
    val h2 = hubFrom(a2)

    a2.join(h2, "node")
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").cast("long").as("node"), col("n_name"))),
        "node")
      .select("node", "n_name", "auth", "hub")
      .orderBy("node")
  }
  val g11Sql: String =
    """WITH e AS (
        SELECT CAST(s_nationkey AS BIGINT) AS src,
               CAST(c_nationkey AS BIGINT) AS dst, COUNT(*) AS w
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey  = c_custkey
          JOIN supplier ON l_suppkey  = s_suppkey
        GROUP BY 1, 2),
      n AS (SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation),
      a1r AS (SELECT dst AS node, SUM(w) AS araw FROM e GROUP BY 1),
      a1t AS (SELECT SUM(araw) AS tot FROM a1r),
      a1 AS (SELECT n.node,
               round(CAST(COALESCE(araw, 0) AS DOUBLE)
                     / CAST(tot AS DOUBLE), 12) AS auth
             FROM n LEFT JOIN a1r USING (node), a1t),
      h1r AS (SELECT src AS node,
                SUM(CAST(CAST(w AS DOUBLE) * auth AS DECIMAL(38,15))) AS hdec
              FROM e JOIN a1 ON e.dst = a1.node GROUP BY 1),
      h1t AS (SELECT SUM(hdec) AS tot FROM h1r),
      h1 AS (SELECT n.node,
               round(CAST(COALESCE(hdec, CAST(0 AS DECIMAL(38,15))) AS DOUBLE)
                     / CAST(tot AS DOUBLE), 12) AS hub
             FROM n LEFT JOIN h1r USING (node), h1t),
      a2r AS (SELECT dst AS node,
                SUM(CAST(CAST(w AS DOUBLE) * hub AS DECIMAL(38,15))) AS adec
              FROM e JOIN h1 ON e.src = h1.node GROUP BY 1),
      a2t AS (SELECT SUM(adec) AS tot FROM a2r),
      a2 AS (SELECT n.node,
               round(CAST(COALESCE(adec, CAST(0 AS DECIMAL(38,15))) AS DOUBLE)
                     / CAST(tot AS DOUBLE), 12) AS auth
             FROM n LEFT JOIN a2r USING (node), a2t),
      h2r AS (SELECT src AS node,
                SUM(CAST(CAST(w AS DOUBLE) * auth AS DECIMAL(38,15))) AS hdec
              FROM e JOIN a2 ON e.dst = a2.node GROUP BY 1),
      h2t AS (SELECT SUM(hdec) AS tot FROM h2r),
      h2 AS (SELECT n.node,
               round(CAST(COALESCE(hdec, CAST(0 AS DECIMAL(38,15))) AS DOUBLE)
                     / CAST(tot AS DOUBLE), 12) AS hub
             FROM n LEFT JOIN h2r USING (node), h2t)
      SELECT a2.node, n_name, auth, hub
      FROM a2 JOIN h2 USING (node)
        JOIN nation ON CAST(n_nationkey AS BIGINT) = a2.node
      ORDER BY node"""

  // ---- g12: k-core peeling census (3-core, 3 unrolled rounds) ----
  // The density primitive between degree (g05) and components (g04):
  // the k-core is what survives REPEATEDLY deleting nodes of degree
  // < k — the standard spam-farm / dense-community / "load-bearing
  // catalog" extractor, and the cascade census (how many nodes fall
  // per round) is the robustness read: a graph whose 3-core collapses
  // in one round is hub-and-spoke; one that sheds slowly has a dense
  // nucleus. Runs on the thresholded co-purchase graph (g03's edge
  // build — the ONE fact-scale stage; weight ≥ 2 keeps |E| metadata-
  // sized), then every peel round is a degree aggregate + two
  // semi-joins on the EDGE table alone. Three rounds unrolled the g01
  // way so the DuckDB oracle replays them as chained CTEs hash-exact;
  // at 100 TB the full degeneracy peel is the same plan iterated to
  // fixpoint (O(peel-depth) rounds), and the census row per round is
  // what tells you when to stop.
  //
  // Exactness: everything is integer counts — no floating point at
  // all; the census needs no rounding discipline.
  val g12_kcore: Q = (s, d) => {
    val k = 3
    def deg(e: DataFrame): DataFrame =
      e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
    val e0 = Graph.copurchaseEdges(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var e = e0
    var stats = Vector.empty[DataFrame]
    for (r <- 1 to 3) {
      val dg = deg(e)
      val keep = dg.filter(col("deg") >= k).select("n")
      val eNext = e
        .join(broadcast(keep.withColumnRenamed("n", "a")), "a")
        .join(broadcast(keep.withColumnRenamed("n", "b")), "b")
        .select("a", "b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val before = dg.agg(count(lit(1)).as("n_nodes"),
        count(when(col("deg") < k, 1)).as("n_peeled"))
      val after = deg(eNext).agg(
        count(lit(1)).as("n_nodes_after"),
        coalesce(sum("deg"), lit(0L)).as("deg_sum"))
      stats = stats :+ before.crossJoin(broadcast(after))
        .select(lit(r).cast("long").as("round"), col("n_nodes"),
          col("n_peeled"), col("n_nodes_after"),
          expr("deg_sum div 2").as("n_edges_after"))
      e = eNext
    }
    stats.reduce(_ unionAll _).orderBy("round")
  }
  val g12Sql: String =
    """WITH b AS MATERIALIZED (SELECT l_orderkey AS ok,
               list_sort(list_distinct(list(l_partkey))) AS ps
             FROM lineitem GROUP BY 1),
      pp AS MATERIALIZED (SELECT ok, unnest(ps) AS a FROM b),
      e0 AS MATERIALIZED (SELECT x.a AS a, y.a AS b FROM pp x JOIN pp y
             ON x.ok = y.ok AND x.a < y.a
             GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      d0 AS MATERIALIZED (SELECT n, COUNT(*) AS deg FROM
               (SELECT a AS n FROM e0 UNION ALL SELECT b AS n FROM e0)
             GROUP BY 1),
      k0 AS MATERIALIZED (SELECT n FROM d0 WHERE deg >= 3),
      e1 AS MATERIALIZED (SELECT a, b FROM e0
             WHERE a IN (SELECT n FROM k0) AND b IN (SELECT n FROM k0)),
      d1 AS MATERIALIZED (SELECT n, COUNT(*) AS deg FROM
               (SELECT a AS n FROM e1 UNION ALL SELECT b AS n FROM e1)
             GROUP BY 1),
      k1 AS MATERIALIZED (SELECT n FROM d1 WHERE deg >= 3),
      e2 AS MATERIALIZED (SELECT a, b FROM e1
             WHERE a IN (SELECT n FROM k1) AND b IN (SELECT n FROM k1)),
      d2 AS MATERIALIZED (SELECT n, COUNT(*) AS deg FROM
               (SELECT a AS n FROM e2 UNION ALL SELECT b AS n FROM e2)
             GROUP BY 1),
      k2 AS MATERIALIZED (SELECT n FROM d2 WHERE deg >= 3),
      e3 AS MATERIALIZED (SELECT a, b FROM e2
             WHERE a IN (SELECT n FROM k2) AND b IN (SELECT n FROM k2)),
      d3 AS MATERIALIZED (SELECT n, COUNT(*) AS deg FROM
               (SELECT a AS n FROM e3 UNION ALL SELECT b AS n FROM e3)
             GROUP BY 1),
      r1 AS (SELECT CAST(1 AS BIGINT) AS round,
               (SELECT COUNT(*) FROM d0) AS n_nodes,
               (SELECT COUNT(*) FROM d0 WHERE deg < 3) AS n_peeled,
               (SELECT COUNT(*) FROM d1) AS n_nodes_after,
               CAST((SELECT COALESCE(SUM(deg), 0) FROM d1) // 2 AS BIGINT) AS n_edges_after),
      r2 AS (SELECT CAST(2 AS BIGINT) AS round,
               (SELECT COUNT(*) FROM d1) AS n_nodes,
               (SELECT COUNT(*) FROM d1 WHERE deg < 3) AS n_peeled,
               (SELECT COUNT(*) FROM d2) AS n_nodes_after,
               CAST((SELECT COALESCE(SUM(deg), 0) FROM d2) // 2 AS BIGINT) AS n_edges_after),
      r3 AS (SELECT CAST(3 AS BIGINT) AS round,
               (SELECT COUNT(*) FROM d2) AS n_nodes,
               (SELECT COUNT(*) FROM d2 WHERE deg < 3) AS n_peeled,
               (SELECT COUNT(*) FROM d3) AS n_nodes_after,
               CAST((SELECT COALESCE(SUM(deg), 0) FROM d3) // 2 AS BIGINT) AS n_edges_after)
      SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
      ORDER BY round"""

  // ---- g13: k-hop reachability layers (BFS "blast radius") ----
  // The distance primitive the family still lacked: g04 says WHICH
  // nodes connect, this says HOW FAR — the blast-radius question
  // behind recall campaigns ("every product within 2 co-purchase hops
  // of the recalled part"), fraud ring expansion from a seed account,
  // and cache/prefetch sizing. Source = the smallest node id in the
  // thresholded co-purchase graph (deterministic at any SF); three BFS
  // layers unrolled the g01/g12 way, each layer = one join of the
  // frontier against the symmetric adjacency + an anti-join against
  // everything already visited — all on the metadata-sized edge table;
  // the fact-scale work is the one g02-shape edge build. At 100 TB the
  // same plan iterates with the frontier as the only growing state,
  // which is exactly how Pregel-style BFS schedules.
  //
  // Exactness: pure integer counts and ids — no floating point.
  val g13_khop_reach: Q = (s, d) => {
    val e0 = Graph.copurchaseEdges(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adj = e0.select(col("a").as("v"), col("b").as("n"))
      .unionAll(e0.select(col("b").as("v"), col("a").as("n")))
    val src = e0.agg(least(min("a"), min("b")).as("node"))
    var visited = src.select(col("node"), lit(0L).as("level"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var frontier = visited.select("node")
    for (k <- 1 to 3) {
      val next = adj.join(frontier.withColumnRenamed("node", "v"), "v")
        .select(col("n").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .select(col("node"), lit(k.toLong).as("level"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      visited = visited.unionAll(next)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      frontier = next.select("node")
    }
    val nodes = adj.select(col("v").as("node")).distinct()
    val unreached = nodes.join(visited, Seq("node"), "left_anti")
      .agg(coalesce(count(lit(1)), lit(0L)).as("n_nodes"),
        min("node").as("min_node"), max("node").as("max_node"))
      .select(lit(-1L).as("level"), col("n_nodes"), col("min_node"),
        col("max_node"))
    visited.groupBy("level")
      .agg(count(lit(1)).as("n_nodes"), min("node").as("min_node"),
        max("node").as("max_node"))
      .unionAll(unreached)
      .orderBy("level")
  }
  val g13Sql: String =
    """WITH b AS MATERIALIZED (SELECT l_orderkey AS ok,
               list_sort(list_distinct(list(l_partkey))) AS ps
             FROM lineitem GROUP BY 1),
      pp AS MATERIALIZED (SELECT ok, unnest(ps) AS a FROM b),
      e0 AS MATERIALIZED (SELECT x.a AS a, y.a AS b FROM pp x JOIN pp y
             ON x.ok = y.ok AND x.a < y.a
             GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      adj AS MATERIALIZED (SELECT a AS v, b AS n FROM e0
             UNION ALL SELECT b AS v, a AS n FROM e0),
      src AS MATERIALIZED (SELECT LEAST(MIN(a), MIN(b)) AS node FROM e0),
      l0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS level FROM src),
      l1 AS MATERIALIZED (
        SELECT DISTINCT adj.n AS node, CAST(1 AS BIGINT) AS level
        FROM adj JOIN l0 ON adj.v = l0.node
        WHERE adj.n NOT IN (SELECT node FROM l0)),
      l2 AS MATERIALIZED (
        SELECT DISTINCT adj.n AS node, CAST(2 AS BIGINT) AS level
        FROM adj JOIN l1 ON adj.v = l1.node
        WHERE adj.n NOT IN (SELECT node FROM l0)
          AND adj.n NOT IN (SELECT node FROM l1)),
      l3 AS MATERIALIZED (
        SELECT DISTINCT adj.n AS node, CAST(3 AS BIGINT) AS level
        FROM adj JOIN l2 ON adj.v = l2.node
        WHERE adj.n NOT IN (SELECT node FROM l0)
          AND adj.n NOT IN (SELECT node FROM l1)
          AND adj.n NOT IN (SELECT node FROM l2)),
      vis AS MATERIALIZED (
        SELECT * FROM l0 UNION ALL SELECT * FROM l1
        UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3),
      unr AS (SELECT CAST(-1 AS BIGINT) AS level, COUNT(*) AS n_nodes,
               MIN(node) AS min_node, MAX(node) AS max_node
             FROM (SELECT DISTINCT v AS node FROM adj) t
             WHERE node NOT IN (SELECT node FROM vis))
      SELECT level, COUNT(*) AS n_nodes, MIN(node) AS min_node,
             MAX(node) AS max_node
      FROM vis GROUP BY level
      UNION ALL SELECT * FROM unr
      ORDER BY level"""

  // ---- g14: label-propagation communities (synchronous LPA) ----
  // The near-linear community detector (Raghavan 2007) the family
  // lacked: g04 finds CONNECTED components (one giant blob on any
  // well-connected graph), g08 scores a given partition's modularity —
  // LPA actually FINDS dense communities inside a connected graph by
  // iterated majority vote: every node adopts its neighbors' most
  // frequent label. Determinism (vanilla LPA is notoriously run-to-run
  // unstable): SYNCHRONOUS rounds from lbl(v,0)=v, a FIXED 4 rounds (no
  // convergence race), and a total-order tie-break (count DESC, label
  // ASC) per node — both engines replay the identical vote sequence, so
  // the oracle unrolls the rounds as chained CTEs (d22's Lloyd-replay
  // discipline). Engine shape: the fact-scale edge build happens once
  // (order-bounded in-row pair expand); each round is one edge-sized
  // join against node-sized labels + a node-partitioned rank window —
  // Pregel-by-joins on metadata-sized state, the g01/g04 pattern. At
  // 100 TB the vote join shuffles on the node key and hot hubs ride the
  // same degree-cap route g06 documents.
  // body IS GraftOps.labelPropagation — the facade verb the oracle
  // certifies (edge build shared with the g03/g04 family)
  val g14_label_propagation: Q = (s, d) => {
    val edges = Graph.copurchaseEdges(s, d)
    graft.api.GraftOps.labelPropagation(edges, col("a"), col("b"), rounds = 4)
      .groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_members"), min("node").as("min_member"))
      .orderBy("community")
  }
  val g14Sql: String =
    """WITH li AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      e AS MATERIALIZED (
        SELECT x.pk AS a, y.pk AS b
        FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      sym AS MATERIALIZED (
        SELECT a AS v, b AS n FROM e UNION ALL SELECT b, a FROM e),
      l0 AS MATERIALIZED (SELECT DISTINCT v AS node, v AS lbl FROM sym),
      r1 AS (SELECT s.v, l.lbl, COUNT(*) AS c
             FROM sym s JOIN l0 l ON s.n = l.node GROUP BY 1, 2),
      l1 AS MATERIALIZED (SELECT v AS node, lbl FROM (
             SELECT v, lbl, row_number() OVER (PARTITION BY v
               ORDER BY c DESC, lbl) AS rn FROM r1) WHERE rn = 1),
      r2 AS (SELECT s.v, l.lbl, COUNT(*) AS c
             FROM sym s JOIN l1 l ON s.n = l.node GROUP BY 1, 2),
      l2 AS MATERIALIZED (SELECT v AS node, lbl FROM (
             SELECT v, lbl, row_number() OVER (PARTITION BY v
               ORDER BY c DESC, lbl) AS rn FROM r2) WHERE rn = 1),
      r3 AS (SELECT s.v, l.lbl, COUNT(*) AS c
             FROM sym s JOIN l2 l ON s.n = l.node GROUP BY 1, 2),
      l3 AS MATERIALIZED (SELECT v AS node, lbl FROM (
             SELECT v, lbl, row_number() OVER (PARTITION BY v
               ORDER BY c DESC, lbl) AS rn FROM r3) WHERE rn = 1),
      r4 AS (SELECT s.v, l.lbl, COUNT(*) AS c
             FROM sym s JOIN l3 l ON s.n = l.node GROUP BY 1, 2),
      l4 AS MATERIALIZED (SELECT v AS node, lbl FROM (
             SELECT v, lbl, row_number() OVER (PARTITION BY v
               ORDER BY c DESC, lbl) AS rn FROM r4) WHERE rn = 1)
      SELECT lbl AS community, COUNT(*) AS n_members,
        MIN(node) AS min_member
      FROM l4 GROUP BY 1 ORDER BY community"""

  // ---- g15: dyad census + reciprocity (directed-graph structure) ----
  // The social-network primitive the directed family lacked: g11 ranks
  // nodes, g09 correlates degrees — the DYAD census classifies every
  // node PAIR as mutual (trade flows both ways), asymmetric (one-way),
  // or null, and reciprocity (share of directed edges with a reverse
  // counterpart; Wasserman–Faust's baseline statistic) says whether the
  // trade graph is a market of exchanges or a hub-and-spoke of one-way
  // suppliers. Weighted form reports the reciprocated-weight share
  // (2·Σ min(w_ij,w_ji) over Σ w — volume, not just topology).
  // Engine shape = g11's: ONE fact-scale star join builds the
  // nation-level weighted edge list; the census is a full-outer
  // self-pair join on the ≤|V|² metadata-sized edge table. All counts
  // and weights exact integers; two IEEE divisions rounded 1e-9.
  val g15_dyad_census: Q = (s, d) => {
    // edge build = the shared trade-lane stage (artifact-routable)
    val edges = graft.api.GraphArtifactStore.tradeLanes(s, d)
      .select(col("src"), col("dst"), col("n_ship").as("w"))
      .filter(col("src") =!= col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fwd = edges.filter(col("src") < col("dst"))
      .select(col("src").as("lo"), col("dst").as("hi"), col("w").as("w_f"))
    val bwd = edges.filter(col("src") > col("dst"))
      .select(col("dst").as("lo"), col("src").as("hi"), col("w").as("w_b"))
    val pairs = fwd.join(bwd, Seq("lo", "hi"), "full_outer")
    val nNations = Tables.nation(s, d).count()
    val totals = edges.agg(count(lit(1)).as("n_edges"),
      sum("w").as("total_w"))
    val census = pairs.agg(
      count(when(col("w_f").isNotNull && col("w_b").isNotNull, 1))
        .as("n_mutual"),
      count(when(col("w_f").isNull || col("w_b").isNull, 1)).as("n_asym"),
      sum(when(col("w_f").isNotNull && col("w_b").isNotNull,
        least(col("w_f"), col("w_b"))).otherwise(0L)).as("min_w_sum"))
    census.crossJoin(broadcast(totals))
      .select(
        lit(nNations).as("n_nodes"),
        col("n_edges"), col("n_mutual"), col("n_asym"),
        (lit(nNations * (nNations - 1) / 2) - col("n_mutual")
          - col("n_asym")).as("n_null"),
        round(lit(2.0) * col("n_mutual").cast("double")
          / col("n_edges").cast("double"), 9).as("reciprocity"),
        round(lit(2.0) * col("min_w_sum").cast("double")
          / col("total_w").cast("double"), 9).as("weighted_reciprocity"))
  }
  val g15Sql: String =
    """WITH e AS (
        SELECT CAST(s_nationkey AS BIGINT) AS src,
               CAST(c_nationkey AS BIGINT) AS dst, COUNT(*) AS w
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey  = c_custkey
          JOIN supplier ON l_suppkey  = s_suppkey
        GROUP BY 1, 2 HAVING CAST(s_nationkey AS BIGINT)
          <> CAST(c_nationkey AS BIGINT)),
      f AS (SELECT src AS lo, dst AS hi, w AS w_f FROM e WHERE src < dst),
      b AS (SELECT dst AS lo, src AS hi, w AS w_b FROM e WHERE src > dst),
      p AS (SELECT COALESCE(f.lo, b.lo) AS lo, COALESCE(f.hi, b.hi) AS hi,
              w_f, w_b
            FROM f FULL OUTER JOIN b ON f.lo = b.lo AND f.hi = b.hi),
      nn AS (SELECT COUNT(*) AS n FROM nation),
      t AS (SELECT COUNT(*) AS n_edges, CAST(SUM(w) AS BIGINT) AS total_w
            FROM e),
      c AS (SELECT
              COUNT(CASE WHEN w_f IS NOT NULL AND w_b IS NOT NULL
                    THEN 1 END) AS n_mutual,
              COUNT(CASE WHEN w_f IS NULL OR w_b IS NULL THEN 1 END)
                AS n_asym,
              CAST(SUM(CASE WHEN w_f IS NOT NULL AND w_b IS NOT NULL
                   THEN LEAST(w_f, w_b) ELSE 0 END) AS BIGINT)
                AS min_w_sum
            FROM p)
      SELECT CAST(n AS BIGINT) AS n_nodes, n_edges, n_mutual, n_asym,
        CAST(n * (n - 1) / 2 - n_mutual - n_asym AS BIGINT) AS n_null,
        round(CAST(2.0 AS DOUBLE) * CAST(n_mutual AS DOUBLE)
              / CAST(n_edges AS DOUBLE), 9) AS reciprocity,
        round(CAST(2.0 AS DOUBLE) * CAST(min_w_sum AS DOUBLE)
              / CAST(total_w AS DOUBLE), 9) AS weighted_reciprocity
      FROM c CROSS JOIN nn CROSS JOIN t"""

  // ---- g16: hop-bounded weighted shortest paths (trade routing) ----
  // The routing primitive the family lacked: g04 says WHICH nodes
  // connect, g13 how FAR by hops — this says how CHEAP. Over the
  // directed nation trade graph with edge cost = the lane's average
  // order-to-ship lag in MICRO-DAYS (exact integer division of the
  // exact day-sum — both engines compute the identical BIGINT), the
  // minimum total cost from every nation to every reachable nation
  // over paths of ≤ 4 edges, plus the hop count of that cheapest
  // route (ties to fewer hops). Body = GraftOps.shortestPaths — the
  // verb packs (cost, hops) into one BIGINT (p = cost*8 + hops) so
  // each Bellman-Ford relaxation is pure integer arithmetic
  // (p + 8w + 1) and min(p) is an exact combinable aggregate: no
  // floating point anywhere, the oracle replays all 4 unrolled
  // rounds as chained CTEs bit-exact. The star-join edge build is
  // the ONE fact-scale stage (g01's decomposition); every relaxation
  // joins the |V|²-bounded dist frame against the aggregated edges.
  val g16_shortest_paths: Q = (s, d) => {
    // edge build = the shared trade-lane stage (artifact-routable);
    // the lane cost derives from the stored EXACT day-sum and count,
    // so artifact and inline routes compute the identical BIGINT
    val edges = graft.api.GraphArtifactStore.tradeLanes(s, d)
      .select(col("src"), col("dst"),
        expr("lag_day_sum * 1000000L div n_ship").as("w"))
      .filter(col("src") =!= col("dst"))
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long").as("node"))
    val sp = graft.api.GraftOps.shortestPaths(edges,
      col("src"), col("dst"), col("w"), nodes, rounds = 4)
    val names = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long").as("k"), col("n_name"))
    sp.join(broadcast(names.select(col("k").as("src"),
        col("n_name").as("src_nation"))), "src")
      .join(broadcast(names.select(col("k").as("dst"),
        col("n_name").as("dst_nation"))), "dst")
      .select(col("src_nation"), col("dst_nation"),
        col("cost").as("cost_micro_days"), col("hops"))
      .orderBy("src_nation", "dst_nation")
  }
  val g16Sql: String = {
    val relax = (k: Int) =>
      s"""d$k AS MATERIALIZED (SELECT s, t, MIN(p) AS p FROM (
            SELECT s, t, p FROM d${k - 1}
            UNION ALL
            SELECT d.s, e.dst AS t, d.p + 8 * e.w + 1 AS p
            FROM d${k - 1} d JOIN e ON d.t = e.src) u
          GROUP BY s, t)"""
    s"""WITH e AS MATERIALIZED (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               (CAST(SUM(datediff('day', o.o_orderdate, l.l_shipdate))
                     AS BIGINT) * 1000000) // COUNT(*) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2 HAVING src <> dst),
      d0 AS MATERIALIZED (SELECT n_nationkey AS s, n_nationkey AS t,
               CAST(0 AS BIGINT) AS p FROM nation),
      ${relax(1)}, ${relax(2)}, ${relax(3)}, ${relax(4)}
      SELECT sn.n_name AS src_nation, dn.n_name AS dst_nation,
             p // 8 AS cost_micro_days, p % 8 AS hops
      FROM d4
      JOIN nation sn ON s = sn.n_nationkey
      JOIN nation dn ON t = dn.n_nationkey
      ORDER BY src_nation, dst_nation"""
  }

  // ---- g17: hop-bounded closeness centrality (the hub ranking) ----
  // Freeman's classic centrality over g16's routing fabric: which
  // nation reaches the rest of the trade network CHEAPEST? For every
  // source, n_reached (destinations within 4 hops, self excluded) and
  // the exact BIGINT total micro-day cost of the cheapest routes;
  // closeness = n_reached / total_cost (the standard definition, one
  // IEEE division rounded 1e-9 — on a hop-bounded graph it already
  // penalizes unreachable nodes by shrinking n_reached). Body reuses
  // GraftOps.shortestPaths on g16's edge build, so the distance fabric
  // is computed once per plan and this is one |V|²-bounded aggregate
  // on top; the oracle replays the same Bellman-Ford CTE chain and
  // aggregates identically. Ranking on (closeness DESC, name) is a
  // total order — engine-exact.
  val g17_closeness: Q = (s, d) => {
    val sp = g16_shortest_paths(s, d)
    sp.filter(col("src_nation") =!= col("dst_nation"))
      .groupBy(col("src_nation").as("nation"))
      .agg(count(lit(1)).as("n_reached"),
        sum("cost_micro_days").as("total_cost"))
      .withColumn("closeness", round(
        col("n_reached").cast("double")
          / col("total_cost").cast("double"), 9))
      .orderBy(desc("closeness"), col("nation"))
  }
  val g17Sql: String =
    s"""WITH sp AS MATERIALIZED (${g16Sql.replace("ORDER BY src_nation, dst_nation", "")})
       SELECT src_nation AS nation, COUNT(*) AS n_reached,
              CAST(SUM(cost_micro_days) AS BIGINT) AS total_cost,
              round(CAST(COUNT(*) AS DOUBLE)
                / CAST(SUM(cost_micro_days) AS DOUBLE), 9) AS closeness
       FROM sp WHERE src_nation <> dst_nation
       GROUP BY src_nation
       ORDER BY closeness DESC, nation"""

  // ---- g18: rich-club coefficient curve ----
  // Colizza et al. 2006: do high-degree products co-sell preferentially
  // with EACH OTHER? φ(k) = 2·E_k / (N_k·(N_k−1)) — density of the
  // subgraph induced by nodes of degree > k, swept over doubling
  // thresholds. φ rising with k = an elite core (hub products bundle
  // together — assortative concentration g09's single global number
  // can't localize); flat/falling = hubs connect mostly to the
  // periphery. Plan shape: degrees from one pass over the (metadata-
  // sized) co-purchase edge table, the threshold sweep is an in-row
  // array explode on the degree/edge frames (each edge/node row lands
  // in the thresholds it clears — never a per-k rescan), exact BIGINT
  // counts, ONE rounded IEEE division per k. At 100 TB the fact-scale
  // cost stays the shared copurchasePairs stage; everything here runs
  // on the aggregated graph.
  val g18_rich_club: Q = (s, d) => {
    val ks = Seq(1, 2, 4, 8, 16, 32)
    val kArr = s"array(${ks.mkString(", ")})"
    val edges = Graph.copurchaseEdges(s, d)
    val deg = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // nodes per threshold: explode each node into the ks it clears
    val nk = deg
      .select(explode(expr(s"filter($kArr, k -> deg > k)")).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_nodes"))
    // edges per threshold: both endpoints must clear k
    val ek = edges
      .join(deg.withColumnRenamed("n", "a")
        .withColumnRenamed("deg", "deg_a"), "a")
      .join(deg.withColumnRenamed("n", "b")
        .withColumnRenamed("deg", "deg_b"), "b")
      .select(explode(expr(
        s"filter($kArr, k -> deg_a > k AND deg_b > k)")).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_edges"))
    nk.join(ek, Seq("k"), "left")
      .select(col("k").cast("long").as("k"), col("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"))
      .withColumn("phi", when(col("n_nodes") < 2, lit(0.0))
        .otherwise(round(lit(2.0) * col("n_edges").cast("double")
          / (col("n_nodes") * (col("n_nodes") - 1)).cast("double"), 9)))
      .orderBy("k")
  }
  val g18Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                 FROM lineitem),
      e AS (SELECT x.pk AS a, y.pk AS b
            FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      dg AS (SELECT n, COUNT(*) AS deg FROM (
               SELECT a AS n FROM e UNION ALL SELECT b FROM e) u
             GROUP BY 1),
      ks AS (SELECT unnest([1, 2, 4, 8, 16, 32]) AS k),
      nk AS (SELECT k, COUNT(*) AS n_nodes
             FROM dg JOIN ks ON deg > k GROUP BY k),
      ek AS (SELECT k, COUNT(*) AS n_edges
             FROM e
             JOIN dg da ON da.n = e.a
             JOIN dg db ON db.n = e.b
             JOIN ks ON da.deg > k AND db.deg > k
             GROUP BY k)
      SELECT CAST(nk.k AS BIGINT) AS k, nk.n_nodes,
        CAST(COALESCE(ek.n_edges, 0) AS BIGINT) AS n_edges,
        CASE WHEN nk.n_nodes < 2 THEN 0.0
             ELSE round(2.0 * CAST(COALESCE(ek.n_edges, 0) AS DOUBLE)
               / CAST(nk.n_nodes * (nk.n_nodes - 1) AS DOUBLE), 9)
        END AS phi
      FROM nk LEFT JOIN ek ON nk.k = ek.k ORDER BY k"""

  // ---- g19: ego-network density of the top hubs ----
  // Local clustering around the HIGHEST-degree nodes — the
  // hub-cohesion question g03's single global coefficient can't
  // answer: is a hub the center of one tight community (dense ego) or
  // a bridge gluing unrelated neighborhoods (sparse ego)? Plan shape:
  // degrees on the aggregated edge table, a DRIVER-BOUNDED top-25 hub
  // pick (deterministic ties: deg DESC, node ASC), hub neighbor sets
  // via broadcast semi-joins, then ego edges = one edge-table pass
  // joined against the (hub, neighbor) membership on BOTH endpoints —
  // cost ≤ edges × hub-memberships, bounded by k·maxdeg, never graph².
  // Exact BIGINT counts, ONE rounded IEEE division per hub.
  val g19_ego_density: Q = (s, d) => {
    val edges = Graph.copurchaseEdges(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val hubs = deg.orderBy(col("deg").desc, col("n").asc).limit(25)
    val nbr = edges.join(broadcast(hubs.select(col("n").as("a"))), "a")
      .select(col("a").as("hub"), col("b").as("nb"))
      .unionAll(
        edges.join(broadcast(hubs.select(col("n").as("b"))), "b")
          .select(col("b").as("hub"), col("a").as("nb")))
    val ego = edges
      .join(nbr.select(col("hub"), col("nb").as("a")), "a")
      .join(nbr.select(col("hub").as("hub2"), col("nb").as("b")), "b")
      .filter(col("hub") === col("hub2"))
      .groupBy("hub").agg(count(lit(1)).as("ego_edges"))
    hubs.join(ego.withColumnRenamed("hub", "n"), Seq("n"), "left")
      .select(col("n").as("hub"), col("deg"),
        coalesce(col("ego_edges"), lit(0L)).as("ego_edges"))
      .withColumn("density", when(col("deg") < 2, lit(0.0))
        .otherwise(round(lit(2.0) * col("ego_edges").cast("double")
          / (col("deg") * (col("deg") - 1)).cast("double"), 9)))
      .orderBy("hub")
  }
  val g19Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                 FROM lineitem),
      e AS (SELECT x.pk AS a, y.pk AS b
            FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      dg AS (SELECT n, COUNT(*) AS deg FROM (
               SELECT a AS n FROM e UNION ALL SELECT b FROM e) u
             GROUP BY 1),
      hubs AS (SELECT n, deg FROM dg ORDER BY deg DESC, n LIMIT 25),
      nbr AS (SELECT h.n AS hub, e.b AS nb FROM e JOIN hubs h ON e.a = h.n
              UNION ALL
              SELECT h.n AS hub, e.a AS nb FROM e JOIN hubs h ON e.b = h.n),
      ego AS (SELECT nu.hub, COUNT(*) AS ego_edges
              FROM e JOIN nbr nu ON e.a = nu.nb
                     JOIN nbr nv ON e.b = nv.nb AND nv.hub = nu.hub
              GROUP BY 1)
      SELECT h.n AS hub, h.deg,
             CAST(COALESCE(ego.ego_edges, 0) AS BIGINT) AS ego_edges,
             CASE WHEN h.deg < 2 THEN 0.0
                  ELSE round(2.0 * CAST(COALESCE(ego.ego_edges, 0) AS DOUBLE)
                    / CAST(h.deg * (h.deg - 1) AS DOUBLE), 9)
             END AS density
      FROM hubs h LEFT JOIN ego ON ego.hub = h.n
      ORDER BY hub"""

  val queries: Map[String, Q] = Map(
    "g11_hits"       -> g11_hits,
    "g12_kcore"      -> g12_kcore,
    "g13_khop_reach" -> g13_khop_reach,
    "g14_label_propagation" -> g14_label_propagation,
    "g15_dyad_census" -> g15_dyad_census,
    "g16_shortest_paths" -> g16_shortest_paths,
    "g17_closeness"  -> g17_closeness,
    "g18_rich_club"  -> g18_rich_club,
    "g19_ego_density" -> g19_ego_density,
  )
  val oracles: Map[String, String] = Map(
    "g18_rich_club"  -> g18Sql,
    "g11_hits"       -> g11Sql,
    "g12_kcore"      -> g12Sql,
    "g13_khop_reach" -> g13Sql,
    "g14_label_propagation" -> g14Sql,
    "g15_dyad_census" -> g15Sql,
    "g16_shortest_paths" -> g16Sql,
    "g17_closeness"  -> g17Sql,
    "g19_ego_density" -> g19Sql,
  )
}
