package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Graph analytics over relationship structure extracted from the fact
  * tables: entity graphs (who trades with whom, what co-occurs with
  * what) are the other half of a curation stack — link-based quality
  * scores and co-occurrence projections both reduce to them.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  /** The co-purchase pair counts (a, b, w) — the ONE fact-scale stage
    * the whole family shares (per-order sorted part sets, in-row pair
    * expansion, pair-key count; a < b by construction; exactly two
    * shuffles, never a self-join). Read from the materialized graph
    * artifact when the session routes one (GraphArtifactStore — the
    * production "project once, analyze many" shape), else computed
    * inline — the artifact is written by GraftOps.graphArtifacts with
    * this same expression, and GraphArtifactsSpec pins the routes
    * equal. The correctness gate always runs inline.
    */
  private[operators] def copurchasePairs(s: SparkSession, d: String): DataFrame =
    graft.api.GraphArtifactStore.pairsIfPresent(s, d).getOrElse {
      graft.api.GraftOps.basketPairCounts(
        Tables.lineitem(s, d), col("l_orderkey"), col("l_partkey"))
    }

  /** The signal-thresholded co-purchase edge list (a, b): pairs
    * co-ordered once are noise, w >= 2 is signal — the graph every
    * analytic in this family runs on.
    */
  private[operators] def copurchaseEdges(s: SparkSession, d: String): DataFrame =
    copurchasePairs(s, d)
      .filter(col("w") >= graft.api.GraphArtifactStore.MinWeight)
      .select("a", "b")

  // ---- g01: weighted PageRank over the nation trade graph ----
  // Link-based importance (Page et al. 1999) on the supplier-nation ->
  // customer-nation trade graph: edge weight = shipment count. The
  // expensive stage is the ONE fact-scale pass that builds the edge
  // list (lineitem joined to its order/customer/supplier dims — q05's
  // star shape, dims broadcast); everything iterative then runs on the
  // aggregated EDGE table (|V|^2 at most — metadata-sized), so
  // iterations cost ~nothing and the fact table is never re-read. This
  // is the right 100 TB decomposition for any fact->graph analytic:
  // collapse to the graph FIRST, iterate on the graph alone.
  //
  // Cross-engine exactness (the d22 discipline, applied to 3 unrolled
  // power iterations): per-edge fraction w/W and per-edge contribution
  // r*frac are single IEEE-754 ops (bit-identical on any engine); each
  // node's inbound sum runs through DECIMAL(38,18) so partial-agg
  // order can't perturb ulps; the damping update 0.15/|V| + 0.85*S is
  // again pure IEEE scalar ops. The DuckDB oracle replays all three
  // iterations as chained CTEs and matches hash-exact. Dangling nodes
  // (no out-edges — at tiny SFs most nations have no suppliers) get the
  // standard treatment: their mass redistributes uniformly each
  // iteration, so total rank stays 1 and the spec can assert mass
  // conservation at every SF. The dangling sum rides DECIMAL(38,12) —
  // pr is exactly 12-dp after the per-iteration round, so that sum is
  // EXACT and its double conversion is a single correctly-rounded
  // division on both engines.
  // Body = GraftOps.pagerank (the verb carries the full arithmetic
  // discipline: DECIMAL(38,18) inbound sums, DECIMAL(38,12) dangling
  // mass, per-iteration 12-dp round — see the verb's scaladoc); this
  // query contributes the fact-scale edge build and the nation vertex
  // set, and its DuckDB hash compare pins the verb.
  val g01_pagerank: Q = (s, d) => {
    // edge build = the shared trade-lane stage (artifact-routable);
    // the verb's own (src, dst) re-aggregation of n_ship is the
    // identity on the already-collapsed lanes, so artifact and inline
    // routes feed pagerank the same exact BIGINT weights
    val lanes = graft.api.GraphArtifactStore.tradeLanes(s, d)
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long").as("node"))
    val r3 = graft.api.GraftOps.pagerank(lanes,
      col("src"), col("dst"), col("n_ship"), nodes, iters = 3)
    r3.join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").cast("long").as("node"), col("n_name"))),
        "node")
      .select(col("node"), col("n_name"), col("pr"))
      .orderBy("node")
  }
  val g01Sql: String =
    """WITH e AS (
        SELECT CAST(s_nationkey AS BIGINT) AS src,
               CAST(c_nationkey AS BIGINT) AS dst, COUNT(*) AS w
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey  = c_custkey
          JOIN supplier ON l_suppkey  = s_suppkey
        GROUP BY 1, 2),
      ow AS (SELECT src, SUM(w) AS wout FROM e GROUP BY 1),
      ef AS (SELECT src, dst,
               CAST(w AS DOUBLE) / CAST(wout AS DOUBLE) AS frac
             FROM e JOIN ow USING (src)),
      n AS (SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation),
      nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM nation),
      r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nv.v AS pr FROM n, nv),
      s1 AS (SELECT dst AS node,
               CAST(SUM(CAST(pr * frac AS DECIMAL(38,18))) AS DOUBLE) AS s
             FROM ef JOIN r0 ON ef.src = r0.node GROUP BY 1),
      d1 AS (SELECT COALESCE(CAST(SUM(CAST(pr AS DECIMAL(38,12))) AS DOUBLE),
                        CAST(0.0 AS DOUBLE)) AS dm
             FROM r0 WHERE node NOT IN (SELECT src FROM ow)),
      r1 AS (SELECT n.node,
               round(CAST(0.15 AS DOUBLE) / nv.v
                 + CAST(0.85 AS DOUBLE)
                   * (COALESCE(s, CAST(0.0 AS DOUBLE)) + dm / nv.v), 12) AS pr
             FROM n LEFT JOIN s1 USING (node), nv, d1),
      s2 AS (SELECT dst AS node,
               CAST(SUM(CAST(pr * frac AS DECIMAL(38,18))) AS DOUBLE) AS s
             FROM ef JOIN r1 ON ef.src = r1.node GROUP BY 1),
      d2 AS (SELECT COALESCE(CAST(SUM(CAST(pr AS DECIMAL(38,12))) AS DOUBLE),
                        CAST(0.0 AS DOUBLE)) AS dm
             FROM r1 WHERE node NOT IN (SELECT src FROM ow)),
      r2 AS (SELECT n.node,
               round(CAST(0.15 AS DOUBLE) / nv.v
                 + CAST(0.85 AS DOUBLE)
                   * (COALESCE(s, CAST(0.0 AS DOUBLE)) + dm / nv.v), 12) AS pr
             FROM n LEFT JOIN s2 USING (node), nv, d2),
      s3 AS (SELECT dst AS node,
               CAST(SUM(CAST(pr * frac AS DECIMAL(38,18))) AS DOUBLE) AS s
             FROM ef JOIN r2 ON ef.src = r2.node GROUP BY 1),
      d3 AS (SELECT COALESCE(CAST(SUM(CAST(pr AS DECIMAL(38,12))) AS DOUBLE),
                        CAST(0.0 AS DOUBLE)) AS dm
             FROM r2 WHERE node NOT IN (SELECT src FROM ow)),
      r3 AS (SELECT n.node,
               round(CAST(0.15 AS DOUBLE) / nv.v
                 + CAST(0.85 AS DOUBLE)
                   * (COALESCE(s, CAST(0.0 AS DOUBLE)) + dm / nv.v), 12) AS pr
             FROM n LEFT JOIN s3 USING (node), nv, d3)
      SELECT r3.node, n_name, pr
      FROM r3 JOIN nation ON r3.node = n_nationkey
      ORDER BY node"""

  // ---- g02: co-purchase projection (bipartite order-part graph) ----
  // "Customers who bought X also bought Y": project the bipartite
  // order->part graph onto parts, edge weight = number of orders
  // containing both. The pair expansion is bounded by ORDER SIZE
  // (lineitem caps lines per order at single digits), so per-order
  // pairs are a small constant and total work stays linear in the fact
  // table — this is the blocking structure that makes co-occurrence
  // projection feasible at 100 TB, vs the part x part join that isn't.
  // Exactly TWO shuffles: collect_set on orderkey (map-side
  // combinable — no self-join, which would cost a distinct exchange
  // PLUS a join exchange) with the pair expansion done IN-ROW over the
  // sorted set, then the pair-key count; the global top-25 rides
  // TakeOrderedAndProject — no single-task window, no full sort.
  val g02_copurchase: Q = (s, d) => {
    copurchasePairs(s, d)
      .select(col("a").as("part_a"), col("b").as("part_b"),
        col("w").as("n_orders"))
      // deterministic top-25: weight desc, pair-id tiebreak — a total
      // order, so the selected SET is engine-exact without a rank col
      .orderBy(desc("n_orders"), col("part_a"), col("part_b"))
      .limit(25)
  }
  val g02Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                   FROM lineitem)
      SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS n_orders
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
      ORDER BY n_orders DESC, part_a, part_b
      LIMIT 25"""

  // ---- g03: triangle census / clustering coefficient ----
  // Community structure in one number: triangles + wedges + the global
  // clustering coefficient 3·T/W of the co-purchase graph. The edge
  // list reuses g02's order-size-bounded in-row pair expansion (the
  // fact-scale stage — linear, never part×part), thresholded at
  // weight ≥ 2 so edges carry signal (pairs co-ordered once are noise
  // at any scale, and the threshold is what keeps |E| metadata-sized
  // on a dense corpus). Triangles run the classic "forward" algorithm:
  // edges stored once in a < b orientation, wedge join e1(a,b)⋈e2(b,c)
  // only extends FORWARD (a < b < c) so each triangle is found exactly
  // once, closed by one hash join against e3(a,c). On the thresholded
  // edge table every join side broadcasts; at 100 TB the refinement is
  // degree-ordering the orientation (point the edge at the higher-
  // degree endpoint) which bounds per-vertex forward lists by sqrt|E|
  // — same plan shape, different sort key. Wedges are exact integer
  // sums of deg·(deg−1)/2; the coefficient is one IEEE division.
  // Body = GraftOps.triangleCensusOriented over the thresholded edge
  // build (distinct a<b by construction, so the verb's normalization
  // shuffle is skipped). The triangle join is conf-routable
  // (graft.graph.orientation, default "degree" — the sqrt|E| forward-
  // list bound that survives the densified 20x stress edge set); the
  // census is orientation-independent, so the oracle pins both paths.
  val g03_triangles: Q = (s, d) => {
    val edges = copurchaseEdges(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.api.GraftOps.triangleCensusOriented(edges)
  }
  val g03Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                   FROM lineitem),
      e AS (SELECT x.pk AS a, y.pk AS b
            FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      deg AS (SELECT n, COUNT(*) AS deg FROM (
                SELECT a AS n FROM e UNION ALL SELECT b FROM e) u
              GROUP BY 1),
      nd AS (SELECT COUNT(*) AS n_nodes,
                    CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
             FROM deg),
      ne AS (SELECT COUNT(*) AS n_edges FROM e),
      tr AS (SELECT COUNT(*) AS n_triangles
             FROM e e1 JOIN e e2 ON e1.b = e2.a
                       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
      SELECT n_nodes, n_edges, n_wedges, n_triangles,
             CASE WHEN n_wedges > 0 THEN
               round(3.0 * CAST(n_triangles AS DOUBLE)
                     / CAST(n_wedges AS DOUBLE), 9) END AS gcc
      FROM nd, ne, tr"""

  // ---- g04: connected components of the co-purchase graph ----
  // The workhorse graph primitive (substitutability clusters here;
  // duplicate clusters, account linking, household resolution in
  // general): components of g03's thresholded co-purchase graph by
  // min-label propagation to fixpoint. The decomposition is the g01
  // discipline: ONE fact-scale pass builds the edge list (order-size-
  // bounded in-row pair expansion — linear, never part x part), then
  // every iteration runs on the edge table alone (metadata-sized after
  // the >= 2 threshold). Convergence in O(diameter) rounds, detected by
  // an exact DECIMAL(38,0) label-sum fixpoint (strictly decreasing
  // until converged — a one-row scalar per round, the d08 discipline);
  // localCheckpoint truncates the growing lineage each round. At 100 TB
  // the refinement is alternating large-star/small-star (Kiveris et al.
  // 2014), which cuts rounds to O(log n) with the same per-round plan
  // shape. The fixpoint itself is iteration-order independent — any
  // engine, any schedule, same labels — which is what makes an exact
  // DuckDB oracle possible (recursive-CTE transitive closure).
  /** The thresholded a<b co-purchase edge list + min-label component
    * labels (g04's fixpoint) — shared by g04 and g08. The returned
    * edges frame is persisted; callers unpersist when done.
    */
  // Label propagation = GraftOps.connectedComponents (the verb carries
  // the fixpoint discipline: exact decimal label-sum convergence, lazy
  // localCheckpoint per round — one job/round; a measured pointer-jump
  // dead end and the large-star/small-star 100 TB refinement are
  // documented on the verb). This helper contributes the fact-scale
  // edge build shared by g04/g08.
  private def ccEdgesAndLabels(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val edges = copurchaseEdges(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the component labels are the family's second artifact: the
    // iterative fixpoint is paid once at build time and read here
    val labels = graft.api.GraphArtifactStore.ccLabelsIfPresent(s, d)
      .getOrElse(
        graft.api.GraftOps.connectedComponents(edges, col("a"), col("b")))
    (edges, labels)
  }

  val g04_cc: Q = (s, d) => {
    val (edges, labels) = ccEdgesAndLabels(s, d)
    edges.unpersist()
    labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"), max("node").as("max_part"))
      .orderBy("cluster_id")
  }
  val g04Sql: String =
    """WITH RECURSIVE
      li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             FROM lineitem),
      e AS (SELECT x.pk AS a, y.pk AS b
            FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      ed AS (SELECT a AS v, b AS w FROM e UNION SELECT b, a FROM e),
      reach(v, w) AS (
        SELECT v, v FROM (SELECT DISTINCT v FROM ed) t
        UNION
        SELECT r.v, ed.w FROM reach r JOIN ed ON r.w = ed.v),
      lbl AS (SELECT v AS node, min(w) AS cluster_id FROM reach GROUP BY v)
      SELECT cluster_id, COUNT(*) AS n_members, max(node) AS max_part
      FROM lbl GROUP BY cluster_id ORDER BY cluster_id"""

  // ---- g05: degree distribution (the first graph diagnostic) ----
  // Before any graph algorithm is trusted, its degree distribution:
  // per-degree node counts over the thresholded co-purchase graph plus
  // the CCDF — heavy-tail or not decides whether skew mitigations
  // (degree-ordered orientation in g03, salting in joins) are needed.
  // Edge build is the one fact-scale pass (g02 shape); degrees and the
  // degree histogram are two combinable aggregates; the CCDF's
  // cumulative sum runs over the DISTINCT-DEGREE frame (dozens of
  // rows) inside a bounded single group. Exact integers + one division
  // per CCDF point.
  val g05_degree_dist: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val edges = copurchaseEdges(s, d)
    val deg = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val hist = deg.groupBy("deg").agg(count(lit(1)).as("n_nodes"))
    val tot = hist.agg(sum("n_nodes").as("n_total"))
    val g = graft.api.GraftOps.boundedSingleGroup(hist)
    val w = Window.partitionBy("__g").orderBy(desc("deg"))
      .rowsBetween(Window.unboundedPreceding, 0)
    g.withColumn("cum_ge", sum("n_nodes").over(w))
      .crossJoin(broadcast(tot))
      .select(col("deg"), col("n_nodes"),
        col("cum_ge"),
        round(col("cum_ge").cast("double") / col("n_total").cast("double"), 9)
          .as("ccdf"))
      .orderBy("deg")
  }
  val g05Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                 FROM lineitem),
      e AS (SELECT x.pk AS a, y.pk AS b
            FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      dg AS (SELECT n, COUNT(*) AS deg FROM (
               SELECT a AS n FROM e UNION ALL SELECT b FROM e) u
             GROUP BY 1),
      h AS (SELECT deg, COUNT(*) AS n_nodes FROM dg GROUP BY 1),
      t AS (SELECT CAST(SUM(n_nodes) AS BIGINT) AS n_total FROM h),
      c AS (SELECT deg, n_nodes,
              CAST(SUM(n_nodes) OVER (ORDER BY deg DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_ge
            FROM h)
      SELECT deg, n_nodes, cum_ge,
             round(CAST(cum_ge AS DOUBLE) / CAST(n_total AS DOUBLE), 9) AS ccdf
      FROM c CROSS JOIN t ORDER BY deg"""

  // ---- g06: link prediction via neighbor-set Jaccard ----
  // "Which products WOULD co-sell but haven't yet?" — the classic
  // common-neighbors / Jaccard link predictor over the co-purchase
  // graph. Reuses g03's thresholded a<b edge list (fact-scale work is
  // the order-bounded in-row pair expand — linear); candidates come
  // from the FORWARD wedge join on the symmetric adjacency (per-center
  // expansion bounded by deg² on a metadata-sized edge table; the
  // 100 TB refinement is a per-vertex degree cap, same plan), existing
  // edges removed by one anti join. Jaccard = cn / (deg_a + deg_b − cn)
  // over exact int64 counts; ranking keys on the ROUNDED score with
  // (cn, a, b) tie-breaks so order can't flip between engines; top-15
  // via TakeOrderedAndProject — no global sort materializes.
  val g06_link_prediction: Q = (s, d) => {
    val edges = copurchaseEdges(s, d)
    // the library verb (GraftOps.linkPredict) IS the wedge/anti-join/
    // rank engine — the oracle gate certifies the facade itself
    graft.api.GraftOps.linkPredict(edges, col("a"), col("b"), 15)
  }
  val g06Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                   FROM lineitem),
      e AS (SELECT x.pk AS a, y.pk AS b
            FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      adj AS (SELECT a AS n, b AS nbr FROM e
              UNION ALL SELECT b, a FROM e),
      deg AS (SELECT n, COUNT(*) AS deg FROM adj GROUP BY 1),
      wed AS (SELECT l.n AS x, r.nbr AS y, COUNT(*) AS cn
              FROM adj l JOIN adj r ON l.nbr = r.n AND l.n < r.nbr
              GROUP BY 1, 2),
      cand AS (SELECT * FROM wed
               WHERE NOT EXISTS (SELECT 1 FROM e
                                 WHERE e.a = wed.x AND e.b = wed.y))
      SELECT x AS part_a, y AS part_b, cn,
             round(CAST(cn AS DOUBLE)
                   / CAST(dx.deg + dy.deg - cn AS DOUBLE), 9) AS jaccard
      FROM cand JOIN deg dx ON dx.n = x JOIN deg dy ON dy.n = y
      ORDER BY jaccard DESC, cn DESC, part_a, part_b LIMIT 15"""

  // ---- g07: user-user collaborative-filtering recommendations ----
  // The classic neighborhood CF kernel end-to-end: customer similarity
  // by Jaccard over purchased-part sets (part-keyed join — expansion
  // bounded by part degree, the customers-per-part count; the 100 TB
  // mitigation is inverse-frequency capping of ubiquitous parts, which
  // only drops the least informative co-occurrences), top-3 neighbors
  // per query customer, then parts OWNED BY neighbors but NOT by the
  // user, scored by the decimal-exact sum of neighbor similarities.
  // Every ranking keys on ROUNDED scores with id tie-breaks; the query
  // set (custkey <= 10) is a deterministic sample, so the whole
  // recommend table is engine-exact.
  val g07_cf_recommend: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    // r14 audit note: a gated spread of the fact side (the g10/v06 fix)
    // was A/B'd here and REJECTED — min-of-5 pairs read NEW 1.80 s vs
    // OLD 1.64 s at 32 cores: g07's map stage is cheap (distinct
    // partial-agg over two ints), so the added exchange outweighs the
    // 3-task scan floor it removes.
    val cp = Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = cp.groupBy("c").agg(count(lit(1)).as("n"))
    val pairs = cp.select(col("c").as("cx"), col("p"))
      .join(cp.select(col("c").as("cy"), col("p")), "p")
      .where(col("cx") =!= col("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("c").as("cx"), col("n").as("nx")), "cx")
      .join(sizes.select(col("c").as("cy"), col("n").as("ny")), "cy")
      .withColumn("jacc", round(col("shared").cast("double")
        / (col("nx") + col("ny") - col("shared")).cast("double"), 9))
    val nbrs = pairs.filter(col("cx") <= 10)
      .withColumn("nr", row_number().over(
        Window.partitionBy("cx").orderBy(desc("jacc"), col("cy"))))
      .filter(col("nr") <= 3)
      .select(col("cx"), col("cy"), col("jacc"))
    val recs = nbrs
      .join(cp.select(col("c").as("cy"), col("p")), "cy")
      .join(cp.select(col("c").as("cx"), col("p")), Seq("cx", "p"), "left_anti")
      .groupBy("cx", "p")
      .agg(sum(col("jacc").cast("decimal(30,10)")).cast("double").as("score"))
    recs
      .withColumn("score", round(col("score"), 9))
      .withColumn("rank", row_number().over(
        Window.partitionBy("cx").orderBy(desc("score"), col("p"))).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("cx").as("custkey"), col("rank"),
        col("p").as("partkey"), col("score"))
      .orderBy("custkey", "rank")
  }
  val g07Sql: String =
    """WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      sz AS (SELECT c, COUNT(*) AS n FROM cp GROUP BY 1),
      pr AS (SELECT x.c AS cx, y.c AS cy, COUNT(*) AS shared
             FROM cp x JOIN cp y ON x.p = y.p AND x.c <> y.c
             GROUP BY 1, 2),
      jc AS (SELECT cx, cy,
               round(CAST(shared AS DOUBLE)
                     / CAST(sx.n + sy.n - shared AS DOUBLE), 9) AS jacc
             FROM pr JOIN sz sx ON sx.c = cx JOIN sz sy ON sy.c = cy),
      nb AS (SELECT cx, cy, jacc FROM (
               SELECT *, row_number() OVER (PARTITION BY cx
                          ORDER BY jacc DESC, cy) AS nr
               FROM jc WHERE cx <= 10) WHERE nr <= 3),
      rec AS (SELECT cx, yp.p,
                CAST(SUM(CAST(jacc AS DECIMAL(30,10))) AS DOUBLE) AS score
              FROM nb JOIN cp yp ON yp.c = nb.cy
              WHERE NOT EXISTS (SELECT 1 FROM cp xp
                                WHERE xp.c = nb.cx AND xp.p = yp.p)
              GROUP BY 1, 2)
      SELECT custkey, rank, partkey, score FROM (
        SELECT cx AS custkey, p AS partkey, round(score, 9) AS score,
               CAST(row_number() OVER (PARTITION BY cx
                      ORDER BY round(score, 9) DESC, p) AS BIGINT) AS rank
        FROM rec) WHERE rank <= 3
      ORDER BY custkey, rank"""

  // ---- g08: partition modularity (are the components real communities?) ----
  // Newman modularity Q = Σ_c [ m_c/m − (d_c/2m)² ] of g04's component
  // partition over the co-purchase graph — the score that says whether
  // the discovered clusters are denser than chance (Q≈0: the partition
  // explains nothing; for pure connected components every edge is
  // intra-cluster, so Q measures how evenly edge mass spreads across
  // components). Per-cluster contributions + the global Q riding every
  // row; all from exact int64 edge/degree counts (the fixpoint labels
  // are the only iterative work, reused from g04), closed form in
  // doubles rounded 1e-9.
  val g08_modularity: Q = (s, d) => {
    val (edges, labels) = ccEdgesAndLabels(s, d)
    val m = edges.agg(count(lit(1)).as("m"))
    val la = labels.select(col("node").as("a"), col("cluster_id").as("ca"))
    val lb = labels.select(col("node").as("b"), col("cluster_id").as("cb"))
    val mIn = edges.join(la, "a").join(lb, "b")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("cluster_id")).agg(count(lit(1)).as("m_in"))
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val dTot = deg.join(labels, "node")
      .groupBy("cluster_id").agg(sum("deg").as("d_tot"),
        count(lit(1)).as("n_members"))
    val per = dTot.join(mIn, Seq("cluster_id"), "left")
      .na.fill(0L, Seq("m_in"))
      .crossJoin(broadcast(m))
      .withColumn("q_contrib", round(
        col("m_in").cast("double") / col("m").cast("double")
          - (col("d_tot").cast("double") / (lit(2.0) * col("m").cast("double")))
            * (col("d_tot").cast("double") / (lit(2.0) * col("m").cast("double"))), 9))
    val qTot = per.agg(round(
      sum(col("q_contrib").cast("decimal(30,10)")).cast("double"), 9)
      .as("modularity"))
    edges.unpersist()
    per.crossJoin(broadcast(qTot))
      .select(col("cluster_id"), col("n_members"), col("m_in"), col("d_tot"),
        col("q_contrib"), col("modularity"))
      .orderBy("cluster_id")
  }
  val g08Sql: String =
    """WITH RECURSIVE
      li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             FROM lineitem),
      e AS (SELECT x.pk AS a, y.pk AS b
            FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      ed AS (SELECT a AS v, b AS w FROM e UNION SELECT b, a FROM e),
      reach(v, w) AS (
        SELECT v, v FROM (SELECT DISTINCT v FROM ed) t
        UNION
        SELECT r.v, ed.w FROM reach r JOIN ed ON r.w = ed.v),
      lbl AS (SELECT v AS node, min(w) AS cluster_id FROM reach GROUP BY v),
      m AS (SELECT COUNT(*) AS m FROM e),
      mi AS (SELECT la.cluster_id, COUNT(*) AS m_in
             FROM e JOIN lbl la ON la.node = e.a
                    JOIN lbl lb ON lb.node = e.b
             WHERE la.cluster_id = lb.cluster_id GROUP BY 1),
      dg AS (SELECT n AS node, COUNT(*) AS deg FROM (
               SELECT a AS n FROM e UNION ALL SELECT b FROM e) u GROUP BY 1),
      dt AS (SELECT cluster_id, CAST(SUM(deg) AS BIGINT) AS d_tot,
               COUNT(*) AS n_members
             FROM dg JOIN lbl ON dg.node = lbl.node GROUP BY 1),
      per AS (SELECT dt.cluster_id, n_members,
                COALESCE(m_in, 0) AS m_in, d_tot,
                round(CAST(COALESCE(m_in, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
                  - (CAST(d_tot AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE)))
                    * (CAST(d_tot AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE))), 9)
                  AS q_contrib
              FROM dt LEFT JOIN mi ON dt.cluster_id = mi.cluster_id
                      CROSS JOIN m),
      qt AS (SELECT round(CAST(SUM(CAST(q_contrib AS DECIMAL(30,10)))
                AS DOUBLE), 9) AS modularity FROM per)
      SELECT cluster_id, n_members, m_in, d_tot, q_contrib, modularity
      FROM per CROSS JOIN qt ORDER BY cluster_id"""

  // ---- g09: degree assortativity (do hubs link to hubs?) ----
  // Pearson correlation of endpoint degrees over the edge list — the
  // diagnostic that decides whether hub-capping (g06's maxDegree) and
  // skew salting actually matter: disassortative graphs (hubs link to
  // leaves, r < 0) concentrate wedge work in hubs; assortative ones
  // spread it. Each undirected edge contributes BOTH orientations (the
  // standard Newman convention, making the correlation symmetric).
  // Exact int64 degree moments, closed form in doubles rounded 1e-9;
  // the edge build is the only fact-scale stage.
  val g09_assortativity: Q = (s, d) => {
    val edges = copurchaseEdges(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val dir = edges.select(col("a").as("x"), col("b").as("y"))
      .unionAll(edges.select(col("b").as("x"), col("a").as("y")))
    val pairs = dir
      .join(deg.select(col("n").as("x"), col("deg").as("dx")), "x")
      .join(deg.select(col("n").as("y"), col("deg").as("dy")), "y")
    pairs.agg(count(lit(1)).as("m2"),
        sum(col("dx").cast("decimal(30,0)")).as("sx"),
        sum(col("dy").cast("decimal(30,0)")).as("sy"),
        sum((col("dx") * col("dy")).cast("decimal(38,0)")).as("sxy"),
        sum((col("dx") * col("dx")).cast("decimal(38,0)")).as("sxx"),
        sum((col("dy") * col("dy")).cast("decimal(38,0)")).as("syy"))
      .select(col("m2").as("n_edge_ends"),
        round((col("m2").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (sqrt(col("m2").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
            * sqrt(col("m2").cast("double") * col("syy").cast("double")
              - col("sy").cast("double") * col("sy").cast("double"))), 9)
          .as("assortativity"))
  }
  val g09Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                   FROM lineitem),
      e AS (SELECT x.pk AS a, y.pk AS b
            FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      deg AS (SELECT n, COUNT(*) AS deg FROM (
                SELECT a AS n FROM e UNION ALL SELECT b FROM e) u GROUP BY 1),
      dir AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
      pr AS (SELECT dx.deg AS dx, dy.deg AS dy
             FROM dir JOIN deg dx ON dx.n = dir.x
                      JOIN deg dy ON dy.n = dir.y),
      m AS (SELECT COUNT(*) AS m2,
              CAST(SUM(CAST(dx AS DECIMAL(30,0))) AS DOUBLE) AS sx,
              CAST(SUM(CAST(dy AS DECIMAL(30,0))) AS DOUBLE) AS sy,
              CAST(SUM(CAST(dx * dy AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
              CAST(SUM(CAST(dx * dx AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
              CAST(SUM(CAST(dy * dy AS DECIMAL(38,0))) AS DOUBLE) AS syy
            FROM pr)
      SELECT m2 AS n_edge_ends,
             round((CAST(m2 AS DOUBLE) * sxy - sx * sy)
                   / (sqrt(CAST(m2 AS DOUBLE) * sxx - sx * sx)
                      * sqrt(CAST(m2 AS DOUBLE) * syy - sy * sy)), 9)
               AS assortativity
      FROM m"""

  // ---- g10: temporal graph diff (edge churn between periods) ----
  // q54 diffs snapshots of a TABLE; this diffs snapshots of a GRAPH:
  // the co-purchase edge set built from the first half of order
  // history vs the second (median order-date split — an exact integer
  // percentile, engine-identical), classified persisting / new /
  // dropped by one full-outer join on the edge key. The churn table
  // is how a recommender decides whether yesterday's edge weights are
  // still trustworthy. Each period's edge build is the g02 fact-scale
  // pass; the diff join runs on metadata-sized edge sets.
  val g10_graph_diff: Q = (s, d) => {
    // gated spread of the fact side — see g07's note (the join map
    // stage was 1.2 s over 3 row-group tasks at sf0.1)
    val dated = graft.api.GraftOps.spreadNarrowScan(Tables.lineitem(s, d))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date")).as("dd"))
    val mid = dated.agg(expr("CAST(floor(percentile(dd, 0.5D)) AS BIGINT)").as("mid"))
    // ONE fact pass builds both periods' edge sets: per (order, period)
    // part-set expand, then a single (a, b) aggregate carrying per-period
    // counts — the two-build formulation paid the fact-scale expand twice
    // (measured 26 s at 20x facts; this shape halves it)
    val pairCounts = dated.crossJoin(broadcast(mid))
      .withColumn("period", when(col("dd") <= col("mid"), 1).otherwise(2))
      .groupBy(col("ok"), col("period"))
      .agg(sort_array(collect_set(col("pk"))).as("ps"))
      .select(col("period"), explode(expr(
        """flatten(transform(ps, (x, i) ->
             transform(slice(ps, i + 2, size(ps)),
               y -> struct(x AS a, y AS b))))""")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(when(col("period") === 1, 1)).as("c1"),
        count(when(col("period") === 2, 1)).as("c2"))
    val classed = pairCounts
      .filter(col("c1") >= 2 || col("c2") >= 2)
      .withColumn("w1", when(col("c1") >= 2, col("c1")))
      .withColumn("w2", when(col("c2") >= 2, col("c2")))
      .filter(col("w1").isNotNull || col("w2").isNotNull)
      .withColumn("edge_class",
        when(col("w1").isNotNull && col("w2").isNotNull, "1_persisting")
          .when(col("w2").isNotNull, "2_new").otherwise("3_dropped"))
    val tot = classed.agg(count(lit(1)).as("n_total"))
    classed.groupBy("edge_class")
      .agg(count(lit(1)).as("n_edges"),
        sum(coalesce(col("w1"), lit(0L))).as("weight_p1"),
        sum(coalesce(col("w2"), lit(0L))).as("weight_p2"))
      .crossJoin(broadcast(tot))
      .withColumn("share", round(
        col("n_edges").cast("double") / col("n_total").cast("double"), 9))
      .select(col("edge_class"), col("n_edges"), col("share"),
        col("weight_p1"), col("weight_p2"))
      .orderBy("edge_class")
  }
  val g10Sql: String =
    """WITH dated AS (SELECT l_orderkey AS ok, l_partkey AS pk,
             datediff('day', DATE '1970-01-01', o_orderdate) AS dd
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      mid AS (SELECT CAST(floor(quantile_cont(dd, 0.5)) AS BIGINT) AS mid
              FROM dated),
      li1 AS (SELECT DISTINCT ok, pk FROM dated CROSS JOIN mid WHERE dd <= mid),
      li2 AS (SELECT DISTINCT ok, pk FROM dated CROSS JOIN mid WHERE dd > mid),
      e1 AS (SELECT x.pk AS a, y.pk AS b, COUNT(*) AS w1
             FROM li1 x JOIN li1 y ON x.ok = y.ok AND x.pk < y.pk
             GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      e2 AS (SELECT x.pk AS a, y.pk AS b, COUNT(*) AS w2
             FROM li2 x JOIN li2 y ON x.ok = y.ok AND x.pk < y.pk
             GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      cl AS (SELECT COALESCE(e1.a, e2.a) AS a, COALESCE(e1.b, e2.b) AS b,
               w1, w2,
               CASE WHEN w1 IS NOT NULL AND w2 IS NOT NULL THEN '1_persisting'
                    WHEN w2 IS NOT NULL THEN '2_new'
                    ELSE '3_dropped' END AS edge_class
             FROM e1 FULL OUTER JOIN e2 ON e1.a = e2.a AND e1.b = e2.b),
      tot AS (SELECT COUNT(*) AS n_total FROM cl)
      SELECT edge_class, COUNT(*) AS n_edges,
             round(CAST(COUNT(*) AS DOUBLE) / CAST(n_total AS DOUBLE), 9)
               AS share,
             CAST(SUM(COALESCE(w1, 0)) AS BIGINT) AS weight_p1,
             CAST(SUM(COALESCE(w2, 0)) AS BIGINT) AS weight_p2
      FROM cl CROSS JOIN tot GROUP BY 1, n_total ORDER BY edge_class"""

  val queries: Map[String, Q] = Map(
    "g10_graph_diff"      -> g10_graph_diff,
    "g09_assortativity"   -> g09_assortativity,
    "g08_modularity"      -> g08_modularity,
    "g07_cf_recommend"    -> g07_cf_recommend,
    "g06_link_prediction" -> g06_link_prediction,
    "g01_pagerank"   -> g01_pagerank,
    "g05_degree_dist" -> g05_degree_dist,
    "g02_copurchase" -> g02_copurchase,
    "g03_triangles"  -> g03_triangles,
    "g04_cc"         -> g04_cc,
  )
  val oracles: Map[String, String] = Map(
    "g10_graph_diff"      -> g10Sql,
    "g09_assortativity"   -> g09Sql,
    "g08_modularity"      -> g08Sql,
    "g07_cf_recommend"    -> g07Sql,
    "g06_link_prediction" -> g06Sql,
    "g01_pagerank"   -> g01Sql,
    "g05_degree_dist" -> g05Sql,
    "g02_copurchase" -> g02Sql,
    "g03_triangles"  -> g03Sql,
    "g04_cc"         -> g04Sql,
  )
}
