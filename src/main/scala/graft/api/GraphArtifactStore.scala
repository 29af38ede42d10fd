package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session routing for materialized graph artifacts (the read side of
  * [[GraftOps.graphArtifacts]]) — the [[DedupArtifactStore]] convention
  * applied to the graph-analytics family.
  *
  * Fifteen of the graph analytics share two fact-scale stages. The
  * UNDIRECTED ten (co-purchase top pairs, triangle census, connected
  * components, degree diagnostics, link prediction, modularity,
  * assortativity, k-core, k-hop reach, label propagation) project the
  * co-purchase graph from the order baskets; the DIRECTED five
  * (pagerank, HITS, dyad census, shortest paths, closeness) collapse
  * the same lineitem star join to nation trade lanes. Per-query those
  * plans are right; per RUN they are the recompute anti-pattern the
  * dedup family already retired — a production job projects each graph
  * ONCE and every analytic iterates over the metadata-sized edge
  * table. When the session conf `graft.graph.artifacts` names a base
  * directory AND the tables exist, consumers read them; otherwise they
  * compute inline exactly as before (the correctness gate runs the
  * inline path; GraphArtifactsSpec pins the two routes equal).
  *
  * Layout: `base/<corpus-key>/{pairs,cc_labels,baskets,trade}` where
  * corpus-key is the sanitized fact directory — artifacts from one
  * scale factor are never served to queries over another. The cc
  * labels need no algorithm key: both `graft.graph.cc` routes emit the
  * canonical min-label per component (spec-pinned equal), so labels
  * built under either serve any session. `baskets` is the
  * [[GraftOps.updateGraphArtifacts]] ingest contract's membership set.
  */
object GraphArtifactStore {
  /** The signal threshold the suite's co-purchase graph is built at:
    * pairs co-ordered once are noise, `w >= 2` is signal. Fixed across
    * build and read so the artifact and inline routes see one graph.
    */
  val MinWeight: Long = 2L

  /** Resolved artifact directory for fact dir `d` under the session
    * conf, or None when routing is off.
    */
  def location(s: SparkSession, d: String): Option[String] =
    s.conf.getOption("graft.graph.artifacts").map { base =>
      s"$base/${d.replaceAll("[^A-Za-z0-9._-]", "_")}"
    }

  /** The named artifact table for fact dir `d` when routing is on and
    * the table has been built; None otherwise (caller computes inline).
    */
  def readIfPresent(s: SparkSession, d: String, table: String)
      : Option[DataFrame] =
    location(s, d).flatMap { loc =>
      val p = s"$loc/$table"
      if (graft.sources.SnapshotTable.exists(s, p))
        Some(graft.sources.SnapshotTable.read(s, p))
      else None
    }

  /** Full co-purchase pair counts (a, b, w) — every pair, w >= 1. */
  def pairsIfPresent(s: SparkSession, d: String): Option[DataFrame] =
    readIfPresent(s, d, "pairs")

  /** The signal-thresholded undirected edge list (a, b) at
    * [[MinWeight]] — the graph every iterative analytic runs on.
    */
  def edgesIfPresent(s: SparkSession, d: String): Option[DataFrame] =
    pairsIfPresent(s, d).map(_.filter(col("w") >= MinWeight).select("a", "b"))

  /** Connected-component labels (node, cluster_id) over the signal
    * edges — the iterative fixpoint, paid once at build time.
    */
  def ccLabelsIfPresent(s: SparkSession, d: String): Option[DataFrame] =
    readIfPresent(s, d, "cc_labels")

  /** The DIRECTED nation trade lanes (src, dst, n_ship, lag_day_sum) —
    * the graph family's second shared fact-scale stage: five analytics
    * (g01 pagerank, g11 HITS, g15 dyad census, g16 shortest paths,
    * g17 closeness) all collapse the same lineitem⋈orders⋈customer⋈
    * supplier star join to nation-pair lanes and differ only in the
    * weight they derive (shipment count vs exact lag-sum ratios).
    * Reads the `trade` artifact when routed, else computes the star
    * join inline — bit-identical either way (exact BIGINT count and
    * day-sum).
    */
  def tradeLanes(s: SparkSession, d: String): DataFrame =
    readIfPresent(s, d, "trade").getOrElse(tradeLanesInline(s, d))

  private def tradeLanesInline(s: SparkSession, d: String): DataFrame = {
    import graft.Tables
    Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)
          .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)
          .select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").cast("long").as("src"),
        col("c_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("n_ship"),
        sum(datediff(col("l_shipdate"), col("o_orderdate")))
          .as("lag_day_sum"))
  }

  /** Build the artifact set for the order-basket fact table at `d`
    * into the conf-resolved location. Idempotence is keyed on the LAST
    * table the build writes (`trade`) — keying on the first would let
    * a crashed partial build (or a store populated directly via
    * [[GraftOps.graphArtifacts]], which never writes `trade`) pass as
    * complete forever, silently re-paying the fixpoint/star-join per
    * query; a partial store is instead BACKFILLED table by table.
    * Requires `graft.graph.artifacts` to be set. Returns the summary
    * frame of [[GraftOps.graphArtifacts]], or None when nothing beyond
    * a backfill was needed.
    */
  def buildFor(s: SparkSession, d: String): Option[DataFrame] = {
    val loc = location(s, d).getOrElse(throw new IllegalStateException(
      "graft.graph.artifacts is not set — nothing to build into"))
    val sn = graft.sources.SnapshotTable
    if (sn.exists(s, s"$loc/trade")) None
    else if (sn.exists(s, s"$loc/pairs")) {
      // partial store: backfill labels (from the stored pair table —
      // metadata-sized) and the trade projection, never the pairs
      if (!sn.exists(s, s"$loc/cc_labels")) {
        val edges = sn.read(s, s"$loc/pairs")
          .filter(col("w") >= MinWeight).select("a", "b")
        sn.create(GraftOps.connectedComponents(edges, col("a"), col("b")),
          s"$loc/cc_labels")
      }
      sn.create(tradeLanesInline(s, d), s"$loc/trade")
      None
    } else {
      val summary = GraftOps.graphArtifacts(
        graft.Tables.lineitem(s, d), col("l_orderkey"), col("l_partkey"),
        loc, minWeight = MinWeight)
      // the directed-family analog: the trade star join paid once
      sn.create(tradeLanesInline(s, d), s"$loc/trade")
      Some(summary)
    }
  }
}
