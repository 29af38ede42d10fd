package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** The materialized-artifact contract for the GRAPH family: analytics
  * routed through GraphArtifactStore (the co-purchase pair counts and
  * the component labels) return EXACTLY what the inline path computes —
  * the artifact is a cache of the fact-scale projection, never a
  * different answer.
  */
class GraphArtifactsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  private def withArtifacts[T](body: => T): T = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_graph_artifacts_spec").toString
    spark.conf.set("graft.graph.artifacts", dir)
    try {
      api.GraphArtifactStore.buildFor(spark, sf)
      body
    } finally spark.conf.unset("graft.graph.artifacts")
  }

  test("artifact route == inline route for every routed analytic") {
    spark.conf.unset("graft.graph.artifacts")
    val routed: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] =
      Seq("g02_copurchase", "g03_triangles", "g04_cc", "g05_degree_dist",
        "g06_link_prediction", "g08_modularity", "g09_assortativity",
        "g12_kcore", "g13_khop_reach", "g14_label_propagation",
        // the directed family reads the `trade` lane artifact
        "g01_pagerank", "g11_hits", "g15_dyad_census",
        "g16_shortest_paths", "g17_closeness")
        .map(n => n -> SparkEntry.queries(n))
    val inline = routed.map { case (n, fn) => n -> rows(fn(spark, sf)) }.toMap
    api.GraftOps.releaseCaches(); spark.catalog.clearCache()
    withArtifacts {
      routed.foreach { case (n, fn) =>
        assert(rows(fn(spark, sf)) == inline(n),
          s"$n diverged between artifact and inline routes")
      }
    }
    api.GraftOps.releaseCaches(); spark.catalog.clearCache()
  }

  test("incremental update: build(A)+update(B) == build(A∪B), table for table") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val b = li.filter(col("l_orderkey") % 2 === 1)
    val base = java.nio.file.Files
      .createTempDirectory("graft_graph_incr").toString
    api.GraftOps.graphArtifacts(a, col("l_orderkey"), col("l_partkey"),
      s"$base/incr")
    // replayed baskets are refused — the whole-basket ingest contract
    intercept[IllegalArgumentException] {
      api.GraftOps.updateGraphArtifacts(a, col("l_orderkey"),
        col("l_partkey"), s"$base/incr")
    }
    api.GraftOps.updateGraphArtifacts(b, col("l_orderkey"),
      col("l_partkey"), s"$base/incr")
    api.GraftOps.graphArtifacts(li, col("l_orderkey"), col("l_partkey"),
      s"$base/full")
    for (t <- Seq("pairs", "cc_labels", "baskets")) {
      val got = rows(graft.sources.SnapshotTable.read(spark, s"$base/incr/$t"))
      val want = rows(graft.sources.SnapshotTable.read(spark, s"$base/full/$t"))
      assert(got == want, s"$t diverged between incremental and full build")
    }
    api.GraftOps.releaseCaches()
  }

  test("buildFor backfills partial stores; updates drop the stale trade table") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_graph_backfill").toString
    spark.conf.set("graft.graph.artifacts", dir)
    try {
      val loc = api.GraphArtifactStore.location(spark, sf).get
      // a store built via the generic verb has no trade table...
      api.GraftOps.graphArtifacts(
        Tables.lineitem(spark, sf), col("l_orderkey"), col("l_partkey"), loc)
      assert(api.GraphArtifactStore.readIfPresent(spark, sf, "trade").isEmpty)
      // ...buildFor must BACKFILL it, not declare the store complete
      assert(api.GraphArtifactStore.buildFor(spark, sf).isEmpty)
      assert(api.GraphArtifactStore.readIfPresent(spark, sf, "trade").isDefined)
      // a basket-batch update cannot refresh the full-snapshot trade
      // projection — the stale table must be dropped, not served
      val batch = Tables.lineitem(spark, sf)
        .select((col("l_orderkey") + lit(1000000000L)).as("bk"),
          col("l_partkey").as("it")).limit(50)
      api.GraftOps.updateGraphArtifacts(batch, col("bk"), col("it"), loc)
      assert(api.GraphArtifactStore.readIfPresent(spark, sf, "trade").isEmpty,
        "stale trade lanes must not outlive an incremental update")
      // and the next buildFor backfills it again
      assert(api.GraphArtifactStore.buildFor(spark, sf).isEmpty)
      assert(api.GraphArtifactStore.readIfPresent(spark, sf, "trade").isDefined)
    } finally spark.conf.unset("graft.graph.artifacts")
    api.GraftOps.releaseCaches()
  }

  test("buildFor is idempotent and the store resolves per fact dir") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_graph_artifacts_idem").toString
    spark.conf.set("graft.graph.artifacts", dir)
    try {
      assert(api.GraphArtifactStore.buildFor(spark, sf).isDefined)
      // second build: already present, skipped
      assert(api.GraphArtifactStore.buildFor(spark, sf).isEmpty)
      // the tables exist and the edge view threshold holds
      val pairs = api.GraphArtifactStore.pairsIfPresent(spark, sf).get
      val edges = api.GraphArtifactStore.edgesIfPresent(spark, sf).get
      assert(pairs.columns.toSeq == Seq("a", "b", "w"))
      assert(edges.count() ==
        pairs.filter(org.apache.spark.sql.functions.col("w") >= 2).count())
      // the directed trade-lane artifact landed with the build
      assert(api.GraphArtifactStore.tradeLanes(spark, sf).columns.toSeq
        == Seq("src", "dst", "n_ship", "lag_day_sum"))
      assert(api.GraphArtifactStore
        .readIfPresent(spark, sf, "trade").isDefined)
      // a DIFFERENT fact dir does not resolve to this build
      assert(api.GraphArtifactStore
        .readIfPresent(spark, sf + "_other", "pairs").isEmpty)
    } finally spark.conf.unset("graft.graph.artifacts")
  }
}
