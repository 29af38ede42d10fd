package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** The materialized-artifact contract: operators routed through
  * DedupArtifactStore (d03 pairs / d08-d13 labels / d15 manifest and
  * their consumers) return EXACTLY what the inline path computes — the
  * artifact is a cache of the computation, never a different answer.
  */
class DedupArtifactsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  private def withArtifacts[T](body: => T): T = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_artifacts_spec").toString
    spark.conf.set("graft.dedup.artifacts", dir)
    try {
      api.DedupArtifactStore.buildFor(spark, sf)
      body
    } finally spark.conf.unset("graft.dedup.artifacts")
  }

  test("artifact route == inline route for every routed operator") {
    // inline first (conf off)
    spark.conf.unset("graft.dedup.artifacts")
    val routed: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] =
      Seq(
        "d03_ngram_jaccard" -> operators.Dedup.d03_ngram_jaccard,
        "d08_dup_clusters"  -> operators.Dedup2.d08_dup_clusters,
        "d13_keep_best"     -> ((s, d) => SparkEntry.queries("d13_keep_best")(s, d)),
        "d15_dedup_manifest" -> ((s, d) => SparkEntry.queries("d15_dedup_manifest")(s, d)),
        "d27_transitivity"  -> ((s, d) => SparkEntry.queries("d27_transitivity")(s, d)),
        "d32_dup_family_sizes" -> ((s, d) => SparkEntry.queries("d32_dup_family_sizes")(s, d)),
        "p14_leakage_split" -> ((s, d) => SparkEntry.queries("p14_leakage_split")(s, d)),
        "p01_corpus_clean"  -> ((s, d) => SparkEntry.queries("p01_corpus_clean")(s, d)),
        "p15_stage_ledger"  -> ((s, d) => SparkEntry.queries("p15_stage_ledger")(s, d)),
        "t41_bpe_encode"    -> ((s, d) => SparkEntry.queries("t41_bpe_encode")(s, d)),
        "t43_dedup_token_yield" -> ((s, d) => SparkEntry.queries("t43_dedup_token_yield")(s, d)),
        "d24_lsh_recall"    -> ((s, d) => SparkEntry.queries("d24_lsh_recall")(s, d)),
        "d30_shingle_sensitivity" -> ((s, d) => SparkEntry.queries("d30_shingle_sensitivity")(s, d)))
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

  test("incremental update == full rebuild, table for table") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val cut = docs.agg(expr("percentile(doc_id, 0.7)")).head().getDouble(0)
    val oldDocs = docs.filter(col("doc_id") <= cut)
    val newDocs = docs.filter(col("doc_id") > cut)
    assert(newDocs.count() > 0 && oldDocs.count() > 0)

    val incPath = java.nio.file.Files
      .createTempDirectory("graft_art_inc").toString + "/a"
    val fullPath = java.nio.file.Files
      .createTempDirectory("graft_art_full").toString + "/a"
    api.GraftOps.dedupArtifacts(oldDocs, col("doc_id"), col("text"), incPath)
    api.GraftOps.updateDedupArtifacts(newDocs, col("doc_id"), col("text"),
      incPath)
    api.GraftOps.dedupArtifacts(docs, col("doc_id"), col("text"), fullPath)

    Seq("pairs", "labels", "manifest", "signatures", "docmeta").foreach { t =>
      val inc = rows(sources.SnapshotTable.read(spark, s"$incPath/$t"))
      val full = rows(sources.SnapshotTable.read(spark, s"$fullPath/$t"))
      assert(inc == full, s"incremental '$t' diverged from rebuild " +
        s"(inc ${inc.size} rows vs full ${full.size})")
    }
    // ordering contract refused loudly: replaying OLD ids must throw
    intercept[IllegalArgumentException] {
      api.GraftOps.updateDedupArtifacts(oldDocs.limit(1), col("doc_id"),
        col("text"), incPath)
    }
    api.GraftOps.releaseCaches(); spark.catalog.clearCache()
  }

  test("buildFor is idempotent and artifacts are immutable") {
    withArtifacts {
      // second build is a no-op (returns None), not a failure or rewrite
      assert(api.DedupArtifactStore.buildFor(spark, sf).isEmpty)
      val loc = api.DedupArtifactStore.location(spark, sf).get
      // direct re-build at the same path throws (immutable snapshots)
      intercept[IllegalArgumentException] {
        api.GraftOps.dedupArtifacts(Tables.documents(spark, sf),
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"), loc)
      }
    }
  }

  test("routing is strategy- and corpus-keyed; absent tables fall back inline") {
    withArtifacts {
      val shingleLoc = api.DedupArtifactStore.location(spark, sf).get
      // flip the strategy: location changes, table absent -> inline path
      spark.conf.set("graft.neardup.strategy", "lsh")
      try {
        val lshLoc = api.DedupArtifactStore.location(spark, sf).get
        assert(lshLoc != shingleLoc)
        assert(api.DedupArtifactStore.readIfPresent(spark, sf, "pairs").isEmpty)
        // consumers still answer (inline lsh compute)
        assert(operators.Dedup.d03_ngram_jaccard(spark, sf).count() > 0)
      } finally spark.conf.unset("graft.neardup.strategy")
      // a different corpus dir resolves a different location
      assert(api.DedupArtifactStore.location(spark, "/root/testdata/sf0.01").get
        != shingleLoc)
      api.GraftOps.releaseCaches(); spark.catalog.clearCache()
    }
  }
}
