package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dedup family, part 2: cluster resolution and incremental ingestion —
  * the two operations that turn pair-finding (d02-d06) into an actual
  * corpus-dedup system.
  *
  * Scale design: d08 is Pregel-style iterative min-label propagation —
  * every round is one distributed shuffle on doc_id, converging in
  * O(cluster diameter) rounds (near-dup clusters are shallow in practice;
  * the alternating small-star/large-star construction of Kiveris et al.
  * 2014 gives O(log n) worst-case with the same per-round plan shape).
  * `localCheckpoint` truncates the growing lineage each round — on a real
  * cluster this is `checkpoint` to HDFS/S3. d09 is the nightly-ingest
  * path: a batch never rescans the existing corpus' text, only its
  * (hash, doc_id) index.
  */
object Dedup2 {
  type Q = (SparkSession, String) => DataFrame

  /** Verified near-dup pairs (d03 semantics): word-3-gram Jaccard >= 0.5.
    * Uses the inverted-index join (d03 plan): on this synthetic corpus
    * every 3-gram is frequent, so prefix filtering (d11) prunes little
    * while adding stages — see the Dedup3 scaladoc for when each wins.
    */
  private def nearDupPairs(s: SparkSession, d: String): DataFrame =
    Dedup.verifiedPairs(s, d).select("da", "db")

  // ---- d08: near-dup cluster resolution (connected components) ----
  // Pairs are edges; every document is a vertex; the cluster id is the
  // minimum doc_id reachable through near-dup edges. Iterative min-label
  // propagation: each round joins current labels across edges and takes
  // the per-vertex min. Labels only ever decrease, so sum(label) is a
  // strictly-decreasing convergence metric — one cheap agg action per
  // round instead of a change-detection join.
  /** Per-document cluster label: min doc_id reachable via near-dup edges.
    * Exposed for the spec (fixpoint + pair-agreement properties).
    */
  def clusterLabels(s: SparkSession, d: String): DataFrame = {
    // materialized-artifact route (see DedupArtifactStore): the CC
    // fixpoint ran once in the cleaning run; audits read its labels
    graft.api.DedupArtifactStore.readIfPresent(s, d, "labels").foreach { t =>
      return t.select(col("id").as("doc_id"), col("cluster_id"))
    }
    // Only vertices touched by an edge ever enter the fixpoint (the
    // verb iterates over edge-touched nodes alone — typically a small
    // fraction of the corpus); singletons join back afterwards with
    // label = own id. The verb is conf-routed: `graft.graph.cc` picks
    // min-label propagation (default) or large-star/small-star
    // contraction — identical labels either way (spec-pinned).
    val labels = graft.api.GraftOps
      .connectedComponents(nearDupPairs(s, d), col("da"), col("db"))
      .withColumnRenamed("node", "doc_id")
    val singletons = Tables.documents(s, d).select(col("doc_id"))
      .join(labels.select("doc_id"), Seq("doc_id"), "left_anti")
      .withColumn("cluster_id", col("doc_id"))
    labels.union(singletons)
  }

  val d08_dup_clusters: Q = (s, d) => {
    clusterLabels(s, d)
      .groupBy("cluster_id").agg(
        count(lit(1)).as("n_members"), collect_set("doc_id").as("members"))
      .select(col("cluster_id"), col("n_members"),
        array_min(col("members")).as("min_doc"), array_max(col("members")).as("max_doc"))
      .filter(col("n_members") > 1)
      .orderBy("cluster_id")
  }
  // Oracle: transitive closure via recursive CTE over the same verified
  // pairs (DuckDB recursive UNION dedups rows, so the closure terminates).
  val d08Sql: String =
    """WITH RECURSIVE
      w AS (SELECT doc_id, generate_subscripts(string_split(text,' '),1) i,
                   unnest(string_split(text,' ')) w FROM documents),
      g AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS sh
            FROM w a JOIN w b ON a.doc_id=b.doc_id AND b.i=a.i+1
                     JOIN w c ON c.doc_id=a.doc_id AND c.i=a.i+2),
      dd AS (SELECT DISTINCT doc_id, sh FROM g),
      sizes AS (SELECT doc_id, count(*) n FROM dd GROUP BY doc_id),
      pairs AS (SELECT x.doc_id da, y.doc_id db, count(*) shared
                FROM dd x JOIN dd y ON x.sh=y.sh AND x.doc_id<y.doc_id GROUP BY 1,2),
      e AS (SELECT da, db FROM pairs JOIN sizes sa ON da=sa.doc_id
                                     JOIN sizes sb ON db=sb.doc_id
            WHERE CAST(shared AS DOUBLE)/(sa.n+sb.n-shared) >= 0.5),
      ed AS (SELECT da v, db w FROM e UNION SELECT db, da FROM e),
      reach(v, w) AS (
        SELECT v, v FROM (SELECT DISTINCT v FROM ed) t
        UNION
        SELECT r.v, ed.w FROM reach r JOIN ed ON r.w = ed.v),
      lbl AS (SELECT v AS doc_id, min(w) AS cluster_id FROM reach GROUP BY v)
      SELECT cluster_id, COUNT(*) AS n_members,
             min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM lbl GROUP BY cluster_id HAVING COUNT(*) > 1 ORDER BY cluster_id"""

  // ---- d09: incremental dedup (nightly-ingest path) ----
  // New batch (simulated: doc_id % 5 = 0) deduped in two stages:
  // (1) within-batch exact dedup (keep min doc_id per normalized hash),
  // (2) anti-join against the existing corpus' hash index. At 100 TB the
  // corpus side is just its (hash) index — never re-read, never re-hashed;
  // both stages shuffle only 16-byte hashes.
  private val normSpark = "md5(trim(regexp_replace(lower(text), '\\\\s+', ' ')))"
  private val normDuck  = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
  val d09_incremental_dedup: Q = (s, d) => {
    val docs = Tables.documents(s, d).withColumn("h", expr(normSpark))
    val corpus = docs.filter(col("doc_id") % 5 =!= 0).select("h").distinct()
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val withinBatch = batch
      .groupBy("h").agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_batch_copies"))
    withinBatch.join(corpus, Seq("h"), "left_anti")
      .select("doc_id", "h", "n_batch_copies")
      .orderBy("doc_id")
  }
  val d09Sql: String =
    s"""WITH docs AS (SELECT doc_id, $normDuck AS h FROM documents),
      corpus AS (SELECT DISTINCT h FROM docs WHERE doc_id % 5 <> 0),
      batch AS (SELECT min(doc_id) AS doc_id, h, COUNT(*) AS n_batch_copies
                FROM docs WHERE doc_id % 5 = 0 GROUP BY h)
      SELECT doc_id, h, n_batch_copies FROM batch
      WHERE h NOT IN (SELECT h FROM corpus) ORDER BY doc_id"""

  // ---- d10: bloom-accelerated incremental dedup (exact result) ----
  // Same output as d09, but the corpus side first folds into a Bloom
  // filter (distributed build: map-side OR-mergeable aggregate, one-row
  // binary result broadcast to the probes). Batch rows the bloom rules
  // out are definitely new and skip the anti-join; only the "maybe"
  // rows (true dups + false positives) shuffle against the corpus index.
  // At 100 TB the bloom is ~10 bits/key vs the full 16-byte hash index —
  // the anti-join's shuffle shrinks by the batch's true-new fraction.
  // False positives cost only wasted verification, never wrong results,
  // so the query stays exact and shares d09's oracle.
  val d10_bloom_dedup: Q = (s, d) => {
    import graft.functions.{bloom_agg, bloom_might_contain}
    val docs = Tables.documents(s, d).withColumn("h", expr(normSpark))
    val corpus = docs.filter(col("doc_id") % 5 =!= 0).select("h").distinct()
    val bloom = corpus.agg(bloom_agg(col("h"), 1 << 16, 5).as("bloom"))
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .groupBy("h").agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_batch_copies"))
      .join(broadcast(bloom))
      .withColumn("maybe", bloom_might_contain(col("bloom"), col("h"), 5))
    val definitelyNew = batch.filter(!col("maybe"))
    val verified = batch.filter(col("maybe"))
      .join(corpus, Seq("h"), "left_anti")
    definitelyNew.select("doc_id", "h", "n_batch_copies")
      .union(verified.select("doc_id", "h", "n_batch_copies"))
      .orderBy("doc_id")
  }

  // ---- d13: representative selection (keep the longest duplicate) ----
  // Cluster resolution (d08) composed with the realistic keep policy:
  // training-data dedup keeps the LONGEST member of each near-dup
  // cluster (most content survives), not the smallest id. One window
  // over the cluster-labeled table — document payloads never join into
  // the iterative propagation, only (doc_id, n_chars).
  val d13_keep_best: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val sized = clusterLabels(s, d)
      .join(Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id")
    sized
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .filter(col("n_members") > 1)
      .withColumn("rk", row_number().over(
        Window.partitionBy("cluster_id").orderBy(desc("n_chars"), col("doc_id"))))
      .filter(col("rk") === 1)
      .select(col("cluster_id"), col("doc_id").as("rep_doc"),
        col("n_members"), col("n_chars").as("rep_chars"))
      .orderBy("cluster_id")
  }
  private val d08Ctes = d08Sql.substring(0, d08Sql.lastIndexOf("SELECT cluster_id"))
  val d13Sql: String = d08Ctes +
    """, sized AS (SELECT l.doc_id, l.cluster_id, d.n_chars
                FROM lbl l JOIN documents d USING (doc_id)),
      m AS (SELECT *, COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
            FROM sized),
      r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
              ORDER BY n_chars DESC, doc_id) AS rk
            FROM m WHERE n_members > 1)
      SELECT cluster_id, doc_id AS rep_doc, n_members, n_chars AS rep_chars
      FROM r WHERE rk = 1 ORDER BY cluster_id"""

  val queries: Map[String, Q] = Map(
    "d08_dup_clusters"     -> d08_dup_clusters,
    "d09_incremental_dedup" -> d09_incremental_dedup,
    "d10_bloom_dedup"      -> d10_bloom_dedup,
    "d13_keep_best"        -> d13_keep_best,
  )
  val oracles: Map[String, String] = Map(
    "d08_dup_clusters"     -> d08Sql,
    "d09_incremental_dedup" -> d09Sql,
    "d10_bloom_dedup"      -> d09Sql, // exact same output as d09 by design
    "d13_keep_best"        -> d13Sql,
  )
}
