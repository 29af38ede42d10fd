package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Stable, Tables}

/** Similarity, part 2: a full Lloyd iteration (assign + recompute) —
  * the refinement step that turns the s03 seed centroids / s04 coarse
  * quantizer into an actual k-means pass.
  */
object Similarity2 {
  type Q = (SparkSession, String) => DataFrame

  // ---- s06: one k-means refinement step over the label centroids ----
  // Assignment is a narrow pass: the k centroid arrays broadcast to every
  // executor and each vector scores k cosines in-row (sequential double
  // folds — bit-identical to DuckDB's list_dot_product, so even the
  // argmax ranking is engine-exact). Recompute uses decimal-exact
  // per-dimension means (s03's recipe). Two shuffles total (centroid
  // build + recompute), both on small keys; the 100 TB cost is one scan.
  val s06_kmeans_refine: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val cents = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg((sum(col("v").cast("double").cast(DecimalType(30, 10))).cast("double")
        / count(lit(1))).as("mv"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("ps"))
      .select(col("label").as("cl"), expr("transform(ps, p -> p.mv)").as("cent"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("cos", graft.functions.cosine_sim(col("embedding"), col("cent")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("cos"), col("cl"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cl").as("cluster"), col("embedding"))
    assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("cluster", "dim")
      .agg(count(lit(1)).as("nm"),
        (sum(col("v").cast("double").cast(DecimalType(30, 10))).cast("double")
          / count(lit(1))).as("mv"))
      .groupBy("cluster")
      .agg(max("nm").as("n_members"),
        round(min(when(col("dim") === 0, col("mv"))), 9).as("c0"),
        round(min(when(col("dim") === 31, col("mv"))), 9).as("c31"),
        round(min(when(col("dim") === 63, col("mv"))), 9).as("c63"))
      .orderBy("cluster")
  }
  val s06Sql: String =
    """WITH e AS (SELECT label, generate_subscripts(embedding,1)-1 AS dim,
                       unnest(embedding) AS v FROM embeddings),
      m AS (SELECT label, dim,
              CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,10))) AS DOUBLE)/COUNT(*) AS mv
            FROM e GROUP BY 1, 2),
      c AS (SELECT label AS cl, list(mv ORDER BY dim) AS cent FROM m GROUP BY label),
      a AS (SELECT vec_id, embedding, cl,
              list_dot_product(CAST(embedding AS DOUBLE[]), cent)
               / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(cent, cent))) AS cos
            FROM embeddings, c),
      r AS (SELECT vec_id, embedding, cl,
              row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cl) AS rk
            FROM a),
      asg AS (SELECT vec_id, cl AS cluster, embedding FROM r WHERE rk = 1),
      e2 AS (SELECT cluster, generate_subscripts(embedding,1)-1 AS dim,
                    unnest(embedding) AS v FROM asg),
      m2 AS (SELECT cluster, dim, COUNT(*) AS nm,
               CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,10))) AS DOUBLE)/COUNT(*) AS mv
             FROM e2 GROUP BY 1, 2)
      SELECT cluster, max(nm) AS n_members,
             round(min(CASE WHEN dim = 0  THEN mv END), 9) AS c0,
             round(min(CASE WHEN dim = 31 THEN mv END), 9) AS c31,
             round(min(CASE WHEN dim = 63 THEN mv END), 9) AS c63
      FROM m2 GROUP BY cluster ORDER BY cluster"""

  // ---- s07: embedding-space diagnostics (intra- vs inter-label cosine) ----
  // The "is my label structure real?" check run before trusting any
  // ANN/cluster pipeline: summary statistics of pairwise cosine within
  // vs across labels, on a deterministic 1-in-4 sample of vectors
  // (hash-style modulus, never rand()). Pairwise volume is bounded by
  // the sample — the full-corpus version would bucket first (s02/s04).
  // Per-row cosines are engine-exact folds; the summary means go
  // through rounded-then-decimal sums, so both output rows hash-match.
  val s07_pairwise_stats: Q = (s, d) => {
    val e = Tables.embeddings(s, d).filter(col("vec_id") % 4 === 0)
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"),
      col("label").as("la"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"),
      col("label").as("lb"))
    a.join(b, col("ida") < col("idb"))
      .withColumn("cos",
        round(graft.functions.cosine_sim(col("ea"), col("eb")), 9))
      .withColumn("same_label", (col("la") === col("lb")).cast("boolean"))
      .groupBy("same_label")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("cos").cast("decimal(30,10)")).cast("double") / count(lit(1)), 6)
          .as("mean_cos"),
        round(min("cos"), 9).as("min_cos"),
        round(max("cos"), 9).as("max_cos"))
      .orderBy("same_label")
  }
  val s07Sql: String =
    """WITH e AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 4 = 0),
      p AS (SELECT a.label AS la, b.label AS lb,
              round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                        CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])))), 9) AS cos
            FROM e a JOIN e b ON a.vec_id < b.vec_id)
      SELECT (la = lb) AS same_label, COUNT(*) AS n_pairs,
             round(CAST(SUM(CAST(cos AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*), 6)
               AS mean_cos,
             round(min(cos), 9) AS min_cos, round(max(cos), 9) AS max_cos
      FROM p GROUP BY 1 ORDER BY same_label"""

  // ---- s08: ANN recall evaluation harness (rows-only) ----
  // Recall@k of each approximate variant (hyperplane-LSH s02, IVF s04)
  // against the exact brute-force top-k (s01), per query then averaged.
  // This is the eval loop every ANN deployment runs after (re)building an
  // index: hit sets join on (qid, vec_id) — never re-scoring vectors —
  // so the evaluation costs candidates, not distance computations.
  // Rows-only: LSH bucketing isn't expressible in the SQL oracle; the
  // spec asserts the recall floor and that exact-vs-exact recall is 1.
  val s08_ann_recall: Q = (s, d) => {
    val exact = Similarity.s01_knn_brute(s, d).select("qid", "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kPerQ = exact.groupBy("qid").agg(count(lit(1)).as("k"))
    def recallOf(name: String, approx: DataFrame): DataFrame = {
      val hits = exact
        .join(approx.select("qid", "vec_id"), Seq("qid", "vec_id"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("hits"))
      kPerQ.join(hits, Seq("qid"), "left")
        .select(col("qid"), col("k"), coalesce(col("hits"), lit(0L)).as("hits"))
        .agg(count(lit(1)).as("n_queries"),
          round(sum(col("hits").cast("double") / col("k").cast("double"))
            / count(lit(1)), 6).as("mean_recall"))
        .select(lit(name).as("variant"), col("n_queries"), col("mean_recall"))
    }
    recallOf("lsh", Similarity.s02_knn_lsh(s, d))
      .unionByName(recallOf("ivf", Similarity.s04_ann_ivf(s, d)))
      .orderBy("variant")
  }
  // Both legs run at their full-recall operating points (see s02/s04),
  // so the harness output is the constant (5 queries, recall 1.0) per
  // variant — which gives the hit-set/per-query/mean MACHINERY an exact
  // oracle. NOTE the oracle's scope, stated plainly: it pins the
  // HARNESS SHAPE (that the hit-set joins and per-query/mean rollup
  // produce these rows when recall is total), not an independently
  // recomputed recall — a constant literal cannot re-derive the ANN
  // results. The independent recall verification lives in
  // Similarity2Spec, which drives recallOf through lossy configs and
  // checks it against a separately computed ground-truth recall.
  val s08Sql: String =
    """SELECT variant, CAST(n_queries AS BIGINT) AS n_queries,
             CAST(mean_recall AS DOUBLE) AS mean_recall
      FROM (SELECT 'ivf' AS variant, 5 AS n_queries, 1.0 AS mean_recall
            UNION ALL SELECT 'lsh', 5, 1.0) t ORDER BY variant"""

  // ---- s09: int8 scalar quantization of embeddings ----
  // The vector-storage compression step (4x smaller than float32): per-
  // dimension min/max (one agg, broadcast back), codes = rounded linear
  // scale to 0..255, report per-label reconstruction error. FLOAT values
  // go through DOUBLE before any decimal/compare (the cross-engine cast
  // rule); codes and errors are then pure per-row double arithmetic —
  // bit-identical on both engines.
  val s09_scalar_quant: Q = (s, d) => {
    val dims = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "vf")))
      .withColumn("v", col("vf").cast("double")).drop("vf")
    val stats = dims.groupBy("dim").agg(min("v").as("dmin"), max("v").as("dmax"))
    val coded = dims.join(broadcast(stats), "dim")
      .withColumn("code",
        round((col("v") - col("dmin")) * lit(255.0) / (col("dmax") - col("dmin")), 0)
          .cast("long"))
      .withColumn("recon",
        col("dmin") + col("code") * (col("dmax") - col("dmin")) / lit(255.0))
      .withColumn("err", abs(col("v") - col("recon")))
    coded.groupBy("label")
      .agg(count(lit(1)).as("n_values"),
        round(Stable.dsum(col("err")) / count(lit(1)), 9).as("avg_abs_err"),
        round(max("err"), 9).as("max_abs_err"))
      .orderBy("label")
  }
  val s09Sql: String =
    """WITH e AS (SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
                       CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
      st AS (SELECT dim, min(v) AS dmin, max(v) AS dmax FROM e GROUP BY 1),
      c AS (SELECT label, v, dmin, dmax,
              CAST(round((v - dmin) * 255.0 / (dmax - dmin), 0) AS BIGINT) AS code
            FROM e JOIN st USING (dim)),
      r AS (SELECT label,
              abs(v - (dmin + code * (dmax - dmin) / 255.0)) AS err
            FROM c)
      SELECT label, COUNT(*) AS n_values,
             round(CAST(SUM(CAST(err AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 9)
               AS avg_abs_err,
             round(max(err), 9) AS max_abs_err
      FROM r GROUP BY label ORDER BY label"""

  // ---- s10: MMR diversified retrieval (rows-only) ----
  // Maximal Marginal Relevance (Carbonell & Goldstein 1998) — the RAG
  // re-ranking step: from each query's top-25 cosine candidates, greedily
  // pick k=5 maximizing lambda*sim(q,c) - (1-lambda)*max_{s in S} sim(c,s),
  // trading relevance against redundancy with what's already selected.
  // Plan: the candidate generation is s01's broadcast scoring capped at
  // 25; the greedy step is inherently sequential PER QUERY but independent
  // ACROSS queries, so it runs as `flatMapGroups` over the (qid)-grouped
  // candidates — per-group state is <= 25 vectors, executors parallelize
  // across queries, nothing iterates on the driver. Ties broken by vec_id;
  // scores rounded 1e-9 pre-comparison so selection is engine-exact —
  // exact enough that the oracle replays the whole greedy loop in SQL:
  // k=5 picks unroll to 5 chained CTEs (argmax per query with the
  // redundancy term joined from a pairwise-cosine CTE; round_even
  // mirrors Scala's math.rint, (1 - 0.7) is written as the same double
  // expression). The spec keeps the lambda=1-equals-s01 and partition-
  // invariance properties.
  def mmrSelect(s: SparkSession, d: String, lambda: Double, k: Int): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), col("vec_id"))
    val cands = e.select(col("vec_id"), col("embedding").as("ce"))
      .join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("cosine", round(graft.functions.cosine_sim(col("qe"), col("ce")), 9))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= 25)
      .select(col("qid"), col("vec_id"), col("cosine"), col("ce"))
      .as[(Long, Long, Double, Array[Float])]
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var i = 0; var ab = 0.0; var aa = 0.0; var bb = 0.0
      while (i < a.length) { ab += a(i).toDouble * b(i); aa += a(i).toDouble * a(i); bb += b(i).toDouble * b(i); i += 1 }
      math.rint(ab / (math.sqrt(aa) * math.sqrt(bb)) * 1e9) / 1e9
    }
    cands.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cs = it.toArray.sortBy(c => (-c._3, c._2)) // by relevance, vec_id tie-break
        val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Long)]
        val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
        while (chosen.size < math.min(k, cs.length)) {
          var bestIdx = -1; var bestScore = Double.NegativeInfinity
          cs.indices.foreach { i =>
            if (!chosen.contains(i)) {
              val red = if (chosen.isEmpty) 0.0
                else chosen.map(j => cos(cs(i)._4, cs(j)._4)).max
              val score = math.rint((lambda * cs(i)._3 - (1 - lambda) * red) * 1e9) / 1e9
              if (score > bestScore ||
                  (score == bestScore && (bestIdx < 0 || cs(i)._2 < cs(bestIdx)._2))) {
                bestScore = score; bestIdx = i
              }
            }
          }
          chosen += bestIdx
          selected += ((qid, cs(bestIdx)._2, cs(bestIdx)._3, chosen.size.toLong))
        }
        selected.iterator
      }
      .toDF("qid", "vec_id", "cosine", "pick")
      .select("qid", "pick", "vec_id", "cosine")
      .orderBy("qid", "pick")
  }
  val s10_mmr_diversify: Q = (s, d) => mmrSelect(s, d, 0.7, 5)
  private val mmrCos =
    """list_dot_product(%A.v, %B.v)
       / (sqrt(list_dot_product(%A.v, %A.v)) * sqrt(list_dot_product(%B.v, %B.v)))"""
  private def mmrStep(prev: String, sel: String): String =
    s"""r$prev AS (SELECT c.qid, c.vec_id, c.cosine, max(pc.sim) AS red
         FROM cand c JOIN $sel ON $sel.qid = c.qid
         JOIN pc ON pc.qid = c.qid AND pc.ca = c.vec_id AND pc.cb = $sel.vec_id
         WHERE NOT EXISTS (SELECT 1 FROM $sel x
                           WHERE x.qid = c.qid AND x.vec_id = c.vec_id)
         GROUP BY 1, 2, 3),
       p$prev AS (SELECT qid, vec_id, cosine FROM (
         SELECT qid, vec_id, cosine, row_number() OVER (PARTITION BY qid ORDER BY
           round_even((CAST(0.7 AS DOUBLE) * cosine
             - (1 - CAST(0.7 AS DOUBLE)) * red) * 1e9, 0) / 1e9 DESC, vec_id) AS rn
         FROM r$prev) t WHERE rn = 1)"""
  val s10Sql: String = {
    val qcos = mmrCos.replace("%A.v", "q.qv").replace("%B.v", "e.v")
    val pcos = mmrCos.replace("%A", "a").replace("%B", "b")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
      cand AS (
        SELECT qid, vec_id, cosine, v FROM (
          SELECT q.qid, e.vec_id, round($qcos, 9) AS cosine, e.v,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY round($qcos, 9) DESC, e.vec_id) AS r
          FROM q, e WHERE e.vec_id <> q.qid) t
        WHERE r <= 25),
      pc AS (
        SELECT a.qid, a.vec_id AS ca, b.vec_id AS cb,
               round_even(($pcos) * 1e9, 0) / 1e9 AS sim
        FROM cand a JOIN cand b ON a.qid = b.qid AND a.vec_id <> b.vec_id),
      p1 AS (SELECT qid, vec_id, cosine FROM (
               SELECT qid, vec_id, cosine, row_number() OVER (PARTITION BY qid
                 ORDER BY round_even(CAST(0.7 AS DOUBLE) * cosine * 1e9, 0) / 1e9
                   DESC, vec_id) AS rn
               FROM cand) t WHERE rn = 1),
      s1 AS (SELECT * FROM p1),
      ${mmrStep("2", "s1")},
      s2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM p2),
      ${mmrStep("3", "s2")},
      s3 AS (SELECT * FROM s2 UNION ALL SELECT * FROM p3),
      ${mmrStep("4", "s3")},
      s4 AS (SELECT * FROM s3 UNION ALL SELECT * FROM p4),
      ${mmrStep("5", "s4")},
      allp AS (
        SELECT qid, 1 AS pick, vec_id, cosine FROM p1
        UNION ALL SELECT qid, 2, vec_id, cosine FROM p2
        UNION ALL SELECT qid, 3, vec_id, cosine FROM p3
        UNION ALL SELECT qid, 4, vec_id, cosine FROM p4
        UNION ALL SELECT qid, 5, vec_id, cosine FROM p5)
      SELECT qid, CAST(pick AS BIGINT) AS pick, vec_id, cosine
      FROM allp ORDER BY qid, pick"""
  }

  // ---- s11: cluster exemplars (nearest-to-centroid top-k) ----
  // The curation-review surface: for every cluster, the k most central
  // members — what you actually LOOK AT when auditing a semantic-dedup
  // or topic clustering ("show me 3 prototypical docs per cluster").
  // Centroids are s03's decimal-exact per-dimension means (broadcast —
  // cluster-count-sized); each vector scores ONE cosine against its
  // own cluster's centroid in-row (sequential double fold, the
  // engine-exact kernel s01 pinned against list_dot_product), and the
  // top-3 ride a label-PARTITIONED rank window — per-cluster state
  // only, no global sort, no pairwise anything. At 100 TB: one scan,
  // one broadcast, one keyed window; cost is linear in corpus and
  // independent of cluster count.
  val s11_cluster_exemplars: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val cents = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg((sum(col("v").cast("double").cast(DecimalType(30, 10))).cast("double")
        / count(lit(1))).as("mv"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("pairs"))
      .select(col("label"), expr("transform(pairs, p -> p.mv)").as("cvec"))
    val w = Window.partitionBy("label").orderBy(desc("cosine"), col("vec_id"))
    e.join(broadcast(cents), "label")
      .withColumn("cosine", round(graft.functions.cosine_sim(
        col("embedding").cast("array<double>"), col("cvec")), 9))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("label", "rank", "vec_id", "cosine")
      .orderBy("label", "rank")
  }
  val s11Sql: String =
    """WITH e AS (SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
                       unnest(embedding) AS v FROM embeddings),
      m AS (SELECT label, dim,
              CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,10))) AS DOUBLE)
                / COUNT(*) AS mv
            FROM e GROUP BY 1, 2),
      c AS (SELECT label, list(mv ORDER BY dim) AS cvec FROM m GROUP BY 1),
      p AS (SELECT emb.label, vec_id,
              round(list_dot_product(CAST(embedding AS DOUBLE[]), cvec)
                / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[])))
                   * sqrt(list_dot_product(cvec, cvec))), 9) AS cosine
            FROM embeddings emb JOIN c ON emb.label = c.label)
      SELECT label, rn AS rank, vec_id, cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY label
                                     ORDER BY cosine DESC, vec_id) AS rn
        FROM p) t
      WHERE rn <= 3 ORDER BY label, rank"""

  // ---- s12: reciprocal-rank fusion (hybrid sparse + dense retrieval) ----
  // The standard hybrid-search combiner (Cormack/Clarke/Buettcher 2009):
  // fuse a keyword ranking (t14's BM25 top-25) with a vector ranking
  // (top-25 cosine for one probe embedding) by summing 1/(60+rank) per
  // list — rank-only fusion, so the two lists' incomparable score scales
  // never touch. Each list is produced by globalTopK (per-partition
  // heaps, no unpartitioned window, no full sort); the fuse is a
  // full-outer join of two 25-row frames — driver-scale, exchange-free
  // after broadcast. At 100 TB the cost is the two retrievals; fusion
  // stays constant-size. 1/(60+r) is the same IEEE double op in both
  // engines and the two-term sum has a fixed evaluation order, so the
  // fused scores (and the final ranking) are engine-exact.
  val s12_rrf_fusion: Q = (s, d) => {
    import graft.api.GraftOps
    val sparse = GraftOps.globalTopK(TextAnalysis4.t14_bm25(s, d), "bm25", "doc_id", 25)
      .select(col("doc_id").as("id"), col("rank").as("sparse_rank"))
    val e = Tables.embeddings(s, d)
    val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val scored = e.filter(col("vec_id") =!= 0)
      .join(broadcast(probe))
      .withColumn("cosine", graft.functions.cosine_sim(col("qe"), col("embedding")))
      .select("vec_id", "cosine")
    val dense = GraftOps.globalTopK(scored, "cosine", "vec_id", 25)
      .select(col("vec_id").as("id"), col("rank").as("dense_rank"))
    val fused = sparse.join(dense, Seq("id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60) + col("sparse_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("dense_rank")), lit(0.0)), 9))
    GraftOps.globalTopK(fused, "rrf", "id", 25)
      .select("id", "rrf", "sparse_rank", "dense_rank", "rank")
      .orderBy("rank")
  }
  val s12Sql: String =
    """WITH words AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
                    FROM documents),
      w AS (SELECT * FROM words WHERE word <> ''),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY 1),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
      tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w
             WHERE word IN ('spark', 'hash', 'window') GROUP BY 1, 2),
      df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      sc AS (SELECT t.doc_id,
               round(ln(1.0 + (CAST(s.n_docs - f.df AS DOUBLE) + 0.5)
                              / (CAST(f.df AS DOUBLE) + 0.5))
                   * (CAST(t.tf AS DOUBLE) * 2.25)
                   / (CAST(t.tf AS DOUBLE)
                      + 1.25 * (0.25 + 0.75 * CAST(d.dl AS DOUBLE)
                                / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))), 6) AS score
             FROM tf t JOIN df f USING (word) JOIN dl d USING (doc_id)
             CROSS JOIN st s),
      bm AS (SELECT doc_id,
               round(CAST(SUM(CAST(score AS DECIMAL(30,6))) AS DOUBLE), 6) AS bm25
             FROM sc GROUP BY doc_id),
      sp AS (SELECT doc_id AS id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS sparse_rank
             FROM bm QUALIFY sparse_rank <= 25),
      pr AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      co AS (SELECT vec_id,
               list_dot_product(CAST(qe AS DOUBLE[]), CAST(embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[])))) AS cosine
             FROM embeddings CROSS JOIN pr WHERE vec_id <> 0),
      dn AS (SELECT vec_id AS id,
               row_number() OVER (ORDER BY cosine DESC, vec_id) AS dense_rank
             FROM co QUALIFY dense_rank <= 25),
      fu AS (SELECT COALESCE(sp.id, dn.id) AS id, sp.sparse_rank, dn.dense_rank,
               round(COALESCE(1.0 / (60 + sp.sparse_rank), 0.0)
                     + COALESCE(1.0 / (60 + dn.dense_rank), 0.0), 9) AS rrf
             FROM sp FULL OUTER JOIN dn ON sp.id = dn.id)
      SELECT id, rrf, sparse_rank, dense_rank,
             row_number() OVER (ORDER BY rrf DESC, id) AS rank
      FROM fu QUALIFY rank <= 25 ORDER BY rank"""

  // ---- s13: radius (range) similarity search ----
  // The other half of vector retrieval: not "top-k nearest" but "ALL
  // neighbors within a similarity radius" — the primitive behind
  // near-duplicate sweeps, recommendation pools, and density probes.
  // Per query vector: neighborhood size, max cosine, and mean cosine
  // at radius cos >= 0.3 (d05's operating regime). Brute exact over a
  // broadcast query set — the candidates stream map-side, per-query
  // partial aggregates combine, and NOTHING pair-shaped ever shuffles
  // (the exchange carries queries x 3 numbers). At 100 TB the same
  // report runs on the s04 IVF route: probe cells first, identical
  // rollup. Cosines come from the codegen'd CosineSim expression whose
  // index-order folds are bit-identical to DuckDB's list_dot_product;
  // the mean rides the dsum decimal discipline.
  val s13_radius_search: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .crossJoin(broadcast(queries))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cos", graft.functions.cosine_sim(col("qe"), col("ce")))
      .filter(col("cos") >= 0.3)
      .groupBy("qid")
      .agg(count(lit(1)).as("n_neighbors"),
        round(max(col("cos")), 9).as("max_cos"),
        round(Stable.dsum(col("cos")) / count(lit(1)), 9).as("mean_cos"))
      .orderBy("qid")
  }
  val s13Sql: String = {
    val cos = """list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                  CAST(c.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[]))))"""
    s"""WITH p AS (
        SELECT q.vec_id AS qid, $cos AS cos
        FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
        JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE $cos >= 0.3)
      SELECT qid, COUNT(*) AS n_neighbors,
             round(MAX(cos), 9) AS max_cos,
             round(${Stable.sqlSum("cos")} / COUNT(*), 9) AS mean_cos
      FROM p GROUP BY 1 ORDER BY qid"""
  }

  // ---- d26: cluster-quality metrics (centroid silhouette) ----
  // The evaluation half of the semantic-dedup family: before trusting
  // d14/d22's clusters to delete data, measure how separated they are.
  // Per label cluster: mean distance to the OWN centroid (cohesion a),
  // mean distance to the NEAREST OTHER centroid (separation b), and
  // the centroid-silhouette mean((b−a)/max(a,b)) — the simplified
  // silhouette that needs vectors×centroids work, not vectors² (the
  // only formulation that survives 100 TB). Centroids are the s03
  // decimal-exact means broadcast as arrays; distances use the dot-
  // product identity ‖x−c‖² = x·x − 2x·c + c·c with every dot an
  // index-order fold (bit-identical to DuckDB's list_dot_product),
  // so even the mins over other-centroid distances pick engine-
  // identical values. One narrow pass over vectors; means ride dsum.
  val d26_cluster_quality: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val cents = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg((sum(col("v").cast("double").cast(DecimalType(30, 10))).cast("double")
        / count(lit(1))).as("mv"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("ps"))
      .select(col("label").as("cl"), expr("transform(ps, p -> p.mv)").as("cent"))
    val dists = e.crossJoin(broadcast(cents))
      .withColumn("d2",
        graft.functions.dot_product(col("embedding"), col("embedding"))
          - lit(2.0) * graft.functions.dot_product(col("embedding"), col("cent"))
          + graft.functions.dot_product(col("cent"), col("cent")))
      .withColumn("dist", sqrt(greatest(col("d2"), lit(0.0))))
    val perVec = dists.groupBy(col("vec_id"), col("label"))
      .agg(min(when(col("label") === col("cl"), col("dist"))).as("a"),
        min(when(col("label") =!= col("cl"), col("dist"))).as("b"))
      .withColumn("sil", (col("b") - col("a")) / greatest(col("a"), col("b")))
    perVec.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(Stable.dsum(col("a")) / count(lit(1)), 6).as("mean_cohesion"),
        round(Stable.dsum(col("b")) / count(lit(1)), 6).as("mean_separation"),
        round(Stable.dsum(col("sil")) / count(lit(1)), 6).as("mean_silhouette"))
      .orderBy("label")
  }
  val d26Sql: String = {
    def dot(a: String, b: String) = s"list_dot_product($a, $b)"
    s"""WITH ex AS (SELECT label, generate_subscripts(embedding,1)-1 AS dim,
                       unnest(embedding) AS v FROM embeddings),
      m AS (SELECT label, dim,
              CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,10))) AS DOUBLE)
                / COUNT(*) AS mv
            FROM ex GROUP BY 1, 2),
      c AS (SELECT label AS cl, list(mv ORDER BY dim) AS cent
            FROM m GROUP BY label),
      dd AS (SELECT e.vec_id, e.label, c.cl,
               sqrt(greatest(
                 ${dot("CAST(e.embedding AS DOUBLE[])", "CAST(e.embedding AS DOUBLE[])")}
                 - 2.0 * ${dot("CAST(e.embedding AS DOUBLE[])", "c.cent")}
                 + ${dot("c.cent", "c.cent")}, 0.0)) AS dist
             FROM embeddings e CROSS JOIN c),
      pv AS (SELECT vec_id, label,
               MIN(CASE WHEN label = cl THEN dist END) AS a,
               MIN(CASE WHEN label <> cl THEN dist END) AS b
             FROM dd GROUP BY 1, 2),
      sv AS (SELECT label, a, b, (b - a) / greatest(a, b) AS sil FROM pv)
      SELECT label, COUNT(*) AS n_vecs,
             round(${Stable.sqlSum("a")} / COUNT(*), 6) AS mean_cohesion,
             round(${Stable.sqlSum("b")} / COUNT(*), 6) AS mean_separation,
             round(${Stable.sqlSum("sil")} / COUNT(*), 6) AS mean_silhouette
      FROM sv GROUP BY 1 ORDER BY label"""
  }

  // ---- s14: embedding drift between cohorts ----
  // The re-embedding monitor: when a model version (or crawl epoch)
  // changes, did each label's centroid MOVE? Cohorts are the
  // deterministic vec_id halves (production: old batch vs new batch);
  // per label the report is centroid L2 shift, cosine between cohort
  // centroids, and the size ratio — the numbers a drift alarm
  // thresholds before trusting mixed-epoch ANN indexes. Centroids are
  // s03's decimal-exact per-(label, dim) means (combinable, uniform
  // shuffle); the comparison runs on labels×dims rows (metadata-
  // sized); shift/cosine use index-order folds over the assembled
  // arrays — deterministic IEEE both engines.
  val s14_embedding_drift: Q = (s, d) => {
    def centroid(df: DataFrame, tag: String): DataFrame =
      df.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("label", "dim")
        .agg((sum(col("v").cast("double").cast(DecimalType(30, 10)))
          .cast("double") / count(lit(1))).as("mv"))
        .groupBy("label")
        .agg(count(lit(1)).as(s"nd_$tag"),
          array_sort(collect_list(struct(col("dim"), col("mv")))).as("ps"))
        .select(col("label"),
          expr("transform(ps, p -> p.mv)").as(s"cent_$tag"))
    val e = Tables.embeddings(s, d)
    val a = e.filter(col("vec_id") % 2 === 0)
    val b = e.filter(col("vec_id") % 2 === 1)
    val na = a.groupBy("label").agg(count(lit(1)).as("n_a"))
    val nb = b.groupBy("label").agg(count(lit(1)).as("n_b"))
    centroid(a, "a").join(centroid(b, "b"), "label")
      .join(broadcast(na), "label").join(broadcast(nb), "label")
      .withColumn("daa", graft.functions.dot_product(col("cent_a"), col("cent_a")))
      .withColumn("dbb", graft.functions.dot_product(col("cent_b"), col("cent_b")))
      .withColumn("dab", graft.functions.dot_product(col("cent_a"), col("cent_b")))
      .select(col("label"), col("n_a"), col("n_b"),
        round(sqrt(greatest(col("daa") - lit(2.0) * col("dab") + col("dbb"),
          lit(0.0))), 9).as("l2_shift"),
        round(col("dab") / (sqrt(col("daa")) * sqrt(col("dbb"))), 9)
          .as("centroid_cos"))
      .orderBy("label")
  }
  val s14Sql: String = {
    def cent(cond: String, tag: String) =
      s"""SELECT label, list(mv ORDER BY dim) AS cent_$tag
         FROM (SELECT label, dim,
                 CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,10)))
                   AS DOUBLE) / COUNT(*) AS mv
               FROM (SELECT label, generate_subscripts(embedding,1)-1 AS dim,
                            unnest(embedding) AS v
                     FROM embeddings WHERE $cond)
               GROUP BY 1, 2) GROUP BY label"""
    s"""WITH ca AS (${cent("vec_id % 2 = 0", "a")}),
      cb AS (${cent("vec_id % 2 = 1", "b")}),
      na AS (SELECT label, COUNT(*) AS n_a FROM embeddings
             WHERE vec_id % 2 = 0 GROUP BY 1),
      nb AS (SELECT label, COUNT(*) AS n_b FROM embeddings
             WHERE vec_id % 2 = 1 GROUP BY 1),
      j AS (SELECT ca.label, n_a, n_b,
              list_dot_product(cent_a, cent_a) AS daa,
              list_dot_product(cent_b, cent_b) AS dbb,
              list_dot_product(cent_a, cent_b) AS dab
            FROM ca JOIN cb USING (label)
                    JOIN na USING (label) JOIN nb USING (label))
      SELECT label, n_a, n_b,
             round(sqrt(greatest(daa - 2.0 * dab + dbb, 0.0)), 9) AS l2_shift,
             round(dab / (sqrt(daa) * sqrt(dbb)), 9) AS centroid_cos
      FROM j ORDER BY label"""
  }

  // ---- s15: k-NN label-prediction evaluation ----
  // The eval loop that decides whether an embedding space is worth
  // indexing: predict each held-out query's label by majority vote of
  // its 10 nearest neighbors, report accuracy and the mean vote
  // margin. 25 deterministic queries (vec_id < 25) against the rest of
  // the corpus; per-query top-10 via a qid-partitioned rank window
  // over scored candidates (cosine desc, vec_id tiebreak — a total
  // order, so the neighbor SET is engine-exact); majority by (votes
  // desc, label asc) — again total. At scale the scoring pass routes
  // through s02/s04 buckets; the eval harness itself is query-bounded.
  val s15_knn_eval: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val queries25 = e.filter(col("vec_id") < 25)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("true_label"))
    val cands = e.select(col("vec_id").as("cid"),
      col("embedding").as("ce"), col("label").as("clabel"))
    val scored = cands.crossJoin(broadcast(queries25))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cos",
        round(graft.functions.cosine_sim(col("qe"), col("ce")), 9))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cos"), col("cid"))))
      .filter(col("rk") <= 10)
    val votes = scored.groupBy("qid", "true_label", "clabel")
      .agg(count(lit(1)).as("v"))
      .withColumn("vr", row_number().over(
        Window.partitionBy("qid").orderBy(desc("v"), col("clabel"))))
      .filter(col("vr") === 1)
    votes.agg(count(lit(1)).as("n_queries"),
        sum(when(col("clabel") === col("true_label"), 1L).otherwise(0L))
          .as("n_correct"),
        round(sum(col("v")).cast("double")
          / (count(lit(1)) * 10).cast("double"), 9).as("mean_margin"))
      .withColumn("accuracy", round(
        col("n_correct").cast("double") / col("n_queries").cast("double"), 9))
      .select("n_queries", "n_correct", "accuracy", "mean_margin")
  }
  val s15Sql: String = {
    val cos = """list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                  CAST(c.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[]))))"""
    s"""WITH q AS (SELECT vec_id AS qid, embedding, label AS true_label
               FROM embeddings WHERE vec_id < 25),
      sc AS (SELECT q.qid, q.true_label, c.vec_id AS cid, c.label AS clabel,
               round($cos, 9) AS cos
             FROM q JOIN embeddings c ON c.vec_id <> q.qid),
      rk AS (SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY cos DESC, cid) AS rk FROM sc),
      top AS (SELECT qid, true_label, clabel FROM rk WHERE rk <= 10),
      v AS (SELECT qid, true_label, clabel, COUNT(*) AS v FROM top
            GROUP BY 1, 2, 3),
      w AS (SELECT *, row_number() OVER (PARTITION BY qid
                       ORDER BY v DESC, clabel) AS vr FROM v),
      pick AS (SELECT * FROM w WHERE vr = 1)
      SELECT COUNT(*) AS n_queries,
             CAST(SUM(CASE WHEN clabel = true_label THEN 1 ELSE 0 END)
               AS BIGINT) AS n_correct,
             round(CAST(SUM(CASE WHEN clabel = true_label THEN 1 ELSE 0 END)
                     AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS accuracy,
             round(CAST(SUM(v) AS DOUBLE)
                   / CAST(COUNT(*) * 10 AS DOUBLE), 9) AS mean_margin
      FROM pick"""
  }

  // ---- s16: nearest-neighbor label confusion matrix ----
  // s15 scores accuracy; this shows WHERE the space confuses labels:
  // for every vector, the label of its single nearest neighbor, rolled
  // into a (true_label, nn_label) matrix with row shares — the
  // embedding-space confusion matrix that tells a curator which
  // classes to merge or re-embed. Neighbor = top-1 by (cosine desc,
  // id) over the 1-in-4 deterministic sample (pair volume sample-
  // bounded; the full-corpus version routes through s02/s04 buckets);
  // the argmax is a total order, so the matrix is engine-exact.
  val s16_nn_confusion: Q = (s, d) => {
    val e = Tables.embeddings(s, d).filter(col("vec_id") % 4 === 0)
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"),
      col("label").as("la"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"),
      col("label").as("lb"))
    val nn = a.join(b, col("va") =!= col("vb"))
      .withColumn("cos",
        round(graft.functions.cosine_sim(col("ea"), col("eb")), 9))
      .withColumn("rk", row_number().over(
        Window.partitionBy("va").orderBy(desc("cos"), col("vb"))))
      .filter(col("rk") === 1)
    val rowTot = nn.groupBy("la").agg(count(lit(1)).as("row_n"))
    nn.groupBy(col("la").as("true_label"), col("lb").as("nn_label"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(rowTot.withColumnRenamed("la", "true_label")),
        "true_label")
      .select(col("true_label"), col("nn_label"), col("n"),
        round(col("n").cast("double") / col("row_n").cast("double"), 9)
          .as("row_share"))
      .orderBy("true_label", "nn_label")
  }
  val s16Sql: String = {
    val cos = """list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                      CAST(a.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[]))))"""
    s"""WITH e AS (SELECT vec_id, embedding, label FROM embeddings
                  WHERE vec_id % 4 = 0),
      sc AS (SELECT a.vec_id AS va, a.label AS la, b.vec_id AS vb,
               b.label AS lb, round($cos, 9) AS cos
             FROM e a JOIN e b ON a.vec_id <> b.vec_id),
      rk AS (SELECT *, row_number() OVER (PARTITION BY va
                        ORDER BY cos DESC, vb) AS rk FROM sc),
      nn AS (SELECT la, lb FROM rk WHERE rk = 1),
      rt AS (SELECT la, COUNT(*) AS row_n FROM nn GROUP BY 1)
      SELECT nn.la AS true_label, nn.lb AS nn_label, COUNT(*) AS n,
             round(CAST(COUNT(*) AS DOUBLE) / CAST(MIN(row_n) AS DOUBLE), 9)
               AS row_share
      FROM nn JOIN rt ON nn.la = rt.la
      GROUP BY 1, 2 ORDER BY true_label, nn_label"""
  }

  // ---- s17: IVF nprobe/recall operating curve ----
  // The table every ANN deployment tunes from: recall@5 at
  // nprobe = 1/2/3 against s01's exact ground truth — s04 states its
  // full-recall point structurally; this measures the LOSSY points,
  // oracle-exact. Engine-exactness of a lossy sweep needs the cell
  // ASSIGNMENT itself to be cross-engine deterministic, so (unlike
  // s04, where probing everything makes assignment irrelevant) the
  // centroids here use decimal-exact means and the cell ranking keys
  // on the ROUNDED cosine with cell tie-break. The whole sweep is ONE
  // plan: probe lists expand over a 3-element literal array (narrow),
  // both rankings are partitioned windows, and the only fact-scale
  // stages are the assignment pass and the probed-cell candidate join
  // — candidates bounded by cells probed, exactly the IVF contract.
  val s17_nprobe_recall: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val cents = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg((sum(col("v").cast("decimal(30,10)")).cast("double")
        / count(lit(1))).as("mv"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("ps"))
      .select(col("label").as("cell"), expr("transform(ps, p -> p.mv)").as("centroid"))
    val ranked = e.join(broadcast(cents))
      .withColumn("csim",
        round(graft.functions.cosine_sim(col("embedding"), col("centroid")), 9))
      .withColumn("r", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("csim"), col("cell"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val assigned = ranked.filter(col("r") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val probed = ranked.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("cell"), col("r"))
      .withColumn("nprobe", explode(array(lit(1), lit(2), lit(3))))
      .filter(col("r") <= col("nprobe"))
    val res = assigned.join(probed, "cell")
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cosine",
        round(graft.functions.cosine_sim(col("qe"), col("embedding")), 9))
      .withColumn("rn", row_number().over(
        Window.partitionBy("nprobe", "qid").orderBy(desc("cosine"), col("vec_id"))))
      .filter(col("rn") <= 5)
      .select(col("nprobe"), col("qid"), col("vec_id"))
    val truth = Similarity.s01_knn_brute(s, d).select(col("qid"), col("vec_id"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    res.join(truth.withColumn("hit", lit(1)), Seq("qid", "vec_id"), "left")
      .groupBy("nprobe")
      .agg(count(lit(1)).as("n_returned"), count(col("hit")).as("n_hit"))
      .crossJoin(broadcast(nTruth))
      .select(col("nprobe").cast("long").as("nprobe"),
        col("n_returned"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_truth").cast("double"), 9)
          .as("recall"))
      .orderBy("nprobe")
  }
  val s17Sql: String = {
    def cos(a: String, b: String): String =
      s"""round(list_dot_product($a, $b)
           / (sqrt(list_dot_product($a, $a))
              * sqrt(list_dot_product($b, $b))), 9)"""
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
               FROM embeddings),
      dims AS (SELECT vec_id, label, generate_subscripts(emb, 1) AS i,
                 unnest(emb) AS v FROM e),
      cm AS (SELECT label AS cell, i,
               CAST(SUM(CAST(v AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS mv
             FROM dims GROUP BY 1, 2),
      cents AS (SELECT cell, list(mv ORDER BY i) AS centroid FROM cm GROUP BY 1),
      rk AS (SELECT vec_id, emb, cell, csim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cell) AS r
             FROM (SELECT vec_id, emb, cell,
                     ${cos("emb", "centroid")} AS csim
                   FROM e CROSS JOIN cents)),
      a AS (SELECT vec_id, emb, cell FROM rk WHERE r = 1),
      qcn AS (SELECT np, vec_id AS qid, emb AS qe, cell
              FROM rk CROSS JOIN (VALUES (1), (2), (3)) AS n(np)
              WHERE vec_id < 5 AND r <= np),
      cand AS (SELECT np, qid, a.vec_id,
                 ${cos("qe", "emb")} AS cosine
               FROM a JOIN qcn USING (cell) WHERE a.vec_id <> qid),
      res AS (SELECT np, qid, vec_id FROM (
                SELECT *, row_number() OVER (PARTITION BY np, qid
                           ORDER BY cosine DESC, vec_id) AS rn
                FROM cand) WHERE rn <= 5),
      q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe2
            FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
      p AS (SELECT qid, vec_id,
              list_dot_product(qe2, ce)
                / (sqrt(list_dot_product(qe2, qe2))
                   * sqrt(list_dot_product(ce, ce))) AS cosine
            FROM q, c WHERE vec_id <> qid),
      truth AS (SELECT qid, vec_id FROM (
                  SELECT *, row_number() OVER (PARTITION BY qid
                             ORDER BY cosine DESC, vec_id) AS rn
                  FROM p) WHERE rn <= 5),
      nt AS (SELECT COUNT(*) AS n_truth FROM truth),
      h AS (SELECT np, COUNT(*) AS n_returned,
              COUNT(*) FILTER (WHERE EXISTS (
                SELECT 1 FROM truth t
                WHERE t.qid = res.qid AND t.vec_id = res.vec_id)) AS n_hit
            FROM res GROUP BY 1)
      SELECT CAST(np AS BIGINT) AS nprobe, n_returned, n_hit,
             round(CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE), 9) AS recall
      FROM h CROSS JOIN nt ORDER BY nprobe"""
  }

  // ---- s18: quantizer reassignment rate (Lloyd stability) ----
  // How settled is the coarse quantizer? One Lloyd step from the label
  // seed (assign → recompute → reassign) and the per-cell fraction of
  // vectors that CHANGE cells — the convergence diagnostic that decides
  // whether an IVF index needs another training round before build-out
  // (a high churn cell is a cell whose candidate lists will rot).
  // Engine-exact by the s17 discipline: decimal-exact centroid means,
  // ROUNDED-cosine assignment with cell tie-break, so both assignments
  // replay bit-identically in SQL. Both assignment passes are narrow
  // broadcast scans; the only shuffles are the two centroid aggregates
  // and the per-cell rollup.
  val s18_reassignment_rate: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val seed = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg((sum(col("v").cast("decimal(30,10)")).cast("double")
        / count(lit(1))).as("mv"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("ps"))
      .select(col("label").as("cell"), expr("transform(ps, p -> p.mv)").as("cent"))
    val a1 = e.join(broadcast(seed))
      .withColumn("cs",
        round(graft.functions.cosine_sim(col("embedding"), col("cent")), 9))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("cs"), col("cell"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("cell").as("c1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ref = a1
      .select(col("c1"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("c1", "dim")
      .agg((sum(col("v").cast("decimal(30,10)")).cast("double")
        / count(lit(1))).as("mv"))
      .groupBy("c1")
      .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("ps"))
      .select(col("c1").as("cell2"), expr("transform(ps, p -> p.mv)").as("cent2"))
    val a2 = a1.join(broadcast(ref))
      .withColumn("cs2",
        round(graft.functions.cosine_sim(col("embedding"), col("cent2")), 9))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("cs2"), col("cell2"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("c1"), col("cell2").as("c2"))
    a2.groupBy("c1")
      .agg(count(lit(1)).as("n_members"),
        count(when(col("c1") =!= col("c2"), 1)).as("n_moved"))
      .withColumn("churn", round(
        col("n_moved").cast("double") / col("n_members").cast("double"), 9))
      .select(col("c1").cast("long").as("cluster"), col("n_members"),
        col("n_moved"), col("churn"))
      .orderBy("cluster")
  }
  val s18Sql: String = {
    def cos(a: String, b: String): String =
      s"""round(list_dot_product($a, $b)
           / (sqrt(list_dot_product($a, $a))
              * sqrt(list_dot_product($b, $b))), 9)"""
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
               FROM embeddings),
      dims AS (SELECT vec_id, label, generate_subscripts(emb, 1) AS i,
                 unnest(emb) AS v FROM e),
      sm AS (SELECT label AS cell, i,
               CAST(SUM(CAST(v AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS mv
             FROM dims GROUP BY 1, 2),
      seed AS (SELECT cell, list(mv ORDER BY i) AS cent FROM sm GROUP BY 1),
      a1 AS (SELECT vec_id, emb, cell AS c1 FROM (
               SELECT vec_id, emb, cell,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY ${cos("emb", "cent")} DESC, cell) AS rk
               FROM e CROSS JOIN seed) WHERE rk = 1),
      d2 AS (SELECT c1, generate_subscripts(emb, 1) AS i, unnest(emb) AS v
             FROM a1),
      rm AS (SELECT c1, i,
               CAST(SUM(CAST(v AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS mv
             FROM d2 GROUP BY 1, 2),
      ref AS (SELECT c1 AS cell2, list(mv ORDER BY i) AS cent2
              FROM rm GROUP BY 1),
      a2 AS (SELECT vec_id, c1, cell2 AS c2 FROM (
               SELECT a1.vec_id, a1.c1, cell2,
                 row_number() OVER (PARTITION BY a1.vec_id
                   ORDER BY ${cos("emb", "cent2")} DESC, cell2) AS rk
               FROM a1 CROSS JOIN ref) WHERE rk = 1)
      SELECT CAST(c1 AS BIGINT) AS cluster, COUNT(*) AS n_members,
             COUNT(*) FILTER (WHERE c1 <> c2) AS n_moved,
             round(CAST(COUNT(*) FILTER (WHERE c1 <> c2) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS churn
      FROM a2 GROUP BY 1 ORDER BY cluster"""
  }

  // ---- s19: per-dimension variance screen ----
  // PCA-less dimension pruning plan: which embedding dimensions carry
  // signal? Per-dim variance from exact decimal moments (n·Σv² − (Σv)²
  // over n² — decimal arithmetic end-to-end, one double rounding at
  // the END), energy share, variance-descending rank and cumulative
  // energy — the table an index builder reads to drop dead dims before
  // building (a 64→48 dim cut is a 25% index-size and scan-rate win).
  // One fact-scale explode+aggregate; ranking and the cumulative sum
  // run on the dim-count-sized frame via the boundedSingleGroup idiom
  // (documented-bounded, never an unpartitioned fact window).
  val s19_dim_screen: Q = (s, d) => {
    val m = Tables.embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("double").cast(DecimalType(30, 10))).as("s1"),
        sum((col("v").cast("double") * col("v").cast("double"))
          .cast(DecimalType(30, 10))).as("s2"))
      .withColumn("variance", round(
        (col("n").cast("double") * col("s2").cast("double")
          - col("s1").cast("double") * col("s1").cast("double"))
          / (col("n").cast("double") * col("n").cast("double")), 9))
    val tot = m.agg(sum(col("variance").cast(DecimalType(30, 10)))
      .cast("double").as("tot_var"))
    val g = graft.api.GraftOps.boundedSingleGroup(
      m.select(col("dim").cast("long").as("dim"), col("variance")))
    val w = Window.partitionBy("__g")
      .orderBy(desc("variance"), col("dim"))
    val ranked = g
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_var",
        sum(col("variance").cast(DecimalType(30, 10)))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
    ranked.crossJoin(broadcast(tot))
      .select(col("dim"), col("variance"), col("rank"),
        round(col("variance") / col("tot_var"), 9).as("energy_share"),
        round(col("cum_var") / col("tot_var"), 9).as("cum_energy"))
      .orderBy("rank")
  }
  val s19Sql: String =
    """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      dims AS (SELECT generate_subscripts(emb, 1) - 1 AS dim, unnest(emb) AS v
               FROM e),
      m AS (SELECT dim, COUNT(*) AS n,
              SUM(CAST(v AS DECIMAL(30,10))) AS s1,
              SUM(CAST(v * v AS DECIMAL(30,10))) AS s2
            FROM dims GROUP BY 1),
      mv AS (SELECT CAST(dim AS BIGINT) AS dim,
               round((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9)
                 AS variance
             FROM m),
      tot AS (SELECT CAST(SUM(CAST(variance AS DECIMAL(30,10))) AS DOUBLE)
                AS tot_var FROM mv),
      rk AS (SELECT dim, variance,
               CAST(row_number() OVER (ORDER BY variance DESC, dim) AS BIGINT)
                 AS rank,
               CAST(SUM(CAST(variance AS DECIMAL(30,10)))
                 OVER (ORDER BY variance DESC, dim
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS cum_var
             FROM mv)
      SELECT dim, variance, rank,
             round(variance / tot_var, 9) AS energy_share,
             round(cum_var / tot_var, 9) AS cum_energy
      FROM rk CROSS JOIN tot ORDER BY rank"""

  // ---- s20: metadata-filtered vector search ----
  // THE vector-database feature plain ANN benchmarks skip: top-k under
  // a metadata predicate (here: candidates must carry a DIFFERENT
  // label than the query — the "recommend outside the user's own
  // cluster" shape). The engine point is WHERE the filter runs:
  // pushed BEFORE scoring, so the scan scores only qualifying vectors
  // (predicate + column pruning reach the parquet scan; a post-filter
  // top-k would have to over-fetch k·selectivity⁻¹ candidates and
  // still might starve). Exact brute-force over the filtered
  // candidate set — the oracle any filtered-ANN variant re-ranks
  // against; ranking on ROUNDED cosine with id tie-break.
  val s20_filtered_knn: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), col("vec_id"))
    e.select(col("vec_id"), col("embedding").as("ce"), col("label"))
      .join(broadcast(queries), col("vec_id") =!= col("qid"))
      .filter(col("label") =!= col("qlabel"))
      .withColumn("cosine",
        round(graft.functions.cosine_sim(col("qe"), col("ce")), 9))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("vec_id"),
        col("label"), col("cosine"))
      .orderBy("qid", "rank")
  }
  val s20Sql: String =
    """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe,
               label AS qlabel
             FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce, label
            FROM embeddings),
      p AS (SELECT qid, vec_id, label,
              round(list_dot_product(qe, ce)
                / (sqrt(list_dot_product(qe, qe))
                   * sqrt(list_dot_product(ce, ce))), 9) AS cosine
            FROM q JOIN c ON vec_id <> qid
            WHERE label <> qlabel)
      SELECT qid, rank, vec_id, label, cosine FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY qid
                    ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
        FROM p) WHERE rank <= 5
      ORDER BY qid, rank"""

  // ---- s21: dimension-pruned recall (what does s19's cut cost?) ----
  // s19 ranks dimensions by variance; this measures what actually
  // happens when an index keeps only the top-16 / top-32 of 64 dims:
  // recall@5 of brute-force search in the PRUNED space against the
  // full-space truth — the empirical justification (or refutation) of
  // the prune before it ships. Determinism rides the s19/s17
  // discipline end-to-end: decimal-exact variances pick the dim sets,
  // pruned vectors are in-row array selections (narrow), cosines fold
  // sequentially (the verified list_dot_product parity), rankings key
  // on rounded scores with id tie-breaks. Both prune levels run in
  // ONE plan via a 2-row broadcast dim-set table.
  val s21_dim_prune_recall: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val mv = e.select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("double").cast(DecimalType(30, 10))).as("s1"),
        sum((col("v").cast("double") * col("v").cast("double"))
          .cast(DecimalType(30, 10))).as("s2"))
      .withColumn("variance", round(
        (col("n").cast("double") * col("s2").cast("double")
          - col("s1").cast("double") * col("s1").cast("double"))
          / (col("n").cast("double") * col("n").cast("double")), 9))
    val ranked = graft.api.GraftOps.boundedSingleGroup(
        mv.select(col("dim"), col("variance")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("__g").orderBy(desc("variance"), col("dim"))))
    val kTable = {
      import s.implicits._
      Seq(16, 32).toDF("k_dims")
    }
    val dimSets = ranked.crossJoin(broadcast(kTable))
      .filter(col("rank") <= col("k_dims"))
      .groupBy("k_dims")
      .agg(sort_array(collect_list(col("dim"))).as("dims"))
    val base = e.crossJoin(broadcast(dimSets))
      .withColumn("pe", expr("transform(dims, i -> embedding[i])"))
    val q = base.filter(col("vec_id") < 5)
      .select(col("k_dims"), col("vec_id").as("qid"), col("pe").as("pq"))
    val c = base.select(col("k_dims"), col("vec_id"), col("pe").as("pc"))
    val res = c.join(q, "k_dims")
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cosine",
        round(graft.functions.cosine_sim(col("pq"), col("pc")), 9))
      .withColumn("rn", row_number().over(
        Window.partitionBy("k_dims", "qid").orderBy(desc("cosine"), col("vec_id"))))
      .filter(col("rn") <= 5)
      .select(col("k_dims"), col("qid"), col("vec_id"))
    val truth = Similarity.s01_knn_brute(s, d).select(col("qid"), col("vec_id"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    res.join(truth.withColumn("hit", lit(1)), Seq("qid", "vec_id"), "left")
      .groupBy("k_dims")
      .agg(count(col("hit")).as("n_hit"))
      .crossJoin(broadcast(nTruth))
      .select(col("k_dims").cast("long").as("k_dims"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_truth").cast("double"), 9)
          .as("recall"))
      .orderBy("k_dims")
  }
  val s21Sql: String = {
    def cos(a: String, b: String): String =
      s"""round(list_dot_product($a, $b)
           / (sqrt(list_dot_product($a, $a))
              * sqrt(list_dot_product($b, $b))), 9)"""
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
      dims AS (SELECT vec_id, generate_subscripts(emb, 1) - 1 AS dim,
                 unnest(emb) AS v FROM e),
      m AS (SELECT dim, COUNT(*) AS n,
              SUM(CAST(v AS DECIMAL(30,10))) AS s1,
              SUM(CAST(v * v AS DECIMAL(30,10))) AS s2
            FROM dims GROUP BY 1),
      mv AS (SELECT dim,
               round((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9)
                 AS variance
             FROM m),
      rk AS (SELECT dim,
               row_number() OVER (ORDER BY variance DESC, dim) AS rank
             FROM mv),
      ds AS (SELECT k_dims, list(dim + 1 ORDER BY dim) AS sel
             FROM rk CROSS JOIN (VALUES (16), (32)) AS kk(k_dims)
             WHERE rank <= k_dims GROUP BY 1),
      b AS (SELECT k_dims, vec_id, list_select(emb, sel) AS pe
            FROM e CROSS JOIN ds),
      qb AS (SELECT k_dims, vec_id AS qid, pe AS pq FROM b WHERE vec_id < 5),
      res AS (SELECT k_dims, qid, vec_id FROM (
                SELECT cb.k_dims, qid, cb.vec_id,
                  row_number() OVER (PARTITION BY cb.k_dims, qid
                    ORDER BY ${cos("pq", "pe")} DESC, cb.vec_id) AS rn
                FROM b cb JOIN qb ON cb.k_dims = qb.k_dims
                WHERE cb.vec_id <> qb.qid) WHERE rn <= 5),
      q2 AS (SELECT vec_id AS qid, emb AS qe2 FROM e WHERE vec_id < 5),
      p AS (SELECT qid, vec_id,
              list_dot_product(qe2, emb)
                / (sqrt(list_dot_product(qe2, qe2))
                   * sqrt(list_dot_product(emb, emb))) AS cosine
            FROM q2 JOIN e ON vec_id <> qid),
      truth AS (SELECT qid, vec_id FROM (
                  SELECT *, row_number() OVER (PARTITION BY qid
                             ORDER BY cosine DESC, vec_id) AS rn
                  FROM p) WHERE rn <= 5),
      nt AS (SELECT COUNT(*) AS n_truth FROM truth),
      h AS (SELECT k_dims,
              COUNT(*) FILTER (WHERE EXISTS (
                SELECT 1 FROM truth t
                WHERE t.qid = res.qid AND t.vec_id = res.vec_id)) AS n_hit
            FROM res GROUP BY 1)
      SELECT CAST(k_dims AS BIGINT) AS k_dims, n_hit,
             round(CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE), 9) AS recall
      FROM h CROSS JOIN nt ORDER BY k_dims"""
  }

  val queries: Map[String, Q] = Map(
    "s21_dim_prune_recall"  -> s21_dim_prune_recall,
    "s20_filtered_knn"      -> s20_filtered_knn,
    "s19_dim_screen"        -> s19_dim_screen,
    "s18_reassignment_rate" -> s18_reassignment_rate,
    "s17_nprobe_recall"   -> s17_nprobe_recall,
    "d26_cluster_quality" -> d26_cluster_quality,
    "s16_nn_confusion"    -> s16_nn_confusion,
    "s15_knn_eval"        -> s15_knn_eval,
    "s14_embedding_drift" -> s14_embedding_drift,
    "s06_kmeans_refine"  -> s06_kmeans_refine,
    "s11_cluster_exemplars" -> s11_cluster_exemplars,
    "s12_rrf_fusion"     -> s12_rrf_fusion,
    "s07_pairwise_stats" -> s07_pairwise_stats,
    "s08_ann_recall"     -> s08_ann_recall,
    "s09_scalar_quant"   -> s09_scalar_quant,
    "s10_mmr_diversify"  -> s10_mmr_diversify,
    "s13_radius_search"  -> s13_radius_search,
  )
  val oracles: Map[String, String] = Map(
    "s21_dim_prune_recall"  -> s21Sql,
    "s20_filtered_knn"      -> s20Sql,
    "s19_dim_screen"        -> s19Sql,
    "s18_reassignment_rate" -> s18Sql,
    "s17_nprobe_recall"   -> s17Sql,
    "d26_cluster_quality" -> d26Sql,
    "s16_nn_confusion"    -> s16Sql,
    "s15_knn_eval"        -> s15Sql,
    "s14_embedding_drift" -> s14Sql,
    "s06_kmeans_refine"  -> s06Sql,
    "s11_cluster_exemplars" -> s11Sql,
    "s12_rrf_fusion"     -> s12Sql,
    "s07_pairwise_stats" -> s07Sql,
    "s08_ann_recall"     -> s08Sql,
    "s09_scalar_quant"   -> s09Sql,
    "s10_mmr_diversify"  -> s10Sql,
    "s13_radius_search"  -> s13Sql,
  )
}
