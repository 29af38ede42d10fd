package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Similarity search, part 3: embedding-space data quality. */
object Similarity3 {
  type Q = (SparkSession, String) => DataFrame

  // ---- s22: out-of-distribution audit (distance-to-own-centroid) ----
  // The per-VECTOR quality gate the family lacked: s14 detects COHORT
  // drift (did this week's embedding distribution move?), s16 scores
  // label agreement via neighbors — but the curation question "which
  // individual vectors don't belong to their own label?" (mislabeled
  // rows, encoder failures, genuine OOD inputs) is a per-row score:
  // cosine to the label's own centroid, z-scored against the label's
  // similarity distribution. Vectors more than 2σ BELOW the label mean
  // are flagged — the embedding-space analog of v14's outlier census,
  // and the quarantine feed before semantic dedup (d14/d22) trusts the
  // label structure.
  //
  // Engine shape: the fact-scale stages are the posexplode (corpus ×
  // dims rows, narrow) and TWO (label|vec)-keyed combinable aggregates
  // — centroid build (s03's decimal-mean recipe) and per-vector
  // dot/norm accumulation against the broadcast label×dim centroid
  // table. Per-label stats, flags, and worst-vector attribution all
  // run on vector-count-sized frames; the min-cos window partitions by
  // label (never unpartitioned).
  //
  // Cross-engine exactness: cosine is invariant to positive scaling
  // of the centroid, so the centroid is the per-dim SUM, not the mean —
  // an exact DECIMAL(30,10) whose double cast is bit-identical on both
  // engines (unscaled value < 2^53, so int128→double is exact and the
  // ÷10^scale is one correctly-rounded division on each side). No
  // round() ever touches the centroid — this dodges the half-boundary
  // trap: a decimal sum divided by a small integer count TERMINATES,
  // often exactly on a .5×10⁻⁹ boundary, where Spark (exact-expansion
  // HALF_UP) and DuckDB (multiply-then-std::round) disagree. Dot/norm
  // sums ride decimals sized so their unscaled values also stay < 2^53
  // (exact casts); cosine, mean, sd, and the 2σ threshold are then
  // fixed-parenthesization IEEE ops on bit-identical doubles — the OOD
  // verdict is an exact comparison, and only messy (non-terminating)
  // quotients are ever rounded for output.
  val s22_ood_audit: Q = (s, d) => {
    val ex = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("label"), col("dim"),
        col("v").cast("double").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cent = ex.groupBy("label", "dim")
      .agg(sum(col("v").cast(DecimalType(30, 10))).cast("double").as("c"))
    val cnorm = cent.groupBy("label")
      .agg(sum((col("c") * col("c")).cast(DecimalType(30, 8)))
        .cast("double").as("c2"))
    val per = ex.join(broadcast(cent), Seq("label", "dim"))
      .groupBy("vec_id", "label")
      .agg(sum((col("v") * col("c")).cast(DecimalType(30, 8)))
          .cast("double").as("dot"),
        sum((col("v") * col("v")).cast(DecimalType(30, 12)))
          .cast("double").as("v2"))
      .join(broadcast(cnorm), "label")
      .withColumn("cos", col("dot") / (sqrt(col("v2")) * sqrt(col("c2"))))
    val st = per.groupBy("label").agg(
      count(lit(1)).as("n_vecs"),
      sum(col("cos").cast(DecimalType(30, 12))).cast("double").as("s1"),
      sum((col("cos") * col("cos")).cast(DecimalType(30, 12)))
        .cast("double").as("s2"))
      .withColumn("mean_cos", col("s1") / col("n_vecs"))
      .withColumn("sd_cos",
        sqrt((col("s2") - col("s1") * col("s1") / col("n_vecs"))
          / (col("n_vecs") - 1)))
      .select("label", "mean_cos", "sd_cos")
    per.join(broadcast(st), "label")
      .withColumn("min_c", min("cos").over(Window.partitionBy("label")))
      .groupBy("label").agg(
        count(lit(1)).as("n_vecs"),
        round(max("mean_cos"), 9).as("mean_cos"),
        round(max("sd_cos"), 9).as("sd_cos"),
        count(when(col("cos") < col("mean_cos") - lit(2.0) * col("sd_cos"),
          1)).as("n_ood"),
        round(min("cos"), 9).as("min_cos"),
        min(when(col("cos") === col("min_c"), col("vec_id")))
          .as("worst_vec_id"))
      .orderBy("label")
  }
  val s22Sql: String =
    """WITH ex AS (SELECT vec_id, label,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS v
             FROM embeddings),
      cent AS (SELECT label, dim,
                 CAST(SUM(CAST(v AS DECIMAL(30,10))) AS DOUBLE) AS c
               FROM ex GROUP BY 1, 2),
      cn AS (SELECT label,
               CAST(SUM(CAST(c * c AS DECIMAL(30,8))) AS DOUBLE) AS c2
             FROM cent GROUP BY 1),
      per AS (SELECT vec_id, ex.label,
                CAST(SUM(CAST(ex.v * cent.c AS DECIMAL(30,8))) AS DOUBLE)
                  AS dot,
                CAST(SUM(CAST(ex.v * ex.v AS DECIMAL(30,12))) AS DOUBLE)
                  AS v2
              FROM ex JOIN cent ON ex.label = cent.label AND ex.dim = cent.dim
              GROUP BY 1, 2),
      pc AS (SELECT vec_id, per.label, dot / (sqrt(v2) * sqrt(c2)) AS cos
             FROM per JOIN cn ON per.label = cn.label),
      st AS (SELECT label, COUNT(*) AS n,
               CAST(SUM(CAST(cos AS DECIMAL(30,12))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(cos * cos AS DECIMAL(30,12))) AS DOUBLE) AS s2
             FROM pc GROUP BY 1),
      sm AS (SELECT label, s1 / n AS mean_cos,
               sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd_cos
             FROM st),
      fl AS (SELECT pc.vec_id, pc.label, pc.cos, mean_cos, sd_cos,
               min(cos) OVER (PARTITION BY pc.label) AS min_c
             FROM pc JOIN sm ON pc.label = sm.label)
      SELECT label, COUNT(*) AS n_vecs,
        round(MAX(mean_cos), 9) AS mean_cos,
        round(MAX(sd_cos), 9) AS sd_cos,
        COUNT(CASE WHEN cos < mean_cos - CAST(2.0 AS DOUBLE) * sd_cos
              THEN 1 END) AS n_ood,
        round(MIN(cos), 9) AS min_cos,
        MIN(CASE WHEN cos = min_c THEN vec_id END) AS worst_vec_id
      FROM fl GROUP BY label ORDER BY label"""

  // ---- s23: kNN hubness audit (the curse-of-dimensionality gauge) ----
  // The embedding-space pathology detector: in high dimensions some
  // vectors ("hubs") appear in a wildly disproportionate share of other
  // points' nearest-neighbor lists while many ("antihubs") appear in
  // none — hubness (Radovanović et al., JMLR 2010) skews every kNN
  // consumer downstream (s01/s15's eval, d05's near-dup pairs, g06-style
  // recommendations) and is invisible to per-query checks because each
  // individual list looks fine. Measured directly: in-degree of the
  // kNN graph over a deterministic md5-picked query sample (~6% of the
  // corpus — the sample is the honest cost bound: in-degrees are
  // sample-relative, stated, and the sample scales with the corpus),
  // top hubs + antihub count reported.
  //
  // Engine shape: s01's broadcast-queries brute pass (the corpus side
  // streams once; candidates never leave their partition), one
  // qid-partitioned rank window, one combinable in-degree count, and a
  // TakeOrderedAndProject top-10 on a total order. At 100 TB the same
  // audit runs the scan over the LSH/IVF candidate lists instead —
  // identical downstream plan.
  //
  // Exactness: cosine via the codegen'd CosineSim primitive (verified
  // bit-identical to the oracle's list_dot_product formula — the s01
  // parity); everything after is integer counts.
  val s23_hubness: Q = (s, d) => {
    import graft.functions.cosine_sim
    val e = Tables.embeddings(s, d)
    val queries = e
      .filter(conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100 < 6)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), col("vec_id"))
    val knn = e.select(col("vec_id"), col("embedding").as("ce"))
      .join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("cosine", cosine_sim(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
    val indeg = knn.groupBy("vec_id").agg(count(lit(1)).as("in_degree"))
    val nq = queries.agg(count(lit(1)).as("n_queries"))
    val nv = e.agg(count(lit(1)).as("n_vectors"))
    val nApp = indeg.agg(count(lit(1)).as("n_appearing"))
    indeg.orderBy(desc("in_degree"), col("vec_id")).limit(10)
      .crossJoin(broadcast(nq)).crossJoin(broadcast(nv))
      .crossJoin(broadcast(nApp))
      .select(col("vec_id"), col("in_degree"), col("n_queries"),
        (col("n_vectors") - col("n_appearing")).as("n_antihubs"))
      .orderBy(desc("in_degree"), col("vec_id"))
  }
  private val duckCos =
    """list_dot_product(CAST(qe AS DOUBLE[]), CAST(ce AS DOUBLE[]))
       / (sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[])))
          * sqrt(list_dot_product(CAST(ce AS DOUBLE[]), CAST(ce AS DOUBLE[]))))"""
  val s23Sql: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
             WHERE ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 100 < 6),
      c AS (SELECT vec_id, embedding AS ce FROM embeddings),
      p AS (SELECT qid, vec_id, $duckCos AS cosine
            FROM q, c WHERE vec_id <> qid),
      r AS (SELECT qid, vec_id, row_number() OVER (
              PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rk
            FROM p),
      ind AS (SELECT vec_id, COUNT(*) AS in_degree FROM r
              WHERE rk <= 10 GROUP BY 1),
      nq AS (SELECT COUNT(*) AS n_queries FROM q),
      nv AS (SELECT COUNT(*) AS n_vectors FROM embeddings),
      na AS (SELECT COUNT(*) AS n_appearing FROM ind)
      SELECT vec_id, in_degree, n_queries,
        n_vectors - n_appearing AS n_antihubs
      FROM ind, nq, nv, na
      ORDER BY in_degree DESC, vec_id LIMIT 10"""

  // ---- s24: embedding norm audit (is this corpus cosine-ready?) ----
  // The hygiene check every vector pipeline should run before trusting
  // a similarity metric: encoders that L2-normalize let dot product
  // stand in for cosine (and IVF/PQ quantizers assume it); a batch that
  // silently mixes normalized and raw vectors (two encoder versions,
  // one missing post-processing step) breaks that equivalence in ways
  // no per-query result reveals. Per label: norm moments, the
  // unit-norm share (|‖v‖ − 1| < 0.01), and the extremes — a share
  // far from 0 or 1 means MIXED provenance, the actual bug signature.
  //
  // Engine shape: one posexplode + ONE (vec)-keyed combinable
  // norm-square aggregate, then a label-sized moment rollup — nothing
  // wider than the label frame shuffles twice. Exactness: Σv² rides
  // DECIMAL(30,12) (unscaled < 2^53 ⇒ exact bit-identical casts), the
  // norm is one sqrt, moments ride decimals again, the unit-band test
  // compares bit-identical doubles.
  val s24_norm_audit: Q = (s, d) => {
    val norms = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("label"), col("v").cast("double").as("v"))
      .groupBy("vec_id", "label")
      .agg(sqrt(sum((col("v") * col("v")).cast(DecimalType(30, 12)))
        .cast("double")).as("nrm"))
    // dispersion is reported as mean |nrm - 1| (deviation from unit), NOT
    // a variance: the norms sit so close to 1 that (s2 - s1^2/n) is pure
    // catastrophic cancellation at the level where the two engines'
    // double->decimal casts differ (DuckDB multiplies by 10^scale before
    // rounding; Java rounds the exact expansion — a ~1e-12 divergence
    // the cancellation amplifies 40%), while the absolute deviation is
    // stable three orders of magnitude above it
    norms.groupBy("label").agg(
      count(lit(1)).as("n_vecs"),
      sum(col("nrm").cast(DecimalType(30, 12))).cast("double").as("s1"),
      sum(abs(col("nrm") - lit(1.0)).cast(DecimalType(30, 12)))
        .cast("double").as("sdev"),
      count(when(abs(col("nrm") - lit(1.0)) < 0.01, 1)).as("n_unit"),
      round(min("nrm"), 9).as("min_norm"),
      round(max("nrm"), 9).as("max_norm"))
      .select(col("label"), col("n_vecs"),
        round(col("s1") / col("n_vecs"), 9).as("mean_norm"),
        round(col("sdev") / col("n_vecs"), 9).as("mean_unit_dev"),
        col("n_unit"),
        round(col("n_unit").cast("double") / col("n_vecs").cast("double"), 9)
          .as("unit_share"),
        col("min_norm"), col("max_norm"))
      .orderBy("label")
  }
  val s24Sql: String =
    """WITH ex AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE)
               AS v FROM embeddings),
      nr AS (SELECT vec_id, label,
               sqrt(CAST(SUM(CAST(v * v AS DECIMAL(30,12))) AS DOUBLE))
                 AS nrm
             FROM ex GROUP BY 1, 2),
      m AS (SELECT label, COUNT(*) AS n_vecs,
              CAST(SUM(CAST(nrm AS DECIMAL(30,12))) AS DOUBLE) AS s1,
              CAST(SUM(CAST(abs(nrm - CAST(1.0 AS DOUBLE))
                    AS DECIMAL(30,12))) AS DOUBLE) AS sdev,
              COUNT(CASE WHEN abs(nrm - CAST(1.0 AS DOUBLE)) < 0.01
                    THEN 1 END) AS n_unit,
              round(MIN(nrm), 9) AS min_norm,
              round(MAX(nrm), 9) AS max_norm
            FROM nr GROUP BY 1)
      SELECT label, n_vecs,
        round(s1 / n_vecs, 9) AS mean_norm,
        round(sdev / n_vecs, 9) AS mean_unit_dev,
        n_unit,
        round(CAST(n_unit AS DOUBLE) / CAST(n_vecs AS DOUBLE), 9)
          AS unit_share,
        min_norm, max_norm
      FROM m ORDER BY label"""

  // ---- s25: intrinsic dimension estimate (TwoNN, Facco 2017) ----
  // The geometry audit behind every "why is my ANN recall bad" ticket:
  // embeddings living on a low-dimensional manifold index well; ID
  // close to the ambient dimension means distance concentration and no
  // LSH/IVF config will save you. TwoNN needs only each point's two
  // nearest neighbors: mu_i = r2/r1, and the MLE is n / Σ ln(mu_i) —
  // no density assumptions, no k to tune. Computed on the d05-style
  // deterministic subsample (vec_id % 8 — ID is a distribution
  // property; at 100 TB you estimate it from a bounded sample, never
  // the corpus, and the sample bound makes the demonstration pairwise
  // pass constant-cost). Exactness discipline: distances stay SQUARED
  // ((|a|²+|b|²) − 2a·b — three IEEE ops over bit-replayable dot
  // folds; ln(r2/r1) = 0.5·ln(q2/q1) so no sqrt anywhere), per-point
  // log ratios round to 9 (the t08 log discipline), and the Σ rides a
  // DECIMAL(38,18) sum — order-independent, so the single-row estimate
  // is hash-exact cross-engine.
  val s25_intrinsic_dim: Q = (s, d) => {
    val e = Tables.embeddings(s, d).filter(col("vec_id") % 8 === 0)
      .select(col("vec_id"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"))
      .withColumn("n2", graft.functions.dot_product(col("v"), col("v")))
    val pairs = e.select(col("vec_id").as("qi"), col("v").as("qv"),
        col("n2").as("qn"))
      .join(e.select(col("vec_id").as("vj"), col("v").as("cv"),
        col("n2").as("cn")), col("qi") =!= col("vj"))
      .withColumn("d2",
        (col("qn") + col("cn"))
          - lit(2.0) * graft.functions.dot_product(col("qv"), col("cv")))
    val w = Window.partitionBy("qi").orderBy(col("d2"), col("vj"))
    val nn2 = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy("qi")
      .agg(min(when(col("rn") === 1, col("d2"))).as("q1"),
        min(when(col("rn") === 2, col("d2"))).as("q2"))
      .filter(col("q1") > 0)
      .withColumn("ln_mu", round(lit(0.5) * log(col("q2") / col("q1")), 9))
    nn2.agg(count(lit(1)).as("n_points"),
        sum(col("ln_mu").cast(DecimalType(38, 18))).cast("double")
          .as("sum_ln_mu"))
      .withColumn("id_twonn", round(
        col("n_points").cast("double") / col("sum_ln_mu"), 6))
      .select(col("n_points"), round(col("sum_ln_mu"), 9).as("sum_ln_mu"),
        col("id_twonn"))
  }
  val s25Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings WHERE vec_id % 8 = 0),
      n AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM e),
      p AS (SELECT a.vec_id AS qi, b.vec_id AS vj,
              (a.n2 + b.n2)
                - CAST(2.0 AS DOUBLE) * list_dot_product(a.v, b.v) AS d2
            FROM n a JOIN n b ON a.vec_id <> b.vec_id),
      r AS (SELECT qi, d2,
              row_number() OVER (PARTITION BY qi ORDER BY d2, vj) AS rn
            FROM p),
      nn AS (SELECT qi,
               MIN(CASE WHEN rn = 1 THEN d2 END) AS q1,
               MIN(CASE WHEN rn = 2 THEN d2 END) AS q2
             FROM r WHERE rn <= 2 GROUP BY qi),
      lm AS (SELECT qi,
               round(CAST(0.5 AS DOUBLE) * ln(q2 / q1), 9) AS ln_mu
             FROM nn WHERE q1 > 0),
      agg AS (SELECT COUNT(*) AS n_points,
                CAST(SUM(CAST(ln_mu AS DECIMAL(38,18))) AS DOUBLE)
                  AS sum_ln_mu
              FROM lm)
      SELECT n_points, round(sum_ln_mu, 9) AS sum_ln_mu,
        round(CAST(n_points AS DOUBLE) / sum_ln_mu, 6) AS id_twonn
      FROM agg"""

  // ---- s26: PQ codebook distortion audit ----
  // The acceptance test for s05's product quantizer BEFORE anyone ships
  // it: per subspace, the mean squared quantization error ||sv − cw||²
  // against the subspace's total variance ||sv − μ||² — a
  // distortion_ratio near 1 means that subspace's codebook explains
  // nothing (its bits are wasted; re-partition the dimensions), near 0
  // means near-lossless. Also counts codes actually USED: dead codes
  // are reconstruction capacity thrown away. Cross-engine exactness:
  // squared errors expand to dot products (sv·sv − 2·sv·cw + cw·cw) —
  // the same in-row fold shape s05's oracle already pins — with
  // centroids/means from the established DECIMAL(38,18) mean
  // discipline, per-subspace averages decimal-summed, everything
  // published at 1e-9. Oracle replays from the codes/codebook dump +
  // the embeddings table. Scale: one encoded-rows pass (n_vec × M),
  // codebook/means are broadcast-sized.
  val s26_pq_distortion: Q = (s, d) => {
    val davg18 = (c: org.apache.spark.sql.Column) =>
      sum(c.cast(org.apache.spark.sql.types.DataTypes
        .createDecimalType(38, 18))).cast("double") / count(c)
    val (codes, cents) = Similarity.pqParts(s, d)
    val mu = codes
      .select(col("m"), posexplode(col("sv")).as(Seq("i", "v")))
      .groupBy("m", "i").agg(davg18(col("v")).as("mv"))
      .groupBy("m")
      .agg(array_sort(collect_list(struct(col("i"), col("mv")))).as("ps"))
      .select(col("m"), expr("transform(ps, p -> p.mv)").as("muv"))
    def dot(a: String, b: String) = expr(
      s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
    val err = codes.join(broadcast(cents), Seq("m", "code"))
      .join(broadcast(mu), "m")
      .select(col("m"), col("code"),
        (dot("sv", "sv") - lit(2.0) * dot("sv", "cw") + dot("cw", "cw"))
          .as("e2"),
        (dot("sv", "sv") - lit(2.0) * dot("sv", "muv") + dot("muv", "muv"))
          .as("v2"))
    val out = err.groupBy("m").agg(
      count(lit(1)).as("n_vectors"),
      count_distinct(col("code")).as("n_codes_used"),
      round(davg18(col("e2")), 9).as("mse"),
      round(davg18(col("v2")), 9).as("var_total"))
      .withColumn("distortion_ratio",
        round(col("mse") / col("var_total"), 9))
      .select("m", "n_vectors", "n_codes_used", "mse", "var_total",
        "distortion_ratio")
      .orderBy("m")
    out
  }
  val s26Sql: String =
    """WITH codes AS (SELECT vec_id, m, code
             FROM read_parquet('/tmp/graft_aux/pq_codes/*.parquet')),
      cb AS (SELECT m, code, cw
             FROM read_parquet('/tmp/graft_aux/pq_codebook/*.parquet')),
      ms AS (SELECT unnest(generate_series(0, 7)) AS m),
      sv AS (SELECT e.vec_id, ms.m,
               array_slice(CAST(e.embedding AS DOUBLE[]),
                 ms.m * 8 + 1, ms.m * 8 + 8) AS sv
             FROM embeddings e, ms),
      mui AS (SELECT m, i.i,
                CAST(SUM(CAST(sv[i.i] AS DECIMAL(38,18))) AS DOUBLE)
                  / COUNT(sv[i.i]) AS mv
              FROM sv, (SELECT unnest(generate_series(1, 8)) AS i) i
              GROUP BY 1, 2),
      mu AS (SELECT m, list(mv ORDER BY i) AS mu FROM mui GROUP BY 1),
      err AS (SELECT s.m, c.code,
                list_dot_product(s.sv, s.sv)
                  - 2.0 * list_dot_product(s.sv, cb.cw)
                  + list_dot_product(cb.cw, cb.cw) AS e2,
                list_dot_product(s.sv, s.sv)
                  - 2.0 * list_dot_product(s.sv, mu.mu)
                  + list_dot_product(mu.mu, mu.mu) AS v2
              FROM sv s
                JOIN codes c ON s.vec_id = c.vec_id AND s.m = c.m
                JOIN cb ON c.m = cb.m AND c.code = cb.code
                JOIN mu ON s.m = mu.m),
      agg AS (SELECT m, COUNT(*) AS n_vectors,
                COUNT(DISTINCT code) AS n_codes_used,
                round(CAST(SUM(CAST(e2 AS DECIMAL(38,18))) AS DOUBLE)
                      / COUNT(e2), 9) AS mse,
                round(CAST(SUM(CAST(v2 AS DECIMAL(38,18))) AS DOUBLE)
                      / COUNT(v2), 9) AS var_total
              FROM err GROUP BY 1)
      SELECT CAST(m AS INTEGER) AS m, n_vectors, n_codes_used, mse,
        var_total, round(mse / var_total, 9) AS distortion_ratio
      FROM agg ORDER BY m"""

  // ---- s27: greedy k-center coreset (maxmin diverse selection) ----
  // The data-curation selector the family lacked: s10 re-ranks ONE
  // query's candidates (relevance vs redundancy), s11 shows each
  // cluster's most central members — but "give me k exemplars that
  // COVER the embedding space" (coreset for audit sets, few-shot
  // pools, annotation budgets, active-learning seeds) is the k-center
  // objective, and Gonzalez's greedy maxmin is its classic 2-approx:
  // start from a deterministic seed, then repeatedly pick the point
  // FARTHEST from everything selected so far (d(c,S) = 1 − max cos).
  // The reported radius at each pick is the coverage curve — how far
  // the worst-covered point sits after k exemplars, the number that
  // says whether your audit sample actually spans the corpus.
  //
  // Engine shape: each of the 7 rounds is ONE corpus scan against the
  // ≤k-row broadcast selected frame (the sanctioned crossJoin-of-
  // metadata idiom), a combinable per-vector max, and a global
  // TakeOrdered(1) argmax on the (round(dist,9) DESC, vec_id) total
  // order — no pairwise corpus×corpus anything, and selected points
  // eliminate themselves (their distance is exactly 0). Lineage is
  // truncated per round (lazy localCheckpoint — the Pregel-by-joins
  // discipline). Cosine is the bit-identical double fold (s01's parity
  // note), so the greedy trajectory replays exactly; the oracle
  // unrolls all rounds as chained MATERIALIZED CTEs.
  val s27_kcenter_coreset: Q = (s, d) => {
    import graft.functions.cosine_sim
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seed = e.orderBy("vec_id").limit(1)
      .select(col("vec_id"), col("embedding"), lit(1L).as("pick"),
        lit(null).cast("double").as("radius"))
      .localCheckpoint(false)
    val sel = (2 to 8).foldLeft(seed) { (selected, k) =>
      val farthest = e
        .crossJoin(broadcast(selected.select(col("embedding").as("se"))))
        .select(col("vec_id"),
          cosine_sim(col("embedding"), col("se")).as("c"))
        .groupBy("vec_id")
        .agg(round(lit(1.0) - max("c"), 9).as("dist"))
        .orderBy(desc("dist"), col("vec_id")).limit(1)
        .join(e, "vec_id")
        .select(col("vec_id"), col("embedding"), lit(k.toLong).as("pick"),
          col("dist").as("radius"))
      selected.unionByName(farthest).localCheckpoint(false)
    }
    sel.select(col("pick"), col("vec_id"), col("radius")).orderBy("pick")
  }
  val s27Sql: String = {
    val rounds = (2 to 8).map { k =>
      s"""n$k AS MATERIALIZED (SELECT f.vec_id, e.ce,
             CAST($k AS BIGINT) AS pick, f.dist AS radius
           FROM (SELECT e.vec_id, round(1.0 - MAX(
                   list_dot_product(e.ce, s.ce)
                     / (sqrt(list_dot_product(e.ce, e.ce))
                        * sqrt(list_dot_product(s.ce, s.ce)))), 9) AS dist
                 FROM e CROSS JOIN s${k - 1} s
                 GROUP BY e.vec_id
                 ORDER BY dist DESC, e.vec_id LIMIT 1) f
           JOIN e ON f.vec_id = e.vec_id),
         s$k AS MATERIALIZED (SELECT * FROM s${k - 1}
           UNION ALL SELECT * FROM n$k)"""
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id,
          CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
      s1 AS MATERIALIZED (SELECT vec_id, ce, CAST(1 AS BIGINT) AS pick,
          CAST(NULL AS DOUBLE) AS radius
        FROM e ORDER BY vec_id LIMIT 1),
      $rounds
      SELECT pick, vec_id, radius FROM s8 ORDER BY pick"""
  }

  // ---- s28: nearest-neighbor margin audit ----
  // How DECISIVE is each query's nearest neighbor? margin = cos(1st) −
  // cos(2nd): near zero means the top hit is interchangeable with the
  // runner-up (threshold-based dedup and top-1 retrieval are both
  // unstable there; any ANN recall loss flips answers), large means a
  // clear winner. The margin distribution is the signal that picks
  // d05-style near-dup thresholds and says whether top-1 eval metrics
  // (s15) are even meaningful — s16's confusion matrix tells you WHO
  // the neighbor is, this tells you by HOW MUCH it wins. Absolute
  // margin (a difference, not a ratio) so exact-duplicate top hits
  // (cos=1) need no divide-by-zero guard.
  //
  // Exactness: cosine is the shared [[graft.functions.cosine_sim]]
  // expression (bit-identical to the DuckDB replay — the s01
  // precedent), top-2 per query via a (cosine DESC, vec_id)-ordered
  // partitioned rank, the margin one IEEE subtraction rounded 1e-9
  // before banding, band means through Stable.dsum. Scale shape: this
  // is the EVAL harness (hash-sampled query panel × corpus, one
  // partitioned window) — production candidate generation stays
  // s02/s04's bucketed path; only top-2 scoring per query lands here.
  val s28_knn_margin: Q = (s, d) => {
    import graft.functions.cosine_sim
    val e = Tables.embeddings(s, d)
    val queries = e.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cands = e.select(col("vec_id"), col("embedding").as("ce"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), col("vec_id"))
    val top2 = cands.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("cosine", cosine_sim(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
    val margins = top2.groupBy("qid")
      .agg(max(when(col("rank") === 1, col("cosine"))).as("cos1"),
        max(when(col("rank") === 2, col("cosine"))).as("cos2"))
      .withColumn("margin", round(col("cos1") - col("cos2"), 9))
      .withColumn("band", when(col("margin") < 0.01, "ambiguous")
        .when(col("margin") < 0.05, "close").otherwise("clear"))
    margins.groupBy("band")
      .agg(count(lit(1)).as("n_queries"),
        round(graft.Stable.dsum(col("margin")) / count(lit(1)), 9)
          .as("mean_margin"),
        round(graft.Stable.dsum(col("cos1")) / count(lit(1)), 9)
          .as("mean_top1_cosine"))
      .orderBy("band")
  }
  val s28Sql: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
             WHERE vec_id % 10 = 0),
      c AS (SELECT vec_id, embedding AS ce FROM embeddings),
      p AS (SELECT qid, vec_id, $duckCos AS cosine
            FROM q, c WHERE vec_id <> qid),
      r AS (SELECT qid, cosine, row_number() OVER (
              PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rk
            FROM p),
      m AS (SELECT qid,
              round(MAX(CASE WHEN rk = 1 THEN cosine END)
                - MAX(CASE WHEN rk = 2 THEN cosine END), 9) AS margin,
              MAX(CASE WHEN rk = 1 THEN cosine END) AS cos1
            FROM r WHERE rk <= 2 GROUP BY qid),
      b AS (SELECT *, CASE WHEN margin < 0.01 THEN 'ambiguous'
              WHEN margin < 0.05 THEN 'close' ELSE 'clear' END AS band
            FROM m)
      SELECT band, COUNT(*) AS n_queries,
        round(${graft.Stable.sqlSum("margin")} / COUNT(*), 9)
          AS mean_margin,
        round(${graft.Stable.sqlSum("cos1")} / COUNT(*), 9)
          AS mean_top1_cosine
      FROM b GROUP BY band ORDER BY band"""

  val queries: Map[String, Q] = Map(
    "s28_knn_margin" -> s28_knn_margin,
    "s22_ood_audit" -> s22_ood_audit,
    "s23_hubness"   -> s23_hubness,
    "s24_norm_audit" -> s24_norm_audit,
    "s25_intrinsic_dim" -> s25_intrinsic_dim,
    "s26_pq_distortion" -> s26_pq_distortion,
    "s27_kcenter_coreset" -> s27_kcenter_coreset,
  )
  val oracles: Map[String, String] = Map(
    "s28_knn_margin" -> s28Sql,
    "s22_ood_audit" -> s22Sql,
    "s23_hubness"   -> s23Sql,
    "s24_norm_audit" -> s24Sql,
    "s25_intrinsic_dim" -> s25Sql,
    "s26_pq_distortion" -> s26Sql,
    "s27_kcenter_coreset" -> s27Sql,
  )
}
