package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dedup family, part 5: weighted similarity. */
object Dedup5 {
  type Q = (SparkSession, String) => DataFrame

  // ---- d23: rarity-weighted Jaccard near-dup pairs ----
  // Plain Jaccard (d03) counts every shared shingle equally, so two
  // documents agreeing only on boilerplate ("all rights reserved...")
  // score as high as two sharing distinctive content. Production
  // near-dup filters weight shingles by rarity (idf-weighted / SOTA
  // "soft dedup"): weighted Jaccard = Σ_{shared} w(g) / Σ_{union} w(g).
  // Here w(g) = n_docs − df(g) — the LINEAR rarity weight — because it
  // keeps every weight an integer: the pair scores are ratios of exact
  // BIGINT sums, replayable to the last bit by the oracle (log-idf
  // weights are one substitution away and change nothing structural).
  //
  // Plan shape (the 100 TB discipline of the family): shingle once,
  // persist; df = one gram-keyed aggregate (vocab-sized result); the
  // weight table joins back gram-keyed (AQE broadcasts it while it
  // fits, falls back to a hash join when a 10¹¹-gram vocabulary
  // doesn't); candidates come ONLY from rare grams (df <= 5 — the
  // blocking rule, replicated verbatim in the oracle), so the pair
  // space is bounded by Σ_rare df², never docs²; the full weighted
  // intersection is then computed for candidate pairs only, via two
  // keyed joins (pair × grams-of-a, matched against grams-of-b on the
  // (id, gram) key — expansion is |pairs| × |grams per doc|, metadata-
  // sized). Grams ride shuffles as 128-bit md5 keys: this op SUMS
  // per-gram weights, so it follows the count-bearing-family policy
  // (a 64-bit collision would corrupt a weight sum; 128-bit keeps
  // sums exact at 10¹²-gram scale).
  val d23_weighted_jaccard: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val sh = docs
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"), expr(
        """array_distinct(transform(
             sequence(1, greatest(size(words) - 2, 0)),
             i -> concat_ws(' ', slice(words, i, 3))))""").as("shs"))
      .select(col("doc_id"), explode(col("shs")).as("sh"))
      .select(col("doc_id"), unhex(md5(col("sh"))).as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val weights = sh.groupBy("k").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("k"), col("df"), (col("n_docs") - col("df")).as("wt"))
    val tok = sh.join(weights, "k")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = tok.groupBy("doc_id").agg(sum("wt").as("totw"))
    val rare = tok.filter(col("df") <= 5).select(col("doc_id"), col("k"))
    val cand = rare.select(col("doc_id").as("id_a"), col("k"))
      .join(rare.select(col("doc_id").as("id_b"), col("k")), "k")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val shared = cand
      .join(tok.select(col("doc_id").as("id_a"), col("k"), col("wt")), "id_a")
      .join(tok.select(col("doc_id").as("id_b"), col("k")), Seq("id_b", "k"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"), sum("wt").as("w_shared"))
    shared
      .join(totals.select(col("doc_id").as("id_a"), col("totw").as("__ta")), "id_a")
      .join(totals.select(col("doc_id").as("id_b"), col("totw").as("__tb")), "id_b")
      .withColumn("wjaccard",
        col("w_shared").cast("double") /
          (col("__ta") + col("__tb") - col("w_shared")))
      .filter(col("wjaccard") >= 0.5)
      .select("id_a", "id_b", "n_shared", "w_shared", "wjaccard")
      .orderBy("id_a", "id_b")
  }
  val d23Sql: String =
    """WITH w AS (SELECT doc_id, generate_subscripts(string_split(text,' '),1) i,
                       unnest(string_split(text,' ')) w FROM documents),
      g AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS sh
            FROM w a JOIN w b ON a.doc_id=b.doc_id AND b.i=a.i+1
                     JOIN w c ON c.doc_id=a.doc_id AND c.i=a.i+2),
      dd AS (SELECT DISTINCT doc_id, sh FROM g),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      dfreq AS (SELECT sh, COUNT(*) AS df FROM dd GROUP BY sh),
      tok AS (SELECT doc_id, dd.sh, dfreq.df, (n.n_docs - dfreq.df) AS wt
              FROM dd JOIN dfreq USING (sh) CROSS JOIN n),
      tot AS (SELECT doc_id, SUM(wt) AS totw FROM tok GROUP BY doc_id),
      cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
               FROM tok x JOIN tok y ON x.sh = y.sh AND x.doc_id < y.doc_id
               WHERE x.df <= 5),
      shared AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_shared,
                        CAST(SUM(a.wt) AS BIGINT) AS w_shared
                 FROM cand c
                 JOIN tok a ON a.doc_id = c.id_a
                 JOIN tok b ON b.doc_id = c.id_b AND b.sh = a.sh
                 GROUP BY 1, 2)
      SELECT id_a, id_b, n_shared, w_shared,
             CAST(w_shared AS DOUBLE) / (ta.totw + tb.totw - w_shared) AS wjaccard
      FROM shared JOIN tot ta ON id_a = ta.doc_id
                  JOIN tot tb ON id_b = tb.doc_id
      WHERE CAST(w_shared AS DOUBLE) / (ta.totw + tb.totw - w_shared) >= 0.5
      ORDER BY id_a, id_b"""

  val queries: Map[String, Q] = Map(
    "d23_weighted_jaccard" -> d23_weighted_jaccard,
  )
  val oracles: Map[String, String] = Map(
    "d23_weighted_jaccard" -> d23Sql,
  )
}
