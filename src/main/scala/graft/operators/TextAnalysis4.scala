package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Stable, Tables}

/** Text analysis, part 4: BM25 keyword retrieval and fixed-size
  * overlapping document chunking (the LLM-training tokenize-and-chunk
  * staple, minus the real tokenizer).
  */
object TextAnalysis4 {
  type Q = (SparkSession, String) => DataFrame

  // ---- t14: BM25 keyword scoring ----
  // Okapi BM25 over the corpus for a fixed query-term set. Exact integer
  // tf/df/dl everywhere; the only doubles are the final per-row closed
  // form (k1=1.25, b=0.75 — both exact binary fractions, so constant
  // arithmetic is bit-identical across engines). The per-doc score sum
  // runs over 6-decimal-rounded terms through the decimal-exact sum, so
  // the ranking is engine-exact. Corpus stats (n_docs, sum_dl) ride a
  // broadcast; tf/df join keys are the 3 query terms — the plan is two
  // narrow aggregations plus vocabulary-sized joins, linear at any corpus
  // size.
  val t14_bm25: Q = (s, d) => {
    val terms = Seq("spark", "hash", "window")
    val words = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
    val dl = words.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val tf = words.filter(col("word").isin(terms: _*))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val denom = col("tf").cast("double") +
      lit(1.25) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl)
    val scored = tf.join(broadcast(df_), "word")
      .join(dl, "doc_id")
      .join(broadcast(stats))
      .withColumn("score",
        round(idf * (col("tf").cast("double") * lit(2.25)) / denom, 6))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), round(Stable.dsum(col("score")), 6).as("bm25"))
      .orderBy(desc("bm25"), col("doc_id"))
      .limit(25)
  }
  val t14Sql: String =
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
             CROSS JOIN st s)
      SELECT doc_id, COUNT(*) AS n_terms,
             round(CAST(SUM(CAST(score AS DECIMAL(30,6))) AS DOUBLE), 6) AS bm25
      FROM sc GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id LIMIT 25"""

  // ---- t15: fixed-size overlapping chunking ----
  // Split each document into 32-token windows with stride 24 (8-token
  // overlap), the LLM context-window prep step. The last start is the
  // smallest stride multiple whose window reaches the end, so every token
  // lands in >=1 chunk and no fully-subsumed tail chunks are emitted.
  // Per-row narrow (sequence + explode + slice): zero shuffle, scales
  // linearly; chunk ids are pure functions of (doc, offset) so the op is
  // deterministic under any partitioning. Chunk text is md5'd to keep the
  // verify payload small.
  val t15_chunking: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("words", split(lower(col("text")), " "))
      .withColumn("n", size(col("words")))
      .filter(col("n") > 0)
    val withLast = docs.withColumn("last",
      expr("CASE WHEN n <= 32 THEN 0 ELSE ((n - 32 + 23) div 24) * 24 END"))
    withLast
      .select(col("doc_id"), col("words"), col("n"),
        explode(sequence(lit(0), col("last"), lit(24))).as("start"))
      .withColumn("chunk_tokens", least(lit(32), col("n") - col("start")))
      .select(col("doc_id"),
        (col("start") / 24).cast("long").as("chunk_id"),
        col("start").cast("long").as("start"),
        col("chunk_tokens").cast("long").as("chunk_tokens"),
        md5(array_join(
          slice(col("words"), col("start") + 1, col("chunk_tokens")), " "))
          .as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }
  val t15Sql: String =
    """WITH d0 AS (SELECT doc_id, string_split(lower(text), ' ') AS words
                 FROM documents),
      d1 AS (SELECT doc_id, words, len(words) AS n FROM d0 WHERE len(words) > 0),
      d2 AS (SELECT doc_id, words, n,
               CASE WHEN n <= 32 THEN 0 ELSE ((n - 32 + 23) // 24) * 24 END AS lst
             FROM d1),
      ch AS (SELECT doc_id, words, n,
               unnest(generate_series(0, lst, 24)) AS start FROM d2)
      SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_id,
             CAST(start AS BIGINT) AS start,
             CAST(least(32, n - start) AS BIGINT) AS chunk_tokens,
             md5(array_to_string(
               list_slice(words, start + 1, start + least(32, n - start)), ' '))
               AS chunk_md5
      FROM ch ORDER BY doc_id, chunk_id"""

  val queries: Map[String, Q] = Map(
    "t14_bm25"     -> t14_bm25,
    "t15_chunking" -> t15_chunking,
  )
  val oracles: Map[String, String] = Map(
    "t14_bm25"     -> t14Sql,
    "t15_chunking" -> t15Sql,
  )
}
