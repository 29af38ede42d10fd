package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-quality / language / tokenization operators — SURVEY.md §2.
  *
  * All per-row narrow transforms built from codegen'd builtins (split,
  * regexp, filter/lambda) — they run inside the scan stage at any scale.
  * Every op is replicated exactly in DuckDB SQL for the oracle.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  // Small fixed stopword profiles; deterministic and SQL-replicable.
  private val en = Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")
  private val es = Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los")
  private val de = Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "auf", "ist")
  private def arr(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")

  // ---- t01: stopword-profile language scorer ----
  val t01_lang_id: Q = (s, d) => {
    val scored = Tables.documents(s, d)
      .withColumn("words", split(lower(col("text")), " "))
      .withColumn("en_hits", expr(s"CAST(size(filter(words, w -> array_contains(array(${arr(en)}), w))) AS BIGINT)"))
      .withColumn("es_hits", expr(s"CAST(size(filter(words, w -> array_contains(array(${arr(es)}), w))) AS BIGINT)"))
      .withColumn("de_hits", expr(s"CAST(size(filter(words, w -> array_contains(array(${arr(de)}), w))) AS BIGINT)"))
    scored
      .withColumn("pred_lang",
        when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("de_hits"), "en")
          .when(col("es_hits") >= col("de_hits"), "es")
          .otherwise("de"))
      .select("doc_id", "en_hits", "es_hits", "de_hits", "pred_lang")
      .orderBy("doc_id")
  }
  val t01Sql: String =
    s"""SELECT doc_id, en_hits, es_hits, de_hits,
       CASE WHEN en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
            WHEN es_hits >= de_hits THEN 'es' ELSE 'de' END AS pred_lang
       FROM (SELECT doc_id,
         len(list_filter(string_split(lower(text), ' '), w -> list_contains([${arr(en)}], w))) AS en_hits,
         len(list_filter(string_split(lower(text), ' '), w -> list_contains([${arr(es)}], w))) AS es_hits,
         len(list_filter(string_split(lower(text), ' '), w -> list_contains([${arr(de)}], w))) AS de_hits
       FROM documents) t ORDER BY doc_id"""

  // ---- t02: composite quality score ----
  val t02_quality_score: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("n_chars_m", length(col("text")).cast("long"))
      .withColumn("n_words", size(split(trim(col("text")), " ")).cast("long"))
      .withColumn("n_alnum", length(regexp_replace(col("text"), "[^A-Za-z0-9]", "")).cast("long"))
      .withColumn("punct_ratio",
        (col("n_chars_m") - col("n_alnum")).cast("double") / col("n_chars_m"))
      .withColumn("stop_hits",
        expr(s"CAST(size(filter(split(lower(text), ' '), w -> array_contains(array(${arr(en)}), w))) AS BIGINT)"))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_words"))
      .withColumn("quality",
        lit(0.4) * col("stop_ratio")
          + lit(0.3) * least(lit(1.0), col("n_words").cast("double") / 100.0)
          + lit(0.3) * (lit(1.0) - col("punct_ratio")))
      .select("doc_id", "n_words", "punct_ratio", "stop_ratio", "quality")
      .orderBy("doc_id")
  }
  val t02Sql: String =
    s"""SELECT doc_id, n_words, punct_ratio, stop_ratio,
       0.4 * stop_ratio + 0.3 * least(1.0, CAST(n_words AS DOUBLE) / 100.0)
         + 0.3 * (1.0 - punct_ratio) AS quality
       FROM (SELECT doc_id, n_words,
          CAST(n_chars_m - n_alnum AS DOUBLE) / n_chars_m AS punct_ratio,
          CAST(stop_hits AS DOUBLE) / n_words AS stop_ratio
        FROM (SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars_m,
          len(string_split(trim(text), ' ')) AS n_words,
          CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS BIGINT) AS n_alnum,
          len(list_filter(string_split(lower(text), ' '), w -> list_contains([${arr(en)}], w))) AS stop_hits
        FROM documents) a) b ORDER BY doc_id"""

  // ---- t03: token counting (whitespace + BPE-ish regex + len/4 estimate) ----
  val t03_token_count: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("ws_tokens", size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("re_tokens",
        size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long"))
      .withColumn("est_bpe", ceil(length(col("text")).cast("double") / 4.0).cast("long"))
      .select("doc_id", "ws_tokens", "re_tokens", "est_bpe")
      .orderBy("doc_id")
  }
  val t03Sql: String =
    """SELECT doc_id,
        len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
        len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS re_tokens,
        CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS est_bpe
      FROM documents ORDER BY doc_id"""

  // ---- t04: document fingerprints (normalized md5 + bag-of-words md5) ----
  val t04_fingerprint: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("norm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("fp_exact", md5(col("norm")))
      .withColumn("fp_bag",
        md5(array_join(array_sort(array_distinct(split(col("norm"), " "))), " ")))
      .select("doc_id", "fp_exact", "fp_bag")
      .orderBy("doc_id")
  }
  val t04Sql: String =
    """SELECT doc_id, md5(norm) AS fp_exact,
        md5(array_to_string(list_sort(list_distinct(string_split(norm, ' '))), ' ')) AS fp_bag
      FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
            FROM documents) t ORDER BY doc_id"""

  // ---- m01: multimodal binary-column plumbing ----
  // Real pipeline shape: opaque binary payload + typed metadata struct +
  // deterministic "decode" producing feature columns. The codec itself is
  // a STUB (no image/audio libs in this container): features derive from
  // byte length / first byte, but the schema, column plumbing, and
  // pushdown behavior are exactly what a real decoder plugs into.
  val m01_binary_meta: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("first_byte", ascii(substring(col("text"), 1, 1)).cast("long"))
      .withColumn("fake_width", (col("byte_len") % 1024).cast("long"))
      .withColumn("fake_height", expr("CAST((byte_len div 7) % 768 AS BIGINT)"))
      .select("doc_id", "byte_len", "first_byte", "fake_width", "fake_height")
      .orderBy("doc_id")
  }
  val m01Sql: String =
    """SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
        CAST(octet_length(encode(text)) % 1024 AS BIGINT) AS fake_width,
        CAST((octet_length(encode(text)) // 7) % 768 AS BIGINT) AS fake_height
      FROM documents ORDER BY doc_id"""

  // ---- t05: TF-IDF over the corpus ----
  // Exact integer counts everywhere until the final per-row double math
  // (ln is bit-identical across engines on the same inputs); top terms by
  // tf-idf per document for a bounded sample of docs.
  val t05_tfidf: Q = (s, d) => {
    val words = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
    // df derives from tf (its rows are the distinct (doc, word) pairs):
    // no second explode, no distinct — and because the tf subplan is
    // IDENTICAL on both sides of the join, ReuseExchange computes its
    // shuffle once (a persist here would only add cache-write overhead)
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(s, d).select(countDistinct("doc_id").as("n_docs"))
    tf.join(df_, "word")
      .join(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 9))
      .filter(col("doc_id") % 50 === 0)
      .select("doc_id", "word", "tf", "df", "tfidf")
      .orderBy("doc_id", "word")
  }
  val t05Sql: String =
    """WITH words AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents),
      w AS (SELECT * FROM words WHERE word <> ''),
      tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2),
      df AS (SELECT word, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, word FROM w) GROUP BY 1),
      nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
      SELECT doc_id, word, tf, df,
             round(tf * ln(CAST(n_docs AS DOUBLE) / df), 9) AS tfidf
      FROM tf JOIN df USING (word) CROSS JOIN nd
      WHERE doc_id % 50 = 0 ORDER BY doc_id, word"""

  val queries: Map[String, Q] = Map(
    "t05_tfidf"         -> t05_tfidf,
    "t01_lang_id"       -> t01_lang_id,
    "t02_quality_score" -> t02_quality_score,
    "t03_token_count"   -> t03_token_count,
    "t04_fingerprint"   -> t04_fingerprint,
    "m01_binary_meta"   -> m01_binary_meta,
  )
  val oracles: Map[String, String] = Map(
    "t05_tfidf"         -> t05Sql,
    "t01_lang_id"       -> t01Sql,
    "t02_quality_score" -> t02Sql,
    "t03_token_count"   -> t03Sql,
    "t04_fingerprint"   -> t04Sql,
    "m01_binary_meta"   -> m01Sql,
  )
}
