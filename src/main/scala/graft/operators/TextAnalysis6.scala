package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text analysis, part 6: rule-suite document filtering. */
object TextAnalysis6 {
  type Q = (SparkSession, String) => DataFrame

  private val stop = Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")
  private def arr(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")

  // ---- t18: Gopher-style rule-suite filter decision ----
  // The composite keep/drop gate of a training-corpus pipeline (Rae et
  // al. 2021 "Gopher" §A1.1 rules, thresholds adapted to this corpus):
  // word-count bounds, mean-word-length bounds, alphabetic-word
  // fraction, distinct-stopword floor. One narrow pass — every rule is
  // an array/string expression inside the scan stage, the decision is a
  // reason BITMASK (which rules failed, not just that one did), so the
  // downstream drop report (groupBy reasons) costs one tiny agg. All
  // counts are exact integers; the two ratios are single IEEE divisions
  // of exact ints, bit-identical across engines.
  val t18_gopher_filter: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("n_words", size(split(trim(col("text")), " ")).cast("long"))
      .withColumn("mean_wlen",
        length(regexp_replace(col("text"), " ", "")).cast("double") / col("n_words"))
      .withColumn("n_alpha",
        expr("CAST(size(filter(split(lower(text), ' '), w -> w RLIKE '^[a-z]+$')) AS BIGINT)"))
      .withColumn("frac_alpha", col("n_alpha").cast("double") / col("n_words"))
      .withColumn("n_stop",
        expr(s"CAST(size(filter(array(${arr(stop)}), sw -> array_contains(split(lower(text), ' '), sw))) AS BIGINT)"))
      .withColumn("reasons",
        (when(col("n_words") < 40 || col("n_words") > 100000, 1).otherwise(0)
          + when(col("mean_wlen") < 3.0 || col("mean_wlen") > 10.0, 2).otherwise(0)
          + when(col("frac_alpha") < 0.9, 4).otherwise(0)
          + when(col("n_stop") < 2, 8).otherwise(0)).cast("int"))
      .withColumn("keep", col("reasons") === 0)
      .select("doc_id", "n_words", "mean_wlen", "frac_alpha", "n_stop", "reasons", "keep")
      .orderBy("doc_id")
  }
  val t18Sql: String =
    s"""WITH m AS (SELECT doc_id,
          len(string_split(trim(text), ' ')) AS n_words,
          CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / len(string_split(trim(text), ' ')) AS mean_wlen,
          len(list_filter(string_split(lower(text), ' '),
              w -> regexp_matches(w, '^[a-z]+$$'))) AS n_alpha,
          len(list_filter([${arr(stop)}],
              sw -> list_contains(string_split(lower(text), ' '), sw))) AS n_stop
        FROM documents),
      r AS (SELECT doc_id, n_words, mean_wlen,
          CAST(n_alpha AS DOUBLE) / n_words AS frac_alpha, n_stop,
          CAST((CASE WHEN n_words < 40 OR n_words > 100000 THEN 1 ELSE 0 END
            + CASE WHEN mean_wlen < 3.0 OR mean_wlen > 10.0 THEN 2 ELSE 0 END
            + CASE WHEN CAST(n_alpha AS DOUBLE) / n_words < 0.9 THEN 4 ELSE 0 END
            + CASE WHEN n_stop < 2 THEN 8 ELSE 0 END) AS INTEGER) AS reasons
        FROM m)
      SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_wlen,
             frac_alpha, CAST(n_stop AS BIGINT) AS n_stop, reasons,
             reasons = 0 AS keep
      FROM r ORDER BY doc_id"""

  // ---- t19: corpus token-budget report ----
  // The planning number every training run starts from: tokens per
  // source, raw vs what survives exact dedup — i.e. how much of each
  // source's volume is real and how much is re-crawl. One narrow token
  // count per row, one hash-keyed min per normalized text (d01's
  // keeper rule), one partial-agg rollup over the metadata-sized source
  // dimension; conditional sum avoids a second pass for the kept lane.
  val t19_token_budget: Q = (s, d) => {
    val normExpr = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"),
        md5(expr(normExpr)).as("h"))
    val keepers = toks.groupBy("h").agg(min("doc_id").as("keeper"))
    toks.join(keepers, "h")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("toks").as("raw_tokens"),
        sum(when(col("doc_id") === col("keeper"), col("toks"))
          .otherwise(lit(0L))).as("deduped_tokens"))
      .orderBy("source")
  }
  val t19Sql: String =
    """WITH t AS (SELECT doc_id, source,
            CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks,
            md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h
          FROM documents),
      k AS (SELECT h, min(doc_id) AS keeper FROM t GROUP BY h)
      SELECT source, COUNT(*) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS raw_tokens,
             CAST(sum(CASE WHEN doc_id = keeper THEN toks ELSE 0 END) AS BIGINT)
               AS deduped_tokens
      FROM t JOIN k USING (h)
      GROUP BY source ORDER BY source"""

  val queries: Map[String, Q] = Map(
    "t18_gopher_filter" -> t18_gopher_filter,
    "t19_token_budget"  -> t19_token_budget,
  )
  val oracles: Map[String, String] = Map(
    "t18_gopher_filter" -> t18Sql,
    "t19_token_budget"  -> t19Sql,
  )
}
