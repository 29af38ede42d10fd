package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Stable, Tables}

/** Text analysis, part 10: readability. */
object TextAnalysis10 {
  type Q = (SparkSession, String) => DataFrame

  // ---- t35: readability scoring (Flesch reading ease, per source) ----
  // The classic quality-filter feature t02 does NOT cover: t02 scores
  // surface hygiene (length / punctuation / stopword ratios), while
  // readability scores sentence and word COMPLEXITY — the signal used
  // to route corpora into easy/standard/difficult strata for curriculum
  // mixes (p07) and to catch OCR sludge whose character mix looks fine
  // but whose "sentences" never end. Flesch reading ease
  // (206.835 − 1.015·words/sentence − 84.6·syllables/word, Flesch 1948)
  // with the standard heuristic syllable proxy: maximal vowel-group
  // runs ([aeiouy]+) per word — the same proxy every production
  // readability library ships, and the only one computable without a
  // dictionary.
  //
  // Engine shape: ONE narrow map computes the three per-doc counts
  // (split size + two global regexp_replace length deltas — all
  // codegen'd builtins, no UDF), then ONE source-keyed combinable
  // aggregate. Counting trick: replacing each vowel run with a single
  // marker changes the length by (runs − run_chars), deleting runs
  // changes it by (− run_chars); the difference of the two lengths is
  // EXACTLY the run count, independent of what characters the text
  // already contains. Nothing here shuffles more than the per-source
  // report frame at any corpus size.
  //
  // Cross-engine exactness: the three counts are exact integers (both
  // engines run the same regex semantics on the same stored text;
  // DuckDB's regexp_replace needs the 'g' flag to match Spark's
  // global-replace default — stated in the oracle); per-doc ratios and
  // the Flesch formula are fixed-parenthesization IEEE ops on those
  // exact ints (band cuts compare bit-identical doubles); per-source
  // means ride exact integer sums (ratios) and Stable's decimal sum
  // (flesch), one final IEEE division each, rounded 1e-9.
  val t35_readability: Q = (s, d) => {
    val per = Tables.documents(s, d).select(
      col("source"),
      greatest(size(split(col("text"), " ")), lit(1)).cast("long").as("nw"),
      greatest(length(col("text"))
        - length(regexp_replace(col("text"), "[.!?]", "")), lit(1L)).as("ns"),
      greatest(length(regexp_replace(lower(col("text")), "[aeiouy]+", "#"))
        - length(regexp_replace(lower(col("text")), "[aeiouy]+", "")),
        lit(1L)).as("nsy"))
      .withColumn("flesch",
        lit(206.835)
          - lit(1.015) * (col("nw").cast("double") / col("ns").cast("double"))
          - lit(84.6) * (col("nsy").cast("double") / col("nw").cast("double")))
    per.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      round(sum("nw").cast("double") / sum("ns").cast("double"), 9)
        .as("words_per_sentence"),
      round(sum("nsy").cast("double") / sum("nw").cast("double"), 9)
        .as("syllables_per_word"),
      round(Stable.davg(col("flesch")), 9).as("mean_flesch"),
      count(when(col("flesch") >= 70.0, 1)).as("n_easy"),
      count(when(col("flesch") >= 30.0 && col("flesch") < 70.0, 1))
        .as("n_standard"),
      count(when(col("flesch") < 30.0, 1)).as("n_hard"))
      .orderBy("source")
  }
  val t35Sql: String = {
    val flesch =
      """CAST(206.835 AS DOUBLE)
         - CAST(1.015 AS DOUBLE) * (CAST(nw AS DOUBLE) / CAST(ns AS DOUBLE))
         - CAST(84.6 AS DOUBLE) * (CAST(nsy AS DOUBLE) / CAST(nw AS DOUBLE))"""
    s"""WITH per AS (
        SELECT source,
          GREATEST(CAST(len(string_split(text, ' ')) AS BIGINT), 1) AS nw,
          GREATEST(length(text)
            - length(regexp_replace(text, '[.!?]', '', 'g')), 1) AS ns,
          GREATEST(length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
            - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')), 1) AS nsy
        FROM documents),
      f AS (SELECT source, nw, ns, nsy, $flesch AS flesch FROM per)
      SELECT source, COUNT(*) AS n_docs,
        round(CAST(SUM(nw) AS DOUBLE) / CAST(SUM(ns) AS DOUBLE), 9)
          AS words_per_sentence,
        round(CAST(SUM(nsy) AS DOUBLE) / CAST(SUM(nw) AS DOUBLE), 9)
          AS syllables_per_word,
        round(${Stable.sqlAvg("flesch")}, 9) AS mean_flesch,
        COUNT(CASE WHEN flesch >= 70.0 THEN 1 END) AS n_easy,
        COUNT(CASE WHEN flesch >= 30.0 AND flesch < 70.0 THEN 1 END)
          AS n_standard,
        COUNT(CASE WHEN flesch < 30.0 THEN 1 END) AS n_hard
      FROM f GROUP BY source ORDER BY source"""
  }

  val queries: Map[String, Q] = Map(
    "t35_readability" -> t35_readability,
  )
  val oracles: Map[String, String] = Map(
    "t35_readability" -> t35Sql,
  )
}
