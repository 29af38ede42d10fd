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

  // ---- t36: word burstiness / dispersion census ----
  // The corpus statistic between frequency (t05's tf-idf inputs) and
  // rank-shape (t16's Zipf fit): HOW a word's occurrences distribute
  // across documents. Church & Gale's burstiness (cf/df — mean
  // occurrences per document that contains the word) and the index of
  // dispersion (variance-to-mean of per-doc counts over containing
  // docs) separate topical words (bursty: absent mostly, clumped where
  // present) from function words (evenly spread) with no model at all —
  // the signal behind keyword extraction, stopword induction, and
  // "is this token a template artifact?" triage.
  //
  // Engine shape: tokenize once, (word, doc)-keyed combinable count,
  // then a word-keyed combinable rollup of EXACT integer moments
  // (cf = Σc, df = n, Σc²); both aggregates map-side combine, nothing
  // wider than the vocabulary ever shuffles, and the top-25 rides
  // TakeOrderedAndProject on (cf DESC, word) — a total order. Words
  // under df ≥ 5 are dropped (a dispersion estimate over <5 docs is
  // noise — stated, not hidden).
  //
  // Exactness: every moment is an exact BIGINT; burstiness, dispersion
  // ((Σc² − cf²/df)/(df−1) ÷ mean), and doc-share are IEEE ops on
  // those integers, rounded 1e-9 (non-terminating quotients — safe).
  val t36_burstiness: Q = (s, d) => {
    val wd = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("w", "doc_id").agg(count(lit(1)).as("c"))
    val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    wd.groupBy("w").agg(
      count(lit(1)).as("df"),
      sum("c").as("cf"),
      sum(col("c") * col("c")).as("c2"))
      .filter(col("df") >= 5)
      .crossJoin(broadcast(nDocs))
      .select(col("w"), col("df"), col("cf"),
        round(col("cf").cast("double") / col("df").cast("double"), 9)
          .as("burstiness"),
        round((col("c2").cast("double")
            - col("cf").cast("double") * col("cf").cast("double")
              / col("df").cast("double"))
          / (col("df").cast("double") - lit(1.0))
          / (col("cf").cast("double") / col("df").cast("double")), 9)
          .as("dispersion"),
        round(col("df").cast("double") / col("n_docs").cast("double"), 9)
          .as("doc_share"))
      .orderBy(desc("cf"), col("w"))
      .limit(25)
  }
  val t36Sql: String =
    """WITH wd AS (SELECT w, doc_id, COUNT(*) AS c FROM (
               SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents) t GROUP BY 1, 2),
      nd AS (SELECT COUNT(*) AS n_docs FROM documents),
      m AS (SELECT w, COUNT(*) AS df, SUM(c) AS cf, SUM(c * c) AS c2
            FROM wd GROUP BY 1 HAVING COUNT(*) >= 5)
      SELECT w, df, CAST(cf AS BIGINT) AS cf,
        round(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE), 9) AS burstiness,
        round((CAST(c2 AS DOUBLE)
            - CAST(cf AS DOUBLE) * CAST(cf AS DOUBLE) / CAST(df AS DOUBLE))
          / (CAST(df AS DOUBLE) - CAST(1.0 AS DOUBLE))
          / (CAST(cf AS DOUBLE) / CAST(df AS DOUBLE)), 9) AS dispersion,
        round(CAST(df AS DOUBLE) / CAST(n_docs AS DOUBLE), 9) AS doc_share
      FROM m, nd ORDER BY cf DESC, w LIMIT 25"""

  // ---- t37: length forensics (lognormal profile + truncation spike) ----
  // Document LENGTH distributions are the cheapest corpus forensic and
  // the most commonly faked: organic text is ~lognormal in length,
  // while pipeline damage leaves signatures no mean/min/max (v05)
  // shows — a TRUNCATION CAP puts a mass spike exactly at the maximum
  // (the "every doc is 4096 chars" bug), over-aggressive cleaning
  // hollows the short tail. Per source: log₁₀-length moments (the
  // lognormal fit), the max, and the at-max spike count — a spike
  // share ≫ 1/n is the truncation tripwire.
  //
  // Engine shape: ONE narrow map (log of a stored int), one combinable
  // per-source moment aggregate + one source-keyed max join-back for
  // the spike count — two fact passes over a 2-column projection,
  // nothing wider than the source rollup shuffles. Exactness: per-row
  // log10 is a single libm call on identical inputs ROUNDED 1e-9
  // before the decimal moments (t32's log discipline — engine libm
  // ulps pinned); spike counts are exact integer comparisons; sd via
  // decimal moments, one sqrt.
  val t37_length_forensics: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables.documents(s, d)
      .select(col("source"), col("n_chars"))
      .withColumn("lg", round(log10(col("n_chars").cast("double")), 9))
    val mx = docs.groupBy("source").agg(max("n_chars").as("max_chars"))
    docs.join(broadcast(mx), "source")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("lg").cast(DecimalType(30, 9))).cast("double").as("s1"),
        sum((col("lg") * col("lg")).cast(DecimalType(30, 9)))
          .cast("double").as("s2"),
        max("max_chars").as("max_chars"),
        count(when(col("n_chars") === col("max_chars"), 1)).as("n_at_max"))
      .select(col("source"), col("n_docs"),
        round(col("s1") / col("n_docs"), 9).as("mean_log10_len"),
        round(sqrt((col("s2") - col("s1") * col("s1") / col("n_docs"))
          / (col("n_docs") - 1)), 9).as("sd_log10_len"),
        col("max_chars"), col("n_at_max"),
        round(col("n_at_max").cast("double") / col("n_docs").cast("double"), 9)
          .as("share_at_max"))
      .orderBy("source")
  }
  val t37Sql: String =
    """WITH d0 AS (SELECT source, n_chars,
               round(log10(CAST(n_chars AS DOUBLE)), 9) AS lg
             FROM documents),
      mx AS (SELECT source, MAX(n_chars) AS max_chars FROM d0 GROUP BY 1),
      m AS (SELECT d0.source AS source, COUNT(*) AS n_docs,
              CAST(SUM(CAST(lg AS DECIMAL(30,9))) AS DOUBLE) AS s1,
              CAST(SUM(CAST(lg * lg AS DECIMAL(30,9))) AS DOUBLE) AS s2,
              MAX(mx.max_chars) AS max_chars,
              COUNT(CASE WHEN n_chars = mx.max_chars THEN 1 END) AS n_at_max
            FROM d0 JOIN mx ON d0.source = mx.source GROUP BY 1)
      SELECT source, n_docs,
        round(s1 / n_docs, 9) AS mean_log10_len,
        round(sqrt((s2 - s1 * s1 / n_docs) / (n_docs - 1)), 9)
          AS sd_log10_len,
        max_chars, n_at_max,
        round(CAST(n_at_max AS DOUBLE) / CAST(n_docs AS DOUBLE), 9)
          AS share_at_max
      FROM m ORDER BY source"""

  // ---- t38: code-vs-prose detection (the code-filtering gate) ----
  // LLM corpora route code and prose to different pipelines (different
  // dedup thresholds, different quality rules, different tokenizers);
  // the router needs a cheap, exact, attributable signal — not a model.
  // Three rule families per doc, all single-pass narrow ops: symbol
  // density (share of {}();=<>[] characters — the most discriminative
  // single feature in public code-detection heuristics), code keyword
  // hits (def/class/return/import/function/var/const as standalone
  // words), and digit density (tables/logs). A doc is code_like when
  // symbols clear 2% or >= 2 distinct keyword families hit. Counting is
  // subtraction-of-lengths after regexp_replace (identical Java/DuckDB
  // semantics for these literal character classes; DuckDB needs the
  // explicit 'g' flag Java implies); the per-source rollup is exact
  // integers + one rounded division. On this synthetic prose corpus
  // most rows score zero — the oracle pins the SEMANTICS, the spec pins
  // the rules on a hand-built code/prose fixture.
  val t38_code_detect: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .withColumn("n", length(col("text")).cast("long"))
      .withColumn("n_sym", (length(col("text")) - length(
        regexp_replace(col("text"), "[{}();=<>\\[\\]]", ""))).cast("long"))
      .withColumn("n_dig", (length(col("text")) - length(
        regexp_replace(col("text"), "[0-9]", ""))).cast("long"))
      .withColumn("kw_hits",
        (when(col("text").rlike("\\b(def|class)\\b"), 1).otherwise(0)
          + when(col("text").rlike("\\b(return|import)\\b"), 1).otherwise(0)
          + when(col("text").rlike("\\b(function|var|const)\\b"), 1)
            .otherwise(0)).cast("long"))
      .withColumn("code_like",
        col("n_sym").cast("double") > col("n").cast("double") * 0.02
          || col("kw_hits") >= 2)
    base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("code_like"), 1)).as("n_code_like"),
        sum("n_sym").as("sym_chars"),
        sum("n_dig").as("digit_chars"),
        sum("n").as("total_chars"))
      .withColumn("code_share", round(
        col("n_code_like").cast("double") / col("n_docs").cast("double"), 9))
      .withColumn("sym_density", round(
        col("sym_chars").cast("double") / col("total_chars").cast("double"), 9))
      .orderBy("source")
  }
  val t38Sql: String =
    """WITH b AS (SELECT source,
               length(text) AS n,
               length(text) - length(regexp_replace(text,
                 '[{}();=<>\[\]]', '', 'g')) AS n_sym,
               length(text) - length(regexp_replace(text,
                 '[0-9]', '', 'g')) AS n_dig,
               (CASE WHEN regexp_matches(text, '\b(def|class)\b')
                     THEN 1 ELSE 0 END
                + CASE WHEN regexp_matches(text, '\b(return|import)\b')
                       THEN 1 ELSE 0 END
                + CASE WHEN regexp_matches(text, '\b(function|var|const)\b')
                       THEN 1 ELSE 0 END) AS kw_hits
             FROM documents),
      f AS (SELECT *, (CAST(n_sym AS DOUBLE) > CAST(n AS DOUBLE) * 0.02
                       OR kw_hits >= 2) AS code_like FROM b)
      SELECT source, COUNT(*) AS n_docs,
        COUNT(CASE WHEN code_like THEN 1 END) AS n_code_like,
        CAST(SUM(n_sym) AS BIGINT) AS sym_chars,
        CAST(SUM(n_dig) AS BIGINT) AS digit_chars,
        CAST(SUM(n) AS BIGINT) AS total_chars,
        round(CAST(COUNT(CASE WHEN code_like THEN 1 END) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE), 9) AS code_share,
        round(CAST(SUM(n_sym) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 9)
          AS sym_density
      FROM f GROUP BY source ORDER BY source"""

  // ---- t39: marginal vocabulary yield per source ----
  // The data-acquisition question t20 (coverage vs a reference vocab)
  // and t17 (temporal novelty) don't answer: with sources ingested in a
  // FIXED order, how many vocabulary types does each source add that no
  // earlier source already contributed? The diminishing-returns curve —
  // new types per 1k tokens scanned — is the marginal-utility table a
  // corpus buyer reads before paying for another crawl of the same
  // distribution. Deterministic first-owner attribution: a type belongs
  // to its alphabetically-first source (MIN over the distinct
  // source×type pairs — order-free, engine-neutral), so the cumulative
  // curve is exactly the fixed-order greedy scan. Scale shape: the
  // explode collapses map-side into (source, token) distincts, the only
  // shuffles are vocab-sized (token-keyed), never corpus-sized; the
  // final frame is |sources| rows, cumulated under boundedSingleGroup.
  val t39_vocab_yield: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val firstSrc = toks.select("source", "tok").distinct()
      .groupBy("tok").agg(min("source").as("source"))
    val newBySrc = firstSrc.groupBy("source")
      .agg(count(lit(1)).as("new_types"))
    val srcStats = toks.groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        count_distinct(col("tok")).as("n_types"))
    val joined = srcStats.join(newBySrc, Seq("source"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
    val b = graft.api.GraftOps.boundedSingleGroup(joined)
    val w = Window.partitionBy("__g").orderBy("source")
    b.withColumn("cum_new_types",
        sum("new_types").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("yield_per_1k",
        round(col("new_types").cast("double") * 1000.0
          / col("n_tokens").cast("double"), 9))
      .select("source", "n_tokens", "n_types", "new_types",
        "cum_new_types", "yield_per_1k")
      .orderBy("source")
  }
  val t39Sql: String =
    """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                   FROM documents),
      t2 AS (SELECT source, tok FROM toks WHERE len(tok) > 0),
      fs AS (SELECT tok, MIN(source) AS source
             FROM (SELECT DISTINCT source, tok FROM t2) GROUP BY 1),
      nb AS (SELECT source, COUNT(*) AS new_types FROM fs GROUP BY 1),
      ss AS (SELECT source, COUNT(*) AS n_tokens,
               COUNT(DISTINCT tok) AS n_types
             FROM t2 GROUP BY 1)
      SELECT ss.source, n_tokens, n_types,
        CAST(COALESCE(new_types, 0) AS BIGINT) AS new_types,
        CAST(SUM(COALESCE(new_types, 0)) OVER (ORDER BY ss.source
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_new_types,
        round(CAST(COALESCE(new_types, 0) AS DOUBLE) * 1000.0
              / CAST(n_tokens AS DOUBLE), 9) AS yield_per_1k
      FROM ss LEFT JOIN nb USING (source) ORDER BY source"""

  // ---- t40: tokenizer fertility by language ----
  // The "which tokenizer" budget table: FERTILITY (subword tokens per
  // whitespace word) is the number that decides how many training
  // tokens a corpus actually yields per language — a tokenizer with 2×
  // fertility on one language halves that language's effective context
  // and doubles its compute share. t03 counts tokens per DOCUMENT;
  // this rolls the same two exact token definitions (whitespace split
  // vs the BPE-ish word/punct regex, t03's) to the per-LANGUAGE table:
  // fertility, chars/token, and each language's share of corpus
  // tokens. All counts exact integers in one combinable pass; the
  // three ratios are single IEEE divisions rounded 1e-9.
  val t40_tokenizer_fertility: Q = (s, d) => {
    val per = Tables.documents(s, d).select(col("lang"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("ws"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("re"),
      length(col("text")).cast("long").as("ch"))
    val tot = per.agg(sum("re").as("tot_re"))
    per.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("ws").as("ws_tokens"),
        sum("re").as("re_tokens"), sum("ch").as("chars"))
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("ws_tokens"),
        col("re_tokens"),
        round(col("re_tokens").cast("double")
          / col("ws_tokens").cast("double"), 9).as("fertility"),
        round(col("chars").cast("double")
          / col("re_tokens").cast("double"), 9).as("chars_per_token"),
        round(col("re_tokens").cast("double")
          / col("tot_re").cast("double"), 9).as("token_share"))
      .orderBy("lang")
  }
  val t40Sql: String =
    """WITH per AS (SELECT lang,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS ws,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS re,
               CAST(length(text) AS BIGINT) AS ch
             FROM documents),
      tot AS (SELECT CAST(SUM(re) AS BIGINT) AS tot_re FROM per)
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(ws) AS BIGINT) AS ws_tokens,
        CAST(SUM(re) AS BIGINT) AS re_tokens,
        round(CAST(SUM(re) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE), 9)
          AS fertility,
        round(CAST(SUM(ch) AS DOUBLE) / CAST(SUM(re) AS DOUBLE), 9)
          AS chars_per_token,
        round(CAST(SUM(re) AS DOUBLE) / CAST(tot_re AS DOUBLE), 9)
          AS token_share
      FROM per CROSS JOIN tot GROUP BY lang, tot_re ORDER BY lang"""

  val queries: Map[String, Q] = Map(
    "t35_readability" -> t35_readability,
    "t36_burstiness"  -> t36_burstiness,
    "t37_length_forensics" -> t37_length_forensics,
    "t38_code_detect" -> t38_code_detect,
    "t39_vocab_yield" -> t39_vocab_yield,
    "t40_tokenizer_fertility" -> t40_tokenizer_fertility,
  )
  val oracles: Map[String, String] = Map(
    "t35_readability" -> t35Sql,
    "t36_burstiness"  -> t36Sql,
    "t37_length_forensics" -> t37Sql,
    "t38_code_detect" -> t38Sql,
    "t39_vocab_yield" -> t39Sql,
    "t40_tokenizer_fertility" -> t40Sql,
  )
}
