package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.GraftOps

/** Round 6: the REAL subword tokenizer — trained BPE (Sennrich et al.
  * 2016) replacing the "BPE-ish regex" approximation for token-budget
  * arithmetic. Training is vocab-bounded (the word-frequency table is
  * the only thing the merge loop touches — the 100 TB property), and
  * encoding folds the broadcast merges table over each DISTINCT word
  * in-row (no UDF; one literal string replace per merge). The DuckDB
  * oracles replay ENCODING exactly from the dumped merges table
  * (/tmp/graft_aux/bpe_merges, the d02 signature-dump recipe) via a
  * recursive CTE — one rank per recursion step, the same two-space
  * symbol representation, the same literal replace. Training itself is
  * deterministic (ties break count DESC, l, r — partition-independent,
  * BpeSpec) so the dump and the query's in-query training agree.
  */
object TextAnalysis11 {
  type Q = (SparkSession, String) => DataFrame

  /** Shared training params: the dump in Verify.scala MUST match. */
  val NumMerges = 32
  val VocabCap = 20000

  private def merges(s: SparkSession, d: String): DataFrame =
    // materialized-artifact route: a cleaning run trains the merges once
    // (DedupArtifactStore.buildFor); token-budget queries read the table.
    // Training is deterministic, so the artifact equals inline training.
    graft.api.DedupArtifactStore.readMerges(s, d, NumMerges, VocabCap)
      .getOrElse(GraftOps.bpeTrain(Tables.documents(s, d), col("text"),
        numMerges = NumMerges, vocabCap = VocabCap))

  // ---- t41: per-document real-token accounting ----
  // The number every budget operator wants: actual trained-subword
  // tokens per document (with fertility = tokens/word). Engine shape:
  // one corpus pass for word counts, encode the DISTINCT-word table
  // once, join counts back — token arithmetic never re-encodes repeated
  // words.
  val t41_bpe_encode: Q = (s, d) => {
    GraftOps.bpeTokenCounts(Tables.documents(s, d), col("doc_id"),
        col("text"), merges(s, d))
      .withColumnRenamed("id", "doc_id")
      .withColumn("fertility",
        round(col("n_tokens").cast("double") / col("n_words"), 9))
      .orderBy("doc_id")
  }
  private val encCte: String =
    """m AS (SELECT rank, l, r
           FROM read_parquet('/tmp/graft_aux/bpe_merges/*.parquet')),
      w0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             FROM documents),
      w AS (SELECT doc_id, w FROM w0 WHERE w <> ''),
      vocab AS (SELECT DISTINCT w FROM w),
      init AS (SELECT w,
                 ' ' || array_to_string(regexp_split_to_array(w, ''), '  ')
                     || '  </w> ' AS s
               FROM vocab),
      e(w, s, rank) AS (
        SELECT w, s, 1 FROM init
        UNION ALL
        SELECT e.w,
               replace(e.s, ' '||m.l||'  '||m.r||' ', ' '||m.l||m.r||' '),
               e.rank + 1
        FROM e JOIN m ON m.rank = e.rank),
      enc AS (SELECT w, s FROM e
              WHERE rank = (SELECT coalesce(max(rank), 0) + 1 FROM m)),
      toks AS (SELECT w,
                 CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS nt
               FROM enc)"""
  val t41Sql: String =
    s"""WITH RECURSIVE $encCte
      SELECT doc_id, count(*) AS n_words,
             CAST(sum(nt) AS BIGINT) AS n_tokens,
             round(CAST(sum(nt) AS DOUBLE) / count(*), 9) AS fertility
      FROM w JOIN toks USING (w)
      GROUP BY doc_id ORDER BY doc_id"""

  // ---- t42: per-language fertility through the REAL tokenizer ----
  // t40's budget table rebuilt on trained subwords: languages whose
  // fertility runs high consume proportionally more of a fixed token
  // budget per word of content — the compute-share number a mixture
  // planner actually needs. token_share rides a broadcast scalar (no
  // unpartitioned window).
  val t42_bpe_fertility: Q = (s, d) => {
    val perDoc = GraftOps.bpeTokenCounts(Tables.documents(s, d),
      col("doc_id"), col("text"), merges(s, d))
    val byLang = perDoc
      .join(Tables.documents(s, d).select(col("doc_id").as("id"), col("lang")),
        "id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"),
        sum("n_tokens").as("n_tokens"))
    val total = byLang.agg(sum("n_tokens").as("__total"))
    byLang.crossJoin(broadcast(total))
      .withColumn("fertility",
        round(col("n_tokens").cast("double") / col("n_words"), 9))
      .withColumn("token_share",
        round(col("n_tokens").cast("double") / col("__total"), 9))
      .select("lang", "n_docs", "n_words", "n_tokens", "fertility",
        "token_share")
      .orderBy("lang")
  }
  val t42Sql: String =
    s"""WITH RECURSIVE $encCte,
      perdoc AS (SELECT doc_id, count(*) AS n_words,
                   CAST(sum(nt) AS BIGINT) AS n_tokens
                 FROM w JOIN toks USING (w) GROUP BY doc_id),
      bylang AS (SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_words) AS BIGINT) AS n_words,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens
                 FROM perdoc JOIN documents USING (doc_id) GROUP BY lang)
      SELECT lang, n_docs, n_words, n_tokens,
             round(CAST(n_tokens AS DOUBLE) / n_words, 9) AS fertility,
             round(CAST(n_tokens AS DOUBLE)
               / (SELECT sum(n_tokens) FROM bylang), 9) AS token_share
      FROM bylang ORDER BY lang"""

  // ---- t43: dedup-aware token yield per source ----
  // THE number a corpus buyer actually pays for: trained-subword tokens
  // that SURVIVE deduplication, per source — raw token counts overstate
  // a crawl's value by exactly its duplication factor, and the overstate
  // ratio differs per source. Composition of two cleaning-run artifacts:
  // the d15 disposition manifest (kept / exact_dup / near_dup) and the
  // BPE token accounting — in a routed session (graft.dedup.artifacts)
  // both are READS; inline they compute exactly once each. Oracle: one
  // DuckDB query composing the manifest replay with the recursive-CTE
  // encode over the dumped merges.
  val t43_dedup_token_yield: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val toks = GraftOps.bpeTokenCounts(docs, col("doc_id"), col("text"),
        merges(s, d))
      .select(col("id").as("doc_id"), col("n_tokens"))
    val kept = Dedup3.d15_dedup_manifest(s, d)
      .filter(col("status") === "kept")
      .select(col("doc_id"), lit(true).as("__kept"))
    docs.select("doc_id", "source")
      .join(toks, "doc_id")
      .join(kept, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("tokens_total"),
        sum(when(col("__kept"), col("n_tokens")).otherwise(0L))
          .as("tokens_kept"))
      .withColumn("token_yield",
        round(col("tokens_kept").cast("double") / col("tokens_total"), 9))
      .orderBy("source")
  }
  val t43Sql: String =
    s"""WITH RECURSIVE $encCte,
      perdoc AS (SELECT doc_id, CAST(sum(nt) AS BIGINT) AS n_tokens
                 FROM w JOIN toks USING (w) GROUP BY doc_id),
      mh AS (SELECT doc_id, text,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h
             FROM documents),
      mk AS (SELECT h, min(doc_id) AS ref FROM mh GROUP BY h),
      mwr AS (SELECT mh.doc_id, mh.text, mk.ref FROM mh JOIN mk USING (h)),
      msv AS (SELECT doc_id, text FROM mwr WHERE doc_id = ref),
      mw AS (SELECT doc_id, generate_subscripts(string_split(text,' '),1) i,
                  unnest(string_split(text,' ')) w FROM msv),
      mg AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS sh
             FROM mw a JOIN mw b ON a.doc_id=b.doc_id AND b.i=a.i+1
                      JOIN mw c ON c.doc_id=a.doc_id AND c.i=a.i+2),
      mdd AS (SELECT DISTINCT doc_id, sh FROM mg),
      msizes AS (SELECT doc_id, count(*) n FROM mdd GROUP BY doc_id),
      mpairs AS (SELECT x.doc_id da, y.doc_id db, count(*) shared
                 FROM mdd x JOIN mdd y ON x.sh=y.sh AND x.doc_id<y.doc_id
                 GROUP BY 1, 2),
      mvp AS (SELECT da, db FROM mpairs JOIN msizes sa ON da=sa.doc_id
                                        JOIN msizes sb ON db=sb.doc_id
              WHERE CAST(shared AS DOUBLE)/(sa.n+sb.n-shared) >= 0.5),
      mdoomed AS (SELECT DISTINCT db AS doc_id FROM mvp),
      kept AS (SELECT doc_id FROM msv
               WHERE doc_id NOT IN (SELECT doc_id FROM mdoomed))
      SELECT d.source, count(*) AS n_docs,
        CAST(sum(p.n_tokens) AS BIGINT) AS tokens_total,
        CAST(sum(CASE WHEN k.doc_id IS NOT NULL THEN p.n_tokens
                      ELSE 0 END) AS BIGINT) AS tokens_kept,
        round(CAST(sum(CASE WHEN k.doc_id IS NOT NULL THEN p.n_tokens
                            ELSE 0 END) AS DOUBLE)
              / sum(p.n_tokens), 9) AS token_yield
      FROM documents d JOIN perdoc p USING (doc_id)
        LEFT JOIN kept k USING (doc_id)
      GROUP BY d.source ORDER BY d.source"""

  // ---- t44: character-class / script-mixing census ----
  // The encoding-hygiene signal between t26 (mojibake markers) and t38
  // (code detection): what a document's bytes actually ARE — per source,
  // exact character-class totals (alpha / digit / space / common punct /
  // OTHER) and the share of documents whose "other" mass exceeds 5% —
  // the simplest robust tripwire for binary-in-text, wrong-charset
  // scrapes, and emoji/markup-dominated spam, ahead of any model-based
  // filter. One narrow pass of length-after-regexp_replace class counts
  // (Java/DuckDB-identical character classes, the t38 technique), exact
  // integer rollups per source, one IEEE division per published ratio
  // at 1e-9 — never a mean-of-doubles.
  val t44_script_census: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .withColumn("n", length(col("text")).cast("long"))
      .withColumn("n_alpha", (length(col("text")) - length(
        regexp_replace(col("text"), "[A-Za-z]", ""))).cast("long"))
      .withColumn("n_digit", (length(col("text")) - length(
        regexp_replace(col("text"), "[0-9]", ""))).cast("long"))
      .withColumn("n_space", (length(col("text")) - length(
        regexp_replace(col("text"), "[ ]", ""))).cast("long"))
      .withColumn("n_punct", (length(col("text")) - length(
        regexp_replace(col("text"), "[.,;:!?'\"()-]", ""))).cast("long"))
      .withColumn("n_other",
        col("n") - col("n_alpha") - col("n_digit") - col("n_space")
          - col("n_punct"))
      .withColumn("mixed",
        col("n_other").cast("double") > col("n").cast("double") * 0.05)
    base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n").as("total_chars"),
        sum("n_alpha").as("alpha_chars"),
        sum("n_digit").as("digit_chars"),
        sum("n_other").as("other_chars"),
        count(when(col("mixed"), 1)).as("n_mixed"))
      .withColumn("alpha_density", round(
        col("alpha_chars").cast("double") / col("total_chars"), 9))
      .withColumn("other_density", round(
        col("other_chars").cast("double") / col("total_chars"), 9))
      .withColumn("mixed_share", round(
        col("n_mixed").cast("double") / col("n_docs"), 9))
      .orderBy("source")
  }
  val t44Sql: String =
    """WITH b AS (
        SELECT source,
          CAST(length(text) AS BIGINT) AS n,
          CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
            AS BIGINT) AS n_alpha,
          CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
            AS BIGINT) AS n_digit,
          CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g'))
            AS BIGINT) AS n_space,
          CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g'))
            AS BIGINT) AS n_punct
        FROM documents),
      c AS (SELECT source, n, n_alpha, n_digit,
              n - n_alpha - n_digit - n_space - n_punct AS n_other
            FROM b),
      g AS (SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(n) AS BIGINT) AS total_chars,
              CAST(SUM(n_alpha) AS BIGINT) AS alpha_chars,
              CAST(SUM(n_digit) AS BIGINT) AS digit_chars,
              CAST(SUM(n_other) AS BIGINT) AS other_chars,
              COUNT(*) FILTER (WHERE CAST(n_other AS DOUBLE)
                > CAST(n AS DOUBLE) * 0.05) AS n_mixed
            FROM c GROUP BY source)
      SELECT source, n_docs, total_chars, alpha_chars, digit_chars,
        other_chars, n_mixed,
        round(CAST(alpha_chars AS DOUBLE) / total_chars, 9) AS alpha_density,
        round(CAST(other_chars AS DOUBLE) / total_chars, 9) AS other_density,
        round(CAST(n_mixed AS DOUBLE) / n_docs, 9) AS mixed_share
      FROM g ORDER BY source"""

  // ---- t45: per-source unigram KL divergence vs the corpus LM ----
  // The mixture-drift signal in TOKEN space (t31's stylometry works on
  // surface ratios; this measures how far each source's word
  // DISTRIBUTION sits from the blended corpus — the quantity that
  // predicts how much a mixture reweighting will shift the trained
  // model): KL(P_source ‖ P_corpus) = Σ_w p_sw · ln(p_sw / p_w) in
  // nats. Finite by construction (the corpus contains every source, so
  // q > 0 wherever p > 0). Exact integer counts feed one fixed-order
  // IEEE expression per (source, word) — p and q are single divisions
  // of BIGINTs, ln on bit-identical doubles (the t05 precedent), the
  // per-term product rounded 1e-9 — and the per-source sum rides
  // Stable.dsum so partial-agg order can't perturb ulps. Scale shape:
  // one fact-scale (source, word) count (combinable), a vocab-scale
  // equijoin onto the corpus word counts, a broadcast 1-row total —
  // no per-doc state, no all-pairs anything.
  val t45_unigram_kl: Q = (s, d) => {
    val words = Tables.documents(s, d)
      .select(col("source"),
        explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
    val sw = words.groupBy("source", "word").agg(count(lit(1)).as("c_sw"))
    // corpus counts derive from sw (no second fact pass; identical
    // subplan → ReuseExchange computes the shuffle once)
    val cw = sw.groupBy("word").agg(sum("c_sw").as("c_w"))
    val ns = sw.groupBy("source").agg(sum("c_sw").as("n_s"),
      count(lit(1)).as("vocab"))
    val n = cw.agg(sum("c_w").as("n_total"))
    sw.join(cw, "word").join(ns, "source").join(broadcast(n))
      .withColumn("term", round(
        (col("c_sw").cast("double") / col("n_s").cast("double"))
          * log((col("c_sw").cast("double") * col("n_total").cast("double"))
            / (col("c_w").cast("double") * col("n_s").cast("double"))), 9))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"), max("vocab").as("vocab"),
        round(graft.Stable.dsum(col("term")), 6).as("kl_nats"))
      .orderBy("source")
  }
  val t45Sql: String =
    s"""WITH words AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS word
        FROM documents),
      w AS (SELECT * FROM words WHERE word <> ''),
      sw AS (SELECT source, word, COUNT(*) AS c_sw FROM w GROUP BY 1, 2),
      cw AS (SELECT word, CAST(SUM(c_sw) AS BIGINT) AS c_w
             FROM sw GROUP BY 1),
      ns AS (SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_s,
               COUNT(*) AS vocab FROM sw GROUP BY 1),
      n AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n_total FROM cw),
      t AS (SELECT sw.source, n_s, vocab,
              round((CAST(c_sw AS DOUBLE) / CAST(n_s AS DOUBLE))
                * ln((CAST(c_sw AS DOUBLE) * CAST(n_total AS DOUBLE))
                  / (CAST(c_w AS DOUBLE) * CAST(n_s AS DOUBLE))), 9)
                AS term
            FROM sw JOIN cw USING (word) JOIN ns USING (source)
            CROSS JOIN n)
      SELECT source,
        CAST(MAX(n_s) AS BIGINT) AS n_tokens,
        CAST(MAX(vocab) AS BIGINT) AS vocab,
        round(${graft.Stable.sqlSum("term")}, 6) AS kl_nats
      FROM t GROUP BY source ORDER BY source"""

  val queries: Map[String, Q] = Map(
    "t41_bpe_encode"    -> t41_bpe_encode,
    "t42_bpe_fertility" -> t42_bpe_fertility,
    "t43_dedup_token_yield" -> t43_dedup_token_yield,
    "t44_script_census" -> t44_script_census,
    "t45_unigram_kl"    -> t45_unigram_kl)

  val oracles: Map[String, String] = Map(
    "t41_bpe_encode"    -> t41Sql,
    "t42_bpe_fertility" -> t42Sql,
    "t43_dedup_token_yield" -> t43Sql,
    "t44_script_census" -> t44Sql,
    "t45_unigram_kl"    -> t45Sql)
}
