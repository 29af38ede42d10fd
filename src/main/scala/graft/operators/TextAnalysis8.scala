package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text analysis, part 8: model-based quality filtering and training-
  * sequence packing — the two steps between "cleaned corpus" and
  * "batches the trainer reads".
  */
object TextAnalysis8 {
  type Q = (SparkSession, String) => DataFrame

  // ---- t21: hashed-feature linear quality classifier ----
  // The fastText-shaped model-based filter (CCNet / DCLM style): hash
  // every word into a D=1024 feature bucket, score the doc with a
  // linear model over bucket weights, sigmoid to a quality probability.
  // Weights here are derived deterministically from the bucket id (a
  // stand-in for trained parameters — the SHAPE is the product: feature
  // hashing, sparse dot product, per-doc normalization), so the whole
  // scorer is replicable in ANSI SQL and hash-exact against DuckDB.
  // Feature ids and weights go through md5 prefixes (the d07/q26
  // discipline — DuckDB computes identical values); the per-doc sum is
  // a DECIMAL fold, order-independent, so Spark's relational aggregation
  // and DuckDB's agree bit-for-bit; the sigmoid is one IEEE exp per doc.
  // Plan: explode -> per-(doc, bucket-weight) map -> one map-side-
  // combinable sum per doc. One shuffle on doc_id, nothing quadratic,
  // weights never leave the expression (no broadcast table needed).
  val t21_quality_classifier: Q = (s, d) => {
    val D = 1024
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_words"),
        explode(col("w")).as("word"))
      .filter(col("word") =!= "")
    val scored = docs
      .withColumn("fid",
        conv(substring(md5(col("word")), 1, 8), 16, 10).cast("long") % D)
      .withColumn("weight", round(
        conv(substring(md5(concat(lit("qw"), col("fid"))), 1, 8), 16, 10)
          .cast("double") / lit(4294967296.0) * 2.0 - 1.0, 9))
      .groupBy("doc_id", "n_words")
      .agg(sum(col("weight").cast("decimal(20,10)")).as("logit_sum"))
    // logit ships UNROUNDED: decimal→double cast and IEEE division are
    // bit-exact on both engines, while round(x, 9) is NOT safe here —
    // the exact-decimal sum divided by an integer can land exactly on a
    // .5e-9 boundary, where Spark's BigDecimal HALF_UP and DuckDB's
    // float-path round() disagree by 1 ulp (observed at sf0.1). The
    // sigmoid IS rounded: transcendental outputs carry full-entropy
    // mantissas, the standard §5 case.
    scored
      .withColumn("logit",
        col("logit_sum").cast("double") / col("n_words").cast("double"))
      .withColumn("score", round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 9))
      .withColumn("keep", col("score") >= 0.5)
      .select(col("doc_id"), col("n_words"), col("logit"),
        col("score"), col("keep"))
      .orderBy("doc_id")
  }
  val t21Sql: String =
    """WITH w AS (SELECT doc_id,
             len(string_split(lower(text), ' ')) AS n_words,
             unnest(string_split(lower(text), ' ')) AS word
           FROM documents),
      f AS (SELECT doc_id, n_words,
              ('0x' || substr(md5(word), 1, 8))::BIGINT % 1024 AS fid
            FROM w WHERE word <> ''),
      sc AS (SELECT doc_id, n_words,
               SUM(CAST(round((('0x' || substr(md5('qw' || fid), 1, 8))::BIGINT
                 / 4294967296.0) * 2.0 - 1.0, 9) AS DECIMAL(20,10))) AS logit_sum
             FROM f GROUP BY 1, 2),
      lg AS (SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
               CAST(logit_sum AS DOUBLE) / n_words AS logit FROM sc)
      SELECT doc_id, n_words, logit,
             round(1.0 / (1.0 + exp(-logit)), 9) AS score,
             (round(1.0 / (1.0 + exp(-logit)), 9) >= 0.5) AS keep
      FROM lg ORDER BY doc_id"""

  // ---- t22: greedy sequence packing into context-window bins ----
  // The batch-assembly step: concatenate documents in a deterministic
  // order and cut BUDGET-token context windows — each doc lands in the
  // bin where its first token falls (GPT-style concat-and-chunk
  // accounting at doc granularity). Scale shape: documents are first
  // hash-sharded (md5 of doc_id, 16 shards — the knob that scales with
  // the cluster; each shard packs independently, so no corpus-wide
  // sequential pass exists), then ONE shard-partitioned cumulative-sum
  // window assigns bins. Output is the packing manifest a loader reads:
  // per (shard, bin) document count, token fill, and fill fraction.
  val t22_sequence_pack: Q = (s, d) => {
    val BUDGET = 2048
    val SHARDS = 16
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("shard",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % SHARDS).cast("int"))
    val byShard = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("cum", sum("n_tokens").over(byShard))
      .withColumn("bin", ((col("cum") - col("n_tokens")) / BUDGET).cast("long"))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
      .withColumn("fill",
        round(col("bin_tokens").cast("double") / BUDGET, 9))
      .orderBy("shard", "bin")
  }
  val t22Sql: String =
    """WITH t AS (SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 16 AS INT) AS shard
           FROM documents),
      c AS (SELECT shard, doc_id, n_tokens,
              sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM t),
      b AS (SELECT shard, CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS bin,
                   n_tokens
            FROM c)
      SELECT shard, bin, COUNT(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
             round(CAST(sum(n_tokens) AS DOUBLE) / 2048, 9) AS fill
      FROM b GROUP BY 1, 2 ORDER BY shard, bin"""

  val queries: Map[String, Q] = Map(
    "t21_quality_classifier" -> t21_quality_classifier,
    "t22_sequence_pack"      -> t22_sequence_pack,
  )
  val oracles: Map[String, String] = Map(
    "t21_quality_classifier" -> t21Sql,
    "t22_sequence_pack"      -> t22Sql,
  )
}
