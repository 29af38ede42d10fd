package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text analysis, part 7: vocabulary design numbers. */
object TextAnalysis7 {
  type Q = (SparkSession, String) => DataFrame

  // ---- t20: vocabulary coverage curve ----
  // The tokenizer-design number: what fraction of all corpus tokens do
  // the top-k vocabulary words cover (k = 10/100/1000)? Token counting
  // is one map-side-combinable word rollup (the only corpus-wide
  // stage). Only the top max(k) words can contribute to any covered
  // count, so ranking goes through GraftOps.globalTopK (bounded-heap
  // prune, rank over 1000 survivors) — the full vocabulary (10⁸–10⁹
  // terms at web scale) never meets a rank window; it pays one extra
  // map-side-combinable total next to the pruned conditional sums.
  val t20_vocab_coverage: Q = (s, d) => {
    val counts = Tables.documents(s, d)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = counts.agg(sum("cnt").as("total"))
    graft.api.GraftOps.globalTopK(counts, "cnt", "word", 1000)
      .agg(
        sum(when(col("rank") <= 10, col("cnt")).otherwise(0L)).as("c10"),
        sum(when(col("rank") <= 100, col("cnt")).otherwise(0L)).as("c100"),
        sum(when(col("rank") <= 1000, col("cnt")).otherwise(0L)).as("c1000"))
      .crossJoin(broadcast(total))
      .select(expr(
        "stack(3, 10L, c10, 100L, c100, 1000L, c1000) AS (k, covered_tokens)"),
        col("total").as("total_tokens"))
      .select(col("k"), col("covered_tokens"), col("total_tokens"),
        (col("covered_tokens").cast("double") / col("total_tokens")).as("coverage"))
      .orderBy("k")
  }
  val t20Sql: String =
    """WITH words AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        FROM documents),
      counts AS (SELECT word, COUNT(*) AS cnt FROM words
                 WHERE word <> '' GROUP BY word),
      ranked AS (SELECT cnt,
                   row_number() OVER (ORDER BY cnt DESC, word) AS rk
                 FROM counts),
      agg AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                CAST(sum(CASE WHEN rk <= 10 THEN cnt ELSE 0 END) AS BIGINT) AS c10,
                CAST(sum(CASE WHEN rk <= 100 THEN cnt ELSE 0 END) AS BIGINT) AS c100,
                CAST(sum(CASE WHEN rk <= 1000 THEN cnt ELSE 0 END) AS BIGINT) AS c1000
              FROM ranked)
      SELECT k, covered_tokens, total AS total_tokens,
             CAST(covered_tokens AS DOUBLE) / total AS coverage
      FROM (SELECT CAST(10 AS BIGINT) AS k, c10 AS covered_tokens, total FROM agg
            UNION ALL SELECT 100, c100, total FROM agg
            UNION ALL SELECT 1000, c1000, total FROM agg) t
      ORDER BY k"""

  val queries: Map[String, Q] = Map(
    "t20_vocab_coverage" -> t20_vocab_coverage,
  )
  val oracles: Map[String, String] = Map(
    "t20_vocab_coverage" -> t20Sql,
  )
}
