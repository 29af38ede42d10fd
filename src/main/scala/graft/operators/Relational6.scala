package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational / ETL part 6: dimension-history maintenance (SCD2) and
  * distribution profiling (histogram + CDF).
  */
object Relational6 {
  type Q = (SparkSession, String) => DataFrame

  // ---- q56: SCD2 merge (slowly-changing-dimension upsert) ----
  // Current dim = customers (minus a simulated-missing slice) valid from
  // 2024-01-01; incoming snapshot effective 2024-06-01 changes acctbal for
  // custkey%3=0 and re-introduces the missing slice as inserts. The merge
  // is ONE full-outer join on the business key; each branch (close old /
  // keep open / open new / insert) is a projection of that join — no
  // per-row driver logic, one shuffle total at any scale. The union of
  // branches reuses the joined plan (ReuseExchange).
  val q56_scd2_merge: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val dim = cust.filter(col("c_custkey") % 97 =!= 0)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal_old"))
    val snap = cust.select(col("c_custkey").as("k"),
      when(col("c_custkey") % 3 === 0, col("c_acctbal") + 100.0)
        .otherwise(col("c_acctbal")).as("bal_new"))
    val j = dim.join(snap, Seq("k"), "full_outer")
    val d0 = to_date(lit("2024-01-01"))
    val d1 = to_date(lit("2024-06-01"))
    val changed = j.filter(col("bal_old").isNotNull && col("bal_old") =!= col("bal_new"))
    val closedOld = changed.select(col("k"), col("bal_old").as("c_acctbal"),
      d0.as("valid_from"), d1.as("valid_to"), lit(false).as("is_current"))
    val newVersion = changed.select(col("k"), col("bal_new").as("c_acctbal"),
      d1.as("valid_from"), lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
    val unchanged = j.filter(col("bal_old").isNotNull && col("bal_old") === col("bal_new"))
      .select(col("k"), col("bal_old").as("c_acctbal"),
        d0.as("valid_from"), lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
    val inserted = j.filter(col("bal_old").isNull)
      .select(col("k"), col("bal_new").as("c_acctbal"),
        d1.as("valid_from"), lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
    closedOld.union(newVersion).union(unchanged).union(inserted)
      .withColumnRenamed("k", "c_custkey")
      .orderBy("c_custkey", "valid_from")
  }
  val q56Sql: String =
    """WITH dim AS (SELECT c_custkey k, c_acctbal bal_old FROM customer WHERE c_custkey % 97 <> 0),
      snap AS (SELECT c_custkey k,
                 CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END bal_new
               FROM customer),
      j AS (SELECT COALESCE(dim.k, snap.k) k, bal_old, bal_new
            FROM dim FULL OUTER JOIN snap ON dim.k = snap.k)
      SELECT k AS c_custkey, c_acctbal, valid_from, valid_to, is_current FROM (
        SELECT k, bal_old AS c_acctbal, DATE '2024-01-01' AS valid_from,
               DATE '2024-06-01' AS valid_to, FALSE AS is_current
        FROM j WHERE bal_old IS NOT NULL AND bal_old <> bal_new
        UNION ALL
        SELECT k, bal_new, DATE '2024-06-01', NULL, TRUE
        FROM j WHERE bal_old IS NOT NULL AND bal_old <> bal_new
        UNION ALL
        SELECT k, bal_old, DATE '2024-01-01', NULL, TRUE
        FROM j WHERE bal_old IS NOT NULL AND bal_old = bal_new
        UNION ALL
        SELECT k, bal_new, DATE '2024-06-01', NULL, TRUE
        FROM j WHERE bal_old IS NULL) t
      ORDER BY c_custkey, valid_from"""

  // ---- q57: equi-width histogram + cumulative distribution ----
  // One aggregation on the bucket key (uniform by construction), then a
  // tiny window over the ~dozen bucket rows for the CDF — the heavy stage
  // is map-side-combinable, the window is O(buckets), not O(rows),
  // run inside GraftOps.boundedSingleGroup's explicit bounded partition
  // so WindowExec never takes its unpartitioned path.
  val q57_histogram_cdf: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val b = graft.api.GraftOps.boundedSingleGroup(
      Tables.orders(s, d)
        .withColumn("bucket", floor(col("o_totalprice") / 50000.0).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          graft.Stable.dsum(col("o_totalprice")).as("sum_price")))
    val total = Window.partitionBy("__g").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("cum_n", sum("n").over(total))
      .withColumn("cum_share",
        round(col("cum_n").cast("double") / sum("n").over(
          Window.partitionBy("__g").orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)), 9))
      .select("bucket", "n", "sum_price", "cum_n", "cum_share")
      .orderBy("bucket")
  }
  val q57Sql: String =
    """WITH b AS (SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
                       COUNT(*) AS n,
                       CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
                FROM orders GROUP BY 1)
      SELECT bucket, n, sum_price,
             CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum_n,
             round(CAST(sum(n) OVER (ORDER BY bucket) AS DOUBLE)
                   / sum(n) OVER (), 9) AS cum_share
      FROM b ORDER BY bucket"""

  // ---- q58: class-balanced downsampling (training-set rebalancing) ----
  // Keep min-class-count docs per language, selected by deterministic
  // md5 rank (reproducible across runs/engines — never rand()). One
  // window shuffle on the class key; the min-count scalar broadcasts.
  val q58_balanced_sample: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val ranked = docs.withColumn("rn",
      row_number().over(Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).cast("long"))
    val minCount = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      .agg(min("c").as("min_c"))
    ranked.join(broadcast(minCount))
      .filter(col("rn") <= col("min_c"))
      .select("doc_id", "lang", "rn")
      .orderBy("lang", "rn")
  }
  val q58Sql: String =
    """WITH ranked AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents),
      m AS (SELECT min(c) AS min_c FROM
              (SELECT COUNT(*) c FROM documents GROUP BY lang) t)
      SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
      FROM ranked, m WHERE rn <= min_c ORDER BY lang, rn"""

  // ---- q59: vocabulary build (top-k terms with rank) ----
  // The word count is the heavy stage and is fully map-side combinable.
  // Ranking goes through GraftOps.globalTopK — TakeOrderedAndProject
  // prunes to the k best via per-partition bounded heaps (k×partitions
  // rows reach the merge, never the vocabulary), and the rank window
  // runs over the k survivors only. At web scale the vocab table is
  // 10⁸–10⁹ distinct tokens; an unpartitioned rank window there would
  // BE the job.
  val q59_vocab_topk: Q = (s, d) =>
    graft.api.GraftOps.globalTopK(
        Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("n")),
        "n", "word", 1000)
      .select("rank", "word", "n")
      .orderBy("rank")
  val q59Sql: String =
    """SELECT CAST(row_number() OVER (ORDER BY COUNT(*) DESC, word) AS BIGINT) AS rank,
             word, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      GROUP BY word QUALIFY rank <= 1000 ORDER BY rank"""

  val queries: Map[String, Q] = Map(
    "q56_scd2_merge"      -> q56_scd2_merge,
    "q57_histogram_cdf"   -> q57_histogram_cdf,
    "q58_balanced_sample" -> q58_balanced_sample,
    "q59_vocab_topk"      -> q59_vocab_topk,
  )
  val oracles: Map[String, String] = Map(
    "q56_scd2_merge"      -> q56Sql,
    "q57_histogram_cdf"   -> q57Sql,
    "q58_balanced_sample" -> q58Sql,
    "q59_vocab_topk"      -> q59Sql,
  )
}
