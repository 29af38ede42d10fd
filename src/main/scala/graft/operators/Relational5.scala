package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational / ETL core, part 5 (q50–q53): unpivot/melt, interval RANGE
  * window frames, regex group extraction, boolean aggregates.
  */
object Relational5 {
  type Q = (SparkSession, String) => DataFrame

  // ---- q50: unpivot / melt wide columns to rows ----
  val q50_unpivot: Q = (s, d) => {
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"),
        expr("stack(2, 'totalprice', o_totalprice, 'custkey', CAST(o_custkey AS DOUBLE))")
          .as(Seq("metric", "value")))
      .orderBy("o_orderkey", "metric")
  }
  val q50Sql: String =
    """SELECT o_orderkey, metric, value FROM (
        UNPIVOT (SELECT o_orderkey, o_totalprice AS totalprice,
                        CAST(o_custkey AS DOUBLE) AS custkey
                 FROM orders WHERE o_orderkey < 100)
        ON totalprice, custkey INTO NAME metric VALUE value) t
      ORDER BY o_orderkey, metric"""

  // ---- q51: time-interval RANGE window frame ----
  val q51_range_frame: Q = (s, d) => {
    Tables.orders(s, d)
      .filter(col("o_custkey") < 10)
      .withColumn("rolling_7d",
        expr("""CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate
                  RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE)"""))
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "rolling_7d")
      .orderBy("o_custkey", "o_orderkey")
  }
  val q51Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_7d
      FROM orders WHERE o_custkey < 10
      ORDER BY o_custkey, o_orderkey"""

  // ---- q52: regex group extraction ----
  val q52_regexp_extract: Q = (s, d) => {
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).as("brand_num"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"))
      .orderBy("p_partkey")
  }
  val q52Sql: String =
    """SELECT p_partkey,
        regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS brand_num,
        regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        regexp_extract(p_name, '([a-z]+)$', 1) AS last_word
      FROM part ORDER BY p_partkey"""

  // ---- q53: boolean / conditional aggregates ----
  val q53_bool_agg: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("count_if(l_quantity > 25.0)").as("n_big"),
        expr("bool_and(l_quantity > 0.0)").as("all_positive"),
        expr("bool_or(l_discount > 0.09)").as("any_high_disc"),
        expr("count_if(l_tax = 0.0)").as("n_taxfree"))
      .orderBy("l_returnflag")
  }
  val q53Sql: String =
    """SELECT l_returnflag,
        CAST(count_if(l_quantity > 25.0) AS BIGINT) AS n_big,
        bool_and(l_quantity > 0.0) AS all_positive,
        bool_or(l_discount > 0.09) AS any_high_disc,
        CAST(count_if(l_tax = 0.0) AS BIGINT) AS n_taxfree
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---- q55: deterministic stratified sampling ----
  // sampleBy's semantics (per-stratum fraction) but reproducible on any
  // cluster/partitioning: the md5 of the row key maps to a uniform
  // [0,4096) value compared against a per-stratum threshold.
  val q55_stratified_sample: Q = (s, d) => {
    val u = expr("CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 3), 16, 10) AS BIGINT)")
    val thresh = when(col("o_orderpriority") === "1-URGENT", 2048) // 50%
      .when(col("o_orderpriority") === "2-HIGH", 1024)             // 25%
      .otherwise(410)                                              // ~10%
    Tables.orders(s, d)
      .withColumn("u", u)
      .filter(col("u") < thresh)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("o_orderpriority")
  }
  val q55Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_sampled
      FROM orders
      WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 3))::BIGINT <
        CASE WHEN o_orderpriority = '1-URGENT' THEN 2048
             WHEN o_orderpriority = '2-HIGH' THEN 1024
             ELSE 410 END
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  val queries: Map[String, Q] = Map(
    "q55_stratified_sample" -> q55_stratified_sample,
    "q50_unpivot"        -> q50_unpivot,
    "q51_range_frame"    -> q51_range_frame,
    "q52_regexp_extract" -> q52_regexp_extract,
    "q53_bool_agg"       -> q53_bool_agg,
  )
  val oracles: Map[String, String] = Map(
    "q55_stratified_sample" -> q55Sql,
    "q50_unpivot"        -> q50Sql,
    "q51_range_frame"    -> q51Sql,
    "q52_regexp_extract" -> q52Sql,
    "q53_bool_agg"       -> q53Sql,
  )
}
