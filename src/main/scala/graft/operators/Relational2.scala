package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Stable._
import graft.Tables

/** Relational / ETL core, part 2 — SURVEY.md §2 (q11–q30).
  *
  * Same contracts as [[Relational]]: declarative plans (Catalyst owns
  * pushdown + join strategy), deterministic output order, Stable.dsum/davg
  * for cross-engine-exact double aggregation. Oracle SQL is DuckDB dialect;
  * column names are aligned on both sides because the driver's compare
  * sorts columns by name before hashing.
  */
object Relational2 {
  type Q = (SparkSession, String) => DataFrame

  // ---- q11: pivot wide on l_returnflag ----
  val q11_pivot: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dsum(col("l_quantity")))
      .withColumnsRenamed(Map("A" -> "qty_a", "N" -> "qty_n", "R" -> "qty_r"))
      .orderBy("l_linestatus")
  }
  val q11Sql: String =
    """SELECT l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) FILTER (WHERE l_returnflag='A') AS DOUBLE) AS qty_a,
        CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) FILTER (WHERE l_returnflag='N') AS DOUBLE) AS qty_n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) FILTER (WHERE l_returnflag='R') AS DOUBLE) AS qty_r
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""

  // ---- q12: ROLLUP hierarchical totals (sentinel-coalesced group keys) ----
  val q12_rollup: Q = (s, d) => {
    Tables.orders(s, d)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total"))
      .orderBy("status", "priority")
  }
  val q12Sql: String =
    s"""SELECT COALESCE(o_orderstatus,'ALL') AS status,
       COALESCE(o_orderpriority,'ALL') AS priority,
       COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS total
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       ORDER BY status, priority"""

  // ---- q13: CUBE cross-dimensional totals ----
  val q13_cube: Q = (s, d) => {
    Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_extendedprice")).as("total_price"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n_lines"), col("total_price"))
      .orderBy("flag", "status")
  }
  val q13Sql: String =
    s"""SELECT COALESCE(l_returnflag,'ALL') AS flag,
       COALESCE(l_linestatus,'ALL') AS status,
       COUNT(*) AS n_lines, ${sqlSum("l_extendedprice")} AS total_price
       FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
       ORDER BY flag, status"""

  // ---- q14: UNION ALL + UNION DISTINCT ----
  val q14_union_dedup: Q = (s, d) => {
    val a = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("key"))
    val b = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("key"))
    a.union(b).groupBy("key").agg(count(lit(1)).as("n_src_rows"))
      .orderBy("key")
  }
  val q14Sql: String =
    """SELECT key, COUNT(*) AS n_src_rows FROM (
        SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT o_custkey AS key FROM orders WHERE o_orderpriority = '1-URGENT') t
      GROUP BY key ORDER BY key"""

  // ---- q15: INTERSECT / EXCEPT ----
  val q15_set_ops: Q = (s, d) => {
    val building = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("key"))
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("key"))
    val both    = building.intersect(urgent).withColumn("op", lit("intersect"))
    val onlyBld = building.except(urgent).withColumn("op", lit("except"))
    both.union(onlyBld).orderBy("op", "key")
  }
  val q15Sql: String =
    """SELECT * FROM (
        SELECT key, 'intersect' AS op FROM (
          SELECT c_custkey AS key FROM customer WHERE c_mktsegment='BUILDING'
          INTERSECT
          SELECT o_custkey AS key FROM orders WHERE o_orderpriority='1-URGENT')
        UNION ALL
        SELECT key, 'except' AS op FROM (
          SELECT c_custkey AS key FROM customer WHERE c_mktsegment='BUILDING'
          EXCEPT
          SELECT o_custkey AS key FROM orders WHERE o_orderpriority='1-URGENT')) t
      ORDER BY op, key"""

  // ---- q16: string function suite ----
  val q16_string_funcs: Q = (s, d) => {
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        lower(col("p_type")).as("type_lower"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_brand"), "[0-9]+", "#").as("brand_masked"),
        trim(lit("  pad  ")).as("trimmed"))
      .orderBy("p_partkey")
  }
  val q16Sql: String =
    """SELECT p_partkey,
        upper(p_brand) AS brand_upper,
        lower(p_type) AS type_lower,
        substring(p_name, 1, 8) AS name_prefix,
        CAST(length(p_name) AS BIGINT) AS name_len,
        concat_ws('|', p_brand, p_type) AS brand_type,
        regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_masked,
        trim('  pad  ') AS trimmed
      FROM part ORDER BY p_partkey"""

  // ---- q17: date/time function suite ----
  val q17_date_funcs: Q = (s, d) => {
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("due_date"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2002"))
      .orderBy("o_orderkey")
  }
  val q17Sql: String =
    """SELECT o_orderkey,
        CAST(year(o_orderdate) AS BIGINT) AS yr,
        CAST(month(o_orderdate) AS BIGINT) AS mo,
        CAST(day(o_orderdate) AS BIGINT) AS dom,
        CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        date_trunc('month', o_orderdate) AS month_start,
        o_orderdate + INTERVAL 90 DAY AS due_date,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002
      FROM orders ORDER BY o_orderkey"""

  // ---- q18: CASE WHEN bucketization ----
  val q18_case_bucket: Q = (s, d) => {
    val bucket = when(col("o_totalprice") < 50000.0, "small")
      .when(col("o_totalprice") < 200000.0, "medium")
      .otherwise("large")
    Tables.orders(s, d)
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total"),
        davg(col("o_totalprice")).as("avg_price"))
      .orderBy("bucket")
  }
  val q18Sql: String =
    s"""SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
              WHEN o_totalprice < 200000.0 THEN 'medium'
              ELSE 'large' END AS bucket,
       COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS total,
       ${sqlAvg("o_totalprice")} AS avg_price
       FROM orders GROUP BY 1 ORDER BY bucket"""

  // ---- q19: HAVING (post-aggregation filter) ----
  val q19_having: Q = (s, d) => {
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
      .filter(col("n_orders") >= 12)
      .orderBy("o_custkey")
  }
  val q19Sql: String =
    s"""SELECT o_custkey, COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS spend
       FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12 ORDER BY o_custkey"""

  // ---- q20: global top-k (TakeOrderedAndProject) ----
  val q20_topk_order: Q = (s, d) => {
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(25)
  }
  val q20Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"""

  // ---- q21: decorrelated "above customer average" subquery ----
  val q21_subquery_agg: Q = (s, d) => {
    val ord = Tables.orders(s, d)
    val custAvg = ord.groupBy("o_custkey")
      .agg(davg(col("o_totalprice")).as("cust_avg"))
      .withColumnRenamed("o_custkey", "ca_custkey")
    ord.join(custAvg, col("o_custkey") === col("ca_custkey"))
      .filter(col("o_totalprice") > col("cust_avg") * 1.5)
      .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
      .orderBy("o_orderkey")
  }
  val q21Sql: String =
    s"""SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
       FROM orders JOIN (
         SELECT o_custkey AS ca_custkey, ${sqlAvg("o_totalprice")} AS cust_avg
         FROM orders GROUP BY o_custkey) ca ON o_custkey = ca_custkey
       WHERE o_totalprice > cust_avg * 1.5
       ORDER BY o_orderkey"""

  // ---- q22: exact grouped COUNT DISTINCT ----
  val q22_count_distinct: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey"), col("l_partkey")).as("n_supp_part"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }
  val q22Sql: String =
    """SELECT l_returnflag,
        COUNT(DISTINCT l_orderkey) AS n_orders,
        COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part,
        COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---- q23: null semantics (nullif / coalesce / null-aware counts) ----
  val q23_null_handling: Q = (s, d) => {
    Tables.lineitem(s, d)
      .withColumn("maybe_flag", nullif(col("l_returnflag"), lit("N")))
      .groupBy("l_linestatus")
      .agg(
        count(col("maybe_flag")).as("n_not_null"),
        count(lit(1)).as("n_total"),
        sum(when(col("maybe_flag").isNull, 1L).otherwise(0L)).as("n_null"),
        count_distinct(coalesce(col("maybe_flag"), lit("SENTINEL"))).as("n_distinct_coalesced"))
      .orderBy("l_linestatus")
  }
  val q23Sql: String =
    """SELECT l_linestatus,
        COUNT(NULLIF(l_returnflag,'N')) AS n_not_null,
        COUNT(*) AS n_total,
        CAST(SUM(CASE WHEN NULLIF(l_returnflag,'N') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        COUNT(DISTINCT COALESCE(NULLIF(l_returnflag,'N'),'SENTINEL')) AS n_distinct_coalesced
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""

  // ---- q24: split -> explode -> word frequency (flatMap shape) ----
  val q24_explode: Q = (s, d) => {
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("word"))
      .limit(50)
  }
  val q24Sql: String =
    """SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word LIMIT 50"""

  // ---- q25: argmin/argmax (min_by / max_by) per group ----
  val q25_first_last: Q = (s, d) => {
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        max_by(col("o_orderkey"), col("o_totalprice")).as("max_price_order"),
        min_by(col("o_orderkey"), col("o_totalprice")).as("min_price_order"),
        max(col("o_totalprice")).as("max_price"),
        min(col("o_totalprice")).as("min_price"))
      .orderBy("o_orderpriority")
  }
  val q25Sql: String =
    """SELECT o_orderpriority,
        arg_max(o_orderkey, o_totalprice) AS max_price_order,
        arg_min(o_orderkey, o_totalprice) AS min_price_order,
        max(o_totalprice) AS max_price,
        min(o_totalprice) AS min_price
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- q26: deterministic hash-based sampling (reproducible splits) ----
  // md5(text form of the key) is engine-portable, uniformly distributed,
  // and stable under repartitioning — unlike rand() or Spark's hash().
  val q26_hash_sample: Q = (s, d) => {
    Tables.orders(s, d)
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1).isin("0", "1"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }
  val q26Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1')
      ORDER BY o_orderkey"""

  // ---- q27: gap-based sessionization over events ----
  val q27_sessionize: Q = (s, d) => {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val newSession = when(
      col("prev_ts").isNull ||
        col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L).otherwise(0L)
    Tables.events(s, d)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("is_new", newSession)
      .withColumn("session_id",
        sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("session_value"),
        min("ts").as("session_start"),
        max("ts").as("session_end"))
      .orderBy("user_id", "session_id")
  }
  val q27Sql: String =
    s"""SELECT user_id, session_id, COUNT(*) AS n_events,
       ${sqlSum("value")} AS session_value,
       min(ts) AS session_start, max(ts) AS session_end
       FROM (
         SELECT user_id, ts, value,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         FROM (
           SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
           FROM events) f) g
       GROUP BY user_id, session_id ORDER BY user_id, session_id"""

  // ---- q28: JSON field extraction from events.props ----
  val q28_json_extract: Q = (s, d) => {
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("k_sum"),
        max(col("k")).as("k_max"))
      .orderBy("event_type")
  }
  val q28Sql: String =
    """SELECT event_type,
        COUNT(k) AS n_with_k,
        CAST(SUM(k) AS BIGINT) AS k_sum,
        max(k) AS k_max
      FROM (SELECT event_type,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events) t
      GROUP BY event_type ORDER BY event_type"""

  // ---- q29: exact interpolated percentiles ----
  val q29_percentile: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000000)).as("p50_approx"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        expr("percentile(l_extendedprice, 0.25)").as("price_p25"))
      .drop("p50_approx")
      .orderBy("l_returnflag")
  }
  val q29Sql: String =
    """SELECT l_returnflag,
        quantile_cont(l_quantity, 0.5) AS p50,
        quantile_cont(l_quantity, 0.9) AS p90,
        quantile_cont(l_extendedprice, 0.25) AS price_p25
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---- q30 (retired from the oracled registry in round 6): Spark's
  // engine-internal HLL estimate is not SQL-replayable, so the oracled
  // approximate-distinct surface is q114_approx_distinct (the KMV twin
  // below, bit-exact DuckDB replay via d07's sketch). The HLL API stays
  // covered by RelationalSpec's ±5% assertion against this body. ----
  val q30_hll_distinct: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, Q] = Map(
    "q11_pivot"          -> q11_pivot,
    "q12_rollup"         -> q12_rollup,
    "q13_cube"           -> q13_cube,
    "q14_union_dedup"    -> q14_union_dedup,
    "q15_set_ops"        -> q15_set_ops,
    "q16_string_funcs"   -> q16_string_funcs,
    "q17_date_funcs"     -> q17_date_funcs,
    "q18_case_bucket"    -> q18_case_bucket,
    "q19_having"         -> q19_having,
    "q20_topk_order"     -> q20_topk_order,
    "q21_subquery_agg"   -> q21_subquery_agg,
    "q22_count_distinct" -> q22_count_distinct,
    "q23_null_handling"  -> q23_null_handling,
    "q24_explode"        -> q24_explode,
    "q25_first_last"     -> q25_first_last,
    "q26_hash_sample"    -> q26_hash_sample,
    "q27_sessionize"     -> q27_sessionize,
    "q28_json_extract"   -> q28_json_extract,
    "q29_percentile"     -> q29_percentile,
  )

  val oracles: Map[String, String] = Map(
    "q11_pivot"          -> q11Sql,
    "q12_rollup"         -> q12Sql,
    "q13_cube"           -> q13Sql,
    "q14_union_dedup"    -> q14Sql,
    "q15_set_ops"        -> q15Sql,
    "q16_string_funcs"   -> q16Sql,
    "q17_date_funcs"     -> q17Sql,
    "q18_case_bucket"    -> q18Sql,
    "q19_having"         -> q19Sql,
    "q20_topk_order"     -> q20Sql,
    "q21_subquery_agg"   -> q21Sql,
    "q22_count_distinct" -> q22Sql,
    "q23_null_handling"  -> q23Sql,
    "q24_explode"        -> q24Sql,
    "q25_first_last"     -> q25Sql,
    "q26_hash_sample"    -> q26Sql,
    "q27_sessionize"     -> q27Sql,
    "q28_json_extract"   -> q28Sql,
    "q29_percentile"     -> q29Sql,
  )
}
