package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Stable._
import graft.Tables

/** Relational / ETL core, part 3 — SURVEY.md §2 (q31–q40): statistical
  * aggregates, full window-function suite, as-of join, range join, array
  * and JSON/map ops, sequence generation, skew-salted joins, grouping sets.
  */
object Relational3 {
  type Q = (SparkSession, String) => DataFrame

  // ---- q31: stddev/variance/corr/covar from exact decimal moments ----
  // Moments are decimal-summed (order-independent), the closed-form
  // formulas then run in double — identical on both engines, and still
  // partial-aggregatable at scale (sums decompose).
  val q31_stats_agg: Q = (s, d) => {
    // Factors are cast to DECIMAL(18,6) BEFORE multiplying: casting a
    // ~1e6-magnitude double is exactly rounded on both engines, and the
    // decimal*decimal product (37,12) is exact — whereas casting the
    // double product (~1e10) is NOT exactly rounded in DuckDB's fast path
    // (verified: 59138/60000 mismatches at DECIMAL(38,10)).
    val D = DecimalType(18, 6)
    val qd = col("l_quantity").cast(D)
    val pd = col("l_extendedprice").cast(D)
    val li = Tables.lineitem(s, d)
    li.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(qd).cast("double").as("sx"),
        sum(qd * qd).cast("double").as("sxx"),
        sum(pd).cast("double").as("sy"),
        sum(pd * pd).cast("double").as("syy"),
        sum(qd * pd).cast("double").as("sxy"))
      .select(
        col("l_returnflag"), col("n"),
        // round(.,9): the moments are exact, but the closed-form double
        // arithmetic can differ by ~1 ulp across engines (FMA contraction
        // in native code); 1e-9 rounding absorbs that with ~1e-6 headroom.
        round((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1), 9).as("var_qty"),
        round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 9).as("std_qty"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1), 9).as("covar_qp"),
        round((col("sxy") - col("sx") * col("sy") / col("n"))
          / (sqrt(col("sxx") - col("sx") * col("sx") / col("n"))
            * sqrt(col("syy") - col("sy") * col("sy") / col("n"))), 9).as("corr_qp"))
      .orderBy("l_returnflag")
  }
  val q31Sql: String =
    """SELECT l_returnflag, n,
       round((sxx - sx*sx/n) / (n-1), 9) AS var_qty,
       round(sqrt((sxx - sx*sx/n) / (n-1)), 9) AS std_qty,
       round((sxy - sx*sy/n) / (n-1), 9) AS covar_qp,
       round((sxy - sx*sy/n) / (sqrt(sxx - sx*sx/n) * sqrt(syy - sy*sy/n)), 9) AS corr_qp
       FROM (SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(qd) AS DOUBLE) AS sx, CAST(SUM(qd*qd) AS DOUBLE) AS sxx,
         CAST(SUM(pd) AS DOUBLE) AS sy, CAST(SUM(pd*pd) AS DOUBLE) AS syy,
         CAST(SUM(qd*pd) AS DOUBLE) AS sxy
       FROM (SELECT l_returnflag,
               CAST(l_quantity AS DECIMAL(19,6)) AS qd,
               CAST(l_extendedprice AS DECIMAL(19,6)) AS pd
             FROM lineitem) r GROUP BY l_returnflag) t ORDER BY l_returnflag"""

  // ---- q32: lead/lag deltas per customer order history ----
  val q32_lead_lag: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, d)
      .filter(col("o_custkey") < 20)
      .withColumn("prev_price", lag("o_totalprice", 1).over(w))
      .withColumn("next_price", lead("o_totalprice", 1).over(w))
      .withColumn("delta_prev", col("o_totalprice") - col("prev_price"))
      .select("o_custkey", "o_orderkey", "o_totalprice", "prev_price", "next_price", "delta_prev")
      .orderBy("o_custkey", "o_orderkey")
  }
  val q32Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
        lag(o_totalprice) OVER w AS prev_price,
        lead(o_totalprice) OVER w AS next_price,
        o_totalprice - lag(o_totalprice) OVER w AS delta_prev
      FROM orders WHERE o_custkey < 20
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""

  // ---- q33: ntile / percent_rank / cume_dist ----
  val q33_ntile_ranks: Q = (s, d) => {
    val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    Tables.orders(s, d)
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .filter(col("o_orderkey") % 100 === 0)
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "quartile", "pct_rank", "cume")
      .orderBy("o_orderpriority", "o_orderkey")
  }
  val q33Sql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice, quartile, pct_rank, cume FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
          CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          percent_rank() OVER w AS pct_rank,
          cume_dist() OVER w AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)) t
      WHERE o_orderkey % 100 = 0 ORDER BY o_orderpriority, o_orderkey"""

  // ---- q34: as-of join (latest prior view per purchase) ----
  // Spark-native composition: tag both sides, union, one window pass with
  // last(ignoreNulls) — a single shuffle on user_id, no join explosion, no
  // per-key skew amplification. This is the scale-path formulation of an
  // as-of join; graft.plans.AsofJoin provides the custom-operator variant.
  val q34_asof_join: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("view_ts"))
      .agg(max("event_id").as("view_event_id"))
    val tagged = purchases
      .withColumn("side", lit(1))
      .withColumn("view_event_id", lit(null).cast("long"))
      .withColumn("view_ts", lit(null).cast("timestamp"))
      .select("user_id", "ts", "side", "event_id", "view_event_id", "view_ts")
      .unionByName(views
        .withColumn("side", lit(0))
        .withColumn("event_id", lit(null).cast("long"))
        .withColumn("ts", col("view_ts"))
        .select("user_id", "ts", "side", "event_id", "view_event_id", "view_ts"))
    val w = Window.partitionBy("user_id").orderBy("ts", "side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("m_view_id", last("view_event_id", ignoreNulls = true).over(w))
      .withColumn("m_view_ts", last("view_ts", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        col("m_view_id").as("view_event_id"),
        col("m_view_ts").as("view_ts"),
        (col("ts").cast("long") - col("m_view_ts").cast("long")).as("gap_s"))
      .orderBy("event_id")
  }
  val q34Sql: String =
    """SELECT p.event_id, p.user_id, p.ts, v.view_event_id, v.view_ts,
        CAST(date_diff('second', v.view_ts, p.ts) AS BIGINT) AS gap_s
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase') p
      ASOF LEFT JOIN (
        SELECT user_id, ts AS view_ts, max(event_id) AS view_event_id
        FROM events WHERE event_type='view' GROUP BY 1, 2) v
        ON p.user_id = v.user_id AND p.ts >= v.view_ts
      ORDER BY p.event_id"""

  // ---- q35: range join against a broadcast interval table ----
  val q35_range_join: Q = (s, d) => {
    val buckets = s.range(10).select(
      col("id").as("bucket_id"),
      (col("id") * 5).cast("double").as("lo"),
      ((col("id") + 1) * 5).cast("double").as("hi"))
    Tables.lineitem(s, d)
      .join(broadcast(buckets),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy("bucket_id", "lo", "hi")
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_extendedprice")).as("total_price"))
      .orderBy("bucket_id")
  }
  val q35Sql: String =
    s"""SELECT bucket_id, lo, hi, COUNT(*) AS n_lines,
       ${sqlSum("l_extendedprice")} AS total_price
       FROM lineitem JOIN (
         SELECT x AS bucket_id, CAST(x*5 AS DOUBLE) AS lo, CAST((x+1)*5 AS DOUBLE) AS hi
         FROM generate_series(0, 9) t(x)) b
       ON l_quantity >= lo AND l_quantity < hi
       GROUP BY 1, 2, 3 ORDER BY bucket_id"""

  // ---- q36: array aggregation + array function suite ----
  val q36_array_ops: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 200)
      .groupBy("l_orderkey")
      .agg(array_sort(collect_list(col("l_quantity"))).as("qtys"))
      .select(
        col("l_orderkey"),
        size(col("qtys")).cast("long").as("n"),
        element_at(col("qtys"), 1).as("q_min"),
        element_at(col("qtys"), -1).as("q_max"),
        // quantities are integral doubles, so the fold is exact in any order
        expr("aggregate(qtys, CAST(0 AS DOUBLE), (a, x) -> a + x)").as("q_sum"),
        expr("CAST(size(filter(qtys, x -> x >= 25.0)) AS BIGINT)").as("n_big"))
      .orderBy("l_orderkey")
  }
  val q36Sql: String =
    """SELECT l_orderkey, len(qtys) AS n,
        qtys[1] AS q_min, qtys[-1] AS q_max,
        CAST(list_sum(qtys) AS DOUBLE) AS q_sum,
        len(list_filter(qtys, x -> x >= 25.0)) AS n_big
      FROM (SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
            FROM lineitem WHERE l_orderkey < 200 GROUP BY l_orderkey) t
      ORDER BY l_orderkey"""

  // ---- q37: JSON -> map parsing and access ----
  val q37_map_ops: Q = (s, d) => {
    Tables.events(s, d)
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("MAP<STRING,BIGINT>")))
      .select(
        col("event_id"),
        size(col("m")).cast("long").as("n_keys"),
        array_join(map_keys(col("m")), ",").as("keys"),
        element_at(col("m"), "k").as("k_val"))
      .filter(col("event_id") < 2000)
      .orderBy("event_id")
  }
  val q37Sql: String =
    """SELECT event_id,
        CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        array_to_string(json_keys(props), ',') AS keys,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
      FROM events WHERE event_id < 2000 ORDER BY event_id"""

  // ---- q38: sequence generation + temporal explode ----
  val q38_sequence_explode: Q = (s, d) => {
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"),
        explode(expr("sequence(o_orderdate, o_orderdate + INTERVAL 3 DAYS, INTERVAL 1 DAY)")).as("seq_ts"))
      .orderBy("o_orderkey", "seq_ts")
  }
  val q38Sql: String =
    """SELECT o_orderkey, unnest(generate_series(o_orderdate, o_orderdate + INTERVAL 3 DAY, INTERVAL 1 DAY)) AS seq_ts
      FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey, seq_ts"""

  // ---- q39: skew-salted join (same result as the plain join) ----
  // Demonstrates the skew pattern: explode the build side over SALT
  // replicas, salt the probe side deterministically (event_id % SALT), and
  // join on (key, salt) — a hot key fans out across SALT reducers instead
  // of one. Correctness oracle is the plain unsalted join.
  val q39_salted_join: Q = (s, d) => {
    val SALT = 8
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("salt", explode(expr(s"sequence(0, ${SALT - 1})")))
    val ev = Tables.events(s, d)
      .withColumn("salt", (col("event_id") % SALT).cast("int"))
    ev.join(cust,
        ev("user_id") === cust("c_custkey") && ev("salt") === cust("salt"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy("c_mktsegment")
  }
  val q39Sql: String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_events, ${sqlSum("value")} AS total_value
       FROM events JOIN customer ON user_id = c_custkey
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // ---- q40: GROUPING SETS (beyond rollup/cube) ----
  val q40_grouping_sets: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
            COALESCE(o_orderpriority, 'ALL') AS priority,
            COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
          FROM orders_gs
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY status, priority""")
  }
  val q40Sql: String =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n, ${sqlSum("o_totalprice")} AS total
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       ORDER BY status, priority"""

  // ---- q41: as-of join via the custom AsofJoinExec physical operator ----
  // Same semantics and oracle as q34, executed by graft.plans.AsofJoinExec
  // (sort-merge, co-partitioned) instead of the union+window composition —
  // the DuckDB ASOF JOIN oracle proves the custom operator end-to-end.
  val q41_asof_custom: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .agg(max("event_id").as("view_event_id"))
      .select("v_user", "view_ts", "view_event_id")
    graft.plans.AsofJoin.asofJoin(purchases, views, "user_id", "v_user", "ts", "view_ts")
      .select(
        col("event_id"), col("user_id"), col("ts"),
        col("view_event_id"), col("view_ts"),
        (col("ts").cast("long") - col("view_ts").cast("long")).as("gap_s"))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "q31_stats_agg"       -> q31_stats_agg,
    "q41_asof_custom"     -> q41_asof_custom,
    "q32_lead_lag"        -> q32_lead_lag,
    "q33_ntile_ranks"     -> q33_ntile_ranks,
    "q34_asof_join"       -> q34_asof_join,
    "q35_range_join"      -> q35_range_join,
    "q36_array_ops"       -> q36_array_ops,
    "q37_map_ops"         -> q37_map_ops,
    "q38_sequence_explode"-> q38_sequence_explode,
    "q39_salted_join"     -> q39_salted_join,
    "q40_grouping_sets"   -> q40_grouping_sets,
  )
  val oracles: Map[String, String] = Map(
    "q31_stats_agg"       -> q31Sql,
    "q41_asof_custom"     -> q34Sql,
    "q32_lead_lag"        -> q32Sql,
    "q33_ntile_ranks"     -> q33Sql,
    "q34_asof_join"       -> q34Sql,
    "q35_range_join"      -> q35Sql,
    "q36_array_ops"       -> q36Sql,
    "q37_map_ops"         -> q37Sql,
    "q38_sequence_explode"-> q38Sql,
    "q39_salted_join"     -> q39Sql,
    "q40_grouping_sets"   -> q40Sql,
  )
}
