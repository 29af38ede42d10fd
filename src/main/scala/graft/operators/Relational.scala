package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Stable._
import graft.Tables

/** Relational / ETL transformation core — SURVEY.md §2.
  *
  * Every query is a pure (SparkSession, sfDir) => DataFrame built only from
  * declarative DataFrame ops, so Catalyst owns pushdown, join selection, and
  * partial aggregation. Dimension tables (region/nation/customer/supplier/
  * part) are broadcast explicitly: at 100 TB the fact tables (lineitem/
  * orders/events) are the only sides that should shuffle, and only when a
  * fact-fact co-partitioned join genuinely needs it.
  *
  * Output contracts: deterministic row order (every query ends in orderBy
  * with a unique tie-break) and order-independent double aggregation
  * (Stable.dsum/davg) so results hash-match the DuckDB oracle exactly.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  // ---- q01: groupBy multi-aggregate (TPC-H Q1 shape) ----
  val q01_agg_pricing: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }
  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       ${sqlSum("l_quantity")} AS sum_qty,
       ${sqlSum("l_extendedprice")} AS sum_base_price,
       ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       ${sqlSum("(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)")} AS sum_charge,
       ${sqlAvg("l_quantity")} AS avg_qty,
       ${sqlAvg("l_extendedprice")} AS avg_price,
       ${sqlAvg("l_discount")} AS avg_disc,
       COUNT(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
       GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""

  // ---- q02: selective filter + projection (pushdown showcase) ----
  val q02_filter_project: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 5.0 && col("l_quantity") <= 15.0 &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }
  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_quantity >= 5.0 AND l_quantity <= 15.0
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
      ORDER BY l_orderkey, l_linenumber"""

  // ---- q03: 3-way join + agg + top-N (TPC-H Q3 shape) ----
  val q03_join_agg_topn: Q = (s, d) => {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
    val li   = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }
  val q03Sql: String =
    s"""SELECT l_orderkey, o_orderdate,
       ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-07-01'
         AND l_shipdate > TIMESTAMP '1998-07-01'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  // ---- q04: EXISTS via left_semi (TPC-H Q4 shape) ----
  val q04_semi_join: Q = (s, d) => {
    val bigLines = Tables.lineitem(s, d).filter(col("l_quantity") > 45.0)
      .select("l_orderkey")
    Tables.orders(s, d)
      .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }
  val q04Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- q05: 5-way star join, broadcast dims (TPC-H Q5 shape) ----
  val q05_multi_join: Q = (s, d) => {
    val reg = Tables.region(s, d).filter(col("r_name") === "ASIA" || col("r_name") === "EUROPE")
    val nat = Tables.nation(s, d)
    val cust = Tables.customer(s, d)
    val dims = broadcast(
      cust.join(nat, col("c_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "n_name"))
    val ord = Tables.orders(s, d)
    val li  = Tables.lineitem(s, d)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy("n_name")
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(desc("revenue"), col("n_name"))
  }
  val q05Sql: String =
    s"""SELECT n_name,
       ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       COUNT(*) AS n_lines
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name IN ('ASIA','EUROPE')
       GROUP BY n_name ORDER BY revenue DESC, n_name"""

  // ---- q06: tight range-predicate scan agg (TPC-H Q6 shape) ----
  val q06_range_filter_agg: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(
        dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }
  val q06Sql: String =
    s"""SELECT ${sqlSum("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n_rows
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0"""

  // ---- q07: NOT EXISTS via left_anti ----
  val q07_anti_join: Q = (s, d) => {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    Tables.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }
  val q07Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""

  // ---- q08: distinct projection ----
  val q08_distinct: Q = (s, d) => {
    Tables.orders(s, d)
      .select("o_orderstatus", "o_orderpriority")
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")
  }
  val q08Sql: String =
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      ORDER BY o_orderstatus, o_orderpriority"""

  // ---- q09: partition-window rank, top-k per group ----
  val q09_window_rank: Q = (s, d) => {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rn")
  }
  val q09Sql: String =
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_orderpriority, rn"""

  // ---- q10: running sum + moving average frames over events ----
  val q10_window_running: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val last3   = byUser.rowsBetween(-2, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id") < 20)
      .withColumn("running_value",
        sum(col("value").cast(DecimalType(30, 6))).over(running).cast("double"))
      .withColumn("avg3",
        sum(col("value").cast(DecimalType(30, 6))).over(last3).cast("double")
          / count(lit(1)).over(last3))
      .select("user_id", "event_id", "value", "running_value", "avg3")
      .orderBy("user_id", "event_id")
  }
  val q10Sql: String =
    """SELECT user_id, event_id, value,
        CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
        CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
          / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS avg3
      FROM events WHERE user_id < 20
      ORDER BY user_id, event_id"""

  val queries: Map[String, Q] = Map(
    "q01_agg_pricing"     -> q01_agg_pricing,
    "q02_filter_project"  -> q02_filter_project,
    "q03_join_agg_topn"   -> q03_join_agg_topn,
    "q04_semi_join"       -> q04_semi_join,
    "q05_multi_join"      -> q05_multi_join,
    "q06_range_filter_agg"-> q06_range_filter_agg,
    "q07_anti_join"       -> q07_anti_join,
    "q08_distinct"        -> q08_distinct,
    "q09_window_rank"     -> q09_window_rank,
    "q10_window_running"  -> q10_window_running,
  )

  val oracles: Map[String, String] = Map(
    "q01_agg_pricing"     -> q01Sql,
    "q02_filter_project"  -> q02Sql,
    "q03_join_agg_topn"   -> q03Sql,
    "q04_semi_join"       -> q04Sql,
    "q05_multi_join"      -> q05Sql,
    "q06_range_filter_agg"-> q06Sql,
    "q07_anti_join"       -> q07Sql,
    "q08_distinct"        -> q08Sql,
    "q09_window_rank"     -> q09Sql,
    "q10_window_running"  -> q10Sql,
  )
}
