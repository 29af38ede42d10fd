package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Stable._
import graft.Tables

/** Relational / ETL core, part 4 — classic TPC-H decision-support shapes
  * adapted to the available columns (q42–q46): outer-join distributions,
  * agg-filtered IN subqueries, min-per-group join-back, multi-column
  * NOT IN, and scalar-subquery threshold filters.
  */
object Relational4 {
  type Q = (SparkSession, String) => DataFrame

  // ---- q42: customer order-count distribution (TPC-H Q13 shape) ----
  // Left outer join keeps zero-order customers; the distribution then
  // groups customers by how many orders they have.
  val q42_outer_distribution: Q = (s, d) => {
    val cust = Tables.customer(s, d).select("c_custkey")
    val ord = Tables.orders(s, d)
      .filter(!col("o_orderpriority").startsWith("5"))
      .select("o_orderkey", "o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }
  val q42Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '5%'
        GROUP BY c_custkey) c
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

  // ---- q43: large-quantity orders via agg IN-subquery (TPC-H Q18 shape) ----
  val q43_agg_in_subquery: Q = (s, d) => {
    val big = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150.0)
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === big("l_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice", "total_qty")
      .orderBy(desc("total_qty"), col("o_orderkey"))
      .limit(100)
  }
  val q43Sql: String =
    s"""SELECT o_orderkey, o_custkey, o_totalprice, total_qty
       FROM orders JOIN (
         SELECT l_orderkey, ${sqlSum("l_quantity")} AS total_qty
         FROM lineitem GROUP BY l_orderkey
         HAVING ${sqlSum("l_quantity")} > 150.0) t
       ON o_orderkey = l_orderkey
       ORDER BY total_qty DESC, o_orderkey LIMIT 100"""

  // ---- q44: min-per-group join-back (TPC-H Q2 shape) ----
  // Cheapest part per brand, recovered by joining the per-brand minimum
  // back to the rows (broadcast of the tiny agg side).
  val q44_min_join_back: Q = (s, d) => {
    val part = Tables.part(s, d)
    val minPrice = part.groupBy(col("p_brand").as("mb"))
      .agg(min("p_retailprice").as("min_price"))
    part.join(broadcast(minPrice),
        col("p_brand") === col("mb") && col("p_retailprice") === col("min_price"))
      .select("p_brand", "p_partkey", "p_name", "p_retailprice")
      .orderBy("p_brand", "p_partkey")
  }
  val q44Sql: String =
    """SELECT p_brand, p_partkey, p_name, p_retailprice
      FROM part JOIN (
        SELECT p_brand AS mb, min(p_retailprice) AS min_price
        FROM part GROUP BY 1) m
      ON p_brand = mb AND p_retailprice = min_price
      ORDER BY p_brand, p_partkey"""

  // ---- q45: NOT IN exclusion + distinct supplier counting (Q16 shape) ----
  val q45_not_in_count: Q = (s, d) => {
    val excluded = Tables.part(s, d)
      .filter(col("p_type").isin("PROMO", "ECONOMY"))
      .select(col("p_partkey").as("x_partkey"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .join(excluded, col("p_partkey") === col("x_partkey"), "left_anti")
      .groupBy("p_brand", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_size"))
      .limit(50)
  }
  val q45Sql: String =
    """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_partkey NOT IN (
        SELECT p_partkey FROM part WHERE p_type IN ('PROMO','ECONOMY'))
      GROUP BY p_brand, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_size LIMIT 50"""

  // ---- q46: scalar-subquery threshold (TPC-H Q22 shape) ----
  // Customers with above-average balance and no orders.
  val q46_scalar_subquery: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal")).as("ab"))
    val noOrders = cust.join(
      Tables.orders(s, d).select("o_custkey"),
      col("c_custkey") === col("o_custkey"), "left_anti")
    noOrders.join(broadcast(avgBal), col("c_acctbal") > col("ab"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("c_mktsegment")
  }
  val q46Sql: String =
    s"""SELECT c_mktsegment, COUNT(*) AS numcust, ${sqlSum("c_acctbal")} AS totacctbal
       FROM customer
       WHERE c_acctbal > (
         SELECT ${sqlAvg("c_acctbal")} FROM customer WHERE c_acctbal > 0.0)
         AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // ---- q47: first/last/nth value window frames ----
  val q47_value_windows: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .filter(col("o_custkey") < 30)
      .withColumn("first_price", first("o_totalprice").over(full))
      .withColumn("last_price", last("o_totalprice").over(full))
      .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(full))
      .select("o_custkey", "o_orderkey", "o_totalprice",
        "first_price", "last_price", "second_price")
      .orderBy("o_custkey", "o_orderkey")
  }
  val q47Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
        first_value(o_totalprice) OVER w AS first_price,
        last_value(o_totalprice) OVER w AS last_price,
        nth_value(o_totalprice, 2) OVER w AS second_price
      FROM orders WHERE o_custkey < 30
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey"""

  // ---- q48: ordered string aggregation (listagg) ----
  val q48_string_agg: Q = (s, d) => {
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 300)
      .groupBy("o_orderpriority")
      .agg(
        expr("array_join(transform(array_sort(collect_list(o_orderkey)), x -> CAST(x AS STRING)), ',')")
          .as("keys_csv"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }
  val q48Sql: String =
    """SELECT o_orderpriority,
        string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS keys_csv,
        COUNT(*) AS n
      FROM orders WHERE o_orderkey < 300
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- q49: scalar-function coverage sweep ----
  val q49_misc_funcs: Q = (s, d) => {
    Tables.part(s, d)
      .filter(col("p_partkey") < 100)
      .select(
        col("p_partkey"),
        initcap(lower(col("p_type"))).as("type_title"),
        translate(col("p_brand"), "#", "-").as("brand_tr"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        reverse(col("p_name")).as("name_rev"),
        instr(col("p_name"), "a").cast("long").as("first_a"),
        repeat(lit("ab"), 3).as("abab"),
        greatest(col("p_size"), lit(10)).cast("long").as("size_floor10"),
        least(col("p_retailprice"), lit(950.0)).as("price_cap"),
        signum(col("p_retailprice") - 950.0).as("price_sign"),
        abs(col("p_size") - 25).cast("long").as("size_dist"),
        pow(lit(2.0), col("p_size") % 10).as("pow2"),
        floor(col("p_retailprice")).cast("long").as("price_floor"),
        ceil(col("p_retailprice")).cast("long").as("price_ceil"))
      .orderBy("p_partkey")
  }
  val q49Sql: String =
    """SELECT p_partkey,
        -- DuckDB initcap doesn't exist; emulate title-case per word
        array_to_string(list_transform(string_split(lower(p_type), ' '),
          w -> upper(w[1]) || w[2:]), ' ') AS type_title,
        translate(p_brand, '#', '-') AS brand_tr,
        lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
        reverse(p_name) AS name_rev,
        CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
        repeat('ab', 3) AS abab,
        CAST(greatest(p_size, 10) AS BIGINT) AS size_floor10,
        least(p_retailprice, 950.0) AS price_cap,
        CAST(sign(p_retailprice - 950.0) AS DOUBLE) AS price_sign,
        CAST(abs(p_size - 25) AS BIGINT) AS size_dist,
        pow(2.0, p_size % 10) AS pow2,
        CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil
      FROM part WHERE p_partkey < 100 ORDER BY p_partkey"""

  val queries: Map[String, Q] = Map(
    "q49_misc_funcs"         -> q49_misc_funcs,
    "q47_value_windows"      -> q47_value_windows,
    "q48_string_agg"         -> q48_string_agg,
    "q42_outer_distribution" -> q42_outer_distribution,
    "q43_agg_in_subquery"    -> q43_agg_in_subquery,
    "q44_min_join_back"      -> q44_min_join_back,
    "q45_not_in_count"       -> q45_not_in_count,
    "q46_scalar_subquery"    -> q46_scalar_subquery,
  )
  val oracles: Map[String, String] = Map(
    "q49_misc_funcs"         -> q49Sql,
    "q47_value_windows"      -> q47Sql,
    "q48_string_agg"         -> q48Sql,
    "q42_outer_distribution" -> q42Sql,
    "q43_agg_in_subquery"    -> q43Sql,
    "q44_min_join_back"      -> q44Sql,
    "q45_not_in_count"       -> q45Sql,
    "q46_scalar_subquery"    -> q46Sql,
  )
}
