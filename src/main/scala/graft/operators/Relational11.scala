package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Stable, Tables}

/** Relational/ETL core, part 11. */
object Relational11 {
  type Q = (SparkSession, String) => DataFrame

  // ---- q84: sole-blame supplier ranking (TPC-H Q21 shape, adapted) ----
  // The hardest classic correlated-subquery shape: suppliers who were
  // the ONLY supplier late on a multi-supplier order (EXISTS another
  // supplier's line / NOT EXISTS another supplier's late line). This
  // schema has no commit/receipt dates, so "late" = shipped more than
  // 60 days after the order date. The scale formulation DECORRELATES
  // the double-nested EXISTS into ONE per-order aggregation: per order,
  // count distinct suppliers, count distinct LATE suppliers, and carry
  // the max late supplier — orders with >=2 suppliers but exactly 1
  // late supplier assign blame to that supplier. One fact-fact join
  // (lineitem⋈orders on the key, AQE-planned), then TWO-LEVEL
  // aggregation — first collapse to (order, supplier, any_late), then
  // plain counts per order — instead of COUNT(DISTINCT ...): the
  // multi-distinct form makes Spark Expand-replicate every joined row
  // per distinct aggregate (measured 4.8s vs 1.3s at sf0.1), while
  // both levels here stay map-side-combinable plain aggregates on the
  // same orderkey grouping (one shuffle serves both). Supplier-sized
  // rollup + broadcast name join + TakeOrderedAndProject finish it —
  // no correlated re-scans of lineitem, which is what the textbook
  // nested form would cost at 100 TB.
  val q84_sole_blame: Q = (s, d) => {
    // r14 audit note: a gated spread of the fact side (the g10/v06
    // pattern) was A/B'd here and REJECTED — 1.69/1.83 s vs 1.29/1.43 s
    // at 32 cores: the map side (join probe + plain partial max) is too
    // cheap to amortize the added exchange, the g07 lesson again.
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val ord = Tables.orders(s, d).select("o_orderkey", "o_orderdate")
    val perSupp = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", col("l_shipdate") > date_add(col("o_orderdate"), 60))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("late")).as("any_late"))
    val perOrder = perSupp
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        count(when(col("any_late"), 1)).as("n_late_supp"),
        max(when(col("any_late"), col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
    perOrder.groupBy(col("late_supp").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
        "s_suppkey")
      .select("s_name", "numwait")
      .orderBy(desc("numwait"), col("s_name"))
      .limit(20)
  }
  val q84Sql: String =
    """WITH p AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN l_shipdate > CAST(o_orderdate AS DATE) + 60
                                   THEN l_suppkey END) AS n_late_supp,
               MAX(CASE WHEN l_shipdate > CAST(o_orderdate AS DATE) + 60
                        THEN l_suppkey END) AS late_supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_orderkey),
      blame AS (SELECT late_supp AS s_suppkey, COUNT(*) AS numwait
                FROM p WHERE n_supp >= 2 AND n_late_supp = 1
                GROUP BY late_supp)
      SELECT s_name, numwait
      FROM blame JOIN supplier USING (s_suppkey)
      ORDER BY numwait DESC, s_name LIMIT 20"""

  // ---- v09: cross-table reconciliation audit (sum conservation) ----
  // The between-tables integrity check ETL teams run after every load:
  // does the fact detail roll up to the header total? Per order status,
  // compare o_totalprice against the lineitem-derived revenue
  // sum(l_extendedprice * (1 - l_discount)): matched-within-1% rate,
  // headers with no detail rows, mean absolute gap. Plan: ONE detail
  // rollup on the join key (decimal-exact revenue — factors cast to
  // decimal BEFORE the product, the Stable discipline), one left join
  // from headers (header side keeps orders with zero lines), one
  // status-sized aggregate. Two scans total, no window, no re-scan per
  // metric — at 100 TB this is two partial-agg passes and one key join.
  val v09_reconcile: Q = (s, d) => {
    val detail = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum((col("l_extendedprice").cast("decimal(19,6)") *
        (lit(1).cast("decimal(19,6)") - col("l_discount").cast("decimal(19,6)")))
        .cast("decimal(30,6)")).as("detail_rev"))
    val joined = Tables.orders(s, d)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .join(detail, col("o_orderkey") === col("l_orderkey"), "left")
      .withColumn("gap",
        abs(col("o_totalprice").cast("decimal(30,6)") -
          coalesce(col("detail_rev"), lit(0).cast("decimal(30,6)"))))
      .withColumn("matched",
        col("detail_rev").isNotNull &&
          col("gap") <= col("o_totalprice").cast("decimal(30,6)") *
            lit(0.01).cast("decimal(10,6)"))
    joined.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        count(when(col("detail_rev").isNull, 1)).as("n_no_detail"),
        count(when(col("matched"), 1)).as("n_matched_1pct"),
        round((sum(col("gap")).cast("double") / count(lit(1))), 9)
          .as("mean_abs_gap"))
      .orderBy("o_orderstatus")
  }
  val v09Sql: String =
    """WITH detail AS (
        SELECT l_orderkey,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,6)) *
                   (CAST(1 AS DECIMAL(19,6)) - CAST(l_discount AS DECIMAL(19,6)))
                   AS DECIMAL(30,6))) AS detail_rev
        FROM lineitem GROUP BY l_orderkey),
      j AS (
        SELECT o_orderstatus, detail_rev,
               abs(CAST(o_totalprice AS DECIMAL(30,6)) -
                   COALESCE(detail_rev, CAST(0 AS DECIMAL(30,6)))) AS gap,
               (detail_rev IS NOT NULL AND
                abs(CAST(o_totalprice AS DECIMAL(30,6)) -
                    COALESCE(detail_rev, CAST(0 AS DECIMAL(30,6))))
                  <= CAST(o_totalprice AS DECIMAL(30,6)) *
                     CAST(0.01 AS DECIMAL(10,6))) AS matched
        FROM orders LEFT JOIN detail ON o_orderkey = l_orderkey)
      SELECT o_orderstatus, COUNT(*) AS n_orders,
             COUNT(CASE WHEN detail_rev IS NULL THEN 1 END) AS n_no_detail,
             COUNT(CASE WHEN matched THEN 1 END) AS n_matched_1pct,
             round(CAST(SUM(gap) AS DOUBLE) / COUNT(*), 9) AS mean_abs_gap
      FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  val queries: Map[String, Q] = Map(
    "q84_sole_blame" -> q84_sole_blame,
    "v09_reconcile"  -> v09_reconcile,
  )
  val oracles: Map[String, String] = Map(
    "q84_sole_blame" -> q84Sql,
    "v09_reconcile"  -> v09Sql,
  )
}
