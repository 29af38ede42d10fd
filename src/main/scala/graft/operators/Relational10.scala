package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Stable, Tables}

/** Relational / ETL core, part 10: warehouse-build verbs. */
object Relational10 {
  type Q = (SparkSession, String) => DataFrame

  // ---- q79: surrogate-key dimension build + fact conformance ----
  // The classic warehouse-ETL step: build a conformed customer
  // dimension with a CONTENT-DERIVED surrogate key (md5 of the natural
  // key + change-tracked attributes — deterministic across runs and
  // clusters, unlike monotonically_increasing_id, and stable input for
  // SCD2 change detection), then conform the fact table to it. The
  // dimension is nation⋈customer with nation broadcast (dims ≪ fact);
  // the fact rollup aggregates FIRST on the natural key (partial-agg
  // friendly) and joins the customer-sized result to the dimension —
  // the fact table itself never shuffles on the wide dim row.
  val q79_dim_build: Q = (s, d) => {
    val dim = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select(
        md5(concat_ws("|", col("c_custkey"), col("c_name"), col("n_name")))
          .as("customer_sk"),
        col("c_custkey"), col("c_name"), col("n_name"))
    val facts = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        Stable.dsum(col("o_totalprice")).as("total_spend"))
    dim.join(facts, col("c_custkey") === col("o_custkey"), "left")
      .select(col("customer_sk"), col("c_custkey"), col("n_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total_spend"), lit(0.0)).as("total_spend"))
      .orderBy("customer_sk")
  }
  val q79Sql: String =
    s"""WITH dim AS (SELECT
            md5(concat_ws('|', c_custkey, c_name, n_name)) AS customer_sk,
            c_custkey, c_name, n_name
          FROM customer JOIN nation ON c_nationkey = n_nationkey),
      f AS (SELECT o_custkey, COUNT(*) AS n_orders,
            ${Stable.sqlSum("o_totalprice")} AS total_spend
          FROM orders GROUP BY o_custkey)
      SELECT customer_sk, c_custkey, n_name,
             COALESCE(n_orders, 0) AS n_orders,
             COALESCE(total_spend, 0.0) AS total_spend
      FROM dim LEFT JOIN f ON c_custkey = o_custkey
      ORDER BY customer_sk"""

  val queries: Map[String, Q] = Map(
    "q79_dim_build" -> q79_dim_build,
  )
  val oracles: Map[String, String] = Map(
    "q79_dim_build" -> q79Sql,
  )
}
