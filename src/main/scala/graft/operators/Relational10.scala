package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
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

  // ---- q80: MERGE upsert application ----
  // The Delta/Iceberg MERGE INTO semantics as one relational pass: apply
  // a change batch (updates + inserts + tombstone deletes) to a base
  // snapshot via ONE full-outer join on the key — matched+tombstone rows
  // drop, matched rows take the batch value, unmatched batch rows
  // insert, unmatched base rows carry over. q54 classifies changes; this
  // APPLIES them. One key-uniform shuffle, payloads ride it once;
  // exactly the plan a table-format MERGE compiles to when the whole
  // base partition set is touched.
  val q80_merge_apply: Q = (s, d) => {
    val base = Tables.orders(s, d).filter(col("o_orderkey") % 10 < 8)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    val batch = Tables.orders(s, d).filter(col("o_orderkey") % 10 > 5)
      .select(col("o_orderkey").as("bk"),
        (col("o_totalprice") * 1.1).as("bprice"),
        (col("o_orderkey") % 7 === 0).as("tombstone"))
    base.join(batch, col("k") === col("bk"), "full_outer")
      .filter(!coalesce(col("tombstone"), lit(false)))
      .select(
        coalesce(col("k"), col("bk")).as("k"),
        coalesce(col("bprice"), col("price")).as("price"),
        when(col("k").isNull, "inserted")
          .when(col("bk").isNull, "carried")
          .otherwise("updated").as("row_origin"))
      .orderBy("k")
  }
  val q80Sql: String =
    """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS price
                   FROM orders WHERE o_orderkey % 10 < 8),
      batch AS (SELECT o_orderkey AS bk, o_totalprice * 1.1 AS bprice,
                  o_orderkey % 7 = 0 AS tombstone
                FROM orders WHERE o_orderkey % 10 > 5)
      SELECT COALESCE(k, bk) AS k,
             COALESCE(bprice, price) AS price,
             CASE WHEN k IS NULL THEN 'inserted'
                  WHEN bk IS NULL THEN 'carried'
                  ELSE 'updated' END AS row_origin
      FROM base FULL OUTER JOIN batch ON k = bk
      WHERE NOT COALESCE(tombstone, false)
      ORDER BY k"""

  // ---- q81: multi-measure pivot ----
  // q11 pivots one measure; real report builds pivot SEVERAL (here
  // sum(quantity) and row count per return-flag column). Spark compiles
  // groupBy().pivot().agg(m1, m2) to ONE partial-agg pass with
  // measure×pivot-value conditional aggregates — the oracle states that
  // plan explicitly as FILTER-clause aggregates. Sums follow the Stable
  // decimal discipline.
  val q81_pivot_multi: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(Stable.dsum(col("l_quantity")).as("qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_linestatus")
  }
  val q81Sql: String = {
    def cell(f: String) =
      s"""CAST(SUM(CAST(l_quantity AS DECIMAL(30,6)))
            FILTER (WHERE l_returnflag = '$f') AS DOUBLE) AS "${f}_qty",
          COUNT(*) FILTER (WHERE l_returnflag = '$f') AS "${f}_cnt""""
    s"""SELECT l_linestatus, ${Seq("A", "N", "R").map(cell).mkString(", ")}
       FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""
  }

  // ---- q82: robust statistics (MAD + trimmed mean) ----
  // Outlier-resistant stats the mean/stddev family (q31) can't give:
  // per group, the median absolute deviation and the 10–90% trimmed
  // mean. Two passes over the fact table, each partial-agg friendly,
  // stitched by BROADCAST joins on the group-sized quantile table —
  // never a fact-side window. Exact-percentile discipline from q29;
  // the trimmed mean numerator is a Stable decimal sum.
  val q82_robust_stats: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select("l_returnflag", "l_quantity")
    val qs = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("med"),
        expr("percentile(l_quantity, 0.1)").as("lo"),
        expr("percentile(l_quantity, 0.9)").as("hi"))
    li.join(broadcast(qs), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(first("med").as("median"),
        expr("percentile(abs(l_quantity - med), 0.5)").as("mad"),
        Stable.dsum(when(col("l_quantity") >= col("lo")
            && col("l_quantity") <= col("hi"), col("l_quantity"))).as("trim_sum"),
        count(when(col("l_quantity") >= col("lo")
            && col("l_quantity") <= col("hi"), 1)).as("trim_n"))
      .select(col("l_returnflag"), col("median"), col("mad"),
        (col("trim_sum") / col("trim_n")).as("trimmed_mean"))
      .orderBy("l_returnflag")
  }
  val q82Sql: String =
    s"""WITH q AS (SELECT l_returnflag,
            quantile_cont(l_quantity, 0.5) AS med,
            quantile_cont(l_quantity, 0.1) AS lo,
            quantile_cont(l_quantity, 0.9) AS hi
          FROM lineitem GROUP BY l_returnflag)
      SELECT l.l_returnflag, any_value(med) AS median,
             quantile_cont(abs(l_quantity - med), 0.5) AS mad,
             ${Stable.sqlSum("CASE WHEN l_quantity >= lo AND l_quantity <= hi THEN l_quantity END")}
               / COUNT(CASE WHEN l_quantity >= lo AND l_quantity <= hi THEN 1 END)
               AS trimmed_mean
      FROM lineitem l JOIN q USING (l_returnflag)
      GROUP BY l.l_returnflag ORDER BY l_returnflag"""

  // ---- q83: higher moments (skewness / kurtosis) ----
  // Distribution-shape stats q31 stops short of. Spark's builtin
  // skewness()/kurtosis() stream double moments (order-dependent, not
  // reproducible cross-engine); here the power sums are EXACT — per-row
  // powers in double (bit-identical IEEE ops on both engines), each
  // cast to decimal for order-independent summation — and the closed
  // forms are rounded at 1e-9 (the q31/v06 discipline). One partial-agg
  // pass; population moments.
  val q83_higher_moments: Q = (s, d) => {
    val D = DecimalType(30, 6)
    val x = col("l_quantity")
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x.cast(D)).cast("double").as("s1"),
        sum((x * x).cast(D)).cast("double").as("s2"),
        sum((x * x * x).cast(D)).cast("double").as("s3"),
        sum((x * x * x * x).cast(D)).cast("double").as("s4"))
      .select(col("l_returnflag"), col("n"),
        round(col("s1") / col("n"), 9).as("mean"),
        round(expr("""(s3/n - 3*(s1/n)*(s2/n) + 2*pow(s1/n, 3))
            / pow(s2/n - pow(s1/n, 2), 1.5)"""), 9).as("skewness"),
        round(expr("""(s4/n - 4*(s1/n)*(s3/n) + 6*pow(s1/n, 2)*(s2/n)
              - 3*pow(s1/n, 4))
            / pow(s2/n - pow(s1/n, 2), 2) - 3"""), 9).as("kurtosis_excess"))
      .orderBy("l_returnflag")
  }
  val q83Sql: String =
    """WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s1,
          CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s2,
          CAST(SUM(CAST(l_quantity*l_quantity*l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s3,
          CAST(SUM(CAST(l_quantity*l_quantity*l_quantity*l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s4
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        round(s1/n, 9) AS mean,
        round((s3/n - 3*(s1/n)*(s2/n) + 2*pow(s1/n, 3))
            / pow(s2/n - pow(s1/n, 2), 1.5), 9) AS skewness,
        round((s4/n - 4*(s1/n)*(s3/n) + 6*pow(s1/n, 2)*(s2/n) - 3*pow(s1/n, 4))
            / pow(s2/n - pow(s1/n, 2), 2) - 3, 9) AS kurtosis_excess
      FROM m ORDER BY l_returnflag"""

  val queries: Map[String, Q] = Map(
    "q79_dim_build"     -> q79_dim_build,
    "q80_merge_apply"   -> q80_merge_apply,
    "q81_pivot_multi"   -> q81_pivot_multi,
    "q82_robust_stats"  -> q82_robust_stats,
    "q83_higher_moments" -> q83_higher_moments,
  )
  val oracles: Map[String, String] = Map(
    "q79_dim_build"     -> q79Sql,
    "q80_merge_apply"   -> q80Sql,
    "q81_pivot_multi"   -> q81Sql,
    "q82_robust_stats"  -> q82Sql,
    "q83_higher_moments" -> q83Sql,
  )
}
