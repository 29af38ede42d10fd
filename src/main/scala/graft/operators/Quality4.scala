package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Quality / audit family, part 4: numeric-precision forensics. */
object Quality4 {
  type Q = (SparkSession, String) => DataFrame

  // ---- v24: money-precision audit (the sub-cent "lost pennies" census) ----
  // The feed tripwire v05/v10/v14 don't cover: money columns carry an
  // implicit PRECISION CONTRACT (cents-exact), and the two bugs that
  // break it — an upstream unit shift (dollars column suddenly holding
  // raw cents → everything integer-valued) and sub-cent residue leaking
  // out of rate arithmetic (who rounds the discount?) — are invisible to
  // range/null/distribution checks because every individual value still
  // looks like a price. This census measures the contract directly: per
  // audited column, how many values are integer-valued / cents-exact /
  // finer-than-cents, plus the total sub-cent residue — the "lost
  // pennies" number a billing reconciliation chases. The derived
  // li_discounted lane (l_extendedprice·(1−l_discount)) is the
  // deliberate positive: raw feeds audit clean, the rate product shows
  // exactly the residue a naive cents-billing pipeline would drop.
  //
  // Engine shape: per table ONE scan; each row fans out to its audited
  // expressions via an in-row explode (bounded by the audit list, and
  // collapsed immediately by the map-side-combinable census aggregate),
  // the three lanes union into ONE grouped aggregate over a
  // column-count-sized frame. Nothing wide ever exceeds the audit list.
  //
  // Cross-engine exactness: every test runs on EXACT INTEGERS — the
  // double→DECIMAL(30,6) cast is the only rounding (deterministic: a
  // double never lands on a .5 boundary at 6 dp — Stable's argument),
  // then micro-units = |d6|·10⁶ as BIGINT, and integer/cents/sub-cent
  // classification is modular arithmetic. No round() modes, no double
  // thresholds; the one IEEE division at the end converts the exact
  // residue to dollars for humans.
  private def lanes(df: DataFrame, pairs: Seq[(String, Column)]): DataFrame =
    df.select(explode(array(pairs.map { case (n, c) =>
      struct(lit(n).as("col_name"),
        c.cast(DecimalType(30, 6)).as("d6")) }: _*)).as("x"))
      .select(col("x.col_name").as("col_name"), col("x.d6").as("d6"))

  val v24_money_precision: Q = (s, d) => {
    val li = lanes(Tables.lineitem(s, d), Seq(
      "l_extendedprice" -> col("l_extendedprice"),
      "li_discounted" ->
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
    val ord = lanes(Tables.orders(s, d),
      Seq("o_totalprice" -> col("o_totalprice")))
    val ev = lanes(Tables.events(s, d), Seq("event_value" -> col("value")))
    li.unionAll(ord).unionAll(ev)
      .withColumn("micros", (abs(col("d6")) * 1000000).cast("long"))
      .groupBy("col_name").agg(
        count(lit(1)).as("n_rows"),
        count(when(col("d6").isNull, 1)).as("n_null"),
        count(when(col("d6") < 0, 1)).as("n_negative"),
        count(when(col("micros") % 1000000 === 0, 1)).as("n_integer"),
        count(when(col("micros") % 10000 === 0, 1)).as("n_cents_exact"),
        count(when(col("micros") % 10000 =!= 0, 1)).as("n_subcent"),
        coalesce(sum(col("micros") % 10000), lit(0L)).as("subcent_micros"))
      .withColumn("subcent_value",
        round(col("subcent_micros").cast("double") / lit(1000000.0), 9))
      .orderBy("col_name")
  }
  val v24Sql: String =
    """WITH vals AS (
        SELECT 'l_extendedprice' AS col_name,
               CAST(l_extendedprice AS DECIMAL(30,6)) AS d6 FROM lineitem
        UNION ALL
        SELECT 'li_discounted',
               CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
                    AS DECIMAL(30,6)) FROM lineitem
        UNION ALL
        SELECT 'o_totalprice', CAST(o_totalprice AS DECIMAL(30,6)) FROM orders
        UNION ALL
        SELECT 'event_value', CAST(value AS DECIMAL(30,6)) FROM events),
      m AS (SELECT col_name, d6,
              CAST(abs(d6) * 1000000 AS BIGINT) AS micros FROM vals)
      SELECT col_name, COUNT(*) AS n_rows,
        COUNT(CASE WHEN d6 IS NULL THEN 1 END) AS n_null,
        COUNT(CASE WHEN d6 < 0 THEN 1 END) AS n_negative,
        COUNT(CASE WHEN micros % 1000000 = 0 THEN 1 END) AS n_integer,
        COUNT(CASE WHEN micros % 10000 = 0 THEN 1 END) AS n_cents_exact,
        COUNT(CASE WHEN micros % 10000 <> 0 THEN 1 END) AS n_subcent,
        CAST(COALESCE(SUM(micros % 10000), 0) AS BIGINT) AS subcent_micros,
        round(CAST(COALESCE(SUM(micros % 10000), 0) AS DOUBLE)
              / CAST(1000000.0 AS DOUBLE), 9) AS subcent_value
      FROM m GROUP BY col_name ORDER BY col_name"""

  // ---- v26: duplicate-payment audit (same payer, same amount, days apart) ----
  // The oldest finance-audit query there is: two orders from the SAME
  // customer for the IDENTICAL amount within a week are, at minimum, a
  // review queue (double-submission, retry bugs, fraud). Exact dedup
  // (d01) only sees identical ROWS; q89 suppresses same-type telemetry
  // re-fires by time alone — neither catches "same payer + same amount,
  // different order, 3 days apart", which needs the (payer, amount)
  // blocked pair join.
  //
  // Engine shape: the self-join is BLOCKED on the payer key, so pair
  // expansion is bounded by per-payer order count² (single digits per
  // month for real payers — a hot payer block is itself a finding),
  // never orders²; the NEAR-identical-amount band (relative diff < 1% —
  // real double submissions differ by fees/rounding, exact equality
  // catches nothing, measured: zero exact repeats in this corpus) and
  // the ≤30-day window are post-join filters. At 100 TB the amount
  // band becomes a second join key via the standard banded-bucket trick
  // (bucket width = band, probe adjacent buckets) — stated, not needed
  // at payer-bounded block sizes. Top-20 panel via
  // TakeOrderedAndProject on a total order; the total pair count rides
  // one broadcast scalar.
  //
  // Exactness: the band test is fixed-parenthesization IEEE on the
  // parquet-stored doubles; day diffs are exact integers; the output
  // amount-gap is rounded 1e-9.
  val v26_dup_payments: Q = (s, d) => {
    val o = Tables.orders(s, d).select(
      col("o_custkey").as("cust"), col("o_orderkey").as("ok"),
      col("o_totalprice").as("amount"), to_date(col("o_orderdate")).as("day"))
    val pairs = o.as("a")
      .join(o.as("b"),
        col("a.cust") === col("b.cust") && col("a.ok") < col("b.ok"))
      .filter(abs(col("a.amount") - col("b.amount"))
        / greatest(col("a.amount"), col("b.amount")) < 0.01)
      .select(col("a.cust").as("cust"), col("a.ok").as("key_a"),
        col("b.ok").as("key_b"), col("a.amount").as("amount_a"),
        round(abs(col("a.amount") - col("b.amount")), 9).as("amount_gap"),
        abs(datediff(col("b.day"), col("a.day"))).cast("long")
          .as("days_apart"))
      .filter(col("days_apart") <= 30)
    val tot = pairs.agg(count(lit(1)).as("n_suspect_pairs"))
    pairs.orderBy(col("days_apart"), col("cust"), col("key_a"), col("key_b"))
      .limit(20)
      .crossJoin(broadcast(tot))
      .orderBy(col("days_apart"), col("cust"), col("key_a"), col("key_b"))
  }
  val v26Sql: String =
    """WITH o AS (SELECT o_custkey AS cust, o_orderkey AS ok,
               o_totalprice AS amount,
               CAST(o_orderdate AS DATE) AS day FROM orders),
      p AS (SELECT a.cust, a.ok AS key_a, b.ok AS key_b,
              a.amount AS amount_a,
              round(abs(a.amount - b.amount), 9) AS amount_gap,
              CAST(abs(b.day - a.day) AS BIGINT) AS days_apart
            FROM o a JOIN o b ON a.cust = b.cust AND a.ok < b.ok
            WHERE abs(a.amount - b.amount)
                    / greatest(a.amount, b.amount) < 0.01
              AND abs(b.day - a.day) <= 30),
      t AS (SELECT COUNT(*) AS n_suspect_pairs FROM p)
      SELECT cust, key_a, key_b, amount_a, amount_gap, days_apart,
             n_suspect_pairs
      FROM (SELECT * FROM p ORDER BY days_apart, cust, key_a, key_b
            LIMIT 20) s, t
      ORDER BY days_apart, cust, key_a, key_b"""

  val queries: Map[String, Q] = Map(
    "v24_money_precision" -> v24_money_precision,
    "v26_dup_payments"    -> v26_dup_payments,
  )
  val oracles: Map[String, String] = Map(
    "v24_money_precision" -> v24Sql,
    "v26_dup_payments"    -> v26Sql,
  )
}
