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

  // ---- v27: zone-map skipping audit (is this layout worth anything?) ----
  // The question behind every Delta/Iceberg OPTIMIZE decision, answered
  // from the data instead of guessed: given a partition scheme (order
  // month here) and its per-partition min/max zone maps, what fraction
  // of partitions can a representative predicate SKIP? A date-
  // correlated column (orderkey — keys roughly follow time) skips well;
  // a value uncorrelated with layout (totalprice — every month spans
  // the full price range) skips nothing, and THAT contrast is the
  // measured argument for re-clustering (q87's z-order) or a different
  // partition key. q105 sizes broadcasts/shuffles; q87 audits an
  // existing interleave; this one scores the layout a table already
  // has — the pre-flight for file skipping.
  //
  // Engine shape: ONE combinable per-partition zone-map aggregate at
  // fact scale, then a literal predicate table crossed with the
  // partition-count-sized zone frame (metadata × metadata). Exactness:
  // skippability is interval disjointness on exact stored values —
  // integer keys exactly, double prices compared bit-for-bit with
  // fixed literals; counts exact, one IEEE division per rate.
  val v27_skipping_audit: Q = (s, d) => {
    val zm = Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
        .as("part"))
      .agg(count(lit(1)).as("n_rows"),
        min("o_totalprice").as("min_p"), max("o_totalprice").as("max_p"),
        min("o_orderkey").as("min_k"), max("o_orderkey").as("max_k"),
        min(datediff(col("o_orderdate").cast("date"), lit("1970-01-01")))
          .as("min_d"),
        max(datediff(col("o_orderdate").cast("date"), lit("1970-01-01")))
          .as("max_d"))
    // (predicate label, column kind, lo, hi) — a closed probe interval;
    // skippable iff [lo, hi] ∩ [zone min, zone max] = ∅. Dates probe in
    // epoch days; key probes are corpus-range fractions.
    val preds = s.createDataFrame(Seq(
      ("date in 1996", "date", 9496.0, 9861.0),
      ("date 1998-07", "date", 10408.0, 10438.0),
      ("price > 400000", "price", 400000.0, Double.MaxValue),
      ("key in first 5%", "key", 0.0, 0.05))).toDF("pred", "kind", "lo", "hi")
    val bounds = Tables.orders(s, d)
      .agg(min("o_orderkey").as("k0"), max("o_orderkey").as("k1"))
    val scored = zm.crossJoin(broadcast(preds)).crossJoin(broadcast(bounds))
      .withColumn("plo", when(col("kind") === "key",
        col("k0") + col("lo") * (col("k1") - col("k0"))).otherwise(col("lo")))
      .withColumn("phi", when(col("kind") === "key",
        col("k0") + col("hi") * (col("k1") - col("k0"))).otherwise(col("hi")))
      .withColumn("zlo", when(col("kind") === "price", col("min_p"))
        .when(col("kind") === "date", col("min_d").cast("double"))
        .otherwise(col("min_k").cast("double")))
      .withColumn("zhi", when(col("kind") === "price", col("max_p"))
        .when(col("kind") === "date", col("max_d").cast("double"))
        .otherwise(col("max_k").cast("double")))
      .withColumn("skippable", col("zhi") < col("plo") || col("zlo") > col("phi"))
    scored.groupBy("pred").agg(
      count(lit(1)).as("n_partitions"),
      count(when(col("skippable"), 1)).as("n_skippable"),
      coalesce(sum(when(!col("skippable"), col("n_rows"))), lit(0L))
        .as("rows_scanned"))
      .withColumn("skip_rate",
        round(col("n_skippable").cast("double")
          / col("n_partitions").cast("double"), 9))
      .orderBy("pred")
  }
  val v27Sql: String =
    """WITH zm AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
               AS part, COUNT(*) AS n_rows,
               MIN(o_totalprice) AS min_p, MAX(o_totalprice) AS max_p,
               MIN(o_orderkey) AS min_k, MAX(o_orderkey) AS max_k,
               MIN(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS min_d,
               MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS max_d
             FROM orders GROUP BY 1),
      b AS (SELECT MIN(o_orderkey) AS k0, MAX(o_orderkey) AS k1 FROM orders),
      preds(pred, kind, lo, hi) AS (VALUES
        ('date in 1996', 'date', CAST(9496.0 AS DOUBLE),
         CAST(9861.0 AS DOUBLE)),
        ('date 1998-07', 'date', CAST(10408.0 AS DOUBLE),
         CAST(10438.0 AS DOUBLE)),
        ('price > 400000', 'price', CAST(400000.0 AS DOUBLE),
         CAST(1.7976931348623157e308 AS DOUBLE)),
        ('key in first 5%', 'key', CAST(0.0 AS DOUBLE),
         CAST(0.05 AS DOUBLE))),
      sc AS (SELECT pred, n_rows,
               CASE WHEN kind = 'key' THEN k0 + lo * (k1 - k0)
                    ELSE lo END AS plo,
               CASE WHEN kind = 'key' THEN k0 + hi * (k1 - k0)
                    ELSE hi END AS phi,
               CASE WHEN kind = 'price' THEN min_p
                    WHEN kind = 'date' THEN CAST(min_d AS DOUBLE)
                    ELSE CAST(min_k AS DOUBLE) END AS zlo,
               CASE WHEN kind = 'price' THEN max_p
                    WHEN kind = 'date' THEN CAST(max_d AS DOUBLE)
                    ELSE CAST(max_k AS DOUBLE) END AS zhi
             FROM zm CROSS JOIN preds CROSS JOIN b)
      SELECT pred, COUNT(*) AS n_partitions,
        COUNT(CASE WHEN zhi < plo OR zlo > phi THEN 1 END) AS n_skippable,
        CAST(COALESCE(SUM(CASE WHEN NOT (zhi < plo OR zlo > phi)
              THEN n_rows END), 0) AS BIGINT) AS rows_scanned,
        round(CAST(COUNT(CASE WHEN zhi < plo OR zlo > phi THEN 1 END)
              AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS skip_rate
      FROM sc GROUP BY pred ORDER BY pred"""

  // ---- v29: contingency cell residuals (the drill-down of v15's χ²) ----
  // v15 answers "are these two dimensions independent?" with ONE number;
  // when it fires, the first question is WHICH cells — and that is the
  // standardized residual r = (o − e)/√e per cell, the classic
  // post-hoc of a χ² test: |r| > 3 marks a (lang, source) combination
  // with far more or fewer documents than independence predicts (a
  // source that only crawls one language, a language shard that lost a
  // feed). The actionable complement of the global test.
  //
  // Engine shape: ONE combinable (lang, source) cell count at fact
  // scale; row totals, column totals and N re-aggregate from CELLS
  // (v15's discipline — never a second fact pass); expected counts and
  // residuals are fixed IEEE arithmetic on exact integers, rounded
  // 1e-9; the |r| > 3 flag compares bit-identical doubles.
  val v29_cell_residuals: Q = (s, d) => {
    val cells = Tables.documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
    val rowT = cells.groupBy("lang").agg(sum("n").as("row_n"))
    val colT = cells.groupBy("source").agg(sum("n").as("col_n"))
    val tot = cells.agg(sum("n").as("tot_n"))
    cells.join(broadcast(rowT), "lang").join(broadcast(colT), "source")
      .crossJoin(broadcast(tot))
      .withColumn("expected",
        col("row_n").cast("double") * col("col_n").cast("double")
          / col("tot_n").cast("double"))
      .withColumn("residual",
        (col("n").cast("double") - col("expected")) / sqrt(col("expected")))
      .select(col("lang"), col("source"), col("n"),
        round(col("expected"), 9).as("expected"),
        round(col("residual"), 9).as("residual"),
        (abs(col("residual")) > 3.0).as("anomalous"))
      .orderBy("lang", "source")
  }
  val v29Sql: String =
    """WITH cells AS (SELECT lang, source, COUNT(*) AS n FROM documents
             GROUP BY 1, 2),
      rt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS row_n FROM cells
             GROUP BY 1),
      ct AS (SELECT source, CAST(SUM(n) AS BIGINT) AS col_n FROM cells
             GROUP BY 1),
      t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot_n FROM cells),
      e AS (SELECT cells.lang AS lang, cells.source AS source, n,
              CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                / CAST(tot_n AS DOUBLE) AS expected
            FROM cells JOIN rt ON cells.lang = rt.lang
              JOIN ct ON cells.source = ct.source CROSS JOIN t)
      SELECT lang, source, n, round(expected, 9) AS expected,
        round((CAST(n AS DOUBLE) - expected) / sqrt(expected), 9)
          AS residual,
        abs((CAST(n AS DOUBLE) - expected) / sqrt(expected)) > 3.0
          AS anomalous
      FROM e ORDER BY lang, source"""

  val queries: Map[String, Q] = Map(
    "v24_money_precision" -> v24_money_precision,
    "v26_dup_payments"    -> v26_dup_payments,
    "v27_skipping_audit"  -> v27_skipping_audit,
    "v29_cell_residuals"  -> v29_cell_residuals,
  )
  val oracles: Map[String, String] = Map(
    "v24_money_precision" -> v24Sql,
    "v26_dup_payments"    -> v26Sql,
    "v27_skipping_audit"  -> v27Sql,
    "v29_cell_residuals"  -> v29Sql,
  )
}
