package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Data-quality family, part 2. */
object Quality2 {
  type Q = (SparkSession, String) => DataFrame

  // ---- v08: schema/statistics drift contract between two cohorts ----
  // v04 measures DISTRIBUTION drift of one column (PSI); this is the
  // column-level data-contract audit across a schema: for each audited
  // column, per-cohort null fraction / mean / min / max and the deltas,
  // the report a feed owner diffs when a producer changes upstream.
  // Cohorts here are the deterministic halves o_orderkey % 2 (in
  // production: yesterday's load vs today's). Plan discipline is v05's:
  // ONE wide conditional aggregate over ONE scan computes every
  // (column, cohort, metric) cell — FILTER-style when() aggregates are
  // all map-side combinable, so the fact table is read once and shuffles
  // one row — then a constant-size stack unpivots to the tall report.
  // All doubles go through decimal sums (Stable discipline) and a final
  // 1e-9 round, so both engines agree bit-for-bit.
  val v08_schema_drift: Q = (s, d) => {
    val D = DecimalType(30, 6)
    val cols = Seq("o_custkey", "o_orderkey", "o_totalprice")
    val src = Tables.orders(s, d)
      .withColumn("__a", col("o_orderkey") % 2 === 0)
    def cell(c: String, a: Boolean): Seq[Column] = {
      val side = if (a) col("__a") else !col("__a")
      val v = when(side, col(c))
      val tag = if (a) "a" else "b"
      Seq(
        round(sum(v.cast(D)).cast("double") / count(v), 9).as(s"${c}__mean_$tag"),
        min(v).cast("double").as(s"${c}__min_$tag"),
        max(v).cast("double").as(s"${c}__max_$tag"),
        round(count(when(side && col(c).isNull, 1)).cast("double")
          / count(when(side, 1)), 9).as(s"${c}__nullfrac_$tag"))
    }
    val wide = src.agg(
      cell(cols.head, a = true).head,
      (cols.flatMap(c => cell(c, a = true) ++ cell(c, a = false)).tail): _*)
    val stacked = cols.flatMap { c =>
      Seq("mean", "min", "max", "nullfrac").map { m =>
        s"'$c', '$m', ${c}__${m}_a, ${c}__${m}_b"
      }
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.size * 4}, $stacked) AS (column_name, metric, val_a, val_b)"))
      .withColumn("delta", round(col("val_b") - col("val_a"), 9))
      .orderBy("column_name", "metric")
  }
  val v08Sql: String = {
    val cols = Seq("o_custkey", "o_orderkey", "o_totalprice")
    def cohort(c: String, cond: String) = Seq(
      s"round(CAST(SUM(CAST($c AS DECIMAL(30,6))) FILTER (WHERE $cond) AS DOUBLE)" +
        s" / COUNT($c) FILTER (WHERE $cond), 9)",
      s"CAST(MIN($c) FILTER (WHERE $cond) AS DOUBLE)",
      s"CAST(MAX($c) FILTER (WHERE $cond) AS DOUBLE)",
      s"round(CAST(COUNT(*) FILTER (WHERE $cond AND $c IS NULL) AS DOUBLE)" +
        s" / COUNT(*) FILTER (WHERE $cond), 9)")
    val rows = cols.flatMap { c =>
      val a = cohort(c, "o_orderkey % 2 = 0")
      val b = cohort(c, "o_orderkey % 2 <> 0")
      Seq("mean", "min", "max", "nullfrac").zipWithIndex.map { case (m, i) =>
        s"SELECT '$c' AS column_name, '$m' AS metric, ${a(i)} AS val_a, " +
          s"${b(i)} AS val_b FROM orders"
      }
    }
    s"""SELECT column_name, metric, val_a, val_b,
           round(val_b - val_a, 9) AS delta
       FROM (${rows.mkString(" UNION ALL ")})
       ORDER BY column_name, metric"""
  }

  // ---- v10: Benford first-digit audit (fabrication / corruption) ----
  // The forensic-accounting classic applied to feed QA: naturally
  // occurring money amounts follow Benford's law (P(d) = log10(1+1/d));
  // a feed whose first-digit histogram deviates sharply was truncated,
  // defaulted, synthesized, or unit-shifted upstream. One narrow map
  // derives the first significant digit ARITHMETICALLY (price -> exact
  // DECIMAL cents -> leading digit of the integer's decimal string —
  // no float log10, no engine-dependent double formatting), one
  // 9-row aggregate, and the total rides a broadcast scalar join —
  // a single fact-table scan at any corpus size. Expected shares are
  // 9 fixed literals (same parsed doubles both engines), so share and
  // deviation are bit-exact cross-engine.
  val v10_benford: Q = (s, d) => {
    val benford = "CAST(CASE first_digit " +
      "WHEN 1 THEN 0.301029996 WHEN 2 THEN 0.176091259 " +
      "WHEN 3 THEN 0.124938737 WHEN 4 THEN 0.096910013 " +
      "WHEN 5 THEN 0.079181246 WHEN 6 THEN 0.066946790 " +
      "WHEN 7 THEN 0.057991947 WHEN 8 THEN 0.051152522 " +
      "ELSE 0.045757491 END AS DOUBLE)"
    val digits = Tables.lineitem(s, d)
      .select((col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("cents"))
      .select(substring(col("cents").cast("string"), 1, 1).cast("int")
        .as("first_digit"))
      .groupBy("first_digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").as("tot"))
    digits.crossJoin(broadcast(total))
      .withColumn("share",
        round(col("n").cast("double") / col("tot").cast("double"), 9))
      .withColumn("expected", expr(benford))
      .withColumn("abs_dev", round(abs(col("share") - col("expected")), 9))
      .select("first_digit", "n", "share", "expected", "abs_dev")
      .orderBy("first_digit")
  }
  val v10Sql: String =
    """WITH c AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents
        FROM lineitem),
      dg AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INT)
                      AS first_digit, COUNT(*) AS n
             FROM c GROUP BY 1),
      t AS (SELECT SUM(n) AS tot FROM dg),
      sh AS (SELECT first_digit, n,
               round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 9) AS share,
               CAST(CASE first_digit
                 WHEN 1 THEN 0.301029996 WHEN 2 THEN 0.176091259
                 WHEN 3 THEN 0.124938737 WHEN 4 THEN 0.096910013
                 WHEN 5 THEN 0.079181246 WHEN 6 THEN 0.066946790
                 WHEN 7 THEN 0.057991947 WHEN 8 THEN 0.051152522
                 ELSE 0.045757491 END AS DOUBLE) AS expected
             FROM dg, t)
      SELECT first_digit, n, share, expected,
             round(abs(share - expected), 9) AS abs_dev
      FROM sh ORDER BY first_digit"""

  val queries: Map[String, Q] = Map(
    "v08_schema_drift" -> v08_schema_drift,
    "v10_benford"      -> v10_benford,
  )
  val oracles: Map[String, String] = Map(
    "v08_schema_drift" -> v08Sql,
    "v10_benford"      -> v10Sql,
  )
}
