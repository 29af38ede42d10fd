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

  val queries: Map[String, Q] = Map(
    "v08_schema_drift" -> v08_schema_drift,
  )
  val oracles: Map[String, String] = Map(
    "v08_schema_drift" -> v08Sql,
  )
}
