package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Stable, Tables}

/** Event analytics, part 5. */
object Events5 {
  type Q = (SparkSession, String) => DataFrame

  // ---- e22: conversion-lag distribution (time-to-convert) ----
  // e12 answers WHICH touch gets credit; this answers HOW LONG users
  // take between the attributed view and the purchase — the number
  // attribution windows and retargeting budgets are tuned against.
  // Plan: e12's running conditional-max window attaches each purchase's
  // latest prior view in the ONE user-keyed sort shuffle (no
  // purchases×views join), lag is exact integer-microsecond arithmetic
  // divided once into seconds, and the day rollup computes exact
  // interpolated percentiles (q29 discipline) + a decimal-exact mean
  // over the conversions-sized table. At 100 TB the only fact-wide
  // stage is the same single window shuffle e12 already pays.
  val e22_conversion_lag: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select("event_id", "user_id", "ts", "event_type")
      .withColumn("view_ts",
        max(when(col("event_type") === "view", col("ts"))).over(w))
      .filter(col("event_type") === "purchase" && col("view_ts").isNotNull)
      .withColumn("lag_us", unix_micros(col("ts")) - unix_micros(col("view_ts")))
      .filter(col("lag_us") <= 86400000000L) // convert within 24h
      .withColumn("lag_s", col("lag_us").cast("double") / lit(1000000.0))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_conversions"),
        expr("percentile(lag_s, 0.5)").as("lag_p50_s"),
        expr("percentile(lag_s, 0.9)").as("lag_p90_s"),
        round(Stable.davg(col("lag_s")), 9).as("lag_mean_s"))
      .orderBy("day")
  }
  val e22Sql: String =
    s"""WITH a AS (SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_ts
           FROM events),
      c AS (SELECT CAST(ts AS DATE) AS day,
                   CAST(epoch_us(ts) - epoch_us(view_ts) AS DOUBLE) / 1000000.0
                     AS lag_s
            FROM a
            WHERE event_type = 'purchase' AND view_ts IS NOT NULL
              AND epoch_us(ts) - epoch_us(view_ts) <= 86400000000)
      SELECT day, COUNT(*) AS n_conversions,
             quantile_cont(lag_s, 0.5) AS lag_p50_s,
             quantile_cont(lag_s, 0.9) AS lag_p90_s,
             round(${Stable.sqlAvg("lag_s")}, 9) AS lag_mean_s
      FROM c GROUP BY day ORDER BY day"""

  val queries: Map[String, Q] = Map(
    "e22_conversion_lag" -> e22_conversion_lag,
  )
  val oracles: Map[String, String] = Map(
    "e22_conversion_lag" -> e22Sql,
  )
}
