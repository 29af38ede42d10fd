package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event analytics, part 2: within-window funnel conversion and
  * cumulative-distinct growth curves.
  */
object Events2 {
  type Q = (SparkSession, String) => DataFrame

  // ---- e06: funnel conversion within a time window ----
  // A 'view' converts if the same user purchases within the following
  // hour. The conversion test is an equi-join on user_id with a range
  // residual — shuffles only the two (already filtered) event slices on
  // user_id; the left_semi keeps each view at most once regardless of how
  // many purchases land in its window, so no post-join dedup is needed.
  val e06_funnel_conversion: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"), to_date(col("ts")).as("day"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val converted = views.join(purch,
      col("user_id") === col("p_user") &&
        col("p_ts") > col("ts") &&
        col("p_ts") <= col("ts") + expr("INTERVAL 1 HOUR"),
      "left_semi")
    val total = views.groupBy("day").agg(count(lit(1)).as("n_views"))
    val conv = converted.groupBy("day").agg(count(lit(1)).as("n_conv"))
    total.join(conv, Seq("day"), "left")
      .na.fill(0L, Seq("n_conv"))
      .withColumn("conv_rate", round(col("n_conv").cast("double") / col("n_views"), 9))
      .select("day", "n_views", "n_conv", "conv_rate")
      .orderBy("day")
  }
  val e06Sql: String =
    """WITH v AS (SELECT event_id, user_id, ts, CAST(ts AS DATE) AS day
               FROM events WHERE event_type = 'view'),
      p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
      c AS (SELECT DISTINCT v.event_id, v.day
            FROM v JOIN p ON v.user_id = p.user_id
                 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR),
      t AS (SELECT day, COUNT(*) AS n_views FROM v GROUP BY day),
      cc AS (SELECT day, COUNT(*) AS n_conv FROM c GROUP BY day)
      SELECT t.day, n_views, COALESCE(n_conv, 0) AS n_conv,
             round(CAST(COALESCE(n_conv, 0) AS DOUBLE) / n_views, 9) AS conv_rate
      FROM t LEFT JOIN cc ON t.day = cc.day ORDER BY t.day"""

  // ---- e07: cumulative distinct users (growth curve) ----
  // "Distinct users seen up to each day" without a per-day DISTINCT scan:
  // min(first-seen day) per user is one shuffle on user_id; the running
  // sum is a window over the handful of day rows. This is the scalable
  // formulation — a naive per-day COUNT(DISTINCT user) rescans the fact
  // table once per day.
  val e07_cumulative_distinct: Q = (s, d) => {
    val first = Tables.events(s, d)
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("day"))
    val perDay = first.groupBy("day").agg(count(lit(1)).as("n_new"))
    perDay.withColumn("cum_users",
        sum("n_new").over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("day", "n_new", "cum_users")
      .orderBy("day")
  }
  val e07Sql: String =
    """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id),
      p AS (SELECT day, COUNT(*) AS n_new FROM f GROUP BY day)
      SELECT day, n_new, CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
      FROM p ORDER BY day"""

  val queries: Map[String, Q] = Map(
    "e06_funnel_conversion"  -> e06_funnel_conversion,
    "e07_cumulative_distinct" -> e07_cumulative_distinct,
  )
  val oracles: Map[String, String] = Map(
    "e06_funnel_conversion"  -> e06Sql,
    "e07_cumulative_distinct" -> e07Sql,
  )
}
