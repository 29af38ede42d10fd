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
    // running sum over day-count rows — calendar-bounded, inside
    // GraftOps.boundedSingleGroup's explicit bounded partition
    val perDay = graft.api.GraftOps.boundedSingleGroup(
      first.groupBy("day").agg(count(lit(1)).as("n_new")))
    perDay.withColumn("cum_users",
        sum("n_new").over(Window.partitionBy("__g").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("day", "n_new", "cum_users")
      .orderBy("day")
  }
  val e07Sql: String =
    """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id),
      p AS (SELECT day, COUNT(*) AS n_new FROM f GROUP BY day)
      SELECT day, n_new, CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
      FROM p ORDER BY day"""

  // ---- e08: calendar gap-fill + forward fill (time-series resample) ----
  // Per user: daily value sums, expanded to that user's full [first, last]
  // calendar via sequence+explode (no driver-side calendar, no cross join
  // against a global date table), then last-observation-carried-forward
  // with an ignore-nulls running window. Partitioned by user — the window
  // never crosses executor boundaries after the one shuffle.
  val e08_gap_fill: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .filter(col("user_id") < 50)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(graft.Stable.dsum(col("value")).as("v"))
    val cal = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("user_id", "day"), "left")
      .withColumn("is_gap", col("v").isNull)
      .withColumn("v_filled", round(last("v", ignoreNulls = true).over(w), 4))
      .select("user_id", "day", "is_gap", "v_filled")
      .orderBy("user_id", "day")
  }
  val e08Sql: String =
    """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v
           FROM events WHERE user_id < 50 GROUP BY 1, 2),
      cal AS (SELECT user_id,
                CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
              FROM (SELECT user_id, min(day) d0, max(day) d1 FROM daily GROUP BY 1) t),
      j AS (SELECT c.user_id, c.day, d.v
            FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day)
      SELECT user_id, day, v IS NULL AS is_gap,
             round(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_filled
      FROM j ORDER BY user_id, day"""

  // ---- e09: sessionization via the NATIVE session_window operator ----
  // Same 30-minute-gap semantics as q27's lag+cumsum formulation, but
  // through Spark's built-in session-window aggregation (one shuffle on
  // user_id, sessions merged inside the agg operator — and the identical
  // code runs under Structured Streaming with state-store-backed session
  // merge). Oracle replicates the gap logic relationally.
  val e09_session_window: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), graft.Stable.dsum(col("value")).as("session_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), round(col("session_value"), 4).as("session_value"))
      .orderBy("user_id", "session_start")
  }
  // The oracle marks a session boundary whenever the previous event of the
  // same user is > 30 min older, then groups by the running boundary count.
  val e09Sql: String =
    """WITH x AS (SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS brk
           FROM events),
      g AS (SELECT user_id, ts, value,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM x)
      SELECT user_id, min(ts) AS session_start, COUNT(*) AS n_events,
             round(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 4) AS session_value
      FROM g GROUP BY user_id, sid ORDER BY user_id, session_start"""

  // ---- e10: trending metrics (day-over-day growth + 7-day moving avg) ----
  // The daily rollup is one shuffle on (event_type, day); the growth and
  // moving-average windows then run over the tiny aggregated table (days ×
  // event types), so the window stage costs nothing regardless of fact-table
  // size. Growth is a single double division per row (bit-identical across
  // engines); the moving average divides an exact BIGINT sum.
  val e10_trending: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val ma = w.rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("prev_n", lag("n", 1).over(w))
      .withColumn("dod_growth",
        round(col("n").cast("double") / col("prev_n") - 1.0, 9))
      .withColumn("ma7", round(avg(col("n")).over(ma), 9))
      .select("event_type", "day", "n", "prev_n", "dod_growth", "ma7")
      .orderBy("event_type", "day")
  }
  val e10Sql: String =
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
               FROM events GROUP BY 1, 2)
      SELECT event_type, day, n,
             lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n,
             round(CAST(n AS DOUBLE)
                   / lag(n) OVER (PARTITION BY event_type ORDER BY day) - 1.0, 9)
               AS dod_growth,
             round(avg(n) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 9) AS ma7
      FROM daily ORDER BY event_type, day"""

  val queries: Map[String, Q] = Map(
    "e06_funnel_conversion"  -> e06_funnel_conversion,
    "e07_cumulative_distinct" -> e07_cumulative_distinct,
    "e08_gap_fill"           -> e08_gap_fill,
    "e09_session_window"     -> e09_session_window,
    "e10_trending"           -> e10_trending,
  )
  val oracles: Map[String, String] = Map(
    "e06_funnel_conversion"  -> e06Sql,
    "e07_cumulative_distinct" -> e07Sql,
    "e08_gap_fill"           -> e08Sql,
    "e09_session_window"     -> e09Sql,
    "e10_trending"           -> e10Sql,
  )
}
