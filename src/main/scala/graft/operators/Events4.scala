package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event analytics, part 4: sequence/path mining. */
object Events4 {
  type Q = (SparkSession, String) => DataFrame

  // ---- e18: top event-type paths (3-step sequences) ----
  // Clickstream path analysis: the most common ordered 3-event
  // sequences across users (what do people DO in what order). One
  // window shuffle keyed by user_id (lead() twice over the per-user
  // timeline — consecutive steps, no self-join), then a partial-agg
  // count over the tiny path vocabulary and a top-10. The user-keyed
  // window is the natural partitioning at scale: each user's timeline
  // is one partition-local sequence; path counting is map-side
  // combinable over ≤ |event_types|³ keys.
  val e18_path_analysis: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("s2", lead("event_type", 1).over(w))
      .withColumn("s3", lead("event_type", 2).over(w))
      .filter(col("s2").isNotNull && col("s3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("s2").as("step2"), col("s3").as("step3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("step1"), col("step2"), col("step3"))
      .limit(10)
  }
  val e18Sql: String =
    """WITH seq AS (SELECT event_type AS step1,
            lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step2,
            lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step3
          FROM events)
      SELECT step1, step2, step3, COUNT(*) AS n_paths
      FROM seq WHERE step2 IS NOT NULL AND step3 IS NOT NULL
      GROUP BY 1, 2, 3
      ORDER BY n_paths DESC, step1, step2, step3 LIMIT 10"""

  // ---- e19: session-level quality rollup ----
  // The session KPI layer on top of q27's gap sessionization: per day,
  // session count, bounce rate (single-event sessions), mean events and
  // mean duration per session. The sessionization window is the only
  // fact-table-wide stage (shared with q27 — same plan prefix); the
  // rollup aggregates the much smaller session table on the day key.
  // All inputs to the ratios are exact integers (counts, microsecond
  // longs), so the final single IEEE divisions are engine-exact.
  val e19_session_stats: Q = (s, d) => {
    val sessions = Relational2.q27_sessionize(s, d)
    sessions
      .withColumn("day", to_date(col("session_start")))
      .withColumn("dur_us",
        (unix_micros(col("session_end")) - unix_micros(col("session_start"))))
      .groupBy("day")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounce"),
        sum("n_events").as("total_events"),
        sum("dur_us").as("total_dur_us"))
      .select(col("day"), col("n_sessions"), col("n_bounce"),
        (col("n_bounce").cast("double") / col("n_sessions")).as("bounce_rate"),
        (col("total_events").cast("double") / col("n_sessions")).as("avg_events"),
        (col("total_dur_us").cast("double") / col("n_sessions") / lit(1000000.0))
          .as("avg_duration_s"))
      .orderBy("day")
  }
  val e19Sql: String =
    """WITH sess AS (
        SELECT user_id, session_id, COUNT(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM (
          SELECT user_id, ts,
            CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM (
            SELECT user_id, event_id, ts,
              CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
            FROM events) f) g
        GROUP BY user_id, session_id),
      d AS (SELECT CAST(session_start AS DATE) AS day,
              n_events,
              epoch_us(session_end) - epoch_us(session_start) AS dur_us
            FROM sess)
      SELECT day, COUNT(*) AS n_sessions,
             CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
             CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS bounce_rate,
             CAST(sum(n_events) AS DOUBLE) / COUNT(*) AS avg_events,
             CAST(sum(dur_us) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_duration_s
      FROM d GROUP BY day ORDER BY day"""

  // ---- e20: event-time lateness audit (watermark design) ----
  // The number that sets a streaming watermark: how late does data
  // actually arrive? Arrival order proxy is event_id (monotone ingest
  // id); per feed, the running event-time high-watermark (one
  // cumulative-max window, keyed by the feed — the same partitioning a
  // per-feed stream would have) gives each event's lateness =
  // watermark − ts. Report: late fraction, max and p95 lateness per
  // feed — read directly as the withWatermark() bound that would keep
  // ≥95% of the data. Lateness values are exact integer microseconds;
  // p95 interpolation follows the q29 exact-percentile discipline.
  val e20_lateness_audit: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, d)
      .select(col("event_type"), col("event_id"), col("ts"))
      .withColumn("late_us",
        unix_micros(max("ts").over(w)) - unix_micros(col("ts")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
        max("late_us").as("max_late_us"),
        expr("percentile(late_us, 0.95)").as("p95_late_us"))
      .select(col("event_type"), col("n_events"), col("n_late"),
        (col("n_late").cast("double") / col("n_events")).as("late_frac"),
        col("max_late_us"), col("p95_late_us"))
      .orderBy("event_type")
  }
  val e20Sql: String =
    """WITH l AS (SELECT event_type,
            epoch_us(max(ts) OVER (PARTITION BY event_type ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              - epoch_us(ts) AS late_us
          FROM events)
      SELECT event_type, COUNT(*) AS n_events,
             CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
             CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS late_frac,
             max(late_us) AS max_late_us,
             quantile_cont(late_us, 0.95) AS p95_late_us
      FROM l GROUP BY event_type ORDER BY event_type"""

  // ---- e21: cohort lifetime-value (LTV) curve ----
  // e04's retention matrix counts WHO comes back; the LTV curve sums
  // WHAT they're worth: cumulative value per cohort by days since
  // signup, per-user average. Plan: per-user day rollup (one partial
  // agg), broadcast the user-sized cohort table, aggregate the
  // cohort×offset matrix (bounded output), then one running-sum window
  // over that matrix — never over the fact table. Value sums follow the
  // Stable decimal discipline so cumulative amounts are engine-exact.
  val e21_cohort_ltv: Q = (s, d) => {
    import graft.Stable
    val ev = Tables.events(s, d)
    val firstDay = ev.groupBy("user_id")
      .agg(date_trunc("day", min("ts")).as("cohort_day"))
    val cohortSize = firstDay.groupBy("cohort_day")
      .agg(count(lit(1)).as("n_users"))
    val daily = ev
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"), col("value"))
      // unhinted join: the cohort table is USER-sized (see e04) — AQE
      // broadcasts while it fits, shuffles on user_id past that
      .join(firstDay, "user_id")
      .withColumn("day_offset",
        datediff(col("day").cast("date"), col("cohort_day").cast("date")).cast("long"))
      .filter(col("day_offset") <= 7)
      .groupBy("cohort_day", "day_offset")
      .agg(sum(col("value").cast("decimal(30,6)")).as("day_value"))
    val w = Window.partitionBy("cohort_day").orderBy("day_offset")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("cum_value", sum("day_value").over(w).cast("double"))
      .join(broadcast(cohortSize), "cohort_day") // day-count-sized: always tiny
      .select(col("cohort_day"), col("day_offset"),
        col("day_value").cast("double").as("day_value"),
        col("cum_value"),
        (col("cum_value") / col("n_users")).as("ltv_per_user"))
      .orderBy("cohort_day", "day_offset")
  }
  val e21Sql: String =
    """WITH f AS (SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
                FROM events GROUP BY user_id),
      cs AS (SELECT cohort_day, COUNT(*) AS n_users FROM f GROUP BY cohort_day),
      daily AS (SELECT cohort_day,
            CAST(date_diff('day', CAST(cohort_day AS DATE),
                 CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS day_offset,
            SUM(CAST(value AS DECIMAL(30,6))) AS day_value
          FROM events e JOIN f USING (user_id)
          WHERE date_diff('day', CAST(cohort_day AS DATE),
                 CAST(date_trunc('day', ts) AS DATE)) <= 7
          GROUP BY 1, 2),
      cum AS (SELECT cohort_day, day_offset,
            CAST(day_value AS DOUBLE) AS day_value,
            CAST(SUM(day_value) OVER (PARTITION BY cohort_day ORDER BY day_offset
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_value
          FROM daily)
      SELECT cohort_day, day_offset, day_value, cum_value,
             cum_value / n_users AS ltv_per_user
      FROM cum JOIN cs USING (cohort_day)
      ORDER BY cohort_day, day_offset"""

  val queries: Map[String, Q] = Map(
    "e18_path_analysis" -> e18_path_analysis,
    "e19_session_stats" -> e19_session_stats,
    "e20_lateness_audit" -> e20_lateness_audit,
    "e21_cohort_ltv"    -> e21_cohort_ltv,
  )
  val oracles: Map[String, String] = Map(
    "e18_path_analysis" -> e18Sql,
    "e19_session_stats" -> e19Sql,
    "e20_lateness_audit" -> e20Sql,
    "e21_cohort_ltv"    -> e21Sql,
  )
}
