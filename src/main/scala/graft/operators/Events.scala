package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Stable._
import graft.Tables

/** Event-stream analytics (batch form) — SURVEY.md §2. The streaming
  * variants of these plans live in [[graft.streaming.StreamOps]]; the
  * batch forms are oracle-checkable and share the same aggregation logic.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  // ---- e01: tumbling time-window aggregation ----
  val e01_tumbling_window: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(
        date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("window_start", "event_type")
  }
  val e01Sql: String =
    s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events, ${sqlSum("value")} AS total_value,
       COUNT(DISTINCT user_id) AS n_users
       FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""

  // ---- e02: per-user event-type transition (funnel edge) counts ----
  val e02_user_funnel: Q = (s, d) => {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("prev_type", lag("event_type", 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("prev_type", "next_type")
  }
  val e02Sql: String =
    """SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
      FROM (SELECT event_type,
              lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
            FROM events) t
      WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type ORDER BY prev_type, next_type"""

  // ---- e03: incremental aggregation (partial-agg merge) ----
  // The batch-incremental ETL pattern: aggregates computed on yesterday's
  // partition merge with today's by re-aggregating the partials — valid
  // because sum/count decompose. The oracle aggregates the full table
  // directly, proving partial+merge == direct. At 100 TB this is the
  // difference between reprocessing a day and reprocessing the archive.
  val e03_incremental_agg: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val cutoff = lit("2024-01-20").cast("timestamp")
    def partial(df: DataFrame): DataFrame = df
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 6))).as("v"))
    val old = partial(ev.filter(col("ts") < cutoff))
    val fresh = partial(ev.filter(col("ts") >= cutoff))
    old.unionByName(fresh)
      .groupBy("day", "event_type")
      .agg(sum("n").as("n_events"), sum("v").cast("double").as("total_value"))
      .orderBy("day", "event_type")
  }
  val e03Sql: String =
    s"""SELECT date_trunc('day', ts) AS day, event_type,
       COUNT(*) AS n_events, ${sqlSum("value")} AS total_value
       FROM events GROUP BY 1, 2 ORDER BY day, event_type"""

  // ---- e04: day-0 cohort retention matrix ----
  val e04_retention: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val firstDay = ev.groupBy("user_id")
      .agg(date_trunc("day", min("ts")).as("cohort_day"))
    ev.select(col("user_id"), date_trunc("day", col("ts")).as("active_day"))
      .distinct()
      // no broadcast() hint: the cohort table is USER-sized — small here,
      // but at 1B users a forced broadcast is the wrong plan. Unhinted,
      // Catalyst/AQE broadcasts while it fits and degrades to a shuffle
      // join keyed on user_id past that.
      .join(firstDay, "user_id")
      .withColumn("day_offset",
        datediff(col("active_day").cast("date"), col("cohort_day").cast("date")).cast("long"))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .filter(col("day_offset") <= 7)
      .orderBy("cohort_day", "day_offset")
  }
  val e04Sql: String =
    """WITH f AS (SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
                FROM events GROUP BY user_id),
      a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day FROM events)
      SELECT cohort_day,
             CAST(date_diff('day', CAST(cohort_day AS DATE), CAST(active_day AS DATE)) AS BIGINT) AS day_offset,
             COUNT(DISTINCT user_id) AS n_active
      FROM a JOIN f USING (user_id)
      WHERE date_diff('day', CAST(cohort_day AS DATE), CAST(active_day AS DATE)) <= 7
      GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""

  // ---- e05: sliding (hopping) windows ----
  // Spark's window(ts, 2h, 30m) assigns each event to the 4 overlapping
  // epoch-aligned windows; the oracle replicates the assignment with
  // integer epoch arithmetic (identical because both sides truncate the
  // nanos timestamps to the same microseconds).
  val e05_sliding_window: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")
  }
  val e05Sql: String =
    s"""SELECT window_start, event_type, COUNT(*) AS n_events,
       ${sqlSum("value")} AS total_value
       FROM (
         SELECT CAST(to_timestamp((epoch_us(ts) // 1800000000) * 1800 - k * 1800) AS TIMESTAMP) AS window_start,
                ts, event_type, value
         FROM events, (SELECT unnest(generate_series(0, 3)) AS k)
         WHERE ts < to_timestamp((epoch_us(ts) // 1800000000) * 1800 - k * 1800 + 7200))
       GROUP BY 1, 2 ORDER BY window_start, event_type"""

  val queries: Map[String, Q] = Map(
    "e05_sliding_window"  -> e05_sliding_window,
    "e04_retention"       -> e04_retention,
    "e01_tumbling_window" -> e01_tumbling_window,
    "e02_user_funnel"     -> e02_user_funnel,
    "e03_incremental_agg" -> e03_incremental_agg,
  )
  val oracles: Map[String, String] = Map(
    "e05_sliding_window"  -> e05Sql,
    "e04_retention"       -> e04Sql,
    "e01_tumbling_window" -> e01Sql,
    "e02_user_funnel"     -> e02Sql,
    "e03_incremental_agg" -> e03Sql,
  )
}
