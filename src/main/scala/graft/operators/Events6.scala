package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event analytics, part 6: engagement-health metrics. */
object Events6 {
  type Q = (SparkSession, String) => DataFrame

  // ---- e28: DAU/MAU stickiness ratio per month ----
  // The canonical engagement-health KPI: what fraction of a month's
  // users show up on an average day. Both inputs are distinct-user
  // counts — (day, user) and (month, user) — so each side is a
  // two-phase distinct aggregate with map-side partials; the shuffle
  // width is bounded by ACTIVE PAIRS, not raw events, and the final
  // join runs on a months-sized frame. The ratio divides exact int64
  // counts in a fixed order (sum_dau / n_days / mau — three IEEE ops
  // on exact integers), so the result is bit-identical cross-engine.
  // At 100 TB nothing here widens: the fact-scale stages are the two
  // pair-distinct aggregates, both combinable.
  val e28_stickiness: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val daily = ev.groupBy("day")
      .agg(count_distinct(col("user_id")).as("dau"))
    val monthly = ev.groupBy(trunc(col("day"), "month").as("month"))
      .agg(count_distinct(col("user_id")).as("mau"))
    daily.groupBy(trunc(col("day"), "month").as("month"))
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
      .join(monthly, "month")
      .withColumn("stickiness",
        round(col("sum_dau").cast("double") / col("n_days").cast("double")
          / col("mau").cast("double"), 9))
      .select("month", "n_days", "sum_dau", "mau", "stickiness")
      .orderBy("month")
  }
  val e28Sql: String =
    """WITH ev AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      daily AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ev GROUP BY day),
      monthly AS (SELECT date_trunc('month', day) AS month,
                         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
                  FROM ev GROUP BY 1),
      dm AS (SELECT date_trunc('month', day) AS month,
                    CAST(COUNT(*) AS BIGINT) AS n_days,
                    CAST(SUM(dau) AS BIGINT) AS sum_dau
             FROM daily GROUP BY 1)
      SELECT dm.month, n_days, sum_dau, mau,
             round(CAST(sum_dau AS DOUBLE) / CAST(n_days AS DOUBLE)
                   / CAST(mau AS DOUBLE), 9) AS stickiness
      FROM dm JOIN monthly ON dm.month = monthly.month
      ORDER BY dm.month"""

  // ---- e29: dormancy reactivation (win-back detection) ----
  // Users who come back after a dormancy — the audience every win-back
  // campaign is sized on, and the complement of churn. One (user, day)
  // distinct pass collapses events to active days, then a single lag()
  // in the user-keyed sort window finds each user's gap to their
  // previous active day — the same one-shuffle sequence discipline as
  // e12/e22/e24 (never an active-days self-join). The monthly rollup
  // counts reactivation events, distinct reactivated users, and the
  // mean dormancy length (exact int day-diffs, one IEEE division).
  // Fact-scale stages: the pair-distinct and the user-keyed window —
  // both the minimum for the semantics. The dormancy threshold is an
  // operator PARAMETER; production uses 30 days, but this corpus spans
  // exactly 30 days with max observed gap 6, so the registered query
  // pins gap > 2 (the q89 honesty rule: thresholds are corpus facts).
  val e29_reactivation: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("day")
    Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("prev", lag(col("day"), 1).over(w))
      .withColumn("gap_days", datediff(col("day"), col("prev")).cast("long"))
      .filter(col("gap_days") > 2)
      .groupBy(trunc(col("day"), "month").as("month"))
      .agg(count(lit(1)).as("n_reactivations"),
        count_distinct(col("user_id")).as("n_users"),
        round(sum(col("gap_days")).cast("double")
          / count(lit(1)).cast("double"), 9).as("mean_dormancy_days"))
      .orderBy("month")
  }
  val e29Sql: String =
    """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      g AS (SELECT user_id, day,
                   date_diff('day',
                     lag(day) OVER (PARTITION BY user_id ORDER BY day),
                     day) AS gap_days
            FROM a)
      SELECT date_trunc('month', day) AS month,
             CAST(COUNT(*) AS BIGINT) AS n_reactivations,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             round(CAST(SUM(gap_days) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS mean_dormancy_days
      FROM g WHERE gap_days > 2
      GROUP BY 1 ORDER BY month"""

  // ---- e30: Gini coefficient of event concentration per type ----
  // How concentrated is each event type on its heaviest users? The
  // classic inequality measure, computed in the 100 TB shape: the only
  // fact-scale stage is the (type, user) count (combinable); then
  // counts-of-counts collapses users to (type, x, multiplicity) — at
  // most types x distinct-count-values rows, metadata-sized at any
  // corpus size because x is a small integer. The rank-weighted sum
  // SUM(i*x) over users sorted ascending is reconstructed exactly from
  // the tie blocks (a block of m users at value x starting after p
  // users contributes x*(p*m + m*(m+1)/2)), so no user-level window
  // ever runs — the window is over the tiny block frame. All sums are
  // exact int64; the final Gini (2*S1 - (n+1)*Sx) / (n*Sx) is one
  // integer numerator/denominator pair and ONE IEEE division —
  // bit-identical cross-engine.
  val e30_gini: Q = (s, d) => {
    val perUser = Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
    val blocks = perUser.groupBy("event_type", "x")
      .agg(count(lit(1)).as("m"))
    val w = Window.partitionBy("event_type").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    blocks
      .withColumn("p", coalesce(sum(col("m")).over(w), lit(0L)))
      .groupBy("event_type")
      .agg(sum(col("m")).as("n_users"),
        sum(col("m") * col("x")).as("total_events"),
        sum(col("x") * (col("p") * col("m")
          + expr("m * (m + 1) div 2"))).as("s1"))
      .withColumn("gini", round(
        (lit(2L) * col("s1") - (col("n_users") + lit(1L)) * col("total_events"))
          .cast("double")
          / (col("n_users") * col("total_events")).cast("double"), 9))
      .select("event_type", "n_users", "total_events", "gini")
      .orderBy("event_type")
  }
  val e30Sql: String =
    """WITH c AS (SELECT event_type, user_id, COUNT(*) AS x
                  FROM events GROUP BY 1, 2),
      b AS (SELECT event_type, x, COUNT(*) AS m FROM c GROUP BY 1, 2),
      r AS (SELECT event_type, x, m,
                   COALESCE(SUM(m) OVER (PARTITION BY event_type ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
            FROM b),
      g AS (SELECT event_type,
                   CAST(SUM(m) AS BIGINT) AS n_users,
                   CAST(SUM(m * x) AS BIGINT) AS total_events,
                   CAST(SUM(x * (p * m + m * (m + 1) // 2)) AS BIGINT) AS s1
            FROM r GROUP BY 1)
      SELECT event_type, n_users, total_events,
             round(CAST(2 * s1 - (n_users + 1) * total_events AS DOUBLE)
                   / CAST(n_users * total_events AS DOUBLE), 9) AS gini
      FROM g ORDER BY event_type"""

  val queries: Map[String, Q] = Map(
    "e28_stickiness"    -> e28_stickiness,
    "e29_reactivation"  -> e29_reactivation,
    "e30_gini"          -> e30_gini,
  )
  val oracles: Map[String, String] = Map(
    "e28_stickiness"    -> e28Sql,
    "e29_reactivation"  -> e29Sql,
    "e30_gini"          -> e30Sql,
  )
}
