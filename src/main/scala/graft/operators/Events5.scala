package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
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

  // ---- e23: EWMA smoothing of the daily value series ----
  // The ops-dashboard smoother: exponentially weighted moving average
  // (alpha = 0.3) of each event type's daily value total. EWMA's
  // recurrence is inherently sequential, which is exactly why it's
  // worth having as a FIRST-CLASS operator: the engine's shape is
  // per-key (series fit in one task; key count provides parallelism),
  // so it's ONE shuffle on event_type, then a per-key fold over the
  // sorted day array — no iteration over the cluster, no day-count
  // joins. Arithmetic is integer fixed-point (decimal-exact daily sums
  // quantized to 1e-6 "micro-units", then acc' = (3*x + 7*acc) div 10
  // in int64) so the fold is engine-exact: no float recurrence drift,
  // and the DuckDB oracle replays it with list_reduce, hash-exact.
  // At 100 TB the daily pre-aggregation is the only fact-scale stage.
  val e23_ewma: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(col("value").cast(DecimalType(30, 6))) * 1000000)
        .cast("long").as("x6"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), max("day").as("last_day"),
        sort_array(collect_list(struct(col("day"), col("x6")))).as("s"))
      .withColumn("ewma_micro", expr(
        """aggregate(slice(s, 2, size(s) - 1), s[0].x6,
             (acc, e) -> (3 * e.x6 + 7 * acc) div 10)"""))
      .select("event_type", "n_days", "last_day", "ewma_micro")
      .orderBy("event_type")
  }
  val e23Sql: String =
    """WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(30,6))) * 1000000 AS BIGINT) AS x6
        FROM events GROUP BY 1, 2),
      g AS (SELECT event_type, COUNT(*) AS n_days, MAX(day) AS last_day,
                   list(x6 ORDER BY day) AS xs
            FROM daily GROUP BY 1)
      SELECT event_type, n_days, last_day,
             list_reduce(xs, (acc, x) -> (3 * x + 7 * acc) // 10) AS ewma_micro
      FROM g ORDER BY event_type"""

  // ---- e24: first-order Markov transition matrix of event types ----
  // "What do users do next": P(next event type | current event type),
  // the base model behind next-action prediction, anomaly scoring of
  // sessions, and synthetic-journey generation. Per-user successor
  // pairs come from ONE lead() in the user-keyed sort window (the same
  // single shuffle every sequence op here rides); the transition
  // matrix is then an event-type² aggregate — metadata-sized however
  // big the fact table is. Probabilities are single IEEE divisions of
  // exact counts, bit-identical cross-engine.
  val e24_markov: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select("user_id", "ts", "event_id", "event_type")
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("src").agg(sum("n").as("tot"))
    pairs.join(totals, "src")
      .withColumn("p", round(col("n").cast("double") / col("tot").cast("double"), 9))
      .select("src", "dst", "n", "p")
      .orderBy("src", "dst")
  }
  val e24Sql: String =
    """WITH s AS (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events),
      c AS (SELECT event_type AS src, nxt AS dst, COUNT(*) AS n
            FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT src, SUM(n) AS tot FROM c GROUP BY 1)
      SELECT src, dst, n,
             round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 9) AS p
      FROM c JOIN t USING (src) ORDER BY src, dst"""

  // ---- e25: bot / automation scoring from inter-arrival regularity ----
  // Humans are bursty; schedulers are metronomes. The classic traffic
  // signal is the coefficient of variation of a user's inter-event
  // gaps: a Poisson (human-ish) process has cv ≈ 1, cron-like traffic
  // cv ≈ 0. Plan: ONE user-keyed sort window produces the gaps (the
  // same single fact-scale shuffle every sequence op here rides), then
  // a per-user aggregate of exact integer moments — gaps are WHOLE
  // SECONDS (integer div of exact microsecond longs), their sums and
  // squared sums ride DECIMAL(38,0) (exact, order-independent, scale-0
  // so the decimal→double cast is ONE correctly-rounded conversion on
  // both engines), and mean/variance/cv are a fixed parenthesization
  // of IEEE ops (var clamped at 0 before sqrt — E[x²]−mean² can go
  // −ulp). The cv < 0.9 flag marks "more regular than Poisson"; the
  // n ≥ 10 floor keeps the estimator meaningful. Output is user-sized
  // — at 100 TB this is the per-entity profile shape: fact-scale work
  // is one window + one combinable aggregate, nothing pairwise.
  val e25_bot_score: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select("user_id", "ts", "event_id")
      .withColumn("gap_us",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .withColumn("gap_s", expr("gap_us div 1000000"))
      .filter(col("gap_s").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_s").cast(DecimalType(38, 0))).cast("double").as("s1"),
        sum((col("gap_s") * col("gap_s")).cast(DecimalType(38, 0)))
          .cast("double").as("s2"))
      .filter(col("n_gaps") >= 10)
      .withColumn("mean_gap_s", col("s1") / col("n_gaps").cast("double"))
      .withColumn("varg", greatest(
        col("s2") / col("n_gaps").cast("double")
          - col("mean_gap_s") * col("mean_gap_s"), lit(0.0)))
      .withColumn("cv_gap", sqrt(col("varg")) / col("mean_gap_s"))
      .select(col("user_id"), col("n_gaps"),
        round(col("mean_gap_s"), 9).as("mean_gap_s"),
        round(col("cv_gap"), 9).as("cv_gap"),
        (col("cv_gap") < 0.9).as("metronomic"))
      .orderBy("user_id")
  }
  val e25Sql: String =
    """WITH g AS (
        SELECT user_id,
               (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id))
                - epoch_us(ts)) // 1000000 AS gap_s
        FROM events),
      a AS (SELECT user_id, COUNT(*) AS n_gaps,
              CAST(SUM(CAST(gap_s AS DECIMAL(38,0))) AS DOUBLE) AS s1,
              CAST(SUM(CAST(gap_s * gap_s AS DECIMAL(38,0))) AS DOUBLE) AS s2
            FROM g WHERE gap_s IS NOT NULL GROUP BY 1
            HAVING COUNT(*) >= 10),
      m AS (SELECT user_id, n_gaps,
              s1 / CAST(n_gaps AS DOUBLE) AS mean_gap_s,
              GREATEST(s2 / CAST(n_gaps AS DOUBLE)
                - (s1 / CAST(n_gaps AS DOUBLE)) * (s1 / CAST(n_gaps AS DOUBLE)),
                CAST(0.0 AS DOUBLE)) AS varg
            FROM a)
      SELECT user_id, n_gaps,
             round(mean_gap_s, 9) AS mean_gap_s,
             round(sqrt(varg) / mean_gap_s, 9) AS cv_gap,
             sqrt(varg) / mean_gap_s < 0.9 AS metronomic
      FROM m ORDER BY user_id"""

  // ---- e26: day-of-week seasonality profile ----
  // The capacity-planning / anomaly-baseline primitive: each event
  // type's traffic profile across the week, as a seasonality INDEX —
  // observed day-of-week count over the uniform expectation total/7.
  // Index > 1 = that weekday runs hot. One map-side-combinable
  // (type, dow) aggregate (42 cells at any fact scale), type totals by
  // a second tiny rollup, one IEEE division of exact counts. Weekday
  // numbering is pinned cross-engine: Spark dayofweek() is 1=Sunday,
  // DuckDB dayofweek() is 0=Sunday — the Spark side subtracts 1 so
  // both emit Sun=0..Sat=6.
  val e26_seasonality: Q = (s, d) => {
    val cells = Tables.events(s, d)
      .groupBy(col("event_type"), (dayofweek(col("ts")) - 1).cast("long").as("dow"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("event_type").agg(sum("n").as("tot"))
    cells.join(broadcast(totals), "event_type")
      .select(col("event_type"), col("dow"), col("n"),
        round(col("n").cast("double") / (col("tot").cast("double") / lit(7.0)), 9)
          .as("season_idx"))
      .orderBy("event_type", "dow")
  }
  val e26Sql: String =
    """WITH c AS (SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
                       COUNT(*) AS n
               FROM events GROUP BY 1, 2),
      t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot
            FROM c GROUP BY 1)
      SELECT c.event_type, dow, n,
             round(CAST(n AS DOUBLE) / (CAST(tot AS DOUBLE) / 7.0), 9)
               AS season_idx
      FROM c JOIN t ON c.event_type = t.event_type
      ORDER BY c.event_type, dow"""

  // ---- e27: burst detection (trailing-baseline z-score, exact) ----
  // The ops-monitoring staple: flag days where an event type's volume
  // spikes above its own recent history. Baseline = the trailing 7 FULL
  // days (frame rows -7..-1, rows with a short history are excluded, so
  // the corpus edge never yields a degenerate sigma). The burst test
  // c > mu + 3*sigma is evaluated IN INTEGERS — c*n - S > 0 and
  // (c*n - S)^2 > 9*(n*SS - S^2), the mean/variance inequality cleared
  // of divisions — so the flag is engine-exact with no floating-point
  // threshold wobble; the z column itself is one sqrt+divide on those
  // same integers, for humans. Plan: one partial-agg pass to daily
  // counts (5 types x 30 days = metadata-sized), then a type-keyed
  // window over ~30 rows per key — at 100 TB the window input is still
  // types x days, never event-sized.
  val e27_burst_detect: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    daily
      .withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_sum", sum("cnt").over(w))
      .withColumn("trail_sumsq", sum(col("cnt") * col("cnt")).over(w))
      .filter(col("trail_n") === 7)
      .withColumn("dev_num", col("cnt") * 7 - col("trail_sum"))
      .withColumn("var_num",
        lit(7) * col("trail_sumsq") - col("trail_sum") * col("trail_sum"))
      .withColumn("z", when(col("var_num") > 0,
        round(col("dev_num").cast("double")
          / sqrt(col("var_num").cast("double")), 9)))
      .withColumn("is_burst",
        when(col("dev_num") > 0 &&
          col("dev_num") * col("dev_num") > lit(9) * col("var_num"), 1L)
          .otherwise(0L))
      .select("event_type", "day", "cnt", "trail_sum", "z", "is_burst")
      .orderBy("event_type", "day")
  }
  val e27Sql: String =
    """WITH c AS (SELECT event_type, date_trunc('day', ts) AS day,
                       COUNT(*) AS cnt
               FROM events GROUP BY 1, 2),
      t AS (SELECT event_type, day, cnt,
              COUNT(*) OVER w AS trail_n,
              CAST(SUM(cnt) OVER w AS BIGINT) AS trail_sum,
              CAST(SUM(cnt * cnt) OVER w AS BIGINT) AS trail_sumsq
            FROM c
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      f AS (SELECT *, cnt * 7 - trail_sum AS dev_num,
                   7 * trail_sumsq - trail_sum * trail_sum AS var_num
            FROM t WHERE trail_n = 7)
      SELECT event_type, day, cnt, trail_sum,
             CASE WHEN var_num > 0
                  THEN round(CAST(dev_num AS DOUBLE)
                             / sqrt(CAST(var_num AS DOUBLE)), 9) END AS z,
             CAST(CASE WHEN dev_num > 0
                        AND dev_num * dev_num > 9 * var_num
                       THEN 1 ELSE 0 END AS BIGINT) AS is_burst
      FROM f ORDER BY event_type, day"""

  val queries: Map[String, Q] = Map(
    "e22_conversion_lag" -> e22_conversion_lag,
    "e27_burst_detect"   -> e27_burst_detect,
    "e23_ewma"           -> e23_ewma,
    "e24_markov"         -> e24_markov,
    "e25_bot_score"      -> e25_bot_score,
    "e26_seasonality"    -> e26_seasonality,
  )
  val oracles: Map[String, String] = Map(
    "e22_conversion_lag" -> e22Sql,
    "e27_burst_detect"   -> e27Sql,
    "e23_ewma"           -> e23Sql,
    "e24_markov"         -> e24Sql,
    "e25_bot_score"      -> e25Sql,
    "e26_seasonality"    -> e26Sql,
  )
}
