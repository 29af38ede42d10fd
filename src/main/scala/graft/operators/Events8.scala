package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Event analytics, part 8: change detection. */
object Events8 {
  type Q = (SparkSession, String) => DataFrame

  // ---- e54: CUSUM change-point scan on the daily event series ----
  // The detector the e-family still lacked: e11 flags single-day
  // outliers (pointwise z-score), e27 flags local bursts — but a
  // PERSISTENT level shift (deploy doubled event volume; a feed
  // silently lost a region) hides from both, because each post-shift
  // day is individually unremarkable. Page's CUSUM (Biometrika 1954)
  // integrates deviations from the series mean: S_t = Σ_{i≤t}(x_i − μ)
  // drifts while the level differs from μ, and the |S_t| peak marks the
  // most likely change day (the classic offline mean-shift estimator).
  //
  // Engine shape: the ONLY fact-scale stage is the daily combinable
  // count; the mean is one broadcast scalar, deviations are a narrow
  // map, and the cumulative sum runs over the day-sized frame via the
  // sanctioned boundedSingleGroup window (never an unpartitioned window
  // over fact rows — the series length is calendar-bounded at any SF).
  //
  // Cross-engine exactness: daily counts are exact ints; μ is one IEEE
  // division; each deviation x_i − μ is a single IEEE op on identical
  // inputs; the running sum rides DECIMAL(30,6) (Stable's discipline —
  // order-independent, and the only rounding is the deterministic
  // 6-dp double→decimal cast); peak detection compares bit-identical
  // doubles, so the is_changepoint flag needs no tolerance.
  val e54_cusum: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val mu = daily.agg(
      (sum("n").cast("double") / count(lit(1))).as("mu"))
    val dev = graft.api.GraftOps.boundedSingleGroup(
      daily.crossJoin(broadcast(mu))
        .select(col("day"), col("n"),
          (col("n").cast("double") - col("mu")).as("dev")))
    val wc = Window.partitionBy("__g").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wall = Window.partitionBy("__g")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    dev
      .withColumn("cusum",
        sum(col("dev").cast(DecimalType(30, 6))).over(wc).cast("double"))
      .withColumn("peak", max(abs(col("cusum"))).over(wall))
      .select(col("day"), col("n"), round(col("dev"), 9).as("dev"),
        round(col("cusum"), 9).as("cusum"),
        (abs(col("cusum")) === col("peak")).as("is_changepoint"))
      .orderBy("day")
  }
  val e54Sql: String =
    """WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1),
      st AS (SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mu FROM daily),
      dv AS (SELECT day, n, CAST(n AS DOUBLE) - mu AS dev FROM daily, st),
      cs AS (SELECT day, n, dev,
               CAST(SUM(CAST(dev AS DECIMAL(30,6))) OVER (ORDER BY day)
                    AS DOUBLE) AS cusum
             FROM dv)
      SELECT day, n, round(dev, 9) AS dev, round(cusum, 9) AS cusum,
             abs(cusum) = max(abs(cusum)) OVER () AS is_changepoint
      FROM cs ORDER BY day"""

  // ---- e55: per-user peak-rate audit (the rate-limit number) ----
  // The abuse/capacity kernel between e25 (regularity: IS it a bot?)
  // and e41 (global concurrency: how many at once?): how FAST does
  // each principal burst — max events in any sliding 60-second window,
  // which is precisely the number a rate limiter enforces and the
  // evidence an abuse review wants ("user X hit 14 requests/minute").
  //
  // Engine shape: ONE user-keyed fact-scale window with a RANGE frame
  // over exact integer microseconds (peers at equal timestamps count
  // together — both engines' RANGE semantics), then a combinable
  // per-user max + conditional-min for the earliest window achieving
  // the peak; the top-20 offender panel rides TakeOrderedAndProject on
  // (peak DESC, user) — a total order. Nothing unpartitioned, nothing
  // wider than the user rollup after the one window pass.
  //
  // Exactness: all integers (counts, microseconds) — no rounding
  // discipline needed anywhere.
  val e55_rate_limit: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"))
      .rangeBetween(-60000000L, 0L)
    // one window pass, two rollup branches — the branches share an
    // identical exchange+window subplan, which Spark's ReuseExchange
    // dedups, so the fact table is scanned and windowed once
    val iw = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("in_window", count(lit(1)).over(w))
    iw.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max("in_window").as("peak_per_min"))
      .join(
        iw.groupBy("user_id", "in_window")
          .agg(min("us").as("first_us"))
          .select(col("user_id"), col("in_window").as("peak_per_min"),
            col("first_us").as("peak_at_us")),
        Seq("user_id", "peak_per_min"))
      .orderBy(desc("peak_per_min"), col("user_id"))
      .limit(20)
  }
  val e55Sql: String =
    """WITH ev AS (SELECT user_id,
               epoch_us(ts) AS us
             FROM events),
      iw AS (SELECT user_id, us,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 60000000 PRECEDING AND CURRENT ROW)
                 AS in_window
             FROM ev),
      pk AS (SELECT user_id, COUNT(*) AS n_events,
               MAX(in_window) AS peak_per_min
             FROM iw GROUP BY 1),
      at AS (SELECT user_id, in_window AS peak_per_min,
               MIN(us) AS peak_at_us
             FROM iw GROUP BY 1, 2)
      SELECT pk.user_id AS user_id, n_events,
        CAST(pk.peak_per_min AS BIGINT) AS peak_per_min,
        peak_at_us
      FROM pk JOIN at ON pk.user_id = at.user_id
        AND pk.peak_per_min = at.peak_per_min
      ORDER BY peak_per_min DESC, user_id LIMIT 20"""

  val queries: Map[String, Q] = Map(
    "e54_cusum"      -> e54_cusum,
    "e55_rate_limit" -> e55_rate_limit,
  )
  val oracles: Map[String, String] = Map(
    "e54_cusum"      -> e54Sql,
    "e55_rate_limit" -> e55Sql,
  )
}
