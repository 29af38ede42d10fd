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

  val queries: Map[String, Q] = Map(
    "e54_cusum" -> e54_cusum,
  )
  val oracles: Map[String, String] = Map(
    "e54_cusum" -> e54Sql,
  )
}
