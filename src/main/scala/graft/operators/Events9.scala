package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Experimentation continuation: CUPED variance reduction. */
object Events9 {
  type Q = (SparkSession, String) => DataFrame

  // ---- e65: CUPED-adjusted experiment readout ----
  // The variance-reduction technique every mature experimentation
  // platform runs (Deng et al. 2013, "Improving the Sensitivity of
  // Online Controlled Experiments"): a user's PRE-period activity X
  // predicts their experiment-period KPI Y, so regressing it out
  // (Y' = Y - θ(X - X̄), θ = cov(X,Y)/var(X) pooled over all users)
  // removes between-user variance the treatment never caused — the
  // same experiment reads significant days earlier. e59 tests raw
  // proportions; this is the adjusted-means readout plus the achieved
  // variance-reduction factor.
  //
  // Exactness across engines is the design: per-event values become
  // integer CENTS (round(value*100) — one identical IEEE op per row),
  // per-user X/Y are exact BIGINT sums, and all five pooled moments
  // (Σx, Σy, Σxy, Σx², Σy²) ride DECIMAL(38,0) products of those
  // cents (magnitudes ≤1e26 ≪ 1e38, so Spark's precision-capped
  // decimal multiply is EXACT; DuckDB mirrors in HUGEINT) — order-
  // independent, map-side-combinable. θ and x̄ are then single rounded
  // IEEE divisions, and every derived statistic (adjusted means, the
  // closed-form var(Y') = var(Y) − 2θcov + θ²var(X) — algebra instead
  // of a second order-dependent pass over per-user doubles) is the
  // SAME fixed-order scalar expression in both engines, rounded 1e-9.
  //
  // Scale shape: one fact-scale user rollup (combinable), a 1-row
  // moment frame broadcast onto a 2-row arm rollup. Pre-period =
  // days 1-15, experiment = days 16-30 of the corpus month; arms by
  // user parity (e59's deterministic assignment).
  val e65_cuped: Q = (s, d) => {
    val D = "DECIMAL(38,0)"
    val users = Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        sum(when(dayofmonth(col("ts")) <= 15,
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
          .as("x"),
        sum(when(dayofmonth(col("ts")) > 15
            && col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
          .as("y"))
      .withColumn("arm",
        when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"))
    val m = users.agg(
      count(lit(1)).as("n"),
      sum(expr(s"CAST(x AS $D)")).as("sx"),
      sum(expr(s"CAST(y AS $D)")).as("sy"),
      sum(expr(s"CAST(x AS $D) * CAST(y AS $D)")).as("sxy"),
      sum(expr(s"CAST(x AS $D) * CAST(x AS $D)")).as("sxx"),
      sum(expr(s"CAST(y AS $D) * CAST(y AS $D)")).as("syy"))
    val arms = users.groupBy("arm")
      .agg(count(lit(1)).as("n_users"),
        sum(expr(s"CAST(x AS $D)")).as("sx_a"),
        sum(expr(s"CAST(y AS $D)")).as("sy_a"))
    arms.crossJoin(broadcast(m))
      // θ and x̄ rounded ONCE, then reused verbatim — the oracle
      // replays the identical scalar chain. Degenerate variances are
      // guarded (var(x)=0 ⇒ θ=0, no adjustment; var(y)=0 ⇒ reduction
      // 0): double 0/0 is NaN in Spark but NULL in DuckDB, so an
      // unguarded division would break the cross-engine contract on
      // the one input shape where CUPED is a no-op anyway.
      .withColumn("theta", when(
        expr(s"CAST(n * sxx - sx * sx AS DOUBLE)") > 0, round(
          expr(s"CAST(n * sxy - sx * sy AS DOUBLE)")
            / expr(s"CAST(n * sxx - sx * sx AS DOUBLE)"), 9))
        .otherwise(lit(0.0)))
      .withColumn("mean_x", round(
        expr("CAST(sx AS DOUBLE)") / col("n"), 9))
      .withColumn("mean_y_dollars", round(
        expr("CAST(sy_a AS DOUBLE)") / col("n_users") / lit(100.0), 9))
      .withColumn("mean_y_cuped_dollars", round(
        (expr("CAST(sy_a AS DOUBLE)") / col("n_users")
          - col("theta") * (expr("CAST(sx_a AS DOUBLE)") / col("n_users")
            - col("mean_x"))) / lit(100.0), 9))
      .withColumn("var_reduction", when(
        expr("CAST(n * syy - sy * sy AS DOUBLE)") > 0, round(
          lit(1.0) - (expr("CAST(n * syy - sy * sy AS DOUBLE)")
            - lit(2.0) * col("theta")
              * expr("CAST(n * sxy - sx * sy AS DOUBLE)")
            + col("theta") * col("theta")
              * expr("CAST(n * sxx - sx * sx AS DOUBLE)"))
            / expr("CAST(n * syy - sy * sy AS DOUBLE)"), 9))
        .otherwise(lit(0.0)))
      .select("arm", "n_users", "mean_y_dollars", "mean_y_cuped_dollars",
        "theta", "var_reduction")
      .orderBy("arm")
  }
  val e65Sql: String =
    """WITH u AS MATERIALIZED (
        SELECT user_id,
          CAST(SUM(CASE WHEN day(ts) <= 15
            THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
            AS x,
          CAST(SUM(CASE WHEN day(ts) > 15 AND event_type = 'purchase'
            THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
            AS y,
          CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        FROM events GROUP BY user_id),
      m AS (SELECT COUNT(*) AS n,
          SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
          SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
          SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
          SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
        FROM u),
      a AS (SELECT arm, COUNT(*) AS n_users,
          SUM(CAST(x AS HUGEINT)) AS sx_a, SUM(CAST(y AS HUGEINT)) AS sy_a
        FROM u GROUP BY arm),
      t AS (SELECT a.*, m.*,
          CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE), 9)
            ELSE 0.0 END AS theta,
          round(CAST(sx AS DOUBLE) / n, 9) AS mean_x
        FROM a CROSS JOIN m)
      SELECT arm, n_users,
        round(CAST(sy_a AS DOUBLE) / n_users / 100.0, 9) AS mean_y_dollars,
        round((CAST(sy_a AS DOUBLE) / n_users
          - theta * (CAST(sx_a AS DOUBLE) / n_users - mean_x)) / 100.0, 9)
          AS mean_y_cuped_dollars,
        theta,
        CASE WHEN CAST(n * syy - sy * sy AS DOUBLE) > 0
          THEN round(1.0 - (CAST(n * syy - sy * sy AS DOUBLE)
              - 2.0 * theta * CAST(n * sxy - sx * sy AS DOUBLE)
              + theta * theta * CAST(n * sxx - sx * sx AS DOUBLE))
            / CAST(n * syy - sy * sy AS DOUBLE), 9)
          ELSE 0.0 END AS var_reduction
      FROM t ORDER BY arm"""

  // ---- e66: per-user burstiness census ----
  // Goh & Barabási's burstiness coefficient B = (σ−μ)/(σ+μ) over each
  // user's inter-event gaps — the canonical temporal-pattern signal
  // (B≈−1 periodic / metronome-bot, B≈0 Poisson-random, B→1 bursty
  // human sessions) that e25's rule-based bot score and e15's per-type
  // gap stats don't capture: it is PER USER and scale-free (a user
  // twice as active but equally bursty scores the same). Reported as
  // the band census — how much of the user base is periodic vs random
  // vs bursty — the shape a fraud/engagement analyst actually reads.
  //
  // Exactness: gaps are exact integer MICROS from one partitioned
  // (user, ts, event_id)-ordered lag (the e15 idiom; tie order can't
  // perturb the gap multiset), per-user moments (m, Σg, Σg²) ride
  // DECIMAL(38,0) — exact, combinable — and σ, μ, B are the SAME
  // fixed-order scalar chain in both engines (sqrt is correctly
  // rounded IEEE), B rounded 1e-9 before banding so a boundary can't
  // flip between engines. Band means ride Stable.dsum. Scale shape:
  // one user-partitioned window + one combinable user rollup + a
  // 3-row band census — no global sort, no driver state.
  val e66_user_burstiness: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val D = "DECIMAL(38,0)"
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("gap", col("us") - lag("us", 1).over(w))
      .filter(col("gap").isNotNull)
    val users = gaps.groupBy("user_id")
      .agg(count(lit(1)).as("m"),
        sum(expr(s"CAST(gap AS $D)")).as("sx"),
        sum(expr(s"CAST(gap AS $D) * CAST(gap AS $D)")).as("sxx"))
      .filter(col("m") >= 2) // σ needs at least two gaps
      .withColumn("sigma",
        sqrt(expr(s"CAST(m * sxx - sx * sx AS DOUBLE)"))
          / col("m").cast("double"))
      .withColumn("mu", expr("CAST(sx AS DOUBLE)") / col("m"))
      .withColumn("b", when(col("sigma") + col("mu") === 0.0, 0.0)
        .otherwise(round((col("sigma") - col("mu"))
          / (col("sigma") + col("mu")), 9)))
      .withColumn("band", when(col("b") < -0.2, "regular")
        .when(col("b") < 0.2, "random").otherwise("bursty"))
    users.groupBy("band")
      .agg(count(lit(1)).as("n_users"),
        round(graft.Stable.dsum(col("b")) / count(lit(1)), 9)
          .as("mean_burstiness"),
        sum("m").as("total_gaps"))
      .orderBy("band")
  }
  val e66Sql: String =
    s"""WITH g AS (SELECT user_id,
          epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events),
      u AS (SELECT user_id, COUNT(*) AS m,
          SUM(CAST(gap AS HUGEINT)) AS sx,
          SUM(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS sxx
        FROM g WHERE gap IS NOT NULL GROUP BY user_id
        HAVING COUNT(*) >= 2),
      b AS (SELECT user_id, m,
          sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) / CAST(m AS DOUBLE)
            AS sigma,
          CAST(sx AS DOUBLE) / m AS mu
        FROM u),
      s AS (SELECT user_id, m,
          CASE WHEN sigma + mu = 0.0 THEN 0.0
               ELSE round((sigma - mu) / (sigma + mu), 9) END AS b
        FROM b),
      c AS (SELECT *, CASE WHEN b < -0.2 THEN 'regular'
               WHEN b < 0.2 THEN 'random' ELSE 'bursty' END AS band
            FROM s)
      SELECT band, COUNT(*) AS n_users,
        round(${graft.Stable.sqlSum("b")} / COUNT(*), 9)
          AS mean_burstiness,
        CAST(SUM(m) AS BIGINT) AS total_gaps
      FROM c GROUP BY band ORDER BY band"""

  val queries: Map[String, Q] = Map(
    "e65_cuped" -> e65_cuped,
    "e66_user_burstiness" -> e66_user_burstiness,
  )
  val oracles: Map[String, String] = Map(
    "e65_cuped" -> e65Sql,
    "e66_user_burstiness" -> e66Sql,
  )
}
