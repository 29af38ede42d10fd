package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Stable.{dsum, sqlSum}

/** Event analytics, part 7: association mining and forecast backtesting. */
object Events7 {
  type Q = (SparkSession, String) => DataFrame

  // ---- e31: association rules over user-day event baskets ----
  // Market-basket mining on behavior: which event types co-occur in the
  // same user-day beyond chance? Baskets are (user, day); the pair
  // expansion runs IN-ROW over each basket's sorted distinct-type set
  // (the g02 discipline — bounded by the TYPE CARDINALITY, single
  // digits, never basket x basket), so total work is linear in the
  // fact table at any scale. Per-type basket counts and the basket
  // total are combinable aggregates on the same distinct triple; the
  // rule table (types² at most) joins them via broadcast. Support /
  // confidence are single IEEE divisions of exact int64 counts, and
  // lift rides the exact-integer form (n_ab * N) / (n_a * n_b) — one
  // division, bit-identical cross-engine.
  val e31_assoc_rules: Q = (s, d) => {
    val triples = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .distinct()
    val baskets = triples
      .groupBy("user_id", "day")
      .agg(sort_array(collect_set(col("event_type"))).as("ts"))
    val pairs = baskets
      .select(explode(expr(
        """flatten(transform(ts, (a, i) ->
             transform(slice(ts, i + 2, size(ts)),
               b -> struct(a AS type_a, b AS type_b))))""")).as("p"))
      .groupBy(col("p.type_a").as("type_a"), col("p.type_b").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    val perType = triples.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_t"))
    val total = baskets.agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(broadcast(perType.select(col("event_type").as("type_a"),
        col("n_t").as("n_a"))), "type_a")
      .join(broadcast(perType.select(col("event_type").as("type_b"),
        col("n_t").as("n_b"))), "type_b")
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_baskets"),
        round(col("n_ab").cast("double") / col("n_baskets").cast("double"), 9)
          .as("support"),
        round(col("n_ab").cast("double") / col("n_a").cast("double"), 9)
          .as("conf_a_b"),
        round(col("n_ab").cast("double") / col("n_b").cast("double"), 9)
          .as("conf_b_a"),
        round((col("n_ab") * col("n_baskets")).cast("double")
          / (col("n_a") * col("n_b")).cast("double"), 9).as("lift"))
      .orderBy("type_a", "type_b")
  }
  val e31Sql: String =
    """WITH tr AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
                          event_type FROM events),
      bk AS (SELECT user_id, day FROM tr GROUP BY 1, 2),
      pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                    COUNT(*) AS n_ab
             FROM tr a JOIN tr b
               ON a.user_id = b.user_id AND a.day = b.day
                  AND a.event_type < b.event_type
             GROUP BY 1, 2),
      pt AS (SELECT event_type, COUNT(*) AS n_t FROM tr GROUP BY 1),
      tot AS (SELECT COUNT(*) AS n_baskets FROM bk)
      SELECT type_a, type_b, n_ab, pa.n_t AS n_a, pb.n_t AS n_b, n_baskets,
             round(CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE), 9)
               AS support,
             round(CAST(n_ab AS DOUBLE) / CAST(pa.n_t AS DOUBLE), 9)
               AS conf_a_b,
             round(CAST(n_ab AS DOUBLE) / CAST(pb.n_t AS DOUBLE), 9)
               AS conf_b_a,
             round(CAST(n_ab * n_baskets AS DOUBLE)
                   / CAST(pa.n_t * pb.n_t AS DOUBLE), 9) AS lift
      FROM pr JOIN pt pa ON pr.type_a = pa.event_type
              JOIN pt pb ON pr.type_b = pb.event_type
              CROSS JOIN tot
      ORDER BY type_a, type_b"""

  // ---- e32: seasonal-naive forecast backtest ----
  // The capacity-planning baseline every fancier model is judged
  // against: forecast a (type, day)'s event count with the same
  // weekday last week (d-7), then backtest MAE / MAPE over the days
  // that have both sides. After the ONE fact-scale daily aggregate
  // (combinable), the series is types x days — metadata-sized — so
  // the d-7 self-join broadcasts and no window runs anywhere. Absolute
  // errors are exact int64; MAE is one IEEE division; MAPE's per-day
  // ratios are single IEEE divisions of exact ints whose SUM rides the
  // dsum decimal discipline (order-independent, engine-exact).
  val e32_forecast_backtest: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val prior = daily.select(col("event_type"),
      date_add(col("day"), 7).as("day"), col("n").as("fc"))
    daily.join(broadcast(prior), Seq("event_type", "day"))
      .withColumn("abs_e", abs(col("n") - col("fc")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_scored"),
        sum(col("n")).as("total_actual"),
        sum(col("abs_e")).as("total_abs_err"),
        round(sum(col("abs_e")).cast("double")
          / count(lit(1)).cast("double"), 9).as("mae"),
        round(dsum(col("abs_e").cast("double") / col("n").cast("double"))
          / count(lit(1)).cast("double"), 9).as("mape"))
      .orderBy("event_type")
  }
  val e32Sql: String =
    s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                           COUNT(*) AS n
                    FROM events GROUP BY 1, 2),
      j AS (SELECT c.event_type, c.n, p.n AS fc,
                   abs(c.n - p.n) AS abs_e
            FROM daily c JOIN daily p
              ON c.event_type = p.event_type AND c.day = p.day + 7)
      SELECT event_type, COUNT(*) AS n_scored,
             CAST(SUM(n) AS BIGINT) AS total_actual,
             CAST(SUM(abs_e) AS BIGINT) AS total_abs_err,
             round(CAST(SUM(abs_e) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
               AS mae,
             round(${sqlSum("CAST(abs_e AS DOUBLE) / CAST(n AS DOUBLE)")}
                   / CAST(COUNT(*) AS DOUBLE), 9) AS mape
      FROM j GROUP BY 1 ORDER BY event_type"""

  // ---- e33: weekly growth accounting (new / retained / resurrected / churned) ----
  // The standard growth-accounting decomposition every subscription
  // and engagement report is built on: each week's actives split into
  // NEW (first-ever week), RETAINED (also active last week) and
  // RESURRECTED (active before, but not last week); CHURNED-IN counts
  // the users who were active last week and didn't return (attributed
  // to the week they went missing; the final observed week is censored
  // — no churn is claimed where the data ends). One (user, week)
  // distinct pass, then ONE lag+lead in the user-keyed sort window
  // (the e29 discipline), a combinable week rollup, and a broadcast of
  // the scalar max-week. Weeks ride an integer index (days since a
  // fixed Monday div 7) so state tests are exact integer comparisons
  // on both engines. The by-construction invariant new + retained +
  // resurrected = active is spec-pinned.
  // the library verb (GraftOps.growthAccounting) IS the implementation
  // — the oracle gate certifies the facade itself
  val e33_growth_accounting: Q = (s, d) =>
    graft.api.GraftOps.growthAccounting(Tables.events(s, d),
      col("user_id"), col("ts"))

  val e33Sql: String =
    """WITH uw AS (SELECT DISTINCT user_id,
                       date_trunc('week', CAST(ts AS DATE)) AS wk
                  FROM events),
      ui AS (SELECT user_id,
                    CAST((wk - DATE '1970-01-05') // 7 AS BIGINT) AS wi
             FROM uw),
      st AS (SELECT user_id, wi,
                    lag(wi)  OVER (PARTITION BY user_id ORDER BY wi) AS prev,
                    lead(wi) OVER (PARTITION BY user_id ORDER BY wi) AS nxt
             FROM ui),
      mx AS (SELECT MAX(wi) AS maxwi FROM ui),
      a AS (SELECT wi, COUNT(*) AS n_active,
                   COUNT(*) FILTER (WHERE prev IS NULL) AS n_new,
                   COUNT(*) FILTER (WHERE prev = wi - 1) AS n_retained,
                   COUNT(*) FILTER (WHERE prev IS NOT NULL AND prev < wi - 1)
                     AS n_resurrected
            FROM st GROUP BY 1),
      c AS (SELECT wi + 1 AS wi, COUNT(*) AS n_churned_in
            FROM st, mx
            WHERE (nxt IS NULL AND wi < maxwi) OR nxt > wi + 1
            GROUP BY 1)
      SELECT DATE '1970-01-05' + CAST(a.wi * 7 AS INTEGER) AS week,
             n_active, n_new, n_retained, n_resurrected,
             COALESCE(n_churned_in, 0) AS n_churned_in
      FROM a LEFT JOIN c ON a.wi = c.wi
      ORDER BY week"""

  // ---- e35: trend / seasonal / residual decomposition ----
  // Classical decomposition (the moving-average core of STL) per event
  // type: trend = centered 7-day mean of the daily counts, seasonal =
  // per-weekday mean of the detrended series, residual = the rest —
  // the decomposition every anomaly threshold (e11/e27) implicitly
  // assumes. All windows run on the types×days frame (metadata-sized
  // after the ONE fact-scale daily aggregate) and only FULL 7-day
  // windows score (edge days are excluded, not padded — honesty over
  // coverage). Trend is an exact-int sum with one division; seasonal
  // means ride dsum; weekday numbering is pinned cross-engine (the
  // e26 discipline: Spark dayofweek 1=Sun minus 1 = DuckDB dow 0=Sun).
  val e35_seasonal_decompose: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-3, 3)
    val trended = daily
      .withColumn("w_n", count(lit(1)).over(w))
      .withColumn("w_sum", sum("n").over(w))
      .filter(col("w_n") === 7)
      .withColumn("trend", col("w_sum").cast("double") / lit(7.0))
      .withColumn("detr", col("n").cast("double") - col("trend"))
      .withColumn("dow", dayofweek(col("day")) - 1)
    val seasonal = trended.groupBy("event_type", "dow")
      .agg((dsum(col("detr")) / count(lit(1))).as("seasonal"))
    trended.join(broadcast(seasonal), Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("n"),
        round(col("trend"), 9).as("trend"),
        round(col("seasonal"), 9).as("seasonal"),
        round(col("detr") - col("seasonal"), 9).as("residual"))
      .orderBy("event_type", "day")
  }
  val e35Sql: String =
    s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                           COUNT(*) AS n
                    FROM events GROUP BY 1, 2),
      tw AS (SELECT event_type, day, n,
               COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w_n,
               CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS w_sum
             FROM daily),
      tr AS (SELECT event_type, day, n,
               CAST(w_sum AS DOUBLE) / CAST(7.0 AS DOUBLE) AS trend,
               CAST(n AS DOUBLE)
                 - CAST(w_sum AS DOUBLE) / CAST(7.0 AS DOUBLE) AS detr,
               dayofweek(day) AS dow
             FROM tw WHERE w_n = 7),
      se AS (SELECT event_type, dow,
               ${sqlSum("detr")} / COUNT(*) AS seasonal
             FROM tr GROUP BY 1, 2)
      SELECT tr.event_type, tr.day, tr.n,
             round(trend, 9) AS trend,
             round(seasonal, 9) AS seasonal,
             round(detr - seasonal, 9) AS residual
      FROM tr JOIN se ON tr.event_type = se.event_type AND tr.dow = se.dow
      ORDER BY tr.event_type, tr.day"""

  // ---- e36: SLO error-budget burn rate ----
  // The SRE staple: daily error rate vs a 1% SLO, the 1-day and
  // trailing-7-day burn rates, and breach flags. After the ONE
  // combinable daily aggregate the series is days-sized, so the
  // trailing window runs inside an explicitly bounded single group
  // (GraftOps.boundedSingleGroup — the sanctioned shape for
  // metadata-sized global series; WindowExec's unpartitioned path
  // never engages). Breach tests are EXACT INTEGERS: 100·errors > n
  // is rate > 1% with no double threshold; the reported burn rates
  // are single IEEE divisions for humans.
  val e36_slo_burn: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        count(when(col("event_type") === "error", 1)).as("errors"))
    val g = graft.api.GraftOps.boundedSingleGroup(daily)
    val w = Window.partitionBy("__g").orderBy("day").rowsBetween(-6, 0)
    g.withColumn("n7", sum("n").over(w))
      .withColumn("e7", sum("errors").over(w))
      .withColumn("w_days", count(lit(1)).over(w))
      .select(col("day"), col("n"), col("errors"),
        round(col("errors").cast("double") / col("n").cast("double"), 9)
          .as("rate"),
        round(col("errors").cast("double") * lit(100.0)
          / col("n").cast("double"), 9).as("burn_1d"),
        round(col("e7").cast("double") * lit(100.0)
          / col("n7").cast("double"), 9).as("burn_7d"),
        (col("errors") * 100 > col("n")).as("breach_1d"),
        (col("e7") * 100 > col("n7") && col("w_days") === 7).as("breach_7d"))
      .orderBy("day")
  }
  val e36Sql: String =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
                   COUNT(*) FILTER (WHERE event_type = 'error') AS errors
            FROM events GROUP BY 1),
      w AS (SELECT day, n, errors,
              CAST(SUM(n) OVER (ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n7,
              CAST(SUM(errors) OVER (ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS e7,
              COUNT(*) OVER (ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS w_days
            FROM daily)
      SELECT day, n, errors,
             round(CAST(errors AS DOUBLE) / CAST(n AS DOUBLE), 9) AS rate,
             round(CAST(errors AS DOUBLE) * 100.0 / CAST(n AS DOUBLE), 9)
               AS burn_1d,
             round(CAST(e7 AS DOUBLE) * 100.0 / CAST(n7 AS DOUBLE), 9)
               AS burn_7d,
             errors * 100 > n AS breach_1d,
             (e7 * 100 > n7 AND w_days = 7) AS breach_7d
      FROM w ORDER BY day"""

  // ---- e37: retention power-law fit ----
  // Retention curves are power-law-ish (the "smile" every growth team
  // fits); this computes day-k retention (k = 1..7) from the (user,
  // day) distinct frame and first-activity cohort, then the closed-
  // form least-squares fit of ln(rate) on ln(k) — the t16 zipf
  // discipline: ln of exact-int ratios, dsum moment sums, fixed-
  // parenthesization slope/intercept, ONE rounding at the end. The
  // fact-scale stages are the pair-distinct and the first-day
  // aggregate (both combinable); the regression runs on ≤ 7 points.
  val e37_retention_fit: Q = (s, d) => {
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val first = ud.groupBy("user_id").agg(min("day").as("d0"))
    val nUsers = first.agg(count(lit(1)).as("n_users"))
    val rates = ud.join(first, "user_id")
      .withColumn("k", datediff(col("day"), col("d0")).cast("long"))
      .filter(col("k") >= 1 && col("k") <= 7)
      .groupBy("k")
      .agg(count_distinct(col("user_id")).as("active"))
      .crossJoin(broadcast(nUsers))
      .withColumn("rate",
        col("active").cast("double") / col("n_users").cast("double"))
    val pts = rates.select(col("n_users"),
      log(col("k").cast("double")).as("x"), log(col("rate")).as("y"),
      when(col("k") === 1, col("rate")).as("rate1"),
      when(col("k") === 7, col("rate")).as("rate7"))
    pts.groupBy("n_users").agg(
        count(lit(1)).as("n_points"),
        dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
        dsum(col("x") * col("x")).as("sxx"),
        dsum(col("x") * col("y")).as("sxy"),
        round(max(col("rate1")), 9).as("day1_retention"),
        round(max(col("rate7")), 9).as("day7_retention"))
      .select(col("n_users"), col("n_points"),
        round((col("n_points") * col("sxy") - col("sx") * col("sy"))
          / (col("n_points") * col("sxx") - col("sx") * col("sx")), 6)
          .as("slope"),
        round((col("sy") * col("sxx") - col("sx") * col("sxy"))
          / (col("n_points") * col("sxx") - col("sx") * col("sx")), 6)
          .as("intercept"),
        col("day1_retention"), col("day7_retention"))
  }
  val e37Sql: String =
    s"""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                 FROM events),
      f AS (SELECT user_id, MIN(day) AS d0 FROM ud GROUP BY 1),
      nu AS (SELECT COUNT(*) AS n_users FROM f),
      r AS (SELECT CAST(day - d0 AS BIGINT) AS k,
                   CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS active
            FROM ud JOIN f ON ud.user_id = f.user_id
            WHERE day - d0 BETWEEN 1 AND 7 GROUP BY 1),
      rr AS (SELECT k, active, n_users,
               CAST(active AS DOUBLE) / CAST(n_users AS DOUBLE) AS rate
             FROM r CROSS JOIN nu),
      p AS (SELECT n_users, ln(CAST(k AS DOUBLE)) AS x, ln(rate) AS y,
                   CASE WHEN k = 1 THEN rate END AS rate1,
                   CASE WHEN k = 7 THEN rate END AS rate7
            FROM rr),
      m AS (SELECT n_users, COUNT(*) AS n_points,
              ${sqlSum("x")} AS sx, ${sqlSum("y")} AS sy,
              ${sqlSum("x * x")} AS sxx, ${sqlSum("x * y")} AS sxy,
              round(MAX(rate1), 9) AS day1_retention,
              round(MAX(rate7), 9) AS day7_retention
            FROM p GROUP BY 1)
      SELECT n_users, n_points,
             round((n_points * sxy - sx * sy)
                   / (n_points * sxx - sx * sx), 6) AS slope,
             round((sy * sxx - sx * sxy)
                   / (n_points * sxx - sx * sx), 6) AS intercept,
             day1_retention, day7_retention
      FROM m"""

  // ---- e39: Pareto concentration point (80/20 exactly) ----
  // "What fraction of users produce 80% of events?" — the concentration
  // number every capacity and abuse review quotes, computed EXACTLY:
  // per-user counts (the one fact-scale stage), counts-of-counts
  // blocks (metadata-sized — the e30 discipline), blocks sorted by
  // count descending with cumulative sums inside an explicitly bounded
  // single group, then pure integer arithmetic picks the block where
  // the running total first clears T = ceil(0.8 · total) and the
  // users-needed-within-block ceiling division. No per-user sort ever
  // runs; every boundary test is exact int64 (no 0.8 · double).
  val e39_pareto_point: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val perUser = Tables.events(s, d)
      .groupBy("user_id").agg(count(lit(1)).as("x"))
    val blocks = perUser.groupBy("x").agg(count(lit(1)).as("m"))
    val g = graft.api.GraftOps.boundedSingleGroup(blocks)
    val w = Window.partitionBy("__g").orderBy(desc("x"))
    val cum = g
      .withColumn("cum_ev", sum(col("x") * col("m")).over(w))
      .withColumn("cum_us", sum(col("m")).over(w))
      .withColumn("tot_ev", sum(col("x") * col("m")).over(
        Window.partitionBy("__g")))
      .withColumn("tot_us", sum(col("m")).over(Window.partitionBy("__g")))
      .withColumn("target", expr("(4 * tot_ev + 4) div 5"))
    cum.filter(col("cum_ev") >= col("target")
        && col("cum_ev") - col("x") * col("m") < col("target"))
      .withColumn("before_ev", col("cum_ev") - col("x") * col("m"))
      .withColumn("need_in_block",
        expr("(target - before_ev + x - 1) div x"))
      .select(col("tot_us").as("n_users"), col("tot_ev").as("n_events"),
        (col("cum_us") - col("m") + col("need_in_block")).as("k_users"),
        round((col("cum_us") - col("m") + col("need_in_block")).cast("double")
          / col("tot_us").cast("double"), 9).as("user_frac"),
        (col("before_ev") + col("need_in_block") * col("x")).as("events_covered"),
        round((col("before_ev") + col("need_in_block") * col("x")).cast("double")
          / col("tot_ev").cast("double"), 9).as("events_frac"))
  }
  val e39Sql: String =
    """WITH pu AS (SELECT user_id, COUNT(*) AS x FROM events GROUP BY 1),
      b AS (SELECT x, COUNT(*) AS m FROM pu GROUP BY 1),
      c AS (SELECT x, m,
              CAST(SUM(x * m) OVER (ORDER BY x DESC) AS BIGINT) AS cum_ev,
              CAST(SUM(m) OVER (ORDER BY x DESC) AS BIGINT) AS cum_us,
              CAST(SUM(x * m) OVER () AS BIGINT) AS tot_ev,
              CAST(SUM(m) OVER () AS BIGINT) AS tot_us
            FROM b),
      t AS (SELECT *, (4 * tot_ev + 4) // 5 AS target,
                   cum_ev - x * m AS before_ev
            FROM c),
      s AS (SELECT *, (target - before_ev + x - 1) // x AS need_in_block
            FROM t WHERE cum_ev >= target AND before_ev < target)
      SELECT tot_us AS n_users, tot_ev AS n_events,
             CAST(cum_us - m + need_in_block AS BIGINT) AS k_users,
             round(CAST(cum_us - m + need_in_block AS DOUBLE)
                   / CAST(tot_us AS DOUBLE), 9) AS user_frac,
             CAST(before_ev + need_in_block * x AS BIGINT) AS events_covered,
             round(CAST(before_ev + need_in_block * x AS DOUBLE)
                   / CAST(tot_ev AS DOUBLE), 9) AS events_frac
      FROM s"""

  // ---- e40: behavioral-diversity entropy histogram ----
  // Per-user Shannon entropy of the event-type mix (0 = monomaniac
  // bot-ish, ln 5 = uniform explorer), rolled into a 10-bin histogram
  // with per-bin mean — the behavioral-diversity fingerprint feeding
  // abuse review and UX segmentation. Fact-scale stage: ONE (user,
  // type) count; per-user entropy is an in-row fold over that user's
  // <= 5 type counts (collect_list of exact ints, -SUM p ln p in a
  // fixed index order after an integer sort — deterministic IEEE both
  // engines); the histogram bins on exact comparisons of identical
  // doubles with a LITERAL 0.05-nat bin width (a literal, not
  // ln(5)/k, because ln(5) is a libm call whose last ulp could move a
  // floor() boundary between engines; 0.05 nats resolves the observed
  // 1.50–1.61 concentration into real bins). No window anywhere.
  val e40_behavior_entropy: Q = (s, d) => {
    val perType = Tables.events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val ent = perType.groupBy("user_id")
      .agg(sum("c").as("n"), sort_array(collect_list(col("c"))).as("cs"))
      .withColumn("entropy", expr(
        """aggregate(cs, CAST(0.0 AS DOUBLE),
             (acc, c) -> acc - (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                         * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))"""))
    ent.withColumn("bin",
        least(floor(col("entropy") / lit(0.05)).cast("long"), lit(32L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_users"),
        round(dsum(col("entropy")) / count(lit(1)), 9).as("mean_entropy"))
      .orderBy("bin")
  }
  val e40Sql: String =
    s"""WITH pt AS (SELECT user_id, event_type, COUNT(*) AS c
                 FROM events GROUP BY 1, 2),
      u AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
                   list_sort(list(c)) AS cs
            FROM pt GROUP BY 1),
      e AS (SELECT user_id,
              list_reduce(
                list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(cs, c ->
                    -(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                     * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))),
                (acc, v) -> acc + v) AS entropy
            FROM u),
      b AS (SELECT least(CAST(floor(entropy / CAST(0.05 AS DOUBLE)) AS BIGINT),
                         32) AS bin, entropy
            FROM e)
      SELECT bin, COUNT(*) AS n_users,
             round(${sqlSum("entropy")} / COUNT(*), 9) AS mean_entropy
      FROM b GROUP BY 1 ORDER BY bin"""

  // ---- e41: peak concurrency (interval overlap maximum) ----
  // Capacity's favorite number: the maximum number of simultaneously
  // active users per day. Activity intervals are each user's [first,
  // last] event of the day (the q27 session notion collapsed to the
  // day grain); the classic sweep — +1 at starts, −1 at ends,
  // running-sum maximum — runs per DAY partition in one window over
  // the users×2 marker frame (users-sized, never event-sized; the
  // fact-scale stage is the per-(user, day) min/max aggregate, map-
  // side combinable). Touching intervals count as concurrent: starts
  // sort before ends at equal timestamps (delta desc). All exact
  // integer microseconds and counts.
  val e41_peak_concurrency: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val iv = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi"))
    val marks = iv.select(col("day"), col("lo").as("t"), lit(1L).as("delta"))
      .unionAll(iv.select(col("day"), col("hi").as("t"), lit(-1L).as("delta")))
    val w = Window.partitionBy("day").orderBy(col("t"), desc("delta"))
      .rowsBetween(Window.unboundedPreceding, 0)
    marks.withColumn("conc", sum("delta").over(w))
      .groupBy("day")
      .agg((sum(when(col("delta") === 1, 1L).otherwise(0L))).as("n_users"),
        max("conc").as("peak_concurrency"))
      .orderBy("day")
  }
  val e41Sql: String =
    """WITH iv AS (SELECT CAST(ts AS DATE) AS day, user_id,
                MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
         FROM events GROUP BY 1, 2),
      mk AS (SELECT day, lo AS t, 1 AS delta FROM iv
             UNION ALL SELECT day, hi, -1 FROM iv),
      c AS (SELECT day, delta,
              CAST(SUM(delta) OVER (PARTITION BY day
                ORDER BY t, delta DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS conc
            FROM mk)
      SELECT day,
             CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_users,
             CAST(MAX(conc) AS BIGINT) AS peak_concurrency
      FROM c GROUP BY 1 ORDER BY day"""

  // ---- e42: weekly load profile (dow x hour heatmap + per-dow peak) ----
  // The autoscaling input: event volume by (weekday, hour) cell with
  // each cell's share of total and the peak hour per weekday flagged.
  // ONE combinable 168-cell aggregate at any fact scale; the peak is
  // an exact-integer argmax via max(struct(count, hour)) per dow —
  // count ties break toward the later hour, a total order, engine-
  // exact. Weekday numbering on the e26 cross-engine pin; shares are
  // single IEEE divisions.
  val e42_load_profile: Q = (s, d) => {
    val cells = Tables.events(s, d)
      .groupBy((dayofweek(to_date(col("ts"))) - 1).as("dow"),
        hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.agg(sum("n").as("total"))
    val peaks = cells.groupBy("dow")
      .agg(max(struct(col("n"), col("hr"))).as("pk"))
      .select(col("dow"), col("pk.hr").as("peak_hr"))
    cells.join(broadcast(peaks), "dow")
      .crossJoin(broadcast(tot))
      .select(col("dow"), col("hr"), col("n"),
        round(col("n").cast("double") / col("total").cast("double"), 9)
          .as("share"),
        (col("hr") === col("peak_hr")).as("is_peak_hour"))
      .orderBy("dow", "hr")
  }
  val e42Sql: String =
    """WITH cells AS (SELECT dayofweek(CAST(ts AS DATE)) AS dow,
                   CAST(hour(ts) AS INT) AS hr, COUNT(*) AS n
            FROM events GROUP BY 1, 2),
      t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells),
      pk AS (SELECT dow, max_by(hr, n * 100 + hr) AS peak_hr
             FROM cells GROUP BY 1)
      SELECT CAST(cells.dow AS INT) AS dow, hr, n,
             round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 9) AS share,
             hr = peak_hr AS is_peak_hour
      FROM cells JOIN pk ON cells.dow = pk.dow CROSS JOIN t
      ORDER BY dow, hr"""

  // ---- e44: daily new-vs-returning active mix ----
  // The dashboard line every growth chart starts with: each day's
  // actives split into first-ever-seen (new) and returning. One
  // (user, day) distinct pass, first day per user via a combinable min
  // aggregate, one users-sized join — never a window; new share is a
  // single IEEE division of exact counts. (e33 is the weekly state
  // machine; this is the daily mix it summarizes.)
  val e44_new_vs_returning: Q = (s, d) => {
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val first = ud.groupBy("user_id").agg(min("day").as("d0"))
    ud.join(first, "user_id")
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        count(when(col("day") === col("d0"), 1)).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
      .withColumn("new_share", round(
        col("n_new").cast("double") / col("n_active").cast("double"), 9))
      .orderBy("day")
  }
  val e44Sql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                 FROM events),
      f AS (SELECT user_id, MIN(day) AS d0 FROM ud GROUP BY 1)
      SELECT day, COUNT(*) AS n_active,
             COUNT(*) FILTER (WHERE day = d0) AS n_new,
             COUNT(*) - COUNT(*) FILTER (WHERE day = d0) AS n_returning,
             round(CAST(COUNT(*) FILTER (WHERE day = d0) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS new_share
      FROM ud JOIN f USING (user_id)
      GROUP BY 1 ORDER BY day"""

  // ---- e45: active-day streak distribution ----
  // Habit strength in one table: each user's LONGEST consecutive-day
  // streak, rolled into a histogram. The islands trick — day-index
  // minus row_number is constant within a consecutive run — runs in
  // ONE user-partitioned window over the (user, day) distinct frame
  // (active-days-sized, never event-sized); island lengths, per-user
  // max, then a combinable histogram. Every step exact integers.
  val e45_streaks: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("di", datediff(col("day"), lit("1970-01-01").cast("date"))
        .cast("long"))
    val w = Window.partitionBy("user_id").orderBy("di")
    val runs = ud
      .withColumn("grp", col("di") - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(max("len").as("max_streak"))
    runs.groupBy("max_streak")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("max_streak")
  }
  val e45Sql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                 FROM events),
      di AS (SELECT user_id, CAST(day - DATE '1970-01-01' AS BIGINT) AS di
             FROM ud),
      g AS (SELECT user_id,
                   di - row_number() OVER (PARTITION BY user_id ORDER BY di)
                     AS grp
            FROM di),
      runs AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2),
      mx AS (SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak
             FROM runs GROUP BY 1)
      SELECT max_streak, COUNT(*) AS n_users
      FROM mx GROUP BY 1 ORDER BY max_streak"""

  // ---- e46: lag-k autocorrelation (periodicity detector) ----
  // Is the series ACTUALLY weekly? Pearson correlation of each type's
  // daily counts against themselves at lag 1 and lag 7 — the number
  // that justifies (or debunks) e32's seasonal-naive lag choice and
  // e26's dow index. After the ONE fact-scale daily aggregate, lagged
  // pairs come from a broadcast self-join on the types×days frame (the
  // e32 discipline — no window); every moment (n, Σx, Σy, Σxy, Σx²,
  // Σy²) is an EXACT INT64 sum of counts, so r's numerator and the
  // two variance terms are exact integers — two sqrts and one division
  // at the very end, bit-identical cross-engine.
  val e46_autocorr: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    def acf(lag: Int): DataFrame = {
      val lagged = daily.select(col("event_type"),
        date_add(col("day"), lag).as("day"), col("n").as("y"))
      daily.join(broadcast(lagged), Seq("event_type", "day"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("np"),
          sum("n").as("sx"), sum("y").as("sy"),
          sum(col("n") * col("y")).as("sxy"),
          sum(col("n") * col("n")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("event_type"), lit(lag).as("lag"), col("np").as("n_pairs"),
          round((col("np") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (sqrt((col("np") * col("sxx") - col("sx") * col("sx"))
                .cast("double"))
              * sqrt((col("np") * col("syy") - col("sy") * col("sy"))
                .cast("double"))), 9).as("r"))
    }
    acf(1).unionAll(acf(7)).orderBy("event_type", "lag")
  }
  private def e46AcfSql(lag: Int): String =
    s"""SELECT event_type, $lag AS lag, COUNT(*) AS n_pairs,
          round(CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
                / (sqrt(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)
                         AS DOUBLE))
                   * sqrt(CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y)
                           AS DOUBLE))), 9) AS r
       FROM (SELECT c.event_type, c.n AS x, p.n AS y
             FROM daily c JOIN daily p
               ON c.event_type = p.event_type AND c.day = p.day + $lag)
       GROUP BY 1"""
  val e46Sql: String =
    s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                    COUNT(*) AS n
             FROM events GROUP BY 1, 2)
      SELECT * FROM (
        ${e46AcfSql(1)}
        UNION ALL
        ${e46AcfSql(7)}
      ) ORDER BY event_type, lag"""

  // ---- e47: attribution-window sweep ----
  // How long should the attribution window be? For every purchase, the
  // gap to the SAME USER's most recent prior click — computed with ONE
  // user-keyed carry-forward window over the interleaved event stream
  // (max of click-timestamps up to the current row; never a
  // purchases×clicks range join, whose expansion is per-user-activity²
  // at 100 TB) — then one combinable sweep rollup: purchases attributed
  // within 1, 3 and 7 days. Exact integer microseconds; rates are
  // single divisions. The table that ends the "7-day vs 1-day window"
  // argument with data.
  val e47_attribution_window: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val gaps = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("last_click_us",
        max(when(col("event_type") === "click", unix_micros(col("ts"))))
          .over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("gap_us", unix_micros(col("ts")) - col("last_click_us"))
    val day = 86400000000L
    gaps.agg(count(lit(1)).as("n_purchases"),
        count(when(col("gap_us") <= day, 1)).as("w1"),
        count(when(col("gap_us") <= 3 * day, 1)).as("w3"),
        count(when(col("gap_us") <= 7 * day, 1)).as("w7"))
      .select(explode(array(
        struct(lit(1L).as("k_days"), col("n_purchases"), col("w1").as("n_attributed")),
        struct(lit(3L).as("k_days"), col("n_purchases"), col("w3").as("n_attributed")),
        struct(lit(7L).as("k_days"), col("n_purchases"), col("w7").as("n_attributed"))))
        .as("r"))
      .select(col("r.k_days"), col("r.n_purchases"), col("r.n_attributed"))
      .withColumn("attribution_rate", round(
        col("n_attributed").cast("double") / col("n_purchases").cast("double"), 9))
      .orderBy("k_days")
  }
  val e47Sql: String =
    """WITH g AS (
        SELECT user_id, ts, event_type,
               MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_click_us
        FROM events),
      p AS (SELECT epoch_us(ts) - last_click_us AS gap_us
            FROM g WHERE event_type = 'purchase'),
      agg AS (SELECT COUNT(*) AS n_purchases,
                COUNT(*) FILTER (WHERE gap_us <= 86400000000) AS w1,
                COUNT(*) FILTER (WHERE gap_us <= 259200000000) AS w3,
                COUNT(*) FILTER (WHERE gap_us <= 604800000000) AS w7
              FROM p)
      SELECT k_days, n_purchases, n_attributed,
             round(CAST(n_attributed AS DOUBLE)
                   / CAST(n_purchases AS DOUBLE), 9) AS attribution_rate
      FROM (
        SELECT CAST(1 AS BIGINT) AS k_days, n_purchases, w1 AS n_attributed
        FROM agg
        UNION ALL SELECT CAST(3 AS BIGINT), n_purchases, w3 FROM agg
        UNION ALL SELECT CAST(7 AS BIGINT), n_purchases, w7 FROM agg)
      ORDER BY k_days"""

  // ---- e48: censored time-to-conversion hazard curve ----
  // Discrete survival analysis on the activation funnel: for each day
  // offset d since a user's first event, the hazard = P(first purchase
  // at exactly day d | still unconverted and OBSERVABLE at day d).
  // Right-censoring is handled the Kaplan-Meier way — a user only
  // enters day-d's risk set if the corpus horizon covers their day d
  // (first_day + d <= max corpus day), so late cohorts don't drag the
  // tail down. Plan shape: ONE user-keyed aggregate collapses the fact
  // table to a per-user (first_day, conversion_offset) pair; the 14
  // offsets then expand NARROWLY over that compact table (explode of a
  // 14-element literal sequence — no window, no self-join) and a final
  // combinable aggregate produces the 14-row curve. At 100 TB the only
  // wide stage is the per-user collapse — the minimum any cohort
  // statistic pays. Counts exact int64; the hazard is one division.
  // the library verb (GraftOps.conversionHazard) IS the implementation —
  // the oracle gate certifies the facade itself
  val e48_conversion_hazard: Q = (s, d) =>
    graft.api.GraftOps.conversionHazard(Tables.events(s, d),
      col("user_id"), col("ts"), col("event_type") === "purchase", 14)
  val e48Sql: String =
    """WITH u AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS f_day,
               MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
                 AS c_day
             FROM events GROUP BY 1),
      mx AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
      x AS (SELECT datediff('day', f_day, c_day) AS off, f_day, max_day
            FROM u CROSS JOIN mx),
      g AS (SELECT d, off FROM x
            CROSS JOIN (SELECT unnest(generate_series(0, 13)) AS d)
            WHERE f_day + CAST(d AS INTEGER) <= max_day
              AND (off IS NULL OR off >= d)),
      h AS (SELECT d, COUNT(*) AS at_risk,
              COUNT(*) FILTER (WHERE off = d) AS n_conv
            FROM g GROUP BY 1)
      SELECT CAST(d AS BIGINT) AS d, at_risk, n_conv,
             CASE WHEN at_risk > 0
                  THEN round(CAST(n_conv AS DOUBLE) / CAST(at_risk AS DOUBLE), 9)
             END AS hazard
      FROM h ORDER BY d"""

  // ---- e49: funnel stage-duration profile ----
  // e06 counts who converts; this measures HOW LONG each funnel hop
  // takes — per user the first view, first click at-or-after it, first
  // purchase at-or-after that, then one profile row per hop
  // (view→click, click→purchase): users, mean / median / min / max
  // duration. ONE user-keyed aggregate collapses the fact table to
  // three first-timestamps per user (conditional mins — combinable);
  // hop durations are exact integer microseconds; median is the
  // interpolated percentile both engines define identically (q29's
  // parity). No window, no self-join — the per-user collapse is the
  // only wide stage at any scale.
  val e49_funnel_durations: Q = (s, d) => {
    val u = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("us"))).as("v"))
    val u2 = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .join(u, "user_id")
      .groupBy("user_id", "v")
      .agg(min(when(col("event_type") === "click" && col("us") >= col("v"),
        col("us"))).as("c"))
    val u3 = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .join(u2, "user_id")
      .groupBy("user_id", "v", "c")
      .agg(min(when(col("event_type") === "purchase" && col("us") >= col("c"),
        col("us"))).as("p"))
    def hop(name: String, dur: org.apache.spark.sql.Column): DataFrame =
      u3.select(dur.as("d")).filter(col("d").isNotNull)
        .agg(count(lit(1)).as("n_users"),
          // exact integer mean: decimal-sum div count — no sub-ULP
          // decimal rounding on 1e11-magnitude doubles (see SURVEY §4)
          expr("CAST(CAST(SUM(CAST(d AS DECIMAL(30,0))) AS BIGINT) div COUNT(1) AS BIGINT)")
            .as("mean_us"),
          round(expr("percentile(d, 0.5)"), 1).as("p50_us"),
          min("d").as("min_us"), max("d").as("max_us"))
        .select(lit(name).as("hop"), col("n_users"), col("mean_us"),
          col("p50_us"), col("min_us"), col("max_us"))
    hop("1_view_to_click", col("c") - col("v"))
      .unionAll(hop("2_click_to_purchase", col("p") - col("c")))
      .orderBy("hop")
  }
  val e49Sql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      u1 AS (SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN us END) AS v
             FROM ev GROUP BY 1),
      u2 AS (SELECT ev.user_id, v,
               MIN(CASE WHEN event_type = 'click' AND us >= v THEN us END) AS c
             FROM ev JOIN u1 ON ev.user_id = u1.user_id GROUP BY 1, 2),
      u3 AS (SELECT ev.user_id, v, c,
               MIN(CASE WHEN event_type = 'purchase' AND us >= c THEN us END)
                 AS p
             FROM ev JOIN u2 ON ev.user_id = u2.user_id GROUP BY 1, 2, 3),
      h1 AS (SELECT '1_view_to_click' AS hop, COUNT(*) AS n_users,
               CAST(CAST(SUM(CAST(d AS DECIMAL(30,0))) AS BIGINT) // COUNT(*) AS BIGINT)
                 AS mean_us,
               round(quantile_cont(d, 0.5), 1) AS p50_us,
               MIN(d) AS min_us, MAX(d) AS max_us
             FROM (SELECT c - v AS d FROM u3 WHERE c IS NOT NULL)),
      h2 AS (SELECT '2_click_to_purchase' AS hop, COUNT(*) AS n_users,
               CAST(CAST(SUM(CAST(d AS DECIMAL(30,0))) AS BIGINT) // COUNT(*) AS BIGINT)
                 AS mean_us,
               round(quantile_cont(d, 0.5), 1) AS p50_us,
               MIN(d) AS min_us, MAX(d) AS max_us
             FROM (SELECT p - c AS d FROM u3 WHERE p IS NOT NULL))
      SELECT * FROM (SELECT * FROM h1 UNION ALL SELECT * FROM h2)
      ORDER BY hop"""

  // ---- e50: behavior-sequence corpus (sessions as sentences) ----
  // The behavioral-LM training-data builder: each 30-minute-gap session
  // becomes an ordered event-type "sentence", and the output is the
  // corpus vocabulary report — the top-10 most common session sentences
  // with counts and share, plus the distinct-sentence count riding
  // every row. Sessionization is q27's lag+cumsum (ONE user-keyed
  // window); sentence assembly is an in-row array sort + join (ordered
  // by exact microseconds with event_id tie-break, engine-exact);
  // the sentence vocabulary aggregate is map-side combinable and the
  // top-10 rides TakeOrderedAndProject. At 100 TB the user window and
  // the sentence-key aggregate are the only wide stages.
  val e50_behavior_corpus: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = Tables.events(s, d)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("is_new", when(col("prev_ts").isNull ||
        col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
        .otherwise(0L))
      .withColumn("session_id",
        sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(concat_ws(" ", expr(
        "transform(array_sort(collect_list(struct(unix_micros(ts) AS us, event_id, event_type))), x -> x.event_type)"))
        .as("sentence"))
    val vocab = sessions.groupBy("sentence")
      .agg(count(lit(1)).as("n_sessions"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = vocab.agg(sum("n_sessions").as("total_sessions"),
      count(lit(1)).as("distinct_sentences"))
    val top = graft.api.GraftOps.boundedSingleGroup(
      vocab.orderBy(desc("n_sessions"), col("sentence")).limit(10))
    top
      .withColumn("rank", row_number().over(
        Window.partitionBy("__g")
          .orderBy(desc("n_sessions"), col("sentence"))).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("share", round(
        col("n_sessions").cast("double") / col("total_sessions").cast("double"), 9))
      .select(col("rank"), col("sentence"), col("n_sessions"), col("share"),
        col("distinct_sentences"))
      .orderBy("rank")
  }
  val e50Sql: String =
    """WITH st AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      se AS (SELECT user_id, ts, event_id, event_type,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             FROM st),
      sen AS (SELECT user_id, session_id,
                string_agg(event_type, ' ' ORDER BY epoch_us(ts), event_id)
                  AS sentence
              FROM se GROUP BY 1, 2),
      voc AS (SELECT sentence, COUNT(*) AS n_sessions FROM sen GROUP BY 1),
      tot AS (SELECT CAST(SUM(n_sessions) AS BIGINT) AS total_sessions,
                COUNT(*) AS distinct_sentences FROM voc),
      top AS (SELECT sentence, n_sessions FROM voc
              ORDER BY n_sessions DESC, sentence LIMIT 10)
      SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, sentence)
               AS BIGINT) AS rank,
             sentence, n_sessions,
             round(CAST(n_sessions AS DOUBLE)
                   / CAST(total_sessions AS DOUBLE), 9) AS share,
             distinct_sentences
      FROM top CROSS JOIN tot ORDER BY rank"""

  // ---- e51: value-volume elasticity (does spend scale with activity?) ----
  // Per event type, the OLS fit of daily total value on daily event
  // count across the corpus's days — slope ≈ mean value/event means
  // value is VOLUME-driven; a flat slope with high intercept means a
  // base load independent of activity. Day cells come from ONE
  // combinable aggregate (daily value sums decimal-exact, rounded at
  // 1e-6 so both engines regress on identical inputs); the regression
  // is a closed form over five decimal-summed moments, one double
  // rounding at the end. Day-cell table is calendar-sized — the fact
  // scan is the only wide stage.
  val e51_elasticity: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        round(dsum(col("value")), 6).as("v"))
    daily
      .withColumn("nn", (col("n") * col("n")).cast("decimal(30,6)"))
      .withColumn("nv", round(col("n") * col("v"), 6).cast("decimal(30,6)"))
      .withColumn("vv", round(col("v") * col("v"), 6).cast("decimal(30,6)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("k"),
        sum(col("n").cast("decimal(30,6)")).as("sn"),
        sum(col("v").cast("decimal(30,6)")).as("sv"),
        sum(col("nn")).as("snn"), sum(col("nv")).as("snv"),
        sum(col("vv")).as("svv"))
      .withColumn("den",
        col("k").cast("double") * col("snn").cast("double")
          - col("sn").cast("double") * col("sn").cast("double"))
      .withColumn("slope", round(
        (col("k").cast("double") * col("snv").cast("double")
          - col("sn").cast("double") * col("sv").cast("double")) / col("den"), 9))
      .withColumn("intercept", round(
        (col("sv").cast("double") - col("slope") * col("sn").cast("double"))
          / col("k").cast("double"), 9))
      .withColumn("r2", round(
        pow(col("k").cast("double") * col("snv").cast("double")
          - col("sn").cast("double") * col("sv").cast("double"), 2)
          / (col("den")
            * (col("k").cast("double") * col("svv").cast("double")
              - col("sv").cast("double") * col("sv").cast("double"))), 9))
      .select(col("event_type"), col("k").as("n_days"), col("slope"),
        col("intercept"), col("r2"))
      .orderBy("event_type")
  }
  val e51Sql: String =
    s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n, round(${sqlSum("value")}, 6) AS v
           FROM events GROUP BY 1, 2),
      m AS (SELECT event_type, COUNT(*) AS k,
              CAST(SUM(CAST(n AS DECIMAL(30,6))) AS DOUBLE) AS sn,
              CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) AS sv,
              CAST(SUM(CAST(n * n AS DECIMAL(30,6))) AS DOUBLE) AS snn,
              CAST(SUM(CAST(round(n * v, 6) AS DECIMAL(30,6))) AS DOUBLE) AS snv,
              CAST(SUM(CAST(round(v * v, 6) AS DECIMAL(30,6))) AS DOUBLE) AS svv
            FROM daily GROUP BY 1),
      f AS (SELECT event_type, k, sn, sv, snv, svv,
              k * snn - sn * sn AS den,
              round((k * snv - sn * sv) / (k * snn - sn * sn), 9) AS slope
            FROM m)
      SELECT event_type, k AS n_days, slope,
             round((sv - slope * sn) / k, 9) AS intercept,
             round(pow(k * snv - sn * sv, 2)
                   / (den * (k * svv - sv * sv)), 9) AS r2
      FROM f ORDER BY event_type"""

  // ---- e52: repeat-purchase latency curve ----
  // e49 measures the acquisition funnel; this measures the REPEAT
  // loop: per purchase-order transition (1st→2nd, 2nd→3rd, 3rd→4th),
  // how many users make it and how long they take — the curve lifetime
  // models are fit to. ONE user-keyed window ranks each user's
  // purchases (exact microsecond order, id tie-break); consecutive
  // ranks join on (user, rank) — a metadata-thin equi-join, never a
  // purchases×purchases expansion; per-transition stats are one
  // combinable rollup. Exact integer gaps, q29-parity medians.
  val e52_repeat_purchase_curve: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("k", row_number().over(w))
      .filter(col("k") <= 4)
    val gaps = p.select(col("user_id"), col("k"), col("us"))
      .join(p.select(col("user_id"), (col("k") - 1).as("k"),
        col("us").as("next_us")), Seq("user_id", "k"))
      .withColumn("gap_us", col("next_us") - col("us"))
    gaps.groupBy(col("k").cast("long").as("transition"))
      .agg(count(lit(1)).as("n_users"),
        // exact integer mean — same §4 rationale as e49
        expr("CAST(CAST(SUM(CAST(gap_us AS DECIMAL(30,0))) AS BIGINT) div COUNT(1) AS BIGINT)")
          .as("mean_gap_us"),
        round(expr("percentile(gap_us, 0.5)"), 1).as("p50_gap_us"),
        min("gap_us").as("min_gap_us"))
      .orderBy("transition")
  }
  val e52Sql: String =
    """WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS us,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS k
             FROM events WHERE event_type = 'purchase'),
      p4 AS (SELECT * FROM p WHERE k <= 4),
      g AS (SELECT a.user_id, a.k, b.us - a.us AS gap_us
            FROM p4 a JOIN p4 b
              ON a.user_id = b.user_id AND b.k = a.k + 1)
      SELECT CAST(k AS BIGINT) AS transition, COUNT(*) AS n_users,
             CAST(CAST(SUM(CAST(gap_us AS DECIMAL(30,0))) AS BIGINT) // COUNT(*) AS BIGINT)
               AS mean_gap_us,
             round(quantile_cont(gap_us, 0.5), 1) AS p50_gap_us,
             MIN(gap_us) AS min_gap_us
      FROM g GROUP BY 1 ORDER BY transition"""

  // ---- e53: attribution model comparison (first-touch vs last-touch) ----
  // The marketing-analytics argument, settled with one table: every
  // purchase's value credited to the user's FIRST preceding
  // non-purchase event type vs their LAST preceding one, side by side
  // per type. e12 implements one model; this puts both on the same
  // scan so the delta is readable. ONE user-keyed carry-forward window
  // pass computes both touches simultaneously (first_value and
  // last_value over the same running frame — one exchange serves
  // both); credit rollups are combinable decimal-exact sums.
  val e53_attribution_compare: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touched = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .withColumn("tch",
        when(col("event_type") =!= "purchase", col("event_type")))
      .withColumn("first_touch", first(col("tch"), ignoreNulls = true).over(w))
      .withColumn("last_touch", last(col("tch"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .filter(col("first_touch").isNotNull)
    val ft = touched.groupBy(col("first_touch").as("touch_type"))
      .agg(count(lit(1)).as("n_first"),
        round(dsum(col("value")), 6).as("value_first"))
    val lt = touched.groupBy(col("last_touch").as("touch_type"))
      .agg(count(lit(1)).as("n_last"),
        round(dsum(col("value")), 6).as("value_last"))
    ft.join(lt, Seq("touch_type"), "full_outer")
      .na.fill(0L, Seq("n_first", "n_last"))
      .na.fill(0.0, Seq("value_first", "value_last"))
      .withColumn("credit_shift", col("n_last") - col("n_first"))
      .orderBy("touch_type")
  }
  val e53Sql: String =
    s"""WITH t AS (
        SELECT user_id, ts, event_id, event_type, value,
               first_value(CASE WHEN event_type <> 'purchase'
                                THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS first_touch,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS last_touch
        FROM events),
      p AS (SELECT * FROM t
            WHERE event_type = 'purchase' AND first_touch IS NOT NULL),
      f AS (SELECT first_touch AS touch_type, COUNT(*) AS n_first,
              round(${sqlSum("value")}, 6) AS value_first
            FROM p GROUP BY 1),
      l AS (SELECT last_touch AS touch_type, COUNT(*) AS n_last,
              round(${sqlSum("value")}, 6) AS value_last
            FROM p GROUP BY 1)
      SELECT touch_type,
             COALESCE(n_first, 0) AS n_first,
             COALESCE(value_first, 0.0) AS value_first,
             COALESCE(n_last, 0) AS n_last,
             COALESCE(value_last, 0.0) AS value_last,
             COALESCE(n_last, 0) - COALESCE(n_first, 0) AS credit_shift
      FROM f FULL OUTER JOIN l USING (touch_type)
      ORDER BY touch_type"""

  val queries: Map[String, Q] = Map(
    "e53_attribution_compare" -> e53_attribution_compare,
    "e52_repeat_purchase_curve" -> e52_repeat_purchase_curve,
    "e51_elasticity"         -> e51_elasticity,
    "e50_behavior_corpus"    -> e50_behavior_corpus,
    "e49_funnel_durations"   -> e49_funnel_durations,
    "e48_conversion_hazard"  -> e48_conversion_hazard,
    "e37_retention_fit"      -> e37_retention_fit,
    "e47_attribution_window" -> e47_attribution_window,
    "e46_autocorr"           -> e46_autocorr,
    "e45_streaks"            -> e45_streaks,
    "e44_new_vs_returning"   -> e44_new_vs_returning,
    "e42_load_profile"       -> e42_load_profile,
    "e41_peak_concurrency"   -> e41_peak_concurrency,
    "e40_behavior_entropy"   -> e40_behavior_entropy,
    "e39_pareto_point"       -> e39_pareto_point,
    "e31_assoc_rules"        -> e31_assoc_rules,
    "e32_forecast_backtest"  -> e32_forecast_backtest,
    "e33_growth_accounting"  -> e33_growth_accounting,
    "e35_seasonal_decompose" -> e35_seasonal_decompose,
    "e36_slo_burn"           -> e36_slo_burn,
  )
  val oracles: Map[String, String] = Map(
    "e53_attribution_compare" -> e53Sql,
    "e52_repeat_purchase_curve" -> e52Sql,
    "e51_elasticity"         -> e51Sql,
    "e50_behavior_corpus"    -> e50Sql,
    "e49_funnel_durations"   -> e49Sql,
    "e48_conversion_hazard"  -> e48Sql,
    "e37_retention_fit"      -> e37Sql,
    "e47_attribution_window" -> e47Sql,
    "e46_autocorr"           -> e46Sql,
    "e45_streaks"            -> e45Sql,
    "e44_new_vs_returning"   -> e44Sql,
    "e42_load_profile"       -> e42Sql,
    "e41_peak_concurrency"   -> e41Sql,
    "e40_behavior_entropy"   -> e40Sql,
    "e39_pareto_point"       -> e39Sql,
    "e31_assoc_rules"        -> e31Sql,
    "e32_forecast_backtest"  -> e32Sql,
    "e33_growth_accounting"  -> e33Sql,
    "e35_seasonal_decompose" -> e35Sql,
    "e36_slo_burn"           -> e36Sql,
  )
}
