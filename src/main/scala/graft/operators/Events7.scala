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
  val e33_growth_accounting: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val uw = Tables.events(s, d)
      .select(col("user_id"), trunc(to_date(col("ts")), "week").as("wk"))
      .distinct()
      .withColumn("wi",
        expr("CAST(datediff(wk, DATE '1970-01-05') div 7 AS BIGINT)"))
    val w = Window.partitionBy("user_id").orderBy("wi")
    val st = uw
      .withColumn("prev", lag(col("wi"), 1).over(w))
      .withColumn("nxt", lead(col("wi"), 1).over(w))
    val mx = uw.agg(max("wi").as("maxwi"))
    val active = st.groupBy("wi").agg(
      count(lit(1)).as("n_active"),
      count(when(col("prev").isNull, 1)).as("n_new"),
      count(when(col("prev") === col("wi") - 1, 1)).as("n_retained"),
      count(when(col("prev").isNotNull && col("prev") < col("wi") - 1, 1))
        .as("n_resurrected"))
    val churn = st.crossJoin(broadcast(mx))
      .filter((col("nxt").isNull && col("wi") < col("maxwi"))
        || col("nxt") > col("wi") + 1)
      .groupBy((col("wi") + 1).as("wi"))
      .agg(count(lit(1)).as("n_churned_in"))
    active.join(churn, Seq("wi"), "left")
      .na.fill(0L, Seq("n_churned_in"))
      .withColumn("week",
        date_add(lit("1970-01-05").cast("date"), (col("wi") * 7).cast("int")))
      .select("week", "n_active", "n_new", "n_retained", "n_resurrected",
        "n_churned_in")
      .orderBy("week")
  }
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

  val queries: Map[String, Q] = Map(
    "e31_assoc_rules"        -> e31_assoc_rules,
    "e32_forecast_backtest"  -> e32_forecast_backtest,
    "e33_growth_accounting"  -> e33_growth_accounting,
  )
  val oracles: Map[String, String] = Map(
    "e31_assoc_rules"        -> e31Sql,
    "e32_forecast_backtest"  -> e32Sql,
    "e33_growth_accounting"  -> e33Sql,
  )
}
