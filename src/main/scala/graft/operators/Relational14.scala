package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.{Stable, Tables}

/** Relational / warehouse kernels, part 14: uncertainty + semi-additive. */
object Relational14 {
  type Q = (SparkSession, String) => DataFrame

  // ---- q106: Poisson-bootstrap confidence intervals ----
  // Error bars for a 100 TB aggregate, without distributional
  // assumptions and WITHOUT resampling shuffles: the Poisson bootstrap
  // (Chamandy et al., Google 2012 — "Estimating Uncertainty for
  // Massive Data Streams") replaces draw-with-replacement (which needs
  // the whole sample in one place) with an independent per-row
  // Poisson(1) replication weight per resample — so B=32 resamples are
  // ONE narrow map (row × B in-row explode, collapsed immediately by
  // the map-side-combinable weighted aggregate) and the statistic
  // distribution falls out of a (group × B)-sized frame. This is THE
  // scalable bootstrap: no row ever leaves its partition to be
  // "redrawn".
  //
  // Determinism (what makes it oracle-replayable where rand() never
  // is): the Poisson weights invert q26's md5-uniform on (orderkey:b)
  // against FIXED CDF literals (e^-1 partial sums), so every engine
  // draws the identical resample. Weighted sums ride DECIMAL(30,4) —
  // EXACT, since w·x of an integer weight and a 2-dp price is a 2-dp
  // value — and every decimal's unscaled value stays < 2^53 so the
  // double casts are bit-identical. The ~90% CI is exact order
  // statistics (ranks 2 and 31 of 32, b as tiebreak) over the
  // group-partitioned resample frame; se is decimal-moment based.
  val q106_bootstrap_ci: Q = (s, d) => {
    val B = 32
    val rs = Tables.orders(s, d)
      .select(col("o_orderpriority").as("grp"), col("o_totalprice").as("x"),
        col("o_orderkey"))
      .select(col("grp"), col("x"), col("o_orderkey"),
        explode(expr(s"sequence(0, ${B - 1})")).as("b"))
      .withColumn("u",
        conv(substring(md5(concat_ws(":", col("o_orderkey"), col("b"))),
          1, 8), 16, 10).cast("long").cast("double") / lit(4294967296.0))
      .withColumn("w",
        when(col("u") < 0.36787944117144233, 0)
          .when(col("u") < 0.7357588823428847, 1)
          .when(col("u") < 0.9196986029286058, 2)
          .when(col("u") < 0.9810118431238462, 3)
          .when(col("u") < 0.9963401531726563, 4)
          .otherwise(5).cast("long"))
    val means = rs.groupBy("grp", "b").agg(
      (sum((col("w") * col("x")).cast(DecimalType(30, 4))).cast("double")
        / sum("w")).as("mb"))
    val ranked = means.withColumn("rk",
      row_number().over(Window.partitionBy("grp").orderBy("mb", "b")))
    val point = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(count(lit(1)).as("n_rows"),
        round(Stable.davg(col("o_totalprice")), 9).as("mean_x"))
    ranked.groupBy("grp").agg(
      round(min(when(col("rk") === 2, col("mb"))), 9).as("ci_lo"),
      round(min(when(col("rk") === 31, col("mb"))), 9).as("ci_hi"),
      sum(col("mb").cast(DecimalType(30, 6))).cast("double").as("s1"),
      sum((col("mb") * col("mb")).cast(DecimalType(30, 2)))
        .cast("double").as("s2"))
      .withColumn("se",
        round(sqrt((col("s2") - col("s1") * col("s1") / lit(B))
          / lit(B - 1)), 9))
      .join(broadcast(point), "grp")
      .select("grp", "n_rows", "mean_x", "ci_lo", "ci_hi", "se")
      .orderBy("grp")
  }
  val q106Sql: String =
    """WITH rs AS (
        SELECT o_orderpriority AS grp, o_totalprice AS x, o_orderkey, b,
          ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || ':'
                                 || CAST(b AS VARCHAR)), 1, 8))::BIGINT
            / CAST(4294967296 AS DOUBLE) AS u
        FROM orders, (SELECT unnest(range(0, 32)) AS b)),
      wt AS (SELECT grp, x, b,
               CAST(CASE WHEN u < 0.36787944117144233 THEN 0
                    WHEN u < 0.7357588823428847 THEN 1
                    WHEN u < 0.9196986029286058 THEN 2
                    WHEN u < 0.9810118431238462 THEN 3
                    WHEN u < 0.9963401531726563 THEN 4
                    ELSE 5 END AS BIGINT) AS w
             FROM rs),
      mb AS (SELECT grp, b,
               CAST(SUM(CAST(w * x AS DECIMAL(30,4))) AS DOUBLE) / SUM(w)
                 AS mb
             FROM wt GROUP BY 1, 2),
      rk AS (SELECT grp, b, mb,
               row_number() OVER (PARTITION BY grp ORDER BY mb, b) AS rk
             FROM mb),
      ci AS (SELECT grp,
               round(MIN(CASE WHEN rk = 2 THEN mb END), 9) AS ci_lo,
               round(MIN(CASE WHEN rk = 31 THEN mb END), 9) AS ci_hi,
               CAST(SUM(CAST(mb AS DECIMAL(30,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(mb * mb AS DECIMAL(30,2))) AS DOUBLE) AS s2
             FROM rk GROUP BY 1),
      pt AS (SELECT o_orderpriority AS grp, COUNT(*) AS n_rows,
               round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                     AS DOUBLE) / COUNT(o_totalprice), 9) AS mean_x
             FROM orders GROUP BY 1)
      SELECT ci.grp AS grp, n_rows, mean_x, ci_lo, ci_hi,
        round(sqrt((s2 - s1 * s1 / 32) / 31), 9) AS se
      FROM ci JOIN pt ON ci.grp = pt.grp
      ORDER BY grp"""

  // ---- q107: semi-additive month-end balance rollup ----
  // The Kimball semi-additive kernel the q-family lacked: a BALANCE is
  // summable across accounts but NOT across time — month-end portfolio
  // value is Σ over entities of each entity's LAST observation as of
  // the month end, with entities quiet that month CARRYING FORWARD
  // their prior balance. (q68 compacts to one latest record; this
  // builds the full periodic snapshot fact table behind every
  // balance/AUM/inventory dashboard.) Balance here = the customer's
  // latest order value, observed at order grain.
  //
  // Engine shape: ONE fact-scale pass collapses orders to
  // (customer, month, last-order-value) via a keyed dense window; the
  // carry-forward runs on the customer × month-spine frame (spine is a
  // broadcast in-row sequence — q97's trick — so the expansion is a
  // bounded metadata multiplier, exactly the periodic-snapshot build
  // cost every warehouse pays), with last-non-null-value over the
  // customer-keyed month window. Never an unpartitioned window; the
  // monthly rollup is combinable.
  //
  // Exactness: balances are 2-dp prices picked by an integer-ordered
  // window (date, orderkey tiebreak); monthly sums ride Stable's
  // decimal; the one division per month is IEEE on identical doubles.
  val q107_semi_additive: Q = (s, d) => {
    val mo = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
    val lastPerMonth = mo
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey", "month")
          .orderBy(desc("o_orderdate"), desc("o_orderkey"))))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("month"),
        col("o_totalprice").as("balance"))
    val bounds = mo.agg(min("month").as("mn"), max("month").as("mx"))
    val spine = bounds.select(explode(expr(
      "sequence(mn, mx, interval 1 month)")).as("month"))
    val grid = Tables.customer(s, d).select(col("c_custkey"))
      .crossJoin(broadcast(spine))
    val carried = grid
      .join(lastPerMonth,
        col("c_custkey") === col("o_custkey")
          && grid("month") === lastPerMonth("month"), "left")
      .select(col("c_custkey"), grid("month").as("month"), col("balance"))
      .withColumn("bal",
        last(col("balance"), ignoreNulls = true).over(
          Window.partitionBy("c_custkey").orderBy("month")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    carried.groupBy("month").agg(
      count(col("bal")).as("n_with_balance"),
      count(col("balance")).as("n_active_in_month"),
      // NOT rounded: the sum of 2-dp balances is already an exact decimal
      // whose double cast agrees bit-for-bit; round(·,9) at 1e9 magnitude
      // is below the double's ULP and engine round() impls diverge there
      // (the e52 lesson)
      coalesce(Stable.dsum(col("bal")), lit(0.0)).as("total_balance"))
      .withColumn("avg_balance",
        when(col("n_with_balance") > 0,
          round(col("total_balance") / col("n_with_balance"), 9)))
      .orderBy("month")
  }
  val q107Sql: String =
    """WITH mo AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month
             FROM orders),
      lpm AS (SELECT o_custkey, month, o_totalprice AS balance FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY o_custkey, month
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                FROM mo) t WHERE rn = 1),
      b AS (SELECT min(month) AS mn, max(month) AS mx FROM mo),
      spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 MONTH))
                  ::DATE AS month FROM b),
      grid AS (SELECT c_custkey, month FROM customer CROSS JOIN spine),
      car AS (SELECT g.c_custkey, g.month, lpm.balance,
               last_value(lpm.balance IGNORE NULLS) OVER (
                 PARTITION BY g.c_custkey ORDER BY g.month
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
             FROM grid g LEFT JOIN lpm
               ON g.c_custkey = lpm.o_custkey AND g.month = lpm.month)
      SELECT month, COUNT(bal) AS n_with_balance,
        COUNT(balance) AS n_active_in_month,
        COALESCE(CAST(SUM(CAST(bal AS DECIMAL(30,6))) AS DOUBLE),
              CAST(0.0 AS DOUBLE)) AS total_balance,
        CASE WHEN COUNT(bal) > 0 THEN
          round(COALESCE(CAST(SUM(CAST(bal AS DECIMAL(30,6)))
                AS DOUBLE), CAST(0.0 AS DOUBLE)) / COUNT(bal), 9)
        END AS avg_balance
      FROM car GROUP BY month ORDER BY month"""

  // ---- q108: exact weighted quantiles (the weighted-median kernel) ----
  // The statistic q29/q62 (unweighted percentiles) and q73 (weighted
  // moments) both miss: order statistics where each row carries a
  // WEIGHT — "the median price per unit shipped" weighs a 50-unit line
  // 50×, and the unweighted median silently answers a different
  // question. Weighted type-1 quantile: the smallest value whose
  // cumulative weight reaches q·W.
  //
  // Engine shape: pre-aggregate to (group, value) with summed weights
  // FIRST (map-side combinable — ties collapse before any window), then
  // one group-partitioned sort window for the running weight, and the
  // quantile picks are conditional mins. The quantile threshold tests
  // run on EXACT INTEGERS (2·cumw ≥ W, 4·cumw ≥ W, 4·cumw ≥ 3·W —
  // quantities are integral, so weights are exact longs and there is NO
  // floating point anywhere until the output values themselves, which
  // are picked, not computed).
  val q108_weighted_median: Q = (s, d) => {
    val byVal = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_extendedprice").as("v"))
      .agg(sum(col("l_quantity").cast("long")).as("w"))
    val wc = Window.partitionBy("flag").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wtot = Window.partitionBy("flag")
    byVal
      .withColumn("cumw", sum("w").over(wc))
      .withColumn("totw", sum("w").over(wtot))
      .groupBy("flag").agg(
        max("totw").as("total_weight"),
        min(when(col("cumw") * 4 >= col("totw"), col("v"))).as("wp25"),
        min(when(col("cumw") * 2 >= col("totw"), col("v"))).as("wmedian"),
        min(when(col("cumw") * 4 >= col("totw") * 3, col("v"))).as("wp75"))
      .orderBy("flag")
  }
  val q108Sql: String =
    """WITH bv AS (SELECT l_returnflag AS flag, l_extendedprice AS v,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
             FROM lineitem GROUP BY 1, 2),
      cw AS (SELECT flag, v, w,
               CAST(SUM(w) OVER (PARTITION BY flag ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cumw,
               CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS totw
             FROM bv)
      SELECT flag, MAX(totw) AS total_weight,
        MIN(CASE WHEN cumw * 4 >= totw THEN v END) AS wp25,
        MIN(CASE WHEN cumw * 2 >= totw THEN v END) AS wmedian,
        MIN(CASE WHEN cumw * 4 >= totw * 3 THEN v END) AS wp75
      FROM cw GROUP BY flag ORDER BY flag"""

  // ---- q109: the distinct-count cube (mergeable KMV day-sketches) ----
  // COUNT(DISTINCT) is the one common aggregate that is NOT additive —
  // you cannot roll daily uniques up to weekly uniques, which is why
  // every pre-aggregated dashboard either stores one row per (window,
  // grain) combination or switches to mergeable sketches. This operator
  // runs the sketch cube end-to-end and SHOWS the failure it fixes: per
  // day, the KMV state (d07's k-minimum-values, k=64, the engine-shared
  // 48-bit md5 hash both engines reproduce) materializes as k rows of
  // pre-aggregated state; weeks then merge DAY STATE ONLY — union the
  // day sketches, keep the k smallest, read the estimate off the k-th
  // minimum — never re-touching fact rows (the IVM discipline of
  // q92/q104 applied to distinct counting). Output per week: the exact
  // distinct, the naive Σ-of-daily-distincts (wrong, overcounts — the
  // non-additivity made visible), the sketch estimate, and its relative
  // error.
  //
  // Engine shape: ONE fact-scale distinct-(day, hash) collapse, a
  // day-partitioned rank window over the (days × uniques)-bounded hash
  // frame to take day-local k-minima, then everything downstream is
  // day-state-sized. Weeks use q97's absolute Monday-epoch index (ISO
  // week-numbering rules differ across engines; integer day arithmetic
  // doesn't).
  //
  // Exactness: hashes and k-th minima are exact integers; the estimate
  // (k−1)·2⁴⁸/kth is one IEEE division of exact integers, the error one
  // more — both rounded 1e-9; the oracle replays the whole pipeline.
  val q109_distinct_cube: Q = (s, d) => {
    val k = 64
    val dh = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .select(col("day"),
        // floor(.../7), not `div`: Spark div truncates toward zero while
        // DuckDB // floors, and the two diverge for days before the
        // 1970-01-05 Monday epoch — floor matches the oracle everywhere.
        floor(expr("datediff(day, DATE '1970-01-05')") / 7)
          .cast("long").as("week"),
        conv(substring(md5(col("user_id").cast("string")), 1, 12), 16, 10)
          .cast("long").as("h"))
    val daySketch = dh
      .withColumn("rk", row_number().over(
        Window.partitionBy("day").orderBy("h")))
      .filter(col("rk") <= k)
      .select("week", "day", "h")
    val weekMerged = daySketch.select("week", "h").distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy("week").orderBy("h")))
      .filter(col("rk") <= k)
      .groupBy("week")
      .agg(count(lit(1)).as("n_heap"), max("h").as("kth_min"))
      .withColumn("kmv_est",
        when(col("n_heap") < k, col("n_heap").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(281474976710656.0)
            / col("kth_min").cast("double")))
    val exact = dh.groupBy("week")
      .agg(countDistinct("h").as("exact_distinct"))
    val dailySum = dh.groupBy("week", "day")
      .agg(countDistinct("h").as("dd"))
      .groupBy("week").agg(sum("dd").as("daily_sum"))
    exact.join(dailySum, "week").join(weekMerged, "week")
      .select(col("week"), col("exact_distinct"), col("daily_sum"),
        round(col("kmv_est"), 9).as("kmv_est"),
        round(abs(col("kmv_est") - col("exact_distinct").cast("double"))
          / col("exact_distinct").cast("double"), 9).as("rel_err"))
      .orderBy("week")
  }
  val q109Sql: String =
    """WITH dh AS (SELECT day,
               CAST((day - DATE '1970-01-05') // 7 AS BIGINT) AS week, h
             FROM (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE)
                     AS day,
                     ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12))
                       ::BIGINT AS h
                   FROM events) t),
      ds AS (SELECT week, day, h FROM (
               SELECT *, row_number() OVER (PARTITION BY day ORDER BY h)
                 AS rk FROM dh) r WHERE rk <= 64),
      wm AS (SELECT week, COUNT(*) AS n_heap, MAX(h) AS kth_min FROM (
               SELECT week, h, row_number() OVER (
                   PARTITION BY week ORDER BY h) AS rk
               FROM (SELECT DISTINCT week, h FROM ds) u) r
             WHERE rk <= 64 GROUP BY 1),
      we AS (SELECT week, n_heap, kth_min,
               CASE WHEN n_heap < 64 THEN CAST(n_heap AS DOUBLE)
                    ELSE CAST(63 AS DOUBLE) * CAST(281474976710656.0 AS DOUBLE)
                         / CAST(kth_min AS DOUBLE) END AS kmv_est
             FROM wm),
      ex AS (SELECT week, COUNT(DISTINCT h) AS exact_distinct FROM dh
             GROUP BY 1),
      dsum AS (SELECT week, CAST(SUM(dd) AS BIGINT) AS daily_sum FROM (
                 SELECT week, day, COUNT(DISTINCT h) AS dd FROM dh
                 GROUP BY 1, 2) t GROUP BY 1)
      SELECT ex.week AS week, exact_distinct, daily_sum,
        round(kmv_est, 9) AS kmv_est,
        round(abs(kmv_est - CAST(exact_distinct AS DOUBLE))
              / CAST(exact_distinct AS DOUBLE), 9) AS rel_err
      FROM ex JOIN dsum ON ex.week = dsum.week
        JOIN we ON ex.week = we.week
      ORDER BY week"""

  // ---- q110: rolling OLS trend per group (28-day revenue slope) ----
  // The trend-detection verb dashboards rebuild daily: per nation, the
  // ordinary-least-squares slope of daily revenue against the calendar
  // day over a trailing 28-day RANGE window (calendar-addressed, so gap
  // days shrink n instead of silently stretching the window like a ROWS
  // frame would). Numeric discipline: revenue is summed as exact INTEGER
  // CENTS (2-dp decimal × 100 — lossless) so every windowed sum is a
  // long, immune to the windowed-double hazard where engines disagree
  // on summation ORDER inside sliding frames (segment-tree vs running
  // accumulation); Σx/Σx²/Σxy all stay well under 2^53. The closed form
  // slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is a RATIONAL — and rational
  // quotients land exactly on .5×10⁻ᵏ rounding boundaries (the s22/e52
  // half-boundary trap: this query's first draft diverged by 1 ulp at
  // exactly such a row), so the published slope is an exact INTEGER of
  // micro-dollars/day via shifted floor division (offset makes the
  // numerator nonnegative, where Spark's truncating `div` and DuckDB's
  // flooring `//` agree; DECIMAL(38,0)/HUGEINT intermediates since
  // num·10⁴ overflows a long), with the display double derived FROM
  // that integer — no double round() anywhere in the output path.
  // Scale: one fact-scale day rollup, then windows over the
  // nation×day frame (dimension-sized); no self-join.
  // body IS GraftOps.rollingTrend — the facade verb the oracle
  // certifies. Cents via round-then-cast: the price is a 2-dp value
  // stored as double, so x*100 sits a hair off an integer; a bare long
  // cast TRUNCATES in Spark but ROUNDS in DuckDB — round() first makes
  // both engines land on the same exact integer. (The verb's 1970 x
  // epoch vs the oracle's 1992 one is immaterial: the OLS slope is
  // translation-invariant in x as an exact algebraic identity over the
  // integer sums.)
  val q110_rolling_regression: Q = (s, d) =>
    graft.api.GraftOps.rollingTrend(
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey")),
      col("n_name"), to_date(col("o_orderdate")),
      round(col("o_totalprice") * 100, 0).cast("long"))
      .select(col("grp").as("nation"), col("day"), col("n_days"),
        col("cents").as("revenue_cents"), col("slope_micro"),
        col("slope_per_day"))
      .orderBy("nation", "day")
  val q110Sql: String =
    """WITH daily AS (SELECT n_name AS nation,
               CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS y
             FROM orders JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
             GROUP BY 1, 2),
      d2 AS (SELECT *, CAST(datediff('day', DATE '1992-01-01', day)
               AS BIGINT) AS x FROM daily),
      s AS (SELECT nation, day, y,
              COUNT(*) OVER w AS n,
              SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
              SUM(x * y) OVER w AS sxy, SUM(x * x) OVER w AS sxx
            FROM d2
            WINDOW w AS (PARTITION BY nation ORDER BY x
              RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)),
      m AS (SELECT nation, day, n, y,
              n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
            FROM s),
      f AS (SELECT nation, day, n, y,
              CASE WHEN den > 0 THEN
                CAST((CAST(num AS HUGEINT) * 10000
                      + CAST(100000000000000 AS HUGEINT)
                        * CAST(den AS HUGEINT))
                     // CAST(den AS HUGEINT) AS BIGINT)
                - 100000000000000
              END AS slope_micro
            FROM m)
      SELECT nation, day, CAST(n AS BIGINT) AS n_days,
        y AS revenue_cents, slope_micro,
        CAST(slope_micro AS DOUBLE) / 1000000.0 AS slope_per_day
      FROM f ORDER BY nation, day"""

  // ---- q111: month-over-month revenue bridge (the waterfall) ----
  // The decomposition e33 does for USERS, done for REVENUE — the
  // finance readout behind every "why did revenue move" meeting:
  // ΔMRR = new + reactivated + expansion − contraction − churn, by
  // customer state transition. q88 reports the total delta; the bridge
  // explains it, and the identity start + components == end is checked
  // row-by-row because every term is an exact INTEGER of cents (the
  // q110 round-then-cast discipline — no doubles anywhere).
  // Engine shape: ONE fact-scale (customer, month) rollup; transitions
  // come from a self-join of that rollup against itself shifted one
  // month (customer-keyed shuffle on a customer×active-month-sized
  // frame — NOT the customer×spine grid q107 pays, churn is detected
  // by the full-outer null side instead); first-ever months (new vs
  // reactivated) ride a tiny min-rollup broadcast. All rollups
  // combinable.
  val q111_revenue_bridge: Q = (s, d) => {
    val r = Tables.orders(s, d)
      .select(col("o_custkey").as("c"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("mi"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .groupBy("c", "mi").agg(sum("cents").as("cents"))
    val first = r.groupBy("c").agg(min("mi").as("f_mi"))
    val bounds = r.agg(min("mi").as("lo"), max("mi").as("hi"))
    val a = r.select(col("c"), (col("mi") + 1).as("mi"),
      col("cents").as("prev"))
    val j = r.select(col("c"), col("mi"), col("cents").as("cur"))
      .join(a, Seq("c", "mi"), "full")
      .join(broadcast(first), "c")
      .crossJoin(broadcast(bounds))
      .filter(col("mi") > col("lo") && col("mi") <= col("hi"))
    j.groupBy("mi").agg(
        sum(coalesce(col("prev"), lit(0L))).as("start_cents"),
        sum(when(col("cur").isNotNull && col("prev").isNull
          && col("mi") === col("f_mi"), col("cur")).otherwise(0L))
          .as("new_cents"),
        sum(when(col("cur").isNotNull && col("prev").isNull
          && col("mi") > col("f_mi"), col("cur")).otherwise(0L))
          .as("reactivated_cents"),
        sum(when(col("cur") > col("prev"), col("cur") - col("prev"))
          .otherwise(0L)).as("expansion_cents"),
        sum(when(col("cur") < col("prev"), col("prev") - col("cur"))
          .otherwise(0L)).as("contraction_cents"),
        sum(when(col("cur").isNull, col("prev")).otherwise(0L))
          .as("churned_cents"),
        sum(coalesce(col("cur"), lit(0L))).as("end_cents"))
      .withColumn("month", expr("make_date(mi div 12, mi % 12 + 1, 1)"))
      .select("month", "start_cents", "new_cents", "reactivated_cents",
        "expansion_cents", "contraction_cents", "churned_cents",
        "end_cents")
      .orderBy("month")
  }
  val q111Sql: String =
    """WITH r AS (SELECT o_custkey AS c,
               CAST(year(CAST(o_orderdate AS DATE)) * 12
                 + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS mi,
               CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS cents
             FROM orders GROUP BY 1, 2),
      f AS (SELECT c, MIN(mi) AS f_mi FROM r GROUP BY 1),
      bd AS (SELECT MIN(mi) AS lo, MAX(mi) AS hi FROM r),
      a AS (SELECT c, mi + 1 AS mi, cents AS prev FROM r),
      b AS (SELECT c, mi, cents AS cur FROM r),
      j AS (SELECT COALESCE(a.c, b.c) AS c, COALESCE(a.mi, b.mi) AS mi,
              prev, cur
            FROM b FULL OUTER JOIN a ON a.c = b.c AND a.mi = b.mi),
      jf AS (SELECT j.*, f_mi FROM j JOIN f ON j.c = f.c
             CROSS JOIN bd WHERE j.mi > lo AND j.mi <= hi)
      SELECT make_date(CAST(mi // 12 AS INTEGER),
               CAST(mi % 12 + 1 AS INTEGER), 1) AS month,
        CAST(SUM(COALESCE(prev, 0)) AS BIGINT) AS start_cents,
        CAST(SUM(CASE WHEN cur IS NOT NULL AND prev IS NULL AND mi = f_mi
             THEN cur ELSE 0 END) AS BIGINT) AS new_cents,
        CAST(SUM(CASE WHEN cur IS NOT NULL AND prev IS NULL AND mi > f_mi
             THEN cur ELSE 0 END) AS BIGINT) AS reactivated_cents,
        CAST(SUM(CASE WHEN cur > prev THEN cur - prev ELSE 0 END)
             AS BIGINT) AS expansion_cents,
        CAST(SUM(CASE WHEN cur < prev THEN prev - cur ELSE 0 END)
             AS BIGINT) AS contraction_cents,
        CAST(SUM(CASE WHEN cur IS NULL THEN prev ELSE 0 END)
             AS BIGINT) AS churned_cents,
        CAST(SUM(COALESCE(cur, 0)) AS BIGINT) AS end_cents
      FROM jf GROUP BY mi ORDER BY month"""

  // ---- q112: geospatial nearest-neighbor via cell blocking ----
  // The geo capability the inventory lacked: a distance join that never
  // goes all-pairs. Entities get deterministic synthetic coordinates
  // (md5-derived integer MICRO-degrees — the tables carry no geo
  // columns; the projection is documented and engine-neutral), each is
  // bucketed into a DENSITY-ADAPTIVE G×G integer lat/lon grid (round 6;
  // previously fixed 32×32): G is the smallest power of two in
  // [8, 4096] with 4·G² >= supplier count, so expected suppliers per
  // cell stay ~<=4 and the 3×3 neighborhood candidate set stays bounded
  // AS THE DATA GROWS — the grid refines itself at 20× or 100× instead
  // of melting into hot cells. The pre-pass is ONE metadata-sized count
  // riding a broadcast scalar; the selection ladder is pure integer
  // compares (no log/sqrt floats to diverge between engines) and the
  // chosen G is PUBLISHED as grid_cells so the oracle replays the
  // parameter, not just the result. Cell assignment is pure integer
  // floor-division (the geohash/S2 cell idea with zero float math);
  // each supplier expands into its 3×3 cell neighborhood so the
  // candidate join is an EQUI-join on cell keys — candidates per
  // customer are bounded by local density, never |C|×|S|. Haversine
  // runs on candidates only; distances publish as integer METERS
  // (round-0 of the double — trig ULP divergence between engines sits
  // ~9 orders below a meter), argmin per customer by (meters, suppkey)
  // total order, and the report is the global top-100 closest
  // colocations. At 100 TB both sides shuffle on cell keys; residual
  // hot cells (real-world density is never uniform) still ride AQE
  // skew handling.
  val q112_geo_nearest: Q = (s, d) => {
    def micros(key: org.apache.spark.sql.Column, salt: String, mod: Long,
               shift: Long) =
      (conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 12),
        16, 10).cast("long") % mod) - shift
    val cust = Tables.customer(s, d).select(
      col("c_custkey"),
      micros(col("c_custkey"), "clat", 180000001L, 90000000L).as("clat"),
      micros(col("c_custkey"), "clon", 360000001L, 180000000L).as("clon"))
    val supp = Tables.supplier(s, d).select(
      col("s_suppkey"),
      micros(col("s_suppkey"), "slat", 180000001L, 90000000L).as("slat"),
      micros(col("s_suppkey"), "slon", 360000001L, 180000000L).as("slon"))
    graft.api.GraftOps.geoNearest(
        cust, col("c_custkey"), col("clat"), col("clon"),
        supp, col("s_suppkey"), col("slat"), col("slon"))
      .select(col("left_id").as("c_custkey"), col("right_id").as("s_suppkey"),
        col("dist_m"), col("n_candidates"), col("grid_cells"))
      .orderBy("dist_m", "c_custkey")
      .limit(100)
  }
  val q112Sql: String =
    """WITH g AS (
        SELECT CASE WHEN COUNT(*) <= 4*8*8 THEN 8
                    WHEN COUNT(*) <= 4*16*16 THEN 16
                    WHEN COUNT(*) <= 4*32*32 THEN 32
                    WHEN COUNT(*) <= 4*64*64 THEN 64
                    WHEN COUNT(*) <= 4*128*128 THEN 128
                    WHEN COUNT(*) <= 4*256*256 THEN 256
                    WHEN COUNT(*) <= 4*512*512 THEN 512
                    WHEN COUNT(*) <= 4*1024*1024 THEN 1024
                    WHEN COUNT(*) <= 4*2048*2048 THEN 2048
                    ELSE 4096 END::BIGINT AS g
        FROM supplier),
      cust AS (
        SELECT c_custkey,
          ('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'clat'), 1, 12))
            ::BIGINT % 180000001 - 90000000 AS clat,
          ('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'clon'), 1, 12))
            ::BIGINT % 360000001 - 180000000 AS clon
        FROM customer),
      cq AS (SELECT cust.*,
               (clat + 90000000) * g.g // 180000001 AS latq,
               (clon + 180000000) * g.g // 360000001 AS lonq
             FROM cust, g),
      supp AS (
        SELECT s_suppkey,
          ('0x' || substring(md5(CAST(s_suppkey AS VARCHAR) || 'slat'), 1, 12))
            ::BIGINT % 180000001 - 90000000 AS slat,
          ('0x' || substring(md5(CAST(s_suppkey AS VARCHAR) || 'slon'), 1, 12))
            ::BIGINT % 360000001 - 180000000 AS slon
        FROM supplier),
      sq AS (SELECT s_suppkey, slat, slon,
               (slat + 90000000) * g.g // 180000001 + d1.d AS latq,
               (slon + 180000000) * g.g // 360000001 + d2.d AS lonq
             FROM supp, g,
               (SELECT unnest(generate_series(-1, 1)) AS d) d1,
               (SELECT unnest(generate_series(-1, 1)) AS d) d2),
      cand AS (
        SELECT c_custkey, s_suppkey,
          CAST(round(6371008.8 * 2 * asin(sqrt(
            sin(radians((slat - clat) / 2e6)) * sin(radians((slat - clat) / 2e6))
            + cos(radians(clat / 1e6)) * cos(radians(slat / 1e6))
              * sin(radians((slon - clon) / 2e6))
              * sin(radians((slon - clon) / 2e6)))), 0) AS BIGINT) AS dist_m
        FROM cq JOIN sq USING (latq, lonq)),
      near AS (SELECT c_custkey, s_suppkey, dist_m FROM (
                 SELECT *, row_number() OVER (PARTITION BY c_custkey
                   ORDER BY dist_m, s_suppkey) AS rn FROM cand) t
               WHERE rn = 1),
      nc AS (SELECT c_custkey, COUNT(*) AS n_candidates
             FROM cand GROUP BY 1)
      SELECT near.c_custkey AS c_custkey, s_suppkey, dist_m, n_candidates,
        (SELECT g FROM g) AS grid_cells
      FROM near JOIN nc ON near.c_custkey = nc.c_custkey
      ORDER BY dist_m, c_custkey LIMIT 100"""

  // ---- q113: top-N per group with an "Other" rollup ----
  // The single most-requested BI report shape still missing from the
  // q-family: per nation, the top-3 customers by revenue as NAMED rows
  // plus ONE "Other" row aggregating everyone else — so the report is
  // complete (shares sum to 1) without being unbounded. q09 ranks,
  // q20 truncates; neither keeps the remainder, and a report that
  // silently drops the tail misstates concentration. Engine shape: one
  // fact-scale (nation, customer) rollup, a nation-partitioned rank
  // window, then a combinable re-aggregate where rank > N collapses to
  // the Other bucket — nothing global, nothing unbounded. Revenue in
  // exact integer cents (q110's discipline); share is one IEEE
  // division per row, 1e-9.
  val q113_topn_other: Q = (s, d) => {
    val byCust = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("c_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
    val ranked = byCust.withColumn("rk", row_number().over(
      Window.partitionBy("nation").orderBy(desc("cents"), col("c_custkey"))))
    val rolled = ranked
      .withColumn("member",
        when(col("rk") <= 3, concat(lit("cust_"), col("c_custkey")))
          .otherwise(lit("OTHER")))
      .withColumn("rk_out",
        when(col("rk") <= 3, col("rk")).otherwise(lit(4)).cast("long"))
      .groupBy("nation", "rk_out", "member")
      .agg(count(lit(1)).as("n_customers"), sum("cents").as("cents"))
    val tot = byCust.groupBy("nation").agg(sum("cents").as("tot_cents"))
    rolled.join(tot, "nation")
      .select(col("nation"), col("rk_out").as("rank"), col("member"),
        col("n_customers"), col("cents"),
        round(col("cents").cast("double") / col("tot_cents").cast("double"),
          9).as("share"))
      .orderBy("nation", "rank")
  }
  val q113Sql: String =
    """WITH bc AS (SELECT n_name AS nation, c_custkey,
               CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS cents
             FROM orders JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
             GROUP BY 1, 2),
      rk AS (SELECT *, row_number() OVER (PARTITION BY nation
               ORDER BY cents DESC, c_custkey) AS rk FROM bc),
      ro AS (SELECT nation,
               CASE WHEN rk <= 3 THEN rk ELSE 4 END AS rank,
               CASE WHEN rk <= 3 THEN 'cust_' || CAST(c_custkey AS VARCHAR)
                    ELSE 'OTHER' END AS member,
               COUNT(*) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS cents
             FROM rk GROUP BY 1, 2, 3),
      t AS (SELECT nation, CAST(SUM(cents) AS BIGINT) AS tot_cents
            FROM bc GROUP BY 1)
      SELECT ro.nation AS nation, CAST(rank AS BIGINT) AS rank, member,
        n_customers, cents,
        round(CAST(cents AS DOUBLE) / CAST(tot_cents AS DOUBLE), 9)
          AS share
      FROM ro JOIN t ON ro.nation = t.nation
      ORDER BY nation, rank"""

  // ---- q114: approximate distinct, oracle-certified (q30's twin) ----
  // The same query shape as the retired-from-registry q30 (per-flag
  // approximate distinct orders and parts) but through the KMV sketch
  // (d07's mergeable TypedImperativeAggregate) whose md5-prefix hash
  // replays BIT-EXACTLY in DuckDB — the approximate-distinct FAMILY is
  // thereby oracle-certified end to end, while Spark's engine-internal
  // HLL keeps its ±5% property spec (RelationalSpec) for API coverage.
  // One combinable aggregate pass; sketch state is k=64 longs per
  // (group, column) — constant regardless of corpus size.
  val q114_approx_distinct: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        graft.functions.kmv_distinct(col("l_orderkey"), 64).as("ko"),
        graft.functions.kmv_distinct(col("l_partkey"), 64).as("kp"))
      .select(col("l_returnflag"),
        round(col("ko.est_distinct"), 6).as("approx_orders"),
        round(col("kp.est_distinct"), 6).as("approx_parts"))
      .orderBy("l_returnflag")
  }
  val q114Sql: String =
    """WITH est AS (
        SELECT l_returnflag, col,
               round(CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                          ELSE CAST(63 AS DOUBLE)
                            * CAST(281474976710656 AS DOUBLE) / max(hv)
                     END, 6) AS est
        FROM (SELECT l_returnflag, col, hv,
                row_number() OVER (PARTITION BY l_returnflag, col
                                   ORDER BY hv) AS rn
              FROM (SELECT DISTINCT l_returnflag, 'o' AS col,
                      ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 12))::BIGINT AS hv
                    FROM lineitem
                    UNION ALL
                    SELECT DISTINCT l_returnflag, 'p' AS col,
                      ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 12))::BIGINT AS hv
                    FROM lineitem) h) r
        WHERE rn <= 64 GROUP BY l_returnflag, col)
      SELECT o.l_returnflag, o.est AS approx_orders, p.est AS approx_parts
      FROM est o JOIN est p ON o.l_returnflag = p.l_returnflag
      WHERE o.col = 'o' AND p.col = 'p'
      ORDER BY o.l_returnflag"""

  // ---- q115: bitemporal as-of (the restatement report) ----
  // The second time axis the warehouse family lacked: VALID time (when
  // a fact was true) vs TRANSACTION time (when we learned it). q56's
  // SCD2 tracks valid time; SnapshotTable versions track transaction
  // time of whole tables; this is the ROW-level combination — "what did
  // we believe on date T about each month's revenue?" — the restatement
  // view behind every finance close and every training-data freeze
  // audit. The orders table carries no audit log, so one is DERIVED
  // deterministically (documented projection, same style as q112's
  // coordinates): every order's v1 is recorded ON its order date at its
  // price in exact cents; orders with md5(orderkey) % 5 == 0 receive a
  // CORRECTION (+500 cents) recorded 10 days later. The report compares
  // per (month, priority) totals as-known-at T (T = global max order
  // date - 10 days, so some corrections are still unknown) vs
  // as-known-now, with the restatement delta — all exact integer cents;
  // engine shape: one fact pass explodes <=2 versions IN-ROW, one keyed
  // latest-per-order window per belief point over the version log
  // (never the fact table twice), combinable monthly rollups.
  val q115_bitemporal: Q = (s, d) => {
    val ord = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val log = ord
      .withColumn("corrected",
        conv(substring(md5(col("o_orderkey").cast("string")), 1, 12),
          16, 10).cast("long") % 5 === 0)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        explode(when(col("corrected"), expr(
          """array(struct(o_orderdate AS recorded_at, cents AS v_cents),
                   struct(date_add(o_orderdate, 10) AS recorded_at,
                          cents + 500L AS v_cents))"""))
          .otherwise(expr(
            "array(struct(o_orderdate AS recorded_at, cents AS v_cents))")))
          .as("v"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        col("v.recorded_at"), col("v.v_cents"))
    val tx = ord.agg(date_sub(max("o_orderdate"), 10).as("t"))
    def believed(versions: DataFrame, label: String): DataFrame = {
      val w = Window.partitionBy("o_orderkey")
        .orderBy(desc("recorded_at"), desc("v_cents"))
      versions
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("month"), col("o_orderpriority").as("priority"))
        .agg(sum("v_cents").as(label))
    }
    val asOfT = believed(
      log.crossJoin(broadcast(tx)).filter(col("recorded_at") <= col("t")),
      "cents_known_at_t")
    val now = believed(log, "cents_known_now")
    now.join(asOfT, Seq("month", "priority"), "left")
      .select(col("month"), col("priority"),
        coalesce(col("cents_known_at_t"), lit(0L)).as("cents_known_at_t"),
        col("cents_known_now"),
        (col("cents_known_now")
          - coalesce(col("cents_known_at_t"), lit(0L))).as("restatement"))
      .orderBy("month", "priority")
  }
  val q115Sql: String =
    """WITH ord AS (SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
               ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 12))
                 ::BIGINT % 5 = 0 AS corrected
             FROM orders),
      log AS (SELECT o_orderkey, o_orderdate, o_orderpriority,
                o_orderdate AS recorded_at, cents AS v_cents FROM ord
              UNION ALL
              SELECT o_orderkey, o_orderdate, o_orderpriority,
                o_orderdate + INTERVAL 10 DAY, cents + 500 FROM ord
              WHERE corrected),
      tx AS (SELECT max(o_orderdate) - INTERVAL 10 DAY AS t FROM orders),
      now_r AS (SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY o_orderkey
            ORDER BY recorded_at DESC, v_cents DESC) AS rn FROM log) x
        WHERE rn = 1),
      t_r AS (SELECT * FROM (
          SELECT l.*, row_number() OVER (PARTITION BY o_orderkey
            ORDER BY recorded_at DESC, v_cents DESC) AS rn
          FROM log l, tx WHERE l.recorded_at <= tx.t) x
        WHERE rn = 1),
      now_m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                  AS month, o_orderpriority AS priority,
                  CAST(SUM(v_cents) AS BIGINT) AS cents_known_now
                FROM now_r GROUP BY 1, 2),
      t_m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                AS month, o_orderpriority AS priority,
                CAST(SUM(v_cents) AS BIGINT) AS cents_known_at_t
              FROM t_r GROUP BY 1, 2)
      SELECT now_m.month AS month, now_m.priority AS priority,
        COALESCE(cents_known_at_t, 0) AS cents_known_at_t,
        cents_known_now,
        cents_known_now - COALESCE(cents_known_at_t, 0) AS restatement
      FROM now_m LEFT JOIN t_m
        ON now_m.month = t_m.month AND now_m.priority = t_m.priority
      ORDER BY month, priority"""

  val queries: Map[String, Q] = Map(
    "q115_bitemporal" -> q115_bitemporal,
    "q114_approx_distinct" -> q114_approx_distinct,
    "q106_bootstrap_ci"  -> q106_bootstrap_ci,
    "q107_semi_additive" -> q107_semi_additive,
    "q108_weighted_median" -> q108_weighted_median,
    "q109_distinct_cube" -> q109_distinct_cube,
    "q110_rolling_regression" -> q110_rolling_regression,
    "q111_revenue_bridge" -> q111_revenue_bridge,
    "q112_geo_nearest" -> q112_geo_nearest,
    "q113_topn_other" -> q113_topn_other,
  )
  val oracles: Map[String, String] = Map(
    "q115_bitemporal" -> q115Sql,
    "q114_approx_distinct" -> q114Sql,
    "q106_bootstrap_ci"  -> q106Sql,
    "q107_semi_additive" -> q107Sql,
    "q108_weighted_median" -> q108Sql,
    "q109_distinct_cube" -> q109Sql,
    "q110_rolling_regression" -> q110Sql,
    "q111_revenue_bridge" -> q111Sql,
    "q112_geo_nearest" -> q112Sql,
    "q113_topn_other" -> q113Sql,
  )
}
