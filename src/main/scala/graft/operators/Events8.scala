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

  // ---- e56: in-order window funnel (the windowFunnel kernel) ----
  // The funnel semantics the family's other funnels don't implement:
  // stages must occur IN ORDER, all within a fixed time window of the
  // FIRST stage (ClickHouse's windowFunnel / Amplitude's conversion
  // window). e06 counts lifetime stage presence, e22/e49 measure lag —
  // neither enforces "click after view, purchase after click, all
  // inside 72 h of the first view", which is what product funnels
  // actually mean. Per user: t1 = first view; t2 = first click after t1
  // inside the window; t3 = first purchase after t2 inside the window;
  // depth = how far the chain got, censused with shares.
  //
  // Engine shape: one filtered user-keyed aggregate per stage, chained
  // by user-keyed joins — 3 modest shuffles on the same key (AQE reuses
  // the layout), each stage's input pre-filtered to its event type so
  // nothing fact-wide rides twice. (The one-shuffle alternative — an
  // in-row sort_array+fold over each user's full history — is the
  // classic sequential form, but its per-user state is unbounded on hot
  // users; the cascade keeps every stage combinable.) Depth census +
  // anti-join for never-viewed users are user-rollup-sized.
  //
  // Exactness: all comparisons on exact integer microseconds; shares
  // are single IEEE divisions of exact counts rounded 1e-9.
  val e56_window_funnel: Q = (s, d) => {
    val winUs = 72L * 3600 * 1000000
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val a1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val a2 = ev.filter(col("event_type") === "click")
      .join(a1, "user_id")
      .filter(col("us") > col("t1") && col("us") <= col("t1") + winUs)
      .groupBy("user_id").agg(min("us").as("t2"))
    val a3 = ev.filter(col("event_type") === "purchase")
      .join(a2, "user_id").join(a1, "user_id")
      .filter(col("us") > col("t2") && col("us") <= col("t1") + winUs)
      .groupBy("user_id").agg(min("us").as("t3"))
    val users = ev.select("user_id").distinct()
    val depth = users
      .join(a1, Seq("user_id"), "left")
      .join(a2, Seq("user_id"), "left")
      .join(a3, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L)
          .otherwise(0L).as("depth"))
    val tot = users.agg(count(lit(1)).as("n_total"))
    depth.groupBy("depth").agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(tot))
      .select(col("depth"), col("n_users"),
        round(col("n_users").cast("double") / col("n_total").cast("double"), 9)
          .as("share"))
      .orderBy("depth")
  }
  val e56Sql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      a1 AS (SELECT user_id, MIN(us) AS t1 FROM ev
             WHERE event_type = 'view' GROUP BY 1),
      a2 AS (SELECT ev.user_id, MIN(us) AS t2
             FROM ev JOIN a1 ON ev.user_id = a1.user_id
             WHERE event_type = 'click'
               AND us > t1 AND us <= t1 + 259200000000 GROUP BY 1),
      a3 AS (SELECT ev.user_id, MIN(us) AS t3
             FROM ev JOIN a2 ON ev.user_id = a2.user_id
                     JOIN a1 ON ev.user_id = a1.user_id
             WHERE event_type = 'purchase'
               AND us > t2 AND us <= t1 + 259200000000 GROUP BY 1),
      u AS (SELECT DISTINCT user_id FROM ev),
      dep AS (SELECT u.user_id,
               CASE WHEN t3 IS NOT NULL THEN 3
                    WHEN t2 IS NOT NULL THEN 2
                    WHEN t1 IS NOT NULL THEN 1
                    ELSE 0 END AS depth
             FROM u LEFT JOIN a1 ON u.user_id = a1.user_id
                    LEFT JOIN a2 ON u.user_id = a2.user_id
                    LEFT JOIN a3 ON u.user_id = a3.user_id),
      t AS (SELECT COUNT(*) AS n_total FROM u)
      SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_users,
        round(CAST(COUNT(*) AS DOUBLE) / CAST(n_total AS DOUBLE), 9) AS share
      FROM dep, t GROUP BY depth, n_total ORDER BY depth"""

  // ---- e57: incremental sessionization (merge == recompute, proven) ----
  // The production form of q27: nightly batches can't re-sessionize all
  // history, so sessions are computed incrementally — yesterday's OPEN
  // sessions (those a future event could still continue: last event
  // within the gap of the cutoff) are carried as state, today's events
  // sessionize alone, and a user's first new session STITCHES onto the
  // carried session when its first event falls inside the gap. The
  // operator runs exactly this two-phase computation (split at
  // min_ts + 15 days) — and its DuckDB oracle is the plain ONE-SHOT
  // sessionization of all events, so the hash match PROVES the
  // incremental decomposition exact (q92/q104's merge-equals-recompute
  // discipline, applied to stateful sessionization). This is also the
  // algebra the streaming sessionizer's state store relies on.
  //
  // Engine shape: two q27-shape keyed window passes (each over its
  // half), state and stitching on session-rollup-sized frames via one
  // full-outer user join. Session values ride DECIMAL through the
  // stitch (exact partial + partial = exact total — the associativity
  // the proof needs); gap tests on exact integer microseconds.
  val e57_incremental_sessions: Q = (s, d) => {
    val gapUs = 30L * 60 * 1000000
    def sessionize(ev: DataFrame): DataFrame = {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev.withColumn("prev_ts", lag("ts", 1).over(byUser))
        .withColumn("is_new", when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
        .withColumn("sid",
          sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(30, 6))).as("v6"))
        .drop("sid")
    }
    val ev = Tables.events(s, d)
      .select("user_id", "event_id", "ts", "value")
    val cut = ev.agg((min(unix_micros(col("ts")))
      + lit(15L * 24 * 3600 * 1000000)).as("cut_us"))
    val tagged = ev.crossJoin(broadcast(cut))
      .withColumn("us", unix_micros(col("ts")))
    val s1 = sessionize(tagged.filter(col("us") < col("cut_us"))
      .select("user_id", "event_id", "ts", "value"))
      .crossJoin(broadcast(cut))
    val closed1 = s1
      .filter(unix_micros(col("session_end")) + gapUs < col("cut_us"))
      .drop("cut_us")
    val open = s1
      .filter(unix_micros(col("session_end")) + gapUs >= col("cut_us"))
      .drop("cut_us")
    val s2 = sessionize(tagged.filter(col("us") >= col("cut_us"))
      .select("user_id", "event_id", "ts", "value"))
    val s2r = s2.withColumn("rn", row_number().over(
      Window.partitionBy("user_id").orderBy("session_start")))
    val rest2 = s2r.filter(col("rn") > 1).drop("rn")
    val first2 = s2r.filter(col("rn") === 1).drop("rn")
    val stitched = open.as("o")
      .join(first2.as("f"), Seq("user_id"), "full_outer")
      .select(col("user_id"),
        col("o.session_start").as("o_start"), col("o.session_end").as("o_end"),
        col("o.n_events").as("o_n"), col("o.v6").as("o_v"),
        col("f.session_start").as("f_start"), col("f.session_end").as("f_end"),
        col("f.n_events").as("f_n"), col("f.v6").as("f_v"))
      .withColumn("merges",
        col("o_end").isNotNull && col("f_start").isNotNull &&
          unix_micros(col("f_start")) <= unix_micros(col("o_end")) + gapUs)
    val merged = stitched.filter(col("merges"))
      .select(col("user_id"), col("o_start").as("session_start"),
        col("f_end").as("session_end"),
        (col("o_n") + col("f_n")).as("n_events"),
        (col("o_v") + col("f_v")).as("v6"))
    val standing = stitched.filter(!col("merges"))
      .select(col("user_id"), col("o_start"), col("o_end"), col("o_n"),
        col("o_v"), col("f_start"), col("f_end"), col("f_n"), col("f_v"))
    val openStand = standing.filter(col("o_start").isNotNull)
      .select(col("user_id"), col("o_start").as("session_start"),
        col("o_end").as("session_end"), col("o_n").as("n_events"),
        col("o_v").as("v6"))
    val firstStand = standing.filter(col("f_start").isNotNull)
      .select(col("user_id"), col("f_start").as("session_start"),
        col("f_end").as("session_end"), col("f_n").as("n_events"),
        col("f_v").as("v6"))
    closed1.unionByName(merged).unionByName(openStand)
      .unionByName(firstStand).unionByName(rest2)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("v6").cast("double").as("session_value"))
      .orderBy("user_id", "session_start")
  }
  val e57Sql: String =
    """WITH l AS (SELECT user_id, event_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_ts
             FROM events),
      f AS (SELECT *, CASE WHEN prev_ts IS NULL
                 OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END
                 AS is_new
            FROM l),
      c AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
            FROM f)
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS session_value
      FROM c GROUP BY user_id, sid
      ORDER BY user_id, session_start"""

  // ---- e58: sequence pattern matching (the MATCH_RECOGNIZE gap) ----
  // SQL's MATCH_RECOGNIZE — find users whose EVENT SEQUENCE matches a
  // pattern — has no Spark builtin, yet "purchase with no click in
  // between" or "bought without ever browsing" are the questions
  // product analytics actually asks (e24's Markov counts single hops;
  // e18 mines frequent paths; neither answers an arbitrary pattern).
  // The classic scalable reduction: collapse each user's ordered
  // history to a LETTER STRING (V/C/P/S/E per event type), then any
  // pattern is one regex over a per-user row — sequence questions
  // become vectorized string ops.
  //
  // Engine shape: a per-user row_number window (sorted, disk-spilling
  // WindowExec) keeps only each user's FIRST 2000 events BEFORE any
  // aggregation — so the collect_list buffer is ≤2000 structs per user
  // by construction, not post-hoc: a 100M-event hot user costs the
  // window sort (external, spills) but never a 100M-element agg buffer.
  // Then ONE user-keyed collapse (sort_array over the capped in-row
  // structs), then a users × patterns in-row explode collapsed by a
  // combinable census. The SAME first-2000 cap is applied in the oracle
  // (rank + filter before string_agg) so parity is exact for hot users
  // too. Pattern syntax sticks to the regex subset with identical
  // Java/RE2 semantics (anchors, literal letters, negated classes, *).
  val e58_seq_match: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val seqs = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"),
        when(col("event_type") === "view", "V")
          .when(col("event_type") === "click", "C")
          .when(col("event_type") === "purchase", "P")
          .when(col("event_type") === "signup", "S")
          .otherwise("E").as("l"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= 2000)
      .groupBy("user_id")
      .agg(expr("""concat_ws('', transform(
             sort_array(collect_list(struct(us, event_id, l))),
             x -> x.l))""").as("seq"))
    val pats = Seq(
      ("view then purchase, no click between", "V[^CP]*P"),
      ("purchase before any view", "^[^V]*P"),
      ("error immediately before purchase", "EP"),
      ("signup then eventual purchase", "S.*P"))
    val tagged = seqs.select(col("user_id"), col("seq"),
      explode(array(pats.map { case (n, p) =>
        struct(lit(n).as("pattern"), lit(p).as("re")) }: _*)).as("x"))
      .select(col("seq"), col("x.pattern").as("pattern"), col("x.re").as("re"))
    val nu = seqs.agg(count(lit(1)).as("n_users"))
    tagged.groupBy("pattern").agg(
      count(when(regexp_like(col("seq"), col("re")), 1)).as("n_matched"))
      .crossJoin(broadcast(nu))
      .select(col("pattern"), col("n_users"), col("n_matched"),
        round(col("n_matched").cast("double") / col("n_users").cast("double"),
          9).as("share"))
      .orderBy("pattern")
  }
  val e58Sql: String =
    """WITH r AS (SELECT user_id, ts, event_id, event_type,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS rn
             FROM events),
      sq AS (SELECT user_id,
               string_agg(CASE event_type WHEN 'view' THEN 'V'
                 WHEN 'click' THEN 'C' WHEN 'purchase' THEN 'P'
                 WHEN 'signup' THEN 'S' ELSE 'E' END, ''
                 ORDER BY epoch_us(ts), event_id) AS seq
             FROM r WHERE rn <= 2000 GROUP BY 1),
      pats(pattern, re) AS (VALUES
        ('view then purchase, no click between', 'V[^CP]*P'),
        ('purchase before any view', '^[^V]*P'),
        ('error immediately before purchase', 'EP'),
        ('signup then eventual purchase', 'S.*P')),
      nu AS (SELECT COUNT(*) AS n_users FROM sq)
      SELECT pattern, n_users,
        COUNT(CASE WHEN regexp_matches(seq, re) THEN 1 END) AS n_matched,
        round(CAST(COUNT(CASE WHEN regexp_matches(seq, re) THEN 1 END)
              AS DOUBLE) / CAST(n_users AS DOUBLE), 9) AS share
      FROM sq CROSS JOIN pats, nu
      GROUP BY pattern, n_users ORDER BY pattern"""

  // ---- e59: A/B two-proportion z-test (experimentation readout) ----
  // The analytics verb every experimentation platform reduces to: split
  // users into deterministic arms (user_id parity here — production
  // uses a salted hash, same shape), conversion = "ever purchased", and
  // the pooled two-proportion z statistic decides significance. All
  // counts are exact integers (one distinct-user collapse, one arm
  // rollup); the z chain is replicated operation-for-operation in the
  // oracle — pa-pb over sqrt(pool*(1-pool)*(1/na+1/nb)) — so the
  // statistic itself is hash-exact, not approximately equal. One
  // fact-scale distinct + a 2-row rollup: trivially 100 TB-shaped.
  val e59_ab_proportion: Q = (s, d) => {
    // conversion = a HIGH-VALUE purchase (value > 100): "any purchase"
    // converts ~100% of this corpus (degenerate pool -> zero variance);
    // the z guard below still nulls out a degenerate pool rather than
    // dividing by zero under ANSI
    val users = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 100,
        1L).otherwise(0L)).as("converted"))
      .withColumn("arm",
        when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"))
    val arms = users.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("converted").as("conv"))
    val a = arms.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("conv").as("conv_a"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("conv").as("conv_b"))
    a.crossJoin(broadcast(b))
      .withColumn("rate_a",
        col("conv_a").cast("double") / col("n_a").cast("double"))
      .withColumn("rate_b",
        col("conv_b").cast("double") / col("n_b").cast("double"))
      .withColumn("pool",
        (col("conv_a") + col("conv_b")).cast("double")
          / (col("n_a") + col("n_b")).cast("double"))
      .withColumn("z", when(col("pool") > 0 && col("pool") < 1, round(
        (col("rate_a") - col("rate_b"))
          / sqrt(col("pool") * (lit(1.0) - col("pool"))
            * (lit(1.0) / col("n_a").cast("double")
              + lit(1.0) / col("n_b").cast("double"))), 9)))
      .withColumn("significant", abs(col("z")) > 1.96)
      .select("n_a", "n_b", "conv_a", "conv_b",
        "rate_a", "rate_b", "z", "significant")
  }
  val e59Sql: String =
    """WITH u AS (SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' AND value > 100
                   THEN 1 ELSE 0 END) AS converted
             FROM events GROUP BY 1),
      arms AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
                 COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS conv
               FROM u GROUP BY 1),
      a AS (SELECT n AS n_a, conv AS conv_a FROM arms WHERE arm = 'A'),
      b AS (SELECT n AS n_b, conv AS conv_b FROM arms WHERE arm = 'B'),
      j AS (SELECT *,
              CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
              CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
              CAST(conv_a + conv_b AS DOUBLE)
                / CAST(n_a + n_b AS DOUBLE) AS pool
            FROM a CROSS JOIN b),
      zz AS (SELECT *,
              CASE WHEN pool > 0 AND pool < 1 THEN
                round((rate_a - rate_b)
                  / sqrt(pool * (CAST(1.0 AS DOUBLE) - pool)
                    * (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE)
                      + CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE))), 9)
              END AS z
             FROM j)
      SELECT n_a, n_b, conv_a, conv_b, rate_a, rate_b, z,
        abs(z) > 1.96 AS significant
      FROM zz"""

  // ---- e60: Kaplan–Meier survival curve with right-censoring ----
  // The estimator e48's discrete hazard feeds: S(t) = Π_{u≤t} (1−d_u/n_u)
  // over event times, with users who never convert CENSORED at their
  // last observed activity instead of silently dropped — the difference
  // between "conversion takes 9 days" and the truth when half the cohort
  // is still mid-journey. Duration = days from first event to first
  // purchase (event) or to last activity (censored); all d/n counts are
  // exact integers from ONE user-keyed collapse + one duration rollup.
  // Cross-engine determinism: per-time ln(1−d/n) terms are 1e-9-rounded
  // BEFORE the ordered cumulative sum (t08's log discipline — identical
  // terms + identical order ⇒ identical double sums), survival rounded
  // at 1e-7; a time where d == n_risk (everyone remaining converts) uses
  // a −1e9 sentinel term so exp underflows to exactly 0.0 in both
  // engines rather than tripping ln(0) null-vs-error divergence. The
  // duration frame is bounded by the corpus date span, so the cumulative
  // windows ride boundedSingleGroup (partitioned, never corpus-wide).
  // body IS GraftOps.kaplanMeier — the facade verb the oracle certifies
  val e60_kaplan_meier: Q = (s, d) =>
    graft.api.GraftOps.kaplanMeier(Tables.events(s, d),
      col("user_id"), col("ts"), col("event_type") === "purchase")
  val e60Sql: String =
    """WITH u AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS f_day,
               MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
                 AS c_day,
               MAX(CAST(ts AS DATE)) AS last_day
             FROM events GROUP BY 1),
      x AS (SELECT CASE WHEN c_day IS NOT NULL
                     THEN datediff('day', f_day, c_day)
                     ELSE datediff('day', f_day, last_day) END AS t,
                   (c_day IS NOT NULL) AS ev
            FROM u),
      g AS (SELECT t, COUNT(*) FILTER (WHERE ev) AS n_events,
              COUNT(*) FILTER (WHERE NOT ev) AS n_censored
            FROM x GROUP BY 1),
      w AS (SELECT *,
              SUM(n_events + n_censored) OVER () AS n_total,
              COALESCE(SUM(n_events + n_censored) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS removed
            FROM g),
      r AS (SELECT t, n_total - removed AS n_risk, n_events, n_censored,
              CASE WHEN n_events > 0 AND n_events < n_total - removed
                   THEN round(ln(1 - CAST(n_events AS DOUBLE)
                     / CAST(n_total - removed AS DOUBLE)), 9)
                   WHEN n_events = n_total - removed THEN -1e9
                   ELSE CAST(0 AS DOUBLE) END AS term
            FROM w)
      SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
        CAST(n_events AS BIGINT) AS n_events,
        CAST(n_censored AS BIGINT) AS n_censored,
        round(exp(SUM(term) OVER (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 7)
          AS km_survival
      FROM r ORDER BY t"""

  // ---- e61: funnel conversion rates with Wilson confidence bands ----
  // e06/e56 report funnel point rates; this adds the UNCERTAINTY every
  // experiment readout needs before anyone reacts to a step's "drop":
  // the Wilson score interval (Wilson 1927 — the binomial CI that stays
  // sane at small n and extreme p, unlike the naive Wald interval that
  // produces negative lower bounds). Steps are e49's in-order funnel
  // (first view → first click at-or-after it → first purchase after
  // that); n/c are exact integers from the same two-stage conditional
  // MINs. The Wilson chain — denom = 1+z²/n, center = (p+z²/2n)/denom,
  // half = z·√(p(1−p)/n + z²/4n²)/denom — is replicated operation-for-
  // operation in the oracle from the identical exact integers, so the
  // published 1e-9-rounded bounds are hash-exact. One fact-scale pass
  // per stage collapse; output is 2 rows.
  val e61_funnel_ci: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val u1 = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("us"))).as("v"))
    val u2 = ev.join(u1, "user_id")
      .groupBy("user_id", "v")
      .agg(min(when(col("event_type") === "click" && col("us") >= col("v"),
        col("us"))).as("c"))
    val u3 = ev.join(u2, "user_id")
      .groupBy("user_id", "v", "c")
      .agg(min(when(col("event_type") === "purchase" && col("us") >= col("c"),
        col("us"))).as("p"))
    val counts = u3.agg(
      count(col("v")).as("nv"), count(col("c")).as("nc"),
      count(col("p")).as("np"))
    def wilson(step: String, nC: org.apache.spark.sql.Column,
               cC: org.apache.spark.sql.Column): DataFrame = {
      val z = lit(1.96)
      val n = nC.cast("double")
      val p = cC.cast("double") / n
      val denom = lit(1.0) + z * z / n
      val center = (p + z * z / (lit(2.0) * n)) / denom
      val half = z * sqrt(p * (lit(1.0) - p) / n
        + z * z / (lit(4.0) * n * n)) / denom
      counts.select(lit(step).as("step"), nC.as("n_entered"),
        cC.as("n_converted"), round(p, 9).as("rate"),
        round(center - half, 9).as("wilson_lo"),
        round(center + half, 9).as("wilson_hi"))
    }
    wilson("1_view_to_click", col("nv"), col("nc"))
      .unionAll(wilson("2_click_to_purchase", col("nc"), col("np")))
      .orderBy("step")
  }
  val e61Sql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      u1 AS (SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN us END) AS v
             FROM ev GROUP BY 1),
      u2 AS (SELECT ev.user_id, v,
               MIN(CASE WHEN event_type = 'click' AND us >= v THEN us END) AS c
             FROM ev JOIN u1 ON ev.user_id = u1.user_id GROUP BY 1, 2),
      u3 AS (SELECT ev.user_id, v, c,
               MIN(CASE WHEN event_type = 'purchase' AND us >= c THEN us END) AS p
             FROM ev JOIN u2 ON ev.user_id = u2.user_id GROUP BY 1, 2, 3),
      k AS (SELECT COUNT(v) AS nv, COUNT(c) AS nc, COUNT(p) AS np FROM u3),
      w AS (
        SELECT '1_view_to_click' AS step, nv AS n_entered, nc AS n_converted,
               CAST(nv AS DOUBLE) AS n, CAST(nc AS DOUBLE) / CAST(nv AS DOUBLE) AS p
        FROM k
        UNION ALL
        SELECT '2_click_to_purchase', nc, np,
               CAST(nc AS DOUBLE), CAST(np AS DOUBLE) / CAST(nc AS DOUBLE)
        FROM k)
      SELECT step, n_entered, n_converted, round(p, 9) AS rate,
        round((p + 1.96 * 1.96 / (CAST(2.0 AS DOUBLE) * n))
                / (CAST(1.0 AS DOUBLE) + 1.96 * 1.96 / n)
              - 1.96 * sqrt(p * (CAST(1.0 AS DOUBLE) - p) / n
                  + 1.96 * 1.96 / (CAST(4.0 AS DOUBLE) * n * n))
                / (CAST(1.0 AS DOUBLE) + 1.96 * 1.96 / n), 9) AS wilson_lo,
        round((p + 1.96 * 1.96 / (CAST(2.0 AS DOUBLE) * n))
                / (CAST(1.0 AS DOUBLE) + 1.96 * 1.96 / n)
              + 1.96 * sqrt(p * (CAST(1.0 AS DOUBLE) - p) / n
                  + 1.96 * 1.96 / (CAST(4.0 AS DOUBLE) * n * n))
                / (CAST(1.0 AS DOUBLE) + 1.96 * 1.96 / n), 9) AS wilson_hi
      FROM w ORDER BY step"""

  // ---- e62: A/B sample-size planner (power analysis) ----
  // The question every experiment review asks BEFORE e59's z-test can
  // run: how many users per arm to detect a given absolute lift at
  // α=0.05 (two-sided) with 80% power? Standard two-proportion formula
  // n = (z_{α/2}·√(2p̄(1−p̄)) + z_β·√(p₁(1−p₁)+p₂(1−p₂)))² / δ² with
  // the baseline p₁ measured from the corpus (exact integer counts,
  // e59's high-value-purchase conversion), one row per candidate lift.
  // z literals (1.96, 0.8416) are fixed constants in BOTH engines; the
  // whole chain is identical IEEE ops on identical doubles, and the
  // ceil lands on identical integers. Feasibility compares the
  // requirement against current traffic — the go/no-go column. One
  // fact-scale distinct-user collapse; 3-row output.
  val e62_sample_size: Q = (s, d) => {
    val base = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 100,
        1L).otherwise(0L)).as("conv"))
      .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"))
    val lifts = Seq(0.01, 0.02, 0.05)
    base
      .select(col("n_users"), col("n_conv"),
        (col("n_conv").cast("double") / col("n_users").cast("double"))
          .as("p1"),
        explode(array(lifts.map(lit): _*)).as("lift"))
      .withColumn("p2", col("p1") + col("lift"))
      .withColumn("n_required", ceil(
        pow(lit(1.96) * sqrt(lit(2.0) * ((col("p1") + col("p2")) / lit(2.0))
            * (lit(1.0) - (col("p1") + col("p2")) / lit(2.0)))
          + lit(0.8416) * sqrt(col("p1") * (lit(1.0) - col("p1"))
            + col("p2") * (lit(1.0) - col("p2"))), 2.0)
          / (col("lift") * col("lift"))).cast("long"))
      .select(col("lift"), round(col("p1"), 9).as("p1"),
        round(col("p2"), 9).as("p2"), col("n_required"),
        (col("n_required") * 2 <= col("n_users"))
          .as("feasible_with_current_traffic"))
      .orderBy("lift")
  }
  val e62Sql: String =
    """WITH u AS (SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' AND value > 100
                   THEN 1 ELSE 0 END) AS conv
             FROM events GROUP BY 1),
      b AS (SELECT COUNT(*) AS n_users,
              CAST(SUM(conv) AS BIGINT) AS n_conv FROM u),
      l AS (SELECT unnest([0.01, 0.02, 0.05]) AS lift),
      x AS (SELECT n_users, n_conv,
              CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS p1,
              CAST(lift AS DOUBLE) AS lift
            FROM b, l),
      y AS (SELECT *, p1 + lift AS p2 FROM x),
      z AS (SELECT *,
              CAST(ceil(
                pow(1.96 * sqrt(CAST(2.0 AS DOUBLE) * ((p1 + p2)
                      / CAST(2.0 AS DOUBLE))
                    * (CAST(1.0 AS DOUBLE) - (p1 + p2)
                      / CAST(2.0 AS DOUBLE)))
                  + 0.8416 * sqrt(p1 * (CAST(1.0 AS DOUBLE) - p1)
                    + p2 * (CAST(1.0 AS DOUBLE) - p2)), 2.0)
                / (lift * lift)) AS BIGINT) AS n_required
            FROM y)
      SELECT lift, round(p1, 9) AS p1, round(p2, 9) AS p2, n_required,
        n_required * 2 <= n_users AS feasible_with_current_traffic
      FROM z ORDER BY lift"""

  // ---- e63: difference-in-differences (the quasi-experiment readout) ----
  // When randomization isn't available (a feature shipped to one arm at
  // a known date), the causal workhorse is DiD: compare each arm's
  // BEFORE→AFTER change and difference the changes, so arm-level
  // constants and period-level shocks both cancel. Completes the
  // experimentation family: e59 tests a parallel A/B, e61 bounds the
  // rates, e62 sizes the sample, e63 handles the launch-date design.
  // Cells are (arm × period) conversion rates over deterministic user
  // arms (e59's parity) and a deterministic cutover (the corpus
  // midpoint date, computed as an exact integer day); a user's period
  // membership = activity in that period, conversion measured per
  // period so one user can appear in both cells (the repeated-cross-
  // section DiD). All 8 cell counts are exact integers from ONE
  // fact-scale pass; the four rates and the DiD estimate are
  // fixed-parenthesization IEEE ops replicated in the oracle, 1e-9.
  val e63_did: Q = (s, d) => {
    val bounds = Tables.events(s, d)
      .agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
      .select(expr("date_add(lo, CAST(datediff(hi, lo) div 2 AS INT))")
        .as("cut"))
    val cells = Tables.events(s, d)
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        when(pmod(col("user_id"), lit(2)) === 0, "treat")
          .otherwise("control").as("arm"),
        when(to_date(col("ts")) < col("cut"), "pre").otherwise("post")
          .as("period"),
        when(col("event_type") === "purchase" && col("value") > 100, 1L)
          .otherwise(0L).as("conv"))
      .groupBy("arm", "period", "user_id")
      .agg(max("conv").as("converted"))
      .groupBy("arm", "period")
      .agg(count(lit(1)).as("n_users"), sum("converted").as("n_conv"))
      .withColumn("rate",
        col("n_conv").cast("double") / col("n_users").cast("double"))
    val wide = cells.groupBy(lit(1).as("__one")).agg(
      min(when(col("arm") === "treat" && col("period") === "pre",
        col("rate"))).as("treat_pre"),
      min(when(col("arm") === "treat" && col("period") === "post",
        col("rate"))).as("treat_post"),
      min(when(col("arm") === "control" && col("period") === "pre",
        col("rate"))).as("control_pre"),
      min(when(col("arm") === "control" && col("period") === "post",
        col("rate"))).as("control_post"))
    wide.select(
      round(col("treat_pre"), 9).as("treat_pre"),
      round(col("treat_post"), 9).as("treat_post"),
      round(col("control_pre"), 9).as("control_pre"),
      round(col("control_post"), 9).as("control_post"),
      round((col("treat_post") - col("treat_pre"))
        - (col("control_post") - col("control_pre")), 9).as("did"))
  }
  val e63Sql: String =
    """WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS lo,
               MAX(CAST(ts AS DATE)) AS hi FROM events),
      c AS (SELECT lo + CAST(datediff('day', lo, hi) // 2 AS INTEGER)
              AS cut FROM b),
      u AS (SELECT user_id,
              CASE WHEN user_id % 2 = 0 THEN 'treat' ELSE 'control' END
                AS arm,
              CASE WHEN CAST(ts AS DATE) < cut THEN 'pre' ELSE 'post' END
                AS period,
              MAX(CASE WHEN event_type = 'purchase' AND value > 100
                  THEN 1 ELSE 0 END) AS converted
            FROM events, c GROUP BY 1, 2, 3),
      g AS (SELECT arm, period, COUNT(*) AS n_users,
              CAST(SUM(converted) AS BIGINT) AS n_conv
            FROM u GROUP BY 1, 2),
      r AS (SELECT arm, period,
              CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS rate
            FROM g),
      w AS (SELECT
              MIN(CASE WHEN arm = 'treat' AND period = 'pre'
                  THEN rate END) AS treat_pre,
              MIN(CASE WHEN arm = 'treat' AND period = 'post'
                  THEN rate END) AS treat_post,
              MIN(CASE WHEN arm = 'control' AND period = 'pre'
                  THEN rate END) AS control_pre,
              MIN(CASE WHEN arm = 'control' AND period = 'post'
                  THEN rate END) AS control_post
            FROM r)
      SELECT round(treat_pre, 9) AS treat_pre,
        round(treat_post, 9) AS treat_post,
        round(control_pre, 9) AS control_pre,
        round(control_post, 9) AS control_post,
        round((treat_post - treat_pre) - (control_post - control_pre), 9)
          AS did
      FROM w"""

  // ---- e64: uplift by activity decile (the targeting table) ----
  // e59 tests ONE proportion difference; e63 one diff-in-diff. The
  // question a campaign owner actually asks is WHERE the treatment
  // works: uplift (treatment conversion minus control conversion) per
  // user-activity decile — heavy users often convert anyway (uplift ~0)
  // while mid-deciles carry the causal effect, and targeting spends
  // where uplift is, not where conversion is. Assignment is the
  // deterministic md5 coin (":t" salt — independent of every other
  // md5-derived quantity in the suite by salt disjointness); deciles
  // come from broadcast percentile bounds over the USER frame (q72's
  // recipe — never an unpartitioned ntile window). One fact-scale
  // rollup to users; everything after is user-frame narrow work +
  // one combinable aggregate. Exact integer counts; two IEEE divisions
  // and a subtract per decile, rounded 1e-9.
  val e64_uplift: Q = (s, d) => {
    val users = Tables.events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
      .withColumn("treated",
        conv(substring(md5(concat(col("user_id").cast("string"), lit(":t"))),
          1, 12), 16, 10).cast("long") % 2 === 1)
    val bounds = users.agg(expr(
      "percentile(n_events, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
      .as("bs"))
    users.join(broadcast(bounds))
      .withColumn("decile",
        expr("CAST(size(filter(bs, b -> n_events > b)) + 1 AS BIGINT)"))
      .groupBy("decile")
      .agg(
        count(when(col("treated"), 1)).as("n_treat"),
        count(when(!col("treated"), 1)).as("n_ctrl"),
        sum(when(col("treated"), col("converted")).otherwise(0L))
          .as("conv_treat"),
        sum(when(!col("treated"), col("converted")).otherwise(0L))
          .as("conv_ctrl"))
      .withColumn("rate_treat",
        round(col("conv_treat").cast("double") / col("n_treat"), 9))
      .withColumn("rate_ctrl",
        round(col("conv_ctrl").cast("double") / col("n_ctrl"), 9))
      .withColumn("uplift",
        round(col("conv_treat").cast("double") / col("n_treat")
          - col("conv_ctrl").cast("double") / col("n_ctrl"), 9))
      .select("decile", "n_treat", "n_ctrl", "conv_treat", "conv_ctrl",
        "rate_treat", "rate_ctrl", "uplift")
      .orderBy("decile")
  }
  val e64Sql: String =
    """WITH u AS (
        SELECT user_id, COUNT(*) AS n_events,
          MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS converted,
          ('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':t'), 1, 12))
            ::BIGINT % 2 = 1 AS treated
        FROM events GROUP BY user_id),
      bs AS (SELECT quantile_cont(n_events,
          [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs FROM u),
      a AS (SELECT u.*,
              len(list_filter(bs.bs, b -> u.n_events > b)) + 1 AS decile
            FROM u CROSS JOIN bs),
      g AS (SELECT decile,
              COUNT(*) FILTER (WHERE treated) AS n_treat,
              COUNT(*) FILTER (WHERE NOT treated) AS n_ctrl,
              CAST(SUM(CASE WHEN treated THEN converted ELSE 0 END)
                AS BIGINT) AS conv_treat,
              CAST(SUM(CASE WHEN NOT treated THEN converted ELSE 0 END)
                AS BIGINT) AS conv_ctrl
            FROM a GROUP BY 1)
      SELECT CAST(decile AS BIGINT) AS decile, n_treat, n_ctrl,
        conv_treat, conv_ctrl,
        round(CAST(conv_treat AS DOUBLE) / n_treat, 9) AS rate_treat,
        round(CAST(conv_ctrl AS DOUBLE) / n_ctrl, 9) AS rate_ctrl,
        round(CAST(conv_treat AS DOUBLE) / n_treat
          - CAST(conv_ctrl AS DOUBLE) / n_ctrl, 9) AS uplift
      FROM g ORDER BY decile"""

  val queries: Map[String, Q] = Map(
    "e64_uplift"        -> e64_uplift,
    "e54_cusum"         -> e54_cusum,
    "e55_rate_limit"    -> e55_rate_limit,
    "e56_window_funnel" -> e56_window_funnel,
    "e57_incremental_sessions" -> e57_incremental_sessions,
    "e58_seq_match"     -> e58_seq_match,
    "e59_ab_proportion" -> e59_ab_proportion,
    "e60_kaplan_meier"  -> e60_kaplan_meier,
    "e61_funnel_ci"     -> e61_funnel_ci,
    "e62_sample_size"   -> e62_sample_size,
    "e63_did"           -> e63_did,
  )
  val oracles: Map[String, String] = Map(
    "e64_uplift"        -> e64Sql,
    "e54_cusum"         -> e54Sql,
    "e55_rate_limit"    -> e55Sql,
    "e56_window_funnel" -> e56Sql,
    "e57_incremental_sessions" -> e57Sql,
    "e58_seq_match"     -> e58Sql,
    "e59_ab_proportion" -> e59Sql,
    "e60_kaplan_meier"  -> e60Sql,
    "e61_funnel_ci"     -> e61Sql,
    "e62_sample_size"   -> e62Sql,
    "e63_did"           -> e63Sql,
  )
}
