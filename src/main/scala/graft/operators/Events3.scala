package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event analytics, part 3: anomaly detection and marketing attribution.
  */
object Events3 {
  type Q = (SparkSession, String) => DataFrame

  // ---- e11: z-score anomaly detection on daily event volumes ----
  // One shuffle to the (event_type, day) rollup; the per-type moments
  // come from exact integer sums (count, sum n, sum n^2), so mean/std —
  // and therefore the z-scores — are bit-identical on any engine and any
  // partitioning. The stats join is vocabulary-sized (one row per event
  // type) and broadcasts.
  val e11_anomaly: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("days"), sum("n").as("sn"),
        sum(col("n") * col("n")).as("sn2"))
      .withColumn("mean", col("sn").cast("double") / col("days"))
      .withColumn("sd", sqrt(
        (col("sn2").cast("double")
          - col("sn").cast("double") * col("sn").cast("double") / col("days"))
          / (col("days") - 1)))
      .select("event_type", "mean", "sd")
    daily.join(broadcast(stats), "event_type")
      .withColumn("z", round((col("n").cast("double") - col("mean")) / col("sd"), 9))
      .filter(abs(col("z")) > 2.0)
      .select("event_type", "day", "n", "z")
      .orderBy("event_type", "day")
  }
  val e11Sql: String =
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
               FROM events GROUP BY 1, 2),
      st AS (SELECT event_type, COUNT(*) AS days,
                    CAST(SUM(n) AS BIGINT) AS sn, CAST(SUM(n*n) AS BIGINT) AS sn2
             FROM daily GROUP BY 1),
      z AS (SELECT d.event_type, d.day, d.n,
              round((CAST(d.n AS DOUBLE) - CAST(sn AS DOUBLE)/days)
                / sqrt((CAST(sn2 AS DOUBLE) - CAST(sn AS DOUBLE)*CAST(sn AS DOUBLE)/days)
                       / (days - 1)), 9) AS z
            FROM daily d JOIN st USING (event_type))
      SELECT event_type, day, n, z FROM z WHERE abs(z) > 2.0
      ORDER BY event_type, day"""

  // ---- e12: last-touch attribution (purchase -> latest prior click) ----
  // One window pass over the user-partitioned event stream: a running
  // conditional max carries the latest click timestamp forward, so every
  // purchase reads its attribution in the same shuffle that sorted the
  // stream — no self-join of purchases against clicks, no range-join
  // blow-up. The strictly-preceding ROWS frame (with event_id as the
  // deterministic tie-break) keeps a same-instant click out of its own
  // purchase's window.
  val e12_attribution: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select("event_id", "user_id", "ts", "event_type")
      .withColumn("click_ts",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase" && col("click_ts").isNotNull)
      .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(col("click_ts")))
      .filter(col("gap_us") <= 86400000000L) // attribute within 24h
      .select("event_id", "user_id", "ts", "click_ts", "gap_us")
      .orderBy("event_id")
  }
  val e12Sql: String =
    """WITH a AS (SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts
           FROM events)
      SELECT event_id, user_id, ts, click_ts,
             epoch_us(ts) - epoch_us(click_ts) AS gap_us
      FROM a
      WHERE event_type = 'purchase' AND click_ts IS NOT NULL
        AND epoch_us(ts) - epoch_us(click_ts) <= 86400000000
      ORDER BY event_id"""

  // ---- e13: top-k per time bucket (daily trending event types) ----
  // The "trending now" shape: rank WITHIN each day over the daily
  // rollup. The rank window partitions by day over an already-aggregated
  // table (days x event-types), so whatever the fact volume, the ranking
  // stage is constant-size — the 100 TB cost is the one rollup shuffle.
  val e13_daily_topk: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    daily
      .withColumn("rank", row_number().over(
        Window.partitionBy("day").orderBy(desc("n"), col("event_type"))).cast("long"))
      .filter(col("rank") <= 3)
      .select("day", "rank", "event_type", "n")
      .orderBy("day", "rank")
  }
  val e13Sql: String =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
               FROM events GROUP BY 1, 2),
      r AS (SELECT day, event_type, n,
              row_number() OVER (PARTITION BY day ORDER BY n DESC, event_type) AS rank
            FROM daily)
      SELECT day, rank, event_type, n FROM r WHERE rank <= 3
      ORDER BY day, rank"""

  // ---- e14: duplicate-delivery rate per hour ----
  // At-least-once ingestion monitoring: rows vs distinct event ids per
  // hour window. The duplicated feed is simulated by re-appending every
  // 7th event. count + count(distinct id) per window is one partial-agg
  // pass; at scale the distinct count stays shuffle-bounded because the
  // grouping key (hour) partitions the id space.
  val e14_dup_rate: Q = (s, d) => {
    val ev = Tables.events(s, d).select("event_id", "ts")
    val dupd = ev.union(ev.filter(col("event_id") % 7 === 0))
    dupd.groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n_rows"), countDistinct("event_id").as("n_unique"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("n_unique").cast("double") / col("n_rows"), 9))
      .orderBy("hr")
  }
  val e14Sql: String =
    """WITH feed AS (
        SELECT event_id, ts FROM events
        UNION ALL
        SELECT event_id, ts FROM events WHERE event_id % 7 = 0)
      SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS n_rows,
             COUNT(DISTINCT event_id) AS n_unique,
             round(1.0 - CAST(COUNT(DISTINCT event_id) AS DOUBLE) / COUNT(*), 9) AS dup_rate
      FROM feed GROUP BY 1 ORDER BY hr"""

  // ---- e15: inter-arrival gap statistics per event type ----
  // Lag over the per-type time order, then exact integer microsecond
  // gaps (no double drift) aggregated per type. The window partitions on
  // event_type (few, large partitions — acceptable because the output is
  // type-cardinality; for high-cardinality keys this same plan shards
  // naturally). Event-id tie-break makes the order total, so the lag is
  // deterministic on any cluster.
  val e15_interarrival: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("gap", col("us") - lag("us", 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        sum("gap").as("total_gap_us"),
        max("gap").as("max_gap_us"),
        min("gap").as("min_gap_us"))
      .withColumn("avg_gap_us",
        round(col("total_gap_us").cast("double") / col("n_gaps"), 6))
      .orderBy("event_type")
  }
  val e15Sql: String =
    """WITH g AS (SELECT event_type,
          epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
            PARTITION BY event_type ORDER BY ts, event_id) AS gap
        FROM events)
      SELECT event_type, COUNT(*) AS n_gaps,
             CAST(SUM(gap) AS BIGINT) AS total_gap_us,
             max(gap) AS max_gap_us, min(gap) AS min_gap_us,
             round(CAST(SUM(gap) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_gap_us
      FROM g WHERE gap IS NOT NULL
      GROUP BY event_type ORDER BY event_type"""

  // ---- e16: RFM segmentation ----
  // Recency / frequency / monetary quintile scores per user, reported as
  // the segment distribution. Quintile boundaries come from exact
  // percentiles over the per-user rollup (one agg + broadcast, same
  // no-global-sort pattern as q72); monetary uses the decimal-exact sum.
  // Output is at most 5^3 segment rows regardless of user count.
  val e16_rfm: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val perUser = ev.groupBy("user_id").agg(
      max(to_date(col("ts"))).as("last_day"),
      count(lit(1)).cast("double").as("freq"),
      graft.Stable.dsum(col("value")).as("mon"))
    val refDay = ev.agg(max(to_date(col("ts"))).as("ref_day"))
    val withR = perUser.join(broadcast(refDay))
      .withColumn("rec", datediff(col("ref_day"), col("last_day")).cast("double"))
    val bounds = withR.agg(
      expr("percentile(rec, array(0.2D, 0.4D, 0.6D, 0.8D))").as("rb"),
      expr("percentile(freq, array(0.2D, 0.4D, 0.6D, 0.8D))").as("fb"),
      expr("percentile(mon, array(0.2D, 0.4D, 0.6D, 0.8D))").as("mb"))
    withR.join(broadcast(bounds))
      .withColumn("r_score",
        expr("CAST(5 - size(filter(rb, b -> rec > b)) AS BIGINT)"))
      .withColumn("f_score",
        expr("CAST(size(filter(fb, b -> freq > b)) + 1 AS BIGINT)"))
      .withColumn("m_score",
        expr("CAST(size(filter(mb, b -> mon > b)) + 1 AS BIGINT)"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("r_score", "f_score", "m_score")
  }
  val e16Sql: String =
    """WITH pu AS (SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
            CAST(COUNT(*) AS DOUBLE) AS freq,
            CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS mon
          FROM events GROUP BY user_id),
      rd AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM events),
      wr AS (SELECT user_id, freq, mon,
               CAST(ref_day - last_day AS DOUBLE) AS rec
             FROM pu CROSS JOIN rd),
      bs AS (SELECT quantile_cont(rec, [0.2, 0.4, 0.6, 0.8]) AS rb,
                    quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS fb,
                    quantile_cont(mon, [0.2, 0.4, 0.6, 0.8]) AS mb
             FROM wr),
      sc AS (SELECT
               CAST(5 - len(list_filter(rb, b -> rec > b)) AS BIGINT) AS r_score,
               CAST(len(list_filter(fb, b -> freq > b)) + 1 AS BIGINT) AS f_score,
               CAST(len(list_filter(mb, b -> mon > b)) + 1 AS BIGINT) AS m_score
             FROM wr CROSS JOIN bs)
      SELECT r_score, f_score, m_score, COUNT(*) AS n_users
      FROM sc GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score"""

  // ---- e17: rolling active users (DAU / WAU / MAU) ----
  // The engagement staple. Scale plan: ONE distinct (day, user) rollup
  // off the event stream (the only corpus-sized shuffle — everything
  // downstream works on users x active-days, orders of magnitude
  // smaller), then a range join against the broadcast day spine fans
  // each rollup row to the <=7 / <=28 target days it supports, and
  // per-day distinct counts aggregate that. Exact by construction; the
  // sketch path (q30/d07's HLL/KMV family) is the approximate
  // alternative when even the rollup-x-window fan-out is too hot.
  val e17_active_users: Q = (s, d) => {
    val du = Tables.events(s, d)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val days = du.select(col("d").as("td")).distinct()
    // One pass: each (day, user) activity row contributes to the next 28
    // report days via a NARROW offset explode + broadcast equi-join on
    // the day spine (drops trailing days past the data) — replication is
    // bounded by the window length, and no nested-loop range join ever
    // forms. The three windows then fall out of ONE distinct-aggregate
    // over the offset (dau: off=0, wau: off<7, mau: all), instead of
    // three separate join+agg jobs over the rollup.
    du.select(col("user_id"), col("d"), explode(expr("sequence(0, 27)")).as("off"))
      .withColumn("td", expr("date_add(d, CAST(off AS INT))"))
      .join(broadcast(days), "td")
      .groupBy("td").agg(
        countDistinct(when(col("off") === 0, col("user_id"))).as("dau"),
        countDistinct(when(col("off") <= 6, col("user_id"))).as("wau"),
        countDistinct("user_id").as("mau"))
      .select(col("td").as("day"), col("dau"), col("wau"), col("mau"))
      .orderBy("day")
  }
  val e17Sql: String =
    """WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d,
                        user_id FROM events),
      days AS (SELECT DISTINCT d AS td FROM du)
      SELECT td AS day,
        (SELECT COUNT(DISTINCT user_id) FROM du WHERE du.d = days.td) AS dau,
        (SELECT COUNT(DISTINCT user_id) FROM du
          WHERE du.d BETWEEN days.td - 6 AND days.td) AS wau,
        (SELECT COUNT(DISTINCT user_id) FROM du
          WHERE du.d BETWEEN days.td - 27 AND days.td) AS mau
      FROM days ORDER BY day"""

  val queries: Map[String, Q] = Map(
    "e11_anomaly"      -> e11_anomaly,
    "e12_attribution"  -> e12_attribution,
    "e13_daily_topk"   -> e13_daily_topk,
    "e14_dup_rate"     -> e14_dup_rate,
    "e15_interarrival" -> e15_interarrival,
    "e16_rfm"          -> e16_rfm,
    "e17_active_users" -> e17_active_users,
  )
  val oracles: Map[String, String] = Map(
    "e11_anomaly"     -> e11Sql,
    "e12_attribution" -> e12Sql,
    "e13_daily_topk"   -> e13Sql,
    "e14_dup_rate"     -> e14Sql,
    "e15_interarrival" -> e15Sql,
    "e16_rfm"          -> e16Sql,
    "e17_active_users" -> e17Sql,
  )
}
