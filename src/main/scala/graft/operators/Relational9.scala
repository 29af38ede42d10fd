package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Stable, Tables}

/** Relational/ETL core, part 9: gaps-and-islands and FILTER-clause
  * conditional aggregation.
  */
object Relational9 {
  type Q = (SparkSession, String) => DataFrame

  // ---- q66: gaps-and-islands (consecutive-day activity streaks) ----
  // The classic island key: day minus row_number is constant within a
  // consecutive run. Everything after the distinct-day projection
  // operates on the (user, day) table — tiny relative to the event log —
  // and the window shuffle is the only wide stage, partitioned by
  // user_id (no skew: one user's days fit any executor).
  val q66_gaps_islands: Q = (s, d) => {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val islands = days
      .withColumn("rn", row_number().over(w))
      .withColumn("anchor", expr("date_sub(day, rn)"))
    val streaks = islands.groupBy("user_id", "anchor")
      .agg(count(lit(1)).as("len"))
    streaks.groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"),
        sum("len").as("active_days"),
        max("len").as("max_streak"))
      .orderBy("user_id")
  }
  val q66Sql: String =
    """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      isl AS (SELECT user_id, day,
                day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS anchor
              FROM days),
      st AS (SELECT user_id, anchor, COUNT(*) AS len FROM isl GROUP BY 1, 2)
      SELECT user_id, COUNT(*) AS n_streaks,
             CAST(SUM(len) AS BIGINT) AS active_days, max(len) AS max_streak
      FROM st GROUP BY user_id ORDER BY user_id"""

  // ---- q67: FILTER-clause conditional aggregates ----
  // Several differently-predicated aggregates in ONE pass over the fact
  // table (no self-joins, no re-scans); all branches stay map-side
  // combinable. Double revenue goes through the decimal-exact sum.
  val q67_filtered_agg: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        count(when(col("o_totalprice") > 200000.0, 1)).as("n_big"),
        round(Stable.dsum(when(col("o_orderstatus") === "F", col("o_totalprice"))), 4)
          .as("rev_f"))
      .orderBy("o_orderpriority")
  val q67Sql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_total,
             COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
             COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
             COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
             round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                        FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 4) AS rev_f
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- q68: latest-record-per-key compaction ----
  // The CDC/upsert-log staple: many change records per user, keep the
  // most recent (ts desc, event_id desc tie-break). One window shuffle
  // on the key — at scale this is the log-compaction pass that runs
  // before every snapshot publish.
  val q68_latest_per_key: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(desc("ts"), desc("event_id"))
    Tables.events(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("user_id", "event_id", "ts", "event_type", "value")
      .orderBy("user_id")
  }
  val q68Sql: String =
    """SELECT user_id, event_id, ts, event_type, value FROM (
        SELECT user_id, event_id, ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rk
        FROM events) t
      WHERE rk = 1 ORDER BY user_id"""

  // ---- q69: overlapping-interval coalescing (merge intervals) ----
  // Each order opens a 30-day activity interval; merge overlaps per
  // customer into maximal islands. Running-max-of-end over a key window
  // is the O(n log n) single-shuffle plan — no self-join, no interval
  // pair blowup. Tie rows are identical tuples, so the ROWS-frame
  // running sum is order-invariant across engines.
  val q69_merge_intervals: Q = (s, d) => {
    val iv = Tables.orders(s, d)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("s0"))
      .withColumn("e0", date_add(col("s0"), 30))
    val w = Window.partitionBy("o_custkey").orderBy("s0", "e0")
    val marked = iv
      .withColumn("pmax",
        max("e0").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("newi",
        when(col("pmax").isNull || col("s0") > col("pmax"), 1L).otherwise(0L))
      .withColumn("grp",
        sum("newi").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val merged = marked.groupBy("o_custkey", "grp")
      .agg(min("s0").as("m_start"), max("e0").as("m_end"),
        count(lit(1)).as("n_orders"))
    merged.groupBy("o_custkey")
      .agg(count(lit(1)).as("n_intervals"),
        sum(datediff(col("m_end"), col("m_start"))).cast("long").as("covered_days"),
        max("n_orders").as("max_merged"))
      .orderBy("o_custkey")
  }
  val q69Sql: String =
    """WITH iv AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS s0,
                        CAST(o_orderdate AS DATE) + 30 AS e0 FROM orders),
      m AS (SELECT o_custkey, s0, e0,
              max(e0) OVER (PARTITION BY o_custkey ORDER BY s0, e0
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
            FROM iv),
      g AS (SELECT *, CASE WHEN pmax IS NULL OR s0 > pmax THEN 1 ELSE 0 END AS newi FROM m),
      gg AS (SELECT *, SUM(newi) OVER (PARTITION BY o_custkey ORDER BY s0, e0
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM g),
      mg AS (SELECT o_custkey, grp, min(s0) AS m_start, max(e0) AS m_end,
                    COUNT(*) AS n_orders
             FROM gg GROUP BY 1, 2)
      SELECT o_custkey, COUNT(*) AS n_intervals,
             CAST(SUM(m_end - m_start) AS BIGINT) AS covered_days,
             max(n_orders) AS max_merged
      FROM mg GROUP BY o_custkey ORDER BY o_custkey"""

  // ---- q73: weighted aggregates ----
  // Quantity-weighted price stats per return flag. Factors cast to
  // decimal BEFORE the product (the proven exact-product recipe, see
  // q31): sums stay order-independent and partial-agg friendly; the
  // single division runs in double identically on both engines.
  val q73_weighted_stats: Q = (s, d) => {
    val D = org.apache.spark.sql.types.DecimalType(18, 6)
    val qd = col("l_quantity").cast(D)
    val pd = col("l_extendedprice").cast(D)
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(qd).cast("double").as("w_total"),
        sum(qd * pd).cast("double").as("wx"))
      .withColumn("wavg_price", round(col("wx") / col("w_total"), 6))
      .select("l_returnflag", "n", "w_total", "wavg_price")
      .orderBy("l_returnflag")
  }
  val q73Sql: String =
    """SELECT l_returnflag, n, w_total, round(wx / w_total, 6) AS wavg_price
      FROM (SELECT l_returnflag, COUNT(*) AS n,
              CAST(SUM(qd) AS DOUBLE) AS w_total,
              CAST(SUM(qd * pd) AS DOUBLE) AS wx
            FROM (SELECT l_returnflag,
                    CAST(l_quantity AS DECIMAL(19,6)) AS qd,
                    CAST(l_extendedprice AS DECIMAL(19,6)) AS pd
                  FROM lineitem) r
            GROUP BY l_returnflag) t
      ORDER BY l_returnflag"""

  // ---- q75: key-sequence gap detection (completeness audit) ----
  // Missing ranges in the order-key sequence as seen from LINEITEM —
  // i.e. orders that never produced a line item (the feed-completeness
  // question every ingest pipeline asks of an expected-contiguous key).
  // The naive formulation — lead() over ALL keys with no partition key —
  // funnels the entire table through one task; this plan keeps every
  // corpus-sized stage partitioned: two self anti-joins (shuffled on
  // the key) find gap BOUNDARIES (k+1 missing -> a gap starts at k+1;
  // k-1 missing -> a gap ends at k-1), and only the gap set — audit-
  // sized, orders of magnitude smaller than the keys — pays a global
  // row_number to pair the i-th start with the i-th end.
  val q75_id_gaps: Q = (s, d) => {
    val keys = Tables.lineitem(s, d).select(col("l_orderkey").as("k")).distinct()
    val bounds = keys.agg(min("k").as("mn"), max("k").as("mx"))
    // r14 (§2.4): gap boundaries from ONE value-keyed aggregate instead
    // of two self anti-joins. Every key votes three facts about the
    // value line — "v is present" (v = k), "v-1 is present" (v = k+1),
    // "v+1 is present" (v = k-1) — and one combinable groupBy(v) fuses
    // them: a gap STARTS at v iff v is absent but v-1 present, ENDS at
    // v iff v is absent but v+1 present. Replaces the two key-keyed
    // anti-join exchanges (each shuffling the key set twice) with one
    // exchange of 3x key votes that partial aggregation collapses
    // map-side; output boundaries identical, bounds clamps unchanged
    // (v <= mx ⇔ old k < mx at v = k+1; v >= mn ⇔ old k > mn).
    val votes = keys.select(col("k").as("v"),
        lit(true).as("p"), lit(false).as("sw"), lit(false).as("ew"))
      .unionAll(keys.select((col("k") + 1).as("v"),
        lit(false).as("p"), lit(true).as("sw"), lit(false).as("ew")))
      .unionAll(keys.select((col("k") - 1).as("v"),
        lit(false).as("p"), lit(false).as("sw"), lit(true).as("ew")))
      .groupBy("v")
      .agg(max("p").as("present"), max("sw").as("prev_present"),
        max("ew").as("next_present"))
      .filter(!col("present"))
      .join(broadcast(bounds))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val starts = votes.filter(col("prev_present") && col("v") <= col("mx"))
      .select(col("v").as("gap_lo"))
    val ends = votes.filter(col("next_present") && col("v") >= col("mn"))
      .select(col("v").as("gap_hi"))
    // boundary numbering via GraftOps.globalRank (range-partitioned
    // rank + metadata-sized offsets): healthy data has an audit-sized
    // gap set, but pathological input can make it key-count-sized —
    // this keeps even that case off a single task
    graft.api.GraftOps.globalRank(starts, col("gap_lo"))
      .withColumnRenamed("rank", "i")
      .join(graft.api.GraftOps.globalRank(ends, col("gap_hi"))
        .withColumnRenamed("rank", "i"), "i")
      .select(col("gap_lo"), col("gap_hi"),
        (col("gap_hi") - col("gap_lo") + 1).as("gap_len"))
      .orderBy("gap_lo")
  }
  val q75Sql: String =
    """WITH k AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
      nx AS (SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM k)
      SELECT k + 1 AS gap_lo, nk - 1 AS gap_hi, nk - k - 1 AS gap_len
      FROM nx WHERE nk > k + 1 ORDER BY gap_lo"""

  // ---- q76: map-side bounded top-k per key ----
  // q09's semantics through graft.api.GraftOps.topKPerKey: per-partition
  // bounded heaps keep each key's k best rows BEFORE the shuffle, so the
  // exchange moves ~partitions x keys x k rows instead of the whole
  // table — the map-side-combine pattern applied to ranking, which
  // Spark's window operator cannot do on its own. Output (and oracle)
  // identical to q09: the pruning is provably lossless and the final
  // window uses the same (score desc, key asc) tie-break.
  val q76_topk_mapside: Q = (s, d) =>
    graft.api.GraftOps.topKPerKey(Tables.orders(s, d),
        "o_orderpriority", "o_totalprice", "o_orderkey", 3)
      .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rn")

  // ---- q77: as-of join with tolerance ----
  // pandas merge_asof(tolerance=...) semantics: the latest prior match
  // counts only if it is RECENT enough (here: view within 1 hour before
  // the purchase); staler matches become non-matches (nulls), exactly
  // like an expiring quote. Same single-shuffle union+window plan as
  // q34 — tolerance is a post-attach projection, costing nothing extra.
  val q77_asof_tolerance: Q = (s, d) => {
    val tolS = 3600L
    val base = Relational3.q34_asof_join(s, d)
    val ok = col("gap_s").isNotNull && col("gap_s") <= tolS
    base.select(
        col("event_id"), col("user_id"), col("ts"),
        when(ok, col("view_event_id")).as("view_event_id"),
        when(ok, col("view_ts")).as("view_ts"),
        when(ok, col("gap_s")).as("gap_s"))
      .orderBy("event_id")
  }
  val q77Sql: String =
    s"""WITH a AS (${Relational3.q34Sql.replace("ORDER BY p.event_id", "")})
      SELECT event_id, user_id, ts,
        CASE WHEN gap_s <= 3600 THEN view_event_id END AS view_event_id,
        CASE WHEN gap_s <= 3600 THEN view_ts END AS view_ts,
        CASE WHEN gap_s <= 3600 THEN gap_s END AS gap_s
      FROM a ORDER BY event_id"""

  // ---- q78: Count-Min frequency estimates ----
  // The bounded-memory frequency-table path for streams and 100 TB
  // scans: one groupless sketch aggregate (depth x width counters ride
  // map-side partial agg; memory is capacity-bounded, not
  // cardinality-bounded), broadcast to the key list, point-estimated
  // per key. Estimates are >= truth by construction and engine-exact
  // here: with 5 keys and width 1024, no key shares all 4 counter rows
  // (deterministic md5 row-hashes — verified at every SF), so the
  // oracle is the exact count. CmsSpec asserts the overestimate bound
  // under forced collisions (width 4).
  val q78_countmin_freq: Q = (s, d) => {
    import graft.functions.{countmin_agg, cms_estimate}
    val ev = Tables.events(s, d)
    val sketch = ev.agg(countmin_agg(col("event_type")).as("cms"))
    ev.groupBy("event_type").agg(count(lit(1)).as("n_exact"))
      .join(broadcast(sketch))
      .select(col("event_type"), col("n_exact"),
        cms_estimate(col("cms"), col("event_type")).as("n_est"))
      .orderBy("event_type")
  }
  val q78Sql: String =
    """SELECT event_type, COUNT(*) AS n_exact, COUNT(*) AS n_est
      FROM events GROUP BY 1 ORDER BY 1"""

  val queries: Map[String, Q] = Map(
    "q78_countmin_freq"   -> q78_countmin_freq,
    "q77_asof_tolerance"  -> q77_asof_tolerance,
    "q76_topk_mapside"    -> q76_topk_mapside,
    "q66_gaps_islands"    -> q66_gaps_islands,
    "q67_filtered_agg"    -> q67_filtered_agg,
    "q68_latest_per_key"  -> q68_latest_per_key,
    "q69_merge_intervals" -> q69_merge_intervals,
    "q73_weighted_stats"  -> q73_weighted_stats,
    "q75_id_gaps"         -> q75_id_gaps,
  )
  val oracles: Map[String, String] = Map(
    "q78_countmin_freq"   -> q78Sql,
    "q77_asof_tolerance"  -> q77Sql,
    // identical output to q09 by construction — shares its oracle
    "q76_topk_mapside"    -> Relational.q09Sql,
    "q66_gaps_islands"    -> q66Sql,
    "q67_filtered_agg"    -> q67Sql,
    "q68_latest_per_key"  -> q68Sql,
    "q69_merge_intervals" -> q69Sql,
    "q73_weighted_stats"  -> q73Sql,
    "q75_id_gaps"         -> q75Sql,
  )
}
