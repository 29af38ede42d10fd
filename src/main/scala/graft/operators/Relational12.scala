package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.zorder2

/** Relational/ETL core, part 12. */
object Relational12 {
  type Q = (SparkSession, String) => DataFrame

  // ---- q85: 2-D Pareto frontier (skyline) ----
  // "Best tradeoff" queries — largest part for the money, freshest doc
  // per token cost — are dominance queries: keep the points no other
  // point beats on BOTH axes. The textbook NOT-EXISTS self-join is
  // cells² and dead at scale; GraftOps.skyline2d runs the distributed
  // sweep-line instead (distinct cells -> range-repartition on the
  // sweep order -> parallel per-partition prefix-max windows ->
  // partition-count carry-in maxima broadcast back), so the frontier
  // of 10⁹ cells costs one hash agg + one range exchange + a linear
  // scan per partition. The oracle replays literal NOT-EXISTS
  // dominance — quadratic is fine for DuckDB at sf0.01, and agreeing
  // with it proves the sweep decomposition exact.
  val q85_skyline: Q = (s, d) => {
    graft.api.GraftOps.skyline2d(Tables.part(s, d), "p_size", "p_retailprice")
      .orderBy("p_size", "p_retailprice")
  }
  val q85Sql: String =
    """WITH cells AS (SELECT p_size, p_retailprice, COUNT(*) AS n_rows
                    FROM part GROUP BY 1, 2)
      SELECT p_size, p_retailprice, n_rows FROM cells c
      WHERE NOT EXISTS (
        SELECT 1 FROM cells o
        WHERE o.p_size >= c.p_size AND o.p_retailprice <= c.p_retailprice
          AND (o.p_size > c.p_size OR o.p_retailprice < c.p_retailprice))
      ORDER BY p_size, p_retailprice"""

  // ---- q86: weighted sampling without replacement (per stratum) ----
  // Curation pipelines sample "5 docs per language, longer docs more
  // likely" — weighted sampling WITHOUT replacement, which naive
  // weight-proportional Bernoulli doesn't give. This is the
  // exponential-clock form of Efraimidis-Spirakis A-ES reservoir
  // sampling: per row draw t = -ln(u)/w (u uniform, w the weight); the
  // k smallest t per stratum are exactly a weighted draw without
  // replacement. One narrow map + one partitioned rank window — no
  // shuffle beyond the window's, and on a stream the same keys feed a
  // per-key size-k heap (the reservoir form). u is the deterministic
  // md5-derived uniform (p02's discipline), so the sample is
  // reproducible across runs, partitions, and cluster sizes — and
  // replayable by the oracle. Output t rounded 1e-9 (ln is correctly
  // rounded on both engines for these 2^32-grid inputs in practice;
  // rounding absorbs any last-ulp divergence).
  val q86_weighted_sample: Q = (s, d) => {
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(1.0)) / lit(4294967297.0)
    val w = Window.partitionBy("lang")
      .orderBy(col("t").asc, col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("t", -log(u) / col("n_chars").cast("double"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"),
        round(col("t"), 9).as("clock"))
      .orderBy("lang", "rk")
  }
  val q86Sql: String =
    """WITH t AS (
        SELECT lang, doc_id, n_chars,
               -ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    + 1.0) / 4294967297.0) / CAST(n_chars AS DOUBLE) AS t
        FROM documents),
      r AS (SELECT lang, doc_id, n_chars, t,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY t, doc_id) AS rk
            FROM t)
      SELECT lang, rk, doc_id, n_chars, round(t, 9) AS clock
      FROM r WHERE rk <= 5 ORDER BY lang, rk"""

  // ---- q87: z-order layout audit ----
  // The data-layout story at 100 TB: files written in Morton-key order
  // carry narrow min/max stats on EVERY z-dimension, so range
  // predicates on ANY of them prune files at planning time (Delta
  // OPTIMIZE ZORDER / Iceberg z-sort). This operator computes the
  // 32-bit Morton key with the codegen'd ZOrder2 expression (customer
  // × order-day as the two dims), buckets by z-prefix (z >> 18 — each
  // bucket = one would-be file), and emits the per-bucket min/max of
  // both dimensions: the audit a table-layout service runs to verify
  // clustering quality before flipping reads to the new layout. The
  // oracle replays the bit interleave as shift/mask arithmetic in SQL
  // — proving the codegen'd kernel exact. Plan: one narrow map + one
  // bucket-count-sized aggregate; the real write path adds only
  // repartitionByRange(z) before the sink.
  val q87_zorder: Q = (s, d) => {
    Tables.orders(s, d)
      .select(
        (col("o_custkey") % 65536).cast("int").as("x"),
        (datediff(to_date(col("o_orderdate")), lit("1992-01-01")) % 65536)
          .cast("int").as("y"))
      .withColumn("z", zorder2(col("x"), col("y")))
      .groupBy(shiftright(col("z"), 18).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min("x").cast("long").as("min_x"), max("x").cast("long").as("max_x"),
        min("y").cast("long").as("min_y"), max("y").cast("long").as("max_y"))
      .orderBy("bucket")
  }
  val q87Sql: String =
    """WITH b AS (
        SELECT o_orderkey, o_custkey % 65536 AS x,
               (CAST(o_orderdate AS DATE) - DATE '1992-01-01') % 65536 AS y
        FROM orders),
      z AS (
        SELECT x, y,
               CAST((SELECT SUM(((x >> g.i) & 1)::BIGINT << (2 * g.i)) +
                            SUM(((y >> g.i) & 1)::BIGINT << (2 * g.i + 1))
                     FROM generate_series(0, 15) g(i)) AS BIGINT) AS z
        FROM b)
      SELECT z >> 18 AS bucket, COUNT(*) AS n,
             CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
             CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y
      FROM z GROUP BY 1 ORDER BY bucket"""

  // ---- q88: period-over-period growth (MoM / YoY) ----
  // The reporting staple: monthly revenue with month-over-month and
  // year-over-year deltas. The usual formulation is lag() over the
  // full month series — an UNPARTITIONED window, the single-task trap
  // this suite bans outright. But after the fact-scale aggregate the
  // series is metadata-sized (one row per month), so the engine shape
  // is: ONE map-side-combinable monthly aggregate, then two BROADCAST
  // self-joins on an integer month index (mi = y*12+m; mi-1 = MoM,
  // mi-12 = YoY) — no window anywhere, no sort, and the month spine
  // never touches a single-task funnel however many years of facts
  // arrive. Revenue sums ride DECIMAL (exact, order-independent);
  // growth is a fixed (cur-prev)/prev IEEE division of two identically
  // derived doubles, so the oracle hash-matches bit-exact.
  val q88_period_growth: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    val monthly = Tables.orders(s, d)
      .select(col("o_orderdate").cast("date").as("od"), col("o_totalprice"))
      .groupBy((year(col("od")) * 12 + month(col("od"))).as("mi"))
      .agg(min(trunc(col("od"), "month")).as("month"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(30, 6))).cast("double")
          .as("rev"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prev = monthly.select(col("mi").as("pmi"), col("rev").as("prev_rev"))
    val yoy  = monthly.select(col("mi").as("ymi"), col("rev").as("yoy_rev"))
    monthly
      .join(broadcast(prev), col("mi") === col("pmi") + 1, "left")
      .join(broadcast(yoy),  col("mi") === col("ymi") + 12, "left")
      .select(col("month"), col("n_orders"), round(col("rev"), 6).as("revenue"),
        round((col("rev") - col("prev_rev")) / col("prev_rev"), 9).as("mom_pct"),
        round((col("rev") - col("yoy_rev")) / col("yoy_rev"), 9).as("yoy_pct"))
      .orderBy("month")
  }
  val q88Sql: String =
    """WITH m AS (
        SELECT year(CAST(o_orderdate AS DATE)) * 12
                 + month(CAST(o_orderdate AS DATE)) AS mi,
               MIN(date_trunc('month', CAST(o_orderdate AS DATE))) AS month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS rev
        FROM orders GROUP BY 1)
      SELECT c.month, c.n_orders, round(c.rev, 6) AS revenue,
             round((c.rev - p.rev) / p.rev, 9) AS mom_pct,
             round((c.rev - y.rev) / y.rev, 9) AS yoy_pct
      FROM m c
        LEFT JOIN m p ON c.mi = p.mi + 1
        LEFT JOIN m y ON c.mi = y.mi + 12
      ORDER BY c.month"""

  // ---- q89: in-window event dedup (telemetry keep-first) ----
  // The ingest-side dedup stage for at-least-once telemetry: within
  // each (user, event_type) stream, an event arriving inside the
  // suppression window of its predecessor is a re-fire, not a signal —
  // keep the stream's "session starts" (gap NULL or ≥ 1h), drop the
  // rest, and report the per-type audit. ONE key-partitioned lag
  // window (the standard single shuffle), exact integer-microsecond
  // gaps, then a combinable type rollup — at 100 TB this is the same
  // shape Structured Streaming runs with dropDuplicatesWithinWatermark
  // (the streaming variant in graft.streaming covers that side); this
  // is the batch/backfill twin. The 1h window matches the corpus's
  // observed duplicate-burst scale (min same-key gap ≈ 8 s; 5 s would
  // be vacuous here — threshold is an operator PARAMETER, the value is
  // a corpus fact, stated honestly).
  val q89_window_dedup: Q = (s, d) => {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select("user_id", "event_type", "ts", "event_id")
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("dropped", col("gap_us").isNotNull && col("gap_us") < 3600000000L)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"))
      .select(col("event_type"), col("n_events"), col("n_dropped"),
        round(col("n_dropped").cast("double") / col("n_events").cast("double"), 9)
          .as("drop_rate"))
      .orderBy("event_type")
  }
  val q89Sql: String =
    """WITH g AS (
        SELECT event_type,
               epoch_us(ts) - epoch_us(lag(ts) OVER (
                 PARTITION BY user_id, event_type
                 ORDER BY ts, event_id)) AS gap_us
        FROM events)
      SELECT event_type, COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us < 3600000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
             round(CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us < 3600000000
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS drop_rate
      FROM g GROUP BY 1 ORDER BY event_type"""

  // ---- q90: spend-decile migration matrix ----
  // The churn-analytics staple: bucket customers into spend deciles in
  // two periods and count the decile->decile transitions (who moved up,
  // who lapsed toward the bottom). The naive ntile() is a GLOBAL sort
  // window — the single-task trap — so deciles are assigned the q72
  // way: per-period percentile BOUNDS (one tiny broadcast row) and a
  // value-vs-bounds comparison per customer, no customer-level sort
  // anywhere. Per-customer spend rides the dsum decimal discipline
  // (exact, order-independent), so both engines see bit-identical
  // doubles; bound interpolation is then the same arithmetic on the
  // same sorted values, and decile assignment (strict > on raw bounds)
  // is exact. Plan: two fact-scale combinable aggregates, two scalar
  // broadcasts, one customer-keyed join, one 100-cell rollup.
  val q90_decile_migration: Q = (s, d) => {
    import graft.Stable.dsum
    val split = lit("1998-05-01").cast("timestamp")
    def spend(p: DataFrame): DataFrame =
      p.groupBy("o_custkey").agg(dsum(col("o_totalprice")).as("spend"))
    def decile(df: DataFrame): DataFrame = {
      val bounds = df.agg(expr(
        "percentile(spend, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
        .as("bs"))
      df.join(broadcast(bounds))
        .withColumn("dec",
          expr("CAST(size(filter(bs, b -> spend > b)) + 1 AS BIGINT)"))
        .select("o_custkey", "dec")
    }
    val o = Tables.orders(s, d)
    val d1 = decile(spend(o.filter(col("o_orderdate") < split)))
      .withColumnRenamed("dec", "decile_p1")
    val d2 = decile(spend(o.filter(col("o_orderdate") >= split)))
      .withColumnRenamed("dec", "decile_p2")
    d1.join(d2, "o_custkey")
      .groupBy("decile_p1", "decile_p2")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("decile_p1", "decile_p2")
  }
  val q90Sql: String =
    """WITH s1 AS (SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS spend
               FROM orders WHERE o_orderdate < TIMESTAMP '1998-05-01'
               GROUP BY 1),
      s2 AS (SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS spend
             FROM orders WHERE o_orderdate >= TIMESTAMP '1998-05-01'
             GROUP BY 1),
      b1 AS (SELECT quantile_cont(spend,
               [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs FROM s1),
      b2 AS (SELECT quantile_cont(spend,
               [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs FROM s2),
      d1 AS (SELECT o_custkey,
                    len(list_filter(b1.bs, b -> spend > b)) + 1 AS decile_p1
             FROM s1 CROSS JOIN b1),
      d2 AS (SELECT o_custkey,
                    len(list_filter(b2.bs, b -> spend > b)) + 1 AS decile_p2
             FROM s2 CROSS JOIN b2)
      SELECT CAST(decile_p1 AS BIGINT) AS decile_p1,
             CAST(decile_p2 AS BIGINT) AS decile_p2,
             COUNT(*) AS n_customers
      FROM d1 JOIN d2 USING (o_custkey)
      GROUP BY 1, 2 ORDER BY decile_p1, decile_p2"""

  val queries: Map[String, Q] = Map(
    "q85_skyline"          -> q85_skyline,
    "q86_weighted_sample"  -> q86_weighted_sample,
    "q87_zorder"           -> q87_zorder,
    "q88_period_growth"    -> q88_period_growth,
    "q89_window_dedup"     -> q89_window_dedup,
    "q90_decile_migration" -> q90_decile_migration,
  )
  val oracles: Map[String, String] = Map(
    "q85_skyline"          -> q85Sql,
    "q86_weighted_sample"  -> q86Sql,
    "q87_zorder"           -> q87Sql,
    "q88_period_growth"    -> q88Sql,
    "q89_window_dedup"     -> q89Sql,
    "q90_decile_migration" -> q90Sql,
  )
}
