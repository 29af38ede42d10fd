package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational/ETL core, part 13. */
object Relational13 {
  type Q = (SparkSession, String) => DataFrame

  // ---- q91: join-key skew audit ----
  // The audit that decides a join strategy BEFORE the join runs: for
  // each candidate key, per-key counts (ONE combinable fact-scale
  // aggregate), then key-population stats — max/avg skew ratio, top-1
  // share, and the hot-key count (keys above 2x the mean). At 100 TB
  // this is what tells you whether AQE skew-split suffices, salting is
  // needed, or the dimension should broadcast; the audit itself never
  // shuffles more than the key-sized count frame. The hot-key test is
  // EXACT INTEGER arithmetic (cnt * n_keys > 2 * n_rows — no double
  // threshold to diverge on), and the reported ratios are single IEEE
  // divisions of exact int64 counts.
  // the library verb (GraftOps.skewAudit) IS the implementation — the
  // oracle gate below therefore certifies the facade itself
  private def audit(df: DataFrame, key: Column, label: String): DataFrame =
    graft.api.GraftOps.skewAudit(df, key, label)
  val q91_skew_audit: Q = (s, d) => {
    audit(Tables.lineitem(s, d), col("l_partkey"), "lineitem.l_partkey")
      .unionAll(audit(Tables.lineitem(s, d), col("l_suppkey"),
        "lineitem.l_suppkey"))
      .unionAll(audit(Tables.orders(s, d), col("o_custkey"),
        "orders.o_custkey"))
      .orderBy("key_name")
  }
  private def auditSql(table: String, key: String): String =
    s"""SELECT '$table.$key' AS key_name,
          CAST(SUM(cnt) AS BIGINT) AS n_rows,
          COUNT(*) AS n_keys,
          CAST(MAX(cnt) AS BIGINT) AS max_count,
          round(CAST(MAX(cnt) * COUNT(*) AS DOUBLE)
                / CAST(SUM(cnt) AS DOUBLE), 9) AS skew_ratio,
          round(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 9)
            AS top1_share,
          (SELECT COUNT(*)
           FROM (SELECT COUNT(*) AS c FROM $table GROUP BY $key) h
           WHERE h.c * (SELECT COUNT(*) FROM
                          (SELECT 1 FROM $table GROUP BY $key) z)
                 > 2 * (SELECT COUNT(*) FROM $table)) AS n_hot_keys
       FROM (SELECT COUNT(*) AS cnt FROM $table GROUP BY $key) g"""
  val q91Sql: String =
    s"""SELECT * FROM (
        ${auditSql("lineitem", "l_partkey")}
        UNION ALL
        ${auditSql("lineitem", "l_suppkey")}
        UNION ALL
        ${auditSql("orders", "o_custkey")}
      ) ORDER BY key_name"""

  // ---- q92: incremental materialized-view refresh (partial-state merge) ----
  // The incremental-view-maintenance kernel: a stored monthly rollup
  // (facts before the cutoff) is refreshed by MERGING the new
  // partition's partial aggregate — count/sum/min/max are all
  // mergeable states, so the refresh touches only the delta facts plus
  // the months-x-priorities state table, never re-scanning history.
  // That is THE 100 TB refresh story: re-aggregation of partials is
  // sum-of-sums / min-of-mins on a metadata-sized frame. The ORACLE is
  // the direct full-table aggregate — so the hash compare PROVES
  // merge(partial(base), partial(delta)) == full recompute, which is
  // the algebraic property IVM rests on. Revenue sums ride DECIMAL
  // end-to-end (exact, order- and split-independent); avg is derived
  // from merged states with ONE IEEE division at the end.
  val q92_view_refresh: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    val D = DecimalType(30, 6)
    val cutoff = lit("2000-01-01").cast("timestamp")
    def partialState(df: DataFrame): DataFrame =
      df.groupBy(trunc(col("o_orderdate").cast("date"), "month").as("month"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("c"),
          sum(col("o_totalprice").cast(D)).cast(D).as("sm"),
          min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"))
    val o = Tables.orders(s, d)
    val base  = partialState(o.filter(col("o_orderdate") <  cutoff))
    val delta = partialState(o.filter(col("o_orderdate") >= cutoff))
    base.unionAll(delta)
      .groupBy("month", "o_orderpriority")
      .agg(sum("c").as("n_orders"),
        sum(col("sm")).cast(D).as("__sm"),
        min("mn").as("min_price"), max("mx").as("max_price"))
      .select(col("month"), col("o_orderpriority"), col("n_orders"),
        round(col("__sm").cast("double"), 6).as("revenue"),
        col("min_price"), col("max_price"),
        round(col("__sm").cast("double") / col("n_orders").cast("double"), 9)
          .as("avg_price"))
      .orderBy("month", "o_orderpriority")
  }
  // the oracle recomputes from scratch — equality proves the merge
  val q92Sql: String =
    """SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
          o_orderpriority,
          COUNT(*) AS n_orders,
          round(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                  AS DECIMAL(30,6)) AS DOUBLE), 6) AS revenue,
          MIN(o_totalprice) AS min_price,
          MAX(o_totalprice) AS max_price,
          round(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                  AS DECIMAL(30,6)) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE), 9) AS avg_price
      FROM orders
      GROUP BY 1, 2 ORDER BY month, o_orderpriority"""

  // ---- q93: point-in-time SCD2 lookup with late-arriving fallback ----
  // The Kimball pattern q56 builds toward: facts joined to the
  // slowly-changing dimension AS OF the fact date, with orders whose
  // key has no valid version AT THAT DATE (the late-arriving-dimension
  // case: key first appears in the 1998-06 load) falling back to an
  // explicit UNKNOWN member instead of silently dropping. The dim is
  // q56's two-version shape re-dated into the order-date domain
  // (v1 from 1995-01-01, changed keys re-versioned at 1998-06-01;
  // 1-in-97 keys arrive only in the second load). Plan: the dim is
  // customer-sized -> BROADCAST; the compound join (equi on key +
  // validity range) hash-joins on the key and post-filters the <= 2
  // versions per key, so nothing range-shaped ever shuffles; the audit
  // rollup (per matched-version class: orders, keys, DECIMAL-exact
  // revenue) is combinable. Exact-date interval logic on both engines.
  val q93_scd_lookup: Q = (s, d) => {
    import graft.Stable.dsum
    val d0 = to_date(lit("1995-01-01"))
    val d1 = to_date(lit("1998-06-01"))
    val cust = Tables.customer(s, d)
    val early = cust.filter(col("c_custkey") % 97 =!= 0)
    val changed = early.filter(col("c_custkey") % 3 === 0)
    val dim =
      changed.select(col("c_custkey").as("k"), col("c_acctbal").as("bal"),
          d0.as("valid_from"), d1.as("valid_to"))
        .unionAll(changed.select(col("c_custkey").as("k"),
          (col("c_acctbal") + 100.0).as("bal"),
          d1.as("valid_from"), lit(null).cast("date").as("valid_to")))
        .unionAll(early.filter(col("c_custkey") % 3 =!= 0)
          .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"),
            d0.as("valid_from"), lit(null).cast("date").as("valid_to")))
        .unionAll(cust.filter(col("c_custkey") % 97 === 0)
          .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"),
            d1.as("valid_from"), lit(null).cast("date").as("valid_to")))
    val o = Tables.orders(s, d)
      .select(col("o_custkey").as("k"), to_date(col("o_orderdate")).as("od"),
        col("o_totalprice"))
    o.join(broadcast(dim),
        o("k") === dim("k") && col("od") >= col("valid_from")
          && (col("valid_to").isNull || col("od") < col("valid_to")),
        "left")
      .withColumn("version",
        when(col("valid_from").isNull, lit("unknown_member"))
          .when(col("valid_from") === d1, lit("v2"))
          .otherwise(lit("v1")))
      .groupBy("version")
      .agg(count(lit(1)).as("n_orders"),
        count_distinct(o("k")).as("n_keys"),
        round(dsum(col("o_totalprice")), 6).as("revenue"))
      .orderBy("version")
  }
  val q93Sql: String =
    s"""WITH dim AS (
        SELECT c_custkey AS k, c_acctbal AS bal,
               DATE '1995-01-01' AS valid_from, DATE '1998-06-01' AS valid_to
        FROM customer WHERE c_custkey % 97 <> 0 AND c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_acctbal + 100.0,
               DATE '1998-06-01', NULL
        FROM customer WHERE c_custkey % 97 <> 0 AND c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_acctbal, DATE '1995-01-01', NULL
        FROM customer WHERE c_custkey % 97 <> 0 AND c_custkey % 3 <> 0
        UNION ALL
        SELECT c_custkey, c_acctbal, DATE '1998-06-01', NULL
        FROM customer WHERE c_custkey % 97 = 0),
      j AS (
        SELECT CASE WHEN valid_from IS NULL THEN 'unknown_member'
                    WHEN valid_from = DATE '1998-06-01' THEN 'v2'
                    ELSE 'v1' END AS version,
               o.o_custkey, o.o_totalprice
        FROM orders o LEFT JOIN dim
          ON o.o_custkey = dim.k
             AND CAST(o.o_orderdate AS DATE) >= valid_from
             AND (valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < valid_to))
      SELECT version, COUNT(*) AS n_orders,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_keys,
             round(${graft.Stable.sqlSum("o_totalprice")}, 6) AS revenue
      FROM j GROUP BY 1 ORDER BY version"""

  // ---- q94: price/volume/mix revenue-delta decomposition ----
  // The finance-analytics staple behind every "why did revenue move"
  // review: per segment (order priority), the period-over-period
  // revenue delta splits EXACTLY into volume effect (Δvol × old avg
  // price), price effect (old vol × Δprice) and the cross/mix term
  // (Δvol × Δprice) — and the three effects sum to the delta by
  // construction (spec-pinned). Two combinable fact-scale aggregates
  // (one per period), a 5-row broadcast join, then pure row-local
  // IEEE arithmetic on DECIMAL-exact revenue and count inputs — every
  // derived number is a fixed sequence of ops on bit-identical
  // doubles, so the oracle hash-matches with no tolerance.
  val q94_mix_shift: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    val D = DecimalType(30, 6)
    val split = lit("1998-05-01").cast("timestamp")
    def side(df: DataFrame, tag: String): DataFrame =
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as(s"vol_$tag"),
          sum(col("o_totalprice").cast(D)).cast("double").as(s"rev_$tag"))
    val o = Tables.orders(s, d)
    side(o.filter(col("o_orderdate") < split), "old")
      .join(broadcast(side(o.filter(col("o_orderdate") >= split), "new")),
        "o_orderpriority")
      .withColumn("p_old", col("rev_old") / col("vol_old").cast("double"))
      .withColumn("p_new", col("rev_new") / col("vol_new").cast("double"))
      .withColumn("dvol", (col("vol_new") - col("vol_old")).cast("double"))
      .select(col("o_orderpriority"), col("vol_old"), col("vol_new"),
        round(col("rev_old"), 6).as("rev_old"),
        round(col("rev_new"), 6).as("rev_new"),
        round(col("rev_new") - col("rev_old"), 6).as("delta_rev"),
        round(col("dvol") * col("p_old"), 6).as("volume_effect"),
        round(col("vol_old").cast("double") * (col("p_new") - col("p_old")), 6)
          .as("price_effect"),
        round(col("dvol") * (col("p_new") - col("p_old")), 6).as("mix_effect"))
      .orderBy("o_orderpriority")
  }
  val q94Sql: String =
    """WITH o1 AS (SELECT o_orderpriority, COUNT(*) AS vol_old,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                   AS rev_old
               FROM orders WHERE o_orderdate < TIMESTAMP '1998-05-01'
               GROUP BY 1),
      o2 AS (SELECT o_orderpriority, COUNT(*) AS vol_new,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                   AS rev_new
             FROM orders WHERE o_orderdate >= TIMESTAMP '1998-05-01'
             GROUP BY 1),
      j AS (SELECT o1.o_orderpriority, vol_old, vol_new, rev_old, rev_new,
                   rev_old / CAST(vol_old AS DOUBLE) AS p_old,
                   rev_new / CAST(vol_new AS DOUBLE) AS p_new,
                   CAST(vol_new - vol_old AS DOUBLE) AS dvol
            FROM o1 JOIN o2 USING (o_orderpriority))
      SELECT o_orderpriority, vol_old, vol_new,
             round(rev_old, 6) AS rev_old, round(rev_new, 6) AS rev_new,
             round(rev_new - rev_old, 6) AS delta_rev,
             round(dvol * p_old, 6) AS volume_effect,
             round(CAST(vol_old AS DOUBLE) * (p_new - p_old), 6)
               AS price_effect,
             round(dvol * (p_new - p_old), 6) AS mix_effect
      FROM j ORDER BY o_orderpriority"""

  // ---- q95: equi-depth histogram (quantile buckets) ----
  // q57 gives equi-WIDTH buckets; optimizers and skew diagnostics want
  // equi-DEPTH — deciles of the value distribution with per-bucket
  // count, min, max and DECIMAL-exact sum. Bucket boundaries are the
  // q72 percentile-bounds broadcast (one tiny row), assignment is a
  // value-vs-bounds comparison — never a global ntile() sort. Depth
  // equality (counts within interpolation slack of n/10) is the spec's
  // assertion; the oracle replays the identical bounds arithmetic.
  val q95_equi_depth_hist: Q = (s, d) => {
    import graft.Stable.dsum
    val o = Tables.orders(s, d).select(col("o_totalprice").as("v"))
    val bounds = o.agg(expr(
      "percentile(v, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
      .as("bs"))
    o.join(broadcast(bounds))
      .withColumn("bucket",
        expr("CAST(size(filter(bs, b -> v > b)) + 1 AS BIGINT)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("v").as("lo"), max("v").as("hi"),
        round(dsum(col("v")), 6).as("total"))
      .orderBy("bucket")
  }
  val q95Sql: String =
    s"""WITH o AS (SELECT o_totalprice AS v FROM orders),
      bs AS (SELECT quantile_cont(v,
               [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs FROM o),
      a AS (SELECT v, len(list_filter(bs.bs, b -> v > b)) + 1 AS bucket
            FROM o CROSS JOIN bs)
      SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_rows,
             MIN(v) AS lo, MAX(v) AS hi,
             round(${graft.Stable.sqlSum("v")}, 6) AS total
      FROM a GROUP BY 1 ORDER BY bucket"""

  // ---- q96: rank-delta top movers ----
  // The reporting staple behind every "biggest gainers / losers" panel:
  // rank parts by period revenue in two periods, join on part, rank
  // the |rank delta|. Global ranks use GraftOps.globalRank (range-
  // partitioned prefix-count offsets — the sanctioned no-single-task
  // shape), revenue ties broken by part key so the ordering is total;
  // the final top-10 rides a TakeOrderedAndProject on (|Δrank| desc,
  // part). Only parts ACTIVE IN BOTH periods are ranked against each
  // other — rank deltas across different universes are meaningless
  // (stated, not fudged). DECIMAL-exact revenue, integer rank math.
  val q96_top_movers: Q = (s, d) => {
    import graft.Stable.dsum
    import graft.api.GraftOps.globalRank
    val split = lit("1996-07-01").cast("timestamp")
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    def rev(p: DataFrame): DataFrame =
      p.groupBy(col("l_partkey").as("part"))
        .agg(dsum(col("l_extendedprice")).as("rev"))
    val oldR = rev(li.filter(col("o_orderdate") < split))
    val newR = rev(li.filter(col("o_orderdate") >= split))
    val both = oldR.select(col("part"), col("rev").as("rev_old"))
      .join(newR.select(col("part"), col("rev").as("rev_new")), "part")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val r1 = globalRank(both.select("part", "rev_old"),
      desc("rev_old"), col("part")).withColumnRenamed("rank", "rank_old")
    val r2 = globalRank(both.select("part", "rev_new"),
      desc("rev_new"), col("part")).withColumnRenamed("rank", "rank_new")
    r1.join(r2, "part")
      .withColumn("rank_delta", col("rank_old") - col("rank_new"))
      .withColumn("abs_delta", abs(col("rank_delta")))
      .orderBy(desc("abs_delta"), col("part"))
      .limit(10)
      .select(col("part"), round(col("rev_old"), 6).as("rev_old"),
        round(col("rev_new"), 6).as("rev_new"),
        col("rank_old"), col("rank_new"), col("rank_delta"))
  }
  val q96Sql: String = {
    import graft.Stable.sqlSum
    s"""WITH li AS (SELECT l_partkey AS part, l_extendedprice, o_orderdate
                 FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      o AS (SELECT part, ${sqlSum("l_extendedprice")} AS rev_old
            FROM li WHERE o_orderdate < TIMESTAMP '1996-07-01' GROUP BY 1),
      n AS (SELECT part, ${sqlSum("l_extendedprice")} AS rev_new
            FROM li WHERE o_orderdate >= TIMESTAMP '1996-07-01' GROUP BY 1),
      b AS (SELECT o.part, rev_old, rev_new FROM o JOIN n ON o.part = n.part),
      r AS (SELECT part, rev_old, rev_new,
              CAST(row_number() OVER (ORDER BY rev_old DESC, part) AS BIGINT)
                AS rank_old,
              CAST(row_number() OVER (ORDER BY rev_new DESC, part) AS BIGINT)
                AS rank_new
            FROM b)
      SELECT part, round(rev_old, 6) AS rev_old, round(rev_new, 6) AS rev_new,
             rank_old, rank_new, rank_old - rank_new AS rank_delta
      FROM r
      ORDER BY abs(rank_old - rank_new) DESC, part LIMIT 10"""
  }

  // ---- q97: calendar dimension build ----
  // The first dimension every warehouse ships: a day spine spanning the
  // fact date range with the standard attributes (dow, week, month,
  // quarter, month-end flags, day indexes). Spine = ONE broadcast
  // min/max row + an in-row sequence explode — no fact-scale work at
  // all beyond the 1-row bounds aggregate; attributes are pure
  // deterministic date arithmetic. Weekday numbering pinned by the e26
  // cross-engine discipline; week-of-year avoided entirely (ISO-week
  // edge rules differ across engines — the spine carries an absolute
  // week INDEX instead, days-since-fixed-Monday div 7, which is what
  // joins and rollups actually need).
  val q97_calendar_dim: Q = (s, d) => {
    val bounds = Tables.orders(s, d)
      .agg(to_date(min(col("o_orderdate"))).as("lo"),
        to_date(max(col("o_orderdate"))).as("hi"))
    bounds.select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      .select(col("day"),
        (dayofweek(col("day")) - 1).as("dow"),
        expr("CAST(datediff(day, DATE '1970-01-05') div 7 AS BIGINT)")
          .as("week_index"),
        month(col("day")).as("month"),
        quarter(col("day")).as("quarter"),
        year(col("day")).as("year"),
        dayofmonth(col("day")).as("day_of_month"),
        (col("day") === last_day(col("day"))).as("is_month_end"),
        (dayofweek(col("day")).isin(1, 7)).as("is_weekend"))
      .orderBy("day")
  }
  val q97Sql: String =
    """WITH b AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
                       CAST(MAX(o_orderdate) AS DATE) AS hi FROM orders),
      sp AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS dts
             FROM b),
      dd AS (SELECT CAST(dts AS DATE) AS day FROM sp)
      SELECT day,
             CAST(dayofweek(day) AS INT) AS dow,
             CAST((day - DATE '1970-01-05') // 7 AS BIGINT) AS week_index,
             CAST(month(day) AS INT) AS month,
             CAST(quarter(day) AS INT) AS quarter,
             CAST(year(day) AS INT) AS year,
             CAST(dayofmonth(day) AS INT) AS day_of_month,
             day = last_day(day) AS is_month_end,
             dayofweek(day) IN (0, 6) AS is_weekend
      FROM dd ORDER BY day"""

  // ---- q99: within-group revenue concentration (top-3 share) ----
  // "How much of each nation's revenue sits with its top-3 customers?"
  // — the account-concentration risk metric. Per-customer revenue is
  // ONE combinable fact-scale aggregate; top-3 per nation rides
  // GraftOps.topKPerKey (per-partition bounded heaps prune BEFORE the
  // rank window, so no nation's full customer list ever sorts in one
  // task); shares are single IEEE divisions of DECIMAL-exact sums.
  val q99_group_concentration: Q = (s, d) => {
    import graft.Stable.{dsum, sqlSum}
    val rev = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nation"), col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("rev"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val natTotal = rev.groupBy("nation")
      .agg(sum(col("rev").cast(org.apache.spark.sql.types.DecimalType(30, 6)))
        .cast("double").as("nation_rev"),
        count(lit(1)).as("n_customers"))
    val top3 = graft.api.GraftOps
      .topKPerKey(rev, "nation", "rev", "o_custkey", 3)
      .groupBy("nation")
      .agg(sum(col("rev").cast(org.apache.spark.sql.types.DecimalType(30, 6)))
        .cast("double").as("top3_rev"))
    natTotal.join(top3, "nation")
      .select(col("nation"), col("n_customers"),
        round(col("nation_rev"), 6).as("nation_rev"),
        round(col("top3_rev"), 6).as("top3_rev"),
        round(col("top3_rev") / col("nation_rev"), 9).as("top3_share"))
      .orderBy("nation")
  }
  val q99Sql: String = {
    import graft.Stable.sqlSum
    s"""WITH rev AS (SELECT c_nationkey AS nation, o_custkey,
                  ${sqlSum("o_totalprice")} AS rev
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY 1, 2),
      nt AS (SELECT nation,
               CAST(SUM(CAST(rev AS DECIMAL(30,6))) AS DOUBLE) AS nation_rev,
               COUNT(*) AS n_customers
             FROM rev GROUP BY 1),
      rk AS (SELECT *, row_number() OVER (PARTITION BY nation
                        ORDER BY rev DESC, o_custkey) AS rn FROM rev),
      t3 AS (SELECT nation,
               CAST(SUM(CAST(rev AS DECIMAL(30,6))) AS DOUBLE) AS top3_rev
             FROM rk WHERE rn <= 3 GROUP BY 1)
      SELECT nation, n_customers,
             round(nation_rev, 6) AS nation_rev,
             round(top3_rev, 6) AS top3_rev,
             round(top3_rev / nation_rev, 9) AS top3_share
      FROM nt JOIN t3 USING (nation)
      ORDER BY nation"""
  }

  // ---- q101: hierarchical share-of-parent rollup ----
  // The drilldown every BI tool renders: revenue per nation with its
  // share of the REGION (parent level), plus the region subtotal's
  // share of the world — two levels of share-of-parent from ONE
  // fact-scale aggregate and two broadcast dim joins (q61 gives share
  // of total; this is the hierarchy form). DECIMAL-exact sums;
  // each share one IEEE division.
  val q101_hierarchy_share: Q = (s, d) => {
    import graft.Stable.dsum
    val rev = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"))
      .agg(dsum(col("o_totalprice")).as("rev"))
    val dims = Tables.nation(s, d)
      .select(col("n_nationkey").as("nk"), col("n_name"),
        col("n_regionkey").as("rk"))
      .join(broadcast(Tables.region(s, d)
        .select(col("r_regionkey").as("rk"), col("r_name"))), "rk")
    val byNation = rev.join(broadcast(dims), "nk")
    val D = org.apache.spark.sql.types.DecimalType(30, 6)
    val byRegion = byNation.groupBy("rk", "r_name")
      .agg(sum(col("rev").cast(D)).cast("double").as("region_rev"))
    val world = byRegion.agg(sum(col("region_rev").cast(D)).cast("double")
      .as("world_rev"))
    byNation.join(broadcast(byRegion.select("rk", "region_rev")), "rk")
      .crossJoin(broadcast(world))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        round(col("rev"), 6).as("nation_rev"),
        round(col("region_rev"), 6).as("region_rev"),
        round(col("rev") / col("region_rev"), 9).as("share_of_region"),
        round(col("region_rev") / col("world_rev"), 9).as("region_share_of_world"))
      .orderBy("region", "nation")
  }
  val q101Sql: String = {
    import graft.Stable.sqlSum
    s"""WITH rev AS (SELECT c_nationkey AS nk, ${sqlSum("o_totalprice")} AS rev
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY 1),
      dims AS (SELECT n_nationkey AS nk, n_name, n_regionkey AS rk, r_name
               FROM nation JOIN region ON n_regionkey = r_regionkey),
      bn AS (SELECT rev.nk, n_name, rk, r_name, rev
             FROM rev JOIN dims ON rev.nk = dims.nk),
      br AS (SELECT rk, r_name,
               CAST(SUM(CAST(rev AS DECIMAL(30,6))) AS DOUBLE) AS region_rev
             FROM bn GROUP BY 1, 2),
      w AS (SELECT CAST(SUM(CAST(region_rev AS DECIMAL(30,6))) AS DOUBLE)
              AS world_rev FROM br)
      SELECT bn.r_name AS region, n_name AS nation,
             round(rev, 6) AS nation_rev,
             round(region_rev, 6) AS region_rev,
             round(rev / region_rev, 9) AS share_of_region,
             round(region_rev / world_rev, 9) AS region_share_of_world
      FROM bn JOIN br ON bn.rk = br.rk CROSS JOIN w
      ORDER BY region, nation"""
  }

  // ---- q102: join-cardinality estimator audit ----
  // The CBO question before any fact-fact join: how big will the
  // l_partkey self-join be? Three answers side by side — the textbook
  // uniform estimate |A|²/ndv, the histogram estimate (exact top-20
  // hot keys + uniform tail — what a real optimizer's MCV list does),
  // and the EXACT size Σc(k)² — with relative errors. The table that
  // shows WHY hot-key lists matter: on skewed keys the uniform formula
  // undershoots by the skew factor while 20 MCVs close most of the
  // gap. Cost: ONE combinable per-key count (the q91 frame), a
  // TakeOrderedAndProject for the MCV list, decimal-exact Σc²; the
  // estimate is what makes the 100 TB join plannable without running
  // it.
  val q102_join_size_estimate: Q = (s, d) => {
    val cnts = Tables.lineitem(s, d)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = cnts.agg(sum("cnt").as("n"),
      count(lit(1)).as("ndv"),
      sum((col("cnt") * col("cnt")).cast("decimal(38,0)")).cast("long")
        .as("exact"))
    val mcv = cnts.orderBy(desc("cnt"), col("l_partkey")).limit(20)
      .agg(sum("cnt").as("top_n"),
        sum((col("cnt") * col("cnt")).cast("decimal(38,0)")).cast("long")
          .as("top_sq"))
    tot.crossJoin(broadcast(mcv))
      .withColumn("est_uniform", round(
        col("n").cast("double") * col("n").cast("double")
          / col("ndv").cast("double"), 3))
      .withColumn("tail_n", (col("n") - col("top_n")).cast("double"))
      .withColumn("est_topk", round(
        col("top_sq").cast("double")
          + col("tail_n") * col("tail_n")
            / greatest(col("ndv") - 20, lit(1)).cast("double"), 3))
      .select(explode(array(
        struct(lit("1_uniform").as("method"), col("est_uniform").as("est"),
          col("exact")),
        struct(lit("2_mcv20").as("method"), col("est_topk").as("est"),
          col("exact")),
        struct(lit("3_exact").as("method"),
          col("exact").cast("double").as("est"), col("exact")))).as("r"))
      .select(col("r.method"), col("r.est"), col("r.exact"),
        round((col("r.est") - col("r.exact").cast("double"))
          / col("r.exact").cast("double"), 9).as("rel_error"))
      .orderBy("method")
  }
  val q102Sql: String =
    """WITH c AS (SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
      tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, COUNT(*) AS ndv,
                CAST(SUM(CAST(cnt * cnt AS DECIMAL(38,0))) AS BIGINT) AS exact
              FROM c),
      mcv AS (SELECT CAST(SUM(cnt) AS BIGINT) AS top_n,
                CAST(SUM(CAST(cnt * cnt AS DECIMAL(38,0))) AS BIGINT) AS top_sq
              FROM (SELECT cnt FROM c ORDER BY cnt DESC, l_partkey LIMIT 20)),
      est AS (SELECT n, ndv, exact, top_n, top_sq,
                round(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      / CAST(ndv AS DOUBLE), 3) AS est_uniform,
                round(CAST(top_sq AS DOUBLE)
                      + CAST(n - top_n AS DOUBLE) * CAST(n - top_n AS DOUBLE)
                        / CAST(greatest(ndv - 20, 1) AS DOUBLE), 3) AS est_topk
              FROM tot CROSS JOIN mcv)
      SELECT method, est, exact,
             round((est - CAST(exact AS DOUBLE)) / CAST(exact AS DOUBLE), 9)
               AS rel_error
      FROM (
        SELECT '1_uniform' AS method, est_uniform AS est, exact FROM est
        UNION ALL SELECT '2_mcv20', est_topk, exact FROM est
        UNION ALL SELECT '3_exact', CAST(exact AS DOUBLE), exact FROM est)
      ORDER BY method"""

  // ---- q103: top-P% revenue coverage (who makes up the top decile?) ----
  // The BI verb between top-k and full ranking: per nation, the
  // smallest prefix of customers (by revenue) that covers ≥ 10% of the
  // nation's revenue — membership decided by "cumulative share BEFORE
  // this row < 10%", so the set is the minimal covering prefix and
  // engine-exact (cumulative sums are DECIMAL-exact over a
  // nation-PARTITIONED window ranking on exact decimal revenue with
  // custkey tie-break; one IEEE division per output row only).
  // Fact-scale work: one aggregate + one partitioned window.
  val q103_top_percent_cover: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nation"), col("c_custkey").as("cust"))
      .agg(sum(col("o_totalprice").cast(DecimalType(30, 6))).as("rev"))
    val tot = rev.groupBy("nation")
      .agg(sum("rev").as("nat_rev"), count(lit(1)).as("n_cust"))
    val w = Window.partitionBy("nation").orderBy(desc("rev"), col("cust"))
    rev
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_before",
        coalesce(sum("rev").over(
          w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0).cast(DecimalType(30, 6))))
      .join(tot, "nation")
      .filter(col("cum_before") * 10 < col("nat_rev"))
      .withColumn("cum_share", round(
        ((col("cum_before") + col("rev")).cast("double"))
          / col("nat_rev").cast("double"), 9))
      .select(col("nation"), col("rank"), col("cust"),
        col("rev").cast("double").as("revenue"), col("cum_share"),
        col("n_cust"))
      .orderBy("nation", "rank")
  }
  val q103Sql: String =
    """WITH rev AS (SELECT c_nationkey AS nation, c_custkey AS cust,
             SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS rev
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
      tot AS (SELECT nation, SUM(rev) AS nat_rev, COUNT(*) AS n_cust
              FROM rev GROUP BY 1),
      rk AS (SELECT nation, cust, rev,
               CAST(row_number() OVER w AS BIGINT) AS rank,
               COALESCE(SUM(rev) OVER (PARTITION BY nation
                 ORDER BY rev DESC, cust
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS cum_before
             FROM rev
             WINDOW w AS (PARTITION BY nation ORDER BY rev DESC, cust))
      SELECT nation, rank, cust, CAST(rev AS DOUBLE) AS revenue,
             round(CAST(cum_before + rev AS DOUBLE)
                   / CAST(nat_rev AS DOUBLE), 9) AS cum_share,
             n_cust
      FROM rk JOIN tot USING (nation)
      WHERE cum_before * 10 < nat_rev
      ORDER BY nation, rank"""

  // ---- q104: incremental JOIN-view maintenance (merge == recompute) ----
  // q92 proves delta maintenance for an AGGREGATE view; this proves it
  // for a JOIN view — the per-nation revenue rollup over orders⋈customer.
  // With a static dimension the general two-sided delta Δ(A⋈B) =
  // ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB collapses to ΔA⋈B (FK join, ΔB = ∅), so the
  // refresh is: aggregate ONLY the delta batch through the same join,
  // then merge partial aggregates (counts add, decimal sums add — both
  // associative). The output shows the incrementally-maintained view
  // and the full recompute side by side with a per-row match verdict —
  // the correctness contract an IVM engine must exhibit. At 100 TB the
  // win is the whole point: the refresh touches |Δ|, not |A|.
  val q104_join_view_delta: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    val bucket = conv(substring(md5(col("o_orderkey").cast("string")), 1, 2), 16, 10)
      .cast("int") % 10
    val orders = Tables.orders(s, d).withColumn("b", bucket)
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"))
    def agg(o: DataFrame): DataFrame = o
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nation"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(30, 6))).as("rev"))
    val baseView = agg(orders.filter(col("b") <= 7))
    val deltaView = agg(orders.filter(col("b") > 7))
    val incremental = baseView
      .select(col("nation"), col("n"), col("rev"))
      .unionAll(deltaView.select(col("nation"), col("n"), col("rev")))
      .groupBy("nation")
      .agg(sum("n").as("inc_n"), sum("rev").as("inc_rev"))
    val recompute = agg(orders)
      .select(col("nation"), col("n").as("rec_n"), col("rev").as("rec_rev"))
    incremental.join(recompute, Seq("nation"), "full_outer")
      .select(col("nation"),
        col("inc_n"), round(col("inc_rev").cast("double"), 6).as("inc_rev"),
        col("rec_n"), round(col("rec_rev").cast("double"), 6).as("rec_rev"))
      .withColumn("matches",
        col("inc_n") === col("rec_n") && col("inc_rev") === col("rec_rev"))
      .orderBy("nation")
  }
  val q104Sql: String =
    """WITH o AS (SELECT o_custkey, o_totalprice,
             ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2))::INT % 10 AS b
           FROM orders),
      base AS (SELECT c_nationkey AS nation, COUNT(*) AS n,
                 SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS rev
               FROM o JOIN customer ON o_custkey = c_custkey
               WHERE b <= 7 GROUP BY 1),
      delta AS (SELECT c_nationkey AS nation, COUNT(*) AS n,
                  SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS rev
                FROM o JOIN customer ON o_custkey = c_custkey
                WHERE b > 7 GROUP BY 1),
      inc AS (SELECT nation, CAST(SUM(n) AS BIGINT) AS inc_n,
                SUM(rev) AS inc_rev
              FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
              GROUP BY 1),
      rec AS (SELECT c_nationkey AS nation, COUNT(*) AS rec_n,
                SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS rec_rev
              FROM o JOIN customer ON o_custkey = c_custkey GROUP BY 1)
      SELECT nation, inc_n, round(CAST(inc_rev AS DOUBLE), 6) AS inc_rev,
             rec_n, round(CAST(rec_rev AS DOUBLE), 6) AS rec_rev,
             inc_n = rec_n
               AND round(CAST(inc_rev AS DOUBLE), 6)
                   = round(CAST(rec_rev AS DOUBLE), 6) AS matches
      FROM inc FULL OUTER JOIN rec USING (nation)
      ORDER BY nation"""

  // ---- q105: storage/join layout advisor ----
  // The two planning numbers every Spark job tunes by hand, computed
  // from the data instead of guessed: per table, an exact serialized
  // size estimate (string bytes measured, fixed-width columns at their
  // storage width) → is it under the 10 MB broadcast threshold, and
  // how many ~128 MB partitions should a shuffle write. One combinable
  // aggregate per table — the scan is metadata-cheap because only the
  // measured columns are read. (The inputs a real advisor feeds into
  // autoBroadcastJoinThreshold / shuffle.partitions.)
  val q105_layout_advisor: Q = (s, d) => {
    def row(df: DataFrame, name: String, bytesExpr: String): DataFrame = df
      .agg(count(lit(1)).as("n_rows"),
        sum(expr(bytesExpr).cast("decimal(38,0)")).cast("long").as("est_bytes"))
      .select(lit(name).as("table_name"), col("n_rows"), col("est_bytes"),
        (col("est_bytes") < 10L * 1024 * 1024).as("broadcastable"),
        greatest(lit(1L),
          ceil(col("est_bytes").cast("double") / (128.0 * 1024 * 1024))
            .cast("long")).as("n_partitions_128mb"))
    row(Tables.nation(s, d), "nation",
        "8 + length(n_name) + 8")
      .unionAll(row(Tables.customer(s, d), "customer",
        "8 + length(c_name) + 8 + 8 + length(c_mktsegment)"))
      .unionAll(row(Tables.orders(s, d), "orders",
        "8 + 8 + length(o_orderstatus) + 8 + 4 + length(o_orderpriority)"))
      .unionAll(row(Tables.lineitem(s, d), "lineitem",
        "8 * 7 + 4 + length(l_returnflag) + length(l_linestatus) + 4"))
      .unionAll(row(Tables.documents(s, d), "documents",
        "8 + length(text) + length(lang) + length(source) + 8"))
      .orderBy("table_name")
  }
  val q105Sql: String = {
    def rowSql(table: String, bytesExpr: String): String =
      s"""SELECT '$table' AS table_name, COUNT(*) AS n_rows,
            CAST(SUM(CAST($bytesExpr AS DECIMAL(38,0))) AS BIGINT) AS est_bytes,
            CAST(SUM(CAST($bytesExpr AS DECIMAL(38,0))) AS BIGINT)
              < 10 * 1024 * 1024 AS broadcastable,
            greatest(1, CAST(ceil(CAST(SUM(CAST($bytesExpr AS DECIMAL(38,0)))
              AS DOUBLE) / (128.0 * 1024 * 1024)) AS BIGINT))
              AS n_partitions_128mb
          FROM $table"""
    Seq(
      rowSql("nation", "8 + length(n_name) + 8"),
      rowSql("customer", "8 + length(c_name) + 8 + 8 + length(c_mktsegment)"),
      rowSql("orders",
        "8 + 8 + length(o_orderstatus) + 8 + 4 + length(o_orderpriority)"),
      rowSql("lineitem",
        "8 * 7 + 4 + length(l_returnflag) + length(l_linestatus) + 4"),
      rowSql("documents",
        "8 + length(text) + length(lang) + length(source) + 8"))
      .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY table_name")
  }

  val queries: Map[String, Q] = Map(
    "q105_layout_advisor"     -> q105_layout_advisor,
    "q104_join_view_delta"    -> q104_join_view_delta,
    "q103_top_percent_cover"  -> q103_top_percent_cover,
    "q102_join_size_estimate" -> q102_join_size_estimate,
    "q97_calendar_dim"    -> q97_calendar_dim,
    "q101_hierarchy_share" -> q101_hierarchy_share,
    "q99_group_concentration" -> q99_group_concentration,
    "q91_skew_audit"      -> q91_skew_audit,
    "q92_view_refresh"    -> q92_view_refresh,
    "q93_scd_lookup"      -> q93_scd_lookup,
    "q94_mix_shift"       -> q94_mix_shift,
    "q95_equi_depth_hist" -> q95_equi_depth_hist,
    "q96_top_movers"      -> q96_top_movers,
  )
  val oracles: Map[String, String] = Map(
    "q105_layout_advisor"     -> q105Sql,
    "q104_join_view_delta"    -> q104Sql,
    "q103_top_percent_cover"  -> q103Sql,
    "q102_join_size_estimate" -> q102Sql,
    "q97_calendar_dim"    -> q97Sql,
    "q101_hierarchy_share" -> q101Sql,
    "q99_group_concentration" -> q99Sql,
    "q91_skew_audit"      -> q91Sql,
    "q92_view_refresh"    -> q92Sql,
    "q93_scd_lookup"      -> q93Sql,
    "q94_mix_shift"       -> q94Sql,
    "q95_equi_depth_hist" -> q95Sql,
    "q96_top_movers"      -> q96Sql,
  )
}
