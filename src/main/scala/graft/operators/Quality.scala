package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Stable, Tables}

/** Data-quality validation and change-detection — the ETL-framework
  * staples (expectation checks, snapshot diffs) expressed as single
  * aggregation / join plans.
  */
object Quality {
  type Q = (SparkSession, String) => DataFrame

  // ---- v01: rule-based data-quality report ----
  // Each rule is one conditional aggregate over a single scan — the whole
  // report is one pass per table regardless of rule count.
  val v01_data_quality: Q = (s, d) => {
    val li = Tables.lineitem(s, d).agg(
      count(lit(1)).as("n_rows"),
      expr("count_if(l_quantity IS NULL)").cast("long").as("null_qty"),
      expr("count_if(l_quantity < 1.0 OR l_quantity > 50.0)").cast("long").as("qty_out_of_range"),
      expr("count_if(l_discount < 0.0 OR l_discount > 0.1)").cast("long").as("disc_out_of_range"),
      expr("count_if(l_extendedprice <= 0.0)").cast("long").as("nonpositive_price"))
      .withColumn("table_name", lit("lineitem"))
    val ord = Tables.orders(s, d).agg(
      count(lit(1)).as("n_rows"),
      expr("count_if(o_custkey IS NULL)").cast("long").as("null_qty"),
      expr("count_if(o_totalprice <= 0.0)").cast("long").as("qty_out_of_range"),
      expr("count_if(o_orderdate < TIMESTAMP '1990-01-01')").cast("long").as("disc_out_of_range"),
      expr("CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)").as("nonpositive_price"))
      .withColumn("table_name", lit("orders"))
    li.unionByName(ord)
      .select("table_name", "n_rows", "null_qty", "qty_out_of_range",
        "disc_out_of_range", "nonpositive_price")
      .orderBy("table_name")
  }
  val v01Sql: String =
    """SELECT * FROM (
        SELECT 'lineitem' AS table_name, COUNT(*) AS n_rows,
          CAST(count_if(l_quantity IS NULL) AS BIGINT) AS null_qty,
          CAST(count_if(l_quantity < 1.0 OR l_quantity > 50.0) AS BIGINT) AS qty_out_of_range,
          CAST(count_if(l_discount < 0.0 OR l_discount > 0.1) AS BIGINT) AS disc_out_of_range,
          CAST(count_if(l_extendedprice <= 0.0) AS BIGINT) AS nonpositive_price
        FROM lineitem
        UNION ALL
        SELECT 'orders', COUNT(*),
          CAST(count_if(o_custkey IS NULL) AS BIGINT),
          CAST(count_if(o_totalprice <= 0.0) AS BIGINT),
          CAST(count_if(o_orderdate < TIMESTAMP '1990-01-01') AS BIGINT),
          CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
        FROM orders) t
      ORDER BY table_name"""

  // ---- q54: snapshot diff (change-data detection) ----
  // "Old" = orders before the cutoff, "new" = a simulated next snapshot
  // (same rows with some prices changed + late rows added). Full outer
  // join on the key classifies inserted / deleted / changed / unchanged —
  // the standard CDC-by-comparison pattern when the source has no log.
  val q54_snapshot_diff: Q = (s, d) => {
    val ord = Tables.orders(s, d)
    val old = ord.filter(col("o_orderkey") % 10 < 8)
      .select(col("o_orderkey").as("k_old"), col("o_totalprice").as("price_old"))
    val neu = ord.filter(col("o_orderkey") % 10 > 1)
      .select(col("o_orderkey").as("k_new"),
        when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 1.1)
          .otherwise(col("o_totalprice")).as("price_new"))
    old.join(neu, col("k_old") === col("k_new"), "full_outer")
      .withColumn("change_type",
        when(col("k_old").isNull, "inserted")
          .when(col("k_new").isNull, "deleted")
          .when(col("price_old") =!= col("price_new"), "changed")
          .otherwise("unchanged"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("change_type")
  }
  val q54Sql: String =
    """WITH old AS (SELECT o_orderkey AS k_old, o_totalprice AS price_old
                  FROM orders WHERE o_orderkey % 10 < 8),
      neu AS (SELECT o_orderkey AS k_new,
                CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
                     ELSE o_totalprice END AS price_new
              FROM orders WHERE o_orderkey % 10 > 1)
      SELECT CASE WHEN k_old IS NULL THEN 'inserted'
                  WHEN k_new IS NULL THEN 'deleted'
                  WHEN price_old <> price_new THEN 'changed'
                  ELSE 'unchanged' END AS change_type,
             COUNT(*) AS n
      FROM old FULL OUTER JOIN neu ON k_old = k_new
      GROUP BY 1 ORDER BY change_type"""

  // ---- v02: declarative expectation suite via graft.api.Expectations ----
  // The library's validation verb exercised as an oracle query: four
  // rules (null / range / regex / uniqueness) compile into ONE wide
  // aggregate over ONE scan, then unpivot to the per-rule report — rule
  // count is free at any scale, only the scan costs.
  val v02_expectations: Q = (s, d) => {
    import graft.api.Expectations._
    evaluate(Tables.orders(s, d), Seq(
      NotNull("o_custkey"),
      InRange("o_totalprice", 0.0, 600000.0),
      Matches("o_orderpriority", "^[1-5]-"),
      Unique(Seq("o_orderkey"))))
      .orderBy("rule")
  }
  val v02Sql: String =
    """WITH w AS (SELECT COUNT(*) AS n,
        CAST(count_if(o_custkey IS NULL) AS BIGINT) AS v0,
        CAST(count_if(o_totalprice IS NOT NULL
              AND (o_totalprice < 0.0 OR o_totalprice > 600000.0)) AS BIGINT) AS v1,
        CAST(count_if(o_orderpriority IS NOT NULL
              AND NOT regexp_matches(o_orderpriority, '^[1-5]-')) AS BIGINT) AS v2,
        CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v3
      FROM orders)
      SELECT * FROM (
        SELECT 'not_null(o_custkey)' AS rule, n AS n_rows, v0 AS violations, v0 = 0 AS pass FROM w
        UNION ALL
        SELECT 'in_range(o_totalprice,0.0,600000.0)', n, v1, v1 = 0 FROM w
        UNION ALL
        SELECT 'matches(o_orderpriority)', n, v2, v2 = 0 FROM w
        UNION ALL
        SELECT 'unique(o_orderkey)', n, v3, v3 = 0 FROM w) t
      ORDER BY rule"""

  // ---- v03: referential-integrity audit ----
  // FK orphan counts across the star schema, one row per relationship.
  // Plan: ONE pass per fact table — every FK of that table left-joins
  // its (broadcast, distinct) referenced key set in the same stage, and
  // a single aggregate counts rows plus null-match violations for all of
  // them, unpivoted to one row per relationship. The fact side streams
  // exactly once no matter how many FKs it carries (lineitem: 3 checks,
  // 1 scan), dimension key sets ship to executors, no fact shuffle.
  // events.user_id -> customer is an intentionally-violated relation so
  // the report exercises its non-zero path.
  val v03_ref_integrity: Q = (s, d) => {
    /** One scan of `fact` covering all `(name, fk, dimKeys)` checks.
      * `dimKeys` must be a key column (unique) — true for the referenced
      * PKs here, and audited independently by v01's uniqueness rule —
      * so the left joins cannot multiply fact rows and the dim sides
      * broadcast raw, with no pre-broadcast Deduplicate exchange.
      */
    def checkAll(fact: DataFrame, checks: Seq[(String, String, DataFrame)]): DataFrame = {
      val joined = checks.zipWithIndex.foldLeft(fact) {
        case (df, ((_, fk, dimKeys), i)) =>
          val k = s"__pk$i"
          df.join(broadcast(dimKeys.toDF(k)), col(fk) === col(k), "left")
      }
      val aggs = count(lit(1)).as("n_rows") +:
        checks.indices.map(i =>
          count(when(col(s"__pk$i").isNull, 1)).as(s"__v$i"))
      val wide = joined.agg(aggs.head, aggs.tail: _*)
      val stack = checks.zipWithIndex
        .map { case ((name, _, _), i) => s"'${name}', __v$i" }
        .mkString(", ")
      wide.select(expr(
        s"stack(${checks.size}, $stack) AS (fk, n_orphans)"), col("n_rows"))
        .select("fk", "n_rows", "n_orphans")
    }
    val customerKeys = Tables.customer(s, d).select("c_custkey")
    Seq(
      checkAll(Tables.events(s, d), Seq(
        ("events.user_id->customer", "user_id", customerKeys))),
      checkAll(Tables.lineitem(s, d), Seq(
        ("lineitem.l_orderkey->orders", "l_orderkey",
          Tables.orders(s, d).select("o_orderkey")),
        ("lineitem.l_partkey->part", "l_partkey",
          Tables.part(s, d).select("p_partkey")),
        ("lineitem.l_suppkey->supplier", "l_suppkey",
          Tables.supplier(s, d).select("s_suppkey")))),
      checkAll(Tables.nation(s, d), Seq(
        ("nation.n_regionkey->region", "n_regionkey",
          Tables.region(s, d).select("r_regionkey")))),
      checkAll(Tables.orders(s, d), Seq(
        ("orders.o_custkey->customer", "o_custkey", customerKeys)))
    ).reduce(_.unionByName(_)).orderBy("fk")
  }
  val v03Sql: String =
    """SELECT * FROM (
        SELECT 'events.user_id->customer' AS fk,
               (SELECT COUNT(*) FROM events) AS n_rows,
               (SELECT COUNT(*) FROM events e WHERE NOT EXISTS
                 (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS n_orphans
        UNION ALL
        SELECT 'lineitem.l_orderkey->orders',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
                 (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'lineitem.l_partkey->part',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
                 (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
                 (SELECT 1 FROM supplier su WHERE su.s_suppkey = l.l_suppkey))
        UNION ALL
        SELECT 'nation.n_regionkey->region',
               (SELECT COUNT(*) FROM nation),
               (SELECT COUNT(*) FROM nation n WHERE NOT EXISTS
                 (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
        UNION ALL
        SELECT 'orders.o_custkey->customer',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
                 (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      ) t ORDER BY fk"""

  // ---- v04: population-stability drift (PSI) ----
  // The model-monitoring staple: distribution shift of `value` between
  // the first and second half of the event stream (median-ts split),
  // per event type. Equi-width bins from the global min/max (broadcast),
  // PSI = sum((p2 - p1) * ln(p2 / p1)) over bins with both sides
  // populated. Two counting passes over one scan shape, engine-exact
  // counts; the only doubles are the final closed form (rounded 1e-9).
  val v04_psi_drift: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val split = ev.agg(expr("percentile(unix_micros(ts), 0.5D)").as("mid"))
    val range = ev.agg(min("value").as("vmin"), max("value").as("vmax"))
    val binned = ev.join(broadcast(split)).join(broadcast(range))
      .withColumn("half",
        when(unix_micros(col("ts")) <= col("mid"), "a").otherwise("b"))
      .withColumn("bin",
        least(lit(9), floor((col("value") - col("vmin"))
          / ((col("vmax") - col("vmin")) / 10.0)).cast("int")).cast("long"))
    val counts = binned.groupBy("event_type", "bin")
      .agg(count(when(col("half") === "a", 1)).as("na"),
        count(when(col("half") === "b", 1)).as("nb"))
    val totals = counts.groupBy("event_type")
      .agg(sum("na").as("ta"), sum("nb").as("tb"))
    counts.join(totals, "event_type")
      .filter(col("na") > 0 && col("nb") > 0)
      .withColumn("term",
        (col("nb").cast("double") / col("tb") - col("na").cast("double") / col("ta"))
          * log((col("nb").cast("double") / col("tb"))
            / (col("na").cast("double") / col("ta"))))
      .groupBy("event_type")
      // terms are ~1e-6..1e-3, so they are scaled by 1e6 before the
      // decimal(30,6) stable sum (keeps 1e-12 granularity) and scaled
      // back after — order-independent and exact on both engines.
      .agg(count(lit(1)).as("n_bins"),
        round(Stable.dsum(round(col("term"), 12) * lit(1000000.0)) / lit(1000000.0), 9)
          .as("psi"))
      .orderBy("event_type")
  }
  val v04Sql: String =
    """WITH sp AS (SELECT quantile_cont(epoch_us(ts), 0.5) AS mid FROM events),
      rg AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events),
      b AS (SELECT event_type,
              CASE WHEN epoch_us(ts) <= mid THEN 'a' ELSE 'b' END AS half,
              CAST(least(9, CAST(floor((value - vmin)
                / ((vmax - vmin) / 10.0)) AS INT)) AS BIGINT) AS bin
            FROM events CROSS JOIN sp CROSS JOIN rg),
      c AS (SELECT event_type, bin,
              COUNT(*) FILTER (WHERE half = 'a') AS na,
              COUNT(*) FILTER (WHERE half = 'b') AS nb
            FROM b GROUP BY 1, 2),
      t AS (SELECT event_type, CAST(SUM(na) AS BIGINT) AS ta,
                   CAST(SUM(nb) AS BIGINT) AS tb
            FROM c GROUP BY 1),
      terms AS (SELECT c.event_type,
              round((CAST(nb AS DOUBLE) / tb - CAST(na AS DOUBLE) / ta)
                * ln((CAST(nb AS DOUBLE) / tb) / (CAST(na AS DOUBLE) / ta)), 12)
                AS term
            FROM c JOIN t ON c.event_type = t.event_type
            WHERE na > 0 AND nb > 0)
      SELECT event_type, COUNT(*) AS n_bins,
             round(CAST(SUM(CAST(term * CAST(1000000 AS DOUBLE) AS DECIMAL(30,6)))
                        AS DOUBLE) / CAST(1000000 AS DOUBLE), 9) AS psi
      FROM terms GROUP BY event_type ORDER BY event_type"""

  // ---- v05: dataset profile (describe() as one pass) ----
  // The profiling staple every ETL framework ships: per-column count /
  // nulls / min / max / mean over the numeric columns — computed as ONE
  // wide aggregate over ONE scan (never a job per column, the naive
  // describe() trap at 100 TB), then unpivoted to a row per column.
  // Means go through the decimal-stable sum so the report is engine-
  // exact; all profiled columns here are non-null in the dataset, and
  // n_null comes from count(*) - count(col) like SQL.
  val v05_profile: Q = (s, d) => {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = Tables.lineitem(s, d)
    val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"),
        round(Stable.davg(col(c)), 9).as(s"mean_$c"))
    }
    val wide = li.agg(aggs.head, aggs.tail: _*)
    val stack = cols.map(c =>
      s"'$c', cnt_$c, min_$c, max_$c, mean_$c").mkString(", ")
    wide.select(col("n"), expr(
        s"stack(${cols.size}, $stack) AS (column_name, n_filled, min_v, max_v, mean_v)"))
      .select(col("column_name"), col("n").as("n_rows"),
        (col("n") - col("n_filled")).as("n_null"),
        col("min_v"), col("max_v"), col("mean_v"))
      .orderBy("column_name")
  }
  val v05Sql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
           CAST(MIN($c) AS DOUBLE) AS min_v, CAST(MAX($c) AS DOUBLE) AS max_v,
           round(${Stable.sqlAvg(c)}, 9) AS mean_v FROM lineitem"""
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(one).mkString("SELECT * FROM (", " UNION ALL ", ") t ORDER BY column_name")
  }

  // ---- v06: correlation matrix (feature-engineering audit) ----
  // Pairwise Pearson correlation across the numeric columns as ONE
  // aggregate pass: per-column exact decimal sums + per-pair exact
  // decimal cross-moments (q31's recipe: cast FACTORS to DECIMAL(18,6)
  // before multiplying — the decimal product is exact where casting the
  // double product is not), closed form in double, rounded 1e-9 to
  // absorb cross-engine FMA. n(n-1)/2 extra aggregates, zero extra
  // scans — df.corr() per pair would be a scan per pair.
  val v06_corr_matrix: Q = (s, d) => {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val D = org.apache.spark.sql.types.DecimalType(18, 6)
    def dc(c: String) = col(c).cast(D)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = count(lit(1)).as("n") +:
      (cols.flatMap(c => Seq(
        sum(dc(c)).cast("double").as(s"s_$c"),
        sum(dc(c) * dc(c)).cast("double").as(s"ss_$c"))) ++
        pairs.map { case (a, b) =>
          sum(dc(a) * dc(b)).cast("double").as(s"sp_${a}_$b") })
    // gated spread (GraftOps.spreadNarrowScan): the 15-decimal-moment
    // partial aggregate ran on the 3 row groups of the local lineitem
    // file (StageProfile: one 2.3 s 3-task stage = the whole query);
    // spreading the scan makes it 32-task, and a production many-file
    // scan pays no exchange
    val wide = graft.api.GraftOps.spreadNarrowScan(Tables.lineitem(s, d))
      .agg(aggs.head, aggs.tail: _*)
    val stack = pairs.map { case (a, b) =>
      s"'$a', '$b', sp_${a}_$b, s_$a, ss_$a, s_$b, ss_$b"
    }.mkString(", ")
    wide.select(col("n"), expr(
        s"stack(${pairs.size}, $stack) AS (col_a, col_b, sxy, sx, sxx, sy, syy)"))
      .select(col("col_a"), col("col_b"),
        round((col("sxy") - col("sx") * col("sy") / col("n"))
          / (sqrt(col("sxx") - col("sx") * col("sx") / col("n"))
            * sqrt(col("syy") - col("sy") * col("sy") / col("n"))), 9).as("corr"))
      .orderBy("col_a", "col_b")
  }
  val v06Sql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val moments = (cols.flatMap(c => Seq(
      s"CAST(SUM(d_$c) AS DOUBLE) AS s_$c",
      s"CAST(SUM(d_$c * d_$c) AS DOUBLE) AS ss_$c")) ++
      (for { i <- cols.indices; j <- cols.indices if i < j }
        yield s"CAST(SUM(d_${cols(i)} * d_${cols(j)}) AS DOUBLE) AS sp_${cols(i)}_${cols(j)}"))
      .mkString(", ")
    val casts = cols.map(c => s"CAST($c AS DECIMAL(19,6)) AS d_$c").mkString(", ")
    val rows = (for { i <- cols.indices; j <- cols.indices if i < j } yield {
      val (a, b) = (cols(i), cols(j))
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         round((sp_${a}_$b - s_$a*s_$b/n)
           / (sqrt(ss_$a - s_$a*s_$a/n) * sqrt(ss_$b - s_$b*s_$b/n)), 9) AS corr
         FROM m"""
    }).mkString(" UNION ALL ")
    s"""WITH m AS (SELECT COUNT(*) AS n, $moments
        FROM (SELECT $casts FROM lineitem) r)
      SELECT * FROM ($rows) t ORDER BY col_a, col_b"""
  }

  // ---- v07: feed-freshness / latency audit ----
  // The pipeline-monitoring staple: per event feed, last-seen time, lag
  // behind the freshest feed, and a staleness flag against a 24h SLA.
  // One partial-agg pass over the fact table (max/count decompose);
  // the corpus watermark is a 1-row broadcast off the feed-count-sized
  // rollup (persisted — both branches read the cache), never a second
  // fact scan and never an unpartitioned window. Lag is an exact
  // integer microsecond difference; the hour conversion is one IEEE
  // division.
  val v07_freshness: Q = (s, d) => {
    val feeds = Tables.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), max("ts").as("last_ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    feeds
      .crossJoin(broadcast(feeds.agg(max("last_ts").as("watermark"))))
      .select(col("event_type"), col("n_events"), col("last_ts"),
        ((unix_micros(col("watermark")) - unix_micros(col("last_ts")))
          .cast("double") / lit(3600000000.0)).as("lag_hours"))
      .withColumn("stale", col("lag_hours") > 24.0)
      .orderBy("event_type")
  }
  val v07Sql: String =
    """WITH f AS (SELECT event_type, COUNT(*) AS n_events, max(ts) AS last_ts
           FROM events GROUP BY event_type),
      w AS (SELECT *, max(last_ts) OVER () AS watermark FROM f)
      SELECT event_type, n_events, last_ts,
             CAST(epoch_us(watermark) - epoch_us(last_ts) AS DOUBLE)
               / 3600000000.0 AS lag_hours,
             (CAST(epoch_us(watermark) - epoch_us(last_ts) AS DOUBLE)
               / 3600000000.0) > 24.0 AS stale
      FROM w ORDER BY event_type"""

  val queries: Map[String, Q] = Map(
    "v07_freshness"     -> v07_freshness,
    "v06_corr_matrix"   -> v06_corr_matrix,
    "v05_profile"       -> v05_profile,
    "v01_data_quality"  -> v01_data_quality,
    "v02_expectations"  -> v02_expectations,
    "v03_ref_integrity" -> v03_ref_integrity,
    "v04_psi_drift"     -> v04_psi_drift,
    "q54_snapshot_diff" -> q54_snapshot_diff,
  )
  val oracles: Map[String, String] = Map(
    "v07_freshness"     -> v07Sql,
    "v06_corr_matrix"   -> v06Sql,
    "v05_profile"       -> v05Sql,
    "v01_data_quality"  -> v01Sql,
    "v02_expectations"  -> v02Sql,
    "v03_ref_integrity" -> v03Sql,
    "v04_psi_drift"     -> v04Sql,
    "q54_snapshot_diff" -> q54Sql,
  )
}
