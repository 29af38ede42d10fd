package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import org.apache.spark.sql.types.DecimalType
import graft.Stable.{dsum, sqlSum}

/** Data-quality family, part 3: statistical audits. */
object Quality3 {
  type Q = (SparkSession, String) => DataFrame

  // ---- v15: chi-square independence audit ----
  // "Does event mix depend on weekday?" — the χ² contingency test, the
  // statistical backbone of segment-drift alarms. One combinable
  // (type, dow) observed-count aggregate (35 cells at any fact scale);
  // row/column totals re-aggregate from the CELLS, not the facts; each
  // cell's term (o − e)²/e is a fixed IEEE sequence on exact-int-
  // derived doubles and the statistic sums them through dsum. Output
  // one row: N, degrees of freedom, χ², and Cramér's V — all exact
  // ints plus deterministic scalar math (one sqrt).
  val v15_chi_square: Q = (s, d) => {
    val cells = Tables.events(s, d)
      .groupBy(col("event_type").as("t"),
        (dayofweek(to_date(col("ts"))) - 1).as("dow"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy("t").agg(sum("o").as("rt"))
    val cols = cells.groupBy("dow").agg(sum("o").as("ct"))
    val n = cells.agg(sum("o").as("n"),
      count_distinct(col("t")).as("nr"),
      count_distinct(col("dow")).as("nc"))
    cells.join(broadcast(rows), "t").join(broadcast(cols), "dow")
      .crossJoin(broadcast(n))
      .withColumn("e",
        (col("rt") * col("ct")).cast("double") / col("n").cast("double"))
      .withColumn("term",
        (col("o").cast("double") - col("e")) * (col("o").cast("double") - col("e"))
          / col("e"))
      .groupBy("n", "nr", "nc")
      .agg(round(dsum(col("term")), 6).as("chi2"))
      .select(col("n"), ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        col("chi2"),
        round(sqrt(col("chi2")
          / (col("n") * least(col("nr") - 1, col("nc") - 1)).cast("double")), 9)
          .as("cramers_v"))
  }
  val v15Sql: String =
    s"""WITH cells AS (SELECT event_type AS t, dayofweek(CAST(ts AS DATE)) AS dow,
                    COUNT(*) AS o
             FROM events GROUP BY 1, 2),
      r AS (SELECT t, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
      c AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
      n AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT t) AS BIGINT) AS nr,
                   CAST(COUNT(DISTINCT dow) AS BIGINT) AS nc FROM cells),
      term AS (SELECT n, nr, nc,
                 (CAST(o AS DOUBLE)
                    - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(o AS DOUBLE)
                    - CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) AS term
               FROM cells JOIN r USING (t) JOIN c USING (dow) CROSS JOIN n),
      m AS (SELECT n, nr, nc, round(${sqlSum("term")}, 6) AS chi2
            FROM term GROUP BY 1, 2, 3)
      SELECT n, (nr - 1) * (nc - 1) AS dof, chi2,
             round(sqrt(chi2 / CAST(n * least(nr - 1, nc - 1) AS DOUBLE)), 9)
               AS cramers_v
      FROM m"""

  // ---- v16: assignment-order audit (id vs event-time monotonicity) ----
  // Ingest sanity: are event ids assigned in time order? Per day, walk
  // events in ID order (ONE day-partitioned lag window) and count
  // adjacent inversions (previous event's timestamp strictly later).
  // The signal every dedup/sessionize job implicitly trusts ("ids are
  // roughly arrival order") — measured instead of assumed. Exact
  // integer-microsecond comparisons; rate is one IEEE division.
  val v16_order_audit: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("day").orderBy("event_id")
    Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .groupBy("day")
      .agg(count(lit(1)).as("n_events"),
        count(when(col("prev_us") > col("us"), 1)).as("n_inversions"))
      .withColumn("inversion_rate",
        round(col("n_inversions").cast("double")
          / (col("n_events") - 1).cast("double"), 9))
      .orderBy("day")
  }
  val v16Sql: String =
    """WITH g AS (SELECT CAST(ts AS DATE) AS day, event_id, epoch_us(ts) AS us,
                lag(epoch_us(ts)) OVER (PARTITION BY CAST(ts AS DATE)
                                        ORDER BY event_id) AS prev_us
         FROM events)
      SELECT day, COUNT(*) AS n_events,
             COUNT(*) FILTER (WHERE prev_us > us) AS n_inversions,
             round(CAST(COUNT(*) FILTER (WHERE prev_us > us) AS DOUBLE)
                   / CAST(COUNT(*) - 1 AS DOUBLE), 9) AS inversion_rate
      FROM g GROUP BY 1 ORDER BY day"""

  // ---- v17: cross-table value reconciliation (header vs lines) ----
  // The oldest integrity bug in commerce data: does the order header's
  // total agree with the sum of its lines? Per order, ratio =
  // o_totalprice / Σ(l_extendedprice); the report buckets orders by
  // ratio band (exact-match near 1.0 within ±2%, under, over,
  // line-less) and carries DECIMAL-exact magnitude sums — the triage
  // table a feed owner reads to decide whether the header or the lines
  // lie. ONE fact-scale line aggregate + one header join (both sides
  // key-partitioned on orderkey); band tests are fixed IEEE compares
  // on identically derived doubles; every count exact.
  val v17_value_reconcile: Q = (s, d) => {
    val lines = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("k"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(30, 6)))
        .cast("double").as("line_sum"))
    Tables.orders(s, d).select(col("o_orderkey").as("k"), col("o_totalprice"))
      .join(lines, Seq("k"), "left")
      .withColumn("band",
        when(col("line_sum").isNull, lit("no_lines"))
          .when(col("o_totalprice") >= col("line_sum") * 0.98
            && col("o_totalprice") <= col("line_sum") * 1.02, lit("ok_2pct"))
          .when(col("o_totalprice") < col("line_sum") * 0.98, lit("under"))
          .otherwise(lit("over")))
      .groupBy("band")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast(DecimalType(30, 6)))
          .cast("double"), 6).as("header_total"),
        round(coalesce(sum(col("line_sum").cast(DecimalType(30, 6)))
          .cast("double"), lit(0.0)), 6).as("line_total"))
      .orderBy("band")
  }
  val v17Sql: String =
    """WITH l AS (SELECT l_orderkey AS k,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
                  AS line_sum
         FROM lineitem GROUP BY 1),
      j AS (SELECT o.o_totalprice, l.line_sum,
              CASE WHEN line_sum IS NULL THEN 'no_lines'
                   WHEN o_totalprice >= line_sum * 0.98
                        AND o_totalprice <= line_sum * 1.02 THEN 'ok_2pct'
                   WHEN o_totalprice < line_sum * 0.98 THEN 'under'
                   ELSE 'over' END AS band
            FROM orders o LEFT JOIN l ON o.o_orderkey = l.k)
      SELECT band, COUNT(*) AS n_orders,
             round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 6)
               AS header_total,
             round(COALESCE(CAST(SUM(CAST(line_sum AS DECIMAL(30,6)))
               AS DOUBLE), 0.0), 6) AS line_total
      FROM j GROUP BY 1 ORDER BY band"""

  // ---- v18: hash-sample representativeness check ----
  // Every 1-in-k hash sample (q26's discipline) implicitly claims the
  // sample looks like the population. This measures it on the event-
  // type marginal: per type, population share vs 1-in-16 sample share
  // (md5-prefix membership — the q26 engine-shared sampling family),
  // the delta, and the worst absolute delta as a one-glance verdict
  // column. ONE conditional aggregate computes both marginals in a
  // single scan (the sample predicate is a row expression); exact
  // counts, single divisions, max-delta via a broadcast scalar.
  val v18_sample_check: Q = (s, d) => {
    val flagged = Tables.events(s, d)
      .withColumn("in_sample",
        substring(md5(col("event_id").cast("string")), 1, 1) === "0")
    val cells = flagged.groupBy("event_type")
      .agg(count(lit(1)).as("n_pop"),
        count(when(col("in_sample"), 1)).as("n_samp"))
    val tot = cells.agg(sum("n_pop").as("t_pop"), sum("n_samp").as("t_samp"))
    val shares = cells.crossJoin(broadcast(tot))
      .withColumn("pop_share",
        col("n_pop").cast("double") / col("t_pop").cast("double"))
      .withColumn("samp_share",
        col("n_samp").cast("double") / col("t_samp").cast("double"))
      .withColumn("delta", col("samp_share") - col("pop_share"))
    val worst = shares.agg(max(abs(col("delta"))).as("max_abs_delta"))
    shares.crossJoin(broadcast(worst))
      .select(col("event_type"), col("n_pop"), col("n_samp"),
        round(col("pop_share"), 9).as("pop_share"),
        round(col("samp_share"), 9).as("samp_share"),
        round(col("delta"), 9).as("delta"),
        round(col("max_abs_delta"), 9).as("max_abs_delta"))
      .orderBy("event_type")
  }
  val v18Sql: String =
    """WITH f AS (SELECT event_type,
                CASE WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0'
                     THEN 1 ELSE 0 END AS ins
         FROM events),
      c AS (SELECT event_type, COUNT(*) AS n_pop,
              CAST(SUM(ins) AS BIGINT) AS n_samp
            FROM f GROUP BY 1),
      t AS (SELECT CAST(SUM(n_pop) AS BIGINT) AS t_pop,
                   CAST(SUM(n_samp) AS BIGINT) AS t_samp FROM c),
      sh AS (SELECT event_type, n_pop, n_samp,
               CAST(n_pop AS DOUBLE) / CAST(t_pop AS DOUBLE) AS pop_share,
               CAST(n_samp AS DOUBLE) / CAST(t_samp AS DOUBLE) AS samp_share
             FROM c CROSS JOIN t),
      w AS (SELECT MAX(abs(samp_share - pop_share)) AS max_abs_delta FROM sh)
      SELECT event_type, n_pop, n_samp,
             round(pop_share, 9) AS pop_share,
             round(samp_share, 9) AS samp_share,
             round(samp_share - pop_share, 9) AS delta,
             round(max_abs_delta, 9) AS max_abs_delta
      FROM sh CROSS JOIN w ORDER BY event_type"""

  // ---- v19: functional-dependency audit ----
  // Does column A determine column B? The data-contract question behind
  // every "safe to denormalize / safe to use as a join key" decision.
  // For each declared candidate (table, det → dep): number of distinct
  // determinant values, how many of them map to >1 distinct dependent
  // (violations), the worst fan-out, and the verdict. Each candidate is
  // ONE groupBy on the determinant (map-side combinable count-distinct
  // per group, then a one-row rollup) — no pair joins, no collects; the
  // result set is candidate-count-sized. At 100 TB each audit costs one
  // keyed shuffle of (det, dep) pairs — the minimum any exact FD check
  // can pay.
  // the library verb (GraftOps.fdAudit) IS the implementation — the
  // oracle gate below certifies the facade itself
  private def fdCase(df: DataFrame, name: String, det: String, dep: String): DataFrame =
    graft.api.GraftOps.fdAudit(df, col(det), col(dep), name)
  val v19_fd_audit: Q = (s, d) => {
    val cases = Seq(
      (Tables.nation(s, d),   "nation.n_nationkey->n_regionkey", "n_nationkey", "n_regionkey"),
      (Tables.part(s, d),     "part.p_brand->p_type",            "p_brand",     "p_type"),
      (Tables.customer(s, d), "customer.c_name->c_mktsegment",   "c_name",      "c_mktsegment"),
      (Tables.orders(s, d),   "orders.o_custkey->o_orderpriority", "o_custkey", "o_orderpriority"),
      (Tables.lineitem(s, d), "lineitem.l_partkey->l_suppkey",   "l_partkey",   "l_suppkey"))
    cases.map { case (df, n, a, b) => fdCase(df, n, a, b) }
      .reduce(_.unionAll(_)).orderBy("candidate")
  }
  private def fdSqlCase(table: String, name: String, det: String, dep: String): String =
    s"""SELECT '$name' AS candidate, COUNT(*) AS n_det,
          COUNT(*) FILTER (WHERE n_dep > 1) AS n_violating,
          MAX(n_dep) AS max_fanout,
          COUNT(*) FILTER (WHERE n_dep > 1) = 0 AS holds
        FROM (SELECT CAST($det AS VARCHAR) AS det,
                CAST(COUNT(DISTINCT CAST($dep AS VARCHAR)) AS BIGINT) AS n_dep
              FROM $table GROUP BY 1)"""
  val v19Sql: String = Seq(
    fdSqlCase("nation",   "nation.n_nationkey->n_regionkey",   "n_nationkey", "n_regionkey"),
    fdSqlCase("part",     "part.p_brand->p_type",              "p_brand",     "p_type"),
    fdSqlCase("customer", "customer.c_name->c_mktsegment",     "c_name",      "c_mktsegment"),
    fdSqlCase("orders",   "orders.o_custkey->o_orderpriority", "o_custkey",   "o_orderpriority"),
    fdSqlCase("lineitem", "lineitem.l_partkey->l_suppkey",     "l_partkey",   "l_suppkey"))
    .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY candidate")

  // ---- v20: cross-table volume contracts ----
  // The cheapest ingest tripwire there is: row-count RATIOS between
  // related tables, checked against declared bands. A feed that
  // silently drops half its line items keeps every per-row check green
  // — only the lineitem/orders ratio catches it. Counts are one
  // metadata-cheap aggregate per table (parquet scans prune to
  // nothing); the contract table is constant-sized; verdicts are exact
  // comparisons on one IEEE division each.
  val v20_volume_contracts: Q = (s, d) => {
    def cnt(df: DataFrame): DataFrame = df.agg(count(lit(1)).as("c"))
    val li = cnt(Tables.lineitem(s, d)).select(col("c").as("li"))
    val or = cnt(Tables.orders(s, d)).select(col("c").as("orr"))
    val cu = cnt(Tables.customer(s, d)).select(col("c").as("cu"))
    val na = cnt(Tables.nation(s, d)).select(col("c").as("na"))
    li.crossJoin(broadcast(or)).crossJoin(broadcast(cu))
      .crossJoin(broadcast(na))
      .select(explode(array(
        struct(lit("lineitem/orders").as("contract"),
          col("li").as("n_num"), col("orr").as("n_den"),
          lit(1.0).as("lo"), lit(10.0).as("hi")),
        struct(lit("orders/customer").as("contract"),
          col("orr").as("n_num"), col("cu").as("n_den"),
          lit(1.0).as("lo"), lit(50.0).as("hi")),
        struct(lit("customer/nation").as("contract"),
          col("cu").as("n_num"), col("na").as("n_den"),
          lit(1.0).as("lo"), lit(1000000.0).as("hi")))).as("r"))
      .select(col("r.contract"), col("r.n_num"), col("r.n_den"),
        round(col("r.n_num").cast("double") / col("r.n_den").cast("double"), 9)
          .as("ratio"),
        col("r.lo"), col("r.hi"))
      .withColumn("ok", col("ratio") >= col("lo") && col("ratio") <= col("hi"))
      .orderBy("contract")
  }
  val v20Sql: String =
    """WITH li AS (SELECT COUNT(*) AS li FROM lineitem),
      orr AS (SELECT COUNT(*) AS orr FROM orders),
      cu AS (SELECT COUNT(*) AS cu FROM customer),
      na AS (SELECT COUNT(*) AS na FROM nation),
      x AS (SELECT * FROM li, orr, cu, na),
      r AS (
        SELECT 'lineitem/orders' AS contract, li AS n_num, orr AS n_den,
               1.0 AS lo, 10.0 AS hi FROM x
        UNION ALL SELECT 'orders/customer', orr, cu, 1.0, 50.0 FROM x
        UNION ALL SELECT 'customer/nation', cu, na, 1.0, 1000000.0 FROM x)
      SELECT contract, n_num, n_den,
             round(CAST(n_num AS DOUBLE) / CAST(n_den AS DOUBLE), 9) AS ratio,
             CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi,
             round(CAST(n_num AS DOUBLE) / CAST(n_den AS DOUBLE), 9) >= CAST(lo AS DOUBLE)
               AND round(CAST(n_num AS DOUBLE) / CAST(n_den AS DOUBLE), 9) <= CAST(hi AS DOUBLE)
               AS ok
      FROM r ORDER BY contract"""

  // ---- v21: train/serve split skew (PSI between q65's splits) ----
  // The MLOps check that catches a broken split before a model does:
  // PSI of feature distributions between the deterministic train and
  // test buckets (q65's md5 family). A sound hash split should show
  // PSI ≈ 0 on every feature; a biased one (key correlated with the
  // feature) lights up here first. One numeric feature (o_totalprice,
  // 10 equi-width bins from broadcast global min/max) and one
  // categorical (o_orderpriority) — both from ONE combinable counting
  // pass each; v04's stable-sum PSI closed form (terms rounded 1e-12,
  // scaled decimal sums, final 1e-9).
  val v21_train_serve_skew: Q = (s, d) => {
    val bucket = conv(substring(md5(col("o_orderkey").cast("string")), 1, 2), 16, 10)
      .cast("int") % 10
    val base = Tables.orders(s, d)
      .withColumn("b", bucket)
      .filter(col("b") <= 7 || col("b") === 9)
      .withColumn("half", when(col("b") <= 7, "train").otherwise("test"))
    val range = base.agg(min("o_totalprice").as("vmin"),
      max("o_totalprice").as("vmax"))
    def psiOf(cells: DataFrame, feature: String): DataFrame = {
      val totals = cells.agg(sum("na").as("ta"), sum("nb").as("tb"))
      cells.crossJoin(broadcast(totals))
        .filter(col("na") > 0 && col("nb") > 0)
        .withColumn("term",
          (col("nb").cast("double") / col("tb") - col("na").cast("double") / col("ta"))
            * log((col("nb").cast("double") / col("tb"))
              / (col("na").cast("double") / col("ta"))))
        .agg(count(lit(1)).as("n_cells"),
          round(graft.Stable.dsum(round(col("term"), 12) * lit(1000000.0))
            / lit(1000000.0), 9).as("psi"))
        .select(lit(feature).as("feature"), col("n_cells"), col("psi"))
    }
    val numCells = base.crossJoin(broadcast(range))
      .withColumn("cell",
        least(lit(9), floor((col("o_totalprice") - col("vmin"))
          / ((col("vmax") - col("vmin")) / 10.0)).cast("int")).cast("long"))
      .groupBy("cell")
      .agg(count(when(col("half") === "train", 1)).as("na"),
        count(when(col("half") === "test", 1)).as("nb"))
    val catCells = base.groupBy(col("o_orderpriority").as("cell"))
      .agg(count(when(col("half") === "train", 1)).as("na"),
        count(when(col("half") === "test", 1)).as("nb"))
    psiOf(numCells, "o_totalprice_bins")
      .unionAll(psiOf(catCells.drop("cell"), "o_orderpriority"))
      .withColumn("verdict",
        when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.25, "moderate").otherwise("major"))
      .orderBy("feature")
  }
  val v21Sql: String =
    """WITH base AS (
        SELECT o_totalprice, o_orderpriority,
               ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2))::INT % 10 AS b
        FROM orders),
      f AS (SELECT *, CASE WHEN b <= 7 THEN 'train' ELSE 'test' END AS half
            FROM base WHERE b <= 7 OR b = 9),
      rg AS (SELECT MIN(o_totalprice) AS vmin, MAX(o_totalprice) AS vmax FROM f),
      nc AS (SELECT least(9, CAST(floor((o_totalprice - vmin)
                      / ((vmax - vmin) / 10.0)) AS INT)) AS cell,
               COUNT(*) FILTER (WHERE half = 'train') AS na,
               COUNT(*) FILTER (WHERE half = 'test') AS nb
             FROM f CROSS JOIN rg GROUP BY 1),
      cc AS (SELECT o_orderpriority AS cell,
               COUNT(*) FILTER (WHERE half = 'train') AS na,
               COUNT(*) FILTER (WHERE half = 'test') AS nb
             FROM f GROUP BY 1),
      pn AS (SELECT 'o_totalprice_bins' AS feature, COUNT(*) AS n_cells,
               round(CAST(SUM(CAST(round(
                 (CAST(nb AS DOUBLE) / tb - CAST(na AS DOUBLE) / ta)
                 * ln((CAST(nb AS DOUBLE) / tb) / (CAST(na AS DOUBLE) / ta)), 12)
                 * 1000000.0 AS DECIMAL(30,6))) AS DOUBLE) / 1000000.0, 9) AS psi
             FROM nc CROSS JOIN (SELECT CAST(SUM(na) AS BIGINT) ta,
                                   CAST(SUM(nb) AS BIGINT) tb FROM nc)
             WHERE na > 0 AND nb > 0),
      pc AS (SELECT 'o_orderpriority' AS feature, COUNT(*) AS n_cells,
               round(CAST(SUM(CAST(round(
                 (CAST(nb AS DOUBLE) / tb - CAST(na AS DOUBLE) / ta)
                 * ln((CAST(nb AS DOUBLE) / tb) / (CAST(na AS DOUBLE) / ta)), 12)
                 * 1000000.0 AS DECIMAL(30,6))) AS DOUBLE) / 1000000.0, 9) AS psi
             FROM cc CROSS JOIN (SELECT CAST(SUM(na) AS BIGINT) ta,
                                   CAST(SUM(nb) AS BIGINT) tb FROM cc)
             WHERE na > 0 AND nb > 0)
      SELECT feature, n_cells, psi,
             CASE WHEN psi < 0.1 THEN 'stable'
                  WHEN psi < 0.25 THEN 'moderate' ELSE 'major' END AS verdict
      FROM (SELECT * FROM pn UNION ALL SELECT * FROM pc)
      ORDER BY feature"""

  // ---- v22: order-independent table fingerprints ----
  // The replication-validation primitive: a content checksum of an
  // entire table that any engine, any partitioning, any row order
  // reproduces bit-for-bit — compare fingerprints after a migration /
  // backfill / replica sync instead of shipping rows. Row digest =
  // md5 of a canonical string encoding (engine-portable); table
  // digest = bit_xor of the digest's first-16-hex-chars as int64 (XOR
  // is commutative+associative → order-independent and map-side
  // combinable; a 64-bit collision needs a crafted adversary, not a
  // sync bug). One narrow scan per table, one 8-byte aggregate out.
  val v22_table_fingerprint: Q = (s, d) => {
    def fp(df: DataFrame, name: String, keyExpr: String): DataFrame = df
      .select(expr(s"conv(substring(md5($keyExpr), 1, 15), 16, 10)")
        .cast("decimal(38,0)").cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("fingerprint"))
      .select(lit(name).as("table_name"), col("n_rows"), col("fingerprint"))
    fp(Tables.nation(s, d), "nation",
        "concat_ws('|', n_nationkey, n_name, n_regionkey)")
      .unionAll(fp(Tables.customer(s, d), "customer",
        "concat_ws('|', c_custkey, c_name, c_nationkey, c_mktsegment)"))
      .unionAll(fp(Tables.documents(s, d), "documents",
        "concat_ws('|', doc_id, lang, source, n_chars)"))
      .orderBy("table_name")
  }
  val v22Sql: String = {
    def fpSql(table: String, key: String): String =
      s"""SELECT '$table' AS table_name, COUNT(*) AS n_rows,
            bit_xor(CAST(('0x' || substring(md5($key), 1, 15)) AS BIGINT))
              AS fingerprint
          FROM $table"""
    Seq(
      fpSql("nation", "concat_ws('|', n_nationkey, n_name, n_regionkey)"),
      fpSql("customer",
        "concat_ws('|', c_custkey, c_name, c_nationkey, c_mktsegment)"),
      fpSql("documents", "concat_ws('|', doc_id, lang, source, n_chars)"))
      .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY table_name")
  }

  // ---- v23: drill-down additivity audit ----
  // The BI bug every dashboard eventually ships: drill-down levels
  // that don't add up, because a dimension join fanned out or dropped
  // rows. Audited directly: revenue rolled up at nation level, region
  // level, and grand total — all from ONE fact aggregate — with exact
  // DECIMAL equality verdicts (nation sums == their region total,
  // region sums == grand). A fan-out would inflate a child level and
  // trip the verdict; decimal arithmetic means no tolerance band is
  // needed. Dim joins broadcast; the fact scan happens once.
  val v23_drilldown_consistency: Q = (s, d) => {
    val facts = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey").as("nat"), col("n_regionkey").as("reg"))
      .agg(sum(col("o_totalprice").cast(DecimalType(30, 6))).as("rev"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val byRegion = facts.groupBy("reg")
      .agg(sum("rev").as("reg_rev"), count(lit(1)).as("n_nations"))
    val grand = facts.agg(sum("rev").as("grand_rev"))
    // per-region: do its nations sum exactly to the region line?
    val natCheck = facts
      .groupBy("reg")
      .agg(sum("rev").as("nat_sum"))
      .join(byRegion, "reg")
      .select(lit("1_region").as("level"),
        col("reg").cast("long").as("group_key"),
        col("n_nations"),
        round(col("reg_rev").cast("double"), 6).as("total"),
        (col("nat_sum") === col("reg_rev")).as("children_add_up"))
    val grandRow = byRegion.agg(sum("reg_rev").as("region_sum"),
        count(lit(1)).as("n_regions"))
      .crossJoin(broadcast(grand))
      .select(lit("0_grand").as("level"),
        lit(-1L).as("group_key"),
        col("n_regions").as("n_nations"),
        round(col("grand_rev").cast("double"), 6).as("total"),
        (col("region_sum") === col("grand_rev")).as("children_add_up"))
    grandRow.unionAll(natCheck).orderBy("level", "group_key")
  }
  val v23Sql: String =
    """WITH f AS (SELECT n_nationkey AS nat, n_regionkey AS reg,
             SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS rev
           FROM orders JOIN customer ON o_custkey = c_custkey
                       JOIN nation ON c_nationkey = n_nationkey
           GROUP BY 1, 2),
      br AS (SELECT reg, SUM(rev) AS reg_rev, COUNT(*) AS n_nations
             FROM f GROUP BY 1),
      g AS (SELECT SUM(rev) AS grand_rev FROM f),
      nc AS (SELECT '1_region' AS level, CAST(reg AS BIGINT) AS group_key,
               n_nations, round(CAST(reg_rev AS DOUBLE), 6) AS total,
               ns.nat_sum = br.reg_rev AS children_add_up
             FROM br JOIN (SELECT reg, SUM(rev) AS nat_sum FROM f GROUP BY 1) ns
               USING (reg)),
      gr AS (SELECT '0_grand' AS level, CAST(-1 AS BIGINT) AS group_key,
               (SELECT COUNT(*) FROM br) AS n_nations,
               round(CAST(grand_rev AS DOUBLE), 6) AS total,
               (SELECT SUM(reg_rev) FROM br) = grand_rev AS children_add_up
             FROM g)
      SELECT * FROM (SELECT * FROM gr UNION ALL SELECT * FROM nc)
      ORDER BY level, group_key"""

  val queries: Map[String, Q] = Map(
    "v23_drilldown_consistency" -> v23_drilldown_consistency,
    "v22_table_fingerprint" -> v22_table_fingerprint,
    "v21_train_serve_skew" -> v21_train_serve_skew,
    "v20_volume_contracts" -> v20_volume_contracts,
    "v19_fd_audit"    -> v19_fd_audit,
    "v15_chi_square"  -> v15_chi_square,
    "v18_sample_check" -> v18_sample_check,
    "v17_value_reconcile" -> v17_value_reconcile,
    "v16_order_audit" -> v16_order_audit,
  )
  val oracles: Map[String, String] = Map(
    "v23_drilldown_consistency" -> v23Sql,
    "v22_table_fingerprint" -> v22Sql,
    "v21_train_serve_skew" -> v21Sql,
    "v20_volume_contracts" -> v20Sql,
    "v19_fd_audit"    -> v19Sql,
    "v15_chi_square"  -> v15Sql,
    "v18_sample_check" -> v18Sql,
    "v17_value_reconcile" -> v17Sql,
    "v16_order_audit" -> v16Sql,
  )
}
