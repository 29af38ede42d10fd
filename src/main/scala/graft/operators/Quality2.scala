package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Data-quality family, part 2. */
object Quality2 {
  type Q = (SparkSession, String) => DataFrame

  // ---- v08: schema/statistics drift contract between two cohorts ----
  // v04 measures DISTRIBUTION drift of one column (PSI); this is the
  // column-level data-contract audit across a schema: for each audited
  // column, per-cohort null fraction / mean / min / max and the deltas,
  // the report a feed owner diffs when a producer changes upstream.
  // Cohorts here are the deterministic halves o_orderkey % 2 (in
  // production: yesterday's load vs today's). Plan discipline is v05's:
  // ONE wide conditional aggregate over ONE scan computes every
  // (column, cohort, metric) cell — FILTER-style when() aggregates are
  // all map-side combinable, so the fact table is read once and shuffles
  // one row — then a constant-size stack unpivots to the tall report.
  // All doubles go through decimal sums (Stable discipline) and a final
  // 1e-9 round, so both engines agree bit-for-bit.
  val v08_schema_drift: Q = (s, d) => {
    val D = DecimalType(30, 6)
    val cols = Seq("o_custkey", "o_orderkey", "o_totalprice")
    val src = Tables.orders(s, d)
      .withColumn("__a", col("o_orderkey") % 2 === 0)
    def cell(c: String, a: Boolean): Seq[Column] = {
      val side = if (a) col("__a") else !col("__a")
      val v = when(side, col(c))
      val tag = if (a) "a" else "b"
      Seq(
        round(sum(v.cast(D)).cast("double") / count(v), 9).as(s"${c}__mean_$tag"),
        min(v).cast("double").as(s"${c}__min_$tag"),
        max(v).cast("double").as(s"${c}__max_$tag"),
        round(count(when(side && col(c).isNull, 1)).cast("double")
          / count(when(side, 1)), 9).as(s"${c}__nullfrac_$tag"))
    }
    val wide = src.agg(
      cell(cols.head, a = true).head,
      (cols.flatMap(c => cell(c, a = true) ++ cell(c, a = false)).tail): _*)
    val stacked = cols.flatMap { c =>
      Seq("mean", "min", "max", "nullfrac").map { m =>
        s"'$c', '$m', ${c}__${m}_a, ${c}__${m}_b"
      }
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.size * 4}, $stacked) AS (column_name, metric, val_a, val_b)"))
      .withColumn("delta", round(col("val_b") - col("val_a"), 9))
      .orderBy("column_name", "metric")
  }
  val v08Sql: String = {
    val cols = Seq("o_custkey", "o_orderkey", "o_totalprice")
    def cohort(c: String, cond: String) = Seq(
      s"round(CAST(SUM(CAST($c AS DECIMAL(30,6))) FILTER (WHERE $cond) AS DOUBLE)" +
        s" / COUNT($c) FILTER (WHERE $cond), 9)",
      s"CAST(MIN($c) FILTER (WHERE $cond) AS DOUBLE)",
      s"CAST(MAX($c) FILTER (WHERE $cond) AS DOUBLE)",
      s"round(CAST(COUNT(*) FILTER (WHERE $cond AND $c IS NULL) AS DOUBLE)" +
        s" / COUNT(*) FILTER (WHERE $cond), 9)")
    val rows = cols.flatMap { c =>
      val a = cohort(c, "o_orderkey % 2 = 0")
      val b = cohort(c, "o_orderkey % 2 <> 0")
      Seq("mean", "min", "max", "nullfrac").zipWithIndex.map { case (m, i) =>
        s"SELECT '$c' AS column_name, '$m' AS metric, ${a(i)} AS val_a, " +
          s"${b(i)} AS val_b FROM orders"
      }
    }
    s"""SELECT column_name, metric, val_a, val_b,
           round(val_b - val_a, 9) AS delta
       FROM (${rows.mkString(" UNION ALL ")})
       ORDER BY column_name, metric"""
  }

  // ---- v10: Benford first-digit audit (fabrication / corruption) ----
  // The forensic-accounting classic applied to feed QA: naturally
  // occurring money amounts follow Benford's law (P(d) = log10(1+1/d));
  // a feed whose first-digit histogram deviates sharply was truncated,
  // defaulted, synthesized, or unit-shifted upstream. One narrow map
  // derives the first significant digit ARITHMETICALLY (price -> exact
  // DECIMAL cents -> leading digit of the integer's decimal string —
  // no float log10, no engine-dependent double formatting), one
  // 9-row aggregate, and the total rides a broadcast scalar join —
  // a single fact-table scan at any corpus size. Expected shares are
  // 9 fixed literals (same parsed doubles both engines), so share and
  // deviation are bit-exact cross-engine.
  val v10_benford: Q = (s, d) => {
    val benford = "CAST(CASE first_digit " +
      "WHEN 1 THEN 0.301029996 WHEN 2 THEN 0.176091259 " +
      "WHEN 3 THEN 0.124938737 WHEN 4 THEN 0.096910013 " +
      "WHEN 5 THEN 0.079181246 WHEN 6 THEN 0.066946790 " +
      "WHEN 7 THEN 0.057991947 WHEN 8 THEN 0.051152522 " +
      "ELSE 0.045757491 END AS DOUBLE)"
    val digits = Tables.lineitem(s, d)
      .select((col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("cents"))
      .select(substring(col("cents").cast("string"), 1, 1).cast("int")
        .as("first_digit"))
      .groupBy("first_digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").as("tot"))
    digits.crossJoin(broadcast(total))
      .withColumn("share",
        round(col("n").cast("double") / col("tot").cast("double"), 9))
      .withColumn("expected", expr(benford))
      .withColumn("abs_dev", round(abs(col("share") - col("expected")), 9))
      .select("first_digit", "n", "share", "expected", "abs_dev")
      .orderBy("first_digit")
  }
  val v10Sql: String =
    """WITH c AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents
        FROM lineitem),
      dg AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INT)
                      AS first_digit, COUNT(*) AS n
             FROM c GROUP BY 1),
      t AS (SELECT SUM(n) AS tot FROM dg),
      sh AS (SELECT first_digit, n,
               round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 9) AS share,
               CAST(CASE first_digit
                 WHEN 1 THEN 0.301029996 WHEN 2 THEN 0.176091259
                 WHEN 3 THEN 0.124938737 WHEN 4 THEN 0.096910013
                 WHEN 5 THEN 0.079181246 WHEN 6 THEN 0.066946790
                 WHEN 7 THEN 0.057991947 WHEN 8 THEN 0.051152522
                 ELSE 0.045757491 END AS DOUBLE) AS expected
             FROM dg, t)
      SELECT first_digit, n, share, expected,
             round(abs(share - expected), 9) AS abs_dev
      FROM sh ORDER BY first_digit"""

  // ---- v11: exact two-sample Kolmogorov-Smirnov statistic ----
  // v04's PSI needs binning choices; KS is the bin-free drift test:
  // D = max |ECDF₁ − ECDF₂|, here between the purchase and click value
  // distributions. The textbook formulation sorts the pooled sample —
  // a GLOBAL sort, banned. Engine shape instead: collapse to distinct
  // values with per-sample counts (ONE combinable aggregate — the
  // working set is distinct values from here on), then the globalRank
  // prefix decomposition for the running sums: range-repartition on
  // value, per-partition window cumsums in parallel, per-partition
  // totals (partition-count rows) broadcast back as exclusive-prefix
  // carry-ins. D's argmax runs on EXACT INTEGERS — |S₁·n₂ − S₂·n₁| —
  // so the selected row is engine-exact (ties broken by min value, a
  // total order), and the statistic itself is ONE IEEE division at
  // the end. TakeOrderedAndProject prunes the argmax; no single task
  // ever holds more than its value range.
  // the library verb (GraftOps.ksTest) IS the implementation — the
  // oracle gate certifies the facade itself
  val v11_ks_test: Q = (s, d) =>
    graft.api.GraftOps.ksTest(Tables.events(s, d),
      col("event_type"), col("value"), "purchase", "click")

  val v11Sql: String =
    """WITH ev AS (SELECT event_type, value FROM events
                  WHERE event_type IN ('purchase', 'click')),
      cells AS (SELECT value,
                  COUNT(*) FILTER (WHERE event_type = 'purchase') AS c1,
                  COUNT(*) FILTER (WHERE event_type = 'click') AS c2
                FROM ev GROUP BY 1),
      n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                   CAST(SUM(c2) AS BIGINT) AS n2 FROM cells),
      cum AS (SELECT value,
                CAST(SUM(c1) OVER (ORDER BY value) AS BIGINT) AS s1,
                CAST(SUM(c2) OVER (ORDER BY value) AS BIGINT) AS s2
              FROM cells)
      SELECT n1, n2, value AS at_value,
             abs(s1 * n2 - s2 * n1) AS d_numerator,
             round(CAST(abs(s1 * n2 - s2 * n1) AS DOUBLE)
                   / CAST(n1 * n2 AS DOUBLE), 9) AS ks_d
      FROM cum, n
      ORDER BY d_numerator DESC, value LIMIT 1"""

  // ---- v12: completeness matrix (coverage grid with zero-fill) ----
  // "Which feeds are missing which languages?" — the coverage heatmap a
  // corpus owner checks before a training run. The expected grid is the
  // cross product of the OBSERVED dimension values (sources × langs —
  // both metadata-sized dimension pulls, broadcast cross join); observed
  // cells come from ONE combinable (source, lang) count; absent combos
  // surface explicitly as n_docs = 0 rather than silently not existing
  // — the zero-fill is the entire point (a missing cell in a GROUP BY
  // is invisible; a zero row is actionable). share_of_source is a
  // single IEEE division of exact counts; present is an exact flag.
  val v12_completeness: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val srcs  = docs.select(col("source")).distinct()
    val langs = docs.select(col("lang")).distinct()
    val counts = docs.groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"))
    val perSource = docs.groupBy("source").agg(count(lit(1)).as("n_source"))
    srcs.crossJoin(broadcast(langs))
      .join(counts, Seq("source", "lang"), "left")
      .na.fill(0L, Seq("n_docs"))
      .join(broadcast(perSource), "source")
      .select(col("source"), col("lang"), col("n_docs"),
        (col("n_docs") > 0).as("present"),
        round(col("n_docs").cast("double") / col("n_source").cast("double"), 9)
          .as("share_of_source"))
      .orderBy("source", "lang")
  }
  val v12Sql: String =
    """WITH g AS (SELECT s.source, l.lang
               FROM (SELECT DISTINCT source FROM documents) s
               CROSS JOIN (SELECT DISTINCT lang FROM documents) l),
      c AS (SELECT source, lang, COUNT(*) AS n_docs
            FROM documents GROUP BY 1, 2),
      ps AS (SELECT source, COUNT(*) AS n_source
             FROM documents GROUP BY 1)
      SELECT g.source, g.lang,
             COALESCE(c.n_docs, 0) AS n_docs,
             COALESCE(c.n_docs, 0) > 0 AS present,
             round(CAST(COALESCE(c.n_docs, 0) AS DOUBLE)
                   / CAST(ps.n_source AS DOUBLE), 9) AS share_of_source
      FROM g LEFT JOIN c ON g.source = c.source AND g.lang = c.lang
             JOIN ps ON g.source = ps.source
      ORDER BY g.source, g.lang"""

  // ---- v13: candidate key discovery (PK uniqueness + FK containment) ----
  // The data-catalog profiler: given column PAIRS, measure what a key
  // constraint would have to be true of — parent uniqueness
  // (distinct/rows) and child containment (what fraction of child
  // values exist in the parent) — and emit the verdict a catalog would
  // record. v03 CHECKS declared integrity; this DISCOVERS it from the
  // data. Per pair: two combinable distinct-aggregates + one distinct
  // anti-join on the child's value set (value-set-sized, never
  // row-sized). Exact integer ratios, exact boolean verdict.
  val v13_key_discovery: Q = (s, d) => {
    def profile(parent: DataFrame, pCol: String, child: DataFrame,
        cCol: String, label: String): DataFrame = {
      val p = parent.select(col(pCol).as("v"))
      val c = child.select(col(cCol).as("v"))
      val pStats = p.agg(count(lit(1)).as("parent_rows"),
        count_distinct(col("v")).as("parent_distinct"))
      val cDistinct = c.distinct()
      val cStats = cDistinct.agg(count(lit(1)).as("child_distinct"))
      val orphans = cDistinct.join(p.distinct(), Seq("v"), "left_anti")
        .agg(count(lit(1)).as("child_orphans"))
      pStats.crossJoin(broadcast(cStats)).crossJoin(broadcast(orphans))
        .select(lit(label).as("pair"),
          col("parent_rows"), col("parent_distinct"),
          round(col("parent_distinct").cast("double")
            / col("parent_rows").cast("double"), 9).as("uniqueness"),
          col("child_distinct"), col("child_orphans"),
          round((col("child_distinct") - col("child_orphans")).cast("double")
            / col("child_distinct").cast("double"), 9).as("containment"),
          (col("parent_distinct") === col("parent_rows")
            && col("child_orphans") === 0).as("fk_candidate"))
    }
    profile(Tables.customer(s, d), "c_custkey",
        Tables.orders(s, d), "o_custkey", "customer.c_custkey<-orders.o_custkey")
      .unionAll(profile(Tables.part(s, d), "p_partkey",
        Tables.lineitem(s, d), "l_partkey", "part.p_partkey<-lineitem.l_partkey"))
      .unionAll(profile(Tables.orders(s, d), "o_orderkey",
        Tables.lineitem(s, d), "l_orderkey", "orders.o_orderkey<-lineitem.l_orderkey"))
      .unionAll(profile(Tables.orders(s, d), "o_orderpriority",
        Tables.orders(s, d), "o_orderpriority", "orders.o_orderpriority<-self"))
      .orderBy("pair")
  }
  private def v13PairSql(pt: String, pc: String, ct: String, cc: String,
      label: String): String =
    s"""SELECT '$label' AS pair,
          (SELECT COUNT(*) FROM $pt) AS parent_rows,
          (SELECT COUNT(DISTINCT $pc) FROM $pt) AS parent_distinct,
          round(CAST((SELECT COUNT(DISTINCT $pc) FROM $pt) AS DOUBLE)
                / CAST((SELECT COUNT(*) FROM $pt) AS DOUBLE), 9)
            AS uniqueness,
          (SELECT COUNT(DISTINCT $cc) FROM $ct) AS child_distinct,
          (SELECT COUNT(*) FROM (SELECT DISTINCT $cc AS v FROM $ct) c
           WHERE v NOT IN (SELECT DISTINCT $pc FROM $pt)) AS child_orphans,
          round(CAST((SELECT COUNT(DISTINCT $cc) FROM $ct)
                  - (SELECT COUNT(*) FROM (SELECT DISTINCT $cc AS v FROM $ct) c
                     WHERE v NOT IN (SELECT DISTINCT $pc FROM $pt)) AS DOUBLE)
                / CAST((SELECT COUNT(DISTINCT $cc) FROM $ct) AS DOUBLE), 9)
            AS containment,
          ((SELECT COUNT(DISTINCT $pc) FROM $pt)
             = (SELECT COUNT(*) FROM $pt)
           AND (SELECT COUNT(*) FROM (SELECT DISTINCT $cc AS v FROM $ct) c
                WHERE v NOT IN (SELECT DISTINCT $pc FROM $pt)) = 0)
            AS fk_candidate"""
  val v13Sql: String =
    s"""SELECT * FROM (
        ${v13PairSql("customer", "c_custkey", "orders", "o_custkey",
          "customer.c_custkey<-orders.o_custkey")}
        UNION ALL
        ${v13PairSql("part", "p_partkey", "lineitem", "l_partkey",
          "part.p_partkey<-lineitem.l_partkey")}
        UNION ALL
        ${v13PairSql("orders", "o_orderkey", "lineitem", "l_orderkey",
          "orders.o_orderkey<-lineitem.l_orderkey")}
        UNION ALL
        ${v13PairSql("orders", "o_orderpriority", "orders", "o_orderpriority",
          "orders.o_orderpriority<-self")}
      ) ORDER BY pair"""

  // ---- v14: IQR outlier census ----
  // The Tukey-fence profile (Q1 − 1.5·IQR, Q3 + 1.5·IQR) per audited
  // numeric column — the robust outlier count every data-quality
  // dashboard shows, immune to the outliers it is counting (unlike
  // z-scores). Per column: ONE percentile-bounds broadcast (the q72
  // discipline — never a sort) + ONE combinable conditional aggregate.
  // Fence arithmetic is a fixed IEEE sequence on interpolated bounds
  // both engines derive from the same sorted doubles; counts are exact
  // ints, rates one division.
  val v14_outlier_census: Q = (s, d) => {
    def census(df: DataFrame, c: String, label: String): DataFrame = {
      val v = df.select(col(c).cast("double").as("v"))
      val q = v.agg(expr("percentile(v, array(0.25D, 0.75D))").as("qs"))
      v.crossJoin(broadcast(q))
        .withColumn("lo", expr("qs[0] - 1.5D * (qs[1] - qs[0])"))
        .withColumn("hi", expr("qs[1] + 1.5D * (qs[1] - qs[0])"))
        .agg(count(lit(1)).as("n_rows"),
          round(first(col("lo")), 6).as("fence_lo"),
          round(first(col("hi")), 6).as("fence_hi"),
          count(when(col("v") < col("lo"), 1)).as("n_below"),
          count(when(col("v") > col("hi"), 1)).as("n_above"))
        .select(lit(label).as("column_name"), col("n_rows"),
          col("fence_lo"), col("fence_hi"), col("n_below"), col("n_above"),
          round((col("n_below") + col("n_above")).cast("double")
            / col("n_rows").cast("double"), 9).as("outlier_rate"))
    }
    census(Tables.orders(s, d), "o_totalprice", "orders.o_totalprice")
      .unionAll(census(Tables.lineitem(s, d), "l_quantity",
        "lineitem.l_quantity"))
      .unionAll(census(Tables.lineitem(s, d), "l_extendedprice",
        "lineitem.l_extendedprice"))
      .orderBy("column_name")
  }
  private def v14CensusSql(table: String, c: String): String =
    s"""SELECT '$table.$c' AS column_name,
          COUNT(*) AS n_rows,
          round(MIN(lo), 6) AS fence_lo, round(MIN(hi), 6) AS fence_hi,
          COUNT(*) FILTER (WHERE v < lo) AS n_below,
          COUNT(*) FILTER (WHERE v > hi) AS n_above,
          round(CAST(COUNT(*) FILTER (WHERE v < lo OR v > hi) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE), 9) AS outlier_rate
       FROM (
         SELECT CAST($c AS DOUBLE) AS v,
                qs[1] - CAST(1.5 AS DOUBLE) * (qs[2] - qs[1]) AS lo,
                qs[2] + CAST(1.5 AS DOUBLE) * (qs[2] - qs[1]) AS hi
         FROM $table CROSS JOIN
           (SELECT quantile_cont(CAST($c AS DOUBLE), [0.25, 0.75]) AS qs
            FROM $table) q)"""
  val v14Sql: String =
    s"""SELECT * FROM (
        ${v14CensusSql("orders", "o_totalprice")}
        UNION ALL
        ${v14CensusSql("lineitem", "l_quantity")}
        UNION ALL
        ${v14CensusSql("lineitem", "l_extendedprice")}
      ) ORDER BY column_name"""

  val queries: Map[String, Q] = Map(
    "v08_schema_drift" -> v08_schema_drift,
    "v10_benford"      -> v10_benford,
    "v11_ks_test"      -> v11_ks_test,
    "v12_completeness" -> v12_completeness,
    "v13_key_discovery" -> v13_key_discovery,
    "v14_outlier_census" -> v14_outlier_census,
  )
  val oracles: Map[String, String] = Map(
    "v08_schema_drift" -> v08Sql,
    "v10_benford"      -> v10Sql,
    "v11_ks_test"      -> v11Sql,
    "v12_completeness" -> v12Sql,
    "v13_key_discovery" -> v13Sql,
    "v14_outlier_census" -> v14Sql,
  )
}
