package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational / ETL part 7: windowed distinct counting, ratio-to-report,
  * robust statistics, and the oracle-checked heavy-hitters sketch.
  */
object Relational7 {
  type Q = (SparkSession, String) => DataFrame

  // ---- q60: rolling unique reach (cumulative distinct over a window) ----
  // COUNT(DISTINCT) OVER isn't directly supported (and would be quadratic
  // anyway); the scalable form marks each user's first event per channel
  // (one row_number window) and takes a running sum of first-flags per
  // day — two narrow window passes, both partitioned on the channel key.
  val q60_rolling_reach: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("day"))
    val firsts = ev.withColumn("rn",
        row_number().over(Window.partitionBy("event_type", "user_id")
          .orderBy("day")))
      .filter(col("rn") === 1)
      .groupBy("event_type", "day").agg(count(lit(1)).as("n_new"))
    val days = ev.groupBy("event_type", "day").agg(count(lit(1)).as("n_events"))
    days.join(firsts, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("n_new"))
      .withColumn("cum_reach",
        sum("n_new").over(Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("event_type", "day", "n_events", "n_new", "cum_reach")
      .orderBy("event_type", "day")
  }
  val q60Sql: String =
    """WITH ev AS (SELECT event_type, user_id, CAST(ts AS DATE) AS day FROM events),
      f AS (SELECT event_type, day, COUNT(*) AS n_new FROM (
              SELECT event_type, user_id, day,
                     row_number() OVER (PARTITION BY event_type, user_id ORDER BY day) rn
              FROM ev) t WHERE rn = 1 GROUP BY 1, 2),
      dd AS (SELECT event_type, day, COUNT(*) AS n_events FROM ev GROUP BY 1, 2)
      SELECT dd.event_type, dd.day, n_events, COALESCE(n_new, 0) AS n_new,
             CAST(sum(COALESCE(n_new, 0)) OVER (PARTITION BY dd.event_type
               ORDER BY dd.day) AS BIGINT) AS cum_reach
      FROM dd LEFT JOIN f ON dd.event_type = f.event_type AND dd.day = f.day
      ORDER BY dd.event_type, dd.day"""

  // ---- q61: ratio-to-report (share of group total) ----
  // Group aggregation first, then the share window runs over the already
  // aggregated (tiny) report rows — never over the fact table.
  val q61_ratio_to_report: Q = (s, d) => {
    val rev = Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(graft.Stable.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
    rev.withColumn("flag_total",
        sum("revenue").over(Window.partitionBy("l_returnflag")))
      .withColumn("share", round(col("revenue") / col("flag_total"), 9))
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("revenue"), 4).as("revenue"), col("share"))
      .orderBy("l_returnflag", "l_linestatus")
  }
  val q61Sql: String =
    s"""WITH rev AS (SELECT l_returnflag, l_linestatus,
          ${graft.Stable.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
        FROM lineitem GROUP BY 1, 2)
      SELECT l_returnflag, l_linestatus, round(revenue, 4) AS revenue,
             round(revenue / sum(revenue) OVER (PARTITION BY l_returnflag), 9) AS share
      FROM rev ORDER BY l_returnflag, l_linestatus"""

  // ---- q62: robust statistics — exact median + deterministic mode ----
  // Median = exact interpolated percentile (both engines do the same
  // double interpolation on the sorted values). Mode is computed
  // explicitly (count per value, rank by count desc then value asc) so
  // tie-breaking is engine-independent.
  val q62_median_mode: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val med = li.groupBy("l_returnflag")
      .agg(round(expr("percentile(l_quantity, 0.5)"), 9).as("median_qty"))
    val mode = li.groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("l_returnflag").orderBy(desc("n"), col("l_quantity"))))
      .filter(col("rk") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n").as("mode_n"))
    med.join(mode, "l_returnflag").orderBy("l_returnflag")
  }
  val q62Sql: String =
    """WITH med AS (SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.5), 9) AS median_qty
           FROM lineitem GROUP BY 1),
      m AS (SELECT l_returnflag, l_quantity AS mode_qty, COUNT(*) AS n,
              row_number() OVER (PARTITION BY l_returnflag
                ORDER BY COUNT(*) DESC, l_quantity) AS rk
            FROM lineitem GROUP BY 1, 2)
      SELECT med.l_returnflag, median_qty, mode_qty, n AS mode_n
      FROM med JOIN m ON med.l_returnflag = m.l_returnflag AND rk = 1
      ORDER BY med.l_returnflag"""

  // ---- q63: heavy hitters via the SpaceSaving aggregator, oracle-exact ----
  // The custom TypedImperativeAggregate path: map-side SpaceSaving
  // sketches, one shuffled merge. capacity (64) exceeds the corpus
  // vocabulary, so the sketch is exact and the DuckDB oracle can check it
  // value-for-value — the same plan stays approximate-with-bounds when
  // vocabulary outgrows capacity at 100 TB.
  val q63_heavy_hitters: Q = (s, d) => {
    import s.implicits._
    val words = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word")).as[String]
    val topk = new graft.functions.TopKItems(10, 64).toColumn
    // the rank input is the exploded sketch — ≤ capacity rows by
    // construction — but globalTopK keeps even that off the
    // unpartitioned-window path (explicit constant partition)
    graft.api.GraftOps.globalTopK(
        words.select(topk.as[Map[String, Long]].name("topk"))
          .select(explode(col("topk")).as(Seq("word", "n"))),
        "n", "word", 10)
      .select("rank", "word", "n")
      .orderBy("rank")
  }
  val q63Sql: String =
    """SELECT CAST(row_number() OVER (ORDER BY COUNT(*) DESC, word) AS BIGINT) AS rank,
             word, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      GROUP BY word QUALIFY rank <= 10 ORDER BY rank"""

  val queries: Map[String, Q] = Map(
    "q60_rolling_reach"   -> q60_rolling_reach,
    "q61_ratio_to_report" -> q61_ratio_to_report,
    "q62_median_mode"     -> q62_median_mode,
    "q63_heavy_hitters"   -> q63_heavy_hitters,
  )
  val oracles: Map[String, String] = Map(
    "q60_rolling_reach"   -> q60Sql,
    "q61_ratio_to_report" -> q61Sql,
    "q62_median_mode"     -> q62Sql,
    "q63_heavy_hitters"   -> q63Sql,
  )
}
