package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.quantile_sketch

/** Relational / ETL part 8: the mergeable quantile sketch and
  * deterministic train/val/test splitting.
  */
object Relational8 {
  type Q = (SparkSession, String) => DataFrame

  // ---- q64: grouped quantiles via the mergeable QuantileSketch ----
  // The custom TypedImperativeAggregate path for order statistics:
  // map-side partial sketches, one shuffled merge, bounded memory at any
  // scale. Capacity (2^17) exceeds the per-group row count at test SF, so
  // the sketch is EXACT type-1 quantiles and DuckDB's quantile_disc checks
  // it value-for-value — the same plan degrades gracefully to a bounded
  // O(W/capacity)-error sketch when a 100 TB group outgrows capacity.
  val q64_quantile_sketch: Q = (s, d) => {
    val probs = Seq(0.25, 0.5, 0.75, 0.95)
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(quantile_sketch(col("l_quantity").cast("double"), probs).as("qs"))
      .select(col("l_returnflag"),
        col("qs").getItem(0).as("q25"),
        col("qs").getItem(1).as("q50"),
        col("qs").getItem(2).as("q75"),
        col("qs").getItem(3).as("q95"))
      .orderBy("l_returnflag")
  }
  val q64Sql: String =
    """SELECT l_returnflag,
             quantile_disc(CAST(l_quantity AS DOUBLE), 0.25) AS q25,
             quantile_disc(CAST(l_quantity AS DOUBLE), 0.5)  AS q50,
             quantile_disc(CAST(l_quantity AS DOUBLE), 0.75) AS q75,
             quantile_disc(CAST(l_quantity AS DOUBLE), 0.95) AS q95
      FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""

  // ---- q65: deterministic train/val/test split ----
  // Split assignment is a pure function of the key (md5 bucket mod 10:
  // 0-7 train, 8 val, 9 test) — reproducible across runs, engines, and
  // cluster sizes, and embarrassingly parallel (no shuffle to assign; the
  // only shuffle is the tiny per-split report aggregation).
  val q65_train_test_split: Q = (s, d) => {
    val bucket = conv(substring(md5(col("o_orderkey").cast("string")), 1, 2), 16, 10)
      .cast("int") % 10
    Tables.orders(s, d)
      .withColumn("split",
        when(bucket <= 7, "train").when(bucket === 8, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n"),
        graft.Stable.dsum(col("o_totalprice")).as("total_price"))
      .orderBy("split")
  }
  val q65Sql: String =
    s"""SELECT CASE WHEN b <= 7 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
             COUNT(*) AS n, ${graft.Stable.sqlSum("o_totalprice")} AS total_price
      FROM (SELECT o_totalprice,
              ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2))::INT % 10 AS b
            FROM orders) t
      GROUP BY 1 ORDER BY split"""

  val queries: Map[String, Q] = Map(
    "q64_quantile_sketch"  -> q64_quantile_sketch,
    "q65_train_test_split" -> q65_train_test_split,
  )
  val oracles: Map[String, String] = Map(
    "q64_quantile_sketch"  -> q64Sql,
    "q65_train_test_split" -> q65Sql,
  )
}
