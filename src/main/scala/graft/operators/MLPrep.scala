package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Stable, Tables}

/** ML feature-preparation verbs: normalization and categorical encoding —
  * the last-mile transforms before a training table leaves the warehouse.
  */
object MLPrep {
  type Q = (SparkSession, String) => DataFrame

  // ---- q70: per-group feature scaling (z-score + min-max) ----
  // Group statistics come from ONE exact decimal-sum aggregation over the
  // full table (map-side combinable, order-independent — identical on any
  // cluster), then ride a broadcast join back onto the rows: no window
  // over the fact table, no second scan. Output is a deterministic row
  // sample; the statistics always cover everything. Closed-form variance
  // is rounded at 1e-6 to absorb FMA contraction differences between
  // engines.
  val q70_feature_scale: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val stats = ev.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      Stable.dsum(col("value")).as("sv"),
      Stable.dsum(col("value") * col("value")).as("sv2"),
      min("value").as("vmin"), max("value").as("vmax"))
    val mean = col("sv") / col("n")
    ev.join(broadcast(stats), "event_type")
      .withColumn("z",
        round((col("value") - mean) / sqrt(col("sv2") / col("n") - mean * mean), 6))
      .withColumn("mm",
        round((col("value") - col("vmin")) / (col("vmax") - col("vmin")), 6))
      .filter(col("event_id") % 97 === 0)
      .select("event_id", "event_type", "value", "z", "mm")
      .orderBy("event_id")
  }
  val q70Sql: String =
    s"""WITH st AS (SELECT event_type, COUNT(*) AS n,
          ${Stable.sqlSum("value")} AS sv,
          ${Stable.sqlSum("value * value")} AS sv2,
          min(value) AS vmin, max(value) AS vmax
        FROM events GROUP BY 1)
      SELECT event_id, e.event_type, value,
             round((value - sv / n) / sqrt(sv2 / n - (sv / n) * (sv / n)), 6) AS z,
             round((value - vmin) / (vmax - vmin), 6) AS mm
      FROM events e JOIN st ON e.event_type = st.event_type
      WHERE event_id % 97 = 0 ORDER BY event_id"""

  // ---- q71: one-hot / dummy encoding ----
  // Static categorical vocabulary -> fixed indicator columns (the oracle
  // needs a static schema, and so does any sane feature store). Pure
  // narrow map: zero shuffle, codegen'd CASE WHENs, scales linearly.
  val q71_one_hot: Q = (s, d) => {
    def ind(c: String, v: String, out: String) =
      when(col(c) === v, 1L).otherwise(0L).as(out)
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"),
        ind("o_orderpriority", "1-URGENT", "p_urgent"),
        ind("o_orderpriority", "2-HIGH", "p_high"),
        ind("o_orderpriority", "3-MEDIUM", "p_medium"),
        ind("o_orderpriority", "4-NOT SPECIFIED", "p_notspec"),
        ind("o_orderpriority", "5-LOW", "p_low"),
        ind("o_orderstatus", "F", "s_f"),
        ind("o_orderstatus", "O", "s_o"),
        ind("o_orderstatus", "P", "s_p"))
      .orderBy("o_orderkey")
  }
  val q71Sql: String =
    """SELECT o_orderkey,
        CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS BIGINT) AS p_urgent,
        CAST(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS BIGINT) AS p_high,
        CAST(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS BIGINT) AS p_medium,
        CAST(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END AS BIGINT) AS p_notspec,
        CAST(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS BIGINT) AS p_low,
        CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS BIGINT) AS s_f,
        CAST(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS BIGINT) AS s_o,
        CAST(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS BIGINT) AS s_p
      FROM orders WHERE o_orderkey % 50 = 0 ORDER BY o_orderkey"""

  // ---- q72: decile lift table (equi-depth bucketing, no global sort) ----
  // The model-eval gains table: score deciles vs response rate. Deciles
  // come from exact interpolated percentiles (one agg) broadcast back and
  // assigned by comparison — NOT ntile over a global ORDER BY, which
  // would funnel every row through one partition at scale. Rates are
  // integer-count ratios, engine-exact.
  val q72_decile_lift: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val bounds = ev.agg(expr(
      "percentile(value, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
      .as("bs"))
    val overall = ev.agg(
      count(lit(1)).as("n_all"),
      count(when(col("event_type") === "purchase", 1)).as("p_all"))
    ev.join(broadcast(bounds)).join(broadcast(overall))
      .withColumn("decile",
        expr("CAST(size(filter(bs, b -> value > b)) + 1 AS BIGINT)"))
      .groupBy("decile", "n_all", "p_all")
      .agg(count(lit(1)).as("n"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"))
      .withColumn("rate",
        round(col("purchases").cast("double") / col("n"), 9))
      .withColumn("lift",
        round((col("purchases").cast("double") / col("n"))
          / (col("p_all").cast("double") / col("n_all")), 9))
      .select("decile", "n", "purchases", "rate", "lift")
      .orderBy("decile")
  }
  val q72Sql: String =
    """WITH bs AS (SELECT quantile_cont(value,
            [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs FROM events),
      ov AS (SELECT COUNT(*) AS n_all,
                    COUNT(*) FILTER (WHERE event_type = 'purchase') AS p_all
             FROM events),
      a AS (SELECT e.event_type,
              len(list_filter(bs.bs, b -> e.value > b)) + 1 AS decile
            FROM events e CROSS JOIN bs),
      g AS (SELECT decile, COUNT(*) AS n,
                   COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases
            FROM a GROUP BY 1)
      SELECT CAST(decile AS BIGINT) AS decile, n, purchases,
             round(CAST(purchases AS DOUBLE) / n, 9) AS rate,
             round((CAST(purchases AS DOUBLE) / n)
               / (CAST(p_all AS DOUBLE) / n_all), 9) AS lift
      FROM g CROSS JOIN ov ORDER BY decile"""

  // ---- q74: smoothed target encoding ----
  // Mean-target encoding with additive smoothing toward the global mean
  // (k = 10): enc = (pos_cat + k * global_rate) / (n_cat + k). All
  // inputs are exact integer counts from ONE pass; the encoder table is
  // category-sized and rides a broadcast wherever it's applied.
  val q74_target_encode: Q = (s, d) => {
    val K = 10.0
    val o = Tables.orders(s, d)
    val global = o.agg(
      count(lit(1)).as("n_all"),
      count(when(col("o_orderstatus") === "F", 1)).as("pos_all"))
    o.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        count(when(col("o_orderstatus") === "F", 1)).as("pos"))
      .join(broadcast(global))
      .withColumn("global_rate",
        col("pos_all").cast("double") / col("n_all"))
      .withColumn("enc",
        round((col("pos").cast("double") + lit(K) * col("global_rate"))
          / (col("n").cast("double") + lit(K)), 9))
      .select(col("o_orderpriority"), col("n"), col("pos"),
        round(col("global_rate"), 9).as("global_rate"), col("enc"))
      .orderBy("o_orderpriority")
  }
  val q74Sql: String =
    """WITH g AS (SELECT COUNT(*) AS n_all,
            COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS pos_all FROM orders),
      c AS (SELECT o_orderpriority, COUNT(*) AS n,
              COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS pos
            FROM orders GROUP BY 1)
      SELECT o_orderpriority, n, pos,
             round(CAST(pos_all AS DOUBLE) / n_all, 9) AS global_rate,
             round((CAST(pos AS DOUBLE) + 10.0 * (CAST(pos_all AS DOUBLE) / n_all))
               / (CAST(n AS DOUBLE) + 10.0), 9) AS enc
      FROM c CROSS JOIN g ORDER BY o_orderpriority"""

  val queries: Map[String, Q] = Map(
    "q70_feature_scale" -> q70_feature_scale,
    "q71_one_hot"       -> q71_one_hot,
    "q72_decile_lift"   -> q72_decile_lift,
    "q74_target_encode" -> q74_target_encode,
  )
  val oracles: Map[String, String] = Map(
    "q70_feature_scale" -> q70Sql,
    "q71_one_hot"       -> q71Sql,
    "q72_decile_lift"   -> q72Sql,
    "q74_target_encode" -> q74Sql,
  )
}
