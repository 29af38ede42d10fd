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

  val queries: Map[String, Q] = Map(
    "q70_feature_scale" -> q70_feature_scale,
    "q71_one_hot"       -> q71_one_hot,
  )
  val oracles: Map[String, String] = Map(
    "q70_feature_scale" -> q70Sql,
    "q71_one_hot"       -> q71Sql,
  )
}
