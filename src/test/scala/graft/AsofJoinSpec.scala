package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The custom sort-merge as-of operator must agree row-for-row with the
  * composed union+window formulation (q34), and its plan must show the
  * expected shape (exchange + sort on both sides, no join explosion).
  */
class AsofJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def viaCustom = {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .agg(max("event_id").as("view_event_id"))
      .select("v_user", "view_ts", "view_event_id")
    plans.AsofJoin.asofJoin(purchases, views, "user_id", "v_user", "ts", "view_ts")
  }

  test("custom as-of exec matches the union+window composition") {
    val custom = viaCustom
      .select(col("event_id"), col("view_event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val composed = operators.Relational3.q34_asof_join(spark, sf)
      .select(col("event_id"), col("view_event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(custom.keySet == composed.keySet, "row sets differ")
    val diff = custom.filter { case (k, v) => composed(k) != v }
    assert(diff.isEmpty, s"${diff.size} mismatching matches, e.g. ${diff.take(3)}")
    assert(custom.nonEmpty)
  }

  test("as-of physical plan: co-partitioned sort-merge, no join node") {
    val plan = viaCustom.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(500))
    assert(plan.contains("Exchange hashpartitioning"), "missing co-partition exchange")
    assert(plan.contains("Sort "), "missing sort")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "unexpected standard join in plan")
  }

  test("left rows with no prior match get null right side") {
    val nulls = viaCustom.filter(col("view_event_id").isNull).count()
    val total = viaCustom.count()
    assert(total > 0)
    // at least verify the outer semantics hold: total == all purchases
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(total == purchases, s"as-of must be left-outer: $total vs $purchases")
    assert(nulls < total)
  }
}
