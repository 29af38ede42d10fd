package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  test("pipeline stays lazy and composes into one plan") {
    val p = api.Pipeline(
      "filter" -> (df => df.filter(col("l_quantity") > 10.0)),
      "project" -> (df => df.select("l_orderkey", "l_quantity")),
      "agg" -> (df => df.groupBy("l_orderkey").agg(sum("l_quantity").as("q"))),
    )
    val out = p.run(Tables.lineitem(spark, sf))
    // filter + projection must fuse into the scan of the single plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,10.0)]"),
      s"filter not pushed:\n${plan.take(800)}")
    assert(out.count() > 0)
  }

  test("profile reports monotone row counts for narrowing stages") {
    val p = api.Pipeline(
      "all" -> identity,
      "filter" -> (df => df.filter(col("o_totalprice") > 100000.0)),
      "tight" -> (df => df.filter(col("o_totalprice") > 300000.0)),
    )
    val counts = p.profile(Tables.orders(spark, sf)).map(_._2)
    assert(counts(0) >= counts(1) && counts(1) >= counts(2))
  }

  test("runObserved reports per-stage rows from ONE action (observe metrics)") {
    val p = api.Pipeline(
      "all" -> identity,
      "filter" -> (df => df.filter(col("o_totalprice") > 100000.0)),
      "tight" -> (df => df.filter(col("o_totalprice") > 300000.0)),
    )
    val input = Tables.orders(spark, sf)
    val (out, metrics) = p.runObserved(input)
    out.count() // the single action that also materializes the metrics
    val m = metrics()
    val expected = p.profile(input).toMap
    expected.foreach { case (stage, rows) =>
      assert(m(s"stage:$stage") == rows, s"stage $stage: ${m.get(s"stage:$stage")} vs $rows")
    }
  }

  test("p01 corpus pipeline output is a subset of input docs") {
    val out = operators.CorpusPipeline.p01_corpus_clean(spark, sf)
    val n = out.count()
    val total = Tables.documents(spark, sf).count()
    assert(n > 0 && n < total, s"$n of $total")
    // no duplicate doc_ids
    assert(out.select("doc_id").distinct().count() == n)
  }
}
