package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup4

/** Properties for the span-dedup / signature-estimation family. */
class Dedup4Spec extends AnyFunSuite {
  import SparkTestSession._

  test("d19: minhash estimate is within the k=64 error bound of exact Jaccard") {
    val rows = Dedup4.d19_minhash_estimate(spark, sf)
      .select("jaccard_exact", "jaccard_est")
      .collect()
    assert(rows.nonEmpty, "no verified near-dup pairs to estimate on")
    val errs = rows.map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    // k=64 ⇒ σ = √(J(1−J)/64) ≤ 0.0625; 0.30 is ~5σ headroom per pair
    assert(errs.max <= 0.30, s"max |est−exact| ${errs.max} exceeds bound")
    assert(errs.sum / errs.length <= 0.10,
      s"mean |est−exact| ${errs.sum / errs.length} exceeds 0.10")
  }

  test("d18: span dedup keeps every span of a duplicate-free doc and drops all of an exact dup") {
    val out = Dedup4.d18_span_dedup(spark, sf)
    // every doc appears exactly once
    val docs = Tables.documents(spark, sf)
    assert(out.count() == docs.filter(length(trim(col("text"))) > 0).count())
    // kept spans never exceed total spans; totals reconcile corpus-wide:
    // distinct spans corpus-wide == sum of kept spans (each distinct span
    // survives exactly once)
    val agg = out.agg(sum("n_kept").as("kept")).collect()(0).getLong(0)
    val distinctSpans = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("words"))
      .filter(size(col("words")) > 0)
      .select(explode(expr(
        "transform(sequence(0, CAST(ceil(size(words) / 10.0) AS INT) - 1)," +
          " i -> array_join(slice(words, i * 10 + 1, 10), ' '))")).as("span"))
      .distinct().count()
    assert(agg == distinctSpans,
      s"sum(n_kept)=$agg != distinct spans corpus-wide=$distinctSpans")
    val bad = out.filter(col("n_kept") > col("n_spans")).count()
    assert(bad == 0)
  }
}
