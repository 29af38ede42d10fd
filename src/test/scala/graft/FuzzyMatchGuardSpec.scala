package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The fuzzy-match optimizer rule must (1) preserve semantics exactly,
  * (2) inject the length guard and the banded (thresholded) Levenshtein
  * into the optimized plan, and (3) be idempotent under the fixpoint
  * batch.
  */
class FuzzyMatchGuardSpec extends AnyFunSuite {
  import SparkTestSession._

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations = Seq(plans.FuzzyMatchGuardRule)
    try body finally spark.experimental.extraOptimizations = Nil
  }

  private def fuzzyPairs = {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    docs.as("a").join(docs.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
          col("a.doc_id") % 50 === 0 && col("b.doc_id") % 50 === 0)
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.text").as("ta"), col("b.text").as("tb"))
      .filter(levenshtein(col("ta"), col("tb")) <= 40)
      .select("da", "db")
  }

  test("rule preserves results and injects guard + banded levenshtein") {
    val baseline = fuzzyPairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule {
      val df = fuzzyPairs
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("abs((length(") || plan.contains("abs((length("),
        s"length guard missing from plan:\n$plan")
      assert(plan.contains("levenshtein(") && plan.contains("Some(40)"),
        s"banded levenshtein missing from plan:\n$plan")
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == baseline)
    }
  }

  test("rule is idempotent (second application is a no-op)") {
    withRule {
      val optimized = fuzzyPairs.queryExecution.optimizedPlan
      val twice = plans.FuzzyMatchGuardRule(optimized)
      assert(twice.fastEquals(optimized), "second application changed the plan")
    }
  }

  test("strict and equality comparisons rewrite correctly") {
    import spark.implicits._
    val df = Seq(("kitten", "sitting"), ("flaw", "lawn"), ("abc", "abc"))
      .toDF("x", "y")
    val lt = df.filter(levenshtein($"x", $"y") < 4).count()
    val eq = df.filter(levenshtein($"x", $"y") === 3).count()
    withRule {
      assert(df.filter(levenshtein($"x", $"y") < 4).count() == lt)
      assert(df.filter(levenshtein($"x", $"y") === 3).count() == eq)
    }
  }
}
