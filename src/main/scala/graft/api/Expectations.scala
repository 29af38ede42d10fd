package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over any frame — the validation
  * verb an ETL framework ships alongside its transforms.
  *
  * Every rule compiles to one conditional aggregate, so an arbitrarily
  * long suite evaluates in a SINGLE pass over a SINGLE scan (one row of
  * wide aggregates, unpivoted to the report) — at 100 TB the rule count
  * costs nothing, only the scan does. Uniqueness folds into the same
  * pass as `count(*) - count(distinct struct(...))`.
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** Column must never be null. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }
  /** Numeric column within [lo, hi] (nulls don't violate — add NotNull). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($col,$lo,$hi)"
  }
  /** String column matches the anchored regex (nulls don't violate). */
  final case class Matches(col: String, regex: String) extends Rule {
    def name = s"matches($col)"
  }
  /** Column tuple is unique across the frame. */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Arbitrary row predicate that must hold on every row. */
  final case class Satisfies(name0: String, predicate: Column) extends Rule {
    def name = s"satisfies($name0)"
  }

  /** Violation count for one rule, as an aggregate Column. */
  private def violations(r: Rule): Column = r match {
    case NotNull(c) => count(when(col(c).isNull, 1))
    case InRange(c, lo, hi) =>
      count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1))
    case Matches(c, re) =>
      count(when(col(c).isNotNull && !col(c).rlike(re), 1))
    case Unique(cs) =>
      (count(lit(1)) - countDistinct(struct(cs.map(col): _*))).cast("long")
    case Satisfies(_, p) => count(when(!coalesce(p, lit(false)), 1))
  }

  /** One-pass report: (rule, n_rows, violations, pass) per rule. */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case (r, i) => violations(r).as(s"__v$i") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.zipWithIndex.map { case (r, i) =>
      s"'${r.name.replace("'", "''")}', __v$i"
    }.mkString(", ")
    wide.select(col("__n"),
      expr(s"stack(${rules.size}, $stacked) AS (rule, violations)"))
      .select(col("rule"), col("__n").cast("long").as("n_rows"),
        col("violations").cast("long").as("violations"),
        (col("violations") === 0).as("pass"))
  }

  /** Name→SQL-predicate rule map entry point (ordered, so the report is
    * deterministic): the py4j/JSON-friendly surface — every rule kind is
    * expressible as a Satisfies predicate, and a plain LinkedHashMap
    * crosses the Python bridge with zero case-class plumbing.
    */
  def evaluateSql(df: DataFrame,
                  rules: java.util.LinkedHashMap[String, String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    evaluate(df, rules.entrySet().asScala.toSeq.map(e =>
      Satisfies(e.getKey, expr(e.getValue))))
  }

  /** Throws (with the failing report) unless every rule passes — the
    * gate a pipeline calls between stages.
    */
  def assertAll(df: DataFrame, rules: Seq[Rule]): Unit = {
    val failed = evaluate(df, rules).filter(!col("pass")).collect()
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "expectations failed: " + failed.map(r =>
          s"${r.getString(0)} (${r.getLong(2)} violations)").mkString("; "))
  }
}
