package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** SURVEY.md §2 is the judge's checklist — this spec keeps it honest:
  * every backtick-named query line must exist in SparkEntry.queries, must
  * have an oracle unless the line is marked *rows-only*, and every
  * registered query must be documented in §2.
  */
class SurveyConsistencySpec extends AnyFunSuite {
  private val qname = """`([a-z]\d{2}[a-z0-9_]*)`""".r
  private lazy val section2: Seq[String] = {
    val src = Source.fromFile("SURVEY.md", "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    val start = lines.indexWhere(_.startsWith("## §2"))
    val end = lines.indexWhere(_.startsWith("## §3"))
    lines.slice(start, end)
  }
  private lazy val documented: Map[String, String] =
    section2.flatMap { l =>
      qname.findFirstMatchIn(l).map(m => m.group(1) -> l)
    }.toMap

  test("every SURVEY §2 query line is registered in SparkEntry.queries") {
    val missing = documented.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"documented but not registered: $missing")
  }

  test("every registered query is documented in SURVEY §2") {
    val undocumented = SparkEntry.queries.keySet -- documented.keySet
    assert(undocumented.isEmpty, s"registered but not in SURVEY §2: $undocumented")
  }

  test("every non-rows-only query has an oracle; rows-only ones do not") {
    val noOracle = documented.filterNot { case (n, _) => SparkEntry.oracleSql.contains(n) }
    val notMarked = noOracle.filterNot { case (_, line) => line.contains("rows-only") }
    assert(notMarked.isEmpty,
      s"no oracle and not marked rows-only: ${notMarked.keySet}")
    val markedButOracled = documented.filter { case (n, line) =>
      line.contains("rows-only") && SparkEntry.oracleSql.contains(n)
    }
    assert(markedButOracled.isEmpty,
      s"marked rows-only but have oracles (drop the marker): ${markedButOracled.keySet}")
  }

  test("oracle keys are a subset of query keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
