package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

/** Every SparkEntry query must plan and execute at sf0.001; targeted
  * assertions cover the semantics the DuckDB oracle can't (approx ops).
  */
class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes (non-negative row count)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name returned negative count?!")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q30 approx_count_distinct within 5% of exact") {
    import org.apache.spark.sql.functions._
    val approx = operators.Relational2.q30_hll_distinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, n) =>
      val a = approx(flag)
      assert(math.abs(a - n).toDouble / n <= 0.05, s"$flag: approx $a vs exact $n")
    }
  }

  test("q26 hash sample is ~2/16 of the table and deterministic") {
    val a = operators.Relational2.q26_hash_sample(spark, sf).count()
    val b = operators.Relational2.q26_hash_sample(spark, sf).count()
    assert(a == b)
    val total = Tables.orders(spark, sf).count()
    val frac = a.toDouble / total
    assert(frac > 0.06 && frac < 0.20, s"sample fraction $frac out of range")
  }

  test("q27 sessionization: session count bounded by event count") {
    val sessions = operators.Relational2.q27_sessionize(spark, sf).count()
    val events = Tables.events(spark, sf).count()
    assert(sessions > 0 && sessions <= events)
  }
}
