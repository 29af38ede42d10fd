package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The graft-blackhole DataSourceV2 sink: commit-protocol row/byte
  * accounting, any-schema acceptance, overwrite mode.
  */
class MetricsSinkSpec extends AnyFunSuite {
  import SparkTestSession._

  test("committed totals equal the written row count") {
    val src = Tables.orders(spark, sf)
    val n = src.count()
    src.write.format("graft-blackhole").option("name", "orders_run")
      .mode("append").save()
    val c = sources.MetricsSink.result("orders_run").get
    assert(c.rows == n)
    assert(c.bytes > 0, "UnsafeRow sizes should accumulate")
    assert(c.tasks > 0)
  }

  test("one commit message per input partition") {
    val src = Tables.customer(spark, sf).repartition(7)
    src.write.format("graft-blackhole").option("name", "parts_run")
      .mode("append").save()
    val c = sources.MetricsSink.result("parts_run").get
    assert(c.tasks == 7)
    assert(c.rows == src.count())
  }

  test("accepts any schema including nested/array columns") {
    val df = spark.range(100)
      .select(col("id"), array(col("id"), col("id") * 2).as("arr"),
        struct(col("id").as("a"), lit("x").as("b")).as("st"))
    df.write.format("graft-blackhole").option("name", "nested_run")
      .mode("append").save()
    assert(sources.MetricsSink.result("nested_run").get.rows == 100)
  }

  test("overwrite mode truncates (no-op) and still accounts") {
    val df = spark.range(50).toDF("v")
    df.write.format("graft-blackhole").option("name", "ow_run")
      .mode("overwrite").save()
    assert(sources.MetricsSink.result("ow_run").get.rows == 50)
  }

  test("synth source -> blackhole sink round trip (pure V2 pipeline)") {
    val df = spark.read.format("graft-synth")
      .option("rows", 2000).option("partitions", 8).load()
      .filter(col("doc_id") >= 500)
    df.write.format("graft-blackhole").option("name", "v2_pipe")
      .mode("append").save()
    val c = sources.MetricsSink.result("v2_pipe").get
    assert(c.rows == 1500)
    assert(c.tasks == 6, "filter pushdown should have pruned to 6 partitions")
  }
}
