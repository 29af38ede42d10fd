package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall times at the sf dir
  * given by SPARK_GRAFT_SF_DIR. A warmup pass (flagship query + one scan
  * per table) absorbs JVM/codegen/session initialization so the per-query
  * numbers measure engine throughput, not cold-start; queries run in
  * sorted name order for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: table footers/caches, then every query once at the smallest
    // scale factor — Janino/whole-stage compilation is per-plan-shape, so
    // this moves one-time codegen cost out of the timed runs and the
    // reported numbers measure engine throughput.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.read(spark, sfDir, t).count()
    }
    Tables.events(spark, sfDir).count()
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count() } catch { case _: Throwable => }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
