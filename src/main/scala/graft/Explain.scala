package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: for each query name given as an arg, print wall time
  * and (with -v) the formatted physical plan at SPARK_GRAFT_SF_DIR.
  * Development tool for the explain-audit loop — not part of the driver
  * contract.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val verbose = args.contains("-v")
    val names = args.filterNot(_ == "-v")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = if (names.nonEmpty) names.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // warmup pass at the smallest sf so timings exclude codegen/session init
    qs.foreach { n =>
      try { SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count() }
      catch { case e: Throwable => println(s"WARMFAIL $n: ${e.getMessage}") }
    }
    qs.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t0 = System.nanoTime()
      val c = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TIME $n%-24s $dt%8.3f s   rows=$c")
      if (verbose) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExtendedMode))
    }
    spark.stop()
  }
}
