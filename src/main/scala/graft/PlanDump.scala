package graft

import org.apache.spark.sql.SparkSession

/** Explain-audit utility: print the formatted physical plan of one (or
  * several, comma-separated) registered queries at a given sf dir —
  * the evidence half of the bench-noise discipline (isolated best-of-2
  * timings prove the COST, this proves the SHAPE didn't shift under a
  * dependency or optimizer change).
  *
  *   sbt "runMain graft.PlanDump t05_tfidf /root/testdata/sf0.1"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: PlanDump <q1,q2,...> [sfDir]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same escape hatch as Bench: SPARK_GRAFT_CONF="k=v,..." so variant
    // operating points (e.g. graft.neardup.strategy=lsh) dump through
    // the same rig
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        throw new IllegalArgumentException(s"unknown query $n"))
      println(s"===== $n @ $sfDir =====")
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
