package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Dev tool (guide §1/§7 substitute for the disabled UI): run named
  * queries at SPARK_GRAFT_SF_DIR and print one line per completed stage
  * — wall time, task count, input/shuffle-read/shuffle-write bytes and
  * records — so the expensive stage of a multi-exchange plan is
  * attributable without the Spark UI. Not part of the driver contract.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    case class Row(id: Int, name: String, ms: Long, tasks: Int,
                   inB: Long, srB: Long, swB: Long, swR: Long)
    val rows = ArrayBuffer.empty[Row]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        val ms = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        rows.synchronized { rows += Row(si.stageId,
          si.name.split("\n").head.take(60), ms, si.numTasks,
          m.inputMetrics.bytesRead, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.shuffleWriteMetrics.recordsWritten) }
      }
    })
    args.foreach { name =>
      // warmup at the smallest SF so codegen/scan setup is excluded
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
      graft.api.GraftOps.releaseCaches(); spark.catalog.clearCache()
      rows.synchronized(rows.clear())
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // listener bus quiesce
      println(f"== $name rows=$c total=$dt%.3f s ==")
      rows.synchronized(rows.sortBy(-_.ms).take(20)).foreach { r =>
        println(f"  stage ${r.id}%4d ${r.ms}%7d ms ${r.tasks}%4d tasks " +
          f"in=${r.inB / 1024}%8d KiB sr=${r.srB / 1024}%8d KiB " +
          f"sw=${r.swB / 1024}%8d KiB swrec=${r.swR}%9d  ${r.name}")
      }
      graft.api.GraftOps.releaseCaches(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
