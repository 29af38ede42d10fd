package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: total shuffle write bytes + records for each named query at
  * SPARK_GRAFT_SF_DIR — the measurement behind key-width claims (e.g.
  * the 128-bit gram-key swap: 16-byte keys vs ~40-byte gram strings).
  * Not part of the driver contract.
  */
object ShuffleBytes {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val recs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        recs.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
    })
    args.foreach { name =>
      bytes.set(0); recs.set(0)
      SparkEntry.queries(name)(spark, sfDir).count()
      // listener events are async; a short quiesce keeps the tallies
      // complete without reaching into Spark's private listener bus
      Thread.sleep(1000)
      println(f"SHUFFLE $name%-24s ${bytes.get}%12d bytes  ${recs.get}%10d records  " +
        f"${bytes.get.toDouble / math.max(1, recs.get)}%8.1f B/rec")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
