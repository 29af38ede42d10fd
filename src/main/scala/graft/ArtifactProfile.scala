package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Dev tool (guide §1): time the artifact builds piece by piece —
  * dedup trio, BPE training, graph store — with per-stage attribution
  * and the CC round counts, so artifact_build_sec optimization targets
  * the real cost. Not part of the driver contract.
  */
object ArtifactProfile {
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
    case class Row(id: Int, name: String, ms: Long, tasks: Int)
    val rows = ArrayBuffer.empty[Row]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        rows.synchronized {
          rows += Row(si.stageId, si.name.split("\n").head.take(50), ms, si.numTasks)
        }
      }
    })
    // warm the tables + codegen like Bench does
    Seq("customer", "orders", "lineitem", "documents").foreach { t =>
      Tables.read(spark, sfDir, t).count()
    }
    val reps = sys.env.getOrElse("GRAFT_AP_REPS", "2").toInt
    (1 to reps).foreach { rep =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_ap_$rep").toString
      spark.conf.set("graft.dedup.artifacts", dir)
      spark.conf.set("graft.graph.artifacts", s"$dir/graph")
      def timed(label: String)(f: => Unit): Unit = {
        rows.synchronized(rows.clear())
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"== rep$rep $label: $dt%.2f s (ccRounds=${graft.api.GraftOps.lastCcRounds}) ==")
        rows.synchronized(rows.sortBy(-_.ms).take(12)).foreach { r =>
          println(f"   stage ${r.id}%5d ${r.ms}%6d ms ${r.tasks}%4d tasks  ${r.name}")
        }
      }
      timed("dedup trio+bpe")(
        graft.api.DedupArtifactStore.buildFor(spark, sfDir))
      timed("graph store")(
        graft.api.GraphArtifactStore.buildFor(spark, sfDir))
      graft.api.GraftOps.releaseCaches(); spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
