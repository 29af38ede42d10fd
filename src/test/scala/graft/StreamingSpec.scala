package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Drives the streaming plans synchronously: file source -> memory sink,
  * then checks the incremental results against the batch equivalents.
  */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming windowed counts match batch tumbling-window aggregation") {
    val q = streaming.StreamOps.windowedCounts(spark, sf)
      .writeStream.outputMode("append").format("memory")
      .queryName("win_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    // append mode only emits watermark-closed windows; with a bounded file
    // the final windows stay open, so compare the emitted subset.
    val got = spark.table("win_out")
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty, "no windows emitted")
    got.foreach { case (k, n) =>
      assert(batch.get(k).contains(n), s"window $k: stream $n vs batch ${batch.get(k)}")
    }
  }

  test("streaming dedup: no duplicate payload hashes within the watermark") {
    val q = streaming.StreamOps.dedupStream(spark, sf)
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val out = spark.table("dedup_out")
    val n = out.count()
    val distinctHashes = out.select("payload_hash").distinct().count()
    assert(n > 0)
    assert(n == distinctHashes, s"emitted $n rows but $distinctHashes distinct hashes")
    // never more output than input, never fewer than batch-distinct
    val batchDistinct = Tables.events(spark, sf)
      .selectExpr("md5(concat_ws('|', event_type, props)) h")
      .distinct().count()
    assert(n >= batchDistinct, s"$n < batch distinct $batchDistinct")
  }

  test("streaming sessionizer emits sessions consistent with batch q27") {
    val q = streaming.StreamOps.sessionize(spark, sf)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val emitted = spark.table("sess_out").count()
    val batchSessions = operators.Relational2.q27_sessionize(spark, sf).count()
    // append-mode can only emit sessions closed before end-of-stream
    // (still-open sessions stay in state), so emitted <= batch total.
    assert(emitted > 0, "no sessions emitted")
    assert(emitted <= batchSessions)
  }
}
