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

  test("streaming fingerprint equals the batch fingerprint bit-for-bit") {
    val q = streaming.StreamOps.fingerprintStream(spark, sf)
      .writeStream.outputMode("complete").format("memory")
      .queryName("fp_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("fp_out").collect()
    assert(got.length == 1)
    val batch = Tables.events(spark, sf)
      .select(expr(
        """conv(substring(md5(concat_ws('|', event_id, event_type, props)),
                1, 15), 16, 10)""")
        .cast("decimal(38,0)").cast("long").as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("f")).collect()(0)
    assert(got(0).getAs[Long]("n_rows") == batch.getAs[Long]("n"))
    assert(got(0).getAs[Long]("fingerprint") == batch.getAs[Long]("f"),
      "stream-accumulated XOR must equal the batch table fingerprint")
  }

  test("streaming e01 windows are BYTE-identical to the oracled batch rows") {
    // not batch-vs-stream "consistency": the emitted window set must
    // equal, value-for-value, the rows of the DuckDB-oracled e01 query
    // restricted to watermark-closed windows (window_end <= max_ts - 2h)
    val q = streaming.StreamOps.windowedCounts(spark, sf)
      .writeStream.outputMode("append").format("memory")
      .queryName("e01_oracle_cmp").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("e01_oracle_cmp")
      .select("window_start", "event_type", "n_events", "total_value")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val maxTs = Tables.events(spark, sf).agg(max("ts")).head().getTimestamp(0)
    val wmMillis = maxTs.getTime - 2L * 3600 * 1000
    val expected = SparkEntry.queries("e01_tumbling_window")(spark, sf)
      .select("window_start", "event_type", "n_events", "total_value")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .filter { case (ws, _, _, _) => ws.getTime + 3600L * 1000 <= wmMillis }
      .toSet
    assert(got.nonEmpty, "no windows emitted")
    assert(got == expected,
      s"stream ${got.size} rows vs oracled-closed ${expected.size}; " +
        s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("streaming sessionizer output rows are BYTE-identical to oracled e09 rows") {
    // every emitted (closed) session must appear verbatim — same rounded
    // value — in the DuckDB-oracled e09 output; closure is decided by the
    // final watermark, so emitted ⊆ e09 with byte equality per row, and
    // every e09 session that provably closed must have been emitted
    val q = streaming.StreamOps.sessionize(spark, sf)
      .writeStream.outputMode("append").format("memory")
      .queryName("e09_oracle_cmp").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("e09_oracle_cmp")
      .select(col("user_id"), col("session_start"),
        col("n_events").cast("long").as("n_events"),
        round(col("session_value"), 4).as("session_value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val e09 = SparkEntry.queries("e09_session_window")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got.nonEmpty, "no sessions emitted")
    val extras = got -- e09
    assert(extras.isEmpty,
      s"${extras.size} streamed sessions not byte-present in the oracled e09 rows: ${extras.take(3)}")
    // completeness: every session that PROVABLY closed must have been
    // emitted — closed means a later same-user session exists (in-batch
    // closure) or the event-time timeout fired (end + 30min <= final
    // watermark = max_ts - 2h). Squeezed between this floor and the
    // e09 ⊇ got ceiling, a sessionizer that silently drops sessions
    // cannot pass.
    val ev = Tables.events(spark, sf)
    val maxTsMs = ev.agg(max("ts")).head().getTimestamp(0).getTime
    val wmMs = maxTsMs - 2L * 3600 * 1000
    val sessions = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        graft.Stable.dsum(col("value")).as("session_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"),
        round(col("session_value"), 4).as("session_value"))
      .collect()
    val lastStartByUser = sessions.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getTimestamp(1).getTime).max).toMap
    val mustEmit = sessions.filter { r =>
      val closedInBatch =
        r.getTimestamp(1).getTime < lastStartByUser(r.getLong(0))
      // session_window end = last event + gap; timeout fires at end
      val closedByTimeout = r.getTimestamp(2).getTime <= wmMs
      closedInBatch || closedByTimeout
    }.map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3), r.getDouble(4))).toSet
    val missing = mustEmit -- got
    assert(missing.isEmpty,
      s"${missing.size} provably-closed sessions were not emitted: ${missing.take(3)}")
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

  test("streaming near-dup pairs equal batch jaccardJoinBanded (d06 operating point)") {
    val q = streaming.StreamOps.nearDupPairsStream(spark, sf, 0.5)
      .writeStream.outputMode("append").format("memory")
      .queryName("neardup_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e12))
    val got = spark.table("neardup_out")
      .select("id_a", "id_b", "shared", "jaccard")
      .collect().map(key).toSet
    val want = api.GraftOps.jaccardJoinBanded(
        Tables.documents(spark, sf), col("doc_id"), col("text"), 0.5)
      .select("id_a", "id_b", "shared", "jaccard")
      .collect().map(key).toSet
    assert(want.nonEmpty, "corpus must contain banded near-dup pairs")
    assert(got == want,
      s"stream != batch: only-stream=${(got -- want).take(3)} " +
        s"only-batch=${(want -- got).take(3)}")
    // no pair is emitted twice (the first-colliding-band emit-once trick)
    val n = spark.table("neardup_out").count()
    assert(n == got.size, s"$n emissions for ${got.size} distinct pairs")
    api.GraftOps.releaseCaches(); spark.catalog.clearCache()
  }

  test("bounded near-dup: horizon-windowed pairs equal batch; stale bucket members age out") {
    // three arrival waves: near-dups WITHIN the 30-minute horizon must
    // pair, a textual near-dup arriving 2 hours later must NOT — and
    // once the watermark passes wave-1's horizon the state store
    // shrinks (EventTimeTimeout eviction, the sessionize discipline)
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_nddstream").toString
    def words(seed: Int, n: Int): String =
      (0 until n).map(i => s"w${(i * 2654435761L + seed) % 97}")
        .mkString(" ")
    val base = words(0, 40)
    val tweak = base.split(" ").updated(5, "CHANGED").mkString(" ")
    val tweak2 = base.split(" ").updated(9, "OTHER").mkString(" ")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(minutes: Int) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val wave1 = Seq((1L, base, at(0)), (2L, tweak, at(1)),
      (3L, words(500, 40), at(2)), (4L, words(900, 40), at(3)))
    val wave2 = Seq((5L, tweak2, at(10)), (6L, words(1300, 40), at(11)))
    val wave3 = Seq((7L, base.split(" ").updated(2, "LATE").mkString(" "),
      at(120)), (8L, words(1700, 40), at(121)))
    def write(wave: Seq[(Long, String, java.sql.Timestamp)], n: Int): Unit =
      wave.toDF("doc_id", "text", "ts").coalesce(1)
        .write.mode("append").parquet(s"$dir/docs")
    write(wave1, 1)
    val horizonMs = 30L * 60000
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/docs")
    val q = streaming.StreamOps.nearDupPairsBoundedStream(
        src, "doc_id", "text", "ts", horizonMs,
        watermarkDelay = "0 seconds", threshold = 0.5)
      .writeStream.outputMode("append").format("memory")
      .queryName("ndd_out").start()
    try {
      q.processAllAvailable()
      write(wave2, 2); q.processAllAvailable()
      write(wave3, 3); q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e12))
    val got = spark.table("ndd_out")
      .select("id_a", "id_b", "shared", "jaccard")
      .collect().map(key).toSet
    // batch oracle: jaccardJoinBanded restricted to the horizon window
    val all = (wave1 ++ wave2 ++ wave3).toDF("doc_id", "text", "ts")
    val ts = all.select("doc_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    val want = api.GraftOps.jaccardJoinBanded(
        all, col("doc_id"), col("text"), 0.5)
      .select("id_a", "id_b", "shared", "jaccard")
      .collect().map(key)
      .filter(p => math.abs(ts(p._1) - ts(p._2)) <= horizonMs).toSet
    assert(want.nonEmpty, "fixture must contain in-horizon pairs")
    assert(want.exists(p => p._1 == 1L && p._2 == 5L),
      "cross-wave in-horizon pair (1,5) must be in the oracle")
    // and the out-of-horizon textual near-dup is NOT a pair
    assert(!got.exists(p => p._2 == 7L && p._1 <= 2L),
      "a near-dup arriving past the horizon must not pair")
    assert(got == want,
      s"stream != horizon-batch: only-stream=${(got -- want).take(3)} " +
        s"only-batch=${(want -- got).take(3)}")
    // eviction observable in the state store: the final progress holds
    // fewer state rows than the high-water mark (wave-1/2 groups aged
    // out once the watermark passed their horizon)
    val rows = q.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      .map(_.numRowsTotal)
    assert(rows.nonEmpty && rows.last < rows.max,
      s"state must shrink after eviction: $rows")
    api.GraftOps.releaseCaches(); spark.catalog.clearCache()
  }

  test("KMV sketch aggregates incrementally: streaming windows equal batch") {
    val q = streaming.StreamOps.sketchedDistinct(spark, sf)
      .writeStream.outputMode("append").format("memory")
      .queryName("kmv_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("kmv_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(got.nonEmpty, "no closed windows emitted")
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(graft.functions.kmv_distinct(col("user_id"), 64).as("kmv"),
        count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"),
        col("kmv.est_distinct"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    got.foreach { case (k, v) =>
      assert(batch.get(k).contains(v),
        s"window $k: streaming sketch $v vs batch ${batch.get(k)}")
    }
  }

  test("streaming quality gate: lane assignment equals the batch computation") {
    val q = streaming.StreamOps.qualityGate(spark, sf)
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("gate_out").groupBy("lane").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Tables.documents(spark, sf)
      .withColumn("byte_len", length(encode(col("text"), "UTF-8")).cast("long"))
      .withColumn("n_words", size(split(trim(col("text")), " ")).cast("long"))
      .withColumn("quality",
        lit(0.5) * least(lit(1.0), col("n_words").cast("double") / 100.0)
          + lit(0.5) * (length(regexp_replace(col("text"), "[^A-Za-z0-9]", ""))
            .cast("double") / length(col("text"))))
      .withColumn("lane",
        when(col("byte_len") % 251 === 0, "quarantine")
          .when(col("quality") < 0.6, "low_quality")
          .otherwise("keep"))
      .groupBy("lane").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got.values.sum == Tables.documents(spark, sf).count())
  }

  test("windowed SpaceSaving top-k: closed streaming windows equal batch") {
    val q = streaming.StreamOps.windowedTopK(spark, sf)
      .writeStream.outputMode("append").format("memory")
      .queryName("topk_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("topk_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty, "no closed windows emitted")
    import spark.implicits._
    val topkCol = new graft.functions.TopKItems(3, 64).toColumn
    val batch = Tables.events(spark, sf)
      .select(window(col("ts"), "6 hours").getField("start").as("ws"),
        col("event_type"))
      .as[(java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(topkCol.name("topk"))
      .flatMap { case (ws, m) => m.map { case (t, n) => (ws, t, n) } }
      .collect().map { case (ws, t, n) => (ws, t) -> n }.toMap
    got.foreach { case (k, n) =>
      assert(batch.get(k).contains(n), s"$k: stream $n vs batch ${batch.get(k)}")
    }
  }

  test("stream-stream interval join matches the batch range join") {
    val q = streaming.StreamOps.purchaseViewJoin(spark, sf)
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("ssj_out").count()
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
    val batch = p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")).count()
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed > 0)
  }

  test("foreachBatch sink writes each micro-batch to parquet") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val q = streaming.StreamOps.windowedCounts(spark, sf)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("append").parquet(s"$outDir/agg")
      }
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    val written = spark.read.parquet(s"$outDir/agg").count()
    assert(written > 0)
  }

  test("streaming CDC upsert: exactly-once into the snapshot table across a restart replay") {
    import graft.sources.SnapshotTable
    val base = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val table = s"$base/table"
    val ckpt1 = s"$base/ckpt1"
    // seed: an empty table with the target per-user schema
    val seed = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "user_id BIGINT, last_type STRING, last_ts TIMESTAMP, last_value DOUBLE"))
    SnapshotTable.create(seed, table)

    val q1 = streaming.StreamOps.cdcUpsertStream(spark, sf, table, ckpt1, "cdc-e2e")
    try q1.awaitTermination() finally q1.stop()
    val vAfter = SnapshotTable.latestVersion(spark, table)
    val got = SnapshotTable.read(spark, table)

    // final table == the batch latest-per-user computation, bit for bit
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val want = Tables.events(spark, sf)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .select(col("user_id"), col("event_type").as("last_type"),
        col("ts").as("last_ts"), col("value").as("last_value"))
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // "restart" with a WIPED checkpoint: every batch replays with the
    // same batch ids — the txn watermark must skip them all, leaving
    // version and data untouched (this is the at-least-once -> exactly-
    // once conversion the manifest watermark buys)
    val q2 = streaming.StreamOps.cdcUpsertStream(spark, sf, table,
      s"$base/ckpt2", "cdc-e2e")
    try q2.awaitTermination() finally q2.stop()
    assert(SnapshotTable.latestVersion(spark, table) == vAfter)
    val got2 = SnapshotTable.read(spark, table)
    assert(got2.exceptAll(want).isEmpty && want.exceptAll(got2).isEmpty)
  }

  test("CDC fan-out: one stream into SnapshotTable + Delta + Hudi, wiped-checkpoint replay bit-identical on all three") {
    import graft.sources.{DeltaWrite, HudiRead, HudiWrite, SnapshotTable}
    val base = java.nio.file.Files
      .createTempDirectory("graft_fanout").toString
    val (snapT, deltaT, hudiT) =
      (s"$base/snap", s"$base/delta", s"$base/hudi")
    val seed = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "user_id BIGINT, last_type STRING, last_ts_us BIGINT, " +
          "last_value DOUBLE"))
    SnapshotTable.create(seed, snapT)
    DeltaWrite.create(seed, deltaT)
    HudiWrite.create(seed, hudiT, "user_id", "", "MERGE_ON_READ")

    val q1 = streaming.StreamOps.cdcFanoutStream(spark, sf, snapT,
      deltaT, hudiT, s"$base/ckpt1", "fanout-e2e")
    try q1.awaitTermination() finally q1.stop()

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val want = Tables.events(spark, sf)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .select(col("user_id"), col("event_type").as("last_type"),
        expr("unix_micros(ts)").as("last_ts_us"),
        col("value").as("last_value"))
    val ordered = Seq("user_id", "last_type", "last_ts_us", "last_value")
    def same(df: org.apache.spark.sql.DataFrame, leg: String): Unit = {
      val g = df.select(ordered.map(col): _*)
      assert(g.count() == want.count() && g.count() > 0, leg)
      assert(g.exceptAll(want).isEmpty && want.exceptAll(g).isEmpty,
        s"$leg diverged from the batch latest-per-user oracle")
    }
    same(SnapshotTable.read(spark, snapT), "snapshot")
    same(sources.DeltaRead.read(spark, deltaT), "delta")
    same(HudiRead.read(spark, hudiT), "hudi")
    val (vSnap, vDelta) = (SnapshotTable.latestVersion(spark, snapT),
      sources.DeltaRead.latestVersion(spark, deltaT))
    val hudiInstants = new java.io.File(hudiT, ".hoodie").listFiles()
      .map(_.getName).filter(_.endsWith(".deltacommit")).sorted.toSeq

    // wiped checkpoint: every batch replays — EACH leg's own
    // transaction watermark must detect and skip, leaving all three
    // tables (and their timelines) untouched
    val q2 = streaming.StreamOps.cdcFanoutStream(spark, sf, snapT,
      deltaT, hudiT, s"$base/ckpt2", "fanout-e2e")
    try q2.awaitTermination() finally q2.stop()
    assert(SnapshotTable.latestVersion(spark, snapT) == vSnap,
      "snapshot leg must not re-apply replayed batches")
    assert(sources.DeltaRead.latestVersion(spark, deltaT) == vDelta,
      "delta leg must not re-apply replayed batches")
    assert(new java.io.File(hudiT, ".hoodie").listFiles()
      .map(_.getName).filter(_.endsWith(".deltacommit")).sorted.toSeq
      == hudiInstants, "hudi leg must not re-apply replayed batches")
    same(SnapshotTable.read(spark, snapT), "snapshot-replay")
    same(sources.DeltaRead.read(spark, deltaT), "delta-replay")
    same(HudiRead.read(spark, hudiT), "hudi-replay")
  }

  test("streaming CDC apply with DELETES: tombstones land atomically, exactly-once") {
    import graft.sources.SnapshotTable
    val base = java.nio.file.Files.createTempDirectory("graft_cdcd").toString
    val table = s"$base/table"
    val seed = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "user_id BIGINT, last_type STRING, last_ts TIMESTAMP, last_value DOUBLE"))
    SnapshotTable.create(seed, table)
    val q1 = streaming.StreamOps.cdcApplyStream(spark, sf, table,
      s"$base/ckpt1", "cdcd-e2e")
    try q1.awaitTermination() finally q1.stop()
    val vAfter = SnapshotTable.latestVersion(spark, table)
    val got = SnapshotTable.read(spark, table)
    // batch semantics: per user, last event wins; last=purchase => row
    // deleted (tombstone), else upserted with the latest values
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val latest = Tables.events(spark, sf)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val want = latest.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_type").as("last_type"),
        col("ts").as("last_ts"), col("value").as("last_value"))
    val nTombstoned = latest.filter(col("event_type") === "purchase").count()
    assert(nTombstoned > 0, "corpus must exercise the delete lane")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // wiped checkpoint: replayed batch ids are skipped via the txn
    // watermark — deletes are not re-applied, version unchanged
    val q2 = streaming.StreamOps.cdcApplyStream(spark, sf, table,
      s"$base/ckpt2", "cdcd-e2e")
    try q2.awaitTermination() finally q2.stop()
    assert(SnapshotTable.latestVersion(spark, table) == vAfter)
    val got2 = SnapshotTable.read(spark, table)
    assert(got2.exceptAll(want).isEmpty && want.exceptAll(got2).isEmpty)
  }

  test("deltaAppendStream: exactly-once into the open format, wiped checkpoint changes nothing") {
    import sources.{DeltaRead, DeltaWrite}
    val base = java.nio.file.Files.createTempDirectory("graft_das")
    val table = s"$base/t"
    val q1 = streaming.StreamOps.deltaAppendStream(spark, sf, table,
      s"$base/ckpt1", "das-e2e")
    try q1.awaitTermination() finally q1.stop()
    val want = Tables.events(spark, sf).count()
    val got = DeltaRead.read(spark, table)
    assert(got.count() == want && got.count() > 0)
    val vAfter = DeltaRead.latestVersion(spark, table)
    // restart with a WIPED checkpoint: every batch replays with the
    // same ids — the protocol txn watermark skips them all
    val q2 = streaming.StreamOps.deltaAppendStream(spark, sf, table,
      s"$base/ckpt2", "das-e2e")
    try q2.awaitTermination() finally q2.stop()
    assert(DeltaRead.latestVersion(spark, table) == vAfter,
      "wiped-checkpoint replay must not commit")
    assert(DeltaRead.read(spark, table).count() == want)
  }

  test("icebergAppendStream: exactly-once into Iceberg, wiped checkpoint changes nothing") {
    import sources.{IcebergRead, IcebergWrite}
    val base = java.nio.file.Files.createTempDirectory("graft_ias")
    val table = s"$base/t"
    val q1 = streaming.StreamOps.icebergAppendStream(spark, sf, table,
      s"$base/ckpt1", "ias-e2e")
    try q1.awaitTermination() finally q1.stop()
    val want = Tables.events(spark, sf).count()
    val got = IcebergRead.read(spark, table)
    assert(got.count() == want && got.count() > 0)
    val markAfter = IcebergWrite.lastTxn(spark, table, "ias-e2e")
    assert(markAfter >= 0, "the properties watermark must be stamped")
    val metaCount = new java.io.File(s"$table/metadata").listFiles()
      .count(_.getName.endsWith(".metadata.json"))
    // restart with a WIPED checkpoint: every batch replays with the
    // same ids — the properties watermark skips them all
    val q2 = streaming.StreamOps.icebergAppendStream(spark, sf, table,
      s"$base/ckpt2", "ias-e2e")
    try q2.awaitTermination() finally q2.stop()
    assert(new java.io.File(s"$table/metadata").listFiles()
      .count(_.getName.endsWith(".metadata.json")) == metaCount,
      "wiped-checkpoint replay must not commit")
    assert(IcebergRead.read(spark, table).count() == want)
    // the watermark survives snapshot EXPIRATION (it lives in table
    // properties, not in a snapshot summary)
    IcebergWrite.expireSnapshots(spark, table, keepLast = 1)
    assert(IcebergWrite.lastTxn(spark, table, "ias-e2e") == markAfter,
      "expireSnapshots must not drop the exactly-once watermark")
    assert(IcebergRead.read(spark, table).count() == want)
  }

  test("hudiInsertStream: exactly-once into Hudi COW, wiped checkpoint changes nothing") {
    import sources.HudiRead
    val base = java.nio.file.Files.createTempDirectory("graft_hes")
    val table = s"$base/t"
    val q1 = streaming.StreamOps.hudiInsertStream(spark, sf, table,
      s"$base/ckpt1", "hes-e2e", "event_id")
    try q1.awaitTermination() finally q1.stop()
    val want = Tables.events(spark, sf).count()
    assert(HudiRead.read(spark, table).count() == want && want > 0)
    val commits = new java.io.File(s"$table/.hoodie").listFiles()
      .count(_.getName.endsWith(".commit"))
    // restart with a WIPED checkpoint: every batch replays with the
    // same ids — the extraMetadata watermark skips them all
    val q2 = streaming.StreamOps.hudiInsertStream(spark, sf, table,
      s"$base/ckpt2", "hes-e2e", "event_id")
    try q2.awaitTermination() finally q2.stop()
    assert(new java.io.File(s"$table/.hoodie").listFiles()
      .count(_.getName.endsWith(".commit")) == commits,
      "wiped-checkpoint replay must not commit")
    assert(HudiRead.read(spark, table).count() == want)
  }

  test("hudiUpsertStream: exactly-once MOR log-upserts, wiped checkpoint leaves table bit-identical") {
    import sources.HudiRead
    val base = java.nio.file.Files.createTempDirectory("graft_hus")
    val table = s"$base/t"
    val q1 = streaming.StreamOps.hudiUpsertStream(spark, sf, table,
      s"$base/ckpt1", "hus-e2e")
    try q1.awaitTermination() finally q1.stop()
    val wantUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    val got = HudiRead.read(spark, table)
    assert(got.count() == wantUsers && wantUsers > 0,
      "one merged row per user after log-upserts")
    def fingerprint(): (Seq[String], Seq[String]) = {
      def walk(d: java.io.File): Seq[java.io.File] =
        d.listFiles().toSeq.flatMap(f =>
          if (f.isDirectory) walk(f) else Seq(f))
      val files = walk(new java.io.File(table))
        .filterNot(_.getName.endsWith(".crc"))
        .map(f => s"${f.getName}:${f.length()}").sorted
      val rows = HudiRead.read(spark, table).collect()
        .map(_.toString).sorted.toSeq
      (files, rows)
    }
    val before = fingerprint()
    // restart with a WIPED checkpoint: every batch replays with the
    // same ids — the deltacommit extraMetadata watermark skips them all
    val q2 = streaming.StreamOps.hudiUpsertStream(spark, sf, table,
      s"$base/ckpt2", "hus-e2e")
    try q2.awaitTermination() finally q2.stop()
    assert(fingerprint() == before,
      "wiped-checkpoint replay must leave the table bit-identical")
  }

  test("hudiUpsertStreamOf: the general MOR sink on a SECOND schema, exactly-once") {
    import sources.HudiRead
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft_hus2")
    val src = s"$base/src"
    val table = s"$base/t"
    // sensor-reading schema — nothing like the events table
    spark.range(0, 30).select((col("id") % 10).as("sensor"),
      (col("id") * 2).as("reading"), col("id").as("seq"))
      .coalesce(2).write.parquet(src)
    val schema = StructType(Seq(StructField("sensor", LongType),
      StructField("reading", LongType), StructField("seq", LongType)))
    def run(ckpt: String) = {
      val q = streaming.StreamOps.hudiUpsertStreamOf(
        spark.readStream.schema(schema).parquet(src), table,
        s"$base/$ckpt", "hus2-e2e", keyCol = "sensor",
        orderBy = Seq(col("seq").desc))
      try q.awaitTermination() finally q.stop()
    }
    run("ckpt1")
    val got = HudiRead.read(spark, table)
    assert(got.count() == 10, "one merged row per sensor")
    // latest seq for sensor 3 is 23 → reading 46
    assert(got.filter(col("sensor") === 3).head()
      .getAs[Long]("reading") == 46L)
    val rowsBefore = got.collect().map(_.toString).sorted.toSeq
    val filesBefore = new java.io.File(s"$table/.hoodie").listFiles()
      .map(_.getName).sorted.toSeq
    // wiped checkpoint: replay detected, table bit-identical
    run("ckpt2")
    assert(new java.io.File(s"$table/.hoodie").listFiles()
      .map(_.getName).sorted.toSeq == filesBefore)
    assert(HudiRead.read(spark, table).collect()
      .map(_.toString).sorted.toSeq == rowsBefore)
  }

  test("deltaForgetStream: exactly-once streaming right-to-be-forgotten, replays never over-delete") {
    import sources.{DeltaRead, DeltaWrite}
    val base = java.nio.file.Files.createTempDirectory("graft_forget")
    val table = s"$base/t"
    val src = s"$base/keys"
    DeltaWrite.create(spark.range(0, 100).selectExpr("id AS k",
      "concat('u', id) AS name").coalesce(1), table)
    val dataBefore = new java.io.File(table).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).toSet
    // the forget queue: two parquet drops of key tuples
    spark.range(10, 15).selectExpr("id AS k").coalesce(1)
      .write.parquet(src)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    def run(ckpt: String) = {
      val q = streaming.StreamOps.deltaForgetStream(
        spark.readStream.schema(schema).parquet(src), table,
        s"$base/$ckpt", "forget-e2e", Seq("k"))
      try q.awaitTermination() finally q.stop()
    }
    run("ckpt1")
    assert(DeltaRead.read(spark, table).count() == 95)
    assert(new java.io.File(table).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).toSet == dataBefore,
      "the forget stream must never rewrite data files")
    // a previously-forgotten key is RE-INSERTED after the stream ran…
    DeltaWrite.append(spark.range(12, 13).selectExpr("id AS k",
      "concat('new', id) AS name").coalesce(1), table)
    assert(DeltaRead.read(spark, table).count() == 96)
    // …and a wiped-checkpoint replay of the SAME batches must NOT
    // delete it: replay detection is batch identity
    run("ckpt2")
    assert(DeltaRead.read(spark, table).count() == 96,
      "a replayed forget batch must not re-delete re-inserted keys")
    // a NEW forget drop picks it up through a fresh batch
    spark.range(12, 13).selectExpr("id AS k").coalesce(1)
      .write.mode("append").parquet(src)
    run("ckpt1") // same checkpoint: only the new file forms a batch
    assert(DeltaRead.read(spark, table).count() == 95)
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

  test("AvailableNow ingest: exactly-once across restarts as files land") {
    val base = java.nio.file.Files.createTempDirectory("graft_incr")
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    val docs = Tables.documents(spark, sf)
    try {
      // night 1: first drop lands, ingest runs and stops
      docs.filter(col("doc_id") % 2 === 0)
        .write.parquet(s"$src/drop1")
      val q1 = streaming.StreamOps.incrementalIngest(spark, src, out, ckpt)
      q1.awaitTermination()
      val afterNight1 = spark.read.parquet(out).count()
      assert(afterNight1 == docs.filter(col("doc_id") % 2 === 0).count())
      // night 2: second drop lands, a NEW run resumes from the checkpoint
      docs.filter(col("doc_id") % 2 === 1)
        .write.parquet(s"$src/drop2")
      val q2 = streaming.StreamOps.incrementalIngest(spark, src, out, ckpt)
      q2.awaitTermination()
      val finalRows = spark.read.parquet(out)
      // every doc exactly once: drop1 was NOT reprocessed
      assert(finalRows.count() == docs.count())
      assert(finalRows.select("doc_id").distinct().count() == docs.count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    }
  }

  test("socket source smoke: live TCP push drives the same transform surface") {
    // The message-bus story's third leg (see StreamOps scaladoc): a live
    // push source with zero file involvement. A local server socket
    // stands in for the tap; the transform (parse + filter + projection)
    // is the same source-agnostic surface the file / V2 micro-batch
    // streams use. Socket streams have no offsets — smoke only.
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val lines = (1 to 20).map(i => s"evt,$i,${i * 10}")
    val writer = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      lines.foreach(out.println)
      out.flush()
      // keep the connection open until the query is done reading; the
      // main thread closes the server which unblocks this socket
      try Thread.sleep(30000) catch { case _: InterruptedException => }
      sock.close()
    })
    writer.setDaemon(true)
    writer.start()
    val q = streaming.StreamOps
      .readSocket(spark, "127.0.0.1", server.getLocalPort)
      .select(split(col("value"), ",").as("f"))
      .select(col("f").getItem(0).as("kind"),
        col("f").getItem(1).cast("long").as("id"),
        col("f").getItem(2).cast("long").as("v"))
      .filter(col("id") % 2 === 0)
      .writeStream.outputMode("append").format("memory")
      .queryName("socket_smoke").start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      def n(): Long = spark.table("socket_smoke").count()
      while (n() < 10 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(n() == 10, s"expected 10 even-id rows, got ${n()}")
      val sum = spark.table("socket_smoke").agg(sum_distinct(col("v")))
        .head().getLong(0)
      assert(sum == (2 to 20 by 2).map(_ * 10).sum,
        "socket rows mangled in transform")
    } finally {
      q.stop()
      writer.interrupt()
      server.close()
    }
  }

  test("stream-static dim enrichment matches the batch broadcast join") {
    val q = streaming.StreamOps.enrichWithDim(spark, sf)
      .select("event_id", "user_id", "c_mktsegment")
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("enrich_out")
    val batch = Tables.events(spark, sf).select("event_id", "user_id")
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment")),
        Seq("user_id"), "left")
    assert(got.count() == batch.count(), "row count drift vs batch join")
    val mismatched = got.as("g").join(batch.as("b"), Seq("event_id"))
      .where(not(col("g.c_mktsegment") <=> col("b.c_mktsegment"))).count()
    assert(mismatched == 0, s"$mismatched enriched rows differ from batch")
  }
}
