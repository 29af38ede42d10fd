package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The transactional snapshot table: ACID-by-manifest-swap semantics —
  * upserts apply atomically, every version stays readable, concurrent
  * commits of the same version lose cleanly.
  */
class SnapshotTableSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.sources.SnapshotTable

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_snap").toString + "/t"

  test("create / append / time travel: every version readable, appends reuse segments") {
    val path = tmp()
    val v1df = spark.range(0, 100).select(col("id"), (col("id") % 7).as("v"))
    assert(SnapshotTable.create(v1df, path) == 1)
    assert(SnapshotTable.read(spark, path).count() == 100)

    val v2df = spark.range(100, 150).select(col("id"), (col("id") % 7).as("v"))
    assert(SnapshotTable.append(v2df, path) == 2)
    assert(SnapshotTable.read(spark, path).count() == 150)
    // time travel: v1 unchanged
    assert(SnapshotTable.read(spark, path, version = 1).count() == 100)
    // schema mismatch refuses
    intercept[IllegalArgumentException] {
      SnapshotTable.append(spark.range(3).select(col("id").as("other")), path)
    }
  }

  test("upsert applies MERGE semantics atomically; old snapshot still readable") {
    val path = tmp()
    val base = spark.range(0, 50).select(col("id"), lit("old").as("tag"))
    SnapshotTable.create(base, path)
    // 10 updates (keys 0..9) + 5 inserts (keys 100..104)
    val changes = spark.range(0, 10).select(col("id"), lit("new").as("tag"))
      .unionByName(spark.range(100, 105).select(col("id"), lit("ins").as("tag")))
    val v = SnapshotTable.upsert(spark, path, changes, Seq("id"))
    assert(v == 2)
    val now = SnapshotTable.read(spark, path)
    assert(now.count() == 55)
    assert(now.filter(col("tag") === "new").count() == 10)
    assert(now.filter(col("tag") === "ins").count() == 5)
    assert(now.filter(col("tag") === "old").count() == 40)
    // the pre-merge version is intact — readers racing the merge see a
    // consistent table either way
    val before = SnapshotTable.read(spark, path, version = 1)
    assert(before.count() == 50 && before.filter(col("tag") === "old").count() == 50)

    SnapshotTable.delete(spark, path, "id >= 100")
    assert(SnapshotTable.read(spark, path).count() == 50)

    // schema drift refuses BEFORE committing (type change would make
    // the new version unreadable against the pinned manifest schema)
    val drifted = spark.range(0, 3)
      .select(col("id").cast("double").as("id"), lit("x").as("tag"))
    intercept[IllegalArgumentException] {
      SnapshotTable.upsert(spark, path, drifted, Seq("id"))
    }

    // SQL surface: time travel from plain SQL
    graft.api.SqlSurface.install(spark)
    val viaSql = spark.sql(
      s"SELECT count(*) AS n FROM graft_snapshot_read('$path', 2)").head().getLong(0)
    assert(viaSql == 55L)
  }

  test("upsertBatch: replayed batches skip; the txn watermark survives other commits") {
    val path = tmp()
    SnapshotTable.create(
      spark.range(0, 20).select(col("id"), lit(0L).as("v")), path)
    val app = "cdc-app"
    assert(SnapshotTable.lastTxn(spark, path, app) == -1L)

    val b0 = spark.range(0, 5).select(col("id"), lit(10L).as("v"))
    val v2 = SnapshotTable.upsertBatch(spark, path, b0, Seq("id"), app, 0L)
    assert(v2 == 2 && SnapshotTable.lastTxn(spark, path, app) == 0L)

    val b1 = spark.range(5, 8).select(col("id"), lit(20L).as("v"))
    val v3 = SnapshotTable.upsertBatch(spark, path, b1, Seq("id"), app, 1L)
    assert(v3 == 3)

    // restart replay: same batch id, would double-apply without the
    // watermark — must be a no-op returning the current version
    val replay = SnapshotTable.upsertBatch(spark, path,
      spark.range(5, 8).select(col("id"), lit(999L).as("v")),
      Seq("id"), app, 1L)
    assert(replay == 3)
    assert(SnapshotTable.latestVersion(spark, path) == 3)
    assert(SnapshotTable.read(spark, path).filter(col("v") === 999L).count() == 0)

    // an interleaved maintenance commit must PRESERVE the watermark...
    SnapshotTable.compact(spark, path)
    assert(SnapshotTable.lastTxn(spark, path, app) == 1L)
    // ...so the replay hole stays closed after compaction too
    val replay2 = SnapshotTable.upsertBatch(spark, path,
      spark.range(5, 8).select(col("id"), lit(999L).as("v")),
      Seq("id"), app, 1L)
    assert(SnapshotTable.read(spark, path, replay2)
      .filter(col("v") === 999L).count() == 0)

    // a NEW batch id still applies, and a second app has its own lane
    SnapshotTable.upsertBatch(spark, path,
      spark.range(8, 9).select(col("id"), lit(30L).as("v")), Seq("id"), app, 2L)
    assert(SnapshotTable.lastTxn(spark, path, app) == 2L)
    assert(SnapshotTable.lastTxn(spark, path, "other-app") == -1L)
    val got = SnapshotTable.read(spark, path).orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 10L && got(5L) == 20L && got(8L) == 30L && got(19L) == 0L)

    // MERGE contract: a multi-row-per-key micro-batch refuses
    intercept[IllegalArgumentException] {
      SnapshotTable.upsertBatch(spark, path,
        spark.range(0, 2).select(lit(1L).as("id"), col("id").as("v")),
        Seq("id"), app, 3L)
    }
  }

  test("commitGated: write-audit-publish refuses to publish failing data") {
    import graft.api.Expectations
    val path = tmp()
    val good = spark.range(0, 20).select(col("id"), (col("id") % 5).as("v"))
    val rules = Seq(Expectations.Satisfies("v_bounded", col("v") < 5),
      Expectations.NotNull("id"))
    assert(SnapshotTable.commitGated(good, path, rules) == 1)
    // bad batch: audit fails, nothing publishes, table version unchanged
    val bad = spark.range(20, 30).select(col("id"), lit(99L).as("v"))
    intercept[IllegalStateException] {
      SnapshotTable.commitGated(bad, path, rules)
    }
    assert(SnapshotTable.latestVersion(spark, path) == 1)
    assert(SnapshotTable.read(spark, path).count() == 20)
  }

  test("streaming foreachBatch ingest: each micro-batch commits an ACID snapshot") {
    // the Delta-shaped incremental-ingest pattern with no external
    // format: stream -> foreachBatch -> atomic snapshot commit; a reader
    // at any moment sees a complete committed version, never a partial
    // micro-batch
    val path = tmp()
    val q = streaming.StreamOps.readEvents(spark, sf)
      .select(col("event_id"), col("event_type"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (SnapshotTable.latestVersion(batch.sparkSession, path) == 0)
          SnapshotTable.create(batch, path)
        else SnapshotTable.append(batch, path)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val n = SnapshotTable.read(spark, path).count()
    assert(n == Tables.events(spark, sf).count(), s"snapshot rows $n")
    assert(SnapshotTable.latestVersion(spark, path) >= 1)
  }

  test("conflicting commit of the same version loses cleanly (optimistic CAS)") {
    val path = tmp()
    SnapshotTable.create(spark.range(0, 10).toDF("id"), path)
    // two writers both base their work on v1; the first to commit v2 wins
    val winner = spark.range(10, 20).toDF("id")
    assert(SnapshotTable.append(winner, path, expectedVersion = 1) == 2)
    val loser = spark.range(20, 30).toDF("id")
    intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.append(loser, path, expectedVersion = 1)
    }
    // the table is consistent at the winner's version; the loser's
    // failed commit left no readable trace
    assert(SnapshotTable.read(spark, path).count() == 20)
    assert(SnapshotTable.latestVersion(spark, path) == 2)
    // the loser retries against the fresh snapshot and succeeds
    assert(SnapshotTable.append(loser, path) == 3)
    assert(SnapshotTable.read(spark, path).count() == 30)
  }

  test("compact + vacuum: fewer files, rows unchanged, retention drops old versions") {
    val path = tmp()
    SnapshotTable.create(spark.range(0, 40).toDF("id"), path)
    (1 to 4).foreach { i =>
      SnapshotTable.append(spark.range(40L * i, 40L * i + 40).toDF("id"), path)
    }
    val before = SnapshotTable.read(spark, path)
    val rowsBefore = before.collect().map(_.getLong(0)).sorted.toSeq
    assert(before.inputFiles.length >= 5, "expected one+ file per append")
    val v = SnapshotTable.compact(spark, path, numFiles = 1)
    val after = SnapshotTable.read(spark, path)
    assert(after.inputFiles.length == 1, "compaction must bound the file count")
    assert(after.collect().map(_.getLong(0)).sorted.toSeq == rowsBefore)
    // prior version still time-travels until vacuumed
    assert(SnapshotTable.read(spark, path, v - 1).count() == 200)

    // graceMs=0: the test's writers are quiesced; the default 1h grace
    // exists to protect concurrent writers' staged-but-uncommitted
    // segments from reclamation
    SnapshotTable.vacuum(spark, path, keepVersions = 1, graceMs = 0L)
    // latest intact, old manifests gone, orphaned segments deleted
    assert(SnapshotTable.read(spark, path).collect()
      .map(_.getLong(0)).sorted.toSeq == rowsBefore)
    intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, path, version = 1)
    }
    val dataDir = new java.io.File(new java.net.URI("file:" + path + "/data"))
    assert(dataDir.listFiles().length == 1,
      "vacuum must delete segments no kept manifest references")

    // a later vacuum with WIDER retention than remains must not crash
    // (regression: it used to readManifest versions a prior vacuum
    // removed) and must be a no-op on the kept data
    SnapshotTable.append(spark.range(1000, 1010).toDF("id"), path)
    SnapshotTable.vacuum(spark, path, keepVersions = 10, graceMs = 0L)
    assert(SnapshotTable.read(spark, path).count() == rowsBefore.size + 10)

    // fresh segments are spared by the grace window even when
    // unreferenced (simulates an in-flight writer's staging dir)
    val staged = new java.io.File(dataDir, "sinflight")
    staged.mkdirs()
    new java.io.FileWriter(new java.io.File(staged, "part-0.parquet")).close()
    SnapshotTable.vacuum(spark, path, keepVersions = 10, graceMs = 3600 * 1000L)
    assert(staged.exists(), "grace window must spare fresh segments")
    SnapshotTable.vacuum(spark, path, keepVersions = 10, graceMs = 0L)
    assert(!staged.exists(), "quiesced vacuum reclaims unreferenced segments")
  }

  test("upsert refuses multiple change rows per key (MERGE source-match contract)") {
    val path = tmp()
    SnapshotTable.create(
      spark.range(0, 20).select(col("id"), lit("old").as("tag")), path)
    // two change rows for key 5: Delta/Iceberg MERGE raises on multiple
    // source matches — silently committing both would corrupt key
    // uniqueness in the new snapshot
    val dupChanges = spark.range(5, 6).select(col("id"), lit("a").as("tag"))
      .unionByName(spark.range(5, 6).select(col("id"), lit("b").as("tag")))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.upsert(spark, path, dupChanges, Seq("id"))
    }
    assert(e.getMessage.contains("duplicate"))
    // nothing committed; table still at v1
    assert(SnapshotTable.latestVersion(spark, path) == 1)
    // caller dedupes (last-writer-wins policy applied explicitly) and wins
    val deduped = graft.api.GraftOps.latestPerKey(
      dupChanges, col("id"), Seq(col("tag")))
    assert(SnapshotTable.upsert(spark, path, deduped, Seq("id")) == 2)
    assert(SnapshotTable.read(spark, path).filter(col("id") === 5)
      .count() == 1)
  }

  test("stray non-numeric files in _manifests are ignored, not fatal") {
    val path = tmp()
    SnapshotTable.create(spark.range(0, 10).toDF("id"), path)
    // a backup/editor-droppings file next to the manifests used to throw
    // NumberFormatException from every listing site and brick the table
    val mdir = new java.io.File(new java.net.URI("file:" + path + "/_manifests"))
    new java.io.FileWriter(new java.io.File(mdir, "vbackup.json")).close()
    new java.io.FileWriter(new java.io.File(mdir, "v1.json.bak")).close()
    assert(SnapshotTable.latestVersion(spark, path) == 1)
    assert(SnapshotTable.read(spark, path).count() == 10)
    SnapshotTable.append(spark.range(10, 20).toDF("id"), path)
    SnapshotTable.vacuum(spark, path, keepVersions = 1, graceMs = 0L)
    assert(SnapshotTable.read(spark, path).count() == 20)
  }

  test("pluggable CommitStore: race holds on a store with object-store (non-atomic) semantics") {
    // The IN-TREE object-store CommitStore (no atomic no-replace
    // primitive: existence check and a blindly-replacing PUT are
    // separate operations; atomicity restored by the CommitMutex seam —
    // here the in-JVM binding, in production a lock table / conditional
    // put). The race spec must still admit exactly one winner through
    // this store — proving SnapshotTable's ACID contract survives the
    // primitive swap on exactly raw-S3 semantics.
    val s3LikeStore = new SnapshotTable.ObjectStoreCommitStore(
      SnapshotTable.InJvmCommitMutex)
    SnapshotTable.register("file", s3LikeStore)
    try {
      val path = tmp()
      SnapshotTable.create(spark.range(0, 10).toDF("id"), path)
      import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
      val pool = Executors.newFixedThreadPool(6)
      val gate = new CountDownLatch(1)
      val outcomes = (0 until 6).map { i =>
        pool.submit(new java.util.concurrent.Callable[Either[Throwable, Int]] {
          def call(): Either[Throwable, Int] = {
            val df = spark.range(100L * i, 100L * i + 10).toDF("id")
            gate.await()
            try Right(SnapshotTable.append(df, path, expectedVersion = 1))
            catch { case t: Throwable => Left(t) }
          }
        })
      }
      gate.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS))
      val results = outcomes.map(_.get())
      assert(results.collect { case Right(v) => v } == Seq(2),
        s"expected exactly one v2 winner through the fake store, got $results")
      assert(results.collect { case Left(t) => t }
        .forall(_.isInstanceOf[java.util.ConcurrentModificationException]))
      assert(s3LikeStore.puts >= 2, "fake store must have served the commits")
      assert(SnapshotTable.read(spark, path).count() == 20)
    } finally SnapshotTable.register("file", null)
  }

  test("data skipping: range predicates prune files; results equal the unpruned filter") {
    val path = tmp()
    // range-partition on k so each of the 4 files owns a disjoint k-range
    // (the layout a sorted/z-ordered 100 TB table has) — a selective
    // predicate should then OPEN a strict subset of files
    val df = spark.range(0, 4000)
      .select(col("id").as("k"), (col("id") % 97).as("v"),
        concat(lit("u"), lpad(col("id").cast("string"), 6, "0")).as("name"),
        to_date(concat(lit("1994-01-"),
          lpad((col("id") % 28 + 1).cast("string"), 2, "0"))).as("d"))
      .repartitionByRange(4, col("k"))
      .sortWithinPartitions("k")
    SnapshotTable.create(df, path)

    // numeric range: one file's k-range covers [3500, 3600)
    val (total, kept) = SnapshotTable.pruneReport(spark, path, "k >= 3500 AND k < 3600")
    assert(total == 4, s"expected 4 files, got $total")
    assert(kept < total, s"no pruning happened ($kept of $total)")
    val got = SnapshotTable.readWhere(spark, path, "k >= 3500 AND k < 3600")
    val want = SnapshotTable.read(spark, path).filter("k >= 3500 AND k < 3600")
    assert(got.count() == want.count() && got.count() == 100)

    // string zone maps prune too (name is monotone in k)
    val (_, keptS) = SnapshotTable.pruneReport(spark, path, "name = 'u000010'")
    assert(keptS == 1, s"string point lookup should open 1 file, opened $keptS")
    assert(SnapshotTable.readWhere(spark, path, "name = 'u000010'").count() == 1)

    // a predicate no file satisfies opens ZERO files but still answers
    val (_, keptNone) = SnapshotTable.pruneReport(spark, path, "k > 100000")
    assert(keptNone == 0)
    assert(SnapshotTable.readWhere(spark, path, "k > 100000").count() == 0)

    // unprunable predicates (v is spread across every file) keep all
    // files and stay correct
    val all = SnapshotTable.readWhere(spark, path, "v = 5")
    assert(all.count() == SnapshotTable.read(spark, path).filter("v = 5").count())

    // same pruned read from plain SQL
    graft.api.SqlSurface.install(spark)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_snapshot_where(" +
      s"'$path', 'k >= 3500 AND k < 3600')").head().getLong(0) == 100)

    // soundness sweep: pruned == unpruned for a batch of predicate shapes
    val full = SnapshotTable.read(spark, path)
    Seq("k = 1234", "k <= 17", "1000 < k", "k IN (3, 999, 3999)",
        "d >= DATE '1994-01-27'", "name >= 'u003990'", "v = 5 OR k < 10",
        "k IS NOT NULL", "k IS NULL").foreach { p =>
      assert(SnapshotTable.readWhere(spark, path, p).count() ==
        full.filter(p).count(), s"pruned result diverged for: $p")
    }
  }

  test("data skipping: stats survive append/upsert/compact; stats-less manifests scan all") {
    val path = tmp()
    val part = (lo: Int, hi: Int) => spark.range(lo, hi)
      .select(col("id").as("k"), lit("x").as("tag")).coalesce(1)
    SnapshotTable.create(part(0, 100), path)
    SnapshotTable.append(part(100, 200), path)
    SnapshotTable.append(part(200, 300), path)
    // three appended single-file segments = disjoint k-ranges
    val (t1, k1) = SnapshotTable.pruneReport(spark, path, "k = 250")
    assert(t1 == 3 && k1 == 1, s"append stats broken: $k1 of $t1")

    // copy-on-write upsert rewrites the snapshot; fresh stats still prune
    val changes = spark.range(0, 5).select(col("id").as("k"), lit("y").as("tag"))
    SnapshotTable.upsert(spark, path, changes, Seq("k"))
    val fullAfter = SnapshotTable.read(spark, path)
    assert(SnapshotTable.readWhere(spark, path, "k < 5").count() == 5)
    assert(SnapshotTable.readWhere(spark, path, "tag = 'y'").count() == 5)
    assert(fullAfter.count() == 300)

    // compact to 3 files, then prove a legacy (stats-less) manifest still
    // reads fine and prunes nothing: strip the stats field from the
    // latest manifest json in place
    SnapshotTable.compact(spark, path, numFiles = 3)
    val v = SnapshotTable.latestVersion(spark, path)
    val mPath = java.nio.file.Paths.get(s"$path/_manifests/v$v.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(java.nio.file.Files.readString(mPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.remove("stats")
    java.nio.file.Files.writeString(mPath, om.writeValueAsString(node))
    val (t2, k2) = SnapshotTable.pruneReport(spark, path, "k = 250")
    assert(t2 == k2, "stats-less manifest must scan every file")
    assert(SnapshotTable.readWhere(spark, path, "k = 250").count() == 1)
  }

  test("data skipping: null-aware pruning and all-null files") {
    val path = tmp()
    // file A: k non-null; file B: k all null
    val a = spark.range(0, 50).select(col("id").cast("long").as("k"),
      lit("a").as("src")).coalesce(1)
    val b = spark.range(0, 50).select(lit(null).cast("long").as("k"),
      lit("b").as("src")).coalesce(1)
    SnapshotTable.create(a, path)
    SnapshotTable.append(b, path)
    val (_, keptNotNull) = SnapshotTable.pruneReport(spark, path, "k IS NOT NULL")
    assert(keptNotNull == 1, s"all-null file not pruned: $keptNotNull")
    val (_, keptNull) = SnapshotTable.pruneReport(spark, path, "k IS NULL")
    assert(keptNull == 1, s"no-null file not pruned: $keptNull")
    // a comparison can never match the all-null file either
    val (_, keptCmp) = SnapshotTable.pruneReport(spark, path, "k >= 0")
    assert(keptCmp == 1, s"comparison kept the all-null file: $keptCmp")
    assert(SnapshotTable.readWhere(spark, path, "k IS NULL").count() == 50)
    assert(SnapshotTable.readWhere(spark, path, "k >= 0").count() == 50)
  }

  test("applyCdc: one atomic commit applies upserts AND deletes, exactly-once on replay") {
    val path = tmp()
    SnapshotTable.create(
      spark.range(0, 20).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("v")), path)
    // batch: update k=1, insert k=100, delete k=2 and k=3
    val changes = spark.sql(
      """SELECT * FROM VALUES
           (1L, 'v1b', 'U'), (100L, 'v100', 'I'),
           (2L, CAST(NULL AS STRING), 'D'), (3L, CAST(NULL AS STRING), 'D')
         AS t(k, v, op)""")
    val v = SnapshotTable.applyCdc(spark, path, changes, Seq("k"), "op",
      appId = "cdc1", batchId = 5L)
    val now = SnapshotTable.read(spark, path)
    assert(now.count() == 19) // 20 - 2 deletes + 1 insert
    assert(now.filter("k IN (2, 3)").count() == 0, "deletes must land")
    assert(now.filter("k = 1").head().getString(1) == "v1b")
    assert(now.filter("k = 100").count() == 1)
    // replayed batch (same appId+batchId): version unchanged, no double
    assert(SnapshotTable.applyCdc(spark, path, changes, Seq("k"), "op",
      appId = "cdc1", batchId = 5L) == v)
    assert(SnapshotTable.read(spark, path).count() == 19)
    // duplicate keys in a batch refuse loudly (MERGE contract)
    intercept[IllegalArgumentException] {
      SnapshotTable.applyCdc(spark, path,
        spark.sql("""SELECT * FROM VALUES (7L, 'a', 'U'), (7L, 'b', 'D')
                     AS t(k, v, op)"""), Seq("k"), "op")
    }
    // unknown op codes refuse loudly
    intercept[IllegalArgumentException] {
      SnapshotTable.applyCdc(spark, path,
        spark.sql("SELECT 9L AS k, 'x' AS v, 'Z' AS op"), Seq("k"), "op")
    }
    // time travel still shows the pre-CDC state
    assert(SnapshotTable.read(spark, path, 1).count() == 20)
  }

  test("data skipping soundness: decimal / timestamp-millis stats never mis-prune") {
    // Spark writes decimal(<=9) as INT32 and decimal(<=18) as INT64 with
    // UNSCALED values (12.34 stored as 1234). Footer stats therefore live
    // in the unscaled domain while the predicate literal renders scaled;
    // kindOf must refuse those columns (keep file) or readWhere silently
    // drops matching rows. Same for INT64 TIMESTAMP(MILLIS) stats vs the
    // micros-rendered TimestampType literal.
    val path = tmp()
    val df = spark.range(0, 400)
      .select(col("id").as("k"),
        (col("id").cast("decimal(9,2)") / 100).as("dec9"),   // INT32-backed
        (col("id").cast("decimal(18,2)") / 100).as("dec18"), // INT64-backed
        timestamp_millis(col("id") * 1000L).as("ts"))
      .repartitionByRange(4, col("k"))
      .sortWithinPartitions("k")
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try SnapshotTable.create(df, path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    val full = SnapshotTable.read(spark, path)
    // with the old kindOf, "dec9 >= 1.00" compared lit 1.00 against the
    // unscaled max (e.g. 99) of the first file and wrongly pruned others
    Seq("dec9 >= 1.00", "dec9 = 2.50", "dec18 < 0.10",
        "ts >= TIMESTAMP '1970-01-01 00:05:00'").foreach { p =>
      val got  = SnapshotTable.readWhere(spark, path, p).count()
      val want = full.filter(p).count()
      assert(got == want, s"decimal/ts-millis mis-prune for `$p`: $got != $want")
      assert(want > 0, s"vacuous predicate $p")
    }
    // plain long column in the same table still prunes
    val (t, kept) = SnapshotTable.pruneReport(spark, path, "k >= 300")
    assert(t == 4 && kept < t, s"long pruning regressed: $kept of $t")
  }

  test("bloom skipping: point lookups on an unclustered column open ~1 file") {
    val path = tmp()
    // h = md5(k): every file spans the full hex range, so zone maps
    // CANNOT prune a point lookup — the bloom is the only lever
    val df = spark.range(0, 4000)
      .select(col("id").as("k"), md5(col("id").cast("string")).as("h"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
    SnapshotTable.create(df, path)
    val probe = df.filter("k = 1234").head().getString(1)
    val (t0, k0) = SnapshotTable.pruneReport(spark, path, s"h = '$probe'")
    assert(t0 == 4 && k0 == 4, "zone maps alone must NOT prune md5 points")

    SnapshotTable.buildBlooms(spark, path, Seq("h", "k"))
    val (t1, k1) = SnapshotTable.pruneReport(spark, path, s"h = '$probe'")
    assert(t1 == 4 && k1 <= 2, s"bloom should skip non-owning files: $k1 of $t1")
    assert(SnapshotTable.readWhere(spark, path, s"h = '$probe'").count() == 1)
    // integral bloom + IN list
    val (_, kIn) = SnapshotTable.pruneReport(spark, path,
      "k IN (10, 2500)") // zone maps already split these; bloom agrees
    assert(kIn == 2)
    // absent value: bloom may prune everything; result still exact
    assert(SnapshotTable.readWhere(spark, path,
      "h = '0000deadbeef0000deadbeef0000dead'").count() == 0)
    // soundness sweep with blooms attached: pruned == unpruned
    val full = SnapshotTable.read(spark, path)
    Seq(s"h = '$probe' OR k < 5", "h IS NOT NULL", "k >= 3990",
        s"h IN ('$probe', 'nope')").foreach { p =>
      assert(SnapshotTable.readWhere(spark, path, p).count() ==
        full.filter(p).count(), s"bloom-pruned result diverged for: $p")
    }
    // appended files have no bloom yet -> kept (sound), still correct
    SnapshotTable.append(spark.range(4000, 4100)
      .select(col("id").as("k"), md5(col("id").cast("string")).as("h"))
      .coalesce(1), path)
    val probe2 = spark.sql("SELECT md5('4050')").head().getString(0)
    assert(SnapshotTable.readWhere(spark, path, s"h = '$probe2'").count() == 1)
    val (t2, k2) = SnapshotTable.pruneReport(spark, path, s"h = '$probe'")
    assert(t2 == 5 && k2 <= 3,
      s"old blooms must survive the append: $k2 of $t2")
  }

  test("mergeSchema append: additive evolution without rewriting any file") {
    val path = tmp()
    SnapshotTable.create(
      spark.range(0, 10).select(col("id").as("k"), lit("x").as("tag")), path)
    // widen with a new column; old rows surface NULL for it
    SnapshotTable.append(
      spark.range(10, 20).select(col("id").as("k"), lit("y").as("tag"),
        (col("id") * 2).as("score")),
      path, 0, mergeSchema = true)
    val t = SnapshotTable.read(spark, path)
    assert(t.columns.toSeq == Seq("k", "tag", "score"))
    assert(t.count() == 20)
    assert(t.filter("score IS NULL").count() == 10)
    assert(t.filter("k >= 10 AND score = k * 2").count() == 10)
    // a narrower append (missing columns) also works: they read as NULL
    SnapshotTable.append(
      spark.range(20, 25).select(col("id").as("k")),
      path, 0, mergeSchema = true)
    val t2 = SnapshotTable.read(spark, path)
    assert(t2.count() == 25)
    assert(t2.filter("k >= 20 AND tag IS NULL AND score IS NULL").count() == 5)
    // time travel still shows the ORIGINAL schema for v1
    assert(SnapshotTable.read(spark, path, version = 1).columns.toSeq ==
      Seq("k", "tag"))
    // data skipping still prunes on the original column across vintages
    assert(SnapshotTable.readWhere(spark, path, "k = 22").count() == 1)
    // same-name different-type refuses loudly
    intercept[IllegalArgumentException] {
      SnapshotTable.append(
        spark.range(3).select(col("id").as("k"),
          col("id").cast("string").as("score")),
        path, 0, mergeSchema = true)
    }
    // and mergeSchema=false keeps the strict contract
    intercept[IllegalArgumentException] {
      SnapshotTable.append(
        spark.range(3).select(col("id").as("k"), lit("z").as("tag"),
          col("id").as("score"), lit(1L).as("extra")), path)
    }
  }

  test("cluster: sorted rewrite turns a scattered point query into a one-file open") {
    val path = tmp()
    // write k round-robin so EVERY file spans the whole k-range —
    // skipping can prune nothing
    val scattered = spark.range(0, 4000)
      .select((col("id") * 2654435761L % 4000).as("k"), col("id").as("v"))
      .repartition(4)
    SnapshotTable.create(scattered, path)
    val (t0, k0) = SnapshotTable.pruneReport(spark, path, "k = 123")
    assert(t0 == 4 && k0 == 4, s"scattered layout should prune nothing: $k0 of $t0")
    // clustered rewrite: each file owns a narrow k-interval
    SnapshotTable.cluster(spark, path, Seq("k"), numFiles = 4)
    val (t1, k1) = SnapshotTable.pruneReport(spark, path, "k = 123")
    assert(t1 == 4 && k1 == 1, s"clustered point query should open 1 file: $k1 of $t1")
    // rows unchanged, result identical, history intact
    assert(SnapshotTable.read(spark, path).count() == 4000)
    assert(SnapshotTable.readWhere(spark, path, "k = 123").count() ==
      SnapshotTable.read(spark, path, version = 1).filter("k = 123").count())
  }

  test("changes: version-pair change feed surfaces inserts, deletes, and update pairs") {
    val path = tmp()
    val v1 = spark.range(0, 100).select(col("id").as("k"),
      when(col("id") === 7, lit(null).cast("string"))
        .otherwise(lit("x")).as("tag"))
    SnapshotTable.create(v1, path)                                  // v1
    val changes = spark.range(0, 3).select(col("id").as("k"), lit("upd").as("tag"))
      .unionByName(spark.range(200, 205).select(col("id").as("k"),
        lit("new").as("tag")))
    SnapshotTable.upsert(spark, path, changes, Seq("k"))            // v2
    SnapshotTable.delete(spark, path, "k >= 90 AND k < 95")         // v3

    val cdf12 = SnapshotTable.changes(spark, path, 1, 2)
    val byType = cdf12.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 updates => 3 delete+insert pairs; 5 pure inserts
    assert(byType("insert") == 8L, s"got $byType")
    assert(byType("delete") == 3L, s"got $byType")

    val cdf23 = SnapshotTable.changes(spark, path, 2, 3)
    assert(cdf23.filter("_change_type = 'delete'").count() == 5L)
    assert(cdf23.filter("_change_type = 'insert'").count() == 0L)

    // null-safe: the row with a NULL field is NOT a spurious change
    assert(SnapshotTable.changes(spark, path, 1, 2).filter("k = 7").count() == 0L)
    // applying the feed reconstructs v2 from v1 (row-set semantics)
    val rebuilt = SnapshotTable.read(spark, path, 1)
      .exceptAll(cdf12.filter("_change_type = 'delete'").drop("_change_type"))
      .unionByName(cdf12.filter("_change_type = 'insert'").drop("_change_type"))
    assert(rebuilt.exceptAll(SnapshotTable.read(spark, path, 2)).count() == 0L)
    assert(SnapshotTable.read(spark, path, 2).exceptAll(rebuilt).count() == 0L)
  }

  test("racing writers: exactly one commit of a version wins (true concurrency)") {
    // 6 threads, same base version, simultaneous commits — the atomic
    // no-replace publish (hard link on local fs) must admit exactly one;
    // a check-then-rename TOCTOU would let several "succeed" and lose
    // all but the last manifest silently
    val path = tmp()
    SnapshotTable.create(spark.range(0, 10).toDF("id"), path)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(6)
    val gate = new CountDownLatch(1)
    val outcomes = (0 until 6).map { i =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, Int]] {
        def call(): Either[Throwable, Int] = {
          val df = spark.range(100L * i, 100L * i + 10).toDF("id")
          gate.await()
          try Right(SnapshotTable.append(df, path, expectedVersion = 1))
          catch { case t: Throwable => Left(t) }
        }
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    val results = outcomes.map(_.get())
    val winners = results.collect { case Right(v) => v }
    val losers = results.collect { case Left(t) => t }
    assert(winners == Seq(2).padTo(winners.size, 2) && winners.size == 1,
      s"expected exactly one v2 winner, got $results")
    assert(losers.forall(_.isInstanceOf[java.util.ConcurrentModificationException]))
    // the committed table matches the winner's content (20 rows, v2)
    assert(SnapshotTable.latestVersion(spark, path) == 2)
    assert(SnapshotTable.read(spark, path).count() == 20)
  }
}
