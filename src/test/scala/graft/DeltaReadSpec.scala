package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Read-only Delta interop against a hand-written transaction log built
  * purely from the PUBLIC protocol (PROTOCOL.md): 3 JSON commits
  * including a remove, per-file stats driving a pruned read, version
  * time travel, a parquet checkpoint base, hive-partitioned layout, and
  * the reader-version gate.
  */
class DeltaReadSpec extends AnyFunSuite {
  import SparkTestSession._
  import sources.DeltaRead

  private def tmp(): String =
    Files.createTempDirectory("graft_delta").toString + "/t"

  private val schemaJson = StructType(Seq(
    StructField("k", LongType), StructField("name", StringType))).json

  /** Write `df` as ONE parquet file named `name` under `dir`. */
  private def dataFile(dir: String, name: String,
                       df: org.apache.spark.sql.DataFrame): Unit = {
    val stage = Files.createTempDirectory("graft_delta_stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val target = Paths.get(dir, name)
    Files.createDirectories(target.getParent)
    Files.copy(part.toPath, target, StandardCopyOption.REPLACE_EXISTING)
  }

  private def commit(dir: String, version: Long, lines: Seq[String]): Unit = {
    val log = Paths.get(dir, "_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve(f"$version%020d.json"),
      lines.mkString("\n") + "\n")
  }

  private def meta(json: String, parts: String = "[]"): String =
    s"""{"metaData":{"id":"t","format":{"provider":"parquet"},""" +
      s""""schemaString":${om(json)},"partitionColumns":$parts}}"""
  private def om(s: String): String =
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .writeValueAsString(s)
  private def add(path: String, lo: Long, hi: Long, rows: Long): String =
    s"""{"add":{"path":"$path","partitionValues":{},"size":1,""" +
      s""""modificationTime":0,"dataChange":true,""" +
      s""""stats":"{\\"numRecords\\":$rows,\\"minValues\\":{\\"k\\":$lo},""" +
      s"""\\"maxValues\\":{\\"k\\":$hi},\\"nullCount\\":{\\"k\\":0}}"}}"""

  private def range(lo: Long, hi: Long) = spark.range(lo, hi)
    .select(col("id").as("k"),
      concat(lit("u"), col("id").cast("string")).as("name"))

  private def buildTable(): String = {
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 50))
    dataFile(dir, "f1.parquet", range(50, 100))
    dataFile(dir, "f2.parquet", range(100, 150))
    dataFile(dir, "f3.parquet", range(150, 200))
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      meta(schemaJson),
      add("f0.parquet", 0, 49, 50),
      add("f1.parquet", 50, 99, 50)))
    commit(dir, 1, Seq(
      add("f2.parquet", 100, 149, 50),
      """{"remove":{"path":"f1.parquet","deletionTimestamp":1,"dataChange":true}}"""))
    commit(dir, 2, Seq(add("f3.parquet", 150, 199, 50)))
    dir
  }

  test("3-commit log: adds minus removes, schema, and time travel") {
    val dir = buildTable()
    assert(DeltaRead.latestVersion(spark, dir) == 2)
    val latest = DeltaRead.read(spark, dir)
    assert(latest.columns.toSeq == Seq("k", "name"))
    // live set at v2: f0 + f2 + f3 (f1 removed in v1)
    assert(latest.count() == 150)
    assert(latest.agg(sum("k")).head().getLong(0)
      == (0L until 50).sum + (100L until 200).sum)
    // v0: f0 + f1
    val v0 = DeltaRead.read(spark, dir, 0)
    assert(v0.count() == 100 && v0.agg(max("k")).head().getLong(0) == 99)
    // v1: f0 + f2
    val v1 = DeltaRead.read(spark, dir, 1)
    assert(v1.count() == 100 && v1.agg(max("k")).head().getLong(0) == 149)
  }

  test("stats skipping: pruned read equals unpruned filter, opens fewer files") {
    val dir = buildTable()
    val (total, kept) = DeltaRead.pruneReport(spark, dir, "k >= 150")
    assert(total == 3 && kept == 1, s"expected 1 of 3 files, got $kept of $total")
    val got = DeltaRead.readWhere(spark, dir, "k >= 150")
    val want = DeltaRead.read(spark, dir).filter("k >= 150")
    assert(got.count() == want.count() && got.count() == 50)
    // string-column predicate (no stats for name) keeps all files, stays correct
    val (_, keptS) = DeltaRead.pruneReport(spark, dir, "name = 'u120'")
    assert(keptS == 3)
    assert(DeltaRead.readWhere(spark, dir, "name = 'u120'").count() == 1)
    // impossible predicate opens zero files but still answers
    val (_, none) = DeltaRead.pruneReport(spark, dir, "k > 10000")
    assert(none == 0)
    assert(DeltaRead.readWhere(spark, dir, "k > 10000").count() == 0)
  }

  test("checkpoint base: state reconstructed from parquet checkpoint + tail commits") {
    val dir = buildTable()
    // hand-build the v1 checkpoint (live: f0, f2) and drop commits 0-1
    val cpSql = Seq(
      s"""SELECT CAST(NULL AS struct<path:string,partitionValues:map<string,string>,stats:string>) AS add,
                 CAST(NULL AS struct<path:string>) AS remove,
                 named_struct('schemaString', '${schemaJson.replace("'", "''")}',
                              'partitionColumns', array()) AS metaData,
                 CAST(NULL AS struct<minReaderVersion:int>) AS protocol""",
      s"""SELECT CAST(NULL AS struct<path:string,partitionValues:map<string,string>,stats:string>) AS add,
                 CAST(NULL AS struct<path:string>) AS remove,
                 CAST(NULL AS struct<schemaString:string,partitionColumns:array<string>>) AS metaData,
                 named_struct('minReaderVersion', 1) AS protocol""",
      s"""SELECT named_struct('path', 'f0.parquet', 'partitionValues', map('x','y'),
                              'stats', '{"numRecords":50,"minValues":{"k":0},"maxValues":{"k":49},"nullCount":{"k":0}}') AS add,
                 CAST(NULL AS struct<path:string>) AS remove,
                 CAST(NULL AS struct<schemaString:string,partitionColumns:array<string>>) AS metaData,
                 CAST(NULL AS struct<minReaderVersion:int>) AS protocol""",
      s"""SELECT named_struct('path', 'f2.parquet', 'partitionValues', map('x','y'),
                              'stats', '{"numRecords":50,"minValues":{"k":100},"maxValues":{"k":149},"nullCount":{"k":0}}') AS add,
                 CAST(NULL AS struct<path:string>) AS remove,
                 CAST(NULL AS struct<schemaString:string,partitionColumns:array<string>>) AS metaData,
                 CAST(NULL AS struct<minReaderVersion:int>) AS protocol""")
      .mkString(" UNION ALL ")
    val stage = Files.createTempDirectory("graft_cp").toString
    spark.sql(cpSql).coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath,
      Paths.get(dir, "_delta_log", f"${1L}%020d.checkpoint.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    // delete the compacted commits — the checkpoint must carry the state
    Files.delete(Paths.get(dir, "_delta_log", f"${0L}%020d.json"))
    Files.delete(Paths.get(dir, "_delta_log", f"${1L}%020d.json"))
    val latest = DeltaRead.read(spark, dir)
    assert(latest.count() == 150)
    // partitionValues map survives the checkpoint roundtrip; stats prune
    val (total, kept) = DeltaRead.pruneReport(spark, dir, "k < 50")
    assert(total == 3 && kept == 1)
    // time travel below the checkpoint now fails loudly (log cleaned)
    intercept[IllegalArgumentException] {
      DeltaRead.read(spark, dir, 0)
    }
  }

  test("hive-partitioned table: partition column recovered and typed") {
    val dir = tmp()
    val pSchema = StructType(Seq(
      StructField("k", LongType), StructField("p", IntegerType))).json
    dataFile(dir, "p=1/f0.parquet", spark.range(0, 10).select(col("id").as("k")))
    dataFile(dir, "p=2/f1.parquet", spark.range(10, 30).select(col("id").as("k")))
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      meta(pSchema, """["p"]"""),
      """{"add":{"path":"p=1/f0.parquet","partitionValues":{"p":"1"},"size":1,"modificationTime":0,"dataChange":true}}""",
      """{"add":{"path":"p=2/f1.parquet","partitionValues":{"p":"2"},"size":1,"modificationTime":0,"dataChange":true}}"""))
    val df = DeltaRead.read(spark, dir)
    assert(df.columns.toSeq == Seq("k", "p"))
    assert(df.schema("p").dataType == IntegerType)
    assert(df.filter(col("p") === 2).count() == 20)
    assert(df.count() == 30)
  }

  test("delta: inline source in a declarative job (with @version time travel)") {
    val dir = buildTable()
    def n(src: String): Long = api.TransformSpec.run(
      s"""{"source": "$src", "steps": [
           {"op": "agg", "groupBy": [], "aggs": [["n", "count(1)"]]}]}""",
      Map.empty[String, org.apache.spark.sql.DataFrame],
      allowInlineSources = true)
      .head().getLong(0)
    assert(n(s"delta:$dir") == 150L)
    assert(n(s"delta:$dir@0") == 100L)
  }

  test("DeltaWrite: create+append round-trips through DeltaRead with pruning stats") {
    import sources.DeltaWrite
    val dir = tmp()
    val v0 = DeltaWrite.create(
      range(0, 100).repartitionByRange(2, col("k")).sortWithinPartitions("k"),
      dir)
    assert(v0 == 0)
    val v1 = DeltaWrite.append(range(100, 150).coalesce(1), dir)
    assert(v1 == 1)
    val back = DeltaRead.read(spark, dir)
    assert(back.count() == 150)
    assert(back.columns.toSeq == Seq("k", "name"))
    assert(back.agg(sum("k")).head().getLong(0) == (0L until 150).sum)
    // footer-derived stats made it into the log and prune
    val (total, kept) = DeltaRead.pruneReport(spark, dir, "k >= 120")
    assert(total == 3 && kept == 1, s"stats skipping broken: $kept of $total")
    assert(DeltaRead.readWhere(spark, dir, "k >= 120").count() == 30)
    // schema drift refused loudly
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.append(
        spark.range(0, 1).select(col("id").as("k")), dir)
    }
    assert(e.getMessage.contains("schema"))
    // time travel sees the pre-append version
    assert(DeltaRead.read(spark, dir, 0).count() == 100)
  }

  test("DeltaWrite: partitioned create+append — hive layout, partitionValues, typed recovery") {
    import sources.DeltaWrite
    val dir = tmp()
    val parted = (lo: Long, hi: Long) => range(lo, hi)
      .withColumn("bucket", (col("k") % 3).cast("int"))
    assert(DeltaWrite.create(parted(0, 30).coalesce(1), dir,
      partitionBy = Seq("bucket")) == 0)
    assert(DeltaWrite.append(parted(30, 60).coalesce(1), dir) == 1)
    val back = DeltaRead.read(spark, dir)
    assert(back.count() == 60)
    assert(back.schema("bucket").dataType.typeName == "integer",
      "partition column must come back with its declared type")
    assert(back.filter(col("bucket") === 1).count() == 20)
    assert(back.agg(sum("k")).head().getLong(0) == (0L until 60).sum)
    // hive layout on disk: data files live under bucket=N dirs and do
    // NOT carry the partition column
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(files.length == 3, s"expected 3 partition dirs: ${files.toSeq}")
    val one = new java.io.File(dir, "bucket=0").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    assert(!spark.read.parquet(one.toString).columns.contains("bucket"))
    // the add actions carry the partitionValues map (protocol readers
    // plan partitions from the LOG, not a directory listing)
    val log = java.nio.file.Files.readString(
      Paths.get(dir, "_delta_log", f"${0L}%020d.json"))
    assert(log.contains(""""partitionColumns":["bucket"]"""))
    assert(log.contains(""""partitionValues":{"bucket":"0"}"""))
    // NULL partition value refused loudly
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.append(parted(60, 61)
        .withColumn("bucket", lit(null).cast("int")), dir)
    }
    assert(e.getMessage.contains("NULL partition"))
    // time travel sees only the create's partitions' rows
    assert(DeltaRead.read(spark, dir, 0).count() == 30)
  }

  test("DeltaWrite: hive-escaped partition values round-trip (add.path encoded, values exact)") {
    import sources.DeltaWrite
    val dir = tmp()
    // ':' is hive-escaped to %3A in the dir name; '+' is NOT escaped by
    // hive but corrupted to a space by form-style URL decoding — both
    // must come back exactly
    val df = spark.createDataFrame(Seq(
      (1L, "12:30"), (2L, "c++"), (3L, "plain"))).toDF("k", "slot")
    assert(DeltaWrite.create(df.coalesce(1), dir,
      partitionBy = Seq("slot")) == 0)
    val back = DeltaRead.read(spark, dir)
    assert(back.count() == 3)
    assert(back.select("slot").collect().map(_.getString(0)).toSet
      == Set("12:30", "c++", "plain"))
    val log = java.nio.file.Files.readString(
      Paths.get(dir, "_delta_log", f"${0L}%020d.json"))
    // the partitionValues map carries the LOGICAL values
    assert(log.contains(""""partitionValues":{"slot":"12:30"}"""))
    assert(log.contains(""""partitionValues":{"slot":"c++"}"""))
    // add.path is percent-encoded per the protocol: the physical
    // hive-escaped dir slot=12%3A30 logs with its '%' escaped again
    assert(log.contains("12%253A30"),
      s"add.path must be URL-encoded so readers' decode recovers the " +
        s"physical name: $log")
  }

  test("DeltaWrite: racing appends — every row lands exactly once") {
    import sources.DeltaWrite
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = tmp()
    DeltaWrite.create(range(0, 10).coalesce(1), dir)
    val pool = Executors.newFixedThreadPool(4)
    val gate = new CountDownLatch(1)
    val outcomes = (0 until 4).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          gate.await()
          DeltaWrite.append(
            range(100 + i * 10, 110 + i * 10).coalesce(1), dir)
        }
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    val versions = outcomes.map(_.get()).sorted
    assert(versions == Seq(1L, 2L, 3L, 4L),
      s"each append must win a distinct version: $versions")
    val back = DeltaRead.read(spark, dir)
    assert(back.count() == 50)
    assert(back.select("k").distinct().count() == 50, "no row duplicated")
  }

  test("reader-version gate: unknown features refused BY NAME, supported ones read") {
    // a feature outside {columnMapping, deletionVectors, timestampNtz,
    // v2Checkpoint} refuses with the feature named
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 10))
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","typeWidening"]}}""",
      meta(schemaJson),
      add("f0.parquet", 0, 9, 10)))
    val e = intercept[IllegalArgumentException] {
      DeltaRead.read(spark, dir)
    }
    assert(e.getMessage.contains("typeWidening"))
    assert(!e.getMessage.contains("deletionVectors,"),
      "supported features must not be named as the refusal cause")
    // a reader version beyond 3 refuses outright
    val dir2 = tmp()
    dataFile(dir2, "f0.parquet", range(0, 10))
    commit(dir2, 0, Seq(
      """{"protocol":{"minReaderVersion":4,"minWriterVersion":7,"readerFeatures":[]}}""",
      meta(schemaJson),
      add("f0.parquet", 0, 9, 10)))
    val e2 = intercept[IllegalArgumentException] {
      DeltaRead.read(spark, dir2)
    }
    assert(e2.getMessage.contains("reader version"))
    // the SUPPORTED feature set alone is not a refusal: mrv=3 with
    // deletionVectors+timestampNtz declared (but no DV on any file)
    // reads normally
    val dir3 = tmp()
    dataFile(dir3, "f0.parquet", range(0, 10))
    commit(dir3, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","timestampNtz"]}}""",
      meta(schemaJson),
      add("f0.parquet", 0, 9, 10)))
    assert(DeltaRead.read(spark, dir3).count() == 10)
  }

  test("DeltaWrite: add actions carry the REAL file size and mtime") {
    import sources.DeltaWrite
    val dir = tmp()
    DeltaWrite.create(range(0, 100).coalesce(1), dir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val adds = java.nio.file.Files
      .readString(Paths.get(dir, "_delta_log", f"${0L}%020d.json"))
      .split("\n").filter(_.contains("\"add\""))
      .map(l => mapper.readTree(l).path("add"))
    assert(adds.nonEmpty)
    adds.foreach { a =>
      val rel = a.path("path").asText()
      val f = new java.io.File(dir, rel)
      assert(f.isFile, s"$rel missing on disk")
      assert(a.path("size").asLong() == f.length(),
        s"logged size ${a.path("size").asLong()} != actual ${f.length()}")
      assert(a.path("modificationTime").asLong() > 0L,
        "modificationTime must be the real mtime, not 0")
    }
  }

  test("DeltaWrite: periodic checkpoint — json log ≤ interval is droppable") {
    import sources.DeltaWrite
    val dir = tmp()
    spark.conf.set("graft.delta.checkpoint.interval", "10")
    try {
      DeltaWrite.create(range(0, 10).coalesce(1), dir)
      (1 to 15).foreach { i =>
        DeltaWrite.append(range(i * 10L, i * 10L + 10).coalesce(1), dir)
      }
      // the interval hit at version 10: classic checkpoint + pointer
      val ckpt = Paths.get(dir, "_delta_log",
        f"${10L}%020d.checkpoint.parquet")
      assert(java.nio.file.Files.exists(ckpt),
        "append 10 must have produced a classic checkpoint")
      val lc = java.nio.file.Files.readString(
        Paths.get(dir, "_delta_log", "_last_checkpoint"))
      assert(lc.contains("\"version\":10"), s"_last_checkpoint: $lc")
      // the checkpointed prefix of the json log is now droppable
      (0L to 10L).foreach { v =>
        java.nio.file.Files.delete(
          Paths.get(dir, "_delta_log", f"$v%020d.json"))
      }
      val back = DeltaRead.read(spark, dir)
      assert(back.count() == 160)
      assert(back.agg(sum("k")).head().getLong(0) == (0L until 160).sum)
      // time travel into the cleaned prefix fails loudly, at the
      // checkpoint version it works
      intercept[IllegalArgumentException] { DeltaRead.read(spark, dir, 5) }
      assert(DeltaRead.read(spark, dir, 10).count() == 110)
    } finally spark.conf.unset("graft.delta.checkpoint.interval")
  }

  test("DeltaWrite: additive schema evolution on append (mergeSchema)") {
    import sources.DeltaWrite
    val dir = tmp()
    DeltaWrite.create(range(0, 50).coalesce(1), dir)
    val evolved = range(50, 100).withColumn("score", col("k") * 2)
    // without the flag, drift still refuses
    intercept[IllegalArgumentException] { DeltaWrite.append(evolved, dir) }
    assert(DeltaWrite.append(evolved.coalesce(1), dir,
      mergeSchema = true) == 1)
    val back = DeltaRead.read(spark, dir)
    assert(back.columns.toSeq == Seq("k", "name", "score"))
    assert(back.count() == 100)
    // old files surface NULL for the later-added column — no rewrite
    assert(back.filter(col("k") < 50 && col("score").isNull).count() == 50)
    assert(back.filter(col("k") >= 50 &&
      col("score") === col("k") * 2).count() == 50)
    // a batch OMITTING the evolved column still appends
    assert(DeltaWrite.append(range(100, 110).coalesce(1), dir,
      mergeSchema = true) == 2)
    val back2 = DeltaRead.read(spark, dir)
    assert(back2.count() == 110)
    assert(back2.filter(col("k") >= 100 && col("score").isNull)
      .count() == 10)
    // type conflicts refuse loudly
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.append(
        range(0, 1).withColumn("score", lit("not-a-number")), dir,
        mergeSchema = true)
    }
    assert(e.getMessage.contains("conflict"))
    // time travel shows each version's own schema
    assert(DeltaRead.read(spark, dir, 0).columns.toSeq == Seq("k", "name"))
    // the table id survives the evolution commit (readers key on it)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def metaId(v: Long): String = java.nio.file.Files
      .readString(Paths.get(dir, "_delta_log", f"$v%020d.json"))
      .split("\n").find(_.contains("metaData"))
      .map(l => mapper.readTree(l).path("metaData").path("id").asText())
      .getOrElse("")
    assert(metaId(1).nonEmpty && metaId(0) == metaId(1),
      "schema evolution must not mint a new table id")
  }

  test("DeltaWrite.delete: copy-on-write rewrites ONLY files holding matches") {
    import sources.DeltaWrite
    val dir = tmp()
    DeltaWrite.create(range(0, 50).coalesce(1), dir)   // file A: k 0-49
    DeltaWrite.append(range(50, 100).coalesce(1), dir) // file B: k 50-99
    val v = DeltaWrite.delete(spark, dir, "k >= 90")
    assert(v == 2)
    val back = DeltaRead.read(spark, dir)
    assert(back.count() == 90)
    assert(back.agg(max("k")).head().getLong(0) == 89)
    // exactly ONE file rewritten: stats pruned file A, the scan hit
    // only file B
    val c2 = java.nio.file.Files.readString(
      Paths.get(dir, "_delta_log", f"${2L}%020d.json"))
    assert(c2.split("\n").count(_.contains("\"remove\"")) == 1,
      s"only the matching file may be rewritten: $c2")
    // deleting nothing commits nothing
    assert(DeltaWrite.delete(spark, dir, "k > 100000") == 2)
    // time travel sees the pre-delete table
    assert(DeltaRead.read(spark, dir, 1).count() == 100)
    // SQL DELETE null semantics: NULL-predicate rows are KEPT
    val dir2 = tmp()
    val df = spark.createDataFrame(Seq(
      (1L, "a"), (2L, null.asInstanceOf[String]), (3L, "b")))
      .toDF("k", "name")
    DeltaWrite.create(df.coalesce(1), dir2)
    DeltaWrite.delete(spark, dir2, "name = 'a'")
    val kept = DeltaRead.read(spark, dir2)
    assert(kept.count() == 2)
    assert(kept.select("k").collect().map(_.getLong(0)).toSet
      == Set(2L, 3L), "NULL-predicate rows must survive a DELETE")
  }

  test("DeltaWrite.delete on a partitioned table keeps hive layout") {
    import sources.DeltaWrite
    val dir = tmp()
    val parted = range(0, 60).withColumn("bucket", (col("k") % 3).cast("int"))
    DeltaWrite.create(parted.coalesce(1), dir, partitionBy = Seq("bucket"))
    val v = DeltaWrite.delete(spark, dir, "bucket = 1 AND k < 30")
    assert(v == 1)
    val back = DeltaRead.read(spark, dir)
    assert(back.count() == 50) // bucket 1 had 20 rows, 10 of them k<30
    assert(back.filter(col("bucket") === 1).count() == 10)
    assert(back.schema("bucket").dataType.typeName == "integer")
    // rewritten rows landed back under hive dirs with partitionValues
    val c1 = java.nio.file.Files.readString(
      Paths.get(dir, "_delta_log", f"${1L}%020d.json"))
    assert(c1.contains(""""partitionValues":{"bucket":"1"}"""))
    assert(c1.contains("bucket=1/") || c1.contains("bucket%3D1"))
  }

  test("DeltaWrite.upsert: MERGE — matched keys replaced, fresh keys inserted, one file rewritten") {
    import sources.DeltaWrite
    val dir = tmp()
    DeltaWrite.create(range(0, 50).coalesce(1), dir)   // file A: k 0-49
    DeltaWrite.append(range(50, 100).coalesce(1), dir) // file B: k 50-99
    val src = spark.createDataFrame(Seq(
      (10L, "updated"), (200L, "fresh"))).toDF("k", "name")
    val v = DeltaWrite.upsert(src, dir, Seq("k"))
    assert(v == 2)
    val back = DeltaRead.read(spark, dir)
    assert(back.count() == 101)
    assert(back.filter(col("k") === 10).head().getString(1) == "updated")
    assert(back.filter(col("k") === 200).count() == 1)
    assert(back.filter(col("k") === 11).head().getString(1) == "u11",
      "non-matched rows of the rewritten file must survive verbatim")
    // hit detection: the key range [10,200] spans BOTH files but only
    // file A holds a matched key — exactly one remove
    val c2 = java.nio.file.Files.readString(
      Paths.get(dir, "_delta_log", f"${2L}%020d.json"))
    assert(c2.split("\n").count(_.contains("\"remove\"")) == 1,
      s"only the matched file may be rewritten: $c2")
    // MERGE contract: at most one source row per key
    intercept[IllegalArgumentException] {
      DeltaWrite.upsert(src.unionAll(src), dir, Seq("k"))
    }
    // time travel sees the pre-merge value
    assert(DeltaRead.read(spark, dir, 1).filter(col("k") === 10)
      .head().getString(1) == "u10")
  }

  test("partition-value pruning: a partition predicate opens only matching files") {
    import sources.DeltaWrite
    val dir = tmp()
    val parted = range(0, 60).withColumn("bucket", (col("k") % 3).cast("int"))
    DeltaWrite.create(parted.coalesce(1), dir, partitionBy = Seq("bucket"))
    // one file per hive dir; the partition predicate must prune via the
    // add actions' partitionValues (no stats json carries bucket)
    val (total, kept) = DeltaRead.pruneReport(spark, dir, "bucket = 1")
    assert(total == 3 && kept == 1,
      s"partitionValues must act as the partition column's zone map: " +
        s"$kept of $total")
    assert(DeltaRead.readWhere(spark, dir, "bucket = 1").count() == 20)
    // combined partition + stats predicate prunes on both
    val (_, kept2) = DeltaRead.pruneReport(spark, dir,
      "bucket = 1 AND k > 1000")
    assert(kept2 == 0)
    // string partition values prune exactly, hive-escaped ones included
    val dir2 = tmp()
    val df = spark.createDataFrame(Seq(
      (1L, "12:30"), (2L, "c++"), (3L, "plain"))).toDF("k", "slot")
    DeltaWrite.create(df.repartition(3, col("slot")), dir2,
      partitionBy = Seq("slot"))
    val (t2, k2) = DeltaRead.pruneReport(spark, dir2, "slot = '12:30'")
    assert(t2 == 3 && k2 == 1, s"string partition pruning: $k2 of $t2")
    assert(DeltaRead.readWhere(spark, dir2, "slot = '12:30'")
      .head().getLong(0) == 1L)
  }

  test("changes: file-level version diff replays exactly across COW commits") {
    import sources.{DeltaWrite, DeltaRead}
    val dir = tmp()
    DeltaWrite.create(range(0, 50).coalesce(1), dir)   // v0
    DeltaWrite.append(range(50, 100).coalesce(1), dir) // v1
    DeltaWrite.delete(spark, dir, "k >= 90")           // v2: rewrite file B
    DeltaWrite.upsert(spark.createDataFrame(Seq(
      (10L, "updated"), (200L, "fresh"))).toDF("k", "name"),
      dir, Seq("k"))                                   // v3: rewrite file A
    val feed = DeltaRead.changes(spark, dir, 1, 3)
    assert(feed.columns.toSeq
      == Seq("k", "name", "_change_type", "_commit_version"))
    // per-commit attribution: the delete rewrote at v2, the merge at v3
    assert(feed.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L))
    val dels = feed.filter(col("_change_type") === "delete")
      .drop("_change_type", "_commit_version")
    val ins = feed.filter(col("_change_type") === "insert")
      .drop("_change_type", "_commit_version")
    // replay contract: read(v1) minus deletes plus inserts == read(v3)
    val v1 = DeltaRead.read(spark, dir, 1)
    val v3 = DeltaRead.read(spark, dir, 3)
    val replay = v1.exceptAll(dels).unionAll(ins)
    assert(replay.exceptAll(v3).count() == 0 &&
      v3.exceptAll(replay).count() == 0,
      "v1 + feed must replay to v3 exactly")
    // an append-only range is a minimal insert-only feed
    val f01 = DeltaRead.changes(spark, dir, 0, 1)
    assert(f01.filter(col("_change_type") === "delete").count() == 0)
    assert(f01.count() == 50)
    // a schema-evolution boundary refuses loudly
    DeltaWrite.append(range(200, 201).withColumn("score", lit(1L))
      .coalesce(1), dir, mergeSchema = true)           // v4
    val e = intercept[IllegalArgumentException] {
      DeltaRead.changes(spark, dir, 3, 4)
    }
    assert(e.getMessage.contains("evolution"))
    // span contract: an over-bound replay request refuses by conf name
    // and chunked walks concatenate to exactly the full feed
    spark.conf.set("graft.delta.changes.maxSpan", "2")
    try {
      val eSpan = intercept[IllegalArgumentException] {
        DeltaRead.changes(spark, dir, 0, 3)
      }
      assert(eSpan.getMessage.contains("graft.delta.changes.maxSpan"))
      val full = DeltaRead.changes(spark, dir, 1, 3)
      val chunked = DeltaRead.changes(spark, dir, 1, 2)
        .unionAll(DeltaRead.changes(spark, dir, 2, 3))
      assert(chunked.exceptAll(full).count() == 0 &&
        full.exceptAll(chunked).count() == 0,
        "chunked feeds must concatenate to the full feed")
    } finally spark.conf.unset("graft.delta.changes.maxSpan")
  }

  test("row-level CDF: cdc files serve minimal diffs with update pre/postimages") {
    import sources.DeltaWrite
    // table created externally with delta.enableChangeDataFeed=true
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 50))
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      s"""{"metaData":{"id":"cdf","format":{"provider":"parquet"},""" +
        s""""schemaString":${om(schemaJson)},"partitionColumns":[],""" +
        s""""configuration":{"delta.enableChangeDataFeed":"true"}}}""",
      add("f0.parquet", 0, 49, 50)))
    // COW DELETE: the commit lands _change_data and cdc actions
    assert(DeltaWrite.delete(spark, dir, "k >= 40") == 1)
    val c1 = java.nio.file.Files.readString(
      Paths.get(dir, "_delta_log", f"${1L}%020d.json"))
    assert(c1.contains("\"cdc\"") && c1.contains("_change_data"),
      s"CDF commit must carry cdc actions: $c1")
    val feed1 = DeltaRead.changes(spark, dir, 0, 1)
    // MINIMAL diff: 10 deleted rows — NOT the whole rewritten file as
    // delete+insert pairs (the file-level fallback's granularity)
    assert(feed1.count() == 10, s"minimal row diff expected: ${feed1.count()}")
    assert(feed1.select("_change_type").distinct().head().getString(0)
      == "delete")
    assert(feed1.agg(min("k")).head().getLong(0) == 40)
    // COW MERGE: pre/postimage for the matched key, insert for the new
    val src = spark.createDataFrame(Seq(
      (10L, "updated"), (200L, "fresh"))).toDF("k", "name")
    assert(DeltaWrite.upsert(src, dir, Seq("k")) == 2)
    val feed2 = DeltaRead.changes(spark, dir, 1, 2)
    assert(feed2.count() == 3)
    val byType = feed2.collect().map(r =>
      r.getString(2) -> (r.getLong(0), r.getString(1))).toMap
    assert(byType("update_preimage") == ((10L, "u10")))
    assert(byType("update_postimage") == ((10L, "updated")))
    assert(byType("insert") == ((200L, "fresh")))
    // replay algebra across the full range (pre counts as delete, post
    // as insert)
    val feed = DeltaRead.changes(spark, dir, 0, 2)
    val minus = feed.filter(col("_change_type").isin("delete",
      "update_preimage")).select("k", "name")
    val plus = feed.filter(col("_change_type").isin("insert",
      "update_postimage")).select("k", "name")
    val replay = DeltaRead.read(spark, dir, 0).exceptAll(minus)
      .unionAll(plus)
    val v2 = DeltaRead.read(spark, dir, 2)
    assert(replay.exceptAll(v2).count() == 0 &&
      v2.exceptAll(replay).count() == 0,
      "v0 + row-level feed must replay to v2 exactly")
    // a dataChange=false reorganization produces NO changes
    assert(DeltaWrite.optimize(spark, dir) == 3)
    assert(DeltaRead.changes(spark, dir, 2, 3).count() == 0,
      "OPTIMIZE must be invisible to the change feed")
    // vacuum never deletes change data (readers may still consume it)
    Thread.sleep(5)
    DeltaWrite.vacuum(spark, dir, retainMillis = 0L)
    assert(DeltaRead.changes(spark, dir, 0, 1).count() == 10,
      "cdc files must survive vacuum")
  }

  test("DeltaSync: CDF-driven incremental mirror into a SnapshotTable, exactly-once") {
    import sources.{DeltaSync, DeltaWrite, SnapshotTable}
    // CDF-enabled source (hand-created so configuration carries it)
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 50))
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      s"""{"metaData":{"id":"src","format":{"provider":"parquet"},""" +
        s""""schemaString":${om(schemaJson)},"partitionColumns":[],""" +
        s""""configuration":{"delta.enableChangeDataFeed":"true"}}}""",
      add("f0.parquet", 0, 49, 50)))
    val snap = Files.createTempDirectory("graft_sync").toString + "/t"
    def mirrored(): Boolean = {
      val src = DeltaRead.read(spark, dir)
      val tgt = SnapshotTable.read(spark, snap)
      src.exceptAll(tgt).count() == 0 && tgt.exceptAll(src).count() == 0
    }
    // bootstrap lands the full read + watermark in one commit
    assert(DeltaSync.sync(spark, dir, snap, Seq("k")) == 0)
    assert(SnapshotTable.read(spark, snap).count() == 50 && mirrored())
    // replayed call: detected no-op
    val vAfterBootstrap = SnapshotTable.latestVersion(spark, snap)
    assert(DeltaSync.sync(spark, dir, snap, Seq("k")) == 0)
    assert(SnapshotTable.latestVersion(spark, snap) == vAfterBootstrap,
      "a no-change sync must not commit")
    // source mutates through CDF commits: delete + merge
    DeltaWrite.delete(spark, dir, "k >= 40")                     // v1
    DeltaWrite.upsert(spark.createDataFrame(Seq(
      (10L, "updated"), (200L, "fresh"))).toDF("k", "name"),
      dir, Seq("k"))                                             // v2
    assert(DeltaSync.sync(spark, dir, snap, Seq("k")) == 2)
    assert(mirrored(), "target must equal the source after CDF sync")
    assert(SnapshotTable.read(spark, snap)
      .filter(col("k") === 10).head().getString(1) == "updated")
    assert(SnapshotTable.read(spark, snap)
      .filter(col("k") >= 40 && col("k") < 100).count() == 0)
    // append-only advance syncs via derived inserts
    DeltaWrite.append(range(300, 310).coalesce(1), dir)          // v3
    assert(DeltaSync.sync(spark, dir, snap, Seq("k")) == 3)
    assert(mirrored())
    // a mirror lagging past the feed's span bound CHUNKS the walk
    // instead of inheriting the refusal
    DeltaWrite.append(range(310, 315).coalesce(1), dir)          // v4
    DeltaWrite.delete(spark, dir, "k = 300")                     // v5
    DeltaWrite.append(range(315, 320).coalesce(1), dir)          // v6
    spark.conf.set("graft.delta.changes.maxSpan", "1")
    try assert(DeltaSync.sync(spark, dir, snap, Seq("k")) == 6)
    finally spark.conf.unset("graft.delta.changes.maxSpan")
    assert(mirrored(), "chunked sync must mirror exactly")
    // a foreign target without the sync watermark refuses loudly
    val alien = Files.createTempDirectory("graft_sync2").toString + "/t"
    SnapshotTable.create(range(0, 5), alien)
    val e = intercept[IllegalArgumentException] {
      DeltaSync.sync(spark, dir, alien, Seq("k"))
    }
    assert(e.getMessage.contains("watermark"))
  }

  test("DeltaWrite.appendBatch: txn watermark skips replays, survives checkpointing") {
    import sources.DeltaWrite
    val dir = tmp()
    DeltaWrite.create(range(0, 10).coalesce(1), dir)
    assert(DeltaWrite.appendBatch(range(10, 20).coalesce(1), dir,
      "job1", 0L) == 1)
    // replayed batch id: detected, version unchanged, rows land once
    assert(DeltaWrite.appendBatch(range(10, 20).coalesce(1), dir,
      "job1", 0L) == 1)
    assert(DeltaRead.read(spark, dir).count() == 20)
    // a different appId with the same batch id is independent state
    assert(DeltaWrite.appendBatch(range(20, 30).coalesce(1), dir,
      "job2", 0L) == 2)
    // the watermark must survive a checkpoint + cleaned json prefix
    spark.conf.set("graft.delta.checkpoint.interval", "3")
    try {
      assert(DeltaWrite.appendBatch(range(30, 40).coalesce(1), dir,
        "job1", 1L) == 3) // interval hits: classic checkpoint at v3
      assert(java.nio.file.Files.exists(
        Paths.get(dir, "_delta_log", f"${3L}%020d.checkpoint.parquet")))
      (0L to 3L).foreach(v => java.nio.file.Files.delete(
        Paths.get(dir, "_delta_log", f"$v%020d.json")))
      assert(DeltaWrite.appendBatch(range(30, 40).coalesce(1), dir,
        "job1", 1L) == 3,
        "replayed batch must stay skipped after log cleaning — the " +
          "watermark rides the checkpoint")
      assert(DeltaRead.read(spark, dir).count() == 40)
    } finally spark.conf.unset("graft.delta.checkpoint.interval")
  }

  test("stale _last_checkpoint is ignored, not fatal") {
    val dir = buildTable()
    Files.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":3}""") // no checkpoint parquet exists for v1
    val df = DeltaRead.read(spark, dir)
    assert(df.count() == 150, "stale pointer must fall back to commits")
  }

  test("schema evolution carries configuration/createdTime forward verbatim") {
    import sources.DeltaWrite
    // a table created externally with table properties: an evolved
    // metaData that re-emitted configuration:{} would silently wipe
    // delta.appendOnly / retention / CDF settings
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 50))
    val conf = """{"delta.deletedFileRetentionDuration":"interval 2 days",""" +
      """"custom.tag":"keep-me"}"""
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"tbl-1","format":{"provider":"parquet"},""" +
        s""""schemaString":${om(schemaJson)},"partitionColumns":[],""" +
        s""""configuration":$conf,"createdTime":1700000000000}}""",
      add("f0.parquet", 0, 49, 50)))
    assert(DeltaWrite.append(
      range(50, 60).withColumn("score", col("k") * 2).coalesce(1),
      dir, mergeSchema = true) == 1)
    val st = DeltaRead.replay(spark, dir, -1L)
    assert(st.conf.get("custom.tag").contains("keep-me") &&
      st.conf.get("delta.deletedFileRetentionDuration")
        .contains("interval 2 days"),
      s"evolution wiped table configuration: ${st.conf}")
    assert(st.createdTime == 1700000000000L,
      s"evolution reset createdTime to ${st.createdTime}")
    assert(st.metaId == "tbl-1")
    assert(DeltaRead.read(spark, dir).columns.toSeq
      == Seq("k", "name", "score"))
  }

  test("append/evolution refuse malformed-mapped and unknown-feature tables") {
    import sources.DeltaWrite
    // a DEGENERATE mapped table (mode=name but fields carry no
    // physicalName metadata) cannot be physicalized — refuse, never
    // guess (well-formed mapped tables append fine since round 9:
    // DeltaProtocolSpec's column-mapped-writes suite)
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 10))
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"m","format":{"provider":"parquet"},""" +
        s""""schemaString":${om(schemaJson)},"partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"name"}}}""",
      add("f0.parquet", 0, 9, 10)))
    val e1 = intercept[IllegalArgumentException] {
      DeltaWrite.append(range(10, 20).coalesce(1), dir)
    }
    assert(e1.getMessage.contains("physicalName"))
    // unknown writer feature: plain appends are fine (they add files
    // only), but EVOLUTION re-emits metaData and must refuse
    val dir2 = tmp()
    dataFile(dir2, "f0.parquet", range(0, 10))
    commit(dir2, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["appendOnly","identityColumns"]}}""",
      s"""{"metaData":{"id":"w","format":{"provider":"parquet"},""" +
        s""""schemaString":${om(schemaJson)},"partitionColumns":[]}}""",
      add("f0.parquet", 0, 9, 10)))
    val e2 = intercept[IllegalArgumentException] {
      DeltaWrite.append(
        range(10, 20).withColumn("score", col("k")).coalesce(1),
        dir2, mergeSchema = true)
    }
    assert(e2.getMessage.contains("identityColumns"))
  }

  test("remove tombstones: real deletionTimestamp, survive re-checkpointing, expire by retention") {
    import sources.DeltaWrite
    val dir = tmp()
    val before = System.currentTimeMillis()
    DeltaWrite.create(range(0, 50).coalesce(1), dir)   // v0: file A
    DeltaWrite.append(range(50, 100).coalesce(1), dir) // v1: file B
    DeltaWrite.delete(spark, dir, "k >= 90")           // v2: tombstone B
    // the tombstone carries the REAL wall clock (a zero timestamp is
    // instantly past every retention window — a third-party VACUUM
    // could delete the rewritten file under concurrent readers)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rmLine = java.nio.file.Files
      .readString(Paths.get(dir, "_delta_log", f"${2L}%020d.json"))
      .split("\n").find(_.contains("\"remove\"")).get
    val ts = mapper.readTree(rmLine).path("remove")
      .path("deletionTimestamp").asLong()
    assert(ts >= before && ts <= System.currentTimeMillis() + 1000,
      s"deletionTimestamp must be wall clock, got $ts")
    // checkpoint at v2: the unexpired tombstone must ride along
    assert(DeltaWrite.writeCheckpoint(spark, dir, 2L))
    val ckpt = spark.read.parquet(
      Paths.get(dir, "_delta_log", f"${2L}%020d.checkpoint.parquet").toString)
    val tombs = ckpt.filter(col("remove.path").isNotNull)
      .select("remove.path", "remove.deletionTimestamp").collect()
    assert(tombs.length == 1 && tombs.head.getLong(1) == ts,
      s"checkpoint must carry the unexpired tombstone: ${tombs.toSeq}")
    // tombstones survive RE-checkpointing from a checkpoint base
    DeltaWrite.append(range(100, 110).coalesce(1), dir) // v3
    assert(DeltaWrite.writeCheckpoint(spark, dir, 3L))
    val ckpt3 = spark.read.parquet(
      Paths.get(dir, "_delta_log", f"${3L}%020d.checkpoint.parquet").toString)
    assert(ckpt3.filter(col("remove.path").isNotNull).count() == 1,
      "re-checkpoint from a checkpoint base must not drop tombstones")
    // the table still reads correctly from the checkpoint alone
    (0L to 3L).foreach(v => java.nio.file.Files.delete(
      Paths.get(dir, "_delta_log", f"$v%020d.json")))
    assert(DeltaRead.read(spark, dir).count() == 100)
    // an EXPIRED tombstone may drop: retention 0 expires it immediately
    val dir2 = tmp()
    DeltaWrite.create(range(0, 50).coalesce(1), dir2)
    DeltaWrite.delete(spark, dir2, "k >= 40")
    Thread.sleep(5) // strictly past the retention-0 cutoff
    // rewrite the metaData with zero retention via an evolved append
    dataFileRetention(dir2, "interval 0 seconds")
    assert(DeltaWrite.writeCheckpoint(spark, dir2, 1L))
    val ckpt2 = spark.read.parquet(Paths.get(dir2, "_delta_log",
      f"${1L}%020d.checkpoint.parquet").toString)
    assert(ckpt2.filter(col("remove.path").isNotNull).count() == 0,
      "a tombstone past the retention window may be omitted")
    assert(sources.DeltaWrite.retentionMillis(Map.empty)
      == 7L * 24 * 3600 * 1000, "default retention is one week")
    assert(sources.DeltaWrite.retentionMillis(Map(
      "delta.deletedFileRetentionDuration" -> "interval 2 hours"))
      == 2L * 3600 * 1000)
    assert(sources.DeltaWrite.retentionMillis(Map(
      "delta.deletedFileRetentionDuration" -> "garbage"))
      == 7L * 24 * 3600 * 1000, "unparseable retention falls back, " +
        "never silently shortens")
  }

  test("DeltaWrite.optimize: bin-packs small files, dataChange=false, time travel intact") {
    import sources.DeltaWrite
    val dir = tmp()
    DeltaWrite.create(range(0, 10).coalesce(1), dir)
    (1 to 5).foreach(i =>
      DeltaWrite.append(range(i * 10L, i * 10L + 10).coalesce(1), dir))
    val (before, _) = DeltaRead.pruneReport(spark, dir, "k >= 0")
    assert(before == 6)
    val v = DeltaWrite.optimize(spark, dir)
    assert(v == 6)
    val back = DeltaRead.read(spark, dir)
    assert(back.count() == 60)
    assert(back.agg(sum("k")).head().getLong(0) == (0L until 60).sum)
    val (after, _) = DeltaRead.pruneReport(spark, dir, "k >= 0")
    assert(after == 1, s"6 small files must pack into 1, got $after")
    // pure reorganization: every action carries dataChange=false
    val c = java.nio.file.Files.readString(
      Paths.get(dir, "_delta_log", f"${6L}%020d.json"))
    assert(c.split("\n").count(_.contains("\"remove\"")) == 6)
    assert(c.split("\n").count(_.contains("\"add\"")) == 1)
    assert(!c.contains("\"dataChange\":true"),
      s"OPTIMIZE must not signal data change: $c")
    // nothing left to do: no new commit
    assert(DeltaWrite.optimize(spark, dir) == 6)
    // pre-optimize versions still read (vacuum, not optimize, deletes)
    assert(DeltaRead.read(spark, dir, 5).count() == 60)
    // partitioned: bins per partition tuple, hive layout kept
    val dir2 = tmp()
    val parted = range(0, 20).withColumn("bucket", (col("k") % 2).cast("int"))
    DeltaWrite.create(parted.coalesce(1), dir2, partitionBy = Seq("bucket"))
    (1 to 2).foreach(i => DeltaWrite.append(
      range(20L * i, 20L * i + 20).withColumn("bucket",
        (col("k") % 2).cast("int")).coalesce(1), dir2))
    assert(DeltaWrite.optimize(spark, dir2) == 3)
    val (t2, k2) = DeltaRead.pruneReport(spark, dir2, "bucket = 1")
    assert(t2 == 2 && k2 == 1,
      s"one packed file per partition expected: $k2 of $t2")
    assert(DeltaRead.read(spark, dir2).count() == 60)
  }

  test("DeltaWrite.vacuum: deletes only unreachable files past retention") {
    import sources.DeltaWrite
    val dir = tmp()
    DeltaWrite.create(range(0, 50).coalesce(1), dir)   // file A
    DeltaWrite.append(range(50, 100).coalesce(1), dir) // file B
    DeltaWrite.delete(spark, dir, "k >= 90")           // tombstones B, adds C
    def parquets(): Int = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquets() == 3)
    // fresh tombstone + default retention: nothing deletable
    assert(DeltaWrite.vacuum(spark, dir) == 0)
    // zero retention: the tombstoned file goes; live files stay
    Thread.sleep(5)
    assert(DeltaWrite.vacuum(spark, dir, retainMillis = 0L) == 1)
    assert(parquets() == 2)
    val back = DeltaRead.read(spark, dir)
    assert(back.count() == 90 && back.agg(max("k")).head().getLong(0) == 89)
    // time travel to a version referencing the vacuumed file now fails
    // LOUDLY (the documented vacuum horizon), never silently subsets
    intercept[Exception] { DeltaRead.read(spark, dir, 1).collect() }
    // orphans (crashed writers — never logged): deletable once old
    val stray = Paths.get(dir, "stray-orphan.parquet")
    java.nio.file.Files.write(stray, Array[Byte](1, 2, 3))
    assert(DeltaWrite.vacuum(spark, dir) == 0,
      "a FRESH orphan must survive the default window (it may be a " +
        "mid-commit segment)")
    Thread.sleep(5)
    assert(DeltaWrite.vacuum(spark, dir, retainMillis = 0L) == 1)
    assert(!java.nio.file.Files.exists(stray))
  }

  /** Overwrite commit 0's metaData configuration in-place (test rig for
    * retention-sensitive checkpoint behavior).
    */
  private def dataFileRetention(dir: String, interval: String): Unit = {
    val p = Paths.get(dir, "_delta_log", f"${0L}%020d.json")
    val lines = java.nio.file.Files.readString(p).split("\n").map { l =>
      if (!l.contains("metaData")) l
      else l.replace(""""configuration":{}""",
        s""""configuration":{"delta.deletedFileRetentionDuration":"$interval"}""")
    }
    java.nio.file.Files.writeString(p, lines.mkString("\n") + "\n")
  }
}
