package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString

  test("registerAll makes the engine fully SQL-consumable") {
    Tables.registerAll(spark, sf)
    // a table view, the fixed events view, and a registered custom
    // function all resolve from pure SQL
    val r = spark.sql("""
      SELECT count(*) AS n,
        (SELECT count(*) FROM events WHERE ts IS NOT NULL) AS ne,
        (SELECT cosine_sim(embedding, embedding) FROM embeddings
          WHERE vec_id = 0) AS self_cos
      FROM lineitem""").head()
    assert(r.getLong(0) == Tables.lineitem(spark, sf).count())
    assert(r.getLong(1) == Tables.events(spark, sf).count())
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("csv round-trip preserves values") {
    val out = tmp("csv")
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    sources.Writers.writeCsv(src, out)
    val back = sources.Writers.readCsv(spark, out,
      "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("json round-trip preserves values") {
    val out = tmp("json")
    val src = Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_acctbal")
    sources.Writers.writeJson(src, out)
    val back = sources.Writers.readJson(spark, out,
      "c_custkey LONG, c_name STRING, c_acctbal DOUBLE")
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("avro round-trip preserves values and types (no spark-avro needed)") {
    val out = tmp("avro") + "/t"
    val src = Tables.events(spark, sf).select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"),
      col("value"), split(col("event_type"), "_").as("tags"),
      encode(col("event_type"), "UTF-8").as("payload"),
      to_date(col("ts")).as("day"),
      (col("event_id") % 2 === 0).as("even"),
      col("event_id").cast("int").as("small"),
      col("value").cast("float").as("valf"))
    sources.AvroIO.write(src, out)
    val back = sources.AvroIO.read(spark, out)
    // schema round-trips by name and type (nullability aside)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == src.count())
    assert(back.exceptAll(back.sparkSession.createDataFrame(
      src.collectAsList(), src.schema)).isEmpty &&
      src.exceptAll(back).isEmpty && back.exceptAll(src).isEmpty)
  }

  test("avro empty write round-trips schema with zero rows") {
    val out = tmp("avro_empty") + "/t"
    val src = spark.range(0).select(col("id"), lit("x").as("tag"))
    sources.AvroIO.write(src, out)
    val back = sources.AvroIO.read(spark, out)
    assert(back.count() == 0)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("avro mergeSchema-style evolution: old files surface nulls for new fields") {
    val dir = tmp("avro_evo") + "/t"
    val v1 = spark.range(0, 10).select(col("id"), lit("a").as("tag"))
    sources.AvroIO.write(v1, dir + "/batch1")
    // evolved writer adds a column
    val v2 = spark.range(10, 15).select(col("id"), lit("b").as("tag"),
      (col("id") * 2).as("score"))
    sources.AvroIO.write(v2, dir + "/batch2")
    // one merged read over both batches' files
    val fs = new java.io.File(new java.net.URI("file:" + dir))
    val flat = tmp("avro_flat") + "/t"
    new java.io.File(new java.net.URI("file:" + flat)).mkdirs()
    Seq("batch1", "batch2").foreach { b =>
      new java.io.File(fs, b).listFiles().filter(_.getName.endsWith(".avro"))
        .foreach { f =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(flat, b + "_" + f.getName))
        }
    }
    val merged = sources.AvroIO.read(spark, flat)
    assert(merged.columns.toSeq == Seq("id", "tag", "score"))
    assert(merged.count() == 15)
    // pre-evolution rows surface null in the new column; new rows carry it
    assert(merged.filter(col("score").isNull).count() == 10)
    assert(merged.filter(col("id") === 12).head().getLong(2) == 24L)
    // type conflict on a shared name refuses loudly
    val bad = spark.range(0, 3).select(col("id").cast("string").as("id"))
    sources.AvroIO.write(bad, dir + "/batch_bad")
    new java.io.File(new java.io.File(new java.net.URI("file:" + dir)), "batch_bad")
      .listFiles().filter(_.getName.endsWith(".avro")).foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(flat, "bad_" + f.getName))
      }
    val e = intercept[IllegalArgumentException] {
      sources.AvroIO.read(spark, flat).count()
    }
    assert(e.getMessage.contains("additive"))
  }

  test("partitioned write -> partition-pruned read") {
    val out = tmp("part")
    sources.Writers.writePartitioned(
      Tables.orders(spark, sf), out, Seq("o_orderpriority"))
    val pruned = spark.read.parquet(out).filter(col("o_orderpriority") === "1-URGENT")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("partitionFilters"),
      s"no partition filter in plan:\n$plan")
    val expected = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(pruned.count() == expected)
  }

  test("orc round-trip preserves values") {
    val out = tmp("orc")
    val src = Tables.nation(spark, sf)
    sources.Writers.writeOrc(src, out)
    val back = sources.Writers.readOrc(spark, out)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    val out = tmp("dynpart")
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    sources.Writers.writePartitioned(orders, out, Seq("o_orderpriority"))
    val before = spark.read.parquet(out).count()
    // overwrite ONE priority partition with halved prices
    val patch = orders.filter(col("o_orderpriority") === "1-URGENT")
      .withColumn("o_totalprice", col("o_totalprice") / 2)
    sources.Writers.overwritePartitions(patch, out, Seq("o_orderpriority"))
    val after = spark.read.parquet(out)
    assert(after.count() == before, "sibling partitions were clobbered")
    val untouched = after.filter(col("o_orderpriority") === "2-HIGH").count()
    assert(untouched == orders.filter(col("o_orderpriority") === "2-HIGH").count())
    val patched = after.filter(col("o_orderpriority") === "1-URGENT")
      .agg(sum("o_totalprice")).collect()(0).getDouble(0)
    val expected = orders.filter(col("o_orderpriority") === "1-URGENT")
      .agg(sum("o_totalprice") / 2).collect()(0).getDouble(0)
    assert(math.abs(patched - expected) < 1e-6)
  }

  test("mergeSchema read unions evolved schemas; old files get nulls") {
    val out = tmp("evolve")
    Tables.region(spark, sf).select("r_regionkey", "r_name")
      .write.parquet(s"$out/batch=0")
    Tables.region(spark, sf).select(col("r_regionkey"), col("r_name"),
        lit("v2").as("schema_version"))
      .write.parquet(s"$out/batch=1")
    val merged = sources.Writers.readMergedSchema(spark, out)
    assert(merged.columns.toSet ==
      Set("r_regionkey", "r_name", "schema_version", "batch"))
    assert(merged.where(col("batch") === 0 && col("schema_version").isNull).count() ==
      Tables.region(spark, sf).count())
  }

  test("binaryFile source ingests opaque payloads with metadata") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin")
    try {
      val payloads = Map("a.img" -> "fake-image-bytes-AAAA",
        "b.img" -> "fake-image-bytes-BB", "c.txt" -> "not-an-image")
      payloads.foreach { case (name, content) =>
        java.nio.file.Files.write(dir.resolve(name), content.getBytes("UTF-8"))
      }
      // the multimodal ingest path: opaque binary + file metadata columns,
      // with pushdown-style pruning via pathGlobFilter
      val df = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.img")
        .load(dir.toString)
      assert(df.columns.toSet ==
        Set("path", "modificationTime", "length", "content"))
      val rows = df.collect()
      assert(rows.length == 2, "pathGlobFilter should exclude c.txt")
      val byName = rows.map(r => r.getString(0).split('/').last ->
        new String(r.getAs[Array[Byte]]("content"), "UTF-8")).toMap
      assert(byName == payloads.filter(_._1.endsWith(".img")))
      assert(rows.forall(r => r.getLong(2) ==
        payloads(r.getString(0).split('/').last).length))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("corrupt-record ingest: PERMISSIVE quarantines, DROPMALFORMED drops, count agrees") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_corrupt").toString
    Files.write(Paths.get(dir, "data.json"), Seq(
      """{"id": 1, "v": "ok"}""",
      """{"id": 2, "v": "also ok"}""",
      """{"id": broken not json""",
      """{"id": 4, "v": "fine"}""",
      """]]]""").mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_corrupt_record", org.apache.spark.sql.types.StringType)))
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    val bad = permissive.filter(col("_corrupt_record").isNotNull)
    val good = permissive.filter(col("_corrupt_record").isNull)
    assert(bad.count() == 2, "quarantine lane should hold exactly the 2 bad lines")
    assert(good.count() == 3)
    val dropped = spark.read
      .schema(schema.copy(fields = schema.fields.dropRight(1)))
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() == good.count(),
      "DROPMALFORMED must agree with the PERMISSIVE good lane")
    permissive.unpersist()
  }

  test("fixed-width text ingest parses positional fields; bad casts null out") {
    val dir = tmp("fixedwidth")
    // 6-char key, 10-char name, 8-char amount (one malformed row)
    val lines = Seq(
      "000001Widget     00012.50",
      "000002Gadget     00099.99",
      "00000XBroken     notanum ")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.txt"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val df = sources.Writers.readFixedWidth(spark, dir, Seq(
      ("item_key", 1, 6, "bigint"),
      ("item_name", 7, 11, "string"),
      ("amount", 18, 8, "double")))
    val rows = df.orderBy(col("item_name")).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(1)).toSeq == Seq("Broken", "Gadget", "Widget"))
    assert(rows(2).getLong(0) == 1L && rows(2).getDouble(2) == 12.50)
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(2), "malformed casts must null out")
    // narrow plan: no Exchange anywhere in a pure projection read
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("jdbc round-trip: write, read back, filter+projection pushed down") {
    // embedded Derby, in-JVM (ships with Spark — the swap to Postgres/
    // MySQL is just the URL); memory: DB dies with the suite
    val url = "jdbc:derby:memory:graft_jdbc;create=true"
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    sources.JdbcIO.writeJdbc(src, url, "orders_j")
    val back = sources.JdbcIO.readJdbc(spark, url, "orders_j")
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // pushdown: the filter must reach the database as SQL, not run in
    // Spark over a full-table pull — the scan node advertises it
    val filtered = back.filter(col("o_totalprice") > 50000.0)
      .select("o_orderkey", "o_totalprice")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("o_totalprice"),
      s"filter not pushed to JDBC source:\n$scan")
    // column pruning: only the 2 projected columns in the scan schema
    assert(!scan.contains("o_orderstatus"),
      s"projection not pruned at the JDBC scan:\n$scan")
    val expected = src.filter(col("o_totalprice") > 50000.0).count()
    assert(filtered.count() == expected)
  }

  test("jdbc partitioned read: numPartitions range queries, same rows") {
    val url = "jdbc:derby:memory:graft_jdbc2;create=true"
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    sources.JdbcIO.writeJdbc(src, url, "orders_p")
    val bounds = src.agg(min("o_orderkey"), max("o_orderkey")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val part = sources.JdbcIO.readJdbcPartitioned(
      spark, url, "orders_p", "o_orderkey", lo, hi + 1, 4)
    // the parallelism contract: one range-bounded query per partition
    assert(part.rdd.getNumPartitions == 4,
      s"expected 4 JDBC partitions, got ${part.rdd.getNumPartitions}")
    // range predicates must not drop or duplicate boundary rows
    assert(part.count() == src.count())
    assert(part.exceptAll(src).isEmpty && src.exceptAll(part).isEmpty)
    // every partition non-empty on a dense key (stride sanity)
    val sizes = part.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.forall(_ > 0), s"empty JDBC partitions: ${sizes.toList}")
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      sources.Writers.writeBucketed(
        Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
        "orders_b", "o_orderkey", 4)
      sources.Writers.writeBucketed(
        Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
        "lineitem_b", "l_orderkey", 4)
      val joined = spark.table("orders_b").join(
        spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
