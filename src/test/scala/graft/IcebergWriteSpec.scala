package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Iceberg WRITER round-trips: create+append through [[IcebergWrite]]
  * read back via [[IcebergRead]] (the same cross-validation the Delta
  * leg gets), bounds-driven pruning from footer-harvested stats,
  * snapshot time travel, and the loud refusal gates.
  */
class IcebergWriteSpec extends AnyFunSuite {
  import SparkTestSession._
  import sources.{IcebergRead, IcebergWrite}

  private def tmp(): String =
    Files.createTempDirectory("graft_icew").toString + "/t"

  private def range(lo: Long, hi: Long) = spark.range(lo, hi)
    .select(col("id").as("k"),
      concat(lit("u"), col("id").cast("string")).as("name"))

  test("create + append round-trip through IcebergRead with time travel") {
    val dir = tmp()
    assert(IcebergWrite.create(range(0, 100).coalesce(1), dir) == 1L)
    assert(IcebergWrite.append(range(100, 150).coalesce(1), dir) == 2L)
    val back = IcebergRead.read(spark, dir)
    assert(back.columns.toSeq == Seq("k", "name"))
    assert(back.count() == 150)
    assert(back.agg(sum("k")).head().getLong(0) == (0L until 150).sum)
    // snapshot time travel sees the pre-append table
    val v1 = IcebergRead.read(spark, dir, snapshotId = 1)
    assert(v1.count() == 100 && v1.agg(max("k")).head().getLong(0) == 99)
    // footer-harvested bounds made it into the manifests and prune
    val (total, kept) = IcebergRead.pruneReport(spark, dir, "k >= 120")
    assert(total >= 2 && kept == 1, s"bounds skipping broken: $kept of $total")
    assert(IcebergRead.readWhere(spark, dir, "k >= 120").count() == 30)
  }

  test("changes: snapshot-range feed replays exactly across append/upsert/delete") {
    val dir = tmp()
    IcebergWrite.create(range(0, 50).coalesce(1), dir)     // snap 1
    IcebergWrite.append(range(50, 100).coalesce(1), dir)   // snap 2
    IcebergWrite.upsert(spark.createDataFrame(               // snap 3:
        Seq((10L, "updated"), (200L, "fresh")))              // eq-delete
      .toDF("k", "name"), dir, Seq("k"))                     // + insert
    IcebergWrite.delete(spark, dir, "k >= 90 AND k < 95")  // snap 4: pos
    val feed = IcebergRead.changes(spark, dir, 1, 4)
    assert(feed.columns.toSeq
      == Seq("k", "name", "_change_type", "_snapshot_id"))
    assert(feed.select("_snapshot_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L, 4L),
      "per-snapshot attribution")
    val dels = feed.filter(col("_change_type") === "delete")
      .drop("_change_type", "_snapshot_id")
    val ins = feed.filter(col("_change_type") === "insert")
      .drop("_change_type", "_snapshot_id")
    // replay contract (multiset): (read@1 + inserts) - deletes == read@4
    // — union BEFORE except, so a row inserted and then deleted inside
    // the range cancels correctly
    val v1 = IcebergRead.read(spark, dir, snapshotId = 1)
    val v4 = IcebergRead.read(spark, dir)
    val replay = v1.unionAll(ins).exceptAll(dels)
    assert(replay.exceptAll(v4).count() == 0 &&
      v4.exceptAll(replay).count() == 0,
      "snap1 + feed must replay to snap4 exactly")
    // the upsert surfaces its MINIMAL pair: old row out, new row in
    assert(feed.filter(col("k") === 10 &&
      col("_change_type") === "delete").head().getString(1) == "u10")
    assert(feed.filter(col("k") === 10 &&
      col("_change_type") === "insert").head().getString(1) == "updated")
    // an append-only pair contributes inserts only
    assert(feed.filter(col("_snapshot_id") === 2 &&
      col("_change_type") === "delete").count() == 0)
    // the position delete kills exactly its 5 rows of the KEPT file
    val s4 = feed.filter(col("_snapshot_id") === 4)
    assert(s4.count() == 5 &&
      s4.filter(col("_change_type") === "delete").count() == 5)
    // same feed from plain SQL
    api.SqlSurface.install(spark)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_iceberg_changes('$dir', 1, 4)")
      .head().getLong(0) == feed.count())
    // refusals: unknown endpoint; schema evolution inside the range
    val e = intercept[IllegalArgumentException] {
      IcebergRead.changes(spark, dir, 99, 4)
    }
    assert(e.getMessage.contains("not found"))
    IcebergWrite.append(range(200, 201)
      .withColumn("score", lit(1L)).coalesce(1), dir,
      mergeSchema = true)                                   // snap 5
    val e2 = intercept[IllegalArgumentException] {
      IcebergRead.changes(spark, dir, 4, 5)
    }
    assert(e2.getMessage.contains("schema changed"))
  }

  test("decimal columns: create/append/upsert round-trip with bounds pruning") {
    import org.apache.spark.sql.types._
    val dir = tmp()
    // all three parquet backings: INT32 (<=9), INT64 (<=18), FLBA (38)
    def mk(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as("k"),
      col("id").cast("decimal(9,2)").as("d9"),
      col("id").cast("decimal(18,4)").as("d18"),
      col("id").cast("decimal(38,6)").as("d38"))
    IcebergWrite.create(
      mk(0, 100).repartitionByRange(4, col("k")).sortWithinPartitions("k"),
      dir)
    val back = IcebergRead.read(spark, dir)
    assert(back.schema("d9").dataType == DecimalType(9, 2))
    assert(back.schema("d18").dataType == DecimalType(18, 4))
    assert(back.schema("d38").dataType == DecimalType(38, 6))
    assert(back.count() == 100)
    assert(back.agg(sum("d9")).head().getDecimal(0)
      .compareTo(new java.math.BigDecimal((0L until 100).sum)) == 0)
    // decimal bounds landed (unscaled big-endian two's complement) and
    // prune through the scaled-BigDecimal compare domain
    val (t9, k9) = IcebergRead.pruneReport(spark, dir, "d9 >= 75.00")
    assert(t9 == 4 && k9 == 1, s"d9 pruning: $k9 of $t9")
    val (t18, k18) = IcebergRead.pruneReport(spark, dir, "d18 < 25.0")
    assert(t18 == 4 && k18 == 1, s"d18 pruning: $k18 of $t18")
    val (t38, k38) = IcebergRead.pruneReport(spark, dir, "d38 = 50.5")
    assert(t38 == 4 && k38 <= 1, s"d38 pruning: $k38 of $t38")
    Seq("d9 >= 75.00", "d18 < 25.0", "d38 >= 50.0 AND d38 < 75.0")
      .foreach { p =>
        assert(IcebergRead.readWhere(spark, dir, p).count()
          == back.filter(p).count(), s"pruned read mismatch for $p")
      }
    // append + merge-on-read upsert keep the decimal leg whole
    IcebergWrite.append(mk(100, 120).coalesce(1), dir)
    assert(IcebergRead.read(spark, dir).count() == 120)
    val upd = spark.createDataFrame(Seq((5L, "999.99", "1.2345", "7.000001")))
      .toDF("k", "d9", "d18", "d38")
      .select(col("k"), col("d9").cast("decimal(9,2)").as("d9"),
        col("d18").cast("decimal(18,4)").as("d18"),
        col("d38").cast("decimal(38,6)").as("d38"))
    IcebergWrite.upsert(upd, dir, Seq("k"))
    val after = IcebergRead.read(spark, dir)
    assert(after.count() == 120)
    assert(after.filter(col("k") === 5).head().getDecimal(1)
      .compareTo(new java.math.BigDecimal("999.99")) == 0,
      "the upserted decimal row must win")
  }

  test("nested struct/array/map + binary columns round-trip (round 10)") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    def mk(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as("k"),
      struct(col("id").as("a"),
        concat(lit("s"), col("id").cast("string")).as("b")).as("st"),
      array(col("id"), col("id") * 2).as("ar"),
      map(concat(lit("m"), col("id").cast("string")), col("id")).as("mp"),
      col("id").cast("string").cast("binary").as("bin"))
    IcebergWrite.create(mk(0, 50).coalesce(2), dir)
    val back = IcebergRead.read(spark, dir)
    // the METADATA-declared schema is served, not parquet inference
    assert(back.schema("st").dataType ==
      StructType(Seq(StructField("a", LongType),
        StructField("b", StringType))))
    assert(back.schema("ar").dataType == ArrayType(LongType))
    assert(back.schema("mp").dataType == MapType(StringType, LongType))
    assert(back.schema("bin").dataType == BinaryType)
    assert(back.count() == 50)
    assert(back.select(sum(col("st.a"))).head().getLong(0)
      == (0L until 50).sum)
    assert(new String(back.filter(col("k") === 7)
      .head().getAs[Array[Byte]]("bin"), "UTF-8") == "7")
    // schema JSON: nested ids are table-wide-unique and last-column-id
    // covers them (the spec's invariant for every nesting level)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaFile = new java.io.File(dir, "metadata").listFiles()
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .maxBy(_.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toInt)
    val root = om.readTree(metaFile)
    val curId = root.path("current-schema-id").asInt
    val schemaNode = root.path("schemas").elements().asScala
      .find(_.path("schema-id").asInt == curId).get
    def ids(n: com.fasterxml.jackson.databind.JsonNode): Seq[Int] = {
      val own = Seq("id", "element-id", "key-id", "value-id")
        .flatMap(k => if (n.has(k)) Seq(n.path(k).asInt) else Nil)
      val kids = n.properties().asScala.toSeq
        .filterNot(e => e.getKey == "schema-id")
        .flatMap(e => e.getValue match {
          case a if a.isArray  => a.elements().asScala.toSeq.flatMap(ids)
          case o if o.isObject => ids(o)
          case _ => Nil
        })
      own ++ kids
    }
    val allIds = ids(schemaNode)
    assert(allIds.distinct.size == allIds.size,
      s"nested field ids collide: $allIds")
    assert(root.path("last-column-id").asInt >= allIds.max,
      "last-column-id must cover nested ids")
    // plain append: the batch can't know the table's nested ids —
    // evolution comparison is LOGICAL
    IcebergWrite.append(mk(50, 70).coalesce(1), dir)
    assert(IcebergRead.read(spark, dir).count() == 70)
    // merge-on-read upsert with a primitive key carries nested payloads
    val upd = mk(5, 6).withColumn("bin", lit("zz").cast("binary"))
    IcebergWrite.upsert(upd, dir, Seq("k"))
    val after = IcebergRead.read(spark, dir)
    assert(after.count() == 70)
    assert(new String(after.filter(col("k") === 5)
      .head().getAs[Array[Byte]]("bin"), "UTF-8") == "zz")
    // a NESTED equality key refuses by name
    val eK = intercept[IllegalArgumentException] {
      IcebergWrite.upsert(mk(6, 7), dir, Seq("st"))
    }
    assert(eK.getMessage.contains("nested"))
    // evolution: a NEW nested column mints fresh ids past
    // last-column-id; old files surface NULL
    val beforeLast = root.path("last-column-id").asInt
    IcebergWrite.append(
      mk(70, 75).withColumn("st2", struct(col("k").as("z"))),
      dir, mergeSchema = true)
    val b2 = IcebergRead.read(spark, dir)
    assert(b2.filter(col("st2").isNotNull).count() == 5)
    assert(b2.filter(col("st2").isNull).count() == 70)
    val root2 = om.readTree(new java.io.File(dir, "metadata").listFiles()
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .maxBy(_.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toInt))
    assert(root2.path("last-column-id").asInt >= beforeLast + 2,
      "st2 and its inner field must each consume a fresh id")
  }

  test("schema drift and unsupported types refuse loudly") {
    val dir = tmp()
    IcebergWrite.create(range(0, 10).coalesce(1), dir)
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.append(
        spark.range(0, 1).select(col("id").as("k")), dir)
    }
    assert(e.getMessage.contains("schema"))
    // an unsupported LEAF inside a nested type still refuses loudly
    val e2 = intercept[IllegalArgumentException] {
      IcebergWrite.create(
        spark.range(0, 1).select(struct(lit(null).as("a")).as("s")), tmp())
    }
    assert(e2.getMessage.contains("unsupported"))
    // double-create refused
    val e3 = intercept[IllegalArgumentException] {
      IcebergWrite.create(range(0, 1), dir)
    }
    assert(e3.getMessage.contains("append"))
  }

  test("racing appends: every row lands exactly once, distinct snapshots") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = tmp()
    IcebergWrite.create(range(0, 10).coalesce(1), dir)
    val pool = Executors.newFixedThreadPool(3)
    val gate = new CountDownLatch(1)
    val outcomes = (0 until 3).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          gate.await()
          IcebergWrite.append(
            range(100 + i * 10, 110 + i * 10).coalesce(1), dir)
        }
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    val snaps = outcomes.map(_.get()).sorted
    assert(snaps == Seq(2L, 3L, 4L),
      s"each append must win a distinct snapshot: $snaps")
    val back = IcebergRead.read(spark, dir)
    assert(back.count() == 40)
    assert(back.select("k").distinct().count() == 40, "no row duplicated")
  }

  test("a stale version-hint falls back to the listing") {
    val dir = tmp()
    IcebergWrite.create(range(0, 10).coalesce(1), dir)
    IcebergWrite.append(range(10, 20).coalesce(1), dir)
    // overwrite through the hadoop fs (keeps the .crc sidecar in sync)
    val hp = new org.apache.hadoop.fs.Path(s"$dir/metadata/version-hint.text")
    val hf = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = hf.create(hp, true)
    try o.write("99".getBytes("UTF-8")) finally o.close()
    assert(IcebergRead.read(spark, dir).count() == 20,
      "hint to a missing metadata file must fall back to the listing")
  }

  test("v2 metadata is spec-complete; snapshot history persists verbatim") {
    val dir = tmp()
    IcebergWrite.create(range(0, 100).coalesce(2), dir)      // seq 1
    IcebergWrite.append(range(100, 150).coalesce(1), dir)    // seq 2
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def meta(v: Int) = mapper.readTree(
      Files.readString(java.nio.file.Paths.get(
        dir, "metadata", s"v$v.metadata.json")))
    val m2 = meta(2)
    // v2-required top-level fields
    assert(m2.path("format-version").asInt() == 2)
    assert(m2.path("last-sequence-number").asLong() == 2L)
    assert(m2.has("last-partition-id"))
    assert(m2.path("last-column-id").asInt() == 2)
    // snapshots carry sequence-number + schema-id; history persists
    val snaps = m2.path("snapshots").elements()
    val s1 = snaps.next(); val s2 = snaps.next()
    assert(s1.path("sequence-number").asLong() == 1L)
    assert(s2.path("sequence-number").asLong() == 2L)
    assert(s2.path("parent-snapshot-id").asLong() == 1L)
    val ts1AtV1 = meta(1).path("snapshots").elements().next()
      .path("timestamp-ms").asLong()
    assert(s1.path("timestamp-ms").asLong() == ts1AtV1,
      "a commit must never restamp prior snapshots' timestamps")
    // manifest list rows carry the v2 sequence/count fields
    val listRel = s2.path("manifest-list").asText()
    val rows = readAvro(s"$dir/$listRel")
    assert(rows.size == 2, "prior manifest carries forward")
    val newest = rows.maxBy(_.get("sequence_number").toString.toLong)
    assert(newest.get("sequence_number").toString.toLong == 2L)
    assert(newest.get("min_sequence_number").toString.toLong == 2L)
    assert(newest.get("added_data_files_count").toString.toInt == 1)
    assert(newest.get("added_rows_count").toString.toLong == 50L)
    val carried = rows.minBy(_.get("sequence_number").toString.toLong)
    assert(carried.get("sequence_number").toString.toLong == 1L)
    assert(carried.get("added_rows_count").toString.toLong == 100L)
    // record_count is PER FILE (create wrote 2 files of a 100-row batch)
    val m1rows = readAvro(
      s"$dir/${carried.get("manifest_path").toString}")
    val counts = m1rows.map(_.get("data_file")
      .asInstanceOf[org.apache.avro.generic.GenericRecord]
      .get("record_count").toString.toLong)
    assert(counts.size == 2 && counts.sum == 100L && counts.forall(_ < 100L),
      s"per-file record counts, not the batch total: $counts")
    // manifest avro carries the spec's file metadata + field-id props
    val mPath = s"$dir/${newest.get("manifest_path").toString}"
    val (mMeta, mSchema) = avroMeta(mPath)
    assert(mMeta.get("format-version").contains("2"))
    assert(mMeta.contains("schema") && mMeta.contains("partition-spec"))
    val dfField = mSchema.getField("data_file")
    assert(dfField.getObjectProp("field-id") != null,
      "avro fields must carry field-id props for id-resolving readers")
    assert(dfField.schema().getField("partition") != null,
      "data_file must carry the required partition struct")
  }

  test("partition transforms: days(ts) create+append round-trip with 1-of-N pruning") {
    val dir = tmp()
    // 30 rows over three distinct UTC days (an hour past midnight)
    val df = spark.range(0, 30).select(col("id").as("k"),
      expr("timestamp_micros(CAST(id DIV 10 AS BIGINT) * 86400000000 " +
        "+ 3600000000)").as("ts"))
    IcebergWrite.create(df.coalesce(1), dir, Seq("days(ts)"))
    val back = IcebergRead.read(spark, dir)
    assert(back.columns.toSeq == Seq("k", "ts") && back.count() == 30,
      "data files carry the SOURCE columns; the day value is spec-only")
    // one file per day → a timestamp range predicate opens 1 of 3
    val pred = "ts >= TIMESTAMP'1970-01-03 00:00:00'"
    val (total, kept) = IcebergRead.pruneReport(spark, dir, pred)
    assert(total == 3 && kept == 1, s"day pruning: $kept of $total")
    // readWhere == read.filter exactly
    assert(IcebergRead.readWhere(spark, dir, pred).collect().toSet
      == IcebergRead.read(spark, dir).filter(expr(pred)).collect().toSet)
    // equality inside a day keeps exactly that day's file
    val eqPred = "ts = TIMESTAMP'1970-01-02 01:00:00'"
    assert(IcebergRead.pruneReport(spark, dir, eqPred)._2 == 1)
    // appends flow through the same transform (a fourth day)
    IcebergWrite.append(spark.range(30, 40).select(col("id").as("k"),
      expr("timestamp_micros(3 * 86400000000 + 3600000000)").as("ts"))
      .coalesce(1), dir)
    val (t2, k2) = IcebergRead.pruneReport(spark, dir,
      "ts >= TIMESTAMP'1970-01-04 00:00:00'")
    assert(t2 == 4 && k2 == 1, s"append pruning: $k2 of $t2")
    assert(IcebergRead.read(spark, dir).count() == 40)
    // the spec records the canonical transform string
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(Files.readString(
      java.nio.file.Paths.get(dir, "metadata", "v1.metadata.json")))
    val fld = meta.path("partition-specs").elements().next()
      .path("fields").elements().next()
    assert(fld.path("transform").asText() == "day"
      && fld.path("name").asText() == "ts_day")
  }

  test("partition transforms: hours(ts) + months(d)/years(d) prune 1-of-N; hour-of-date refuses") {
    // hour-partitioned event table — the streaming-ingest default
    val dir = tmp()
    val df = spark.range(0, 40).select(col("id").as("k"),
      expr("timestamp_micros(CAST(id DIV 10 AS BIGINT) * 3600000000 " +
        "+ 60000000)").as("ts")) // 4 distinct hours, a minute past each
    IcebergWrite.create(df.coalesce(1), dir, Seq("hours(ts)"))
    assert(IcebergRead.read(spark, dir).count() == 40)
    val pred = "ts >= TIMESTAMP'1970-01-01 03:00:00'"
    val (total, kept) = IcebergRead.pruneReport(spark, dir, pred)
    assert(total == 4 && kept == 1, s"hour pruning: $kept of $total")
    assert(IcebergRead.readWhere(spark, dir, pred).collect().toSet
      == IcebergRead.read(spark, dir).filter(expr(pred)).collect().toSet)
    assert(IcebergRead.pruneReport(spark, dir,
      "ts = TIMESTAMP'1970-01-01 01:01:00'")._2 == 1)
    // appends flow through the same transform (a fifth hour)
    IcebergWrite.append(spark.range(40, 45).select(col("id").as("k"),
      expr("timestamp_micros(4 * 3600000000 + 60000000)").as("ts"))
      .coalesce(1), dir)
    val (t2, k2) = IcebergRead.pruneReport(spark, dir,
      "ts >= TIMESTAMP'1970-01-01 04:00:00'")
    assert(t2 == 5 && k2 == 1, s"append hour pruning: $k2 of $t2")
    // canonical transform string in the spec
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(Files.readString(
      java.nio.file.Paths.get(dir, "metadata", "v1.metadata.json")))
    val fld = meta.path("partition-specs").elements().next()
      .path("fields").elements().next()
    assert(fld.path("transform").asText() == "hour"
      && fld.path("name").asText() == "ts_hour")
    // months(d) and years(d) over DATE sources
    val dir2 = tmp()
    val dfd = spark.sql(
      """SELECT id AS k, DATE'2024-01-15' + CAST(id DIV 10 AS INT) * 40 AS d
         FROM range(0, 40)""") // 4 dates spanning 4 months, 2 years
    IcebergWrite.create(dfd.coalesce(1), dir2, Seq("months(d)"))
    val (tm, km) =
      IcebergRead.pruneReport(spark, dir2, "d >= DATE'2024-05-01'")
    assert(tm == 4 && km == 1, s"month pruning: $km of $tm")
    assert(IcebergRead.readWhere(spark, dir2, "d = DATE'2024-02-24'")
      .count() == 10)
    val dir3 = tmp()
    val dfy = spark.sql(
      """SELECT id AS k, DATE'2023-06-01' + CAST(id DIV 10 AS INT) * 365 AS d
         FROM range(0, 30)""")
    IcebergWrite.create(dfy.coalesce(1), dir3, Seq("years(d)"))
    val (ty, ky) =
      IcebergRead.pruneReport(spark, dir3, "d >= DATE'2025-01-01'")
    assert(ty == 3 && ky == 1, s"year pruning: $ky of $ty")
    assert(IcebergRead.readWhere(spark, dir3, "d >= DATE'2025-01-01'")
      .collect().toSet
      == IcebergRead.read(spark, dir3)
        .filter(col("d") >= lit("2025-01-01").cast("date"))
        .collect().toSet)
    // hour over a DATE source refuses by name (spec: timestamps only)
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.create(dfd.coalesce(1), tmp(), Seq("hours(d)"))
    }
    assert(e.getMessage.contains("timestamp only"), e.getMessage)
  }

  test("partition transforms: bucket(N, k) prunes equality probes to one file") {
    val dir = tmp()
    IcebergWrite.create(range(0, 40).coalesce(1), dir, Seq("bucket(8, k)"))
    val back = IcebergRead.read(spark, dir)
    assert(back.count() == 40)
    val (total, kept) = IcebergRead.pruneReport(spark, dir, "k = 5")
    assert(total > 1 && kept == 1, s"bucket pruning: $kept of $total")
    assert(IcebergRead.readWhere(spark, dir, "k = 5").collect().toSet
      == back.filter(col("k") === 5).collect().toSet)
    // IN-lists keep the union of probed buckets; ranges keep everything
    val inKept = IcebergRead.pruneReport(spark, dir, "k IN (5, 17)")._2
    assert(inKept >= 1 && inKept <= 2)
    assert(IcebergRead.pruneReport(spark, dir, "k >= 5")._2 == total,
      "bucket is not order-preserving — ranges must not prune")
    // string buckets prune too (spec murmur3 over UTF-8 bytes)
    val dir2 = tmp()
    IcebergWrite.create(range(0, 40).coalesce(1), dir2,
      Seq("bucket(4, name)"))
    val nm = range(0, 1).head().getString(1)
    val (t2, k2) = IcebergRead.pruneReport(spark, dir2, s"name = '$nm'")
    assert(t2 > 1 && k2 == 1, s"string bucket pruning: $k2 of $t2")
    assert(IcebergRead.readWhere(spark, dir2, s"name = '$nm'")
      .collect().toSet
      == IcebergRead.read(spark, dir2)
        .filter(col("name") === nm).collect().toSet)
  }

  test("bucket(N, date) writes under ANSI; NULL string partition sources refuse, not NPE") {
    // ANSI Spark disallows DATE→BIGINT casts: the writer must compute
    // epoch days explicitly before the murmur3 hash (the reader side
    // already hashes date-days for external tables)
    val dir = tmp()
    val df = spark.sql(
      """SELECT id AS k, DATE'2024-01-01' + CAST(id AS INT) AS d
         FROM range(0, 40)""")
    IcebergWrite.create(df.coalesce(1), dir, Seq("bucket(8, d)"))
    val back = IcebergRead.read(spark, dir)
    assert(back.count() == 40)
    val (total, kept) =
      IcebergRead.pruneReport(spark, dir, "d = DATE'2024-01-05'")
    assert(total > 1 && kept == 1, s"date bucket pruning: $kept of $total")
    assert(IcebergRead.readWhere(spark, dir, "d = DATE'2024-01-05'")
      .collect().toSet
      == back.filter(col("d") === lit("2024-01-05").cast("date"))
        .collect().toSet)
    // NULL STRING partition sources flow to the modeled refusal (the
    // UDF null-guards) instead of dying as an NPE task failure
    val withNull = range(0, 5).withColumn("name",
      when(col("k") === 2, lit(null)).otherwise(col("name")))
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.create(withNull.coalesce(1), tmp(),
        Seq("bucket(4, name)"))
    }
    assert(e.getMessage.contains("NULL partition"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      IcebergWrite.create(withNull.coalesce(1), tmp(),
        Seq("truncate(2, name)"))
    }
    assert(e2.getMessage.contains("NULL partition"), e2.getMessage)
  }

  test("partition transforms: truncate(W, k) zone-maps ranges; unknown transforms refuse") {
    val dir = tmp()
    IcebergWrite.create(range(0, 30).coalesce(1), dir,
      Seq("truncate(10, k)"))
    val (total, kept) = IcebergRead.pruneReport(spark, dir, "k >= 20")
    assert(total == 3 && kept == 1, s"truncate pruning: $kept of $total")
    assert(IcebergRead.pruneReport(spark, dir, "k = 5")._2 == 1)
    assert(IcebergRead.readWhere(spark, dir, "k >= 20").collect().toSet
      == IcebergRead.read(spark, dir)
        .filter(col("k") >= 20).collect().toSet)
    // unknown transforms still refuse by name at create
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.create(range(0, 5), tmp(), Seq("zorder(k)"))
    }
    assert(e.getMessage.contains("not in"))
  }

  test("rewriteDataFiles: small files bin-pack in a replace snapshot; deletes never resurrect") {
    val dir = tmp()
    IcebergWrite.create(range(0, 20).coalesce(1), dir)     // snap 1
    (1 to 3).foreach(i => IcebergWrite.append(
      range(i * 20L, i * 20L + 20).coalesce(1), dir))      // snaps 2..4
    // a merge-on-read upsert: k=0 replaced via equality delete
    IcebergWrite.upsert(spark.range(0, 1).select(col("id").as("k"),
      lit("upd0").as("name")).coalesce(1), dir, Seq("k"))
    // and a position delete: k=70..79 gone
    IcebergWrite.delete(spark, dir, "k >= 70")
    val pre = IcebergRead.read(spark, dir).collect().toSet
    assert(pre.size == 70 &&
      pre.exists(r => r.getLong(0) == 0 && r.getString(1) == "upd0"))
    def dataFiles(): Int = new java.io.File(s"$dir/data").listFiles()
      .count(f => f.getName.endsWith(".parquet")
        && !f.getName.startsWith("del-") && !f.getName.startsWith("eqdel-"))
    val before = dataFiles()
    assert(before >= 5, s"fixture needs several small files: $before")
    val snapId = IcebergWrite.rewriteDataFiles(spark, dir,
      targetBytes = 1L << 30)
    // everything bin-packed into ONE file; rows identical (the upsert'd
    // value survives, deleted rows stay dead)
    assert(IcebergRead.read(spark, dir).collect().toSet == pre)
    // time travel to the pre-rewrite snapshot serves the OLD layout
    assert(IcebergRead.read(spark, dir, snapshotId = snapId - 1)
      .collect().toSet == pre)
    // the new snapshot plans exactly the merged file count
    val (total, _) = IcebergRead.pruneReport(spark, dir, "k >= 0")
    assert(total == 1, s"expected 1 merged data file, planned $total")
    // no-op when fewer than 2 small files qualify
    assert(IcebergWrite.rewriteDataFiles(spark, dir, 1L << 30) == snapId)
    // appends continue; expireSnapshots reclaims the replaced files
    IcebergWrite.append(range(100, 105).coalesce(1), dir)
    assert(IcebergRead.read(spark, dir).count() == 75)
    IcebergWrite.expireSnapshots(spark, dir, keepLast = 2)
    assert(dataFiles() < before,
      "expire must reclaim the replaced small files")
    assert(IcebergRead.read(spark, dir).count() == 75)
  }

  test("rewriteDataFiles sortBy: sorted layout turns range predicates into 1-of-N opens") {
    val dir = tmp()
    // 4 files with INTERLEAVED key ranges (k % 4 stripes): every file
    // spans the full domain, so range predicates cannot prune
    def stripe(r: Long) = spark.range(0, 8000)
      .filter(col("id") % 4 === r)
      .select(col("id").as("k"),
        concat(lit("u"), col("id").cast("string")).as("name"))
    IcebergWrite.create(stripe(0).coalesce(1), dir)
    (1L to 3L).foreach(r => IcebergWrite.append(stripe(r).coalesce(1), dir))
    val pre = IcebergRead.read(spark, dir).collect().toSet
    val (t0, k0) = IcebergRead.pruneReport(spark, dir, "k >= 7000")
    assert(t0 == 4 && k0 == 4, s"striped files must not prune: $k0 of $t0")
    val snap = IcebergWrite.rewriteDataFiles(spark, dir,
      targetBytes = 16384, sortBy = Seq("k"))
    assert(IcebergRead.read(spark, dir).collect().toSet == pre)
    val (t1, k1) = IcebergRead.pruneReport(spark, dir, "k >= 7000")
    assert(t1 >= 3 && k1 <= 2,
      s"sorted rewrite must range-prune: $k1 of $t1")
    assert(IcebergRead.readWhere(spark, dir, "k >= 7000").collect().toSet
      == IcebergRead.read(spark, dir).filter(col("k") >= 7000)
        .collect().toSet)
    // pre-rewrite snapshots still serve the striped layout
    assert(IcebergRead.read(spark, dir, snapshotId = snap - 1)
      .collect().toSet == pre)
    // unknown sort column refuses loudly
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.rewriteDataFiles(spark, dir, sortBy = Seq("zz"))
    }
    assert(e.getMessage.contains("sortBy column zz"))
  }

  test("identity-partitioned create: split files, partition struct, pruning") {
    val dir = tmp()
    val parted = range(0, 60)
      .withColumn("bucket", (col("k") % 3).cast("int"))
    IcebergWrite.create(parted.coalesce(1), dir, Seq("bucket"))
    val back = IcebergRead.read(spark, dir)
    // Iceberg data files carry ALL columns — bucket included
    assert(back.columns.toSeq == Seq("k", "name", "bucket"))
    assert(back.count() == 60)
    assert(back.filter(col("bucket") === 1).count() == 20)
    // one partition tuple per file → the partition predicate prunes
    val (total, kept) = IcebergRead.pruneReport(spark, dir, "bucket = 1")
    assert(total == 3 && kept == 1,
      s"partition split must prune: $kept of $total")
    // the manifest records the typed partition tuple
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(Files.readString(
      java.nio.file.Paths.get(dir, "metadata", "v1.metadata.json")))
    assert(meta.path("last-partition-id").asInt() == 1000)
    val listRel = meta.path("snapshots").elements().next()
      .path("manifest-list").asText()
    val mPath = readAvro(s"$dir/$listRel").head
      .get("manifest_path").toString
    val tuples = readAvro(s"$dir/$mPath").map(_.get("data_file")
      .asInstanceOf[org.apache.avro.generic.GenericRecord]
      .get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]
      .get("bucket").toString.toInt).sorted
    assert(tuples == Seq(0, 1, 2), s"partition tuples: $tuples")
    // appends must carry the partition columns
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.append(range(60, 70), dir)
    }
    assert(e.getMessage.contains("schema") ||
      e.getMessage.contains("partition"))
    // NULL partition values refuse loudly
    val e2 = intercept[Exception] {
      val withNull = range(0, 5).withColumn("bucket",
        when(col("k") === 2L, lit(null)).otherwise(lit(1))
          .cast("int"))
      IcebergWrite.create(withNull.coalesce(1), tmp(), Seq("bucket"))
    }
    assert(e2.getMessage.contains("NULL partition"))
  }

  test("additive schema evolution: new ids, per-snapshot schemas, NULL backfill") {
    val dir = tmp()
    IcebergWrite.create(range(0, 50).coalesce(1), dir)
    val evolved = range(50, 100).withColumn("score", col("k") * 2)
    // without the flag, drift still refuses
    intercept[IllegalArgumentException] { IcebergWrite.append(evolved, dir) }
    assert(IcebergWrite.append(evolved.coalesce(1), dir,
      mergeSchema = true) == 2L)
    val back = IcebergRead.read(spark, dir)
    assert(back.columns.toSeq == Seq("k", "name", "score"))
    assert(back.count() == 100)
    // old files surface NULL for the later-added column — no rewrite
    assert(back.filter(col("k") < 50 && col("score").isNull).count() == 50)
    assert(back.filter(col("k") >= 50 &&
      col("score") === col("k") * 2).count() == 50)
    // a batch OMITTING the evolved column still appends
    assert(IcebergWrite.append(range(100, 110).coalesce(1), dir,
      mergeSchema = true) == 3L)
    assert(IcebergRead.read(spark, dir).count() == 110)
    // per-snapshot schema under time travel
    assert(IcebergRead.read(spark, dir, snapshotId = 1)
      .columns.toSeq == Seq("k", "name"))
    // stable field ids: the new column got id 3, schema-id bumped
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(Files.readString(
      java.nio.file.Paths.get(dir, "metadata", "v3.metadata.json")))
    assert(meta.path("current-schema-id").asInt() == 1)
    assert(meta.path("last-column-id").asInt() == 3)
    val sch1 = meta.path("schemas").elements().asScalaSeq
      .find(_.path("schema-id").asInt() == 1).get
    val ids = sch1.path("fields").elements().asScalaSeq
      .map(f => f.path("name").asText() -> f.path("id").asInt()).toMap
    assert(ids == Map("k" -> 1, "name" -> 2, "score" -> 3), s"$ids")
    // type conflicts refuse loudly
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.append(
        range(0, 1).withColumn("score", lit("not-a-number")), dir,
        mergeSchema = true)
    }
    assert(e.getMessage.contains("conflict"))
  }

  private implicit class IterOps[T](it: java.util.Iterator[T]) {
    def asScalaSeq: Seq[T] =
      scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala.toSeq
  }

  private def readAvro(p: String)
      : Seq[org.apache.avro.generic.GenericRecord] = {
    val f = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(new org.apache.hadoop.fs.Path(p))
    val bytes = try in.readAllBytes() finally in.close()
    val r = new org.apache.avro.file.DataFileReader[
        org.apache.avro.generic.GenericRecord](
      new org.apache.avro.file.SeekableByteArrayInput(bytes),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    try {
      val it = r.iterator()
      val buf = scala.collection.mutable.ArrayBuffer[
        org.apache.avro.generic.GenericRecord]()
      while (it.hasNext) buf += it.next()
      buf.toSeq
    } finally r.close()
  }

  /** (file metadata, record schema) of an avro file. */
  private def avroMeta(p: String)
      : (Map[String, String], org.apache.avro.Schema) = {
    val f = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(new org.apache.hadoop.fs.Path(p))
    val bytes = try in.readAllBytes() finally in.close()
    val r = new org.apache.avro.file.DataFileReader[
        org.apache.avro.generic.GenericRecord](
      new org.apache.avro.file.SeekableByteArrayInput(bytes),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    try {
      val keys = scala.jdk.CollectionConverters
        .ListHasAsScala(r.getMetaKeys).asScala
      (keys.filterNot(_.startsWith("avro."))
        .map(k => k -> r.getMetaString(k)).toMap, r.getSchema)
    } finally r.close()
  }

  test("position-delete emission: merge-on-read DELETE round-trips through the reader") {
    val dir = tmp()
    IcebergWrite.create(range(0, 50).coalesce(1), dir)       // snap 1
    IcebergWrite.append(range(50, 100).coalesce(1), dir)     // snap 2
    val v = IcebergWrite.delete(spark, dir, "k >= 90 OR k = 5")
    assert(v == 3L)
    val back = IcebergRead.read(spark, dir)
    assert(back.count() == 89, s"got ${back.count()}")
    val ks = back.select("k").collect().map(_.getLong(0)).toSet
    assert(!ks.contains(5L) && !ks.contains(95L) && ks.contains(89L))
    // prior snapshots untouched (merge-on-read: no rewrite)
    assert(IcebergRead.read(spark, dir, snapshotId = 2).count() == 100)
    // deletes compose
    assert(IcebergWrite.delete(spark, dir, "k = 6") == 4L)
    assert(IcebergRead.read(spark, dir).count() == 88)
    // appends after a delete carry the delete manifests forward
    assert(IcebergWrite.append(range(200, 210).coalesce(1), dir) == 5L)
    val after = IcebergRead.read(spark, dir)
    assert(after.count() == 98)
    assert(!after.select("k").collect().map(_.getLong(0)).toSet
      .contains(5L), "delete manifests must survive later appends")
    // nothing matched: no new snapshot
    assert(IcebergWrite.delete(spark, dir, "k > 100000") == 5L)
    assert(!Files.exists(java.nio.file.Paths.get(
      dir, "metadata", "v7.metadata.json")))
    // partitioned tables work too (round-13: tuple-carrying deletes)
    val dirP = tmp()
    IcebergWrite.create(range(0, 10)
      .withColumn("b", (col("k") % 2).cast("int")).coalesce(1),
      dirP, Seq("b"))
    IcebergWrite.delete(spark, dirP, "k = 1")
    assert(IcebergRead.read(spark, dirP).count() == 9)
  }

  test("merge-on-read UPSERT: equality delete + insert in one snapshot, O(source) cost") {
    val dir = tmp()
    IcebergWrite.create(range(0, 50).coalesce(1), dir)       // snap 1
    IcebergWrite.append(range(50, 100).coalesce(1), dir)     // snap 2
    val src = spark.createDataFrame(Seq(
      (10L, "updated"), (200L, "fresh"))).toDF("k", "name")
    assert(IcebergWrite.upsert(src.coalesce(1), dir, Seq("k")) == 3L)
    val back = IcebergRead.read(spark, dir)
    assert(back.count() == 101, s"got ${back.count()}")
    val k10 = back.filter(col("k") === 10).collect()
    assert(k10.length == 1 && k10.head.getString(1) == "updated",
      "the equality delete must remove the seq-below version, the " +
        "same-sequence insert must survive")
    assert(back.filter(col("k") === 200).count() == 1)
    assert(back.filter(col("k") === 11).head().getString(1) == "u11")
    // snapshot isolation: the pre-merge snapshot is untouched
    val old = IcebergRead.read(spark, dir, snapshotId = 2)
    assert(old.count() == 100 &&
      old.filter(col("k") === 10).head().getString(1) == "u10")
    // repeated upserts stack: each new sequence outranks the last
    assert(IcebergWrite.upsert(spark.createDataFrame(Seq(
      (10L, "updated2"))).toDF("k", "name").coalesce(1),
      dir, Seq("k")) == 4L)
    val again = IcebergRead.read(spark, dir)
    assert(again.count() == 101)
    assert(again.filter(col("k") === 10).head().getString(1) == "updated2")
    // composes with position deletes
    assert(IcebergWrite.delete(spark, dir, "k = 20") == 5L)
    assert(IcebergRead.read(spark, dir).count() == 100)
    // MERGE contract: at most one source row per key
    intercept[IllegalArgumentException] {
      IcebergWrite.upsert(src.unionAll(src), dir, Seq("k"))
    }
    // partitioned tables work too: key (k) does not cover partition
    // source b → the delete leg goes GLOBAL, and the update still
    // replaces the row even though the source moves it to the other
    // partition (the case scoped deletes could not express)
    val dirP = tmp()
    IcebergWrite.create(range(0, 10)
      .withColumn("b", (col("k") % 2).cast("int")).coalesce(1),
      dirP, Seq("b"))
    IcebergWrite.upsert(spark.createDataFrame(Seq((1L, "moved", 0)))
      .toDF("k", "name", "b").coalesce(1), dirP, Seq("k"))
    val backP = IcebergRead.read(spark, dirP)
    assert(backP.count() == 10)
    val r1 = backP.filter(col("k") === 1L).collect()
    assert(r1.length == 1 && r1.head.getString(1) == "moved" &&
      r1.head.getInt(2) == 0,
      "a global delete must cover the old row in its OLD partition")
  }

  test("deleteKeys: pure equality-delete snapshot — no scan, no data file, sequence-scoped") {
    val dir = tmp()
    IcebergWrite.create(range(0, 100).coalesce(1), dir)
    def dataFiles(): Set[String] = new java.io.File(s"$dir/data")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.getName).toSet
    val before = dataFiles()
    // duplicate + absent keys are fine (deduped / inert)
    val keys = spark.range(0, 4).select((col("id") * 25).as("k"))
      .union(spark.range(0, 2).select(lit(50L).as("k")))
      .union(spark.range(0, 1).select(lit(9999L).as("k")))
    val snap = IcebergWrite.deleteKeys(keys, dir, Seq("k"))
    assert(snap == 2)
    assert(IcebergRead.read(spark, dir).count() == 96,
      "k in {0,25,50,75} must vanish")
    // the forget shape: ONE equality-delete file, zero data writes
    val added = dataFiles() -- before
    assert(added.size == 1 && added.head.startsWith("eqdel-"),
      s"a pure key delete must write only the delete file: $added")
    assert(IcebergRead.read(spark, dir, snapshotId = 1).count() == 100,
      "prior snapshots intact")
    // sequence scoping: re-inserting a deleted key AFTER the delete
    // lands at a higher sequence — the old delete must not apply
    IcebergWrite.append(spark.range(50, 51).select(col("id").as("k"),
      lit("back").as("name")).coalesce(1), dir)
    val back = IcebergRead.read(spark, dir)
    assert(back.count() == 97)
    assert(back.filter(col("k") === 50).count() == 1,
      "an equality delete applies only below its sequence number")
    // key column must exist
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.deleteKeys(keys, dir, Seq("zz"))
    }
    assert(e.getMessage.contains("zz"))
    // an EMPTY key frame is a detected no-op: no snapshot published
    val metaCount = new java.io.File(s"$dir/metadata").listFiles()
      .count(_.getName.endsWith(".metadata.json"))
    assert(IcebergWrite.deleteKeys(range(0, 0), dir, Seq("k")) == 3)
    assert(new java.io.File(s"$dir/metadata").listFiles()
      .count(_.getName.endsWith(".metadata.json")) == metaCount,
      "an empty forget batch must not publish a snapshot")
  }

  test("partitioned MOR upsert: scoped per-tuple delete files; reads, pruning, time travel") {
    val dir = tmp()
    val base = spark.range(0, 40).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("name"),
      (col("id") % 4).cast("int").as("b"))
    IcebergWrite.create(base.coalesce(1), dir, Seq("b")) // snap 1
    // keys (k, b) cover the partition source b → the equality-delete
    // files are PARTITION-SCOPED: one per touched tuple, tuple carried
    val src = spark.range(0, 6).select((col("id") * 5).as("k"),
      concat(lit("u"), col("id")).as("name"),
      ((col("id") * 5) % 4).cast("int").as("b")).coalesce(1)
    val snap = IcebergWrite.upsert(src, dir, Seq("k", "b"))
    assert(snap == 2)
    val got = IcebergRead.read(spark, dir)
    assert(got.count() == 40, "upsert of existing keys must not grow")
    assert(got.filter(col("name").startsWith("u")).count() == 6)
    assert(got.filter(col("k") === 5L && col("name") === "u1").count() == 1)
    // k ∈ {0,5,10,15,20,25} → b ∈ {0,1,2,3,0,1}: 4 touched tuples
    val eqdels = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.startsWith("eqdel-"))
    assert(eqdels.length == 4,
      s"one scoped delete file per touched partition: ${eqdels.toSeq}")
    // partition pruning still holds after the MOR commit
    val (total, kept) = IcebergRead.pruneReport(spark, dir, "b = 0")
    assert(kept < total, s"b=0 must prune ($kept of $total)")
    assert(IcebergRead.readWhere(spark, dir, "b = 0").count()
      == got.filter(col("b") === 0).count())
    // time travel: snapshot 1 predates the upsert
    assert(IcebergRead.read(spark, dir, snapshotId = 1)
      .filter(col("name").startsWith("u")).count() == 0)
  }

  test("partitioned deleteKeys: GLOBAL equality delete under the unpartitioned spec (forget shape)") {
    val dir = tmp()
    val base = spark.range(0, 40).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("name"),
      (col("id") % 4).cast("int").as("b"))
    IcebergWrite.create(base.coalesce(1), dir, Seq("b")) // snap 1
    // forget keys (user ids) do NOT determine the partition (date) —
    // the delete file must be global, written under an unpartitioned
    // spec the commit ADDS to partition-specs
    val snap = IcebergWrite.deleteKeys(
      spark.range(0, 3).select((col("id") * 7).as("k")), dir, Seq("k"))
    assert(snap == 2)
    val got = IcebergRead.read(spark, dir)
    assert(got.count() == 37, "k in {0,7,14} must vanish table-wide")
    assert(got.filter(col("k").isin(0L, 7L, 14L)).count() == 0)
    // the metadata now carries an unpartitioned spec NEXT TO the
    // default partitioned one (default-spec-id unchanged)
    val metaDir = new java.io.File(s"$dir/metadata")
    val latest = metaDir.listFiles()
      .filter(_.getName.endsWith(".metadata.json"))
      .maxBy(_.getName)
    val metaText = Files.readString(latest.toPath)
    val metaNode = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(metaText)
    val specs = metaNode.path("partition-specs").elements()
    val specSizes = scala.jdk.CollectionConverters
      .IteratorHasAsScala(specs).asScala
      .map(sp => sp.path("fields").size()).toSeq
    assert(specSizes.contains(0) && specSizes.contains(1),
      s"expected both the partitioned and the added unpartitioned " +
        s"spec: $specSizes")
    assert(metaNode.path("default-spec-id").asInt(-1) == 0,
      "the default spec must stay the partitioned one")
    // prior snapshot intact; sequence scoping survives: a re-insert of
    // a forgotten key AFTER the delete is above its sequence
    assert(IcebergRead.read(spark, dir, snapshotId = 1).count() == 40)
    IcebergWrite.append(spark.range(0, 1).select(col("id").as("k"),
      lit("back").as("name"), lit(0).cast("int").as("b")).coalesce(1), dir)
    val after = IcebergRead.read(spark, dir)
    assert(after.count() == 38)
    assert(after.filter(col("k") === 0L).count() == 1,
      "an equality delete applies only below its sequence number")
    // replaying the same forget batch removes it again
    IcebergWrite.deleteKeys(
      spark.range(0, 1).select(col("id").as("k")), dir, Seq("k"))
    assert(IcebergRead.read(spark, dir).count() == 37)
  }

  test("partitioned position delete: per-tuple delete files; reads and time travel hold") {
    val dir = tmp()
    val base = spark.range(0, 40).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("name"),
      (col("id") % 4).cast("int").as("b"))
    IcebergWrite.create(base.coalesce(1), dir, Seq("b")) // snap 1
    // odd k live only in partitions b ∈ {1, 3}
    val snap = IcebergWrite.delete(spark, dir, "k % 2 = 1 AND k < 20")
    assert(snap == 2)
    val got = IcebergRead.read(spark, dir)
    assert(got.count() == 30)
    assert(got.filter(col("k") % 2 === 1 && col("k") < 20).count() == 0)
    // the delete parquet split per touched partition tuple
    val dels = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.startsWith("del-"))
    assert(dels.length == 2,
      s"one position-delete file per touched tuple: ${dels.toSeq}")
    // untouched partitions keep every row; time travel intact
    assert(got.filter(col("b") === 0).count() == 10)
    assert(IcebergRead.read(spark, dir, snapshotId = 1).count() == 40)
    // pruning on the partition key still works through the delete
    assert(IcebergRead.readWhere(spark, dir, "b = 1").count()
      == got.filter(col("b") === 1).count())
  }

  test("deleteKeys normalizes key types to the table schema: widenings cast, lossy refuses") {
    // the spec requires the equality-delete parquet's physical types to
    // agree with the equality_ids' field types — an int key frame
    // against a long table column must CAST, not write a mismatched
    // delete file that strict readers ignore
    val dir = tmp()
    IcebergWrite.create(range(0, 20).coalesce(1), dir) // k is long
    val intKeys = spark.range(0, 3)
      .select((col("id") * 5).cast("int").as("k"))
    val snap = IcebergWrite.deleteKeys(intKeys, dir, Seq("k"))
    assert(snap == 2)
    assert(IcebergRead.read(spark, dir).count() == 17,
      "int keys must widen to the table's long and delete")
    // a narrowing / unrelated type refuses loudly
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.deleteKeys(
        spark.range(0, 1).select(lit("5").as("k")), dir, Seq("k"))
    }
    assert(e.getMessage.contains("lossless") ||
      e.getMessage.contains("widening"), e.getMessage)
  }

  test("v3 deletion vectors WRITE: puffin blobs mask rows; a re-mask REPLACES, never stacks") {
    val dir = tmp()
    IcebergWrite.create(range(0, 100).coalesce(1), dir)   // snap 1
    IcebergWrite.append(range(100, 200).coalesce(1), dir) // snap 2
    def dataFiles() = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    def puffins() = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".puffin")).map(_.getName).toSet
    val before = dataFiles()
    val s3 = IcebergWrite.deleteDv(spark, dir, "k % 10 = 3")
    assert(s3 == 3)
    assert(dataFiles() == before,
      "a DV delete must write no data or delete parquet")
    assert(puffins().size == 1, "one puffin file per commit")
    val got = IcebergRead.read(spark, dir)
    assert(got.count() == 180)
    assert(got.filter(col("k") % 10 === 3).count() == 0)
    assert(IcebergRead.read(spark, dir, snapshotId = 2).count() == 200,
      "prior snapshots intact")
    // replaying the same predicate: nothing newly matched, no snapshot
    assert(IcebergWrite.deleteDv(spark, dir, "k % 10 = 3") == 3)
    assert(puffins().size == 1)
    // a SECOND mask on the same files REPLACES (union) — the v3
    // at-most-one-DV-per-file rule; the reader REFUSES stacked DVs, so
    // a clean current read is itself the uniqueness proof
    val s4 = IcebergWrite.deleteDv(spark, dir, "k % 10 = 7")
    assert(s4 == 4)
    val got2 = IcebergRead.read(spark, dir)
    assert(got2.count() == 160)
    assert(got2.filter(col("k") % 10 === 7).count() == 0 &&
      got2.filter(col("k") % 10 === 3).count() == 0)
    assert(IcebergRead.read(spark, dir, snapshotId = 3).count() == 180,
      "the pre-re-mask snapshot still serves the OLD mask alone")
    // composes with the MOR equality-delete upsert on top
    IcebergWrite.upsert(spark.createDataFrame(Seq((4L, "upd")))
      .toDF("k", "name").coalesce(1), dir, Seq("k"))
    val got3 = IcebergRead.read(spark, dir)
    assert(got3.count() == 160)
    assert(got3.filter(col("k") === 4L).head().getString(1) == "upd")
    // partitioned table: DV entries carry the referenced file's tuple
    val dirP = tmp()
    IcebergWrite.create(spark.range(0, 40).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("name"),
      (col("id") % 4).cast("int").as("b")).coalesce(1), dirP, Seq("b"))
    IcebergWrite.deleteDv(spark, dirP, "k % 2 = 1 AND b = 1")
    val gp = IcebergRead.read(spark, dirP)
    assert(gp.count() == 30, s"got ${gp.count()}")
    assert(IcebergRead.readWhere(spark, dirP, "b = 1").count() == 0,
      "the whole b=1 partition's odd rows were exactly its rows")
  }

  test("rollbackTo: metadata-only rollback, history kept, schema rolled back, expired refuses") {
    val dir = tmp()
    IcebergWrite.create(range(0, 10).coalesce(1), dir)          // snap 1
    IcebergWrite.append(range(10, 20).coalesce(1), dir)         // snap 2
    IcebergWrite.append(range(20, 25)
      .withColumn("extra", lit(1L)).coalesce(1), dir,
      mergeSchema = true)                                       // snap 3
    assert(IcebergRead.read(spark, dir).count() == 25)
    // roll back to snap 2: reads serve it, history intact
    IcebergWrite.rollbackTo(spark, dir, 2L)
    val back = IcebergRead.read(spark, dir)
    assert(back.count() == 20)
    assert(!back.columns.contains("extra"),
      "rollback across an evolution must serve the old schema")
    // the WRITE schema rolled back too: an append in the old shape
    // lands and current reads stay old-shaped (no read/write split)
    IcebergWrite.append(range(90, 95).coalesce(1), dir)
    val appended = IcebergRead.read(spark, dir)
    assert(appended.count() == 25 && !appended.columns.contains("extra"),
      "append after rollback must follow the rolled-back schema")
    // pre-rollback snapshots still time-travel
    assert(IcebergRead.read(spark, dir, snapshotId = 3L).count() == 25)
    // the rollback is itself revertible (snap 3 still listed)
    IcebergWrite.rollbackTo(spark, dir, 3L)
    assert(IcebergRead.read(spark, dir).count() == 25)
    // no-op when already current; unknown snapshot refuses
    val v = IcebergWrite.rollbackTo(spark, dir, 3L)
    assert(IcebergWrite.rollbackTo(spark, dir, 3L) == v)
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.rollbackTo(spark, dir, 99L)
    }
    assert(e.getMessage.contains("not in the table's snapshot list"))
    // appends continue normally after a rollback cycle
    IcebergWrite.append(range(25, 30).withColumn("extra", lit(2L))
      .coalesce(1), dir)
    assert(IcebergRead.read(spark, dir).count() == 30)
  }

  test("expireSnapshots: pruned history, kept snapshots readable, unreachable files GC'd") {
    val dir = tmp()
    IcebergWrite.create(range(0, 10).coalesce(1), dir)            // snap 1
    (1 to 3).foreach(i => IcebergWrite.append(
      range(i * 10L, i * 10L + 10).coalesce(1), dir))             // 2..4
    def avros(): Int = new java.io.File(s"$dir/metadata").listFiles()
      .count(_.getName.endsWith(".avro"))
    val before = avros()
    // nothing to expire: no new metadata version, nothing deleted
    assert(IcebergWrite.expireSnapshots(spark, dir, keepLast = 4) == 0)
    assert(!Files.exists(java.nio.file.Paths.get(
      dir, "metadata", "v6.metadata.json")))
    // keepLast below the current snapshot refuses... (current is
    // always newest here, so any keepLast >= 1 keeps it); expire to 2
    val deleted = IcebergWrite.expireSnapshots(spark, dir, keepLast = 2)
    assert(deleted > 0 && avros() < before,
      s"expired manifest lists must be deleted: $deleted, ${avros()}")
    // current + kept snapshot read fine (append-only: all data
    // reachable from the latest snapshot)
    assert(IcebergRead.read(spark, dir).count() == 40)
    assert(IcebergRead.read(spark, dir, snapshotId = 3).count() == 30)
    // expired snapshots fail LOUDLY
    val e = intercept[IllegalArgumentException] {
      IcebergRead.read(spark, dir, snapshotId = 1)
    }
    assert(e.getMessage.contains("not found"))
    // appends continue normally after expiry
    assert(IcebergWrite.append(range(40, 50).coalesce(1), dir) == 5L)
    assert(IcebergRead.read(spark, dir).count() == 50)
    // crash-orphan data files: mtime-gated sweep (fresh ones survive
    // the default window, a zero window reclaims them)
    val stray = java.nio.file.Paths.get(dir, "data", "orphan.parquet")
    Files.write(stray, Array[Byte](1, 2, 3))
    // keepLast=3 keeps all three live snapshots — nothing expires, and
    // the fresh orphan survives the default window
    assert(IcebergWrite.expireSnapshots(spark, dir, keepLast = 3) == 0,
      "a FRESH orphan must survive the default retention window")
    Thread.sleep(5)
    assert(IcebergWrite.expireSnapshots(spark, dir, keepLast = 3,
      orphanRetainMillis = 0L) == 1)
    assert(!Files.exists(stray))
    assert(IcebergRead.read(spark, dir).count() == 50)
  }

  test("date/timestamp columns round-trip (no bounds, still correct)") {
    val dir = tmp()
    val df = spark.sql(
      """SELECT id AS k, DATE'2024-01-01' + CAST(id AS INT) AS d,
               TIMESTAMP'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts
         FROM range(0, 5)""")
    IcebergWrite.create(df.coalesce(1), dir)
    val back = IcebergRead.read(spark, dir)
    assert(back.count() == 5)
    assert(back.schema("d").dataType.typeName == "date")
    assert(back.agg(max("d")).head().getDate(0).toString == "2024-01-05")
  }
}
