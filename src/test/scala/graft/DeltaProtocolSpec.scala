package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.{ByteBuffer, ByteOrder}

/** Byte-exact coverage of the Delta protocol surfaces added in round 7,
  * all hand-built from the PUBLIC spec (delta.io PROTOCOL.md):
  * deletion vectors (portable RoaringBitmapArray with the per-bitmap
  * KEY field, inline/'u'/'p' storage, on-disk framing), column mapping
  * in `name` mode (incl. nested physical names, physical stats keys,
  * physical partitionValues keys), multi-part checkpoints +
  * `_last_checkpoint` resolution, and the PathCodec percent/Z85 codecs.
  */
class DeltaProtocolSpec extends AnyFunSuite {
  import SparkTestSession._
  import sources.{DeltaRead, PathCodec}

  private def tmp(): String =
    Files.createTempDirectory("graft_dvspec").toString + "/t"

  private val schemaJson = StructType(Seq(
    StructField("k", LongType), StructField("name", StringType))).json

  private def dataFile(dir: String, name: String,
                       df: org.apache.spark.sql.DataFrame): Unit = {
    val stage = Files.createTempDirectory("graft_dv_stage").toString
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

  private def js(s: String): String =
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .writeValueAsString(s)

  private def range(lo: Long, hi: Long) = spark.range(lo, hi)
    .select(col("id").as("k"),
      concat(lit("u"), col("id").cast("string")).as("name"))

  // ------------------------------------------------------------------
  // fixture builders — the serialized forms PROTOCOL.md specifies
  // ------------------------------------------------------------------

  /** Portable RoaringBitmapArray: LE magic 1681511377, LE int64 bitmap
    * count, then per bitmap a LE int32 KEY + the standard-serialized
    * 32-bit RoaringBitmap (this key field is what delta-spark's
    * RoaringBitmapArray.serialize writes — a decoder that skips it
    * misaligns on the very first bitmap).
    */
  private def roaringArrayBytes(positions: Seq[Long]): Array[Byte] = {
    val byKey = positions.groupBy(p => (p >> 32).toInt).toSeq.sortBy(_._1)
    val bitmaps = byKey.map { case (key, ps) =>
      val rb = new org.roaringbitmap.RoaringBitmap()
      ps.foreach(p => rb.add((p & 0xFFFFFFFFL).toInt))
      rb.runOptimize()
      (key, rb)
    }
    val size = 12 + bitmaps.map(4 + _._2.serializedSizeInBytes()).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377)
    bb.putLong(bitmaps.size.toLong)
    bitmaps.foreach { case (key, rb) => bb.putInt(key); rb.serialize(bb) }
    bb.array()
  }

  private def pad4(b: Array[Byte]): Array[Byte] =
    if (b.length % 4 == 0) b
    else b ++ Array.fill[Byte](4 - b.length % 4)(0)

  /** Inline descriptor json fragment for an add action. */
  private def inlineDv(positions: Seq[Long]): String = {
    val data = roaringArrayBytes(positions)
    val enc = PathCodec.z85Encode(pad4(data))
    s""""deletionVector":{"storageType":"i","pathOrInlineDv":"$enc",""" +
      s""""sizeInBytes":${data.length},"cardinality":${positions.size}}"""
  }

  /** On-disk DV file per the public framing: byte 0 = format version 1,
    * at `offset` a BIG-endian int32 length == sizeInBytes, the data,
    * then a checksum (not verified by this reader). Returns the bytes.
    */
  private def dvFileBytes(data: Array[Byte], offset: Int): Array[Byte] = {
    require(offset >= 1)
    val bb = ByteBuffer.allocate(offset + 4 + data.length + 4)
    bb.put(1.toByte)
    bb.position(offset)
    bb.putInt(data.length)
    bb.put(data)
    bb.putInt(0)
    bb.array()
  }

  private def addWithDv(path: String, rows: Long, dvJson: String): String =
    s"""{"add":{"path":"$path","partitionValues":{},"size":1,""" +
      s""""modificationTime":0,"dataChange":true,$dvJson}}"""

  private def addPlain(path: String, rows: Long): String =
    s"""{"add":{"path":"$path","partitionValues":{},"size":1,""" +
      s""""modificationTime":0,"dataChange":true}}"""

  private val protoDv =
    """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["deletionVectors"]}}"""

  private def metaLine(json: String, parts: String = "[]",
                       conf: String = "{}"): String =
    s"""{"metaData":{"id":"t","format":{"provider":"parquet"},""" +
      s""""schemaString":${js(json)},"partitionColumns":$parts,""" +
      s""""configuration":$conf}}"""

  // ------------------------------------------------------------------
  // deletion vectors
  // ------------------------------------------------------------------

  test("roaringPositions: per-bitmap key field honored, sparse keys, >2^32 positions") {
    val positions = Seq(0L, 5L, 70000L,                       // key 0
      (1L << 32) + 3L, (1L << 32) + 4L,                       // key 1
      (3L << 32) + 123456789L)                                // key 3 (sparse!)
    val decoded = DeltaRead.roaringPositions(roaringArrayBytes(positions))
    assert(decoded.sorted.toSeq == positions.sorted,
      s"decoded ${decoded.toSeq} != $positions")
    // single-bitmap fast case too
    val one = Seq(1L, 2L, 1000L)
    assert(DeltaRead.roaringPositions(roaringArrayBytes(one)).sorted.toSeq
      == one)
    // a wrong magic refuses loudly
    val bad = roaringArrayBytes(one); bad(0) = 99.toByte
    val e = intercept[IllegalArgumentException] {
      DeltaRead.roaringPositions(bad)
    }
    assert(e.getMessage.contains("magic"))
  }

  test("inline deletion vector: deleted rows vanish, others unchanged") {
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 50))
    dataFile(dir, "f1.parquet", range(50, 100))
    // delete row positions 0, 7, 49 of f0 (k = 0, 7, 49)
    commit(dir, 0, Seq(protoDv, metaLine(schemaJson),
      addWithDv("f0.parquet", 50, inlineDv(Seq(0L, 7L, 49L))),
      addPlain("f1.parquet", 50)))
    val df = DeltaRead.read(spark, dir)
    assert(df.count() == 97)
    val ks = df.select("k").collect().map(_.getLong(0)).toSet
    assert(!ks.contains(0L) && !ks.contains(7L) && !ks.contains(49L))
    assert(ks.contains(1L) && ks.contains(48L) && ks.contains(99L))
    // column order/schema preserved
    assert(df.columns.toSeq == Seq("k", "name"))
  }

  test("'u' and 'p' storage: on-disk DV framing (version byte, offset, BE length)") {
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 50))
    dataFile(dir, "f1.parquet", range(50, 100))
    // 'u': UUID-named file under a 2-char prefix dir, data at offset 9
    val data0 = roaringArrayBytes(Seq(1L, 2L, 3L))
    val uuid = java.util.UUID.randomUUID()
    val ub = ByteBuffer.allocate(16)
    ub.putLong(uuid.getMostSignificantBits)
    ub.putLong(uuid.getLeastSignificantBits)
    val uEnc = "ab" + PathCodec.z85Encode(ub.array()) // prefix "ab"
    Files.createDirectories(Paths.get(dir, "ab"))
    Files.write(Paths.get(dir, "ab", s"deletion_vector_$uuid.bin"),
      dvFileBytes(data0, offset = 9))
    // 'p': absolute path, data at offset 1
    val data1 = roaringArrayBytes(Seq(0L, 49L))
    val pFile = Paths.get(dir, "external_dv.bin")
    Files.write(pFile, dvFileBytes(data1, offset = 1))
    commit(dir, 0, Seq(protoDv, metaLine(schemaJson),
      addWithDv("f0.parquet", 50,
        s""""deletionVector":{"storageType":"u","pathOrInlineDv":"$uEnc",""" +
          s""""offset":9,"sizeInBytes":${data0.length},"cardinality":3}"""),
      addWithDv("f1.parquet", 50,
        s""""deletionVector":{"storageType":"p",""" +
          s""""pathOrInlineDv":"$pFile","offset":1,""" +
          s""""sizeInBytes":${data1.length},"cardinality":2}""")))
    val df = DeltaRead.read(spark, dir)
    // f0 loses k=1,2,3; f1 loses positions 0,49 => k=50,99
    assert(df.count() == 95)
    val ks = df.select("k").collect().map(_.getLong(0)).toSet
    assert(Set(1L, 2L, 3L, 50L, 99L).forall(!ks.contains(_)))
    assert(ks.contains(0L) && ks.contains(4L) && ks.contains(51L) &&
      ks.contains(98L))
    // a corrupted length prefix refuses loudly
    val data2 = roaringArrayBytes(Seq(5L))
    val badFile = Paths.get(dir, "bad_dv.bin")
    Files.write(badFile, dvFileBytes(data2, offset = 1))
    commit(dir, 1, Seq(
      addWithDv("f1.parquet", 50,
        s""""deletionVector":{"storageType":"p",""" +
          s""""pathOrInlineDv":"$badFile","offset":1,""" +
          s""""sizeInBytes":${data2.length + 7},"cardinality":1}""")))
    val e = intercept[Exception] { DeltaRead.read(spark, dir).count() }
    assert(e.getMessage.contains("sizeInBytes"))
  }

  test("DV on a percent-encodable file name: deleted rows do NOT reappear") {
    // _metadata.file_path URI-encodes 'f name %3A.parquet' — a join key
    // derived from it must percent-decode before matching the logged
    // basename, else the anti-join silently matches nothing
    val dir = tmp()
    dataFile(dir, "f name %3A.parquet", range(0, 50))
    commit(dir, 0, Seq(protoDv, metaLine(schemaJson),
      addWithDv("f%20name%20%253A.parquet", 50, inlineDv(Seq(0L, 1L, 2L)))))
    val df = DeltaRead.read(spark, dir)
    assert(df.count() == 47,
      "DV-deleted rows reappeared — scan/delete join keys disagree")
    val ks = df.select("k").collect().map(_.getLong(0)).toSet
    assert(!ks.contains(0L) && ks.contains(3L))
  }

  test("DV decode is executor-side: driver plan ships bytes, not positions") {
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 200000))
    // delete 100k of 200k rows — position count far exceeds what any
    // driver-side LocalRelation should carry
    val dels = (0L until 200000L by 2L).toSeq
    commit(dir, 0, Seq(protoDv, metaLine(schemaJson),
      addWithDv("f0.parquet", 200000, inlineDv(dels))))
    val df = DeltaRead.read(spark, dir)
    assert(df.count() == 100000)
    assert(df.agg(min("k")).head().getLong(0) == 1L)
    val localSizes = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.size
    }
    assert(localSizes.nonEmpty && localSizes.max <= 1,
      s"driver-side relation carries $localSizes rows — positions must " +
        "decode on executors (one row per DV'd file, holding bytes)")
  }

  test("DVs compose with stats pruning and time travel") {
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 50))
    dataFile(dir, "f1.parquet", range(50, 100))
    def addStats(path: String, lo: Long, hi: Long, dvJson: String = ""): String =
      s"""{"add":{"path":"$path","partitionValues":{},"size":1,""" +
        s""""modificationTime":0,"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":50,\\"minValues\\":{\\"k\\":$lo},""" +
        s"""\\"maxValues\\":{\\"k\\":$hi},\\"nullCount\\":{\\"k\\":0}}"""" +
        (if (dvJson.isEmpty) "" else s",$dvJson") + "}}"
    commit(dir, 0, Seq(protoDv, metaLine(schemaJson),
      addStats("f0.parquet", 0, 49),
      addStats("f1.parquet", 50, 99)))
    // v1 re-adds f1 with a DV deleting its first 10 rows (k=50..59)
    commit(dir, 1, Seq(
      addStats("f1.parquet", 50, 99, inlineDv((0L until 10L)))))
    assert(DeltaRead.read(spark, dir).count() == 90)
    assert(DeltaRead.read(spark, dir, 0).count() == 100, "time travel pre-DV")
    // stats pruning still holds: the DV'd file's stats describe the
    // pre-delete superset, so pruning may over-keep but never over-skip
    val got = DeltaRead.readWhere(spark, dir, "k >= 55")
    assert(got.count() == 40) // 60..99 (55..59 deleted by the DV)
    val (_, kept) = DeltaRead.pruneReport(spark, dir, "k < 50")
    assert(kept == 1)
  }

  // ------------------------------------------------------------------
  // column mapping (name mode)
  // ------------------------------------------------------------------

  private def mappedField(name: String, dt: DataType, phys: String,
                          id: Long): StructField =
    StructField(name, dt, nullable = true,
      new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())

  test("column mapping name mode: physical parquet names, nested structs, physical stats keys") {
    val dir = tmp()
    val logical = StructType(Seq(
      mappedField("k", LongType, "col-aaa", 1),
      mappedField("info", StructType(Seq(
        mappedField("tag", StringType, "col-ccc", 3))), "col-bbb", 2)))
    // data files carry ONLY physical names, nested included
    val df = spark.range(0, 100).select(
      col("id").as("col-aaa"),
      struct(concat(lit("t"), col("id")).as("col-ccc")).as("col-bbb"))
    dataFile(dir, "f0.parquet", df.filter(col("col-aaa") < 50))
    dataFile(dir, "f1.parquet", df.filter(col("col-aaa") >= 50))
    val conf = """{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"3"}"""
    def addM(path: String, lo: Long, hi: Long): String =
      s"""{"add":{"path":"$path","partitionValues":{},"size":1,""" +
        s""""modificationTime":0,"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":50,\\"minValues\\":{\\"col-aaa\\":$lo},""" +
        s"""\\"maxValues\\":{\\"col-aaa\\":$hi},\\"nullCount\\":{\\"col-aaa\\":0}}"}}"""
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(logical.json, conf = conf),
      addM("f0.parquet", 0, 49), addM("f1.parquet", 50, 99)))
    val back = DeltaRead.read(spark, dir)
    // logical names come back, nested included
    assert(back.columns.toSeq == Seq("k", "info"))
    assert(back.select("info.tag").collect().map(_.getString(0)).toSet
      .contains("t42"))
    assert(back.count() == 100)
    // stats recorded under PHYSICAL keys drive pruning on LOGICAL predicates
    val (total, kept) = DeltaRead.pruneReport(spark, dir, "k >= 50")
    assert(total == 2 && kept == 1, s"physical-key stats must prune: $kept/$total")
    assert(DeltaRead.readWhere(spark, dir, "k >= 50").count() == 50)
  }

  test("column mapping: partitionValues keyed by PHYSICAL name recover typed logical column") {
    val dir = tmp()
    val logical = StructType(Seq(
      mappedField("k", LongType, "col-k", 1),
      mappedField("p", IntegerType, "col-p", 2)))
    // partition column lives ONLY in partitionValues (physical key);
    // data files sit FLAT (no hive dirs) and carry only physical col-k
    dataFile(dir, "f0.parquet",
      spark.range(0, 10).select(col("id").as("col-k")))
    dataFile(dir, "f1.parquet",
      spark.range(10, 30).select(col("id").as("col-k")))
    val conf = """{"delta.columnMapping.mode":"name"}"""
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(logical.json, parts = """["p"]""", conf = conf),
      """{"add":{"path":"f0.parquet","partitionValues":{"col-p":"1"},"size":1,"modificationTime":0,"dataChange":true}}""",
      """{"add":{"path":"f1.parquet","partitionValues":{"col-p":"2"},"size":1,"modificationTime":0,"dataChange":true}}"""))
    val back = DeltaRead.read(spark, dir)
    assert(back.columns.toSeq == Seq("k", "p"))
    assert(back.schema("p").dataType == IntegerType)
    assert(back.filter(col("p") === 2).count() == 20)
    assert(back.count() == 30)
  }

  test("column mapping id mode: parquet FIELD-ID matching when names disagree") {
    val dir = tmp()
    def fid(id: Long) = new MetadataBuilder()
      .putLong("parquet.field.id", id).build()
    // the rename-before scenario: the data file's column names bear NO
    // relation to the logical OR physical names — only field ids line
    // up; a name-matching reader would surface all-null columns
    val df = spark.range(0, 100).select(
      col("id").as("old_name_a", fid(1)),
      struct(concat(lit("t"), col("id")).as("old_inner", fid(3)))
        .as("old_outer", fid(2)))
    dataFile(dir, "f0.parquet", df.filter(col("old_name_a") < 50))
    dataFile(dir, "f1.parquet", df.filter(col("old_name_a") >= 50))
    val logical = StructType(Seq(
      mappedField("k", LongType, "col-aaa", 1),
      mappedField("info", StructType(Seq(
        mappedField("tag", StringType, "col-ccc", 3))), "col-bbb", 2)))
    val conf = """{"delta.columnMapping.mode":"id"}"""
    def addM(path: String, lo: Long, hi: Long): String =
      s"""{"add":{"path":"$path","partitionValues":{},"size":1,""" +
        s""""modificationTime":0,"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":50,\\"minValues\\":{\\"col-aaa\\":$lo},""" +
        s"""\\"maxValues\\":{\\"col-aaa\\":$hi},\\"nullCount\\":{\\"col-aaa\\":0}}"}}"""
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(logical.json, conf = conf),
      addM("f0.parquet", 0, 49), addM("f1.parquet", 50, 99)))
    val back = DeltaRead.read(spark, dir)
    assert(back.columns.toSeq == Seq("k", "info"))
    assert(back.count() == 100)
    // values NON-null proves resolution went by field id, not name
    assert(back.agg(sum("k")).head().getLong(0) == (0L until 100).sum)
    assert(back.select("info.tag").collect().map(_.getString(0)).toSet
      .contains("t42"))
    // stats stay keyed by PHYSICAL name in id mode too
    val (total, kept) = DeltaRead.pruneReport(spark, dir, "k >= 50")
    assert(total == 2 && kept == 1)
    assert(DeltaRead.readWhere(spark, dir, "k >= 50").count() == 50)
  }

  test("unknown column-mapping modes refused loudly") {
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 10))
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(schemaJson,
        conf = """{"delta.columnMapping.mode":"zorder"}"""),
      addPlain("f0.parquet", 10)))
    val e = intercept[IllegalArgumentException] {
      DeltaRead.read(spark, dir).count()
    }
    assert(e.getMessage.contains("zorder"))
  }

  test("copy-on-write DELETE applies existing DVs during the rewrite; NESTED mapped refused") {
    import sources.DeltaWrite
    // DV table: the rewrite source is the DV-APPLIED assembly, so a
    // copy-on-write can never resurrect DV-deleted rows
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 50))
    commit(dir, 0, Seq(protoDv, metaLine(schemaJson),
      addWithDv("f0.parquet", 50, inlineDv(Seq(0L, 1L))))) // k=0,1 gone
    assert(DeltaWrite.delete(spark, dir, "k >= 40") == 1)
    val back = DeltaRead.read(spark, dir)
    assert(back.count() == 38, "50 - 2 DV-deleted - 10 predicate-deleted")
    val ks = back.select("k").collect().map(_.getLong(0)).toSet
    assert(!ks.contains(0L) && !ks.contains(1L),
      "rewrite must not resurrect DV-deleted rows")
    assert(!ks.contains(45L) && ks.contains(2L) && ks.contains(39L))
    // column-mapped NESTED schemas stay refused (the physicalizer
    // handles flat mapped schemas only)
    val dir2 = tmp()
    val nested = StructType(Seq(
      mappedField("k", LongType, "col-aaa", 1),
      mappedField("info", StructType(Seq(
        mappedField("tag", StringType, "col-ccc", 3))), "col-bbb", 2)))
    dataFile(dir2, "f0.parquet", spark.range(0, 10).select(
      col("id").as("col-aaa"),
      struct(concat(lit("t"), col("id")).as("col-ccc")).as("col-bbb")))
    commit(dir2, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(nested.json,
        conf = """{"delta.columnMapping.mode":"name"}"""),
      addPlain("f0.parquet", 10)))
    val e2 = intercept[IllegalArgumentException] {
      DeltaWrite.delete(spark, dir2, "k >= 5")
    }
    assert(e2.getMessage.contains("nested"))
  }

  test("column-mapped writes: physical-name re-emission on append, COW, and id mode") {
    import sources.DeltaWrite
    // name mode: append + upsert + delete land PHYSICAL parquet names
    // with physically-keyed stats; every read resolves logically
    val dir = tmp()
    val logical = StructType(Seq(
      mappedField("k", LongType, "col-aaa", 1),
      mappedField("name", StringType, "col-bbb", 2)))
    dataFile(dir, "f0.parquet", spark.range(0, 50).select(
      col("id").as("col-aaa"),
      concat(lit("u"), col("id")).as("col-bbb")))
    def statsM(lo: Long, hi: Long, n: Long): String =
      s""""stats":"{\\"numRecords\\":$n,\\"minValues\\":{\\"col-aaa\\":$lo},""" +
        s"""\\"maxValues\\":{\\"col-aaa\\":$hi},\\"nullCount\\":{\\"col-aaa\\":0}}""""
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(logical.json,
        conf = """{"delta.columnMapping.mode":"name"}"""),
      s"""{"add":{"path":"f0.parquet","partitionValues":{},"size":1,""" +
        s""""modificationTime":0,"dataChange":true,${statsM(0, 49, 50)}}}"""))
    // append a LOGICAL-named batch
    assert(DeltaWrite.append(range(50, 100).coalesce(1), dir) == 1)
    val back = DeltaRead.read(spark, dir)
    assert(back.columns.toSeq == Seq("k", "name"))
    assert(back.count() == 100)
    assert(back.agg(sum("k")).head().getLong(0) == (0L until 100).sum,
      "appended file must resolve through the physical mapping")
    // the new add's stats are keyed PHYSICALLY and drive pruning
    val c1 = java.nio.file.Files.readString(
      Paths.get(dir, "_delta_log", f"${1L}%020d.json"))
    assert(c1.contains("col-aaa") && !c1.contains("\\\"k\\\""),
      s"stats must be keyed by physical names: $c1")
    val (total, kept) = DeltaRead.pruneReport(spark, dir, "k >= 50")
    assert(total == 2 && kept == 1, s"pruning on the new file: $kept/$total")
    // COW upsert + delete on the mapped table
    assert(DeltaWrite.upsert(
      spark.createDataFrame(Seq((10L, "updated"), (200L, "fresh")))
        .toDF("k", "name"), dir, Seq("k")) == 2)
    val afterUp = DeltaRead.read(spark, dir)
    assert(afterUp.count() == 101)
    assert(afterUp.filter(col("k") === 10).head().getString(1) == "updated")
    assert(DeltaWrite.delete(spark, dir, "k >= 90 AND k < 100") == 3)
    assert(DeltaRead.read(spark, dir).count() == 91)
    // round 10: mergeSchema evolution on a mapped table MINTS a fresh
    // field id (above maxColumnId / existing ids) + a col-<uuid>
    // physical name and bumps delta.columnMapping.maxColumnId in the
    // same commit's metaData
    val preV = DeltaRead.latestVersion(spark, dir)
    val evoV = DeltaWrite.append(
      range(300, 302).withColumn("score", col("k") * 2L), dir,
      mergeSchema = true)
    val evolved = DeltaRead.read(spark, dir)
    assert(evolved.columns.toSeq == Seq("k", "name", "score"))
    assert(evolved.count() == 93)
    assert(evolved.filter(col("k") === 300).head().getLong(2) == 600L)
    assert(evolved.filter(col("score").isNull).count() == 91,
      "pre-evolution rows surface NULL for the minted column")
    val cEvo = java.nio.file.Files.readString(
      Paths.get(dir, "_delta_log", f"$evoV%020d.json"))
    assert(cEvo.contains("\"delta.columnMapping.maxColumnId\":\"3\""),
      s"maxColumnId must bump to the minted id: $cEvo")
    assert(cEvo.contains("delta.columnMapping.id\\\":3"),
      s"the new column must carry the minted field id: $cEvo")
    // the new add's stats are keyed by the MINTED physical name, and
    // the physicalName follows the protocol's col-<uuid> convention
    val physScore = """col-[0-9a-fA-F-]{36}""".r
      .findFirstIn(cEvo).getOrElse(fail(s"no col-<uuid> name in $cEvo"))
    assert(cEvo.contains(s"""\\"$physScore\\":600"""),
      s"stats for the new column must key physically: $cEvo")
    // per-version schemas: time travel BEFORE the evolution shows the
    // original two columns
    assert(DeltaRead.read(spark, dir, preV).columns.toSeq
      == Seq("k", "name"))
    // a second evolution keeps minting upward, never reusing an id
    val evoV2 = DeltaWrite.append(
      range(302, 303).withColumn("score", lit(0L))
        .withColumn("tag2", lit("x")), dir, mergeSchema = true)
    val cEvo2 = java.nio.file.Files.readString(
      Paths.get(dir, "_delta_log", f"$evoV2%020d.json"))
    assert(cEvo2.contains("\"delta.columnMapping.maxColumnId\":\"4\""))
    assert(DeltaRead.read(spark, dir).columns.toSeq
      == Seq("k", "name", "score", "tag2"))

    // id mode: the appended file must carry parquet field ids — prove
    // it by resolution: rename-style logical/physical names with a
    // field-id-resolving read
    val dir2 = tmp()
    def fid(id: Long) = new MetadataBuilder()
      .putLong("parquet.field.id", id).build()
    dataFile(dir2, "f0.parquet", spark.range(0, 50).select(
      col("id").as("old_a", fid(1)),
      concat(lit("u"), col("id")).as("old_b", fid(2))))
    commit(dir2, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(logical.json,
        conf = """{"delta.columnMapping.mode":"id"}"""),
      addPlain("f0.parquet", 50)))
    assert(DeltaWrite.append(range(50, 100).coalesce(1), dir2) == 1)
    val back2 = DeltaRead.read(spark, dir2)
    assert(back2.count() == 100)
    assert(back2.agg(sum("k")).head().getLong(0) == (0L until 100).sum,
      "id-mode append must land field ids the reader resolves by")
  }

  test("checkpointing a DV table: features + DVs carry verbatim, cleaned log reads back") {
    import sources.{DeltaWrite, DeltaRead}
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 50))
    commit(dir, 0, Seq(protoDv, metaLine(schemaJson),
      addWithDv("f0.parquet", 50, inlineDv(Seq(0L, 1L, 2L))))) // k 0-2 gone
    spark.conf.set("graft.delta.checkpoint.interval", "2")
    try {
      DeltaWrite.appendBatch(range(50, 60).coalesce(1), dir, "ckdv", 0L)
      DeltaWrite.appendBatch(range(60, 70).coalesce(1), dir, "ckdv", 1L)
      assert(java.nio.file.Files.exists(Paths.get(dir, "_delta_log",
        f"${2L}%020d.checkpoint.parquet")),
        "a DV table must checkpoint — its state carries verbatim")
      (0L to 2L).foreach(v => java.nio.file.Files.delete(
        Paths.get(dir, "_delta_log", f"$v%020d.json")))
      val back = DeltaRead.read(spark, dir)
      assert(back.count() == 67, "50 - 3 DV'd + 20 appended")
      val ks = back.select("k").collect().map(_.getLong(0)).toSet
      assert(!ks.contains(0L) && !ks.contains(2L),
        "deletion vector must survive the checkpoint round-trip")
      // txn watermark survived too
      assert(DeltaWrite.appendBatch(range(60, 70).coalesce(1), dir,
        "ckdv", 1L) == 2, "replayed batch must stay skipped")
      // and the reader-version gate still enforces from checkpoint state
      val st = DeltaRead.replay(spark, dir, -1L)
      assert(st.minReaderVersion == 3 &&
        st.readerFeatures.contains("deletionVectors"))
    } finally spark.conf.unset("graft.delta.checkpoint.interval")
  }

  test("unmodeled log state (e.g. domainMetadata) blocks checkpointing, never reading") {
    import sources.{DeltaWrite, DeltaRead}
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 10))
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine(schemaJson),
      addPlain("f0.parquet", 10),
      """{"domainMetadata":{"domain":"x","configuration":"{}","removed":false}}"""))
    // reading past the unknown action is fine (it doesn't change files)
    assert(DeltaRead.read(spark, dir).count() == 10)
    // but a checkpoint would DROP it — refused
    assert(!DeltaWrite.writeCheckpoint(spark, dir, 0L),
      "unmodeled state must block checkpointing")
    assert(!java.nio.file.Files.exists(Paths.get(dir, "_delta_log",
      f"${0L}%020d.checkpoint.parquet")))
  }

  // ------------------------------------------------------------------
  // multi-part checkpoints + _last_checkpoint
  // ------------------------------------------------------------------

  private def writeCkptPart(dir: String, sql: String, name: String): Unit = {
    val stage = Files.createTempDirectory("graft_ckpt").toString
    spark.sql(sql).coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(dir, "_delta_log", name),
      StandardCopyOption.REPLACE_EXISTING)
  }

  private val ckptNull =
    "CAST(NULL AS struct<path:string,partitionValues:map<string,string>,stats:string>) AS add"
  private def ckptRowSql(addSql: String, metaSql: String,
                         protoSql: String): String =
    s"SELECT $addSql, CAST(NULL AS struct<path:string>) AS remove, " +
      s"$metaSql, $protoSql"

  test("multi-part checkpoint: all parts required, resolved via listing; stale pointer ignored") {
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 50))
    dataFile(dir, "f1.parquet", range(50, 100))
    dataFile(dir, "f2.parquet", range(100, 150))
    commit(dir, 2, Seq(addPlain("f2.parquet", 50)))
    val metaSql = s"named_struct('schemaString', '${schemaJson.replace("'", "''")}', " +
      "'partitionColumns', array()) AS metaData"
    val nullMeta = "CAST(NULL AS struct<schemaString:string,partitionColumns:array<string>>) AS metaData"
    val protoSql = "named_struct('minReaderVersion', 1) AS protocol"
    val nullProto = "CAST(NULL AS struct<minReaderVersion:int>) AS protocol"
    def addSql(p: String): String =
      s"named_struct('path', '$p', 'partitionValues', map('a','b'), " +
        "'stats', CAST(NULL AS string)) AS add"
    // part 1 of 2: metaData + protocol; part 2 of 2: the adds
    writeCkptPart(dir,
      ckptRowSql(ckptNull, metaSql, nullProto) + " UNION ALL " +
        ckptRowSql(ckptNull, nullMeta, protoSql),
      f"${1L}%020d.checkpoint.${1}%010d.${2}%010d.parquet")
    writeCkptPart(dir,
      ckptRowSql(addSql("f0.parquet"), nullMeta, nullProto) +
        " UNION ALL " + ckptRowSql(addSql("f1.parquet"), nullMeta, nullProto),
      f"${1L}%020d.checkpoint.${2}%010d.${2}%010d.parquet")
    Files.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":1,"parts":2,"size":4}""")
    val df = DeltaRead.read(spark, dir)
    assert(df.count() == 150)
    assert(df.agg(sum("k")).head().getLong(0) == (0L until 150).sum)
    // drop one part: the group is incomplete, so the checkpoint must be
    // IGNORED — and with commits 0/1 absent the read fails loudly on the
    // missing commit rather than silently serving half a checkpoint
    Files.delete(Paths.get(dir, "_delta_log",
      f"${1L}%020d.checkpoint.${2}%010d.${2}%010d.parquet"))
    val e = intercept[IllegalArgumentException] {
      DeltaRead.read(spark, dir)
    }
    assert(e.getMessage.contains("missing commit"))
  }

  // ------------------------------------------------------------------
  // PathCodec
  // ------------------------------------------------------------------

  test("PathCodec: %XX-only decode — '+' literal, UTF-8, malformed passthrough") {
    assert(PathCodec.percentDecode("a%20b") == "a b")
    assert(PathCodec.percentDecode("c++") == "c++", "'+' must stay literal")
    assert(PathCodec.percentDecode("t%3D12%253A30") == "t=12%3A30")
    assert(PathCodec.percentDecode("%E2%82%AC") == "€", "UTF-8 multibyte")
    assert(PathCodec.percentDecode("100%") == "100%", "trailing % passes through")
    assert(PathCodec.percentDecode("%zz") == "%zz", "malformed escape passes through")
    assert(PathCodec.percentDecode("plain-name_1.parquet") == "plain-name_1.parquet")
  }

  test("PathCodec: encode/decode round-trip on hostile segment names") {
    Seq("t=12%3A30/part-1.parquet", "a b/c++.parquet", "p=€/f.parquet",
      "100%/x.parquet").foreach { rel =>
      val enc = PathCodec.percentEncodePath(rel)
      assert(PathCodec.percentDecode(enc) == rel,
        s"round-trip broke: $rel -> $enc -> ${PathCodec.percentDecode(enc)}")
      assert(!enc.split("/").exists(_.contains(" ")),
        s"encoded form must be URI-safe: $enc")
    }
  }

  test("PathCodec: Z85 round-trip and rejection") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { i =>
      val b = Array.fill[Byte](i * 4)(0)
      rnd.nextBytes(b)
      assert(PathCodec.z85Decode(PathCodec.z85Encode(b)).toSeq == b.toSeq)
    }
    intercept[IllegalArgumentException] { PathCodec.z85Encode(Array[Byte](1)) }
    intercept[IllegalArgumentException] { PathCodec.z85Decode("abcd") }
    intercept[IllegalArgumentException] { PathCodec.z85Decode("abéde") }
    // the 0MQ spec test vector: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B
    // encodes to "HelloWorld"
    val spec = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B)
      .map(_.toByte)
    assert(PathCodec.z85Encode(spec) == "HelloWorld")
    assert(PathCodec.z85Decode("HelloWorld").toSeq == spec.toSeq)
  }

  test("v2/UUID checkpoint: parquet manifest + sidecars reconstruct state past a cleaned log") {
    import org.apache.spark.sql.Row
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 50))
    dataFile(dir, "f1.parquet", range(50, 100))
    dataFile(dir, "f2.parquet", range(100, 150))
    val protoV2 =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],""" +
        """"writerFeatures":["v2Checkpoint"]}}"""
    def addL(p: String, lo: Long, hi: Long, n: Long): String =
      s"""{"add":{"path":"$p","partitionValues":{},"size":1,""" +
        s""""modificationTime":0,"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":$n,\\"minValues\\":{\\"k\\":$lo},""" +
        s"""\\"maxValues\\":{\\"k\\":$hi},\\"nullCount\\":{\\"k\\":0}}"}}"""
    commit(dir, 0, Seq(protoV2, metaLine(schemaJson),
      addL("f0.parquet", 0, 49, 50)))
    commit(dir, 1, Seq(addL("f1.parquet", 50, 99, 50),
      """{"remove":{"path":"f0.parquet","deletionTimestamp":1,"dataChange":true}}"""))
    commit(dir, 2, Seq(addL("f2.parquet", 100, 149, 50)))

    // hand-build the v2 manifest (parquet) + one sidecar holding state
    val topSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)),
        StructField("writerFeatures", ArrayType(StringType))))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("format", StructType(Seq(
          StructField("provider", StringType)))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType)),
        StructField("createdTime", LongType)))),
      StructField("checkpointMetadata", StructType(Seq(
        StructField("version", LongType)))),
      StructField("sidecar", StructType(Seq(
        StructField("path", StringType),
        StructField("sizeInBytes", LongType))))))
    val topRows = Seq(
      Row(Row(3, 7, Seq("v2Checkpoint"), Seq("v2Checkpoint")), null,
        null, null),
      Row(null, Row("t", Row("parquet"), schemaJson, Seq.empty[String],
        Map.empty[String, String], 0L), null, null),
      Row(null, null, Row(2L), null),
      Row(null, null, null, Row("sc1.parquet", 123L)))
    val sidecarSchema = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("stats", StringType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType),
        StructField("deletionTimestamp", LongType),
        StructField("dataChange", BooleanType))))))
    def stats(lo: Long, hi: Long, n: Long): String =
      s"""{"numRecords":$n,"minValues":{"k":$lo},""" +
        s""""maxValues":{"k":$hi},"nullCount":{"k":0}}"""
    val scRows = Seq(
      Row(Row("f1.parquet", Map.empty[String, String], 1L, 0L, false,
        stats(50, 99, 50)), null),
      Row(Row("f2.parquet", Map.empty[String, String], 1L, 0L, false,
        stats(100, 149, 50)), null),
      Row(null, Row("f0.parquet", 1L, false)))
    def writeExact(rows: Seq[Row], schema: StructType, rel: String): Unit = {
      val stage = Files.createTempDirectory("graft_v2ck").toString
      spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), schema)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = Paths.get(dir, rel)
      Files.createDirectories(target.getParent)
      Files.copy(part.toPath, target, StandardCopyOption.REPLACE_EXISTING)
    }
    val uuid = "0a1b2c3d-0000-4000-8000-9fedcba01234"
    writeExact(topRows, topSchema,
      f"_delta_log/${2L}%020d.checkpoint.$uuid.parquet")
    writeExact(scRows, sidecarSchema, "_delta_log/_sidecars/sc1.parquet")
    Files.writeString(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":2}""")
    // clean the checkpointed prefix — the v2 manifest must carry it
    (0L to 2L).foreach(v => Files.delete(
      Paths.get(dir, "_delta_log", f"$v%020d.json")))
    val back = DeltaRead.read(spark, dir)
    assert(back.count() == 100, s"got ${back.count()}")
    assert(back.agg(min(col("k"))).head().getLong(0) == 50)
    // sidecar stats drive pruning
    val (total, kept) = DeltaRead.pruneReport(spark, dir, "k >= 100")
    assert(total == 2 && kept == 1, s"sidecar stats must prune: $kept/$total")
    // tail commits past the manifest still apply
    dataFile(dir, "f3.parquet", range(150, 160))
    commit(dir, 3, Seq(addL("f3.parquet", 150, 159, 10)))
    assert(DeltaRead.read(spark, dir).count() == 110)
    // time travel into the cleaned prefix refuses loudly
    intercept[IllegalArgumentException] { DeltaRead.read(spark, dir, 1) }
    // round 10: the writer CHECKPOINTS v2Checkpoint tables in the v2
    // form (previously refused) — re-checkpoint on top of the fixture
    // manifest and read back through it
    assert(graft.sources.DeltaWrite.writeCheckpoint(spark, dir, 3L))
    val v2s = new java.io.File(Paths.get(dir, "_delta_log").toString)
      .list().filter(_.matches(
        "0{19}3\\.checkpoint\\.[0-9a-fA-F-]{36}\\.parquet"))
    assert(v2s.length == 1, s"expected one v3 v2-manifest, got ${v2s.toSeq}")
    Files.deleteIfExists(
      Paths.get(dir, "_delta_log", f"${3L}%020d.json"))
    assert(DeltaRead.read(spark, dir).count() == 110,
      "read past the cleaned v3 commit via the freshly written manifest")
  }

  test("v2 checkpoint: json manifest with inline adds and with sidecars") {
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 50))
    dataFile(dir, "f1.parquet", range(50, 100))
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],""" +
        """"writerFeatures":["v2Checkpoint"]}}""",
      metaLine(schemaJson),
      addPlain("f0.parquet", 50), addPlain("f1.parquet", 50)))
    commit(dir, 1, Seq(
      """{"remove":{"path":"f0.parquet","deletionTimestamp":1,"dataChange":true}}"""))
    val uuid = "1a1b2c3d-0000-4000-8000-9fedcba01234"
    // inline form: adds live in the manifest itself; a txn watermark
    // rides along and must survive
    Files.writeString(Paths.get(dir, "_delta_log",
      f"${1L}%020d.checkpoint.$uuid.json"), Seq(
      """{"checkpointMetadata":{"version":1}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],""" +
        """"writerFeatures":["v2Checkpoint"]}}""",
      metaLine(schemaJson),
      addPlain("f1.parquet", 50),
      """{"remove":{"path":"f0.parquet","deletionTimestamp":1,"dataChange":false}}""",
      """{"txn":{"appId":"job9","version":7}}""").mkString("\n") + "\n")
    (0L to 1L).foreach(v => Files.delete(
      Paths.get(dir, "_delta_log", f"$v%020d.json")))
    val back = DeltaRead.read(spark, dir)
    assert(back.count() == 50)
    assert(back.agg(min(col("k"))).head().getLong(0) == 50)
    assert(DeltaRead.replay(spark, dir, -1L).txns.get("job9").contains(7L),
      "txn watermark must survive a json v2 manifest")
  }

  test("optimize folds deletion vectors: rewritten file drops the DV, deleted rows stay gone") {
    import graft.sources.DeltaWrite
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 50))
    dataFile(dir, "f1.parquet", range(50, 100))
    commit(dir, 0, Seq(protoDv, metaLine(schemaJson),
      addWithDv("f0.parquet", 50, inlineDv(Seq(0L, 1L))), // k=0,1 deleted
      addPlain("f1.parquet", 50)))
    assert(DeltaRead.read(spark, dir).count() == 98)
    val v = DeltaWrite.optimize(spark, dir)
    assert(v == 1)
    val back = DeltaRead.read(spark, dir)
    assert(back.count() == 98, "folding a DV must not change the rows")
    val ks = back.select("k").collect().map(_.getLong(0)).toSet
    assert(!ks.contains(0L) && !ks.contains(1L),
      "DV-deleted rows must NEVER resurrect through a compaction")
    val c = java.nio.file.Files.readString(
      Paths.get(dir, "_delta_log", f"${1L}%020d.json"))
    val adds = c.split("\n").filter(_.contains("\"add\""))
    assert(adds.length == 1 && !adds.head.contains("deletionVector"),
      s"the compacted file must carry no DV: ${adds.toSeq}")
    assert(c.split("\n").count(_.contains("\"remove\"")) == 2)
    assert(!c.contains("\"dataChange\":true"))
    // one packed live file remains
    val (total, _) = DeltaRead.pruneReport(spark, dir, "k >= 0")
    assert(total == 1)
  }

  test("optimize zorderBy: layout rewrite prunes range predicates on BOTH dimensions") {
    import graft.sources.DeltaWrite
    val dir = tmp()
    // 64×64 grid: y correlates with the id-contiguous input split, x is
    // uniform everywhere — so pre-optimize an x-range opens every file
    val df = spark.range(0, 4096).select(col("id").as("k"),
      (col("id") % 64).cast("int").as("x"),
      (col("id") / 64).cast("int").as("y"))
    DeltaWrite.create(df.repartition(4), dir) // hash split: both dims everywhere
    val pre = DeltaRead.read(spark, dir).collect().toSet
    val (t0, k0) = DeltaRead.pruneReport(spark, dir, "x >= 60")
    assert(t0 == 4 && k0 == 4, s"pre-optimize x must not prune: $k0 of $t0")
    val v = DeltaWrite.optimize(spark, dir, targetBytes = 8192,
      zorderBy = Seq("x", "y"))
    assert(DeltaRead.read(spark, dir).collect().toSet == pre)
    assert(DeltaRead.read(spark, dir, v - 1).collect().toSet == pre,
      "time travel to the pre-optimize layout")
    // a range predicate on EITHER dimension now opens a subset
    val (t1, k1) = DeltaRead.pruneReport(spark, dir, "x >= 60")
    assert(t1 >= 4 && k1 * 2 <= t1 + 2,
      s"x-range must prune post-zorder: $k1 of $t1")
    val (t2, k2) = DeltaRead.pruneReport(spark, dir, "y >= 60")
    assert(k2 * 2 <= t2 + 2, s"y-range must prune post-zorder: $k2 of $t2")
    // pure reorganization: dataChange=false throughout
    val c = java.nio.file.Files.readString(
      Paths.get(dir, "_delta_log", f"$v%020d.json"))
    assert(!c.contains("\"dataChange\":true"))
    // refusal gates: arity-1 and unknown dimensions
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.optimize(spark, dir, zorderBy = Seq("x"))
    }
    assert(e.getMessage.contains("at least two dimensions"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaWrite.optimize(spark, tmp2(), zorderBy = Seq("k", "nope"))
    }
    assert(e2.getMessage.contains("nope"), e2.getMessage)
  }

  test("zorder on many small partition groups: single-bin fast path keeps rows, one file per group") {
    import graft.sources.DeltaWrite
    val dir = tmp()
    val df = spark.range(0, 4000).selectExpr("id AS k",
      "CAST(id % 40 AS INT) AS x", "CAST(id div 40 AS INT) AS y",
      "CAST(id % 4 AS STRING) AS p")
    DeltaWrite.create(df.repartition(3), dir, Seq("p"))
    val pre = DeltaRead.read(spark, dir).collect().toSet
    // default targetBytes: every group is one bin → the sampling-free
    // repartition(1) path
    val v = DeltaWrite.optimize(spark, dir, zorderBy = Seq("x", "y"))
    assert(v > 0)
    assert(DeltaRead.read(spark, dir).collect().toSet == pre,
      "the fast path must preserve rows exactly")
    val (total, _) = DeltaRead.pruneReport(spark, dir, "k >= 0")
    assert(total == 4, s"one z-sorted file per partition group: $total")
    assert(DeltaRead.pruneReport(spark, dir, "p = '1'")._2 == 1,
      "partition pruning intact through the rewrite")
  }

  test("optimize zorderBy arity-3 incl. a string dimension: every dim prunes") {
    import graft.sources.DeltaWrite
    val dir = tmp()
    // 16×16×16 cube: x/y/z vary independently; s is z's zero-padded
    // string rendering, so string-prefix scaling sees ordered prefixes
    val df = spark.range(0, 4096).selectExpr("id AS k",
      "CAST(id % 16 AS INT) AS x",
      "CAST((id div 16) % 16 AS INT) AS y",
      "concat('s', lpad(CAST(id div 256 AS STRING), 2, '0')) AS s")
    DeltaWrite.create(df.repartition(4), dir) // hash split: no dim prunes
    val pre = DeltaRead.read(spark, dir).collect().toSet
    val (t0, k0) = DeltaRead.pruneReport(spark, dir, "x >= 12")
    assert(t0 == 4 && k0 == 4, s"pre-optimize x must not prune: $k0/$t0")
    // enough z-range bins that the range cuts reach ALL THREE dims'
    // top bits (4 bins would cut only the two most-significant
    // dimensions of the 48-bit key)
    val v = DeltaWrite.optimize(spark, dir, targetBytes = 512,
      zorderBy = Seq("x", "y", "s"))
    assert(DeltaRead.read(spark, dir).collect().toSet == pre,
      "zorder rewrite must preserve the rows exactly")
    assert(DeltaRead.read(spark, dir, v - 1).collect().toSet == pre)
    // 1-of-N-ish opens on EVERY participating dimension
    val (t1, k1) = DeltaRead.pruneReport(spark, dir, "x >= 12")
    assert(t1 >= 4 && k1 * 2 <= t1 + 2,
      s"x-range must prune post-zorder3: $k1 of $t1")
    val (t2, k2) = DeltaRead.pruneReport(spark, dir, "y >= 12")
    assert(k2 * 2 <= t2 + 2, s"y-range must prune post-zorder3: $k2 of $t2")
    val (t3, k3) = DeltaRead.pruneReport(spark, dir, "s >= 's12'")
    assert(k3 * 2 <= t3 + 2,
      s"string-range must prune post-zorder3: $k3 of $t3")
    // still a pure reorganization
    val c = java.nio.file.Files.readString(
      Paths.get(dir, "_delta_log", f"$v%020d.json"))
    assert(!c.contains("\"dataChange\":true"))
  }

  private def tmp2(): String = {
    import graft.sources.DeltaWrite
    val d = tmp()
    DeltaWrite.create(range(0, 10), d)
    d
  }

  test("v2 checkpoint WRITER: UUID manifest + sidecar, cleaned prefix, time travel, txn watermark") {
    import graft.sources.DeltaWrite
    val dir = tmp()
    // a v2Checkpoint-feature table this engine appends to: commit 0 is
    // the feature-declaring protocol + metaData, appends follow
    dataFile(dir, "f0.parquet", range(0, 10))
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],""" +
        """"writerFeatures":["v2Checkpoint"]}}""",
      metaLine(schemaJson),
      addPlain("f0.parquet", 10)))
    // 14 more appends through the writer; the default interval (10)
    // fires at version 10 and must write the V2 form, not classic
    (1 to 14).foreach(i =>
      DeltaWrite.append(range(i * 10L, i * 10L + 10), dir))
    val logDir = Paths.get(dir, "_delta_log")
    val names = new java.io.File(logDir.toString).list().toSeq
    val v2Name = names.find(_.matches(
      "0{18}10\\.checkpoint\\.[0-9a-fA-F-]{36}\\.parquet"))
    assert(v2Name.nonEmpty, s"expected a v2 UUID manifest, got $names")
    assert(!names.contains(f"${10L}%020d.checkpoint.parquet"),
      "a v2Checkpoint table must get the v2 form, not classic")
    val sidecars = new java.io.File(logDir.resolve("_sidecars").toString)
      .list().toSeq.filter(_.endsWith(".parquet"))
    assert(sidecars.size == 1, s"one sidecar expected, got $sidecars")
    // the manifest carries checkpointMetadata + a sidecar ref with real
    // size/mtime (required fields third-party readers trust)
    val manifest = spark.read.parquet(
      logDir.resolve(v2Name.get).toString)
    assert(manifest.where("checkpointMetadata.version = 10").count() == 1)
    val sc = manifest.where("sidecar.path is not null")
      .select("sidecar.path", "sidecar.sizeInBytes").head()
    assert(sc.getString(0) == sidecars.head)
    assert(sc.getLong(1) ==
      Files.size(logDir.resolve("_sidecars").resolve(sidecars.head)))
    // clean the checkpointed prefix: reads must reconstruct from the
    // v2 manifest + sidecar alone
    (0L to 10L).foreach(v =>
      Files.deleteIfExists(logDir.resolve(f"$v%020d.json")))
    assert(DeltaRead.read(spark, dir).count() == 150)
    assert(DeltaRead.read(spark, dir, version = 12).count() == 130,
      "time travel through the v2 checkpoint must work")
    // txn watermarks survive the v2 checkpoint: a replayed batch is a
    // no-op even after the commits carrying the txn action are gone
    val dir2 = tmp()
    dataFile(dir2, "f0.parquet", range(0, 10))
    commit(dir2, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],""" +
        """"writerFeatures":["v2Checkpoint"]}}""",
      metaLine(schemaJson),
      addPlain("f0.parquet", 10)))
    (1 to 9).foreach(i =>
      DeltaWrite.append(range(i * 10L, i * 10L + 10), dir2))
    DeltaWrite.appendBatch(range(100, 110), dir2, "appA", 7L) // v10 → ckpt
    val log2 = Paths.get(dir2, "_delta_log")
    assert(new java.io.File(log2.toString).list().exists(_.matches(
      "0{18}10\\.checkpoint\\.[0-9a-fA-F-]{36}\\.parquet")))
    (0L to 10L).foreach(v =>
      Files.deleteIfExists(log2.resolve(f"$v%020d.json")))
    val before = DeltaRead.read(spark, dir2).count()
    DeltaWrite.appendBatch(range(100, 110), dir2, "appA", 7L) // replay
    assert(DeltaRead.read(spark, dir2).count() == before,
      "replayed batch must stay skipped across the v2 checkpoint")
  }

  test("vacuum DV reachability: in-table 'p' DV kept; orphan .bin floored on the newest tombstone") {
    import graft.sources.DeltaWrite
    val day = 24L * 3600 * 1000
    // --- a 'p' (absolute-path) DV stored INSIDE the table dir is
    // CURRENT-reachable: vacuum must never sweep it as an orphan ---
    val dir = tmp()
    dataFile(dir, "f0.parquet", range(0, 50))
    val data0 = roaringArrayBytes(Seq(1L, 2L))
    val pFile = Paths.get(dir, "dvs", "inside_dv.bin")
    Files.createDirectories(pFile.getParent)
    Files.write(pFile, dvFileBytes(data0, offset = 1))
    commit(dir, 0, Seq(protoDv, metaLine(schemaJson),
      addWithDv("f0.parquet", 50,
        s""""deletionVector":{"storageType":"p",""" +
          s""""pathOrInlineDv":"$pFile","offset":1,""" +
          s""""sizeInBytes":${data0.length},"cardinality":2}""")))
    DeltaWrite.vacuum(spark, dir, retainMillis = 0L)
    assert(Files.exists(pFile),
      "an in-table 'p' DV is referenced by the CURRENT version — " +
        "vacuum deleting it would break every subsequent read")
    assert(DeltaRead.read(spark, dir).count() == 48)

    // --- an unreferenced .bin with NO tombstone (its add was
    // rewritten) must wait for the NEWEST tombstone to exit retention:
    // its own mtime predates the rewrite that orphaned it ---
    val dir2 = tmp()
    dataFile(dir2, "f0.parquet", range(0, 50))
    dataFile(dir2, "f1.parquet", range(50, 100))
    commit(dir2, 0, Seq(protoDv, metaLine(schemaJson),
      addPlain("f0.parquet", 50), addPlain("f1.parquet", 50)))
    commit(dir2, 1, Seq( // fresh rewrite: tombstone ts = now
      s"""{"remove":{"path":"f1.parquet","deletionTimestamp":""" +
        s"""${System.currentTimeMillis()},"dataChange":true}}"""))
    val stale2 = Paths.get(dir2, "stale_dv.bin")
    Files.write(stale2, dvFileBytes(roaringArrayBytes(Seq(5L)), 1))
    stale2.toFile.setLastModified(System.currentTimeMillis() - 10 * day)
    DeltaWrite.vacuum(spark, dir2) // default 7-day retention
    assert(Files.exists(stale2),
      "a time-travel reader inside retention may still need the DV " +
        "of a freshly rewritten add — mtime alone must not reclaim it")

    // --- once every tombstone is past the horizon, both the
    // tombstoned file and the orphaned DV reclaim ---
    val dir3 = tmp()
    dataFile(dir3, "f0.parquet", range(0, 50))
    dataFile(dir3, "f1.parquet", range(50, 100))
    commit(dir3, 0, Seq(protoDv, metaLine(schemaJson),
      addPlain("f0.parquet", 50), addPlain("f1.parquet", 50)))
    val old = System.currentTimeMillis() - 10 * day
    commit(dir3, 1, Seq(
      s"""{"remove":{"path":"f1.parquet","deletionTimestamp":$old,""" +
        s""""dataChange":true}}"""))
    val stale3 = Paths.get(dir3, "stale_dv.bin")
    Files.write(stale3, dvFileBytes(roaringArrayBytes(Seq(5L)), 1))
    stale3.toFile.setLastModified(old)
    val n = DeltaWrite.vacuum(spark, dir3)
    assert(!Files.exists(stale3) && n >= 2,
      s"stale DV + expired-tombstone data file both reclaim (got $n)")
  }

  test("RESTORE: prior version re-served, history kept, schema restored, vacuumed files refuse") {
    import graft.sources.DeltaWrite
    val dir = tmp()
    DeltaWrite.create(range(0, 10).coalesce(1), dir)          // v0
    DeltaWrite.append(range(10, 20).coalesce(1), dir)         // v1
    val v2 = DeltaWrite.delete(spark, dir, "k >= 15")          // v2: COW
    assert(v2 == 2L)
    val atV1 = DeltaRead.read(spark, dir, version = 1L)
      .collect().map(_.toSeq).toSet
    // restore to v1: one NEW commit, table equals the v1 snapshot
    val v3 = DeltaWrite.restore(spark, dir, 1L)
    assert(v3 == 3L)
    assert(DeltaRead.read(spark, dir)
      .collect().map(_.toSeq).toSet == atV1)
    // history is preserved — time travel to the deleted state works
    assert(DeltaRead.read(spark, dir, version = 2L).count() == 15)
    // no-op restore: states already match
    assert(DeltaWrite.restore(spark, dir, 3L) == 3L)
    assert(DeltaWrite.restore(spark, dir, 1L) == 3L,
      "restoring to an identical state must not commit")
    // schema restore: evolve, then restore to the pre-evolution shape
    DeltaWrite.append(range(20, 25)
      .withColumn("extra", lit(7L)).coalesce(1), dir,
      mergeSchema = true)                                     // v4
    assert(DeltaRead.read(spark, dir).columns.contains("extra"))
    val v5 = DeltaWrite.restore(spark, dir, 3L)
    assert(v5 == 5L)
    val back = DeltaRead.read(spark, dir)
    assert(!back.columns.contains("extra"),
      "restore must re-emit the old metaData")
    assert(back.collect().map(_.toSeq).toSet == atV1)
    // a vacuumed file refuses loudly instead of serving a dangling add
    val dir2 = tmp()
    DeltaWrite.create(range(0, 10).coalesce(1), dir2)         // v0
    DeltaWrite.delete(spark, dir2, "k >= 5")                  // v1: rewrite
    DeltaWrite.vacuum(spark, dir2, retainMillis = 0L)         // v0 file gone
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.restore(spark, dir2, 0L)
    }
    assert(e.getMessage.contains("no longer on disk"))
  }
}
