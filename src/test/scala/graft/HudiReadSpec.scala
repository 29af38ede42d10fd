package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Read-only Hudi COW interop against a hand-built table using purely
  * the PUBLIC storage layout: a 2-commit timeline where the second
  * commit rewrites one file group (fileId shadowing), an inflight
  * commit that must stay invisible, instant time travel, meta-column
  * dropping, replacecommit (clustering) planning, and the refusal gates.
  */
class HudiReadSpec extends AnyFunSuite {
  import SparkTestSession._
  import sources.HudiRead

  private def tmp(): String =
    Files.createTempDirectory("graft_hudi").toString + "/t"

  /** One parquet base file named per Hudi's <fileId>_<token>_<instant>
    * convention, carrying the standard meta columns like a real writer.
    */
  private def baseFile(dir: String, fileId: String, instant: String,
                       df: org.apache.spark.sql.DataFrame,
                       partition: String = ""): String = {
    val name = s"${fileId}_0-0-0_$instant.parquet"
    val rel = if (partition.isEmpty) name else s"$partition/$name"
    val withMeta = df
      .withColumn("_hoodie_commit_time", lit(instant))
      .withColumn("_hoodie_commit_seqno", lit(s"${instant}_0_1"))
      .withColumn("_hoodie_record_key", col("k").cast("string"))
      .withColumn("_hoodie_partition_path", lit(partition))
      .withColumn("_hoodie_file_name", lit(name))
    val stage = Files.createTempDirectory("graft_hudi_stage").toString
    withMeta.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(dir, rel).getParent)
    Files.copy(part.toPath, Paths.get(dir, rel),
      StandardCopyOption.REPLACE_EXISTING)
    rel
  }

  private def properties(dir: String, tableType: String): Unit = {
    val h = Paths.get(dir, ".hoodie")
    Files.createDirectories(h)
    Files.writeString(h.resolve("hoodie.properties"),
      s"hoodie.table.name=t\nhoodie.table.type=$tableType\n" +
        "hoodie.table.version=6\n")
  }

  private def commitJson(files: Seq[(String, String)]): String = {
    // partition key derived from the file's directory part, matching
    // how a real writer groups partitionToWriteStats
    val byPart = files.groupBy { case (_, p) =>
      val i = p.lastIndexOf('/'); if (i < 0) "" else p.substring(0, i)
    }
    val parts = byPart.toSeq.sortBy(_._1).map { case (part, fs) =>
      val stats = fs.map { case (fid, p) =>
        s"""{"fileId":"$fid","path":"$p","prevCommit":"null",""" +
          s""""numWrites":2,"fileSizeInBytes":1}"""
      }.mkString(",")
      s""""$part":[$stats]"""
    }.mkString(",")
    s"""{"partitionToWriteStats":{$parts},"operation":"upsert"}"""
  }

  private def commit(dir: String, instant: String,
                     files: Seq[(String, String)]): Unit =
    Files.writeString(Paths.get(dir, ".hoodie", s"$instant.commit"),
      commitJson(files))

  private def rows(lo: Long, hi: Long, tag: String) =
    spark.range(lo, hi).select(col("id").as("k"),
      concat(lit(tag), col("id").cast("string")).as("v"))

  /** commit 001 writes groups f1 (k 0-1) and f2 (k 10-11); commit 002
    * REWRITES f1 (k 0-1 with new payloads) and adds f3 (k 20-21); an
    * inflight 003 leaves a data file + .commit.inflight marker.
    */
  private def buildTable(): String = {
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    properties(dir, "COPY_ON_WRITE")
    val f1a = baseFile(dir, "f1", "001", rows(0, 2, "old"))
    val f2 = baseFile(dir, "f2", "001", rows(10, 12, "b"))
    commit(dir, "001", Seq("f1" -> f1a, "f2" -> f2))
    val f1b = baseFile(dir, "f1", "002", rows(0, 2, "new"))
    val f3 = baseFile(dir, "f3", "002", rows(20, 22, "c"))
    commit(dir, "002", Seq("f1" -> f1b, "f3" -> f3))
    // in-flight writer: data landed, commit not completed
    val f4 = baseFile(dir, "f4", "003", rows(30, 32, "x"))
    Files.writeString(Paths.get(dir, ".hoodie", "003.commit.inflight"), "")
    Files.writeString(Paths.get(dir, ".hoodie", "003.commit.requested"), "")
    dir
  }

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("COW snapshot: latest file slice per group, inflight invisible") {
    val dir = buildTable()
    val got = HudiRead.read(spark, dir)
    // meta columns dropped, payload schema only
    assert(got.columns.toSeq == Seq("k", "v"))
    val want = asSet(rows(0, 2, "new")
      .unionByName(rows(10, 12, "b")).unionByName(rows(20, 22, "c")))
    assert(asSet(got) == want) // f1's 001 slice shadowed; f4 invisible
  }

  test("instant time travel reads the 001 snapshot") {
    val dir = buildTable()
    val got = HudiRead.read(spark, dir, asOf = "001")
    assert(asSet(got) == asSet(rows(0, 2, "old").unionByName(rows(10, 12, "b"))))
    intercept[IllegalArgumentException] {
      HudiRead.read(spark, dir, asOf = "000") // before any commit
    }
  }

  test("unknown table types are refused loudly") {
    val dir = buildTable()
    properties(dir, "SOMETHING_NEW")
    val e1 = intercept[IllegalArgumentException] {
      HudiRead.read(spark, dir)
    }
    assert(e1.getMessage.contains("SOMETHING_NEW"))
  }

  /** A replacecommit: write stats like any commit PLUS the killed
    * (partition → fileIds) map, matching the layout Hudi's clustering
    * and insert_overwrite emit.
    */
  private def replaceCommit(dir: String, instant: String,
      files: Seq[(String, String)],
      replaced: Map[String, Seq[String]]): Unit = {
    val base = commitJson(files) // ends in `"operation":"upsert"}`
    val rep = replaced.toSeq.sortBy(_._1).map { case (p, fids) =>
      s""""$p":[${fids.map(f => s""""$f"""").mkString(",")}]"""
    }.mkString(",")
    val json = base.dropRight(1) +
      s""","partitionToReplaceFileIds":{$rep}}"""
    Files.writeString(
      Paths.get(dir, ".hoodie", s"$instant.replacecommit"), json)
  }

  test("replacecommit (clustering): replaced groups die, new groups " +
      "serve, time travel sees the pre-clustering slices") {
    val dir = buildTable()
    // cluster f1+f2 into one new group c1 at instant 004 — the data is
    // the same rows re-organized, as Hudi clustering produces
    val c1 = baseFile(dir, "c1", "004",
      rows(0, 2, "new").unionByName(rows(10, 12, "b")))
    replaceCommit(dir, "004", Seq("c1" -> c1),
      Map("" -> Seq("f1", "f2")))
    val got = HudiRead.read(spark, dir)
    val want = asSet(rows(0, 2, "new").unionByName(rows(10, 12, "b"))
      .unionByName(rows(20, 22, "c")))
    assert(asSet(got) == want) // same rows, now from c1 + f3
    // time travel to before the clustering serves the old groups
    val at002 = HudiRead.read(spark, dir, asOf = "002")
    assert(asSet(at002) == want)
    // insert_overwrite semantics: replace c1 with DIFFERENT rows
    val o1 = baseFile(dir, "o1", "005", rows(100, 102, "ow"))
    replaceCommit(dir, "005", Seq("o1" -> o1), Map("" -> Seq("c1")))
    val after = HudiRead.read(spark, dir)
    assert(asSet(after) ==
      asSet(rows(100, 102, "ow").unionByName(rows(20, 22, "c"))))
  }

  test("replacecommit + archived timeline: replaced on-disk bases are " +
      "covered, not refused") {
    val dir = buildTable()
    val c1 = baseFile(dir, "c1", "004",
      rows(0, 2, "new").unionByName(rows(10, 12, "b")))
    replaceCommit(dir, "004", Seq("c1" -> c1),
      Map("" -> Seq("f1", "f2")))
    // a non-empty archived dir triggers the per-group coverage check;
    // f1/f2's on-disk bases must be excused via the replacement, and
    // the shadowed f1@001 slice via the live f1@002... which is itself
    // replaced — both lanes go through replacedAt
    val arch = Paths.get(dir, ".hoodie", "archived")
    Files.createDirectories(arch)
    Files.writeString(arch.resolve(".commits_.archive.1_1-0-1"), "x")
    val got = HudiRead.read(spark, dir)
    val want = asSet(rows(0, 2, "new").unionByName(rows(10, 12, "b"))
      .unionByName(rows(20, 22, "c")))
    assert(asSet(got) == want)
  }

  // ---------------------------------------------------------------
  // MOR log-file rig: blocks framed per the public log tech spec
  // (#HUDI# magic, 8-byte block size, version, type ordinal,
  // ordinal-keyed header map, content, footer map, total length)
  // ---------------------------------------------------------------

  private val logAvroSchema =
    """{"type":"record","name":"rec","fields":[
      {"name":"_hoodie_record_key","type":["null","string"],"default":null},
      {"name":"k","type":["null","long"],"default":null},
      {"name":"v","type":["null","string"],"default":null}]}"""
      .replaceAll("\\s+", " ")

  /** One avro-binary record of the fixture payload. */
  private def avroRec(k: Long, v: String): Array[Byte] = {
    val schema = new org.apache.avro.Schema.Parser().parse(logAvroSchema)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put("_hoodie_record_key", k.toString)
    rec.put("k", Long.box(k)); rec.put("v", v)
    val bos = new java.io.ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get()
      .binaryEncoder(bos, null)
    new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema).write(rec, enc)
    enc.flush()
    bos.toByteArray
  }

  /** AVRO_DATA_BLOCK content: 4-byte version, 4-byte count, then per
    * record 4-byte length + avro-binary bytes.
    */
  private def avroBlockContent(recs: Seq[(Long, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(3); out.writeInt(recs.size)
    recs.foreach { case (k, v) =>
      val b = avroRec(k, v); out.writeInt(b.length); out.write(b)
    }
    out.flush(); bos.toByteArray
  }

  private def metaBytes(m: Map[Int, String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (ord, v) =>
      val b = v.getBytes("UTF-8")
      out.writeInt(ord); out.writeInt(b.length); out.write(b)
    }
    out.flush(); bos.toByteArray
  }

  /** One framed log block: magic, size, version, type, header map,
    * content length, content, footer map, total length.
    */
  private def block(tpe: Int, header: Map[Int, String],
                    content: Array[Byte]): Array[Byte] = {
    val hdr = metaBytes(header)
    val ftr = metaBytes(Map.empty)
    val blockSize = 4L + 4 + hdr.length + 8 + content.length + ftr.length + 8
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write("#HUDI#".getBytes("UTF-8"))
    out.writeLong(blockSize)
    out.writeInt(1)       // log format version
    out.writeInt(tpe)     // block type ordinal
    out.write(hdr)
    out.writeLong(content.length.toLong)
    out.write(content)
    out.write(ftr)
    out.writeLong(6L + 8 + blockSize) // total incl. magic + size field
    out.flush(); bos.toByteArray
  }

  /** Avro data block at `instant` carrying (k, v) upserts. */
  private def dataBlock(instant: String,
                        recs: Seq[(Long, String)]): Array[Byte] =
    block(3, Map(0 -> instant, 2 -> logAvroSchema),
      avroBlockContent(recs))

  // the public HoodieDeleteRecordList model (content version >= 3)
  private val deleteListSchema =
    """{"namespace":"org.apache.hudi.avro.model","type":"record",
        "name":"HoodieDeleteRecordList","fields":[
          {"name":"deleteRecordList","type":{"type":"array","items":{
            "type":"record","name":"HoodieDeleteRecord","fields":[
              {"name":"recordKey","type":["null","string"],
               "default":null},
              {"name":"partitionPath","type":["null","string"],
               "default":null},
              {"name":"orderingVal","type":["null","string","int",
               "long","float","double","bytes"],"default":null}]}},
           "default":[]}]}"""

  /** DELETE_BLOCK at `instant`: 4-byte content version (3), 4-byte
    * length, avro-binary HoodieDeleteRecordList of the keys.
    */
  private def deleteBlock(instant: String,
                          keys: Seq[String]): Array[Byte] = {
    val schema =
      new org.apache.avro.Schema.Parser().parse(deleteListSchema)
    val itemS = schema.getField("deleteRecordList").schema()
      .getElementType
    val list = new java.util.ArrayList[AnyRef]()
    keys.foreach { k =>
      val r = new org.apache.avro.generic.GenericData.Record(itemS)
      r.put("recordKey", k); r.put("partitionPath", "")
      list.add(r)
    }
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put("deleteRecordList", list)
    val bos = new java.io.ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get()
      .binaryEncoder(bos, null)
    new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema).write(rec, enc)
    enc.flush()
    val avro = bos.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(3); d.writeInt(avro.length); d.write(avro); d.flush()
    block(1, Map(0 -> instant), out.toByteArray)
  }

  private def writeLog(dir: String, name: String,
                       blocks: Seq[Array[Byte]]): Unit =
    Files.write(Paths.get(dir, name), blocks.flatten.toArray)

  private def kv(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r =>
      r.getLong(r.fieldIndex("k")) -> r.getString(r.fieldIndex("v"))).toMap

  test("MERGE_ON_READ: uncompacted avro log blocks merge onto the base file") {
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    properties(dir, "MERGE_ON_READ")
    // deltacommit 001: insert-only (base parquet files) — readable
    val f1a = baseFile(dir, "f1", "001", rows(0, 2, "old"))
    Files.writeString(Paths.get(dir, ".hoodie", "001.deltacommit"),
      commitJson(Seq("f1" -> f1a)))
    assert(asSet(HudiRead.read(spark, dir)) == asSet(rows(0, 2, "old")))
    // deltacommit 002: a log file UPDATES k=0 and INSERTS k=5
    val log1 = ".f1_001.log.1_0-0-0"
    writeLog(dir, log1, Seq(dataBlock("002",
      Seq(0L -> "upd0", 5L -> "ins5"))))
    Files.writeString(Paths.get(dir, ".hoodie", "002.deltacommit"),
      commitJson(Seq("f1" -> log1)))
    val merged = HudiRead.read(spark, dir)
    assert(merged.columns.toSeq == Seq("k", "v"), "meta columns dropped")
    assert(kv(merged) == Map(0L -> "upd0", 1L -> "old1", 5L -> "ins5"))
    // time travel BEFORE the log write serves the base alone
    assert(asSet(HudiRead.read(spark, dir, asOf = "001"))
      == asSet(rows(0, 2, "old")))
    // deltacommit 003: a SECOND log file, two blocks — last write wins
    // across files and blocks (k=0 updated twice more)
    val log2 = ".f1_001.log.2_0-0-0"
    writeLog(dir, log2, Seq(
      dataBlock("003", Seq(0L -> "upd0b")),
      dataBlock("003", Seq(0L -> "upd0c", 1L -> "upd1"))))
    Files.writeString(Paths.get(dir, ".hoodie", "003.deltacommit"),
      commitJson(Seq("f1" -> log2)))
    assert(kv(HudiRead.read(spark, dir))
      == Map(0L -> "upd0c", 1L -> "upd1", 5L -> "ins5"))
    // ...and time travel between the log writes replays exactly
    assert(kv(HudiRead.read(spark, dir, asOf = "002"))
      == Map(0L -> "upd0", 1L -> "old1", 5L -> "ins5"))
    // compaction 004 folds the merged view into a fresh base — the
    // merged read at 003 must equal the post-compaction read
    val preCompaction = kv(HudiRead.read(spark, dir, asOf = "003"))
    val f1b = baseFile(dir, "f1", "004", spark.createDataFrame(
      preCompaction.toSeq.sortBy(_._1)).toDF("k", "v"))
    Files.writeString(Paths.get(dir, ".hoodie", "004.commit"),
      commitJson(Seq("f1" -> f1b)))
    assert(kv(HudiRead.read(spark, dir)) == preCompaction,
      "merged read must equal the post-compaction read")
  }

  test("MOR clustering: a replaced group's logs drop with its base") {
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    properties(dir, "MERGE_ON_READ")
    val f1a = baseFile(dir, "f1", "001", rows(0, 2, "old"))
    Files.writeString(Paths.get(dir, ".hoodie", "001.deltacommit"),
      commitJson(Seq("f1" -> f1a)))
    val log1 = ".f1_001.log.1_0-0-0"
    writeLog(dir, log1, Seq(dataBlock("002",
      Seq(0L -> "upd0", 5L -> "ins5"))))
    Files.writeString(Paths.get(dir, ".hoodie", "002.deltacommit"),
      commitJson(Seq("f1" -> log1)))
    val merged = kv(HudiRead.read(spark, dir))
    assert(merged == Map(0L -> "upd0", 1L -> "old1", 5L -> "ins5"))
    // clustering 003 folds the merged view into fresh group c1 and
    // replaces f1 — both the f1 base AND its log must leave the plan
    val c1 = baseFile(dir, "c1", "003", spark.createDataFrame(
      merged.toSeq.sortBy(_._1)).toDF("k", "v"))
    replaceCommit(dir, "003", Seq("c1" -> c1), Map("" -> Seq("f1")))
    assert(kv(HudiRead.read(spark, dir)) == merged,
      "clustered read must equal the pre-clustering merged read")
    // time travel before the clustering still merges f1's log
    assert(kv(HudiRead.read(spark, dir, asOf = "002")) == merged)
  }

  test("MOR isolation: in-flight blocks invisible, rollback command skips, corrupt refuses") {
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    properties(dir, "MERGE_ON_READ")
    val f1a = baseFile(dir, "f1", "001", rows(0, 2, "old"))
    Files.writeString(Paths.get(dir, ".hoodie", "001.deltacommit"),
      commitJson(Seq("f1" -> f1a)))
    // one log file carrying: a committed block (002), a block whose
    // instant 004 NEVER completed (crashed writer), and a block at 005
    // that completed but was rolled back via a command block
    val log1 = ".f1_001.log.1_0-0-0"
    writeLog(dir, log1, Seq(
      dataBlock("002", Seq(0L -> "upd0")),
      dataBlock("004", Seq(1L -> "CRASHED")),
      dataBlock("005", Seq(1L -> "ROLLEDBACK")),
      // rollback COMMAND_BLOCK (type 0): COMMAND_BLOCK_TYPE=0 targets
      // instant 005
      block(0, Map(0 -> "006", 1 -> "005", 3 -> "0"), Array.emptyByteArray)))
    Files.writeString(Paths.get(dir, ".hoodie", "002.deltacommit"),
      commitJson(Seq("f1" -> log1)))
    Files.writeString(Paths.get(dir, ".hoodie", "005.deltacommit"),
      commitJson(Seq("f1" -> log1)))
    assert(kv(HudiRead.read(spark, dir))
      == Map(0L -> "upd0", 1L -> "old1"),
      "in-flight and rolled-back blocks must never serve")
    // a Kryo-era DELETE_BLOCK (content version < 3) refuses BY NAME,
    // and an HFILE_DATA_BLOCK (type 4) stays refused by name too
    val dir2 = tmp()
    Files.createDirectories(Paths.get(dir2))
    properties(dir2, "MERGE_ON_READ")
    val f2a = baseFile(dir2, "f1", "001", rows(0, 2, "old"))
    Files.writeString(Paths.get(dir2, ".hoodie", "001.deltacommit"),
      commitJson(Seq("f1" -> f2a)))
    writeLog(dir2, ".f1_001.log.1_0-0-0", Seq(
      block(1, Map(0 -> "002"), Array[Byte](0, 0, 0, 0, 0, 0, 0, 0))))
    Files.writeString(Paths.get(dir2, ".hoodie", "002.deltacommit"),
      commitJson(Seq("f1" -> ".f1_001.log.1_0-0-0")))
    def msgHas(t: Throwable, s: String): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains(s)) ||
        msgHas(t.getCause, s))
    val e = intercept[Exception] { HudiRead.read(spark, dir2).collect() }
    assert(msgHas(e, "DELETE_BLOCK"), s"got: ${e.getMessage}")
    writeLog(dir2, ".f1_001.log.1_0-0-0", Seq(
      block(4, Map(0 -> "002"), Array[Byte](0, 0, 0, 0))))
    val eh = intercept[Exception] { HudiRead.read(spark, dir2).collect() }
    assert(msgHas(eh, "HFILE_DATA_BLOCK"), s"got: ${eh.getMessage}")
    // corrupt bytes refuse loudly, never silently skip
    val dir3 = tmp()
    Files.createDirectories(Paths.get(dir3))
    properties(dir3, "MERGE_ON_READ")
    val f3a = baseFile(dir3, "f1", "001", rows(0, 2, "old"))
    Files.writeString(Paths.get(dir3, ".hoodie", "001.deltacommit"),
      commitJson(Seq("f1" -> f3a)))
    Files.writeString(Paths.get(dir3, ".f1_001.log.1_0-0-0"),
      "opaque-log-bytes")
    Files.writeString(Paths.get(dir3, ".hoodie", "002.deltacommit"),
      commitJson(Seq("f1" -> ".f1_001.log.1_0-0-0")))
    val e2 = intercept[Exception] { HudiRead.read(spark, dir3).collect() }
    def anywhere(t: Throwable): Boolean =
      t != null && (t.getMessage != null &&
        (t.getMessage.contains("corrupt") || t.getMessage.contains("magic"))
        || anywhere(t.getCause))
    assert(anywhere(e2), s"corrupt log must refuse loudly: ${e2.getMessage}")
  }

  test("archived timeline: fully-covered live groups read; an actual coverage gap refuses by name") {
    val dir = buildTable()
    val arch = Paths.get(dir, ".hoodie", "archived")
    Files.createDirectories(arch)
    assert(HudiRead.read(spark, dir).count() == 6,
      "an EMPTY archived dir must not refuse")
    Files.writeString(arch.resolve(".commits_.archive.1_1-0-1"), "x")
    // every live file group's latest base instant is in the ACTIVE
    // timeline (f1@002, f2@001, f3@002; f4@003 is a pending writer) —
    // the read must match the pre-archival read, not refuse
    assert(HudiRead.read(spark, dir).count() == 6,
      "covered groups must read with an archived timeline present")
    assert(HudiRead.read(spark, dir, asOf = "001").count() == 4,
      "time travel inside the active window still works")
    // an actual gap: a base file whose instant appears in NO active
    // commit and carries no pending marker — its commit was archived
    baseFile(dir, "f9", "000", rows(90, 92, "gone"))
    val e = intercept[IllegalArgumentException] {
      HudiRead.read(spark, dir)
    }
    assert(e.getMessage.contains("f9") && e.getMessage.contains("000"),
      s"the gapped group must refuse BY NAME: ${e.getMessage}")
  }

  test("MOR DELETE_BLOCK: interleaved data+delete blocks equal the post-compaction read") {
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    properties(dir, "MERGE_ON_READ")
    val f1a = baseFile(dir, "f1", "001", rows(0, 2, "old")) // k=0,1
    Files.writeString(Paths.get(dir, ".hoodie", "001.deltacommit"),
      commitJson(Seq("f1" -> f1a)))
    // 002 upserts k=0 + inserts k=5; 003 DELETES k=1 and k=5;
    // 004 re-inserts k=5 — arrival order must win at every step
    val log1 = ".f1_001.log.1_0-0-0"
    writeLog(dir, log1, Seq(
      dataBlock("002", Seq(0L -> "upd0", 5L -> "ins5")),
      deleteBlock("003", Seq("1", "5")),
      dataBlock("004", Seq(5L -> "re5"))))
    Seq("002", "003", "004").foreach(ts =>
      Files.writeString(Paths.get(dir, ".hoodie", s"$ts.deltacommit"),
        commitJson(Seq("f1" -> log1))))
    assert(kv(HudiRead.read(spark, dir))
      == Map(0L -> "upd0", 5L -> "re5"),
      "base k=1 deleted; k=5 deleted then re-inserted")
    // time travel between the blocks replays the delete exactly
    assert(kv(HudiRead.read(spark, dir, asOf = "003"))
      == Map(0L -> "upd0"))
    assert(kv(HudiRead.read(spark, dir, asOf = "002"))
      == Map(0L -> "upd0", 1L -> "old1", 5L -> "ins5"))
    // compaction folds the same view: merged read == post-compaction
    val pre = kv(HudiRead.read(spark, dir))
    val f1b = baseFile(dir, "f1", "005", spark.createDataFrame(
      pre.toSeq.sortBy(_._1)).toDF("k", "v"))
    Files.writeString(Paths.get(dir, ".hoodie", "005.commit"),
      commitJson(Seq("f1" -> f1b)))
    assert(kv(HudiRead.read(spark, dir)) == pre,
      "merged-with-deletes read must equal the post-compaction read")
  }

  test("MOR PARQUET_DATA_BLOCK: foreign parquet log blocks merge like avro blocks") {
    // what a writer with hoodie.logfile.data.block.format=parquet
    // produces: block content is one COMPLETE parquet file of payload
    // records (self-describing — no SCHEMA header needed)
    def parquetBlockContent(recs: Seq[(Long, String)]): Array[Byte] = {
      val stage = Files.createTempDirectory("graft_hudi_pqblk").toString
      spark.createDataFrame(recs).toDF("k", "v")
        .selectExpr("CAST(k AS STRING) AS _hoodie_record_key", "k", "v")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.readAllBytes(part.toPath)
    }
    def parquetBlock(instant: String,
                     recs: Seq[(Long, String)]): Array[Byte] =
      block(5, Map(0 -> instant), parquetBlockContent(recs))
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    properties(dir, "MERGE_ON_READ")
    val f1a = baseFile(dir, "f1", "001", rows(0, 2, "old"))
    Files.writeString(Paths.get(dir, ".hoodie", "001.deltacommit"),
      commitJson(Seq("f1" -> f1a)))
    // deltacommit 002: a PARQUET block updates k=0 and inserts k=5
    val log1 = ".f1_001.log.1_0-0-0"
    writeLog(dir, log1, Seq(parquetBlock("002",
      Seq(0L -> "pupd0", 5L -> "pins5"))))
    Files.writeString(Paths.get(dir, ".hoodie", "002.deltacommit"),
      commitJson(Seq("f1" -> log1)))
    assert(kv(HudiRead.read(spark, dir))
      == Map(0L -> "pupd0", 1L -> "old1", 5L -> "pins5"),
      "parquet log block must merge last-write-wins onto the base")
    // deltacommit 003: parquet and AVRO blocks interleave in ONE log
    // file — arrival order wins across formats
    val log2 = ".f1_001.log.2_0-0-0"
    writeLog(dir, log2, Seq(
      parquetBlock("003", Seq(0L -> "pupd0b")),
      dataBlock("003", Seq(0L -> "aupd0c", 1L -> "aupd1"))))
    Files.writeString(Paths.get(dir, ".hoodie", "003.deltacommit"),
      commitJson(Seq("f1" -> log2)))
    assert(kv(HudiRead.read(spark, dir))
      == Map(0L -> "aupd0c", 1L -> "aupd1", 5L -> "pins5"),
      "avro after parquet must win by arrival order")
    // time travel between the writes replays exactly
    assert(kv(HudiRead.read(spark, dir, asOf = "002"))
      == Map(0L -> "pupd0", 1L -> "old1", 5L -> "pins5"))
    // and the post-compaction read equals the merged view
    val preCompaction = kv(HudiRead.read(spark, dir, asOf = "003"))
    val f1b = baseFile(dir, "f1", "004", spark.createDataFrame(
      preCompaction.toSeq.sortBy(_._1)).toDF("k", "v"))
    Files.writeString(Paths.get(dir, ".hoodie", "004.commit"),
      commitJson(Seq("f1" -> f1b)))
    assert(kv(HudiRead.read(spark, dir)) == preCompaction)
  }

  test("MOR merge is per FILE SLICE: a record key repeated across partitions never cross-merges") {
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    properties(dir, "MERGE_ON_READ")
    // non-global index: key k=1 legally exists in BOTH partitions
    val p1 = baseFile(dir, "f1", "001", rows(1, 2, "a"), "p1")
    val p2 = baseFile(dir, "f2", "001", rows(1, 2, "b"), "p2")
    Files.writeString(Paths.get(dir, ".hoodie", "001.deltacommit"),
      commitJson(Seq("f1" -> p1, "f2" -> p2)))
    // a log on p1's slice updates k=1; p2's k=1 must be untouched
    val log1 = "p1/.f1_001.log.1_0-0-0"
    writeLog(dir, log1, Seq(dataBlock("002", Seq(1L -> "a-upd"))))
    Files.writeString(Paths.get(dir, ".hoodie", "002.deltacommit"),
      commitJson(Seq("f1" -> log1)))
    val got = HudiRead.read(spark, dir).collect()
      .map(r => r.getString(r.fieldIndex("v"))).toSet
    assert(got == Set("a-upd", "b1"),
      s"p2's base row must survive a p1-slice log update, got $got")
    // and a DELETE in p1's log kills only p1's key
    writeLog(dir, log1, Seq(
      dataBlock("002", Seq(1L -> "a-upd")),
      deleteBlock("003", Seq("1"))))
    Files.writeString(Paths.get(dir, ".hoodie", "003.deltacommit"),
      commitJson(Seq("f1" -> log1)))
    val got2 = HudiRead.read(spark, dir).collect()
      .map(r => r.getString(r.fieldIndex("v"))).toSet
    assert(got2 == Set("b1"),
      s"a p1-slice delete must not touch p2's identical key, got $got2")
  }

  test("graft_hudi_read TVF serves the same snapshot from plain SQL") {
    val dir = buildTable()
    api.SqlSurface.install(spark)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_hudi_read('$dir')")
      .head().getLong(0) == 6)
    assert(spark
      .sql(s"SELECT count(*) AS n FROM graft_hudi_read('$dir', '001')")
      .head().getLong(0) == 4)
  }

  /** Hudi 1.x layout: instants live under .hoodie/timeline and
    * completed commits are named <requestedTs>_<completionTs>.commit.
    */
  private def buildTable1x(): String = {
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    properties(dir, "COPY_ON_WRITE")
    val tl = Paths.get(dir, ".hoodie", "timeline")
    Files.createDirectories(tl)
    val f1a = baseFile(dir, "f1", "001", rows(0, 2, "old"))
    val f2 = baseFile(dir, "f2", "001", rows(10, 12, "b"))
    Files.writeString(tl.resolve("001_005.commit"),
      commitJson(Seq("f1" -> f1a, "f2" -> f2)))
    val f1b = baseFile(dir, "f1", "002", rows(0, 2, "new"))
    Files.writeString(tl.resolve("002_006.commit"),
      commitJson(Seq("f1" -> f1b)))
    // in-flight 1.x writer stays invisible
    baseFile(dir, "f9", "003", rows(90, 92, "x"))
    Files.writeString(tl.resolve("003.commit.requested"), "")
    Files.writeString(tl.resolve("003.commit.inflight"), "")
    dir
  }

  test("Hudi 1.x timeline: <ts>_<completionTs>.commit names under .hoodie/timeline") {
    val dir = buildTable1x()
    val got = HudiRead.read(spark, dir)
    assert(asSet(got) == asSet(rows(0, 2, "new").unionByName(rows(10, 12, "b"))),
      "1.x-named completed commits must resolve file slices (f1@002 shadows f1@001)")
    // requested-instant time travel still orders the timeline
    assert(asSet(HudiRead.read(spark, dir, asOf = "001"))
      == asSet(rows(0, 2, "old").unionByName(rows(10, 12, "b"))))
    // a non-empty 1.x LSM history dir triggers the same coverage check
    // as pre-1.x archived: covered groups read, a gap refuses by name
    val hist = Paths.get(dir, ".hoodie", "timeline", "history")
    Files.createDirectories(hist)
    assert(HudiRead.read(spark, dir).count() == 4,
      "an EMPTY history dir must not refuse")
    Files.writeString(hist.resolve("0_1_1.parquet"), "x")
    assert(HudiRead.read(spark, dir).count() == 4,
      "covered groups must read with a 1.x history present")
    baseFile(dir, "f8", "000", rows(80, 82, "gone"))
    val e = intercept[IllegalArgumentException] { HudiRead.read(spark, dir) }
    assert(e.getMessage.contains("f8"))
  }

  test("Hudi 1.x: non-JSON (avro) commit metadata refused, not misread") {
    val dir = buildTable1x()
    // overwrite a completed instant with avro-container bytes
    Files.write(Paths.get(dir, ".hoodie", "timeline", "002_006.commit"),
      Array[Byte]('O', 'b', 'j', 1, 0, 0, 0x10, 0x7F))
    val e = intercept[IllegalArgumentException] { HudiRead.read(spark, dir) }
    assert(e.getMessage.contains("not JSON"))
  }

  test("foreign (avro) clean metadata: latest reads fine, time travel refuses by name") {
    // real Hudi serializes completed clean metadata as Avro
    // (HoodieCleanMetadata) and the default cleaner runs on virtually
    // every production table — a latest-snapshot read must survive it
    val dir = buildTable()
    Files.write(Paths.get(dir, ".hoodie", "0025.clean"),
      Array[Byte]('O', 'b', 'j', 1, 0, 0, 0x10, 0x7F))
    assert(asSet(HudiRead.read(spark, dir).select("k", "v"))
      == asSet(rows(0, 2, "new").union(rows(10, 12, "b"))
        .union(rows(20, 22, "c"))),
      "latest read must ignore an unreadable foreign clean horizon")
    // time travel cannot know what the foreign cleaner deleted
    val e = intercept[IllegalArgumentException] {
      HudiRead.read(spark, dir, asOf = "001")
    }
    assert(e.getMessage.contains("Avro") &&
      e.getMessage.contains(".clean"),
      s"refusal must name the Avro clean metadata: ${e.getMessage}")
    // a graft-written (JSON) clean record still gates time travel
    val dir2 = buildTable()
    Files.writeString(Paths.get(dir2, ".hoodie", "0025.clean"),
      """{"earliestRetained":"002","deleted":[]}""")
    assert(asSet(HudiRead.read(spark, dir2).select("k", "v")).size == 6)
    val e2 = intercept[IllegalArgumentException] {
      HudiRead.read(spark, dir2, asOf = "001")
    }
    assert(e2.getMessage.contains("CLEANED"))
  }

  test("declarative jobs read hudi: sources with time travel") {
    val dir = buildTable()
    val got = api.TransformSpec.run(
      s"""{"source": "hudi:$dir@001", "steps": [
        {"op": "filter", "expr": "k < 5"},
        {"op": "orderBy", "cols": ["k"]}]}""",
      Map.empty[String, org.apache.spark.sql.DataFrame],
      allowInlineSources = true)
    assert(asSet(got) == asSet(rows(0, 2, "old")))
  }
}
