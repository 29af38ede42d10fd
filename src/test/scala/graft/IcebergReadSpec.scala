package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Read-only Iceberg interop against a hand-built table laid out purely
  * from the PUBLIC table spec: vN.metadata.json + version-hint, a
  * manifest-list avro, manifest avros with data_file entries carrying
  * record counts / null counts / little-endian lower/upper bounds,
  * DELETED entry status, snapshot time travel, bounds-driven pruning,
  * and the v2 delete-content gate.
  */
class IcebergReadSpec extends AnyFunSuite {
  import SparkTestSession._
  import sources.IcebergRead

  private def tmp(): String =
    Files.createTempDirectory("graft_iceberg").toString + "/t"

  private def range(lo: Long, hi: Long) = spark.range(lo, hi)
    .select(col("id").as("k"),
      concat(lit("u"), col("id").cast("string")).as("name"))

  private def dataFile(dir: String, name: String,
                       df: org.apache.spark.sql.DataFrame): Unit = {
    val stage = Files.createTempDirectory("graft_ice_stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val target = Paths.get(dir, name)
    Files.createDirectories(target.getParent)
    Files.copy(part.toPath, target, StandardCopyOption.REPLACE_EXISTING)
  }

  // minimal manifest schema: the fields IcebergRead consumes, shaped as
  // the spec shapes them (bounds as key_value arrays of (int, bytes))
  private val kvSchema: Schema = SchemaBuilder.record("key_value").fields()
    .requiredInt("key").requiredBytes("value").endRecord()
  private val kvLongSchema: Schema = SchemaBuilder.record("key_value_l")
    .fields().requiredInt("key").requiredLong("value").endRecord()
  private val dataFileSchema: Schema = SchemaBuilder.record("data_file")
    .fields()
    .requiredString("file_path")
    .requiredLong("record_count")
    .name("null_value_counts").`type`().nullable()
      .array().items(kvLongSchema).noDefault()
    .name("lower_bounds").`type`().nullable()
      .array().items(kvSchema).noDefault()
    .name("upper_bounds").`type`().nullable()
      .array().items(kvSchema).noDefault()
    .endRecord()
  private val entrySchema: Schema = SchemaBuilder.record("manifest_entry")
    .fields()
    .requiredInt("status")
    .name("data_file").`type`(dataFileSchema).noDefault()
    .endRecord()
  private val manifestListSchema: Schema = SchemaBuilder
    .record("manifest_file").fields()
    .requiredString("manifest_path")
    .requiredInt("content")
    .endRecord()

  private def writeAvro(path: String, schema: Schema,
                        rows: Seq[GenericRecord]): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(path))
    try rows.foreach(w.append) finally w.close()
  }

  private def leLong(v: Long): java.nio.ByteBuffer = {
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(v); b.flip(); b
  }
  private def utf8(s: String): java.nio.ByteBuffer =
    java.nio.ByteBuffer.wrap(s.getBytes("UTF-8"))

  private def kvs(schema: Schema, pairs: (Int, AnyRef)*): java.util.List[GenericRecord] =
    pairs.map { case (k, v) =>
      val r = new GenericData.Record(schema)
      r.put("key", Int.box(k)); r.put("value", v)
      r: GenericRecord
    }.asJava

  private def entry(status: Int, path: String, rows: Long,
                    kLo: Long, kHi: Long, nameLo: String, nameHi: String)
      : GenericRecord = {
    val df = new GenericData.Record(dataFileSchema)
    df.put("file_path", path)
    df.put("record_count", Long.box(rows))
    df.put("null_value_counts", kvs(kvLongSchema,
      1 -> Long.box(0L), 2 -> Long.box(0L)))
    df.put("lower_bounds", kvs(kvSchema,
      1 -> leLong(kLo), 2 -> utf8(nameLo)))
    df.put("upper_bounds", kvs(kvSchema,
      1 -> leLong(kHi), 2 -> utf8(nameHi)))
    val e = new GenericData.Record(entrySchema)
    e.put("status", Int.box(status))
    e.put("data_file", df)
    e
  }

  private def manifestListRow(path: String, content: Int): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("manifest_path", path)
    r.put("content", Int.box(content))
    r
  }

  private val schemaJson =
    """{"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "k", "required": false, "type": "long"},
        {"id": 2, "name": "name", "required": false, "type": "string"}]}"""

  /** Two snapshots: snap 100 = f0+f1; snap 200 = f0+f2 (f1 DELETED). */
  private def buildTable(): String = {
    val dir = tmp()
    dataFile(dir, "data/f0.parquet", range(0, 50))
    dataFile(dir, "data/f1.parquet", range(50, 100))
    dataFile(dir, "data/f2.parquet", range(100, 150))
    writeAvro(s"$dir/metadata/m0.avro", entrySchema, Seq(
      entry(1, "data/f0.parquet", 50, 0, 49, "u0", "u9"),
      entry(1, "data/f1.parquet", 50, 50, 99, "u50", "u99")))
    writeAvro(s"$dir/metadata/m1.avro", entrySchema, Seq(
      entry(0, "data/f0.parquet", 50, 0, 49, "u0", "u9"),
      entry(2, "data/f1.parquet", 50, 50, 99, "u50", "u99"), // DELETED
      entry(1, "data/f2.parquet", 50, 100, 149, "u100", "u149")))
    writeAvro(s"$dir/metadata/ml-100.avro", manifestListSchema,
      Seq(manifestListRow("metadata/m0.avro", 0)))
    writeAvro(s"$dir/metadata/ml-200.avro", manifestListSchema,
      Seq(manifestListRow("metadata/m1.avro", 0)))
    val meta = s"""{
      "format-version": 2,
      "table-uuid": "00000000-0000-0000-0000-000000000000",
      "location": "$dir",
      "current-schema-id": 0,
      "schemas": [$schemaJson],
      "current-snapshot-id": 200,
      "snapshots": [
        {"snapshot-id": 100, "manifest-list": "metadata/ml-100.avro"},
        {"snapshot-id": 200, "manifest-list": "metadata/ml-200.avro"}]
    }"""
    Files.createDirectories(Paths.get(dir, "metadata"))
    Files.writeString(Paths.get(dir, "metadata", "v2.metadata.json"), meta)
    Files.writeString(Paths.get(dir, "metadata", "version-hint.text"), "2")
    dir
  }

  test("snapshot resolution: adds minus deleted entries, time travel") {
    val dir = buildTable()
    val cur = IcebergRead.read(spark, dir)
    assert(cur.columns.toSeq == Seq("k", "name"))
    assert(cur.count() == 100) // f0 + f2
    assert(cur.agg(max("k")).head().getLong(0) == 149)
    assert(cur.filter("k >= 50 and k < 100").count() == 0, "f1 was deleted")
    val old = IcebergRead.read(spark, dir, snapshotId = 100)
    assert(old.count() == 100 && old.agg(max("k")).head().getLong(0) == 99)
  }

  test("bounds skipping: pruned read equals unpruned filter, opens fewer files") {
    val dir = buildTable()
    val (total, kept) = IcebergRead.pruneReport(spark, dir, "k >= 100")
    assert(total == 2 && kept == 1, s"expected 1 of 2 files, got $kept of $total")
    val got = IcebergRead.readWhere(spark, dir, "k >= 100")
    assert(got.count() == 50)
    assert(got.count() ==
      IcebergRead.read(spark, dir).filter("k >= 100").count())
    // string bounds prune too (lower/upper decoded from UTF-8 bytes):
    // 'u0' precedes f2's lower bound 'u100' so only f0 can hold it
    // (note 'u120' would legitimately keep BOTH files: it sorts inside
    // f0's ['u0','u9'] lexicographic range — sound, not a miss)
    val (_, keptS) = IcebergRead.pruneReport(spark, dir, "name = 'u0'")
    assert(keptS == 1, s"string bounds did not prune: $keptS")
    assert(IcebergRead.readWhere(spark, dir, "name = 'u0'").count() == 1)
    // impossible predicate: zero files, still answers
    val (_, none) = IcebergRead.pruneReport(spark, dir, "k > 10000")
    assert(none == 0)
    assert(IcebergRead.readWhere(spark, dir, "k > 10000").count() == 0)
  }

  // delete-manifest entries: data_file carries content (1=position,
  // 2=equality) + file_path
  private val delFileSchema: Schema = SchemaBuilder.record("delete_file")
    .fields()
    .requiredInt("content")
    .requiredString("file_path")
    .requiredLong("record_count")
    .endRecord()
  private val delEntrySchema: Schema = SchemaBuilder.record("delete_entry")
    .fields()
    .requiredInt("status")
    .name("data_file").`type`(delFileSchema).noDefault()
    .endRecord()

  private def delEntry(content: Int, path: String, rows: Long)
      : GenericRecord = {
    val df = new GenericData.Record(delFileSchema)
    df.put("content", Int.box(content))
    df.put("file_path", path)
    df.put("record_count", Long.box(rows))
    val e = new GenericData.Record(delEntrySchema)
    e.put("status", Int.box(1))
    e.put("data_file", df)
    e
  }

  /** Write a positional-delete parquet (file_path, pos) under `dir`. */
  private def posDeleteFile(dir: String, name: String,
                            rows: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    dataFile(dir, name, rows.toDF("file_path", "pos"))
  }

  test("v2 position deletes: deleted rows vanish, old snapshot intact") {
    val dir = buildTable()
    // delete positions 0,1,2 of f0 (k=0,1,2) and 49 of f2 (k=149)
    posDeleteFile(dir, "data/del0.parquet",
      Seq(("data/f0.parquet", 0L), ("data/f0.parquet", 1L),
        ("data/f0.parquet", 2L), ("data/f2.parquet", 49L)))
    writeAvro(s"$dir/metadata/dm0.avro", delEntrySchema,
      Seq(delEntry(1, "data/del0.parquet", 4)))
    writeAvro(s"$dir/metadata/ml-200.avro", manifestListSchema, Seq(
      manifestListRow("metadata/m1.avro", 0),
      manifestListRow("metadata/dm0.avro", 1)))
    val cur = IcebergRead.read(spark, dir)
    assert(cur.count() == 96)
    val ks = cur.select("k").collect().map(_.getLong(0)).toSet
    assert(Set(0L, 1L, 2L, 149L).forall(!ks.contains(_)))
    assert(ks.contains(3L) && ks.contains(148L))
    assert(cur.columns.toSeq == Seq("k", "name"))
    // snapshot 100's manifest list carries no delete manifest — intact
    val old = IcebergRead.read(spark, dir, snapshotId = 100)
    assert(old.count() == 100)
    // deletes compose with bounds pruning: the pruned read re-applies
    // both the deletes and the predicate
    assert(IcebergRead.readWhere(spark, dir, "k < 50").count() == 47)
    val (_, kept) = IcebergRead.pruneReport(spark, dir, "k < 50")
    assert(kept == 1)
  }

  // ---- v3 deletion vectors (puffin-stored position deletes) -----------

  private val dvFileSchema: Schema = SchemaBuilder.record("delete_file_dv")
    .fields()
    .requiredInt("content")
    .requiredString("file_path")
    .requiredString("file_format")
    .requiredLong("record_count")
    .requiredString("referenced_data_file")
    .requiredLong("content_offset")
    .requiredLong("content_size_in_bytes")
    .endRecord()
  private val dvEntrySchema: Schema = SchemaBuilder.record("del_entry_dv")
    .fields()
    .requiredInt("status")
    .name("data_file").`type`(dvFileSchema).noDefault()
    .endRecord()
  private def dvEntry(puffin: String, fmt: String, referenced: String,
                      off: Long, len: Long, rows: Long): GenericRecord = {
    val df = new GenericData.Record(dvFileSchema)
    df.put("content", Int.box(1))
    df.put("file_path", puffin)
    df.put("file_format", fmt)
    df.put("record_count", Long.box(rows))
    df.put("referenced_data_file", referenced)
    df.put("content_offset", Long.box(off))
    df.put("content_size_in_bytes", Long.box(len))
    val e = new GenericData.Record(dvEntrySchema)
    e.put("status", Int.box(1))
    e.put("data_file", df)
    e
  }

  /** Portable 64-bit roaring serialization of 32-bit positions: LE
    * 8-byte bitmap count, 4-byte high key, standard 32-bit roaring.
    */
  private def portable64(ps: Seq[Int]): Array[Byte] = {
    val rb = new org.roaringbitmap.RoaringBitmap()
    ps.foreach(rb.add)
    val bos = new java.io.ByteArrayOutputStream()
    rb.serialize(new java.io.DataOutputStream(bos))
    val body = bos.toByteArray
    val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(1L); bb.putInt(0); bb.put(body)
    bb.array()
  }

  /** The spec's deletion-vector-v1 blob: BE combined length of
    * magic+vector, magic D1 D3 39 64, the vector, BE CRC-32 of
    * magic+vector.
    */
  private def dvBlob(vec: Array[Byte]): Array[Byte] = {
    val magic =
      Array(0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)
    val crc = new java.util.zip.CRC32()
    crc.update(magic); crc.update(vec)
    val bb = java.nio.ByteBuffer.allocate(12 + vec.length) // big-endian
    bb.putInt(4 + vec.length); bb.put(magic); bb.put(vec)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Minimal spec-shaped puffin file: magic, the blob, footer (magic +
    * json payload + LE payload size + flags + magic). Returns the
    * blob's offset.
    */
  private def puffinFile(dir: String, name: String,
                         blob: Array[Byte]): Long = {
    val magic = "PFA1".getBytes("UTF-8")
    val payload = (s"""{"blobs":[{"type":"deletion-vector-v1",""" +
      s""""fields":[],"snapshot-id":200,"sequence-number":1,""" +
      s""""offset":4,"length":${blob.length}}],"properties":{}}""")
      .getBytes("UTF-8")
    val bb = java.nio.ByteBuffer.allocate(
      4 + blob.length + 4 + payload.length + 8 + 4)
    bb.put(magic); bb.put(blob)
    bb.put(magic); bb.put(payload)
    val tail = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tail.putInt(payload.length); tail.putInt(0); tail.flip()
    bb.put(tail); bb.put(magic)
    val target = Paths.get(dir, name)
    Files.createDirectories(target.getParent)
    Files.write(target, bb.array())
    4L
  }

  test("v3 puffin deletion vectors: blob-masked rows vanish; corrupt magic and foreign formats refuse") {
    val dir = buildTable()
    // mask positions 0,1,2 of f0 (k=0,1,2) via ONE puffin DV blob
    val blob = dvBlob(portable64(Seq(0, 1, 2)))
    val off = puffinFile(dir, "data/dv0.puffin", blob)
    writeAvro(s"$dir/metadata/dmv.avro", dvEntrySchema, Seq(
      dvEntry("data/dv0.puffin", "PUFFIN", "data/f0.parquet",
        off, blob.length.toLong, 3)))
    writeAvro(s"$dir/metadata/ml-200.avro", manifestListSchema, Seq(
      manifestListRow("metadata/m1.avro", 0),
      manifestListRow("metadata/dmv.avro", 1)))
    val cur = IcebergRead.read(spark, dir)
    assert(cur.count() == 97, s"got ${cur.count()}")
    val ks = cur.select("k").collect().map(_.getLong(0)).toSet
    assert(Set(0L, 1L, 2L).forall(!ks.contains(_)) && ks.contains(3L),
      "the DV must mask exactly its positions")
    // old snapshot (no delete manifest) intact; pruning composes
    assert(IcebergRead.read(spark, dir, snapshotId = 100).count() == 100)
    assert(IcebergRead.readWhere(spark, dir, "k < 50").count() == 47)
    // DVs compose with classic parquet position deletes in one snapshot
    posDeleteFile(dir, "data/delx.parquet", Seq(("data/f2.parquet", 0L)))
    writeAvro(s"$dir/metadata/dmx.avro", delEntrySchema,
      Seq(delEntry(1, "data/delx.parquet", 1)))
    writeAvro(s"$dir/metadata/ml-200.avro", manifestListSchema, Seq(
      manifestListRow("metadata/m1.avro", 0),
      manifestListRow("metadata/dmv.avro", 1),
      manifestListRow("metadata/dmx.avro", 1)))
    val both = IcebergRead.read(spark, dir)
    assert(both.count() == 96)
    assert(!both.select("k").collect().map(_.getLong(0)).toSet
      .contains(100L), "parquet position delete must compose with DVs")
    // refusal: a corrupted blob magic must refuse, never serve a
    // partial mask
    val corrupt = blob.clone(); corrupt(4) = 0x00
    puffinFile(dir, "data/dv_bad.puffin", corrupt)
    writeAvro(s"$dir/metadata/dmv.avro", dvEntrySchema, Seq(
      dvEntry("data/dv_bad.puffin", "PUFFIN", "data/f0.parquet",
        off, corrupt.length.toLong, 3)))
    val e = intercept[Exception] { IcebergRead.read(spark, dir).count() }
    def msgHas(t: Throwable, s: String): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains(s)) ||
        msgHas(t.getCause, s))
    assert(msgHas(e, "D1D33964"), s"got: ${e.getMessage}")
    // refusal: an unknown position-delete file format
    writeAvro(s"$dir/metadata/dmv.avro", dvEntrySchema, Seq(
      dvEntry("data/dv0.puffin", "ORC", "data/f0.parquet",
        off, blob.length.toLong, 3)))
    val e2 = intercept[IllegalArgumentException] {
      IcebergRead.read(spark, dir)
    }
    assert(e2.getMessage.contains("ORC"), e2.getMessage)
  }

  test("equality deletes without equality_ids refuse; unknown content ids refuse") {
    val dir = buildTable()
    posDeleteFile(dir, "data/del1.parquet", Seq(("data/f0.parquet", 0L)))
    writeAvro(s"$dir/metadata/dm1.avro", delEntrySchema,
      Seq(delEntry(2, "data/del1.parquet", 1))) // content=2, no eq ids
    writeAvro(s"$dir/metadata/ml-200.avro", manifestListSchema, Seq(
      manifestListRow("metadata/m1.avro", 0),
      manifestListRow("metadata/dm1.avro", 1)))
    val e = intercept[IllegalArgumentException] {
      IcebergRead.read(spark, dir)
    }
    assert(e.getMessage.contains("equality_ids"))
    // and an unknown manifest-list content id refuses too
    writeAvro(s"$dir/metadata/ml-200.avro", manifestListSchema, Seq(
      manifestListRow("metadata/m1.avro", 0),
      manifestListRow("metadata/dm1.avro", 7)))
    val e2 = intercept[IllegalArgumentException] {
      IcebergRead.read(spark, dir)
    }
    assert(e2.getMessage.contains("content"))
  }

  // ---- equality deletes: seq-aware fixture ------------------------------

  private val manifestListSeqSchema: Schema = SchemaBuilder
    .record("manifest_file_seq").fields()
    .requiredString("manifest_path")
    .requiredInt("content")
    .requiredLong("sequence_number")
    .endRecord()
  private def mlSeqRow(path: String, content: Int, seq: Long)
      : GenericRecord = {
    val r = new GenericData.Record(manifestListSeqSchema)
    r.put("manifest_path", path)
    r.put("content", Int.box(content))
    r.put("sequence_number", Long.box(seq))
    r
  }
  private val eqDelFileSchema: Schema = SchemaBuilder.record("del_file_eq")
    .fields()
    .requiredInt("content")
    .requiredString("file_path")
    .requiredLong("record_count")
    .name("equality_ids").`type`().nullable()
      .array().items().intType().noDefault()
    .endRecord()
  private val eqDelEntrySchema: Schema = SchemaBuilder.record("del_entry_eq")
    .fields()
    .requiredInt("status")
    .name("data_file").`type`(eqDelFileSchema).noDefault()
    .endRecord()
  private def eqDelEntry(content: Int, path: String,
                         eqIds: Seq[Int]): GenericRecord = {
    val df = new GenericData.Record(eqDelFileSchema)
    df.put("content", Int.box(content))
    df.put("file_path", path)
    df.put("record_count", Long.box(1L))
    if (eqIds.nonEmpty)
      df.put("equality_ids", eqIds.map(Int.box).asJava)
    val e = new GenericData.Record(eqDelEntrySchema)
    e.put("status", Int.box(1))
    e.put("data_file", df)
    e
  }

  test("v2 equality deletes: sequence-ordered application, reinserts survive") {
    import spark.implicits._
    val dir = tmp()
    // data: f0 at seq 1, f1 at seq 2; eq deletes at seq 3; f2 (which
    // RE-INSERTS k=10/u10) at seq 4 — the delete must not touch it
    dataFile(dir, "data/f0.parquet", range(0, 50))
    dataFile(dir, "data/f1.parquet", range(50, 100))
    dataFile(dir, "data/f2.parquet", range(10, 11))
    writeAvro(s"$dir/metadata/m0s.avro", entrySchema, Seq(
      entry(1, "data/f0.parquet", 50, 0, 49, "u0", "u9")))
    writeAvro(s"$dir/metadata/m1s.avro", entrySchema, Seq(
      entry(1, "data/f1.parquet", 50, 50, 99, "u50", "u99")))
    writeAvro(s"$dir/metadata/m2s.avro", entrySchema, Seq(
      entry(1, "data/f2.parquet", 1, 10, 10, "u10", "u10")))
    // eq delete on name (field id 2): u10, u60
    dataFile(dir, "data/deq.parquet",
      Seq("u10", "u60").toDF("name"))
    // multi-column eq delete on (k, name) = (70, 'u70')
    dataFile(dir, "data/deq2.parquet",
      Seq((70L, "u70")).toDF("k", "name"))
    writeAvro(s"$dir/metadata/dmEq.avro", eqDelEntrySchema, Seq(
      eqDelEntry(2, "data/deq.parquet", Seq(2)),
      eqDelEntry(2, "data/deq2.parquet", Seq(1, 2))))
    writeAvro(s"$dir/metadata/ml-300.avro", manifestListSeqSchema, Seq(
      mlSeqRow("metadata/m0s.avro", 0, 1),
      mlSeqRow("metadata/m1s.avro", 0, 2)))
    writeAvro(s"$dir/metadata/ml-400.avro", manifestListSeqSchema, Seq(
      mlSeqRow("metadata/m0s.avro", 0, 1),
      mlSeqRow("metadata/m1s.avro", 0, 2),
      mlSeqRow("metadata/dmEq.avro", 1, 3),
      mlSeqRow("metadata/m2s.avro", 0, 4)))
    val meta = s"""{
      "format-version": 2,
      "table-uuid": "00000000-0000-0000-0000-000000000001",
      "location": "$dir",
      "current-schema-id": 0,
      "schemas": [$schemaJson],
      "current-snapshot-id": 400,
      "snapshots": [
        {"snapshot-id": 300, "manifest-list": "metadata/ml-300.avro"},
        {"snapshot-id": 400, "manifest-list": "metadata/ml-400.avro"}]
    }"""
    Files.createDirectories(Paths.get(dir, "metadata"))
    Files.writeString(Paths.get(dir, "metadata", "v2.metadata.json"), meta)
    Files.writeString(Paths.get(dir, "metadata", "version-hint.text"), "2")

    val cur = IcebergRead.read(spark, dir)
    // 101 live rows - u10@f0 - u60@f1 - (70,u70)@f1; f2's u10 (seq 4 >
    // delete seq 3) SURVIVES
    assert(cur.count() == 98, s"got ${cur.count()}")
    val names = cur.select("name").collect().map(_.getString(0)).toSeq
    assert(names.count(_ == "u10") == 1,
      "the seq-4 reinsert of u10 must survive the seq-3 delete")
    assert(!names.contains("u60") && !names.contains("u70"))
    assert(names.contains("u11") && names.contains("u59"))
    // the pre-delete snapshot is untouched
    assert(IcebergRead.read(spark, dir, snapshotId = 300).count() == 100)
    // pruning composes: the pruned read re-applies the deletes
    assert(IcebergRead.readWhere(spark, dir, "k >= 50").count() == 48)
  }

  test("equality-delete files sharing a BASENAME: per-file seq tagging, no mis-scoping") {
    import spark.implicits._
    val dir = tmp()
    // data: f0+f1 at seq 1; f2 RE-INSERTS k=5/u5 at seq 3.
    // deletes: data/a/deq.parquet (u5, seq 2) and data/b/deq.parquet
    // (u60, seq 4) — SAME basename. A basename-keyed file→seq map would
    // hand u5 the seq-4 row too and kill the seq-3 reinsert.
    dataFile(dir, "data/f0.parquet", range(0, 50))
    dataFile(dir, "data/f1.parquet", range(50, 100))
    dataFile(dir, "data/f2.parquet", range(5, 6))
    writeAvro(s"$dir/metadata/mA.avro", entrySchema, Seq(
      entry(1, "data/f0.parquet", 50, 0, 49, "u0", "u9"),
      entry(1, "data/f1.parquet", 50, 50, 99, "u50", "u99")))
    writeAvro(s"$dir/metadata/mB.avro", entrySchema, Seq(
      entry(1, "data/f2.parquet", 1, 5, 5, "u5", "u5")))
    dataFile(dir, "data/a/deq.parquet", Seq("u5").toDF("name"))
    dataFile(dir, "data/b/deq.parquet", Seq("u60").toDF("name"))
    writeAvro(s"$dir/metadata/dmA.avro", eqDelEntrySchema, Seq(
      eqDelEntry(2, "data/a/deq.parquet", Seq(2))))
    writeAvro(s"$dir/metadata/dmB.avro", eqDelEntrySchema, Seq(
      eqDelEntry(2, "data/b/deq.parquet", Seq(2))))
    writeAvro(s"$dir/metadata/ml-500.avro", manifestListSeqSchema, Seq(
      mlSeqRow("metadata/mA.avro", 0, 1),
      mlSeqRow("metadata/dmA.avro", 1, 2),
      mlSeqRow("metadata/mB.avro", 0, 3),
      mlSeqRow("metadata/dmB.avro", 1, 4)))
    val meta = s"""{
      "format-version": 2,
      "table-uuid": "00000000-0000-0000-0000-000000000002",
      "location": "$dir",
      "current-schema-id": 0,
      "schemas": [$schemaJson],
      "current-snapshot-id": 500,
      "snapshots": [
        {"snapshot-id": 500, "manifest-list": "metadata/ml-500.avro"}]
    }"""
    Files.createDirectories(Paths.get(dir, "metadata"))
    Files.writeString(Paths.get(dir, "metadata", "v2.metadata.json"), meta)
    Files.writeString(Paths.get(dir, "metadata", "version-hint.text"), "2")

    val cur = IcebergRead.read(spark, dir)
    // 101 live - u5@f0 (seq-2 delete) - u60@f1 (seq-4 delete) = 99;
    // f2's u5 (data seq 3 >= delete seq 2) must survive
    assert(cur.count() == 99, s"got ${cur.count()}")
    val names = cur.select("name").collect().map(_.getString(0)).toSeq
    assert(names.count(_ == "u5") == 1,
      "the seq-3 reinsert of u5 must survive the seq-2 delete even " +
        "when two delete files share a basename")
    assert(!names.contains("u60"))
  }
}
