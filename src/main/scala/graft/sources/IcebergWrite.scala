package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Append-only Apache Iceberg table WRITER — the emit side of the
  * Iceberg interop leg (mirror of [[DeltaWrite]] for the Delta leg),
  * built purely from the PUBLIC table spec (iceberg.apache.org/spec,
  * format-version 2): a graft pipeline's output lands as an Iceberg
  * table that [[IcebergRead]] round-trips and any spec reader plans.
  *
  * Per append it writes, bottom-up exactly as the spec layers them:
  *   - data parquet files under `data/`;
  *   - one manifest avro listing the new files as ADDED entries, each
  *     `data_file` carrying record_count, file_size_in_bytes, and
  *     per-field null counts + lower/upper bounds in the spec's
  *     single-value binary serialization (little-endian long/double) —
  *     harvested METADATA-ONLY from the fresh parquet footers via
  *     [[FileStats]] (the zero-rescan discipline every graft writer
  *     follows); string bounds are deliberately NOT emitted (parquet
  *     footer string stats may be truncated — emitting them could
  *     over-prune; absent bounds just mean "keep");
  *   - one manifest-LIST avro naming every manifest of the snapshot
  *     (previous manifests carry forward — their ADDED entries stay
  *     live, the spec's own reuse rule);
  *   - `vN.metadata.json` with the schema (stable field ids assigned at
  *     create), the cumulative snapshot list, and the new
  *     current-snapshot-id.
  *
  * Commit atomicity is the SAME put-if-absent primitive the other graft
  * writers use ([[SnapshotTable.storeFor]]): `vN.metadata.json` is
  * created by at most one writer (HadoopTableOperations' rename
  * contract), so racing appends produce a retrying loser, never a
  * clobbered table; `version-hint.text` is refreshed best-effort after
  * the win (readers fall back to the listing when it goes stale).
  *
  * Non-goals (loudly enforced): unpartitioned tables only (partition
  * transforms change the manifest partition struct — out of scope), no
  * deletes, no schema evolution (appends must match exactly), flat
  * schemas of int/long/float/double/string/boolean/date/timestamp
  * columns (nested/decimal/binary refused by name).
  */
object IcebergWrite {
  private val om = new ObjectMapper()

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val MetaName = """v(\d+)\.metadata\.json""".r

  // ------------------------------------------------------------------
  // avro shapes (field names per the spec; our reader consumes a
  // subset and ignores the rest through schema-checked access)
  // ------------------------------------------------------------------

  private val kvBytes: Schema = SchemaBuilder.record("k_v_bytes").fields()
    .requiredInt("key").requiredBytes("value").endRecord()
  private val kvLong: Schema = SchemaBuilder.record("k_v_long").fields()
    .requiredInt("key").requiredLong("value").endRecord()
  private val dataFileSchema: Schema = SchemaBuilder.record("data_file")
    .fields()
    .requiredInt("content")
    .requiredString("file_path")
    .requiredString("file_format")
    .requiredLong("record_count")
    .requiredLong("file_size_in_bytes")
    .name("null_value_counts").`type`().nullable()
      .array().items(kvLong).noDefault()
    .name("lower_bounds").`type`().nullable()
      .array().items(kvBytes).noDefault()
    .name("upper_bounds").`type`().nullable()
      .array().items(kvBytes).noDefault()
    .endRecord()
  private val entrySchema: Schema = SchemaBuilder.record("manifest_entry")
    .fields()
    .requiredInt("status")
    .name("snapshot_id").`type`().nullable().longType().noDefault()
    .name("data_file").`type`(dataFileSchema).noDefault()
    .endRecord()
  private val manifestFileSchema: Schema = SchemaBuilder
    .record("manifest_file").fields()
    .requiredString("manifest_path")
    .requiredLong("manifest_length")
    .requiredInt("partition_spec_id")
    .requiredInt("content")
    .requiredLong("added_snapshot_id")
    .endRecord()

  private def writeAvro(f: org.apache.hadoop.fs.FileSystem, p: Path,
                        schema: Schema, rows: Seq[GenericRecord]): Long = {
    val out = f.create(p, true)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    try {
      w.create(schema, out) // DataFileWriter closes the stream
      rows.foreach(w.append)
    } finally w.close()
    f.getFileStatus(p).getLen
  }

  // ------------------------------------------------------------------
  // schema mapping
  // ------------------------------------------------------------------

  private def icebergType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType => "int"
    case LongType      => "long"
    case FloatType     => "float"
    case DoubleType    => "double"
    case StringType    => "string"
    case BooleanType   => "boolean"
    case DateType      => "date"
    case TimestampType => "timestamptz"
    case other => throw new IllegalArgumentException(
      s"column type ${other.sql} unsupported by this Iceberg writer " +
        "(flat int/long/float/double/string/boolean/date/timestamp " +
        "only) — refusing")
  }

  private def schemaJson(schema: StructType): String = {
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      val n = om.createObjectNode()
      n.put("id", i + 1)
      n.put("name", f.name)
      n.put("required", false)
      n.put("type", icebergType(f.dataType))
      n
    }
    val root = om.createObjectNode()
    root.put("type", "struct")
    root.put("schema-id", 0)
    val arr = root.putArray("fields")
    fields.foreach(arr.add)
    om.writeValueAsString(root)
  }

  // ------------------------------------------------------------------
  // metadata json
  // ------------------------------------------------------------------

  private final case class Snap(id: Long, manifestList: String)

  private def metadataJson(path: String, uuid: String, schema: StructType,
                           snaps: Seq[Snap], current: Long): String = {
    val snapArr = snaps.map { s =>
      val n = om.createObjectNode()
      n.put("snapshot-id", s.id)
      n.put("timestamp-ms", System.currentTimeMillis())
      n.put("manifest-list", s.manifestList)
      val sm = n.putObject("summary"); sm.put("operation", "append")
      n
    }
    val root = om.createObjectNode()
    root.put("format-version", 2)
    root.put("table-uuid", uuid)
    root.put("location", path)
    root.put("last-updated-ms", System.currentTimeMillis())
    root.put("last-column-id", schema.fields.length)
    root.put("current-schema-id", 0)
    val schemas = root.putArray("schemas")
    schemas.add(om.readTree(schemaJson(schema)))
    val specs = root.putArray("partition-specs")
    val spec0 = om.createObjectNode()
    spec0.put("spec-id", 0); spec0.putArray("fields")
    specs.add(spec0)
    root.put("default-spec-id", 0)
    val orders = root.putArray("sort-orders")
    val order0 = om.createObjectNode()
    order0.put("order-id", 0); order0.putArray("fields")
    orders.add(order0)
    root.put("default-sort-order-id", 0)
    root.putObject("properties")
    root.put("current-snapshot-id", current)
    val arr = root.putArray("snapshots")
    snapArr.foreach(arr.add)
    om.writeValueAsString(root)
  }

  // ------------------------------------------------------------------
  // public surface
  // ------------------------------------------------------------------

  /** Create the table: data files + manifest + manifest list +
    * v1.metadata.json. Fails if a metadata dir already exists. Returns
    * the snapshot id (1).
    */
  def create(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    require(!f.exists(new Path(path, "metadata")),
      s"$path already has Iceberg metadata/ — use append")
    df.schema.fields.foreach(fl => icebergType(fl.dataType)) // loud gate
    require(commit(df, path, metaVersion = 1, snapshotId = 1L,
        uuid = java.util.UUID.randomUUID().toString,
        schema = df.schema, priorManifests = Nil, priorSnaps = Nil),
      s"$path: v1.metadata.json was committed concurrently")
    1L
  }

  /** Append a new snapshot. Optimistic concurrency on the metadata
    * version: on a lost race the whole plan replays against the new
    * head (prior manifests carry forward). Schema must match exactly.
    */
  def append(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the commit race 10 times")
      val metaP = currentMeta(spark, path)
      val meta = {
        val in = fs(spark, path).open(metaP)
        try om.readTree(new String(in.readAllBytes(), "UTF-8"))
        finally in.close()
      }
      val MetaName(curV) = metaP.getName
      val uuid = meta.path("table-uuid").asText()
      // table schema from the metadata (name -> iceberg type)
      val tblFields = meta.path("schemas").elements().asScala.toSeq
        .find(_.path("schema-id").asInt(-1) ==
          meta.path("current-schema-id").asInt(0))
        .getOrElse(throw new IllegalStateException("no current schema"))
        .path("fields").elements().asScala
        .map(n => n.path("name").asText() -> n.path("type").asText()).toSeq
      val got = df.schema.fields.toSeq
        .map(fl => fl.name -> icebergType(fl.dataType))
      require(got == tblFields,
        s"append schema $got != table schema $tblFields " +
          "(this writer does not evolve schemas)")
      val snaps = meta.path("snapshots").elements().asScala.map(s =>
        Snap(s.path("snapshot-id").asLong(),
          s.path("manifest-list").asText())).toSeq
      val snapId = snaps.map(_.id).foldLeft(0L)(math.max) + 1
      // prior manifests carry forward: union of the CURRENT snapshot's
      // manifest list (append-only lineage makes it the superset)
      val currentList = snaps
        .find(_.id == meta.path("current-snapshot-id").asLong(-1L))
        .map(_.manifestList)
      val prior = currentList.toSeq.flatMap { ml =>
        val rel = if (ml.startsWith("/") || ml.contains("://")) ml
                  else s"$path/$ml"
        readManifestList(spark, rel)
      }
      if (commit(df, path, curV.toInt + 1, snapId, uuid, df.schema,
          prior, snaps))
        return snapId
      attempts += 1
    }
    -1L // unreachable
  }

  private def currentMeta(spark: SparkSession, path: String): Path = {
    val mdir = new Path(path, "metadata")
    val f = fs(spark, path)
    require(f.exists(mdir), s"$path has no metadata/ — not an Iceberg table")
    val vs = f.listStatus(mdir).map(_.getPath.getName)
      .collect { case MetaName(v) => v.toInt }
    require(vs.nonEmpty, s"$path: no vN.metadata.json")
    new Path(mdir, s"v${vs.max}.metadata.json")
  }

  /** (manifest_path, manifest_length, partition_spec_id, content,
    * added_snapshot_id) rows of an existing manifest list.
    */
  private def readManifestList(spark: SparkSession, p: String)
      : Seq[GenericRecord] = {
    val f = fs(spark, p)
    val in = f.open(new Path(p))
    val bytes = try in.readAllBytes() finally in.close()
    val r = new org.apache.avro.file.DataFileReader[GenericRecord](
      new org.apache.avro.file.SeekableByteArrayInput(bytes),
      new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    try r.iterator().asScala.toVector finally r.close()
  }

  /** Write one snapshot bottom-up and race the metadata json. Returns
    * true on a won commit.
    */
  private def commit(df: DataFrame, path: String, metaVersion: Int,
                     snapshotId: Long, uuid: String, schema: StructType,
                     priorManifests: Seq[GenericRecord],
                     priorSnaps: Seq[Snap]): Boolean = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    // 1. data files (stage + move, Delta-writer discipline)
    val stage = new Path(path, s".stage-${java.util.UUID.randomUUID()}")
    val rels = try {
      df.write.parquet(stage.toString)
      val parts = f.listStatus(stage).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.toString)
      f.mkdirs(new Path(path, "data"))
      parts.toSeq.map { p =>
        val rel = s"data/part-${java.util.UUID.randomUUID()}.parquet"
        require(f.rename(p, new Path(path, rel)), s"rename failed for $p")
        rel
      }
    } finally f.delete(stage, true)
    val stats = FileStats.collect(spark, path, rels)
    val fieldId = schema.fieldNames.zipWithIndex
      .map { case (n, i) => n -> (i + 1) }.toMap

    // 2. manifest avro for the new files
    def leLong(v: Long): java.nio.ByteBuffer = {
      val b = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putLong(v); b.flip(); b
    }
    def leDouble(v: Double): java.nio.ByteBuffer = {
      val b = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putDouble(v); b.flip(); b
    }
    def leInt(v: Int): java.nio.ByteBuffer = {
      val b = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(v); b.flip(); b
    }
    val entries = rels.map { rel =>
      val st = stats.getOrElse(rel, Map.empty)
      val rows = st.values.headOption.map(_.rows).getOrElse(-1L)
      val dfRec = new GenericData.Record(dataFileSchema)
      dfRec.put("content", Int.box(0))
      dfRec.put("file_path", rel)
      dfRec.put("file_format", "PARQUET")
      dfRec.put("record_count",
        Long.box(if (rows >= 0) rows else df.count()))
      dfRec.put("file_size_in_bytes",
        Long.box(f.getFileStatus(new Path(path, rel)).getLen))
      def kvRec(schema0: Schema, k: Int, v: AnyRef): GenericRecord = {
        val r = new GenericData.Record(schema0)
        r.put("key", Int.box(k)); r.put("value", v); r
      }
      val nulls = schema.fields.toSeq.flatMap { fl =>
        st.get(fl.name).filter(_.nulls >= 0).map(c =>
          kvRec(kvLong, fieldId(fl.name), Long.box(c.nulls)))
      }
      // bounds: exact numeric domains only (footer string stats may be
      // truncated — absent bounds are sound, wrong bounds are not)
      val (los, his) = schema.fields.toSeq.flatMap { fl =>
        val id = fieldId(fl.name)
        st.get(fl.name).flatMap { c =>
          (fl.dataType, c.kind, c.lo, c.hi) match {
            case (ByteType | ShortType | IntegerType, "l",
                  Some(lo), Some(hi)) =>
              Some((kvRec(kvBytes, id, leInt(lo.toInt)),
                kvRec(kvBytes, id, leInt(hi.toInt))))
            case (LongType, "l", Some(lo), Some(hi)) =>
              Some((kvRec(kvBytes, id, leLong(lo.toLong)),
                kvRec(kvBytes, id, leLong(hi.toLong))))
            case (DoubleType, "d", Some(lo), Some(hi)) =>
              Some((kvRec(kvBytes, id, leDouble(lo.toDouble)),
                kvRec(kvBytes, id, leDouble(hi.toDouble))))
            case _ => None
          }
        }
      }.unzip
      if (nulls.nonEmpty) dfRec.put("null_value_counts", nulls.asJava)
      if (los.nonEmpty) {
        dfRec.put("lower_bounds", los.asJava)
        dfRec.put("upper_bounds", his.asJava)
      }
      val e = new GenericData.Record(entrySchema)
      e.put("status", Int.box(1)) // ADDED
      e.put("snapshot_id", Long.box(snapshotId))
      e.put("data_file", dfRec)
      e
    }
    val manifestRel =
      s"metadata/m-${java.util.UUID.randomUUID()}.avro"
    val mLen = writeAvro(f, new Path(path, manifestRel), entrySchema,
      entries)

    // 3. manifest list: prior manifests carried forward + the new one
    val newRow = new GenericData.Record(manifestFileSchema)
    newRow.put("manifest_path", manifestRel)
    newRow.put("manifest_length", Long.box(mLen))
    newRow.put("partition_spec_id", Int.box(0))
    newRow.put("content", Int.box(0))
    newRow.put("added_snapshot_id", Long.box(snapshotId))
    val carried = priorManifests.map { r =>
      val c = new GenericData.Record(manifestFileSchema)
      c.put("manifest_path", r.get("manifest_path").toString)
      c.put("manifest_length",
        Long.box(r.get("manifest_length").toString.toLong))
      c.put("partition_spec_id", Int.box(0))
      c.put("content", Int.box(
        Option(r.get("content")).map(_.toString.toInt).getOrElse(0)))
      c.put("added_snapshot_id", Long.box(
        Option(r.get("added_snapshot_id")).map(_.toString.toLong)
          .getOrElse(0L)))
      c
    }
    // UUID-unique: a racing loser that shared a deterministic name
    // would CLOBBER the winner's list before losing the metadata race —
    // only the put-if-absent metadata json may carry a contended name
    val listRel =
      s"metadata/snap-$snapshotId-${java.util.UUID.randomUUID()}.avro"
    writeAvro(f, new Path(path, listRel), manifestFileSchema,
      carried :+ newRow)

    // 4. race the metadata json (put-if-absent; loser replans)
    val metaText = metadataJson(path, uuid, schema,
      priorSnaps :+ Snap(snapshotId, listRel), snapshotId)
    val mdir = new Path(path, "metadata")
    f.mkdirs(mdir)
    val tmp = new Path(mdir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(metaText.getBytes("UTF-8")) finally out.close()
    val target = new Path(mdir, s"v$metaVersion.metadata.json")
    val won = SnapshotTable.storeFor(f.getScheme)
      .publishIfAbsent(f, tmp, target)
    f.delete(tmp, false)
    if (won) {
      // best-effort hint; readers fall back to the listing when stale
      val hint = f.create(new Path(mdir, "version-hint.text"), true)
      try hint.write(metaVersion.toString.getBytes("UTF-8"))
      finally hint.close()
    }
    won
  }
}
