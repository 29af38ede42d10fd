package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Read-only Apache Iceberg table reader — the second open-table-format
  * interop leg next to [[DeltaRead]], built purely from the PUBLIC
  * Iceberg table spec (iceberg.apache.org/spec): table metadata JSON →
  * snapshot → manifest-list avro → manifest avro → live data files,
  * with per-column lower/upper bounds and null counts surfaced into the
  * SAME [[FileStats.mayMatch]] zone-map machinery SnapshotTable and
  * DeltaRead use.
  *
  * Scope and non-goals (loudly enforced):
  *   - format-version 1 and 2 DATA reads, plus BOTH v2 delete kinds:
  *     POSITION deletes (content=1 → `(file_path, pos)` delete parquet
  *     files, applied as a distributed anti-join on the data scan's
  *     `_metadata` file identity + row index — sound WITHOUT sequence-
  *     number bookkeeping because Iceberg data-file paths are immutable
  *     and never reused: a rewritten file gets a fresh path no old
  *     delete references) and EQUALITY deletes (content=2, round 9 —
  *     Flink and streaming-upsert writers emit these by default): each
  *     delete file removes rows matching its `equality_ids` fields
  *     (null-safe) from data files whose DATA SEQUENCE NUMBER is
  *     strictly below the delete's, applied as distributed anti-joins
  *     with the per-file sequence attached from the manifests;
  *   - identity reads only — Iceberg data files carry ALL columns
  *     including partition columns, so reading needs no hive-layout
  *     recovery; partition transforms only affect pruning, which this
  *     reader takes from the per-file column bounds instead;
  *   - time travel by `snapshotId`;
  *   - no writes.
  *
  * Metadata traversal is driver-side (manifest-list and manifests are
  * KB-to-MB avro files — the same budget Iceberg's own planner spends);
  * the data files are a pruned distributed parquet scan. Bounds decode
  * per the spec's single-value binary serialization (little-endian
  * int/long/float/double, UTF-8 strings); any type this reader can't
  * decode soundly answers "keep the file".
  */
object IcebergRead {
  private val om = new ObjectMapper()

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val MetaName = """v(\d+)\.metadata\.json""".r

  /** Resolve the current metadata file: version-hint.text if present,
    * else the highest vN.metadata.json in `metadata/`.
    */
  private def currentMetadata(spark: SparkSession, path: String): Path = {
    val mdir = new Path(path, "metadata")
    val f = fs(spark, path)
    require(f.exists(mdir), s"$path has no metadata/ — not an Iceberg table")
    val hint = new Path(mdir, "version-hint.text")
    val hinted: Option[Path] =
      if (!f.exists(hint)) None
      else {
        val in = f.open(hint)
        val v = try new String(in.readAllBytes(), "UTF-8").trim
                finally in.close()
        // the hint is best-effort (HadoopCatalog semantics): a pointer
        // to a missing file falls back to the listing instead of failing
        Some(new Path(mdir, s"v$v.metadata.json")).filter(f.exists)
      }
    hinted.getOrElse {
      val vs = f.listStatus(mdir).map(_.getPath.getName)
        .collect { case MetaName(v) => v.toInt }
      require(vs.nonEmpty, s"$path: no vN.metadata.json in metadata/")
      new Path(mdir, s"v${vs.max}.metadata.json")
    }
  }

  private def readJson(spark: SparkSession, p: Path): JsonNode = {
    val f = fs(spark, p.toString)
    val in = f.open(p)
    try om.readTree(new String(in.readAllBytes(), "UTF-8"))
    finally in.close()
  }

  /** Iceberg paths are absolute URIs in manifests; fixture tables may
    * carry table-relative paths — accept both.
    */
  private def resolve(tablePath: String, p: String): String =
    if (p.startsWith("/") || p.contains("://")) p else s"$tablePath/$p"

  private def avroRows(spark: SparkSession, p: String): Seq[GenericRecord] = {
    // manifests are KB-to-MB metadata: read fully, decode via avro-core
    // (hadoop-client shades its own avro, so its AvroFSInput doesn't
    // satisfy avro-core's SeekableInput)
    val f = fs(spark, p)
    val in = f.open(new Path(p))
    val bytes = try in.readAllBytes() finally in.close()
    val reader = new DataFileReader[GenericRecord](
      new org.apache.avro.file.SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toVector finally reader.close()
  }

  /** Schema-checked optional field access: GenericRecord.get THROWS on
    * fields absent from the writer schema (older-spec manifests omit
    * v2 fields like `content`), so every optional read goes through
    * this.
    */
  private def opt(r: GenericRecord, name: String): Option[AnyRef] =
    if (r.getSchema.getField(name) == null) None else Option(r.get(name))

  private final case class Field(id: Int, name: String, tpe: String)

  /** One stored partition value of a data file: the SOURCE column
    * (name + iceberg type, resolved through the spec's source-id), the
    * spec transform string, and the file's tuple value (None when the
    * manifest carried none, or the value's shape was unexpected —
    * absent values prune nothing). Transform-aware pruning: identity
    * values compare exactly; day/truncate are ORDER-PRESERVING, so a
    * range predicate transforms its literal and compares loosened
    * (v < lit  ⇒  T(v) ≤ T(lit)); bucket prunes EQUALITY probes only
    * (the stored value is `bucket(lit)`'s only possible home).
    */
  private final case class PartVal(source: String, srcType: String,
                                   transform: String,
                                   value: Option[AnyRef])

  private final case class FileEntry(path: String, rows: Long,
    nulls: Map[Int, Long], lower: Map[Int, Array[Byte]],
    upper: Map[Int, Array[Byte]],
    // data sequence number (v2): orders the file against equality
    // deletes — explicit on the entry, else inherited from the
    // manifest-list row, else 0 (v1 tables, which carry no deletes)
    dataSeq: Long,
    parts: Seq[PartVal])
  /** One equality-delete file: rows carry values for the columns named
    * by `eqIds` (field ids); it deletes matching rows from data files
    * with dataSeq STRICTLY below `seq`.
    */
  private final case class EqDelete(path: String, seq: Long,
                                    eqIds: Seq[Int])
  /** One v3 deletion vector: a puffin-stored position-delete blob
    * scoped to ONE data file (spec "Deletion vectors"): the blob at
    * [offset, offset+length) of `puffinPath` masks row positions of
    * `referencedFile`.
    */
  private final case class DvRef(puffinPath: String,
                                 referencedFile: String,
                                 offset: Long, length: Long)
  private final case class Snapshot(fields: Seq[Field],
    files: Seq[FileEntry], deleteFiles: Seq[String],
    eqDeletes: Seq[EqDelete], dvRefs: Seq[DvRef])

  /** Schema fields for a read: the SNAPSHOT's schema-id when time
    * traveling (a snapshot taken before an evolution must read with its
    * own narrower schema), else the table's current schema; v1
    * metadata falls back to the top-level `schema`.
    */
  private def schemaFields(meta: JsonNode, snap: Option[JsonNode])
      : Seq[Field] = {
    val schema: JsonNode =
      if (meta.has("schemas")) {
        val want = snap.flatMap(s => Option(s.get("schema-id"))
            .filterNot(_.isNull).map(_.asInt()))
          .getOrElse(meta.path("current-schema-id").asInt(0))
        meta.path("schemas").elements().asScala
          .find(_.path("schema-id").asInt(-1) == want)
          .getOrElse(meta.path("schemas").elements().asScala.toSeq.head)
      } else meta.path("schema")
    schema.path("fields").elements().asScala.map { fl =>
      val t =
        if (fl.path("type").isObject)
          om.writeValueAsString(fl.path("type")) // nested: JSON node
        else fl.path("type").asText()
      Field(fl.path("id").asInt(), fl.path("name").asText(), t)
    }.toSeq
  }

  /** Decode one puffin `deletion-vector-v1` blob (Iceberg v3 spec):
    * 4-byte BE combined length of magic+vector, the magic D1 D3 39 64,
    * the vector in portable 64-bit roaring serialization, and a 4-byte
    * BE CRC-32 of magic+vector. Unknown magics and CRC mismatches
    * refuse loudly — a silently-misread mask would serve deleted rows.
    */
  private[graft] def decodePuffinDv(bytes: Array[Byte],
                                    name: String): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    require(bb.remaining() >= 12,
      s"$name: puffin DV blob truncated (${bytes.length} bytes)")
    val combined = bb.getInt
    require(combined >= 4 && combined <= bb.remaining() - 4,
      s"$name: puffin DV length $combined out of range — refusing")
    val magic = new Array[Byte](4); bb.get(magic)
    require(java.util.Arrays.equals(magic,
        Array(0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)),
      s"$name: puffin DV magic ${magic.map("%02X".format(_))
        .mkString} != D1D33964 — unknown blob layout, refusing")
    val vec = new Array[Byte](combined - 4); bb.get(vec)
    val crcStored = bb.getInt
    val crc = new java.util.zip.CRC32()
    crc.update(magic); crc.update(vec)
    require(crc.getValue.toInt == crcStored,
      s"$name: puffin DV CRC mismatch — refusing a corrupt mask")
    DeltaRead.roaringPositions64(java.nio.ByteBuffer.wrap(vec)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN))
  }

  private def load(spark: SparkSession, path: String,
                   snapshotId: Long): Snapshot = {
    val meta = readJson(spark, currentMetadata(spark, path))
    val snapId =
      if (snapshotId >= 0) snapshotId
      else meta.path("current-snapshot-id").asLong(-1L)
    require(snapId >= 0, s"$path: table has no current snapshot")
    val snap = meta.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong(-1L) == snapId)
      .getOrElse(throw new IllegalArgumentException(
        s"$path: snapshot $snapId not found"))
    val fields = schemaFields(meta, Some(snap))
    // partition specs by id: (field name, transform, source-id) — the
    // reader prunes on stored tuples only for transforms it models;
    // unknown transforms/specs contribute no PartVal (no pruning)
    val specsById: Map[Int, Seq[(String, String, Int)]] =
      meta.path("partition-specs").elements().asScala.map { sp =>
        sp.path("spec-id").asInt(0) ->
          sp.path("fields").elements().asScala.map { fn =>
            (fn.path("name").asText(), fn.path("transform").asText(),
              fn.path("source-id").asInt())
          }.toSeq
      }.toMap
    val fieldById = fields.map(f => f.id -> f).toMap
    val manifestList = resolve(path, snap.path("manifest-list").asText())
    val (dataManifests, deleteManifests) =
      avroRows(spark, manifestList).map { r =>
        val content = opt(r, "content").map(_.toString.toInt).getOrElse(0)
        require(content == 0 || content == 1,
          s"$path: manifest-list content $content unknown to this " +
            "reader — refusing rather than misreading")
        val seq = opt(r, "sequence_number").map(_.toString.toLong)
          .getOrElse(0L)
        val specId = opt(r, "partition_spec_id")
          .map(_.toString.toInt).getOrElse(0)
        (r.get("manifest_path").toString, content, seq, specId)
      }.partition(_._2 == 0)
    // delete manifests: POSITION delete files (content=1) anti-join on
    // (file, pos); EQUALITY delete files (content=2) apply as
    // sequence-ordered null-safe anti-joins on their equality fields
    var deleteFiles = Seq.empty[String]
    var eqDeletes = Seq.empty[EqDelete]
    var dvRefs = Seq.empty[DvRef]
    deleteManifests.foreach { case (mp, _, mseq, _) =>
      avroRows(spark, resolve(path, mp)).foreach { e =>
        val status = opt(e, "status").map(_.toString.toInt).getOrElse(1)
        if (status != 2) {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val seq = opt(e, "sequence_number").map(_.toString.toLong)
            .getOrElse(mseq)
          val c = opt(df, "content").map(_.toString.toInt).getOrElse(-1)
          c match {
            case 1 =>
              // v3 deletion vectors: position deletes stored as puffin
              // blobs, file_format=PUFFIN with the spec's required
              // referenced-data-file + content offset/size fields;
              // classic parquet position-delete files otherwise
              val fmt = opt(df, "file_format").map(_.toString)
                .getOrElse("PARQUET").toUpperCase
              fmt match {
                case "PARQUET" =>
                  deleteFiles :+= df.get("file_path").toString
                case "PUFFIN" =>
                  val ref = opt(df, "referenced_data_file")
                    .map(_.toString)
                  val off = opt(df, "content_offset")
                    .map(_.toString.toLong)
                  val len = opt(df, "content_size_in_bytes")
                    .map(_.toString.toLong)
                  require(ref.nonEmpty && off.nonEmpty && len.nonEmpty,
                    s"$path: puffin deletion vector in $mp misses " +
                      "referenced_data_file/content_offset/" +
                      "content_size_in_bytes (spec-required for DVs) " +
                      "— refusing")
                  dvRefs :+= DvRef(df.get("file_path").toString,
                    ref.get, off.get, len.get)
                case other => throw new IllegalArgumentException(
                  s"$path: position-delete file format $other in $mp " +
                    "— PARQUET and PUFFIN (deletion vectors) only, " +
                    "refusing rather than misreading")
              }
            case 2 =>
              val ids = opt(df, "equality_ids") match {
                case Some(l: java.util.List[_]) =>
                  l.asScala.map(_.toString.toInt).toSeq
                case _ => throw new IllegalArgumentException(
                  s"$path: equality-delete file in $mp carries no " +
                    "equality_ids — cannot evaluate, refusing")
              }
              eqDeletes :+= EqDelete(df.get("file_path").toString, seq, ids)
            case other => throw new IllegalArgumentException(
              s"$path: delete manifest entry with content=$other — this " +
                "reader applies position (1) and equality (2) deletes " +
                "only, refusing rather than misreading")
          }
        }
      }
    }
    val files = dataManifests.flatMap { case (mp, _, mseq, mspec) =>
      val specFields = specsById.getOrElse(mspec, Seq.empty)
      avroRows(spark, resolve(path, mp)).flatMap { e =>
        val status = opt(e, "status").map(_.toString.toInt).getOrElse(1)
        if (status == 2) None // DELETED entry
        else {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          opt(df, "content").map(_.toString.toInt).foreach { c =>
            require(c == 0, s"$path: delete data_file content in a " +
              "data manifest — refused")
          }
          val dataSeq = opt(e, "sequence_number")
            .map(_.toString.toLong).getOrElse(mseq)
          def idMap[T](field: String)(f: AnyRef => T): Map[Int, T] =
            opt(df, field) match {
              case Some(m: java.util.Map[_, _]) =>
                m.asScala.map { case (k, v) =>
                  k.toString.toInt -> f(v.asInstanceOf[AnyRef])
                }.toMap
              case Some(l: java.util.List[_]) => // key_value record form
                l.asScala.map { kv =>
                  val r = kv.asInstanceOf[GenericRecord]
                  r.get("key").toString.toInt -> f(r.get("value"))
                }.toMap
              case _ => Map.empty[Int, T]
            }
          def bytesOf(v: AnyRef): Array[Byte] = v match {
            case b: java.nio.ByteBuffer =>
              val d = new Array[Byte](b.remaining()); b.duplicate().get(d); d
            case a: Array[Byte] => a
            case other => other.toString.getBytes("UTF-8")
          }
          // stored partition tuple → PartVals for modeled transforms
          val parts: Seq[PartVal] = opt(df, "partition").toSeq.flatMap {
            case pr: GenericRecord =>
              specFields.flatMap { case (pname, transform, srcId) =>
                fieldById.get(srcId).map { src =>
                  val v = if (pr.getSchema.getField(pname) == null) None
                          else Option(pr.get(pname)).map {
                            case u: org.apache.avro.util.Utf8 => u.toString
                            case other => other
                          }
                  PartVal(src.name, src.tpe, transform, v)
                }
              }
            case _ => Seq.empty
          }
          Some(FileEntry(
            df.get("file_path").toString,
            df.get("record_count").toString.toLong,
            idMap("null_value_counts")(_.toString.toLong),
            idMap("lower_bounds")(bytesOf),
            idMap("upper_bounds")(bytesOf),
            dataSeq,
            parts))
        }
      }
    }
    // v3: AT MOST ONE deletion vector per data file per snapshot — a
    // stacked pair is a writer bug (the spec's replacement rule) and
    // silently unioning it would mask the violation
    val dvDup = dvRefs.groupBy(_.referencedFile).filter(_._2.size > 1)
    require(dvDup.isEmpty,
      s"$path: data file(s) ${dvDup.keys.take(2).mkString(", ")} carry " +
        "MULTIPLE deletion vectors in one snapshot — v3 allows at most " +
        "one (a DV REPLACES its predecessor), refusing")
    Snapshot(fields, files, deleteFiles, eqDeletes, dvRefs)
  }

  /** Single-value binary deserialization (spec Appendix D) into the
    * FileStats compare domain; None = undecodable => no pruning.
    */
  private def decode(tpe: String, b: Array[Byte]): Option[(String, String)] = {
    val buf = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tpe match {
      case "int" if b.length == 4  => Some(("l", buf.getInt.toString))
      case "long" if b.length == 8 => Some(("l", buf.getLong.toString))
      case "float" if b.length == 4 =>
        val v = buf.getFloat; if (v.isNaN) None
        else Some(("d", v.toDouble.toString))
      case "double" if b.length == 8 =>
        val v = buf.getDouble; if (v.isNaN) None
        else Some(("d", v.toString))
      case "string" => Some(("s", new String(b, "UTF-8")))
      case DecimalPat(_, sc) =>
        // unscaled two's-complement big-endian → SCALED plain string in
        // the "d" domain (FileStats compares "d" via BigDecimal: exact)
        Some(("d", new java.math.BigDecimal(
          new java.math.BigInteger(b), sc.toInt).toPlainString))
      case _ => None // date/time/timestamp/uuid/fixed: keep file
    }
  }

  private val DecimalPat = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  private def colStats(fields: Seq[Field], fe: FileEntry)
      : Map[String, FileStats.ColStat] =
    fields.flatMap { f =>
      val lo = fe.lower.get(f.id).flatMap(decode(f.tpe, _))
      val hi = fe.upper.get(f.id).flatMap(decode(f.tpe, _))
      val nulls = fe.nulls.getOrElse(f.id, -1L)
      (lo, hi) match {
        case (Some((k1, l)), Some((k2, h))) if k1 == k2 =>
          Some(f.name -> FileStats.ColStat(k1, Some(l), Some(h), nulls,
            fe.rows))
        case (None, None) if nulls >= 0 && nulls == fe.rows =>
          // all-null column for this file: kind from the type family
          val k = f.tpe match {
            case "int" | "long"     => Some("l")
            case "float" | "double" => Some("d")
            case "string"           => Some("s")
            case _                  => None
          }
          k.map(kk => f.name ->
            FileStats.ColStat(kk, None, None, nulls, fe.rows))
        case _ => None
      }
    }.toMap

  /** The table as a DataFrame at `snapshotId` (-1 = current snapshot).
    * Column order follows the Iceberg schema.
    */
  def read(spark: SparkSession, path: String, snapshotId: Long = -1L)
      : DataFrame = {
    val st = load(spark, path, snapshotId)
    assemble(spark, path, st, st.files)
  }

  /** LIVE rows of exactly the named data files (current snapshot,
    * deletes applied) — what [[IcebergWrite.rewriteDataFiles]]
    * materializes before replacing them: the rewrite must never
    * resurrect deleted rows.
    */
  private[sources] def liveRows(spark: SparkSession, path: String,
                                paths: Set[String]): DataFrame = {
    val st = load(spark, path, -1L)
    assemble(spark, path, st, st.files.filter(f => paths.contains(f.path)))
  }

  /** (manifest-verbatim path, on-disk size) of the current snapshot's
    * live data files — the rewrite's candidate-selection input.
    */
  private[sources] def liveFileSizes(spark: SparkSession, path: String)
      : Seq[(String, Long)] = {
    val st = load(spark, path, -1L)
    val f = fs(spark, path)
    st.files.map { fe =>
      fe.path -> f.getFileStatus(new Path(resolve(path, fe.path))).getLen
    }
  }

  /** Spark type of an Iceberg primitive, None = unmappable (reads fall
    * back to parquet inference for such schemas).
    */
  private def sparkTypeOf(tpe: String): Option[DataType] = tpe match {
    case "int" => Some(IntegerType);  case "long" => Some(LongType)
    case "float" => Some(FloatType);  case "double" => Some(DoubleType)
    case "string" => Some(StringType); case "boolean" => Some(BooleanType)
    case "binary" => Some(BinaryType)
    case "date" => Some(DateType);     case "timestamptz" => Some(TimestampType)
    case DecimalPat(p, s) => Some(DecimalType(p.toInt, s.toInt))
    case t if t.startsWith("{") => nestedSparkType(om.readTree(t))
    case _ => None
  }

  /** Spark type of a NESTED Iceberg type node (struct/list/map), None
    * when any inner leaf is unmappable — the caller falls back to
    * parquet inference for such schemas.
    */
  private def nestedSparkType(root: JsonNode): Option[DataType] = {
    def of(t: JsonNode): Option[DataType] =
      if (t.isTextual) sparkTypeOf(t.asText())
      else t.path("type").asText() match {
        case "struct" =>
          val fs = t.path("fields").elements().asScala.toSeq.map { f =>
            of(f.path("type"))
              .map(dt => StructField(f.path("name").asText(), dt))
          }
          if (fs.exists(_.isEmpty)) None
          else Some(StructType(fs.map(_.get)))
        case "list" =>
          of(t.path("element"))
            .map(ArrayType(_, containsNull = true))
        case "map" =>
          for { k <- of(t.path("key")); v <- of(t.path("value")) }
            yield MapType(k, v, valueContainsNull = true)
        case _ => None
      }
    of(root)
  }

  private def assemble(spark: SparkSession, path: String, st: Snapshot,
                       files: Seq[FileEntry]): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, expr, lit, udf}
    val names = st.fields.map(_.name)
    // metadata-declared Spark schema: files written BEFORE an additive
    // evolution lack the new columns and must surface NULL (inference
    // would instead pick one file's schema and misalign the union);
    // any unmappable field type falls back to inference
    val declared: Option[StructType] = {
      val mapped = st.fields.map(f => sparkTypeOf(f.tpe))
      if (mapped.exists(_.isEmpty)) None
      else Some(StructType(st.fields.zip(mapped).map { case (f, dt) =>
        StructField(f.name, dt.get)
      }))
    }
    if (files.isEmpty) {
      val struct = declared.getOrElse(StructType(st.fields.map(f =>
        StructField(f.name, sparkTypeOf(f.tpe).getOrElse(StringType)))))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], struct)
    }
    val reader0 = spark.read
    val reader = declared.fold(reader0)(reader0.schema)
    val plain = reader
      .parquet(files.map(f => resolve(path, f.path)): _*)
    if (st.deleteFiles.isEmpty && st.eqDeletes.isEmpty &&
        st.dvRefs.isEmpty)
      return plain.select(names.map(col): _*)

    // v2 deletes need per-row FILE IDENTITY: the percent-decoded
    // basename on BOTH sides (_metadata.file_path is URI-encoded by
    // Spark; Iceberg data file names are UUID-unique table-wide); if an
    // external table ever collides basenames, each file scans tagged
    // with its manifest-verbatim path and deletes join on their
    // verbatim file_path — exact string equality in the manifest
    // domain, no representation guessing.
    val FKey = "__graft_del_file"
    val RIdx = "__graft_del_pos"
    val decodeBase =
      udf((p: String) => PathCodec.percentDecode(p.split("/").last))
    def base(p: String): String = PathCodec.percentDecode(p.split("/").last)
    val collide = files.map(f => base(f.path)).distinct.size != files.size
    val scanned =
      if (!collide) plain.select(names.map(col) ++ Seq(
        decodeBase(col("_metadata.file_path")).as(FKey),
        expr("_metadata.row_index").as(RIdx)): _*)
      else files.map { fe =>
        declared.fold(spark.read)(spark.read.schema)
          .parquet(resolve(path, fe.path))
          .select(names.map(col) ++ Seq(lit(fe.path).as(FKey),
            expr("_metadata.row_index").as(RIdx)): _*)
      }.reduce(_ unionByName _)

    // position deletes: the delete parquet files carry (file_path, pos)
    // — a DISTRIBUTED scan (they can hold hundreds of millions of rows;
    // nothing materializes on the driver) anti-joined on (file
    // identity, _metadata.row_index). Sound WITHOUT sequence ordering:
    // paths are immutable and never reused, so a delete can only name
    // rows that existed when it was written. v3 puffin deletion vectors
    // contribute the same (file, pos) rows: blobs decode ON EXECUTORS
    // (an RDD over the blob descriptors — per-task memory is one
    // compressed bitmap, the Delta DV budget) and union in.
    val dvDels: Option[DataFrame] =
      if (st.dvRefs.isEmpty) None
      else {
        val refs = st.dvRefs.map(r =>
          (resolve(path, r.puffinPath), r.referencedFile,
            r.offset, r.length))
        val posSchema = StructType(Seq(
          StructField("file_path", StringType),
          StructField("pos", LongType)))
        val rdd = spark.sparkContext
          .parallelize(refs, math.max(1, math.min(refs.size, 32)))
          .flatMap { case (pp, rf, off, len) =>
            val p = new org.apache.hadoop.fs.Path(pp)
            val f = p.getFileSystem(
              new org.apache.hadoop.conf.Configuration())
            val in = f.open(p)
            val bytes = try {
              in.seek(off)
              val b = new Array[Byte](len.toInt)
              in.readFully(b); b
            } finally in.close()
            decodePuffinDv(bytes, pp)
              .map(pos => org.apache.spark.sql.Row(rf, pos))
          }
        Some(spark.createDataFrame(rdd, posSchema))
      }
    val afterPos =
      if (st.deleteFiles.isEmpty && dvDels.isEmpty) scanned
      else {
        val parquetDels =
          if (st.deleteFiles.isEmpty) None
          else Some(spark.read
            .parquet(st.deleteFiles.map(resolve(path, _)): _*)
            .select(col("file_path"), col("pos").cast("long").as("pos")))
        val delScan = (parquetDels.toSeq ++ dvDels.toSeq)
          .reduce(_ unionByName _)
        val dels =
          if (!collide) delScan
            .select(decodeBase(col("file_path")).as(FKey),
              col("pos").as(RIdx))
          else delScan.select(col("file_path").as(FKey),
            col("pos").as(RIdx))
        scanned.join(dels, Seq(FKey, RIdx), "left_anti")
      }

    // equality deletes (content=2): a delete file at sequence s removes
    // rows MATCHING its equality fields (null-safe, per the spec) from
    // data files with dataSeq STRICTLY below s. The per-file dataSeq
    // attaches via a broadcast (file → seq) map — file-count-sized, the
    // same budget the manifests already spent; the delete files scan
    // distributed with their seq as a literal column.
    val afterEq =
      if (st.eqDeletes.isEmpty) afterPos
      else {
        val idToName = st.fields.map(f => f.id -> f.name).toMap
        val SeqCol = "__graft_data_seq"
        val DSeqCol = "__graft_del_seq"
        import spark.implicits._
        val seqDf = broadcast(files
          .map(f => (if (collide) f.path else base(f.path)) -> f.dataSeq)
          .toDF(FKey, SeqCol))
        val withSeq = afterPos.join(seqDf, Seq(FKey), "left")
        st.eqDeletes.groupBy(_.eqIds.sorted).values.foldLeft(withSeq) {
          (acc, group) =>
            val eqCols = group.head.eqIds.sorted.map(id =>
              idToName.getOrElse(id, throw new IllegalArgumentException(
                s"$path: equality_ids field $id not in the read schema " +
                  "— cannot evaluate the delete, refusing")))
            // ONE scan for the whole id-group (a streaming-upsert table
            // can hold thousands of delete files — a per-file union
            // would bloat the plan linearly); each delete row recovers
            // its file's sequence via a broadcast (file → seq) map.
            // That map keys by BASENAME — two delete files sharing one
            // would join the wrong sequence and mis-scope deletes, so a
            // basename collision inside the group falls back to
            // per-file scans tagged with their literal seq (bounded by
            // the colliding group's size, the rare case).
            val delCollide =
              group.map(d => base(d.path)).distinct.size != group.size
            val dels =
              if (delCollide) group.map { d =>
                spark.read.parquet(resolve(path, d.path))
                  .select(eqCols.map(c => col(c).as(s"__gd_$c")) :+
                    lit(d.seq).as(DSeqCol): _*)
              }.reduce(_ unionByName _)
              else {
                val seqByFile = broadcast(group
                  .map(d => base(d.path) -> d.seq)
                  .toDF("__gd_file", DSeqCol))
                spark.read
                  .parquet(group.map(d => resolve(path, d.path)): _*)
                  .select(eqCols.map(c => col(c).as(s"__gd_$c")) :+
                    decodeBase(col("_metadata.file_path"))
                      .as("__gd_file"): _*)
                  .join(seqByFile, Seq("__gd_file"))
                  .drop("__gd_file")
              }
            val cond = eqCols.map(c => col(c) <=> col(s"__gd_$c"))
              .reduce(_ && _) && (col(SeqCol) < col(DSeqCol))
            acc.join(dels, cond, "left_anti")
        }
      }
    afterEq.select(names.map(col): _*)
  }

  // ------------------------------------------------------------------
  // partition-transform pruning
  // ------------------------------------------------------------------

  private def attrNameOf(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    e match {
      case a: UnresolvedAttribute if a.nameParts.size == 1 =>
        Some(a.nameParts.head)
      case a: AttributeReference => Some(a.name)
      case _                     => None
    }
  }

  private val BucketT = """bucket\[(\d+)\]""".r
  private val TruncT  = """truncate\[(\d+)\]""".r

  /** May a file whose stored tuple value is `pv` hold rows matching
    * `<source> op literal`? Sound by construction: every unmodeled
    * shape answers true.
    *
    *   - identity: the stored value IS the column value for every row
    *     — exact numeric compares (BigDecimal), string equality only
    *     (string RANGE compares would mix UTF-16 and UTF-8 collation);
    *   - day / numeric truncate: order-preserving, so
    *     `v < lit ⇒ T(v) ≤ T(lit)` — ranges compare loosened on the
    *     transformed literal; string truncate prunes equality only
    *     (prefix equality), same collation caution;
    *   - bucket: equality probes only — `bucket(lit)` is the single
    *     bucket rows equal to `lit` can live in, per the spec's
    *     murmur3 hash this repo pins to the published test vectors.
    */
  private def partLeafOk(pv: PartVal, litDt: DataType, litVal: Any,
                         op: String): Boolean = {
    if (litVal == null || pv.value.isEmpty) return true
    val v = pv.value.get
    def asLongV: Option[Long] = v match {
      case i: java.lang.Integer => Some(i.longValue())
      case l: java.lang.Long    => Some(l.longValue())
      case _                    => None
    }
    // the literal in the SOURCE column's value domain, type-checked —
    // a string literal probed against a long column must not prune
    def litLong: Option[Long] = (litDt, pv.srcType) match {
      case (ByteType | ShortType | IntegerType | LongType,
            "int" | "long") => Some(litVal.toString.toLong)
      case (DateType, "date") => Some(litVal.toString.toLong)
      case _ => None
    }
    def litStr: Option[String] = (litDt, pv.srcType) match {
      case (StringType, "string") => Some(litVal.toString)
      case _                      => None
    }
    // loosened ordered compare of the file's single transformed value
    // against the transformed literal
    def ordered(fv: Long, tl: Long): Boolean = op match {
      case "eq"        => fv == tl
      case "lt" | "le" => fv <= tl
      case "gt" | "ge" => fv >= tl
      case _           => true
    }
    pv.transform match {
      case "identity" =>
        (asLongV, litLong) match {
          case (Some(fv), Some(tl)) =>
            op match {
              case "eq" => fv == tl
              case "lt" => fv < tl
              case "le" => fv <= tl
              case "gt" => fv > tl
              case "ge" => fv >= tl
              case _    => true
            }
          case _ => (v, litStr) match {
            case (fv: String, Some(tl)) if op == "eq" => fv == tl
            case _                                    => true
          }
        }
      case "day" =>
        val tl: Option[Long] = (litDt, pv.srcType) match {
          case (TimestampType, "timestamptz" | "timestamp") =>
            Some(IcebergTransforms
              .dayOfMicros(litVal.asInstanceOf[Long]).toLong)
          case (DateType, _) => Some(litVal.toString.toLong)
          case _             => None
        }
        (asLongV, tl) match {
          case (Some(fv), Some(t)) => ordered(fv, t)
          case _                   => true
        }
      case t @ ("year" | "month" | "hour") =>
        // order-preserving like day: ranges compare loosened on the
        // transformed literal
        val tl: Option[Long] = (litDt, pv.srcType) match {
          case (TimestampType, "timestamptz" | "timestamp") =>
            val us = litVal.asInstanceOf[Long]
            Some((t match {
              case "hour"  => IcebergTransforms.hourOfMicros(us)
              case "month" => IcebergTransforms.monthOfMicros(us)
              case _       => IcebergTransforms.yearOfMicros(us)
            }).toLong)
          case (DateType, "date") if t != "hour" =>
            val days = litVal.toString.toInt
            Some((if (t == "month") IcebergTransforms.monthOfDays(days)
                  else IcebergTransforms.yearOfDays(days)).toLong)
          case _ => None
        }
        (asLongV, tl) match {
          case (Some(fv), Some(tv)) => ordered(fv, tv)
          case _                    => true
        }
      case BucketT(n) =>
        if (op != "eq") true
        else {
          val b: Option[Int] = litLong
            .map(l => IcebergTransforms.bucketOfLong(l, n.toInt))
            .orElse(litStr
              .map(sv => IcebergTransforms.bucketOfString(sv, n.toInt)))
          (asLongV, b) match {
            case (Some(fv), Some(tb)) => fv == tb.toLong
            case _                    => true
          }
        }
      case TruncT(w) =>
        (asLongV, litLong) match {
          case (Some(fv), Some(tl)) =>
            ordered(fv, IcebergTransforms.truncateLong(tl, w.toLong))
          case _ => (v, litStr) match {
            case (fv: String, Some(tl)) if op == "eq" =>
              fv == IcebergTransforms.truncateString(tl, w.toInt)
            case _ => true
          }
        }
      case _ => true
    }
  }

  /** Transform-aware partition pruning over one file's stored tuple —
    * layered AND-wise with [[FileStats.mayMatch]]'s column bounds.
    * Mirrors its predicate shapes; several transforms over one source
    * must ALL allow the file.
    */
  private def partMayMatch(
      pred: org.apache.spark.sql.catalyst.expressions.Expression,
      parts: Seq[PartVal]): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    if (parts.isEmpty) return true
    def leaf(a: Expression, l: Literal, op: String): Boolean =
      attrNameOf(a) match {
        case Some(n) => parts.filter(_.source == n)
          .forall(pv => partLeafOk(pv, l.dataType, l.value, op))
        case None => true
      }
    pred match {
      case And(l, r) => partMayMatch(l, parts) && partMayMatch(r, parts)
      case Or(l, r)  => partMayMatch(l, parts) || partMayMatch(r, parts)
      case EqualTo(a, l: Literal) => leaf(a, l, "eq")
      case EqualTo(l: Literal, a) => leaf(a, l, "eq")
      case EqualNullSafe(a, l: Literal) if l.value != null =>
        leaf(a, l, "eq")
      case EqualNullSafe(l: Literal, a) if l.value != null =>
        leaf(a, l, "eq")
      case LessThan(a, l: Literal)           => leaf(a, l, "lt")
      case LessThan(l: Literal, a)           => leaf(a, l, "gt")
      case LessThanOrEqual(a, l: Literal)    => leaf(a, l, "le")
      case LessThanOrEqual(l: Literal, a)    => leaf(a, l, "ge")
      case GreaterThan(a, l: Literal)        => leaf(a, l, "gt")
      case GreaterThan(l: Literal, a)        => leaf(a, l, "lt")
      case GreaterThanOrEqual(a, l: Literal) => leaf(a, l, "ge")
      case GreaterThanOrEqual(l: Literal, a) => leaf(a, l, "le")
      case In(a, list) if list.forall(_.isInstanceOf[Literal]) =>
        list.exists(l => leaf(a, l.asInstanceOf[Literal], "eq"))
      case _ => true
    }
  }

  /** Pruned read: bounds-based file skipping PLUS transform-aware
    * partition-tuple skipping (identity/day/bucket/truncate),
    * predicate re-applied so the result equals
    * `read(...).filter(predicate)` exactly.
    */
  def readWhere(spark: SparkSession, path: String, predicate: String,
                snapshotId: Long = -1L): DataFrame = {
    val st = load(spark, path, snapshotId)
    val pred = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(predicate)
    val kept = st.files.filter(f =>
      FileStats.mayMatch(pred, colStats(st.fields, f)) &&
        partMayMatch(pred, f.parts))
    assemble(spark, path, st, kept)
      .filter(org.apache.spark.sql.functions.expr(predicate))
  }

  /** (total live files, files a predicate would open). */
  def pruneReport(spark: SparkSession, path: String, predicate: String,
                  snapshotId: Long = -1L): (Int, Int) = {
    val st = load(spark, path, snapshotId)
    val pred = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(predicate)
    (st.files.size,
      st.files.count(f =>
        FileStats.mayMatch(pred, colStats(st.fields, f)) &&
          partMayMatch(pred, f.parts)))
  }

  /** Incremental change feed between two snapshots — the Iceberg-leg
    * mirror of [[DeltaRead.changes]], derived from the file algebra of
    * each CONSECUTIVE snapshot pair in `(fromSnapshotId, toSnapshotId]`
    * so every row is attributed to the snapshot that changed it
    * (`_snapshot_id`):
    *
    *   - data files only in the newer snapshot serve their live rows
    *     as `'insert'` (the newer snapshot's deletes applied);
    *   - data files only in the older snapshot serve their live rows
    *     as `'delete'` (the older snapshot's deletes applied — a row
    *     already dead at `from` never re-surfaces);
    *   - NEW delete files (position or equality) landing on KEPT data
    *     files surface exactly the rows they kill as `'delete'`:
    *     live-at-from EXCEPT ALL live-at-to over the TOUCHED kept files
    *     only — position deletes touch the data files their rows name,
    *     an equality delete touches every kept file below its sequence
    *     (it is global below seq by construction).
    *
    * Scans ONLY changed/touched files — never a whole-table diff.
    * File granularity like the Delta non-CDF derive: a compaction
    * (`replace`) surfaces its rewritten rows as delete+insert pairs.
    * Replay-exact as multisets: (read(from) + inserts) - deletes ==
    * read(to) — union before except, so a row inserted and then
    * deleted inside the range cancels correctly.
    * REFUSED by name: a schema change inside the range,
    * an expired endpoint, and delete files VANISHING between snapshots
    * (a delete-compaction would silently resurrect rows).
    */
  def changes(spark: SparkSession, path: String, fromSnapshotId: Long,
              toSnapshotId: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val meta = readJson(spark, currentMetadata(spark, path))
    // the snapshots array is commit-append-ordered (expiration keeps
    // relative order) — walk it between the endpoints
    val ids = meta.path("snapshots").elements().asScala.toSeq
      .map(_.path("snapshot-id").asLong(-1L))
    val iFrom = ids.indexOf(fromSnapshotId)
    val iTo = ids.indexOf(toSnapshotId)
    require(iFrom >= 0, s"$path: snapshot $fromSnapshotId not found " +
      "(expired?) — an incremental feed cannot start there, refusing")
    require(iTo >= 0, s"$path: snapshot $toSnapshotId not found")
    require(iTo >= iFrom,
      s"$path: snapshot $toSnapshotId precedes $fromSnapshotId")
    val walk = ids.slice(iFrom, iTo + 1)
    val parts = walk.zip(walk.drop(1)).map { case (a, b) =>
      pairChanges(spark, path, a, b)
    }
    if (parts.isEmpty) {
      val st = load(spark, path, toSnapshotId)
      assemble(spark, path, st, Nil)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_snapshot_id", lit(toSnapshotId)).limit(0)
    } else parts.reduce(_ unionByName _)
  }

  private def pairChanges(spark: SparkSession, path: String,
                          a: Long, b: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val from = load(spark, path, a)
    val to = load(spark, path, b)
    require(from.fields == to.fields,
      s"$path: schema changed at snapshot $b — a change feed across " +
        "an evolution boundary would mix row shapes, refusing (read " +
        "the ranges on each side separately)")
    val fromDelP = from.deleteFiles.toSet
    val fromEqP = from.eqDeletes.map(_.path).toSet
    require(fromDelP.subsetOf(to.deleteFiles.toSet) &&
        fromEqP.subsetOf(to.eqDeletes.map(_.path).toSet),
      s"$path: delete files vanished between snapshots $a and $b (a " +
        "delete compaction/rewrite) — the file algebra would silently " +
        "resurrect rows, refusing")
    require(from.dvRefs.isEmpty && to.dvRefs.isEmpty,
      s"$path: snapshot-range changes over puffin deletion vectors is " +
        "not modeled (a DV REPLACES its predecessor, breaking the " +
        "additive delete-file algebra) — refusing; read each snapshot")
    val fromPaths = from.files.map(_.path).toSet
    val toPaths = to.files.map(_.path).toSet
    val added = to.files.filterNot(f => fromPaths.contains(f.path))
    val removed = from.files.filterNot(f => toPaths.contains(f.path))
    val ins = assemble(spark, path, to, added)
      .withColumn("_change_type", lit("insert"))
    val del = assemble(spark, path, from, removed)
      .withColumn("_change_type", lit("delete"))
    // new delete files killing rows of KEPT data files
    val newPos = to.deleteFiles.filterNot(fromDelP)
    val newEq = to.eqDeletes.filterNot(d => fromEqP.contains(d.path))
    val keptDel =
      if (newPos.isEmpty && newEq.isEmpty) None
      else {
        def base(p: String): String =
          PathCodec.percentDecode(p.split("/").last)
        // position deletes name their targets (file-count-sized
        // collect); an equality delete is global below its sequence
        val posTouched: Set[String] =
          if (newPos.isEmpty) Set.empty
          else spark.read.parquet(newPos.map(resolve(path, _)): _*)
            .select("file_path").distinct().collect()
            .map(r => base(r.getString(0))).toSet
        val eqMaxSeq =
          if (newEq.isEmpty) Long.MinValue else newEq.map(_.seq).max
        val touched = toPaths.intersect(fromPaths).filter { p =>
          val entry = to.files.find(_.path == p).get
          entry.dataSeq < eqMaxSeq || posTouched.contains(base(p))
        }
        if (touched.isEmpty) None
        else Some(
          assemble(spark, path, from,
              from.files.filter(f => touched.contains(f.path)))
            .exceptAll(assemble(spark, path, to,
              to.files.filter(f => touched.contains(f.path))))
            .withColumn("_change_type", lit("delete")))
      }
    (Seq(ins, del) ++ keptDel).reduce(_ unionByName _)
      .withColumn("_snapshot_id", lit(b))
  }
}
