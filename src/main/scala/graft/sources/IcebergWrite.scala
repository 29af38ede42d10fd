package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Apache Iceberg table WRITER — the emit side of the Iceberg interop
  * leg (mirror of [[DeltaWrite]] for the Delta leg), built purely from
  * the PUBLIC table spec (iceberg.apache.org/spec, format-version 2): a
  * graft pipeline's output lands as an Iceberg table that
  * [[IcebergRead]] round-trips and any spec reader plans.
  *
  * Spec-complete v2 metadata (not a readable-by-us-only subset):
  *   - table metadata carries `last-sequence-number`,
  *     `last-partition-id`, the full `schemas` history (additive
  *     evolution appends a new schema-id; prior snapshots keep
  *     theirs), and snapshots persist their original `timestamp-ms` /
  *     `sequence-number` VERBATIM across commits (each commit only
  *     appends its own snapshot node — it never restamps history);
  *   - manifest-list rows carry the v2-required `sequence_number` /
  *     `min_sequence_number` and the added/existing/deleted file and
  *     row counts;
  *   - manifest entries carry explicit `sequence_number` (= the
  *     committing snapshot's) and every `data_file` carries the
  *     REQUIRED `partition` struct (empty record when unpartitioned)
  *     plus per-field null counts and lower/upper bounds in the spec's
  *     single-value binary serialization, harvested METADATA-ONLY from
  *     the fresh parquet footers via [[FileStats]]; `record_count` is
  *     the footer's row count per file, never a whole-batch figure;
  *   - every avro field carries its spec `field-id` prop and the
  *     manifest files carry the spec's file metadata (`schema`,
  *     `partition-spec`, `format-version`, `content`) — what
  *     field-id-resolving readers (Iceberg's own) key on.
  *
  * Partitioned writes (identity transforms): `create(df, path, cols)`
  * splits data files so each holds exactly ONE partition tuple (via a
  * duplicated shadow column through Spark's partitionBy stage — the
  * real column STAYS in the data file, as Iceberg data files carry all
  * columns), records the tuple in the manifest's `partition` struct,
  * and declares the spec fields with ids 1000+. NULL partition values
  * are refused loudly.
  *
  * Additive schema evolution: `append(df, path, mergeSchema=true)`
  * appends NEW columns with fresh field ids and a fresh schema-id;
  * existing columns must match by (name, type); batches may omit
  * later-added columns (old files simply lack the column and the
  * reader surfaces NULL). Type changes refuse loudly.
  *
  * Commit atomicity is the SAME put-if-absent primitive the other graft
  * writers use ([[SnapshotTable.storeFor]]): `vN.metadata.json` is
  * created by at most one writer (HadoopTableOperations' rename
  * contract), so racing appends produce a retrying loser, never a
  * clobbered table; auxiliary files are UUID-unique so a loser can
  * never clobber the winner's manifests; `version-hint.text` is
  * refreshed best-effort after the win.
  *
  * Type coverage: int/long/float/double/decimal/string/boolean/binary/
  * date/timestamp leaves (decimals landed in round 10 with
  * spec-Appendix-D bounds — unscaled two's-complement big-endian) and
  * NESTED struct/array/map containers (round 10): nested types emit
  * the spec's JSON type nodes with table-wide-unique ids for every
  * inner field (depth-first pre-order; `last-column-id` covers them),
  * evolution compares LOGICAL types (ids stripped — a batch can't know
  * the table's nested ids), and nested columns simply carry no bounds
  * (absent bounds are sound). Equality-delete keys must stay top-level
  * primitives. Non-goals (loudly enforced): identity partition
  * transforms only (bucket/truncate/temporal transforms change value
  * derivation — out of scope), nested partition columns refused.
  */
object IcebergWrite {
  private val om = new ObjectMapper()

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val MetaName = """v(\d+)\.metadata\.json""".r

  // ------------------------------------------------------------------
  // avro shapes — field names AND field-id props per the spec's
  // manifest / manifest-list schemas (field-id is what Iceberg's own
  // avro readers resolve by)
  // ------------------------------------------------------------------

  private def fld(name: String, s: Schema, id: Int): Schema.Field = {
    val f = new Schema.Field(name, s, null, null.asInstanceOf[AnyRef])
    f.addProp("field-id", Int.box(id)); f
  }
  private def optFld(name: String, s: Schema, id: Int): Schema.Field = {
    val u = Schema.createUnion(Schema.create(Schema.Type.NULL), s)
    val f = new Schema.Field(name, u, null, Schema.Field.NULL_DEFAULT_VALUE)
    f.addProp("field-id", Int.box(id)); f
  }
  private def rec(name: String, fields: Seq[Schema.Field]): Schema =
    Schema.createRecord(name, null, null, false, fields.asJava)
  private def s(t: Schema.Type): Schema = Schema.create(t)
  import Schema.Type._

  /** Array-backed avro map (the spec's k_v record form) with key/value
    * field ids; the array carries logicalType=map per the Iceberg avro
    * convention.
    */
  private def kvArray(recName: String, kId: Int, vId: Int,
                      vType: Schema.Type): Schema = {
    val r = rec(recName, Seq(fld("key", s(INT), kId),
      fld("value", s(vType), vId)))
    val arr = Schema.createArray(r)
    arr.addProp("logicalType", "map")
    arr
  }

  /** data_file partition struct: one optional field per identity
    * partition column, carrying the spec field id (1000+).
    */
  private def partitionRecord(spec: Seq[PartField]): Schema =
    rec("r102", spec.map(p => optFld(p.name, s(p.avroType), p.fieldId)))

  private def dataFileSchema(part: Schema): Schema = rec("data_file", Seq(
    fld("content", s(INT), 134),
    fld("file_path", s(STRING), 100),
    fld("file_format", s(STRING), 101),
    fld("partition", part, 102),
    fld("record_count", s(LONG), 103),
    fld("file_size_in_bytes", s(LONG), 104),
    optFld("null_value_counts", kvArray("k121_v122", 121, 122, LONG), 110),
    optFld("lower_bounds", kvArray("k126_v127", 126, 127, BYTES), 125),
    optFld("upper_bounds", kvArray("k129_v130", 129, 130, BYTES), 128)))

  private def entrySchema(part: Schema): Schema = rec("manifest_entry", Seq(
    fld("status", s(INT), 0),
    optFld("snapshot_id", s(LONG), 1),
    optFld("sequence_number", s(LONG), 3),
    optFld("file_sequence_number", s(LONG), 4),
    fld("data_file", dataFileSchema(part), 2)))

  private val manifestFileSchema: Schema = rec("manifest_file", Seq(
    fld("manifest_path", s(STRING), 500),
    fld("manifest_length", s(LONG), 501),
    fld("partition_spec_id", s(INT), 502),
    fld("content", s(INT), 517),
    fld("sequence_number", s(LONG), 515),
    fld("min_sequence_number", s(LONG), 516),
    fld("added_snapshot_id", s(LONG), 503),
    fld("added_data_files_count", s(INT), 504),
    fld("existing_data_files_count", s(INT), 505),
    fld("deleted_data_files_count", s(INT), 506),
    fld("added_rows_count", s(LONG), 512),
    fld("existing_rows_count", s(LONG), 513),
    fld("deleted_rows_count", s(LONG), 514)))

  private def writeAvro(f: org.apache.hadoop.fs.FileSystem, p: Path,
                        schema: Schema, rows: Seq[GenericRecord],
                        meta: Map[String, String]): Long = {
    val out = f.create(p, true)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    try {
      meta.toSeq.sortBy(_._1).foreach { case (k, v) => w.setMeta(k, v) }
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
    case BinaryType    => "binary"
    case DateType      => "date"
    case TimestampType => "timestamptz"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"leaf type ${other.sql} unsupported by this Iceberg writer " +
        "(int/long/float/double/decimal/string/boolean/binary/date/" +
        "timestamp leaves, struct/array/map containers) — refusing")
  }

  /** Type as it lands in the schema JSON: the primitive name, or for
    * NESTED (struct/array/map) types the canonical JSON type node with
    * EXPLICIT fresh ids for every nested field drawn from `alloc` —
    * the spec requires table-wide-unique field ids at every nesting
    * level, and `last-column-id` must cover them all. Nested forms
    * start with '{'; unsupported leaves refuse via [[icebergType]].
    */
  private def typeString(dt: DataType, alloc: () => Int): String =
    dt match {
      case s: StructType =>
        val node = om.createObjectNode()
        node.put("type", "struct")
        val arr = node.putArray("fields")
        s.fields.foreach { fl =>
          val n = om.createObjectNode()
          n.put("id", alloc()); n.put("name", fl.name)
          n.put("required", false)
          putType(n, "type", typeString(fl.dataType, alloc))
          arr.add(n)
        }
        om.writeValueAsString(node)
      case a: ArrayType =>
        val node = om.createObjectNode()
        node.put("type", "list")
        node.put("element-id", alloc())
        putType(node, "element", typeString(a.elementType, alloc))
        node.put("element-required", false)
        om.writeValueAsString(node)
      case m: MapType =>
        val node = om.createObjectNode()
        node.put("type", "map")
        node.put("key-id", alloc())
        putType(node, "key", typeString(m.keyType, alloc))
        node.put("value-id", alloc())
        putType(node, "value", typeString(m.valueType, alloc))
        node.put("value-required", false)
        om.writeValueAsString(node)
      case other => icebergType(other)
    }

  private def putType(n: com.fasterxml.jackson.databind.node.ObjectNode,
                      field: String, t: String): Unit =
    if (t.startsWith("{")) { n.set[JsonNode](field, om.readTree(t)); () }
    else { n.put(field, t); () }

  /** id-free canonical form of a stored type string — evolution
    * compares LOGICAL types (a batch can't know the table's nested
    * field ids, and must not need to).
    */
  private def logicalType(t: String): String =
    if (!t.startsWith("{")) t
    else {
      def strip(n: JsonNode): Unit = n match {
        case o: com.fasterxml.jackson.databind.node.ObjectNode =>
          o.remove(java.util.List.of(
            "id", "element-id", "key-id", "value-id"))
          o.properties().asScala.foreach(e => strip(e.getValue))
        case a: com.fasterxml.jackson.databind.node.ArrayNode =>
          a.elements().asScala.foreach(strip)
        case _ => ()
      }
      val node = om.readTree(t)
      strip(node)
      om.writeValueAsString(node)
    }

  private def logicalOf(dt: DataType): String =
    logicalType(typeString(dt, () => 0))

  /** Schema JSON with EXPLICIT field ids (stable across evolution —
    * never re-derived from position).
    */
  private def schemaJson(fields: Seq[(String, String, Int)],
                         schemaId: Int): JsonNode = {
    val root = om.createObjectNode()
    root.put("type", "struct")
    root.put("schema-id", schemaId)
    val arr = root.putArray("fields")
    fields.foreach { case (name, tpe, id) =>
      val n = om.createObjectNode()
      n.put("id", id); n.put("name", name)
      n.put("required", false); putType(n, "type", tpe)
      arr.add(n)
    }
    root
  }

  // ------------------------------------------------------------------
  // table state (parsed from the current metadata json — everything
  // carried forward VERBATIM as JsonNodes so history never restamps)
  // ------------------------------------------------------------------

  /** One partition field: spec field name, its spec field id (1000+),
    * the SOURCE column (id + name), the transform ("identity", "day",
    * "bucket[N]", "truncate[W]" — the spec's canonical strings), the
    * Spark type of the transform's OUTPUT value (what the staged
    * shadow column holds and the manifest partition struct records)
    * and the avro type it serializes as.
    */
  private final case class PartField(name: String, fieldId: Int,
                                     sourceId: Int, source: String,
                                     transform: String,
                                     sparkType: DataType,
                                     avroType: Schema.Type)

  private val BucketT = """bucket\[(\d+)\]""".r
  private val TruncT  = """truncate\[(\d+)\]""".r

  /** (output Spark type, output avro type) of a transform over an
    * Iceberg source type — the loud gate for unsupported pairs.
    */
  private def resolveTransform(transform: String, srcType: String)
      : (DataType, Schema.Type) = transform match {
    case "identity" => (sparkTypeOf(srcType), avroTypeOf(srcType))
    case "day" | "month" | "year" => srcType match {
      case "date" | "timestamp" | "timestamptz" => (IntegerType, INT)
      case other => throw new IllegalArgumentException(
        s"$transform transform over source type $other unsupported " +
          "(date/timestamp only) — refusing")
    }
    case "hour" => srcType match {
      case "timestamp" | "timestamptz" => (IntegerType, INT)
      case other => throw new IllegalArgumentException(
        s"hour transform over source type $other unsupported " +
          "(timestamp only, per the spec) — refusing")
    }
    case BucketT(_) => srcType match {
      case "int" | "long" | "string" | "date" => (IntegerType, INT)
      case other => throw new IllegalArgumentException(
        s"bucket transform over source type $other unsupported " +
          "(int/long/string/date only) — refusing")
    }
    case TruncT(_) => srcType match {
      case "int"    => (IntegerType, INT)
      case "long"   => (LongType, LONG)
      case "string" => (StringType, STRING)
      case other => throw new IllegalArgumentException(
        s"truncate transform over source type $other unsupported " +
          "(int/long/string only) — refusing")
    }
    case other => throw new IllegalArgumentException(
      s"partition transform $other unknown to this writer " +
        "(identity/year/month/day/hour/bucket[N]/truncate[W]) — refusing")
  }

  /** The Spark column computing a transform's output value — the spec
    * semantics IcebergTransforms pins to the published test vectors
    * (day = floor division of UTC micros; bucket = murmur3 of the
    * widened long / UTF-8 bytes; truncate = floored mod / leading
    * characters).
    */
  private def transformCol(pf: PartField, dt: DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr, udf}
    val c = pf.source
    pf.transform match {
      case "identity" => col(c)
      case "day" => dt match {
        case DateType =>
          expr(s"CAST(datediff(`$c`, DATE'1970-01-01') AS INT)")
        case TimestampType | TimestampNTZType =>
          // floor division in exact integer arithmetic: pmod is
          // non-negative, so (us - pmod(us, d)) div d floors toward
          // -infinity (a double division would lose ulps past 2^53)
          expr(s"CAST((unix_micros(`$c`) - pmod(unix_micros(`$c`), " +
            "86400000000)) div 86400000000 AS INT)")
        case other => throw new IllegalArgumentException(
          s"day transform over Spark type $other — refusing")
      }
      case "hour" => dt match {
        // UTC floor division — deliberately NOT hour(`c`), which would
        // bind the session timezone; the spec transforms timestamptz
        // in UTC
        case TimestampType | TimestampNTZType =>
          expr(s"CAST((unix_micros(`$c`) - pmod(unix_micros(`$c`), " +
            "3600000000)) div 3600000000 AS INT)")
        case other => throw new IllegalArgumentException(
          s"hour transform over Spark type $other — refusing")
      }
      case t @ ("month" | "year") =>
        // epoch days (UTC, same arithmetic as `day`) → calendar fold
        // via the shared spec functions; primitive UDF input, so NULLs
        // null-propagate to the NULL-partition refusal
        val fold = udf((days: Int) =>
          if (t == "month") IcebergTransforms.monthOfDays(days)
          else IcebergTransforms.yearOfDays(days))
        dt match {
          case DateType =>
            fold(expr(s"CAST(datediff(`$c`, DATE'1970-01-01') AS INT)"))
          case TimestampType | TimestampNTZType =>
            fold(expr(s"CAST((unix_micros(`$c`) - " +
              "pmod(unix_micros(`$c`), 86400000000)) div " +
              "86400000000 AS INT)"))
          case other => throw new IllegalArgumentException(
            s"$t transform over Spark type $other — refusing")
        }
      case BucketT(n) =>
        val nn = n.toInt
        dt match {
          case IntegerType | LongType =>
            // primitive UDF inputs null-propagate, so NULL partition
            // values flow to writeData's loud refusal unchanged
            val u = udf((v: Long) => IcebergTransforms.bucketOfLong(v, nn))
            u(col(c).cast(LongType))
          case DateType =>
            // ANSI Spark disallows DATE→BIGINT casts; the spec hashes
            // the DAYS-from-epoch int widened to long, so compute the
            // day count explicitly before the hash
            val u = udf((v: Long) => IcebergTransforms.bucketOfLong(v, nn))
            u(expr(s"CAST(datediff(`$c`, DATE'1970-01-01') AS BIGINT)"))
          case StringType =>
            // reference-typed inputs do NOT null-propagate: guard so a
            // NULL partition value reaches writeData's refusal instead
            // of dying as an NPE task failure mid-stage
            val u = udf((v: String) =>
              if (v == null) null
              else java.lang.Integer
                .valueOf(IcebergTransforms.bucketOfString(v, nn)))
            u(col(c))
          case other => throw new IllegalArgumentException(
            s"bucket transform over Spark type $other — refusing")
        }
      case TruncT(w) => dt match {
        case IntegerType =>
          expr(s"CAST(`$c` - pmod(`$c`, $w) AS INT)")
        case LongType =>
          expr(s"CAST(`$c` - pmod(`$c`, CAST($w AS BIGINT)) AS BIGINT)")
        case StringType =>
          val ww = w.toInt
          val u = udf((v: String) =>
            if (v == null) null
            else IcebergTransforms.truncateString(v, ww))
          u(col(c))
        case other => throw new IllegalArgumentException(
          s"truncate transform over Spark type $other — refusing")
      }
      case other => throw new IllegalArgumentException(
        s"partition transform $other unknown to this writer — refusing")
    }
  }

  private final case class TableState(
    uuid: String, location: String,
    lastColumnId: Int, lastPartitionId: Int, lastSeq: Long,
    currentSchemaId: Int, schemas: Seq[JsonNode],
    defaultSpecId: Int, specs: Seq[JsonNode],
    snapshots: Seq[JsonNode], currentSnapId: Long,
    properties: JsonNode)

  private def parseState(meta: JsonNode, path: String): TableState = {
    val schemas = meta.path("schemas").elements().asScala.toSeq
    require(schemas.nonEmpty, s"$path: metadata carries no schemas[] — " +
      "this writer appends to v2-style metadata only")
    TableState(
      uuid = meta.path("table-uuid").asText(),
      location = meta.path("location").asText(path),
      lastColumnId = meta.path("last-column-id").asInt(0),
      lastPartitionId = meta.path("last-partition-id").asInt(999),
      lastSeq = meta.path("last-sequence-number").asLong(0L),
      currentSchemaId = meta.path("current-schema-id").asInt(0),
      schemas = schemas,
      defaultSpecId = meta.path("default-spec-id").asInt(0),
      specs = meta.path("partition-specs").elements().asScala.toSeq,
      snapshots = meta.path("snapshots").elements().asScala.toSeq,
      currentSnapId = meta.path("current-snapshot-id").asLong(-1L),
      properties = meta.path("properties"))
  }

  /** (name, type, id) fields of the state's current schema. */
  private def currentFields(st: TableState): Seq[(String, String, Int)] = {
    val cur = st.schemas
      .find(_.path("schema-id").asInt(-1) == st.currentSchemaId)
      .getOrElse(throw new IllegalStateException("no current schema"))
    cur.path("fields").elements().asScala.map { n =>
      val t =
        if (n.path("type").isObject) om.writeValueAsString(n.path("type"))
        else n.path("type").asText()
      (n.path("name").asText(), t, n.path("id").asInt())
    }.toSeq
  }

  /** Partition fields of the state's default spec, resolved against
    * the current schema for types; modeled transforms are identity,
    * day, bucket[N], truncate[W] — anything else refuses by name.
    */
  private def partFields(st: TableState): Seq[PartField] = {
    val spec = st.specs
      .find(_.path("spec-id").asInt(-1) == st.defaultSpecId)
      .getOrElse(throw new IllegalStateException("no default spec"))
    val byId = currentFields(st).map { case (n, t, id) => id -> (n, t) }.toMap
    spec.path("fields").elements().asScala.map { fn =>
      val transform = fn.path("transform").asText()
      val srcId = fn.path("source-id").asInt()
      val (name, tpe) = byId.getOrElse(srcId, throw new
          IllegalStateException(s"partition source-id $srcId not in schema"))
      val (vt, at) = resolveTransform(transform, tpe)
      PartField(fn.path("name").asText(name), fn.path("field-id").asInt(),
        srcId, name, transform, vt, at)
    }.toSeq
  }

  /** Iceberg primitive → Spark type for equality-delete key casting
    * (the types [[mergeOnRead]] can author key tuples for).
    */
  private val keySparkType: Map[String, DataType] = Map(
    "int" -> IntegerType, "long" -> LongType, "string" -> StringType,
    "date" -> DateType, "boolean" -> BooleanType,
    "float" -> FloatType, "double" -> DoubleType,
    "timestamptz" -> TimestampType)

  private def sparkTypeOf(t: String): DataType = t match {
    case "int" => IntegerType; case "long" => LongType
    case "string" => StringType; case "date" => DateType
    case other => throw new IllegalArgumentException(
      s"partition column type $other unsupported (int/long/string/date " +
        "identity partitioning only) — refusing")
  }
  private def avroTypeOf(t: String): Schema.Type = t match {
    case "int" | "date" => INT // date serializes as days-from-epoch int
    case "long"         => LONG
    case "string"       => STRING
    case other => throw new IllegalArgumentException(
      s"partition column type $other unsupported — refusing")
  }

  // ------------------------------------------------------------------
  // metadata json
  // ------------------------------------------------------------------

  private def metadataJson(st: TableState, newSchemas: Seq[JsonNode],
                           currentSchemaId: Int, lastColumnId: Int,
                           newSnapshot: JsonNode, snapId: Long,
                           seq: Long): String = {
    val root = om.createObjectNode()
    root.put("format-version", 2)
    root.put("table-uuid", st.uuid)
    root.put("location", st.location)
    root.put("last-sequence-number", seq)
    root.put("last-updated-ms", System.currentTimeMillis())
    root.put("last-column-id", lastColumnId)
    root.put("current-schema-id", currentSchemaId)
    val schemas = root.putArray("schemas")
    newSchemas.foreach(schemas.add)
    val specs = root.putArray("partition-specs")
    st.specs.foreach(specs.add)
    root.put("default-spec-id", st.defaultSpecId)
    root.put("last-partition-id", st.lastPartitionId)
    val orders = root.putArray("sort-orders")
    val order0 = om.createObjectNode()
    order0.put("order-id", 0); order0.putArray("fields")
    orders.add(order0)
    root.put("default-sort-order-id", 0)
    root.set[JsonNode]("properties",
      if (st.properties.isObject) st.properties else om.createObjectNode())
    root.put("current-snapshot-id", snapId)
    val arr = root.putArray("snapshots")
    // prior snapshots carry VERBATIM — timestamps/sequence numbers are
    // history, never restamped
    st.snapshots.foreach(arr.add)
    arr.add(newSnapshot)
    om.writeValueAsString(root)
  }

  private def snapshotNode(snapId: Long, parentId: Long, seq: Long,
                           schemaId: Int, manifestList: String,
                           addedFiles: Long, addedRows: Long,
                           operation: String = "append"): JsonNode = {
    val n = om.createObjectNode()
    n.put("snapshot-id", snapId)
    if (parentId >= 0) n.put("parent-snapshot-id", parentId)
    n.put("sequence-number", seq)
    n.put("timestamp-ms", System.currentTimeMillis())
    n.put("manifest-list", manifestList)
    n.put("schema-id", schemaId)
    val sm = n.putObject("summary")
    sm.put("operation", operation)
    sm.put("added-data-files", addedFiles.toString)
    sm.put("added-records", addedRows.toString)
    n
  }

  // ------------------------------------------------------------------
  // public surface
  // ------------------------------------------------------------------

  /** Unpartitioned create — the py4j-friendly arity. */
  def create(df: DataFrame, path: String): Long = create(df, path, Nil)

  private val DaysArg   = """days?\(\s*([^)]+?)\s*\)""".r
  private val HoursArg  = """hours?\(\s*([^)]+?)\s*\)""".r
  private val MonthsArg = """months?\(\s*([^)]+?)\s*\)""".r
  private val YearsArg  = """years?\(\s*([^)]+?)\s*\)""".r
  private val BucketArg = """bucket\(\s*(\d+)\s*,\s*([^)]+?)\s*\)""".r
  private val TruncArg  = """truncate\(\s*(\d+)\s*,\s*([^)]+?)\s*\)""".r

  /** Create the table: data files + manifest + manifest list +
    * v1.metadata.json. `partitionBy` entries declare partition fields:
    * a bare column name (identity transform), `years(col)`,
    * `months(col)`, `days(col)`, `hours(col)`, `bucket(N, col)`, or
    * `truncate(W, col)` — recorded in the spec with the canonical
    * transform strings and pruned by IcebergRead's transform-aware
    * zone maps. Fails if a metadata dir already exists. Returns the
    * snapshot id (1).
    */
  def create(df: DataFrame, path: String, partitionBy: Seq[String]): Long = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    require(!f.exists(new Path(path, "metadata")),
      s"$path already has Iceberg metadata/ — use append")
    // (source column, spec transform string, spec field name)
    val declared = partitionBy.map {
      case YearsArg(c)     => (c, "year", s"${c}_year")
      case MonthsArg(c)    => (c, "month", s"${c}_month")
      case DaysArg(c)      => (c, "day", s"${c}_day")
      case HoursArg(c)     => (c, "hour", s"${c}_hour")
      case BucketArg(n, c) => (c, s"bucket[$n]", s"${c}_bucket")
      case TruncArg(w, c)  => (c, s"truncate[$w]", s"${c}_trunc")
      case c               => (c, "identity", c)
    }
    declared.foreach { case (c, t, _) =>
      require(df.columns.contains(c),
        s"partition column $c (transform $t) not in " +
          df.columns.mkString(","))
    }
    // depth-first pre-order id assignment (a nested column's inner ids
    // follow its own id) — typeString is also the loud type gate
    var nextColId = 0
    def alloc(): Int = { nextColId += 1; nextColId }
    val fields = df.schema.fields.toSeq.map { fl =>
      val id = alloc()
      (fl.name, typeString(fl.dataType, () => alloc()), id)
    }
    val fieldId = fields.map { case (n, _, id) => n -> id }.toMap
    val spec0 = om.createObjectNode()
    spec0.put("spec-id", 0)
    val sf = spec0.putArray("fields")
    val parts = declared.zipWithIndex.map { case ((c, transform, pname), i) =>
      val tpe = icebergType(df.schema(c).dataType)
      val (vt, at) = resolveTransform(transform, tpe) // loud type gate
      val pn = om.createObjectNode()
      pn.put("name", pname); pn.put("transform", transform)
      pn.put("source-id", fieldId(c)); pn.put("field-id", 1000 + i)
      sf.add(pn)
      PartField(pname, 1000 + i, fieldId(c), c, transform, vt, at)
    }
    val st = TableState(
      uuid = java.util.UUID.randomUUID().toString, location = path,
      lastColumnId = nextColId,
      lastPartitionId = if (parts.isEmpty) 999 else 999 + parts.size,
      lastSeq = 0L, currentSchemaId = 0,
      schemas = Seq(schemaJson(fields, 0)),
      defaultSpecId = 0, specs = Seq(spec0),
      snapshots = Nil, currentSnapId = -1L,
      properties = om.createObjectNode())
    require(commit(df, path, metaVersion = 1, snapshotId = 1L, st = st,
        fields = fields, newSchemas = st.schemas,
        currentSchemaId = 0, lastColumnId = nextColId,
        priorManifests = Nil),
      s"$path: v1.metadata.json was committed concurrently")
    1L
  }

  /** Append a new snapshot; schema must match exactly. */
  def append(df: DataFrame, path: String): Long =
    append(df, path, mergeSchema = false)

  /** Append with optional ADDITIVE schema evolution (the mirror of
    * [[DeltaWrite.append]]'s mergeSchema contract): NEW columns get
    * fresh field ids and a fresh schema-id; existing columns must match
    * by (name, type); batches may OMIT later-added columns. Optimistic
    * concurrency: a lost race replays the whole plan against the new
    * head (prior manifests carry forward).
    */
  def append(df: DataFrame, path: String, mergeSchema: Boolean): Long = {
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
      val st = parseState(meta, path)
      val tbl = currentFields(st)
      // evolution compares LOGICAL types (nested field ids stripped —
      // a batch can't know the table's nested ids and must not need to)
      val tblByName = tbl.map { case (n, t, _) => n -> logicalType(t) }
        .toMap
      val got = df.schema.fields.toSeq
        .map(fl => (fl.name, fl.dataType, logicalOf(fl.dataType)))
      val newCols = got.filterNot { case (n, _, _) =>
        tblByName.contains(n) }
      val (fields, newSchemas, schemaId, lastColId) =
        if (!mergeSchema) {
          val gotL = got.map { case (n, _, l) => (n, l) }
          val tblL = tbl.map { case (n, t, _) => (n, logicalType(t)) }
          require(gotL == tblL,
            s"append schema $gotL != table schema $tblL " +
              "(pass mergeSchema=true to evolve)")
          (tbl, st.schemas, st.currentSchemaId, st.lastColumnId)
        } else {
          got.filter { case (n, _, _) => tblByName.contains(n) }.foreach {
            case (n, _, l) => require(tblByName(n) == l,
              s"column $n: batch type $l conflicts with table type " +
                s"${tblByName(n)} — additive evolution only, refusing")
          }
          if (newCols.isEmpty) (tbl, st.schemas, st.currentSchemaId,
            st.lastColumnId)
          else {
            // fresh ids continue past last-column-id, depth-first —
            // nested new columns consume one id per inner field too
            var nextColId = st.lastColumnId
            def alloc(): Int = { nextColId += 1; nextColId }
            val fresh = newCols.map { case (n, dt, _) =>
              val id = alloc()
              (n, typeString(dt, () => alloc()), id)
            }
            val nextId = st.schemas
              .map(_.path("schema-id").asInt(0)).max + 1
            val evolved = tbl ++ fresh
            (evolved, st.schemas :+ schemaJson(evolved, nextId), nextId,
              nextColId)
          }
        }
      partFields(st).foreach(p => require(df.columns.contains(p.source),
        s"append batch misses partition column ${p.source}"))
      val snapId = st.snapshots.map(_.path("snapshot-id").asLong())
        .foldLeft(0L)(math.max) + 1
      // prior manifests carry forward from the CURRENT snapshot's list
      val currentList = st.snapshots
        .find(_.path("snapshot-id").asLong(-1L) == st.currentSnapId)
        .map(_.path("manifest-list").asText())
      val prior = currentList.toSeq.flatMap { ml =>
        readManifestList(spark, resolve(path, ml))
      }
      if (commit(df, path, curV.toInt + 1, snapId, st, fields,
          newSchemas, schemaId, lastColId, prior))
        return snapId
      attempts += 1
    }
    -1L // unreachable
  }

  private def resolve(tablePath: String, p: String): String =
    if (p.startsWith("/") || p.contains("://")) p else s"$tablePath/$p"

  /** MERGE-ON-READ UPSERT — the Flink/streaming-upsert pattern the v2
    * spec exists for: ONE snapshot carries an EQUALITY-DELETE file on
    * `keys` (the source's key tuples) plus the source rows as a new
    * data file, both at sequence number N. The delete applies to data
    * files with sequence STRICTLY below N, so prior versions of the
    * keys vanish while the same commit's inserts survive — no data-file
    * rewrite, no scan of the existing table at all (the 100 TB upsert
    * shape: cost is O(source), not O(table)). [[IcebergRead]] resolves
    * it through its sequence-ordered equality-delete path. Source must
    * carry the table schema exactly and at most one row per key.
    * PARTITIONED tables: data files split per partition tuple exactly
    * like append; the delete files are partition-scoped (tuple carried
    * in file + manifest) when every partition source column is a key,
    * else GLOBAL equality deletes under the unpartitioned spec.
    * Returns the new snapshot id.
    */
  def upsert(source: DataFrame, path: String, keys: Seq[String]): Long = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    import org.apache.spark.sql.functions.{col, count, lit}
    val dupes = source.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).limit(1).collect()
    require(dupes.isEmpty,
      s"upsert source has multiple rows for key ${dupes.headOption}" +
        " — MERGE requires at most one source row per key")
    mergeOnRead(source, path, keys, insertSource = true)
  }

  /** DELETE BY KEYS — the pure equality-delete snapshot (the
    * right-to-be-forgotten shape on the Iceberg leg, completing the
    * forget symmetry with Delta `deleteDvKeys` and Hudi `deleteLog`):
    * ONE content=2 delete file of the key tuples at sequence N, NO
    * table scan and NO data file — prior versions of the keys vanish
    * below N at O(keys) cost regardless of table size. Duplicate keys
    * in the frame are fine (deduplicated). Top-level primitive keys
    * only (the [[upsert]] rules). Partitioned tables work: the delete
    * files are partition-scoped when the keys determine the partition,
    * else global under the unpartitioned spec — so a forget queue
    * keyed by user id drains into a date-partitioned table.
    */
  def deleteKeys(keys: DataFrame, path: String,
                 keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "deleteKeys needs at least one key column")
    import org.apache.spark.sql.functions.col
    keyCols.foreach(k => require(keys.columns.contains(k),
      s"key column $k not in ${keys.columns.mkString(",")}"))
    val keyFrame = keys.select(keyCols.map(col): _*).dropDuplicates()
    if (keyFrame.isEmpty) {
      // nothing to delete: don't publish an empty snapshot
      val spark = keys.sparkSession
      val f = fs(spark, path)
      val in = f.open(currentMeta(spark, path))
      val meta = try om.readTree(new String(in.readAllBytes(), "UTF-8"))
                 finally in.close()
      return parseState(meta, path).currentSnapId
    }
    mergeOnRead(keyFrame, path, keyCols, insertSource = false)
  }

  /** Shared merge-on-read commit: an equality-delete file on `keys`
    * (always) plus, with `insertSource`, the source rows as data files
    * — both at the same fresh sequence number.
    */
  private def mergeOnRead(source: DataFrame, path: String,
                          keys: Seq[String],
                          insertSource: Boolean): Long = {
    val spark = source.sparkSession
    import org.apache.spark.sql.functions.col
    val f = fs(spark, path)
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the upsert race 10 times")
      val metaP = currentMeta(spark, path)
      val meta = {
        val in = f.open(metaP)
        try om.readTree(new String(in.readAllBytes(), "UTF-8"))
        finally in.close()
      }
      val MetaName(curV) = metaP.getName
      val st = parseState(meta, path)
      val parts = partFields(st)
      // PARTITION-SCOPING of the equality-delete files: when every
      // partition SOURCE column is among the keys, a key tuple maps to
      // exactly ONE partition — delete files split per tuple and carry
      // it (prunable, the Flink upsert contract). Otherwise the deletes
      // are GLOBAL: written with the UNPARTITIONED spec per the spec's
      // global-delete provision ("equality delete files in an
      // unpartitioned spec apply to all data files") — the
      // right-to-be-forgotten shape, where the forget key (user id)
      // does not determine the partition (date).
      val scoped = parts.nonEmpty && parts.forall(p => keys.contains(p.source))
      val tbl = currentFields(st)
      if (insertSource) {
        val got = source.schema.fields.toSeq
          .map(fl => fl.name -> logicalOf(fl.dataType))
        require(got == tbl.map { case (n, t, _) => (n, logicalType(t)) },
          s"upsert source schema $got != table schema " +
            s"${tbl.map { case (n, t, _) => (n, logicalType(t)) }}")
      }
      val fieldId = tbl.map { case (n, _, id) => n -> id }.toMap
      val tblType = tbl.map { case (n, t, _) => n -> t }.toMap
      keys.foreach(k => require(fieldId.contains(k),
        s"key column $k not in the table schema"))
      keys.foreach(k => require(!tblType(k).startsWith("{"),
        s"key column $k is a nested type — equality-delete keys must " +
          "be top-level primitive columns, refusing"))
      // the equality-delete parquet's PHYSICAL types must agree with
      // the equality_ids' field types (spec requirement — a mismatched
      // delete file silently fails to delete under strict readers), so
      // the pure-delete leg normalizes each key column to the table's
      // type: lossless widenings cast, anything else refuses — the
      // same schema discipline upsert enforces on the whole row
      val delKeySource =
        if (insertSource) source
        else keys.foldLeft(source) { (df, k) =>
          val have = df.schema(k).dataType
          if (logicalOf(have) == logicalType(tblType(k))) df
          else {
            val want = keySparkType.getOrElse(tblType(k),
              throw new IllegalArgumentException(
                s"deleteKeys: key column $k has table type " +
                  s"${tblType(k)} which this writer cannot author an " +
                  "equality-delete for — refusing"))
            require(org.apache.spark.sql.catalyst.expressions.Cast
              .canUpCast(have, want),
              s"deleteKeys: key column $k is ${have.simpleString} but " +
                s"the table field is ${tblType(k)} — not a lossless " +
                "widening, refusing (cast the key frame explicitly)")
            df.withColumn(k, col(k).cast(want))
          }
        }
      val seq = st.lastSeq + 1
      val snapId = st.snapshots.map(_.path("snapshot-id").asLong())
        .foldLeft(0L)(math.max) + 1

      // 1. the source rows land as ordinary data files (upsert only —
      // a pure key delete writes no data), split per partition tuple
      // exactly like append
      val landed =
        if (insertSource) writeData(source, path, parts) else Seq.empty
      val stats = FileStats.collect(spark, path, landed.map(_.rel))
      // 2. the equality-delete file(s): the source's KEY tuples —
      // per-partition files carrying their tuple when scoped, one
      // global (unpartitioned-spec) file otherwise
      val delParts = if (scoped) parts else Nil
      val delLanded = writeData(delKeySource.select(keys.map(col): _*),
        path, delParts, prefix = "eqdel-")
      val delWithRows = delLanded
        .map(l => l -> FileStats.rowCount(spark, path, l.rel))
        .filter(_._2 > 0L)
      delLanded.filterNot(l => delWithRows.exists(_._1.rel == l.rel))
        .foreach(l => f.delete(new Path(path, l.rel), false))

      // 3. ONE manifest per content kind (data + deletes), then the
      // manifest list carrying both plus every prior manifest
      val dataPartSchema = partitionRecord(parts)
      val dfSchema = dataFileSchema(dataPartSchema)
      val eSchema = entrySchema(dataPartSchema)
      def dataEntry(l: Landed, content: Int, rows: Long): GenericRecord = {
        val dfRec = new GenericData.Record(dfSchema)
        dfRec.put("content", Int.box(content))
        dfRec.put("file_path", l.rel)
        dfRec.put("file_format", "PARQUET")
        val pRec = new GenericData.Record(dataPartSchema)
        parts.zip(l.partition).foreach { case (pf, v) =>
          pRec.put(pf.name, v) }
        dfRec.put("partition", pRec)
        dfRec.put("record_count", Long.box(rows))
        dfRec.put("file_size_in_bytes",
          Long.box(f.getFileStatus(new Path(path, l.rel)).getLen))
        val e = new GenericData.Record(eSchema)
        e.put("status", Int.box(1))
        e.put("snapshot_id", Long.box(snapId))
        e.put("sequence_number", Long.box(seq))
        e.put("data_file", dfRec)
        e
      }
      val curSchemaNode = st.schemas
        .find(_.path("schema-id").asInt(-1) == st.currentSchemaId).get
      val specNode = st.specs
        .find(_.path("spec-id").asInt(-1) == st.defaultSpecId).get
      // the DELETE manifest's spec: the table default when the deletes
      // are partition-scoped (or the table is unpartitioned), else the
      // UNPARTITIONED spec — reused from partition-specs when present,
      // otherwise ADDED to the new metadata (ordinary spec evolution)
      val (stMeta, delSpecId, delSpecFields) =
        if (scoped || parts.isEmpty)
          (st, st.defaultSpecId, specNode.path("fields"))
        else st.specs.find(_.path("fields").size() == 0) match {
          case Some(sp) =>
            (st, sp.path("spec-id").asInt(0), sp.path("fields"))
          case None =>
            val id = st.specs.map(_.path("spec-id").asInt(0)).max + 1
            val n = om.createObjectNode()
            n.put("spec-id", id); n.putArray("fields")
            (st.copy(specs = st.specs :+ (n: JsonNode)), id,
              n.path("fields"))
        }
      val delPartSchema = partitionRecord(delParts)
      def manifestMeta(content: String, fieldsNode: JsonNode,
                       specId: Int) = Map(
        "schema" -> om.writeValueAsString(curSchemaNode),
        "schema-id" -> st.currentSchemaId.toString,
        "partition-spec" -> om.writeValueAsString(fieldsNode),
        "partition-spec-id" -> specId.toString,
        "format-version" -> "2",
        "content" -> content)
      val dataEntries = landed.map { l =>
        val rows = stats.getOrElse(l.rel, Map.empty).values.headOption
          .map(_.rows).getOrElse(FileStats.rowCount(spark, path, l.rel))
        dataEntry(l, 0, rows)
      }
      // a pure key delete writes NO data manifest at all
      val dataManifest: Option[(String, Long)] =
        if (dataEntries.isEmpty) None
        else {
          val rel = s"metadata/m-${java.util.UUID.randomUUID()}.avro"
          Some(rel -> writeAvro(f, new Path(path, rel),
            eSchema, dataEntries,
            manifestMeta("data", specNode.path("fields"),
              st.defaultSpecId)))
        }
      // equality-delete entries need equality_ids — extend the entry
      // with the ids via a dedicated schema
      val eqDfSchema = rec("data_file_eq", Seq(
        fld("content", s(INT), 134),
        fld("file_path", s(STRING), 100),
        fld("file_format", s(STRING), 101),
        fld("partition", delPartSchema, 102),
        fld("record_count", s(LONG), 103),
        fld("file_size_in_bytes", s(LONG), 104),
        optFld("equality_ids", Schema.createArray(s(INT)), 135)))
      val eqESchema = rec("manifest_entry_eq", Seq(
        fld("status", s(INT), 0),
        optFld("snapshot_id", s(LONG), 1),
        optFld("sequence_number", s(LONG), 3),
        fld("data_file", eqDfSchema, 2)))
      val eqEntries = delWithRows.map { case (l, n) =>
        val dfRec = new GenericData.Record(eqDfSchema)
        dfRec.put("content", Int.box(2)) // EQUALITY_DELETES
        dfRec.put("file_path", l.rel)
        dfRec.put("file_format", "PARQUET")
        val pRec = new GenericData.Record(delPartSchema)
        delParts.zip(l.partition).foreach { case (pf, v) =>
          pRec.put(pf.name, v) }
        dfRec.put("partition", pRec)
        dfRec.put("record_count", Long.box(n))
        dfRec.put("file_size_in_bytes",
          Long.box(f.getFileStatus(new Path(path, l.rel)).getLen))
        dfRec.put("equality_ids",
          keys.map(k => Int.box(fieldId(k))).asJava)
        val e = new GenericData.Record(eqESchema)
        e.put("status", Int.box(1))
        e.put("snapshot_id", Long.box(snapId))
        e.put("sequence_number", Long.box(seq))
        e.put("data_file", dfRec)
        e
      }
      val eqManifestRel =
        s"metadata/m-${java.util.UUID.randomUUID()}.avro"
      val eqMLen = writeAvro(f, new Path(path, eqManifestRel),
        eqESchema, eqEntries,
        manifestMeta("deletes", delSpecFields, delSpecId))

      def listRow(rel: String, len: Long, content: Int, files: Int,
                  rows: Long, specId: Int): GenericRecord = {
        val r = new GenericData.Record(manifestFileSchema)
        r.put("manifest_path", rel)
        r.put("manifest_length", Long.box(len))
        r.put("partition_spec_id", Int.box(specId))
        r.put("content", Int.box(content))
        r.put("sequence_number", Long.box(seq))
        r.put("min_sequence_number", Long.box(seq))
        r.put("added_snapshot_id", Long.box(snapId))
        r.put("added_data_files_count", Int.box(files))
        r.put("existing_data_files_count", Int.box(0))
        r.put("deleted_data_files_count", Int.box(0))
        r.put("added_rows_count", Long.box(rows))
        r.put("existing_rows_count", Long.box(0L))
        r.put("deleted_rows_count", Long.box(0L))
        r
      }
      val currentList = st.snapshots
        .find(_.path("snapshot-id").asLong(-1L) == st.currentSnapId)
        .map(_.path("manifest-list").asText())
      val prior = currentList.toSeq.flatMap(ml =>
        readManifestList(spark, resolve(path, ml)))
      val carried = prior.map { r =>
        def optL(n: String, d: Long): Long =
          if (r.getSchema.getField(n) == null || r.get(n) == null) d
          else r.get(n).toString.toLong
        val (af, ef, df0, ar, er, dr) = carriedCounts(spark, path, r)
        val c = new GenericData.Record(manifestFileSchema)
        c.put("manifest_path", r.get("manifest_path").toString)
        c.put("manifest_length",
          Long.box(r.get("manifest_length").toString.toLong))
        c.put("partition_spec_id", Int.box(
          Option(r.get("partition_spec_id")).map(_.toString.toInt)
            .getOrElse(0)))
        c.put("content", Int.box(
          if (r.getSchema.getField("content") == null) 0
          else Option(r.get("content")).map(_.toString.toInt).getOrElse(0)))
        c.put("sequence_number", Long.box(optL("sequence_number", 0L)))
        c.put("min_sequence_number",
          Long.box(optL("min_sequence_number", 0L)))
        c.put("added_snapshot_id", Long.box(optL("added_snapshot_id", 0L)))
        c.put("added_data_files_count", Int.box(af))
        c.put("existing_data_files_count", Int.box(ef))
        c.put("deleted_data_files_count", Int.box(df0))
        c.put("added_rows_count", Long.box(ar))
        c.put("existing_rows_count", Long.box(er))
        c.put("deleted_rows_count", Long.box(dr))
        c
      }
      val newRows = dataManifest.toSeq.map { case (rel, len) =>
        listRow(rel, len, 0, dataEntries.size,
          dataEntries.map(_.get("data_file")
            .asInstanceOf[GenericRecord].get("record_count")
            .toString.toLong).sum, st.defaultSpecId)
      } ++
        (if (eqEntries.isEmpty) Nil
         else Seq(listRow(eqManifestRel, eqMLen, 1, eqEntries.size,
           delWithRows.map(_._2).sum, delSpecId)))
      if (eqEntries.isEmpty) f.delete(new Path(path, eqManifestRel), false)
      val listRel =
        s"metadata/snap-$snapId-${java.util.UUID.randomUUID()}.avro"
      writeAvro(f, new Path(path, listRel), manifestFileSchema,
        carried ++ newRows, Map(
          "format-version" -> "2",
          "snapshot-id" -> snapId.toString,
          "parent-snapshot-id" -> st.currentSnapId.toString,
          "sequence-number" -> seq.toString))
      val snapNode = {
        val n = om.createObjectNode()
        n.put("snapshot-id", snapId)
        n.put("parent-snapshot-id", st.currentSnapId)
        n.put("sequence-number", seq)
        n.put("timestamp-ms", System.currentTimeMillis())
        n.put("manifest-list", listRel)
        n.put("schema-id", st.currentSchemaId)
        val sm = n.putObject("summary")
        sm.put("operation", if (insertSource) "overwrite" else "delete")
        n
      }
      val metaText = metadataJson(stMeta, st.schemas, st.currentSchemaId,
        st.lastColumnId, snapNode, snapId, seq)
      val mdir = new Path(path, "metadata")
      val tmp = new Path(mdir, s".tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, true)
      try out.write(metaText.getBytes("UTF-8")) finally out.close()
      val target = new Path(mdir, s"v${curV.toInt + 1}.metadata.json")
      val won = SnapshotTable.storeFor(f.getScheme)
        .publishIfAbsent(f, tmp, target)
      f.delete(tmp, false)
      if (won) {
        val hint = f.create(new Path(mdir, "version-hint.text"), true)
        try hint.write(s"${curV.toInt + 1}".getBytes("UTF-8"))
        finally hint.close()
        return snapId
      }
      attempts += 1
    }
    -1L // unreachable
  }

  /** Per-app transaction watermark, stored in the table PROPERTIES
    * (`graft.txn.<appId>`): Iceberg has no txn action, but properties
    * ride the SAME atomic metadata commit as the snapshot — and unlike
    * snapshot summaries they survive snapshot expiration. -1 = none.
    */
  def lastTxn(spark: SparkSession, path: String, appId: String): Long = {
    val f = fs(spark, path)
    val in = f.open(currentMeta(spark, path))
    val meta = try om.readTree(new String(in.readAllBytes(), "UTF-8"))
               finally in.close()
    Option(meta.path("properties").get(s"graft.txn.$appId"))
      .filterNot(_.isNull).map(_.asText().toLong).getOrElse(-1L)
  }

  /** EXACTLY-ONCE streaming append (the [[DeltaWrite.appendBatch]]
    * contract on the Iceberg leg): the commit carries
    * `graft.txn.<appId> = batchId` in the table properties, so a
    * replayed micro-batch (Structured Streaming re-runs the last
    * in-flight batch on every restart) is a detected no-op. Returns the
    * committed snapshot id, or the current one when the batch was
    * already applied. A loser of the metadata race re-checks the fresh
    * watermark before replanning.
    */
  def appendBatch(df: DataFrame, path: String, appId: String,
                  batchId: Long): Long = {
    require(appId.nonEmpty, "appendBatch: appId must be non-empty")
    val spark = df.sparkSession
    val f = fs(spark, path)
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the commit race 10 times")
      val metaP = currentMeta(spark, path)
      val meta = {
        val in = f.open(metaP)
        try om.readTree(new String(in.readAllBytes(), "UTF-8"))
        finally in.close()
      }
      val MetaName(curV) = metaP.getName
      val st = parseState(meta, path)
      val mark = Option(st.properties.get(s"graft.txn.$appId"))
        .filterNot(_.isNull).map(_.asText().toLong).getOrElse(-1L)
      if (mark >= batchId) return st.currentSnapId // replayed batch
      val tbl = currentFields(st)
      val got = df.schema.fields.toSeq
        .map(fl => fl.name -> logicalOf(fl.dataType))
      require(got == tbl.map { case (n, t, _) => (n, logicalType(t)) },
        s"appendBatch schema $got != table schema " +
          s"${tbl.map { case (n, t, _) => (n, logicalType(t)) }}")
      partFields(st).foreach(p => require(df.columns.contains(p.source),
        s"append batch misses partition column ${p.source}"))
      // the watermark rides the SAME metadata commit as the snapshot
      val props = om.createObjectNode()
      if (st.properties.isObject)
        st.properties.properties().asScala.foreach(e =>
          props.set[JsonNode](e.getKey, e.getValue))
      props.put(s"graft.txn.$appId", batchId.toString)
      val st2 = st.copy(properties = props)
      val snapId = st.snapshots.map(_.path("snapshot-id").asLong())
        .foldLeft(0L)(math.max) + 1
      val currentList = st.snapshots
        .find(_.path("snapshot-id").asLong(-1L) == st.currentSnapId)
        .map(_.path("manifest-list").asText())
      val prior = currentList.toSeq.flatMap { ml =>
        readManifestList(spark, resolve(path, ml))
      }
      if (commit(df, path, curV.toInt + 1, snapId, st2, tbl,
          st.schemas, st.currentSchemaId, st.lastColumnId, prior))
        return snapId
      attempts += 1
    }
    -1L // unreachable
  }

  /** DELETE rows matching `predicate` (SQL) by emitting v2 POSITION
    * DELETE files — the merge-on-read delete the spec provides (no
    * data-file rewrite): one distributed scan finds matching
    * (file, row-position) pairs, they land as a `(file_path, pos)`
    * delete parquet, and the commit adds a content=1 delete manifest
    * to the snapshot. [[IcebergRead]] (and any v2 reader) anti-joins
    * them at scan time; prior snapshots stay intact. On a PARTITIONED
    * table the delete files split per target-file partition tuple and
    * carry it in file and manifest, exactly as data files do. Returns
    * the new snapshot id, or the current one when nothing matched.
    */
  def delete(spark: SparkSession, path: String, predicate: String): Long = {
    val f = fs(spark, path)
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the delete race 10 times")
      val metaP = currentMeta(spark, path)
      val meta = {
        val in = f.open(metaP)
        try om.readTree(new String(in.readAllBytes(), "UTF-8"))
        finally in.close()
      }
      val MetaName(curV) = metaP.getName
      val st = parseState(meta, path)
      val parts = partFields(st)
      val curSnap = st.snapshots
        .find(_.path("snapshot-id").asLong(-1L) == st.currentSnapId)
        .getOrElse(throw new IllegalArgumentException(
          s"$path: no current snapshot to delete from"))
      val listPath = resolve(path, curSnap.path("manifest-list").asText())
      val prior = readManifestList(spark, listPath)
      // data files of the current snapshot (live entries of content=0
      // manifests) WITH their partition tuple — position-delete files
      // must carry the tuple of the files they reference, so each
      // matched file's tuple comes from its manifest entry verbatim
      val dataFilesWithPart: Seq[(String, Seq[AnyRef])] = prior
        .filter(r => (if (r.getSchema.getField("content") == null) 0
                      else Option(r.get("content")).map(_.toString.toInt)
                        .getOrElse(0)) == 0)
        .flatMap { m =>
          if (parts.nonEmpty) {
            val mspec = Option(m.get("partition_spec_id"))
              .map(_.toString.toInt).getOrElse(0)
            require(mspec == st.defaultSpecId,
              s"$path: data manifest under evolved partition spec " +
                s"$mspec != default ${st.defaultSpecId} — position " +
                "deletes across spec evolution are not modeled, refusing")
          }
          readManifestList(spark,
            resolve(path, m.get("manifest_path").toString)).flatMap { e =>
            val status = Option(e.getSchema.getField("status"))
              .flatMap(_ => Option(e.get("status")))
              .map(_.toString.toInt).getOrElse(1)
            if (status == 2) None
            else {
              val dfr = e.get("data_file").asInstanceOf[GenericRecord]
              val tuple: Seq[AnyRef] =
                if (parts.isEmpty) Nil
                else {
                  val pRec = dfr.get("partition")
                    .asInstanceOf[GenericRecord]
                  parts.map { pf =>
                    pRec.get(pf.name) match {
                      case u: org.apache.avro.util.Utf8 => u.toString
                      case other                        => other
                    }
                  }
                }
              Some(dfr.get("file_path").toString -> tuple)
            }
          }
        }.distinctBy(_._1)
      val dataFiles = dataFilesWithPart.map(_._1)
      if (dataFiles.isEmpty) return st.currentSnapId
      // one distributed scan: matching rows → (manifest-verbatim
      // file_path, row position). File identity via the percent-decoded
      // basename (Iceberg data-file names are UUID-unique table-wide).
      import org.apache.spark.sql.functions.{col, expr, udf}
      val byBase = dataFiles.map(p =>
        PathCodec.percentDecode(p.split("/").last) -> p).toMap
      require(byBase.size == dataFiles.size,
        s"$path: data-file basenames collide — cannot key positions, " +
          "refusing")
      val baseOf = udf((p: String) =>
        PathCodec.percentDecode(p.split("/").last))
      val bcast = spark.sparkContext.broadcast(byBase)
      val toVerbatim = udf((b: String) => bcast.value(b))
      val matches = spark.read
        .parquet(dataFiles.map(resolve(path, _)): _*)
        .filter(expr(predicate))
        .select(
          toVerbatim(baseOf(col("_metadata.file_path"))).as("file_path"),
          col("_metadata.row_index").as("pos"))
      // land the delete parquet (stage + move), sorted per the spec's
      // recommendation; on a partitioned table the positions stage
      // SPLIT BY TARGET-FILE PARTITION TUPLE (a shadow index column
      // through partitionBy, the writeData discipline) so each delete
      // file references one tuple and carries it in its manifest entry
      val tuples: Seq[Seq[AnyRef]] = dataFilesWithPart.map(_._2).distinct
      val idxOf: Map[String, Int] = dataFilesWithPart.map { case (p, t) =>
        p -> tuples.indexOf(t)
      }.toMap
      val idxB = spark.sparkContext.broadcast(idxOf)
      val toIdx = udf((p: String) => idxB.value(p))
      val stage = new Path(path, s".stage-${java.util.UUID.randomUUID()}")
      // (rel, tuple index; 0 when unpartitioned)
      val rels: Seq[(String, Int)] = try {
        if (parts.isEmpty)
          matches.sortWithinPartitions(col("file_path"), col("pos"))
            .write.parquet(stage.toString)
        else
          matches.withColumn("__gti", toIdx(col("file_path")))
            .sortWithinPartitions(col("file_path"), col("pos"))
            .write.partitionBy("__gti").parquet(stage.toString)
        def walk(p: Path): Seq[Path] =
          f.listStatus(p).toSeq.flatMap { s0 =>
            if (s0.isDirectory) walk(s0.getPath)
            else if (s0.getPath.getName.endsWith(".parquet")) Seq(s0.getPath)
            else Seq.empty
          }
        val found = walk(stage).sortBy(_.toString)
        f.mkdirs(new Path(path, "data"))
        found.map { p =>
          val ti =
            if (parts.isEmpty) 0
            else {
              val dirName = p.getParent.getName
              require(dirName.startsWith("__gti="),
                s"$path: staged delete part $p missing its tuple dir")
              dirName.stripPrefix("__gti=").toInt
            }
          val rel = s"data/del-${java.util.UUID.randomUUID()}.parquet"
          require(f.rename(p, new Path(path, rel)), s"rename failed for $p")
          rel -> ti
        }
      } finally f.delete(stage, true)
      val withRows = rels
        .map { case (r, ti) => (r, ti, FileStats.rowCount(spark, path, r)) }
        .filter(_._3 > 0L)
      rels.filterNot(r => withRows.exists(_._1 == r._1))
        .foreach(r => f.delete(new Path(path, r._1), false)) // empty parts
      if (withRows.isEmpty) return st.currentSnapId // nothing matched
      val seq = st.lastSeq + 1
      val snapId = st.snapshots.map(_.path("snapshot-id").asLong())
        .foldLeft(0L)(math.max) + 1
      // delete manifest: content=1 entries whose data_file carries
      // content=1 (position deletes), each with the partition tuple of
      // the data files its rows reference
      val partSchema = partitionRecord(parts)
      val dfSchema = dataFileSchema(partSchema)
      val eSchema = entrySchema(partSchema)
      val entries = withRows.map { case (rel, ti, n) =>
        val dfRec = new GenericData.Record(dfSchema)
        dfRec.put("content", Int.box(1)) // POSITION_DELETES
        dfRec.put("file_path", rel)
        dfRec.put("file_format", "PARQUET")
        val pRec = new GenericData.Record(partSchema)
        parts.zip(tuples(ti)).foreach { case (pf, v) =>
          pRec.put(pf.name, v) }
        dfRec.put("partition", pRec)
        dfRec.put("record_count", Long.box(n))
        dfRec.put("file_size_in_bytes",
          Long.box(f.getFileStatus(new Path(path, rel)).getLen))
        val e = new GenericData.Record(eSchema)
        e.put("status", Int.box(1))
        e.put("snapshot_id", Long.box(snapId))
        e.put("sequence_number", Long.box(seq))
        e.put("data_file", dfRec)
        e
      }
      val curSchemaNode = st.schemas
        .find(_.path("schema-id").asInt(-1) == st.currentSchemaId).get
      val specNode = st.specs
        .find(_.path("spec-id").asInt(-1) == st.defaultSpecId).get
      val manifestRel = s"metadata/m-${java.util.UUID.randomUUID()}.avro"
      val mLen = writeAvro(f, new Path(path, manifestRel), eSchema,
        entries, Map(
          "schema" -> om.writeValueAsString(curSchemaNode),
          "schema-id" -> st.currentSchemaId.toString,
          "partition-spec" -> om.writeValueAsString(specNode.path("fields")),
          "partition-spec-id" -> st.defaultSpecId.toString,
          "format-version" -> "2",
          "content" -> "deletes"))
      val newRow = new GenericData.Record(manifestFileSchema)
      newRow.put("manifest_path", manifestRel)
      newRow.put("manifest_length", Long.box(mLen))
      newRow.put("partition_spec_id", Int.box(st.defaultSpecId))
      newRow.put("content", Int.box(1)) // DELETES manifest
      newRow.put("sequence_number", Long.box(seq))
      newRow.put("min_sequence_number", Long.box(seq))
      newRow.put("added_snapshot_id", Long.box(snapId))
      newRow.put("added_data_files_count", Int.box(entries.size))
      newRow.put("existing_data_files_count", Int.box(0))
      newRow.put("deleted_data_files_count", Int.box(0))
      newRow.put("added_rows_count", Long.box(withRows.map(_._3).sum))
      newRow.put("existing_rows_count", Long.box(0L))
      newRow.put("deleted_rows_count", Long.box(0L))
      val carried = prior.map { r =>
        def optL(n: String, d: Long): Long =
          if (r.getSchema.getField(n) == null || r.get(n) == null) d
          else r.get(n).toString.toLong
        val (af, ef, df0, ar, er, dr) = carriedCounts(spark, path, r)
        val c = new GenericData.Record(manifestFileSchema)
        c.put("manifest_path", r.get("manifest_path").toString)
        c.put("manifest_length",
          Long.box(r.get("manifest_length").toString.toLong))
        c.put("partition_spec_id", Int.box(
          Option(r.get("partition_spec_id")).map(_.toString.toInt)
            .getOrElse(0)))
        c.put("content", Int.box(
          if (r.getSchema.getField("content") == null) 0
          else Option(r.get("content")).map(_.toString.toInt).getOrElse(0)))
        c.put("sequence_number", Long.box(optL("sequence_number", 0L)))
        c.put("min_sequence_number",
          Long.box(optL("min_sequence_number", 0L)))
        c.put("added_snapshot_id", Long.box(optL("added_snapshot_id", 0L)))
        c.put("added_data_files_count", Int.box(af))
        c.put("existing_data_files_count", Int.box(ef))
        c.put("deleted_data_files_count", Int.box(df0))
        c.put("added_rows_count", Long.box(ar))
        c.put("existing_rows_count", Long.box(er))
        c.put("deleted_rows_count", Long.box(dr))
        c
      }
      val listRel =
        s"metadata/snap-$snapId-${java.util.UUID.randomUUID()}.avro"
      writeAvro(f, new Path(path, listRel), manifestFileSchema,
        carried :+ newRow, Map(
          "format-version" -> "2",
          "snapshot-id" -> snapId.toString,
          "parent-snapshot-id" -> st.currentSnapId.toString,
          "sequence-number" -> seq.toString))
      val snapNode = {
        val n = om.createObjectNode()
        n.put("snapshot-id", snapId)
        n.put("parent-snapshot-id", st.currentSnapId)
        n.put("sequence-number", seq)
        n.put("timestamp-ms", System.currentTimeMillis())
        n.put("manifest-list", listRel)
        n.put("schema-id", st.currentSchemaId)
        val sm = n.putObject("summary")
        sm.put("operation", "delete")
        sm.put("added-delete-files", entries.size.toString)
        sm.put("added-position-deletes", withRows.map(_._3).sum.toString)
        n
      }
      val metaText = metadataJson(st, st.schemas, st.currentSchemaId,
        st.lastColumnId, snapNode, snapId, seq)
      val mdir = new Path(path, "metadata")
      val tmp = new Path(mdir, s".tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, true)
      try out.write(metaText.getBytes("UTF-8")) finally out.close()
      val target = new Path(mdir, s"v${curV.toInt + 1}.metadata.json")
      val won = SnapshotTable.storeFor(f.getScheme)
        .publishIfAbsent(f, tmp, target)
      f.delete(tmp, false)
      if (won) {
        val hint = f.create(new Path(mdir, "version-hint.text"), true)
        try hint.write(s"${curV.toInt + 1}".getBytes("UTF-8"))
        finally hint.close()
        return snapId
      }
      attempts += 1 // lost the race: replan against the new head
    }
    -1L // unreachable
  }

  private def gOpt(r: GenericRecord, name: String): Option[AnyRef] =
    Option(r.getSchema.getField(name)).flatMap(_ => Option(r.get(name)))

  /** DELETE rows matching `predicate` by authoring Iceberg v3
    * DELETION VECTORS — the puffin-stored position deletes replacing
    * classic delete parquet in v3: matched positions become ONE
    * roaring blob per affected data file (built STREAMING on
    * executors, the Delta dvBlobsOf discipline), all blobs land in ONE
    * spec-shaped puffin file (PFA1 framing, deletion-vector-v1 blob
    * layout, JSON footer), and a content=1 delete manifest carries one
    * entry per referenced file (`file_format=PUFFIN`,
    * `referenced_data_file`, `content_offset`/`content_size_in_bytes`,
    * the referenced file's partition tuple). A file ALREADY carrying a
    * DV gets its mask REPLACED by the union — the spec's
    * at-most-one-DV-per-file rule — with the superseded entries
    * dropped via filtered-copy manifest rewrites (the rewriteDataFiles
    * pattern), so prior snapshots still serve the old mask and the
    * current snapshot never stacks. Rows already masked never churn
    * the log (a no-new-matches call returns the current snapshot).
    */
  def deleteDv(spark: SparkSession, path: String,
               predicate: String): Long = {
    val f = fs(spark, path)
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the deleteDv race 10 times")
      val metaP = currentMeta(spark, path)
      val meta = {
        val in = f.open(metaP)
        try om.readTree(new String(in.readAllBytes(), "UTF-8"))
        finally in.close()
      }
      val MetaName(curV) = metaP.getName
      val st = parseState(meta, path)
      val parts = partFields(st)
      val curSnap = st.snapshots
        .find(_.path("snapshot-id").asLong(-1L) == st.currentSnapId)
        .getOrElse(throw new IllegalArgumentException(
          s"$path: no current snapshot to delete from"))
      val prior = readManifestList(spark,
        resolve(path, curSnap.path("manifest-list").asText()))
      def contentOf(row: GenericRecord): Int =
        if (row.getSchema.getField("content") == null) 0
        else Option(row.get("content")).map(_.toString.toInt).getOrElse(0)
      // live data files + their partition tuples (the delete() walk)
      val dataFilesWithPart: Seq[(String, Seq[AnyRef])] = prior
        .filter(contentOf(_) == 0)
        .flatMap { m =>
          readManifestList(spark,
            resolve(path, m.get("manifest_path").toString)).flatMap { e =>
            val status = gOpt(e, "status").map(_.toString.toInt)
              .getOrElse(1)
            if (status == 2) None
            else {
              val dfr = e.get("data_file").asInstanceOf[GenericRecord]
              val tuple: Seq[AnyRef] =
                if (parts.isEmpty) Nil
                else {
                  val pRec = dfr.get("partition")
                    .asInstanceOf[GenericRecord]
                  parts.map { pf =>
                    pRec.get(pf.name) match {
                      case u: org.apache.avro.util.Utf8 => u.toString
                      case other                        => other
                    }
                  }
                }
              Some(dfr.get("file_path").toString -> tuple)
            }
          }
        }.distinctBy(_._1)
      if (dataFilesWithPart.isEmpty) return st.currentSnapId
      val dataFiles = dataFilesWithPart.map(_._1)
      // existing DVs of the current snapshot: referenced file →
      // (puffin path, offset, length); their entries are the ones a
      // re-mask must supersede
      val priorDv: Map[String, (String, Long, Long)] = prior
        .filter(contentOf(_) == 1)
        .flatMap { m =>
          readManifestList(spark,
            resolve(path, m.get("manifest_path").toString)).flatMap { e =>
            val status = gOpt(e, "status").map(_.toString.toInt)
              .getOrElse(1)
            val dfr = e.get("data_file").asInstanceOf[GenericRecord]
            val fmt = gOpt(dfr, "file_format").map(_.toString)
              .getOrElse("PARQUET").toUpperCase
            if (status == 2 || fmt != "PUFFIN") None
            else Some(gOpt(dfr, "referenced_data_file").get.toString ->
              (dfr.get("file_path").toString,
                gOpt(dfr, "content_offset").get.toString.toLong,
                gOpt(dfr, "content_size_in_bytes").get.toString.toLong))
          }
        }.toMap
      // one distributed scan: matching (verbatim file_path, pos)
      import org.apache.spark.sql.functions.{col, expr, udf}
      val byBase = dataFiles.map(p =>
        PathCodec.percentDecode(p.split("/").last) -> p).toMap
      require(byBase.size == dataFiles.size,
        s"$path: data-file basenames collide — cannot key positions, " +
          "refusing")
      val baseOf = udf((p: String) =>
        PathCodec.percentDecode(p.split("/").last))
      val bcast = spark.sparkContext.broadcast(byBase)
      val toVerbatim = udf((b: String) => bcast.value(b))
      val matches = spark.read
        .parquet(dataFiles.map(resolve(path, _)): _*)
        .filter(expr(predicate))
        .select(
          toVerbatim(baseOf(col("_metadata.file_path"))).as("fp"),
          col("_metadata.row_index").as("pos"))
      // existing masks decode ON EXECUTORS into (file, pos) rows; fresh
      // = matches not already masked (no-churn rule)
      import spark.implicits._
      val existing: DataFrame =
        if (priorDv.isEmpty)
          Seq.empty[(String, Long)].toDF("fp", "pos")
        else {
          val refs = priorDv.toSeq.map { case (rf, (pp, off, len)) =>
            (resolve(path, pp), rf, off, len)
          }
          spark.sparkContext
            .parallelize(refs, math.max(1, math.min(refs.size, 32)))
            .flatMap { case (pp, rf, off, len) =>
              val p = new Path(pp)
              val fsx = p.getFileSystem(
                new org.apache.hadoop.conf.Configuration())
              val in = fsx.open(p)
              val bytes = try {
                in.seek(off)
                val b = new Array[Byte](len.toInt)
                in.readFully(b); b
              } finally in.close()
              IcebergRead.decodePuffinDv(bytes, pp).map(pos => (rf, pos))
            }.toDF("fp", "pos")
        }
      val fresh = matches.join(existing, Seq("fp", "pos"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val affected = fresh.select("fp").distinct()
        .as[String].collect().toSet
      if (affected.isEmpty) { fresh.unpersist(false); return st.currentSnapId }
      // replacement mask per affected file = existing ∪ fresh, built
      // streaming into per-high-word roaring bitmaps on executors
      val blobs: Seq[(String, Array[Byte], Long)] = fresh
        .unionByName(existing.filter(col("fp").isin(affected.toSeq: _*)))
        .as[(String, Long)]
        .groupByKey(_._1)
        .mapGroups { (fp, it) =>
          val byKey =
            new java.util.TreeMap[Int, org.roaringbitmap.RoaringBitmap]()
          it.foreach { case (_, p) =>
            require(p >= 0 && (p >>> 32) <= Int.MaxValue,
              "DV position outside the portable roaring domain")
            val hi = (p >>> 32).toInt
            var rb = byKey.get(hi)
            if (rb == null) {
              rb = new org.roaringbitmap.RoaringBitmap()
              byKey.put(hi, rb)
            }
            rb.add((p & 0xFFFFFFFFL).toInt)
          }
          val maps = byKey.entrySet().asScala.toSeq
            .map(e => (e.getKey.intValue(), e.getValue))
          val card = maps.map(_._2.getLongCardinality).sum
          (fp, DeltaRead.roaringSerializeBitmaps64(maps), card)
        }.collect().toSeq.sortBy(_._1)
      fresh.unpersist(false)
      // ONE puffin file: PFA1, per-file blobs (BE combined length,
      // magic D1D33964, vector, BE CRC-32), footer (PFA1 + JSON +
      // LE payload size + flags + PFA1)
      val pfMagic = "PFA1".getBytes("UTF-8")
      val dvMagic =
        Array(0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)
      val framed = blobs.map { case (fp, vec, card) =>
        val crc = new java.util.zip.CRC32()
        crc.update(dvMagic); crc.update(vec)
        val bb = java.nio.ByteBuffer.allocate(12 + vec.length)
        bb.putInt(4 + vec.length); bb.put(dvMagic); bb.put(vec)
        bb.putInt(crc.getValue.toInt)
        (fp, bb.array(), card)
      }
      var off = pfMagic.length.toLong
      val placed = framed.map { case (fp, b, card) =>
        val o = off; off += b.length
        (fp, b, card, o, b.length.toLong)
      }
      val footerBlobs = placed.map { case (fp, _, card, o, len) =>
        s"""{"type":"deletion-vector-v1","fields":[],""" +
          s""""snapshot-id":-1,"sequence-number":-1,""" +
          s""""offset":$o,"length":$len,"properties":{""" +
          s""""referenced-data-file":${om.writeValueAsString(fp)},""" +
          s""""cardinality":"$card"}}"""
      }.mkString("[", ",", "]")
      val payload =
        (s"""{"blobs":$footerBlobs,"properties":{}}""").getBytes("UTF-8")
      val puffinRel = s"data/dv-${java.util.UUID.randomUUID()}.puffin"
      val out = f.create(new Path(path, puffinRel), false)
      try {
        out.write(pfMagic)
        placed.foreach { case (_, b, _, _, _) => out.write(b) }
        out.write(pfMagic)
        out.write(payload)
        val tail = java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        tail.putInt(payload.length); tail.putInt(0)
        out.write(tail.array())
        out.write(pfMagic)
      } finally out.close()
      val puffinLen = f.getFileStatus(new Path(path, puffinRel)).getLen
      val seq = st.lastSeq + 1
      val snapId = st.snapshots.map(_.path("snapshot-id").asLong())
        .foldLeft(0L)(math.max) + 1
      // the DV delete manifest: one entry per referenced file with the
      // referenced file's partition tuple
      val partSchema = partitionRecord(parts)
      val dvDfSchema = rec("data_file_dv", Seq(
        fld("content", s(INT), 134),
        fld("file_path", s(STRING), 100),
        fld("file_format", s(STRING), 101),
        fld("partition", partSchema, 102),
        fld("record_count", s(LONG), 103),
        fld("file_size_in_bytes", s(LONG), 104),
        optFld("referenced_data_file", s(STRING), 143),
        optFld("content_offset", s(LONG), 144),
        optFld("content_size_in_bytes", s(LONG), 145)))
      val dvESchema = rec("manifest_entry_dv", Seq(
        fld("status", s(INT), 0),
        optFld("snapshot_id", s(LONG), 1),
        optFld("sequence_number", s(LONG), 3),
        fld("data_file", dvDfSchema, 2)))
      val tupleOf = dataFilesWithPart.toMap
      val dvEntries = placed.map { case (fp, _, card, o, len) =>
        val dfr = new GenericData.Record(dvDfSchema)
        dfr.put("content", Int.box(1)) // POSITION_DELETES (DV form)
        dfr.put("file_path", puffinRel)
        dfr.put("file_format", "PUFFIN")
        val pRec = new GenericData.Record(partSchema)
        parts.zip(tupleOf(fp)).foreach { case (pf, v) =>
          pRec.put(pf.name, v) }
        dfr.put("partition", pRec)
        dfr.put("record_count", Long.box(card))
        dfr.put("file_size_in_bytes", Long.box(puffinLen))
        dfr.put("referenced_data_file", fp)
        dfr.put("content_offset", Long.box(o))
        dfr.put("content_size_in_bytes", Long.box(len))
        val e = new GenericData.Record(dvESchema)
        e.put("status", Int.box(1))
        e.put("snapshot_id", Long.box(snapId))
        e.put("sequence_number", Long.box(seq))
        e.put("data_file", dfr)
        e
      }
      val curSchemaNode = st.schemas
        .find(_.path("schema-id").asInt(-1) == st.currentSchemaId).get
      val specNode = st.specs
        .find(_.path("spec-id").asInt(-1) == st.defaultSpecId).get
      val dvManifestRel = s"metadata/m-${java.util.UUID.randomUUID()}.avro"
      val dvMLen = writeAvro(f, new Path(path, dvManifestRel), dvESchema,
        dvEntries, Map(
          "schema" -> om.writeValueAsString(curSchemaNode),
          "schema-id" -> st.currentSchemaId.toString,
          "partition-spec" -> om.writeValueAsString(specNode.path("fields")),
          "partition-spec-id" -> st.defaultSpecId.toString,
          "format-version" -> "2",
          "content" -> "deletes"))
      // carry prior manifests; DELETE manifests holding a superseded
      // PUFFIN entry for an affected file rewrite as filtered copies
      // (empty ones drop)
      val carried: Seq[GenericRecord] = prior.flatMap { row =>
        if (contentOf(row) != 1) Some(row)
        else {
          val mp = row.get("manifest_path").toString
          val (entries, eSchema0, mMeta) =
            readAvroFull(spark, resolve(path, mp))
          def superseded(e: GenericRecord): Boolean = {
            val dfr = e.get("data_file").asInstanceOf[GenericRecord]
            gOpt(dfr, "file_format").map(_.toString.toUpperCase)
              .contains("PUFFIN") &&
              gOpt(dfr, "referenced_data_file")
                .exists(r => affected.contains(r.toString))
          }
          val keep = entries.filterNot(superseded)
          if (keep.size == entries.size) Some(row)
          else if (keep.isEmpty) None
          else {
            val newRel =
              s"metadata/m-${java.util.UUID.randomUUID()}.avro"
            val len = writeAvro(f, new Path(path, newRel), eSchema0,
              keep, mMeta)
            def optL(n: String, d: Long): Long =
              if (row.getSchema.getField(n) == null ||
                  row.get(n) == null) d
              else row.get(n).toString.toLong
            val rows = keep.map(e =>
              gOpt(e.get("data_file").asInstanceOf[GenericRecord],
                "record_count").map(_.toString.toLong).getOrElse(0L)).sum
            val c = new GenericData.Record(manifestFileSchema)
            c.put("manifest_path", newRel)
            c.put("manifest_length", Long.box(len))
            c.put("partition_spec_id", Int.box(
              Option(row.get("partition_spec_id")).map(_.toString.toInt)
                .getOrElse(0)))
            c.put("content", Int.box(1))
            c.put("sequence_number", Long.box(optL("sequence_number", 0L)))
            c.put("min_sequence_number",
              Long.box(optL("min_sequence_number", 0L)))
            c.put("added_snapshot_id",
              Long.box(optL("added_snapshot_id", 0L)))
            c.put("added_data_files_count", Int.box(keep.size))
            c.put("existing_data_files_count", Int.box(0))
            c.put("deleted_data_files_count", Int.box(0))
            c.put("added_rows_count", Long.box(rows))
            c.put("existing_rows_count", Long.box(0L))
            c.put("deleted_rows_count", Long.box(0L))
            Some(c)
          }
        }
      }
      val dvRow = new GenericData.Record(manifestFileSchema)
      dvRow.put("manifest_path", dvManifestRel)
      dvRow.put("manifest_length", Long.box(dvMLen))
      dvRow.put("partition_spec_id", Int.box(st.defaultSpecId))
      dvRow.put("content", Int.box(1))
      dvRow.put("sequence_number", Long.box(seq))
      dvRow.put("min_sequence_number", Long.box(seq))
      dvRow.put("added_snapshot_id", Long.box(snapId))
      dvRow.put("added_data_files_count", Int.box(dvEntries.size))
      dvRow.put("existing_data_files_count", Int.box(0))
      dvRow.put("deleted_data_files_count", Int.box(0))
      dvRow.put("added_rows_count",
        Long.box(placed.map(_._3).sum))
      dvRow.put("existing_rows_count", Long.box(0L))
      dvRow.put("deleted_rows_count", Long.box(0L))
      val listRel =
        s"metadata/snap-$snapId-${java.util.UUID.randomUUID()}.avro"
      writeAvro(f, new Path(path, listRel), manifestFileSchema,
        carried :+ dvRow, Map(
          "format-version" -> "2",
          "snapshot-id" -> snapId.toString,
          "parent-snapshot-id" -> st.currentSnapId.toString,
          "sequence-number" -> seq.toString))
      val snapNode = {
        val n = om.createObjectNode()
        n.put("snapshot-id", snapId)
        n.put("parent-snapshot-id", st.currentSnapId)
        n.put("sequence-number", seq)
        n.put("timestamp-ms", System.currentTimeMillis())
        n.put("manifest-list", listRel)
        n.put("schema-id", st.currentSchemaId)
        val sm = n.putObject("summary")
        sm.put("operation", "delete")
        sm.put("added-delete-files", dvEntries.size.toString)
        sm.put("added-position-deletes", placed.map(_._3).sum.toString)
        n
      }
      val metaText = metadataJson(st, st.schemas, st.currentSchemaId,
        st.lastColumnId, snapNode, snapId, seq)
      val mdir = new Path(path, "metadata")
      val tmp = new Path(mdir, s".tmp-${java.util.UUID.randomUUID()}")
      val o2 = f.create(tmp, true)
      try o2.write(metaText.getBytes("UTF-8")) finally o2.close()
      val target = new Path(mdir, s"v${curV.toInt + 1}.metadata.json")
      val won = SnapshotTable.storeFor(f.getScheme)
        .publishIfAbsent(f, tmp, target)
      f.delete(tmp, false)
      if (won) {
        val hint = f.create(new Path(mdir, "version-hint.text"), true)
        try hint.write(s"${curV.toInt + 1}".getBytes("UTF-8"))
        finally hint.close()
        return snapId
      }
      // lost the race: this attempt's puffin file is unreferenced
      f.delete(new Path(path, puffinRel), false)
      attempts += 1
    }
    -1L // unreachable
  }

  /** EXPIRE SNAPSHOTS + file GC — the Iceberg-leg analog of Delta
    * VACUUM: without it a long-lived table accretes snapshots,
    * manifest lists, and manifests forever. Keeps the LAST `keepLast`
    * snapshots (verbatim nodes — history never restamps), commits the
    * pruned metadata via the same put-if-absent race as appends, then
    * deletes storage no kept snapshot can reach: manifest
    * lists/manifests of expired snapshots, data files whose every
    * referencing snapshot expired, and (mtime-gated by
    * `orphanRetainMillis`, default 7 days — a mid-commit racer's
    * freshly moved files must survive) never-referenced orphans from
    * crashed writers. Time travel to an expired snapshot fails LOUDLY
    * afterwards ("snapshot not found"); kept snapshots stay readable.
    * Returns the number of files deleted.
    */
  /** ROLLBACK: set the current snapshot back to `snapshotId` as a NEW
    * metadata version (Iceberg's rollback_to_snapshot — a metadata-only
    * commit: no data, manifests, or history are touched, every snapshot
    * stays listed, so the rollback is itself revertible and pre-rollback
    * time travel still works). A rollback across a schema evolution
    * rolls the schema back for BOTH sides: reads resolve the old
    * snapshot's own schema via its schema-id, and `current-schema-id`
    * is reset to the target snapshot's schema-id so subsequent appends
    * validate against the rolled-back schema too (leaving it at the
    * evolved id would split the table into old-schema reads vs
    * new-schema writes). The full `schemas` history stays listed, so
    * re-rolling forward restores the evolved schema. The target must
    * still be in the snapshots list — an expired snapshot refuses
    * loudly. Returns the committed metadata version; no-op (current
    * metadata version) when already current.
    */
  def rollbackTo(spark: SparkSession, path: String, snapshotId: Long)
      : Long = {
    val f = fs(spark, path)
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the rollback race 10 times")
      val metaP = currentMeta(spark, path)
      val meta = {
        val in = f.open(metaP)
        try om.readTree(new String(in.readAllBytes(), "UTF-8"))
        finally in.close()
      }
      val MetaName(curV) = metaP.getName
      val st = parseState(meta, path)
      require(st.snapshots.exists(
          _.path("snapshot-id").asLong() == snapshotId),
        s"$path: snapshot $snapshotId is not in the table's snapshot " +
          "list (expired?) — cannot roll back to it")
      if (st.currentSnapId == snapshotId) return curV.toLong
      val root = om.readTree(om.writeValueAsString(meta))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      root.put("current-snapshot-id", snapshotId)
      // roll the WRITE schema back with the snapshot: v2 snapshots
      // record their schema-id, and a listed schema-id always resolves
      // in the carried-forward schemas history (v1 snapshots without
      // one leave the current schema as-is)
      st.snapshots.find(_.path("snapshot-id").asLong() == snapshotId)
        .flatMap(s => Option(s.get("schema-id")).filterNot(_.isNull))
        .foreach(sid => root.put("current-schema-id", sid.asInt()))
      root.put("last-updated-ms", System.currentTimeMillis())
      val mdir = new Path(path, "metadata")
      val tmp = new Path(mdir, s".tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, true)
      try out.write(om.writeValueAsString(root).getBytes("UTF-8"))
      finally out.close()
      val target = new Path(mdir, s"v${curV.toInt + 1}.metadata.json")
      val won = SnapshotTable.storeFor(f.getScheme)
        .publishIfAbsent(f, tmp, target)
      f.delete(tmp, false)
      if (won) {
        val hint = f.create(new Path(mdir, "version-hint.text"), true)
        try hint.write(s"${curV.toInt + 1}".getBytes("UTF-8"))
        finally hint.close()
        return curV.toInt + 1L
      }
      attempts += 1
    }
    -1L // unreachable
  }

  def expireSnapshots(spark: SparkSession, path: String, keepLast: Int,
                      orphanRetainMillis: Long = 7L * 24 * 3600 * 1000)
      : Int = {
    require(keepLast >= 1, "expireSnapshots: keepLast must be >= 1")
    val f = fs(spark, path)
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the expire race 10 times")
      val metaP = currentMeta(spark, path)
      val meta = {
        val in = f.open(metaP)
        try om.readTree(new String(in.readAllBytes(), "UTF-8"))
        finally in.close()
      }
      val MetaName(curV) = metaP.getName
      val st = parseState(meta, path)
      val ordered = st.snapshots.sortBy(_.path("snapshot-id").asLong())
      val kept = ordered.takeRight(keepLast)
      require(kept.exists(_.path("snapshot-id").asLong()
          == st.currentSnapId),
        s"$path: keepLast=$keepLast would expire the CURRENT snapshot — " +
          "refusing")
      val expiring = kept.size < ordered.size
      // pruned metadata (only when something actually expires — a pure
      // orphan sweep needs no commit): everything carries forward
      // verbatim except the snapshots array
      val won =
        if (!expiring) true
        else {
          val root = om.readTree(om.writeValueAsString(meta))
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          val arr = root.putArray("snapshots")
          kept.foreach(arr.add)
          root.put("last-updated-ms", System.currentTimeMillis())
          val mdir = new Path(path, "metadata")
          val tmp = new Path(mdir, s".tmp-${java.util.UUID.randomUUID()}")
          val out = f.create(tmp, true)
          try out.write(om.writeValueAsString(root).getBytes("UTF-8"))
          finally out.close()
          val target = new Path(mdir, s"v${curV.toInt + 1}.metadata.json")
          val w = SnapshotTable.storeFor(f.getScheme)
            .publishIfAbsent(f, tmp, target)
          f.delete(tmp, false)
          if (w) {
            val hint = f.create(new Path(mdir, "version-hint.text"), true)
            try hint.write(s"${curV.toInt + 1}".getBytes("UTF-8"))
            finally hint.close()
          }
          w
        }
      if (!won) { attempts += 1 }
      else {
        // GC: reachable = kept snapshots' manifest lists + manifests +
        // every data file a non-DELETED entry references (all compared
        // as scheme-QUALIFIED paths so file:/ and bare forms agree)
        def q(p: String): String = f.makeQualified(new Path(p)).toString
        val reachable = scala.collection.mutable.Set[String]()
        kept.foreach { s =>
          val ml = resolve(path, s.path("manifest-list").asText())
          reachable += q(ml)
          readManifestList(spark, ml).foreach { m =>
            val mp = resolve(path, m.get("manifest_path").toString)
            reachable += q(mp)
            readManifestList(spark, mp).foreach { e =>
              val status = Option(e.getSchema.getField("status"))
                .flatMap(_ => Option(e.get("status")))
                .map(_.toString.toInt).getOrElse(1)
              if (status != 2)
                reachable += q(resolve(path,
                  e.get("data_file").asInstanceOf[GenericRecord]
                    .get("file_path").toString))
            }
          }
        }
        // avros provably owned by the snapshots this call just EXPIRED
        // may delete immediately: they were referenced by the log we
        // removed, so no racer can be about to reference them
        val expiredAvros = scala.collection.mutable.Set[String]()
        val expiredData = scala.collection.mutable.Set[String]()
        ordered.filterNot(kept.contains).foreach { s =>
          val ml = resolve(path, s.path("manifest-list").asText())
          expiredAvros += q(ml)
          if (f.exists(new Path(ml)))
            readManifestList(spark, ml).foreach { m =>
              val mp = resolve(path, m.get("manifest_path").toString)
              expiredAvros += q(mp)
              if (f.exists(new Path(mp)))
                readManifestList(spark, mp).foreach { e =>
                  expiredData += q(resolve(path,
                    e.get("data_file").asInstanceOf[GenericRecord]
                      .get("file_path").toString))
                }
            }
        }
        val cutoff = System.currentTimeMillis() -
          math.max(0L, orphanRetainMillis)
        var deleted = 0
        def sweep(dir: Path, exts: Seq[String], mtimeGated: Boolean,
                  ungatedOk: Set[String] = Set.empty): Unit =
          if (f.exists(dir)) f.listStatus(dir).foreach { s0 =>
            val p0 = s0.getPath
            val name = p0.getName
            val qp = f.makeQualified(p0).toString
            if (s0.isFile && exts.exists(name.endsWith(_)) &&
                !name.startsWith(".") &&
                !reachable.contains(qp) &&
                (!mtimeGated || ungatedOk.contains(qp) ||
                  s0.getModificationTime < cutoff)) {
              if (f.delete(p0, false)) deleted += 1
            }
          }
        // manifests/lists: expired-snapshot avros delete immediately
        // (known provenance), but an UNKNOWN unreferenced avro is
        // mtime-gated — a racing appender writes its fresh UUID
        // manifest + manifest list BEFORE publishing the metadata json
        // that references them, so an ungated sweep that wins the
        // metadata race would delete files a replanning racer is about
        // to commit a reference to.
        sweep(new Path(path, "metadata"), Seq(".avro"), mtimeGated = true,
          ungatedOk = expiredAvros.toSet)
        // data files: expired-only references delete immediately (known
        // provenance, same rule as the avros); crash orphans stay
        // mtime-gated — the gate protects a mid-commit racer's freshly
        // moved files
        sweep(new Path(path, "data"), Seq(".parquet"), mtimeGated = true,
          ungatedOk = expiredData.toSet)
        return deleted
      }
    }
    -1 // unreachable
  }

  /** Full avro read: records + writer schema + the file metadata keys
    * this writer emits — what [[rewriteDataFiles]] needs to write a
    * FILTERED copy of a manifest without degrading its metadata.
    */
  private def readAvroFull(spark: SparkSession, p: String)
      : (Seq[GenericRecord], Schema, Map[String, String]) = {
    val f = fs(spark, p)
    val in = f.open(new Path(p))
    val bytes = try in.readAllBytes() finally in.close()
    val r = new org.apache.avro.file.DataFileReader[GenericRecord](
      new org.apache.avro.file.SeekableByteArrayInput(bytes),
      new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    try {
      val recs = r.iterator().asScala.toVector
      val meta = Seq("schema", "schema-id", "partition-spec",
        "partition-spec-id", "format-version", "content")
        .flatMap(k => Option(r.getMetaString(k)).map(k -> _)).toMap
      (recs, r.getSchema, meta)
    } finally r.close()
  }

  /** REWRITE DATA FILES — the Iceberg-leg OPTIMIZE analog, closing the
    * compaction symmetry across all three format legs (Delta
    * `optimize`, Hudi `compact`/`cluster`): bin-pack live data files
    * smaller than `targetBytes` into ~targetBytes files in ONE
    * `replace` snapshot. The rewritten rows are materialized WITH the
    * current snapshot's deletes applied ([[IcebergRead.liveRows]]), so
    * a rewrite never resurrects deleted rows, and the new files land
    * at a fresh data sequence number ABOVE every existing equality
    * delete (none can apply to them). Replaced files drop from the new
    * snapshot by REWRITING the affected manifests (filtered copies
    * with their original entry schema + file metadata; untouched
    * manifests carry forward verbatim), exactly the spec's
    * RewriteFiles shape — prior snapshots keep their original
    * manifest lists, so time travel to the pre-rewrite layout still
    * works and `expireSnapshots` reclaims the replaced files once
    * those snapshots expire. Delete files carry forward: they still
    * scope remaining old files (sequence-ordered), and name no live
    * path among the rewritten ones. Returns the new snapshot id, or
    * the current one when fewer than 2 files qualify.
    *
    * `sortBy` switches to the SORTED layout rewrite (the spec's
    * sort-order rewrite, mirror of Hudi `cluster(sortBy)` and Delta
    * `optimize(zorderBy)`): EVERY live data file rewrites with rows
    * range-partitioned + sorted on the keys, so the new files carry
    * DISJOINT key ranges into the existing bounds pruning — a range
    * predicate on the leading key opens 1-of-N. Numeric keys prune
    * (string bounds are deliberately not emitted — footer truncation).
    */
  def rewriteDataFiles(spark: SparkSession, path: String,
                       targetBytes: Long = 128L * 1024 * 1024,
                       sortBy: Seq[String] = Nil): Long = {
    val f = fs(spark, path)
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the rewrite race 10 times")
      val metaP = currentMeta(spark, path)
      val meta = {
        val in = f.open(metaP)
        try om.readTree(new String(in.readAllBytes(), "UTF-8"))
        finally in.close()
      }
      val MetaName(curV) = metaP.getName
      val st = parseState(meta, path)
      val sizes = IcebergRead.liveFileSizes(spark, path)
      val candidates =
        (if (sortBy.nonEmpty) sizes // layout rewrite: every live file
         else sizes.filter(_._2 < targetBytes)).map(_._1).toSet
      if (candidates.size < 2) return st.currentSnapId
      val totalBytes = sizes.filter(s0 => candidates.contains(s0._1))
        .map(_._2).sum
      val bins = math.max(1L,
        (totalBytes + targetBytes - 1) / targetBytes).toInt
      val rows0 = IcebergRead.liveRows(spark, path, candidates)
      val merged =
        if (sortBy.isEmpty) rows0.repartition(bins)
        else {
          import org.apache.spark.sql.functions.col
          sortBy.foreach(c => require(rows0.columns.contains(c),
            s"sortBy column $c not in ${rows0.columns.mkString(",")}"))
          rows0.repartitionByRange(bins, sortBy.map(col): _*)
            .sortWithinPartitions(sortBy.map(col): _*)
        }
      // rewrite affected manifests as filtered copies; carry the rest
      val curSnap = st.snapshots
        .find(_.path("snapshot-id").asLong(-1L) == st.currentSnapId)
        .getOrElse(throw new IllegalArgumentException(
          s"$path: no current snapshot to rewrite"))
      val prior = readManifestList(spark,
        resolve(path, curSnap.path("manifest-list").asText()))
      val filtered: Seq[GenericRecord] = prior.flatMap { row =>
        val content =
          if (row.getSchema.getField("content") == null) 0
          else Option(row.get("content")).map(_.toString.toInt)
            .getOrElse(0)
        val mp = row.get("manifest_path").toString
        if (content != 0) Some(row) // delete manifests carry verbatim
        else {
          val (entries, eSchema0, mMeta) =
            readAvroFull(spark, resolve(path, mp))
          val (dead, live) = entries.partition { e =>
            val status = Option(e.getSchema.getField("status"))
              .flatMap(_ => Option(e.get("status")))
              .map(_.toString.toInt).getOrElse(1)
            status != 2 && candidates.contains(
              e.get("data_file").asInstanceOf[GenericRecord]
                .get("file_path").toString)
          }
          if (dead.isEmpty) Some(row) // untouched: carry verbatim
          else {
            val newRel =
              s"metadata/m-${java.util.UUID.randomUUID()}.avro"
            val len = writeAvro(f, new Path(path, newRel), eSchema0,
              live, mMeta)
            def optL(n: String, d: Long): Long =
              if (row.getSchema.getField(n) == null || row.get(n) == null)
                d
              else row.get(n).toString.toLong
            val liveData = live.filterNot(e =>
              Option(e.getSchema.getField("status"))
                .flatMap(_ => Option(e.get("status")))
                .exists(_.toString.toInt == 2))
            if (liveData.isEmpty) {
              // every entry replaced: the filtered manifest would be
              // empty — drop it from the new list entirely
              f.delete(new Path(path, newRel), false)
              None
            } else {
            val liveRowsN = liveData.map(
              _.get("data_file").asInstanceOf[GenericRecord]
                .get("record_count").toString.toLong).sum
            val c = new GenericData.Record(manifestFileSchema)
            c.put("manifest_path", newRel)
            c.put("manifest_length", Long.box(len))
            c.put("partition_spec_id", Int.box(
              Option(row.get("partition_spec_id")).map(_.toString.toInt)
                .getOrElse(0)))
            c.put("content", Int.box(0))
            c.put("sequence_number", Long.box(optL("sequence_number", 0L)))
            c.put("min_sequence_number",
              Long.box(optL("min_sequence_number", 0L)))
            c.put("added_snapshot_id",
              Long.box(optL("added_snapshot_id", 0L)))
            c.put("added_data_files_count", Int.box(liveData.size))
            c.put("existing_data_files_count", Int.box(0))
            c.put("deleted_data_files_count", Int.box(0))
            c.put("added_rows_count", Long.box(liveRowsN))
            c.put("existing_rows_count", Long.box(0L))
            c.put("deleted_rows_count", Long.box(0L))
            Some(c)
            }
          }
        }
      }
      val snapId = st.snapshots.map(_.path("snapshot-id").asLong())
        .foldLeft(0L)(math.max) + 1
      if (commit(merged, path, curV.toInt + 1, snapId, st,
          currentFields(st), st.schemas, st.currentSchemaId,
          st.lastColumnId, filtered, operation = "replace"))
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

  /** Carried-forward manifest counts: copied from the prior record when
    * present; a pre-spec-complete manifest (no count fields) is read
    * once (KB-sized, driver) to reconstruct them.
    */
  private def carriedCounts(spark: SparkSession, path: String,
                            r: GenericRecord): (Int, Int, Int, Long, Long, Long) = {
    def optI(n: String): Option[Int] =
      if (r.getSchema.getField(n) == null || r.get(n) == null) None
      else Some(r.get(n).toString.toInt)
    def optL(n: String): Option[Long] =
      if (r.getSchema.getField(n) == null || r.get(n) == null) None
      else Some(r.get(n).toString.toLong)
    (optI("added_data_files_count"), optL("added_rows_count")) match {
      case (Some(af), Some(ar)) =>
        (af, optI("existing_data_files_count").getOrElse(0),
          optI("deleted_data_files_count").getOrElse(0),
          ar, optL("existing_rows_count").getOrElse(0L),
          optL("deleted_rows_count").getOrElse(0L))
      case _ =>
        val entries = readManifestList(spark,
          resolve(path, r.get("manifest_path").toString))
        val live = entries.filterNot(e =>
          Option(e.get("status")).exists(_.toString.toInt == 2))
        val rows = live.map(_.get("data_file").asInstanceOf[GenericRecord]
          .get("record_count").toString.toLong).sum
        (live.size, 0, 0, rows, 0L, 0L)
    }
  }

  /** One landed data file: table-relative path and its identity
    * partition tuple (manifest-domain values).
    */
  private final case class Landed(rel: String, partition: Seq[AnyRef])

  /** Write `df`'s data files under `data/`, split so each file holds
    * exactly one partition tuple (via SHADOW columns through Spark's
    * partitionBy stage — the real columns stay in the files, as Iceberg
    * data files carry every column).
    */
  private def writeData(df: DataFrame, path: String,
                        parts: Seq[PartField],
                        prefix: String = "part-"): Seq[Landed] = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    val stage = new Path(path, s".stage-${java.util.UUID.randomUUID()}")
    try {
      import org.apache.spark.sql.functions.col
      if (parts.isEmpty) df.write.parquet(stage.toString)
      else {
        val shadowed = parts.foldLeft(df)((d, p) =>
          d.withColumn(s"__gpart_${p.name}",
            transformCol(p, df.schema(p.source).dataType)))
        shadowed.write.partitionBy(parts.map(p => s"__gpart_${p.name}"): _*)
          .parquet(stage.toString)
      }
      def walk(p: Path): Seq[Path] = f.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
        else Seq.empty
      }
      val found = walk(stage).sortBy(_.toString)
      val stagePrefix = f.makeQualified(stage).toString
      f.mkdirs(new Path(path, "data"))
      found.map { p =>
        val relDir = f.makeQualified(p.getParent).toString
          .stripPrefix(stagePrefix).stripPrefix("/")
        val segs = if (relDir.isEmpty) Nil else relDir.split("/").toSeq
        val byName = segs.map { seg =>
          val Array(k, v) = seg.split("=", 2)
          require(v != "__HIVE_DEFAULT_PARTITION__",
            s"NULL partition value in ${k.stripPrefix("__gpart_")} — " +
              "refused (a nullable partition key is a modeling bug)")
          k.stripPrefix("__gpart_") -> PathCodec.percentDecode(v)
        }.toMap
        val tuple: Seq[AnyRef] = parts.map { pf =>
          val raw = byName.getOrElse(pf.name, throw new IllegalStateException(
            s"partition column ${pf.name} missing from staged dir $relDir"))
          pf.sparkType match {
            case IntegerType => Int.box(raw.toInt)
            case LongType    => Long.box(raw.toLong)
            case StringType  => raw
            case DateType    =>
              Int.box(java.time.LocalDate.parse(raw).toEpochDay.toInt)
            case other => throw new IllegalStateException(
              s"unreachable partition type $other")
          }
        }
        val rel = s"data/$prefix${java.util.UUID.randomUUID()}.parquet"
        require(f.rename(p, new Path(path, rel)), s"rename failed for $p")
        Landed(rel, tuple)
      }
    } finally f.delete(stage, true)
  }

  /** Write one snapshot bottom-up and race the metadata json. Returns
    * true on a won commit.
    */
  private def commit(df: DataFrame, path: String, metaVersion: Int,
                     snapshotId: Long, st: TableState,
                     fields: Seq[(String, String, Int)],
                     newSchemas: Seq[JsonNode], currentSchemaId: Int,
                     lastColumnId: Int,
                     priorManifests: Seq[GenericRecord],
                     operation: String = "append"): Boolean = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    val seq = st.lastSeq + 1
    val parts = partFields(st)
    // 1. data files (stage + move, Delta-writer discipline)
    val landed = writeData(df, path, parts)
    val stats = FileStats.collect(spark, path, landed.map(_.rel))
    val fieldId = fields.map { case (n, _, id) => n -> id }.toMap
    val sparkSchema = df.schema

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
    val partSchema = partitionRecord(parts)
    val dfSchema = dataFileSchema(partSchema)
    val eSchema = entrySchema(partSchema)
    var addedRows = 0L
    val entries = landed.map { l =>
      val rel = l.rel
      val colStats = stats.getOrElse(rel, Map.empty)
      // record_count is PER-FILE from the parquet footer — a whole-batch
      // figure would overstate planning counts for every reader
      val rows = colStats.values.headOption.map(_.rows)
        .getOrElse(FileStats.rowCount(spark, path, rel))
      addedRows += rows
      val dfRec = new GenericData.Record(dfSchema)
      dfRec.put("content", Int.box(0))
      dfRec.put("file_path", rel)
      dfRec.put("file_format", "PARQUET")
      val pRec = new GenericData.Record(partSchema)
      parts.zip(l.partition).foreach { case (pf, v) => pRec.put(pf.name, v) }
      dfRec.put("partition", pRec)
      dfRec.put("record_count", Long.box(rows))
      dfRec.put("file_size_in_bytes",
        Long.box(f.getFileStatus(new Path(path, rel)).getLen))
      def kvRec(schema0: Schema, k: Int, v: AnyRef): GenericRecord = {
        val r = new GenericData.Record(schema0)
        r.put("key", Int.box(k)); r.put("value", v); r
      }
      val kvL = dfSchema.getField("null_value_counts").schema()
        .getTypes.get(1).getElementType
      val kvB = dfSchema.getField("lower_bounds").schema()
        .getTypes.get(1).getElementType
      val nulls = sparkSchema.fields.toSeq
        .filter(fl => fieldId.contains(fl.name)).flatMap { fl =>
          colStats.get(fl.name).filter(_.nulls >= 0).map(c =>
            kvRec(kvL, fieldId(fl.name), Long.box(c.nulls)))
        }
      // bounds: exact numeric domains only (footer string stats may be
      // truncated — absent bounds are sound, wrong bounds are not)
      val (los, his) = sparkSchema.fields.toSeq
        .filter(fl => fieldId.contains(fl.name)).flatMap { fl =>
          val id = fieldId(fl.name)
          colStats.get(fl.name).flatMap { c =>
            (fl.dataType, c.kind, c.lo, c.hi) match {
              case (ByteType | ShortType | IntegerType, "l",
                    Some(lo), Some(hi)) =>
                Some((kvRec(kvB, id, leInt(lo.toInt)),
                  kvRec(kvB, id, leInt(hi.toInt))))
              case (LongType, "l", Some(lo), Some(hi)) =>
                Some((kvRec(kvB, id, leLong(lo.toLong)),
                  kvRec(kvB, id, leLong(hi.toLong))))
              case (DoubleType, "d", Some(lo), Some(hi)) =>
                Some((kvRec(kvB, id, leDouble(lo.toDouble)),
                  kvRec(kvB, id, leDouble(hi.toDouble))))
              case (dt: DecimalType, "d", Some(lo), Some(hi)) =>
                // spec Appendix D: decimal single-value serialization is
                // the UNSCALED value as minimal two's-complement
                // BIG-endian bytes (exactly BigInteger.toByteArray)
                def beDec(v: String): java.nio.ByteBuffer =
                  java.nio.ByteBuffer.wrap(new java.math.BigDecimal(v)
                    .setScale(dt.scale).unscaledValue().toByteArray)
                Some((kvRec(kvB, id, beDec(lo)),
                  kvRec(kvB, id, beDec(hi))))
              case _ => None
            }
          }
        }.unzip
      if (nulls.nonEmpty) dfRec.put("null_value_counts", nulls.asJava)
      if (los.nonEmpty) {
        dfRec.put("lower_bounds", los.asJava)
        dfRec.put("upper_bounds", his.asJava)
      }
      val e = new GenericData.Record(eSchema)
      e.put("status", Int.box(1)) // ADDED
      e.put("snapshot_id", Long.box(snapshotId))
      e.put("sequence_number", Long.box(seq))
      e.put("data_file", dfRec)
      e
    }
    val curSchemaNode = newSchemas
      .find(_.path("schema-id").asInt(-1) == currentSchemaId).get
    val specNode = st.specs
      .find(_.path("spec-id").asInt(-1) == st.defaultSpecId).get
    val manifestMeta = Map(
      "schema" -> om.writeValueAsString(curSchemaNode),
      "schema-id" -> currentSchemaId.toString,
      "partition-spec" -> om.writeValueAsString(specNode.path("fields")),
      "partition-spec-id" -> st.defaultSpecId.toString,
      "format-version" -> "2",
      "content" -> "data")
    val manifestRel =
      s"metadata/m-${java.util.UUID.randomUUID()}.avro"
    val mLen = writeAvro(f, new Path(path, manifestRel), eSchema,
      entries, manifestMeta)

    // 3. manifest list: prior manifests carried forward + the new one
    val newRow = new GenericData.Record(manifestFileSchema)
    newRow.put("manifest_path", manifestRel)
    newRow.put("manifest_length", Long.box(mLen))
    newRow.put("partition_spec_id", Int.box(st.defaultSpecId))
    newRow.put("content", Int.box(0))
    newRow.put("sequence_number", Long.box(seq))
    newRow.put("min_sequence_number", Long.box(seq))
    newRow.put("added_snapshot_id", Long.box(snapshotId))
    newRow.put("added_data_files_count", Int.box(entries.size))
    newRow.put("existing_data_files_count", Int.box(0))
    newRow.put("deleted_data_files_count", Int.box(0))
    newRow.put("added_rows_count", Long.box(addedRows))
    newRow.put("existing_rows_count", Long.box(0L))
    newRow.put("deleted_rows_count", Long.box(0L))
    val carried = priorManifests.map { r =>
      def optL(n: String, d: Long): Long =
        if (r.getSchema.getField(n) == null || r.get(n) == null) d
        else r.get(n).toString.toLong
      val (af, ef, df0, ar, er, dr) = carriedCounts(spark, path, r)
      val c = new GenericData.Record(manifestFileSchema)
      c.put("manifest_path", r.get("manifest_path").toString)
      c.put("manifest_length",
        Long.box(r.get("manifest_length").toString.toLong))
      c.put("partition_spec_id", Int.box(
        Option(r.get("partition_spec_id")).map(_.toString.toInt)
          .getOrElse(0)))
      c.put("content", Int.box(
        if (r.getSchema.getField("content") == null) 0
        else Option(r.get("content")).map(_.toString.toInt).getOrElse(0)))
      // prior sequence numbers persist VERBATIM (they order deletes)
      c.put("sequence_number", Long.box(optL("sequence_number", 0L)))
      c.put("min_sequence_number", Long.box(optL("min_sequence_number", 0L)))
      c.put("added_snapshot_id", Long.box(optL("added_snapshot_id", 0L)))
      c.put("added_data_files_count", Int.box(af))
      c.put("existing_data_files_count", Int.box(ef))
      c.put("deleted_data_files_count", Int.box(df0))
      c.put("added_rows_count", Long.box(ar))
      c.put("existing_rows_count", Long.box(er))
      c.put("deleted_rows_count", Long.box(dr))
      c
    }
    // UUID-unique: a racing loser that shared a deterministic name
    // would CLOBBER the winner's list before losing the metadata race —
    // only the put-if-absent metadata json may carry a contended name
    val listRel =
      s"metadata/snap-$snapshotId-${java.util.UUID.randomUUID()}.avro"
    writeAvro(f, new Path(path, listRel), manifestFileSchema,
      carried :+ newRow, Map(
        "format-version" -> "2",
        "snapshot-id" -> snapshotId.toString,
        "parent-snapshot-id" ->
          (if (st.currentSnapId >= 0) st.currentSnapId.toString else "null"),
        "sequence-number" -> seq.toString))

    // 4. race the metadata json (put-if-absent; loser replans)
    val snapNode = snapshotNode(snapshotId, st.currentSnapId, seq,
      currentSchemaId, listRel, entries.size.toLong, addedRows,
      operation)
    val metaText = metadataJson(st, newSchemas, currentSchemaId,
      lastColumnId, snapNode, snapshotId, seq)
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
