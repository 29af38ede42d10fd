package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Avro round-trip without the spark-avro connector (not shipped in this
  * environment): reader/writer built directly on the public avro-core +
  * avro-mapred jars that ARE on the Spark classpath, through Spark's
  * Hadoop-format RDD bridges — the message-bus interchange format a
  * batch-ETL framework must speak.
  *
  * - [[write]]: DataFrame → Avro container files via
  *   `saveAsNewAPIHadoopFile` + `AvroKeyOutputFormat` (proper task
  *   commit protocol — speculative/failed tasks can't publish partial
  *   files). The Avro schema is derived from the DataFrame schema;
  *   nullable columns become `[null, T]` unions, timestamps/dates the
  *   standard `timestamp-micros`/`date` logical types.
  * - [[read]]: one distributed `newAPIHadoopFile` scan over the glob
  *   (`AvroKeyInputFormat` decodes each file with its own embedded
  *   writer schema — no reader-schema pinning), records mapped to rows
  *   BY FIELD NAME into a target struct, so heterogeneous-schema file
  *   sets (additive evolution) project correctly with nulls for fields
  *   a file predates — parquet's mergeSchema semantics.
  * - Schema discovery reads each file's HEADER only (metadata-sized,
  *   like parquet footer reads) and merges field lists additively;
  *   a type conflict on a shared field name refuses loudly.
  *
  * Supported types (the flat interchange subset, documented contract):
  * boolean/int/long/float/double/string/binary/timestamp/date, plus
  * arrays of these. Conversion happens per partition inside one narrow
  * stage — records never ride a shuffle, so Avro's non-serializable
  * runtime types never leave the task that decoded them.
  */
object AvroIO {

  // ---- schema mapping ------------------------------------------------

  private[sources] def toAvroSchema(s: StructType, name: String): Schema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    s.fields.foldLeft(fields) { (fs, f) =>
      val base = baseAvro(f.dataType)
      if (f.nullable)
        fs.name(f.name)
          .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
          .withDefault(null)
      else fs.name(f.name).`type`(base).noDefault()
    }.endRecord()
  }

  private def baseAvro(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType    => Schema.create(Schema.Type.LONG)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      org.apache.avro.LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))
    case ArrayType(et, containsNull) =>
      val el = baseAvro(et)
      Schema.createArray(
        if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), el)
        else el)
    case other => throw new IllegalArgumentException(
      s"AvroIO does not support $other (flat interchange subset: " +
        "boolean/int/long/float/double/string/binary/timestamp/date + arrays)")
  }

  /** Avro → Spark type for one field schema (unions of [null, T] unwrap
    * to nullable T).
    */
  private[sources] def toSparkType(s: Schema): (DataType, Boolean) = {
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"AvroIO supports only [null, T] unions, got $s")
      val (dt, _) = toSparkType(nonNull.head)
      (dt, true)
    } else (s.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT =>
        if (s.getLogicalType != null &&
          s.getLogicalType.getName == "date") DateType else IntegerType
      case Schema.Type.LONG =>
        if (s.getLogicalType != null &&
          s.getLogicalType.getName.startsWith("timestamp")) TimestampType
        else LongType
      case Schema.Type.FLOAT  => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES  => BinaryType
      case Schema.Type.ARRAY =>
        val (et, en) = toSparkType(s.getElementType)
        ArrayType(et, en)
      case other => throw new IllegalArgumentException(
        s"AvroIO cannot map Avro type $other to Spark")
    }, false)
  }

  // ---- write ---------------------------------------------------------

  def write(df: DataFrame, path: String): Unit = {
    val avroSchema = toAvroSchema(df.schema, "graft_row")
    val schemaJson = avroSchema.toString // Schema is not serializable pre-1.9 habits: ship JSON
    val sparkSchema = df.schema
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, avroSchema)
    df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      rows.map { row =>
        (new AvroKey[GenericRecord](toRecord(row, sparkSchema, schema)),
          NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
    // schema sidecar: an EMPTY dataset may produce zero part files
    // (nothing to commit), and a later read must still know the schema —
    // the same reason parquet writes _metadata-bearing footers even for
    // empty outputs
    val fs = new Path(path).getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(path, "_schema.avsc"), true)
    try out.write(schemaJson.getBytes("UTF-8")) finally out.close()
  }

  private def toRecord(row: Row, st: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    var i = 0
    while (i < st.length) {
      rec.put(st(i).name, toAvroValue(row.get(i), st(i).dataType))
      i += 1
    }
    rec
  }

  private def toAvroValue(v: Any, dt: DataType): Any = v match {
    case null => null
    case ts: java.sql.Timestamp => // exact timestamp-micros
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    case d: java.sql.Date =>
      d.toLocalDate.toEpochDay.toInt
    case bytes: Array[Byte] => java.nio.ByteBuffer.wrap(bytes)
    case seq: scala.collection.Seq[_] =>
      val et = dt.asInstanceOf[ArrayType].elementType
      seq.map(toAvroValue(_, et)).asJava
    case other => other // boolean/int/long/float/double/string pass through
  }

  // ---- read ----------------------------------------------------------

  /** Read every .avro file under `path` as ONE distributed scan. The
    * target struct is the additive merge of all file header schemas
    * (mergeSchema semantics); pass `schema` to pin it instead.
    */
  def read(spark: SparkSession, path: String,
           schema: StructType = null): DataFrame = {
    val target = Option(schema).getOrElse(mergedSchema(spark, path))
    val targetDdl = target.toDDL
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.globStatus(new Path(s"$path/*.avro")).isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], target) // empty write: sidecar schema only
    val rdd = spark.sparkContext.newAPIHadoopFile(
      s"$path/*.avro",
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable])
    val rows = rdd.mapPartitions { it =>
      val st = StructType.fromDDL(targetDdl)
      it.map { case (k, _) => fromRecord(k.datum(), st) }
    }
    spark.createDataFrame(rows, target)
  }

  private def fromRecord(rec: GenericRecord, st: StructType): Row = {
    val vals = st.fields.map { f =>
      val has = rec.getSchema.getField(f.name) != null
      if (!has) null // field newer than this file: evolution null
      else fromAvroValue(rec.get(f.name), f.dataType)
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (l: java.lang.Long, TimestampType) =>
      val micros = l.longValue()
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
    case (l: java.util.List[_], ArrayType(et, _)) =>
      l.asScala.map(fromAvroValue(_, et)).toSeq
    case (other, _) => other
  }

  /** Additive merge of every file's header schema under `path` —
    * metadata-sized driver work (one header read per file, the parquet-
    * footer discipline), refusing type conflicts loudly.
    */
  def mergedSchema(spark: SparkSession, path: String): StructType = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.globStatus(new Path(s"$path/*.avro")).map(_.getPath)
    if (files.isEmpty) {
      // empty dataset: schema comes from the write-time sidecar
      val sidecar = new Path(path, "_schema.avsc")
      require(fs.exists(sidecar),
        s"no .avro files and no _schema.avsc sidecar under $path")
      val in = fs.open(sidecar)
      val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val parsed = new Schema.Parser().parse(json)
      return StructType(parsed.getFields.asScala.map { f =>
        val (dt, nullable) = toSparkType(f.schema())
        StructField(f.name(), dt, nullable)
      }.toArray)
    }
    val fieldOrder = scala.collection.mutable.LinkedHashMap[String, StructField]()
    val seenIn = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    files.foreach { f =>
      val in = fs.open(f)
      val reader = try {
        new org.apache.avro.file.DataFileStream[GenericRecord](
          in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      } catch { case e: Throwable => in.close(); throw e }
      val writerSchema = try reader.getSchema finally reader.close()
      writerSchema.getFields.asScala.foreach { fld =>
        val (dt, nullable) = toSparkType(fld.schema())
        seenIn(fld.name()) += 1
        fieldOrder.get(fld.name()) match {
          case Some(existing) =>
            require(existing.dataType == dt,
              s"AvroIO mergedSchema: field '${fld.name()}' is " +
                s"${existing.dataType} in one file and $dt in another — " +
                "only additive evolution is supported")
            if (nullable && !existing.nullable)
              fieldOrder(fld.name()) = existing.copy(nullable = true)
          case None =>
            fieldOrder(fld.name()) = StructField(fld.name(), dt, nullable)
        }
      }
    }
    // fields absent from SOME file must be nullable in the merged view
    // (those files' rows surface null there)
    StructType(fieldOrder.values.map { f =>
      if (seenIn(f.name) < files.length) f.copy(nullable = true) else f
    }.toArray)
  }
}
