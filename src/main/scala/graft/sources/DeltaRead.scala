package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Read-only Delta Lake table reader — open-table-format interop from
  * the PUBLIC Delta transaction-log protocol (delta.io PROTOCOL.md): an
  * adopter's existing lake keeps its format and every graft operator
  * runs against it unchanged.
  *
  * What it does:
  *   - parses `_delta_log/NNNN.json` commits (and a parquet checkpoint
  *     referenced by `_last_checkpoint` when present), replaying
  *     add-file actions minus remove-file actions into the live file
  *     set of the requested version;
  *   - surfaces per-file stats (`numRecords`/`minValues`/`maxValues`/
  *     `nullCount`) into the SAME zone-map machinery SnapshotTable uses
  *     ([[FileStats.mayMatch]]), so `readWhere` opens only files whose
  *     [min,max] can satisfy the predicate;
  *   - time travel via `version` (replays the log prefix).
  *
  * Non-goals (documented, loudly enforced): NO writes, NO deletion
  * vectors / column mapping / any reader-version-2+ table feature —
  * tables demanding `minReaderVersion > 1` are rejected rather than
  * silently misread. Log parsing is driver-side metadata work (the same
  * discipline as SnapshotTable manifests): one listing plus one ~KB
  * JSON read per commit, and the checkpoint is read through Spark. At
  * a 100 TB table the file LIST is checkpoint-bounded; planning stays
  * O(files) metadata, payload reads are pruned scans.
  */
object DeltaRead {
  private val om = new ObjectMapper()

  private final case class AddEntry(path: String, stats: Option[String],
                                    partitionValues: Map[String, String])

  private final case class LogState(
    schemaJson: String,
    partitionCols: Seq[String],
    adds: Map[String, AddEntry])

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val CommitName = """(\d{20})\.json""".r
  private val CheckpointName = """(\d{20})\.checkpoint\.parquet""".r

  /** Latest committed version of the table (max of commit jsons and
    * checkpoints present in the log).
    */
  def latestVersion(spark: SparkSession, path: String): Long = {
    val dir = new Path(path, "_delta_log")
    val f = fs(spark, path)
    require(f.exists(dir), s"$path has no _delta_log — not a Delta table")
    f.listStatus(dir).map(_.getPath.getName).flatMap {
      case CommitName(v)     => Some(v.toLong)
      case CheckpointName(v) => Some(v.toLong)
      case _                 => None
    }.foldLeft(-1L)(math.max)
  }

  /** Declared partition columns of the table (latest metaData action) —
    * the writer's append-compatibility check reads this.
    */
  private[sources] def partitionColumns(spark: SparkSession,
                                        path: String): Seq[String] =
    replay(spark, path, -1L).partitionCols

  /** Snapshot the log at `version` (-1 = latest): schema + live files. */
  private def replay(spark: SparkSession, path: String,
                     version: Long): LogState = {
    val dir = new Path(path, "_delta_log")
    val f = fs(spark, path)
    require(f.exists(dir), s"$path has no _delta_log — not a Delta table")
    val names = f.listStatus(dir).map(_.getPath.getName)
    val commits = names.collect { case CommitName(v) => v.toLong }.sorted
    val checkpoints = names.collect { case CheckpointName(v) => v.toLong }.sorted
    val target =
      if (version >= 0) version
      else (commits ++ checkpoints).foldLeft(-1L)(math.max)
    require(target >= 0, s"$path: empty _delta_log")

    var schemaJson: String = null
    var partitionCols: Seq[String] = Nil
    var adds = Map.empty[String, AddEntry]

    // checkpoint base: the newest checkpoint at or below the target
    val base = checkpoints.filter(_ <= target).lastOption
    base.foreach { cv =>
      val cp = new Path(dir, f"$cv%020d.checkpoint.parquet").toString
      val rows = spark.read.parquet(cp)
        .selectExpr("add.path AS a_path", "add.stats AS a_stats",
          "add.partitionValues AS a_pv",
          "remove.path AS r_path",
          "metaData.schemaString AS m_schema",
          "metaData.partitionColumns AS m_parts",
          "protocol.minReaderVersion AS p_mrv")
        .collect()
      rows.foreach { r =>
        if (!r.isNullAt(6)) checkReader(r.getInt(6))
        if (!r.isNullAt(4)) {
          schemaJson = r.getString(4)
          partitionCols =
            if (r.isNullAt(5)) Nil else r.getSeq[String](5).toSeq
        }
        if (!r.isNullAt(0)) {
          val pv: Map[String, String] =
            if (r.isNullAt(2)) Map.empty
            else r.getMap[String, String](2).toMap
          adds += r.getString(0) -> AddEntry(r.getString(0),
            Option(if (r.isNullAt(1)) null else r.getString(1)), pv)
        }
        if (!r.isNullAt(3)) adds -= r.getString(3)
      }
    }

    // replay JSON commits after the checkpoint up to the target
    val from = base.map(_ + 1).getOrElse(0L)
    (from to target).foreach { v =>
      val p = new Path(dir, f"$v%020d.json")
      require(f.exists(p),
        s"$path: missing commit $v (log cleaned past requested version?)")
      val in = f.open(p)
      val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      text.split("\n").filter(_.trim.nonEmpty).foreach { line =>
        val n = om.readTree(line)
        if (n.has("protocol"))
          checkReader(n.path("protocol").path("minReaderVersion").asInt(1))
        if (n.has("metaData")) {
          val md = n.path("metaData")
          require(md.path("format").path("provider").asText("parquet")
            .equalsIgnoreCase("parquet"),
            "only parquet-format Delta tables are supported")
          schemaJson = md.path("schemaString").asText()
          partitionCols = md.path("partitionColumns").elements().asScala
            .map(_.asText()).toSeq
        }
        if (n.has("add")) {
          val a = n.path("add")
          val rel = a.path("path").asText()
          val pv = Option(a.get("partitionValues"))
            .map(_.properties().asScala
              .map(e => e.getKey ->
                (if (e.getValue.isNull) null else e.getValue.asText())).toMap)
            .getOrElse(Map.empty[String, String])
          adds += rel -> AddEntry(rel,
            Option(a.get("stats")).filterNot(_.isNull).map(_.asText()), pv)
        }
        if (n.has("remove"))
          adds -= n.path("remove").path("path").asText()
      }
    }
    require(schemaJson != null, s"$path: log carries no metaData action")
    LogState(schemaJson, partitionCols, adds)
  }

  private def checkReader(minReaderVersion: Int): Unit =
    require(minReaderVersion <= 1,
      s"Delta table requires reader version $minReaderVersion " +
        "(column mapping / deletion vectors / table features) — this " +
        "read-only planner supports reader version 1 only, refusing " +
        "rather than misreading")

  private def decode(rel: String): String =
    java.net.URLDecoder.decode(rel, "UTF-8")

  private def schemaOf(st: LogState): StructType =
    DataType.fromJson(st.schemaJson).asInstanceOf[StructType]

  /** The table as a DataFrame at `version` (-1 = latest). Column order
    * follows the Delta schema; partition columns are recovered from the
    * hive-style directory layout Delta writes.
    */
  def read(spark: SparkSession, path: String, version: Long = -1L)
      : DataFrame = {
    val st = replay(spark, path, version)
    assemble(spark, path, st, st.adds.values.toSeq)
  }

  private def assemble(spark: SparkSession, path: String, st: LogState,
                       files: Seq[AddEntry]): DataFrame = {
    val schema = schemaOf(st)
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val paths = files.map(a => s"$path/${decode(a.path)}")
    val dataSchema = StructType(
      schema.fields.filterNot(f => st.partitionCols.contains(f.name)))
    val reader = spark.read
      .option("basePath", path)
      .schema(if (st.partitionCols.isEmpty) schema else dataSchema)
    import org.apache.spark.sql.functions.col
    val raw = reader.parquet(paths: _*)
    if (st.partitionCols.isEmpty) raw.select(schema.fieldNames.map(col): _*)
    else {
      // partition values come off the directory names; cast to the
      // declared schema types (inference would guess)
      val casted = st.partitionCols.foldLeft(raw) { (df, c) =>
        df.withColumn(c, col(c).cast(schema(c).dataType))
      }
      casted.select(schema.fieldNames.map(col): _*)
    }
  }

  /** Zone-map stats for one add entry, in [[FileStats.ColStat]] form —
    * sound mapping only: int/long/float/double/string columns with
    * json-native stat values; everything else answers "cannot prune"
    * (dates, timestamps, decimals render engine-specifically in Delta
    * stats json, so they are deliberately NOT mapped).
    */
  private def colStats(schema: StructType, a: AddEntry)
      : Map[String, FileStats.ColStat] =
    a.stats.toSeq.flatMap { js =>
      val n = om.readTree(js)
      val rows = n.path("numRecords").asLong(-1L)
      if (rows < 0) Seq.empty
      else schema.fields.toSeq.flatMap { f =>
        val kind = f.dataType match {
          case ByteType | ShortType | IntegerType | LongType => Some("l")
          case FloatType | DoubleType                        => Some("d")
          case StringType                                    => Some("s")
          case _                                             => None
        }
        kind.flatMap { k =>
          def stat(section: String): Option[JsonNode] =
            Option(n.path(section).get(f.name)).filterNot(_.isNull)
          val lo = stat("minValues")
          val hi = stat("maxValues")
          val nulls = Option(n.path("nullCount").get(f.name))
            .filterNot(_.isNull).map(_.asLong(-1L)).getOrElse(-1L)
          def render(v: JsonNode): Option[String] = k match {
            case "s" => if (v.isTextual) Some(v.asText()) else None
            case _   => if (v.isNumber) Some(v.asText()) else None
          }
          (lo, hi) match {
            case (Some(l), Some(h)) =>
              for (ls <- render(l); hs <- render(h))
                yield f.name -> FileStats.ColStat(k, Some(ls), Some(hs),
                  nulls, rows)
            case (None, None) if nulls == rows && rows >= 0 =>
              // all-null file for this column
              Some(f.name -> FileStats.ColStat(k, None, None, nulls, rows))
            case _ => None
          }
        }
      }
    }.toMap

  /** Pruned read: only files whose Delta stats can satisfy `predicate`
    * are opened (files without usable stats are always kept — pruning
    * may only ever SKIP provably-impossible files). The predicate is
    * re-applied after the scan, so the result equals
    * `read(...).filter(predicate)` exactly.
    */
  def readWhere(spark: SparkSession, path: String, predicate: String,
                version: Long = -1L): DataFrame = {
    val st = replay(spark, path, version)
    val schema = schemaOf(st)
    val pred = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(predicate)
    val kept = st.adds.values.toSeq.filter { a =>
      FileStats.mayMatch(pred, colStats(schema, a))
    }
    assemble(spark, path, st, kept)
      .filter(org.apache.spark.sql.functions.expr(predicate))
  }

  /** (total live files, files a predicate would open) — observability
    * for the skipping spec and layout audits.
    */
  def pruneReport(spark: SparkSession, path: String, predicate: String,
                  version: Long = -1L): (Int, Int) = {
    val st = replay(spark, path, version)
    val schema = schemaOf(st)
    val pred = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(predicate)
    val all = st.adds.values.toSeq
    (all.size, all.count(a => FileStats.mayMatch(pred, colStats(schema, a))))
  }
}
