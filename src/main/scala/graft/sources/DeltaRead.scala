package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Read-only Delta Lake table reader — open-table-format interop from
  * the PUBLIC Delta transaction-log protocol (delta.io PROTOCOL.md): an
  * adopter's existing lake keeps its format and every graft operator
  * runs against it unchanged.
  *
  * What it does:
  *   - parses `_delta_log/NNNN.json` commits and parquet checkpoints
  *     (classic single-file AND multi-part `N.checkpoint.i.of.n`;
  *     `_last_checkpoint` is consulted and validated), replaying
  *     add-file minus remove-file actions into the live file set of the
  *     requested version;
  *   - **distributed state reconstruction**: checkpoint add/remove state
  *     stays a DataFrame — tombstone subtraction is an anti-join, stats
  *     pruning runs as a distributed typed filter, and the driver
  *     collects ONLY the surviving file entries (a millions-of-files
  *     table never materializes its full add set on the driver; the
  *     JSON tail between checkpoints is bounded by the checkpoint
  *     interval and parsed driver-side like every planner does);
  *   - per-file stats (`numRecords`/`minValues`/`maxValues`/`nullCount`)
  *     feed the SAME zone-map machinery SnapshotTable uses
  *     ([[FileStats.mayMatch]]), so `readWhere` opens only files whose
  *     [min,max] can satisfy the predicate;
  *   - partition values come from the add action's `partitionValues`
  *     map — the protocol's authority — NOT directory-name inference;
  *     a hive-layout fast path keeps the single-scan plan when (and
  *     only when) the physical directory names agree with the log;
  *   - column mapping in `name` AND `id` modes (minReaderVersion 2, or
  *     3 with the `columnMapping` feature): physical parquet names are
  *     mapped back to logical schema names at projection time, stats
  *     and partitionValues keys translated; in `id` mode the read
  *     schema carries `parquet.field.id` metadata and Spark resolves
  *     parquet columns by FIELD ID (files written before a rename carry
  *     old names but stable ids — name matching would misread them);
  *   - deletion vectors (minReaderVersion 3 + `deletionVectors`):
  *     inline (`i`), relative-UUID (`u`) and absolute-path (`p`)
  *     descriptors decode per the public DV format (1-byte-version file,
  *     big-endian length-prefixed entries, Z85, portable 64-bit
  *     RoaringBitmapArray), applied as an anti-join on
  *     (file, `_metadata.row_index`);
  *   - time travel via `version` (replays the log prefix).
  *
  *
  * Checkpoint forms: classic single-file, multi-part
  * `N.checkpoint.i.of.n`, AND v2/UUID-named manifests (round 9 —
  * parquet or json, with `sidecar` actions resolving to
  * `_delta_log/_sidecars/` parquet holding the add/remove state; the
  * sidecar scan stays distributed).
  *
  * Non-goals (loudly enforced): NO writes from this object; unknown
  * column-mapping modes and any reader feature outside {columnMapping,
  * deletionVectors, timestampNtz, v2Checkpoint} are refused by name
  * rather than silently misread.
  */
object DeltaRead {
  private val om = new ObjectMapper()

  /** Deletion-vector descriptor of an add action (PROTOCOL.md). */
  private[graft] final case class Dv(storageType: String,
                                     pathOrInlineDv: String, offset: Int,
                                     sizeInBytes: Int, cardinality: Long)

  /** The protocol's DV uniqueId — file actions reconcile by
    * (path, dvUniqueId), NOT path alone: a deleteDv/upsertDv commit
    * removes (path, oldDv) and re-adds (path, newDv) in one commit, and
    * the remove tombstone must SURVIVE that re-add so VACUUM can still
    * see when the superseded deletion_vector_*.bin left the retention
    * window.
    */
  private[graft] def dvUid(d: Dv): String =
    d.storageType + d.pathOrInlineDv + "@" + d.offset

  /** A remove tombstone that carried a DV descriptor: the data path it
    * was attached to, the remove's deletionTimestamp, and the
    * descriptor itself (re-emitted verbatim at checkpoint time).
    */
  private[graft] final case class DvTomb(path: String,
                                         deletionTimestamp: Long, dv: Dv)

  /** One live file: the logged (still percent-encoded) relative path,
    * raw stats json, the add action's partitionValues (physical keys),
    * file size/mtime, and the deletion vector if any.
    */
  private[graft] final case class AddEntry(
    path: String, stats: Option[String],
    partitionValues: Map[String, String], size: Long,
    modificationTime: Long, dv: Option[Dv])

  private implicit lazy val addEnc
      : org.apache.spark.sql.Encoder[AddEntry] =
    org.apache.spark.sql.Encoders.product[AddEntry]

  private[graft] final case class LogState(
    schemaJson: String, partitionCols: Seq[String],
    conf: Map[String, String], metaId: String, createdTime: Long,
    minReaderVersion: Int, minWriterVersion: Int,
    readerFeatures: Seq[String], writerFeatures: Seq[String],
    ckpt: Option[Dataset[AddEntry]],
    // tombstones carried lazily from the base checkpoint as (path,
    // deletionTimestamp, dv) rows — only the checkpoint WRITER evaluates
    // this (unexpired tombstones must survive re-checkpointing for
    // VACUUM and concurrent-reader reconciliation); reads never do
    ckptRemoves: Option[DataFrame],
    tailAdds: Seq[AddEntry],
    // JSON-tail tombstones: path → deletionTimestamp (an add for the
    // same path cancels the tombstone, per log reconciliation)
    tailRemoves: Map[String, Long],
    // JSON-tail DV tombstones keyed by dvUid — NEVER cancelled by a
    // re-add of the same data path (the protocol keys reconciliation by
    // (path, dvUniqueId)); VACUUM gates superseded deletion_vector
    // .bin files on these, and re-checkpointing carries them forward
    tailDvTombs: Map[String, DvTomb],
    txns: Map[String, Long],
    // action keys / checkpoint columns this reader does not model —
    // harmless to READ past (they don't affect the live file set), but
    // a re-CHECKPOINT that dropped them would corrupt table state, so
    // the checkpoint writer refuses when nonEmpty
    unmodeledState: Set[String])

  /** Instrumentation for the scale spec: how many AddEntry rows the
    * last planning call materialized on the driver (readWhere collects
    * survivors only; pruneReport collects none and RESETS this to 0).
    */
  @volatile private[graft] var lastPlannedFiles: Long = -1L

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val CommitName = """(\d{20})\.json""".r
  private val CkptSingle = """(\d{20})\.checkpoint\.parquet""".r
  private val CkptPart = """(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
  // v2 checkpoints are UUID-named manifests (round 9: read, not refused)
  private val CkptV2 = """(\d{20})\.checkpoint\.[0-9a-fA-F-]{36}\.(parquet|json)""".r

  /** Latest committed version of the table (max of commit jsons and any
    * checkpoint form present in the log).
    */
  def latestVersion(spark: SparkSession, path: String): Long = {
    val dir = new Path(path, "_delta_log")
    val f = fs(spark, path)
    require(f.exists(dir), s"$path has no _delta_log — not a Delta table")
    f.listStatus(dir).map(_.getPath.getName).flatMap {
      case CommitName(v)       => Some(v.toLong)
      case CkptSingle(v)       => Some(v.toLong)
      case CkptPart(v, _, _)   => Some(v.toLong)
      case CkptV2(v, _)        => Some(v.toLong)
      case _                   => None
    }.foldLeft(-1L)(math.max)
  }

  /** Declared partition columns (latest metaData action) — the writer's
    * append-compatibility check reads this.
    */
  private[sources] def partitionColumns(spark: SparkSession,
                                        path: String): Seq[String] =
    replay(spark, path, -1L).partitionCols

  private[sources] def minWriterVersion(spark: SparkSession,
                                        path: String): Int =
    replay(spark, path, -1L).minWriterVersion

  /** `_last_checkpoint` content, when present and well-formed. */
  private def lastCheckpointRef(f: org.apache.hadoop.fs.FileSystem,
                                dir: Path): Option[(Long, Option[Int])] = {
    val p = new Path(dir, "_last_checkpoint")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val n = om.readTree(text)
      val v = n.path("version").asLong(-1L)
      if (v < 0) None
      else Some((v, Option(n.get("parts")).filterNot(_.isNull).map(_.asInt())))
    }
  }

  /** Checkpoint candidates visible in the log dir: version → the
    * parquet part files composing that checkpoint (multi-part groups
    * count only when every part is present). `_last_checkpoint` is
    * cross-checked: a reference to files the listing can't see is
    * ignored (stale pointer) rather than failing the read.
    */
  private def checkpointsIn(names: Seq[String], dir: Path)
      : Map[Long, Seq[Path]] = {
    val singles = names.collect { case CkptSingle(v) =>
      v.toLong -> Seq(new Path(dir, f"${v.toLong}%020d.checkpoint.parquet"))
    }.toMap
    val parts = names.collect { case CkptPart(v, i, n) =>
      (v.toLong, n.toInt, i.toInt)
    }
    val multi = parts.groupBy(p => (p._1, p._2)).collect {
      case ((v, n), grp) if grp.map(_._3).distinct.size == n =>
        v -> (1 to n).map(i =>
          new Path(dir, f"$v%020d.checkpoint.$i%010d.$n%010d.parquet"))
    }
    singles ++ multi
  }

  /** v2/UUID-named checkpoint manifests visible in the log dir. When a
    * version has several (allowed: any writer may add one), any single
    * manifest is complete by construction — pick the lexicographic
    * first for determinism.
    */
  private def v2CheckpointsIn(names: Seq[String], dir: Path)
      : Map[Long, Path] =
    names.collect { case n @ CkptV2(v, _) => v.toLong -> n }
      .groupBy(_._1)
      .map { case (v, xs) => v -> new Path(dir, xs.map(_._2).min) }

  /** Snapshot the log at `version` (-1 = latest). */
  private[graft] def replay(spark: SparkSession, path: String,
                            version: Long): LogState = {
    val dir = new Path(path, "_delta_log")
    val f = fs(spark, path)
    require(f.exists(dir), s"$path has no _delta_log — not a Delta table")
    val names = f.listStatus(dir).map(_.getPath.getName).toSeq
    val commits = names.collect { case CommitName(v) => v.toLong }.sorted
    val ckpts = checkpointsIn(names, dir)
    val v2s = v2CheckpointsIn(names, dir)
    val target =
      if (version >= 0) version
      else (commits ++ ckpts.keys ++ v2s.keys).foldLeft(-1L)(math.max)
    require(target >= 0, s"$path: empty _delta_log")

    // newest usable checkpoint at or below the target (classic wins a
    // tie — one file, no sidecar hops). _last_checkpoint is a
    // possibly-stale HINT per the protocol: a reference the listing
    // cannot corroborate (checkpoint cleanup, eventually-consistent
    // listing) is ignored and planning proceeds from the listed
    // checkpoints/commits — never a refusal.
    val hint = lastCheckpointRef(f, dir).map(_._1)
      .filter(v => v <= target && (ckpts.contains(v) || v2s.contains(v)))
    val base = (ckpts.keys.filter(_ <= target) ++
        v2s.keys.filter(_ <= target) ++ hint)
      .toSeq.sorted.lastOption

    var schemaJson: String = null
    var partitionCols: Seq[String] = Nil
    var conf = Map.empty[String, String]
    var metaId = ""
    var createdTime = 0L
    var mrv = 1
    var mwv = 2
    var features: Seq[String] = Nil
    var wFeatures: Seq[String] = Nil
    var ckptDs: Option[Dataset[AddEntry]] = None
    var ckptRm: Option[DataFrame] = None
    val txns = scala.collection.mutable.Map[String, Long]()
    val unmodeled = scala.collection.mutable.Set[String]()

    base.foreach { cv =>
      val (ds, rm, meta, proto, ckptTxns, ckptUnknown) =
        if (ckpts.contains(cv)) loadCheckpoint(spark, ckpts(cv))
        else loadV2Checkpoint(spark, dir, v2s(cv))
      ckptDs = Some(ds)
      ckptRm = rm
      meta.foreach { m =>
        schemaJson = m._1; partitionCols = m._2; conf = m._3
        metaId = m._4; createdTime = m._5
      }
      proto.foreach { p =>
        mrv = p._1; mwv = p._2; features = p._3; wFeatures = p._4
      }
      ckptTxns.foreach { case (app, v) =>
        txns(app) = math.max(v, txns.getOrElse(app, Long.MinValue))
      }
      unmodeled ++= ckptUnknown
    }

    // replay JSON commits after the checkpoint up to the target
    val tailAdds = scala.collection.mutable.LinkedHashMap[String, AddEntry]()
    val tailRemoves = scala.collection.mutable.LinkedHashMap[String, Long]()
    val tailDvTombs = scala.collection.mutable.LinkedHashMap[String, DvTomb]()
    val from = base.map(_ + 1).getOrElse(0L)
    (from to target).foreach { v =>
      val p = new Path(dir, f"$v%020d.json")
      require(f.exists(p),
        s"$path: missing commit $v (log cleaned past requested version?)")
      val in = f.open(p)
      val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      text.split("\n").filter(_.trim.nonEmpty).foreach { line =>
        val n = om.readTree(line)
        if (n.has("protocol")) {
          val pr = n.path("protocol")
          mrv = pr.path("minReaderVersion").asInt(1)
          mwv = pr.path("minWriterVersion").asInt(2)
          features = Option(pr.get("readerFeatures")).filterNot(_.isNull)
            .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
          wFeatures = Option(pr.get("writerFeatures")).filterNot(_.isNull)
            .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
        }
        if (n.has("metaData")) {
          val md = n.path("metaData")
          require(md.path("format").path("provider").asText("parquet")
            .equalsIgnoreCase("parquet"),
            "only parquet-format Delta tables are supported")
          schemaJson = md.path("schemaString").asText()
          partitionCols = md.path("partitionColumns").elements().asScala
            .map(_.asText()).toSeq
          conf = Option(md.get("configuration")).filterNot(_.isNull)
            .map(_.properties().asScala.map(e =>
              e.getKey -> e.getValue.asText()).toMap)
            .getOrElse(Map.empty)
          metaId = md.path("id").asText("")
          createdTime = md.path("createdTime").asLong(0L)
        }
        if (n.has("add")) {
          val a = n.path("add")
          val rel = a.path("path").asText()
          val pv = Option(a.get("partitionValues"))
            .map(_.properties().asScala
              .map(e => e.getKey ->
                (if (e.getValue.isNull) null else e.getValue.asText())).toMap)
            .getOrElse(Map.empty[String, String])
          val dv = Option(a.get("deletionVector")).filterNot(_.isNull)
            .map { d =>
              Dv(d.path("storageType").asText(),
                d.path("pathOrInlineDv").asText(),
                d.path("offset").asInt(0), d.path("sizeInBytes").asInt(0),
                d.path("cardinality").asLong(0L))
            }
          tailAdds(rel) = AddEntry(rel,
            Option(a.get("stats")).filterNot(_.isNull).map(_.asText()), pv,
            a.path("size").asLong(0L), a.path("modificationTime").asLong(0L),
            dv)
          tailRemoves -= rel
        }
        if (n.has("remove")) {
          val rm = n.path("remove")
          val rel = rm.path("path").asText()
          val ts = rm.path("deletionTimestamp").asLong(0L)
          tailAdds -= rel
          tailRemoves(rel) = ts
          // a remove carrying a DV descriptor tombstones the OLD
          // on-disk .bin too — keyed by dvUid so the same-commit re-add
          // of the data path (deleteDv superseding a mask) cannot
          // cancel it; inline ('i') DVs have no file to protect
          Option(rm.get("deletionVector")).filterNot(_.isNull).foreach { d =>
            val dv = Dv(d.path("storageType").asText(),
              d.path("pathOrInlineDv").asText(), d.path("offset").asInt(0),
              d.path("sizeInBytes").asInt(0), d.path("cardinality").asLong(0L))
            if (dv.storageType != "i") {
              val uid = dvUid(dv)
              if (tailDvTombs.get(uid).forall(_.deletionTimestamp <= ts))
                tailDvTombs(uid) = DvTomb(rel, ts, dv)
            }
          }
        }
        if (n.has("txn")) {
          val t = n.path("txn")
          val app = t.path("appId").asText()
          val v = t.path("version").asLong(Long.MinValue)
          if (app.nonEmpty && v != Long.MinValue)
            txns(app) = math.max(v, txns.getOrElse(app, Long.MinValue))
        }
        // state-bearing actions this reader does not model (commitInfo
        // and cdc are non-state / side-channel; everything else unknown
        // is conservatively state)
        n.fieldNames().asScala.foreach {
          case "add" | "remove" | "metaData" | "protocol" | "txn" |
               "commitInfo" | "cdc" => ()
          case other => unmodeled += other
        }
      }
    }
    require(schemaJson != null, s"$path: log carries no metaData action")
    checkProtocol(mrv, features)
    LogState(schemaJson, partitionCols, conf, metaId, createdTime,
      mrv, mwv, features, wFeatures, ckptDs, ckptRm,
      tailAdds.values.toSeq, tailRemoves.toMap, tailDvTombs.toMap,
      txns.toMap, unmodeled.toSet)
  }

  /** Load checkpoint parquet(s) into a standardized Dataset[AddEntry]
    * plus the (≤1-row, collected) metaData and protocol actions and the
    * per-appId txn watermarks (app-count-sized — tiny).
    * Tolerates checkpoints missing optional fields (stats, size,
    * deletionVector, configuration, readerFeatures...).
    */
  /** DV descriptor struct shape shared by add and remove actions. */
  private[graft] val dvStructType: StructType = StructType(Seq(
    StructField("storageType", StringType),
    StructField("pathOrInlineDv", StringType),
    StructField("offset", IntegerType),
    StructField("sizeInBytes", IntegerType),
    StructField("cardinality", LongType)))

  /** Standardized checkpoint tombstone rows: (path, deletionTimestamp,
    * dv) — dv is null for classic path tombstones and carries the
    * superseded descriptor for DV tombstones.
    */
  private val rmRowSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("deletionTimestamp", LongType),
    StructField("dv", dvStructType)))

  private type CkptState =
    (Dataset[AddEntry],
     Option[DataFrame], // lazy (path, deletionTimestamp) tombstones
     Option[(String, Seq[String], Map[String, String], String, Long)],
     Option[(Int, Int, Seq[String], Seq[String])],
     Map[String, Long],
     Set[String])

  private def loadCheckpoint(spark: SparkSession,
                             parts: Seq[Path]): CkptState =
    standardizeCheckpoint(spark,
      spark.read.parquet(parts.map(_.toString): _*))

  /** v2/UUID checkpoint manifest: the top file carries protocol /
    * metaData / txn / checkpointMetadata plus `sidecar` actions naming
    * the `_delta_log/_sidecars/` parquet files that hold the add/remove
    * state (a v2 file MAY also carry adds inline when it has no
    * sidecars). Both forms standardize through the same walker as
    * classic checkpoints; sidecar state unions in distributed.
    */
  private def loadV2Checkpoint(spark: SparkSession, logDir: Path,
                               file: Path): CkptState = {
    val (top, sidecarRels): (CkptState, Seq[String]) =
      if (file.getName.endsWith(".parquet")) {
        val df = spark.read.parquet(file.toString)
        val rels =
          if (!df.schema.fieldNames.contains("sidecar")) Nil
          else df.where(col("sidecar.path").isNotNull)
            .select(col("sidecar.path")).collect()
            .map(_.getString(0)).toSeq
        (standardizeCheckpoint(spark, df), rels)
      } else { // json manifest: KB-sized action lines, driver-parsed
        val f = fs(spark, logDir.toString)
        val in = f.open(file)
        val text = try new String(in.readAllBytes(), "UTF-8")
                   finally in.close()
        jsonCheckpoint(spark, text)
      }
    if (sidecarRels.isEmpty) top
    else {
      val paths = sidecarRels.map { rel =>
        if (rel.startsWith("/") || rel.contains("://")) rel
        else new Path(logDir, s"_sidecars/$rel").toString
      }
      val (scAdds, scRm, _, _, _, scUnknown) =
        standardizeCheckpoint(spark, spark.read.parquet(paths: _*))
      val (a, rm, meta, proto, txns, unk) = top
      val adds = a.unionByName(scAdds)
      // sidecar tombstones also subtract from any top-level adds; a
      // real v2 layout keeps add/remove in sidecars only, so this is
      // belt-and-braces, not a hot path
      val addsFinal = scRm match {
        case Some(r) => subtractRemoves(adds, r)
        case None    => adds
      }
      val removes = (rm, scRm) match {
        case (Some(x), Some(y)) => Some(x.unionByName(y))
        case (x, y)             => x.orElse(y)
      }
      (addsFinal, removes, meta, proto, txns, unk ++ scUnknown)
    }
  }

  /** JSON v2 checkpoint manifest → standardized state + sidecar rels. */
  private def jsonCheckpoint(spark: SparkSession, text: String)
      : (CkptState, Seq[String]) = {
    var meta: Option[(String, Seq[String], Map[String, String], String,
      Long)] = None
    var proto: Option[(Int, Int, Seq[String], Seq[String])] = None
    val adds = scala.collection.mutable.LinkedHashMap[String, AddEntry]()
    val removes = scala.collection.mutable.LinkedHashMap[String, Long]()
    val keyedRemoves =
      scala.collection.mutable.LinkedHashMap[(String, String), (Long, Dv)]()
    val txns = scala.collection.mutable.Map[String, Long]()
    val unknown = scala.collection.mutable.Set[String]()
    val sidecars = scala.collection.mutable.Buffer[String]()
    text.split("\n").filter(_.trim.nonEmpty).foreach { line =>
      val n = om.readTree(line)
      if (n.has("metaData")) {
        val md = n.path("metaData")
        meta = Some((md.path("schemaString").asText(),
          md.path("partitionColumns").elements().asScala
            .map(_.asText()).toSeq,
          Option(md.get("configuration")).filterNot(_.isNull)
            .map(_.properties().asScala.map(e =>
              e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty),
          md.path("id").asText(""), md.path("createdTime").asLong(0L)))
      }
      if (n.has("protocol")) {
        val pr = n.path("protocol")
        def arr(k: String) = Option(pr.get(k)).filterNot(_.isNull)
          .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
        proto = Some((pr.path("minReaderVersion").asInt(1),
          pr.path("minWriterVersion").asInt(2),
          arr("readerFeatures"), arr("writerFeatures")))
      }
      if (n.has("add")) {
        val a = n.path("add")
        val rel = a.path("path").asText()
        val pv = Option(a.get("partitionValues"))
          .map(_.properties().asScala.map(e => e.getKey ->
            (if (e.getValue.isNull) null else e.getValue.asText())).toMap)
          .getOrElse(Map.empty[String, String])
        val dv = Option(a.get("deletionVector")).filterNot(_.isNull)
          .map(d => Dv(d.path("storageType").asText(),
            d.path("pathOrInlineDv").asText(), d.path("offset").asInt(0),
            d.path("sizeInBytes").asInt(0),
            d.path("cardinality").asLong(0L)))
        adds(rel) = AddEntry(rel,
          Option(a.get("stats")).filterNot(_.isNull).map(_.asText()), pv,
          a.path("size").asLong(0L),
          a.path("modificationTime").asLong(0L), dv)
      }
      if (n.has("remove")) {
        val r = n.path("remove")
        val rel = r.path("path").asText()
        val ts = r.path("deletionTimestamp").asLong(0L)
        val dv = Option(r.get("deletionVector")).filterNot(_.isNull)
          .map(d => Dv(d.path("storageType").asText(),
            d.path("pathOrInlineDv").asText(), d.path("offset").asInt(0),
            d.path("sizeInBytes").asInt(0), d.path("cardinality").asLong(0L)))
        dv match {
          case Some(d) => keyedRemoves((rel, dvUid(d))) = (ts, d)
          case None    => removes(rel) = ts
        }
      }
      if (n.has("txn")) {
        val t = n.path("txn")
        val app = t.path("appId").asText()
        val v = t.path("version").asLong(Long.MinValue)
        if (app.nonEmpty && v != Long.MinValue)
          txns(app) = math.max(v, txns.getOrElse(app, Long.MinValue))
      }
      if (n.has("sidecar")) sidecars += n.path("sidecar").path("path").asText()
      n.fieldNames().asScala.foreach {
        case "add" | "remove" | "metaData" | "protocol" | "txn" |
             "commitInfo" | "cdc" | "checkpointMetadata" | "sidecar" => ()
        case other => unknown += other
      }
    }
    val live = adds.filterNot { case (p, a) =>
      removes.contains(p) ||
        a.dv.exists(d => keyedRemoves.contains((p, dvUid(d))))
    }.values.toSeq
    val rmDf =
      if (removes.isEmpty && keyedRemoves.isEmpty) None
      else {
        import org.apache.spark.sql.Row
        val rows: Seq[Row] =
          removes.toSeq.map { case (p, ts) => Row(p, ts, null) } ++
          keyedRemoves.toSeq.map { case ((p, _), (ts, d)) =>
            Row(p, ts, Row(d.storageType, d.pathOrInlineDv, d.offset,
              d.sizeInBytes, d.cardinality))
          }
        Some(spark.createDataFrame(
          new java.util.ArrayList[Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          rmRowSchema))
      }
    ((spark.createDataset(live), rmDf, meta, proto, txns.toMap,
      unknown.toSet), sidecars.toSeq)
  }

  /** Subtract checkpoint remove rows from add rows with the protocol's
    * reconciliation key: a remove WITHOUT a DV descriptor tombstones
    * every add of its path (the classic shape), while a remove CARRYING
    * one tombstones only the add with the same (path, dvUniqueId) — so
    * a superseded-DV tombstone rides the checkpoint next to the live
    * re-add of the same data path without killing it.
    */
  private def subtractRemoves(adds: Dataset[AddEntry],
                              rm: DataFrame): Dataset[AddEntry] = {
    val wild = rm.where(col("dv").isNull).select("path")
    val keyed = rm.where(col("dv").isNotNull)
      .select(col("path"), concat(col("dv.storageType"),
        col("dv.pathOrInlineDv"), lit("@"),
        col("dv.offset").cast("string")).as("_uid"))
    val addUid = when(col("dv").isNull, lit(""))
      .otherwise(concat(col("dv.storageType"), col("dv.pathOrInlineDv"),
        lit("@"), col("dv.offset").cast("string")))
    adds.join(wild, Seq("path"), "left_anti")
      .withColumn("_uid", addUid)
      .join(keyed, Seq("path", "_uid"), "left_anti")
      .drop("_uid").as[AddEntry]
  }

  private def standardizeCheckpoint(spark: SparkSession,
                                    df: DataFrame): CkptState = {
    val sch = df.schema
    def has(dotted: String): Boolean =
      dotted.split('.').foldLeft(Option(sch: DataType)) {
        case (Some(s: StructType), n) => s.fields.find(_.name == n).map(_.dataType)
        case _                        => None
      }.isDefined

    val dvType = "struct<storageType:string,pathOrInlineDv:string," +
      "offset:int,sizeInBytes:int,cardinality:bigint>"
    val dvCol =
      if (!has("add.deletionVector.storageType"))
        expr(s"CAST(NULL AS $dvType)")
      else when(col("add.deletionVector").isNull,
          expr(s"CAST(NULL AS $dvType)"))
        .otherwise(struct(
          col("add.deletionVector.storageType").as("storageType"),
          col("add.deletionVector.pathOrInlineDv").as("pathOrInlineDv"),
          coalesce(col("add.deletionVector.offset"), lit(0))
            .cast("int").as("offset"),
          col("add.deletionVector.sizeInBytes").cast("int").as("sizeInBytes"),
          col("add.deletionVector.cardinality").cast("long").as("cardinality")))
    val statsCol =
      if (has("add.stats")) col("add.stats") else lit(null).cast("string")
    val pvCol =
      if (has("add.partitionValues"))
        coalesce(col("add.partitionValues")
          .cast(MapType(StringType, StringType)),
          expr("CAST(map() AS map<string,string>)"))
      else expr("CAST(map() AS map<string,string>)")
    val sizeCol =
      if (has("add.size")) coalesce(col("add.size").cast("long"), lit(0L))
      else lit(0L)
    val modCol =
      if (has("add.modificationTime"))
        coalesce(col("add.modificationTime").cast("long"), lit(0L))
      else lit(0L)

    var adds: Dataset[AddEntry] =
      if (!has("add.path")) spark.emptyDataset[AddEntry]
      else df.where(col("add.path").isNotNull)
        .select(col("add.path").as("path"), statsCol.as("stats"),
          pvCol.as("partitionValues"), sizeCol.as("size"),
          modCol.as("modificationTime"), dvCol.as("dv"))
        .as[AddEntry]
    // tombstones in the checkpoint subtract distributed (anti-join) —
    // a reconciled checkpoint never adds AND removes the same path, but
    // external writers carry unexpired remove tombstones for VACUUM
    // bookkeeping; they also flow back out (lazily) so a re-checkpoint
    // never silently drops them
    val rmDvCol =
      if (!has("remove.deletionVector.storageType"))
        expr(s"CAST(NULL AS $dvType)")
      else when(col("remove.deletionVector").isNull,
          expr(s"CAST(NULL AS $dvType)"))
        .otherwise(struct(
          col("remove.deletionVector.storageType").as("storageType"),
          col("remove.deletionVector.pathOrInlineDv").as("pathOrInlineDv"),
          coalesce(col("remove.deletionVector.offset"), lit(0))
            .cast("int").as("offset"),
          col("remove.deletionVector.sizeInBytes").cast("int")
            .as("sizeInBytes"),
          col("remove.deletionVector.cardinality").cast("long")
            .as("cardinality")))
    val removes: Option[DataFrame] =
      if (!has("remove.path")) None
      else Some(df.where(col("remove.path").isNotNull)
        .select(col("remove.path").as("path"),
          (if (has("remove.deletionTimestamp"))
             coalesce(col("remove.deletionTimestamp").cast("long"), lit(0L))
           else lit(0L)).as("deletionTimestamp"),
          rmDvCol.as("dv")))
    removes.foreach { rm => adds = subtractRemoves(adds, rm) }

    val meta =
      if (!has("metaData.schemaString")) None
      else {
        val cols = Seq(
          col("metaData.schemaString"),
          if (has("metaData.partitionColumns"))
            col("metaData.partitionColumns")
          else expr("CAST(array() AS array<string>)"),
          if (has("metaData.configuration"))
            coalesce(col("metaData.configuration")
              .cast(MapType(StringType, StringType)),
              expr("CAST(map() AS map<string,string>)"))
          else expr("CAST(map() AS map<string,string>)"),
          if (has("metaData.id")) coalesce(col("metaData.id"), lit(""))
          else lit(""),
          if (has("metaData.createdTime"))
            coalesce(col("metaData.createdTime").cast("long"), lit(0L))
          else lit(0L))
        df.where(col("metaData.schemaString").isNotNull).select(cols: _*)
          .collect().lastOption.map { r =>
            (r.getString(0),
              Option(r.getSeq[String](1)).map(_.toSeq).getOrElse(Nil),
              Option(r.getMap[String, String](2)).map(_.toMap)
                .getOrElse(Map.empty),
              r.getString(3), r.getLong(4))
          }
      }
    val proto =
      if (!has("protocol.minReaderVersion")) None
      else {
        def arr(name: String) =
          if (has(s"protocol.$name"))
            coalesce(col(s"protocol.$name"),
              expr("CAST(array() AS array<string>)"))
          else expr("CAST(array() AS array<string>)")
        val cols = Seq(
          col("protocol.minReaderVersion"),
          if (has("protocol.minWriterVersion"))
            coalesce(col("protocol.minWriterVersion"), lit(2))
          else lit(2),
          arr("readerFeatures"), arr("writerFeatures"))
        df.where(col("protocol.minReaderVersion").isNotNull).select(cols: _*)
          .collect().lastOption.map { r =>
            (r.getInt(0), r.getInt(1),
              Option(r.getSeq[String](2)).map(_.toSeq).getOrElse(Nil),
              Option(r.getSeq[String](3)).map(_.toSeq).getOrElse(Nil))
          }
      }
    val txns: Map[String, Long] =
      if (!has("txn.appId")) Map.empty
      else df.where(col("txn.appId").isNotNull)
        .groupBy(col("txn.appId").as("app"))
        .agg(max(col("txn.version").cast("long")).as("v"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // top-level checkpoint columns this reader does not model: their
    // rows are table state a re-checkpoint must not drop
    val known = Set("add", "remove", "metaData", "protocol", "txn",
      "commitInfo", "cdc", "checkpointMetadata", "sidecar")
    val unknownCols = sch.fieldNames.toSet -- known
    val unknownWithRows = unknownCols.filter { c =>
      sch(c).dataType.isInstanceOf[StructType] &&
        df.where(col(c).isNotNull).limit(1).count() > 0
    }
    (adds, removes, meta, proto, txns, unknownWithRows)
  }

  private[graft] val SupportedFeatures =
    Set("columnMapping", "deletionVectors", "timestampNtz", "v2Checkpoint")

  private def checkProtocol(mrv: Int, features: Seq[String]): Unit = {
    if (mrv <= 2) () // 2 = column mapping; the mode gate runs at read
    else if (mrv == 3) {
      val unknown = features.filterNot(SupportedFeatures)
      require(unknown.isEmpty,
        s"unsupported Delta reader features: ${unknown.mkString(", ")} — " +
          s"this reader supports ${SupportedFeatures.mkString("/")} only, " +
          "refusing rather than misreading")
    } else throw new IllegalArgumentException(
      s"Delta table requires reader version $mrv — unknown to this " +
        "reader, refusing rather than misreading")
  }

  /** Column-mapping state: logical top-level name → the key stats and
    * partitionValues are recorded under. In BOTH `name` and `id` modes
    * the protocol records stats/partitionValues under the PHYSICAL name
    * (id mode also assigns physical names; the field id governs parquet
    * column RESOLUTION, not the log keys); identity otherwise.
    */
  private def statsKeyOf(st: LogState, schema: StructType)
      : Map[String, String] =
    st.conf.get("delta.columnMapping.mode") match {
      case Some("name") | Some("id") =>
        schema.fields.map(f => f.name -> physName(f)).toMap
      case Some(other) if other != "none" =>
        throw new IllegalArgumentException(
          s"delta.columnMapping.mode=$other unknown to this reader — " +
            "refusing rather than misreading")
      case _ => schema.fieldNames.map(n => n -> n).toMap
    }

  private def mapped(st: LogState): Boolean = {
    val m = st.conf.get("delta.columnMapping.mode")
    m.contains("name") || m.contains("id")
  }

  /** `id` mode: parquet columns resolve by FIELD ID (a file written
    * before a rename carries old names but stable ids), so the read
    * schema must carry `parquet.field.id` metadata and Spark's
    * field-id resolution must be on.
    */
  private def idMode(st: LogState): Boolean =
    st.conf.get("delta.columnMapping.mode").contains("id")

  private def physName(f: StructField): String =
    if (f.metadata.contains("delta.columnMapping.physicalName"))
      f.metadata.getString("delta.columnMapping.physicalName")
    else f.name

  /** Recursively rename a logical type to physical parquet names; with
    * `withIds` each field also carries its `delta.columnMapping.id` as
    * `parquet.field.id` metadata, which is what Spark's parquet reader
    * keys field-id resolution on.
    */
  private def toPhysical(dt: DataType, withIds: Boolean): DataType =
    dt match {
      case s: StructType => StructType(s.fields.map(physField(_, withIds)))
      case a: ArrayType =>
        a.copy(elementType = toPhysical(a.elementType, withIds))
      case m: MapType =>
        m.copy(keyType = toPhysical(m.keyType, withIds),
          valueType = toPhysical(m.valueType, withIds))
      case o => o
    }

  private def physField(f: StructField, withIds: Boolean): StructField = {
    val meta =
      if (withIds && f.metadata.contains("delta.columnMapping.id"))
        new MetadataBuilder().putLong("parquet.field.id",
          f.metadata.getLong("delta.columnMapping.id")).build()
      else Metadata.empty
    StructField(physName(f), toPhysical(f.dataType, withIds),
      f.nullable, meta)
  }

  private[sources] def schemaOf(st: LogState): StructType =
    DataType.fromJson(st.schemaJson).asInstanceOf[StructType]

  /** Zone-map stats of one live entry in FileStats form — the writer's
    * copy-on-write planner prunes its rewrite candidates through this.
    */
  private[sources] def entryStats(st: LogState, schema: StructType,
                                  a: AddEntry)
      : Map[String, FileStats.ColStat] =
    colStats(st, schema, statsKeyOf(st, schema), a)

  /** Live entries at the snapshot, optionally stats-pruned. The
    * checkpoint part prunes DISTRIBUTED and only survivors reach the
    * driver; the JSON tail (bounded by the checkpoint interval) prunes
    * driver-side.
    */
  private def liveEntries(st: LogState, pred: Option[
      org.apache.spark.sql.catalyst.expressions.Expression]): Seq[AddEntry] = {
    val schema = schemaOf(st)
    val sk = statsKeyOf(st, schema)
    val tailKeys = st.tailAdds.map(_.path).toSet
    val rm = st.tailRemoves.keySet
    val fromCkpt = st.ckpt.map { ds =>
      val live = ds.filter(a =>
        !rm.contains(a.path) && !tailKeys.contains(a.path))
      val pruned = pred match {
        case Some(p) =>
          live.filter(a => FileStats.mayMatch(p, colStats(st, schema, sk, a)))
        case None => live
      }
      pruned.collect().toSeq
    }.getOrElse(Nil)
    val fromTail = st.tailAdds.filter(a =>
      pred.forall(p => FileStats.mayMatch(p, colStats(st, schema, sk, a))))
    lastPlannedFiles = fromCkpt.size.toLong + fromTail.size.toLong
    fromCkpt ++ fromTail
  }

  /** The table as a DataFrame at `version` (-1 = latest). Column order
    * follows the Delta schema; partition values come from the add
    * actions (protocol authority).
    */
  def read(spark: SparkSession, path: String, version: Long = -1L)
      : DataFrame = {
    val st = replay(spark, path, version)
    assemble(spark, path, st, liveEntries(st, None))
  }

  /** Pruned read: only files whose Delta stats can satisfy `predicate`
    * are opened (files without usable stats are always kept). The
    * predicate is re-applied after the scan, so the result equals
    * `read(...).filter(predicate)` exactly.
    */
  def readWhere(spark: SparkSession, path: String, predicate: String,
                version: Long = -1L): DataFrame = {
    val st = replay(spark, path, version)
    val pred = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(predicate)
    assemble(spark, path, st, liveEntries(st, Some(pred)))
      .filter(expr(predicate))
  }

  /** (total live files, files a predicate would open) — computed as
    * distributed counts; no AddEntry reaches the driver.
    */
  def pruneReport(spark: SparkSession, path: String, predicate: String,
                  version: Long = -1L): (Int, Int) = {
    lastPlannedFiles = 0L
    val st = replay(spark, path, version)
    val schema = schemaOf(st)
    val sk = statsKeyOf(st, schema)
    val pred = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(predicate)
    val tailKeys = st.tailAdds.map(_.path).toSet
    val rm = st.tailRemoves.keySet
    val (ckptTotal, ckptKept) = st.ckpt.map { ds =>
      val live = ds.filter(a =>
        !rm.contains(a.path) && !tailKeys.contains(a.path))
      (live.count(),
        live.filter(a => FileStats.mayMatch(pred, colStats(st, schema, sk, a)))
          .count())
    }.getOrElse((0L, 0L))
    val tailKept = st.tailAdds.count(a =>
      FileStats.mayMatch(pred, colStats(st, schema, sk, a)))
    ((ckptTotal + st.tailAdds.size).toInt, (ckptKept + tailKept).toInt)
  }

  /** Row-level change feed between two versions — a PER-COMMIT walk
    * with the protocol's CDF semantics:
    *
    *   - a commit carrying `cdc` actions serves EXACTLY its
    *     `_change_data` rows (`_change_type` of delete /
    *     update_preimage / update_postimage / insert) — the minimal
    *     row diff the writer materialized (see
    *     `delta.enableChangeDataFeed` in [[DeltaWrite]]);
    *   - a commit without cdc derives: rows of files removed (or
    *     replaced by a re-add) with `dataChange=true` surface as
    *     `'delete'` — assembled with the file's PRE-state deletion
    *     vector, so a masked row never surfaces — and rows of added
    *     files as `'insert'` (file granularity: a COW rewrite without
    *     CDF surfaces its unchanged rows as delete+insert pairs);
    *   - `dataChange=false` reorganizations (OPTIMIZE, checkpoints)
    *     produce nothing.
    *
    * Every row carries `_change_type` and `_commit_version`.
    * Replay-exact as multiset algebra: read(fromV) minus
    * deletes/preimages plus inserts/postimages == read(toV). Scans
    * ONLY changed/cdc files — the 100 TB shape; a whole-table diff
    * never runs. Refused across a schema-evolution boundary and past
    * cleaned commits (a checkpoint cannot reconstruct per-commit
    * diffs).
    *
    * SPAN CONTRACT: the walk reads each commit JSON in (fromV, toV] on
    * the driver — bounded by the version span, the budget any
    * per-commit reader spends, but an accidental 100k-commit replay
    * request would serialize there. Spans above
    * `graft.delta.changes.maxSpan` (default 10 000 commits) refuse
    * loudly; a polling consumer chunks the walk ([from, from+span],
    * then advance) — the feed is per-commit, so chunked reads
    * concatenate to exactly the full feed.
    */
  def changes(spark: SparkSession, path: String, fromV: Long,
              toV: Long): DataFrame = {
    require(fromV <= toV, s"changes: fromV $fromV > toV $toV")
    val maxSpan = spark.conf.getOption("graft.delta.changes.maxSpan")
      .map(_.toLong).getOrElse(10000L)
    require(toV - fromV <= maxSpan,
      s"changes: span ${toV - fromV} commits exceeds " +
        s"graft.delta.changes.maxSpan=$maxSpan — the per-commit walk " +
        "reads each commit JSON on the driver, so an unbounded replay " +
        "would serialize there; chunk the walk (feeds concatenate " +
        "exactly) or raise the conf")
    val st0 = replay(spark, path, fromV)
    val schema = schemaOf(st0)
    val feedSchema = StructType(schema.fields :+
      StructField("_change_type", StringType))
    val dir = new Path(path, "_delta_log")
    val f = fs(spark, path)
    // read the range's commits ONCE (driver; bounded by the version
    // span, the budget any per-commit reader spends)
    val commitsText: Seq[(Long, Seq[String])] =
      (fromV + 1 to toV).map { v =>
        val p = new Path(dir, f"$v%020d.json")
        require(f.exists(p),
          s"$path: commit $v missing (log cleaned?) — per-commit changes " +
            "cannot be reconstructed from a checkpoint, refusing")
        val in = f.open(p)
        val text = try new String(in.readAllBytes(), "UTF-8")
                   finally in.close()
        v -> text.split("\n").filter(_.trim.nonEmpty).toSeq
      }
    // pre-state seeding stays BOUNDED: only paths the range actually
    // removes (or re-adds) need their fromV entry — resolved from the
    // tail driver-side and from the checkpoint via a DISTRIBUTED filter
    // (a million-file snapshot never materializes for a change feed)
    val touched: Set[String] = commitsText.flatMap { case (_, lines) =>
      lines.flatMap { line =>
        val n = om.readTree(line)
        val rm = if (n.has("remove"))
          Some(n.path("remove").path("path").asText()) else None
        val ad = if (n.has("add"))
          Some(n.path("add").path("path").asText()) else None
        rm ++ ad
      }
    }.toSet
    val state = scala.collection.mutable.Map[String, AddEntry]()
    val tailKeys = st0.tailAdds.map(_.path).toSet
    val rm0 = st0.tailRemoves.keySet
    st0.ckpt.foreach { ds =>
      ds.filter(a => touched.contains(a.path) && !rm0.contains(a.path) &&
          !tailKeys.contains(a.path))
        .collect().foreach(a => state(a.path) = a)
    }
    st0.tailAdds.filter(a => touched.contains(a.path))
      .foreach(a => state(a.path) = a)
    val parts = scala.collection.mutable.Buffer[DataFrame]()
    // DV-free insert adds pool across the WHOLE range into one scan:
    // a streaming table's thousand append commits would otherwise
    // union a thousand single-file branches and the feed's PLAN
    // dominates wall time (measured at 1k commits: 86s planned
    // per-commit vs seconds pooled); the per-file commit version
    // re-attaches via a broadcast basename→version map
    val pooledIns = scala.collection.mutable.Buffer[(AddEntry, Long)]()
    val outCols = schema.fieldNames.toSeq.map(col) ++
      Seq(col("_change_type"), col("_commit_version"))
    def tag(df: DataFrame, v: Long): DataFrame =
      df.withColumn("_commit_version", lit(v)).select(outCols: _*)
    commitsText.foreach { case (v, lines) =>
      val cdcEntries = scala.collection.mutable.Buffer[AddEntry]()
      val dels = scala.collection.mutable.Buffer[AddEntry]()
      val ins = scala.collection.mutable.Buffer[AddEntry]()
      lines.foreach { line =>
        val n = om.readTree(line)
        if (n.has("metaData"))
          require(n.path("metaData").path("schemaString").asText()
              == st0.schemaJson,
            s"$path: schema changed at v$v — a change feed across an " +
              "evolution boundary is refused (the sides would not " +
              "union soundly)")
        if (n.has("cdc")) {
          val c = n.path("cdc")
          val pv = Option(c.get("partitionValues"))
            .map(_.properties().asScala.map(e => e.getKey ->
              (if (e.getValue.isNull) null else e.getValue.asText())).toMap)
            .getOrElse(Map.empty[String, String])
          cdcEntries += AddEntry(c.path("path").asText(), None, pv,
            c.path("size").asLong(0L), 0L, None)
        }
        if (n.has("add")) {
          val a = n.path("add")
          val rel = a.path("path").asText()
          val dataChange = a.path("dataChange").asBoolean(true)
          val pv = Option(a.get("partitionValues"))
            .map(_.properties().asScala.map(e => e.getKey ->
              (if (e.getValue.isNull) null else e.getValue.asText())).toMap)
            .getOrElse(Map.empty[String, String])
          val dv = Option(a.get("deletionVector")).filterNot(_.isNull)
            .map { d =>
              Dv(d.path("storageType").asText(),
                d.path("pathOrInlineDv").asText(),
                d.path("offset").asInt(0), d.path("sizeInBytes").asInt(0),
                d.path("cardinality").asLong(0L))
            }
          val entry = AddEntry(rel,
            Option(a.get("stats")).filterNot(_.isNull).map(_.asText()), pv,
            a.path("size").asLong(0L),
            a.path("modificationTime").asLong(0L), dv)
          if (dataChange) {
            // a re-add REPLACES the previous entry (protocol
            // reconciliation — the DV-update pattern): its old visible
            // rows are deletes, its new visible rows inserts
            state.get(rel).foreach(old => dels += old)
            ins += entry
          }
          state(rel) = entry
        }
        if (n.has("remove")) {
          val r = n.path("remove")
          val rel = r.path("path").asText()
          val dataChange = r.path("dataChange").asBoolean(true)
          state.remove(rel).foreach(old => if (dataChange) dels += old)
        }
      }
      if (cdcEntries.nonEmpty)
        parts += tag(scan(spark, path, st0, feedSchema, cdcEntries.toSeq,
          withMeta = false), v)
      else {
        if (dels.nonEmpty)
          parts += tag(assemble(spark, path, st0, dels.toSeq)
            .withColumn("_change_type", lit("delete")), v)
        if (ins.nonEmpty) {
          val (dvIns, plainIns) =
            ins.partition(_.dv.exists(_.cardinality > 0L))
          if (dvIns.nonEmpty) // DV-masked re-adds stay per-commit
            parts += tag(assemble(spark, path, st0, dvIns.toSeq)
              .withColumn("_change_type", lit("insert")), v)
          pooledIns ++= plainIns.map(_ -> v)
        }
      }
    }
    if (pooledIns.nonEmpty) {
      def base(p: String) = PathCodec.percentDecode(p.split("/").last)
      // the scan's per-file identity is the percent-decoded BASENAME —
      // a (rare) collision across partition dirs falls back to
      // per-version batches rather than misattributing versions
      if (pooledIns.map(e => base(e._1.path)).distinct.size
          != pooledIns.size)
        pooledIns.groupBy(_._2).toSeq.sortBy(_._1).foreach {
          case (v, es) =>
            parts += tag(assemble(spark, path, st0, es.map(_._1).toSeq)
              .withColumn("_change_type", lit("insert")), v)
        }
      else {
        import spark.implicits._
        val vmap = broadcast(pooledIns.toSeq
          .map { case (e, v) => (base(e.path), v) }
          .toDF(FKey, "_commit_version"))
        parts += scan(spark, path, st0, schema,
            pooledIns.map(_._1).toSeq, withMeta = true)
          .join(vmap, Seq(FKey))
          .withColumn("_change_type", lit("insert"))
          .select(outCols: _*)
      }
    }
    if (parts.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(feedSchema.fields :+
          StructField("_commit_version", LongType, nullable = false)))
    else parts.reduce(_ unionByName _)
  }

  /** Full live state for the writer's checkpoint pass (the one caller
    * that legitimately materializes every entry — a checkpoint IS the
    * materialized state).
    */
  private[sources] def checkpointState(spark: SparkSession, path: String,
                                       version: Long)
      : (LogState, Seq[AddEntry]) = {
    val st = replay(spark, path, version)
    (st, liveEntries(st, None))
  }

  // ------------------------------------------------------------------
  // assembly
  // ------------------------------------------------------------------

  private[sources] val FKey = "__graft_dv_file"
  private[sources] val RIdx = "__graft_dv_ridx"

  private lazy val decodeBasename =
    udf((p: String) => PathCodec.percentDecode(p.split("/").last))

  private[sources] def assemble(spark: SparkSession, path: String,
                                st: LogState,
                                files: Seq[AddEntry]): DataFrame = {
    val schema = schemaOf(st)
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(schema.fields.map(f =>
          StructField(f.name, f.dataType, f.nullable))))
    val (plain, dvd) = files.partition(_.dv.forall(_.cardinality == 0L))
    val parts = Seq(
      if (plain.nonEmpty) Some(scan(spark, path, st, schema, plain,
        withMeta = false)) else None,
      if (dvd.nonEmpty) Some(applyDvs(spark, path, st, schema, dvd))
      else None).flatten
    parts.reduce(_ unionByName _)
  }

  /** One scan over `files` projected to the logical schema. Three
    * shapes, in preference order:
    *   1. unpartitioned: single scan with the (physical) data schema;
    *   2. hive-consistent layout, no column mapping: single scan with
    *      basePath — Spark derives partition columns from the dirs the
    *      log AGREES with (checked file-by-file), declared types cast;
    *   3. authority fallback: files grouped by their add action's
    *      partitionValues; each group scans data columns and attaches
    *      the logged values as typed literals (handles non-hive
    *      layouts, value/dir disagreement, NULL values, column
    *      mapping). Group count is bounded by the partition count of
    *      the SURVIVING file set — the same cardinality any
    *      partition-pruned plan carries.
    */
  private[sources] def scan(spark: SparkSession, path: String,
                            st: LogState, schema: StructType,
                            files: Seq[AddEntry],
                            withMeta: Boolean): DataFrame = {
    val partCols = st.partitionCols
    val isMapped = mapped(st)
    val withIds = idMode(st)
    // field-id resolution is a session conf (no per-read option exists);
    // it only affects read schemas that CARRY parquet.field.id metadata
    // — i.e. exactly the schemas this branch builds — so leaving it
    // enabled is inert for every other read in the session
    if (withIds)
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val sk = statsKeyOf(st, schema)
    val dataFields = schema.fields.filterNot(f => partCols.contains(f.name))
    val physDataSchema = StructType(dataFields.map(f =>
      if (isMapped) physField(f, withIds)
      else StructField(f.name, toPhysical(f.dataType, withIds = false),
        f.nullable)))
    def dataSelect = dataFields.map(f =>
      col(if (isMapped) physName(f) else f.name)
        .cast(f.dataType).as(f.name)).toSeq
    // _metadata.file_path is URI-encoded (SparkPath) — decode the
    // basename so it equals the percent-decoded logged name the delete
    // side keys on. A UDF only ever runs on the DV exception path.
    def metaSelect =
      if (!withMeta) Nil
      else Seq(decodeBasename(col("_metadata.file_path")).as(FKey),
        col("_metadata.row_index").as(RIdx))

    if (partCols.isEmpty) {
      val paths = files.map(a => s"$path/${PathCodec.percentDecode(a.path)}")
      spark.read.schema(physDataSchema).parquet(paths: _*)
        .select(dataSelect ++ metaSelect: _*)
    } else if (!isMapped && layoutConsistent(files, partCols)) {
      val paths = files.map(a => s"$path/${PathCodec.percentDecode(a.path)}")
      val full = StructType(schema.fields.map(f =>
        StructField(f.name, f.dataType, f.nullable)))
      spark.read.option("basePath", path).schema(full).parquet(paths: _*)
        .select(schema.fields.toSeq.map(f =>
          col(f.name): org.apache.spark.sql.Column) ++ metaSelect: _*)
    } else {
      val ordered = schema.fieldNames.toSeq.map(col) ++
        (if (withMeta) Seq(col(FKey), col(RIdx)) else Nil)
      val groups = files.groupBy(a =>
        partCols.map(c => a.partitionValues.get(sk(c)).orNull))
      val scans = groups.toSeq.sortBy(_._1.map(String.valueOf).mkString("/")).map {
        case (pvals, grp) =>
          val paths = grp.map(a => s"$path/${PathCodec.percentDecode(a.path)}")
          val base = spark.read.schema(physDataSchema).parquet(paths: _*)
          val partSelect = partCols.zip(pvals).map { case (c, v) =>
            (if (v == null) lit(null) else lit(v))
              .cast(schema(c).dataType).as(c)
          }
          base.select(dataSelect ++ partSelect ++ metaSelect: _*)
            .select(ordered: _*)
      }
      scans.reduce(_ unionByName _)
    }
  }

  /** True iff every file's physical directory layout textually agrees
    * with its add action's partitionValues — the precondition for the
    * single-scan basePath fast path.
    */
  private def layoutConsistent(files: Seq[AddEntry],
                               partCols: Seq[String]): Boolean =
    files.forall { a =>
      val segs = PathCodec.percentDecode(a.path).split("/").dropRight(1)
      segs.length == partCols.length &&
        segs.zip(partCols).forall { case (seg, c) =>
          val i = seg.indexOf('=')
          i > 0 && seg.take(i) == c && {
            val v = PathCodec.percentDecode(seg.drop(i + 1))
            a.partitionValues.get(c).contains(v)
          }
        }
    }

  // ------------------------------------------------------------------
  // deletion vectors
  // ------------------------------------------------------------------

  /** Scan files that carry deletion vectors and anti-join the deleted
    * (file, row_index) pairs.
    *
    * Scale shape: the driver reads only the COMPRESSED bitmap bytes of
    * each descriptor (bounded by `sizeInBytes` — KBs/MBs even for
    * hundreds of millions of deleted rows); the positions themselves
    * decode on EXECUTORS via a flatMap over (fileKey, bytes), so a
    * heavily-deleted table never materializes its delete set on the
    * driver. The anti-join side carries no broadcast hint — AQE
    * broadcasts it when it is actually small.
    *
    * Join-key discipline: `_metadata.file_path` is URI-ENCODED by Spark
    * (a disk file `f name.parquet` surfaces as `f%20name.parquet`), so
    * the scan side percent-decodes its basename before joining — the
    * delete side keys on the percent-DECODED logged basename (Delta
    * file names are UUID-unique table-wide). If an external table ever
    * collides basenames, each file scans tagged with its full relative
    * path as a literal instead (no string surgery at all).
    */
  private def applyDvs(spark: SparkSession, path: String, st: LogState,
                       schema: StructType, dvd: Seq[AddEntry]): DataFrame = {
    def basename(a: AddEntry): String =
      PathCodec.percentDecode(a.path).split("/").last
    val collide = dvd.map(basename).distinct.size != dvd.size
    val keyedBytes: Seq[(String, Array[Byte])] = dvd.map { a =>
      val key = if (collide) PathCodec.percentDecode(a.path) else basename(a)
      key -> dvBytes(spark, path, a.dv.get)
    }
    import spark.implicits._
    val delDf = spark.createDataset(keyedBytes)
      .flatMap { case (k, bytes) => roaringPositions(bytes).map(p => (k, p)) }
      .toDF(FKey, RIdx)
    val scanned =
      if (!collide) scan(spark, path, st, schema, dvd, withMeta = true)
      else dvd.map { a =>
        scan(spark, path, st, schema, Seq(a), withMeta = true)
          .withColumn(FKey, lit(PathCodec.percentDecode(a.path)))
      }.reduce(_ unionByName _)
    scanned.join(delDf, Seq(FKey, RIdx), "left_anti")
      .drop(FKey, RIdx)
      .select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** The raw (compressed-bitmap) bytes of one DV descriptor, per the
    * public DV format. Driver-side but bounded by the descriptor's
    * `sizeInBytes` — decode to positions happens on executors.
    */
  private[graft] def dvBytes(spark: SparkSession, tablePath: String,
                             dv: Dv): Array[Byte] = dv.storageType match {
    case "i" => PathCodec.z85Decode(dv.pathOrInlineDv).take(dv.sizeInBytes)
    case "u" =>
      val enc = dv.pathOrInlineDv.takeRight(20)
      val prefix = dv.pathOrInlineDv.dropRight(20)
      val b = PathCodec.z85Decode(enc)
      val bb = java.nio.ByteBuffer.wrap(b)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val rel = (if (prefix.nonEmpty) s"$prefix/" else "") +
        s"deletion_vector_$uuid.bin"
      readDvFile(spark, new Path(tablePath, rel), dv.offset, dv.sizeInBytes)
    case "p" =>
      readDvFile(spark, new Path(dv.pathOrInlineDv), dv.offset,
        dv.sizeInBytes)
    case other => throw new IllegalArgumentException(
      s"unknown deletionVector storageType '$other' — refusing")
  }

  /** Deleted row positions of one descriptor — test/audit surface; the
    * read path decodes on executors instead.
    */
  private[graft] def dvPositions(spark: SparkSession, tablePath: String,
                                 dv: Dv): Array[Long] =
    roaringPositions(dvBytes(spark, tablePath, dv))

  /** On-disk DV file: byte 0 is the format version (1); at `offset`
    * sits a big-endian int32 length (must equal sizeInBytes) followed
    * by the DV data.
    */
  private def readDvFile(spark: SparkSession, p: Path, offset: Int,
                         size: Int): Array[Byte] = {
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(p)
    try {
      val ver = in.readByte()
      require(ver == 1, s"$p: DV file format version $ver != 1")
      in.seek(offset.toLong)
      val len = in.readInt()
      require(len == size,
        s"$p: DV length prefix $len != descriptor sizeInBytes $size")
      val buf = new Array[Byte](size)
      in.readFully(buf)
      buf
    } finally in.close()
  }

  /** Portable 64-bit RoaringBitmapArray: int32 LE magic 1681511377,
    * int64 LE bitmap count, then per bitmap an int32 LE KEY (the high 32
    * bits of every position it carries — keys may be sparse, so the key
    * field is authoritative, not the array index) followed by one
    * standard-serialized 32-bit RoaringBitmap. Position = key*2^32 +
    * value. Runs on executors (see [[applyDvs]]) — keep it
    * serialization-free of driver state.
    */
  private[graft] def roaringPositions(data: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == 1681511377,
      s"deletion vector magic $magic != 1681511377 (portable " +
        "RoaringBitmapArray)")
    roaringPositions64(bb)
  }

  /** Portable 64-bit roaring decode from a little-endian buffer
    * positioned at the 8-byte bitmap count — the body shared by
    * Delta's RoaringBitmapArray (magic-prefixed, above) and Iceberg
    * v3 puffin deletion vectors (magic'd differently by the puffin
    * blob framing, same portable body).
    */
  private[graft] def roaringPositions64(
      bb: java.nio.ByteBuffer): Array[Long] = {
    val n = bb.getLong
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var k = 0L
    while (k < n) {
      val key = bb.getInt
      require(key >= 0, s"deletion vector bitmap key $key out of range")
      val rb = new org.roaringbitmap.RoaringBitmap()
      rb.deserialize(bb)
      // the ByteBuffer variant does NOT advance the position — the
      // library contract is to skip the consumed bytes manually
      bb.position(bb.position() + rb.serializedSizeInBytes())
      val hi = key.toLong << 32
      rb.forEach(new org.roaringbitmap.IntConsumer {
        def accept(v: Int): Unit = out += (hi | (v & 0xFFFFFFFFL))
      })
      k += 1
    }
    out.toArray
  }

  /** Inverse of [[roaringPositions]]: 64-bit row positions → portable
    * RoaringBitmapArray bytes (the WRITE half of the DV lifecycle —
    * [[DeltaWrite.deleteDv]]/[[DeltaWrite.upsertDv]] author descriptors
    * whose blobs this produces). One 32-bit RoaringBitmap per high-word
    * key, keys ascending, each standard-serialized; header magic +
    * count little-endian, exactly what [[roaringPositions]] (and the
    * reference implementation) decodes. Runs on EXECUTORS — one
    * compressed blob per data file, so a heavily-deleted table never
    * materializes its delete set on the driver.
    */
  private[graft] def roaringSerialize(positions: Array[Long]): Array[Byte] = {
    require(positions.forall(p => p >= 0 && (p >>> 32) <= Int.MaxValue),
      "DV position outside the portable RoaringBitmapArray domain")
    val byKey = positions.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
      .map { case (k, ps) =>
        val rb = new org.roaringbitmap.RoaringBitmap()
        ps.foreach(p => rb.add((p & 0xFFFFFFFFL).toInt))
        (k, rb)
      }
    roaringSerializeBitmaps(byKey)
  }

  /** Wire-format half of [[roaringSerialize]], taking already-built
    * 32-bit bitmaps keyed by high word (keys must be ascending) — the
    * incremental DV authoring path feeds bitmaps it filled while
    * STREAMING positions, so a heavily-masked file costs bitmap bytes,
    * never 8 bytes per deleted row.
    */
  private[graft] def roaringSerializeBitmaps(
      byKey: Seq[(Int, org.roaringbitmap.RoaringBitmap)]): Array[Byte] = {
    val body = roaringSerializeBitmaps64(byKey)
    val bb = java.nio.ByteBuffer.allocate(4 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377)
    bb.put(body)
    bb.array()
  }

  /** Magic-less portable 64-bit roaring body (LE bitmap count, 4-byte
    * key + standard 32-bit roaring per bitmap) — what Delta wraps with
    * its RoaringBitmapArray magic above and Iceberg v3 puffin DV blobs
    * carry bare (their framing magic is the blob's own).
    */
  private[graft] def roaringSerializeBitmaps64(
      byKey: Seq[(Int, org.roaringbitmap.RoaringBitmap)]): Array[Byte] = {
    val bitmaps = byKey.map { case (k, rb) =>
      rb.runOptimize()
      // RoaringBitmap's DataOutput serializer emits the portable
      // little-endian wire format regardless of DataOutput's own
      // big-endian convention — the library handles byte order
      val bos = new java.io.ByteArrayOutputStream()
      rb.serialize(new java.io.DataOutputStream(bos))
      (k, bos.toByteArray)
    }
    val bb = java.nio.ByteBuffer
      .allocate(8 + bitmaps.map(4 + _._2.length).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(bitmaps.size.toLong)
    bitmaps.foreach { case (k, b) => bb.putInt(k); bb.put(b) }
    bb.array()
  }

  // ------------------------------------------------------------------
  // stats
  // ------------------------------------------------------------------

  /** Zone-map stats for one add entry, in [[FileStats.ColStat]] form —
    * sound mapping only: int/long/float/double/string columns with
    * json-native stat values; everything else answers "cannot prune"
    * (dates, timestamps, decimals render engine-specifically in Delta
    * stats json, so they are deliberately NOT mapped). `sk` maps the
    * logical field name to the key stats are recorded under (physical
    * name under column mapping). With a deletion vector present the
    * stats still describe the pre-delete file — a superset, so pruning
    * decisions remain sound (may only over-KEEP, never over-skip).
    *
    * PARTITION columns never appear in the stats json — their zone map
    * IS the add action's partitionValues entry (a single value, so
    * lo == hi == v; a logged null is an all-null column). Without this,
    * a predicate on the partition key — the single most common pruning
    * predicate on a partitioned table — would open every file.
    */
  private def colStats(st: LogState, schema: StructType,
                       sk: Map[String, String], a: AddEntry)
      : Map[String, FileStats.ColStat] = {
    val partStats = st.partitionCols.flatMap { c =>
      schema.fields.find(_.name == c).flatMap { f =>
        val kind = f.dataType match {
          case ByteType | ShortType | IntegerType | LongType => Some("l")
          case FloatType | DoubleType                        => Some("d")
          case StringType                                    => Some("s")
          case _                                             => None
        }
        kind.flatMap { k =>
          a.partitionValues.get(sk.getOrElse(c, c)).map {
            case null => c -> FileStats.ColStat(k, None, None, 1L, 1L)
            case v    => c -> FileStats.ColStat(k, Some(v), Some(v), 0L, 1L)
          }
        }
      }
    }.toMap
    statsOnly(schema, sk, a) ++ partStats
  }

  private def statsOnly(schema: StructType, sk: Map[String, String],
                        a: AddEntry): Map[String, FileStats.ColStat] =
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
          val key = sk.getOrElse(f.name, f.name)
          def stat(section: String): Option[JsonNode] =
            Option(n.path(section).get(key)).filterNot(_.isNull)
          val lo = stat("minValues")
          val hi = stat("maxValues")
          val nulls = Option(n.path("nullCount").get(key))
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
              Some(f.name -> FileStats.ColStat(k, None, None, nulls, rows))
            case _ => None
          }
        }
      }
    }.toMap
}
