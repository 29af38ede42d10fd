package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Read-only Apache Hudi table reader — the third open-table-format
  * interop leg next to [[DeltaRead]] and [[IcebergRead]], built purely
  * from the PUBLIC Hudi storage layout and log-format tech spec
  * (hudi.apache.org/docs + hudi.apache.org/tech-specs):
  *
  *   - `.hoodie/hoodie.properties` declares the table (java
  *     properties; COPY_ON_WRITE and MERGE_ON_READ supported);
  *   - the timeline is the set of `.hoodie/<instantTs>.commit` files —
  *     a commit is COMPLETED only when that exact name exists
  *     (`.commit.requested` / `.commit.inflight` are in-flight states
  *     and are ignored, which is what gives readers snapshot
  *     isolation against concurrent writers); Hudi 1.x timelines
  *     (`.hoodie/timeline/<ts>_<completionTs>.commit`) resolve too;
  *   - each completed commit's JSON (`partitionToWriteStats`) lists the
  *     base/log files it wrote as (partition → [{fileId, path, ...}]);
  *   - COW queries resolve FILE SLICES: within a (partition, fileId)
  *     file group, only the base file written by the LATEST completed
  *     instant ≤ the as-of instant is live — an upsert rewrites the
  *     whole group under the same fileId with a newer instant, so
  *     older slices are shadowed;
  *   - MERGE_ON_READ queries MERGE uncompacted avro log blocks onto
  *     the base file at read time (round 9; previously refused): a log
  *     file named `.{fileId}_{baseInstant}.log.{version}_{token}`
  *     belongs to the file slice whose base landed at `baseInstant`;
  *     its `#HUDI#`-framed blocks decode per the public log-block
  *     layout (8-byte block size, 4-byte format version, 4-byte block
  *     type ordinal, ordinal-keyed header map, 8-byte content length,
  *     content, footer map, 8-byte total length), AVRO_DATA_BLOCK
  *     content decodes as (4-byte version, 4-byte count, then per
  *     record 4-byte length + avro-binary bytes in the block's SCHEMA
  *     header), and records merge LAST-WRITE-WINS per
  *     `_hoodie_record_key` (file order → block order → record order —
  *     the arrival order Hudi's own payload resolution follows across
  *     commits), log records overriding base rows; COMMAND blocks of
  *     type ROLLBACK skip the data blocks whose INSTANT_TIME header
  *     matches their TARGET_INSTANT_TIME (two passes: a header-only
  *     scan collects targets, the decode pass skips them), and blocks
  *     of instants NOT in the completed-≤-asOf timeline (in-flight or
  *     crashed writers) never serve. Block decode runs DISTRIBUTED (an
  *     RDD over the planned log paths with executor-side reads —
  *     Spark's file sources filter hidden dot-files, which every Hudi
  *     log is; nothing row-scale reaches the driver).
  *
  * Scope and non-goals (loudly enforced):
  *   - DELETE_BLOCKs decode (round 10): content version ≥ 3 carries an
  *     avro-binary HoodieDeleteRecordList whose recordKeys suppress
  *     rows from the block's file slice, last-write-wins with the data
  *     blocks by the same arrival order (a later data block re-inserts
  *     the key) — so streaming-upsert-with-deletes tables read between
  *     compactions; Kryo-era (< v3) delete content refuses by name;
  *   - all log-record merging is PER FILE SLICE (partition, fileId):
  *     Hudi record keys are only unique per partition under a
  *     non-global index, so a key legally repeated across partitions
  *     merges against its own slice's base rows only;
  *   - PARQUET_DATA_BLOCKs decode (round 13): content is one complete
  *     parquet file (what `hoodie.logfile.data.block.format=parquet`
  *     writes — the most common foreign block format after avro),
  *     read in-memory with parquet-hadoop's Group reader (no extra
  *     dependencies, no temp files), merged by the SAME arrival-order
  *     last-write-wins rule as avro blocks; flat primitive payload
  *     schemas only, nested fields refuse by name;
  *   - log blocks other than AVRO_DATA_BLOCK / PARQUET_DATA_BLOCK /
  *     DELETE_BLOCK / rollback COMMAND_BLOCK (HFile data blocks, CDC
  *     blocks) are REFUSED BY NAME, as are corrupt/truncated frames —
  *     never silently skipped;
  *   - `replacecommit` instants READ (round 10; previously refused):
  *     clustering / insert_overwrite replace whole file groups out of
  *     line with the fileId-shadowing rule, so a completed
  *     replacecommit's `partitionToWriteStats` contributes its NEW file
  *     groups like any commit while its `partitionToReplaceFileIds`
  *     kills the listed (partition, fileId) groups — a killed group's
  *     bases AND logs drop from the plan unless a strictly newer write
  *     revived the fileId; time travel to an instant before the
  *     replacement still serves the pre-clustering groups;
  *   - a non-empty `.hoodie/archived` timeline (or 1.x
  *     `.hoodie/timeline/history`) triggers a PER-FILE-GROUP coverage
  *     check (round 10; previously a blanket refusal): a group whose
  *     latest on-disk base instant is covered by the active timeline
  *     plans normally — newer slices fully shadow older ones, so an
  *     archived history is harmless — while a group whose LAST write
  *     was archived refuses by name (planning it from the active
  *     timeline alone would silently drop or resurrect rows);
  *   - time travel by instant timestamp (Hudi instants are zero-padded
  *     numeric strings, so lexicographic ≤ is the spec ordering);
  *   - Hudi's five `_hoodie_*` meta columns are dropped from the
  *     result (the payload schema is what an analytics consumer
  *     wants); no writes, no column-stats skipping (COW commit
  *     metadata carries row counts, not column bounds — skipping
  *     belongs to the metadata-table readers).
  *
  * Timeline and commit JSON are driver-side KB-sized reads (the budget
  * Hudi's own planner spends); the data files are one distributed
  * parquet scan, plus one distributed log scan when merging.
  */
object HudiRead {
  private val om = new ObjectMapper()

  private val MetaCols = Seq("_hoodie_commit_time", "_hoodie_commit_seqno",
    "_hoodie_record_key", "_hoodie_partition_path", "_hoodie_file_name")
  private val KeyCol = "_hoodie_record_key"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // Completed-commit naming across table versions: pre-1.x
  // `<instantTs>.commit`; Hudi 1.x `<instantTs>_<completionTs>.commit`
  // (the requested instant still orders the timeline — completion time
  // only disambiguates concurrency, which a snapshot reader plans by
  // requested ts exactly as Hudi's own COW planner does). On
  // MERGE_ON_READ tables, `deltacommit` is the completed write instant
  // (log-file or insert base-file writes) and `commit` is a completed
  // COMPACTION (log data folded into fresh base files).
  private val Completed   = """(\d+)(?:_\d+)?\.commit""".r
  private val CompletedDc = """(\d+)(?:_\d+)?\.deltacommit""".r
  private val Replace     = """(\d+)(?:_\d+)?\.replacecommit""".r
  // log basename: .{fileId}_{baseInstant}.log.{version}_{writeToken}
  private val LogName = """\.(.+)_(\d+)\.log\.(\d+)(?:_(.+))?""".r

  private def props(spark: SparkSession, path: String)
      : java.util.Properties = {
    val p = new Path(path, ".hoodie/hoodie.properties")
    val f = fs(spark, path)
    require(f.exists(p), s"$path has no .hoodie/hoodie.properties — " +
      "not a Hudi table")
    val in = f.open(p)
    val pr = new java.util.Properties()
    try pr.load(in) finally in.close()
    pr
  }

  private[sources] final case class Slice(partition: String, fileId: String,
                                          instant: String, path: String)

  /** Full parsed timeline: every slice every completed instant ever
    * wrote (not just the live ones — [[HudiWrite.clean]] needs the
    * shadowed history), the replacement kills, the completed instant
    * set, and the clean horizon. `cleanedBefore` is the max
    * `earliestRetained` over completed `.clean` instants: file slices
    * shadowed before it were PHYSICALLY DELETED, so time travel below
    * it must refuse rather than chase missing files.
    */
  private[sources] final case class TimelineState(
      dir: Path, completed: Seq[String], slices: Seq[Slice],
      replacedAt: Map[(String, String), String],
      cleanedBefore: Option[String], hasArchived: Boolean,
      activeNames: Seq[String])

  /** (live base slices, log files of those slices) at `asOf` ("" =
    * latest): latest completed BASE slice per (partition, fileId) file
    * group, plus the log files whose NAME attaches them to that base
    * instant (logs of older slices were folded by the compaction that
    * created the newer base). A file group with log files but no base
    * at their declared base instant refuses (log-only groups need the
    * insert path this planner does not model).
    */
  private val CleanName = """(\d+)(?:_\d+)?\.clean""".r

  /** Parse the timeline into [[TimelineState]] (completed instants ≤
    * `asOf`, every slice they wrote, replacement kills, the clean
    * horizon). Time travel below the clean horizon refuses here: the
    * shadowed slices it would need were physically deleted, and a
    * FileNotFound mid-scan is not a loud answer. The horizon considers
    * ALL `.clean` instants (not just ≤ asOf) — deletion is physical
    * and irreversible.
    */
  private[sources] def timelineState(spark: SparkSession, path: String,
                                     asOf: String): TimelineState = {
    val f = fs(spark, path)
    // An archived timeline (pre-1.x: .hoodie/archived; 1.x: LSM history
    // under .hoodie/timeline/history) means SOME instants are invisible
    // to the active timeline. That is only a problem for a file group
    // whose LATEST write was archived — newer slices fully shadow older
    // ones, so a group whose live slice IS in an active commit plans
    // identically whether or not its history was archived. Hudi
    // archives by default after ~30 commits, so the blanket refusal
    // this check replaces made essentially every long-lived production
    // table unreadable. The per-group coverage check runs after
    // planning (in [[plan]]); here we only note whether it is needed.
    val hasArchived =
      Seq(".hoodie/archived", ".hoodie/timeline/history").exists { rel =>
        val archived = new Path(path, rel)
        f.exists(archived) && f.listStatus(archived).nonEmpty
      }
    // active timeline location: .hoodie (pre-1.x) or .hoodie/timeline
    // (1.x moved instant files into a dedicated dir)
    val timelineDir = {
      val oneX = new Path(path, ".hoodie/timeline")
      if (f.exists(oneX) && f.getFileStatus(oneX).isDirectory) oneX
      else new Path(path, ".hoodie")
    }
    val timeline = f.listStatus(timelineDir)
      .filter(_.isFile).map(_.getPath.getName)
    def jsonOf(name: String): JsonNode = {
      val in = f.open(new Path(timelineDir, name))
      try {
        val bytes = in.readAllBytes()
        try om.readTree(new String(bytes, "UTF-8"))
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"$path: $name commit metadata is not JSON (Hudi 1.x can " +
              "store completed-instant metadata in Avro) — this " +
              "planner refuses rather than misreading", e)
        }
      } finally in.close()
    }
    // clean horizon gate BEFORE planning: slices shadowed before the
    // max earliestRetained were physically deleted by HudiWrite.clean.
    // Only GRAFT-written clean records (JSON, first byte '{') carry a
    // readable horizon: real Hudi serializes completed clean metadata
    // as Avro (HoodieCleanMetadata), and the default cleaner runs on
    // virtually every production table. A latest-snapshot read is safe
    // under ANY cleaner — it touches only live slices — so a foreign
    // clean record must not refuse it; only time travel (which may
    // need slices the unreadable horizon says are gone) refuses.
    val cleanRecords: Seq[(String, Option[String])] =
      timeline.collect { case n @ CleanName(_) =>
        val in = f.open(new Path(timelineDir, n))
        val bytes = try in.readAllBytes() finally in.close()
        val first = bytes.dropWhile(b =>
          b == ' ' || b == '\n' || b == '\r' || b == '\t').headOption
        if (first.contains('{'.toByte)) {
          val er = om.readTree(new String(bytes, "UTF-8"))
            .path("earliestRetained")
          require(er.isTextual && er.asText().nonEmpty,
            s"$path: JSON clean instant $n carries no earliestRetained " +
              "— refusing")
          (n, Some(er.asText()))
        } else (n, None) // foreign (Avro HoodieCleanMetadata)
      }.toSeq
    val cleanedBefore: Option[String] = cleanRecords.flatMap(_._2).maxOption
    val foreignClean = cleanRecords.collect { case (n, None) => n }
    if (asOf.nonEmpty && foreignClean.nonEmpty)
      throw new IllegalArgumentException(
        s"$path: time travel to $asOf with non-JSON .clean metadata " +
          s"(${foreignClean.mkString(", ")} — real Hudi writes completed " +
          "clean metadata as Avro HoodieCleanMetadata): the clean horizon " +
          "is unreadable and shadowed slices may be physically deleted, " +
          "so this planner refuses rather than risking FileNotFound " +
          "mid-scan. Latest-snapshot reads are unaffected.")
    cleanedBefore.foreach { er =>
      require(asOf.isEmpty || asOf >= er,
        s"$path: instants before $er were CLEANED — their shadowed " +
          s"file slices are physically deleted, so time travel to " +
          s"$asOf cannot be served, refusing")
    }
    // (requested instant, completed-instant file name, isReplace) —
    // commits plus, on MOR tables, deltacommits, plus replacecommits
    // (clustering / insert_overwrite: write stats contribute new file
    // groups like any commit; partitionToReplaceFileIds kills groups)
    val completed = timeline.collect {
      case n @ Completed(ts)   => (ts, n, false)
      case n @ CompletedDc(ts) => (ts, n, false)
      case n @ Replace(ts)     => (ts, n, true)
    }.filter { case (ts, _, _) => asOf.isEmpty || ts <= asOf }.sortBy(_._1)
    require(completed.nonEmpty,
      s"$path: no completed commit" +
        (if (asOf.nonEmpty) s" at or before instant $asOf" else ""))
    val parsed = completed.map { case (ts, name, isReplace) =>
      val node = jsonOf(name)
      val ss = node.path("partitionToWriteStats").properties().asScala
        .flatMap { e =>
          e.getValue.elements().asScala.map { ws =>
            Slice(e.getKey, ws.path("fileId").asText(), ts,
              ws.path("path").asText())
          }
        }.toSeq
      val killed: Seq[((String, String), String)] =
        if (!isReplace) Seq.empty
        else node.path("partitionToReplaceFileIds").properties().asScala
          .toSeq.flatMap { e =>
            e.getValue.elements().asScala.map { fid =>
              ((e.getKey, fid.asText()), ts)
            }
          }
      (ss, killed)
    }
    val slices = parsed.flatMap(_._1)
    // latest replacement instant per killed (partition, fileId) group
    val replacedAt: Map[(String, String), String] = parsed.flatMap(_._2)
      .groupBy(_._1).map { case (g, ks) => g -> ks.map(_._2).max }
    TimelineState(timelineDir, completed.map(_._1), slices, replacedAt,
      cleanedBefore, hasArchived, timeline.toSeq)
  }

  /** Data-tree files the last planning call LISTED on the driver (the
    * archival-coverage walk) — 0 when the walk was skipped or not
    * needed. Instrumentation for the scale spec: metadata-table
    * planning must be LISTING-FREE.
    */
  @volatile private[graft] var lastWalkedFiles: Long = 0L

  private[sources] def plan(spark: SparkSession, path: String,
                            asOf: String,
                            skipArchivalWalk: Boolean = false)
      : (Seq[Slice], Seq[Slice], Set[String]) = {
    val f = fs(spark, path)
    val st = timelineState(spark, path, asOf)
    val (slices, replacedAt, hasArchived, timeline) =
      (st.slices, st.replacedAt, st.hasArchived, st.activeNames)
    val (logsAll, bases) = slices.partition(_.path.contains(".log."))
    val latestBaseAll = bases.groupBy(s => (s.partition, s.fileId))
      .map { case (g, ss) => g -> ss.maxBy(_.instant) }
    // a replaced group is DEAD unless a strictly newer write revived
    // the fileId (Hudi never reuses replaced fileIds, but a newer base
    // must win if one exists); log-only groups with no base are dead
    // too when replaced
    def groupDead(g: (String, String)): Boolean =
      replacedAt.get(g).exists { r =>
        latestBaseAll.get(g).forall(_.instant <= r)
      }
    val latestBase = latestBaseAll.filterNot { case (g, _) => groupDead(g) }
    val logs = logsAll.filterNot(l => groupDead((l.partition, l.fileId)))
    // attach each log to its slice by the base instant in its NAME
    val attached = logs.map { l =>
      val baseTs = l.path.split("/").last match {
        case LogName(_, ts, _, _) => ts
        case other => throw new IllegalArgumentException(
          s"$path: log file name $other does not follow the " +
            ".{fileId}_{baseInstant}.log.{version}_{token} convention — " +
            "refusing rather than guessing its file slice")
      }
      val base = latestBase.get((l.partition, l.fileId))
      require(base.nonEmpty,
        s"$path: file group ${l.fileId} has log file ${l.path} but no " +
          "base file — log-only (insert-into-log) groups are not " +
          "modeled by this planner, refusing")
      require(baseTs <= base.get.instant,
        s"$path: log file ${l.path} declares base instant $baseTs newer " +
          s"than the group's latest base ${base.get.instant} — refusing")
      (l, baseTs, base.get.instant)
    }
    // logs of OLDER slices were folded by the compaction that created
    // the newer base — only the latest slice's logs merge
    val live = attached.collect { case (l, bt, lt) if bt == lt => l }
    lastWalkedFiles = 0L
    // callers that reconcile against the metadata table's files
    // partition skip the O(data files) walk — the reconcile catches
    // exactly the drift the walk exists to catch (see readWhereMeta)
    if (hasArchived && !skipArchivalWalk)
      verifyArchivalCoverage(f, path, asOf, timeline, latestBase,
        replacedAt)
    (latestBase.values.toSeq.sortBy(_.path), live.sortBy(_.path),
      st.completed.toSet)
  }

  // base file basename: {fileId}_{writeToken}_{instant}.parquet —
  // fileId never contains '_' (UUID-dash-index), writeToken is
  // dash-separated
  private val BaseName = """(.+)_([^_]+)_(\d+)(?:\.\w+)?\.parquet""".r
  private val PendingName =
    """(\d+)(?:_\d+)?\..*(?:inflight|requested)""".r

  /** Per-file-group archival coverage: every on-disk base file instant
    * must be ≤ its group's planned live instant (shadowed or live —
    * both fully covered by the active timeline), excused as a pending
    * concurrent writer (an .inflight/.requested marker exists), or
    * beyond the as-of horizon. Anything else is a write whose commit
    * was ARCHIVED while its file is still the group's latest — planning
    * from the active timeline would silently drop or resurrect rows,
    * so that group refuses BY NAME. On-disk LOG files need no separate
    * check: archival is instant-prefix-ordered, so a log's deltacommit
    * (newer than its base instant by the naming contract) can only be
    * archived if the base instant is archived too — which this base
    * check already catches.
    *
    * The listing is a driver-side walk of the data tree — the same
    * budget Hudi's own fallback (no metadata table) planner spends —
    * and runs ONLY when an archived timeline exists.
    */
  private def verifyArchivalCoverage(
      f: org.apache.hadoop.fs.FileSystem, path: String, asOf: String,
      timeline: Seq[String],
      latestBase: Map[(String, String), Slice],
      replacedAt: Map[(String, String), String]): Unit = {
    val pending = timeline.collect { case PendingName(ts) => ts }.toSet
    def walk(p: Path, rel: String): Seq[(String, String)] =
      f.listStatus(p).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n == ".hoodie") Seq.empty
        else if (s.isDirectory)
          walk(s.getPath, if (rel.isEmpty) n else s"$rel/$n")
        else Seq((rel, n))
      }
    val walked = walk(new Path(path), "")
    lastWalkedFiles = walked.size.toLong
    walked.foreach {
      case (part, n @ BaseName(fid, _, ts)) =>
        val planned = latestBase.get((part, fid))
        val covered = planned.exists(ts <= _.instant) ||
          replacedAt.get((part, fid)).exists(ts <= _) ||
          pending.contains(ts) || (asOf.nonEmpty && ts > asOf)
        require(covered,
          s"$path: file group (partition='$part', fileId=$fid) has " +
            s"on-disk base file $n at instant $ts that no ACTIVE " +
            "completed commit covers — its commit was archived (or its " +
            "writer left no timeline trace), so planning from the " +
            "active timeline alone would silently drop or resurrect " +
            "its rows; refusing this table rather than misreading")
      case _ => () // logs + non-hudi files: covered via the base check
    }
  }

  /** The table as a DataFrame at instant `asOf` ("" = latest snapshot).
    * Hudi meta columns are dropped; base files carry every payload
    * column (including partition fields), so no hive-layout recovery
    * is needed. MOR file slices with uncompacted log files merge the
    * log records onto the base rows (last write wins per record key).
    */
  /** Pruned read: open only base files whose footer zone maps can
    * satisfy `predicate` — the Delta/Iceberg `readWhere` contract on
    * the Hudi leg. Hudi COW commit metadata carries NO column bounds
    * (bounds live in the optional metadata table this reader doesn't
    * model), so the zone maps are FOOTER-HARVESTED at plan time: one
    * KB-sized footer read per live file, driver-side — the same budget
    * [[FileStats]] spends at write time on the other legs, honest
    * about where Hudi keeps (or doesn't keep) its stats. Tables with
    * uncompacted log files refuse: pruning a file slice on its BASE
    * bounds could drop log-inserted rows the bounds know nothing
    * about.
    */
  def readWhere(spark: SparkSession, path: String, predicate: String,
                asOf: String = ""): DataFrame = {
    val (bases, logs, _) = plan(spark, path, asOf)
    require(logs.isEmpty,
      s"$path: uncompacted log files present — base-file zone maps " +
        "cannot prune a merged slice soundly, refusing (read() merges)")
    val pred = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(predicate)
    val stats = FileStats.collect(spark, path, bases.map(_.path))
    val kept = bases.filter(b =>
      FileStats.mayMatch(pred, stats.getOrElse(b.path, Map.empty)))
    val src =
      if (kept.nonEmpty)
        spark.read.parquet(kept.map(b => s"$path/${b.path}"): _*)
      else // schema-only: zero files matched
        spark.read.parquet(s"$path/${bases.head.path}").limit(0)
    src.drop(MetaCols: _*)
      .filter(org.apache.spark.sql.functions.expr(predicate))
  }

  /** (total live base files, files `predicate` would open). */
  def pruneReport(spark: SparkSession, path: String, predicate: String,
                  asOf: String = ""): (Int, Int) = {
    val (bases, logs, _) = plan(spark, path, asOf)
    require(logs.isEmpty,
      s"$path: uncompacted log files present — refusing, see readWhere")
    val pred = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(predicate)
    val stats = FileStats.collect(spark, path, bases.map(_.path))
    (bases.size, bases.count(b =>
      FileStats.mayMatch(pred, stats.getOrElse(b.path, Map.empty))))
  }

  // ------------------------------------------------------------------
  // metadata-table planning (files + column_stats partitions)
  // ------------------------------------------------------------------

  /** Parse the modeled metadata table at `.hoodie/metadata/` into
    * (synced head instant, per-file column zone maps). None when no
    * metadata table exists or it is not the modeled layout — callers
    * that REQUIRE it ([[readWhereMeta]]) refuse loudly; the sync verb
    * treats None as "harvest everything".
    */
  private[sources] def tryMetaStats(spark: SparkSession, path: String)
      : Option[(String, Map[String, Map[String, FileStats.ColStat]],
                Set[String])] = {
    val mpath = s"$path/.hoodie/metadata"
    val f = fs(spark, path)
    if (!f.exists(new Path(mpath, ".hoodie/hoodie.properties")))
      return None
    val rows =
      try read(spark, mpath).collect()
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"$path: .hoodie/metadata exists but is not a readable " +
            "modeled metadata table (real Hudi metadata tables are " +
            "HFile-based MOR internals this reader does not decode) — " +
            s"refusing rather than misreading (${e.getMessage})", e)
      }
    val cols = Set("mkey", "part", "path", "col", "kind", "lo", "hi",
      "nulls", "rows")
    require(rows.isEmpty ||
        rows.head.schema.fieldNames.toSet == cols,
      s"$path: metadata table carries an unmodeled schema " +
        s"${rows.headOption.map(_.schema.fieldNames.mkString(","))} — " +
        "refusing")
    val sync = rows.filter(_.getAs[String]("part") == "sync")
    require(sync.length == 1 &&
        sync.head.getAs[String]("kind") == "graft-colstats-v1",
      s"$path: metadata table carries no graft-colstats-v1 sync marker " +
        "— unmodeled metadata version, refusing")
    val head = sync.head.getAs[String]("path")
    val stats = rows.filter(_.getAs[String]("part") == "column_stats")
      .groupBy(_.getAs[String]("path")).map { case (p, rs) =>
        p -> rs.map { r =>
          r.getAs[String]("col") -> FileStats.ColStat(
            r.getAs[String]("kind"),
            Option(r.getAs[String]("lo")), Option(r.getAs[String]("hi")),
            r.getAs[Long]("nulls"), r.getAs[Long]("rows"))
        }.toMap
      }
    // the FILES partition is the authoritative live-file listing —
    // files without stats still count (unprunable but present)
    val fileList = rows.filter(_.getAs[String]("part") == "files")
      .map(_.getAs[String]("path")).toSet
    val bare = fileList.filterNot(stats.contains)
      .map(_ -> Map.empty[String, FileStats.ColStat]).toMap
    Some((head, stats ++ bare, fileList))
  }

  /** The shared metadata-table planning path: timeline plan WITHOUT
    * the archival-coverage FS walk, reconciled against the metadata
    * table's `files` partition instead. The walk exists to catch file
    * groups whose latest commit a (possibly foreign) archiver moved
    * out of the active timeline — but a VALID metadata table synced at
    * the CURRENT head proves coverage without listing a single data
    * directory: syncMetadata's own plan ran the walk, a graft archive
    * re-plans and rolls back rather than orphan, and a foreign archive
    * after the sync leaves the metadata `files` set a strict SUPERSET
    * of the timeline plan — which the reconcile refuses by name. So
    * plan time is O(active timeline), not O(data files): the budget
    * the metadata table exists to win at 100 TB file counts.
    */
  private def planMeta(spark: SparkSession, path: String)
      : (Seq[Slice], Map[String, Map[String, FileStats.ColStat]]) = {
    val (bases, logs, completedTs) =
      plan(spark, path, "", skipArchivalWalk = true)
    require(logs.isEmpty,
      s"$path: uncompacted log files present — refusing, see readWhere")
    val (head, stats, fileList) = tryMetaStats(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"$path: no modeled metadata table — run " +
          "HudiWrite.syncMetadata, or use readWhere's footer harvest"))
    require(head == completedTs.max,
      s"$path: metadata table synced at $head but the table head is " +
        s"${completedTs.max} — STALE stats could silently drop rows; " +
        "re-run HudiWrite.syncMetadata")
    val planned = bases.map(_.path).toSet
    require(fileList == planned, {
      val missing = (planned -- fileList).take(3)
      val extra = (fileList -- planned).take(3)
      s"$path: metadata table FILES partition disagrees with the " +
        s"timeline plan (not in metadata: ${missing.mkString(", ")}; " +
        s"not in plan: ${extra.mkString(", ")}) — a foreign archiver " +
        "or writer bypassed syncMetadata; re-run HudiWrite.syncMetadata " +
        "or fall back to readWhere's walking plan"
    })
    (bases, stats)
  }

  /** [[readWhere]] planned from the METADATA TABLE: zone maps come
    * from ONE read of `.hoodie/metadata` (written by
    * [[HudiWrite.syncMetadata]]) instead of one footer RPC per data
    * file, and the live-file listing comes from its `files` partition
    * reconciled against the timeline instead of the data-tree walk —
    * the plan-time budget that matters at 100 TB file counts. Refuses
    * loudly when the metadata table is absent, an unmodeled
    * layout/version, STALE (synced head ≠ the table's head — stats
    * missing a newer commit's files could silently drop rows), or in
    * files-partition disagreement with the timeline.
    */
  def readWhereMeta(spark: SparkSession, path: String,
                    predicate: String): DataFrame = {
    val (bases, stats) = planMeta(spark, path)
    val pred = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(predicate)
    val kept = bases.filter(b =>
      FileStats.mayMatch(pred, stats.getOrElse(b.path, Map.empty)))
    val src =
      if (kept.nonEmpty)
        spark.read.parquet(kept.map(b => s"$path/${b.path}"): _*)
      else
        spark.read.parquet(s"$path/${bases.head.path}").limit(0)
    src.drop(MetaCols: _*)
      .filter(org.apache.spark.sql.functions.expr(predicate))
  }

  /** (total live base files, files `predicate` would open) planned
    * from the metadata table — same refusals as [[readWhereMeta]].
    */
  def pruneReportMeta(spark: SparkSession, path: String,
                      predicate: String): (Int, Int) = {
    val (bases, stats) = planMeta(spark, path)
    val pred = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(predicate)
    (bases.size, bases.count(b =>
      FileStats.mayMatch(pred, stats.getOrElse(b.path, Map.empty))))
  }

  def read(spark: SparkSession, path: String, asOf: String = "")
      : DataFrame = {
    val pr = props(spark, path)
    val tpe = pr.getProperty("hoodie.table.type", "COPY_ON_WRITE")
    require(tpe == "COPY_ON_WRITE" || tpe == "MERGE_ON_READ",
      s"$path: hoodie.table.type=$tpe unknown to this planner — refusing")
    val (bases, logs, completedTs) = plan(spark, path, asOf)
    val df = spark.read.parquet(bases.map(s => s"$path/${s.path}"): _*)
    if (logs.isEmpty) return df.drop(MetaCols: _*)
    mergeLogs(spark, path, df, logs, bases, completedTs)
  }

  // ------------------------------------------------------------------
  // MOR log-block merging
  // ------------------------------------------------------------------

  // block type ordinals per the public log spec
  private val CommandBlock = 0
  private val DeleteBlock  = 1
  private val CorruptBlock = 2
  private val AvroBlock    = 3
  private val ParquetBlock = 5
  private val BlockNames = Map(0 -> "COMMAND_BLOCK", 1 -> "DELETE_BLOCK",
    2 -> "CORRUPT_BLOCK", 3 -> "AVRO_DATA_BLOCK", 4 -> "HFILE_DATA_BLOCK",
    5 -> "PARQUET_DATA_BLOCK", 6 -> "CDC_DATA_BLOCK")
  // header metadata key ordinals
  private val HInstant = 0
  private val HTarget  = 1
  private val HSchema  = 2
  private val HCommand = 3

  private val Magic = "#HUDI#".getBytes("UTF-8")

  private[graft] final case class LogBlock(tpe: Int,
                                           header: Map[Int, String],
                                           content: Array[Byte])

  /** Decode the `#HUDI#`-framed blocks of one log file. Truncated or
    * mis-framed bytes refuse loudly — a silent skip would serve a
    * pre-update snapshot as if it were current.
    */
  private[graft] def parseBlocks(bytes: Array[Byte],
                                 name: String): Seq[LogBlock] = {
    val in = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    val out = scala.collection.mutable.ArrayBuffer[LogBlock]()
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"$name: corrupt Hudi log frame at byte ${in.position()}: $msg — " +
        "refusing rather than serving a partial merge")
    def metaMap(): Map[Int, String] = {
      if (in.remaining() < 4) fail("truncated metadata map")
      val n = in.getInt
      if (n < 0 || n > 1000) fail(s"implausible metadata entry count $n")
      (0 until n).map { _ =>
        if (in.remaining() < 8) fail("truncated metadata entry")
        val ord = in.getInt
        val len = in.getInt
        if (len < 0 || len > in.remaining()) fail("metadata length overrun")
        val b = new Array[Byte](len); in.get(b)
        ord -> new String(b, "UTF-8")
      }.toMap
    }
    while (in.remaining() > 0) {
      if (in.remaining() < Magic.length + 8) fail("truncated magic/frame")
      val m = new Array[Byte](Magic.length); in.get(m)
      if (!java.util.Arrays.equals(m, Magic)) fail("bad #HUDI# magic")
      val blockStart = in.position()
      val blockSize = in.getLong // excludes magic and this field
      if (blockSize < 24 || blockSize > in.remaining()) fail(
        s"block size $blockSize exceeds remaining ${in.remaining()}")
      val version = in.getInt
      if (version < 0 || version > 10) fail(s"log format version $version")
      val tpe = in.getInt
      val header = metaMap()
      if (in.remaining() < 8) fail("truncated content length")
      val clen = in.getLong
      if (clen < 0 || clen > in.remaining()) fail("content overrun")
      val content = new Array[Byte](clen.toInt); in.get(content)
      metaMap() // footer — decoded for frame integrity, not consumed
      if (in.remaining() < 8) fail("truncated total-length trailer")
      in.getLong // total block length (reverse-traversal aid)
      out += LogBlock(tpe, header, content)
      // frame check: we must sit exactly blockSize past the size field
      if (in.position() != blockStart + 8 + blockSize)
        fail(s"frame length mismatch (declared $blockSize)")
    }
    out.toSeq
  }

  /** AVRO_DATA_BLOCK content: 4-byte version, 4-byte record count, then
    * per record a 4-byte length + avro-binary bytes in `writerSchema`.
    */
  private def decodeAvroBlock(content: Array[Byte], writerSchema: String,
                              name: String)
      : Iterator[org.apache.avro.generic.GenericRecord] = {
    val schema = new org.apache.avro.Schema.Parser().parse(writerSchema)
    val reader =
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord](schema)
    val in = java.nio.ByteBuffer.wrap(content)
    in.getInt // data-block format version
    val n = in.getInt
    (0 until n).iterator.map { _ =>
      val len = in.getInt
      require(len >= 0 && len <= in.remaining(),
        s"$name: avro data block record overrun — refusing")
      val b = new Array[Byte](len); in.get(b)
      reader.read(null,
        org.apache.avro.io.DecoderFactory.get().binaryDecoder(b, null))
    }
  }

  /** In-memory [[org.apache.parquet.io.InputFile]] over a log block's
    * content bytes — PARQUET_DATA_BLOCK content is a complete parquet
    * file (what `hoodie.logfile.data.block.format=parquet` writes), so
    * it decodes with the parquet-hadoop reader Spark already ships,
    * without touching disk.
    */
  private final class BytesInputFile(bytes: Array[Byte])
      extends org.apache.parquet.io.InputFile {
    override def getLength: Long = bytes.length.toLong
    override def newStream(): org.apache.parquet.io.SeekableInputStream =
      new org.apache.parquet.io.SeekableInputStream {
        private val bb = java.nio.ByteBuffer.wrap(bytes)
        override def getPos: Long = bb.position().toLong
        override def seek(newPos: Long): Unit = bb.position(newPos.toInt)
        override def read(): Int =
          if (bb.hasRemaining) bb.get() & 0xFF else -1
        override def read(b: Array[Byte], off: Int, len: Int): Int = {
          if (!bb.hasRemaining) return -1
          val n = math.min(len, bb.remaining())
          bb.get(b, off, n); n
        }
        override def read(buf: java.nio.ByteBuffer): Int = {
          if (!bb.hasRemaining) return -1
          val n = math.min(buf.remaining(), bb.remaining())
          val slice = bb.slice(); slice.limit(n)
          buf.put(slice); bb.position(bb.position() + n); n
        }
        override def readFully(b: Array[Byte]): Unit = bb.get(b)
        override def readFully(b: Array[Byte], off: Int, len: Int): Unit =
          bb.get(b, off, len)
        override def readFully(buf: java.nio.ByteBuffer): Unit = {
          val n = read(buf)
          require(n == 0 || buf.remaining() == 0,
            "parquet block: readFully past end of content")
          while (buf.remaining() > 0) {
            require(read(buf) > 0,
              "parquet block: readFully past end of content")
          }
        }
      }
  }

  /** PARQUET_DATA_BLOCK content: one complete parquet file. Decoded
    * with parquet-hadoop's Group reader (no extra dependencies) into
    * field-name → primitive-value maps, row-group order = arrival
    * order. Values surface as the boxed forms the payload conversion
    * already normalizes via toString.
    */
  private def decodeParquetBlock(content: Array[Byte], name: String)
      : Iterator[Map[String, AnyRef]] = {
    import org.apache.parquet.example.data.Group
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val reader = org.apache.parquet.hadoop.ParquetFileReader
      .open(new BytesInputFile(content))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      val fields = schema.getFields.asScala.toSeq
      fields.foreach(f => require(f.isPrimitive,
        s"$name: parquet log block carries nested field ${f.getName} — " +
          "flat payload schemas only, refusing"))
      val colIO = new org.apache.parquet.io.ColumnIOFactory()
        .getColumnIO(schema)
      val out = scala.collection.mutable.ArrayBuffer[Map[String, AnyRef]]()
      var pages = reader.readNextRowGroup()
      while (pages != null) {
        val rr = colIO.getRecordReader(pages,
          new org.apache.parquet.example.data.simple.convert
            .GroupRecordConverter(schema))
        val n = pages.getRowCount
        var i = 0L
        while (i < n) {
          val g: Group = rr.read()
          val m = fields.flatMap { f =>
            val fn = f.getName
            if (g.getFieldRepetitionCount(fn) == 0) None
            else {
              val v: AnyRef = f.asPrimitiveType().getPrimitiveTypeName match {
                case BINARY  => g.getString(fn, 0)
                case INT64   => Long.box(g.getLong(fn, 0))
                case INT32   => Int.box(g.getInteger(fn, 0))
                case DOUBLE  => Double.box(g.getDouble(fn, 0))
                case FLOAT   => Float.box(g.getFloat(fn, 0))
                case BOOLEAN => Boolean.box(g.getBoolean(fn, 0))
                case other => throw new IllegalArgumentException(
                  s"$name: parquet log block field $fn has physical " +
                    s"type $other — not a modeled payload type, refusing")
              }
              Some(fn -> v)
            }
          }.toMap
          out += m
          i += 1
        }
        pages = reader.readNextRowGroup()
      }
      out.iterator
    } finally reader.close()
  }

  /** The public HoodieDeleteRecordList avro model (hudi-common) —
    * DELETE_BLOCK content version ≥ 3 serializes deletes with it. The
    * orderingVal union covers the primitive ordering types Hudi's
    * payloads use; only recordKey is consumed (last-write-wins by
    * ARRIVAL order, the same rule the data blocks follow, already
    * subsumes ordering for the tables this reader models).
    */
  private val DeleteRecordListSchema =
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

  /** DELETE_BLOCK content: 4-byte version, 4-byte serialized length,
    * then avro-binary HoodieDeleteRecordList. Versions < 3 (the Kryo
    * serialization era) refuse by name — decoding them needs a Kryo
    * runtime this reader deliberately does not model.
    */
  private def decodeDeleteBlock(content: Array[Byte],
                                name: String): Seq[String] = {
    val in = java.nio.ByteBuffer.wrap(content)
    require(in.remaining() >= 8,
      s"$name: truncated DELETE_BLOCK content — refusing")
    val ver = in.getInt
    require(ver >= 3,
      s"$name: DELETE_BLOCK content version $ver predates the " +
        "avro-serialized HoodieDeleteRecordList (Kryo era) — refusing " +
        "rather than misreading")
    val len = in.getInt
    require(len >= 0 && len <= in.remaining(),
      s"$name: DELETE_BLOCK length overrun — refusing")
    val b = new Array[Byte](len); in.get(b)
    val schema =
      new org.apache.avro.Schema.Parser().parse(DeleteRecordListSchema)
    val reader = new org.apache.avro.generic.GenericDatumReader[
      org.apache.avro.generic.GenericRecord](schema)
    val rec = reader.read(null,
      org.apache.avro.io.DecoderFactory.get().binaryDecoder(b, null))
    rec.get("deleteRecordList")
      .asInstanceOf[java.util.List[AnyRef]].asScala.toSeq.map { d0 =>
        val d = d0.asInstanceOf[org.apache.avro.generic.GenericRecord]
        Option(d.get("recordKey")).map(_.toString).getOrElse(
          throw new IllegalArgumentException(
            s"$name: delete record carries no recordKey — refusing"))
      }
  }

  /** Merge uncompacted log records onto the base scan: one distributed
    * pass over the log files collects rollback targets (command blocks
    * are KB-sized; only instant strings reach the driver), a second
    * decodes data + delete blocks into typed rows, and last-write-wins
    * per (partition, fileId, record key) resolves via max_by over
    * (file, block, record) arrival order — PER FILE SLICE, because
    * Hudi record keys are only unique per partition under a non-global
    * index: a key that legally repeats across partitions must merge
    * against its own slice's base rows only. A winning DELETE record
    * suppresses the key from its slice entirely.
    */
  /** (partition, fileId, record key) of every LIVE log record — data
    * AND delete rows both count: a deleted key's slice attachment
    * still pins where a re-insert must go. The light sibling of
    * [[mergeLogs]]'s decode pass, used by [[HudiWrite.upsertLog]] to
    * route source keys to the slice that currently holds them
    * (log-inserted keys are invisible to the base files alone).
    * Distributed: executor-side block decode, output is
    * log-record-scale, deduplicated per (partition, fileId, key).
    */
  private[sources] def logKeyPlacement(spark: SparkSession, path: String,
                                       logs: Seq[Slice],
                                       completedTs: Set[String])
      : DataFrame = {
    import org.apache.spark.sql.functions._
    if (logs.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("__pp", StringType),
          StructField("__fid", StringType),
          StructField("__k", StringType))))
    val paths = logs.map(_.path).distinct.map(rel => s"$path/$rel")
    val confW = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    def bytesOf(p: String): Array[Byte] = {
      val hp = new Path(p)
      val f = hp.getFileSystem(confW.value)
      val in = f.open(hp)
      try in.readAllBytes() finally in.close()
    }
    val pathsRdd = spark.sparkContext.parallelize(paths,
      math.max(1, math.min(paths.size, 64)))
    val targets: Set[String] = pathsRdd.flatMap { p =>
      parseBlocks(bytesOf(p), p).iterator.collect {
        case b if b.tpe == CommandBlock &&
            b.header.get(HCommand).forall(_.trim == "0") =>
          b.header.getOrElse(HTarget, "")
      }.filter(_.nonEmpty)
    }.collect().toSet
    val sliceOf: Map[String, (String, String)] = logs
      .map(l => s"$path/${l.path}" -> (l.partition, l.fileId)).toMap
    val slB = spark.sparkContext.broadcast(sliceOf)
    val tgB = spark.sparkContext.broadcast(targets)
    val okB = spark.sparkContext.broadcast(completedTs)
    val rdd = pathsRdd.flatMap { p =>
      val (part, fid) = slB.value(p)
      def live(b: LogBlock): Boolean =
        okB.value.contains(b.header.getOrElse(HInstant, "")) &&
          !tgB.value.contains(b.header.getOrElse(HInstant, ""))
      parseBlocks(bytesOf(p), p).iterator.flatMap { b =>
        if (b.tpe == CommandBlock || !live(b)) Iterator.empty
        else if (b.tpe == DeleteBlock)
          decodeDeleteBlock(b.content, p).iterator
            .map(k => Row(part, fid, k))
        else if (b.tpe == AvroBlock) {
          val schema = b.header.getOrElse(HSchema,
            throw new IllegalArgumentException(
              s"$p: avro data block carries no SCHEMA header — refusing"))
          decodeAvroBlock(b.content, schema, p).map { rec =>
            val f = rec.getSchema.getField(KeyCol)
            val k = if (f == null) null else rec.get(KeyCol)
            require(k != null,
              s"$p: log record carries no $KeyCol — refusing")
            Row(part, fid, k.toString)
          }
        } else throw new IllegalArgumentException(
          s"$p: log block type ${BlockNames.getOrElse(b.tpe,
            b.tpe.toString)} is not modeled — refusing")
      }
    }
    spark.createDataFrame(rdd,
      StructType(Seq(StructField("__pp", StringType),
        StructField("__fid", StringType),
        StructField("__k", StringType))))
      .distinct()
  }

  private def mergeLogs(spark: SparkSession, path: String,
                        base: DataFrame, logs: Seq[Slice],
                        bases: Seq[Slice],
                        completedTs: Set[String]): DataFrame =
    mergeSliced(spark, path, base, logs, bases, completedTs)
      .drop("__g_part", "__g_fid")

  /** [[mergeLogs]] with the slice identity RETAINED (`__g_part`,
    * `__g_fid` columns) — the shape [[HudiWrite.compact]] needs to
    * rewrite each merged slice under its own fileId. `base`/`bases` may
    * be restricted to a subset of file groups; only their slices (and
    * `logs` attached to them) contribute rows.
    */
  private[sources] def mergeSliced(spark: SparkSession, path: String,
                                   base: DataFrame, logs: Seq[Slice],
                                   bases: Seq[Slice],
                                   completedTs: Set[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(base.columns.contains(KeyCol),
      s"$path: base files carry no $KeyCol meta column — merging needs " +
        "materialized record keys (virtual-key tables are not modeled)")
    val payload = base.drop(MetaCols: _*).schema
    payload.fields.foreach { f =>
      f.dataType match {
        case IntegerType | LongType | FloatType | DoubleType |
             StringType | BooleanType => ()
        case other => throw new IllegalArgumentException(
          s"$path: payload column ${f.name} of type ${other.sql} is not " +
            "modeled by the log-merge decoder — refusing")
      }
    }
    // log file order: slice base instant, then NUMERIC log version (the
    // name's `.log.N` — lexicographic would put 10 before 2), then name
    // — the order Hudi's own log scanner replays
    def orderKey(rel: String): (String, Long, String) = {
      rel.split("/").last match {
        case LogName(_, baseTs, v, _) => (baseTs, v.toLong, rel)
        case _                        => ("", Long.MaxValue, rel)
      }
    }
    // a log file appended to across several deltacommits is listed by
    // each of them — read it once
    val ordered = logs.map(_.path).distinct.sortBy(orderKey)
      .map(rel => s"$path/$rel").zipWithIndex
    val fileOrder = ordered.toMap
    val paths = ordered.map(_._1)
    // log files are HIDDEN files (leading dot) — Spark's file sources
    // filter those out unconditionally, so the scan is an RDD over the
    // planned paths with executor-side Hadoop reads (log files are
    // bounded by Hudi's roll size; one fits an executor)
    val confW = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    def bytesOf(p: String): Array[Byte] = {
      val hp = new Path(p)
      val f = hp.getFileSystem(confW.value)
      val in = f.open(hp)
      try in.readAllBytes() finally in.close()
    }
    val pathsRdd = spark.sparkContext.parallelize(paths,
      math.max(1, math.min(paths.size, 64)))
    // pass 1 (headers only): rollback targets
    val targets: Set[String] = pathsRdd.flatMap { p =>
      parseBlocks(bytesOf(p), p).iterator.collect {
        case b if b.tpe == CommandBlock &&
            b.header.get(HCommand).forall(_.trim == "0") =>
          b.header.getOrElse(HTarget, "")
      }.filter(_.nonEmpty)
    }.collect().toSet
    // pass 2: decode data + delete blocks (skipping rolled-back
    // instants) into (key, partition, fileId, isDelete, fileOrder,
    // blockIdx, recIdx, payload...) rows
    val names = payload.fieldNames.toSeq
    val types = payload.fields.map(f => f.name -> f.dataType).toMap
    val outSchema = StructType(
      StructField(KeyCol, StringType) +:
      StructField("__g_part", StringType) +:
      StructField("__g_fid", StringType) +:
      StructField("__g_del", BooleanType) +:
      StructField("__g_fo", IntegerType) +:
      StructField("__g_bi", IntegerType) +:
      StructField("__g_ri", IntegerType) +: payload.fields)
    val foB = spark.sparkContext.broadcast(fileOrder)
    // the slice identity of each planned log path (file-count-sized)
    val sliceOf: Map[String, (String, String)] = logs
      .map(l => s"$path/${l.path}" -> (l.partition, l.fileId)).toMap
    val slB = spark.sparkContext.broadcast(sliceOf)
    val tgB = spark.sparkContext.broadcast(targets)
    val okB = spark.sparkContext.broadcast(completedTs)
    val blockNames = BlockNames
    val nulls = names.map(_ => null)
    val rdd = pathsRdd.flatMap { p =>
      val bytes = bytesOf(p)
      val fo = foB.value(p)
      val (part, fid) = slB.value(p)
      def live(b: LogBlock): Boolean =
        // snapshot isolation + time travel: blocks of instants NOT in
        // the completed-≤-asOf timeline (in-flight appends, crashed
        // writers, future commits) never serve; rolled-back instants
        // skip via the command-block targets
        okB.value.contains(b.header.getOrElse(HInstant, "")) &&
          !tgB.value.contains(b.header.getOrElse(HInstant, ""))
      parseBlocks(bytes, p).iterator.zipWithIndex.flatMap {
        case (b, bi) =>
          if (b.tpe == CommandBlock) Iterator.empty
          else if (b.tpe != AvroBlock && b.tpe != DeleteBlock &&
              b.tpe != ParquetBlock)
            throw new IllegalArgumentException(
              s"$p: log block type ${blockNames.getOrElse(b.tpe,
                b.tpe.toString)} is not modeled by this reader " +
                "(AVRO_DATA_BLOCK, PARQUET_DATA_BLOCK, DELETE_BLOCK " +
                "and rollback COMMAND_BLOCK only) — refusing rather " +
                "than serving a partial merge")
          else if (!live(b)) Iterator.empty
          else if (b.tpe == DeleteBlock)
            decodeDeleteBlock(b.content, p).iterator.zipWithIndex.map {
              case (key, ri) =>
                Row.fromSeq(key +: part +: fid +: Boolean.box(true) +:
                  Int.box(fo) +: Int.box(bi) +: Int.box(ri) +: nulls)
            }
          else if (b.tpe == ParquetBlock)
            decodeParquetBlock(b.content, p).zipWithIndex.map {
              case (rec, ri) =>
                val key = rec.get(KeyCol).map(_.toString).getOrElse(
                  throw new IllegalArgumentException(
                    s"$p: parquet log record carries no $KeyCol — refusing"))
                val vals = names.map { n =>
                  (rec.get(n), types(n)) match {
                    case (None, _)              => null
                    case (Some(x), StringType)  => x.toString
                    case (Some(x), LongType)    =>
                      Long.box(x.toString.toLong)
                    case (Some(x), IntegerType) =>
                      Int.box(x.toString.toInt)
                    case (Some(x), DoubleType)  =>
                      Double.box(x.toString.toDouble)
                    case (Some(x), FloatType)   =>
                      Float.box(x.toString.toFloat)
                    case (Some(x), BooleanType) =>
                      Boolean.box(x.toString.toBoolean)
                    case (Some(x), other) => throw new IllegalStateException(
                      s"unreachable payload type $other for $x")
                  }
                }
                Row.fromSeq(key +: part +: fid +: Boolean.box(false) +:
                  Int.box(fo) +: Int.box(bi) +: Int.box(ri) +: vals)
            }
          else {
            val schema = b.header.getOrElse(HSchema,
              throw new IllegalArgumentException(
                s"$p: avro data block carries no SCHEMA header — refusing"))
            decodeAvroBlock(b.content, schema, p).zipWithIndex.map {
              case (rec, ri) =>
                def v(n: String): AnyRef = {
                  val f = rec.getSchema.getField(n)
                  if (f == null) null else rec.get(n)
                }
                val key = Option(v(KeyCol)).map(_.toString).getOrElse(
                  throw new IllegalArgumentException(
                    s"$p: log record carries no $KeyCol — refusing"))
                val vals = names.map { n =>
                  (Option(v(n)), types(n)) match {
                    case (None, _)              => null
                    case (Some(x), StringType)  => x.toString
                    case (Some(x), LongType)    =>
                      Long.box(x.toString.toLong)
                    case (Some(x), IntegerType) =>
                      Int.box(x.toString.toInt)
                    case (Some(x), DoubleType)  =>
                      Double.box(x.toString.toDouble)
                    case (Some(x), FloatType)   =>
                      Float.box(x.toString.toFloat)
                    case (Some(x), BooleanType) =>
                      Boolean.box(x.toString.toBoolean)
                    case (Some(x), other) => throw new IllegalStateException(
                      s"unreachable payload type $other for $x")
                  }
                }
                Row.fromSeq(key +: part +: fid +: Boolean.box(false) +:
                  Int.box(fo) +: Int.box(bi) +: Int.box(ri) +: vals)
            }
          }
      }
    }
    val logRows = spark.createDataFrame(rdd, outSchema)
    val SliceKey = Seq("__g_part", "__g_fid", KeyCol)
    // last write wins per (slice, key): max_by over the arrival order;
    // a winning delete carries __g_del=true and null payloads
    val winner = logRows.groupBy(SliceKey.map(col): _*).agg(
      max_by(struct(col("__g_del") +: names.map(col): _*),
        struct(col("__g_fo"), col("__g_bi"), col("__g_ri"))).as("__p"))
      .select(SliceKey.map(col) ++
        (col("__p.__g_del").as("__g_del") +:
          names.map(n => col(s"__p.$n"))): _*)
    // base rows recover their slice identity from the meta columns: the
    // partition path directly, the fileId via a broadcast join on the
    // base file NAME (planned, file-count-sized) — parsing the name
    // would re-derive what the planner already knows
    import spark.implicits._
    val sliceDf = broadcast(bases
      .map(s => (s.path.split("/").last, s.partition, s.fileId))
      .toDF("__g_fn", "__g_part", "__g_fid"))
    val baseKeyed = base
      .join(sliceDf, col("_hoodie_file_name") === col("__g_fn"))
      .select(SliceKey.map(col) ++ names.map(col): _*)
    // any winner (update OR delete) shadows the slice's base row; only
    // non-delete winners contribute rows back
    baseKeyed
      .join(winner.select(SliceKey.map(col): _*), SliceKey, "left_anti")
      .unionByName(winner.filter(!col("__g_del")).drop("__g_del"))
      .drop(KeyCol)
  }
}
