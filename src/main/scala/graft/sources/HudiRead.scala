package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Read-only Apache Hudi COPY_ON_WRITE table reader — the third
  * open-table-format interop leg next to [[DeltaRead]] and
  * [[IcebergRead]], built purely from the PUBLIC Hudi storage layout
  * (hudi.apache.org/docs — timeline + base-file naming):
  *
  *   - `.hoodie/hoodie.properties` declares the table (java
  *     properties; `hoodie.table.type` must be COPY_ON_WRITE);
  *   - the timeline is the set of `.hoodie/<instantTs>.commit` files —
  *     a commit is COMPLETED only when that exact name exists
  *     (`.commit.requested` / `.commit.inflight` are in-flight states
  *     and are ignored, which is what gives readers snapshot
  *     isolation against concurrent writers);
  *   - each completed commit's JSON (`partitionToWriteStats`) lists the
  *     base files it wrote as (partition → [{fileId, path, ...}]);
  *   - COW queries resolve FILE SLICES: within a (partition, fileId)
  *     file group, only the base file written by the LATEST completed
  *     instant ≤ the as-of instant is live — an upsert rewrites the
  *     whole group under the same fileId with a newer instant, so
  *     older slices are shadowed, never merged.
  *
  * Scope and non-goals (loudly enforced):
  *   - COPY_ON_WRITE fully; MERGE_ON_READ at COMPACTED or insert-only
  *     instants (deltacommits join the timeline, base files are
  *     authoritative once a compaction instant ≥ every log write in the
  *     file group has landed) — a file group whose log files OUTRUN its
  *     base file is REFUSED rather than served stale (log-block merging
  *     at read time stays out of scope: the log format is a versioned
  *     binary block stream this planner does not parse);
  *   - `replacecommit` instants (clustering / insert_overwrite replace
  *     whole file groups OUT of line with the fileId-shadowing rule) —
  *     REFUSED;
  *   - a non-empty `.hoodie/archived` timeline — file groups last
  *     written before the archival horizon appear in no active commit,
  *     so planning from the active timeline alone would silently
  *     return a row-subset — REFUSED;
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
  * parquet scan.
  */
object HudiRead {
  private val om = new ObjectMapper()

  private val MetaCols = Seq("_hoodie_commit_time", "_hoodie_commit_seqno",
    "_hoodie_record_key", "_hoodie_partition_path", "_hoodie_file_name")

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

  private final case class Slice(partition: String, fileId: String,
                                 instant: String, path: String)

  /** Live base files at `asOf` ("" = latest): latest completed slice
    * per (partition, fileId) file group.
    */
  private def liveSlices(spark: SparkSession, path: String,
                         asOf: String): Seq[Slice] = {
    val f = fs(spark, path)
    // an archived timeline means file groups whose LAST write was
    // archived appear in no active commit — planning from the active
    // timeline alone would silently return a row-subset; refuse.
    // Pre-1.x archives under .hoodie/archived; 1.x keeps an LSM history
    // under .hoodie/timeline/history.
    Seq(".hoodie/archived", ".hoodie/timeline/history").foreach { rel =>
      val archived = new Path(path, rel)
      require(!f.exists(archived) || f.listStatus(archived).isEmpty,
        s"$path: $rel is non-empty — file groups last written before " +
          "the archival horizon are invisible to the active timeline, " +
          "so this planner refuses rather than return a silent " +
          "row-subset")
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
    timeline.foreach {
      case Replace(ts) => throw new IllegalArgumentException(
        s"$path: replacecommit $ts in the timeline (clustering / " +
          "insert_overwrite replaces file groups out of line with the " +
          "fileId-shadowing rule) — this read-only planner refuses " +
          "rather than misreading")
      case _ => ()
    }
    // (requested instant, completed-instant file name) — commits plus,
    // on MOR tables, deltacommits
    val completed = timeline.collect {
      case n @ Completed(ts)   => (ts, n)
      case n @ CompletedDc(ts) => (ts, n)
    }.filter { case (ts, _) => asOf.isEmpty || ts <= asOf }.sortBy(_._1)
    require(completed.nonEmpty,
      s"$path: no completed commit" +
        (if (asOf.nonEmpty) s" at or before instant $asOf" else ""))
    val slices = completed.flatMap { case (ts, name) =>
      val in = f.open(new Path(timelineDir, name))
      val node =
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
      node.path("partitionToWriteStats").properties().asScala.flatMap { e =>
        e.getValue.elements().asScala.map { ws =>
          Slice(e.getKey, ws.path("fileId").asText(), ts,
            ws.path("path").asText())
        }
      }
    }
    // MOR: deltacommits may have landed LOG files (row updates pending
    // compaction). A log write is superseded once a compaction lands a
    // base file at a LATER instant in the same file group; a log write
    // newer than its group's latest base file means the base file is
    // STALE — merging is out of scope, so refuse loudly instead of
    // silently serving pre-update rows.
    val (logs, bases) = slices.partition(_.path.contains(".log."))
    val latestBase = bases.groupBy(s => (s.partition, s.fileId))
      .map { case (g, ss) => g -> ss.map(_.instant).max }
    logs.foreach { l =>
      val baseTs = latestBase.get((l.partition, l.fileId))
      require(baseTs.exists(_ >= l.instant),
        s"$path: file group ${l.fileId} has an uncompacted log file " +
          s"(${l.path} at instant ${l.instant}, latest base " +
          s"${baseTs.getOrElse("none")}) — log-file merging is out of " +
          "scope for this planner; compact the table or read a " +
          "compacted instant, refusing rather than serving stale rows")
    }
    bases.groupBy(s => (s.partition, s.fileId))
      .values.map(_.maxBy(_.instant)).toSeq.sortBy(_.path)
  }

  /** The table as a DataFrame at instant `asOf` ("" = latest snapshot).
    * Hudi meta columns are dropped; COW base files carry every payload
    * column (including partition fields), so no hive-layout recovery
    * is needed.
    */
  def read(spark: SparkSession, path: String, asOf: String = "")
      : DataFrame = {
    val pr = props(spark, path)
    val tpe = pr.getProperty("hoodie.table.type", "COPY_ON_WRITE")
    require(tpe == "COPY_ON_WRITE" || tpe == "MERGE_ON_READ",
      s"$path: hoodie.table.type=$tpe unknown to this planner — refusing")
    // MERGE_ON_READ reads are supported at COMPACTED (or insert-only)
    // instants: base files are authoritative there. A file group whose
    // log files outrun its base file refuses inside liveSlices — this
    // planner never merges log blocks at read time.
    val slices = liveSlices(spark, path, asOf)
    val df = spark.read.parquet(slices.map(s => s"$path/${s.path}"): _*)
    df.drop(MetaCols: _*)
  }
}
