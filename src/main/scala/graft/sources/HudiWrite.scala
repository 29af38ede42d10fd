package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Apache Hudi COPY_ON_WRITE writer — the write side of the third
  * open-table-format leg, built purely from the PUBLIC Hudi storage
  * layout (hudi.apache.org/tech-specs), and cross-validated against
  * this repo's own [[HudiRead]] exactly the way the Delta and Iceberg
  * legs validate writer-against-reader:
  *
  *   - `create(df, path, keyCol)` lays down `.hoodie/hoodie.properties`
  *     (COPY_ON_WRITE, record key field declared) and the first commit;
  *   - `insert(df, path, keyCol)` lands new FILE GROUPS (Hudi's
  *     bulk-insert shape — no key merging; the caller owns key
  *     uniqueness across inserts, exactly Hudi's insert contract);
  *   - `upsert(source, path, keyCol)` is copy-on-write MERGE: affected
  *     file groups (footer-stats-pruned on the record-key range, then
  *     one distributed membership scan) are rewritten under the SAME
  *     fileId at the new instant — the fileId-shadowing rule readers
  *     plan by — with source rows replacing matched keys; unmatched
  *     source keys land as a fresh file group;
  *   - `delete(spark, path, predicate)` rewrites only the groups whose
  *     files actually hold matches (SQL semantics: NULL-predicate rows
  *     are kept);
  *   - `insertBatch(df, path, keyCol, appId, batchId)` is EXACTLY-ONCE
  *     streaming insert: the per-app watermark rides the commit's
  *     `extraMetadata` (the same public mechanism Hudi's own streaming
  *     ingest uses for its checkpoint key), so a replayed micro-batch
  *     is a detected no-op.
  *
  * Every write lands the five `_hoodie_*` meta columns a Hudi data file
  * carries (commit time, seqno, record key, partition path, file name —
  * the file name is derivable IN-ROW because file groups are named
  * `{fileId}_{token}_{instant}.parquet` and the fileId rides the write
  * plan as a shadow column).
  *
  * Timeline protocol: instants are 17-digit numeric strings ordered
  * lexicographically (wall-clock `yyyyMMddHHmmssSSS` at create, then
  * STRICTLY max+1 — so two racing writers target the SAME next instant
  * and the `<instant>.commit` file is published put-if-absent through
  * [[SnapshotTable.storeFor]]: exactly one wins, the loser replans
  * against the new timeline — the optimistic-concurrency discipline
  * every other graft writer follows, here doubling as Hudi's
  * single-writer-per-instant rule). `.commit.requested` and
  * `.commit.inflight` markers land first per the protocol, so a
  * crashed writer leaves an in-flight instant readers ignore (and the
  * archival coverage check excuses).
  *
  * Partitioned tables (round-10 continuation): `create(df, path, key,
  * partitionField)` declares `hoodie.table.partition.fields`; file
  * groups live under one directory per partition VALUE (Hudi's default
  * non-hive partition-path encoding), `_hoodie_partition_path` is
  * written in-row, and upsert/delete merge per (partition, key) — the
  * NON-GLOBAL index semantics HudiRead's per-slice merge expects, so a
  * key legally repeated across partitions never cross-merges. NULL or
  * empty partition values refuse loudly (their directory encoding is
  * ambiguous across readers).
  *
  * MERGE_ON_READ tables (round-10 continuation): `create(..,
  * tableType="MERGE_ON_READ")` + `upsertLog(source, path, key)` — the
  * streaming-upsert shape Hudi exists for: matched keys APPEND one
  * avro log block per affected file slice (O(source); the read pays
  * the merge) instead of rewriting whole groups, unmatched keys land
  * as a fresh base group in the SAME deltacommit, and routing is by
  * the slice that currently HOLDS each (partition, key) — base files
  * plus the live log records — so a log-inserted key updates in place
  * instead of duplicating. MOR writes publish `deltacommit` instants;
  * COW-rewrite `upsert`/`delete` refuse on MOR tables by name (and
  * `upsertLog` refuses on COW).
  *
  * Scope (loudly enforced): one record-key column and at most one
  * partition field, cast to string per Hudi's encoding; unknown table
  * types refuse every write.
  */
object HudiWrite {
  private val om = new ObjectMapper()

  private val MetaCols = Seq("_hoodie_commit_time", "_hoodie_commit_seqno",
    "_hoodie_record_key", "_hoodie_partition_path", "_hoodie_file_name")

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val CompletedName = """(\d+)(?:_\d+)?\.(commit|deltacommit|replacecommit)""".r
  private val AnyInstant = """(\d+)(?:_\d+)?\..*""".r

  private def instantFmt = {
    val f = new java.text.SimpleDateFormat("yyyyMMddHHmmssSSS")
    f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    f
  }

  /** Next instant: strictly greater than every instant NAME in the
    * timeline (completed, inflight, or requested — a pending writer's
    * instant must not be reused), and at least wall-clock so a fresh
    * table starts at a Hudi-shaped timestamp.
    */
  private def nextInstant(f: org.apache.hadoop.fs.FileSystem,
                          path: String): String = {
    // the ARCHIVED timeline counts too: after archive() moves the
    // completed prefix aside, a fresh instant must still be strictly
    // greater than every instant the table has EVER used — reusing an
    // archived number would shadow archived history
    val seen = Seq(".hoodie", ".hoodie/archived")
      .map(new Path(path, _)).filter(f.exists)
      .flatMap(d => f.listStatus(d).map(_.getPath.getName).toSeq)
      .collect { case AnyInstant(ts) => ts }
    val wall = instantFmt.format(new java.util.Date())
    val floor = if (seen.isEmpty) wall else seen.max
    if (wall > floor) wall
    else (BigInt(floor) + 1).toString.reverse.padTo(17, '0').reverse
  }

  private def tableProps(spark: SparkSession, path: String)
      : java.util.Properties = {
    val p = new Path(path, ".hoodie/hoodie.properties")
    val f = fs(spark, path)
    require(f.exists(p), s"$path is not a Hudi table — use create")
    val in = f.open(p)
    val pr = new java.util.Properties()
    try pr.load(in) finally in.close()
    pr
  }

  private def tableTypeOf(spark: SparkSession, path: String): String = {
    val t = tableProps(spark, path).getProperty("hoodie.table.type")
    require(t == "COPY_ON_WRITE" || t == "MERGE_ON_READ",
      s"$path: hoodie.table.type=$t unknown to this writer — refusing")
    t
  }

  private def requireCow(spark: SparkSession, path: String): Unit =
    require(tableTypeOf(spark, path) == "COPY_ON_WRITE",
      s"$path: this operation is COPY_ON_WRITE only (MERGE_ON_READ " +
        "tables take upsertLog) — refusing")

  private def requireMor(spark: SparkSession, path: String): Unit =
    require(tableTypeOf(spark, path) == "MERGE_ON_READ",
      s"$path: log operations (upsertLog/deleteLog) are MERGE_ON_READ " +
        "only (COPY_ON_WRITE tables take upsert/delete) — refusing")

  /** The completed-instant kind this table's writes publish:
    * deltacommit on MOR (log-file or insert base-file writes), commit
    * on COW — exactly the naming [[HudiRead]] plans by.
    */
  private def instantKind(spark: SparkSession, path: String): String =
    if (tableTypeOf(spark, path) == "MERGE_ON_READ") "deltacommit"
    else "commit"

  /** The table's declared record-key field (written by create). */
  private def recordKeyOf(spark: SparkSession, path: String): String = {
    val k = tableProps(spark, path)
      .getProperty("hoodie.table.recordkey.fields")
    require(k != null && k.nonEmpty && !k.contains(","),
      s"$path: hoodie.table.recordkey.fields must declare exactly one " +
        "column for this writer — refusing")
    k
  }

  /** The table's declared partition field (None = unpartitioned). */
  private def partitionFieldOf(spark: SparkSession, path: String)
      : Option[String] = {
    val p = tableProps(spark, path)
      .getProperty("hoodie.table.partition.fields")
    Option(p).filter(_.nonEmpty).map { v =>
      require(!v.contains(","),
        s"$path: at most one partition field for this writer — refusing")
      v
    }
  }

  /** One write unit bound for the table: the target (partition, fileId),
    * the prior instant of that group ("null" for a fresh group), and
    * the rows.
    */
  private final case class Landed(partition: String, fileId: String,
                                  rel: String, rows: Long, size: Long,
                                  prevCommit: String)

  /** Land `df` (payload columns plus the `__pp`/`__fg` shadow columns:
    * target partition path — "" on unpartitioned tables — and target
    * fileId) as one file PER (partition, fileId), named
    * `[{partition}/]{fileId}_0-0-0_{instant}.parquet`, with the five
    * Hudi meta columns written in-row. The stage write repartitions BY
    * `__fg` so each group is a single task's single file; `partitionBy`
    * strips the shadow columns from the data. Empty-string/NULL
    * partition values on a partitioned table refuse (their directory
    * encoding is ambiguous).
    */
  private def land(df: DataFrame, path: String, keyCol: String,
                   instant: String, prevOf: Map[String, String],
                   partitioned: Boolean,
                   token: String = "0-0-0",
                   prePartitioned: Boolean = false): Seq[Landed] = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    if (partitioned) {
      val bad = df.filter(col("__pp").isNull || col("__pp") === "")
        .limit(1).collect()
      require(bad.isEmpty,
        s"$path: NULL/empty partition value in the write batch — the " +
          "directory encoding is ambiguous across readers, refusing")
      // partition values become DIRECTORY names read back through
      // Hadoop's glob-expanding path resolution: a separator, glob
      // metacharacter, or control char would land fine and then make
      // every read of the partition fail (or match the wrong paths) —
      // refuse at write time instead of bricking reads
      val unsafe = df
        .filter(col("__pp").rlike("[/\\\\*?\\[\\]{}\\x00-\\x1f]"))
        .limit(1).collect()
      require(unsafe.isEmpty,
        s"$path: partition value ${unsafe.headOption} contains a path " +
          "separator, glob metacharacter, or control character — its " +
          "directory encoding is not round-trippable, refusing")
    }
    val withMeta = df
      .withColumn("_hoodie_commit_time", lit(instant))
      .withColumn("_hoodie_commit_seqno",
        concat(lit(s"${instant}_0_"), monotonically_increasing_id()))
      .withColumn("_hoodie_record_key", col(keyCol).cast("string"))
      .withColumn("_hoodie_partition_path",
        if (partitioned) col("__pp") else lit(""))
      .withColumn("_hoodie_file_name",
        concat(col("__fg"), lit(s"_${token}_$instant.parquet")))
      // meta columns FIRST, payload after — the column order Hudi's own
      // writer produces
      .select((MetaCols.map(col) ++
        df.columns.filterNot(Set("__fg", "__pp")).map(col) ++
        (if (partitioned) Seq(col("__pp")) else Nil) :+ col("__fg")): _*)
    val stage = new Path(path,
      s".stage-${java.util.UUID.randomUUID().toString}")
    val stageCols = if (partitioned) Seq("__pp", "__fg") else Seq("__fg")
    try {
      // prePartitioned: the caller already co-located each __fg in one
      // task (e.g. cluster's range bins, whose sort order a reshuffle
      // would destroy) — partitionBy alone then emits one file per
      // (task, __fg), and __fg is task-unique by construction
      (if (prePartitioned) withMeta
       else withMeta.repartition(col("__fg")))
        .write.partitionBy(stageCols: _*).parquet(stage.toString)
      def groupDirs: Seq[(String, Path)] =
        if (!partitioned)
          f.listStatus(stage).filter(_.isDirectory).toSeq
            .filter(_.getPath.getName.startsWith("__fg="))
            .map(d => ("", d.getPath))
        else f.listStatus(stage).filter(_.isDirectory).toSeq
          .filter(_.getPath.getName.startsWith("__pp=")).flatMap { pd =>
            val pp = PathCodec.percentDecode(
              pd.getPath.getName.stripPrefix("__pp="))
            f.listStatus(pd.getPath).filter(_.isDirectory)
              .filter(_.getPath.getName.startsWith("__fg="))
              .map(d => (pp, d.getPath))
          }
      groupDirs.map { case (pp, d) =>
        val fileId = PathCodec.percentDecode(
          d.getName.stripPrefix("__fg="))
        val parts = f.listStatus(d)
          .filter(_.getPath.getName.endsWith(".parquet"))
        require(parts.length == 1,
          s"$path: group $fileId staged ${parts.length} files — the " +
            "repartition-by-group invariant broke, refusing")
        val name = s"${fileId}_${token}_$instant.parquet"
        val rel = if (pp.isEmpty) name else s"$pp/$name"
        val target = new Path(path, rel)
        f.mkdirs(target.getParent)
        require(f.rename(parts.head.getPath, target),
          s"$path: failed to land $rel")
        Landed(pp, fileId, rel, FileStats.rowCount(spark, path, rel),
          f.getFileStatus(target).getLen,
          prevOf.getOrElse(fileId, "null"))
      }
    } finally {
      f.delete(stage, true)
    }
  }

  /** Land one EMPTY shadowing slice (a group whose every row was
    * deleted): `coalesce(1)` keeps Spark emitting exactly one part file
    * even for zero rows, so the new slice exists on disk and shadows
    * the old one.
    */
  private def landEmptySlice(payload: DataFrame, path: String,
                             keyCol: String, partition: String,
                             fileId: String, instant: String,
                             prev: String,
                             token: String = "0-0-0"): Landed = {
    val spark = payload.sparkSession
    val f = fs(spark, path)
    val name = s"${fileId}_${token}_$instant.parquet"
    val rel = if (partition.isEmpty) name else s"$partition/$name"
    val empty = payload.limit(0)
    val withMeta = empty
      .withColumn("_hoodie_commit_time", lit(instant))
      .withColumn("_hoodie_commit_seqno", lit(s"${instant}_0_0"))
      .withColumn("_hoodie_record_key", col(keyCol).cast("string"))
      .withColumn("_hoodie_partition_path", lit(partition))
      .withColumn("_hoodie_file_name", lit(name))
      .select((MetaCols.map(col) ++ empty.columns.map(col)): _*)
    val stage = new Path(path,
      s".stage-${java.util.UUID.randomUUID().toString}")
    try {
      withMeta.coalesce(1).write.parquet(stage.toString)
      val part = f.listStatus(stage)
        .filter(_.getPath.getName.endsWith(".parquet"))
      require(part.length == 1,
        s"$path: empty-slice stage wrote ${part.length} files")
      val target = new Path(path, rel)
      f.mkdirs(target.getParent)
      require(f.rename(part.head.getPath, target),
        s"$path: failed to land $rel")
      Landed(partition, fileId, rel, 0L,
        f.getFileStatus(target).getLen, prev)
    } finally f.delete(stage, true)
  }

  // Serialized with the ObjectMapper throughout: partition values and
  // file paths are DATA (a quote/backslash/control char in a partition
  // value is legal where the land gate only refuses NULL/empty), and a
  // hand-built string would emit invalid JSON the reader's om.readTree
  // then refuses — one bad value permanently bricking the table.
  private def commitJson(landed: Seq[Landed], operation: String,
                         extraMetadata: Map[String, String],
                         replaced: Map[String, Seq[String]] = Map.empty)
      : String = {
    val root = om.createObjectNode()
    val parts = root.putObject("partitionToWriteStats")
    landed.groupBy(_.partition).toSeq.sortBy(_._1).foreach {
      case (pp, ls) =>
        val arr = parts.putArray(pp)
        ls.sortBy(_.rel).foreach { l =>
          val n = arr.addObject()
          n.put("fileId", l.fileId)
          n.put("path", l.rel)
          n.put("prevCommit", l.prevCommit)
          n.put("numWrites", l.rows)
          n.put("fileSizeInBytes", l.size)
        }
    }
    if (replaced.nonEmpty) {
      val rep = root.putObject("partitionToReplaceFileIds")
      replaced.toSeq.sortBy(_._1).foreach { case (pp, fids) =>
        val arr = rep.putArray(pp)
        fids.sorted.foreach(arr.add)
      }
    }
    root.put("operation", operation)
    if (extraMetadata.nonEmpty) {
      val e = root.putObject("extraMetadata")
      extraMetadata.toSeq.sortBy(_._1).foreach { case (k, v) =>
        e.put(k, v)
      }
    }
    om.writeValueAsString(root)
  }

  /** Publish `<instant>.commit` put-if-absent after landing the
    * protocol's requested/inflight markers. Returns false when another
    * writer completed this instant first (caller replans).
    * `kindOverride` lets a MOR COMPACTION publish `commit` (the spec's
    * name for a completed compaction on a MERGE_ON_READ timeline)
    * where ordinary MOR writes publish `deltacommit`.
    */
  private def publish(spark: SparkSession, path: String, instant: String,
                      json: String,
                      kindOverride: Option[String] = None): Boolean = {
    val kind = kindOverride.getOrElse(instantKind(spark, path))
    val f = fs(spark, path)
    val dir = new Path(path, ".hoodie")
    f.mkdirs(dir)
    val store = SnapshotTable.storeFor(f.getScheme)
    // Kind-NEUTRAL instant reservation first: two racers of DIFFERENT
    // completed kinds (a deltacommit ingest vs a compaction's commit)
    // would otherwise arbitrate on different completed file names and
    // both win the same instant. The lock file matches the protocol's
    // pending shape (readers ignore it; the archival coverage check
    // excuses it; nextInstant counts it so the loser replans forward).
    val lockTmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    f.create(lockTmp, true).close()
    val reserved = store.publishIfAbsent(f, lockTmp,
      new Path(dir, s"$instant.inflight"))
    f.delete(lockTmp, false)
    if (!reserved) return false
    Seq(s"$instant.$kind.requested", s"$instant.$kind.inflight")
      .foreach { n =>
        val out = f.create(new Path(dir, n), true)
        out.close()
      }
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val won = store
      .publishIfAbsent(f, tmp, new Path(dir, s"$instant.$kind"))
    f.delete(tmp, false)
    won
  }

  /** Archived instants are immutable once moved — [[archive]] only
    * ADDS files under `.hoodie/archived` — so their per-app watermark
    * fold is cached per (path, appId): each micro-batch then pays
    * O(active timeline) JSON parses plus ONE archived-dir listing,
    * parsing only archived names not yet folded. Without this, the
    * exactly-once check inside every insertBatch/upsertLogBatch retry
    * cost O(all instants ever written) driver RPCs per batch and grew
    * without bound on long-lived streaming tables.
    */
  private val archivedWmCache = new java.util.concurrent
    .ConcurrentHashMap[(String, String), (Set[String], Long)]()

  /** Per-app exactly-once watermark: max batchId over every completed
    * commit's `extraMetadata` entry for this app (the public
    * extraMetadata mechanism Hudi streaming ingest checkpoints with).
    */
  private def watermark(spark: SparkSession, path: String,
                        appId: String): Long = {
    val f = fs(spark, path)
    def wmOf(dir: Path, names: Seq[String]): Long =
      names.collect {
        case n @ CompletedName(_, "commit" | "deltacommit") =>
          val in = f.open(new Path(dir, n))
          val node =
            try om.readTree(new String(in.readAllBytes(), "UTF-8"))
            finally in.close()
          val e = node.path("extraMetadata").path(s"graft.txn.$appId")
          if (e.isMissingNode || e.isNull) -1L else e.asText().toLong
      }.foldLeft(-1L)(math.max)
    val activeDir = new Path(path, ".hoodie")
    val active =
      if (!f.exists(activeDir)) -1L
      else wmOf(activeDir,
        f.listStatus(activeDir).map(_.getPath.getName).toSeq)
    // the ARCHIVED timeline counts: archive() moves old completed
    // instants aside but their extraMetadata watermarks must survive —
    // a replayed batch whose commit was archived is still a replay
    val archivedDir = new Path(path, ".hoodie/archived")
    val archived =
      if (!f.exists(archivedDir)) -1L
      else {
        val names =
          f.listStatus(archivedDir).map(_.getPath.getName).toSet
        val key = (path, appId)
        val (seen0, prevMax0) = Option(archivedWmCache.get(key))
          .getOrElse((Set.empty[String], -1L))
        // a previously-seen archived instant that is GONE means this
        // is not the table the cache folded (dropped and recreated at
        // the same path) — carrying the old incarnation's watermark
        // forward would make the new table's first batches look like
        // replays (silent data loss), so re-fold from scratch
        val (seen, prevMax) =
          if ((seen0 -- names).nonEmpty) (Set.empty[String], -1L)
          else (seen0, prevMax0)
        val newMax =
          math.max(prevMax, wmOf(archivedDir, (names -- seen).toSeq))
        archivedWmCache.put(key, (names, newMax))
        newMax
      }
    math.max(active, archived)
  }

  /** Create the table and land the first commit. `partitionField`
    * (optional) declares one partition column — file groups then live
    * under one directory per partition value. Returns the instant.
    */
  def create(df: DataFrame, path: String, keyCol: String,
             partitionField: String = "",
             tableType: String = "COPY_ON_WRITE"): String = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    require(!f.exists(new Path(path, ".hoodie/hoodie.properties")),
      s"$path already is a Hudi table — use insert/upsert")
    require(df.columns.contains(keyCol),
      s"record key column $keyCol not in ${df.columns.mkString(",")}")
    require(tableType == "COPY_ON_WRITE" || tableType == "MERGE_ON_READ",
      s"tableType $tableType unknown — refusing")
    if (partitionField.nonEmpty)
      require(df.columns.contains(partitionField),
        s"partition column $partitionField not in " +
          df.columns.mkString(","))
    val h = new Path(path, ".hoodie")
    f.mkdirs(h)
    val props = new Path(h, "hoodie.properties")
    val out = f.create(props, false)
    try out.write(
      ("hoodie.table.name=" + new Path(path).getName + "\n" +
        s"hoodie.table.type=$tableType\n" +
        "hoodie.table.version=6\n" +
        s"hoodie.table.recordkey.fields=$keyCol\n" +
        (if (partitionField.isEmpty) ""
         else s"hoodie.table.partition.fields=$partitionField\n"))
        .getBytes("UTF-8"))
    finally out.close()
    insert(df, path, keyCol)
  }

  /** Land new file groups (bulk-insert shape: no key merging). Group
    * count follows the input's partition count (capped), groups
    * assigned by a hash of the record key so re-runs distribute
    * identically. Returns the instant.
    */
  def insert(df: DataFrame, path: String, keyCol: String): String =
    insertInternal(df, path, keyCol, None)

  /** Latest COMPLETED instant of the timeline — the honest "current
    * head" for no-op returns (the latest base-file instant understates
    * it on tables whose newest write landed only logs or deletes).
    */
  private def latestCompletedInstant(spark: SparkSession,
                                     path: String): String = {
    val f = fs(spark, path)
    val ts = f.listStatus(new Path(path, ".hoodie"))
      .map(_.getPath.getName).collect { case CompletedName(t, _) => t }
    require(ts.nonEmpty, s"$path: no completed instant in the timeline")
    ts.max
  }

  private def insertInternal(df: DataFrame, path: String, keyCol: String,
                             txn: Option[(String, Long)]): String = {
    val spark = df.sparkSession
    tableTypeOf(spark, path) // loud gate; insert works on COW and MOR
    val partField = partitionFieldOf(spark, path)
    partField.foreach(pf => require(df.columns.contains(pf),
      s"insert batch misses partition column $pf"))
    val extraMetadata = txn.map { case (appId, batchId) =>
      Map(s"graft.txn.$appId" -> batchId.toString)
    }.getOrElse(Map.empty[String, String])
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the commit race 10 times")
      // exactly-once gate re-checked on EVERY attempt: a lost race means
      // another writer just landed an instant — possibly a concurrent
      // replay of this very (appId, batchId) — so checking the watermark
      // only once before the loop would let both replays commit
      txn.foreach { case (appId, batchId) =>
        if (watermark(spark, path, appId) >= batchId)
          return latestCompletedInstant(spark, path)
      }
      val f = fs(spark, path)
      val instant = nextInstant(f, path)
      // bin count from a cheap upper bound (input partition count);
      // fileIds derive IN-ROW from (instant, partition, bin) — unique
      // per commit, no driver-side knowledge of the partition values
      val nGroups = math.max(1, math.min(256,
        df.rdd.getNumPartitions)).toInt
      val pp = partField.map(pf => col(pf).cast("string"))
        .getOrElse(lit(""))
      val bin = pmod(xxhash64(col(keyCol).cast("string")), lit(nGroups))
      // a per-attempt salt keeps fileIds unique across RACING writers
      // that computed the same next instant (the loser's files delete
      // on publish failure, but their names must never collide with
      // the winner's)
      val salt = java.util.UUID.randomUUID().toString
      val tagged = df
        .withColumn("__pp", pp)
        .withColumn("__fg",
          md5(concat_ws("#", lit(instant), lit(salt), col("__pp"),
            bin.cast("string"))))
      val landed = land(tagged, path, keyCol, instant, Map.empty,
        partitioned = partField.nonEmpty)
      if (publish(spark, path, instant,
          commitJson(landed, "insert", extraMetadata))) return instant
      // lost the instant to a racer: clean our data files and replan
      landed.foreach(l => f.delete(new Path(path, l.rel), false))
      attempts += 1
    }
    "" // unreachable
  }

  /** EXACTLY-ONCE streaming insert: replayed (appId, batchId ≤
    * watermark) is a detected no-op returning the existing latest
    * instant.
    */
  def insertBatch(df: DataFrame, path: String, keyCol: String,
                  appId: String, batchId: Long): String =
    // the watermark check (and its replayed-batch no-op, safe on tables
    // with no base files) lives INSIDE insertInternal's retry loop
    insertInternal(df, path, keyCol, Some((appId, batchId)))

  /** Copy-on-write UPSERT: at-most-one-source-row-per-key MERGE.
    * Affected file groups rewrite under the SAME fileId at the new
    * instant; unmatched keys land as one fresh group. Returns the
    * instant (or the current latest when the source is empty).
    */
  def upsert(source: DataFrame, path: String, keyCol: String): String = {
    val spark = source.sparkSession
    requireCow(spark, path)
    require(source.columns.contains(keyCol),
      s"record key column $keyCol not in ${source.columns.mkString(",")}")
    require(keyCol == recordKeyOf(spark, path),
      s"$path: upsert key $keyCol != the table's declared record key " +
        s"${recordKeyOf(spark, path)} — refusing")
    val partField = partitionFieldOf(spark, path)
    partField.foreach(pf => require(source.columns.contains(pf),
      s"upsert source misses partition column $pf"))
    // record keys are unique PER PARTITION under the non-global index
    val dupCols = col(keyCol) +: partField.map(col).toSeq
    val dups = source.groupBy(dupCols: _*).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dups.isEmpty,
      s"upsert source has multiple rows for key ${dups.headOption}" +
        " — at most one source row per (partition, key)")
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the commit race 10 times")
      val f = fs(spark, path)
      val (bases, logs, _) = HudiRead.plan(spark, path, "")
      require(logs.isEmpty,
        s"$path: table holds log files — this writer is COW only")
      val instant = nextInstant(f, path)
      // 1. footer-stats prune on the record key range (the Delta-upsert
      // discipline: files whose key interval can't meet the source
      // range are never opened)
      val stats = FileStats.collect(spark, path, bases.map(_.path))
      val keyRange = source.agg(
        min(col(keyCol).cast("string")), max(col(keyCol).cast("string")))
        .head()
      val (loK, hiK) = (keyRange.getString(0), keyRange.getString(1))
      val candidates =
        if (loK == null) Seq.empty
        else bases.filter { b =>
          stats.get(b.path).flatMap(_.get("_hoodie_record_key")) match {
            case Some(cs) if cs.kind == "s" &&
                cs.lo.isDefined && cs.hi.isDefined =>
              !(cs.hi.get < loK || cs.lo.get > hiK)
            case _ => true // no usable stats: must scan
          }
        }
      // 2. one distributed membership scan finds the groups actually
      // holding source (partition, key) pairs
      val srcPp = partField.map(pf => col(pf).cast("string"))
        .getOrElse(lit(""))
      val srcKeyed = source
        .withColumn("__k", col(keyCol).cast("string"))
        .withColumn("__pp", srcPp)
      val hitIds: Set[String] =
        if (candidates.isEmpty) Set.empty
        else {
          val cand = spark.read
            .parquet(candidates.map(b => s"$path/${b.path}"): _*)
            .select(col("_hoodie_record_key").as("__k"),
              col("_hoodie_partition_path").as("__pp"),
              col("_hoodie_file_name").as("fn"))
          cand.join(broadcast(srcKeyed.select("__k", "__pp").distinct()),
              Seq("__k", "__pp"))
            .select("fn").distinct().collect()
            .map(_.getString(0).split("_")(0)).toSet
        }
      val hit = bases.filter(b => hitIds.contains(b.fileId))
      // 3. rewrite each hit group: base rows minus matched pairs, plus
      // the source rows whose (partition, key) lived in THAT group;
      // unmatched source rows become one fresh group per partition
      val payloadCols = source.columns.filterNot(MetaCols.contains)
      val shadowed = Seq(col("__pp"), col("__fg"))
      val rewritten: Option[DataFrame] =
        if (hit.isEmpty) None
        else Some {
          val baseRows = spark.read
            .parquet(hit.map(b => s"$path/${b.path}"): _*)
            .withColumn("__fg",
              split(col("_hoodie_file_name"), "_").getItem(0))
            .withColumn("__pp", col("_hoodie_partition_path"))
          val keep = baseRows
            .join(broadcast(srcKeyed.select("__k", "__pp").distinct()
                .withColumnRenamed("__pp", "__spp")),
              baseRows("_hoodie_record_key") === col("__k") &&
                baseRows("__pp") === col("__spp"), "left_anti")
            .select((payloadCols.map(col) ++ shadowed): _*)
          // match on (key, partition) — the non-global-index identity;
          // a key repeated across partitions must only replace in its
          // own partition
          val replaced = baseRows
            .select(col("_hoodie_record_key").as("__k"),
              col("__pp"), col("__fg"))
            .join(srcKeyed, Seq("__k", "__pp"))
            .select((payloadCols.map(col) ++ shadowed): _*)
          keep.unionByName(replaced)
        }
      val matchedPairs =
        if (hit.isEmpty) srcKeyed.select("__k", "__pp").limit(0)
        else spark.read.parquet(hit.map(b => s"$path/${b.path}"): _*)
          .select(col("_hoodie_record_key").as("__k"),
            col("_hoodie_partition_path").as("__pp")).distinct()
      val fresh = srcKeyed
        .join(matchedPairs, Seq("__k", "__pp"), "left_anti")
        .withColumn("__fg",
          md5(concat_ws("#", lit(instant),
            lit(java.util.UUID.randomUUID().toString), col("__pp"))))
        .select((payloadCols.map(col) ++ shadowed): _*)
      val plan0 = rewritten match {
        case Some(r) => r.unionByName(fresh)
        case None    => fresh
      }
      val prevOf = hit.map(b => b.fileId -> b.instant).toMap
      val landed = land(plan0, path, keyCol, instant, prevOf,
        partitioned = partField.nonEmpty)
      // invariant: every hit group survives the rewrite — its replaced
      // rows carry that group's __fg, so the staged write always emits
      // the shadowing slice
      val missing = hit.map(_.fileId).toSet -- landed.map(_.fileId).toSet
      require(missing.isEmpty,
        s"$path: rewrite lost file groups $missing — refusing to " +
          "commit a plan that would resurrect their old slices")
      if (landed.isEmpty) return latestCompletedInstant(spark, path)
      if (publish(spark, path, instant,
          commitJson(landed, "upsert", Map.empty))) return instant
      landed.foreach(l => f.delete(new Path(path, l.rel), false))
      attempts += 1
    }
    "" // unreachable
  }

  /** Copy-on-write DELETE of rows matching `predicate` (SQL NULL
    * semantics: NULL-predicate rows are kept). Only groups whose files
    * actually hold matches rewrite. Returns the instant, or the current
    * latest when nothing matched.
    */
  def delete(spark: SparkSession, path: String, predicate: String)
      : String = {
    requireCow(spark, path)
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the commit race 10 times")
      val f = fs(spark, path)
      val (bases, logs, _) = HudiRead.plan(spark, path, "")
      require(logs.isEmpty,
        s"$path: table holds log files — this writer is COW only")
      val instant = nextInstant(f, path)
      val all = spark.read.parquet(bases.map(b => s"$path/${b.path}"): _*)
      val hitIds = all.filter(expr(predicate))
        .select(split(col("_hoodie_file_name"), "_").getItem(0).as("fg"))
        .distinct().collect().map(_.getString(0)).toSet
      if (hitIds.isEmpty) return latestCompletedInstant(spark, path)
      val hit = bases.filter(b => hitIds.contains(b.fileId))
      val payloadCols = all.columns.filterNot(MetaCols.contains)
      val partitioned = partitionFieldOf(spark, path).nonEmpty
      val keep = spark.read
        .parquet(hit.map(b => s"$path/${b.path}"): _*)
        .filter(not(coalesce(expr(predicate), lit(false))))
        .withColumn("__fg", split(col("_hoodie_file_name"), "_").getItem(0))
        .withColumn("__pp", col("_hoodie_partition_path"))
        .select((payloadCols.map(col) :+ col("__pp") :+ col("__fg")): _*)
      val prevOf = hit.map(b => b.fileId -> b.instant).toMap
      val keyCol = recordKeyOf(spark, path)
      val landed0 = land(keep, path, keyCol, instant, prevOf,
        partitioned = partitioned)
      // a group whose EVERY row matched still needs an empty shadowing
      // slice — otherwise the reader would keep serving the old one
      val missing = hit.map(_.fileId).toSet -- landed0.map(_.fileId).toSet
      val landed = landed0 ++ missing.toSeq.sorted.map { fid =>
        val old = hit.find(_.fileId == fid).get
        val src = spark.read.parquet(s"$path/${old.path}")
          .select(payloadCols.map(col): _*)
        landEmptySlice(src, path, keyCol, old.partition, fid, instant,
          prevOf.getOrElse(fid, "null"))
      }
      if (publish(spark, path, instant,
          commitJson(landed, "delete", Map.empty))) return instant
      landed.foreach(l => f.delete(new Path(path, l.rel), false))
      attempts += 1
    }
    "" // unreachable
  }

  // ------------------------------------------------------------------
  // MERGE_ON_READ log-upsert
  // ------------------------------------------------------------------

  private val LogVerName = """\.(.+)_(\d+)\.log\.(\d+)(?:_(.+))?""".r

  /** Avro schema JSON for log records: `_hoodie_record_key` plus the
    * payload columns as nullable unions — exactly the leaf set
    * [[HudiRead]]'s merge decoder models.
    */
  private def logAvroSchema(
      payload: org.apache.spark.sql.types.StructType): String = {
    import org.apache.spark.sql.types._
    def avroT(dt: DataType): String = dt match {
      case IntegerType => "int";    case LongType => "long"
      case FloatType => "float";    case DoubleType => "double"
      case StringType => "string";  case BooleanType => "boolean"
      case other => throw new IllegalArgumentException(
        s"payload type ${other.sql} is outside the log-merge decoder's " +
          "modeled set (int/long/float/double/string/boolean) — refusing")
    }
    val fields = (("_hoodie_record_key", "string") +:
      payload.fields.toSeq.map(f => (f.name, avroT(f.dataType))))
      .map { case (n, t) =>
        s"""{"name":"$n","type":["null","$t"],"default":null}"""
      }.mkString(",")
    s"""{"type":"record","name":"graft_log_rec","fields":[$fields]}"""
  }

  /** Ordinal-keyed header/footer map per the public log-block layout. */
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

  /** One `#HUDI#`-framed log block (magic, block size, format version,
    * type ordinal, header map, content length, content, footer map,
    * total length) — the exact layout [[HudiRead.parseBlocks]] decodes.
    */
  private[graft] def frameBlock(tpe: Int, header: Map[Int, String],
                                content: Array[Byte]): Array[Byte] = {
    val hdr = metaBytes(header)
    val ftr = metaBytes(Map.empty)
    val blockSize = 4L + 4 + hdr.length + 8 + content.length +
      ftr.length + 8
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write("#HUDI#".getBytes("UTF-8"))
    out.writeLong(blockSize)
    out.writeInt(1)   // log format version
    out.writeInt(tpe) // block type ordinal
    out.write(hdr)
    out.writeLong(content.length.toLong)
    out.write(content)
    out.write(ftr)
    out.writeLong(6L + 8 + blockSize)
    out.flush(); bos.toByteArray
  }

  /** AVRO_DATA_BLOCK content: 4-byte version, 4-byte record count, then
    * per record a 4-byte length + avro-binary bytes.
    */
  private def avroBlockContent(schemaJson: String,
                               recs: Iterator[Seq[AnyRef]],
                               names: Seq[String]): Array[Byte] = {
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val writer = new org.apache.avro.generic.GenericDatumWriter[
      org.apache.avro.generic.GenericRecord](schema)
    val recBytes = recs.map { vals =>
      val r = new org.apache.avro.generic.GenericData.Record(schema)
      names.zip(vals).foreach { case (n, v) => r.put(n, v) }
      val bos = new java.io.ByteArrayOutputStream()
      val enc = org.apache.avro.io.EncoderFactory.get()
        .binaryEncoder(bos, null)
      writer.write(r, enc); enc.flush()
      bos.toByteArray
    }.toVector
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(3); out.writeInt(recBytes.size)
    recBytes.foreach { b => out.writeInt(b.length); out.write(b) }
    out.flush(); bos.toByteArray
  }

  /** MERGE_ON_READ log-upsert — the streaming-upsert shape Hudi exists
    * for: instead of rewriting whole file groups (COW `upsert`),
    * matched keys APPEND one avro log block per affected file slice
    * (O(source), the read pays the merge), and unmatched keys land as
    * a fresh BASE group in the SAME deltacommit. Routing is by the
    * slice that currently HOLDS each (partition, key) — base files
    * plus [[HudiRead.logKeyPlacement]]'s live log records, so a key
    * inserted by an earlier log block updates IN PLACE instead of
    * duplicating into a new group. Log files are written EXECUTOR-side
    * (one task writes each slice's block; the write token is
    * attempt-unique so a racing loser can never clobber the winner's
    * file), named `.{fileId}_{baseInstant}.log.{version}_{token}` with
    * version = the slice's max existing log version + 1. The commit is
    * one deltacommit; losing the instant race deletes this attempt's
    * files and replans.
    */
  def upsertLog(source: DataFrame, path: String, keyCol: String): String =
    upsertLogInternal(source, path, keyCol, None)

  /** EXACTLY-ONCE streaming MOR log-upsert: the per-app watermark rides
    * the deltacommit's `extraMetadata` exactly like [[insertBatch]],
    * re-checked inside the commit-race retry loop, so a replayed
    * (appId, batchId ≤ watermark) micro-batch — including a
    * wiped-checkpoint restart — is a detected no-op returning the
    * current latest instant.
    */
  def upsertLogBatch(source: DataFrame, path: String, keyCol: String,
                     appId: String, batchId: Long): String =
    upsertLogInternal(source, path, keyCol, Some((appId, batchId)))

  private def upsertLogInternal(source: DataFrame, path: String,
                                keyCol: String,
                                txn: Option[(String, Long)]): String = {
    val spark = source.sparkSession
    requireMor(spark, path)
    require(source.columns.contains(keyCol),
      s"record key column $keyCol not in ${source.columns.mkString(",")}")
    require(keyCol == recordKeyOf(spark, path),
      s"$path: upsertLog key $keyCol != the table's declared record " +
        s"key ${recordKeyOf(spark, path)} — refusing")
    val partField = partitionFieldOf(spark, path)
    partField.foreach(pf => require(source.columns.contains(pf),
      s"upsertLog source misses partition column $pf"))
    val dupCols = col(keyCol) +: partField.map(col).toSeq
    val dups = source.groupBy(dupCols: _*).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dups.isEmpty,
      s"upsertLog source has multiple rows for key ${dups.headOption}" +
        " — at most one source row per (partition, key)")
    val payload = org.apache.spark.sql.types.StructType(
      source.schema.fields.filterNot(f => MetaCols.contains(f.name)))
    val schemaJson = logAvroSchema(payload) // also the loud type gate
    val extraMetadata = txn.map { case (appId, batchId) =>
      Map(s"graft.txn.$appId" -> batchId.toString)
    }.getOrElse(Map.empty[String, String])
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the commit race 10 times")
      // exactly-once gate re-checked on EVERY attempt (see
      // insertInternal: a lost race may BE the concurrent replay)
      txn.foreach { case (appId, batchId) =>
        if (watermark(spark, path, appId) >= batchId)
          return latestCompletedInstant(spark, path)
      }
      val f = fs(spark, path)
      val (bases, logs, completedTs) = HudiRead.plan(spark, path, "")
      val instant = nextInstant(f, path)
      // placement of every live (partition, key): base files + live
      // log records (data AND delete rows — a deleted key re-inserts
      // into its own slice)
      val basePlace =
        if (bases.isEmpty)
          HudiRead.logKeyPlacement(spark, path, Nil, completedTs)
        else spark.read
          .parquet(bases.map(b => s"$path/${b.path}"): _*)
          .select(col("_hoodie_partition_path").as("__pp"),
            split(col("_hoodie_file_name"), "_").getItem(0).as("__fid"),
            col("_hoodie_record_key").as("__k"))
      val place = basePlace
        .unionByName(HudiRead.logKeyPlacement(spark, path, logs,
          completedTs))
        .distinct()
      val srcPp = partField.map(pf => col(pf).cast("string"))
        .getOrElse(lit(""))
      val srcKeyed = source
        .withColumn("__k", col(keyCol).cast("string"))
        .withColumn("__pp", srcPp)
      val names = payload.fieldNames.toSeq
      val routed = srcKeyed.join(place, Seq("__k", "__pp"))
        .select((Seq(col("__pp"), col("__fid"), col("__k")) ++
          names.map(col)): _*)
      // per-slice log metadata (touched slices only — metadata-sized)
      val touched = routed.select("__pp", "__fid").distinct().collect()
        .map(r => (r.getString(0), r.getString(1)))
      val baseOf = bases.map(b => (b.partition, b.fileId) -> b.instant)
        .toMap
      val maxVer: Map[(String, String), Long] = logs
        .groupBy(l => (l.partition, l.fileId))
        .map { case (g, ls) =>
          g -> ls.map(_.path.split("/").last match {
            case LogVerName(_, _, v, _) => v.toLong
            case _                      => 0L
          }).max
        }
      val token = java.util.UUID.randomUUID().toString
      val logRelOf: Map[(String, String), (String, String)] =
        touched.map { case (pp, fid) =>
          val baseTs = baseOf.getOrElse((pp, fid),
            throw new IllegalStateException(
              s"$path: placement found no base for group ($pp, $fid)"))
          val ver = maxVer.getOrElse((pp, fid), 0L) + 1
          val name = s".${fid}_$baseTs.log.${ver}_0-$token"
          ((pp, fid), (if (pp.isEmpty) name else s"$pp/$name", baseTs))
        }.toMap
      // write one log file per touched slice, EXECUTOR-side
      val confW = new org.apache.spark.SerializableWritable(
        spark.sparkContext.hadoopConfiguration)
      val relB = spark.sparkContext.broadcast(logRelOf)
      val tablePath = path
      val schemaJ = schemaJson
      val inst = instant
      val fieldNames = "_hoodie_record_key" +: names
      val written: Seq[(String, String, Long, Long)] =
        routed.repartition(col("__pp"), col("__fid")).rdd
          .mapPartitions { it =>
            val bySlice = it.toVector.groupBy(r =>
              (r.getString(0), r.getString(1)))
            bySlice.iterator.map { case ((pp, fid), rows) =>
              val recs = rows.iterator.map { r =>
                r.getString(2).asInstanceOf[AnyRef] +:
                  names.indices.map(i => r.get(3 + i)
                    .asInstanceOf[AnyRef])
              }
              val content =
                avroBlockContent(schemaJ, recs, fieldNames)
              val bytes = frameBlock(3, // AVRO_DATA_BLOCK
                Map(0 -> inst, 2 -> schemaJ), content)
              val (rel, _) = relB.value((pp, fid))
              val hp = new Path(s"$tablePath/$rel")
              val hf = hp.getFileSystem(confW.value)
              val out = hf.create(hp, false)
              try out.write(bytes) finally out.close()
              (pp, fid, rows.size.toLong,
                hf.getFileStatus(hp).getLen)
            }
          }.collect().toSeq
      // fresh keys: a new BASE group per partition in the same commit
      val fresh = srcKeyed
        .join(place.select("__k", "__pp").distinct(),
          Seq("__k", "__pp"), "left_anti")
        .withColumn("__fg", md5(concat_ws("#", lit(instant),
          lit(token), col("__pp"))))
        .select((names.map(col) :+ col("__pp") :+ col("__fg")): _*)
      val freshLanded = land(fresh, path, keyCol, instant, Map.empty,
        partitioned = partField.nonEmpty)
      val logLanded = written.map { case (pp, fid, n, size) =>
        val (rel, baseTs) = logRelOf((pp, fid))
        Landed(pp, fid, rel, n, size, baseTs)
      }
      val landed = logLanded ++ freshLanded
      if (landed.isEmpty) {
        // an empty batch still needs its watermark recorded — otherwise
        // the NEXT batch's replay detection regresses past it
        if (extraMetadata.isEmpty) {
          if (bases.isEmpty) return completedTs.max
          return bases.map(_.instant).max
        }
      }
      if (publish(spark, path, instant,
          commitJson(landed, "upsert", extraMetadata))) return instant
      landed.foreach(l => f.delete(new Path(path, l.rel), false))
      attempts += 1
    }
    "" // unreachable
  }

  /** The public HoodieDeleteRecordList avro model — DELETE_BLOCK
    * content version ≥ 3 serializes deletes with it (the exact schema
    * [[HudiRead]]'s decodeDeleteBlock consumes).
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

  /** DELETE_BLOCK content: 4-byte content version (3), 4-byte length,
    * avro-binary HoodieDeleteRecordList of the keys.
    */
  private def deleteBlockContent(keys: Iterator[(String, String)])
      : Array[Byte] = {
    val schema =
      new org.apache.avro.Schema.Parser().parse(DeleteRecordListSchema)
    val itemS = schema.getField("deleteRecordList").schema()
      .getElementType
    val list = new java.util.ArrayList[AnyRef]()
    keys.foreach { case (k, pp) =>
      val r = new org.apache.avro.generic.GenericData.Record(itemS)
      r.put("recordKey", k); r.put("partitionPath", pp)
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
    out.toByteArray
  }

  /** MERGE_ON_READ log-delete — DELETE_BLOCK emission per affected file
    * slice (O(matched keys); the read suppresses the rows at merge
    * time — streaming deletes without COW rewrites, the write shape
    * whose READ side landed in round 10's DELETE_BLOCK decode). Keys
    * route by the same base+log placement scan as [[upsertLog]];
    * source keys matching NO live (partition, key) are a no-op, per
    * Hudi's delete semantics. Returns the instant (the current latest
    * when nothing matched).
    */
  def deleteLog(keys: DataFrame, path: String, keyCol: String): String = {
    val spark = keys.sparkSession
    requireMor(spark, path)
    require(keys.columns.contains(keyCol),
      s"record key column $keyCol not in ${keys.columns.mkString(",")}")
    require(keyCol == recordKeyOf(spark, path),
      s"$path: deleteLog key $keyCol != the table's declared record " +
        s"key ${recordKeyOf(spark, path)} — refusing")
    val partField = partitionFieldOf(spark, path)
    partField.foreach(pf => require(keys.columns.contains(pf),
      s"deleteLog source misses partition column $pf"))
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the commit race 10 times")
      val f = fs(spark, path)
      val (bases, logs, completedTs) = HudiRead.plan(spark, path, "")
      val instant = nextInstant(f, path)
      val basePlace =
        if (bases.isEmpty)
          HudiRead.logKeyPlacement(spark, path, Nil, completedTs)
        else spark.read
          .parquet(bases.map(b => s"$path/${b.path}"): _*)
          .select(col("_hoodie_partition_path").as("__pp"),
            split(col("_hoodie_file_name"), "_").getItem(0).as("__fid"),
            col("_hoodie_record_key").as("__k"))
      val place = basePlace
        .unionByName(HudiRead.logKeyPlacement(spark, path, logs,
          completedTs))
        .distinct()
      val srcPp = partField.map(pf => col(pf).cast("string"))
        .getOrElse(lit(""))
      val srcKeyed = keys
        .select(col(keyCol).cast("string").as("__k"), srcPp.as("__pp"))
        .distinct()
      val routed = srcKeyed.join(place, Seq("__k", "__pp"))
        .select("__pp", "__fid", "__k")
      val touched = routed.select("__pp", "__fid").distinct().collect()
        .map(r => (r.getString(0), r.getString(1)))
      if (touched.isEmpty) {
        if (bases.isEmpty) return completedTs.max
        return bases.map(_.instant).max
      }
      val baseOf = bases.map(b => (b.partition, b.fileId) -> b.instant)
        .toMap
      val maxVer: Map[(String, String), Long] = logs
        .groupBy(l => (l.partition, l.fileId))
        .map { case (g, ls) =>
          g -> ls.map(_.path.split("/").last match {
            case LogVerName(_, _, v, _) => v.toLong
            case _                      => 0L
          }).max
        }
      val token = java.util.UUID.randomUUID().toString
      val logRelOf: Map[(String, String), (String, String)] =
        touched.map { case (pp, fid) =>
          val baseTs = baseOf.getOrElse((pp, fid),
            throw new IllegalStateException(
              s"$path: placement found no base for group ($pp, $fid)"))
          val ver = maxVer.getOrElse((pp, fid), 0L) + 1
          val name = s".${fid}_$baseTs.log.${ver}_0-$token"
          ((pp, fid), (if (pp.isEmpty) name else s"$pp/$name", baseTs))
        }.toMap
      val confW = new org.apache.spark.SerializableWritable(
        spark.sparkContext.hadoopConfiguration)
      val relB = spark.sparkContext.broadcast(logRelOf)
      val tablePath = path
      val inst = instant
      val written: Seq[(String, String, Long, Long)] =
        routed.repartition(col("__pp"), col("__fid")).rdd
          .mapPartitions { it =>
            val bySlice = it.toVector.groupBy(r =>
              (r.getString(0), r.getString(1)))
            bySlice.iterator.map { case ((pp, fid), rows) =>
              val content = deleteBlockContent(
                rows.iterator.map(r => (r.getString(2), pp)))
              val bytes = frameBlock(1, // DELETE_BLOCK
                Map(0 -> inst), content)
              val (rel, _) = relB.value((pp, fid))
              val hp = new Path(s"$tablePath/$rel")
              val hf = hp.getFileSystem(confW.value)
              val out = hf.create(hp, false)
              try out.write(bytes) finally out.close()
              (pp, fid, rows.size.toLong,
                hf.getFileStatus(hp).getLen)
            }
          }.collect().toSeq
      val landed = written.map { case (pp, fid, n, size) =>
        val (rel, baseTs) = logRelOf((pp, fid))
        Landed(pp, fid, rel, n, size, baseTs)
      }
      if (publish(spark, path, instant,
          commitJson(landed, "delete", Map.empty))) return instant
      landed.foreach(l => f.delete(new Path(path, l.rel), false))
      attempts += 1
    }
    "" // unreachable
  }

  // ------------------------------------------------------------------
  // MERGE_ON_READ compaction
  // ------------------------------------------------------------------

  /** COMPACTION — fold every file slice's uncompacted log blocks into a
    * fresh base file under a `commit` instant (the spec's name for a
    * completed compaction on a MERGE_ON_READ timeline, vs the
    * `deltacommit` ordinary MOR writes publish): the read-side merge
    * [[HudiRead.mergeSliced]] already implements, run ONCE at write
    * time, so log chains stay bounded and base-only planning
    * (`readWhere` zone-map pruning, which refuses on live logs) works
    * again. Each affected group rewrites under its OWN fileId at the
    * compaction instant — the fileId-shadowing rule — and a group whose
    * every row was log-deleted lands an empty shadowing slice exactly
    * like COW delete. Untouched groups (no live logs) are not rewritten
    * or listed: their existing slices stay live, so compaction cost is
    * O(affected slices), not O(table). Time travel to a pre-compaction
    * instant still merges the old base + logs (the log files stay on
    * disk until [[clean]]); post-compaction reads never consult them
    * because their named base instant is older than the new base.
    * Returns the compaction instant, or the current latest when the
    * table has no live logs (no-op).
    *
    * Concurrency: unlike inserts (which may land on ANY free instant),
    * compaction commits at exactly TIMELINE-HEAD + 1 — the Delta-style
    * serialized-commit discipline. A racer that fails the instant
    * reservation waits (bounded) for that instant to COMPLETE, then
    * replans: if the winner was a concurrent compaction, the replan
    * sees the logs folded and no-ops, so N racing compactions land
    * exactly ONE compaction commit. A writer that reserved head+1 and
    * crashed without completing it starves compaction until its marker
    * is cleaned up — the refusal after 10 bounded waits is loud.
    * Out of modeled scope (as in Hudi itself without a lock provider +
    * scheduled compaction plans): a log upsert RUNNING CONCURRENTLY
    * with compaction may attach its blocks to the pre-compaction base
    * instant and lose them — run table services and log writers
    * serially, or behind one driver.
    */
  /** Strictly-next instant after `ts`, zero-padded to the timeline
    * shape — table services (compact/cluster) commit at exactly
    * timeline-head+1 so racers collide on the reservation.
    */
  private def bumpInstant(ts: String): String =
    (BigInt(ts) + 1).toString.reverse.padTo(17, '0').reverse

  /** Bounded wait for SOME completed instant ≥ `instant` — the
    * serialized-commit loser's backoff before replanning (see
    * [[compact]]'s concurrency note).
    */
  private def awaitTimeline(f: org.apache.hadoop.fs.FileSystem,
                            path: String, instant: String): Unit = {
    val deadline = System.currentTimeMillis() + 60000
    def moved(): Boolean = f.listStatus(new Path(path, ".hoodie"))
      .map(_.getPath.getName)
      .collect { case CompletedName(ts, _) => ts }
      .exists(_ >= instant)
    while (!moved() && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
  }

  def compact(spark: SparkSession, path: String): String = {
    requireMor(spark, path)
    val keyCol = recordKeyOf(spark, path)
    val partitioned = partitionFieldOf(spark, path).nonEmpty
    def bump(ts: String): String = bumpInstant(ts)
    var attempts = 0
    while (true) {
      require(attempts < 10,
        s"$path: could not reserve timeline-head+1 after 10 bounded " +
          "waits — a crashed writer's pending instant may be starving " +
          "compaction")
      val f = fs(spark, path)
      val (bases, logs, completedTs) = HudiRead.plan(spark, path, "")
      if (logs.isEmpty) return latestCompletedInstant(spark, path)
      val instant = bump(completedTs.max)
      val affected = logs.map(l => (l.partition, l.fileId)).toSet
      val hit = bases.filter(b => affected.contains((b.partition, b.fileId)))
      val baseDf = spark.read
        .parquet(hit.map(b => s"$path/${b.path}"): _*)
      val merged = HudiRead
        .mergeSliced(spark, path, baseDf, logs, hit, completedTs)
        .withColumnRenamed("__g_part", "__pp")
        .withColumnRenamed("__g_fid", "__fg")
      val payloadCols = merged.columns.filterNot(Set("__pp", "__fg"))
      val prevOf = hit.map(b => b.fileId -> b.instant).toMap
      // fileId AND instant are both fixed by the compaction contract, so
      // racing compactors disambiguate their staged files via the WRITE
      // TOKEN (the name segment Hudi reserves for task attempts); the
      // reservation then arbitrates and the loser deletes its files
      val wToken = s"0-0-${java.util.UUID.randomUUID().toString.take(8)}"
      val landed0 = land(
        merged.select((payloadCols.map(col) :+ col("__pp")
          :+ col("__fg")): _*),
        path, keyCol, instant, prevOf, partitioned, token = wToken)
      // groups whose every row was log-deleted still need an empty
      // shadowing slice — otherwise the old base + logs would stay live
      val missing = affected -- landed0.map(l => (l.partition, l.fileId))
      val landed = landed0 ++ missing.toSeq.sorted.map { case (pp, fid) =>
        val old = hit.find(b => b.partition == pp && b.fileId == fid).get
        val src = spark.read.parquet(s"$path/${old.path}")
          .drop(MetaCols: _*)
        landEmptySlice(src, path, keyCol, pp, fid, instant,
          prevOf.getOrElse(fid, "null"), token = wToken)
      }
      if (publish(spark, path, instant,
          commitJson(landed, "compact", Map.empty),
          kindOverride = Some("commit"))) return instant
      landed.foreach(l => f.delete(new Path(path, l.rel), false))
      // head+1 was reserved by a concurrent writer: wait (bounded) for
      // SOME instant ≥ it to complete so the replan sees the winner's
      // effect — a concurrent compaction folds our logs and the replan
      // no-ops instead of folding the same blocks twice
      awaitTimeline(f, path, instant)
      attempts += 1
    }
    "" // unreachable
  }

  /** CLUSTERING — the write side of the `replacecommit` instants the
    * reader has consumed since round 10, and the Hudi analog of Delta
    * OPTIMIZE: rewrite file groups into ~`targetBytes` bins under
    * FRESH fileIds, publishing one `replacecommit` whose
    * `partitionToWriteStats` lists the new groups and
    * `partitionToReplaceFileIds` kills the old ones (the out-of-line
    * shadowing rule [[HudiRead]] plans by — time travel before the
    * clustering still serves the old groups, and [[clean]] reclaims
    * their files once the horizon passes).
    *
    * Two operating points: with `sortBy` EMPTY, bin-packs only the
    * small groups (size < targetBytes, ≥2 of them — a lone small group
    * gains nothing); with `sortBy` given, rewrites EVERY group with
    * rows range-partitioned and sorted on the keys — the layout
    * rewrite that turns `readWhere` range predicates into 1-of-N file
    * opens (each new group holds a disjoint key range, zone maps do
    * the rest). COW only; commits serialized at timeline-head+1
    * exactly like [[compact]] (concurrent COW upserts during a
    * clustering are out of modeled scope without a lock provider, as
    * in Hudi itself). Returns the replacecommit instant, or the
    * current latest when nothing qualifies.
    */
  def cluster(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              sortBy: Seq[String] = Nil): String = {
    requireCow(spark, path)
    val keyCol = recordKeyOf(spark, path)
    val partitioned = partitionFieldOf(spark, path).nonEmpty
    var attempts = 0
    while (true) {
      require(attempts < 10,
        s"$path: could not reserve timeline-head+1 after 10 bounded " +
          "waits — a crashed writer's pending instant may be starving " +
          "clustering")
      val f = fs(spark, path)
      val (bases, logs, completedTs) = HudiRead.plan(spark, path, "")
      require(logs.isEmpty,
        s"$path: table holds log files — this writer is COW only")
      def sizeOf(b: HudiRead.Slice): Long =
        f.getFileStatus(new Path(path, b.path)).getLen
      val candidates =
        if (sortBy.nonEmpty) bases
        else bases.filter(b => sizeOf(b) < targetBytes)
      if (candidates.size < 2)
        return latestCompletedInstant(spark, path)
      val instant = bumpInstant(completedTs.max)
      val rows = spark.read
        .parquet(candidates.map(b => s"$path/${b.path}"): _*)
      val payloadCols = rows.columns.filterNot(MetaCols.contains)
      val totalBytes = candidates.map(sizeOf).sum
      val bins = math.max(1L,
        (totalBytes + targetBytes - 1) / targetBytes).toInt
      val salt = java.util.UUID.randomUUID().toString
      val keyed = rows
        .withColumn("__pp", col("_hoodie_partition_path"))
        .select((payloadCols.map(col) :+ col("__pp")): _*)
      // bin assignment WITHOUT a second shuffle: the physical partition
      // id after the (range-)repartition IS the bin, so land() must not
      // re-shuffle (prePartitioned) — with sortBy, bins hold disjoint
      // (partition, key) ranges and rows arrive sorted, which is what
      // makes the new groups' zone maps selective
      val arranged =
        if (sortBy.nonEmpty)
          keyed.repartitionByRange(bins,
              (col("__pp") +: sortBy.map(col)): _*)
            .sortWithinPartitions((col("__pp") +: sortBy.map(col)): _*)
        else
          // bin-pack WITHIN table partitions: range-partition on
          // (__pp, key) so each bin holds a contiguous run of ONE
          // partition's rows (two only at a range boundary) — a plain
          // repartition(bins) would scatter every partition round-robin
          // across every bin and emit up to partitions×bins groups of
          // ~total/(P×B) bytes, the opposite of packing. Groups out ≤
          // bins + (#partitions − 1) by construction.
          keyed.repartitionByRange(bins, col("__pp"), col(keyCol))
      val tagged = arranged
        .withColumn("__fg", md5(concat_ws("#", lit(instant), lit(salt),
          col("__pp"), spark_partition_id().cast("string"))))
      val landed = land(tagged, path, keyCol, instant, Map.empty,
        partitioned, prePartitioned = true)
      // no-churn guard: a bin-pack that does not REDUCE the group count
      // is pure write amplification (plus a replacecommit readers must
      // replay) — unland and report the current latest instead
      val oldGroups =
        candidates.map(b => (b.partition, b.fileId)).distinct.size
      if (sortBy.isEmpty &&
          landed.map(l => (l.partition, l.fileId)).distinct.size >=
            oldGroups) {
        landed.foreach(l => f.delete(new Path(path, l.rel), false))
        return latestCompletedInstant(spark, path)
      }
      val replaced = candidates.groupBy(_.partition)
        .map { case (pp, bs) => pp -> bs.map(_.fileId).distinct.toSeq }
      if (publish(spark, path, instant,
          commitJson(landed, "cluster", Map.empty, replaced),
          kindOverride = Some("replacecommit"))) return instant
      landed.foreach(l => f.delete(new Path(path, l.rel), false))
      awaitTimeline(f, path, instant)
      attempts += 1
    }
    "" // unreachable
  }

  /** INSERT OVERWRITE — the second `replacecommit` producer next to
    * [[cluster]]: land `source` as fresh file groups and KILL every
    * existing group of the partitions the batch touches (whole-table
    * replacement on unpartitioned tables — Hudi's
    * insert_overwrite_table). The batch-ETL "recompute this
    * partition" shape: untouched partitions are not listed, read, or
    * rewritten; time travel before the overwrite serves the old
    * groups; [[clean]] reclaims them past the horizon. Works on COW
    * and MOR (killed groups drop bases AND logs). Commits serialized
    * at timeline-head+1 like every replace publisher here. Returns
    * the instant, or the current latest when the source is empty.
    */
  def insertOverwrite(source: DataFrame, path: String,
                      keyCol: String): String = {
    val spark = source.sparkSession
    tableTypeOf(spark, path) // loud gate; COW and MOR
    require(source.columns.contains(keyCol),
      s"record key column $keyCol not in ${source.columns.mkString(",")}")
    val partField = partitionFieldOf(spark, path)
    partField.foreach(pf => require(source.columns.contains(pf),
      s"insertOverwrite source misses partition column $pf"))
    var attempts = 0
    while (true) {
      require(attempts < 10,
        s"$path: could not reserve timeline-head+1 after 10 bounded " +
          "waits — a crashed writer's pending instant may be starving " +
          "the overwrite")
      val f = fs(spark, path)
      val (bases, logs, completedTs) = HudiRead.plan(spark, path, "")
      val instant = bumpInstant(completedTs.max)
      val nGroups = math.max(1, math.min(256,
        source.rdd.getNumPartitions)).toInt
      val pp = partField.map(pf => col(pf).cast("string"))
        .getOrElse(lit(""))
      val bin = pmod(xxhash64(col(keyCol).cast("string")), lit(nGroups))
      val salt = java.util.UUID.randomUUID().toString
      val tagged = source
        .withColumn("__pp", pp)
        .withColumn("__fg",
          md5(concat_ws("#", lit(instant), lit(salt), col("__pp"),
            bin.cast("string"))))
      val landed = land(tagged, path, keyCol, instant, Map.empty,
        partitioned = partField.nonEmpty)
      if (landed.isEmpty) return latestCompletedInstant(spark, path)
      // kill every existing group of the partitions this batch landed
      // in (all of them on an unpartitioned table — partition "")
      val touched = landed.map(_.partition).toSet
      val replaced = (bases.map(b => (b.partition, b.fileId)) ++
          logs.map(l => (l.partition, l.fileId)))
        .distinct.filter { case (p, _) => touched.contains(p) }
        .groupBy(_._1).map { case (p, g) => p -> g.map(_._2).toSeq }
      if (publish(spark, path, instant,
          commitJson(landed, "insert_overwrite", Map.empty, replaced),
          kindOverride = Some("replacecommit"))) return instant
      landed.foreach(l => f.delete(new Path(path, l.rel), false))
      awaitTimeline(f, path, instant)
      attempts += 1
    }
    "" // unreachable
  }

  // ------------------------------------------------------------------
  // Retention: clean (physical file GC) + archive (timeline trimming)
  // ------------------------------------------------------------------

  /** CLEAN — the Delta-VACUUM analog: physically delete file slices
    * SHADOWED beyond a retention horizon (KEEP_LATEST_COMMITS shape:
    * the horizon is the `retainInstants`-th-latest completed instant,
    * so every read at or after it — latest reads and bounded time
    * travel — stays bit-identical). Per file group, every base file
    * strictly older than the group's live-at-horizon slice is deleted,
    * along with the log files attached (by the base instant in their
    * NAME) to those deleted bases — which is where logs folded by a
    * compaction are finally reclaimed; groups killed by a
    * replacecommit at or before the horizon lose all their pre-horizon
    * files. ORDERING: a completed `<instant>.clean` record (JSON
    * `earliestRetained` + the deleted paths) publishes FIRST, so time
    * travel below the horizon refuses LOUDLY by name
    * ([[HudiRead.timelineState]]'s gate) before any file is missing —
    * a crash between publish and delete leaves only harmlessly
    * undeleted files a re-clean removes. Clean instants are never
    * archived: the gate must outlive the commits it covers. Returns
    * the number of files deleted (0 = nothing qualified, no instant
    * published).
    */
  def clean(spark: SparkSession, path: String,
            retainInstants: Int): Int = {
    require(retainInstants >= 1,
      s"clean: retainInstants must be >= 1, got $retainInstants")
    tableTypeOf(spark, path) // loud gate
    val f = fs(spark, path)
    val ts = HudiRead.timelineState(spark, path, "")
    val completed = ts.completed.distinct.sorted
    if (completed.size <= retainInstants) return 0
    val horizon = completed(completed.size - retainInstants)
    val (logsAll, bases) = ts.slices.partition(_.path.contains(".log."))
    // per group: the slice live AT THE HORIZON (latest base ≤ horizon)
    // stays — everything it shadows goes; a group dead at the horizon
    // (replaced, not revived by then) loses all its pre-horizon files
    val removable: Seq[String] = bases
      .groupBy(s => (s.partition, s.fileId)).toSeq.flatMap {
        case (g, bs) =>
          val pre = bs.filter(_.instant <= horizon)
          val deadAtHorizon = ts.replacedAt.get(g).exists { r =>
            r <= horizon && !pre.exists(_.instant > r)
          }
          val removedBases =
            if (deadAtHorizon) pre
            else pre.sortBy(_.instant).dropRight(1)
          val removedTs = removedBases.map(_.instant).toSet
          val liveTs = pre.map(_.instant).toSet -- removedTs
          val logs = logsAll
            .filter(l => (l.partition, l.fileId) == g)
            .filter { l =>
              l.path.split("/").last match {
                case LogVerName(_, baseTs, _, _) =>
                  removedTs.contains(baseTs) ||
                    (deadAtHorizon && baseTs <= horizon &&
                      !liveTs.contains(baseTs))
                case _ => false
              }
            }
          (removedBases ++ logs).map(_.path)
      }.distinct
      // commit metadata still lists files an earlier clean already
      // deleted — only files actually on disk count (re-clean no-ops)
      .filter(rel => f.exists(new Path(path, rel)))
    if (removable.isEmpty) return 0
    // publish the gate BEFORE deleting: a reader time traveling below
    // the horizon mid-clean must hit the loud refusal, never a
    // FileNotFound
    val json = {
      val root = om.createObjectNode()
      root.put("earliestRetained", horizon)
      val arr = root.putArray("deletedFiles")
      removable.sorted.foreach(arr.add)
      om.writeValueAsString(root)
    }
    var attempts = 0
    var published = false
    while (!published) {
      require(attempts < 10, s"$path: lost the clean race 10 times")
      val instant = nextInstant(f, path)
      published = publish(spark, path, instant, json,
        kindOverride = Some("clean"))
      attempts += 1
    }
    removable.foreach(rel => f.delete(new Path(path, rel), false))
    removable.size
  }

  /** SYNC THE METADATA TABLE — the modeled analog of Hudi's
    * `.hoodie/metadata` (in real Hudi an internal MOR table whose
    * `files` and `column_stats` partitions let the planner prune from
    * ONE table read instead of N data-file footers — the difference
    * between O(files) KB-sized RPCs and one scan at 100 TB file
    * counts). Here the metadata table is itself a graft-Hudi COW table
    * at `.hoodie/metadata/`, partitioned by `part`:
    *
    *   - `files`: one row per live base file (`path`, `rows`);
    *   - `column_stats`: one row per (column, file) with the
    *     [[FileStats.ColStat]] zone map (`kind`, `lo`, `hi`, `nulls`,
    *     `rows`) — the same compare domain `readWhere` harvests from
    *     footers;
    *   - `sync`: one marker row carrying the synced head instant and
    *     the layout version `graft-colstats-v1` ([[HudiRead]]'s
    *     readWhereMeta refuses anything else by name).
    *
    * INCREMENTAL: stats of files already present in a valid existing
    * metadata table carry forward without re-reading their footers —
    * only files new since the last sync are harvested (the write is
    * file-count-sized either way; footer RPCs are the scale cost).
    * Tables with live log files refuse (the same base-bounds
    * soundness rule as readWhere). Returns the synced head instant.
    */
  def syncMetadata(spark: SparkSession, path: String): String = {
    tableTypeOf(spark, path) // loud gate
    val f = fs(spark, path)
    val (bases, logs, completedTs) = HudiRead.plan(spark, path, "")
    require(logs.isEmpty,
      s"$path: uncompacted log files present — base-file column stats " +
        "cannot cover log rows; compact first")
    val head = completedTs.max
    val mpath = s"$path/.hoodie/metadata"
    // carry forward stats of still-live files from a valid prior sync
    val carried: Map[String, Map[String, FileStats.ColStat]] =
      HudiRead.tryMetaStats(spark, path)
        .map(_._2).getOrElse(Map.empty)
        // a carried-forward entry with no stats rows is a files-only
        // record — re-harvesting it would defeat the carry, but its
        // empty map must not shadow a real harvest either
        .filter(_._2.nonEmpty)
    val livePaths = bases.map(_.path)
    val fresh = livePaths.filterNot(carried.contains)
    val harvested = FileStats.collect(spark, path, fresh)
    val all: Map[String, Map[String, FileStats.ColStat]] =
      livePaths.map(p =>
        p -> carried.getOrElse(p, harvested.getOrElse(p, Map.empty))).toMap
    import spark.implicits._
    val statRows = all.toSeq.flatMap { case (p, cols) =>
      cols.toSeq.map { case (c, st) =>
        (s"$c#$p", "column_stats", p, c, st.kind,
          st.lo.orNull, st.hi.orNull, st.nulls, st.rows)
      }
    }
    val fileRows = livePaths.map { p =>
      val rows = all.get(p).flatMap(_.values.headOption)
        .map(_.rows).getOrElse(-1L)
      (s"file#$p", "files", p, null: String, null: String,
        null: String, null: String, -1L, rows)
    }
    val syncRow = Seq((s"sync#$head", "sync", head, null: String,
      "graft-colstats-v1", null: String, null: String, -1L, -1L))
    val df = (statRows ++ fileRows ++ syncRow)
      .toDF("mkey", "part", "path", "col", "kind", "lo", "hi",
        "nulls", "rows")
      .coalesce(1)
    // rebuild atomically enough for the modeled single-driver scope: a
    // reader racing the wipe hits the loud not-a-metadata-table refusal
    f.delete(new Path(mpath), true)
    create(df, mpath, "mkey", partitionField = "part")
    head
  }

  /** ARCHIVE — trim the ACTIVE timeline to its last `keepLast`
    * completed data instants by moving the older completed files (and
    * their pending markers) into `.hoodie/archived/`, the layout
    * [[HudiRead]]'s per-file-group coverage check already plans
    * around. Exactly-once watermarks survive (the watermark scan
    * includes the archived dir) and instant monotonicity survives
    * (nextInstant counts archived instants). SAFETY: after the move,
    * the table is re-planned through [[HudiRead.plan]] — if any file
    * group's latest write just became invisible (its last slice landed
    * in an archived instant and was never shadowed), every file moves
    * BACK and the archive refuses loudly, advising clean/compact
    * first. Time travel into the archived range refuses loudly ("no
    * completed commit at or before"). `.clean` instants are never
    * archived — their horizon gate must outlive the commits they
    * cover. Returns the number of instants archived.
    */
  def archive(spark: SparkSession, path: String, keepLast: Int): Int = {
    require(keepLast >= 1,
      s"archive: keepLast must be >= 1, got $keepLast")
    tableTypeOf(spark, path) // loud gate
    val f = fs(spark, path)
    require(!f.exists(new Path(path, ".hoodie/timeline")),
      s"$path: 1.x timeline layout — this archiver writes the pre-1.x " +
        ".hoodie/archived layout only, refusing")
    val dir = new Path(path, ".hoodie")
    val names = f.listStatus(dir).filter(_.isFile)
      .map(_.getPath.getName).toSeq
    val completed = names.collect { case n @ CompletedName(ts, _) => ts }
      .distinct.sorted
    if (completed.size <= keepLast) return 0
    val archTs = completed.dropRight(keepLast).toSet
    val adir = new Path(dir, "archived")
    f.mkdirs(adir)
    // move the completed files + their kind markers + neutral instant
    // locks; never the .clean records (their gate must stay active)
    val toMove = names.filter {
      case n @ AnyInstant(ts) =>
        archTs.contains(ts) && !n.contains(".clean")
      case _ => false
    }
    toMove.foreach { n =>
      require(f.rename(new Path(dir, n), new Path(adir, n)),
        s"$path: failed to archive $n")
    }
    // validate: every file group's live slice must still be covered by
    // the remaining active timeline (the reader's own coverage check);
    // roll the move back and refuse loudly otherwise
    try HudiRead.plan(spark, path, "")
    catch {
      case e: Exception =>
        toMove.foreach { n =>
          require(f.rename(new Path(adir, n), new Path(dir, n)),
            s"$path: failed to ROLL BACK archive of $n — timeline " +
              "left split, manual repair needed")
        }
        throw new IllegalArgumentException(
          s"$path: archiving past keepLast=$keepLast would orphan a " +
            "file group whose latest write sits in the archived range " +
            "— clean/compact first so newer slices cover it; rolled " +
            s"back (${e.getMessage})", e)
    }
    archTs.size
  }
}
