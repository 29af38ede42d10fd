package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal transactional table format — the missing ACID sink for
  * MERGE/upsert workloads (q80 computes merge semantics; this applies
  * them to storage safely), built from the same primitive the early
  * table formats used: an ATOMIC MANIFEST SWAP over immutable data
  * files. No external dependency.
  *
  * Layout:
  * {{{
  *   <table>/data/s<uuid>/part-*.parquet     immutable snapshot segments
  *   <table>/_manifests/v<N>.json            file list + schema for version N
  * }}}
  *
  * Commit protocol: write the new manifest to a temp name, then
  * `FileSystem.rename` it to `v<N+1>.json`. Rename-if-absent is atomic
  * on HDFS (and local fs); if another writer committed N+1 first the
  * rename fails and the commit throws — optimistic concurrency, the
  * loser retries on a fresh read. Readers resolve the highest manifest
  * and read exactly its file list: a crashed writer leaves only an
  * orphaned temp/segment (never a torn table), and every prior version
  * stays readable (time travel). On object stores without atomic rename
  * (raw S3) this needs the usual commit-service substitution — the same
  * caveat the production formats carry.
  *
  * Scale notes: appends reuse prior segments (manifest = old files + new
  * segment — no rewrite); upsert/delete are copy-on-write over the
  * CURRENT snapshot (one distributed anti-join/union job, no driver data
  * movement); the manifest holds file paths only (KB-sized until file
  * counts reach millions, at which point you shard manifests — out of
  * scope here).
  */
object SnapshotTable {
  /** The commit primitive behind every version publish — the LogStore
    * seam the production table formats expose (Delta's `LogStore`,
    * Iceberg's catalog commit): publish a fully-written temp manifest at
    * `target` iff absent, atomically, returning whether this writer won.
    *
    * The default resolves per filesystem capability: local fs uses
    * link(2) (atomic, EEXIST on conflict — POSIX rename would silently
    * REPLACE), HDFS uses rename (refuses an existing destination
    * atomically). Raw object stores (S3) have NEITHER primitive — a
    * blind PUT replaces and check-then-put is a lost-commit TOCTOU — so
    * there the caller must [[register]] a store that supplies mutual
    * exclusion externally (conditional put, a lock table a la Delta's
    * S3 LogStore, a catalog service). The race spec proves the contract
    * holds for a store built on exactly those non-atomic semantics.
    */
  trait CommitStore {
    /** true = this writer published `target`; false = it already existed
      * (another writer won). Must be atomic: two racers on the same
      * target must never both see true.
      */
    def publishIfAbsent(f: FileSystem, tmp: Path, target: Path): Boolean
  }

  /** link(2) on local fs; no-replace rename elsewhere (HDFS contract). */
  object DefaultCommitStore extends CommitStore {
    def publishIfAbsent(f: FileSystem, tmp: Path, target: Path): Boolean =
      if (f.getScheme == "file") {
        val nioTmp = java.nio.file.Paths.get(tmp.toUri.getPath)
        val nioTarget = java.nio.file.Paths.get(target.toUri.getPath)
        try { java.nio.file.Files.createLink(nioTarget, nioTmp); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else !f.exists(target) && f.rename(tmp, target)
  }

  /** External mutual-exclusion seam for [[ObjectStoreCommitStore]]: an
    * exclusive critical section keyed by commit target. Production
    * bindings are a lock table (the public Delta S3 multi-writer design:
    * DynamoDB conditional writes), a catalog service, or the store's own
    * conditional-put token; [[InJvmCommitMutex]] binds it for
    * single-driver deployments and tests.
    */
  trait CommitMutex {
    def withLock[T](key: String)(body: => T): T
  }

  /** In-JVM striped mutex: correct whenever every writer shares this JVM
    * (one driver, many threads/streams) — the single-writer-process case
    * that covers most batch deployments. Multi-driver S3 writers must
    * bind a distributed mutex instead.
    */
  object InJvmCommitMutex extends CommitMutex {
    private val locks =
      new java.util.concurrent.ConcurrentHashMap[String, Object]()
    def withLock[T](key: String)(body: => T): T =
      locks.computeIfAbsent(key, _ => new Object).synchronized(body)
  }

  /** CommitStore for object stores WITHOUT an atomic no-replace
    * primitive (raw S3): existence check and a blindly-REPLACING put are
    * separate, racy operations, so atomicity is restored by running
    * check+put inside external mutual exclusion ([[CommitMutex]]). This
    * is the shape of the public Delta-on-S3 LogStore: the mutex is the
    * only store-specific part, and the race spec proves the ACID
    * contract holds through exactly these non-atomic semantics.
    */
  final class ObjectStoreCommitStore(mutex: CommitMutex) extends CommitStore {
    // observability hook the race spec asserts on: every blind PUT served.
    // Atomic: the per-key mutex serializes same-table commits only, so
    // concurrent commits to DIFFERENT tables increment concurrently.
    private val putCount = new java.util.concurrent.atomic.AtomicInteger(0)
    def puts: Int = putCount.get()
    def publishIfAbsent(f: FileSystem, tmp: Path, target: Path): Boolean =
      mutex.withLock(target.toString) {
        if (f.exists(target)) false
        else {
          val in = f.open(tmp)
          val bytes = try in.readAllBytes() finally in.close()
          val out = f.create(target, true) // object-store PUT: replaces
          try out.write(bytes) finally out.close()
          putCount.incrementAndGet()
          true
        }
      }
  }

  @volatile private var stores: Map[String, CommitStore] = Map.empty

  /** Bind a [[CommitStore]] for a filesystem scheme ("s3a", ...); pass
    * null to restore the default. Mirrors Delta's per-scheme LogStore
    * configuration.
    */
  def register(scheme: String, store: CommitStore): Unit = synchronized {
    stores = if (store == null) stores - scheme else stores + (scheme -> store)
  }

  private[sources] def storeFor(scheme: String): CommitStore =
    stores.getOrElse(scheme, DefaultCommitStore)

  private case class Manifest(version: Int, schemaDdl: String,
                              files: Seq[String],
                              txn: Map[String, Long] = Map.empty,
                              stats: Map[String, Map[String, FileStats.ColStat]] =
                                Map.empty,
                              blooms: Map[String, Map[String, FileStats.FileBloom]] =
                                Map.empty)

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(path: String) = new Path(path, "_manifests")

  // strict numeric match (digit count bounded so toInt can't overflow):
  // a stray non-numeric file in _manifests (vbackup.json) must be
  // ignored, not throw and make the whole table unreadable
  private val ManifestName = "^v([0-9]{1,9})\\.json$".r

  /** (name, type) shape — nullability-insensitive: an in-memory frame is
    * often NOT NULL where the parquet read-back is nullable; that
    * difference is not schema drift.
    */
  private def shape(s: org.apache.spark.sql.types.StructType)
      : Seq[(String, org.apache.spark.sql.types.DataType)] =
    s.fields.toSeq.map(f => (f.name, f.dataType))
  private def shapeOfDdl(ddl: String) =
    shape(org.apache.spark.sql.types.StructType.fromDDL(ddl))

  private def parse(json: String): Manifest = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = om.readTree(json)
    import scala.jdk.CollectionConverters._
    val txn = if (n.has("txn")) {
      val t = n.path("txn")
      t.fieldNames().asScala.map(k => k -> t.path(k).asLong()).toMap
    } else Map.empty[String, Long]
    // stats are OPTIONAL (pre-skipping manifests parse fine; files
    // without an entry are simply never pruned)
    val stats = if (n.has("stats")) {
      val s = n.path("stats")
      s.fieldNames().asScala.map { file =>
        val cols = s.path(file)
        file -> cols.fieldNames().asScala.map { cn =>
          val c = cols.path(cn)
          cn -> FileStats.ColStat(c.path("k").asText(),
            if (c.has("lo")) Some(c.path("lo").asText()) else None,
            if (c.has("hi")) Some(c.path("hi").asText()) else None,
            c.path("nulls").asLong(), c.path("rows").asLong())
        }.toMap
      }.toMap
    } else Map.empty[String, Map[String, FileStats.ColStat]]
    // blooms are OPTIONAL too (built by an explicit buildBlooms pass)
    val blooms = if (n.has("blooms")) {
      val b = n.path("blooms")
      b.fieldNames().asScala.map { file =>
        val cols = b.path(file)
        file -> cols.fieldNames().asScala.map { cn =>
          val c = cols.path(cn)
          cn -> FileStats.FileBloom(c.path("k").asText(),
            c.path("nh").asInt(), c.path("b").asText())
        }.toMap
      }.toMap
    } else Map.empty[String, Map[String, FileStats.FileBloom]]
    Manifest(n.path("version").asInt(), n.path("schema").asText(),
      n.path("files").elements().asScala.map(_.asText()).toSeq, txn, stats,
      blooms)
  }

  private def render(m: Manifest): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("version", m.version)
    root.put("schema", m.schemaDdl)
    val arr = root.putArray("files")
    m.files.foreach(arr.add)
    if (m.txn.nonEmpty) {
      val t = root.putObject("txn")
      m.txn.toSeq.sortBy(_._1).foreach { case (k, v) => t.put(k, v) }
    }
    if (m.stats.nonEmpty) {
      val s = root.putObject("stats")
      m.stats.toSeq.sortBy(_._1).foreach { case (file, cols) =>
        val fo = s.putObject(file)
        cols.toSeq.sortBy(_._1).foreach { case (cn, c) =>
          val co = fo.putObject(cn)
          co.put("k", c.kind)
          c.lo.foreach(co.put("lo", _))
          c.hi.foreach(co.put("hi", _))
          co.put("nulls", c.nulls)
          co.put("rows", c.rows)
        }
      }
    }
    if (m.blooms.nonEmpty) {
      val b = root.putObject("blooms")
      m.blooms.toSeq.sortBy(_._1).foreach { case (file, cols) =>
        val fo = b.putObject(file)
        cols.toSeq.sortBy(_._1).foreach { case (cn, fb) =>
          val co = fo.putObject(cn)
          co.put("k", fb.kind)
          co.put("nh", fb.numHashes)
          co.put("b", fb.bitsB64)
        }
      }
    }
    om.writeValueAsString(root)
  }

  /** Highest committed version, 0 if the table does not exist yet. */
  /** True when `path` holds at least one committed version. */
  def exists(spark: SparkSession, path: String): Boolean =
    latestVersion(spark, path) > 0

  def latestVersion(spark: SparkSession, path: String): Int = {
    val dir = manifestDir(path)
    val f = fs(spark, path)
    if (!f.exists(dir)) 0
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case ManifestName(n) => n.toInt }
      .foldLeft(0)(math.max)
  }

  private def readManifest(spark: SparkSession, path: String, version: Int): Manifest = {
    val p = new Path(manifestDir(path), s"v$version.json")
    val f = fs(spark, path)
    require(f.exists(p), s"snapshot table $path has no version $version")
    val in = f.open(p)
    try parse(new String(in.readAllBytes(), "UTF-8")) finally in.close()
  }

  /** Write a new immutable segment; returns its file paths PLUS their
    * footer-derived zone maps ([[FileStats]] — metadata-only reads of
    * what parquet already computed during the write), so every commit
    * path ships skipping stats at zero extra scan cost.
    */
  private def writeSegment(df: DataFrame, path: String)
      : (Seq[String], Map[String, Map[String, FileStats.ColStat]]) = {
    val seg = s"data/s${java.util.UUID.randomUUID().toString.take(12)}"
    val segPath = s"$path/$seg"
    df.write.mode("errorifexists").parquet(segPath)
    val f = fs(df.sparkSession, path)
    val files = f.listStatus(new Path(segPath)).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
      .map(p => s"$seg/${p.getName}").toSeq
    (files, FileStats.collect(df.sparkSession, path, files))
  }

  /** Atomic commit of `files` as version `base + 1`; throws on conflict. */
  private def commit(spark: SparkSession, path: String, base: Int,
                     schemaDdl: String, files: Seq[String],
                     txn: Map[String, Long] = Map.empty,
                     stats: Map[String, Map[String, FileStats.ColStat]] =
                       Map.empty,
                     blooms: Map[String, Map[String, FileStats.FileBloom]] =
                       Map.empty): Int = {
    val next = base + 1
    val f = fs(spark, path)
    val dir = manifestDir(path)
    f.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(render(Manifest(next, schemaDdl, files, txn, stats,
        blooms.view.filterKeys(files.contains).toMap))
      .getBytes("UTF-8"))
    finally out.close()
    val target = new Path(dir, s"v$next.json")
    // publish-if-absent IS the transaction: exactly one writer wins
    // v<next>. The primitive is pluggable per scheme ([[CommitStore]]);
    // see DefaultCommitStore for the local/HDFS mechanics and the
    // object-store caveat.
    val won = storeFor(f.getScheme).publishIfAbsent(f, tmp, target)
    f.delete(tmp, false)
    if (!won) {
      throw new java.util.ConcurrentModificationException(
        s"snapshot table $path: version $next was committed concurrently; " +
          "re-read the latest snapshot and retry")
    }
    next
  }

  /** Create version 1 from `df` (table must not exist). */
  def create(df: DataFrame, path: String): Int = {
    require(latestVersion(df.sparkSession, path) == 0,
      s"snapshot table $path already exists")
    val (files, st) = writeSegment(df, path)
    commit(df.sparkSession, path, 0, df.schema.toDDL, files, stats = st)
  }

  /** Append-only commit: new segment + all prior files. `expectedVersion`
    * (0 = resolve latest) pins the snapshot this write was based on —
    * the explicit optimistic-CAS surface: if someone else committed that
    * version number first, the commit throws instead of silently
    * clobbering, and the caller re-reads and retries.
    */
  def append(df: DataFrame, path: String, expectedVersion: Int = 0): Int =
    append(df, path, expectedVersion, mergeSchema = false)

  /** Append with optional ADDITIVE schema evolution (`mergeSchema` —
    * the Delta autoMerge / parquet-mergeSchema contract): columns new
    * in `df` widen the table schema (appended, nullable); table columns
    * absent from `df` are fine (the new segment simply doesn't store
    * them). Because every read projects each immutable file BY NAME
    * into the manifest schema, old segments surface NULL for
    * later-added columns and new segments NULL for columns they never
    * stored — no rewrite of any existing file, the evolution is one
    * manifest swap. Same-name columns with a DIFFERENT type refuse
    * loudly (type conflicts are never mergeable); with
    * `mergeSchema=false` any shape difference refuses, as before.
    */
  def append(df: DataFrame, path: String, expectedVersion: Int,
             mergeSchema: Boolean): Int = {
    val spark = df.sparkSession
    val base =
      if (expectedVersion > 0) expectedVersion else latestVersion(spark, path)
    require(base > 0, s"snapshot table $path does not exist")
    val cur = readManifest(spark, path, base)
    val schemaDdl =
      if (!mergeSchema) {
        require(shape(df.schema) == shapeOfDdl(cur.schemaDdl),
          s"append schema ${df.schema.toDDL} != table schema ${cur.schemaDdl}")
        cur.schemaDdl
      } else {
        val tbl = org.apache.spark.sql.types.StructType.fromDDL(cur.schemaDdl)
        val tblTypes = shape(tbl).toMap
        val dfTypes = shape(df.schema).toMap
        val conflicts = dfTypes.keySet.intersect(tblTypes.keySet)
          .filter(k => dfTypes(k) != tblTypes(k))
        require(conflicts.isEmpty,
          s"mergeSchema type conflict on ${conflicts.mkString(", ")}: " +
            s"table ${cur.schemaDdl} vs append ${df.schema.toDDL}")
        val existing = tbl.fields.map(_.name).toSet
        val added = df.schema.fields.filterNot(f => existing.contains(f.name))
        // every field nullable: old files must legally surface NULL for
        // added columns (and new files for columns they don't store)
        org.apache.spark.sql.types.StructType(
          (tbl.fields ++ added).map(_.copy(nullable = true))).toDDL
      }
    val (files, st) = writeSegment(df, path)
    commit(spark, path, base, schemaDdl,
      cur.files ++ files, cur.txn, cur.stats ++ st, cur.blooms)
  }

  /** Read a specific version (time travel), or the latest when `version`
    * is 0.
    */
  def read(spark: SparkSession, path: String, version: Int = 0): DataFrame = {
    val v = if (version > 0) version else latestVersion(spark, path)
    readSnapshot(spark, path, readManifest(spark, path, v))
  }

  /** Exact row count of a committed version from COMMIT METADATA alone —
    * no Spark job, no data scan. Segments are immutable plain parquet
    * (deletes are copy-on-write rewrites), so the footer-derived
    * per-file row counts the manifest stats already carry ARE the live
    * counts; a file whose manifest entry has no column stats (e.g. an
    * all-boolean schema) falls back to one ~KB footer read. This is the
    * count every production format serves from its manifest layer —
    * the r14 artifact-build fix replaced six count() scans with it.
    */
  def countRows(spark: SparkSession, path: String, version: Int = 0): Long = {
    val v = if (version > 0) version else latestVersion(spark, path)
    val m = readManifest(spark, path, v)
    m.files.map { f =>
      m.stats.get(f).flatMap(_.values.headOption).map(_.rows)
        .getOrElse(FileStats.rowCount(spark, path, f))
    }.sum
  }

  /** Predicate-pruned read: consult each file's manifest zone map
    * ([[FileStats]]) and OPEN only files that can possibly satisfy
    * `predicate`, then apply the full predicate as a normal filter —
    * correctness never depends on pruning, which may only skip files
    * that provably cannot match (files without stats are always read).
    * This is planner-level data skipping: on a date-partitioned-ish or
    * z-ordered 100 TB table, a selective predicate touches a handful of
    * files instead of the whole file list, BEFORE any Spark job starts.
    */
  def readWhere(spark: SparkSession, path: String, predicate: String,
                version: Int = 0): DataFrame = {
    val v = if (version > 0) version else latestVersion(spark, path)
    val m = readManifest(spark, path, v)
    readSnapshot(spark, path, m.copy(files = prunedFiles(m, predicate)))
      .filter(expr(predicate))
  }

  /** (total files, files kept after zone-map pruning) for `predicate` —
    * the observability hook specs and layout audits (v27) assert on.
    */
  def pruneReport(spark: SparkSession, path: String, predicate: String,
                  version: Int = 0): (Int, Int) = {
    val v = if (version > 0) version else latestVersion(spark, path)
    val m = readManifest(spark, path, v)
    (m.files.size, prunedFiles(m, predicate).size)
  }

  private def prunedFiles(m: Manifest, predicate: String): Seq[String] = {
    // parse (not analyze): pruning works on the unresolved tree, so no
    // session catalog state is touched and column typos simply prune
    // nothing (then fail normally in the filter)
    val pred = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(predicate)
    m.files.filter(f =>
      FileStats.mayMatch(pred, m.stats.getOrElse(f, Map.empty))
        && FileStats.mayMatchBloom(pred, m.blooms.getOrElse(f, Map.empty)))
  }

  // frame for an already-parsed manifest — lets upsert/delete/compact
  // parse each manifest exactly ONCE per operation (they need both the
  // file list and .txn; re-calling read() would re-read it)
  private def readSnapshot(spark: SparkSession, path: String,
                           m: Manifest): DataFrame =
    if (m.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(m.schemaDdl))
    else spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(m.schemaDdl))
      .parquet(m.files.map(fp => s"$path/$fp"): _*)

  /** MERGE (upsert): rows in `changes` replace current rows with equal
    * `keys`; unmatched `changes` rows insert. Copy-on-write: one
    * distributed anti-join + union writes the next snapshot; the commit
    * is still the atomic manifest swap, so readers never observe a
    * half-merged table.
    */
  def upsert(spark: SparkSession, path: String, changes: DataFrame,
             keys: Seq[String], expectedVersion: Int = 0): Int = {
    val base =
      if (expectedVersion > 0) expectedVersion else latestVersion(spark, path)
    val curM = readManifest(spark, path, base)
    val cur = readSnapshot(spark, path, curM)
    val aligned = changes.select(cur.columns.map(col): _*)
    // same guard as append: without it unionByName type-widening could
    // commit a segment whose parquet types diverge from the pinned
    // manifest schema, making the new version unreadable
    require(shape(aligned.schema) == shape(cur.schema),
      s"upsert schema ${aligned.schema.toDDL} != table schema ${cur.schema.toDDL}")
    // MERGE contract (matches Delta/Iceberg): at most ONE source row per
    // key — two change rows with the same key would BOTH land in the new
    // snapshot (the anti-join removes current matches, the union keeps
    // all of `aligned`), silently corrupting key uniqueness. Last-writer-
    // wins is the caller's policy to apply (latestPerKey) before calling.
    val keyCols = keys.map(col)
    val Array(nRows, nKeys) = changes
      .agg(count(lit(1)), count_distinct(struct(keyCols: _*)))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    require(nRows == nKeys,
      s"upsert changes contain ${nRows - nKeys} duplicate row(s) per key " +
        s"(${keys.mkString(",")}): MERGE requires at most one source row " +
        "per key — dedupe (e.g. GraftOps.latestPerKey) before upserting")
    val merged = cur.join(changes.select(keyCols: _*).distinct(),
        keys, "left_anti")
      .unionByName(aligned)
    val (files, st) = writeSegment(merged, path)
    commit(spark, path, base, cur.schema.toDDL, files, curM.txn, st)
  }

  /** Last transaction watermark committed for `appId` (-1 if none) —
    * the idempotence handle for [[upsertBatch]].
    */
  def lastTxn(spark: SparkSession, path: String, appId: String): Long = {
    val v = latestVersion(spark, path)
    if (v == 0) -1L
    else readManifest(spark, path, v).txn.getOrElse(appId, -1L)
  }

  /** Exactly-once streaming MERGE (the Delta txnAppId/txnVersion
    * pattern, public knowledge): call from `foreachBatch`. The manifest
    * carries a per-appId transaction watermark; a replayed batch —
    * Structured Streaming re-runs the last in-flight batch after every
    * restart, and foreachBatch alone is therefore only at-least-once —
    * is detected by `batchId <= watermark` and SKIPPED, so the merge
    * applies exactly once no matter how many times the stream restarts.
    * The watermark rides the SAME atomic manifest swap as the data
    * (single commit point — no window where data landed but the
    * watermark didn't), and every other commit path preserves it, so
    * interleaved maintenance (append/compact/delete) can't reopen a
    * replay hole. Returns the (possibly unchanged) committed version.
    */
  def upsertBatch(spark: SparkSession, path: String, changes: DataFrame,
                  keys: Seq[String], appId: String, batchId: Long): Int = {
    val base = latestVersion(spark, path)
    require(base > 0, s"snapshot table $path does not exist")
    val curM = readManifest(spark, path, base)
    if (curM.txn.getOrElse(appId, -1L) >= batchId) return base // replay
    val cur = readSnapshot(spark, path, curM)
    val aligned = changes.select(cur.columns.map(col): _*)
    require(shape(aligned.schema) == shape(cur.schema),
      s"upsertBatch schema ${aligned.schema.toDDL} != table schema ${cur.schema.toDDL}")
    val keyCols = keys.map(col)
    // same MERGE contract as upsert: at most one source row per key —
    // the streaming wrapper (StreamOps.cdcUpsertStream) applies
    // latest-per-key to the micro-batch before calling
    val Array(nRows, nKeys) = changes
      .agg(count(lit(1)), count_distinct(struct(keyCols: _*)))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    require(nRows == nKeys,
      s"upsertBatch changes contain ${nRows - nKeys} duplicate row(s) per " +
        s"key (${keys.mkString(",")}): dedupe the micro-batch first")
    val merged = cur.join(changes.select(keyCols: _*).distinct(),
        keys, "left_anti")
      .unionByName(aligned)
    val (files, st) = writeSegment(merged, path)
    commit(spark, path, base, cur.schema.toDDL, files,
      curM.txn + (appId -> batchId), st)
  }

  /** Write-audit-publish: run an Expectations rule suite over `df` and
    * commit (create or append) ONLY if every rule passes — the gated-
    * publish pattern, with the audit on the exact data being committed
    * and the publish still the atomic manifest swap. A failing rule
    * throws before any manifest exists, so readers never see unaudited
    * rows; the orphaned segment of a failed audit is never referenced.
    */
  def commitGated(df: DataFrame, path: String,
                  rules: Seq[graft.api.Expectations.Rule]): Int = {
    graft.api.Expectations.assertAll(df, rules)
    if (latestVersion(df.sparkSession, path) == 0) create(df, path)
    else append(df, path)
  }

  /** Full CDC apply (the MERGE WHEN MATCHED DELETE surface): `changes`
    * carries the key columns, an op column with 'I'/'U'/'D' (insert and
    * update are both "upsert by key"; 'D' removes the key), and the data
    * columns for I/U rows. ONE copy-on-write commit applies the whole
    * batch: current rows minus every changed key, union the I/U payloads
    * — so a reader never observes a state where the delete landed but
    * the upsert didn't. Same at-most-one-source-row-per-key MERGE
    * contract as [[upsert]] (collapse the batch with latestPerKey
    * first); optional `appId`/`batchId` rides the manifest transaction
    * watermark for exactly-once replayed-batch skipping, identical to
    * [[upsertBatch]].
    */
  def applyCdc(spark: SparkSession, path: String, changes: DataFrame,
               keys: Seq[String], opCol: String,
               appId: String = null, batchId: Long = -1L): Int = {
    val base = latestVersion(spark, path)
    require(base > 0, s"snapshot table $path does not exist")
    val curM = readManifest(spark, path, base)
    if (appId != null && curM.txn.getOrElse(appId, -1L) >= batchId)
      return base // replayed batch: already applied exactly once
    val cur = readSnapshot(spark, path, curM)
    val keyCols = keys.map(col)
    val ops = changes.select((keys.map(col) :+
      upper(col(opCol)).as("__op")): _*)
    val Array(nRows, nKeys) = ops
      .agg(count(lit(1)), count_distinct(struct(keyCols: _*)))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    require(nRows == nKeys,
      s"applyCdc changes carry ${nRows - nKeys} duplicate row(s) per key " +
        s"(${keys.mkString(",")}): collapse the batch (latestPerKey) first")
    val badOps = ops.filter(!col("__op").isin("I", "U", "D")).limit(1)
      .collect()
    require(badOps.isEmpty,
      s"applyCdc op column '$opCol' carries '${badOps.headOption
        .map(_.getString(keys.size)).getOrElse("")}' — expected I/U/D")
    val upserts = changes.filter(upper(col(opCol)).isin("I", "U"))
      .select(cur.columns.map(col): _*)
    require(shape(upserts.schema) == shape(cur.schema),
      s"applyCdc schema ${upserts.schema.toDDL} != table schema " +
        s"${cur.schema.toDDL}")
    val merged = cur.join(ops.select(keyCols: _*), keys, "left_anti")
      .unionByName(upserts)
    val (files, st) = writeSegment(merged, path)
    val txn = if (appId == null) curM.txn else curM.txn + (appId -> batchId)
    commit(spark, path, base, cur.schema.toDDL, files, txn, st)
  }

  /** Attach per-(file, column) Bloom filters to the CURRENT version —
    * the point-lookup complement to the footer zone maps: an
    * unclustered high-cardinality column (ids, content hashes, emails)
    * spans nearly the full value range in every file, so min/max prunes
    * nothing, while a bloom answers "definitely not here" for equality
    * and IN probes at ~1% false positives. Explicit maintenance pass
    * (the ANALYZE shape): ONE distributed scan groups by
    * input_file_name and builds all requested blooms via the mergeable
    * [[graft.functions.BloomFilterAgg]] — map-side partial aggregation,
    * no driver data movement beyond the numBits/8-byte filters
    * themselves (metadata-sized: 16 KB per file-column at the default).
    * Commits a new version with the SAME files; later appends keep
    * their files unprobeable-but-kept until the next pass (sound);
    * rewrites (upsert/compact/cluster) drop blooms with the files they
    * replace. Only string and integral columns are bloomable.
    */
  def buildBlooms(spark: SparkSession, path: String, cols: Seq[String],
                  numBits: Int = 1 << 17, numHashes: Int = 5): Int = {
    import graft.functions.bloom_agg
    require(cols.nonEmpty, "buildBlooms needs at least one column")
    val base = latestVersion(spark, path)
    require(base > 0, s"snapshot table $path does not exist")
    val curM = readManifest(spark, path, base)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(curM.schemaDdl)
    val kinds = cols.map { c =>
      import org.apache.spark.sql.types._
      val dt = schema(c).dataType
      c -> (dt match {
        case StringType => "s"
        case ByteType | ShortType | IntegerType | LongType => "l"
        case other => throw new IllegalArgumentException(
          s"buildBlooms: column '$c' has unprobeable type $other " +
            "(string and integral columns only)")
      })
    }.toMap
    val aggs = cols.map(c => bloom_agg(col(c), numBits, numHashes).as(c))
    val rows = readSnapshot(spark, path, curM)
      .withColumn("__f", input_file_name())
      .groupBy("__f").agg(aggs.head, aggs.tail: _*)
      .collect()
    // input_file_name is a URI; manifest paths are table-relative
    // data/s<uuid>/<part> — match on the last three path components
    // (segment dirs are uuid-unique)
    def relOf(uri: String): String =
      uri.split('/').takeRight(3).mkString("/")
    val b64 = java.util.Base64.getEncoder
    val fresh = rows.map { r =>
      relOf(r.getString(0)) -> cols.zipWithIndex.map { case (c, i) =>
        c -> FileStats.FileBloom(kinds(c), numHashes,
          b64.encodeToString(r.getAs[Array[Byte]](i + 1)))
      }.toMap
    }.toMap
    val merged = (curM.blooms.keySet ++ fresh.keySet).map { f =>
      f -> (curM.blooms.getOrElse(f, Map.empty) ++ fresh.getOrElse(f, Map.empty))
    }.toMap
    commit(spark, path, base, curM.schemaDdl, curM.files, curM.txn,
      curM.stats, merged)
  }

  /** Copy-on-write delete of rows matching `predicate` (SQL fragment). */
  def delete(spark: SparkSession, path: String, predicate: String): Int = {
    val base = latestVersion(spark, path)
    val curM = readManifest(spark, path, base)
    val cur = readSnapshot(spark, path, curM)
    val (files, st) = writeSegment(cur.filter(!expr(predicate)), path)
    commit(spark, path, base, cur.schema.toDDL, files, curM.txn, st)
  }

  /** Compaction (the OPTIMIZE analog): rewrite the current snapshot's
    * rows into one fresh segment with `numFiles` files and commit it as
    * the next version — small-file pressure from many appends drops to
    * a bounded file count, rows and schema unchanged, prior versions
    * untouched (time travel still works until [[vacuum]]).
    */
  def compact(spark: SparkSession, path: String, numFiles: Int = 1): Int = {
    val base = latestVersion(spark, path)
    val curM = readManifest(spark, path, base)
    val cur = readSnapshot(spark, path, curM)
    val (files, st) = writeSegment(cur.repartition(numFiles), path)
    commit(spark, path, base, cur.schema.toDDL, files, curM.txn, st)
  }

  /** Clustered rewrite (the OPTIMIZE ZORDER analog): range-partition the
    * current snapshot on `cols` and sort within files, so each file owns
    * a narrow interval of the clustering key and [[readWhere]]'s zone
    * maps prune selective predicates to a handful of file opens. For one
    * column this is plain sorted layout; for several, interleave with
    * [[graft.functions.zorder2]] upstream and cluster on that. Rows,
    * schema, and history are untouched — same copy-on-write commit as
    * [[compact]], and the fresh segment's footer stats ride the manifest
    * automatically, which is what makes the layout actually pay off.
    */
  def cluster(spark: SparkSession, path: String, cols: Seq[String],
              numFiles: Int = 8): Int = {
    require(cols.nonEmpty, "cluster needs at least one column")
    val base = latestVersion(spark, path)
    val curM = readManifest(spark, path, base)
    val cur = readSnapshot(spark, path, curM)
    val cs = cols.map(col)
    val (files, st) = writeSegment(
      cur.repartitionByRange(numFiles, cs: _*).sortWithinPartitions(cs: _*),
      path)
    commit(spark, path, base, cur.schema.toDDL, files, curM.txn, st)
  }

  /** Change feed between two committed versions (the CDF analog): rows
    * present in `to` but not `from` surface as `insert`, rows present in
    * `from` but not `to` as `delete` — an UPDATE under MERGE appears as
    * its delete+insert pair, which is exactly what a downstream
    * incremental consumer needs to apply. Whole-row NULL-SAFE comparison
    * (no key required; row-SET semantics — duplicate multiplicities
    * don't register): two distributed anti-joins over the two immutable
    * snapshots, no driver data movement; at 100 TB feed it version pairs
    * that share most segments and the anti-joins stay
    * shuffle-partitioned on the row hash like any other join.
    */
  def changes(spark: SparkSession, path: String, fromVersion: Int,
              toVersion: Int): DataFrame = {
    require(fromVersion > 0 && toVersion > 0,
      "changes() needs explicit committed versions")
    val rawA = read(spark, path, fromVersion)
    val rawB = read(spark, path, toVersion)
    // align both snapshots to the UNION of columns (additive mergeSchema
    // evolution between the versions surfaces the new column as NULL on
    // the older side — the change feed then reports the backfill rows as
    // update pairs, which is semantically exact for row-set CDF)
    def q(c: String) = s"`${c.replace("`", "``")}`" // dots/backticks safe
    val cols = (rawA.columns ++ rawB.columns.filterNot(rawA.columns.contains)).toSeq
    // toMap keeps the LAST occurrence, so the newer snapshot's type wins
    val types = (rawA.schema ++ rawB.schema).map(f => f.name -> f.dataType).toMap
    def align(df: DataFrame) = df.select(cols.map { c =>
      if (df.columns.contains(c)) col(q(c)) else lit(null).cast(types(c)).as(c)
    }: _*)
    val a = align(rawA).alias("a")
    val b = align(rawB).alias("b")
    def cond = cols.map(c => col(s"a.${q(c)}") <=> col(s"b.${q(c)}")).reduce(_ && _)
    b.join(a, cond, "left_anti").withColumn("_change_type", lit("insert"))
      .unionByName(
        a.join(b, cond, "left_anti").withColumn("_change_type", lit("delete")))
  }

  /** Retention cleanup (the VACUUM analog): drop every manifest older
    * than the newest `keepVersions` that still EXISTS (earlier vacuums
    * may have removed a prefix — only the manifest listing decides, one
    * RPC, never per-version probes), then delete data segments no kept
    * manifest references, plus crashed-writer temp manifests. Segments
    * (and temp manifests) younger than `graceMs` are spared: a
    * concurrent writer stages its segment BEFORE publishing the
    * manifest, so reclaiming fresh unreferenced files would let that
    * writer commit a torn table — the same modification-time grace
    * window the production formats use. Kept snapshots stay
    * byte-identical; run with the default grace unless all writers are
    * known quiesced.
    */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 2,
             graceMs: Long = 3600L * 1000): Unit = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val f = fs(spark, path)
    val mdir = manifestDir(path)
    if (!f.exists(mdir)) return
    val now = System.currentTimeMillis()
    val statuses = f.listStatus(mdir)
    val versions = statuses.map(_.getPath.getName)
      .collect { case ManifestName(n) => n.toInt }.sorted.toSeq
    if (versions.isEmpty) return
    val keepFrom = math.max(versions.min, versions.max - keepVersions + 1)
    val referenced = versions.filter(_ >= keepFrom)
      .flatMap(v => readManifest(spark, path, v).files).toSet
    versions.filter(_ < keepFrom).foreach { v =>
      f.delete(new Path(mdir, s"v$v.json"), false)
    }
    statuses.filter { st =>
      st.getPath.getName.startsWith(".tmp-") &&
        now - st.getModificationTime > graceMs
    }.foreach(st => f.delete(st.getPath, false))
    val dataDir = new Path(path, "data")
    if (f.exists(dataDir)) f.listStatus(dataDir).foreach { seg =>
      // directory mtime moves when files land in it, so a fresh mtime
      // marks an in-flight writer's staging segment — spare it
      val fresh = now - seg.getModificationTime <= graceMs
      if (!fresh) {
        val segRel = s"data/${seg.getPath.getName}"
        val segFiles = f.listStatus(seg.getPath).map(_.getPath.getName)
          .filter(_.endsWith(".parquet")).map(n => s"$segRel/$n")
        // forall on an EMPTY list is true: segments holding no parquet
        // at all (crashed writer, empty write) are reclaimed too
        if (segFiles.forall(!referenced.contains(_)))
          f.delete(seg.getPath, true)
      }
    }
  }
}
