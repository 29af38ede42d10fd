package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Append-only Delta Lake table WRITER — the emit side of the interop
  * story: a graft pipeline can land its output as a Delta table that
  * Spark+delta-io, Trino, DuckDB-delta, or any other reader of the
  * public protocol consumes directly (and [[DeltaRead]] round-trips).
  *
  * What it writes, per the public PROTOCOL.md:
  *   - data as immutable parquet files under the table root;
  *   - commit `NNNN.json` with protocol (minReader 1 / minWriter 2),
  *     metaData (Spark schema json, no partition columns), and add
  *     actions carrying per-file stats (numRecords / minValues /
  *     maxValues / nullCount) harvested METADATA-ONLY from the freshly
  *     written parquet footers via [[FileStats]] — the same zero-rescan
  *     discipline SnapshotTable's zone maps use. Stats are emitted only
  *     for int/long/float/double/string columns whose footer domain
  *     matches Delta's json stats domain; other types get no stats
  *     (readers then simply don't prune on them — sound).
  *
  * Commit atomicity is the SAME put-if-absent primitive SnapshotTable
  * commits through ([[SnapshotTable.CommitStore]] — hard link on local
  * fs, no-replace rename on HDFS, mutex-guarded PUT on raw object
  * stores): the Delta-on-filesystem contract is exactly "version N's
  * json is created by at most one writer", so racing appends produce a
  * loser who re-reads and retries rather than a clobbered log.
  *
  * Partitioned writes (round-6 continuation): `create(df, path, cols)`
  * lands hive-layout data files (`p=v/part-*.parquet` — Spark's own
  * partitionBy stage does the splitting and hive-encoding), declares
  * `partitionColumns` in metaData, and carries each file's
  * `partitionValues` map in its add action per the protocol (partition
  * columns live ONLY in the directory/add action, never in the data
  * files — exactly what protocol readers expect). Appends must match
  * the table's declared partitioning. NULL partition values are
  * refused loudly (the hive default-partition encoding is ambiguous
  * across readers; a nullable partition key is a modeling bug anyway).
  *
  * Checkpointing: every `graft.delta.checkpoint.interval` commits
  * (default 10) the winning appender writes the classic single-file
  * checkpoint parquet (reconciled protocol + metaData + live adds with
  * dataChange=false) and points `_last_checkpoint` at it, so a
  * long-lived table never accretes an unbounded JSON-only log; a
  * checkpoint failure never fails the already-committed append, and
  * tables carrying reader features this writer does not model are left
  * un-checkpointed rather than mis-reconciled.
  *
  * Non-goals: no update/delete/merge (append-only), no schema evolution
  * (appends must match the table schema exactly — loud refusal
  * otherwise).
  */
object DeltaWrite {
  private val om = new ObjectMapper()

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Unpartitioned create — the py4j-friendly arity. */
  def create(df: DataFrame, path: String): Long = create(df, path, Nil)

  /** Create the table: writes data files + commit 0. Fails if a log
    * already exists. `partitionBy` declares hive-layout partitioning.
    */
  def create(df: DataFrame, path: String,
             partitionBy: Seq[String]): Long = {
    val spark = df.sparkSession
    require(!fs(spark, path).exists(new Path(path, "_delta_log")),
      s"$path already has a _delta_log — use append")
    partitionBy.foreach(c => require(df.columns.contains(c),
      s"partition column $c not in ${df.columns.mkString(",")}"))
    commit(df, path, 0L, withMeta = true, partitionBy)
  }

  /** Append a new segment as the next version. Optimistic concurrency:
    * resolves the latest version, writes the segment, then races the
    * put-if-absent commit; on loss (someone else committed that
    * version) it retries against the new head, up to 10 times. The
    * appended schema must equal the table schema.
    */
  def append(df: DataFrame, path: String): Long =
    append(df, path, mergeSchema = false)

  /** Append with optional ADDITIVE schema evolution (the Delta
    * autoMerge contract): with `mergeSchema=true`, columns the table
    * already has must match by (name, type) exactly, NEW columns append
    * nullable to the table schema (a metaData action in the same
    * commit updates schemaString), and columns the batch OMITS are
    * fine — old and new files each carry only their own columns, and
    * the reader projects every file into the latest schema so missing
    * columns surface NULL with zero file rewrites. Type conflicts
    * refuse loudly.
    */
  def append(df: DataFrame, path: String, mergeSchema: Boolean): Long = {
    val spark = df.sparkSession
    val st = DeltaRead.replay(spark, path, -1L) // also validates the log
    requireAppendable(st)
    // schema from the log's schemaString (NOT an assembled DataFrame —
    // that would strip per-field metadata, and an evolved metaData
    // re-emitted from it would corrupt any table whose fields carry it)
    val tableSchema = DeltaRead.schemaOf(st)
    val newCols = df.schema.fields.filterNot(f =>
      tableSchema.fieldNames.contains(f.name))
    // merged schema + any configuration delta the evolution commits
    // (column-mapped tables bump delta.columnMapping.maxColumnId)
    val merged: Option[(StructType, Map[String, String])] =
      if (!mergeSchema) {
        require(canonical(df.schema) == canonical(tableSchema),
          s"append schema ${df.schema.toDDL} != table schema " +
            s"${tableSchema.toDDL} (pass mergeSchema=true to evolve)")
        None
      } else {
        df.schema.fields.filter(f => tableSchema.fieldNames.contains(f.name))
          .foreach { f =>
            require(tableSchema(f.name).dataType == f.dataType,
              s"column ${f.name}: batch type ${f.dataType.sql} conflicts " +
                s"with table type ${tableSchema(f.name).dataType.sql} — " +
                "additive evolution only, refusing")
          }
        if (newCols.isEmpty) None
        else {
          // evolution re-emits metaData: refuse when unknown writer
          // features could hang invariants off the schema
          requireEvolvable(st)
          val mode = st.conf.getOrElse("delta.columnMapping.mode", "none")
          if (mode == "none")
            Some((StructType(tableSchema.fields ++ newCols.map(f =>
              StructField(f.name, f.dataType, nullable = true))),
              Map.empty))
          else {
            // column-mapped evolution (round 10): each new column mints
            // a FRESH field id above delta.columnMapping.maxColumnId
            // and a `col-<uuid>` physical name per the protocol, and
            // the same commit's metaData bumps maxColumnId — reusing an
            // id or a physical name would silently alias an old
            // column's data into the new one
            val maxId = st.conf.get("delta.columnMapping.maxColumnId")
              .map(_.toLong).getOrElse(
                tableSchema.fields.map(f =>
                  if (f.metadata.contains("delta.columnMapping.id"))
                    f.metadata.getLong("delta.columnMapping.id")
                  else 0L).foldLeft(0L)(math.max))
            var next = maxId
            val minted = newCols.map { f =>
              next += 1
              val meta = new MetadataBuilder()
                .putLong("delta.columnMapping.id", next)
                .putString("delta.columnMapping.physicalName",
                  s"col-${java.util.UUID.randomUUID()}")
                .build()
              StructField(f.name, f.dataType, nullable = true, meta)
            }
            Some((StructType(tableSchema.fields ++ minted),
              Map("delta.columnMapping.maxColumnId" -> next.toString)))
          }
        }
      }
    val partitionBy = st.partitionCols
    partitionBy.foreach(c => require(df.columns.contains(c),
      s"append batch misses partition column $c"))
    val (physDf, physParts, keyOf) =
      physicalize(df, st, merged.map(_._1).getOrElse(tableSchema),
        partitionBy)
    var version = DeltaRead.latestVersion(spark, path) + 1
    var attempts = 0
    var done = -1L
    var files: Seq[Written] = null
    while (done < 0) {
      require(attempts < 10, s"$path: lost the commit race 10 times")
      if (files == null) files = writeSegment(physDf, path, physParts)
      val metaLine = merged.map { case (m, extraConf) =>
        metaAction(m, partitionBy, st, extraConf) }.toSeq
      if (publish(spark, path, version, metaLine ++
          actionsFor(df.schema, files, withMeta = false, physParts,
            statKey = keyOf)))
        done = version
      else { attempts += 1; version = DeltaRead.latestVersion(spark, path) + 1 }
    }
    maybeCheckpoint(spark, path, done)
    done
  }

  /** Gate for EVERY append into a mapped table: physical-name
    * re-emission (round 9) supports FLAT mapped schemas — nested
    * structs would need a recursive rename this writer does not model,
    * so they refuse rather than corrupt.
    */
  private def requireAppendable(st: DeltaRead.LogState): Unit = {
    val mode = st.conf.getOrElse("delta.columnMapping.mode", "none")
    if (mode != "none") {
      require(mode == "name" || mode == "id",
        s"delta.columnMapping.mode=$mode unknown to this writer — refusing")
      DeltaRead.schemaOf(st).fields.foreach { f =>
        require(!containsStruct(f.dataType),
          s"column ${f.name}: nested fields on a column-mapped table — " +
            "this writer re-emits physical names for FLAT mapped " +
            "schemas only, refusing rather than corrupting")
        require(f.metadata.contains("delta.columnMapping.physicalName"),
          s"column ${f.name}: mapped table without physicalName " +
            "metadata — refusing")
        if (mode == "id")
          require(f.metadata.contains("delta.columnMapping.id"),
            s"column ${f.name}: id-mapped table without a field id — " +
              "refusing")
      }
    }
  }

  private def containsStruct(dt: DataType): Boolean = dt match {
    case _: StructType => true
    case a: ArrayType  => containsStruct(a.elementType)
    case m: MapType    => containsStruct(m.keyType) ||
                          containsStruct(m.valueType)
    case _             => false
  }

  /** Logical→physical projection for writing into a column-mapped
    * table: renames top-level columns to their physical parquet names
    * (`id` mode also stamps `parquet.field.id` so field-id readers
    * resolve the new file), and returns the physical partition-column
    * names plus the logical→physical stats key map. Identity on
    * unmapped tables. `extra` columns (the CDF `_change_type`) pass
    * through unrenamed.
    */
  private def physicalize(df: DataFrame, st: DeltaRead.LogState,
                          schema: StructType, partitionBy: Seq[String],
                          extra: Seq[String] = Nil)
      : (DataFrame, Seq[String], Map[String, String]) = {
    val mode = st.conf.getOrElse("delta.columnMapping.mode", "none")
    val present = schema.fields.filter(f => df.columns.contains(f.name))
    if (mode == "none")
      return (df, partitionBy, present.map(f => f.name -> f.name).toMap)
    requireAppendable(st) // flat mapped schema with metadata, validated
    val keyOf = present.map(f => f.name ->
      f.metadata.getString("delta.columnMapping.physicalName")).toMap
    val cols = present.map { f =>
      val phys = keyOf(f.name)
      if (mode == "id") {
        val meta = new MetadataBuilder().putLong("parquet.field.id",
          f.metadata.getLong("delta.columnMapping.id")).build()
        col(f.name).as(phys, meta)
      } else col(f.name).as(phys)
    } ++ extra.map(col)
    if (mode == "id") // field ids only land when the writer conf is on
      df.sparkSession.conf.set("spark.sql.parquet.fieldId.write.enabled",
        "true")
    (df.select(cols.toSeq: _*), partitionBy.map(keyOf), keyOf)
  }

  /** Gate for schema EVOLUTION specifically: new columns on a table
    * whose writer features this writer does not model (generated
    * columns, identity columns, row tracking…) could invalidate state
    * those features hang off the schema — refuse.
    */
  private def requireEvolvable(st: DeltaRead.LogState): Unit = {
    // column-mapped tables evolve too (round 10): the append path mints
    // fresh field ids + physical names for the new columns
    val modeled = Set("appendOnly", "invariants", "deletionVectors",
      "timestampNtz", "columnMapping")
    val unknown = st.writerFeatures.filterNot(modeled)
    require(unknown.isEmpty,
      s"mergeSchema evolution refused: table carries writer features " +
        s"${unknown.mkString(", ")} this writer does not model — an " +
        "evolved metaData could invalidate their schema-attached state")
  }

  /** EXACTLY-ONCE streaming append — the protocol's `txn` action: the
    * commit carries `{appId, version = batchId}` and the table's
    * per-appId watermark (tracked through commits AND checkpoints) makes
    * a replayed micro-batch a detected no-op. Structured Streaming
    * re-runs the last in-flight batch on every restart, so a bare
    * foreachBatch append is only at-least-once; this is the
    * at-most-once half that makes it exactly-once. Returns the committed
    * version, or the current version when the batch was already applied.
    * A loser of the commit race re-checks the fresh watermark before
    * retrying (its already-moved data files stay unreferenced — invisible
    * to every reader — if the check now says skip).
    */
  def appendBatch(df: DataFrame, path: String, appId: String,
                  batchId: Long): Long = {
    require(appId.nonEmpty, "appendBatch: appId must be non-empty")
    val spark = df.sparkSession
    val st0 = DeltaRead.replay(spark, path, -1L)
    requireAppendable(st0)
    val tableSchema = DeltaRead.schemaOf(st0)
    require(canonical(df.schema) == canonical(tableSchema),
      s"append schema ${df.schema.toDDL} != table schema " +
        s"${tableSchema.toDDL}")
    val partitionBy = st0.partitionCols
    val (physDf, physParts, keyOf) =
      physicalize(df, st0, tableSchema, partitionBy)
    var attempts = 0
    var files: Seq[Written] = null
    while (true) {
      require(attempts < 10, s"$path: lost the commit race 10 times")
      val st = DeltaRead.replay(spark, path, -1L)
      val cur = DeltaRead.latestVersion(spark, path)
      if (st.txns.get(appId).exists(_ >= batchId)) return cur // replayed
      if (files == null) files = writeSegment(physDf, path, physParts)
      val txnLine =
        s"""{"txn":{"appId":${om.writeValueAsString(appId)},""" +
          s""""version":$batchId}}"""
      if (publish(spark, path, cur + 1, txnLine +:
          actionsFor(df.schema, files, withMeta = false, physParts,
            statKey = keyOf))) {
        maybeCheckpoint(spark, path, cur + 1)
        return cur + 1
      }
      attempts += 1
    }
    -1L // unreachable
  }

  // --------------------------------------------------------------------
  // copy-on-write DELETE / UPSERT — the MERGE surface on the Delta side
  // (SnapshotTable has had it since round 4; this brings the open
  // format to parity)
  // --------------------------------------------------------------------

  /** Refusal gate for the copy-on-write paths: they rewrite raw data
    * files, so table state this writer cannot faithfully re-emit
    * (reader features beyond deletion vectors / column mapping) is
    * refused rather than corrupted. DV-bearing tables ARE rewritable —
    * the complement scan goes through the DV-applying assembler, and
    * the rewritten file (a plain add) replaces the DV'd one in the same
    * commit. Column-mapped tables ARE rewritable since round 9 (flat
    * schemas; [[physicalize]] re-emits physical names/field ids).
    */
  private def requireRewritable(st: DeltaRead.LogState,
                                live: Seq[DeltaRead.AddEntry]): Unit = {
    val okFeatures = Set("deletionVectors", "timestampNtz",
      "columnMapping")
    require(st.readerFeatures.forall(okFeatures),
      "copy-on-write DELETE/UPSERT supports reader features at most " +
        "deletionVectors/timestampNtz/columnMapping — refusing rather " +
        "than corrupting")
    requireAppendable(st) // mapped tables: flat schema + metadata
  }

  /** DELETE rows matching `predicate` (SQL), copy-on-write: candidate
    * files are STATS-PRUNED on the predicate (a file whose zone maps
    * cannot satisfy it is never opened), candidates are scanned once to
    * find the files that actually hold matches, and only those are
    * rewritten (complement rows re-land as a fresh segment, rewritten
    * files get remove actions in the same commit — a reader never sees
    * the delete half-applied). Rows where the predicate is NULL are
    * KEPT (SQL DELETE semantics). Returns the committed version, or the
    * current version if nothing matched.
    */
  def delete(spark: SparkSession, path: String, predicate: String): Long = {
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the delete commit race 10 times")
      val cur = DeltaRead.latestVersion(spark, path)
      val (st, live) = DeltaRead.checkpointState(spark, path, cur)
      requireRewritable(st, live)
      val schema = DeltaRead.schemaOf(st)
      val pred = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(predicate)
      val candidates = live.filter(a =>
        FileStats.mayMatch(pred, DeltaRead.entryStats(st, schema, a)))
      if (candidates.isEmpty) return cur
      // one distributed pass over candidates: which files hold matches?
      val scanned = DeltaRead.scan(spark, path, st, schema, candidates,
        withMeta = true)
      val hit = scanned.filter(expr(predicate))
        .select(DeltaRead.FKey).distinct()
        .collect().map(_.getString(0)).toSet
      if (hit.isEmpty) return cur
      def base(a: DeltaRead.AddEntry): String =
        PathCodec.percentDecode(a.path).split("/").last
      // basename collisions make the scan key ambiguous — rewrite every
      // candidate sharing a hit basename (conservative, still exact)
      val affected = candidates.filter(a => hit.contains(base(a)))
      // assemble (not scan): DVs on affected files apply BEFORE the
      // rewrite, so a copy-on-write can never resurrect deleted rows
      val complement = DeltaRead
        .assemble(spark, path, st, affected)
        .filter(!coalesce(expr(predicate), lit(false)))
      val (physC, physParts, keyOf) =
        physicalize(complement, st, schema, st.partitionCols)
      val files = writeSegment(physC, path, physParts)
      // CDF: the deleted rows (DV-applied view, so never a masked row)
      // land as row-level 'delete' change data in the same commit
      val cdc =
        if (!cdfEnabled(st)) Nil
        else {
          val deleted = DeltaRead.assemble(spark, path, st, affected)
            .filter(coalesce(expr(predicate), lit(false)))
            .withColumn("_change_type", lit("delete"))
          val (physD, pp, _) = physicalize(deleted, st, schema,
            st.partitionCols, extra = Seq("_change_type"))
          cdcActionsFor(physD, path, pp)
        }
      val actions = cdc ++ affected.map(removeAction(_)) ++
        actionsFor(schema, files, withMeta = false, physParts,
          statKey = keyOf)
      if (publish(spark, path, cur + 1, actions)) {
        maybeCheckpoint(spark, path, cur + 1)
        return cur + 1
      }
      attempts += 1 // concurrent commit: REPLAN against the new head
    }
    -1L // unreachable
  }

  /** UPSERT (MERGE): `source` rows REPLACE table rows sharing their
    * `keys` and the rest INSERT, in one atomic commit. Source must
    * carry the table schema exactly and at most one row per key.
    * Copy-on-write plan: candidate files stats-pruned by the source key
    * range (single-key tables), one scan finds files actually holding
    * matched keys, only those rewrite (complement via key anti-join);
    * the fresh segment carries complement + ALL source rows. Returns
    * the committed version.
    */
  def upsert(source: DataFrame, path: String, keys: Seq[String]): Long =
    upsertImpl(source, path, keys, None)

  /** EXACTLY-ONCE streaming UPSERT — [[upsert]] carrying the protocol's
    * `txn` watermark (the [[appendBatch]] / [[deleteDvBatch]] contract
    * on the merge side, completing the three-leg symmetry with
    * SnapshotTable.upsertBatch and Hudi upsertLogBatch): a replayed
    * micro-batch is a detected no-op, and an empty batch still
    * publishes its watermark so replay detection never regresses.
    */
  def upsertBatch(source: DataFrame, path: String, keys: Seq[String],
                  appId: String, batchId: Long): Long = {
    require(appId.nonEmpty, "upsertBatch: appId must be non-empty")
    upsertImpl(source, path, keys, Some((appId, batchId)))
  }

  private def upsertImpl(source: DataFrame, path: String,
                         keys: Seq[String],
                         txn: Option[(String, Long)]): Long = {
    val spark = source.sparkSession
    require(keys.nonEmpty, "upsert needs at least one key column")
    val dupes = source.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dupes.isEmpty,
      s"upsert source has multiple rows for key ${dupes.headOption}" +
        " — MERGE requires at most one source row per key")
    def txnLines: Seq[String] = txn.toSeq.map { case (a, b) =>
      s"""{"txn":{"appId":${om.writeValueAsString(a)},"version":$b}}"""
    }
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the upsert commit race 10 times")
      val cur = DeltaRead.latestVersion(spark, path)
      val (st, live) = DeltaRead.checkpointState(spark, path, cur)
      txn.foreach { case (a, b) =>
        if (st.txns.get(a).exists(_ >= b)) return cur // replayed batch
      }
      requireRewritable(st, live)
      val schema = DeltaRead.schemaOf(st)
      require(canonical(source.schema) == canonical(
          StructType(schema.fields.map(f =>
            StructField(f.name, f.dataType, f.nullable)))),
        s"upsert source schema ${source.schema.toDDL} != table schema " +
          s"${schema.toDDL}")
      keys.foreach(k => require(schema.fieldNames.contains(k),
        s"key column $k not in the table schema"))
      // single-key stats pruning: candidates must overlap the source
      // key range; multi-key (or stats-less) tables scan all live files
      val candidates =
        if (keys.size == 1) {
          val k = keys.head
          val mm = source.agg(min(col(k)).cast("string"),
            max(col(k)).cast("string")).head()
          if (mm.isNullAt(0)) Seq.empty
          else {
            val p = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
              .parseExpression(
                s"$k >= ${sqlLit(mm.getString(0), schema(k).dataType)} AND " +
                  s"$k <= ${sqlLit(mm.getString(1), schema(k).dataType)}")
            live.filter(a =>
              FileStats.mayMatch(p, DeltaRead.entryStats(st, schema, a)))
          }
        } else live
      val keyFrame = source.select(keys.map(col): _*)
      val hit =
        if (candidates.isEmpty) Set.empty[String]
        else DeltaRead.scan(spark, path, st, schema, candidates,
            withMeta = true)
          .join(keyFrame, keys, "left_semi")
          .select(DeltaRead.FKey).distinct()
          .collect().map(_.getString(0)).toSet
      def base(a: DeltaRead.AddEntry): String =
        PathCodec.percentDecode(a.path).split("/").last
      val affected = candidates.filter(a => hit.contains(base(a)))
      val complement =
        if (affected.isEmpty) None
        else Some(DeltaRead
          .assemble(spark, path, st, affected) // DV-applied rewrite source
          .join(keyFrame, keys, "left_anti"))
      val ordered = schema.fieldNames.toSeq.map(col)
      val segment = complement
        .map(_.select(ordered: _*).unionByName(source.select(ordered: _*)))
        .getOrElse(source.select(ordered: _*))
      val (physSeg, physParts, keyOf) =
        physicalize(segment, st, schema, st.partitionCols)
      val files = writeSegment(physSeg, path, physParts)
      // CDF on a rewriting MERGE: matched rows emit update_preimage
      // (old, DV-applied) + update_postimage (new), unmatched source
      // rows emit insert — all in the commit's _change_data files. A
      // pure-insert merge (no rewrite) emits no cdc: readers derive
      // inserts from its dataChange adds.
      val cdc =
        if (!cdfEnabled(st) || affected.isEmpty) Nil
        else {
          val pre = DeltaRead.assemble(spark, path, st, affected)
            .join(keyFrame, keys, "left_semi")
          val preKeys = pre.select(keys.map(col): _*).distinct()
          val post = source.join(preKeys, keys, "left_semi")
          val ins = source.join(preKeys, keys, "left_anti")
          val cdcRows = pre.select(ordered: _*)
              .withColumn("_change_type", lit("update_preimage"))
            .unionByName(post.select(ordered: _*)
              .withColumn("_change_type", lit("update_postimage")))
            .unionByName(ins.select(ordered: _*)
              .withColumn("_change_type", lit("insert")))
          val (physCdc, pp, _) = physicalize(cdcRows, st, schema,
            st.partitionCols, extra = Seq("_change_type"))
          cdcActionsFor(physCdc, path, pp)
        }
      val actions = txnLines ++ cdc ++ affected.map(removeAction(_)) ++
        actionsFor(schema, files, withMeta = false, physParts,
          statKey = keyOf)
      if (publish(spark, path, cur + 1, actions)) {
        maybeCheckpoint(spark, path, cur + 1)
        return cur + 1
      }
      attempts += 1
    }
    -1L // unreachable
  }

  // --------------------------------------------------------------------
  // merge-on-read DELETE / UPSERT — deletion-vector AUTHORING. The COW
  // paths above pay O(matched files' bytes) per operation; these pay
  // O(matched ROWS' bitmap bytes): the data files stay put and a
  // compressed row mask re-attaches them. At 100 TB this is the
  // difference between a streaming delete rewriting terabytes per
  // micro-batch and appending kilobytes. [[DeltaRead]] has applied DVs
  // since round 8; these author descriptors it (and any protocol
  // reader) decodes. OPTIMIZE folds the masks back into clean files;
  // VACUUM already treats live DV files as referenced.
  // --------------------------------------------------------------------

  private def baseOf(a: DeltaRead.AddEntry): String =
    PathCodec.percentDecode(a.path).split("/").last

  /** The DV authoring paths key matched positions by file BASENAME
    * (graft-written names are UUID-unique table-wide). An EXTERNAL
    * table that collides basenames across partition directories would
    * let one file's mask absorb another's positions — refuse loudly
    * instead (the read side handles collisions with full-path tagging;
    * the write side stays conservative).
    */
  private def requireUniqueBasenames(files: Seq[DeltaRead.AddEntry],
                                     op: String): Unit =
    require(files.map(baseOf).distinct.size == files.size,
      s"$op: candidate files collide on basename — position masks " +
        "would cross files, refusing (rewrite with the copy-on-write " +
        "path instead)")

  /** (file-basename, position) rows of the EXISTING deletion vectors on
    * `files`, decoded on executors exactly like the read side — the
    * authored replacement DV must be a SUPERSET of the old mask (the
    * protocol replaces, never stacks, descriptors).
    */
  private def existingDvDf(spark: SparkSession, path: String,
                           files: Seq[DeltaRead.AddEntry]): DataFrame = {
    import spark.implicits._
    val keyed: Seq[(String, Array[Byte])] =
      files.filter(_.dv.exists(_.cardinality > 0L)).map { a =>
        baseOf(a) -> DeltaRead.dvBytes(spark, path, a.dv.get)
      }
    spark.createDataset(keyed)
      .flatMap { case (k, b) =>
        DeltaRead.roaringPositions(b).map(p => (k, p)) }
      .toDF(DeltaRead.FKey, DeltaRead.RIdx)
  }

  /** Serialize per-file DV blobs on EXECUTORS from (file, position)
    * rows and collect only the compressed bytes: (basename, blob,
    * cardinality). Driver memory is bounded by the BITMAP bytes —
    * KBs/MBs even for hundreds of millions of deleted rows — never by
    * the position count.
    */
  private def dvBlobsOf(spark: SparkSession, delRows: DataFrame)
      : Seq[(String, Array[Byte], Long)] = {
    import spark.implicits._
    // positions STREAM into per-high-word roaring bitmaps (mapGroups
    // iterates the sorted shuffle run lazily) — executor memory per
    // file is the COMPRESSED bitmap, never a collect_list buffer of
    // 8 bytes per deleted row; roaring add dedups, so cardinality is
    // the distinct count by construction
    delRows.select(col(DeltaRead.FKey).cast("string"),
        col(DeltaRead.RIdx).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val byKey =
          new java.util.TreeMap[Int, org.roaringbitmap.RoaringBitmap]()
        it.foreach { case (_, p) =>
          require(p >= 0 && (p >>> 32) <= Int.MaxValue,
            "DV position outside the portable RoaringBitmapArray domain")
          val hi = (p >>> 32).toInt
          var rb = byKey.get(hi)
          if (rb == null) {
            rb = new org.roaringbitmap.RoaringBitmap(); byKey.put(hi, rb)
          }
          rb.add((p & 0xFFFFFFFFL).toInt)
        }
        import scala.jdk.CollectionConverters._
        val maps = byKey.entrySet().asScala.toSeq
          .map(e => (e.getKey.intValue(), e.getValue))
        val card = maps.map(_._2.getLongCardinality).sum
        (key, DeltaRead.roaringSerializeBitmaps(maps), card)
      }.collect().toSeq
  }

  /** Write ONE on-disk DV file carrying every blob of the commit, per
    * the public protocol's deletion-vector file format: version byte 1,
    * then per DV a 4-byte big-endian length, the portable
    * RoaringBitmapArray bytes, and a 4-byte big-endian CRC-32 of those
    * bytes. Returns each key's descriptor (storageType `u`,
    * pathOrInlineDv = z85(uuid) with no directory prefix, offset at the
    * length word — the exact shape [[DeltaRead.dvBytes]] and vacuum's
    * reachability walk already decode) plus the file's path for
    * lost-race cleanup.
    */
  private def writeDvFile(spark: SparkSession, path: String,
                          blobs: Seq[(String, Array[Byte], Long)])
      : (Map[String, DeltaRead.Dv], Path) = {
    val f = fs(spark, path)
    val uuid = java.util.UUID.randomUUID()
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val enc = PathCodec.z85Encode(bb.array())
    val target = new Path(path, s"deletion_vector_$uuid.bin")
    val out = f.create(target, false)
    val res = scala.collection.mutable.Map[String, DeltaRead.Dv]()
    try {
      out.write(1) // format version
      var offset = 1
      blobs.foreach { case (key, bytes, card) =>
        out.writeInt(bytes.length) // DataOutput: big-endian
        out.write(bytes)
        val crc = new java.util.zip.CRC32()
        crc.update(bytes)
        out.writeInt(crc.getValue.toInt)
        res(key) = DeltaRead.Dv("u", enc, offset, bytes.length, card)
        offset += 4 + bytes.length + 4
      }
    } finally out.close()
    (res.toMap, target)
  }

  /** Protocol line enabling `deletionVectors` when the table lacks it.
    * Upgrading a legacy protocol to table features must LIST the
    * features the legacy version numbers implied — otherwise readers
    * and writers that keyed on the version would silently lose them.
    */
  private def dvProtocolUpgrade(st: DeltaRead.LogState): Seq[String] = {
    if (st.minReaderVersion >= 3 &&
        st.readerFeatures.contains("deletionVectors")) return Nil
    val impliedW = Map(
      2 -> Seq("appendOnly", "invariants"),
      3 -> Seq("checkConstraints"),
      4 -> Seq("changeDataFeed", "generatedColumns"),
      5 -> Seq("columnMapping"),
      6 -> Seq("identityColumns"))
    val rf = ((if (st.minReaderVersion >= 3) st.readerFeatures
               else if (st.minReaderVersion == 2) Seq("columnMapping")
               else Nil) :+ "deletionVectors").distinct
    val wf = ((if (st.minWriterVersion >= 7) st.writerFeatures
               else (2 to st.minWriterVersion)
                 .flatMap(v => impliedW.getOrElse(v, Nil)) ++
                 st.writerFeatures) :+ "deletionVectors").distinct
    def arr(xs: Seq[String]) =
      xs.map(om.writeValueAsString(_)).mkString("[", ",", "]")
    Seq(s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      s""""readerFeatures":${arr(rf)},"writerFeatures":${arr(wf)}}}""")
  }

  /** Table-property line for a DV-authoring commit: the public protocol
    * keys third-party DV AUTHORING on `delta.enableDeletionVectors`
    * being true (feature support in the protocol action alone is
    * "supported", not "enabled"), so the first graft DV commit re-emits
    * metaData with the property set — schema, partitioning, table id
    * and every other property carry forward verbatim.
    */
  private def dvEnableProperty(st: DeltaRead.LogState): Seq[String] =
    if (st.conf.get("delta.enableDeletionVectors").contains("true")) Nil
    else Seq(metaAction(DeltaRead.schemaOf(st), st.partitionCols, st,
      extraConf = Map("delta.enableDeletionVectors" -> "true")))

  /** DELETE rows matching `predicate`, MERGE-ON-READ: candidate files
    * stats-prune exactly like [[delete]], but matched files are NOT
    * rewritten — each gets a deletion vector (the union of its existing
    * mask and the fresh matches, since a descriptor REPLACES its
    * predecessor) and re-attaches via remove + re-add of the same data
    * file in one atomic commit. Write cost is O(bitmap bytes), not
    * O(matched files' bytes); stats carry forward (they describe the
    * physical file — a superset of the visible rows, so pruning may
    * over-keep but never over-skips). Rows whose predicate is NULL are
    * KEPT. Upgrades a legacy protocol to table features with
    * `deletionVectors` in the same commit. Returns the committed
    * version, or the current one when nothing (newly) matched.
    */
  def deleteDv(spark: SparkSession, path: String,
               predicate: String): Long =
    deleteDvImpl(spark, path, predicate, None)

  /** EXACTLY-ONCE streaming DV delete — [[deleteDv]] carrying the
    * protocol's `txn` watermark: a replayed micro-batch id ≤ the
    * table's per-app watermark is a detected no-op EVEN when the
    * predicate would newly match (replay semantics are batch-identity,
    * not predicate idempotence — rows inserted after the original run
    * must not be deleted by a restart's replay). A batch that matches
    * NOTHING still publishes its watermark in an empty commit, so
    * replay detection never regresses (the [[appendBatch]] /
    * upsertLogBatch contract on the delete side).
    */
  def deleteDvBatch(spark: SparkSession, path: String,
                    predicate: String, appId: String,
                    batchId: Long): Long = {
    require(appId.nonEmpty, "deleteDvBatch: appId must be non-empty")
    deleteDvImpl(spark, path, predicate, Some((appId, batchId)))
  }

  private def deleteDvImpl(spark: SparkSession, path: String,
                           predicate: String,
                           txn: Option[(String, Long)]): Long = {
    import spark.implicits._
    def txnLines: Seq[String] = txn.toSeq.map { case (a, b) =>
      s"""{"txn":{"appId":${om.writeValueAsString(a)},"version":$b}}"""
    }
    var attempts = 0
    while (true) {
      require(attempts < 10,
        s"$path: lost the DV-delete commit race 10 times")
      val cur = DeltaRead.latestVersion(spark, path)
      val (st, live) = DeltaRead.checkpointState(spark, path, cur)
      txn.foreach { case (a, b) =>
        if (st.txns.get(a).exists(_ >= b)) return cur // replayed batch
      }
      requireRewritable(st, live)
      val schema = DeltaRead.schemaOf(st)
      val pred = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(predicate)
      // a no-match batch with a txn STILL publishes its watermark in
      // an empty commit — a later replay against a changed table must
      // stay a detected no-op, not re-evaluate the predicate
      def watermarkOnly(): Long = txn match {
        case None => cur
        case Some(_) =>
          if (publish(spark, path, cur + 1, txnLines)) {
            maybeCheckpoint(spark, path, cur + 1)
            cur + 1
          } else -1L // lost the race: caller loop replans
      }
      val candidates = live.filter(a =>
        FileStats.mayMatch(pred, DeltaRead.entryStats(st, schema, a)))
      if (candidates.isEmpty) {
        val v = watermarkOnly(); if (v >= 0) return v
        attempts += 1
      } else {
      requireUniqueBasenames(candidates, "deleteDv")
      val scanned = DeltaRead.scan(spark, path, st, schema, candidates,
        withMeta = true)
      val existing = existingDvDf(spark, path, candidates)
      // fresh deletes: rows matching NOW and not already masked — a
      // file whose matches are all historical must not churn the log
      val fresh = scanned.filter(expr(predicate))
        .select(col(DeltaRead.FKey), col(DeltaRead.RIdx))
        .join(existing, Seq(DeltaRead.FKey, DeltaRead.RIdx), "left_anti")
      val freshKeys = fresh.select(DeltaRead.FKey).distinct()
        .as[String].collect().toSet
      if (freshKeys.isEmpty) {
        val v = watermarkOnly(); if (v >= 0) return v
        attempts += 1
      } else {
      val affected = candidates.filter(a => freshKeys.contains(baseOf(a)))
      // replacement mask per affected file = existing ∪ fresh,
      // unioned/serialized on executors, collected compressed
      val blobs = dvBlobsOf(spark, fresh.unionByName(
        existing.filter(
          col(DeltaRead.FKey).isin(freshKeys.toSeq: _*))))
      val (dvOf, dvPath) = writeDvFile(spark, path, blobs)
      // CDF: the freshly-deleted rows (DV-applied view) as row-level
      // 'delete' change data in the same commit
      val cdc =
        if (!cdfEnabled(st)) Nil
        else {
          val deleted = DeltaRead.assemble(spark, path, st, affected)
            .filter(coalesce(expr(predicate), lit(false)))
            .withColumn("_change_type", lit("delete"))
          val (physD, pp, _) = physicalize(deleted, st, schema,
            st.partitionCols, extra = Seq("_change_type"))
          cdcActionsFor(physD, path, pp)
        }
      val actions = txnLines ++ dvProtocolUpgrade(st) ++ dvEnableProperty(st) ++ cdc ++
        affected.map(removeAction(_)) ++
        affected.map(a => readdAction(
          loosenedStats(a).copy(dv = Some(dvOf(baseOf(a))))))
      if (publish(spark, path, cur + 1, actions)) {
        maybeCheckpoint(spark, path, cur + 1)
        return cur + 1
      }
      // lost the race: this attempt's DV file is unreferenced — remove
      // it and replan against the new head
      fs(spark, path).delete(dvPath, false)
      attempts += 1
      } }
    }
    -1L // unreachable
  }

  /** DELETE BY KEYS, merge-on-read — the right-to-be-forgotten shape:
    * mask every row whose `keyCols` tuple appears in the `keys` frame.
    * Positions come from a distributed SEMI-JOIN (never a rendered
    * predicate string), so the key set can be millions of rows — a
    * forget queue draining into a 100 TB table at O(bitmap bytes) per
    * batch. Single-key deletes stats-prune candidates by the key range
    * exactly like [[upsert]]; rows already masked never churn the log.
    * Returns the committed version, or the current one when nothing
    * newly matched.
    */
  def deleteDvKeys(keys: DataFrame, path: String,
                   keyCols: Seq[String]): Long =
    deleteDvKeysImpl(keys, path, keyCols, None)

  /** EXACTLY-ONCE [[deleteDvKeys]] — the protocol's `txn` watermark
    * with [[deleteDvBatch]]'s replay semantics: a replayed micro-batch
    * is a detected no-op even when its keys would newly match, and a
    * no-match batch still publishes its watermark. The foreachBatch
    * body of a streaming forget pipeline
    * ([[graft.streaming.StreamOps.deltaForgetStream]]).
    */
  def deleteDvKeysBatch(keys: DataFrame, path: String,
                        keyCols: Seq[String], appId: String,
                        batchId: Long): Long = {
    require(appId.nonEmpty, "deleteDvKeysBatch: appId must be non-empty")
    deleteDvKeysImpl(keys, path, keyCols, Some((appId, batchId)))
  }

  private def deleteDvKeysImpl(keys: DataFrame, path: String,
                               keyCols: Seq[String],
                               txn: Option[(String, Long)]): Long = {
    val spark = keys.sparkSession
    import spark.implicits._
    require(keyCols.nonEmpty, "deleteDvKeys needs at least one key column")
    keyCols.foreach(k => require(keys.columns.contains(k),
      s"key column $k not in ${keys.columns.mkString(",")}"))
    val keyFrame = keys.select(keyCols.map(col): _*).dropDuplicates()
    def txnLines: Seq[String] = txn.toSeq.map { case (a, b) =>
      s"""{"txn":{"appId":${om.writeValueAsString(a)},"version":$b}}"""
    }
    var attempts = 0
    while (true) {
      require(attempts < 10,
        s"$path: lost the DV key-delete commit race 10 times")
      val cur = DeltaRead.latestVersion(spark, path)
      val (st, live) = DeltaRead.checkpointState(spark, path, cur)
      txn.foreach { case (a, b) =>
        if (st.txns.get(a).exists(_ >= b)) return cur // replayed batch
      }
      requireRewritable(st, live)
      val schema = DeltaRead.schemaOf(st)
      keyCols.foreach(k => require(schema.fieldNames.contains(k),
        s"key column $k not in the table schema"))
      def watermarkOnly(): Long = txn match {
        case None => cur
        case Some(_) =>
          if (publish(spark, path, cur + 1, txnLines)) {
            maybeCheckpoint(spark, path, cur + 1)
            cur + 1
          } else -1L
      }
      // single-key stats pruning by the key range (the upsert plan)
      val candidates =
        if (keyCols.size == 1) {
          val k = keyCols.head
          val mm = keyFrame.agg(min(col(k)).cast("string"),
            max(col(k)).cast("string")).head()
          if (mm.isNullAt(0)) Seq.empty
          else {
            val p = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
              .parseExpression(
                s"$k >= ${sqlLit(mm.getString(0), schema(k).dataType)} AND " +
                  s"$k <= ${sqlLit(mm.getString(1), schema(k).dataType)}")
            live.filter(a =>
              FileStats.mayMatch(p, DeltaRead.entryStats(st, schema, a)))
          }
        } else live
      if (candidates.isEmpty) {
        val v = watermarkOnly(); if (v >= 0) return v
        attempts += 1
      } else {
        requireUniqueBasenames(candidates, "deleteDvKeys")
        val existing = existingDvDf(spark, path, candidates)
        val fresh = DeltaRead.scan(spark, path, st, schema, candidates,
            withMeta = true)
          .join(keyFrame, keyCols, "left_semi")
          .select(col(DeltaRead.FKey), col(DeltaRead.RIdx))
          .join(existing, Seq(DeltaRead.FKey, DeltaRead.RIdx), "left_anti")
        val freshKeys = fresh.select(DeltaRead.FKey).distinct()
          .as[String].collect().toSet
        if (freshKeys.isEmpty) {
          val v = watermarkOnly(); if (v >= 0) return v
          attempts += 1
        } else {
          val affected =
            candidates.filter(a => freshKeys.contains(baseOf(a)))
          val blobs = dvBlobsOf(spark, fresh.unionByName(
            existing.filter(
              col(DeltaRead.FKey).isin(freshKeys.toSeq: _*))))
          val (dvOf, dvPath) = writeDvFile(spark, path, blobs)
          val cdc =
            if (!cdfEnabled(st)) Nil
            else {
              val deleted = DeltaRead.assemble(spark, path, st, affected)
                .join(keyFrame, keyCols, "left_semi")
                .withColumn("_change_type", lit("delete"))
              val (physD, pp, _) = physicalize(deleted, st, schema,
                st.partitionCols, extra = Seq("_change_type"))
              cdcActionsFor(physD, path, pp)
            }
          val actions = txnLines ++ dvProtocolUpgrade(st) ++ dvEnableProperty(st) ++ cdc ++
            affected.map(removeAction(_)) ++
            affected.map(a => readdAction(
              loosenedStats(a).copy(dv = Some(dvOf(baseOf(a))))))
          if (publish(spark, path, cur + 1, actions)) {
            maybeCheckpoint(spark, path, cur + 1)
            return cur + 1
          }
          fs(spark, path).delete(dvPath, false)
          attempts += 1
        }
      }
    }
    -1L // unreachable
  }

  /** UPSERT (MERGE), MERGE-ON-READ: matched table rows are masked with
    * deletion vectors on their files (no data-file rewrite) and the
    * FULL source lands as a fresh segment — one atomic commit, write
    * cost O(source + bitmap bytes). Same contract as [[upsert]]: source
    * carries the table schema exactly, at most one row per key. Returns
    * the committed version.
    */
  def upsertDv(source: DataFrame, path: String,
               keys: Seq[String]): Long = {
    val spark = source.sparkSession
    import spark.implicits._
    require(keys.nonEmpty, "upsertDv needs at least one key column")
    val dupes = source.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dupes.isEmpty,
      s"upsertDv source has multiple rows for key ${dupes.headOption}" +
        " — MERGE requires at most one source row per key")
    var attempts = 0
    while (true) {
      require(attempts < 10,
        s"$path: lost the DV-upsert commit race 10 times")
      val cur = DeltaRead.latestVersion(spark, path)
      val (st, live) = DeltaRead.checkpointState(spark, path, cur)
      requireRewritable(st, live)
      val schema = DeltaRead.schemaOf(st)
      require(canonical(source.schema) == canonical(
          StructType(schema.fields.map(f =>
            StructField(f.name, f.dataType, f.nullable)))),
        s"upsertDv source schema ${source.schema.toDDL} != table " +
          s"schema ${schema.toDDL}")
      keys.foreach(k => require(schema.fieldNames.contains(k),
        s"key column $k not in the table schema"))
      val candidates =
        if (keys.size == 1) {
          val k = keys.head
          val mm = source.agg(min(col(k)).cast("string"),
            max(col(k)).cast("string")).head()
          if (mm.isNullAt(0)) Seq.empty
          else {
            val p = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
              .parseExpression(
                s"$k >= ${sqlLit(mm.getString(0), schema(k).dataType)} AND " +
                  s"$k <= ${sqlLit(mm.getString(1), schema(k).dataType)}")
            live.filter(a =>
              FileStats.mayMatch(p, DeltaRead.entryStats(st, schema, a)))
          }
        } else live
      val keyFrame = source.select(keys.map(col): _*)
      if (candidates.nonEmpty)
        requireUniqueBasenames(candidates, "upsertDv")
      val existing = existingDvDf(spark, path, candidates)
      // fresh masks: visible rows sharing a source key
      val fresh =
        if (candidates.isEmpty)
          spark.emptyDataset[(String, Long)]
            .toDF(DeltaRead.FKey, DeltaRead.RIdx)
        else DeltaRead.scan(spark, path, st, schema, candidates,
            withMeta = true)
          .join(keyFrame, keys, "left_semi")
          .select(col(DeltaRead.FKey), col(DeltaRead.RIdx))
          .join(existing, Seq(DeltaRead.FKey, DeltaRead.RIdx), "left_anti")
      val freshKeys = fresh.select(DeltaRead.FKey).distinct()
        .as[String].collect().toSet
      val affected = candidates.filter(a => freshKeys.contains(baseOf(a)))
      val dvWritten =
        if (affected.isEmpty) None
        else Some(writeDvFile(spark, path, dvBlobsOf(spark,
          fresh.unionByName(existing.filter(
            col(DeltaRead.FKey).isin(freshKeys.toSeq: _*))))))
      val ordered = schema.fieldNames.toSeq.map(col)
      val (physSeg, physParts, keyOf) =
        physicalize(source.select(ordered: _*), st, schema,
          st.partitionCols)
      val files = writeSegment(physSeg, path, physParts)
      // CDF mirrors [[upsert]]: matched rows emit preimage (DV-applied
      // old) + postimage, unmatched source rows emit insert; a
      // pure-insert merge emits no cdc
      val cdc =
        if (!cdfEnabled(st) || affected.isEmpty) Nil
        else {
          val pre = DeltaRead.assemble(spark, path, st, affected)
            .join(keyFrame, keys, "left_semi")
          val preKeys = pre.select(keys.map(col): _*).distinct()
          val post = source.join(preKeys, keys, "left_semi")
          val ins = source.join(preKeys, keys, "left_anti")
          val cdcRows = pre.select(ordered: _*)
              .withColumn("_change_type", lit("update_preimage"))
            .unionByName(post.select(ordered: _*)
              .withColumn("_change_type", lit("update_postimage")))
            .unionByName(ins.select(ordered: _*)
              .withColumn("_change_type", lit("insert")))
          val (physCdc, pp, _) = physicalize(cdcRows, st, schema,
            st.partitionCols, extra = Seq("_change_type"))
          cdcActionsFor(physCdc, path, pp)
        }
      val dvActions = dvWritten.fold(Seq.empty[String]) { case (dvOf, _) =>
        affected.map(removeAction(_)) ++
          affected.map(a => readdAction(
            loosenedStats(a).copy(dv = Some(dvOf(baseOf(a))))))
      }
      val actions =
        (if (affected.isEmpty) Nil
         else dvProtocolUpgrade(st) ++ dvEnableProperty(st)) ++
        cdc ++ dvActions ++
        actionsFor(schema, files, withMeta = false, physParts,
          statKey = keyOf)
      if (publish(spark, path, cur + 1, actions)) {
        maybeCheckpoint(spark, path, cur + 1)
        return cur + 1
      }
      dvWritten.foreach { case (_, p) => fs(spark, path).delete(p, false) }
      attempts += 1
    }
    -1L // unreachable
  }

  // --------------------------------------------------------------------
  // table maintenance: OPTIMIZE (bin-packing compaction) + VACUUM —
  // without them every COW delete/upsert and small append accretes
  // files forever (SnapshotTable has had both since round 4; this
  // brings the open format to parity)
  // --------------------------------------------------------------------

  /** Per-group (lo, hi) of one z-order dimension, folded from the
    * files' LOGGED zone maps — zero extra jobs, no rescan. Every file
    * must carry a numeric stat for the column (a DV'd file's stats
    * describe the pre-delete superset — a looser range, still a sound
    * scaling domain).
    */
  private def zRange(st: DeltaRead.LogState, schema: StructType,
                     g: Seq[DeltaRead.AddEntry], c: String)
      : (Double, Double) = {
    val ranges = g.map { a =>
      val cs = DeltaRead.entryStats(st, schema, a).get(c)
      require(cs.exists(s => (s.kind == "l" || s.kind == "d") &&
          s.lo.nonEmpty && s.hi.nonEmpty),
        s"zorderBy $c: file ${a.path} carries no numeric zone map — " +
          "the z-coordinate scaling folds logged stats (no rescan), " +
          "refusing")
      (cs.get.lo.get.toDouble, cs.get.hi.get.toDouble)
    }
    (ranges.map(_._1).min, ranges.map(_._2).max)
  }

  /** Characters shared by every value of a string z-dimension within
    * the group, folded from the files' LOGGED string zone maps: the
    * 2-byte coordinate window starts AFTER this common prefix, so
    * "user_00".."user_15" scale on "00".."15" instead of collapsing
    * onto the shared "us". Truncated or missing string stats only
    * shorten the detected prefix — a mis-scaled coordinate degrades
    * CLUSTERING, never pruning correctness (files always carry their
    * real min/max).
    */
  /** Value of the two UTF-8 bytes of `s` after dropping `skip` chars
    * (zero-padded) — the order-preserving 16-bit window a string
    * z-coordinate scales in.
    */
  private def zPairVal(s: String, skip: Int): Int = {
    val b = s.drop(skip).getBytes("UTF-8")
    val b0 = if (b.length > 0) b(0) & 0xff else 0
    val b1 = if (b.length > 1) b(1) & 0xff else 0
    (b0 << 8) | b1
  }

  /** String z-dimension scaling, folded from the group's LOGGED string
    * zone maps: (chars of common prefix to skip, lo, hi) where lo/hi
    * are the [[zPairVal]] bounds of the group. Skipping the shared
    * prefix keeps "user_00".."user_15" from collapsing onto "us", and
    * range-scaling the window keeps the string dimension competitive
    * with the full-range numerics in the bit interleave. Truncated or
    * missing stats only mis-scale — clustering degrades, pruning
    * correctness never does (files always carry their real min/max).
    */
  private def zStringScale(st: DeltaRead.LogState, schema: StructType,
                           g: Seq[DeltaRead.AddEntry], c: String)
      : (Int, Int, Int) = {
    val stats = g.flatMap(a => DeltaRead.entryStats(st, schema, a).get(c))
    def cmpBytes(a: String, b: String): Int = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      var i = 0
      while (i < x.length && i < y.length) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
    val los = stats.flatMap(_.lo)
    val his = stats.flatMap(_.hi)
    if (los.isEmpty || his.isEmpty) (0, 0, 0)
    else {
      val lo = los.reduce((a, b) => if (cmpBytes(a, b) <= 0) a else b)
      val hi = his.reduce((a, b) => if (cmpBytes(a, b) >= 0) a else b)
      val skip = lo.zip(hi).takeWhile { case (a, b) => a == b }.length
      (skip, zPairVal(lo, skip), zPairVal(hi, skip))
    }
  }

  /** OPTIMIZE: bin-packing compaction. Within each partition tuple,
    * files smaller than `targetBytes` (and any file carrying a deletion
    * vector — compacting FOLDS the DV, the rewrite reads DV-applied
    * rows) are rewritten into ~targetBytes bins. The commit is pure
    * reorganization: adds AND removes carry `dataChange=false`, so
    * change-feed and streaming consumers never re-serve the rows. One
    * atomic commit; a lost race replans. Returns the committed version,
    * or the current version when nothing qualified.
    *
    * `zorderBy` (two OR MORE numeric/string columns) switches to the
    * LAYOUT rewrite: EVERY group rewrites with rows range-partitioned
    * and sorted on the Morton interleave of the dimensions — numerics
    * scaled to the curve's per-dimension bit budget
    * ([[graft.functions.Layout.bitsPerDim]]: 16 bits up to 4 dims,
    * 63/n beyond) against the group's stats-folded min/max, strings by
    * their order-preserving 2-byte UTF-8 prefix — via
    * [[graft.functions.ZOrder2]] at arity 2 (the codegen'd expression
    * q87 oracle-pins; [[graft.functions.ZOrderN]] equals it bit for
    * bit there) and ZOrderN beyond, so every new file carries NARROW
    * min/max on EVERY participating column and a range predicate on
    * ANY of them prunes to ~1-of-N opens — the Delta OPTIMIZE ZORDER
    * BY surface, mirroring Hudi `cluster(sortBy)`.
    */
  def optimize(spark: SparkSession, path: String,
               targetBytes: Long = 128L * 1024 * 1024,
               zorderBy: Seq[String] = Nil): Long = {
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the optimize race 10 times")
      val cur = DeltaRead.latestVersion(spark, path)
      val (st, live) = DeltaRead.checkpointState(spark, path, cur)
      requireRewritable(st, live)
      val schema = DeltaRead.schemaOf(st)
      if (zorderBy.nonEmpty) {
        require(zorderBy.size >= 2,
          s"zorderBy interleaves at least two dimensions (got " +
            s"${zorderBy.size}) — a single column is a plain sort, " +
            "use Hudi-style cluster semantics instead")
        zorderBy.foreach { c =>
          require(schema.fieldNames.contains(c),
            s"zorderBy column $c not in the table schema")
          require(schema(c).dataType match {
            case ByteType | ShortType | IntegerType | LongType |
                 FloatType | DoubleType | StringType => true
            case _ => false
          }, s"zorderBy $c: z-coordinates scale NUMERIC and STRING " +
            "dimensions only (dates/decimals would need a rank pass) " +
            "— refusing")
        }
      }
      // a group is worth compacting when it can shrink the file count
      // (≥2 small files) or fold a DV (rewriting one DV'd file drops
      // the mask and the dead rows); the zorder layout rewrite takes
      // EVERY group — even a lone large file splits into z-range bins
      // that prune
      val groups =
        if (zorderBy.nonEmpty)
          live.groupBy(_.partitionValues).values.map(_.toSeq).toSeq
        else live.groupBy(_.partitionValues).values.map(_.filter(a =>
            a.size < targetBytes || a.dv.exists(_.cardinality > 0L)))
          .filter(g => g.size >= 2 ||
            g.exists(_.dv.exists(_.cardinality > 0L)))
          .toSeq
      if (groups.isEmpty) return cur
      // BOUNDED-WIDTH unioned plans, ONE atomic commit: each branch
      // holds a single partition tuple repartitioned to its own bin
      // count, so groups compact in wide passes instead of one
      // sequential job each — but the union width is capped (default
      // 128 branches; `graft.delta.optimize.maxBranches`): Catalyst
      // analysis cost grows superlinearly in plan size, so a
      // 10k-partition table runs ~80 bounded jobs rather than one
      // 10k-branch plan (measured at 1k groups in ScaleStress's
      // `optimize branch ceiling` row). All batches' files land before
      // the single publish, so atomicity is untouched. DV-applied
      // assembly: compaction must never resurrect rows.
      val maxBranches = spark.conf.getOption(
        "graft.delta.optimize.maxBranches").map(_.toInt).getOrElse(128)
      require(maxBranches >= 1,
        s"graft.delta.optimize.maxBranches must be >= 1: $maxBranches")
      var statKey: Map[String, String] = Map.empty
      var physParts: Seq[String] = st.partitionCols
      val written = groups.grouped(maxBranches).toSeq.flatMap { batch =>
        val segment = batch.map { g =>
          val bins = math.max(1L,
            (g.map(_.size).sum + targetBytes - 1) / targetBytes).toInt
          val assembled = DeltaRead.assemble(spark, path, st, g)
          if (zorderBy.isEmpty) assembled.repartition(bins)
          else {
            // scale each NUMERIC dimension to the curve's bit budget
            // against the group's stats-folded range; STRING dimensions
            // take the 2 UTF-8 bytes AFTER the group's stats-folded
            // common prefix (order-preserving — Spark string comparison
            // is binary UTF-8 — and group-relative, so shared prefixes
            // don't collapse the dimension; truncated stats only
            // shorten the prefix, degrading clustering, never pruning).
            // Interleave, range-partition so bins hold disjoint
            // z-ranges, sort within so row groups are tight too.
            val bits =
              graft.functions.Layout.bitsPerDim(zorderBy.size)
            val maxCoord = (1 << bits) - 1
            val coords = zorderBy.map { c =>
              schema(c).dataType match {
                case StringType =>
                  val (skip, lov, hiv) = zStringScale(st, schema, g, c)
                  val raw = s"CAST(conv(hex(rpad(coalesce(encode(" +
                    s"substring(`$c`, ${skip + 1}, 2), 'UTF-8'), X'')," +
                    s" 2, X'00')), 16, 10) AS INT)"
                  if (hiv <= lov) lit(0)
                  else least(lit(maxCoord), greatest(lit(0),
                    ((expr(raw).cast("double") - lit(lov.toDouble)) /
                      lit((hiv - lov).toDouble) * maxCoord).cast("int")))
                case _ =>
                  val (lo, hi) = zRange(st, schema, g, c)
                  if (hi <= lo) lit(0)
                  else least(lit(maxCoord), greatest(lit(0),
                    ((col(c).cast("double") - lit(lo)) /
                      lit(hi - lo) * maxCoord).cast("int")))
              }
            }
            val zc = "__graft_zkey"
            val zkey =
              if (zorderBy.size == 2)
                graft.functions.zorder2(coords(0), coords(1))
              else graft.functions.zorder_n(coords: _*)
            // single-bin groups (the common shape when optimizing a
            // many-partition table of small groups) skip
            // repartitionByRange: its range sampling costs one extra
            // job PER GROUP and a 1-bin range partition is just "all
            // rows, sorted" — measured 2.7× group-count overhead in
            // audits/r13_measurements.md before this fast path
            val keyed = assembled.withColumn(zc, zkey)
            (if (bins == 1)
               keyed.repartition(1).sortWithinPartitions(col(zc))
             else
               keyed.repartitionByRange(bins, col(zc))
                 .sortWithinPartitions(col(zc)))
              .drop(zc)
          }
        }.reduce(_ unionByName _)
        // physicalize is schema-determined — identical across batches
        val (physRows, pp, sk) =
          physicalize(segment, st, schema, st.partitionCols)
        statKey = sk; physParts = pp
        writeSegment(physRows, path, pp)
      }
      val actions = groups.flatten.map(removeAction(_, dataChange = false)) ++
        actionsFor(schema, written, withMeta = false, physParts,
          dataChange = false, statKey = statKey)
      if (publish(spark, path, cur + 1, actions)) {
        maybeCheckpoint(spark, path, cur + 1)
        return cur + 1
      }
      attempts += 1
    }
    -1L // unreachable
  }

  /** VACUUM: delete data/DV files no reader can reach. A file is
    * deletable when it is NOT referenced by the CURRENT version and
    * either (a) its remove tombstone is older than the retention window
    * (readers of snapshots that referenced it are past retention — the
    * protocol's documented time-travel horizon), or (b) it has no
    * tombstone at all (an orphan from a crashed writer, invisible to
    * every reader) and its mtime is older than the window. Refuses on
    * unmodeled log state. Returns the number of files deleted; the log
    * itself is never touched.
    */
  def vacuum(spark: SparkSession, path: String,
             retainMillis: Long = -1L): Int = {
    val cur = DeltaRead.latestVersion(spark, path)
    val (st, live) = DeltaRead.checkpointState(spark, path, cur)
    require(st.unmodeledState.isEmpty,
      s"$path: log carries unmodeled state ${st.unmodeledState} — " +
        "vacuum cannot prove reachability, refusing")
    val retain = if (retainMillis >= 0) retainMillis
                 else retentionMillis(st.conf)
    val cutoff = System.currentTimeMillis() - retain
    val f = fs(spark, path)
    // referenced: every live data file + every live on-disk DV file
    def norm(rel: String): String = PathCodec.percentDecode(rel)
    val refData = live.map(a => norm(a.path)).toSet
    val rootQ = f.makeQualified(new Path(path)).toString
    def dvFileRel(d: DeltaRead.Dv): Option[String] = d.storageType match {
      case "u" =>
        val enc = d.pathOrInlineDv.takeRight(20)
        val prefix = d.pathOrInlineDv.dropRight(20)
        val b = PathCodec.z85Decode(enc)
        val bb = java.nio.ByteBuffer.wrap(b)
        val uuid = new java.util.UUID(bb.getLong, bb.getLong)
        Some((if (prefix.nonEmpty) s"$prefix/" else "") +
          s"deletion_vector_$uuid.bin")
      case "p" =>
        // absolute-path DV: when it lives INSIDE the table dir the
        // walk below would otherwise sweep it as an orphan and break
        // CURRENT reads; outside the table dir the walk never sees it
        val qp = f.makeQualified(new Path(d.pathOrInlineDv)).toString
        if (qp.startsWith(rootQ + "/"))
          Some(qp.stripPrefix(rootQ + "/"))
        else None
      case _ => None // 'i' inline — no on-disk file
    }
    val refDv = live.flatMap(_.dv).flatMap(dvFileRel).toSet
    // tombstone timestamps: JSON tail + checkpoint carry-over
    val ckptRmRows = st.ckptRemoves.map(_.collect().toSeq).getOrElse(Nil)
    val tombTs: Map[String, Long] =
      ckptRmRows.map(r => norm(r.getString(0)) -> r.getLong(1)).toMap ++
      st.tailRemoves.map { case (p, ts) => norm(p) -> ts }
    // superseded-DV tombstones: .bin file → the deletionTimestamp of
    // the remove that retired that descriptor ((path, dvUniqueId)
    // reconciliation keeps these alive across the same-commit re-add)
    val dvTombTs: Map[String, Long] =
      (ckptRmRows.filterNot(_.isNullAt(2)).map { r =>
        val d = r.getStruct(2)
        DeltaRead.DvTomb(r.getString(0), r.getLong(1),
          DeltaRead.Dv(d.getString(0), d.getString(1), d.getInt(2),
            d.getInt(3), d.getLong(4)))
      } ++ st.tailDvTombs.values.toSeq)
        .flatMap(t => dvFileRel(t.dv).map(_ -> t.deletionTimestamp))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    val root = f.makeQualified(new Path(path)).toString
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      f.listStatus(p).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith(".") || n.startsWith("_")) Seq.empty // log/stage
        else if (s.isDirectory) walk(s.getPath)
        else if (n.endsWith(".parquet") || n.endsWith(".bin")) Seq(s)
        else Seq.empty
      }
    // A .bin with its OWN DV tombstone (the remove that superseded it,
    // (path, dvUniqueId)-keyed so the same-commit re-add cannot cancel
    // it) gates on THAT timestamp — precise retention per mask. .bins
    // without one (legacy logs, third-party writers that drop the
    // descriptor from removes, OPTIMIZE folds) fall back to the coarse
    // floor: the NEWEST tombstone anywhere in the log must be past the
    // horizon before any undated .bin goes. Coarse but sound; true
    // orphans still reclaim once the table quiesces.
    val newestTomb = (tombTs.values ++ dvTombTs.values)
      .foldLeft(Long.MinValue)(math.max)
    var deleted = 0
    walk(new Path(path)).foreach { s =>
      val rel = f.makeQualified(s.getPath).toString
        .stripPrefix(root).stripPrefix("/")
      val isRef = refData.contains(rel) || refDv.contains(rel)
      val deletable = !isRef && (
        if (rel.endsWith(".bin"))
          dvTombTs.get(rel).orElse(tombTs.get(rel)) match {
            case Some(ts) => ts < cutoff
            case None =>
              s.getModificationTime < cutoff && newestTomb < cutoff
          }
        else tombTs.get(rel) match {
          case Some(ts) => ts < cutoff
          case None => s.getModificationTime < cutoff // orphan
        })
      if (deletable && f.delete(s.getPath, false)) deleted += 1
    }
    deleted
  }

  /** RESTORE the table to a prior version as a NEW commit (the Delta
    * RESTORE command): files live at `toVersion` but not now are
    * RE-ADDED with their original partitionValues/stats/size/DV (the
    * bytes are still on disk; a vacuum-eaten file refuses loudly —
    * restoring a dangling path would serve a missing file), files live
    * now but not then get remove tombstones, and the metaData of
    * `toVersion` is re-emitted when schema/partitioning/configuration
    * drifted (the table id carries forward — readers key caches and
    * streams on it). History is PRESERVED: time travel to pre-restore
    * versions still works, and the restore itself is one more commit.
    * dataChange=true, so a change-feed reader sees the restore as
    * row-level deletes + inserts via the add/remove derivation —
    * Delta's own RESTORE emits no `_change_data` either. File identity
    * is (path, DV descriptor): a file whose DV changed between the
    * versions restores to the OLD mask. Returns the committed version,
    * or the current version when the states already match (no-op).
    */
  def restore(spark: SparkSession, path: String, toVersion: Long): Long = {
    var attempts = 0
    while (true) {
      require(attempts < 10, s"$path: lost the restore race 10 times")
      val cur = DeltaRead.latestVersion(spark, path)
      require(toVersion >= 0 && toVersion <= cur,
        s"$path: cannot restore to version $toVersion (latest is $cur)")
      if (toVersion == cur) return cur
      val (stTo, liveTo) = DeltaRead.checkpointState(spark, path, toVersion)
      val (stCur, liveCur) = DeltaRead.checkpointState(spark, path, cur)
      require(stCur.unmodeledState.isEmpty,
        s"$path: log carries unmodeled state ${stCur.unmodeledState} — " +
          "restore would re-emit adds without it, refusing")
      def key(a: DeltaRead.AddEntry) = (a.path, a.dv)
      val curKeys = liveCur.map(key).toSet
      val toKeys = liveTo.map(key).toSet
      val adds = liveTo.filterNot(a => curKeys(key(a)))
      val removes = liveCur.filterNot(a => toKeys(key(a)))
      val metaChanged = stTo.schemaJson != stCur.schemaJson ||
        stTo.partitionCols != stCur.partitionCols ||
        stTo.conf != stCur.conf
      if (adds.isEmpty && removes.isEmpty && !metaChanged) return cur
      val f = fs(spark, path)
      // every re-added file (and its on-disk DV) must still exist
      adds.foreach { a =>
        val rel = PathCodec.percentDecode(a.path)
        require(f.exists(new Path(path, rel)),
          s"$path: restore to version $toVersion needs $rel which is " +
            "no longer on disk (vacuumed past retention?) — refusing")
        a.dv.foreach { d =>
          val onDisk = d.storageType match {
            case "u" =>
              val enc = d.pathOrInlineDv.takeRight(20)
              val prefix = d.pathOrInlineDv.dropRight(20)
              val b = PathCodec.z85Decode(enc)
              val bb = java.nio.ByteBuffer.wrap(b)
              val uuid = new java.util.UUID(bb.getLong, bb.getLong)
              Some(new Path(path, (if (prefix.nonEmpty) s"$prefix/"
                else "") + s"deletion_vector_$uuid.bin"))
            case "p" => Some(new Path(d.pathOrInlineDv))
            case _   => None // 'i' inline rides the log itself
          }
          onDisk.foreach(p => require(f.exists(p),
            s"$path: restore to version $toVersion needs DV $p which " +
              "is no longer on disk (vacuumed past retention?) — " +
              "refusing"))
        }
      }
      val metaAct =
        if (!metaChanged) Seq.empty
        else {
          val partJson = om.writeValueAsString(
            om.valueToTree[com.fasterxml.jackson.databind.JsonNode](
              stTo.partitionCols.toArray))
          val confNode = om.createObjectNode()
          stTo.conf.toSeq.sortBy(_._1)
            .foreach { case (k, v) => confNode.put(k, v) }
          Seq(s"""{"metaData":{"id":"${stCur.metaId}",""" +
            s""""format":{"provider":"parquet","options":{}},""" +
            s""""schemaString":${om.writeValueAsString(stTo.schemaJson)},""" +
            s""""partitionColumns":$partJson,""" +
            s""""configuration":${om.writeValueAsString(confNode)},""" +
            s""""createdTime":${stTo.createdTime}}}""")
        }
      val actions = metaAct ++
        removes.map(removeAction(_, dataChange = true)) ++
        adds.map(readdAction)
      if (publish(spark, path, cur + 1, actions)) {
        maybeCheckpoint(spark, path, cur + 1)
        return cur + 1
      }
      attempts += 1
    }
    -1L // unreachable
  }

  /** Re-emit a live AddEntry verbatim (restore: the file already
    * exists — path still percent-encoded, original partitionValues /
    * stats / size / mtime / DV descriptor preserved).
    */
  private def readdAction(a: DeltaRead.AddEntry): String = {
    val pv = om.createObjectNode()
    a.partitionValues.toSeq.sortBy(_._1)
      .foreach { case (k, v) =>
        if (v == null) pv.putNull(k) else pv.put(k, v) }
    s"""{"add":{"path":"${a.path}",""" +
      s""""partitionValues":${om.writeValueAsString(pv)},""" +
      s""""size":${a.size},"modificationTime":${a.modificationTime},""" +
      s""""dataChange":true""" +
      a.stats.fold("")(j => s""","stats":${om.writeValueAsString(j)}""") +
      a.dv.fold("")(d =>
        s""","deletionVector":{"storageType":"${d.storageType}",""" +
          s""""pathOrInlineDv":"${d.pathOrInlineDv}",""" +
          s""""offset":${d.offset},"sizeInBytes":${d.sizeInBytes},""" +
          s""""cardinality":${d.cardinality}}""") + "}}"
  }

  /** SQL literal rendering for the stats-prune predicate. */
  private def sqlLit(v: String, dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType => v
    case _ => "'" + v.replace("'", "''") + "'"
  }

  // --------------------------------------------------------------------
  // change data feed (delta.enableChangeDataFeed): COW commits that
  // rewrite files also land row-level `_change_data/` parquet so
  // incremental consumers get MINIMAL diffs instead of whole-file
  // delete+insert pairs
  // --------------------------------------------------------------------

  private def cdfEnabled(st: DeltaRead.LogState): Boolean =
    st.conf.get("delta.enableChangeDataFeed").exists(_.trim == "true")

  /** Land `rows` (payload + `_change_type`) as `_change_data/` files and
    * render their cdc actions. Per the protocol, a commit carrying ANY
    * cdc action tells CDF readers to use ONLY the cdc files for that
    * commit — so the caller must include every row-level change,
    * inserts included.
    */
  private def cdcActionsFor(rows: DataFrame, path: String,
                            partitionBy: Seq[String]): Seq[String] = {
    val files = writeSegment(rows, path, partitionBy,
      prefix = "_change_data/")
    files.map { w =>
      val pv = om.createObjectNode()
      partitionValuesOf(w.rel).foreach { case (k, v) => pv.put(k, v) }
      s"""{"cdc":{"path":"${PathCodec.percentEncodePath(w.rel)}",""" +
        s""""partitionValues":${om.writeValueAsString(pv)},""" +
        s""""size":${w.size},"dataChange":false}}"""
    }
  }

  /** Tombstone for a rewritten file. deletionTimestamp is the REAL wall
    * clock: retention windows (VACUUM's deletedFileRetentionDuration)
    * count from it — a zero timestamp would make every tombstone
    * instantly expired and let a third-party VACUUM delete the data file
    * out from under concurrent readers of older snapshots. A removed
    * file's DV descriptor rides the tombstone per the protocol, so
    * third-party vacuum accounting can track the OLD deletion-vector
    * file's reachability too.
    */
  private def removeAction(a: DeltaRead.AddEntry,
                           dataChange: Boolean = true): String =
    s"""{"remove":{"path":"${a.path}",""" +
      s""""deletionTimestamp":${System.currentTimeMillis()},""" +
      s""""dataChange":$dataChange""" +
      a.dv.fold("")(d =>
        s""","deletionVector":{"storageType":"${d.storageType}",""" +
          s""""pathOrInlineDv":"${d.pathOrInlineDv}",""" +
          s""""offset":${d.offset},"sizeInBytes":${d.sizeInBytes},""" +
          s""""cardinality":${d.cardinality}}""") + "}}"

  /** Stats of a DV re-add marked LOOSE per the protocol
    * (`tightBounds: false`): min/max still describe the PHYSICAL file —
    * a superset of the visible rows, sound for pruning — and
    * `numRecords` stays the physical count (protocol readers derive
    * the logical count as numRecords − dv.cardinality). Third-party
    * writers key tightness decisions on this flag, so a DV author must
    * set it.
    */
  private def loosenedStats(a: DeltaRead.AddEntry): DeltaRead.AddEntry =
    a.copy(stats = a.stats.map { j =>
      try {
        val node = om.readTree(j)
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        node.put("tightBounds", false)
        om.writeValueAsString(node)
      } catch { case _: Exception => j } // unparseable: carry verbatim
    })

  /** Re-emitted metaData for a schema-evolution commit. Everything but
    * schemaString carries FORWARD VERBATIM from the current state — the
    * table id (readers key caches/streams on it), the configuration
    * (dropping it would silently wipe delta.appendOnly / CDF /
    * columnMapping properties), and createdTime.
    */
  private def metaAction(schema: StructType, partitionBy: Seq[String],
                         st: DeltaRead.LogState,
                         extraConf: Map[String, String] = Map.empty)
      : String = {
    val partJson = om.writeValueAsString(
      om.valueToTree[com.fasterxml.jackson.databind.JsonNode](
        partitionBy.toArray))
    val confNode = om.createObjectNode()
    (st.conf ++ extraConf).toSeq.sortBy(_._1)
      .foreach { case (k, v) => confNode.put(k, v) }
    val id = if (st.metaId.nonEmpty) st.metaId
             else java.util.UUID.randomUUID().toString
    s"""{"metaData":{"id":"$id",""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${om.writeValueAsString(schema.json)},""" +
      s""""partitionColumns":$partJson,""" +
      s""""configuration":${om.writeValueAsString(confNode)},""" +
      s""""createdTime":${st.createdTime}}}"""
  }

  private def canonical(st: StructType): Seq[(String, DataType)] =
    st.fields.toSeq.map(f => (f.name, f.dataType))

  /** One landed data file: relative path, REAL byte length and mtime
    * from the filesystem (third-party readers trust `size` for split
    * planning — never fabricated), and its footer zone-map stats.
    */
  private final case class Written(rel: String, size: Long, mtime: Long,
                                   stats: Map[String, FileStats.ColStat])

  /** Write `df` as parquet files under the table root with Delta-style
    * unique names — hive partition directories when `partitionBy` is
    * set (Spark's own partitionBy stage splits and hive-encodes; the
    * files are then moved dir-for-dir). `prefix` relocates the segment
    * under a subdirectory (the CDF path uses `_change_data/`).
    */
  private def writeSegment(df: DataFrame, path: String,
                           partitionBy: Seq[String],
                           prefix: String = ""): Seq[Written] = {
    val spark = df.sparkSession
    val stage = new Path(path,
      s".stage-${java.util.UUID.randomUUID().toString}")
    val f = fs(spark, path)
    try {
      if (partitionBy.isEmpty) df.write.parquet(stage.toString)
      else df.write.partitionBy(partitionBy: _*).parquet(stage.toString)
      def walk(p: Path): Seq[Path] = f.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else if (s.getPath.getName.endsWith(".parquet")) Seq(s.getPath)
        else Seq.empty
      }
      val parts = walk(stage).sortBy(_.toString)
      // listStatus returns scheme-qualified paths (file:/...) — qualify
      // the stage prefix the same way before stripping
      val stagePrefix = f.makeQualified(stage).toString
      val dirs = parts.map(p => f.makeQualified(p.getParent).toString
        .stripPrefix(stagePrefix).stripPrefix("/"))
      // validate BEFORE the first rename — a mid-loop refusal would
      // leak already-moved, never-logged orphan files into the table
      dirs.foreach { relDir =>
        require(!relDir.contains("__HIVE_DEFAULT_PARTITION__"),
          s"NULL partition value in ${partitionBy.mkString(",")} — " +
            "refused (the hive default-partition encoding is ambiguous " +
            "across protocol readers)")
      }
      val rels = parts.zip(dirs).map { case (p, relDir0) =>
        val relDir = s"$prefix$relDir0".stripSuffix("/")
        val name = s"part-${java.util.UUID.randomUUID().toString}.parquet"
        val rel = if (relDir.isEmpty) name else s"$relDir/$name"
        if (relDir.nonEmpty) f.mkdirs(new Path(path, relDir))
        require(f.rename(p, new Path(path, rel)), s"rename failed for $p")
        rel
      }
      val stats = FileStats.collect(spark, path, rels)
      rels.map { r =>
        val fst = f.getFileStatus(new Path(path, r))
        Written(r, fst.getLen, fst.getModificationTime,
          stats.getOrElse(r, Map.empty))
      }
    } finally f.delete(stage, true)
  }

  /** Hive-layout partition values of a PHYSICAL relative file path for
    * the `partitionValues` map. Hive's escaping is %XX sequences ONLY
    * ('+' stays literal — java.net.URLDecoder would corrupt it to a
    * space): [[PathCodec.percentDecode]] is exactly that unescape.
    */
  private def partitionValuesOf(rel: String): Seq[(String, String)] =
    rel.split("/").dropRight(1).toSeq
      .filter(_.contains("=")) // non-kv segments: the _change_data prefix
      .map { seg =>
        val Array(k, v) = seg.split("=", 2)
        k -> PathCodec.percentDecode(v)
      }

  /** Render add/metaData/protocol actions as json lines. `dataChange`
    * is false for reorganization commits (OPTIMIZE) whose adds carry no
    * new rows — streaming readers must not re-serve them.
    */
  private def actionsFor(schema: StructType, files: Seq[Written],
                         withMeta: Boolean,
                         partitionBy: Seq[String] = Nil,
                         dataChange: Boolean = true,
                         statKey: Map[String, String] = Map.empty)
      : Seq[String] = {
    val partJson = om.writeValueAsString(
      om.valueToTree[com.fasterxml.jackson.databind.JsonNode](
        partitionBy.toArray))
    val head =
      if (!withMeta) Seq.empty
      else Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"${java.util.UUID.randomUUID()}",""" +
          s""""format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${om.writeValueAsString(schema.json)},""" +
          s""""partitionColumns":$partJson,"configuration":{},""" +
          s""""createdTime":0}}""")
    head ++ files.map { w =>
      val pv = om.createObjectNode()
      partitionValuesOf(w.rel).foreach { case (k, v) => pv.put(k, v) }
      s"""{"add":{"path":"${PathCodec.percentEncodePath(w.rel)}",""" +
        s""""partitionValues":${om.writeValueAsString(pv)},""" +
        s""""size":${w.size},"modificationTime":${w.mtime},""" +
        s""""dataChange":$dataChange""" +
        statsJson(schema, w.stats, statKey).fold("")(j =>
          s""","stats":${om.writeValueAsString(j)}""") + "}}"
    }
  }

  /** Delta per-file stats json from footer zone maps — emitted only for
    * columns whose footer compare-domain equals Delta's json domain.
    * On column-mapped tables the footer (and the protocol's stats json)
    * keys are the PHYSICAL names — `statKey` carries the mapping.
    */
  private def statsJson(schema: StructType,
                        st: Map[String, FileStats.ColStat],
                        statKey: Map[String, String] = Map.empty)
      : Option[String] = {
    val rows = st.values.headOption.map(_.rows).getOrElse(-1L)
    if (rows < 0) return None
    val mins = om.createObjectNode(); val maxs = om.createObjectNode()
    val nulls = om.createObjectNode()
    schema.fields.foreach { f0 =>
      val f = StructField(statKey.getOrElse(f0.name, f0.name), f0.dataType)
      st.get(f.name).foreach { c =>
        val jsonable = (f.dataType, c.kind) match {
          case (ByteType | ShortType | IntegerType | LongType, "l") => true
          case (FloatType | DoubleType, "d")                        => true
          case (StringType, "s")                                    => true
          case _ => false // dates/timestamps/decimals: domains differ
        }
        if (jsonable) {
          if (c.nulls >= 0) nulls.put(f.name, c.nulls)
          (c.lo, c.hi) match {
            case (Some(lo), Some(hi)) =>
              c.kind match {
                case "l" => mins.put(f.name, lo.toLong)
                            maxs.put(f.name, hi.toLong)
                case "d" => mins.put(f.name, lo.toDouble)
                            maxs.put(f.name, hi.toDouble)
                case _   => mins.put(f.name, lo); maxs.put(f.name, hi)
              }
            case _ => // all-null column: null count alone suffices
          }
        }
      }
    }
    val root = om.createObjectNode()
    root.put("numRecords", rows)
    root.set[com.fasterxml.jackson.databind.JsonNode]("minValues", mins)
    root.set[com.fasterxml.jackson.databind.JsonNode]("maxValues", maxs)
    root.set[com.fasterxml.jackson.databind.JsonNode]("nullCount", nulls)
    Some(om.writeValueAsString(root))
  }

  private def commit(df: DataFrame, path: String, version: Long,
                     withMeta: Boolean,
                     partitionBy: Seq[String] = Nil): Long = {
    val files = writeSegment(df, path, partitionBy)
    require(publish(df.sparkSession, path, version,
        actionsFor(df.schema, files, withMeta, partitionBy)),
      s"$path: version $version was committed concurrently")
    version
  }

  // --------------------------------------------------------------------
  // checkpointing — a long-lived table must not accrete an unbounded
  // JSON-only log that every reader replays
  // --------------------------------------------------------------------

  /** Classic checkpoint schema — one nullable struct per action type,
    * the column shapes other protocol readers expect. Remove rows carry
    * the UNEXPIRED tombstones (deletionTimestamp within the table's
    * deletedFileRetentionDuration): the protocol requires them to
    * survive checkpointing so VACUUM and concurrent readers of older
    * snapshots can still reconcile rewritten files.
    */
  private val ckptSchema = StructType(Seq(
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      StructField("deletionVector", StructType(Seq(
        StructField("storageType", StringType),
        StructField("pathOrInlineDv", StringType),
        StructField("offset", IntegerType),
        StructField("sizeInBytes", IntegerType),
        StructField("cardinality", LongType))))))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType),
      // superseded-DV tombstones carry the removed descriptor so
      // reconciliation stays keyed by (path, dvUniqueId) across a
      // checkpoint and VACUUM can still date the old .bin
      StructField("deletionVector", DeltaRead.dvStructType)))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))),
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))),
    // per-appId streaming watermarks MUST survive checkpointing — a
    // cleaned json log would otherwise reopen the exactly-once replay
    // hole (the SnapshotTable watermark-survives-compaction lesson)
    StructField("txn", StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType))))))

  /** Number of commits between classic checkpoints (≤0 disables). */
  private def checkpointInterval(spark: SparkSession): Int =
    spark.conf.getOption("graft.delta.checkpoint.interval")
      .map(_.toInt).getOrElse(10)

  /** Best-effort checkpoint trigger after a won commit: the commit
    * itself already succeeded, so a checkpoint failure must never fail
    * the append — readers simply keep replaying JSON until the next
    * interval hits.
    */
  private def maybeCheckpoint(spark: SparkSession, path: String,
                              version: Long): Unit = {
    val n = checkpointInterval(spark)
    if (n > 0 && version > 0 && version % n == 0)
      try writeCheckpoint(spark, path, version)
      catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Tombstone retention window in millis: the table's
    * `delta.deletedFileRetentionDuration` ("interval N units"), default
    * 1 week per the protocol. Unparseable values fall back to the
    * default (keeping MORE tombstones than needed is always sound; a
    * parse failure must never silently shorten retention).
    */
  private[graft] def retentionMillis(conf: Map[String, String]): Long = {
    val Default = 7L * 24 * 3600 * 1000
    conf.get("delta.deletedFileRetentionDuration").map { s =>
      val Pat = """(?i)\s*interval\s+(\d+)\s+(second|minute|hour|day|week)s?\s*""".r
      s match {
        case Pat(n, unit) =>
          val mult = unit.toLowerCase match {
            case "second" => 1000L
            case "minute" => 60L * 1000
            case "hour"   => 3600L * 1000
            case "day"    => 24L * 3600 * 1000
            case "week"   => 7L * 24 * 3600 * 1000
          }
          n.toLong * mult
        case _ => Default
      }
    }.getOrElse(Default)
  }

  /** Writer features whose table state this checkpointer carries in
    * full (adds incl. deletion vectors, metaData conf, protocol, txn
    * watermarks, unexpired remove tombstones). Anything else —
    * rowTracking's per-add baseRowId, domainMetadata actions, ... — is
    * state a re-checkpoint would DROP, so those tables stay
    * un-checkpointed.
    */
  private val CkptModeledWriterFeatures = Set("appendOnly", "invariants",
    "deletionVectors", "columnMapping", "timestampNtz", "v2Checkpoint")

  /** Write the classic single-file checkpoint parquet for `version`
    * (`NNNN.checkpoint.parquet` = reconciled protocol + metaData + every
    * live add with dataChange=false + txn watermarks, per PROTOCOL.md)
    * and point `_last_checkpoint` at it. Readers may then clean commits
    * ≤ version. Protocol features and deletion vectors carry VERBATIM.
    *
    * Refuses (returns false) when the log holds state this writer does
    * not model (unknown action types, unknown checkpoint columns with
    * rows, writer features beyond [[CkptModeledWriterFeatures]]) — a
    * checkpoint that silently dropped it would corrupt every future
    * read.
    */
  private[graft] def writeCheckpoint(spark: SparkSession, path: String,
                                     version: Long): Boolean = {
    val (st, live) = DeltaRead.checkpointState(spark, path, version)
    if (st.unmodeledState.nonEmpty ||
        !st.writerFeatures.forall(CkptModeledWriterFeatures) ||
        !st.readerFeatures.forall(DeltaRead.SupportedFeatures))
      return false
    // tables declaring the v2Checkpoint feature get the v2 form (UUID
    // manifest + _sidecars/): without it a long-lived v2 table this
    // engine appends to would accrete an unbounded JSON-only log
    if (st.writerFeatures.contains("v2Checkpoint") ||
        st.readerFeatures.contains("v2Checkpoint"))
      return writeV2Checkpoint(spark, path, version, st, live)
    val target = new Path(path,
      f"_delta_log/$version%020d.checkpoint.parquet")
    val f = fs(spark, path)
    if (f.exists(target)) return true // idempotent: someone already did
    import org.apache.spark.sql.Row
    def protoRow = Row(st.minReaderVersion, st.minWriterVersion,
      if (st.minReaderVersion >= 3) st.readerFeatures else null,
      if (st.minWriterVersion >= 7) st.writerFeatures else null)
    def dvRow(a: DeltaRead.AddEntry) = a.dv.map(d =>
      Row(d.storageType, d.pathOrInlineDv, d.offset, d.sizeInBytes,
        d.cardinality)).orNull
    val (tombs, dvTombs) = unexpiredTombstones(st, live)
    def dvTombRow(t: DeltaRead.DvTomb) = Row(t.dv.storageType,
      t.dv.pathOrInlineDv, t.dv.offset, t.dv.sizeInBytes, t.dv.cardinality)
    val rows: Seq[Row] =
      (Row(null, null, null, protoRow, null) +:
      Row(null, null, Row(st.metaId, Row("parquet"), st.schemaJson,
        st.partitionCols, st.conf, st.createdTime), null, null) +:
      live.map(a => Row(Row(a.path, a.partitionValues, a.size,
        a.modificationTime, false, a.stats.orNull, dvRow(a)), null, null,
        null, null))) ++
      tombs.map { case (p, ts) =>
        Row(null, Row(p, ts, false, null), null, null, null)
      } ++
      dvTombs.map { t =>
        Row(null, Row(t.path, t.deletionTimestamp, false, dvTombRow(t)),
          null, null, null)
      } ++
      st.txns.toSeq.sortBy(_._1).map { case (app, v) =>
        Row(null, null, null, null, Row(app, v))
      }
    val stage = new Path(path,
      s"_delta_log/.ckpt-stage-${java.util.UUID.randomUUID()}")
    try {
      spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), ckptSchema)
        .coalesce(1).write.parquet(stage.toString)
      val part = f.listStatus(stage).map(_.getPath)
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(
          s"$stage: checkpoint stage produced no parquet part"))
      if (!f.rename(part, target)) return f.exists(target)
      val lc = new Path(path, "_delta_log/_last_checkpoint")
      val out = f.create(lc, true)
      try out.write(
        s"""{"version":$version,"size":${rows.size}}""".getBytes("UTF-8"))
      finally out.close()
      true
    } finally f.delete(stage, true)
  }

  /** Unexpired tombstones that must survive a checkpoint (protocol
    * requirement for VACUUM / concurrent-reader reconciliation):
    * base-checkpoint tombstones filter DISTRIBUTED on the retention
    * cutoff before the (bounded) collect, tail tombstones filter
    * driver-side; a path re-added after its remove is live again, so
    * its PATH tombstone drops — but a tombstone carrying a superseded
    * DV descriptor survives as long as that descriptor is not attached
    * to any live add (reconciliation is keyed by (path, dvUniqueId)),
    * so VACUUM after a re-checkpoint can still date the old .bin.
    */
  private def unexpiredTombstones(st: DeltaRead.LogState,
                                  live: Seq[DeltaRead.AddEntry])
      : (Seq[(String, Long)], Seq[DeltaRead.DvTomb]) = {
    val cutoff = System.currentTimeMillis() - retentionMillis(st.conf)
    val liveKeys = live.map(_.path).toSet
    val ckptRows = st.ckptRemoves.map { rm =>
      rm.filter(col("deletionTimestamp") >= cutoff).collect().toSeq
    }.getOrElse(Nil)
    val ckptTombs: Seq[(String, Long)] =
      ckptRows.map(r => (r.getString(0), r.getLong(1)))
    val data = (ckptTombs ++ st.tailRemoves.toSeq)
      .filter { case (p, ts) => ts >= cutoff && !liveKeys.contains(p) }
      .toMap.toSeq.sortBy(_._1)
    val liveUids = live.flatMap(_.dv).map(DeltaRead.dvUid).toSet
    val ckptDvTombs = ckptRows.filterNot(_.isNullAt(2)).map { r =>
      val d = r.getStruct(2)
      DeltaRead.DvTomb(r.getString(0), r.getLong(1),
        DeltaRead.Dv(d.getString(0), d.getString(1), d.getInt(2),
          d.getInt(3), d.getLong(4)))
    }
    val dv = (ckptDvTombs ++ st.tailDvTombs.values.toSeq)
      .filter(t => t.deletionTimestamp >= cutoff &&
        !liveUids.contains(DeltaRead.dvUid(t.dv)))
      .groupBy(t => DeltaRead.dvUid(t.dv))
      .map(_._2.maxBy(_.deletionTimestamp)).toSeq
      .sortBy(t => (t.path, DeltaRead.dvUid(t.dv)))
    (data, dv)
  }

  /** Stage a tiny metadata parquet (driver-built rows) and rename it
    * into place. False when the rename lost to a concurrent writer and
    * the target did not appear.
    */
  private def stageParquet(spark: SparkSession,
                           f: org.apache.hadoop.fs.FileSystem,
                           logDir: Path, rows: Seq[org.apache.spark.sql.Row],
                           schema: StructType, target: Path): Boolean = {
    val stage = new Path(logDir,
      s".ckpt-stage-${java.util.UUID.randomUUID()}")
    try {
      spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          schema)
        .coalesce(1).write.parquet(stage.toString)
      val part = f.listStatus(stage).map(_.getPath)
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(
          s"$stage: checkpoint stage produced no parquet part"))
      f.mkdirs(target.getParent)
      if (!f.rename(part, target)) f.exists(target) else true
    } finally f.delete(stage, true)
  }

  // sidecar files carry FILE ACTIONS ONLY (add/remove), per the spec
  private val sidecarSchema =
    StructType(Seq(ckptSchema("add"), ckptSchema("remove")))
  private val v2ManifestSchema = StructType(Seq(
    ckptSchema("metaData"), ckptSchema("protocol"), ckptSchema("txn"),
    StructField("checkpointMetadata", StructType(Seq(
      StructField("version", LongType)))),
    StructField("sidecar", StructType(Seq(
      StructField("path", StringType),
      StructField("sizeInBytes", LongType),
      StructField("modificationTime", LongType))))))

  /** V2/UUID checkpoint (PROTOCOL.md "V2 Checkpoints") — written for
    * tables declaring the `v2Checkpoint` feature, which the classic
    * single-file form would otherwise leave accreting an unbounded
    * JSON-only log tail: file actions (live adds + unexpired remove
    * tombstones) land in a `_delta_log/_sidecars/<uuid>.parquet`
    * sidecar, and the top manifest `<version>.checkpoint.<uuid>.parquet`
    * carries protocol + metaData + txn watermarks + a
    * `checkpointMetadata{version}` action + one `sidecar` action naming
    * the sidecar with its REQUIRED sizeInBytes/modificationTime.
    * `_last_checkpoint` then points at the version (readers that cannot
    * corroborate the hint — including this repo's — fall back to
    * listing, where the UUID manifest name is discovered directly).
    * The sidecar lands before the manifest, so a crash between the two
    * leaves only an unreferenced orphan, never a dangling reference.
    */
  private def writeV2Checkpoint(spark: SparkSession, path: String,
                                version: Long, st: DeltaRead.LogState,
                                live: Seq[DeltaRead.AddEntry]): Boolean = {
    import org.apache.spark.sql.Row
    val f = fs(spark, path)
    val logDir = new Path(path, "_delta_log")
    val prefix = f"$version%020d.checkpoint."
    if (f.listStatus(logDir).exists(s =>
        s.isFile && s.getPath.getName.startsWith(prefix)))
      return true // idempotent: a checkpoint for this version exists
    def dvRow(a: DeltaRead.AddEntry) = a.dv.map(d =>
      Row(d.storageType, d.pathOrInlineDv, d.offset, d.sizeInBytes,
        d.cardinality)).orNull
    val (tombs, dvTombs) = unexpiredTombstones(st, live)
    val sidecarRows: Seq[Row] =
      live.map(a => Row(Row(a.path, a.partitionValues, a.size,
        a.modificationTime, false, a.stats.orNull, dvRow(a)), null)) ++
      tombs.map { case (p, ts) => Row(null, Row(p, ts, false, null)) } ++
      dvTombs.map(t => Row(null, Row(t.path, t.deletionTimestamp, false,
        Row(t.dv.storageType, t.dv.pathOrInlineDv, t.dv.offset,
          t.dv.sizeInBytes, t.dv.cardinality))))
    val uuid = java.util.UUID.randomUUID().toString
    val scName = s"$uuid.parquet"
    val scTarget = new Path(logDir, s"_sidecars/$scName")
    if (!stageParquet(spark, f, logDir, sidecarRows, sidecarSchema,
        scTarget)) return false
    val scStat = f.getFileStatus(scTarget)
    val protoRow = Row(st.minReaderVersion, st.minWriterVersion,
      if (st.minReaderVersion >= 3) st.readerFeatures else null,
      if (st.minWriterVersion >= 7) st.writerFeatures else null)
    val manifestRows: Seq[Row] =
      (Row(null, protoRow, null, null, null) +:
       Row(Row(st.metaId, Row("parquet"), st.schemaJson,
         st.partitionCols, st.conf, st.createdTime),
         null, null, null, null) +:
       st.txns.toSeq.sortBy(_._1).map { case (app, v) =>
         Row(null, null, Row(app, v), null, null) }) ++
      Seq(Row(null, null, null, Row(version), null),
          Row(null, null, null, null,
            Row(scName, scStat.getLen, scStat.getModificationTime)))
    val manifest = new Path(logDir, s"$prefix$uuid.parquet")
    if (!stageParquet(spark, f, logDir, manifestRows, v2ManifestSchema,
        manifest)) return false
    val lc = new Path(logDir, "_last_checkpoint")
    val out = f.create(lc, true)
    try out.write((s"""{"version":$version,""" +
      s""""size":${sidecarRows.size + manifestRows.size}}""")
        .getBytes("UTF-8"))
    finally out.close()
    true
  }

  /** Atomic put-if-absent of the commit json through the SnapshotTable
    * CommitStore registered for the filesystem scheme.
    */
  private def publish(spark: SparkSession, path: String, version: Long,
                      actions: Seq[String]): Boolean = {
    val f = fs(spark, path)
    val dir = new Path(path, "_delta_log")
    f.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write((actions.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val target = new Path(dir, f"$version%020d.json")
    val won = SnapshotTable.storeFor(f.getScheme)
      .publishIfAbsent(f, tmp, target)
    f.delete(tmp, false)
    won
  }
}
