package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Config-driven transformations: a JSON job spec compiled to ONE lazy
  * DataFrame plan — the migration surface for config-first ETL frameworks
  * whose pipelines are lists of declarative steps rather than code.
  *
  * {{{
  * {"source": "documents",
  *  "steps": [
  *    {"op": "withColumn", "name": "n_words", "expr": "size(split(text, ' '))"},
  *    {"op": "filter", "expr": "n_words >= 10"},
  *    {"op": "join", "right": "langs", "on": ["lang"], "how": "left"},
  *    {"op": "agg", "groupBy": ["lang"], "aggs": [["n", "count(1)"]]},
  *    {"op": "orderBy", "cols": ["lang"]}]}
  * }}}
  *
  * Expressions are Spark SQL fragments (`expr(...)`), so every codegen'd
  * builtin — and every graft function registered via
  * `graft.functions.Register.all` — is available to config authors. The
  * whole spec stays declarative: Catalyst sees one plan and optimizes
  * across step boundaries (filter pushdown through earlier steps, column
  * pruning of unused config columns), exactly as hand-written code would.
  */
object TransformSpec {
  private val om = new ObjectMapper()

  /** Compile and apply a JSON job spec. `catalog` resolves `source` and
    * join `right` names to frames (a production deployment would back
    * this with a metastore lookup).
    */
  def run(json: String, catalog: Map[String, DataFrame]): DataFrame =
    run(json, catalog, allowInlineSources = false)

  /** As [[run]], with inline filesystem sources (`parquet:/csv:/json:/
    * orc:/snapshot:` prefixes) gated behind an explicit opt-in. The
    * DEFAULT is catalog-only: a declarative spec can then only touch
    * frames the CALLER handed it, so specs arriving from untrusted or
    * multi-tenant input cannot name arbitrary filesystem paths (a
    * path-traversal / governance surface). Local self-contained jobs —
    * where the job file IS the pipeline — pass `allowInlineSources =
    * true` (or, for the SQL TVF, set the session conf
    * `graft.transform.allowInlineSources=true`).
    */
  def run(json: String, catalog: Map[String, DataFrame],
          allowInlineSources: Boolean): DataFrame = {
    val root = om.readTree(json)
    val src = root.path("source").asText()
    root.path("steps").elements().asScala
      .foldLeft(resolve(src, catalog, allowInlineSources))(
        (df, step) => apply(df, step, catalog, allowInlineSources))
  }

  /** Resolve a table reference: the catalog first, then INLINE sources —
    * `parquet:/path`, `csv:/path` (header + inferSchema), `json:/path`,
    * `orc:/path`, and `snapshot:/path` (optionally `snapshot:/path@v`
    * for time travel into a [[graft.sources.SnapshotTable]]) — so a
    * declarative job can name its own inputs: the job file IS the whole
    * pipeline, with no pre-registration step. That is the config-first
    * migration contract; a production deployment still routes governed
    * names through the catalog map / metastore.
    */
  private def resolve(name: String, catalog: Map[String, DataFrame],
                      allowInline: Boolean): DataFrame =
    catalog.getOrElse(name, {
      if (!allowInline && name.contains(":"))
        throw new IllegalArgumentException(
          s"inline source '$name' refused: this job was compiled " +
            "catalog-only. Pass allowInlineSources=true (Scala/py4j) or " +
            "set graft.transform.allowInlineSources=true (SQL TVF) to " +
            "let the spec name its own filesystem paths.")
      // active first (SQL/TVF callers), else the default session —
      // worker-thread callers (tests, schedulers) often have no
      // thread-local active session
      val spark = org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .getOrElse(throw new IllegalStateException(
          s"no SparkSession available to resolve inline source '$name'"))
      name.split(":", 2) match {
        case Array("parquet", p) => spark.read.parquet(p)
        case Array("csv", p) => spark.read.option("header", "true")
          .option("inferSchema", "true").csv(p)
        case Array("json", p) => spark.read.json(p)
        case Array("orc", p) => spark.read.orc(p)
        case Array("snapshot", p) => p.split("@") match {
          case Array(pp, v) if v.forall(_.isDigit) && v.nonEmpty =>
            graft.sources.SnapshotTable.read(spark, pp, v.toInt)
          case _ => graft.sources.SnapshotTable.read(spark, p)
        }
        case Array("delta", p) => p.split("@") match {
          case Array(pp, v) if v.forall(_.isDigit) && v.nonEmpty =>
            graft.sources.DeltaRead.read(spark, pp, v.toLong)
          case _ => graft.sources.DeltaRead.read(spark, p)
        }
        case Array("iceberg", p) => p.split("@") match {
          case Array(pp, v) if v.forall(_.isDigit) && v.nonEmpty =>
            graft.sources.IcebergRead.read(spark, pp, v.toLong)
          case _ => graft.sources.IcebergRead.read(spark, p)
        }
        case Array("hudi", p) => p.split("@") match {
          case Array(pp, ts) if ts.forall(_.isDigit) && ts.nonEmpty =>
            graft.sources.HudiRead.read(spark, pp, ts)
          case _ => graft.sources.HudiRead.read(spark, p)
        }
        case _ => throw new IllegalArgumentException(
          s"unknown source '$name': not in the catalog, and inline sources " +
            "use parquet:/csv:/json:/orc:/snapshot:/delta:/iceberg:/hudi: prefixes")
      }
    })

  /** Java/py4j entry point — the PySpark facade (python/graft.py) calls
    * this with a java.util.Map catalog, since a Scala immutable Map
    * can't be built conveniently across the gateway.
    */
  def run(json: String, catalog: java.util.Map[String, DataFrame]): DataFrame =
    run(json, catalog.asScala.toMap)

  def run(json: String, catalog: java.util.Map[String, DataFrame],
          allowInlineSources: Boolean): DataFrame =
    run(json, catalog.asScala.toMap, allowInlineSources)

  /** SQL entry point (the `graft_transform(json)` TVF): every table the
    * spec references — the `source` plus each join `right` — resolves
    * against the ACTIVE session's catalog (temp views, metastore tables),
    * which is exactly what a SQL-first caller expects.
    */
  def runSql(json: String): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    val root = om.readTree(json)
    // every table-referencing step verb: join/asof read "right",
    // union reads "other"
    val names = Set(root.path("source").asText()) ++
      root.path("steps").elements().asScala.flatMap { s =>
        s.path("op").asText() match {
          case "join" | "asof" => Some(s.path("right").asText())
          case "union"         => Some(s.path("other").asText())
          case _               => None
        }
      }
    // inline filesystem sources from SQL text are the least-governed
    // channel, so they need the explicit session-conf opt-in
    val allowInline = spark.conf
      .getOption("graft.transform.allowInlineSources").contains("true")
    run(json, names.filterNot(_.contains(":"))
      .map(n => n -> spark.table(n)).toMap, allowInline)
  }

  private def strings(n: JsonNode): Seq[String] =
    n.elements().asScala.map(_.asText()).toSeq

  private def gateWrite(allowInline: Boolean, op: String): Unit =
    if (!allowInline) throw new IllegalArgumentException(
      s"writer step '$op' refused: this job was compiled catalog-only. " +
        "Pass allowInlineSources=true (Scala/py4j) or set " +
        "graft.transform.allowInlineSources=true (SQL TVF) to let the " +
        "spec write filesystem paths.")

  private def apply(df: DataFrame, step: JsonNode,
                    catalog: Map[String, DataFrame],
                    allowInline: Boolean): DataFrame = {
    step.path("op").asText() match {
      case "filter" => df.filter(expr(step.path("expr").asText()))
      case "select" => df.select(strings(step.path("cols")).map(expr): _*)
      case "withColumn" =>
        df.withColumn(step.path("name").asText(), expr(step.path("expr").asText()))
      case "drop" => df.drop(strings(step.path("cols")): _*)
      case "distinct" => df.distinct()
      case "limit" => df.limit(step.path("n").asInt())
      case "orderBy" => df.orderBy(strings(step.path("cols")).map(expr): _*)
      case "join" =>
        val rightName = step.path("right").asText()
        val how = if (step.has("how")) step.path("how").asText() else "inner"
        df.join(resolve(rightName, catalog, allowInline),
          strings(step.path("on")), how)
      case "agg" =>
        val aggs = step.path("aggs").elements().asScala.map { pair =>
          expr(pair.get(1).asText()).as(pair.get(0).asText())
        }.toSeq
        val keys = strings(step.path("groupBy"))
        if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
        else df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      case "union" =>
        val otherName = step.path("other").asText()
        df.unionByName(resolve(otherName, catalog, allowInline))
      // ---- writer steps: a JSON spec is a WHOLE ingest job ----------
      // Each writes a side effect and passes the frame through, so a
      // spec can write a snapshot AND return the audit frame. Writing
      // filesystem paths is the same governance surface as reading them
      // — gated behind the same inline opt-in.
      case "write" =>
        gateWrite(allowInline, "write")
        val fmt = if (step.has("format")) step.path("format").asText()
                  else "parquet"
        val mode = if (step.has("mode")) step.path("mode").asText()
                   else "errorifexists"
        df.write.format(fmt).mode(mode).save(step.path("path").asText())
        df
      case "snapshotCreate" =>
        gateWrite(allowInline, "snapshotCreate")
        graft.sources.SnapshotTable.create(df, step.path("path").asText())
        df
      case "snapshotAppend" =>
        gateWrite(allowInline, "snapshotAppend")
        val p = step.path("path").asText()
        val spark = df.sparkSession
        if (graft.sources.SnapshotTable.exists(spark, p))
          graft.sources.SnapshotTable.append(df, p)
        else graft.sources.SnapshotTable.create(df, p)
        df
      case "deltaAppend" =>
        // append-only Delta emit (create-if-absent): the output of a
        // declarative job lands as a table any Delta reader consumes
        gateWrite(allowInline, "deltaAppend")
        val p = step.path("path").asText()
        val spark = df.sparkSession
        val hasLog = new org.apache.hadoop.fs.Path(p, "_delta_log")
        val f = hasLog.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (f.exists(hasLog)) graft.sources.DeltaWrite.append(df, p)
        else graft.sources.DeltaWrite.create(df, p,
          // optional hive-layout partitioning for the create
          if (step.has("partitionBy")) strings(step.path("partitionBy"))
          else Nil)
        df
      case "icebergAppend" =>
        // append-only Iceberg emit (create-if-absent) — the Delta
        // deltaAppend contract on the second open format
        gateWrite(allowInline, "icebergAppend")
        val p = step.path("path").asText()
        val spark = df.sparkSession
        val meta = new org.apache.hadoop.fs.Path(p, "metadata")
        val f = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (f.exists(meta)) graft.sources.IcebergWrite.append(df, p)
        else graft.sources.IcebergWrite.create(df, p)
        df
      case "deltaUpsert" =>
        // copy-on-write MERGE into a Delta table: rows sharing `keys`
        // replaced, fresh keys inserted, one atomic commit
        gateWrite(allowInline, "deltaUpsert")
        graft.sources.DeltaWrite.upsert(df, step.path("path").asText(),
          strings(step.path("keys")))
        df
      case "deltaDelete" =>
        // copy-on-write DELETE on a Delta table; the step's input frame
        // passes through untouched (the target is the `path` table)
        gateWrite(allowInline, "deltaDelete")
        graft.sources.DeltaWrite.delete(df.sparkSession,
          step.path("path").asText(), step.path("predicate").asText())
        df
      case "deltaOptimize" =>
        // bin-packing compaction (dataChange=false; DVs fold); with
        // zorderBy, the two-dimension Morton layout rewrite; the
        // input frame passes through untouched
        gateWrite(allowInline, "deltaOptimize")
        graft.sources.DeltaWrite.optimize(df.sparkSession,
          step.path("path").asText(),
          if (step.has("targetBytes")) step.path("targetBytes").asLong()
          else 128L * 1024 * 1024,
          strings(step.path("zorderBy")))
        df
      case "deltaDeleteDv" =>
        // merge-on-read DELETE: deletion vectors instead of file
        // rewrites; the input frame passes through untouched
        gateWrite(allowInline, "deltaDeleteDv")
        graft.sources.DeltaWrite.deleteDv(df.sparkSession,
          step.path("path").asText(), step.path("predicate").asText())
        df
      case "deltaDeleteDvKeys" =>
        // merge-on-read DELETE BY KEYS (forget queue): the input frame
        // IS the key set; rows sharing its key tuples get masked
        gateWrite(allowInline, "deltaDeleteDvKeys")
        graft.sources.DeltaWrite.deleteDvKeys(df,
          step.path("path").asText(), strings(step.path("keys")))
        df
      case "deltaUpsertDv" =>
        // merge-on-read MERGE: matched rows masked via deletion
        // vectors, the input frame lands as the fresh segment
        gateWrite(allowInline, "deltaUpsertDv")
        graft.sources.DeltaWrite.upsertDv(df, step.path("path").asText(),
          strings(step.path("keys")))
        df
      case "deltaVacuum" =>
        // retention-gated cleanup of unreachable data/DV files
        gateWrite(allowInline, "deltaVacuum")
        graft.sources.DeltaWrite.vacuum(df.sparkSession,
          step.path("path").asText(),
          if (step.has("retainMillis")) step.path("retainMillis").asLong()
          else -1L)
        df
      case "deltaRestore" =>
        // restore to a prior version as a new commit (history kept);
        // the input frame passes through untouched
        gateWrite(allowInline, "deltaRestore")
        graft.sources.DeltaWrite.restore(df.sparkSession,
          step.path("path").asText(), step.path("version").asLong())
        df
      case "icebergDeleteKeys" =>
        // pure equality-delete snapshot: the input frame IS the key set
        gateWrite(allowInline, "icebergDeleteKeys")
        graft.sources.IcebergWrite.deleteKeys(df,
          step.path("path").asText(), strings(step.path("keys")))
        df
      case "icebergUpsert" =>
        // merge-on-read MERGE into an Iceberg table: one snapshot with
        // an equality delete on the keys + the source rows
        gateWrite(allowInline, "icebergUpsert")
        graft.sources.IcebergWrite.upsert(df, step.path("path").asText(),
          strings(step.path("keys")))
        df
      case "hudiInsert" =>
        // Hudi COW insert (create-if-absent, like icebergAppend); the
        // input frame is what lands
        gateWrite(allowInline, "hudiInsert")
        val p = step.path("path").asText()
        val key = step.path("key").asText()
        val f = new org.apache.hadoop.fs.Path(p, ".hoodie")
          .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        if (!f.exists(new org.apache.hadoop.fs.Path(p,
            ".hoodie/hoodie.properties")))
          graft.sources.HudiWrite.create(df, p, key,
            if (step.has("partitionField"))
              step.path("partitionField").asText() else "")
        else graft.sources.HudiWrite.insert(df, p, key)
        df
      case "hudiUpsertLog" =>
        // MOR log-upsert: one avro log block per affected file slice
        gateWrite(allowInline, "hudiUpsertLog")
        graft.sources.HudiWrite.upsertLog(df, step.path("path").asText(),
          step.path("key").asText())
        df
      case "hudiDeleteLog" =>
        // MOR log-delete: one DELETE_BLOCK per affected file slice;
        // the input frame carries the keys to delete
        gateWrite(allowInline, "hudiDeleteLog")
        graft.sources.HudiWrite.deleteLog(df, step.path("path").asText(),
          step.path("key").asText())
        df
      case "hudiUpsert" =>
        // Hudi COW MERGE by the table's declared record key
        gateWrite(allowInline, "hudiUpsert")
        graft.sources.HudiWrite.upsert(df, step.path("path").asText(),
          step.path("key").asText())
        df
      case "hudiDelete" =>
        // Hudi COW predicate DELETE; input frame passes through
        gateWrite(allowInline, "hudiDelete")
        graft.sources.HudiWrite.delete(df.sparkSession,
          step.path("path").asText(), step.path("predicate").asText())
        df
      case "hudiInsertOverwrite" =>
        // replacecommit partition recompute: the input frame replaces
        // every group of the partitions it touches
        gateWrite(allowInline, "hudiInsertOverwrite")
        graft.sources.HudiWrite.insertOverwrite(df,
          step.path("path").asText(), step.path("key").asText())
        df
      case "hudiCluster" =>
        // replacecommit layout rewrite: bin-pack small groups, or (with
        // sortBy) range-sort every group for 1-of-N pruned reads
        gateWrite(allowInline, "hudiCluster")
        graft.sources.HudiWrite.cluster(df.sparkSession,
          step.path("path").asText(),
          if (step.has("targetBytes")) step.path("targetBytes").asLong()
          else 128L * 1024 * 1024,
          strings(step.path("sortBy")))
        df
      case "hudiCompact" =>
        // MOR compaction: fold live log blocks into fresh base files
        // under a commit instant; input frame passes through
        gateWrite(allowInline, "hudiCompact")
        graft.sources.HudiWrite.compact(df.sparkSession,
          step.path("path").asText())
        df
      case "hudiClean" =>
        // retention: physically delete slices shadowed beyond the
        // horizon (time travel below it refuses loudly afterwards)
        gateWrite(allowInline, "hudiClean")
        graft.sources.HudiWrite.clean(df.sparkSession,
          step.path("path").asText(),
          step.path("retainInstants").asInt())
        df
      case "hudiArchive" =>
        // trim the active timeline into .hoodie/archived (refuses and
        // rolls back if it would orphan a group's latest write)
        gateWrite(allowInline, "hudiArchive")
        graft.sources.HudiWrite.archive(df.sparkSession,
          step.path("path").asText(), step.path("keepLast").asInt())
        df
      case "hudiSyncMetadata" =>
        // build/refresh the modeled metadata table (files +
        // column_stats) for one-read plan-time pruning
        gateWrite(allowInline, "hudiSyncMetadata")
        graft.sources.HudiWrite.syncMetadata(df.sparkSession,
          step.path("path").asText())
        df
      case "icebergRewrite" =>
        // bin-pack small data files in one replace snapshot (deletes
        // applied); with sortBy, the sorted layout rewrite; input
        // frame passes through
        gateWrite(allowInline, "icebergRewrite")
        graft.sources.IcebergWrite.rewriteDataFiles(df.sparkSession,
          step.path("path").asText(),
          if (step.has("targetBytes")) step.path("targetBytes").asLong()
          else 128L * 1024 * 1024,
          strings(step.path("sortBy")))
        df
      case "icebergRollback" =>
        // metadata-only rollback to a prior snapshot (history kept);
        // the input frame passes through untouched
        gateWrite(allowInline, "icebergRollback")
        graft.sources.IcebergWrite.rollbackTo(df.sparkSession,
          step.path("path").asText(), step.path("snapshotId").asLong())
        df
      case "deltaSync" =>
        // incremental Delta -> SnapshotTable mirror over the row-level
        // change feed (exactly-once; watermark on the target)
        gateWrite(allowInline, "deltaSync")
        graft.sources.DeltaSync.sync(df.sparkSession,
          step.path("path").asText(), step.path("target").asText(),
          strings(step.path("keys")),
          if (step.has("bootstrapVersion"))
            step.path("bootstrapVersion").asLong()
          else -1L)
        df
      case "snapshotUpsert" =>
        // MERGE by key; with appId+batchId it is the exactly-once
        // upsertBatch (replayed batches detected and skipped via the
        // manifest's per-appId transaction watermark)
        gateWrite(allowInline, "snapshotUpsert")
        val p = step.path("path").asText()
        val keys = strings(step.path("keys"))
        val spark = df.sparkSession
        if (step.has("appId"))
          graft.sources.SnapshotTable.upsertBatch(spark, p, df, keys,
            step.path("appId").asText(), step.path("batchId").asLong())
        else graft.sources.SnapshotTable.upsert(spark, p, df, keys)
        df
      case "rename" =>
        step.path("map").properties().asScala.foldLeft(df)((d, e) =>
          d.withColumnRenamed(e.getKey, e.getValue.asText()))
      case "cast" =>
        step.path("map").properties().asScala.foldLeft(df)((d, e) =>
          d.withColumn(e.getKey, col(e.getKey).cast(e.getValue.asText())))
      case "sample" =>
        // deterministic md5-threshold sample, never rand(): reproducible
        // on any cluster (same recipe as q26/deterministicSplit)
        val frac = step.path("fraction").asDouble()
        val key = expr(step.path("key").asText())
        df.filter(
          conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
            .cast("long").cast("double") / lit(4294967296.0) < frac)
      case "dedup" =>
        GraftOps.exactDedup(df,
          expr(step.path("key").asText()), expr(step.path("id").asText()))
      case "nearDedup" =>
        // near-dup removal behind one config line: keep the
        // lexicographically-first doc per pair, drop the rest. Optional
        // "strategy": "shingle" (exact), "lsh" (banded, the 100 TB
        // path), or the default "session" (spark conf
        // graft.neardup.strategy — the library-wide one-switch routing)
        val t = if (step.has("threshold")) step.path("threshold").asDouble() else 0.8
        val strat =
          if (step.has("strategy")) step.path("strategy").asText() else "session"
        val id = expr(step.path("id").asText())
        val doomed = GraftOps.nearDupPairs(df,
            id, expr(step.path("text").asText()), t, strategy = strat)
          .select(col("id_b").as("__doomed")).distinct()
        df.join(doomed, id === col("__doomed"), "left_anti")
      case "topk" =>
        // exact global top-k with rank, the q59 discipline (bounded-heap
        // prune, never a corpus-wide single-task sort)
        GraftOps.globalTopK(df, step.path("score").asText(),
          step.path("tie").asText(), step.path("k").asInt())
      case "split" =>
        // appends `split` (0-based bucket index) deterministically; a
        // downstream filter step selects the train/val/test lane
        val weights = step.path("weights").elements().asScala
          .map(_.asDouble()).toSeq
        GraftOps.deterministicSplit(df, expr(step.path("key").asText()), weights)
      case "spanDedup" =>
        // sub-document span dedup with reconstruction (the d18 pipeline)
        // behind one config line: GENUINELY replaces the text column in
        // the pipeline frame (all other columns survive) and appends the
        // n_spans/n_kept accounting; rows whose every span was deduped
        // away get a null text. spanDedup itself returns only
        // (id, n_spans, n_kept, text_kept), so the result is joined back
        // on the id.
        val words = if (step.has("spanWords")) step.path("spanWords").asInt() else 10
        val idExpr = step.path("id").asText()
        val textCol = step.path("text").asText()
        val sd = GraftOps.spanDedup(df, expr(idExpr), expr(textCol), words)
          .withColumnRenamed("id", "__sd_id")
        df.join(sd, expr(idExpr) === col("__sd_id"), "left")
          .withColumn(textCol, col("text_kept"))
          .drop("__sd_id", "text_kept")
      case "sessionize" =>
        val gap = if (step.has("gap")) step.path("gap").asText() else "30 minutes"
        // optional "tiebreak" column extends (ts, ...) to a total order —
        // required for run-invariant session ids when ts can repeat
        // (the q27 discipline: it orders by (ts, event_id))
        val tiebreak =
          if (step.has("tiebreak")) Seq(expr(step.path("tiebreak").asText())) else Nil
        GraftOps.sessionize(df,
          expr(step.path("key").asText()), expr(step.path("ts").asText()), gap,
          tiebreak)
      case "window" =>
        // window functions behind one config line:
        //   {"op": "window", "name": "rk", "expr": "row_number()",
        //    "partitionBy": ["k"], "orderBy": ["ts", "id"],
        //    "frame": "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW"?}
        // partitionBy is REQUIRED non-empty — the engine forbids
        // unpartitioned windows (single-task scans at scale); global
        // ranking goes through the "topk" step's bounded-heap prune.
        // The OVER clause is assembled as SQL so every frame Spark's
        // parser accepts (ROWS/RANGE, interval ranges) is reachable.
        val parts = strings(step.path("partitionBy"))
        require(parts.nonEmpty,
          "window step requires non-empty partitionBy (unpartitioned " +
            "windows are single-task at scale; use the 'topk' step for " +
            "global ranking)")
        val orders = strings(step.path("orderBy"))
        val over = s"PARTITION BY ${parts.mkString(", ")}" +
          (if (orders.nonEmpty) s" ORDER BY ${orders.mkString(", ")}" else "") +
          (if (step.has("frame")) " " + step.path("frame").asText() else "")
        df.withColumn(step.path("name").asText(),
          expr(s"${step.path("expr").asText()} OVER ($over)"))
      case "pivot" =>
        // {"op": "pivot", "groupBy": [...], "pivot": "col",
        //  "values": [...]?, "aggs": [["alias", "expr"], ...]}
        // With "values" given the pivot lowers to one partial-agg pass
        // (FILTER-clause aggregates — the q11/q81 plan); omitting it
        // adds Spark's distinct-values discovery pass first, fine for
        // exploration, not for the 100 TB path.
        val pAggs = step.path("aggs").elements().asScala.map { pair =>
          expr(pair.get(1).asText()).as(pair.get(0).asText())
        }.toSeq
        val gb = df.groupBy(strings(step.path("groupBy")).map(col): _*)
        val pv =
          if (step.has("values"))
            gb.pivot(step.path("pivot").asText(), strings(step.path("values")))
          else gb.pivot(step.path("pivot").asText())
        pv.agg(pAggs.head, pAggs.tail: _*)
      case "asof" =>
        // as-of join (latest right row at or before the left time, per
        // key) through the custom AsofJoinExec — co-partitioned
        // sort-merge, one shuffle per side (the q41 operator):
        //   {"op": "asof", "right": "quotes", "leftKey": "k",
        //    "rightKey": "k", "leftTime": "ts", "rightTime": "ts"}
        val rightName = step.path("right").asText()
        graft.plans.AsofJoin.asofJoin(df,
          resolve(rightName, catalog, allowInline),
          step.path("leftKey").asText(), step.path("rightKey").asText(),
          step.path("leftTime").asText(), step.path("rightTime").asText())
      case "skewAudit" =>
        // join-strategy audit as a declarative step (q91's verb):
        //   {"op": "skewAudit", "key": "l_partkey", "label": "li.partkey"}
        GraftOps.skewAudit(df, expr(step.path("key").asText()),
          step.path("label").asText())
      case "ksTest" =>
        // exact two-sample KS drift test (v11's verb):
        //   {"op": "ksTest", "group": "event_type", "value": "value",
        //    "a": "purchase", "b": "click"}
        GraftOps.ksTest(df, expr(step.path("group").asText()),
          expr(step.path("value").asText()),
          step.path("a").asText(), step.path("b").asText())
      case "growthAccounting" =>
        // weekly growth accounting (e33's verb):
        //   {"op": "growthAccounting", "entity": "user_id", "ts": "ts"}
        GraftOps.growthAccounting(df, expr(step.path("entity").asText()),
          expr(step.path("ts").asText()))
      case "fdAudit" =>
        // functional-dependency audit (v19's verb):
        //   {"op": "fdAudit", "det": "p_brand", "dep": "p_type",
        //    "label": "part.brand->type"}
        GraftOps.fdAudit(df, expr(step.path("det").asText()),
          expr(step.path("dep").asText()), step.path("label").asText())
      case "conversionHazard" =>
        // censored time-to-conversion hazard curve (e48's verb):
        //   {"op": "conversionHazard", "entity": "user_id", "ts": "ts",
        //    "isConversion": "event_type = 'purchase'", "maxDays": 14}
        GraftOps.conversionHazard(df, expr(step.path("entity").asText()),
          expr(step.path("ts").asText()),
          expr(step.path("isConversion").asText()),
          if (step.has("maxDays")) step.path("maxDays").asInt() else 14)
      case "kaplanMeier" =>
        // right-censored Kaplan–Meier survival curve (e60's verb):
        //   {"op": "kaplanMeier", "entity": "user_id", "ts": "ts",
        //    "isEvent": "event_type = 'purchase'"}
        GraftOps.kaplanMeier(df, expr(step.path("entity").asText()),
          expr(step.path("ts").asText()),
          expr(step.path("isEvent").asText()))
      case "rollingTrend" =>
        // trailing-window OLS slope per group (q110's verb):
        //   {"op": "rollingTrend", "group": "nation", "day": "day",
        //    "cents": "cents", "windowDays": 28}
        GraftOps.rollingTrend(df, expr(step.path("group").asText()),
          expr(step.path("day").asText()),
          expr(step.path("cents").asText()),
          if (step.has("windowDays")) step.path("windowDays").asInt() else 28)
      case "linkPredict" =>
        // common-neighbor link prediction over an a<b edge frame (g06's
        // verb): {"op": "linkPredict", "a": "a", "b": "b", "topK": 15}
        GraftOps.linkPredict(df, expr(step.path("a").asText()),
          expr(step.path("b").asText()),
          if (step.has("topK")) step.path("topK").asInt() else 15,
          if (step.has("maxDegree")) step.path("maxDegree").asInt()
          else Int.MaxValue)
      case "shardInterleave" =>
        // source-interleaved shard assignment (p13's verb):
        //   {"op": "shardInterleave", "id": "doc_id", "group": "source",
        //    "nShards": 8}
        GraftOps.shardInterleave(df, expr(step.path("id").asText()),
          expr(step.path("group").asText()),
          if (step.has("nShards")) step.path("nShards").asInt() else 8)
      case "quota" =>
        // source-quota cap (GraftOps.quotaSample): keeps at most
        // capPct% of the corpus per source, md5-deterministic picks,
        // helper columns dropped — the config author gets back the
        // capped corpus with the original schema:
        //   {"op": "quota", "id": "doc_id", "source": "source",
        //    "capPct": 15}
        GraftOps.quotaSample(df, expr(step.path("id").asText()),
          expr(step.path("source").asText()),
          if (step.has("capPct")) step.path("capPct").asInt() else 15)
          .filter(col("kept"))
          .drop("kept", "__src", "__quota_rank", "__quota", "__n_total")
      case "triangles" =>
        // triangle census over the frame-as-edge-list (g03's verb):
        //   {"op": "triangles", "a": "a", "b": "b"}
        GraftOps.triangleCensus(df, expr(step.path("a").asText()),
          expr(step.path("b").asText()))
      case "connectedComponents" =>
        // min-label components over the frame-as-edge-list (g04's verb):
        //   {"op": "connectedComponents", "a": "a", "b": "b"}
        GraftOps.connectedComponents(df, expr(step.path("a").asText()),
          expr(step.path("b").asText()))
      case "pagerank" =>
        // weighted PageRank over the frame-as-edge-list (g01's verb):
        //   {"op": "pagerank", "src": "a", "dst": "b",
        //    "weight": "1", "iters": 3}
        GraftOps.pagerank(df, expr(step.path("src").asText()),
          expr(step.path("dst").asText()),
          expr(if (step.has("weight")) step.path("weight").asText() else "1"),
          iters = if (step.has("iters")) step.path("iters").asInt() else 3)
      case "labelPropagation" =>
        // synchronous LPA communities over the frame-as-edge-list
        // (g14's verb): {"op": "labelPropagation", "a": "a", "b": "b",
        //  "rounds": 4}
        GraftOps.labelPropagation(df, expr(step.path("a").asText()),
          expr(step.path("b").asText()),
          if (step.has("rounds")) step.path("rounds").asInt() else 4)
      case "shortestPaths" =>
        // hop-bounded weighted shortest paths over the frame-as-edge-list
        // (g16's verb): {"op": "shortestPaths", "src": "a", "dst": "b",
        //  "weight": "w", "rounds": 4} — integer weights required (the
        //  verb packs cost*8+hops into one BIGINT)
        GraftOps.shortestPaths(df, expr(step.path("src").asText()),
          expr(step.path("dst").asText()),
          expr(step.path("weight").asText()),
          rounds =
            if (step.has("rounds")) step.path("rounds").asInt() else 4)
      case "conform" =>
        GraftOps.conform(df, step.path("schema").asText())
      case "profile" =>
        GraftOps.profile(df, strings(step.path("cols")))
      case "expect" =>
        // inline data-quality gate: runs ONE eager validation pass over
        // the frame-so-far when the spec compiles and throws if any rule
        // is violated (rules as "name: sql-predicate") — the deliberate
        // exception to the one-lazy-plan rule, because a gate that only
        // fires after the sink has written defeats its purpose
        val rules = step.path("rules").properties().asScala.map(e =>
          Expectations.Satisfies(e.getKey, expr(e.getValue.asText()))).toSeq
        Expectations.assertAll(df, rules)
        df
      case other => throw new IllegalArgumentException(s"unknown op '$other'")
    }
  }
}
