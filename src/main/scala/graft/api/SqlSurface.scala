package graft.api

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.Decimal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Plain-SQL surface for the operator library: the GraftOps verbs as
  * TABLE-VALUED functions, so a SQL-only user (spark-sql shell, JDBC,
  * notebook `%sql`) can run graft operators without touching Scala:
  *
  *   graft.api.SqlSurface.install(spark)   // or GraftExtensions
  *   spark.sql("""
  *     SELECT * FROM graft_near_dup_pairs('docs', 'doc_id', 'text', 0.5)
  *   """)
  *
  * Each TVF resolves its first argument as a table/view name against the
  * ACTIVE session's catalog and returns the verb's logical plan — the
  * result composes like any relation (joins, CTEs, further SQL), and
  * Catalyst optimizes across the boundary exactly as it does for the
  * Scala API. `graft_transform(json)` exposes the whole TransformSpec
  * step engine behind one SQL call, with table references resolved the
  * same way.
  *
  * Arguments must be literals (table/column names as strings): TVFs are
  * resolved at analysis time, before any row exists to read values from.
  */
object SqlSurface {

  private def bad(what: String, got: Expression): Nothing =
    throw new IllegalArgumentException(
      s"$what must be a literal, got ${got.sql}")

  private def str(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other                     => bad(s"$what (string)", other)
  }
  private def dbl(e: Expression, what: String): Double = e match {
    case Literal(d: Decimal, _)           => d.toDouble
    case Literal(n: java.lang.Number, _)  => n.doubleValue()
    case other                            => bad(s"$what (numeric)", other)
  }
  private def int(e: Expression, what: String): Int = e match {
    case Literal(i: java.lang.Integer, _) => i.intValue()
    case Literal(l: java.lang.Long, _)    => l.intValue()
    case Literal(d: Decimal, _)           => d.toInt
    case other                            => bad(s"$what (integer)", other)
  }

  private def table(name: String): DataFrame =
    SparkSession.active.table(name)
  private def plan(df: DataFrame): LogicalPlan = df.queryExecution.logical

  /** name -> (arity hint for the error message, plan builder). */
  val builders: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "graft_near_dup_pairs" -> {
      // "session" default: the TVF honors graft.neardup.strategy like
      // every other pair join in the library (README's one-switch claim)
      case Seq(t, id, tx, th) =>
        plan(GraftOps.nearDupPairs(table(str(t, "table")),
          col(str(id, "id")), col(str(tx, "text")), dbl(th, "threshold"),
          strategy = "session"))
      case Seq(t, id, tx, th, s) =>
        plan(GraftOps.nearDupPairs(table(str(t, "table")),
          col(str(id, "id")), col(str(tx, "text")), dbl(th, "threshold"),
          strategy = str(s, "strategy")))
      case args => throw new IllegalArgumentException(
        s"graft_near_dup_pairs(table, id, text, threshold[, strategy]): got ${args.size} args")
    },
    "graft_containment_pairs" -> {
      case Seq(t, id, tx, th) =>
        plan(GraftOps.containmentJoin(table(str(t, "table")),
          col(str(id, "id")), col(str(tx, "text")), dbl(th, "threshold")))
      case args => throw new IllegalArgumentException(
        s"graft_containment_pairs(table, id, text, threshold): got ${args.size} args")
    },
    "graft_dedup_manifest" -> {
      case Seq(t, id, tx, th) =>
        plan(GraftOps.dedupManifest(table(str(t, "table")),
          col(str(id, "id")), col(str(tx, "text")), dbl(th, "threshold")))
      case args => throw new IllegalArgumentException(
        s"graft_dedup_manifest(table, id, text, threshold): got ${args.size} args")
    },
    "graft_span_dedup" -> {
      case Seq(t, id, tx, w) =>
        plan(GraftOps.spanDedup(table(str(t, "table")),
          col(str(id, "id")), col(str(tx, "text")), int(w, "spanWords")))
      case args => throw new IllegalArgumentException(
        s"graft_span_dedup(table, id, text, span_words): got ${args.size} args")
    },
    "graft_gopher_filter" -> {
      case Seq(t, tx) =>
        plan(GraftOps.gopherFilter(table(str(t, "table")), col(str(tx, "text"))))
      case args => throw new IllegalArgumentException(
        s"graft_gopher_filter(table, text): got ${args.size} args")
    },
    "graft_kmeans" -> {
      case Seq(t, id, v, k, it) =>
        plan(GraftOps.kmeans(table(str(t, "table")),
          col(str(id, "id")), col(str(v, "vec")), int(k, "k"), int(it, "iters")))
      case args => throw new IllegalArgumentException(
        s"graft_kmeans(table, id, vec, k, iters): got ${args.size} args")
    },
    "graft_semantic_dedup" -> {
      case Seq(t, id, v, c, th) =>
        plan(GraftOps.semanticDedup(table(str(t, "table")),
          col(str(id, "id")), col(str(v, "vec")), col(str(c, "cluster")),
          dbl(th, "threshold")))
      case args => throw new IllegalArgumentException(
        s"graft_semantic_dedup(table, id, vec, cluster, threshold): got ${args.size} args")
    },
    "graft_global_topk" -> {
      case Seq(t, sc, tie, k) =>
        plan(GraftOps.globalTopK(table(str(t, "table")),
          str(sc, "score"), str(tie, "tie"), int(k, "k")))
      case args => throw new IllegalArgumentException(
        s"graft_global_topk(table, score, tie, k): got ${args.size} args")
    },
    "graft_sessionize" -> {
      case Seq(t, key, ts, gap) =>
        plan(GraftOps.sessionize(table(str(t, "table")),
          col(str(key, "key")), col(str(ts, "ts")), str(gap, "gap")))
      case Seq(t, key, ts, gap, tb) =>
        plan(GraftOps.sessionize(table(str(t, "table")),
          col(str(key, "key")), col(str(ts, "ts")), str(gap, "gap"),
          Seq(col(str(tb, "tiebreak")))))
      case args => throw new IllegalArgumentException(
        s"graft_sessionize(table, key, ts, gap[, tiebreak]): got ${args.size} args")
    },
    "graft_chunk" -> {
      case Seq(t, tx, cs, st) =>
        plan(GraftOps.chunk(table(str(t, "table")),
          col(str(tx, "text")), int(cs, "chunkSize"), int(st, "stride")))
      case args => throw new IllegalArgumentException(
        s"graft_chunk(table, text, chunk_size, stride): got ${args.size} args")
    },
    "graft_transform" -> {
      case Seq(j) => plan(TransformSpec.runSql(str(j, "spec json")))
      case args => throw new IllegalArgumentException(
        s"graft_transform(spec_json): got ${args.size} args")
    },
    "graft_triangles" -> {
      case Seq(t, a, b) =>
        plan(GraftOps.triangleCensus(table(str(t, "table")),
          col(str(a, "a")), col(str(b, "b"))))
      case args => throw new IllegalArgumentException(
        s"graft_triangles(table, a, b): got ${args.size} args")
    },
    "graft_connected_components" -> {
      case Seq(t, a, b) =>
        plan(GraftOps.connectedComponents(table(str(t, "table")),
          col(str(a, "a")), col(str(b, "b"))))
      case args => throw new IllegalArgumentException(
        s"graft_connected_components(table, a, b): got ${args.size} args")
    },
    "graft_pagerank" -> {
      case Seq(t, s, d, w) =>
        plan(GraftOps.pagerank(table(str(t, "table")),
          col(str(s, "src")), col(str(d, "dst")),
          org.apache.spark.sql.functions.expr(str(w, "weight"))))
      case Seq(t, s, d, w, it) =>
        plan(GraftOps.pagerank(table(str(t, "table")),
          col(str(s, "src")), col(str(d, "dst")),
          org.apache.spark.sql.functions.expr(str(w, "weight")),
          iters = int(it, "iters")))
      case args => throw new IllegalArgumentException(
        s"graft_pagerank(table, src, dst, weight[, iters]): got ${args.size} args")
    },
    "graft_label_propagation" -> {
      case Seq(t, a, b) =>
        plan(GraftOps.labelPropagation(table(str(t, "table")),
          col(str(a, "a")), col(str(b, "b"))))
      case Seq(t, a, b, r) =>
        plan(GraftOps.labelPropagation(table(str(t, "table")),
          col(str(a, "a")), col(str(b, "b")), int(r, "rounds")))
      case args => throw new IllegalArgumentException(
        s"graft_label_propagation(table, a, b[, rounds]): got ${args.size} args")
    },
    "graft_shortest_paths" -> {
      case Seq(t, s, d, w) =>
        plan(GraftOps.shortestPaths(table(str(t, "table")),
          col(str(s, "src")), col(str(d, "dst")),
          org.apache.spark.sql.functions.expr(str(w, "weight"))))
      case Seq(t, s, d, w, r) =>
        plan(GraftOps.shortestPaths(table(str(t, "table")),
          col(str(s, "src")), col(str(d, "dst")),
          org.apache.spark.sql.functions.expr(str(w, "weight")),
          rounds = int(r, "rounds")))
      case args => throw new IllegalArgumentException(
        s"graft_shortest_paths(table, src, dst, weight[, rounds]): got ${args.size} args")
    },
    "graft_fd_audit" -> {
      case Seq(t, det, dep) =>
        plan(GraftOps.fdAudit(table(str(t, "table")),
          col(str(det, "det")), col(str(dep, "dep")),
          s"${str(t, "table")}.${str(det, "det")}->${str(dep, "dep")}"))
      case args => throw new IllegalArgumentException(
        s"graft_fd_audit(table, det, dep): got ${args.size} args")
    },
    "graft_conversion_hazard" -> {
      case Seq(t, e, ts, c) =>
        plan(GraftOps.conversionHazard(table(str(t, "table")),
          col(str(e, "entity")), col(str(ts, "ts")),
          org.apache.spark.sql.functions.expr(str(c, "isConversion"))))
      case Seq(t, e, ts, c, md) =>
        plan(GraftOps.conversionHazard(table(str(t, "table")),
          col(str(e, "entity")), col(str(ts, "ts")),
          org.apache.spark.sql.functions.expr(str(c, "isConversion")),
          int(md, "maxDays")))
      case args => throw new IllegalArgumentException(
        s"graft_conversion_hazard(table, entity, ts, is_conversion[, max_days]): got ${args.size} args")
    },
    "graft_link_predict" -> {
      case Seq(t, a, b) =>
        plan(GraftOps.linkPredict(table(str(t, "table")),
          col(str(a, "a")), col(str(b, "b"))))
      case Seq(t, a, b, k) =>
        plan(GraftOps.linkPredict(table(str(t, "table")),
          col(str(a, "a")), col(str(b, "b")), int(k, "topK")))
      case args => throw new IllegalArgumentException(
        s"graft_link_predict(edges_table, a, b[, top_k]): got ${args.size} args")
    },
    "graft_substring_pairs" -> {
      case Seq(t, id, tx) =>
        plan(GraftOps.substringContainment(table(str(t, "table")),
          col(str(id, "id")), col(str(tx, "text"))))
      case args => throw new IllegalArgumentException(
        s"graft_substring_pairs(table, id, text): got ${args.size} args")
    },
    "graft_quota_sample" -> {
      case Seq(t, id, src) =>
        plan(GraftOps.quotaSample(table(str(t, "table")),
          col(str(id, "id")), col(str(src, "source"))))
      case Seq(t, id, src, cap) =>
        plan(GraftOps.quotaSample(table(str(t, "table")),
          col(str(id, "id")), col(str(src, "source")), int(cap, "capPct")))
      case args => throw new IllegalArgumentException(
        s"graft_quota_sample(table, id, source[, cap_pct]): got ${args.size} args")
    },
    "graft_snapshot_read" -> {
      case Seq(p) =>
        plan(graft.sources.SnapshotTable.read(SparkSession.active, str(p, "path")))
      case Seq(p, v) =>
        plan(graft.sources.SnapshotTable.read(SparkSession.active,
          str(p, "path"), int(v, "version")))
      case args => throw new IllegalArgumentException(
        s"graft_snapshot_read(path[, version]): got ${args.size} args")
    },
    // ---- round-6 surfaces ------------------------------------------
    "graft_delta_read" -> {
      case Seq(p) =>
        plan(graft.sources.DeltaRead.read(SparkSession.active, str(p, "path")))
      case Seq(p, v) =>
        plan(graft.sources.DeltaRead.read(SparkSession.active,
          str(p, "path"), int(v, "version").toLong))
      case args => throw new IllegalArgumentException(
        s"graft_delta_read(path[, version]): got ${args.size} args")
    },
    "graft_delta_changes" -> {
      // file-level change feed between two versions (_change_type
      // insert/delete; replay-exact, scans only the changed files)
      case Seq(p, f, t) =>
        plan(graft.sources.DeltaRead.changes(SparkSession.active,
          str(p, "path"), int(f, "fromVersion").toLong,
          int(t, "toVersion").toLong))
      case args => throw new IllegalArgumentException(
        s"graft_delta_changes(path, from_version, to_version): got " +
          s"${args.size} args")
    },
    "graft_iceberg_read" -> {
      case Seq(p) =>
        plan(graft.sources.IcebergRead.read(SparkSession.active,
          str(p, "path")))
      case Seq(p, v) =>
        plan(graft.sources.IcebergRead.read(SparkSession.active,
          str(p, "path"), int(v, "snapshotId").toLong))
      case args => throw new IllegalArgumentException(
        s"graft_iceberg_read(path[, snapshot_id]): got ${args.size} args")
    },
    "graft_iceberg_changes" -> {
      // incremental snapshot-range feed (_change_type insert/delete,
      // _snapshot_id attribution; replay-exact, scans only changed
      // files) — the Iceberg mirror of graft_delta_changes
      case Seq(p, f, t) =>
        plan(graft.sources.IcebergRead.changes(SparkSession.active,
          str(p, "path"), int(f, "fromSnapshotId").toLong,
          int(t, "toSnapshotId").toLong))
      case args => throw new IllegalArgumentException(
        s"graft_iceberg_changes(path, from_snapshot_id, " +
          s"to_snapshot_id): got ${args.size} args")
    },
    "graft_hudi_read" -> {
      case Seq(p) =>
        plan(graft.sources.HudiRead.read(SparkSession.active,
          str(p, "path")))
      case Seq(p, ts) =>
        plan(graft.sources.HudiRead.read(SparkSession.active,
          str(p, "path"), str(ts, "asOfInstant")))
      case args => throw new IllegalArgumentException(
        s"graft_hudi_read(path[, as_of_instant]): got ${args.size} args")
    },
    "graft_bpe_tokens" -> {
      case Seq(t, id, tx, n) =>
        val tb = table(str(t, "table"))
        val merges = GraftOps.bpeTrain(tb, col(str(tx, "text")),
          numMerges = int(n, "numMerges"))
        plan(GraftOps.bpeTokenCounts(tb, col(str(id, "id")),
          col(str(tx, "text")), merges))
      case args => throw new IllegalArgumentException(
        s"graft_bpe_tokens(table, id, text, num_merges): got ${args.size} args")
    },
    "graft_geo_nearest" -> {
      case Seq(lt, lid, llat, llon, rt, rid, rlat, rlon) =>
        plan(GraftOps.geoNearest(
          table(str(lt, "left")), col(str(lid, "lid")),
          col(str(llat, "llat")), col(str(llon, "llon")),
          table(str(rt, "right")), col(str(rid, "rid")),
          col(str(rlat, "rlat")), col(str(rlon, "rlon"))))
      case args => throw new IllegalArgumentException(
        s"graft_geo_nearest(ltable, lid, llat, llon, rtable, rid, rlat, " +
          s"rlon): got ${args.size} args")
    },
    "graft_kaplan_meier" -> {
      case Seq(t, e, ts, ev) =>
        plan(GraftOps.kaplanMeier(table(str(t, "table")),
          col(str(e, "entity")), col(str(ts, "ts")),
          org.apache.spark.sql.functions.expr(str(ev, "isEvent"))))
      case args => throw new IllegalArgumentException(
        s"graft_kaplan_meier(table, entity, ts, is_event): got ${args.size} args")
    },
    "graft_rolling_trend" -> {
      case Seq(t, g, dy, c) =>
        plan(GraftOps.rollingTrend(table(str(t, "table")),
          col(str(g, "group")), col(str(dy, "day")),
          org.apache.spark.sql.functions.expr(str(c, "cents"))))
      case Seq(t, g, dy, c, wd) =>
        plan(GraftOps.rollingTrend(table(str(t, "table")),
          col(str(g, "group")), col(str(dy, "day")),
          org.apache.spark.sql.functions.expr(str(c, "cents")),
          int(wd, "windowDays")))
      case args => throw new IllegalArgumentException(
        s"graft_rolling_trend(table, group, day, cents[, window_days]): got ${args.size} args")
    },
    // zone-map-pruned snapshot read: opens only files whose manifest
    // stats can satisfy the predicate (SnapshotTable.readWhere)
    "graft_snapshot_where" -> {
      case Seq(p, pred) =>
        plan(graft.sources.SnapshotTable.readWhere(SparkSession.active,
          str(p, "path"), str(pred, "predicate")))
      case Seq(p, pred, v) =>
        plan(graft.sources.SnapshotTable.readWhere(SparkSession.active,
          str(p, "path"), str(pred, "predicate"), int(v, "version")))
      case args => throw new IllegalArgumentException(
        s"graft_snapshot_where(path, predicate[, version]): got ${args.size} args")
    },
  )

  /** Register every TVF on an existing session (idempotent) — the same
    * runtime path Register.all uses for the scalar functions. Sessions
    * built `.withExtensions(new GraftExtensions)` get them automatically.
    */
  def install(spark: SparkSession): Unit = {
    graft.functions.Register.all(spark)
    builders.foreach { case (name, b) =>
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  /** The injectTableFunction tuples for [[graft.plans.GraftExtensions]]. */
  def injectables: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] =
    builders.map { case (name, b) =>
      (FunctionIdentifier(name), new ExpressionInfo("graft", name), b)
    }
}
