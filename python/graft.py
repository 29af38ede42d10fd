"""Minimal PySpark facade for the graft Spark library.

graft is a Scala library; its operators build ordinary Catalyst plans, so
a Python user needs nothing more than the jar on the driver classpath and
these thin py4j shims. Two surfaces cover the config-first audience:

  1. ``register(spark)`` exposes every custom graft SQL function
     (minhash_signature, simhash64, cosine_sim, dot_product,
     jaro_winkler, rolling_fingerprint, cosine_lsh_keys) to plain
     ``spark.sql`` — after this the whole library's expression layer is
     usable from SQL with zero further Python.

  2. ``transform(spark, spec_json, tables)`` runs a declarative
     TransformSpec JSON job (the p03 surface): 20+ step verbs
     (filter/withColumn/join/agg/dedup/nearDedup/spanDedup/sessionize/
     split/expect/...) compiled to ONE lazy plan that Catalyst
     optimizes across step boundaries.

A few high-value verbs are wrapped directly; anything else in
graft.api.GraftOps can be reached the same way via ``_graft_ops(spark)``.

Usage::

    spark = (SparkSession.builder
        .config("spark.driver.extraClassPath", "<graft classes or jar>")
        .getOrCreate())
    import graft
    graft.register(spark)
    out = graft.transform(spark, spec_json, {"documents": docs})

See tools/pysmoke.py for a complete end-to-end example.
"""

from pyspark.sql import DataFrame


def _jvm(spark):
    return spark._jvm


def _to_jdf_map(spark, tables):
    jmap = _jvm(spark).java.util.HashMap()
    for name, df in tables.items():
        jmap.put(name, df._jdf)
    return jmap


def _wrap(spark, jdf):
    return DataFrame(jdf, spark)


def _col(spark, name):
    return _jvm(spark).org.apache.spark.sql.functions.col(name)


def _col_expr(spark, sql_expr):
    return _jvm(spark).org.apache.spark.sql.functions.expr(sql_expr)


def _graft_ops(spark):
    return _jvm(spark).graft.api.GraftOps


def _to_seq(spark, items):
    """Python list -> scala Seq (py4j can't build one implicitly)."""
    return _jvm(spark).org.apache.spark.api.python.PythonUtils.toSeq(items)


def _default(obj, method, n):
    """Fetch a Scala default-argument value (method$default$n)."""
    return getattr(obj, "%s$default$%d" % (method, n))()


def register(spark):
    """Register every graft custom SQL function on the session."""
    _jvm(spark).graft.functions.Register.all(spark._jsparkSession)


def install_sql(spark):
    """Register the scalar functions AND the operator table-valued
    functions (graft_near_dup_pairs, graft_transform, ...), so the whole
    library is reachable from plain ``spark.sql``."""
    _jvm(spark).graft.api.SqlSurface.install(spark._jsparkSession)


def transform(spark, spec_json, tables, allow_inline_sources=False):
    """Run a TransformSpec JSON job; ``tables`` maps names -> DataFrames.

    ``allow_inline_sources``: opt-in for specs that name their own
    filesystem paths (``parquet:/...``, ``snapshot:/...@v``); the default
    is catalog-only so untrusted specs cannot read arbitrary paths.
    """
    jdf = _jvm(spark).graft.api.TransformSpec.run(
        spec_json, _to_jdf_map(spark, tables), allow_inline_sources)
    return _wrap(spark, jdf)


def near_dup_pairs(spark, df, id_col, text_col, threshold,
                   n=3, strategy="shingle"):
    """Verified near-duplicate pairs (id_a, id_b, shared, jaccard).

    strategy: "shingle" (exact shared-shingle candidates), "lsh"
    (MinHash-banded candidates — the 100 TB path), or "session"
    (spark conf ``graft.neardup.strategy``).
    """
    jdf = _graft_ops(spark).nearDupPairs(
        df._jdf, _col(spark, id_col), _col(spark, text_col),
        float(threshold), int(n), strategy)
    return _wrap(spark, jdf)


def dedup_manifest(spark, df, id_col, text_col, threshold=0.5,
                   strategy="session"):
    """Per-row dedup disposition: (id, status, ref_id)."""
    jdf = _graft_ops(spark).dedupManifest(
        df._jdf, _col(spark, id_col), _col(spark, text_col),
        float(threshold), strategy)
    return _wrap(spark, jdf)


def kmeans(spark, df, id_col, vec_col, k, iters=2):
    """Deterministic distributed k-means: returns (id, cluster)."""
    jdf = _graft_ops(spark).kmeans(
        df._jdf, _col(spark, id_col), _col(spark, vec_col),
        int(k), int(iters))
    return _wrap(spark, jdf)


def global_top_k(spark, df, score_col, tie_col, k):
    """Exact global top-k with rank, without a single-task sort."""
    jdf = _graft_ops(spark).globalTopK(df._jdf, score_col, tie_col, int(k))
    return _wrap(spark, jdf)


def fd_audit(spark, df, det_col, dep_col, label):
    """Functional-dependency audit: does det determine dep?

    Returns (candidate, n_det, n_violating, max_fanout, holds).
    """
    jdf = _graft_ops(spark).fdAudit(
        df._jdf, _col(spark, det_col), _col(spark, dep_col), label)
    return _wrap(spark, jdf)


def conversion_hazard(spark, df, entity_col, ts_col, is_conversion_expr,
                      max_days=14):
    """Censored discrete time-to-conversion hazard curve.

    ``is_conversion_expr`` is a SQL boolean expression over the frame,
    e.g. "event_type = 'purchase'".
    """
    jdf = _graft_ops(spark).conversionHazard(
        df._jdf, _col(spark, entity_col), _col(spark, ts_col),
        _col_expr(spark, is_conversion_expr), int(max_days))
    return _wrap(spark, jdf)


def link_predict(spark, edges_df, a_col, b_col, top_k=15,
                 max_degree=2147483647):
    """Common-neighbor/Jaccard link prediction over an a<b edge frame.

    ``max_degree`` caps per-vertex adjacency before the wedge join —
    the dense-graph mitigation (SURVEY section 6); default = exact.
    """
    jdf = _graft_ops(spark).linkPredict(
        edges_df._jdf, _col(spark, a_col), _col(spark, b_col),
        int(top_k), int(max_degree))
    return _wrap(spark, jdf)


def shard_interleave(spark, df, id_col, group_col, n_shards=8):
    """Deterministic source-interleaved shard assignment (adds 'shard')."""
    jdf = _graft_ops(spark).shardInterleave(
        df._jdf, _col(spark, id_col), _col(spark, group_col), int(n_shards))
    return _wrap(spark, jdf)


def quota_sample(spark, df, id_col, source_col, cap_pct=15):
    """Source-quota cap: annotates rows with a deterministic within-source
    rank, the corpus-wide quota (cap_pct% of total rows) and a 'kept'
    flag; filter on 'kept' to get the capped corpus."""
    jdf = _graft_ops(spark).quotaSample(
        df._jdf, _col(spark, id_col), _col(spark, source_col), int(cap_pct))
    return _wrap(spark, jdf)


def sessionize(spark, df, key_col, ts_col, gap="30 minutes",
               tiebreak_cols=()):
    """Gap-based sessionization: appends per-key 1-based ``session_id``.

    Pass ``tiebreak_cols`` (e.g. an event id) whenever the timestamp can
    repeat within a key — equal timestamps otherwise get
    partition-dependent ordering.
    """
    jdf = _graft_ops(spark).sessionize(
        df._jdf, _col(spark, key_col), _col(spark, ts_col), gap,
        _to_seq(spark, [_col(spark, c) for c in tiebreak_cols]))
    return _wrap(spark, jdf)


def asof_join(spark, left, right, left_key, right_key, left_time,
              right_time):
    """As-of join: each left row gets the latest right row at-or-before
    its time, per key (the custom plan — range-partition + merge, no
    all-pairs blowup)."""
    jdf = _jvm(spark).graft.plans.AsofJoin.asofJoin(
        left._jdf, right._jdf, left_key, right_key, left_time, right_time)
    return _wrap(spark, jdf)


def expect_all(spark, df, rules):
    """Data-quality report: ``rules`` is {name: sql_predicate}; returns
    (rule, n_rows, violations, pass) — one aggregate pass, no throw
    (filter on ``pass == False`` and act)."""
    jmap = _jvm(spark).java.util.LinkedHashMap()
    for name, predicate in rules.items():
        jmap.put(name, predicate)
    jdf = _jvm(spark).graft.api.Expectations.evaluateSql(df._jdf, jmap)
    return _wrap(spark, jdf)


def profile(spark, df, cols):
    """Per-column profile (count/nulls/min/max/stable mean) in ONE scan:
    returns a row per column."""
    jdf = _graft_ops(spark).profile(df._jdf, _to_seq(spark, list(cols)))
    return _wrap(spark, jdf)


def gopher_filter(spark, df, text_col):
    """Gopher-style quality rule suite over a text column: appends exact
    rule metrics, a per-rule failure bitmask, and a keep flag."""
    ops = _graft_ops(spark)
    jdf = ops.gopherFilter(
        df._jdf, _col(spark, text_col),
        _default(ops, "gopherFilter", 3), _default(ops, "gopherFilter", 4),
        _default(ops, "gopherFilter", 5))
    return _wrap(spark, jdf)


def span_dedup(spark, df, id_col, text_col, span_words=10):
    """Span-level dedup: (id, n_spans, n_kept, text_kept) with repeated
    cross-document spans removed (first occurrence wins)."""
    jdf = _graft_ops(spark).spanDedup(
        df._jdf, _col(spark, id_col), _col(spark, text_col),
        int(span_words))
    return _wrap(spark, jdf)


def global_rank(spark, df, order_cols):
    """Exact global 1-based rank in ``order_cols`` order without a
    single-task sort (range partition + offset prefix-sum).

    ``order_cols`` entries may be SQL expressions, optionally suffixed
    with " DESC" (e.g. "n DESC", "word")."""
    def ordered(c):
        if c.upper().endswith(" DESC"):
            return _col_expr(spark, c[:-5]).desc()
        if c.upper().endswith(" ASC"):
            return _col_expr(spark, c[:-4]).asc()
        return _col_expr(spark, c)
    jdf = _graft_ops(spark).globalRank(
        df._jdf, _to_seq(spark, [ordered(c) for c in order_cols]))
    return _wrap(spark, jdf)


def skyline2d(spark, df, max_col, min_col):
    """2-D Pareto frontier (maximize ``max_col``, minimize ``min_col``):
    returns the non-dominated (max_col, min_col, n_rows) cells."""
    jdf = _graft_ops(spark).skyline2d(df._jdf, max_col, min_col)
    return _wrap(spark, jdf)


def pagerank(spark, edges, src_col, dst_col, weight_expr="1", iters=3):
    """Weighted PageRank over a (src, dst, weight) edge frame: (node, pr),
    12-dp rounded per iteration, dangling mass redistributed."""
    ops = _graft_ops(spark)
    jdf = ops.pagerank(edges._jdf, _col(spark, src_col),
                       _col(spark, dst_col), _col_expr(spark, weight_expr),
                       _default(ops, "pagerank", 5), int(iters),
                       _default(ops, "pagerank", 7))
    return _wrap(spark, jdf)


def connected_components(spark, edges, a_col, b_col):
    """Min-label connected components over an undirected edge frame:
    (node, cluster_id), cluster_id = component minimum."""
    jdf = _graft_ops(spark).connectedComponents(
        edges._jdf, _col(spark, a_col), _col(spark, b_col))
    return _wrap(spark, jdf)


def triangles(spark, edges, a_col, b_col):
    """Triangle census over an undirected edge frame: one row
    (n_nodes, n_edges, n_wedges, n_triangles, gcc)."""
    jdf = _graft_ops(spark).triangleCensus(
        edges._jdf, _col(spark, a_col), _col(spark, b_col))
    return _wrap(spark, jdf)


def label_propagation(spark, edges, a_col, b_col, rounds=4):
    """Deterministic synchronous label-propagation communities over an
    (a, b) undirected edge frame. Returns (node, lbl)."""
    jdf = _graft_ops(spark).labelPropagation(
        edges._jdf, _col(spark, a_col), _col(spark, b_col), int(rounds))
    return _wrap(spark, jdf)


def shortest_paths(spark, edges, src_col, dst_col, weight_col, rounds=4):
    """Hop-bounded weighted shortest paths (Bellman-Ford, ``rounds``
    relaxations) over a directed (src, dst, weight) edge frame with
    INTEGER weights. Returns (src, dst, cost, hops) for every reachable
    pair — (cost, hops) minimized lexicographically, exactly (the verb
    packs both into one BIGINT so min() is a combinable integer
    aggregate)."""
    jdf = _graft_ops(spark).shortestPaths(
        edges._jdf, _col(spark, src_col), _col(spark, dst_col),
        _col(spark, weight_col), None, int(rounds))
    return _wrap(spark, jdf)


def kaplan_meier(spark, df, entity_col, ts_col, is_event_expr):
    """Right-censored Kaplan-Meier survival curve.

    ``is_event_expr`` is a SQL boolean over the frame, e.g.
    "event_type = 'purchase'"; entities without an event are censored
    at their last observation. Returns one row per duration with
    (t, n_risk, n_events, n_censored, km_survival).
    """
    jdf = _graft_ops(spark).kaplanMeier(
        df._jdf, _col(spark, entity_col), _col(spark, ts_col),
        _col_expr(spark, is_event_expr))
    return _wrap(spark, jdf)


def rolling_trend(spark, df, group_col, day_col, cents_expr,
                  window_days=28):
    """Trailing-window OLS slope of a daily integer-cents total, per
    group. ``cents_expr`` is a SQL expression yielding exact integer
    cents, e.g. "CAST(round(price * 100, 0) AS BIGINT)". Returns
    (grp, day, n_days, cents, slope_micro, slope_per_day).
    """
    jdf = _graft_ops(spark).rollingTrend(
        df._jdf, _col(spark, group_col), _col(spark, day_col),
        _col_expr(spark, cents_expr), int(window_days))
    return _wrap(spark, jdf)


def bpe_train(spark, df, text_col, num_merges=32, vocab_cap=20000):
    """Train a BPE merges table (rank, l, r) from a text corpus.
    Deterministic (partition-independent); training touches only the
    word-frequency table."""
    jdf = _graft_ops(spark).bpeTrain(
        df._jdf, _col(spark, text_col), int(num_merges), int(vocab_cap))
    return _wrap(spark, jdf)


def bpe_token_counts(spark, df, id_col, text_col, merges):
    """Per-row (id, n_words, n_tokens) under a trained merges table —
    real subword token accounting (distinct words encoded once)."""
    jdf = _graft_ops(spark).bpeTokenCounts(
        df._jdf, _col(spark, id_col), _col(spark, text_col), merges._jdf)
    return _wrap(spark, jdf)


def dedup_artifacts(spark, df, id_col, text_col, path, threshold=0.5):
    """Materialize the dedup-artifact trio (pairs / labels / manifest)
    as SnapshotTables under ``path`` — one cleaning pass, every audit
    reads. Set spark conf ``graft.dedup.artifacts`` to route the
    corpus-reading operators through the artifacts."""
    jdf = _graft_ops(spark).dedupArtifacts(
        df._jdf, _col(spark, id_col), _col(spark, text_col), path,
        float(threshold), "session")
    return _wrap(spark, jdf)


def graph_artifacts(spark, df, basket_col, item_col, path, min_weight=2):
    """Materialize the graph-artifact pair (co-purchase ``pairs`` +
    component ``cc_labels``) as SnapshotTables under ``path`` — the
    fact-scale projection paid once, every graph analytic reads. Set
    spark conf ``graft.graph.artifacts`` to route the graph operators
    through the artifacts."""
    jdf = _graft_ops(spark).graphArtifacts(
        df._jdf, _col(spark, basket_col), _col(spark, item_col), path,
        int(min_weight))
    return _wrap(spark, jdf)


def update_graph_artifacts(spark, df, basket_col, item_col, path,
                           min_weight=2):
    """Incrementally ingest a batch of WHOLE NEW baskets into existing
    graph artifacts: pair counts key-sum via copy-on-write upsert,
    components rerun over the merged metadata-sized pair table.
    Refuses batches whose basket keys were already projected (pair
    counts are per-basket — only whole new baskets add exactly)."""
    jdf = _graft_ops(spark).updateGraphArtifacts(
        df._jdf, _col(spark, basket_col), _col(spark, item_col), path,
        int(min_weight))
    return _wrap(spark, jdf)


def ann_index_build(spark, df, id_col, vec_col, path, k, iters=2):
    """Build a persisted IVF index (centroids + cell-clustered rows)."""
    jdf = _graft_ops(spark).annIndexBuild(
        df._jdf, _col(spark, id_col), _col(spark, vec_col), path,
        int(k), int(iters))
    return _wrap(spark, jdf)


def ann_search(spark, path, queries, q_id, q_vec, nprobe, top_k=10):
    """Search a persisted IVF index: zone-map-pruned cell reads;
    nprobe = k is exact."""
    jdf = _graft_ops(spark).annSearch(
        spark._jsparkSession, path, queries._jdf, _col(spark, q_id),
        _col(spark, q_vec), int(nprobe), int(top_k))
    return _wrap(spark, jdf)


def update_dedup_artifacts(spark, new_docs, id_col, text_col, path,
                           threshold=0.5):
    """Incremental artifact update: a NEW batch (ids above all existing
    ids) candidates against the stored signature index — the existing
    corpus is never re-shingled. Pairs/signatures/docmeta/manifest
    append; labels are replaced by a CC rerun over the pair table."""
    jdf = _graft_ops(spark).updateDedupArtifacts(
        new_docs._jdf, _col(spark, id_col), _col(spark, text_col), path,
        float(threshold))
    return _wrap(spark, jdf)


def geo_nearest(spark, left, l_id, l_lat, l_lon, right, r_id, r_lat, r_lon):
    """Density-adaptive cell-blocked nearest neighbor (micro-degree
    int coords): (left_id, right_id, dist_m, n_candidates, grid_cells).
    """
    jdf = _graft_ops(spark).geoNearest(
        left._jdf, _col(spark, l_id), _col(spark, l_lat), _col(spark, l_lon),
        right._jdf, _col(spark, r_id), _col(spark, r_lat), _col(spark, r_lon))
    return _wrap(spark, jdf)


def delta_read(spark, path, version=-1):
    """Read-only Delta Lake table read (public transaction-log protocol;
    time travel via ``version``)."""
    jdf = _jvm(spark).graft.sources.DeltaRead.read(
        spark._jsparkSession, path, int(version))
    return _wrap(spark, jdf)


def delta_read_where(spark, path, predicate, version=-1):
    """Delta read with file-level stats skipping; equals
    read+filter exactly (pruning is conservative-sound)."""
    jdf = _jvm(spark).graft.sources.DeltaRead.readWhere(
        spark._jsparkSession, path, predicate, int(version))
    return _wrap(spark, jdf)


def delta_create(spark, df, path, partition_by=None):
    """Create a Delta table (append-only writer; public protocol).
    ``partition_by`` declares hive-layout partition columns."""
    if partition_by:
        return _jvm(spark).graft.sources.DeltaWrite.create(
            df._jdf, path, _to_seq(spark, list(partition_by)))
    return _jvm(spark).graft.sources.DeltaWrite.create(df._jdf, path)


def delta_append(spark, df, path, merge_schema=False):
    """Append to a Delta table with optimistic-concurrency commits.
    ``merge_schema=True`` allows ADDITIVE evolution: new columns append
    nullable (a metaData action updates the schema in the same commit);
    old files surface NULL for them with zero rewrites."""
    return _jvm(spark).graft.sources.DeltaWrite.append(
        df._jdf, path, bool(merge_schema))


def delta_append_batch(spark, df, path, app_id, batch_id):
    """EXACTLY-ONCE append into a Delta table: the commit carries the
    protocol's txn action {appId, version=batch_id}; a replayed batch id
    is detected against the table's per-app watermark and skipped."""
    return _jvm(spark).graft.sources.DeltaWrite.appendBatch(
        df._jdf, path, app_id, int(batch_id))


def delta_upsert_batch(spark, df, path, keys, app_id, batch_id):
    """EXACTLY-ONCE upsert (MERGE) into a Delta table: the commit carries
    the protocol's txn action {appId, version=batch_id} — a replayed
    batch is a detected no-op, and an empty batch still publishes its
    watermark. The foreachBatch body of a streaming CDC mirror."""
    return _jvm(spark).graft.sources.DeltaWrite.upsertBatch(
        df._jdf, path, _to_seq(spark, list(keys)), app_id, int(batch_id))


def delta_upsert(spark, df, path, keys):
    """Copy-on-write MERGE into a Delta table: rows sharing ``keys``
    are replaced, fresh keys insert, in one atomic commit. Only files
    actually holding matched keys are rewritten (stats-pruned plan)."""
    return _jvm(spark).graft.sources.DeltaWrite.upsert(
        df._jdf, path, _to_seq(spark, list(keys)))


def delta_delete(spark, path, predicate):
    """Copy-on-write DELETE on a Delta table (SQL semantics: rows where
    the predicate is NULL are kept). Only files holding matches are
    rewritten."""
    return _jvm(spark).graft.sources.DeltaWrite.delete(
        spark._jsparkSession, path, predicate)


def delta_changes(spark, path, from_version, to_version):
    """ROW-LEVEL change feed between two Delta versions (per-commit CDF
    semantics): commits with cdc files serve their minimal row diffs
    (delete / update_preimage / update_postimage / insert), others
    derive from dataChange adds/removes; every row carries
    ``_change_type`` and ``_commit_version``. Replay-exact as multiset
    algebra. Scans only changed/cdc files."""
    jdf = _jvm(spark).graft.sources.DeltaRead.changes(
        spark._jsparkSession, path, int(from_version), int(to_version))
    return _wrap(spark, jdf)


def iceberg_create(spark, df, path, partition_by=None):
    """Create an Iceberg table (public table spec, format-version 2;
    spec-complete v2 metadata). ``partition_by`` declares
    identity-transform partition fields (data files split one partition
    tuple per file). Returns the snapshot id (1)."""
    if partition_by:
        return _jvm(spark).graft.sources.IcebergWrite.create(
            df._jdf, path, _to_seq(spark, list(partition_by)))
    return _jvm(spark).graft.sources.IcebergWrite.create(df._jdf, path)


def iceberg_append(spark, df, path, merge_schema=False):
    """Append a snapshot to an Iceberg table with optimistic-concurrency
    metadata commits. ``merge_schema=True`` allows ADDITIVE evolution:
    new columns get fresh field ids and a fresh schema-id; old files
    surface NULL. Returns the new snapshot id."""
    return _jvm(spark).graft.sources.IcebergWrite.append(
        df._jdf, path, bool(merge_schema))


def iceberg_delete(spark, path, predicate):
    """Merge-on-read DELETE on an Iceberg table: emits v2 position
    delete files (no data-file rewrite); prior snapshots stay intact.
    Returns the new snapshot id."""
    return _jvm(spark).graft.sources.IcebergWrite.delete(
        spark._jsparkSession, path, predicate)


def iceberg_upsert(spark, df, path, keys):
    """Merge-on-read UPSERT into an Iceberg table: one snapshot carries
    an equality-delete file on ``keys`` plus the source rows — prior
    versions of the keys vanish, the same commit's inserts survive, no
    data-file rewrite (cost is O(source), not O(table))."""
    return _jvm(spark).graft.sources.IcebergWrite.upsert(
        df._jdf, path, _to_seq(spark, list(keys)))


def iceberg_append_batch(spark, df, path, app_id, batch_id):
    """EXACTLY-ONCE append into an Iceberg table: the per-app watermark
    rides the table properties (graft.txn.<app_id>) in the same atomic
    metadata commit; replayed batch ids are detected no-ops."""
    return _jvm(spark).graft.sources.IcebergWrite.appendBatch(
        df._jdf, path, app_id, int(batch_id))


def delta_optimize(spark, path, target_bytes=128 * 1024 * 1024,
                   zorder_by=()):
    """OPTIMIZE a Delta table: bin-packing compaction per partition
    tuple; files carrying deletion vectors fold them (DV-applied
    rewrite). The commit is pure reorganization (dataChange=false).
    With zorder_by (exactly two numeric columns), the Z-ORDER layout
    rewrite: every group re-lands sorted on the Morton interleave so
    range predicates on either dimension prune to 1-of-N files.
    Returns the committed version (or the current one if nothing
    qualified)."""
    return _jvm(spark).graft.sources.DeltaWrite.optimize(
        spark._jsparkSession, path, int(target_bytes),
        _to_seq(spark, list(zorder_by)))


def delta_delete_dv(spark, path, predicate):
    """Merge-on-read DELETE: matched files get a deletion vector (the
    union of any existing mask and the fresh matches) instead of a
    rewrite — O(bitmap bytes), never O(matched files' bytes). Upgrades
    a legacy protocol to table features in the same commit. Returns
    the committed version (or the current one when nothing newly
    matched)."""
    return _jvm(spark).graft.sources.DeltaWrite.deleteDv(
        spark._jsparkSession, path, predicate)


def delta_delete_dv_batch(spark, path, predicate, app_id, batch_id):
    """Exactly-once streaming DV delete: a replayed micro-batch id <=
    the table's per-app txn watermark is a detected no-op even when
    the predicate would newly match; a no-match batch still publishes
    its watermark in an empty commit."""
    return _jvm(spark).graft.sources.DeltaWrite.deleteDvBatch(
        spark._jsparkSession, path, predicate, app_id, int(batch_id))


def delta_upsert_dv(spark, df, path, keys):
    """Merge-on-read MERGE: matched table rows masked via deletion
    vectors on their files, the full source landing as a fresh
    segment — O(source + bitmap bytes)."""
    return _jvm(spark).graft.sources.DeltaWrite.upsertDv(
        df._jdf, path, _to_seq(spark, list(keys)))


def delta_delete_dv_keys(spark, df, path, keys):
    """Merge-on-read DELETE BY KEYS (the forget-queue shape): mask every
    row whose key tuple appears in ``df`` — a distributed semi-join,
    never a predicate string, so the key set can be millions of rows."""
    return _jvm(spark).graft.sources.DeltaWrite.deleteDvKeys(
        df._jdf, path, _to_seq(spark, list(keys)))


def delta_sync(spark, delta_path, snapshot_path, keys,
               bootstrap_version=-1):
    """Incremental Delta -> SnapshotTable mirror driven by the
    row-level change feed: reads only changed/cdc files, collapses to
    the last state per key, and lands one exactly-once CDC commit (the
    sync watermark rides the target's transaction state). Returns the
    Delta version the target is now synced to."""
    return _jvm(spark).graft.sources.DeltaSync.sync(
        spark._jsparkSession, delta_path, snapshot_path,
        _to_seq(spark, list(keys)), int(bootstrap_version))


def iceberg_rollback(spark, path, snapshot_id):
    """Roll an Iceberg table back to a prior snapshot (metadata-only
    commit: no data or history touched, so the rollback is itself
    revertible; reads serve the old snapshot's own schema). Refuses
    loudly if the snapshot was expired. Returns the new metadata
    version."""
    return _jvm(spark).graft.sources.IcebergWrite.rollbackTo(
        spark._jsparkSession, path, int(snapshot_id))


def iceberg_expire_snapshots(spark, path, keep_last,
                             orphan_retain_millis=7 * 24 * 3600 * 1000):
    """Expire all but the last ``keep_last`` Iceberg snapshots and
    delete storage no kept snapshot can reach (manifest lists,
    manifests, expired-only data files, and mtime-gated crash
    orphans). Returns the number of files deleted."""
    return _jvm(spark).graft.sources.IcebergWrite.expireSnapshots(
        spark._jsparkSession, path, int(keep_last),
        int(orphan_retain_millis))


def delta_restore(spark, path, version):
    """RESTORE a Delta table to a prior version as a NEW commit:
    files live then but not now are re-added verbatim (refusing
    loudly if vacuum already deleted their bytes), files live now but
    not then get remove tombstones, and the old metaData is re-emitted
    when schema/partitioning/configuration drifted. History is kept -
    time travel to pre-restore versions still works. Returns the
    committed version (or the current one when already identical)."""
    return _jvm(spark).graft.sources.DeltaWrite.restore(
        spark._jsparkSession, path, int(version))


def delta_vacuum(spark, path, retain_millis=-1):
    """VACUUM a Delta table: delete data/DV files no reader can reach
    (tombstone older than the retention window, or never-logged crash
    orphans past it). Returns the number of files deleted."""
    return _jvm(spark).graft.sources.DeltaWrite.vacuum(
        spark._jsparkSession, path, int(retain_millis))


def iceberg_read(spark, path, snapshot_id=-1):
    """Read-only Apache Iceberg table read (public table spec; time
    travel via ``snapshot_id``)."""
    jdf = _jvm(spark).graft.sources.IcebergRead.read(
        spark._jsparkSession, path, int(snapshot_id))
    return _wrap(spark, jdf)


def iceberg_changes(spark, path, from_snapshot_id, to_snapshot_id):
    """Incremental change feed between two Iceberg snapshots (file
    algebra per consecutive snapshot pair): added files serve inserts,
    removed files deletes, NEW delete files surface exactly the rows
    they kill from kept files; every row carries ``_change_type`` and
    ``_snapshot_id``. Replay-exact as multisets ((from + inserts) -
    deletes == to). Scans only changed/touched files."""
    jdf = _jvm(spark).graft.sources.IcebergRead.changes(
        spark._jsparkSession, path, int(from_snapshot_id),
        int(to_snapshot_id))
    return _wrap(spark, jdf)


def iceberg_delete_dv(spark, path, predicate):
    """DELETE rows matching the SQL predicate by authoring Iceberg v3
    DELETION VECTORS (puffin-stored roaring masks, one blob per
    affected data file; a re-mask replaces the file's DV per the v3
    at-most-one rule). No data files are rewritten."""
    return _jvm(spark).graft.sources.IcebergWrite.deleteDv(
        spark._jsparkSession, path, predicate)


def iceberg_delete_keys(spark, df, path, keys):
    """Pure equality-delete snapshot (the forget-queue shape): one
    content=2 delete file of the key tuples at a fresh sequence — no
    table scan, no data file; prior versions of the keys vanish below
    that sequence at O(keys) cost regardless of table size."""
    return _jvm(spark).graft.sources.IcebergWrite.deleteKeys(
        df._jdf, path, _to_seq(spark, list(keys)))


def iceberg_rewrite_data_files(spark, path,
                               target_bytes=128 * 1024 * 1024,
                               sort_by=()):
    """Bin-pack live data files smaller than target_bytes into
    ~target_bytes files in one replace snapshot (the Iceberg OPTIMIZE
    analog); rewritten rows carry the current snapshot's deletes
    applied, so a rewrite never resurrects deleted rows. With sort_by,
    the SORTED layout rewrite: every live file re-lands range-
    partitioned + sorted so the new files carry disjoint key ranges
    into bounds pruning. Returns the new snapshot id."""
    return _jvm(spark).graft.sources.IcebergWrite.rewriteDataFiles(
        spark._jsparkSession, path, int(target_bytes),
        _to_seq(spark, list(sort_by)))


def hudi_create(spark, df, path, key, partition_field="",
                table_type="COPY_ON_WRITE"):
    """Create a Hudi table (public storage layout) and land the first
    commit; with ``partition_field``, file groups live under one
    directory per partition value and upsert/delete merge per
    (partition, key). ``table_type`` may be MERGE_ON_READ for the
    log-upsert write path. Returns the instant."""
    return _jvm(spark).graft.sources.HudiWrite.create(
        df._jdf, path, key, partition_field, table_type)


def hudi_delete_log(spark, keys_df, path, key):
    """MERGE_ON_READ log-delete: emits one DELETE_BLOCK per affected
    file slice (O(matched keys) - the read suppresses the rows at
    merge time). Unmatched keys are a no-op. Returns the instant."""
    return _jvm(spark).graft.sources.HudiWrite.deleteLog(
        keys_df._jdf, path, key)


def hudi_upsert_log(spark, df, path, key):
    """MERGE_ON_READ log-upsert: matched keys append one avro log
    block per affected file slice (O(source) - the read pays the
    merge); unmatched keys land as a fresh base group in the same
    deltacommit. Returns the instant."""
    return _jvm(spark).graft.sources.HudiWrite.upsertLog(
        df._jdf, path, key)


def hudi_insert(spark, df, path, key):
    """Bulk-insert new file groups (no key merging - the caller owns
    key uniqueness across inserts). Returns the instant."""
    return _jvm(spark).graft.sources.HudiWrite.insert(df._jdf, path, key)


def hudi_upsert(spark, df, path, key):
    """Copy-on-write MERGE: affected file groups rewrite under the same
    fileId at a new instant (matched keys replaced, new keys inserted
    as a fresh group). At most one source row per key. Returns the
    instant."""
    return _jvm(spark).graft.sources.HudiWrite.upsert(df._jdf, path, key)


def hudi_delete(spark, path, predicate):
    """Copy-on-write DELETE of rows matching the SQL predicate
    (NULL-predicate rows kept). Returns the instant."""
    return _jvm(spark).graft.sources.HudiWrite.delete(
        spark._jsparkSession, path, predicate)


def hudi_insert_batch(spark, df, path, key, app_id, batch_id):
    """Exactly-once streaming insert: the per-app watermark rides the
    commit's extraMetadata, so a replayed micro-batch is a detected
    no-op. Returns the instant."""
    return _jvm(spark).graft.sources.HudiWrite.insertBatch(
        df._jdf, path, key, app_id, int(batch_id))


def hudi_upsert_log_batch(spark, df, path, key, app_id, batch_id):
    """Exactly-once streaming MOR log-upsert: the per-app watermark
    rides the deltacommit's extraMetadata (as hudi_insert_batch), so a
    replayed micro-batch is a detected no-op. Returns the instant."""
    return _jvm(spark).graft.sources.HudiWrite.upsertLogBatch(
        df._jdf, path, key, app_id, int(batch_id))


def hudi_compact(spark, path):
    """MERGE_ON_READ compaction: fold every file slice's live log
    blocks into a fresh base file under a ``commit`` instant (the
    read-side merge run once at write time). O(affected slices);
    pre-compaction instants still time-travel. Returns the instant."""
    return _jvm(spark).graft.sources.HudiWrite.compact(
        spark._jsparkSession, path)


def hudi_clean(spark, path, retain_instants):
    """Delete file slices shadowed beyond the retention horizon (the
    ``retain_instants``-th-latest completed instant) plus the log
    files folded into them - the Delta VACUUM analog. Time travel
    below the horizon refuses loudly afterwards. Returns the number
    of files deleted."""
    return _jvm(spark).graft.sources.HudiWrite.clean(
        spark._jsparkSession, path, int(retain_instants))


def hudi_archive(spark, path, keep_last):
    """Trim the active timeline to its last ``keep_last`` completed
    data instants by moving older completed files into
    ``.hoodie/archived/``. Watermarks and instant monotonicity
    survive; an archive that would orphan a file group's latest write
    refuses and rolls back. Returns the number of instants archived."""
    return _jvm(spark).graft.sources.HudiWrite.archive(
        spark._jsparkSession, path, int(keep_last))


def hudi_insert_overwrite(spark, df, path, key):
    """INSERT OVERWRITE (replacecommit): land df as fresh file groups
    and kill every existing group of the partitions the batch touches
    (whole-table replacement on unpartitioned tables). Returns the
    instant."""
    return _jvm(spark).graft.sources.HudiWrite.insertOverwrite(
        df._jdf, path, key)


def hudi_cluster(spark, path, target_bytes=128 * 1024 * 1024,
                 sort_by=()):
    """CLUSTERING (replacecommit): bin-pack small file groups into
    ~target_bytes groups under fresh fileIds; with sort_by, rewrite
    every group range-partitioned and sorted on the keys so range
    predicates prune to 1-of-N files. Returns the instant."""
    return _jvm(spark).graft.sources.HudiWrite.cluster(
        spark._jsparkSession, path, int(target_bytes),
        _to_seq(spark, list(sort_by)))


def hudi_sync_metadata(spark, path):
    """Build/refresh the modeled metadata table at .hoodie/metadata
    (files + column_stats partitions + sync marker); incremental -
    only files new since the last sync pay a footer read. Returns the
    synced head instant."""
    return _jvm(spark).graft.sources.HudiWrite.syncMetadata(
        spark._jsparkSession, path)


def hudi_read_where_meta(spark, path, predicate):
    """Pruned Hudi read planned from the METADATA TABLE (one table
    read instead of one footer RPC per data file). Refuses loudly when
    the metadata table is absent, stale, or an unmodeled layout."""
    jdf = _jvm(spark).graft.sources.HudiRead.readWhereMeta(
        spark._jsparkSession, path, predicate)
    return _wrap(spark, jdf)


def hudi_read_where(spark, path, predicate, as_of=""):
    """Pruned Hudi COW read: open only base files whose footer zone
    maps can satisfy the predicate (Hudi commit metadata carries no
    column bounds, so the zone maps are footer-harvested at plan
    time). Refuses on tables with uncompacted log files."""
    jdf = _jvm(spark).graft.sources.HudiRead.readWhere(
        spark._jsparkSession, path, predicate, as_of)
    return _wrap(spark, jdf)


def hudi_read(spark, path, as_of=""):
    """Read-only Apache Hudi snapshot read (public storage layout:
    completed-commit timeline + latest file slice per group;
    MERGE_ON_READ log blocks — avro data + delete — merge per file
    slice; time travel via the ``as_of`` instant timestamp)."""
    jdf = _jvm(spark).graft.sources.HudiRead.read(
        spark._jsparkSession, path, str(as_of))
    return _wrap(spark, jdf)


def verb(spark, name, df, *args):
    """Generic escape hatch: call any GraftOps verb by name.

    ``args`` entries are passed through, with two conveniences: strings
    prefixed with ``col:`` become Columns, and lists become Seqs, e.g.::

        verb(spark, "latestPerKey", df, "col:user_id", ["col:ts"])
    """
    def conv(a):
        if isinstance(a, str) and a.startswith("col:"):
            return _col_expr(spark, a[4:])
        if isinstance(a, (list, tuple)):
            return _to_seq(spark, [conv(x) for x in a])
        if isinstance(a, DataFrame):
            return a._jdf
        return a
    jdf = getattr(_graft_ops(spark), name)(df._jdf, *[conv(a) for a in args])
    return _wrap(spark, jdf)


def _snapshot(spark):
    return _jvm(spark).graft.sources.SnapshotTable


def snapshot_create(spark, df, path):
    """Create version 1 of a transactional snapshot table."""
    return _snapshot(spark).create(df._jdf, path)


def snapshot_append(spark, df, path, expected_version=0, merge_schema=False):
    """Append a segment; optional additive schema evolution."""
    return _snapshot(spark).append(df._jdf, path, int(expected_version),
                                   bool(merge_schema))


def snapshot_upsert(spark, path, changes, keys, expected_version=0):
    """Copy-on-write MERGE: at most one change row per key."""
    return _snapshot(spark).upsert(spark._jsparkSession, path, changes._jdf,
                                   _to_seq(spark, list(keys)),
                                   int(expected_version))


def snapshot_read(spark, path, version=0):
    """Read a version (0 = latest) of a snapshot table."""
    return _wrap(spark, _snapshot(spark).read(spark._jsparkSession, path,
                                              int(version)))


def snapshot_read_where(spark, path, predicate, version=0):
    """Zone-map-pruned read: opens only files whose manifest stats can
    satisfy ``predicate`` (full predicate still applied as a filter)."""
    return _wrap(spark, _snapshot(spark).readWhere(
        spark._jsparkSession, path, predicate, int(version)))


def snapshot_prune_report(spark, path, predicate, version=0):
    """(total files, files kept) for a predicate's zone-map pruning."""
    t = _snapshot(spark).pruneReport(spark._jsparkSession, path, predicate,
                                     int(version))
    return (t._1(), t._2())


def snapshot_changes(spark, path, from_version, to_version):
    """Change feed between two versions: insert/delete rows with a
    _change_type column (updates appear as delete+insert pairs)."""
    return _wrap(spark, _snapshot(spark).changes(
        spark._jsparkSession, path, int(from_version), int(to_version)))


def snapshot_cluster(spark, path, cols, num_files=8):
    """OPTIMIZE-ZORDER analog: range-partitioned sorted rewrite so zone
    maps prune selective predicates to a handful of file opens."""
    return _snapshot(spark).cluster(spark._jsparkSession, path,
                                    _to_seq(spark, list(cols)),
                                    int(num_files))


def snapshot_compact(spark, path, num_files=1):
    return _snapshot(spark).compact(spark._jsparkSession, path,
                                    int(num_files))


def snapshot_build_blooms(spark, path, cols, num_bits=1 << 17,
                          num_hashes=5):
    """Attach per-(file, column) bloom filters for =/IN file skipping on
    unclustered high-cardinality columns (commits a new version)."""
    return _snapshot(spark).buildBlooms(
        spark._jsparkSession, path, _to_seq(spark, list(cols)),
        int(num_bits), int(num_hashes))


def snapshot_latest_version(spark, path):
    return _snapshot(spark).latestVersion(spark._jsparkSession, path)


def _field_names(schema):
    """Field names of a StructType or a DDL string (top-level commas
    only — nested ``struct<...>``/``array<...>`` commas are skipped)."""
    try:
        return list(schema.fieldNames())
    except AttributeError:
        names, depth, cur = [], 0, []
        for ch in str(schema) + ",":
            if ch in "<([":
                depth += 1
            elif ch in ">)]":
                depth -= 1
            if ch == "," and depth == 0:
                tok = "".join(cur).strip()
                if tok:
                    names.append(tok.split()[0].strip("`").rstrip(":"))
                cur = []
            else:
                cur.append(ch)
        return names


def decode_assets(df, id_col, bytes_col, decode_fn, out_schema,
                  batch_rows=64):
    """Multimodal decode plumbing over ``mapInPandas``: feeds the opaque
    binary column through ``decode_fn`` (a per-row python callable
    ``bytes -> dict`` matching ``out_schema``) in bounded pandas batches.
    The heavy libraries (PIL/av/...) live only inside ``decode_fn`` on
    the executors; Spark sees typed columns and plans around them.

    Fault isolation is per ROW, not per task: local re-chunking bounds
    the memory one giant asset pins, and ``decode_fn`` is wrapped so a
    raising row degrades to null feature columns instead of failing the
    task (a single corrupt asset in a 100 TB scan must quarantine, not
    kill the job — the m05 lane-split policy). When ``out_schema`` has
    an ``ok`` boolean / ``error`` string field they are filled (False /
    the exception message) so the quarantine lane is selectable
    downstream; otherwise all-null features mark the failures.
    """
    import pandas as pd

    fields = _field_names(out_schema)

    def run(batches):
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo:lo + batch_rows]
                rows = []
                for _, r in chunk.iterrows():
                    try:
                        out = dict(decode_fn(r[bytes_col]))
                        if "ok" in fields:
                            out.setdefault("ok", True)
                        if "error" in fields:
                            out.setdefault("error", None)
                    except Exception as e:  # quarantine the row, keep the task
                        out = {f: None for f in fields if f != id_col}
                        if "ok" in fields:
                            out["ok"] = False
                        if "error" in fields:
                            out["error"] = str(e)
                    out[id_col] = r[id_col]
                    rows.append(out)
                yield pd.DataFrame(rows)

    return df.select(id_col, bytes_col).mapInPandas(run, schema=out_schema)
