#!/usr/bin/env python3
"""End-to-end smoke test for the graft Python facade (python/graft.py).

Drives the library exactly the way a PySpark user would: jar on the
driver classpath, graft SQL functions from plain SQL, a p03-style
declarative TransformSpec JSON job, and a GraftOps verb — then asserts
each result against an independently computed expectation.

Usage: python3 tools/pysmoke.py [sfDir]   (default /root/testdata/sf0.001)

Requires: pyspark on the python path (driver-side), the library compiled
(`sbt compile` — target/scala-2.13/classes is used directly, no jar
packaging step needed).
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "python"))

from pyspark.sql import SparkSession  # noqa: E402
import graft  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
classes = os.path.join(REPO, "target", "scala-2.13", "classes")
assert os.path.isdir(classes), f"run `sbt compile` first: {classes} missing"

spark = (
    SparkSession.builder.master("local[4]")
    .appName("graft-pysmoke")
    .config("spark.driver.extraClassPath", classes)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf}/documents.parquet")
docs.createOrReplaceTempView("documents")

# 1. SQL surface: graft custom functions callable from plain spark.sql
graft.register(spark)
jw = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS jw").first().jw
assert abs(jw - 0.9611111111111111) < 1e-12, f"jaro_winkler off: {jw}"
sig = spark.sql(
    "SELECT size(minhash_signature(text, 64, 3)) AS k FROM documents LIMIT 1"
).first().k
assert sig == 64, f"minhash signature length {sig} != 64"

# 2. p03-style declarative JSON job through the TransformSpec facade
SPEC = """{"source": "documents", "steps": [
  {"op": "dedup", "key": "md5(lower(text))", "id": "doc_id"},
  {"op": "withColumn", "name": "n_words",
   "expr": "CAST(size(split(text, ' ')) AS BIGINT)"},
  {"op": "filter", "expr": "n_words >= 20"},
  {"op": "agg", "groupBy": ["lang", "source"],
   "aggs": [["n", "count(1)"], ["avg_words", "round(avg(n_words), 6)"]]},
  {"op": "orderBy", "cols": ["lang", "source"]}]}"""
out = graft.transform(spark, SPEC, {"documents": docs}).collect()
assert len(out) > 0, "declarative job returned no rows"
# independent check of the same job in pyspark directly
from pyspark.sql import functions as F, Window  # noqa: E402

dd = (
    docs.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(F.md5(F.lower("text"))).orderBy("doc_id")),
    )
    .filter("rn = 1")
    .withColumn("n_words", F.size(F.split("text", " ")).cast("long"))
    .filter("n_words >= 20")
    .groupBy("lang", "source")
    .agg(F.count(F.lit(1)).alias("n"),
         F.round(F.avg("n_words"), 6).alias("avg_words"))
    .orderBy("lang", "source")
    .collect()
)
assert [tuple(r) for r in out] == [tuple(r) for r in dd], "JSON job != direct plan"

# 3. a GraftOps verb via the facade: banded-LSH near-dup pairs equal the
# exact shingle join on this corpus (high-jaccard seeded duplicates)
exact = {
    (r.id_a, r.id_b)
    for r in graft.near_dup_pairs(spark, docs, "doc_id", "text", 0.5).collect()
}
banded = {
    (r.id_a, r.id_b)
    for r in graft.near_dup_pairs(
        spark, docs, "doc_id", "text", 0.5, strategy="lsh").collect()
}
assert exact == banded and len(exact) > 0, (
    f"lsh pairs {len(banded)} != exact pairs {len(exact)}")

# 3b. TVF surface from python-driven SQL
graft.install_sql(spark)
tvf = spark.sql(
    "SELECT * FROM graft_near_dup_pairs('documents', 'doc_id', 'text', 0.5)"
)
assert {(r.id_a, r.id_b) for r in tvf.collect()} == exact, "TVF != facade verb"

# 3c. multimodal decode plumbing: mapInPandas over an opaque binary
# column with a deterministic stand-in decoder (real pipelines swap in
# PIL/av inside decode_fn; schema/batching/typing is what's under test)
bin_df = docs.select(
    F.col("doc_id"), F.encode(F.col("text"), "UTF-8").alias("payload"))


def fake_decode(b):
    # stand-in for an image/audio codec: deterministic "dimensions"
    return {"n_bytes": int(len(b)), "width": int(len(b) % 640),
            "ok": bool(len(b) > 0)}


decoded = graft.decode_assets(
    bin_df, "doc_id", "payload", fake_decode,
    "n_bytes BIGINT, width BIGINT, ok BOOLEAN, doc_id BIGINT")
dd = decoded.collect()
want_bytes = {r.doc_id: r.n for r in
              docs.select("doc_id", F.length(F.encode(F.col("text"), "UTF-8"))
                          .alias("n")).collect()}
assert len(dd) == docs.count()
assert all(r.n_bytes == want_bytes[r.doc_id] and r.ok for r in dd), \
    "decode batches mangled rows"


# 3d. per-ROW fault isolation: a decoder raising on some assets must
# quarantine those rows (ok=False, error set, null features) while the
# rest of the batch — and the task — survives
def flaky_decode(b):
    if len(b) % 2 == 1:
        raise ValueError("corrupt asset")
    return {"n_bytes": int(len(b)), "width": int(len(b) % 640)}


flaky = graft.decode_assets(
    bin_df, "doc_id", "payload", flaky_decode,
    "n_bytes BIGINT, width BIGINT, ok BOOLEAN, error STRING, doc_id BIGINT"
).collect()
assert len(flaky) == docs.count(), "quarantine must keep every row"
bad = [r for r in flaky if not r.ok]
good = [r for r in flaky if r.ok]
assert bad and good, "corpus should exercise both lanes"
assert all(r.n_bytes is None and "corrupt" in r.error for r in bad)
assert all(r.n_bytes == want_bytes[r.doc_id] and r.error is None for r in good)

# 4. global top-k facade: rank 1 is the corpus-wide most frequent word
vocab = (
    docs.select(F.explode(F.split("text", " ")).alias("word"))
    .groupBy("word").agg(F.count(F.lit(1)).alias("n"))
)
top = graft.global_top_k(spark, vocab, "n", "word", 5).orderBy("rank").collect()
best = vocab.orderBy(F.desc("n"), "word").first()
assert top[0].word == best.word and len(top) == 5

# 5. round-4 verbs through the facade: FD audit + shard interleave
fd = graft.fd_audit(spark, docs, "doc_id", "lang", "docs.id->lang").collect()
assert len(fd) == 1 and fd[0].holds, "a primary key determines any column"
sh = graft.shard_interleave(spark, docs, "doc_id", "source", 4)
counts = sh.groupBy("shard").count().collect()
assert len(counts) == 4 and max(c["count"] for c in counts) - \
    min(c["count"] for c in counts) <= 20, "round-robin balance"

# 6. round-5 parity sweep: each facade verb vs an independent PySpark
# computation of the same semantics
events = graft._wrap(  # Tables.events handles the TIMESTAMP(NANOS) vintage
    spark, spark._jvm.graft.Tables.events(spark._jsparkSession, sf))

# 6a. sessionize: session count == independent gap-split count
sess = graft.sessionize(spark, events, "user_id", "ts",
                        tiebreak_cols=["event_id"])
n_sessions = (sess.groupBy("user_id")
              .agg(F.max("session_id").alias("m")).agg(F.sum("m")).first()[0])
wspec = Window.partitionBy("user_id").orderBy("ts", "event_id")
ind = (events.withColumn("prev", F.lag("ts").over(wspec))
       .withColumn("new", (F.col("prev").isNull() |
                           (F.col("ts") > F.col("prev") +
                            F.expr("INTERVAL 30 MINUTES"))).cast("long"))
       .agg(F.sum("new")).first()[0])
assert n_sessions == ind, f"sessionize {n_sessions} != independent {ind}"

# 6b. asof_join: every event gets the latest at-or-before order per user
orders_df = spark.read.parquet(f"{sf}/orders.parquet").select(
    F.col("o_custkey").alias("user_id"),
    F.col("o_orderdate").cast("timestamp").alias("ots"),
    "o_orderkey")
ev_small = events.select("user_id", "ts", "event_id").limit(500)
aj = graft.asof_join(spark, ev_small, orders_df,
                     "user_id", "user_id", "ts", "ots")
ind_aj = (ev_small.join(orders_df, "user_id", "left")
          .filter("ots <= ts")
          .groupBy("user_id", "ts", "event_id").agg(F.max("ots").alias("mts"))
          .count())
got_aj = aj.filter(F.col("ots").isNotNull()).count()
assert got_aj == ind_aj, f"asof_join matched {got_aj} != {ind_aj}"

# 6c. expect_all: violation counts match direct filters
rep = {r.rule: r for r in graft.expect_all(spark, docs, {
    "doc_id_not_null": "doc_id IS NOT NULL",
    "impossible": "length(text) < 0"}).collect()}
assert rep["satisfies(doc_id_not_null)"].violations == 0
assert (rep["satisfies(impossible)"].violations ==
        docs.filter("NOT length(text) < 0 IS TRUE").count())

# 6d. profile: mean/min/max match direct aggregates
prof = {r.column_name: r for r in
        graft.profile(spark, orders_df.select("o_orderkey"),
                      ["o_orderkey"]).collect()}
ok = orders_df.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
assert prof["o_orderkey"].min_v == float(ok[0])
assert prof["o_orderkey"].max_v == float(ok[1])

# 6e. gopher_filter: keep flag equals the documented word-count floor rule
gf = graft.gopher_filter(spark, docs, "text")
bad = gf.filter((F.col("n_words") < 40) & F.col("keep")).count()
assert bad == 0, "kept a doc below the word floor"

# 6f. span_dedup: total spans conserved, kept <= total
sd = graft.span_dedup(spark, docs, "doc_id", "text").collect()
assert all(0 <= r.n_kept <= r.n_spans for r in sd)
assert len(sd) == docs.filter("length(trim(text)) > 0").count()

# 6g. global_rank: rank 1 row == independent orderBy head
gr = graft.global_rank(spark, vocab, ["n DESC", "word"])
r1 = gr.filter("rank = 1").first()
assert (r1.word, r1.n) == (best.word, best.n), "global_rank head mismatch"

# 6h. skyline2d: frontier is exactly the non-dominated cell set
cells = vocab.select(F.col("n").alias("score"),
                     F.length("word").alias("cost"))
sky = {(r.score, r.cost) for r in
       graft.skyline2d(spark, cells, "score", "cost").collect()}
grid = [(r.score, r.cost) for r in
        cells.groupBy("score", "cost").count().collect()]
ind_sky = {(s, c) for (s, c) in grid
           if not any((s2 >= s and c2 < c) or (s2 > s and c2 <= c)
                      for (s2, c2) in grid)}
assert sky == ind_sky, f"skyline mismatch: {sky ^ ind_sky}"

# 6j. graph verbs: census/cc/pagerank on a toy graph with known answers
edges = spark.createDataFrame(
    [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6)], ["a", "b"])
tri = graft.triangles(spark, edges, "a", "b").first()
assert (tri.n_nodes, tri.n_edges, tri.n_triangles) == (6, 5, 1), tri
cc = {(r.node, r.cluster_id) for r in
      graft.connected_components(spark, edges, "a", "b").collect()}
assert cc == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 5), (6, 5)}, cc
pr = graft.pagerank(spark, edges, "a", "b")
assert abs(sum(r.pr for r in pr.collect()) - 1.0) < 1e-9

# 6m. label_propagation: the dense 4-node blob converges to one label,
# disjoint components never share one
lpa = {r.node: r.lbl for r in
       graft.label_propagation(spark, edges, "a", "b").collect()}
assert len({lpa[n] for n in (1, 2, 3, 4)}) == 1, lpa
assert {lpa[5], lpa[6]}.isdisjoint({lpa[n] for n in (1, 2, 3, 4)}), lpa

# 6n. shortest_paths: cost-tie resolves to fewer hops, bit-exact ints
wedges = spark.createDataFrame(
    [(1, 2, 10), (2, 3, 10), (1, 3, 25), (1, 4, 5), (4, 5, 5), (1, 5, 10)],
    ["s", "d", "w"])
sp = {(r.src, r.dst): (r.cost, r.hops) for r in
      graft.shortest_paths(spark, wedges, "s", "d", "w").collect()}
assert sp[(1, 3)] == (20, 2) and sp[(1, 5)] == (10, 1), sp

# 6k. kaplan_meier: risk sets conserved against an independent count
km = graft.kaplan_meier(spark, events, "user_id", "ts",
                        "event_type = 'purchase'").orderBy("t").collect()
n_users = events.select("user_id").distinct().count()
assert km[0].n_risk == n_users, (km[0], n_users)
assert sum(r.n_events + r.n_censored for r in km) == n_users
surv = 1.0
for r in km:
    if r.n_events > 0:
        surv *= 1.0 - r.n_events / r.n_risk
    assert abs(r.km_survival - surv) < 1e-5, (r, surv)

# 6l. rolling_trend: a perfectly linear synthetic series has its exact slope
lin = spark.createDataFrame(
    [("g", f"2020-01-{d:02d}", 100 * d) for d in range(1, 29)],
    ["g", "day", "cents"]).select(
        "g", F.to_date("day").alias("day"), "cents")
rt = graft.rolling_trend(spark, lin, "g", "day", "cents").orderBy("day")
last = rt.collect()[-1]
# slope = 100 cents/day = 1.0 unit/day = 1_000_000 micro-units
assert last.n_days == 28 and last.slope_micro == 1000000, last

# 6n. snapshot-table facade: ACID lifecycle + zone-map pruning from python
import tempfile
snap_path = tempfile.mkdtemp(prefix="graft_pysnap") + "/t"
base = spark.range(0, 400).selectExpr("id AS k", "id % 7 AS v") \
    .repartitionByRange(4, "k").sortWithinPartitions("k")
assert graft.snapshot_create(spark, base, snap_path) == 1
assert graft.snapshot_append(
    spark, spark.range(400, 500).selectExpr("id AS k", "id % 7 AS v"),
    snap_path) == 2
assert graft.snapshot_read(spark, snap_path).count() == 500
assert graft.snapshot_read(spark, snap_path, version=1).count() == 400
chg = spark.range(0, 5).selectExpr("id AS k", "CAST(99 AS BIGINT) AS v")
assert graft.snapshot_upsert(spark, snap_path, chg, ["k"]) == 3
assert graft.snapshot_read(spark, snap_path).where("v = 99").count() == 5
total, kept = graft.snapshot_prune_report(spark, snap_path, "k = 450")
assert kept < total, f"no pruning: {kept}/{total}"
assert graft.snapshot_read_where(spark, snap_path, "k = 450").count() == 1
cdf = graft.snapshot_changes(spark, snap_path, 1, 2)
assert cdf.where("_change_type = 'insert'").count() == 100
assert cdf.where("_change_type = 'delete'").count() == 0

# 6i. generic verb dispatcher: latestPerKey via verb() == direct window
lk = graft.verb(spark, "latestPerKey", events,
                "col:user_id", ["col:ts", "col:event_id"])
assert lk.count() == events.select("user_id").distinct().count()

# 6o. round-6 facade sweep: BPE tokenizer, dedup artifacts, delta read
merges = graft.bpe_train(spark, docs, "text", num_merges=8)
assert merges.count() >= 1 and merges.columns == ["rank", "l", "r"]
tc = graft.bpe_token_counts(spark, docs, "doc_id", "text", merges)
assert tc.count() == docs.count()
row = tc.orderBy("id").collect()[0]
assert 0 < row.n_tokens and row.n_words <= row.n_tokens, row

art_path = tempfile.mkdtemp(prefix="graft_pyart") + "/a"
summary = graft.dedup_artifacts(spark, docs, "doc_id", "text", art_path)
arts = {r.artifact: r.n_rows for r in summary.collect()}
assert set(arts) == {"pairs", "labels", "manifest"}, arts
assert arts["labels"] == docs.count() and arts["manifest"] == docs.count()
assert graft.snapshot_read(spark, art_path + "/pairs").count() == arts["pairs"]

# incremental artifact update from python: split by id, update == usable
cut = docs.approxQuantile("doc_id", [0.7], 0.0)[0]
old_docs = docs.where(f"doc_id <= {cut}")
new_docs = docs.where(f"doc_id > {cut}")
inc_path = tempfile.mkdtemp(prefix="graft_pyinc") + "/a"
graft.dedup_artifacts(spark, old_docs, "doc_id", "text", inc_path)
upd = graft.update_dedup_artifacts(spark, new_docs, "doc_id", "text", inc_path)
arts2 = {r.artifact: r.n_rows for r in upd.collect()}
assert arts2["labels"] == docs.count() and arts2["manifest"] == docs.count()

# graph artifacts from python: project once, edge threshold holds,
# incremental update refuses replayed baskets and ingests new ones
li = spark.read.parquet(f"{sf}/lineitem.parquet")
gart = tempfile.mkdtemp(prefix="graft_pygraph") + "/g"
half = li.where("l_orderkey % 2 = 0")
gsum = graft.graph_artifacts(spark, half, "l_orderkey", "l_partkey", gart)
garts = {r.artifact: r.n_rows for r in gsum.collect()}
assert set(garts) == {"pairs", "cc_labels", "baskets"}, garts
gp = graft.snapshot_read(spark, gart + "/pairs")
assert gp.count() == garts["pairs"]
assert gp.where("w >= 2").count() >= garts["cc_labels"] / 2  # a<b edges cover nodes
assert graft.snapshot_read(spark, gart + "/cc_labels").columns == [
    "node", "cluster_id"]
try:
    graft.update_graph_artifacts(spark, half, "l_orderkey", "l_partkey", gart)
    raise AssertionError("replayed baskets must be refused")
except Exception as e:
    assert "whole-basket" in str(e), e
upd = {r.artifact: r.n_rows for r in graft.update_graph_artifacts(
    spark, li.where("l_orderkey % 2 = 1"), "l_orderkey", "l_partkey",
    gart).collect()}
assert upd["baskets"] == li.select("l_orderkey").distinct().count(), upd
assert upd["pairs"] >= garts["pairs"]

# persisted ANN index from python: exact at nprobe=k, self at rank 1
emb = spark.read.parquet(f"{sf}/embeddings.parquet")
ann_path = tempfile.mkdtemp(prefix="graft_pyann") + "/idx"
graft.ann_index_build(spark, emb, "vec_id", "embedding", ann_path, k=4)
qs = emb.limit(3).selectExpr("vec_id AS qid", "embedding")
hits = graft.ann_search(spark, ann_path, qs, "qid", "embedding",
                        nprobe=4, top_k=3)
r1 = {r.query_id: r.id for r in hits.where("rank = 1").collect()}
assert all(q == i for q, i in r1.items()), f"rank-1 must be self: {r1}"

# hand-written public-protocol delta log read from python
delta_dir = tempfile.mkdtemp(prefix="graft_pydelta") + "/t"
os.makedirs(delta_dir + "/_delta_log")
spark.range(0, 20).selectExpr("id AS k").coalesce(1) \
    .write.mode("overwrite").parquet(delta_dir + "/stage")
import glob as _glob, shutil as _shutil, json as _json
part = _glob.glob(delta_dir + "/stage/*.parquet")[0]
_shutil.copy(part, delta_dir + "/f0.parquet")
schema_str = _json.dumps(
    {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}}]})
with open(delta_dir + "/_delta_log/" + "0" * 20 + ".json", "w") as fh:
    fh.write(_json.dumps({"protocol": {"minReaderVersion": 1,
                                       "minWriterVersion": 2}}) + "\n")
    fh.write(_json.dumps({"metaData": {
        "id": "t", "format": {"provider": "parquet"},
        "schemaString": schema_str, "partitionColumns": []}}) + "\n")
    fh.write(_json.dumps({"add": {
        "path": "f0.parquet", "partitionValues": {}, "size": 1,
        "modificationTime": 0, "dataChange": True,
        "stats": _json.dumps({"numRecords": 20, "minValues": {"k": 0},
                              "maxValues": {"k": 19},
                              "nullCount": {"k": 0}})}}) + "\n")
assert graft.delta_read(spark, delta_dir).count() == 20
assert hasattr(graft, "hudi_read")  # COW reader (fixture-tested in sbt)
assert graft.delta_read_where(spark, delta_dir, "k >= 15").count() == 5
assert graft.delta_read_where(spark, delta_dir, "k > 100").count() == 0

# 6p. delta WRITER round-trip + full CDC apply from python
dw_dir = tempfile.mkdtemp(prefix="graft_pydw") + "/t"
graft.delta_create(spark, spark.range(0, 30).selectExpr("id AS k"), dw_dir)
graft.delta_append(spark, spark.range(30, 40).selectExpr("id AS k"), dw_dir)
assert graft.delta_read(spark, dw_dir).count() == 40
assert graft.delta_read_where(spark, dw_dir, "k >= 30").count() == 10

# round 8: copy-on-write MERGE/DELETE + additive evolution from python
graft.delta_upsert(spark, spark.sql(
    "SELECT CAST(5 AS BIGINT) AS k UNION ALL SELECT CAST(99 AS BIGINT)"),
    dw_dir, ["k"])
assert graft.delta_read(spark, dw_dir).count() == 41  # k=5 replaced, 99 new
graft.delta_delete(spark, dw_dir, "k >= 35 AND k < 40")
assert graft.delta_read(spark, dw_dir).count() == 36
# exactly-once batch append: the replayed batch id is a detected no-op
graft.delta_append_batch(
    spark, spark.range(70, 75).selectExpr("id AS k"), dw_dir, "pyjob", 0)
graft.delta_append_batch(
    spark, spark.range(70, 75).selectExpr("id AS k"), dw_dir, "pyjob", 0)
assert graft.delta_read(spark, dw_dir).count() == 41
# round 13: exactly-once batch UPSERT (the CDC-mirror foreachBatch verb)
graft.delta_upsert_batch(
    spark, spark.sql("SELECT CAST(70 AS BIGINT) AS k"),
    dw_dir, ["k"], "pyjob", 1)
graft.delta_upsert_batch(
    spark, spark.sql("SELECT CAST(7000 AS BIGINT) AS k"),
    dw_dir, ["k"], "pyjob", 1)  # replayed id: detected no-op
assert graft.delta_read(spark, dw_dir).count() == 41
assert graft.delta_read(spark, dw_dir).where("k = 7000").count() == 0
graft.delta_append(spark, spark.range(100, 110).selectExpr(
    "id AS k", "id * 2 AS score"), dw_dir, merge_schema=True)
evolved = graft.delta_read(spark, dw_dir)
assert evolved.count() == 51
assert evolved.where("score IS NULL").count() == 41
assert evolved.where("k = 105").first().score == 210

# round 8: Iceberg WRITER round-trip from python
iw_dir = tempfile.mkdtemp(prefix="graft_pyiw") + "/t"
graft.iceberg_create(spark, spark.range(0, 30).selectExpr("id AS k"), iw_dir)
graft.iceberg_append(spark, spark.range(30, 40).selectExpr("id AS k"), iw_dir)
assert graft.iceberg_read(spark, iw_dir).count() == 40
assert graft.iceberg_read(spark, iw_dir, snapshot_id=1).count() == 30

# round 10: metadata-only rollback to a prior snapshot, then back
graft.iceberg_rollback(spark, iw_dir, 1)
assert graft.iceberg_read(spark, iw_dir).count() == 30
graft.iceberg_rollback(spark, iw_dir, 2)
assert graft.iceberg_read(spark, iw_dir).count() == 40

# round 9: Delta OPTIMIZE + VACUUM from python — the delete above left
# small files + a tombstone; optimize packs, vacuum(0) reclaims
# round 9: row-level change feed carries _commit_version (before
# vacuum — a feed over vacuumed history fails loudly, as it should)
feed = graft.delta_changes(spark, dw_dir, 0, 1)
assert "_commit_version" in feed.columns and "_change_type" in feed.columns
assert feed.where("_change_type = 'insert'").count() == 10

v_opt = graft.delta_optimize(spark, dw_dir)
assert graft.delta_read(spark, dw_dir).count() == 51
import time as _t; _t.sleep(0.01)
assert graft.delta_vacuum(spark, dw_dir, retain_millis=0) > 0
assert graft.delta_read(spark, dw_dir).count() == 51

# round 12: merge-on-read DELETE/UPSERT via deletion vectors — no data
# files rewritten, masks round-trip through the DV-applying reader,
# optimize folds them
dv_dir = tempfile.mkdtemp(prefix="graft_pydv") + "/t"
graft.delta_create(spark, spark.range(0, 40).selectExpr(
    "id AS k", "id * 2 AS v"), dv_dir)
v_dv = graft.delta_delete_dv(spark, dv_dir, "k >= 35")
assert v_dv == 1 and graft.delta_read(spark, dv_dir).count() == 35
assert graft.delta_read(spark, dv_dir, version=0).count() == 40
graft.delta_upsert_dv(
    spark, spark.range(30, 33).selectExpr("id AS k", "id * 10 AS v"),
    dv_dir, ["k"])
got_dv = graft.delta_read(spark, dv_dir)
assert got_dv.count() == 35
assert got_dv.where("k = 31").collect()[0][1] == 310
graft.delta_optimize(spark, dv_dir)
assert graft.delta_read(spark, dv_dir).count() == 35

# round 12: the forget family from python — key-frame DV delete on
# Delta, pure equality-delete snapshot on Iceberg
fk = spark.range(0, 3).selectExpr("id * 10 AS k")
graft.delta_delete_dv_keys(spark, fk, dv_dir, ["k"])
assert graft.delta_read(spark, dv_dir).count() == 32  # 0,10,20 gone
graft.delta_delete_dv_batch(spark, dv_dir, "k = 1", "pyapp", 0)
assert graft.delta_read(spark, dv_dir).count() == 31
# replayed batch: detected no-op
graft.delta_delete_dv_batch(spark, dv_dir, "k = 2", "pyapp", 0)
assert graft.delta_read(spark, dv_dir).count() == 31
ik_dir = tempfile.mkdtemp(prefix="graft_pyik") + "/t"
graft.iceberg_create(spark, spark.range(0, 30).selectExpr("id AS k"),
                     ik_dir)
graft.iceberg_delete_keys(spark, fk, ik_dir, ["k"])
assert graft.iceberg_read(spark, ik_dir).count() == 27
# round 13: the forget shape on a PARTITIONED table — keys don't
# determine the partition, so the delete goes global
ikp_dir = tempfile.mkdtemp(prefix="graft_pyikp") + "/t"
graft.iceberg_create(
    spark, spark.range(0, 30).selectExpr(
        "id AS k", "CAST(id % 3 AS int) AS b").coalesce(1),
    ikp_dir, partition_by=["b"])
graft.iceberg_delete_keys(spark, fk, ikp_dir, ["k"])
assert graft.iceberg_read(spark, ikp_dir).count() == 27
assert graft.iceberg_read(spark, ikp_dir).where("k IN (0,10,20)") \
    .count() == 0
# round 13: v3 deletion vectors (puffin) from python — no rewrite
graft.iceberg_delete_dv(spark, ikp_dir, "k % 10 = 5")
assert graft.iceberg_read(spark, ikp_dir).count() == 24

# round 12: Z-ORDER operating point from python
zo_dir = tempfile.mkdtemp(prefix="graft_pyzo") + "/t"
graft.delta_create(spark, spark.range(0, 1024).selectExpr(
    "id AS k", "CAST(id % 32 AS int) AS x", "CAST(id DIV 32 AS int) AS y")
    .repartition(4), zo_dir)
graft.delta_optimize(spark, zo_dir, target_bytes=4096,
                     zorder_by=["x", "y"])
assert graft.delta_read(spark, zo_dir).count() == 1024

# round 10: RESTORE to a prior version as a new commit (history kept)
dr_dir = tempfile.mkdtemp(prefix="graft_pydr") + "/t"
graft.delta_create(spark, spark.range(0, 8).selectExpr("id AS k"), dr_dir)
graft.delta_delete(spark, dr_dir, "k >= 5")
assert graft.delta_read(spark, dr_dir).count() == 5
v_restored = graft.delta_restore(spark, dr_dir, 0)
assert v_restored == 2
assert graft.delta_read(spark, dr_dir).count() == 8
assert graft.delta_read(spark, dr_dir, version=1).count() == 5

# round 10: Hudi COPY_ON_WRITE writer round-trip through HudiRead
hw_dir = tempfile.mkdtemp(prefix="graft_pyhw") + "/t"
graft.hudi_create(
    spark, spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v"),
    hw_dir, "k")
assert graft.hudi_read(spark, hw_dir).count() == 10
graft.hudi_upsert(
    spark, spark.range(8, 12).selectExpr("id AS k", "id * 100 AS v"),
    hw_dir, "k")
hu = graft.hudi_read(spark, hw_dir)
assert hu.count() == 12 and hu.where("k = 9").first().v == 900
graft.hudi_delete(spark, hw_dir, "k >= 10")
assert graft.hudi_read(spark, hw_dir).count() == 10
graft.hudi_insert_batch(
    spark, spark.range(20, 22).selectExpr("id AS k", "id AS v"),
    hw_dir, "k", "pyapp", 0)
graft.hudi_insert_batch(
    spark, spark.range(20, 22).selectExpr("id AS k", "id AS v"),
    hw_dir, "k", "pyapp", 0)
assert graft.hudi_read(spark, hw_dir).count() == 12

# round 11: Hudi MOR compaction + retention (clean/archive)
hm_dir = tempfile.mkdtemp(prefix="graft_pyhm") + "/t"
graft.hudi_create(
    spark,
    spark.range(0, 8).selectExpr("id AS k", "id * 2 AS v").coalesce(1),
    hm_dir, "k", table_type="MERGE_ON_READ")
graft.hudi_upsert_log(
    spark, spark.range(0, 4).selectExpr("id AS k", "id * 100 AS v"),
    hm_dir, "k")
pre_hm = sorted((r.k, r.v) for r in graft.hudi_read(spark, hm_dir).collect())
graft.hudi_compact(spark, hm_dir)
assert sorted((r.k, r.v)
              for r in graft.hudi_read(spark, hm_dir).collect()) == pre_hm
assert graft.hudi_clean(spark, hm_dir, 1) == 2  # old base + folded log
graft.hudi_upsert_log(
    spark, spark.range(0, 1).selectExpr("id AS k", "id + 7 AS v"),
    hm_dir, "k")
assert graft.hudi_archive(spark, hm_dir, 2) >= 1
hm = graft.hudi_read(spark, hm_dir)
assert hm.count() == 8 and hm.where("k = 0").first().v == 7
graft.hudi_compact(spark, hm_dir)
graft.hudi_sync_metadata(spark, hm_dir)
assert graft.hudi_read_where_meta(spark, hm_dir, "k >= 4").count() == 4
# clustering (replacecommit write side): sorted layout rewrite on a COW
hc_dir = tempfile.mkdtemp(prefix="graft_pyhc") + "/t"
graft.hudi_create(
    spark, spark.range(0, 400).selectExpr("id AS k", "id * 2 AS v")
    .coalesce(4), hc_dir, "k")
graft.hudi_cluster(spark, hc_dir, target_bytes=4096, sort_by=["k"])
assert graft.hudi_read(spark, hc_dir).count() == 400

# round 9: Iceberg identity-partitioned create + additive evolution
ip_dir = tempfile.mkdtemp(prefix="graft_pyip") + "/t"
graft.iceberg_create(spark, spark.range(0, 20).selectExpr(
    "id AS k", "CAST(id % 2 AS INT) AS b"), ip_dir, partition_by=["b"])
ip = graft.iceberg_read(spark, ip_dir)
assert ip.count() == 20 and ip.where("b = 1").count() == 10
graft.iceberg_append(spark, spark.range(20, 30).selectExpr(
    "id AS k", "CAST(id % 2 AS INT) AS b", "id * 3 AS score"),
    ip_dir, merge_schema=True)
ipe = graft.iceberg_read(spark, ip_dir)
assert ipe.count() == 30 and ipe.where("score IS NULL").count() == 20
assert graft.iceberg_expire_snapshots(spark, ip_dir, keep_last=1) > 0
assert graft.iceberg_read(spark, ip_dir).count() == 30

# round 9: iceberg merge-on-read delete + exactly-once batch append
assert graft.iceberg_delete(spark, iw_dir, "k >= 35") > 0
assert graft.iceberg_read(spark, iw_dir).count() == 35
graft.iceberg_append_batch(
    spark, spark.range(70, 75).selectExpr("id AS k"), iw_dir, "pyice", 0)
graft.iceberg_append_batch(
    spark, spark.range(70, 75).selectExpr("id AS k"), iw_dir, "pyice", 0)
assert graft.iceberg_read(spark, iw_dir).count() == 40
graft.iceberg_upsert(spark, spark.sql(
    "SELECT CAST(5 AS BIGINT) AS k UNION ALL SELECT CAST(99 AS BIGINT)"),
    iw_dir, ["k"])
up = graft.iceberg_read(spark, iw_dir)
assert up.count() == 41 and up.where("k = 5").count() == 1

# round 10: iceberg snapshot-range change feed
ic_dir = tempfile.mkdtemp(prefix="graft_pyic") + "/t"
graft.iceberg_create(spark, spark.range(0, 10).selectExpr("id AS k"), ic_dir)
graft.iceberg_append(spark, spark.range(10, 20).selectExpr("id AS k"), ic_dir)
ifeed = graft.iceberg_changes(spark, ic_dir, 1, 2)
assert "_snapshot_id" in ifeed.columns
assert ifeed.where("_change_type = 'insert'").count() == 10

# partitioned delta writer: hive layout + typed partition recovery
dp_dir = tempfile.mkdtemp(prefix="graft_pydp") + "/t"
graft.delta_create(spark, spark.range(0, 20).selectExpr(
    "id AS k", "CAST(id % 2 AS INT) AS b"), dp_dir, partition_by=["b"])
dp = graft.delta_read(spark, dp_dir)
assert dp.count() == 20 and dp.where("b = 1").count() == 10
assert dict(dp.dtypes)["b"] == "int"

cdc_dir = tempfile.mkdtemp(prefix="graft_pycdc") + "/t"
graft.snapshot_create(
    spark, spark.range(0, 10).selectExpr("id AS k", "'a' AS tag"), cdc_dir)
cdc = spark.sql("""SELECT * FROM VALUES (1, 'b', 'U'), (2, NULL, 'D'),
                   (50, 'n', 'I') AS t(k, tag, op)""") \
    .selectExpr("CAST(k AS BIGINT) k", "tag", "op")
spark._jvm.graft.sources.SnapshotTable.applyCdc(
    spark._jsparkSession, cdc_dir, cdc._jdf,
    graft._to_seq(spark, ["k"]), "op", "pycdc", 1)
after = graft.snapshot_read(spark, cdc_dir)
assert after.count() == 10  # 10 - 1 delete + 1 insert
assert after.where("k = 2").count() == 0
assert after.where("k = 1").first().tag == "b"

print(f"PASS pysmoke: sql-functions, {len(out)}-row declarative job, "
      f"{len(exact)} near-dup pairs (lsh == exact == TVF), top-k facade, "
      f"fd-audit + shard-interleave verbs, and the round-5 parity sweep "
      f"(sessionize/asof/expect/profile/gopher/span-dedup/global-rank/"
      f"skyline/verb-dispatch/kaplan-meier/rolling-trend) plus the "
      f"snapshot-table lifecycle (create/append/upsert/time-travel/"
      f"zone-map-pruned read/change feed) and the round-6 sweep "
      f"(bpe-train/encode, dedup-artifacts trio, delta-log read with "
      f"stats skipping, delta write round-trip, full CDC apply) and the round-9 sweep (delta optimize/vacuum, row-level change feed, partitioned+evolving iceberg writes, iceberg MOR delete + exactly-once batch append, delta sync) and the round-10 sweep (iceberg snapshot-range change feed + rollback, delta RESTORE, hudi COW write/upsert/delete/exactly-once round-trip) and the round-11 sweep (hudi MOR compact + clean + archive) and the round-12 sweep (delta DV delete/upsert + fold, forget family: key-frame DV deletes + exactly-once batch delete + iceberg equality-delete keys, Z-ORDER optimize) and the round-13 sweep (partitioned forget via iceberg_delete_keys' global equality delete, exactly-once delta_upsert_batch, v3 puffin deletion vectors via iceberg_delete_dv) — all green")
spark.stop()
