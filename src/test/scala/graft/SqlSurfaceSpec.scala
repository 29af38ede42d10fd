package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The plain-SQL operator surface (graft.api.SqlSurface): every TVF must
  * produce exactly the frame its GraftOps verb produces, compose inside
  * larger SQL, and reject non-literal / mistyped arguments loudly.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.api.{GraftOps, SqlSurface, TransformSpec}

  private def docs = Tables.documents(spark, sf)

  test("TVFs equal their GraftOps verbs and compose in SQL") {
    SqlSurface.install(spark)
    docs.createOrReplaceTempView("docs_sql_v")

    val viaSql = spark.sql(
      "SELECT * FROM graft_near_dup_pairs('docs_sql_v', 'doc_id', 'text', 0.5)")
    val viaApi = GraftOps.jaccardJoin(docs, col("doc_id"), col("text"), 0.5)
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)

    // lsh strategy variant routes through the banded path
    val viaLsh = spark.sql(
      "SELECT * FROM graft_near_dup_pairs('docs_sql_v', 'doc_id', 'text', 0.5, 'lsh')")
    assert(viaLsh.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaLsh).isEmpty)

    // TVF output composes like any relation (joins, aggregates, CTEs)
    val n = spark.sql(
      """WITH p AS (SELECT * FROM graft_near_dup_pairs('docs_sql_v', 'doc_id', 'text', 0.5))
         SELECT count(*) AS n FROM p JOIN docs_sql_v d ON p.id_a = d.doc_id
      """).head().getLong(0)
    assert(n == viaApi.count())

    docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .createOrReplaceTempView("vocab_sql_v")
    val topkSql = spark.sql(
      """SELECT rank, word, n FROM graft_global_topk(
           'vocab_sql_v', 'n', 'word', 10) ORDER BY rank""")
    val topkApi = GraftOps.globalTopK(
        spark.table("vocab_sql_v"), "n", "word", 10)
      .select("rank", "word", "n").orderBy("rank")
    assert(topkSql.collect().toSeq == topkApi.collect().toSeq)
  }

  test("remaining TVFs pin their argument plumbing against the verbs") {
    SqlSurface.install(spark)
    docs.createOrReplaceTempView("docs_sql_v3")
    val cases: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "SELECT * FROM graft_containment_pairs('docs_sql_v3', 'doc_id', 'text', 0.8)" ->
        GraftOps.containmentJoin(docs, col("doc_id"), col("text"), 0.8),
      "SELECT * FROM graft_span_dedup('docs_sql_v3', 'doc_id', 'text', 10)" ->
        GraftOps.spanDedup(docs, col("doc_id"), col("text"), 10),
      "SELECT * FROM graft_gopher_filter('docs_sql_v3', 'text')" ->
        GraftOps.gopherFilter(docs, col("text")),
      "SELECT * FROM graft_chunk('docs_sql_v3', 'text', 64, 48)" ->
        GraftOps.chunk(docs, col("text"), 64, 48),
      "SELECT * FROM graft_dedup_manifest('docs_sql_v3', 'doc_id', 'text', 0.5)" ->
        GraftOps.dedupManifest(docs, col("doc_id"), col("text"), 0.5),
      "SELECT * FROM graft_quota_sample('docs_sql_v3', 'doc_id', 'source', 10)" ->
        GraftOps.quotaSample(docs, col("doc_id"), col("source"), 10),
    )
    cases.foreach { case (sql, verb) =>
      val viaSql = spark.sql(sql)
      assert(viaSql.exceptAll(verb).isEmpty && verb.exceptAll(viaSql).isEmpty, sql)
    }
    val e = Tables.embeddings(spark, sf)
    e.createOrReplaceTempView("emb_sql_v")
    val asgSql = spark.sql("SELECT * FROM graft_kmeans('emb_sql_v', 'vec_id', 'embedding', 10, 2)")
    val asgVerb = GraftOps.kmeans(e, col("vec_id"), col("embedding"), 10, 2)
    assert(asgSql.exceptAll(asgVerb).isEmpty && asgVerb.exceptAll(asgSql).isEmpty)
    val sdSql = spark.sql(
      "SELECT * FROM graft_semantic_dedup('emb_sql_v', 'vec_id', 'embedding', 'label', 0.3)")
    val sdVerb = GraftOps.semanticDedup(e, col("vec_id"), col("embedding"),
      col("label"), 0.3)
    assert(sdSql.exceptAll(sdVerb).isEmpty && sdVerb.exceptAll(sdSql).isEmpty)

    val part = Tables.part(spark, sf)
    part.createOrReplaceTempView("part_sql_v")
    val fdSql = spark.sql(
      "SELECT * FROM graft_fd_audit('part_sql_v', 'p_brand', 'p_type')")
    val fdVerb = GraftOps.fdAudit(part, col("p_brand"), col("p_type"),
      "part_sql_v.p_brand->p_type")
    assert(fdSql.exceptAll(fdVerb).isEmpty && fdVerb.exceptAll(fdSql).isEmpty)

    val ev = Tables.events(spark, sf)
    ev.createOrReplaceTempView("ev_sql_v")
    val hzSql = spark.sql(
      "SELECT * FROM graft_conversion_hazard('ev_sql_v', 'user_id', 'ts', 'event_type = ''purchase''', 7)")
    val hzVerb = GraftOps.conversionHazard(ev, col("user_id"), col("ts"),
      col("event_type") === "purchase", 7)
    assert(hzSql.exceptAll(hzVerb).isEmpty && hzVerb.exceptAll(hzSql).isEmpty)

    val edges = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey")).agg(
        org.apache.spark.sql.functions.sort_array(
          org.apache.spark.sql.functions.collect_set(col("l_partkey"))).as("ps"))
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(
          """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"""))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("w"))
      .filter(col("w") >= 2).select("a", "b")
    edges.createOrReplaceTempView("edges_sql_v")
    val lpSql = spark.sql("SELECT * FROM graft_link_predict('edges_sql_v', 'a', 'b', 10)")
    val lpVerb = GraftOps.linkPredict(edges, col("a"), col("b"), 10)
    assert(lpSql.exceptAll(lpVerb).isEmpty && lpVerb.exceptAll(lpSql).isEmpty)

    val ssSql = spark.sql(
      "SELECT * FROM graft_substring_pairs('docs_sql_v3', 'doc_id', 'text')")
    val ssVerb = GraftOps.substringContainment(docs, col("doc_id"), col("text"))
    assert(ssSql.exceptAll(ssVerb).isEmpty && ssVerb.exceptAll(ssSql).isEmpty)
  }

  test("graph TVFs pin their plumbing against the verbs") {
    SqlSurface.install(spark)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2).select("a", "b")
    edges.createOrReplaceTempView("edges_sql_v")
    val triSql = spark.sql(
      "SELECT * FROM graft_triangles('edges_sql_v', 'a', 'b')")
    val triApi = GraftOps.triangleCensus(edges, col("a"), col("b"))
    assert(triSql.collect().toSeq == triApi.collect().toSeq)
    val ccSql = spark.sql(
      """SELECT cluster_id, count(*) AS n
         FROM graft_connected_components('edges_sql_v', 'a', 'b')
         GROUP BY 1 ORDER BY 1""")
    val ccApi = GraftOps.connectedComponents(edges, col("a"), col("b"))
      .groupBy("cluster_id").agg(count(lit(1)).as("n")).orderBy("cluster_id")
    assert(ccSql.collect().toSeq == ccApi.collect().toSeq)
    edges.withColumn("w", lit(1L)).createOrReplaceTempView("wedges_sql_v")
    val prSql = spark.sql(
      "SELECT * FROM graft_pagerank('wedges_sql_v', 'a', 'b', 'w', 2) ORDER BY node")
    val prApi = GraftOps.pagerank(spark.table("wedges_sql_v"),
      col("a"), col("b"), col("w"), iters = 2).orderBy("node")
    assert(prSql.collect().toSeq == prApi.collect().toSeq)
    val spSql = spark.sql(
      """SELECT * FROM graft_shortest_paths('wedges_sql_v', 'a', 'b', 'w', 3)
         ORDER BY src, dst""")
    val spApi = GraftOps.shortestPaths(spark.table("wedges_sql_v"),
      col("a"), col("b"), col("w"), rounds = 3).orderBy("src", "dst")
    assert(spSql.collect().toSeq == spApi.collect().toSeq)
  }

  test("survival + trend TVFs pin their plumbing against the verbs") {
    SqlSurface.install(spark)
    Tables.events(spark, sf).createOrReplaceTempView("events_km_v")
    val kmSql = spark.sql(
      """SELECT * FROM graft_kaplan_meier('events_km_v', 'user_id', 'ts',
           'event_type = ''purchase''') ORDER BY t""")
    val kmApi = GraftOps.kaplanMeier(Tables.events(spark, sf),
      col("user_id"), col("ts"), col("event_type") === "purchase").orderBy("t")
    assert(kmSql.collect().toSeq == kmApi.collect().toSeq)

    Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("g"),
        to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .createOrReplaceTempView("orders_rt_v")
    val rtSql = spark.sql(
      """SELECT * FROM graft_rolling_trend('orders_rt_v', 'g', 'day',
           'cents', 14) ORDER BY grp, day""")
    val rtApi = GraftOps.rollingTrend(spark.table("orders_rt_v"),
      col("g"), col("day"), col("cents"), 14).orderBy("grp", "day")
    assert(rtSql.collect().toSeq == rtApi.collect().toSeq)
  }

  test("round-6 TVFs: delta/iceberg reads, bpe tokens, geo nearest from plain SQL") {
    graft.api.SqlSurface.install(spark)
    // delta read through SQL (writer emits, TVF reads)
    val dir = java.nio.file.Files.createTempDirectory("graft_sql_delta")
      .toString + "/t"
    graft.sources.DeltaWrite.create(
      spark.range(0, 25).select(col("id").as("k")), dir)
    assert(spark.sql(s"SELECT count(*) n FROM graft_delta_read('$dir')")
      .head().getLong(0) == 25)
    // change feed through SQL: v0 -> v1 is an insert-only diff
    graft.sources.DeltaWrite.append(
      spark.range(25, 30).select(col("id").as("k")), dir)
    val feed = spark.sql(
      s"SELECT _change_type, count(*) n FROM graft_delta_changes('$dir', 0, 1) GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(feed == Map("insert" -> 5L), s"unexpected feed: $feed")
    // bpe tokens: TVF equals the verb
    val docs = Tables.documents(spark, sf)
    docs.createOrReplaceTempView("docs_sql_bpe")
    val viaSql = spark.sql(
      "SELECT * FROM graft_bpe_tokens('docs_sql_bpe', 'doc_id', 'text', 8)")
      .collect().map(_.mkString("|")).sorted
    val merges = api.GraftOps.bpeTrain(docs, col("text"), numMerges = 8)
    val direct = api.GraftOps
      .bpeTokenCounts(docs, col("doc_id"), col("text"), merges)
      .collect().map(_.mkString("|")).sorted
    assert(viaSql.sameElements(direct))
    // geo nearest: TVF answers with the adaptive grid column
    spark.range(0, 50)
      .select(col("id"), (col("id") * 1000000 - 20000000).as("lat"),
        (col("id") * 2000000 - 40000000).as("lon"))
      .createOrReplaceTempView("geo_pts")
    val geo = spark.sql(
      """SELECT * FROM graft_geo_nearest('geo_pts', 'id', 'lat', 'lon',
                                         'geo_pts', 'id', 'lat', 'lon')""")
    assert(geo.columns.contains("grid_cells") && geo.count() > 0)
    api.GraftOps.releaseCaches(); spark.catalog.clearCache()
  }

  test("graft_transform runs a declarative job with session-catalog table resolution") {
    SqlSurface.install(spark)
    docs.createOrReplaceTempView("documents_sql_v")
    val spec =
      """{"source": "documents_sql_v", "steps": [
          {"op": "withColumn", "name": "n_words",
           "expr": "CAST(size(split(text, ' ')) AS BIGINT)"},
          {"op": "filter", "expr": "n_words >= 20"},
          {"op": "agg", "groupBy": ["lang"], "aggs": [["n", "count(1)"]]},
          {"op": "orderBy", "cols": ["lang"]}]}"""
    // parameterized SQL: the spec JSON contains quotes of both kinds
    val viaSql = spark.sql("SELECT * FROM graft_transform(:spec)",
      Map("spec" -> spec))
    val viaApi = TransformSpec.run(spec, Map("documents_sql_v" -> docs))
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq)
    assert(viaSql.count() > 0)
  }

  test("TVF misuse fails at analysis time with a real message") {
    SqlSurface.install(spark)
    docs.createOrReplaceTempView("docs_sql_v2")
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_near_dup_pairs('docs_sql_v2', 'doc_id', 'text')").collect()
    }
    assert(e1.getMessage.contains("graft_near_dup_pairs"))
    val e2 = intercept[Exception] {
      // non-literal argument: TVFs resolve at analysis time
      spark.sql("SELECT * FROM graft_gopher_filter('docs_sql_v2', doc_id)").collect()
    }
    assert(e2 != null)
  }
}
