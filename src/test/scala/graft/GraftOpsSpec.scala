package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The public DataFrame-in/DataFrame-out verbs must agree with the
  * oracle-checked SparkEntry formulations they generalize.
  */
class GraftOpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.api.{GraftOps, syntax}, syntax._

  private def docs = Tables.documents(spark, sf)

  test("exactDedup keeps exactly one row per normalized text") {
    val out = docs.exactDedup(
      expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))"), col("doc_id"))
    val norm = expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))")
    assert(out.count() == docs.select(norm).distinct().count())
    // keeper is the min doc_id of its group
    val bad = out.select(md5(norm.cast("string")).as("h"), col("doc_id"))
      .join(docs.select(md5(norm.cast("string")).as("h"),
        col("doc_id").as("other")), "h")
      .where(col("other") < col("doc_id")).count()
    assert(bad == 0, "kept a non-minimal representative")
  }

  test("jaccardJoin reproduces d03's verified pair set") {
    val viaApi = docs.jaccardJoin(col("doc_id"), col("text"), 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val d03 = operators.Dedup.d03_ngram_jaccard(spark, sf)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaApi == d03)
  }

  test("minhashCandidates recalls every verified near-dup pair") {
    val cands = docs.minhashCandidates(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truePairs = operators.Dedup.d03_ngram_jaccard(spark, sf)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truePairs.count(cands.contains).toDouble / truePairs.size.max(1)
    assert(recall >= 0.9, s"recall $recall below 0.9")
  }

  test("simhashCandidates recalls near-exact duplicates") {
    val cands = docs.simhashCandidates(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val strong = operators.Dedup.d03_ngram_jaccard(spark, sf)
      .where(col("jaccard") >= 0.9)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = strong.count(cands.contains).toDouble / strong.size.max(1)
    assert(recall >= 0.9, s"recall $recall below 0.9 (n=${strong.size})")
  }

  test("knn facade equals the s01 brute-force baseline") {
    val e = Tables.embeddings(spark, sf)
    val got = GraftOps.knn(e, e.filter(col("vec_id") < 5), 5,
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"))
      .select("qid", "rank", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = operators.Similarity.s01_knn_brute(spark, sf)
      .select("qid", "rank", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("annLsh reaches >=0.6 recall vs exact knn at 16 tables") {
    val e = Tables.embeddings(spark, sf)
    val got = GraftOps.annLsh(e, e.filter(col("vec_id") < 5), 5,
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"))
      .select("qid", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = operators.Similarity.s01_knn_brute(spark, sf)
      .select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = want.count(got.contains).toDouble / want.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("incrementalDedup equals the plain anti-join result") {
    val hashExpr = md5(expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))"))
    val corpus = docs.filter(col("doc_id") % 5 =!= 0).select(hashExpr.as("h"))
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val got = GraftOps.incrementalDedup(batch, corpus, hashExpr, col("h"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = batch.withColumn("h", hashExpr)
      .join(corpus.distinct(), Seq("h"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("latestPerKey and sessionize agree with the oracle query formulations") {
    val ev = Tables.events(spark, sf)
    val got = ev.latestPerKey(col("user_id"), col("ts"), col("event_id"))
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = operators.Relational9.q68_latest_per_key(spark, sf)
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    val s1 = ev.sessionize(col("user_id"), col("ts"))
      .groupBy("user_id", "session_id").count()
    val s2 = operators.Relational2.q27_sessionize(spark, sf)
      .select(col("user_id"), col("session_id"), col("n_events").as("count"))
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
  }

  test("chunk/bm25/featureScale/mergeIntervals agree with oracle query formulations") {
    val docs = Tables.documents(spark, sf)
    // chunk vs t15 (facade splits \s+, t15 splits ' ' — identical on this corpus)
    val gotC = GraftOps.chunk(docs, lower(col("text")), 32, 24)
      .select(col("doc_id"), col("chunk_id"), md5(col("chunk")).as("m")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val wantC = operators.TextAnalysis4.t15_chunking(spark, sf)
      .select("doc_id", "chunk_id", "chunk_md5").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(gotC == wantC)
    // bm25 vs t14 top-25
    val gotB = GraftOps.bm25(docs, col("doc_id"), col("text"),
        Seq("spark", "hash", "window"))
      .select(col("id"), round(col("bm25"), 4).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wantB = operators.TextAnalysis4.t14_bm25(spark, sf)
      .select(col("doc_id"), round(col("bm25"), 4).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wantB.forall { case (k, v) => gotB.get(k).contains(v) },
      "facade bm25 disagrees with t14 on the top-25 docs")
    // featureScale vs q70 sample
    val ev = Tables.events(spark, sf)
    val gotF = GraftOps.featureScale(ev, col("event_type"), col("value"))
      .filter(col("event_id") % 97 === 0)
      .select(col("event_id"), round(col("z"), 6).as("z"), round(col("minmax"), 6).as("m"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val wantF = operators.MLPrep.q70_feature_scale(spark, sf)
      .select("event_id", "z", "mm")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(gotF == wantF)
    // mergeIntervals vs q69 rollup
    val iv = Tables.orders(spark, sf)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("s0"))
      .withColumn("e0", date_add(col("s0"), 30))
    val gotM = GraftOps.mergeIntervals(iv, col("o_custkey"), col("s0"), col("e0"))
      .groupBy(col("key").as("o_custkey"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(datediff(col("end"), col("start"))).cast("long").as("covered_days"),
        max("n_merged").as("max_merged"))
    val wantM = operators.Relational9.q69_merge_intervals(spark, sf)
    assert(gotM.exceptAll(wantM).isEmpty && wantM.exceptAll(gotM).isEmpty)
  }

  test("Expectations: violations counted exactly, assertAll gates") {
    import spark.implicits._
    import graft.api.Expectations._
    val df = Seq(
      (1L, Some(10.0), "ok"), (2L, None, "ok"),      // one null
      (3L, Some(-5.0), "bad!"), (3L, Some(20.0), "ok") // range + regex + dup key
    ).toDF("id", "v", "s")
    val rep = evaluate(df, Seq(
      NotNull("v"), InRange("v", 0.0, 15.0), Matches("s", "^[a-z]+$"),
      Unique(Seq("id")))).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(rep("not_null(v)") == (1L, false))
    assert(rep("in_range(v,0.0,15.0)") == (2L, false)) // -5 and 20
    assert(rep("matches(s)") == (1L, false))
    assert(rep("unique(id)") == (1L, false))
    intercept[IllegalStateException] {
      assertAll(df, Seq(NotNull("v")))
    }
    assertAll(df, Seq(NotNull("id"))) // passes quietly
  }

  test("oneHot/targetEncode/quantileBucket agree with oracle query formulations") {
    val o = Tables.orders(spark, sf)
    // oneHot vs q71 columns
    val gotO = GraftOps.oneHot(o.filter(col("o_orderkey") % 50 === 0),
        col("o_orderstatus"), Seq("F", "O", "P"), "s")
      .select(col("o_orderkey"), col("s_F"), col("s_O"), col("s_P"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val wantO = operators.MLPrep.q71_one_hot(spark, sf)
      .select("o_orderkey", "s_f", "s_o", "s_p")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(gotO == wantO)
    // targetEncode vs q74 encoder values
    val gotT = GraftOps.targetEncode(o, col("o_orderpriority"),
        col("o_orderstatus") === "F")
      .select(col("o_orderpriority"), round(col("target_enc"), 9).as("e"))
      .distinct().collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wantT = operators.MLPrep.q74_target_encode(spark, sf)
      .select("o_orderpriority", "enc")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gotT == wantT)
    // quantileBucket: deciles of event value reproduce q72's assignment
    val ev = Tables.events(spark, sf)
    val gotQ = GraftOps.quantileBucket(ev, col("value"),
        Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
      .groupBy("bucket").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantQ = operators.MLPrep.q72_decile_lift(spark, sf)
      .select("decile", "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotQ == wantQ)
  }

  test("new verbs are partition-invariant (repartitioned input, identical output)") {
    val ev = Tables.events(spark, sf)
    val ev13 = ev.repartition(13)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    assert(rows(ev.latestPerKey(col("user_id"), col("ts"), col("event_id"))) ==
      rows(ev13.latestPerKey(col("user_id"), col("ts"), col("event_id"))))
    assert(rows(ev.sessionize(col("user_id"), col("ts"))
        .select("event_id", "session_id")) ==
      rows(ev13.sessionize(col("user_id"), col("ts"))
        .select("event_id", "session_id")))
    val docs = Tables.documents(spark, sf)
    assert(rows(GraftOps.chunk(docs, col("text"), 32, 24)
        .select("doc_id", "chunk_id", "chunk_tokens")) ==
      rows(GraftOps.chunk(docs.repartition(7), col("text"), 32, 24)
        .select("doc_id", "chunk_id", "chunk_tokens")))
    val iv = Tables.orders(spark, sf)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("s0"))
      .withColumn("e0", date_add(col("s0"), 30))
    assert(rows(GraftOps.mergeIntervals(iv, col("o_custkey"), col("s0"), col("e0"))) ==
      rows(GraftOps.mergeIntervals(iv.repartition(11), col("o_custkey"), col("s0"), col("e0"))))
    assert(rows(GraftOps.spanDedup(docs, col("doc_id"), col("text"))) ==
      rows(GraftOps.spanDedup(docs.repartition(9), col("doc_id"), col("text"))))
    val cust = Tables.customer(spark, sf)
    val blk = substring(col("c_name"), 10, 7)
    assert(rows(GraftOps.bestMatch(cust, col("c_custkey"), col("c_name"), blk)) ==
      rows(GraftOps.bestMatch(cust.repartition(9), col("c_custkey"), col("c_name"), blk)))
  }

  test("facade verbs behave on empty and singleton inputs") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String)].toDF("id", "text")
    assert(GraftOps.chunk(emptyDocs, col("text"), 32, 24).count() == 0)
    assert(GraftOps.jaccardJoin(emptyDocs, col("id"), col("text"), 0.5).count() == 0)
    assert(GraftOps.bm25(emptyDocs, col("id"), col("text"), Seq("x")).count() == 0)
    val oneEvent = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L))
      .toDF("event_id", "ts", "user_id")
    val lpk = GraftOps.latestPerKey(oneEvent, col("user_id"), Seq(col("ts")))
    assert(lpk.count() == 1)
    val sess = GraftOps.sessionize(oneEvent, col("user_id"), col("ts"))
    assert(sess.select("session_id").head().getLong(0) == 1L)
    val oneIv = Seq((1L, java.sql.Date.valueOf("2024-01-01"),
      java.sql.Date.valueOf("2024-01-31"))).toDF("k", "s", "e")
    val mi = GraftOps.mergeIntervals(oneIv, col("k"), col("s"), col("e"))
    assert(mi.count() == 1 && mi.head().getLong(3) == 1L)
    // chunk of a 1-token doc: one chunk, full coverage
    val tiny = Seq((1L, "word")).toDF("id", "text")
    val ch = GraftOps.chunk(tiny, col("text"), 32, 24).collect()
    assert(ch.length == 1 && ch(0).getAs[Long]("chunk_tokens") == 1L)
  }

  test("idGaps and novelty agree with their oracle query formulations") {
    // idGaps vs q75 on the lineitem order-key stream
    val got = GraftOps.idGaps(Tables.lineitem(spark, sf), col("l_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = operators.Relational9.q75_id_gaps(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
    // novelty vs t17 (facade splits \s+, t17 splits ' ' — same corpus)
    val gotN = GraftOps.novelty(Tables.documents(spark, sf),
        col("doc_id"), col("text"), 4)
      .select(col("id"), col("n_grams"), col("n_novel")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val wantN = operators.TextAnalysis5.t17_novelty(spark, sf)
      .select("doc_id", "n_grams", "n_novel").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotN == wantN)
    // gap-free sequence -> empty report
    import spark.implicits._
    val dense = (0L to 99L).toDF("k")
    assert(GraftOps.idGaps(dense, col("k")).count() == 0)
  }

  test("topKPerKey: equals the window formulation, prunes pre-shuffle, partition-invariant") {
    val ev = Tables.events(spark, sf)
    val got = GraftOps.topKPerKey(ev, "event_type", "value", "event_id", 3)
      .select("event_type", "rn", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
    val want = ev.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3).select("event_type", "rn", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want && got.nonEmpty)
    // partition invariance
    val re = GraftOps.topKPerKey(ev.repartition(13), "event_type", "value", "event_id", 3)
      .select("event_type", "rn", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(re == want)
    // the map-side stage bounds what reaches the shuffle:
    // <= numPartitions x distinctKeys x k rows survive pruning
    val parts = ev.rdd.getNumPartitions
    val keys = ev.select("event_type").distinct().count()
    val pruned = GraftOps.partialTopK(ev, "event_type", "value", "event_id", 3).count()
    assert(pruned <= parts * keys * 3, s"pruned=$pruned parts=$parts keys=$keys")
    assert(pruned < ev.count(), "pruning must shrink the shuffle input")
  }

  test("conform aligns schema: order, casts, typed nulls, dropped extras, idempotent") {
    import spark.implicits._
    val feed = Seq((1, "a", 2.5), (2, "b", 3.5)).toDF("id", "extra", "score")
    val ddl = "id BIGINT, score DECIMAL(10,2), label STRING"
    val out = GraftOps.conform(feed, ddl)
    // names + types align (nullability may tighten when the source is non-null)
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      org.apache.spark.sql.types.StructType.fromDDL(ddl).map(f => (f.name, f.dataType)))
    assert(out.columns.toSeq == Seq("id", "score", "label"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getLong(0) == 1L)
    assert(rows(0).getDecimal(1).toPlainString == "2.50")
    assert(rows(0).isNullAt(2), "missing column must be null")
    // idempotent + unionable with an already-conformed frame
    val again = GraftOps.conform(out, ddl)
    assert(again.exceptAll(out).isEmpty && out.exceptAll(again).isEmpty)
    assert(out.unionByName(again).count() == 4)
    // zero shuffle: pure projection
    assert(api.PlanAudit.isShuffleFree(GraftOps.conform(feed, ddl)))
  }

  test("profile and corrMatrix agree with their oracle query formulations") {
    val li = Tables.lineitem(spark, sf)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val gotP = GraftOps.profile(li, cols)
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("min_v"), col("max_v"), round(col("mean_v"), 9).as("m"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val wantP = operators.Quality.v05_profile(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(gotP == wantP)
    val gotC = GraftOps.corrMatrix(li, cols)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val wantC = operators.Quality.v06_corr_matrix(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(gotC == wantC && gotC.size == 6)
    // single-pass shape: profile/corrMatrix never scan once per column
    val nScans = "lineitem\\.parquet".r
      .findAllIn(GraftOps.corrMatrix(li, cols).queryExecution.executedPlan.toString).size
    assert(nScans == 1, s"corrMatrix scanned lineitem $nScans times")
  }

  test("containmentJoin / gopherFilter / dedupManifest agree with their oracle query formulations") {
    // independent reference: the naive full×full shared-shingle
    // co-occurrence plan (d17's pre-round-3 formulation) — the
    // prefix-probe candidate filter must be lossless against it
    val naive = {
      val shingled = docs
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), expr(
          """array_distinct(transform(
               sequence(1, greatest(size(w) - 2, 0)),
               i -> xxhash64(concat_ws(' ', slice(w, i, 3)))))""").as("shs"))
        .select(col("doc_id"), size(col("shs")).cast("long").as("n"),
          explode(col("shs")).as("tok"))
      val x = shingled.select(col("doc_id").as("da"), col("n").as("na"), col("tok"))
      val y = shingled.select(col("doc_id").as("db"), col("n").as("nb"), col("tok"))
      x.join(y, "tok").where(col("da") < col("db"))
        .groupBy("da", "db", "na", "nb")
        .agg(count(lit(1)).as("shared"))
        .withColumn("cont_ab", col("shared").cast("double") / col("na"))
        .withColumn("cont_ba", col("shared").cast("double") / col("nb"))
        .filter(col("cont_ab") >= 0.8 || col("cont_ba") >= 0.8)
        .select("da", "db", "shared", "cont_ab", "cont_ba")
    }
    val viaApi = docs.containmentJoin(col("doc_id"), col("text"), 0.8)
      .select(col("id_a").as("da"), col("id_b").as("db"),
        col("shared"), col("cont_ab"), col("cont_ba"))
    assert(viaApi.exceptAll(naive).isEmpty && naive.exceptAll(viaApi).isEmpty)
    val d17 = operators.Dedup3.d17_containment(spark, sf)
      .select("da", "db", "shared", "cont_ab", "cont_ba")
    assert(viaApi.exceptAll(d17).isEmpty && d17.exceptAll(viaApi).isEmpty)
    // the documented-recall df-cap: a cap above every shingle's df is
    // lossless; a tight cap may only LOSE pairs, never invent them, and
    // surviving pairs keep their exact verified values
    val base = GraftOps.containmentJoin(docs, col("doc_id"), col("text"), 0.8)
    val uncapped = GraftOps.containmentJoin(docs, col("doc_id"), col("text"),
      0.8, maxDf = 1000000L)
    assert(uncapped.exceptAll(base).isEmpty && base.exceptAll(uncapped).isEmpty)
    val capped = GraftOps.containmentJoin(docs, col("doc_id"), col("text"),
      0.8, maxDf = 2L)
    assert(capped.exceptAll(base).isEmpty,
      "df cap must only lose pairs (subset with exact values), never invent or alter them")

    val gf = docs.gopherFilter(col("text"))
      .select("doc_id", "n_words", "mean_wlen", "frac_alpha", "n_stop", "reasons", "keep")
    val t18 = operators.TextAnalysis6.t18_gopher_filter(spark, sf)
    assert(gf.exceptAll(t18).isEmpty && t18.exceptAll(gf).isEmpty)

    val dm = docs.dedupManifest(col("doc_id"), col("text"), 0.5)
      .select(col("id").as("doc_id"), col("status"), col("ref_id").as("ref_doc"))
    val d15 = operators.Dedup3.d15_dedup_manifest(spark, sf)
    assert(dm.exceptAll(d15).isEmpty && d15.exceptAll(dm).isEmpty)
  }

  test("jaccardJoinBanded matches the exact shingle join; lsh-routed manifest matches shingle-routed") {
    // the banded path verifies exactly — only candidate RECALL is
    // probabilistic, and at 16×4 bands the seeded near-dup pairs
    // (jaccard ≈ 0.98) are missed w.p. ~1e-18, so outputs are equal
    val exact = docs.jaccardJoin(col("doc_id"), col("text"), 0.5)
    val banded = docs.jaccardJoinBanded(col("doc_id"), col("text"), 0.5)
    assert(banded.exceptAll(exact).isEmpty && exact.exceptAll(banded).isEmpty)

    val viaShingle = docs.dedupManifest(col("doc_id"), col("text"), 0.5, "shingle")
    val viaLsh = docs.dedupManifest(col("doc_id"), col("text"), 0.5, "lsh")
    assert(viaLsh.exceptAll(viaShingle).isEmpty && viaShingle.exceptAll(viaLsh).isEmpty)

    // "session" honors the spark conf
    spark.conf.set("graft.neardup.strategy", "lsh")
    try {
      val pairs = docs.nearDupPairs(col("doc_id"), col("text"), 0.5)
      assert(pairs.exceptAll(exact).isEmpty && exact.exceptAll(pairs).isEmpty)
    } finally spark.conf.unset("graft.neardup.strategy")
    intercept[IllegalArgumentException] {
      docs.nearDupPairs(col("doc_id"), col("text"), 0.5, strategy = "bogus")
    }
  }

  test("globalRank / globalTopK equal the unpartitioned-window rank, partition-invariantly") {
    import org.apache.spark.sql.expressions.Window
    val vocab = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    val want = vocab.withColumn("rank",
        row_number().over(Window.partitionBy(lit(1)).orderBy(desc("n"), col("word"))).cast("long"))
      .select("word", "n", "rank")
    val got = GraftOps.globalRank(vocab, desc("n"), col("word"))
      .select("word", "n", "rank")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // invariant under input partitioning
    val got7 = GraftOps.globalRank(vocab.repartition(7), desc("n"), col("word"))
      .select("word", "n", "rank")
    assert(got7.exceptAll(want).isEmpty && want.exceptAll(got7).isEmpty)
    // top-k prune path agrees with the full rank's first k
    val k = 25
    val gotK = GraftOps.globalTopK(vocab, "n", "word", k).select("word", "n", "rank")
    val wantK = want.filter(col("rank") <= k)
    assert(gotK.exceptAll(wantK).isEmpty && wantK.exceptAll(gotK).isEmpty)
    // no unpartitioned window anywhere in either plan
    Seq(got, gotK).foreach { df =>
      val unpartitioned = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      assert(unpartitioned.isEmpty, "found an unpartitioned window")
    }
    // edges: empty input; k larger than the row count
    val empty = vocab.filter(lit(false))
    assert(GraftOps.globalRank(empty, desc("n"), col("word")).count() == 0)
    assert(GraftOps.globalTopK(empty, "n", "word", 5).count() == 0)
    val all = GraftOps.globalTopK(vocab, "n", "word", 1000000)
    assert(all.count() == vocab.count())
    assert(all.agg(max("rank")).head().getLong(0) == vocab.count())
  }

  test("skyline2d equals brute-force NOT-EXISTS dominance, partition-invariantly") {
    // a frame with real dominance structure: (quantity maximize,
    // price minimize) cells from lineitem
    val li = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long").as("q"),
        col("l_extendedprice").as("p"))
    val cells = li.groupBy("q", "p").agg(count(lit(1)).as("n_rows"))
    val want = cells.as("c").join(cells.as("o"),
        col("o.q") >= col("c.q") && col("o.p") <= col("c.p") &&
          (col("o.q") > col("c.q") || col("o.p") < col("c.p")),
        "left_anti")
      .select(col("q"), col("p"), col("n_rows"))
    val got = GraftOps.skyline2d(li, "q", "p")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // frontier is a strict staircase: sorted by q asc, price strictly rises
    val rows = got.orderBy("q").collect()
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(0) < b.getLong(0) && a.getDouble(1) < b.getDouble(1))
      case _ => ()
    }
    // invariant under input partitioning
    val got7 = GraftOps.skyline2d(li.repartition(7), "q", "p")
    assert(got7.exceptAll(want).isEmpty && want.exceptAll(got7).isEmpty)
    // no unpartitioned window in the sweep
    val unpartitioned = got.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty, "found an unpartitioned window")
    // edges: empty input; single row; total-order input (all on frontier)
    assert(GraftOps.skyline2d(li.filter(lit(false)), "q", "p").count() == 0)
    val one = li.limit(1)
    assert(GraftOps.skyline2d(one, "q", "p").count() == 1)
    val chain = spark.range(10).select(col("id").as("q"),
      col("id").cast("double").as("p"))
    assert(GraftOps.skyline2d(chain, "q", "p").count() == 10)
    // and an anti-chain where one point dominates all
    val dominated = spark.range(10).select(col("id").as("q"),
      (lit(100.0) - col("id")).as("p"))
    assert(GraftOps.skyline2d(dominated, "q", "p").count() == 1)
  }

  test("kmeans bounds SemDeDup clusters on skew-labeled data; assignment is deterministic") {
    val e = Tables.embeddings(spark, sf)
    val n = e.count()
    // pathological quantizer input: every row shares ONE label, so the
    // label-as-cluster pair join would be n² — kmeans must split it
    val skewed = e.withColumn("label", lit("only"))
    val asg = GraftOps.kmeans(skewed, col("vec_id"), col("embedding"), k = 20, iters = 2)
    assert(asg.count() == n)
    assert(asg.select("id").distinct().count() == n, "one cluster per id")
    val sizes = asg.groupBy("cluster").agg(count(lit(1)).as("c"))
    val maxC = sizes.agg(max("c")).head().getLong(0)
    assert(maxC <= n / 3,
      s"largest kmeans cluster $maxC exceeds n/3 = ${n / 3} — pair join not bounded")
    val range = asg.agg(min("cluster"), max("cluster")).head()
    assert(range.getLong(0) >= 1 && range.getLong(1) <= 20)
    // partition invariance: same assignment from a differently-sliced input
    val asg7 = GraftOps.kmeans(skewed.repartition(7), col("vec_id"), col("embedding"), 20, 2)
    assert(asg.exceptAll(asg7).isEmpty && asg7.exceptAll(asg).isEmpty)
    // semanticDedup over the label quantizer reproduces d14's keep stats
    val byLabel = GraftOps.semanticDedup(e, col("vec_id"), col("embedding"),
        col("label"), 0.3)
      .groupBy(col("cluster").as("label"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("n_removed", col("n_total") - col("n_kept"))
      .select("label", "n_total", "n_kept", "n_removed")
    val d14 = operators.Dedup3.d14_semantic_dedup(spark, sf)
    assert(byLabel.exceptAll(d14).isEmpty && d14.exceptAll(byLabel).isEmpty)
  }

  test("kmeans blocked assignment past the broadcast ceiling equals the single broadcast exactly") {
    val e = Tables.embeddings(spark, sf)
    // default ceiling (1e7 cells) -> single-broadcast path
    val single = GraftOps.kmeans(e, col("vec_id"), col("embedding"), k = 20, iters = 2)
    // force the ceiling below k×dims (20×64 = 1280 cells): 300 cells -> 5
    // cluster-id chunks — the blocked path a 768-dim k≈corpus/1000
    // SemDeDup quantizer takes at 100 TB, exercised here by shrinking the
    // budget instead of inflating the data
    spark.conf.set("graft.kmeans.broadcastCells", "300")
    try {
      val blocked = GraftOps.kmeans(e, col("vec_id"), col("embedding"), k = 20, iters = 2)
      assert(blocked.exceptAll(single).isEmpty && single.exceptAll(blocked).isEmpty,
        "blocked centroid assignment diverged from the single broadcast")
      // partition invariance holds on the blocked path too
      val blocked7 = GraftOps.kmeans(e.repartition(7), col("vec_id"), col("embedding"), 20, 2)
      assert(blocked.exceptAll(blocked7).isEmpty && blocked7.exceptAll(blocked).isEmpty)
      // degenerate budget (below one centroid's cells): one cluster per
      // chunk, capped at k chunks — still exact
      spark.conf.set("graft.kmeans.broadcastCells", "1")
      val oneEach = GraftOps.kmeans(e, col("vec_id"), col("embedding"), 20, 2)
      assert(oneEach.exceptAll(single).isEmpty && single.exceptAll(oneEach).isEmpty)
    } finally spark.conf.unset("graft.kmeans.broadcastCells")
  }

  test("spanDedup / blockedMatch agree with their oracle query formulations") {
    val sd = docs.spanDedup(col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), col("n_spans"), col("n_kept"), col("text_kept"))
    val d18 = operators.Dedup4.d18_span_dedup(spark, sf)
    assert(sd.exceptAll(d18).isEmpty && d18.exceptAll(sd).isEmpty)

    // blockedMatch pair count per block must equal d20's n_matches
    val cust = Tables.customer(spark, sf)
    val bm = cust.blockedMatch(col("c_custkey"), col("c_name"),
        substring(col("c_name"), 10, 7))
    val got = bm.join(cust, col("id_a") === col("c_custkey"))
      .groupBy(substring(col("c_name"), 10, 7).as("block_key"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = operators.Dedup4.d20_entity_resolution(spark, sf)
      .filter(col("n_matches") > 0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == want, s"$got vs $want")
    // every reported pair really is within distance 1
    assert(bm.filter(col("distance") > 1).count() == 0)

    // bestMatch agrees with the d21 query formulation
    val viaApi = cust.bestMatch(col("c_custkey"), col("c_name"),
        substring(col("c_name"), 10, 7))
      .select(col("id").as("id_a"), col("match_id").as("id_b"), col("jw"))
    val d21 = operators.Dedup4.d21_fuzzy_scores(spark, sf)
    assert(viaApi.exceptAll(d21).isEmpty && d21.exceptAll(viaApi).isEmpty)
  }

  test("deterministicSplit is partition-invariant with sane fractions") {
    val a = docs.deterministicSplit(col("doc_id"), Seq(0.8, 0.1, 0.1))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = docs.repartition(13)
      .deterministicSplit(col("doc_id"), Seq(0.8, 0.1, 0.1))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "split assignment depends on partitioning")
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size)
    assert(math.abs(frac(0) - 0.8) < 0.1 && frac.size == 3, frac.toString)
  }

  test("fdAudit on crafted frames: held and violated dependencies exact") {
    import spark.implicits._
    val held = Seq((1, "a"), (1, "a"), (2, "b"), (3, "a")).toDF("k", "v")
    val h = GraftOps.fdAudit(held, col("k"), col("v"), "held").collect()(0)
    assert(h.getAs[Boolean]("holds") && h.getAs[Long]("n_det") == 3
      && h.getAs[Long]("max_fanout") == 1)
    val broken = Seq((1, "a"), (1, "b"), (1, "c"), (2, "x")).toDF("k", "v")
    val b = GraftOps.fdAudit(broken, col("k"), col("v"), "broken").collect()(0)
    assert(!b.getAs[Boolean]("holds") && b.getAs[Long]("n_violating") == 1
      && b.getAs[Long]("max_fanout") == 3)
  }

  test("conversionHazard on a hand-computed micro-case") {
    import spark.implicits._
    // users: u1 converts on its first day (off=0); u2 first seen day 0,
    // converts day 2; u3 never converts, first seen the LAST corpus day
    // (so it is only observable at offset 0)
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", true),
      (2L, "2024-01-01 08:00:00", false),
      (2L, "2024-01-03 09:00:00", true),
      (3L, "2024-01-03 23:00:00", false)
    ).toDF("u", "tss", "conv").withColumn("ts", col("tss").cast("timestamp"))
    val h = GraftOps.conversionHazard(ev, col("u"), col("ts"), col("conv"), 4)
      .collect().map(r => r.getAs[Long]("d") ->
        (r.getAs[Long]("at_risk"), r.getAs[Long]("n_conv"))).toMap
    // d=0: all three observable & unconverted-so-far -> u1 converts
    assert(h(0L) == (3L, 1L))
    // d=1: u2 (still unconverted, horizon covers day 1); u3 censored out
    assert(h(1L) == (1L, 0L))
    // d=2: u2 converts
    assert(h(2L) == (1L, 1L))
    // d=3: nobody left at risk -> no row
    assert(!h.contains(3L))
  }

  test("linkPredict is invariant under edge order and partitioning") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L),
      (2L, 5L)).toDF("a", "b")
    val base = GraftOps.linkPredict(edges, col("a"), col("b"), 10)
      .collect().map(_.mkString("|"))
    val shuffled = GraftOps.linkPredict(
      edges.orderBy(desc("b"), col("a")).repartition(5), col("a"), col("b"), 10)
      .collect().map(_.mkString("|"))
    assert(base.sameElements(shuffled))
    // 1-4 share neighbors {2,3}: cn=2, deg(1)=2, deg(4)=3 -> j=2/3
    val top = GraftOps.linkPredict(edges, col("a"), col("b"), 1).collect()(0)
    assert(top.getAs[Long]("part_a") == 1L && top.getAs[Long]("part_b") == 4L)
    assert(top.getAs[Long]("cn") == 2L)
    assert(math.abs(top.getAs[Double]("jaccard") - 2.0 / 3.0) < 1e-8)
  }

  test("quotaSample rejects inputs carrying its reserved helper columns") {
    // silent withColumn replacement would corrupt a pre-existing `kept`
    // (or __src/__u/...) column; the verb must refuse loudly instead
    val clash = docs.withColumn("kept", lit(true))
    val e = intercept[IllegalArgumentException] {
      GraftOps.quotaSample(clash, col("doc_id"), col("source"), 10)
    }
    assert(e.getMessage.contains("kept"))
    // clean inputs still work and annotate every row
    val ok = GraftOps.quotaSample(docs, col("doc_id"), col("source"), 10)
    assert(ok.count() == docs.count())
  }

  test("triangleCensus agrees with the oracled g03 on an independently built edge frame") {
    import spark.implicits._
    // independent edge build: plain self-join form, REVERSED orientation
    // + a duplicate row, so the verb's normalization is exercised
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val e = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      .select(col("b").as("hi"), col("a").as("lo"))   // reversed
    val withDup = e.unionAll(e.limit(1))
    val verb = withDup.triangleCensus(col("hi"), col("lo")).collect()(0)
    val oracle = operators.Graph.g03_triangles(spark, sf).collect()(0)
    assert(verb.toSeq == oracle.toSeq,
      s"verb ${verb.toSeq} != g03 ${oracle.toSeq}")
    // both orientations produce the identical census
    spark.conf.set("graft.graph.orientation", "id")
    try {
      val idWay = withDup.triangleCensus(col("hi"), col("lo")).collect()(0)
      assert(idWay.toSeq == verb.toSeq)
    } finally spark.conf.unset("graft.graph.orientation")
    // the capped census is a subgraph census: every count bounded above
    spark.conf.set("graft.graph.maxDegree", "2")
    try {
      val capped = withDup.triangleCensus(col("hi"), col("lo")).collect()(0)
      assert(capped.getAs[Long]("n_edges") <= verb.getAs[Long]("n_edges"))
      assert(capped.getAs[Long]("n_triangles") <= verb.getAs[Long]("n_triangles"))
    } finally spark.conf.unset("graft.graph.maxDegree")
  }

  test("connectedComponents agrees with the oracled g04 component census") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val e = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      .select(col("b").as("s"), col("a").as("t"))     // reversed orientation
    val labels = e.connectedComponents(col("s"), col("t"))
    val got = labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"), max("node").as("max_part"))
      .orderBy("cluster_id").collect().map(_.toSeq)
    val want = operators.Graph.g04_cc(spark, sf).collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
    // every edge's endpoints share a label (it IS a valid partition)
    val lab = labels.withColumnRenamed("node", "s")
    val crossEdges = e.join(lab, "s")
      .join(labels.withColumnRenamed("node", "t")
        .withColumnRenamed("cluster_id", "c2"), "t")
      .filter(col("cluster_id") =!= col("c2")).count()
    assert(crossEdges == 0)
  }

  test("pagerank verb agrees with the oracled g01 ranks") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
    val raw = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
    val nodes = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long").as("node"))
    val got = GraftOps.pagerank(raw, col("s_nationkey"), col("c_nationkey"),
        lit(1L), nodes, iters = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = operators.Graph.g01_pagerank(spark, sf)
      .orderBy("node").collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Double]("pr")))
    assert(got.toSeq == want.toSeq)
    // derived vertex set (nodes = null): ranks still sum to ~1
    val auto = GraftOps.pagerank(raw, col("s_nationkey"),
      col("c_nationkey"), lit(1L))
    val mass = auto.agg(sum("pr")).collect()(0).getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-9, s"mass=$mass")
  }

  test("shardInterleave: per-(group, shard) balance within 1 by construction") {
    val sh = GraftOps.shardInterleave(docs, col("doc_id"), col("source"), 8)
    val counts = sh.groupBy("source", "shard")
      .agg(count(lit(1)).as("n")).collect()
    counts.groupBy(_.getAs[String]("source")).values.foreach { g =>
      val ns = g.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1, s"within-source imbalance: ${ns.toList}")
    }
  }
}
