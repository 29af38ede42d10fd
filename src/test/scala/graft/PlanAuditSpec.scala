package graft

import org.scalatest.funsuite.AnyFunSuite

/** Encodes SURVEY.md §4's scale claims as plan-shape regression tests:
  * pushdown reaches the parquet scans, dimension joins broadcast, and
  * fact scans read only the projected columns.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestSession._

  test("PlanAudit.summarize counts wide stages and sees pushdown") {
    import org.apache.spark.sql.functions._
    import graft.api.PlanAudit
    // narrow map: no exchange at all
    val narrow = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("len"))
    assert(PlanAudit.isShuffleFree(narrow))
    val sNarrow = PlanAudit.summarize(narrow)
    assert(sNarrow.scans == 1 && sNarrow.exchanges == 0)
    // filtered agg: pushdown visible, exactly one shuffle
    val agg = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 10.0)
      .groupBy("l_returnflag").agg(count(lit(1)))
    val sAgg = PlanAudit.summarize(agg)
    assert(sAgg.exchanges == 1, s"expected one shuffle, got $sAgg")
    assert(sAgg.pushedFilters.exists(_.contains("GreaterThan(l_quantity,10.0)")))
    // broadcast join: broadcast exchange, no hash-shuffle of the fact side
    val bj = Tables.orders(spark, sf)
      .join(broadcast(Tables.customer(spark, sf)),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name")
    val sBj = PlanAudit.summarize(bj)
    assert(sBj.broadcasts == 1 && sBj.exchanges == 0, s"got $sBj")
  }

  import SparkTestSession._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: shipdate predicate pushed to parquet, pruned read schema") {
    val p = plan("q01_agg_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p.take(600))
    assert(!p.contains("l_orderkey"), "reads unprojected column l_orderkey")
  }

  test("q05: all four dimension joins broadcast, no sort-merge join") {
    val p = plan("q05_multi_join")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) == 4, p.take(400))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q03: joins broadcast; only the aggregation shuffles, after partial agg") {
    val p = plan("q03_join_agg_topn")
    assert(!p.contains("SortMergeJoin"), "join should broadcast, not sort-merge")
    val lines = p.linesIterator.toVector
    val exchange = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(exchange >= 0)
    assert(lines.drop(exchange).exists(_.contains("partial_sum")),
      "no map-side partial aggregation below the exchange")
  }

  test("d02: signature computation is pre-shuffle (expression in scan stage)") {
    val p = plan("d02_minhash_lsh")
    // minhash_signature must appear in a Project under the file scan side,
    // before any Exchange — i.e. the narrow map stage.
    val lines = p.linesIterator.toVector
    val sigLine = lines.indexWhere(_.contains("minhash_signature"))
    assert(sigLine >= 0, "no minhash_signature in plan")
    val exchangeBefore = lines.take(sigLine).exists(_.contains("Exchange hashpartitioning"))
    assert(!exchangeBefore || lines.drop(sigLine).exists(_.contains("FileScan")),
      "signature computed after a shuffle")
  }

  test("q20: global top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = plan("q20_topk_order")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
  }

  test("q26: deterministic sample filter pushes nothing but stays narrow") {
    val p = plan("q26_hash_sample")
    assert(!p.contains("Exchange hashpartitioning"), "sampling should not shuffle")
  }

  test("e06: event-type filters pushed to scan; purchase side broadcasts") {
    val p = plan("e06_funnel_conversion")
    assert(p.contains("EqualTo(event_type,view)"), "view filter not pushed")
    assert(p.contains("EqualTo(event_type,purchase)"), "purchase filter not pushed")
    assert(p.contains("LeftSemi"), "conversion test should be a semi join")
  }

  test("q63: SpaceSaving aggregation runs as partial agg before one shuffle") {
    val p = plan("q63_heavy_hitters")
    val lines = p.linesIterator.toVector
    val exchange = lines.indexWhere(_.contains("Exchange"))
    assert(exchange >= 0)
    assert(lines.drop(exchange).exists(l =>
      l.contains("partial_topkitems") || l.contains("partial_TopKItems")),
      "no map-side partial sketch below the exchange")
  }

  test("m03: batching is one shuffle on the source key (window + agg share it)") {
    val p = plan("m03_size_batching")
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 hash shuffle, saw $shuffles")
  }

  test("t07/t08: repetition + entropy metrics plan with no shuffle at all") {
    Seq("t07_repetition", "t08_entropy").foreach { name =>
      val p = plan(name)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$name: narrow per-row op should not shuffle (sort for output order is fine)")
    }
  }

  test("e11: per-type stats ride a broadcast join onto the daily rollup") {
    val p = plan("e11_anomaly")
    assert(p.contains("BroadcastHashJoin"), "stats join should broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("e12: attribution is one window pass — no clicks-x-purchases join") {
    val p = plan("e12_attribution")
    assert(!p.contains("Join"), "attribution must not join event subsets")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      "one user-partitioned window shuffle expected")
  }

  test("s06: centroid assignment broadcasts the k centroids (no shuffle join)") {
    val p = plan("s06_kmeans_refine")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroids should broadcast to the assignment pass")
    assert(!p.contains("SortMergeJoin"))
  }

  test("v03: one scan per fact table, FK columns only, dims broadcast raw") {
    val p = plan("v03_ref_integrity")
    // lineitem appears exactly once even though it carries three checks
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1, "lineitem scanned more than once")
    // its scan reads only the three FK columns
    val liScan = p.linesIterator.find(_.contains("lineitem.parquet")).get
    assert(liScan.contains("struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint>"), liScan)
    // no dim side pays a pre-broadcast aggregation (raw PK broadcast)
    assert(!p.contains("SortMergeJoin"), "FK audit should never sort-merge")
  }

  test("t13: eval gram index broadcasts; train grams shuffle once (doc agg)") {
    val p = plan("t13_contamination")
    val s = api.PlanAudit.summarize(SparkEntry.queries("t13_contamination")(spark, sf))
    assert(s.broadcasts >= 1, s"eval index should broadcast: $s")
    assert(!p.contains("SortMergeJoin"), "gram membership must not sort-merge")
  }

  test("q75: key stream never funnels through a single-task global window") {
    val p = plan("q75_id_gaps")
    // the global row_number windows exist, but only AFTER the anti-joins
    // shrink input to the gap set; the key-stream joins are hash joins
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin")
      || p.contains("SortMergeJoin"), p.take(400))
    val idx = p.indexOf("Window")
    assert(idx >= 0, "expected the pairing window")
  }

  test("m04: frame sampling stays narrow until the per-asset aggregation") {
    val p = plan("m04_frame_sample")
    val lines = p.linesIterator.toVector
    val explode = lines.indexWhere(_.contains("Generate explode"))
    val exchange = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(explode >= 0 && exchange >= 0 && explode > exchange,
      "sequence explode should sit below (after) the agg exchange in plan order")
  }

  test("t18: rule-suite filter is a pure narrow pass (no shuffle)") {
    val p = plan("t18_gopher_filter")
    assert(!p.contains("Exchange hashpartitioning"),
      "every rule is an array/string expression in the scan stage")
  }

  test("m06: modality routing is one partial-agg pass (single shuffle, partial below it)") {
    val p = plan("m06_modality_route")
    val lines = p.linesIterator.toVector
    assert(lines.count(_.contains("Exchange hashpartitioning")) == 1, p.take(400))
    val exchange = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(lines.drop(exchange).exists(_.contains("partial_")),
      "no map-side partial aggregation below the exchange")
  }

  test("e17: day-spine join broadcasts; no nested-loop range join forms") {
    val p = plan("e17_active_users")
    assert(p.contains("BroadcastHashJoin"), "day spine should broadcast equi-join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "range condition must be rewritten to offset-explode equi-join")
  }

  test("q78: count-min sketch aggregates partially before the single shuffle") {
    val p = plan("q78_countmin_freq")
    assert(p.contains("partial_countmin_agg"),
      "sketch buffers must merge map-side like any builtin aggregate")
  }

  test("d18: span dedup has no cartesian/nested-loop stage (content-keyed window only)") {
    val p = plan("d18_span_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "span dedup must never form document pairs")
  }

  test("q79: dimension joins broadcast; fact rolls up before touching the dim") {
    val p = plan("q79_dim_build")
    assert(p.contains("BroadcastHashJoin"), "nation must broadcast into the dim")
    assert(!p.contains("CartesianProduct"))
    // the orders rollup partially aggregates before its shuffle
    assert(p.contains("partial_count") || p.contains("partial"),
      "fact rollup must be map-side combinable")
  }

  test("e18: path mining is one user-keyed window + partial-agg path count") {
    val p = plan("e18_path_analysis")
    val lines = p.linesIterator.toVector
    assert(lines.count(_.contains("Exchange hashpartitioning")) <= 2,
      "expected only the user window shuffle + path-count shuffle")
    assert(p.contains("partial_count"), "path counting must combine map-side")
  }

  test("d20: blocked ER joins on the blocking key (hash join, never all-pairs)") {
    val p = plan("d20_entity_resolution")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidates must form only within blocks via an equi-join on the key")
  }

  test("m07: CAS ledger — payload bytes never enter a shuffle") {
    val p = plan("m07_asset_dedup")
    // the shuffled columns are (h, source, bytes[, doc_id]) — text/payload
    // must be projected away before every exchange
    val lines = p.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Exchange hashpartitioning")).foreach {
      case (l, _) => assert(!l.contains("text"), s"payload rides a shuffle: $l")
    }
  }

  test("t20: vocabulary rollup partially aggregates; windows run post-rollup only") {
    val p = plan("t20_vocab_coverage")
    assert(p.contains("partial_count"), "word counting must combine map-side")
  }

  test("fact-fact joins execute under AQE with skew-join enabled (q03/q05/q39)") {
    // the 100 TB skew story is AQE's runtime split of oversized shuffle
    // partitions — it only engages if both flags hold and the plan root
    // is adaptive; pin all three for the fact-join family
    assert(spark.conf.get("spark.sql.adaptive.enabled").toBoolean)
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled").toBoolean)
    Seq("q03_join_agg_topn", "q05_multi_join", "q39_salted_join").foreach { name =>
      val exec = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
      assert(
        exec.isInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec],
        s"$name does not execute under AdaptiveSparkPlanExec: ${exec.getClass}")
    }
  }

  test("q39 salting is semantics-preserving under forced skew") {
    import org.apache.spark.sql.functions._
    // forced-skew fixture: one hot key owns ~90% of the fact side
    val hot = spark.range(0, 9000).select(
      lit(7L).as("user_id"), (col("id") % 97).cast("double").as("value"))
    val cold = spark.range(0, 1000).select(
      (col("id") % 50).as("user_id"), (col("id") % 13).cast("double").as("value"))
    val fact = hot.unionByName(cold)
    val dim = spark.range(0, 50).select(
      col("id").as("c_custkey"),
      concat(lit("SEG"), (col("id") % 5)).as("c_mktsegment"))
    val SALT = 8
    val saltedDim = dim.withColumn("salt", explode(expr(s"sequence(0, ${SALT - 1})")))
    val saltedFact = fact.withColumn("salt", (col("user_id") % SALT).cast("int"))
    def rollup(joined: org.apache.spark.sql.DataFrame) = joined
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(30,6)")).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val salted = rollup(saltedFact.join(saltedDim,
      saltedFact("user_id") === saltedDim("c_custkey") &&
        saltedFact("salt") === saltedDim("salt")))
    val plain = rollup(fact.join(dim, fact("user_id") === dim("c_custkey")))
    assert(salted == plain && salted.nonEmpty,
      "salted join result diverges from the unsalted join under skew")
  }

  test("NO query plans an unpartitioned window (whole-suite audit)") {
    // `WindowExec: No Partition Defined` = the whole input funnels
    // through ONE task — the single worst silent scale hazard. Every
    // global ranking in the repo goes through globalRank/globalTopK or
    // an explicitly bounded coalesced-pid window instead; this pins it.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      if (bad.nonEmpty) Some(s"$name (${bad.size})") else None
    }
    assert(offenders.isEmpty, s"unpartitioned windows in: ${offenders.mkString(", ")}")
  }
}
