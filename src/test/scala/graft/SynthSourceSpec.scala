package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** The custom DataSourceV2 connector (graft.sources.SynthDocsSource):
  * planning-time partition pruning from pushed filters, column pruning,
  * determinism, and short-name registration.
  */
class SynthSourceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def synth(rows: Long = 1000, partitions: Int = 8): DataFrame =
    spark.read.format("graft-synth")
      .option("rows", rows).option("partitions", partitions).load()

  test("reads the declared row count with the declared schema") {
    val df = synth()
    assert(df.count() == 1000)
    assert(df.schema.fieldNames.toSeq ==
      Seq("doc_id", "lang", "source", "text", "n_chars"))
    assert(df.agg(countDistinct("doc_id")).head.getLong(0) == 1000)
  }

  test("two reads are cell-identical (deterministic generation)") {
    val a = synth(500, 4)
    val b = synth(500, 7) // different partitioning, same content
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("doc_id range filter is pushed and prunes input partitions") {
    val full = synth(1000, 8)
    assert(full.rdd.getNumPartitions == 8)
    // ids 900..999 live in the last of 8 width-125 ranges
    val filtered = synth(1000, 8).filter(col("doc_id") >= 900)
    assert(filtered.rdd.getNumPartitions == 1,
      "planner should drop partitions whose id range cannot match")
    assert(filtered.count() == 100)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("graft-synth"), scan)
    // the handled predicate is re-applied nowhere: bounds live in the scan
    assert(scan.contains("bounds=[900,999]"), scan)
  }

  test("equality filter narrows to a single row without post-filtering") {
    val one = synth(1000, 8).filter(col("doc_id") === 421)
    assert(one.rdd.getNumPartitions == 1)
    assert(one.count() == 1)
    assert(one.head.getLong(0) == 421)
  }

  test("runtime filtering (DPP hook): join-derived id filters drop partitions at execution") {
    // unit-level: drive the SupportsRuntimeFiltering contract directly —
    // the end-to-end trigger depends on planner heuristics, the contract
    // itself must prune deterministically
    import org.apache.spark.sql.sources.{In, EqualTo}
    val scan = new sources.SynthScan(1000, 8, 42L,
      0, 999, sources.SynthDocsSource.fullSchema, Array.empty)
    assert(scan.planInputPartitions().length == 8)
    assert(scan.filterAttributes().map(_.describe()).toSeq == Seq("doc_id"))
    scan.filter(Array[org.apache.spark.sql.sources.Filter](In("doc_id", Array[Any](901L, 930L, 999L))))
    assert(scan.planInputPartitions().length == 1,
      "IN-set bounds [901,999] must prune to the last width-125 range")
    val eq = new sources.SynthScan(1000, 8, 42L,
      0, 999, sources.SynthDocsSource.fullSchema, Array.empty)
    eq.filter(Array[org.apache.spark.sql.sources.Filter](EqualTo("doc_id", java.lang.Long.valueOf(3L))))
    val ps = eq.planInputPartitions()
    assert(ps.length == 1 && ps(0).asInstanceOf[sources.SynthPartition] ==
      sources.SynthPartition(3L, 3L))
    // an unusable runtime filter prunes nothing (correctness over cleverness)
    val noop = new sources.SynthScan(1000, 8, 42L,
      0, 999, sources.SynthDocsSource.fullSchema, Array.empty)
    noop.filter(Array[org.apache.spark.sql.sources.Filter](EqualTo("lang", "en")))
    assert(noop.planInputPartitions().length == 8)
    // end-to-end: a selective join over the runtime-filterable column is
    // still exactly correct (pruning may pass a superset; the join trims)
    import spark.implicits._
    val dim = Seq(3L, 907L).toDF("doc_id")
    val joined = synth(1000, 8).join(dim, "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(joined.toSeq == Seq(3L, 907L))
  }

  test("non-id filters stay post-scan and still evaluate correctly") {
    val en = synth(300, 4).filter(col("lang") === "en")
    val n = en.count()
    assert(n > 0 && n < 300)
    assert(en.select("lang").distinct().head.getString(0) == "en")
  }

  test("column pruning reaches the reader (scan output excludes text)") {
    val slim = synth(200, 2).select("doc_id", "lang")
    val scanLine = slim.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.nonEmpty)
    // DSv2 prints the pruned output attribute list on the BatchScan node
    assert(!scanLine.contains("text#"),
      s"text should be pruned from the scan output: $scanLine")
    assert(slim.count() == 200)
  }

  test("n_chars matches the generated text length") {
    val df = synth(100, 2)
    assert(df.filter(length(col("text")) =!= col("n_chars")).isEmpty)
  }

  test("reported statistics drive an unhinted broadcast join") {
    // small synth side: stats say ~100 rows * ~300 B << the 10 MB
    // autoBroadcastJoinThreshold, so the planner must pick broadcast
    // WITHOUT any broadcast() hint
    val dim = spark.read.format("graft-synth")
      .option("rows", 100).option("partitions", 2).load()
      .select(col("doc_id"), col("lang"))
    val fact = Tables.orders(spark, sf)
    val joined = fact.join(dim, fact("o_orderkey") === dim("doc_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"stats-reported small side should broadcast unhinted: $plan")
    assert(joined.count() == 100)
  }

  test("COUNT(*) pushes down completely: answered from bounds, no generation") {
    val big = spark.read.format("graft-synth")
      .option("rows", 2000000000L).option("partitions", 64).load()
    // 2e9 rows would take minutes to generate; the pushed count is instant
    val t0 = System.nanoTime()
    assert(big.count() == 2000000000L)
    val dt = (System.nanoTime() - t0) / 1e9
    assert(dt < 30, s"count took ${dt}s — aggregate was not pushed")
    val counted = big.filter(col("doc_id") >= 1999999000L)
    assert(counted.count() == 1000)
    val scan = counted.groupBy().count()
      .queryExecution.executedPlan.toString
    assert(scan.contains("aggPushed=count(1000)"), scan)
  }

  test("micro-batch stream delivers all rows in rowsPerBatch slices") {
    val q = spark.readStream.format("graft-synth")
      .option("rows", 1000).option("rowsPerBatch", 300).load()
      .writeStream.format("memory").queryName("synth_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("synth_stream")
      assert(got.count() == 1000)
      assert(got.agg(countDistinct("doc_id")).head.getLong(0) == 1000)
      // 1000 rows at <=300/batch: at least 4 non-empty micro-batches
      val n = q.recentProgress.count(_.numInputRows > 0)
      assert(n >= 4, s"expected >=4 micro-batches, saw $n")
      // streamed content == batch content (same generator, same seed)
      val batch = synth(1000, 4)
      assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    } finally q.stop()
  }

  test("restart resumes from the checkpointed offset (no re-delivery)") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_synth_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_synth_out").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-synth")
        .option("rows", 600).option("rowsPerBatch", 200).load()
        .select("doc_id", "lang")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 600)
    run() // restart against the same checkpoint: source is exhausted
    // a correct source replays nothing after its committed final offset
    val back = spark.read.parquet(out)
    assert(back.count() == 600, "restart must not re-deliver committed batches")
    assert(back.agg(countDistinct("doc_id")).head.getLong(0) == 600)
  }
}
