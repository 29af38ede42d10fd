package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the round-2 operators that their DuckDB oracles can't
  * state directly: the connected-components fixpoint, repetition-metric
  * bounds, and redaction completeness.
  */
class Dedup2Spec extends AnyFunSuite {
  import SparkTestSession._

  test("d08: labels are a fixpoint and agree across every verified near-dup pair") {
    val labels = operators.Dedup2.clusterLabels(spark, sf)
    val lmap = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every verified pair's endpoints share a label
    val pairs = operators.Dedup.d03_ngram_jaccard(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(lmap(a) == lmap(b), s"pair ($a,$b) split across clusters")
    }
    // each label is the min doc_id of its own cluster (canonical rep)
    lmap.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.keys.min == cl, s"cluster $cl rep is not the min member")
    }
    // fixpoint: no label can still decrease across an edge
    pairs.foreach { case (a, b) =>
      assert(lmap(a) <= math.min(a, b) && lmap(b) <= math.min(a, b))
    }
  }

  test("d09: incremental dedup result is disjoint from the corpus hashes") {
    val out = operators.Dedup2.d09_incremental_dedup(spark, sf)
    val batchHashes = out.select("h").collect().map(_.getString(0)).toSet
    val corpusHashes = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 =!= 0)
      .select(expr("md5(trim(regexp_replace(lower(text), '\\\\s+', ' ')))"))
      .collect().map(_.getString(0)).toSet
    assert(batchHashes.intersect(corpusHashes).isEmpty)
    assert(out.where(col("doc_id") % 5 =!= 0).count() == 0)
  }

  test("t07: repetition fractions bounded in [0,1]; top word frac positive") {
    val r = operators.TextAnalysis2.t07_repetition(spark, sf)
      .agg(min("dup_2gram_frac"), max("dup_2gram_frac"),
        min("dup_3gram_frac"), max("dup_3gram_frac"),
        min("top_word_frac"), max("top_word_frac")).collect()(0)
    assert(r.getDouble(0) >= 0.0 && r.getDouble(1) <= 1.0)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getDouble(4) > 0.0 && r.getDouble(5) <= 1.0)
  }

  test("t06: redacted output contains no email or phone matches") {
    val out = operators.TextAnalysis2.t06_pii_redact(spark, sf)
    val leftovers = out.where(
      col("redacted").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
        col("redacted").rlike("\\+1-555-[0-9]{4}")).count()
    assert(leftovers == 0)
    assert(out.where(col("n_emails") < 1 || col("n_phones") < 1).count() == 0)
  }

  test("bloom: no false negatives; false-positive rate near theory") {
    import graft.functions.{bloom_agg, bloom_might_contain}
    import spark.implicits._
    val members = (0L until 2000L).map(i => s"member_$i")
    val outsiders = (0L until 2000L).map(i => s"outsider_$i")
    val bloom = members.toDF("v").agg(bloom_agg(col("v"), 1 << 16, 5).as("b"))
    val probed = members.toDF("v").union(outsiders.toDF("v"))
      .join(broadcast(bloom))
      .select(col("v"), bloom_might_contain(col("b"), col("v"), 5).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    members.foreach(m => assert(probed(m), s"false negative for $m"))
    val fp = outsiders.count(probed(_)).toDouble / outsiders.size
    // m=65536, n=2000, k=5 -> theoretical fp ~ (1-e^(-kn/m))^k ~ 5e-5
    assert(fp < 0.01, s"false-positive rate $fp too high")
  }

  test("d10: bloom-accelerated dedup returns exactly d09's rows") {
    val d9 = operators.Dedup2.d09_incremental_dedup(spark, sf)
    val d10 = operators.Dedup2.d10_bloom_dedup(spark, sf)
    assert(d10.exceptAll(d9).isEmpty && d9.exceptAll(d10).isEmpty)
  }

  test("d11: prefix-filtered join returns exactly d03's verified pairs") {
    val d3 = operators.Dedup.d03_ngram_jaccard(spark, sf)
    val d11 = operators.Dedup3.d11_prefix_join(spark, sf)
    assert(d11.exceptAll(d3).isEmpty && d3.exceptAll(d11).isEmpty)
  }

  test("d15: manifest covers every doc exactly once; statuses partition consistently") {
    val out = operators.Dedup3.d15_dedup_manifest(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.count() == nDocs)
    assert(out.select("doc_id").distinct().count() == nDocs)
    // kept rows have no ref; dup rows reference an earlier doc marked kept or exact-keeper
    assert(out.where(col("status") === "kept" && col("ref_doc").isNotNull).count() == 0)
    assert(out.where(col("status") =!= "kept" &&
      (col("ref_doc").isNull || col("ref_doc") >= col("doc_id"))).count() == 0)
    // a near_dup's ref must itself be a survivor of exact dedup (status kept or near_dup)
    val refStatus = out.where(col("status") === "near_dup")
      .join(out.select(col("doc_id").as("ref_doc"), col("status").as("ref_status")), "ref_doc")
    assert(refStatus.where(col("ref_status") === "exact_dup").count() == 0)
    out.unpersist()
  }

  test("q56: SCD2 invariants — one current row per key, closed rows precede opens") {
    val out = operators.Relational6.q56_scd2_merge(spark, sf)
    val byKey = out.groupBy("c_custkey")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_open"))
    assert(byKey.where(col("n_open") =!= 1).count() == 0)
    val bad = out.where(!col("is_current") &&
      (col("valid_to").isNull || col("valid_to") <= col("valid_from"))).count()
    assert(bad == 0)
  }
}
