package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** BPE tokenizer properties the DuckDB dump-replay oracle doesn't state:
  * merge-table determinism, lossless reconstruction, and the greedy
  * leftmost semantics on a hand-checkable corpus.
  */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tinyCorpus = {
    import spark.implicits._
    Seq("low low low lower lowest", "newer newer wider low").toDF("text")
  }

  test("training is deterministic and merges are frequency-greedy") {
    val m1 = api.GraftOps.bpeTrain(tinyCorpus, col("text"), numMerges = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    val m2 = api.GraftOps.bpeTrain(tinyCorpus.repartition(7), col("text"),
      numMerges = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(m1 == m2, "merges must not depend on partitioning")
    assert(m1.nonEmpty && m1.map(_._1) == (1 to m1.size))
    // 'low' appears 5 times (4 standalone + prefix of lower/lowest/wider? no
    // — as a WORD 5 times); pair (l,o) count >= 5 makes it the first merge
    // family: the first merge must involve the most frequent pair
    val first = m1.head
    assert(Set("l", "o", "w", "e", "r", "</w>", "lo", "ow", "er")
      .exists(s => first._2.contains(s) || first._3.contains(s)))
  }

  test("encoding reconstructs every word exactly (lossless tokens)") {
    val docs = Tables.documents(spark, sf).limit(200)
    val merges = api.GraftOps.bpeTrain(docs, col("text"), numMerges = 30)
    val enc = api.GraftOps.bpeEncodeWords(docs, col("text"), merges)
    val bad = enc
      .withColumn("rebuilt", concat_ws("", col("tokens")))
      .filter(col("rebuilt") =!= concat(col("word"), lit("</w>")))
    assert(bad.count() == 0, "token concatenation must rebuild word + </w>")
    // every token is either a merge product, a single char, or the marker
    val vocabTokens = enc.select(explode(col("tokens")).as("t")).distinct()
      .collect().map(_.getString(0)).toSet
    val merged = merges.collect().map(r => r.getString(1) + r.getString(2)).toSet
    vocabTokens.foreach { t =>
      assert(t == "</w>" || t.length == 1 || merged.contains(t),
        s"token '$t' is neither a char, the marker, nor a trained merge")
    }
  }

  test("greedy leftmost semantics on a hand-built case") {
    import spark.implicits._
    // corpus engineered so (a,a) is the first merge; 'aaa' must encode
    // leftmost-first as [aa, a</w>] or [aa, a, </w>]-family, never [a, aa...]
    val df = Seq("aa aa aa aa aaa").toDF("text")
    val merges = api.GraftOps.bpeTrain(df, col("text"), numMerges = 1)
    val m = merges.collect()
    assert(m.length == 1 && m(0).getString(1) == "a" && m(0).getString(2) == "a")
    val enc = api.GraftOps.bpeEncodeWords(df, col("text"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(enc("aaa") == Seq("aa", "a", "</w>"),
      s"leftmost merge violated: ${enc("aaa")}")
    assert(enc("aa") == Seq("aa", "</w>"))
  }

  test("token counts: per-doc sums over word occurrences") {
    import spark.implicits._
    val df = Seq((1L, "ab ab cd"), (2L, "ab")).toDF("doc_id", "text")
    val merges = api.GraftOps.bpeTrain(df, col("text"), numMerges = 2)
    val counts = api.GraftOps
      .bpeTokenCounts(df, col("doc_id"), col("text"), merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(counts(1L)._1 == 3 && counts(2L)._1 == 1)
    // doc 2's token count is exactly the encoding of 'ab'; doc 1 adds cd's
    assert(counts(1L)._2 > counts(2L)._2)
  }
}
