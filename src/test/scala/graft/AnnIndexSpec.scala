package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The persisted ANN index (annIndexBuild/annSearch): build once,
  * search reads probed cells through zone-map pruning; nprobe = k is
  * exact search.
  */
class AnnIndexSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.functions.cosine_sim

  private val K = 8

  private def buildIndex(): String = {
    val path = java.nio.file.Files
      .createTempDirectory("graft_ann").toString + "/idx"
    val emb = Tables.embeddings(spark, sf)
    api.GraftOps.annIndexBuild(emb, col("vec_id"), col("embedding"),
      path, k = K, iters = 2)
    path
  }

  test("nprobe = k is exact: index search equals brute-force top-k") {
    val path = buildIndex()
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.orderBy("vec_id").limit(5)
      .select(col("vec_id").as("qid"), col("embedding"))
    val got = api.GraftOps.annSearch(spark, path, queries,
        col("qid"), col("embedding"), nprobe = K, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).toSet
    // brute force over the same corpus with the same (cos DESC, id) order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("cos"), col("id"))
    val want = queries.crossJoin(
        emb.select(col("vec_id").as("id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vec")))
      .withColumn("cos", round(cosine_sim(
        expr("transform(embedding, x -> CAST(x AS DOUBLE))"), col("vec")), 9))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid").as("query_id"), col("rank").cast("long"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"exact search diverged: ${(got -- want).take(3)}")
    api.GraftOps.releaseCaches(); spark.catalog.clearCache()
  }

  test("probing few cells reads few files (zone-map pruning on the cell id)") {
    val path = buildIndex()
    // the rows table is clustered on `cluster`: a 2-cell probe must
    // open a strict subset of files
    val (total, kept) = sources.SnapshotTable.pruneReport(spark,
      s"$path/rows", "cluster IN (1, 2)")
    assert(total >= 4 && kept < total,
      s"cell probe did not prune files: $kept of $total")
    // lossy search still answers with well-formed ranks and recall > 0
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.orderBy("vec_id").limit(5)
      .select(col("vec_id").as("qid"), col("embedding"))
    val lossy = api.GraftOps.annSearch(spark, path, queries,
      col("qid"), col("embedding"), nprobe = 2, topK = 5)
    val byQ = lossy.groupBy("query_id").count().collect()
    assert(byQ.nonEmpty && byQ.forall(_.getLong(1) <= 5))
    // a vector's own cell is always probed first, so rank 1 of a corpus
    // query must be itself (cos 1.0)
    val self = lossy.filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(self.forall { case (q, id) => q == id },
      s"rank-1 must be the query itself: $self")
    api.GraftOps.releaseCaches(); spark.catalog.clearCache()
  }

  test("build is immutable; centroids are k decimal-exact rows") {
    val path = buildIndex()
    val cents = sources.SnapshotTable.read(spark, s"$path/centroids")
    assert(cents.count() <= K && cents.count() > 0)
    val dims = cents.select(size(col("centroid")).as("d")).distinct().collect()
    assert(dims.length == 1, "all centroids share the embedding dim")
    intercept[IllegalArgumentException] {
      api.GraftOps.annIndexBuild(Tables.embeddings(spark, sf),
        col("vec_id"), col("embedding"), path, k = K)
    }
    api.GraftOps.releaseCaches(); spark.catalog.clearCache()
  }
}
