package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal plumbing, part 3: content-addressed asset storage. */
object Multimodal3 {
  type Q = (SparkSession, String) => DataFrame

  // ---- m07: content-addressed asset dedup (CAS savings report) ----
  // Multimodal corpora store payloads content-addressed: one physical
  // copy per distinct payload hash, refcounted. This op computes the
  // per-source storage ledger — assets, bytes referenced, bytes
  // physically stored (first occurrence corpus-wide owns the bytes),
  // bytes saved. One narrow hash pass over the payload column (the
  // payload here is the m01 stub: the text's UTF-8 bytes; a real corpus
  // hashes image/audio blobs the same way), one groupBy on the 128-bit
  // hash (uniform, skew-free), one metadata-sized source rollup. The
  // payload bytes ride no shuffle at all — only (hash, source, length)
  // triples move.
  val m07_asset_dedup: Q = (s, d) => {
    val assets = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        md5(encode(col("text"), "UTF-8")).as("h"),
        length(encode(col("text"), "UTF-8")).cast("long").as("bytes"))
    val owners = assets.groupBy("h")
      .agg(min("doc_id").as("owner_doc"))
    assets.join(owners, "h")
      .groupBy("source")
      .agg(count(lit(1)).as("n_assets"),
        sum("bytes").as("bytes_referenced"),
        sum(when(col("doc_id") === col("owner_doc"), col("bytes"))
          .otherwise(lit(0L))).as("bytes_stored"),
        sum(when(col("doc_id") =!= col("owner_doc"), col("bytes"))
          .otherwise(lit(0L))).as("bytes_saved"))
      .orderBy("source")
  }
  val m07Sql: String =
    """WITH a AS (SELECT doc_id, source, md5(text) AS h,
             CAST(octet_length(encode(text)) AS BIGINT) AS bytes
           FROM documents),
      o AS (SELECT h, min(doc_id) AS owner_doc FROM a GROUP BY h)
      SELECT source, COUNT(*) AS n_assets,
             CAST(sum(bytes) AS BIGINT) AS bytes_referenced,
             CAST(sum(CASE WHEN doc_id = owner_doc THEN bytes ELSE 0 END) AS BIGINT)
               AS bytes_stored,
             CAST(sum(CASE WHEN doc_id <> owner_doc THEN bytes ELSE 0 END) AS BIGINT)
               AS bytes_saved
      FROM a JOIN o USING (h)
      GROUP BY source ORDER BY source"""

  val queries: Map[String, Q] = Map(
    "m07_asset_dedup" -> m07_asset_dedup,
  )
  val oracles: Map[String, String] = Map(
    "m07_asset_dedup" -> m07Sql,
  )
}
