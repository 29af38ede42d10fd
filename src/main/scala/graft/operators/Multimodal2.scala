package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal plumbing, part 2: batch assembly for downstream decode /
  * GPU stages.
  */
object Multimodal2 {
  type Q = (SparkSession, String) => DataFrame

  // ---- m03: size-aware batch assembly ----
  // Packs binary payloads into near-target-size batches per source
  // partition: batch_id = floor(exclusive-running-bytes / target). This is
  // the standard pre-GPU batching step — deterministic (ordered by doc_id,
  // never rand()), one window shuffle on the source key, and the batch
  // boundaries depend only on upstream bytes, so the same layout falls out
  // on any cluster size. Output is per-batch stats (id range, docs, bytes).
  val m03_size_batching: Q = (s, d) => {
    val target = 4096L
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars").cast("long").as("bytes"))
      .withColumn("cum_before", coalesce(sum("bytes").over(w), lit(0L)))
      .withColumn("batch_id", floor(col("cum_before") / target).cast("long"))
      .groupBy("source", "batch_id")
      .agg(count(lit(1)).as("n_docs"), sum("bytes").as("batch_bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "batch_id")
  }
  val m03Sql: String =
    """WITH c AS (SELECT source, doc_id, CAST(n_chars AS BIGINT) AS bytes,
             COALESCE(sum(CAST(n_chars AS BIGINT)) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
           FROM documents)
      SELECT source, CAST(floor(cum_before / 4096.0) AS BIGINT) AS batch_id,
             COUNT(*) AS n_docs, CAST(sum(bytes) AS BIGINT) AS batch_bytes,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM c GROUP BY 1, 2 ORDER BY source, batch_id"""

  // ---- m04: deterministic frame sampling + decode-batch assembly ----
  // The video-side plumbing: every asset (stub: duration derived from
  // n_chars) yields evenly-spaced frame offsets via a narrow sequence
  // explode — no driver loop, no rand(); offsets and batch boundaries
  // are pure functions of the asset row, so the layout is reproducible
  // on any cluster. Downstream a decoder consumes (asset, batch) groups
  // exactly like m02's per-partition codec.
  val m04_frame_sample: Q = (s, d) => {
    val assets = Tables.documents(s, d)
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("asset_id"),
        (col("n_chars").cast("long") * 10).as("duration_ms"))
    assets
      .select(col("asset_id"), col("duration_ms"),
        explode(expr("sequence(0L, duration_ms, 500L)")).as("off_ms"))
      .withColumn("batch_id", floor(col("off_ms") / 4000.0).cast("long"))
      .groupBy("asset_id", "batch_id")
      .agg(count(lit(1)).as("n_frames"),
        min("off_ms").as("first_off"), max("off_ms").as("last_off"))
      .orderBy("asset_id", "batch_id")
  }
  val m04Sql: String =
    """WITH a AS (SELECT doc_id AS asset_id, CAST(n_chars AS BIGINT)*10 AS duration_ms
             FROM documents WHERE doc_id % 20 = 0),
      f AS (SELECT asset_id, unnest(generate_series(0, duration_ms, 500)) AS off_ms
            FROM a)
      SELECT asset_id, CAST(floor(off_ms / 4000.0) AS BIGINT) AS batch_id,
             COUNT(*) AS n_frames, min(off_ms) AS first_off, max(off_ms) AS last_off
      FROM f GROUP BY 1, 2 ORDER BY asset_id, batch_id"""

  // ---- m05: decode validation + corrupt-payload quarantine ----
  // Every multimodal ingest needs a quarantine lane: payloads whose
  // validation fails route to a dead-letter output with a reason, the
  // rest proceed. Validation is STUBBED deterministically (no codec libs
  // in this container): "truncated" if the byte length is 0 mod 251,
  // "bad_magic" if the first byte is not a lowercase letter — but the
  // split-path plumbing (one scan, two filters off one validated frame,
  // union of disjoint lanes with a lane tag) is the real pattern, and it
  // stays a single narrow pass at any scale.
  val m05_quarantine: Q = (s, d) => {
    val validated = Tables.documents(s, d)
      .withColumn("byte_len",
        length(encode(col("text"), "UTF-8")).cast("long"))
      .withColumn("first_byte", ascii(substring(col("text"), 1, 1)).cast("long"))
      .withColumn("reason",
        when(col("byte_len") % 251 === 0, "truncated")
          .when(col("first_byte") < 97 || col("first_byte") > 122, "bad_magic")
          .otherwise("ok"))
    validated
      .groupBy("source", "reason")
      .agg(count(lit(1)).as("n"), sum("byte_len").as("bytes"))
      .orderBy("source", "reason")
  }
  val m05Sql: String =
    """WITH v AS (SELECT source,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte
           FROM documents),
      r AS (SELECT source, byte_len,
              CASE WHEN byte_len % 251 = 0 THEN 'truncated'
                   WHEN first_byte < 97 OR first_byte > 122 THEN 'bad_magic'
                   ELSE 'ok' END AS reason
            FROM v)
      SELECT source, reason, COUNT(*) AS n, CAST(sum(byte_len) AS BIGINT) AS bytes
      FROM r GROUP BY 1, 2 ORDER BY source, reason"""

  // ---- m06: magic-byte modality routing ----
  // The dispatch step in front of per-modality decode pools: classify
  // each opaque payload by its leading bytes (FFD8 jpeg / 4944 mp3 /
  // 0000..66747970 mp4 in a real lake; here the payloads are synthetic,
  // so the stand-in magic is the first hex digit of md5(payload) —
  // deterministic and oracle-replicable), then report per-lane volume
  // so decode capacity can be provisioned. The plumbing is the real
  // pattern: binary column in, a narrow CASE over a prefix (never a
  // full-payload scan), one partial-agg pass for the lane stats.
  val m06_modality_route: Q = (s, d) => {
    val routed = Tables.documents(s, d)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("magic", substring(md5(col("payload")), 1, 1))
      .withColumn("modality",
        when(col("magic") <= "5", "image")
          .when(col("magic") <= "a", "audio")
          .when(col("magic") <= "d", "video")
          .otherwise("text"))
      .withColumn("byte_len", length(col("payload")).cast("long"))
    routed.groupBy("modality")
      .agg(count(lit(1)).as("n_assets"),
        sum("byte_len").as("total_bytes"),
        max("byte_len").as("max_bytes"))
      .orderBy("modality")
  }
  val m06Sql: String =
    """WITH r AS (SELECT
          CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
          substring(md5(text), 1, 1) AS magic
        FROM documents),
      m AS (SELECT byte_len,
          CASE WHEN magic <= '5' THEN 'image'
               WHEN magic <= 'a' THEN 'audio'
               WHEN magic <= 'd' THEN 'video'
               ELSE 'text' END AS modality
        FROM r)
      SELECT modality, COUNT(*) AS n_assets,
             CAST(sum(byte_len) AS BIGINT) AS total_bytes,
             max(byte_len) AS max_bytes
      FROM m GROUP BY 1 ORDER BY 1"""

  // ---- m16: per-modality CAS savings report ----
  // m07 reports content-addressed dedup savings per SOURCE; capacity
  // planning needs them per MODALITY (image dedup pays for a thumbnail
  // cache, video dedup pays for a transcode farm). Same CAS ledger —
  // one 128-bit payload hash, one keeper groupBy, bytes stored once
  // per distinct payload — rolled up per m06's modality lanes, with
  // the dedup ratio that sizes each lane's store. Payload bytes ride
  // no shuffle; only (hash, modality, length) triples move.
  val m16_modality_cas_savings: Q = (s, d) => {
    val assets = Tables.documents(s, d)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("magic", substring(md5(col("payload")), 1, 1))
      .withColumn("modality",
        when(col("magic") <= "5", "image")
          .when(col("magic") <= "a", "audio")
          .when(col("magic") <= "d", "video")
          .otherwise("text"))
      .select(col("doc_id"), col("modality"),
        md5(col("payload")).as("h"),
        length(col("payload")).cast("long").as("bytes"))
    val owners = assets.groupBy("h").agg(min("doc_id").as("owner"))
    assets.join(owners, "h")
      .groupBy("modality")
      .agg(count(lit(1)).as("n_assets"),
        count(when(col("doc_id") === col("owner"), 1)).as("n_distinct"),
        sum("bytes").as("bytes_referenced"),
        sum(when(col("doc_id") === col("owner"), col("bytes"))
          .otherwise(lit(0L))).as("bytes_stored"))
      .withColumn("dedup_ratio", round(
        col("bytes_referenced").cast("double") / col("bytes_stored").cast("double"), 9))
      .orderBy("modality")
  }
  val m16Sql: String =
    """WITH a AS (SELECT doc_id,
             CASE WHEN substring(md5(text), 1, 1) <= '5' THEN 'image'
                  WHEN substring(md5(text), 1, 1) <= 'a' THEN 'audio'
                  WHEN substring(md5(text), 1, 1) <= 'd' THEN 'video'
                  ELSE 'text' END AS modality,
             md5(text) AS h,
             CAST(octet_length(encode(text)) AS BIGINT) AS bytes
           FROM documents),
      o AS (SELECT h, MIN(doc_id) AS owner FROM a GROUP BY 1)
      SELECT modality, COUNT(*) AS n_assets,
             COUNT(*) FILTER (WHERE doc_id = owner) AS n_distinct,
             CAST(SUM(bytes) AS BIGINT) AS bytes_referenced,
             CAST(SUM(CASE WHEN doc_id = owner THEN bytes ELSE 0 END)
               AS BIGINT) AS bytes_stored,
             round(CAST(SUM(bytes) AS DOUBLE)
                   / CAST(SUM(CASE WHEN doc_id = owner THEN bytes ELSE 0 END)
                          AS DOUBLE), 9) AS dedup_ratio
      FROM a JOIN o USING (h) GROUP BY 1 ORDER BY modality"""

  val queries: Map[String, Q] = Map(
    "m16_modality_cas_savings" -> m16_modality_cas_savings,
    "m06_modality_route" -> m06_modality_route,
    "m03_size_batching" -> m03_size_batching,
    "m04_frame_sample"  -> m04_frame_sample,
    "m05_quarantine"    -> m05_quarantine,
  )
  val oracles: Map[String, String] = Map(
    "m16_modality_cas_savings" -> m16Sql,
    "m06_modality_route" -> m06Sql,
    "m03_size_batching" -> m03Sql,
    "m04_frame_sample"  -> m04Sql,
    "m05_quarantine"    -> m05Sql,
  )
}
