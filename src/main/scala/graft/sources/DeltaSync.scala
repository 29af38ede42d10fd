package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental Delta → SnapshotTable sync driven by the row-level
  * change feed — the end-to-end consumer story for [[DeltaRead.changes]]
  * (round 9): a graft pipeline can mirror an externally-written Delta
  * table into its own ACID format paying only for the CHANGED rows on
  * the read side, never a full re-scan of the source.
  *
  * Per call:
  *   1. the last synced Delta version comes from the TARGET's own
  *      per-app transaction watermark (`delta-sync:<source>`), so sync
  *      state lives in exactly one transactional place and a replayed
  *      call is a detected no-op;
  *   2. `DeltaRead.changes(lastV, curV)` serves the row-level feed
  *      (cdc files when the source has CDF, DV-aware file-level
  *      derivation otherwise) — only changed/cdc files are read;
  *   3. the feed collapses to the LAST state per key — versions order,
  *      and within a version insert/update_postimage outranks
  *      delete/update_preimage (a COW rewrite surfaces unchanged rows
  *      as delete+insert pairs at the same version; the surviving
  *      state is the insert) — into an I/U/D batch;
  *   4. [[SnapshotTable.applyCdc]] lands it in ONE atomic commit with
  *      `batchId = curV` on the watermark — exactly-once even if the
  *      caller crashes between commits and replays.
  *
  * Bootstrap (target absent): an empty table is created with the
  * source schema and the full read at `bootstrapVersion` (default: the
  * source's latest) lands THROUGH applyCdc as inserts, so the first
  * watermark rides the same atomic commit as the rows.
  */
object DeltaSync {

  private def appIdFor(sourcePath: String): String =
    s"delta-sync:$sourcePath"

  /** One incremental sync step. Returns the Delta version the target
    * is now synced to. `keys` must identify rows in the source (the
    * MERGE contract).
    */
  def sync(spark: SparkSession, deltaPath: String, snapshotPath: String,
           keys: Seq[String], bootstrapVersion: Long = -1L): Long = {
    require(keys.nonEmpty, "sync needs at least one key column")
    val appId = appIdFor(deltaPath)
    val curV = DeltaRead.latestVersion(spark, deltaPath)
    val exists =
      try { SnapshotTable.latestVersion(spark, snapshotPath) > 0 }
      catch { case _: Exception => false }
    if (!exists) {
      val from = if (bootstrapVersion >= 0) bootstrapVersion else curV
      val full = DeltaRead.read(spark, deltaPath, from)
      SnapshotTable.create(full.limit(0), snapshotPath)
      SnapshotTable.applyCdc(spark, snapshotPath,
        full.withColumn("__op", lit("I")), keys, "__op", appId, from)
      if (from >= curV) return from
    }
    val lastV = SnapshotTable.lastTxn(spark, snapshotPath, appId)
    require(lastV >= 0,
      s"$snapshotPath exists but carries no '$appId' watermark — it was " +
        "not created by DeltaSync for this source; refusing to guess a " +
        "diff base")
    if (lastV >= curV) return lastV // nothing new
    // chunk the walk under the feed's span contract (changes() refuses
    // spans above graft.delta.changes.maxSpan): a mirror that lagged a
    // very long-lived source by 100k commits still syncs — chunked
    // feeds concatenate exactly, and the collapse below ranks on
    // _commit_version across the whole union
    val maxSpan = spark.conf.getOption("graft.delta.changes.maxSpan")
      .map(_.toLong).getOrElse(10000L)
    val steps = (Iterator.iterate(lastV)(v => math.min(v + maxSpan, curV))
      .takeWhile(_ < curV).toSeq :+ curV)
    val feed = steps.zip(steps.tail).map { case (a, b) =>
      DeltaRead.changes(spark, deltaPath, a, b)
    }.reduce(_ unionByName _)
    // last state per key: version first, then surviving-state rank
    val rank = when(col("_change_type").isin("insert",
      "update_postimage"), 1).otherwise(0)
    val keyCols = keys.map(col)
    val payload = feed.columns.toSeq
    val collapsed = feed
      .withColumn("__rank", rank)
      .groupBy(keyCols: _*)
      .agg(max_by(
        struct(col("__rank") +: payload.map(col): _*),
        struct(col("_commit_version"), col("__rank"))).as("__last"))
      .select(col("__last.*"))
    val batch = collapsed
      .withColumn("__op",
        when(col("__rank") === 1, lit("U")).otherwise(lit("D")))
      .drop("__rank", "_change_type", "_commit_version")
    SnapshotTable.applyCdc(spark, snapshotPath, batch, keys, "__op",
      appId, curV)
    curV
  }
}
