package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Deletion-vector AUTHORING ([[sources.DeltaWrite.deleteDv]] /
  * [[sources.DeltaWrite.upsertDv]]): merge-on-read deletes whose write
  * cost is the bitmap, not the data files — round-tripped through this
  * repo's own DV-applying reader, composed with time travel, OPTIMIZE
  * folding, VACUUM reachability, restore, and the change data feed.
  */
class DeltaDvWriteSpec extends AnyFunSuite {
  import SparkTestSession._
  import sources.{DeltaRead, DeltaWrite}

  private def tmp(): String =
    Files.createTempDirectory("graft_dvw").toString + "/t"

  private def rows(lo: Long, hi: Long, tag: String = "u") =
    spark.range(lo, hi).select(col("id").as("k"),
      concat(lit(tag), col("id").cast("string")).as("name"))

  private def kv(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("k", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def parquetFiles(dir: String): Set[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).toSet

  private def dvFiles(dir: String): Set[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("deletion_vector_"))
      .map(_.getName).toSet

  test("roaringSerialize round-trips through roaringPositions (sparse keys, >2^32)") {
    val cases = Seq(
      Array.empty[Long],
      Array(0L, 1L, 2L),
      Array(5L, 100000L, 7L, 5L), // dup tolerated upstream via distinct
      Array(1L, (1L << 32) + 3L, (5L << 32) + 9L), // sparse keys
      (0L until 10000L by 3).toArray)
    cases.foreach { ps =>
      val back = DeltaRead.roaringPositions(
        DeltaRead.roaringSerialize(ps.distinct))
      assert(back.sorted.toSeq == ps.distinct.sorted.toSeq,
        s"round-trip failed for ${ps.take(5).mkString(",")}…")
    }
    // out-of-domain positions refuse rather than truncate
    intercept[IllegalArgumentException] {
      DeltaRead.roaringSerialize(Array(-1L))
    }
  }

  test("deleteDv: O(bitmap) delete, data files untouched, replay no-op, masks merge") {
    val dir = tmp()
    DeltaWrite.create(rows(0, 50).coalesce(1), dir)
    DeltaWrite.append(rows(50, 100).coalesce(1), dir)
    val dataBefore = parquetFiles(dir)
    assert(dataBefore.size == 2)
    val v = DeltaWrite.deleteDv(spark, dir, "k >= 40 AND k < 45")
    assert(v == 2)
    // data files byte-identical set: the delete wrote NO parquet
    assert(parquetFiles(dir) == dataBefore,
      "merge-on-read delete must not rewrite or add data files")
    assert(dvFiles(dir).size == 1, "one DV file per commit")
    assert(kv(DeltaRead.read(spark, dir))
      == kv(rows(0, 40).union(rows(45, 100))))
    // time travel: prior versions intact
    assert(kv(DeltaRead.read(spark, dir, 1)) == kv(rows(0, 100)))
    // protocol upgraded to table features in the same commit
    val c2 = Files.readString(
      Paths.get(dir, "_delta_log", f"${2L}%020d.json"))
    assert(c2.contains("\"minReaderVersion\":3") &&
      c2.contains("deletionVectors") &&
      c2.contains("appendOnly"), // legacy-implied writer feature listed
      s"protocol upgrade missing: $c2")
    // replaying the SAME delete is a detected no-op (no new version,
    // no new DV file) — the exactly-once half of a foreachBatch delete
    assert(DeltaWrite.deleteDv(spark, dir, "k >= 40 AND k < 45") == 2)
    assert(dvFiles(dir).size == 1)
    // the re-add's stats are marked LOOSE per the protocol (min/max
    // describe the physical file, numRecords stays physical)
    assert(c2.contains("tightBounds"),
      "a DV re-add must mark its stats tightBounds:false")
    // a second predicate on the SAME file MERGES the masks (descriptor
    // replacement is a superset, per the protocol)
    assert(DeltaWrite.deleteDv(spark, dir, "k = 7") == 3)
    // the replaced file's tombstone carries its OLD DV descriptor so
    // third-party vacuum accounting can track the old .bin file
    val c3 = Files.readString(
      Paths.get(dir, "_delta_log", f"${3L}%020d.json"))
    val rm3 = c3.split("\n").filter(_.contains("\"remove\"")).toSeq
    assert(rm3.exists(_.contains("\"deletionVector\"")),
      s"the remove of a DV'd file must carry its descriptor: $rm3")
    assert(kv(DeltaRead.read(spark, dir))
      == kv(rows(0, 40).union(rows(45, 100))).filterNot(_._1 == 7))
    assert(kv(DeltaRead.read(spark, dir, 2))
      == kv(rows(0, 40).union(rows(45, 100))),
      "the pre-merge snapshot must keep serving the old mask")
    // stats pruning survives: the untouched file still prunes away
    val (total, kept) = DeltaRead.pruneReport(spark, dir, "k < 10")
    assert(total == 2 && kept == 1,
      s"carried-forward stats must still prune: $kept of $total")
  }

  test("upsertDv: matched rows masked in place, source lands as a fresh segment") {
    val dir = tmp()
    DeltaWrite.create(rows(0, 50).coalesce(1), dir)
    DeltaWrite.append(rows(50, 100).coalesce(1), dir)
    val dataBefore = parquetFiles(dir)
    val src = rows(40, 60, "new") // straddles both files
    val v = DeltaWrite.upsertDv(src, dir, Seq("k"))
    assert(v == 2)
    // the two original data files are still there, plus the new segment
    assert(dataBefore.subsetOf(parquetFiles(dir)),
      "DV upsert must not rewrite existing data files")
    assert(kv(DeltaRead.read(spark, dir))
      == kv(rows(0, 40).union(rows(40, 60, "new")).union(rows(60, 100))))
    assert(kv(DeltaRead.read(spark, dir, 1)) == kv(rows(0, 100)))
    // pure-insert merge: no DV file, no mask, just the segment
    val dir2 = tmp()
    DeltaWrite.create(rows(0, 10).coalesce(1), dir2)
    assert(DeltaWrite.upsertDv(rows(100, 105, "ins"), dir2, Seq("k")) == 1)
    assert(dvFiles(dir2).isEmpty)
    assert(kv(DeltaRead.read(spark, dir2))
      == kv(rows(0, 10).union(rows(100, 105, "ins"))))
    // upserting the SAME source again: keys now match the new segment —
    // masks it and re-lands, read stays fixed-point
    assert(DeltaWrite.upsertDv(rows(100, 105, "ins"), dir2, Seq("k")) == 2)
    assert(kv(DeltaRead.read(spark, dir2))
      == kv(rows(0, 10).union(rows(100, 105, "ins"))))
  }

  test("lifecycle: vacuum keeps live DV files; optimize folds the mask; then vacuum GCs it") {
    val dir = tmp()
    DeltaWrite.create(rows(0, 50).coalesce(1), dir)
    DeltaWrite.deleteDv(spark, dir, "k % 10 = 3")
    val dv = dvFiles(dir)
    assert(dv.size == 1)
    val expected = kv(rows(0, 50)).filterNot(_._1 % 10 == 3)
    // a LIVE DV file is referenced — vacuum must not touch it
    Thread.sleep(5)
    DeltaWrite.vacuum(spark, dir, retainMillis = 0L)
    assert(dvFiles(dir) == dv, "vacuum must keep live DV files")
    assert(kv(DeltaRead.read(spark, dir)) == expected)
    // optimize folds: rewritten file drops the mask and the dead rows
    val vOpt = DeltaWrite.optimize(spark, dir)
    assert(vOpt == 2)
    val cOpt = Files.readString(
      Paths.get(dir, "_delta_log", f"$vOpt%020d.json"))
    assert(!cOpt.split("\n").filter(_.contains("\"add\""))
        .exists(_.contains("deletionVector")),
      s"optimize must fold authored DVs, not carry them: $cOpt")
    assert(kv(DeltaRead.read(spark, dir)) == expected)
    // the folded DV file is unreachable from the CURRENT version and
    // carries no tombstone — the orphan clause reclaims it
    Thread.sleep(5)
    DeltaWrite.vacuum(spark, dir, retainMillis = 0L)
    assert(dvFiles(dir).isEmpty, "folded DV file must be GC'd")
    assert(kv(DeltaRead.read(spark, dir)) == expected)
  }

  test("restore across a DV delete round-trips both directions") {
    val dir = tmp()
    DeltaWrite.create(rows(0, 30).coalesce(1), dir)
    DeltaWrite.deleteDv(spark, dir, "k < 5")
    val masked = kv(rows(5, 30))
    assert(kv(DeltaRead.read(spark, dir)) == masked)
    // back to the pre-delete table: full rows, no mask
    DeltaWrite.restore(spark, dir, 0)
    assert(kv(DeltaRead.read(spark, dir)) == kv(rows(0, 30)))
    // forward again: the DV descriptor (and its on-disk file) re-attach
    DeltaWrite.restore(spark, dir, 1)
    assert(kv(DeltaRead.read(spark, dir)) == masked)
  }

  test("deleteDvBatch: exactly-once replay semantics — batch identity, not predicate idempotence") {
    val dir = tmp()
    DeltaWrite.create(rows(0, 50).coalesce(1), dir)
    assert(DeltaWrite.deleteDvBatch(spark, dir, "k >= 40", "app", 0L) == 1)
    assert(kv(DeltaRead.read(spark, dir)) == kv(rows(0, 40)))
    // replaying batch 0 is a detected no-op
    assert(DeltaWrite.deleteDvBatch(spark, dir, "k >= 40", "app", 0L) == 1)
    // a NO-MATCH batch still publishes its watermark (empty commit)
    assert(DeltaWrite.deleteDvBatch(spark, dir, "k >= 1000", "app", 1L)
      == 2)
    // rows matching batch 1's predicate arrive LATER…
    DeltaWrite.append(rows(1000, 1005).coalesce(1), dir)
    // …a restart's replay of batch 1 must NOT delete them: replay
    // semantics are batch identity, not predicate idempotence
    assert(DeltaWrite.deleteDvBatch(spark, dir, "k >= 1000", "app", 1L)
      == 3)
    assert(kv(DeltaRead.read(spark, dir))
      == kv(rows(0, 40).union(rows(1000, 1005))))
    // the NEXT batch with the same predicate deletes them
    assert(DeltaWrite.deleteDvBatch(spark, dir, "k >= 1000", "app", 2L)
      == 4)
    assert(kv(DeltaRead.read(spark, dir)) == kv(rows(0, 40)))
  }

  test("DV authoring refuses colliding basenames (external layout) rather than crossing masks") {
    // hand-built partitioned table whose two files SHARE a basename —
    // the position-mask keying would cross files, so the writer must
    // refuse (the reader side handles this case with full-path tags)
    val dir = tmp()
    val df = rows(0, 10)
    def drop(rel: String, lo: Long, hi: Long): Long = {
      val stage = Files.createTempDirectory("graft_dvc").toString
      rows(lo, hi).coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(Paths.get(dir, rel).getParent)
      Files.copy(part.toPath, Paths.get(dir, rel))
      Files.size(Paths.get(dir, rel))
    }
    val s1 = drop("p=a/f0.parquet", 0, 5)
    val s2 = drop("p=b/f0.parquet", 5, 10)
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    val schemaJson = spark.sql(
      "SELECT CAST(1 AS BIGINT) k, 'x' name, 'a' p").schema.json
      .replace("\"", "\\\"")
    Files.writeString(Paths.get(dir, "_delta_log", f"${0L}%020d.json"),
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"c","format":{"provider":"parquet"},""" +
          s""""schemaString":"$schemaJson","partitionColumns":["p"],""" +
          s""""configuration":{}}}""",
        s"""{"add":{"path":"p=a/f0.parquet","partitionValues":{"p":"a"},""" +
          s""""size":$s1,"modificationTime":0,"dataChange":true}}""",
        s"""{"add":{"path":"p=b/f0.parquet","partitionValues":{"p":"b"},""" +
          s""""size":$s2,"modificationTime":0,"dataChange":true}}""")
        .mkString("\n"))
    assert(DeltaRead.read(spark, dir).count() == 10)
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.deleteDv(spark, dir, "k >= 0")
    }
    assert(e.getMessage.contains("collide on basename"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      DeltaWrite.deleteDvKeys(
        spark.range(0, 10).select(col("id").as("k")), dir, Seq("k"))
    }
    assert(e2.getMessage.contains("collide on basename"), e2.getMessage)
    // the copy-on-write path still serves this table
    assert(DeltaWrite.delete(spark, dir, "k >= 8") == 1)
    assert(DeltaRead.read(spark, dir).count() == 8)
  }

  test("superseded DV keeps its tombstone: vacuum dates the old .bin by the retiring remove, not mtime") {
    // the ADVICE r12 scenario: deleteDv twice on the same file — the
    // second commit removes (path, oldDv) and re-adds (path, newDv);
    // path-keyed replay would cancel the tombstone and an mtime-gated
    // vacuum could eat a .bin superseded MINUTES ago. Reconciliation is
    // keyed by (path, dvUniqueId), so the old descriptor's tombstone
    // survives the re-add and gates its .bin precisely.
    val dir = tmp()
    DeltaWrite.create(rows(0, 50).coalesce(1), dir)
    DeltaWrite.deleteDv(spark, dir, "k = 1")
    val bin1 = dvFiles(dir)
    assert(bin1.size == 1)
    DeltaWrite.deleteDv(spark, dir, "k = 2") // supersedes bin1's mask
    val bins = dvFiles(dir)
    assert(bins.size == 2)
    // quiet-table shape: the old .bin's mtime is 8 days past, but its
    // retiring remove happened just now — default 7-day retention must
    // KEEP it (readers of version 1 are still inside the window)
    assert(new java.io.File(dir, bin1.head).setLastModified(
      System.currentTimeMillis() - 8L * 24 * 3600 * 1000))
    DeltaWrite.vacuum(spark, dir)
    assert(dvFiles(dir) == bins,
      "a .bin superseded inside the retention window must survive vacuum")
    // time travel to the superseded version still applies the OLD mask
    assert(kv(DeltaRead.read(spark, dir, 1))
      == kv(rows(0, 50)).filterNot(_._1 == 1))
    // once retention lapses the PRECISE per-bin gate reclaims it —
    // even though a fresh unrelated tombstone would have frozen the
    // old coarse newest-tombstone floor
    Thread.sleep(5)
    DeltaWrite.vacuum(spark, dir, retainMillis = 0L)
    assert(dvFiles(dir).size == 1 && !dvFiles(dir).contains(bin1.head),
      "past retention the superseded .bin must be reclaimed")
    assert(kv(DeltaRead.read(spark, dir))
      == kv(rows(0, 50)).filterNot(t => t._1 == 1 || t._1 == 2))
  }

  test("DV tombstone survives re-checkpointing; keyed reconciliation keeps the live re-add") {
    val dir = tmp()
    DeltaWrite.create(rows(0, 50).coalesce(1), dir)
    DeltaWrite.deleteDv(spark, dir, "k = 1")
    val bin1 = dvFiles(dir)
    DeltaWrite.deleteDv(spark, dir, "k = 2")
    val bins = dvFiles(dir)
    val head = DeltaRead.latestVersion(spark, dir)
    assert(DeltaWrite.writeCheckpoint(spark, dir, head))
    // the checkpoint carries add(path, newDv) NEXT TO remove(path,
    // oldDv) — (path, dvUniqueId)-keyed subtraction must not kill the
    // live add
    assert(kv(DeltaRead.read(spark, dir))
      == kv(rows(0, 50)).filterNot(t => t._1 == 1 || t._1 == 2))
    // retention protection survives the checkpoint boundary (the JSON
    // tail is gone; the tombstone now rides the checkpoint's remove row)
    assert(new java.io.File(dir, bin1.head).setLastModified(
      System.currentTimeMillis() - 8L * 24 * 3600 * 1000))
    DeltaWrite.vacuum(spark, dir)
    assert(dvFiles(dir) == bins,
      "checkpointed DV tombstone must still protect the superseded .bin")
    Thread.sleep(5)
    DeltaWrite.vacuum(spark, dir, retainMillis = 0L)
    assert(dvFiles(dir).size == 1 && !dvFiles(dir).contains(bin1.head))
    assert(kv(DeltaRead.read(spark, dir))
      == kv(rows(0, 50)).filterNot(t => t._1 == 1 || t._1 == 2))
  }

  test("first DV commit re-emits metaData with delta.enableDeletionVectors=true") {
    val dir = tmp()
    DeltaWrite.create(rows(0, 30).coalesce(1), dir)
    DeltaWrite.deleteDv(spark, dir, "k = 3")
    val c1 = Files.readString(
      Paths.get(dir, "_delta_log", f"${1L}%020d.json"))
    assert(c1.contains("\"delta.enableDeletionVectors\":\"true\""),
      s"DV-authoring commit must enable the table property: $c1")
    // second DV commit: property already true — no metaData churn
    DeltaWrite.deleteDv(spark, dir, "k = 4")
    val c2 = Files.readString(
      Paths.get(dir, "_delta_log", f"${2L}%020d.json"))
    assert(!c2.contains("\"metaData\""),
      s"property already enabled — no metaData re-emit expected: $c2")
    // and the reader carries the property in table conf
    assert(kv(DeltaRead.read(spark, dir))
      == kv(rows(0, 30)).filterNot(t => t._1 == 3 || t._1 == 4))
  }

  test("deleteDvKeys: key-frame semi-join masking (the forget-queue shape), no data-file writes") {
    val dir = tmp()
    DeltaWrite.create(rows(0, 50).coalesce(1), dir)
    DeltaWrite.append(rows(50, 100).coalesce(1), dir)
    val dataBefore = parquetFiles(dir)
    // keys spanning both files, plus absent keys (must be inert)
    val keys = spark.range(0, 6).select((col("id") * 20).as("k"))
      .union(spark.range(0, 3).select((col("id") + 5000).as("k")))
    val v = DeltaWrite.deleteDvKeys(keys, dir, Seq("k"))
    assert(v == 2)
    assert(parquetFiles(dir) == dataBefore,
      "key-delete must not rewrite or add data files")
    val gone = Set(0L, 20L, 40L, 60L, 80L)
    assert(kv(DeltaRead.read(spark, dir))
      == kv(rows(0, 100)).filterNot(r => gone(r._1)))
    // re-deleting the same keys: nothing newly matched, no new version
    assert(DeltaWrite.deleteDvKeys(keys, dir, Seq("k")) == 2)
    // stats pruning: a key set bounded to one file's range masks only
    // that file (single-key range prune, the upsert plan)
    val dir2 = tmp()
    DeltaWrite.create(rows(0, 50).coalesce(1), dir2)
    DeltaWrite.append(rows(50, 100).coalesce(1), dir2)
    DeltaWrite.deleteDvKeys(
      spark.range(10, 12).select(col("id").as("k")), dir2, Seq("k"))
    val c = Files.readString(
      Paths.get(dir2, "_delta_log", f"${2L}%020d.json"))
    assert(c.split("\n").count(_.contains("\"deletionVector\":")) == 1,
      s"only the file holding the key range may get a mask: $c")
  }

  test("CDF: deleteDv and upsertDv emit minimal row-level change data") {
    // CDF-enabled table (hand-written commit 0 so configuration
    // carries delta.enableChangeDataFeed)
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    val df = rows(0, 50)
    val stage = Files.createTempDirectory("graft_dvw_stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(dir))
    Files.copy(part.toPath, Paths.get(dir, "f0.parquet"))
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    val schemaJson = df.schema.json.replace("\"", "\\\"")
    Files.writeString(Paths.get(dir, "_delta_log", f"${0L}%020d.json"),
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
        s"""{"metaData":{"id":"cdf","format":{"provider":"parquet"},""" +
          s""""schemaString":"$schemaJson","partitionColumns":[],""" +
          s""""configuration":{"delta.enableChangeDataFeed":"true"}}}""",
        s"""{"add":{"path":"f0.parquet","partitionValues":{},""" +
          s""""size":${Files.size(Paths.get(dir, "f0.parquet"))},""" +
          s""""modificationTime":0,"dataChange":true}}""").mkString("\n"))
    // DV delete: the feed carries EXACTLY the 5 deleted rows
    assert(DeltaWrite.deleteDv(spark, dir, "k >= 45") == 1)
    val feed1 = DeltaRead.changes(spark, dir, 0, 1)
    assert(feed1.count() == 5, s"minimal diff expected: ${feed1.count()}")
    assert(feed1.select("_change_type").distinct().head().getString(0)
      == "delete")
    assert(feed1.agg(min("k")).head().getLong(0) == 45)
    // DV upsert: pre/postimage for the matched key, insert for the new
    val src = spark.createDataFrame(Seq(
      (10L, "updated"), (200L, "fresh"))).toDF("k", "name")
    assert(DeltaWrite.upsertDv(src, dir, Seq("k")) == 2)
    val feed2 = DeltaRead.changes(spark, dir, 1, 2)
    assert(feed2.count() == 3)
    val byType = feed2.collect().map(r =>
      r.getString(2) -> (r.getLong(0), r.getString(1))).toMap
    assert(byType("update_preimage") == ((10L, "u10")))
    assert(byType("update_postimage") == ((10L, "updated")))
    assert(byType("insert") == ((200L, "fresh")))
    // replay algebra: v0 + feed == v2
    val feed = DeltaRead.changes(spark, dir, 0, 2)
    val minus = feed.filter(col("_change_type").isin("delete",
      "update_preimage")).select("k", "name")
    val plus = feed.filter(col("_change_type").isin("insert",
      "update_postimage")).select("k", "name")
    val replay = DeltaRead.read(spark, dir, 0).exceptAll(minus)
      .unionAll(plus)
    val v2 = DeltaRead.read(spark, dir, 2)
    assert(replay.exceptAll(v2).count() == 0 &&
      v2.exceptAll(replay).count() == 0,
      "v0 + row-level feed must replay to v2 exactly")
  }

  test("deleteDv on a PARTITIONED table: only the touched partition's files get masks") {
    val dir = tmp()
    val df = spark.range(0, 40).select(col("id").as("k"),
      concat(lit("u"), col("id").cast("string")).as("name"),
      (col("id") % 2).cast("string").as("p"))
    DeltaWrite.create(df.coalesce(1), dir, Seq("p"))
    val v = DeltaWrite.deleteDv(spark, dir, "p = '1' AND k < 10")
    val maskedAdds = Files.readString(
      Paths.get(dir, "_delta_log", f"$v%020d.json"))
      .split("\n").filter(_.contains("\"deletionVector\":")).toSeq
    assert(maskedAdds.nonEmpty &&
      maskedAdds.forall(_.contains(""""p":"1"""")),
      s"only partition p=1 files may carry masks: $maskedAdds")
    assert(DeltaRead.read(spark, dir).count() == 35)
    assert(kv(DeltaRead.read(spark, dir).select("k", "name"))
      == kv(rows(0, 40)).filterNot { case (k, _) => k % 2 == 1 && k < 10 })
  }
}
