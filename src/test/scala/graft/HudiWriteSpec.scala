package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Hudi COPY_ON_WRITE writer round-trips: create/insert/upsert/delete
  * through [[HudiWrite]] read back via [[HudiRead]] (the same
  * writer-against-reader cross-validation the Delta and Iceberg legs
  * get), instant time travel, exactly-once insertBatch, the commit
  * race, and the loud refusal gates.
  */
class HudiWriteSpec extends AnyFunSuite {
  import SparkTestSession._
  import sources.{HudiRead, HudiWrite}

  private def tmp(): String =
    Files.createTempDirectory("graft_hudiw").toString + "/t"

  private def range(lo: Long, hi: Long, tag: String = "x") =
    spark.range(lo, hi).select(col("id").as("k"),
      concat(lit(tag), col("id").cast("string")).as("v"))

  private def kv(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("create + insert round-trip with instant time travel") {
    val dir = tmp()
    val i1 = HudiWrite.create(range(0, 10).coalesce(1), dir, "k")
    assert(HudiRead.read(spark, dir).count() == 10)
    val i2 = HudiWrite.insert(range(10, 20).coalesce(1), dir, "k")
    assert(i2 > i1, "instants must be strictly increasing")
    val all = HudiRead.read(spark, dir)
    assert(all.columns.toSeq == Seq("k", "v"), "meta columns dropped")
    assert(kv(all) == kv(range(0, 20)))
    // time travel to the first instant
    assert(kv(HudiRead.read(spark, dir, asOf = i1)) == kv(range(0, 10)))
  }

  test("upsert: matched keys replaced in their own group, new keys inserted, shadowed slice time-travels") {
    val dir = tmp()
    val i1 = HudiWrite.create(range(0, 10).coalesce(2), dir, "k")
    val src = range(5, 12, "upd") // 5-9 update, 10-11 insert
    val i2 = HudiWrite.upsert(src, dir, "k")
    val after = kv(HudiRead.read(spark, dir))
    val want = kv(range(0, 5)) ++ kv(range(5, 12, "upd"))
    assert(after == want)
    // the pre-upsert state is still served at the old instant
    assert(kv(HudiRead.read(spark, dir, asOf = i1)) == kv(range(0, 10)))
    // second upsert over the rewritten groups composes
    HudiWrite.upsert(range(5, 6, "upd2"), dir, "k")
    assert(kv(HudiRead.read(spark, dir))
      == want + (5L -> "upd25"))
    // duplicate source keys refuse
    val e = intercept[IllegalArgumentException] {
      HudiWrite.upsert(range(0, 1).unionAll(range(0, 1)), dir, "k")
    }
    assert(e.getMessage.contains("one source row per"))
    // a wrong key column refuses against the declared record key
    val e2 = intercept[IllegalArgumentException] {
      HudiWrite.upsert(range(0, 1), dir, "v")
    }
    assert(e2.getMessage.contains("declared record key"))
  }

  test("delete: only matching groups rewrite; a fully-deleted group shadows with an empty slice") {
    val dir = tmp()
    HudiWrite.create(range(0, 10).coalesce(1), dir, "k")
    // second group holds 100-104 only — deleting all of them must
    // still shadow the group (empty slice), not resurrect it
    HudiWrite.insert(range(100, 105).coalesce(1), dir, "k")
    HudiWrite.delete(spark, dir, "k >= 100")
    assert(kv(HudiRead.read(spark, dir)) == kv(range(0, 10)))
    // partial delete rewrites the remaining group
    val i = HudiWrite.delete(spark, dir, "k >= 7")
    assert(kv(HudiRead.read(spark, dir)) == kv(range(0, 7)))
    // no-op delete commits nothing (same latest instant)
    assert(HudiWrite.delete(spark, dir, "k >= 1000") == i)
    // NULL-predicate rows are kept (SQL DELETE semantics)
    HudiWrite.delete(spark, dir,
      "CASE WHEN k = 3 THEN NULL ELSE k = 2 END")
    assert(kv(HudiRead.read(spark, dir)).keySet
      == Set(0L, 1L, 3L, 4L, 5L, 6L))
  }

  test("partitioned COW: per-partition groups, (partition,key) merge, cross-partition keys isolated") {
    val dir = tmp()
    def rows(lo: Long, hi: Long, p: String, tag: String = "x") =
      spark.range(lo, hi).select(col("id").as("k"),
        lit(p).as("p"),
        concat(lit(tag), col("id").cast("string")).as("v"))
    HudiWrite.create(
      rows(0, 5, "A").unionAll(rows(0, 5, "B")).coalesce(1), dir, "k", "p")
    val t0 = HudiRead.read(spark, dir)
    assert(t0.count() == 10)
    // file groups live under one directory per partition value
    assert(new java.io.File(dir, "A").listFiles()
      .exists(_.getName.endsWith(".parquet")))
    assert(new java.io.File(dir, "B").listFiles()
      .exists(_.getName.endsWith(".parquet")))
    // upsert keyed per (partition, key): k=2 updates ONLY partition A;
    // the same key in partition B must stay untouched
    HudiWrite.upsert(rows(2, 3, "A", "upd"), dir, "k")
    val t1 = HudiRead.read(spark, dir)
    assert(t1.filter(col("p") === "A" && col("k") === 2)
      .head().getString(2) == "upd2")
    assert(t1.filter(col("p") === "B" && col("k") === 2)
      .head().getString(2) == "x2")
    // the same key appearing in BOTH partitions of one source batch is
    // legal under the non-global index
    HudiWrite.upsert(rows(3, 4, "A", "a3").unionAll(rows(3, 4, "B", "b3")),
      dir, "k")
    val t2 = HudiRead.read(spark, dir)
    assert(t2.filter(col("p") === "A" && col("k") === 3)
      .head().getString(2) == "a33")
    assert(t2.filter(col("p") === "B" && col("k") === 3)
      .head().getString(2) == "b33")
    // fresh keys land in their own partition's new group
    HudiWrite.upsert(rows(100, 102, "B", "new"), dir, "k")
    assert(HudiRead.read(spark, dir).count() == 12)
    // per-partition delete: B's k>=100 vanish, A untouched
    HudiWrite.delete(spark, dir, "p = 'B' AND k >= 100")
    val t3 = HudiRead.read(spark, dir)
    assert(t3.count() == 10)
    assert(t3.filter(col("p") === "A").count() == 5)
    // NULL/empty partition values refuse loudly
    val e = intercept[IllegalArgumentException] {
      HudiWrite.insert(spark.range(0, 1).select(col("id").as("k"),
        lit(null.asInstanceOf[String]).as("p"), lit("z").as("v")),
        dir, "k")
    }
    assert(e.getMessage.contains("partition value"))
  }

  test("insertBatch is exactly-once per (appId, batchId)") {
    val dir = tmp()
    HudiWrite.create(range(0, 5).coalesce(1), dir, "k")
    HudiWrite.insertBatch(range(5, 10).coalesce(1), dir, "k", "app", 0L)
    assert(HudiRead.read(spark, dir).count() == 10)
    // replayed batch: detected no-op
    HudiWrite.insertBatch(range(5, 10).coalesce(1), dir, "k", "app", 0L)
    assert(HudiRead.read(spark, dir).count() == 10)
    // next batch lands; an unrelated app has its own watermark
    HudiWrite.insertBatch(range(10, 12).coalesce(1), dir, "k", "app", 1L)
    HudiWrite.insertBatch(range(12, 13).coalesce(1), dir, "k", "b", 0L)
    assert(HudiRead.read(spark, dir).count() == 13)
  }

  test("insertBatch replay no-ops on a table with no base files") {
    val dir = tmp()
    // the stream-sink shape: create with an EMPTY first commit, then an
    // empty batch 0 — the table has completed instants but zero base
    // files, and a restart's replay of batch 0 must still no-op
    HudiWrite.create(range(0, 0).coalesce(1), dir, "k")
    HudiWrite.insertBatch(range(0, 0).coalesce(1), dir, "k", "app", 0L)
    val replayed =
      HudiWrite.insertBatch(range(0, 0).coalesce(1), dir, "k", "app", 0L)
    assert(replayed.nonEmpty, "replay must return the latest instant")
    // the next real batch lands on the (base-file-less) table
    HudiWrite.insertBatch(range(0, 3).coalesce(1), dir, "k", "app", 1L)
    assert(HudiRead.read(spark, dir).count() == 3)
  }

  test("commit JSON survives partition values needing JSON escaping; glob-unsafe values refuse") {
    val dir = tmp()
    // quotes are legal partition VALUES — a hand-built commit JSON
    // would emit invalid bytes here and brick every subsequent read
    val df = spark.range(0, 4).select(col("id").as("k"),
      concat(lit("x"), col("id").cast("string")).as("v"),
      lit("""he said "hi"""").as("p"))
    HudiWrite.create(df.coalesce(1), dir, "k", partitionField = "p")
    val got = HudiRead.read(spark, dir)
    assert(got.count() == 4)
    assert(got.select("p").distinct().collect().map(_.getString(0)).toSet
      == Set("""he said "hi""""))
    // upsert into the quoted partition composes (reads its commit JSON)
    HudiWrite.upsert(df.filter(col("id") === 0)
      .withColumn("v", lit("upd")), dir, "k")
    assert(HudiRead.read(spark, dir).filter(col("v") === "upd").count() == 1)
    // a backslash (Hadoop glob escape) would land fine and then make
    // every read of the partition fail — the write gate refuses it
    val e = intercept[IllegalArgumentException] {
      HudiWrite.insert(df.withColumn("p", lit("""back\slash""")), dir, "k")
    }
    assert(e.getMessage.contains("glob metacharacter"))
  }

  test("readWhere/pruneReport: footer zone maps open only matching groups") {
    val dir = tmp()
    // three groups with DISJOINT key ranges (one commit each)
    HudiWrite.create(range(0, 10).coalesce(1), dir, "k")
    HudiWrite.insert(range(100, 110).coalesce(1), dir, "k")
    HudiWrite.insert(range(200, 210).coalesce(1), dir, "k")
    val (total, kept) = HudiRead.pruneReport(spark, dir, "k >= 200")
    assert(total == 3 && kept == 1, s"pruning: $kept of $total")
    val got = HudiRead.readWhere(spark, dir, "k >= 200")
    assert(got.columns.toSeq == Seq("k", "v"), "meta columns dropped")
    assert(kv(got) == kv(range(200, 210)))
    // pruned == unpruned on a mid-range predicate
    assert(kv(HudiRead.readWhere(spark, dir, "k >= 100 AND k < 205"))
      == kv(HudiRead.read(spark, dir)
        .filter("k >= 100 AND k < 205")))
    // zero-file predicate still answers with the right schema
    assert(HudiRead.readWhere(spark, dir, "k < 0").count() == 0)
  }

  // -- minimal log-block rig (the public #HUDI# layout, used to plant
  // a log-INSERTED key the writer's placement must then find) --------
  private val rigSchema =
    """{"type":"record","name":"rec","fields":[
      {"name":"_hoodie_record_key","type":["null","string"],"default":null},
      {"name":"k","type":["null","long"],"default":null},
      {"name":"v","type":["null","string"],"default":null}]}"""
      .replaceAll("\\s+", " ")
  private def rigMeta(m: Map[Int, String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (o, v) =>
      val b = v.getBytes("UTF-8")
      out.writeInt(o); out.writeInt(b.length); out.write(b)
    }
    out.flush(); bos.toByteArray
  }
  private def rigDataBlock(instant: String,
                           recs: Seq[(Long, String)]): Array[Byte] = {
    val schema = new org.apache.avro.Schema.Parser().parse(rigSchema)
    val w = new org.apache.avro.generic.GenericDatumWriter[
      org.apache.avro.generic.GenericRecord](schema)
    val recBytes = recs.map { case (k, v) =>
      val r = new org.apache.avro.generic.GenericData.Record(schema)
      r.put("_hoodie_record_key", k.toString)
      r.put("k", Long.box(k)); r.put("v", v)
      val bos = new java.io.ByteArrayOutputStream()
      val enc = org.apache.avro.io.EncoderFactory.get()
        .binaryEncoder(bos, null)
      w.write(r, enc); enc.flush(); bos.toByteArray
    }
    val cb = new java.io.ByteArrayOutputStream()
    val co = new java.io.DataOutputStream(cb)
    co.writeInt(3); co.writeInt(recBytes.size)
    recBytes.foreach { b => co.writeInt(b.length); co.write(b) }
    co.flush()
    val content = cb.toByteArray
    val hdr = rigMeta(Map(0 -> instant, 2 -> rigSchema))
    val ftr = rigMeta(Map.empty)
    val blockSize = 4L + 4 + hdr.length + 8 + content.length +
      ftr.length + 8
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write("#HUDI#".getBytes("UTF-8"))
    out.writeLong(blockSize); out.writeInt(1); out.writeInt(3)
    out.write(hdr); out.writeLong(content.length.toLong)
    out.write(content); out.write(ftr)
    out.writeLong(6L + 8 + blockSize)
    out.flush(); bos.toByteArray
  }

  test("MOR upsertLog: log-block upserts merge; log-inserted keys update in place, not duplicate") {
    val dir = tmp()
    val i1 = HudiWrite.create(range(0, 6).coalesce(1), dir, "k", "",
      "MERGE_ON_READ")
    assert(kv(HudiRead.read(spark, dir)) == kv(range(0, 6)))
    // matched keys append a log block; new keys land as a fresh base
    // group in the SAME deltacommit
    val i2 = HudiWrite.upsertLog(
      range(2, 4, "u1").unionAll(range(10, 12, "new")), dir, "k")
    val after = kv(HudiRead.read(spark, dir))
    assert(after == kv(range(0, 2)) ++ kv(range(2, 4, "u1"))
      ++ kv(range(4, 6)) ++ kv(range(10, 12, "new")))
    // pre-upsert snapshot still serves at the old instant
    assert(kv(HudiRead.read(spark, dir, asOf = i1)) == kv(range(0, 6)))
    // a second log upsert composes (version 2 of the slice's log)
    HudiWrite.upsertLog(range(2, 3, "u2"), dir, "k")
    assert(kv(HudiRead.read(spark, dir))(2L) == "u22")
    // plant a log-INSERTED key (100) via a hand-built block on the
    // 0-5 slice, exactly what a real Hudi streaming writer produces
    val baseName = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(_.getName).find(_.endsWith(s"_$i1.parquet")).get
    val fid = baseName.split("_")(0)
    val logName = s".${fid}_$i1.log.9_0-rig"
    val nextInst = (BigInt(
      new java.io.File(dir, ".hoodie").listFiles()
        .map(_.getName.takeWhile(_.isDigit)).filter(_.nonEmpty)
        .max) + 1).toString
    Files.write(java.nio.file.Paths.get(dir, logName),
      rigDataBlock(nextInst, Seq(100L -> "logins")))
    Files.writeString(
      java.nio.file.Paths.get(dir, ".hoodie", s"$nextInst.deltacommit"),
      s"""{"partitionToWriteStats":{"":[{"fileId":"$fid",""" +
        s""""path":"$logName","prevCommit":"$i1","numWrites":1,""" +
        s""""fileSizeInBytes":1}]},"operation":"upsert"}""")
    assert(kv(HudiRead.read(spark, dir))(100L) == "logins")
    val countBefore = HudiRead.read(spark, dir).count()
    // upserting the log-inserted key must route to ITS slice (via the
    // log placement scan), never duplicate into a fresh group
    HudiWrite.upsertLog(range(100, 101, "upd"), dir, "k")
    val t = HudiRead.read(spark, dir)
    assert(t.count() == countBefore, "log-inserted key must not duplicate")
    assert(kv(t)(100L) == "upd100")
    // COW ops refuse on MOR; upsertLog refuses on COW
    val e1 = intercept[IllegalArgumentException] {
      HudiWrite.upsert(range(0, 1), dir, "k")
    }
    assert(e1.getMessage.contains("COPY_ON_WRITE only"))
    val cowDir = tmp()
    HudiWrite.create(range(0, 2).coalesce(1), cowDir, "k")
    val e2 = intercept[IllegalArgumentException] {
      HudiWrite.upsertLog(range(0, 1), cowDir, "k")
    }
    assert(e2.getMessage.contains("MERGE_ON_READ"))
    // insertBatch on MOR publishes deltacommits and stays exactly-once
    HudiWrite.insertBatch(range(200, 202).coalesce(1), dir, "k", "m", 0L)
    HudiWrite.insertBatch(range(200, 202).coalesce(1), dir, "k", "m", 0L)
    assert(HudiRead.read(spark, dir).count() == countBefore + 2)
  }

  test("MOR deleteLog: DELETE_BLOCKs suppress rows; update-after-delete re-inserts") {
    val dir = tmp()
    val i1 = HudiWrite.create(range(0, 6).coalesce(1), dir, "k", "",
      "MERGE_ON_READ")
    // delete two keys via a log DELETE_BLOCK — no rewrite
    val i2 = HudiWrite.deleteLog(
      spark.range(2, 4).select(col("id").as("k")), dir, "k")
    assert(kv(HudiRead.read(spark, dir)).keySet == Set(0L, 1L, 4L, 5L))
    // the pre-delete snapshot still serves
    assert(kv(HudiRead.read(spark, dir, asOf = i1)) == kv(range(0, 6)))
    // a later log UPSERT of a deleted key re-inserts it (arrival-order
    // last-write-wins, the contract the reader merges by)
    HudiWrite.upsertLog(range(2, 3, "back"), dir, "k")
    val t = kv(HudiRead.read(spark, dir))
    assert(t.keySet == Set(0L, 1L, 2L, 4L, 5L) && t(2L) == "back2")
    // ...and deleting a log-upserted key routes to its slice too
    HudiWrite.deleteLog(
      spark.range(2, 3).select(col("id").as("k")), dir, "k")
    assert(kv(HudiRead.read(spark, dir)).keySet == Set(0L, 1L, 4L, 5L))
    // unmatched keys are a no-op that commits nothing
    val latest = HudiWrite.deleteLog(
      spark.range(900, 901).select(col("id").as("k")), dir, "k")
    assert(kv(HudiRead.read(spark, dir)).keySet == Set(0L, 1L, 4L, 5L))
    // deleteLog refuses on COW tables
    val cowDir = tmp()
    HudiWrite.create(range(0, 2).coalesce(1), cowDir, "k")
    val e = intercept[IllegalArgumentException] {
      HudiWrite.deleteLog(
        spark.range(0, 1).select(col("id").as("k")), cowDir, "k")
    }
    assert(e.getMessage.contains("MERGE_ON_READ"))
  }

  test("MOR compact: log blocks fold into new bases; time travel intact; pruning unlocked") {
    val dir = tmp()
    HudiWrite.create(range(0, 10).coalesce(2), dir, "k", "",
      "MERGE_ON_READ")
    HudiWrite.upsertLog(
      range(0, 5, "u1").unionAll(range(10, 13, "new")), dir, "k")
    HudiWrite.upsertLog(range(0, 1, "u2"), dir, "k")
    val iDel = HudiWrite.deleteLog(range(1, 2), dir, "k")
    val pre = kv(HudiRead.read(spark, dir))
    assert(pre(0L) == "u20" && !pre.contains(1L) && pre(10L) == "new10")
    // live logs block zone-map pruning pre-compaction
    intercept[IllegalArgumentException] {
      HudiRead.readWhere(spark, dir, "k >= 10")
    }
    val ci = HudiWrite.compact(spark, dir)
    // merged read is unchanged bit-for-bit
    assert(kv(HudiRead.read(spark, dir)) == pre)
    // published as a `commit` instant (the MOR compaction kind)
    val timeline = new java.io.File(dir, ".hoodie").listFiles()
      .map(_.getName)
    assert(timeline.contains(s"$ci.commit"))
    // time travel to pre-compaction instants still merges base + logs
    assert(kv(HudiRead.read(spark, dir, asOf = iDel)) == pre)
    // pruned reads open post-compaction: only the 10..12 group matches
    val (total, kept) = HudiRead.pruneReport(spark, dir, "k >= 10")
    assert(total == 3 && kept == 1, s"pruning: $kept of $total")
    assert(kv(HudiRead.readWhere(spark, dir, "k >= 10"))
      == pre.filter(_._1 >= 10))
    // further log upserts onto the COMPACTED slices compose
    HudiWrite.upsertLog(range(0, 1, "u3"), dir, "k")
    assert(kv(HudiRead.read(spark, dir))(0L) == "u30")
    // no live logs after a second compact folds u3; then no-op
    HudiWrite.compact(spark, dir)
    val commits = new java.io.File(dir, ".hoodie").listFiles()
      .map(_.getName).count(_.matches("""\d+\.commit"""))
    assert(commits == 2, s"expected 2 compaction commits, saw $commits")
    HudiWrite.compact(spark, dir) // nothing to fold: detected no-op
    assert(new java.io.File(dir, ".hoodie").listFiles()
      .map(_.getName).count(_.matches("""\d+\.commit""")) == 2)
  }

  test("MOR compact: a fully log-deleted group lands an empty shadowing slice") {
    val dir = tmp()
    HudiWrite.create(range(0, 4).coalesce(1), dir, "k", "",
      "MERGE_ON_READ")
    HudiWrite.deleteLog(range(0, 4), dir, "k")
    assert(HudiRead.read(spark, dir).count() == 0)
    HudiWrite.compact(spark, dir)
    assert(HudiRead.read(spark, dir).count() == 0,
      "compaction must not resurrect log-deleted rows")
    // and the group stays writable
    HudiWrite.upsertLog(range(0, 2, "back"), dir, "k")
    assert(kv(HudiRead.read(spark, dir)) == kv(range(0, 2, "back")))
  }

  test("racing compactions: a 4-way race lands exactly one compaction commit") {
    val dir = tmp()
    HudiWrite.create(range(0, 8).coalesce(1), dir, "k", "",
      "MERGE_ON_READ")
    HudiWrite.upsertLog(range(0, 4, "u"), dir, "k")
    val pre = kv(HudiRead.read(spark, dir))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val fs = (0 until 4).map(_ => Future(HudiWrite.compact(spark, dir)))
    val instants = Await.result(Future.sequence(fs), 180.seconds)
    pool.shutdown()
    assert(instants.distinct.size == 1,
      s"racing compactions must converge on one instant: $instants")
    assert(new java.io.File(dir, ".hoodie").listFiles()
      .map(_.getName).count(_.matches("""\d+\.commit""")) == 1)
    assert(kv(HudiRead.read(spark, dir)) == pre)
  }

  private def dataParquets(dir: String): Set[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).toSet

  test("clean: shadowed slices beyond retention deleted; covered reads identical; gapped time travel refuses") {
    val dir = tmp()
    val i1 = HudiWrite.create(range(0, 6).coalesce(1), dir, "k")
    HudiWrite.upsert(range(0, 3, "u1"), dir, "k")
    val i3 = HudiWrite.upsert(range(0, 3, "u2"), dir, "k")
    HudiWrite.upsert(range(3, 6, "u3"), dir, "k")
    val preAll = kv(HudiRead.read(spark, dir))
    val preAtI3 = kv(HudiRead.read(spark, dir, asOf = i3))
    val before = dataParquets(dir)
    // retain the last 2 instants: the i1/i2 slices are shadowed there
    val deleted = HudiWrite.clean(spark, dir, 2)
    assert(deleted == 2, s"expected the 2 shadowed bases gone: $deleted")
    assert((before -- dataParquets(dir)).size == 2, "files must be gone")
    // covered reads identical (latest + time travel at/after horizon)
    assert(kv(HudiRead.read(spark, dir)) == preAll)
    assert(kv(HudiRead.read(spark, dir, asOf = i3)) == preAtI3)
    // gapped time travel refuses loudly by name
    val e = intercept[IllegalArgumentException] {
      HudiRead.read(spark, dir, asOf = i1)
    }
    assert(e.getMessage.contains("CLEANED"))
    // idempotent: nothing further qualifies
    assert(HudiWrite.clean(spark, dir, 2) == 0)
  }

  test("clean reclaims log files folded by a compaction") {
    val dir = tmp()
    HudiWrite.create(range(0, 4).coalesce(1), dir, "k", "",
      "MERGE_ON_READ")
    HudiWrite.upsertLog(range(0, 2, "u"), dir, "k")
    HudiWrite.compact(spark, dir)
    def logsOnDisk(): Int = new java.io.File(dir).listFiles()
      .count(f => f.getName.contains(".log.") &&
        !f.getName.endsWith(".crc"))
    assert(logsOnDisk() == 1, "fixture needs the folded log on disk")
    val pre = kv(HudiRead.read(spark, dir))
    // retain only the head: the pre-compaction base AND its folded log go
    val deleted = HudiWrite.clean(spark, dir, 1)
    assert(deleted == 2, s"expected old base + folded log gone: $deleted")
    assert(logsOnDisk() == 0)
    assert(kv(HudiRead.read(spark, dir)) == pre)
  }

  test("archive: timeline trims; reads identical; watermarks survive; orphaning archive refuses and rolls back") {
    val dir = tmp()
    HudiWrite.create(range(0, 6).coalesce(1), dir, "k")
    HudiWrite.insertBatch(range(6, 8).coalesce(1), dir, "k", "app", 0L)
    HudiWrite.upsert(range(0, 8, "u1"), dir, "k")
    HudiWrite.upsert(range(0, 8, "u2"), dir, "k")
    val pre = kv(HudiRead.read(spark, dir))
    val n = HudiWrite.archive(spark, dir, 2)
    assert(n == 2, s"expected 2 instants archived: $n")
    assert(new java.io.File(dir, ".hoodie/archived").listFiles()
      .nonEmpty)
    // covered reads identical through the per-group coverage check
    assert(kv(HudiRead.read(spark, dir)) == pre)
    // the exactly-once watermark SURVIVES its commit being archived
    HudiWrite.insertBatch(range(6, 8).coalesce(1), dir, "k", "app", 0L)
    assert(kv(HudiRead.read(spark, dir)) == pre,
      "replay of an archived batch must still no-op")
    // time travel into the archived range refuses loudly
    val old = new java.io.File(dir, ".hoodie/archived").listFiles()
      .map(_.getName).filter(_.endsWith(".commit")).min
      .takeWhile(_.isDigit)
    val e = intercept[IllegalArgumentException] {
      HudiRead.read(spark, dir, asOf = old)
    }
    assert(e.getMessage.contains("no completed commit"))
    // and new writes continue on strictly newer instants
    val i = HudiWrite.insert(range(100, 102).coalesce(1), dir, "k")
    assert(HudiRead.read(spark, dir).count() == pre.size + 2)
    assert(i.nonEmpty)
    // a group whose ONLY write would be archived: refuse + roll back
    val dir2 = tmp()
    HudiWrite.create(range(0, 3).coalesce(1), dir2, "k")
    HudiWrite.insert(range(100, 103).coalesce(1), dir2, "k")
    HudiWrite.upsert(range(100, 101, "u1"), dir2, "k")
    HudiWrite.upsert(range(100, 101, "u2"), dir2, "k")
    val pre2 = kv(HudiRead.read(spark, dir2))
    val e2 = intercept[IllegalArgumentException] {
      HudiWrite.archive(spark, dir2, 2)
    }
    assert(e2.getMessage.contains("orphan"))
    assert(kv(HudiRead.read(spark, dir2)) == pre2,
      "rollback must leave the table readable and identical")
  }

  test("archived watermark cache resets when the table is rebuilt at the same path") {
    // ADVICE r12: the (path, appId) cache held the OLD incarnation's
    // folded watermark across a drop-and-recreate in one JVM, making
    // the NEW table's first batches look like replays — silent data
    // loss on the exactly-once path. Previously-seen archived names
    // vanishing is the rebuild signal: the fold restarts from scratch.
    val dir = tmp()
    HudiWrite.create(range(0, 4).coalesce(1), dir, "k")
    HudiWrite.insertBatch(range(4, 6).coalesce(1), dir, "k", "app", 7L)
    HudiWrite.upsert(range(0, 6, "u1"), dir, "k")
    HudiWrite.upsert(range(0, 6, "u2"), dir, "k")
    HudiWrite.archive(spark, dir, 2)
    // prime the cache: a replay check folds the archived timeline
    HudiWrite.insertBatch(range(4, 6).coalesce(1), dir, "k", "app", 7L)
    assert(HudiRead.read(spark, dir).count() == 6)
    // drop and recreate AT THE SAME PATH
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(dir))
    HudiWrite.create(range(0, 2).coalesce(1), dir, "k")
    // make the NEW table have an archived dir too (different names) so
    // the archived fold actually runs against the cached entry
    HudiWrite.insert(range(2, 4).coalesce(1), dir, "k")
    HudiWrite.upsert(range(0, 4, "n1"), dir, "k")
    HudiWrite.upsert(range(0, 4, "n2"), dir, "k")
    HudiWrite.archive(spark, dir, 2)
    // batchId 7 on the NEW incarnation is NOT a replay — the stale
    // cached watermark must not swallow it
    HudiWrite.insertBatch(range(100, 103).coalesce(1), dir, "k",
      "app", 7L)
    assert(HudiRead.read(spark, dir)
      .filter(org.apache.spark.sql.functions.col("k") >= 100L)
      .count() == 3,
      "first batch of a rebuilt table must land, not read as a replay")
    // and exactly-once still holds on the new incarnation
    HudiWrite.insertBatch(range(100, 103).coalesce(1), dir, "k",
      "app", 7L)
    assert(HudiRead.read(spark, dir).count() == 7)
  }

  test("cluster: replacecommit layout rewrite; sortBy unlocks range pruning; clean reclaims replaced groups") {
    val dir = tmp()
    // 4 hash-binned groups: interleaved key ranges, so range predicates
    // cannot prune
    val i1 = HudiWrite.create(range(0, 2000).coalesce(4), dir, "k")
    val pre = kv(HudiRead.read(spark, dir))
    val (t0, k0) = HudiRead.pruneReport(spark, dir, "k >= 1500")
    assert(t0 == 4 && k0 == 4, "hash-binned groups must not range-prune")
    val ci = HudiWrite.cluster(spark, dir, targetBytes = 8192,
      sortBy = Seq("k"))
    assert(new java.io.File(dir, ".hoodie").listFiles()
      .exists(_.getName == s"$ci.replacecommit"))
    // read identical; time travel before the clustering serves the old
    // groups
    assert(kv(HudiRead.read(spark, dir)) == pre)
    assert(kv(HudiRead.read(spark, dir, asOf = i1)) == pre)
    // the sorted layout turns the range predicate into a subset open
    val (t1, k1) = HudiRead.pruneReport(spark, dir, "k >= 1500")
    assert(t1 >= 3 && k1 <= 2,
      s"sorted clustering must range-prune: $k1 of $t1")
    assert(kv(HudiRead.readWhere(spark, dir, "k >= 1500"))
      == pre.filter(_._1 >= 1500))
    // clean reclaims the replaced groups once the horizon passes
    val deleted = HudiWrite.clean(spark, dir, 1)
    assert(deleted == 4, s"the 4 replaced group files must go: $deleted")
    assert(kv(HudiRead.read(spark, dir)) == pre)
    // small-group bin-packing point (no sortBy): 4 tiny groups -> 1
    val dir2 = tmp()
    HudiWrite.create(range(0, 40).coalesce(4), dir2, "k")
    assert(HudiRead.pruneReport(spark, dir2, "k >= 0")._1 == 4)
    HudiWrite.cluster(spark, dir2, targetBytes = 1L << 30)
    assert(HudiRead.pruneReport(spark, dir2, "k >= 0")._1 == 1,
      "4 small groups must bin-pack into 1")
    assert(kv(HudiRead.read(spark, dir2)) == kv(range(0, 40)))
    // a lone group is a no-op; MOR tables refuse by name
    val before = new java.io.File(dir2, ".hoodie").listFiles().length
    HudiWrite.cluster(spark, dir2, targetBytes = 1L << 30)
    assert(new java.io.File(dir2, ".hoodie").listFiles().length == before)
    val dir3 = tmp()
    HudiWrite.create(range(0, 4).coalesce(1), dir3, "k", "",
      "MERGE_ON_READ")
    val e = intercept[IllegalArgumentException] {
      HudiWrite.cluster(spark, dir3)
    }
    assert(e.getMessage.contains("COPY_ON_WRITE only"))
  }

  test("cluster bin-pack on a PARTITIONED table packs within partitions; no-churn rewrites don't publish") {
    // 4 partitions × 3 small groups: bin-pack must REDUCE the group
    // count (a round-robin repartition would scatter every partition
    // across every bin and emit partitions×bins groups — no reduction)
    val dir = tmp()
    def batch(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("k"), lit("v").as("v"),
        (col("id") % 4).cast("string").as("p"))
    HudiWrite.create(batch(0, 40).coalesce(1), dir, "k",
      partitionField = "p")
    HudiWrite.insert(batch(40, 80).coalesce(1), dir, "k")
    HudiWrite.insert(batch(80, 120).coalesce(1), dir, "k")
    val pre = kv(HudiRead.read(spark, dir).select("k", "v"))
    val (t0, _) = HudiRead.pruneReport(spark, dir, "k >= 0")
    assert(t0 == 12, s"expected 12 groups before: $t0")
    val ci = HudiWrite.cluster(spark, dir, targetBytes = 1L << 30)
    assert(new java.io.File(dir, ".hoodie").listFiles()
      .exists(_.getName == s"$ci.replacecommit"))
    val (t1, _) = HudiRead.pruneReport(spark, dir, "k >= 0")
    assert(t1 == 4, s"bin-pack must leave one group per partition: $t1")
    assert(kv(HudiRead.read(spark, dir).select("k", "v")) == pre)
    // partition pruning still works on the packed layout
    assert(kv(HudiRead.readWhere(spark, dir, "p = '1'").select("k", "v"))
      == pre.filter(_._1 % 4 == 1))
    // no-churn guard: re-clustering the already-packed table would
    // land the same 4 groups — nothing publishes, timeline untouched
    val before = new java.io.File(dir, ".hoodie").listFiles().length
    HudiWrite.cluster(spark, dir, targetBytes = 1L << 30)
    assert(new java.io.File(dir, ".hoodie").listFiles().length == before,
      "a rewrite that does not reduce the group count must not publish")
  }

  test("insertOverwrite: touched partitions replaced wholesale; untouched intact; MOR logs die too") {
    val dir = tmp()
    val df0 = spark.range(0, 6).select(col("id").as("k"),
      concat(lit("x"), col("id").cast("string")).as("v"),
      when(col("id") < 3, lit("a")).otherwise(lit("b")).as("p"))
    val i1 = HudiWrite.create(df0.coalesce(1), dir, "k",
      partitionField = "p")
    // overwrite partition a with a 2-row recompute (different keys!)
    val over = spark.range(100, 102).select(col("id").as("k"),
      lit("new").as("v"), lit("a").as("p"))
    val oi = HudiWrite.insertOverwrite(over.coalesce(1), dir, "k")
    val after = HudiRead.read(spark, dir)
    assert(after.filter(col("p") === "a").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((100L, "new"), (101L, "new")),
      "partition a must hold ONLY the overwrite batch")
    assert(after.filter(col("p") === "b").count() == 3,
      "partition b untouched")
    assert(new java.io.File(dir, ".hoodie").listFiles()
      .exists(_.getName == s"$oi.replacecommit"))
    // time travel before the overwrite serves the old partition a
    assert(kv(HudiRead.read(spark, dir, asOf = i1)
      .select("k", "v")) == kv(range(0, 6)))
    // unpartitioned + MOR: the whole table (bases AND logs) replaces
    val dir2 = tmp()
    HudiWrite.create(range(0, 4).coalesce(1), dir2, "k", "",
      "MERGE_ON_READ")
    HudiWrite.upsertLog(range(0, 2, "u"), dir2, "k")
    HudiWrite.insertOverwrite(range(50, 53, "ow").coalesce(1), dir2, "k")
    assert(kv(HudiRead.read(spark, dir2)) == kv(range(50, 53, "ow")),
      "whole-table overwrite must drop old bases and logs")
    // empty source: detected no-op, no instant published
    val before = new java.io.File(dir2, ".hoodie").listFiles().length
    HudiWrite.insertOverwrite(range(0, 0), dir2, "k")
    assert(new java.io.File(dir2, ".hoodie").listFiles().length
      == before)
  }

  test("metadata table: one-table pruning identical to footer harvest; stale/unmodeled refuse") {
    val dir = tmp()
    HudiWrite.create(range(0, 10).coalesce(1), dir, "k")
    HudiWrite.insert(range(100, 110).coalesce(1), dir, "k")
    HudiWrite.insert(range(200, 210).coalesce(1), dir, "k")
    // no metadata table yet: loud refusal pointing at the sync verb
    val e0 = intercept[IllegalArgumentException] {
      HudiRead.pruneReportMeta(spark, dir, "k >= 200")
    }
    assert(e0.getMessage.contains("syncMetadata"))
    HudiWrite.syncMetadata(spark, dir)
    // prunes IDENTICALLY to the footer harvest, predicate by predicate
    Seq("k >= 200", "k < 5", "k >= 100 AND k < 110", "v = 'x0'")
      .foreach { p =>
        assert(HudiRead.pruneReportMeta(spark, dir, p)
          == HudiRead.pruneReport(spark, dir, p), s"prune counts: $p")
        assert(HudiRead.readWhereMeta(spark, dir, p).collect().toSet
          == HudiRead.readWhere(spark, dir, p).collect().toSet,
          s"rows: $p")
      }
    // a new commit makes the stats STALE: loud refusal until re-sync
    HudiWrite.insert(range(300, 305).coalesce(1), dir, "k")
    val e1 = intercept[IllegalArgumentException] {
      HudiRead.readWhereMeta(spark, dir, "k >= 200")
    }
    assert(e1.getMessage.contains("syncMetadata"))
    // incremental re-sync: carried stats + the one new file
    HudiWrite.syncMetadata(spark, dir)
    assert(HudiRead.pruneReportMeta(spark, dir, "k >= 300")
      == HudiRead.pruneReport(spark, dir, "k >= 300"))
    assert(HudiRead.pruneReportMeta(spark, dir, "k >= 300") == (4, 1))
    // an unmodeled metadata layout refuses loudly by name
    val mpath = s"$dir/.hoodie/metadata"
    val f = new org.apache.hadoop.fs.Path(mpath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(mpath), true)
    HudiWrite.create(range(0, 2).coalesce(1), mpath, "k")
    val e2 = intercept[IllegalArgumentException] {
      HudiRead.pruneReportMeta(spark, dir, "k >= 200")
    }
    assert(e2.getMessage.contains("unmodeled"))
    // a MOR table with live logs refuses the sync (base bounds cannot
    // cover log rows)
    val dir2 = tmp()
    HudiWrite.create(range(0, 4).coalesce(1), dir2, "k", "",
      "MERGE_ON_READ")
    HudiWrite.upsertLog(range(0, 2, "u"), dir2, "k")
    val e3 = intercept[IllegalArgumentException] {
      HudiWrite.syncMetadata(spark, dir2)
    }
    assert(e3.getMessage.contains("compact first"))
  }

  test("metadata table serves the FILE LISTING: archived tables plan walk-free; drift refuses") {
    // archived timeline = the case where plan() must otherwise WALK the
    // data tree (O(files) driver listing) to prove per-group coverage
    val dir = tmp()
    HudiWrite.create(range(0, 10).coalesce(1), dir, "k")
    HudiWrite.upsert(range(0, 2, "u1"), dir, "k") // rewrites group A
    HudiWrite.upsert(range(0, 2, "u2"), dir, "k") // rewrites A again
    HudiWrite.insert(range(100, 105).coalesce(1), dir, "k") // group B
    HudiWrite.upsert(range(0, 2, "u3"), dir, "k") // A's live slice
    // the two oldest instants' slices are fully shadowed → archivable
    assert(HudiWrite.archive(spark, dir, 3) == 2)
    HudiWrite.syncMetadata(spark, dir)
    val expect = HudiRead.readWhere(spark, dir, "k >= 100")
      .collect().toSet
    assert(HudiRead.lastWalkedFiles > 0,
      "the walking plan must have listed the data tree on an " +
        "archived table")
    // metadata planning: identical rows, ZERO data files listed
    assert(HudiRead.readWhereMeta(spark, dir, "k >= 100")
      .collect().toSet == expect)
    assert(HudiRead.lastWalkedFiles == 0L,
      "metadata planning must be LISTING-FREE")
    assert(HudiRead.pruneReportMeta(spark, dir, "k >= 100")
      == HudiRead.pruneReport(spark, dir, "k >= 100"))
    assert(HudiRead.lastWalkedFiles > 0, "pruneReport walks again")
    // FOREIGN archive after the sync: a NON-HEAD commit whose file is
    // still its group's latest moves out of the active timeline (the
    // head stays, so the staleness check passes) — the files partition
    // now holds a file the timeline plan cannot see, and the reconcile
    // refuses BY NAME instead of silently dropping its rows
    val h = new java.io.File(dir, ".hoodie")
    val victim = h.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".commit"))
      .sortBy(_.getName).dropRight(1).last // second-newest active
    // a real archiver moves the instant's MARKERS too — leaving them
    // would read as a pending concurrent writer, a different (excused)
    // state
    val instant = victim.getName.stripSuffix(".commit")
    h.listFiles().filter(f => f.isFile &&
        f.getName.startsWith(instant)).foreach { f =>
      java.nio.file.Files.move(f.toPath,
        new java.io.File(h, "archived/" + f.getName).toPath)
    }
    val e = intercept[IllegalArgumentException] {
      HudiRead.readWhereMeta(spark, dir, "k >= 100")
    }
    assert(e.getMessage.contains("FILES partition disagrees"),
      e.getMessage)
    // the walking plan refuses the same table (uncovered group) — the
    // reconcile catches exactly what the walk catches
    val e2 = intercept[IllegalArgumentException] {
      HudiRead.readWhere(spark, dir, "k >= 100")
    }
    assert(e2.getMessage.contains("no ACTIVE completed commit covers"),
      e2.getMessage)
  }

  test("racing inserts: both land exactly once on distinct instants") {
    val dir = tmp()
    HudiWrite.create(range(0, 2).coalesce(1), dir, "k")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val fs = (0 until 4).map { i =>
      Future(HudiWrite.insert(
        range(10L + i * 10, 10L + i * 10 + 5).coalesce(1), dir, "k"))
    }
    val instants = Await.result(Future.sequence(fs), 120.seconds)
    pool.shutdown()
    assert(instants.distinct.size == 4, s"instants collided: $instants")
    assert(HudiRead.read(spark, dir).count() == 2 + 4 * 5,
      "every racing insert must land exactly once")
  }

  test("meta columns land per the storage layout; unknown types and double-create refuse") {
    val dir = tmp()
    val i1 = HudiWrite.create(range(0, 4).coalesce(1), dir, "k")
    // raw read (reader drops meta cols — verify them directly)
    val raw = spark.read.parquet(
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString): _*)
    assert(raw.columns.take(5).toSeq == Seq("_hoodie_commit_time",
      "_hoodie_commit_seqno", "_hoodie_record_key",
      "_hoodie_partition_path", "_hoodie_file_name"))
    val r = raw.filter(col("k") === 2).head()
    assert(r.getString(0) == i1)
    assert(r.getString(2) == "2")
    assert(r.getString(4).endsWith(s"_0-0-0_$i1.parquet"))
    // an unknown table type refuses every write
    val oddDir = tmp()
    Files.createDirectories(java.nio.file.Paths.get(oddDir, ".hoodie"))
    Files.writeString(
      java.nio.file.Paths.get(oddDir, ".hoodie", "hoodie.properties"),
      "hoodie.table.name=t\nhoodie.table.type=SOMETHING_NEW\n")
    val e = intercept[IllegalArgumentException] {
      HudiWrite.insert(range(0, 1), oddDir, "k")
    }
    assert(e.getMessage.contains("SOMETHING_NEW"))
    // double-create refuses
    val e2 = intercept[IllegalArgumentException] {
      HudiWrite.create(range(0, 1), dir, "k")
    }
    assert(e2.getMessage.contains("already"))
  }
}
